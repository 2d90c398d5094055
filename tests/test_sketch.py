"""Sketch + new-aggregate semantics: exact vectorized bit_length,
HLL estimate error bound, partition invariance (mergeability), exact
distinct, grouped quantiles, span dedup."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from biocypher_metta_ray.stages.sketch import (
    _bit_length_u64,
    distinct_count,
    hll_count_distinct,
    hll_estimate,
    hll_registers,
)


def test_bit_length_u64_exact():
    edge = np.array(
        [0, 1, 2, 3, (1 << 52) - 1, 1 << 52, (1 << 61) - 1, (1 << 64) - 1],
        dtype=np.uint64,
    )
    rng = np.random.default_rng(7)
    rand = rng.integers(0, 1 << 63, size=500, dtype=np.uint64)
    w = np.concatenate([edge, rand])
    got = _bit_length_u64(w)
    want = np.array([int(x).bit_length() for x in w], dtype=np.int64)
    np.testing.assert_array_equal(got, want)


def _values_ds(n: int, blocks: int) -> ray.data.Dataset:
    df = pd.DataFrame({"v": [f"val-{i}" for i in range(n)]})
    return ray.data.from_pandas(df).repartition(blocks)


def test_hll_estimate_within_bound(ray_session):
    n = 10_000
    est = hll_count_distinct(_values_ds(n, 8), "v")
    assert abs(est - n) / n < 0.05  # p=12 -> 1.6% std err; 3 sigma


def test_hll_partition_invariant(ray_session):
    """Register tables are mergeable state: any partitioning of the
    same values yields the SAME registers (the property that makes
    the sketch safe at any cluster size)."""
    a = hll_registers(_values_ds(3000, 2), "v").to_pandas()
    b = hll_registers(_values_ds(3000, 17), "v").to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_hll_duplicates_dont_count(ray_session):
    once = hll_registers(_values_ds(500, 3), "v").to_pandas()
    df = pd.DataFrame({"v": [f"val-{i % 500}" for i in range(5000)]})
    dup = hll_registers(
        ray.data.from_pandas(df).repartition(5), "v"
    ).to_pandas()
    pd.testing.assert_frame_equal(once, dup)
    assert abs(hll_estimate(dup) - 500) / 500 < 0.05


def test_quantile_summary_rank_error(ray_session):
    """Weighted-rank error of every estimated quantile stays within
    the documented ~levels/s bound (2.5% at s=256 with margin), on a
    heavily skewed distribution."""
    from biocypher_metta_ray.stages.sketch import (
        approx_quantiles,
        quantile_summary,
        summary_quantile,
    )

    rng = np.random.default_rng(11)
    x = rng.lognormal(mean=2.0, sigma=1.5, size=100_000)
    ds = ray.data.from_pandas(pd.DataFrame({"x": x})).repartition(23)
    summary = quantile_summary(ds, "x", s=256)
    assert len(summary) <= 256
    xs = np.sort(x)
    for q in (0.1, 0.5, 0.9, 0.99):
        est = summary_quantile(summary, q)
        rank = np.searchsorted(xs, est) / len(xs)
        assert abs(rank - q) < 0.025, (q, rank)
    one_row = approx_quantiles(ds, "x", (0.5, 0.9))
    assert list(one_row.columns) == ["p50", "p90"]
    assert len(one_row) == 1


def test_quantile_summary_small_input_exact(ray_session):
    """Inputs under s rows never compact: the summary IS the data and
    quantiles are exact (lower order statistic)."""
    from biocypher_metta_ray.stages.sketch import (
        quantile_summary,
        summary_quantile,
    )

    vals = np.arange(100, dtype=np.float64)
    ds = ray.data.from_pandas(pd.DataFrame({"x": vals})).repartition(4)
    summary = quantile_summary(ds, "x", s=256)
    assert summary["weight"].sum() == 100
    assert summary_quantile(summary, 0.5) == 49.0
    assert summary_quantile(summary, 1.0) == 99.0


def test_distinct_count_exact(ray_session):
    df = pd.DataFrame({"k": [i % 37 for i in range(1000)]})
    out = distinct_count(ray.data.from_pandas(df).repartition(4), ["k"])
    assert out["n_distinct"].tolist() == [37]
    assert str(out["n_distinct"].dtype) == "int64"


def test_grouped_quantiles_matches_numpy(ray_session):
    from biocypher_metta_ray.stages.relational import grouped_quantiles

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {"g": rng.integers(0, 5, 400), "x": rng.normal(size=400)}
    )
    out = (
        grouped_quantiles(
            ray.data.from_pandas(df).repartition(6), ["g"], "x", (0.5, 0.9)
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    for _, row in out.iterrows():
        vals = df.loc[df["g"] == row["g"], "x"].to_numpy()
        assert row["p50"] == pytest.approx(np.quantile(vals, 0.5))
        assert row["p90"] == pytest.approx(np.quantile(vals, 0.9))


def test_span_dedup_semantics(ray_session):
    from biocypher_metta_ray.stages.cleaning import span_dedup

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "a b c d e f",      # spans: "a b c", "d e f"
                "a b c x y z",      # "a b c" is a repeat -> "x y z"
                "d e f",            # whole doc is a repeat -> dropped
                "p q",              # short tail window, unique -> kept
            ],
        }
    )
    out = (
        span_dedup(ray.data.from_pandas(df).repartition(3), width=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 2, 4]
    assert out["text"].tolist() == ["a b c d e f", "x y z", "p q"]


def test_chunk_docs_overlap(ray_session):
    from biocypher_metta_ray.stages.text_stats import chunk_docs

    df = pd.DataFrame(
        {"doc_id": [1], "text": ["w0 w1 w2 w3 w4 w5 w6"]}
    )
    out = (
        chunk_docs(ray.data.from_pandas(df), chunk_words=4, overlap=2)
        .to_pandas()
        .sort_values("chunk_no")
    )
    # step=2: windows start at 0,2,4,6; last two are short tails
    assert out["chunk"].tolist() == [
        "w0 w1 w2 w3", "w2 w3 w4 w5", "w4 w5 w6", "w6",
    ]


def test_token_doc_freq(ray_session):
    from biocypher_metta_ray.stages.text_stats import token_doc_freq

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["a b a", "b c", "c b d"],
        }
    )
    out = (
        token_doc_freq(ray.data.from_pandas(df).repartition(2))
        .to_pandas()
        .sort_values("token")
        .reset_index(drop=True)
    )
    assert out["token"].tolist() == ["a", "b", "c", "d"]
    assert out["df"].tolist() == [1, 3, 2, 1]  # per-doc distinct
    assert out["idf"].tolist() == [
        round(float(np.log(4 / 2) + 1), 6),
        round(float(np.log(4 / 4) + 1), 6),
        round(float(np.log(4 / 3) + 1), 6),
        round(float(np.log(4 / 2) + 1), 6),
    ]


def test_bm25_ranking(ray_session):
    """More matching terms / higher tf -> higher score; docs without
    any query term never appear; rarer terms weigh more."""
    from biocypher_metta_ray.stages.retrieval import bm25_topk

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "cat dog cat fish",   # cat x2 + dog
                "cat bird bird lizard",  # cat x1
                "dog bird bird lizard",  # dog x1 (dog rarer than cat? both df=2)
                "bird lizard bird lizard",  # no query terms
            ],
        }
    )
    out = bm25_topk(
        ray.data.from_pandas(df).repartition(2), ["cat", "dog"], k=10
    )
    assert out["doc_id"].tolist()[0] == 1  # two terms, tf=3
    assert 4 not in out["doc_id"].tolist()
    assert (out["score"] > 0).all()
    # same corpus split differently -> identical result
    out2 = bm25_topk(
        ray.data.from_pandas(df).repartition(4), ["cat", "dog"], k=10
    )
    pd.testing.assert_frame_equal(out, out2)


def test_pack_sequences_semantics(ray_session):
    from biocypher_metta_ray.stages.packing import pack_sequences

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["a b c", "d e", "f g h i"],
        }
    )
    out = (
        pack_sequences(
            ray.data.from_pandas(df).repartition(2), seq_len=4,
            bucket_width=2, num_partitions=4,
        )
        .to_pandas()
        .sort_values("seq_no")
        .reset_index(drop=True)
    )
    assert out["text"].tolist() == ["a b c d", "e f g h", "i"]
    assert out["n_tokens"].tolist() == [4, 4, 1]


def test_pack_sequences_partitioning_invariant(ray_session):
    """Offsets derive from doc_id order alone: any block layout and
    any bucket width give identical packed rows."""
    from biocypher_metta_ray.stages.packing import pack_sequences

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(80),
            "text": [
                " ".join(
                    f"w{rng.integers(0, 9)}"
                    for _ in range(rng.integers(1, 12))
                )
                for _ in range(80)
            ],
        }
    )
    a = (
        pack_sequences(
            ray.data.from_pandas(df).repartition(3), 16, bucket_width=7
        )
        .to_pandas().sort_values("seq_no").reset_index(drop=True)
    )
    b = (
        pack_sequences(
            ray.data.from_pandas(df).repartition(11), 16, bucket_width=64
        )
        .to_pandas().sort_values("seq_no").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    full = " ".join(df["text"])
    assert " ".join(a["text"]) == full


def test_explode_spans_tail_window(ray_session):
    from biocypher_metta_ray.stages.cleaning import explode_spans

    df = pd.DataFrame({"doc_id": [7], "text": ["w1 w2 w3 w4 w5"]})
    out = (
        explode_spans(ray.data.from_pandas(df), width=2)
        .to_pandas()
        .sort_values("span_no")
    )
    assert out["span"].tolist() == ["w1 w2", "w3 w4", "w5"]
    assert out["span_no"].tolist() == [0, 1, 2]


def test_grouped_hll_estimates_within_error(ray_session):
    import ray.data

    from biocypher_metta_ray.stages.sketch import grouped_hll_count

    df = pd.DataFrame(
        {
            "g": np.repeat(["a", "b"], 20000),
            "k": np.concatenate(
                [np.arange(20000) % 5000, np.arange(20000) % 300]
            ),
        }
    )
    got = grouped_hll_count(
        ray.data.from_pandas(df), ["g"], "k", num_partitions=4
    ).set_index("g")["approx_distinct"]
    assert abs(got["a"] - 5000) / 5000 < 0.05
    assert abs(got["b"] - 300) / 300 < 0.05


def test_grouped_hll_hot_group_costs_m_rows(ray_session):
    """A group with 1M values still produces at most m register rows
    (the skew-proof property)."""
    import ray.data

    from biocypher_metta_ray.stages.sketch import (
        HLL_M,
        grouped_hll_registers,
    )

    df = pd.DataFrame({"g": ["hot"] * 50000, "k": np.arange(50000)})
    regs = grouped_hll_registers(
        ray.data.from_pandas(df), ["g"], "k", num_partitions=4
    ).to_pandas()
    assert len(regs) <= HLL_M


def test_cms_never_underestimates_and_heavy_keys_tight(ray_session):
    import ray.data

    from biocypher_metta_ray.stages.sketch import cms_counts, cms_estimate

    rng = np.random.RandomState(11)
    keys = np.concatenate(
        [np.full(5000, 7), np.full(2000, 13),
         rng.randint(100, 4000, 3000)]
    ).astype(np.int64)
    df = pd.DataFrame({"k": keys})
    sk = cms_counts(ray.data.from_pandas(df), "k").to_pandas()
    true = pd.Series(keys).value_counts()
    for key in (7, 13, int(true.index[-1])):
        est = cms_estimate(sk, str(key))
        assert est >= int(true[key])          # CMS never underestimates
    # heavy hitters dominate their cells: estimate within eps*N slack
    assert cms_estimate(sk, "7") - 5000 <= len(keys) * 4 / 1024
    # total mass per depth equals the row count exactly
    per_depth = sk.groupby("depth")["n"].sum()
    assert (per_depth == len(keys)).all()


def test_cms_partition_invariant(ray_session):
    import ray.data

    from biocypher_metta_ray.stages.sketch import cms_counts

    df = pd.DataFrame({"k": np.arange(2000, dtype=np.int64) % 37})
    one = cms_counts(ray.data.from_pandas(df), "k").to_pandas()
    many = cms_counts(
        ray.data.from_pandas(list(np.array_split(df, 7))), "k"
    ).to_pandas()
    pd.testing.assert_frame_equal(
        one.sort_values(["depth", "cell"]).reset_index(drop=True),
        many.sort_values(["depth", "cell"]).reset_index(drop=True),
    )


def test_heavy_hitters_exact_and_candidate_bounded(ray_session):
    import ray.data

    from biocypher_metta_ray.stages.sketch import heavy_hitters

    rng = np.random.RandomState(3)
    keys = np.concatenate(
        [np.full(900, 1), np.full(500, 2), np.full(99, 3),
         rng.randint(1000, 5000, 2000)]
    ).astype(np.int64)
    rng.shuffle(keys)
    df = pd.DataFrame({"k": keys})
    got = heavy_hitters(
        ray.data.from_pandas(list(np.array_split(df, 5))), "k",
        min_count=100,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    # exact: 1 and 2 qualify, 3 (99 occurrences) does not, and the
    # counts are true counts, not sketch estimates
    assert got["k"].tolist() == ["1", "2"]
    assert got["n"].tolist() == [900, 500]
