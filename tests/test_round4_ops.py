"""Round-4 operator additions: exact set-similarity join (prefix
filter), 2-D skyline, and the tiny-table read clamp that keeps
schema-less empty blocks out of the native join."""

import math

import numpy as np
import pandas as pd
import pytest

import ray.data


# ---------------------------------------------------------------------------
# setsim: prefix-filtered exact n-gram Jaccard join
# ---------------------------------------------------------------------------


def _brute_pairs(texts: dict, ngram: int, t: float) -> set:
    def grams(s):
        toks = s.split(" ")
        return {
            " ".join(toks[i:i + ngram])
            for i in range(len(toks) - ngram + 1)
        } if len(toks) >= ngram else set()

    g = {k: grams(v) for k, v in texts.items()}
    out = set()
    for a in sorted(g):
        for b in sorted(g):
            if a >= b or not g[a] or not g[b]:
                continue
            inter = len(g[a] & g[b])
            union = len(g[a] | g[b])
            if union and inter / union >= t:
                out.add((a, b, round(inter / union, 6)))
    return out


CORPUS = {
    1: "the quick brown fox jumps over the lazy dog",
    2: "the quick brown fox jumps over the lazy cat",
    3: "the quick brown fox jumps over the lazy dog",          # dup of 1
    4: "a completely different document about ray data engines",
    5: "a completely different document about ray data pipelines",
    6: "the quick brown fox leaps over the lazy dog",
    7: "one",                                                   # < ngram tokens
    8: "",                                                      # empty
    9: "of the of the of the of the boilerplate of the",        # hot grams
    10: "of the of the of the of the boilerplate of the",       # dup of 9
}


def _brute_containment(texts: dict, ngram: int, t: float) -> set:
    def grams(s):
        toks = s.split(" ")
        return {
            " ".join(toks[i:i + ngram])
            for i in range(len(toks) - ngram + 1)
        } if len(toks) >= ngram else set()

    g = {k: grams(v) for k, v in texts.items()}
    out = set()
    for a in sorted(g):
        for b in sorted(g):
            if a == b or not g[a] or not g[b]:
                continue
            c = len(g[a] & g[b]) / len(g[a])
            if c >= t:
                out.add((a, b, round(c, 6)))
    return out


@pytest.mark.parametrize("threshold", [0.5, 0.7, 1.0])
def test_ngram_containment_join_exact(ray_session, threshold):
    """Directed containment output == brute force, including strict
    subsets (the asymmetric case Jaccard misses), duplicates and hot
    boilerplate grams."""
    from biocypher_metta_ray.stages.setsim import ngram_containment_join

    corpus = dict(CORPUS)
    corpus[11] = "the quick brown fox"           # subset of 1/3/6
    corpus[12] = "over the lazy dog"             # subset of 1/3/6
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": list(corpus),
                      "text": list(corpus.values())})
    ).repartition(4)
    got = ngram_containment_join(ds, threshold=threshold, ngram=2,
                                 num_partitions=4).to_pandas()
    got_set = {
        (int(r.doc_a), int(r.doc_b), round(float(r.containment), 6))
        for r in got.itertuples()
    }
    assert got_set == _brute_containment(corpus, 2, threshold)
    if threshold <= 1.0:
        # the asymmetric contract: the strict subsets are found
        assert (11, 1, 1.0) in got_set and (12, 1, 1.0) in got_set


@pytest.mark.parametrize("threshold", [0.4, 0.6, 0.9])
def test_ngram_jaccard_join_exact(ray_session, threshold):
    """The df-ordered prefix filter is candidate-lossless: output ==
    brute force (including duplicate docs and hot boilerplate grams)."""
    from biocypher_metta_ray.stages.setsim import ngram_jaccard_join

    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": list(CORPUS), "text": list(CORPUS.values())})
    ).repartition(4)
    got = ngram_jaccard_join(ds, threshold=threshold, ngram=2,
                             num_partitions=4).to_pandas()
    got_set = {
        (int(r.doc_a), int(r.doc_b), round(float(r.jaccard), 6))
        for r in got.itertuples()
    }
    assert got_set == _brute_pairs(CORPUS, 2, threshold)


def test_ngram_jaccard_collapse_matches_core(ray_session):
    """The identical-set collapse path (fingerprint -> representative
    join -> member expansion) returns EXACTLY the direct AllPairs
    output on a duplicate-heavy corpus — pairs AND float scores."""
    from biocypher_metta_ray.stages.setsim import ngram_jaccard_join

    # 4x-replicated corpus: every doc has 3 exact copies (disjoint ids)
    rows = []
    for k in range(4):
        for i, t in CORPUS.items():
            rows.append({"doc_id": i + 100 * k, "text": t})
    df = pd.DataFrame(rows)
    texts = dict(zip(df.doc_id, df.text))
    ds = ray.data.from_pandas(df).repartition(4)

    outs = {}
    # broadcast collapse (fp table under budget), forced-distributed
    # collapse (budget 0), and the direct core join
    for mode, kw in {
        "broadcast": dict(collapse_identical=True),
        "distributed": dict(collapse_identical=True, broadcast_bytes=0),
        "core": dict(collapse_identical=False),
    }.items():
        got = ngram_jaccard_join(
            ds, threshold=0.6, ngram=2, num_partitions=4,
            **kw).to_pandas()
        outs[mode] = {
            (int(r.doc_a), int(r.doc_b), round(float(r.jaccard), 6))
            for r in got.itertuples()
        }
    brute = _brute_pairs(texts, 2, 0.6)
    assert outs["broadcast"] == outs["distributed"] == outs["core"] == brute
    # exact duplicates pair at exactly 1.0 through the intra branch
    assert any(j == 1.0 for (_, _, j) in outs["broadcast"])


def test_doc_fingerprints_identity(ray_session):
    from biocypher_metta_ray.stages.setsim import doc_fingerprints

    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["a b c d", "a b c d", "a b c x", "one", ""],
    }))
    fp = doc_fingerprints(ds, ngram=2).to_pandas().set_index("doc_id")
    assert set(fp.index) == {1, 2, 3}  # short/empty excluded
    assert tuple(fp.loc[1]) == tuple(fp.loc[2])
    assert tuple(fp.loc[1]) != tuple(fp.loc[3])


def test_prefix_len_safe_direction():
    from biocypher_metta_ray.stages.setsim import _prefix_len

    # p = s - ceil(t*s) + 1, and float fuzz may only LENGTHEN it
    for s in range(1, 200):
        for t in (0.25, 0.5, 0.6, 0.75, 0.8, 0.9, 1.0):
            p = _prefix_len(s, t)
            exact = s - math.ceil(round(t * s, 9)) + 1
            assert p >= exact
            assert p <= exact + 1
            assert 1 <= p <= s


def test_gram_rows_skips_short_docs(ray_session):
    from biocypher_metta_ray.stages.setsim import gram_rows

    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["only", "", "two tokens here"]}
    ))
    out = gram_rows(ds, ngram=2).to_pandas()
    assert set(out["doc_id"]) == {3}
    assert (out["sz"] == 2).all()  # "two tokens", "tokens here"
    assert len(out) == 2


# ---------------------------------------------------------------------------
# skyline
# ---------------------------------------------------------------------------


def _brute_skyline(df, min_col, max_col):
    keep = []
    for i, r in df.iterrows():
        dominated = (
            (df[min_col] <= r[min_col]) & (df[max_col] >= r[max_col])
            & ((df[min_col] < r[min_col]) | (df[max_col] > r[max_col]))
        ).any()
        if not dominated:
            keep.append(i)
    return df.loc[keep]


def test_skyline_matches_brute_force(ray_session):
    from biocypher_metta_ray.stages.relational import skyline

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "id": np.arange(300),
        "cost": rng.integers(0, 40, 300).astype("float64"),
        "benefit": rng.integers(0, 40, 300),
    })
    got = (skyline(ray.data.from_pandas(df).repartition(8),
                   "cost", "benefit")
           .to_pandas().sort_values("id").reset_index(drop=True))
    want = (_brute_skyline(df, "cost", "benefit")
            .sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_skyline_keeps_equal_points(ray_session):
    """Exact duplicate (min,max) points never dominate each other —
    all copies survive."""
    from biocypher_metta_ray.stages.relational import skyline

    df = pd.DataFrame({"id": [1, 2, 3], "cost": [5.0, 5.0, 9.0],
                       "benefit": [7, 7, 1]})
    got = skyline(ray.data.from_pandas(df).repartition(3),
                  "cost", "benefit").to_pandas()
    assert sorted(got["id"]) == [1, 2]


# ---------------------------------------------------------------------------
# tiny-table read clamp (schema-less empty block regression)
# ---------------------------------------------------------------------------


def test_rp_tiny_table_no_schemaless_blocks(ray_session):
    """A 10-row dim table must not split into zero-row read tasks:
    Ray emits those as schema-less ``Table []`` blocks, which
    map_batches skips and acero's native join rejects."""
    import __ray_entry__ as m

    ds = m._rp("/root/testdata/sf0.001", "supplier",
               columns=["s_suppkey", "s_nationkey"])
    mat = ds.materialize()
    for ref in mat.get_internal_block_refs():
        blk = ray.get(ref)
        ncols = (len(blk.columns) if hasattr(blk, "columns")
                 else blk.num_columns)
        assert ncols == 2


# ---------------------------------------------------------------------------
# grouped MAD (median absolute deviation)
# ---------------------------------------------------------------------------


def test_grouped_mad_matches_pandas(ray_session):
    """med and mad reproduce quantile_cont-interpolated medians exactly,
    including even-count groups (interpolated halves) and outliers."""
    from biocypher_metta_ray.stages.relational import grouped_mad

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "k": np.repeat(["a", "b", "c"], [101, 100, 7]),
        "v": np.concatenate([
            rng.integers(0, 50, 101).astype("float64"),
            rng.integers(0, 50, 100).astype("float64"),   # even count
            np.array([1, 1, 1, 2, 3, 4, 1000.0]),         # outlier
        ]),
    })
    ds = ray.data.from_pandas(df).repartition(5)
    got = grouped_mad(ds, ["k"], "v", num_partitions=4).to_pandas()
    got = got.sort_values("k").reset_index(drop=True)

    exp_med = df.groupby("k")["v"].median()
    exp_mad = df.groupby("k", group_keys=False)["v"].apply(
        lambda s: (s - s.median()).abs().median())
    assert list(got["k"]) == ["a", "b", "c"]
    np.testing.assert_allclose(got["med"], exp_med.loc[got["k"]], atol=0)
    np.testing.assert_allclose(got["mad"], exp_mad.loc[got["k"]], atol=0)
    # the outlier group: mad is robust (not dragged by the 1000)
    assert got.loc[got["k"] == "c", "mad"].iloc[0] <= 3.0


# ---------------------------------------------------------------------------
# global_row_number: distributed full ORDER BY with rank assignment
# ---------------------------------------------------------------------------


def test_global_row_number_matches_pandas(ray_session):
    from biocypher_metta_ray.stages.relational import global_row_number

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "k": np.arange(5000, dtype=np.int64),
        # heavy duplication in the leading key: forces composite
        # tiebreaks and equal-value bucket co-location
        "v": rng.integers(0, 40, 5000).astype(np.float64),
    })
    ds = ray.data.from_pandas(df).repartition(8)
    out = (
        global_row_number(ds, by=["v", "k"], ascending=[False, True],
                          num_buckets=6)
        .to_pandas().sort_values("rn").reset_index(drop=True)
    )
    exp = df.sort_values(["v", "k"], ascending=[False, True]).reset_index(
        drop=True)
    assert out["rn"].tolist() == list(range(1, 5001))
    assert out["k"].tolist() == exp["k"].tolist()
    assert out["rn"].dtype == np.int64


def test_global_row_number_string_key(ray_session):
    from biocypher_metta_ray.stages.relational import global_row_number

    df = pd.DataFrame({
        "name": [f"user_{i % 17:02d}" for i in range(300)],
        "uid": np.arange(300, dtype=np.int64),
    })
    ds = ray.data.from_pandas(df).repartition(4)
    out = (
        global_row_number(ds, by=["name", "uid"], num_buckets=5)
        .to_pandas().sort_values("rn").reset_index(drop=True)
    )
    exp = df.sort_values(["name", "uid"]).reset_index(drop=True)
    assert out["uid"].tolist() == exp["uid"].tolist()


def test_neighbor_similarity_known_graph(ray_session):
    """Square 1-2-3-4 plus diagonal 1-3 (duplicate + reversed input
    rows must collapse). Hand-computed: edge (1,3) has common
    neighbors {2,4}, jaccard 2/(3+3-2)=0.5, AA=2/ln2; every other
    edge has one common neighbor of degree 3 -> AA=1/ln3."""
    from biocypher_metta_ray.stages.graph import neighbor_similarity

    edges = pd.DataFrame({"src": [1, 2, 3, 4, 1, 3, 1],
                          "dst": [2, 3, 4, 1, 3, 1, 2]})
    out = (
        neighbor_similarity(ray.data.from_pandas(edges),
                            src="src", dst="dst")
        .to_pandas().sort_values(["u", "v"]).reset_index(drop=True)
    )
    assert out["u"].tolist() == [1, 1, 1, 2, 3]
    assert out["v"].tolist() == [2, 3, 4, 3, 4]
    assert out["common_neighbors"].tolist() == [1, 2, 1, 1, 1]
    assert out["jaccard"].tolist() == [0.25, 0.5, 0.25, 0.25, 0.25]
    aa3 = round(1 / math.log(3), 6)
    aa2 = round(2 / math.log(2), 6)
    assert out["adamic_adar"].tolist() == [aa3, aa2, aa3, aa3, aa3]
    # int node ids must survive the tagged unions (the NaN-upcast
    # silent-drop class)
    assert out["u"].dtype == np.int64


def test_neighbor_similarity_triangle_free(ray_session):
    """A path graph has edges but zero triangles: every edge scores
    zeros (the left-join-back contract), nothing is dropped."""
    from biocypher_metta_ray.stages.graph import neighbor_similarity

    edges = pd.DataFrame({"src": [10, 20, 30], "dst": [20, 30, 40]})
    out = (
        neighbor_similarity(ray.data.from_pandas(edges),
                            src="src", dst="dst")
        .to_pandas().sort_values(["u", "v"]).reset_index(drop=True)
    )
    assert len(out) == 3
    assert out["common_neighbors"].tolist() == [0, 0, 0]
    assert out["jaccard"].tolist() == [0.0, 0.0, 0.0]
    assert out["adamic_adar"].tolist() == [0.0, 0.0, 0.0]


def test_clustering_coefficient_known_graph(ray_session):
    """Square + diagonal: the diagonal endpoints (degree 3, 2
    triangles) score 2*2/(3*2)=2/3; the off-diagonal corners
    (degree 2, 1 triangle) are fully clustered at 1.0."""
    from biocypher_metta_ray.stages.graph import clustering_coefficient

    edges = pd.DataFrame({"src": [1, 2, 3, 4, 1],
                          "dst": [2, 3, 4, 1, 3]})
    out = (
        clustering_coefficient(ray.data.from_pandas(edges),
                               src="src", dst="dst")
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert out["node"].tolist() == [1, 2, 3, 4]
    assert out["degree"].tolist() == [3, 2, 3, 2]
    assert out["triangles"].tolist() == [2, 1, 2, 1]
    assert out["coeff"].tolist() == [0.666667, 1.0, 0.666667, 1.0]
    # a star has edges but no triangles: centre and leaves all zero
    star = pd.DataFrame({"src": [0, 0, 0], "dst": [1, 2, 3]})
    s = (
        clustering_coefficient(ray.data.from_pandas(star),
                               src="src", dst="dst")
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert s["triangles"].tolist() == [0, 0, 0, 0]
    assert s["coeff"].tolist() == [0.0, 0.0, 0.0, 0.0]


def test_sssp_weighted_vs_unweighted(ray_session):
    """Weighted diamond: the 3-edge cheap chain (cost 3) must beat
    the direct heavy edge (cost 5); unweighted the same node is one
    hop away. Bounded sweeps: with sweeps=1 the 3-edge path is not
    yet found and the heavy edge wins."""
    from biocypher_metta_ray.stages.graph import sssp_distances

    edges = pd.DataFrame({"src": [1, 2, 1, 3], "dst": [2, 4, 3, 4],
                          "w": [1.0, 1.0, 5.0, 1.0]})
    seeds = ray.data.from_pandas(pd.DataFrame({"node": [1]}))
    ds = ray.data.from_pandas(edges)

    out = (sssp_distances(ds, seeds, weight_col="w", sweeps=4)
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert out["node"].tolist() == [1, 2, 3, 4]
    assert out["dist"].tolist() == [0.0, 1.0, 3.0, 2.0]

    hop = (sssp_distances(ds, seeds, sweeps=2)
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert hop["dist"].tolist() == [0.0, 1.0, 1.0, 2.0]

    one = (sssp_distances(ds, seeds, weight_col="w", sweeps=1)
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert one["dist"].tolist() == [0.0, 1.0, 5.0]


def test_degree_assortativity_signs(ray_session):
    """A star is maximally disassortative... but with only two degree
    values on every edge (centre d=3, leaf d=1) the symmetrized
    correlation is exactly -1. A clique has zero degree variance ->
    NaN (the SQL corr convention)."""
    from biocypher_metta_ray.stages.graph import degree_assortativity

    star = pd.DataFrame({"src": [0, 0, 0], "dst": [1, 2, 3]})
    r = degree_assortativity(ray.data.from_pandas(star),
                             src="src", dst="dst")
    assert r["assortativity"].iloc[0] == -1.0

    k3 = pd.DataFrame({"src": [1, 2, 1], "dst": [2, 3, 3]})
    r2 = degree_assortativity(ray.data.from_pandas(k3),
                              src="src", dst="dst")
    assert math.isnan(r2["assortativity"].iloc[0])


def test_grouped_regression_matches_numpy(ray_session):
    from biocypher_metta_ray.stages.relational import grouped_regression

    rng = np.random.RandomState(11)
    x = rng.uniform(0, 10, 300)
    df = pd.DataFrame(
        {"g": (["a"] * 150) + (["b"] * 150),
         "x": x,
         "y": np.concatenate([3 * x[:150] + 7 + rng.normal(0, 1, 150),
                              -2 * x[150:] + rng.normal(0, 4, 150)])}
    )
    got = grouped_regression(
        ray.data.from_pandas(list(np.array_split(df, 4))), ["g"],
        "x", "y",
    ).to_pandas().set_index("g")
    for g, grp in df.groupby("g"):
        slope, intercept = np.polyfit(grp["x"], grp["y"], 1)
        r = np.corrcoef(grp["x"], grp["y"])[0, 1]
        assert abs(got.loc[g, "slope"] - slope) < 1e-5
        assert abs(got.loc[g, "intercept"] - intercept) < 1e-5
        assert abs(got.loc[g, "r2"] - r * r) < 1e-5
    # zero x-variance group -> dropped (stated contract), not NaN/crash
    cdf = pd.DataFrame({"g": ["c"] * 5, "x": np.ones(5),
                        "y": np.arange(5.0)})
    out = grouped_regression(
        ray.data.from_pandas(cdf), ["g"], "x", "y"
    ).to_pandas()
    assert len(out) == 0


def test_hits_matches_numpy(ray_session):
    """3-sweep HITS on a small directed graph vs the dense
    numpy recurrence (auth from old hub, hub from new auth, L2
    normalization each half-sweep)."""
    from biocypher_metta_ray.stages.graph import hits

    E = pd.DataFrame({"src": ["a", "a", "b", "c", "d", "d", "a"],
                      "dst": ["b", "c", "c", "b", "c", "b", "b"]})
    got = (hits(ray.data.from_pandas(E), iterations=3,
                num_partitions=2)
           .to_pandas().sort_values("node").reset_index(drop=True))
    nodes = sorted(set(E["src"]) | set(E["dst"]))
    idx = {n: i for i, n in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for s, d in E.drop_duplicates().itertuples(index=False):
        A[idx[s], idx[d]] = 1.0
    h = np.ones(len(nodes))
    for _ in range(3):
        a = A.T @ h
        a /= np.linalg.norm(a)
        h = A @ a
        h /= np.linalg.norm(h)
    assert got["node"].tolist() == nodes
    np.testing.assert_allclose(got["hub"], np.round(h, 6), atol=2e-6)
    np.testing.assert_allclose(got["auth"], np.round(a, 6), atol=2e-6)
    # pure sources have auth 0; pure sinks have hub 0
    assert got.set_index("node").loc["a", "auth"] == 0.0


def test_k_core_peels_pendant_chain(ray_session):
    """Triangle (the 2-core) + pendant chain + stray edge: peeling
    must cascade down the chain (d drops only after e goes), which a
    single-round degree filter would get wrong."""
    from biocypher_metta_ray.stages.graph import k_core

    E = pd.DataFrame({"src": ["a", "b", "c", "c", "d", "f"],
                      "dst": ["b", "c", "a", "d", "e", "g"]})
    got = (k_core(ray.data.from_pandas(E), k=2, num_partitions=2)
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert got["node"].tolist() == ["a", "b", "c"]
    assert got["deg"].tolist() == [2, 2, 2]
    # k=1 on a simple graph keeps every non-isolated node
    assert len(k_core(ray.data.from_pandas(E), k=1,
                      num_partitions=2).to_pandas()) == 7
    # a triangle has no 3-core
    assert len(k_core(ray.data.from_pandas(E), k=3,
                      num_partitions=2).to_pandas()) == 0


def test_label_propagation_two_communities(ray_session):
    """Two triangles joined by a single bridge edge: after 4
    deterministic sweeps each triangle shares one label and the two
    labels differ (the bridge is not enough to merge them)."""
    from biocypher_metta_ray.stages.graph import label_propagation

    E = pd.DataFrame({"src": ["a", "b", "c", "x", "y", "z", "c"],
                      "dst": ["b", "c", "a", "y", "z", "x", "x"]})
    got = (label_propagation(ray.data.from_pandas(E), sweeps=4,
                             num_partitions=2)
           .to_pandas().set_index("node")["lab"])
    assert got["a"] == got["b"] == got["c"]
    assert got["x"] == got["y"] == got["z"]
    assert got["a"] != got["x"]


def test_profile_columns_nulls_and_merge(ray_session):
    """Partials from separate blocks merge to exact global stats;
    nulls are counted, excluded from min/max/mean; an all-null
    column yields NaN min/max/mean with the right null count."""
    from biocypher_metta_ray.stages.relational import profile_columns

    a = pd.DataFrame({"x": [1.0, None, 3.0], "y": [None] * 3})
    b = pd.DataFrame({"x": [10.0, -2.0, None], "y": [None] * 3})
    ds = ray.data.from_pandas([a, b])
    got = (profile_columns(ds, ["x", "y"], num_partitions=2)
           .to_pandas().set_index("col"))
    assert int(got.loc["x", "n_rows"]) == 6
    assert int(got.loc["x", "n_null"]) == 2
    assert got.loc["x", "min"] == -2.0
    assert got.loc["x", "max"] == 10.0
    assert got.loc["x", "mean"] == 3.0
    assert int(got.loc["y", "n_null"]) == 6
    assert pd.isna(got.loc["y", "mean"])


def test_modularity_two_triangles_bridge(ray_session):
    """Two triangles + bridge, each triangle its own community:
    m=7, within e_c=3 each, d_c=7 each -> Q = 2*(3/7 - (7/14)^2)."""
    from biocypher_metta_ray.stages.graph import modularity

    E = pd.DataFrame({"src": ["a", "b", "c", "x", "y", "z", "c"],
                      "dst": ["b", "c", "a", "y", "z", "x", "x"]})
    L = pd.DataFrame({"node": list("abcxyz"),
                      "lab": ["A"] * 3 + ["X"] * 3})
    got = modularity(ray.data.from_pandas(E), ray.data.from_pandas(L),
                     num_partitions=2).to_pandas()
    want = round(2 * (3 / 7 - (7 / 14) ** 2), 6)
    assert got["modularity"].iloc[0] == want


def test_impute_group_mean_fills_with_group_mean(ray_session):
    """Nulls take their own group's non-null mean; other rows are
    untouched; an all-null group keeps its nulls."""
    from biocypher_metta_ray.stages.relational import impute_group_mean

    df = pd.DataFrame({"g": ["a", "a", "a", "b", "b", "c"],
                       "v": [1.0, None, 3.0, 10.0, None, None]})
    got = (impute_group_mean(ray.data.from_pandas(df), ["g"], "v")
           .to_pandas().sort_values(["g", "v"]).reset_index(drop=True))
    assert got.loc[got["g"] == "a", "v"].tolist() == [1.0, 2.0, 3.0]
    assert got.loc[got["g"] == "b", "v"].tolist() == [10.0, 10.0]
    assert got.loc[got["g"] == "c", "v"].isna().all()


def test_grouped_entropy_known_distributions(ray_session):
    """Uniform 2-way split -> ln 2; single-category group -> 0."""
    import math

    from biocypher_metta_ray.stages.relational import grouped_entropy

    df = pd.DataFrame({"g": ["a"] * 4 + ["b"] * 3,
                       "c": ["x", "x", "y", "y", "z", "z", "z"]})
    got = (grouped_entropy(ray.data.from_pandas(df), ["g"], "c",
                           num_partitions=2)
           .to_pandas().set_index("g")["entropy"])
    assert got["a"] == round(math.log(2), 6)
    assert got["b"] == 0.0


def test_decayed_sum_half_life(ray_session):
    """A value exactly one half-life old contributes half; the newest
    contributes fully (anchor = max ts)."""
    from biocypher_metta_ray.stages.windows import decayed_sum

    t0 = pd.Timestamp("2024-01-08")
    df = pd.DataFrame({
        "u": [1, 1, 2],
        "ts": [t0, t0 - pd.Timedelta(days=7), t0],
        "v": [10.0, 10.0, 4.0],
    })
    got = (decayed_sum(ray.data.from_pandas(df), ["u"], "ts", "v",
                       half_life_s=7 * 86400.0)
           .to_pandas().set_index("u")["decayed"])
    assert got[1] == 15.0
    assert got[2] == 4.0


def test_diff_snapshots_statuses(ray_session):
    """added / removed / changed each detected; unchanged rows and
    both-null compare values emit nothing."""
    from biocypher_metta_ray.stages.joins import diff_snapshots

    old = pd.DataFrame({"k": [1, 2, 3, 4],
                        "v": [1.0, 2.0, None, 4.0]})
    new = pd.DataFrame({"k": [2, 3, 4, 5],
                        "v": [20.0, None, 4.0, 5.0]})
    got = (diff_snapshots(ray.data.from_pandas(old),
                          ray.data.from_pandas(new),
                          ["k"], ["v"], num_partitions=2)
           .to_pandas().set_index("k")["status"].to_dict())
    assert got == {1: "removed", 2: "changed", 5: "added"}


def test_closeness_path_graph(ray_session):
    """Path a-b-c: C(b) = 1+1 = 2; C(a) = C(c) = 1 + 1/2 = 1.5.
    Disconnected node pair d-e contributes only to each other."""
    from biocypher_metta_ray.stages.graph import closeness_centrality

    E = pd.DataFrame({"src": ["a", "b", "d"],
                      "dst": ["b", "c", "e"]})
    got = (closeness_centrality(ray.data.from_pandas(E), sweeps=4,
                                num_partitions=2)
           .to_pandas().set_index("node")["closeness"])
    assert got["b"] == 2.0
    assert got["a"] == 1.5
    assert got["c"] == 1.5
    assert got["d"] == 1.0
    assert got["e"] == 1.0


def test_mutual_information_known_values(ray_session):
    """Perfectly dependent columns -> H(X) = ln 2; independent
    columns -> 0 (up to rounding)."""
    import math

    from biocypher_metta_ray.stages.relational import mutual_information

    dep = pd.DataFrame({"x": ["a", "a", "b", "b"],
                        "y": ["p", "p", "q", "q"]})
    got = mutual_information(
        ray.data.from_pandas(dep), "x", "y").to_pandas()["mi"].iloc[0]
    assert got == round(math.log(2), 6)

    ind = pd.DataFrame({"x": ["a", "a", "b", "b"],
                        "y": ["p", "q", "p", "q"]})
    got = mutual_information(
        ray.data.from_pandas(ind), "x", "y").to_pandas()["mi"].iloc[0]
    assert got == 0.0


def test_distribution_drift_psi(ray_session):
    """Identical snapshots -> PSI 0; a shifted snapshot -> positive
    PSI matching the closed-form two-bin value."""
    import math

    from biocypher_metta_ray.stages.relational import distribution_drift

    a = pd.DataFrame({"v": [1.0] * 4})          # all in bin 0
    b = pd.DataFrame({"v": [1.0, 1.0, 11.0, 11.0]})  # half in bin 1
    same = distribution_drift(
        ray.data.from_pandas(a), ray.data.from_pandas(a),
        "v", lo=0.0, hi=20.0, bins=2).to_pandas()["psi"].iloc[0]
    assert same == 0.0
    got = distribution_drift(
        ray.data.from_pandas(a), ray.data.from_pandas(b),
        "v", lo=0.0, hi=20.0, bins=2).to_pandas()["psi"].iloc[0]
    p = [4.5 / 5, 0.5 / 5]
    q = [2.5 / 5, 2.5 / 5]
    want = round(sum((qi - pi) * math.log(qi / pi)
                     for pi, qi in zip(p, q)), 6)
    assert got == want


def test_sorted_neighborhood_pairs_exact_once(ray_session):
    """Window-3 SNM over 6 rows: every pair within 2 rank positions,
    each exactly once, across bucket boundaries."""
    from biocypher_metta_ray.stages.dedup import sorted_neighborhood_pairs

    df = pd.DataFrame({"id": [10, 20, 30, 40, 50, 60],
                       "name": ["a", "b", "c", "d", "e", "f"]})
    got = (sorted_neighborhood_pairs(
        ray.data.from_pandas(df), ["name"], "id", window=3,
        num_partitions=2).to_pandas())
    pairs = sorted(map(tuple, got[["id_a", "id_b"]].to_numpy()))
    want = sorted([(10, 20), (10, 30), (20, 30), (20, 40), (30, 40),
                   (30, 50), (40, 50), (40, 60), (50, 60)])
    assert pairs == want


def test_weighted_sample_reproducible_and_biased(ray_session):
    """Same input twice -> identical draw (replayability); a much
    heavier weight makes a row effectively certain to win top-1."""
    from biocypher_metta_ray.stages.relational import weighted_sample

    df = pd.DataFrame({"id": list(range(50)),
                       "w": [1.0] * 49 + [1e9]})
    a = weighted_sample(ray.data.from_pandas(df), "id", "w", k=5)
    b = weighted_sample(ray.data.from_pandas(df), "id", "w", k=5)
    assert a["id"].tolist() == b["id"].tolist()
    # priority ln(u)/w -> ~0 for the 1e9-weight row, negative others
    assert a["id"].iloc[0] == 49


def test_centroid_similarity_known_geometry(ray_session):
    """Two orthogonal-ish groups: a vector equal to its group's
    centroid scores 1.0; an orthogonal vector scores 0."""
    from biocypher_metta_ray.stages.cluster import centroid_similarity

    df = pd.DataFrame({
        "id": [1, 2, 3],
        "emb": [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]],
        "g": [0, 0, 1],
    })
    got = (centroid_similarity(ray.data.from_pandas(df),
                               "id", "emb", "g")
           .to_pandas().set_index("id")["cos_centroid"])
    assert got[1] == 1.0 and got[2] == 1.0 and got[3] == 1.0
    # cross-check: vector orthogonal to the OTHER group's centroid
    df2 = pd.DataFrame({
        "id": [1, 2],
        "emb": [[1.0, 0.0], [0.0, 1.0]],
        "g": [0, 0],
    })
    got2 = (centroid_similarity(ray.data.from_pandas(df2),
                                "id", "emb", "g")
            .to_pandas().set_index("id")["cos_centroid"])
    # centroid = (0.5, 0.5); each unit vector cos = 0.5/(1*sqrt(0.5))
    import math
    want = round(0.5 / math.sqrt(0.5), 6)
    assert got2[1] == want and got2[2] == want


# ---------------------------------------------------------------------------
# char_pair_counts: BPE merge-step statistic off the raw Arrow buffers
# ---------------------------------------------------------------------------


def _brute_char_pairs(texts):
    from collections import Counter

    c = Counter()
    for t in texts:
        for tok in t.lower().split(" "):
            for i in range(len(tok) - 1):
                c[tok[i:i + 2]] += 1
    return c


def test_char_pair_counts_matches_brute(ray_session):
    from biocypher_metta_ray.stages.lm import char_pair_counts

    texts = [
        "The Quick brown fox",
        "jumps  over the lazy dog",   # double space: no cross-token pair
        "a",                           # 1-char token: no pairs
        "",                            # empty doc
        "ab ab ab",
    ]
    ds = ray.data.from_pandas(pd.DataFrame({"text": texts}))
    got = char_pair_counts(ds, "text", k=1000)
    want = _brute_char_pairs(texts)
    got_map = dict(zip(got["pair"], got["cnt"]))
    assert got_map == dict(want)


def test_char_pair_counts_sliced_offset_buffers(ray_session):
    """A Ray block can hand the kernel a SLICED Arrow array (nonzero
    arr.offset / offsets[0]); the buffer arithmetic must hold."""
    import pyarrow as pa

    from biocypher_metta_ray.stages.lm import char_pair_counts

    texts = ["xy yz", "zz zz", "abc"]
    full = pa.table({"text": ["IGNORED ROW"] + texts})
    sliced = full.slice(1)  # nonzero offset into the same buffers
    ds = ray.data.from_arrow(sliced)
    got = char_pair_counts(ds, "text", k=100)
    want = _brute_char_pairs(texts)
    assert dict(zip(got["pair"], got["cnt"])) == dict(want)


# ---------------------------------------------------------------------------
# ancestor_closure: semi-naive bounded transitive closure on a DAG
# ---------------------------------------------------------------------------


def _closure_ds(edges):
    return ray.data.from_pandas(pd.DataFrame(
        {"child": [a for a, _ in edges],
         "parent": [b for _, b in edges]}))


def test_ancestor_closure_diamond_min_depth(ray_session):
    """Two equal-length paths collapse to ONE row; a direct shortcut
    edge beats the longer derivation (min-depth semantics)."""
    from biocypher_metta_ray.stages.graph import ancestor_closure

    edges = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)]
    got = ancestor_closure(_closure_ds(edges), max_depth=3).to_pandas()
    got = set(map(tuple, got[["node", "ancestor", "depth"]].values))
    assert got == {
        (1, 2, 1), (1, 3, 1), (2, 4, 1), (3, 4, 1), (4, 5, 1),
        (1, 4, 2), (2, 5, 2), (3, 5, 2),
        (1, 5, 3),
    }

    # shortcut edge 1->4: (1,4) now depth 1 and (1,5) depth 2
    got2 = ancestor_closure(
        _closure_ds(edges + [(1, 4)]), max_depth=3).to_pandas()
    got2 = dict(((int(r.node), int(r.ancestor)), int(r.depth))
                for r in got2.itertuples())
    assert got2[(1, 4)] == 1 and got2[(1, 5)] == 2


def test_ancestor_closure_depth_cap(ray_session):
    from biocypher_metta_ray.stages.graph import ancestor_closure

    chain = [(i, i + 1) for i in range(1, 8)]  # 1->2->...->8
    got = ancestor_closure(_closure_ds(chain), max_depth=2).to_pandas()
    assert int(got["depth"].max()) == 2
    assert len(got) == 7 + 6  # 7 depth-1 edges + 6 depth-2 pairs


# ---------------------------------------------------------------------------
# covariance / PCA power projection: additive partials across blocks
# ---------------------------------------------------------------------------


def test_covariance_and_pca_match_local_numpy(ray_session):
    from biocypher_metta_ray.stages.cluster import (
        covariance_matrix, pca_leading_projection)

    rng = np.random.RandomState(7)
    X = rng.randn(257, 5)  # odd row count -> uneven blocks
    df = pd.DataFrame({"vec_id": np.arange(257, dtype=np.int64),
                       "embedding": [row for row in X]})
    ds = ray.data.from_pandas(df).repartition(7)  # force many blocks

    n = len(X)
    mu = X.sum(0) / n
    C = (X.T @ X - n * np.outer(mu, mu)) / (n - 1)

    got = covariance_matrix(ds)
    got_m = got.pivot(index="i", columns="j", values="cov").values
    assert np.abs(got_m - np.round(C, 6)).max() < 2e-6

    v = np.zeros(5); v[0] = 1.0
    for _ in range(10):
        v = C @ v
    v = v / np.sqrt((v * v).sum())
    want = np.round((X - mu) @ v, 6)
    res = pca_leading_projection(ds, "vec_id", "embedding").to_pandas()
    res = res.sort_values("vec_id")["score"].to_numpy()
    assert np.abs(res - want).max() < 2e-6


def test_resample_ffill_edges(ray_session):
    """Keys with no event before the first grid point get the fill
    value; steps hold until the next event; the grid extends past the
    last event with the final value."""
    from biocypher_metta_ray.stages.windows import resample_ffill

    df = pd.DataFrame({
        "user_id": [1, 1, 2],
        "ts": pd.to_datetime(
            ["2024-01-03 12:00", "2024-01-05 00:00",
             "2024-01-10 00:00"]),
        "value": [10.0, 20.0, 7.0],
    })
    grid = pd.date_range("2024-01-02", "2024-01-12", freq="2D")
    ds = ray.data.from_pandas(df)
    out = resample_ffill(ds, "user_id", "ts", "value", grid).to_pandas()
    got = {(int(r.user_id), str(r.day.date())): r.value
           for r in out.itertuples()}
    assert got[(1, "2024-01-02")] == -1.0
    assert got[(1, "2024-01-04")] == 10.0
    # grid point exactly at the event ts is INCLUSIVE (at-or-before)
    assert got[(1, "2024-01-06")] == 20.0
    assert got[(1, "2024-01-12")] == 20.0
    assert got[(2, "2024-01-08")] == -1.0
    assert got[(2, "2024-01-10")] == 7.0
    assert len(out) == 2 * len(grid)


def test_deterministic_walks_dead_end_and_choice(ray_session):
    from biocypher_metta_ray.stages.graph import (
        deterministic_walks, walk_score)

    # 1 -> {2, 3}; 2 -> 4; 3 and 4 are dead ends
    e = pd.DataFrame({"src": [1, 1, 2], "dst": [2, 3, 4]})
    starts = ray.data.from_pandas(pd.DataFrame({"node": [1, 3]}))
    out = deterministic_walks(
        ray.data.from_pandas(e), starts, steps=3).to_pandas()

    # walk from 3 stops immediately (dead end): only its step-0 row
    w3 = out[out["walk_id"] == 3]
    assert list(w3["step"]) == [0] and list(w3["node"]) == [3]

    # walk from 1: step 1 picks argmin walk_score among {2, 3}
    s = walk_score(np.array([2, 3]), 1, np.array([1, 1]))
    expect1 = [2, 3][int(np.argmin(s))]
    w1 = dict(zip(out[out["walk_id"] == 1]["step"],
                  out[out["walk_id"] == 1]["node"]))
    assert w1[0] == 1 and w1[1] == expect1
    if expect1 == 2:
        assert w1[2] == 4 and 3 not in w1  # then dead end at 4


def test_quantize_embeddings_constant_dim_and_range(ray_session):
    from biocypher_metta_ray.stages.cluster import quantize_embeddings

    X = np.array([[0.0, 5.0, -1.0],
                  [1.0, 5.0, 3.0],
                  [0.5, 5.0, 1.0]])
    ds = ray.data.from_pandas(pd.DataFrame(
        {"vec_id": [0, 1, 2], "embedding": [r for r in X]}))
    q = quantize_embeddings(ds).to_pandas()
    tbl = q.pivot(index="vec_id", columns="dim", values="code")
    # dim 1 is constant -> every code -128 (scale convention 1.0)
    assert (tbl[1] == -128).all()
    # min of a dim -> -128, max -> 127
    assert tbl.loc[0, 0] == -128 and tbl.loc[1, 0] == 127
    assert tbl.loc[0, 2] == -128 and tbl.loc[1, 2] == 127
    assert q["code"].between(-128, 127).all()


def test_target_encode_shrinks_rare_categories(ray_session):
    from biocypher_metta_ray.stages.relational import target_encode

    df = pd.DataFrame({
        "k": ["a"] * 98 + ["b"] * 2,
        "v": [1.0] * 98 + [100.0] * 2,
    })
    ds = ray.data.from_pandas(df)
    out = target_encode(ds, ["k"], "v", alpha=10.0).to_pandas()
    gmean = df["v"].mean()
    enc = out.drop_duplicates("k").set_index("k")["encoded"]
    # rare 'b' (n=2, mean 100) shrinks far toward the global mean
    assert abs(enc["b"] - (200 + 10 * gmean) / 12) < 1e-6
    assert abs(enc["a"] - (98 + 10 * gmean) / 108) < 1e-6
    assert enc["b"] < 100 and enc["a"] > 1.0


def test_merge_edge_tables_equals_batch_build(ray_session):
    """Incremental invariant: merging disjoint-split edge tables
    equals the grouped sum over the union (the batch build)."""
    from biocypher_metta_ray.pipelines.kg import merge_edge_tables

    base = pd.DataFrame({
        "subj": ["a", "a", "b"], "pred": ["r", "r", "s"],
        "obj": ["x", "y", "x"], "n_mentions": [3, 1, 2]})
    delta = pd.DataFrame({
        "subj": ["a", "c"], "pred": ["r", "s"],
        "obj": ["x", "x"], "n_mentions": [4, 1]})
    merged = merge_edge_tables(
        ray.data.from_pandas(base), ray.data.from_pandas(delta)
    ).to_pandas().sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    expect = (
        pd.concat([base, delta])
        .groupby(["subj", "pred", "obj"], as_index=False)["n_mentions"]
        .sum().sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(merged, expect)
    assert merged["n_mentions"].dtype == np.int64


def test_entity_context_embeddings_means(ray_session):
    from biocypher_metta_ray.pipelines.kg import entity_context_embeddings

    linked = ray.data.from_pandas(pd.DataFrame({
        # doc 0 mentions e1 twice (dedup to once), doc 1 mentions both
        "doc_id": [0, 0, 1, 1],
        "entity_id": ["e1", "e1", "e1", "e2"]}))
    emb = ray.data.from_pandas(pd.DataFrame({
        "vec_id": [0, 1],
        "embedding": [np.array([1.0, 3.0], dtype=np.float32),
                      np.array([5.0, 7.0], dtype=np.float32)]}))
    out = entity_context_embeddings(linked, emb)
    wide = out.pivot(index="entity_id", columns="dim", values="value")
    assert wide.loc["e1", 1] == 3.0 and wide.loc["e1", 2] == 5.0
    assert wide.loc["e2", 1] == 5.0 and wide.loc["e2", 2] == 7.0


def test_propagate_features_neighbor_mean(ray_session):
    from biocypher_metta_ray.pipelines.kg import propagate_features

    feats = pd.DataFrame({
        "entity_id": ["a", "a", "b", "b", "c", "c"],
        "dim": [1, 2, 1, 2, 1, 2],
        "value": [2.0, 4.0, 6.0, 8.0, 10.0, 12.0]})
    # a-b twice under different preds (counts ONCE), b-c once
    edges = ray.data.from_pandas(pd.DataFrame({
        "subj": ["a", "a", "b"], "pred": ["r", "s", "r"],
        "obj": ["b", "b", "c"]}))
    out = propagate_features(edges, feats).to_pandas()
    wide = out.pivot(index="node", columns="dim", values="value")
    assert wide.loc["a", 1] == 6.0 and wide.loc["a", 2] == 8.0
    assert wide.loc["c", 1] == 6.0 and wide.loc["c", 2] == 8.0
    # b's neighbors are a and c -> mean
    assert wide.loc["b", 1] == 6.0 and wide.loc["b", 2] == 8.0


def test_edge_provenance_min_max_distinct(ray_session):
    from biocypher_metta_ray.pipelines.kg import edge_provenance

    triples = ray.data.from_pandas(pd.DataFrame({
        # edge (a,r,x) in docs 0 and 2 (twice in doc 2 -> counts once)
        "doc_id": [0, 2, 2, 1],
        "subj": ["a", "a", "a", "b"],
        "pred": ["r", "r", "r", "s"],
        "obj": ["x", "x", "x", "y"]}))
    ts = pd.to_datetime([10, 20, 30], unit="s")
    corpus = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [0, 1, 2], "warc_ts": ts}))
    out = edge_provenance(triples, corpus).to_pandas().set_index("subj")
    assert out.loc["a", "n_docs"] == 2
    assert out.loc["a", "first_seen"] == ts[0]
    assert out.loc["a", "last_seen"] == ts[2]
    assert out.loc["b", "n_docs"] == 1
    assert out.loc["b", "first_seen"] == ts[1]


def test_mention_contexts_window(ray_session):
    from biocypher_metta_ray.stages.linker import mention_contexts

    ents = pd.DataFrame([
        {"entity_id": "E1", "label": "gene", "canonical_name": "tp53",
         "aliases": ["tp53"]},
    ])
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["tp53 b c d e", "a b tp53 d e f"]}))
    out = mention_contexts(ds, ents, window=2).to_pandas()
    out = out.set_index("doc_id")
    # mention at position 0: window clipped left
    assert out.loc[0, "context"] == "tp53 b c"
    # mention at position 2: full +-2 window
    assert out.loc[1, "context"] == "a b tp53 d e"
    assert (out["entity_id"] == "E1").all()


def test_inverted_index_postings_sorted(ray_session):
    from biocypher_metta_ray.stages.retrieval import inverted_index

    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [2, 0, 1],
        "text": ["b a b", "a c", "c a"]}))
    out = inverted_index(ds).to_pandas().set_index("token")
    assert out.loc["a", "postings"] == "0,1,2" and out.loc["a", "df"] == 3
    # duplicate token within a doc counts once
    assert out.loc["b", "postings"] == "2" and out.loc["b", "df"] == 1
    assert out.loc["c", "postings"] == "0,1"


def test_mixture_weights_temperature(ray_session):
    from biocypher_metta_ray.stages.relational import mixture_weights

    ds = ray.data.from_pandas(pd.DataFrame(
        {"k": ["hi"] * 9 + ["lo"], "n": [1] * 10}))
    out = mixture_weights(ds, ["k"], "n", alpha=0.5).set_index("k")
    # alpha=0.5 flattens 9:1 to 3:1
    assert abs(out.loc["hi", "weight"] - 0.75) < 1e-9
    assert abs(out.loc["lo", "weight"] - 0.25) < 1e-9
    # alpha=1 -> proportional
    prop = mixture_weights(ds, ["k"], "n", alpha=1.0).set_index("k")
    assert abs(prop.loc["hi", "weight"] - 0.9) < 1e-9


def test_k_truss_peels_pendant_triangle(ray_session):
    from biocypher_metta_ray.stages.graph import k_truss

    # 4-clique a,b,c,d (every edge in 2 triangles) + pendant triangle
    # (c,d,e) whose two new edges sit in 1 triangle + a tail edge e-f
    clique = [("a","b"),("a","c"),("a","d"),("b","c"),("b","d"),("c","d")]
    extra = [("c","e"),("d","e"),("e","f")]
    df = pd.DataFrame(clique + extra, columns=["src","dst"])
    ds = ray.data.from_pandas(df)
    out = k_truss(ds, k=4, max_rounds=4).to_pandas()
    got = set(map(tuple, out[["u","v"]].to_numpy()))
    assert got == set(clique)

    # k=3 keeps every edge in >=1 triangle (drops only the tail)
    out3 = k_truss(ds, k=3, max_rounds=4).to_pandas()
    got3 = set(map(tuple, out3[["u","v"]].to_numpy()))
    assert got3 == set(clique) | {("c","e"),("d","e")}


def test_k_truss_cascade(ray_session):
    from biocypher_metta_ray.stages.graph import k_truss

    # two triangles sharing edge (b,c): each edge is in exactly 1
    # triangle except (b,c) in 2 -> k=4 peels EVERYTHING, but only
    # via the cascade (b,c survives round 1, dies round 2)
    df = pd.DataFrame(
        [("a","b"),("a","c"),("b","c"),("b","d"),("c","d")],
        columns=["src","dst"])
    out = k_truss(ray.data.from_pandas(df), k=4, max_rounds=4).to_pandas()
    assert len(out) == 0


def test_rrf_fuse_math_and_absence():
    from biocypher_metta_ray.stages.retrieval import rrf_fuse

    a = pd.DataFrame({"doc_id": [1, 2, 3], "score": [3.0, 2.0, 1.0]})
    b = pd.DataFrame({"doc_id": [2, 4], "score": [9.0, 8.0]})
    out = rrf_fuse([a, b], k_rrf=60, topk=10).set_index("doc_id")
    # doc 2: rank 2 in a, rank 1 in b
    assert abs(out.loc[2, "rrf"] - round(1 / 62 + 1 / 61, 6)) < 1e-12
    # doc 1: only in a at rank 1
    assert abs(out.loc[1, "rrf"] - round(1 / 61, 6)) < 1e-12
    # doc 4: only in b at rank 2
    assert abs(out.loc[4, "rrf"] - round(1 / 62, 6)) < 1e-12
    # order: doc 2 (two contributions) first
    assert list(out.index)[0] == 2


def test_rrf_fuse_tie_breaks_by_id():
    from biocypher_metta_ray.stages.retrieval import rrf_fuse

    # equal scores -> rank order by doc_id ascending
    a = pd.DataFrame({"doc_id": [9, 3], "score": [1.0, 1.0]})
    out = rrf_fuse([a], k_rrf=60, topk=2)
    assert list(out["doc_id"]) == [3, 9]  # 3 gets rank 1 -> higher rrf


def test_char_entropy_known_values(ray_session):
    import pyarrow as pa

    from biocypher_metta_ray.stages.text_stats import char_entropy_batch

    t = pa.table({"doc_id": [0, 1, 2], "text": ["aaaa", "abab", "abcd"]})
    out = char_entropy_batch(t).to_pandas().set_index("doc_id")
    assert out.loc[0, "entropy"] == 0.0
    assert not np.signbit(out.loc[0, "entropy"])  # +0.0, never -0.0
    assert abs(out.loc[1, "entropy"] - round(math.log(2), 6)) < 1e-9
    assert abs(out.loc[2, "entropy"] - round(math.log(4), 6)) < 1e-9


def test_related_docs_cap_and_threshold(ray_session):
    from biocypher_metta_ray.pipelines.kg import related_docs

    # docs 1,2 share e1,e2; docs 1,2,3 all share hub entity eh
    rows = [(1, "e1"), (2, "e1"), (1, "e2"), (2, "e2"),
            (1, "eh"), (2, "eh"), (3, "eh")]
    df = pd.DataFrame(rows, columns=["doc_id", "entity_id"])
    ds = ray.data.from_pandas(df)
    # cap 2 drops eh (posting 3): only (1,2) with n_shared=2 survives
    out = related_docs(ds, min_shared=2, max_posting=2).to_pandas()
    assert out.to_records(index=False).tolist() == [(1, 2, 2)]
    # no cap: (1,2) shares 3; (1,3),(2,3) share only eh -> below 2
    out2 = related_docs(ds, min_shared=2, max_posting=None).to_pandas()
    assert out2.to_records(index=False).tolist() == [(1, 2, 3)]


def test_comention_pmi_hand_check(ray_session):
    from biocypher_metta_ray.pipelines.kg import comention_pmi

    # N=4 docs; a in {1,2,3}, b in {1,2}, co-docs {1,2}
    rows = [(1, "a"), (2, "a"), (3, "a"), (1, "b"), (2, "b"), (4, "c")]
    df = pd.DataFrame(rows, columns=["doc_id", "entity_id"])
    out = comention_pmi(ray.data.from_pandas(df)).to_pandas()
    ab = out[(out["ent_a"] == "a") & (out["ent_b"] == "b")].iloc[0]
    assert ab["n_docs"] == 2
    assert abs(ab["pmi"] - round(math.log(2 * 4 / (3 * 2)), 6)) < 1e-9


def test_clean_corpus_gates_and_dedup(ray_session):
    from biocypher_metta_ray.stages.cleaning import clean_corpus

    en = "the cat and the dog of the house went to a park " * 3  # en, 36 toks
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": [
            en,                       # survives (exemplar)
            "  " + en.upper() + " ",  # normalizes to same text -> dup
            "der hund und die katze " * 6,          # german -> dropped
            "the cat",                               # too short -> dropped
            "alpha beta gamma delta " * 8,           # no stopwords -> dropped
        ],
    })
    out = clean_corpus(
        ray.data.from_pandas(docs), min_tokens=20, stopword_pct=5
    ).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["doc_id"] == 0
    assert out.iloc[0]["n_copies"] == 2
    assert out.iloc[0]["text"] == en.strip()


def test_incremental_dedup_drops_base_matches(ray_session):
    from biocypher_metta_ray.stages.dedup import incremental_dedup

    base = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [0, 1], "text": ["Seen Before", "other"]}))
    delta = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [10, 11, 12],
         "text": ["seen  before", "brand new", "Brand New"]}))
    out = incremental_dedup(delta, base).to_pandas()
    # doc 10 normalizes to a base fingerprint -> dropped;
    # 11/12 collapse to one exemplar (min id 11)
    assert list(out["doc_id"]) == [11]


def test_incremental_neardup_cross_only(ray_session):
    from biocypher_metta_ray.stages.dedup import incremental_neardup

    long_a = "the quick brown fox jumps over the lazy dog near the river " * 4
    long_b = "entirely different words about query engines and shuffles " * 4
    base = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [0, 1], "text": [long_a, "short filler text here"]}))
    delta = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [10, 11, 12],
        "text": [
            long_a + "extra tail",  # near-dup of base doc 0 -> dropped
            long_b,                 # unrelated -> kept
            long_b + "extra tail",  # near-dup of delta 11 ONLY -> kept
        ]}))
    out = incremental_neardup(delta, base, threshold=0.8).to_pandas()
    assert sorted(out["doc_id"]) == [11, 12]


def test_cms_join_size_overestimates_and_exact_when_wide(ray_session):
    from biocypher_metta_ray.stages.sketch import cms_join_size

    a = ray.data.from_pandas(pd.DataFrame({"k": [1, 1, 2, 3, 3, 3]}))
    b = ray.data.from_pandas(pd.DataFrame({"k": [1, 3, 3, 4]}))
    exact = 2 * 1 + 3 * 2  # sum_k fa*fb = 8
    # wide sketch: collision-free -> estimate IS the exact size
    wide = cms_join_size(a, "k", b, "k", width=1 << 20)
    assert int(wide["est_join_size"].iloc[0]) == exact
    # narrow sketch: collisions only ADD
    narrow = cms_join_size(a, "k", b, "k", width=4)
    assert int(narrow["est_join_size"].iloc[0]) >= exact


def test_knn_graph_matches_bruteforce(ray_session):
    from biocypher_metta_ray.stages.knn import knn_graph

    import pyarrow as pa

    rng = np.random.default_rng(7)
    X = rng.normal(size=(40, 8))
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(40, dtype=np.int64)),
        "embedding": pa.array(X.tolist(), type=pa.list_(pa.float64())),
    }))
    out = knn_graph(ds, k=3).to_pandas()
    assert len(out) == 40 * 3
    assert (out["vec_id"] != out["nbr_id"]).all()
    # brute-force check
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    cos = Xn @ Xn.T
    np.fill_diagonal(cos, -np.inf)
    for q in (0, 17, 39):
        exp = list(np.lexsort((np.arange(40), -cos[q]))[:3])
        got = list(out[out["vec_id"] == q]["nbr_id"])
        assert sorted(got) == sorted(exp)


def test_knn_graph_chunked_sweep_equals_single(ray_session):
    from biocypher_metta_ray.stages.knn import knn_graph

    import pyarrow as pa

    rng = np.random.default_rng(11)
    X = rng.normal(size=(30, 6))
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(30, dtype=np.int64)),
        "embedding": pa.array(X.tolist(), type=pa.list_(pa.float64())),
    }))
    one = knn_graph(ds, k=2).to_pandas().sort_values(
        ["vec_id", "nbr_id"]).reset_index(drop=True)
    many = knn_graph(ds, k=2, chunk_rows=7).to_pandas().sort_values(
        ["vec_id", "nbr_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(one, many)


def test_skipgram_pairs_hand_check(ray_session):
    from biocypher_metta_ray.stages.lm import skipgram_pairs

    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [0], "text": ["a b c"]}))
    out = skipgram_pairs(ds, window=2).to_pandas()
    got = {(r.w1, r.w2): r.n for r in out.itertuples()}
    # offsets 1: (a,b),(b,c) + reverses; offset 2: (a,c) + reverse
    assert got == {("a", "b"): 1, ("b", "a"): 1, ("b", "c"): 1,
                   ("c", "b"): 1, ("a", "c"): 1, ("c", "a"): 1}


def test_incremental_neardup_bucket_cap(ray_session):
    from biocypher_metta_ray.stages.dedup import incremental_neardup

    text = "the quick brown fox jumps over the lazy dog by the river " * 4
    other = "entirely different words about engines and shuffles here " * 4
    # base: 6 exact copies of `text`; delta: one copy + one unrelated
    base = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": list(range(6)), "text": [text] * 6}))
    delta = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [10, 11], "text": [text, other]}))
    out = incremental_neardup(
        delta, base, threshold=0.8, max_base_per_bucket=2
    ).to_pandas()
    # the capped candidates still verify at J=1 -> 10 dropped, 11 kept
    assert list(out["doc_id"]) == [11]


def test_scd2_history_intervals(ray_session):
    from biocypher_metta_ray.stages.joins import scd2_history

    old = ray.data.from_pandas(pd.DataFrame(
        {"k": [1, 2, 3], "v": [10.0, 20.0, 30.0]}))
    new = ray.data.from_pandas(pd.DataFrame(
        {"k": [2, 3, 4], "v": [20.0, 99.0, 40.0]}))
    out = scd2_history(old, new, ["k"], ["v"], "T0", "T1").to_pandas()
    rows = set(map(tuple, out[["k", "v", "valid_from", "valid_to"]]
                   .itertuples(index=False)))
    assert rows == {
        (1, 10.0, "T0", "T1"),            # removed: closed at T1
        (2, 20.0, "T0", "9999-12-31"),    # unchanged: one open row
        (3, 30.0, "T0", "T1"),            # changed: old closed...
        (3, 99.0, "T1", "9999-12-31"),    # ...new open
        (4, 40.0, "T1", "9999-12-31"),    # added: open at T1
    }


def test_hll_set_estimates_accuracy(ray_session):
    from biocypher_metta_ray.stages.sketch import hll_set_estimates

    a = ray.data.from_pandas(pd.DataFrame({"k": np.arange(0, 800)}))
    b = ray.data.from_pandas(pd.DataFrame({"k": np.arange(400, 1200)}))
    est = hll_set_estimates(a, "k", b, "k").iloc[0]
    # linear-counting regime: ~1-2% error at these cardinalities
    assert abs(est["est_a"] - 800) / 800 < 0.05
    assert abs(est["est_b"] - 800) / 800 < 0.05
    assert abs(est["est_union"] - 1200) / 1200 < 0.05
    assert abs(est["est_inter"] - 400) / 400 < 0.2  # variance adds


def test_encode_docs_oov_and_positions(ray_session):
    from biocypher_metta_ray.stages.text_stats import encode_docs

    vocab = pd.DataFrame({"token": ["a", "b"], "token_id": [0, 1],
                          "cnt": [5, 3]})
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [7], "text": ["a zzz B a"]}))  # B lowercases to b
    out = encode_docs(ds, vocab, unk_id=-1).to_pandas().sort_values("pos")
    assert list(out["token_id"]) == [0, -1, 1, 0]
    assert list(out["pos"]) == [0, 1, 2, 3]


def test_dedup_corpus_best_keeps_longest(ray_session):
    from biocypher_metta_ray.stages.dedup import dedup_corpus_best

    base = "the quick brown fox jumps over the lazy dog near a river "
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            base * 4,                    # cluster member, shorter
            base * 4 + "extra",          # LONGEST -> winner
            "a completely different unrelated document entirely",
            base * 4,                    # exact copy of 1
        ],
    })
    docs["n_chars"] = docs["text"].str.len().astype("int64")
    out = dedup_corpus_best(
        ray.data.from_pandas(docs), score_col="n_chars"
    ).to_pandas()
    # min-id rule would keep 1; the quality rule keeps 2 (longest)
    assert sorted(out["doc_id"]) == [2, 3]


def test_coverage_depth_hand_check(ray_session):
    from biocypher_metta_ray.stages.joins import coverage_depth

    # [0,4] and [2,6]: depth1 on 0-1 and 5-6 (4 bases), depth2 on 2-4
    df = pd.DataFrame({"chrom": [0, 0], "rstart": [0, 2],
                       "rend": [4, 6]}).astype(np.int64)
    out = coverage_depth(
        ray.data.from_pandas(df), ["chrom"], "rstart", "rend"
    ).to_pandas()
    got = {int(r.depth): int(r.bases) for r in out.itertuples()}
    assert got == {1: 4, 2: 3}
    # invariant: sum(depth * bases) == total covered interval mass
    assert sum(d * b for d, b in got.items()) == (5 + 5)


def test_leakage_safe_split_keeps_clusters_together(ray_session):
    from biocypher_metta_ray.stages.dedup import leakage_safe_split

    base = "the quick brown fox jumps over the lazy dog by a river "
    rows = []
    # 10 clusters of 3 near-identical docs each + 10 singletons
    for c in range(10):
        t = base.replace("fox", f"fox{c}") * 4
        for j in range(3):
            rows.append({"doc_id": c * 10 + j, "text": t + "x" * j,
                         "n_chars": 1})
    for s in range(10):
        rows.append({"doc_id": 1000 + s,
                     "text": f"unique document number {s} " * 8,
                     "n_chars": 1})
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    train, hold = leakage_safe_split(ds, fraction=0.5)
    tr, ho = train.to_pandas(), hold.to_pandas()
    assert len(tr) + len(ho) == len(rows)
    # no cluster is split across sides
    tr_g = set(tr["gid"]) if len(tr) else set()
    ho_g = set(ho["gid"]) if len(ho) else set()
    assert not (tr_g & ho_g)
    # clusters stay whole: members of one cluster share a gid
    both = pd.concat([tr, ho])
    for c in range(10):
        gids = both[both["doc_id"].isin([c * 10, c * 10 + 1,
                                         c * 10 + 2])]["gid"]
        assert gids.nunique() == 1
