"""DSIR importance weights (stages/selection.py)."""

import numpy as np
import pyarrow as pa
import ray.data

from biocypher_metta_ray.stages.selection import dsir_weights


def _ds(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
        "is_target": pa.array([r[2] for r in rows], type=pa.bool_()),
    }))


def test_dsir_orders_target_like_docs_first(ray_session):
    # target corpus speaks "alpha beta"; raw speaks "zeta yotta";
    # a raw doc written in target vocabulary must outscore its peers
    rows = (
        [(i, "alpha beta alpha beta", True) for i in range(5)]
        + [(10 + i, "zeta yotta zeta yotta", False) for i in range(5)]
        + [(99, "alpha beta alpha beta", False)]
    )
    out = dsir_weights(_ds(rows)).to_pandas().set_index("doc_id")
    assert (out["n_tokens"] == 4).all()
    raw = out.loc[[10, 11, 12, 13, 14, 99]]
    assert raw["dsir_logweight"].idxmax() == 99
    assert out.loc[99, "dsir_logweight"] > 0
    assert out.loc[10, "dsir_logweight"] < 0
    # same text, same features -> identical score on both sides
    assert np.isclose(out.loc[99, "dsir_logweight"],
                      out.loc[0, "dsir_logweight"])


def test_dsir_deterministic_across_partitionings(ray_session):
    rows = [(i, f"tok{i % 7} tok{i % 3} common", i % 4 == 0)
            for i in range(40)]
    a = dsir_weights(_ds(rows)).to_pandas().sort_values("doc_id")
    b = dsir_weights(_ds(rows).repartition(13)).to_pandas() \
        .sort_values("doc_id")
    np.testing.assert_allclose(a["dsir_logweight"].to_numpy(),
                               b["dsir_logweight"].to_numpy())


def test_dsir_empty_and_single_token(ray_session):
    rows = [(1, "solo", True), (2, "solo", False)]
    out = dsir_weights(_ds(rows)).to_pandas()
    assert len(out) == 2
    assert set(out["n_tokens"]) == {1}


def test_dsir_resample_deterministic_and_weight_biased(ray_session):
    from biocypher_metta_ray.stages.selection import dsir_resample

    # target speaks "alpha"; raw docs 0..49 speak alpha (target-like),
    # 50..99 speak zeta — the sample must over-represent the alphas
    rows = (
        [(1000 + i, "alpha alpha alpha", True) for i in range(5)]
        + [(i, "alpha alpha alpha", False) for i in range(50)]
        + [(50 + i, "zeta zeta zeta", False) for i in range(50)]
    )
    a = dsir_resample(_ds(rows), k=30)
    b = dsir_resample(_ds(rows).repartition(7), k=30)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert len(a) == 30
    picked_raw = [d for d in a["doc_id"] if d < 1000]
    n_alpha = sum(1 for d in picked_raw if d < 50)
    n_zeta = sum(1 for d in picked_raw if 50 <= d < 100)
    assert n_alpha > n_zeta
