"""Round-5 fixes, each mapped to an ADVICE.md r4 item:

1. char_pair_counts — an EMPTY FIRST row in a batch must not mask the
   last byte pair of the batch buffer (the `starts - 1` -1 wraparound)
2. k_truss — k <= 2 returns the whole canonical edge set, including
   triangle-free edges that never appear in the support table
3. ancestor_closure — depth-1 base level is deduplicated, so duplicate
   (child, parent) input rows emit ONE (node, ancestor, 1) row
4. _cov_stats — n < 2 raises ValueError instead of inf/nan propagation
5. scd2_history — duplicate keys in a snapshot raise instead of
   silently cross-producting interval rows
"""

import pandas as pd
import pytest

import ray.data


def _pair_counts(docs):
    from biocypher_metta_ray.stages.lm import char_pair_counts

    ds = ray.data.from_pandas(pd.DataFrame({"text": docs}))
    out = char_pair_counts(ds, k=100)
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    return dict(zip(out["pair"], out["cnt"]))


def test_char_pair_counts_empty_first_row(ray_session):
    # the empty doc FIRST: before the fix, ok[-1] = False dropped the
    # final ('d', 'e') pair of the batch buffer
    got = _pair_counts(["", "abc", "de"])
    assert got == {"ab": 1, "bc": 1, "de": 1}
    # empty doc mid-batch and last (regression guard both ways)
    assert _pair_counts(["abc", "", "de"]) == {"ab": 1, "bc": 1, "de": 1}
    assert _pair_counts(["abc", "de", ""]) == {"ab": 1, "bc": 1, "de": 1}
    # two leading empties
    assert _pair_counts(["", "", "xy"]) == {"xy": 1}


def test_k_truss_k2_is_whole_graph(ray_session):
    from biocypher_metta_ray.stages.graph import k_truss

    # a triangle-free path graph: the 2-truss is by definition the
    # whole simple graph, even though no edge has triangle support
    edges = ray.data.from_pandas(pd.DataFrame(
        {"src": [1, 2, 3, 3], "dst": [2, 3, 4, 4]}))
    out = k_truss(edges, k=2).to_pandas().sort_values(
        ["u", "v"]).reset_index(drop=True)
    assert out.to_dict("list") == {"u": [1, 2, 3], "v": [2, 3, 4]}
    # k=3 on the same graph: zero triangles, everything peels
    assert len(k_truss(edges, k=3).to_pandas()) == 0


def test_ancestor_closure_dedups_base_level(ray_session):
    from biocypher_metta_ray.stages.graph import ancestor_closure

    # duplicate (1, 2) edge rows; set semantics require ONE
    # (1, 2, depth=1) output row
    edges = ray.data.from_pandas(pd.DataFrame(
        {"child": [1, 1, 1, 2], "parent": [2, 2, 2, 3]}))
    out = ancestor_closure(edges, max_depth=3).to_pandas()
    rows = sorted(map(tuple, out[["node", "ancestor", "depth"]]
                      .to_numpy().tolist()))
    assert rows == [(1, 2, 1), (1, 3, 2), (2, 3, 1)]


def test_cov_stats_rejects_tiny_inputs(ray_session):
    from biocypher_metta_ray.stages.cluster import covariance_matrix

    one = ray.data.from_pandas(pd.DataFrame(
        {"embedding": [[1.0, 2.0]]}))
    with pytest.raises(ValueError, match="at least 2 rows"):
        covariance_matrix(one)
    empty = ray.data.from_pandas(pd.DataFrame(
        {"embedding": pd.Series([], dtype="object")}))
    with pytest.raises(ValueError, match="at least 2 rows"):
        covariance_matrix(empty)
    # n == 2 still works
    two = ray.data.from_pandas(pd.DataFrame(
        {"embedding": [[0.0, 0.0], [2.0, 4.0]]}))
    cov = covariance_matrix(two)
    got = dict(zip(zip(cov["i"], cov["j"]), cov["cov"]))
    assert got[(0, 0)] == pytest.approx(2.0)
    assert got[(1, 1)] == pytest.approx(8.0)
    assert got[(0, 1)] == pytest.approx(4.0)


def test_scd2_history_rejects_duplicate_keys(ray_session):
    from biocypher_metta_ray.stages.joins import scd2_history

    old = ray.data.from_pandas(pd.DataFrame(
        {"k": [1, 1], "v": ["a", "b"]}))
    new = ray.data.from_pandas(pd.DataFrame(
        {"k": [1], "v": ["c"]}))
    with pytest.raises(Exception, match="duplicate key"):
        scd2_history(old, new, key=["k"], compare_cols=["v"],
                     t_old="2024-01-01", t_new="2024-02-01").to_pandas()
    # unique keys still work end-to-end
    ok = scd2_history(
        ray.data.from_pandas(pd.DataFrame({"k": [1], "v": ["a"]})),
        ray.data.from_pandas(pd.DataFrame({"k": [1], "v": ["b"]})),
        key=["k"], compare_cols=["v"],
        t_old="2024-01-01", t_new="2024-02-01").to_pandas()
    assert len(ok) == 2  # closed old row + born new row
