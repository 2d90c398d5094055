"""Round-4 scale fixes, each mapped to a VERDICT.md r3 item:

1. autoscale_partitions — shuffle partition counts grow with input
   bytes while toy inputs keep their tuned defaults
2. chunked kmeans assign kernel — memory bounded, result identical
   (including lowest-index tie-breaks) to the unchunked kernel
3. heavy_hitters candidate flow bounded — degenerate thresholds route
   the verify pass through the distributed semi_join, never a
   driver-resident set
4. dtype-faithful empty frames from partitioned_group_map bodies
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data


# ---------------------------------------------------------------------------
# 1. autoscale_partitions
# ---------------------------------------------------------------------------


def test_partitions_for_bytes_grows_with_input():
    from biocypher_metta_ray.stages.skew import partitions_for_bytes

    # unknown / toy sizes keep the caller's tuned default untouched
    assert partitions_for_bytes(None, 16) == 16
    assert partitions_for_bytes(0, 16) == 16
    assert partitions_for_bytes(10 << 20, 16) == 16
    assert partitions_for_bytes(4 << 30, 16) == 16  # 4 GB / 256 MB = 16
    # above the floor the count tracks bytes / target
    assert partitions_for_bytes(16 << 30, 16) >= 64
    assert partitions_for_bytes(100 << 30, 16) >= 400
    big = partitions_for_bytes(100 * (1 << 40), 16)  # 100 TB
    assert big == 65536  # capped, monotone
    # monotone in bytes
    sizes = [1 << 30, 8 << 30, 64 << 30, 1 << 40]
    counts = [partitions_for_bytes(s, 16) for s in sizes]
    assert counts == sorted(counts)


def test_estimated_bytes_from_parquet_metadata(ray_session, tmp_path):
    """The estimate resolves from parquet footers through map stages
    and sums across union branches — without executing the plan."""
    from biocypher_metta_ray.stages.skew import _estimated_bytes

    pa_tbl = pa.table({"k": np.arange(5000, dtype=np.int64),
                       "v": np.arange(5000, dtype=np.float64)})
    import pyarrow.parquet as pq

    pq.write_table(pa_tbl, tmp_path / "t.parquet")
    ds = ray.data.read_parquet(str(tmp_path / "t.parquet"))
    base = _estimated_bytes(ds._logical_plan.dag)
    assert base and base > 0
    mapped = ds.map_batches(lambda b: b, batch_format="pyarrow")
    assert _estimated_bytes(mapped._logical_plan.dag) == base
    unioned = ds.union(ds)
    assert _estimated_bytes(unioned._logical_plan.dag) == 2 * base


def test_partitioned_group_map_autoscale_keeps_toy_counts(ray_session):
    """On toy inputs the autoscaled count equals the passed default
    (same partitions, same results as round 3)."""
    from biocypher_metta_ray.stages.skew import (
        autoscale_partitions, partitioned_group_map,
    )

    ds = ray.data.from_pandas(
        pd.DataFrame({"k": np.arange(100) % 7, "v": np.arange(100)})
    )
    assert autoscale_partitions(ds, default=16) == 16
    out = partitioned_group_map(
        ds, ["k"],
        lambda g: g.groupby("k", sort=False)["v"].sum().reset_index(),
        num_partitions=4,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    exp = (
        pd.DataFrame({"k": np.arange(100) % 7, "v": np.arange(100)})
        .groupby("k")["v"].sum().reset_index()
    )
    pd.testing.assert_frame_equal(out, exp)


# ---------------------------------------------------------------------------
# 2. chunked kmeans assign
# ---------------------------------------------------------------------------


def test_assign_chunked_matches_unchunked_and_bounds_memory():
    """At B=2000, k=512, d=128 the unchunked (B, k, d) tensor would be
    ~1 GB; the chunked kernel allocates <= budget and returns the
    identical assignment, ties included."""
    from biocypher_metta_ray.stages.cluster import _assign

    rng = np.random.RandomState(7)
    B, k, d = 2100, 512, 128
    assert B * k * d * 8 > (1 << 30)
    X = rng.rand(B, d)
    cents = rng.rand(k, d)
    # duplicate some centroids to force exact distance ties
    cents[100] = cents[3]
    cents[511] = cents[0]
    got = _assign(X, cents, budget_bytes=8 << 20)
    # reference: unchunked kernel computed in row slabs (memory-safe
    # for the TEST only; per-element arithmetic identical)
    exp = np.concatenate([
        ((X[i:i + 100, None, :] - cents[None, :, :]) ** 2)
        .sum(axis=2).argmin(axis=1)
        for i in range(0, B, 100)
    ])
    np.testing.assert_array_equal(got, exp)
    # a point sitting exactly ON a duplicated centroid ties between
    # index 3 and 100 -> must pick 3 (lowest)
    X2 = cents[[100, 511]]
    np.testing.assert_array_equal(
        _assign(X2, cents, budget_bytes=1 << 16), [3, 0]
    )


def test_assign_empty_batch():
    from biocypher_metta_ray.stages.cluster import _assign

    out = _assign(np.zeros((0, 8)), np.random.RandomState(0).rand(4, 8))
    assert out.shape == (0,)


# ---------------------------------------------------------------------------
# 3. heavy_hitters bounded candidates
# ---------------------------------------------------------------------------


def _hh_frame():
    vals = (["hot"] * 40 + ["warm"] * 10
            + [f"cold{i}" for i in range(300)])
    return pd.DataFrame({"w": vals})


def test_heavy_hitters_degenerate_threshold_uses_semi_join(ray_session,
                                                           monkeypatch):
    """min_count=1 makes EVERY key a candidate; with a tiny driver_cap
    the distributed path must produce the exact answer and ray.put
    must never receive a candidate set."""
    import biocypher_metta_ray.stages.sketch as sketch

    ds = ray.data.from_pandas(_hh_frame()).repartition(4)

    put_sizes = []
    real_put = ray.put

    def spy_put(obj, **kw):
        if isinstance(obj, set):
            put_sizes.append(len(obj))
        return real_put(obj, **kw)

    monkeypatch.setattr(sketch.ray, "put", spy_put)
    out = sketch.heavy_hitters(
        ds, "w", min_count=1, num_partitions=4, driver_cap=8
    ).to_pandas().sort_values("w").reset_index(drop=True)
    assert put_sizes == []  # no driver-resident candidate set
    exp = (
        _hh_frame().groupby("w").size().reset_index(name="n")
        .sort_values("w").reset_index(drop=True)
    )
    exp["n"] = exp["n"].astype("int64")
    pd.testing.assert_frame_equal(out, exp)


def test_heavy_hitters_fast_path_still_exact(ray_session):
    from biocypher_metta_ray.stages.sketch import heavy_hitters

    ds = ray.data.from_pandas(_hh_frame()).repartition(4)
    out = heavy_hitters(ds, "w", min_count=10, num_partitions=4)
    got = out.to_pandas().sort_values("w").reset_index(drop=True)
    exp = pd.DataFrame({"w": ["hot", "warm"], "n": [40, 10]})
    exp["n"] = exp["n"].astype("int64")
    pd.testing.assert_frame_equal(got, exp)


# ---------------------------------------------------------------------------
# 4. dtype-faithful empty partitions survive a union
# ---------------------------------------------------------------------------


def test_group_map_blocks_keep_schema(ray_session):
    """The coalesce cap keeps pre-sort blocks <= num_partitions // 2
    so the range sort's zero-column empty-range blocks (the 'RefBundle
    with a different schema' executor warnings, round-3 bench tail)
    become rare instead of guaranteed. They cannot be eliminated
    outright — Ray samples sort boundaries, and two samples landing on
    the same __part value yields an empty range regardless of block
    count — so the deterministic contract asserted here is: every
    block that carries ROWS carries the body's exact typed schema, and
    the result is exact. (The round-2 pair-loss bug class — untyped
    empties from OUR bodies — is covered by
    test_empty_partition_keeps_key_dtype below.)"""
    import ray as _ray

    from biocypher_metta_ray.stages.skew import partitioned_group_map

    df = pd.DataFrame(
        {"w": [f"k{i % 40}" for i in range(400)],
         "n": np.ones(400, dtype=np.int64)}
    )
    ds = ray.data.from_pandas(df).repartition(8)
    out = partitioned_group_map(
        ds, ["w"],
        lambda g: g.groupby("w", sort=False)["n"].sum().reset_index(),
        num_partitions=16, coalesce=32,
    ).materialize()
    assert out.count() == 40
    for bundle in out.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            block = _ray.get(block_ref)
            if len(block) == 0:
                continue
            assert list(block.columns) == ["w", "n"]
            assert block["n"].dtype == np.int64


def test_empty_partition_keeps_key_dtype(ray_session):
    """A partition whose body returns empty must keep int64 key dtype
    so downstream hash partitioning co-locates with the typed blocks."""
    from biocypher_metta_ray.stages.skew import partitioned_group_map

    df = pd.DataFrame({"k": np.arange(32, dtype=np.int64),
                       "v": np.ones(32, dtype=np.int64)})
    ds = ray.data.from_pandas(df)

    def body(g: pd.DataFrame) -> pd.DataFrame:
        out = g[g["k"] < 4]
        return out.groupby("k", sort=False)["v"].sum().reset_index()

    res = partitioned_group_map(ds, ["k"], body, num_partitions=8)
    pdf = res.to_pandas()
    assert pdf["k"].dtype == np.int64
    assert sorted(pdf["k"]) == [0, 1, 2, 3]
