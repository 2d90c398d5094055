"""Helper kernels + skew utilities."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from biocypher_metta_ray.functions.helpers import (
    build_region_id,
    build_variant_id,
    hash64_column,
    in_window,
    stable_hash64,
    to_float,
)


def test_to_float_clamp():
    # mirrors helpers.py:92-115 incl. the +inf/-inf quirks
    assert to_float("1.5") == 1.5
    assert to_float(0) == 0
    assert to_float("inf") == 1e307
    assert to_float("-inf") == 1e-307
    assert to_float("1e400") == 1e307  # overflow -> inf -> clamp
    assert abs(to_float("1.5e308") / 1.5e307 - 1) < 1e-9  # exponent rescale
    assert abs(to_float("3e-310") / 3e-307 - 1) < 1e-9


def test_id_builders():
    assert build_region_id("chr1", 5, 10) == "chr1_5_10_GRCh38"
    assert build_variant_id("X", 100, "A", "T") == "x_100_A_T_GRCh38"


def test_in_window():
    starts = np.array([5, 15, 25])
    ends = np.array([10, 20, 30])
    assert list(in_window(starts, ends, None, None)) == [True, True, True]
    assert list(in_window(starts, ends, 10, 25)) == [False, True, False]
    assert list(in_window(starts, ends, 15, None)) == [False, True, True]


def test_stable_hash_is_stable():
    assert stable_hash64("abc") == stable_hash64("abc")
    h = hash64_column(pa.array(["a", "b", None]))
    assert h[2] == 0 and h[0] != h[1]


def test_top_frequencies_finds_heavy_hitter(ray_session):
    from biocypher_metta_ray.stages.skew import top_frequencies

    rows = [{"k": "hot"}] * 500 + [{"k": f"cold{i}"} for i in range(100)]
    ds = ray.data.from_items(rows)
    top = top_frequencies(ds, ["k"], k=3)
    assert top.iloc[0]["k"] == "hot" and top.iloc[0]["n"] == 500


def test_salted_partition_spreads_hot_key(ray_session):
    from biocypher_metta_ray.stages.skew import PART_COL, add_hash_partition

    rows = [{"k": "hot", "v": i} for i in range(1000)]
    ds = ray.data.from_items(rows)
    plain = add_hash_partition(ds, ["k"], 8).to_pandas()
    assert plain[PART_COL].nunique() == 1  # one key -> one partition
    salted = add_hash_partition(ds, ["k"], 8, salt_col="v", num_salts=4).to_pandas()
    assert salted[PART_COL].nunique() == 4  # spread across sub-partitions


def test_partitioned_group_map_equals_per_group(ray_session):
    """Bounded-partition processing gives the same result as a naive
    per-group computation, for any partition count."""
    from biocypher_metta_ray.stages.skew import partitioned_group_map

    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        {"k": rng.integers(0, 50, 500), "v": rng.random(500).round(4)}
    )
    want = df.groupby("k")["v"].sum().round(4).sort_index()
    for parts in (1, 4, 32):
        ds = ray.data.from_pandas(df)
        got = partitioned_group_map(
            ds, ["k"],
            lambda g: g.groupby("k", as_index=False)["v"].sum(),
            parts,
        ).to_pandas()
        got = got.set_index("k")["v"].round(4).sort_index()
        pd.testing.assert_series_equal(got, want, check_names=False)


def test_hash_split_deterministic_and_disjoint(ray_session):
    from biocypher_metta_ray.stages.relational import hash_split

    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    train, hold = hash_split(ds, "doc_id", 0.8)
    a = set(train.to_pandas()["doc_id"])
    b = set(hold.to_pandas()["doc_id"])
    assert not (a & b) and len(a) + len(b) == 500
    assert 0.7 < len(a) / 500 < 0.9  # close to the requested fraction
    # reproducible across a second evaluation and partitioning
    train2, _ = hash_split(ds.repartition(7), "doc_id", 0.8)
    assert set(train2.to_pandas()["doc_id"]) == a
