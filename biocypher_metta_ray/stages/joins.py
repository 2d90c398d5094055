"""Distributed joins: partitioned hash join + as-of join.

The reference only ever joins against broadcast dicts (SURVEY §2.3.5);
these operators cover the cases a 100 TB pipeline needs when BOTH
sides are large:

- :func:`hash_join` — prefers the native ``Dataset.join`` (Ray >= 2.46,
  hash-partitioned aggregators); falls back to the portable
  union-and-bucket pattern: tag both sides, hash-partition on the key
  into a bounded partition count, one vectorized pandas merge per
  partition (never per key — see stages/skew.py).
- :func:`asof_join` — per-key backward as-of: each left row picks the
  latest right row with ``ts_right <= ts_left``. Hash-partition by
  key, ``pd.merge_asof`` per partition. Partitioning assumption: all
  rows of one key fit one partition's memory (salt/split upstream for
  pathological keys).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from .skew import partitioned_group_map


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    how: str = "inner",
    num_partitions: int = 32,
    use_native: bool = True,
) -> ray.data.Dataset:
    """Join two large datasets on one key column."""
    if use_native and hasattr(left, "join"):
        return left.join(
            right, join_type=how, num_partitions=num_partitions, on=(on,)
        )

    lcols = [c for c in left.schema().names if c != on]
    rcols = [c for c in right.schema().names if c != on]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"non-key column overlap: {overlap}")

    def tag(side):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__side"] = side
            return df

        return fn

    both = left.map_batches(tag("L"), batch_format="pandas").union(
        right.map_batches(tag("R"), batch_format="pandas")
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == "L"][[on] + lcols]
        r = g[g["__side"] == "R"][[on] + rcols]
        return l.merge(r, on=on, how=how)

    return partitioned_group_map(both, [on], merge, num_partitions)


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    by: str,
    on: str,
    num_partitions: int = 16,
    suffix: str = "_right",
) -> ray.data.Dataset:
    """Backward as-of join: for each left row, the latest right row of
    the same ``by`` key with ``right[on] <= left[on]``.
    """
    lcols = left.schema().names
    rcols = right.schema().names

    def tag(side):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__side"] = side
            return df

        return fn

    both = left.map_batches(tag("L"), batch_format="pandas").union(
        right.map_batches(tag("R"), batch_format="pandas")
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == "L"][lcols].sort_values(on, kind="mergesort")
        r = g[g["__side"] == "R"][rcols].sort_values(on, kind="mergesort")
        if l.empty:
            return pd.DataFrame(columns=lcols)
        return pd.merge_asof(
            l, r, on=on, by=by, direction="backward", suffixes=("", suffix)
        )

    return partitioned_group_map(both, [by], merge, num_partitions)
