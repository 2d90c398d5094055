"""Hash partitioning + skew utilities.

``Dataset.groupby(key).map_groups(fn)`` invokes ``fn`` once per GROUP
— per-group Python overhead is ruinous when groups are plentiful and
tiny (measured: 80k singleton LSH buckets cost ~25 s of pure pandas
construction). The scalable shape is: hash-partition rows into a
BOUNDED number of partitions (every row of a key lands in the same
partition), then run ONE vectorized pandas body per partition that
does its own C-speed ``DataFrame.groupby`` internally.

Also home to the salting helpers for skewed keys: a hot key is split
across ``salt`` sub-keys for the partial phase and re-merged in the
final phase (north_rule: "skew handled explicitly").
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import ray.data

PART_COL = "__part"


def add_hash_partition(
    ds: ray.data.Dataset,
    key_cols: list[str],
    num_partitions: int,
    salt_col: str | None = None,
    num_salts: int = 1,
) -> ray.data.Dataset:
    """Append a ``__part`` column = stable hash of ``key_cols`` modulo
    ``num_partitions``.

    With ``salt_col``/``num_salts``, rows are additionally spread
    across ``num_salts`` sub-partitions independent of the key — use
    for the PARTIAL phase on skewed keys (each salt computes a partial
    result; a second, unsalted pass merges them).
    """

    def add(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[key_cols], index=False).to_numpy()
        part = h % np.uint64(num_partitions)
        if salt_col is not None and num_salts > 1:
            salt = (
                np.arange(len(df), dtype=np.uint64) % np.uint64(num_salts)
            )
            part = part * np.uint64(num_salts) + salt
        df = df.copy()
        df[PART_COL] = part.astype("int64")
        return df

    return ds.map_batches(add, batch_format="pandas")


def partitioned_group_map(
    ds: ray.data.Dataset,
    key_cols: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_partitions: int = 32,
    coalesce: int | None = None,
) -> ray.data.Dataset:
    """Run ``fn`` once per hash partition (NOT per group). ``fn``
    receives every row of each key it sees and is expected to do its
    own vectorized ``df.groupby(key_cols)`` internally.

    ``coalesce``: block count to repartition to BEFORE the sort-based
    groupby. The sort pays a fixed per-block cost, so a stage whose
    input is a SMALL intermediate spread over many tiny blocks (union
    outputs, per-band rows) should coalesce to ~2x its partition
    count; leave None for corpus-scale inputs where the extra pass
    isn't worth it.
    """
    parted = add_hash_partition(ds, key_cols, num_partitions)
    if coalesce:
        parted = parted.repartition(coalesce)

    def body(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g.drop(columns=[PART_COL]))

    return parted.groupby(PART_COL).map_groups(body, batch_format="pandas")


def top_frequencies(
    ds: ray.data.Dataset, key_cols: list[str], k: int = 64,
    cap_factor: int = 8,
) -> pd.DataFrame:
    """Approximate heavy-hitter detection: per-batch partial counts,
    driver-side merge, top-k. Used to pick salting candidates.

    Each batch contributes only its LOCAL top ``cap_factor * k`` keys,
    so the driver merge is bounded at batches x (cap_factor x k) rows
    no matter how high the key cardinality — on a 100 TB input an
    uncapped merge would collect (distinct-keys-per-batch x batches)
    rows. A key hot enough to matter globally is a local heavy hitter
    in the batches that hold its mass (pigeonhole over per-batch
    counts), so true salting candidates survive the cap; counts for
    keys dropped from some batches are lower bounds, which is the
    right direction for a skew PROBE (never overestimates heat).
    """
    cap = cap_factor * k

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        p = df.groupby(key_cols, sort=False).size().reset_index(name="n")
        if len(p) > cap:
            p = p.nlargest(cap, "n")
        return p

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    merged = parts.groupby(key_cols, sort=False)["n"].sum().reset_index()
    return merged.nlargest(k, "n").reset_index(drop=True)
