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

import math
from typing import Callable

import numpy as np
import pandas as pd
import ray.data

PART_COL = "__part"

# Shuffle-partition sizing targets (the shuffle-side analog of
# stages/pool.py::autoscale_pool). A partitioned_group_map body
# receives ONE whole hash partition as an in-memory pandas DataFrame,
# so the partition count — not the block size — bounds task memory:
# a fixed num_partitions=16 that is fine at bench scale becomes a
# multi-TB task at 100x data. Partitions aim at TARGET_PARTITION_BYTES
# of input each; when data is plentiful the count also rises to the
# cluster CPU count (parallelism floor) as long as partitions stay
# above MIN_PARTITION_BYTES (so a big cluster never idles on 16 tasks,
# and a small input never shatters into confetti).
TARGET_PARTITION_BYTES = 256 << 20
MIN_PARTITION_BYTES = 16 << 20
MAX_PARTITIONS = 65536


def _estimated_bytes(op) -> int | None:
    """Metadata-only size estimate for a logical operator subtree:
    the operator's own inferred size when known, else the sum of its
    children's (a read op knows its size from parquet footers; most
    map stages don't, so this resolves to the upstream read — an
    input-bytes proxy for the shuffle volume). NEVER executes the
    plan; returns None when nothing in the subtree knows."""
    try:
        sb = op.infer_metadata().size_bytes
    except Exception:
        sb = None
    if sb:
        return int(sb)
    deps = list(getattr(op, "input_dependencies", []) or [])
    known = [s for s in (_estimated_bytes(d) for d in deps) if s]
    return sum(known) if known else None


def partitions_for_bytes(
    nbytes: int | None,
    default: int,
    target_bytes: int = TARGET_PARTITION_BYTES,
    cap: int = MAX_PARTITIONS,
) -> int:
    """Pure sizing rule (unit-tested directly): ``default`` is the
    FLOOR — toy inputs keep today's tuned counts and their ~2 s
    fixed-cost budget; above it the count grows linearly with input
    bytes so one partition stays ~``target_bytes``, with a parallelism
    floor of the cluster CPU count whenever partitions would still
    hold >= MIN_PARTITION_BYTES each."""
    if not nbytes or nbytes <= 0:
        return default
    need = math.ceil(nbytes / target_bytes)
    if need <= default:
        return default
    try:
        import ray

        cpus = (
            int(ray.cluster_resources().get("CPU", 0))
            if ray.is_initialized()
            else 0
        )
    except Exception:
        cpus = 0
    by_min = max(1, nbytes // MIN_PARTITION_BYTES)
    parts = max(need, min(cpus, by_min))
    return int(min(cap, max(default, parts)))


def autoscale_partitions(
    ds: ray.data.Dataset,
    default: int = 32,
    target_bytes: int = TARGET_PARTITION_BYTES,
) -> int:
    """Resolve a shuffle partition count from the dataset's estimated
    input bytes (parquet-footer metadata walked up the logical plan —
    no execution). Falls back to ``default`` when the size is unknown."""
    try:
        nbytes = _estimated_bytes(ds._logical_plan.dag)
    except Exception:
        nbytes = None
    return partitions_for_bytes(nbytes, default, target_bytes)


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
    coalesce: int | None | str = "auto",
    autoscale: bool = True,
) -> ray.data.Dataset:
    """Run ``fn`` once per hash partition (NOT per group). ``fn``
    receives every row of each key it sees and is expected to do its
    own vectorized ``df.groupby(key_cols)`` internally.

    ``num_partitions`` is the FLOOR: with ``autoscale`` (default) the
    count rises with the input's estimated bytes
    (:func:`autoscale_partitions`) so one partition's in-memory pandas
    body stays ~TARGET_PARTITION_BYTES however big the run — at toy /
    bench scale the estimate sits under the target and the passed
    count is used unchanged. ``autoscale=False`` pins it (callers
    whose input is provably bounded, e.g. register-scale sketches).

    ``coalesce``: block count to repartition to BEFORE the sort-based
    groupby. The groupby's range sort emits one output partition per
    INPUT BLOCK, and ``__part`` has exactly ``num_partitions`` distinct
    values, so any pre-sort block count above that guarantees empty
    ranges — which Ray materializes as schema-less zero-column pandas
    blocks (the "RefBundle with a different schema" executor warnings;
    the same class of untyped empty silently dropped pairs in round 2
    when it came from a group body) and as no-op merge tasks. The
    default ``"auto"`` coalesces to ``num_partitions // 2`` blocks:
    half the distinct-value count keeps every range populated under
    quantile boundary sampling, per-key work is unchanged (the body
    still runs once per key's partition), and the pre-sort pass is a
    split/merge (no shuffle) whose cost is repaid by the sort not
    sampling/splitting hundreds of tiny blocks (measured: small
    intermediates 9 s -> <1 s; corpus-scale bench queries within
    noise, see BASELINE.md). Explicit ints are capped the same way;
    ``None`` skips the pass (callers that KNOW their block count is
    already <= the partition count). Scales up alongside autoscaled
    ``num_partitions`` so a fact-scale run never funnels through a toy
    block count: ~2x TARGET_PARTITION_BYTES per merged block.

    Residual executor warnings that are DELIBERATE, not bugs: (a) when
    the key cardinality itself is below the coalesced block count
    (e.g. 3-group partials), some sort ranges are empty whatever the
    block count — the distinct ``__part`` values, not
    ``num_partitions``, bound the populated ranges, and key
    cardinality is unknowable pre-execution; (b) the tagged-union join
    bodies (stages/joins.py) union two sides with different column
    sets so each side ships only its OWN columns through the shuffle —
    aligning the schemas to silence the warning would widen every
    shuffled row with dtype-correct filler for the other side's
    columns, a real volume cost at scale; the merge-time NaN-fill is
    restored per partition by ``joins._safe_astype``.
    """
    if autoscale:
        scaled = autoscale_partitions(ds, default=num_partitions)
        if scaled > num_partitions:
            if coalesce is not None and coalesce != "auto":
                coalesce = max(coalesce, 2 * scaled)
            num_partitions = scaled
    parted = add_hash_partition(ds, key_cols, num_partitions)
    if coalesce == "auto":
        coalesce = num_partitions // 2
    if coalesce:
        parted = parted.repartition(max(1, min(coalesce, num_partitions // 2)))

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
