"""Relational operators, Ray-Data-first.

The reference's join/filter/project/aggregate vocabulary (SURVEY §2.3)
re-expressed as reusable Ray Data combinators:

- :func:`broadcast_join` — inner hash join against a small side
  shipped once via ``ray.put`` (reference: broadcast-dict joins,
  tflink_adapter.py:42-44; drop-on-miss semantics).
- :func:`semi_join_filter` / :func:`anti_join_filter` — broadcast key
  set membership filters (peregrine_adapter.py:121-122).
- :func:`grouped_agg` — partial (within-batch) aggregation before the
  shuffle, then a small grouped final combine: sum/count/min/max
  compose exactly; mean derives as sum/count at the end.
- :func:`top_k` — per-batch partial top-k then a driver-side merge of
  k rows per block.

All kernels are pandas/pyarrow vectorized; no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .pool import autoscale_pool


def broadcast_join(
    ds: ray.data.Dataset,
    small_df: pd.DataFrame,
    on: str,
    how: str = "inner",
    concurrency: int | tuple | None = None,
) -> ray.data.Dataset:
    """Join ``ds`` against a small pandas side; the small table is put
    in the object store once and merged per batch inside an actor pool."""
    ref = ray.put(small_df)

    class Join:
        def __init__(self):
            self.small = ray.get(ref) if not isinstance(ref, pd.DataFrame) else ref

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch.merge(self.small, on=on, how=how)

    return ds.map_batches(Join, batch_format="pandas", concurrency=autoscale_pool(concurrency))


def semi_join_filter(
    ds: ray.data.Dataset, keys, on: str
) -> ray.data.Dataset:
    """Keep rows whose ``on`` value is in ``keys`` (broadcast set)."""
    key_arr = pa.array(sorted(set(keys)))
    ref = ray.put(key_arr)

    def filt(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref) if not isinstance(ref, pa.Array) else ref
        return batch.filter(pc.is_in(batch[on], value_set=ks))

    return ds.map_batches(filt, batch_format="pyarrow")


def anti_join_filter(
    ds: ray.data.Dataset, keys, on: str
) -> ray.data.Dataset:
    """Keep rows whose ``on`` value is NOT in ``keys``."""
    key_arr = pa.array(sorted(set(keys)))
    ref = ray.put(key_arr)

    def filt(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref) if not isinstance(ref, pa.Array) else ref
        return batch.filter(pc.invert(pc.is_in(batch[on], value_set=ks)))

    return ds.map_batches(filt, batch_format="pyarrow")


def grouped_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    sums: list[str] | None = None,
    count_as: str | None = None,
    shuffle_partitions: int = 16,
    driver_finish_bytes: int = 16 << 20,
) -> ray.data.Dataset:
    """Grouped sum/count with map-side combining.

    Each batch first collapses to one row per key (partial sums +
    partial count). The combined partials are SIZE-ADAPTIVE: under
    ``driver_finish_bytes`` (the partials are materialized anyway, so
    the size is exact metadata) the final sum runs driver-side — a
    low-cardinality aggregate (TPC-H Q1: 4 groups) skips the ~2 s
    sort-shuffle fixed cost AND the empty sort ranges it produces
    (blocks > distinct keys -> schema-less empty blocks, the RefBundle
    executor warnings). Above it, a ``groupby().aggregate(Sum(...))``
    shuffle over the partials — the shuffle carries |keys| rows per
    batch, not every input row.
    """
    sums = sums or []

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(keys, sort=False, as_index=False)
        agg = g[sums].sum() if sums else g.size().rename(columns={"size": "__n"})
        if sums:
            agg["__n"] = g.size()["size"].values
        return agg

    partials = ds.map_batches(partial, batch_format="pandas").materialize()
    try:
        nbytes = partials.size_bytes()
    except Exception:
        nbytes = None
    if nbytes is not None and nbytes < driver_finish_bytes:
        pdf = partials.to_pandas()
        if len(pdf.columns) == 0:
            # Ray's to_pandas() drops columns on 0-row datasets even
            # though the Dataset schema is intact — rebuild the typed
            # empty from the schema so the groupby below keeps its
            # key/sum columns (an all-empty input is a valid corpus)
            sch = partials.schema()
            cols = {}
            if sch is not None and getattr(sch, "names", None):
                for c, t in zip(sch.names, sch.types):
                    try:
                        cols[c] = pd.Series(dtype=t)
                    except (TypeError, ValueError):
                        cols[c] = pd.Series(
                            dtype=getattr(t, "to_pandas_dtype",
                                          lambda: "object")())
            else:
                # schema unavailable (all blocks empty): fall back to
                # this function's own column contract
                cols = {c: pd.Series(dtype="object") for c in keys}
                cols.update(
                    {c: pd.Series(dtype="float64") for c in sums})
                cols["__n"] = pd.Series(dtype="int64")
            pdf = pd.DataFrame(cols)
        out = pdf.groupby(keys, sort=False, as_index=False)[
            sums + ["__n"]].sum()
        if count_as is None:
            out = out.drop(columns=["__n"])
        else:
            out = out.rename(columns={"__n": count_as})
        return ray.data.from_pandas(out)

    # coalesce the (fact-scale) partials before the sort-based shuffle
    # — per-block overhead dominates otherwise (see BASELINE.md notes).
    # For HIGH-CARDINALITY keys the partials barely shrink: raise
    # shuffle_partitions so blocks stay memory-sized and the shuffle
    # keeps parallelism.
    partials = partials.repartition(shuffle_partitions)
    from ray.data.aggregate import Sum

    aggs = [Sum(c, alias_name=c) for c in sums]
    aggs.append(Sum("__n", alias_name=count_as or "__n"))
    out = partials.groupby(keys).aggregate(*aggs)
    if count_as is None:
        out = out.drop_columns(["__n"])
    return out


def top_k(
    ds: ray.data.Dataset,
    k: int,
    by: list[str],
    ascending: list[bool],
) -> pd.DataFrame:
    """Global top-k: per-batch partial top-k inside map_batches, then a
    driver merge over k rows per block (never a full sort shuffle)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(by, ascending=ascending).head(k)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    return (
        parts.sort_values(by, ascending=ascending)
        .head(k)
        .reset_index(drop=True)
    )


def stratified_sample(
    ds: ray.data.Dataset,
    group_cols: list[str],
    order_col: str,
    k: int,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Deterministic per-group sampling: the ``k`` rows with the
    smallest ``order_col`` per group (order by a content hash/
    fingerprint column for an unbiased-but-reproducible sample;
    equivalent to SQL ``row_number() OVER (PARTITION BY g ORDER BY o)
    <= k``). Hash-partitioned, vectorized per partition."""
    from .skew import partitioned_group_map

    def body(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values([*group_cols, order_col], kind="mergesort")
            .groupby(group_cols, sort=False)
            .head(k)
        )

    return partitioned_group_map(ds, group_cols, body, num_partitions)


def grouped_quantiles(
    ds: ray.data.Dataset,
    group_cols: list[str],
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.9),
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """EXACT per-group quantiles, linear interpolation (numpy/pandas
    ``interpolation='linear'`` == ANSI ``quantile_cont`` — verified
    value-identical against DuckDB in the oracle suite). Output
    columns ``p50``-style, float64.

    Exact quantiles are not decomposable, but their HISTOGRAM is:
    each batch emits ``(group, value, count)`` partials, so what
    shuffles is bounded by distinct values per block — for a discrete
    or low-cardinality column that collapses a fact-scale shuffle to
    kilobytes, and for a continuous column it degrades gracefully to
    the raw rows (distinct == rows). Per partition, one weighted
    linear-interpolation quantile per group over the merged histogram
    reproduces ``numpy``'s formula exactly (a[floor(h)] + frac *
    (a[floor(h)+1] - a[floor(h)]), h = (N-1)q, order statistics
    resolved through cumulative counts). The worst single group's
    HISTOGRAM must fit a worker; a group whose distinct-value set is
    itself corpus-scale needs the mergeable quantile sketch instead —
    the trade is the caller's, same contract as
    sketch.hll_count_distinct vs exact distinct."""
    from .skew import partitioned_group_map

    names = [f"p{int(round(q * 100)):02d}" for q in qs]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby([*group_cols, value_col], sort=False)
            .size()
            .reset_index(name="__n")
        )

    def body(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, grp in g.groupby(group_cols, sort=False):
            uv, inv = np.unique(
                grp[value_col].to_numpy(), return_inverse=True
            )
            cnt = np.zeros(len(uv), dtype=np.int64)
            np.add.at(cnt, inv, grp["__n"].to_numpy(np.int64))
            cum = np.cumsum(cnt)
            n = int(cum[-1])
            if not isinstance(key, tuple):
                key = (key,)
            row = dict(zip(group_cols, key))
            for name, q in zip(names, qs):
                h = (n - 1) * q
                lo = int(np.floor(h))
                vlo = np.float64(uv[np.searchsorted(cum, lo, side="right")])
                vhi = np.float64(
                    uv[np.searchsorted(cum, min(lo + 1, n - 1), side="right")]
                )
                row[name] = float(vlo + (h - lo) * (vhi - vlo))
            rows.append(row)
        return pd.DataFrame(rows)

    return partitioned_group_map(
        ds.select_columns([*group_cols, value_col]).map_batches(
            partial, batch_format="pandas"
        ),
        group_cols,
        body,
        num_partitions,
        coalesce=2 * num_partitions,
    )


def grouped_mad(
    ds: ray.data.Dataset,
    group_cols: list[str],
    value_col: str,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-group median absolute deviation — the robust spread
    statistic data-quality pipelines use where stddev is ruined by
    outliers. Output: (group, med, mad) with ``quantile_cont``
    interpolation on both medians (DuckDB ``median()`` parity).

    Two :func:`grouped_quantiles` passes with a broadcast between:
    pass 1 yields the GROUP-SCALE median table (collected driver-side
    under the small-result contract, then ``ray.put``), the corpus
    streams once through a vectorized |x - med| map, and pass 2 takes
    the median of deviations. The corpus never shuffles beyond the
    two histogram-partial co-locations; the broadcast is O(groups)."""
    import ray as _ray

    med = grouped_quantiles(ds, group_cols, value_col, qs=(0.5,),
                            num_partitions=num_partitions).to_pandas()
    med = med.rename(columns={"p50": "med"})
    lookup = _ray.put(med.set_index(group_cols)["med"])

    def dev(df: pd.DataFrame) -> pd.DataFrame:
        m = _ray.get(lookup)
        if len(group_cols) == 1:
            keys = df[group_cols[0]]
        else:
            keys = pd.MultiIndex.from_frame(df[group_cols])
        med_vals = m.reindex(keys).to_numpy(dtype=np.float64)
        out = df[group_cols].copy()
        out["dev"] = np.abs(
            df[value_col].to_numpy(dtype=np.float64) - med_vals)
        return out

    devs = ds.select_columns([*group_cols, value_col]).map_batches(
        dev, batch_format="pandas")
    mad = grouped_quantiles(devs, group_cols, "dev", qs=(0.5,),
                            num_partitions=num_partitions).to_pandas()
    mad = mad.rename(columns={"p50": "mad"})
    return ray.data.from_pandas(med.merge(mad, on=group_cols))


def hash_split(
    ds: ray.data.Dataset,
    key_col: str,
    fraction: float,
    salt: str = "split",
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Deterministic train/holdout split on a stable key hash: the
    same key always lands on the same side, across runs, partitionings
    and cluster sizes (never ``random_sample`` for reproducible
    pipelines)."""
    from ..functions.helpers import hash64_column

    cut = int(fraction * 10_000)

    def side(keep: bool):
        def f(batch: pa.Table) -> pa.Table:
            keys = [
                f"{salt}:{v}" for v in batch[key_col].to_pylist()
            ]
            bucket = hash64_column(pa.array(keys)) % np.uint64(10_000)
            mask = bucket < cut if keep else bucket >= cut
            return batch.filter(pa.array(mask))

        return f

    return (
        ds.map_batches(side(True), batch_format="pyarrow"),
        ds.map_batches(side(False), batch_format="pyarrow"),
    )


def winsorize(
    ds: ray.data.Dataset,
    group_cols: list[str],
    value_col: str,
    out_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-group outlier clipping: clamp ``value_col`` to the group's
    [lo, hi] quantile band (the length/score outlier-trim step of a
    data-cleaning pipeline). Quantiles come from
    :func:`grouped_quantiles` (one co-located shuffle of the two
    needed columns, dimension-cardinality output), are collected and
    broadcast once (``ray.put``), and the corpus itself streams
    through a vectorized merge+clip — never shuffles. Clipped values
    rounded to 6 (float-oracle contract)."""
    qs = grouped_quantiles(
        ds, group_cols, value_col, qs=(lo, hi),
        num_partitions=num_partitions,
    ).to_pandas()
    names = [f"p{int(round(q * 100)):02d}" for q in (lo, hi)]
    bounds = qs.rename(columns={names[0]: "__lo", names[1]: "__hi"})
    bounds_ref = ray.put(bounds)

    def clip(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(bounds_ref)
        m = df.merge(b, on=group_cols, how="left")
        v = m[value_col].to_numpy(dtype=np.float64)
        clipped = np.clip(v, m["__lo"].to_numpy(), m["__hi"].to_numpy())
        out = df.copy()
        out[out_col] = np.round(clipped, 6)
        return out

    return ds.map_batches(clip, batch_format="pandas")


def mix_sample(
    ds: ray.data.Dataset,
    group_col: str,
    key_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "mix",
) -> ray.data.Dataset:
    """Deterministic per-domain mixture sampling: keep each row with
    the probability configured for its ``group_col`` value (the
    training-data "source mixing" step — upsample wiki, downsample
    crawl). Same stable-key-hash contract as :func:`hash_split`: a key
    kept at rate r is a superset of the keys kept at any r' < r, and
    the decision is identical across runs, partitionings and cluster
    sizes. ``rates`` is a small driver-side dict shipped in the task
    closure (KB-scale — never a shuffle)."""
    from ..functions.helpers import hash64_column

    cuts = {g: int(r * 10_000) for g, r in rates.items()}
    dcut = int(default_rate * 10_000)

    def body(batch: pa.Table) -> pa.Table:
        keys = [f"{salt}:{v}" for v in batch[key_col].to_pylist()]
        bucket = hash64_column(pa.array(keys)) % np.uint64(10_000)
        cut = np.array(
            [cuts.get(g, dcut) for g in batch[group_col].to_pylist()],
            dtype=np.uint64,
        )
        return batch.filter(pa.array(bucket < cut))

    return ds.map_batches(body, batch_format="pyarrow")


def top_k_per_group(
    ds: ray.data.Dataset,
    group_cols: list[str],
    by: str,
    k: int,
    ascending: bool = False,
    tiebreak: list[str] | None = None,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-group top-k (``row_number() OVER (PARTITION BY g ORDER BY v)
    <= k``): the "best k documents per domain" selection. Two-level:
    every BATCH first reduces itself to its local per-group top-k (so
    at most ``groups-in-batch x k`` rows enter the shuffle — the
    partial-top-k shape of relational.top_k, applied per group), then
    groups co-locate via one bounded hash partition and the same
    vectorized body finalizes. ``tiebreak`` columns make the selection
    deterministic when ``by`` ties (always pass them if ``by`` is not
    unique within a group)."""
    from .skew import partitioned_group_map

    order = [by, *(tiebreak or [])]
    asc = [ascending] + [True] * len(tiebreak or [])

    def local(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(order, ascending=asc, kind="mergesort")
            .groupby(group_cols, sort=False)
            .head(k)
        )

    pruned = ds.map_batches(local, batch_format="pandas")
    return partitioned_group_map(pruned, group_cols, local, num_partitions)


def distinct(ds: ray.data.Dataset, cols: list[str],
             shuffle_partitions: int = 16) -> ray.data.Dataset:
    """Distinct over ``cols``: per-batch dedup (map-side combine),
    then one bounded hash co-location with a vectorized
    ``drop_duplicates`` body. Previously the native
    ``groupby().aggregate(Count)`` — on high-cardinality keys its
    sort-aggregate ground through barely-shrunk partials (the same
    cliff as round 3's HLL merge and round 4's token_doc_freq;
    measured 47 s -> ~2 s for a 600k-row distinct count at sf0.1)."""
    from .skew import partitioned_group_map

    pre = ds.map_batches(
        lambda df: df[cols].drop_duplicates(), batch_format="pandas"
    )
    return partitioned_group_map(
        pre, cols, lambda g: g.drop_duplicates(), shuffle_partitions
    )


def rollup_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    sums: list[str],
    count_as: str = "n",
    marker: str = "ALL",
    shuffle_partitions: int = 16,
) -> ray.data.Dataset:
    """Hierarchical (SQL ``GROUP BY ROLLUP``) sums/counts: one result
    row per prefix level of ``keys`` — finest, each ancestor level,
    and the grand total — with rolled-up key columns set to
    ``marker`` (stated instead of SQL's NULL so value comparison
    needs no NULL-vs-NaN convention).

    Scale shape: only the FINEST level touches the corpus (the usual
    partial-combine grouped_agg); every coarser level re-aggregates
    the finest RESULT — group-cardinality-scale, so the extra levels
    cost one tiny pass each, never a second corpus scan.
    """
    level_sets = [keys[:i] for i in range(len(keys), -1, -1)]
    return _multi_level_agg(ds, keys, sums, count_as, marker,
                            level_sets, shuffle_partitions)


def cube_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    sums: list[str],
    count_as: str = "n",
    marker: str = "ALL",
    shuffle_partitions: int = 16,
) -> ray.data.Dataset:
    """SQL ``GROUP BY CUBE``: one result row per SUBSET of ``keys``
    (all 2^k levels), rolled-up key columns set to ``marker``. Same
    scale shape as :func:`rollup_agg` — only the finest level scans
    the corpus; every other subset re-aggregates the finest result.
    """
    from itertools import combinations

    level_sets = [
        [k for k in keys if k in combo]
        for r in range(len(keys), -1, -1)
        for combo in combinations(keys, r)
    ]
    return _multi_level_agg(ds, keys, sums, count_as, marker,
                            level_sets, shuffle_partitions)


def _multi_level_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    sums: list[str],
    count_as: str,
    marker: str,
    level_sets: list[list[str]],
    shuffle_partitions: int,
) -> ray.data.Dataset:
    """Shared ROLLUP/CUBE machinery: the first level set must be the
    full key list (the corpus scan); all others derive from it."""
    assert level_sets[0] == keys
    finest = grouped_agg(
        ds, keys, sums, count_as, shuffle_partitions
    ).materialize()

    def fill(level_keys):
        missing = [k for k in keys if k not in level_keys]

        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            for k in missing:
                df[k] = marker
            return df[keys + sums + [count_as]]

        return fn

    levels = [finest.map_batches(fill(keys), batch_format="pandas")]
    for lvl_keys in level_sets[1:]:
        src, gk = finest, lvl_keys
        if not gk:
            src = finest.map_batches(
                lambda df: df.assign(__all=0), batch_format="pandas"
            )
            gk = ["__all"]
        lvl = grouped_agg(
            src, gk, sums + [count_as], count_as=None,
            shuffle_partitions=max(2, shuffle_partitions // 4),
        )
        if gk == ["__all"]:
            lvl = lvl.drop_columns(["__all"])
        levels.append(lvl.map_batches(fill(lvl_keys),
                                      batch_format="pandas"))
    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def percent_rank(
    ds: ray.data.Dataset,
    keys: list[str],
    by: str,
    out_col: str = "pr",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """SQL ``PERCENT_RANK() OVER (PARTITION BY keys ORDER BY by)``:
    per-row ``(rank - 1) / (n - 1)`` within the row's group, ties
    sharing the min rank, single-row groups at 0. The integer
    rank/(n-1) quotient is the same double on both engines, so parity
    is exact (no rounding contract needed — rounded to 6 anyway for
    uniformity).

    One key co-location; in-partition work is a vectorized
    ``groupby().rank(method="min")`` — group sizes bound partition
    memory exactly like the window family.
    """
    from .skew import partitioned_group_map

    def body(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.groupby(keys, sort=False)
        rank = gb[by].rank(method="min").to_numpy(dtype=np.float64)
        n = gb[by].transform("size").to_numpy(dtype=np.float64)
        out = g.copy()
        out[out_col] = np.round(
            np.where(n > 1, (rank - 1) / np.maximum(n - 1, 1), 0.0), 6
        )
        return out

    return partitioned_group_map(ds, keys, body, num_partitions)


def sample_per_group(
    ds: ray.data.Dataset,
    group_cols: list[str],
    id_col: str,
    k: int,
    salt: str = "samp",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Deterministic EXACT-k-per-group sample (hash-order
    reservoir): each group keeps the k rows whose salted md5 hash of
    ``id_col`` is smallest — group-balanced subsetting (eval
    holdouts, per-domain caps) with reproducibility across runs,
    partitionings and cluster sizes, unlike rate-based
    ``stratified_sample``/``mix_sample`` which cannot promise an
    exact k. Rides :func:`top_k_per_group`'s two-level partial-top-k
    shape, so at most groups x k rows per batch enter the shuffle.
    """
    from ..functions.helpers import hash64_column

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        h = hash64_column([f"{salt}:{v}" for v in df[id_col].astype(str)])
        df = df.copy()
        # split the uint64 into two int64-safe halves for ordering
        df["__hhi"] = (h >> np.uint64(32)).astype(np.int64)
        df["__hlo"] = (h & np.uint64(0xFFFFFFFF)).astype(np.int64)
        return df

    out = top_k_per_group(
        ds.map_batches(add_hash, batch_format="pandas"),
        group_cols, by="__hhi", k=k, ascending=True,
        tiebreak=["__hlo", id_col], num_partitions=num_partitions,
    )
    return out.drop_columns(["__hhi", "__hlo"])


def window_ranks(
    ds: ray.data.Dataset,
    keys: list[str],
    order_col: str,
    tiebreak: list[str],
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """The SQL ranking-window family in one pass: appends
    ``row_number`` (1-based over ``ORDER BY order_col, tiebreak`` —
    the tiebreak must complete a total order), ``rnk`` (RANK,
    min-rank ties with gaps), ``dense_rnk`` (no gaps) and
    ``cume_dist`` (rows-at-or-before / n, an exact integer quotient,
    so parity needs no rounding contract) per group; ranks and
    cume_dist consider ``order_col`` alone, as SQL's do. One key
    co-location; vectorized sort + groupby ranks inside the
    partition.
    """
    from .skew import partitioned_group_map

    def body(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            keys + [order_col] + tiebreak, kind="mergesort"
        ).reset_index(drop=True)
        gb = g.groupby(keys, sort=False)
        g["row_number"] = (gb.cumcount() + 1).astype("int64")
        g["rnk"] = gb[order_col].rank(method="min").astype("int64")
        g["dense_rnk"] = gb[order_col].rank(method="dense").astype(
            "int64"
        )
        n = gb[order_col].transform("size").to_numpy(dtype=np.float64)
        maxr = gb[order_col].rank(method="max").to_numpy(
            dtype=np.float64
        )
        g["cume_dist"] = np.round(maxr / n, 6)
        return g

    return partitioned_group_map(ds, keys, body, num_partitions)


def grouped_corr(
    ds: ray.data.Dataset,
    keys: list[str],
    x: str,
    y: str,
    out_col: str = "corr",
    shuffle_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-group Pearson correlation from the five classical partial
    sums (n, sx, sy, sxx, syy, sxy) — each batch collapses to one
    row per key before the shuffle (the grouped_agg shape), and the
    final map is O(groups). The formula is stated explicitly —
    ``(n*sxy - sx*sy) / sqrt((n*sxx - sx^2) * (n*syy - sy^2))`` — so
    the SQL oracle computes the SAME expression from SQL sums rather
    than relying on the engine's internal corr() recurrence.
    Single-valued groups yield NaN -> dropped (stated).
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[keys].copy()
        xv = batch[x].to_numpy(dtype=np.float64)
        yv = batch[y].to_numpy(dtype=np.float64)
        b["sx"], b["sy"] = xv, yv
        b["sxx"], b["syy"], b["sxy"] = xv * xv, yv * yv, xv * yv
        b["n"] = np.int64(1)
        return b.groupby(keys, sort=False, as_index=False).sum()

    from ray.data.aggregate import Sum

    partials = ds.map_batches(partial, batch_format="pandas").repartition(
        shuffle_partitions
    )
    sums = partials.groupby(keys).aggregate(
        *[Sum(c, alias_name=c)
          for c in ("sx", "sy", "sxx", "syy", "sxy", "n")]
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(dtype=np.float64)
        num = n * df["sxy"].to_numpy() - df["sx"].to_numpy() * df["sy"].to_numpy()
        den = np.sqrt(
            (n * df["sxx"].to_numpy() - df["sx"].to_numpy() ** 2)
            * (n * df["syy"].to_numpy() - df["sy"].to_numpy() ** 2)
        )
        out = df[keys].copy()
        with np.errstate(invalid="ignore", divide="ignore"):
            out[out_col] = np.round(num / den, 6)
        return out[np.isfinite(out[out_col])]

    return sums.map_batches(finish, batch_format="pandas")


def grouped_regression(
    ds: ray.data.Dataset,
    keys: list[str],
    x: str,
    y: str,
    shuffle_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-group simple OLS fit ``y = slope*x + intercept`` plus
    ``r2``, from the same six sufficient statistics as
    :func:`grouped_corr` (n, sx, sy, sxx, syy, sxy) — each batch
    collapses to one row per key before the shuffle, so the wide
    stage carries |keys| rows per batch no matter the fact size, and
    the finish is O(groups). Formulas are stated explicitly so the
    SQL oracle computes the SAME expressions from SQL sums (DuckDB's
    regr_* builtins use a different recurrence):

        slope     = (n*sxy - sx*sy) / (n*sxx - sx^2)
        intercept = (sy - slope*sx) / n
        r2        = (n*sxy - sx*sy)^2
                    / ((n*sxx - sx^2) * (n*syy - sy^2))

    Groups with zero x-variance are dropped (stated; SQL emits NULL
    slope there and the oracle filters the same way). Rounded to 6.
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[keys].copy()
        xv = batch[x].to_numpy(dtype=np.float64)
        yv = batch[y].to_numpy(dtype=np.float64)
        b["sx"], b["sy"] = xv, yv
        b["sxx"], b["syy"], b["sxy"] = xv * xv, yv * yv, xv * yv
        b["n"] = np.int64(1)
        return b.groupby(keys, sort=False, as_index=False).sum()

    from ray.data.aggregate import Sum

    partials = ds.map_batches(partial, batch_format="pandas").repartition(
        shuffle_partitions
    )
    sums = partials.groupby(keys).aggregate(
        *[Sum(c, alias_name=c)
          for c in ("sx", "sy", "sxx", "syy", "sxy", "n")]
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(dtype=np.float64)
        sx = df["sx"].to_numpy(dtype=np.float64)
        sy = df["sy"].to_numpy(dtype=np.float64)
        sxx = df["sxx"].to_numpy(dtype=np.float64)
        syy = df["syy"].to_numpy(dtype=np.float64)
        sxy = df["sxy"].to_numpy(dtype=np.float64)
        num = n * sxy - sx * sy
        den_x = n * sxx - sx * sx
        den_y = n * syy - sy * sy
        out = df[keys].copy()
        with np.errstate(invalid="ignore", divide="ignore"):
            slope = num / den_x
            out["slope"] = np.round(slope, 6)
            out["intercept"] = np.round((sy - slope * sx) / n, 6)
            out["r2"] = np.round(num * num / (den_x * den_y), 6)
        return out[np.isfinite(out["slope"])]

    return sums.map_batches(finish, batch_format="pandas")


def ntile(
    ds: ray.data.Dataset,
    keys: list[str],
    order_col: str,
    tiebreak: list[str],
    n: int,
    out_col: str = "tile",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """SQL ``NTILE(n)``: split each group's rows (ordered by
    ``order_col, tiebreak`` — a total order, since NTILE is
    row-number-based) into ``n`` buckets as evenly as possible, the
    first ``n_rows % n`` buckets one row larger. Pure integer
    arithmetic, so parity is exact. One key co-location.
    """
    from .skew import partitioned_group_map

    def body(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            keys + [order_col] + tiebreak, kind="mergesort"
        ).reset_index(drop=True)
        gb = g.groupby(keys, sort=False)
        rn = gb.cumcount().to_numpy()
        sz = gb[order_col].transform("size").to_numpy()
        base, rem = sz // n, sz % n
        cut = rem * (base + 1)
        small_base = np.maximum(base, 1)  # avoid /0 when sz < n
        g[out_col] = np.where(
            rn < cut,
            rn // np.maximum(base + 1, 1) + 1,
            rem + (rn - cut) // small_base + 1,
        ).astype("int64")
        return g

    return partitioned_group_map(ds, keys, body, num_partitions)


def pivot_agg(
    ds: ray.data.Dataset,
    index: list[str],
    pivot_col: str,
    value_col: str,
    categories: list[str],
    shuffle_partitions: int = 16,
) -> ray.data.Dataset:
    """Pivot (crosstab): one row per ``index`` key, one
    ``sum_<category>`` column per KNOWN pivot category (explicit
    ``categories`` — discovering them would need an extra pass, and
    an unbounded category set is a schema explosion; SQL PIVOT makes
    the same demand). Semantics = conditional aggregation:
    ``sum(value) FILTER (WHERE pivot_col = cat)``, absent cells 0.

    Scale shape: the corpus scan is the ordinary partial-combine
    grouped_agg on (index, pivot_col); the reshape runs on that
    group-cardinality-scale result, one vectorized unstack per
    partition of index keys.
    """
    from .skew import partitioned_group_map

    finest = grouped_agg(
        ds, index + [pivot_col], [value_col], count_as=None,
        shuffle_partitions=shuffle_partitions,
    )

    def reshape(g: pd.DataFrame) -> pd.DataFrame:
        out = g[index].drop_duplicates().set_index(index)
        for cat in categories:
            sub = (
                g[g[pivot_col] == cat]
                .groupby(index)[value_col].sum()
            )
            out[f"sum_{cat}"] = sub
        return out.fillna(0.0).reset_index()

    return partitioned_group_map(
        finest, index, reshape, max(2, shuffle_partitions // 4),
        coalesce=shuffle_partitions,
    )


def string_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    value_col: str,
    sep: str = ",",
    out_col: str = "agg",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-group ordered string concatenation (SQL ``string_agg(v,
    sep ORDER BY v)``) — deterministic because the elements are
    sorted before joining. One key co-location; the group's
    concatenated value must fit a worker (same contract as any
    per-group collect)."""
    from .skew import partitioned_group_map

    def body(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values([*keys, value_col], kind="mergesort")
            .groupby(keys, sort=False)[value_col]
            .agg(lambda s: sep.join(s.astype(str)))
            .reset_index()
            .rename(columns={value_col: out_col})
        )

    return partitioned_group_map(ds, keys, body, num_partitions)


def zscore(
    ds: ray.data.Dataset,
    keys: list[str],
    value_col: str,
    out_col: str = "z",
    shuffle_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-group z-score normalization: ``(v - mean) / sample_std``
    appended per row — the feature-scaling staple. Two passes: the
    group stats reduce through the usual partial-combine aggregate
    (n, sum, sum-of-squares — one small shuffle), then the
    dimension-scale stats table broadcasts via ``ray.put`` and the
    corpus streams through a stateless transform. The std is stated
    as ``sqrt((n*sxx - sx^2) / (n*(n-1)))`` so the SQL oracle computes
    the identical expression (engine-internal Welford paths differ in
    fp). Groups with n < 2 or zero variance drop (stated).
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[keys].copy()
        v = batch[value_col].to_numpy(dtype=np.float64)
        b["sx"], b["sxx"], b["n"] = v, v * v, np.int64(1)
        return b.groupby(keys, sort=False, as_index=False).sum()

    from ray.data.aggregate import Sum

    sums = (
        ds.map_batches(partial, batch_format="pandas")
        .repartition(shuffle_partitions)
        .groupby(keys)
        .aggregate(*[Sum(c, alias_name=c) for c in ("sx", "sxx", "n")])
        .to_pandas()
    )
    n = sums["n"].to_numpy(dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = sums["sx"].to_numpy() / n
        var = (n * sums["sxx"].to_numpy()
               - sums["sx"].to_numpy() ** 2) / (n * (n - 1))
        std = np.sqrt(var)
    stats = sums[keys].copy()
    stats["__mean"], stats["__std"] = mean, std
    stats = stats[np.isfinite(std) & (std > 0)]
    ref = ray.put(stats)

    def transform(batch: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(ref)
        m = batch.merge(st, on=keys, how="inner")
        m[out_col] = np.round(
            (m[value_col].to_numpy(dtype=np.float64)
             - m["__mean"].to_numpy()) / m["__std"].to_numpy(),
            6,
        )
        return m.drop(columns=["__mean", "__std"])

    return ds.map_batches(transform, batch_format="pandas")


def global_rank(
    ds: ray.data.Dataset,
    order_col: str,
    id_col: str,
    ascending: bool = False,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Distributed global ORDER BY rank: ``row_number() OVER (ORDER BY
    order_col [DESC], id_col)`` without a global sort. Two-phase
    order-statistics shape:

    1. per-batch counts per DISTINCT order value reduce through one
       value-keyed co-location; the resulting (value, count) table is
       bounded by the order column's distinct cardinality (the stated
       partitioning assumption — for continuous keys, quantile-bucket
       upstream first), sorts on the driver, and its exclusive prefix
       sums broadcast once via ``ray.put``;
    2. one value-keyed ``partitioned_group_map`` ranks within each
       value by ``id_col`` (vectorized cumcount) and adds the
       broadcast offset — rows never globally shuffle into a single
       ordered stream, which is the point: a 100 TB ORDER BY needs
       only the value histogram to agree globally.

    Returns the input columns plus int64 ``rank`` (1-based).
    """
    from .skew import partitioned_group_map

    def vpartial(batch: pd.DataFrame) -> pd.DataFrame:
        p = (batch.groupby(order_col, sort=False).size()
             .reset_index(name="n"))
        return p

    counts = partitioned_group_map(
        ds.map_batches(vpartial, batch_format="pandas"),
        [order_col],
        lambda g: g.groupby(order_col, sort=False)["n"].sum().reset_index(),
        num_partitions, coalesce=2 * num_partitions,
    ).to_pandas()
    counts = counts.sort_values(
        order_col, ascending=ascending, kind="mergesort"
    ).reset_index(drop=True)
    offs = np.concatenate(([0], np.cumsum(counts["n"].to_numpy())[:-1]))
    off_ref = ray.put(dict(zip(counts[order_col], offs.astype(np.int64))))

    def body(g: pd.DataFrame) -> pd.DataFrame:
        lut = ray.get(off_ref)
        g = g.sort_values([order_col, id_col], kind="mergesort")
        within = g.groupby(order_col, sort=False).cumcount().to_numpy()
        base = g[order_col].map(lut).to_numpy(dtype=np.int64)
        g = g.copy()
        g["rank"] = base + within + 1
        return g

    return partitioned_group_map(ds, [order_col], body, num_partitions)


def skyline(
    ds: ray.data.Dataset,
    min_col: str,
    max_col: str,
) -> ray.data.Dataset:
    """2-D Pareto frontier (skyline): rows where no other row has
    ``min_col`` <= theirs AND ``max_col`` >= theirs with at least one
    strict inequality. Equal (min,max) points never dominate each
    other, so exact duplicates all survive together.

    Distributed shape: the dominance test depends only on the value
    PAIR, and skyline(union) == skyline(union of local skylines), so
    each block reduces to its local frontier first (a block can only
    SHRINK: the partial pass never adds rows), then the surviving
    rows — bounded by the frontier's size times the block count, tiny
    on any realistic value distribution — coalesce into one final
    exact pass. The only scale assumption is that the GLOBAL frontier
    plus per-block false-positives fit one task's memory; for
    adversarial anti-correlated data (frontier ~ input size) a
    skyline is the wrong query at 100 TB no matter the engine.

    Local kernel (vectorized, exact): among DISTINCT value pairs,
    per ``min_col`` value only the max ``max_col`` survives (same
    cost, strictly better benefit); with min values then strictly
    increasing, a pair survives iff its ``max_col`` exceeds the
    running max over all strictly-cheaper pairs (equal benefit at
    lower cost dominates). Rows re-attach by value-pair merge.
    """

    def frontier(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        best = (df.groupby(min_col, sort=True)[max_col].max()
                .reset_index())
        cm = best[max_col].cummax().shift(1)
        keep = best[cm.isna() | (best[max_col] > cm)]
        return df.merge(keep, on=[min_col, max_col])

    partial = ds.map_batches(frontier, batch_format="pandas")
    return partial.repartition(1).map_batches(
        frontier, batch_format="pandas"
    )


def global_row_number(
    ds: ray.data.Dataset,
    by: list[str],
    ascending: list[bool] | None = None,
    rn_col: str = "rn",
    num_buckets: int = 32,
    sample_per_block: int = 16,
) -> ray.data.Dataset:
    """Global ``row_number() OVER (ORDER BY by...)`` — a distributed
    full ORDER BY with rank assignment (the reference has no global
    sort at all, SURVEY §2.3.7; this is the engine-side closure).
    The CONTINUOUS-key counterpart of :func:`global_rank`: where that
    operator's driver state is bounded by the order column's distinct
    cardinality, this one's is O(num_buckets) whatever the key — use
    it for float / high-cardinality / composite ORDER BY.

    Ray-Data-first sample sort with bucketed prefix sums (the
    stages/packing.py offset pattern, applied to ranks):

    1. probe each block for ``sample_per_block`` positional quantiles
       of the LEADING key (bounded: blocks x probes rows ever reach
       the driver, works for any orderable dtype incl. strings),
    2. bucket every row with ``np.searchsorted(boundaries, v)`` —
       equal leading-key values always share a bucket, so composite
       tiebreaks never straddle a boundary,
    3. per-bucket counts through :func:`grouped_agg` (map-side
       combine; the shuffle carries bucket-scale rows),
    4. the driver prefix-sums the <= ``num_buckets`` totals in sort
       direction — O(buckets) driver state, broadcast in the closure,
    5. one :func:`~..skew.partitioned_group_map` co-locates each
       bucket, sorts it by the FULL composite, and adds its offset.

    ``by`` must be a unique composite (add a tiebreak column) for the
    numbering to be deterministic. Skew bound: a bucket holds at
    least every duplicate of one leading value — the same caveat as
    any range-partitioned sort.
    """
    from .skew import autoscale_partitions, partitioned_group_map

    ascending = ascending if ascending is not None else [True] * len(by)
    lead, lead_asc = by[0], bool(ascending[0])
    num_buckets = autoscale_partitions(ds, num_buckets)

    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[lead].dropna().to_numpy()
        if v.size == 0:
            return pd.DataFrame({lead: batch[lead].iloc[:0]})
        v = np.sort(v)
        idx = np.linspace(0, v.size - 1, sample_per_block).astype(np.int64)
        return pd.DataFrame({lead: v[idx]})

    samp = ds.map_batches(probe, batch_format="pandas").take_all()
    vals = np.sort(np.unique(np.array([r[lead] for r in samp])))
    if vals.size > num_buckets - 1 > 0:
        pick = np.linspace(0, vals.size - 1, num_buckets - 1).astype(np.int64)
        vals = np.unique(vals[pick])
    boundaries = vals

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__bkt"] = np.searchsorted(
            boundaries, batch[lead].to_numpy(), side="right"
        ).astype(np.int64)
        return batch

    tagged = ds.map_batches(tag, batch_format="pandas")
    counts = grouped_agg(tagged, ["__bkt"], count_as="__n").to_pandas()
    counts = counts.sort_values("__bkt", ascending=lead_asc)
    offs = counts["__n"].cumsum().shift(1, fill_value=0).to_numpy()
    offsets = dict(zip(counts["__bkt"].to_numpy(), offs))

    def body(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            out = df.drop(columns=["__bkt"])
            out[rn_col] = pd.Series([], dtype="int64")
            return out
        parts = []
        for bkt, g in df.groupby("__bkt", sort=False):
            g = g.sort_values(by, ascending=ascending, kind="mergesort")
            g = g.drop(columns=["__bkt"])
            g[rn_col] = np.arange(1, len(g) + 1) + int(offsets[bkt])
            parts.append(g)
        return pd.concat(parts, ignore_index=True)

    return partitioned_group_map(tagged, ["__bkt"], body, num_buckets)


def profile_columns(
    ds: ray.data.Dataset,
    columns: list[str],
    num_partitions: int = 4,
    round_to: int = 2,
) -> ray.data.Dataset:
    """One-pass numeric column profiler: per column, ``n_rows``,
    ``n_null``, ``min``, ``max``, ``mean`` — the data-quality summary
    a pipeline runs before trusting a new 100 TB drop.

    Scale shape: every block collapses to ONE tiny partial row per
    column (count / null count / min / max / sum — all mergeable), so
    the only exchange is a column-cardinality co-location over
    blocks x |columns| scalar rows; the fact table itself is read
    once, streamed, and never shuffled. ``autoscale=False`` on the
    combine: the partial volume is bounded by block count, not data
    bytes, and |columns| caps the useful parallelism anyway.

    ``mean`` (and min/max) are rounded to ``round_to`` decimals INSIDE
    the operator so the result is reproducible run-to-run at any
    partition count up to float-sum association, and the SQL oracle
    states the same rounding.
    """
    from .skew import partitioned_group_map

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in columns:
            s = pd.to_numeric(df[c], errors="coerce")
            nn = s.notna()
            rows.append((
                c, len(s), int((~nn).sum()),
                float(s.min()) if nn.any() else np.nan,
                float(s.max()) if nn.any() else np.nan,
                float(s.sum()),
            ))
        return pd.DataFrame(
            rows, columns=["col", "n", "nulls", "mn", "mx", "sm"]
        )

    partials = ds.map_batches(partial, batch_format="pandas")

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("col", sort=False).agg(
            n=("n", "sum"), nulls=("nulls", "sum"),
            mn=("mn", "min"), mx=("mx", "max"), sm=("sm", "sum"),
        ).reset_index()

    out = partitioned_group_map(
        partials, ["col"], reduce, num_partitions,
        coalesce=None, autoscale=False,
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        nonnull = (df["n"] - df["nulls"]).to_numpy(dtype="float64")
        mean = np.where(nonnull > 0, df["sm"].to_numpy() / nonnull, np.nan)
        return pd.DataFrame({
            "col": df["col"].astype(str),
            "n_rows": df["n"].astype("int64"),
            "n_null": df["nulls"].astype("int64"),
            "min": df["mn"].astype("float64").round(round_to),
            "max": df["mx"].astype("float64").round(round_to),
            "mean": pd.Series(mean, index=df.index).round(round_to),
        })

    return out.map_batches(finish, batch_format="pandas")


def impute_group_mean(
    ds: ray.data.Dataset,
    keys: list[str],
    value_col: str,
    shuffle_partitions: int = 16,
) -> ray.data.Dataset:
    """Fill nulls in ``value_col`` with the group's non-null mean —
    the standard repair step before feature scaling. Same two-pass
    shape as :func:`zscore`: per-batch partials carry only
    ``(keys, non-null count, non-null sum)`` through one small
    key-cardinality shuffle, the dimension-scale means table
    broadcasts via ``ray.put``, and the corpus streams through a
    stateless fill. Mean is stated as ``sum/n`` over non-null values
    (the SQL oracle's ``avg``); all-null groups keep their nulls.
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[keys].copy()
        v = batch[value_col].to_numpy(dtype=np.float64)
        ok = ~np.isnan(v)
        b["sx"] = np.where(ok, v, 0.0)
        b["n"] = ok.astype(np.int64)
        return b.groupby(keys, sort=False, as_index=False).sum()

    from ray.data.aggregate import Sum

    sums = (
        ds.map_batches(partial, batch_format="pandas")
        .repartition(shuffle_partitions)
        .groupby(keys)
        .aggregate(*[Sum(c, alias_name=c) for c in ("sx", "n")])
        .to_pandas()
    )
    sums = sums[sums["n"] > 0]
    stats = sums[keys].copy()
    stats["__mean"] = sums["sx"].to_numpy() / sums["n"].to_numpy(
        dtype=np.float64)
    ref = ray.put(stats)

    def transform(batch: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(ref)
        out = batch.merge(st, on=keys, how="left")
        v = out[value_col].to_numpy(dtype=np.float64)
        fill = out.pop("__mean").to_numpy(dtype=np.float64)
        out[value_col] = np.where(np.isnan(v), fill, v)
        return out

    return ds.map_batches(transform, batch_format="pandas")


def grouped_entropy(
    ds: ray.data.Dataset,
    keys: list[str],
    cat_col: str,
    out_col: str = "entropy",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Shannon entropy (nats) of the ``cat_col`` distribution per
    group: ``H = -sum_i p_i ln p_i`` — the standard diversity /
    concentration score (e.g. how spread a user's event types or a
    source's languages are; low entropy flags bot-like or templated
    slices in a training-data mix).

    Scale shape: the fact table reduces through
    :func:`grouped_agg`'s map-side-combined counts to one row per
    ``(keys, cat)`` — category-cardinality data — then one bounded
    co-location per key computes the vectorized entropy. Stated
    formula over exact integer counts with one ln/divide pass at the
    end (rounded to 6), so the SQL oracle reproduces it bit-stably.
    """
    from .skew import partitioned_group_map

    counts = grouped_agg(ds, keys + [cat_col], count_as="__n")

    def body(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby(keys, sort=False)["__n"].transform("sum")
        p = g["__n"].to_numpy(dtype=np.float64) / tot.to_numpy(
            dtype=np.float64)
        h = g[keys].copy()
        h["__h"] = -p * np.log(p)
        out = h.groupby(keys, sort=False, as_index=False)["__h"].sum()
        out[out_col] = out.pop("__h").round(6)
        return out

    return partitioned_group_map(counts, keys, body, num_partitions)


def mutual_information(
    ds: ray.data.Dataset,
    col_x: str,
    col_y: str,
) -> ray.data.Dataset:
    """Mutual information (nats) between two categorical columns:
    ``I(X;Y) = sum_xy p(x,y) ln(p(x,y) / (p(x) p(y)))`` — the
    feature-selection / redundancy score (does ``source`` predict
    ``lang``? is a metadata column informative or noise?).

    Scale shape: one :func:`grouped_agg` pass reduces the fact table
    to joint-cardinality ``(x, y, n)`` counts (map-side combined);
    the marginals and the MI sum run on the driver over that table —
    joint category cardinality is dimension-scale by definition of
    "categorical". Exact integer counts, one ln/divide pass, rounded
    to 6; the SQL oracle states the identical formula. Returns a
    1-row dataset ``(mi,)``.
    """
    joint = grouped_agg(ds, [col_x, col_y], count_as="n").to_pandas()
    n = joint["n"].to_numpy(dtype=np.float64)
    tot = n.sum()
    px = joint.groupby(col_x)["n"].transform("sum").to_numpy(
        dtype=np.float64)
    py = joint.groupby(col_y)["n"].transform("sum").to_numpy(
        dtype=np.float64)
    mi = float(np.sum((n / tot) * np.log(n * tot / (px * py))))
    return ray.data.from_pandas(pd.DataFrame({"mi": [round(mi, 6)]}))


def distribution_drift(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    col: str,
    lo: float,
    hi: float,
    bins: int = 20,
    smooth: float = 0.5,
) -> ray.data.Dataset:
    """Population Stability Index between two snapshots of a numeric
    column: fixed equi-width bins on ``[lo, hi)`` (values clipped to
    the edge bins), ``PSI = sum_b (q_b - p_b) ln(q_b / p_b)`` — the
    standard drift monitor for "did this feed change under me".
    ``smooth`` pseudo-counts per bin keep empty bins finite
    (additive/Laplace smoothing), stated so the oracle matches.

    Scale shape: each snapshot reduces via per-batch vectorized bin
    counts (one ``bins``-long partial per batch, map-side combined
    through :func:`grouped_agg`) — no row shuffle; the PSI arithmetic
    runs on two bin-scale tables on the driver. Integer counts, one
    ln pass, rounded to 6. Returns a 1-row dataset ``(psi,)``.
    """
    width = (hi - lo) / bins

    def bin_counts(ds: ray.data.Dataset) -> np.ndarray:
        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            v = batch[col].to_numpy(dtype=np.float64)
            b = np.clip(((v - lo) // width).astype(np.int64), 0,
                        bins - 1)
            return pd.DataFrame({"bin": b}).groupby(
                "bin", sort=False).size().rename("n").reset_index()

        g = grouped_agg(
            ds.map_batches(partial, batch_format="pandas"),
            ["bin"], sums=["n"]).to_pandas()
        out = np.zeros(bins, dtype=np.float64)
        out[g["bin"].to_numpy(dtype=np.int64)] = g["n"].to_numpy(
            dtype=np.float64)
        return out

    p = bin_counts(old) + smooth
    q = bin_counts(new) + smooth
    p, q = p / p.sum(), q / q.sum()
    psi = float(np.sum((q - p) * np.log(q / p)))
    return ray.data.from_pandas(pd.DataFrame({"psi": [round(psi, 6)]}))


def weighted_sample(
    ds: ray.data.Dataset,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "ws",
) -> pd.DataFrame:
    """Deterministic weighted sample WITHOUT replacement
    (Efraimidis-Spirakis A-ES): every row gets priority
    ``ln(u) / w`` with ``u`` a stable hash-derived uniform in (0, 1)
    — a monotone transform of the classic ``u^(1/w)`` key — and the
    global top-``k`` priorities win. Heavier rows sample
    proportionally more often, yet the draw is REPRODUCIBLE across
    runs, partitionings and cluster sizes (the quality-weighted
    corpus subsampling step, with hash_split's replayability
    guarantee; same md5 convention, same 1/10000 uniform grid).
    Priorities are rounded to 6 so the oracle's libm and numpy's may
    differ in the last ulp without flipping the boundary; ties break
    by id. Returns the k sampled rows as pandas (k is driver-scale).
    """
    import pyarrow as _pa

    from ..functions.helpers import hash64_column

    def pri(batch: pd.DataFrame) -> pd.DataFrame:
        keys = [f"{salt}:{v}" for v in batch[id_col].tolist()]
        bucket = (hash64_column(_pa.array(keys))
                  % np.uint64(10_000)).astype(np.float64)
        u = (bucket + 0.5) / 10_000.0
        w = batch[weight_col].to_numpy(dtype=np.float64)
        out = batch[[id_col]].copy()
        out["pri"] = np.round(np.log(u) / w, 6)
        return out

    return top_k(ds.map_batches(pri, batch_format="pandas"), k,
                 by=["pri", id_col], ascending=[False, True])


def target_encode(
    ds: ray.data.Dataset,
    key_cols: list[str],
    target_col: str,
    alpha: float = 10.0,
    out_col: str = "encoded",
) -> ray.data.Dataset:
    """Smoothed target encoding — the categorical-feature primitive
    for tabular ML: each category's code is its Laplace-smoothed
    target mean, ``(sum + alpha * global_mean) / (n + alpha)``, so
    rare categories shrink toward the global mean instead of
    memorizing noise.

    Scale shape: one map-side-combined grouped (sum, n) pass gives
    the category table AND (summed once more, driver-side, category-
    cardinality rows) the global mean — the fact table is read once
    and never shuffled; the dimension-scale code table broadcasts
    into a streaming fill pass. Stated arithmetic (float64, global
    mean = total_sum / total_n) so the SQL oracle reproduces it
    bit-for-bit up to the rounding contract.
    """
    stats = grouped_agg(ds, key_cols, sums=[target_col],
                        count_as="__n").to_pandas()
    total_sum = float(stats[target_col].sum())
    total_n = float(stats["__n"].sum())
    gmean = total_sum / total_n
    stats[out_col] = np.round(
        (stats[target_col] + alpha * gmean)
        / (stats["__n"] + alpha), 6)
    code = stats[key_cols + [out_col]]
    code_ref = ray.put(code)

    def fill(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(code_ref)
        return df.merge(c, on=key_cols, how="left")

    return ds.map_batches(fill, batch_format="pandas")


def mixture_weights(
    ds: ray.data.Dataset,
    keys: list[str],
    size_col: str,
    alpha: float = 0.5,
    out_col: str = "weight",
) -> pd.DataFrame:
    """Temperature-scaled source-mixture weights: ``w_k =
    n_k^alpha / sum_j n_j^alpha`` over per-key totals of
    ``size_col`` — the multinomial sampling-temperature rule
    multilingual/multi-domain training mixes use to up-weight
    low-resource sources (alpha < 1 flattens the distribution;
    alpha=1 is proportional sampling). The downstream consumer is
    ``mix_sample``'s per-domain rates.

    One map-side-combined grouped sum (the corpus never shuffles);
    the key-cardinality total table finishes driver-side, where the
    normalizing sum is a scalar. Arithmetic stated for the oracle:
    float64 ``n**alpha``, normalized, rounded to 6.
    """
    counts = grouped_agg(ds, keys, sums=[size_col])
    df = counts.to_pandas()[keys + [size_col]]
    df = df.sort_values(keys).reset_index(drop=True)
    p = df[size_col].to_numpy(dtype=np.float64) ** float(alpha)
    df[out_col] = np.round(p / p.sum(), 6)
    df[size_col] = df[size_col].astype("int64")
    return df


def suppress_rare(
    ds: ray.data.Dataset,
    col: str,
    min_count: int,
    other: str = "OTHER",
    out_col: str | None = None,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """k-anonymity-style rare-category suppression: values of ``col``
    occurring fewer than ``min_count`` times are replaced with the
    ``other`` sentinel (the privacy/data-prep pass run before sharing
    categorical columns — a rare value is an identifier).

    Scale shape: the count pass is grouped_agg's map-side-combined
    sum (value-cardinality rows shuffle, never the fact stream); the
    broadcast side is the KEEP set, which by pigeonhole holds at most
    ``N / min_count`` values — bounded however adversarial the column
    (broadcasting the RARE set would be unbounded: an all-unique
    column has N of them). One streaming map rewrites the column;
    output value is the string rendering (sentinel included).
    """
    out_col = out_col or f"{col}_anon"
    counts = grouped_agg(
        ds.select_columns([col]), [col], count_as="__n",
        shuffle_partitions=num_partitions,
    )
    keep_df = counts.map_batches(
        lambda df: df.loc[df["__n"] >= min_count, [col]],
        batch_format="pandas",
    ).to_pandas()  # <= N / min_count rows by pigeonhole
    keep = set(keep_df[col])

    def rewrite(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        s = df[col].astype(str)
        out[out_col] = np.where(df[col].isin(keep), s, other)
        return out

    return ds.map_batches(rewrite, batch_format="pandas")
