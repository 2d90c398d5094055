"""Mergeable sketches for corpus-scale statistics.

At 100 TB, "how many distinct X" is itself a hard query: exact
distinct needs an all-to-all shuffle of every key, while a sketch
needs one streaming pass and a constant-size merge. This module holds
the sketch family; the exact counterparts live in
``stages/relational.py`` (``distinct``) so callers can trade a
shuffle for an error bound explicitly.

HyperLogLog here is fully deterministic (md5-based ``hash64`` — the
same hash the dedup/split stages use, helpers.py:92) so the register
table is reproducible across runs, partitionings and cluster sizes,
and — unusually for a sketch — verifiable bit-for-bit in ANSI SQL:
DuckDB recomputes every register from ``md5()`` nibbles and
``bin()``-based bit lengths (see ``oracle_sql()['hll_registers']``).

Scale shape: per-batch register partials are emitted as AT MOST
``m=4096`` (register, rho) rows regardless of batch size, then one
tiny ``groupby(register).max(rho)`` merges them — the shuffle moves
O(m × num_blocks) rows of two int64s, never the data. The estimator
(raw HLL + linear-counting branch, Flajolet et al. 2007) runs on the
driver over ≤4096 rows.

No counterpart in the reference (single-process generators never
needed cardinality estimates; its dedup is delegated upstream,
config/biocypher_config.yaml:12) — this is the 100 TB-native
extension.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# p=12 -> m=4096 registers -> ~1.04/sqrt(m) = 1.6% standard error.
HLL_P = 12
HLL_M = 1 << HLL_P
_MASK52 = np.uint64((1 << 52) - 1)


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 values (no float log2:
    doubles round log2(2^k - 1) up to k near the 52-bit edge, which
    would disagree with the oracle's integer ``length(bin(w))``)."""
    bl = np.zeros(len(w), dtype=np.int64)
    v = w.copy()
    for s in (32, 16, 8, 4, 2, 1):
        big = v >= np.uint64(1 << s)
        bl[big] += s
        v[big] >>= np.uint64(s)
    return bl + (v > 0)


def hll_register_rows(values: pa.Array | list[str]) -> pd.DataFrame:
    """(register, rho) partial for one batch of ALREADY-SALTED string
    values: register = top 12 bits of hash64, rho = 1 + leading zeros
    of the remaining 52 bits (53 when they are all zero). At most one
    row per register per batch."""
    from ..functions.helpers import hash64_column

    h = hash64_column(values)
    j = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    w = h & _MASK52
    rho = (53 - _bit_length_u64(w)).astype(np.int64)
    regs = np.zeros(HLL_M, dtype=np.int64)
    np.maximum.at(regs, j, rho)
    nz = np.nonzero(regs)[0]
    return pd.DataFrame(
        {"register": nz.astype("int64"), "rho": regs[nz]}
    )


def hll_registers(
    ds: ray.data.Dataset, col: str, salt: str = "hll"
) -> ray.data.Dataset:
    """Merged HLL register table for ``col``: rows (register, rho),
    one per register that saw at least one value, sorted by register.

    The salt namespaces the hash so two sketches over the same column
    never alias (same contract as ``hash_split``).

    Merging is a two-level TREE over the partial streams, not a keyed
    shuffle: each partial block is at most m=4096 (register, rho)
    rows, so a plain block coalesce (``repartition`` without shuffle —
    block concatenation, no all-to-all) followed by a vectorized
    per-block max collapses any number of partials to one m-row table.
    The previous native ``groupby().aggregate(Max)`` + ``sort`` spent
    ~28 s of pure sort-operator fixed cost on this kilobyte-scale
    merge at sf0.1 (measured via ds.stats(); now ~4 s)."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        # hash each DISTINCT value once: registers are a max over
        # rho, so duplicates never change them — md5 cost scales with
        # block cardinality, not block size (the cms_counts trick;
        # measured 117 s -> seconds on a repeated-key fact column)
        uniq = pc.unique(batch[col])
        vals = [f"{salt}:{v}" for v in uniq.to_pylist()]
        return hll_register_rows(pa.array(vals, type=pa.string()))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby("register", sort=True)["rho"].max().reset_index()
        )
        return out.astype({"register": "int64", "rho": "int64"})

    return (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(8)
        .map_batches(merge, batch_format="pandas", batch_size=None)
        .repartition(1)
        .map_batches(merge, batch_format="pandas", batch_size=None)
    )


def grouped_hll_registers(
    ds: ray.data.Dataset,
    group_cols: list[str],
    col: str,
    salt: str = "hll",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-group HLL register tables: rows ``(*group_cols, register,
    rho)`` — the "distinct URLs per domain" shape. Each batch emits at
    most m=4096 rows PER GROUP IT SEES regardless of batch size, then
    one bounded hash partition on the group key merges partials with
    a vectorized max — the shuffle is sketch-rows, never values, and a
    hot group costs the same m rows as a cold one (sketches are the
    skew-proof aggregate). Same deterministic md5 hashing as the
    global sketch, so the oracle recomputes every row in SQL."""
    from ..functions.helpers import hash64_column
    from .skew import partitioned_group_map

    def partial(batch: pa.Table) -> pd.DataFrame:
        vals = [f"{salt}:{v}" for v in batch[col].to_pylist()]
        h = hash64_column(pa.array(vals, type=pa.string()))
        j = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
        w = h & _MASK52
        rho = (53 - _bit_length_u64(w)).astype(np.int64)
        df = batch.select(group_cols).to_pandas()
        df["register"] = j
        df["rho"] = rho
        return (
            df.groupby([*group_cols, "register"], sort=False)["rho"]
            .max()
            .reset_index()
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby([*group_cols, "register"], sort=False)["rho"]
            .max()
            .reset_index()
        )
        return out.astype({"register": "int64", "rho": "int64"})

    return partitioned_group_map(
        ds.select_columns([*group_cols, col]).map_batches(
            partial, batch_format="pyarrow"
        ),
        group_cols, merge, num_partitions,
    )


def grouped_hll_count(
    ds: ray.data.Dataset,
    group_cols: list[str],
    col: str,
    salt: str = "hll",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Per-group approximate distinct counts from the grouped register
    tables (~1.6% error at p=12). Driver-side estimator over
    group-count x <=m rows."""
    regs = grouped_hll_registers(
        ds, group_cols, col, salt=salt, num_partitions=num_partitions
    ).to_pandas()
    out = (
        regs.groupby(group_cols, sort=False)[["register", "rho"]]
        .apply(hll_estimate)
        .reset_index(name="approx_distinct")
    )
    return out


def hll_estimate(registers: pd.DataFrame) -> float:
    """Flajolet et al. 2007 estimator over a merged register table:
    raw harmonic-mean estimate with the small-range linear-counting
    correction (the only regime the correction tables matter for at
    our m). Registers absent from the table are zero."""
    m = HLL_M
    rho = np.zeros(m, dtype=np.int64)
    rho[registers["register"].to_numpy()] = registers["rho"].to_numpy()
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m / np.sum(np.power(2.0, -rho.astype(np.float64)))
    zeros = int(np.sum(rho == 0))
    if raw <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return float(raw)


def hll_count_distinct(
    ds: ray.data.Dataset, col: str, salt: str = "hll"
) -> float:
    """Approximate distinct count of ``col`` in one streaming pass +
    one O(m)-row merge. ~1.6% standard error at p=12."""
    regs = hll_registers(ds, col, salt=salt).to_pandas()
    return hll_estimate(regs)


def _equi_depth_compact(
    v: np.ndarray, w: np.ndarray, s: int
) -> tuple[np.ndarray, np.ndarray]:
    """Compress weighted values to ``s`` equi-depth representatives:
    sort, take the value at each weight-1/s boundary, give each weight
    W/s. One compaction adds at most W/s weighted-rank error; inputs
    already at or under ``s`` rows pass through exact."""
    if len(v) <= s:
        return v, w
    order = np.argsort(v, kind="mergesort")
    v, w = v[order], w[order]
    cum = np.cumsum(w)
    total = cum[-1]
    targets = total * (np.arange(1, s + 1, dtype=np.float64) / s)
    idx = np.minimum(
        np.searchsorted(cum, targets - 1e-9 * total, side="left"),
        len(v) - 1,
    )
    return v[idx], np.full(s, total / s)


def quantile_summary(
    ds: ray.data.Dataset,
    col: str,
    s: int = 256,
    merge_partitions: int = 8,
) -> pd.DataFrame:
    """Mergeable quantile summary of ``col``: ≤ ``s`` (value, weight)
    rows whose weighted CDF tracks the exact one within
    ~(levels/s) rank error (3 levels here → ≲1.2% at s=256).

    This is the decomposable counterpart the exact
    ``relational.grouped_quantiles`` docstring points at: per-block
    equi-depth summaries (map_batches, O(s) rows out per block
    regardless of block size) → one bounded repartition of the tiny
    summaries → per-partition compaction → a driver compaction over
    ≤ merge_partitions × s rows. The data itself never shuffles; at
    deeper scale add more compaction levels, each costs 1/s error.
    Deterministic for a given block layout (compaction boundaries
    depend on where blocks fall — unlike the HLL sketch this is NOT
    partition-invariant; the error bound is the contract, tested in
    tests/test_sketch.py)."""

    def summarize(batch: pa.Table) -> pd.DataFrame:
        vals = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v, w = _equi_depth_compact(
            vals, np.ones(len(vals), dtype=np.float64), s
        )
        return pd.DataFrame({"value": v, "weight": w})

    def compact(df: pd.DataFrame) -> pd.DataFrame:
        v, w = _equi_depth_compact(
            df["value"].to_numpy(), df["weight"].to_numpy(), s
        )
        return pd.DataFrame({"value": v, "weight": w})

    parts = (
        ds.select_columns([col])
        .map_batches(summarize, batch_format="pyarrow")
        .repartition(merge_partitions)
        .map_batches(compact, batch_format="pandas")
        .to_pandas()
    )
    v, w = _equi_depth_compact(
        parts["value"].to_numpy(), parts["weight"].to_numpy(), s
    )
    return pd.DataFrame({"value": v, "weight": w})


def summary_quantile(summary: pd.DataFrame, q: float) -> float:
    """Weighted lower quantile over a (value, weight) summary."""
    v = summary["value"].to_numpy()
    order = np.argsort(v, kind="mergesort")
    v = v[order]
    cum = np.cumsum(summary["weight"].to_numpy()[order])
    i = int(np.searchsorted(cum, q * cum[-1], side="left"))
    return float(v[min(i, len(v) - 1)])


def approx_quantiles(
    ds: ray.data.Dataset,
    col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    s: int = 256,
) -> pd.DataFrame:
    """One-row frame of approximate global quantiles of ``col`` —
    the sketch path for the corpus-scale-single-group regime where
    exact co-location is impossible."""
    summary = quantile_summary(ds, col, s=s)
    return pd.DataFrame(
        {
            f"p{int(round(q * 100)):02d}": np.array(
                [summary_quantile(summary, q)], dtype=np.float64
            )
            for q in qs
        }
    )


def distinct_count(
    ds: ray.data.Dataset, cols: list[str], shuffle_partitions: int = 16
) -> pd.DataFrame:
    """EXACT distinct count: per-batch dedup shrinks the shuffle to
    distinct-per-block before the grouped count (relational.distinct),
    then a driver count over the (already tiny) key-per-row result.
    Use the HLL path when 1.6% error is acceptable — it never shuffles
    keys at all."""
    from .relational import distinct

    n = distinct(ds, cols, shuffle_partitions=shuffle_partitions).count()
    return pd.DataFrame({"n_distinct": np.array([n], dtype=np.int64)})


# --------------------------------------------------------------- Count-Min

# d=4 depths x w=1024 cells; w divides 2^32 so ``hash64 % w`` equals
# the low md5 half mod w — the same SQL-checkability trick as
# hash_split / hash_embed.
CMS_D = 4
CMS_W = 1024


def cms_counts(
    ds: ray.data.Dataset,
    col: str,
    depth: int = CMS_D,
    width: int = CMS_W,
    salt: str = "cms",
) -> ray.data.Dataset:
    """Merged Count-Min sketch (Cormode & Muthukrishnan 2005) for the
    string rendering of ``col``: rows ``(depth, cell, n)``, one per
    non-empty cell. Point-frequency estimates (always >= truth) come
    from :func:`cms_estimate`; the sketch answers "how often does key
    X occur in 100 TB" in one streaming pass with a constant-size
    merge, where the exact answer is a full keyed shuffle.

    Determinism/verifiability: cell = ``hash64(f"{salt}{i}:{v}") %
    width`` with the repo's md5-based hash64, so DuckDB recomputes
    every cell count from ``md5()`` nibbles — the sketch is
    bit-for-bit SQL-checkable like the HLL register table.

    Merge is the HLL two-level tree (block coalesce + vectorized
    per-block SUM — counters are additive), never a keyed shuffle:
    each partial block is at most ``depth x width`` rows however
    large the batch.
    """
    from ..functions.helpers import hash64_column

    def partial(batch: pa.Table) -> pd.DataFrame:
        # hash each DISTINCT value once per depth and weight by its
        # block count — md5 cost scales with block cardinality, not
        # block size (18x fewer hashes on repeated-key fact columns)
        vc = pd.Series(
            [str(v) for v in batch[col].to_pylist()]
        ).value_counts(sort=False)
        vals = vc.index.to_numpy(dtype=object)
        weights = vc.to_numpy(dtype=np.float64)
        frames = []
        for i in range(depth):
            h = hash64_column([f"{salt}{i}:{v}" for v in vals])
            cells = (h % np.uint64(width)).astype(np.int64)
            cnt = np.bincount(cells, weights=weights, minlength=width)
            nz = np.nonzero(cnt)[0]
            frames.append(
                pd.DataFrame(
                    {"depth": np.int64(i), "cell": nz.astype(np.int64),
                     "n": cnt[nz].astype(np.int64)}
                )
            )
        return pd.concat(frames, ignore_index=True)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby(["depth", "cell"], sort=True)["n"].sum()
            .reset_index()
        )
        return out.astype({"depth": "int64", "cell": "int64",
                           "n": "int64"})

    return (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(8)
        .map_batches(merge, batch_format="pandas", batch_size=None)
        .repartition(1)
        .map_batches(merge, batch_format="pandas", batch_size=None)
    )


def cms_estimate(
    sketch: pd.DataFrame,
    key: str,
    depth: int = CMS_D,
    width: int = CMS_W,
    salt: str = "cms",
) -> int:
    """Point-frequency estimate: min over depths of the key's cell
    counter (missing cell = 0). Never underestimates."""
    from ..functions.helpers import hash64_column

    lut = {
        (int(d), int(c)): int(n)
        for d, c, n in zip(sketch["depth"], sketch["cell"], sketch["n"])
    }
    est = None
    for i in range(depth):
        h = hash64_column([f"{salt}{i}:{key}"])[0]
        n = lut.get((i, int(h % np.uint64(width))), 0)
        est = n if est is None else min(est, n)
    return int(est)


def heavy_hitters(
    ds: ray.data.Dataset,
    col: str,
    min_count: int,
    depth: int = CMS_D,
    width: int = CMS_W,
    salt: str = "cms",
    num_partitions: int = 16,
    driver_cap: int = 200_000,
) -> ray.data.Dataset:
    """EXACT heavy hitters via sketch-then-verify — keys occurring at
    least ``min_count`` times, with their exact counts, without ever
    shuffling the full key space:

    1. one pass builds the Count-Min sketch (:func:`cms_counts` —
       constant-size tree merge);
    2. one pass probes each block's distinct keys against the
       broadcast sketch; CMS never underestimates, so survivors are a
       SUPERSET of the true heavy set, bounded by it plus the sketch's
       false positives (eps*N mass per cell). The candidate Dataset is
       materialized in the OBJECT STORE (block-distributed), then its
       row count decides the verify route;
    3. the exact-count pass: per-batch partial ``value_counts`` (rows
       bounded by per-batch distinct keys) and a candidate filter +
       candidate-keyed co-location with the threshold. When candidates
       fit under ``driver_cap`` rows they become ONE broadcast set
       (fast path); when a mis-set ``min_count`` sits below the eps*N
       sketch noise and EVERY key qualifies, the filter instead runs
       as the distributed :func:`stages.joins.semi_join` — the
       candidate set never lands on the driver, at the cost of one
       extra key-hash shuffle on the degenerate path only.

    Contrast with ``skew.top_frequencies`` (capped per-block partials:
    approximate under adversarial splits): this is exact, at the cost
    of two extra streaming passes. Returns ``(col, n)``.
    """
    from ..functions.helpers import hash64_column

    sk = cms_counts(ds, col, depth, width, salt).to_pandas()
    tables = np.zeros((depth, width), dtype=np.int64)
    tables[sk["depth"].to_numpy(), sk["cell"].to_numpy()] = (
        sk["n"].to_numpy()
    )
    tab_ref = ray.put(tables)

    def probe(batch: pa.Table) -> pd.DataFrame:
        T = ray.get(tab_ref)
        vals = pd.Series(
            [str(v) for v in batch[col].to_pylist()]
        ).drop_duplicates()
        est = None
        for i in range(depth):
            h = hash64_column([f"{salt}{i}:{v}" for v in vals])
            e = T[i, (h % np.uint64(width)).astype(np.int64)]
            est = e if est is None else np.minimum(est, e)
        return pd.DataFrame({col: vals[est >= min_count]})

    cand_ds = (
        ds.select_columns([col])
        .map_batches(probe, batch_format="pyarrow")
        .materialize()
    )
    n_cands = cand_ds.count()

    from .skew import partitioned_group_map

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(col, sort=False)["n"].sum().reset_index()
        return out[out["n"] >= min_count].astype({"n": "int64"})

    if n_cands <= driver_cap:
        # fast path: candidates fit on the driver as one broadcast set
        cand_ref = ray.put(set(cand_ds.to_pandas()[col]))

        def partial(batch: pa.Table) -> pd.DataFrame:
            keep = ray.get(cand_ref)
            vc = pd.Series(
                [str(v) for v in batch[col].to_pylist()]
            ).value_counts(sort=False)
            vc = vc[vc.index.isin(keep)]
            return pd.DataFrame(
                {col: vc.index.to_numpy(dtype=object),
                 "n": vc.to_numpy(dtype=np.int64)}
            )

        return partitioned_group_map(
            ds.map_batches(partial, batch_format="pyarrow"),
            [col], merge, num_partitions, coalesce=2 * num_partitions,
        )

    # degenerate-threshold path: candidate count exceeds what the
    # driver should hold — filter the per-batch partial counts with
    # the DISTRIBUTED semi join instead (candidates stay in the
    # object store end to end)
    from .joins import semi_join

    def partial_all(batch: pa.Table) -> pd.DataFrame:
        vc = pd.Series(
            [str(v) for v in batch[col].to_pylist()]
        ).value_counts(sort=False)
        return pd.DataFrame(
            {col: vc.index.to_numpy(dtype=object),
             "n": vc.to_numpy(dtype=np.int64)}
        )

    kept = semi_join(
        ds.map_batches(partial_all, batch_format="pyarrow"),
        cand_ds, on=col, num_partitions=num_partitions,
    )
    return partitioned_group_map(
        kept, [col], merge, num_partitions, coalesce=2 * num_partitions,
    )


def cms_join_size(
    a: ray.data.Dataset,
    col_a: str,
    b: ray.data.Dataset,
    col_b: str,
    depth: int = CMS_D,
    width: int = CMS_W,
    salt: str = "cms",
) -> pd.DataFrame:
    """Equi-join cardinality estimate from two Count-Min sketches —
    the inner-product query of Cormode & Muthukrishnan 2005 §4.2:
    ``|A JOIN B| = sum_k fa(k)*fb(k)`` is estimated per depth as the
    cell-wise product sum of the two counter rows, then min over
    depths. Integer arithmetic throughout; NEVER underestimates (every
    true product survives its cell, collisions only add).

    Scale shape: each side is one streaming :func:`cms_counts` pass
    (constant ``depth x width`` merge state however large the fact
    table); the estimate is a depth x width driver-side dot product.
    The exact answer costs a full keyed co-location of BOTH fact
    tables — this is the query-planner's one-pass alternative.
    Returns one row ``(est_join_size,)``.
    """
    sa = cms_counts(a, col_a, depth, width, salt).to_pandas()
    sb = cms_counts(b, col_b, depth, width, salt).to_pandas()
    m = sa.merge(sb, on=["depth", "cell"], suffixes=("_a", "_b"))
    per_depth = (
        m.assign(p=m["n_a"].astype("int64") * m["n_b"].astype("int64"))
        .groupby("depth")["p"].sum()
    )
    # a depth with no shared non-empty cell estimates 0
    est = min(int(per_depth.get(d, 0)) for d in range(depth))
    return pd.DataFrame({"est_join_size": pd.array([est], dtype="int64")})


def hll_set_estimates(
    a: ray.data.Dataset,
    col_a: str,
    b: ray.data.Dataset,
    col_b: str,
    salt: str = "hll",
) -> pd.DataFrame:
    """HLL set algebra over two key sets — the sketch-side answer to
    "how much do these corpora overlap" without a distinct shuffle:
    ``|A|``/``|B|`` from each register table, ``|A u B|`` from the
    register-wise MAX merge (LOSSLESS for union — the defining HLL
    mergeability), ``|A n B|`` by inclusion-exclusion (the standard
    intersection estimate; variances ADD, so it degrades for tiny
    overlaps of huge sets — stated). One streaming register pass per
    side, register-scale driver algebra. Returns one row of the four
    estimates rounded 6.
    """
    ra = hll_registers(a, col_a, salt=salt).to_pandas()
    rb = hll_registers(b, col_b, salt=salt).to_pandas()
    ru = (
        pd.concat([ra, rb])
        .groupby("register", sort=True)["rho"].max().reset_index()
        .astype({"register": "int64", "rho": "int64"})
    )
    ea, eb, eu = hll_estimate(ra), hll_estimate(rb), hll_estimate(ru)
    return pd.DataFrame(
        {
            "est_a": [round(ea, 6)],
            "est_b": [round(eb, 6)],
            "est_union": [round(eu, 6)],
            "est_inter": [round(ea + eb - eu, 6)],
        }
    )
