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


def _pd_dtypes(ds: ray.data.Dataset) -> dict:
    """Column -> pandas dtype for a Dataset, resolved up front so the
    union-and-bucket join bodies can RESTORE dtypes after pandas'
    concat NaN-fill upcasts them (an int64 key silently becoming
    float64 changes its hash partition and silently drops rows in a
    downstream join — the exact bug this guards against)."""
    import pyarrow as _pa

    sch = ds.schema()
    out = {}
    for name, t in zip(sch.names, sch.types):
        if isinstance(t, _pa.DataType):
            try:
                out[name] = t.to_pandas_dtype()
            except NotImplementedError:
                out[name] = object
        else:
            out[name] = t
    return out



def _safe_astype(df: pd.DataFrame, dtypes: dict) -> pd.DataFrame:
    """Per-column astype that tolerates null-bearing int columns: a
    nullable int64 arrives as float64-with-NaN after the union concat
    and cannot cast back — keep the upcast column rather than failing
    the partition task. Join keys are NaN-free on their own side, so
    key hashing still sees restored dtypes."""
    ok = {}
    for col, dt in dtypes.items():
        if col not in df.columns:
            continue
        try:
            df[col].astype(dt)
            ok[col] = dt
        except (ValueError, TypeError):
            continue
    return df.astype(ok)


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str | list[str],
    how: str = "inner",
    num_partitions: int = 32,
    use_native: bool = True,
) -> ray.data.Dataset:
    """Join two large datasets on one key column or a composite key
    (pass a list — both paths partition/merge on the full tuple).

    The native ``Dataset.join`` path is used only when BOTH schemas
    are flat: Arrow's acero join rejects list/struct non-key columns
    (``Data type list<...> is not supported in join non-key field``),
    and the hash-shuffle aggregator pool it spawns (one actor per
    partition) can starve co-scheduled actor pools on small clusters —
    the portable union-and-bucket fallback is actor-free.
    """
    import pyarrow as _pa

    on = [on] if isinstance(on, str) else list(on)

    def _nested(ds: ray.data.Dataset) -> bool:
        for t in ds.schema().types:
            if isinstance(t, _pa.DataType):
                if _pa.types.is_nested(t):
                    return True
            else:  # pandas extension dtype (TensorDtype etc.)
                if not hasattr(t, "kind") or t.kind == "O":
                    return True
        return False

    if use_native and hasattr(left, "join") and not (
        _nested(left) or _nested(right)
    ):
        # public vocabulary is pandas-merge ("left"/"right"/"outer");
        # the native path speaks acero join-type names
        native_how = {
            "left": "left_outer",
            "right": "right_outer",
            "outer": "full_outer",
        }.get(how, how)
        return left.join(
            right, join_type=native_how, num_partitions=num_partitions,
            on=tuple(on),
        )

    lcols = [c for c in left.schema().names if c not in on]
    rcols = [c for c in right.schema().names if c not in on]
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

    ltypes = _pd_dtypes(left)
    rtypes = _pd_dtypes(right)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        # a partition can hold rows of only one side: reindex keeps the
        # full column set (missing side contributes an empty frame),
        # and astype undoes the concat NaN-fill dtype drift (safe after
        # the __side filter: each side's own columns are NaN-free)
        l = _safe_astype(g[g["__side"] == "L"].reindex(columns=on + lcols), ltypes)
        r = _safe_astype(g[g["__side"] == "R"].reindex(columns=on + rcols), rtypes)
        return l.merge(r, on=on, how=how)

    return partitioned_group_map(both, on, merge, num_partitions)


def pair_payload_join(
    pairs: ray.data.Dataset,
    payloads: ray.data.Dataset,
    key_a: str,
    key_b: str,
    id_col: str,
    payload_col: str,
    num_partitions: int = 16,
    dedup: bool = True,
) -> ray.data.Dataset:
    """(key_a, key_b) pair list x (id, payload) -> (key_a, key_b,
    pay_a, pay_b) in exactly TWO bounded-partition shuffles.

    The generic two-``hash_join`` composition pays a full shuffle per
    join plus join-operator overhead; this specialization exploits the
    pair shape: pass 1 co-locates every copy of a pair with its
    ``key_a`` payload (collapsing duplicate pairs for free — LSH pairs
    fire in many bands), pass 2 attaches the ``key_b`` payload. Used by
    the dedup/ANN verify stages, where ``payload`` is a packed binary
    shingle-set / unit-vector column.
    """
    ptypes = _pd_dtypes(pairs)

    def tag_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[key_a, key_b]].copy()
        df["__side"] = "P"
        return df

    def tag_payload(name_key, name_pay):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            out = df.rename(columns={id_col: name_key,
                                     payload_col: name_pay})
            out = out[[name_key, name_pay]].copy()
            out["__side"] = "S"
            return out

        return f

    u1 = pairs.map_batches(tag_pairs, batch_format="pandas").union(
        payloads.map_batches(tag_payload(key_a, "pay_a"),
                             batch_format="pandas")
    )

    def body1(g: pd.DataFrame) -> pd.DataFrame:
        p = _safe_astype(
            g[g["__side"] == "P"].reindex(columns=[key_a, key_b]),
            {key_a: ptypes[key_a], key_b: ptypes[key_b]},
        )
        if dedup:
            p = p.drop_duplicates()
        s = _safe_astype(
            g[g["__side"] == "S"].reindex(columns=[key_a, "pay_a"]),
            {key_a: ptypes[key_a]},
        )
        return p.merge(s, on=key_a, how="inner")

    j1 = partitioned_group_map(u1, [key_a], body1, num_partitions,
                               coalesce=2 * num_partitions)

    u2 = j1.map_batches(
        lambda df: df.assign(__side="P"), batch_format="pandas"
    ).union(
        payloads.map_batches(tag_payload(key_b, "pay_b"),
                             batch_format="pandas")
    )

    def body2(g: pd.DataFrame) -> pd.DataFrame:
        p = _safe_astype(
            g[g["__side"] == "P"].reindex(columns=[key_a, key_b, "pay_a"]),
            {key_a: ptypes[key_a], key_b: ptypes[key_b]},
        )
        s = _safe_astype(
            g[g["__side"] == "S"].reindex(columns=[key_b, "pay_b"]),
            {key_b: ptypes[key_b]},
        )
        return p.merge(s, on=key_b, how="inner")

    return partitioned_group_map(u2, [key_b], body2, num_partitions,
                                 coalesce=2 * num_partitions)


def _membership_join(
    left: ray.data.Dataset,
    right_keys: ray.data.Dataset,
    on: str,
    keep_members: bool,
    num_partitions: int,
) -> ray.data.Dataset:
    """Shared body for distributed semi/anti join: both sides are
    hash-partitioned on the key into a bounded partition count, one
    vectorized ``isin`` per partition. Use when the KEY side is
    fact-sized — a driver-side ``to_pandas`` of fact keys is the
    anti-pattern this replaces. For dimension-sized key sets prefer
    ``relational.semi_join_filter`` / ``anti_join_filter`` (broadcast,
    no shuffle of the left side)."""
    lcols = left.schema().names

    def tag(side):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__side"] = side
            return df

        return fn

    both = left.map_batches(tag("L"), batch_format="pandas").union(
        right_keys.select_columns([on]).map_batches(
            tag("R"), batch_format="pandas"
        )
    )

    ltypes = _pd_dtypes(left)

    def body(g: pd.DataFrame) -> pd.DataFrame:
        l = _safe_astype(g[g["__side"] == "L"].reindex(columns=lcols), ltypes)
        rk = g.loc[g["__side"] == "R", on]
        member = l[on].isin(set(rk.dropna()))
        return l[member if keep_members else ~member]

    return partitioned_group_map(both, [on], body, num_partitions)


def semi_join(
    left: ray.data.Dataset,
    right_keys: ray.data.Dataset,
    on: str,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Distributed semi join: keep left rows whose key appears in
    ``right_keys`` (a Dataset with an ``on`` column)."""
    return _membership_join(left, right_keys, on, True, num_partitions)


def anti_join(
    left: ray.data.Dataset,
    right_keys: ray.data.Dataset,
    on: str,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Distributed anti join: keep left rows whose key does NOT appear
    in ``right_keys``."""
    return _membership_join(left, right_keys, on, False, num_partitions)


def interval_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    by: str,
    left_range: tuple[str, str],
    right_range: tuple[str, str],
    bin_size: int = 1_000,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Distributed range (interval-overlap) join: emit one row per
    (left, right) pair sharing a ``by`` key whose INCLUSIVE integer
    ranges overlap (``l_start <= r_end AND r_start <= l_end``) — the
    genomic region x variant/probe join the reference performs via an
    in-memory position index probe (rsid index family,
    /root/reference/biocypher_metta/adapters/abc_adapter.py:40-60),
    re-expressed so BOTH sides may be fact-sized.

    Strategy (bin-and-dedupe, the standard distributed range-join
    shape): each interval is replicated to every fixed-size coordinate
    bin it touches, both sides are hash-partitioned on ``(by, bin)``,
    and one vectorized equi-merge + overlap filter runs per partition.
    A pair whose overlap spans several bins would fire once per shared
    bin, so each partition body keeps a pair only in the FIRST bin of
    its overlap (``max(l_start, r_start) // bin_size == bin``) — exact
    output, no global dedup shuffle.

    Partitioning assumptions: non-key columns are disjoint between the
    sides (rename upstream, as for :func:`hash_join`); replication
    factor is ``~1 + span/bin_size`` per row, so pick ``bin_size`` near
    the typical interval span (a few replicas per row), and the rows of
    one (key, bin) cell must fit a partition — for a pathologically hot
    cell, shrink ``bin_size`` before salting.
    """
    ls, le = left_range
    rs, re_ = right_range
    lcols = left.schema().names
    rcols = right.schema().names
    overlap = set(lcols) & set(rcols)
    if by in overlap:
        overlap.discard(by)
    if overlap:
        raise ValueError(f"non-key column overlap: {overlap}")
    lcols = [c for c in lcols if c != by]
    rcols = [c for c in rcols if c != by]

    def expand(side, start_col, end_col):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            s = df[start_col].to_numpy()
            e = df[end_col].to_numpy()
            nbins = (e // bin_size - s // bin_size + 1).astype(np.int64)
            idx = np.repeat(np.arange(len(df)), nbins)
            # within-row bin offsets: global position minus the first
            # position of each row's run
            first = np.concatenate(([0], np.cumsum(nbins)[:-1]))
            off = np.arange(idx.size) - np.repeat(first, nbins)
            out = df.iloc[idx].copy()
            out["__bin"] = (s // bin_size)[idx] + off
            out["__side"] = side
            return out

        return fn

    both = left.map_batches(expand("L", ls, le), batch_format="pandas").union(
        right.map_batches(expand("R", rs, re_), batch_format="pandas")
    )

    ltypes = _pd_dtypes(left)
    rtypes = _pd_dtypes(right)

    def body(g: pd.DataFrame) -> pd.DataFrame:
        l = _safe_astype(
            g[g["__side"] == "L"].reindex(columns=[by, "__bin"] + lcols), ltypes
        )
        r = _safe_astype(
            g[g["__side"] == "R"].reindex(columns=[by, "__bin"] + rcols), rtypes
        )
        m = l.merge(r, on=[by, "__bin"])
        if not len(m):
            return m.drop(columns=["__bin"])
        lo = np.maximum(m[ls].to_numpy(), m[rs].to_numpy())
        hit = (
            (m[ls].to_numpy() <= m[re_].to_numpy())
            & (m[rs].to_numpy() <= m[le].to_numpy())
            & (lo // bin_size == m["__bin"].to_numpy())
        )
        return m[hit].drop(columns=["__bin"])

    return partitioned_group_map(both, [by, "__bin"], body, num_partitions)


def _levenshtein(a: str, b: str) -> int:
    """Two-row DP edit distance (verify step only — candidate pairs
    are blocking-bounded, never all-pairs)."""
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _deletion_variants(s: str, d: int) -> set:
    """All strings obtainable by deleting up to ``d`` characters."""
    out = {s}
    frontier = {s}
    for _ in range(d):
        frontier = {
            v[:i] + v[i + 1 :] for v in frontier for i in range(len(v))
        }
        out |= frontier
    return out


def fuzzy_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_id: str,
    left_col: str,
    right_id: str,
    right_col: str,
    max_dist: int = 1,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Approximate string (edit-distance) join: emit ``(left_id,
    right_id, dist)`` for every cross pair with Levenshtein distance
    <= ``max_dist`` — the record-linkage join (corrupted mentions vs a
    canonical name table) the reference's exact broadcast-dict maps
    cannot express.

    Blocking is the SymSpell deletion-neighborhood guarantee: two
    strings within edit distance d share at least one member of their
    up-to-d-deletion variant sets, so each side explodes into its
    variants (len^d per row — keep d at 1-2), variants co-locate via
    one bounded hash partition, and only intra-bucket cross pairs are
    DP-verified. A second partition on the pair ids dedupes pairs
    found under several shared variants. Never an all-pairs product;
    candidate volume is bucket-bounded exactly like the LSH dedup
    family (salt hot variant buckets upstream if a single surface
    dominates)."""

    def explode(side, id_col, col):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            ids, variants, origs = [], [], []
            for i, s in zip(df[id_col], df[col]):
                for v in _deletion_variants(s, max_dist):
                    ids.append(i)
                    variants.append(v)
                    origs.append(s)
            return pd.DataFrame(
                {"__v": variants, "__id": ids, "__s": origs,
                 "__side": side}
            )

        return fn

    both = left.map_batches(
        explode("L", left_id, left_col), batch_format="pandas"
    ).union(
        right.map_batches(explode("R", right_id, right_col),
                          batch_format="pandas")
    )

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == "L"][["__v", "__id", "__s"]].rename(
            columns={"__id": "lid", "__s": "ls"}
        )
        r = g[g["__side"] == "R"][["__v", "__id", "__s"]].rename(
            columns={"__id": "rid", "__s": "rs"}
        )
        m = l.merge(r, on="__v").drop(columns="__v")
        return m.drop_duplicates(["lid", "rid"])

    cand = partitioned_group_map(both, ["__v"], candidates, num_partitions)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["lid", "rid"])
        dist = np.fromiter(
            (_levenshtein(a, b) for a, b in zip(g["ls"], g["rs"])),
            dtype=np.int64, count=len(g),
        )
        out = g[["lid", "rid"]].copy()
        out["dist"] = dist
        return out[out["dist"] <= max_dist]

    return partitioned_group_map(cand, ["lid", "rid"], verify,
                                 num_partitions)


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    by: str,
    on: str,
    num_partitions: int = 16,
    suffix: str = "_right",
    direction: str = "backward",
) -> ray.data.Dataset:
    """As-of join: for each left row, ONE right row of the same
    ``by`` key — ``backward`` (default): the latest with
    ``right[on] <= left[on]``; ``forward``: the earliest with
    ``right[on] >= left[on]``; ``nearest``: minimal ``|right[on] -
    left[on]|`` (the sensor-alignment variant; equidistant ties take
    the backward candidate, pandas' merge_asof rule — state it when
    the oracle must replay it)."""
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

    ltypes = _pd_dtypes(left)
    rtypes = _pd_dtypes(right)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        l = (_safe_astype(g[g["__side"] == "L"].reindex(columns=lcols), ltypes)
             .sort_values(on, kind="mergesort"))
        r = (_safe_astype(g[g["__side"] == "R"].reindex(columns=rcols), rtypes)
             .sort_values(on, kind="mergesort"))
        # empty-left partitions still emit the FULL joined schema with
        # correct dtypes (merge_asof over the empty frames) so every
        # block unifies to one Arrow schema downstream
        return pd.merge_asof(
            l, r, on=on, by=by, direction=direction, suffixes=("", suffix)
        )

    return partitioned_group_map(both, [by], merge, num_partitions)


BLOOM_D = 3
BLOOM_M = 32768  # divides 2^32 -> low-md5-half mod trick stays SQL-checkable


def bloom_bits(
    keys: ray.data.Dataset,
    on: str,
    depth: int = BLOOM_D,
    width: int = BLOOM_M,
    salt: str = "bloom",
) -> np.ndarray:
    """Bloom filter of a key column as a width-bit bool array.

    Deterministic md5-derived positions (``hash64(f"{salt}{i}:{v}") %
    width`` per arm — the CMS/hash_split trick, so DuckDB can recompute
    every bit). Build is one streaming pass emitting per-block DISTINCT
    positions (<= width rows per block however large the block), merged
    by the HLL/CMS two-level coalesce tree — never a keyed shuffle; the
    result is width/8 bytes on the driver.
    """
    from ..functions.helpers import hash64_column

    def positions(batch) -> pd.DataFrame:
        vals = pd.Series(
            [str(v) for v in batch[on].to_pylist()]
        ).drop_duplicates()
        pos = np.concatenate(
            [
                (hash64_column([f"{salt}{i}:{v}" for v in vals])
                 % np.uint64(width)).astype(np.int64)
                for i in range(depth)
            ]
        ) if len(vals) else np.array([], dtype=np.int64)
        return pd.DataFrame({"pos": pd.unique(pos)})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    pos = (
        keys.select_columns([on])
        .map_batches(positions, batch_format="pyarrow")
        .repartition(8)
        .map_batches(merge, batch_format="pandas", batch_size=None)
        .repartition(1)
        .map_batches(merge, batch_format="pandas", batch_size=None)
        .to_pandas()["pos"]
        .to_numpy()
    )
    bits = np.zeros(width, dtype=bool)
    bits[pos] = True
    return bits


def bloom_semi_join(
    left: ray.data.Dataset,
    right_keys: ray.data.Dataset,
    on: str,
    depth: int = BLOOM_D,
    width: int = BLOOM_M,
    salt: str = "bloom",
) -> ray.data.Dataset:
    """Bloom-filter semi-join PRE-FILTER: keep left rows whose key
    passes the Bloom test of ``right_keys`` — a deterministic SUPERSET
    of the exact semi join (false-positive rate ~(1-e^{-dn/m})^d; no
    false negatives), entirely shuffle-free: the filter is width/8
    bytes broadcast once, and the left side streams.

    This is the classic distributed-join optimization — cut the
    shuffled volume of a later exact :func:`semi_join`/:func:`hash_join`
    to the Bloom survivors — exposed as its own operator because at
    100 TB the pre-filter, not the join kernel, is where the bytes are
    saved. Exactness when needed: compose ``semi_join(bloom_semi_join(
    L, R), R)``.
    """
    from ..functions.helpers import hash64_column

    bits_ref = ray.put(bloom_bits(right_keys, on, depth, width, salt))

    def keep(batch):
        import pyarrow as pa

        bits = ray.get(bits_ref)
        vals = [str(v) for v in batch[on].to_pylist()]
        ok = np.ones(len(vals), dtype=bool)
        for i in range(depth):
            h = hash64_column([f"{salt}{i}:{v}" for v in vals])
            ok &= bits[(h % np.uint64(width)).astype(np.int64)]
        return batch.filter(pa.array(ok))

    return left.map_batches(keep, batch_format="pyarrow")


def diff_snapshots(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    key: list[str],
    compare_cols: list[str],
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """CDC-style snapshot diff: emit ``(key..., status)`` with status
    in ``added`` (key only in ``new``), ``removed`` (only in ``old``),
    ``changed`` (in both, any ``compare_cols`` value differs) — the
    incremental-pipeline primitive for re-processing only what moved
    between two ingest snapshots.

    Scale shape: both sides ship ONLY key + compare columns through
    one key co-location (tagged union, the joins-family pattern);
    unchanged rows — the overwhelming bulk between adjacent 100 TB
    snapshots — are dropped inside the partition body and never leave
    it, so the output is delta-scale. Two nulls compare equal; a null
    against a value is a change.
    """
    cols = key + compare_cols

    def tag(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return df[cols].assign(__side=side)
        return fn

    both = old.map_batches(tag("O"), batch_format="pandas").union(
        new.map_batches(tag("N"), batch_format="pandas"))

    def body(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["__side"] == "O"].drop(columns=["__side"])
        n = g[g["__side"] == "N"].drop(columns=["__side"])
        m = o.merge(n, on=key, how="outer", suffixes=("__o", "__n"),
                    indicator=True)
        status = np.where(
            m["_merge"] == "right_only", "added",
            np.where(m["_merge"] == "left_only", "removed", ""))
        if compare_cols:
            diff = np.zeros(len(m), dtype=bool)
            for c in compare_cols:
                a, b = m[f"{c}__o"], m[f"{c}__n"]
                diff |= ((a != b) & ~(a.isna() & b.isna())).to_numpy()
            status = np.where(
                (m["_merge"] == "both") & diff, "changed", status)
        m = m.assign(status=status)
        out = m.loc[m["status"] != "", key + ["status"]]
        if out.empty:
            e = g[key].iloc[:0].copy()
            e["status"] = pd.Series([], dtype="object")
            return e
        return out

    return partitioned_group_map(both, key, body, num_partitions)


def scd2_history(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    key: list[str],
    compare_cols: list[str],
    t_old: str,
    t_new: str,
    open_label: str = "9999-12-31",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Slowly-changing-dimension TYPE-2 history built from two
    snapshots — the warehouse-side sibling of :func:`diff_snapshots`:
    every key becomes validity-interval rows ``(key..., compare...,
    valid_from, valid_to)``:

    - only in old:  (old values, t_old, t_new)            — retired
    - only in new:  (new values, t_new, open_label)       — born
    - changed:      (old values, t_old, t_new) AND
                    (new values, t_new, open_label)
    - unchanged:    (old values, t_old, open_label)

    ``open_label`` is the classic SCD2 high-date sentinel (no NULLs in
    the interval columns, so downstream BETWEEN predicates and the
    oracle's value-hash both stay null-free). Null compare semantics
    match diff_snapshots: two nulls equal, null vs value differs.

    PRECONDITION (same latent assumption as diff_snapshots, enforced
    here): each snapshot holds AT MOST ONE row per key — snapshots
    are keyed states, not event logs. A duplicate key on either side
    would otherwise produce a silent cross product of interval rows;
    instead the per-key body raises ValueError.

    Scale shape: the same tagged-union single key co-location as
    diff_snapshots — only key + compare columns ship; output is
    |new| + |removed| + |changed| rows (unchanged keys emit exactly
    one row, never two).
    """
    cols = key + compare_cols

    def tag(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return df[cols].assign(__side=side)
        return fn

    both = old.map_batches(tag("O"), batch_format="pandas").union(
        new.map_batches(tag("N"), batch_format="pandas"))

    def body(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["__side"] == "O"].drop(columns=["__side"])
        n = g[g["__side"] == "N"].drop(columns=["__side"])
        for side, name in ((o, "old"), (n, "new")):
            if len(side) and side.duplicated(subset=key).any():
                raise ValueError(
                    f"scd2_history: duplicate key rows in the {name} "
                    "snapshot — snapshots must hold at most one row "
                    "per key")
        m = o.merge(n, on=key, how="outer", suffixes=("__o", "__n"),
                    indicator=True)
        in_o = (m["_merge"] != "right_only").to_numpy()
        in_n = (m["_merge"] != "left_only").to_numpy()
        diff = np.zeros(len(m), dtype=bool)
        for c in compare_cols:
            a, b = m[f"{c}__o"], m[f"{c}__n"]
            diff |= ((a != b) & ~(a.isna() & b.isna())).to_numpy()
        closed = in_o & (~in_n | diff)

        def rows(mask, sfx, vfrom, vto):
            r = m.loc[mask, key + [f"{c}{sfx}" for c in compare_cols]]
            r.columns = cols
            r["valid_from"] = vfrom
            r["valid_to"] = vto if isinstance(vto, str) else vto
            return r

        out = pd.concat(
            [
                rows(in_o & ~closed, "__o", t_old, open_label),
                rows(closed, "__o", t_old, t_new),
                rows(in_n & (~in_o | diff), "__n", t_new, open_label),
            ],
            ignore_index=True,
        )
        if out.empty:
            e = g[cols].iloc[:0].copy()
            e["valid_from"] = pd.Series([], dtype="object")
            e["valid_to"] = pd.Series([], dtype="object")
            return e
        return out

    return partitioned_group_map(both, key, body, num_partitions)


def merge_intervals(
    ds: ray.data.Dataset,
    key_cols: list[str],
    start_col: str,
    end_col: str,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """bedtools-merge analog: collapse overlapping intervals per key
    into maximal islands ``(key..., istart, iend, n_merged)`` —
    inclusive coordinates, so an interval starting AT the running max
    end merges (``start > running_max`` opens a new island). The
    region-arithmetic primitive the reference's BED-shaped sources
    imply (reference anchor: none — its adapters emit regions but
    never merge them; this is the engine-side completion).

    Scale shape: one key co-location (a key's intervals must be
    swept together — the same partitioning assumption as the
    interval join); the body is the vectorized gaps-and-islands sweep
    (sort by (start, end), running ``np.maximum.accumulate`` of end,
    island = cumsum of gap breaks), per key within the partition.
    Output is island-scale.
    """
    from .skew import partitioned_group_map

    def body(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, grp in g.groupby(key_cols, sort=False):
            grp = grp.sort_values([start_col, end_col],
                                  kind="mergesort")
            s = grp[start_col].to_numpy()
            e = grp[end_col].to_numpy()
            cummax = np.maximum.accumulate(e)
            brk = np.ones(len(grp), dtype=bool)
            brk[1:] = s[1:] > cummax[:-1]
            island = np.cumsum(brk) - 1
            grp = grp.assign(__island=island)
            agg = grp.groupby([*key_cols, "__island"], sort=False).agg(
                istart=(start_col, "min"),
                iend=(end_col, "max"),
                n_merged=(start_col, "size"),
            ).reset_index().drop(columns="__island")
            outs.append(agg)
        if not outs:
            out = g[key_cols].iloc[:0].copy()
            out["istart"] = pd.Series([], dtype="int64")
            out["iend"] = pd.Series([], dtype="int64")
            out["n_merged"] = pd.Series([], dtype="int64")
            return out
        out = pd.concat(outs, ignore_index=True)
        out["n_merged"] = out["n_merged"].astype("int64")
        return out

    return partitioned_group_map(ds, key_cols, body, num_partitions)


def interval_gaps(
    ds: ray.data.Dataset,
    key_cols: list[str],
    start_col: str,
    end_col: str,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """bedtools-complement (within data extent): the gaps BETWEEN a
    key's merged islands — ``(key..., gstart, gend)`` with
    ``gstart = island_end + 1`` and ``gend = next_island_start - 1``
    (inclusive coords; the unmerged raw intervals are islanded first
    via :func:`merge_intervals`'s sweep). Island tables are
    island-scale, so the gap pass is one more small key co-location
    with a vectorized shift per key.
    """
    from .skew import partitioned_group_map

    merged = merge_intervals(ds, key_cols, start_col, end_col,
                             num_partitions)

    def body(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, grp in g.groupby(key_cols, sort=False):
            grp = grp.sort_values("istart", kind="mergesort")
            if len(grp) < 2:
                continue
            head = grp.iloc[:-1]
            nxt_start = grp["istart"].to_numpy()[1:]
            out = head[key_cols].copy()
            out["gstart"] = head["iend"].to_numpy() + 1
            out["gend"] = nxt_start - 1
            outs.append(out)
        if not outs:
            out = g[key_cols].iloc[:0].copy()
            out["gstart"] = pd.Series([], dtype="int64")
            out["gend"] = pd.Series([], dtype="int64")
            return out
        out = pd.concat(outs, ignore_index=True)
        out["gstart"] = out["gstart"].astype("int64")
        out["gend"] = out["gend"].astype("int64")
        return out

    return partitioned_group_map(merged, key_cols, body, num_partitions)


def coverage_depth(
    ds: ray.data.Dataset,
    key_cols: list[str],
    start_col: str,
    end_col: str,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """bedtools-genomecov analog: per key, the total number of base
    positions covered by exactly ``depth`` intervals (inclusive
    coords) — ``(key..., depth, bases)`` for every depth > 0.

    Scale shape: one key co-location (all of a key's intervals sweep
    together), then the classic boundary-event sweep fully vectorized:
    events ``(start, +1), (end + 1, -1)`` combine per position
    (np.unique + bincount), running depth is one cumsum, and each
    inter-boundary segment contributes ``segment_length`` bases at its
    depth. Output is (key x distinct-depth)-scale.
    """
    from .skew import partitioned_group_map

    def body(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for key, grp in g.groupby(key_cols, sort=False):
            s = grp[start_col].to_numpy()
            e = grp[end_col].to_numpy() + 1
            pos = np.concatenate([s, e])
            delta = np.concatenate(
                [np.ones(len(s), dtype=np.int64),
                 -np.ones(len(e), dtype=np.int64)]
            )
            upos, inv = np.unique(pos, return_inverse=True)
            d = np.bincount(inv, weights=delta).astype(np.int64)
            depth = np.cumsum(d)[:-1]
            seg = np.diff(upos)
            keep = depth > 0
            if not keep.any():
                continue
            df = pd.DataFrame({"depth": depth[keep], "bases": seg[keep]})
            agg = df.groupby("depth", sort=False)["bases"].sum().reset_index()
            if not isinstance(key, tuple):
                key = (key,)
            for c, v in zip(key_cols, key):
                agg[c] = v
            outs.append(agg[[*key_cols, "depth", "bases"]])
        if not outs:
            out = g[key_cols].iloc[:0].copy()
            out["depth"] = pd.Series([], dtype="int64")
            out["bases"] = pd.Series([], dtype="int64")
            return out
        out = pd.concat(outs, ignore_index=True)
        out["depth"] = out["depth"].astype("int64")
        out["bases"] = out["bases"].astype("int64")
        return out

    return partitioned_group_map(ds, key_cols, body, num_partitions)
