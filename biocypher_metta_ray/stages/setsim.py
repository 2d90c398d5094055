"""Exact set-similarity join via prefix filtering (AllPairs / PPJoin).

The n-gram-Jaccard member of the dedup family (beside MinHash-LSH /
SimHash / embedding-LSH in stages/dedup.py): returns the EXACT pair
list {(a, b, J(a,b)) : J >= threshold} over per-document word-n-gram
sets — no probabilistic recall loss. LSH answers "find most near-dups
cheaply"; this answers "find ALL pairs above t", the contract a
decontamination or clone-detection pass needs.

Algorithm (Bayardo et al., "Scaling Up All Pairs Similarity Search",
WWW'07; Xiao et al. PPJoin, WWW'08 — public papers):

1. Per doc, the distinct n-gram hash set (same shingle kernel as
   MinHash, stages/dedup.py::MinHasher._doc_shingles, so Jaccard over
   hashes == Jaccard over literal n-grams up to md5-64 collisions).
   Docs with fewer than ``ngram`` tokens have no n-gram windows and
   are excluded — mirroring the SQL oracle's window construction.
2. PREFIX FILTER: order every doc's grams by ONE global total order
   and keep only the first ``p = s - ceil(t*s) + 1`` (s = set size).
   Lemma: J(a,b) >= t implies the two prefixes share a gram under any
   shared total order — so grouping prefix rows by gram yields a
   candidate superset; exactness comes from the verify pass, the
   order only controls candidate COUNT.
3. Candidate pairs per prefix-gram group (hash-partitioned
   co-location) with the size-ratio pre-filter
   ``min(sa,sb) >= t * max(sa,sb)`` (necessary for J >= t).
4. Exact verify through the existing distributed pair-payload join +
   packed-set Jaccard (stages/dedup.py::verify_jaccard).

The order is ASCENDING DOCUMENT FREQUENCY (ties by gram hash) — the
part of AllPairs that actually controls the blow-up: each prefix then
holds the doc's RAREST grams, so two docs collide only when they
share a rare gram. (A first cut used hash order with only the top-64
grams demoted; on a 5k-doc template-generated corpus that emitted
8.45M candidates — nearly all-pairs — because mid-frequency template
grams stayed in prefixes. df order collapses it to 201k.) Computed
scale-honestly, no vocab broadcast and no separate aggregate: the df
attach is ONE gram-keyed co-location whose body counts each gram's
rows with a vectorized transform — co-location is global per gram, so
the per-partition count IS the global df. (A first cut ran a
grouped_agg + hash join instead: the native sort-aggregate cost 53 s
at 27k distinct grams where the fused co-location costs ~3 s.)

IDENTICAL-SET COLLAPSE (default on): web corpora are full of EXACT
duplicates, and they are AllPairs' pathological input — every copy
shares every prefix gram, so a duplicate group of size k appears in
each of its ~p prefix-gram groups and emits O(p * k^2) candidate rows
for O(k^2) true pairs (measured at 10x-replicated sf0.1: 22.6M
candidates for 250,600 true pairs; verify then shuffles all of them —
347 s total). Jaccard depends only on the gram SET, so docs with
byte-identical sorted gram arrays (md5-128 fingerprint — same
collision caveat as the shingle hash) are collapsed to their min-id
representative, the join runs on representatives only, and pairs
expand back to members afterwards: intra-group pairs are exactly
J = 1.0 >= t, cross-group pairs inherit the representative score
verbatim (identical sets -> identical floats, oracle parity holds).
The expansion output is the true pair list — inherently quadratic in
duplicate-group size; callers who only need groups should use
dedup.exact_dedup / near_dup_groups instead.

All fact-scale co-locations ride partitioned_group_map's autoscaled
partition counts.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .dedup import MinHasher, verify_jaccard
from .skew import partitioned_group_map


def _prefix_len(size: int, threshold: float) -> int:
    """Prefix length s - ceil(t*s) + 1, with the float error pushed in
    the SAFE direction (a too-long prefix only adds candidates; a
    too-short one silently drops true pairs)."""
    return size - int(math.ceil(threshold * size - 1e-9)) + 1


def gram_rows(
    ds: ray.data.Dataset,
    ngram: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """DISTINCT (gram:int64, doc_id, sz:int64) rows per document —
    sz is the doc's distinct-gram-set size. Docs with < ``ngram``
    tokens contribute nothing (no n-gram window exists)."""
    hasher = MinHasher(num_perms=1, num_bands=1, n_shingle=ngram,
                       id_col=id_col, text_col=text_col)

    def body(batch: pa.Table) -> pd.DataFrame:
        sh, starts = hasher._doc_shingles(batch)
        toks = pc.split_pattern(batch[text_col], " ")
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_gram, out_doc, out_sz = [], [], []
        for d in range(len(batch)):
            if lengths[d] < ngram:
                continue
            u = np.unique(sh[starts[d]:starts[d + 1]])
            s = len(u)
            if s == 0:
                continue
            out_gram.append(u)
            out_doc.append(np.full(s, ids[d], dtype=np.int64))
            out_sz.append(np.full(s, s, dtype=np.int64))
        if not out_gram:
            return pd.DataFrame({
                "gram": pd.Series([], dtype="int64"),
                id_col: pd.Series([], dtype="int64"),
                "sz": pd.Series([], dtype="int64"),
            })
        return pd.DataFrame({
            "gram": np.concatenate(out_gram).view(np.int64),
            id_col: np.concatenate(out_doc),
            "sz": np.concatenate(out_sz),
        })

    return ds.map_batches(body, batch_format="pyarrow")


def doc_fingerprints(
    ds: ray.data.Dataset,
    ngram: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Per eligible doc (>= ``ngram`` tokens, non-empty gram set):
    (id, fp1:int64, fp2:int64) — the md5-128 of the SORTED distinct
    gram-hash array bytes, split into two int64 key columns so the
    identical-set co-location hash-partitions on fixed-width ints.
    Same eligibility rule as :func:`gram_rows` by construction."""
    hasher = MinHasher(num_perms=1, num_bands=1, n_shingle=ngram,
                       id_col=id_col, text_col=text_col)

    def body(batch: pa.Table) -> pd.DataFrame:
        sh, starts = hasher._doc_shingles(batch)
        toks = pc.split_pattern(batch[text_col], " ")
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_id, out_f1, out_f2 = [], [], []
        for d in range(len(batch)):
            if lengths[d] < ngram:
                continue
            u = np.unique(sh[starts[d]:starts[d + 1]])
            if len(u) == 0:
                continue
            dig = hashlib.md5(u.tobytes()).digest()
            out_id.append(ids[d])
            out_f1.append(int.from_bytes(dig[:8], "little", signed=True))
            out_f2.append(int.from_bytes(dig[8:], "little", signed=True))
        return pd.DataFrame({
            id_col: pd.Series(out_id, dtype="int64"),
            "fp1": pd.Series(out_f1, dtype="int64"),
            "fp2": pd.Series(out_f2, dtype="int64"),
        })

    return ds.map_batches(body, batch_format="pyarrow")


def _expand_side(
    pairs: ray.data.Dataset,
    members: ray.data.Dataset,
    side_col: str,
    id_col: str,
    num_partitions: int,
) -> ray.data.Dataset:
    """Replace the representative in ``side_col`` with EVERY member of
    its identical-set group (one-to-many, tagged-union co-location on
    the rep key — the same two-pass shape as joins.pair_payload_join
    but many-to-many)."""

    def tag_p(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__side"] = "P"
        df["rep"] = df[side_col]
        return df

    def tag_m(df: pd.DataFrame) -> pd.DataFrame:
        out = df.rename(columns={id_col: "member"})
        out = out[["rep", "member"]].copy()
        out["__side"] = "M"
        return out

    u = pairs.map_batches(tag_p, batch_format="pandas").union(
        members.map_batches(tag_m, batch_format="pandas"))
    other = "doc_b" if side_col == "doc_a" else "doc_a"

    def body(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["__side"] == "P"].reindex(
            columns=["rep", other, "jaccard"])
        m = g[g["__side"] == "M"].reindex(columns=["rep", "member"])
        out = p.merge(m, on="rep", how="inner")
        out = out.rename(columns={"member": side_col})
        out = out[["doc_a", "doc_b", "jaccard"]]
        return out.astype({"doc_a": "int64", "doc_b": "int64",
                           "jaccard": "float64"})

    return partitioned_group_map(u, ["rep"], body, num_partitions)


# driver-side intra-pair generation cap: above this the C(k,2)
# expansion of identical-set groups runs distributed instead
INTRA_DRIVER_CAP = 4_000_000


def _empty_pairs() -> pd.DataFrame:
    return pd.DataFrame({
        "doc_a": pd.Series([], dtype="int64"),
        "doc_b": pd.Series([], dtype="int64"),
        "jaccard": pd.Series([], dtype="float64"),
    })


def _intra_pairs_df(members: pd.DataFrame, id_col: str) -> pd.DataFrame:
    """All C(k,2) pairs inside identical-set groups at exactly
    J = 1.0 (vectorized self-merge; input is group-member rows)."""
    g = members[members.duplicated(subset=["rep"], keep=False)]
    if g.empty:
        return _empty_pairs()
    m = g.merge(g, on="rep", suffixes=("_x", "_y"))
    m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
    out = pd.DataFrame({
        "doc_a": m[f"{id_col}_x"].to_numpy(dtype=np.int64),
        "doc_b": m[f"{id_col}_y"].to_numpy(dtype=np.int64),
    })
    out["jaccard"] = 1.0
    return out


def _collapse_broadcast(
    ds: ray.data.Dataset,
    fps: ray.data.Dataset,
    threshold: float,
    ngram: int,
    id_col: str,
    text_col: str,
    num_partitions: int,
) -> ray.data.Dataset:
    """Identical-set collapse when the fingerprint table fits the
    broadcast budget: grouping driver-side, rep filter + pair
    expansion map-side — ZERO extra shuffles over the core join. A
    dup-free corpus short-circuits to the core join after one
    fingerprint scan."""
    import ray

    from .relational import semi_join_filter

    pdf = fps.to_pandas()
    pdf["rep"] = pdf.groupby(["fp1", "fp2"], sort=False)[id_col] \
                    .transform("min")
    members = pdf[[id_col, "rep"]]
    multi = members[members.duplicated(subset=["rep"], keep=False)]
    if multi.empty:
        return _ngram_jaccard_core(ds, threshold, ngram, id_col,
                                   text_col, num_partitions)

    reps = members.loc[members[id_col] == members["rep"], id_col]
    rep_docs = semi_join_filter(
        ds.select_columns([id_col, text_col]), reps.to_numpy(), id_col)
    rep_pairs = _ngram_jaccard_core(
        rep_docs, threshold, ngram, id_col, text_col, num_partitions)

    # member arrays only for groups with k > 1; singleton reps expand
    # to themselves without a dict entry
    by_rep = {
        int(r): grp.to_numpy(dtype=np.int64)
        for r, grp in multi.groupby("rep", sort=False)[id_col]
    }
    mem_ref = ray.put(by_rep)

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _empty_pairs()
        m = ray.get(mem_ref)
        a = df["doc_a"].to_numpy(dtype=np.int64)
        b = df["doc_b"].to_numpy(dtype=np.int64)
        j = df["jaccard"].to_numpy(dtype=np.float64)
        keys = np.fromiter(m.keys(), dtype=np.int64, count=len(m))
        plain = ~np.isin(a, keys) & ~np.isin(b, keys)
        outs = [pd.DataFrame({"doc_a": a[plain], "doc_b": b[plain],
                              "jaccard": j[plain]})]
        for i in np.flatnonzero(~plain):
            ma = m.get(int(a[i]), a[i:i + 1])
            mb = m.get(int(b[i]), b[i:i + 1])
            xa = np.repeat(ma, len(mb))
            xb = np.tile(mb, len(ma))
            outs.append(pd.DataFrame({
                "doc_a": np.minimum(xa, xb),
                "doc_b": np.maximum(xa, xb),
                "jaccard": np.full(len(xa), j[i]),
            }))
        return pd.concat(outs, ignore_index=True)

    expanded = rep_pairs.map_batches(expand, batch_format="pandas")

    sizes = multi.groupby("rep", sort=False).size().to_numpy()
    n_intra = int((sizes * (sizes - 1) // 2).sum())
    if n_intra <= INTRA_DRIVER_CAP:
        intra = ray.data.from_pandas(_intra_pairs_df(multi, id_col))
    else:
        intra = partitioned_group_map(
            ray.data.from_pandas(multi),
            ["rep"],
            lambda g: _intra_pairs_df(g, id_col),
            num_partitions,
        )
    return expanded.union(intra)


def ngram_jaccard_join(
    ds: ray.data.Dataset,
    threshold: float = 0.6,
    ngram: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 16,
    collapse_identical: bool = True,
    broadcast_bytes: int = 64 << 20,
) -> ray.data.Dataset:
    """Exact all-pairs n-gram Jaccard join: every unordered pair with
    J(gram-set_a, gram-set_b) >= ``threshold`` plus the exact score.

    Output columns: (doc_a, doc_b, jaccard) with doc_a < doc_b.
    ``collapse_identical`` routes byte-identical gram sets through one
    representative (see module docstring — the duplicate-heavy-corpus
    fast path; exactness preserved). See the module docstring for the
    algorithm and scale analysis.
    """
    if not collapse_identical:
        return _ngram_jaccard_core(ds, threshold, ngram, id_col,
                                   text_col, num_partitions)
    from .joins import semi_join

    fps = doc_fingerprints(ds, ngram=ngram, id_col=id_col,
                           text_col=text_col).materialize()

    # SIZE-ADAPTIVE: the fingerprint table is 24 B/doc — up to ~2.7M
    # docs it fits the repo's 64 MB broadcast budget (same rule as the
    # Q5 join planner), and the grouping + expansion run driver-side /
    # map-side with ZERO extra shuffles. Above it, the fully
    # distributed co-location path below. Without this, a dup-free
    # bench corpus paid ~8 s of fixed shuffle cost for nothing.
    try:
        fp_bytes = fps.size_bytes()
    except Exception:
        fp_bytes = None
    if fp_bytes is not None and fp_bytes < broadcast_bytes:
        return _collapse_broadcast(
            ds, fps, threshold, ngram, id_col, text_col,
            num_partitions)

    def member_body(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["rep"] = g.groupby(["fp1", "fp2"], sort=False)[id_col] \
                    .transform("min")
        return g[[id_col, "rep"]].astype({id_col: "int64",
                                          "rep": "int64"})

    members = partitioned_group_map(fps, ["fp1", "fp2"], member_body,
                                    num_partitions).materialize()

    def only_reps(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[df[id_col] == df["rep"], [id_col]]

    reps = members.map_batches(only_reps, batch_format="pandas")
    rep_docs = semi_join(
        ds.select_columns([id_col, text_col]), reps, on=id_col,
        num_partitions=num_partitions)
    rep_pairs = _ngram_jaccard_core(
        rep_docs, threshold, ngram, id_col, text_col, num_partitions)

    # intra-group pairs: identical sets, J = 1.0 exactly (>= any t<=1)
    def intra_body(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g.duplicated(subset=["rep"], keep=False)]
        if g.empty:
            return pd.DataFrame({
                "doc_a": pd.Series([], dtype="int64"),
                "doc_b": pd.Series([], dtype="int64"),
                "jaccard": pd.Series([], dtype="float64"),
            })
        m = g.merge(g, on="rep", suffixes=("_x", "_y"))
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        out = pd.DataFrame({
            "doc_a": m[f"{id_col}_x"].to_numpy(dtype=np.int64),
            "doc_b": m[f"{id_col}_y"].to_numpy(dtype=np.int64),
        })
        out["jaccard"] = 1.0
        return out

    intra = partitioned_group_map(members, ["rep"], intra_body,
                                  num_partitions)

    expanded = _expand_side(
        _expand_side(rep_pairs, members, "doc_a", id_col,
                     num_partitions),
        members, "doc_b", id_col, num_partitions)

    def normalize(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df.astype({"doc_a": "int64", "doc_b": "int64",
                              "jaccard": "float64"})
        a = df["doc_a"].to_numpy()
        b = df["doc_b"].to_numpy()
        return pd.DataFrame({
            "doc_a": np.minimum(a, b),
            "doc_b": np.maximum(a, b),
            "jaccard": df["jaccard"].to_numpy(),
        })

    return expanded.map_batches(normalize,
                                batch_format="pandas").union(intra)


def ngram_containment_join(
    ds: ray.data.Dataset,
    threshold: float = 0.7,
    ngram: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 16,
    collapse_identical: bool = True,
    broadcast_bytes: int = 64 << 20,
) -> ray.data.Dataset:
    """Exact DIRECTED n-gram containment join: every ordered pair
    (a, b), a != b, with C(a->b) = |A ∩ B| / |A| >= ``threshold`` —
    "A's gram set is mostly inside B's". The asymmetric member of the
    dedup family: finds near-SUBSET duplicates (a page embedded in a
    larger page, a quoted passage, a truncated mirror) that symmetric
    Jaccard misses because the union is dominated by the larger doc.

    Output columns: (doc_a, doc_b, containment) with doc_a the
    contained side. Both directions are reported when both clear the
    threshold (identical sets give 1.0 each way).

    Prefix filter (overlap-constraint form of AllPairs, Bayardo et
    al. WWW'07): C(a->b) >= t implies overlap o >= ceil(t*|A|), so if
    the first |A| - o + 1 grams of A under ANY global order all miss
    B, the overlap tops out at o - 1 — contradiction. Hence only the
    PROBE side (A) is prefix-pruned, with the same ``_prefix_len``
    formula as Jaccard; the INDEX side (B) has no size-dependent
    bound (o depends on the partner's size) and keeps every gram row.
    That full-side shuffle is the inherent extra cost of containment
    vs Jaccard; df-ordered prefixes keep the candidate count bounded
    exactly as in the Jaccard join (a probe row only meets the docs
    sharing one of its RAREST grams). Size pre-filter:
    |B| >= overlap >= ceil(t*|A|).

    IDENTICAL-SET COLLAPSE (default on): identical gram sets have
    identical containment scores in BOTH directions (C depends only on
    the two sets), so — exactly as in :func:`ngram_jaccard_join` — the
    core join runs on min-id representatives and pairs expand back to
    members with the score copied verbatim; intra-group ORDERED pairs
    are k(k-1) rows at exactly 1.0 >= t. Duplicate-heavy corpora are
    the pathological input here too (measured at sf0.1: 15 s -> ~6 s).
    The collapse currently ships only the broadcast regime (fingerprint
    table under ``broadcast_bytes`` ~ 2.7M docs at 24 B/doc); above it
    the core join runs uncollapsed — the distributed-collapse shape
    exists in the Jaccard join and can be ported when a corpus needs it.
    """
    if collapse_identical:
        fps = doc_fingerprints(ds, ngram=ngram, id_col=id_col,
                               text_col=text_col).materialize()
        try:
            fp_bytes = fps.size_bytes()
        except Exception:
            fp_bytes = None
        if fp_bytes is not None and fp_bytes < broadcast_bytes:
            return _containment_collapse_broadcast(
                ds, fps, threshold, ngram, id_col, text_col,
                num_partitions)
    return _containment_core(ds, threshold, ngram, id_col, text_col,
                             num_partitions)


def _empty_containment() -> pd.DataFrame:
    return pd.DataFrame({
        "doc_a": pd.Series([], dtype="int64"),
        "doc_b": pd.Series([], dtype="int64"),
        "containment": pd.Series([], dtype="float64"),
    })


def _containment_collapse_broadcast(
    ds: ray.data.Dataset,
    fps: ray.data.Dataset,
    threshold: float,
    ngram: int,
    id_col: str,
    text_col: str,
    num_partitions: int,
) -> ray.data.Dataset:
    """Identical-set collapse for the DIRECTED join, broadcast regime
    (same shape as :func:`_collapse_broadcast` minus the min/max pair
    normalization — direction is preserved through expansion)."""
    import ray

    from .relational import semi_join_filter

    pdf = fps.to_pandas()
    pdf["rep"] = pdf.groupby(["fp1", "fp2"], sort=False)[id_col] \
                    .transform("min")
    members = pdf[[id_col, "rep"]]
    multi = members[members.duplicated(subset=["rep"], keep=False)]
    if multi.empty:
        return _containment_core(ds, threshold, ngram, id_col,
                                 text_col, num_partitions)

    reps = members.loc[members[id_col] == members["rep"], id_col]
    rep_docs = semi_join_filter(
        ds.select_columns([id_col, text_col]), reps.to_numpy(), id_col)
    rep_pairs = _containment_core(rep_docs, threshold, ngram, id_col,
                                  text_col, num_partitions)

    by_rep = {
        int(r): grp.to_numpy(dtype=np.int64)
        for r, grp in multi.groupby("rep", sort=False)[id_col]
    }
    mem_ref = ray.put(by_rep)

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _empty_containment()
        m = ray.get(mem_ref)
        a = df["doc_a"].to_numpy(dtype=np.int64)
        b = df["doc_b"].to_numpy(dtype=np.int64)
        c = df["containment"].to_numpy(dtype=np.float64)
        keys = np.fromiter(m.keys(), dtype=np.int64, count=len(m))
        plain = ~np.isin(a, keys) & ~np.isin(b, keys)
        outs = [pd.DataFrame({"doc_a": a[plain], "doc_b": b[plain],
                              "containment": c[plain]})]
        for i in np.flatnonzero(~plain):
            ma = m.get(int(a[i]), a[i:i + 1])
            mb = m.get(int(b[i]), b[i:i + 1])
            outs.append(pd.DataFrame({
                "doc_a": np.repeat(ma, len(mb)),
                "doc_b": np.tile(mb, len(ma)),
                "containment": np.full(len(ma) * len(mb), c[i]),
            }))
        return pd.concat(outs, ignore_index=True)

    expanded = rep_pairs.map_batches(expand, batch_format="pandas")

    # ordered intra-group pairs: k(k-1) per group at exactly 1.0
    g = multi
    mm = g.merge(g, on="rep", suffixes=("_x", "_y"))
    mm = mm[mm[f"{id_col}_x"] != mm[f"{id_col}_y"]]
    sizes = g.groupby("rep", sort=False).size().to_numpy()
    n_intra = int((sizes * (sizes - 1)).sum())
    if n_intra and n_intra <= INTRA_DRIVER_CAP:
        intra_df = pd.DataFrame({
            "doc_a": mm[f"{id_col}_x"].to_numpy(dtype=np.int64),
            "doc_b": mm[f"{id_col}_y"].to_numpy(dtype=np.int64),
        })
        intra_df["containment"] = 1.0
        intra = ray.data.from_pandas(
            intra_df if not intra_df.empty else _empty_containment())
    else:
        def intra_body(grp: pd.DataFrame) -> pd.DataFrame:
            x = grp.merge(grp, on="rep", suffixes=("_x", "_y"))
            x = x[x[f"{id_col}_x"] != x[f"{id_col}_y"]]
            if x.empty:
                return _empty_containment()
            out = pd.DataFrame({
                "doc_a": x[f"{id_col}_x"].to_numpy(dtype=np.int64),
                "doc_b": x[f"{id_col}_y"].to_numpy(dtype=np.int64),
            })
            out["containment"] = 1.0
            return out

        intra = partitioned_group_map(
            ray.data.from_pandas(multi), ["rep"], intra_body,
            num_partitions)
    return expanded.union(intra)


def _containment_core(
    ds: ray.data.Dataset,
    threshold: float,
    ngram: int,
    id_col: str,
    text_col: str,
    num_partitions: int,
) -> ray.data.Dataset:
    """The overlap-constraint prefix-filter join proper."""
    rows = gram_rows(ds, ngram=ngram, id_col=id_col, text_col=text_col)

    def attach_df(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["df"] = g.groupby("gram", sort=False)["gram"].transform("size")
        return g

    joined = partitioned_group_map(rows, ["gram"], attach_df,
                                   num_partitions=num_partitions)

    # one co-location marks probe-prefix rows IN PLACE (bool column) —
    # the index side is every row, so no tagged union is needed
    def mark_prefix(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "df", "gram"], kind="mergesort")
        k = g.groupby(id_col, sort=False).cumcount().to_numpy()
        sz = g["sz"].to_numpy()
        p = sz - np.ceil(threshold * sz - 1e-9).astype(np.int64) + 1
        out = g[["gram", id_col, "sz"]].copy()
        out["__probe"] = k < p
        return out

    marked = partitioned_group_map(joined, [id_col], mark_prefix,
                                   num_partitions=num_partitions)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        idt = g[id_col].dtype

        def empty() -> pd.DataFrame:
            return pd.DataFrame({
                "doc_a": pd.Series([], dtype=idt),
                "doc_b": pd.Series([], dtype=idt),
            })

        probe = g.loc[g["__probe"], ["gram", id_col, "sz"]]
        if probe.empty:
            return empty()
        m = probe.merge(g[["gram", id_col, "sz"]], on="gram",
                        suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] != m[f"{id_col}_b"]]
        if m.empty:
            return empty()
        # |B| >= ceil(t*|A|), float error on the permissive side
        m = m[m["sz_b"].to_numpy() + 1e-9
              >= threshold * m["sz_a"].to_numpy()]
        if m.empty:
            return empty()
        out = m.rename(columns={f"{id_col}_a": "doc_a",
                                f"{id_col}_b": "doc_b"})
        return out[["doc_a", "doc_b"]].drop_duplicates()

    cands = partitioned_group_map(marked, ["gram"], pairs,
                                  num_partitions=num_partitions)
    return verify_containment(cands, ds, threshold=threshold,
                              n_shingle=ngram, id_col=id_col,
                              text_col=text_col,
                              num_partitions=num_partitions)


def verify_containment(
    candidates: ray.data.Dataset,
    docs: ray.data.Dataset,
    threshold: float,
    n_shingle: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Exact containment verification of DIRECTED candidate pairs —
    same fully-distributed shape as dedup.verify_jaccard (packed
    shingle sets through the two-pass pair-payload join; candidates
    never touch the driver), scored as intersection / |side-a set|."""
    from .dedup import shingle_sets
    from .joins import pair_payload_join

    sigs = shingle_sets(docs, n_shingle=n_shingle, id_col=id_col,
                        text_col=text_col).materialize()

    j2 = pair_payload_join(
        candidates, sigs, key_a="doc_a", key_b="doc_b",
        id_col=id_col, payload_col="sh", num_partitions=num_partitions,
    )

    def score(batch: pa.Table) -> pa.Table:
        sh_a = batch["pay_a"].to_pylist()
        sh_b = batch["pay_b"].to_pylist()
        sims = np.empty(len(batch), dtype=np.float64)
        for i in range(len(batch)):
            a = np.frombuffer(sh_a[i], dtype=np.uint64)
            b = np.frombuffer(sh_b[i], dtype=np.uint64)
            inter = len(np.intersect1d(a, b, assume_unique=True))
            sims[i] = inter / len(a) if len(a) else 0.0
        out = pa.table({
            "doc_a": batch["doc_a"],
            "doc_b": batch["doc_b"],
            "containment": pa.array(sims),
        })
        return out.filter(pc.greater_equal(out["containment"],
                                           threshold))

    return j2.map_batches(score, batch_format="pyarrow")


def _ngram_jaccard_core(
    ds: ray.data.Dataset,
    threshold: float,
    ngram: int,
    id_col: str,
    text_col: str,
    num_partitions: int,
) -> ray.data.Dataset:
    """The AllPairs prefix-filter join proper (docs assumed free of
    identical gram sets when called via the collapse path)."""
    rows = gram_rows(ds, ngram=ngram, id_col=id_col, text_col=text_col)

    # rows are distinct per (doc, gram) and the co-location puts ALL
    # of a gram's rows in one partition, so the per-partition group
    # size IS the global document frequency — no aggregate, no join.
    def attach_df(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["df"] = g.groupby("gram", sort=False)["gram"].transform("size")
        return g

    joined = partitioned_group_map(rows, ["gram"], attach_df,
                                   num_partitions=num_partitions)

    def prefix_body(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "df", "gram"], kind="mergesort")
        k = g.groupby(id_col, sort=False).cumcount().to_numpy()
        sz = g["sz"].to_numpy()
        p = sz - np.ceil(threshold * sz - 1e-9).astype(np.int64) + 1
        return g.loc[k < p, ["gram", id_col, "sz"]]

    pref = partitioned_group_map(joined, [id_col], prefix_body,
                                 num_partitions=num_partitions)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        idt = g[id_col].dtype

        def empty() -> pd.DataFrame:
            return pd.DataFrame({
                "doc_a": pd.Series([], dtype=idt),
                "doc_b": pd.Series([], dtype=idt),
            })

        g = g[g.duplicated(subset=["gram"], keep=False)]
        if g.empty:
            return empty()
        m = g.merge(g, on="gram", suffixes=("_x", "_y"))
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        if m.empty:
            return empty()
        lo = np.minimum(m["sz_x"], m["sz_y"])
        hi = np.maximum(m["sz_x"], m["sz_y"])
        m = m[lo + 1e-9 >= threshold * hi]
        if m.empty:
            return empty()
        out = m.rename(columns={f"{id_col}_x": "doc_a",
                                f"{id_col}_y": "doc_b"})
        return out[["doc_a", "doc_b"]].drop_duplicates()

    cands = partitioned_group_map(pref, ["gram"], pairs,
                                  num_partitions=num_partitions)
    return verify_jaccard(cands, ds, threshold=threshold,
                          n_shingle=ngram, id_col=id_col,
                          text_col=text_col,
                          num_partitions=num_partitions)
