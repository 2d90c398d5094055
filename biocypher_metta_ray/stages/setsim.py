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
2. PREFIX FILTER: order every doc's grams by one global total order
   and keep only the first ``p = s - ceil(t*s) + 1`` (s = set size).
   Lemma: J(a,b) >= t implies the two prefixes share a gram under ANY
   shared total order — so grouping prefix rows by gram yields a
   candidate superset; exactness comes from the verify pass, the
   order only controls candidate COUNT.
3. Candidate pairs per gram group (hash-partitioned co-location),
   with the size-ratio pre-filter ``min(sa,sb) >= t * max(sa,sb)``
   (a necessary condition for J >= t).
4. Exact verify through the existing distributed pair-payload join +
   packed-set Jaccard (stages/dedup.py::verify_jaccard).

Scale note (the hot-gram problem): under a pure hash order a
stop-phrase gram ("of the") lands in ~(1-t) of the prefixes that
contain it, and its candidate group goes O(corpus^2). The classic fix
is ascending-document-frequency order (rare grams first -> hot grams
fall OUT of prefixes). Computing the full df order needs either a
vocab-scale broadcast (not 100 TB-safe) or two extra fact-scale
shuffles, so this implementation takes the bounded middle path:
``demote_top`` approximate heavy-hitter grams (stages/skew.py::
top_frequencies — driver payload bounded by k) are demoted to the END
of the order, hash order elsewhere. The head of the Zipf curve — the
only place group sizes explode — gets the exact-df treatment; the
tail's df is bounded by the k-th frequency. Any total order keeps the
result exact, so this is purely a candidate-count knob.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .dedup import MinHasher, verify_jaccard
from .skew import partitioned_group_map, top_frequencies


def _prefix_len(size: int, threshold: float) -> int:
    """Prefix length s - ceil(t*s) + 1, with the float error pushed in
    the SAFE direction (a too-long prefix only adds candidates; a
    too-short one silently drops true pairs)."""
    return size - int(math.ceil(threshold * size - 1e-9)) + 1


def prefix_rows(
    ds: ray.data.Dataset,
    threshold: float,
    ngram: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    demote: np.ndarray | None = None,
) -> ray.data.Dataset:
    """(gram:int64, doc_id, sz:int64) prefix-token rows per document.

    ``demote``: sorted uint64 gram hashes to order AFTER all others
    (the heavy-hitter demotion described in the module docstring).
    """
    hasher = MinHasher(num_perms=1, num_bands=1, n_shingle=ngram,
                       id_col=id_col, text_col=text_col)
    demote_sorted = np.sort(demote) if demote is not None and len(demote) else None

    def body(batch: pa.Table) -> pd.DataFrame:
        sh, starts = hasher._doc_shingles(batch)
        toks = pc.split_pattern(batch[text_col], " ")
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_gram, out_doc, out_sz = [], [], []
        for d in range(len(batch)):
            if lengths[d] < ngram:
                # no n-gram window exists; the doc has no set
                continue
            u = np.unique(sh[starts[d]:starts[d + 1]])
            s = len(u)
            if s == 0:
                continue
            if demote_sorted is not None:
                hot = np.isin(u, demote_sorted, assume_unique=True)
                u = np.concatenate([u[~hot], u[hot]])
            p = _prefix_len(s, threshold)
            out_gram.append(u[:p])
            out_doc.append(np.full(p, ids[d], dtype=np.int64))
            out_sz.append(np.full(p, s, dtype=np.int64))
        if not out_gram:
            return pd.DataFrame({
                "gram": pd.Series([], dtype="int64"),
                id_col: pd.Series([], dtype=np.asarray(ids).dtype
                                  if len(ids) else "int64"),
                "sz": pd.Series([], dtype="int64"),
            })
        return pd.DataFrame({
            "gram": np.concatenate(out_gram).view(np.int64),
            id_col: np.concatenate(out_doc),
            "sz": np.concatenate(out_sz),
        })

    return ds.map_batches(body, batch_format="pyarrow")


def _gram_stream(
    ds: ray.data.Dataset, ngram: int, id_col: str, text_col: str
) -> ray.data.Dataset:
    """Distinct (doc, gram) stream for the heavy-hitter pre-pass —
    one int64 column, payload-light."""
    hasher = MinHasher(num_perms=1, num_bands=1, n_shingle=ngram,
                       id_col=id_col, text_col=text_col)

    def body(batch: pa.Table) -> pd.DataFrame:
        sh, starts = hasher._doc_shingles(batch)
        toks = pc.split_pattern(batch[text_col], " ")
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        parts = [
            np.unique(sh[starts[d]:starts[d + 1]])
            for d in range(len(batch)) if lengths[d] >= ngram
        ]
        flat = (np.concatenate(parts) if parts
                else np.empty(0, dtype=np.uint64))
        return pd.DataFrame({"gram": flat.view(np.int64)})

    return ds.map_batches(body, batch_format="pyarrow")


def ngram_jaccard_join(
    ds: ray.data.Dataset,
    threshold: float = 0.6,
    ngram: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 16,
    demote_top: int = 64,
) -> ray.data.Dataset:
    """Exact all-pairs n-gram Jaccard join: every unordered pair with
    J(gram-set_a, gram-set_b) >= ``threshold`` plus the exact score.

    Output columns: (doc_a, doc_b, jaccard) with doc_a < doc_b.
    See the module docstring for the algorithm and scale analysis.
    """
    demote = None
    if demote_top and demote_top > 0:
        hot = top_frequencies(_gram_stream(ds, ngram, id_col, text_col),
                              ["gram"], k=demote_top)
        if len(hot):
            demote = hot["gram"].to_numpy().astype(np.int64).view(np.uint64)

    pref = prefix_rows(ds, threshold, ngram=ngram, id_col=id_col,
                       text_col=text_col, demote=demote)

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
