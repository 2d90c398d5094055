"""Lexical retrieval over the corpus: distributed BM25 scoring.

BM25 (Robertson-Spärck Jones, the public Okapi formulation) is the
standard first-stage retriever a training-data pipeline uses for
"find docs about X" slicing and for hard-negative mining. The scale
shape is the broadcast-statistics pattern:

- pass 1 touches only STATISTICS: corpus size + total length (two
  scalars) and document frequencies for the QUERY terms only (|q|
  counts, not the vocabulary) — per-batch partials, summed on the
  driver, KBs total;
- pass 2 scores every doc vectorized against the broadcast term
  table (token codes + segment bincount, the same kernel shape as
  cleaning.gopher_stats) and keeps a per-block partial top-k; the
  driver merges k rows per block (relational.top_k contract — the
  corpus itself never shuffles and never materializes).

Scoring is deterministic: ties broken by (rounded score desc,
doc_id asc), the same order the SQL oracle states.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _token_matrix(
    batch: pa.Table, terms: list[str], text_col: str
) -> tuple[np.ndarray, np.ndarray]:
    """(tf, dl): per-doc term-frequency matrix for ``terms``
    (D × T int64) and per-doc token counts, fully vectorized."""
    toks = pc.split_pattern(batch[text_col], " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    dl = lengths.astype(np.int64)
    flat = toks.flatten()
    code = pc.index_in(flat, pa.array(terms)).to_numpy(
        zero_copy_only=False
    )
    didx = np.repeat(np.arange(len(batch), dtype=np.int64), dl)
    hit = ~np.isnan(code) if code.dtype.kind == "f" else code >= 0
    code = np.nan_to_num(code, nan=0).astype(np.int64)
    T = len(terms)
    tf = np.zeros(len(batch) * T, dtype=np.int64)
    key = didx[hit] * T + code[hit]
    np.add.at(tf, key, 1)
    return tf.reshape(len(batch), T), dl


def bm25_topk(
    ds: ray.data.Dataset,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Top-``k`` docs by BM25 for a bag of query ``terms``:
    idf = ln(1 + (N - df + 0.5) / (df + 0.5)) (Robertson),
    tf-part = tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl)). Returns
    (id, score) with score rounded to 6 (the rounded value is also
    the sort key, so ordering is reproducible across float noise)."""

    def stat_partial(batch: pa.Table) -> pd.DataFrame:
        tf, dl = _token_matrix(batch, terms, text_col)
        row = {"__n": np.int64(len(dl)), "__len": dl.sum()}
        for t in range(len(terms)):
            row[f"__df{t}"] = np.int64((tf[:, t] > 0).sum())
        return pd.DataFrame([row])

    stats = (
        ds.map_batches(stat_partial, batch_format="pyarrow")
        .to_pandas()
        .sum()
    )
    n = float(stats["__n"])
    avgdl = float(stats["__len"]) / n
    idf = np.array(
        [
            np.log(
                1.0
                + (n - float(stats[f"__df{t}"]) + 0.5)
                / (float(stats[f"__df{t}"]) + 0.5)
            )
            for t in range(len(terms))
        ]
    )
    idf_ref = ray.put(idf)

    def score(batch: pa.Table) -> pd.DataFrame:
        w = ray.get(idf_ref)
        tf, dl = _token_matrix(batch, terms, text_col)
        denom = tf + k1 * (1.0 - b + b * dl[:, None] / avgdl)
        s = ((tf * (k1 + 1.0) / denom) * w[None, :]).sum(axis=1)
        out = pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(zero_copy_only=False),
                "score": np.round(s, 6),
            }
        )
        out = out[out["score"] > 0]
        return out.sort_values(
            ["score", id_col], ascending=[False, True]
        ).head(k)

    parts = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return (
        parts.sort_values(["score", id_col], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def inverted_index(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Posting-list construction — ``(token, postings, df)`` with
    ``postings`` = comma-joined ascending doc ids: the inverted index
    a lexical retriever materializes once per corpus snapshot (the
    offline sibling of the per-query BM25 pass above).

    Scale shape: per-doc DISTINCT (token, doc) pairs are exact within
    the batch (token codes + per-doc segment unique — the
    text_stats.token_doc_freq kernel, zero Python in the token loop);
    the pairs then make one token-keyed co-location whose body
    string-aggregates each token's sorted ids. One shuffle of
    (token, id) pairs — the corpus text never moves. A hot
    (stopword) posting list must fit a worker, the same contract as
    any per-group collect; production layouts shard the heaviest
    lists by doc-range partitioning of this same pair table.
    """
    from .skew import partitioned_group_map

    def pairs(batch: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(batch[text_col], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        uniq = pc.unique(flat)
        codes = pc.index_in(flat, uniq).to_numpy(zero_copy_only=False)
        didx = np.repeat(np.arange(len(batch), dtype=np.int64), lengths)
        pair = np.unique(didx * np.int64(len(uniq)) + codes)
        doc_pos = pair // np.int64(len(uniq))
        code_ids = pair % np.int64(len(uniq))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pd.DataFrame(
            {"token": uniq.take(pa.array(code_ids)).to_pylist(),
             id_col: ids[doc_pos]}
        )

    pair_ds = ds.map_batches(pairs, batch_format="pyarrow")

    def body(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["token", id_col], kind="mergesort")
        grp = g.groupby("token", sort=False)[id_col]
        out = (
            grp.agg(lambda s: ",".join(s.astype(str)))
            .reset_index().rename(columns={id_col: "postings"})
        )
        out["df"] = grp.size().to_numpy().astype(np.int64)
        if min_df > 1:
            out = out[out["df"] >= min_df]
        return out

    return partitioned_group_map(pair_ds, ["token"], body, num_partitions)


def rrf_fuse(
    rankings: list[pd.DataFrame],
    k_rrf: int = 60,
    topk: int = 10,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> pd.DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of
    bounded retrieval result lists — the standard hybrid-retrieval
    combiner (lexical BM25 + dense, or multi-query expansion fusion):
    ``rrf(doc) = sum_i 1 / (k_rrf + rank_i(doc))`` over the lists the
    doc appears in; absent lists contribute 0. Rank is the 1-based
    position under (score desc, id asc) — each input's score column is
    already rounded (bm25_topk's contract), so the ordering and
    therefore the fused value are reproducible across float noise.

    Scale shape: every input frame is a BOUNDED top-k result (the
    distributed work lives in the passes that produced them —
    bm25_topk's stat+score passes, knn's per-block partial top-k), so
    fusion is driver-scale by construction: lists x k rows, one
    concat + groupby sum. Returns (id, rrf) rounded 6, top ``topk`` by
    (rrf desc, id asc).
    """
    frames = []
    for f in rankings:
        f = f.sort_values(
            [score_col, id_col], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        frames.append(
            pd.DataFrame(
                {
                    id_col: f[id_col],
                    "__c": 1.0
                    / (k_rrf + np.arange(1, len(f) + 1, dtype=np.float64)),
                }
            )
        )
    allc = pd.concat(frames, ignore_index=True)
    out = allc.groupby(id_col, sort=False)["__c"].sum().reset_index(name="rrf")
    out["rrf"] = out["rrf"].round(6)
    return (
        out.sort_values(["rrf", id_col], ascending=[False, True],
                        kind="mergesort")
        .head(topk)
        .reset_index(drop=True)
    )
