"""Data-selection scoring for LM training corpora.

DSIR-style importance weights (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling"): represent every document
by hashed unigram features, fit target vs raw bucket distributions,
and score each document by the log importance ratio
``Σ_tok ln(p_target(b(tok)) / p_raw(b(tok)))``. Downstream,
:func:`..relational.weighted_sample` (Efraimidis-Spirakis) turns the
weights into the actual resampled corpus — this stage produces the
per-document log-weights.

Scale shape (the lm_score contract): ONE vocab-free count pass trains
the two distributions — each batch collapses to at most
``num_buckets`` partial rows, grouped_agg map-side-combines them and
the ≤256-row bucket table finishes driver-side; the log-ratio table
is closure-broadcast and the corpus STREAMS through the scoring pass.
No fact-scale shuffle anywhere; the input Dataset is traversed twice
(count + score), so pass a checkpointed/cheap-to-recompute dataset —
never a long lazy chain (the _oriented_graph materialize-once lesson,
BASELINE.md §6).

Hashing is the repo-standard md5-64 (functions/helpers.py:
hash64_column), salted — with ``num_buckets=256`` the bucket is
exactly the 8th md5 byte, which the SQL oracle recomputes nibble-wise
(the hash_split/hll pattern).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.helpers import hash64_column
from .relational import grouped_agg


def _token_buckets(
    texts: pa.ChunkedArray | pa.Array, num_buckets: int, salt: str
) -> tuple[np.ndarray, np.ndarray]:
    """(bucket per token, tokens per row) for a lowercased
    space-tokenization; distinct tokens hashed once per batch."""
    toks = pc.split_pattern(pc.utf8_lower(texts), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    lengths = lengths.astype(np.int64)
    # dictionary-encode the flat token stream (C speed) so only the
    # VOCAB is ever materialized as Python strings and md5-hashed —
    # token occurrences stay int32 codes (the skipgram_pairs trick;
    # measured 4.9x at 40M docs vs hashing per occurrence)
    enc = pc.dictionary_encode(toks.flatten())
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    vocab = enc.dictionary.to_pylist()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    h = hash64_column([f"{salt}:{t}" for t in vocab])
    buckets = (h % np.uint64(num_buckets)).astype(np.int64)[codes]
    return buckets, lengths


def dsir_weights(
    ds: ray.data.Dataset,
    target_col: str = "is_target",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 256,
    smoothing: float = 1.0,
    salt: str = "dsir",
) -> ray.data.Dataset:
    """Per-document DSIR log importance weight.

    ``target_col`` is a boolean column marking the target (quality)
    corpus; the remaining rows are the raw distribution. Returns
    ``(id_col, n_tokens, dsir_logweight)`` for EVERY document, target
    rows included (callers filter/resample as they see fit).
    Laplace-``smoothing`` keeps buckets unseen on one side finite.
    """

    def count_partial(batch: pa.Table) -> pd.DataFrame:
        buckets, lengths = _token_buckets(
            batch[text_col], num_buckets, salt
        )
        is_t = np.repeat(
            batch[target_col].to_numpy(zero_copy_only=False), lengths
        )
        n_t = np.bincount(buckets[is_t], minlength=num_buckets)
        n_r = np.bincount(buckets[~is_t], minlength=num_buckets)
        keep = (n_t > 0) | (n_r > 0)
        return pd.DataFrame(
            {
                "bucket": np.arange(num_buckets, dtype=np.int64)[keep],
                "n_target": n_t[keep].astype(np.int64),
                "n_raw": n_r[keep].astype(np.int64),
            }
        )

    partials = ds.map_batches(count_partial, batch_format="pyarrow")
    table = grouped_agg(
        partials, ["bucket"], sums=["n_target", "n_raw"]
    ).to_pandas()  # bounded: <= num_buckets rows
    n_t = np.zeros(num_buckets, dtype=np.float64)
    n_r = np.zeros(num_buckets, dtype=np.float64)
    n_t[table["bucket"].to_numpy()] = table["n_target"].to_numpy()
    n_r[table["bucket"].to_numpy()] = table["n_raw"].to_numpy()
    tot_t, tot_r = n_t.sum(), n_r.sum()
    log_ratio = np.log(
        (n_t + smoothing) / (tot_t + smoothing * num_buckets)
    ) - np.log((n_r + smoothing) / (tot_r + smoothing * num_buckets))

    def score(batch: pa.Table) -> pd.DataFrame:
        if batch.num_rows == 0:
            return pd.DataFrame(
                {
                    id_col: pd.Series(dtype="int64"),
                    "n_tokens": pd.Series(dtype="int64"),
                    "dsir_logweight": pd.Series(dtype="float64"),
                }
            )
        buckets, lengths = _token_buckets(
            batch[text_col], num_buckets, salt
        )
        per_tok = log_ratio[buckets]
        ends = np.cumsum(lengths)
        starts = ends - lengths
        sums = np.add.reduceat(
            np.concatenate([per_tok, [0.0]]), np.minimum(starts, len(per_tok))
        )[: len(lengths)]
        sums = np.where(lengths > 0, sums, 0.0)
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(zero_copy_only=False),
                "n_tokens": lengths,
                "dsir_logweight": sums,
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def dsir_resample(
    ds: ray.data.Dataset,
    k: int,
    target_col: str = "is_target",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 256,
    smoothing: float = 1.0,
    salt: str = "dsirs",
) -> pd.DataFrame:
    """The full DSIR loop: importance-resample ``k`` documents
    proportionally to their importance weight, WITHOUT replacement and
    deterministically — Gumbel-top-k (Vieira 2014; Kool et al. 2019):
    priority ``logweight + (-ln(-ln u))`` with ``u`` the stable
    hash-derived uniform of :func:`..relational.weighted_sample`'s
    grid, global top-``k`` priorities win, ties break by id. Working
    on the LOG scale keeps the arithmetic bounded (no ``exp``
    amplification), so the 6-decimal rounding contract the oracle
    relies on is safe. Returns the k sampled rows as pandas
    (driver-scale), ``(id_col, pri)``.
    """
    from ..functions.helpers import hash64_column
    from .relational import top_k

    scored = dsir_weights(
        ds, target_col=target_col, id_col=id_col, text_col=text_col,
        num_buckets=num_buckets, smoothing=smoothing,
    )

    def pri(batch: pd.DataFrame) -> pd.DataFrame:
        keys = [f"{salt}:{v}" for v in batch[id_col].tolist()]
        bucket = (hash64_column(pa.array(keys, pa.string()))
                  % np.uint64(10_000)).astype(np.float64)
        u = (bucket + 0.5) / 10_000.0
        g = -np.log(-np.log(u))
        out = batch[[id_col]].copy()
        out["pri"] = np.round(
            batch["dsir_logweight"].to_numpy(dtype=np.float64) + g, 6)
        return out

    return top_k(scored.map_batches(pri, batch_format="pandas"), k,
                 by=["pri", id_col], ascending=[False, True])
