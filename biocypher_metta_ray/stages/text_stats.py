"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.

Training-data-pipeline operators over document tables. Every kernel is
deterministic and (where an oracle entry exists) expressible in ANSI
SQL so the DuckDB side can verify it bit-for-bit — keep the Python and
SQL definitions in lockstep (see __ray_entry__.oracle_sql).

Vectorization: pandas string ops / pyarrow compute; the stopword sets
and compiled regexes are module constants (built once per process).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.helpers import hash64_column

# Stopword lists used by the n-gram-free language heuristic. Kept tiny
# and mirrored literally in the oracle SQL.
STOPWORDS = {
    "en": ("the", "a", "and", "of", "to"),
    "de": ("der", "die", "und", "das", "ein"),
    "fr": ("le", "la", "et", "les", "des"),
}


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count per row (split on single spaces — matches
    SQL ``len(string_split(text, ' '))``)."""
    toks = pc.split_pattern(batch[text_col], " ")
    n = pc.list_value_length(toks).cast(pa.int64())
    return pa.table({"doc_id": batch["doc_id"], "n_tokens": n})


SUBWORD_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def subword_token_count_batch(
    batch: pa.Table, text_col: str = "text"
) -> pa.Table:
    """BPE-ish subword token count: alphabetic runs, single digits and
    single punctuation marks each count as one token (the standard
    pre-tokenization shape GPT-2-family BPEs apply before merges —
    digits split, punctuation split from words). Vectorized via
    Arrow's regex count; used for training-data length budgeting where
    whitespace counts undercount code/punctuation-heavy text."""
    n = pc.count_substring_regex(batch[text_col], SUBWORD_PATTERN).cast(
        pa.int64()
    )
    return pa.table({"doc_id": batch["doc_id"], "n_subword_tokens": n})


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality heuristics per document:

    - n_chars: length(text)
    - n_tokens: count of space-separated tokens
    - mean_token_len: (n_chars - (n_tokens-1)) / n_tokens
    - stop_ratio: fraction of tokens in the English stopword list
    """
    text = batch[text_col]
    n_chars = pc.utf8_length(text).cast(pa.int64())
    toks = pc.split_pattern(text, " ")
    n_tokens = pc.list_value_length(toks).cast(pa.int64())
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), lengths)
    stop_mask = pc.is_in(
        flat, value_set=pa.array(list(STOPWORDS["en"]))
    ).to_numpy(zero_copy_only=False)
    stop_counts = np.bincount(
        doc_idx[stop_mask], minlength=len(batch)
    ).astype(np.float64)
    nt = n_tokens.to_numpy(zero_copy_only=False).astype(np.float64)
    nc = n_chars.to_numpy(zero_copy_only=False).astype(np.float64)
    stop_ratio = np.where(nt > 0, stop_counts / nt, 0.0)
    mean_token_len = np.where(nt > 0, (nc - (nt - 1)) / nt, 0.0)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "mean_token_len": pa.array(np.round(mean_token_len, 6)),
            "stop_ratio": pa.array(np.round(stop_ratio, 6)),
        }
    )


def lang_id_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic language ID: argmax of per-language stopword hit counts;
    ``und`` when no stopword list fires. Deterministic tie-break by
    language code order (de < en < fr)."""
    toks = pc.split_pattern(batch[text_col], " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), lengths)
    langs = sorted(STOPWORDS)
    counts = np.zeros((len(batch), len(langs)), dtype=np.int64)
    for j, lg in enumerate(langs):
        m = pc.is_in(flat, value_set=pa.array(list(STOPWORDS[lg]))).to_numpy(
            zero_copy_only=False
        )
        counts[:, j] = np.bincount(doc_idx[m], minlength=len(batch))
    best = counts.argmax(axis=1)
    none = counts.max(axis=1) == 0
    pred = np.array(langs, dtype=object)[best]
    pred[none] = "und"
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "pred_lang": pa.array(list(pred), pa.string()),
        }
    )


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Document fingerprint: md5-derived 64-bit hash of the
    whitespace-normalized lowercased text (SQL mirror:
    ``md5(lower(regexp_replace(text,'\\s+',' ','g')))`` — we emit the
    full md5 hex so the oracle compares strings, not truncations)."""
    import hashlib
    import re

    texts = batch[text_col].to_pylist()
    norm = [re.sub(r"\s+", " ", t.lower()).strip() for t in texts]
    digests = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in norm]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fingerprint": pa.array(digests, pa.string()),
        }
    )


def char_entropy_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Per-document Shannon entropy (nats) of the character
    distribution — the gibberish/boilerplate quality signal beside
    ``quality_score_batch`` (low entropy = repetitive filler or
    encoding junk, near-uniform = random noise; CCNet-class corpora
    filter both tails). Zero-decode: the Arrow UTF-8 data buffer is
    viewed as uint8 and every row's 256-bin byte histogram comes from
    ONE ``np.bincount`` over ``(row_index << 8) | byte`` keys — no
    Python strings in the hot path. ASCII contract (same statement as
    lm.char_pair_counts): bytes equal characters on an ASCII corpus,
    which is what the SQL oracle counts; on multi-byte UTF-8 this is
    byte-level entropy (still a valid quality signal, just not the
    oracle's definition). entropy = -sum p*ln(p), rounded 6; written
    as ``0.0 - sum`` on BOTH sides so an all-one-char doc yields +0.0,
    never IEEE -0.0 (value-hash parity)."""
    arr = batch[text_col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], dtype=np.int32)[
        arr.offset: arr.offset + len(arr) + 1
    ]
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    lo = int(off[0])
    buf = data[lo:int(off[-1])].astype(np.int64)
    n = len(arr)
    lens = np.diff(off).astype(np.int64)
    row = np.repeat(np.arange(n, dtype=np.int64), lens)
    counts = np.bincount((row << 8) | buf, minlength=n << 8).reshape(n, 256)
    p = counts / np.maximum(lens, 1)[:, None]
    with np.errstate(divide="ignore", invalid="ignore"):
        term = np.where(counts > 0, p * np.log(p), 0.0)
    ent = np.where(lens > 0, 0.0 - term.sum(axis=1), 0.0)
    return pa.table(
        {
            id_col: batch[id_col],
            "entropy": pa.array(np.round(ent, 6), type=pa.float64()),
        }
    )


def token_doc_freq(
    ds, text_col: str = "text", min_df: int = 1
):
    """Corpus-level document-frequency table: (token, df, idf) — the
    shared statistic behind TF-IDF rerankers (the linker keeps a
    per-entity-profile IDF in stages/linker.py:74; this is the
    corpus-wide counterpart an offline reranker or BM25 index builds
    from). idf = ln((1 + N) / (1 + df)) + 1 (the smoothed sklearn
    form, stated here because the oracle recomputes it literally).

    Scale shape: a doc is one row, so per-doc DISTINCT tokens are
    exact within the batch (token codes + per-doc segment unique — no
    global distinct pass); per-batch partial df counts then ONE small
    merge over the vocabulary via relational.grouped_agg — size-
    adaptive: a vocab-scale partial table finishes driver-side, a
    huge vocabulary goes through the coalesced shuffle. (The first
    cut used the native ``groupby().aggregate(Sum)`` here: fine at 8
    bench blocks, but at a 40M-doc / 2560-block rehearsal the sort
    aggregate ground through 2560 x vocab tiny partial rows for
    20+ minutes — the same many-small-blocks fixed-cost cliff the
    HLL tree merge fixed in round 3.) The corpus never shuffles;
    the vocab partials do (bounded by vocab size, not corpus size).

    NOTE: ``ds.count()`` (for idf's N) plus the partial pass execute
    the input lineage twice — pass a materialized or parquet-backed
    dataset when the upstream chain is expensive (e.g. html text
    extraction), as the bench rehearsal does.
    """
    import pandas as pd
    import ray.data  # noqa: F401  (ds is a ray.data.Dataset)

    from .relational import grouped_agg

    n_docs = ds.count()

    def partial(batch: pa.Table) -> "pd.DataFrame":
        toks = pc.split_pattern(batch[text_col], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        uniq = pc.unique(flat)
        codes = pc.index_in(flat, uniq).to_numpy(zero_copy_only=False)
        didx = np.repeat(
            np.arange(len(batch), dtype=np.int64), lengths
        )
        pair = np.unique(didx * np.int64(len(uniq)) + codes)
        code_per_doc = pair % np.int64(len(uniq))
        code_ids, counts = np.unique(code_per_doc, return_counts=True)
        return pd.DataFrame(
            {
                "token": uniq.take(pa.array(code_ids)).to_pylist(),
                "df": counts.astype(np.int64),
            }
        )

    out = grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["token"], sums=["df"],
    )

    def finish(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df[df["df"] >= min_df].copy()
        df["idf"] = np.round(
            np.log((1.0 + n_docs) / (1.0 + df["df"].to_numpy())) + 1.0, 6
        )
        return df

    return out.map_batches(finish, batch_format="pandas")


def chunk_docs_batch(
    batch: pa.Table,
    chunk_words: int,
    overlap: int,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """RAG-style chunking: windows of ``chunk_words`` words starting
    every ``chunk_words - overlap`` words (the last window may be
    shorter; a window is emitted only if it starts inside the doc).
    Per-doc and stateless — embarrassingly parallel."""
    import pandas as pd

    step = chunk_words - overlap
    if step <= 0:
        raise ValueError("overlap must be < chunk_words")
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    out_ids, out_nos, out_txt = [], [], []
    for did, text in zip(ids, batch[text_col].to_pylist()):
        ws = text.split(" ")
        for no, start in enumerate(range(0, len(ws), step)):
            out_ids.append(did)
            out_nos.append(no)
            out_txt.append(" ".join(ws[start : start + chunk_words]))
    return pd.DataFrame(
        {
            id_col: np.array(out_ids, dtype=ids.dtype),
            "chunk_no": np.array(out_nos, dtype=np.int64),
            "chunk": out_txt,
        }
    )


def chunk_docs(
    ds,
    chunk_words: int = 128,
    overlap: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    return ds.map_batches(
        lambda b: chunk_docs_batch(
            b, chunk_words, overlap, id_col=id_col, text_col=text_col
        ),
        batch_format="pyarrow",
    )


def hash_embed_batch(
    batch: pa.Table,
    dims: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "fh",
) -> "pd.DataFrame":
    """Feature-hashing document vectors (the hashing trick, Weinberger
    et al. 2009): each token lands in dimension ``hash64 % dims`` with
    sign from the hash's top bit; the vector entry is the signed token
    count. Model-free embeddings that bridge the text table into the
    kNN/ANN family without a trained encoder, at exactly one streaming
    pass and zero shuffle.

    Emitted EXPLODED as ``(id, dim, weight)`` rows (zero entries
    omitted) rather than a list column: at 100 TB a sparse triplet
    stream feeds downstream joins/aggregations without materializing
    dense vectors, and every row is recomputable in the SQL oracle
    (same md5 nibble reassembly as hash_split/hll)."""
    import pandas as pd

    toks = pc.split_pattern(pc.utf8_lower(batch[text_col]), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    lengths = lengths.astype(np.int64)
    # dictionary-encode so only the VOCAB is materialized as Python
    # strings and md5-hashed; occurrences stay int32 codes (the
    # selection.py lesson: 4.9x at 40M docs)
    enc = pc.dictionary_encode(toks.flatten())
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    hv = hash64_column([f"{salt}:{t}" for t in enc.dictionary.to_pylist()])
    h = hv[codes]
    dim = (h % np.uint64(dims)).astype(np.int64)
    sign = np.where((h >> np.uint64(63)) > 0, 1, -1).astype(np.int64)
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    didx = np.repeat(np.arange(len(ids), dtype=np.int64), lengths)
    df = pd.DataFrame(
        {id_col: ids[didx], "dim": dim, "weight": sign}
    )
    out = (
        df.groupby([id_col, "dim"], sort=False)["weight"]
        .sum()
        .reset_index()
    )
    return out[out["weight"] != 0].reset_index(drop=True)


def hash_embed(
    ds,
    dims: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "fh",
):
    return ds.map_batches(
        lambda b: hash_embed_batch(
            b, dims, id_col=id_col, text_col=text_col, salt=salt
        ),
        batch_format="pyarrow",
    )


def tfidf_top_terms(
    ds,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
):
    """Per-document top-``k`` terms by TF-IDF — the keyword/reranker
    feature pass built on :func:`token_doc_freq`'s corpus statistic.
    ``idf = ln((1 + N) / (1 + df)) + 1`` (the same smoothed sklearn
    form, UNROUNDED here since it feeds a product), ``score =
    round(tf * idf, 6)``, ties break token-ascending (stated so the
    SQL oracle ranks identically).

    Scale shape: the df table is VOCAB-scale and broadcasts once via
    ``ray.put``; scoring is one streaming pass — per-doc term counts
    are exact within a batch (a doc is one row), the idf lookup is a
    vectorized map, and only k rows per doc leave the task. Two corpus
    passes total (df + score), zero corpus shuffles.

    Returns ``(id_col, token, score)``.
    """
    import pandas as pd
    import ray

    n_docs = ds.count()
    dfp = token_doc_freq(ds, text_col=text_col, min_df=min_df).to_pandas()
    idf = (
        np.log((1.0 + n_docs) / (1.0 + dfp["df"].to_numpy(np.float64)))
        + 1.0
    )
    lut_ref = ray.put(dict(zip(dfp["token"], idf)))

    def score(batch: pa.Table) -> "pd.DataFrame":
        lut = ray.get(lut_ref)
        toks = pc.split_pattern(batch[text_col], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lengths = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat = toks.flatten()
        uniq = pc.unique(flat)
        v = np.int64(len(uniq))
        if not v:
            return pd.DataFrame(
                {id_col: pd.Series([], dtype="int64"),
                 "token": pd.Series([], dtype=object),
                 "score": pd.Series([], dtype="float64")}
            )
        codes = pc.index_in(flat, uniq).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        didx = np.repeat(np.arange(len(batch), dtype=np.int64), lengths)
        ukey, counts = np.unique(didx * v + codes, return_counts=True)
        uv = uniq.to_pandas().to_numpy()
        tokens = uv[ukey % v]
        ids = batch[id_col].to_numpy(zero_copy_only=False)[ukey // v]
        idfv = pd.Series(tokens).map(lut).to_numpy(np.float64)
        sc = np.round(counts.astype(np.float64) * idfv, 6)
        out = pd.DataFrame(
            {id_col: ids.astype(np.int64), "token": tokens, "score": sc}
        )
        out = out.sort_values(
            [id_col, "score", "token"],
            ascending=[True, False, True], kind="mergesort",
        )
        return out.groupby(id_col, sort=False).head(k).reset_index(drop=True)

    return ds.map_batches(score, batch_format="pyarrow")


def build_vocab(ds, text_col: str = "text", k: int = 1000):
    """Tokenizer vocabulary build: the top-``k`` tokens of
    ``lower(text)`` split on single spaces, by (count DESC, token ASC),
    with contiguous ids 0..k-1 in that order — the word-level analogue
    of a BPE vocab (stages/lm.py::char_pair_counts is the subword
    half).

    Scale shape: each batch collapses to ITS OWN distinct-token counts
    via ``pc.value_counts`` before anything shuffles (vocab-scale rows
    per batch, never the token stream); partials merge through
    grouped_agg's map-side-combined sum; the global top-k is a
    per-block partial top-k + driver merge over k rows per block; id
    assignment is a driver-side sort of exactly k rows.

    Returns a k-row pandas DataFrame (token, token_id, cnt).
    """
    import pandas as pd

    from .relational import grouped_agg, top_k

    def partial(t: pa.Table) -> "pd.DataFrame":
        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.split_pattern(pc.utf8_lower(col), " ").flatten()
        vc = pc.value_counts(flat)
        return pd.DataFrame(
            {"token": vc.field("values").to_numpy(
                zero_copy_only=False),
             "cnt": vc.field("counts").to_numpy(
                 zero_copy_only=False).astype("int64")})

    partials = ds.select_columns([text_col]).map_batches(
        partial, batch_format="pyarrow")
    summed = grouped_agg(partials, ["token"], sums=["cnt"])
    top = top_k(summed, k, by=["cnt", "token"],
                ascending=[False, True])
    top = top.sort_values(["cnt", "token"],
                          ascending=[False, True]).reset_index(drop=True)
    top["token_id"] = top.index.astype("int64")
    return top[["token", "token_id", "cnt"]].astype(
        {"token": str, "token_id": "int64", "cnt": "int64"})


def encode_docs(
    ds,
    vocab,
    text_col: str = "text",
    id_col: str = "doc_id",
    unk_id: int = -1,
):
    """Tokenizer APPLY — the encode step of LM data prep: explode
    ``lower(text)`` on single spaces into ``(doc_id, pos, token_id)``
    rows, OOV tokens mapped to ``unk_id``. The k-row vocab (from
    :func:`build_vocab`) ships once in the task closure; per batch the
    encoding is pure Arrow dictionary arithmetic (``pc.index_in``
    against the vocab token array + one fancy-index into the id
    vector — token strings never enter Python). Streaming, zero
    shuffle; output is token-stream scale by definition.
    """
    import pandas as pd

    tokens = pa.array(list(vocab["token"]), pa.string())
    ids = np.asarray(vocab["token_id"], dtype=np.int64)

    def enc(t: pa.Table) -> pd.DataFrame:
        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern(pc.utf8_lower(col), " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        idx = pc.index_in(flat, value_set=tokens)
        valid = pc.is_valid(idx).to_numpy(zero_copy_only=False)
        pos_in_vocab = idx.fill_null(0).to_numpy(zero_copy_only=False)
        tid = np.where(valid, ids[pos_in_vocab], np.int64(unk_id))
        did = np.repeat(
            t[id_col].to_numpy(zero_copy_only=False), lens
        )
        first = np.concatenate(([0], np.cumsum(lens)[:-1]))
        pos = np.arange(tid.size, dtype=np.int64) - np.repeat(
            first, lens
        )
        return pd.DataFrame(
            {id_col: did, "pos": pos, "token_id": tid.astype("int64")}
        )

    return ds.map_batches(enc, batch_format="pyarrow")


def tokenizer_fertility(
    ds, group_col: str = "lang", text_col: str = "text"
):
    """Per-group tokenizer fertility — subword tokens per whitespace
    word (the multilingual-tokenizer equity metric: scripts a BPE
    over-fragments show fertility ≫ 1, driving per-language compute
    cost). One grouped_agg over two per-batch integer partials; the
    division is explicit float64 at group scale.
    """
    import pandas as pd

    from .relational import grouped_agg

    def partial(batch: pa.Table) -> pa.Table:
        n_sub = pc.count_substring_regex(
            batch[text_col], SUBWORD_PATTERN).cast(pa.int64())
        n_words = pc.list_value_length(
            pc.split_pattern(batch[text_col], " ")).cast(pa.int64())
        return pa.table({
            group_col: batch[group_col],
            "n_subwords": n_sub,
            "n_words": n_words,
        })

    agg = grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_col], sums=["n_subwords", "n_words"],
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["n_subwords"] = df["n_subwords"].astype("int64")
        df["n_words"] = df["n_words"].astype("int64")
        df["fertility"] = (
            df["n_subwords"].astype("float64")
            / df["n_words"].astype("float64")
        )
        return df

    return agg.map_batches(finish, batch_format="pandas")
