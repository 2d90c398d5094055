"""Statistical language-model scoring over the corpus (the CCNet /
Wenzek-et-al perplexity-filter shape: train a cheap n-gram LM, score
every document, filter/bucket on the score). The container has no
KenLM, so the model is a self-trained add-alpha bigram LM — the
plumbing (two-pass broadcast-model scoring) is the real deliverable
and is identical for a real LM.

Scale shape:

- pass 1 (train) touches only COUNTS: per-batch bigram partials,
  one bounded hash-partitioned sum keyed on the context word (so a
  single partition body finalizes both the bigram counts and their
  context totals — one shuffle, vocab-scale rows, never doc rows);
  bigrams below ``min_count`` are pruned there, BEFORE anything
  reaches the driver, which is what keeps the broadcast model
  dimension-scale at corpus scale (pruned mass stays in the
  denominator via the unpruned context totals);
- pass 2 (score) broadcasts the model once (``ray.put``) and scores
  each batch with two vectorized pandas hash merges — the corpus
  streams, nothing shuffles.

Model convention (stated so the SQL oracle can reproduce it
bit-for-bit): tokens = ``lower(text)`` split on single spaces;
context count c(w1) = number of bigrams starting with w1; vocabulary
V = number of distinct contexts; P(w2|w1) = (c(w1,w2)_pruned + a) /
(c(w1) + a·V); score = mean over a doc's bigrams of ln P. Documents
with fewer than two tokens have no bigrams and are omitted.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .skew import partitioned_group_map


def _doc_bigrams(
    batch: pa.Table, text_col: str
) -> tuple[np.ndarray, np.ndarray, np.ndarray, pa.Array]:
    """(doc_index, code1, code2, vocab) arrays for every bigram in the
    batch, fully vectorized (split + positional shift, no per-row
    loop). Tokens are dictionary-encoded in Arrow (``pc.unique`` +
    ``pc.index_in``) so bigrams are int64 CODE pairs; token strings
    only cross into Python at VOCAB scale — callers decode their
    (distinct-pair-scale) results via ``vocab.take`` / fancy-indexing,
    never the token stream (the stages/text_stats.py::token_doc_freq
    pattern)."""
    toks = pc.split_pattern(pc.utf8_lower(batch[text_col]), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    lengths = lengths.astype(np.int64)
    flat = toks.flatten()
    uniq = pc.unique(flat)
    codes = pc.index_in(flat, uniq).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    didx = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
    first = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    pos = np.arange(codes.size, dtype=np.int64) - np.repeat(first, lengths)
    mask = pos < lengths[didx] - 1
    i = np.flatnonzero(mask)
    return didx[i], codes[i], codes[i + 1], uniq


def _decode_pairs(
    c1: np.ndarray, c2: np.ndarray, uniq: pa.Array
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Collapse code pairs to their distinct set and decode ONLY the
    distinct pairs to strings. Returns ``(w1, w2, counts, inverse)``
    — the inverse map reconstructs per-occurrence values from
    per-distinct-pair ones."""
    v = np.int64(len(uniq))
    key = c1 * v + c2
    upair, inv, counts = np.unique(
        key, return_inverse=True, return_counts=True
    )
    uv = uniq.to_pandas().to_numpy()
    return uv[upair // v], uv[upair % v], counts.astype(np.int64), inv


def train_bigram_lm(
    ds: ray.data.Dataset,
    text_col: str = "text",
    min_count: int = 2,
    num_partitions: int = 16,
) -> dict:
    """One-shuffle bigram LM: returns ``{"bigrams": DataFrame(w1, w2,
    bc), "contexts": DataFrame(w1, uc), "vocab": int}`` with bigram
    rows pruned to ``count >= min_count`` and context totals unpruned."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        _, c1, c2, uniq = _doc_bigrams(batch, text_col)
        if not len(c1):
            return pd.DataFrame(
                {"w1": pd.Series([], dtype=object),
                 "w2": pd.Series([], dtype=object),
                 "c": pd.Series([], dtype="int64")}
            )
        w1, w2, counts, _ = _decode_pairs(c1, c2, uniq)
        return pd.DataFrame({"w1": w1, "w2": w2, "c": counts})

    # partition on the CONTEXT word: every (w1, *) row co-locates, so
    # one body emits final bigram counts, prunes, and attaches the
    # unpruned context total — marker rows with w2=None carry the
    # per-context totals out of the same pass
    def final(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["w1", "w2"], sort=False)["c"].sum().reset_index()
        uni = s.groupby("w1", sort=False)["c"].sum().reset_index()
        pruned = s[s["c"] >= min_count]
        uni = uni.assign(w2=None)
        return pd.concat([pruned, uni], ignore_index=True)[["w1", "w2", "c"]]

    rows = partitioned_group_map(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["w1"], final, num_partitions, coalesce=2 * num_partitions,
    ).to_pandas()
    ctx = rows[rows["w2"].isna()][["w1", "c"]].rename(columns={"c": "uc"})
    big = rows[rows["w2"].notna()].rename(columns={"c": "bc"})
    return {
        "bigrams": big.reset_index(drop=True),
        "contexts": ctx.reset_index(drop=True),
        "vocab": int(len(ctx)),
    }


def lm_score(
    ds: ray.data.Dataset,
    model: dict | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.1,
    min_count: int = 2,
) -> ray.data.Dataset:
    """Score every document by its mean bigram log-probability under
    the (self-trained unless provided) add-alpha LM. Returns
    ``(id_col, avg_logprob)`` rounded to 6, docs with < 2 tokens
    omitted."""
    if model is None:
        model = train_bigram_lm(ds, text_col=text_col, min_count=min_count)
    v = model["vocab"]
    model_ref = ray.put((model["bigrams"], model["contexts"]))

    def score(batch: pa.Table) -> pd.DataFrame:
        big, ctx = ray.get(model_ref)
        didx, code1, code2, uniq = _doc_bigrams(batch, text_col)
        if not len(didx):
            return pd.DataFrame(
                {id_col: pd.Series([], dtype="int64"),
                 "avg_logprob": pd.Series([], dtype="float64")}
            )
        # model lookups run at DISTINCT-pair scale; the inverse map
        # fans the per-pair logprob back out to occurrences (same
        # doubles in the same positions as the per-occurrence merge)
        w1, w2, _, inv = _decode_pairs(code1, code2, uniq)
        df = pd.DataFrame({"w1": w1, "w2": w2})
        df = df.merge(big, on=["w1", "w2"], how="left").merge(
            ctx, on="w1", how="left"
        )
        bc = df["bc"].fillna(0).to_numpy(dtype=np.float64)
        uc = df["uc"].fillna(0).to_numpy(dtype=np.float64)
        lp = np.log((bc + alpha) / (uc + alpha * v))[inv]
        g = pd.DataFrame({"d": didx, "lp": lp}).groupby("d", sort=False)[
            "lp"
        ]
        agg = g.mean()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pd.DataFrame(
            {
                id_col: ids[agg.index.to_numpy()].astype(np.int64),
                "avg_logprob": np.round(agg.to_numpy(), 6),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def pmi_collocations(
    ds: ray.data.Dataset,
    text_col: str = "text",
    min_count: int = 5,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Pointwise mutual information collocations over the corpus:
    ``pmi(w1, w2) = ln((bc * T * T) / (B * c1 * c2))`` for adjacent
    bigrams with count >= ``min_count`` (T = total tokens, B = total
    bigrams, c = unigram counts; same lower/space tokenization as the
    bigram LM). The collocation-mining staple (Church & Hanks 1990)
    for phrase vocabularies and tokenizer seeding.

    Scale shape: two corpus passes. Pass 1 sums unigram counts
    through one vocab-bounded co-location; the resulting table is
    VOCAB-scale and is broadcast once via ``ray.put`` (the
    train_bigram_lm contract). Pass 2 sums bigram partials through a
    context-word co-location and computes PMI inside the partition
    body from the broadcast table — the (much larger) distinct-bigram
    table never leaves the workers. ``B = T - num_docs`` exactly
    (every doc of n tokens yields n-1 bigrams; split always returns
    >= 1 token), so no third pass is needed.
    """
    from .skew import partitioned_group_map

    def upartial(batch: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(pc.utf8_lower(batch[text_col]), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        # Arrow-native count: strings reach Python at vocab scale only
        vc = pc.value_counts(toks.flatten())
        return pd.DataFrame(
            {"w": vc.field("values").to_pandas().to_numpy(),
             "c": vc.field("counts").to_numpy(
                 zero_copy_only=False
             ).astype(np.int64)}
        )

    uni = partitioned_group_map(
        ds.map_batches(upartial, batch_format="pyarrow"),
        ["w"],
        lambda g: g.groupby("w", sort=False)["c"].sum().reset_index(),
        num_partitions,
        coalesce=2 * num_partitions,
    ).to_pandas()
    total_tokens = float(uni["c"].sum())
    total_bigrams = total_tokens - float(ds.count())
    uni_ref = ray.put(dict(zip(uni["w"], uni["c"].astype("int64"))))

    def bpartial(batch: pa.Table) -> pd.DataFrame:
        _, c1, c2, uniq = _doc_bigrams(batch, text_col)
        if not len(c1):
            return pd.DataFrame(
                {"w1": pd.Series([], dtype=object),
                 "w2": pd.Series([], dtype=object),
                 "bc": pd.Series([], dtype="int64")}
            )
        w1, w2, counts, _ = _decode_pairs(c1, c2, uniq)
        return pd.DataFrame({"w1": w1, "w2": w2, "bc": counts})

    def body(g: pd.DataFrame) -> pd.DataFrame:
        lut = ray.get(uni_ref)
        s = g.groupby(["w1", "w2"], sort=False)["bc"].sum().reset_index()
        s = s[s["bc"] >= min_count]
        if not len(s):
            return pd.DataFrame(
                {"w1": pd.Series([], dtype="object"),
                 "w2": pd.Series([], dtype="object"),
                 "bc": pd.Series([], dtype="int64"),
                 "pmi": pd.Series([], dtype="float64")}
            )
        c1 = s["w1"].map(lut).to_numpy(dtype=np.float64)
        c2 = s["w2"].map(lut).to_numpy(dtype=np.float64)
        bc = s["bc"].to_numpy(dtype=np.float64)
        # left-assoc double products, single division, one ln — the
        # exact arithmetic the SQL oracle states
        pmi = np.log(
            (bc * total_tokens * total_tokens)
            / (total_bigrams * c1 * c2)
        )
        return pd.DataFrame(
            {"w1": s["w1"], "w2": s["w2"],
             "bc": s["bc"].astype("int64"),
             "pmi": np.round(pmi, 6)}
        )

    return partitioned_group_map(
        ds.map_batches(bpartial, batch_format="pyarrow"),
        ["w1"], body, num_partitions, coalesce=2 * num_partitions,
    )


def char_pair_counts(
    ds: ray.data.Dataset,
    text_col: str = "text",
    k: int = 50,
) -> ray.data.Dataset:
    """Top-k adjacent byte-pair counts within whitespace tokens — the
    statistic behind ONE BPE merge step (Sennrich et al. 2016: the
    merge chosen at each iteration is argmax of exactly this table).

    Scale shape: each batch reduces to a <=65,536-long nonzero
    (pair, count) partial straight off the Arrow string buffers — the
    UTF-8 data buffer is viewed as uint8 (ZERO decode, zero Python
    strings), pairs crossing row boundaries or touching a space are
    masked, and ``np.bincount`` collapses the batch. Partials merge
    through ``grouped_agg``'s map-side-combined path (pair-vocab
    rows, never corpus rows), then a driver top-k over <=65,536 rows.
    ASCII contract (stated so the SQL oracle is exact): pairs are
    BYTE pairs, which equal character pairs on an ASCII corpus; on
    multi-byte UTF-8 this is byte-level BPE (the GPT-2 convention),
    while the SQL oracle counts characters — oracle parity holds for
    ASCII inputs only.
    """

    def partial(batch: pa.Table) -> pd.DataFrame:
        arr = pc.utf8_lower(batch[text_col])
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if pa.types.is_large_string(arr.type):
            arr = arr.cast(pa.string())
        buffers = arr.buffers()
        off = np.frombuffer(buffers[1], dtype=np.int32)[
            arr.offset: arr.offset + len(arr) + 1]
        data = np.frombuffer(buffers[2], dtype=np.uint8)
        lo, hi = int(off[0]), int(off[-1])
        buf = data[lo:hi]
        if buf.size < 2:
            return pd.DataFrame({"pair_key": np.empty(0, np.int64),
                                 "cnt": np.empty(0, np.int64)})
        p1 = buf[:-1].astype(np.uint32)
        p2 = buf[1:].astype(np.uint32)
        ok = np.ones(buf.size - 1, dtype=bool)
        starts = off[1:-1] - lo  # row starts after the first row
        # Empty EDGE rows make boundary offsets coincide with the
        # buffer ends: a leading empty row gives start 0 (`0 - 1`
        # wraps to -1, wrongly masking the LAST pair) and a trailing
        # empty row gives start == buf.size (one past the pair
        # array → IndexError). Only boundaries strictly inside the
        # buffer have a spanning pair to mask.
        b = starts[(starts > 0) & (starts < buf.size)]
        ok[b - 1] = False        # pair spanning a row boundary
        ok &= (p1 != 32) & (p2 != 32)
        key = (p1[ok] << 8) | p2[ok]
        counts = np.bincount(key, minlength=1 << 16)
        nz = np.flatnonzero(counts)
        return pd.DataFrame({"pair_key": nz.astype(np.int64),
                             "cnt": counts[nz].astype(np.int64)})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    from .relational import grouped_agg, top_k

    summed = grouped_agg(partials, ["pair_key"], sums=["cnt"])

    def decode(df: pd.DataFrame) -> pd.DataFrame:
        keys = df["pair_key"].to_numpy(dtype=np.int64)
        pairs = [chr(int(x) >> 8) + chr(int(x) & 0xFF) for x in keys]
        return pd.DataFrame({"pair": pd.array(pairs, dtype="object"),
                             "cnt": df["cnt"].astype("int64")})

    decoded = summed.map_batches(decode, batch_format="pandas")
    return top_k(decoded, k, by=["cnt", "pair"],
                 ascending=[False, True])


def skipgram_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    window: int = 2,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """word2vec-prep skip-gram pair counts (Mikolov et al. 2013): for
    every center token, each context token within ``window`` positions
    contributes one DIRECTED (center, context) pair — both directions
    of every co-occurrence, the exact multiset SGNS trains on.

    Scale shape (the _doc_bigrams contract, widened to w offsets):
    each batch dictionary-encodes its token stream ONCE in Arrow, then
    every offset d in 1..window is one vectorized shifted-mask pass
    over the int64 code array; the batch collapses to its DISTINCT
    code-pair partial before any string decodes (token strings cross
    into Python only at pair-vocab scale), and only pair-vocab rows
    shuffle through grouped_agg's map-side-combined sum. Returns
    ``(w1, w2, n)``.
    """
    from .relational import grouped_agg

    def partial(batch: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(pc.utf8_lower(batch[text_col]), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lengths = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat = toks.flatten()
        uniq = pc.unique(flat)
        empty = pd.DataFrame(
            {"w1": pd.Series(dtype="object"),
             "w2": pd.Series(dtype="object"),
             "n": pd.Series(dtype="int64")})
        if not len(flat):
            return empty
        codes = pc.index_in(flat, uniq).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        didx = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
        first = np.concatenate(([0], np.cumsum(lengths)[:-1]))
        pos = np.arange(codes.size, dtype=np.int64) - np.repeat(
            first, lengths
        )
        c1s, c2s = [], []
        for d in range(1, window + 1):
            i = np.flatnonzero(pos < lengths[didx] - d)
            c1s += [codes[i], codes[i + d]]
            c2s += [codes[i + d], codes[i]]
        if not c1s or not sum(len(c) for c in c1s):
            return empty
        c1 = np.concatenate(c1s)
        c2 = np.concatenate(c2s)
        v = np.int64(len(uniq))
        upair, counts = np.unique(c1 * v + c2, return_counts=True)
        uv = uniq.to_pandas().to_numpy()
        return pd.DataFrame(
            {"w1": uv[upair // v], "w2": uv[upair % v],
             "n": counts.astype("int64")}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_agg(partials, ["w1", "w2"], sums=["n"],
                       shuffle_partitions=num_partitions)
