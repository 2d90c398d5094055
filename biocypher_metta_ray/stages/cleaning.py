"""Corpus-cleaning operators a web-scale training-data pipeline runs
between crawl and tokenizer: PII scrubbing, Gopher-style repetition /
quality statistics, benchmark decontamination, URL canonicalization.

The reference delegates corpus preparation to its upstream data drops
(config/biocypher_config.yaml:12 assumes pre-cleaned inputs); at
100 TB these stages ARE the pipeline, so they are first-class
operators here, same contract as stages/text_stats.py: deterministic,
vectorized, and (where an oracle entry exists) expressible in ANSI
SQL so DuckDB verifies them bit-for-bit.

Scale shapes:
- scrub / quality / repetition: stateless per-batch Arrow/numpy
  kernels — embarrassingly parallel, no shuffle.
- decontaminate: the benchmark side is SMALL by definition (eval
  suites are MBs, the corpus is TBs) — its n-gram hash set is
  collected once, ``ray.put`` once, and probed per batch with
  ``np.isin``; the corpus-side never shuffles.
- url_dedup: hash-partitioned group-min on the canonical URL (same
  partitioned_group_map shape as exact dedup).

All regexes are RE2-compatible: pyarrow.compute and DuckDB both run
RE2, which is what makes the Python and SQL definitions provably the
same language.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

# (pattern, replacement) — applied in ORDER; order is part of the
# contract (an email must be scrubbed before the bare-domain pass of
# any future pattern could eat it). Mirrored literally in oracle SQL.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
)


def scrub_pii_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Redact emails / NNN-NNN-NNNN phones / IPv4s, counting matches.

    Pure Arrow kernel (count_substring_regex + replace_substring_regex,
    both RE2): zero Python per row, safe for the hottest path.
    """
    txt = batch[text_col]
    n = pa.array(np.zeros(len(batch), dtype=np.int64))
    for pat, repl in PII_PATTERNS:
        n = pc.add(n, pc.count_substring_regex(txt, pat).cast(pa.int64()))
        txt = pc.replace_substring_regex(txt, pat, repl)
    return pa.table({"doc_id": batch["doc_id"], "text": txt, "n_pii": n})


def scrub_pii(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(
        lambda b: scrub_pii_batch(b, text_col), batch_format="pyarrow"
    )


# stopword regex shared with the quality oracle (RE2 word boundaries)
_STOP_RE = r"\b(the|a|and|of|to)\b"


def gopher_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style quality statistics per document (Rae et al. 2021,
    'Scaling Language Models: ... Gopher', §A1.1 repetition/quality
    filters — public paper; thresholds are caller policy, this kernel
    only measures):

    - n_words: single-space token count
    - n_chars / n_stop / top_word_count: exact integer counts (the
      oracle compares THESE — the ratio floats below are derived and
      stay library-side, same round-half-engine-difference policy as
      stages/text_stats.py)
    - mean_word_len: (n_chars - n_words + 1) / n_words — exact for
      single-space-joined text
    - stop_frac: occurrences of 5 English stopwords / n_words
    - top_word_frac: count of the most frequent token / n_words
      (boilerplate and keyword-stuffed pages spike this)
    """
    txt = batch[text_col]
    toks = pc.split_pattern(txt, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    n_chars = pc.utf8_length(txt).to_numpy(zero_copy_only=False).astype(np.int64)
    n_words = np.maximum(lengths, 1)
    mean_word_len = (n_chars - lengths + 1) / n_words
    n_stop = pc.count_substring_regex(txt, _STOP_RE).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)

    # top-word count per doc: token codes + per-doc segment bincount
    flat = toks.flatten()
    uniq = pc.unique(flat)
    codes = pc.index_in(flat, uniq).to_numpy(zero_copy_only=False).astype(np.int64)
    didx = np.repeat(np.arange(len(batch), dtype=np.int64), lengths)
    key = didx * len(uniq) + codes
    uniq_keys, counts = np.unique(key, return_counts=True)
    top = np.zeros(len(batch), dtype=np.int64)
    np.maximum.at(top, uniq_keys // len(uniq), counts)

    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_words": pa.array(lengths),
            "n_chars": pa.array(n_chars),
            "n_stop": pa.array(n_stop),
            "top_word_count": pa.array(top),
            "mean_word_len": pa.array(np.round(mean_word_len, 6)),
            "stop_frac": pa.array(np.round(n_stop / n_words, 6)),
            "top_word_frac": pa.array(np.round(top / n_words, 6)),
        }
    )


def gopher_stats(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(
        lambda b: gopher_stats_batch(b, text_col), batch_format="pyarrow"
    )


def dup_ngram_fraction(
    ds: ray.data.Dataset, n: int = 3,
    id_col: str = "doc_id", text_col: str = "text",
) -> ray.data.Dataset:
    """Fraction of duplicate word n-grams per document — Gopher's
    repetition signal (a doc whose 3-grams are mostly repeats is
    boilerplate/spam). Reuses the vectorized MinHasher shingle kernel
    (same tokenization and <n-token single-shingle rule as the dedup
    family, so one definition serves both); duplicate fraction =
    1 - distinct/total over the per-doc hash segment. n_ngrams and
    n_distinct are the oracle-compared integers (hash-distinct ==
    string-distinct absent a 61-bit collision — same argument as
    shingle_sets); dup_frac is derived, library-side only.
    """
    from .dedup import MinHasher

    hasher = MinHasher(num_perms=1, num_bands=1, n_shingle=n,
                       id_col=id_col, text_col=text_col)

    def frac(batch: pa.Table) -> pa.Table:
        sh, starts = hasher._doc_shingles(batch)
        total = np.diff(starts)
        D = len(batch)
        didx = np.repeat(np.arange(D, dtype=np.int64), total)
        order = np.lexsort((sh, didx))
        s, d = sh[order], didx[order]
        new = np.ones(len(s), dtype=bool)
        if len(s) > 1:
            new[1:] = (s[1:] != s[:-1]) | (d[1:] != d[:-1])
        distinct = np.bincount(d[new], minlength=D)
        out = np.zeros(D, dtype=np.float64)
        nz = total > 0
        out[nz] = 1.0 - distinct[nz] / total[nz]
        return pa.table(
            {
                id_col: batch[id_col],
                "n_ngrams": pa.array(total),
                "n_distinct": pa.array(distinct.astype(np.int64)),
                "dup_frac": pa.array(np.round(out, 6)),
            }
        )

    return ds.map_batches(frac, batch_format="pyarrow")


def decontaminate(
    docs: ray.data.Dataset,
    benchmark: ray.data.Dataset,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Benchmark decontamination: flag corpus docs sharing any word
    n-gram with the benchmark set (the standard 8-gram/13-gram overlap
    test from the GPT-3 / PaLM eval-contamination appendices — public
    papers; n is the caller's policy knob).

    Scale shape: the benchmark is SMALL by definition, so its distinct
    n-gram hashes are reduced per batch, collected once (hashes only —
    KBs per thousand benchmark docs), and broadcast via ``ray.put``;
    every corpus batch then probes the sorted array with ``np.isin``.
    The corpus side never shuffles and never materializes. Hash
    equality stands in for string equality (same 61-bit-collision
    argument as shingle_sets; stages/dedup.py).

    Returns (id, n_overlap, contaminated) — filtering is the caller's
    one-line ``filter`` so the flags stay inspectable.
    """
    from .dedup import MinHasher

    hasher = MinHasher(num_perms=1, num_bands=1, n_shingle=n,
                       id_col=id_col, text_col=text_col)

    def bench_hashes(batch: pa.Table) -> pa.Table:
        sh, _ = hasher._doc_shingles(batch)
        return pa.table({"h": pa.array(np.unique(sh))})

    # hashes-only collect: dimension-scale by contract
    hdf = benchmark.map_batches(bench_hashes, batch_format="pyarrow").to_pandas()
    bench = np.unique(hdf["h"].to_numpy().astype(np.uint64))
    bench_ref = ray.put(bench)

    def probe(batch: pa.Table) -> pa.Table:
        bset = ray.get(bench_ref)
        sh, starts = hasher._doc_shingles(batch)
        hits = np.isin(sh, bset)
        # per-doc hit counts via segment reduction
        D = len(batch)
        didx = np.repeat(np.arange(D, dtype=np.int64), np.diff(starts))
        n_overlap = np.bincount(didx, weights=hits, minlength=D).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_overlap": pa.array(n_overlap),
                "contaminated": pa.array(n_overlap > 0),
            }
        )

    return docs.map_batches(probe, batch_format="pyarrow")


# URL canonicalization — every step an RE2 rewrite (mirrored in SQL):
# drop fragment; drop utm_*/fbclid tracking params (and a dangling
# '?'/'&'); drop default ports; drop one trailing slash; lowercase.
URL_CANON_STEPS: tuple[tuple[str, str], ...] = (
    (r"#.*$", ""),
    (r"[?&](utm_[A-Za-z0-9_]*|fbclid)=[^&#]*", ""),
    (r"\?&", "?"),
    (r"[?&]$", ""),
    (r":(80|443)(/|$)", r"\2"),
    (r"/$", ""),
)


def canonical_url_batch(
    batch: pa.Table, url_col: str = "url", out_col: str = "canonical_url"
) -> pa.Table:
    u = batch[url_col]
    for pat, repl in URL_CANON_STEPS:
        u = pc.replace_substring_regex(u, pat, repl)
    u = pc.utf8_lower(u)
    return batch.append_column(out_col, u)


def explode_spans(
    ds: ray.data.Dataset,
    width: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """One row per NON-OVERLAPPING ``width``-word window of each doc:
    (id, span_no, span). The final window keeps its natural length
    (1..width words) so reassembly is lossless. Stateless per-batch
    explode — pandas split/explode is the C path for this shape."""

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        words = df[text_col].str.split(" ")
        n = words.str.len().to_numpy()
        n_spans = -(-n // width)
        didx = np.repeat(np.arange(len(df)), n_spans)
        spans, span_nos = [], []
        for ws in words:
            spans.extend(
                " ".join(ws[i : i + width])
                for i in range(0, len(ws), width)
            )
        for k in n_spans:
            span_nos.extend(range(k))
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy()[didx],
                "span_no": pd.array(span_nos, dtype="int64"),
                "span": spans,
            }
        )

    return ds.map_batches(explode, batch_format="pandas")


def span_dedup(
    ds: ray.data.Dataset,
    width: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Corpus-level EXACT span dedup (the windowed form of Lee et al.
    2021, 'Deduplicating Training Data Makes Language Models Better' —
    public paper): every ``width``-word window that appears more than
    once ANYWHERE in the corpus survives only at its globally-first
    occurrence (min (id, span_no) — deterministic at any parallelism);
    later occurrences are cut and each doc is reassembled from its
    surviving windows. Docs reduced to nothing disappear.

    Scale shape: explode → ONE hash-partitioned pass over spans (all
    occurrences of a span co-locate, so election and filtering happen
    in the same partition body — no winners broadcast, which would be
    corpus-scale) → one groupby(id) reassembly. Two shuffles, both
    inherent: the survivor set is the same order as the corpus. The
    MinHash/SimHash family (stages/dedup.py) removes whole near-dup
    DOCS; this removes repeated PASSAGES from docs that otherwise
    stay."""
    from .skew import partitioned_group_map

    spans = explode_spans(ds, width, id_col=id_col, text_col=text_col)

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(
            [id_col, "span_no"], kind="mergesort"
        ).drop_duplicates(subset=["span"])

    kept = partitioned_group_map(spans, ["span"], keep_first, num_partitions)

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "span_no"], kind="mergesort")
        joined = g.groupby(id_col, sort=False)["span"].agg(" ".join)
        return pd.DataFrame(
            {id_col: joined.index.to_numpy(), text_col: joined.to_numpy()}
        )

    return partitioned_group_map(kept, [id_col], reassemble, num_partitions)


def url_dedup(
    ds: ray.data.Dataset,
    url_col: str = "url",
    id_col: str = "doc_id",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """One row per canonical URL, keeping the min id (deterministic
    representative at any parallelism) — the crawl-side first pass
    before any content-based dedup. Hash-partitioned group-min, same
    shape as exact dedup."""
    from .skew import partitioned_group_map

    canon = ds.map_batches(
        lambda b: canonical_url_batch(b, url_col), batch_format="pyarrow"
    )

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col, kind="mergesort").drop_duplicates(
            subset=["canonical_url"]
        )

    return partitioned_group_map(
        canon, ["canonical_url"], keep_min, num_partitions
    )


def normalize_text_batch(
    batch: pa.Table, text_col: str = "text"
) -> pa.Table:
    """CCNet-style text normalization (the canonical pre-dedup pass:
    lowercase, collapse all whitespace runs to one space, trim):
    pure Arrow kernel — utf8_lower + one replace_substring_regex +
    trim, zero Python per row. Stated transform so the SQL oracle is
    ``trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))``."""
    txt = pc.utf8_lower(batch[text_col])
    txt = pc.replace_substring_regex(txt, r"\s+", " ")
    txt = pc.utf8_trim_whitespace(txt)
    return batch.set_column(
        batch.schema.get_field_index(text_col), text_col, txt)


def normalize_text(
    ds: ray.data.Dataset, text_col: str = "text"
) -> ray.data.Dataset:
    """Streaming map of :func:`normalize_text_batch` (no shuffle)."""
    return ds.map_batches(
        lambda t: normalize_text_batch(t, text_col),
        batch_format="pyarrow",
    )


def clean_corpus(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang: str = "en",
    min_tokens: int = 20,
    stopword_pct: int = 5,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """CCNet-shaped end-to-end corpus cleaning, composed as ONE
    pipeline: normalize (lowercase / whitespace-collapse / trim) ->
    heuristic language gate (argmax stopword hits == ``lang``, the
    lang_id tie-break) -> quality gate (``n_tokens >= min_tokens`` and
    integer stopword ratio ``n_stop * 100 >= stopword_pct * n_tokens``
    — integer arithmetic so the SQL oracle needs no float rounding) ->
    exact dedup on the NORMALIZED text keeping the min-id exemplar
    with its copy count.

    Scale shape: the three gates FUSE into one streaming Arrow pass
    per batch (normalize + one tokenize feeding both the language
    histogram and the quality counts — the corpus is read and decoded
    once, NEVER shuffled); the dedup leg is the fingerprint-only
    pipeline of stages/dedup.py (round-5 rework): only (md5-128, id)
    triples enter the one wide co-location, and the surviving text
    re-attaches map-only via a broadcast of the winner (id, n_copies)
    table — output-scale, one 16-byte row per distinct text. This is
    the chain CCNet runs before LM training (Wenzek et al. 2020),
    stated filter-for-filter so DuckDB can replay it.

    Returns ``(doc_id, n_copies, text)`` — one row per surviving
    distinct normalized text.
    """
    from .dedup import exact_dedup_decisions
    from .relational import semi_join_filter
    from .text_stats import STOPWORDS

    langs = sorted(STOPWORDS)
    lang_j = langs.index(lang)

    def gates(batch: pa.Table) -> pa.Table:
        batch = normalize_text_batch(batch, text_col)
        toks = pc.split_pattern(batch[text_col], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), lengths)
        counts = np.zeros((len(batch), len(langs)), dtype=np.int64)
        for j, lg in enumerate(langs):
            m = pc.is_in(
                flat, value_set=pa.array(list(STOPWORDS[lg]))
            ).to_numpy(zero_copy_only=False)
            counts[:, j] = np.bincount(doc_idx[m], minlength=len(batch))
        # argmax with first-index tie-break == lang_id's CASE order
        pred_ok = (counts.argmax(axis=1) == lang_j) & (
            counts.max(axis=1) > 0
        )
        n_tokens = lengths.astype(np.int64)
        n_stop = counts[:, lang_j]
        keep = (
            pred_ok
            & (n_tokens >= min_tokens)
            & (n_stop * 100 >= stopword_pct * n_tokens)
        )
        return batch.filter(pa.array(keep))

    kept = ds.map_batches(gates, batch_format="pyarrow")
    # winner pull is output-scale (one (id, n_copies) row per distinct
    # surviving text); the gated corpus itself streams map-only twice
    # (fingerprint pass + survivor filter) — recomputing the cheap
    # gates beats materializing the survivor corpus in the store
    winners = exact_dedup_decisions(
        kept, text_col=text_col, id_col=id_col,
        num_partitions=num_partitions,
    )["winners"].to_pandas()
    surv = semi_join_filter(
        kept.map_batches(lambda t: t.select([id_col, text_col]),
                         batch_format="pyarrow"),
        winners[id_col], on=id_col,
    )
    wref = ray.put(winners)  # output-scale (id, n_copies), put once

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        w = ray.get(wref)
        out = df.merge(w, on=id_col)
        return out[[id_col, "n_copies", text_col]].astype(
            {"n_copies": "int64"})

    return surv.map_batches(attach, batch_format="pandas")
