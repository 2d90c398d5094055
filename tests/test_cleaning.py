"""Unit tests for the corpus-cleaning operators (stages/cleaning.py)
on crafted inputs — the oracle parity test proves engine agreement on
the synthetic corpus; these prove the SEMANTICS on adversarial rows
(PII that must actually be redacted, boilerplate repetition, URL
variants that must collapse)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from biocypher_metta_ray.stages.cleaning import (
    PII_PATTERNS,
    canonical_url_batch,
    decontaminate,
    dup_ngram_fraction,
    gopher_stats_batch,
    scrub_pii_batch,
    url_dedup,
)


def _docs(texts):
    return pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
         "text": pa.array(texts, type=pa.string())}
    )


class TestScrubPII:
    def test_redacts_all_three_kinds(self):
        t = scrub_pii_batch(_docs(
            ["write to a.b+tag@sub.example.co.uk today",
             "call 555-123-4567 or 555.987.6543",
             "server at 192.168.0.1 and 10.0.0.254",
             "clean text with no pii at all"]))
        texts = t["text"].to_pylist()
        assert texts[0] == "write to <EMAIL> today"
        assert texts[1] == "call <PHONE> or <PHONE>"
        assert texts[2] == "server at <IP> and <IP>"
        assert texts[3] == "clean text with no pii at all"
        assert t["n_pii"].to_pylist() == [1, 2, 2, 0]

    def test_order_email_before_ip(self):
        # the email pass must consume an IP embedded in an email host
        # BEFORE the IP pass sees it (otherwise the output would be
        # user@<IP>.example.com) — order is part of the contract
        t = scrub_pii_batch(_docs(["mail user@10.0.0.1.example.com now"]))
        assert t["text"].to_pylist()[0] == "mail <EMAIL> now"
        assert t["n_pii"].to_pylist() == [1]

    def test_patterns_are_re2(self):
        # no lookaheads/backrefs: pyarrow (RE2) must accept every
        # pattern — compiling via a count call is the proof
        import pyarrow.compute as pc

        arr = pa.array(["x"])
        for pat, _ in PII_PATTERNS:
            pc.count_substring_regex(arr, pat)


class TestGopherStats:
    def test_counts(self):
        t = gopher_stats_batch(_docs(["the cat sat on the mat"]))
        assert t["n_words"].to_pylist() == [6]
        assert t["n_chars"].to_pylist() == [22]
        assert t["n_stop"].to_pylist() == [2]          # 'the' twice
        assert t["top_word_count"].to_pylist() == [2]  # 'the'
        # mean_word_len = (22 - 6 + 1) / 6 = 17/6
        assert t["mean_word_len"].to_pylist()[0] == pytest.approx(
            round(17 / 6, 6))

    def test_keyword_stuffing_spikes_top_word_frac(self):
        t = gopher_stats_batch(_docs(
            ["buy buy buy buy cheap", "a normal varied sentence here"]))
        f = t["top_word_frac"].to_pylist()
        assert f[0] == pytest.approx(0.8)
        assert f[1] == pytest.approx(0.2)


class TestDupNgrams:
    def test_repetitive_doc(self, ray_session):
        import ray.data

        ds = ray.data.from_arrow(_docs(
            ["spam spam spam spam spam spam",   # all 3-grams identical
             "one two three four five six",     # all distinct
             "hi there"]))                       # <3 tokens: 1 shingle
        out = (dup_ngram_fraction(ds, n=3).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert out["n_ngrams"].tolist() == [4, 4, 1]
        assert out["n_distinct"].tolist() == [1, 4, 1]
        assert out["dup_frac"].tolist() == [0.75, 0.0, 0.0]


class TestDecontaminate:
    def test_flags_only_overlapping_docs(self, ray_session):
        import ray.data

        bench = ray.data.from_arrow(_docs(
            ["alpha beta gamma delta epsilon zeta eta theta iota"]))
        corpus = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([10, 11], type=pa.int64()),
            "text": pa.array([
                # contains the bench 8-gram alpha..theta
                "prefix alpha beta gamma delta epsilon zeta eta theta",
                "totally unrelated words that share no long ngram run",
            ])}))
        out = (decontaminate(corpus, bench, n=8).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert out["contaminated"].tolist() == [True, False]
        assert out["n_overlap"].tolist()[0] >= 1
        assert out["n_overlap"].tolist()[1] == 0


class TestUrlCanon:
    def test_steps(self):
        urls = [
            "https://A.example:443/path/?utm_source=x&utm_medium=y#frag",
            "http://b.example:80/",
            "https://c.example/page?id=3&fbclid=abc",
            "https://d.example/keep?real=1",
        ]
        t = canonical_url_batch(pa.table({"url": pa.array(urls)}))
        canon = t["canonical_url"].to_pylist()
        assert canon[0] == "https://a.example/path"
        assert canon[1] == "http://b.example"
        assert canon[2] == "https://c.example/page?id=3"
        assert canon[3] == "https://d.example/keep?real=1"

    def test_dedup_keeps_min_id(self, ray_session):
        import ray.data

        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([3, 1, 2], type=pa.int64()),
            "url": pa.array([
                "https://x.example/a/",
                "https://x.example/a#top",
                "https://y.example/b",
            ])}))
        out = (url_dedup(ds, num_partitions=4).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert out["doc_id"].tolist() == [1, 2]
        assert out["canonical_url"].tolist() == [
            "https://x.example/a", "https://y.example/b"]


def test_normalize_text_collapses_and_trims(ray_session):
    import pandas as pd
    import ray

    from biocypher_metta_ray.stages.cleaning import normalize_text

    df = pd.DataFrame({"doc_id": [1, 2],
                       "text": ["  Hello\t\nWORLD  x ", "a"]})
    got = normalize_text(ray.data.from_pandas(df)).to_pandas()
    assert got["text"].tolist() == ["hello world x", "a"]
