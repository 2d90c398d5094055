"""Corpus sources: Common-Crawl-style page tables as Ray Datasets.

Primary input contract (BASELINE.json ``input_hint``): Parquet with
``(url:string, warc_ts:timestamp, html:binary, text:string,
lang:string)``. Two readers:

- :func:`read_corpus` — read such a Parquet directly (bench/fixture
  corpora written by ``tools/gen_corpus.py``).
- :func:`read_documents_as_corpus` — derive a corpus deterministically
  from the driver-provided ``documents`` table
  (``/root/testdata/sf*/documents.parquet``): each document row is
  wrapped into a full HTML page via
  :func:`biocypher_metta_ray.functions.html.synthesize_html`. The
  downstream pipeline sees only ``(doc_id, url, warc_ts, html, lang)``
  — the ground-truth ``text`` column is dropped so extraction is real
  work; the DuckDB oracle compares against it.

Reference analogue: ``scripts/download_data.py`` stages raw source
files; here the "staging" is an in-flight deterministic synthesis, so
no external data is ever needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.html import synthesize_html

# warc_ts base: 2024-01-01T00:00:00Z (epoch micros), step 137 s per doc
_TS_BASE_US = 1_704_067_200_000_000
_TS_STEP_US = 137_000_000


def doc_url(source: str, doc_id: int) -> str:
    return f"https://{source}.example/doc/{doc_id}"


def documents_to_corpus(batch: pa.Table) -> pa.Table:
    """map_batches kernel: documents row -> corpus row (html synthesized)."""
    doc_ids = batch["doc_id"].to_pylist()
    sources = batch["source"].to_pylist()
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()
    urls = [doc_url(s, d) for s, d in zip(sources, doc_ids)]
    htmls = [
        synthesize_html(u, t, lg) for u, t, lg in zip(urls, texts, langs)
    ]
    ts = pa.array(
        np.asarray(doc_ids, dtype=np.int64) * _TS_STEP_US + _TS_BASE_US,
        type=pa.int64(),
    ).cast(pa.timestamp("us"))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": ts,
            "html": pa.array(htmls, type=pa.binary()),
            "lang": batch["lang"],
        }
    )


def read_documents(sf_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def read_documents_as_corpus(sf_dir: str) -> ray.data.Dataset:
    """documents.parquet -> corpus Dataset (html synthesized in-flight)."""
    ds = read_documents(sf_dir, columns=["doc_id", "text", "lang", "source"])
    return ds.map_batches(documents_to_corpus, batch_format="pyarrow")


def read_corpus(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read a materialized corpus Parquet (url, warc_ts, html, text, lang)."""
    return ray.data.read_parquet(path, columns=columns)
