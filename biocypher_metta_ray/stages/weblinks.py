"""Hyperlink-graph construction over the crawl corpus.

The reference builds its KG from record adapters; a Common-Crawl-style
corpus additionally carries the WEB graph itself — the ``<a href>``
edges between pages/hosts that power host-level PageRank, crawl-
frontier scoring and spam/hub analysis. These stages extract that
graph with the same discipline as text extraction (pure per-row
function of the html bytes, log-and-skip on malformed rows; reference
analogue for the per-row parse + drop policy:
/root/reference/biocypher_metta/adapters/gtex_eqtl_adapter.py:93-95).

Scale shape: link extraction is an embarrassingly parallel
``map_batches`` over the html column (the corpus never shuffles);
``outlink_edges`` collapses to one row per (url, target) INSIDE the
batch, so the only wide step — the host-graph aggregate — moves
pre-combined (src_host, dst_host) partials through ``grouped_agg``'s
map-side-combined sum, dimension-scale (hosts²) not fact-scale.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.html import extract_links, host_of
from .relational import grouped_agg


def _outlink_batch(batch: pa.Table) -> pa.Table:
    """(url, html) -> one row per distinct (url, target) with its
    occurrence count; batch-local combine so duplicate anchors on a
    page never leave the task."""
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    out_url: list[str] = []
    out_tgt: list[str] = []
    out_n: list[int] = []
    for u, h in zip(urls, htmls):
        links = extract_links(h, u)
        if not links:
            continue
        counts: dict[str, int] = {}
        for t in links:
            counts[t] = counts.get(t, 0) + 1
        for t, n in sorted(counts.items()):
            out_url.append(u)
            out_tgt.append(t)
            out_n.append(n)
    return pa.table(
        {
            "url": pa.array(out_url, type=pa.string()),
            "target": pa.array(out_tgt, type=pa.string()),
            "n_links": pa.array(out_n, type=pa.int64()),
        }
    )


def outlink_edges(corpus: ray.data.Dataset) -> ray.data.Dataset:
    """Page-level outlink edge table ``(url, target, n_links)``.

    Zero shuffle: extraction and the per-page count combine both happen
    inside ``map_batches``; output is link-scale, html stays behind.
    """
    return corpus.map_batches(_outlink_batch, batch_format="pyarrow")


def host_graph(corpus: ray.data.Dataset) -> ray.data.Dataset:
    """Host-level link graph ``(src_host, dst_host, n_links)`` — the
    webgraph aggregate (Broder et al. 2000 bow-tie shape analyses run
    on exactly this table). One dimension-scale shuffle: hosts², not
    pages or links.
    """
    links = outlink_edges(corpus)

    def to_hosts(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src_host": df["url"].map(host_of),
                "dst_host": df["target"].map(host_of),
                "n_links": df["n_links"],
            }
        )

    hosts = links.map_batches(to_hosts, batch_format="pandas")
    return grouped_agg(hosts, ["src_host", "dst_host"], sums=["n_links"])


def _anchor_batch(batch: pa.Table) -> pa.Table:
    """(url, html) -> batch-combined (target, anchor, n) partials."""
    from ..functions.html import extract_anchor_texts

    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    counts: dict[tuple[str, str], int] = {}
    for u, h in zip(urls, htmls):
        for pair in extract_anchor_texts(h, u):
            counts[pair] = counts.get(pair, 0) + 1
    items = sorted(counts.items())
    return pa.table(
        {
            "target": pa.array([k[0] for k, _ in items], type=pa.string()),
            "anchor": pa.array([k[1] for k, _ in items], type=pa.string()),
            "n_links": pa.array([n for _, n in items], type=pa.int64()),
        }
    )


def anchor_text_table(corpus: ray.data.Dataset) -> ray.data.Dataset:
    """Anchor-text alias table ``(target, anchor, n_links)`` — how the
    web refers to each target URL, the classic surface-form source for
    entity-linking alias tries (the gazetteer the north-star mention
    stage loads per actor). (target, anchor) pairs combine INSIDE each
    batch first; the one shuffle moves pre-combined alias-scale
    partials through grouped_agg's map-side-combined sum.
    """
    partials = corpus.map_batches(_anchor_batch, batch_format="pyarrow")
    return grouped_agg(partials, ["target", "anchor"], sums=["n_links"])
