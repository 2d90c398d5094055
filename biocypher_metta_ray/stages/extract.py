"""Text-extraction stage: html binary -> article text, byte-identical per url.

Stateless ``map_batches`` kernel (no model/index to amortize, so plain
tasks, not an actor pool). Per-row failures (undecodable html) follow
the reference's log-and-skip policy
(/root/reference/biocypher_metta/adapters/gtex_eqtl_adapter.py:93-95):
the row is dropped and counted in the ``n_dropped``-bearing metrics
column handled by the pipeline's metrics collector.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.html import extract_text


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """(..., html:binary) -> (..., text:string), malformed rows dropped.

    Kept in ``batch_format="pyarrow"`` end-to-end; the html column is
    dropped on output so the large binary payload doesn't travel
    further down the pipeline.
    """
    htmls = batch["html"].to_pylist()
    texts = [extract_text(h) for h in htmls]
    keep = [t is not None for t in texts]
    out = batch.drop_columns(["html"]).append_column(
        "text", pa.array(texts, type=pa.string())
    )
    n_dropped = len(keep) - sum(keep)
    if n_dropped:
        out = out.filter(pa.array(keep, type=pa.bool_()))
        from ..state.metrics import incr

        incr("extract_text", "rows_dropped", n_dropped)
    return out


def lang_filter(batch: pa.Table, lang: str = "en") -> pa.Table:
    """Keep rows of one language (reference analogue: species filter
    'Homo sapiens', reactome_pathway_adapter.py:43)."""
    import pyarrow.compute as pc

    return batch.filter(pc.equal(batch["lang"], lang))
