"""Mention detection / entity-link scoring and pattern triple extraction.

Both are **actor-pool stages**: the alias vocabulary, Arrow value-set
arrays and predicate tables are built once per actor in ``__init__``
(reference analogue: multi-GB dbsnp maps loaded once and injected into
adapters, /root/reference/create_knowledge_graph.py:28-31,55-58) and
reused across batches. The per-batch bodies are fully vectorized:
tokenization via ``pyarrow.compute.split_pattern`` and membership via
``pc.index_in`` (C++ hash probes), with numpy for the positional
pattern logic — no Python loop over tokens.

Mention semantics (single-token aliases): a token equal to a gazetteer
surface form is a mention; misses are simply non-matches (inner-join
drop-on-miss, tflink_adapter.py:42-44). Triple semantics: consecutive
tokens ``ENTITY REL ENTITY`` yield ``(subj_surface, pred, obj_surface)``
with provenance (doc_id/url, token position).

Provenance columns: whichever of ``doc_id``/``url`` the input carries
are propagated (the fixture corpus has ``url`` only; the
documents-derived corpus has both).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_PROV_COLS = ("doc_id", "url")


def _pin_arrow_threads():
    """Arrow's internal pools default to one thread per host core in
    EVERY Ray worker process; dozens of workers x 32 threads thrash the
    box. Stages are parallelized by Ray, so each worker computes
    single-threaded."""
    pa.set_cpu_count(1)
    pa.set_io_thread_count(1)


def _tokenize(batch: pa.Table, text_col: str = "text"):
    """Returns (flat_tokens: pa.StringArray, doc_idx: np.int64 per token)."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = pc.split_pattern(col, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), lengths)
    return flat, doc_idx


def _prov_schema(batch: pa.Table) -> list[tuple[str, pa.DataType]]:
    return [
        (c, batch.schema.field(c).type) for c in _PROV_COLS
        if c in batch.column_names
    ]


def _empty(batch: pa.Table, cols: list[tuple[str, pa.DataType]]) -> pa.Table:
    data = {c: pa.array([], t) for c, t in _prov_schema(batch)}
    data.update({c: pa.array([], t) for c, t in cols})
    return pa.table(data)


class MentionCounter:
    """Per-document mention counts: (prov..., surface, entity_id, n_mentions).

    The within-batch aggregation is the "partial aggregate" pattern —
    per-doc counts never shuffle because a document never spans rows.
    """

    OUT_COLS = [
        ("surface", pa.string()),
        ("entity_id", pa.string()),
        ("n_mentions", pa.int64()),
    ]

    def __init__(self, surface_to_entity: dict[str, str] | None = None):
        _pin_arrow_threads()
        if surface_to_entity is None:
            from ..kg.gazetteer import ENTITIES

            surface_to_entity = {s: e for s, (e, _l) in ENTITIES.items()}
        self.surfaces = sorted(surface_to_entity)
        self.surface_arr = pa.array(self.surfaces, type=pa.string())
        self.entity_ids = pa.array(
            [surface_to_entity[s] for s in self.surfaces], type=pa.string()
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, doc_idx = _tokenize(batch)
        sid = pc.index_in(flat, self.surface_arr)  # null = not a mention
        sid_np = sid.to_numpy(zero_copy_only=False).astype(np.float64)
        mask = ~np.isnan(sid_np)
        if not mask.any():
            return _empty(batch, self.OUT_COLS)
        keys = doc_idx[mask] * len(self.surfaces) + sid_np[mask].astype(np.int64)
        uniq, counts = np.unique(keys, return_counts=True)
        u_doc = pa.array((uniq // len(self.surfaces)).astype(np.int64))
        u_sid = pa.array((uniq % len(self.surfaces)).astype(np.int64))
        data = {c: batch[c].take(u_doc) for c, _t in _prov_schema(batch)}
        data["surface"] = self.surface_arr.take(u_sid)
        data["entity_id"] = self.entity_ids.take(u_sid)
        data["n_mentions"] = pa.array(counts.astype(np.int64))
        return pa.table(data)


class TripleExtractor:
    """Pattern triple extraction: ``ENT REL ENT`` over consecutive tokens.

    Emits surface-level triples with provenance; canonicalization maps
    surfaces to entity ids downstream (stages/canonicalize.py).
    """

    OUT_COLS = [
        ("subj_surface", pa.string()),
        ("pred", pa.string()),
        ("obj_surface", pa.string()),
        ("pos", pa.int64()),
    ]

    def __init__(
        self,
        entity_surfaces: tuple[str, ...] | None = None,
        relations: dict[str, str] | None = None,
    ):
        from ..kg.gazetteer import ENTITIES, RELATIONS

        _pin_arrow_threads()
        if entity_surfaces is None:
            entity_surfaces = tuple(sorted(ENTITIES))
        if relations is None:
            relations = dict(RELATIONS)
        self.ent_arr = pa.array(sorted(entity_surfaces), type=pa.string())
        self.rel_words = sorted(relations)
        self.rel_arr = pa.array(self.rel_words, type=pa.string())
        self.pred_arr = pa.array(
            [relations[w] for w in self.rel_words], type=pa.string()
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, doc_idx = _tokenize(batch)
        if len(flat) < 3:
            return _empty(batch, self.OUT_COLS)
        ent_id = pc.index_in(flat, self.ent_arr).to_numpy(zero_copy_only=False).astype(np.float64)
        rel_id = pc.index_in(flat, self.rel_arr).to_numpy(zero_copy_only=False).astype(np.float64)
        ent_mask = ~np.isnan(ent_id)
        rel_mask = ~np.isnan(rel_id)
        hit = (
            ent_mask[:-2]
            & rel_mask[1:-1]
            & ent_mask[2:]
            & (doc_idx[:-2] == doc_idx[2:])
        )
        idx = np.nonzero(hit)[0]
        if len(idx) == 0:
            return _empty(batch, self.OUT_COLS)
        # token offset of the subject within its document
        counts = np.bincount(doc_idx, minlength=len(batch)).astype(np.int64)
        doc_starts = np.concatenate(([0], np.cumsum(counts)))
        d = doc_idx[idx]
        pos = idx - doc_starts[d]
        take_docs = pa.array(d)
        data = {c: batch[c].take(take_docs) for c, _t in _prov_schema(batch)}
        data["subj_surface"] = flat.take(pa.array(idx))
        data["pred"] = self.pred_arr.take(pa.array(rel_id[idx + 1].astype(np.int64)))
        data["obj_surface"] = flat.take(pa.array(idx + 2))
        data["pos"] = pa.array(pos.astype(np.int64))
        return pa.table(data)
