"""Entity linking: alias-trie mention detection + context rerank.

The north-star linker shape: batched mention detection over an alias
trie with candidate scoring for ambiguous surface forms. This is a
genuinely stateful stage — the trie and the per-entity context
profiles are built once per actor in ``__init__`` (actor pool via
``concurrency=``; reference analogue: dbsnp index injection,
create_knowledge_graph.py:28-31) — unlike the lightweight gazetteer
matcher in stages/mentions.py, which stays task-friendly.

Semantics:

- aliases may span multiple tokens; matching is greedy
  longest-match-first, left to right, non-overlapping;
- an unambiguous surface links directly (drop-on-miss for unknown
  text, as always);
- an ambiguous surface (shared by several entities) is scored against
  each candidate's CONTEXT PROFILE — the bag of the entity's other
  aliases' tokens plus its canonical name tokens — by counting
  profile terms present in the document's token set (TF-IDF-lite:
  rarity-weighted by 1/df over the profile vocabulary). Deterministic
  tie-break: min entity_id.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .pool import autoscale_pool


class EntityLinker:
    """Actor-pool stage: text -> linked mentions
    (prov..., surface, entity_id, pos, n_candidates, score)."""

    def __init__(self, entities: list[dict] | pd.DataFrame):
        """``entities``: rows of (entity_id, label, canonical_name,
        aliases list[str])."""
        if isinstance(entities, pd.DataFrame):
            entities = entities.to_dict("records")
        # trie: first token -> [(token_tuple, entity_id)], longest first
        self.trie: dict[str, list[tuple[tuple[str, ...], str]]] = defaultdict(list)
        profiles: dict[str, set[str]] = defaultdict(set)
        surface_owners: dict[tuple[str, ...], list[str]] = defaultdict(list)
        for row in entities:
            eid = row["entity_id"]
            terms = set()
            aliases = row.get("aliases")  # may be list OR numpy array
            aliases = [] if aliases is None else list(aliases)
            for alias in aliases + [row.get("canonical_name") or ""]:
                toks = tuple(alias.split())
                if not toks:
                    continue
                terms.update(toks)
                if eid not in surface_owners[toks]:
                    surface_owners[toks].append(eid)
            profiles[eid] = terms
        for toks, eids in surface_owners.items():
            for eid in sorted(eids):
                self.trie[toks[0]].append((toks, eid))
        for first in self.trie:
            self.trie[first].sort(key=lambda te: (-len(te[0]), te[1]))
        # profile doc frequency for rarity weighting
        df_count: dict[str, int] = defaultdict(int)
        for terms in profiles.values():
            for t in terms:
                df_count[t] += 1
        n_ent = max(1, len(profiles))
        self.idf = {t: float(np.log(1 + n_ent / c)) for t, c in df_count.items()}
        self.profiles = dict(profiles)
        self.max_alias_len = max(
            (len(toks) for lst in self.trie.values() for toks, _ in lst),
            default=1,
        )
        # Arrow value set for the vectorized first-token pre-screen
        self._first_tokens = pa.array(sorted(self.trie), pa.string())
        # single-token surface -> sorted owner list (vectorized path)
        self._single_owners = {
            first: sorted({e for t, e in lst if len(t) == 1})
            for first, lst in self.trie.items()
        }

    def _link_doc(self, toks: list[str]):
        """-> list of (pos, surface, entity_id, n_candidates, score)."""
        tokset = set(toks)
        out = []
        i, n = 0, len(toks)
        while i < n:
            cands = self.trie.get(toks[i])
            hit = None
            if cands:
                for alias_toks, _eid in cands:
                    L = len(alias_toks)
                    if i + L <= n and tuple(toks[i:i + L]) == alias_toks:
                        # collect ALL entities owning this exact alias
                        owners = sorted(
                            {e for at, e in cands if at == alias_toks}
                        )
                        hit = (alias_toks, owners)
                        break  # longest match first
            if hit is None:
                i += 1
                continue
            alias_toks, owners = hit
            surface = " ".join(alias_toks)
            if len(owners) == 1:
                best, score = owners[0], 0.0
            else:
                best, score = None, -1.0
                for eid in owners:  # sorted -> deterministic tie-break
                    profile = self.profiles[eid] - set(alias_toks)
                    s = sum(self.idf.get(t, 0.0) for t in profile & tokset)
                    if s > score:
                        best, score = eid, s
            out.append((i, surface, best, len(owners), round(score, 6)))
            i += len(alias_toks)
        return out

    def _prescreen(self, batch: pa.Table) -> np.ndarray:
        """Vectorized Arrow pre-filter: doc indices whose token stream
        contains at least one trie FIRST token — the greedy Python
        matcher only ever runs on those docs. On real web text most
        docs carry no gazetteer hit, so this removes the per-doc
        Python loop from the common case entirely."""
        if not self.trie:
            return np.empty(0, dtype=np.int64)
        col = batch["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern_regex(col, r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lengths = lengths.astype(np.int64)
        hits = pc.is_in(
            toks.flatten(), value_set=self._first_tokens
        ).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), lengths)
        n_hits = np.bincount(doc_idx[hits], minlength=len(batch))
        return np.nonzero(n_hits > 0)[0]

    def _link_batch_single_token(self, batch: pa.Table, prov_cols):
        """Fully vectorized matcher for the (common) case where EVERY
        alias is one token: greedy non-overlapping matching degenerates
        to per-token dictionary hits, so the whole batch resolves with
        Arrow split + is_in + numpy position arithmetic; only
        AMBIGUOUS surfaces (several owning entities) fall back to the
        context-profile scoring, one call per such mention."""
        col = batch["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern_regex(col, r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lengths = lengths.astype(np.int64)
        doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), lengths)
        ne = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        # token position among NON-EMPTY tokens of its doc == the
        # position under Python str.split() for any whitespace shape
        cum = np.cumsum(ne)
        doc_starts = np.concatenate(([0], np.cumsum(lengths)))
        base = np.concatenate(([0], cum[doc_starts[1:] - 1]))[:-1] if len(
            lengths
        ) else np.array([], dtype=np.int64)
        pos_all = cum - 1 - base[doc_idx] if len(doc_idx) else cum
        hits = pc.is_in(flat, value_set=self._first_tokens).to_numpy(
            zero_copy_only=False
        ) & ne
        hit_idx = np.nonzero(hits)[0]
        surfaces = flat.take(pa.array(hit_idx)).to_pylist()
        docs_of = doc_idx[hit_idx]
        pos_of = pos_all[hit_idx]
        ents, ncands, scores = [], [], []
        doc_toksets: dict[int, set] = {}
        for d, surf in zip(docs_of, surfaces):
            owners = self._single_owners[surf]
            if len(owners) == 1:
                ents.append(owners[0])
                ncands.append(1)
                scores.append(0.0)
                continue
            tokset = doc_toksets.get(d)
            if tokset is None:
                lo, hi = doc_starts[d], doc_starts[d + 1]
                tokset = set(flat.slice(lo, hi - lo).to_pylist()) - {""}
                doc_toksets[d] = tokset
            best, score = None, -1.0
            for eid in owners:  # sorted -> deterministic tie-break
                profile = self.profiles[eid] - {surf}
                s = sum(self.idf.get(t, 0.0) for t in profile & tokset)
                if s > score:
                    best, score = eid, s
            ents.append(best)
            ncands.append(len(owners))
            scores.append(round(score, 6))
        data = {}
        if prov_cols:
            prov = batch.select(prov_cols).take(
                pa.array(docs_of, pa.int64())
            )
            for c in prov_cols:
                data[c] = prov[c]
        data["pos"] = pa.array(pos_of, pa.int64())
        data["surface"] = pa.array(surfaces, pa.string())
        data["entity_id"] = pa.array(ents, pa.string())
        data["n_candidates"] = pa.array(ncands, pa.int32())
        data["score"] = pa.array(scores, pa.float64())
        return pa.table(data)

    def __call__(self, batch: pa.Table) -> pa.Table:
        prov_cols = [c for c in ("doc_id", "url") if c in batch.column_names]
        if self.max_alias_len == 1 and self.trie:
            return self._link_batch_single_token(batch, prov_cols)
        cand_docs = self._prescreen(batch)
        texts = (
            batch["text"].take(pa.array(cand_docs)).to_pylist()
            if len(cand_docs) else []
        )
        rows = {"pos": [], "surface": [], "entity_id": [],
                "n_candidates": [], "score": []}
        src_idx: list[int] = []  # batch row index per emitted mention
        for ridx, text in zip(cand_docs, texts):
            for pos, surface, eid, ncand, score in self._link_doc(text.split()):
                src_idx.append(int(ridx))
                rows["pos"].append(pos)
                rows["surface"].append(surface)
                rows["entity_id"].append(eid)
                rows["n_candidates"].append(ncand)
                rows["score"].append(score)
        schema_types = {
            "pos": pa.int64(), "surface": pa.string(),
            "entity_id": pa.string(), "n_candidates": pa.int32(),
            "score": pa.float64(),
        }
        # provenance: ONE vectorized gather per column, not per row
        prov = batch.select(prov_cols).take(
            pa.array(src_idx, pa.int64())
        ) if prov_cols else None
        data = {}
        for c in prov_cols:
            data[c] = prov[c]
        for c, t in schema_types.items():
            data[c] = pa.array(rows[c], t)
        return pa.table(data)


def link_entities(
    ds,
    entities: pd.DataFrame,
    concurrency: int | tuple | None = None,
    batch_size: int = 512,
):
    """corpus-with-text -> linked mentions (actor pool: trie + profiles
    built once per actor)."""
    import ray

    ref = ray.put(entities)

    class Pooled(EntityLinker):
        def __init__(self):
            super().__init__(ray.get(ref))

    return ds.map_batches(
        Pooled,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=autoscale_pool(concurrency),
    )


def mention_contexts(
    ds,
    entities: pd.DataFrame,
    window: int = 2,
    concurrency: int | tuple | None = None,
    batch_size: int = 512,
):
    """Linked mentions WITH their surrounding token windows —
    ``(doc_id, pos, surface, entity_id, context)`` where ``context``
    is the ±``window`` tokens around the mention (mention tokens
    included). This is the entity-linking TRAINING-DATA extractor: a
    corpus-scale NER/EL dataset is exactly these windows, and cutting
    them at link time costs zero extra passes (the text is already in
    the linker's batch — a separate stage would need a fact×fact
    join of mentions back to documents).

    Same actor-pool shape as :func:`link_entities`; the window cut is
    a batch-local token-array slice per mention (mentions are sparse
    relative to tokens). Token positions follow the linker contract:
    0-based among ``str.split()`` tokens.
    """
    import ray

    ref = ray.put(entities)

    class Ctx(EntityLinker):
        def __init__(self):
            super().__init__(ray.get(ref))

        def __call__(self, batch: pa.Table) -> pa.Table:
            linked = super().__call__(batch)
            toks_of = {
                d: t.split()
                for d, t in zip(
                    batch["doc_id"].to_pylist(),
                    batch["text"].to_pylist(),
                )
            }
            ctxs = []
            for d, pos, surf in zip(
                linked["doc_id"].to_pylist(),
                linked["pos"].to_pylist(),
                linked["surface"].to_pylist(),
            ):
                toks = toks_of[d]
                span = len(surf.split())
                lo = max(0, pos - window)
                ctxs.append(" ".join(toks[lo:pos + span + window]))
            return linked.append_column(
                "context", pa.array(ctxs, pa.string())
            )

    return ds.map_batches(
        Ctx,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=autoscale_pool(concurrency),
    )
