"""Deterministic fixture-corpus generator (see FIXTURES.md).

Writes three Parquet tables into a target directory:

- ``corpus.parquet``  — (url, warc_ts, html, text, lang): token-stream
  article bodies with Zipf-skewed entity mentions and planted
  ``X rel Y`` relation patterns, wrapped in deterministic boilerplate
  HTML (the extractor must recover ``text`` byte-identically).
- ``entities.parquet`` — (entity_id, label, canonical_name, aliases):
  the gazetteer plus alias-chain entities (shared surfaces) that force
  union-find merges during canonicalization.
- ``gold_triples.parquet`` — (subj, pred, obj, url): ground truth =
  the extraction rule applied to each generated token sequence of an
  ``en`` document, with surfaces mapped through canonical ids (the
  P/R ≥ 0.95 oracle).

Everything derives from ``numpy.random.default_rng(seed)``; same
(seed, n_docs) -> byte-identical Parquet. No external data.

Usage: python tools/gen_corpus.py OUT_DIR [--n-docs 1000] [--seed 42]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from biocypher_metta_ray.functions.html import synthesize_html  # noqa: E402
from biocypher_metta_ray.kg.gazetteer import ENTITIES, RELATIONS  # noqa: E402

FILLER = ("the", "a", "slow", "fast", "small", "big", "order", "dup")

# alias-chain entities: consecutive entities share one surface -> one
# union-find cluster per chain. Canonical id of a cluster = min entity_id.
ALIAS_CHAINS = {
    # chain 1: EXTA0001..3 linked through aw2, aw3
    "EXTA0001": ["aw1", "aw2"],
    "EXTA0002": ["aw2", "aw3"],
    "EXTA0003": ["aw3", "aw4"],
    # chain 2: two entities sharing bw2
    "EXTB0001": ["bw1", "bw2"],
    "EXTB0002": ["bw2", "bw3"],
}
ALIAS_CHAIN_LABEL = "gene"

_TS_BASE_US = 1_704_067_200_000_000
_TS_STEP_US = 137_000_000


def surface_to_entity() -> dict[str, str]:
    m = {s: eid for s, (eid, _l) in ENTITIES.items()}
    for eid, aliases in ALIAS_CHAINS.items():
        for s in aliases:
            # shared surfaces resolve by union-find later; for gold we
            # record the cluster canonical (min id over the chain)
            m.setdefault(s, eid)
    return m


def chain_canonical() -> dict[str, str]:
    """surface/entity -> canonical id for alias-chain clusters."""
    clusters = [["EXTA0001", "EXTA0002", "EXTA0003"], ["EXTB0001", "EXTB0002"]]
    canon = {}
    for c in clusters:
        m = min(c)
        for eid in c:
            canon[eid] = m
    return canon


def extract_rule_triples(tokens: list[str]) -> list[tuple[str, str, str]]:
    """The reference extraction rule: ENT REL ENT on consecutive tokens,
    surfaces mapped to canonical entity ids."""
    s2e = surface_to_entity()
    canon = chain_canonical()
    out = []
    for i in range(len(tokens) - 2):
        s, r, o = tokens[i], tokens[i + 1], tokens[i + 2]
        if s in s2e and r in RELATIONS and o in s2e:
            subj = canon.get(s2e[s], s2e[s])
            obj = canon.get(s2e[o], s2e[o])
            out.append((subj, RELATIONS[r], obj))
    return out


def generate(out_dir: str, n_docs: int = 1000, seed: int = 42) -> dict:
    rng = np.random.default_rng(seed)
    ent_surfaces = sorted(set(surface_to_entity()))
    # Zipf(~1.1) over entity surfaces: head surface dominates (skew knob)
    ranks = np.arange(1, len(ent_surfaces) + 1, dtype=np.float64)
    zipf_p = ranks ** -1.1
    zipf_p /= zipf_p.sum()
    rel_words = sorted(RELATIONS)

    urls, tss, htmls, texts, langs = [], [], [], [], []
    gold = []
    for i in range(n_docs):
        n_tok = int(rng.integers(40, 120))
        toks = []
        for _ in range(n_tok):
            r = rng.random()
            if r < 0.55:
                toks.append(FILLER[int(rng.integers(0, len(FILLER)))])
            elif r < 0.85:
                toks.append(ent_surfaces[int(rng.choice(len(ent_surfaces), p=zipf_p))])
            else:
                toks.append(rel_words[int(rng.integers(0, len(rel_words)))])
        # plant 1-4 explicit relation sentences at random positions
        for _ in range(int(rng.integers(1, 5))):
            pos = int(rng.integers(0, max(1, len(toks) - 3)))
            subj = ent_surfaces[int(rng.choice(len(ent_surfaces), p=zipf_p))]
            obj = ent_surfaces[int(rng.choice(len(ent_surfaces), p=zipf_p))]
            rel = rel_words[int(rng.integers(0, len(rel_words)))]
            toks[pos:pos + 3] = [subj, rel, obj]
        lang = "en" if rng.random() < 0.95 else ("de" if rng.random() < 0.5 else "fr")
        text = " ".join(toks)
        url = f"https://site{i % 1000}.example/page/{i}"
        urls.append(url)
        tss.append(_TS_BASE_US + i * _TS_STEP_US)
        texts.append(text)
        langs.append(lang)
        htmls.append(synthesize_html(url, text, lang))
        if lang == "en":
            for (s, p, o) in extract_rule_triples(toks):
                gold.append((s, p, o, url))

    os.makedirs(out_dir, exist_ok=True)
    corpus = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.int64()).cast(pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    pq.write_table(corpus, f"{out_dir}/corpus.parquet")

    ent_rows = {"entity_id": [], "label": [], "canonical_name": [], "aliases": []}
    by_eid: dict[str, list[str]] = {}
    for s, (eid, lab) in sorted(ENTITIES.items()):
        by_eid.setdefault(eid, []).append(s)
    for eid in sorted(by_eid):
        lab = next(l for s, (e, l) in ENTITIES.items() if e == eid)
        ent_rows["entity_id"].append(eid)
        ent_rows["label"].append(lab)
        ent_rows["canonical_name"].append(sorted(by_eid[eid])[0])
        ent_rows["aliases"].append(sorted(by_eid[eid]))
    for eid, aliases in sorted(ALIAS_CHAINS.items()):
        ent_rows["entity_id"].append(eid)
        ent_rows["label"].append(ALIAS_CHAIN_LABEL)
        ent_rows["canonical_name"].append(aliases[0])
        ent_rows["aliases"].append(aliases)
    entities = pa.table(
        {
            "entity_id": pa.array(ent_rows["entity_id"], pa.string()),
            "label": pa.array(ent_rows["label"], pa.string()),
            "canonical_name": pa.array(ent_rows["canonical_name"], pa.string()),
            "aliases": pa.array(ent_rows["aliases"], pa.list_(pa.string())),
        }
    )
    pq.write_table(entities, f"{out_dir}/entities.parquet")

    gold_t = pa.table(
        {
            "subj": pa.array([g[0] for g in gold], pa.string()),
            "pred": pa.array([g[1] for g in gold], pa.string()),
            "obj": pa.array([g[2] for g in gold], pa.string()),
            "url": pa.array([g[3] for g in gold], pa.string()),
        }
    )
    pq.write_table(gold_t, f"{out_dir}/gold_triples.parquet")
    return {"n_docs": n_docs, "n_gold": len(gold), "out_dir": out_dir}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--n-docs", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    info = generate(args.out_dir, args.n_docs, args.seed)
    print(info)
