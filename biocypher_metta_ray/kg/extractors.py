"""Built-in extractors: sources -> schema-conformant node/edge datasets.

The reference's extension surface is the Adapter subclass with
``get_nodes``/``get_edges`` generators plus a YAML registry resolving
``module``/``cls`` via importlib (SURVEY §2.3.10,
create_knowledge_graph.py:49-64). Our equivalent: an EXTRACTOR is any
callable returning ``{"nodes": Dataset | None, "edges": Dataset |
None}`` where node datasets carry ``(id, label, props_json)`` and edge
datasets ``(subj, pred, obj, props_json)``. The registry
(pipelines/registry.py) resolves and unions them.

Built-ins mirror representative reference adapters:

- :func:`gtf_gene_extractor` — gencode_gene_adapter.py: GTF gene rows
  -> gene nodes (chr/start/end/gene_name props, version-stripped ids,
  optional genomic window filter)
- :func:`gtf_transcript_extractor` — gencode_adapter.py: transcript
  nodes + gene->transcript ``transcribed_to`` edges
- :func:`vcf_variant_extractor` — dbsnp_adapter.py: VCF rows -> snp
  nodes with INFO props
- :func:`bed_region_extractor` — epd/dgv-style BED -> region nodes
  with composite region ids
- :func:`web_kg_extractor` — the flagship web-text pipeline (corpus ->
  canonical triples + endpoint nodes)
"""

from __future__ import annotations

import json

import pandas as pd
import ray.data

from ..functions.helpers import build_region_id, in_window


def _props_json(df: pd.DataFrame, cols: list[str]) -> pd.Series:
    recs = df[cols].to_dict("records")
    return pd.Series(
        [json.dumps({k: v for k, v in r.items() if v is not None and v == v},
                    sort_keys=True) for r in recs],
        index=df.index,
    )


def gtf_gene_extractor(
    path: str,
    label: str = "gene",
    chrom: str | None = None,
    start: int | None = None,
    end: int | None = None,
) -> dict:
    """GTF -> gene nodes (gencode_gene_adapter.py:84-119 semantics:
    type filter, version strip, window filter, props projection)."""
    from ..sources.bio_formats import read_gtf

    ds = read_gtf(path, type_filter="gene",
                  attr_keys=("gene_id", "gene_name", "gene_type"))

    def to_nodes(df: pd.DataFrame) -> pd.DataFrame:
        if chrom is not None:
            df = df[df["chr"] == chrom]
            if start is not None or end is not None:
                df = df[in_window(df["start"].to_numpy(),
                                  df["end"].to_numpy(), start, end)]
        out = pd.DataFrame(
            {
                "id": df["gene_id"],
                "label": label,
                "props_json": _props_json(
                    df, ["chr", "start", "end", "gene_name", "gene_type"]
                ),
            }
        )
        return out[out["id"].notna()]

    return {"nodes": ds.map_batches(to_nodes, batch_format="pandas"),
            "edges": None}


def gtf_transcript_extractor(path: str) -> dict:
    """GTF transcripts -> transcript nodes + transcribed_to edges
    (gencode_adapter.py:55-131)."""
    from ..sources.bio_formats import read_gtf

    ds = read_gtf(
        path, type_filter="transcript",
        attr_keys=("gene_id", "transcript_id", "transcript_name"),
    )

    def to_nodes(df: pd.DataFrame) -> pd.DataFrame:
        tid = df["transcript_id"].str.split(".", n=1).str[0]
        out = pd.DataFrame(
            {
                "id": tid,
                "label": "transcript",
                "props_json": _props_json(
                    df, ["chr", "start", "end", "transcript_name"]
                ),
            }
        )
        return out[out["id"].notna()]

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        tid = df["transcript_id"].str.split(".", n=1).str[0]
        out = pd.DataFrame(
            {
                "subj": df["gene_id"],
                "pred": "transcribed_to",
                "obj": tid,
                "props_json": None,
            }
        )
        return out[out["subj"].notna() & out["obj"].notna()]

    return {
        "nodes": ds.map_batches(to_nodes, batch_format="pandas"),
        "edges": ds.map_batches(to_edges, batch_format="pandas"),
    }


def vcf_variant_extractor(
    path: str, label: str = "snp", info_keys: tuple[str, ...] = ("VC", "CAF")
) -> dict:
    """VCF -> variant nodes (dbsnp_adapter.py:39-63 semantics)."""
    from ..sources.bio_formats import read_vcf

    ds = read_vcf(path, info_keys=info_keys)

    def to_nodes(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "id": df["id"],
                "label": label,
                "props_json": _props_json(
                    df, ["chr", "pos", "ref", "alt", *info_keys]
                ),
            }
        )

    return {"nodes": ds.map_batches(to_nodes, batch_format="pandas"),
            "edges": None}


def bed_region_extractor(
    path: str, label: str = "enhancer", one_based: bool = True
) -> dict:
    """BED -> region nodes with composite region ids
    (epd_adapter.py:39-41, helpers.py:36-39)."""
    from ..sources.bio_formats import read_bed

    ds = read_bed(path, one_based=one_based)

    def to_nodes(df: pd.DataFrame) -> pd.DataFrame:
        ids = [
            build_region_id(c, s, e)
            for c, s, e in zip(df["chr"], df["start"], df["end"])
        ]
        return pd.DataFrame(
            {
                "id": ids,
                "label": label,
                "props_json": _props_json(df, ["chr", "start", "end", "name"]),
            }
        )

    return {"nodes": ds.map_batches(to_nodes, batch_format="pandas"),
            "edges": None}


def web_kg_extractor(
    corpus_path: str | None = None,
    documents_dir: str | None = None,
    lang: str = "en",
) -> dict:
    """The flagship web-text KG flow as a registry extractor."""
    from ..pipelines.kg import (
        canonical_triples,
        dedup_edges,
        entity_label_map,
        nodes_from_triples,
    )
    from ..sources.corpus import read_corpus, read_documents_as_corpus
    from .gazetteer import entities_table

    if corpus_path is not None:
        corpus = read_corpus(corpus_path)
    elif documents_dir is not None:
        corpus = read_documents_as_corpus(documents_dir)
    else:
        raise ValueError("need corpus_path or documents_dir")
    entities = ray.data.from_arrow(entities_table())
    triples, _ = canonical_triples(corpus, entities, lang=lang)
    edges = dedup_edges(triples)

    def edge_props(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["props_json"] = [
            json.dumps({"n_mentions": int(n)}) for n in df["n_mentions"]
        ]
        return df[["subj", "pred", "obj", "props_json"]]

    nodes = nodes_from_triples(edges, entity_label_map(entities))

    def node_props(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["props_json"] = None
        return df[["id", "label", "props_json"]]

    return {
        "nodes": nodes.map_batches(node_props, batch_format="pandas"),
        "edges": edges.map_batches(edge_props, batch_format="pandas"),
    }
