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

import numpy as np
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
    alias_map: dict | None = None,
) -> dict:
    """GTF -> gene nodes (gencode_gene_adapter.py:84-119 semantics:
    type filter, version strip, window filter, props projection).
    ``alias_map`` is the gene_info-derived {gene_name: [synonyms]}
    dict (gencode_gene_adapter.py:45-82); when given it broadcasts
    once and each node gains a ``synonyms`` prop (empty on miss, the
    reference's .get default)."""
    import ray as _ray

    from ..sources.bio_formats import read_gtf

    ds = read_gtf(path, type_filter="gene",
                  attr_keys=("gene_id", "gene_name", "gene_type"))
    amap_ref = _ray.put(alias_map) if alias_map is not None else None

    def to_nodes(df: pd.DataFrame) -> pd.DataFrame:
        if chrom is not None:
            df = df[df["chr"] == chrom]
            if start is not None or end is not None:
                df = df[in_window(df["start"].to_numpy(),
                                  df["end"].to_numpy(), start, end)]
        props = _props_json(
            df, ["chr", "start", "end", "gene_name", "gene_type"]
        )
        if amap_ref is not None:
            amap = _ray.get(amap_ref)
            props = pd.Series(
                [
                    json.dumps(
                        {**json.loads(p),
                         "synonyms": list(amap.get(n) or [])},
                        sort_keys=True,
                    )
                    for p, n in zip(props, df["gene_name"])
                ],
                index=df.index,
            )
        out = pd.DataFrame(
            {
                "id": df["gene_id"],
                "label": label,
                "props_json": props,
            }
        )
        return out[out["id"].notna()]

    return {"nodes": ds.map_batches(to_nodes, batch_format="pandas"),
            "edges": None}


def gtf_transcript_extractor(
    path: str, direction: str = "transcribed_to"
) -> dict:
    """GTF transcripts -> transcript nodes + gene<->transcript edges;
    ``direction`` switches between ``transcribed_to`` (gene->transcript)
    and ``transcribed_from`` (transcript->gene), the reference's
    type-driven direction swap (gencode_adapter.py:122-131)."""
    assert direction in ("transcribed_to", "transcribed_from")
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
        gene, trans = df["gene_id"], tid
        subj, obj = ((gene, trans) if direction == "transcribed_to"
                     else (trans, gene))
        out = pd.DataFrame(
            {
                "subj": subj,
                "pred": direction,
                "obj": obj,
                "props_json": None,
            }
        )
        return out[out["subj"].notna() & out["obj"].notna()]

    return {
        "nodes": ds.map_batches(to_nodes, batch_format="pandas"),
        "edges": ds.map_batches(to_edges, batch_format="pandas"),
    }


def gtf_exon_extractor(path: str) -> dict:
    """GTF exon rows -> exon nodes with gene/transcript/exon_number
    props (gencode_exon_adapter.py:42-74)."""
    from ..sources.bio_formats import read_gtf

    ds = read_gtf(
        path, type_filter="exon",
        attr_keys=("gene_id", "transcript_id", "exon_id", "exon_number"),
    )

    def to_nodes(df: pd.DataFrame) -> pd.DataFrame:
        eid = df["exon_id"].str.split(".", n=1).str[0]
        out = pd.DataFrame(
            {
                "id": eid,
                "label": "exon",
                "props_json": _props_json(
                    df, ["chr", "start", "end", "gene_id", "transcript_id",
                         "exon_number"]
                ),
            }
        )
        return out[out["id"].notna()]

    return {"nodes": ds.map_batches(to_nodes, batch_format="pandas"),
            "edges": None}


def tsv_edge_extractor(
    path: str,
    pred: str,
    subj_col: int,
    obj_col: int,
    sep: str | None = "\t",
    score_col: int | None = None,
    score_scale: float = 1.0,
    subj_map: dict[str, str] | None = None,
    obj_map: dict[str, str] | None = None,
    subj_prefix_strip: str | None = None,
    obj_prefix_strip: str | None = None,
    evidence_col: int | None = None,
    evidence_prefix: str = "pubmed:",
    skip_header: bool = False,
) -> dict:
    """Generic delimited-file edge extractor covering the reference's
    TSV-edge adapter family: tflink (entrez->ensembl maps + pubmed
    evidence list explode, tflink_adapter.py:42-54), string_ppi
    ('9606.' prefix strip + score/1000, string_ppi_adapter.py:42-52),
    refseq_closest_gene and friends. Broadcast id maps apply
    drop-on-miss to each endpoint."""
    import ray as _ray

    from ..sources.bio_formats import first_lines_of, read_lines

    smap_ref = _ray.put(subj_map) if subj_map is not None else None
    omap_ref = _ray.put(obj_map) if obj_map is not None else None
    # skip_header: read each input file's FIRST line at build time
    # (tiny driver-side I/O) and filter exact matches inside the
    # distributed kernel. A positional per-batch drop is WRONG under
    # Ray's block splitting — read_text batches don't start at file
    # boundaries, so "drop batch row 0" silently loses data lines.
    headers = frozenset(first_lines_of(path)) if skip_header else frozenset()

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        sm = _ray.get(smap_ref) if smap_ref is not None else None
        om = _ray.get(omap_ref) if omap_ref is not None else None
        lines = df["text"]
        if headers:
            n0 = len(lines)
            lines = lines[~lines.isin(headers)]
            if n0 - len(lines):
                from ..state.metrics import incr

                incr("tsv_edge", "header_lines_dropped", n0 - len(lines))
        parts = lines.str.split(sep, expand=True)
        need = max(subj_col, obj_col, score_col or 0, evidence_col or 0)
        if parts.shape[1] <= need:
            return pd.DataFrame(
                {"subj": [], "pred": [], "obj": [], "props_json": []}
            )
        subj = parts[subj_col]
        obj = parts[obj_col]
        if subj_prefix_strip:
            subj = subj.str.removeprefix(subj_prefix_strip)
        if obj_prefix_strip:
            obj = obj.str.removeprefix(obj_prefix_strip)
        if sm is not None:
            subj = subj.map(sm)  # None on miss
        if om is not None:
            obj = obj.map(om)
        scores = (
            pd.to_numeric(parts[score_col], errors="coerce") * score_scale
            if score_col is not None
            else pd.Series(np.nan, index=parts.index)
        )
        evid = (
            parts[evidence_col].fillna("").astype(str)
            if evidence_col is not None
            else pd.Series("", index=parts.index)
        )
        props = [
            json.dumps(p, sort_keys=True) if p else None
            for p in (
                {
                    **({"score": float(s)} if s == s else {}),
                    **(
                        {"evidence": [evidence_prefix + e
                                      for e in ev.split(";") if e]}
                        if ev else {}
                    ),
                }
                for s, ev in zip(scores.to_numpy(), evid.to_numpy())
            )
        ]
        out = pd.DataFrame(
            {"subj": subj, "pred": pred, "obj": obj, "props_json": props}
        )
        return out[out["subj"].notna() & out["obj"].notna()]

    return {"nodes": None,
            "edges": read_lines(path).map_batches(to_edges, batch_format="pandas")}


def pathway_list_extractor(
    path: str, species_filter: str | None = "Homo sapiens"
) -> dict:
    """Pathway list TSV (id, name, species) -> pathway nodes with a
    species filter (reactome_pathway_adapter.py:40-51)."""
    from ..sources.bio_formats import read_lines

    def to_nodes(df: pd.DataFrame) -> pd.DataFrame:
        parts = df["text"].str.split("\t", expand=True)
        if parts.shape[1] < 3:
            return pd.DataFrame({"id": [], "label": [], "props_json": []})
        out = pd.DataFrame(
            {"id": parts[0], "name": parts[1], "species": parts[2]}
        )
        if species_filter is not None:
            out = out[out["species"] == species_filter]
        return pd.DataFrame(
            {
                "id": out["id"],
                "label": "pathway",
                "props_json": [
                    json.dumps({"pathway_name": n}, sort_keys=True)
                    for n in out["name"]
                ],
            }
        )

    return {"nodes": read_lines(path).map_batches(to_nodes, batch_format="pandas"),
            "edges": None}


SV_TYPE_MAP = {
    "<DEL>": "deletion", "<DUP>": "duplication", "<INS>": "insertion",
    "<INV>": "inversion", "<CNV>": "copy number variation",
}


def vcf_sv_extractor(path: str) -> dict:
    """Structural-variant VCF -> structural_variant nodes: ALT symbol
    mapped through a type enum (rows with unknown symbols dropped) and
    END= pulled from INFO (dbvar_adapter.py:12,37-48)."""
    from ..sources.bio_formats import read_vcf

    ds = read_vcf(path, info_keys=("END",))

    def to_nodes(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["variant_type"] = df["alt"].map(SV_TYPE_MAP)
        df = df[df["variant_type"].notna()]  # predicate drop
        df["end"] = pd.to_numeric(df["END"], errors="coerce")
        df = df[df["end"].notna()]
        df["end"] = df["end"].astype("int64")
        df = df.rename(columns={"pos": "start"})
        return pd.DataFrame(
            {
                "id": df["id"],
                "label": "structural_variant",
                "props_json": _props_json(
                    df, ["chr", "start", "end", "variant_type"]
                ),
            }
        )

    return {"nodes": ds.map_batches(to_nodes, batch_format="pandas"),
            "edges": None}


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


def swissprot_extractor(
    path: str, direction: str = "translates_to"
) -> dict:
    """SwissProt records -> protein nodes + transcript<->protein edges
    from Ensembl dbxrefs; ``direction`` switches ``translates_to``
    (transcript->protein) vs ``translation_of`` (protein->transcript),
    the reference's per-type swap (uniprot_adapter.py:37-74;
    uniprot_protein_adapter.py:46-62 for the nodes)."""
    assert direction in ("translates_to", "translation_of")
    from ..sources.records import read_swissprot

    ds = read_swissprot(path)

    def to_nodes(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["synonyms"] = df["dbxrefs"].map(lambda xs: sorted(xs))
        out = pd.DataFrame(
            {
                "id": df["accession"],
                "label": "protein",
                "props_json": [
                    json.dumps(
                        {"protein_name": n, "synonyms": list(s)},
                        sort_keys=True,
                    )
                    for n, s in zip(df["protein_name"], df["synonyms"])
                ],
            }
        )
        return out

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"subj": [], "pred": [], "obj": [], "props_json": []}
        for acc, xs in zip(df["accession"], df["dbxrefs"]):
            for x in xs:
                if x.startswith("Ensembl:ENST"):
                    enst = x.split(":", 1)[1].split(".")[0]  # version strip
                    s, o = ((enst, acc) if direction == "translates_to"
                            else (acc, enst))
                    rows["subj"].append(s)
                    rows["pred"].append(direction)
                    rows["obj"].append(o)
                    rows["props_json"].append(None)
        return pd.DataFrame(rows)

    return {
        "nodes": ds.map_batches(to_nodes, batch_format="pandas"),
        "edges": ds.map_batches(to_edges, batch_format="pandas"),
    }


def gaf_extractor(path: str, gaf_type: str = "human",
                  rnacentral_map: dict | None = None) -> dict:
    """GAF -> GO->product ``go_gene_product`` edges with
    qualifier/evidence props (gaf_adapter.py:76-104). The ``rna``
    flavor remaps DB_Object_ID through the RNAcentral id map
    (gaf_adapter.py:68-74,86-91; broadcast once) and DROPS rows whose
    id misses the map, with accounting."""
    import ray as _ray

    from ..sources.records import read_gaf

    ds = read_gaf(path)
    rmap_ref = (
        _ray.put(rnacentral_map) if rnacentral_map is not None else None
    )

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        target = df["db_object_id"]
        if gaf_type == "rna":
            rmap = _ray.get(rmap_ref) if rmap_ref is not None else {}
            mapped = target.map(rmap)
            ok = mapped.notna()
            if (~ok).any():
                from ..state.metrics import incr

                incr("gaf", "rnacentral_misses", int((~ok).sum()))
            df = df[ok]
            target = mapped[ok]
        return pd.DataFrame(
            {
                "subj": df["go_id"],
                "pred": "go_gene_product",
                "obj": target,
                "props_json": [
                    json.dumps({"qualifier": q, "evidence": e}, sort_keys=True)
                    for q, e in zip(df["qualifier"], df["evidence_code"])
                ],
            }
        )

    return {"nodes": None,
            "edges": ds.map_batches(to_edges, batch_format="pandas")}


def obo_extractor(path: str) -> dict:
    """OBO terms -> ``go`` nodes + ``subclass`` hierarchy edges
    (ontologies_adapter.py:55-147 semantics; obsolete terms skipped)."""
    from ..sources.records import read_obo

    ds = read_obo(path)

    def to_nodes(df: pd.DataFrame) -> pd.DataFrame:
        df = df[~df["is_obsolete"]]
        return pd.DataFrame(
            {
                "id": df["id"],
                "label": "go",
                "props_json": [
                    json.dumps(
                        {"term_name": n, "subontology": ns}, sort_keys=True
                    )
                    for n, ns in zip(df["name"], df["namespace"])
                ],
            }
        )

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        df = df[~df["is_obsolete"]]
        rows = {"subj": [], "pred": [], "obj": [], "props_json": []}
        for tid, parents in zip(df["id"], df["is_a"]):
            for p in parents:
                rows["subj"].append(tid)
                rows["pred"].append("subclass")
                rows["obj"].append(p)
                rows["props_json"].append(None)
        return pd.DataFrame(rows)

    return {
        "nodes": ds.map_batches(to_nodes, batch_format="pandas"),
        "edges": ds.map_batches(to_edges, batch_format="pandas"),
    }


def owl_ontology_extractor(
    path: str,
    label: str = "ontology_term",
    edge_label: str | None = None,
    subontologies: bool = False,
    include_xrefs: bool = False,
    dry_run: bool = False,
    source: str | None = None,
    source_url: str | None = None,
) -> dict:
    """OWL (RDF/XML) ontology -> term nodes + subclass/part_of/has_part
    edges, the full ontologies_adapter family (GO/UBERON/CLO:
    ontologies_adapter.py:47-212, gene_ontology_adapter.py:17-42 for
    the ``subontologies`` second pass). Restriction-block rewriting and
    the documented deviations live in sources/owl.py."""
    from ..sources.owl import ontology_edges, ontology_terms, read_owl_triples

    triples = read_owl_triples(path)
    return {
        "nodes": ontology_terms(
            triples, label=label, subontologies=subontologies,
            dry_run=dry_run, source=source, source_url=source_url,
        ),
        "edges": ontology_edges(
            triples, label=edge_label or f"{label}_relationship",
            include_xrefs=include_xrefs, dry_run=dry_run,
            source=source, source_url=source_url,
        ),
    }


def reactome_extractor(path: str, label: str = "genes_pathways") -> dict:
    """Reactome 2-col TSVs -> edges, the reference's three-label family
    (reactome_adapter.py:32-76): ``genes_pathways`` (ENSG
    version-stripped -> R-HSA pathway), ``parent_pathway_of``
    (parent -> child) and ``child_pathway_of`` (child -> parent), all
    filtered to rows whose pathway/parent starts with R-HSA."""
    from ..sources.records import read_two_col_tsv

    allowed = ("genes_pathways", "parent_pathway_of", "child_pathway_of")
    if label not in allowed:
        raise ValueError(f"label must be one of {allowed}")

    if label == "genes_pathways":
        ds = read_two_col_tsv(path, names=("gene", "pathway"),
                              prefix_filter=(None, "R-HSA"))

        def to_edges(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "subj": df["gene"].str.split(".", n=1).str[0],
                    "pred": "genes_pathways",
                    "obj": df["pathway"],
                    "props_json": None,
                }
            )
    else:
        ds = read_two_col_tsv(path, names=("parent", "child"),
                              prefix_filter=("R-HSA", None))

        def to_edges(df: pd.DataFrame) -> pd.DataFrame:
            s, o = (("parent", "child") if label == "parent_pathway_of"
                    else ("child", "parent"))
            return pd.DataFrame(
                {
                    "subj": df[s],
                    "pred": label,
                    "obj": df[o],
                    "props_json": None,
                }
            )

    return {"nodes": None, "edges": ds.map_batches(to_edges, batch_format="pandas")}


def coexpression_extractor(
    dir_path: str, id_map: dict[str, str] | None = None, top_k: int | None = None
) -> dict:
    """Directory of per-gene files (filename = gene key; lines
    ``other_gene score``) -> ``coexpressed_with`` edges; optional
    broadcast id map applied to BOTH endpoints with drop-on-miss
    (coxpressdb_adapter.py:34-47)."""
    import ray as _ray

    from ..sources.records import read_keyed_dir

    ds = read_keyed_dir(dir_path, key_name="gene")
    map_ref = _ray.put(id_map) if id_map is not None else None

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        m = _ray.get(map_ref) if map_ref is not None else None
        rows = {"subj": [], "pred": [], "obj": [], "props_json": []}
        for gene, text in zip(df["gene"], df["text"]):
            src = m.get(gene) if m is not None else gene
            if src is None:
                continue
            n = 0
            for line in text.splitlines():
                parts = line.split()
                if len(parts) < 2:
                    continue
                dst = m.get(parts[0]) if m is not None else parts[0]
                if dst is None:
                    continue
                try:
                    score = float(parts[1])
                except ValueError:
                    continue
                rows["subj"].append(src)
                rows["pred"].append("coexpressed_with")
                rows["obj"].append(dst)
                rows["props_json"].append(json.dumps({"score": score}))
                n += 1
                if top_k is not None and n >= top_k:
                    break
        return pd.DataFrame(rows)

    return {"nodes": None, "edges": ds.map_batches(to_edges, batch_format="pandas")}


def wide_variant_extractor(
    path: str,
    fields: dict[str, int] | None = None,
    annotation_fields: dict[str, int] | None = None,
    label: str = "snp",
    chrom: str | None = None,
    start: int | None = None,
    end: int | None = None,
) -> dict:
    """FAVOR-style very-wide positional CSV -> variant nodes with a
    NESTED ``annotation`` props dict (favor_adapter.py:27-122:
    positional FIELDS projection, '.'->0 cleanup, to_float clamp,
    composite variant id via helpers.build_variant_id, optional
    chr/start/end window filter per check_genomic_location). The
    nested dict renders recursively in MeTTa (metta_writer.py:158-160).
    Quoted fields with embedded commas are handled (csv grammar).
    Malformed/short rows are dropped and counted (state.metrics:
    ``wide_variant/rows_dropped``).
    """
    import csv

    from ..functions.helpers import build_variant_id, to_float
    from ..sources.bio_formats import read_lines

    fields = fields or {"chr": 0, "pos": 1, "ref": 2, "alt": 3}
    missing = {"chr", "pos", "ref", "alt"} - set(fields)
    if missing:
        raise ValueError(f"fields must map chr/pos/ref/alt; missing {missing}")
    annotation_fields = annotation_fields or {}
    need = max([*fields.values(), *annotation_fields.values()], default=0)
    window_chrom, window = chrom, (start, end)

    def to_nodes(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"id": [], "label": [], "props_json": []}
        dropped = 0
        for parts in csv.reader(df["text"]):
            if len(parts) <= need:
                dropped += 1
                continue
            try:
                chrom = parts[fields["chr"]]
                pos = int(parts[fields["pos"]])
                ref = parts[fields["ref"]]
                alt = parts[fields["alt"]]
            except ValueError:
                dropped += 1
                continue
            if window_chrom is not None:
                if chrom != window_chrom:
                    continue
                lo, hi = window
                if (lo is not None and pos < lo) or (hi is not None and pos > hi):
                    continue
            ann = {}
            for name, idx in annotation_fields.items():
                raw = parts[idx]
                if raw == ".":  # '.' -> 0 then to_float (favor_adapter.py:74-83)
                    ann[name] = to_float(0)
                    continue
                try:
                    ann[name] = to_float(raw)
                except ValueError:
                    ann[name] = raw
            props = {"chr": chrom, "pos": pos, "ref": ref, "alt": alt,
                     "annotation": ann}
            rows["id"].append(build_variant_id(chrom, pos, ref, alt))
            rows["label"].append(label)
            rows["props_json"].append(json.dumps(props, sort_keys=True))
        if dropped:
            from ..state.metrics import incr

            incr("wide_variant", "rows_dropped", dropped)
        return pd.DataFrame(rows)

    ds = read_lines(path)
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


def rna_central_extractor(
    bed_path: str,
    rfam_path: str,
    label: str = "non_coding_rna",
    edge_label: str = "go_rna",
    chrom: str | None = None,
    start: int | None = None,
    end: int | None = None,
) -> dict:
    """RNAcentral ncRNA nodes + Rfam GO-annotation edges — the last
    reference adapter (rna_central_adapter.py:38-74).

    Nodes: BED-ish parse with the +1 0-based -> 1-based shift on both
    coordinates, node id = the column-3 accession split at ``_``
    (taxid suffix dropped, NO taxid filter — the reference keeps every
    node row), ``rna_type`` from column 13. The optional genomic
    window replicates helpers.check_genomic_location: ``chrom`` must
    match for any bound to apply; ``start``/``end`` bounds are each
    applied only when given.

    Edges: 3-column rfam TSV (accession, GO term, Rfam family); only
    human rows (accession ending ``_9606``) survive, suffix stripped
    (rna_central_adapter.py:60-74); the edge label is ``go_rna`` (the
    schema's non_coding_rna -> go association, output_label
    belongs_to). Both inputs are gzip-transparent via
    sources.read_lines.
    """
    from ..sources.bio_formats import read_lines

    def to_nodes(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id": [], "label": [], "props_json": []})
        lines = df["text"]
        if lines.empty:
            return empty
        parts = lines.str.split("\t", expand=True)
        if parts.shape[1] < 14:
            return empty
        out = pd.DataFrame(
            {
                "id": parts[3].str.split("_").str[0],
                "chr": parts[0],
                "start": pd.to_numeric(parts[1], errors="coerce") + 1,
                "end": pd.to_numeric(parts[2], errors="coerce") + 1,
                "rna_type": parts[13].str.strip(),
            }
        )
        out = out[out["start"].notna() & out["end"].notna()]
        if chrom is not None:
            out = out[out["chr"] == chrom]
            if start is not None:
                out = out[out["start"] >= start]
            if end is not None:
                out = out[out["end"] <= end]
        if out.empty:
            return empty
        out = out.astype({"start": "int64", "end": "int64"})
        return pd.DataFrame(
            {
                "id": out["id"],
                "label": label,
                "props_json": _props_json(
                    out, ["chr", "start", "end", "rna_type"]
                ),
            }
        )

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"subj": [], "pred": [], "obj": [], "props_json": []}
        )
        lines = df["text"]
        if lines.empty:
            return empty
        parts = lines.str.split("\t", expand=True)
        if parts.shape[1] < 2:
            return empty
        keep = parts[0].str.endswith("_9606").fillna(False)
        parts = parts[keep]
        if parts.empty:
            return empty
        return pd.DataFrame(
            {
                "subj": parts[0].str.split("_").str[0],
                "pred": edge_label,
                "obj": parts[1].str.strip(),
                "props_json": None,
            }
        )

    return {
        "nodes": read_lines(bed_path).map_batches(
            to_nodes, batch_format="pandas"
        ),
        "edges": read_lines(rfam_path).map_batches(
            to_edges, batch_format="pandas"
        ),
    }
