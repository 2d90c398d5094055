"""Oracled queries for the SURVEY §2.1 adapter families (round 5).

Closes VERDICT r4's #1 gap: every reference adapter family gets a
driver-checkable ``queries()`` entry + DuckDB ``oracle_sql()`` entry,
following the proven ``cadd_nodes``/``peregrine_edges`` pattern —
fixtures are FORMULA-generated (every field a deterministic function
of a row index), so the oracle reproduces the whole computation
(parse, version strip, broadcast-map joins with drop-on-miss, liftover
arithmetic, enum maps, coordinate shifts) in pure SQL over ``range()``.

Reference citations live in the extractor docstrings
(biocypher_metta_ray/kg/extractors.py, kg/regulatory.py); each query
here only wires a fixture to its extractor and flattens ``props_json``
into typed columns so the driver's hash compare sees concrete values.

No ``ray.init`` anywhere (driver owns the session).
"""

from __future__ import annotations

import gzip
import json
import os

import numpy as np
import pandas as pd

FIX = "/tmp/graft_adapter_fixtures"


def _ensure_dir(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path


def _write_once(path: str, text: str) -> str:
    """Idempotent fixture write (parity suite calls each query once
    per run; the driver once per round)."""
    _ensure_dir(os.path.dirname(path))
    if not os.path.exists(path):
        with open(path, "w") as f:
            f.write(text)
    return path


def _flat(spec: dict[str, tuple]):
    """props_json flatten kernel factory.

    ``spec`` maps output column -> (getter(row_df, props_list), dtype)
    where dtype None keeps object/str. Explicit dtypes keep EMPTY
    blocks schema-faithful (an object-dtype empty block would demote
    the merged Arrow type).
    """

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        props = [json.loads(p) if p else {} for p in df.get("props_json", [])]
        out = {}
        for col, (getter, dtype) in spec.items():
            vals = getter(df, props)
            out[col] = (pd.Series(vals, dtype=dtype, index=df.index)
                        if dtype else pd.Series(vals, dtype=object,
                                                index=df.index).astype(str))
        return pd.DataFrame(out, index=df.index)

    return fn


def _p(key, dtype=None):
    """Spec getter: pull ``key`` from props."""
    return (lambda df, props: [p.get(key) for p in props]), dtype


def _c(col, dtype=None):
    """Spec getter: pass a row column through."""
    return (lambda df, props: df[col]), dtype


# ---------------------------------------------------------------------------
# GENCODE GTF family (gencode_gene_adapter.py, gencode_adapter.py,
# gencode_exon_adapter.py)
# ---------------------------------------------------------------------------

def _gtf_fixture() -> str:
    """120 genes x (2 transcripts x 2 exons): every 10th gene carries
    the _PAR_Y suffix (version strip must preserve it), versions and
    coordinates are functions of i."""
    path = f"{FIX}/gencode.gtf"
    if os.path.exists(path):
        return path
    lines = ["#!genome-build GRCh38.p13"]
    for i in range(120):
        chrom = f"chr{1 + i % 5}"
        strand = "+" if i % 2 == 0 else "-"
        par = "_PAR_Y" if i % 10 == 0 else ""
        gid = f"ENSG{i:011d}.{1 + i % 7}{par}"
        gtype = "protein_coding" if i % 2 == 0 else "lncRNA"
        lines.append(
            f"{chrom}\tHAVANA\tgene\t{1000 + 100 * i}\t{1999 + 100 * i}\t."
            f"\t{strand}\t.\t"
            f'gene_id "{gid}"; gene_name "GENE{i}"; gene_type "{gtype}";'
        )
        for j in range(2):
            tid = f"ENST{2 * i + j:011d}.{1 + j}"
            lines.append(
                f"{chrom}\tHAVANA\ttranscript\t{1000 + 100 * i + 10 * j}\t"
                f"{1500 + 100 * i + 10 * j}\t.\t{strand}\t.\t"
                f'gene_id "{gid}"; transcript_id "{tid}"; '
                f'transcript_name "TX{i}-{j}";'
            )
            for k in range(2):
                eid = f"ENSE{4 * i + 2 * j + k:011d}.1"
                lines.append(
                    f"{chrom}\tHAVANA\texon\t{1000 + 100 * i + 10 * j + k}\t"
                    f"{1100 + 100 * i + 10 * j + k}\t.\t{strand}\t.\t"
                    f'gene_id "{gid}"; transcript_id "{tid}"; '
                    f'exon_id "{eid}"; exon_number "{k + 1}";'
                )
    return _write_once(path, "\n".join(lines) + "\n")


def q_gencode_genes(sf_dir: str):
    """GTF gene nodes + alias-map synonyms (gencode_gene_adapter.py:
    84-119 semantics: version strip with _PAR_Y preservation, alias
    broadcast with empty-on-miss). Fixture-driven; sf_dir unused."""
    from biocypher_metta_ray.kg.extractors import gtf_gene_extractor

    alias = {f"GENE{i}": [f"GENE{i}ALT", f"G{i}"]
             for i in range(120) if i % 3 != 0}
    nodes = gtf_gene_extractor(_gtf_fixture(), alias_map=alias)["nodes"]
    return nodes.map_batches(_flat({
        "gene_id": _c("id"),
        "chr": _p("chr"),
        "start": _p("start", "int64"),
        "end": _p("end", "int64"),
        "gene_name": _p("gene_name"),
        "gene_type": _p("gene_type"),
        "synonyms": ((lambda df, props:
                      [";".join(p.get("synonyms", [])) for p in props]),
                     None),
    }), batch_format="pandas")


def q_gencode_transcripts(sf_dir: str):
    """GTF transcript nodes (gencode_adapter.py:55-96: ENST version
    strip, name/coords props)."""
    from biocypher_metta_ray.kg.extractors import gtf_transcript_extractor

    nodes = gtf_transcript_extractor(_gtf_fixture())["nodes"]
    return nodes.map_batches(_flat({
        "transcript_id": _c("id"),
        "chr": _p("chr"),
        "start": _p("start", "int64"),
        "end": _p("end", "int64"),
        "transcript_name": _p("transcript_name"),
    }), batch_format="pandas")


def q_gencode_transcribed_to(sf_dir: str):
    """gene->transcript ``transcribed_to`` edges, the reference's
    type-driven direction switch (gencode_adapter.py:122-131)."""
    from biocypher_metta_ray.kg.extractors import gtf_transcript_extractor

    edges = gtf_transcript_extractor(
        _gtf_fixture(), direction="transcribed_to")["edges"]
    return edges.map_batches(_flat({
        "subj": _c("subj"), "pred": _c("pred"), "obj": _c("obj"),
    }), batch_format="pandas")


def q_gencode_exons(sf_dir: str):
    """GTF exon nodes (gencode_exon_adapter.py:42-74: exon id version
    strip; transcript_id kept UNstripped, exon_number as string)."""
    from biocypher_metta_ray.kg.extractors import gtf_exon_extractor

    nodes = gtf_exon_extractor(_gtf_fixture())["nodes"]
    return nodes.map_batches(_flat({
        "exon_id": _c("id"),
        "chr": _p("chr"),
        "start": _p("start", "int64"),
        "end": _p("end", "int64"),
        "gene_id": _p("gene_id"),
        "transcript_id": _p("transcript_id"),
        "exon_number": _p("exon_number"),
    }), batch_format="pandas")


# ---------------------------------------------------------------------------
# UniProt SwissProt family (uniprot_protein_adapter.py, uniprot_adapter.py)
# ---------------------------------------------------------------------------

def _swissprot_fixture() -> str:
    """80 flat-file records; even i carry an Ensembl dbxref (the edge
    source), odd i only RefSeq; every record has two AC accessions
    (first wins, uniprot_protein_adapter.py:46-50)."""
    path = f"{FIX}/swissprot.dat"
    if os.path.exists(path):
        return path
    recs = []
    for i in range(80):
        lines = [
            f"ID   NAME{i}_HUMAN            Reviewed;         100 AA.",
            f"AC   P{i:05d}; Q{i:05d};",
            f"DE   RecName: Full=Protein {i};",
        ]
        if i % 2 == 0:
            lines.append(f"DR   Ensembl; ENST{i:011d}.{1 + i % 4}; x.")
        lines.append(f"DR   RefSeq; NP_{i:06d}; x.")
        lines.append("//")
        recs.append("\n".join(lines))
    return _write_once(path, "\n".join(recs) + "\n")


def q_uniprot_proteins(sf_dir: str):
    """SwissProt protein nodes: first accession, RecName, sorted
    dbxref synonyms (uniprot_protein_adapter.py:26-62)."""
    from biocypher_metta_ray.kg.extractors import swissprot_extractor

    nodes = swissprot_extractor(_swissprot_fixture())["nodes"]
    return nodes.map_batches(_flat({
        "accession": _c("id"),
        "protein_name": _p("protein_name"),
        "synonyms": ((lambda df, props:
                      [";".join(p.get("synonyms", [])) for p in props]),
                     None),
    }), batch_format="pandas")


def q_uniprot_translates_to(sf_dir: str):
    """transcript->protein ``translates_to`` edges from Ensembl:ENST
    dbxrefs with version strip (uniprot_adapter.py:37-74)."""
    from biocypher_metta_ray.kg.extractors import swissprot_extractor

    edges = swissprot_extractor(
        _swissprot_fixture(), direction="translates_to")["edges"]
    return edges.map_batches(_flat({
        "subj": _c("subj"), "pred": _c("pred"), "obj": _c("obj"),
    }), batch_format="pandas")


# ---------------------------------------------------------------------------
# Reactome family (reactome_pathway_adapter.py, reactome_adapter.py)
# ---------------------------------------------------------------------------

def _reactome_pathways_fixture() -> str:
    path = f"{FIX}/reactome_pathways.tsv"
    rows = []
    for i in range(150):
        species = "Mus musculus" if i % 3 == 0 else "Homo sapiens"
        rows.append(f"R-HSA-{1000 + i}\tPathway {i}\t{species}")
    return _write_once(path, "\n".join(rows) + "\n")


def q_reactome_pathways(sf_dir: str):
    """Pathway list nodes with the Homo-sapiens species filter
    (reactome_pathway_adapter.py:40-51)."""
    from biocypher_metta_ray.kg.extractors import pathway_list_extractor

    nodes = pathway_list_extractor(_reactome_pathways_fixture())["nodes"]
    return nodes.map_batches(_flat({
        "id": _c("id"),
        "pathway_name": _p("pathway_name"),
    }), batch_format="pandas")


def _reactome_gp_fixture() -> str:
    path = f"{FIX}/reactome_gp.tsv"
    rows = []
    for i in range(200):
        pref = "R-HSA" if i % 4 != 0 else "R-MMU"
        rows.append(f"ENSG{i:011d}.{1 + i % 5}\t{pref}-{2000 + i % 40}")
    return _write_once(path, "\n".join(rows) + "\n")


def q_reactome_genes_pathways(sf_dir: str):
    """gene->pathway edges: ENSG version strip + R-HSA prefix filter
    (reactome_adapter.py:48-62)."""
    from biocypher_metta_ray.kg.extractors import reactome_extractor

    edges = reactome_extractor(
        _reactome_gp_fixture(), label="genes_pathways")["edges"]
    return edges.map_batches(_flat({
        "subj": _c("subj"), "pred": _c("pred"), "obj": _c("obj"),
    }), batch_format="pandas")


# ---------------------------------------------------------------------------
# GAF (gaf_adapter.py)
# ---------------------------------------------------------------------------

def _gaf_fixture() -> str:
    path = f"{FIX}/annotations.gaf"
    rows = ["!gaf-version: 2.2", "! generated fixture"]
    quals = ["enables", "involved_in"]
    evs = ["IEA", "IDA", "EXP"]
    for i in range(180):
        go = f"GO:{i % 30:07d}" if i % 6 != 0 else "NOT_GO"
        rows.append("\t".join([
            "UniProtKB", f"P{i:05d}", f"SYM{i}", quals[i % 2], go,
            f"PMID:{3000 + i}", evs[i % 3], "", "F",
        ]))
    return _write_once(path, "\n".join(rows) + "\n")


def q_gaf_edges(sf_dir: str):
    """GO->gene-product edges with qualifier/evidence props; '!'
    comments and non-GO ids drop (gaf_adapter.py:82-103)."""
    from biocypher_metta_ray.kg.extractors import gaf_extractor

    edges = gaf_extractor(_gaf_fixture())["edges"]
    return edges.map_batches(_flat({
        "subj": _c("subj"), "pred": _c("pred"), "obj": _c("obj"),
        "qualifier": _p("qualifier"),
        "evidence": _p("evidence"),
    }), batch_format="pandas")


# ---------------------------------------------------------------------------
# CoXPresDB keyed dir (coxpresdb_adapter.py)
# ---------------------------------------------------------------------------

def _coexp_fixture() -> str:
    d = f"{FIX}/coexp"
    _ensure_dir(d)
    for g in range(12):
        path = f"{d}/{100 + g}"
        if os.path.exists(path):
            continue
        lines = [f"{100 + (g * 7 + j) % 60} {(g + j) / 10}"
                 for j in range(25)]
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
    return d


def q_coexpression_edges(sf_dir: str):
    """Per-gene-file coexpression edges; entrez->ensembl map applied
    to BOTH endpoints with drop-on-miss (coxpresdb_adapter.py:34-47)."""
    from biocypher_metta_ray.kg.extractors import coexpression_extractor

    id_map = {str(100 + k): f"ENSG{k:03d}"
              for k in range(60) if k % 5 != 0}
    edges = coexpression_extractor(_coexp_fixture(), id_map=id_map)["edges"]
    return edges.map_batches(_flat({
        "subj": _c("subj"), "pred": _c("pred"), "obj": _c("obj"),
        "score": _p("score", "float64"),
    }), batch_format="pandas")


# ---------------------------------------------------------------------------
# TSV-edge family: tflink / string_ppi / refseq_closest_gene
# ---------------------------------------------------------------------------

def _tflink_fixture() -> str:
    path = f"{FIX}/tflink.tsv"
    rows = ["Name\tTF.Entrez\tTarget.Entrez\tDetection\tPubMed"]
    for i in range(150):
        pub = f"{1000 + i};{2000 + i}" if i % 4 != 0 else f"{1000 + i}"
        rows.append(f"N{i}\t{i % 20}\t{(i * 3) % 50}\tchip\t{pub}")
    return _write_once(path, "\n".join(rows) + "\n")


def q_tflink_edges(sf_dir: str):
    """TF->gene edges: entrez->ensembl maps both sides + pubmed
    evidence-list explode (tflink_adapter.py:42-54)."""
    from biocypher_metta_ray.kg.extractors import tsv_edge_extractor

    emap = {str(k): f"ENSG{k:05d}" for k in range(50) if k % 7 != 0}
    edges = tsv_edge_extractor(
        _tflink_fixture(), pred="tf_gene", subj_col=1, obj_col=2,
        subj_map=emap, obj_map=emap, evidence_col=4, skip_header=True,
    )["edges"]
    return edges.map_batches(_flat({
        "subj": _c("subj"), "pred": _c("pred"), "obj": _c("obj"),
        "evidence": ((lambda df, props:
                      [";".join(p.get("evidence", [])) for p in props]),
                     None),
    }), batch_format="pandas")


def _string_ppi_fixture() -> str:
    path = f"{FIX}/string_ppi.txt"
    rows = ["protein1 protein2 combined_score"]
    for i in range(120):
        rows.append(
            f"9606.ENSP{i:011d} 9606.ENSP{(i * 7) % 80:011d} {(i * 13) % 1000}"
        )
    return _write_once(path, "\n".join(rows) + "\n")


def q_string_ppi_edges(sf_dir: str):
    """PPI edges: '9606.' prefix strip, ensembl->uniprot maps both
    sides, score/1000 normalize (string_ppi_adapter.py:42-52)."""
    from biocypher_metta_ray.kg.extractors import tsv_edge_extractor

    pmap = {f"ENSP{k:011d}": f"P{k:05d}"
            for k in range(120) if k % 3 != 0}
    edges = tsv_edge_extractor(
        _string_ppi_fixture(), pred="interacts_with", subj_col=0,
        obj_col=1, sep=" ", score_col=2, score_scale=1 / 1000,
        subj_map=pmap, obj_map=pmap,
        subj_prefix_strip="9606.", obj_prefix_strip="9606.",
        skip_header=True,
    )["edges"]
    return edges.map_batches(_flat({
        "subj": _c("subj"), "pred": _c("pred"), "obj": _c("obj"),
        "score": _p("score", "float64"),
    }), batch_format="pandas")


def _refseq_fixture() -> str:
    path = f"{FIX}/refseq_closest.tsv"
    rows = []
    for i in range(140):
        rows.append(
            f"rs{i}\tchr{1 + i % 5}\t{9000 + 21 * i}\tHGNC{i % 15}"
            f"\t{(i * 37) % 5000}"
        )
    return _write_once(path, "\n".join(rows) + "\n")


def q_refseq_closest_gene(sf_dir: str):
    """variant->closest-gene edges with hgnc->ensembl obj map and
    distance score (refseq_closest_gene_adapter.py:44-49)."""
    from biocypher_metta_ray.kg.extractors import tsv_edge_extractor

    hmap = {f"HGNC{k}": f"ENSG{k:05d}" for k in range(15) if k % 4 != 0}
    edges = tsv_edge_extractor(
        _refseq_fixture(), pred="closest_gene", subj_col=0, obj_col=3,
        obj_map=hmap, score_col=4,
    )["edges"]
    return edges.map_batches(_flat({
        "subj": _c("subj"), "pred": _c("pred"), "obj": _c("obj"),
        "distance": _p("score", "float64"),
    }), batch_format="pandas")


# ---------------------------------------------------------------------------
# TADMap mini-grammar (tadmap_adapter.py)
# ---------------------------------------------------------------------------

def _tadmap_fixture() -> str:
    path = f"{FIX}/tadmap.csv"
    rows = ["loc_info,genes"]
    for i in range(90):
        loc = f"chr{1 + i % 4}|{1000 + 50 * i}|{1300 + 50 * i}"
        if i % 5 == 0:
            genes = "bad"  # malformed entry -> empty genes list
        else:
            genes = (f"x|gene:ENSG{i:05d}|extra;"
                     f"x|gene:ENSG{i + 1:05d}|extra")
        rows.append(f"{loc},{genes}")
    return _write_once(path, "\n".join(rows) + "\n")


def q_tadmap_nodes(sf_dir: str):
    """TAD nodes from the '|'/';' mini-grammar; malformed gene entries
    skip to an empty list (tadmap_adapter.py:43-79)."""
    from biocypher_metta_ray.kg.regulatory import tadmap_extractor

    nodes = tadmap_extractor(_tadmap_fixture())["nodes"]
    return nodes.map_batches(_flat({
        "id": _c("id"),
        "chr": _p("chr"),
        "start": _p("start", "int64"),
        "end": _p("end", "int64"),
        "genes": ((lambda df, props:
                   [";".join(p.get("genes", [])) for p in props]), None),
    }), batch_format="pandas")


# ---------------------------------------------------------------------------
# GTEx eQTL per-tissue dir (gtex_eqtl_adapter.py)
# ---------------------------------------------------------------------------

def _gtex_fixture() -> str:
    d = f"{FIX}/gtex"
    _ensure_dir(d)
    header = "\t".join(f"c{k}" for k in range(29))
    for t in range(3):
        path = f"{d}/T{t}.v8.egenes.txt.gz"
        if os.path.exists(path):
            continue
        rows = [header]
        for j in range(60):
            cols = ["x"] * 29
            cols[0] = f"ENSG{j:05d}.{1 + j % 3}"
            asm = "b38" if j % 6 != 0 else "b37"
            cols[11] = f"chr{1 + j % 3}_{5000 + j}_A_G_{asm}"
            cols[18] = f"rs{t}_{j}"
            cols[21] = f"{(j % 50) / 100}"
            cols[24] = f"{(j - 30) / 10}"
            cols[27] = f"{(j + 1) / 1000}"
            cols[28] = f"{(j + 2) / 1000}"
            rows.append("\t".join(cols))
        with gzip.open(path, "wt") as f:
            f.write("\n".join(rows) + "\n")
    return d


def q_gtex_eqtl_edges(sf_dir: str):
    """Per-tissue variant->gene eQTL edges: tissue from the FILE NAME
    via the ontology map (unmapped tissues skip the whole file),
    non-b38 variant rows drop, ENSG version strip, to_float props
    (gtex_eqtl_adapter.py:57-95)."""
    from biocypher_metta_ray.kg.regulatory import gtex_eqtl_extractor

    tmap = {"T0": "UBERON:90", "T1": "UBERON:91"}
    edges = gtex_eqtl_extractor(_gtex_fixture(), tmap)["edges"]
    return edges.map_batches(_flat({
        "subj": _c("subj"), "pred": _c("pred"), "obj": _c("obj"),
        "maf": _p("maf", "float64"),
        "slope": _p("slope", "float64"),
        "p_value": _p("p_value", "float64"),
        "q_value": _p("q_value", "float64"),
        "biological_context": _p("biological_context"),
    }), batch_format="pandas")


# ---------------------------------------------------------------------------
# HOCOMOCO PWM-per-file (hocomoco_motif_adapter.py)
# ---------------------------------------------------------------------------

def _hocomoco_fixture() -> str:
    d = f"{FIX}/hocomoco"
    _ensure_dir(d)
    for i in range(30):
        path = f"{d}/M{i}.pwm"
        if os.path.exists(path):
            continue
        length = 4 + i % 3
        lines = [f"> M{i}"]
        for r in range(length):
            lines.append("\t".join(
                str((i * 7 + r * 4 + c) / 10) for c in range(4)
            ))
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
    return d


def q_hocomoco_motifs(sf_dir: str):
    """Motif nodes keyed by the model TF's ensembl id; models whose
    TF or ensembl mapping misses drop (hocomoco_motif_adapter.py:
    49-77). PWM columns flatten to (length, sum) so the oracle can
    recompute them in closed form."""
    from biocypher_metta_ray.kg.regulatory import hocomoco_extractor

    mt = {f"M{i}": f"TF{i % 10}" for i in range(30) if i % 3 != 0}
    he = {f"TF{t}": f"ENSGTF{t:03d}" for t in range(10) if t % 4 != 0}
    nodes = hocomoco_extractor(_hocomoco_fixture(), mt, he)["nodes"]
    return nodes.map_batches(_flat({
        "id": _c("id"),
        "tf_name": _p("tf_name"),
        "length": _p("length", "int64"),
        "pwm_a_sum": ((lambda df, props:
                       [float(sum(p.get("pwm_A", []))) for p in props]),
                      "float64"),
    }), batch_format="pandas")


# ---------------------------------------------------------------------------
# Roadmap rsid-index dir (roadmap_adapter.py)
# ---------------------------------------------------------------------------

def _roadmap_fixture() -> tuple[str, dict]:
    d = f"{FIX}/roadmap"
    _ensure_dir(d)
    header = "rsid,dataset,cell,tissue,datatype"
    for part in range(2):
        path = f"{d}/part{part}.csv"
        if os.path.exists(path):
            continue
        rows = [header]
        for i in range(100 * part, 100 * (part + 1)):
            dt = "DNase" if i % 2 == 0 else "H3K27ac"
            rows.append(f"rs{i},DS{i % 3},CELL{i % 6},TIS{i % 5},{dt}")
        with open(path, "w") as f:
            f.write("\n".join(rows) + "\n")
    index = {f"rs{i}": (f"chr{1 + i % 5}", 7000 + 11 * i)
             for i in range(200) if i % 3 != 0}
    return d, index


def q_roadmap_nodes(sf_dir: str):
    """Regulatory-region nodes: rsid-index probe (drop-on-miss) +
    tissue ontology map (roadmap_adapter.py:50-86)."""
    from biocypher_metta_ray.kg.regulatory import roadmap_extractor

    d, index = _roadmap_fixture()
    tmap = {f"TIS{m}": f"CL:000{m}" for m in range(4)}
    nodes = roadmap_extractor(d, index, tmap)["nodes"]
    return nodes.map_batches(_flat({
        "rsid": _c("id"),
        "cell": _p("cell"),
        "biological_context": _p("biological_context"),
        "biochemical_activity": _p("biochemical_activity"),
    }), batch_format="pandas")


# ---------------------------------------------------------------------------
# ABC edges (abc_adapter.py)
# ---------------------------------------------------------------------------

def _abc_fixture() -> tuple[str, dict]:
    path = f"{FIX}/abc.csv"
    if not os.path.exists(path):
        header = ",".join(f"c{k}" for k in range(28))
        rows = [header]
        for i in range(180):
            cols = ["x"] * 28
            cols[0] = f"rs{i}"
            cols[1] = f"chr{1 + i % 5}"
            cols[10] = f" HGNC{i % 12}"  # .strip() applied by the parser
            cols[24] = str(i % 90)
            cols[27] = f"CT{i % 6}"
            rows.append(",".join(cols))
        _write_once(path, "\n".join(rows) + "\n")
    index = {f"rs{i}": (f"chr{1 + i % 5}", 40000 + 7 * i)
             for i in range(180) if i % 3 != 0}
    return path, index


def q_abc_edges(sf_dir: str):
    """ABC regulatory_region->gene edges: rsid index probe, hgnc map,
    tissue map — all drop-on-miss; score kept as the raw string
    (abc_adapter.py:64-100)."""
    from biocypher_metta_ray.kg.regulatory import abc_extractor

    path, index = _abc_fixture()
    he = {f"HGNC{k}": f"ENSG{k:05d}" for k in range(12) if k % 5 != 0}
    tmap = {f"CT{m}": f"CL:11{m}" for m in range(4)}
    edges = abc_extractor(path, index, he, tmap)["edges"]
    return edges.map_batches(_flat({
        "subj": _c("subj"), "pred": _c("pred"), "obj": _c("obj"),
        "score": _p("score"),
        "biological_context": _p("biological_context"),
    }), batch_format="pandas")


# ---------------------------------------------------------------------------
# dbSNP / dbVar VCF family (dbsnp_adapter.py, dbvar_adapter.py)
# ---------------------------------------------------------------------------

def _dbsnp_fixture() -> str:
    path = f"{FIX}/dbsnp.vcf"
    rows = ["##fileformat=VCFv4.2",
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"]
    bases = "ACGT"
    for i in range(160):
        vc = "SNV" if i % 2 == 0 else "INDEL"
        rows.append(
            f"{1 + i % 22}\t{10000 + 13 * i}\trs{i}\t{bases[i % 4]}\t"
            f"{bases[(i + 1) % 4]}\t.\t.\tVC={vc};"
            f"CAF=0.{i % 10},0.{(i + 1) % 10}"
        )
    return _write_once(path, "\n".join(rows) + "\n")


def q_dbsnp_nodes(sf_dir: str):
    """dbSNP variant nodes: '#' skip, 'chr'+chr normalize, INFO k=v
    extraction (dbsnp_adapter.py:25-63)."""
    from biocypher_metta_ray.kg.extractors import vcf_variant_extractor

    nodes = vcf_variant_extractor(_dbsnp_fixture())["nodes"]
    return nodes.map_batches(_flat({
        "rsid": _c("id"),
        "chr": _p("chr"),
        "pos": _p("pos", "int64"),
        "ref": _p("ref"),
        "alt": _p("alt"),
        "VC": _p("VC"),
        "CAF": _p("CAF"),
    }), batch_format="pandas")


def _dbvar_fixture() -> str:
    path = f"{FIX}/dbvar.vcf"
    rows = ["##fileformat=VCFv4.2",
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"]
    alts = ["<DEL>", "<DUP>", "<INS>", "<INV>", "<CNV>", "<BND>"]
    for i in range(150):
        pos = 3000 + 17 * i
        rows.append(
            f"{1 + i % 10}\t{pos}\tnsv{i}\tN\t{alts[i % 6]}\t.\t.\t"
            f"END={pos + 100 + i};SVTYPE=x"
        )
    return _write_once(path, "\n".join(rows) + "\n")


def q_dbvar_nodes(sf_dir: str):
    """Structural-variant nodes: ALT-symbol enum map (unknown symbols
    drop) + END= extraction (dbvar_adapter.py:12,37-48)."""
    from biocypher_metta_ray.kg.extractors import vcf_sv_extractor

    nodes = vcf_sv_extractor(_dbvar_fixture())["nodes"]
    return nodes.map_batches(_flat({
        "id": _c("id"),
        "chr": _p("chr"),
        "start": _p("start", "int64"),
        "end": _p("end", "int64"),
        "variant_type": _p("variant_type"),
    }), batch_format="pandas")


# ---------------------------------------------------------------------------
# DGV BED regions (dgv_variant_adapter.py)
# ---------------------------------------------------------------------------

def _dgv_fixture() -> str:
    path = f"{FIX}/dgv.tsv"
    rows = []
    for i in range(130):
        rows.append(
            f"chr{1 + i % 8}\t{400 + 20 * i}\t{900 + 20 * i}\tdgv{i}"
        )
    return _write_once(path, "\n".join(rows) + "\n")


def q_dgv_nodes(sf_dir: str):
    """DGV region nodes: 0->1-based +1 shift and composite region id
    (dgv_variant_adapter.py:36-40)."""
    from biocypher_metta_ray.kg.extractors import bed_region_extractor

    nodes = bed_region_extractor(
        _dgv_fixture(), label="structural_variant", one_based=True
    )["nodes"]
    return nodes.map_batches(_flat({
        "id": _c("id"),
        "chr": _p("chr"),
        "start": _p("start", "int64"),
        "end": _p("end", "int64"),
        "name": _p("name"),
    }), batch_format="pandas")


# ---------------------------------------------------------------------------
# EPD promoter->gene (epd_adapter.py)
# ---------------------------------------------------------------------------

def _epd_fixture() -> str:
    path = f"{FIX}/epd.bed"
    rows = []
    for i in range(110):
        rows.append(
            f"chr{1 + i % 5} {700 + 30 * i} {1100 + 30 * i} GENE{i % 25}_1"
        )
    return _write_once(path, "\n".join(rows) + "\n")


def q_epd_promoter_gene(sf_dir: str):
    """promoter->gene edges: +1-shifted region id as subject, NAME_1
    -> NAME strip, hgnc->ensembl broadcast with drop-on-miss
    (epd_adapter.py:61-69)."""
    import ray as _ray

    from biocypher_metta_ray.kg.extractors import bed_region_extractor

    hmap = {f"GENE{k}": f"ENSG{k:04d}" for k in range(25) if k % 6 != 0}
    href = _ray.put(hmap)
    nodes = bed_region_extractor(
        _epd_fixture(), label="promoter", one_based=True)["nodes"]

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        hm = _ray.get(href)
        props = [json.loads(p) for p in df["props_json"]]
        name = pd.Series([p.get("name") or "" for p in props],
                         index=df.index)
        gene = name.str.rsplit("_", n=1).str[0].map(hm)
        ok = gene.notna()
        return pd.DataFrame({
            "subj": df["id"][ok].astype(str),
            "pred": "promoter_gene",
            "obj": gene[ok].astype(str),
        })

    return nodes.map_batches(to_edges, batch_format="pandas")


# ---------------------------------------------------------------------------
# dbSuper liftover flow (dbsuper_adapter.py)
# ---------------------------------------------------------------------------

def _dbsuper_fixture() -> tuple[str, dict]:
    path = f"{FIX}/dbsuper.tsv"
    rows = ["chrom\tstart\tend\tse_id\tgene\tcell"]
    for i in range(170):
        rows.append(
            f"chr{1 + i % 5}\t{2000 + 10 * i}\t{2400 + 10 * i}\tSE_{i}\t"
            f"GENE{i % 9}\tCELL{i % 7}"
        )
    _write_once(path, "\n".join(rows) + "\n")
    # single full-coverage segment per chromosome, offset 1000*c;
    # chr5 is an unmapped gap (lift fails -> row drops)
    chain = {
        f"chr{c}": (np.array([0], dtype=np.int64),
                    np.array([1000 * c], dtype=np.int64),
                    np.array([c != 5], dtype=bool))
        for c in range(1, 6)
    }
    return path, chain


def q_dbsuper_edges(sf_dir: str):
    """super_enhancer->gene edges with hg19->hg38 liftover of the
    +1-shifted coordinates (failed lifts drop), hgnc + cell maps
    drop-on-miss (dbsuper_adapter.py:39-95)."""
    from biocypher_metta_ray.kg.regulatory import dbsuper_extractor

    path, chain = _dbsuper_fixture()
    tmap = {f"CELL{m}": f"UBERON:1{m}" for m in range(5)}
    he = {f"GENE{g}": f"ENSG{g:04d}" for g in range(9) if g % 4 != 0}
    edges = dbsuper_extractor(path, chain, tmap, he)["edges"]
    return edges.map_batches(_flat({
        "subj": _c("subj"), "pred": _c("pred"), "obj": _c("obj"),
        "biological_context": _p("biological_context"),
    }), batch_format="pandas")


# ---------------------------------------------------------------------------
# EnhancerAtlas compound key (enhancer_atlas_adapter.py)
# ---------------------------------------------------------------------------

def _enhancer_atlas_fixture() -> tuple[str, str]:
    bed = f"{FIX}/ea_enhancers.bed"
    rows = [f"chr{1 + i % 3}\t{1000 + 50 * i}\t{1200 + 50 * i}"
            for i in range(60)]
    _write_once(bed, "\n".join(rows) + "\n")
    d = f"{FIX}/ea_ep"
    _ensure_dir(d)
    for t in range(3):
        path = f"{d}/E{t}_EP.txt"
        if os.path.exists(path):
            continue
        lines = []
        for j in range(50):
            key = (f"chr{1 + j % 3}:{1000 + 50 * j}-{1200 + 50 * j}"
                   f"_ENSG{j:05d}$SYM{j}$x")
            lines.append(f"{key}\t{(j % 37) / 10}")
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
    return bed, d


def q_enhancer_atlas_edges(sf_dir: str):
    """enhancer->gene edges from the ``chr:start-end_GENE$...``
    compound key with the +1 shift; per-tissue files, unmapped tissues
    skip whole files (enhancer_atlas_adapter.py:47-105)."""
    from biocypher_metta_ray.kg.regulatory import enhancer_atlas_extractor

    bed, d = _enhancer_atlas_fixture()
    tmap = {"E0": "UBERON:70", "E1": "UBERON:71"}
    edges = enhancer_atlas_extractor(bed, d, tmap)["edges"]
    return edges.map_batches(_flat({
        "subj": _c("subj"), "pred": _c("pred"), "obj": _c("obj"),
        "biological_context": _p("biological_context"),
        "score": _p("score", "float64"),
    }), batch_format="pandas")


# ---------------------------------------------------------------------------
# TopLD pos->rsid both endpoints (topld_adapter.py)
# ---------------------------------------------------------------------------

def _topld_fixture() -> tuple[str, dict]:
    path = f"{FIX}/topld.csv"
    rows = ["SNP1,SNP2,R2,Dprime,+/-corr"]
    for i in range(200):
        p1 = 10000 + 10 * i
        p2 = 10000 + 10 * ((i * 3) % 200)
        r2 = f"0.{50 + i % 50}"
        sign = "-" if i % 2 else "+"
        rows.append(f"{p1},{p2},{r2},{(i % 100) / 100},{sign}")
    _write_once(path, "\n".join(rows) + "\n")
    index = {f"chr9_{10000 + 10 * k}": f"rs{10000 + 10 * k}"
             for k in range(200) if k % 7 != 0}
    return path, index


def q_topld_edges(sf_dir: str):
    """in_ld_with edges: BOTH positions resolve via the pos->rsid
    index (either miss drops the row), signed r2 composed from the
    corr sign char, |r2| >= cutoff filter (topld_adapter.py:35-70)."""
    from biocypher_metta_ray.kg.regulatory import topld_extractor

    path, index = _topld_fixture()
    edges = topld_extractor(path, index, chrom="chr9",
                            ancestry="SAS", cutoff=0.8)["edges"]
    return edges.map_batches(_flat({
        "subj": _c("subj"), "pred": _c("pred"), "obj": _c("obj"),
        "r2": _p("r2", "float64"),
        "d_prime": _p("d_prime", "float64"),
        "ancestry": _p("ancestry"),
    }), batch_format="pandas")


# ---------------------------------------------------------------------------
# FAVOR wide CSV (favor_adapter.py)
# ---------------------------------------------------------------------------

def _favor_fixture() -> str:
    path = f"{FIX}/favor.csv"
    bases = "ACGT"
    rows = []
    for i in range(160):
        v1 = "." if i % 4 == 0 else f"{(i % 70) / 7}"
        v2 = f"{(i % 35) / 5}"
        v3 = "." if i % 6 == 0 else f"{(i % 11) / 4}"
        rows.append(
            f"{1 + i % 22},{5000 + 3 * i},{bases[i % 4]},"
            f"{bases[(i + 2) % 4]},x,{v1},x,{v2},x,{v3}"
        )
    return _write_once(path, "\n".join(rows) + "\n")


def q_favor_nodes(sf_dir: str):
    """FAVOR wide-CSV variant nodes: positional projection, '.'->0 +
    to_float cleanup, composite variant id, nested annotation dict
    (favor_adapter.py:27-122) flattened to typed columns."""
    from biocypher_metta_ray.kg.extractors import wide_variant_extractor

    nodes = wide_variant_extractor(
        _favor_fixture(),
        fields={"chr": 0, "pos": 1, "ref": 2, "alt": 3},
        annotation_fields={"apc_conservation": 5, "cadd_raw": 7,
                           "linsight": 9},
    )["nodes"]

    def ann(key):
        return ((lambda df, props:
                 [float(p["annotation"][key]) for p in props]), "float64")

    return nodes.map_batches(_flat({
        "id": _c("id"),
        "chr": _p("chr"),
        "pos": _p("pos", "int64"),
        "ref": _p("ref"),
        "alt": _p("alt"),
        "apc_conservation": ann("apc_conservation"),
        "cadd_raw": ann("cadd_raw"),
        "linsight": ann("linsight"),
    }), batch_format="pandas")


ADAPTER_QUERIES = {
    "gencode_genes": q_gencode_genes,
    "gencode_transcripts": q_gencode_transcripts,
    "gencode_transcribed_to": q_gencode_transcribed_to,
    "gencode_exons": q_gencode_exons,
    "uniprot_proteins": q_uniprot_proteins,
    "uniprot_translates_to": q_uniprot_translates_to,
    "reactome_pathways": q_reactome_pathways,
    "reactome_genes_pathways": q_reactome_genes_pathways,
    "gaf_edges": q_gaf_edges,
    "coexpression_edges": q_coexpression_edges,
    "tflink_edges": q_tflink_edges,
    "string_ppi_edges": q_string_ppi_edges,
    "refseq_closest_gene": q_refseq_closest_gene,
    "tadmap_nodes": q_tadmap_nodes,
    "gtex_eqtl_edges": q_gtex_eqtl_edges,
    "hocomoco_motifs": q_hocomoco_motifs,
    "roadmap_nodes": q_roadmap_nodes,
    "abc_edges": q_abc_edges,
    "dbsnp_nodes": q_dbsnp_nodes,
    "dbvar_nodes": q_dbvar_nodes,
    "dgv_nodes": q_dgv_nodes,
    "epd_promoter_gene": q_epd_promoter_gene,
    "dbsuper_edges": q_dbsuper_edges,
    "enhancer_atlas_edges": q_enhancer_atlas_edges,
    "topld_edges": q_topld_edges,
    "favor_nodes": q_favor_nodes,
}


# ---------------------------------------------------------------------------
# DuckDB oracles: each regenerates the fixture rows AND the adapter
# computation (filters, maps, joins, arithmetic) from range().
# ---------------------------------------------------------------------------

ADAPTER_ORACLES = {
    "gencode_genes": """
        SELECT CASE WHEN i % 10 = 0
                    THEN printf('ENSG%011d_PAR_Y', i)
                    ELSE printf('ENSG%011d', i) END AS gene_id,
               'chr' || (1 + i % 5) AS chr,
               CAST(1000 + 100 * i AS BIGINT) AS "start",
               CAST(1999 + 100 * i AS BIGINT) AS "end",
               'GENE' || i AS gene_name,
               CASE WHEN i % 2 = 0 THEN 'protein_coding'
                    ELSE 'lncRNA' END AS gene_type,
               CASE WHEN i % 3 != 0
                    THEN 'GENE' || i || 'ALT;G' || i
                    ELSE '' END AS synonyms
        FROM (SELECT unnest(range(120)) AS i)
    """,
    "gencode_transcripts": """
        SELECT printf('ENST%011d', 2 * i + j) AS transcript_id,
               'chr' || (1 + i % 5) AS chr,
               CAST(1000 + 100 * i + 10 * j AS BIGINT) AS "start",
               CAST(1500 + 100 * i + 10 * j AS BIGINT) AS "end",
               'TX' || i || '-' || j AS transcript_name
        FROM (SELECT unnest(range(120)) AS i),
             (SELECT unnest(range(2)) AS j)
    """,
    "gencode_transcribed_to": """
        SELECT CASE WHEN i % 10 = 0
                    THEN printf('ENSG%011d_PAR_Y', i)
                    ELSE printf('ENSG%011d', i) END AS subj,
               'transcribed_to' AS pred,
               printf('ENST%011d', 2 * i + j) AS obj
        FROM (SELECT unnest(range(120)) AS i),
             (SELECT unnest(range(2)) AS j)
    """,
    "gencode_exons": """
        SELECT printf('ENSE%011d', 4 * i + 2 * j + k) AS exon_id,
               'chr' || (1 + i % 5) AS chr,
               CAST(1000 + 100 * i + 10 * j + k AS BIGINT) AS "start",
               CAST(1100 + 100 * i + 10 * j + k AS BIGINT) AS "end",
               CASE WHEN i % 10 = 0
                    THEN printf('ENSG%011d_PAR_Y', i)
                    ELSE printf('ENSG%011d', i) END AS gene_id,
               printf('ENST%011d.%d', 2 * i + j, 1 + j) AS transcript_id,
               CAST(k + 1 AS VARCHAR) AS exon_number
        FROM (SELECT unnest(range(120)) AS i),
             (SELECT unnest(range(2)) AS j),
             (SELECT unnest(range(2)) AS k)
    """,
    "uniprot_proteins": """
        SELECT printf('P%05d', i) AS accession,
               'Protein ' || i AS protein_name,
               CASE WHEN i % 2 = 0
                    THEN printf('Ensembl:ENST%011d.%d;RefSeq:NP_%06d',
                                i, 1 + i % 4, i)
                    ELSE printf('RefSeq:NP_%06d', i) END AS synonyms
        FROM (SELECT unnest(range(80)) AS i)
    """,
    "uniprot_translates_to": """
        SELECT printf('ENST%011d', i) AS subj,
               'translates_to' AS pred,
               printf('P%05d', i) AS obj
        FROM (SELECT unnest(range(80)) AS i)
        WHERE i % 2 = 0
    """,
    "reactome_pathways": """
        SELECT 'R-HSA-' || (1000 + i) AS id,
               'Pathway ' || i AS pathway_name
        FROM (SELECT unnest(range(150)) AS i)
        WHERE i % 3 != 0
    """,
    "reactome_genes_pathways": """
        SELECT printf('ENSG%011d', i) AS subj,
               'genes_pathways' AS pred,
               'R-HSA-' || (2000 + i % 40) AS obj
        FROM (SELECT unnest(range(200)) AS i)
        WHERE i % 4 != 0
    """,
    "gaf_edges": """
        SELECT printf('GO:%07d', i % 30) AS subj,
               'go_gene_product' AS pred,
               printf('P%05d', i) AS obj,
               CASE WHEN i % 2 = 0 THEN 'enables'
                    ELSE 'involved_in' END AS qualifier,
               CASE i % 3 WHEN 0 THEN 'IEA' WHEN 1 THEN 'IDA'
                    ELSE 'EXP' END AS evidence
        FROM (SELECT unnest(range(180)) AS i)
        WHERE i % 6 != 0
    """,
    "coexpression_edges": """
        SELECT printf('ENSG%03d', g) AS subj,
               'coexpressed_with' AS pred,
               printf('ENSG%03d', (g * 7 + j) % 60) AS obj,
               (g + j) / 10.0 AS score
        FROM (SELECT unnest(range(12)) AS g),
             (SELECT unnest(range(25)) AS j)
        WHERE g % 5 != 0 AND ((g * 7 + j) % 60) % 5 != 0
    """,
    "tflink_edges": """
        SELECT printf('ENSG%05d', i % 20) AS subj,
               'tf_gene' AS pred,
               printf('ENSG%05d', (i * 3) % 50) AS obj,
               CASE WHEN i % 4 != 0
                    THEN 'pubmed:' || (1000 + i) || ';pubmed:' || (2000 + i)
                    ELSE 'pubmed:' || (1000 + i) END AS evidence
        FROM (SELECT unnest(range(150)) AS i)
        WHERE (i % 20) % 7 != 0 AND ((i * 3) % 50) % 7 != 0
    """,
    "string_ppi_edges": """
        SELECT printf('P%05d', i) AS subj,
               'interacts_with' AS pred,
               printf('P%05d', (i * 7) % 80) AS obj,
               ((i * 13) % 1000) / 1000.0 AS score
        FROM (SELECT unnest(range(120)) AS i)
        WHERE i % 3 != 0 AND ((i * 7) % 80) % 3 != 0
    """,
    "refseq_closest_gene": """
        SELECT 'rs' || i AS subj,
               'closest_gene' AS pred,
               printf('ENSG%05d', i % 15) AS obj,
               CAST((i * 37) % 5000 AS DOUBLE) AS distance
        FROM (SELECT unnest(range(140)) AS i)
        WHERE (i % 15) % 4 != 0
    """,
    "tadmap_nodes": """
        SELECT 'chr' || (1 + i % 4) || '_' || (1000 + 50 * i) || '_'
                   || (1300 + 50 * i) || '_GRCh38' AS id,
               'chr' || (1 + i % 4) AS chr,
               CAST(1000 + 50 * i AS BIGINT) AS "start",
               CAST(1300 + 50 * i AS BIGINT) AS "end",
               CASE WHEN i % 5 = 0 THEN ''
                    ELSE printf('ENSG%05d;ENSG%05d', i, i + 1)
                    END AS genes
        FROM (SELECT unnest(range(90)) AS i)
    """,
    "gtex_eqtl_edges": """
        SELECT 'rs' || t || '_' || j AS subj,
               'gtex_variant_gene' AS pred,
               printf('ENSG%05d', j) AS obj,
               (j % 50) / 100.0 AS maf,
               (j - 30) / 10.0 AS slope,
               (j + 1) / 1000.0 AS p_value,
               (j + 2) / 1000.0 AS q_value,
               'UBERON:9' || t AS biological_context
        FROM (SELECT unnest(range(2)) AS t),
             (SELECT unnest(range(60)) AS j)
        WHERE j % 6 != 0
    """,
    "hocomoco_motifs": """
        SELECT printf('ENSGTF%03d', i % 10) AS id,
               'TF' || (i % 10) AS tf_name,
               CAST(4 + i % 3 AS BIGINT) AS length,
               (7 * i * (4 + i % 3)
                + 2 * (4 + i % 3) * (3 + i % 3)) / 10.0 AS pwm_a_sum
        FROM (SELECT unnest(range(30)) AS i)
        WHERE i % 3 != 0 AND (i % 10) % 4 != 0
    """,
    "roadmap_nodes": """
        SELECT 'rs' || i AS rsid,
               'CELL' || (i % 6) AS cell,
               'CL:000' || (i % 5) AS biological_context,
               CASE WHEN i % 2 = 0 THEN 'DNase'
                    ELSE 'H3K27ac' END AS biochemical_activity
        FROM (SELECT unnest(range(200)) AS i)
        WHERE i % 3 != 0 AND i % 5 <= 3
    """,
    "abc_edges": """
        SELECT 'rs' || i AS subj,
               'regulatory_region_gene' AS pred,
               printf('ENSG%05d', i % 12) AS obj,
               CAST(i % 90 AS VARCHAR) AS score,
               'CL:11' || (i % 6) AS biological_context
        FROM (SELECT unnest(range(180)) AS i)
        WHERE i % 3 != 0 AND (i % 12) % 5 != 0 AND i % 6 <= 3
    """,
    "dbsnp_nodes": """
        SELECT 'rs' || i AS rsid,
               'chr' || (1 + i % 22) AS chr,
               CAST(10000 + 13 * i AS BIGINT) AS pos,
               substr('ACGT', CAST(i % 4 AS INT) + 1, 1) AS ref,
               substr('ACGT', CAST((i + 1) % 4 AS INT) + 1, 1) AS alt,
               CASE WHEN i % 2 = 0 THEN 'SNV' ELSE 'INDEL' END AS VC,
               '0.' || (i % 10) || ',0.' || ((i + 1) % 10) AS CAF
        FROM (SELECT unnest(range(160)) AS i)
    """,
    "dbvar_nodes": """
        SELECT 'nsv' || i AS id,
               'chr' || (1 + i % 10) AS chr,
               CAST(3000 + 17 * i AS BIGINT) AS "start",
               CAST(3000 + 17 * i + 100 + i AS BIGINT) AS "end",
               CASE i % 6 WHEN 0 THEN 'deletion'
                    WHEN 1 THEN 'duplication' WHEN 2 THEN 'insertion'
                    WHEN 3 THEN 'inversion'
                    ELSE 'copy number variation' END AS variant_type
        FROM (SELECT unnest(range(150)) AS i)
        WHERE i % 6 != 5
    """,
    "dgv_nodes": """
        SELECT 'chr' || (1 + i % 8) || '_' || (401 + 20 * i) || '_'
                   || (901 + 20 * i) || '_GRCh38' AS id,
               'chr' || (1 + i % 8) AS chr,
               CAST(401 + 20 * i AS BIGINT) AS "start",
               CAST(901 + 20 * i AS BIGINT) AS "end",
               'dgv' || i AS name
        FROM (SELECT unnest(range(130)) AS i)
    """,
    "epd_promoter_gene": """
        SELECT 'chr' || (1 + i % 5) || '_' || (701 + 30 * i) || '_'
                   || (1101 + 30 * i) || '_GRCh38' AS subj,
               'promoter_gene' AS pred,
               printf('ENSG%04d', i % 25) AS obj
        FROM (SELECT unnest(range(110)) AS i)
        WHERE (i % 25) % 6 != 0
    """,
    "dbsuper_edges": """
        SELECT 'chr' || (1 + i % 5) || '_'
                   || (2001 + 10 * i + 1000 * (1 + i % 5)) || '_'
                   || (2401 + 10 * i + 1000 * (1 + i % 5))
                   || '_GRCh38' AS subj,
               'super_enhancer_gene' AS pred,
               printf('ENSG%04d', i % 9) AS obj,
               'UBERON:1' || (i % 7) AS biological_context
        FROM (SELECT unnest(range(170)) AS i)
        WHERE i % 5 != 4 AND (i % 9) % 4 != 0 AND i % 7 <= 4
    """,
    "enhancer_atlas_edges": """
        SELECT 'chr' || (1 + j % 3) || '_' || (1001 + 50 * j) || '_'
                   || (1201 + 50 * j) || '_GRCh38' AS subj,
               'enhancer_gene' AS pred,
               printf('ENSG%05d', j) AS obj,
               'UBERON:7' || t AS biological_context,
               (j % 37) / 10.0 AS score
        FROM (SELECT unnest(range(2)) AS t),
             (SELECT unnest(range(50)) AS j)
    """,
    "topld_edges": """
        SELECT 'rs' || (10000 + 10 * i) AS subj,
               'in_ld_with' AS pred,
               'rs' || (10000 + 10 * ((i * 3) % 200)) AS obj,
               (CASE WHEN i % 2 = 1 THEN -1 ELSE 1 END)
                   * (50 + i % 50) / 100.0 AS r2,
               (i % 100) / 100.0 AS d_prime,
               'SAS' AS ancestry
        FROM (SELECT unnest(range(200)) AS i)
        WHERE i % 7 != 0 AND ((i * 3) % 200) % 7 != 0
              AND i % 50 >= 30
    """,
    "favor_nodes": """
        SELECT (1 + i % 22) || '_' || (5000 + 3 * i) || '_'
                   || substr('ACGT', CAST(i % 4 AS INT) + 1, 1) || '_'
                   || substr('ACGT', CAST((i + 2) % 4 AS INT) + 1, 1)
                   || '_GRCh38' AS id,
               CAST(1 + i % 22 AS VARCHAR) AS chr,
               CAST(5000 + 3 * i AS BIGINT) AS pos,
               substr('ACGT', CAST(i % 4 AS INT) + 1, 1) AS ref,
               substr('ACGT', CAST((i + 2) % 4 AS INT) + 1, 1) AS alt,
               CASE WHEN i % 4 = 0 THEN 0.0
                    ELSE (i % 70) / 7.0 END AS apc_conservation,
               (i % 35) / 5.0 AS cadd_raw,
               CASE WHEN i % 6 = 0 THEN 0.0
                    ELSE (i % 11) / 4.0 END AS linsight
        FROM (SELECT unnest(range(160)) AS i)
    """,
}


# ---------------------------------------------------------------------------
# Full-registry build config (VERDICT r4 task #4): one run_build over
# EVERY adapter family, mirroring the reference's
# config/adapters_config_sample.yaml flow (create_knowledge_graph.py:
# 49-72) with the formula fixtures above. tests/test_registry.py
# diffs the emitted MeTTa def lines against independently recomputed
# expectations (P/R = 1.0).
# ---------------------------------------------------------------------------

def _reactome_hier_fixture() -> str:
    path = f"{FIX}/reactome_hier.tsv"
    rows = []
    for i in range(100):
        pref = "R-HSA" if i % 5 != 0 else "R-MMU"
        rows.append(f"{pref}-{3000 + i % 30}\tR-HSA-{4000 + i}")
    return _write_once(path, "\n".join(rows) + "\n")


def _obo_fixture() -> str:
    path = f"{FIX}/go.obo"
    recs = ["format-version: 1.2", ""]
    for i in range(40):
        recs.append("[Term]")
        recs.append(f"id: GO:{7000 + i:07d}")
        recs.append(f"name: term {i}")
        recs.append("namespace: biological_process")
        if i % 4 != 0:
            recs.append(f"is_a: GO:{7000 + i % 4:07d} ! parent")
        if i % 10 == 0 and i > 0:
            recs.append("is_obsolete: true")
        recs.append("")
    return _write_once(path, "\n".join(recs) + "\n")


def full_build_config() -> dict:
    """Extractor-registry config covering every reference adapter
    family in ONE build (run_build input). Args carry live Python
    objects (indexes, broadcast maps, the liftover chain) — the dict
    form of the YAML registry config."""
    import __ray_entry__ as m

    ext = "biocypher_metta_ray.kg.extractors"
    reg = "biocypher_metta_ray.kg.regulatory"
    gtf = _gtf_fixture()
    cadd_path, cadd_index = m._cadd_fixture()
    per = m._peregrine_fixture()
    rna_bed, rna_rfam = m._rna_central_fixture()
    roadmap_dir, roadmap_index = _roadmap_fixture()
    abc_path, abc_index = _abc_fixture()
    dbs_path, dbs_chain = _dbsuper_fixture()
    ea_bed, ea_dir = _enhancer_atlas_fixture()
    topld_path, topld_index = _topld_fixture()
    emap = {str(k): f"ENSG{k:05d}" for k in range(50) if k % 7 != 0}
    pmap = {f"ENSP{k:011d}": f"P{k:05d}" for k in range(120) if k % 3 != 0}
    return {"extractors": {
        "gencode_gene": {"module": ext, "func": "gtf_gene_extractor",
                         "args": {"path": gtf, "alias_map": {
                             f"GENE{i}": [f"GENE{i}ALT", f"G{i}"]
                             for i in range(120) if i % 3 != 0}}},
        "gencode_transcript": {"module": ext,
                               "func": "gtf_transcript_extractor",
                               "args": {"path": gtf}},
        "transcribed_from": {"module": ext,
                             "func": "gtf_transcript_extractor",
                             "args": {"path": gtf,
                                      "direction": "transcribed_from"}},
        "gencode_exon": {"module": ext, "func": "gtf_exon_extractor",
                         "args": {"path": gtf}},
        "uniprot": {"module": ext, "func": "swissprot_extractor",
                    "args": {"path": _swissprot_fixture()}},
        "uniprot_translation_of": {
            "module": ext, "func": "swissprot_extractor",
            "args": {"path": _swissprot_fixture(),
                     "direction": "translation_of"}},
        "reactome_pathway": {"module": ext,
                             "func": "pathway_list_extractor",
                             "args": {"path": _reactome_pathways_fixture()}},
        "reactome_gp": {"module": ext, "func": "reactome_extractor",
                        "args": {"path": _reactome_gp_fixture(),
                                 "label": "genes_pathways"}},
        "reactome_parent": {"module": ext, "func": "reactome_extractor",
                            "args": {"path": _reactome_hier_fixture(),
                                     "label": "parent_pathway_of"}},
        "reactome_child": {"module": ext, "func": "reactome_extractor",
                           "args": {"path": _reactome_hier_fixture(),
                                    "label": "child_pathway_of"}},
        "gaf": {"module": ext, "func": "gaf_extractor",
                "args": {"path": _gaf_fixture()}},
        "go_obo": {"module": ext, "func": "obo_extractor",
                   "args": {"path": _obo_fixture()}},
        "coxpresdb": {"module": ext, "func": "coexpression_extractor",
                      "args": {"dir_path": _coexp_fixture(),
                               "id_map": {str(100 + k): f"ENSG{k:03d}"
                                          for k in range(60)
                                          if k % 5 != 0}}},
        "tflink": {"module": ext, "func": "tsv_edge_extractor",
                   "args": {"path": _tflink_fixture(), "pred": "tf_gene",
                            "subj_col": 1, "obj_col": 2,
                            "subj_map": {k: v for k, v in emap.items()
                                         if int(k) < 20},
                            "obj_map": emap, "evidence_col": 4,
                            "skip_header": True}},
        "string_ppi": {"module": ext, "func": "tsv_edge_extractor",
                       "args": {"path": _string_ppi_fixture(),
                                "pred": "interacts_with",
                                "subj_col": 0, "obj_col": 1, "sep": " ",
                                "score_col": 2, "score_scale": 0.001,
                                "subj_map": pmap, "obj_map": pmap,
                                "subj_prefix_strip": "9606.",
                                "obj_prefix_strip": "9606.",
                                "skip_header": True}},
        "refseq_closest_gene": {
            "module": ext, "func": "tsv_edge_extractor",
            "args": {"path": _refseq_fixture(), "pred": "closest_gene",
                     "subj_col": 0, "obj_col": 3,
                     "obj_map": {f"HGNC{k}": f"ENSG{k:05d}"
                                 for k in range(15) if k % 4 != 0},
                     "score_col": 4}},
        "tadmap": {"module": reg, "func": "tadmap_extractor",
                   "args": {"path": _tadmap_fixture()}},
        "gtex_eqtl": {"module": reg, "func": "gtex_eqtl_extractor",
                      "args": {"dir_path": _gtex_fixture(),
                               "tissue_ontology_map": {
                                   "T0": "UBERON:90", "T1": "UBERON:91"}}},
        "hocomoco": {"module": reg, "func": "hocomoco_extractor",
                     "args": {"dir_path": _hocomoco_fixture(),
                              "model_tf_map": {
                                  f"M{i}": f"TF{i % 10}"
                                  for i in range(30) if i % 3 != 0},
                              "hgnc_ensembl_map": {
                                  f"TF{t}": f"ENSGTF{t:03d}"
                                  for t in range(10) if t % 4 != 0}}},
        "roadmap": {"module": reg, "func": "roadmap_extractor",
                    "args": {"dir_path": roadmap_dir,
                             "rsid_index": roadmap_index,
                             "tissue_ontology_map": {
                                 f"TIS{t}": f"CL:000{t}"
                                 for t in range(4)}}},
        "abc": {"module": reg, "func": "abc_extractor",
                "args": {"path": abc_path, "rsid_index": abc_index,
                         "hgnc_ensembl_map": {
                             f"HGNC{k}": f"ENSG{k:05d}"
                             for k in range(12) if k % 5 != 0},
                         "tissue_ontology_map": {
                             f"CT{t}": f"CL:11{t}" for t in range(4)}}},
        "cadd": {"module": reg, "func": "cadd_extractor",
                 "args": {"path": cadd_path, "rsid_index": cadd_index}},
        "dbsnp": {"module": ext, "func": "vcf_variant_extractor",
                  "args": {"path": _dbsnp_fixture()}},
        "dbvar": {"module": ext, "func": "vcf_sv_extractor",
                  "args": {"path": _dbvar_fixture()}},
        "dgv": {"module": ext, "func": "bed_region_extractor",
                "args": {"path": _dgv_fixture(),
                         "label": "structural_variant"}},
        "epd": {"module": ext, "func": "bed_region_extractor",
                "args": {"path": _epd_fixture(), "label": "promoter"}},
        "dbsuper": {"module": reg, "func": "dbsuper_extractor",
                    "args": {"path": dbs_path, "chain": dbs_chain,
                             "tissues_map": {f"CELL{t}": f"UBERON:1{t}"
                                             for t in range(5)},
                             "hgnc_ensembl_map": {
                                 f"GENE{g}": f"ENSG{g:04d}"
                                 for g in range(9) if g % 4 != 0}}},
        "peregrine": {"module": reg, "func": "peregrine_extractor",
                      "args": {"enhancers_path": per[0],
                               "links_path": per[1],
                               "sources_path": per[2],
                               "hgnc_ensembl_map": per[3],
                               "tissue_ontology_map": per[4]}},
        "enhancer_atlas": {"module": reg,
                           "func": "enhancer_atlas_extractor",
                           "args": {"enhancer_path": ea_bed,
                                    "enhancer_gene_dir": ea_dir,
                                    "tissue_ontology_map": {
                                        "E0": "UBERON:70",
                                        "E1": "UBERON:71"}}},
        "topld": {"module": reg, "func": "topld_extractor",
                  "args": {"path": topld_path,
                           "pos_rsid_index": topld_index,
                           "chrom": "chr9"}},
        "favor": {"module": ext, "func": "wide_variant_extractor",
                  "args": {"path": _favor_fixture(),
                           "fields": {"chr": 0, "pos": 1, "ref": 2,
                                      "alt": 3},
                           "annotation_fields": {
                               "apc_conservation": 5, "cadd_raw": 7,
                               "linsight": 9}}},
        "rna_central": {"module": ext, "func": "rna_central_extractor",
                        "args": {"bed_path": rna_bed,
                                 "rfam_path": rna_rfam}},
    }}


# ---------------------------------------------------------------------------
# Real-codec multimodal query (VERDICT r4 task #6): MediaDecoder over
# spec-conformant PNG payloads decoded by the vendored pure-Python
# codec — non-fake bytes through the real-codec path, oracled.
# ---------------------------------------------------------------------------

def _png_media_table():
    import pyarrow as pa

    from biocypher_metta_ray.functions.png import (
        encode_png_gray8,
        encode_png_rgb8,
    )

    W, H = 16, 25  # 400 px: means are exact at 4 decimals (400 | 10^4)
    y, x = np.mgrid[0:H, 0:W]
    ids, payloads = [], []
    for i in range(40):
        if i % 10 == 9:  # malformed payload -> dropped with accounting
            ids.append(i)
            payloads.append(b"truncated\x89PNG")
            continue
        if i % 3 == 0:
            rgb = np.stack([
                (i * 13 + y * 7 + x) % 256,
                (i * 5 + y + x * 11) % 256,
                (i * 3 + y * 9 + x * 5) % 256,
            ], axis=2).astype(np.uint8)
            payloads.append(encode_png_rgb8(rgb))
        else:
            payloads.append(
                encode_png_gray8(((i * 11 + y * 5 + x * 3) % 256)
                                 .astype(np.uint8)))
        ids.append(i)
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "media_type": pa.array(["image"] * len(ids), pa.string()),
        "payload": pa.array(payloads, pa.binary()),
    })


def q_multimodal_png_features(sf_dir: str):
    """Feature extraction over REAL PNG bytes: the use_real_codec path
    (vendored functions/png.py decoder; PIL on clusters that have it —
    pinned to png_decode here so the oracle's integer-luma formula
    holds regardless of environment). Truncated payloads drop."""
    import ray as _ray

    from biocypher_metta_ray.stages.multimodal import (
        MediaDecoder,
        png_decode,
    )

    from biocypher_metta_ray.stages.pool import autoscale_pool

    ds = _ray.data.from_arrow(_png_media_table())
    feats = ds.map_batches(
        MediaDecoder, fn_constructor_kwargs={"decode_fn": png_decode},
        batch_format="pyarrow", batch_size=16,
        concurrency=autoscale_pool(),
    )

    def flat(df: pd.DataFrame) -> pd.DataFrame:
        return df.astype({
            "media_id": "int64", "width": "int64", "height": "int64",
            "n_frames": "int64", "mean_intensity": "float64",
        })

    return feats.map_batches(flat, batch_format="pandas")


ADAPTER_QUERIES["multimodal_png_features"] = q_multimodal_png_features
ADAPTER_ORACLES["multimodal_png_features"] = """
    WITH px AS (
        SELECT i,
               CASE WHEN i % 3 = 0 THEN
                   (((i * 13 + y * 7 + x) % 256) * 299
                    + ((i * 5 + y + x * 11) % 256) * 587
                    + ((i * 3 + y * 9 + x * 5) % 256) * 114) // 1000
               ELSE (i * 11 + y * 5 + x * 3) % 256 END AS v
        FROM (SELECT unnest(range(40)) AS i),
             (SELECT unnest(range(25)) AS y),
             (SELECT unnest(range(16)) AS x)
        WHERE i % 10 != 9
    )
    SELECT CAST(i AS BIGINT) AS media_id,
           'image' AS media_type,
           CAST(16 AS BIGINT) AS width,
           CAST(25 AS BIGINT) AS height,
           CAST(1 AS BIGINT) AS n_frames,
           ROUND(AVG(v), 4) AS mean_intensity
    FROM px GROUP BY i
"""
