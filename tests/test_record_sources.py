"""Record-format sources + their extractors (SwissProt/GAF/OBO/
2-col TSV/keyed dir), mirroring reference adapters 5-14 (SURVEY §2.1)."""

import gzip

import pytest

import ray.data

SWISSPROT = """\
ID   TEST1_HUMAN             Reviewed;         100 AA.
AC   P12345; Q99999;
DE   RecName: Full=Test protein one;
DR   Ensembl; ENST00000001.5; ENSP0001; ENSG0001.
DR   GO; GO:0005515; F:protein binding; IEA.
SQ   SEQUENCE
//
ID   TEST2_HUMAN             Reviewed;         50 AA.
AC   P54321;
DE   RecName: Full=Second prot;
DR   Ensembl; ENST00000002.1; x; y.
//
"""

GAF = """\
!gaf-version: 2.2
UniProtKB\tP12345\tTP1\tenables\tGO:0005515\tPMID:1\tIEA\t\tF\trest\tmore
UniProtKB\tP54321\tTP2\tinvolved_in\tGO:0008150\tPMID:2\tIDA\t\tP\trest\tmore
UniProtKB\tP54321\tTP2\tinvolved_in\tNOTGO:1\tPMID:2\tIDA\t\tP\trest\tmore
"""

OBO = """\
format-version: 1.2

[Term]
id: GO:0000001
name: mitochondrion inheritance
namespace: biological_process
is_a: GO:0048308 ! organelle inheritance
is_a: GO:0048311 ! mitochondrion distribution

[Term]
id: GO:0000002
name: obsolete thing
is_obsolete: true

[Typedef]
id: part_of
"""

REACTOME = "ENSG0001.4\tR-HSA-1\nENSG0002\tR-HSA-2\nENSG0003\tR-OTHER-9\n"


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp("records")
    with gzip.open(d / "sprot.dat.gz", "wt") as f:
        f.write(SWISSPROT)
    (d / "anno.gaf").write_text(GAF)
    (d / "onto.obo").write_text(OBO)
    (d / "reactome.tsv").write_text(REACTOME)
    co = d / "coexp"
    co.mkdir()
    (co / "111.txt").write_text("222 0.9\n333 0.5\nbadline\n")
    (co / "222.txt").write_text("111 0.9\n")
    return d


def test_swissprot_extractor(ray_session, files):
    from biocypher_metta_ray.kg.extractors import swissprot_extractor

    out = swissprot_extractor(str(files / "sprot.dat.gz"))
    nodes = out["nodes"].to_pandas().sort_values("id")
    assert list(nodes["id"]) == ["P12345", "P54321"]
    assert "Test_protein_one" not in nodes["props_json"].iloc[0]  # raw name kept
    edges = out["edges"].to_pandas()
    got = set(zip(edges["subj"], edges["obj"]))
    assert got == {("ENST00000001", "P12345"), ("ENST00000002", "P54321")}


def test_gaf_extractor(ray_session, files):
    from biocypher_metta_ray.kg.extractors import gaf_extractor

    edges = gaf_extractor(str(files / "anno.gaf"))["edges"].to_pandas()
    assert len(edges) == 2  # non-GO row dropped
    assert set(edges["subj"]) == {"GO:0005515", "GO:0008150"}
    assert '"qualifier": "enables"' in edges.sort_values("subj")["props_json"].iloc[0]


def test_obo_extractor(ray_session, files):
    from biocypher_metta_ray.kg.extractors import obo_extractor

    out = obo_extractor(str(files / "onto.obo"))
    nodes = out["nodes"].to_pandas()
    assert list(nodes["id"]) == ["GO:0000001"]  # obsolete skipped
    assert '"subontology": "biological_process"' in nodes["props_json"].iloc[0]
    edges = out["edges"].to_pandas().sort_values("obj")
    assert list(edges["obj"]) == ["GO:0048308", "GO:0048311"]
    assert set(edges["pred"]) == {"subclass"}


def test_reactome_extractor(ray_session, files):
    from biocypher_metta_ray.kg.extractors import reactome_extractor

    edges = reactome_extractor(str(files / "reactome.tsv"))["edges"].to_pandas()
    assert len(edges) == 2  # R-OTHER filtered
    assert set(edges["subj"]) == {"ENSG0001", "ENSG0002"}  # version strip


def test_coexpression_extractor_with_id_map(ray_session, files):
    from biocypher_metta_ray.kg.extractors import coexpression_extractor

    idmap = {"111": "ENSG0111", "222": "ENSG0222"}  # 333 missing -> dropped
    edges = coexpression_extractor(str(files / "coexp"), id_map=idmap)[
        "edges"
    ].to_pandas()
    got = set(zip(edges["subj"], edges["obj"]))
    assert got == {("ENSG0111", "ENSG0222"), ("ENSG0222", "ENSG0111")}


def test_registry_end_to_end_with_record_sources(ray_session, files, tmp_path):
    """All record extractors through run_build -> rendered MeTTa."""
    import glob

    from biocypher_metta_ray.pipelines.registry import run_build

    cfg = {
        "extractors": {
            "prot": {"module": "biocypher_metta_ray.kg.extractors",
                     "func": "swissprot_extractor",
                     "args": {"path": str(files / "sprot.dat.gz")}},
            "go": {"module": "biocypher_metta_ray.kg.extractors",
                   "func": "obo_extractor",
                   "args": {"path": str(files / "onto.obo")}},
            "anno": {"module": "biocypher_metta_ray.kg.extractors",
                     "func": "gaf_extractor",
                     "args": {"path": str(files / "anno.gaf")}},
        }
    }
    report = run_build(cfg, str(tmp_path))
    lines = []
    for p in glob.glob(f"{tmp_path}/metta/**/part-*.metta", recursive=True):
        lines.extend(open(p).read().splitlines())
    assert "(protein P12345)" in lines
    assert "(go GO:0000001)" in lines
    assert "(subclass (go GO:0000001) (go GO:0048308))" in lines
    # endpoint type comes from the schema's ``source: gene ontology``
    # (metta_writer.py:66-76 lowers+underscores the TYPE name, which
    # differs from the go NODE label — reference-faithful asymmetry)
    assert "(go_gene_product (gene_ontology GO:0005515) (protein P12345))" in lines
    assert "(translates_to (transcript ENST00000001) (protein P12345))" in lines


def test_wide_variant_extractor(ray_session, tmp_path):
    """FAVOR-like wide CSV -> nested annotation props, '.'->0,
    to_float clamp, composite variant id; renders recursively."""
    from biocypher_metta_ray.kg.extractors import wide_variant_extractor
    from biocypher_metta_ray.render import MettaRenderer
    from biocypher_metta_ray.schema import SchemaRegistry
    import json as _json

    p = tmp_path / "wide.csv"
    p.write_text("1,100,A,T,0.5,.,1e400\nbadline\n2,200,G,C,2.5,0.1,3\n")
    out = wide_variant_extractor(
        str(p),
        annotation_fields={"cadd": 4, "gerp": 5, "huge": 6},
    )["nodes"].to_pandas().sort_values("id").reset_index(drop=True)
    assert list(out["id"]) == ["1_100_A_T_GRCh38", "2_200_G_C_GRCh38"]
    props = _json.loads(out["props_json"][0])
    assert props["annotation"] == {"cadd": 0.5, "gerp": 0, "huge": 1e307}
    # recursive render parity (metta_writer.py:158-160)
    lines = MettaRenderer(SchemaRegistry()).render_node(
        out["id"][0], "snp", props
    )
    assert "(annotation (snp 1_100_A_T_GRCh38))" in lines
    assert "(cadd (annotation (snp 1_100_A_T_GRCh38)) 0.5)" in lines


def test_gtf_exon_extractor(ray_session, tmp_path):
    from biocypher_metta_ray.kg.extractors import gtf_exon_extractor

    p = tmp_path / "e.gtf"
    p.write_text(
        'chr1\tX\texon\t10\t20\t.\t+\t.\tgene_id "G1.1"; transcript_id "T1.1"; '
        'exon_id "E1.2"; exon_number "1";\n'
        'chr1\tX\tgene\t10\t99\t.\t+\t.\tgene_id "G1.1";\n'
    )
    out = gtf_exon_extractor(str(p))["nodes"].to_pandas()
    assert list(out["id"]) == ["E1"]
    assert '"exon_number": "1"' in out["props_json"].iloc[0]


def test_tsv_edge_extractor_tflink_style(ray_session, tmp_path):
    """entrez->ensembl maps on both ends + pubmed evidence explode
    (tflink_adapter.py:42-54)."""
    from biocypher_metta_ray.kg.extractors import tsv_edge_extractor

    p = tmp_path / "tflink.tsv"
    p.write_text("100\t200\t11111;22222\n100\t999\t33333\n")
    idmap = {"100": "ENSG0100", "200": "ENSG0200"}  # 999 missing -> drop
    edges = tsv_edge_extractor(
        str(p), pred="tf_gene" if False else "interacts_with",
        subj_col=0, obj_col=1, evidence_col=2,
        subj_map=idmap, obj_map=idmap,
    )["edges"].to_pandas()
    assert len(edges) == 1
    assert edges["subj"].iloc[0] == "ENSG0100"
    assert '"evidence": ["pubmed:11111", "pubmed:22222"]' in edges["props_json"].iloc[0]


def test_tsv_edge_extractor_string_ppi_style(ray_session, tmp_path):
    """prefix strip + score/1000 (string_ppi_adapter.py:42-52)."""
    from biocypher_metta_ray.kg.extractors import tsv_edge_extractor

    p = tmp_path / "ppi.txt"
    p.write_text("9606.P1 9606.P2 800\n")
    edges = tsv_edge_extractor(
        str(p), pred="interacts_with", subj_col=0, obj_col=1, sep=" ",
        score_col=2, score_scale=0.001,
        subj_prefix_strip="9606.", obj_prefix_strip="9606.",
    )["edges"].to_pandas()
    assert edges["subj"].iloc[0] == "P1" and edges["obj"].iloc[0] == "P2"
    assert '"score": 0.8' in edges["props_json"].iloc[0]


def test_pathway_list_and_sv_extractors(ray_session, tmp_path):
    from biocypher_metta_ray.kg.extractors import (
        pathway_list_extractor,
        vcf_sv_extractor,
    )

    pw = tmp_path / "pathways.tsv"
    pw.write_text("R-HSA-1\tSignaling\tHomo sapiens\nR-MMU-2\tOther\tMus musculus\n")
    nodes = pathway_list_extractor(str(pw))["nodes"].to_pandas()
    assert list(nodes["id"]) == ["R-HSA-1"]  # species filter

    sv = tmp_path / "sv.vcf"
    sv.write_text(
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "1\t1000\tnsv1\tN\t<DEL>\t.\t.\tEND=2000;X=1\n"
        "1\t3000\tnsv2\tN\t<WEIRD>\t.\t.\tEND=4000\n"
    )
    out = vcf_sv_extractor(str(sv))["nodes"].to_pandas()
    assert list(out["id"]) == ["nsv1"]  # unknown ALT symbol dropped
    assert '"variant_type": "deletion"' in out["props_json"].iloc[0]
    assert '"end": 2000' in out["props_json"].iloc[0]
