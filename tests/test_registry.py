"""Extractor registry / build runner tests (create_knowledge_graph.py
analogue: importlib resolution, union, conformance, dedup, sinks)."""

import glob
import gzip
import json
import os

import pytest

import ray.data

GTF = """\
chr1\tX\tgene\t100\t200\t.\t+\t.\tgene_id "ENSG0001.1"; gene_name "A1"; gene_type "pc";
chr1\tX\tgene\t300\t400\t.\t-\t.\tgene_id "ENSG0002.2"; gene_name "A2"; gene_type "pc";
chr1\tX\ttranscript\t100\t180\t.\t+\t.\tgene_id "ENSG0001.1"; transcript_id "ENST0001.1"; transcript_name "T1";
"""

BED = "chr1\t0\t999\tregA\nchr1\t1000\t1999\tregB\n"


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    d = tmp_path_factory.mktemp("reg")
    (d / "x.gtf").write_text(GTF)
    (d / "x.bed").write_text(BED)
    cfg = {
        "extractors": {
            "genes": {
                "module": "biocypher_metta_ray.kg.extractors",
                "func": "gtf_gene_extractor",
                "args": {"path": str(d / "x.gtf")},
            },
            "transcripts": {
                "module": "biocypher_metta_ray.kg.extractors",
                "func": "gtf_transcript_extractor",
                "args": {"path": str(d / "x.gtf")},
            },
            "regions": {
                "module": "biocypher_metta_ray.kg.extractors",
                "func": "bed_region_extractor",
                "args": {"path": str(d / "x.bed"), "label": "enhancer"},
            },
            "web": {
                "module": "biocypher_metta_ray.kg.extractors",
                "func": "web_kg_extractor",
                "args": {"documents_dir": "/root/testdata/sf0.001"},
            },
        }
    }
    import yaml

    (d / "cfg.yaml").write_text(yaml.safe_dump(cfg))
    return d


def test_run_build(ray_session, cfg, tmp_path_factory):
    from biocypher_metta_ray.pipelines.registry import run_build

    out = str(tmp_path_factory.mktemp("build_out"))
    report = run_build(str(cfg / "cfg.yaml"), out, prolog=True)
    assert report["n_nodes"] > 20  # genes + transcript + regions + web entities
    assert report["n_edges"] > 100
    # all sinks written
    assert os.path.exists(f"{out}/metta/type_defs.metta")
    assert glob.glob(f"{out}/graph/nodes.parquet/label=gene/*")
    assert glob.glob(f"{out}/graph/nodes.parquet/label=enhancer/*")
    assert glob.glob(f"{out}/prolog/edges/part-*.pl")
    # per-source facts present
    lines = []
    for p in glob.glob(f"{out}/metta/nodes/part-*.metta"):
        lines.extend(open(p).read().splitlines())
    assert "(gene ENSG0001)" in lines  # version-stripped GTF gene
    assert any(l.startswith("(enhancer chr1_1_1000_GRCh38)") for l in lines)
    # transcribed_to edge from the GTF transcript
    elines = []
    for p in glob.glob(f"{out}/metta/edges/part-*.metta"):
        elines.extend(open(p).read().splitlines())
    assert "(transcribed_to (gene ENSG0001) (transcript ENST0001))" in elines
    report2 = json.load(open(f"{out}/build_report.json"))
    assert report2["n_nodes"] == report["n_nodes"]


def test_conform_drops_unknown_labels(ray_session):
    from biocypher_metta_ray.pipelines.registry import conform
    from biocypher_metta_ray.schema import SchemaRegistry

    nodes = ray.data.from_items(
        [
            {"id": "a", "label": "gene", "props_json": None},
            {"id": "b", "label": "not_a_label", "props_json": None},
        ]
    )
    edges = ray.data.from_items(
        [
            {"subj": "a", "pred": "interacts_with", "obj": "b", "props_json": None},
            {"subj": "a", "pred": "bogus_pred", "obj": "b", "props_json": None},
        ]
    )
    n, e = conform(nodes, edges, SchemaRegistry())
    assert n.count() == 1 and e.count() == 1


def test_cli_dry_run(ray_session, cfg, tmp_path_factory):
    """CLI entry via main() in-process (Ray already initialised)."""
    from biocypher_metta_ray.__main__ import main

    out = str(tmp_path_factory.mktemp("cli_out"))
    main(["build", "--config", str(cfg / "cfg.yaml"),
          "--output-dir", out, "--dry-run"])
    assert os.path.exists(f"{out}/build_report.json")
    rep = json.load(open(f"{out}/build_report.json"))
    assert rep["n_nodes"] <= 400  # dry-run truncation applied


def test_example_config_resolves():
    """The shipped example config parses and its extractor resolves."""
    import yaml

    from biocypher_metta_ray.pipelines.registry import resolve_extractor

    path = "biocypher_metta_ray/config/extractors_example.yaml"
    cfg = yaml.safe_load(open(path))
    for name, spec in cfg["extractors"].items():
        fn, args = resolve_extractor(spec)
        assert callable(fn), name


def test_run_build_new_extractor_families(ray_session, tmp_path):
    """End-to-end run_build over the round-2 families: an OWL ontology
    extractor and the EnhancerAtlas compound-key extractor, through
    schema conformance (part_of edges are undeclared in schema.yaml ->
    dropped and counted) to the parquet + MeTTa outputs."""
    import json
    import os

    import ray.data

    from biocypher_metta_ray.pipelines.registry import run_build
    from tests.test_owl import FIXTURE

    owl = tmp_path / "go.owl"
    owl.write_text(FIXTURE)
    enh = tmp_path / "enh.bed"
    enh.write_text("chr1\t999\t1999\n")
    ep = tmp_path / "ep"
    ep.mkdir()
    (ep / "Astrocyte_EP.txt").write_text(
        "chr1:999-1999_ENSG07$F$chr1$1500$+\t2.5\n"
    )
    config = {
        "extractors": {
            "go": {
                "module": "biocypher_metta_ray.kg.extractors",
                "func": "owl_ontology_extractor",
                "args": {"path": str(owl), "label": "go",
                         "edge_label": "go_subclass",
                         "subontologies": True},
            },
            "enhancers": {
                "module": "biocypher_metta_ray.kg.regulatory",
                "func": "enhancer_atlas_extractor",
                "args": {
                    "enhancer_path": str(enh),
                    "enhancer_gene_dir": str(ep),
                    "tissue_ontology_map": {"Astrocyte": "CL:0000127"},
                },
            },
        }
    }
    out_dir = str(tmp_path / "build")
    report = run_build(config, out_dir)
    nodes = ray.data.read_parquet(
        os.path.join(out_dir, "graph", "nodes.parquet")
    ).to_pandas()
    # OWL terms conformed to the declared 'go' label + enhancer node
    assert "GO:0000001" in set(nodes["id"])
    assert "chr1_1000_2000_GRCh38" in set(nodes["id"])
    edges = ray.data.read_parquet(
        os.path.join(out_dir, "graph", "edges.parquet")
    ).to_pandas()
    preds = set(edges["pred"])
    assert "subclass" in preds and "enhancer_gene" in preds
    # part_of / has_part are NOT declared in schema.yaml -> conformance
    # dropped them and counted the drops
    assert "part_of" not in preds and "has_part" not in preds
    # conformance dropped exactly the 2 restriction edges: the OWL
    # fixture emits 3 edges (subclass + part_of + has_part) and the
    # enhancer file 1, and only subclass + enhancer_gene survive.
    # (The metrics counter is best-effort observability — asserting
    # delivery of fire-and-forget increments is inherently racy.)
    assert len(edges) == 2
    # MeTTa output exists and renders the conformed graph
    metta = "".join(
        open(f).read()
        for f in sorted(
            __import__("glob").glob(
                os.path.join(out_dir, "metta", "edges", "part-*.metta")
            )
        )
    )
    assert "GO:0000001" in metta
