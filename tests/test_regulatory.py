"""Long-tail regulatory/variant extractors: fixtures exercising the
bespoke grammars, index probes, drop-on-miss paths and liftover flow
(kg/regulatory.py; reference adapter citations in the module)."""

import gzip
import json

import pandas as pd
import pytest

from biocypher_metta_ray.kg.regulatory import (
    cadd_extractor,
    dbsuper_extractor,
    enhancer_atlas_extractor,
    gtex_eqtl_extractor,
    hocomoco_extractor,
    peregrine_extractor,
    roadmap_extractor,
    tadmap_extractor,
    topld_extractor,
)


def test_cadd_rsid_index_probe(ray_session, tmp_path):
    p = tmp_path / "cadd.csv"
    p.write_text(
        "rsid,chromosome,position,reference_allele,alternate_allele,"
        "raw_cadd_score,phred_score\n"
        "rs10,chr7,92383888,A,C,0.223125,6.177\n"
        "rs999,chr7,1,A,G,0.5,5.0\n"  # rsid missing from index -> drop
        "rs1000000,chr12,126890980,G,A,0.042237,3.295\n"
    )
    index = {"rs10": ("chr7", 92383888), "rs1000000": ("chr12", 126890980)}
    out = cadd_extractor(str(p), index)["nodes"].to_pandas()
    assert sorted(out["id"]) == ["rs10", "rs1000000"]
    props = json.loads(out[out["id"] == "rs10"].iloc[0]["props_json"])
    # position comes from the INDEX, not the file column
    assert props["start"] == 92383888 and props["end"] == 92383888
    assert props["raw_cadd_score"] == 0.223125
    assert props["phred_score"] == 6.177


def test_cadd_window_filter(ray_session, tmp_path):
    p = tmp_path / "cadd.csv"
    p.write_text(
        "rsid,chromosome,position,ref,alt,raw,phred\n"
        "rs1,chr1,0,A,C,0.1,1.0\n"
        "rs2,chr1,0,A,C,0.2,2.0\n"
        "rs3,chr2,0,A,C,0.3,3.0\n"
    )
    index = {"rs1": ("chr1", 100), "rs2": ("chr1", 900),
             "rs3": ("chr2", 100)}
    out = cadd_extractor(str(p), index, chrom="chr1", start=50,
                         end=500)["nodes"].to_pandas()
    assert list(out["id"]) == ["rs1"]


def test_roadmap_keyed_dir(ray_session, tmp_path):
    d = tmp_path / "roadmap"
    d.mkdir()
    (d / "erc2-DHS.csv").write_text(
        "rsid,dataset,cell,tissue,datatype\n"
        'rs10,erc2-DHS,"E050 Primary",Blood,"DNase I Hotspot"\n'
        'rs77,erc2-DHS,"E094 Gastric",Gastric,"DNase I Hotspot"\n'
        'rs88,erc2-DHS,"E000 X",UnknownTissue,"DNase I Hotspot"\n'
    )
    index = {"rs10": ("chr7", 92383888), "rs77": ("chr1", 500),
             "rs88": ("chr2", 5)}
    tmap = {"Blood": "UBERON:0000178", "Gastric": "UBERON:0001161"}
    out = roadmap_extractor(str(d), index, tmap)["nodes"].to_pandas()
    # rs88's tissue misses the ontology map -> dropped
    assert sorted(out["id"]) == ["rs10", "rs77"]
    props = json.loads(out[out["id"] == "rs10"].iloc[0]["props_json"])
    assert props["biological_context"] == "UBERON:0000178"
    assert props["cell"] == "E050 Primary"


def test_tadmap_mini_grammar(ray_session, tmp_path):
    p = tmp_path / "tadmap.csv"
    p.write_text(
        "loc,genes\n"
        "chr1|1000|2000,x|gene:ENSG01;y|gene:ENSG02;bad\n"
        "chr2|5000|9000,z|gene:ENSG03\n"
    )
    out = tadmap_extractor(str(p))["nodes"].to_pandas()
    assert sorted(out["id"]) == [
        "chr1_1000_2000_GRCh38", "chr2_5000_9000_GRCh38"
    ]
    props = json.loads(
        out[out["id"] == "chr1_1000_2000_GRCh38"].iloc[0]["props_json"]
    )
    # malformed 'bad' entry skipped (IndexError -> continue)
    assert props["genes"] == ["ENSG01", "ENSG02"]


def test_hocomoco_pwm_accumulation(ray_session, tmp_path):
    d = tmp_path / "pwm"
    d.mkdir()
    (d / "ANDR_HUMAN.H11MO.0.A.pwm").write_text(
        ">ANDR_HUMAN\n"
        "0.1\t0.2\t0.3\t0.4\n"
        "0.4\t0.3\t0.2\t0.1\n"
    )
    (d / "NOMAP_HUMAN.pwm").write_text(">X\n0.25\t0.25\t0.25\t0.25\n")
    model_tf = {"ANDR_HUMAN.H11MO.0.A": "ANDR_HUMAN"}
    hgnc = {"ANDR_HUMAN": "ENSG00000169083"}
    out = hocomoco_extractor(str(d), model_tf, hgnc)["nodes"].to_pandas()
    assert list(out["id"]) == ["ENSG00000169083"]
    props = json.loads(out.iloc[0]["props_json"])
    assert props["pwm_A"] == [0.1, 0.4]
    assert props["pwm_T"] == [0.4, 0.1]
    assert props["length"] == 2
    assert props["tf_name"] == "ANDR_HUMAN"


def test_gtex_eqtl_variant_grammar(ray_session, tmp_path):
    d = tmp_path / "gtex"
    d.mkdir()
    header = "\t".join(f"c{i}" for i in range(29))
    row = ["."] * 29
    row[0] = "ENSG00000001.5"
    row[11] = "chr1_12345_A_G_b38"
    row[18] = "rs555"
    row[21], row[24], row[27], row[28] = "0.1", "-0.5", "1e-8", "2e-4"
    bad = list(row)
    bad[11] = "chr1_99_A_G_b37"  # unsupported assembly -> drop
    content = header + "\n" + "\t".join(row) + "\n" + "\t".join(bad) + "\n"
    with gzip.open(d / "Lung.v8.egenes.txt.gz", "wt") as f:
        f.write(content)
    tmap = {"Lung": "UBERON:0002048"}
    out = gtex_eqtl_extractor(str(d), tmap)["edges"].to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["subj"] == "rs555"
    assert out.iloc[0]["obj"] == "ENSG00000001"  # version stripped
    props = json.loads(out.iloc[0]["props_json"])
    assert props["biological_context"] == "UBERON:0002048"
    assert props["p_value"] == 1e-8 and props["slope"] == -0.5


def test_enhancer_atlas_compound_key(ray_session, tmp_path):
    enh = tmp_path / "enh.bed"
    enh.write_text("chr1\t999\t1999\nchr2\t10\t20\n")
    d = tmp_path / "ep"
    d.mkdir()
    (d / "Astrocyte_EP.txt").write_text(
        "chr1:999-1999_ENSG07$F$chr1$1500$+\t2.5\n"
    )
    (d / "NoMap_EP.txt").write_text("chr2:10-20_ENSG08$X\t1.0\n")
    tmap = {"Astrocyte": "CL:0000127"}
    res = enhancer_atlas_extractor(str(enh), str(d), tmap)
    nodes = res["nodes"].to_pandas()
    # 0 -> 1-based shift
    assert "chr1_1000_2000_GRCh38" in set(nodes["id"])
    edges = res["edges"].to_pandas()
    assert len(edges) == 1  # NoMap tissue file skipped
    assert edges.iloc[0]["subj"] == "chr1_1000_2000_GRCh38"
    assert edges.iloc[0]["obj"] == "ENSG07"
    props = json.loads(edges.iloc[0]["props_json"])
    assert props == {"biological_context": "CL:0000127", "score": 2.5}


def test_peregrine_three_file_flow(ray_session, tmp_path):
    enh = tmp_path / "enhancers.tsv"
    enh.write_text("chr1\t100\t200\tEH1\nchr2\t300\t400\tEH2\n")
    src = tmp_path / "sources.tsv"
    src.write_text("EH1\tENCODE\nEH2\tEnsembl\n")
    links = tmp_path / "links.tsv"
    links.write_text(
        "enhancer\tgene\tc2\tc3\ttissue\tc5\tc6\tscore\n"
        "EH1\tx|hgnc=5\tz\tz\tUBER1\tz\tz\t0.9\n"
        "EH1\tx|hgnc=404\tz\tz\tUBER1\tz\tz\t0.1\n"  # gene miss
        "EH2\tx|hgnc=5\tz\tz\tNOPE\tz\tz\t0.2\n"     # tissue miss
        "EH9\tx|hgnc=5\tz\tz\tUBER1\tz\tz\t0.3\n"    # enhancer miss
    )
    hgnc = {"hgnc:5": "ENSG05"}
    tmap = {"UBER1": "UBERON:0000001"}
    res = peregrine_extractor(str(enh), str(links), str(src), hgnc, tmap)
    nodes = res["nodes"].to_pandas()
    assert sorted(nodes["id"]) == [
        "chr1_100_200_GRCh38", "chr2_300_400_GRCh38"
    ]
    p1 = json.loads(
        nodes[nodes["id"] == "chr1_100_200_GRCh38"].iloc[0]["props_json"]
    )
    assert p1["data_source"] == "ENCODE"
    edges = res["edges"].to_pandas()
    assert len(edges) == 1
    assert edges.iloc[0]["subj"] == "chr1_100_200_GRCh38"
    assert edges.iloc[0]["obj"] == "ENSG05"


def test_topld_pos_rsid_both_sides(ray_session, tmp_path):
    p = tmp_path / "topld.csv"
    p.write_text(
        "SNP1,SNP2,R2,Dprime,+/-corr\n"
        "100,200,0.9,0.95,+\n"
        "100,300,0.85,0.9,-\n"   # pos 300 unresolvable -> drop
        "100,200,0.5,0.6,+\n"    # below cutoff -> drop
    )
    idx = {"chr3_100": "rs1", "chr3_200": "rs2"}
    out = topld_extractor(str(p), idx, chrom="chr3",
                          cutoff=0.8)["edges"].to_pandas()
    assert len(out) == 1
    assert (out.iloc[0]["subj"], out.iloc[0]["obj"]) == ("rs1", "rs2")
    props = json.loads(out.iloc[0]["props_json"])
    assert props["r2"] == 0.9 and props["ancestry"] == "SAS"


def test_dbsuper_liftover_flow(ray_session, tmp_path):
    from biocypher_metta_ray.stages.liftover import synthetic_chain

    chain = synthetic_chain()
    p = tmp_path / "dbsuper.tsv"
    # chr1 positions inside segment 0 (offset deterministic from seed);
    # chr99 has no chain entry -> dropped
    p.write_text(
        "chr\tstart\tend\tid\tgene\tcell\n"
        "chr1\t499\t599\tSE1\tHGNC9\tLiver\n"
        "chr99\t1\t2\tSE2\tHGNC9\tLiver\n"
        "chr1\t699\t799\tSE3\tNOPE\tLiver\n"  # gene miss -> edge only drops
    )
    tmap = {"Liver": "UBERON:0002107"}
    hgnc = {"HGNC9": "ENSG09"}
    res = dbsuper_extractor(str(p), chain, tmap, hgnc)
    nodes = res["nodes"].to_pandas()
    starts, offsets, mapped = chain["chr1"]
    off = int(offsets[0])
    assert f"chr1_{500 + off}_{600 + off}_GRCh38" in set(nodes["id"])
    assert len(nodes) == 2  # SE1 + SE3 lift; chr99 dropped
    edges = res["edges"].to_pandas()
    assert len(edges) == 1  # SE3's gene misses the hgnc map
    assert edges.iloc[0]["obj"] == "ENSG09"
    props = json.loads(edges.iloc[0]["props_json"])
    assert props["biological_context"] == "UBERON:0002107"


def test_abc_nodes_and_edges(ray_session, tmp_path):
    from biocypher_metta_ray.kg.regulatory import abc_extractor

    header = ",".join(f"c{i}" for i in range(29))
    row = ["x"] * 29
    row[0], row[1], row[10], row[24], row[27] = (
        "rs10", "chr4", "SULT1E1", "0.043128", "HepG2",
    )
    bad_gene = list(row)
    bad_gene[0], bad_gene[10] = "rs11", "NOPE"
    bad_rsid = list(row)
    bad_rsid[0] = "rs404"
    p = tmp_path / "abc.csv"
    p.write_text(
        header + "\n" + ",".join(row) + "\n" + ",".join(bad_gene) + "\n"
        + ",".join(bad_rsid) + "\n"
    )
    index = {"rs10": ("chr4", 71048952), "rs11": ("chr4", 5)}
    hgnc = {"SULT1E1": "ENSG00000109193"}
    tmap = {"HepG2": "CLO:0003704"}
    res = abc_extractor(str(p), index, hgnc, tmap)
    nodes = res["nodes"].to_pandas()
    # rs404 missing from the index drops; rs10 + rs11 become nodes
    assert sorted(nodes["id"]) == ["rs10", "rs11"]
    props = json.loads(nodes[nodes["id"] == "rs10"].iloc[0]["props_json"])
    assert props["start"] == 71048952  # position from the INDEX
    assert props["biological_context"] == "CLO:0003704"
    assert props["biochemical_activity"] == "DNase I hypersensitive"
    edges = res["edges"].to_pandas()
    assert len(edges) == 1  # rs11's gene misses the hgnc map
    assert edges.iloc[0]["obj"] == "ENSG00000109193"
    eprops = json.loads(edges.iloc[0]["props_json"])
    assert eprops["score"] == "0.043128"  # raw string, reference shape
