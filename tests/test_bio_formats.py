"""Format source/parse kernel tests over tiny synthesized flat files —
mirrors the reference's sample-driven conformance (SURVEY §5)."""

import gzip

import pandas as pd
import pytest

import ray.data

GTF = """\
##description: test
chr1\tHAVANA\tgene\t11869\t14409\t.\t+\t.\tgene_id "ENSG00000223972.5"; gene_type "pseudogene"; gene_name "DDX11L1";
chr1\tHAVANA\ttranscript\t11869\t14409\t.\t+\t.\tgene_id "ENSG00000223972.5"; transcript_id "ENST00000456328.2";
chrY\tHAVANA\tgene\t100\t200\t.\t-\t.\tgene_id "ENSG00000999999.1_PAR_Y"; gene_name "PARGENE";
malformed line without tabs
"""

VCF = """\
##fileformat=VCFv4.2
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO
1\t10177\trs367896724\tA\tAC\t.\t.\tRS=367896724;CAF=0.5747,0.4253;VC=DIV
X\t60034\trs9999\tT\tC\t.\t.\tVC=SNV;CAF=0.9,0.1
bad\tline
"""

BED = """\
track name=test
chr1\t0\t999\tregion_a
chr2\t1000\t1999\tregion_b
"""


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp("formats")
    (d / "test.gtf").write_text(GTF)
    with gzip.open(d / "test.vcf.gz", "wt") as f:
        f.write(VCF)
    (d / "test.bed").write_text(BED)
    return d


def test_read_gtf(ray_session, files):
    from biocypher_metta_ray.sources.bio_formats import read_gtf

    df = read_gtf(
        str(files / "test.gtf"), type_filter="gene",
        attr_keys=("gene_id", "gene_name"),
    ).to_pandas()
    assert len(df) == 2
    # version strip + _PAR_Y handling (gencode_gene_adapter.py:95-102)
    assert set(df["gene_id"]) == {"ENSG00000223972", "ENSG00000999999_PAR_Y"}
    assert df.loc[df["gene_name"] == "DDX11L1", "start"].iloc[0] == 11869


def test_read_vcf_gzip(ray_session, files):
    from biocypher_metta_ray.sources.bio_formats import read_vcf

    df = read_vcf(str(files / "test.vcf.gz"), info_keys=("VC", "CAF")).to_pandas()
    assert len(df) == 2  # malformed line dropped
    assert list(df["chr"]) == ["chr1", "chrX"]  # 'chr' normalize
    assert df.loc[df["id"] == "rs367896724", "CAF"].iloc[0] == "0.5747,0.4253"
    assert df.loc[df["id"] == "rs9999", "VC"].iloc[0] == "SNV"


def test_read_bed_one_based_shift(ray_session, files):
    from biocypher_metta_ray.sources.bio_formats import read_bed

    df = read_bed(str(files / "test.bed")).to_pandas()
    assert list(df["start"]) == [1, 1001]  # +1 shift (epd_adapter.py:39-40)
    assert list(df["end"]) == [1000, 2000]


def test_liftover_drop_on_miss(ray_session):
    from biocypher_metta_ray.stages.liftover import Liftover, synthetic_chain

    chain = synthetic_chain()
    df = pd.DataFrame(
        {
            "chr": ["chr1", "chr1", "chr1", "chr99"],
            # segment 0 (mapped), segment 3 (gap), segment 4 (mapped)
            "pos": [500_000, 3_500_000, 4_200_000, 100],
        }
    )
    lift = Liftover(chain)
    out = lift(df)
    starts, offsets, mapped = chain["chr1"]
    assert len(out) == 2
    assert lift.dropped == 2  # gap segment + unknown chromosome
    assert out.iloc[0]["pos_lifted"] == 500_000 + offsets[0]
    assert out.iloc[1]["pos_lifted"] == 4_200_000 + offsets[4]


def test_liftover_stage(ray_session):
    from biocypher_metta_ray.stages.liftover import liftover

    ds = ray.data.from_items(
        [{"chr": "chr2", "pos": 1_200_000}, {"chr": "chr2", "pos": 3_100_000}]
    )
    out = liftover(ds).to_pandas()
    assert "pos_lifted" in out.columns
    assert len(out) == 1  # the 3-4 Mb segment is a gap


def test_direction_and_alias_variants(ray_session, tmp_path):
    """Round-2 sub-semantics: transcribed_from / translation_of
    direction switches, reactome parent/child labels, gene alias map
    (gencode_adapter.py:122-131, uniprot_adapter.py:37-74,
    reactome_adapter.py:64-76, gencode_gene_adapter.py:96-100)."""
    import json

    from biocypher_metta_ray.kg.extractors import (
        gtf_gene_extractor,
        gtf_transcript_extractor,
        reactome_extractor,
    )

    gtf = tmp_path / "g.gtf"
    attrs = ('gene_id "ENSG1.2"; transcript_id "ENST9.1"; '
             'gene_name "ABC"; transcript_name "ABC-201"; gene_type "pc";')
    gtf.write_text(
        f"chr1\tsrc\tgene\t10\t90\t.\t+\t.\t{attrs}\n"
        f"chr1\tsrc\ttranscript\t10\t90\t.\t+\t.\t{attrs}\n"
    )
    fwd = gtf_transcript_extractor(str(gtf))["edges"].to_pandas()
    rev = gtf_transcript_extractor(
        str(gtf), direction="transcribed_from")["edges"].to_pandas()
    assert (fwd.iloc[0]["subj"], fwd.iloc[0]["obj"]) == ("ENSG1", "ENST9")
    assert (rev.iloc[0]["subj"], rev.iloc[0]["obj"]) == ("ENST9", "ENSG1")
    assert rev.iloc[0]["pred"] == "transcribed_from"

    rel = tmp_path / "rel.tsv"
    rel.write_text("R-HSA-1\tR-HSA-2\nNOPE-9\tR-HSA-3\n")
    parent = reactome_extractor(
        str(rel), label="parent_pathway_of")["edges"].to_pandas()
    child = reactome_extractor(
        str(rel), label="child_pathway_of")["edges"].to_pandas()
    assert list(zip(parent["subj"], parent["obj"])) == [("R-HSA-1", "R-HSA-2")]
    assert list(zip(child["subj"], child["obj"])) == [("R-HSA-2", "R-HSA-1")]

    genes = gtf_gene_extractor(
        str(gtf), alias_map={"ABC": ["alpha", "beta"]}
    )["nodes"].to_pandas()
    props = json.loads(genes.iloc[0]["props_json"])
    assert props["synonyms"] == ["alpha", "beta"]
