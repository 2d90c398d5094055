"""OWL (RDF/XML) ontology source: parser, to_key, restriction
rewriting, subontology pass, dry_run — mirrors
/root/reference/biocypher_metta/adapters/ontologies_adapter.py
semantics with the deviations documented in sources/owl.py."""

import json

import pandas as pd
import pytest

from biocypher_metta_ray.sources.owl import (
    ontology_edges,
    ontology_terms,
    parse_owl_xml,
    read_owl_triples,
    to_key,
)

OBO = "http://purl.obolibrary.org/obo/"

FIXTURE = f"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#"
         xmlns:oboInOwl="http://www.geneontology.org/formats/oboInOwl#"
         xmlns:obo="{OBO}">
  <owl:Class rdf:about="{OBO}GO_0000001">
    <rdfs:label>mitochondrion inheritance</rdfs:label>
    <obo:IAO_0000115>The distribution of mitochondria.</obo:IAO_0000115>
    <oboInOwl:hasOBONamespace>biological_process</oboInOwl:hasOBONamespace>
    <oboInOwl:hasExactSynonym>mitochondrial inheritance</oboInOwl:hasExactSynonym>
    <oboInOwl:hasRelatedSynonym>mito passing</oboInOwl:hasRelatedSynonym>
    <oboInOwl:hasDbXref>EC:1.2.3.4</oboInOwl:hasDbXref>
    <rdfs:subClassOf rdf:resource="{OBO}GO_0048308"/>
    <rdfs:subClassOf>
      <owl:Restriction>
        <owl:onProperty rdf:resource="{OBO}BFO_0000050"/>
        <owl:someValuesFrom rdf:resource="{OBO}GO_0048311"/>
      </owl:Restriction>
    </rdfs:subClassOf>
    <rdfs:subClassOf>
      <owl:Restriction>
        <owl:onProperty rdf:resource="{OBO}RO_0002211"/>
        <owl:someValuesFrom rdf:resource="{OBO}GO_0099999"/>
      </owl:Restriction>
    </rdfs:subClassOf>
  </owl:Class>
  <owl:Class rdf:about="{OBO}GO_0048308">
    <rdfs:label>organelle inheritance</rdfs:label>
    <oboInOwl:hasOBONamespace>biological_process</oboInOwl:hasOBONamespace>
  </owl:Class>
  <owl:Class rdf:about="{OBO}GO_0048311">
    <rdfs:label>mitochondrion distribution</rdfs:label>
    <rdfs:subClassOf>
      <owl:Restriction>
        <owl:onProperty rdf:resource="{OBO}BFO_0000051"/>
        <owl:allValuesFrom rdf:resource="{OBO}GO_0000001"/>
      </owl:Restriction>
    </rdfs:subClassOf>
  </owl:Class>
</rdf:RDF>
"""


def test_to_key_reference_semantics():
    assert to_key(f"{OBO}GO_0000001") == "GO:0000001"
    assert to_key("http://x/12345") == "number_12345"
    assert to_key("http://a#b?c=d") == "a.b:c:d"


def test_parse_triples():
    triples = parse_owl_xml(FIXTURE)
    df = pd.DataFrame(
        triples, columns=["seq", "subj", "pred", "obj", "is_literal"]
    )
    # typed node elements emit rdf:type; restriction bnodes are typed
    types = df[df["pred"].str.endswith("#type")]
    assert (types["obj"] == "http://www.w3.org/2002/07/owl#Class").sum() == 3
    assert (
        types["obj"] == "http://www.w3.org/2002/07/owl#Restriction"
    ).sum() == 3
    # literal vs resource objects
    lab = df[(df["pred"].str.endswith("label"))]
    assert lab["is_literal"].all()


@pytest.fixture(scope="module")
def owl_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("owl") / "fixture.owl"
    p.write_text(FIXTURE)
    return str(p)


def test_ontology_terms(ray_session, owl_file):
    triples = read_owl_triples(owl_file)
    terms = ontology_terms(triples, label="go", subontologies=True).to_pandas()
    ids = set(terms["id"])
    # every URI node (subjects + resource objects incl. BFO properties)
    assert {"GO:0000001", "GO:0048308", "GO:0048311", "BFO:0000050",
            "BFO:0000051"} <= ids
    row = terms[terms["id"] == "GO:0000001"].iloc[0]
    props = json.loads(row["props_json"])
    assert props["term_name"] == "mitochondrion inheritance"
    assert props["description"] == "The distribution of mitochondria."
    # reference order: related + exact (ontologies_adapter.py:76)
    assert props["synonyms"] == ["mito passing", "mitochondrial inheritance"]
    assert props["subontology"] == "biological_process"
    # nodes without namespace annotation -> None (GO adapter behavior)
    p311 = json.loads(
        terms[terms["id"] == "GO:0048311"].iloc[0]["props_json"]
    )
    assert p311["subontology"] is None


def test_ontology_edges_restriction_rewrite(ray_session, owl_file):
    triples = read_owl_triples(owl_file)
    edges = ontology_edges(triples, label="go_subclass").to_pandas()
    got = set(zip(edges["subj"], edges["pred"], edges["obj"]))
    # plain subclass edge
    assert ("GO:0000001", "subclass", "GO:0048308") in got
    # BFO_0000050 restriction -> part_of
    assert ("GO:0000001", "part_of", "GO:0048311") in got
    # allValuesFrom restriction honored (deviation 2)
    assert ("GO:0048311", "has_part", "GO:0000001") in got
    # RO_0002211 restriction is not in RESTRICTION_PREDICATES -> dropped,
    # never emitted as a blank-node edge (deviation 1)
    assert not any(o.startswith("_:") for o in edges["obj"])
    assert not any("GO:0099999" == o for o in edges["obj"])
    # dbxref edges are dropped by default (reference behavior)
    assert "dbxref" not in set(edges["pred"])
    rel = json.loads(
        edges[(edges["pred"] == "part_of")].iloc[0]["props_json"]
    )
    assert rel["rel_type"] == "part_of"


def test_ontology_edges_xrefs_opt_in(ray_session, owl_file):
    triples = read_owl_triples(owl_file)
    edges = ontology_edges(triples, include_xrefs=True).to_pandas()
    x = edges[edges["pred"] == "dbxref"]
    assert list(x["obj"]) == ["EC:1.2.3.4"]


def test_dry_run_truncation(ray_session, tmp_path):
    # 150 classes -> dry_run keeps the first 101 in document order
    classes = "\n".join(
        f'<owl:Class rdf:about="{OBO}T_{i:07d}">'
        f"<rdfs:label>t{i}</rdfs:label></owl:Class>"
        for i in range(150)
    )
    xml = (
        '<?xml version="1.0"?>\n<rdf:RDF '
        'xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#" '
        'xmlns:owl="http://www.w3.org/2002/07/owl#">'
        + classes + "</rdf:RDF>"
    )
    p = tmp_path / "big.owl"
    p.write_text(xml)
    triples = read_owl_triples(str(p))
    terms = ontology_terms(triples, dry_run=True).to_pandas()
    assert len(terms) == 101
    # document order: T_0000000 (subject of triple 0), then owl.Class
    # (object of triple 0 — rdflib all_nodes() includes type objects),
    # then T_0000001..T_0000099
    assert set(terms["id"]) == (
        {f"T:{i:07d}" for i in range(100)} | {"owl.Class"}
    )
    assert list(terms["id"])[:2] == ["T:0000000", "owl.Class"]


def test_hierarchy_with_ontology_parents():
    """Ancestor chains ABOVE the schema roots (the reference gets them
    from BioCypher's biolink ontology graph, metta_writer.py:31-42)."""
    from biocypher_metta_ray.schema import (
        BIOLINK_CORE_PARENTS,
        SchemaRegistry,
        ontology_parents_from_edges,
    )

    reg = SchemaRegistry()
    base = reg.hierarchy_lines()
    assert "(: NAMED_THING Type)" in base
    ext = reg.hierarchy_lines(BIOLINK_CORE_PARENTS)
    assert "(: ENTITY Type)" in ext
    assert "(<: NAMED_THING ENTITY)" in ext
    assert "(<: ASSOCIATION ENTITY)" in ext
    assert "(: NAMED_THING Type)" not in ext
    # ontology-only types render before schema types
    assert ext.index("(: ENTITY Type)") < ext.index("(<: NAMED_THING ENTITY)")

    import pandas as pd

    edges = pd.DataFrame(
        {
            "subj": ["gene product", "gene product"],
            "pred": ["subclass", "part_of"],
            "obj": ["biological entity", "cell"],
        }
    )
    onto = ontology_parents_from_edges(edges)
    assert onto == {"gene product": "biological entity",
                    "biological entity": None}


def test_multi_file_bnode_isolation(ray_session, tmp_path):
    """Per-file bnode namespaces: file A's non-rewritable restriction
    must NOT resolve against file B's restriction map entry."""
    a = (
        '<?xml version="1.0"?><rdf:RDF '
        'xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#" '
        'xmlns:owl="http://www.w3.org/2002/07/owl#">'
        f'<owl:Class rdf:about="{OBO}GO_A"><rdfs:subClassOf>'
        '<owl:Restriction>'
        f'<owl:onProperty rdf:resource="{OBO}RO_0009999"/>'
        f'<owl:someValuesFrom rdf:resource="{OBO}GO_X"/>'
        "</owl:Restriction></rdfs:subClassOf></owl:Class></rdf:RDF>"
    )
    b = a.replace("GO_A", "GO_B").replace(
        "RO_0009999", "BFO_0000050"
    ).replace("GO_X", "GO_Y")
    (tmp_path / "a.owl").write_text(a)
    (tmp_path / "b.owl").write_text(b)
    triples = read_owl_triples(str(tmp_path))
    edges = ontology_edges(triples).to_pandas()
    got = set(zip(edges["subj"], edges["pred"], edges["obj"]))
    # file B's part_of restriction rewrites; file A's RO_ one drops
    assert got == {("GO:B", "part_of", "GO:Y")}
