"""MeTTa-space smoke check mirroring the reference's only query
capability (scripts/metta_space_import.py:73-90): load the emitted
scripts and run property-fetch + window-scan matches."""

import pytest

import ray.data

from biocypher_metta_ray.kg.metta_check import (
    load_space,
    match_edges,
    match_node_properties,
    match_window,
    parse_sexpr,
)


def test_parse_sexpr():
    assert parse_sexpr("(gene ENSG1)") == ("gene", "ENSG1")
    assert parse_sexpr("(chr (gene G1) chr1)") == ("chr", ("gene", "G1"), "chr1")
    assert parse_sexpr("(syn (gene G1) (a b))") == ("syn", ("gene", "G1"), ("a", "b"))
    # escaped specials survive as literal characters
    assert parse_sexpr(r"(name (gene G1) a\(b\)c)") == ("name", ("gene", "G1"), "a(b)c")


@pytest.fixture(scope="module")
def space(ray_session, tmp_path_factory):
    from biocypher_metta_ray.kg.gazetteer import entities_table
    from biocypher_metta_ray.pipelines.kg import materialize_graph
    from biocypher_metta_ray.sources.corpus import read_documents_as_corpus

    out = str(tmp_path_factory.mktemp("metta_space"))
    corpus = read_documents_as_corpus("/root/testdata/sf0.001")
    entities = ray.data.from_arrow(entities_table())
    materialize_graph(corpus, entities, out, fingerprint="space-v1")
    return load_space(f"{out}/metta")


def test_space_loads_and_types_present(space):
    atoms = set(a for a in space if isinstance(a, tuple) and len(a) == 2)
    assert (":", ) not in atoms  # sanity
    assert any(a == ("gene", "ENTG0001") for a in space), "node atom present"


def test_property_fetch_query(space):
    # reference query (a): property fetch for one node
    edges = match_edges(space, "interacts_with")
    assert edges, "interacts_with edges emitted"
    src_t, src = edges[0][1]
    assert src_t == "protein"
    props = match_node_properties(space, *edges[0][1])
    assert isinstance(props, dict)


def test_window_scan_query(space):
    # reference query (b): numeric window scan over an edge property
    # (n_mentions) — rendered as (n_mentions (pred (t a) (t b)) N)
    hits = [
        a for a in space
        if isinstance(a, tuple) and len(a) == 3 and a[0] == "n_mentions"
        and float(a[2]) >= 3
    ]
    assert hits, "high-frequency edges found via window scan"
