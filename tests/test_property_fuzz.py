"""Property-based fuzzing (hypothesis) of the byte-fidelity kernels:
HTML synthesis/extraction roundtrip and MeTTa render/parse inversion."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from biocypher_metta_ray.functions.html import extract_text, synthesize_html
from biocypher_metta_ray.kg.metta_check import parse_sexpr
from biocypher_metta_ray.render import MettaRenderer, check_property
from biocypher_metta_ray.schema import SchemaRegistry

# article body text: printable unicode, no NUL; newlines allowed
text_strategy = st.text(
    alphabet=st.characters(
        exclude_categories=("Cs", "Cc"), include_characters="\n\t"
    ),
    max_size=400,
)


@settings(max_examples=200, deadline=None)
@given(text=text_strategy, url_i=st.integers(0, 10_000))
def test_html_roundtrip_fuzz(text, url_i):
    """Extraction must invert synthesis byte-for-byte for ANY body text
    — including text containing entities, tags, or blank lines."""
    url = f"https://fuzz{url_i % 97}.example/page/{url_i}"
    html = synthesize_html(url, text, "en")
    assert extract_text(html) == text


# property values: escapable strings, ints, floats (no NaN), nested
scalar = st.one_of(
    st.text(
        alphabet=string.ascii_letters + string.digits + " ()\\_-.",
        min_size=1, max_size=30,
    ),
    st.integers(-10**9, 10**9),
)
prop_key = st.text(alphabet=string.ascii_lowercase + "_", min_size=1, max_size=12)


@settings(max_examples=200, deadline=None)
@given(value=st.text(alphabet=string.printable, max_size=60))
def test_check_property_escaping_fuzz(value):
    """Escaped strings never contain an unescaped paren and always
    re-parse as a single token ending the atom correctly."""
    out = check_property(value)
    # every ( or ) must be preceded by a backslash
    i = 0
    while i < len(out):
        if out[i] == "\\":
            i += 2
            continue
        assert out[i] not in "()", (value, out)
        i += 1


@settings(max_examples=150, deadline=None)
@given(
    node_id=st.text(alphabet=string.ascii_letters + string.digits, min_size=1, max_size=16),
    props=st.dictionaries(prop_key, scalar, min_size=0, max_size=4),
)
def test_render_parse_inversion_fuzz(node_id, props):
    """Rendered node + property atoms re-parse into the same structure
    (parse_sexpr honors the writer's escaping)."""
    r = MettaRenderer(SchemaRegistry())
    lines = r.render_node(node_id, "gene", props)
    head = parse_sexpr(lines[0])
    assert head == ("gene", node_id)
    emitted = {}
    for line in lines[1:]:
        atom = parse_sexpr(line)
        assert atom[1] == ("gene", node_id)
        emitted[atom[0]] = atom[2]
    # every non-empty property is present; string values roundtrip
    # modulo the writer's space->underscore normalization
    for k, v in props.items():
        if v is None or v == "":
            continue
        if isinstance(v, str):
            assert emitted[k] == v.replace(" ", "_")
        else:
            assert emitted[k] == str(v)
