"""Byte-identical extraction gate (BASELINE.md §2) + robustness."""

from biocypher_metta_ray.functions.html import extract_text, synthesize_html


def test_roundtrip_byte_identical():
    for i, text in enumerate(
        [
            "hello world",
            "multi para one\n\npara two\n\npara three",
            "specials & < > and &amp; entities",
            "unicode éèê 中文",
            "",
        ]
    ):
        url = f"https://site{i}.example/page/{i}"
        html = synthesize_html(url, text, "en")
        assert extract_text(html) == text, text


def test_deterministic_synthesis():
    a = synthesize_html("https://x.example/1", "same text", "en")
    b = synthesize_html("https://x.example/1", "same text", "en")
    assert a == b
    c = synthesize_html("https://x.example/2", "same text", "en")
    assert a != c  # per-url boilerplate variation


def test_malformed_inputs():
    assert extract_text(None) is None
    assert extract_text(b"\xff\xfe\x00bad utf8 \xff") is None


def test_fallback_no_article():
    html = (
        b"<html><head><script>junk()</script></head><body>"
        b"<nav><a href='/'>Home</a></nav>"
        b"<div>real content here</div>"
        b"<footer>foot</footer></body></html>"
    )
    out = extract_text(html)
    assert "real content here" in out
    assert "junk" not in out
    assert "Home" not in out
    assert "foot" not in out
