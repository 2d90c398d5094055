"""Hyperlink extraction + host-graph stages (stages/weblinks.py)."""

import pandas as pd
import pyarrow as pa
import ray.data

from biocypher_metta_ray.functions.html import (
    extract_links,
    host_of,
    synthesize_html,
)
from biocypher_metta_ray.stages.weblinks import host_graph, outlink_edges

BASE = "https://news.example/world/story/42"


def test_extract_links_resolution_cases():
    html = (
        b'<a href="https://other.example/x">abs</a> '
        b"<A HREF='//cdn.example/lib.js'>proto-rel</A> "
        b'<a class="nav" href="/about">root-rel</a> '
        b'<a href="next/page">rel</a> '
        b'<a href="mailto:a@b.c">mail</a> '
        b'<a href="javascript:void(0)">js</a> '
        b'<a href="">empty</a>'
    )
    assert extract_links(html, BASE) == [
        "https://other.example/x",
        "https://cdn.example/lib.js",
        "https://news.example/about",
        "https://news.example/world/story/next/page",
    ]


def test_extract_links_none_and_entity_unescape():
    assert extract_links(None, BASE) == []
    html = b'<a href="/q?a=1&amp;b=2">x</a>'
    assert extract_links(html, BASE) == ["https://news.example/q?a=1&b=2"]


def test_synthesized_page_has_six_anchors():
    url = "https://siteA.example/doc/7"
    links = extract_links(synthesize_html(url, "body text", "en"), url)
    assert len(links) == 6  # 5 nav + footer privacy
    assert links[-1] == "https://siteA.example/privacy"
    assert all(t.startswith("https://siteA.example/") for t in links)


def test_outlink_edges_and_host_graph(ray_session):
    u1 = "https://a.example/doc/1"
    u2 = "https://b.example/doc/2"
    corpus = ray.data.from_arrow(pa.table({
        "url": [u1, u2],
        "html": [
            b'<a href="/x">1</a><a href="/x">2</a>'
            b'<a href="https://b.example/y">3</a>',
            b'<a href="/z">1</a>',
        ],
    }))
    links = outlink_edges(corpus).to_pandas()
    got = links.sort_values(["url", "target"]).reset_index(drop=True)
    want = pd.DataFrame({
        "url": [u1, u1, u2],
        "target": ["https://a.example/x", "https://b.example/y",
                   "https://b.example/z"],
        "n_links": [2, 1, 1],
    })
    pd.testing.assert_frame_equal(got, want)

    hg = host_graph(corpus).to_pandas()
    hg = hg.sort_values(["src_host", "dst_host"]).reset_index(drop=True)
    assert hg.to_dict("list") == {
        "src_host": ["a.example", "a.example", "b.example"],
        "dst_host": ["a.example", "b.example", "b.example"],
        "n_links": [2, 1, 1],
    }
    assert host_of("https://a.example/x/y") == "a.example"


def test_extract_anchor_texts_strip_and_skip():
    from biocypher_metta_ray.functions.html import extract_anchor_texts

    html = (
        b'<a href="/x"><b>Bold</b> Label</a>'
        b'<a href="/y">a &amp; b</a>'
        b'<a href="javascript:x()">Nope</a>'
        b'<a href="/z"><img src="i.png"></a>'  # no visible text
    )
    assert extract_anchor_texts(html, BASE) == [
        ("https://news.example/x", "Bold Label"),
        ("https://news.example/y", "a & b"),
    ]
    assert extract_anchor_texts(None, BASE) == []


def test_anchor_text_table(ray_session):
    from biocypher_metta_ray.stages.weblinks import anchor_text_table

    corpus = ray.data.from_arrow(pa.table({
        "url": ["https://a.example/doc/1", "https://a.example/doc/2"],
        "html": [b'<a href="/p">Team</a><a href="/p">Team</a>',
                 b'<a href="/p">The Team</a>'],
    }))
    got = anchor_text_table(corpus).to_pandas() \
        .sort_values(["target", "anchor"]).reset_index(drop=True)
    assert got.to_dict("list") == {
        "target": ["https://a.example/p", "https://a.example/p"],
        "anchor": ["Team", "The Team"],
        "n_links": [2, 1],
    }
