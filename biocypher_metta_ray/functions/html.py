"""Deterministic HTML synthesis and boilerplate-removing text extraction.

The engine's input contract (BASELINE.json ``input_hint``) is a Parquet
table of Common-Crawl-style pages ``(url, warc_ts, html:binary, text,
lang)`` where ``text`` is the ground-truth article body. The
correctness gate is **byte-identical extracted text per url**: the
extractor must be a pure deterministic function of the ``html`` bytes
(reference analogue: every adapter's parse step is a pure function of
its input line, e.g. /root/reference/biocypher_metta/adapters/
gencode_gene_adapter.py:86-119).

``synthesize_html`` is the inverse generator used to build test/bench
corpora: it wraps an article body in deterministic per-url boilerplate
(nav, sidebar, scripts, footer) so extraction is a real
boilerplate-removal problem, not a no-op.

Both functions are pure; all regexes are compiled at import time so
``map_batches`` tasks pay compilation once per process.
"""

from __future__ import annotations

import hashlib
import html as _htmllib
import re

_NAV_WORDS = (
    "Home", "About", "Archive", "Contact", "Privacy", "Terms", "Jobs",
    "Press", "Help", "Sitemap", "Login", "Subscribe",
)

_SIDEBARS = (
    "Subscribe to our newsletter for weekly updates.",
    "Trending: top stories this hour.",
    "Advertisement — your ad could be here.",
    "Follow us on social media for more.",
)


def _site_of(url: str) -> str:
    # https://site123.example/page/456 -> site123.example
    rest = url.split("://", 1)[-1]
    return rest.split("/", 1)[0]


def synthesize_html(url: str, text: str, lang: str) -> bytes:
    """Deterministically wrap an article body in boilerplate HTML.

    Pure function of (url, text, lang); per-url variation of the
    boilerplate is derived from md5(url) so different pages have
    different nav/sidebar chrome but the same page always gets the
    same bytes.
    """
    h = int.from_bytes(hashlib.md5(url.encode("utf-8")).digest()[:4], "big")
    site = _site_of(url)
    nav_items = "".join(
        f'<li><a href="/{w.lower()}">{w}</a></li>'
        for w in (_NAV_WORDS[(h + i) % len(_NAV_WORDS)] for i in range(5))
    )
    sidebar = _SIDEBARS[h % len(_SIDEBARS)]
    title = f"Page {h % 100000} — {site}"
    paragraphs = "".join(
        f"<p>{_htmllib.escape(p, quote=False)}</p>"
        for p in text.split("\n\n")
    )
    doc = (
        "<!DOCTYPE html>\n"
        f'<html lang="{lang}">\n'
        f"<head><meta charset=\"utf-8\"><title>{_htmllib.escape(title, quote=False)}</title>\n"
        f"<script>var _t={h};window.analytics&&analytics.page(_t);</script>\n"
        "<style>.nav li{display:inline;padding:4px}.side{float:right}</style>\n"
        "</head>\n<body>\n"
        f'<nav class="nav"><ul>{nav_items}</ul></nav>\n'
        f'<aside class="side">{sidebar}</aside>\n'
        f"<article>{paragraphs}</article>\n"
        f"<footer>&copy; 2024 {site} — all rights reserved. "
        f'<a href="/privacy">Privacy</a></footer>\n'
        f"<script>loadComments({h % 977});</script>\n"
        "</body></html>\n"
    )
    return doc.encode("utf-8")


_ARTICLE_RE = re.compile(rb"<article[^>]*>(.*?)</article>", re.S)
_P_RE = re.compile(r"<p[^>]*>(.*?)</p>", re.S)
_DROP_BLOCK_RE = re.compile(
    r"<(script|style|nav|header|footer|aside|noscript|form|iframe)[^>]*>"
    r".*?</\1>",
    re.S | re.I,
)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"[ \t\r\f\v]*\n[ \t\r\f\v]*")
_MULTI_NL_RE = re.compile(r"\n{3,}")


def extract_text(html_bytes: bytes | None) -> str | None:
    """Extract the article body from raw HTML bytes.

    Deterministic, pure, trafilatura-style two-tier strategy:

    1. If an ``<article>`` element exists, the body is the
       entity-unescaped concatenation of its ``<p>`` children joined by
       blank lines (exact inverse of :func:`synthesize_html`, pinning
       the byte-identical-per-url gate).
    2. Otherwise fall back to dropping script/style/nav/header/footer/
       aside/form blocks, stripping the remaining tags, unescaping
       entities and collapsing whitespace.

    Returns ``None`` for undecodable/malformed input (the caller counts
    and drops the row — per-row log-and-skip, mirroring
    /root/reference/biocypher_metta/adapters/gtex_eqtl_adapter.py:93-95).
    """
    if html_bytes is None:
        return None
    try:
        m = _ARTICLE_RE.search(html_bytes)
        if m is not None:
            inner = m.group(1).decode("utf-8")
            paras = _P_RE.findall(inner)
            if paras:
                return "\n\n".join(_htmllib.unescape(p) for p in paras)
            body = inner
        else:
            body = html_bytes.decode("utf-8")
            body = _DROP_BLOCK_RE.sub(" ", body)
        body = _TAG_RE.sub(" ", body)
        body = _htmllib.unescape(body)
        body = _WS_RE.sub("\n", body)
        body = _MULTI_NL_RE.sub("\n\n", body)
        body = re.sub(r"[ \t]+", " ", body).strip()
        return body if body else None
    except (UnicodeDecodeError, ValueError):
        return None


_HREF_RE = re.compile(rb"""<a\s[^>]*?href\s*=\s*["']([^"'#>]+)["']""", re.I)
_ANCHOR_RE = re.compile(
    rb"""<a\s[^>]*?href\s*=\s*["']([^"'#>]+)["'][^>]*>(.*?)</a>""",
    re.I | re.S,
)


def _resolve_href(
    href: str, scheme: str, host: str, base_dir: str
) -> str | None:
    """Absolute URL for one href, or None for pseudo-links/empties."""
    href = href.strip()
    if not href:
        return None
    low = href.lower()
    if low.startswith(("javascript:", "mailto:", "data:", "tel:")):
        return None
    if "://" in href:
        return href
    if href.startswith("//"):
        return f"{scheme}:{href}"
    if href.startswith("/"):
        return f"{scheme}://{host}{href}"
    return f"{base_dir}/{href}"


def extract_links(html_bytes: bytes | None, base_url: str) -> list[str]:
    """Extract every ``<a href=...>`` target from raw HTML bytes,
    resolved to an absolute URL against ``base_url`` — the hyperlink
    edge source for web-graph construction (one emitted row per anchor
    OCCURRENCE; callers aggregate counts).

    Pure and deterministic (the byte-identical-per-url discipline of
    :func:`extract_text` applies). Resolution covers the cases a crawl
    actually contains: absolute ``scheme://``, protocol-relative
    ``//host/...``, root-relative ``/path`` and relative ``path``
    (resolved against the base url's directory). ``javascript:`` /
    ``mailto:`` / ``data:`` pseudo-links are dropped. Undecodable
    anchors are skipped row-locally (log-and-skip per-row policy).
    """
    if html_bytes is None:
        return []
    out: list[str] = []
    scheme, _, rest = base_url.partition("://")
    host = rest.split("/", 1)[0]
    base_dir = base_url.rsplit("/", 1)[0] if "/" in rest else base_url
    for m in _HREF_RE.finditer(html_bytes):
        try:
            href = _htmllib.unescape(m.group(1).decode("utf-8"))
        except UnicodeDecodeError:
            continue
        target = _resolve_href(href, scheme, host, base_dir)
        if target is not None:
            out.append(target)
    return out


def extract_anchor_texts(
    html_bytes: bytes | None, base_url: str
) -> list[tuple[str, str]]:
    """``(resolved target, visible anchor text)`` per ``<a>`` element —
    the raw material of the anchor-text alias table (anchor text is the
    classic web-scale surface-form source for entity linking: how the
    web refers to a target page). Inner markup is stripped, entities
    unescaped, whitespace collapsed; anchors with empty visible text or
    pseudo hrefs are dropped. Same purity/skip discipline as
    :func:`extract_links`.
    """
    if html_bytes is None:
        return []
    out: list[tuple[str, str]] = []
    scheme, _, rest = base_url.partition("://")
    host = rest.split("/", 1)[0]
    base_dir = base_url.rsplit("/", 1)[0] if "/" in rest else base_url
    for m in _ANCHOR_RE.finditer(html_bytes):
        try:
            href = _htmllib.unescape(m.group(1).decode("utf-8"))
            inner = m.group(2).decode("utf-8")
        except UnicodeDecodeError:
            continue
        target = _resolve_href(href, scheme, host, base_dir)
        if target is None:
            continue
        text = _htmllib.unescape(_TAG_RE.sub(" ", inner))
        text = re.sub(r"\s+", " ", text).strip()
        if text:
            out.append((target, text))
    return out


def host_of(url: str) -> str:
    """Registrable host of an absolute URL (scheme and path stripped)."""
    return _site_of(url)
