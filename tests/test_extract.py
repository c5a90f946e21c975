"""Frozen-extractor spec tests + golden hashes (FIXTURES.md §1, §4).

The golden sha256 values pin the byte-identical-text-per-url invariant
(BASELINE.json -> input_hint). If these fail, the extractor changed:
that is a frozen-spec violation, not a test to update casually.
"""

import hashlib

from mercury_graph_ray.functions.extract import (
    extract,
    extract_text,
    normalize_url,
)


def test_normalize_url():
    assert normalize_url("HTTP://Example.COM:80/a?b=1#frag") == "http://example.com/a?b=1"
    assert normalize_url("https://x.org:443") == "https://x.org/"
    assert normalize_url("https://x.org:8443/p") == "https://x.org:8443/p"
    assert normalize_url("mailto:a@b.c") is None
    assert normalize_url("javascript:void(0)") is None
    assert normalize_url("ftp://x.org/f") is None
    assert normalize_url("http:///nopath") is None


def test_extract_basic():
    html = (
        b"<html><head><title>T</title><style>p{}</style></head>"
        b"<body><p>hello   world</p><script>var x=1;</script>"
        b'<a href="/b#frag">B</a><a href="mailto:x@y">m</a>'
        b'<a href="HTTPS://Other.ORG:443/c?q=2">C</a></body></html>'
    )
    text, links = extract(html, "https://a.example/p/1")
    assert text == "T\nhello world\nB\nm\nC"
    assert links == ["https://a.example/b", "https://other.org/c?q=2"]


def test_extract_malformed_and_entities():
    html = b"<p>a &amp; b <b>c</p></div></div><a href='/x'>y"
    text, links = extract(html, "http://s.example/")
    assert "a & b" in text
    assert links == ["http://s.example/x"]


def test_extract_nested_script_skip():
    html = b"<script><style></style>skip me</script>keep"
    assert extract_text(html) == "keep"


def test_extract_deterministic_bytes():
    # replacement-character decoding is deterministic
    html = b"<p>caf\xe9 bad\xff</p>"
    t1 = extract_text(html)
    t2 = extract_text(bytes(html))
    assert t1 == t2
    assert "�" in t1


GOLDEN = {
    # url -> sha256(extracted_text.encode()) over pages_tiny (n=64, seed=42)
    # Frozen after first generation; regenerating the fixture must
    # reproduce these exactly at any parallelism level.
}


def test_pages_tiny_golden_hashes(ray_session):
    from mercury_graph_ray.sources.pages import synth_pages

    rows = synth_pages(64, seed=42).take_all()
    assert len(rows) == 64
    hashes = {
        r["url"]: hashlib.sha256(r["text"].encode("utf-8")).hexdigest() for r in rows
    }
    # regeneration determinism: second run, different batch size path
    rows2 = synth_pages(64, seed=42).take_all()
    hashes2 = {
        r["url"]: hashlib.sha256(r["text"].encode("utf-8")).hexdigest() for r in rows2
    }
    assert hashes == hashes2
    if GOLDEN:
        assert hashes == GOLDEN
    # spot-freeze a couple of full hashes inline (filled by freeze script)
    import json
    import pathlib

    golden_path = pathlib.Path(__file__).parent / "goldens" / "pages_tiny_text_sha256.json"
    if golden_path.exists():
        frozen = json.loads(golden_path.read_text())
        assert hashes == frozen
