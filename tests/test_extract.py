"""Extraction tests — span ordering, link dedup, base resolution, content-type
gating. Mirrors page_spec.rb:25-205 scenarios plus the interleaved-span
payload from BASELINE.json input_hint."""

from cloud_crawler_ray.extract import extract_page, find_base, is_parseable
from cloud_crawler_ray.synthweb import FakePage, render_body

URL = "http://www.example.com/index"


def test_spans_interleaved_order():
    body = (
        b"<html><body><p>first run</p>"
        b'<a href="/a">anchor A</a>'
        b"<p>second run</p>"
        b'<img src="/i.png">'
        b'<video src="/v.mp4">'
        b"tail text</body></html>"
    )
    ex = extract_page(URL, body, "text/html")
    kinds = [(s[0], s[1], s[2]) for s in ex.spans]
    assert kinds == [
        ("text", "first run", ""),
        ("link", "anchor A", "http://www.example.com/a"),
        ("text", "second run", ""),
        ("image", "", "http://www.example.com/i.png"),
        ("video", "", "http://www.example.com/v.mp4"),
        ("text", "tail text", ""),
    ]
    assert [s[3] for s in ex.spans] == list(range(6))


def test_links_doc_order_uniq_keep_first():
    body = (
        b'<html><body><a href="/b">B</a><a href="/a">A</a>'
        b'<a href="/b">B again</a></body></html>'
    )
    ex = extract_page(URL, body, "text/html")
    assert ex.links == ["http://www.example.com/b", "http://www.example.com/a"]
    assert ex.anchor_text["http://www.example.com/b"] == "B"


def test_base_href_resolution():
    body = b'<html><head><base href="http://other.com/dir/"></head><body><a href="x">X</a></body></html>'
    assert find_base(body) == "http://other.com/dir/"
    ex = extract_page(URL, body, "text/html")
    assert ex.links == ["http://other.com/dir/x"]


def test_non_html_yields_nothing():
    assert extract_page(URL, b"plain words", "text/plain").spans == []
    assert extract_page(URL, b"<a href='/x'>x</a>", "image/png").links == []
    assert is_parseable("text/html; charset=utf-8")
    assert not is_parseable("text/plain")


def test_anchor_strip_and_query_kept():
    body = b'<html><body><a href="/p#sec">s</a><a href="/q?x=1">q</a></body></html>'
    ex = extract_page(URL, body, "text/html")
    assert ex.links == ["http://www.example.com/p", "http://www.example.com/q?x=1"]


def test_invalid_utf8_scrubbed():
    body = b"<html><body><p>ok \xff\xfe text</p></body></html>"
    ex = extract_page(URL, body, "text/html")
    assert ex.spans[0][1] == "ok text"


def test_fakepage_render_roundtrip():
    p = FakePage(name="p1", links=["p2", "p3"], media=[("img", "/m.png")])
    ex = extract_page(p.url, render_body(p), "text/html")
    assert ex.links == [
        "http://www.example.com/p2",
        "http://www.example.com/p3",
    ]
    kinds = [s[0] for s in ex.spans]
    assert "image" in kinds and "link" in kinds and "text" in kinds
