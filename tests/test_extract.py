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


EDGE_BODIES = [
    b"<html><body><p>plain</p></body></html>",
    b'<a href="/x">quoted</a><a href=\'/y\'>single</a><a href=/z>bare</a>',
    b"<A HREF='/up'>UPPER tags</A><IMG SRC='/m.png'>",
    b"<!-- <a href='/ghost'>comment</a> --><a href='/real'>r</a>",
    b"<!DOCTYPE html><html><body><p>doc</p></body></html>",
    b"<img src='/self.png'/><video src='/v.mp4'/>",
    b"<a href='/open'>never closed",
    b"<script>var x = '<a href=/no>'</script><p>after script</p>",
    b"<style>a { color: red }</style><title>skip me</title><p>kept</p>",
    b"<p>ent &amp; ities &lt;kept&gt;</p><a href='/e?a=1&amp;b=2'>ent link</a>",
    b"<head><base href='http://other.example.com/base/'></head><a href='rel'>r</a>",
    b"<a href='/a'><b>bold <i>nested</i></b> text</a>",
    b"<p>text with  runs\n\nand breaks</p><br><hr/>",
    b"<a href=\"/attr\" title=\"x > y\">gt in attr</a>",
    b"<a href='/dup' href='/dup2'>dup attr</a>",
    b"<td>table</td><a href='p1.html'>dotted rel</a><a href='../up'>dots</a>",
    b"<a href='#'>anchor only</a><a href='?q=1'>query only</a>",
    b"",
    b"just text no tags at all",
    # unquoted attribute values ending in '/' are NOT self-closing markers
    # (the slash is part of the value in the stdlib tokenizer)
    b"<a href=/z/>x</a>",
    b"<a href=http://h/p/>y</a>",
    b"<img src=a.png/>",
    b"<a href=/docs//>double slash</a>",
    b"<a href=/spaced />self-closed after space",
    b'<a href="/quoted"/>self-closed after quote',
    # a '/' glued to a bare attribute NAME self-closes (no '=' in the tail)
    b"<a data-x/>x</a>",
    b"<a href='/q'data-y/>z</a>",
    b"<a href=/docs/ data/>w",
    b"<a href=x y=/z/>v</a>",
    # rel=canonical declarations: relative, absolute, self-closed, repeated
    # (first wins), wrong rel ignored, unquoted values
    b'<link rel="canonical" href="/main">x',
    b'<link rel="canonical" href="http://other.com/m"/>x',
    b'<link rel=canonical href=/m>x',
    b'<link rel="canonical" href="/one"><link rel="canonical" href="/two">',
    b'<link rel="stylesheet" href="/style.css">x',
    b'<link href="/nope">x',
    # meta robots directives + rel=nofollow anchors, quoted and not
    b'<meta name="robots" content="noindex">x',
    b'<meta name="robots" content="NOINDEX, NOFOLLOW">x',
    b'<meta name=robots content=nofollow>x',
    b'<meta name="robots" content="none">x',
    b'<meta name="viewport" content="noindex">x',
    b'<a href="/s" rel="nofollow">s</a><a href="/t" rel="ugc nofollow">t</a>',
    b'<a href=/u rel=nofollow>u</a>',
]


def test_fast_parser_matches_stdlib():
    """The fast regex tokenizer and the stdlib html.parser drive the same
    handler; spans, links, and anchor text must be identical across every
    scenario web, the skewed corpus, and edge-case bodies."""
    from cloud_crawler_ray.synthweb import make_skewed_web
    from tests import webs

    bodies: list[tuple[str, bytes]] = []
    for maker in (
        webs.small_dag, webs.offdomain_web, webs.redirect_web, webs.query_web,
        webs.robots_web, webs.auth_web, webs.cookie_gate_web, webs.dead_link_web,
        webs.branching_web,
    ):
        web, _seeds = maker()
        for url, body, ct in zip(
            web.column("url").to_pylist(),
            web.column("body").to_pylist(),
            web.column("content_type").to_pylist(),
        ):
            if ct.startswith("text/html"):
                bodies.append((url, body))
    skew, _ = make_skewed_web(300, n_hosts=5, seed=21)
    for url, body in zip(
        skew.column("url").to_pylist()[:300], skew.column("body").to_pylist()[:300]
    ):
        bodies.append((url, body))
    for i, b in enumerate(EDGE_BODIES):
        bodies.append((f"http://www.example.com/edge{i}", b))

    for url, body in bodies:
        fast = extract_page(url, body, "text/html", tokenizer="fast")
        slow = extract_page(url, body, "text/html", tokenizer="stdlib")
        assert fast.spans == slow.spans, (url, body)
        assert fast.links == slow.links, (url, body)
        assert fast.anchor_text == slow.anchor_text, (url, body)
        assert fast.canonical == slow.canonical, (url, body)
        assert fast.noindex == slow.noindex, (url, body)
        assert fast.nofollow_all == slow.nofollow_all, (url, body)
        assert fast.nofollow == slow.nofollow, (url, body)
