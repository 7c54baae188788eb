"""Incremental recrawl: conditional GET (If-None-Match → 304), prior-link
replay through unchanged regions, document fill from the prior corpus, and
recrawl chains. Target-side addition (the reference always refetches);
semantics pinned against the sequential oracle on both planners."""

import pyarrow.compute as pc

from cloud_crawler_ray.oracle import (
    SyntheticNet,
    crawl_oracle,
    etag_of,
    fetch_chain,
    prior_from_result,
)
from cloud_crawler_ray.pipelines.crawl import crawl, open_crawl
from cloud_crawler_ray.spec import CrawlSpec
from cloud_crawler_ray.synthweb import FakePage, page_url, web_table

from tests.test_crawl_engine import assert_parity


def versioned_webs():
    """v1 → v2: a1 changes content (reachable only through UNCHANGED
    home→a, so reaching it requires link replay through two 304s); c gains
    a link to the new page d; b and everything else is unchanged."""
    v1 = web_table(
        [
            FakePage(name="home", links=["a", "b", "c"]),
            FakePage(name="a", links=["a1"]),
            FakePage(name="a1", texts=["alpha version one"]),
            FakePage(name="b", texts=["beta stays the same"]),
            FakePage(name="c", texts=["gamma v1"]),
        ]
    )
    v2 = web_table(
        [
            FakePage(name="home", links=["a", "b", "c"]),
            FakePage(name="a", links=["a1"]),
            FakePage(name="a1", texts=["alpha version two CHANGED"]),
            FakePage(name="b", texts=["beta stays the same"]),
            FakePage(name="c", texts=["gamma v2"], links=["d"]),
            FakePage(name="d", texts=["delta is new"]),
        ]
    )
    return v1, v2, [page_url("home")]


def _codes(handle) -> dict[str, int]:
    return {
        r["url"]: r["code"]
        for r in handle.pages().take_all()
    }


def test_etag_unit():
    assert etag_of(b"xyz", "text/html") == etag_of(b"xyz", "text/html")
    assert etag_of(b"xyz", "text/html") != etag_of(b"xyzz", "text/html")
    assert etag_of(b"xyz", "text/html") != etag_of(b"xyz", "text/plain")

    web = web_table([FakePage(name="p", texts=["hello"])])
    net = SyntheticNet(web)
    first = fetch_chain(net, page_url("p"), 0, "", 5)[-1]
    assert first.code == 200 and first.etag.startswith('W/"')
    again = fetch_chain(net, page_url("p"), 0, "", 5, prior_etag=first.etag)[-1]
    assert again.code == 304 and again.not_modified and again.body == b""
    assert again.etag == first.etag
    assert again.clock_ms == first.clock_ms  # validation costs the round trip
    stale = fetch_chain(net, page_url("p"), 0, "", 5, prior_etag='W/"deadbeef"')[-1]
    assert stale.code == 200 and not stale.not_modified


def _run_recrawl(v1, v2, seeds, spec, tmp_path, **kw):
    res1 = crawl_oracle(v1, seeds, spec)
    res2 = crawl_oracle(v2, seeds, spec, prior=prior_from_result(res1))
    out1, out2 = str(tmp_path / "one"), str(tmp_path / "two")
    crawl(v1, seeds, spec, out1, **kw)
    h2 = crawl(v2, seeds, spec, out2, prior_dir=out1, **kw)
    return res2, h2


def test_recrawl_parity_local_planner(ray_session, tmp_path):
    v1, v2, seeds = versioned_webs()
    spec = CrawlSpec(delay=0.05)
    res2, h2 = _run_recrawl(v1, v2, seeds, spec, tmp_path)
    assert_parity(res2, h2)
    codes = _codes(h2)
    # unchanged pages validate to 304; changed/new pages refetch fully
    assert codes[page_url("home")] == 304
    assert codes[page_url("a")] == 304
    assert codes[page_url("b")] == 304
    assert codes[page_url("a1")] == 200  # changed behind two 304 hops
    assert codes[page_url("c")] == 200   # changed (gained a link)
    assert codes[page_url("d")] == 200   # brand new
    # 304 documents fill from the prior corpus: b's spans are non-empty
    docs = {r["doc_id"]: r["spans"] for r in h2.documents().take_all()}
    assert any(s["text"] == "beta stays the same" for s in docs[page_url("b")])
    assert any("version two" in s["text"] for s in docs[page_url("a1")])


def test_recrawl_parity_distributed_planner(ray_session, tmp_path):
    v1, v2, seeds = versioned_webs()
    spec = CrawlSpec(delay=0.05)
    res2, h2 = _run_recrawl(
        v1, v2, seeds, spec, tmp_path, small_wave_threshold=0
    )
    assert_parity(res2, h2)
    assert _codes(h2)[page_url("d")] == 200


def test_recrawl_chain_and_open_crawl(ray_session, tmp_path):
    # v1 → v2 → v3: in v3 only a1 changes again; everything else (incl. d,
    # first seen in v2) validates. Document fill recurses v3 → v2 → v1
    # through meta.json prior links, exercised via open_crawl from disk.
    v1, v2, seeds = versioned_webs()
    v3 = web_table(
        [
            FakePage(name="home", links=["a", "b", "c"]),
            FakePage(name="a", links=["a1"]),
            FakePage(name="a1", texts=["alpha version three"]),
            FakePage(name="b", texts=["beta stays the same"]),
            FakePage(name="c", texts=["gamma v2"], links=["d"]),
            FakePage(name="d", texts=["delta is new"]),
        ]
    )
    spec = CrawlSpec(delay=0.05)
    res1 = crawl_oracle(v1, seeds, spec)
    res2 = crawl_oracle(v2, seeds, spec, prior=prior_from_result(res1))
    res3 = crawl_oracle(v3, seeds, spec, prior=prior_from_result(res2))
    out1, out2, out3 = (str(tmp_path / k) for k in ("one", "two", "three"))
    crawl(v1, seeds, spec, out1)
    crawl(v2, seeds, spec, out2, prior_dir=out1)
    crawl(v3, seeds, spec, out3, prior_dir=out2)
    h3 = open_crawl(out3)  # reconstructed purely from disk
    assert h3.prior_dir == out2
    assert_parity(res3, h3)
    codes = _codes(h3)
    assert codes[page_url("d")] == 304   # unchanged since v2
    assert codes[page_url("b")] == 304   # 304-of-304: fill recurses to v1
    assert codes[page_url("a1")] == 200
    docs = {r["doc_id"]: r["spans"] for r in h3.documents().take_all()}
    assert any(s["text"] == "beta stays the same" for s in docs[page_url("b")])
    assert any(s["text"] == "delta is new" for s in docs[page_url("d")])


def test_recrawl_resume_recovers_prior(ray_session, tmp_path):
    # kill the recrawl after one wave; resume WITHOUT re-passing prior_dir —
    # it must be recovered from meta.json, and the result must match the
    # uninterrupted oracle recrawl exactly
    v1, v2, seeds = versioned_webs()
    spec = CrawlSpec(delay=0.05)
    res1 = crawl_oracle(v1, seeds, spec)
    res2 = crawl_oracle(v2, seeds, spec, prior=prior_from_result(res1))
    out1, out2 = str(tmp_path / "one"), str(tmp_path / "two")
    crawl(v1, seeds, spec, out1)
    partial = crawl(v2, seeds, spec, out2, prior_dir=out1, max_waves=1)
    assert partial.waves == 1
    h2 = crawl(v2, seeds, spec, out2, resume=True)
    assert h2.prior_dir == out1
    assert_parity(res2, h2)


def test_first_crawl_unaffected(ray_session, tmp_path):
    # a plain crawl (no prior_dir) emits etags but no 304s, and its raw
    # output is a valid prior for later recrawls
    v1, _, seeds = versioned_webs()
    h1 = crawl(v1, seeds, CrawlSpec(delay=0.05), str(tmp_path / "out"))
    pages = h1.pages().take_all()
    assert all(not r["not_modified"] for r in pages)
    assert all(r["etag"].startswith('W/"') for r in pages if r["code"] == 200)


def test_crawl_diff(ray_session, tmp_path):
    from cloud_crawler_ray.pipelines.crawl import crawl_diff

    v1, v2, seeds = versioned_webs()
    spec = CrawlSpec(delay=0.05)
    out1, out2 = str(tmp_path / "one"), str(tmp_path / "two")
    h1 = crawl(v1, seeds, spec, out1)
    h2 = crawl(v2, seeds, spec, out2, prior_dir=out1)
    got = {r["url"].rsplit("/", 1)[1]: r["status"] for r in crawl_diff(h1, h2).take_all()}
    assert got == {
        "home": "unchanged",
        "a": "unchanged",
        "b": "unchanged",   # 304-revalidated: echoed etag proves equality
        "a1": "changed",
        "c": "changed",
        "d": "added",
    }
    # python reference over the same pages tables
    def emap(h):
        return {
            r["canonical_url"]: r["etag"]
            for r in h.pages().take_all()
            if r["fetched"]
        }
    e1, e2 = emap(h1), emap(h2)
    expect = {}
    for u in set(e1) | set(e2):
        if u not in e2:
            expect[u] = "removed"
        elif u not in e1:
            expect[u] = "added"
        else:
            expect[u] = "unchanged" if e1[u] == e2[u] else "changed"
    assert {f"http://www.example.com/{k}": v for k, v in got.items()} == expect
    # removal: crawl v1 against v2's output reversed
    rev = {r["url"].rsplit("/", 1)[1]: r["status"] for r in crawl_diff(h2, h1).take_all()}
    assert rev["d"] == "removed"


def test_change_rate_fp_cases():
    """Cho & Garcia-Molina estimator: exact fixed-point values, saturated
    sentinel, zero-recheck zero."""
    import numpy as np

    from cloud_crawler_ray.functions.text import change_rate_fp

    out = change_rate_fp(np.array([0, 1, 5, 5, 0]), np.array([10, 10, 10, 5, 0]))
    assert out[0] == 0  # no changes -> rate 0
    assert out[1] == int(np.floor(-np.log1p(-0.1) * (1 << 20)))
    assert out[2] == int(np.floor(-np.log1p(-0.5) * (1 << 20)))
    assert out[3] == -1  # saturated: every recheck changed
    assert out[4] == 0  # nothing rechecked
