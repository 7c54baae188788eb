"""Oracle semantics tests — the conformance corpus mirroring the reference's
end-to-end crawl specs (crawl_job_spec.rb, batch_crawl_job_spec.rb)."""

from cloud_crawler_ray.oracle import crawl_oracle
from cloud_crawler_ray.spec import CrawlSpec

from tests import webs

U = "http://www.example.com"


def urls_of(res):
    return [u for _, _, u in res.crawl_order]


def test_bfs_full_domain_and_dedup():
    web, seeds = webs.small_dag()
    res = crawl_oracle(web, seeds, CrawlSpec())
    # every page crawled exactly once, BFS wave order, back edge deduped
    assert urls_of(res) == [f"{U}/p0", f"{U}/p1", f"{U}/p2", f"{U}/p3"]
    assert [w for w, _, _ in res.crawl_order] == [0, 1, 1, 2]
    assert [s for _, s, _ in res.crawl_order] == [0, 1, 2, 3]
    assert len(res.pages) == 4
    assert res.seen == {f"{U}/p0", f"{U}/p1", f"{U}/p2", f"{U}/p3"}


def test_documents_have_interleaved_spans():
    web, seeds = webs.small_dag()
    res = crawl_oracle(web, seeds, CrawlSpec())
    d0 = next(d for d in res.documents if d["doc_id"] == f"{U}/p0")
    kinds = [s["kind"] for s in d0["spans"]]
    assert "image" in kinds and "link" in kinds and "text" in kinds
    assert [s["offset"] for s in d0["spans"]] == list(range(len(d0["spans"])))


def test_depth_limit():
    web, seeds = webs.linear_chain(5)
    res = crawl_oracle(web, seeds, CrawlSpec(depth_limit=2))
    assert urls_of(res) == [f"{U}/p0", f"{U}/p1", f"{U}/p2"]


def test_domain_confinement_default_inside_only():
    web, seeds = webs.offdomain_web()
    res = crawl_oracle(web, seeds, CrawlSpec())
    assert urls_of(res) == [f"{U}/p0", f"{U}/p1"]


def test_outside_domain_follows_offdomain():
    web, seeds = webs.offdomain_web()
    res = crawl_oracle(web, seeds, CrawlSpec(outside_domain=True))
    assert "http://www.other.com/x" in urls_of(res)
    assert "http://www.other.com/y" in urls_of(res)


def test_redirects_last_only_vs_keep():
    web, seeds = webs.redirect_web()
    res = crawl_oracle(web, seeds, CrawlSpec())
    # r1 redirects to t1 (same host, followed); only the target page is kept
    page_urls = [p["url"] for p in res.pages]
    assert f"{U}/t1" in page_urls and f"{U}/r1" not in page_urls
    # off-domain redirect NOT followed: roff kept as its own (redirect) page
    assert f"{U}/roff" in page_urls
    assert "http://www.other.com/t2" not in page_urls
    # links of the redirect target are followed
    assert f"{U}/p2" in urls_of(res)

    res2 = crawl_oracle(web, seeds, CrawlSpec(keep_redirects=True))
    page_urls2 = [p["url"] for p in res2.pages]
    assert f"{U}/r1" in page_urls2 and f"{U}/t1" in page_urls2


def test_query_strings_default_followed_and_skippable():
    web, seeds = webs.query_web()
    res = crawl_oracle(web, seeds, CrawlSpec())
    assert f"{U}/p1?foo=1" in urls_of(res)
    res2 = crawl_oracle(web, seeds, CrawlSpec(skip_query_strings=True))
    assert f"{U}/p1?foo=1" not in urls_of(res2)
    assert f"{U}/p1" in urls_of(res2)


def test_robots_obedience():
    web, seeds = webs.robots_web()
    res = crawl_oracle(web, seeds, CrawlSpec(obey_robots_txt=True))
    assert urls_of(res) == [f"{U}/p0", f"{U}/ok"]
    res2 = crawl_oracle(web, seeds, CrawlSpec())
    assert f"{U}/private/secret" in urls_of(res2)


def test_skip_links_like():
    web, seeds = webs.skip_pattern_web()
    res = crawl_oracle(web, seeds, CrawlSpec(skip_link_patterns=[r"/admin"]))
    assert urls_of(res) == [f"{U}/p0", f"{U}/keep"]


def test_focus_crawl_selects_and_orders():
    web, seeds = webs.small_dag()
    spec = CrawlSpec(
        focus_crawl=lambda page, links: [l for l in links if l.endswith(("p2", "p3"))]
    )
    res = crawl_oracle(web, seeds, spec)
    # p1 filtered out at p0; p3 reached through p2
    assert urls_of(res) == [f"{U}/p0", f"{U}/p2", f"{U}/p3"]


def test_on_every_page_counters():
    web, seeds = webs.small_dag()
    spec = CrawlSpec(on_every_page=lambda p: {"pages": 1, f"code_{p['code']}": 1})
    res = crawl_oracle(web, seeds, spec)
    assert res.counters["pages"] == 4
    assert res.counters["code_200"] == 4


def test_on_pages_like_pattern_gated():
    web, seeds = webs.small_dag()
    spec = CrawlSpec(on_pages_like=[(r"/p[13]$", lambda p: {"matched": 1})])
    res = crawl_oracle(web, seeds, spec)
    assert res.counters["matched"] == 2


def test_discard_page_empties_spans():
    web, seeds = webs.small_dag()
    res = crawl_oracle(web, seeds, CrawlSpec(discard_page=True))
    assert all(d["spans"] == [] for d in res.documents)
    assert len(res.documents) == 4  # metadata still stored


def test_curl_mode_no_follow_no_dedup():
    web, seeds = webs.small_dag()
    res = crawl_oracle(web, [seeds[0], seeds[0]], CrawlSpec(follow_links=False))
    assert urls_of(res) == [f"{U}/p0", f"{U}/p0"]  # duplicates fetched
    assert len(res.documents) == 2


def test_politeness_clock_spacing():
    web, seeds = webs.multi_host_web()
    res = crawl_oracle(web, seeds, CrawlSpec(delay=1.0))
    by_host = {}
    for host, t, _ in res.fetch_log:
        by_host.setdefault(host, []).append(t)
    for host, times in by_host.items():
        assert all(b - a >= 1000 for a, b in zip(times, times[1:])), (host, times)
    # two hosts progress on independent clocks (both start at delay)
    assert len(by_host) == 2
    starts = [v[0] for v in by_host.values()]
    assert starts == [1000, 1000]


def test_error_page_for_unregistered_url():
    web, seeds = webs.linear_chain(2)
    res = crawl_oracle(web, [f"{U}/missing"], CrawlSpec())
    assert len(res.pages) == 1
    assert res.pages[0]["fetched"] is False
    assert res.pages[0]["error"] != ""
    assert res.documents == []
