"""max_pages_per_host crawl budget: at most N pages ever scheduled per host,
enforced at plan time in processing order, committed with the wave (resume
never over- or under-schedules a host). Target-side addition — the
reference's qless throttles are per-queue, not per-host; semantics are
pinned against the sequential oracle on both planners."""

import collections

from cloud_crawler_ray.oracle import crawl_oracle
from cloud_crawler_ray.pipelines.crawl import crawl
from cloud_crawler_ray.spec import CrawlSpec

from cloud_crawler_ray.synthweb import make_skewed_web

from tests import webs
from tests.test_crawl_engine import assert_parity, run_both


def _host_counts(handle) -> dict[str, int]:
    from cloud_crawler_ray.canon import host_of

    out: collections.Counter = collections.Counter()
    for r in handle.crawl_order().take_all():
        out[host_of(r["url"])] += 1
    return dict(out)


def test_host_budget_parity_local_planner(ray_session, tmp_path):
    web, seeds = make_skewed_web(120, n_hosts=4, seed=7)
    spec = CrawlSpec(max_pages_per_host=5, delay=0.05)
    res, handle = run_both(web, seeds, spec, tmp_path)
    assert_parity(res, handle)
    counts = _host_counts(handle)
    assert counts and max(counts.values()) <= 5
    # the budget binds: the hot host has far more than 5 reachable pages
    free = crawl(web, seeds, CrawlSpec(delay=0.05), str(tmp_path / "free"))
    assert max(_host_counts(free).values()) > 5


def test_host_budget_parity_distributed_planner(ray_session, tmp_path):
    web, seeds = make_skewed_web(120, n_hosts=4, seed=7)
    spec = CrawlSpec(max_pages_per_host=4, delay=0.05)
    res = crawl_oracle(web, seeds, spec)
    handle = crawl(
        web, seeds, spec, str(tmp_path / "out"), small_wave_threshold=0
    )
    assert_parity(res, handle)
    assert max(_host_counts(handle).values()) <= 4


def test_host_budget_with_job_limit_parity(ray_session, tmp_path):
    # the two throttles compose: budget filters per host, job_limit caps the
    # wave and spills; spilled jobs re-compete without consuming budget
    web, seeds = webs.branching_web(branch=3, depth=3)
    spec = CrawlSpec(max_pages_per_host=9, job_limit=4, delay=0.05)
    res, handle = run_both(web, seeds, spec, tmp_path)
    assert_parity(res, handle)
    assert max(_host_counts(handle).values()) <= 9


def test_host_budget_resume_exact(ray_session, tmp_path):
    """A crawl killed mid-run resumes to the byte-identical capped result —
    scheduled counts restore from the lineage marker."""
    web, seeds = make_skewed_web(120, n_hosts=4, seed=7)
    spec = CrawlSpec(max_pages_per_host=5, delay=0.05)
    whole = crawl(web, seeds, spec, str(tmp_path / "whole"))

    part = crawl(web, seeds, spec, str(tmp_path / "resumed"), max_waves=2)
    assert part.waves == 2
    resumed = crawl(web, seeds, spec, str(tmp_path / "resumed"), resume=True)

    def order(h):
        return [
            (r["wave"], r["seq"], r["url"]) for r in h.crawl_order().take_all()
        ]

    assert order(resumed) == order(whole)
    assert webs.seen_set(resumed) == webs.seen_set(whole)
    assert _host_counts(resumed) == _host_counts(whole)


def test_host_budget_none_is_uncapped(ray_session, tmp_path):
    web, seeds = webs.branching_web(branch=2, depth=2)
    res, handle = run_both(web, seeds, CrawlSpec(), tmp_path)
    assert_parity(res, handle)


def _crawl_delay_web():
    from tests.webs import FakePage, page_url, web_table

    pages = []
    for host in ("slow.example.com", "fast.example.com"):
        for i in range(4):
            pages.append(
                FakePage(
                    name=f"p{i}",
                    host=host,
                    links=[f"p{i+1}"] if i < 3 else [],
                    latency_ms=10,
                )
            )
    robots = {"slow.example.com": "User-agent: *\nCrawl-delay: 2\n"}
    return (
        web_table(pages, robots=robots),
        [page_url("p0", "slow.example.com"), page_url("p0", "fast.example.com")],
    )


def test_crawl_delay_parity_local_planner(ray_session, tmp_path):
    web, seeds = _crawl_delay_web()
    spec = CrawlSpec(delay=0.1, obey_crawl_delay=True)
    res, handle = run_both(web, seeds, spec, tmp_path)
    assert_parity(res, handle)
    # the slow host's consecutive fetches are >= 2000 ms apart, the fast
    # host's only >= 100 ms
    times = collections.defaultdict(list)
    from cloud_crawler_ray.canon import host_of

    for r in handle.pages().take_all():
        times[host_of(r["url"])].append(r["fetch_time_ms"])
    slow = sorted(times["slow.example.com"])
    fast = sorted(times["fast.example.com"])
    assert all(b - a >= 2000 for a, b in zip(slow, slow[1:]))
    assert fast[1] - fast[0] < 2000


def test_crawl_delay_parity_distributed_planner(ray_session, tmp_path):
    web, seeds = _crawl_delay_web()
    spec = CrawlSpec(delay=0.1, obey_crawl_delay=True)
    res = crawl_oracle(web, seeds, spec)
    handle = crawl(
        web, seeds, spec, str(tmp_path / "out"), small_wave_threshold=0
    )
    assert_parity(res, handle)


def test_crawl_delay_off_by_default(ray_session, tmp_path):
    web, seeds = _crawl_delay_web()
    spec = CrawlSpec(delay=0.1)  # compliance off: robots delay ignored
    res, handle = run_both(web, seeds, spec, tmp_path)
    assert_parity(res, handle)


def _sitemap_web():
    from tests.webs import FakePage, page_url, web_table

    host = "s.example.com"
    pages = [
        FakePage(name="p0", host=host, links=["p1"]),
        FakePage(name="p1", host=host, links=[]),
        # orphans: reachable only through the sitemap
        FakePage(name="orphan1", host=host, links=[]),
        FakePage(name="orphan2", host=host, links=[]),
    ]
    sm = (
        '<?xml version="1.0"?><urlset>'
        f"<url><loc>{page_url('orphan1', host)}</loc></url>"
        f"<url><loc> {page_url('orphan2', host)} </loc></url>"
        f"<url><loc>{page_url('p0', host)}</loc></url>"  # dup of the seed
        "</urlset>"
    )
    return web_table(pages, sitemaps={host: sm}), [page_url("p0", host)]


def test_sitemap_seeding_parity_and_dedup(ray_session, tmp_path):
    web, seeds = _sitemap_web()
    spec = CrawlSpec(use_sitemaps=True, delay=0.05)
    res, handle = run_both(web, seeds, spec, tmp_path)
    assert_parity(res, handle)
    urls = {r["url"] for r in handle.crawl_order().take_all()}
    assert any("orphan1" in u for u in urls)
    assert any("orphan2" in u for u in urls)
    # the duplicated seed is fetched once (wave-0 dedup keeps the user seed)
    assert sum(1 for u in urls if u.endswith("/p0")) == 1


def test_sitemap_seeding_distributed_planner(ray_session, tmp_path):
    web, seeds = _sitemap_web()
    spec = CrawlSpec(use_sitemaps=True, delay=0.05)
    res = crawl_oracle(web, seeds, spec)
    handle = crawl(
        web, seeds, spec, str(tmp_path / "out"), small_wave_threshold=0
    )
    assert_parity(res, handle)


def test_sitemaps_off_by_default(ray_session, tmp_path):
    web, seeds = _sitemap_web()
    res, handle = run_both(web, seeds, CrawlSpec(delay=0.05), tmp_path)
    assert_parity(res, handle)
    urls = {r["url"] for r in handle.crawl_order().take_all()}
    assert not any("orphan" in u for u in urls)


def _robots_sitemap_web():
    """robots.txt Sitemap: directives point at a sitemap INDEX whose parts
    list the real pages; the /sitemap.xml convention file is a decoy that
    must be ignored when directives exist."""
    from tests.webs import FakePage, page_url, web_table

    host = "s.example.com"
    pages = [
        FakePage(name="p0", host=host, links=[]),
        FakePage(name="a", host=host, links=[]),
        FakePage(name="b", host=host, links=[]),
        FakePage(name="decoy", host=host, links=[]),
        FakePage(
            name="maps/index.xml", host=host, content_type="application/xml",
            body=(
                "<sitemapindex>"
                f"<sitemap><loc>http://{host}/maps/part1.xml</loc></sitemap>"
                f"<sitemap><loc>http://{host}/maps/part2.xml</loc></sitemap>"
                f"<sitemap><loc>http://{host}/maps/index.xml</loc></sitemap>"
                "</sitemapindex>"
            ).encode(),
        ),
        FakePage(
            name="maps/part1.xml", host=host, content_type="application/xml",
            body=f"<urlset><url><loc>{page_url('a', host)}</loc></url></urlset>".encode(),
        ),
        FakePage(
            name="maps/part2.xml", host=host, content_type="application/xml",
            body=f"<urlset><url><loc>{page_url('b', host)}</loc></url></urlset>".encode(),
        ),
    ]
    robots = {host: f"User-agent: *\nAllow: /\nSitemap: http://{host}/maps/index.xml\n"}
    sitemaps = {host: f"<urlset><url><loc>{page_url('decoy', host)}</loc></url></urlset>"}
    return (
        web_table(pages, robots=robots, sitemaps=sitemaps),
        [page_url("p0", host)],
    )


def test_robots_sitemap_directive_and_index(ray_session, tmp_path):
    # Sitemap: directives win over the /sitemap.xml convention; index files
    # recurse (self-reference bounded by the per-host fetch cap)
    web, seeds = _robots_sitemap_web()
    spec = CrawlSpec(use_sitemaps=True, delay=0.05)
    res, handle = run_both(web, seeds, spec, tmp_path)
    assert_parity(res, handle)
    urls = {r["url"].rsplit("/", 1)[1] for r in handle.crawl_order().take_all()}
    assert {"a", "b", "p0"} <= urls
    assert "decoy" not in urls  # convention file ignored when declared
