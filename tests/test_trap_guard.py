"""Crawl-trap guard (spec.trap_guard): at most N pages ever scheduled per
(host, URL skeleton) — the calendar-pager / session-id-mill defense. Target-
side addition (the reference's only trap defenses are depth_limit and
skip_links_like); semantics pinned against the sequential oracle on both
planners, composition with job_limit, and count restore across resume."""

import collections

from cloud_crawler_ray.canon import trap_keys_of, url_skeleton
from cloud_crawler_ray.oracle import crawl_oracle
from cloud_crawler_ray.pipelines.crawl import crawl
from cloud_crawler_ray.spec import CrawlSpec
from cloud_crawler_ray.synthweb import FakePage, page_url, web_table

from tests.test_crawl_engine import assert_parity, run_both


def trap_web(n_days: int = 25):
    """A host with a small static site plus an unbounded calendar pager:
    every /cal?day=N page links to day N+1 — one skeleton, n_days URLs."""
    pages = [
        FakePage(name="home", links=["about", "news", "cal?day=0"]),
        FakePage(name="about", links=["team"]),
        FakePage(name="team"),
        FakePage(name="news", links=["post1", "post2"]),
        FakePage(name="post1"),
        FakePage(name="post2"),
    ]
    for i in range(n_days):
        nxt = [f"cal?day={i+1}"] if i + 1 < n_days else []
        pages.append(FakePage(name=f"cal?day={i}", links=nxt))
    return web_table(pages), [page_url("home")]


def _skeleton_counts(handle) -> dict[str, int]:
    out: collections.Counter = collections.Counter()
    for r in handle.crawl_order().take_all():
        out[url_skeleton(r["url"])] += 1
    return dict(out)


def test_url_skeleton_shapes():
    assert url_skeleton("http://h.com/cal?day=31&m=2") == "/cal?day,m"
    assert url_skeleton("http://h.com/post/2024/01/item9") == "/post/D/D/itemD"
    assert url_skeleton("http://h.com/s/deadbeef0123/x") == "/s/H/x"
    assert url_skeleton("http://h.com/plain/path") == "/plain/path"
    # trap keys are \x1f-separated so they can never collide with hostnames
    # (never NUL: pandas' object hasher truncates keys at an embedded NUL,
    # which would merge every skeleton of a host — see state/shards.py)
    k1, k2 = trap_keys_of(["http://h.com/cal?day=1", "http://h.com/cal?day=2"])
    assert k1 == k2 == "h.com\x1f/cal?day"


def test_trap_guard_two_skeletons_one_wave(ray_session, tmp_path):
    """Two hot skeletons of ONE host arriving in the SAME wave each get
    their own budget — the regression pinned here: grouping trap keys with
    pandas' string hashtable merged all of a host's skeletons into one
    group (object-key compare truncates at NUL), so the second skeleton was
    starved by the first one's rows."""
    pages = [
        FakePage(
            name="home",
            links=[f"cal?day={i}" for i in range(12)]
            + [f"tag/{i}/view" for i in range(12)],
        )
    ]
    pages += [FakePage(name=f"cal?day={i}") for i in range(12)]
    pages += [FakePage(name=f"tag/{i}/view") for i in range(12)]
    web, seeds = web_table(pages), [page_url("home")]
    spec = CrawlSpec(trap_guard=4, delay=0.05)
    res, handle = run_both(web, seeds, spec, tmp_path)
    assert_parity(res, handle)
    counts = _skeleton_counts(handle)
    assert counts["/cal?day"] == 4 and counts["/tag/D/view"] == 4
    # and on the distributed planner
    res2 = crawl_oracle(web, seeds, spec)
    h2 = crawl(web, seeds, spec, str(tmp_path / "d"), small_wave_threshold=0)
    assert_parity(res2, h2)


def test_trap_guard_parity_local_planner(ray_session, tmp_path):
    web, seeds = trap_web(25)
    spec = CrawlSpec(trap_guard=5, delay=0.05)
    res, handle = run_both(web, seeds, spec, tmp_path)
    assert_parity(res, handle)
    counts = _skeleton_counts(handle)
    assert counts["/cal?day"] == 5  # the pager is capped...
    assert counts["/about"] == 1 and counts["/postD"] == 2  # ...the site isn't
    # the guard binds: an unguarded crawl walks the whole pager
    free = crawl(web, seeds, CrawlSpec(delay=0.05), str(tmp_path / "free"))
    assert _skeleton_counts(free)["/cal?day"] == 25


def test_trap_guard_parity_distributed_planner(ray_session, tmp_path):
    web, seeds = trap_web(12)
    spec = CrawlSpec(trap_guard=4, delay=0.05)
    res = crawl_oracle(web, seeds, spec)
    handle = crawl(web, seeds, spec, str(tmp_path / "out"), small_wave_threshold=0)
    assert_parity(res, handle)
    assert _skeleton_counts(handle)["/cal?day"] == 4


def test_trap_guard_with_host_budget_and_job_limit(ray_session, tmp_path):
    # the three throttles compose: host budget first, trap guard second,
    # job_limit caps the wave and spills; spilled jobs re-compete without
    # consuming either budget
    web, seeds = trap_web(20)
    spec = CrawlSpec(trap_guard=6, max_pages_per_host=10, job_limit=3, delay=0.05)
    res, handle = run_both(web, seeds, spec, tmp_path)
    assert_parity(res, handle)
    counts = _skeleton_counts(handle)
    assert counts["/cal?day"] <= 6
    assert sum(counts.values()) <= 10


def test_trap_guard_counts_survive_resume(ray_session, tmp_path):
    # scheduled-per-skeleton counts restore from lineage: the resumed crawl
    # must not re-open the pager budget
    web, seeds = trap_web(25)
    spec = CrawlSpec(trap_guard=5, delay=0.05)
    out = str(tmp_path / "out")
    partial = crawl(web, seeds, spec, out, max_waves=4)
    assert partial.waves == 4
    resumed = crawl(web, seeds, spec, out, resume=True)
    res = crawl_oracle(web, seeds, spec)
    assert_parity(res, resumed)
    assert _skeleton_counts(resumed)["/cal?day"] == 5
