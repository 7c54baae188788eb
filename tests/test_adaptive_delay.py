"""Adaptive politeness (spec.adaptive_delay_pct): per-host delay backs off
to pct% of the host's committed mean observed latency. Target-side addition
(the reference's delay is static); pinned against the oracle on both
planners, committed per wave, restored on resume."""

from cloud_crawler_ray.oracle import crawl_oracle
from cloud_crawler_ray.pipelines.crawl import crawl
from cloud_crawler_ray.spec import CrawlSpec
from cloud_crawler_ray.synthweb import FakePage, page_url, web_table

from tests.test_crawl_engine import assert_parity, run_both


def two_speed_web(depth: int = 5, width: int = 2):
    """A slow origin (400 ms/page) and a fast one (10 ms/page), each a
    small tree crawled over several waves — the adaptive delay must engage
    from wave 1 using wave 0's committed stats."""
    pages = []
    for host, lat in (("slow.example.com", 400), ("fast.example.com", 10)):
        for d in range(depth):
            for w in range(width):
                links = (
                    [f"p{d+1}_{k}" for k in range(width)] if d + 1 < depth else []
                )
                pages.append(
                    FakePage(name=f"p{d}_{w}", host=host, links=links, latency_ms=lat)
                )
    seeds = [page_url("p0_0", "slow.example.com"), page_url("p0_0", "fast.example.com")]
    return web_table(pages), seeds


def _host_gaps(handle, host: str) -> list[int]:
    rows = sorted(
        (
            (r["fetch_time_ms"], r["url"])
            for r in handle.pages().take_all()
            if host in r["url"]
        ),
    )
    return [b[0] - a[0] for a, b in zip(rows, rows[1:])]


def test_adaptive_parity_local(ray_session, tmp_path):
    web, seeds = two_speed_web()
    spec = CrawlSpec(delay=0.05, adaptive_delay_pct=150)
    res, handle = run_both(web, seeds, spec, tmp_path)
    assert_parity(res, handle)
    # slow host: once stats commit (wave >= 1), delay = 150% of 400 ms
    # observed mean = 600 ms, so inter-fetch spacing >= 600 + latency
    slow_gaps = _host_gaps(handle, "slow.example.com")
    assert slow_gaps and all(g >= 600 for g in slow_gaps[2:])
    # fast host: adaptive value 15 ms < the 50 ms base, base wins
    fast_gaps = _host_gaps(handle, "fast.example.com")
    assert fast_gaps and all(g >= 50 for g in fast_gaps)
    assert max(fast_gaps) < 600


def test_adaptive_parity_distributed(ray_session, tmp_path):
    web, seeds = two_speed_web(depth=4)
    spec = CrawlSpec(delay=0.05, adaptive_delay_pct=150)
    res = crawl_oracle(web, seeds, spec)
    handle = crawl(web, seeds, spec, str(tmp_path / "out"), small_wave_threshold=0)
    assert_parity(res, handle)


def test_adaptive_stats_survive_resume(ray_session, tmp_path):
    web, seeds = two_speed_web()
    spec = CrawlSpec(delay=0.05, adaptive_delay_pct=150)
    out = str(tmp_path / "out")
    partial = crawl(web, seeds, spec, out, max_waves=2)
    assert partial.waves == 2
    resumed = crawl(web, seeds, spec, out, resume=True)
    res = crawl_oracle(web, seeds, spec)
    assert_parity(res, resumed)  # delays identical ⇒ fetch clocks identical


def test_adaptive_off_is_static(ray_session, tmp_path):
    # without the knob the clocks must be unchanged vs a plain crawl
    web, seeds = two_speed_web(depth=3)
    spec = CrawlSpec(delay=0.05)
    res, handle = run_both(web, seeds, spec, tmp_path)
    assert_parity(res, handle)
    slow_gaps = _host_gaps(handle, "slow.example.com")
    # static delay 50 + latency 400 = 450 spacing, never the adaptive 600
    assert slow_gaps and all(g == 450 for g in slow_gaps)
