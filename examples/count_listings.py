"""count_listings example — reference parity for examples/count_listings.rb
(batch crawl at depth_limit=1 whose focus_crawl selects "listing" links by a
structural selector — `select_links_by("//h4/a[@href]")` — and emits each
matched link). The DOM xpath maps to a predicate over the interleaved link
spans: a listing link is one whose URL path marks it as a listing; matched
links are counted through the counter channel (the `puts` analog) and NOT
followed past depth 1 (the reference's depth_limit).

Run: python examples/count_listings.py
"""

from __future__ import annotations

_LISTING_MARK = "/p2"  # the synthetic web's "listing row" path pattern


def count_listing_links(page: dict) -> dict:
    """on_every_page hook: count links whose target matches the listing
    selector, one counter key per matched link (lnk --> ... analog)."""
    out: dict[str, int] = {"listing_pages": 1}
    for s in page["spans"]:
        if s["kind"] == "link" and _LISTING_MARK in s["media_ref"]:
            out[f"listing:{s['media_ref']}"] = 1
    return out


def main(tmp_dir: str = "/tmp/ccray_example_listings"):
    from cloud_crawler_ray.pipelines.crawl import crawl
    from cloud_crawler_ray.spec import CrawlSpec
    from cloud_crawler_ray.synthweb import make_skewed_web

    web, seeds = make_skewed_web(80, n_hosts=2, seed=5)
    spec = CrawlSpec(depth_limit=1, on_every_page=count_listing_links)
    handle = crawl(web, seeds, spec, tmp_dir)
    counters = handle.counters()
    return {k: v for k, v in counters.items() if k.startswith("listing:")}


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False)
    listings = main()
    for k in sorted(listings):
        print(f"lnk -->  {k.split(':', 1)[1]}")
    print(f"{len(listings)} listings")
    ray.shutdown()
