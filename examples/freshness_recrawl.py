"""freshness_recrawl example — the incremental-crawl loop a production
corpus refresh runs: crawl v1 of a site, recrawl after the site changes
(conditional GET: unchanged pages answer 304 and replay their links; only
changed/new pages re-extract), then report what moved with crawl_diff and
read the refreshed corpus (304 documents fill from the prior crawl).

Target-side addition — the reference always refetches from scratch.

Run: python examples/freshness_recrawl.py
"""

from __future__ import annotations


def main(tmp_dir: str = "/tmp/ccray_example_freshness"):
    from cloud_crawler_ray.pipelines.crawl import crawl, crawl_diff
    from cloud_crawler_ray.spec import CrawlSpec
    from cloud_crawler_ray.synthweb import FakePage, page_url, web_table

    def site(version: int):
        return web_table(
            [
                FakePage(name="home", links=["news", "about", "catalog"]),
                FakePage(name="about", texts=["founded long ago"]),
                FakePage(
                    name="news",
                    texts=[f"headline of version {version}"],
                    links=["story-new"] if version > 1 else [],
                ),
                FakePage(name="catalog", links=["item1", "item2"]),
                FakePage(name="item1", texts=["item one"]),
                FakePage(name="item2", texts=["item two"]),
            ]
            + ([FakePage(name="story-new", texts=["breaking story"])] if version > 1 else [])
        )

    seeds = [page_url("home")]
    spec = CrawlSpec(delay=0.05)
    h1 = crawl(site(1), seeds, spec, f"{tmp_dir}/v1")
    # ...the site changes; recrawl against the prior crawl's output
    h2 = crawl(site(2), seeds, spec, f"{tmp_dir}/v2", prior_dir=f"{tmp_dir}/v1")

    report = sorted(
        (r["url"], r["status"]) for r in crawl_diff(h1, h2).take_all()
    )
    revalidated = sum(
        1 for r in h2.pages().take_all() if r["code"] == 304
    )
    docs = {d["doc_id"]: d["spans"] for d in h2.documents().take_all()}
    return report, revalidated, docs


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False)
    report, revalidated, docs = main()
    print(f"{revalidated} pages revalidated (304) without re-extraction")
    for url, status in report:
        print(f"{status:>10}  {url}")
    ray.shutdown()
