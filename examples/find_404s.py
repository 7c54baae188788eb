"""find_404s example — reference parity for examples/find_404s.rb:15-22
(the keyed event log: record every URL that resolves to an error/404 while
crawling). Here the error pages are simply a filtered projection of the
pages table, written to their own parquet table.

Run: python examples/find_404s.py
"""

from __future__ import annotations


def main(tmp_dir: str = "/tmp/ccray_example_404s"):
    import pyarrow.compute as pc

    from cloud_crawler_ray.pipelines.crawl import crawl
    from cloud_crawler_ray.spec import CrawlSpec
    from cloud_crawler_ray.synthweb import FakePage, page_url, web_table

    pages = [
        FakePage(name="p0", links=["ok", "missing-1", "missing-2"]),
        FakePage(name="ok", links=["missing-1"]),
        # missing-1 / missing-2 are never registered → error pages
    ]
    web = web_table(pages)
    handle = crawl(web, [page_url("p0")], CrawlSpec(), tmp_dir)
    bad = handle.pages().map_batches(
        lambda t: t.filter(pc.invert(t.column("fetched").combine_chunks())).select(
            ["url", "referer", "error"]
        ),
        batch_format="pyarrow",
    )
    bad.write_parquet(tmp_dir + "_out")
    return bad.take_all()


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False)
    for row in main():
        print(row)
    ray.shutdown()
