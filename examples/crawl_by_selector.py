"""crawl_by_selector example — reference parity for
test/crawl_by_selector.rb:13-25 (append selector-matched text to a local
file while crawling). The selector here is a predicate over the interleaved
spans; matched anchor texts are emitted through the counter channel and the
matched spans written as their own table (the file-sink analog).

Run: python examples/crawl_by_selector.py
"""

from __future__ import annotations


def select_anchor_texts(page: dict) -> dict:
    """on_pages_like hook: collect anchor text of links pointing at p1*."""
    out = {}
    for s in page["spans"]:
        if s["kind"] == "link" and "/p1" in s["media_ref"]:
            out[f"anchor:{s['text']}"] = 1
    return out


def main(tmp_dir: str = "/tmp/ccray_example_selector"):
    from cloud_crawler_ray.pipelines.crawl import crawl
    from cloud_crawler_ray.spec import CrawlSpec
    from cloud_crawler_ray.synthweb import make_skewed_web

    web, seeds = make_skewed_web(60, n_hosts=2, seed=3)
    spec = CrawlSpec(on_pages_like=[(r"example\.com", select_anchor_texts)])
    handle = crawl(web, seeds, spec, tmp_dir)
    return {k: v for k, v in handle.counters().items() if k.startswith("anchor:")}


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False)
    for k, v in sorted(main().items()):
        print(f"{v:4d}  {k}")
    ray.shutdown()
