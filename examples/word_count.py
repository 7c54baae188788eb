"""word_count example — reference parity for examples/word_count.rb:60-75
(count title-ish tokens across every crawled page via the m_cache.incr
pattern) and examples/sugary_word_count.rb:49-73 (the partial/combiner
variant — which is exactly how counters are implemented here: per-page
increments emitted as data, combined with a groupby).

Run: python examples/word_count.py
"""

from __future__ import annotations


def count_words(page: dict) -> dict:
    """on_every_page hook: one increment per token in the page's text spans."""
    tokens: dict[str, int] = {}
    for s in page["spans"]:
        if s["kind"] == "text":
            for tok in s["text"].lower().split():
                tokens[f"word:{tok}"] = tokens.get(f"word:{tok}", 0) + 1
    tokens["pages"] = 1
    return tokens


def main(tmp_dir: str = "/tmp/ccray_example_wordcount") -> dict[str, int]:
    from cloud_crawler_ray.pipelines.crawl import crawl
    from cloud_crawler_ray.spec import CrawlSpec
    from cloud_crawler_ray.synthweb import make_skewed_web

    web, seeds = make_skewed_web(200, n_hosts=4, seed=7)
    handle = crawl(web, seeds, CrawlSpec(on_every_page=count_words), tmp_dir)
    return handle.counters()


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False)
    counters = main()
    top = sorted(counters.items(), key=lambda kv: -kv[1])[:15]
    for k, v in top:
        print(f"{v:8d}  {k}")
    ray.shutdown()
