"""sugary_word_count example — reference parity for
examples/sugary_word_count.rb:49-73: per-page token counting with the
batch-lifecycle hooks doing the "sync local counters after every batch"
step. Here the per-page increments already combine distributed (the
partial/combiner pattern); the after_batch hook adds per-wave bookkeeping
counters, and before/after_crawl bracket the run — all surfaced through
``CrawlHandle.counters()``.

Run: python examples/sugary_word_count.py
"""

from __future__ import annotations


def count_title_tokens(page: dict) -> dict:
    """on_every_page: count tokens of the first text span (the title run),
    like `page.document.title.downcase.split` in the reference."""
    out: dict[str, int] = {}
    for s in page["spans"]:
        if s["kind"] == "text":
            for tok in s["text"].lower().split():
                out[f"tok:{tok}"] = out.get(f"tok:{tok}", 0) + 1
            break
    return out


def main(tmp_dir: str = "/tmp/ccray_example_sugary") -> dict[str, int]:
    from cloud_crawler_ray.pipelines.crawl import crawl
    from cloud_crawler_ray.spec import CrawlSpec
    from cloud_crawler_ray.synthweb import make_skewed_web

    web, seeds = make_skewed_web(200, n_hosts=4, seed=7)
    spec = CrawlSpec(
        on_every_page=count_title_tokens,
        before_crawl=lambda ctx: {"crawls": 1},
        before_batch=lambda ctx: {"batches": 1},
        after_batch=lambda ctx: {"jobs_synced": ctx["n_jobs"]},
        after_crawl=lambda ctx: {"done": 1},
    )
    handle = crawl(web, seeds, spec, tmp_dir)
    return handle.counters()


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False)
    counters = main()
    meta = {k: v for k, v in counters.items() if not k.startswith("tok:")}
    print("lifecycle:", meta)
    top = sorted(
        ((k, v) for k, v in counters.items() if k.startswith("tok:")),
        key=lambda kv: -kv[1],
    )[:10]
    for k, v in top:
        print(f"{v:8d}  {k}")
    ray.shutdown()
