"""focused_recrawl example — personalized-PageRank-guided focused crawling:
a shallow probe crawl builds the link graph, personalized PageRank restricted
to the SEED pages scores every discovered page by relevance-to-the-seeds
(random-surfer restarts land on the seeds, so rank decays with link distance
from them), and the full crawl re-runs with a priority_fn that fetches
seed-relevant pages first under a per-wave job budget.

This differs from examples/adaptive_crawl.py (global authority tiers): here
the teleport set makes the score TOPICAL — two crawls with different seed
lists over the same web rank the same pages differently, which is the
focused-crawl / vertical-recrawl pattern (crawl what's near MY seeds, not
what's globally popular).

Run: python examples/focused_recrawl.py
"""

from __future__ import annotations


def main(tmp_dir: str = "/tmp/ccray_example_focused") -> dict:
    import shutil

    from cloud_crawler_ray.ops.graph import pagerank
    from cloud_crawler_ray.pipelines.crawl import crawl
    from cloud_crawler_ray.spec import CrawlSpec
    from cloud_crawler_ray.synthweb import make_skewed_web

    shutil.rmtree(tmp_dir, ignore_errors=True)
    web, seeds = make_skewed_web(400, n_hosts=8, seed=5)

    # phase 1: shallow probe, then score pages by seed-personalized rank
    probe = crawl(web, seeds, CrawlSpec(depth_limit=2), f"{tmp_dir}/probe")
    ranks = pagerank(probe.link_edges(), n_iter=8, seeds=list(seeds)).to_pandas()
    # integer priority (priority_fn returns ints; higher = sooner)
    prio = {u: int(r * 10_000_000) for u, r in zip(ranks["node"], ranks["rank"])}

    # phase 2: full crawl, seed-relevant pages first, budget via job_limit
    spec = CrawlSpec(
        priority_fn=lambda job: prio.get(job["url"], 0),
        job_limit=120,
    )
    full = crawl(web, seeds, spec, f"{tmp_dir}/full")

    order = full.crawl_order().to_pandas().sort_values("seq")
    order["ppr"] = order["url"].map(prio).fillna(0)
    half = len(order) // 2
    return {
        "n_fetched": len(order),
        "top_pages": ranks.sort_values("rank", ascending=False).head(5)[
            ["node", "rank"]
        ],
        "mean_ppr_first_half": float(order.head(half)["ppr"].mean()),
        "mean_ppr_second_half": float(order.tail(half)["ppr"].mean()),
    }


if __name__ == "__main__":
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    out = main()
    print(out["top_pages"])
    print(
        f"fetched {out['n_fetched']} pages; mean seed-relevance "
        f"first half {out['mean_ppr_first_half']:.0f} vs "
        f"second half {out['mean_ppr_second_half']:.0f}"
    )
    ray.shutdown()
