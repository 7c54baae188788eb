"""adaptive_crawl example — two-phase authority-guided crawling: a shallow
probe crawl ranks hosts by link authority (PageRank folded per host), then
the full crawl re-runs with a priority_fn that fetches high-authority hosts
first under a per-wave job budget. This is the focused-crawl pattern a
budgeted 100 TB recrawl uses: spend the fetch budget where the link graph
says the value is.

Run: python examples/adaptive_crawl.py
"""

from __future__ import annotations


def main(tmp_dir: str = "/tmp/ccray_example_adaptive") -> dict:
    import shutil

    from cloud_crawler_ray.canon import host_of
    from cloud_crawler_ray.ops.graph import pagerank
    from cloud_crawler_ray.pipelines.crawl import crawl
    from cloud_crawler_ray.spec import CrawlSpec
    from cloud_crawler_ray.synthweb import make_skewed_web

    shutil.rmtree(tmp_dir, ignore_errors=True)
    web, seeds = make_skewed_web(400, n_hosts=8, seed=5)

    # phase 1: shallow probe — rank hosts by aggregated page authority
    probe = crawl(web, seeds, CrawlSpec(depth_limit=2), f"{tmp_dir}/probe")
    ranks = pagerank(probe.link_edges(), n_iter=8).to_pandas()
    ranks["host"] = [host_of(u) for u in ranks["node"]]
    authority = ranks.groupby("host")["rank"].sum()
    # integer priority tiers (priority_fn returns ints; higher = sooner)
    tiers = {h: int(r * 1_000_000) for h, r in authority.items()}

    # phase 2: full crawl, high-authority hosts first within each wave,
    # budget enforced by job_limit (best-first under budget)
    spec = CrawlSpec(
        priority_fn=lambda job: tiers.get(host_of(job["url"]), 0),
        job_limit=120,
    )
    full = crawl(web, seeds, spec, f"{tmp_dir}/full")

    order = full.crawl_order().to_pandas().sort_values("seq")
    order["host"] = [host_of(u) for u in order["url"]]
    order["tier"] = order["host"].map(tiers).fillna(0)
    return {
        "host_authority": authority.sort_values(ascending=False),
        "first_hosts": order.head(30)["host"].tolist(),
        "n_fetched": len(order),
        "mean_tier_first_half": float(order.head(len(order) // 2)["tier"].mean()),
        "mean_tier_second_half": float(order.tail(len(order) // 2)["tier"].mean()),
    }


if __name__ == "__main__":
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    out = main()
    print(out["host_authority"].head())
    print(f"fetched {out['n_fetched']} pages; mean authority tier "
          f"first half {out['mean_tier_first_half']:.0f} vs "
          f"second half {out['mean_tier_second_half']:.0f}")
    ray.shutdown()
