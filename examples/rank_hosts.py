"""rank_hosts example — post-crawl graph analytics: crawl a web, build the
link graph from the raw fetch table, PageRank it, and fold page ranks into
per-host authority scores + crawl telemetry. The reference stops at per-page
folds (examples/word_count.rb); this is the rank-the-corpus step a crawl
feeding a training pipeline runs next (seed scoring, rank-weighted
sampling).

Run: python examples/rank_hosts.py
"""

from __future__ import annotations


def main(tmp_dir: str = "/tmp/ccray_example_rankhosts"):
    import shutil

    import pandas as pd

    from cloud_crawler_ray.canon import host_of
    from cloud_crawler_ray.ops.graph import pagerank
    from cloud_crawler_ray.pipelines.crawl import crawl
    from cloud_crawler_ray.spec import CrawlSpec
    from cloud_crawler_ray.synthweb import make_skewed_web

    shutil.rmtree(tmp_dir, ignore_errors=True)
    web, seeds = make_skewed_web(300, n_hosts=6, seed=7)
    handle = crawl(web, seeds, CrawlSpec(), tmp_dir)

    ranks = pagerank(handle.link_edges(), n_iter=8).to_pandas()
    ranks["host"] = [host_of(u) for u in ranks["node"]]
    by_host = (
        ranks.groupby("host", as_index=False)
        .agg(total_rank=("rank", "sum"), n_pages=("rank", "size"))
        .sort_values("total_rank", ascending=False)
        .reset_index(drop=True)
    )
    return by_host


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False)
    df = main()
    print(df.to_string())
    ray.shutdown()
