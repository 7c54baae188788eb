"""Benchmark entry point.

Headline: the flagship crawl (frontier waves → sharded URL-seen → politeness
→ fetch+extract → interleaved-span documents) over the deterministic skewed
synthetic web sized for $GRAFT_SF_DIR, reported as seconds (value) and
URLs/sec; plus per-query timings for the full operator registry.

    python bench.py               # one JSON line on stdout
    python bench.py --scaling     # headline at num_cpus=8 vs 32 in fresh
                                  # processes → scaling efficiency JSON line

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS (default
32), BENCH_HEADLINE_ONLY=1 to skip the query suite (used by --scaling).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def _materialize(result) -> int:
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        return result.count()
    if isinstance(result, pa.Table):
        return result.num_rows
    if isinstance(result, pd.DataFrame):
        return len(result)
    return 0


def run_once() -> dict:
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from cloud_crawler_ray.pipelines.crawl import crawl
    from cloud_crawler_ray.pipelines.queries import _SF_PAGES, _sf_of, QUERIES
    from cloud_crawler_ray.spec import CrawlSpec
    from cloud_crawler_ray.synthweb import make_skewed_web

    sf = _sf_of(sf_dir)
    n_pages = _SF_PAGES.get(sf, 4000)

    # warm the page cache / workers with one small untimed read
    import ray.data as rd

    rd.read_parquet(os.path.join(sf_dir, "documents.parquet")).count()

    # ---- headline: full crawl of the synthetic web ----
    web, seeds = make_skewed_web(n_pages, n_hosts=max(8, n_pages // 250), seed=42)
    out_dir = f"/tmp/ccray_bench_crawl_{num_cpus}"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    handle = crawl(web, seeds, CrawlSpec(delay=0.02), out_dir)
    headline_sec = time.perf_counter() - t0
    urls_per_sec = handle.n_jobs / headline_sec

    query_times: dict[str, float] = {}
    if os.environ.get("BENCH_HEADLINE_ONLY") != "1":
        # crawl_* / media_features queries read the flagship crawl's output;
        # point their cache at this bench run instead of re-crawling
        cache_dir = f"/tmp/ccray_crawl_sf{sf}"
        shutil.rmtree(cache_dir, ignore_errors=True)
        shutil.copytree(out_dir, cache_dir)
        for name, fn in QUERIES.items():
            t0 = time.perf_counter()
            _materialize(fn(sf_dir))
            query_times[name] = round(time.perf_counter() - t0, 3)

    out = {
        "metric": "crawl fetch+extract wall-time (synthetic web, URLs/sec in extras)",
        "value": round(headline_sec, 3),
        "unit": "sec",
        "queries": query_times,
        "sf": float(sf),
        "num_cpus": num_cpus,
        "crawl_jobs": handle.n_jobs,
        "crawl_waves": handle.waves,
        "urls_per_sec": round(urls_per_sec, 1),
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(
            os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_HEADLINE_ONLY="1"
        )
        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__), "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = run(lo), run(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling efficiency (same crawl, num_cpus 8 vs 32, fresh sessions)",
        "sec_8": t_lo,
        "sec_32": t_hi,
        "urls_per_sec_8": r_lo["urls_per_sec"],
        "urls_per_sec_32": r_hi["urls_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "sf": r_hi["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_once()))
