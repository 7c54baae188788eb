"""CLI crawl driver — the bin/start_batch_crawl.rb / standalone_crawl.rb
analog (CLI arg parsing bin/start_batch_crawl.rb:29-67, bin/start_crawl.rb:
29-66): parse options into a CrawlSpec, run the wave crawl, print one JSON
summary line. This is the submit-able entry point (`ray job submit -- python
-m cloud_crawler_ray ...` on a real cluster): the SCRIPT owns the Ray
session; library code never calls ray.init.

    python -m cloud_crawler_ray --out /tmp/crawl --synthetic-pages 500
    python -m cloud_crawler_ray --out /tmp/crawl \
        --web pages.parquet --seeds http://h0.test/p0,http://h1.test/

The web is a page TABLE (the synthweb/web_table schema) because this
sandbox has no network; a real deployment swaps the table-backed fetcher
for an HTTP one behind the same fetch stage. Re-running with the same
--out resumes from the last committed wave (checkpoint markers)."""

from __future__ import annotations

import argparse
import json


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m cloud_crawler_ray", description=__doc__.split("\n\n")[0]
    )
    p.add_argument("--out", required=True, help="output/checkpoint directory")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--web", help="parquet file with the page table to crawl")
    src.add_argument(
        "--synthetic-pages", type=int, help="crawl a deterministic synthetic web of N pages"
    )
    p.add_argument("--synthetic-hosts", type=int, default=8)
    p.add_argument("--synthetic-seed", type=int, default=42)
    p.add_argument(
        "--seeds",
        help="comma-separated seed URLs, or @FILE with one URL per line "
        "(default: the synthetic web's seeds)",
    )
    p.add_argument("--depth-limit", type=int, default=None)
    p.add_argument("--delay", type=float, default=0.0, help="per-host politeness seconds")
    p.add_argument("--job-limit", type=int, default=None, help="max jobs per wave (rest spills)")
    p.add_argument("--max-waves", type=int, default=None)
    p.add_argument("--user-agent", default="cloud-crawler-ray/0.1")
    p.add_argument("--obey-robots-txt", action="store_true")
    p.add_argument(
        "--obey-crawl-delay", action="store_true",
        help="per-host delay = max(--delay, robots Crawl-delay)",
    )
    p.add_argument(
        "--max-pages-per-host", type=int, default=None,
        help="per-host crawl budget (scheduled pages, whole crawl)",
    )
    p.add_argument(
        "--use-sitemaps", action="store_true",
        help="extend seeds with each seed host's sitemap.xml URLs",
    )
    p.add_argument("--skip-query-strings", action="store_true")
    p.add_argument(
        "--outside-domain", action="store_true", help="follow links off the seed domains"
    )
    p.add_argument(
        "--no-follow-links", action="store_true", help="curl mode: fetch seeds only"
    )
    return p


def main(argv: list[str] | None = None) -> dict:
    """Run the crawl and return the summary dict (Ray must already be
    initialised by the caller / the __main__ block)."""
    import glob
    import os

    import pyarrow.parquet as pq

    from .pipelines.crawl import crawl
    from .spec import CrawlSpec
    from .synthweb import make_skewed_web

    args = build_parser().parse_args(argv)

    if args.web:
        web = pq.read_table(args.web)
        default_seeds: list[str] = []
    else:
        web, default_seeds = make_skewed_web(
            args.synthetic_pages,
            n_hosts=args.synthetic_hosts,
            seed=args.synthetic_seed,
        )
    if args.seeds:
        if args.seeds.startswith("@"):
            with open(args.seeds[1:]) as f:
                seeds = [ln.strip() for ln in f if ln.strip()]
        else:
            seeds = [s.strip() for s in args.seeds.split(",") if s.strip()]
    else:
        seeds = default_seeds
    if not seeds:
        raise SystemExit("no seeds: pass --seeds (required with --web)")

    spec = CrawlSpec(
        depth_limit=args.depth_limit,
        delay=args.delay,
        job_limit=args.job_limit,
        user_agent=args.user_agent,
        obey_robots_txt=args.obey_robots_txt,
        obey_crawl_delay=args.obey_crawl_delay,
        max_pages_per_host=args.max_pages_per_host,
        use_sitemaps=args.use_sitemaps,
        skip_query_strings=args.skip_query_strings,
        outside_domain=args.outside_domain,
        inside_domain=not args.outside_domain,
        follow_links=not args.no_follow_links,
    )
    # auto-resume: an --out with committed lineage markers continues from
    # the last committed wave instead of wiping (standalone_crawl re-runs)
    resume = bool(glob.glob(os.path.join(args.out, "lineage", "wave=*.json")))
    handle = crawl(web, seeds, spec, args.out, max_waves=args.max_waves, resume=resume)
    return {
        "out_dir": handle.out_dir,
        "waves": handle.waves,
        "jobs": handle.n_jobs,
        "documents": handle.documents().count(),
        "counters": handle.counters(),
    }


if __name__ == "__main__":
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    try:
        print(json.dumps(main()))
    finally:
        ray.shutdown()
