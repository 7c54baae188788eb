"""Anchor-text-focused site crawl — reference parity for
examples/crossfit_crawl.rb (the Trollop-CLI demo that crawls a site at
depth 2, discards page bodies, follows OUTSIDE-domain links, prints every
URL, and keeps only links whose anchor text matches /Level 1/i via
``focus_crawl`` + ``text_for``).

Same knobs, same hooks, Ray-Data-native: the CLI mirrors the Trollop
options (crossfit_crawl.rb:10-21), ``on_every_page`` streams URLs through
the counter channel (the `puts` analog), and ``focus_crawl`` filters links
by their anchor text looked up from the page's interleaved link spans
(``text_for``, page.rb anchor lookup). The site is a deterministic
synthetic cert directory (no network in this sandbox); point ``--urls`` at
a real site with the HttpNet backend to run it on the wire.

Run: python examples/certs_crawl.py [--depth-limit 2] [--pattern "Level 1"]
"""

from __future__ import annotations

import re


def build_cert_directory():
    """A small multi-host training-cert directory: a hub site linking out
    to per-gym course pages, each linking out again to a certs host whose
    anchor texts say 'Level 1 Cert' / 'Level 2 Cert'. Every hop a focused
    crawl should take is an OUTSIDE-domain link (the reference demo crawls
    outside links only, crossfit_crawl.rb:18-20)."""
    from cloud_crawler_ray.synthweb import FakePage, page_url, web_table

    hub, certs = "www.hub.example.com", "certs.example.com"
    pages = []
    hub_anchors = "".join(
        f'<a href="http://gym{g}.example.com/courses">gym {g} Level 1 / Level 2 courses</a>'
        for g in range(4)
    )
    pages.append(
        FakePage(
            name="",
            host=hub,
            body=f"<html><body><p>cert directory</p>{hub_anchors}</body></html>".encode(),
        )
    )
    for g in range(4):
        gym = f"gym{g}.example.com"
        body = (
            f"<html><body><p>courses at gym {g}</p>"
            f'<a href="http://{certs}/gym{g}-level1">Level 1 Cert</a>'
            f'<a href="http://{certs}/gym{g}-level2">Level 2 Cert</a>'
            '<a href="contact">Contact us</a>'
            "</body></html>"
        ).encode()
        pages.append(FakePage(name="courses", host=gym, body=body))
        pages.append(FakePage(name="contact", host=gym, texts=["directions"]))
        for lvl in (1, 2):
            pages.append(
                FakePage(
                    name=f"gym{g}-level{lvl}",
                    host=certs,
                    texts=[f"Level {lvl} Cert schedule for gym {g}"],
                )
            )
    return web_table(pages), [page_url("", hub)]


def text_for(page: dict, link: str) -> str:
    """Anchor text of *link* on *page* (the reference's text_for helper):
    first link span whose target is the link."""
    for s in page["spans"]:
        if s["kind"] == "link" and s["media_ref"] == link:
            return s["text"]
    return ""


def main(argv: list[str] | None = None, tmp_dir: str = "/tmp/ccray_example_certs"):
    import argparse

    from cloud_crawler_ray.pipelines.crawl import crawl
    from cloud_crawler_ray.spec import CrawlSpec

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--urls", "-u", nargs="*", default=None)
    ap.add_argument("--job-name", "-n", default="certs")
    ap.add_argument("--depth-limit", "-l", type=int, default=2)
    ap.add_argument("--discard-page", "-d", action="store_true", default=True)
    ap.add_argument("--skip-query-strings", "-Q", action="store_true", default=False)
    ap.add_argument("--outside-domain", "-U", action="store_true", default=True)
    ap.add_argument("--inside-domain", "-T", action="store_true", default=False)
    ap.add_argument("--pattern", default="Level 1")
    args = ap.parse_args(argv)

    web, seeds = build_cert_directory()
    if args.urls:
        seeds = args.urls
    pat = re.compile(args.pattern, re.IGNORECASE)

    def focus(page: dict, links: list[str]) -> list[str]:
        # keep_if { text_for(lnk) =~ /Level 1/i } — crossfit_crawl.rb:32-36
        return [ln for ln in links if pat.search(text_for(page, ln))]

    spec = CrawlSpec(
        depth_limit=args.depth_limit,
        discard_page=args.discard_page,
        skip_query_strings=args.skip_query_strings,
        outside_domain=args.outside_domain,
        inside_domain=args.inside_domain,
        focus_crawl=focus,
        # `puts page.url` analog: URLs stream through the counter channel
        on_every_page=lambda p: {f"url:{p['url']}": 1},
    )
    handle = crawl(web, seeds, spec, f"{tmp_dir}_{args.job_name}")
    urls = sorted(
        k[len("url:"):] for k in handle.counters() if k.startswith("url:")
    )
    return urls


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
    for u in main():
        print(u)
    ray.shutdown()
