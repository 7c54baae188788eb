"""focus-by-anchor-text example — reference parity for
examples/crossfit_crawl.rb:26-40: follow ONLY links whose anchor text
matches a pattern (`text_for(lnk) =~ /Level 1/i`), with off-domain follow
enabled (outside_domain). Anchor text reaches the focus_crawl hook through
the interleaved link spans (kind="link": media_ref=url, text=anchor).

Run: python examples/focus_by_anchor_text.py
"""

from __future__ import annotations

import re

_PATTERN = re.compile(r"cert", re.I)


def focus_by_anchor(page: dict, links: list[str]) -> list[str]:
    """focus_crawl hook: keep links whose anchor text matches (the
    page.links.keep_if { text_for(lnk) =~ ... } idiom)."""
    wanted = {
        s["media_ref"]
        for s in page["spans"]
        if s["kind"] == "link" and _PATTERN.search(s["text"] or "")
    }
    return [l for l in links if l in wanted]


def main(tmp_dir: str = "/tmp/ccray_example_anchor"):
    from cloud_crawler_ray.pipelines.crawl import crawl
    from cloud_crawler_ray.spec import CrawlSpec
    from cloud_crawler_ray.synthweb import FakePage, page_url, web_table

    pages = [
        FakePage(
            name="home",
            body=(
                b'<html><body><p>welcome</p>'
                b'<a href="/cert-l1">Cert Level 1</a>'
                b'<a href="/about">About us</a>'
                b'<a href="http://partner.example.org/cert">Partner Certification</a>'
                b"</body></html>"
            ),
        ),
        FakePage(name="cert-l1", texts=["level one certification"]),
        FakePage(name="about"),
        FakePage(name="cert", host="partner.example.org", texts=["partner cert"]),
    ]
    web = web_table(pages)
    spec = CrawlSpec(
        focus_crawl=focus_by_anchor, outside_domain=True, depth_limit=2
    )
    handle = crawl(web, [page_url("home")], spec, tmp_dir)
    return sorted(p["url"] for p in handle.pages().take_all())


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False)
    for u in main():
        print(u)
    ray.shutdown()
