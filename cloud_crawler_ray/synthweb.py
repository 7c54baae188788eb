"""Deterministic synthetic web generator — the FakeWeb analog.

The reference tests against FakeWeb-registered pages built by
``CloudCrawler::FakePage`` (spec/fakeweb_helper.rb:27-93): generated bodies
with relative ``:links`` / absolute ``:hrefs``, ``:redirect`` targets,
``:base`` tags, content types. This module generates the same shapes — plus
media tags (``<img>``/``<video>``) for interleaved spans, robots.txt rows,
and a skewed multi-host graph for politeness / salting / scaling benches —
as a parquet/Arrow ``web`` table (WEB_SCHEMA). Everything is seeded and
deterministic; there is no network in this sandbox, and at real scale the
fetch stage would swap this lookup for real HTTP behind the same interface.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from .schemas import WEB_SCHEMA

DEFAULT_HOST = "www.example.com"


@dataclass
class FakePage:
    """One synthetic page. ``links`` are page names on the same host
    (FakePage :links); ``hrefs`` are absolute URLs (:hrefs); ``media`` are
    (kind, src) pairs interleaved between text runs and anchors."""

    name: str
    host: str = DEFAULT_HOST
    links: list[str] = field(default_factory=list)
    hrefs: list[str] = field(default_factory=list)
    media: list[tuple[str, str]] = field(default_factory=list)
    texts: list[str] = field(default_factory=list)
    redirect: str | None = None          # target page name → 301
    status: int = 200
    content_type: str = "text/html"
    base: str | None = None              # <base href>
    body: bytes | None = None            # explicit body overrides generation
    latency_ms: int = 10

    @property
    def url(self) -> str:
        return page_url(self.name, self.host)


def page_url(name: str, host: str = DEFAULT_HOST) -> str:
    return f"http://{host}/{name}"


def render_body(page: FakePage) -> bytes:
    """Generate an HTML body with an ordered, interleaved mix of text runs,
    anchors, and media tags (fakeweb_helper.rb:55-70 shape + media)."""
    if page.body is not None:
        return page.body
    parts = ["<html><head>"]
    if page.base:
        parts.append(f'<base href="{page.base}">')
    parts.append(f"<title>page {page.name}</title></head><body>")
    anchors = [f'<a href="{ln}">to {ln}</a>' for ln in page.links]
    anchors += [f'<a href="{href}">ext {href}</a>' for href in page.hrefs]
    media = [f'<{k} src="{src}">' for k, src in page.media]
    texts = page.texts or [f"text run {i} of {page.name}" for i in range(2)]
    # interleave: text, anchor, text, media, anchor, ...
    items: list[str] = []
    ai, mi = 0, 0
    for i, t in enumerate(texts):
        items.append(f"<p>{t}</p>")
        if ai < len(anchors):
            items.append(anchors[ai])
            ai += 1
        if i % 2 == 1 and mi < len(media):
            items.append(media[mi])
            mi += 1
    items.extend(anchors[ai:])
    items.extend(media[mi:])
    parts.extend(items)
    parts.append("</body></html>")
    return "\n".join(parts).encode("utf-8")


def web_table(pages: list[FakePage], robots: dict[str, str] | None = None) -> pa.Table:
    """Materialize pages (+ per-host robots.txt bodies) as a WEB_SCHEMA table.

    Redirect targets must be registered as their own pages (the FakePage
    helper auto-registers them; callers here list them explicitly)."""
    rows = {
        "url": [],
        "status": [],
        "content_type": [],
        "body": [],
        "redirect_to": [],
        "latency_ms": [],
    }
    for p in pages:
        rows["url"].append(p.url)
        if p.redirect is not None:
            rows["status"].append(301)
            rows["content_type"].append("text/html")
            rows["body"].append(b"")
            target = p.redirect if "://" in p.redirect else page_url(p.redirect, p.host)
            rows["redirect_to"].append(target)
        else:
            rows["status"].append(p.status)
            rows["content_type"].append(p.content_type)
            rows["body"].append(render_body(p))
            rows["redirect_to"].append("")
        rows["latency_ms"].append(p.latency_ms)
    for host, body in (robots or {}).items():
        rows["url"].append(f"http://{host}/robots.txt")
        rows["status"].append(200)
        rows["content_type"].append("text/plain")
        rows["body"].append(body.encode())
        rows["redirect_to"].append("")
        rows["latency_ms"].append(5)
    return pa.table(rows, schema=WEB_SCHEMA)


def make_skewed_web(
    n_pages: int,
    n_hosts: int = 20,
    hot_frac: float = 0.5,
    branching: int = 3,
    seed: int = 42,
    cross_host_every: int = 7,
    media_every: int = 3,
) -> tuple[pa.Table, list[str]]:
    """The scaling/bench fixture: one hot host holding ``hot_frac`` of all
    pages + many small hosts (FIXTURES.md §1). Each host's pages form a
    ``branching``-ary tree from its root (so BFS reaches everything from the
    per-host root seeds), with deterministic cross-host links sprinkled in.

    Returns (web table, seed URLs = per-host roots)."""
    rng = np.random.default_rng(seed)
    hosts = [f"host{h}.example.com" for h in range(n_hosts)]
    hot = int(n_pages * hot_frac)
    rest = n_pages - hot
    per_host = [hot] + [max(1, rest // (n_hosts - 1))] * (n_hosts - 1)

    pages: list[FakePage] = []
    for h, host in enumerate(hosts):
        count = per_host[h]
        for i in range(count):
            children = [
                f"p{c}" for c in range(i * branching + 1, min(i * branching + 1 + branching, count))
            ]
            hrefs = []
            if i % cross_host_every == 3:
                other = hosts[int(rng.integers(0, n_hosts))]
                if other != host:
                    hrefs.append(f"http://{other}/p0")
            media = []
            if i % media_every == 0:
                media.append(("img", f"/assets/{i}.png"))
            if i % (media_every * 4) == 1:
                media.append(("video", f"/assets/{i}.mp4"))
            pages.append(
                FakePage(
                    name=f"p{i}",
                    host=host,
                    links=children,
                    hrefs=hrefs,
                    media=media,
                    texts=[
                        f"synthetic text {host} {i} alpha beta",
                        f"gamma delta content {i % 13} {i % 7}",
                    ],
                    latency_ms=int(rng.integers(5, 30)),
                )
            )
    seeds = [page_url("p0", h) for h in hosts]
    return web_table(pages), seeds
