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

_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambdaw mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega data query table row "
    "column batch stream filter merge sort hash join scan index shard block"
).split()


@dataclass
class FakePage:
    """One synthetic page. ``links`` are page names on the same host
    (FakePage :links); ``hrefs`` are absolute URLs (:hrefs); ``media`` are
    (kind, src) pairs interleaved between text runs and anchors."""

    name: str
    host: str = DEFAULT_HOST
    scheme: str = "http"                 # "https" for TLS loopback fixtures
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
    auth: str | None = None              # "user:pass" → 401 without credentials
    set_cookie: str | None = None        # Set-Cookie response header
    fail_times: int = 0                  # transient failures before success
    #                                      (>3 → the fetcher's retry budget is
    #                                      exhausted and the page errors out)
    require_cookie: str | None = None    # "name=value" gating the real body
    canonical: str | None = None         # <link rel="canonical"> target page
    #                                      name (same host) or absolute URL

    @property
    def url(self) -> str:
        return page_url(self.name, self.host, self.scheme)


def page_url(name: str, host: str = DEFAULT_HOST, scheme: str = "http") -> str:
    return f"{scheme}://{host}/{name}"


def render_body(page: FakePage) -> bytes:
    """Generate an HTML body with an ordered, interleaved mix of text runs,
    anchors, and media tags (fakeweb_helper.rb:55-70 shape + media)."""
    if page.body is not None:
        return page.body
    parts = ["<html><head>"]
    if page.base:
        parts.append(f'<base href="{page.base}">')
    if page.canonical:
        target = (
            page.canonical
            if "://" in page.canonical
            else page_url(page.canonical, page.host, page.scheme)
        )
        parts.append(f'<link rel="canonical" href="{target}">')
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


def web_table(
    pages: list[FakePage],
    robots: dict[str, str] | None = None,
    sitemaps: dict[str, str] | None = None,
    scheme: str = "http",
) -> pa.Table:
    """Materialize pages (+ per-host robots.txt / sitemap.xml bodies) as a
    WEB_SCHEMA table.

    Redirect targets must be registered as their own pages (the FakePage
    helper auto-registers them; callers here list them explicitly)."""
    rows = {
        "url": [],
        "status": [],
        "content_type": [],
        "body": [],
        "redirect_to": [],
        "latency_ms": [],
        "auth": [],
        "set_cookie": [],
        "fail_times": [],
        "require_cookie": [],
    }
    for p in pages:
        rows["url"].append(p.url)
        if p.redirect is not None:
            rows["status"].append(301)
            rows["content_type"].append("text/html")
            rows["body"].append(b"")
            target = (
                p.redirect
                if "://" in p.redirect
                else page_url(p.redirect, p.host, p.scheme)
            )
            rows["redirect_to"].append(target)
        else:
            rows["status"].append(p.status)
            rows["content_type"].append(p.content_type)
            rows["body"].append(render_body(p))
            rows["redirect_to"].append("")
        rows["latency_ms"].append(p.latency_ms)
        rows["auth"].append(p.auth or "")
        rows["set_cookie"].append(p.set_cookie or "")
        rows["fail_times"].append(p.fail_times)
        rows["require_cookie"].append(p.require_cookie or "")
    for path, ctype, d in (
        ("robots.txt", "text/plain", robots),
        ("sitemap.xml", "application/xml", sitemaps),
    ):
        for host, body in (d or {}).items():
            # SyntheticNet's robots/sitemap discovery is http-keyed
            # (oracle.py robots_for); an https table carries both rows so
            # the serial oracle and the TLS wire agree on admission.
            urls = [f"{scheme}://{host}/{path}"]
            if scheme != "http":
                urls.append(f"http://{host}/{path}")
            for u in urls:
                rows["url"].append(u)
                rows["status"].append(200)
                rows["content_type"].append(ctype)
                rows["body"].append(body.encode())
                rows["redirect_to"].append("")
                rows["latency_ms"].append(5)
                rows["auth"].append("")
                rows["set_cookie"].append("")
                rows["fail_times"].append(0)
                rows["require_cookie"].append("")
    return pa.table(rows, schema=WEB_SCHEMA)


def mutate_web(web: pa.Table, every: int = 7) -> pa.Table:
    """Deterministic 'next version' of a synthetic web for incremental
    recrawl: every text/html 200 page whose url-crc % *every* == 0 gains a
    trailing text paragraph (content change → new ETag; the link structure
    is untouched, so the crawl frontier is identical and only the changed
    fraction refetches). robots.txt / sitemap.xml rows never mutate."""
    import zlib

    urls = web.column("url").to_pylist()
    bodies = web.column("body").to_pylist()
    statuses = web.column("status").to_pylist()
    ctypes = web.column("content_type").to_pylist()
    out = []
    for u, b, st, ct in zip(urls, bodies, statuses, ctypes):
        if (
            b
            and st == 200
            and ct == "text/html"
            and not u.endswith(("/robots.txt", "/sitemap.xml"))
            and zlib.crc32(u.encode("utf-8")) % every == 0
        ):
            b = b + b"\n<p>updated in the next version</p>"
        out.append(b)
    i = web.column_names.index("body")
    return web.set_column(i, "body", pa.array(out, pa.binary()))


def make_api_web(n_docs: int, seed: int = 7) -> tuple[pa.Table, list[str]]:
    """Deterministic JSON-API fixture (BatchApiJob target): n_docs endpoints
    each serving a JSON document; seeds = every endpoint (url-list mode)."""
    import json
    import zlib

    pages = []
    for i in range(n_docs):
        doc = {
            "id": i,
            "name": f"item {i}",
            "score": zlib.crc32(f"{seed}:{i}".encode()) % 1000,
            "tags": [f"t{(i + j) % 11}" for j in range(i % 4)],
        }
        pages.append(
            FakePage(
                name=f"api/items/{i}",
                content_type="application/json",
                body=json.dumps(doc).encode(),
                latency_ms=5 + zlib.crc32(f"{seed}:lat:{i}".encode()) % 10,
            )
        )
    return web_table(pages), [p.url for p in pages]


from dataclasses import dataclass as _dataclass


@_dataclass(frozen=True)
class SkewedWebParams:
    n_pages: int
    n_hosts: int = 20
    hot_frac: float = 0.5
    branching: int = 3
    seed: int = 42
    cross_host_every: int = 7
    media_every: int = 3
    texts_per_page: int = 2
    words_per_text: int = 8

    def per_host(self) -> list[int]:
        hot = int(self.n_pages * self.hot_frac)
        rest = self.n_pages - hot
        return [hot] + [max(1, rest // (self.n_hosts - 1))] * (self.n_hosts - 1)

    def hosts(self) -> list[str]:
        return [f"host{h}.example.com" for h in range(self.n_hosts)]


def _latency_for(host: str, i: int, seed: int) -> int:
    import zlib

    return 5 + zlib.crc32(f"{seed}:{host}:{i}".encode()) % 25


def _page_for(p: SkewedWebParams, h: int, i: int, count: int, host: str) -> FakePage:
    """Pure page constructor shared by the materialized and procedural webs —
    fully determined by (params, host index, page index)."""
    import zlib

    children = [
        f"p{c}" for c in range(i * p.branching + 1, min(i * p.branching + 1 + p.branching, count))
    ]
    hrefs = []
    if i % p.cross_host_every == 3:
        other = zlib.crc32(f"{p.seed}:x:{host}:{i}".encode()) % p.n_hosts
        if other != h:
            hrefs.append(f"http://host{other}.example.com/p0")
    media = []
    if i % p.media_every == 0:
        media.append(("img", f"/assets/{i}.png"))
    if i % (p.media_every * 4) == 1:
        media.append(("video", f"/assets/{i}.mp4"))
    return FakePage(
        name=f"p{i}",
        host=host,
        links=children,
        hrefs=hrefs,
        media=media,
        texts=[
            f"synthetic text {host} {i} run {t} "
            + " ".join(
                _WORDS[(i * 7 + t * 3 + w) % len(_WORDS)]
                for w in range(p.words_per_text)
            )
            for t in range(p.texts_per_page)
        ],
        latency_ms=_latency_for(host, i, p.seed),
    )


def make_skewed_web(
    n_pages: int,
    n_hosts: int = 20,
    hot_frac: float = 0.5,
    branching: int = 3,
    seed: int = 42,
    cross_host_every: int = 7,
    media_every: int = 3,
    texts_per_page: int = 2,
    words_per_text: int = 8,
) -> tuple[pa.Table, list[str]]:
    """The scaling/bench fixture: one hot host holding ``hot_frac`` of all
    pages + many small hosts (FIXTURES.md §1). Each host's pages form a
    ``branching``-ary tree from its root (so BFS reaches everything from the
    per-host root seeds), with deterministic cross-host links sprinkled in.

    Returns (web table, seed URLs = per-host roots)."""
    p = SkewedWebParams(
        n_pages, n_hosts, hot_frac, branching, seed,
        cross_host_every, media_every, texts_per_page, words_per_text,
    )
    pages: list[FakePage] = []
    hosts = p.hosts()
    counts = p.per_host()
    for h in range(p.n_hosts):
        for i in range(counts[h]):
            pages.append(_page_for(p, h, i, counts[h], hosts[h]))
    seeds = [page_url("p0", host) for host in hosts]
    return web_table(pages), seeds


_PROC_URL_RE = None


class ProceduralWeb:
    """The skewed synthetic web WITHOUT materializing it: fetch workers
    compute each page's row on demand from (params, url). This is the
    at-scale shape — the network is external, nothing broadcasts page
    bodies — and it reduces crawl startup to shipping a tiny params object.

    Same lookup interface as oracle.SyntheticNet; also serves as the
    chain-latency index (no redirects in this web → chain cost = own
    latency)."""

    def __init__(self, params: SkewedWebParams):
        self.params = params
        self._per_host = params.per_host()
        self._hosts = params.hosts()
        self._re = None

    def _parse(self, url: str):
        import re

        if self._re is None:
            self._re = re.compile(r"^http://host([0-9]+)\.example\.com/p([0-9]+)$")
        m = self._re.match(url)
        if not m:
            return None
        h, i = int(m.group(1)), int(m.group(2))
        if h >= self.params.n_hosts or i >= self._per_host[h]:
            return None
        return h, i

    def lookup(self, url: str) -> dict | None:
        hi = self._parse(url)
        if hi is None:
            return None
        h, i = hi
        page = _page_for(self.params, h, i, self._per_host[h], self._hosts[h])
        return {
            "url": page.url,
            "status": page.status,
            "content_type": page.content_type,
            "body": render_body(page),
            "redirect_to": "",
            "latency_ms": page.latency_ms,
        }

    # chain-latency index interface (stages/politeness.py)
    def get(self, url: str, default: int = 0) -> int:
        hi = self._parse(url)
        if hi is None:
            return default
        h, i = hi
        return _latency_for(self._hosts[h], i, self.params.seed)

    def robots_for(self, host: str):
        import urllib.robotparser

        rp = urllib.robotparser.RobotFileParser()
        rp.parse([])  # no robots rows in the procedural web → allow all
        return rp

    def seeds(self) -> list[str]:
        return [page_url("p0", host) for host in self.params.hosts()]

    def all_urls(self) -> list[str]:
        return [
            f"http://host{h}.example.com/p{i}"
            for h in range(self.params.n_hosts)
            for i in range(self._per_host[h])
        ]
