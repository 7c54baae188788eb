"""URL canonicalization — reference-exact semantics, pure functions.

Reference semantics reproduced here (cited file:line are in
/root/reference/cloud-crawler):

- ``key_for``: ``url.to_s.downcase.gsub("https",'http').gsub(/\\s+/,' ')``
  (lib/cloud-crawler/redis_page_store.rb:34-36,
  lib/cloud-crawler/redis_url_bloomfilter.rb:74-76) — the page-store /
  URL-seen key normalization: lowercase, every "https" substring → "http",
  whitespace runs → single space.
- ``to_absolute``: strip a trailing ``#anchor`` (regex ``#[a-zA-Z0-9_-]*$``),
  URI-decode + re-encode, resolve against ``<base href>`` or the page URL,
  and force an empty path to "/" (lib/cloud-crawler/page.rb:232-244).
- ``normalize_link``: empty path → "/" on a seed URL
  (lib/cloud-crawler/driver.rb:115-119).

These are pure string functions used both inside vectorized ``map_batches``
stages and by the single-threaded oracle, guaranteeing identical admission /
dedup keys in both.
"""

from __future__ import annotations

import re
from urllib.parse import quote, unquote, urljoin, urlsplit

_ANCHOR_RE = re.compile(r"#[a-zA-Z0-9_-]*$")
_WS_RE = re.compile(r"\s+")

# Characters Ruby's (obsolete) URI.encode leaves unescaped — the reserved +
# unreserved set. We control the synthetic-web URL charset, so this only needs
# to round-trip percent-encoding consistently between engine and oracle.
_SAFE = "/:?#[]@!$&'()*+,;=%~-._"


def strip_anchor(link: str) -> str:
    """Remove a trailing #fragment (only [a-zA-Z0-9_-]* at end-of-string),
    exactly like page.rb:236."""
    return _ANCHOR_RE.sub("", link)


def reencode(link: str) -> str:
    """URI.decode then URI.encode (page.rb:236) — normalizes percent-encoding."""
    return quote(unquote(link), safe=_SAFE)


def ensure_path(url: str) -> str:
    """Empty path → '/' (page.rb:241, driver.rb:115-119)."""
    parts = urlsplit(url)
    if parts.path == "" and parts.scheme in ("http", "https"):
        netloc_end = url.find(parts.netloc) + len(parts.netloc)
        return url[:netloc_end] + "/" + url[netloc_end:]
    return url


_ABS_FAST_RE = re.compile(
    r"^https?://[a-z0-9.\-]+(?::[0-9]+)?/[a-z0-9._~:/?=&+,;@!$'()*\-]*$"
)


_REL_FAST_RE = re.compile(r"^/?[a-z0-9_~\-][a-z0-9._~\-/]*$")
_AUTH_FAST_RE = re.compile(r"^(https?://[a-z0-9.\-]+(?::[0-9]+)?)/")


def to_absolute(link: str, page_url: str, base_url: str | None = None) -> str | None:
    """Absolutize *link* against *base_url* (from <base href>) or *page_url*.

    Returns None when the link is unparseable (reference: ``rescue next`` at
    page.rb:123).
    """
    if link is None:
        return None
    if _ABS_FAST_RE.match(link):
        # already absolute with a safe charset: anchor-strip, re-encode,
        # urljoin and ensure_path are all provably identity
        return link
    if (
        base_url is None
        and "/." not in link
        and _REL_FAST_RE.match(link)
        and "?" not in page_url
        and "#" not in page_url
    ):
        # plain relative reference against a clean page URL: anchor-strip
        # and re-encode are identity (safe charset, no '#'/'%'), urljoin is
        # a plain path merge (no dot segments), ensure_path is identity
        m = _AUTH_FAST_RE.match(page_url)
        if m:
            if link[0] == "/":
                return m.group(1) + link
            return page_url[: page_url.rfind("/") + 1] + link
    try:
        link = reencode(strip_anchor(str(link)))
        root = base_url if base_url else page_url
        absolute = urljoin(root, link)
        return ensure_path(absolute)
    except (ValueError, UnicodeError):
        return None


def key_for(url: str) -> str:
    """The URL-seen / page-store canonical key (redis_page_store.rb:34-36)."""
    return _WS_RE.sub(" ", str(url).lower().replace("https", "http"))


def canonical_url(url: str) -> str:
    """Full canonicalization: anchor strip + re-encode + empty path fix +
    key normalization. Used for the seen-set, in-wave dedup, and doc_id."""
    return key_for(ensure_path(reencode(strip_anchor(str(url)))))


# port handled explicitly; ':' excluded from the terminator lookahead so a
# userinfo authority ("u:p@host") falls through to urlsplit
_HOST_FAST_RE2 = re.compile(r"^[a-z]+://([a-z0-9.\-]+)(?::[0-9]+)?(?=[/?#]|$)")


def host_of(url: str) -> str:
    """Lower-cased host (empty string when absent) — the politeness /
    domain-confinement key (page.rb:87-89, http.rb:219-240)."""
    m = _HOST_FAST_RE2.match(url)
    if m:
        return m.group(1)
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


def normalize_seed(url: str) -> str:
    """Driver-side seed normalization (driver.rb:115-119 + 187-189)."""
    return ensure_path(str(url))


def has_query(url: str) -> bool:
    """True when the URL carries a query string (dsl_core.rb:269-271)."""
    if "?" not in url:
        return False
    try:
        return urlsplit(url).query != ""
    except ValueError:
        return False


# Fast-path detector: URLs that canonicalization provably leaves unchanged —
# lowercase http scheme, host, nonempty path of unreserved/sub-delim chars,
# no fragment, no percent-escapes, no whitespace, and no "https" substring
# anywhere (the gsub quirk). For these, canonical_url(u) == u and the host is
# the authority part. Synthetic-web URLs are all fast-path; anything else
# falls back to the exact per-row functions.
_FAST_RE = re.compile(r"^http://[a-z0-9.\-]+(?::[0-9]+)?/[a-z0-9._~:/?=&+,;@!$'()*\-]*$")


def is_canonical_fastpath(url: str) -> bool:
    return bool(_FAST_RE.match(url)) and "https" not in url


def canonical_urls(urls: list[str]) -> list[str]:
    """Vectorized-ish canonicalization: regex fast path (identity) with the
    exact function for the rest. Bit-identical to canonical_url per row."""
    return [u if is_canonical_fastpath(u) else canonical_url(u) for u in urls]


_USERINFO_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.\-]*://)([^/@?#]*@)")


def strip_userinfo(url: str) -> str:
    """Drop user:pass@ from the authority — servers never see credentials in
    the request URL (they travel as the Authorization header)."""
    return _USERINFO_RE.sub(r"\1", url)


def hosts_of(urls: list[str]) -> list[str]:
    return [host_of(u) for u in urls]  # host_of has the fast path inline


def path_of(url: str) -> str:
    """URL path component — skip_links_like patterns match the *path*
    (dsl_core.rb:277-279)."""
    try:
        return urlsplit(url).path
    except ValueError:
        return ""


# ---- crawl-trap skeleton (target-side addition; no reference analog — the
# reference's only trap defenses are depth_limit and skip_links_like) ----

_HEXRUN_RE = re.compile(r"\b[0-9a-f]{8,}\b")
_DIGITRUN_RE = re.compile(r"[0-9]+")


def url_skeleton(url: str) -> str:
    """Collapse a URL's variable parts into its generator 'shape': long hex
    runs (session ids, content hashes) → 'H', digit runs (dates, page
    numbers, object ids) → 'D', query string reduced to its sorted parameter
    NAMES. Calendar pagers, session-id mills and infinite facet grids emit
    unbounded URL sets that all share one skeleton — the per-(host, skeleton)
    budget caps them without touching legitimately distinct paths."""
    try:
        parts = urlsplit(url)
    except ValueError:
        return url.lower()
    path = _HEXRUN_RE.sub("H", parts.path.lower())
    path = _DIGITRUN_RE.sub("D", path)
    if parts.query:
        names = sorted({kv.split("=", 1)[0].lower() for kv in parts.query.split("&") if kv})
        return f"{path}?{','.join(names)}"
    return path


def trap_keys_of(urls: list[str]) -> list[str]:
    """host + US (\\x1f) + skeleton per URL. The separator keeps trap keys
    disjoint from the bare-hostname keyspace, so they can share the crawl's
    scheduled-count map (state shards + lineage 'sched') with the per-host
    budget — same commit, same resume restore. NEVER NUL: pandas' object
    hasher (shards_of routing, groupby factorization) compares C-string
    style and truncates at an embedded NUL (state/shards.py caution)."""
    return [f"{host_of(u)}\x1f{url_skeleton(u)}" for u in urls]
