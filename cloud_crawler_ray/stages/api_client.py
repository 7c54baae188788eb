"""JSON-API client — the HttpParty analog (SURVEY §2 F8).

Reference: lib/cloud-crawler/http_party.rb:26-135. The reference class is
mostly a stub — ``fetch_result`` builds and parses an EMPTY json
(http_party.rb:56-69), ``authenticate``/``is_authenticated?`` are empty
(:45-52) and ``fetch_results`` is a TODO (:28) — but it declares a real
surface: option accessors (redirect_limit :74-76, user_agent :82-88,
accept_cookies? :93-95, proxy host/port :100-109, read_timeout :114-116,
verbose? :119-121), a per-client CookieStore (:36, :42), and a same-host
``allowed?`` gate (:131-133). This analog implements that surface for real
against the synthetic net:

- ``fetch_result(url)`` follows same-host redirects up to ``redirect_limit``
  (shared ``fetch_chain`` kernel — the same one the crawl engine uses, so
  retry/auth/cookie semantics stay identical), parses the JSON body, and —
  like the reference's rescue path — returns ``{}`` on any error or
  non-JSON payload rather than raising.
- ``authenticate()`` splices HTTP basic credentials into request URLs as
  userinfo (exactly how the engine's fetch path carries creds,
  oracle.py ``fetch_chain``; http.rb:191) and probes one URL;
  ``is_authenticated`` reports the probe outcome.
- ``fetch_results`` — the reference's TODO — is the batched, distributed
  form: a callable actor class for ``map_batches(ApiFetchResults,
  concurrency=N)`` (net index built once per actor in ``__init__``), plus a
  Dataset-level helper.

Scale shape: one actor pool, zero shuffles; the JSON documents stream out as
Arrow string columns (body bytes never leave the stage).
"""

from __future__ import annotations

import json
import urllib.parse
from dataclasses import dataclass, field

import pyarrow as pa
import ray
import ray.data as rd

from ..oracle import SyntheticNet, fetch_chain
from .cookies import CookieStore

REDIRECT_LIMIT = 5  # http_party.rb:32


@dataclass(frozen=True)
class ApiOptions:
    """The ``opts`` hash of http_party.rb:38-43, typed."""

    redirect_limit: int | None = None  # nil → REDIRECT_LIMIT (:74-76)
    user_agent: str | None = None  # :82-88
    accept_cookies: bool = False  # :93-95
    proxy_host: str | None = None  # :100-102
    proxy_port: int | None = None  # :107-109
    read_timeout: float | None = None  # :114-116
    verbose: bool = False  # :119-121
    cookies: dict[str, str] = field(default_factory=dict)  # :42


def _ok(page) -> bool:
    """Success = fetched AND 2xx (the synthetic net returns 401/4xx pages as
    fetched rows with the status in ``code``, matching real HTTP)."""
    return bool(page is not None and page.fetched and 200 <= page.code < 300)


def _with_userinfo(url: str, user: str, password: str) -> str:
    """Splice ``user:password@`` into the URL's netloc (http.rb:191 carries
    basic-auth creds as URI userinfo; the synthetic net checks them there)."""
    parts = urllib.parse.urlsplit(url)
    host = parts.hostname or ""
    if parts.port:
        host = f"{host}:{parts.port}"
    netloc = f"{urllib.parse.quote(user, safe='')}:{urllib.parse.quote(password, safe='')}@{host}"
    return urllib.parse.urlunsplit(
        (parts.scheme, netloc, parts.path, parts.query, parts.fragment)
    )


class ApiClient:
    """Single-process JSON API client over a synthetic net (HttpParty
    analog). Stateless across calls except the cookie store."""

    def __init__(
        self,
        net,
        opts: ApiOptions | None = None,
        user: str = "",
        password: str = "",
    ):
        self.net = net
        self.opts = opts or ApiOptions()
        self.user = user
        self.password = password
        self.cookie_store = CookieStore()  # http_party.rb:36,42
        self._authenticated = False

    # ---- option surface (http_party.rb:74-121) ----
    @property
    def redirect_limit(self) -> int:
        return (
            self.opts.redirect_limit
            if self.opts.redirect_limit is not None
            else REDIRECT_LIMIT
        )

    @property
    def user_agent(self) -> str | None:
        return self.opts.user_agent

    @property
    def accept_cookies(self) -> bool:
        return bool(self.opts.accept_cookies)

    @property
    def proxy_host(self) -> str | None:
        return self.opts.proxy_host

    @property
    def proxy_port(self) -> int | None:
        return self.opts.proxy_port

    @property
    def read_timeout(self) -> float | None:
        return self.opts.read_timeout

    @property
    def verbose(self) -> bool:
        return bool(self.opts.verbose)

    # ---- same-host gate (http_party.rb:131-133) ----
    @staticmethod
    def allowed(to_url: str, from_url: str) -> bool:
        to_host = urllib.parse.urlsplit(to_url).hostname
        from_host = urllib.parse.urlsplit(from_url).hostname
        return to_host is None or to_host == from_host

    # ---- auth (http_party.rb:45-52, implemented) ----
    def authenticate(self, probe_url: str) -> bool:
        """Fetch *probe_url* with the client's basic credentials; remember
        whether the endpoint accepted them (2xx response — a 401 is a
        *fetched* page in the net's model, so gate on status)."""
        page = self._fetch(probe_url)
        self._authenticated = _ok(page)
        return self._authenticated

    @property
    def is_authenticated(self) -> bool:
        return self._authenticated

    # ---- fetch (http_party.rb:56-69, implemented; errors → {}) ----
    def _request_url(self, url: str) -> str:
        if self.user or self.password:
            return _with_userinfo(url, self.user, self.password)
        return url

    def _cookie_header(self, host: str) -> str:
        parts = [f"{k}={v}" for k, v in sorted(self.opts.cookies.items())]
        jar = self.cookie_store.cookie_header(host) if self.accept_cookies else ""
        if jar:
            parts.append(jar)
        return "; ".join(parts)

    def _fetch(self, url: str):
        host = urllib.parse.urlsplit(url).hostname or ""
        chain = fetch_chain(
            self.net,
            self._request_url(url),
            0,
            "",
            self.redirect_limit,
            cookie_header=self._cookie_header(host),
        )
        last = chain[-1] if chain else None
        if (
            last is not None
            and last.fetched
            and last.set_cookie
            and self.accept_cookies
        ):
            self.cookie_store.merge(host, [last.set_cookie])
        return last

    def fetch_result(self, url: str) -> dict:
        """Parsed JSON document at *url*; ``{}`` on any error (connection,
        auth, redirect-limit, non-JSON body, malformed JSON) — the
        reference's rescue → ``JSON.parse('{}')`` contract."""
        page = self._fetch(url)
        if not _ok(page):
            return {}
        if "json" not in (page.content_type or ""):
            return {}
        try:
            doc = json.loads(page.body.decode("utf-8", errors="replace"))
        except (json.JSONDecodeError, AttributeError):
            return {}
        return doc if isinstance(doc, dict) else {}


API_OUT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("ok", pa.bool_()),
        ("code", pa.int32()),
        ("json", pa.string()),  # canonical (sorted-key) serialization
    ]
)


class ApiFetchResults:
    """Actor-pool stage: the reference's TODO ``fetch_results`` as a batched
    ``map_batches`` callable — net index built once per actor, one output
    row per URL."""

    def __init__(
        self,
        web_ref,
        opts: ApiOptions | None = None,
        user: str = "",
        password: str = "",
    ):
        payload = ray.get(web_ref)
        if isinstance(payload, tuple):
            net = SyntheticNet(payload[0], index=payload[1])
        elif isinstance(payload, pa.Table):
            net = SyntheticNet(payload)
        else:
            net = payload
        self.client = ApiClient(net, opts, user, password)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        ok: list[bool] = []
        code: list[int] = []
        docs: list[str] = []
        for url in urls:
            page = self.client._fetch(url)
            code.append(int(page.code) if page is not None else 0)
            doc = self.client.fetch_result(url) if _ok(page) else {}
            ok.append(_ok(page) and bool(doc))
            docs.append(json.dumps(doc, sort_keys=True))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "ok": pa.array(ok, pa.bool_()),
                "code": pa.array(code, pa.int32()),
                "json": pa.array(docs, pa.string()),
            },
            schema=API_OUT_SCHEMA,
        )


def fetch_results(
    urls: rd.Dataset,
    web: pa.Table,
    opts: ApiOptions | None = None,
    user: str = "",
    password: str = "",
    concurrency: int = 4,
    batch_size: int = 256,
) -> rd.Dataset:
    """Dataset-level JSON API fetch: broadcast the web table once
    (``ray.put``), fan the URL Dataset over an ``ApiFetchResults`` actor
    pool. Output: one (url, ok, code, json) row per input URL."""
    web_ref = ray.put(web)
    return urls.map_batches(
        ApiFetchResults,
        fn_constructor_args=(web_ref, opts, user, password),
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
