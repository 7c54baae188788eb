"""In-process loopback HTTP server serving a WEB_SCHEMA table — the real-
socket twin of ``SyntheticNet``. Gives the fetch stage an actual origin to
speak to (ThreadingHTTPServer on 127.0.0.1, ephemeral port) with the same
semantics the synthetic lookup models: redirects, basic auth (401 without
credentials), Set-Cookie / cookie-gated bodies, transient failures (the
first ``fail_times`` requests per URL abort before any response — the
Timeout/BadResponse/EOF analog), ETag + If-None-Match → 304, robots.txt."""

from __future__ import annotations

import base64
import socket
import threading
import time
from contextlib import contextmanager
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from cloud_crawler_ray.oracle import etag_of
from cloud_crawler_ray.stages.cookies import LOGIN_STUB_BODY, header_has_pair


class _SiteHandler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    def log_message(self, *args):  # quiet
        pass

    def _respond(self, status: int, body: bytes, ctype: str, extra: dict) -> None:
        self.send_response(status)
        if ctype:
            self.send_header("Content-Type", ctype)
        for k, v in extra.items():
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 (http.server API)
        srv = self.server
        url = f"http://{srv.netloc}{self.path}"
        row = srv.rows.get(url)
        with srv.lock:
            srv.request_log.append((time.monotonic(), self.path, dict(self.headers)))
            fails = srv.fail_left.get(url, 0)
            if fails > 0:
                srv.fail_left[url] = fails - 1
                aborted = True
            else:
                aborted = False
        if aborted:
            # transient failure: abort before any status line — the client
            # sees RemoteDisconnected/BadStatusLine and retries
            self.close_connection = True
            try:
                self.connection.shutdown(socket.SHUT_RDWR)
            except OSError:
                pass
            return
        if row is None:
            self._respond(404, b"not found", "text/plain", {})
            return
        if row["auth"]:
            expect = "Basic " + base64.b64encode(row["auth"].encode("utf-8")).decode("ascii")
            if self.headers.get("Authorization") != expect:
                self._respond(401, b"", "text/html", {})
                return
        body = row["body"]
        if row["require_cookie"] and not header_has_pair(
            self.headers.get("Cookie", ""), row["require_cookie"]
        ):
            body = LOGIN_STUB_BODY
        extra: dict[str, str] = {}
        if row["set_cookie"]:
            extra["Set-Cookie"] = row["set_cookie"]
        status = int(row["status"])
        if 300 <= status < 400 and row["redirect_to"]:
            extra["Location"] = row["redirect_to"]
        if status == 200:
            etag = etag_of(body, row["content_type"])
            extra["ETag"] = etag
            if self.headers.get("If-None-Match") == etag:
                self._respond(304, b"", row["content_type"], extra)
                return
        self._respond(status, body, row["content_type"], extra)


class SiteServer(ThreadingHTTPServer):
    daemon_threads = True

    def __init__(self):
        super().__init__(("127.0.0.1", 0), _SiteHandler)
        self.netloc = f"127.0.0.1:{self.server_address[1]}"
        self.rows: dict[str, dict] = {}
        self.fail_left: dict[str, int] = {}
        self.request_log: list[tuple[float, str, dict]] = []
        self.lock = threading.Lock()

    def handle_error(self, request, client_address):
        pass  # aborted-connection noise from the transient-failure model

    def load(self, web) -> None:
        """Serve a WEB_SCHEMA pyarrow table (tests build it with the same
        FakePage/web_table helpers the synthetic oracle web uses)."""
        for row in web.to_pylist():
            self.rows[row["url"]] = row
            if row.get("fail_times"):
                self.fail_left[row["url"]] = int(row["fail_times"])

    def page_paths(self) -> list[tuple[float, str]]:
        with self.lock:
            return [(t, p) for t, p, _ in self.request_log if p != "/robots.txt"]


@contextmanager
def serve_site():
    """Yield a started SiteServer; the caller builds pages with
    ``host=server.netloc`` and ``server.load(web_table(pages, ...))``."""
    srv = SiteServer()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield srv
    finally:
        srv.shutdown()
        srv.server_close()
