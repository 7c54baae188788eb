"""HttpParty-analog (F8) parity: option surface, same-host gate, basic auth,
cookie round-trip, error→{} contract, and the batched actor-pool stage
(reference lib/cloud-crawler/http_party.rb:26-135)."""

import json

import pyarrow as pa
import pytest
import ray
import ray.data as rd

from cloud_crawler_ray.oracle import SyntheticNet
from cloud_crawler_ray.stages.api_client import (
    REDIRECT_LIMIT,
    ApiClient,
    ApiOptions,
    fetch_results,
)
from cloud_crawler_ray.synthweb import FakePage, make_api_web, web_table


def _net(pages):
    return SyntheticNet(web_table(pages))


def test_option_surface_defaults_and_overrides():
    c = ApiClient(_net([]))
    # nil opts → defaults (http_party.rb:74-121)
    assert c.redirect_limit == REDIRECT_LIMIT == 5
    assert c.user_agent is None
    assert c.accept_cookies is False
    assert c.proxy_host is None and c.proxy_port is None
    assert c.read_timeout is None
    assert c.verbose is False
    o = ApiOptions(
        redirect_limit=2,
        user_agent="ua/1",
        accept_cookies=True,
        proxy_host="p",
        proxy_port=8080,
        read_timeout=1.5,
        verbose=True,
    )
    c = ApiClient(_net([]), o)
    assert (c.redirect_limit, c.user_agent, c.accept_cookies) == (2, "ua/1", True)
    assert (c.proxy_host, c.proxy_port, c.read_timeout, c.verbose) == (
        "p",
        8080,
        1.5,
        True,
    )


def test_allowed_same_host_gate():
    # http_party.rb:131-133: nil host → allowed; else exact host match
    assert ApiClient.allowed("/relative/path", "http://a.com/x")
    assert ApiClient.allowed("http://a.com/y", "http://a.com/x")
    assert not ApiClient.allowed("http://b.com/y", "http://a.com/x")


def test_fetch_result_parses_json_document():
    web, urls = make_api_web(5, seed=3)
    c = ApiClient(SyntheticNet(web))
    doc = c.fetch_result(urls[2])
    assert doc["id"] == 2 and doc["name"] == "item 2"
    assert isinstance(doc["score"], int) and isinstance(doc["tags"], list)


def test_fetch_result_errors_return_empty_dict():
    pages = [
        FakePage(name="html", content_type="text/html", body=b"<html></html>"),
        FakePage(name="bad", content_type="application/json", body=b"{not json"),
        FakePage(
            name="arr", content_type="application/json", body=json.dumps([1]).encode()
        ),
        FakePage(name="dead", content_type="application/json", fail_times=9),
    ]
    c = ApiClient(_net(pages))
    base = "http://www.example.com"
    assert c.fetch_result("http://www.example.com/nosuch") == {}  # connection refused
    assert c.fetch_result(f"{base}/html") == {}  # non-JSON content type
    assert c.fetch_result(f"{base}/bad") == {}  # malformed JSON
    assert c.fetch_result(f"{base}/arr") == {}  # non-object JSON
    assert c.fetch_result(f"{base}/dead") == {}  # retries exhausted


def test_redirect_follow_and_limit():
    doc = json.dumps({"v": 1}).encode()
    pages = [
        FakePage(name="hop0", redirect="hop1"),
        FakePage(name="hop1", redirect="final"),
        FakePage(name="final", content_type="application/json", body=doc),
    ]
    c = ApiClient(_net(pages))
    assert c.fetch_result("http://www.example.com/hop0") == {"v": 1}
    tight = ApiClient(_net(pages), ApiOptions(redirect_limit=1))
    assert tight.fetch_result("http://www.example.com/hop0") == {}


def test_basic_auth_and_is_authenticated():
    doc = json.dumps({"secret": True}).encode()
    pages = [
        FakePage(
            name="private",
            content_type="application/json",
            body=doc,
            auth="bob:pw",
        )
    ]
    url = "http://www.example.com/private"
    anon = ApiClient(_net(pages))
    assert anon.fetch_result(url) == {}  # 401 without creds
    assert anon.authenticate(url) is False and anon.is_authenticated is False
    good = ApiClient(_net(pages), user="bob", password="pw")
    assert good.authenticate(url) is True and good.is_authenticated is True
    assert good.fetch_result(url) == {"secret": True}
    bad = ApiClient(_net(pages), user="bob", password="nope")
    assert bad.authenticate(url) is False
    assert bad.fetch_result(url) == {}


def test_cookie_round_trip():
    doc = json.dumps({"gated": 1}).encode()
    pages = [
        FakePage(
            name="login",
            content_type="application/json",
            body=json.dumps({"ok": 1}).encode(),
            set_cookie="sid=abc123",
        ),
        FakePage(
            name="gated",
            content_type="application/json",
            body=doc,
            require_cookie="sid=abc123",
        ),
    ]
    c = ApiClient(_net(pages), ApiOptions(accept_cookies=True))
    gated_url = "http://www.example.com/gated"
    before = c.fetch_result(gated_url)
    assert before != {"gated": 1}  # no cookie yet
    assert c.fetch_result("http://www.example.com/login") == {"ok": 1}
    assert c.cookie_store.cookie_header("www.example.com") == "sid=abc123"
    assert c.fetch_result(gated_url) == {"gated": 1}
    # accept_cookies=False never stores (http_party.rb:93-95)
    no = ApiClient(_net(pages))
    no.fetch_result("http://www.example.com/login")
    assert no.cookie_store.cookie_header("www.example.com") == ""


def test_fetch_results_actor_stage(ray_session):
    web, urls = make_api_web(40, seed=9)
    ds = rd.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    out = fetch_results(ds, web, concurrency=2, batch_size=16).to_pandas()
    assert len(out) == 40
    assert out["ok"].all() and (out["code"] == 200).all()
    got = {row["url"]: json.loads(row["json"]) for _, row in out.iterrows()}
    local = ApiClient(SyntheticNet(web))
    for u in urls:
        assert got[u] == local.fetch_result(u)
