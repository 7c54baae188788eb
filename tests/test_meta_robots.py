"""Meta-robots compliance (spec.obey_meta_robots): noindex suppresses the
document (page still fetched + seen-marked), meta nofollow suppresses all
link following, rel="nofollow" anchors are excluded individually. Default
OFF (directives recorded, nothing suppressed). Target-side addition."""

from cloud_crawler_ray.extract import extract_page
from cloud_crawler_ray.oracle import crawl_oracle, prior_from_result
from cloud_crawler_ray.pipelines.crawl import crawl
from cloud_crawler_ray.spec import CrawlSpec
from cloud_crawler_ray.synthweb import FakePage, page_url, web_table

from tests.test_crawl_engine import assert_parity, run_both

NOINDEX_BODY = (
    b'<html><head><meta name="robots" content="noindex"></head>'
    b'<body><p>secret-ish</p><a href="/via-noindex">x</a></body></html>'
)
NOFOLLOW_BODY = (
    b'<html><head><meta name="robots" content="nofollow"></head>'
    b'<body><a href="/never">x</a></body></html>'
)
RELNOFOLLOW_BODY = (
    b'<html><body><a href="/followed">a</a>'
    b'<a href="/sponsored" rel="nofollow">b</a>'
    b'<a href="/ugc" rel="ugc nofollow">c</a></body></html>'
)


def robots_web():
    pages = [
        FakePage(name="home", links=["quiet", "gate", "links"]),
        FakePage(name="quiet", body=NOINDEX_BODY),
        FakePage(name="via-noindex"),
        FakePage(name="gate", body=NOFOLLOW_BODY),
        FakePage(name="never"),
        FakePage(name="links", body=RELNOFOLLOW_BODY),
        FakePage(name="followed"),
        FakePage(name="sponsored"),
        FakePage(name="ugc"),
    ]
    return web_table(pages), [page_url("home")]


def test_extraction_directives():
    ex = extract_page("http://h/x", NOINDEX_BODY, "text/html")
    assert ex.noindex and not ex.nofollow_all
    ex = extract_page("http://h/x", NOFOLLOW_BODY, "text/html")
    assert ex.nofollow_all and not ex.noindex
    ex = extract_page(
        "http://h/x",
        b'<meta name="robots" content="none">',
        "text/html",
    )
    assert ex.noindex and ex.nofollow_all
    ex = extract_page("http://h/x", RELNOFOLLOW_BODY, "text/html")
    assert ex.nofollow == {"http://h/sponsored", "http://h/ugc"}
    assert len(ex.links) == 3  # extraction keeps them; FOLLOWING filters


def test_meta_robots_parity_and_semantics(ray_session, tmp_path):
    web, seeds = robots_web()
    spec = CrawlSpec(delay=0.05, obey_meta_robots=True)
    res, handle = run_both(web, seeds, spec, tmp_path)
    assert_parity(res, handle)
    fetched = {r["url"].rsplit("/", 1)[1] for r in handle.pages().take_all() if r["fetched"]}
    assert "quiet" in fetched and "followed" in fetched
    # meta nofollow / rel=nofollow targets never crawled
    assert "never" not in fetched
    assert "sponsored" not in fetched and "ugc" not in fetched
    # noindex page's links ARE followed
    assert "via-noindex" in fetched
    docs = {d["doc_id"].rsplit("/", 1)[1] for d in handle.documents().take_all()}
    assert "quiet" not in docs           # fetched, never indexed
    assert "via-noindex" in docs
    flags = {r["url"].rsplit("/", 1)[1]: r["noindex"] for r in handle.pages().take_all()}
    assert flags["quiet"] and not flags["home"]


def test_meta_robots_off_by_default(ray_session, tmp_path):
    web, seeds = robots_web()
    res, handle = run_both(web, seeds, CrawlSpec(delay=0.05), tmp_path)
    assert_parity(res, handle)
    fetched = {r["url"].rsplit("/", 1)[1] for r in handle.pages().take_all() if r["fetched"]}
    assert {"never", "sponsored", "ugc"} <= fetched  # directives ignored
    docs = {d["doc_id"].rsplit("/", 1)[1] for d in handle.documents().take_all()}
    assert "quiet" in docs


def test_meta_robots_distributed_planner(ray_session, tmp_path):
    web, seeds = robots_web()
    spec = CrawlSpec(delay=0.05, obey_meta_robots=True)
    res = crawl_oracle(web, seeds, spec)
    handle = crawl(web, seeds, spec, str(tmp_path / "out"), small_wave_threshold=0)
    assert_parity(res, handle)


def test_noindex_survives_recrawl_304(ray_session, tmp_path):
    # a noindex page validates to 304 on recrawl: still fetched, still no
    # document — on the engine (semi-join finds no prior doc) AND the
    # oracle (prior spans None)
    web, seeds = robots_web()
    spec = CrawlSpec(delay=0.05, obey_meta_robots=True)
    res1 = crawl_oracle(web, seeds, spec)
    res2 = crawl_oracle(web, seeds, spec, prior=prior_from_result(res1))
    out1, out2 = str(tmp_path / "one"), str(tmp_path / "two")
    crawl(web, seeds, spec, out1)
    h2 = crawl(web, seeds, spec, out2, prior_dir=out1)
    assert_parity(res2, h2)
    codes = {r["url"].rsplit("/", 1)[1]: r["code"] for r in h2.pages().take_all()}
    assert codes["quiet"] == 304
    docs = {d["doc_id"].rsplit("/", 1)[1] for d in h2.documents().take_all()}
    assert "quiet" not in docs and "via-noindex" in docs
