"""rel=canonical alias handling: extraction → pages column → alias_edges →
collapse_alias_docs (duplicate-URL collapse by the site's own declaration).
Target-side addition; the reference has no canonical-link support."""

from cloud_crawler_ray.oracle import crawl_oracle
from cloud_crawler_ray.ops.dedup import collapse_alias_docs
from cloud_crawler_ray.pipelines.crawl import crawl
from cloud_crawler_ray.spec import CrawlSpec
from cloud_crawler_ray.synthweb import FakePage, page_url, web_table

from tests.test_crawl_engine import assert_parity


def alias_web():
    """main article + two alias URLs declaring it canonical (print view,
    tracking-param variant), plus an independent page and a self-declaring
    page (self-declarations are dropped from the edge set)."""
    pages = [
        FakePage(name="home", links=["article", "article-print", "article-amp", "other", "selfie"]),
        FakePage(name="article", texts=["the one true article"]),
        FakePage(name="article-print", texts=["the one true article"], canonical="article"),
        FakePage(name="article-amp", texts=["the one true article amp"], canonical="article"),
        FakePage(name="other", texts=["unrelated content"]),
        FakePage(name="selfie", texts=["points at itself"], canonical="selfie"),
    ]
    return web_table(pages), [page_url("home")]


def test_alias_parity_and_edges(ray_session, tmp_path):
    web, seeds = alias_web()
    spec = CrawlSpec(delay=0.05)
    res = crawl_oracle(web, seeds, spec)
    handle = crawl(web, seeds, spec, str(tmp_path / "out"))
    assert_parity(res, handle)  # canonical_decl pinned per page vs oracle
    edges = {(r["src"], r["dst"]) for r in handle.alias_edges().take_all()}
    assert edges == {
        (page_url("article-print"), page_url("article")),
        (page_url("article-amp"), page_url("article")),
    }  # self-declaration dropped, undeclared pages absent


def test_collapse_alias_docs(ray_session, tmp_path):
    web, seeds = alias_web()
    handle = crawl(web, seeds, CrawlSpec(delay=0.05), str(tmp_path / "out"))
    docs = handle.documents()
    collapsed = collapse_alias_docs(docs, handle.alias_edges())
    rows = {r["doc_id"]: r["spans"] for r in collapsed.take_all()}
    # the two aliases fold into the article; everything else survives as-is
    assert set(rows) == {
        page_url(n) for n in ("home", "article", "other", "selfie")
    }
    # the canonical page's OWN row wins over its aliases' content
    texts = [s["text"] for s in rows[page_url("article")] if s["kind"] == "text"]
    assert "the one true article" in texts and not any("amp" in t for t in texts)

    # python reference on the same inputs
    orig = {r["doc_id"]: r["spans"] for r in docs.take_all()}
    edges = {r["src"]: r["dst"] for r in handle.alias_edges().take_all()}
    by_final: dict[str, list[tuple]] = {}
    for did, spans in orig.items():
        fid = edges.get(did, did)
        by_final.setdefault(fid, []).append((did != fid, did, spans))
    expect = {fid: sorted(v)[0][2] for fid, v in by_final.items()}
    assert rows == expect


def test_collapse_alias_docs_dangling_target(ray_session, tmp_path):
    # an alias whose declared canonical was never crawled: the alias doc
    # survives under the TARGET id (the declaration is still the site's
    # preferred URL for that content)
    pages = [
        FakePage(name="home", links=["ghost-alias"]),
        FakePage(name="ghost-alias", texts=["content"], canonical="ghost"),
    ]
    web = web_table(pages)
    handle = crawl(web, [page_url("home")], CrawlSpec(delay=0.05), str(tmp_path / "out"))
    collapsed = {
        r["doc_id"] for r in collapse_alias_docs(
            handle.documents(), handle.alias_edges()
        ).take_all()
    }
    assert page_url("ghost") in collapsed
    assert page_url("ghost-alias") not in collapsed
