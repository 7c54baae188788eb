"""Example pipelines (reference examples/ parity) run end-to-end."""


def test_word_count_example(ray_session):
    from examples.word_count import main

    counters = main("/tmp/ccray_t_wordcount")
    assert counters["pages"] > 100
    assert any(k.startswith("word:") for k in counters)


def test_find_404s_example(ray_session):
    from examples.find_404s import main

    rows = main("/tmp/ccray_t_404s")
    urls = {r["url"] for r in rows}
    assert urls == {
        "http://www.example.com/missing-1",
        "http://www.example.com/missing-2",
    }
    assert all(r["error"] for r in rows)


def test_focus_by_anchor_text_example(ray_session):
    """crossfit_crawl.rb analog: only anchor-text-matched links followed,
    including the off-domain one (outside_domain=True)."""
    from examples.focus_by_anchor_text import main

    urls = main("/tmp/ccray_t_anchor")
    assert "http://www.example.com/cert-l1" in urls
    assert "http://partner.example.org/cert" in urls
    assert not any(u.endswith("/about") for u in urls)


def test_sugary_word_count_example(ray_session):
    from examples.sugary_word_count import main

    counters = main("/tmp/ccray_t_sugary")
    assert counters["crawls"] == 1 and counters["done"] == 1
    assert counters["batches"] >= 1
    assert sum(v for k, v in counters.items() if k.startswith("tok:")) > 100


def test_crawl_by_selector_example(ray_session):
    from examples.crawl_by_selector import main

    anchors = main("/tmp/ccray_t_selector")
    assert anchors and all(k.startswith("anchor:") for k in anchors)


def test_count_listings_example(ray_session):
    """count_listings.rb analog: depth-1 batch crawl, listing links selected
    by the structural predicate and surfaced once each."""
    from examples.count_listings import main

    listings = main("/tmp/ccray_t_listings")
    assert listings and all(k.startswith("listing:") for k in listings)
    assert all("/p2" in k for k in listings)


def test_cli_main_synthetic_and_resume(ray_session, tmp_path):
    """python -m cloud_crawler_ray (bin/start_batch_crawl.rb analog): crawl
    a synthetic web via the CLI surface, then re-run with the same --out —
    the checkpoint markers make the second run a pure resume (same totals,
    nothing re-fetched)."""
    from cloud_crawler_ray.__main__ import main

    out = str(tmp_path / "cli_crawl")
    args = ["--out", out, "--synthetic-pages", "120", "--depth-limit", "3"]
    res = main(args)
    assert res["documents"] > 0 and res["jobs"] > 0
    assert isinstance(res["counters"], dict)  # no hooks registered via CLI
    res2 = main(args)
    assert res2["jobs"] == res["jobs"]
    assert res2["documents"] == res["documents"]


def test_prepare_training_data_example(ray_session):
    from examples.prepare_training_data import main

    res = main("/tmp/ccray_t_prepdata")
    assert res["documents"] > 0
    assert 0 < res["curated"] <= res["documents"]
    assert 0 < res["train"] <= res["curated"]
    assert res["scored"] == res["documents"]
    assert res["captions"] > 0
    assert res["sequences"] > 0


def test_rank_hosts_example(ray_session):
    from examples.rank_hosts import main

    df = main("/tmp/ccray_test_rankhosts")
    assert len(df) >= 2  # multiple hosts ranked
    assert abs(df["total_rank"].sum() - 1.0) < 1e-6  # ranks are a distribution
    assert (df["total_rank"].to_numpy()[:-1] >= df["total_rank"].to_numpy()[1:]).all()


def test_api_harvest_example(ray_session):
    import json
    import zlib

    from examples.api_harvest import main

    out = main(n_docs=60)
    # recompute expected per-tag (n, score) directly from the fixture's
    # deterministic doc generator (synthweb.make_api_web)
    exp: dict[str, tuple[int, int]] = {}
    for i in range(60):
        score = zlib.crc32(f"17:{i}".encode()) % 1000
        for j in range(i % 4):
            tag = f"t{(i + j) % 11}"
            n, s = exp.get(tag, (0, 0))
            exp[tag] = (n + 1, s + score)
    assert out == exp


def test_embedding_curation_example(ray_session):
    from examples.embedding_curation import main

    out = main("/root/testdata/sf0.001")
    assert out["n_vectors"] == 500
    assert 0 < out["n_kept"] <= out["n_vectors"]
    nn = out["neighbors"]
    assert set(nn.columns) == {"query_id", "neighbor_id", "rank"}
    assert (nn.groupby("query_id")["rank"].max() == 5).all()


def test_adaptive_crawl_example(ray_session):
    from examples.adaptive_crawl import main

    out = main("/tmp/ccray_example_adaptive_test")
    assert out["n_fetched"] > 0
    # authority-guided ordering: the first half of the crawl averages at
    # least as high an authority tier as the second half
    assert out["mean_tier_first_half"] >= out["mean_tier_second_half"]


def test_focused_recrawl_example(ray_session):
    from examples.focused_recrawl import main

    out = main("/tmp/ccray_example_focused_test")
    assert out["n_fetched"] > 0
    # seed-personalized ordering: the first half of the crawl averages at
    # least as much seed-relevance as the second half
    assert out["mean_ppr_first_half"] >= out["mean_ppr_second_half"]
    assert len(out["top_pages"]) == 5


def test_freshness_recrawl_example(ray_session):
    from examples.freshness_recrawl import main

    report, revalidated, docs = main()
    statuses = dict((u.rsplit("/", 1)[1], s) for u, s in report)
    assert statuses["news"] == "changed"
    assert statuses["story-new"] == "added"
    assert statuses["about"] == "unchanged"
    assert revalidated >= 4  # home/about/catalog/item1/item2 validate
    # 304 documents filled from the prior crawl
    assert any("item one" in s["text"]
               for s in docs["http://www.example.com/item1"])


def test_certs_crawl_example(ray_session):
    """crossfit_crawl.rb literal analog (Trollop-CLI knobs): depth-2,
    outside-domain-only focused crawl keeping anchor-matched links."""
    from examples.certs_crawl import main

    urls = main([], "/tmp/ccray_t_certs")
    # hub + 4 gym course pages + only the Level-1 cert pages followed
    assert "http://www.hub.example.com/" in urls
    assert all(
        f"http://gym{g}.example.com/courses" in urls for g in range(4)
    )
    assert all(
        f"http://certs.example.com/gym{g}-level1" in urls for g in range(4)
    )
    assert not any("level2" in u for u in urls)
    assert not any(u.endswith("/contact") for u in urls)

    # pattern knob: Level 2 focus flips which cert pages are followed
    urls2 = main(["--pattern", "Level 2", "-n", "certs2"], "/tmp/ccray_t_certs")
    assert all(
        f"http://certs.example.com/gym{g}-level2" in urls2 for g in range(4)
    )
    assert not any("level1" in u for u in urls2)


def test_incremental_refresh_example(ray_session):
    from examples.incremental_refresh import main

    res = main("/tmp/ccray_t_increment")
    assert res["day1_docs"] > 0 and res["day2_docs"] > 0
    assert res["near_dup_matches"] > 0
    # every matched new doc is excluded; matches may share a new id
    assert res["admitted"] < res["day2_docs"]
    assert res["admitted"] >= res["day2_docs"] - res["near_dup_matches"]
    assert res["trim_spans"] > 0


def test_graph_audit_example(ray_session):
    """Post-crawl graph-health report: structural sums present, robustness
    curve monotone in removals, transitivity/reciprocity are percentages."""
    from examples.graph_audit import main

    report = main("/tmp/ccray_t_graphaudit")
    s = report["summary"]
    assert s["m_edges"] > 100
    assert set(s) == {
        "closed_wedges", "m_edges", "recip_edges", "sum_x", "sum_x2",
        "sum_xy", "sum_y", "sum_y2", "wedges",
    }
    rb = report["robustness"]
    assert [r["pct_removed"] for r in rb] == [0, 5, 10, 20, 40]
    assert all(
        rb[i]["n_edges_left"] >= rb[i + 1]["n_edges_left"]
        for i in range(len(rb) - 1)
    )
    assert 0 <= report["reciprocity_pct"] <= 100


def test_tls_crawl_example(ray_session):
    """Round-5 wire story: full crawl over a loopback TLS+gzip origin
    reproduces the serial oracle's crawl order (skips without the
    cryptography wheel, which the self-signed cert needs)."""
    import pytest

    pytest.importorskip("cryptography")
    from examples.tls_crawl import main

    out = main("/tmp/ccray_t_tls_example")
    assert out["order_matches_oracle"] and out["pages"] == 3
