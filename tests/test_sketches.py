"""HyperLogLog sketch: error bound vs exact, mergeability, determinism,
and the distributed pipeline against the exact sharded distinct count."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def test_hll_error_bound_and_determinism():
    from cloud_crawler_ray.ops.sketches import hll_estimate, hll_partial

    # 200k distinct values, p=12 → stderr ≈ 1.04/sqrt(4096) ≈ 1.6%;
    # assert within 5% (≈3 sigma)
    vals = np.array([f"tok-{i}" for i in range(200_000)], dtype=object)
    reg = hll_partial(vals, p=12)
    est = hll_estimate(reg)
    assert abs(est - 200_000) / 200_000 < 0.05
    # deterministic: same input → identical registers (fixed-key hash)
    assert np.array_equal(reg, hll_partial(vals.copy(), p=12))


def test_hll_small_range_linear_counting():
    from cloud_crawler_ray.ops.sketches import hll_estimate, hll_partial

    vals = np.array([f"w{i}" for i in range(50)], dtype=object)
    est = hll_estimate(hll_partial(vals, p=12))
    # linear-counting regime is near-exact at tiny cardinalities
    assert abs(est - 50) < 2


def test_hll_merge_equals_union():
    from cloud_crawler_ray.ops.sketches import hll_merge, hll_partial

    a = np.array([f"a{i}" for i in range(10_000)], dtype=object)
    b = np.array([f"b{i}" for i in range(10_000)], dtype=object)
    merged = hll_merge(
        np.stack([hll_partial(a, p=12), hll_partial(b, p=12)])
    )
    union = hll_partial(np.concatenate([a, b]), p=12)
    assert np.array_equal(merged, union)


def test_hll_distinct_tokens_vs_exact(ray_session):
    import ray.data as rd

    from cloud_crawler_ray.ops.sketches import hll_distinct_tokens
    from cloud_crawler_ray.ops.textstats import vocab_size

    # 4000 docs × 30 mostly-unique tokens → a vocabulary in the HLL regime
    rng = np.random.default_rng(7)
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(4000, dtype=np.int64),
            "text": [
                " ".join(f"w{rng.integers(0, 60_000)}" for _ in range(30))
                for _ in range(4000)
            ],
        }
    )
    ds = rd.from_pandas(docs).repartition(8)
    exact = int(vocab_size(ds)["n_distinct_tokens"].iloc[0])
    est = float(hll_distinct_tokens(ds, p=12)["estimate"].iloc[0])
    assert abs(est - exact) / exact < 0.05


def test_token_ops_empty_corpus(ray_session):
    """Empty input must yield empty/zero results, not crash (the
    to_pandas() of an empty grouped Dataset loses even the columns)."""
    import pyarrow as pa
    import ray.data as rd

    from cloud_crawler_ray.ops.sampling import consistent_sample
    from cloud_crawler_ray.ops.sketches import hll_distinct_tokens
    from cloud_crawler_ray.ops.textstats import (
        token_count_quantiles,
        vocab_size,
        vocab_topk,
    )

    empty = rd.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    assert float(hll_distinct_tokens(empty)["estimate"].iloc[0]) == 0.0
    assert int(vocab_size(empty)["n_distinct_tokens"].iloc[0]) == 0
    assert len(vocab_topk(empty)) == 0
    assert len(token_count_quantiles(empty)) == 0
    assert len(consistent_sample(empty, k=10)) == 0


def test_cms_overestimates_and_bounds(ray_session):
    import ray.data as rd

    from cloud_crawler_ray.ops.sketches import cms_query, cms_token_counts

    # corpus with known exact counts: token_i appears i*10 times
    rows = []
    for i in range(1, 21):
        for r in range(i * 10):
            rows.append({"doc_id": i * 1000 + r, "text": f"tok{i}"})
    ds = rd.from_items(rows).repartition(5)
    grid = cms_token_counts(ds, d=4, w=2048)
    toks = np.array([f"tok{i}" for i in range(1, 21)], dtype=object)
    est = cms_query(grid, toks)
    exact = np.array([i * 10 for i in range(1, 21)])
    n_total = exact.sum()
    assert (est >= exact).all()  # CMS never under-counts
    # ε = e/w bound at 1-(1/e)^d confidence; generous at this size
    assert (est - exact <= max(1, int(np.e / 2048 * n_total)) * 4).all()
    assert grid.sum() == n_total * 4  # every token lands once per row


def test_cms_merge_equals_whole(ray_session):
    import ray.data as rd

    from cloud_crawler_ray.ops.sketches import cms_partial, cms_token_counts

    rows_a = [{"doc_id": i, "text": "alpha beta"} for i in range(30)]
    rows_b = [{"doc_id": 100 + i, "text": "beta gamma"} for i in range(40)]
    g_a = cms_token_counts(rd.from_items(rows_a), d=4, w=256)
    g_b = cms_token_counts(rd.from_items(rows_b), d=4, w=256)
    g_all = cms_token_counts(rd.from_items(rows_a + rows_b), d=4, w=256)
    assert (g_a + g_b == g_all).all()  # grids merge by elementwise add


def test_quantile_sketch_accuracy_and_invariance(ray_session):
    import ray.data as rd

    from cloud_crawler_ray.ops.sketches import quantile_sketch

    # 50k rows, skewed values (quadratic) — exact quantiles known
    n = 50_000
    vals = (np.arange(n, dtype=np.float64) ** 2) / n
    rows = [{"event_id": i, "value": float(vals[i])} for i in range(n)]
    for repart in (4, 17):
        ds = rd.from_items(rows).repartition(repart)
        out = quantile_sketch(ds, "event_id", "value", m=4096, qs=(0.1, 0.5, 0.9))
        assert int(out["n"].iloc[0]) == n
        for q, est in zip(out["q"], out["value_est"]):
            # rank error ~ O(1/sqrt(m)); allow 3/sqrt(m) of rank drift
            exact_rank = q * n
            est_rank = np.searchsorted(np.sort(vals), est)
            assert abs(est_rank - exact_rank) <= 3 / np.sqrt(4096) * n, (q, est)


def test_quantile_sketch_merge_is_exact_bottom_k(ray_session):
    from cloud_crawler_ray.ops.sketches import (
        quantile_sketch_merge,
        quantile_sketch_partial,
    )

    ids = np.arange(10_000)
    vals = np.linspace(0, 1, 10_000)
    whole = quantile_sketch_partial(ids, vals, 512)
    a = quantile_sketch_partial(ids[:6000], vals[:6000], 512)
    b = quantile_sketch_partial(ids[6000:], vals[6000:], 512)
    merged, total = quantile_sketch_merge(pd.concat([a, b]), 512)
    assert total == 10_000
    # bottom-k mergeability: merged sample == whole-input sample
    assert merged["h"].tolist() == whole["h"].tolist()[:512]
    assert merged["v"].tolist() == whole["v"].tolist()[:512]


def test_hll_distinct_by_vs_exact(ray_session):
    """Grouped HLL: per-key estimates within the 2^p error band of the exact
    per-key distinct counts, one output row per key, invariant to input
    partitioning (mergeable registers)."""
    import ray.data as rd

    from cloud_crawler_ray.ops.sketches import hll_distinct_by

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 5, size=20_000)
    vals = rng.integers(0, 3_000, size=20_000) + keys * 10_000
    t = pa.table(
        {
            "k": pa.array(keys, pa.int64()),
            "v": pa.array(vals, pa.int64()),
        }
    )
    exact = (
        pd.DataFrame({"k": keys, "v": vals})
        .groupby("k")["v"].nunique()
    )
    for nparts in (2, 17):
        est = (
            hll_distinct_by(rd.from_arrow(t).repartition(nparts), "k", "v", p=12)
            .sort_values("k")
            .set_index("k")["approx_distinct"]
        )
        assert set(est.index) == set(exact.index)
        rel = (est - exact).abs() / exact
        assert (rel < 0.10).all(), rel


def test_kmv_exact_below_k(ray_session):
    # both sides under k distinct → the sketch IS the set: exact answers
    import os

    import ray.data as rd

    from cloud_crawler_ray.ops.sketches import kmv_intersection

    sf = "/root/testdata/sf0.01"
    ev = rd.read_parquet(os.path.join(sf, "events.parquet"), columns=["event_type", "user_id"])
    est = kmv_intersection(ev, "event_type", "user_id", "view", "purchase", k=1024)
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
    a, b, i = con.execute(
        """SELECT (SELECT count(DISTINCT user_id) FROM events WHERE event_type='view'),
                  (SELECT count(DISTINCT user_id) FROM events WHERE event_type='purchase'),
                  (SELECT count(*) FROM (SELECT user_id FROM events WHERE event_type='view'
                   INTERSECT SELECT user_id FROM events WHERE event_type='purchase'))"""
    ).fetchone()
    assert est["a"] == a and est["b"] == b and est["intersection"] == i


def test_kmv_error_band_and_partition_invariance(ray_session):
    # approximate regime: 30k/24k ids with 18k planted overlap, k=1024 →
    # relative error well under 10% on every estimate; results identical
    # across block layouts (mergeable partials)
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cloud_crawler_ray.ops.sketches import kmv_intersection

    rng = np.random.default_rng(7)
    a_ids = np.arange(0, 30_000)
    b_ids = np.arange(12_000, 36_000)  # overlap = 18k, union = 36k
    df = pd.DataFrame(
        {
            "event_type": ["view"] * len(a_ids) + ["purchase"] * len(b_ids),
            "user_id": np.concatenate([a_ids, b_ids]),
        }
    ).sample(frac=1.0, random_state=3).reset_index(drop=True)
    outs = []
    for nblocks in (1, 7):
        ds = rd.from_pandas(df).repartition(nblocks)
        outs.append(kmv_intersection(ds, "event_type", "user_id", "view", "purchase", k=1024))
    assert outs[0] == outs[1]  # partial merge is layout-invariant
    est = outs[0]
    for got, exact in ((est["a"], 30_000), (est["b"], 24_000),
                       (est["union"], 36_000), (est["intersection"], 18_000)):
        assert abs(got - exact) / exact < 0.10, (got, exact)


def test_mg_reduce_bound_and_size():
    from cloud_crawler_ray.ops.sketches import mg_reduce

    rng = np.random.default_rng(7)
    toks = np.array([f"t{i}" for i in range(200)], dtype=object)
    counts = rng.integers(1, 50, 200).astype(np.int64)
    m = 16
    kt, kc = mg_reduce(toks, counts, m)
    assert len(kt) <= m
    # every kept lower bound underestimates by exactly the pivot; total
    # decrement respects the MG bound N/(m+1) per reduction
    orig = dict(zip(toks, counts))
    dec = [orig[t] - c for t, c in zip(kt, kc)]
    assert all(d >= 0 for d in dec)
    assert (counts.sum() - kc.sum()) <= counts.sum()  # sanity
    # any token with count > N/(m+1) must survive a single reduction
    n = counts.sum()
    for t, c in zip(toks, counts):
        if c > n / (m + 1):
            assert t in set(kt)


def test_mg_heavy_hitters_exact_and_partition_invariant(ray_session):
    import ray.data as rd

    from cloud_crawler_ray.ops.sketches import mg_heavy_hitters

    # skewed corpus: a few hot tokens + a long tail
    rng = np.random.default_rng(3)
    rows = []
    for i in range(300):
        hot = ["alpha"] * int(rng.integers(0, 6)) + ["beta"] * int(rng.integers(0, 4))
        tail = [f"w{rng.integers(0, 2000)}" for _ in range(20)]
        rows.append(" ".join(hot + tail))
    docs = pd.DataFrame({"text": rows})
    toks = docs["text"].str.lower().str.split(r"\s+", regex=True).explode()
    toks = toks[toks != ""]
    vc = toks.value_counts()
    n = int(vc.sum())
    m = 32
    expected = vc[vc * m > n].sort_index()

    for parts in (2, 11):
        ds = rd.from_pandas(docs).repartition(parts).materialize()
        out = mg_heavy_hitters(ds, m=m)
        got = pd.Series(
            out["cnt"].to_numpy(), index=out["token"].to_numpy()
        ).sort_index()
        assert (got.index == expected.index).all()
        assert (got.to_numpy() == expected.to_numpy()).all()


def test_mg_heavy_hitters_empty_and_uniform(ray_session):
    import ray.data as rd

    from cloud_crawler_ray.ops.sketches import mg_heavy_hitters

    empty = rd.from_pandas(pd.DataFrame({"text": pd.Series([], dtype=str)})).materialize()
    assert len(mg_heavy_hitters(empty, m=8)) == 0
    # perfectly uniform corpus: nothing exceeds N/m for m < distinct
    uni = rd.from_pandas(
        pd.DataFrame({"text": [f"u{i}" for i in range(100)]})
    ).materialize()
    assert len(mg_heavy_hitters(uni, m=8)) == 0


def test_ams_f2_error_band_and_merge_law():
    """AMS grids merge by ADD (concat stream == summed grids, exactly) and
    the estimate lands within a loose relative band of true F2 on a zipfish
    stream (variance 2·F2²/w per row, w=2048, median of 4 rows)."""
    import numpy as np

    from cloud_crawler_ray.ops.sketches import ams_estimate, ams_partial

    rng = np.random.default_rng(47)
    a = rng.zipf(1.5, 20_000) % 5_000
    b = rng.zipf(1.5, 30_000) % 5_000
    whole = ams_partial(np.concatenate([a, b]))
    merged = ams_partial(a) + ams_partial(b)
    assert np.array_equal(whole, merged)
    _, counts = np.unique(np.concatenate([a, b]), return_counts=True)
    f2 = int((counts.astype(np.int64) ** 2).sum())
    est = ams_estimate(merged)
    assert abs(est - f2) <= 0.2 * f2, (est, f2)


def test_ams_f2_deterministic():
    import numpy as np

    from cloud_crawler_ray.ops.sketches import ams_estimate, ams_partial

    vals = np.arange(1000) % 37
    g1, g2 = ams_partial(vals), ams_partial(vals.copy())
    assert np.array_equal(g1, g2)
    assert ams_estimate(g1) == ams_estimate(g2)


def test_eh_error_band_and_determinism():
    """DGIM exponential histogram: estimate within 1/k relative error of
    the true windowed count on random streams, deterministic rebuilds."""
    import numpy as np

    from cloud_crawler_ray.ops.sketches import eh_build, eh_query

    rng = np.random.default_rng(101)
    for trial in range(6):
        n = int(rng.integers(200, 3000))
        ts = np.sort(rng.integers(0, 100_000, n))
        k = 4
        cutoff = int(rng.integers(0, 100_000))
        b1 = eh_build(ts, k=k)
        b2 = eh_build(ts.copy(), k=k)
        assert b1 == b2
        est = eh_query(b1, cutoff)
        true = int((ts >= cutoff).sum())
        assert abs(est - true) <= max(1, true / k), (trial, est, true)
