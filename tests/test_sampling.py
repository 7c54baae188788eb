"""Sampling/split operators: determinism, proportions, and the
consistency-under-growth property that motivates hash-based sampling."""

from __future__ import annotations

import numpy as np
import pandas as pd


def test_train_test_split_deterministic_and_proportional(ray_session):
    import ray.data as rd

    from cloud_crawler_ray.ops.sampling import train_test_split

    ds = rd.from_pandas(pd.DataFrame({"doc_id": np.arange(20_000, dtype=np.int64)}))
    a = train_test_split(ds, train_pct=90).to_pandas().sort_values("doc_id")
    b = train_test_split(ds.repartition(7), train_pct=90).to_pandas().sort_values(
        "doc_id"
    )
    # identical assignment regardless of partitioning
    assert a["split"].tolist() == b["split"].tolist()
    frac = (a["split"] == "train").mean()
    assert 0.88 < frac < 0.92


def test_mix_weighted_rates_nested_and_deterministic(ray_session):
    import ray.data as rd

    from cloud_crawler_ray.ops.sampling import mix_weighted

    n = 30_000
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "lang": np.where(np.arange(n) % 2 == 0, "en", "zh"),
        }
    )
    ds = rd.from_pandas(df)
    out = mix_weighted(ds, rates={"en": 0.5, "zh": 0.25}, default=0.0).to_pandas()
    # independent recomputation of the membership rule
    h = (df["doc_id"].to_numpy().astype(np.uint64) * np.uint64(2654435761)) % np.uint64(
        2**32
    )
    thr = np.where(df["lang"] == "en", int(0.5 * 2**32), int(0.25 * 2**32)).astype(
        np.uint64
    )
    exp = df.loc[h < thr, "doc_id"].tolist()
    assert sorted(out["doc_id"].tolist()) == exp
    # realized rates near nominal
    en_rate = (out["lang"] == "en").sum() / (n / 2)
    zh_rate = (out["lang"] == "zh").sum() / (n / 2)
    assert 0.47 < en_rate < 0.53 and 0.22 < zh_rate < 0.28
    # nested samples: a row kept at rate .25 is kept at rate .5
    half = mix_weighted(ds, rates={"en": 0.25, "zh": 0.125}, default=0.0).to_pandas()
    assert set(half["doc_id"]) <= set(out["doc_id"])
    # unknown group takes the default rate (0.0 -> dropped entirely)
    other = rd.from_pandas(pd.DataFrame({"doc_id": [1, 2, 3], "lang": ["xx"] * 3}))
    assert mix_weighted(other, rates={"en": 0.5}, default=0.0).count() == 0


def test_consistent_sample_stable_under_growth(ray_session):
    import ray.data as rd

    from cloud_crawler_ray.ops.sampling import consistent_sample

    small = rd.from_pandas(pd.DataFrame({"doc_id": np.arange(5_000, dtype=np.int64)}))
    big = rd.from_pandas(pd.DataFrame({"doc_id": np.arange(8_000, dtype=np.int64)}))
    s_small = set(consistent_sample(small, k=64)["doc_id"])
    s_big = set(consistent_sample(big, k=64)["doc_id"])
    # hash-min sampling: every member of the bigger sample that existed in
    # the smaller key set must also be in the smaller sample (new keys can
    # displace members, never reshuffle survivors)
    assert {d for d in s_big if d < 5_000} <= s_small
    assert len(s_small) == 64 and len(s_big) == 64


def test_weighted_sample_exact_vs_numpy(ray_session):
    """A-ES weighted sample: exact membership equals the numpy oracle with
    the same hash-derived priorities, under any partitioning; zero-weight
    rows never win; heavier keys win more often across disjoint key sets."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cloud_crawler_ray.ops.sampling import weighted_sample

    n = 5000
    ids = np.arange(n, dtype=np.int64)
    w = np.where(ids % 10 == 0, 50.0, 1.0)  # every 10th row is 50x heavier
    w[7] = 0.0
    tbl = pa.table({"doc_id": pa.array(ids), "wt": pa.array(w)})

    KNUTH, M32 = 2654435761, 2**32
    h = (ids.astype(np.uint64) * np.uint64(KNUTH)) % np.uint64(M32)
    u = (h.astype(np.float64) + 1.0) / (float(M32) + 1.0)
    pri = np.where(w > 0, -np.log(u) / np.maximum(w, 1e-300), np.inf)
    expect = set(ids[np.lexsort((ids, pri))[:200]])

    for parts in (1, 9):
        got = weighted_sample(
            rd.from_arrow(tbl).repartition(parts), key="doc_id", weight_col="wt", k=200
        )
        assert set(got["doc_id"]) == expect
    assert 7 not in expect
    heavy = sum(1 for i in expect if i % 10 == 0)
    assert heavy > 120  # 10% of rows carry 50x weight -> dominate the sample


def test_group_quota_exact_and_partition_invariant(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from cloud_crawler_ray.ops.sampling import group_quota

    rng = np.random.default_rng(7)
    n = 600
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "source": [f"s{int(i)}" for i in rng.integers(0, 7, n)],
            # heavy ties so the doc_id tie-break is actually exercised
            "n_chars": rng.integers(0, 5, n).astype(np.int64),
        }
    )
    exp = (
        df.sort_values(
            ["source", "n_chars", "doc_id"], ascending=[True, False, True],
            kind="stable",
        )
        .groupby("source", sort=False)
        .head(10)
        .reset_index(drop=True)
    )
    for repart in (1, 5, 40):
        ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
        if repart > 1:
            ds = ds.repartition(repart)
        got = (
            group_quota(ds, group="source", value_col="n_chars", k=10)
            .to_pandas()
            .sort_values(
                ["source", "n_chars", "doc_id"], ascending=[True, False, True],
                kind="stable",
            )
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["doc_id", "source", "n_chars"]],
            exp[["doc_id", "source", "n_chars"]],
        )


def test_group_quota_small_groups_survive_whole(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from cloud_crawler_ray.ops.sampling import group_quota

    df = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "source": ["a", "a", "b", "b", "b", "c"],
            "n_chars": np.array([5, 1, 9, 9, 2, 4], dtype=np.int64),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(3)
    got = group_quota(ds, group="source", value_col="n_chars", k=2).to_pandas()
    # groups at-or-under quota keep every row; over-quota keeps best-2
    assert sorted(got[got["source"] == "a"]["doc_id"]) == [0, 1]
    assert sorted(got[got["source"] == "b"]["doc_id"]) == [2, 3]  # ties → low id
    assert sorted(got[got["source"] == "c"]["doc_id"]) == [5]
