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
