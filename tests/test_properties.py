"""Property-based tests (hypothesis): the distributed ops against
pure-python/pandas references on randomly generated inputs. These
complement the DuckDB-oracle parity tests — the oracle fixes ONE dataset
per scale factor; these search the input space (duplicate keys, ties,
empty groups, single-row streams, boundary timestamps)."""

from __future__ import annotations

import collections

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import ray.data as rd

SLOW = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# event streams: few users, timestamps inside a few hours, duplicate
# timestamps allowed (tie-handling is the interesting part)
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),       # user/type id
        st.integers(min_value=0, max_value=12_000),  # seconds offset
        st.integers(min_value=-500, max_value=500),  # value (scaled cents)
    ),
    min_size=0,
    max_size=60,
)


def _events_ds(rows):
    base = 1_600_000_000_000_000  # epoch µs
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
            "event_type": pa.array([f"t{u}" for u, _, _ in rows], pa.string()),
            "ts": pa.array(
                [base + s * 1_000_000 for _, s, _ in rows], pa.timestamp("us")
            ),
            "value": pa.array([c / 100.0 for _, _, c in rows], pa.float64()),
        }
    )
    ds = rd.from_arrow(tbl)
    return ds.repartition(3) if len(rows) > 3 else ds


@settings(**SLOW)
@given(events_strategy)
def test_tumbling_counts_matches_reference(ray_session, rows):
    from cloud_crawler_ray.ops.windows import tumbling_counts

    got = tumbling_counts(_events_ds(rows), window_s=600)
    ref = collections.Counter()
    base_s = 1_600_000_000
    for u, s, _ in rows:
        w = ((base_s + s) // 600) * 600
        ref[(f"t{u}", w)] += 1
    got_map = {
        (r.event_type, int(r.window_start)): int(r.cnt)
        for r in got.itertuples()
    }
    assert got_map == dict(ref)


@settings(**SLOW)
@given(events_strategy)
def test_session_windows_matches_reference(ray_session, rows):
    from cloud_crawler_ray.ops.windows import session_windows

    gap = 900
    got = session_windows(_events_ds(rows), gap_s=gap).to_pandas()
    # reference: per user, sort ts, split where gap > gap_s
    ref = []
    byu = collections.defaultdict(list)
    base = 1_600_000_000
    for u, s, _ in rows:
        byu[u].append(base + s)
    for u, ts in byu.items():
        ts.sort()
        start = prev = ts[0]
        n = 1
        for t in ts[1:]:
            if t - prev > gap:
                ref.append((u, start, prev, n))
                start, n = t, 0
            n += 1
            prev = t
        ref.append((u, start, prev, n))
    got_set = {
        (int(r.user_id), int(r.session_start), int(r.session_end), int(r.n_events))
        for r in got.itertuples()
    }
    assert got_set == set(ref)


texts_strategy = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=12), min_size=0, max_size=40
)


@settings(**SLOW)
@given(texts_strategy)
def test_exact_dedup_keeps_lowest_id_per_fingerprint(ray_session, texts):
    from cloud_crawler_ray.functions import text as T
    from cloud_crawler_ray.ops.dedup import exact_dedup

    items = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    if not items:
        return
    ds = rd.from_items(items).repartition(3)
    got = sorted(exact_dedup(ds).to_pandas()["doc_id"].tolist())
    first = {}
    for i, t in enumerate(texts):
        fp = T.fingerprint(t)
        first.setdefault(fp, i)
    assert got == sorted(first.values())


@settings(**SLOW)
@given(events_strategy)
def test_rolling_and_running_windows_match_pandas(ray_session, rows):
    """The inline window queries (rolling_sum, running_total) against
    pandas' own window machinery, through a real parquet round-trip."""
    import pathlib
    import pyarrow.parquet as pq

    from cloud_crawler_ray.pipelines.queries import q_rolling_sum, q_running_total

    if not rows:
        return
    d = pathlib.Path("/tmp/ccray_hyp_sf")
    d.mkdir(exist_ok=True)
    base = 1_600_000_000_000_000
    df = pd.DataFrame(
        {
            "event_id": np.arange(len(rows), dtype=np.int64),
            "user_id": np.array([u for u, _, _ in rows], dtype=np.int64),
            "ts": pd.to_datetime(
                [base + s * 1_000_000 for _, s, _ in rows], unit="us"
            ),
            "value": np.array([c / 100.0 for _, _, c in rows]),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), str(d / "events.parquet"))

    ref = df.copy()
    ref["cents"] = np.round(ref["value"].to_numpy() * 100).astype(np.int64)
    ref = ref.sort_values(["user_id", "ts", "event_id"], kind="stable")
    ref["cum"] = ref.groupby("user_id")["cents"].cumsum()
    ref["w3"] = (
        ref.groupby("user_id")["cents"]
        .rolling(3, min_periods=1)
        .sum()
        .reset_index(level=0, drop=True)
        .astype(np.int64)
    )
    ref = ref.sort_values("event_id")

    got_run = q_running_total(str(d))
    assert got_run["cum_cents"].tolist() == ref["cum"].tolist()
    got_roll = q_rolling_sum(str(d))
    assert got_roll["w3_cents"].tolist() == ref["w3"].tolist()


joined_strategy = st.tuples(
    # left: (key, ts, id) — duplicate (key, ts) pairs likely
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=50),
        ),
        min_size=1,
        max_size=30,
    ),
    # right: (key, ts, payload)
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=-99, max_value=99),
        ),
        min_size=0,
        max_size=30,
    ),
)


@settings(**SLOW)
@given(joined_strategy)
def test_asof_join_matches_pandas_merge_asof(ray_session, data):
    from cloud_crawler_ray.ops.joins import asof_join

    lrows, rrows = data
    # unique right (key, ts): merge_asof picks the LAST among equal ts;
    # dedup keeps semantics comparable without modeling tie order
    seen = {}
    for k, t, p in rrows:
        seen[(k, t)] = p
    rrows = [(k, t, p) for (k, t), p in seen.items()]

    left = rd.from_arrow(
        pa.table(
            {
                "key": pa.array([k for k, _ in lrows], pa.int64()),
                "lts": pa.array([t for _, t in lrows], pa.int64()),
                "lid": pa.array(range(len(lrows)), pa.int64()),
            }
        )
    ).repartition(3)
    right = rd.from_arrow(
        pa.table(
            {
                "key": pa.array([k for k, _, _ in rrows], pa.int64()),
                "rts": pa.array([t for _, t, _ in rrows], pa.int64()),
                "payload": pa.array([p for _, _, p in rrows], pa.int64()),
            }
        )
    ).repartition(2)
    raw = asof_join(left, right, "key", "lts", "rts", ["payload"]).to_pandas()

    # reference: per left row, the right row with max rts <= lts (same key)
    ref = []
    for i, (k, t) in enumerate(lrows):
        cand = [(rt, p) for rk, rt, p in rrows if rk == k and rt <= t]
        if cand:
            rt, p = max(cand)
            ref.append((i, rt, p))
    if not ref:
        assert len(raw) == 0
        return
    got = raw.sort_values("lid").reset_index(drop=True)
    assert got["lid"].tolist() == [i for i, _, _ in ref]
    assert got["asof_rts"].tolist() == [rt for _, rt, _ in ref]
    assert got["payload"].tolist() == [p for _, _, p in ref]


@settings(**SLOW)
@given(joined_strategy, st.sampled_from([0, 500_000]))
def test_keyed_attach_matches_pandas_merge(ray_session, data, cap):
    """Both keyed_attach paths (broadcast cap 500k → broadcast; cap 0 →
    sharded shuffle join) against a pandas left merge. Right side unique
    per key (the op's contract)."""
    from cloud_crawler_ray.ops.dedup import keyed_attach

    lrows, rrows = data
    rmap = {}
    for k, _, p in rrows:
        rmap.setdefault(k, p)
    left = rd.from_arrow(
        pa.table(
            {
                "key": pa.array([k for k, _ in lrows], pa.int64()),
                "lid": pa.array(range(len(lrows)), pa.int64()),
            }
        )
    ).repartition(3)
    right = rd.from_arrow(
        pa.table(
            {
                "key": pa.array(list(rmap), pa.int64()),
                "payload": pa.array(list(rmap.values()), pa.int64()),
            }
        )
    )
    got = (
        keyed_attach(left, right, "key", ["payload"],
                     right_count=len(rmap), broadcast_cap=cap)
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    exp = [rmap.get(k) for k, _ in lrows]
    got_payload = [None if pd.isna(v) else int(v) for v in got["payload"]]
    assert got["lid"].tolist() == list(range(len(lrows)))
    assert got_payload == exp


@settings(**SLOW)
@given(
    st.lists(
        st.tuples(st.integers(min_value=-50, max_value=50), st.integers(min_value=0, max_value=9)),
        min_size=1, max_size=50,
    )
)
def test_zip_with_index_matches_argsort(ray_session, rows):
    """The global-sequence primitive behind seq_assign and the wave planner:
    stamped ranks must equal the stable argsort of the sort keys, under any
    partitioning (ties broken by the secondary key, which we make unique)."""
    from cloud_crawler_ray.stages.indexing import zip_with_index

    tbl = pa.table(
        {
            "k": pa.array([k for k, _ in rows], pa.int64()),
            "uid": pa.array(range(len(rows)), pa.int64()),
        }
    )
    ds = rd.from_arrow(tbl).repartition(4)
    out, n = zip_with_index(ds, ["k", "uid"], col="seq", with_count=True)
    got = out.to_pandas().sort_values("uid").reset_index(drop=True)
    assert n == len(rows)
    order = sorted(range(len(rows)), key=lambda i: (rows[i][0], i))
    exp_seq = [0] * len(rows)
    for rank, i in enumerate(order):
        exp_seq[i] = rank
    assert got["seq"].tolist() == exp_seq


@settings(**SLOW)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.floats(min_value=-100, max_value=100, allow_nan=False, width=64),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_value_quantiles_by_is_exact_order_statistic(ray_session, rows):
    """PERCENTILE_DISC per key on arbitrary doubles: the selected value must
    be EXACTLY the rank-ceil(q*n) element of the key's sorted values."""
    import math

    from cloud_crawler_ray.ops.textstats import value_quantiles_by

    tbl = pa.table(
        {
            "key": pa.array([k for k, _ in rows], pa.int64()),
            "v": pa.array([v for _, v in rows], pa.float64()),
        }
    )
    ds = rd.from_arrow(tbl).repartition(3)
    got = value_quantiles_by(ds, key="key", col="v", qs=(0.25, 0.5, 0.9))
    byk = collections.defaultdict(list)
    for k, v in rows:
        byk[k].append(v)
    for r in got.itertuples():
        vals = sorted(byk[r.key])
        rank = max(1, math.ceil(r.q * len(vals)))
        assert r.v_q == vals[rank - 1], (r.key, r.q)
