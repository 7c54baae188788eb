"""Windowed aggregates over an ordered event log.

Ray Data has no event-time window/watermark machinery; the reference has no
streaming semantics either (SURVEY §2.8 — wave-synchronous batch). For
stream-shaped inputs (the ``events`` table) windows are expressed as plain
batch algebra: assign each event its tumbling-window start (pure column
arithmetic), pre-aggregate per block with the native Arrow group_by kernel,
then combine partials per (window, key) shard — integer/window-start output
so the DuckDB oracle matches exactly.

Session windows use per-key sorted gap detection inside ``map_groups`` —
documented ordering assumption: events of one key fit one group (hash
partitioning by key), sorted by ts within the group function itself.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def tumbling_counts(
    ds: rd.Dataset, window_s: int = 3600, ts_col: str = "ts", key_col: str = "event_type"
) -> pd.DataFrame:
    """Events per (key, tumbling window). Returns a (small, bounded by
    key x window cardinality) pandas frame: (event_type, window_start epoch
    seconds, cnt) — partial per-block counts, tiny final combine."""

    def partial(t: pa.Table) -> pa.Table:
        epoch = pc.divide(pc.cast(t.column(ts_col), pa.int64()), 1_000_000)
        win = pc.multiply(pc.divide(epoch, window_s), window_s)  # int floor-div
        tt = pa.table({key_col: t.column(key_col), "window_start": win})
        g = tt.group_by([key_col, "window_start"]).aggregate([([], "count_all")])
        return g.rename_columns([key_col, "window_start", "partial"])

    partials = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if partials.empty:  # zero-block input: typed empty result
        return pd.DataFrame(
            {
                key_col: pd.Series(dtype=object),
                "window_start": pd.Series(dtype="int64"),
                "cnt": pd.Series(dtype="int64"),
            }
        )
    out = partials.groupby([key_col, "window_start"], as_index=False)["partial"].sum()
    return out.rename(columns={"partial": "cnt"})


def tumbling_distinct(
    ds: rd.Dataset,
    window_s: int = 3600,
    ts_col: str = "ts",
    key_col: str = "event_type",
    id_col: str = "user_id",
) -> pd.DataFrame:
    """COUNT(DISTINCT id) per (key, tumbling window) — the streaming
    unique-visitors aggregate. Distinctness cannot pre-aggregate to counts,
    so blocks emit distinct (key, window, id) triples (already a big
    reduction on repetitive streams), the triples hash-shard by (key,
    window) so a group never spans shards, and each shard emits one count
    row per group — driver sees key x window rows only. The mergeable-
    sketch alternative for unbounded ids is ops/sketches.py's HLL."""
    from .dedup import _add_shard

    def partial(t: pa.Table) -> pa.Table:
        epoch = pc.divide(pc.cast(t.column(ts_col), pa.int64()), 1_000_000)
        win = pc.multiply(pc.divide(epoch, window_s), window_s)
        tt = pa.table(
            {key_col: t.column(key_col), "window_start": win, id_col: t.column(id_col)}
        )
        g = tt.group_by([key_col, "window_start", id_col]).aggregate([])
        # shard on the composite group so one shard sees all of a group's ids
        comp = pc.binary_join_element_wise(
            pc.cast(g.column(key_col), pa.string()),
            pc.cast(g.column("window_start"), pa.string()),
            "|",
        )
        return _add_shard(g.append_column("comp", comp), "comp")

    def shard_counts(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.drop_duplicates([key_col, "window_start", id_col])
            .groupby([key_col, "window_start"], as_index=False)[id_col]
            .count()
        )
        return out.rename(columns={id_col: "n_distinct"})

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(shard_counts, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame(
            {
                key_col: pd.Series(dtype=str),
                "window_start": pd.Series(dtype="int64"),
                "n_distinct": pd.Series(dtype="int64"),
            }
        )
    out["n_distinct"] = out["n_distinct"].astype("int64")
    return out.reset_index(drop=True)


def rolling_max(
    ds: rd.Dataset,
    window: int = 5,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
) -> rd.Dataset:
    """Per-key rolling maximum over the last ``window`` events (row-count
    window ordered by (ts, id), not a time window) — the ordered-per-key-
    state window class (peak-over-recent-activity features). Max involves
    no arithmetic, so float results are bit-exact against the SQL window
    function regardless of evaluation order.

    Shape: keys hash-shard (every event of a key lands in one shard,
    politeness/session-window partitioning assumption), each shard sorts
    its slice once and computes the window as O(window) vectorized
    shifted-max passes with key-boundary masking. Output is one row per
    input event; the only shuffle is the key partitioning."""
    from .dedup import _add_shard

    def prep(t: pa.Table) -> pa.Table:
        tt = pa.table(
            {
                id_col: t.column(id_col),
                key_col: t.column(key_col),
                "ts_us": pc.cast(t.column(ts_col), pa.int64()),
                val_col: t.column(val_col),
            }
        )
        return _add_shard(tt, key_col)

    def shard_roll(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized shifted-max with key-boundary masking: O(window) numpy
        # passes over the sorted shard, no per-key Python (a shard can hold
        # millions of keys). Assumes non-null values (numpy max would
        # propagate NaN where SQL max skips NULL).
        g = g.sort_values([key_col, "ts_us", id_col], kind="stable").copy()
        keys = g[key_col].to_numpy()
        vals = g[val_col].to_numpy()
        out = vals.copy()
        for s in range(1, min(window, len(vals))):
            shifted = np.concatenate([vals[:s], vals[:-s]])  # head is masked
            same = np.concatenate(
                [np.zeros(s, dtype=bool), keys[s:] == keys[:-s]]
            )
            np.maximum(out, shifted, out=out, where=same)
        g["rolling_max"] = out
        return g[[id_col, key_col, "rolling_max"]]

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(shard_roll, batch_format="pandas")
    )


def tumbling_sum(
    ds: rd.Dataset,
    window_s: int = 3600,
    ts_col: str = "ts",
    key_col: str = "event_type",
    val_col: str = "value",
) -> pd.DataFrame:
    """Sum of *val_col* per (key, window); value kept as the raw double sum
    is float — for oracle-exact comparison we also return the count."""

    def partial(t: pa.Table) -> pa.Table:
        epoch = pc.divide(pc.cast(t.column(ts_col), pa.int64()), 1_000_000)
        win = pc.multiply(pc.divide(epoch, window_s), window_s)
        tt = pa.table(
            {key_col: t.column(key_col), "window_start": win, val_col: t.column(val_col)}
        )
        g = tt.group_by([key_col, "window_start"]).aggregate(
            [(val_col, "sum"), ([], "count_all")]
        )
        return g.rename_columns([key_col, "window_start", "psum", "pcnt"])

    partials = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if partials.empty:
        return pd.DataFrame(
            {
                key_col: pd.Series(dtype=object),
                "window_start": pd.Series(dtype="int64"),
                "vsum": pd.Series(dtype="float64"),
                "cnt": pd.Series(dtype="int64"),
            }
        )
    out = partials.groupby([key_col, "window_start"], as_index=False).agg(
        vsum=("psum", "sum"), cnt=("pcnt", "sum")
    )
    return out


def hopping_counts(
    ds: rd.Dataset,
    window_s: int = 3600,
    hop_s: int = 900,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> pd.DataFrame:
    """Hopping (sliding) windowed counts: each event lands in
    window_s/hop_s overlapping windows (window_s must be a multiple of
    hop_s). Same partial/combine shape as tumbling — the window explosion
    is pure vectorized column arithmetic inside the partial."""
    assert window_s % hop_s == 0, "window_s must be a multiple of hop_s"
    k = window_s // hop_s

    def partial(t: pa.Table) -> pa.Table:
        epoch = pc.divide(pc.cast(t.column(ts_col), pa.int64()), 1_000_000)
        e = epoch.to_numpy(zero_copy_only=False)
        base = (e // hop_s) * hop_s
        # windows containing t: base, base-hop, ..., base-(k-1)*hop
        starts = np.concatenate([base - i * hop_s for i in range(k)])
        keys = t.column(key_col).to_pylist() * k
        tt = pa.table(
            {key_col: pa.array(keys), "window_start": pa.array(starts, pa.int64())}
        )
        g = tt.group_by([key_col, "window_start"]).aggregate([([], "count_all")])
        return g.rename_columns([key_col, "window_start", "partial"])

    partials = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if partials.empty:
        return pd.DataFrame(
            {
                key_col: pd.Series(dtype=object),
                "window_start": pd.Series(dtype="int64"),
                "cnt": pd.Series(dtype="int64"),
            }
        )
    out = partials.groupby([key_col, "window_start"], as_index=False)["partial"].sum()
    return out.rename(columns={"partial": "cnt"})


def session_windows(
    ds: rd.Dataset,
    gap_s: int = 1800,
    ts_col: str = "ts",
    key_col: str = "user_id",
    n_shards: int = 64,
) -> rd.Dataset:
    """Session windows per key: events sorted by ts, a gap > gap_s starts a
    new session. Output: (key, session_start, session_end, n_events).

    Shard-local: keys are hash-partitioned into n_shards groups and ALL of a
    shard's keys are sessionized in one vectorized pandas pass — millions of
    keys cost 64 map_groups calls, not millions (this Ray's per-group
    overhead is ~2 ms). Partitioning assumption: one shard holds every event
    of its keys (guaranteed by the hash)."""

    def add_shard(t: pa.Table) -> pa.Table:
        from .dedup import _add_shard

        return _add_shard(t, key_col, n_shards)

    def sessions_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col])
        ts = g[ts_col].astype("int64").to_numpy() // 1_000_000
        keys = g[key_col].to_numpy()
        new_key = np.concatenate([[True], keys[1:] != keys[:-1]])
        gap = np.concatenate([[True], np.diff(ts) > gap_s])
        sid = np.cumsum(new_key | gap)  # global session id within the shard
        out = (
            pd.DataFrame({key_col: keys, "sid": sid, "ts": ts})
            .groupby([key_col, "sid"], as_index=False)
            .agg(session_start=("ts", "min"), session_end=("ts", "max"), n_events=("ts", "size"))
        )
        return out[[key_col, "session_start", "session_end", "n_events"]]

    return (
        ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(sessions_shard, batch_format="pandas")
    )
