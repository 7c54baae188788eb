"""Distributed as-of join — a custom operator Ray Data lacks.

For each left row, find the right-side row with the greatest "time" ≤ the
left row's time among rows sharing the join key (direction="backward",
inclusive). Shape: hash-partition BOTH sides by key into shards
(union-with-tag, one shuffle), then one vectorized ``pandas.merge_asof``
per shard — every key's rows land in exactly one shard, so the per-shard
merge is globally correct. Partitioning assumption: a shard holds all rows
of its keys (guaranteed by the hash).

Tie-break: right rows with equal (key, time) resolve to the one greatest by
*tie_col* (the right side is sorted (time, tie_col) and merge_asof takes
the last match), making results hash-exact against a SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .dedup import _add_shard


def range_join_count(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    left_point: str,
    right_point: str,
    width: int,
    out_id: str,
    n_shards: int = 64,
) -> rd.Dataset:
    """Banded range join, count form: for each left row, the number of right
    rows sharing *key* whose point lies in [left_point, left_point + width).
    Inner semantics: left rows with zero matches drop.

    Shape: one hash-partition of both sides by key, then a sort + binary
    search sweep per key inside each shard (no per-key cross product — the
    count is searchsorted(hi) - searchsorted(lo) on the key's sorted right
    points). Output: (out_id, n_events)."""
    _ls, _rs = left.schema(), right.schema()
    if _ls is None:  # a fully empty Dataset reports schema None — the
        # inner-join result is empty and left types are unknowable
        return rd.from_arrow(
            pa.schema([(out_id, pa.null()), ("n_events", pa.int64())]).empty_table()
        )
    ls = dict(zip(_ls.names, _ls.types))
    if _rs is None:
        return rd.from_arrow(
            pa.schema(
                [(out_id, ls[out_id]), ("n_events", pa.int64())]
            ).empty_table()
        )

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            t = _add_shard(t, key, n_shards)
            return t.append_column(
                "_side", pa.array(np.full(t.num_rows, side, dtype=np.int8))
            )

        return fn

    # harmonized minimal schemas: key, point, id (right id unused)
    def proj_left(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                key: t.column(key),
                "_pt": pa.compute.cast(t.column(left_point), pa.int64()),
                out_id: t.column(out_id),
            }
        )

    def proj_right(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                key: t.column(key),
                "_pt": pa.compute.cast(t.column(right_point), pa.int64()),
                out_id: pa.nulls(t.num_rows, type=ls[out_id]),
            }
        )

    both = (
        left.map_batches(proj_left, batch_format="pyarrow")
        .map_batches(tag(0), batch_format="pyarrow")
        .union(
            right.map_batches(proj_right, batch_format="pyarrow").map_batches(
                tag(1), batch_format="pyarrow"
            )
        )
    )
    out_schema = pa.schema([(out_id, ls[out_id]), ("n_events", pa.int64())])

    def sweep(g: pd.DataFrame) -> pa.Table:
        l = g[g["_side"] == 0]
        r = g[g["_side"] == 1].sort_values([key, "_pt"], kind="stable")
        ids_out, counts = [], []
        r_groups = {k: grp["_pt"].to_numpy() for k, grp in r.groupby(key)}
        for k, grp in l.groupby(key):
            pts = r_groups.get(k)
            if pts is None:
                continue
            lo = np.searchsorted(pts, grp["_pt"].to_numpy(), side="left")
            hi = np.searchsorted(pts, grp["_pt"].to_numpy() + width, side="left")
            n = hi - lo
            m = n > 0
            ids_out.extend(grp[out_id].to_numpy()[m].tolist())
            counts.extend(n[m].tolist())
        return pa.table(
            {
                out_id: pa.array(ids_out, ls[out_id]),
                "n_events": pa.array(counts, pa.int64()),
            },
            schema=out_schema,
        )

    return both.groupby("shard").map_groups(sweep, batch_format="pandas")


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tie_col: str | None = None,
    n_shards: int = 64,
) -> rd.Dataset:
    """Inner as-of join (backward, inclusive). *left* keeps all its columns
    plus ``asof_<right_ts>`` and the right_payload columns; left rows with
    no matching right row are dropped (ASOF JOIN inner semantics)."""
    lcols = list(left.schema().names)

    def tag_left(t: pa.Table) -> pa.Table:
        t = _add_shard(t, key, n_shards)
        return t.append_column(
            "_side", pa.array(np.zeros(t.num_rows, dtype=np.int8))
        )

    def tag_right(t: pa.Table) -> pa.Table:
        t = _add_shard(t, key, n_shards)
        return t.append_column(
            "_side", pa.array(np.ones(t.num_rows, dtype=np.int8))
        )

    # harmonize schemas for the union: each side gets the other's columns
    # as typed nulls
    ls, rs = left.schema(), right.schema()
    if ls is None:  # fully empty left: inner result empty, left types unknowable
        return rd.from_arrow(pa.schema([]).empty_table())
    lt = dict(zip(ls.names, ls.types))
    if rs is None:  # fully empty right: typed empty result (asof col takes
        # the left ts type; payload types unknowable → null)
        out_schema = pa.schema(
            [(c, lt[c]) for c in lcols]
            + [(f"asof_{right_ts}", lt[left_ts])]
            + [(c, pa.null()) for c in right_payload]
        )
        return rd.from_arrow(out_schema.empty_table())
    rt = dict(zip(rs.names, rs.types))
    lonly = [c for c in ls.names if c not in rt]
    ronly = [c for c in rs.names if c not in lt]
    all_cols = list(ls.names) + ronly

    def pad(side_only: list[str], types: dict):
        def fn(t: pa.Table) -> pa.Table:
            for c in side_only:
                t = t.append_column(c, pa.nulls(t.num_rows, type=types[c]))
            return t.select(all_cols + ["shard", "_side"])

        return fn

    both = (
        left.map_batches(tag_left, batch_format="pyarrow")
        .map_batches(pad(ronly, rt), batch_format="pyarrow")
        .union(
            right.map_batches(tag_right, batch_format="pyarrow").map_batches(
                pad(lonly, lt), batch_format="pyarrow"
            )
        )
    )

    out_cols = lcols + [f"asof_{right_ts}"] + right_payload
    out_schema = pa.schema(
        [(c, lt[c]) for c in lcols]
        + [(f"asof_{right_ts}", rt[right_ts])]
        + [(c, rt[c]) for c in right_payload]
    )

    def _to_arrow(m: pd.DataFrame) -> pa.Table:
        # declared schema on every block — empty shards / pandas upcasts
        # must not leak divergent dtypes into the block stream
        return pa.table(
            {
                f.name: pa.Array.from_pandas(m[f.name], type=f.type, safe=False)
                for f in out_schema
            },
            schema=out_schema,
        )

    def merge(g: pd.DataFrame) -> pa.Table:
        l = g[g["_side"] == 0][lcols].sort_values(left_ts, kind="stable")
        rcols = [key, right_ts] + right_payload
        r_sort = [right_ts] + ([tie_col] if tie_col else [])
        r = g[g["_side"] == 1][rcols].sort_values(r_sort, kind="stable")
        if not len(l) or not len(r):
            return _to_arrow(pd.DataFrame({c: pd.Series([], dtype=object) for c in out_cols}))
        m = pd.merge_asof(
            l,
            r.rename(columns={right_ts: f"asof_{right_ts}"}),
            left_on=left_ts,
            right_on=f"asof_{right_ts}",
            by=key,
            direction="backward",
            allow_exact_matches=True,
        )
        m = m.dropna(subset=[f"asof_{right_ts}"])  # inner semantics
        return _to_arrow(m[out_cols])

    return both.groupby("shard").map_groups(merge, batch_format="pandas")


def interval_overlap_pairs(
    iv: rd.Dataset,
    key_col: str,
    start_col: str,
    end_col: str,
    bucket_s: int = 86400,
    n_shards: int | None = None,
) -> rd.Dataset:
    """Interval-overlap self-join: distinct-key pairs whose [start, end]
    intervals intersect, with the number of intersecting interval pairs per
    key pair. The third join class here beside as-of (nearest earlier) and
    banded range (point-in-window): both sides are INTERVALS.

    Shape — bucket replication + per-bucket sweep: each interval replicates
    to every time bucket it touches (map-side; short intervals ⇒ ~1 row
    each), one hash(bucket) shuffle co-locates concurrent intervals, and
    each bucket emits its overlap pairs from a start-sorted vectorized
    sweep (searchsorted gives every i its contiguous overlap range; pair
    indices come from one repeat/cumsum construction — no Python pair
    loop). A pair is counted ONLY in the bucket holding the later start, so
    cross-bucket duplicates never exist. Output volume is the honest cost;
    the bucket width trades replication against per-bucket fan-in."""
    from .dedup import _add_shard, cluster_shards

    n_sh = n_shards or cluster_shards()

    def replicate(df: pd.DataFrame) -> pd.DataFrame:
        st = df[start_col].to_numpy().astype(np.int64)
        en = df[end_col].to_numpy().astype(np.int64)
        b0, b1 = st // bucket_s, en // bucket_s
        reps = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(df)), reps)
        if len(reps):
            offs = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
                np.concatenate([[0], np.cumsum(reps)[:-1]]), reps
            )
        else:
            offs = np.array([], np.int64)
        return pd.DataFrame(
            {
                "key": df[key_col].to_numpy()[idx],
                "st": st[idx],
                "en": en[idx],
                "bucket": b0[idx] + offs,
            }
        )

    rep = iv.map_batches(replicate, batch_format="pandas")

    def bucket_sweep(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for bucket, gb in g.groupby("bucket"):
            gb = gb.sort_values(["st", "en", "key"], kind="stable")
            st = gb["st"].to_numpy()
            keys = gb["key"].to_numpy()
            hi = np.searchsorted(st, gb["en"].to_numpy(), side="right")
            cnt = np.maximum(hi - np.arange(len(st)) - 1, 0)
            if not cnt.sum():
                continue
            ii = np.repeat(np.arange(len(st)), cnt)
            offs = np.concatenate([[0], np.cumsum(cnt)[:-1]])
            jj = np.arange(int(cnt.sum())) - np.repeat(offs, cnt) + ii + 1
            # count each pair only in the later start's bucket; drop same-key
            keep = (st[jj] // bucket_s == bucket) & (keys[ii] != keys[jj])
            ka, kb = keys[ii[keep]], keys[jj[keep]]
            outs.append(
                pd.DataFrame(
                    {"key_a": np.minimum(ka, kb), "key_b": np.maximum(ka, kb)}
                )
            )
        if not outs:
            return pd.DataFrame(
                {"key_a": np.array([], np.int64), "key_b": np.array([], np.int64)}
            )
        return pd.concat(outs, ignore_index=True)

    pairs = (
        rep.map_batches(lambda t: _add_shard(t, "bucket", n_sh), batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: bucket_sweep(g.drop(columns=["shard"])), batch_format="pandas"
        )
    )

    def pair_key(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        key = pc.binary_join_element_wise(
            pc.cast(t.column("key_a"), pa.string()),
            pc.cast(t.column("key_b"), pa.string()),
            "\x1f",
        )
        return _add_shard(t.append_column("_k", key), "_k", n_sh).drop_columns(["_k"])

    def pair_count(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["key_a", "key_b"], as_index=False).size()
        out = out.rename(columns={"size": "n_overlaps"})
        out["n_overlaps"] = out["n_overlaps"].astype(np.int64)
        return out

    return (
        pairs.map_batches(pair_key, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: pair_count(g.drop(columns=["shard"])), batch_format="pandas"
        )
    )


_BLOOM_K1 = np.uint64(0x9E3779B97F4A7C15)
_BLOOM_K2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _bloom_indices(keys: np.ndarray, n_bits: int, n_hashes: int) -> np.ndarray:
    """(len(keys), n_hashes) bit positions, fully vectorized double hashing
    over int64 keys — the numpy sibling of the crawl seen-set's string
    BloomFilter (state/filters.py:32)."""
    k = keys.astype(np.uint64)
    h1 = k * _BLOOM_K1
    h1 ^= h1 >> np.uint64(31)
    h2 = (k * _BLOOM_K2) | np.uint64(1)
    i = np.arange(n_hashes, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(n_bits)).astype(
        np.int64
    )


def bloom_anti_join(
    left: rd.Dataset,
    right_keys: rd.Dataset,
    key_col: str,
    n_bits: int = 1 << 22,
    n_hashes: int = 7,
) -> rd.Dataset:
    """EXACT anti-join (left rows whose key does not appear in right_keys)
    with a Bloom pre-filter: per-block partial filters over the right side
    OR-merge into one bit array (fixed n_bits/8 bytes regardless of
    cardinality; at real scale the OR is a tree reduce, not a driver fold),
    broadcast once, and every left block drops its definite-misses map-side
    — only possible-hits (true hits + the filter's false-positive rate)
    reach the exact shard-based check, so the shuffle carries a fraction of
    the left side. False positives cost work, never correctness: the hit
    subset is re-checked exactly against the right keys."""
    from .dedup import _add_shard, cluster_shards

    def bloom_partial(t: pa.Table) -> pa.Table:
        # right side is single-column; its name need not match key_col
        keys = np.unique(
            t.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        bits = np.zeros(n_bits // 8, np.uint8)
        idx = _bloom_indices(keys, n_bits, n_hashes).ravel()
        np.bitwise_or.at(bits, idx >> 3, (1 << (idx & 7)).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    parts = right_keys.map_batches(bloom_partial, batch_format="pyarrow").to_pandas()
    bits = np.zeros(n_bits // 8, np.uint8)
    for b in parts["bits"]:
        bits |= np.frombuffer(b, np.uint8)
    bref = ray.put(bits)

    def split(t: pa.Table) -> pa.Table:
        b = ray.get(bref)
        keys = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        idx = _bloom_indices(keys, n_bits, n_hashes)
        hit = np.all((b[idx >> 3] & (1 << (idx & 7))) != 0, axis=1)
        return t.append_column("_maybe", pa.array(hit))

    tagged = left.map_batches(split, batch_format="pyarrow").materialize()
    sure_miss = tagged.filter(expr="_maybe == False").drop_columns(["_maybe"])
    maybe = tagged.filter(expr="_maybe == True").drop_columns(["_maybe"])

    # exact check for the maybe-subset: co-shard with the right keys
    n_sh = cluster_shards()
    _ls = left.schema()
    left_cols = list(_ls.names)
    ltypes = dict(zip(_ls.names, _ls.types))

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {c: pa.nulls(t.num_rows, ltypes[c]) for c in left_cols}
        cols[key_col] = t.column(0).cast(pa.int64())
        cols["_is_right"] = pa.array([True] * t.num_rows)
        return pa.table(cols)

    def tag_left(t: pa.Table) -> pa.Table:
        return t.append_column("_is_right", pa.array([False] * t.num_rows))

    both = maybe.map_batches(tag_left, batch_format="pyarrow").union(
        right_keys.map_batches(tag_right, batch_format="pyarrow")
    )

    def shard_anti(g: pd.DataFrame) -> pd.DataFrame:
        rk = set(g.loc[g["_is_right"], key_col])
        lf = g.loc[~g["_is_right"]]
        return lf[~lf[key_col].isin(rk)].drop(columns=["_is_right"])

    survivors = (
        both.map_batches(lambda t: _add_shard(t, key_col, n_sh), batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: shard_anti(g.drop(columns=["shard"])), batch_format="pandas"
        )
    )
    return sure_miss.union(survivors)
