"""Mergeable cardinality sketches (HyperLogLog) + exact distinct counting.

HyperLogLog (Flajolet et al., "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm", AofA 2007) is THE at-scale shape for
COUNT(DISTINCT): each block collapses to a fixed 2^p-byte register array,
registers merge by elementwise max (associative + commutative + idempotent,
so Ray's at-least-once re-execution cannot skew the result), and the driver
touches a few kilobytes no matter the corpus size. The exact sharded
counterpart (`vocab_size` in textstats.py) is the oracle-checkable twin;
this is the 100-TB path with ~1.04/sqrt(2^p) relative error.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _clz64(v: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros over uint64 (no float round-trip — a
    value just below 2^k would round UP across the bit boundary)."""
    lz = np.zeros(v.shape, dtype=np.int64)
    x = v.copy()
    for s in (32, 16, 8, 4, 2, 1):
        mask = x < (np.uint64(1) << np.uint64(64 - s))
        lz = np.where(mask, lz + s, lz)
        x = np.where(mask, x << np.uint64(s), x)
    return np.where(v == np.uint64(0), 64, lz)


def hll_partial(values: np.ndarray, p: int = 12) -> np.ndarray:
    """Register array (uint8[2^p]) for one batch of values. Hash is pandas'
    fixed-key vectorized siphash — deterministic across runs and workers."""
    m = 1 << p
    reg = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return reg
    h = pd.util.hash_array(np.asarray(values, dtype=object))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)
    rank = np.minimum(_clz64(rest) + 1, 64 - p + 1).astype(np.uint8)
    np.maximum.at(reg, idx, rank)
    return reg


def hll_merge(regs: np.ndarray) -> np.ndarray:
    """Elementwise max over a stack of register arrays."""
    return regs.max(axis=0).astype(np.uint8)


def hll_estimate(reg: np.ndarray) -> float:
    """Standard HLL estimator with the small-range linear-counting
    correction (the 64-bit-hash variant needs no large-range term)."""
    m = len(reg)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_distinct_tokens(ds: rd.Dataset, p: int = 12) -> pd.DataFrame:
    """Approximate distinct-token count over a documents Dataset.

    Per-batch tokenize → one (register-array) row per batch → a bounded
    combine stage so the driver merges a handful of 2^p-byte rows, never one
    per input block (at 100 TB the partial stream itself is large)."""
    from .textstats import tokenize

    m = 1 << p

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        reg = hll_partial(tokenize(batch["text"]).to_numpy(), p)
        return pd.DataFrame({"reg": [reg.tobytes()]})

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        regs = np.stack(
            [np.frombuffer(b, dtype=np.uint8) for b in batch["reg"]]
        )
        return pd.DataFrame({"reg": [hll_merge(regs).tobytes()]})

    parts = (
        ds.map_batches(partial, batch_format="pandas", batch_size=8192)
        .repartition(8)
        .map_batches(combine, batch_format="pandas", batch_size=1 << 30)
        .to_pandas()
    )
    if parts.empty:  # empty corpus: zero registers, estimate 0
        reg = np.zeros(m, dtype=np.uint8)
    else:
        reg = hll_merge(
            np.stack([np.frombuffer(b, dtype=np.uint8) for b in parts["reg"]])
        )
    return pd.DataFrame(
        {"estimate": [hll_estimate(reg)], "registers": [m], "p": [p]}
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan, "An improved data stream
# summary: the count-min sketch and its applications", J. Algorithms 2005).
# The at-scale heavy-hitter shape: each block collapses to a fixed d×w int64
# grid, grids merge by elementwise ADD (associative + commutative), point
# queries take the min over d rows and only ever OVER-estimate, by at most
# εN with ε=e/w at confidence 1−(1/e)^d. The driver holds d·w ints no matter
# the corpus size; exact sharded top-k (vocab_topk) is the oracle twin.
# ---------------------------------------------------------------------------

_CMS_SEEDS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5)


def _cms_hash(values: np.ndarray, seed: int, w: int) -> np.ndarray:
    """Row of column indices for one seed: pandas' vectorized siphash with a
    per-row odd multiplier (Knuth-style) — deterministic across workers."""
    h = pd.util.hash_array(np.asarray(values, dtype=object))
    return ((h * np.uint64(seed | 1)) >> np.uint64(32)).astype(np.int64) % w


def cms_partial(values: np.ndarray, d: int = 4, w: int = 2048) -> np.ndarray:
    """d×w count grid for one batch of values."""
    grid = np.zeros((d, w), dtype=np.int64)
    if len(values) == 0:
        return grid
    for r in range(d):
        idx = _cms_hash(values, _CMS_SEEDS[r], w)
        np.add.at(grid[r], idx, 1)
    return grid


def cms_query(grid: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Point-estimate counts (min over rows) — never under the true count."""
    d, w = grid.shape
    est = np.full(len(values), np.iinfo(np.int64).max, dtype=np.int64)
    for r in range(d):
        idx = _cms_hash(values, _CMS_SEEDS[r], w)
        est = np.minimum(est, grid[r][idx])
    return est


def cms_token_counts(ds: rd.Dataset, d: int = 4, w: int = 2048) -> np.ndarray:
    """Merged Count-Min grid over a documents Dataset's tokens. One grid row
    per block → bounded combine (grids ADD) → driver merges a handful of
    d·w·8-byte rows, never one per input block."""
    from .textstats import tokenize

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        grid = cms_partial(tokenize(batch["text"]).to_numpy(), d, w)
        return pd.DataFrame({"grid": [grid.tobytes()]})

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        total = np.zeros((d, w), dtype=np.int64)
        for b in batch["grid"]:
            total += np.frombuffer(b, dtype=np.int64).reshape(d, w)
        return pd.DataFrame({"grid": [total.tobytes()]})

    parts = (
        ds.map_batches(partial, batch_format="pandas", batch_size=8192)
        .repartition(8)
        .map_batches(combine, batch_format="pandas", batch_size=1 << 30)
        .to_pandas()
    )
    total = np.zeros((d, w), dtype=np.int64)
    for b in parts["grid"]:
        total += np.frombuffer(b, dtype=np.int64).reshape(d, w)
    return total


# ---------------------------------------------------------------------------
# Bottom-k quantile sketch: a deterministic uniform row sample — keep the m
# rows with the smallest id-hash (hash priorities are uniform, so the
# surviving rows are a uniform sample; hashing the ROW ID, not the value,
# keeps duplicate values fairly represented). Bottom-k is EXACTLY mergeable
# (bottom-k of a union = bottom-k of the concatenated bottom-k's), so
# re-execution or any partitioning yields the identical sketch. Quantile
# estimates read the sample's order statistics; rank error is O(1/sqrt(m)).
# The exact order-statistic ops (value_quantiles_by, token_quantiles) are
# the oracle twins; this is the one-pass 100-TB path with a fixed-size
# driver footprint.
# ---------------------------------------------------------------------------


def quantile_sketch_partial(
    ids: np.ndarray, values: np.ndarray, m: int
) -> pd.DataFrame:
    h = (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(2**32)
    take = np.argsort(h, kind="stable")[:m]
    n = np.zeros(len(take), np.int64)
    if len(n):
        n[0] = len(values)  # block row count rides once, in the first row
    return pd.DataFrame(
        {
            "h": h[take].astype(np.int64),
            "v": values[take].astype(np.float64),
            "n": n,
        }
    )


def quantile_sketch_merge(parts: pd.DataFrame, m: int) -> tuple[pd.DataFrame, int]:
    """(bottom-m sample, total row count) from stacked partials."""
    total = int(parts["n"].sum())
    samp = parts.sort_values(["h", "v"], kind="stable").head(m)
    return samp[["h", "v"]], total


def quantile_sketch_estimate(sample: pd.DataFrame, qs: tuple[float, ...]) -> list[float]:
    """PERCENTILE_DISC over the sample: rank ceil(q*n), 1-based."""
    import math

    v = np.sort(sample["v"].to_numpy())
    out = []
    for q in qs:
        r = max(1, math.ceil(q * len(v)))
        out.append(float(v[r - 1]))
    return out


def quantile_sketch(
    ds: rd.Dataset,
    id_col: str,
    value_col: str,
    m: int = 4096,
    qs: tuple[float, ...] = (0.1, 0.5, 0.9),
) -> pd.DataFrame:
    """One-pass approximate quantiles: per-block bottom-m partials (the
    block's row count rides in the first sample row) → driver merge of
    #blocks × m rows → order-statistic read. Returns (q, value_est, n)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return quantile_sketch_partial(
            df[id_col].to_numpy(), df[value_col].to_numpy(), m
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return pd.DataFrame({"q": list(qs), "value_est": np.nan, "n": 0})
    samp, total = quantile_sketch_merge(parts, m)
    est = quantile_sketch_estimate(samp, qs)
    return pd.DataFrame({"q": list(qs), "value_est": est, "n": total})


def hll_distinct_by(
    ds: rd.Dataset, key: str, value: str, p: int = 12
) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT value) per key — the grouped-sketch shape
    (one HLL register array per key, mergeable by elementwise max, so
    re-execution cannot skew it). Per block: one register row per key
    PRESENT IN THAT BLOCK (bounded by block keys, not corpus keys); rows
    hash-shard on the key so a key's partials meet in exactly one shard;
    the driver sees one (key, estimate) row per distinct key. The exact
    twin at test scale is groupby/COUNT DISTINCT (tumbling_distinct /
    vocab_size family); this is the 100-TB path when per-key id sets are
    unbounded (e.g. distinct users per host over a year of events)."""
    from .dedup import _add_shard, cluster_shards

    m = 1 << p
    n_sh = cluster_shards()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keys, regs = [], []
        for k, sub in df.groupby(key, sort=False):
            keys.append(k)
            regs.append(hll_partial(sub[value].to_numpy(), p).tobytes())
        return pd.DataFrame({key: keys, "reg": regs})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        keys, ests = [], []
        for k, sub in g.groupby(key, sort=False):
            regs = np.stack(
                [np.frombuffer(r, dtype=np.uint8) for r in sub["reg"]]
            )
            keys.append(k)
            ests.append(hll_estimate(hll_merge(regs)))
        return pd.DataFrame({key: keys, "approx_distinct": ests})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(
            lambda t: _add_shard(t, key, n_sh), batch_format="pyarrow"
        )
        .groupby("shard")
        .map_groups(
            lambda g: combine(g.drop(columns=["shard"])), batch_format="pandas"
        )
        .to_pandas()
    )


# ---- KMV / theta set-operation sketches ------------------------------------
# Bottom-k minimum hash values (Beyer et al., "On Synopses for Distinct-Value
# Estimation Under Multiset Operations", SIGMOD 2007; the DataSketches theta
# family). Where HLL answers |A|, KMV answers SET OPERATIONS between streams
# that never materialize: θ = k-th smallest hash of the UNION; every sketch
# member below θ is a uniform sample of the union, so
#   |A ∩ B| ≈ |{h < θ : h ∈ sk(A) ∧ h ∈ sk(B)}| / θ.
# Partials are bounded (k values per block per side), merge = k smallest of
# the concatenation (associative/commutative/idempotent — re-execution safe).

_KMV_MULT = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 multiplier


def _kmv_hash(values: np.ndarray) -> np.ndarray:
    """uint64 hash stream: strings via crc-pair (NUL-safe), ints via a
    splitmix64 round — deterministic across processes."""
    if values.dtype.kind in ("i", "u"):
        x = values.astype(np.uint64)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))
    import zlib

    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        b = str(v).encode("utf-8")
        out[i] = (zlib.crc32(b) << 32) | zlib.crc32(b[::-1])
    return (out * _KMV_MULT) ^ (out >> np.uint64(29))


def kmv_partial(values: np.ndarray, k: int) -> np.ndarray:
    """Bottom-k distinct hashes of one block — the mergeable partial."""
    h = np.unique(_kmv_hash(values))
    return h[:k]


def kmv_merge(parts: list[np.ndarray], k: int) -> np.ndarray:
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts))[:k]


def kmv_set_estimates(a: np.ndarray, b: np.ndarray, k: int) -> dict:
    """Distinct-count estimates for A, B, A∪B, A∩B from two merged KMV
    sketches. Exact (sketch IS the set) when a side saw < k distinct."""
    union = np.unique(np.concatenate([a, b]))[:k]
    two64 = float(1 << 64)

    def card(sk: np.ndarray) -> float:
        if len(sk) < k:
            return float(len(sk))  # exact: sketch holds every distinct hash
        theta = float(sk[k - 1]) / two64
        return (k - 1) / theta

    if len(union) < k:
        inter = float(len(np.intersect1d(a, b)))
    else:
        theta_u = float(union[k - 1]) / two64
        below = union[: k - 1]  # strictly below the union threshold
        inter = (
            len(np.intersect1d(np.intersect1d(below, a), b)) / theta_u
        )
    return {
        "a": card(a),
        "b": card(b),
        "union": card(union),
        "intersection": inter,
    }


def kmv_intersection(
    ds: rd.Dataset, label_col: str, value_col: str,
    label_a: str, label_b: str, k: int = 1024,
) -> dict:
    """Approximate |A|, |B|, |A∪B|, |A∩B| where A/B are the distinct
    *value_col* sets of rows labeled *label_a*/*label_b* — e.g. users who
    viewed vs users who purchased, without materializing either id set.

    Distributed shape: each block emits ≤ 2k fixed-width hash rows (its
    bottom-k per side); the driver merges k smallest per side. The exact
    twin (SQL INTERSECT / funnel queries) is the oracle-checkable pair at
    test scale; this is the 100-TB path when the id sets are unbounded."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        out_side, out_hash = [], []
        for side, lbl in ((0, label_a), (1, label_b)):
            vals = t.filter(pc.equal(t.column(label_col), lbl)).column(
                value_col
            ).to_numpy(zero_copy_only=False)
            if len(vals):
                hs = kmv_partial(vals, k)
                out_side.extend([side] * len(hs))
                out_hash.extend(hs.tolist())
        return pa.table(
            {
                "side": pa.array(out_side, pa.int8()),
                "h": pa.array(np.array(out_hash, dtype=np.uint64)),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    sks = []
    for side in (0, 1):
        hs = parts[parts["side"] == side]["h"].to_numpy().astype(np.uint64)
        sks.append(np.unique(hs)[:k])
    return kmv_set_estimates(sks[0], sks[1], k)


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (Misra & Gries, "Finding repeated elements",
# Sci. Comput. Program. 1982; mergeability per Agarwal et al., "Mergeable
# summaries", PODS 2012). Unlike the Count-Min route above (approximate
# counts, needs a known candidate universe to enumerate), MG gives a
# DETERMINISTIC superset guarantee: any item with true count > N/(m+1)
# survives every merge of size-m summaries. A second exact pass over just
# the surviving candidates then yields the EXACT heavy-hitter set — a pure
# function of the corpus, independent of block structure, so it is directly
# SQL-checkable (GROUP BY ... HAVING cnt*m > N) with no twin needed.
# ---------------------------------------------------------------------------


def mg_reduce(tokens: np.ndarray, counts: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Reduce exact (token, count) pairs to a Misra-Gries summary of ≤ m
    entries: subtract the (m+1)-th largest count from all, keep positives.
    Decrements total ≤ N/(m+1) per reduction, preserving the MG bound."""
    if len(tokens) <= m:
        return tokens, counts
    order = np.argsort(counts)[::-1]
    pivot = counts[order[m]]
    keep = counts > pivot
    return tokens[keep], counts[keep] - pivot


def mg_heavy_hitters(ds: rd.Dataset, m: int = 64) -> pd.DataFrame:
    """Exact tokens with count·m > N (N = total corpus tokens), found at
    sketch cost. Two streaming passes:

    pass 1 — per-block exact counts → ``mg_reduce`` to ≤ m rows per block
    (plus one exact block-total row); summing the per-block MG lower bounds
    per token under-counts any token by ≤ Σ_i N_i/(m+1) = N/(m+1), so
    ``lb + N/(m+1) ≥ threshold`` is a guaranteed superset of the true
    heavy hitters and holds ≤ ~m(m+1) candidates (each has true count
    ≥ N/m − N/(m+1) = N/(m(m+1))).

    pass 2 — the candidate set broadcasts once via ``ray.put`` (it is tiny
    by the bound above), each block counts ONLY candidate tokens exactly,
    and a bounded combine keeps the integer filter cnt·m > N exact.

    Output = exactly {token : cnt·m > N} with exact counts — deterministic
    under any partitioning, which is what makes it oracle-checkable. The
    input Dataset is consumed twice (caller materializes)."""
    import ray

    from .textstats import tokenize

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = tokenize(batch["text"])
        vc = toks.value_counts()
        n_block = int(vc.sum())
        t, c = mg_reduce(
            vc.index.to_numpy(dtype=object), vc.to_numpy().astype(np.int64), m
        )
        return pd.DataFrame(
            {
                "token": np.append(t, [""]),  # "" is not a token (tokenize drops it)
                "lb": np.append(c, [0]).astype(np.int64),
                "n": np.append(np.zeros(len(t), np.int64), [n_block]),
            }
        )

    parts = (
        ds.map_batches(partial, batch_format="pandas", batch_size=8192)
        .groupby("token")
        .sum(["lb", "n"])
        .to_pandas()
        .rename(columns={"sum(lb)": "lb", "sum(n)": "n"})
    )
    n_total = int(parts["n"].sum()) if len(parts) else 0
    if n_total == 0:
        return pd.DataFrame({"token": pd.Series([], dtype=object), "cnt": pd.Series([], dtype=np.int64)})
    # integer-exact superset filter: lb + N/(m+1) ≥ N/m  ⇔  lb·m(m+1) ≥ N
    lbs = parts["lb"].to_numpy().astype(np.int64)
    cand = parts.loc[
        (lbs * m * (m + 1) >= n_total) & (parts["token"] != ""), "token"
    ].to_numpy(dtype=object)
    if len(cand) == 0:
        return pd.DataFrame({"token": pd.Series([], dtype=object), "cnt": pd.Series([], dtype=np.int64)})
    cand_ref = ray.put(set(cand.tolist()))

    def exact_pass(batch: pd.DataFrame) -> pd.DataFrame:
        cset = ray.get(cand_ref)
        toks = tokenize(batch["text"])
        hits = toks[toks.isin(cset)]
        vc = hits.value_counts()
        return pd.DataFrame(
            {"token": vc.index.to_numpy(dtype=object), "cnt": vc.to_numpy().astype(np.int64)}
        )

    exact = (
        ds.map_batches(exact_pass, batch_format="pandas", batch_size=8192)
        .groupby("token")
        .sum("cnt")
        .to_pandas()
    )
    exact = exact.rename(columns={"sum(cnt)": "cnt"})
    out = exact[exact["cnt"].to_numpy().astype(np.int64) * m > n_total]
    return (
        out.sort_values(["cnt", "token"], ascending=[False, True])
        .reset_index(drop=True)
        .astype({"cnt": np.int64})
    )


# ---------------------------------------------------------------------------
# AMS / tug-of-war F2 sketch (Alon, Matias & Szegedy, "The space complexity
# of approximating the frequency moments", STOC 1996; bucketed fast variant
# à la Count-Sketch, Charikar/Chen/Farach-Colton 2002). F2 = Σ f_k² is the
# self-join size — the join-planning statistic (skew detector, output-size
# estimator) a 100-TB shuffle planner wants without exact per-key counts.
# Each block collapses to a fixed d×w signed-count grid; grids merge by
# elementwise ADD, so the sketch is associative, idempotent-safe under
# deterministic re-execution, and the driver holds d·w ints regardless of
# corpus size. Per row, E[Σ_buckets c²] = F2 with variance ≤ 2·F2²/w; the
# estimate is the UPPER MEDIAN (sorted row sums, index d//2) — an integer,
# so the whole output is hash-comparable against a serial twin running the
# same kernel.
# ---------------------------------------------------------------------------

_AMS_SIGN_SEED = 0xD6E8FEB86659FD93


def ams_partial(values: np.ndarray, d: int = 4, w: int = 2048) -> np.ndarray:
    """d×w signed-count grid for one batch of values (tug-of-war rows)."""
    grid = np.zeros((d, w), dtype=np.int64)
    if len(values) == 0:
        return grid
    h = pd.util.hash_array(np.asarray(values, dtype=object))
    sign = 1 - 2 * ((h * np.uint64(_AMS_SIGN_SEED | 1)) >> np.uint64(63)).astype(
        np.int64
    )
    for r in range(d):
        idx = _cms_hash(values, _CMS_SEEDS[r], w)
        np.add.at(grid[r], idx, sign)
    return grid


def ams_estimate(grid: np.ndarray) -> int:
    """F2 estimate from a (merged) grid: upper median of per-row Σ c²."""
    sums = np.sort((grid.astype(np.int64) ** 2).sum(axis=1))
    return int(sums[len(sums) // 2])


def ams_f2(ds: rd.Dataset, col: str, d: int = 4, w: int = 2048) -> int:
    """Merged AMS F2 estimate over one column of a Dataset. One d×w grid
    per block → repartitioned bounded combine → driver merges a handful of
    grids, never one per input row/block."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        grid = ams_partial(batch[col].to_numpy(), d, w)
        return pd.DataFrame({"grid": [grid.tobytes()]})

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        total = np.zeros((d, w), dtype=np.int64)
        for b in batch["grid"]:
            total += np.frombuffer(b, dtype=np.int64).reshape(d, w)
        return pd.DataFrame({"grid": [total.tobytes()]})

    parts = (
        ds.map_batches(partial, batch_format="pandas", batch_size=8192)
        .repartition(8)
        .map_batches(combine, batch_format="pandas", batch_size=1 << 30)
        .to_pandas()
    )
    total = np.zeros((d, w), dtype=np.int64)
    for b in parts["grid"]:
        total += np.frombuffer(b, dtype=np.int64).reshape(d, w)
    return ams_estimate(total)


# ---------------------------------------------------------------------------
# Exponential histogram sliding-window counter (Datar, Gionis, Indyk &
# Motwani, "Maintaining stream statistics over sliding windows", SODA
# 2002). Counts events in the last W time units with O(k·log N) buckets
# and relative error ≤ 1/k: buckets hold power-of-two counts with the
# newest timestamp they cover; whenever more than k/2+1 buckets share a
# size, the two OLDEST of that size merge. Entirely deterministic — the
# histogram is a pure function of the (timestamp-sorted) stream — so a
# serial twin running the same kernel must match the sharded run
# bit-for-bit (streams sort per key inside their hash shard; a key's
# events are shard-complete).
# ---------------------------------------------------------------------------


def eh_build(ts: np.ndarray, k: int = 4) -> list[tuple[int, int]]:
    """Build the exponential histogram over an ASCENDING int timestamp
    stream: returns [(size, newest_ts), ...] oldest-first. max k//2 + 2
    buckets per size before the two oldest merge."""
    cap = k // 2 + 2
    buckets: list[list[int]] = []  # [size, newest_ts], oldest first
    for t in ts.tolist():
        buckets.append([1, int(t)])
        size = 1
        while True:
            idxs = [i for i, b in enumerate(buckets) if b[0] == size]
            if len(idxs) < cap:
                break
            i0, i1 = idxs[0], idxs[1]  # two oldest of this size
            buckets[i1] = [size * 2, buckets[i1][1]]
            del buckets[i0]
            size *= 2
    return [(b[0], b[1]) for b in buckets]


def eh_query(buckets: list[tuple[int, int]], cutoff: int) -> int:
    """Estimate the count of events with ts >= cutoff: full sizes of
    buckets whose newest_ts >= cutoff, minus half the OLDEST contributing
    bucket (its span may straddle the cutoff) — the DGIM estimate."""
    inside = [(s, t) for s, t in buckets if t >= cutoff]
    if not inside:
        return 0
    total = sum(s for s, _ in inside)
    return total - inside[0][0] // 2
