"""Dataset splitting / sampling operators for training-data pipelines.

A split must be a pure function of the row key — never of block order,
partition count, or a driver-held RNG — so that (a) re-running any subset of
a 100-TB input reproduces the same assignment, (b) a resumed job agrees with
the killed one, and (c) the assignment is SQL-expressible for the oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

# Knuth's multiplicative hash constant (2^32 / golden ratio) — public-domain
# integer mixing; the split is h(doc_id) = (doc_id * K) mod 2^32, a full-period
# permutation of the 32-bit ring, so consecutive ids land uniformly.
_KNUTH = 2654435761
_M32 = 2**32


def train_test_split(
    ds: rd.Dataset, key: str = "doc_id", train_pct: int = 90
) -> rd.Dataset:
    """Deterministic hash split: rows where (key * K) mod 2^32 mod 100 falls
    under ``train_pct`` go to "train", the rest to "test". Map-side only —
    no shuffle, no state; uint64 wraparound is exact because
    2^32 divides 2^64, so the numpy overflow semantics equal the oracle's
    HUGEINT arithmetic."""

    def assign(t: pa.Table) -> pa.Table:
        ids = t.column(key).to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(_KNUTH)) % np.uint64(_M32) % np.uint64(100)
        split = np.where(h < train_pct, "train", "test")
        return pa.table(
            {
                key: t.column(key),
                "split": pa.array(split.astype(object), pa.string()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def mix_weighted(
    ds: rd.Dataset,
    rates: dict[str, float],
    group: str = "lang",
    key: str = "doc_id",
    default: float = 0.0,
    keep_cols: tuple[str, ...] = (),
) -> rd.Dataset:
    """Deterministic weighted corpus mixing: keep each row with its source
    group's sampling rate (rates[group value] in [0, 1], else ``default``) —
    the mixture-reweighting step of assembling a training corpus from
    heterogeneous sources. Membership is the same pure hash function of the
    key as train_test_split, so re-runs, resume, and per-source reruns all
    agree, and a row kept at rate r stays kept at any rate >= r (nested
    samples). Map-side only — no shuffle; to mix SEPARATE tables, call this
    per table and union the results.

    Rate -> threshold quantization is int(r * 2^32) (truncation); oracle
    SQL must embed the identical integer thresholds."""
    thresholds = {g: min(_M32, int(r * _M32)) for g, r in rates.items()}
    default_thr = min(_M32, int(default * _M32))

    def keep(t: pa.Table) -> pa.Table:
        ids = t.column(key).to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(_KNUTH)) % np.uint64(_M32)
        thr = (
            pd.Series(t.column(group).to_pylist())
            .map(thresholds)
            .fillna(default_thr)
            .to_numpy()
            .astype(np.uint64)
        )
        return t.filter(pa.array(h < thr)).select([key, group, *keep_cols])

    return ds.map_batches(keep, batch_format="pyarrow")


def consistent_sample(
    ds: rd.Dataset, key: str = "doc_id", k: int = 100, n_shards: int = 64
) -> "pd.DataFrame":
    """Deterministic uniform sample: the k rows whose hashed key is smallest
    (ties by key). Membership is a pure function of the key SET — stable
    under re-runs, resume, repartitioning, and growth (adding rows can only
    swap members out, never reshuffle survivors), which is what makes it the
    eval-holdout / debugging-sample primitive at 100 TB.

    Per-block partial top-k → hash-shard → per-shard top-k, so the driver
    merges n_shards*k rows regardless of input size."""
    from .dedup import _add_shard

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column(key).to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(_KNUTH)) % np.uint64(_M32)
        take = min(k, len(h))
        idx = np.lexsort((ids, h))[:take]
        out = t.take(pa.array(idx, pa.int64()))
        return out.append_column("h", pa.array(h[idx].astype(np.int64)))

    def shard_topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["h", key], kind="stable").head(k)

    tops = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(lambda t: _add_shard(t, key, n_shards), batch_format="pyarrow")
        .groupby("shard")
        .map_groups(shard_topk, batch_format="pandas")
        .to_pandas()
    )
    if tops.empty:  # empty input: to_pandas() loses even the columns
        return pd.DataFrame({key: pd.Series(dtype="int64")})
    tops = tops.sort_values(["h", key], kind="stable").head(k)
    return tops.drop(columns=["h", "shard"]).reset_index(drop=True)


def group_quota(
    ds: rd.Dataset,
    group: str,
    value_col: str,
    key: str = "doc_id",
    k: int = 100,
    n_shards: int = 64,
) -> rd.Dataset:
    """Per-group quota cap: keep the k best rows of each group
    (``value_col`` DESC, ``key`` ASC tie-break) — the domain-balancing step
    of corpus assembly (cap documents per host/source so no single domain
    dominates the training mix). Deterministic and resume/repartition-stable
    (membership is a pure function of each group's row set), and
    SQL-expressible (a ROW_NUMBER window) for the oracle.

    Per-block per-group partial top-k (vectorized sort + groupby head; each
    block emits ≤ k rows per group it contains) → hash-shard by group →
    exact per-group top-k inside each shard, so every group is finalized by
    exactly one shard task and the result STAYS a Dataset — the corpus never
    funnels through the driver."""
    from .dedup import _add_shard

    cols = [key, group, value_col]
    by = [group, value_col, key]
    asc = [True, False, True]

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(cols).to_pandas()
        df = df.sort_values(by, ascending=asc, kind="stable")
        return pa.Table.from_pandas(
            df.groupby(group, sort=False).head(k), preserve_index=False
        )

    def shard_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["shard"]).sort_values(by, ascending=asc, kind="stable")
        return g.groupby(group, sort=False).head(k)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(lambda t: _add_shard(t, group, n_shards), batch_format="pyarrow")
        .groupby("shard")
        .map_groups(shard_topk, batch_format="pandas")
    )


def weighted_sample(
    ds: rd.Dataset,
    key: str,
    weight_col: str,
    k: int = 100,
    n_shards: int = 64,
) -> "pd.DataFrame":
    """Deterministic weighted sample without replacement (Efraimidis-
    Spirakis A-ES, 2006): each row draws priority = -ln(u)/w with u a pure
    hash of its key, the k LOWEST priorities win — inclusion probability
    proportional to weight, membership a pure function of the key set (the
    same resume/repartition stability contract as consistent_sample, with
    importance weighting — the mixture-sampling primitive a weighted corpus
    blend needs). Zero/negative weights never win (priority = +inf).

    Same bounded shape as consistent_sample: per-block partial top-k →
    hash-shard top-k → driver merges n_shards×k rows."""
    from .dedup import _add_shard

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column(key).to_numpy(zero_copy_only=False).astype(np.uint64)
        w = t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
        h = (ids * np.uint64(_KNUTH)) % np.uint64(_M32)
        # u in (0,1): (h+1)/(M+1) — never 0 or 1, fully hash-determined
        u = (h.astype(np.float64) + 1.0) / (float(_M32) + 1.0)
        with np.errstate(divide="ignore"):
            pri = np.where(w > 0, -np.log(u) / np.maximum(w, 1e-300), np.inf)
        take = min(k, len(pri))
        idx = np.lexsort((ids, pri))[:take]
        out = t.take(pa.array(idx, pa.int64()))
        return out.append_column("pri", pa.array(pri[idx]))

    def shard_topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["pri", key], kind="stable").head(k)

    tops = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(lambda t: _add_shard(t, key, n_shards), batch_format="pyarrow")
        .groupby("shard")
        .map_groups(shard_topk, batch_format="pandas")
        .to_pandas()
    )
    if tops.empty:
        return pd.DataFrame({key: pd.Series(dtype="int64")})
    tops = tops.sort_values(["pri", key], kind="stable").head(k)
    tops = tops[~np.isinf(tops["pri"])]
    return tops.drop(columns=["pri", "shard"]).reset_index(drop=True)


def leak_safe_split(
    ds: rd.Dataset, train_pct: int = 90, key: str = "doc_id"
) -> rd.Dataset:
    """Contamination-safe train/test split: the split is a pure hash of the
    DOCUMENT FINGERPRINT (md5 of whitespace/case-normalized text), not of
    the row key — so every exact duplicate of a document lands in the SAME
    split and a test document can never leak into train via a trivially
    reformatted copy (the split-level complement of decontaminate). Pure
    map-side, no shuffle, no state; stable under re-runs, resume, and
    repartitioning because membership depends only on the text bytes.
    For NEAR-dup safety, split on the alias/minhash component id instead
    (collapse_alias_docs / minhash groups) — same one-line hash, group key
    swapped."""
    from ..functions import text as T

    def assign(t: pa.Table) -> pa.Table:
        import hashlib

        texts = t.column("text").to_pylist()
        buckets = np.fromiter(
            (
                int(
                    hashlib.md5(T.normalize_text(x or "").encode("utf-8"))
                    .hexdigest()[:8],
                    16,
                )
                % 100
                for x in texts
            ),
            np.int64,
            len(texts),
        )
        split = np.where(buckets < train_pct, "train", "test")
        return pa.table(
            {
                key: t.column(key),
                "split": pa.array(split.astype(object), pa.string()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")
