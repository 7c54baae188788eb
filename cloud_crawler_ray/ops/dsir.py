"""DSIR-style importance weighting for data selection (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
arXiv:2302.03169 — public method): fit hashed-n-gram bag-of-words models on
a small TARGET corpus and on the RAW corpus, then score every raw document
with the log importance weight

    log w(x) = Σ_f c_f(x) · (log p_target(f) − log p_raw(f))

over its hashed unigram+bigram features. High-weight documents "look like"
the target distribution — the cheap distributional filter a 100-TB
pretraining pipeline runs before expensive model-based scoring.

Scale shape: ONE map pass emits per-block integer count vectors for both
models (a block row is a 2^16-bucket int64 list, ~0.5 MB — the driver sums
B ints per block, never rows); the smoothed log-ratio vector broadcasts
once via ray.put; a second map pass scores every document vectorized. No
shuffle anywhere. Integer counts make the models exact and order-free, so
the distributed fit is bit-identical to the serial twin
(pipelines/serial_twins.py twin_dsir_weights — DuckDB hash-checked); the
per-doc float sum runs over sorted feature ids, pinning the summation
order independent of partitioning.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ..functions import text as T

N_BUCKETS = 1 << 16  # hashed feature space (DSIR uses 10k; 2^16 is cheap)


def doc_feature_ids(text: str, n_buckets: int = N_BUCKETS) -> np.ndarray:
    """Hashed unigram+bigram feature ids of one document, SORTED ascending
    (multiplicity kept) — the pure kernel both the engine and the twin use.
    Sorting pins the per-doc float summation order under any partitioning."""
    toks = T.tokenize(text or "")
    feats = [zlib.crc32(t.encode("utf-8")) % n_buckets for t in toks]
    feats.extend(
        zlib.crc32((a + " " + b).encode("utf-8")) % n_buckets
        for a, b in zip(toks, toks[1:])
    )
    return np.sort(np.asarray(feats, dtype=np.int64))


def count_vector(texts, n_buckets: int = N_BUCKETS) -> np.ndarray:
    """Exact int64 feature-count vector of a text collection."""
    cnt = np.zeros(n_buckets, np.int64)
    for t in texts:
        fids = doc_feature_ids(t, n_buckets)
        if len(fids):
            np.add.at(cnt, fids, 1)
    return cnt


def log_ratio(
    target_cnt: np.ndarray, raw_cnt: np.ndarray, alpha: float = 1.0
) -> np.ndarray:
    """Smoothed log p_target(f) − log p_raw(f), one shared expression so
    twin and engine compute the same float bits."""
    b = len(target_cnt)
    lt = np.log(target_cnt + alpha) - np.log(float(target_cnt.sum()) + alpha * b)
    lr = np.log(raw_cnt + alpha) - np.log(float(raw_cnt.sum()) + alpha * b)
    return lt - lr


def dsir_weights(
    docs: rd.Dataset,
    target_col: str = "lang",
    target_value: str = "en",
    alpha: float = 1.0,
    n_buckets: int = N_BUCKETS,
) -> pd.DataFrame:
    """Importance weight for every document, target = rows where
    ``target_col == target_value``. Returns (doc_id, n_feats, logw) sorted
    by doc_id. The target model fits on the SAME pass as the raw model
    (one block scan emits both partial vectors), so adding DSIR to a
    pipeline costs two map passes total."""
    docs = docs.materialize()

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].tolist()
        raw = count_vector(texts, n_buckets)
        tgt = count_vector(
            [t for t, v in zip(texts, df[target_col]) if v == target_value],
            n_buckets,
        )
        return pd.DataFrame({"which": [0, 1], "cnt": [tgt, raw]})

    parts = docs.map_batches(partials, batch_format="pandas").to_pandas()
    tgt_cnt = np.zeros(n_buckets, np.int64)
    raw_cnt = np.zeros(n_buckets, np.int64)
    for which, cnt in zip(parts["which"], parts["cnt"]):
        if which == 0:
            tgt_cnt += np.asarray(cnt, np.int64)
        else:
            raw_cnt += np.asarray(cnt, np.int64)
    ratio_ref = ray.put(log_ratio(tgt_cnt, raw_cnt, alpha))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        r = ray.get(ratio_ref)
        ids = df["doc_id"].to_numpy().astype(np.int64)
        n_feats = np.zeros(len(ids), np.int64)
        logw = np.zeros(len(ids), np.float64)
        for i, t in enumerate(df["text"]):
            fids = doc_feature_ids(t, n_buckets)
            n_feats[i] = len(fids)
            logw[i] = r[fids].sum()  # sorted fids → pinned sum order
        return pd.DataFrame({"doc_id": ids, "n_feats": n_feats, "logw": logw})

    out = docs.map_batches(score, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)
