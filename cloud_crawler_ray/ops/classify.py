"""Distributed text classification: multinomial Naive Bayes over hashed
token features (the "hashing trick", Weinberger et al., ICML'09) — the
fastText/CCNet-style quality & domain classifier step of a training-data
pipeline, trained and applied entirely as Ray Data passes.

Why hashed features: the model is a fixed ``n_classes × n_buckets`` integer
count grid regardless of corpus vocabulary, so at 100 TB the training
shuffle stays bounded (map-side partial counts per batch → one small
groupby whose output is ≤ distinct (class, bucket) pairs ≤ L·B rows) and
the scoring pass broadcasts one dense log-probability matrix (L·B float64,
~0.5 MB/class at B=2^16) via ``ray.put`` — no per-batch re-ship, no
per-token lookups against a driver-side dict.

Determinism (what makes the serial-twin hash check exact): training counts
are integers merged by an exact groupby sum; the model matrix is built once
from those integers by ``nb_model``; scoring sums each document's bucket
log-probs in document token order via ``np.bincount`` over the exploded
batch, so a document's float score is independent of how documents are
batched together — the distributed argmax is bit-identical to the serial
twin's. Token hashing uses ``pd.util.hash_array`` (SipHash with pandas'
fixed default key), deterministic across processes and machines.

Reference analog: the reference has no classifier; this is a target-side
training-data addition (SURVEY §2.12). Tie-break: ``np.argmax`` keeps the
first (lexicographically smallest) class on exact float ties.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from ..functions import text as T

N_BUCKETS = 1 << 16


def hash_buckets(tokens: np.ndarray, n_buckets: int = N_BUCKETS) -> np.ndarray:
    """Deterministic token → feature-bucket ids (int64 in [0, n_buckets))."""
    if len(tokens) == 0:
        return np.empty(0, dtype=np.int64)
    h = pd.util.hash_array(np.asarray(tokens, dtype=object), categorize=False)
    return (h % np.uint64(n_buckets)).astype(np.int64)


def _explode_tokens(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """All tokens of a batch flattened (doc order preserved) + per-doc
    lengths."""
    per_doc = [T.tokenize(t) for t in texts]
    lens = np.array([len(p) for p in per_doc], dtype=np.int64)
    flat = (
        np.concatenate([np.asarray(p, dtype=object) for p in per_doc if p])
        if lens.sum()
        else np.empty(0, dtype=object)
    )
    return flat, lens


def nb_model(
    langs: list[str],
    bucket_counts: dict[tuple[str, int], int],
    label_counts: dict[str, int],
    n_buckets: int = N_BUCKETS,
) -> tuple[np.ndarray, np.ndarray]:
    """Dense (logp [L,B], logprior [L]) from exact integer counts — shared
    by the distributed pipeline and the serial twin so floats are
    bit-identical. Laplace smoothing over the bucket space."""
    L = len(langs)
    counts = np.zeros((L, n_buckets), dtype=np.int64)
    idx = {lang: i for i, lang in enumerate(langs)}
    for (lang, b), c in bucket_counts.items():
        counts[idx[lang], b] = c
    totals = counts.sum(axis=1, dtype=np.int64)
    logp = np.log(counts + 1.0) - np.log(
        (totals + np.int64(n_buckets)).astype(np.float64)
    )[:, None]
    n_docs = sum(label_counts.values())
    prior = np.array([label_counts[lang] for lang in langs], dtype=np.float64)
    logprior = np.log(prior) - np.log(float(n_docs))
    return logp, logprior


def nb_score_batch(
    texts: list[str],
    logp: np.ndarray,
    logprior: np.ndarray,
    n_buckets: int = N_BUCKETS,
) -> np.ndarray:
    """argmax class index per text. Per-document float accumulation order is
    the document's own token order (np.bincount walks the exploded array
    sequentially; other documents hit other bins), so scores do not depend
    on batch boundaries."""
    flat, lens = _explode_tokens(texts)
    n = len(texts)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    buckets = hash_buckets(flat, n_buckets)
    scores = np.tile(logprior, (n, 1))
    for c in range(logp.shape[0]):
        scores[:, c] += np.bincount(doc_idx, weights=logp[c][buckets], minlength=n)
    return np.argmax(scores, axis=1)


def nb_train(
    ds: rd.Dataset,
    label_col: str = "lang",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> tuple[list[str], np.ndarray, np.ndarray]:
    """Train: one map-side partial-count pass → exact (class, bucket)
    groupby sum. Returns (sorted class list, logp, logprior). Driver state
    is the model grid only (≤ L·B rows collected), never the corpus."""
    prior_rows = ds.groupby(label_col).count().take_all()
    label_counts = {r[label_col]: int(r["count()"]) for r in prior_rows}
    langs = sorted(label_counts)
    lang_idx = {lang: i for i, lang in enumerate(langs)}

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        flat, lens = _explode_tokens(df[text_col].tolist())
        li = np.repeat(
            df[label_col].map(lang_idx).to_numpy(dtype=np.int64), lens
        )
        buckets = hash_buckets(flat, n_buckets)
        key = li * np.int64(n_buckets) + buckets
        uniq, cnt = np.unique(key, return_counts=True)
        return pd.DataFrame({"k": uniq, "partial": cnt.astype(np.int64)})

    grid = (
        ds.map_batches(partial, batch_format="pandas", batch_size=2048)
        .groupby("k")
        .aggregate(Sum("partial", alias_name="cnt"))
        .take_all()
    )
    bucket_counts = {
        (langs[int(r["k"]) // n_buckets], int(r["k"]) % n_buckets): int(r["cnt"])
        for r in grid
    }
    logp, logprior = nb_model(langs, bucket_counts, label_counts, n_buckets)
    return langs, logp, logprior


def nb_classify(
    ds: rd.Dataset,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
) -> rd.Dataset:
    """Train on (text, label) then score every document: one broadcast of
    the model matrix, one streaming scoring pass. Output
    (id, label, pred) — pred is the NB argmax class."""
    langs, logp, logprior = nb_train(ds, label_col, text_col, n_buckets)
    model_ref = ray.put((langs, logp, logprior))

    def score(t: pa.Table) -> pa.Table:
        langs_, logp_, logprior_ = ray.get(model_ref)
        texts = [x if x is not None else "" for x in t.column(text_col).to_pylist()]
        pred_idx = nb_score_batch(texts, logp_, logprior_, n_buckets)
        return pa.table(
            {
                id_col: t.column(id_col),
                label_col: t.column(label_col),
                "pred": pa.array([langs_[i] for i in pred_idx], pa.string()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", batch_size=2048)
