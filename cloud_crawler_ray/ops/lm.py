"""Corpus n-gram language-model quality scoring — the CCNet/RefinedWeb-style
perplexity filter: train a small bigram LM on the corpus itself, score every
document by mean token log-probability, threshold downstream (gibberish and
boilerplate-shuffled text score far below natural prose drawn from the same
distribution).

Scale shape: two bounded passes.
  1. TRAIN — per-block partial unigram/bigram counts (local Arrow group_by),
     hash-sharded combine (all counts for a token land in one shard, so
     shard-local totals are globally exact), exact global top-V unigrams /
     top-B bigrams via per-shard top-k + driver merge (top-k under an
     additive count is contained in the union of per-shard top-k). Driver
     and broadcast memory are O(V + B), never O(vocab).
  2. SCORE — the model broadcasts once as sorted numpy arrays (ray.put;
     binary-search lookups, no Python dicts crossing the cluster) and every
     doc scores map-side: add-one-smoothed log P(w_i | w_{i-1}) over the
     capped vocab, OOV mapped to a single UNK id. Per-doc math is local and
     ordered, so scores are bit-identical under any partitioning.

No SQL oracle (two-level top-k + float log-probs are not reasonably
expressible as one DuckDB query); pytest pins exact tiny-corpus counts,
partition invariance, and the natural-vs-shuffled ordering property.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..functions import text as T
from .dedup import _add_shard, cluster_shards


@dataclass
class BigramLM:
    """Sorted-array bigram model (broadcast-friendly: pure numpy)."""

    vocab: np.ndarray        # sorted unicode array, len V
    uni_counts: np.ndarray   # int64, aligned to vocab
    bi_keys: np.ndarray      # sorted uint64 (prev_id << 32 | cur_id), len B
    bi_counts: np.ndarray    # int64, aligned to bi_keys
    n_tokens: int            # total corpus tokens

    @property
    def v(self) -> int:
        return len(self.vocab)

    def token_ids(self, toks: list[str]) -> np.ndarray:
        """Vocab ids; OOV → V (the single UNK id)."""
        if not toks:
            return np.empty(0, dtype=np.int64)
        if self.v == 0:  # empty corpus: everything is UNK
            return np.zeros(len(toks), dtype=np.int64)
        arr = np.asarray(toks, dtype=object)
        pos = np.searchsorted(self.vocab, arr)
        pos = np.clip(pos, 0, self.v - 1)
        hit = self.vocab[pos] == arr
        return np.where(hit, pos, self.v).astype(np.int64)


def _count_partial(t: pa.Table) -> pa.Table:
    """Block → (gram, prev, cur, count) partials for unigrams (prev="") and
    bigrams. Local combine via Arrow group_by keeps the shuffle input at the
    block's distinct-gram count, not its token count."""
    prevs: list[str] = []
    curs: list[str] = []
    for txt in t.column("text").to_pylist():
        txt = txt or ""
        if "\x00" in txt:
            # NUL inside a token would hit pandas' C-string hash truncation
            # in the gram-shard router — scrub to U+FFFD (the engine's
            # UTF-8-scrub policy for crawled text)
            txt = txt.replace("\x00", "�")
        toks = T.tokenize(txt)
        prevs.extend([""] * len(toks))
        curs.extend(toks)
        prevs.extend(toks[:-1])
        curs.extend(toks[1:])
    tt = pa.table(
        {
            "prev": pa.array(prevs, pa.string()),
            "cur": pa.array(curs, pa.string()),
        }
    )
    return tt.group_by(["prev", "cur"]).aggregate([([], "count_all")]).rename_columns(
        ["prev", "cur", "cnt"]
    )


# sentinel key for the per-shard token-total row: (prev=_TOTAL_SENTINEL,
# cur=""). A real token COULD equal the sentinel string (tokenize only
# splits on whitespace), but a real bigram row always has a non-empty cur
# and a real unigram row has prev="" — so the (sentinel, "") KEY is
# unreachable by data and extraction filters on both columns.
_TOTAL_SENTINEL = "\x01total"


def _shard_topk(g, k_uni: int, k_bi: int):
    """Per-shard exact totals (all rows of a (prev, cur) key hash to one
    shard) then local top-k per gram class, ties by token string so the
    global merge is deterministic. A sentinel row carries the shard's FULL
    unigram token total so the corpus denominator stays exact even when the
    vocab cap truncates the unigram list."""
    import pandas as _pd

    tot = g.groupby(["prev", "cur"], as_index=False)["cnt"].sum()
    uni_all = tot[tot["prev"] == ""]
    uni = uni_all.sort_values(
        ["cnt", "cur"], ascending=[False, True], kind="stable"
    ).head(k_uni)
    bi = tot[tot["prev"] != ""].sort_values(
        ["cnt", "prev", "cur"], ascending=[False, True, True], kind="stable"
    ).head(k_bi)
    sent = _pd.DataFrame(
        {"prev": [_TOTAL_SENTINEL], "cur": [""], "cnt": [int(uni_all["cnt"].sum())]}
    )
    return _pd.concat([uni, bi, sent], ignore_index=True)


def train_bigram_lm(
    ds: rd.Dataset, vocab_cap: int = 50_000, bigram_cap: int = 200_000
) -> BigramLM:
    """Exact top-``vocab_cap`` unigram / top-``bigram_cap`` bigram counts
    over *ds*'s ``text`` column. Driver memory O(n_shards × caps) during the
    merge, O(V + B) after."""
    n_sh = cluster_shards()

    def add_shard(t: pa.Table) -> pa.Table:
        # shard by the full gram key so totals are shard-complete. Separator
        # is a SPACE (tokens are whitespace-split, so it cannot appear inside
        # one) — never \x00: pandas' categorizing hasher truncates object
        # keys at NUL, which made identical keys route to different shards
        # depending on block context (see substring_dup_pairs)
        keys = [
            f"{p} {c}"
            for p, c in zip(t.column("prev").to_pylist(), t.column("cur").to_pylist())
        ]
        return _add_shard(
            pa.table(
                {
                    "prev": t.column("prev"),
                    "cur": t.column("cur"),
                    "cnt": t.column("cnt"),
                    "_k": pa.array(keys, pa.string()),
                }
            ),
            "_k",
            n_sh,
        ).drop_columns(["_k"])

    parts = (
        ds.map_batches(_count_partial, batch_format="pyarrow", batch_size=4096)
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: _shard_topk(
                g.drop(columns=["shard"]), vocab_cap, bigram_cap
            ),
            batch_format="pandas",
        )
        .to_pandas()
    )
    is_sentinel = (parts["prev"] == _TOTAL_SENTINEL) & (parts["cur"] == "")
    n_tokens = int(parts[is_sentinel]["cnt"].sum())
    parts = parts[~is_sentinel]
    return _finalize_lm(parts, n_tokens, vocab_cap, bigram_cap)


def _finalize_lm(
    parts, n_tokens: int, vocab_cap: int, bigram_cap: int
) -> BigramLM:
    """Global top-k + array assembly from an exact (prev, cur, cnt) count
    table (unigrams carry prev=""). Pure function of the counts — shared by
    the distributed trainer (per-shard top-k survivors) and the serial
    oracle twin (full exact counts), which agree because a global top-k is
    a subset of the union of per-shard top-ks."""
    uni = parts[parts["prev"] == ""].sort_values(
        ["cnt", "cur"], ascending=[False, True], kind="stable"
    ).head(vocab_cap)
    order = np.argsort(uni["cur"].to_numpy(dtype=object), kind="stable")
    vocab = uni["cur"].to_numpy(dtype=object)[order]
    uni_counts = uni["cnt"].to_numpy(dtype=np.int64)[order]

    lm = BigramLM(
        vocab=vocab,
        uni_counts=uni_counts,
        bi_keys=np.empty(0, np.uint64),
        bi_counts=np.empty(0, np.int64),
        n_tokens=n_tokens,
    )
    bi = parts[parts["prev"] != ""].sort_values(
        ["cnt", "prev", "cur"], ascending=[False, True, True], kind="stable"
    ).head(bigram_cap)
    pid = lm.token_ids(bi["prev"].tolist())
    cid = lm.token_ids(bi["cur"].tolist())
    in_vocab = (pid < lm.v) & (cid < lm.v)
    keys = (pid[in_vocab].astype(np.uint64) << np.uint64(32)) | cid[in_vocab].astype(
        np.uint64
    )
    cnts = bi["cnt"].to_numpy(np.int64)[in_vocab]
    o = np.argsort(keys, kind="stable")
    lm.bi_keys, lm.bi_counts = keys[o], cnts[o]
    return lm


def score_tokens(lm: BigramLM, toks: list[str]) -> float:
    """Mean add-one-smoothed bigram log-probability of one token sequence —
    the per-doc scoring kernel, a pure function of (model, tokens). Shared
    by the distributed score stage and the serial oracle twin
    (pipelines/serial_twins.py) so both produce bit-identical floats."""
    v = lm.v
    if not toks:
        return 0.0
    tid = lm.token_ids(toks)
    if v == 0:
        # degenerate model (empty training corpus): everything is
        # UNK with add-one mass — uniform, no array indexing
        return float(np.log(1.0 / (lm.n_tokens + 1.0)))
    # unigram log P for the first token; bigram for the rest
    u0 = lm.uni_counts[tid[0]] if tid[0] < v else 0
    lp = np.log((u0 + 1.0) / (lm.n_tokens + v + 1.0))
    if len(tid) > 1:
        keys = (tid[:-1].astype(np.uint64) << np.uint64(32)) | tid[1:].astype(
            np.uint64
        )
        pos = np.searchsorted(lm.bi_keys, keys)
        pos = np.clip(pos, 0, max(len(lm.bi_keys) - 1, 0))
        hit = (
            lm.bi_keys[pos] == keys
            if len(lm.bi_keys)
            else np.zeros(len(keys), dtype=bool)
        )
        bc = np.where(hit, lm.bi_counts[pos] if len(lm.bi_counts) else 0, 0)
        prev_u = np.where(
            tid[:-1] < v, lm.uni_counts[np.minimum(tid[:-1], v - 1)], 0
        )
        lp += float(np.log((bc + 1.0) / (prev_u + v + 1.0)).sum())
    return float(lp / len(toks))


def score_documents(ds: rd.Dataset, lm_ref) -> rd.Dataset:
    """Per-doc mean add-one-smoothed bigram log-probability (natural-log).
    ``lm_ref`` is a ``ray.put(BigramLM)`` handle — workers binary-search the
    sorted arrays; no dict ships per task. Output (doc_id, n_tokens,
    lm_logprob); empty docs score 0."""

    def score(t: pa.Table) -> pa.Table:
        lm: BigramLM = ray.get(lm_ref)
        ids_out, ntoks, scores = [], [], []
        for did, txt in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            toks = T.tokenize(txt or "")
            ids_out.append(did)
            ntoks.append(len(toks))
            scores.append(score_tokens(lm, toks))
        return pa.table(
            {
                "doc_id": pa.array(ids_out),
                "n_tokens": pa.array(ntoks, pa.int64()),
                "lm_logprob": pa.array(scores, pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", batch_size=4096)


def lm_quality_score(
    ds: rd.Dataset, vocab_cap: int = 50_000, bigram_cap: int = 200_000
) -> rd.Dataset:
    """Train-on-corpus + score pipeline (the one-call surface). The input
    Dataset is consumed twice (train, score) — pass a materialized Dataset
    or a re-readable source."""
    lm = train_bigram_lm(ds, vocab_cap=vocab_cap, bigram_cap=bigram_cap)
    return score_documents(ds, ray.put(lm))
