"""BPE subword learning + encoding over a documents Dataset.

The classic Sennrich byte-pair-encoding recipe, split the way it actually
scales: the CORPUS-sized work (word frequency counting) is distributed —
per-block partial counts → hash(token) shard combine → per-shard top-k —
while the merge-learning loop runs driver-side over the bounded word-
frequency table (standard practice: BPE trains on the word-freq dict, not
the corpus; at 100 TB the top-V word types cover almost all token mass and
V is a cap, not a hope). Encoding is the reverse shape: the learned merge
ranks broadcast once (ray.put) and an actor-pool stage applies them with a
per-actor word→pieces memo (web text repeats words; the memo turns the
per-word merge loop into a dict hit).

No reference analog (the reference crawler has no tokenizer); this is a
target-side training-data op like ops/lm.py. Determinism: ties in pair
frequency break lexicographically, so the merge list is a pure function of
the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .textstats import tokenize

_EOW = "</w>"  # end-of-word marker (Sennrich)


def word_freqs(docs: rd.Dataset, top_v: int = 50_000) -> pd.DataFrame:
    """Distributed word-frequency table, capped to the top_v most frequent
    types (ties broken lexicographically). Per-block value_counts → one
    hash(token) shuffle → per-shard exact totals + local top-k → driver
    keeps the global top-k of the shard survivors (exact: a shard owns a
    token whole, and the global top-k is a subset of per-shard top-ks)."""
    from .dedup import _add_shard, cluster_shards

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = tokenize(batch["text"]).value_counts()
        return pd.DataFrame({"token": vc.index.astype(str), "n": vc.values})

    n_sh = cluster_shards()

    def shard_topk(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("token", as_index=False)["n"].sum()
        tot = tot.sort_values(["n", "token"], ascending=[False, True], kind="stable")
        return tot.head(top_v)

    out = (
        docs.map_batches(partial, batch_format="pandas", batch_size=4096)
        .map_batches(lambda t: _add_shard(t, "token", n_sh), batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: shard_topk(g.drop(columns=["shard"])), batch_format="pandas"
        )
        .to_pandas()
    )
    out = out.sort_values(["n", "token"], ascending=[False, True], kind="stable")
    out = out.head(top_v).reset_index(drop=True)
    out["n"] = out["n"].astype(np.int64)
    return out


def _pair_counts(pieces: list[tuple[str, ...]], freqs: np.ndarray) -> dict:
    counts: dict[tuple[str, str], int] = {}
    for word, f in zip(pieces, freqs):
        f = int(f)
        for a, b in zip(word, word[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + f
    return counts


def _merge_word(word: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i, n = 0, len(word)
    while i < n:
        if i + 1 < n and word[i] == pair[0] and word[i + 1] == pair[1]:
            out.append(word[i] + word[i + 1])
            i += 2
        else:
            out.append(word[i])
            i += 1
    return tuple(out)


def learn_bpe(
    docs: rd.Dataset, n_merges: int = 64, top_v: int = 50_000
) -> pd.DataFrame:
    """Learn n_merges BPE merges. Returns (rank, left, right) — rank is the
    merge order, 0-based. The distributed stage is word_freqs(); the loop
    below touches only the ≤top_v word-frequency rows."""
    wf = word_freqs(docs, top_v=top_v)
    pieces = [tuple(w) + (_EOW,) for w in wf["token"].tolist()]
    freqs = wf["n"].to_numpy()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts = _pair_counts(pieces, freqs)
        if not counts:
            break
        # deterministic: max count, then lexicographic pair
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        pieces = [
            _merge_word(w, best) if best[0] in w else w for w in pieces
        ]
    return pd.DataFrame(
        {
            "rank": np.arange(len(merges), dtype=np.int64),
            "left": [a for a, _ in merges],
            "right": [b for _, b in merges],
        }
    )


def encode_word(word: str, rank_of: dict) -> tuple[str, ...]:
    """Apply merges to one word by ascending rank (the standard BPE apply
    loop)."""
    w: tuple[str, ...] = tuple(word) + (_EOW,)
    while len(w) > 1:
        ranked = [
            (rank_of.get((a, b)), i)
            for i, (a, b) in enumerate(zip(w, w[1:]))
            if (a, b) in rank_of
        ]
        if not ranked:
            break
        r, _ = min(ranked)
        pair = None
        for i, (a, b) in enumerate(zip(w, w[1:])):
            if rank_of.get((a, b)) == r:
                pair = (a, b)
                break
        w = _merge_word(w, pair)
    return w


class BpeEncoder:
    """Actor-pool stage: merges broadcast once, per-actor word→pieces memo.
    Emits per-doc subword counts (doc_id, n_words, n_pieces)."""

    def __init__(self, merges_ref):
        merges = ray.get(merges_ref)
        self.rank_of = {
            (l, r): int(k)
            for k, l, r in zip(merges["rank"], merges["left"], merges["right"])
        }
        self.memo: dict[str, int] = {}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n_words = np.zeros(len(batch), dtype=np.int64)
        n_pieces = np.zeros(len(batch), dtype=np.int64)
        for row, text in enumerate(batch["text"]):
            toks = [t for t in str(text).lower().split() if t]
            n_words[row] = len(toks)
            total = 0
            for t in toks:
                hit = self.memo.get(t)
                if hit is None:
                    hit = len(encode_word(t, self.rank_of))
                    self.memo[t] = hit
                total += hit
            n_pieces[row] = total
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "n_words": n_words,
                "n_pieces": n_pieces,
            }
        )


def bpe_encode_stats(
    docs: rd.Dataset, merges: pd.DataFrame, concurrency: int = 2
) -> rd.Dataset:
    """Per-doc subword statistics under a learned merge table (broadcast
    once; word-level memo per actor)."""
    merges_ref = ray.put(merges)
    return docs.map_batches(
        BpeEncoder,
        fn_constructor_args=(merges_ref,),
        concurrency=concurrency,
        batch_size=1024,
        batch_format="pandas",
    )
