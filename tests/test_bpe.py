"""BPE learning/encoding: merge list pinned against a naive corpus-level
reference implementation (no word-freq dict — counts pairs over every word
occurrence), partition invariance, and the broadcast encoder stage."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from cloud_crawler_ray.ops.bpe import (
    _EOW,
    bpe_encode_stats,
    encode_word,
    learn_bpe,
    word_freqs,
)

CORPUS = [
    "low low low low low",
    "lower lower newest",
    "newest newest newest newest newest",
    "widest widest widest low",
]


def _docs(repart: int = 3) -> rd.Dataset:
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(len(CORPUS))), pa.int64()),
            "text": pa.array(CORPUS, pa.string()),
        }
    )
    return rd.from_arrow(tbl).repartition(repart)


def _naive_bpe(corpus: list[str], n_merges: int) -> list[tuple[str, str]]:
    # corpus-level: one symbol list per word OCCURRENCE (frequency falls out
    # of repetition, unlike the dict-based implementation under test)
    words = [list(w) + [_EOW] for line in corpus for w in line.lower().split()]
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w in words:
            for a, b in zip(w, w[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for w in words:
            i = 0
            while i < len(w) - 1:
                if w[i] == best[0] and w[i + 1] == best[1]:
                    w[i : i + 2] = [w[i] + w[i + 1]]
                else:
                    i += 1
    return merges


def test_word_freqs_exact_and_capped(ray_session):
    wf = word_freqs(_docs(), top_v=3)
    assert wf["token"].tolist() == ["low", "newest", "widest"]
    assert wf["n"].tolist() == [6, 6, 3]  # tie low/newest broken by name


def test_learn_bpe_matches_naive_reference(ray_session):
    got = learn_bpe(_docs(), n_merges=12, top_v=100)
    exp = _naive_bpe(CORPUS, 12)
    assert list(zip(got["left"], got["right"])) == exp
    assert got["rank"].tolist() == list(range(len(exp)))


def test_learn_bpe_partition_invariant(ray_session):
    a = learn_bpe(_docs(1), n_merges=8, top_v=100)
    b = learn_bpe(_docs(4), n_merges=8, top_v=100)
    pd.testing.assert_frame_equal(a, b)


def test_encode_stats_memo_matches_direct(ray_session):
    merges = learn_bpe(_docs(), n_merges=8, top_v=100)
    out = (
        bpe_encode_stats(_docs(), merges)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    rank_of = {
        (l, r): int(k)
        for k, l, r in zip(merges["rank"], merges["left"], merges["right"])
    }
    for i, line in enumerate(CORPUS):
        toks = line.lower().split()
        assert out.loc[i, "n_words"] == len(toks)
        assert out.loc[i, "n_pieces"] == sum(
            len(encode_word(t, rank_of)) for t in toks
        )
    # a fully merged frequent word collapses to few pieces
    assert out["n_pieces"].sum() < sum(
        len(w) + 1 for line in CORPUS for w in line.split()
    )
