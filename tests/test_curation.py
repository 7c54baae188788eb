"""Semantics tests for ops/curation.py + doc_frequency with planted cases
(the synthetic documents table has no exact duplicates, so the SQL-parity
check alone never exercises group-collapse behavior)."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from cloud_crawler_ray.ops.curation import (
    contamination_report,
    decontaminate,
    dedup_keep_best,
    repetition_stats,
    stratified_sample,
)
from cloud_crawler_ray.ops.textstats import doc_frequency_topk


def docs_ds(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_decontaminate_drops_overlapping_docs(ray_session):
    eval_text = "alpha beta gamma delta epsilon zeta eta theta iota"
    rows = [
        (0, eval_text),  # eval doc (0 % 50 == 0): always excluded
        (1, "prefix alpha beta gamma delta epsilon zeta eta theta suffix"),
        (2, "completely different words with no overlap at all here okay"),
        (3, "short doc"),  # < 8 tokens: no grams, survives
    ]
    out = decontaminate(docs_ds(rows), n=8, eval_mod=50).to_pandas()
    assert sorted(out["doc_id"]) == [2, 3]


def test_decontaminate_with_separate_eval_table(ray_session):
    """eval_docs given: the modulo rule is off — corpus docs are dropped
    only for gram overlap with the external eval table."""
    ev = docs_ds([(100, "alpha beta gamma delta epsilon zeta eta theta")])
    rows = [
        (0, "unrelated text entirely void of any overlap whatsoever"),
        (1, "x alpha beta gamma delta epsilon zeta eta theta y"),
    ]
    out = decontaminate(docs_ds(rows), n=8, eval_mod=50, eval_docs=ev).to_pandas()
    # doc 0 survives even though 0 % 50 == 0 (no in-corpus holdout rule)
    assert sorted(out["doc_id"]) == [0]


def test_decontaminate_no_eval_docs(ray_session):
    rows = [(1, "a b c d e f g h i"), (2, "j k l m n o p q r")]
    out = decontaminate(docs_ds(rows), n=8, eval_mod=50).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2]


def test_quality_gate_drops_below_percentile_threshold(ray_session):
    from cloud_crawler_ray.ops.curation import quality_gate

    # doc i has i tokens, i = 1..10; q=0.5 -> PERCENTILE_DISC rank
    # ceil(0.5*10)=5 -> threshold 5 -> docs with >= 5 tokens survive
    rows = [(i, " ".join(["w"] * i)) for i in range(1, 11)]
    out = quality_gate(docs_ds(rows), q=0.5).to_pandas()
    assert sorted(out["doc_id"]) == [5, 6, 7, 8, 9, 10]
    assert sorted(out["n_tokens"]) == [5, 6, 7, 8, 9, 10]


def test_contamination_report_names_the_eval_doc(ray_session):
    ev0 = "alpha beta gamma delta epsilon zeta eta theta iota"
    ev50 = "one two three four five six seven eight nine"
    rows = [
        (0, ev0),  # eval docs (doc_id % 50 == 0) never appear on the left
        (50, ev50),
        (1, "prefix alpha beta gamma delta epsilon zeta eta theta suffix"),
        (2, "zz one two three four five six seven eight nine yy"),
        (3, "completely different words with no overlap at all here okay"),
        (4, ev0 + " " + ev50),  # hits BOTH eval docs -> two report rows
    ]
    out = contamination_report(docs_ds(rows), n=8, eval_mod=50).to_pandas()
    got = sorted(map(tuple, out[["doc_id", "eval_doc_id"]].values.tolist()))
    assert got == [(1, 0), (2, 50), (4, 0), (4, 50)]


def test_contamination_report_external_eval_table(ray_session):
    """eval_docs given: the modulo rule is off — doc 0 is reportable."""
    ev = docs_ds([(7, "alpha beta gamma delta epsilon zeta eta theta")])
    rows = [
        (0, "x alpha beta gamma delta epsilon zeta eta theta y"),
        (1, "nothing shared with the benchmark suite in this document text"),
    ]
    out = contamination_report(
        docs_ds(rows), n=8, eval_mod=50, eval_docs=ev
    ).to_pandas()
    got = sorted(map(tuple, out[["doc_id", "eval_doc_id"]].values.tolist()))
    assert got == [(0, 7)]


def test_dedup_keep_best_prefers_longest_then_lowest_id(ray_session):
    rows = [
        (1, "same   text here"),  # normalizes equal to doc 2/3
        (2, "same text here"),
        (3, "SAME TEXT HERE"),
        (4, "another doc entirely with many many more tokens than the rest"),
        (5, "unique short"),
    ]
    out = dedup_keep_best(docs_ds(rows)).to_pandas()
    # 1/2/3 are one group, equal token counts -> lowest doc_id wins
    assert sorted(out["doc_id"]) == [1, 4, 5]

    rows2 = [
        (7, "x y"),
        (8, "x y"),
        (9, "longer x y"),  # different fp — not a dup of 7/8
    ]
    out2 = dedup_keep_best(docs_ds(rows2)).to_pandas()
    assert sorted(out2["doc_id"]) == [7, 9]


def test_stratified_sample_quota_and_determinism(ray_session):
    t = pa.table(
        {
            "doc_id": pa.array(list(range(100)), pa.int64()),
            "lang": pa.array(["en" if i % 2 else "de" for i in range(100)]),
        }
    )
    a = stratified_sample(rd.from_arrow(t), group="lang", k=5).to_pandas()
    b = stratified_sample(rd.from_arrow(t), group="lang", k=5).to_pandas()
    assert a.groupby("lang").size().to_dict() == {"de": 5, "en": 5}
    pd.testing.assert_frame_equal(
        a.sort_values(["lang", "doc_id"]).reset_index(drop=True),
        b.sort_values(["lang", "doc_id"]).reset_index(drop=True),
    )
    # membership is hash-of-key: a subset of the input picks the same rows
    # that survive from the full run restricted to that subset's groups
    small = stratified_sample(
        rd.from_arrow(t.slice(0, 50)), group="lang", k=5
    ).to_pandas()
    assert set(small.columns) == {"lang", "doc_id"}


def test_repetition_stats_counts(ray_session):
    rows = [(1, "a a a b"), (2, "w x y z"), (3, "")]
    out = (
        repetition_stats(docs_ds(rows)).to_pandas().set_index("doc_id")
    )
    assert out.loc[1, "n_tokens"] == 4 and out.loc[1, "n_distinct_tokens"] == 2
    assert out.loc[2, "n_tokens"] == 4 and out.loc[2, "n_distinct_tokens"] == 4
    assert out.loc[3, "n_tokens"] == 0 and out.loc[3, "n_distinct_tokens"] == 0


def test_fuzzy_keep_best_picks_highest_quality_member(ray_session):
    from cloud_crawler_ray.ops.curation import fuzzy_keep_best

    rows = [
        (1, "a b"),
        (2, "a b c d e f"),  # same component as 1 and 3, most tokens -> rep
        (3, "a b c"),
        (9, "solo doc"),
    ]
    pairs = pa.table({"a": pa.array([1, 2], pa.int64()), "b": pa.array([2, 3], pa.int64())})
    out = fuzzy_keep_best(docs_ds(rows), pairs).to_pandas().set_index("doc_id")
    assert out.loc[1, "group_rep"] == 2 and not out.loc[1, "keep"]
    assert out.loc[2, "group_rep"] == 2 and out.loc[2, "keep"]
    assert out.loc[3, "group_rep"] == 2 and not out.loc[3, "keep"]
    assert out.loc[9, "group_rep"] == 9 and out.loc[9, "keep"]


def test_fuzzy_keep_best_tie_breaks_lowest_id(ray_session):
    from cloud_crawler_ray.ops.curation import fuzzy_keep_best

    rows = [(4, "x y z"), (5, "p q r")]  # equal token counts
    pairs = pa.table({"a": pa.array([4], pa.int64()), "b": pa.array([5], pa.int64())})
    out = fuzzy_keep_best(docs_ds(rows), pairs).to_pandas().set_index("doc_id")
    assert out.loc[4, "keep"] and not out.loc[5, "keep"]
    assert set(out["group_rep"]) == {4}


def test_fuzzy_keep_best_empty_pairs(ray_session):
    from cloud_crawler_ray.ops.curation import fuzzy_keep_best

    rows = [(1, "a"), (2, "b")]
    pairs = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    out = fuzzy_keep_best(docs_ds(rows), pairs).to_pandas()
    assert out["keep"].all()


def test_curate_corpus_stages_compose(ray_session):
    from cloud_crawler_ray.ops.curation import curate_corpus

    long = "one two three four five six seven eight nine ten eleven twelve"
    rows = [
        (1, "too short"),  # fails the length gate
        (2, long),  # dup group with 3; same tokens -> lowest id kept
        (3, long.upper()),
        # eval holdout (50 % 50 == 0): excluded from output
        (50, "zeta yota kappa lambda mu nu xi omicron pi rho"),
        # shares the 8-gram "zeta...omicron" with the eval doc -> dropped
        (7, "prefix zeta yota kappa lambda mu nu xi omicron suffix end pad"),
        (8, "ape bee cat dog elk fox gnu hen ibis jay koi lark"),
    ]
    out = curate_corpus(docs_ds(rows)).to_pandas()
    assert sorted(out["doc_id"]) == [2, 8]
    assert set(out.columns) == {"doc_id", "split"}
    assert set(out["split"]) <= {"train", "test"}


def test_pack_sequences_prefix_sum_and_partition_invariance(ray_session):
    from cloud_crawler_ray.ops.curation import pack_sequences

    rows = [(i, " ".join(["tok"] * (3 + i % 7))) for i in range(200)]
    out = pack_sequences(docs_ds(rows), seq_tokens=16).to_pandas()
    assert len(out) == 200
    # offsets are an exclusive prefix sum: sorted by offset, each row's
    # offset equals the previous row's offset + its token count
    out = out.sort_values("tok_offset").reset_index(drop=True)
    assert out.loc[0, "tok_offset"] == 0
    expect = out["tok_offset"] + out["n_tokens"]
    assert (out["tok_offset"].iloc[1:].to_numpy() == expect.iloc[:-1].to_numpy()).all()
    assert (out["seq_id"] == out["tok_offset"] // 16).all()

    # identical assignment from a differently-partitioned input
    re_blocked = docs_ds(rows).repartition(7)
    out2 = (
        pack_sequences(re_blocked, seq_tokens=16)
        .to_pandas()
        .sort_values("tok_offset")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)


def test_pack_sequences_empty(ray_session):
    from cloud_crawler_ray.ops.curation import pack_sequences

    out = pack_sequences(docs_ds([]), seq_tokens=16)
    assert out.count() == 0
    assert out.schema().names == ["doc_id", "n_tokens", "tok_offset", "seq_id"]


def test_doc_frequency_counts_docs_not_occurrences(ray_session):
    rows = [
        (1, "spam spam spam spam eggs"),
        (2, "spam eggs"),
        (3, "eggs"),
    ]
    out = doc_frequency_topk(docs_ds(rows), k=10)
    got = dict(zip(out["token"], out["df"]))
    assert got == {"eggs": 3, "spam": 2}
    # eggs (df 3) must rank above spam (df 2) despite spam's higher tf
    assert list(out["token"]) == ["eggs", "spam"]


def test_merge_changeset_semantics(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from cloud_crawler_ray.ops.curation import merge_changeset

    base = pa.table(
        {
            "k": pa.array([1, 2, 3, 4], pa.int64()),
            "v": pa.array(["a", "b", "c", "d"]),
        }
    )
    changes = pa.table(
        {
            "k": pa.array([2, 3, 9], pa.int64()),
            "v": pa.array(["B", "x", "z"]),
            "op": pa.array(["U", "D", "I"]),
        }
    )
    for parts in (1, 5):
        got = (
            merge_changeset(
                rd.from_arrow(base).repartition(parts),
                rd.from_arrow(changes),
                key="k",
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        expect = pd.DataFrame({"k": [1, 2, 4, 9], "v": ["a", "B", "d", "z"]})
        assert got.equals(expect), got


def test_segment_dedup_naive_parity(ray_session):
    """segment_dedup matches a naive single-process oracle on a corpus with
    planted cross-doc duplicated passages: global first occurrence (lowest
    (doc_id, ord)) survives, later copies drop, tails always survive, and
    the reassembled clean_text preserves within-doc order. Partition-
    invariant."""
    import ray.data as rd

    from cloud_crawler_ray.functions import text as T
    from cloud_crawler_ray.ops.curation import segment_dedup

    K = 4
    boiler = "b " * K  # 4-token segment duplicated across docs
    docs = {
        0: ("alpha beta gamma delta " + boiler + "tail0 x"),
        1: (boiler + "e f g h " + "tail1"),
        2: ("alpha beta gamma delta " + "i j k l"),
        3: "short doc",  # < K tokens of segments: tail only
        4: boiler + boiler.strip(),  # two identical segments in ONE doc
    }
    # naive oracle
    seen: set[str] = set()
    want = {}
    for did in sorted(docs):
        toks = T.tokenize(docs[did])
        nseg = len(toks) // K
        segs = [" ".join(toks[i * K:(i + 1) * K]) for i in range(nseg)]
        kept = []
        n_kept = 0
        for s in segs:
            if s not in seen:
                seen.add(s)
                kept.append(s)
                n_kept += 1
        tail = " ".join(toks[nseg * K:])
        if tail:
            kept.append(tail)
        want[did] = (nseg, n_kept, " ".join(kept))

    t = pa.table(
        {
            "doc_id": pa.array(sorted(docs), pa.int64()),
            "text": pa.array([docs[d] for d in sorted(docs)]),
        }
    )
    for parts in (1, 4):
        out = (
            segment_dedup(rd.from_arrow(t).repartition(parts), seg_tokens=K)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["doc_id"].tolist() == sorted(docs)
        for _, r in out.iterrows():
            ns, nk, ct = want[r["doc_id"]]
            assert r["n_segs"] == ns, (r["doc_id"], r["n_segs"], ns)
            assert r["n_kept"] == nk, (r["doc_id"], r["n_kept"], nk)
            assert r["clean_text"] == ct, (r["doc_id"], r["clean_text"], ct)


def test_redact_pii_planted(ray_session):
    """Planted PII of every class is replaced and counted; clean rows pass
    through untouched with zero counts; counts measure the ORIGINAL text."""
    import ray.data as rd

    from cloud_crawler_ray.ops.curation import redact_pii

    ds = rd.from_items(
        [
            {"doc_id": 1, "text": "mail bob.smith+x@sub.example.org now"},
            {"doc_id": 2, "text": "server at 192.168.1.254 and 10.0.0.1"},
            {"doc_id": 3, "text": "call 555-123-4567 twice 555-123-4567"},
            {"doc_id": 4, "text": "no pii here at all"},
            {"doc_id": 5, "text": "a@b.io via 1.2.3.4 tel 111-222-3333"},
        ]
    )
    out = redact_pii(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.loc[0, "clean_text"] == "mail <EMAIL> now"
    assert out.loc[0, ["n_email", "n_ip", "n_phone"]].tolist() == [1, 0, 0]
    assert out.loc[1, "clean_text"] == "server at <IP> and <IP>"
    assert out.loc[1, "n_ip"] == 2
    assert out.loc[2, "clean_text"] == "call <PHONE> twice <PHONE>"
    assert out.loc[2, "n_phone"] == 2
    assert out.loc[3, "clean_text"] == "no pii here at all"
    assert out.loc[3, ["n_email", "n_ip", "n_phone"]].sum() == 0
    assert out.loc[4, "clean_text"] == "<EMAIL> via <IP> tel <PHONE>"
    assert out.loc[4, ["n_email", "n_ip", "n_phone"]].tolist() == [1, 1, 1]
