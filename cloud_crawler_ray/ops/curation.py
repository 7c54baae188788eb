"""Corpus-curation operators for training-data pipelines: benchmark
decontamination, quality-ranked dedup, per-group stratified sampling, and
type-token repetition stats.

Scale shapes: decontamination broadcasts the (small-by-definition) eval-set
n-gram hashes once and filters map-side; keep-best dedup is the exact_dedup
hash-partition with a quality-ranked winner instead of first-id; stratified
sampling is per-block partial top-k per stratum → one shard per stratum
hash → shard-local final top-k, so the driver never sees more than
n_strata x k rows; repetition stats are pure map-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions import text as T
from .dedup import _add_shard, _shingle_hash_one
from .sampling import _KNUTH, _M32

# polynomial multiplier for combining token hashes into an n-gram hash
# (odd constant → bijective step mod 2^64; any fixed mixer works since both
# the eval side and the corpus side use the same function)
_GRAM_MULT = np.uint64(0x9E3779B97F4A7C15)


def _doc_gram_hashes(text: str, n: int) -> np.ndarray:
    """uint64 hash per token n-gram of ``text`` (shared tokenizer). Token
    hashes are memoized blake2b-64; windows combine them polynomially with
    numpy sliding windows — no per-gram string building or hashing."""
    toks = T.tokenize(text)
    if len(toks) < n:
        return np.empty(0, dtype=np.uint64)
    th = np.fromiter(
        (_shingle_hash_one(t) for t in toks), dtype=np.uint64, count=len(toks)
    )
    win = np.lib.stride_tricks.sliding_window_view(th, n)
    pows = _GRAM_MULT ** np.arange(n, dtype=np.uint64)
    return (win * pows).sum(axis=1, dtype=np.uint64)


def decontaminate(
    ds: rd.Dataset, n: int = 8, eval_mod: int = 50,
    eval_docs: rd.Dataset | None = None,
) -> rd.Dataset:
    """Drop every non-eval document sharing at least one token ``n``-gram
    with the eval holdout — the standard train-set decontamination step
    before pretraining. The holdout is ``eval_docs`` when given (the
    realistic case: benchmarks live in their own table), else the rows of
    ``ds`` with doc_id % eval_mod == 0 (the SQL-checkable in-corpus form;
    note this derivation scans ``ds`` twice — pass eval_docs or a
    materialized input when the upstream chain is expensive).

    The eval side is a benchmark suite: small by definition (10^2-10^5
    docs even when the corpus is 100 TB), so its distinct gram hashes are
    collected once, sorted, and broadcast via ray.put; the corpus pass is
    a map-side filter doing one vectorized searchsorted per document.
    Docs shorter than n tokens carry no grams and always survive."""
    def eval_grams(t: pa.Table) -> pa.Table:
        if eval_docs is None:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            t = t.filter(pa.array(ids % eval_mod == 0))
        out: list[np.ndarray] = [np.empty(0, dtype=np.uint64)]
        for txt in t.column("text").to_pylist():
            out.append(_doc_gram_hashes(txt, n))
        g = np.unique(np.concatenate(out))
        return pa.table({"g": pa.array(g.astype(np.int64), pa.int64())})

    eval_src = ds if eval_docs is None else eval_docs
    eval_ds = eval_src.map_batches(eval_grams, batch_format="pyarrow")
    parts = [b["g"].to_numpy().astype(np.uint64)
             for b in eval_ds.iter_batches(batch_format="pandas")]
    grams = np.unique(np.concatenate(parts)) if parts else np.empty(0, np.uint64)
    grams_ref = ray.put(grams)

    exclude_by_mod = eval_docs is None

    def keep_clean(t: pa.Table) -> pa.Table:
        ref = ray.get(grams_ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        keep = np.ones(len(t), dtype=bool)
        for i, (did, txt) in enumerate(zip(ids, t.column("text").to_pylist())):
            if exclude_by_mod and did % eval_mod == 0:
                keep[i] = False
                continue
            gh = _doc_gram_hashes(txt, n)
            if len(gh) and len(ref):
                pos = np.searchsorted(ref, gh)
                pos[pos == len(ref)] = 0
                if (ref[pos] == gh).any():
                    keep[i] = False
        return t.filter(pa.array(keep)).select(["doc_id"])

    return ds.map_batches(keep_clean, batch_format="pyarrow", batch_size=4096)


def contamination_report(
    ds: rd.Dataset, n: int = 8, eval_mod: int = 50,
    eval_docs: rd.Dataset | None = None,
) -> rd.Dataset:
    """Distinct (doc_id, eval_doc_id) pairs where a non-eval document
    shares at least one token n-gram with that eval document — the audit
    companion to decontaminate (what got dropped, and which benchmark
    caused it). Same broadcast shape: the (gram hash → eval doc) table is
    eval-sized; the corpus pass is map-side searchsorted range lookups."""

    def eval_pairs(t: pa.Table) -> pa.Table:
        if eval_docs is None:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            t = t.filter(pa.array(ids % eval_mod == 0))
        gs, es = [np.empty(0, np.uint64)], [np.empty(0, np.int64)]
        for did, txt in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            gh = np.unique(_doc_gram_hashes(txt, n))
            gs.append(gh)
            es.append(np.full(len(gh), did, dtype=np.int64))
        return pa.table(
            {
                "g": pa.array(np.concatenate(gs).astype(np.int64), pa.int64()),
                "eval_doc_id": pa.array(np.concatenate(es), pa.int64()),
            }
        )

    eval_src = ds if eval_docs is None else eval_docs
    parts = [
        b for b in eval_src.map_batches(eval_pairs, batch_format="pyarrow")
        .iter_batches(batch_format="pandas")
    ]
    if parts:
        ev = pd.concat(parts, ignore_index=True).drop_duplicates()
        order = np.argsort(ev["g"].to_numpy().astype(np.uint64), kind="stable")
        g_sorted = ev["g"].to_numpy().astype(np.uint64)[order]
        e_sorted = ev["eval_doc_id"].to_numpy()[order]
    else:
        g_sorted = np.empty(0, np.uint64)
        e_sorted = np.empty(0, np.int64)
    ref = ray.put((g_sorted, e_sorted))
    exclude_by_mod = eval_docs is None

    def report(t: pa.Table) -> pa.Table:
        gs, es = ray.get(ref)
        out_doc, out_eval = [], []
        for did, txt in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            if exclude_by_mod and did % eval_mod == 0:
                continue
            gh = np.unique(_doc_gram_hashes(txt, n))
            if not len(gh) or not len(gs):
                continue
            lo = np.searchsorted(gs, gh, side="left")
            hi = np.searchsorted(gs, gh, side="right")
            hits = hi > lo
            if not hits.any():
                continue
            evs = np.unique(
                np.concatenate([es[a:b] for a, b in zip(lo[hits], hi[hits])])
            )
            out_doc.extend([did] * len(evs))
            out_eval.extend(evs.tolist())
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "eval_doc_id": pa.array(out_eval, pa.int64()),
            }
        )

    return ds.map_batches(report, batch_format="pyarrow", batch_size=4096)


def quality_gate(ds: rd.Dataset, q: float = 0.10) -> rd.Dataset:
    """Drop the bottom-``q`` tail of documents by token count — the
    data-driven length gate (vs curate_corpus's fixed min_tokens). The
    threshold is the exact PERCENTILE_DISC quantile from the bounded
    histogram pass (ops/textstats.py token_count_quantiles), carried to the
    filter as one scalar; the filter itself is map-side. Two passes over
    ``ds`` are inherent to threshold-from-data filters — pass a
    materialized Dataset when the upstream chain is expensive. Rows AT the
    threshold survive (>=, the PERCENTILE_DISC convention)."""
    import pyarrow.compute as pc

    from .textstats import token_count_quantiles, token_counts

    qt = token_count_quantiles(ds, qs=(q,))
    thr = int(qt["n_tokens_q"].iloc[0]) if len(qt) else 0

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("n_tokens"), thr))

    return token_counts(ds).map_batches(keep, batch_format="pyarrow")



def dedup_keep_best(
    ds: rd.Dataset, payload: tuple[str, ...] = ()
) -> rd.Dataset:
    """Exact dedup keeping the highest-quality member per duplicate group
    (most tokens, ties to the lowest doc_id) instead of the first id — the
    representative-selection variant used when duplicate pages differ in
    completeness. Same hash-partition shape as exact_dedup. ``payload``
    columns of the winning row ride along (e.g. text for a downstream
    decontamination pass)."""
    out_cols = ["doc_id", *payload]

    def add_keys(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        fps = [T.fingerprint(x) for x in texts]
        ntok = [T.token_count(x) for x in texts]
        return (
            t.append_column("fp", pa.array(fps, pa.string()))
            .append_column("n_tokens", pa.array(ntok, pa.int64()))
        )

    def best_per_fp(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["fp", "n_tokens", "doc_id"], ascending=[True, False, True],
            kind="stable",
        )
        return g.drop_duplicates("fp", keep="first")[out_cols]

    keyed = ds.map_batches(add_keys, batch_format="pyarrow", batch_size=8192)
    sharded = keyed.map_batches(lambda t: _add_shard(t, "fp"), batch_format="pyarrow")
    return sharded.groupby("shard").map_groups(best_per_fp, batch_format="pandas")


def stratified_sample(
    ds: rd.Dataset, group: str = "lang", key: str = "doc_id", k: int = 20
) -> rd.Dataset:
    """Deterministic per-stratum sample: within each ``group`` value keep
    the k rows with the smallest multiplicative hash of ``key`` (ties by
    key) — per-language / per-source quota sampling with the same
    pure-function-of-the-keys stability as consistent_sample.

    Per-block partial top-k per stratum bounds the shuffle at
    strata_per_block x k rows per block; strata then hash-shard so the
    final top-k is shard-local (a stratum never spans shards)."""

    def partial(t: pa.Table) -> pa.Table:
        df = t.select([group, key]).to_pandas()
        ids = df[key].to_numpy().astype(np.uint64)
        df["h"] = ((ids * np.uint64(_KNUTH)) % np.uint64(_M32)).astype(np.int64)
        df = df.sort_values(["h", key], kind="stable")
        return pa.Table.from_pandas(
            df.groupby(group, sort=False).head(k), preserve_index=False
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", key], kind="stable")
        return g.groupby(group, sort=False).head(k)[[group, key]]

    parts = ds.map_batches(partial, batch_format="pyarrow")
    sharded = parts.map_batches(lambda t: _add_shard(t, group), batch_format="pyarrow")
    return sharded.groupby("shard").map_groups(final, batch_format="pandas")


def fuzzy_keep_best(
    docs: rd.Dataset, pairs: pa.Table, driver_pair_cap: int = 1_000_000
) -> rd.Dataset:
    """(doc_id, group_rep, keep) like dedup_groups, but the representative
    of each near-duplicate component is its highest-quality member (most
    tokens, ties to lowest doc_id) instead of the smallest id — "keep the
    best copy" fuzzy dedup.

    Only docs that appear in the confirmed pair graph need a quality
    score: they are semi-joined out of the corpus map-side (broadcast id
    set), so the collected (id, n_tokens) table is bounded by the pair
    graph, never the corpus — the same bound dedup_groups already accepts
    for its component labels."""
    from .dedup import _components_driver, _components_label_prop

    if pairs.num_rows <= driver_pair_cap:
        labels = _components_driver(pairs)
    else:
        labels = _components_label_prop(pairs)
    in_graph = np.unique(
        np.concatenate(
            [
                pairs.column("a").to_numpy(zero_copy_only=False),
                pairs.column("b").to_numpy(zero_copy_only=False),
            ]
        )
    ) if pairs.num_rows else np.empty(0, dtype=np.int64)
    ids_ref = ray.put(in_graph)

    def graph_quality(t: pa.Table) -> pa.Table:
        member_ids = ray.get(ids_ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(member_ids, ids)
        pos[pos == len(member_ids)] = 0
        mask = (member_ids[pos] == ids) if len(member_ids) else np.zeros(len(ids), bool)
        t = t.filter(pa.array(mask))
        ntok = [T.token_count(x) for x in t.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pa.array(ntok, pa.int64()),
            }
        )

    q = docs.map_batches(graph_quality, batch_format="pyarrow").to_pandas()
    if q.empty:  # no pairs -> every doc is its own representative
        winners: dict = {}
    else:
        # best member per component: max tokens, ties to lowest id
        q["rep"] = q["doc_id"].map(lambda d: labels.get(d, d))
        q = q.sort_values(
            ["rep", "n_tokens", "doc_id"], ascending=[True, False, True]
        )
        w = q.drop_duplicates("rep")
        winners = dict(zip(w["rep"], w["doc_id"]))
    from .dedup import _attach_labels, _label_lookup_ref

    best = {d: winners.get(r, r) for d, r in labels.items()}
    best_ref, as_arrays = _label_lookup_ref(best)

    def attach(t: pa.Table) -> pa.Table:
        return _attach_labels(t, ray.get(best_ref), as_arrays)

    return docs.select_columns(["doc_id"]).map_batches(attach, batch_format="pyarrow")


def curate_corpus(
    ds: rd.Dataset,
    min_tokens: int = 10,
    n: int = 8,
    eval_mod: int = 50,
    train_pct: int = 90,
) -> rd.Dataset:
    """The composed end-to-end curation pipeline a pretraining corpus runs
    through: length gate → exact keep-best dedup → benchmark
    decontamination → deterministic train/test split. Every stage streams;
    the only driver-held state is the eval-set gram hashes (small by
    definition). Output: (doc_id, split) for the surviving docs."""
    from .sampling import train_test_split

    def length_gate(t: pa.Table) -> pa.Table:
        ntok = np.fromiter(
            (T.token_count(x) for x in t.column("text").to_pylist()),
            dtype=np.int64,
            count=len(t),
        )
        return t.filter(pa.array(ntok >= min_tokens)).select(["doc_id", "text"])

    gated = ds.map_batches(length_gate, batch_format="pyarrow", batch_size=8192)
    # materialized: decontaminate consumes its input twice (eval-gram pass +
    # filter pass) and Datasets are lazy — without this the gate+dedup chain
    # would re-execute end-to-end for the second pass
    deduped = dedup_keep_best(gated, payload=("text",)).materialize()
    clean = decontaminate(deduped, n=n, eval_mod=eval_mod)
    return train_test_split(clean, key="doc_id", train_pct=train_pct)


@ray.remote(num_cpus=0.25)
def _block_token_sum(block: pa.Table) -> int:
    s = pa.compute.sum(block.column("n_tokens")).as_py()
    return int(s or 0)


@ray.remote(num_cpus=0.5)
def _stamp_pack(block: pa.Table, start: int, seq_tokens: int) -> pa.Table:
    n = block.column("n_tokens").to_numpy(zero_copy_only=False)
    off = start + np.concatenate([[0], np.cumsum(n[:-1])]) if len(n) else np.empty(0, np.int64)
    off = off.astype(np.int64)
    if "h" in block.column_names:  # the sort key — internal only
        block = block.drop_columns(["h"])
    return (
        block
        .append_column("tok_offset", pa.array(off))
        .append_column("seq_id", pa.array(off // seq_tokens))
    )


def prefix_stamp(
    ordered: rd.Dataset, seq_tokens: int, empty_schema: pa.Schema
) -> rd.Dataset:
    """Shared distributed-prefix-sum scaffolding for the packing ops: given
    a MATERIALIZED Dataset in final order carrying an ``n_tokens`` column,
    stamp each row's exclusive token offset and seq_id. Per-block sums cross
    the cluster as one int each, the driver prefix-sums O(#blocks) ints, a
    small Ray task per block stamps (dropping the internal ``h`` sort key).
    Empty sort partitions carry no schema and are skipped; an empty corpus
    returns *empty_schema*."""
    refs = []
    for bundle in ordered.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            if meta.num_rows == 0:
                continue  # empty sort partitions carry no schema
            refs.append(ref)
    sums = ray.get([_block_token_sum.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]]) if sums else []
    new_refs = [
        _stamp_pack.remote(r, int(o), seq_tokens) for r, o in zip(refs, offsets)
    ]
    if not new_refs:
        return rd.from_arrow(empty_schema.empty_table())
    return rd.from_arrow_refs(new_refs)


def pack_sequences(ds: rd.Dataset, seq_tokens: int = 1024) -> rd.Dataset:
    """Assign every document its token offset and training-sequence id in a
    deterministic shuffled order (multiplicative doc_id hash, ties by id) —
    the packing step that turns a curated corpus into fixed-token-budget
    pretraining sequences.

    Distributed prefix sum in the zip_with_index shape: sort by the hash
    order, per-block token sums (one int per block crosses the cluster),
    driver prefix-sums O(#blocks) ints, a small Ray task per block stamps
    exclusive offsets. seq_id = tok_offset // seq_tokens, so a sequence may
    span a doc boundary mid-block and the assignment is identical however
    the corpus was partitioned."""

    def keys(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(_KNUTH)) % np.uint64(_M32)
        ntok = np.fromiter(
            (T.token_count(x) for x in t.column("text").to_pylist()),
            dtype=np.int64,
            count=len(t),
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pa.array(ntok),
                "h": pa.array(h.astype(np.int64)),
            }
        )

    keyed = ds.map_batches(keys, batch_format="pyarrow", batch_size=8192)
    ordered = keyed.sort(["h", "doc_id"]).materialize()
    empty_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("tok_offset", pa.int64()),
            ("seq_id", pa.int64()),
        ]
    )
    return prefix_stamp(ordered, seq_tokens, empty_schema)


def repetition_stats(ds: rd.Dataset) -> rd.Dataset:
    """Per-document type-token counts (total vs distinct tokens) — the
    repetition / diversity signal quality filters threshold on (a doc whose
    distinct count collapses relative to its length is boilerplate or
    degenerate repetition). Pure map-side; thresholding is the caller's
    one-line filter so the exact counts stay SQL-checkable."""

    def fn(t: pa.Table) -> pa.Table:
        ids, ntok, ndis = [], [], []
        for did, txt in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            toks = T.tokenize(txt)
            ids.append(did)
            ntok.append(len(toks))
            ndis.append(len(set(toks)))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(ntok, pa.int64()),
                "n_distinct_tokens": pa.array(ndis, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=8192)


def merge_changeset(
    base: rd.Dataset,
    changes: rd.Dataset,
    key: str,
    n_shards: int | None = None,
) -> rd.Dataset:
    """Apply a CDC changeset to a base table (the MERGE / upsert primitive a
    continually-refreshed corpus needs). ``changes`` carries an ``op``
    column: 'U' replaces the base row with the change row's payload, 'D'
    drops the base row, 'I' inserts a new row. Payload columns must match
    ``base``'s schema (minus ``op``). Last-writer-wins within the changeset
    is not defined — callers pre-dedup changes per key (one op per key),
    which is asserted per shard.

    Shape: one hash(key) shuffle co-locates each key's base row and its
    change; the per-shard apply is three vectorized isin masks + a concat.
    The base table never leaves its shards more than once, and no side
    materializes on the driver — at 100 TB this is the seen-set commit
    pattern (state sharded by key, delta merged shard-locally) applied to
    full rows."""
    from .dedup import _add_shard, cluster_shards

    n_sh = n_shards or cluster_shards()
    cols = [c for c in base.schema().names]

    def tag_base(t: pa.Table) -> pa.Table:
        return t.select(cols).append_column("op", pa.array([""] * t.num_rows))

    def tag_change(t: pa.Table) -> pa.Table:
        return t.select(cols + ["op"])

    both = base.map_batches(tag_base, batch_format="pyarrow").union(
        changes.map_batches(tag_change, batch_format="pyarrow")
    )

    def apply_shard(g: pd.DataFrame) -> pd.DataFrame:
        ch = g[g["op"] != ""]
        assert not ch[key].duplicated().any(), "one change op per key"
        b = g[g["op"] == ""]
        gone = ch.loc[ch["op"].isin(["U", "D"]), key]
        kept = b[~b[key].isin(gone)]
        added = ch[ch["op"].isin(["U", "I"])]
        return pd.concat([kept, added], ignore_index=True)[cols]

    return (
        both.map_batches(lambda t: _add_shard(t, key, n_sh), batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: apply_shard(g.drop(columns=["shard"])), batch_format="pandas"
        )
    )


def segment_dedup(ds: rd.Dataset, seg_tokens: int = 16) -> rd.Dataset:
    """Corpus-level duplicated-passage removal (the RefinedWeb / CCNet
    line-dedup step, at token-segment grain because this corpus has no
    newline structure): split each document into consecutive
    non-overlapping ``seg_tokens``-token segments, keep only the globally
    FIRST occurrence of each distinct segment (first = lowest
    (doc_id, ordinal)), and reassemble each document from its surviving
    segments plus the (<seg_tokens)-token tail, which never enters the
    dedup. Output: one row per doc — doc_id, n_segs, n_kept, clean_text.

    Shape: two corpus-volume shuffles, no driver state. Segment rows
    shuffle keyed by the segment STRING (hash-sharded) so the winner rule
    is exact under the same semantics the SQL oracle uses; at 100 TB the
    key would be a 128-bit content hash (collision odds ~n²/2^129) so
    only fixed-width rows cross the wire — same trade documented at
    substring_dup_pairs. Winner resolution is a per-shard vectorized
    sort + first-of-run mask; reassembly is a per-doc-shard string join
    bounded by the docs in that shard."""
    from .dedup import _add_shard, cluster_shards

    n_sh = cluster_shards()

    def to_segments(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        docs, ords, segs, tails = [], [], [], []
        for did, txt in zip(ids, t.column("text").to_pylist()):
            toks = T.tokenize(txt)
            nseg = len(toks) // seg_tokens
            for i in range(nseg):
                docs.append(did)
                ords.append(i)
                segs.append(" ".join(toks[i * seg_tokens : (i + 1) * seg_tokens]))
                tails.append(None)
            # tail row: always kept, never a dedup participant (ord sorts last)
            docs.append(did)
            ords.append(nseg)
            segs.append(None)
            tails.append(" ".join(toks[nseg * seg_tokens :]))
        return pa.table(
            {
                "doc_id": pa.array(docs, pa.int64()),
                "ord": pa.array(ords, pa.int64()),
                "seg": pa.array(segs, pa.string()),
                "tail": pa.array(tails, pa.string()),
            }
        )

    import pyarrow.compute as pc

    _row_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("ord", pa.int64()),
            ("seg", pa.string()),
            ("tail", pa.string()),
            ("keep", pa.bool_()),
        ]
    )

    rows = ds.map_batches(to_segments, batch_format="pyarrow")
    seg_rows = rows.map_batches(
        lambda t: t.filter(pc.is_valid(t.column("seg"))), batch_format="pyarrow"
    )
    tail_rows = rows.map_batches(
        lambda t: t.filter(pc.is_valid(t.column("tail"))), batch_format="pyarrow"
    )

    def resolve(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["seg", "doc_id", "ord"], kind="mergesort")
        first = ~g["seg"].duplicated()
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
                "ord": pa.array(g["ord"].to_numpy(), pa.int64()),
                "seg": pa.array(g["seg"], pa.string()),
                "tail": pa.nulls(len(g), pa.string()),
                "keep": pa.array(first.to_numpy(), pa.bool_()),
            },
            schema=_row_schema,
        )

    flagged = (
        seg_rows.map_batches(
            lambda t: _add_shard(t, "seg", n_sh), batch_format="pyarrow"
        )
        .groupby("shard")
        .map_groups(
            lambda g: resolve(g.drop(columns=["shard"])), batch_format="pandas"
        )
    )

    def tag_tail(t: pa.Table) -> pa.Table:
        return t.append_column("keep", pa.array(np.ones(t.num_rows, dtype=bool)))

    everything = flagged.union(
        tail_rows.map_batches(tag_tail, batch_format="pyarrow")
    )

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "ord"], kind="mergesort")
        is_seg = g["seg"].notna()
        piece = g["seg"].where(is_seg, g["tail"])
        kept = g[g["keep"] & (piece != "").to_numpy()]
        kp = piece[g["keep"].to_numpy() & (piece != "").to_numpy()]
        agg = pd.DataFrame({"doc_id": kept["doc_id"].to_numpy(), "p": kp.to_numpy()})
        joined = agg.groupby("doc_id", sort=True)["p"].agg(" ".join)
        segs_per_doc = g[is_seg].groupby("doc_id")["ord"].size()
        kept_per_doc = g[is_seg & g["keep"]].groupby("doc_id")["ord"].size()
        all_ids = g["doc_id"].drop_duplicates().sort_values()
        return pd.DataFrame(
            {
                "doc_id": all_ids.to_numpy().astype(np.int64),
                "n_segs": segs_per_doc.reindex(all_ids).fillna(0).to_numpy().astype(np.int64),
                "n_kept": kept_per_doc.reindex(all_ids).fillna(0).to_numpy().astype(np.int64),
                "clean_text": joined.reindex(all_ids).fillna("").to_numpy(),
            }
        )

    return (
        everything.map_batches(
            lambda t: _add_shard(t, "doc_id", n_sh), batch_format="pyarrow"
        )
        .groupby("shard")
        .map_groups(
            lambda g: reassemble(g.drop(columns=["shard"])), batch_format="pandas"
        )
    )


# ---------------- PII redaction ----------------

# Deliberately RE2-compatible (no lookaround, no backreferences) so the exact
# same patterns run in DuckDB regexp_replace for the SQL oracle. Compiled
# once per worker process at import.
import re as _re

PII_PATTERNS: list[tuple[str, str, str]] = [
    # (class, pattern, replacement) — applied in order; replacements contain
    # no digits, so later patterns cannot re-match inside an earlier token.
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]
_PII_COMPILED = [(name, _re.compile(pat), rep) for name, pat, rep in PII_PATTERNS]


def redact_pii(
    ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> rd.Dataset:
    """Redact emails / IPv4 addresses / phone numbers from a text column —
    the privacy-scrub stage of a training-data pipeline. Pure map-side
    (embarrassingly parallel, no shuffle, no driver state); per-class match
    counts are reported per row so a downstream gate can drop PII-heavy
    documents instead of keeping the scrub silent. Counts are measured on
    the ORIGINAL text; replacements apply in declaration order."""

    def scrub(df: pd.DataFrame) -> pd.DataFrame:
        txt = df[text_col]
        out = {id_col: df[id_col]}
        clean = txt
        for name, rx, rep in _PII_COMPILED:
            out[f"n_{name}"] = txt.str.count(rx).astype(np.int64)
            clean = clean.str.replace(rx, rep, regex=True)
        out["clean_text"] = clean
        cols = [id_col, "clean_text"] + [f"n_{n}" for n, _, _ in _PII_COMPILED]
        return pd.DataFrame(out)[cols]

    return ds.map_batches(scrub, batch_format="pandas")
