"""Text-analysis operators over a documents Dataset (doc_id, text, ...).

Each operator is a Ray Data pipeline: vectorized per-batch kernels in
``map_batches`` (pandas string ops / Python kernels over the batch — never
per-row ``ds.map``), partial pre-aggregation before any groupby (the
combiner pattern, reference analog examples/sugary_word_count.rb:49-73).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

from ..functions import text as T


def tokenize(series: pd.Series) -> pd.Series:
    """Whitespace tokenization shared by EVERY token-level operator here and
    in ops/sketches.py — one definition so a tokenizer-parity fix (cf. the
    regex-parity fix history) lands everywhere at once. Must stay in
    lockstep with the oracle's regexp_split_to_array(lower(text), '\\s+')."""
    toks = series.str.lower().str.split(r"\s+", regex=True).explode()
    return toks[toks.notna() & (toks != "")]


def word_count(ds: rd.Dataset) -> rd.Dataset:
    """Global token counts (the word_count DSL example,
    examples/word_count.rb:60-75). Per-batch partial counts shrink the
    shuffle: one (token, partial) row per distinct token per batch."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = tokenize(batch["text"]).value_counts()
        return pd.DataFrame({"token": vc.index.astype(str), "partial": vc.values})

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=4096)
    return partials.groupby("token").aggregate(Sum("partial", alias_name="cnt"))


def token_counts(ds: rd.Dataset) -> rd.Dataset:
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                # #(\S+ runs) == #(non-empty \s+-split tokens), counted at
                # C level instead of a Python loop over token lists
                "n_tokens": batch["text"].str.count(r"\S+").astype(np.int64),
            }
        )

    return ds.map_batches(fn, batch_format="pandas", batch_size=8192)


# BPE-ish pre-tokenization: letter runs, digit runs, and single
# non-alphanumeric marks — the GPT-2-style split shape (runs, not
# whitespace words). Vectorized with pandas' C-level str.count.
# Whitespace is spelled as the explicit ASCII class so the Python engine
# and the DuckDB/RE2 oracle agree on every codepoint (\s is Unicode-aware
# in Python but ASCII-only in RE2: \v and \xa0 would diverge).
_BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\t\n\f\r ]"


def bpe_token_counts(ds: rd.Dataset) -> rd.Dataset:
    """doc_id → number of BPE-ish pre-tokens (the subword-tokenizer cost
    estimate a training-data pipeline budgets by, next to the whitespace
    count in token_counts)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_bpe_tokens": batch["text"]
                .str.lower()
                .str.count(_BPE_RE)
                .astype("int64"),
            }
        )

    return ds.map_batches(fn, batch_format="pandas", batch_size=8192)


def quality_scores(ds: rd.Dataset) -> rd.Dataset:
    """Per-doc quality counts (lengths, stopwords, punctuation, alpha chars).
    Integer counts so the DuckDB oracle hash-matches exactly."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        rows = [T.quality_counts(t) for t in texts]
        return pa.table(
            {
                "doc_id": pa.array(ids, batch.schema.field("doc_id").type),
                "n_chars": pa.array([r["n_chars"] for r in rows], pa.int64()),
                "n_tokens": pa.array([r["n_tokens"] for r in rows], pa.int64()),
                "n_stopwords": pa.array([r["n_stopwords"] for r in rows], pa.int64()),
                "n_punct": pa.array([r["n_punct"] for r in rows], pa.int64()),
                "n_alpha": pa.array([r["n_alpha"] for r in rows], pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=8192)


class LangId:
    """Language-ID as a callable class → actor pool: marker sets and the CJK
    regex are compiled once per actor (trivial here, but this is the stated
    pattern for model-loading stages)."""

    def __init__(self):
        self.markers = T.LANG_MARKERS

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        langs = [T.lang_id(t) for t in texts]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(langs, pa.string()),
            }
        )


def lang_id(ds: rd.Dataset, concurrency: int = 2) -> rd.Dataset:
    return ds.map_batches(
        LangId, batch_format="pyarrow", batch_size=8192, concurrency=concurrency
    )


def fingerprints(ds: rd.Dataset) -> rd.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "fp": pa.array([T.fingerprint(t) for t in texts], pa.string()),
                "rolling_fp": pa.array(
                    [T.rolling_fingerprint(t) for t in texts], pa.int64()
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=8192)


def vocab_topk(ds: rd.Dataset, k: int = 50, n_shards: int = 64) -> pd.DataFrame:
    """Corpus-wide top-k vocabulary (token, cnt), ties broken by token asc —
    the vocabulary-building pass of a tokenizer-training pipeline.

    Per-batch value_counts shrink each block to one (token, partial) row per
    distinct token, then tokens hash-shard so every token's partials meet in
    exactly one shard; each shard totals locally and forwards only its own
    top-k, so the driver merges n_shards * k rows no matter the corpus size
    (a global top-k element is by definition in its shard's top-k)."""
    from .dedup import _add_shard

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = tokenize(batch["text"]).value_counts()
        return pd.DataFrame({"token": vc.index.astype(str), "partial": vc.values})

    partials = ds.map_batches(
        partial, batch_format="pandas", batch_size=4096
    ).map_batches(lambda t: _add_shard(t, "token", n_shards), batch_format="pyarrow")

    def shard_topk(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("token", as_index=False)["partial"].sum()
        tot = tot.sort_values(
            ["partial", "token"], ascending=[False, True], kind="stable"
        ).head(k)
        return tot.rename(columns={"partial": "cnt"})

    tops = (
        partials.groupby("shard")
        .map_groups(shard_topk, batch_format="pandas")
        .to_pandas()
    )
    if tops.empty:  # empty corpus: to_pandas() loses even the columns
        return pd.DataFrame({"token": pd.Series(dtype=str), "cnt": pd.Series(dtype="int64")})
    tops = tops.sort_values(
        ["cnt", "token"], ascending=[False, True], kind="stable"
    ).head(k)
    tops["cnt"] = tops["cnt"].astype("int64")
    return tops[["token", "cnt"]].reset_index(drop=True)


def doc_frequency_topk(
    ds: rd.Dataset, k: int = 50, n_shards: int = 64
) -> pd.DataFrame:
    """Top-k tokens by DOCUMENT frequency (how many docs contain the token,
    not how often it occurs) — the df side of tf-idf and the stopword-
    discovery pass of corpus analysis. Same bounded shape as vocab_topk;
    the per-batch partial is exact because a document is one row, so
    per-(doc, token) distinctness never spans blocks."""
    from .dedup import _add_shard

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = tokenize(batch["text"])
        # one (doc, token) pair per doc — the explode index is the source row
        pairs = pd.DataFrame({"row": toks.index, "token": toks.values})
        vc = pairs.drop_duplicates()["token"].value_counts()
        return pd.DataFrame({"token": vc.index.astype(str), "partial": vc.values})

    partials = ds.map_batches(
        partial, batch_format="pandas", batch_size=4096
    ).map_batches(lambda t: _add_shard(t, "token", n_shards), batch_format="pyarrow")

    def shard_topk(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("token", as_index=False)["partial"].sum()
        tot = tot.sort_values(
            ["partial", "token"], ascending=[False, True], kind="stable"
        ).head(k)
        return tot.rename(columns={"partial": "df"})

    tops = (
        partials.groupby("shard")
        .map_groups(shard_topk, batch_format="pandas")
        .to_pandas()
    )
    if tops.empty:
        return pd.DataFrame({"token": pd.Series(dtype=str), "df": pd.Series(dtype="int64")})
    tops = tops.sort_values(
        ["df", "token"], ascending=[False, True], kind="stable"
    ).head(k)
    tops["df"] = tops["df"].astype("int64")
    return tops[["token", "df"]].reset_index(drop=True)


def tfidf_top_terms(
    ds: rd.Dataset, k: int = 5, scale: int = 1_000_000, n_shards: int = 64
) -> rd.Dataset:
    """Per-document top-k distinguishing terms by tf-idf shape: score =
    (tf * scale) // df, the integer-exact tf-over-df surrogate (monotone in
    tf x 1/df; chosen over log-idf so the SQL oracle is float-free and the
    ranking hash-matches bit-for-bit). Ties break token-ascending; (doc,
    token) is unique so the order is total.

    Distributed shape — two shuffles, both inherent to the op:
    1. map-side (doc_id, token, tf) triples (a document is one row, so
       per-doc counts never span blocks);
    2. hash-shard by TOKEN: every row of a token meets in one shard, so the
       shard computes df as a local group size and scores rows in place —
       no separate df table, no join, no second pass over the corpus;
    3. hash-shard by DOC: per-doc top-k, output bounded by docs x k.
    The alternative (broadcast a precomputed df table and stay fully
    map-side) is rejected deliberately: at corpus scale the vocabulary is
    itself huge (10^8-10^9 tokens at 100 TB), too big to ship to every
    worker, while shuffling the tf triples is bounded and spillable."""
    from .dedup import _add_shard

    def tf_partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = tokenize(batch["text"])
        if toks.empty:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "token": pd.Series(dtype=str),
                    "tf": pd.Series(dtype="int64"),
                }
            )
        pairs = pd.DataFrame(
            {
                "doc_id": batch["doc_id"].loc[toks.index].to_numpy(),
                "token": toks.to_numpy(),
            }
        )
        g = pairs.groupby(["doc_id", "token"], as_index=False).size()
        return g.rename(columns={"size": "tf"})

    tf = ds.map_batches(tf_partial, batch_format="pandas", batch_size=4096).map_batches(
        lambda t: _add_shard(t, "token", n_shards), batch_format="pyarrow"
    )

    def shard_score(g: pd.DataFrame) -> pd.DataFrame:
        df = g.groupby("token")["doc_id"].transform("size").to_numpy().astype(np.int64)
        out = g[["doc_id", "token", "tf"]].copy()
        out["score"] = (out["tf"].to_numpy().astype(np.int64) * scale) // df
        return out

    scored = (
        tf.groupby("shard")
        .map_groups(shard_score, batch_format="pandas")
        .map_batches(lambda t: _add_shard(t, "doc_id", n_shards), batch_format="pyarrow")
    )

    def doc_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["doc_id", "score", "token"], ascending=[True, False, True], kind="stable"
        )
        return g.groupby("doc_id", as_index=False).head(k)[
            ["doc_id", "token", "tf", "score"]
        ]

    return scored.groupby("shard").map_groups(doc_topk, batch_format="pandas")


def token_count_quantiles(
    ds: rd.Dataset, qs: tuple[float, ...] = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
) -> pd.DataFrame:
    """Exact PERCENTILE_DISC quantiles of per-doc token counts — the
    length-distribution summary a pipeline sizes its packing/truncation by.

    Distributed as a histogram: each block collapses to (n_tokens, count)
    partials, the driver combines a table bounded by the number of DISTINCT
    token counts (≪ corpus size — document lengths share values), and the
    quantile is read off the cumulative histogram at rank ceil(q*n), the
    SQL PERCENTILE_DISC / DuckDB quantile_disc convention (verified
    empirically, including the ceil-on-float boundary)."""
    import math

    counts = token_counts(ds)

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("n_tokens").aggregate([("n_tokens", "count")])
        return g.rename_columns(["n_tokens", "partial"])

    parts = counts.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame({"q": pd.Series(dtype=float), "n_tokens_q": pd.Series(dtype="int64")})
    hist = parts.groupby("n_tokens")["partial"].sum().sort_index()
    n = int(hist.sum())
    cum = hist.cumsum().to_numpy()
    values = hist.index.to_numpy()
    out = []
    for q in qs:
        rank = max(1, math.ceil(q * n))  # 1-based; same float math as the oracle
        idx = int(np.searchsorted(cum, rank, side="left"))
        out.append((float(q), int(values[min(idx, len(values) - 1)])))
    return pd.DataFrame(out, columns=["q", "n_tokens_q"])


def token_count_quantiles_by(
    ds: rd.Dataset, group: str = "lang", qs: tuple[float, ...] = (0.5, 0.9)
) -> pd.DataFrame:
    """Per-group exact PERCENTILE_DISC token-count quantiles — the
    length-distribution summary per language/source, for per-group gating
    and packing decisions. Same bounded-histogram shape as
    token_count_quantiles, keyed: blocks collapse to (group, n_tokens,
    count) partials, the driver combines a table bounded by n_groups x
    distinct lengths (document lengths share values), and each group's
    quantile reads off its cumulative histogram at rank ceil(q*n)."""
    import math

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["text"].str.count(r"\S+").astype(np.int64)
        g = (
            pd.DataFrame({group: batch[group], "n_tokens": n})
            .groupby([group, "n_tokens"], as_index=False)
            .size()
        )
        return g.rename(columns={"size": "partial"})

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=4096).to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {
                group: pd.Series(dtype=str),
                "q": pd.Series(dtype=float),
                "n_tokens_q": pd.Series(dtype="int64"),
            }
        )
    rows = []
    for gval, sub in parts.groupby(group):
        hist = sub.groupby("n_tokens")["partial"].sum().sort_index()
        n = int(hist.sum())
        cum = hist.cumsum().to_numpy()
        values = hist.index.to_numpy()
        for q in qs:
            rank = max(1, math.ceil(q * n))  # same float math as the oracle
            idx = int(np.searchsorted(cum, rank, side="left"))
            rows.append((gval, float(q), int(values[min(idx, len(values) - 1)])))
    out = pd.DataFrame(rows, columns=[group, "q", "n_tokens_q"])
    out["n_tokens_q"] = out["n_tokens_q"].astype("int64")
    return out


def vocab_size(ds: rd.Dataset, n_shards: int = 64) -> pd.DataFrame:
    """Exact distinct-token count — per-block distinct partials, tokens
    hash-sharded so each distinct token is counted in exactly one shard,
    driver sums n_shards scalars. The SQL-checkable twin of the HyperLogLog
    sketch in ops/sketches.py (which is the 100-TB path when the distinct
    set itself is too large to shuffle)."""
    from .dedup import _add_shard

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = tokenize(batch["text"]).drop_duplicates()
        return pd.DataFrame({"token": toks.astype(str)})

    parts = ds.map_batches(
        partial, batch_format="pandas", batch_size=4096
    ).map_batches(lambda t: _add_shard(t, "token", n_shards), batch_format="pyarrow")

    def shard_count(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"partial": [g["token"].nunique()]})

    tot = (
        parts.groupby("shard")
        .map_groups(shard_count, batch_format="pandas")
        .to_pandas()
    )
    n = np.int64(tot["partial"].sum()) if not tot.empty else np.int64(0)
    return pd.DataFrame({"n_distinct_tokens": [n]})


def value_quantiles_by(
    ds: rd.Dataset,
    key: str,
    col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    n_shards: int | None = None,
) -> pd.DataFrame:
    """Exact per-key PERCENTILE_DISC quantiles over a CONTINUOUS column —
    the order-statistic class the bounded-histogram token quantiles can't
    serve (doubles rarely repeat, so the histogram degenerates to the data).
    One hash(key) shuffle: every key's values land in one shard, each shard
    sorts per key and reads the value at rank ceil(q*n) (the SQL
    PERCENTILE_DISC convention). The selected value is an EXISTING element
    (no interpolation arithmetic), so the doubles hash-match SQL
    bit-for-bit. Driver receives n_keys × len(qs) rows."""
    import math

    from .dedup import _add_shard, cluster_shards

    if n_shards is None:
        n_shards = cluster_shards()

    def shard_q(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for kval, sub in g.groupby(key, sort=False):
            vals = np.sort(sub[col].to_numpy())
            n = len(vals)
            for q in qs:
                rank = max(1, math.ceil(q * n))  # 1-based, oracle float math
                rows.append((kval, float(q), vals[rank - 1]))
        return pd.DataFrame(rows, columns=[key, "q", f"{col}_q"])

    out = (
        ds.map_batches(
            lambda t: _add_shard(t.select([key, col]), key, n_shards),
            batch_format="pyarrow",
        )
        .groupby("shard")
        .map_groups(
            lambda g: shard_q(g.drop(columns=["shard"])), batch_format="pandas"
        )
        .to_pandas()
    )
    return out.sort_values([key, "q"]).reset_index(drop=True)


def inverted_index(
    ds: rd.Dataset, min_df: int = 1, n_shards: int | None = None
) -> rd.Dataset:
    """Inverted index (token → sorted posting list of doc_ids) — the
    search-engine core op a crawled corpus feeds. Per-block distinct
    (token, doc_id) pairs shrink the one hash(token) shuffle (a doc
    mentions a hot token many times but ships one pair); each shard owns
    its tokens whole, so df and the sorted postings string are exact with
    a single vectorized pandas pass. Postings serialize as a comma-joined
    string: at web scale one row per token streams out of the shard and
    the posting payload is bounded by df — shard output never exceeds its
    input pairs. min_df prunes the long tail before it leaves the shard."""
    from .dedup import _add_shard, cluster_shards

    if n_shards is None:
        n_shards = cluster_shards()

    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        toks = tokenize(batch["text"])
        out = pd.DataFrame(
            {
                "token": toks.astype(str),
                "doc_id": batch["doc_id"].reindex(toks.index).astype(np.int64),
            }
        )
        return out.drop_duplicates(["token", "doc_id"])

    def shard_index(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["token", "doc_id"]).sort_values(
            ["token", "doc_id"], kind="stable"
        )
        grp = g.groupby("token", sort=False)["doc_id"]
        df_counts = grp.size()
        postings = grp.agg(lambda ids: ",".join(str(i) for i in ids))
        out = pd.DataFrame(
            {
                "token": df_counts.index.astype(str),
                "df": df_counts.to_numpy().astype(np.int64),
                "postings": postings.to_numpy(),
            }
        )
        return out[out["df"] >= min_df]

    return (
        ds.map_batches(pairs, batch_format="pandas", batch_size=4096)
        .map_batches(lambda t: _add_shard(t, "token", n_shards), batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: shard_index(g.drop(columns=["shard"])), batch_format="pandas"
        )
    )


def chunk_documents(
    ds: rd.Dataset, size: int = 64, stride: int = 32
) -> rd.Dataset:
    """Sliding-window document chunking: split each doc into token windows
    of ``size`` with ``stride`` overlap (the long-context training prep —
    every token lands in ≥1 chunk, window k starts at k·stride, the last
    window may run short). Pure map stage, no shuffle; per-batch numpy
    slicing over the tokenized column, output bounded by tokens/stride.
    Empty docs emit no chunks."""

    def chunks(batch: pd.DataFrame) -> pd.DataFrame:
        doc_ids: list = []
        chunk_ids: list[int] = []
        n_tokens: list[int] = []
        texts: list[str] = []
        toks_col = batch["text"].str.lower().str.split(r"\s+", regex=True)
        for did, toks in zip(batch["doc_id"], toks_col):
            toks = [t for t in toks if t]
            n = len(toks)
            if n == 0:
                continue
            n_chunks = 1 if n <= size else 1 + -(-(n - size) // stride)
            for k in range(n_chunks):
                w = toks[k * stride : k * stride + size]
                doc_ids.append(did)
                chunk_ids.append(k)
                n_tokens.append(len(w))
                texts.append(" ".join(w))
        return pd.DataFrame(
            {
                "doc_id": np.asarray(doc_ids),
                "chunk_id": np.asarray(chunk_ids, dtype=np.int64),
                "n_tokens": np.asarray(n_tokens, dtype=np.int64),
                "chunk_text": texts,
            }
        )

    return ds.map_batches(chunks, batch_format="pandas", batch_size=2048)


def bm25_topk(
    ds: rd.Dataset,
    terms: tuple[str, ...],
    k: int = 10,
    scale: int = 10_000,
    n_shards: int = 64,
) -> "pd.DataFrame":
    """Top-k documents for a fixed term query by integer-exact BM25.

    Okapi BM25 with k1=6/5, b=3/4 — those rationals clear the denominators
    exactly: with N docs, total length L (so avgdl = L/N) and doc length dl,

        tf_term = tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))
                = 22*L*tf / (10*L*tf + 3*L + 9*N*dl)      (exact integers)

    and idf is the same integer surrogate tfidf_top_terms uses
    ((N*scale)//df — monotone in the real idf), so every per-term score is
    one BIGINT floor division the SQL oracle reproduces bit-for-bit: no
    ln(), no float, no cross-engine ulp risk.

    Distributed shape: map-side per block emit (doc_id, dl) for every doc
    and (doc_id, term, tf) for query terms only (bounded by |terms| per
    doc); N/L/df are tiny global aggregates; candidates shard by doc_id so
    each shard scores and partial-top-k's locally; the driver merges
    shards' top-k (k x shards rows). The corpus-sized shuffle is the
    fixed-width dl column only."""
    from .dedup import _add_shard

    term_set = set(terms)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = tokenize(batch["text"])
        hit = toks[toks.isin(term_set)]
        pairs = pd.DataFrame(
            {
                "doc_id": batch["doc_id"].loc[hit.index].to_numpy(),
                "term": hit.to_numpy(),
            }
        )
        tf = pairs.groupby(["doc_id", "term"], as_index=False).size().rename(
            columns={"size": "tf"}
        )
        # dl for EVERY doc, including zero-token ones (they count toward N
        # and L exactly as the oracle's len(tokens) does)
        dlv = batch["text"].str.count(r"\S+").astype(np.int64)
        out = pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "term": "",
                "tf": 0,
                "dl": dlv.to_numpy().astype(np.int64),
            }
        )
        tf["dl"] = 0
        return pd.concat(
            [out, tf[["doc_id", "term", "tf", "dl"]]], ignore_index=True
        ).astype({"doc_id": "int64", "tf": "int64", "dl": "int64"})

    rows = ds.map_batches(partial, batch_format="pandas", batch_size=4096)
    rows = rows.map_batches(
        lambda t: _add_shard(t, "doc_id", n_shards), batch_format="pyarrow"
    ).materialize()

    # global scalars: N docs, total length L, per-term df — per-block
    # partials bounded by 1 + |terms| rows each, tiny driver combine
    def stat_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        dlrows = t.filter(pc.equal(t.column("term"), ""))
        tfrows = t.filter(pc.not_equal(t.column("term"), ""))
        keys = [""]
        ns = [dlrows.num_rows]
        ss = [int(pc.sum(dlrows.column("dl")).as_py() or 0)]
        if tfrows.num_rows:
            uniq, cnt = np.unique(
                np.array(tfrows.column("term").to_pylist()), return_counts=True
            )
            keys += [str(u) for u in uniq]
            ns += [int(c) for c in cnt]
            ss += [0] * len(uniq)
        return pa.table(
            {
                "key": pa.array(keys, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "s": pa.array(ss, pa.int64()),
            }
        )

    stats = (
        rows.map_batches(stat_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("key", as_index=False)
        .sum()
    )
    srow = stats[stats["key"] == ""]
    n_docs = int(srow["n"].sum())
    total_len = int(srow["s"].sum())
    df_counts = {
        r["key"]: int(r["n"]) for _, r in stats[stats["key"] != ""].iterrows()
    }
    if n_docs == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="int64")})
    N, L = n_docs, total_len
    idf = {t: (N * scale) // df for t, df in df_counts.items() if df > 0}

    def shard_topk(g: pd.DataFrame) -> pd.DataFrame:
        dl_map = g[g["term"] == ""].set_index("doc_id")["dl"]
        tf = g[g["term"] != ""].copy()
        tf = tf[tf["term"].isin(idf)]
        if tf.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="int64")})
        dl = dl_map.reindex(tf["doc_id"]).to_numpy(dtype=np.int64)
        tfv = tf["tf"].to_numpy(dtype=np.int64)
        idfv = tf["term"].map(idf).to_numpy(dtype=np.int64)
        num = idfv * 22 * tfv * L
        den = 10 * L * tfv + 3 * L + 9 * N * dl
        tf["score"] = num // den
        out = tf.groupby("doc_id", as_index=False)["score"].sum()
        return out.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="stable"
        ).head(k).astype({"doc_id": "int64", "score": "int64"})

    parts = (
        rows.groupby("shard")
        .map_groups(shard_topk, batch_format="pandas")
        .to_pandas()
    )
    return (
        parts.sort_values(["score", "doc_id"], ascending=[False, True], kind="stable")
        .head(k)
        .reset_index(drop=True)
    )


def compression_stats(
    docs: rd.Dataset, level: int = 6, pct_threshold: int = 30
) -> rd.Dataset:
    """Compression-ratio quality signal (the zlib heuristic Gopher/CCNet-
    style corpus filters use: highly compressible text is repetitive
    boilerplate, near-incompressible text is noise/base64): per document,
    the UTF-8 byte length, the zlib(level)-compressed byte length, and a
    `repetitive` flag from INTEGER arithmetic (100·comp < pct_threshold·raw)
    so the output carries no float. Pure map-side, one pass, no shuffle;
    deterministic because zlib at a fixed level is a pure function of the
    bytes (the serial twin calls the same codec — DuckDB hash-checked)."""
    import zlib as _z

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy().astype(np.int64)
        n_bytes = np.zeros(len(ids), np.int64)
        n_comp = np.zeros(len(ids), np.int64)
        for i, t in enumerate(df["text"]):
            b = (t or "").encode("utf-8")
            n_bytes[i] = len(b)
            n_comp[i] = len(_z.compress(b, level))
        return pd.DataFrame(
            {
                "doc_id": ids,
                "n_bytes": n_bytes,
                "n_comp_bytes": n_comp,
                "repetitive": 100 * n_comp < pct_threshold * n_bytes,
            }
        )

    return docs.map_batches(stats, batch_format="pandas")


def pmi_collocations(
    ds: rd.Dataset,
    min_count: int = 5,
    k: int = 50,
    scale: int = 1_000_000,
    n_shards: int | None = None,
) -> pd.DataFrame:
    """Top-k adjacent-bigram collocations by integer-scaled PMI — the
    collocation-mining pass of tokenizer/vocab work ("new york" should be
    one unit). Score = (c_xy · N · scale) // (c_x · c_y), i.e. the PMI
    ratio without the log (log is monotone, so the RANKING is identical)
    kept in exact integer arithmetic so the DuckDB oracle hash-matches.

    Shape (two shuffles, nothing driver-sized):
      1. map-side partials emit (route_token, pair, partial) rows — unigram
         partials routed by the token itself, bigram partials by the LEFT
         token — then hash-shard by route_token and total shard-locally:
         every partial of token t and of pair (t, *) lands in shard
         hash(t), so unigram totals and left-attach both complete locally
         (the tfidf_top_terms trick: no df table, no join). Pairs below
         min_count die here, before the second exchange.
      2. surviving pairs re-shard by their RIGHT token together with the
         shard-local unigram tables (same hash ⇒ same shard), attach c_y,
         score, and keep a local top-k; the driver merges n_shards × k
         rows. N (total tokens) crosses stages as one sentinel row per
         shard — n_shards ints on the driver.

    int64 score arithmetic bounds c_xy·N·scale < 2^63 (~9.2e12 token-pair
    product at scale=1e6); at 100-TB corpus sizes swap the score column to
    the 128-bit object-int path the gram-key ops document."""
    from .dedup import _add_shard, cluster_shards

    n_sh = n_shards or cluster_shards()

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = tokenize(batch["text"])
        vals = toks.to_numpy()
        idx = toks.index.to_numpy()
        uni = pd.Series(vals).value_counts()
        route = [list(uni.index.astype(str))]
        pair = [[""] * len(uni)]
        cnt = [uni.to_numpy(np.int64)]
        if len(vals) >= 2:
            same = idx[1:] == idx[:-1]
            left, right = vals[:-1][same], vals[1:][same]
            if len(left):
                pv = (pd.Series(left) + " " + pd.Series(right)).value_counts()
                keys = pv.index.astype(str)
                route.append(list(pd.Series(keys).str.split(" ", n=1).str[0]))
                pair.append(list(keys))
                cnt.append(pv.to_numpy(np.int64))
        return pd.DataFrame(
            {
                "route": np.concatenate([np.asarray(r, object) for r in route]),
                "pair": np.concatenate([np.asarray(p, object) for p in pair]),
                "partial": np.concatenate(cnt),
            }
        )

    sharded = ds.map_batches(
        partial, batch_format="pandas", batch_size=4096
    ).map_batches(lambda t: _add_shard(t, "route", n_sh), batch_format="pyarrow")

    _SENT = "\x01total"  # never a token: tokens are whitespace-split text

    def stage_left(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby(["route", "pair"], as_index=False)["partial"].sum()
        uni = tot[tot["pair"] == ""]
        cx = dict(zip(uni["route"], uni["partial"]))
        pairs = tot[tot["pair"] != ""]
        pairs = pairs[pairs["partial"] >= min_count]
        right = pairs["pair"].str.split(" ", n=1).str[1]
        out = pd.DataFrame(
            {
                "route": np.concatenate([uni["route"].to_numpy(object),
                                         right.to_numpy(object),
                                         np.array([_SENT], object)]),
                "pair": np.concatenate([np.full(len(uni), "", object),
                                        pairs["pair"].to_numpy(object),
                                        np.array([""], object)]),
                "c_xy": np.concatenate([np.zeros(len(uni), np.int64),
                                        pairs["partial"].to_numpy(np.int64),
                                        np.array([0], np.int64)]),
                "c_x": np.concatenate([uni["partial"].to_numpy(np.int64),
                                       pairs["route"].map(cx).to_numpy(np.int64),
                                       np.array([int(uni["partial"].sum())],
                                                np.int64)]),
            }
        )
        return out

    left_done = (
        sharded.groupby("shard").map_groups(stage_left, batch_format="pandas")
    ).materialize()

    import pyarrow.compute as _pc

    sent = left_done.map_batches(
        lambda t: t.filter(_pc.equal(t.column("route"), _SENT)),
        batch_format="pyarrow",
    ).to_pandas()
    n_total = int(sent["c_x"].sum())

    resharded = left_done.map_batches(
        lambda t: _add_shard(
            t.filter(_pc.not_equal(t.column("route"), _SENT)), "route", n_sh
        ),
        batch_format="pyarrow",
    )

    def stage_right(g: pd.DataFrame) -> pd.DataFrame:
        uni = g[g["pair"] == ""]
        cy = dict(zip(uni["route"], uni["c_x"]))
        pairs = g[g["pair"] != ""]
        if pairs.empty:
            return pd.DataFrame(
                {"pair": pd.Series([], dtype=object),
                 "c_xy": pd.Series([], dtype=np.int64),
                 "pmi_score": pd.Series([], dtype=np.int64)}
            )
        c_xy = pairs["c_xy"].to_numpy(np.int64)
        c_x = pairs["c_x"].to_numpy(np.int64)
        c_y = pairs["route"].map(cy).to_numpy(np.int64)
        score = (c_xy * n_total * scale) // (c_x * c_y)
        out = pd.DataFrame(
            {"pair": pairs["pair"].to_numpy(object), "c_xy": c_xy,
             "pmi_score": score}
        )
        return out.sort_values(
            ["pmi_score", "pair"], ascending=[False, True], kind="stable"
        ).head(k)

    tops = (
        resharded.groupby("shard")
        .map_groups(stage_right, batch_format="pandas")
        .to_pandas()
    )
    return (
        tops.sort_values(["pmi_score", "pair"], ascending=[False, True],
                         kind="stable")
        .head(k)
        .reset_index(drop=True)
    )


def source_vocab_jaccard(
    ds: rd.Dataset, scale: int = 1_000_000, n_shards: int | None = None
) -> pd.DataFrame:
    """Pairwise Jaccard similarity of SOURCE vocabularies (distinct-token
    sets) — the corpus-overlap audit behind mixing-weight decisions (two
    near-identical sources shouldn't both get full weight). Output one row
    per source pair with inter > 0: (source_a, source_b, n_a, n_b, inter,
    jaccard_ppm = inter·scale // (n_a + n_b − inter)), exact integers.

    ONE shuffle: per-block distinct (token, source-bit) partials OR-merge
    shard-locally after hash-sharding by token (every duplicate of a
    (token, source) pair meets in shard hash(token), so the local OR is the
    global source mask for that token). Each shard then counts, for its own
    tokens, the per-source set sizes and the per-pair intersections with
    vectorized bit tests — sources² numbers per shard to the driver, never
    token-sized. Source→bit mapping comes from a per-block distinct pass
    (sources are bounded by definition); masks are int64, so ≤63 sources —
    beyond that, split the mask into words (documented, not silent)."""
    from .dedup import _add_shard, cluster_shards

    n_sh = n_shards or cluster_shards()

    def src_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"source": batch["source"].unique()})

    sources = sorted(
        ds.map_batches(src_partial, batch_format="pandas")
        .to_pandas()["source"]
        .unique()
    )
    if len(sources) > 63:
        raise NotImplementedError(
            "int64 source mask supports ≤63 sources; split into mask words"
        )
    bit = {s: 1 << i for i, s in enumerate(sources)}

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = tokenize(batch["text"])
        srcbits = batch["source"].map(bit).to_numpy(np.int64)
        rows = (
            batch.index.get_indexer(toks.index)
            if len(toks)
            else np.array([], np.int64)
        )
        df = pd.DataFrame({"token": toks.to_numpy(object), "m": srcbits[rows]})
        # block-local OR per token: each (token, bit) row is a single
        # distinct bit after drop_duplicates, so sum of distinct bits == OR
        dedup = df.drop_duplicates()
        return dedup.groupby("token", as_index=False)["m"].sum()

    sharded = ds.map_batches(
        partial, batch_format="pandas", batch_size=4096
    ).map_batches(lambda t: _add_shard(t, "token", n_sh), batch_format="pyarrow")

    npairs = [(i, j) for i in range(len(sources)) for j in range(len(sources)) if i < j]

    def shard_counts(g: pd.DataFrame) -> pd.DataFrame:
        # cross-block OR: sum of per-block masks double-counts shared bits,
        # so OR per token via sort + bitwise_or.reduceat (no per-group apply)
        g2 = g.sort_values("token", kind="stable")
        toks = g2["token"].to_numpy(object)
        ms = g2["m"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, toks[1:] != toks[:-1]])
        masks = np.bitwise_or.reduceat(ms, starts) if len(ms) else ms
        sizes = [(i, int(((masks >> i) & 1).sum())) for i in range(len(sources))]
        inters = [
            (i, j, int((((masks >> i) & (masks >> j)) & 1).sum())) for i, j in npairs
        ]
        return pd.DataFrame(
            {
                "i": [s[0] for s in sizes] + [p[0] for p in inters],
                "j": [-1] * len(sizes) + [p[1] for p in inters],
                "cnt": [s[1] for s in sizes] + [p[2] for p in inters],
            }
        )

    parts = (
        sharded.groupby("shard")
        .map_groups(shard_counts, batch_format="pandas")
        .to_pandas()
    )
    tot = parts.groupby(["i", "j"], as_index=False)["cnt"].sum()
    size = dict(zip(tot[tot["j"] == -1]["i"], tot[tot["j"] == -1]["cnt"]))
    rows = []
    for _, r in tot[tot["j"] >= 0].iterrows():
        i, j, inter = int(r["i"]), int(r["j"]), int(r["cnt"])
        if inter == 0:
            continue
        na, nb = int(size[i]), int(size[j])
        rows.append(
            (sources[i], sources[j], na, nb, inter,
             (inter * scale) // (na + nb - inter))
        )
    out = pd.DataFrame(
        rows,
        columns=["source_a", "source_b", "n_a", "n_b", "inter", "jaccard_ppm"],
    )
    for c in ("n_a", "n_b", "inter", "jaccard_ppm"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["source_a", "source_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Script / charset composition — the cheap pre-language-ID signal a
# multilingual 100-TB pipeline runs first (route documents to per-script
# pipelines, drop mixed-garbage pages before any model sees them).
# Pure map-side, one pass, vectorized regex counts; integer output so the
# DuckDB regexp oracle hash-matches exactly.
# ---------------------------------------------------------------------------

_SCRIPT_CLASSES = (
    ("n_latin", r"[A-Za-z]"),
    ("n_digit", r"[0-9]"),
    ("n_cjk", "[一-鿿]"),
    ("n_cyrillic", "[Ѐ-ӿ]"),
    ("n_arabic", "[؀-ۿ]"),
)
_SCRIPT_NAMES = ("latin", "digit", "cjk", "cyrillic", "arabic")


def script_stats(ds: rd.Dataset) -> rd.Dataset:
    """Per-document character-class counts + dominant script: Latin
    letters, digits, CJK, Cyrillic, Arabic, total chars. Dominant = the
    largest class count, ties broken by the fixed class order above (so
    'none' only when every class count is zero). One vectorized
    str.count per class per batch."""

    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        txt = batch["text"].fillna("")
        out = pd.DataFrame({"doc_id": batch["doc_id"].to_numpy()})
        out["n_chars"] = txt.str.len().to_numpy().astype(np.int64)
        counts = []
        for col, pat in _SCRIPT_CLASSES:
            c = txt.str.count(pat).to_numpy().astype(np.int64)
            out[col] = c
            counts.append(c)
        mat = np.stack(counts)  # (classes, rows)
        best = np.argmax(mat, axis=0)  # first max wins = fixed order
        dom = np.array(_SCRIPT_NAMES, dtype=object)[best]
        dom = np.where(mat.max(axis=0) == 0, "none", dom)
        out["dominant"] = dom
        return out

    return ds.map_batches(stats, batch_format="pandas")
