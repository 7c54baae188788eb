"""Serial expected-table twins for queries whose semantics have no direct
SQL expression (LSH banding, sketches, learned merges, hash-priority
sampling, rolling-hash chunking).

Each twin recomputes a query's expected output SINGLE-THREADED in plain
Python/numpy over the same parquet inputs — reusing only per-record pure
kernels from the ops modules (shingle/signature/hash math, the shared
scoring/finalize functions), never the Ray pipeline shapes — and writes one
parquet under ``TWIN_DIR``. ``oracle_sql()`` entries then read the parquet,
so the driver's DuckDB check verifies that the DISTRIBUTED execution
(partitioning, shuffles, shard merges, actor pools, broadcast joins)
reproduces the serial semantics exactly: a partitioning bug, a lossy shard
merge, or an order-sensitive float reduction all surface as a hash
mismatch. Results are exact because every op here is a deterministic pure
function of its input multiset — integer counts, hash-derived sets, or
floats computed once per record/register in a fixed order (the round-3
verdict's "load the Python oracle's expected table into DuckDB" pattern).

Twins are computed at sf0.01 only (the one scale the driver and the test
suite evaluate SQL at) and cached under /tmp keyed by a version stamp.
"""

from __future__ import annotations

import json
import os
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TWIN_DIR = "/tmp/ccray_twins_sf0.01"
_TWIN_VERSION = 42  # bump when a twin's set/shape/semantics change


def _docs_table(sf_dir: str) -> pa.Table:
    return pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "n_chars"],
    )


def _events_table(sf_dir: str, columns) -> pa.Table:
    return pq.read_table(os.path.join(sf_dir, "events.parquet"), columns=columns)


# ---------------------------------------------------------------------------
# documents-table text / dedup twins
# ---------------------------------------------------------------------------


def twin_bpe_merges(docs: pa.Table, n_merges: int = 32, top_v: int = 10_000) -> pa.Table:
    """Serial Sennrich BPE: exact global word counts (Counter) + the same
    merge loop/kernels (_pair_counts/_merge_word) and tie-break."""
    from ..functions import text as T
    from ..ops.bpe import _EOW, _merge_word, _pair_counts

    wc: Counter = Counter()
    for text in docs.column("text").to_pylist():
        wc.update(T.tokenize(text))
    wf = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:top_v]
    pieces = [tuple(w) + (_EOW,) for w, _ in wf]
    freqs = np.asarray([n for _, n in wf], dtype=np.int64)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts = _pair_counts(pieces, freqs)
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        pieces = [_merge_word(w, best) if best[0] in w else w for w in pieces]
    return pa.table(
        {
            "rank": pa.array(np.arange(len(merges), dtype=np.int64)),
            "left": pa.array([a for a, _ in merges], pa.string()),
            "right": pa.array([b for _, b in merges], pa.string()),
        }
    )


def twin_lm_score(
    docs: pa.Table, vocab_cap: int = 20_000, bigram_cap: int = 100_000
) -> pa.Table:
    """Serial bigram-LM train + score: exact global unigram/bigram Counters
    → the shared _finalize_lm top-k assembly → the shared score_tokens
    per-doc kernel, so floats are bit-identical to the distributed run."""
    from ..functions import text as T
    from ..ops.lm import _finalize_lm, score_tokens

    uni: Counter = Counter()
    bi: Counter = Counter()
    n_tokens = 0
    texts = docs.column("text").to_pylist()
    for text in texts:
        text = (text or "").replace("\x00", "�")
        toks = T.tokenize(text)
        n_tokens += len(toks)
        uni.update(toks)
        bi.update(zip(toks[:-1], toks[1:]))
    parts = pd.DataFrame(
        {
            "prev": [""] * len(uni) + [p for p, _ in bi],
            "cur": list(uni.keys()) + [c for _, c in bi],
            "cnt": list(uni.values()) + list(bi.values()),
        }
    )
    lm = _finalize_lm(parts, n_tokens, vocab_cap, bigram_cap)
    ids, ntoks, scores = [], [], []
    for did, text in zip(docs.column("doc_id").to_pylist(), texts):
        toks = T.tokenize(text or "")
        ids.append(did)
        ntoks.append(len(toks))
        scores.append(score_tokens(lm, toks))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(ntoks, pa.int64()),
            "lm_logprob": pa.array(scores, pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# sketch twins (registers/grids/samples are order-insensitive pure
# functions of the value multiset, so serial == distributed bit-for-bit)
# ---------------------------------------------------------------------------


def _all_tokens(docs: pa.Table) -> np.ndarray:
    s = pd.Series(docs.column("text").to_pylist())
    toks = s.str.lower().str.split(r"\s+", regex=True).explode()
    return toks[toks.notna() & (toks != "")].to_numpy()


def twin_hll_distinct(docs: pa.Table, p: int = 12) -> pa.Table:
    from ..ops.sketches import hll_estimate, hll_partial

    reg = hll_partial(_all_tokens(docs), p)
    return pa.table(
        {
            "estimate": pa.array([hll_estimate(reg)], pa.float64()),
            "registers": pa.array([1 << p], pa.int64()),
            "p": pa.array([p], pa.int64()),
        }
    )


def twin_cms_heavy_hitters(docs: pa.Table, k: int = 20) -> pa.Table:
    """Exact global top-k tokens (ties by token asc) annotated with the
    point estimate from a serially-built Count-Min grid (grids are additive
    → the serial grid equals the distributed merge)."""
    from ..ops.sketches import cms_partial, cms_query

    toks = _all_tokens(docs)
    wc = Counter(toks.tolist())
    top = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    grid = cms_partial(toks)
    tokens = np.asarray([t for t, _ in top], dtype=object)
    est = cms_query(grid, tokens)
    return pa.table(
        {
            "token": pa.array([t for t, _ in top], pa.string()),
            "cnt": pa.array([n for _, n in top], pa.int64()),
            "cms_count": pa.array(est.astype(np.int64)),
        }
    )


def twin_value_quantile_sketch(
    sf_dir: str, m: int = 4096, qs=(0.1, 0.25, 0.5, 0.75, 0.9)
) -> pa.Table:
    from ..ops.sketches import (
        quantile_sketch_estimate,
        quantile_sketch_merge,
        quantile_sketch_partial,
    )

    ev = _events_table(sf_dir, ["event_id", "value"])
    ids = np.asarray(ev.column("event_id").to_pylist())
    vals = np.asarray(ev.column("value").to_pylist())
    parts = quantile_sketch_partial(ids, vals, m=len(ids))
    samp, total = quantile_sketch_merge(parts, m)
    est = quantile_sketch_estimate(samp, tuple(qs))
    return pa.table(
        {
            "q": pa.array(list(qs), pa.float64()),
            "value_est": pa.array(est, pa.float64()),
            "n": pa.array([total] * len(qs), pa.int64()),
        }
    )


def twin_event_users_hll(sf_dir: str, p: int = 12) -> pa.Table:
    from ..ops.sketches import hll_estimate, hll_partial

    ev = _events_table(sf_dir, ["event_type", "user_id"])
    df = ev.to_pandas()
    rows = []
    for k in sorted(df["event_type"].unique()):
        reg = hll_partial(df.loc[df["event_type"] == k, "user_id"].to_numpy(), p)
        rows.append((k, round(hll_estimate(reg), 2)))
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "approx_distinct": pa.array([r[1] for r in rows], pa.float64()),
        }
    )


def twin_event_overlap_kmv(sf_dir: str, k: int = 1024) -> pa.Table:
    from ..ops.sketches import kmv_partial, kmv_set_estimates

    ev = _events_table(sf_dir, ["event_type", "user_id"]).to_pandas()
    sks = [
        kmv_partial(ev.loc[ev["event_type"] == lbl, "user_id"].to_numpy(), k)
        for lbl in ("view", "purchase")
    ]
    est = kmv_set_estimates(sks[0], sks[1], k)
    return pa.table(
        {
            "metric": pa.array(
                ["viewers", "purchasers", "union", "intersection"], pa.string()
            ),
            "estimate": pa.array(
                [est["a"], est["b"], est["union"], est["intersection"]],
                pa.float64(),
            ),
        }
    )


# ---------------------------------------------------------------------------
# crawl-derived twins (inputs = the serial crawl oracle's expected tables in
# ORACLE_TABLE_DIR, so the chain checked is engine-crawl + distributed-op vs
# oracle-crawl + serial-op)
# ---------------------------------------------------------------------------


def _oracle_spans() -> pa.Table:
    """The serial crawl oracle's exploded spans table (built/cached by
    queries.ensure_oracle_tables; function-level import avoids the module
    cycle — queries imports TWIN_DIR from here)."""
    from .queries import ORACLE_TABLE_DIR, ensure_oracle_tables

    ensure_oracle_tables()
    return pq.read_table(os.path.join(ORACLE_TABLE_DIR, "spans.parquet"))


def _serial_media_table() -> pa.Table:
    """media_table_from_documents semantics, serially from the oracle spans
    table: one row per image/video span, synthesized payload."""
    from ..ops.multimodal import MEDIA_SCHEMA, synth_payload

    s = _oracle_spans()
    rows = {name: [] for name in MEDIA_SCHEMA.names}
    for did, kind, ref, off in zip(
        s.column("doc_id").to_pylist(),
        s.column("kind").to_pylist(),
        s.column("media_ref").to_pylist(),
        s.column("offset").to_pylist(),
    ):
        if kind in ("image", "video"):
            rows["media_id"].append(f"{did}#{off}")
            rows["doc_id"].append(did)
            rows["kind"].append(kind)
            rows["media_ref"].append(ref)
            rows["payload"].append(synth_payload(ref, kind))
            rows["content_type"].append(
                "image/png" if kind == "image" else "video/mp4"
            )
    return pa.table(rows, schema=MEDIA_SCHEMA)


def twin_media_features() -> pa.Table:
    """One serial single-batch invocation of the feature kernel — verifies
    the distributed actor-pool batching changes nothing."""
    from ..ops.multimodal import MediaFeatureExtractor

    return MediaFeatureExtractor()(_serial_media_table())


def twin_media_thumbnails() -> pa.Table:
    from ..ops.multimodal import MediaResizer

    return MediaResizer(max_dim=64)(_serial_media_table())


def twin_media_frames() -> pa.Table:
    from ..ops.multimodal import FrameSampler

    return FrameSampler(every_n=4, max_frames=4)(_serial_media_table())


def _hamming_pairs_serial(
    ids: list, sigs: list[int], hamming_threshold: int, bucket_cap: int = 500
) -> pa.Table:
    """Serial pigeonhole-bucketed hamming pairs (the hash64_hamming_pairs
    policy: chunk buckets, cap, exact verify, keep a<b sorted)."""
    n_chunks = hamming_threshold + 1
    width = 64 // n_chunks
    sig_of = dict(zip(ids, sigs))
    buckets: dict[str, list] = {}
    for did, s in zip(ids, sigs):
        for c in range(n_chunks):
            lo = c * width
            hi = 64 if c == n_chunks - 1 else lo + width
            buckets.setdefault(
                f"{c}:{(s >> lo) & ((1 << (hi - lo)) - 1)}", []
            ).append(did)
    out: dict[tuple, int] = {}
    for members in buckets.values():
        members = sorted(set(members))
        if len(members) < 2 or len(members) > bucket_cap:
            continue
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a, b = members[i], members[j]
                d = bin(sig_of[a] ^ sig_of[b]).count("1")
                if d <= hamming_threshold:
                    out[(a, b)] = d
    keys = sorted(out)
    return pa.table(
        {
            "a": pa.array([k[0] for k in keys]),
            "b": pa.array([k[1] for k in keys]),
            "hamming": pa.array([out[k] for k in keys], pa.int64()),
        }
    )


def twin_media_phash_dups() -> pa.Table:
    """Serial pHash + planted duplicates (the 10 lexicographically first
    media rows re-emitted under dup: ids — mirrors q_media_phash_dups)."""
    from ..ops.multimodal import MediaPhasher, phash64, _PHASH_N

    media = _serial_media_table()
    ids = media.column("media_id").to_pylist()
    payloads = media.column("payload").to_pylist()
    order = np.argsort(np.asarray(ids, dtype=object), kind="stable")[:10]
    all_ids = list(ids) + [f"dup:{ids[i]}" for i in order]
    all_payloads = list(payloads) + [payloads[i] for i in order]
    backend = MediaPhasher().backend
    sigs = [phash64(backend.luma_grid(p, _PHASH_N)[0]) for p in all_payloads]
    return _hamming_pairs_serial(all_ids, sigs, hamming_threshold=4)


def twin_interleave_pack(seq_tokens: int = 512) -> pa.Table:
    """Serial token-budget packing over the oracle docs: same token-cost
    rule (1 per media span, whitespace count otherwise), same hash order
    (siphash of doc_id, ties by id), serial exclusive prefix sum."""
    from ..functions import text as T

    s = _oracle_spans()
    per_doc: dict[str, list] = {}
    for did, kind, text in zip(
        s.column("doc_id").to_pylist(),
        s.column("kind").to_pylist(),
        s.column("text").to_pylist(),
    ):
        per_doc.setdefault(did, []).append((kind, text))
    ids = list(per_doc)
    ntok = np.array(
        [
            sum(
                1 if k in ("image", "video") else T.token_count(x or "")
                for k, x in per_doc[d]
            )
            for d in ids
        ],
        dtype=np.int64,
    )
    nmedia = np.array(
        [
            sum(1 for k, _ in per_doc[d] if k in ("image", "video"))
            for d in ids
        ],
        dtype=np.int64,
    )
    h = pd.util.hash_array(np.asarray(ids, dtype=object)).astype(np.int64)
    order = np.lexsort((np.asarray(ids, dtype=object), h))
    ids_o = [ids[i] for i in order]
    ntok_o, nmedia_o = ntok[order], nmedia[order]
    off = np.concatenate([[0], np.cumsum(ntok_o[:-1])]).astype(np.int64)
    return pa.table(
        {
            "doc_id": pa.array(ids_o, pa.string()),
            "n_tokens": pa.array(ntok_o),
            "n_media": pa.array(nmedia_o),
            "tok_offset": pa.array(off),
            "seq_id": pa.array(off // seq_tokens),
        }
    )


def twin_api_fetch(sf_dir: str) -> pa.Table:
    """Serial single-process ApiClient sweep of the JSON-API fixture —
    the (url, ok, code, json) rows the actor pool must reproduce."""
    import json as _json

    from ..stages.api_client import ApiClient, _ok
    from ..oracle import SyntheticNet
    from ..synthweb import make_api_web

    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    n = max(100, {"0.001": 1000, "0.01": 4000, "0.1": 40000}.get(sf, 4000) // 10)
    web, urls = make_api_web(n)
    client = ApiClient(SyntheticNet(web))
    out = {"url": [], "ok": [], "code": [], "json": []}
    for url in urls:
        page = client._fetch(url)
        code = int(page.code) if page is not None else 0
        doc = client.fetch_result(url) if _ok(page) else {}
        out["url"].append(url)
        out["ok"].append(_ok(page) and bool(doc))
        out["code"].append(code)
        out["json"].append(_json.dumps(doc, sort_keys=True))
    return pa.table(
        {
            "url": pa.array(out["url"], pa.string()),
            "ok": pa.array(out["ok"], pa.bool_()),
            "code": pa.array(out["code"], pa.int32()),
            "json": pa.array(out["json"], pa.string()),
        }
    )


def twin_nb_classify(sf_dir: str) -> pa.Table:
    """Serial Naive-Bayes twin: same hash/tokenize/model/score kernels as
    ops/classify.py, counts accumulated in one thread, every document
    scored in one call — per-doc float accumulation order (document token
    order) matches the distributed np.bincount path bit-for-bit."""
    from ..ops import classify as C

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    texts = [x if x is not None else "" for x in t.column("text").to_pylist()]
    labels = t.column("lang").to_pylist()
    label_counts = dict(Counter(labels))
    langs = sorted(label_counts)
    bucket_counts: Counter = Counter()
    for lang, txt in zip(labels, texts):
        flat, _ = C._explode_tokens([txt])
        for b in C.hash_buckets(flat):
            bucket_counts[(lang, int(b))] += 1
    logp, logprior = C.nb_model(langs, bucket_counts, label_counts)
    pred_idx = C.nb_score_batch(texts, logp, logprior)
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "lang": t.column("lang"),
            "pred": pa.array([langs[i] for i in pred_idx], pa.string()),
        }
    )


def twin_canonical_alias_dedup() -> pa.Table:
    """Serial oracle crawl of the shared alias fixture → (n_docs,
    n_alias_edges, n_collapsed_docs): edges from fetched pages' canonical
    declarations (self-edges dropped), collapse = distinct final ids."""
    from ..canon import canonical_url
    from ..oracle import crawl_oracle
    from ..spec import CrawlSpec
    from ..synthweb import page_url, web_table
    from .queries import _alias_fixture_pages

    n_articles = max(30, 4000 // 64)  # sf0.01 sizing (q_canonical_alias_dedup)
    res = crawl_oracle(
        web_table(_alias_fixture_pages(n_articles)),
        [page_url("home")],
        CrawlSpec(delay=0.02),
    )
    edges: dict[str, str] = {}
    n_edges = 0
    for p in res.pages:
        decl = p.get("canonical_decl") or ""
        if p["fetched"] and decl:
            dst = canonical_url(decl)
            if dst != p["canonical_url"]:
                edges[p["canonical_url"]] = dst
                n_edges += 1
    doc_ids = [d["doc_id"] for d in res.documents]
    collapsed = {edges.get(d, d) for d in doc_ids}
    return pa.table(
        {
            "n_docs": pa.array([len(doc_ids)], pa.int64()),
            "n_alias_edges": pa.array([n_edges], pa.int64()),
            "n_collapsed_docs": pa.array([len(collapsed)], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# graph / embedding twins
# ---------------------------------------------------------------------------


def _strong_part_edges_serial(sf_dir: str) -> pd.DataFrame:
    """Serial twin of queries._strong_part_edges: distinct (order, part)
    pairs → within-order part pairs (a < b) → co-occurrence count ≥ 2."""
    li = pq.read_table(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey"],
    ).to_pandas()
    g = li.drop_duplicates(["l_orderkey", "l_partkey"])
    m = g.merge(g, on="l_orderkey", suffixes=("_a", "_b"))
    m = m[m["l_partkey_a"] < m["l_partkey_b"]]
    n = m.groupby(["l_partkey_a", "l_partkey_b"], as_index=False).size()
    n = n[n["size"] >= 2]
    return n.rename(columns={"l_partkey_a": "a", "l_partkey_b": "b"})[["a", "b"]]


def twin_part_k_core(sf_dir: str, k: int = 2) -> pa.Table:
    """Serial iterative peel: drop nodes with degree < k (and their edges)
    until fixpoint; output surviving edges as (part_a, part_b)."""
    e = _strong_part_edges_serial(sf_dir)
    while True:
        deg = Counter(e["a"].tolist()) + Counter(e["b"].tolist())
        peel = {n for n, d in deg.items() if d < k}
        if not peel:
            break
        e = e[~(e["a"].isin(peel) | e["b"].isin(peel))]
    e = e.sort_values(["a", "b"])
    return pa.table(
        {
            "part_a": pa.array(e["a"].to_numpy().astype(np.int64)),
            "part_b": pa.array(e["b"].to_numpy().astype(np.int64)),
        }
    )


def twin_part_k_truss(sf_dir: str, k: int = 3) -> pa.Table:
    """Serial k-truss over the strong part edges — the SAME pure kernel
    (ops/graph.ktruss_kernel), so the distributed triangle-support
    peeling rounds must reproduce the exact surviving edge set."""
    from ..ops.graph import ktruss_kernel

    ed = _strong_part_edges_serial(sf_dir)
    a, b = ktruss_kernel(ed["a"].to_numpy(), ed["b"].to_numpy(), k)
    out = pd.DataFrame({"part_a": a, "part_b": b}).sort_values(
        ["part_a", "part_b"]
    )
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def twin_embedding_neardup_lsh(
    sf_dir: str,
    threshold: float = 0.9,
    n_planes: int = 14,
    n_tables: int = 8,
    seed: int = 13,
    bucket_cap: int = 2000,
) -> pa.Table:
    """Serial hyperplane-LSH near-dup over the augmented corpus (the same
    20 planted noisy near-dups q_embedding_neardup_lsh unions in): same
    planes (rng seed 13), same sign-byte bucket codes, same bucket cap,
    exact cosine verify — output the recovered (a, b) pair set."""
    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet")).to_pandas()
    ids = emb["vec_id"].to_numpy().astype(np.int64)
    M = np.asarray([list(v) for v in emb["embedding"]], dtype=np.float64)
    planted_src = emb[emb["vec_id"] < 20].sort_values("vec_id")
    rng = np.random.default_rng(17)
    p_ids, p_vecs = [], []
    for vid, vec in zip(planted_src["vec_id"], planted_src["embedding"]):
        v = np.asarray(list(vec), dtype=np.float64)
        p_ids.append(int(vid) + 1_000_000)
        p_vecs.append(v + 0.03 * rng.standard_normal(v.size))
    all_ids = np.concatenate([ids, np.asarray(p_ids, np.int64)])
    A = np.vstack([M, np.asarray(p_vecs)])
    rngp = np.random.default_rng(seed)
    planes = rngp.standard_normal((n_tables, n_planes, A.shape[1]))
    n_bytes = (n_planes + 7) // 8
    byte_shifts = (np.arange(n_bytes, dtype=np.int64) * 8)[None, :]
    vec_of = {int(i): A[r] for r, i in enumerate(all_ids)}
    buckets: dict[str, list[int]] = {}
    for ti in range(n_tables):
        bits = (A @ planes[ti].T) > 0
        keys = np.packbits(bits, axis=1, bitorder="little")[:, :n_bytes]
        codes = (keys.astype(np.int64) << byte_shifts).sum(axis=1)
        for i, c in zip(all_ids, codes):
            buckets.setdefault(f"{ti}:{c}", []).append(int(i))
    cand: set[tuple[int, int]] = set()
    for members in buckets.values():
        members = sorted(set(members))
        if len(members) < 2 or len(members) > bucket_cap:
            continue
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                cand.add((members[i], members[j]))
    out_a, out_b = [], []
    for x, y in sorted(cand):
        va, vb = vec_of[x], vec_of[y]
        den = max(np.linalg.norm(va) * np.linalg.norm(vb), 1e-12)
        if float(va @ vb) / den >= threshold:
            out_a.append(x)
            out_b.append(y)
    return pa.table(
        {"a": pa.array(out_a, pa.int64()), "b": pa.array(out_b, pa.int64())}
    )


# ---------------------------------------------------------------------------
# kmeans / ANN twins — shared pure kernels from ops/similarity.py run
# single-threaded over the whole embeddings table. The distributed side is
# bit-deterministic by construction (hash-min samples are block-independent,
# Lloyd reduces are fixed-point int64, every driver-side matrix expression
# is identical code), so a hash match verifies sampling, broadcast,
# partial-merge and scan partitioning end-to-end.
# ---------------------------------------------------------------------------


def _emb_frame(sf_dir: str) -> pd.DataFrame:
    return pq.read_table(os.path.join(sf_dir, "embeddings.parquet")).to_pandas()


def _emb_ids_matrix(emb: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    ids = emb["vec_id"].to_numpy().astype(np.int64)
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    return ids, M


def _knn_output(
    per_query: dict[int, list[tuple[float, int]]], k: int
) -> pa.Table:
    rows = {"query_id": [], "neighbor_id": [], "rank": []}
    for qid in sorted(per_query):
        cand = per_query[qid]
        cos = np.array([c for c, _ in cand])
        nid = np.array([i for _, i in cand], dtype=np.int64)
        order = np.lexsort((nid, -cos))[:k]
        for r, j in enumerate(order, 1):
            rows["query_id"].append(int(qid))
            rows["neighbor_id"].append(int(nid[j]))
            rows["rank"].append(r)
    return pa.table(
        {
            "query_id": pa.array(rows["query_id"], pa.int64()),
            "neighbor_id": pa.array(rows["neighbor_id"], pa.int64()),
            "rank": pa.array(rows["rank"], pa.int64()),
        }
    )


def _hash_min_frame(emb: pd.DataFrame, cap: int) -> pd.DataFrame:
    """Serial mirror of similarity.hash_min_sample on a whole-table frame."""
    from ..ops.similarity import _id_hash

    ids = emb["vec_id"].to_numpy()
    h = _id_hash(ids)
    take = np.lexsort((ids, h))[:cap]
    return emb.iloc[take].reset_index(drop=True)


def twin_knn_ivf(
    sf_dir: str, k: int = 10, nlist: int = 16, nprobe: int = 4,
    sample_rows: int = 4096,
) -> pa.Table:
    """Serial IVF top-k: same hash-min coarse sample, same seeded
    kmeans_fit centroids, same probe lists, exact scan of the probed
    clusters only — mirrors ops/similarity.knn_ivf's candidate set and
    (cos desc, id asc) tie-breaks."""
    from ..ops.similarity import _matrix, kmeans_fit

    emb = _emb_frame(sf_dir)
    _, S = _matrix(_hash_min_frame(emb, sample_rows), "vec_id")
    cent = kmeans_fit(S, nlist)
    qdf = emb[emb["vec_id"] < 5]
    qids, Q = _matrix(qdf, "vec_id")
    bids, B = _matrix(emb, "vec_id")
    qprobe = np.argsort(-(Q @ cent.T), axis=1)[:, :nprobe]
    assign = np.argmax(B @ cent.T, axis=1)
    per_query: dict[int, list] = {int(q): [] for q in qids}
    for qi in range(len(qids)):
        for c in qprobe[qi]:
            mask = assign == c
            sub_ids, sub = bids[mask], B[mask]
            sims = Q[qi][None, :] @ sub.T
            for j in range(len(sub_ids)):
                if sub_ids[j] != qids[qi]:
                    per_query[int(qids[qi])].append(
                        (float(sims[0, j]), int(sub_ids[j]))
                    )
    return _knn_output(per_query, k)


def twin_knn_pq(
    sf_dir: str, k: int = 10, m: int = 8, n_centroids: int = 256
) -> pa.Table:
    """Serial PQ ADC top-k: same hash-min training sample → pq_fit_books,
    same per-row code argmax, same LUT-gather score accumulation order."""
    from ..ops.similarity import _matrix, pq_fit_books

    emb = _emb_frame(sf_dir)
    samp = _hash_min_frame(emb, 4096)
    S = np.stack(samp["embedding"].to_numpy()).astype(np.float64)
    S /= np.maximum(np.linalg.norm(S, axis=1, keepdims=True), 1e-12)
    books = pq_fit_books(S, m, n_centroids)
    dsub = books.shape[2]

    bids, B = _matrix(emb, "vec_id")
    codes = np.zeros((len(B), m), np.int64)
    for j in range(m):
        sub = B[:, j * dsub : (j + 1) * dsub]
        d = sub @ books[j].T - 0.5 * (books[j] * books[j]).sum(axis=1)
        codes[:, j] = np.argmax(d, axis=1)

    qdf = emb[emb["vec_id"] < 5]
    qids, Q = _matrix(qdf, "vec_id")
    lut = np.einsum("qjd,jcd->qjc", Q.reshape(len(Q), m, dsub), books)
    scores = np.zeros((len(qids), len(bids)))
    for j in range(m):
        scores += lut[:, j, :][:, codes[:, j]]
    per_query: dict[int, list] = {}
    for qi in range(len(qids)):
        per_query[int(qids[qi])] = [
            (float(scores[qi, j]), int(bids[j]))
            for j in range(len(bids))
            if bids[j] != qids[qi]
        ]
    return _knn_output(per_query, k)


def twin_knn_ivfpq(
    sf_dir: str, k: int = 10, nlist: int = 16, nprobe: int = 4,
    m: int = 8, n_centroids: int = 256, sample_rows: int = 4096,
) -> pa.Table:
    """Serial IVF-PQ: coarse centroids + codebooks from the same hash-min
    samples, PQ scores accumulated in the same subspace order, scan limited
    to each query's probed lists."""
    from ..ops.similarity import _matrix, kmeans_fit, pq_fit_books

    emb = _emb_frame(sf_dir)
    _, Sc = _matrix(_hash_min_frame(emb, sample_rows), "vec_id")
    cent = kmeans_fit(Sc, nlist)
    samp = _hash_min_frame(emb, 4096)
    S = np.stack(samp["embedding"].to_numpy()).astype(np.float64)
    S /= np.maximum(np.linalg.norm(S, axis=1, keepdims=True), 1e-12)
    books = pq_fit_books(S, m, n_centroids)
    dsub = books.shape[2]

    bids, B = _matrix(emb, "vec_id")
    assign = np.argmax(B @ cent.T, axis=1)
    codes = np.zeros((len(B), m), np.int64)
    for j in range(m):
        sub = B[:, j * dsub : (j + 1) * dsub]
        d = sub @ books[j].T - 0.5 * (books[j] * books[j]).sum(axis=1)
        codes[:, j] = np.argmax(d, axis=1)

    qdf = emb[emb["vec_id"] < 5]
    qids, Q = _matrix(qdf, "vec_id")
    qprobe = np.argsort(-(Q @ cent.T), axis=1)[:, :nprobe]
    lut = np.einsum("qjd,jcd->qjc", Q.reshape(len(Q), m, dsub), books)
    per_query: dict[int, list] = {int(q): [] for q in qids}
    for qi in range(len(qids)):
        for c in qprobe[qi]:
            mask = assign == c
            sub_ids, sub_codes = bids[mask], codes[mask]
            scores = np.zeros((1, len(sub_ids)))
            for j in range(m):
                scores += lut[qi : qi + 1, j, :][:, sub_codes[:, j]]
            for j in range(len(sub_ids)):
                if sub_ids[j] != qids[qi]:
                    per_query[int(qids[qi])].append(
                        (float(scores[0, j]), int(sub_ids[j]))
                    )
    return _knn_output(per_query, k)


def twin_embedding_clusters(sf_dir: str, k: int = 10, n_iter: int = 10) -> pa.Table:
    """Serial Lloyd's k-means assignment via similarity.kmeans_serial —
    bit-identical to the distributed integer-exact reduce."""
    from ..ops.similarity import kmeans_serial

    ids, M = _emb_ids_matrix(_emb_frame(sf_dir))
    _, assign = kmeans_serial(ids, M, k=k, n_iter=n_iter)
    order = np.argsort(ids, kind="stable")
    return pa.table(
        {
            "vec_id": pa.array(ids[order], pa.int64()),
            "cluster": pa.array(assign[order].astype(np.int64), pa.int64()),
        }
    )


def twin_semantic_dedup(
    sf_dir: str, threshold: float = 0.5, k: int = 10, n_iter: int = 8,
    max_cluster: int = 8192,
) -> pa.Table:
    """Serial SemDeDup: kmeans_serial centers → cosine-argmax cluster
    assignment (normalized rows × normalized centers, the tag() expression)
    → semdedup_members per cluster — the same pure kernel the distributed
    map_groups calls."""
    from ..ops.dedup import semdedup_members
    from ..ops.similarity import kmeans_serial

    ids, M = _emb_ids_matrix(_emb_frame(sf_dir))
    centers, _ = kmeans_serial(ids, M, k=k, n_iter=n_iter)
    cent = centers / np.maximum(
        np.linalg.norm(centers, axis=1, keepdims=True), 1e-12
    )
    Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    assign = np.argmax(Mn @ cent.T, axis=1)
    out_id, out_rep, out_depth = [], [], []
    for c in np.unique(assign):
        mask = assign == c
        sids, srep, sdepth = semdedup_members(ids[mask], M[mask], threshold, max_cluster)
        out_id.append(sids)
        out_rep.append(srep)
        out_depth.append(sdepth)
    ids_c = np.concatenate(out_id)
    rep_c = np.concatenate(out_rep)
    dep_c = np.concatenate(out_depth)
    order = np.argsort(ids_c, kind="stable")
    return pa.table(
        {
            "vec_id": pa.array(ids_c[order], pa.int64()),
            "rep_id": pa.array(rep_c[order], pa.int64()),
            "keep": pa.array((rep_c == ids_c)[order], pa.bool_()),
            "split_depth": pa.array(dep_c[order], pa.int64()),
        }
    )


def twin_dsir_weights(sf_dir: str) -> pa.Table:
    """Serial DSIR: same count_vector/log_ratio/doc_feature_ids kernels
    over the whole documents table single-threaded — the integer model
    counts and the sorted-feature-id per-doc sums make it bit-identical to
    the distributed two-pass fit."""
    from ..ops.dsir import count_vector, doc_feature_ids, log_ratio

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    tgt = count_vector([x for x, lg in zip(texts, langs) if lg == "en"])
    raw = count_vector(texts)
    r = log_ratio(tgt, raw)
    n_feats, logw = [], []
    for x in texts:
        fids = doc_feature_ids(x)
        n_feats.append(len(fids))
        logw.append(float(r[fids].sum()))
    order = np.argsort(np.asarray(ids, np.int64), kind="stable")
    return pa.table(
        {
            "doc_id": pa.array(np.asarray(ids, np.int64)[order], pa.int64()),
            "n_feats": pa.array(np.asarray(n_feats, np.int64)[order], pa.int64()),
            "logw": pa.array(np.asarray(logw, np.float64)[order], pa.float64()),
        }
    )


def twin_compression_ratio(
    docs: pa.Table, level: int = 6, pct_threshold: int = 30
) -> pa.Table:
    """Serial zlib compression stats — same codec, same level, same
    integer flag arithmetic."""
    import zlib as _z

    ids = docs.column("doc_id").to_pylist()
    n_bytes, n_comp = [], []
    for t in docs.column("text").to_pylist():
        b = (t or "").encode("utf-8")
        n_bytes.append(len(b))
        n_comp.append(len(_z.compress(b, level)))
    nb = np.asarray(n_bytes, np.int64)
    nc = np.asarray(n_comp, np.int64)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_bytes": pa.array(nb, pa.int64()),
            "n_comp_bytes": pa.array(nc, pa.int64()),
            "repetitive": pa.array(100 * nc < pct_threshold * nb, pa.bool_()),
        }
    )


def _oracle_link_edges() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(nodes, src_ids, dst_ids) of the flagship crawl's distinct link-edge
    set (the oracle's link_edges table), int-mapped and lexsorted (dst, src)
    — the canonical edge order both graph driver paths accumulate in."""
    from .queries import ORACLE_TABLE_DIR, ensure_oracle_tables

    ensure_oracle_tables()
    e = pq.read_table(os.path.join(ORACLE_TABLE_DIR, "link_edges.parquet"))
    s = np.asarray(e.column("src").to_pylist(), dtype=object)
    d = np.asarray(e.column("dst").to_pylist(), dtype=object)
    nodes, inv = np.unique(np.concatenate([s, d]), return_inverse=True)
    src = inv[: len(s)]
    dst = inv[len(s):]
    order = np.lexsort((src, dst))
    return nodes, src[order], dst[order]


def twin_pagerank(n_iter: int = 8, d: float = 0.85, k: int = 20) -> pa.Table:
    """Serial PageRank over the oracle link edges — the same power
    iteration (uniform dangling redistribution) in the same canonical edge
    order as ops/graph.pagerank's driver path, so every rank bit matches."""
    nodes, src, dst = _oracle_link_edges()
    n = len(nodes)
    deg = np.bincount(src, minlength=n).astype(np.int64)
    safe_deg = np.where(deg > 0, deg, 1)
    rank = np.full(n, 1.0 / n)
    base = (1.0 - d) / n
    for _ in range(n_iter):
        dangling = float(rank[deg == 0].sum())
        contrib = rank / safe_deg
        sums = np.zeros(n)
        np.add.at(sums, dst, contrib[src])
        rank = base + d * dangling / n + d * sums
    top = pd.DataFrame({"node": nodes, "rank": rank}).sort_values(
        ["rank", "node"], ascending=[False, True], kind="stable"
    ).head(k)
    return pa.table(
        {
            "node": pa.array(top["node"].tolist(), pa.string()),
            "rank": pa.array(top["rank"].to_numpy(), pa.float64()),
        }
    )


def twin_pagerank_personalized(
    n_iter: int = 8, d: float = 0.85, k: int = 20, n_seeds: int = 3
) -> pa.Table:
    """Serial personalized PageRank over the oracle link edges — teleport
    uniform on the 3 lexicographically-smallest source nodes (ids into the
    sorted node array, so smallest ids == smallest names), same float
    expression and canonical edge order as ops/graph.pagerank(seeds=...)."""
    nodes, src, dst = _oracle_link_edges()
    n = len(nodes)
    seed_ids = np.unique(src)[:n_seeds]
    tvec = np.zeros(n)
    tvec[seed_ids] = 1.0 / len(seed_ids)
    deg = np.bincount(src, minlength=n).astype(np.int64)
    safe_deg = np.where(deg > 0, deg, 1)
    rank = tvec.copy()
    for _ in range(n_iter):
        dangling = float(rank[deg == 0].sum())
        contrib = rank / safe_deg
        sums = np.zeros(n)
        np.add.at(sums, dst, contrib[src])
        rank = ((1.0 - d) + d * dangling) * tvec + d * sums
    top = pd.DataFrame({"node": nodes, "rank": rank}).sort_values(
        ["rank", "node"], ascending=[False, True], kind="stable"
    ).head(k)
    return pa.table(
        {
            "node": pa.array(top["node"].tolist(), pa.string()),
            "rank": pa.array(top["rank"].to_numpy(), pa.float64()),
        }
    )


def twin_link_hits(n_iter: int = 16, k: int = 10) -> pa.Table:
    """Serial HITS over the oracle link edges (same iteration and edge
    order as ops/graph.hits' driver path); top-k authorities."""
    nodes, src, dst = _oracle_link_edges()
    n = len(nodes)
    hub = np.full(n, 1.0)
    auth = np.full(n, 1.0)
    for _ in range(n_iter):
        new_auth = np.zeros(n)
        np.add.at(new_auth, dst, hub[src])
        na = np.linalg.norm(new_auth)
        auth = new_auth / na if na > 0 else new_auth
        new_hub = np.zeros(n)
        np.add.at(new_hub, src, auth[dst])
        nh = np.linalg.norm(new_hub)
        hub = new_hub / nh if nh > 0 else new_hub
    top = pd.DataFrame({"node": nodes, "hub": hub, "authority": auth}).sort_values(
        ["authority", "node"], ascending=[False, True], kind="stable"
    ).head(k)
    return pa.table(
        {
            "node": pa.array(top["node"].tolist(), pa.string()),
            "hub": pa.array(top["hub"].to_numpy(), pa.float64()),
            "authority": pa.array(top["authority"].to_numpy(), pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# builder
# ---------------------------------------------------------------------------

_DOC_TWINS = {
    "bpe_merges": twin_bpe_merges,
    "lm_score": twin_lm_score,
    "hll_distinct": twin_hll_distinct,
    "cms_heavy_hitters": twin_cms_heavy_hitters,
    "compression_ratio": twin_compression_ratio,
}

_SF_TWINS = {
    "value_quantile_sketch": twin_value_quantile_sketch,
    "event_users_hll": twin_event_users_hll,
    "event_overlap_kmv": twin_event_overlap_kmv,
    "api_fetch": twin_api_fetch,
    "part_k_core": twin_part_k_core,
    "part_k_truss": twin_part_k_truss,
    "embedding_neardup_lsh": twin_embedding_neardup_lsh,
    "nb_classify": twin_nb_classify,
    # params mirror the registry wrappers in queries.py exactly
    "knn_ivf": lambda sf: twin_knn_ivf(sf, k=10, nlist=16, nprobe=4),
    "knn_pq": lambda sf: twin_knn_pq(sf, k=10, m=8),
    "knn_ivfpq": lambda sf: twin_knn_ivfpq(sf, k=10, nlist=8, nprobe=4, m=16),
    "embedding_clusters": twin_embedding_clusters,
    "semantic_dedup": twin_semantic_dedup,
    "dsir_weights": twin_dsir_weights,
}

def twin_margin_mine(
    sf_dir: str, label_a: int = 0, label_b: int = 1,
    k: int = 4, threshold: float = 1.0,
) -> pa.Table:
    """Serial margin-based pair mining — the SAME pure kernels
    (ops/similarity.margin_candidates + mutual_margin_pairs) over the full
    matrices, with bavg from one whole-matrix column top-k, so the
    distributed broadcast/partial-merge path must reproduce every
    fixed-point margin bit-for-bit."""
    from ..ops.similarity import (
        _MARGIN_FP,
        _matrix,
        margin_candidates,
        mutual_margin_pairs,
    )

    emb = _emb_frame(sf_dir)
    a_pdf = emb[emb["label"] == label_a]
    b_pdf = emb[emb["label"] == label_b]
    aids, A = _matrix(a_pdf, "vec_id")
    bids, B = _matrix(b_pdf, "vec_id")
    sims = A @ B.T
    kk = min(k, len(aids))
    bavg = np.mean(np.sort(sims, axis=0)[::-1][:kk], axis=0)
    cand = margin_candidates(aids, A, bids, B, bavg, k)
    out = mutual_margin_pairs(cand, int(np.floor(threshold * _MARGIN_FP)))
    return pa.Table.from_pandas(out, preserve_index=False)


_SF_TWINS["margin_mine"] = twin_margin_mine


def twin_crawl_cost() -> pa.Table:
    """Serial weighted SSSP over the oracle link edges with w(u→v) = min
    fetched response_time_ms of v (1000 for never-fetched targets), seeds
    = 3 lexicographically-smallest sources — the SAME pure kernel
    (ops/graph.sssp_kernel) and the same seed/weight policy as
    q_crawl_cost, so every cost must hash-match."""
    import numpy as np

    from .queries import ORACLE_TABLE_DIR, ensure_oracle_tables
    from ..ops.graph import _SSSP_INF, sssp_kernel

    ensure_oracle_tables()
    e = pq.read_table(os.path.join(ORACLE_TABLE_DIR, "link_edges.parquet"))
    s = np.asarray(e.column("src").to_pylist(), dtype=object)
    d = np.asarray(e.column("dst").to_pylist(), dtype=object)
    pages = pq.read_table(
        os.path.join(ORACLE_TABLE_DIR, "pages.parquet"),
        columns=["canonical_url", "response_time_ms", "fetched"],
    ).to_pandas()
    wmap = (
        pages[pages["fetched"]]
        .groupby("canonical_url")["response_time_ms"]
        .min()
        .to_dict()
    )
    nodes, inv = np.unique(np.concatenate([s, d]), return_inverse=True)
    src = inv[: len(s)]
    dst = inv[len(s):]
    w = np.asarray([int(wmap.get(x, 1000)) for x in d], np.int64)
    seeds = sorted(set(s))[:3]
    seed_arr = np.asarray(seeds, dtype=object)
    pos = np.searchsorted(nodes, seed_arr)
    ok = (pos < len(nodes)) & (nodes[np.minimum(pos, len(nodes) - 1)] == seed_arr)
    dist = sssp_kernel(len(nodes), src, dst, w, pos[ok])
    reach = dist < _SSSP_INF
    extra = ~np.isin(nodes[reach], seed_arr)
    out_nodes = list(seed_arr) + nodes[reach][extra].tolist()
    out_cost = [0] * len(seed_arr) + dist[reach][extra].tolist()
    out = pd.DataFrame({"node": out_nodes, "cost_ms": np.asarray(out_cost, np.int64)})
    return pa.Table.from_pandas(
        out.sort_values("node").reset_index(drop=True), preserve_index=False
    )


def twin_link_anf() -> pa.Table:
    """Serial ANF/HyperBall over the oracle link edges — the SAME pure
    kernel (ops/graph.anf_kernel: per-node HLL registers, Jacobi max-merge
    rounds, 2^20 fixed-point estimate sums), so the full (t, nf) curve and
    effective diameter must hash-match the distributed wrapper."""
    from ..ops.graph import anf_kernel

    nodes, src, dst = _oracle_link_edges()
    return pa.Table.from_pandas(anf_kernel(nodes, src, dst), preserve_index=False)


def twin_link_harmonic() -> pa.Table:
    """Serial harmonic centrality over the oracle link edges — the SAME
    pure kernel (ops/graph.harmonic_kernel) and top-k tie policy, so the
    distributed register rounds must reproduce every fixed-point value."""
    import numpy as np

    from ..ops.graph import harmonic_kernel

    nodes, src, dst = _oracle_link_edges()
    hc = harmonic_kernel(nodes, src, dst)
    order = np.lexsort((nodes, -hc))[:20]
    return pa.table(
        {
            "node": pa.array(nodes[order], pa.string()),
            "hc_fp": pa.array(hc[order], pa.int64()),
        }
    )


_NOARG_TWINS = {
    "link_anf": twin_link_anf,
    "link_harmonic": twin_link_harmonic,
    "crawl_cost": twin_crawl_cost,
    "media_features": twin_media_features,
    "media_thumbnails": twin_media_thumbnails,
    "media_frames": twin_media_frames,
    "media_phash_dups": twin_media_phash_dups,
    "interleave_pack": twin_interleave_pack,
    "canonical_alias_dedup": twin_canonical_alias_dedup,
    "pagerank": twin_pagerank,
    "pagerank_personalized": twin_pagerank_personalized,
    "link_hits": twin_link_hits,
}


def ensure_twin_tables(sf_dir: str = "/root/testdata/sf0.01") -> str:
    """Build (or reuse cached) serial twin tables for sf0.01. Returns the
    twin directory. Serial cost is bounded by the sf0.01 corpus (500 docs /
    10k events) — seconds, cached across runs by the version stamp."""
    out = TWIN_DIR
    vfile = os.path.join(out, "twin_version.json")
    try:
        with open(vfile) as f:
            if json.load(f)["version"] == _TWIN_VERSION:
                return out
    except (OSError, KeyError, ValueError):
        pass
    os.makedirs(out, exist_ok=True)
    docs = _docs_table(sf_dir)
    for name, fn in _DOC_TWINS.items():
        pq.write_table(fn(docs), os.path.join(out, f"{name}.parquet"))
    for name, fn in _SF_TWINS.items():
        pq.write_table(fn(sf_dir), os.path.join(out, f"{name}.parquet"))
    for name, fn in _NOARG_TWINS.items():
        pq.write_table(fn(), os.path.join(out, f"{name}.parquet"))
    with open(vfile, "w") as f:
        json.dump({"version": _TWIN_VERSION}, f)
    return out


def twin_event_f2(sf_dir: str) -> pa.Table:
    """Serial AMS F2 sketch over the events user_id stream — the SAME pure
    kernel (ops/sketches.ams_partial + upper-median ams_estimate) on the
    whole column at once, so the distributed grid merge must reproduce the
    integer estimate exactly (grids ADD; signs/buckets are deterministic
    hashes). The exact F2 row is computed BY DUCKDB in the oracle SQL, not
    here — the sketch row is the only twin-backed value."""
    from ..ops.sketches import ams_estimate, ams_partial

    ev = _events_table(sf_dir, ["user_id"]).to_pandas()
    est = ams_estimate(ams_partial(ev["user_id"].to_numpy()))
    return pa.table(
        {"metric": pa.array(["f2_ams"], pa.string()),
         "v": pa.array([est], pa.int64())}
    )


_SF_TWINS["event_f2"] = twin_event_f2


def twin_crawl_mst() -> pa.Table:
    """Serial minimum spanning forest over the oracle link edges with the
    SAME latency weight policy as q_crawl_mst (w(u→v) = min fetched
    response_time_ms of v, 1000 for never-fetched; undirected weight = min
    over both directions) and the SAME pure kernel (ops/graph.msf_kernel,
    Kruskal over the (w, a, b) total order) — the total order makes the
    forest unique, so the distributed Borůvka rounds must reproduce every
    edge."""
    import numpy as np

    from .queries import ORACLE_TABLE_DIR, ensure_oracle_tables
    from ..ops.graph import msf_kernel

    ensure_oracle_tables()
    e = pq.read_table(os.path.join(ORACLE_TABLE_DIR, "link_edges.parquet"))
    s = np.asarray(e.column("src").to_pylist(), dtype=object)
    d = np.asarray(e.column("dst").to_pylist(), dtype=object)
    pages = pq.read_table(
        os.path.join(ORACLE_TABLE_DIR, "pages.parquet"),
        columns=["canonical_url", "response_time_ms", "fetched"],
    ).to_pandas()
    wmap = (
        pages[pages["fetched"]]
        .groupby("canonical_url")["response_time_ms"]
        .min()
        .to_dict()
    )
    w = np.asarray([int(wmap.get(x, 1000)) for x in d], np.int64)
    lo = np.minimum(s, d)
    hi = np.maximum(s, d)
    und = (
        pd.DataFrame({"a": lo, "b": hi, "w": w})
        .groupby(["a", "b"], as_index=False)["w"].min()
    )
    keep = msf_kernel(und["a"].to_numpy(), und["b"].to_numpy(), und["w"].to_numpy())
    out = und.iloc[keep].sort_values(["a", "b"]).reset_index(drop=True)
    out["w"] = out["w"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


_NOARG_TWINS["crawl_mst"] = twin_crawl_mst


def twin_part_densest(sf_dir: str) -> pa.Table:
    """Serial densest subgraph over the strong part edges — the SAME pure
    kernel (ops/graph.densest_kernel), so the distributed peeling rounds
    must reproduce the exact member set."""
    from ..ops.graph import densest_kernel

    ed = _strong_part_edges_serial(sf_dir)
    members = densest_kernel(
        ed["a"].to_numpy().astype(np.int64), ed["b"].to_numpy().astype(np.int64)
    )
    return pa.table({"part": pa.array(members, pa.int64())})


_SF_TWINS["part_densest"] = twin_part_densest


def twin_recrawl_rates() -> pa.Table:
    """Serial per-host change rates over the oracle's per-URL diff table —
    same host extraction, same exact counts, and the SAME shared
    fixed-point estimator (functions/text.change_rate_fp) as
    q_recrawl_rates, so every λ value must hash-match."""
    from .queries import ORACLE_TABLE_DIR, ensure_oracle_tables
    from ..functions.text import change_rate_fp

    ensure_oracle_tables()
    d = pq.read_table(os.path.join(ORACLE_TABLE_DIR, "diff_urls.parquet")).to_pandas()
    d["host"] = d["url"].str.split("/").str[2]
    tot = d.groupby(["host", "status"]).size().unstack(fill_value=0)
    for c in ("changed", "unchanged", "added", "removed"):
        if c not in tot.columns:
            tot[c] = 0
    out = pd.DataFrame(
        {
            "host": tot.index,
            "n_checked": (tot["changed"] + tot["unchanged"]).to_numpy(np.int64),
            "n_changed": tot["changed"].to_numpy(np.int64),
            "n_added": tot["added"].to_numpy(np.int64),
            "n_removed": tot["removed"].to_numpy(np.int64),
        }
    )
    out["lambda_fp"] = change_rate_fp(
        out["n_changed"].to_numpy(), out["n_checked"].to_numpy()
    )
    return pa.Table.from_pandas(
        out.sort_values("host").reset_index(drop=True), preserve_index=False
    )


_NOARG_TWINS["recrawl_rates"] = twin_recrawl_rates


def twin_part_betweenness(sf_dir: str, k: int = 8) -> pa.Table:
    """Serial sampled-source betweenness over the strong part edges — the
    SAME pure kernel (ops/graph.betweenness_kernel) with the SAME hash-min
    seed sample and top-20 tie policy, so the distributed rounds must
    reproduce every fixed-point value bit-for-bit."""
    from ..ops.graph import _hashmin_sample, betweenness_kernel

    ed = _strong_part_edges_serial(sf_dir)
    a = ed["a"].to_numpy().astype(np.int64)
    b = ed["b"].to_numpy().astype(np.int64)
    nodes = np.unique(np.concatenate([a, b]))
    seeds = _hashmin_sample(nodes, k)
    out_nodes, bc_fp = betweenness_kernel(a, b, seeds)
    df = pd.DataFrame({"node": out_nodes, "bc_fp": bc_fp}).sort_values(
        ["bc_fp", "node"], ascending=[False, True], kind="stable"
    ).head(20)
    return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)


_SF_TWINS["part_betweenness"] = twin_part_betweenness


def twin_mmr_diverse(sf_dir: str, k: int = 10, pool: int = 50) -> pa.Table:
    """Serial MMR over the full embedding table — same top-pool candidate
    order (cos DESC, id ASC) and the SAME pure greedy kernel
    (ops/similarity.mmr_kernel) on the id-sorted pool, so the ranked ids
    must hash-match the distributed scan."""
    from ..ops.similarity import _matrix, mmr_kernel

    df = pq.read_table(os.path.join(sf_dir, "embeddings.parquet")).to_pandas()
    qrow = df[df["vec_id"] == 0]
    qids, Q = _matrix(qrow, "vec_id")
    qv = Q[0]
    cand = df[df["vec_id"] != 0]
    ids, M = _matrix(cand, "vec_id")
    cos = M @ qv
    idx = np.lexsort((ids, -cos))[:pool]
    ids, M = ids[idx], M[idx]
    order = np.argsort(ids, kind="stable")
    out = mmr_kernel(qv, ids[order].astype(np.int64), M[order], k=k)
    return pa.Table.from_pandas(out, preserve_index=False)


_SF_TWINS["mmr_diverse"] = twin_mmr_diverse


def twin_jl_projection(sf_dir: str, d_out: int = 16, seed: int = 97) -> pa.Table:
    """Serial JL projection over the full embedding table — SAME
    deterministic sign matrix and fixed-point kernel
    (ops/similarity.jl_matrix / jl_project_rows), so every coordinate
    hash-matches the distributed map."""
    from ..ops.similarity import _matrix, jl_matrix, jl_project_rows

    df = pq.read_table(os.path.join(sf_dir, "embeddings.parquet")).to_pandas()
    ids, M = _matrix(df, "vec_id")
    out = jl_project_rows(ids, M, jl_matrix(M.shape[1], d_out, seed))
    return pa.Table.from_pandas(
        out.sort_values(["vec_id", "dim"]).reset_index(drop=True),
        preserve_index=False,
    )


_SF_TWINS["jl_projection"] = twin_jl_projection


def twin_link_robustness() -> pa.Table:
    """Serial targeted-attack robustness over the oracle link edges — the
    SAME pure kernel (ops/graph.robustness_kernel) with the same removal
    total order, so every curve point must hash-match."""
    from .queries import ORACLE_TABLE_DIR, ensure_oracle_tables
    from ..ops.graph import robustness_kernel

    ensure_oracle_tables()
    e = pq.read_table(os.path.join(ORACLE_TABLE_DIR, "link_edges.parquet"))
    out = robustness_kernel(
        np.asarray(e.column("src").to_pylist(), dtype=object),
        np.asarray(e.column("dst").to_pylist(), dtype=object),
    )
    return pa.Table.from_pandas(
        out.sort_values("pct_removed").reset_index(drop=True), preserve_index=False
    )


_NOARG_TWINS["link_robustness"] = twin_link_robustness


def twin_embedding_outliers(sf_dir: str, k: int = 10) -> pa.Table:
    """Serial per-label centroid outliers — SAME fixed-point rounding and
    pure kernel (ops/similarity.centroid_outlier_kernel), so every
    distance hash-matches the distributed partial-sum path."""
    from ..ops.similarity import _KMEANS_FP, centroid_outlier_kernel

    df = pq.read_table(os.path.join(sf_dir, "embeddings.parquet")).to_pandas()
    M = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    M_fp = np.round(M * _KMEANS_FP).astype(np.int64)
    out = centroid_outlier_kernel(
        df["vec_id"].to_numpy(np.int64), df["label"].to_numpy(np.int64), M_fp, k=k
    )
    return pa.Table.from_pandas(out, preserve_index=False)


_SF_TWINS["embedding_outliers"] = twin_embedding_outliers


def twin_keyword_textrank(
    sf_dir: str, n_iter: int = 8, d: float = 0.85, k: int = 30
) -> pa.Table:
    """Serial TextRank — the SAME word co-occurrence edge derivation
    (adjacent tokens, unordered count ≥ 2, symmetric) and the same power
    iteration in the canonical (dst, src) edge order as the pagerank
    driver path, so every rank bit matches."""
    from ..ops.textstats import tokenize

    df = _docs_table(sf_dir).to_pandas()
    toks = tokenize(df.set_index("doc_id")["text"])
    ids = toks.index.to_numpy(np.int64)
    vals = toks.to_numpy(object)
    a, b = vals[:-1], vals[1:]
    same = (ids[:-1] == ids[1:]) & (a != b)
    a, b = a[same], b[same]
    lo = np.where(a < b, a, b)
    hi = np.where(a < b, b, a)
    cnt = pd.DataFrame({"lo": lo, "hi": hi}).groupby(
        ["lo", "hi"], as_index=False
    ).size()
    cnt = cnt[cnt["size"] >= 2]
    s = np.concatenate([cnt["lo"].to_numpy(object), cnt["hi"].to_numpy(object)])
    t = np.concatenate([cnt["hi"].to_numpy(object), cnt["lo"].to_numpy(object)])
    nodes, inv = np.unique(np.concatenate([s, t]), return_inverse=True)
    src = inv[: len(s)]
    dst = inv[len(s):]
    order = np.lexsort((src, dst))
    src, dst = src[order], dst[order]
    n = len(nodes)
    deg = np.bincount(src, minlength=n).astype(np.int64)
    safe_deg = np.where(deg > 0, deg, 1)
    rank = np.full(n, 1.0 / n)
    base = (1.0 - d) / n
    for _ in range(n_iter):
        dangling = float(rank[deg == 0].sum())
        contrib = rank / safe_deg
        sums = np.zeros(n)
        np.add.at(sums, dst, contrib[src])
        rank = base + d * dangling / n + d * sums
    top = pd.DataFrame({"word": nodes, "rank": rank}).sort_values(
        ["rank", "word"], ascending=[False, True], kind="stable"
    ).head(k)
    return pa.table(
        {
            "word": pa.array(top["word"].tolist(), pa.string()),
            "rank": pa.array(top["rank"].to_numpy(), pa.float64()),
        }
    )


_SF_TWINS["keyword_textrank"] = twin_keyword_textrank


def twin_event_window_eh(sf_dir: str, k: int = 4) -> pa.Table:
    """Serial DGIM exponential-histogram window counts — the SAME kernel
    over each type's (ts, event_id)-sorted stream with the same one-hour
    cutoff from the global max timestamp, so every estimate hash-matches.
    The exact row is DuckDB-computed in the oracle SQL, not here."""
    from ..ops.sketches import eh_build, eh_query

    ev = _events_table(sf_dir, ["event_type", "ts", "event_id"]).to_pandas()
    ev["ts"] = ev["ts"].astype("int64")
    cutoff = int(ev["ts"].max()) - 3_600_000_000
    rows = {"event_type": [], "eh_estimate": []}
    for et in sorted(ev["event_type"].unique()):
        grp = ev[ev["event_type"] == et].sort_values(
            ["ts", "event_id"], kind="stable"
        )
        buckets = eh_build(grp["ts"].to_numpy(), k=k)
        rows["event_type"].append(et)
        rows["eh_estimate"].append(eh_query(buckets, cutoff))
    return pa.table(
        {
            "event_type": pa.array(rows["event_type"], pa.string()),
            "eh_estimate": pa.array(
                np.asarray(rows["eh_estimate"], np.int64)
            ),
        }
    )


_SF_TWINS["event_window_eh"] = twin_event_window_eh
