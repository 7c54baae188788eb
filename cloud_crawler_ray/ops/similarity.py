"""Similarity search over an embedding column (list<float>).

- ``knn_brute``: exact cosine top-k — each batch does one numpy f64 matmul
  against the broadcast query matrix (ray.put once, read per task), partial
  top-k per batch, final merge per query. The exact baseline.
- ``knn_ivf``: IVF-style scale path — deterministic k-means (fixed seed,
  fixed iterations) builds nlist centroids, vectors are bucketed by nearest
  centroid, queries probe the nprobe nearest buckets only. Recall measured
  against the brute-force baseline in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _matrix(df: pd.DataFrame, id_col: str) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(df[id_col])
    M = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    return ids, M


def knn_brute(
    emb: rd.Dataset,
    queries: pd.DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
) -> pa.Table:
    """Exact top-k cosine neighbors for each query row (excluding self-id).
    Output: (query_id, neighbor_id, rank) with ties broken by neighbor_id —
    integer output so oracle comparison is exact."""
    qids, Q = _matrix(queries, id_col)
    qref = ray.put((qids, Q))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        qids_, Q_ = ray.get(qref)
        bids, B = _matrix(batch, id_col)
        sims = Q_ @ B.T  # (nq, nb)
        rows = {"query_id": [], "neighbor_id": [], "cos": []}
        top = min(k + 1, sims.shape[1])  # +1 in case self is in this batch
        for qi in range(sims.shape[0]):
            # (cos desc, neighbor_id asc) — ties at the cut keep the lowest
            # id, matching the SQL oracle's row_number ordering exactly
            idx = np.lexsort((bids, -sims[qi]))[:top]
            for j in idx:
                if bids[j] != qids_[qi]:
                    rows["query_id"].append(int(qids_[qi]))
                    rows["neighbor_id"].append(int(bids[j]))
                    rows["cos"].append(float(sims[qi, j]))
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cos"])

    partials = emb.map_batches(partial, batch_format="pandas", batch_size=2048)

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["cos", "neighbor_id"], ascending=[False, True]
        ).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    out = partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")
    pdf = out.to_pandas().sort_values(["query_id", "rank"])
    return pa.Table.from_pandas(pdf, preserve_index=False)


def kmeans_fit(M: np.ndarray, nlist: int, iters: int = 8, seed: int = 5) -> np.ndarray:
    """Deterministic mini k-means on (already normalized) vectors."""
    rng = np.random.default_rng(seed)
    cent = M[rng.choice(len(M), size=min(nlist, len(M)), replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(M @ cent.T, axis=1)
        for c in range(len(cent)):
            members = M[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 1e-12:
                    cent[c] = v / n
    return cent


# ---------------------------------------------------------------------------
# Shared pure kernels — used by BOTH the distributed ops below and the
# serial twins in pipelines/serial_twins.py. Everything here is a
# deterministic pure function of its input multiset (no RNG state beyond
# fixed seeds, integer accumulation where summation order would otherwise
# depend on block structure), so a DuckDB hash match against the twin
# proves the distributed execution — partitioning, broadcast, partial
# merges — reproduces serial semantics bit-for-bit.
# ---------------------------------------------------------------------------

# Fixed-point scale for integer-exact center reduces: components ≤1.0 →
# per-component int ≤2^32, so int64 sums stay exact up to ~2×10^9 rows per
# cluster; at larger cluster cardinalities drop the scale (2^24 still gives
# 6e-8 center resolution — far below k-means' own convergence tolerance).
_KMEANS_FP = float(1 << 32)


def _id_hash(ids: np.ndarray) -> np.ndarray:
    """Knuth multiplicative hash of int ids — the sampling key."""
    return (
        (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(2**32)
    ).astype(np.int64)


def hash_min_sample(
    emb: rd.Dataset, cap: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> pd.DataFrame:
    """Deterministic block-independent sample: the ``cap`` rows with the
    smallest (hash(id), id). Each block prefilters to ≤cap candidates (one
    lexsort), the driver keeps the global head — equal to the serial head
    under ANY partitioning, because per-block (h, id) minima are a superset
    of the global minima."""

    def part(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy()
        h = _id_hash(ids)
        take = np.lexsort((ids, h))[:cap]
        return pd.DataFrame(
            {
                "h": h[take],
                id_col: ids[take],
                vec_col: df[vec_col].to_numpy()[take],
            }
        )

    samp = emb.map_batches(part, batch_format="pandas").to_pandas()
    return (
        samp.sort_values(["h", id_col], kind="stable").head(cap).reset_index(drop=True)
    )


def hash_min_sample_serial(ids: np.ndarray, M: np.ndarray, cap: int) -> np.ndarray:
    """Serial equivalent of hash_min_sample on an in-memory matrix."""
    take = np.lexsort((ids, _id_hash(ids)))[:cap]
    return M[take]


def greedy_seeds(S: np.ndarray, k_eff: int) -> np.ndarray:
    """Greedy farthest-point seeding over a (h, id)-ordered sample: first
    seed = min-hash row, then repeatedly the point maximizing min-distance
    to the chosen seeds, ties to the lowest (h, id) position — no RNG."""
    chosen = [0]
    mind = ((S - S[0]) ** 2).sum(axis=1)
    for _ in range(1, k_eff):
        nxt = int(np.argmax(mind))  # ties → lowest position = lowest (h, id)
        chosen.append(nxt)
        mind = np.minimum(mind, ((S - S[nxt]) ** 2).sum(axis=1))
    return S[chosen].copy()


def lloyd_assign(M: np.ndarray, centers: np.ndarray) -> np.ndarray:
    """argmin ||x-c||² = argmax x·c − ||c||²/2 — one matmul per call."""
    scores = M @ centers.T - 0.5 * (centers * centers).sum(axis=1)
    return np.argmax(scores, axis=1)


def fp_partials(
    M: np.ndarray, assign: np.ndarray, k_eff: int
) -> tuple[np.ndarray, np.ndarray]:
    """(counts, fixed-point int64 vector sums) per cluster — integer sums
    are associative, so the reduce is exact under any block structure and
    arrival order (the float version's summation order leaked the
    partitioning into the result bits)."""
    Mfp = np.rint(M * _KMEANS_FP).astype(np.int64)
    sums = np.zeros((k_eff, M.shape[1]), np.int64)
    np.add.at(sums, assign, Mfp)
    counts = np.bincount(assign, minlength=k_eff).astype(np.int64)
    return counts, sums


def centers_from_partials(
    centers_prev: np.ndarray, counts: np.ndarray, isums: np.ndarray
) -> np.ndarray:
    """Center update from exact integer partials; empty clusters keep their
    previous center. One shared expression so twin and engine divide in
    the same order (float division is not associative)."""
    centers = centers_prev.copy()
    nonempty = counts > 0
    centers[nonempty] = isums[nonempty] / counts[nonempty, None] / _KMEANS_FP
    return centers


def kmeans_serial(
    ids: np.ndarray, M: np.ndarray, k: int, n_iter: int, sample_cap: int = 4096
) -> tuple[np.ndarray, np.ndarray]:
    """Single-threaded twin of ``kmeans`` below: same hash-min sample, same
    greedy seeding, same integer-exact Lloyd iterations — bit-identical
    centers and assignments. Returns (centers, assignment)."""
    S = hash_min_sample_serial(ids, M, max(k, sample_cap))
    k_eff = min(k, len(S))
    centers = greedy_seeds(S, k_eff)
    for _ in range(n_iter):
        assign = lloyd_assign(M, centers)
        counts, isums = fp_partials(M, assign, k_eff)
        centers = centers_from_partials(centers, counts, isums)
    return centers, lloyd_assign(M, centers)


def pq_fit_books(S: np.ndarray, m: int, n_centroids: int) -> np.ndarray:
    """Per-subspace plain-L2 k-means on an L2-normalized, (h, id)-ordered
    sample — deterministic seeding by sample order, empty clusters keep
    their centers. Pure; shared by pq_train and its serial twin."""
    dim = S.shape[1]
    assert dim % m == 0, (dim, m)
    dsub = dim // m
    books = np.zeros((m, n_centroids, dsub))
    for j in range(m):
        sub = S[:, j * dsub : (j + 1) * dsub].copy()
        cent = sub[: min(n_centroids, len(sub))].copy()
        for _ in range(8):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(len(cent)):
                mem = sub[assign == c]
                if len(mem):
                    cent[c] = mem.mean(axis=0)
        if len(cent) < n_centroids:
            cent = np.vstack([cent, np.zeros((n_centroids - len(cent), dsub))])
        books[j] = cent
    return books


def knn_ivf(
    emb: rd.Dataset,
    queries: pd.DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    sample_rows: int = 4096,
) -> pa.Table:
    """IVF approximate top-k: centroids from a driver-side deterministic
    hash-min sample (block-independent, so the serial twin reproduces it
    under any partitioning), cluster assignment distributed, queries scan
    only their nprobe closest clusters."""
    sample = hash_min_sample(emb, sample_rows, id_col=id_col)
    _, S = _matrix(sample, id_col)
    cent = kmeans_fit(S, nlist)
    cent_ref = ray.put(cent)
    qids, Q = _matrix(queries, id_col)
    qprobe = np.argsort(-(Q @ cent.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    probe_of_cluster: dict[int, list[int]] = {}
    for qi, clusters in enumerate(qprobe):
        for c in clusters:
            probe_of_cluster.setdefault(int(c), []).append(qi)
    probe_ref = ray.put((qids, Q, probe_of_cluster))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cent_ = ray.get(cent_ref)
        qids_, Q_, probes = ray.get(probe_ref)
        bids, B = _matrix(batch, id_col)
        assign = np.argmax(B @ cent_.T, axis=1)
        rows = {"query_id": [], "neighbor_id": [], "cos": []}
        for c in np.unique(assign):
            quers = probes.get(int(c), [])
            if not quers:
                continue
            mask = assign == c
            sub_ids, sub = bids[mask], B[mask]
            sims = Q_[quers] @ sub.T
            top = min(k + 1, sims.shape[1])
            for row, qi in enumerate(quers):
                idx = np.lexsort((sub_ids, -sims[row]))[:top]
                for j in idx:
                    if sub_ids[j] != qids_[qi]:
                        rows["query_id"].append(int(qids_[qi]))
                        rows["neighbor_id"].append(int(sub_ids[j]))
                        rows["cos"].append(float(sims[row, j]))
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cos"])

    partials = emb.map_batches(partial, batch_format="pandas", batch_size=2048)

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cos", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    out = partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")
    pdf = out.to_pandas().sort_values(["query_id", "rank"])
    return pa.Table.from_pandas(pdf, preserve_index=False)


def kmeans(
    emb: rd.Dataset,
    k: int = 8,
    n_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, rd.Dataset]:
    """Distributed Lloyd's k-means over the full embedding Dataset (the
    corpus-clustering op a mixture-balancing pipeline needs; the driver-side
    sample variant above, ``kmeans_fit``, serves only knn_ivf's coarse
    quantizer). Returns (centers [k×dim], assignments Dataset (id, cluster)).

    Shape: seeding draws a deterministic hash-min sample (≤4096 rows, one
    pass — the knn_ivf coarse-quantizer pattern) and runs greedy
    farthest-point selection on it driver-side (first seed = min-hash row,
    then repeatedly the sample point maximizing min-distance to the chosen
    seeds, ties to the lowest id — no RNG state, and unlike raw hash-min it
    cannot drop two seeds into one dense blob). Each Lloyd iteration
    broadcasts the k×dim center matrix once (ray.put) and every block emits
    k partial rows (count, FIXED-POINT int64 vector sum per cluster) from
    one argmin + np.add.at pass — no shuffle anywhere, driver combines
    k×#blocks rows and holds O(k·dim) ints. Integer partials make the
    reduce exact and order-free, so the result is bit-identical to
    ``kmeans_serial`` under any partitioning (DuckDB-hash-checked via the
    serial twin). Empty clusters keep their previous center. Assignment
    pass reuses the final centers map-side."""
    emb = emb.materialize()
    sample_cap = max(k, 4096)
    samp = hash_min_sample(emb, sample_cap, id_col=id_col, vec_col=vec_col)
    S = np.stack(samp[vec_col].to_numpy()).astype(np.float64)
    k_eff = min(k, len(S))
    centers = greedy_seeds(S, k_eff)

    def part_sums(df: pd.DataFrame, ref) -> pd.DataFrame:
        cent = ray.get(ref)
        M = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        assign = lloyd_assign(M, cent)
        counts, isums = fp_partials(M, assign, k_eff)
        return pd.DataFrame(
            {
                "cluster": np.arange(k_eff, dtype=np.int64),
                "n": counts,
                "vsum": list(isums),
            }
        )

    for _ in range(n_iter):
        ref = ray.put(centers)
        parts = emb.map_batches(
            lambda df, ref=ref: part_sums(df, ref), batch_format="pandas"
        ).to_pandas()
        counts = np.zeros(k_eff, np.int64)
        isums = np.zeros((k_eff, centers.shape[1]), np.int64)
        for c, grp in parts.groupby("cluster"):
            counts[c] = grp["n"].sum()
            isums[c] = np.add.reduce(np.stack(grp["vsum"].to_numpy()), axis=0)
        centers = centers_from_partials(centers, counts, isums)

    final_ref = ray.put(centers)

    def assign_block(df: pd.DataFrame) -> pd.DataFrame:
        cent = ray.get(final_ref)
        M = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "cluster": lloyd_assign(M, cent).astype(np.int64),
            }
        )

    return centers, emb.map_batches(assign_block, batch_format="pandas")


# ---------------------------------------------------------------------------
# Product quantization (PQ): compressed-domain ANN — the 100-TB memory path
# ---------------------------------------------------------------------------


def pq_train(
    emb: rd.Dataset,
    m: int = 8,
    n_centroids: int = 256,
    id_col: str = "vec_id",
    sample_cap: int = 4096,
) -> np.ndarray:
    """Train PQ codebooks (Jégou et al. 2011, "Product Quantization for
    Nearest Neighbor Search"): split the vector into ``m`` subspaces, k-means
    each subspace to ``n_centroids`` centroids. Training runs driver-side on
    a deterministic hash-min sample (≤ sample_cap rows, one map pass — the
    knn_ivf coarse-quantizer pattern; (h, id)-tiebroken so the sample is
    block-independent); the corpus itself never leaves its blocks. Returns
    codebooks float64[m, n_centroids, dim/m]."""
    samp = hash_min_sample(emb, sample_cap, id_col=id_col)
    S = np.stack(samp["embedding"].to_numpy()).astype(np.float64)
    # codebooks live in the L2-normalized domain — the same domain the
    # query LUTs and block scans use (cosine == dot on unit vectors)
    S /= np.maximum(np.linalg.norm(S, axis=1, keepdims=True), 1e-12)
    # plain L2 k-means per subspace (subvectors are not unit-norm):
    # deterministic seeding by sample order, empty clusters keep centers
    return pq_fit_books(S, m, n_centroids)


def pq_encode(
    emb: rd.Dataset, codebooks: np.ndarray, id_col: str = "vec_id"
) -> rd.Dataset:
    """Encode every vector to m uint8 codes (one broadcast of the codebooks
    via ray.put, one vectorized map pass — dim×8 bytes → m bytes per vector,
    a 32× shrink at dim=64/m=8: the compression that lets a 10^10-vector
    index fit the object store)."""
    m, n_centroids, dsub = codebooks.shape
    ref = ray.put(codebooks)

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        books = ray.get(ref)
        M = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        codes = np.zeros((len(M), m), np.uint8)
        for j in range(m):
            sub = M[:, j * dsub : (j + 1) * dsub]
            # ||x-c||² argmin via the dot-product trick: one matmul per block
            d = sub @ books[j].T - 0.5 * (books[j] * books[j]).sum(axis=1)
            codes[:, j] = np.argmax(d, axis=1).astype(np.uint8)
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "code": list(codes),
            }
        )

    return emb.map_batches(encode, batch_format="pandas")


def knn_pq(
    emb: rd.Dataset,
    queries: pd.DataFrame,
    k: int = 10,
    m: int = 8,
    n_centroids: int = 256,
    id_col: str = "vec_id",
) -> pa.Table:
    """Approximate top-k by asymmetric distance computation over PQ codes:
    per query, an m×n_centroids lookup table of subspace dot products
    broadcasts once; each code block scores every row with m table gathers
    + a sum (no float vectors touched after encoding). Same output shape and
    tie-breaking as knn_brute — (query_id, neighbor_id, rank) — so recall is
    directly measurable against it (pytest pins it on clustered data).

    Scale: scans compressed codes (m bytes/vector), so the scan path moves
    32× less data than brute force; compose with the IVF bucketing in
    knn_ivf for sub-linear candidate generation when the corpus outgrows
    full scans."""
    books = pq_train(emb, m=m, n_centroids=n_centroids, id_col=id_col)
    codes = pq_encode(emb, books, id_col=id_col)

    qids, Q = _matrix(queries, id_col)
    dsub = books.shape[2]
    # LUT[qi, j, c] = q_sub · c_sub — queries stay full-precision (asymmetric)
    lut = np.einsum("qjd,jcd->qjc", Q.reshape(len(Q), m, dsub), books)
    qref = ray.put((qids, lut))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        qids_, lut_ = ray.get(qref)
        bids = df[id_col].to_numpy()
        C = np.stack(df["code"].to_numpy()).astype(np.int64)  # (nb, m)
        # scores (nq, nb): gather each subspace column then sum
        scores = np.zeros((len(qids_), len(bids)))
        for j in range(C.shape[1]):
            scores += lut_[:, j, :][:, C[:, j]]
        rows = {"query_id": [], "neighbor_id": [], "score": []}
        top = min(k + 1, scores.shape[1])
        for qi in range(scores.shape[0]):
            idx = np.lexsort((bids, -scores[qi]))[:top]
            for j in idx:
                if bids[j] != qids_[qi]:
                    rows["query_id"].append(int(qids_[qi]))
                    rows["neighbor_id"].append(int(bids[j]))
                    rows["score"].append(float(scores[qi, j]))
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "score"])

    partials = codes.map_batches(partial, batch_format="pandas", batch_size=4096)

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["score", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    out = partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")
    pdf = out.to_pandas().sort_values(["query_id", "rank"])
    return pa.Table.from_pandas(pdf, preserve_index=False)


def knn_ivfpq(
    emb: rd.Dataset,
    queries: pd.DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    m: int = 8,
    n_centroids: int = 256,
    id_col: str = "vec_id",
    sample_rows: int = 4096,
) -> pa.Table:
    """IVF-PQ: the composed scale path — IVF coarse lists make candidate
    generation sub-linear (only nprobe of nlist lists are scanned per
    query), PQ codes make the scan itself compressed-domain (m bytes per
    vector, lookup-table gathers — knn_pq's ADC). At 10^10 vectors this is
    the memory-AND-compute bound variant: neither the full float matrix nor
    a full scan ever happens. One pass assigns lists and encodes codes
    together; the scan pass touches only probed (list, code) rows. Output
    shape/tie-breaks match knn_brute (recall pinned by pytest)."""
    sample = hash_min_sample(emb, sample_rows, id_col=id_col)
    _, S = _matrix(sample, id_col)
    cent = kmeans_fit(S, nlist)
    books = pq_train(emb, m=m, n_centroids=n_centroids, id_col=id_col)
    dsub = books.shape[2]
    cent_ref = ray.put(cent)
    books_ref = ray.put(books)

    qids, Q = _matrix(queries, id_col)
    qprobe = np.argsort(-(Q @ cent.T), axis=1)[:, :nprobe]
    probe_of_cluster: dict[int, list[int]] = {}
    for qi, clusters in enumerate(qprobe):
        for c in clusters:
            probe_of_cluster.setdefault(int(c), []).append(qi)
    lut = np.einsum("qjd,jcd->qjc", Q.reshape(len(Q), m, dsub), books)
    probe_ref = ray.put((qids, lut, probe_of_cluster))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cent_ = ray.get(cent_ref)
        books_ = ray.get(books_ref)
        qids_, lut_, probes = ray.get(probe_ref)
        bids, B = _matrix(batch, id_col)
        assign = np.argmax(B @ cent_.T, axis=1)
        # encode the block once (normalized rows — match the LUT domain)
        codes = np.zeros((len(B), m), np.int64)
        for j in range(m):
            sub = B[:, j * dsub : (j + 1) * dsub]
            d = sub @ books_[j].T - 0.5 * (books_[j] * books_[j]).sum(axis=1)
            codes[:, j] = np.argmax(d, axis=1)
        rows = {"query_id": [], "neighbor_id": [], "score": []}
        for c in np.unique(assign):
            quers = probes.get(int(c), [])
            if not quers:
                continue
            mask = assign == c
            sub_ids, sub_codes = bids[mask], codes[mask]
            scores = np.zeros((len(quers), len(sub_ids)))
            for j in range(m):
                scores += lut_[quers][:, j, :][:, sub_codes[:, j]]
            top = min(k + 1, scores.shape[1])
            for row, qi in enumerate(quers):
                idx = np.lexsort((sub_ids, -scores[row]))[:top]
                for j in idx:
                    if sub_ids[j] != qids_[qi]:
                        rows["query_id"].append(int(qids_[qi]))
                        rows["neighbor_id"].append(int(sub_ids[j]))
                        rows["score"].append(float(scores[row, j]))
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "score"])

    partials = emb.map_batches(partial, batch_format="pandas", batch_size=4096)

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["score", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    out = partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")
    pdf = out.to_pandas().sort_values(["query_id", "rank"])
    return pa.Table.from_pandas(pdf, preserve_index=False)


# ---------------------------------------------------------------------------
# Margin-based pair mining (Artetxe & Schwenk, "Margin-based parallel
# corpus mining with multilingual sentence embeddings", ACL 2019). The
# bitext-mining shape: between two embedding sets A and B, score candidate
# pairs by the RATIO margin  2·cos(x,y) / (avgK(x→B) + avgK(y→A))  —
# absolute cosine fails under hubness; the margin normalizes by each
# side's local neighborhood density — and keep pairs that are mutual best
# above a threshold. Margins are floored to 2^20 fixed point so outputs
# are integer-comparable between the distributed op and the serial twin.
# ---------------------------------------------------------------------------

_MARGIN_FP = 1 << 20


def margin_candidates(
    aids: np.ndarray, A: np.ndarray,
    bids: np.ndarray, B: np.ndarray,
    bavg: np.ndarray, k: int,
) -> pd.DataFrame:
    """Candidate (a, b, margin_fp) rows: each a's top-k cosine neighbors in
    B (ties → smallest b id), margin = 2·cos/(avgK(a→B) + bavg[b]).
    Pure — the serial twin runs THIS code over the full matrices; the
    distributed op runs it per A-block against the broadcast B (row-panel
    matmuls produce the same per-row floats, the knn_brute precedent)."""
    rows_a, rows_b, rows_m = [], [], []
    if not len(aids) or not len(bids):
        return pd.DataFrame(
            {
                "a": pd.Series([], dtype=np.int64),
                "b": pd.Series([], dtype=np.int64),
                "margin_fp": pd.Series([], dtype=np.int64),
            }
        )
    sims = A @ B.T
    ka = min(k, len(bids))
    for i in range(len(aids)):
        idx = np.lexsort((bids, -sims[i]))[:ka]
        fwd_avg = float(np.mean(sims[i, idx]))
        marg = 2.0 * sims[i, idx] / (fwd_avg + bavg[idx])
        rows_a.extend([int(aids[i])] * ka)
        rows_b.extend(int(bids[j]) for j in idx)
        rows_m.extend(np.floor(marg * _MARGIN_FP).astype(np.int64).tolist())
    return pd.DataFrame(
        {
            "a": np.asarray(rows_a, np.int64),
            "b": np.asarray(rows_b, np.int64),
            "margin_fp": np.asarray(rows_m, np.int64),
        }
    )


def mutual_margin_pairs(cand: pd.DataFrame, threshold_fp: int) -> pd.DataFrame:
    """Mutual-best filter over the candidate pair set: (a, b) survives iff
    b is a's best candidate AND a is b's best (margin desc, id asc ties)
    AND margin ≥ threshold. Pure pandas — shared by twin and op."""
    if not len(cand):
        return cand.copy()
    fwd = (
        cand.sort_values(["a", "margin_fp", "b"], ascending=[True, False, True])
        .drop_duplicates("a")
    )
    bwd = (
        cand.sort_values(["b", "margin_fp", "a"], ascending=[True, False, True])
        .drop_duplicates("b")
    )
    out = fwd.merge(bwd[["a", "b"]], on=["a", "b"], how="inner")
    out = out[out["margin_fp"] >= threshold_fp]
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def margin_mine(
    emb: rd.Dataset,
    label_a: int = 0,
    label_b: int = 1,
    k: int = 4,
    threshold: float = 1.0,
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Mine aligned pairs between two labeled embedding sets by the ratio
    margin. Output (a, b, margin_fp), mutual best above threshold.

    Distributed shape: side B broadcasts ONCE via ray.put (the smaller/
    query side by convention — at 10^10×10^6 scale B is the small corpus;
    for B beyond broadcast, shard B and merge per-a partial top-k exactly
    as knn_brute does — structure unchanged). Two streaming passes over A:
    (1) per-block column top-k partials → exact per-b top-k merge →
    bavg(y→A), a |B|-row table broadcast back; (2) per-block candidate
    generation via the shared kernel. The mutual-best reduction runs over
    ≤ |A|·k candidate rows, never the corpus."""
    import pyarrow.compute as pc
    import ray

    def side(lbl):
        return emb.map_batches(
            lambda t, lbl=lbl: t.filter(pc.equal(t.column("label"), lbl)),
            batch_format="pyarrow",
        )

    empty = pd.DataFrame(
        {
            "a": pd.Series([], dtype=np.int64),
            "b": pd.Series([], dtype=np.int64),
            "margin_fp": pd.Series([], dtype=np.int64),
        }
    )
    b_pdf = side(label_b).to_pandas()
    if not len(b_pdf):
        return empty
    bids, B = _matrix(b_pdf, id_col)
    a_ds = side(label_a).materialize()
    if a_ds.count() == 0:
        return empty
    bref = ray.put((bids, B))

    def bwd_partial(batch: pd.DataFrame) -> pd.DataFrame:
        bids_, B_ = ray.get(bref)
        _aids, A_ = _matrix(batch, id_col)
        sims = A_ @ B_.T  # (na_blk, nb)
        kk = min(k, sims.shape[0])
        # per-b top-kk cos values within this block
        part = np.sort(sims, axis=0)[::-1][:kk]  # (kk, nb) desc
        return pd.DataFrame(
            {
                "b": np.repeat(bids_, part.shape[0]).astype(np.int64),
                "cos": part.T.reshape(-1),
            }
        )

    def bwd_merge(g: pd.DataFrame) -> pd.DataFrame:
        kk = min(k, len(g))
        top = np.sort(g["cos"].to_numpy())[::-1][:kk]
        return pd.DataFrame(
            {"b": [int(g["b"].iloc[0])], "bavg": [float(np.mean(top))]}
        )

    bavg_pdf = (
        a_ds.map_batches(bwd_partial, batch_format="pandas", batch_size=2048)
        .groupby("b")
        .map_groups(bwd_merge, batch_format="pandas")
        .to_pandas()
    )
    # align bavg to bids order
    bavg = (
        bavg_pdf.set_index("b").reindex(bids.astype(np.int64))["bavg"].to_numpy()
    )
    bref2 = ray.put((bids, B, bavg))

    def fwd_partial(batch: pd.DataFrame) -> pd.DataFrame:
        bids_, B_, bavg_ = ray.get(bref2)
        aids_, A_ = _matrix(batch, id_col)
        return margin_candidates(aids_, A_, bids_, B_, bavg_, k)

    cand = (
        a_ds.map_batches(fwd_partial, batch_format="pandas", batch_size=2048)
        .to_pandas()
    )
    return mutual_margin_pairs(cand, int(np.floor(threshold * _MARGIN_FP)))


def hard_negatives(
    emb: rd.Dataset,
    anchors: pd.DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    label_col: str = "label",
) -> pa.Table:
    """Hard-negative mining for contrastive/retrieval training: for each
    anchor, the top-k most-similar vectors with a DIFFERENT label — the
    negatives that actually move a contrastive loss (random negatives are
    too easy). Same shape as knn_brute: the small anchor side broadcasts
    once via ray.put, the corpus STREAMS in blocks (one f64 matmul + a
    label mask per block, per-anchor partial top-k, exact merge per
    anchor). Output (query_id, neighbor_id, rank), ties → smallest id —
    integer output, directly SQL-checkable. At corpus scales where even
    per-anchor brute force is too slow, mine within IVF buckets
    (knn_ivf's partitioning) — structure unchanged."""
    qids = np.asarray(anchors[id_col]).astype(np.int64)
    qlabels = np.asarray(anchors[label_col]).astype(np.int64)
    _, Q = _matrix(anchors, id_col)
    qref = ray.put((qids, qlabels, Q))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        qids_, qlabels_, Q_ = ray.get(qref)
        bids, B = _matrix(batch, id_col)
        blabels = np.asarray(batch[label_col]).astype(np.int64)
        sims = Q_ @ B.T
        rows = {"query_id": [], "neighbor_id": [], "cos": []}
        for qi in range(sims.shape[0]):
            ok = blabels != qlabels_[qi]
            if not ok.any():
                continue
            cand_ids, cand_cos = bids[ok], sims[qi, ok]
            idx = np.lexsort((cand_ids, -cand_cos))[: min(k, len(cand_ids))]
            rows["query_id"].extend([int(qids_[qi])] * len(idx))
            rows["neighbor_id"].extend(int(cand_ids[j]) for j in idx)
            rows["cos"].extend(float(cand_cos[j]) for j in idx)
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cos"])

    partials = emb.map_batches(partial, batch_format="pandas", batch_size=2048)

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["cos", "neighbor_id"], ascending=[False, True]
        ).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    out = partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")
    pdf = out.to_pandas().sort_values(["query_id", "rank"])
    return pa.Table.from_pandas(pdf, preserve_index=False)


def mmr_kernel(
    qv: np.ndarray,
    ids: np.ndarray,
    M: np.ndarray,
    k: int = 10,
    lam_num: int = 7,
    lam_den: int = 10,
) -> pd.DataFrame:
    """Pure Maximal-Marginal-Relevance kernel (Carbonell & Goldstein,
    SIGIR 1998) over a candidate pool: greedily pick argmax of
    λ·cos(q, d) − (1−λ)·max_{s∈selected} cos(d, s), λ = lam_num/lam_den —
    relevance minus redundancy, the dedup-aware retrieval that picks
    DIVERSE nearest neighbors. Candidates are given id-ASCENDING with
    their (already normalized) vectors, so every float op runs in one
    fixed order on both the distributed path and the serial twin;
    ties break on the lower id. Returns (rank, vec_id)."""
    n = len(ids)
    k = min(k, n)
    rel = M @ qv  # (n,)
    red = np.full(n, -1.0, np.float64)
    picked = np.zeros(n, bool)
    lam = lam_num / lam_den
    out_rank, out_id = [], []
    for r in range(k):
        score = lam * rel - (1.0 - lam) * np.where(red < 0.0, 0.0, red)
        if r == 0:
            score = lam * rel  # no redundancy term before first pick
        score[picked] = -np.inf
        best = int(np.argmax(score))  # argmax takes FIRST max -> lowest id
        picked[best] = True
        out_rank.append(r + 1)
        out_id.append(int(ids[best]))
        sims = M @ M[best]
        red = np.maximum(red, sims)
    return pd.DataFrame(
        {"rank": np.asarray(out_rank, np.int64), "vec_id": np.asarray(out_id, np.int64)}
    )


def mmr_select(
    emb: rd.Dataset,
    query: pd.DataFrame,
    k: int = 10,
    pool: int = 50,
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Distributed MMR: one streaming top-``pool`` cosine scan (per-block
    partial top-pool against the broadcast query — the knn_brute shape,
    driver sees ≤ pool rows+vectors per block partial merge), then the
    pure greedy kernel over the id-sorted pool. The pool is the only
    driver-side state — at 10^10 vectors the scan is the same one-pass
    matmul the brute-force kNN runs."""
    qids, Q = _matrix(query, id_col)
    qv = Q[0]
    qid = int(qids[0])
    qref = ray.put(qv)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        qv_ = ray.get(qref)
        bids, B = _matrix(batch, id_col)
        keep = bids != qid
        bids, B = bids[keep], B[keep]
        cos = B @ qv_
        idx = np.lexsort((bids, -cos))[:pool]
        return pd.DataFrame(
            {
                "vec_id": bids[idx],
                "cos": cos[idx],
                "vec": [v.tobytes() for v in B[idx]],
            }
        )

    parts = emb.map_batches(partial, batch_format="pandas", batch_size=2048).to_pandas()
    idx = np.lexsort((parts["vec_id"].to_numpy(), -parts["cos"].to_numpy()))[:pool]
    top = parts.iloc[idx]
    order = np.argsort(top["vec_id"].to_numpy(np.int64), kind="stable")
    ids = top["vec_id"].to_numpy(np.int64)[order]
    M = np.stack([np.frombuffer(b, np.float64) for b in top["vec"].to_numpy()[order]])
    return mmr_kernel(qv, ids, M, k=k)


_JL_FP = 1 << 20  # fixed-point scale for projected coordinates


def jl_matrix(d_in: int, d_out: int, seed: int = 97) -> np.ndarray:
    """Deterministic Achlioptas ±1 Johnson-Lindenstrauss projection matrix
    (Achlioptas, JCSS 2003: database-friendly random projections): entries
    ±1/√d_out from a fixed-seed generator, so every worker regenerates the
    IDENTICAL matrix from (d_in, d_out, seed) — nothing ships besides three
    ints."""
    rng = np.random.default_rng(seed)
    signs = rng.integers(0, 2, size=(d_in, d_out)).astype(np.float64) * 2.0 - 1.0
    return signs / np.sqrt(d_out)


def jl_project_rows(ids: np.ndarray, M: np.ndarray, R: np.ndarray) -> pd.DataFrame:
    """Project (already normalized) rows and emit LONG integer rows
    (vec_id, dim, val_fp): val_fp = floor(y·2^20) — elementwise from
    identical inputs, so distributed blocks and the serial twin agree
    bit-for-bit. Long form keeps the oracle comparison pure int64."""
    Y = M @ R
    n, d = Y.shape
    return pd.DataFrame(
        {
            "vec_id": np.repeat(ids.astype(np.int64), d),
            "dim": np.tile(np.arange(d, dtype=np.int64), n),
            "val_fp": np.floor(Y.reshape(-1) * _JL_FP).astype(np.int64),
        }
    )


def jl_project(
    emb: rd.Dataset, d_out: int = 16, seed: int = 97, id_col: str = "vec_id"
) -> rd.Dataset:
    """Distributed JL dimensionality reduction — the cheap pre-ANN shrink
    (128→16 dims cuts every downstream distance scan 8×, with pairwise
    cosine distorted by O(1/√d_out)): pure map-side, zero shuffle; each
    block regenerates the deterministic ±1 matrix and projects with one
    matmul. Output long-form (vec_id, dim, val_fp) int64 rows."""
    holder: dict[int, np.ndarray] = {}

    def block(batch: pd.DataFrame) -> pd.DataFrame:
        ids, M = _matrix(batch, id_col)
        if M.shape[1] not in holder:
            holder[M.shape[1]] = jl_matrix(M.shape[1], d_out, seed)
        return jl_project_rows(ids, M, holder[M.shape[1]])

    return emb.map_batches(block, batch_format="pandas")


def centroid_outlier_kernel(
    ids: np.ndarray, labels: np.ndarray, M_fp: np.ndarray, k: int = 10
) -> pd.DataFrame:
    """Pure per-label centroid-outlier kernel over FIXED-POINT vectors
    (M_fp = round(x·2^32) int64, the _KMEANS_FP discipline): centroid =
    elementwise integer mean (sum // n — exact under any partitioning),
    distance = float64 squared L2 to the reconstructed centroid
    (elementwise from identical ints ⇒ identical floats), output the top-k
    farthest per label as (label, vec_id, dist_fp) with dist_fp =
    floor(d²·2^20) and (dist_fp DESC, vec_id ASC) ties."""
    out_rows = []
    for lab in np.unique(labels):
        m = labels == lab
        sub = M_fp[m]
        n = len(sub)
        cent = sub.sum(axis=0) // n
        diff = (sub - cent).astype(np.float64) / _KMEANS_FP
        d2 = (diff * diff).sum(axis=1)
        dist_fp = np.floor(d2 * (1 << 20)).astype(np.int64)
        sids = ids[m]
        order = np.lexsort((sids, -dist_fp))[:k]
        for j in order:
            out_rows.append((int(lab), int(sids[j]), int(dist_fp[j])))
    out = pd.DataFrame(out_rows, columns=["label", "vec_id", "dist_fp"])
    return out.sort_values(
        ["label", "dist_fp", "vec_id"], ascending=[True, False, True]
    ).reset_index(drop=True)


def embedding_outliers(
    emb: rd.Dataset, k: int = 10, id_col: str = "vec_id"
) -> pd.DataFrame:
    """Distributed per-label centroid outliers — the curation anomaly
    miner (mislabeled / out-of-distribution vectors surface as the
    farthest from their label's centroid): per-block fixed-point sum
    partials → one hash(label) shard exact centroid (integer mean),
    centroids broadcast once via ray.put (labels × dims ints), per-block
    distance top-k partials → driver top-k per label. Distances derive
    elementwise from the same integers as the kernel, so results are
    bit-identical to the serial twin."""

    def fp_rows(batch: pd.DataFrame) -> pd.DataFrame:
        M = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        M_fp = np.round(M * _KMEANS_FP).astype(np.int64)
        return pd.DataFrame(
            {
                "label": batch["label"].to_numpy(np.int64),
                "vec_id": batch[id_col].to_numpy(np.int64),
                "fp": [v.tobytes() for v in M_fp],
            }
        )

    def sum_partial(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for lab, grp in g.groupby("label"):
            S = np.stack([np.frombuffer(b, np.int64) for b in grp["fp"]]).sum(axis=0)
            rows.append((int(lab), S.tobytes(), len(grp)))
        return pd.DataFrame(rows, columns=["label", "s", "n"])

    from .dedup import _add_shard, cluster_shards

    n_sh = cluster_shards()
    base = emb.map_batches(fp_rows, batch_format="pandas").materialize()
    cents_df = (
        base.map_batches(sum_partial, batch_format="pandas")
        .map_batches(lambda t: _add_shard(t, "label", n_sh), batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: (
                lambda gg: pd.DataFrame(
                    [
                        (
                            int(lab),
                            (
                                np.stack(
                                    [np.frombuffer(b, np.int64) for b in grp["s"]]
                                ).sum(axis=0)
                                // int(grp["n"].sum())
                            ).tobytes(),
                        )
                        for lab, grp in gg.groupby("label")
                    ],
                    columns=["label", "cent"],
                )
            )(g.drop(columns=["shard"])),
            batch_format="pandas",
        )
        .to_pandas()
    )
    cents = {
        int(r.label): np.frombuffer(r.cent, np.int64) for r in cents_df.itertuples()
    }
    ref = ray.put(cents)

    def topk_partial(g: pd.DataFrame) -> pd.DataFrame:
        cmap = ray.get(ref)
        rows = []
        for lab, grp in g.groupby("label"):
            cent = cmap[int(lab)]
            sub = np.stack([np.frombuffer(b, np.int64) for b in grp["fp"]])
            diff = (sub - cent).astype(np.float64) / _KMEANS_FP
            d2 = (diff * diff).sum(axis=1)
            dist_fp = np.floor(d2 * (1 << 20)).astype(np.int64)
            sids = grp["vec_id"].to_numpy(np.int64)
            order = np.lexsort((sids, -dist_fp))[:k]
            for j in order:
                rows.append((int(lab), int(sids[j]), int(dist_fp[j])))
        return pd.DataFrame(rows, columns=["label", "vec_id", "dist_fp"])

    parts = base.map_batches(topk_partial, batch_format="pandas").to_pandas()
    out_rows = []
    for lab, grp in parts.groupby("label"):
        g = grp.sort_values(
            ["dist_fp", "vec_id"], ascending=[False, True], kind="stable"
        ).head(k)
        out_rows.append(g)
    out = pd.concat(out_rows, ignore_index=True)
    return out.sort_values(
        ["label", "dist_fp", "vec_id"], ascending=[True, False, True]
    ).reset_index(drop=True)
