"""Training-data operator tests: DuckDB cross-checks for the SQL-expressible
ops, planted-duplicate recovery for the sketch-based ones, numpy oracles for
the vector ops."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


@pytest.fixture()
def docs(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])


def test_word_count_matches_duckdb(con, docs):
    from cloud_crawler_ray.ops.textstats import word_count

    got = word_count(docs).to_pandas().sort_values("token").reset_index(drop=True)
    exp = con.execute(
        """
        SELECT token, count(*)::BIGINT AS cnt FROM (
          SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS token
          FROM documents) WHERE token <> ''
        GROUP BY token ORDER BY token
        """
    ).df()
    assert got["token"].tolist() == exp["token"].tolist()
    assert got["cnt"].tolist() == exp["cnt"].tolist()


def test_token_counts_matches_duckdb(con, docs):
    from cloud_crawler_ray.ops.textstats import token_counts

    got = token_counts(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = con.execute(
        """
        SELECT doc_id, len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                       t -> t <> ''))::BIGINT AS n_tokens
        FROM documents ORDER BY doc_id
        """
    ).df()
    assert got["n_tokens"].tolist() == exp["n_tokens"].tolist()


def test_quality_counts_matches_duckdb(con, docs):
    from cloud_crawler_ray.ops.textstats import quality_scores

    got = quality_scores(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = con.execute(
        """
        SELECT doc_id,
               length(text)::BIGINT AS n_chars,
               len(list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> ''))::BIGINT AS n_tokens,
               len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                               t -> t IN ('the','a','of','and','to','in')))::BIGINT AS n_stopwords
        FROM documents ORDER BY doc_id
        """
    ).df()
    for c in ("n_chars", "n_tokens", "n_stopwords"):
        assert got[c].tolist() == exp[c].tolist(), c


def test_fingerprint_matches_duckdb(con, docs):
    from cloud_crawler_ray.ops.textstats import fingerprints

    got = fingerprints(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = con.execute(
        """
        SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
        FROM documents ORDER BY doc_id
        """
    ).df()
    assert got["fp"].tolist() == exp["fp"].tolist()


def test_lang_id_reasonable(docs):
    from cloud_crawler_ray.ops.textstats import lang_id

    got = lang_id(docs).to_pandas()
    assert set(got["lang_pred"]) <= {"en", "de", "fr", "es", "zh", "unknown"}
    assert len(got) == 500


def _docs_with_dups(ray_session):
    import ray.data as rd
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    # plant exact dups (case/whitespace variants) and near dups
    extra_ids, extra_texts = [], []
    for i in range(0, 20):
        extra_ids.append(10_000 + i)
        extra_texts.append(texts[i].upper() + "  ")  # exact dup after normalize
    for i in range(20, 40):
        toks = texts[i].split()
        toks[len(toks) // 2] = "PERTURBED"
        extra_ids.append(10_000 + i)
        extra_texts.append(" ".join(toks))  # near dup
    tbl = pa.table(
        {"doc_id": ids + extra_ids, "text": texts + extra_texts}
    )
    return rd.from_arrow(tbl), tbl


def test_exact_dedup(ray_session):
    ds, tbl = _docs_with_dups(ray_session)
    from cloud_crawler_ray.ops.dedup import exact_dedup

    kept = exact_dedup(ds).to_pandas()
    assert len(kept) == 520  # 500 originals + 20 near-dups (not exact)
    assert set(kept["doc_id"]) & set(range(10_000, 10_020)) == set()  # dups dropped
    # keeps the LOWEST doc_id of each exact group
    assert set(range(20)) <= set(kept["doc_id"])


def test_minhash_lsh_finds_planted_dups(ray_session):
    ds, tbl = _docs_with_dups(ray_session)
    from cloud_crawler_ray.ops.dedup import dedup_groups_from_pairs, minhash_lsh_pairs

    pairs, stats = minhash_lsh_pairs(ds, threshold=0.6)
    found = {(a, b) for a, b in zip(pairs["a"].to_pylist(), pairs["b"].to_pylist())}
    planted = {(i, 10_000 + i) for i in range(40)}
    hit = planted & found
    assert len(hit) >= 36, (len(hit), stats)  # ≥90% of planted dups found

    # the fully distributed join path (broadcast gate off) must agree exactly
    pairs_j, _ = minhash_lsh_pairs(ds, threshold=0.6, join_broadcast_cap=0)
    assert pairs_j.to_pydict() == pairs.to_pydict()

    # the at-scale semi-join verify path (whole-sig-table broadcast gate
    # off) must agree exactly too
    pairs_s, _ = minhash_lsh_pairs(ds, threshold=0.6, sig_broadcast_cap=0)
    assert pairs_s.to_pydict() == pairs.to_pydict()

    groups = dedup_groups_from_pairs(pairs, tbl.column("doc_id").to_pylist())
    gdf = groups.to_pandas()
    assert len(gdf) == 540
    dup_rows = gdf[gdf["doc_id"] >= 10_000]
    assert (~dup_rows["keep"]).sum() >= 36


def test_media_resize_and_frame_sampling(ray_session):
    """Resize / frame-sample actor-pool plumbing: typed schemas, aspect-fit
    dims, every_n-th-frame sampling capped at max_frames, video-only."""
    import ray.data as rd

    from cloud_crawler_ray.ops.multimodal import (
        DecodeBackend, media_table_from_documents, resize_media, sample_frames,
    )

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": ["d1", "d2"],
                "spans": [
                    [
                        {"kind": "image", "text": "", "media_ref": "/a.png", "offset": 0},
                        {"kind": "video", "text": "", "media_ref": "/v.mp4", "offset": 1},
                    ],
                    [{"kind": "text", "text": "no media", "media_ref": "", "offset": 0}],
                ],
            }
        )
    )
    media = media_table_from_documents(docs)
    thumbs = resize_media(media, max_dim=64).to_pandas()
    assert len(thumbs) == 2  # image + video both resized
    assert (thumbs[["width", "height"]].max(axis=1) <= 64).all()
    assert (thumbs[["width", "height"]].min(axis=1) >= 1).all()

    frames = sample_frames(media, every_n=4, max_frames=4).to_pandas()
    assert set(frames["media_id"]) == {"d1#1"}  # only the video
    be = DecodeBackend()
    payload = media.to_pandas().set_index("media_id").loc["d1#1", "payload"]
    n = be.decode(payload, "video")["n_frames"]
    assert frames["frame_idx"].tolist() == list(range(0, n, 4))[:4]
    assert (frames["ts_ms"] == frames["frame_idx"] * 1000 // 25).all()


def test_asof_join_semantics(ray_session):
    """Backward-inclusive as-of: latest right ts <= left ts per key; ties on
    ts resolve to max tie_col; keys with no prior right row drop."""
    import ray.data as rd

    from cloud_crawler_ray.ops.joins import asof_join

    left = rd.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2, 3, 4], pa.int64()),
                "k": pa.array([10, 10, 10, 99], pa.int64()),
                "t": pa.array([5, 10, 2, 50], pa.int64()),
            }
        )
    )
    right = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([10, 10, 10, 10], pa.int64()),
                "rt": pa.array([3, 10, 10, 20], pa.int64()),
                "val": pa.array([100, 200, 300, 400], pa.int64()),
            }
        )
    )
    out = (
        asof_join(left, right, key="k", left_ts="t", right_ts="rt",
                  right_payload=["val"], tie_col="val")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # id=3 (t=2, earliest rt is 3) and id=4 (k=99) have no match → dropped
    assert out["id"].tolist() == [1, 2]
    assert out["asof_rt"].tolist() == [3, 10]  # inclusive match at t=10
    assert out["val"].tolist() == [100, 300]  # tie at rt=10 → max val


def test_range_join_count_semantics(ray_session):
    """Counts right rows with point in [left_point, left_point + width) per
    key; zero-count left rows drop."""
    import ray.data as rd

    from cloud_crawler_ray.ops.joins import range_join_count

    left = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 2], pa.int64()),
                "p": pa.array([10, 100, 10], pa.int64()),
                "id": pa.array([101, 102, 103], pa.int64()),
            }
        )
    )
    right = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 1, 2], pa.int64()),
                "p": pa.array([10, 14, 15, 500], pa.int64()),
                "id": pa.array([0, 0, 0, 0], pa.int64()),
            }
        )
    )
    out = (
        range_join_count(left, right, key="k", left_point="p", right_point="p",
                         width=5, out_id="id")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # id=101: right points in [10,15) for k=1 → {10,14} = 2
    # id=102: [100,105) → none → dropped; id=103: k=2, [10,15) → none → dropped
    assert out["id"].tolist() == [101]
    assert out["n_events"].tolist() == [2]


def test_hopping_counts_sum(ray_session):
    """Every event lands in exactly window/hop windows."""
    import ray.data as rd

    from cloud_crawler_ray.ops.windows import hopping_counts

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["ts", "event_type"])
    n = ev.count()
    out = hopping_counts(ev, window_s=3600, hop_s=900)
    assert out["cnt"].sum() == 4 * n


def test_keyed_attach_both_paths(ray_session):
    """keyed_attach: broadcast and join paths agree, unmatched left keys get
    nulls, int payload types survive the pandas round-trip."""
    import ray.data as rd

    from cloud_crawler_ray.ops.dedup import keyed_attach

    left = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 99], pa.int64()), "x": ["a", "b", "c", "d"]})
    )
    right = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], pa.int64()), "n": pa.array([10, 20, 30], pa.int64())})
    )
    for cap in (10, 0):  # broadcast path, then forced join path
        out = (
            keyed_attach(left, right, "k", ["n"], right_count=3, broadcast_cap=cap)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert out["k"].tolist() == [1, 2, 3, 99]
        assert out["n"].tolist()[:3] == [10, 20, 30]
        assert pd.isna(out["n"].iloc[3])


def test_dedup_groups_distributed_matches_driver(ray_session):
    """dedup_groups: hash-min label propagation (forced via driver_pair_cap=0)
    must produce identical (doc_id, group_rep, keep) rows to the driver-side
    union-find, including multi-edge chained components."""
    import ray.data as rd

    from cloud_crawler_ray.ops.dedup import dedup_groups

    docs = rd.from_arrow(pa.table({"doc_id": list(range(12))}))
    # components: {0,1,2,3} (chain), {5,7}, singletons elsewhere
    pairs = pa.table(
        {"a": pa.array([1, 2, 0, 5], pa.int64()), "b": pa.array([2, 3, 1, 7], pa.int64())}
    )
    want = dedup_groups(docs, pairs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    got = (
        dedup_groups(docs, pairs, driver_pair_cap=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(want)
    reps = dict(zip(want["doc_id"], want["group_rep"]))
    assert reps[0] == reps[1] == reps[2] == reps[3] == 0
    assert reps[5] == reps[7] == 5
    assert reps[4] == 4 and want["keep"].sum() == 12 - 4  # 3+1 dup rows dropped


def test_label_prop_long_chain_pointer_doubling(ray_session):
    """A duplicate CHAIN of diameter 20 must converge in O(log diameter)
    label-prop rounds (pointer doubling), not O(diameter) — and the per-round
    label table must stay at a bounded block count (the groupby/map_groups
    block multiplication compounded ~6x per round before the repartition
    collapse, making a 40-row graph unrunnable)."""
    import ray.data as rd

    from cloud_crawler_ray.ops.dedup import dedup_groups

    pairs = pa.table(
        {"a": pa.array(list(range(20)), pa.int64()), "b": pa.array(list(range(1, 21)), pa.int64())}
    )
    docs = rd.from_arrow(pa.table({"doc_id": list(range(25))}))
    out = dedup_groups(docs, pairs, driver_pair_cap=0).to_pandas()
    chain = out[out.doc_id <= 20]
    assert (chain["group_rep"] == 0).all()
    assert (chain["keep"] == (chain["doc_id"] == 0)).all()
    singles = out[out.doc_id > 20]
    assert (singles["group_rep"] == singles["doc_id"]).all()


def test_simhash_finds_exactish_dups(ray_session):
    ds, _ = _docs_with_dups(ray_session)
    from cloud_crawler_ray.ops.dedup import simhash_pairs

    pairs = simhash_pairs(ds, hamming_threshold=3).to_pandas()
    found = set(zip(pairs["a"], pairs["b"]))
    # exact dups (0..19) have identical token multisets → hamming 0
    planted_exact = {(i, 10_000 + i) for i in range(20)}
    assert planted_exact <= found


def test_ngram_jaccard_matches_duckdb(con, docs, ray_session):
    from cloud_crawler_ray.ops.dedup import ngram_jaccard_pairs

    got = (
        ngram_jaccard_pairs(docs, k=3, num=1, den=4)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    exp = con.execute(
        """
        WITH sh AS (
          SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id,
                   unnest([array_to_string(toks[i:i+2], ' ')
                           for i in range(1, greatest(len(toks)-2, 0)+1)]) AS s
            FROM (SELECT doc_id,
                         list_filter(regexp_split_to_array(lower(text),'\\s+'), t->t<>'') AS toks
                  FROM documents))
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        pairs AS (
          SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
          FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
          GROUP BY 1, 2)
        SELECT a, b, c AS n_common, sa.n AS n_a, sb.n AS n_b
        FROM pairs JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
        WHERE 4*c >= 1*(sa.n + sb.n - c)
        ORDER BY a, b
        """
    ).df()
    assert got[["a", "b", "n_common"]].values.tolist() == exp[["a", "b", "n_common"]].values.tolist()

    # forced distributed size join (broadcast gate off) must agree exactly
    got_j = (
        ngram_jaccard_pairs(docs, k=3, num=1, den=4, join_broadcast_cap=0)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert got_j.values.tolist() == got.values.tolist()


def test_knn_brute_vs_numpy(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    from cloud_crawler_ray.ops.similarity import knn_brute

    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    queries = t.head(5)
    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    got = knn_brute(emb, queries, k=10).to_pandas()

    M = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    ids = t["vec_id"].to_numpy()
    for qi in range(5):
        sims = M[qi] @ M.T
        order = sorted(
            ((-(sims[j]), ids[j]) for j in range(len(ids)) if ids[j] != ids[qi])
        )[:10]
        exp_ids = [int(x[1]) for x in order]
        got_ids = got[got["query_id"] == ids[qi]].sort_values("rank")["neighbor_id"].tolist()
        assert got_ids == exp_ids, qi


def test_knn_ivf_recall(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    from cloud_crawler_ray.ops.similarity import knn_brute, knn_ivf

    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    queries = t.head(10)
    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    brute = knn_brute(emb, queries, k=10).to_pandas()
    ivf = knn_ivf(emb, queries, k=10, nlist=8, nprobe=3).to_pandas()
    recalls = []
    for q in queries["vec_id"]:
        bset = set(brute[brute["query_id"] == q]["neighbor_id"])
        iset = set(ivf[ivf["query_id"] == q]["neighbor_id"])
        recalls.append(len(bset & iset) / max(1, len(bset)))
    assert np.mean(recalls) >= 0.6, recalls


def test_embedding_neardup_pairs(ray_session):
    import ray.data as rd

    from cloud_crawler_ray.ops.dedup import embedding_neardup_pairs

    # plant two exact duplicates + noise
    rng = np.random.default_rng(0)
    M = rng.normal(size=(50, 16)).astype(np.float32)
    M[10] = M[3]
    M[20] = M[7] + 1e-4
    tbl = pa.table(
        {"vec_id": list(range(50)), "embedding": [list(map(float, r)) for r in M]}
    )
    pairs = embedding_neardup_pairs(rd.from_arrow(tbl), threshold=0.99).to_pandas()
    found = set(zip(pairs["a"], pairs["b"]))
    assert (3, 10) in found and (7, 20) in found
    assert len(found) <= 4  # random 16-d vectors rarely collide at 0.99


def test_embedding_neardup_lsh_recall(ray_session):
    """Random-hyperplane LSH near-dup: precision is exact by construction
    (in-bucket cosine verify); recall vs the exact block-pair op must be
    high on planted near-dups at the default params."""
    import numpy as np
    import ray.data as rd

    from cloud_crawler_ray.ops.dedup import embedding_neardup_lsh, embedding_neardup_pairs

    rng = np.random.default_rng(3)
    base = rng.standard_normal((400, 32))
    ids = list(range(400))
    vecs = [list(map(float, v)) for v in base]
    for k in range(40):  # planted near-dups of the first 40 vectors
        ids.append(1000 + k)
        vecs.append(list(map(float, base[k] + 0.05 * rng.standard_normal(32))))
    emb_tbl = pa.table({"vec_id": pa.array(ids, pa.int64()), "embedding": vecs})

    exact = embedding_neardup_pairs(rd.from_arrow(emb_tbl), threshold=0.9)
    approx, stats = embedding_neardup_lsh(rd.from_arrow(emb_tbl), threshold=0.9)
    exact_pairs = set(zip(exact["a"].to_pylist(), exact["b"].to_pylist()))
    approx_pairs = set(zip(approx["a"].to_pylist(), approx["b"].to_pylist()))
    assert len(exact_pairs) >= 35  # the planted dups are really above 0.9
    assert approx_pairs <= exact_pairs  # exact verify ⇒ no false positives
    recall = len(approx_pairs & exact_pairs) / len(exact_pairs)
    assert recall >= 0.9, (recall, stats)
    assert stats["skipped_buckets"] == 0

    # n_planes > 16 must actually change bucket granularity (the bucket code
    # packs ceil(n_planes/8) bytes, not a fixed 2-byte prefix): with many
    # planes and one table, random vectors land in far more distinct buckets,
    # so candidate pairs collapse while the verify stays exact.
    wide, wide_stats = embedding_neardup_lsh(
        rd.from_arrow(emb_tbl), threshold=0.9, n_planes=24, n_tables=1
    )
    narrow, narrow_stats = embedding_neardup_lsh(
        rd.from_arrow(emb_tbl), threshold=0.9, n_planes=4, n_tables=1
    )
    assert wide_stats["candidate_pairs"] < narrow_stats["candidate_pairs"]
    wide_pairs = set(zip(wide["a"].to_pylist(), wide["b"].to_pylist()))
    assert wide_pairs <= exact_pairs
    import pytest as _pytest

    with _pytest.raises(ValueError):
        embedding_neardup_lsh(rd.from_arrow(emb_tbl), n_planes=60)


def test_multimodal_plumbing(ray_session, tmp_path):
    import ray.data as rd

    from cloud_crawler_ray.ops.multimodal import (
        extract_media_features,
        media_table_from_documents,
    )
    from cloud_crawler_ray.pipelines.crawl import crawl
    from cloud_crawler_ray.spec import CrawlSpec
    from tests import webs

    web, seeds = webs.small_dag()
    h = crawl(web, seeds, CrawlSpec(), str(tmp_path / "out"))
    media = media_table_from_documents(h.documents())
    mdf = media.to_pandas()
    assert set(mdf["kind"]) == {"image", "video"}
    assert all(len(p) > 0 for p in mdf["payload"])

    feats = extract_media_features(media).to_pandas()
    assert len(feats) == len(mdf)
    assert set(feats["backend"]) == {"fake"}
    # deterministic: second run identical
    feats2 = extract_media_features(media_table_from_documents(h.documents())).to_pandas()
    pd.testing.assert_frame_equal(
        feats.sort_values("media_id").reset_index(drop=True),
        feats2.sort_values("media_id").reset_index(drop=True),
    )


def test_token_count_quantiles_by_group_rank_convention(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from cloud_crawler_ray.ops.textstats import token_count_quantiles_by

    # lang a: counts [1,2,3,4] -> p50 rank ceil(2)=2 -> 2, p90 rank ceil(3.6)=4 -> 4
    # lang b: single doc of 10 tokens -> both quantiles 10
    docs = rd.from_arrow(
        pa.table(
            {
                "text": pa.array(
                    ["w", "w w", "w w w", "w w w w", " ".join(["w"] * 10)],
                    pa.string(),
                ),
                "lang": pa.array(["a", "a", "a", "a", "b"], pa.string()),
            }
        )
    )
    out = token_count_quantiles_by(docs, group="lang", qs=(0.5, 0.9))
    got = sorted(map(tuple, out[["lang", "q", "n_tokens_q"]].values.tolist()))
    assert got == [("a", 0.5, 2), ("a", 0.9, 4), ("b", 0.5, 10), ("b", 0.9, 10)]


def test_tfidf_top_terms_planted(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from cloud_crawler_ray.ops.textstats import tfidf_top_terms

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    ["the the the cat", "the dog", "the cat fish"], pa.string()
                ),
            }
        )
    )
    out = (
        tfidf_top_terms(docs, k=2)
        .to_pandas()
        .sort_values(["doc_id", "score", "token"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    # df: the=3, cat=2, dog=1, fish=1; score = tf*1e6 // df
    got = list(map(tuple, out[["doc_id", "token", "tf", "score"]].values.tolist()))
    assert got == [
        (1, "the", 3, 1_000_000),
        (1, "cat", 1, 500_000),
        (2, "dog", 1, 1_000_000),
        (2, "the", 1, 333_333),
        (3, "fish", 1, 1_000_000),
        (3, "cat", 1, 500_000),
    ]


def test_span_kind_stats_counts(ray_session):
    import ray.data as rd

    from cloud_crawler_ray.ops.multimodal import span_kind_stats

    def sp(kind, i):
        return {"kind": kind, "text": f"t{i}", "media_ref": "", "offset": i}

    rows = [
        {"doc_id": "a", "spans": [sp("text", 0), sp("image", 1), sp("text", 2)]},
        {"doc_id": "b", "spans": [sp("image", 0), sp("image", 1)]},
        {"doc_id": "c", "spans": [sp("video", 0)]},
    ]
    out = span_kind_stats(rd.from_items(rows).repartition(2))
    got = {r["kind"]: (r["n_spans"], r["n_docs"]) for _, r in out.iterrows()}
    assert got == {"text": (2, 1), "image": (3, 2), "video": (1, 1)}


def test_rolling_max_per_key_window_semantics(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from cloud_crawler_ray.ops.windows import rolling_max

    vals = [3.0, 1.0, 2.0, 5.0, 0.0, 4.0]
    t = pa.table(
        {
            "event_id": pa.array(list(range(6)) + [6], pa.int64()),
            "user_id": pa.array([1] * 6 + [2], pa.int64()),
            "ts": pa.array(
                [1_000_000 * i for i in range(6)] + [0], pa.timestamp("us")
            ),
            "value": pa.array(vals + [7.0], pa.float64()),
        }
    )
    out = (
        rolling_max(rd.from_arrow(t).repartition(3), window=3)
        .to_pandas()
        .sort_values("event_id")
    )
    assert out["rolling_max"].tolist() == [3.0, 3.0, 3.0, 5.0, 5.0, 5.0, 7.0]


def test_tumbling_distinct_matches_duckdb(con, ray_session):
    import ray.data as rd

    from cloud_crawler_ray.ops.windows import tumbling_distinct

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["ts", "event_type", "user_id"])
    got = (
        tumbling_distinct(ev, window_s=3600)
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )
    exp = con.execute(
        """
        SELECT event_type, ((epoch_us(ts) // 1000000) // 3600) * 3600 AS window_start,
               count(DISTINCT user_id)::BIGINT AS n_distinct
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()
    assert got["event_type"].tolist() == exp["event_type"].tolist()
    assert got["window_start"].tolist() == exp["window_start"].tolist()
    assert got["n_distinct"].tolist() == exp["n_distinct"].tolist()


def test_tumbling_sum_close_to_duckdb(con, ray_session):
    import numpy as np
    import ray.data as rd

    from cloud_crawler_ray.ops.windows import tumbling_sum

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["ts", "event_type", "value"])
    got = tumbling_sum(ev, window_s=3600).sort_values(["event_type", "window_start"])
    exp = con.execute(
        """
        SELECT event_type, ((epoch_us(ts) // 1000000) // 3600) * 3600 AS window_start,
               sum(value) AS vsum, count(*)::BIGINT AS cnt
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()
    assert got["cnt"].tolist() == exp["cnt"].tolist()
    assert np.allclose(got["vsum"].to_numpy(), exp["vsum"].to_numpy())


def _span(kind, text="", ref="", off=0):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": off}


def test_media_captions_nearest_preceding_text(ray_session):
    import ray.data as rd

    from cloud_crawler_ray.ops.multimodal import media_captions

    rows = [
        {
            "doc_id": "a",
            "spans": [
                _span("text", "hello world", off=0),
                _span("image", "", "m1", 1),
                _span("link", "anchor noise", "", 2),  # links are not captions
                _span("text", "cap two", off=3),
                _span("video", "", "m2", 4),
                _span("image", "", "m3", 5),
            ],
        },
        # media-first doc: no preceding text in the SAME doc → "" (a
        # preceding doc's text must never leak across the boundary)
        {"doc_id": "b", "spans": [_span("image", "", "m4", 0)]},
        {"doc_id": "c", "spans": [_span("text", "only text", off=0)]},
    ]
    out = media_captions(rd.from_items(rows).repartition(2)).to_pandas()
    got = {
        r["media_ref"]: (r["doc_id"], r["kind"], r["caption"])
        for _, r in out.iterrows()
    }
    assert got == {
        "m1": ("a", "image", "hello world"),
        "m2": ("a", "video", "cap two"),
        "m3": ("a", "image", "cap two"),
        "m4": ("b", "image", ""),
    }
    assert len(out) == 4  # one row per media span, none for text/link docs


def test_interleave_pack_costs_and_partition_invariance(ray_session):
    import ray.data as rd

    from cloud_crawler_ray.ops.multimodal import interleave_pack

    rows = [
        {
            "doc_id": f"d{i}",
            "spans": [
                _span("text", "one two three", off=0),      # 3 tokens
                _span("image", "", f"m{i}", 1),              # 1 placeholder
                _span("link", "click here", "", 2),          # 2 tokens (non-media text)
                _span("video", "", f"v{i}", 3),              # 1 placeholder
            ],
        }
        for i in range(40)
    ] + [{"doc_id": "empty", "spans": []}]
    ds = rd.from_items(rows)
    out1 = interleave_pack(ds.repartition(1), seq_tokens=16).to_pandas()
    out5 = interleave_pack(ds.repartition(5), seq_tokens=16).to_pandas()

    # per-doc costs: 3 + 1 + 2 + 1 = 7 tokens, 2 media; empty doc = 0
    by_id = out1.set_index("doc_id")
    assert (by_id.loc[[f"d{i}" for i in range(40)], "n_tokens"] == 7).all()
    assert (by_id.loc[[f"d{i}" for i in range(40)], "n_media"] == 2).all()
    assert by_id.loc["empty", "n_tokens"] == 0

    # deterministic + partition-invariant
    k = ["doc_id", "n_tokens", "n_media", "tok_offset", "seq_id"]
    a = out1[k].sort_values("doc_id").reset_index(drop=True)
    b = out5[k].sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)

    # offsets form an exact prefix sum in offset order; seq_id = off // 16
    o = out1.sort_values("tok_offset").reset_index(drop=True)
    import numpy as np

    offs = o["tok_offset"].to_numpy()
    toks = o["n_tokens"].to_numpy()
    assert offs[0] == 0
    assert (offs[1:] == (offs[:-1] + toks[:-1])).all()
    assert (o["seq_id"].to_numpy() == offs // 16).all()


def test_bigram_lm_exact_counts(ray_session):
    import numpy as np
    import ray.data as rd

    from cloud_crawler_ray.ops.lm import train_bigram_lm

    docs = rd.from_items(
        [
            {"doc_id": 1, "text": "a b a"},
            {"doc_id": 2, "text": "b a"},
        ]
    ).repartition(2)
    lm = train_bigram_lm(docs, vocab_cap=10, bigram_cap=10)
    assert lm.n_tokens == 5
    assert lm.vocab.tolist() == ["a", "b"]
    assert lm.uni_counts.tolist() == [3, 2]
    # bigrams: (a,b)x1 from doc1; (b,a)x2 (one per doc)
    got = {}
    for k, c in zip(lm.bi_keys.tolist(), lm.bi_counts.tolist()):
        got[(lm.vocab[k >> 32], lm.vocab[k & 0xFFFFFFFF])] = c
    assert got == {("a", "b"): 1, ("b", "a"): 2}


def test_lm_score_partition_invariant_and_orders_quality(ray_session):
    import ray
    import ray.data as rd

    from cloud_crawler_ray.ops.lm import score_documents, train_bigram_lm

    natural = "the cat sat on the mat and the dog sat on the rug"
    rows = [{"doc_id": i, "text": natural} for i in range(30)]
    # varied docs sharing bigram PREFIXES across blocks — catches
    # context-dependent gram-shard routing (the NUL-separator regression):
    # identical grams must total in ONE shard whatever the partitioning
    words = ["the", "cat", "dog", "mat", "rug", "sat", "on", "and"]
    rows += [
        {"doc_id": 200 + i, "text": " ".join(words[(i + j) % 8] for j in range(12))}
        for i in range(16)
    ]
    rows.append({"doc_id": 100, "text": "zq xv qqj wkz vvb plx"})  # gibberish
    rows.append({"doc_id": 101, "text": ""})  # empty
    ds1 = rd.from_items(rows).repartition(1)
    ds4 = rd.from_items(rows).repartition(4)

    lm1 = train_bigram_lm(ds1, vocab_cap=100, bigram_cap=100)
    lm4 = train_bigram_lm(ds4, vocab_cap=100, bigram_cap=100)
    assert lm1.vocab.tolist() == lm4.vocab.tolist()
    assert lm1.uni_counts.tolist() == lm4.uni_counts.tolist()
    assert lm1.bi_keys.tolist() == lm4.bi_keys.tolist()

    s1 = score_documents(ds1, ray.put(lm1)).to_pandas().set_index("doc_id")
    s4 = score_documents(ds4, ray.put(lm4)).to_pandas().set_index("doc_id")
    assert s1.sort_index()["lm_logprob"].tolist() == s4.sort_index()["lm_logprob"].tolist()

    assert s1.loc[0, "lm_logprob"] > s1.loc[100, "lm_logprob"]  # natural ≫ gibberish
    assert s1.loc[101, "lm_logprob"] == 0.0 and s1.loc[101, "n_tokens"] == 0


def test_bigram_lm_total_exact_under_vocab_cap(ray_session):
    import ray.data as rd

    from cloud_crawler_ray.ops.lm import train_bigram_lm

    docs = rd.from_items(
        [{"doc_id": 1, "text": "a a a b b c d e"}]  # 8 tokens, 5 distinct
    )
    lm = train_bigram_lm(docs, vocab_cap=2, bigram_cap=2)
    assert lm.n_tokens == 8  # full corpus total survives the cap
    assert lm.vocab.tolist() == ["a", "b"]  # top-2 by count, ties by token
    assert lm.uni_counts.tolist() == [3, 2]


def test_substring_dup_pairs_planted_and_cap(ray_session):
    import ray.data as rd

    from cloud_crawler_ray.ops.dedup import substring_dup_pairs

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # one 8-gram
    boiler = "b0 b1 b2 b3 b4 b5 b6 b7"  # planted over-cap boilerplate gram
    rows = [
        {"doc_id": 1, "text": f"{shared} tail one"},
        {"doc_id": 2, "text": f"head two {shared}"},
        {"doc_id": 3, "text": "nothing in common with the others at all xyz"},
    ] + [{"doc_id": 100 + i, "text": boiler} for i in range(6)]
    ds = rd.from_items(rows).repartition(3)

    out = substring_dup_pairs(ds, k=8, max_docs_per_gram=5).to_pandas()
    got = {(r.doc_a, r.doc_b): r.n_shared_grams for r in out.itertuples()}
    # docs 1,2 share exactly the one planted 8-gram; the 6-doc boilerplate
    # gram is over the cap of 5 → its 15 pairs are skipped, not emitted
    assert got == {(1, 2): 1}

    # under a loose cap the boilerplate pairs appear
    out2 = substring_dup_pairs(ds, k=8, max_docs_per_gram=100).to_pandas()
    assert len(out2) == 1 + 15


def test_substring_dup_pairs_nul_tokens_and_duplicate_ids(ray_session):
    import ray.data as rd

    from cloud_crawler_ray.ops.dedup import substring_dup_pairs

    # tokens carrying raw NUL bytes (binary junk in crawled text): identical
    # grams must still pair deterministically (NULs scrubbed before the
    # pandas hash router, which truncates C-strings at NUL)
    nul_txt = "alpha\x00beta gamma delta epsilon zeta eta theta iota"
    rows = [
        {"doc_id": 1, "text": nul_txt},
        {"doc_id": 2, "text": nul_txt + " extra"},
        # duplicate doc_id rows must not create (a, a) self-pairs or
        # double-counted pairs
        {"doc_id": 3, "text": "one two three four five six seven eight"},
        {"doc_id": 3, "text": "one two three four five six seven eight"},
        {"doc_id": 4, "text": "one two three four five six seven eight"},
    ]
    out = substring_dup_pairs(rd.from_items(rows).repartition(3), k=8).to_pandas()
    got = {(r.doc_a, r.doc_b): r.n_shared_grams for r in out.itertuples()}
    assert (1, 2) in got and got[(1, 2)] >= 1
    assert got.get((3, 4)) == 1
    assert all(a < b for a, b in got)  # no self-pairs


def test_lm_sentinel_token_does_not_corrupt_totals(ray_session):
    import ray.data as rd

    from cloud_crawler_ray.ops.lm import train_bigram_lm

    # a REAL token equal to the sentinel string must not leak into the
    # corpus token total (the sentinel key is (prev=sentinel, cur=""))
    docs = rd.from_items(
        [{"doc_id": 1, "text": "\x01total foo \x01total foo"}]
    )
    lm = train_bigram_lm(docs, vocab_cap=10, bigram_cap=10)
    assert lm.n_tokens == 4
    assert sorted(lm.vocab.tolist()) == ["\x01total", "foo"]


def _blob_ds(n_per=40, dim=8, repart=3, seed=11):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    centers = np.array(
        [[10.0] * dim, [-10.0] * dim, [10.0] * (dim // 2) + [-10.0] * (dim - dim // 2)]
    )
    rows = []
    truth = {}
    vid = 0
    for c in range(3):
        for _ in range(n_per):
            v = centers[c] + rng.normal(0, 0.5, dim)
            rows.append({"vec_id": vid, "embedding": v.astype(np.float32)})
            truth[vid] = c
            vid += 1
    return rd.from_items(rows).repartition(repart), truth


def test_kmeans_recovers_planted_blobs(ray_session):
    from cloud_crawler_ray.ops.similarity import kmeans

    ds, truth = _blob_ds()
    centers, assign = kmeans(ds, k=3, n_iter=10)
    df = assign.to_pandas()
    # perfect purity: each predicted cluster maps to exactly one true blob
    df["truth"] = df["vec_id"].map(truth)
    purity = df.groupby("cluster")["truth"].nunique()
    assert (purity == 1).all()
    assert df["cluster"].nunique() == 3
    # centers sit on the blob means (within the 0.5-sigma noise envelope)
    assert centers.shape == (3, 8)


def test_kmeans_partition_invariant(ray_session):
    from cloud_crawler_ray.ops.similarity import kmeans

    a, _ = _blob_ds(repart=1)
    b, _ = _blob_ds(repart=5)
    _, ass_a = kmeans(a, k=3, n_iter=5)
    _, ass_b = kmeans(b, k=3, n_iter=5)
    da = ass_a.to_pandas().sort_values("vec_id").reset_index(drop=True)
    db = ass_b.to_pandas().sort_values("vec_id").reset_index(drop=True)
    # well-separated blobs: identical assignments under any partitioning
    assert da["cluster"].tolist() == db["cluster"].tolist()


def test_kmeans_more_clusters_than_points(ray_session):
    import ray.data as rd

    from cloud_crawler_ray.ops.similarity import kmeans

    rows = [
        {"vec_id": i, "embedding": np.array([float(i % 2)] * 4, np.float32)}
        for i in range(4)
    ]
    centers, assign = kmeans(rd.from_items(rows), k=6, n_iter=3)
    df = assign.to_pandas()
    assert len(df) == 4
    assert len(centers) == 4  # seeding capped at the row count


def test_validate_spans_flags_violations(ray_session):
    import ray.data as rd

    from cloud_crawler_ray.ops.multimodal import validate_spans

    def sp(kind, off, text="x", ref="r"):
        return {"kind": kind, "text": text, "media_ref": ref, "offset": off}

    rows = [
        # clean doc: dense offsets, media has ref, text has text
        {"doc_id": "ok", "spans": [sp("text", 0), sp("image", 1), sp("link", 2)]},
        # offsets skip 1 → two spans at wrong positions
        {"doc_id": "gap", "spans": [sp("text", 0), sp("text", 2), sp("text", 3)]},
        # media without ref + unknown kind + empty text
        {
            "doc_id": "bad",
            "spans": [
                sp("image", 0, ref=""),
                sp("blob", 1),
                sp("text", 2, text=""),
            ],
        },
    ]
    out = (
        validate_spans(rd.from_items(rows).repartition(2))
        .to_pandas()
        .sort_values(["doc_id", "violation"])
        .reset_index(drop=True)
    )
    got = {(r["doc_id"], r["violation"]): r["n"] for _, r in out.iterrows()}
    assert got == {
        ("gap", "offset_not_dense"): 2,
        ("bad", "media_missing_ref"): 1,
        ("bad", "unknown_kind"): 1,
        ("bad", "text_missing_text"): 1,
    }


def test_validate_spans_clean_crawl_has_no_violations(ray_session):
    """The engine's own extractor must satisfy the span contract."""
    from cloud_crawler_ray.ops.multimodal import validate_spans
    from cloud_crawler_ray.pipelines.crawl import crawl
    from cloud_crawler_ray.spec import CrawlSpec
    from cloud_crawler_ray.synthweb import make_skewed_web
    import shutil

    web, seeds = make_skewed_web(150, n_hosts=4, seed=21)
    out_dir = "/tmp/ccray_validate_spans_test"
    shutil.rmtree(out_dir, ignore_errors=True)
    h = crawl(web, seeds, CrawlSpec(delay=0.01), out_dir)
    assert validate_spans(h.documents()).count() == 0


def test_main_content_strips_nav_keeps_body(ray_session):
    import ray.data as rd

    from cloud_crawler_ray.ops.multimodal import main_content

    def sp(kind, off, text="", ref=""):
        return {"kind": kind, "text": text, "media_ref": ref, "offset": off}

    long1 = "this paragraph is long enough to clear the density bar easily"
    long2 = "a second substantive paragraph keeps the adjacent short note"
    rows = [
        {
            "doc_id": "page",
            "spans": [
                sp("link", 0, "Home", "http://h/"),
                sp("text", 1, "menu"),  # short, between links → dropped
                sp("link", 2, "About", "http://h/about"),
                sp("text", 3, long1),
                sp("text", 4, "see also"),  # short but adjacent to long → kept
                sp("text", 5, long2),
                sp("image", 6, "", "http://h/img.png"),
                sp("text", 7, "footer"),  # short, isolated → dropped
            ],
        },
        {"doc_id": "empty", "spans": [sp("link", 0, "x", "http://h/x")]},
    ]
    out = (
        main_content(rd.from_items(rows).repartition(2), min_chars=40)
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc["page", "main_text"] == f"{long1} see also {long2}"
    assert out.loc["page", "n_kept"] == 3 and out.loc["page", "n_dropped"] == 2
    assert out.loc["empty", "main_text"] == "" and out.loc["empty", "n_kept"] == 0


def test_media_fetch_plan_dedups_refs(ray_session):
    import ray.data as rd

    from cloud_crawler_ray.ops.multimodal import media_fetch_plan

    def sp(kind, off, ref="", text=""):
        return {"kind": kind, "text": text, "media_ref": ref, "offset": off}

    logo = "http://cdn/logo.png"
    rows = [
        {
            "doc_id": "a",
            "spans": [
                sp("image", 0, logo),
                sp("text", 1, text="x"),
                sp("image", 2, logo),  # same ref twice in one doc
                sp("video", 3, "http://cdn/v1.mp4"),
            ],
        },
        {"doc_id": "b", "spans": [sp("image", 0, logo), sp("link", 1, "http://h/x", "t")]},
        {"doc_id": "c", "spans": [sp("image", 0, "http://cdn/only-c.png")]},
    ]
    out = (
        media_fetch_plan(rd.from_items(rows).repartition(2))
        .to_pandas()
        .sort_values("media_ref")
        .reset_index(drop=True)
    )
    got = {
        r["media_ref"]: (r["kind"], r["n_refs"], r["first_doc"])
        for _, r in out.iterrows()
    }
    # links are NOT media; the logo counts 2 docs (not 3 occurrences)
    assert got == {
        logo: ("image", 2, "a"),
        "http://cdn/v1.mp4": ("video", 1, "a"),
        "http://cdn/only-c.png": ("image", 1, "c"),
    }


def test_semantic_dedup_planted(ray_session):
    """SemDeDup: planted near-dup pairs inside well-separated blobs must map
    to one representative (the lower id); singletons keep themselves."""
    import ray.data as rd

    from cloud_crawler_ray.ops.dedup import semantic_dedup

    rng = np.random.default_rng(7)
    dim, per = 16, 40
    centers = np.eye(3, dim) * 30.0
    ids, vecs = [], []
    vid = 0
    for c in range(3):
        for _ in range(per):
            ids.append(vid)
            vecs.append((centers[c] + rng.normal(0, 0.5, dim)).astype(np.float64))
            vid += 1
    planted = []
    for k in range(12):  # near-dups of the first 12 vectors (blob 0)
        ids.append(1000 + k)
        vecs.append(vecs[k] + 1e-4 * rng.standard_normal(dim))
        planted.append((k, 1000 + k))
    tbl = pa.table(
        {"vec_id": pa.array(ids, pa.int64()), "embedding": [list(map(float, v)) for v in vecs]}
    )
    out = semantic_dedup(
        rd.from_arrow(tbl).repartition(4), threshold=0.99999, k=3, n_iter=6
    ).to_pandas()
    rep = dict(zip(out["vec_id"], out["rep_id"]))
    assert len(out) == len(ids)
    for a, b in planted:
        assert rep[b] == a, (a, b, rep[b])  # dup collapses to the lower id
        assert rep[a] == a
    # everyone else is its own representative (within-blob noise pairs sit
    # near 0.995 cosine; the planted 1e-4 perturbations near 1-1e-10, so the
    # 0.99999 threshold separates them by orders of magnitude)
    others = out[~out["vec_id"].isin([b for _, b in planted])]
    assert (others["rep_id"] == others["vec_id"]).all()
    assert (out["keep"] == (out["rep_id"] == out["vec_id"])).all()


def test_semantic_dedup_split_path(ray_session):
    """Oversized clusters recursively split by deterministic hyperplanes;
    EXACT duplicates project identically so they can never straddle a split
    — forced via max_cluster=8 they are still found, and split_depth > 0
    proves the split path actually ran."""
    import ray.data as rd

    from cloud_crawler_ray.ops.dedup import semantic_dedup

    rng = np.random.default_rng(11)
    base = rng.standard_normal((60, 8))
    ids = list(range(60)) + [500, 501]
    vecs = [list(map(float, v)) for v in base] + [
        list(map(float, base[5])),
        list(map(float, base[17])),
    ]
    tbl = pa.table({"vec_id": pa.array(ids, pa.int64()), "embedding": vecs})
    out = semantic_dedup(
        rd.from_arrow(tbl), threshold=0.9999, k=1, n_iter=2, max_cluster=8
    ).to_pandas()
    rep = dict(zip(out["vec_id"], out["rep_id"]))
    assert rep[500] == 5 and rep[501] == 17
    assert (out["split_depth"] > 0).any()


def test_semantic_dedup_partition_invariant(ray_session):
    import ray.data as rd

    from cloud_crawler_ray.ops.dedup import semantic_dedup

    rng = np.random.default_rng(3)
    M = rng.standard_normal((80, 12))
    M[40] = M[2] + 1e-5
    M[41] = M[9] + 1e-5
    tbl = pa.table(
        {
            "vec_id": pa.array(list(range(80)), pa.int64()),
            "embedding": [list(map(float, v)) for v in M],
        }
    )
    outs = []
    for parts in (1, 7):
        ds = rd.from_arrow(tbl).repartition(parts)
        df = (
            semantic_dedup(ds, threshold=0.999, k=4, n_iter=5)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        outs.append(df[["vec_id", "rep_id", "keep"]])
    assert outs[0].equals(outs[1])


def test_knn_pq_recall(ray_session):
    """PQ/ADC approximate top-k: recall@10 vs brute force must be high on
    the real embeddings table (64-dim blobs; m=8 subspaces, 256 centroids
    ≈ near-lossless at this dimensionality)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from cloud_crawler_ray.ops.similarity import knn_brute, knn_pq

    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    queries = t.head(10)
    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    brute = knn_brute(emb, queries, k=10).to_pandas()
    approx = knn_pq(emb, queries, k=10, m=8).to_pandas()
    recalls = []
    for q in queries["vec_id"]:
        bset = set(brute[brute["query_id"] == q]["neighbor_id"])
        pset = set(approx[approx["query_id"] == q]["neighbor_id"])
        assert len(pset) == len(bset)
        recalls.append(len(bset & pset) / max(1, len(bset)))
    assert np.mean(recalls) >= 0.6, recalls


def test_pq_encode_shape(ray_session):
    """Codes are m uint8 per vector and deterministic across partitionings."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from cloud_crawler_ray.ops.similarity import pq_encode, pq_train

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    books = pq_train(emb, m=8, n_centroids=16)
    assert books.shape[0] == 8
    a = pq_encode(emb.repartition(1), books).to_pandas().sort_values("vec_id")
    b = pq_encode(emb.repartition(6), books).to_pandas().sort_values("vec_id")
    assert all(len(c) == 8 for c in a["code"])
    assert [list(c) for c in a["code"]] == [list(c) for c in b["code"]]


def test_cdc_chunks_shift_resistance(ray_session):
    """Content-defined chunking: inserting tokens at the head of a document
    must preserve most downstream chunk hashes (the property fixed-size
    chunking lacks), and chunking must be deterministic and length-exact."""
    import ray.data as rd

    from cloud_crawler_ray.ops.dedup import cdc_chunks

    rng = np.random.default_rng(2)
    vocab = [f"w{i}" for i in range(500)]
    toks = [vocab[i] for i in rng.integers(0, 500, 4000)]
    base = " ".join(toks)
    shifted = "zzz qqq " + base
    tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64()), "text": [base, shifted]})
    ch = cdc_chunks(rd.from_arrow(tbl)).to_pandas()
    a = ch[ch["doc_id"] == 1]
    b = ch[ch["doc_id"] == 2]
    assert a["n_tokens"].sum() == 4000 and b["n_tokens"].sum() == 4002
    assert (a["n_tokens"] <= 128).all() and (a["n_tokens"] >= 1).all()
    shared = set(a["chunk_hash"]) & set(b["chunk_hash"])
    assert len(shared) >= 0.7 * len(set(a["chunk_hash"])), (
        len(shared), a["chunk_hash"].nunique()
    )
    # determinism under partitioning
    ch2 = cdc_chunks(rd.from_arrow(tbl).repartition(2)).to_pandas()
    m1 = ch.sort_values(["doc_id", "ord"]).reset_index(drop=True)
    m2 = ch2.sort_values(["doc_id", "ord"]).reset_index(drop=True)
    assert m1.equals(m2)


def test_cdc_dedup_stats_counts_duplicated_mass(ray_session):
    import ray.data as rd

    from cloud_crawler_ray.ops.dedup import cdc_dedup_stats

    rng = np.random.default_rng(4)
    vocab = [f"t{i}" for i in range(300)]
    doc = " ".join(vocab[i] for i in rng.integers(0, 300, 2000))
    other = " ".join(vocab[i] for i in rng.integers(0, 300, 2000))
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": [doc, doc, other],  # doc 2 is an exact copy of doc 1
        }
    )
    st = cdc_dedup_stats(rd.from_arrow(tbl))
    assert len(st) == 1
    row = st.iloc[0]
    assert row["total_chunks"] == row["distinct_chunks"] + row["dup_chunks"]
    # the exact copy duplicates every one of doc 1's chunks
    assert row["dup_chunks"] >= (row["total_chunks"] - row["dup_chunks"]) * 0.3
    assert row["dup_tokens"] >= 1900  # ~2000 tokens duplicated


def test_interval_overlap_pairs_vs_brute(ray_session):
    """Bucket-replicated interval-overlap join vs an all-pairs numpy check,
    including intervals spanning multiple buckets and equal endpoints."""
    import ray.data as rd

    from cloud_crawler_ray.ops.joins import interval_overlap_pairs

    rng = np.random.default_rng(17)
    n = 300
    keys = rng.integers(0, 40, n).astype(np.int64)
    st = rng.integers(0, 500_000, n).astype(np.int64)
    en = st + rng.integers(0, 200_000, n)  # many spans >> bucket (86400)
    tbl = pa.table({"user_id": pa.array(keys), "session_start": pa.array(st), "session_end": pa.array(en)})
    got = (
        interval_overlap_pairs(
            rd.from_arrow(tbl).repartition(5),
            key_col="user_id", start_col="session_start", end_col="session_end",
        )
        .to_pandas().sort_values(["key_a", "key_b"]).reset_index(drop=True)
    )
    from collections import Counter
    cnt = Counter()
    for i in range(n):
        for j in range(i + 1, n):
            if keys[i] != keys[j] and st[i] <= en[j] and st[j] <= en[i]:
                cnt[(min(keys[i], keys[j]), max(keys[i], keys[j]))] += 1
    expect = (
        pd.DataFrame(
            [(a, b, c) for (a, b), c in cnt.items()],
            columns=["key_a", "key_b", "n_overlaps"],
        )
        .astype(np.int64)
        .sort_values(["key_a", "key_b"])
        .reset_index(drop=True)
    )
    assert got.astype(np.int64).equals(expect), (len(got), len(expect))


def test_knn_ivfpq_recall(ray_session):
    """Composed IVF-PQ: sub-linear candidate lists + compressed-domain ADC;
    recall@10 vs brute force on the real embeddings table."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from cloud_crawler_ray.ops.similarity import knn_brute, knn_ivfpq

    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    queries = t.head(10)
    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    brute = knn_brute(emb, queries, k=10).to_pandas()
    approx = knn_ivfpq(emb, queries, k=10, nlist=8, nprobe=4, m=16).to_pandas()
    recalls = []
    for q in queries["vec_id"]:
        bset = set(brute[brute["query_id"] == q]["neighbor_id"])
        pset = set(approx[approx["query_id"] == q]["neighbor_id"])
        recalls.append(len(bset & pset) / max(1, len(bset)))
    assert np.mean(recalls) >= 0.6, recalls


def test_bloom_anti_join_exact_under_false_positives(ray_session):
    """Bloom pre-filter must never change the result: with a deliberately
    tiny filter (high false-positive rate) the exact co-shard check still
    yields the true anti-join, and with a roomy filter most rows resolve
    map-side. Compared against a set-difference oracle."""
    import ray.data as rd

    from cloud_crawler_ray.ops.joins import bloom_anti_join

    rng = np.random.default_rng(23)
    left_keys = np.arange(2000, dtype=np.int64)
    right_keys = rng.choice(2000, 700, replace=False).astype(np.int64)
    expect = sorted(set(left_keys) - set(right_keys))
    lt = pa.table({"k": pa.array(left_keys), "v": pa.array(left_keys * 2)})
    rt = pa.table({"rk": pa.array(right_keys)})
    for n_bits in (64, 1 << 22):  # 64 bits -> almost everything collides
        got = (
            bloom_anti_join(
                rd.from_arrow(lt).repartition(4), rd.from_arrow(rt), key_col="k",
                n_bits=n_bits,
            )
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        assert got["k"].tolist() == expect, n_bits
        assert (got["v"] == got["k"] * 2).all()


def test_keyed_attach_salted_matches_unsalted(ray_session):
    """Hot-key skew salting: salt>1 splits a hot key's probe rows across
    sub-shards with the right side replicated — output must be identical
    to the unsalted join path, including null padding for unmatched keys."""
    import ray.data as rd

    from cloud_crawler_ray.ops.dedup import keyed_attach

    # one hot key (0) with 5000 left rows, a cold key, and an unmatched key
    n_hot = 5000
    ks = [0] * n_hot + [1, 99]
    left = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(ks, pa.int64()),
                "x": pa.array(list(range(len(ks))), pa.int64()),
            }
        )
    ).repartition(8)
    right = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([0, 1], pa.int64()),
                "n": pa.array([10, 20], pa.int64()),
            }
        )
    )

    def run(salt):
        return (
            keyed_attach(
                left, right, "k", ["n"],
                right_count=2, broadcast_cap=0, salt=salt,
            )
            .to_pandas()
            .sort_values(["k", "x"])
            .reset_index(drop=True)
        )

    base, salted = run(1), run(8)
    pd.testing.assert_frame_equal(base, salted)
    assert (base.loc[base["k"] == 0, "n"] == 10).all()
    assert pd.isna(base.loc[base["k"] == 99, "n"]).all()


def test_phash64_dc_invariance_and_noise_stability():
    """pHash math (real, numpy DCT): global brightness shifts change only
    the dropped DC term (hash identical); small additive noise flips few
    of the 63 bits; different random grids land far apart."""
    from cloud_crawler_ray.ops.multimodal import phash64

    rng = np.random.default_rng(3)
    g = rng.uniform(0, 255, size=(32, 32))
    assert phash64(g) == phash64(g + 17.5)

    noisy = g + rng.normal(0, 0.5, size=(32, 32))
    d_noise = bin(phash64(g) ^ phash64(noisy)).count("1")
    assert d_noise <= 12, d_noise

    other = rng.uniform(0, 255, size=(32, 32))
    d_other = bin(phash64(g) ^ phash64(other)).count("1")
    assert d_other >= 16, d_other


def test_media_phash_pairs_exact_dups(ray_session):
    """Perceptual-hash media near-dup e2e: the same media_ref appearing in
    several docs produces identical payloads → identical phashes → pairs at
    hamming 0; distinct refs never pair at threshold 4 (hash avalanche).
    The fake decode can only exercise exact duplicates — documented; the
    near-pixel property is pinned by the numpy DCT unit test above."""
    import ray.data as rd

    from cloud_crawler_ray.ops.multimodal import (
        media_phash_pairs, media_phashes, media_table_from_documents,
    )

    def img(ref, off):
        return {"kind": "image", "text": "", "media_ref": ref, "offset": off}

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": ["a", "b", "c"],
                "spans": [
                    [img("/logo.png", 0), img("/photo1.png", 1)],
                    [img("/logo.png", 0), img("/photo2.png", 1)],
                    [img("/logo.png", 0)],
                ],
            }
        )
    )
    media = media_table_from_documents(docs)
    sigs = media_phashes(media).to_pandas()
    assert sigs["backend"].eq("fake").all()
    by_id = sigs.set_index("media_id")["phash"]
    assert by_id["a#0"] == by_id["b#0"] == by_id["c#0"]  # same ref, same hash
    assert by_id["a#1"] != by_id["b#1"]

    pairs = media_phash_pairs(media, hamming_threshold=4).to_pandas()
    got = {tuple(sorted((r["a"], r["b"]))) for _, r in pairs.iterrows()}
    assert got == {("a#0", "b#0"), ("a#0", "c#0"), ("b#0", "c#0")}
    assert (pairs["hamming"] == 0).all()


def test_pareto_front_matches_bruteforce(ray_session):
    """Skyline op: per-block local-skyline + driver finish equals the O(n²)
    strict-domination definition, across many blocks and with duplicate
    points (which never dominate each other)."""
    import numpy as np
    import ray.data as rd

    from cloud_crawler_ray.ops.pareto import _local_skyline, pareto_front

    rng = np.random.default_rng(7)
    n = 5000
    x = rng.integers(0, 500, n).astype(np.int64)  # small domain → many ties
    y = rng.integers(0, 500, n).astype(np.int64)
    x[:3] = x[0]; y[:3] = y[0]  # planted exact duplicates
    ids = np.arange(n, dtype=np.int64)

    keep = _local_skyline(x, y)
    brute = np.array(
        [not np.any((x > x[i]) & (y > y[i])) for i in range(n)]
    )
    assert (keep == brute).all()

    ds = rd.from_arrow(
        pa.table({"id": ids, "x": x, "y": y})
    ).repartition(16)
    out = pareto_front(ds, "id", "x", "y")
    assert out["id"].tolist() == sorted(ids[brute].tolist())


def test_pil_decode_backend_real_pixels():
    """Skip-gated real-pixel path (mirrors the Lance import gate): with a
    PIL wheel, DecodeBackend decodes actual PNGs — true dims, channel
    means, luma grids feeding the same DCT pHash, real PNG thumbnails —
    and near-identical PIXELS (not just identical bytes) hash close."""
    PIL = pytest.importorskip("PIL")
    import io

    import numpy as np
    from PIL import Image

    from cloud_crawler_ray.ops.multimodal import DecodeBackend, phash64

    def png(arr: np.ndarray) -> bytes:
        buf = io.BytesIO()
        Image.fromarray(arr.astype(np.uint8)).save(buf, format="PNG")
        return buf.getvalue()

    rng = np.random.default_rng(7)
    base = rng.integers(0, 255, size=(120, 80, 3))
    b = DecodeBackend()
    assert b.name == "pil"

    f = b.decode(png(base), "image")
    assert (f["width"], f["height"], f["backend"]) == (80, 120, "pil")

    # near-identical pixels → small hamming distance; unrelated → large
    tweaked = np.clip(base + rng.integers(-2, 3, size=base.shape), 0, 255)
    other = rng.integers(0, 255, size=(120, 80, 3))
    h0 = phash64(b.luma_grid(png(base))[0])
    h1 = phash64(b.luma_grid(png(tweaked))[0])
    h2 = phash64(b.luma_grid(png(other))[0])
    ham = lambda a, c: bin(a ^ c).count("1")
    assert ham(h0, h1) <= 10 < ham(h0, h2)

    thumb, backend = b.thumbnail(png(base), 40, 60)
    assert backend == "pil"
    t = Image.open(io.BytesIO(thumb))
    assert t.size == (40, 60)

    # undecodable bytes under PIL fall back to the deterministic fake
    assert b.decode(b"\xff\xd8 not an image", "image")["backend"] == "fake"


def test_dsir_weights_prefer_target_like_docs(ray_session):
    """Docs drawn from the target vocabulary score higher than off-target
    docs, and the distributed fit is partition-invariant."""
    import ray.data as rd

    from cloud_crawler_ray.ops.dsir import dsir_weights

    tgt_docs = [f"alpha beta gamma delta alpha beta {i}" for i in range(30)]
    off_docs = [f"zeta eta theta iota kappa lambda {i}" for i in range(30)]
    rows = [
        {"doc_id": i, "text": t, "lang": "en" if i < 30 else "xx"}
        for i, t in enumerate(tgt_docs + off_docs)
    ]
    # held-out docs: one target-like, one off-target (not in the fit sets)
    rows.append({"doc_id": 100, "text": "alpha beta gamma delta", "lang": "xx"})
    rows.append({"doc_id": 101, "text": "zeta eta theta iota", "lang": "xx"})

    out = dsir_weights(rd.from_items(rows), target_col="lang", target_value="en")
    w = dict(zip(out["doc_id"], out["logw"]))
    assert w[100] > w[101]

    out2 = dsir_weights(
        rd.from_items(rows).repartition(7), target_col="lang", target_value="en"
    )
    assert (out["logw"].to_numpy() == out2["logw"].to_numpy()).all()


def test_compression_stats_flags_repetitive(ray_session):
    import ray.data as rd

    from cloud_crawler_ray.ops.textstats import compression_stats

    rows = [
        {"doc_id": 0, "text": "spam " * 500},  # highly compressible
        {"doc_id": 1, "text": " ".join(f"w{i}x{i*7%13}" for i in range(500))},
    ]
    out = (
        compression_stats(rd.from_items(rows))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert bool(out.loc[0, "repetitive"]) and not bool(out.loc[1, "repetitive"])
    assert out.loc[0, "n_comp_bytes"] < out.loc[0, "n_bytes"] * 0.1


def test_pmi_collocations_partition_invariance(ray_session, docs):
    """The two-stage shard plumbing (left-attach, sentinel N, right-attach)
    must be a pure function of the corpus: different shard counts and
    block sizes produce the identical top-k table."""
    from cloud_crawler_ray.ops.textstats import pmi_collocations

    a = pmi_collocations(docs, min_count=3, k=30, n_shards=4)
    b = pmi_collocations(docs.repartition(7), min_count=3, k=30, n_shards=19)
    pd.testing.assert_frame_equal(a, b)
    assert (a["c_xy"] >= 3).all()


def test_source_vocab_jaccard_partition_invariance(ray_session):
    import ray.data as rd

    from cloud_crawler_ray.ops.textstats import source_vocab_jaccard

    ds = rd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    a = source_vocab_jaccard(ds, n_shards=4)
    b = source_vocab_jaccard(ds.repartition(7), n_shards=19)
    pd.testing.assert_frame_equal(a, b)
    # Jaccard bounds: inter <= min(n_a, n_b), ppm in [0, 1e6]
    assert (a["inter"] <= a[["n_a", "n_b"]].min(axis=1)).all()
    assert a["jaccard_ppm"].between(0, 1_000_000).all()


def test_leak_safe_split_groups_exact_dups_together(ray_session):
    """Reformatted copies of the same text (case/whitespace changes) must
    land in the same split — the property train_test_split (row-key hash)
    does NOT provide."""
    import ray.data as rd

    from cloud_crawler_ray.ops.sampling import leak_safe_split

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": [
                "The  quick\tbrown fox",
                "the quick brown FOX",
                "something else entirely",
                "SOMETHING   else\nentirely",
            ],
        }
    )
    out = (
        leak_safe_split(rd.from_arrow(tbl), train_pct=50)
        .to_pandas()
        .set_index("doc_id")["split"]
    )
    assert out[1] == out[2]
    assert out[3] == out[4]


def test_dup_spans_kernel_merge_semantics():
    import numpy as np

    from cloud_crawler_ray.ops.dedup import dup_spans_kernel

    k = 4
    # doc 1: positions 0,1,2 overlap-chain -> [0,6); position 10 separate
    # (gap: 10 > 2+4), position 6 is ADJACENT to [0,6) (6 == 2+4) -> merges
    d = np.array([1, 1, 1, 1, 1, 2], dtype=np.int64)
    p = np.array([0, 1, 2, 6, 20, 5], dtype=np.int64)
    out = dup_spans_kernel(d, p, k)
    rows = list(zip(out["doc_id"], out["span_start"], out["span_end"]))
    assert rows == [(1, 0, 10), (1, 20, 24), (2, 5, 9)]
    assert len(dup_spans_kernel(np.array([]), np.array([]), k)) == 0


def test_dup_span_trim_planted_and_partition_invariant(ray_session):
    import pandas as pd
    import ray.data as rd

    from cloud_crawler_ray.ops.dedup import dup_span_trim

    shared = "the quick brown fox jumps over the lazy dog again and again"
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "unique opening words here " + shared + " unique tail one",
                "different head entirely now " + shared + " other ending two",
                "short doc below gram size",  # < k tokens -> no grams
                "totally disjoint content with no repeated grams at all xyz",
            ],
        }
    )
    outs = []
    for parts in (1, 4):
        ds = rd.from_pandas(docs).repartition(parts)
        out = (
            dup_span_trim(ds, k=8)
            .to_pandas()
            .sort_values(["doc_id", "span_start"])
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]
    # only docs 1 and 2 contain duplicated 8-gram spans (the shared sentence)
    assert set(out["doc_id"]) == {1, 2}
    n1 = len(docs.loc[0, "text"].split())
    # doc 1: shared sentence spans tokens [4, 4+12) -> maximal span exactly
    r1 = out[out["doc_id"] == 1].iloc[0]
    assert (r1["span_start"], r1["span_end"]) == (4, 4 + 12)
    r2 = out[out["doc_id"] == 2].iloc[0]
    assert (r2["span_start"], r2["span_end"]) == (4, 4 + 12)
    assert r1["span_end"] <= n1


def test_dup_span_trim_within_doc_repeat(ray_session):
    import pandas as pd
    import ray.data as rd

    from cloud_crawler_ray.ops.dedup import dup_span_trim

    # the SAME doc repeating a gram twice is duplicated (count > 1) even
    # though no other doc shares it
    rep = "a b c d e f g h"
    docs = pd.DataFrame({"doc_id": [7], "text": [rep + " z z z " + rep]})
    out = dup_span_trim(rd.from_pandas(docs), k=8).to_pandas()
    rows = sorted(zip(out["span_start"], out["span_end"]))
    assert rows == [(0, 8), (11, 19)]


def test_margin_mine_planted_pairs_and_partition_invariance(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cloud_crawler_ray.ops.similarity import margin_mine

    rng = np.random.default_rng(5)
    d = 16
    base = rng.normal(size=(12, d))
    # side A: 12 vectors; side B: noisy copies of A[0..5] (true pairs) +
    # 6 unrelated vectors
    A = base
    B = np.vstack(
        [base[:6] + 0.01 * rng.normal(size=(6, d)), rng.normal(size=(6, d))]
    )
    rows = []
    for i, v in enumerate(A):
        rows.append({"vec_id": i, "embedding": v.tolist(), "label": 0})
    for j, v in enumerate(B):
        rows.append({"vec_id": 100 + j, "embedding": v.tolist(), "label": 1})
    emb = pd.DataFrame(rows)
    outs = []
    for parts in (1, 5):
        ds = rd.from_pandas(emb).repartition(parts)
        out = margin_mine(ds, label_a=0, label_b=1, k=4, threshold=1.0)
        outs.append(out.reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got_pairs = set(zip(outs[0]["a"], outs[0]["b"]))
    # every planted pair recovered; no unrelated B vector matched to its
    # planted A counterpart's slot
    for i in range(6):
        assert (i, 100 + i) in got_pairs
    assert all(b - 100 < 6 or a >= 6 for a, b in got_pairs)


def test_margin_mine_empty_sides(ray_session):
    import pandas as pd
    import ray.data as rd

    from cloud_crawler_ray.ops.similarity import margin_mine

    emb = pd.DataFrame(
        {"vec_id": [1, 2], "embedding": [[1.0, 0.0], [0.0, 1.0]], "label": [0, 0]}
    )
    out = margin_mine(rd.from_pandas(emb), label_a=0, label_b=1)
    assert len(out) == 0


def test_hard_negatives_label_mask_and_partition_invariance(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cloud_crawler_ray.ops.similarity import hard_negatives

    rng = np.random.default_rng(9)
    n, d = 60, 8
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [rng.normal(size=d).tolist() for _ in range(n)],
            "label": (np.arange(n) % 3).astype(np.int64),
        }
    )
    anchors = emb.head(10)
    outs = []
    for parts in (1, 6):
        ds = rd.from_pandas(emb).repartition(parts)
        out = hard_negatives(ds, anchors, k=4).to_pandas()
        outs.append(out.reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]
    lbl = dict(zip(emb["vec_id"], emb["label"]))
    # never a same-label neighbor; exactly k per anchor; ranks 1..k
    for qid, g in out.groupby("query_id"):
        assert all(lbl[nb] != lbl[qid] for nb in g["neighbor_id"])
        assert list(g["rank"]) == [1, 2, 3, 4]
    # brute-force check for one anchor
    M = np.stack(emb["embedding"].apply(np.asarray))
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    sims = M[0] @ M.T
    cand = [(s, i) for i, s in enumerate(sims) if lbl[i] != lbl[0]]
    exp = [i for _, i in sorted(cand, key=lambda t: (-t[0], t[1]))[:4]]
    assert list(out[out["query_id"] == 0]["neighbor_id"]) == exp


def test_script_stats_unicode_planted(ray_session):
    import pandas as pd
    import ray.data as rd

    from cloud_crawler_ray.ops.textstats import script_stats

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "hello world 123",
                "你好世界 你好",
                "привет мир",
                "مرحبا بالعالم",
                "!!! ???",
            ],
        }
    )
    out = script_stats(rd.from_pandas(docs)).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_latin"] == 10 and out.loc[1, "n_digit"] == 3
    assert out.loc[1, "dominant"] == "latin"
    assert out.loc[2, "n_cjk"] == 6 and out.loc[2, "dominant"] == "cjk"
    assert out.loc[3, "n_cyrillic"] == 9 and out.loc[3, "dominant"] == "cyrillic"
    assert out.loc[4, "n_arabic"] == 12 and out.loc[4, "dominant"] == "arabic"
    assert out.loc[5, "dominant"] == "none"
    # ties break by fixed order: equal latin and digit -> latin
    tie = pd.DataFrame({"doc_id": [9], "text": ["ab 12"]})
    t = script_stats(rd.from_pandas(tie)).to_pandas()
    assert t.loc[0, "dominant"] == "latin"


def test_minhash_incremental_planted(ray_session):
    import pandas as pd
    import ray.data as rd

    from cloud_crawler_ray.ops.dedup import minhash_incremental, minhash_signatures

    base = (
        "the quick brown fox jumps over the lazy dog while the rain in "
        "spain falls mainly on the plain and every good boy deserves fudge "
        "seven eight nine ten eleven twelve thirteen fourteen fifteen"
    )
    prior = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [base, "completely different prior content " * 8],
        }
    )
    new = pd.DataFrame(
        {
            "doc_id": [10, 11, 12, 13],
            "text": [
                base + " tiny tail change",  # near-dup of prior 1
                "novel new document with fresh content " * 6,  # no match
                base + " another tiny edit",  # near-dup of prior 1 AND of 10
                "novel new document with fresh content " * 6,  # dup of 11 (new x new)
            ],
        }
    )
    prior_sigs = minhash_signatures(
        rd.from_pandas(prior).repartition(2), with_hashes=True
    ).materialize()
    out = minhash_incremental(
        rd.from_pandas(new).repartition(3), prior_sigs
    ).to_pandas()
    pairs = set(zip(out["new_id"], out["prior_id"]))
    assert (10, 1) in pairs and (12, 1) in pairs
    # new x new duplicates (11, 13) and (10, 12) are NOT this op's contract
    assert all(p in (1, 2) for p in out["prior_id"])
    assert 11 not in set(out["new_id"]) and 13 not in set(out["new_id"])

    # the at-scale semi-join verify path must agree exactly
    out_s = minhash_incremental(
        rd.from_pandas(new).repartition(3), prior_sigs, sig_broadcast_cap=0
    ).to_pandas()
    assert out_s.equals(out)


def test_mmr_kernel_diversifies():
    """MMR with planted duplicate clusters: plain top-k would pick the
    near-duplicates of the most-relevant doc; MMR (lambda=0.7) spreads
    across clusters. Also: rank 1 is always the plain argmax."""
    import numpy as np

    from cloud_crawler_ray.ops.similarity import mmr_kernel

    rng = np.random.default_rng(81)
    qv = np.array([1.0, 0.0, 0.0])
    # cluster A: 5 near-copies, very relevant and mutually ~identical;
    # cluster B: anti-correlated with A on dim 2, so after one A pick the
    # redundancy term sinks the remaining A copies below B at lambda=0.6
    A = np.array([[0.95, 0.31, 0.0]] * 5) + rng.normal(0, 1e-5, (5, 3))
    B = np.array([[0.6, -0.8, 0.0]] * 3) + rng.normal(0, 1e-5, (3, 3))
    M = np.vstack([A, B])
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    ids = np.arange(8, dtype=np.int64)
    out = mmr_kernel(qv, ids, M, k=4, lam_num=6, lam_den=10)
    assert out["rank"].tolist() == [1, 2, 3, 4]
    picked = set(out["vec_id"])
    # rank 2 must leave cluster A: at least one of ids 5-7 selected
    assert picked & {5, 6, 7}, picked
    rel = M @ qv
    assert out["vec_id"].iloc[0] == int(np.argmax(rel))
    # plain top-4 by relevance would be all-A — MMR differs
    plain = set(np.argsort(-rel)[:4].tolist())
    assert picked != plain


def test_jl_projection_preserves_cosine():
    """JL with d_out=64 keeps pairwise cosine within a loose distortion
    band on random unit vectors (O(1/sqrt(d_out)) theory), and the sign
    matrix is deterministic across regenerations."""
    import numpy as np

    from cloud_crawler_ray.ops.similarity import jl_matrix

    rng = np.random.default_rng(91)
    X = rng.normal(size=(40, 128))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    R = jl_matrix(128, 64, seed=97)
    assert np.array_equal(R, jl_matrix(128, 64, seed=97))
    Y = X @ R
    Yn = Y / np.linalg.norm(Y, axis=1, keepdims=True)
    orig = X @ X.T
    proj = Yn @ Yn.T
    err = np.abs(orig - proj)
    iu = np.triu_indices(40, 1)
    assert err[iu].mean() < 0.12, err[iu].mean()
    assert err[iu].max() < 0.45, err[iu].max()


def test_levenshtein_kernel_vs_duckdb():
    """The DP kernel must equal DuckDB's levenshtein() (the oracle
    function) on random strings including empty/equal edge cases."""
    import random

    import duckdb

    from cloud_crawler_ray.ops.dedup import levenshtein_kernel

    con = duckdb.connect()
    random.seed(13)
    cases = [("", ""), ("", "abc"), ("abc", ""), ("same", "same")]
    for _ in range(40):
        a = "".join(random.choices("abcdef xyz", k=random.randint(0, 30)))
        b = "".join(random.choices("abcdef xyz", k=random.randint(0, 30)))
        cases.append((a, b))
    for a, b in cases:
        assert levenshtein_kernel(a, b) == con.execute(
            "SELECT levenshtein(?, ?)", [a, b]
        ).fetchone()[0], (a, b)


def test_customer_rfm_driver_vs_distributed_parity(ray_session, monkeypatch):
    """The r5 size-gated RFM driver path (three numpy lexsorts) must equal
    the distributed three-sort stamp path byte for byte (CCRAY_RFM_CAP=0
    forces the at-scale branch)."""
    from cloud_crawler_ray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.01"
    fast = QUERIES["customer_rfm"](sf)
    monkeypatch.setenv("CCRAY_RFM_CAP", "0")
    slow = QUERIES["customer_rfm"](sf)
    assert fast.equals(slow)
    assert set(fast.columns) == {
        "o_custkey", "r_days", "n_orders", "m_cents", "r_q", "f_q", "m_q"
    }
    assert fast["r_q"].between(1, 4).all()
