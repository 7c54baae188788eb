"""embedding_curation example — the vector-side corpus pipeline: semantic
dedup (SemDeDup) over an embedding table, then a compressed ANN index
(product quantization) built on the survivors and queried. This is the
embedding half of a pretraining-data refresh: near-duplicate pruning before
the expensive downstream stages, then a memory-bounded similarity index for
retrieval/mixing (the PQ codes are 32× smaller than the float rows).

Run: python examples/embedding_curation.py [sf_dir]
"""

from __future__ import annotations


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    import os

    import ray.data as rd

    from cloud_crawler_ray.ops.dedup import semantic_dedup
    from cloud_crawler_ray.ops.similarity import knn_pq

    emb = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )

    # 1. semantic dedup: keep one representative per cosine-0.5 group,
    #    searching only within k-means clusters (the SemDeDup cost model)
    import numpy as np
    import ray

    marks = semantic_dedup(emb, threshold=0.5, k=10, n_iter=8).materialize()
    kept = marks.to_pandas()
    kept_arr = np.sort(kept.loc[kept["keep"], "vec_id"].to_numpy().astype(np.int64))
    ref = ray.put(kept_arr)  # broadcast once; searchsorted probe per block

    def keep_block(df):
        ids = df["vec_id"].to_numpy().astype(np.int64)
        a = ray.get(ref)
        pos = np.searchsorted(a, ids)
        hit = (pos < len(a)) & (a[np.minimum(pos, len(a) - 1)] == ids)
        return df[hit]

    survivors = emb.map_batches(keep_block, batch_format="pandas")

    # 2. compressed ANN over the survivors: PQ codebooks + ADC top-k
    queries = survivors.take(5)
    import pandas as pd

    qdf = pd.DataFrame(
        {
            "vec_id": [r["vec_id"] for r in queries],
            "embedding": [np.asarray(r["embedding"]) for r in queries],
        }
    )
    nn = knn_pq(survivors, qdf, k=5, m=8).to_pandas()
    return {
        "n_vectors": len(kept),
        "n_kept": int(kept["keep"].sum()),
        "neighbors": nn,
    }


if __name__ == "__main__":
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    out = main()
    print(f"kept {out['n_kept']}/{out['n_vectors']} vectors after semantic dedup")
    print(out["neighbors"].head(10))
    ray.shutdown()
