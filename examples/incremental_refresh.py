"""incremental_refresh example — the daily-corpus-refresh story: day 1
crawls a web and PERSISTS its MinHash signature table next to the corpus;
day 2 crawls the mutated web and admits only documents that are neither an
exact repeat (fingerprint anti-join) nor a near-duplicate of the prior
corpus (minhash_incremental against the persisted signatures — the prior
corpus is never re-shingled), then marks the admitted documents' internally
duplicated spans (dup_span_trim) for trimming before they join the
training pool. At 100 TB this is the shape that keeps a continuously
refreshed corpus dedup'd without ever re-processing the archive.

Run: python examples/incremental_refresh.py
"""

from __future__ import annotations


def main(tmp_dir: str = "/tmp/ccray_example_increment") -> dict:
    import shutil

    import pyarrow as pa
    import ray.data as rd

    from cloud_crawler_ray.ops.dedup import (
        dup_span_trim,
        minhash_incremental,
        minhash_signatures,
    )
    from cloud_crawler_ray.pipelines.crawl import crawl
    from cloud_crawler_ray.spec import CrawlSpec
    from cloud_crawler_ray.synthweb import make_skewed_web

    shutil.rmtree(tmp_dir, ignore_errors=True)

    # day 1: crawl, extract text, persist the corpus AND its signatures
    web1, seeds = make_skewed_web(300, n_hosts=6, seed=11)
    run1 = crawl(web1, seeds, CrawlSpec(), f"{tmp_dir}/day1")
    day1 = run1.documents().map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.string()),
                "text": pa.array(
                    [
                        " ".join(
                            s["text"] for s in spans if s.get("text")
                        )
                        for spans in t.column("spans").to_pylist()
                    ],
                    pa.string(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    prior_sigs = minhash_signatures(day1, with_hashes=True)
    prior_sigs.write_parquet(f"{tmp_dir}/prior_sigs")

    # day 2: a mutated web — most pages identical, a few changed/new
    web2, seeds2 = make_skewed_web(330, n_hosts=6, seed=11)
    run2 = crawl(web2, seeds2, CrawlSpec(), f"{tmp_dir}/day2")
    day2 = run2.documents().map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.string()),
                "text": pa.array(
                    [
                        " ".join(s["text"] for s in spans if s.get("text"))
                        for spans in t.column("spans").to_pylist()
                    ],
                    pa.string(),
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    # doc ids are URL strings here; minhash_incremental is id-type-agnostic
    # up to the pair-shard hash, which routes strings through pandas' hasher
    prior = rd.read_parquet(f"{tmp_dir}/prior_sigs")
    matches = minhash_incremental(day2, prior, threshold=0.9).to_pandas()
    dup_new = set(matches["new_id"].tolist())

    admitted = day2.map_batches(
        lambda t, dup=dup_new: t.filter(
            pa.array([d not in dup for d in t.column("doc_id").to_pylist()])
        ),
        batch_format="pyarrow",
    ).materialize()

    spans = dup_span_trim(admitted, k=8).to_pandas()
    out = {
        "day1_docs": day1.count(),
        "day2_docs": day2.count(),
        "near_dup_matches": len(matches),
        "admitted": admitted.count(),
        "trim_spans": len(spans),
    }
    print(out)
    return out


if __name__ == "__main__":
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    main()
    ray.shutdown()
