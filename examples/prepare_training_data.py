"""prepare_training_data example — the end-to-end training-data story this
engine exists for: crawl a web of interleaved text+media documents, curate
the text corpus (length gate → keep-best dedup → benchmark decontamination →
train/test split), score quality with the corpus-trained bigram LM, mine
media captions, and pack the interleaved documents into fixed-token-budget
training sequences — every stage a streaming Ray Data transform.

The reference crawler stops at the page store; this is the downstream
pipeline a 100 TB pretraining corpus actually runs (and each stage here is
individually SQL-checked or pytest-pinned via the queries() registry).

Run: python examples/prepare_training_data.py
"""

from __future__ import annotations


def main(tmp_dir: str = "/tmp/ccray_example_prepdata") -> dict:
    import pyarrow as pa
    import ray
    import ray.data as rd

    from cloud_crawler_ray.ops.curation import curate_corpus
    from cloud_crawler_ray.ops.lm import lm_quality_score
    from cloud_crawler_ray.ops.multimodal import interleave_pack, media_captions
    from cloud_crawler_ray.pipelines.crawl import crawl
    from cloud_crawler_ray.spec import CrawlSpec
    from cloud_crawler_ray.synthweb import make_skewed_web

    # 1. crawl — interleaved (doc_id, spans) documents
    web, seeds = make_skewed_web(300, n_hosts=6, seed=13)
    handle = crawl(web, seeds, CrawlSpec(depth_limit=5), tmp_dir)
    docs = handle.documents()

    # 2. flatten the text side for curation (text spans only, in order).
    # The curation ops key on int64 doc ids (the testdata convention), so
    # derive a stable 63-bit id from the canonical URL — deterministic
    # across runs/processes, collision-negligible at corpus scale.
    import hashlib

    def _int_id(url: str) -> int:
        return int.from_bytes(
            hashlib.blake2b(url.encode(), digest_size=8).digest(), "big"
        ) >> 1

    def flatten_text(t: pa.Table) -> pa.Table:
        ids, texts = [], []
        for did, spans in zip(
            t.column("doc_id").to_pylist(), t.column("spans").to_pylist()
        ):
            ids.append(_int_id(did))
            texts.append(" ".join(s["text"] for s in spans or [] if s["kind"] == "text"))
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
        )

    text_ds = docs.map_batches(flatten_text, batch_format="pyarrow").materialize()

    # 3. curate: gate → dedup → decontaminate → split
    curated = curate_corpus(text_ds, min_tokens=5).materialize()

    # 4. corpus-trained LM quality score (threshold downstream as needed)
    scored = lm_quality_score(text_ds, vocab_cap=5000, bigram_cap=20000)

    # 5. media side: caption candidates per media span
    captions = media_captions(docs)

    # 6. pack the interleaved docs into 512-token training sequences
    packed = interleave_pack(docs, seq_tokens=512)

    n_train = curated.map_batches(
        lambda t: t.filter(pa.compute.equal(t.column("split"), "train")),
        batch_format="pyarrow",
    ).count()
    return {
        "documents": docs.count(),
        "curated": curated.count(),
        "train": n_train,
        "scored": scored.count(),
        "captions": captions.count(),
        "sequences": int(packed.to_pandas()["seq_id"].max()) + 1,
    }


if __name__ == "__main__":
    import json

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    try:
        print(json.dumps(main()))
    finally:
        ray.shutdown()
