"""api_harvest example — BatchApiJob + HttpParty surface end-to-end
(reference lib/cloud-crawler/batch_api_job.rb:33-104 + http_party.rb:26-135):
fetch every endpoint of a JSON API with the ApiClient actor pool, keep the
successfully parsed documents, and aggregate a per-tag score table — the
"harvest an API into an analyzable table" workflow the reference's API job
family exists for.

Run: python examples/api_harvest.py
"""

from __future__ import annotations


def main(n_docs: int = 200):
    import json

    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from cloud_crawler_ray.stages.api_client import ApiOptions, fetch_results
    from cloud_crawler_ray.synthweb import make_api_web

    web, urls = make_api_web(n_docs, seed=17)
    seed_ds = rd.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    fetched = fetch_results(seed_ds, web, ApiOptions(), concurrency=2)

    def per_tag(batch: pd.DataFrame) -> pd.DataFrame:
        rows: list[tuple[str, int, int]] = []
        for ok, doc_json in zip(batch["ok"], batch["json"]):
            if not ok:
                continue
            doc = json.loads(doc_json)
            for tag in doc.get("tags", []):
                rows.append((tag, int(doc["score"]), 1))
        out = pd.DataFrame(rows, columns=["tag", "score", "n"])
        # block-level partial: one row per tag per block
        return out.groupby("tag", as_index=False).sum()

    parts = fetched.map_batches(per_tag, batch_format="pandas").to_pandas()
    agg = parts.groupby("tag", as_index=False).sum()
    agg = agg.sort_values("tag").reset_index(drop=True)
    return {row["tag"]: (int(row["n"]), int(row["score"])) for _, row in agg.iterrows()}


if __name__ == "__main__":
    import os

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
        )
    try:
        out = main()
        print(f"{len(out)} tags; sample: {dict(list(out.items())[:3])}")
    finally:
        ray.shutdown()
