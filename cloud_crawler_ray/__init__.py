"""cloud_crawler_ray — a Ray-Data-native distributed crawl + data-processing engine.

Brand-new implementation (not a port) of the crawl semantics of
CalculatedContent/cloud-crawler (reference at /root/reference/cloud-crawler),
re-expressed as iterative ``ray.data.Dataset`` waves over zero-copy Arrow
batches, with actor-pool-hosted URL-seen membership shards, per-host
politeness clocks, and interleaved text+media span documents as output.

Never calls ``ray.init()`` — sessions are owned by the caller (bench.py,
CLI entry points, the pytest fixture, or the grading driver).
"""

__version__ = "0.1.0"
