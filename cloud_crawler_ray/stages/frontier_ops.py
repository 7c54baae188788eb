"""Frontier wave operators: in-wave dedup, committed-seen filter, child
expansion. All vectorized Arrow batch transforms.

- Dedup replaces the reference's queue serialization (first job to check the
  bloom filter wins, crawl_job.rb:96): per-batch partial dedup first (the
  combiner), then a ``groupby(canonical_url)`` keeping the min
  (parent_seq, ordinal) row — deterministic first-wins.
- The seen filter is the cross-wave anti-join against the sharded membership
  actors (the Redis bloom analog): one batched RPC per shard per batch,
  check-only — marking happens at wave commit (batch_crawl_job.rb:139-153).
- Child expansion explodes the fetch stage's already-admitted ``child_urls``
  lists into next-wave frontier rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..canon import canonical_url, host_of
from ..state.shards import shard_of


def _dedup_batch(batch: pa.Table) -> pa.Table:
    """Partial (within-batch) dedup: keep min (parent_seq, ordinal) per
    canonical_url — shrinks the shuffle input."""
    order = pc.sort_indices(
        batch,
        sort_keys=[
            ("canonical_url", "ascending"),
            ("parent_seq", "ascending"),
            ("ordinal", "ascending"),
        ],
    )
    batch = batch.take(order)
    keys = batch.column("canonical_url")
    mask = np.ones(len(keys), dtype=bool)
    arr = keys.to_pylist()
    for i in range(1, len(arr)):
        if arr[i] == arr[i - 1]:
            mask[i] = False
    return batch.filter(pa.array(mask))


def _first_per_group(group: pa.Table) -> pa.Table:
    order = pc.sort_indices(
        group, sort_keys=[("parent_seq", "ascending"), ("ordinal", "ascending")]
    )
    return group.take(order[:1])


def dedup_candidates(ds: rd.Dataset) -> rd.Dataset:
    ds = ds.map_batches(_dedup_batch, batch_format="pyarrow")
    return ds.groupby("canonical_url").map_groups(_first_per_group, batch_format="pyarrow")


class SeenFilter:
    """map_batches callable: drop rows whose canonical_url is in the
    committed seen set. Handles are cloudpickled into the closure; calls are
    batched per shard (never per URL)."""

    def __init__(self, shards: list):
        self.shards = shards
        self.n = len(shards)

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column("canonical_url").to_pylist()
        if not keys:
            return batch
        groups: dict[int, list[int]] = {}
        for i, k in enumerate(keys):
            groups.setdefault(shard_of(k, self.n), []).append(i)
        futs = {
            sid: self.shards[sid].check.remote([keys[i] for i in idxs])
            for sid, idxs in groups.items()
        }
        mask = np.zeros(len(keys), dtype=bool)
        for sid, idxs in groups.items():
            for i, unseen in zip(idxs, ray.get(futs[sid])):
                mask[i] = unseen
        return batch.filter(pa.array(mask))


def filter_unseen(ds: rd.Dataset, state) -> rd.Dataset:
    return ds.map_batches(SeenFilter(state.shards), batch_format="pyarrow")


def explode_children(batch: pa.Table) -> pa.Table:
    """Fetch output rows → next-wave frontier candidates. Child ordinals are
    numbered per job across the job's kept pages (redirect hops first), so
    (parent_seq, ordinal) is a strict total order within a wave."""
    seqs = batch.column("seq").to_pylist()
    pages_urls = batch.column("url").to_pylist()
    depths = batch.column("depth").to_pylist()
    children = batch.column("child_urls").to_pylist()
    bases = batch.column("child_ordinal_base").to_pylist()

    out = {
        "url": [],
        "canonical_url": [],
        "host": [],
        "referer": [],
        "depth": [],
        "parent_seq": [],
        "ordinal": [],
    }
    # child_ordinal_base was assigned by the fetch stage per job, so the
    # numbering is stable even when a job's kept pages split across blocks
    for seq, purl, depth, kids, base in zip(seqs, pages_urls, depths, children, bases):
        for k, ln in enumerate(kids):
            out["url"].append(ln)
            out["canonical_url"].append(canonical_url(ln))
            out["host"].append(host_of(ln))
            out["referer"].append(purl)
            out["depth"].append(depth + 1)
            out["parent_seq"].append(seq)
            out["ordinal"].append(base + k)
    return pa.table(
        {
            "url": pa.array(out["url"], type=pa.string()),
            "canonical_url": pa.array(out["canonical_url"], type=pa.string()),
            "host": pa.array(out["host"], type=pa.string()),
            "referer": pa.array(out["referer"], type=pa.string()),
            "depth": pa.array(out["depth"], type=pa.int32()),
            "parent_seq": pa.array(out["parent_seq"], type=pa.int64()),
            "ordinal": pa.array(out["ordinal"], type=pa.int32()),
        }
    )
