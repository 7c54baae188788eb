"""Per-host politeness slot assignment.

The reference enforces politeness with a serial ``sleep(delay)`` before each
job inside a batch (batch_job.rb:178-183) plus emergent per-host connection
serialization (http.rb:219-240). Here the constraint is made explicit and
turned into *data*: a ``groupby(host)`` shuffle guarantees one task owns all
of a host's jobs in a wave; that task reads the host's persistent virtual
clock from its state shard and assigns each job a fetch slot

    t_i = clock + (i+1)*delay + sum_{j<i} chain_latency_j

(i.e. sleep(delay), fetch serially — exactly the oracle's model). The clock
is advanced to the last job's end at wave *commit* time (mark-after-commit,
batch_crawl_job.rb:139-153 generalized), so an uncommitted wave recomputes
identical slots on resume — resumability never violates the politeness
budget.

Skew note: a hot host concentrates rows in one group here, but slot
assignment is a vectorized cumsum (O(n) numpy); the expensive fetch+extract
stage runs *afterwards* as plain ``map_batches`` over whatever block split
the executor chooses, so host skew does not serialize real work. At real
network scale the fetcher sleeps until its slot; throughput on a hot host is
then bounded by the politeness budget itself, which no scheduler can beat.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..canon import canonical_url


def build_chain_latency_index(
    web: pa.Table, redirect_limit: int = 5
) -> dict[str, int]:
    """url → total latency of its same-host redirect chain (the fetch-cost
    model used for slot assignment; mirrors oracle.fetch_chain exactly).
    Built once per crawl from three small columns; broadcast via ray.put."""
    urls = web.column("url").to_pylist()
    statuses = web.column("status").to_pylist()
    redirects = web.column("redirect_to").to_pylist()
    lats = web.column("latency_ms").to_pylist()
    idx: dict[str, int] = {}
    canon: dict[str, int] = {}
    for i, u in enumerate(urls):
        idx.setdefault(u, i)
        canon.setdefault(canonical_url(u), i)

    from ..canon import host_of

    def find(u: str):
        j = idx.get(u)
        return j if j is not None else canon.get(canonical_url(u))

    out: dict[str, int] = {}
    for u in urls:
        total, cur = 0, u
        for _ in range(redirect_limit + 1):
            j = find(cur)
            if j is None:
                break
            total += lats[j]
            tgt = redirects[j]
            if 300 <= statuses[j] < 400 and tgt and host_of(tgt) == host_of(cur):
                cur = tgt
                continue
            break
        out[u] = total
    return out


class SlotAssigner:
    """map_groups callable for groupby("host"): adds fetch_time_ms and
    job_end_ms columns. One clock-shard RPC per host per wave."""

    def __init__(self, state, chain_idx_ref, delay_ms: int):
        self.state = state
        self.chain_idx_ref = chain_idx_ref
        self.delay_ms = delay_ms
        self._chain_idx = None

    def __call__(self, group: pa.Table) -> pa.Table:
        if self._chain_idx is None:
            self._chain_idx = ray.get(self.chain_idx_ref)
        host = group.column("host")[0].as_py()
        order = pa.compute.sort_indices(group, sort_keys=[("seq", "ascending")])
        group = group.take(order)
        clock = self.state.get_clocks([host])[host]
        urls = group.column("url").to_pylist()
        lat = np.array([self._chain_idx.get(u, 0) for u in urls], dtype=np.int64)
        n = len(urls)
        # t_i = clock + (i+1)*delay + cumsum_exclusive(latency)
        cum = np.concatenate([[0], np.cumsum(lat)[:-1]]) if n else np.array([], dtype=np.int64)
        t = clock + self.delay_ms * np.arange(1, n + 1, dtype=np.int64) + cum
        ends = t + lat
        group = group.append_column("fetch_time_ms", pa.array(t, type=pa.int64()))
        group = group.append_column("job_end_ms", pa.array(ends, type=pa.int64()))
        return group


def assign_slots(
    ds: rd.Dataset, state, chain_idx_ref, delay_ms: int
) -> rd.Dataset:
    assigner = SlotAssigner(state, chain_idx_ref, delay_ms)

    def assign(group: pa.Table) -> pa.Table:  # map_groups wants a plain fn
        return assigner(group)

    return ds.groupby("host").map_groups(assign, batch_format="pyarrow")
