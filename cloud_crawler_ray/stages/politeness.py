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


class ChainLatencyIndex:
    """url → total latency of its same-host redirect chain (the fetch-cost
    model used for slot assignment; mirrors oracle.fetch_chain exactly).

    Built once per crawl: non-redirect rows cost their own latency (the
    overwhelming majority — vectorized copy); only explicit redirect rows
    are chain-walked. Canonical-key fallback is built lazily on the first
    exact-lookup miss, so the common case never pays the O(web)
    canonicalization pass that used to serialize crawl startup."""

    def __init__(self, web: pa.Table, redirect_limit: int = 5):
        import numpy as np

        from ..canon import host_of
        from ..oracle import MAX_HTTP_RETRIES

        self._urls = web.column("url").to_pylist()
        statuses = web.column("status").to_numpy(zero_copy_only=False)
        self._redirects = web.column("redirect_to").to_pylist()
        lats = web.column("latency_ms").to_numpy(zero_copy_only=False).astype(np.int64)
        # per-row clock cost = attempts x latency: failed transient attempts
        # cost latency too (fetch_chain's retry model, http.rb:211-216)
        max_attempts = MAX_HTTP_RETRIES + 1
        if "fail_times" in web.column_names:
            fails = web.column("fail_times").to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            fails = np.zeros(len(lats), dtype=np.int64)
        attempts = np.minimum(fails + 1, max_attempts)
        costs = lats * attempts
        exhausted = fails >= max_attempts
        self.exact: dict[str, int] = {}
        for i, u in enumerate(self._urls):
            self.exact.setdefault(u, i)
        self.chain = costs.copy()
        redirect_rows = [
            i
            for i in range(len(self._urls))
            if 300 <= statuses[i] < 400 and self._redirects[i]
        ]
        for i in redirect_rows:
            total, cur, row = 0, self._urls[i], i
            for _hop in range(redirect_limit + 1):
                total += int(costs[row])
                tgt = self._redirects[row]
                if (
                    not exhausted[row]
                    and 300 <= statuses[row] < 400
                    and tgt
                    and host_of(tgt) == host_of(cur)
                ):
                    nxt = self.exact.get(tgt)
                    if nxt is None:
                        nxt = self._canon_find(tgt)
                    if nxt is None:
                        break
                    cur, row = tgt, nxt
                    continue
                break
            self.chain[i] = total
        self._canon: dict[str, int] | None = None

    def _canon_find(self, u: str):
        if self._canon is None:
            self._canon = {}
            for i, uu in enumerate(self._urls):
                self._canon.setdefault(canonical_url(uu), i)
        return self._canon.get(canonical_url(u))

    def get(self, u: str, default: int = 0) -> int:
        from ..canon import strip_userinfo

        u = strip_userinfo(u)  # match the server-side URL, like net.lookup
        i = self.exact.get(u)
        if i is None:
            i = self._canon_find(u)
        return int(self.chain[i]) if i is not None else default


def build_chain_latency_index(web: pa.Table, redirect_limit: int = 5) -> ChainLatencyIndex:
    return ChainLatencyIndex(web, redirect_limit)


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
