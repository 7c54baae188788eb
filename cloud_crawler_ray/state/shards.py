"""Sharded crawl state actors: URL-seen membership + per-host politeness clocks.

The reference keeps this state in a master Redis instance (bloom filter
redis_url_bloomfilter.rb; implicit per-host pacing via sleep(delay)
batch_job.rb:178-183). Here it lives in Ray actors hash-partitioned by key —
``StateShard`` holds one partition of the exact seen set plus a Bloom summary
(the at-scale representation; exact set gives test-scale exactness) and one
partition of the host→virtual-clock map. Shard count scales with the cluster
(256 shards on a 256-node cluster ⇒ ~47 MB bloom per shard at 10^10 URLs,
see filters.py memory math); all calls are batched (one RPC per shard per
wave-stage, not per URL).

Snapshot/restore supports per-partition checkpointing with lineage
(north_rule resumability).
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd
import ray

from .filters import BloomFilter


def shards_of(keys: list[str], n_shards: int) -> np.ndarray:
    """Vectorized shard routing (pandas' SipHash — deterministic across
    processes, ~30x faster than a per-key Python crc32 loop). Routing only
    needs within-run consistency; results never depend on the partition.

    CAUTION: keys must not contain NUL (\\x00). pandas' categorizing hasher
    factorizes object keys through a C-string hashtable that truncates at
    NUL, so NUL-keys sharing a prefix collapse into one category and the
    SAME key can route to different shards depending on its neighbors in
    the array — i.e. routing becomes block-content-dependent. Composite
    keys should join with a non-NUL separator (\\x1f, or a char the parts
    cannot contain)."""
    if not keys:
        return np.empty(0, dtype=np.int64)
    arr = np.asarray(keys, dtype=object)
    return (pd.util.hash_array(arr) % n_shards).astype(np.int64)


def shard_of(key: str, n_shards: int) -> int:
    return int(shards_of([key], n_shards)[0])


def group_indices_by_shard(keys: list[str], n_shards: int) -> dict[int, np.ndarray]:
    """shard id → numpy indices of *keys* routed there (order-preserving)."""
    sh = shards_of(keys, n_shards)
    order = np.argsort(sh, kind="stable")
    sorted_sh = sh[order]
    bounds = np.flatnonzero(np.diff(sorted_sh)) + 1
    return {
        int(sorted_sh[s]): order[s:e]
        for s, e in zip(
            np.concatenate([[0], bounds]), np.concatenate([bounds, [len(sh)]])
        )
    } if len(sh) else {}


@ray.remote(num_cpus=0.25)
class StateShard:
    """One partition of seen-set + host clocks. num_cpus=0.25 so a pool of
    shards coexists with fetch/extract stages on one node."""

    def __init__(self, shard_id: int, bloom_bits: int = 1 << 20):
        self.shard_id = shard_id
        self.seen: set[str] = set()
        self.bloom = BloomFilter(n_bits=bloom_bits)
        self.clocks: dict[str, int] = {}
        # per-host scheduled-page counts (max_pages_per_host budget); same
        # partitioning and commit discipline as the clocks
        self.sched: dict[str, int] = {}
        # per-host observed-latency (sum_ms, n_jobs) for adaptive politeness;
        # same partitioning and commit discipline as the clocks
        self.lat: dict[str, tuple[int, int]] = {}
        # transient per-wave first-wins claims (in-wave dedup without a
        # shuffle): wave → {canonical_url: min (parent_seq, ordinal)}.
        # Registered by candidate PRODUCERS (fetch tasks / spill writer /
        # seeds pass), consumed by admit_frontier during the next wave's
        # planning, cleared at that wave's commit. Never checkpointed — a
        # resumed plan re-registers via the fallback claim pass.
        self.claims: dict[int, dict[str, tuple[int, int]]] = {}

    # ---- membership (the Redis bloom analog) ----
    def check(self, keys: list[str]) -> list[bool]:
        """True = unseen. Bloom fast-path: a bloom miss is definitely unseen;
        a hit falls back to the exact set (no false positives at test scale,
        while exercising the at-scale data structure)."""
        return [not (k in self.bloom and k in self.seen) for k in keys]

    def add(self, keys: list[str]) -> int:
        for k in keys:
            if k not in self.seen:
                self.seen.add(k)
                self.bloom.add(k)
        return len(self.seen)

    def check_and_add(self, keys: list[str]) -> list[bool]:
        """Atomic first-wins admission (in-shard serialization — the queue
        analog). Returns True where the key was newly admitted."""
        out = []
        for k in keys:
            if k in self.bloom and k in self.seen:
                out.append(False)
            else:
                self.seen.add(k)
                self.bloom.add(k)
                out.append(True)
        return out

    def seen_count(self) -> int:
        return len(self.seen)

    # ---- in-wave frontier claims (dedup without a shuffle) ----
    def claim_frontier(
        self, wave: int, keys: list[str], pseqs: list[int], ords: list[int]
    ) -> None:
        """First-wins claim registration: per key keep the min (parent_seq,
        ordinal). Idempotent min-merge — task retries and duplicate
        registration converge to the same winner."""
        claims = self.claims.setdefault(wave, {})
        for k, p, o in zip(keys, pseqs, ords):
            cur = claims.get(k)
            if cur is None or (p, o) < cur:
                claims[k] = (p, o)

    def admit_frontier(
        self, wave: int, keys: list[str], pseqs: list[int], ords: list[int]
    ) -> list[bool]:
        """True = this row is its key's claim winner AND the key is unseen —
        the in-wave first-wins dedup and the cross-wave anti-join in one
        batched call. A key with no registered claim was never contested
        (degenerate single-producer case): seen check only."""
        claims = self.claims.get(wave, {})
        out = []
        for k, p, o in zip(keys, pseqs, ords):
            c = claims.get(k)
            if c is not None and c != (p, o):
                out.append(False)
            else:
                out.append(not (k in self.bloom and k in self.seen))
        return out

    def clear_claims(self, wave: int) -> None:
        self.claims.pop(wave, None)

    # ---- politeness clocks ----
    def advance_clocks(self, updates: dict[str, int]) -> None:
        for host, t in updates.items():
            self.clocks[host] = max(self.clocks.get(host, 0), t)

    def get_clocks(self, hosts: list[str]) -> dict[str, int]:
        return {h: self.clocks.get(h, 0) for h in hosts}

    # ---- per-host crawl budget (scheduled-page counts) ----
    def add_sched(self, updates: dict[str, int]) -> None:
        for host, n in updates.items():
            self.sched[host] = self.sched.get(host, 0) + int(n)

    def get_sched(self, hosts: list[str]) -> dict[str, int]:
        return {h: self.sched.get(h, 0) for h in hosts}

    # ---- per-host observed-latency stats (adaptive politeness) ----
    def add_lat(self, updates: dict[str, tuple[int, int]]) -> None:
        for host, (s, n) in updates.items():
            ps, pn = self.lat.get(host, (0, 0))
            self.lat[host] = (ps + int(s), pn + int(n))

    def get_lat(self, hosts: list[str]) -> dict[str, tuple[int, int]]:
        return {h: self.lat.get(h, (0, 0)) for h in hosts}

    # ---- checkpoint ----
    def snapshot(self) -> bytes:
        return pickle.dumps(
            {
                "shard_id": self.shard_id,
                "seen": self.seen,
                "clocks": self.clocks,
                "sched": self.sched,
                "lat": self.lat,
            },
            protocol=pickle.HIGHEST_PROTOCOL,
        )

    def restore(self, blob: bytes) -> None:
        state = pickle.loads(blob)
        self.seen = state["seen"]
        self.clocks = state["clocks"]
        self.sched = state.get("sched", {})
        self.lat = state.get("lat", {})
        self.bloom = BloomFilter(n_bits=self.bloom.n_bits)
        self.bloom.add_many(list(self.seen))


class ShardedState:
    """Driver-side handle bundle. Methods batch per-shard RPCs; the handles
    themselves are cloudpickled into map_batches closures so tasks can call
    shards directly (no driver round-trip in the hot path)."""

    def __init__(self, n_shards: int, bloom_bits: int = 1 << 20):
        self.n_shards = n_shards
        self.shards = [
            StateShard.remote(i, bloom_bits=bloom_bits) for i in range(n_shards)
        ]

    def _group(self, keys: list[str]) -> dict[int, "np.ndarray"]:
        return group_indices_by_shard(keys, self.n_shards)

    def check(self, keys: list[str]) -> list[bool]:
        out = [True] * len(keys)
        groups = self._group(keys)
        futs = {
            sid: self.shards[sid].check.remote([keys[i] for i in idxs])
            for sid, idxs in groups.items()
        }
        for sid, idxs in groups.items():
            for i, unseen in zip(idxs, ray.get(futs[sid])):
                out[i] = unseen
        return out

    def add(self, keys: list[str]) -> None:
        groups = self._group(keys)
        ray.get(
            [
                self.shards[sid].add.remote([keys[i] for i in idxs])
                for sid, idxs in groups.items()
            ]
        )

    def get_clocks(self, hosts: list[str]) -> dict[str, int]:
        out: dict[str, int] = {}
        groups = self._group(hosts)
        futs = [
            self.shards[sid].get_clocks.remote([hosts[i] for i in idxs])
            for sid, idxs in groups.items()
        ]
        for d in ray.get(futs):
            out.update(d)
        return out

    def advance_clocks(self, updates: dict[str, int]) -> None:
        per_shard: dict[int, dict[str, int]] = {}
        for host, t in updates.items():
            per_shard.setdefault(shard_of(host, self.n_shards), {})[host] = t
        ray.get(
            [self.shards[sid].advance_clocks.remote(u) for sid, u in per_shard.items()]
        )

    def get_sched(self, hosts: list[str]) -> dict[str, int]:
        out: dict[str, int] = {}
        groups = self._group(hosts)
        futs = [
            self.shards[sid].get_sched.remote([hosts[i] for i in idxs])
            for sid, idxs in groups.items()
        ]
        for d in ray.get(futs):
            out.update(d)
        return out

    def add_sched(self, updates: dict[str, int]) -> None:
        per_shard: dict[int, dict[str, int]] = {}
        for host, n in updates.items():
            per_shard.setdefault(shard_of(host, self.n_shards), {})[host] = n
        ray.get(
            [self.shards[sid].add_sched.remote(u) for sid, u in per_shard.items()]
        )

    def get_lat(self, hosts: list[str]) -> dict[str, tuple[int, int]]:
        out: dict[str, tuple[int, int]] = {}
        groups = self._group(hosts)
        futs = [
            self.shards[sid].get_lat.remote([hosts[i] for i in idxs])
            for sid, idxs in groups.items()
        ]
        for d in ray.get(futs):
            out.update(d)
        return out

    def add_lat(self, updates: dict[str, tuple[int, int]]) -> None:
        per_shard: dict[int, dict[str, tuple[int, int]]] = {}
        for host, sn in updates.items():
            per_shard.setdefault(shard_of(host, self.n_shards), {})[host] = sn
        ray.get(
            [self.shards[sid].add_lat.remote(u) for sid, u in per_shard.items()]
        )

    def seen_count(self) -> int:
        return sum(ray.get([s.seen_count.remote() for s in self.shards]))

    def claim_frontier(
        self, wave: int, keys: list[str], pseqs: list[int], ords: list[int]
    ) -> None:
        groups = self._group(keys)
        ray.get(
            [
                self.shards[sid].claim_frontier.remote(
                    wave,
                    [keys[i] for i in idxs],
                    [int(pseqs[i]) for i in idxs],
                    [int(ords[i]) for i in idxs],
                )
                for sid, idxs in groups.items()
            ]
        )

    def clear_claims(self, wave: int) -> None:
        ray.get([s.clear_claims.remote(wave) for s in self.shards])

    def snapshots(self) -> list[bytes]:
        return ray.get([s.snapshot.remote() for s in self.shards])

    def restore(self, blobs: list[bytes]) -> None:
        assert len(blobs) == self.n_shards
        ray.get([s.restore.remote(b) for s, b in zip(self.shards, blobs)])

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []
