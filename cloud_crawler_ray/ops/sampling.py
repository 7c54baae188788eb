"""Dataset splitting / sampling operators for training-data pipelines.

A split must be a pure function of the row key — never of block order,
partition count, or a driver-held RNG — so that (a) re-running any subset of
a 100-TB input reproduces the same assignment, (b) a resumed job agrees with
the killed one, and (c) the assignment is SQL-expressible for the oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

# Knuth's multiplicative hash constant (2^32 / golden ratio) — public-domain
# integer mixing; the split is h(doc_id) = (doc_id * K) mod 2^32, a full-period
# permutation of the 32-bit ring, so consecutive ids land uniformly.
_KNUTH = 2654435761
_M32 = 2**32


def train_test_split(
    ds: rd.Dataset, key: str = "doc_id", train_pct: int = 90
) -> rd.Dataset:
    """Deterministic hash split: rows where (key * K) mod 2^32 mod 100 falls
    under ``train_pct`` go to "train", the rest to "test". Map-side only —
    no shuffle, no state; uint64 wraparound is exact because
    2^32 divides 2^64, so the numpy overflow semantics equal the oracle's
    HUGEINT arithmetic."""

    def assign(t: pa.Table) -> pa.Table:
        ids = t.column(key).to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(_KNUTH)) % np.uint64(_M32) % np.uint64(100)
        split = np.where(h < train_pct, "train", "test")
        return pa.table(
            {
                key: t.column(key),
                "split": pa.array(split.astype(object), pa.string()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")
