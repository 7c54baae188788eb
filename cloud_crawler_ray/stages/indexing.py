"""Distributed deterministic sequence assignment (zipWithIndex).

The reference gets global ordering for free from a single FIFO Redis queue
plus auto-increment ids (driver.rb:95, 122-137). Distributed, we assign each
wave's jobs a global rank: sort by the deterministic priority key
(parent_seq, ordinal), then stamp row numbers without moving data to the
driver — block row-counts come from ref-bundle *metadata* (no block reads),
offsets are a prefix sum, and a tiny Ray task per block adds the offset.
Driver memory is O(#blocks), not O(rows)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


@ray.remote(num_cpus=0.5)
def _stamp(block: pa.Table, col: str, start: int) -> pa.Table:
    idx = pa.array(np.arange(start, start + block.num_rows, dtype=np.int64))
    if col in block.column_names:
        block = block.drop_columns([col])
    return block.append_column(col, idx)


def zip_with_index(
    ds: rd.Dataset, sort_keys: list[str], col: str = "seq", base: int = 0,
    with_count: bool = False,
) -> rd.Dataset | tuple[rd.Dataset, int]:
    """Sort by *sort_keys* and add a global 0-based (+base) row index.

    With ``with_count=True`` also returns the total row count — already known
    here from the sorted blocks' metadata, so callers skip a whole
    ``ds.count()`` execution (one fewer per-wave Ray execution floor)."""
    ds = ds.sort(sort_keys).materialize()
    refs, counts = [], []
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            if meta.num_rows == 0:
                continue  # empty sort partitions carry no schema — drop them
            refs.append(ref)
            counts.append(meta.num_rows)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]) + base if counts else []
    new_refs = [_stamp.remote(r, col, int(o)) for r, o in zip(refs, offsets)]
    total = int(sum(counts))
    out = ds if not new_refs else rd.from_arrow_refs(new_refs)
    return (out, total) if with_count else out
