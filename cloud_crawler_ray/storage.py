"""Table storage interface — Lance when available, Parquet otherwise.

The north_rule targets Lance tables of interleaved documents; ``pylance`` is
not installed in this sandbox (no network), so the same schemas are written
as partitioned Parquet behind this one interface (SURVEY §7 plan). Every
output is a *directory of part files per wave/partition* plus a lineage
marker, never one giant file — a failed run skips finished partitions.
"""

from __future__ import annotations

import json
import os

import ray.data as rd

try:  # pragma: no cover - lance is absent in this sandbox
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def write_table(ds: rd.Dataset, path: str) -> None:
    """Write a Dataset as one table partition. Lance branch is real and
    import-gated (north_rule names Lance tables); the sandbox has no
    pylance wheel and no network, so parquet is the active format — same
    schemas, same directory-per-partition layout either way."""
    os.makedirs(path, exist_ok=True)
    if HAVE_LANCE:
        import lance

        # stream batches into the lance writer — no full materialization
        schema = ds.schema().base_schema
        batches = ds.iter_batches(batch_format="pyarrow")
        lance.write_dataset(iter(batches), path, schema=schema, mode="overwrite")
        return
    ds.write_parquet(path)


def read_table(path: str, columns: list[str] | None = None) -> rd.Dataset:
    if HAVE_LANCE and os.path.isdir(path) and any(
        n.endswith(".lance") or n == "_versions" for n in os.listdir(path)
    ):
        # streaming fragment-parallel read (never .to_table() — a Lance
        # corpus at 100 TB must enter as blocks, not one driver table)
        return rd.read_lance(path, columns=columns)
    return rd.read_parquet(path, columns=columns)


def write_json(path: str, obj) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)  # atomic commit marker


def read_json(path: str):
    with open(path) as f:
        return json.load(f)
