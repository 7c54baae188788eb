"""Storage interface tests: parquet path always, Lance path import-gated.

The sandbox has no pylance wheel, so the Lance round-trip test SKIPS here —
it runs (and exercises storage.py's HAVE_LANCE write/read branch end-to-end)
the day the environment provides the wheel. The parquet fallback is covered
unconditionally through the same interface."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from cloud_crawler_ray import storage


def _sample_table() -> pa.Table:
    spans = pa.array(
        [
            [
                {"kind": "text", "text": "hello", "media_ref": "", "offset": 0},
                {"kind": "link", "text": "next", "media_ref": "http://h/2", "offset": 1},
            ],
            [],
        ],
        pa.list_(
            pa.struct(
                [
                    ("kind", pa.string()),
                    ("text", pa.string()),
                    ("media_ref", pa.string()),
                    ("offset", pa.int32()),
                ]
            )
        ),
    )
    return pa.table({"doc_id": pa.array(["a", "b"]), "spans": spans})


def test_parquet_roundtrip(ray_session, tmp_path):
    tbl = _sample_table()
    path = str(tmp_path / "docs")
    storage.write_table(rd.from_arrow(tbl), path)
    back = storage.read_table(path).take_all()
    assert {r["doc_id"] for r in back} == {"a", "b"}
    by_id = {r["doc_id"]: r["spans"] for r in back}
    assert [s["kind"] for s in by_id["a"]] == ["text", "link"]
    # column pruning through the interface
    only_ids = storage.read_table(path, columns=["doc_id"]).take_all()
    assert set(only_ids[0].keys()) == {"doc_id"}


@pytest.mark.skipif(not storage.HAVE_LANCE, reason="pylance not installed")
def test_lance_roundtrip(ray_session, tmp_path):
    """Runs only when a pylance wheel is importable: the write must produce a
    Lance dataset (not parquet), and read_table must route through the Lance
    reader with column pruning."""
    import os

    tbl = _sample_table()
    path = str(tmp_path / "docs_lance")
    storage.write_table(rd.from_arrow(tbl), path)
    assert any(
        n.endswith(".lance") or n == "_versions" for n in os.listdir(path)
    ), "write_table did not produce a Lance dataset"
    back = storage.read_table(path).take_all()
    assert {r["doc_id"] for r in back} == {"a", "b"}
    only_ids = storage.read_table(path, columns=["doc_id"]).take_all()
    assert set(only_ids[0].keys()) == {"doc_id"}
