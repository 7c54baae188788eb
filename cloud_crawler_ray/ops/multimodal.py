"""Multimodal column plumbing: opaque binary media payloads with typed
metadata, decoded / feature-extracted by actor-pool map_batches stages.

The image/audio libraries are not in this container, so the DECODE KERNEL is
stubbed: ``DecodeBackend`` tries to import PIL; absent that it uses a
clearly-marked deterministic fake (payload-hash-derived dimensions and mean
color). Everything Ray-side is real and tested — the media table schema, the
small-batch actor pool (binary payloads → small batch_size), init-once
backend loading, and the feature output layout.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("doc_id", pa.string()),
        ("kind", pa.string()),        # image | video | audio
        ("media_ref", pa.string()),
        ("payload", pa.large_binary()),
        ("content_type", pa.string()),
    ]
)

FEATURE_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_bytes", pa.int64()),
        ("mean_r", pa.int32()),
        ("mean_g", pa.int32()),
        ("mean_b", pa.int32()),
        ("n_frames", pa.int32()),     # 1 for images; sampled count for video
        ("backend", pa.string()),     # "pil" | "fake"
    ]
)


def synth_payload(media_ref: str, kind: str) -> bytes:
    """Deterministic fake media payload derived from the ref (test fixture)."""
    h = hashlib.blake2b(media_ref.encode(), digest_size=32).digest()
    return bytes([0xFF, 0xD8 if kind == "image" else 0x00]) + h * 8


class DecodeBackend:
    """Decode kernel behind an import-try. With PIL present this would open
    the image and compute real dims/means; in this container it is the
    deterministic fake (STUB — clearly marked via the ``backend`` column)."""

    def __init__(self):
        try:  # pragma: no cover - PIL absent in this sandbox
            from PIL import Image  # noqa: F401

            self.name = "pil"
        except ImportError:
            self.name = "fake"

    def decode(self, payload: bytes, kind: str) -> dict:
        if self.name == "pil":  # pragma: no cover
            raise NotImplementedError(
                "real decode not wired in this sandbox; fake backend is the "
                "deterministic stand-in"
            )
        h = hashlib.blake2b(payload, digest_size=16).digest()
        return {
            "width": 64 + h[0] % 192,
            "height": 64 + h[1] % 192,
            "n_bytes": len(payload),
            "mean_r": h[2],
            "mean_g": h[3],
            "mean_b": h[4],
            "n_frames": 1 if kind == "image" else 1 + h[5] % 16,
        }


class MediaFeatureExtractor:
    """Actor-pool stage: backend loaded once per actor in __init__ (the
    model-load pattern), per-batch decode in __call__. Use a SMALL
    batch_size — payload bytes dominate block memory."""

    def __init__(self):
        self.backend = DecodeBackend()

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {name: [] for name in FEATURE_SCHEMA.names}
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        for mid, kind, payload in zip(
            batch.column("media_id").to_pylist(), kinds, payloads
        ):
            f = self.backend.decode(payload, kind)
            cols["media_id"].append(mid)
            cols["kind"].append(kind)
            for key in ("width", "height", "n_bytes", "mean_r", "mean_g", "mean_b", "n_frames"):
                cols[key].append(f[key])
            cols["backend"].append(self.backend.name)
        return pa.table(cols, schema=FEATURE_SCHEMA)


THUMB_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),
        ("width", pa.int32()),      # resized dims (aspect-preserving fit)
        ("height", pa.int32()),
        ("payload", pa.large_binary()),  # thumbnail bytes (fake backend: hash-derived)
        ("backend", pa.string()),
    ]
)

FRAME_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("frame_idx", pa.int32()),
        ("ts_ms", pa.int64()),      # frame timestamp at the nominal 25 fps
        ("payload", pa.large_binary()),
        ("backend", pa.string()),
    ]
)


class MediaResizer:
    """Actor-pool resize stage: aspect-preserving fit into max_dim. The
    pixel work is the stubbed backend (PIL absent — thumbnail bytes are
    hash-derived and deterministic); the Ray plumbing (init-once backend,
    small binary batches, typed output schema) is real."""

    def __init__(self, max_dim: int = 64):
        self.backend = DecodeBackend()
        self.max_dim = max_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {name: [] for name in THUMB_SCHEMA.names}
        for mid, kind, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            f = self.backend.decode(payload, kind)
            w, h = f["width"], f["height"]
            scale = min(1.0, self.max_dim / max(w, h))
            nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
            thumb = hashlib.blake2b(
                payload + bytes([nw & 0xFF, nh & 0xFF]), digest_size=32
            ).digest()
            cols["media_id"].append(mid)
            cols["kind"].append(kind)
            cols["width"].append(nw)
            cols["height"].append(nh)
            cols["payload"].append(thumb)
            cols["backend"].append(self.backend.name)
        return pa.table(cols, schema=THUMB_SCHEMA)


class FrameSampler:
    """Actor-pool frame-sampling stage (videos → one row per sampled frame,
    every_n-th frame up to max_frames). Flat-map explode with small binary
    batches; non-video rows pass through nothing."""

    def __init__(self, every_n: int = 4, max_frames: int = 4, fps: int = 25):
        self.backend = DecodeBackend()
        self.every_n = every_n
        self.max_frames = max_frames
        self.fps = fps

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {name: [] for name in FRAME_SCHEMA.names}
        for mid, kind, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if kind != "video":
                continue
            n = self.backend.decode(payload, kind)["n_frames"]
            idxs = list(range(0, n, self.every_n))[: self.max_frames]
            for i in idxs:
                frame = hashlib.blake2b(
                    payload + i.to_bytes(4, "little"), digest_size=32
                ).digest()
                cols["media_id"].append(mid)
                cols["frame_idx"].append(i)
                cols["ts_ms"].append(i * 1000 // self.fps)
                cols["payload"].append(frame)
                cols["backend"].append(self.backend.name)
        return pa.table(cols, schema=FRAME_SCHEMA)


def resize_media(media: rd.Dataset, max_dim: int = 64, concurrency: int = 2) -> rd.Dataset:
    return media.map_batches(
        MediaResizer,
        fn_constructor_kwargs={"max_dim": max_dim},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=concurrency,
    )


def sample_frames(
    media: rd.Dataset, every_n: int = 4, max_frames: int = 4, concurrency: int = 2
) -> rd.Dataset:
    return media.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"every_n": every_n, "max_frames": max_frames},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=concurrency,
    )


def span_kind_stats(docs: rd.Dataset) -> "pd.DataFrame":
    """Span-composition profile of the interleaved (doc_id, spans) table:
    per span kind, total spans and number of documents containing the kind
    — the payload-mix summary that sizes downstream media stages. Fully
    vectorized: list_flatten / list_parent_indices + native Arrow group_by
    per block, driver combine bounded by the handful of kinds."""
    import pandas as pd
    import pyarrow.compute as pc

    def part(t: pa.Table) -> pa.Table:
        spans = t.column("spans").combine_chunks()
        kinds = pc.struct_field(pc.list_flatten(spans), "kind")
        rows = pc.list_parent_indices(spans)
        n_spans = (
            pa.table({"kind": kinds})
            .group_by("kind")
            .aggregate([([], "count_all")])
            .to_pandas()
            .rename(columns={"count_all": "n_spans"})
        )
        n_docs = (
            pa.table({"row": rows, "kind": kinds})
            .group_by(["row", "kind"])
            .aggregate([])
            .group_by("kind")
            .aggregate([([], "count_all")])
            .to_pandas()
            .rename(columns={"count_all": "n_docs"})
        )
        return pa.Table.from_pandas(
            n_spans.merge(n_docs, on="kind"), preserve_index=False
        )

    parts = docs.map_batches(part, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {
                "kind": pd.Series(dtype=str),
                "n_spans": pd.Series(dtype="int64"),
                "n_docs": pd.Series(dtype="int64"),
            }
        )
    out = (
        parts.groupby("kind", as_index=False)[["n_spans", "n_docs"]]
        .sum()
        .sort_values("kind")
        .reset_index(drop=True)
    )
    return out.astype({"n_spans": "int64", "n_docs": "int64"})


def media_table_from_documents(docs: rd.Dataset) -> rd.Dataset:
    """Explode the interleaved-span documents table into a media table with
    synthesized payloads (the fetch-media stage stand-in)."""

    def explode(batch: pa.Table) -> pa.Table:
        rows = {name: [] for name in MEDIA_SCHEMA.names}
        for did, spans in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        ):
            for s in spans or []:
                if s["kind"] in ("image", "video"):
                    ref = s["media_ref"]
                    rows["media_id"].append(f"{did}#{s['offset']}")
                    rows["doc_id"].append(did)
                    rows["kind"].append(s["kind"])
                    rows["media_ref"].append(ref)
                    rows["payload"].append(synth_payload(ref, s["kind"]))
                    rows["content_type"].append(
                        "image/png" if s["kind"] == "image" else "video/mp4"
                    )
        return pa.table(rows, schema=MEDIA_SCHEMA)

    return docs.map_batches(explode, batch_format="pyarrow", batch_size=1024)


def extract_media_features(media: rd.Dataset, concurrency: int = 2) -> rd.Dataset:
    return media.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=256,  # binary payloads: small batches
        concurrency=concurrency,
    )
