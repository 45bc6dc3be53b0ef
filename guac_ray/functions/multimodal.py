"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata. The decode kernels themselves are STUBBED (no image/audio
libraries in this container — see ``set_real_decoder``); the Ray-side
plumbing — schema, small-batch actor pools, output layout — is real and
tested.

Pattern for heavy binary payloads (SURVEY-level scale note):
  * small ``batch_size`` (payload × batch × concurrency must fit worker
    heap) — callers pass e.g. ``batch_size=32`` for images
  * ``batch_format="pyarrow"`` end-to-end (binary columns don't round-trip
    pandas object dtype cleanly)
  * decoder/model loaded once per actor in ``__init__``
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ray.data import Dataset

__all__ = [
    "MEDIA_SCHEMA",
    "ImageDecoder",
    "FrameSampler",
    "decode_images",
    "make_fake_media",
]

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),            # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("meta", pa.string()),            # JSON typed metadata
    ]
)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real decoder: derives stable
    pseudo-dimensions and a 8-dim feature vector from the payload hash."""
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    feat = (np.frombuffer(h[:32], dtype=np.uint8)[:8].astype(np.float64) / 255.0)
    return {"width": int(width), "height": int(height), "features": feat}


class ImageDecoder:
    """Actor-pool stage: media batch → (media_id, width, height,
    features). A real build replaces ``self.decode`` via
    ``set_real_decoder`` (e.g. PIL/libvips); this container has neither,
    so the deterministic fake keeps the plumbing testable.
    """

    real_decoder = None  # set by set_real_decoder()

    def __init__(self, strict: bool = False):
        if strict and ImageDecoder.real_decoder is None:
            raise NotImplementedError(
                "no image decode library in this environment; "
                "install one and call set_real_decoder()"
            )
        self.decode = ImageDecoder.real_decoder or _fake_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        outs = [self.decode(p or b"") for p in batch["payload"].to_pylist()]
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "width": pa.array([o["width"] for o in outs], type=pa.int32()),
                "height": pa.array([o["height"] for o in outs], type=pa.int32()),
                "features": pa.array(
                    [o["features"].tolist() for o in outs], type=pa.list_(pa.float64())
                ),
            }
        )


def set_real_decoder(fn) -> None:
    ImageDecoder.real_decoder = staticmethod(fn)


class FrameSampler:
    """Video analog: emit every Nth "frame" record per payload (1→N
    explode with bounded fan-out; the DocumentTree unpack pattern —
    SURVEY.md §2.2)."""

    def __init__(self, every: int = 10, max_frames: int = 8):
        self.every = every
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, offs = [], [], []
        for mid, p in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
            n = min(self.max_frames, max(1, len(p or b"") // self.every))
            for f in range(n):
                ids.append(mid)
                frames.append(f)
                offs.append(f * self.every)
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_idx": pa.array(frames, type=pa.int32()),
                "byte_offset": pa.array(offs, type=pa.int64()),
            }
        )


def decode_images(media: Dataset, concurrency: int = 2, batch_size: int = 32) -> Dataset:
    """Small batches: payload bytes × batch_size × concurrency bounds the
    per-worker heap for large binaries."""
    return media.map_batches(
        ImageDecoder, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


def make_fake_media(n: int = 64, seed: int = 7) -> pa.Table:
    """Deterministic fake media table for tests/benchmarks."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(rng.integers(100, 4000)), dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), type=pa.int64()),
            "kind": pa.array(["image"] * n, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(["image/fake"] * n, type=pa.string()),
            "meta": pa.array(["{}"] * n, type=pa.string()),
        }
    )
