"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as plain Arrow ``binary`` columns
with sidecar metadata columns — exactly how ``tokens`` is carried for text.
Decode / feature-extract / resize / frame-sample are **actor-pool
map_batches stages** (codec/model state loads once per actor in
``__init__``; SURVEY §2.5 ST2 pattern).

The actual codec calls are STUBBED in this environment (no Pillow/ffmpeg in
the container): each stage ships a deterministic fake implementation used by
default so the Ray-side plumbing — schema, batch sizing, actor signature,
output layout — is real and tested, and raises ``NotImplementedError`` from
the clearly-marked ``_decode_real`` hooks where a codec would slot in.

Batch-size guidance (memory-aware): binary payloads are large — size
``batch_size`` so ``batch_bytes × concurrency`` fits the worker heap; e.g.
4 MB images → batch_size≈32 with concurrency 8 on a 4 GB heap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import fnv1a64

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.string()),
        pa.field("payload", pa.binary()),       # opaque encoded bytes
        pa.field("media_type", pa.string()),    # "image" | "audio" | "video"
        pa.field("width", pa.int32()),          # typed metadata (nullable)
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),
    ]
)


def synth_media_table(n: int, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media corpus for plumbing tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=payload_bytes, dtype=np.uint8).tobytes() for _ in range(n)]
    types = [["image", "audio", "video"][i % 3] for i in range(n)]
    return pa.table(
        {
            "media_id": pa.array([f"m{i:06d}" for i in range(n)]),
            "payload": pa.array(payloads, type=pa.binary()),
            "media_type": pa.array(types),
            "width": pa.array([(256 + i % 512) if t == "image" else None for i, t in enumerate(types)], type=pa.int32()),
            "height": pa.array([(256 + i % 256) if t == "image" else None for i, t in enumerate(types)], type=pa.int32()),
            "duration_ms": pa.array([(1000 + i) if t != "image" else None for i, t in enumerate(types)], type=pa.int32()),
        }
    )


class ImageDecoder:
    """Actor-pool stage: payload → decoded feature vector.

    ``__init__`` is where the real codec/model would load ONCE per actor.
    ``use_stub=True`` (default here) produces a deterministic fake feature:
    a 16-dim float32 vector derived from the payload hash — stable across
    runs/partitionings, so downstream stages and tests are real.
    """

    FEATURE_DIM = 16

    def __init__(self, use_stub: bool = True):
        self.use_stub = use_stub
        if not use_stub:
            self._codec = self._load_real_codec()

    @staticmethod
    def _load_real_codec():
        raise NotImplementedError(
            "real image codec not available in this container; "
            "slot PIL/torchvision in here (loaded once per actor)"
        )

    def _decode_real(self, payload: bytes) -> np.ndarray:
        raise NotImplementedError("real decode path — requires a codec library")

    def _decode_stub(self, payloads: list[bytes]) -> np.ndarray:
        # deterministic fake: FNV64 of 16 byte-stripes → scaled floats
        n = len(payloads)
        out = np.zeros((n, self.FEATURE_DIM), dtype=np.float32)
        for i, p in enumerate(payloads):
            stripes = [p[j :: self.FEATURE_DIM][:32].hex() for j in range(self.FEATURE_DIM)]
            h = fnv1a64(stripes)
            out[i] = (h % np.uint64(1 << 24)).astype(np.float32) / float(1 << 24)
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        feats = (
            self._decode_stub(payloads)
            if self.use_stub
            else np.stack([self._decode_real(p) for p in payloads])
        )
        flat = pa.array(feats.reshape(-1))
        offsets = pa.array(np.arange(0, (len(payloads) + 1) * self.FEATURE_DIM, self.FEATURE_DIM, dtype=np.int32))
        return pa.table(
            {
                "media_id": t["media_id"],
                "media_type": t["media_type"],
                "feature": pa.ListArray.from_arrays(offsets, flat),
            }
        )


class FrameSampler:
    """Actor-pool stage: video payload → K deterministic 'frame' payloads.

    Real implementation would ffmpeg-seek; the stub slices the byte stream
    at K evenly-spaced offsets (schema/fan-out semantics identical)."""

    def __init__(self, k_frames: int = 4, use_stub: bool = True):
        self.k = k_frames
        if not use_stub:
            raise NotImplementedError("real frame sampling requires ffmpeg")

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, frames, indices = [], [], []
        for mid, payload, mtype in zip(
            t["media_id"].to_pylist(), t["payload"].to_pylist(), t["media_type"].to_pylist()
        ):
            if mtype != "video":
                continue
            step = max(1, len(payload) // self.k)
            for fi in range(self.k):
                ids.append(mid)
                indices.append(fi)
                frames.append(payload[fi * step : fi * step + 64])
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.string()),
                "frame_index": pa.array(indices, type=pa.int32()),
                "frame_payload": pa.array(frames, type=pa.binary()),
            }
        )


def decode_media(ds, concurrency: int = 4, batch_size: int = 64):
    """documents-of-media Dataset → features, via an actor pool."""
    return ds.map_batches(
        ImageDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )
