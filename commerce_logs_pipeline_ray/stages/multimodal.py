"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as plain Arrow ``binary`` columns
with sidecar metadata columns — exactly how ``tokens`` is carried for text.
Decode / feature-extract / resize / frame-sample are **actor-pool
map_batches stages** (codec/model state loads once per actor in
``__init__``; SURVEY §2.5 ST2 pattern).

The REAL decode path uses the dependency-free codecs in
``functions/media_codecs.py``: PNG (zlib inflate + scanline unfilter), WAV
PCM (RIFF parse), and the documented VID0 frame container over real PNG
frames — ``use_stub=False`` genuinely decodes.  Heavyweight codecs that
need native libraries absent from this container (JPEG, H.264, MP3) keep
the clearly-marked ``NotImplementedError`` hooks; the deterministic stub
implementations remain for plumbing tests on opaque payloads.

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
        """Loaded ONCE per actor (ST2 pattern).  PNG decodes for real via
        the stdlib-only codec; JPEG would need a native library."""
        from ..functions.media_codecs import decode_png

        return decode_png

    @staticmethod
    def _load_jpeg_codec():
        raise NotImplementedError(
            "JPEG needs a native codec (libjpeg/PIL) not present in this "
            "container; slot it in here (loaded once per actor)"
        )

    def _decode_real(self, payload: bytes) -> np.ndarray:
        """payload → FEATURE_DIM float32 vector from REAL pixels: grayscale
        4×4 block means (a deterministic, resolution-independent pooling)."""
        img = self._codec(payload)
        gray = img.astype(np.float32) if img.ndim == 2 else img.astype(np.float32).mean(axis=2)
        h, w = gray.shape
        ys = np.linspace(0, h, 5, dtype=np.int64)
        xs = np.linspace(0, w, 5, dtype=np.int64)
        out = np.zeros(self.FEATURE_DIM, dtype=np.float32)
        for yi in range(4):
            for xi in range(4):
                block = gray[ys[yi] : max(ys[yi + 1], ys[yi] + 1),
                             xs[xi] : max(xs[xi + 1], xs[xi] + 1)]
                out[yi * 4 + xi] = float(block.mean()) / 255.0
        return out

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
        if not self.use_stub:
            # real mode decodes PNG — keep only image rows (other media
            # types have their own probes)
            import pyarrow.compute as pc

            t = t.filter(pc.equal(t["media_type"], "image"))
        payloads = t["payload"].to_pylist()
        if not self.use_stub and not payloads:
            flat0 = pa.array([], pa.float32())
            return pa.table(
                {
                    "media_id": t["media_id"],
                    "media_type": t["media_type"],
                    "feature": pa.ListArray.from_arrays(pa.array([0], pa.int32()), flat0),
                }
            )
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
    """Actor-pool stage: video payload → up to K sampled frame payloads.

    ``use_stub=False`` parses the real VID0 container (media_codecs) and
    emits GENUINE PNG frame payloads at K evenly-spaced frame indices —
    each downstream-decodable by ``ImageDecoder(use_stub=False)``.  An
    H.264 bitstream would need ffmpeg (``_load_ffmpeg`` hook below); the
    stub slices the opaque byte stream (schema/fan-out semantics identical).
    """

    def __init__(self, k_frames: int = 4, use_stub: bool = True):
        self.k = k_frames
        self.use_stub = use_stub
        if not use_stub:
            from ..functions.media_codecs import video_frame_payloads

            self._parse = video_frame_payloads  # loaded once per actor

    @staticmethod
    def _load_ffmpeg():
        raise NotImplementedError(
            "H.264/containerized video needs ffmpeg, absent from this "
            "container; slot it in here (loaded once per actor)"
        )

    def _sample_real(self, payload: bytes) -> list[tuple[int, bytes]]:
        _fps, frames = self._parse(payload)
        if len(frames) <= self.k:
            return list(enumerate(frames))
        picks = np.linspace(0, len(frames) - 1, self.k, dtype=np.int64)
        return [(int(i), frames[int(i)]) for i in picks]

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, frames, indices = [], [], []
        for mid, payload, mtype in zip(
            t["media_id"].to_pylist(), t["payload"].to_pylist(), t["media_type"].to_pylist()
        ):
            if mtype != "video":
                continue
            if self.use_stub:
                step = max(1, len(payload) // self.k)
                for fi in range(self.k):
                    ids.append(mid)
                    indices.append(fi)
                    frames.append(payload[fi * step : fi * step + 64])
            else:
                for fi, png in self._sample_real(payload):
                    ids.append(mid)
                    indices.append(fi)
                    frames.append(png)
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.string()),
                "frame_index": pa.array(indices, type=pa.int32()),
                "frame_payload": pa.array(frames, type=pa.binary()),
            }
        )


class ImageResizer:
    """Actor-pool stage: REAL decode → nearest-neighbor resize → re-encode.

    The full image-preprocessing hop a training pipeline runs at scale:
    payload in, payload out (PNG), with typed size metadata — downstream
    stages keep consuming a plain binary column.  Codec + kernel bind once
    per actor (ST2 pattern)."""

    def __init__(self, out_h: int = 8, out_w: int = 8):
        from ..functions.media_codecs import decode_png, encode_png, resize_nearest

        self.out_h, self.out_w = out_h, out_w
        self._decode, self._encode, self._resize = decode_png, encode_png, resize_nearest

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.equal(t["media_type"], "image"))
        out_payload, px_sums = [], []
        for payload in t["payload"].to_pylist():
            small = self._resize(self._decode(payload), self.out_h, self.out_w)
            out_payload.append(self._encode(small))
            px_sums.append(int(small.astype(np.int64).sum()))
        n = len(out_payload)
        return pa.table(
            {
                "media_id": t["media_id"],
                "payload": pa.array(out_payload, pa.binary()),
                "width": pa.array(np.full(n, self.out_w, np.int64)),
                "height": pa.array(np.full(n, self.out_h, np.int64)),
                "resized_px_sum": pa.array(px_sums, pa.int64()),
            }
        )


class MediaProbe:
    """Actor-pool stage: REAL decode of every payload → typed stats.

    image → PNG decode: width/height and exact integer pixel sum;
    audio → WAV parse: duration (n·1000//rate) and exact sample sum;
    video → VID0 parse + per-frame PNG decode: dims, duration, pixel sum,
    frame count.  Inapplicable stats are -1 (never NULL — keeps every
    column non-null int64 on both the Ray and oracle sides).

    Codecs bind once per actor in ``__init__`` (ST2 pattern; reference
    analogue service.go:284-309)."""

    def __init__(self):
        from ..functions.media_codecs import decode_png, decode_video, decode_wav

        self._png, self._wav, self._vid = decode_png, decode_wav, decode_video

    def __call__(self, t: pa.Table) -> pa.Table:
        n = len(t)
        width = np.full(n, -1, np.int64)
        height = np.full(n, -1, np.int64)
        duration = np.full(n, -1, np.int64)
        px_sum = np.full(n, -1, np.int64)
        sample_sum = np.full(n, -1, np.int64)
        sample_sq_sum = np.full(n, -1, np.int64)
        n_frames = np.full(n, -1, np.int64)
        for i, (payload, mtype) in enumerate(
            zip(t["payload"].to_pylist(), t["media_type"].to_pylist())
        ):
            if mtype == "image":
                img = self._png(payload)
                height[i], width[i] = img.shape[0], img.shape[1]
                px_sum[i] = int(img.astype(np.int64).sum())
            elif mtype == "audio":
                rate, samples = self._wav(payload)
                duration[i] = len(samples) * 1000 // rate
                s64 = samples.astype(np.int64)
                sample_sum[i] = int(s64.sum())
                sample_sq_sum[i] = int((s64 * s64).sum())  # energy, exact
            elif mtype == "video":
                fps, frames = self._vid(payload)
                n_frames[i] = len(frames)
                duration[i] = len(frames) * 1000 // fps
                height[i], width[i] = frames[0].shape[0], frames[0].shape[1]
                px_sum[i] = int(sum(f.astype(np.int64).sum() for f in frames))
        return pa.table(
            {
                "media_id": t["media_id"],
                "media_type": t["media_type"],
                "width": pa.array(width),
                "height": pa.array(height),
                "duration_ms": pa.array(duration),
                "px_sum": pa.array(px_sum),
                "sample_sum": pa.array(sample_sum),
                "sample_sq_sum": pa.array(sample_sq_sum),
                "n_frames": pa.array(n_frames),
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


class PixelDigest:
    """Actor-pool stage: PNG payload → digest of the DECODED pixel content
    (md5 over shape + raw pixel bytes).  Byte-different encodings of the
    same pixels (different row filters, ancillary chunks, deflate levels)
    collapse to one digest — the content-dedup key that payload hashing
    cannot provide.  Codec bound once per actor (ST2 pattern,
    service.go:284-309)."""

    def __init__(self):
        from ..functions.media_codecs import decode_png

        self._decode = decode_png

    def __call__(self, t: pa.Table) -> pa.Table:
        import hashlib

        digests = []
        for p in t["payload"].to_pylist():
            img = self._decode(p)
            h = hashlib.md5(str(img.shape).encode() + img.tobytes())
            digests.append(h.hexdigest())
        return pa.table(
            {"media_id": t["media_id"], "digest": pa.array(digests, pa.string())}
        )


class AudioFingerprint:
    """Actor-pool stage: WAV payload → gain-invariant acoustic fingerprint
    (block-energy sign pattern, Haitsma-Kalker style) prefixed with the
    sample count.  Exact-gain copies (byte-different payloads) collapse to
    one digest; different takes of the same length do not.  Codec bound
    once per actor."""

    def __init__(self, blocks: int = 32):
        from ..functions.media_codecs import audio_sign_fingerprint, decode_wav

        self._decode = decode_wav
        self._fp = audio_sign_fingerprint
        self.blocks = blocks

    def __call__(self, t: pa.Table) -> pa.Table:
        digests = []
        for p in t["payload"].to_pylist():
            _, samples = self._decode(p)
            digests.append(f"{len(samples)}|{self._fp(samples, self.blocks)}")
        return pa.table(
            {"media_id": t["media_id"], "digest": pa.array(digests, pa.string())}
        )


class VideoDigest:
    """Actor-pool stage: VID0 payload → digest of the decoded CONTENT
    (fps, frame count, every frame's shape + raw pixels) — re-encoded
    containers with pixel-identical frames collapse; any single-pixel
    change in any frame separates."""

    def __init__(self):
        from ..functions.media_codecs import decode_video

        self._decode = decode_video

    def __call__(self, t: pa.Table) -> pa.Table:
        import hashlib

        digests = []
        for p in t["payload"].to_pylist():
            fps, frames = self._decode(p)
            h = hashlib.md5(f"{fps}|{len(frames)}".encode())
            for f in frames:
                h.update(str(f.shape).encode())
                h.update(f.tobytes())
            digests.append(h.hexdigest())
        return pa.table(
            {"media_id": t["media_id"], "digest": pa.array(digests, pa.string())}
        )


class AudioDownsample:
    """Actor-pool stage: WAV payload → 2:1 decimated PCM summary.  Adjacent
    sample pairs average with floor division ((s₀+s₁)//2, trailing odd
    sample dropped), halving the rate — the cheap anti-aliased-enough
    resample a feature-extraction pipeline runs before fingerprinting.
    Codec bound once per actor; per-clip integer checksum pins the math
    against the independent stdlib-``wave`` reference decoder
    (queries.ensure_audio_resample_parquet)."""

    def __init__(self, factor: int = 2):
        from ..functions.media_codecs import decode_wav

        assert factor == 2, "only 2:1 implemented"
        self._decode = decode_wav

    def __call__(self, t: pa.Table) -> pa.Table:
        in_n, out_n, out_rate, checksum = [], [], [], []
        for p in t["payload"].to_pylist():
            rate, pcm = self._decode(p)
            pcm = np.asarray(pcm, dtype=np.int64)
            m = len(pcm) // 2
            down = (pcm[0 : 2 * m : 2] + pcm[1 : 2 * m : 2]) // 2
            in_n.append(len(pcm))
            out_n.append(m)
            out_rate.append(rate // 2)
            checksum.append(int(down.sum()))
        return pa.table(
            {
                "media_id": t["media_id"],
                "in_samples": pa.array(in_n, pa.int64()),
                "out_samples": pa.array(out_n, pa.int64()),
                "out_rate": pa.array(out_rate, pa.int64()),
                "checksum": pa.array(checksum, pa.int64()),
            }
        )


class ImagePHash:
    """Actor-pool stage: PNG payload → 64-bit perceptual dHash (integer
    luma → 9×8 nearest-neighbor grid → row-gradient sign bits).  Catches
    what exact pixel-digest dedup cannot: rescaled and brightness-shifted
    re-encodes hash identically (nearest sampling of a pixel-doubled image
    reproduces the same grid; +k brightness preserves gradient signs).
    Vectorized per image: one fancy-index gather + one comparison."""

    def __init__(self):
        from ..functions.media_codecs import decode_png

        self._decode = decode_png

    def __call__(self, t: pa.Table) -> pa.Table:
        hashes = []
        weights = (np.uint64(1) << np.arange(64, dtype=np.uint64)).reshape(8, 8)
        for p in t["payload"].to_pylist():
            img = self._decode(p)
            h, w = img.shape[0], img.shape[1]
            rs = (np.arange(8, dtype=np.int64) * h) // 8
            cs = (np.arange(9, dtype=np.int64) * w) // 9
            patch = img[rs[:, None], cs[None, :]]
            if patch.ndim == 3:
                gray = (
                    patch[..., 0].astype(np.int64)
                    + patch[..., 1].astype(np.int64)
                    + patch[..., 2].astype(np.int64)
                ) // 3
            else:
                gray = patch.astype(np.int64)
            bits = (gray[:, 1:] > gray[:, :-1]).astype(np.uint64)
            hashes.append(int((bits * weights).sum()))
        return pa.table(
            {
                "media_id": t["media_id"],
                "phash": pa.array(np.array(hashes, dtype=np.uint64)),
            }
        )


class SceneCutDetector:
    """Actor-pool stage: VID0 payload → (media_id, cut_index) rows — a cut
    at frame i iff the mean absolute per-channel difference to frame i−1
    exceeds the threshold (integer cross-multiplied compare: Σ|Δ| > T·npix,
    no float in the decision).  Decode machinery binds once per actor; the
    per-frame diff is one vectorized int64 pass."""

    def __init__(self, threshold: int | None = None):
        from ..functions.media_codecs import decode_video
        from ..sources.media import SCENE_DIFF_THRESHOLD

        self._decode = decode_video
        self._t = SCENE_DIFF_THRESHOLD if threshold is None else threshold

    def __call__(self, t: pa.Table) -> pa.Table:
        mids, cuts = [], []
        for mid, p in zip(t["media_id"].to_pylist(), t["payload"].to_pylist()):
            _, frames = self._decode(p)
            prev = None
            for fi, fr in enumerate(frames):
                cur = fr.astype(np.int64)
                if prev is not None:
                    d = np.abs(cur - prev)
                    if int(d.sum()) > self._t * d.size:
                        mids.append(mid)
                        cuts.append(fi)
                prev = cur
        return pa.table(
            {"media_id": pa.array(mids, pa.string()),
             "cut_index": pa.array(cuts, pa.int64())}
        )
