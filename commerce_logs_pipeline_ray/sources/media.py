"""Real-payload media corpus: deterministic PNG images, WAV audio clips and
VID0 frame containers with ground-truth stats persisted alongside.

The ground-truth columns (width/height/duration_ms/px_sum/sample_sum/
n_frames) are computed from the SOURCE arrays at synthesis time; the
``media_decode_real`` query re-derives them by actually DECODING the
payloads through the multimodal actor pool — the oracle is the stored
truth, so a decode bug cannot cancel itself out.

Sentinel convention: stats that do not apply to a media type are -1 (not
NULL) so every column stays non-null int64 on both the Ray and DuckDB
sides (NULL BIGINT becomes float64+NaN in pandas — a dtype-hash hazard).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.media_codecs import encode_png, encode_video, encode_wav, resize_nearest

AUDIO_RATE = 8000
VIDEO_FPS = 10
RESIZE_H, RESIZE_W = 8, 8


def build_media_tables(n: int, seed: int = 42) -> tuple[pa.Table, pa.Table]:
    """(media, frames): n media rows cycling image → audio → video, all
    really encoded, plus a per-frame ground-truth sidecar for the videos
    (media_id, frame_index, frame_px_sum) — the oracle for frame-sampled
    decode."""
    rng = np.random.default_rng(seed)
    media_id, payload, media_type = [], [], []
    width, height, duration_ms = [], [], []
    px_sum, sample_sum, sample_sq_sum, n_frames = [], [], [], []
    resized_px_sum = []
    f_mid, f_idx, f_px = [], [], []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        media_id.append(f"m{i:06d}")
        media_type.append(kind)
        if kind == "image":
            w, h = 16 + i % 17, 12 + i % 13
            img = (
                np.add.outer(np.arange(h), np.arange(w))[..., None] * [3, 5, 7]
                + rng.integers(0, 64, size=(h, w, 3))
            ).astype(np.uint8)
            payload.append(encode_png(img))
            width.append(w)
            height.append(h)
            duration_ms.append(-1)
            px_sum.append(int(img.astype(np.int64).sum()))
            sample_sum.append(-1)
            sample_sq_sum.append(-1)
            n_frames.append(-1)
            resized_px_sum.append(
                int(resize_nearest(img, RESIZE_H, RESIZE_W).astype(np.int64).sum()))
        elif kind == "audio":
            k = 800 + (i * 13) % 4000
            t = np.arange(k, dtype=np.float64)
            samples = (
                3000 * np.sin(2 * np.pi * (220 + i) * t / AUDIO_RATE)
                + rng.integers(-500, 500, size=k)
            ).astype(np.int16)
            payload.append(encode_wav(samples, AUDIO_RATE))
            width.append(-1)
            height.append(-1)
            duration_ms.append(k * 1000 // AUDIO_RATE)
            px_sum.append(-1)
            s64 = samples.astype(np.int64)
            sample_sum.append(int(s64.sum()))
            sample_sq_sum.append(int((s64 * s64).sum()))
            n_frames.append(-1)
            resized_px_sum.append(-1)
        else:
            k = 2 + i % 3
            w, h = 8 + i % 5, 6 + i % 4
            frames = [
                (np.add.outer(np.arange(h), np.arange(w))[..., None] * [2, 4, 6] + fi * 11)
                .astype(np.uint8)
                for fi in range(k)
            ]
            payload.append(encode_video(frames, VIDEO_FPS))
            width.append(w)
            height.append(h)
            duration_ms.append(k * 1000 // VIDEO_FPS)
            px_sum.append(int(sum(f.astype(np.int64).sum() for f in frames)))
            sample_sum.append(-1)
            sample_sq_sum.append(-1)
            n_frames.append(k)
            resized_px_sum.append(-1)
            for fi, fr in enumerate(frames):
                f_mid.append(f"m{i:06d}")
                f_idx.append(fi)
                f_px.append(int(fr.astype(np.int64).sum()))
    media = pa.table(
        {
            "media_id": pa.array(media_id, pa.string()),
            "payload": pa.array(payload, pa.binary()),
            "media_type": pa.array(media_type, pa.string()),
            "width": pa.array(width, pa.int64()),
            "height": pa.array(height, pa.int64()),
            "duration_ms": pa.array(duration_ms, pa.int64()),
            "px_sum": pa.array(px_sum, pa.int64()),
            "sample_sum": pa.array(sample_sum, pa.int64()),
            "sample_sq_sum": pa.array(sample_sq_sum, pa.int64()),
            "n_frames": pa.array(n_frames, pa.int64()),
            "resized_px_sum": pa.array(resized_px_sum, pa.int64()),
        }
    )
    frames_t = pa.table(
        {
            "media_id": pa.array(f_mid, pa.string()),
            "frame_index": pa.array(f_idx, pa.int64()),
            "frame_px_sum": pa.array(f_px, pa.int64()),
        }
    )
    return media, frames_t


def build_media_table(n: int, seed: int = 42) -> pa.Table:
    return build_media_tables(n, seed)[0]


def build_image_dup_table(n_base: int, seed: int = 42) -> pa.Table:
    """Content-duplicate image corpus with persisted truth: every third base
    image gets a pixel-identical / byte-DIFFERENT variant re-encoded with
    the Up row filter, every fifth an ancillary-tEXt-chunk copy, and every
    seventh an ADVERSARIAL near-miss (one pixel +1) that must NOT group.
    ``dup_of`` is the content-group representative (min media_id) computed
    from the source pixels at synthesis time — the oracle for decode-based
    dedup (payload-hash dedup provably cannot reproduce it)."""
    from ..functions.media_codecs import add_png_text_chunk, encode_png_up

    rng = np.random.default_rng(seed)
    ids, payloads, dup_of = [], [], []
    for i in range(n_base):
        w, h = 12 + i % 21, 10 + i % 17
        img = (
            np.add.outer(np.arange(h), np.arange(w))[..., None] * [5, 3, 11]
            + rng.integers(0, 128, size=(h, w, 3))
        ).astype(np.uint8)
        base_id = f"img{i:05d}"
        ids.append(base_id)
        payloads.append(encode_png(img))
        dup_of.append(base_id)
        if i % 3 == 0:
            ids.append(f"{base_id}v1")
            payloads.append(encode_png_up(img))
            dup_of.append(base_id)
        if i % 5 == 0:
            ids.append(f"{base_id}v2")
            payloads.append(add_png_text_chunk(encode_png(img), b"copy", b"v2"))
            dup_of.append(base_id)
        if i % 7 == 0:
            near = img.copy()
            near[h // 2, w // 2, 0] = np.uint8(int(near[h // 2, w // 2, 0]) + 1)
            ids.append(f"{base_id}x")
            payloads.append(encode_png(near))
            dup_of.append(f"{base_id}x")  # own group: content differs
    return pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "dup_of": pa.array(dup_of, pa.string()),
        }
    )


def build_audio_dup_table(n_base: int, seed: int = 42) -> pa.Table:
    """Gain-variant audio corpus with persisted truth: every second base
    clip gets EXACT x4 and x2 gain copies (byte-different payloads, same
    energy-sign fingerprint); every fifth gets a same-length different-noise
    clip that must stay its own group.  Base amplitudes stay <= 6000 so x4
    never clips — the gain is exactly linear and the fingerprint invariance
    is exact, not approximate."""
    from ..functions.media_codecs import encode_wav

    rng = np.random.default_rng(seed)
    ids, payloads, dup_of = [], [], []
    for i in range(n_base):
        k = 900 + (i * 17) % 3000
        t = np.arange(k, dtype=np.float64)
        base = (
            4000 * np.sin(2 * np.pi * (180 + 7 * i) * t / AUDIO_RATE)
            + rng.integers(-1500, 1500, size=k)
        ).astype(np.int16)
        bid = f"aud{i:05d}"
        ids.append(bid)
        payloads.append(encode_wav(base, AUDIO_RATE))
        dup_of.append(bid)
        if i % 2 == 0:
            ids.append(f"{bid}g4")
            payloads.append(encode_wav((base.astype(np.int32) * 4).astype(np.int16), AUDIO_RATE))
            dup_of.append(bid)
        if i % 3 == 0:
            ids.append(f"{bid}g2")
            payloads.append(encode_wav((base.astype(np.int32) * 2).astype(np.int16), AUDIO_RATE))
            dup_of.append(bid)
        if i % 5 == 0:
            other = (
                4000 * np.sin(2 * np.pi * (180 + 7 * i) * t / AUDIO_RATE)
                + rng.integers(-1500, 1500, size=k)
            ).astype(np.int16)
            ids.append(f"{bid}x")
            payloads.append(encode_wav(other, AUDIO_RATE))
            dup_of.append(f"{bid}x")
    return pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "dup_of": pa.array(dup_of, pa.string()),
        }
    )


def build_video_dup_table(n_base: int, seed: int = 42) -> pa.Table:
    """Content-duplicate video corpus: every second base gets a re-encoded
    container (Up-filter frames — byte-different payload, pixel-identical
    frames); every fifth gets a near-miss with ONE pixel of ONE frame
    changed, which must stay its own group.  ``dup_of`` persisted truth."""
    from ..functions.media_codecs import encode_png_up, encode_video

    rng = np.random.default_rng(seed)
    ids, payloads, dup_of = [], [], []
    for i in range(n_base):
        k = 2 + i % 4
        w, h = 9 + i % 7, 7 + i % 5
        frames = [
            (np.add.outer(np.arange(h), np.arange(w))[..., None] * [3, 7, 5]
             + rng.integers(0, 96, size=(h, w, 3)) + fi * 9).astype(np.uint8)
            for fi in range(k)
        ]
        bid = f"vid{i:05d}"
        ids.append(bid)
        payloads.append(encode_video(frames, VIDEO_FPS))
        dup_of.append(bid)
        if i % 2 == 0:
            ids.append(f"{bid}v1")
            payloads.append(encode_video(frames, VIDEO_FPS, frame_encoder=encode_png_up))
            dup_of.append(bid)
        if i % 5 == 0:
            near = [f.copy() for f in frames]
            near[k // 2][h // 2, w // 2, 1] ^= np.uint8(1)
            ids.append(f"{bid}x")
            payloads.append(encode_video(near, VIDEO_FPS))
            dup_of.append(f"{bid}x")
    return pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "dup_of": pa.array(dup_of, pa.string()),
        }
    )


def _gray_grid_dhash(img: np.ndarray) -> int:
    """Scalar reference dHash: integer luma → 9×8 nearest-neighbor grid →
    64 row-gradient sign bits.  Pure Python loops (synthesis-truth side,
    independent of the vectorized stage kernel)."""
    h, w = img.shape[0], img.shape[1]
    bits = 0
    grid = [[0] * 9 for _ in range(8)]
    for r in range(8):
        for c in range(9):
            sr, sc = (r * h) // 8, (c * w) // 9
            px = img[sr, sc]
            grid[r][c] = (int(px[0]) + int(px[1]) + int(px[2])) // 3 if img.ndim == 3 else int(px)
    k = 0
    for r in range(8):
        for c in range(8):
            if grid[r][c + 1] > grid[r][c]:
                bits |= 1 << k
            k += 1
    return bits


def build_image_scale_dup_table(n_base: int, seed: int = 42) -> pa.Table:
    """Perceptual-dup image corpus with persisted truth: every second base
    image gets a 2× PIXEL-DOUBLED copy (different bytes AND different pixel
    dims — exact content dedup cannot group it; nearest-neighbor dHash
    provably samples the identical 9×8 grid) and every third a +1-brightness
    copy (gradient signs unchanged ⇒ dHash-equal).  ``dup_of`` comes from
    the scalar reference dHash at synthesis time."""
    from ..functions.media_codecs import encode_png

    rng = np.random.default_rng(seed)
    ids, payloads, imgs = [], [], []
    for i in range(n_base):
        w, h = 18 + i % 15, 16 + i % 13
        img = (
            np.add.outer(np.arange(h), np.arange(w))[..., None] * [7, 2, 5]
            + rng.integers(0, 200, size=(h, w, 3))
        ).astype(np.uint8)
        base_id = f"simg{i:05d}"
        ids.append(base_id)
        payloads.append(encode_png(img))
        imgs.append(img)
        if i % 2 == 0:
            ids.append(f"{base_id}s2")
            payloads.append(encode_png(np.repeat(np.repeat(img, 2, axis=0), 2, axis=1)))
            imgs.append(np.repeat(np.repeat(img, 2, axis=0), 2, axis=1))
        if i % 3 == 0:
            bright = np.minimum(img.astype(np.int32) + 1, 255).astype(np.uint8)
            ids.append(f"{base_id}b1")
            payloads.append(encode_png(bright))
            imgs.append(bright)
    hashes = [_gray_grid_dhash(im) for im in imgs]
    first: dict[int, str] = {}
    dup_of = []
    for mid, hsh in zip(ids, hashes):
        first.setdefault(hsh, mid)
        dup_of.append(first[hsh])
    return pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "dup_of": pa.array(dup_of, pa.string()),
        }
    )


SCENE_DIFF_THRESHOLD = 20  # mean abs per-channel diff; cut iff mean > this


def build_scene_video_table(n_videos: int, seed: int = 42) -> tuple[pa.Table, pa.Table]:
    """Scene-cut video corpus with synthesis-time truth: each video is a
    sequence of scenes — within a scene, consecutive frames differ by ±2
    jitter (mean |Δ| ≤ 2); at a planted cut the base frame is redrawn
    (mean |Δ| ≈ 85 for uint8 uniforms) — so the documented threshold rule
    (cut at frame i iff mean |frame_i − frame_{i−1}| > SCENE_DIFF_THRESHOLD)
    separates them with huge margin.  The sidecar truth (media_id,
    cut_index) is computed here from the SOURCE arrays by the same rule the
    engine must reproduce through real container decode."""
    from ..functions.media_codecs import encode_video

    rng = np.random.default_rng(seed)
    ids, payloads, nframes = [], [], []
    t_mid, t_cut = [], []
    for i in range(n_videos):
        k = 6 + i % 7
        w, h = 8 + i % 6, 6 + i % 5
        frames: list[np.ndarray] = []
        base = rng.integers(0, 256, size=(h, w, 3)).astype(np.int64)
        for fi in range(k):
            is_cut = fi > 0 and rng.random() < 0.3
            if is_cut:
                base = rng.integers(0, 256, size=(h, w, 3)).astype(np.int64)
            jitter = rng.integers(-2, 3, size=(h, w, 3))
            frames.append(np.clip(base + jitter, 0, 255).astype(np.uint8))
        mid = f"sc{i:05d}"
        ids.append(mid)
        payloads.append(encode_video(frames, VIDEO_FPS))
        nframes.append(k)
        for fi in range(1, k):
            d = np.abs(frames[fi].astype(np.int64) - frames[fi - 1].astype(np.int64))
            # integer cross-multiplied compare: sum > T · npix
            if int(d.sum()) > SCENE_DIFF_THRESHOLD * d.size:
                t_mid.append(mid)
                t_cut.append(fi)
    videos = pa.table(
        {"media_id": pa.array(ids, pa.string()),
         "payload": pa.array(payloads, pa.binary()),
         "n_frames": pa.array(nframes, pa.int64())}
    )
    truth = pa.table(
        {"media_id": pa.array(t_mid, pa.string()),
         "cut_index": pa.array(t_cut, pa.int64())}
    )
    return videos, truth
