"""Dependency-free media codecs: PNG (via ``zlib``) and WAV PCM (via
``struct``) — the REAL decode path for the multimodal stages.

No Pillow/ffmpeg exists in this container, but PNG is just zlib-compressed
filtered scanlines and WAV is a RIFF header over raw PCM — both fully
decodable with the standard library.  These codecs let the multimodal
actor-pool stages (stages/multimodal.py) decode genuine encoded payloads
end-to-end: synthesize → encode → Parquet binary column → actor decode →
typed stats, oracle-checked against ground truth persisted at synthesis
time.

Formats (intentionally scoped):
- PNG: 8-bit depth, grayscale (color type 0) or RGB (color type 2),
  non-interlaced.  The encoder emits filter 0 (None) rows; the decoder
  handles ALL five standard filters (None/Sub/Up/Average/Paeth) so
  externally-produced files of this shape decode too.
- WAV: PCM 16-bit little-endian, mono or multi-channel.

Spec references (public): PNG — RFC 2083 / W3C PNG spec §6 (filters);
WAV — Microsoft RIFF/WAVE format documentation.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """Encode a (H,W) grayscale or (H,W,3) RGB uint8 array as a real PNG."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        h, w, channels, color_type = img.shape[0], img.shape[1], 1, 0
    elif img.ndim == 3 and img.shape[2] == 3:
        h, w, channels, color_type = img.shape[0], img.shape[1], 3, 2
    else:
        raise ValueError(f"expected (H,W) or (H,W,3) uint8, got {img.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 (None) prepended to every scanline
    flat = img.reshape(h, w * channels)
    raw = np.zeros((h, w * channels + 1), dtype=np.uint8)
    raw[:, 1:] = flat
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit grayscale/RGB non-interlaced PNG → uint8 (H,W[,3])."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = channels = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or interlace != 0 or comp != 0 or filt != 0:
                raise ValueError(f"unsupported PNG shape: depth={depth} interlace={interlace}")
            channels = {0: 1, 2: 3}.get(color_type)
            if channels is None:
                raise ValueError(f"unsupported color type {color_type}")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT length mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    ftypes = rows[:, 0]
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(height):
        f = int(ftypes[y])
        line = rows[y, 1:].astype(np.int64)
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up — vectorized
            cur = (line + prev) & 0xFF
        elif f == 1:  # Sub — sequential in pixels, vector over channels
            cur = line.copy()
            for i in range(channels, stride):
                cur[i] = (cur[i] + cur[i - channels]) & 0xFF
        elif f == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                a = cur[i - channels] if i >= channels else 0
                cur[i] = (cur[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                a = int(cur[i - channels]) if i >= channels else 0
                c = int(prev[i - channels]) if i >= channels else 0
                cur[i] = (cur[i] + _paeth(a, int(prev[i]), c)) & 0xFF
        else:
            raise ValueError(f"bad filter type {f} in row {y}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(height, width) if channels == 1 else out.reshape(height, width, 3)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 PCM samples ((N,) mono or (N,C)) as a real WAV file."""
    samples = np.ascontiguousarray(samples, dtype="<i2")
    n_channels = 1 if samples.ndim == 1 else samples.shape[1]
    data = samples.tobytes()
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, byte_rate, n_channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a PCM-16 WAV → (sample_rate, int16 array (N,) or (N,C))."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    sample_rate = n_channels = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            audio_fmt, n_channels, sample_rate, _, _, bits = struct.unpack_from("<HHIIHH", body)
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV: fmt={audio_fmt} bits={bits}")
        elif tag == b"data":
            pcm = np.frombuffer(body, dtype="<i2")
    if sample_rate is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    if n_channels > 1:
        pcm = pcm.reshape(-1, n_channels)
    return sample_rate, pcm


# --- toy video container -----------------------------------------------------
# Real video codecs (H.264 etc.) need ffmpeg, which this container lacks; a
# "video" here is an explicit, documented frame container over REAL PNG
# frames: b"VID0" | uint16 fps | uint16 n_frames | n × (uint32 len | png).
# Frame sampling and per-frame decode are therefore genuinely exercised —
# only the bitstream format is simplified.
_VID_MAGIC = b"VID0"


def encode_video(frames: list[np.ndarray], fps: int, frame_encoder=None) -> bytes:
    enc = frame_encoder or encode_png
    body = bytearray(_VID_MAGIC)
    body += struct.pack("<HH", fps, len(frames))
    for f in frames:
        png = enc(f)
        body += struct.pack("<I", len(png))
        body += png
    return bytes(body)


def video_frame_payloads(data: bytes) -> tuple[int, list[bytes]]:
    """Parse the container WITHOUT decoding frames → (fps, [png bytes])."""
    if data[:4] != _VID_MAGIC:
        raise ValueError("not a VID0 container")
    fps, k = struct.unpack_from("<HH", data, 4)
    pos = 8
    out = []
    for _ in range(k):
        (length,) = struct.unpack_from("<I", data, pos)
        out.append(data[pos + 4 : pos + 4 + length])
        pos += 4 + length
    return fps, out


def decode_video(data: bytes) -> tuple[int, list[np.ndarray]]:
    fps, payloads = video_frame_payloads(data)
    return fps, [decode_png(p) for p in payloads]


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (pure numpy, deterministic): source pixel of
    output (y, x) is (floor(y·H/out_h), floor(x·W/out_w)) — the classic
    integer-map convention, reproducible anywhere without an image library."""
    h, w = img.shape[0], img.shape[1]
    ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
    xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return img[ys][:, xs]


def encode_png_up(img: np.ndarray) -> bytes:
    """Encode with the Up (type 2) row filter everywhere — pixel-identical
    to :func:`encode_png`'s output after decode, but a byte-different
    payload (different filter bytes AND different deflate stream).  Used to
    plant content-duplicate / payload-distinct images."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        h, w, channels, color_type = img.shape[0], img.shape[1], 1, 0
    elif img.ndim == 3 and img.shape[2] == 3:
        h, w, channels, color_type = img.shape[0], img.shape[1], 3, 2
    else:
        raise ValueError(f"expected (H,W) or (H,W,3) uint8, got {img.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    flat = img.reshape(h, w * channels).astype(np.int64)
    deltas = flat.copy()
    deltas[1:] = (flat[1:] - flat[:-1]) & 0xFF
    raw = np.zeros((h, w * channels + 1), dtype=np.uint8)
    raw[:, 0] = 2  # Up filter
    raw[:, 1:] = deltas.astype(np.uint8)
    idat = zlib.compress(raw.tobytes(), 9)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def add_png_text_chunk(png: bytes, key: bytes, text: bytes) -> bytes:
    """Splice an ancillary tEXt chunk before IEND: decoded pixels are
    untouched, payload bytes differ."""
    iend = _chunk(b"IEND", b"")
    if not png.endswith(iend):
        raise ValueError("expected a PNG ending in IEND")
    return png[: -len(iend)] + _chunk(b"tEXt", key + b"\x00" + text) + iend


def audio_sign_fingerprint(samples: np.ndarray, blocks: int = 32) -> str:
    """Gain-invariant acoustic fingerprint: the sign pattern of consecutive
    block-energy differences (the core idea of Haitsma-Kalker 2002 audio
    fingerprinting, reduced to one energy band).  Exact linear gain scales
    every block energy by the same factor, so every comparison — and the
    fingerprint — is unchanged; byte-level hashing of the payload is not.
    Returns ``"<n_blocks>:<hex bits>"``; clips shorter than ``blocks``
    samples fingerprint over ``len(samples)`` single-sample blocks."""
    s = np.asarray(samples, dtype=np.float64).reshape(-1)
    blocks = min(blocks, len(s)) or 1
    edges = np.linspace(0, len(s), blocks + 1, dtype=np.int64)
    sq = np.concatenate([[0.0], np.cumsum(s * s)])
    counts = np.diff(edges)
    energy = np.diff(sq[edges]) / np.maximum(counts, 1)
    bits = (energy[1:] > energy[:-1]).astype(np.uint8)
    return f"{blocks}:{np.packbits(bits).tobytes().hex()}"
