"""Dependency-free PNG/WAV/VID0 codecs (functions/media_codecs.py):
roundtrips, all five PNG scanline filters, malformed-input errors."""

import struct
import zlib

import numpy as np
import pytest

from commerce_logs_pipeline_ray.functions.media_codecs import (
    decode_png,
    decode_video,
    decode_wav,
    encode_png,
    encode_video,
    encode_wav,
    video_frame_payloads,
)


@pytest.mark.parametrize("shape", [(7, 5), (32, 48), (16, 16, 3), (1, 1), (3, 200, 3)])
def test_png_roundtrip(shape):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_decodes_all_five_filters():
    """Externally-produced PNGs use Sub/Up/Average/Paeth filters the encoder
    never emits — build a stream cycling all five and decode it."""
    rng = np.random.default_rng(2)
    h, w, ch = 10, 4, 3
    img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int64)
    raw = bytearray()
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        f = y % 5
        line = flat[y]
        enc = line.copy()
        if f == 1:
            enc[ch:] = (line[ch:] - line[:-ch]) & 0xFF
        elif f == 2:
            enc = (line - prev) & 0xFF
        elif f == 3:
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                enc[i] = (line[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:
            for i in range(stride):
                a = int(line[i - ch]) if i >= ch else 0
                b, c = int(prev[i]), (int(prev[i - ch]) if i >= ch else 0)
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                enc[i] = (line[i] - pr) & 0xFF
        raw.append(f)
        raw += bytes(enc.astype(np.uint8))
        prev = line

    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), img)


@pytest.mark.parametrize("shape", [(1000,), (500, 2)])
def test_wav_roundtrip(shape):
    rng = np.random.default_rng(3)
    s = rng.integers(-32768, 32767, size=shape).astype(np.int16)
    rate, dec = decode_wav(encode_wav(s, 16000))
    assert rate == 16000
    assert np.array_equal(dec, s)


def test_video_container_roundtrip():
    rng = np.random.default_rng(4)
    frames = [rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8) for _ in range(3)]
    blob = encode_video(frames, fps=10)
    fps, payloads = video_frame_payloads(blob)
    assert fps == 10 and len(payloads) == 3
    fps2, decoded = decode_video(blob)
    assert fps2 == 10
    for a, b in zip(decoded, frames):
        assert np.array_equal(a, b)


def test_malformed_inputs_raise():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxJUNK")
    with pytest.raises(ValueError):
        video_frame_payloads(b"XXXX\x00\x00\x00\x00")
    with pytest.raises(ValueError):
        encode_png(np.zeros((2, 2, 4), dtype=np.uint8))  # RGBA unsupported
