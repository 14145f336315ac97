"""Multimodal plumbing: schema, actor-pool decode, frame fan-out.
Codec calls are stubbed (none available in this container) but the Ray-side
structure is real."""

import numpy as np
import pyarrow as pa
import pytest

from commerce_logs_pipeline_ray.stages.multimodal import (
    MEDIA_SCHEMA,
    FrameSampler,
    ImageDecoder,
    decode_media,
    synth_media_table,
)


def test_synth_media_schema_and_determinism():
    a = synth_media_table(30)
    b = synth_media_table(30)
    assert a.schema.equals(MEDIA_SCHEMA)
    assert a.equals(b)


def test_decoder_stub_deterministic_and_typed():
    t = synth_media_table(24)
    out = ImageDecoder()(t)
    assert out.schema.field("feature").type == pa.list_(pa.float32())
    f1 = out["feature"].to_pylist()
    f2 = ImageDecoder()(t)["feature"].to_pylist()
    assert f1 == f2
    assert all(len(v) == ImageDecoder.FEATURE_DIM for v in f1)


def test_decoder_actor_pool_pipeline(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(synth_media_table(100))
    out = decode_media(ds, concurrency=2, batch_size=32).to_pandas()
    assert len(out) == 100
    assert set(out["media_type"]) == {"image", "audio", "video"}


def test_unavailable_native_codecs_are_marked_unimplemented():
    # PNG/WAV/VID0 decode for real now; the hooks that NEED native libs
    # (JPEG, ffmpeg/H.264) stay clearly marked
    with pytest.raises(NotImplementedError):
        ImageDecoder._load_jpeg_codec()
    with pytest.raises(NotImplementedError):
        FrameSampler._load_ffmpeg()


def test_real_decode_roundtrip():
    """Real path end-to-end: encode → ImageDecoder(use_stub=False) features
    from true pixels; FrameSampler(use_stub=False) yields decodable PNGs."""
    import numpy as np

    from commerce_logs_pipeline_ray.functions.media_codecs import decode_png
    from commerce_logs_pipeline_ray.sources.media import build_media_table

    t = build_media_table(18)
    dec = ImageDecoder(use_stub=False)
    feats = dec(t)
    # only image rows survive; features are real pixel block means in [0,1]
    assert feats.num_rows == sum(1 for x in t["media_type"].to_pylist() if x == "image")
    for row in feats["feature"].to_pylist():
        assert len(row) == ImageDecoder.FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in row)

    frames = FrameSampler(k_frames=2, use_stub=False)(t)
    assert frames.num_rows > 0
    for p in frames["frame_payload"].to_pylist():
        img = decode_png(p)  # genuine PNG frames
        assert img.ndim == 3 and img.dtype == np.uint8


def test_media_probe_matches_ground_truth(ray_session):
    from commerce_logs_pipeline_ray.sources.media import build_media_table
    from commerce_logs_pipeline_ray.stages.multimodal import MediaProbe

    t = build_media_table(24)
    got = MediaProbe()(t.select(["media_id", "payload", "media_type"]))
    for col in ("width", "height", "duration_ms", "px_sum", "sample_sum", "n_frames"):
        assert got[col].to_pylist() == t[col].to_pylist(), col


def test_frame_sampler_fanout():
    t = synth_media_table(30)
    out = FrameSampler(k_frames=4)(t)
    n_videos = sum(1 for x in t["media_type"].to_pylist() if x == "video")
    assert out.num_rows == n_videos * 4
    assert out.schema.field("frame_payload").type == pa.binary()
    assert set(out["frame_index"].to_pylist()) == {0, 1, 2, 3}


def test_image_resizer_roundtrip_and_truth(ray_session):
    """Resize output is a real decodable PNG of the target size, and its
    pixel sum equals the truth computed from the source array."""
    import numpy as np

    from commerce_logs_pipeline_ray.functions.media_codecs import decode_png, resize_nearest
    from commerce_logs_pipeline_ray.sources.media import RESIZE_H, RESIZE_W, build_media_tables
    from commerce_logs_pipeline_ray.stages.multimodal import ImageResizer

    media, _ = build_media_tables(18)
    out = ImageResizer(out_h=RESIZE_H, out_w=RESIZE_W)(
        media.select(["media_id", "payload", "media_type"]))
    truth = {m: s for m, s, t in zip(media["media_id"].to_pylist(),
                                     media["resized_px_sum"].to_pylist(),
                                     media["media_type"].to_pylist()) if t == "image"}
    assert out.num_rows == len(truth)
    for mid, payload, got in zip(out["media_id"].to_pylist(),
                                 out["payload"].to_pylist(),
                                 out["resized_px_sum"].to_pylist()):
        img = decode_png(payload)
        assert img.shape[:2] == (RESIZE_H, RESIZE_W)
        assert int(img.astype(np.int64).sum()) == got == truth[mid]


def test_png_variant_encodings_pixel_identical():
    """Up-filter re-encode and tEXt-chunk splice change the bytes, never
    the pixels; a one-pixel edit changes the pixels."""
    import numpy as np

    from commerce_logs_pipeline_ray.functions.media_codecs import (
        add_png_text_chunk, decode_png, encode_png, encode_png_up)

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(11, 14, 3), dtype=np.uint8)
    base = encode_png(img)
    up = encode_png_up(img)
    txt = add_png_text_chunk(base, b"k", b"v")
    assert len({base, up, txt}) == 3  # all payloads distinct
    assert (decode_png(up) == img).all() and (decode_png(txt) == img).all()


def test_image_content_dedup_groups(ray_session):
    """Decoded-pixel digest groups byte-different re-encodings; the planted
    near-miss (one pixel +1) stays alone."""
    import ray.data as rd

    from commerce_logs_pipeline_ray.sources.media import build_image_dup_table
    from commerce_logs_pipeline_ray.stages.multimodal import PixelDigest

    t = build_image_dup_table(21, seed=7)
    ds = rd.from_arrow(t).repartition(4)
    got = (
        ds.map_batches(PixelDigest, batch_format="pyarrow", batch_size=16,
                       concurrency=2, zero_copy_batch=True)
        .to_pandas()
    )
    got["rep"] = got.groupby("digest")["media_id"].transform("min")
    truth = t.to_pandas().set_index("media_id")["dup_of"]
    for _, r in got.iterrows():
        assert r["rep"] == truth[r["media_id"]], r["media_id"]


def test_audio_fingerprint_gain_invariance():
    """Exact linear gain never changes the fingerprint; different noise of
    the same length does."""
    import numpy as np

    from commerce_logs_pipeline_ray.functions.media_codecs import audio_sign_fingerprint

    rng = np.random.default_rng(3)
    t = np.arange(2000, dtype=np.float64)
    base = (4000 * np.sin(2 * np.pi * 200 * t / 8000)
            + rng.integers(-1500, 1500, 2000)).astype(np.int16)
    other = (4000 * np.sin(2 * np.pi * 200 * t / 8000)
             + rng.integers(-1500, 1500, 2000)).astype(np.int16)
    fp = audio_sign_fingerprint(base)
    assert audio_sign_fingerprint((base.astype(np.int32) * 4).astype(np.int16)) == fp
    assert audio_sign_fingerprint((base.astype(np.int32) * 2).astype(np.int16)) == fp
    assert audio_sign_fingerprint(other) != fp
    # degenerate short clip doesn't crash
    assert audio_sign_fingerprint(np.array([5, -3], dtype=np.int16)).startswith("2:")


def test_audio_fingerprint_dedup_groups(ray_session):
    import ray.data as rd

    from commerce_logs_pipeline_ray.sources.media import build_audio_dup_table
    from commerce_logs_pipeline_ray.stages.multimodal import AudioFingerprint

    t = build_audio_dup_table(24, seed=11)
    got = (
        rd.from_arrow(t).repartition(4)
        .map_batches(AudioFingerprint, batch_format="pyarrow", batch_size=16,
                     concurrency=2, zero_copy_batch=True)
        .to_pandas()
    )
    got["rep"] = got.groupby("digest")["media_id"].transform("min")
    truth = t.to_pandas().set_index("media_id")["dup_of"]
    for _, r in got.iterrows():
        assert r["rep"] == truth[r["media_id"]], r["media_id"]


def test_video_content_dedup_groups(ray_session):
    import ray.data as rd

    from commerce_logs_pipeline_ray.sources.media import build_video_dup_table
    from commerce_logs_pipeline_ray.stages.multimodal import VideoDigest

    t = build_video_dup_table(15, seed=5)
    got = (
        rd.from_arrow(t).repartition(3)
        .map_batches(VideoDigest, batch_format="pyarrow", batch_size=8,
                     concurrency=2, zero_copy_batch=True)
        .to_pandas()
    )
    got["rep"] = got.groupby("digest")["media_id"].transform("min")
    truth = t.to_pandas().set_index("media_id")["dup_of"]
    for _, r in got.iterrows():
        assert r["rep"] == truth[r["media_id"]], r["media_id"]
