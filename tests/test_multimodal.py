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


def test_real_codec_path_is_marked_unimplemented():
    with pytest.raises(NotImplementedError):
        ImageDecoder(use_stub=False)
    with pytest.raises(NotImplementedError):
        FrameSampler(use_stub=False)


def test_frame_sampler_fanout():
    t = synth_media_table(30)
    out = FrameSampler(k_frames=4)(t)
    n_videos = sum(1 for x in t["media_type"].to_pylist() if x == "video")
    assert out.num_rows == n_videos * 4
    assert out.schema.field("frame_payload").type == pa.binary()
    assert set(out["frame_index"].to_pylist()) == {0, 1, 2, 3}
