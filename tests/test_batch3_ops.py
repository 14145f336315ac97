"""Tests for blocklist scan, Hamilton apportionment, audio downsample."""

import numpy as np
import pyarrow as pa


def test_audio_downsample_matches_scalar():
    from commerce_logs_pipeline_ray.functions.media_codecs import encode_wav
    from commerce_logs_pipeline_ray.stages.multimodal import AudioDownsample

    rng = np.random.default_rng(11)
    pcm = rng.integers(-30000, 30000, size=1001).astype(np.int16)  # odd length
    t = pa.table({"media_id": pa.array(["a"]), "payload": pa.array([encode_wav(pcm, 16000)])})
    out = AudioDownsample()(t).to_pylist()[0]
    m = len(pcm) // 2
    down = [(int(pcm[2 * i]) + int(pcm[2 * i + 1])) // 2 for i in range(m)]
    assert out["in_samples"] == 1001
    assert out["out_samples"] == 500
    assert out["out_rate"] == 8000
    assert out["checksum"] == sum(down)
    # floor division on negatives (not truncation): -3 // 2 == -2
    t2 = pa.table(
        {"media_id": pa.array(["b"]),
         "payload": pa.array([encode_wav(np.array([-1, -2], dtype=np.int16), 8000)])}
    )
    assert AudioDownsample()(t2).to_pylist()[0]["checksum"] == -2


def test_apportionment_sums_to_budget(ray_session):
    from commerce_logs_pipeline_ray.pipelines.queries import q_budget_apportionment

    out = q_budget_apportionment("/root/testdata/sf0.001")
    assert int(out["alloc"].sum()) == 1000
    assert (out["extra"].isin((0, 1))).all()
    # alloc is within 1 seat of the exact quota for every source
    total = out["chars"].sum()
    quota = 1000 * out["chars"] / total
    assert ((out["alloc"] - quota).abs() <= 1.0).all()


def test_blocklist_scan_counts(ray_session):
    import ray.data as rd

    from commerce_logs_pipeline_ray.pipelines.queries import BLOCKLIST_PHRASES

    assert BLOCKLIST_PHRASES[0] == "slow"
    # vectorized count == python count on a constructed batch
    txt = "slow query slow window sort slow"
    import pyarrow.compute as pc

    arr = pa.array([txt])
    assert pc.count_substring(arr, "slow")[0].as_py() == txt.count("slow")
    assert pc.count_substring(arr, "window sort")[0].as_py() == 1
