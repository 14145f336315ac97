"""Wave-22 tests: tile-texture quantizer and energy-VAD framing against
scalar references (pure-Python loops), codec round-trip independence, and
demographic parity on planted-rate corpora vs the DuckDB oracle."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.functions.media_codecs import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)
from commerce_logs_pipeline_ray.pipelines.queries import (
    _TILE,
    _VAD_FRAME,
    _VAD_THRESH,
    ORACLE_ARTIFACT_DIR,
    REGISTRY,
    _tile_bucket_counts,
    _vad_stats,
)
from commerce_logs_pipeline_ray.sources.loglines_file import corpus_dir
from tools.check_queries import compare


def _scalar_vad(samples) -> tuple[int, int, int, int]:
    mono = samples if samples.ndim == 1 else samples[:, 0]
    nf = len(mono) // _VAD_FRAME
    n_active = longest = run = 0
    esum = 0
    for f in range(nf):
        fr = mono[f * _VAD_FRAME : (f + 1) * _VAD_FRAME].astype(np.int64)
        e = int((fr * fr).sum())
        esum += e
        if e > _VAD_THRESH:
            n_active += 1
            run += 1
            longest = max(longest, run)
        else:
            run = 0
    return nf, n_active, longest, esum


@pytest.mark.parametrize("seed", range(6))
def test_vad_stats_matches_scalar(seed):
    rng = np.random.default_rng(seed)
    segs = []
    for k in range(5):
        ln = int(rng.integers(300, 1500))
        amp = 30 if (seed + k) % 2 else 7000
        segs.append(rng.integers(-amp, amp, size=ln))
    x = np.clip(np.concatenate(segs), -32768, 32767).astype(np.int16)
    assert _vad_stats(x) == _scalar_vad(x)


def test_vad_stats_edge_cases():
    # all-silent, all-active, shorter than one frame
    assert _vad_stats(np.zeros(3 * _VAD_FRAME, np.int16)) == (3, 0, 0, 0)
    loud = np.full(2 * _VAD_FRAME, 20000, np.int16)
    nf, na, lr, _ = _vad_stats(loud)
    assert (nf, na, lr) == (2, 2, 2)
    assert _vad_stats(np.zeros(10, np.int16)) == (0, 0, 0, 0)


def _scalar_tiles(img) -> tuple[int, int, int, int, int]:
    h, w = img.shape[0] // _TILE * _TILE, img.shape[1] // _TILE * _TILE
    flat = low = mid = high = vs = 0
    for r in range(0, h, _TILE):
        for c in range(0, w, _TILE):
            ys = []
            for i in range(_TILE):
                for j in range(_TILE):
                    px = img[r + i, c + j]
                    ys.append((299 * int(px[0]) + 587 * int(px[1]) + 114 * int(px[2])) // 1000)
            n = len(ys)
            s, ss = sum(ys), sum(v * v for v in ys)
            vq = (n * ss - s * s) // (n * n)
            vs += vq
            if vq == 0:
                flat += 1
            elif vq <= 100:
                low += 1
            elif vq <= 1000:
                mid += 1
            else:
                high += 1
    return flat, low, mid, high, vs


@pytest.mark.parametrize("seed", [2, 9])
def test_tile_buckets_match_scalar(seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(21, 27, 3)).astype(np.uint8)
    img[:8, :8] = [10, 20, 30]
    assert _tile_bucket_counts(img) == _scalar_tiles(img)


def test_codec_roundtrips_preserve_stats():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(17, 19, 3)).astype(np.uint8)
    assert _tile_bucket_counts(decode_png(encode_png(img))) == _tile_bucket_counts(img)
    x = rng.integers(-9000, 9000, size=2000).astype(np.int16)
    _, back = decode_wav(encode_wav(x, 16000))
    assert _vad_stats(back) == _vad_stats(x)


def test_demographic_parity_planted(ray_session, tmp_path_factory):
    """Group 0 converts never, group 1 always → the 80% rule must flag."""
    d = tmp_path_factory.mktemp("w22dp")
    n = 600
    uid = np.arange(n, dtype=np.int64)
    types = np.where(uid % 3 == 1, "purchase", "view").astype(object)
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(
            np.full(n, 1_700_000_000_000_000, np.int64)).cast(pa.timestamp("us")),
        "user_id": pa.array(uid),
        "event_type": pa.array(types),
        "value": pa.array(np.ones(n)),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(t, str(d / "events.parquet"))
    got = REGISTRY["demographic_parity"].fn(str(d))
    assert got["di_flag"].tolist() == [1, 1, 1]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    sql = REGISTRY["demographic_parity"].sql.replace(ORACLE_ARTIFACT_DIR, corpus_dir(str(d)))
    want = con.execute(sql).df()
    assert not compare("demographic_parity", got, want)
