"""Randomized oracle tests, part 16: the wave-24 family (quantized Lloyd
assignment, Cohen's kappa) on random inputs with planted edge cases —
duplicate vectors equidistant to two centers (smaller-center tie-break), a
vector identical to a center (distance 0), perfect/anti agreement corpora
for kappa — Ray vs DuckDB on the same corpus."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import ORACLE_ARTIFACT_DIR, REGISTRY
from commerce_logs_pipeline_ray.sources.loglines_file import corpus_dir
from tools.check_queries import compare

WORDS = ["spark", "query", "vector", "hash", "join", "table", "scan", "merge"]


def _run(name: str, d: str, con) -> None:
    spec = REGISTRY[name]
    got = spec.fn(d)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    sql = spec.sql.replace(ORACLE_ARTIFACT_DIR, corpus_dir(d))
    want = con.execute(sql).df()
    problems = compare(name, got, want)
    assert not problems, problems


def _con_for(d, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    return con


def _embeddings(seed: int, n: int = 260, d: int = 16) -> pa.Table:
    rng = np.random.default_rng(seed)
    mat = rng.normal(0, 0.4, size=(n, d)).astype(np.float32)
    mat[40] = mat[2]   # identical to a center (vec_ids 0..7 are centers)
    mat[41] = mat[40]  # duplicate pair assigns identically
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([r for r in mat.tolist()], type=pa.list_(pa.float32())),
        "label": pa.array(np.zeros(n, np.int32)),
    })


def _documents(seed: int, n: int = 200) -> pa.Table:
    rng = np.random.default_rng(seed)
    texts = []
    for _ in range(n):
        k = int(rng.integers(1, 45))
        texts.append(" ".join(rng.choice(WORDS, size=k)))
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["s0"] * n),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


@pytest.mark.parametrize("seed", [71, 113])
def test_random_lloyd(seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w24l{seed}")
    pq.write_table(_embeddings(seed), str(d / "embeddings.parquet"))
    _run("lloyd_step_quantized", str(d), _con_for(d, ["embeddings"]))
    got = REGISTRY["lloyd_step_quantized"].fn(str(d))
    assert int(got["n_assigned"].sum()) == 260  # every vector assigned once


@pytest.mark.parametrize("seed", [73, 127])
def test_random_kappa(seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w24k{seed}")
    pq.write_table(_documents(seed), str(d / "documents.parquet"))
    _run("cohens_kappa", str(d), _con_for(d, ["documents"]))


def test_kappa_perfect_agreement(ray_session, tmp_path_factory):
    """Corpus built so both rules agree on every doc → kappa = 1."""
    d = tmp_path_factory.mktemp("w24kp")
    # 30 long docs (≥20 words AND ≥120 chars) + 30 short (fail both)
    long_t = " ".join(["wordword"] * 25)   # 25 words, 224 chars
    short_t = "tiny text"
    texts = [long_t] * 30 + [short_t] * 30
    t = pa.table({
        "doc_id": pa.array(np.arange(60, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 60),
        "source": pa.array(["s0"] * 60),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, str(d / "documents.parquet"))
    out = REGISTRY["cohens_kappa"].fn(str(d))
    assert float(out["kappa"].iloc[0]) == 1.0
    assert int(out["yn"].iloc[0]) == 0 and int(out["ny"].iloc[0]) == 0
