"""Randomized oracle tests, part 27: wave-35 skip-gram pair generation on
random corpora with planted edge cases — single-word docs (no pairs),
two-word docs (window clipped at the boundary), a repeated bigram run whose
pair count is known in closed form — Ray vs DuckDB on the same corpus."""

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


def _con_for(d, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    return con


def _documents(seed: int, n: int = 200) -> pa.Table:
    rng = np.random.default_rng(seed)
    texts = []
    for idx in range(n):
        k = int(rng.integers(1, 24))
        t = " ".join(rng.choice(WORDS, size=k))
        if idx % 19 == 0:
            t = "solo"
        if idx % 23 == 0:
            t = "two words"
        texts.append(t)
    return pa.table({
        "doc_id": pa.array(rng.permutation(np.arange(n)).astype(np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["s0"] * n),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


@pytest.mark.parametrize("seed", [157, 229])
def test_random_skipgram(seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w35s{seed}")
    pq.write_table(_documents(seed), str(d / "documents.parquet"))
    spec = REGISTRY["skipgram_pairs"]
    got = spec.fn(str(d))
    con = _con_for(d, ["documents"])
    sql = spec.sql.replace(ORACLE_ARTIFACT_DIR, corpus_dir(str(d)))
    want = con.execute(sql).df()
    assert not compare("skipgram_pairs", got, want)


def test_skipgram_closed_form(ray_session, tmp_path_factory):
    """'a b a b a b a b' (8 tokens): pair (a,b) appears at distance 1
    (7 adjacencies) plus zero at distance 2 (distance-2 pairs are same-word);
    with both directions counted, n(a,b) = n(b,a) = 7, n(a,a) = n(b,b) = 6."""
    d = tmp_path_factory.mktemp("w35c")
    t = pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["a b a b a b a b"]),
        "lang": pa.array(["en"]),
        "source": pa.array(["s0"]),
        "n_chars": pa.array([15], pa.int64()),
    })
    pq.write_table(t, str(d / "documents.parquet"))
    out = REGISTRY["skipgram_pairs"].fn(str(d)).set_index(["center", "context"])
    assert int(out.loc[("a", "b"), "n"]) == 7
    assert int(out.loc[("b", "a"), "n"]) == 7
    assert int(out.loc[("a", "a"), "n"]) == 6
    assert int(out.loc[("b", "b"), "n"]) == 6
