"""Randomized oracle tests, part 20: wave-28 Rocchio pseudo-relevance
feedback on random corpora with planted edge cases — a dominant topic
cluster the feedback loop must latch onto (expansion terms come from the
cluster's rare-but-concentrated vocabulary), empty texts, and seed-term tie
runs — Ray vs DuckDB on the same corpus."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import ORACLE_ARTIFACT_DIR, REGISTRY
from commerce_logs_pipeline_ray.sources.loglines_file import corpus_dir
from tools.check_queries import compare

WORDS = ["spark", "query", "vector", "hash", "join", "table", "scan", "merge",
         "lorem", "ipsum"]


def _con_for(d, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    return con


def _documents(seed: int, n: int = 180) -> pa.Table:
    rng = np.random.default_rng(seed)
    texts = []
    for idx in range(n):
        k = int(rng.integers(2, 22))
        t = " ".join(rng.choice(WORDS, size=k))
        if idx % 6 == 0:
            # topic cluster: heavy in the global top words AND carrying the
            # rare cluster vocabulary the expansion should pick up
            t = ("spark query spark query spark query "
                 "neutrino tachyon neutrino " + t)
        if idx % 23 == 0:
            t = ""
        texts.append(t)
    return pa.table({
        "doc_id": pa.array(rng.permutation(np.arange(n)).astype(np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["s0"] * n),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


@pytest.mark.parametrize("seed", [97, 163])
def test_random_rocchio(seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w28r{seed}")
    pq.write_table(_documents(seed), str(d / "documents.parquet"))
    spec = REGISTRY["rocchio_expansion"]
    got = spec.fn(str(d))
    con = _con_for(d, ["documents"])
    sql = spec.sql.replace(ORACLE_ARTIFACT_DIR, corpus_dir(str(d)))
    want = con.execute(sql).df()
    problems = compare("rocchio_expansion", got, want)
    assert not problems, problems
    # the cluster vocabulary must surface as expansion terms
    assert set([got["e1"].iloc[0], got["e2"].iloc[0]]) & {"neutrino", "tachyon"}
