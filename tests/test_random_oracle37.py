"""Randomized oracle tests, part 37: wave-45 queries — linkage quality vs
planted truth on a random part corpus, and the session gap curve on random
events (same-timestamp events exercise the (ts, event_id) tie-break)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import ORACLE_ARTIFACT_DIR, REGISTRY
from commerce_logs_pipeline_ray.sources.loglines_file import corpus_dir
from tests.test_random_oracle31 import _events
from tools.check_queries import compare


def _run(name, d, con):
    spec = REGISTRY[name]
    got = spec.fn(d)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    sql = spec.sql.replace(ORACLE_ARTIFACT_DIR, corpus_dir(d))
    want = con.execute(sql).df()
    assert not compare(name, got, want), name


@pytest.mark.parametrize("seed", [137, 211])
def test_random_linkage_quality(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w45l{seed}"))
    rng = np.random.default_rng(seed)
    n = 300
    keys = np.sort(rng.choice(np.arange(1, 4000), n, replace=False)).astype(np.int64)
    words = ["widget", "bolt", "rod", "gear", "spring", "valve"]
    names = [f"{rng.choice(['cold','hot','big','red'])} {rng.choice(words)}"
             for _ in range(n)]
    pq.write_table(pa.table({
        "p_partkey": pa.array(keys),
        "p_name": pa.array(names),
        "p_brand": pa.array(["Brand#1"] * n),
        "p_type": pa.array(["STANDARD"] * n),
        "p_size": pa.array(np.ones(n, np.int32)),
        "p_retailprice": pa.array(np.ones(n)),
    }), f"{d}/part.parquet")
    _run("linkage_quality_eval", d, duckdb.connect())


@pytest.mark.parametrize("seed", [139, 223])
def test_random_session_gap_curve(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w45s{seed}"))
    _events(seed, d)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    _run("session_gap_curve", d, con)
