"""Randomized oracle tests, part 32: wave-40 queries — Jaro-Winkler blocked
linkage (two independent JW implementations must agree bitwise through the
ROUND(·,6) ≥ 0.88 gate) and Holt double-exponential smoothing (planted
negative daily sums exercise the truncating-division parity)."""

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


@pytest.mark.parametrize("seed", [73, 157])
def test_random_jaro_winkler_linkage(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w40jw{seed}"))
    rng = np.random.default_rng(seed)
    # random part table → the artifact generator derives the name corpus
    n = 400
    keys = np.sort(rng.choice(np.arange(1, 5000), n, replace=False)).astype(np.int64)
    pq.write_table(pa.table({
        "p_partkey": pa.array(keys),
        "p_name": pa.array([f"part {k}" for k in keys]),
        "p_brand": pa.array(["Brand#1"] * n),
        "p_type": pa.array(["STANDARD"] * n),
        "p_size": pa.array(np.ones(n, np.int32)),
        "p_retailprice": pa.array(np.ones(n)),
    }), f"{d}/part.parquet")
    con = duckdb.connect()
    _run("jaro_winkler_linkage", d, con)


@pytest.mark.parametrize("seed", [83, 163])
def test_random_holt(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w40h{seed}"))
    _events(seed, d)  # includes the deeply-negative early 'error' days
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    _run("holt_linear_forecast", d, con)
