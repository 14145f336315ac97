"""Randomized oracle tests, part 67: wave-75 queries — FD histogram on
random prices (constant corpus → empty result on both engines; bin counts
total n) and the fanout profile on the random star schema."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY
from tests.test_random_oracle28 import _con_for, _star
from tools.check_queries import compare


def _run(name, d, con):
    spec = REGISTRY[name]
    got = spec.fn(d)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = con.execute(spec.sql).df()
    assert not compare(name, got, want), name
    return got


@pytest.mark.parametrize("seed", [557, 563])
def test_random_fd_fanout(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w75s{seed}"))
    _star(seed, d)
    con = _con_for(d)
    got = _run("freedman_diaconis_histogram", d, con)
    n = con.execute("SELECT COUNT(*) FROM orders").fetchone()[0]
    assert got["n_rows"].sum() == n
    _run("fk_fanout_profile", d, con)


def test_constant_prices_empty(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("w75c"))
    n = 50
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(1, n + 1, dtype=np.int64)),
        "o_custkey": pa.array(np.ones(n, np.int64)),
        "o_orderstatus": pa.array(["F"] * n),
        "o_totalprice": pa.array(np.full(n, 42.0)),
        "o_orderdate": pa.array(
            np.full(n, np.datetime64("1996-06-01")).astype("datetime64[us]")),
        "o_orderpriority": pa.array(["3-MEDIUM"] * n),
    }), f"{d}/orders.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{d}/orders.parquet')")
    got = _run("freedman_diaconis_histogram", d, con)
    assert len(got) == 0  # IQR = 0 → width 0 → no bins on both engines
