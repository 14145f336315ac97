"""Randomized oracle tests, part 54: wave-62 queries — Mann-Kendall S
(strictly increasing daily revenue → S = n(n−1)/2; constant → S = 0 with
all pairs tied) and the runs test (alternating series → maximal runs)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY
from tools.check_queries import compare


def _orders(days, prices, d):
    n = len(days)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(1, n + 1, dtype=np.int64)),
        "o_custkey": pa.array(np.ones(n, np.int64)),
        "o_orderstatus": pa.array(["F"] * n),
        "o_totalprice": pa.array(np.asarray(prices, np.float64)),
        "o_orderdate": pa.array((np.datetime64("1996-01-01")
                                 + np.asarray(days).astype("timedelta64[D]"))
                                .astype("datetime64[us]")),
        "o_orderpriority": pa.array(["3-MEDIUM"] * n),
    }), f"{d}/orders.parquet")


def _run(name, d, con):
    spec = REGISTRY[name]
    got = spec.fn(d)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = con.execute(spec.sql).df()
    assert not compare(name, got, want), name
    return got


@pytest.mark.parametrize("mode", ["rising", "constant", "alternating", "random"])
def test_trend_runs(mode, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w62{mode}"))
    rng = np.random.default_rng(401)
    n = 60
    days = np.arange(n)
    if mode == "rising":
        prices = np.round(100.0 + days * 3.5, 2)
    elif mode == "constant":
        prices = np.full(n, 42.0)
    elif mode == "alternating":
        prices = np.where(days % 2 == 0, 10.0, 90.0)
    else:
        prices = np.round(rng.uniform(10, 500, n), 2)
    _orders(days, prices, d)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{d}/orders.parquet')")
    mk = _run("mann_kendall_trend", d, con)
    rt = _run("runs_test_audit", d, con)
    if mode == "rising":
        assert mk.iloc[0]["s_stat"] == n * (n - 1) // 2
    if mode == "constant":
        assert mk.iloc[0]["s_stat"] == 0
        assert mk.iloc[0]["n_tie_pairs"] == n * (n - 1) // 2
        assert rt.iloc[0]["n_runs"] == 0  # all values equal the median → dropped
    if mode == "alternating":
        # the lower-median (10.0) half drops as ties → only the 90.0 days
        # remain, all on one side: exactly one run
        assert rt.iloc[0]["n_runs"] == 1
        assert rt.iloc[0]["n_below"] == 0 and rt.iloc[0]["n_above"] == 30
