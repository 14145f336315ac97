"""Randomized oracle tests, part 58: wave-66 two-series statistics on the
random star schema, plus identities: perfectly identical series → lag-0
ccf = 10⁶ and the min-variance weight collapses (den = 0 path)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY
from tests.test_random_oracle28 import _con_for, _star
from tools.check_queries import compare

W66 = ["min_variance_weights", "cross_correlation_segments"]


@pytest.mark.parametrize("seed", [433, 439])
def test_random_portfolio_ccf(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w66s{seed}"))
    _star(seed, d)
    con = _con_for(d)
    for name in W66:
        spec = REGISTRY[name]
        got = spec.fn(d)
        want = con.execute(spec.sql).df()
        assert not compare(name, got, want), name


def test_identical_series_lag0(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("w66i"))
    rng = np.random.default_rng(443)
    n_days = 40
    rows = []
    oid = 0
    for day in range(n_days):
        price = round(float(rng.integers(100, 9000)) / 10.0, 2)
        for cust, _seg in [(1, "BUILDING"), (2, "MACHINERY")]:
            oid += 1
            rows.append((oid, cust, price, day))
    ok, ck, tp, dy = zip(*rows)
    n = len(ok)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.asarray(ok, np.int64)),
        "o_custkey": pa.array(np.asarray(ck, np.int64)),
        "o_orderstatus": pa.array(["F"] * n),
        "o_totalprice": pa.array(np.asarray(tp, np.float64)),
        "o_orderdate": pa.array((np.datetime64("1996-01-01")
                                 + np.asarray(dy).astype("timedelta64[D]"))
                                .astype("datetime64[us]")),
        "o_orderpriority": pa.array(["3-MEDIUM"] * n),
    }), f"{d}/orders.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_name": pa.array(["a", "b"]),
        "c_nationkey": pa.array(np.zeros(2, np.int32)),
        "c_acctbal": pa.array(np.zeros(2)),
        "c_mktsegment": pa.array(["BUILDING", "MACHINERY"]),
    }), f"{d}/customer.parquet")
    con = duckdb.connect()
    for t in ["orders", "customer"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
    spec = REGISTRY["cross_correlation_segments"]
    got = spec.fn(d)
    want = con.execute(spec.sql).df()
    assert not compare("cross_correlation_segments", got, want)
    lag0 = got[got["lag"] == 0].iloc[0]
    assert lag0["ccf_ppm"] >= 999_999  # identical series → rho = 1
    # identical series → V_A + V_B − 2C = 0 → empty min-variance result
    mv = REGISTRY["min_variance_weights"].fn(d)
    mv_sql = con.execute(REGISTRY["min_variance_weights"].sql).df()
    assert not compare("min_variance_weights", mv, mv_sql)
    assert len(mv) == 0
