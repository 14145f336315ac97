"""Randomized oracle tests, part 56: wave-64 queries — the revenue bridge
(the planted pure-price-doubling corpus from part 46 must put ~all delta
in the price effect) and Benford MAD (a uniform-digit corpus must grade
nonconforming; a Benford-sampled corpus close/acceptable)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY
from tests.test_random_oracle46 import _lineitem
from tools.check_queries import compare


def _run(name, d, con):
    spec = REGISTRY[name]
    got = spec.fn(d)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = con.execute(spec.sql).df()
    assert not compare(name, got, want), name
    return got


def test_pure_price_bridge(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("w64b"))
    rng = np.random.default_rng(409)
    n_items = 25
    units = np.round(rng.integers(100, 5000, n_items) / 100.0, 2)
    qtys = rng.integers(1, 9, n_items).astype(float)
    rows = []
    for year, mult in [(1996, 1.0), (1997, 2.0)]:
        for it in range(1, n_items + 1):
            rows.append((it + year * 100, it,
                         round(units[it - 1] * mult * qtys[it - 1], 2),
                         qtys[it - 1], np.datetime64(f"{year}-07-01")))
    arr = list(zip(*rows))
    _lineitem(np.asarray(arr[0]), np.asarray(arr[1]), np.asarray(arr[2]),
              np.asarray(arr[3]), np.asarray(arr[4]), f"{d}/lineitem.parquet")
    pq.write_table(pa.table({
        "p_partkey": pa.array(np.arange(1, n_items + 1, dtype=np.int64)),
        "p_name": pa.array(["p"] * n_items),
        "p_brand": pa.array(["Brand#1"] * n_items),
        "p_type": pa.array(["STANDARD"] * n_items),
        "p_size": pa.array(np.ones(n_items, np.int32)),
        "p_retailprice": pa.array(np.ones(n_items)),
    }), f"{d}/part.parquet")
    con = duckdb.connect()
    for t in ["lineitem", "part"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
    got = _run("revenue_bridge_decomposition", d, con)
    r = got.iloc[0]
    # same quantities both years → volume effect 0; the bridge reconciles
    assert r["vol_effect_cents"] == 0
    assert (r["vol_effect_cents"] + r["price_effect_cents"]
            + r["quant_residual_cents"]) == r["delta_rev_cents"]
    assert abs(r["quant_residual_cents"]) <= r["delta_rev_cents"] * 0.01 + 100


@pytest.mark.parametrize("mode", ["uniform", "benford"])
def test_benford_mad(mode, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w64m{mode}"))
    rng = np.random.default_rng(419)
    n = 4000
    if mode == "uniform":  # every total starts with digit 5
        prices = np.round(rng.uniform(50.0, 59.99, n), 2)
    else:  # log-uniform magnitudes ≈ Benford
        prices = np.round(10.0 ** rng.uniform(0, 4, n), 2)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(1, n + 1, dtype=np.int64)),
        "o_custkey": pa.array(np.ones(n, np.int64)),
        "o_orderstatus": pa.array(["F"] * n),
        "o_totalprice": pa.array(prices),
        "o_orderdate": pa.array(
            np.full(n, np.datetime64("1996-06-01")).astype("datetime64[us]")),
        "o_orderpriority": pa.array(["3-MEDIUM"] * n),
    }), f"{d}/orders.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{d}/orders.parquet')")
    got = _run("benford_mad_grade", d, con)
    if mode == "uniform":
        assert got.iloc[0]["verdict"] == "nonconforming"
    else:
        assert got.iloc[0]["mad_ppm"] < 15000
