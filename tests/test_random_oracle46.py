"""Randomized oracle tests, part 46: wave-54 queries — degree assortativity
(a star graph must be strongly disassortative, r < 0) and the Laspeyres
index (a planted uniform price doubling must read ~2.0)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import ORACLE_ARTIFACT_DIR, REGISTRY
from commerce_logs_pipeline_ray.sources.loglines_file import corpus_dir
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


def _lineitem(orders: np.ndarray, parts: np.ndarray, price: np.ndarray,
              qty: np.ndarray, dates: np.ndarray, path: str) -> None:
    n = len(orders)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(orders.astype(np.int64)),
        "l_partkey": pa.array(parts.astype(np.int64)),
        "l_suppkey": pa.array(np.ones(n, np.int64)),
        "l_linenumber": pa.array(np.arange(n, dtype=np.int32)),
        "l_quantity": pa.array(qty.astype(np.float64)),
        "l_extendedprice": pa.array(price),
        "l_discount": pa.array(np.zeros(n)),
        "l_tax": pa.array(np.zeros(n)),
        "l_returnflag": pa.array(["N"] * n),
        "l_linestatus": pa.array(["O"] * n),
        "l_shipdate": pa.array(dates.astype("datetime64[us]")),
    }), path)


def test_star_graph_disassortative(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("w54star"))
    # orders pair a hub part (1) with each leaf part 2..40 → star graph
    orders = np.repeat(np.arange(1, 40), 2)
    parts = np.empty(len(orders), np.int64)
    parts[0::2] = 1
    parts[1::2] = np.arange(2, 41)
    dates = np.full(len(orders), np.datetime64("1996-06-01"))
    _lineitem(orders, parts, np.ones(len(orders)), np.ones(len(orders)),
              dates, f"{d}/lineitem.parquet")
    pq.write_table(pa.table({
        "p_partkey": pa.array(np.arange(1, 41, dtype=np.int64)),
        "p_name": pa.array(["p"] * 40), "p_brand": pa.array(["Brand#1"] * 40),
        "p_type": pa.array(["STANDARD"] * 40),
        "p_size": pa.array(np.ones(40, np.int32)),
        "p_retailprice": pa.array(np.ones(40)),
    }), f"{d}/part.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{d}/lineitem.parquet')")
    got = _run("degree_assortativity", d, con)
    assert got.iloc[0]["r_ppm"] < -500_000  # star graphs are disassortative


def test_price_doubling_index(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("w54px"))
    rng = np.random.default_rng(31)
    n_items = 30
    units = np.round(rng.integers(100, 5000, n_items) / 100.0, 2)
    qtys = rng.integers(1, 9, n_items).astype(float)
    rows = []
    for year, mult in [(1996, 1.0), (1997, 2.0)]:
        for it in range(1, n_items + 1):
            qty = qtys[it - 1]
            unit = units[it - 1]
            rows.append((it + year * 100, it, round(unit * mult * qty, 2), qty,
                         np.datetime64(f"{year}-07-01")))
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
    got = _run("price_index_laspeyres", d, con)
    v = got.iloc[0]["laspeyres_ppm"]
    assert 1_990_000 <= v <= 2_010_000  # doubling reads ~2.0
