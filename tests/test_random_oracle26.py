"""Randomized oracle tests, part 26: the wave-34 family (LRU stack-distance
equivalence, Hill tail index) on random inputs with planted edge cases — a
scan-loop customer (cyclic access over C+1 items: LRU's pathological 0% hit
pattern), a hot-loop customer over C-1 items (100% hits after warmup), ties
in the access order, a Pareto-ish heavy tail and an all-equal top (Hill sum
0, alpha NaN) — Ray vs DuckDB on the same corpus."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import ORACLE_ARTIFACT_DIR, REGISTRY
from commerce_logs_pipeline_ray.sources.loglines_file import corpus_dir
from tools.check_queries import compare


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


def _orders_lineitem(seed: int, n_orders: int = 500):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2020-01-01").value // 1000
    o = pa.table({
        "o_orderkey": pa.array(np.arange(1, n_orders + 1, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(1, 60, size=n_orders).astype(np.int64)),
        "o_orderstatus": pa.array(["O"] * n_orders),
        "o_totalprice": pa.array(np.round(rng.uniform(1000, 9000, size=n_orders), 2)),
        "o_orderdate": pa.array(
            base + rng.integers(0, 700, size=n_orders) * 86_400_000_000
        ).cast(pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-P"] * n_orders),
    })
    rows_ok, rows_pk = [], []
    for ok in range(1, n_orders + 1):
        for _ in range(int(rng.integers(1, 5))):
            rows_ok.append(ok)
            rows_pk.append(int(rng.integers(1, 50)))
    # scan-loop customer 9001: orders cycling over 5 parts with capacity 4
    cust = o["o_custkey"].to_numpy(zero_copy_only=False).copy()
    # give the first 25 orders to 9001 in strict date order, cycling parts
    dates = o["o_orderdate"].to_numpy(zero_copy_only=False).copy()
    for i in range(25):
        cust[i] = 9001
        dates[i] = np.datetime64(int(base + i * 86_400_000_000), "us")
        rows_ok.append(i + 1)
        rows_pk.append(900 + (i % 5))
    o = o.set_column(1, "o_custkey", pa.array(cust))
    o = o.set_column(4, "o_orderdate", pa.array(dates))
    m = len(rows_ok)
    li = pa.table({
        "l_orderkey": pa.array(np.array(rows_ok, np.int64)),
        "l_partkey": pa.array(np.array(rows_pk, np.int64)),
        "l_suppkey": pa.array(np.ones(m, np.int64)),
        "l_linenumber": pa.array(np.ones(m, np.int32)),  # deliberate tie storm
        "l_quantity": pa.array(np.ones(m)),
        "l_extendedprice": pa.array(np.full(m, 100.0)),
        "l_discount": pa.array(np.zeros(m)),
        "l_tax": pa.array(np.zeros(m)),
        "l_returnflag": pa.array(["N"] * m),
        "l_linestatus": pa.array(["O"] * m),
        "l_shipdate": pa.array(
            np.full(m, 1_700_000_000_000_000, np.int64)).cast(pa.timestamp("us")),
    })
    return o, li


def _events(seed: int, n: int = 3000, flat_top: bool = False) -> pa.Table:
    rng = np.random.default_rng(seed)
    # Pareto-ish heavy tail for the Hill estimator
    vals = np.round(np.minimum((1.0 / rng.uniform(0.001, 1.0, size=n)) * 5.0, 5e6), 2)
    if flat_top:
        # all-equal top ABOVE the capped tail: every log term 0 → alpha NaN
        vals[:200] = 7_000_000.0
    types = np.asarray(["view", "purchase"], dtype=object)[rng.integers(0, 2, size=n)]
    types[:250] = "purchase"
    ts = 1_700_000_000_000_000 + rng.integers(0, 30 * 86_400_000_000, size=n)
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "user_id": pa.array(rng.integers(1, 70, size=n).astype(np.int64)),
        "event_type": pa.array(types),
        "value": pa.array(vals),
        "props": pa.array(["{}"] * n),
    })


@pytest.mark.parametrize("seed", [149, 223])
def test_random_lru(seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w34l{seed}")
    o, li = _orders_lineitem(seed)
    pq.write_table(o, str(d / "orders.parquet"))
    pq.write_table(li, str(d / "lineitem.parquet"))
    _run("lru_cache_audit", str(d), _con_for(d, ["orders", "lineitem"]))


@pytest.mark.parametrize("seed", [151, 227])
def test_random_hill(seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w34h{seed}")
    pq.write_table(_events(seed), str(d / "events.parquet"))
    _run("hill_tail_index", str(d), _con_for(d, ["events"]))


def test_hill_flat_top_nan(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("w34hf")
    pq.write_table(_events(13, flat_top=True), str(d / "events.parquet"))
    _run("hill_tail_index", str(d), _con_for(d, ["events"]))
    got = REGISTRY["hill_tail_index"].fn(str(d))
    assert int(got["sum_unats"].iloc[0]) == 0
    assert np.isnan(float(got["alpha"].iloc[0]))
