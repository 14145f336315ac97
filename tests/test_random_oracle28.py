"""Randomized oracle tests, part 28: wave-36 TPC-H completion queries
(Q7/Q8/Q9/Q11/Q14/Q16/Q18/Q19/Q22 shapes) on a random star schema with
planted edge cases — a nation with NO suppliers (important_parts' empty
path), customers with no recent orders (the Q22 recency anti-join), brands
and sizes spanning the Q19 brackets — Ray vs DuckDB on the same tables."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY
from tools.check_queries import compare

TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]
WAVE36 = [
    "volume_shipping", "market_share", "product_profit", "important_parts",
    "promo_revenue", "supplier_variety", "large_volume_customers",
    "bracketed_revenue", "global_sales_opportunity",
]


def _con_for(d):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
    return con


def _star(seed: int, d: str) -> None:
    rng = np.random.default_rng(seed)
    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    pq.write_table(pa.table({
        "r_regionkey": pa.array(range(5), pa.int64()),
        "r_name": pa.array(regions)}), f"{d}/region.parquet")
    n_nat = 25
    pq.write_table(pa.table({
        "n_nationkey": pa.array(range(n_nat), pa.int64()),
        "n_name": pa.array([f"NATION_{i}" for i in range(n_nat)]),
        "n_regionkey": pa.array([i % 5 for i in range(n_nat)], pa.int64()),
    }), f"{d}/nation.parquet")

    n_cust = 120
    pq.write_table(pa.table({
        "c_custkey": pa.array(range(1, n_cust + 1), pa.int64()),
        "c_name": pa.array([f"Customer#{i}" for i in range(1, n_cust + 1)]),
        "c_nationkey": pa.array(rng.integers(0, n_nat, n_cust), pa.int32()),
        # cents-quantized balances incl. negatives and zeros
        "c_acctbal": pa.array(np.round(rng.integers(-99999, 999999, n_cust) / 100.0, 2)),
        "c_mktsegment": pa.array(rng.choice(["BUILDING", "MACHINERY"], n_cust)),
    }), f"{d}/customer.parquet")

    n_supp = 20
    # planted: NATION_7 gets NO suppliers (important_parts' empty path when
    # seed keeps it out; nations drawn from a pool that excludes 7 half the time)
    pool = [i for i in range(n_nat) if i != 7] if seed % 2 else list(range(n_nat))
    pq.write_table(pa.table({
        "s_suppkey": pa.array(range(1, n_supp + 1), pa.int64()),
        "s_name": pa.array([f"Supplier#{i}" for i in range(1, n_supp + 1)]),
        "s_nationkey": pa.array(rng.choice(pool, n_supp), pa.int32()),
        "s_acctbal": pa.array(np.round(rng.integers(0, 99999, n_supp) / 100.0, 2)),
    }), f"{d}/supplier.parquet")

    n_part = 60
    pq.write_table(pa.table({
        "p_partkey": pa.array(range(1, n_part + 1), pa.int64()),
        "p_name": pa.array([f"part {i}" for i in range(1, n_part + 1)]),
        "p_brand": pa.array([f"Brand#{1 + i % 9}" for i in range(n_part)]),
        "p_type": pa.array(rng.choice(
            ["ECONOMY", "PROMO", "STANDARD", "SMALL"], n_part)),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": pa.array(np.round(rng.integers(100, 99990, n_part) / 100.0, 2)),
    }), f"{d}/part.parquet")

    n_ord = 400
    dates = (np.datetime64("1995-01-01") +
             rng.integers(0, 2400, n_ord).astype("timedelta64[D]"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(1, n_ord + 1), pa.int64()),
        "o_custkey": pa.array(rng.integers(1, n_cust + 1, n_ord), pa.int64()),
        "o_orderstatus": pa.array(rng.choice(["O", "F"], n_ord)),
        "o_totalprice": pa.array(np.round(rng.integers(1000, 9999999, n_ord) / 100.0, 2)),
        "o_orderdate": pa.array(dates.astype("datetime64[us]")),
        "o_orderpriority": pa.array(rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM"], n_ord)),
    }), f"{d}/orders.parquet")

    n_li = 2000
    ship = (np.datetime64("1995-01-01") +
            rng.integers(0, 2400, n_li).astype("timedelta64[D]"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array(rng.integers(1, n_ord + 1, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(1, n_part + 1, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(1, n_supp + 1, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        # integral quantities spanning all three Q19 brackets + Q18 spikes
        "l_quantity": pa.array(rng.integers(1, 51, n_li).astype(np.float64)),
        "l_extendedprice": pa.array(np.round(rng.integers(100, 10499788, n_li) / 100.0, 2)),
        "l_discount": pa.array(np.round(rng.integers(0, 11, n_li) / 100.0, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, n_li) / 100.0, 2)),
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n_li)),
        "l_linestatus": pa.array(rng.choice(["O", "F"], n_li)),
        "l_shipdate": pa.array(ship.astype("datetime64[us]")),
    }), f"{d}/lineitem.parquet")


@pytest.mark.parametrize("seed", [31, 92])
def test_random_tpch_completion(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w36s{seed}"))
    _star(seed, d)
    con = _con_for(d)
    for name in WAVE36:
        spec = REGISTRY[name]
        got = spec.fn(d)
        want = con.execute(spec.sql).df()
        assert not compare(name, got, want), name
