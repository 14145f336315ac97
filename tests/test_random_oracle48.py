"""Randomized oracle tests, part 48: wave-56 queries — Simpson's paradox
detector with a PLANTED textbook reversal (promo wins inside every year but
loses pooled, via year-size confounding), and the inspection-paradox audit
(constant gaps must read exactly 10⁶)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY
from tools.check_queries import compare


def _run(name, d, con):
    spec = REGISTRY[name]
    got = spec.fn(d)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = con.execute(spec.sql).df()
    assert not compare(name, got, want), name
    return got


def _write_lineitem(rows, path):
    n = len(rows)
    ok, pk, rf, dt = zip(*rows)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(np.asarray(ok, np.int64)),
        "l_partkey": pa.array(np.asarray(pk, np.int64)),
        "l_suppkey": pa.array(np.ones(n, np.int64)),
        "l_linenumber": pa.array(np.arange(n, dtype=np.int32)),
        "l_quantity": pa.array(np.ones(n)),
        "l_extendedprice": pa.array(np.ones(n)),
        "l_discount": pa.array(np.zeros(n)),
        "l_tax": pa.array(np.zeros(n)),
        "l_returnflag": pa.array(list(rf)),
        "l_linestatus": pa.array(["O"] * n),
        "l_shipdate": pa.array(np.asarray(dt, "datetime64[us]")),
    }), path)


def test_planted_simpson_reversal(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("w56s"))
    # classic kidney-stone table: promo has the LOWER return rate in both
    # years, but promo volume concentrates in the high-return year → pooled
    # sign flips
    rows = []
    oid = 0
    y96, y97 = np.datetime64("1996-06-01"), np.datetime64("1997-06-01")

    def add(n, n_ret, part, date):
        nonlocal oid
        for i in range(n):
            oid += 1
            rows.append((oid, part, "R" if i < n_ret else "N", date))

    add(20, 4, 1, y96)     # promo 1996: 20% returns (light volume, good year)
    add(80, 20, 2, y96)    # other 1996: 25%
    add(80, 48, 1, y97)    # promo 1997: 60% (heavy volume, bad year)
    add(20, 13, 2, y97)    # other 1997: 65%
    # pooled: promo 52/100 = 52% vs other 33/100 = 33% — promo better
    # within BOTH years yet worse pooled (volume confounded with year)
    _write_lineitem(rows, f"{d}/lineitem.parquet")
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_name": pa.array(["a", "b"]),
        "p_brand": pa.array(["Brand#1"] * 2),
        "p_type": pa.array(["PROMO", "STANDARD"]),
        "p_size": pa.array(np.ones(2, np.int32)),
        "p_retailprice": pa.array(np.ones(2)),
    }), f"{d}/part.parquet")
    con = duckdb.connect()
    for t in ["lineitem", "part"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
    got = _run("simpsons_paradox_check", d, con)
    per_year = got[got["stratum"] != "ALL"]
    pooled = got[got["stratum"] == "ALL"].iloc[0]
    # promo better (negative lift) within each year, worse pooled → reversal
    assert (per_year["lift_sign"] == -1).all()
    assert pooled["lift_sign"] == 1
    assert per_year["reversed"].sum() == len(per_year)


def test_constant_gaps_inspection(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("w56i"))
    n = 50
    ts = (np.datetime64("2024-01-01", "us")
          + (np.arange(n) * 3_600_000_000).astype("timedelta64[us]"))
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts),
        "user_id": pa.array(np.ones(n, np.int64)),
        "event_type": pa.array(["view"] * n),
        "value": pa.array(np.ones(n)),
        "props": pa.array(["{}"] * n),
    }), f"{d}/events.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    got = _run("inspection_paradox_audit", d, con)
    assert got.iloc[0]["ratio_ppm"] == 1_000_000  # constant gaps → no bias
