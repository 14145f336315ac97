"""Randomized oracle tests, part 66: wave-74 queries — second-digit law on
random prices (including exact powers of ten, the float-log10 edge the
arithmetic digit extraction must survive)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY
from tools.check_queries import compare


@pytest.mark.parametrize("seed", [541, 547])
def test_random_second_digit(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w74s{seed}"))
    rng = np.random.default_rng(seed)
    n = 3000
    prices = np.round(rng.uniform(0.1, 9999, n), 2)
    # plant exact powers of ten in cents: 10, 100, 1000, 100000 cents
    prices[:8] = [0.10, 1.00, 10.00, 1000.00, 0.10, 1.00, 10.00, 1000.00]
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
    spec = REGISTRY["newcomb_second_digit"]
    got = spec.fn(d)
    want = con.execute(spec.sql).df()
    assert not compare("newcomb_second_digit", got, want)
    assert got["n"].sum() == n  # all two-digit-plus cents counted
