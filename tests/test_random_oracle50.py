"""Randomized oracle tests, part 50: wave-58 rank correlations — random and
planted corpora (perfect monotone: τ and ρ → 10⁶; anti-monotone: → −10⁶;
heavy ties exercise the midrank and zero-sign paths)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY
from tools.check_queries import compare


def _parts(sizes, prices, d):
    n = len(sizes)
    pq.write_table(pa.table({
        "p_partkey": pa.array(np.arange(1, n + 1, dtype=np.int64)),
        "p_name": pa.array(["p"] * n),
        "p_brand": pa.array(["Brand#1"] * n),
        "p_type": pa.array(["STANDARD"] * n),
        "p_size": pa.array(np.asarray(sizes, np.int32)),
        "p_retailprice": pa.array(np.asarray(prices, np.float64)),
    }), f"{d}/part.parquet")


def _run(name, d, con):
    spec = REGISTRY[name]
    got = spec.fn(d)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = con.execute(spec.sql).df()
    assert not compare(name, got, want), name
    return got


@pytest.mark.parametrize("mode", ["random", "monotone", "anti", "ties"])
def test_rank_correlations(mode, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w58{mode}"))
    rng = np.random.default_rng(353)
    n = 300
    if mode == "monotone":
        sizes = np.arange(1, n + 1)
        prices = np.round(np.arange(1, n + 1) * 1.5, 2)
    elif mode == "anti":
        sizes = np.arange(1, n + 1)
        prices = np.round(np.arange(n, 0, -1) * 1.5, 2)
    elif mode == "ties":
        sizes = rng.integers(1, 4, n)
        prices = np.round(rng.integers(1, 5, n) / 2.0, 2)
    else:
        sizes = rng.integers(1, 51, n)
        prices = np.round(rng.integers(100, 99990, n) / 100.0, 2)
    _parts(sizes, prices, d)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW part AS SELECT * FROM read_parquet('{d}/part.parquet')")
    tau = _run("kendall_tau_price_size", d, con)
    rho = _run("spearman_rho_price_size", d, con)
    if mode == "monotone":
        assert tau.iloc[0]["tau_a_ppm"] == 1_000_000
        assert rho.iloc[0]["rho_ppm"] >= 999_999
    if mode == "anti":
        assert tau.iloc[0]["tau_a_ppm"] == -1_000_000
        assert rho.iloc[0]["rho_ppm"] <= -999_999
