"""Randomized oracle tests, part 55: wave-63 robust estimators — a planted
perfect line recovers its slope exactly; one gross outlier day leaves the
Siegel slope unmoved (the 50%-breakdown property vs OLS)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY
from tests.test_random_oracle54 import _orders
from tools.check_queries import compare


def _run(name, d, con):
    spec = REGISTRY[name]
    got = spec.fn(d)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = con.execute(spec.sql).df()
    assert not compare(name, got, want), name
    return got


@pytest.mark.parametrize("outlier", [False, True])
def test_robust_estimators(outlier, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w63o{int(outlier)}"))
    n = 45
    days = np.arange(n)
    prices = np.round(100.0 + days * 2.5, 2)  # slope = 250 cents/day
    if outlier:
        prices[7] = 99999.99
    _orders(days, prices, d)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{d}/orders.parquet')")
    _run("hodges_lehmann_location", d, con)
    got = _run("siegel_repeated_medians", d, con)
    # 250 cents/day = 250_000_000 ppm; robust to the single outlier
    assert got.iloc[0]["siegel_slope_ppm"] == 250_000_000
