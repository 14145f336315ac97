"""Randomized oracle tests, part 60: wave-68 queries — control chart (a
planted 10× spike day must register as a 3σ violation; missing calendar
days exercise the row-vs-calendar run distinction) and POT clustering (a
planted 5-consecutive-day burst must form one cluster)."""

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


@pytest.mark.parametrize("seed", [461, 463])
def test_control_chart_pot(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w68s{seed}"))
    rng = np.random.default_rng(seed)
    n = 80
    # non-consecutive calendar days (every other day missing sometimes)
    days = np.sort(rng.choice(np.arange(0, 140), n, replace=False))
    prices = np.round(rng.uniform(80, 120, n), 2)
    prices[11] = 5000.0  # 3σ spike
    # a 5-consecutive-day high burst for the POT cluster
    burst = np.arange(200, 205)
    days = np.concatenate([days, burst])
    prices = np.concatenate([prices, np.full(5, 4000.0)])
    _orders(days, prices, d)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{d}/orders.parquet')")
    cc = _run("control_chart_violations", d, con)
    assert cc.iloc[0]["n_violations"] >= 1
    pot = _run("pot_exceedance_clusters", d, con)
    assert pot.iloc[0]["max_cluster"] >= 5
