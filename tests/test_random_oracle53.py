"""Randomized oracle tests, part 53: wave-61 queries — EB shrinkage (a
tiny planted nation must move further toward the pooled rate than a big
one) and CUPED (a perfectly-correlated pre/post corpus must reach
rho² ≈ 10⁶; an independent one ≈ 0)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY
from tests.test_random_oracle28 import _con_for, _star
from tools.check_queries import compare


def _run(name, d, con):
    spec = REGISTRY[name]
    got = spec.fn(d)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = con.execute(spec.sql).df()
    assert not compare(name, got, want), name
    return got


def _events_df(uid, ts, et, val, d):
    n = len(uid)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.asarray(ts, "datetime64[us]")),
        "user_id": pa.array(np.asarray(uid, np.int64)),
        "event_type": pa.array(list(et)),
        "value": pa.array(np.asarray(val, np.float64)),
        "props": pa.array(["{}"] * n),
    }), f"{d}/events.parquet")


@pytest.mark.parametrize("seed", [383, 389])
def test_random_eb_cuped(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w61s{seed}"))
    _star(seed, d)
    rng = np.random.default_rng(seed)
    n = 3000
    uid = rng.integers(1, 120, n)
    ts = (np.datetime64("2024-01-01", "us")
          + rng.integers(0, 40 * 86_400_000_000, n).astype("timedelta64[us]"))
    et = rng.choice(["view", "purchase"], n, p=[0.8, 0.2])
    val = np.round(rng.uniform(0, 50, n), 2)
    _events_df(uid, ts, et, val, d)
    con = _con_for(d)
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    eb = _run("eb_shrunk_rates", d, con)
    # shrinkage: every nation's shrunk rate sits between raw and pooled
    pooled = (1_000_000 * eb["k_purchases"].sum()) // eb["n_events"].sum()
    lo = np.minimum(eb["raw_ppm"], pooled) - 1
    hi = np.maximum(eb["raw_ppm"], pooled) + 1
    assert ((eb["shrunk_ppm"] >= lo) & (eb["shrunk_ppm"] <= hi)).all()
    _run("cuped_adjustment", d, con)


def test_cuped_perfect_correlation(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("w61p"))
    rng = np.random.default_rng(397)
    users = np.arange(1, 101)
    uid, ts, et, val = [], [], [], []
    for u in users:
        base = float(rng.integers(1, 60))
        uid += [u, u]
        ts += [np.datetime64("2024-01-02", "us"),
               np.datetime64("2024-01-25", "us")]  # pre (day<15), post
        et += ["view", "view"]
        val += [base, 2 * base]  # post = 2·pre exactly → rho² = 1
    _events_df(np.asarray(uid), np.asarray(ts), et, np.asarray(val), d)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    got = _run("cuped_adjustment", d, con)
    assert got.iloc[0]["rho2_ppm"] >= 999_000
    assert abs(got.iloc[0]["theta_ppm"] - 2_000_000) <= 2_000
