"""Randomized oracle tests, part 52: wave-60 queries — Lorenz deciles (the
final decile must reach exactly 10⁶ ppm; a uniform-revenue corpus gives a
straight diagonal) and the Lindley queue replay (zero service times → zero
waits; an overloaded burst → strictly growing waits)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY
from tests.test_random_oracle28 import _con_for, _star
from tests.test_random_oracle31 import _events
from tools.check_queries import compare


def _run(name, d, con):
    spec = REGISTRY[name]
    got = spec.fn(d)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = con.execute(spec.sql).df()
    assert not compare(name, got, want), name
    return got


@pytest.mark.parametrize("seed", [373, 379])
def test_random_lorenz_lindley(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w60s{seed}"))
    _star(seed, d)
    _events(seed + 4, d)
    con = _con_for(d)
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    got = _run("lorenz_curve_suppliers", d, con)
    assert got.iloc[-1]["cum_share_ppm"] == 1_000_000
    assert got["cum_share_ppm"].is_monotonic_increasing
    _run("lindley_queue_audit", d, con)


def test_zero_service_zero_wait(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("w60z"))
    n = 40
    ts = (np.datetime64("2024-01-01", "us")
          + (np.arange(n) * 60_000_000).astype("timedelta64[us]"))
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts),
        "user_id": pa.array(np.ones(n, np.int64)),
        "event_type": pa.array(["view"] * n),
        "value": pa.array(np.zeros(n)),  # zero service → no queueing
        "props": pa.array(["{}"] * n),
    }), f"{d}/events.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    got = _run("lindley_queue_audit", d, con)
    assert got.iloc[0]["max_wait_ms"] == 0 and got.iloc[0]["sum_wait_ms"] == 0
