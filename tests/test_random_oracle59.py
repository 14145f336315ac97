"""Randomized oracle tests, part 59: wave-67 queries — greedy knapsack
(budget respected; the ALL row reconciles the per-brand rows) and coverage
gaps (a planted 3-day outage must surface as the max gap)."""

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


@pytest.mark.parametrize("seed", [449, 457])
def test_random_knapsack_gaps(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w67s{seed}"))
    _star(seed, d)
    _events(seed + 6, d)
    # plant a 3-day outage inside the 'view' stream
    t = pq.read_table(f"{d}/events.parquet").to_pandas()
    view = t["event_type"] == "view"
    ts = t.loc[view, "ts"]
    mid = ts.quantile(0.5)
    hole = view & (t["ts"] > mid) & (t["ts"] < mid + pd.Timedelta(days=3))
    t = t[~hole]
    pq.write_table(pa.Table.from_pandas(t, preserve_index=False),
                   f"{d}/events.parquet")
    con = _con_for(d)
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    kp = _run("greedy_knapsack_plan", d, con)
    allrow = kp[kp["p_brand"] == "ALL"].iloc[0]
    rest = kp[kp["p_brand"] != "ALL"]
    assert allrow["size_used"] <= 2000
    assert rest["n_taken"].sum() == allrow["n_taken"]
    assert rest["value_cents"].sum() == allrow["value_cents"]
    cg = _run("coverage_gap_audit", d, con)
    assert cg.set_index("event_type").loc["view", "max_gap_s"] >= 2 * 86400
