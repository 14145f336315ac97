"""Randomized oracle tests: run window/interval/sessionization queries
against their DuckDB SQL on RANDOM small corpora — edge cases the fixed
testdata never hits (single-event users, ties at window boundaries, users
spanning exactly one gap, empty overlap weeks)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY
from tools.check_queries import compare

QUERIES = [
    "rolling_active_users",
    "wau_retention",
    "longest_streaks",
    "new_users_daily",
    "session_depth_histogram",
    "total_active_time",
    "scd2_history",
    "event_trigrams",
    "hourly_autocorr",
    "conversion_latency",
    # histogram-sketch family — negative cent bins included via the value
    # range below
    "value_median_per_type",
    "value_boxplot",
    "value_gini",
    "winsorized_mean_per_type",
    "tail_expected_shortfall",
    "mad_outliers",
    # segmentation / behavioral
    "rfm_segments",
    "churn_counts",
    "journey_patterns",
    "session_conversion_rate",
    "bounce_rate",
    "peak_concurrent_sessions",
    # round-3 session-2: keyless band join + hopping windows (bucket-edge
    # timestamps appear via the exact 1800s gap steps above)
    "global_error_context",
    "hopping_window_counts",
    "type_overlap_matrix",
]


def random_events(seed: int, n_users: int = 40, n_events: int = 600) -> pa.Table:
    rng = np.random.default_rng(seed)
    users = rng.integers(1, n_users + 1, size=n_events)
    base = pd.Timestamp("2001-03-01").value // 1000  # µs
    # mix of tight bursts and multi-day gaps, plus exact 30-min boundary gaps
    offsets = np.cumsum(rng.choice(
        [1_000_000, 60_000_000, 1_800_000_000, 1_800_000_001, 86_400_000_000],
        p=[0.35, 0.3, 0.1, 0.1, 0.15], size=n_events))
    ts = base + offsets + rng.integers(0, 1000, size=n_events)
    types = rng.choice(["view", "click", "purchase", "signup", "error"], size=n_events)
    return pa.table({
        "event_id": pa.array(np.arange(n_events, dtype=np.int64)),
        "ts": pa.array(pd.to_datetime(ts, unit="us"), type=pa.timestamp("us")),
        "user_id": pa.array(users.astype(np.int64)),
        "event_type": pa.array(types),
        "value": pa.array(np.round(rng.uniform(-50, 500, size=n_events), 2)),
        "props": pa.array(["{}"] * n_events),
    })


@pytest.mark.parametrize("seed", [3, 17])
@pytest.mark.parametrize("name", QUERIES)
def test_random_corpus_matches_oracle(name, seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"rand{seed}")
    pq.write_table(random_events(seed), str(d / "events.parquet"))
    spec = REGISTRY[name]
    got = spec.fn(str(d))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    want = con.execute(spec.sql).df()
    problems = compare(name, got, want)
    assert not problems, problems


def test_half_boundary_ratio_corpus(ray_session, tmp_path_factory):
    """Adversarial rounding corpus: group counts are powers of two with odd
    numerators, so every emitted ratio lands EXACTLY on a 6-decimal half
    boundary (1/128 = 0.0078125).  numpy half-to-even vs DuckDB half-away
    diverges here unless both sides share the rounding convention
    (functions/rounding.py) — this is the end-to-end regression for it."""
    d = tmp_path_factory.mktemp("halfb")
    day_us = 86_400_000_000
    rows = []
    eid = 0
    # type 'a': 128 events, exactly 1 on a weekend → weekend_share = 1/128
    # type 'b': 256 events, 3 on weekends → 3/256 (another exact boundary)
    for etype, n, n_wk in (("a", 128, 1), ("b", 256, 3)):
        for i in range(n):
            # epoch day 3 is a Sunday under the (days+4)%7 convention
            day = 3 if i < n_wk else 4 + (i % 5)  # weekday otherwise
            rows.append((eid, day * day_us + i * 1_000_000, 1 + (i % 7), etype))
            eid += 1
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(pd.to_datetime([r[1] for r in rows], unit="us"),
                       type=pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([1.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    })
    pq.write_table(t, str(d / "events.parquet"))

    spec = REGISTRY["weekend_lift"]
    got = spec.fn(str(d))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    want = con.execute(spec.sql).df()
    # the planted boundary is live: DuckDB's answer differs from naive pandas
    naive = (got["n_weekend"] / got["n"]).round(6)
    assert float(naive.iloc[0]) != float(want["weekend_share"].iloc[0])
    # ...and the engine agrees with DuckDB bitwise
    x = got.sort_values("event_type")["weekend_share"].to_numpy()
    y = want.sort_values("event_type")["weekend_share"].to_numpy()
    assert (x.view(np.uint64) == y.view(np.uint64)).all()
    problems = compare("weekend_lift", got, want)
    assert not problems, problems
