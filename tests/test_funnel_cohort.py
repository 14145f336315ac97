"""Funnel + cohort retention (functions/windows.py) against planted truth."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from commerce_logs_pipeline_ray.functions.windows import cohort_retention, funnel_counts


def _events(rows):
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    df["ts"] = pd.to_datetime(df["ts"])
    return df


def test_funnel_strict_ordering_planted(ray_session):
    """u1 completes the funnel; u2 clicked BEFORE viewing (click must not
    count); u3 stops at click; u4 never views; u5's purchase ties the click
    timestamp exactly (strict > ⇒ not converted)."""
    df = _events(
        [
            ("u1", "2024-01-01 00:00", "view"),
            ("u1", "2024-01-01 00:05", "click"),
            ("u1", "2024-01-01 00:09", "purchase"),
            ("u2", "2024-01-01 00:00", "click"),
            ("u2", "2024-01-01 00:10", "view"),
            ("u3", "2024-01-02 00:00", "view"),
            ("u3", "2024-01-02 00:01", "click"),
            ("u4", "2024-01-03 00:00", "click"),
            ("u4", "2024-01-03 00:01", "purchase"),
            ("u5", "2024-01-04 00:00", "view"),
            ("u5", "2024-01-04 00:02", "click"),
            ("u5", "2024-01-04 00:02", "purchase"),
        ]
    )
    for blocks in (1, 4):
        ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(blocks)
        out = funnel_counts(ds, ["view", "click", "purchase"]).sort_values("stage")
        assert out["users"].tolist() == [4, 3, 1], out  # views: u1,u2,u3,u5


def test_cohort_retention_planted(ray_session):
    wk = 604_800
    base = pd.Timestamp("1970-01-01")
    rows = []
    # u1: weeks 0,1,3 ; u2: weeks 1,1,2 (dup active week) ; u3: week 3 only
    for u, weeks in [("u1", [0, 1, 3]), ("u2", [1, 1, 2]), ("u3", [3])]:
        for w in weeks:
            rows.append((u, base + pd.Timedelta(seconds=w * wk + 60), "x"))
    df = _events(rows)[["user_id", "ts"]]
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(3)
    out = cohort_retention(ds)
    got = {(r.cohort_week, r.week_offset): r.users for r in out.itertuples()}
    assert got == {
        (0, 0): 1, (0, 1): 1, (0, 3): 1,   # u1 cohort week 0
        (1, 0): 1, (1, 1): 1,              # u2 cohort week 1 (dup week collapsed)
        (3, 0): 1,                         # u3
    }


# -------------------------------------------------- LAG gaps / transitions

def test_lag_gap_stats_matches_pandas_reference(ray_session):
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.windows import lag_gap_stats

    rng = np.random.default_rng(3)
    n = 4000
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 50, n),
            "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
            "event_id": np.arange(n),
            "event_type": rng.choice(["a", "b", "c"], n),
        }
    )
    got = lag_gap_stats(rd.from_pandas(df))

    ref = df.sort_values(["user_id", "ts", "event_id"]).copy()
    ref["gap"] = ref.groupby("user_id")["ts"].diff().dt.total_seconds()
    ref = ref.dropna(subset=["gap"])
    want = ref.groupby("event_type")["gap"].agg(["count", "mean", "max"]).reset_index()
    got_i = got.set_index("event_type")
    for _, r in want.iterrows():
        assert got_i.loc[r["event_type"], "n_gaps"] == r["count"]
        assert abs(got_i.loc[r["event_type"], "avg_gap_s"] - round(r["mean"], 6)) < 1e-9
        assert got_i.loc[r["event_type"], "max_gap_s"] == round(r["max"], 6)


def test_transition_matrix_probabilities_sum_to_one(ray_session):
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.windows import transition_matrix

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2, 3],
            "ts": pd.to_datetime([10, 20, 30, 10, 20, 10], unit="s"),
            "event_id": range(6),
            "event_type": ["v", "c", "p", "v", "v", "p"],
        }
    )
    out = transition_matrix(rd.from_pandas(df))
    # user1: v→c, c→p ; user2: v→v ; user3: no pair
    got = {(r.prev_type, r.next_type): r.n for r in out.itertuples()}
    assert got == {("v", "c"): 1, ("c", "p"): 1, ("v", "v"): 1}
    assert np.allclose(out.groupby("prev_type")["p"].sum(), 1.0)


def test_range_window_peak_planted_bursts_and_ties(ray_session):
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.windows import range_window_peak

    # user 1: 4 events within one hour (incl. a duplicate ts — RANGE peers),
    # then an isolated one; user 2: evenly spread, never 2 in any window
    ts1 = pd.to_datetime([0, 600, 600, 3600, 90000], unit="s")
    ts2 = pd.to_datetime([0, 7200, 14400], unit="s")
    df = pd.DataFrame(
        {
            "user_id": [1] * 5 + [2] * 3,
            "ts": list(ts1) + list(ts2),
        }
    )
    out = range_window_peak(rd.from_pandas(df), window_seconds=3600, out_name="mb")
    got = dict(zip(out["user_id"], out["mb"]))
    assert got == {1: 4, 2: 1}  # [0,3600] inclusive holds all four
