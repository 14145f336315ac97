"""Incremental aggregate-maintenance state tests: fold ≡ recompute,
idempotent run replay, atomic state files."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from commerce_logs_pipeline_ray.state.aggstate import IncrementalAgg, fold_run


def _events(lo, hi):
    rows = [
        {"event_type": f"t{i % 3}", "value": round(i * 1.01, 2)}
        for i in range(lo, hi)
    ]
    return rd.from_pandas(pd.DataFrame(rows)).repartition(3)


def test_fold_equals_recompute(tmp_path, ray_session):
    st = IncrementalAgg(str(tmp_path / "s"), ["event_type"], ["cents"])
    assert fold_run(_events(0, 50), st, "r1")
    assert fold_run(_events(50, 90), st, "r2")
    got = st.read().set_index("event_type")
    full = pd.DataFrame(
        [{"event_type": f"t{i % 3}", "cents": int(round(i * 1.01 * 100))}
         for i in range(90)]
    ).groupby("event_type").agg(n=("cents", "size"), cents=("cents", "sum"))
    assert (got["n"] == full["n"]).all()
    assert (got["cents"] == full["cents"]).all()


def test_replay_is_noop(tmp_path, ray_session):
    st = IncrementalAgg(str(tmp_path / "s"), ["event_type"], ["cents"])
    assert fold_run(_events(0, 30), st, "r1") is True
    before = st.read()
    assert fold_run(_events(0, 30), st, "r1") is False  # same run id → no-op
    assert st.read().equals(before)
    assert st.applied_runs() == ["r1"]


def test_empty_state_read(tmp_path):
    st = IncrementalAgg(str(tmp_path / "s"), ["event_type"], ["cents"])
    df = st.read()
    assert list(df.columns) == ["event_type", "n", "cents"] and len(df) == 0
