"""Windowed / session semantics over the bounded events stream.

Ray Data has no event-time windowing; per the batch equivalence in
SURVEY.md §2.9 we treat the events table as a partitioned log: hash-shuffle
by key, order by (ts, event_id) within the group, window with pandas inside
``groupby().map_groups``.  Tumbling windows are pure key arithmetic
(``events_per_hour`` in pipelines/queries.py); this module adds gap-based
session windows (the reference's only window is the blob-closing inactivity
timeout — ``blob_closing_processor.go:68-92`` — which is exactly a session
gap rule)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data import Dataset


def sessionize(
    events: Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    gap_seconds: float = 1800.0,
) -> Dataset:
    """Assign session ids per key: a new session starts when the gap from
    the previous event exceeds ``gap_seconds`` (order: ts, tiebreak).

    Output: one row per (key, session_id) with n_events, first/last event id.
    Partitioning assumption: all rows of one key co-locate via the groupby
    hash shuffle; within-group order is established by an explicit sort, so
    block arrival order never matters.
    """

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([ts_col, tiebreak_col], kind="stable")
        ts = df[ts_col].to_numpy(dtype="datetime64[ns]").astype("int64") / 1e9  # → seconds
        gaps = np.diff(ts, prepend=ts[0] if len(ts) else 0.0)
        new_sess = np.ones(len(df), dtype=np.int64)
        if len(df) > 1:
            new_sess[1:] = (gaps[1:] > gap_seconds).astype(np.int64)
        session_id = np.cumsum(new_sess)
        df = df.assign(session_id=session_id)
        g = df.groupby("session_id")
        out = pd.DataFrame(
            {
                key: df[key].iloc[0],
                "session_id": g.size().index,
                "n_events": g.size().to_numpy(),
                "first_event_id": g[tiebreak_col].min().to_numpy(),
                "last_event_id": g[tiebreak_col].max().to_numpy(),
            }
        )
        return out

    return events.groupby(key).map_groups(per_key, batch_format="pandas")
