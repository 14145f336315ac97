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

    from .relational import bucketed_group_reduce

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized over ALL keys in the bucket: session breaks at key
        # change OR gap over threshold, session ids via per-key cumsum
        df = df.sort_values([key, ts_col, tiebreak_col], kind="stable")
        ts = df[ts_col].to_numpy(dtype="datetime64[ns]").astype("int64") / 1e9
        keys_arr = df[key].to_numpy()
        gaps = np.diff(ts, prepend=ts[0] if len(ts) else 0.0)
        key_change = np.ones(len(df), dtype=bool)
        if len(df) > 1:
            key_change[1:] = keys_arr[1:] != keys_arr[:-1]
        new_sess = (key_change | (gaps > gap_seconds)).astype(np.int64)
        global_sess = np.cumsum(new_sess)  # distinct across keys
        df = df.assign(__gs=global_sess)
        g = df.groupby("__gs", sort=False)
        out = pd.DataFrame(
            {
                key: g[key].first().to_numpy(),
                "__gs": g.size().index,
                "n_events": g.size().to_numpy(),
                "first_event_id": g[tiebreak_col].min().to_numpy(),
                "last_event_id": g[tiebreak_col].max().to_numpy(),
            }
        )
        # renumber sessions 1..n within each key
        out = out.sort_values([key, "__gs"], kind="stable")
        out["session_id"] = out.groupby(key, sort=False).cumcount() + 1
        return out.drop(columns=["__gs"])[[key, "session_id", "n_events", "first_event_id", "last_event_id"]]

    return bucketed_group_reduce(events, [key], per_bucket)
