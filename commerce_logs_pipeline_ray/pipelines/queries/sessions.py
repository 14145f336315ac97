"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import _i64, _rd, _t, np, pa, pc, pd  # noqa: F401
from .events_agg import q_events_per_hour  # noqa: F401

# ---------------------------------------------------------------------------
# Session windows (gap rule ≡ reference blob-closing inactivity timeout,
# blob_closing_processor.go:68-92)
# ---------------------------------------------------------------------------

def q_hopping_window_counts(sf_dir: str) -> pd.DataFrame:
    """HOPPING (overlapping) event-time windows: 30-min windows sliding
    every 10 min — each event replicates to the 3 windows containing it
    (bounded flat-map, the streaming-window analogue of the band-join
    replication), then one grouped count over (window, type).  Differs from
    tumbling (events_per_hour) and from sliding-over-aggregate
    (hourly_moving_avg): the overlap happens at the RAW event level."""
    ds = _t(sf_dir, "events", ["ts", "event_type"])

    def explode(t: pa.Table) -> pa.Table:
        # int64 µs → 600 s buckets in one floor division (a safe Arrow cast
        # to timestamp[s] would raise on sub-second precision loss)
        base = (
            pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
            // 600_000_000
        )
        et = t["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        n = len(t)
        flat = pa.table(
            {"window_start": pa.array(
                np.concatenate([(base - j) * 600 for j in range(3)]), pa.int64()),
             "event_type": pa.concat_arrays([et] * 3),
             "n": pa.array(np.ones(3 * n, dtype=np.int64))}
        )
        g = flat.group_by(["window_start", "event_type"]).aggregate([("n", "sum")])
        return pa.table(
            {"window_start": g["window_start"], "event_type": g["event_type"],
             "n": g["n_sum"]}
        )

    parts = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = parts.groupby(["window_start", "event_type"], as_index=False)["n"].sum()
    out = out.sort_values(["window_start", "event_type"], ignore_index=True)
    return _i64(out, ["window_start", "n"])


SQL_HOPPING_WINDOW_COUNTS = """
SELECT (CAST(FLOOR(epoch(ts) / 600) AS BIGINT) - j) * 600 AS window_start,
       event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM events, unnest([0, 1, 2]) AS t(j)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_hourly_moving_avg(sf_dir: str) -> pd.DataFrame:
    """Sliding window over the tumbling hourly aggregate: 3-row moving
    average per event_type.  The distributed part is the hourly reduce; the
    window pass runs on the (tiny) aggregate — windows over aggregates never
    need a second shuffle."""
    base = q_events_per_hour(sf_dir).sort_values(["event_type", "hour_id"], kind="stable")
    base["ma3"] = (
        base.groupby("event_type")["n"]
        .rolling(3, min_periods=1)
        .mean()
        .pipe(_rd)
        .reset_index(level=0, drop=True)
    )
    return base.reset_index(drop=True)


SQL_HOURLY_MOVING_AVG = """
WITH h AS (
  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_id, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT hour_id, event_type, n,
       ROUND(AVG(n) OVER (PARTITION BY event_type ORDER BY hour_id
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS ma3
FROM h
"""


def q_user_sessions(sf_dir: str) -> pd.DataFrame:
    from ...functions.windows import sessionize

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id"])
    out = sessionize(ds, gap_seconds=1800.0).to_pandas()
    return _i64(out, ["user_id", "session_id", "n_events", "first_event_id", "last_event_id"])


SQL_USER_SESSIONS = """
WITH ordered AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800.0
              THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM ordered
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(event_id) AS first_event_id, MAX(event_id) AS last_event_id
FROM sess GROUP BY 1, 2
"""

