"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import _i64, datetime, pa, pads, pd, rd  # noqa: F401

# ---------------------------------------------------------------------------
# Filters (F1-F3) — predicate pushdown at the read
# ---------------------------------------------------------------------------

def q_error_events_window(sf_dir: str) -> pd.DataFrame:
    lo, hi = datetime(2024, 1, 3), datetime(2024, 1, 6)
    expr = (
        (pads.field("event_type") == "error")
        & (pads.field("ts") >= pa.scalar(lo, pa.timestamp("us")))
        & (pads.field("ts") < pa.scalar(hi, pa.timestamp("us")))
    )
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", filter=expr)
    out = ds.select_columns(["event_id", "user_id", "value"]).to_pandas()
    return _i64(out, ["event_id", "user_id"])


SQL_ERROR_EVENTS_WINDOW = """
SELECT event_id, user_id, value FROM events
WHERE event_type = 'error'
  AND ts >= TIMESTAMP '2024-01-03 00:00:00' AND ts < TIMESTAMP '2024-01-06 00:00:00'
"""

