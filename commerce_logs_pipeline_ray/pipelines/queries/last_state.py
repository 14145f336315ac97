"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import _i64, _t, last_by_key, pd  # noqa: F401

# ---------------------------------------------------------------------------
# Last-state-per-key compaction (A6/S5)
# ---------------------------------------------------------------------------

def q_last_event_per_user(sf_dir: str) -> pd.DataFrame:
    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    last = last_by_key(ds, "user_id", ["ts", "event_id"], ["event_type"])
    out = last.to_pandas()[["user_id", "event_id", "event_type"]]
    out = out.rename(columns={"event_id": "last_event_id", "event_type": "last_event_type"})
    return _i64(out, ["user_id", "last_event_id"])


SQL_LAST_EVENT = """
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
"""

