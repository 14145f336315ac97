"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import _i64, _rd, _t, grouped_sums, pa, pc, pd, topk  # noqa: F401

# ---------------------------------------------------------------------------
# Aggregations over the events stream (A1/A2/A5)
# ---------------------------------------------------------------------------

def q_events_by_type(sf_dir: str) -> pd.DataFrame:
    ds = _t(sf_dir, "events", ["event_type", "value"])
    out = grouped_sums(ds, ["event_type"], {"total_value": "value"}, "n", reduce="driver").to_pandas()
    out["total_value"] = out["total_value"].pipe(_rd, 2)
    return _i64(out, ["n"])


SQL_EVENTS_BY_TYPE = """
SELECT event_type, ROUND(SUM(value), 2) AS total_value, COUNT(*) AS n
FROM events GROUP BY event_type
"""


def q_events_per_hour(sf_dir: str) -> pd.DataFrame:
    ds = _t(sf_dir, "events", ["ts", "event_type"])

    def add_hour(t: pa.Table) -> pa.Table:
        micros = pc.cast(t["ts"], pa.int64())
        hour_id = pc.divide(micros, pa.scalar(3_600_000_000, pa.int64()))
        return pa.table({"hour_id": hour_id, "event_type": t["event_type"]})

    ds = ds.map_batches(add_hour, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_sums(ds, ["hour_id", "event_type"], {}, "n").to_pandas()
    return _i64(out, ["hour_id", "n"])


SQL_EVENTS_PER_HOUR = """
SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_id, event_type, COUNT(*) AS n
FROM events GROUP BY 1, 2
"""


def q_top_users_by_value(sf_dir: str) -> pd.DataFrame:
    ds = _t(sf_dir, "events", ["user_id", "value"])
    totals = grouped_sums(ds, ["user_id"], {"total_value": "value"}, "n")
    out = topk(totals, ["total_value", "user_id"], [True, False], 10).to_pandas()
    out["total_value"] = out["total_value"].pipe(_rd, 2)
    return _i64(out, ["user_id", "n"])


SQL_TOP_USERS = """
SELECT user_id, ROUND(SUM(value), 2) AS total_value, COUNT(*) AS n
FROM events GROUP BY user_id
ORDER BY SUM(value) DESC, user_id LIMIT 10
"""

