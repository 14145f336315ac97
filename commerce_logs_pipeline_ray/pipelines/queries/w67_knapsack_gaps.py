"""Wave 67: greedy optimization and stream-coverage auditing.

* greedy_knapsack_plan — the density-greedy knapsack heuristic over parts:
  order by quantized value density (10⁶·price_cents // size, ties by key),
  admit while the running size stays within the budget — the classic
  2-approximation's deterministic core, expressed as one ordered cumsum
  both engines evaluate identically.  Output: per-brand admitted counts +
  the global plan totals row.
* coverage_gap_audit — largest silent window per event_type: max
  consecutive-event gap (seconds) and its start day — the monitoring
  counterpart of the freshness audit (internal outages, not just staleness
  at the horizon).
"""
from __future__ import annotations

from ._base import _i64, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from ._base import grouped_sums  # noqa: F401

_KNAP_BUDGET = 2000  # total size units


def q_greedy_knapsack_plan(sf_dir: str) -> pd.DataFrame:
    """Density-greedy plan over the part dimension: admit by (density DESC,
    key) while Σsize ≤ 2000; per-brand admitted counts plus an ALL row with
    the plan totals."""
    p = _t(sf_dir, "part", ["p_partkey", "p_brand", "p_size", "p_retailprice"])

    def conv(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({
            "p_partkey": t["p_partkey"].to_numpy(zero_copy_only=False),
            "p_brand": t["p_brand"].to_numpy(zero_copy_only=False),
            "size": t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64),
            "cents": np.rint(t["p_retailprice"].to_numpy(zero_copy_only=False)
                             * 100.0).astype(np.int64)})

    df = p.map_batches(conv, batch_format="pyarrow",
                       zero_copy_batch=True).to_pandas()
    df = df[df["size"] > 0]
    df["density"] = (1_000_000 * df["cents"]) // df["size"]
    df = df.sort_values(["density", "p_partkey"], ascending=[False, True],
                        ignore_index=True)
    cum = df["size"].cumsum()
    take = cum <= _KNAP_BUDGET
    sel = df[take]
    per_brand = (sel.groupby("p_brand", as_index=False)
                    .agg(n_taken=("p_partkey", "size"),
                         value_cents=("cents", "sum"),
                         size_used=("size", "sum")))
    total = pd.DataFrame([{"p_brand": "ALL", "n_taken": len(sel),
                           "value_cents": int(sel["cents"].sum()),
                           "size_used": int(sel["size"].sum())}])
    out = pd.concat([per_brand, total], ignore_index=True)
    out = out.sort_values("p_brand", ignore_index=True)
    return _i64(out, ["n_taken", "value_cents", "size_used"])


SQL_GREEDY_KNAPSACK_PLAN = f"""
WITH p AS (
  SELECT p_partkey, p_brand, CAST(p_size AS BIGINT) AS sz,
         CAST(ROUND(p_retailprice * 100) AS BIGINT) AS cents
  FROM part WHERE p_size > 0),
o AS (
  SELECT *, (1000000 * cents) // sz AS density,
         SUM(sz) OVER (ORDER BY (1000000 * cents) // sz DESC, p_partkey
                       ROWS UNBOUNDED PRECEDING) AS cum
  FROM p),
sel AS (SELECT * FROM o WHERE cum <= {_KNAP_BUDGET})
SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_taken,
       CAST(SUM(cents) AS BIGINT) AS value_cents,
       CAST(SUM(sz) AS BIGINT) AS size_used
FROM sel GROUP BY 1
UNION ALL
SELECT 'ALL', CAST(COUNT(*) AS BIGINT), CAST(SUM(cents) AS BIGINT),
       CAST(SUM(sz) AS BIGINT)
FROM sel
ORDER BY p_brand
"""


def q_coverage_gap_audit(sf_dir: str) -> pd.DataFrame:
    """Largest internal silent window per event_type: max consecutive gap
    in whole seconds and the day the gap started.  Per-type sorted diffs
    fold inside a type-keyed bucket exchange."""
    from ...functions.relational import bucketed_group_reduce

    def to_seq(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t["event_type"],
                         "ts_us": pc.cast(t["ts"], pa.int64()),
                         "event_id": t["event_id"]})

    ev = _t(sf_dir, "events", ["event_type", "ts", "event_id"]).map_batches(
        to_seq, batch_format="pyarrow", zero_copy_batch=True)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type"):
            g = g.sort_values(["ts_us", "event_id"])
            ts = g["ts_us"].to_numpy(np.int64)
            if len(ts) < 2:
                continue
            gaps = (ts[1:] - ts[:-1]) // 1_000_000
            k = int(np.argmax(gaps))
            # deterministic tie-break: argmax takes the FIRST max; the
            # oracle mirrors with (gap DESC, rn) ordering
            rows.append({"event_type": et, "n_events": len(ts),
                         "max_gap_s": int(gaps[k]),
                         "gap_start_day": int(ts[k] // 86_400_000_000)})
        return pd.DataFrame(rows)

    out = bucketed_group_reduce(ev, ["event_type"], fold).to_pandas()
    out = out.sort_values("event_type", ignore_index=True)
    return _i64(out, ["n_events", "max_gap_s", "gap_start_day"])


SQL_COVERAGE_GAP_AUDIT = """
WITH e AS (
  SELECT event_type, epoch_us(ts) AS t,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS rn
  FROM events),
g AS (
  SELECT a.event_type, a.rn, (b.t - a.t) // 1000000 AS gap_s,
         a.t // 86400000000 AS start_day
  FROM e a JOIN e b ON b.event_type = a.event_type AND b.rn = a.rn + 1),
r AS (
  SELECT event_type, gap_s, start_day,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY gap_s DESC, rn) AS rk
  FROM g),
n AS (SELECT event_type, COUNT(*) AS n_events FROM e GROUP BY 1)
SELECT r.event_type, CAST(n.n_events AS BIGINT) AS n_events,
       CAST(gap_s AS BIGINT) AS max_gap_s,
       CAST(start_day AS BIGINT) AS gap_start_day
FROM r JOIN n USING (event_type)
WHERE rk = 1 AND n.n_events >= 2
ORDER BY r.event_type
"""
