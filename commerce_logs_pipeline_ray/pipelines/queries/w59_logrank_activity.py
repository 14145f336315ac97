"""Wave 59: two-group survival comparison and activity-state transitions.

* logrank_groups — the log-rank test's O−E stream (Mantel 1966) comparing
  even- vs odd-custkey customer lifetimes (the deterministic A/B split this
  corpus supports): at every death time, E₁ = d·n₁/n quantized to
  10⁶·d·n₁ // n per term, reported as the running Σ(10⁶·O₁ − E₁_q) — the
  direction statistic of the test, exact integers end to end.
* activity_transition_matrix — month-over-month customer activity states:
  for every consecutive month pair, the counts of stay-active, churn
  (active→inactive), reactivate and stay-inactive customers (inactive =
  known customer with no order that month).  Per-(customer, month) flags
  reduce distributed; the 2×2 per month pair folds from month-level sets.
"""
from __future__ import annotations

from ._base import _i64, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from ._base import grouped_sums  # noqa: F401

_LR_CENSOR_DAYS = 90


def q_logrank_groups(sf_dir: str) -> pd.DataFrame:
    """Log-rank O−E stream between even/odd custkey groups over order-span
    lifetimes (right-censored near the horizon): per death time t,
    term = 10⁶·d₁ − (10⁶·d·n₁) // n; output the per-time table with the
    running sum — both engines fold the identical integer recursion."""
    from ...functions.relational import bucketed_group_reduce

    def to_day(t: pa.Table) -> pd.DataFrame:
        day = (pc.cast(t["o_orderdate"], pa.int64()).to_numpy(zero_copy_only=False)
               // 86_400_000_000)
        df = pd.DataFrame({"o_custkey": t["o_custkey"].to_numpy(zero_copy_only=False),
                           "fd": day, "ld": day})
        return df.groupby("o_custkey", as_index=False).agg(
            fd=("fd", "min"), ld=("ld", "max"))

    spans = bucketed_group_reduce(
        _t(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
            to_day, batch_format="pyarrow", zero_copy_batch=True),
        ["o_custkey"],
        lambda df: df.groupby("o_custkey", as_index=False).agg(
            fd=("fd", "min"), ld=("ld", "max")))

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"t_days": df["ld"] - df["fd"], "ld": df["ld"],
                            "g1": (df["o_custkey"] % 2 == 0).astype(np.int64),
                            "c": 1})
        return out.groupby(["t_days", "ld", "g1"], as_index=False).sum()

    lt = grouped_sums(
        spans.map_batches(per_group, batch_format="pandas"),
        ["t_days", "ld", "g1"], {"c": "c"}, reduce="driver").to_pandas()
    horizon = int(lt["ld"].max())
    ev = (lt["ld"] < horizon - _LR_CENSOR_DAYS).astype(np.int64)
    lt["d_part"] = lt["c"] * ev
    lt["d1_part"] = lt["d_part"] * lt["g1"]
    lt["c1_part"] = lt["c"] * lt["g1"]
    tab = (lt.groupby("t_days", as_index=False)
             .agg(d=("d_part", "sum"), d1=("d1_part", "sum"),
                  c=("c", "sum"), c1=("c1_part", "sum"))
             .sort_values("t_days", ignore_index=True))
    Ntot = int(tab["c"].sum())
    N1 = int(tab["c1"].sum())
    cum_c = tab["c"].cumsum().to_numpy(np.int64) - tab["c"].to_numpy(np.int64)
    cum_c1 = tab["c1"].cumsum().to_numpy(np.int64) - tab["c1"].to_numpy(np.int64)
    n_risk = Ntot - cum_c
    n1_risk = N1 - cum_c1
    d = tab["d"].to_numpy(np.int64)
    d1 = tab["d1"].to_numpy(np.int64)
    keep = d > 0
    term = (1_000_000 * d1[keep]
            - (1_000_000 * d[keep] * n1_risk[keep]) // n_risk[keep])
    out = pd.DataFrame({"t_days": tab["t_days"].to_numpy(np.int64)[keep],
                        "n_risk": n_risk[keep], "n1_risk": n1_risk[keep],
                        "d": d[keep], "d1": d1[keep],
                        "oe_running": np.cumsum(term)})
    return _i64(out, ["t_days", "n_risk", "n1_risk", "d", "d1", "oe_running"])


SQL_LOGRANK_GROUPS = f"""
WITH o AS (
  SELECT o_custkey,
         MIN(CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT)) AS fd,
         MAX(CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT)) AS ld
  FROM orders GROUP BY 1),
mx AS (SELECT MAX(ld) AS m FROM o),
l AS (
  SELECT ld - fd AS t,
         CASE WHEN ld < m - {_LR_CENSOR_DAYS} THEN 1 ELSE 0 END AS ev,
         CASE WHEN o_custkey % 2 = 0 THEN 1 ELSE 0 END AS g1
  FROM o, mx),
tab AS (
  SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
         CAST(SUM(ev * g1) AS BIGINT) AS d1,
         COUNT(*) AS c, CAST(SUM(g1) AS BIGINT) AS c1
  FROM l GROUP BY 1),
r AS (
  SELECT t, d, d1,
         (SELECT COUNT(*) FROM l)
           - (SUM(c) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) - c) AS n_risk,
         (SELECT SUM(g1) FROM l)
           - (SUM(c1) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) - c1) AS n1_risk
  FROM tab),
terms AS (
  SELECT t, n_risk, n1_risk, d, d1,
         1000000 * d1 - (1000000 * d * n1_risk) // n_risk AS term
  FROM r WHERE d > 0)
SELECT t AS t_days, CAST(n_risk AS BIGINT) AS n_risk,
       CAST(n1_risk AS BIGINT) AS n1_risk, d, d1,
       CAST(SUM(term) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS oe_running
FROM terms ORDER BY t
"""


def q_activity_transition_matrix(sf_dir: str) -> pd.DataFrame:
    """Month-over-month customer activity 2×2: per consecutive month pair
    (m, m+1), counts of active→active, active→inactive (churn),
    inactive→active (reactivation) and inactive→inactive over the known
    customer base.  Per-(customer, month) activity reduces distributed;
    the month-pair fold runs on the bounded month grid."""
    def to_month(t: pa.Table) -> pd.DataFrame:
        ts = pd.to_datetime(
            pc.cast(t["o_orderdate"], pa.int64()).to_numpy(zero_copy_only=False),
            unit="us")
        df = pd.DataFrame({"o_custkey": t["o_custkey"].to_numpy(zero_copy_only=False),
                           "month": ts.year.to_numpy() * 12 + ts.month.to_numpy() - 1})
        return df.drop_duplicates()

    act = grouped_sums(
        _t(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
            to_month, batch_format="pyarrow", zero_copy_batch=True),
        ["o_custkey", "month"], {}, reduce="driver").to_pandas()
    n_cust = act["o_custkey"].nunique()
    months = np.sort(act["month"].unique())
    by_month = {int(m): set(g["o_custkey"]) for m, g in act.groupby("month")}
    rows = []
    for m0, m1 in zip(months[:-1], months[1:]):
        if m1 != m0 + 1:
            continue
        a0, a1 = by_month[int(m0)], by_month[int(m1)]
        stay = len(a0 & a1)
        churn = len(a0 - a1)
        react = len(a1 - a0)
        rows.append({"month": int(m0), "stay_active": stay, "churned": churn,
                     "reactivated": react,
                     "stay_inactive": n_cust - stay - churn - react})
    out = pd.DataFrame(rows).sort_values("month", ignore_index=True)
    return _i64(out, ["month", "stay_active", "churned", "reactivated",
                      "stay_inactive"])


SQL_ACTIVITY_TRANSITION_MATRIX = """
WITH a AS (
  SELECT DISTINCT o_custkey,
         CAST(EXTRACT(year FROM o_orderdate) * 12
              + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT) AS month
  FROM orders),
nc AS (SELECT COUNT(DISTINCT o_custkey) AS n_cust FROM a),
months AS (
  SELECT month FROM (SELECT DISTINCT month FROM a) m0
  WHERE EXISTS (SELECT 1 FROM a WHERE a.month = m0.month + 1)),
pairs AS (
  SELECT m.month,
         CAST(COUNT(CASE WHEN c0.o_custkey IS NOT NULL
                          AND c1.o_custkey IS NOT NULL THEN 1 END) AS BIGINT)
           AS stay_active,
         CAST(COUNT(CASE WHEN c0.o_custkey IS NOT NULL
                          AND c1.o_custkey IS NULL THEN 1 END) AS BIGINT)
           AS churned,
         CAST(COUNT(CASE WHEN c0.o_custkey IS NULL
                          AND c1.o_custkey IS NOT NULL THEN 1 END) AS BIGINT)
           AS reactivated
  FROM months m
  CROSS JOIN (SELECT DISTINCT o_custkey FROM a) c
  LEFT JOIN a c0 ON c0.month = m.month AND c0.o_custkey = c.o_custkey
  LEFT JOIN a c1 ON c1.month = m.month + 1 AND c1.o_custkey = c.o_custkey
  GROUP BY 1)
SELECT month, stay_active, churned, reactivated,
       CAST(nc.n_cust - stay_active - churned - reactivated AS BIGINT)
         AS stay_inactive
FROM pairs, nc ORDER BY month
"""
