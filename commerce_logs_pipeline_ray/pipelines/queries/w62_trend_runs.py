"""Wave 62: non-parametric trend and randomness tests over the daily
revenue series, integer-exact.

* mann_kendall_trend — the Mann-Kendall S statistic (Mann 1945; Kendall's
  τ against time): S = Σ_{i<j} sign(x_j − x_i) over the daily order-revenue
  cents series — the standard monotone-trend detector paired with the
  Theil-Sen slope this registry already carries.  The daily series reduces
  distributed; the S fold runs vectorized on the output-bounded day grid.
* runs_test_audit — the Wald-Wolfowitz runs test count: above/below-median
  sign runs of the same series (median = lower median by (value, day)
  rank, ties dropped like the classic test), plus n₊/n₋ — pure integers,
  LAG-based oracle.
"""
from __future__ import annotations

from ._base import _i64, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from ._base import grouped_sums  # noqa: F401


def _daily_revenue(sf_dir: str) -> pd.DataFrame:
    def to_day(t: pa.Table) -> pa.Table:
        return pa.table({
            "day_id": pc.divide(pc.cast(t["o_orderdate"], pa.int64()),
                                pa.scalar(86_400_000_000, pa.int64())),
            "cents": pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                             pa.int64())})

    return grouped_sums(
        _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"]).map_batches(
            to_day, batch_format="pyarrow", zero_copy_batch=True),
        ["day_id", ], {"cents": "cents"}, reduce="driver").to_pandas()


def q_mann_kendall_trend(sf_dir: str) -> pd.DataFrame:
    """S = #concordant − #discordant pairs against time order over the
    output-bounded daily series (one vectorized upper-triangle sign pass —
    the literal form the oracle's pair join also evaluates)."""
    daily = _daily_revenue(sf_dir).sort_values("day_id", ignore_index=True)
    x = daily["cents"].to_numpy(np.int64)
    n = len(x)
    # the series is OUTPUT-BOUNDED by the day grid (≤ a few thousand rows
    # regardless of data scale), so one vectorized upper-triangle pass is
    # the right plan — the data-sized work already happened in the reduce
    if n == 0:
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ["n_days", "s_stat", "n_tie_pairs"]})
    diff = np.sign(x[None, :] - x[:, None])
    iu = np.triu_indices(n, k=1)
    sg = diff[iu]
    S = int(sg.sum())
    ties = int((sg == 0).sum())
    out = pd.DataFrame([{"n_days": n, "s_stat": S, "n_tie_pairs": ties}])
    return _i64(out, ["n_days", "s_stat", "n_tie_pairs"])


SQL_MANN_KENDALL_TREND = """
WITH d AS (
  SELECT CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day_id,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1),
p AS (
  SELECT SIGN(b.cents - a.cents) AS sg
  FROM d a JOIN d b ON a.day_id < b.day_id)
SELECT (SELECT COUNT(*) FROM d) AS n_days,
       CAST(COALESCE(SUM(sg), 0) AS BIGINT) AS s_stat,
       CAST(SUM(CASE WHEN sg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tie_pairs
FROM p
"""


def q_runs_test_audit(sf_dir: str) -> pd.DataFrame:
    """Wald-Wolfowitz runs over the daily revenue series: median = the
    value at rank (n+1)//2 by (cents, day_id); days equal to the median
    value drop (classic tie handling); runs = 1 + #sign changes."""
    daily = _daily_revenue(sf_dir).sort_values("day_id", ignore_index=True)
    x = daily["cents"].to_numpy(np.int64)
    d = daily["day_id"].to_numpy(np.int64)
    n = len(x)
    if n == 0:
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ["n_days", "n_above", "n_below", "n_runs"]})
    order = np.lexsort((d, x))
    med = int(x[order[(n + 1) // 2 - 1]])
    keep = x != med
    sgn = (x[keep] > med).astype(np.int64)
    n_above = int(sgn.sum())
    n_below = int(len(sgn) - n_above)
    runs = int(1 + (sgn[1:] != sgn[:-1]).sum()) if len(sgn) else 0
    out = pd.DataFrame([{"n_days": n, "n_above": n_above, "n_below": n_below,
                         "n_runs": runs}])
    return _i64(out, ["n_days", "n_above", "n_below", "n_runs"])


SQL_RUNS_TEST_AUDIT = """
WITH d AS (
  SELECT CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day_id,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1),
r AS (
  SELECT day_id, cents,
         ROW_NUMBER() OVER (ORDER BY cents, day_id) AS rk,
         COUNT(*) OVER () AS n
  FROM d),
med AS (SELECT cents AS m FROM r WHERE rk = (n + 1) // 2),
s AS (
  SELECT day_id, CASE WHEN cents > med.m THEN 1 ELSE 0 END AS sgn
  FROM d, med WHERE cents <> med.m),
f AS (
  SELECT sgn, LAG(sgn) OVER (ORDER BY day_id) AS prev FROM s)
SELECT (SELECT COUNT(*) FROM d) AS n_days,
       CAST(COALESCE((SELECT SUM(sgn) FROM s), 0) AS BIGINT) AS n_above,
       CAST(COALESCE((SELECT COUNT(*) - SUM(sgn) FROM s), 0) AS BIGINT) AS n_below,
       CAST(COALESCE(SUM(CASE WHEN prev IS NULL OR sgn <> prev
                          THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_runs
FROM f
"""
