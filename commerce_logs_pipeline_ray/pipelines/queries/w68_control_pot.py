"""Wave 68: statistical process control and extreme-value clustering over
the daily revenue series (output-bounded day grid after the distributed
reduce; every test in exact integer cross-multiplication).

* control_chart_violations — Shewhart X-chart: days outside ±3σ via
  (n·xᵢ − Σx)² > 9·(nΣx²−(Σx)²) (no square root ever taken), plus the
  Western-Electric rule-2 signal — the longest run of consecutive days on
  one side of the mean (side decided by n·xᵢ vs Σx, again integer).
* pot_exceedance_clusters — peaks-over-threshold clustering: threshold =
  the empirical p90 by rank (ceil(0.9·n)-th smallest by (value, day)),
  exceedance days group into clusters separated by ≥ one sub-threshold
  day; reports cluster count, largest cluster and the extremal-index-style
  ratio clusters/exceedances in ppm.
"""
from __future__ import annotations

from ._base import _i64, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from ._base import grouped_sums  # noqa: F401


def _daily(sf_dir: str) -> pd.DataFrame:
    def to_day(t: pa.Table) -> pa.Table:
        return pa.table({
            "day_id": pc.divide(pc.cast(t["o_orderdate"], pa.int64()),
                                pa.scalar(86_400_000_000, pa.int64())),
            "cents": pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                             pa.int64())})

    return grouped_sums(
        _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"]).map_batches(
            to_day, batch_format="pyarrow", zero_copy_batch=True),
        ["day_id"], {"cents": "cents"},
        reduce="driver").to_pandas().sort_values("day_id", ignore_index=True)


def q_control_chart_violations(sf_dir: str) -> pd.DataFrame:
    """±3σ violations and the longest one-side run, integer-exact."""
    daily = _daily(sf_dir)
    x = daily["cents"].to_numpy(np.int64)
    n = len(x)
    if n < 2:
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ["n_days", "n_violations",
                                       "max_side_run"]})
    sx = int(x.sum())
    sxx = int((x.astype(object) * x).sum())
    var_n2 = n * sxx - sx * sx  # n²·σ²
    dev = n * x.astype(object) - sx  # n·(x−x̄)
    viol = int(sum(1 for dv in dev if dv * dv > 9 * var_n2))
    side = np.sign([int(dv) for dv in dev]).astype(np.int64)
    run = best = 0
    prev = 0
    for s in side:
        if s != 0 and s == prev:
            run += 1
        elif s != 0:
            run = 1
        else:
            run = 0
        prev = s
        best = max(best, run)
    out = pd.DataFrame([{"n_days": n, "n_violations": viol,
                         "max_side_run": best}])
    return _i64(out, ["n_days", "n_violations", "max_side_run"])


SQL_CONTROL_CHART_VIOLATIONS = """
WITH d AS (
  SELECT CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day_id,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1),
m AS (
  SELECT COUNT(*) AS n, CAST(SUM(cents) AS HUGEINT) AS sx,
         CAST(SUM(cents * cents) AS HUGEINT) AS sxx
  FROM d),
s AS (
  SELECT day_id, n, (n * cents - sx) AS dev, n * sxx - sx * sx AS var_n2,
         CAST(SIGN(n * cents - sx) AS BIGINT) AS side
  FROM d, m),
runs AS (
  -- runs are ROW-consecutive in the series order (matching the scan), so
  -- group on rn, not on the calendar day
  SELECT side, rn - ROW_NUMBER() OVER (PARTITION BY side ORDER BY rn) AS grp
  FROM (SELECT side, day_id,
               ROW_NUMBER() OVER (ORDER BY day_id) AS rn FROM s)
  WHERE side <> 0),
runlen AS (
  SELECT COUNT(*) AS len FROM runs GROUP BY side, grp)
SELECT (SELECT COUNT(*) FROM d) AS n_days,
       CAST((SELECT COUNT(*) FROM s WHERE dev * dev > 9 * var_n2) AS BIGINT)
         AS n_violations,
       CAST(COALESCE((SELECT MAX(len) FROM runlen), 0) AS BIGINT)
         AS max_side_run
FROM m
"""


def q_pot_exceedance_clusters(sf_dir: str) -> pd.DataFrame:
    """Exceedance clusters above the rank-p90 threshold: consecutive-day
    exceedances merge; reports counts and clusters/exceedances ppm."""
    daily = _daily(sf_dir)
    x = daily["cents"].to_numpy(np.int64)
    d = daily["day_id"].to_numpy(np.int64)
    n = len(x)
    if n == 0:
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ["n_days", "n_exceed", "n_clusters",
                                       "max_cluster", "theta_ppm"]})
    order = np.lexsort((d, x))
    k = (9 * n + 9) // 10  # ceil(0.9·n)
    thr = int(x[order[k - 1]])
    exc_days = np.sort(d[x > thr])
    n_exc = len(exc_days)
    if n_exc == 0:
        out = pd.DataFrame([{"n_days": n, "n_exceed": 0, "n_clusters": 0,
                             "max_cluster": 0, "theta_ppm": 0}])
        return _i64(out, ["n_days", "n_exceed", "n_clusters", "max_cluster",
                          "theta_ppm"])
    breaks = np.nonzero(np.diff(exc_days) > 1)[0]
    n_clusters = len(breaks) + 1
    sizes = np.diff(np.concatenate([[0], breaks + 1, [n_exc]]))
    out = pd.DataFrame([{"n_days": n, "n_exceed": n_exc,
                         "n_clusters": n_clusters,
                         "max_cluster": int(sizes.max()),
                         "theta_ppm": (1_000_000 * n_clusters) // n_exc}])
    return _i64(out, ["n_days", "n_exceed", "n_clusters", "max_cluster",
                      "theta_ppm"])


SQL_POT_EXCEEDANCE_CLUSTERS = """
WITH d AS (
  SELECT CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day_id,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1),
r AS (
  SELECT day_id, cents, ROW_NUMBER() OVER (ORDER BY cents, day_id) AS rk,
         COUNT(*) OVER () AS n
  FROM d),
thr AS (SELECT cents AS t FROM r WHERE rk = (9 * n + 9) // 10),
e AS (
  SELECT day_id FROM d, thr WHERE cents > thr.t),
c AS (
  SELECT day_id,
         day_id - ROW_NUMBER() OVER (ORDER BY day_id) AS grp
  FROM e),
cl AS (SELECT grp, COUNT(*) AS len FROM c GROUP BY 1)
SELECT (SELECT COUNT(*) FROM d) AS n_days,
       CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_exceed,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(COALESCE(MAX(len), 0) AS BIGINT) AS max_cluster,
       CAST(CASE WHEN (SELECT COUNT(*) FROM e) > 0
                 THEN (1000000 * COUNT(*)) // (SELECT COUNT(*) FROM e)
                 ELSE 0 END AS BIGINT) AS theta_ppm
FROM cl
"""
