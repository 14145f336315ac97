"""Wave 63: robust location and slope estimation over the daily revenue
series — both fold on the OUTPUT-BOUNDED day grid after the distributed
daily reduce, with lower-median rank rules shared verbatim by the oracle.

* hodges_lehmann_location — the Hodges-Lehmann (1963) pseudomedian: the
  lower median of all pairwise Walsh averages (xᵢ+xⱼ)/2, i ≤ j, carried as
  2× integers so averages never leave ℤ.
* siegel_repeated_medians — Siegel's (1982) repeated-median slope (50%
  breakdown, vs Theil-Sen's 29%): per day the lower median of its pairwise
  slopes (ppm-quantized with truncating division), then the lower median
  of those medians.
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


def _lower_median(v: np.ndarray) -> int:
    s = np.sort(v)
    return int(s[(len(s) + 1) // 2 - 1])


def q_hodges_lehmann_location(sf_dir: str) -> pd.DataFrame:
    """Lower median of the n(n+1)/2 Walsh sums xᵢ+xⱼ (i ≤ j), reported as
    the 2×-cents pseudomedian — exact integers, vectorized triangle."""
    x = _daily(sf_dir)["cents"].to_numpy(np.int64)
    n = len(x)
    if n == 0:
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ["n_days", "hl_2x_cents"]})
    ii, jj = np.triu_indices(n, k=0)
    walsh2 = x[ii] + x[jj]
    out = pd.DataFrame([{"n_days": n, "hl_2x_cents": _lower_median(walsh2)}])
    return _i64(out, ["n_days", "hl_2x_cents"])


SQL_HODGES_LEHMANN_LOCATION = """
WITH d AS (
  SELECT CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day_id,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1),
w AS (
  SELECT a.cents + b.cents AS w2
  FROM d a JOIN d b ON a.day_id <= b.day_id),
r AS (
  SELECT w2, ROW_NUMBER() OVER (ORDER BY w2) AS rk, COUNT(*) OVER () AS m
  FROM w)
SELECT (SELECT COUNT(*) FROM d) AS n_days,
       CAST(w2 AS BIGINT) AS hl_2x_cents
FROM r WHERE rk = (m + 1) // 2
"""


def q_siegel_repeated_medians(sf_dir: str) -> pd.DataFrame:
    """Repeated-median slope: slope_ij quantized to ppm by truncating
    division, per-day lower medians, then the lower median of medians —
    one vectorized n×n pass on the day grid."""
    daily = _daily(sf_dir)
    t = daily["day_id"].to_numpy(np.int64)
    x = daily["cents"].to_numpy(np.int64)
    n = len(x)
    if n < 2:
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ["n_days", "siegel_slope_ppm"]})
    dt = t[None, :] - t[:, None]
    dx = x[None, :] - x[:, None]
    num = 1_000_000 * dx
    with np.errstate(divide="ignore", invalid="ignore"):
        q = np.abs(num) // np.abs(np.where(dt == 0, 1, dt))
    slope = np.where((num >= 0) == (dt > 0), q, -q)
    med_i = np.empty(n, np.int64)
    mask = ~np.eye(n, dtype=bool)
    for i in range(n):  # n ≤ day-grid size; each row fold is vectorized
        med_i[i] = _lower_median(slope[i][mask[i]])
    out = pd.DataFrame([{"n_days": n,
                         "siegel_slope_ppm": _lower_median(med_i)}])
    return _i64(out, ["n_days", "siegel_slope_ppm"])


SQL_SIEGEL_REPEATED_MEDIANS = """
WITH d AS (
  SELECT CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day_id,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1),
s AS (
  SELECT a.day_id AS i, (1000000 * (b.cents - a.cents)) // (b.day_id - a.day_id)
         AS slope
  FROM d a JOIN d b ON a.day_id <> b.day_id),
mi AS (
  SELECT i, slope,
         ROW_NUMBER() OVER (PARTITION BY i ORDER BY slope) AS rk,
         COUNT(*) OVER (PARTITION BY i) AS m
  FROM s),
med AS (SELECT i, slope AS med_slope FROM mi WHERE rk = (m + 1) // 2),
f AS (
  SELECT med_slope, ROW_NUMBER() OVER (ORDER BY med_slope) AS rk,
         COUNT(*) OVER () AS m
  FROM med)
SELECT (SELECT COUNT(*) FROM d) AS n_days,
       CAST(med_slope AS BIGINT) AS siegel_slope_ppm
FROM f WHERE rk = (m + 1) // 2
"""
