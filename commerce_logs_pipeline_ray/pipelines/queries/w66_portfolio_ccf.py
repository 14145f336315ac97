"""Wave 66: two-series financial statistics over segment revenue.

* min_variance_weights — the Markowitz two-asset minimum-variance weight
  between the BUILDING and MACHINERY daily revenue series: w_A = (V_B − C)
  / (V_A + V_B − 2C) with V/C as the integer cross-multiplied moments
  (nΣx²−(Σx)², nΣxy−ΣxΣy) over the common-day inner join — exact ppm with
  truncating sign semantics.
* cross_correlation_segments — the lead/lag structure: Pearson ρ between
  BUILDING(t) and MACHINERY(t+lag) for lag ∈ {−1, 0, 1}, the denominator
  mirroring FLOOR(SQRT(double·double)) bit-for-bit (the Spearman-proven
  convention), one row per lag.
"""
from __future__ import annotations

import math

from ._base import _i64, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from ._base import grouped_sums  # noqa: F401

_SEG_A, _SEG_B = "BUILDING", "MACHINERY"


def _tdiv(a: int, d: int) -> int:
    q = abs(a) // abs(d)
    return q if (a >= 0) == (d > 0) else -q


def _segment_daily(sf_dir: str) -> pd.DataFrame:
    import ray as _ray

    c = pq.read_table(f"{sf_dir}/customer.parquet",
                      columns=["c_custkey", "c_mktsegment"]).to_pandas()
    c = c.sort_values("c_custkey")
    cmap_ref = _ray.put((c["c_custkey"].to_numpy(np.int64),
                         c["c_mktsegment"].to_numpy()))

    orders = _t(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])

    def part(t: pa.Table) -> pd.DataFrame:
        keys, segs = _ray.get(cmap_ref)
        u = t["o_custkey"].to_numpy(zero_copy_only=False)
        i = np.searchsorted(keys, u)
        i[i == len(keys)] = 0
        m = keys[i] == u
        day = (pc.cast(t["o_orderdate"], pa.int64()).to_numpy(zero_copy_only=False)
               // 86_400_000_000)
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"seg": segs[i][m], "day_id": day[m],
                           "cents": cents[m]})
        df = df[df["seg"].isin([_SEG_A, _SEG_B])]
        return df.groupby(["seg", "day_id"], as_index=False).sum()

    daily = grouped_sums(
        orders.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["seg", "day_id"], {"cents": "cents"}, reduce="driver").to_pandas()
    wide = daily.pivot_table(index="day_id", columns="seg", values="cents",
                             aggfunc="sum").dropna()
    return wide.reset_index().rename(columns={_SEG_A: "a", _SEG_B: "b"})


def q_min_variance_weights(sf_dir: str) -> pd.DataFrame:
    """w_A ppm = 10⁶·(V_B − C) // (V_A + V_B − 2C) over common days."""
    w = _segment_daily(sf_dir).sort_values("day_id")
    a = w["a"].to_numpy(np.int64)
    b = w["b"].to_numpy(np.int64)
    n = len(a)
    if n < 2:
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ["n_days", "w_a_ppm"]})
    ao, bo = a.astype(object), b.astype(object)
    sa, sb = int(a.sum()), int(b.sum())
    va = n * int((ao * ao).sum()) - sa * sa  # object sums: Σx² passes 2⁶³
    vb = n * int((bo * bo).sum()) - sb * sb
    cv = n * int((ao * bo).sum()) - sa * sb
    den = va + vb - 2 * cv
    if den == 0:
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ["n_days", "w_a_ppm"]})
    out = pd.DataFrame([{"n_days": n,
                         "w_a_ppm": _tdiv(1_000_000 * (vb - cv), den)}])
    return _i64(out, ["n_days", "w_a_ppm"])


SQL_MIN_VARIANCE_WEIGHTS = f"""
WITH d AS (
  SELECT c_mktsegment AS seg,
         CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day_id,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders JOIN customer ON c_custkey = o_custkey
  WHERE c_mktsegment IN ('{_SEG_A}', '{_SEG_B}')
  GROUP BY 1, 2),
w AS (
  SELECT x.day_id, x.cents AS a, y.cents AS b
  FROM d x JOIN d y ON x.day_id = y.day_id
  WHERE x.seg = '{_SEG_A}' AND y.seg = '{_SEG_B}'),
m AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(a) AS HUGEINT) AS sa, CAST(SUM(b) AS HUGEINT) AS sb,
         CAST(SUM(a * a) AS HUGEINT) AS saa,
         CAST(SUM(b * b) AS HUGEINT) AS sbb,
         CAST(SUM(a * b) AS HUGEINT) AS sab
  FROM w),
f AS (
  SELECT n, n * saa - sa * sa AS va, n * sbb - sb * sb AS vb,
         n * sab - sa * sb AS cv
  FROM m)
SELECT CAST(n AS BIGINT) AS n_days,
       CAST((1000000 * (vb - cv)) // (va + vb - 2 * cv) AS BIGINT) AS w_a_ppm
FROM f WHERE n >= 2 AND va + vb - 2 * cv <> 0
"""


def q_cross_correlation_segments(sf_dir: str) -> pd.DataFrame:
    """ρ(a_t, b_{t+lag}) for lag ∈ {−1, 0, 1} over row-consecutive common
    days, FLOOR(SQRT(double·double)) denominator convention."""
    w = _segment_daily(sf_dir).sort_values("day_id", ignore_index=True)
    a = w["a"].to_numpy(np.int64)
    b = w["b"].to_numpy(np.int64)
    rows = []
    for lag in (-1, 0, 1):
        if lag >= 0:
            x, y = a[: len(a) - lag], b[lag:]
        else:
            x, y = a[-lag:], b[: len(b) + lag]
        n = len(x)
        if n < 2:
            continue
        xo, yo = x.astype(object), y.astype(object)
        sx, sy = int(x.sum()), int(y.sum())
        vx = n * int((xo * xo).sum()) - sx * sx
        vy = n * int((yo * yo).sum()) - sy * sy
        num = n * int((xo * yo).sum()) - sx * sy
        if vx <= 0 or vy <= 0:
            continue
        den = int(math.floor(math.sqrt(float(vx) * float(vy))))
        rows.append({"lag": lag, "n_pairs": n,
                     "ccf_ppm": _tdiv(1_000_000 * num, den)})
    if not rows:
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ["lag", "n_pairs", "ccf_ppm"]})
    out = pd.DataFrame(rows).sort_values("lag", ignore_index=True)
    return _i64(out, ["lag", "n_pairs", "ccf_ppm"])


SQL_CROSS_CORRELATION_SEGMENTS = f"""
WITH d AS (
  SELECT c_mktsegment AS seg,
         CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day_id,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders JOIN customer ON c_custkey = o_custkey
  WHERE c_mktsegment IN ('{_SEG_A}', '{_SEG_B}')
  GROUP BY 1, 2),
w AS (
  SELECT x.cents AS a, y.cents AS b,
         ROW_NUMBER() OVER (ORDER BY x.day_id) AS rn
  FROM d x JOIN d y ON x.day_id = y.day_id
  WHERE x.seg = '{_SEG_A}' AND y.seg = '{_SEG_B}'),
lags AS (SELECT UNNEST([-1, 0, 1]) AS lag),
pairs AS (
  SELECT lags.lag, p.a AS x, q.b AS y
  FROM lags JOIN w p ON TRUE JOIN w q ON q.rn = p.rn + lags.lag),
m AS (
  SELECT lag, COUNT(*) AS n,
         CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
         CAST(SUM(x * x) AS HUGEINT) AS sxx,
         CAST(SUM(y * y) AS HUGEINT) AS syy,
         CAST(SUM(x * y) AS HUGEINT) AS sxy
  FROM pairs GROUP BY 1)
SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_pairs,
       CAST((1000000 * (n * sxy - sx * sy))
            // CAST(FLOOR(SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                               * CAST(n * syy - sy * sy AS DOUBLE)))
                    AS HUGEINT) AS BIGINT) AS ccf_ppm
FROM m
WHERE n >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
ORDER BY lag
"""
