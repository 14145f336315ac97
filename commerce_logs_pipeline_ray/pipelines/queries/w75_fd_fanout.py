"""Wave 75: principled binning and foreign-key fanout profiling.

* freedman_diaconis_histogram — the Freedman-Diaconis (1981) bin rule over
  order-total cents: width = round(2·IQR / n^(1/3)) with exact rank-based
  quartiles ((n+3)//4 and (3n+3)//4 by (cents, key)) and the cube root
  evaluated as POWER(n, 1/3) on BOTH engines (same libm pow, not cbrt);
  then the integer histogram (cents − min) // width.  Data-driven binning
  next to the fixed-width and equi-depth histograms already present.
* fk_fanout_profile — relationship cardinality profiling: children per
  parent for the three big FKs (order→lines, customer→orders,
  part→lines): min / max / mean_ppm fanout from one count exchange each.
"""
from __future__ import annotations

from ._base import _i64, _rd, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from ._base import grouped_sums  # noqa: F401


def q_freedman_diaconis_histogram(sf_dir: str) -> pd.DataFrame:
    """FD-width histogram of order totals: exact rank quartiles, mirrored
    POWER(n, 1/3) width, integer bin fold."""
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def conv(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({
            "k": t["o_orderkey"].to_numpy(zero_copy_only=False),
            "cents": pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                             pa.int64()).to_numpy(zero_copy_only=False)})

    df = orders.map_batches(conv, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
    n = len(df)
    if n < 4:
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ["bin", "lo_cents", "n_rows"]})
    order = np.lexsort((df["k"].to_numpy(np.int64),
                        df["cents"].to_numpy(np.int64)))
    s = df["cents"].to_numpy(np.int64)[order]
    q1 = int(s[(n + 3) // 4 - 1])
    q3 = int(s[(3 * n + 3) // 4 - 1])
    iqr = q3 - q1
    width = int(_rd(2.0 * iqr / np.power(float(n), 1.0 / 3.0), 0))
    if width <= 0:
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ["bin", "lo_cents", "n_rows"]})
    lo = int(s[0])
    b = (s - lo) // width
    uniq, cnt = np.unique(b, return_counts=True)
    out = pd.DataFrame({"bin": uniq.astype(np.int64),
                        "lo_cents": lo + uniq * width,
                        "n_rows": cnt.astype(np.int64)})
    return _i64(out, ["bin", "lo_cents", "n_rows"])


SQL_FREEDMAN_DIACONIS_HISTOGRAM = """
WITH c AS (
  SELECT o_orderkey AS k, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
r AS (
  SELECT cents, ROW_NUMBER() OVER (ORDER BY cents, k) AS rk,
         COUNT(*) OVER () AS n
  FROM c),
qs AS (
  SELECT MAX(CASE WHEN rk = (n + 3) // 4 THEN cents END) AS q1,
         MAX(CASE WHEN rk = (3 * n + 3) // 4 THEN cents END) AS q3,
         MAX(CASE WHEN rk = 1 THEN cents END) AS lo,
         MAX(n) AS n
  FROM r),
w AS (
  SELECT lo, n, CAST(ROUND(2.0 * (q3 - q1) / POWER(n, 1.0 / 3.0)) AS BIGINT)
         AS width
  FROM qs)
SELECT CAST((cents - w.lo) // w.width AS BIGINT) AS bin,
       CAST(w.lo + ((cents - w.lo) // w.width) * w.width AS BIGINT) AS lo_cents,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM c, w WHERE w.n >= 4 AND w.width > 0
GROUP BY 1, 2 ORDER BY 1
"""

_FK_PROFILES = [
    ("orders_lines", "lineitem", "l_orderkey"),
    ("customer_orders", "orders", "o_custkey"),
    ("part_lines", "lineitem", "l_partkey"),
]


def q_fk_fanout_profile(sf_dir: str) -> pd.DataFrame:
    """Children-per-parent fanout for three relationships: one key-count
    exchange each; min/max/mean_ppm on the output-bounded parent table."""
    rows = []
    for label, child_t, key in _FK_PROFILES:
        counts = grouped_sums(_t(sf_dir, child_t, [key]), [key], {},
                              count_name="n", reduce="driver").to_pandas()
        nvals = counts["n"].to_numpy(np.int64)
        total = int(nvals.sum())
        rows.append({"fk": label, "n_parents": len(nvals),
                     "min_fanout": int(nvals.min()),
                     "max_fanout": int(nvals.max()),
                     "mean_fanout_ppm": (1_000_000 * total) // len(nvals)})
    out = pd.DataFrame(rows).sort_values("fk", ignore_index=True)
    return _i64(out, ["n_parents", "min_fanout", "max_fanout",
                      "mean_fanout_ppm"])


SQL_FK_FANOUT_PROFILE = (
    "\nUNION ALL\n".join(
        f"""SELECT '{label}' AS fk,
       CAST(COUNT(*) AS BIGINT) AS n_parents,
       CAST(MIN(n) AS BIGINT) AS min_fanout,
       CAST(MAX(n) AS BIGINT) AS max_fanout,
       CAST((1000000 * SUM(n)) // COUNT(*) AS BIGINT) AS mean_fanout_ppm
FROM (SELECT {key}, COUNT(*) AS n FROM {child_t} GROUP BY 1)"""
        for label, child_t, key in _FK_PROFILES)
    + "\nORDER BY fk"
)
