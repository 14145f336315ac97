"""Wave 76: inventory classification and customer lifecycle matrices.

* abc_xyz_matrix — the ABC×XYZ inventory grid over parts: ABC from the
  cumulative-revenue-share rank (A ≤ 80 %, B ≤ 95 %, C rest — strict ppm
  thresholds on the running share) and XYZ from demand variability (the
  integer Fano-style dispersion of monthly quantities: X ≤ 0.5, Y ≤ 1.0,
  Z above — cross-multiplied, no floats).  Output: the 9-cell matrix with
  part counts and revenue share ppm per cell.
* value_tier_migration — year-over-year customer value-tier transitions:
  NTILE(3) spend tiers in 1996 and 1997 (ties by custkey), the 3×3
  transition matrix over customers active in both years.
"""
from __future__ import annotations

from ._base import _i64, _t, datetime, np, pa, pads, pc, pd, pq, rd  # noqa: F401
from ._base import grouped_sums  # noqa: F401


def q_abc_xyz_matrix(sf_dir: str) -> pd.DataFrame:
    """9-cell ABC×XYZ grid over parts with ≥2 active months."""
    def part(t: pa.Table) -> pd.DataFrame:
        month = pd.to_datetime(
            pc.cast(t["l_shipdate"], pa.int64()).to_numpy(zero_copy_only=False),
            unit="us")
        ep = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        q100 = np.rint(t["l_quantity"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        df = pd.DataFrame({"pk": t["l_partkey"].to_numpy(zero_copy_only=False),
                           "m": month.year.to_numpy() * 12 + month.month.to_numpy(),
                           "rev": ep, "q": q100})
        return df.groupby(["pk", "m"], as_index=False).sum()

    pm = grouped_sums(
        _t(sf_dir, "lineitem",
           ["l_partkey", "l_shipdate", "l_extendedprice", "l_quantity"]).map_batches(
            part, batch_format="pyarrow", zero_copy_batch=True),
        ["pk", "m"], {"rev": "rev", "q": "q"}, reduce="driver").to_pandas()

    per_part = (pm.groupby("pk", as_index=False)
                  .agg(rev=("rev", "sum"), n_m=("m", "size"),
                       sq=("q", "sum")))
    qq = pm.assign(q2=pm["q"].astype(object) ** 2).groupby("pk")["q2"].sum()
    per_part["sqq"] = per_part["pk"].map(qq)
    per_part = per_part[per_part["n_m"] >= 2].reset_index(drop=True)

    # ABC by cumulative revenue share (rank by rev desc, pk asc)
    per_part = per_part.sort_values(["rev", "pk"], ascending=[False, True],
                                    ignore_index=True)
    total_rev = int(per_part["rev"].sum())
    cum = per_part["rev"].cumsum().astype(object)
    share_ppm = (1_000_000 * cum) // total_rev
    abc = np.where(share_ppm <= 800_000, "A",
          np.where(share_ppm <= 950_000, "B", "C"))
    # XYZ: dispersion = (n·Σq² − (Σq)²) vs n·Σq (ratio bands 0.5 / 1.0 by
    # cross-multiplication: disp ≤ 0.5·mean ⟺ 2·(nΣq²−(Σq)²) ≤ n·Σq·... )
    n_m = per_part["n_m"].to_numpy(np.int64)
    sq = per_part["sq"].astype(object).to_numpy()
    sqq = per_part["sqq"].astype(object).to_numpy()
    var_n2 = np.array([int(n) * int(s2) - int(s) * int(s)
                       for n, s, s2 in zip(n_m, sq, sqq)], dtype=object)
    # variability index v = var_n2 / (n·mean²) = var_n2·n / (Σq)² ; bands
    # v ≤ 0.25 → X, ≤ 1.0 → Y, else Z (squared CV thresholds 0.5/1.0)
    lhs = np.array([int(vn) * int(n) for vn, n in zip(var_n2, n_m)], dtype=object)
    sq2 = np.array([int(s) * int(s) for s in sq], dtype=object)
    xyz = np.where(4 * lhs <= sq2, "X", np.where(lhs <= sq2, "Y", "Z"))

    per_part["cell"] = np.char.add(abc.astype(str), xyz.astype(str))
    g = (per_part.groupby("cell", as_index=False)
                 .agg(n_parts=("pk", "size"), rev=("rev", "sum")))
    g["rev_share_ppm"] = (1_000_000 * g["rev"].astype(object)) // total_rev
    out = g[["cell", "n_parts", "rev_share_ppm"]].sort_values(
        "cell", ignore_index=True)
    return _i64(out, ["n_parts", "rev_share_ppm"])


SQL_ABC_XYZ_MATRIX = """
WITH pm AS (
  SELECT l_partkey AS pk,
         CAST(EXTRACT(year FROM l_shipdate) * 12
              + EXTRACT(month FROM l_shipdate) AS BIGINT) AS m,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev,
         CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS q
  FROM lineitem GROUP BY 1, 2),
pp AS (
  SELECT pk, CAST(SUM(rev) AS HUGEINT) AS rev, COUNT(*) AS n_m,
         CAST(SUM(q) AS HUGEINT) AS sq, CAST(SUM(q * q) AS HUGEINT) AS sqq
  FROM pm GROUP BY 1 HAVING COUNT(*) >= 2),
tot AS (SELECT CAST(SUM(rev) AS HUGEINT) AS t FROM pp),
ranked AS (
  SELECT pp.*, tot.t,
         (1000000 * SUM(rev) OVER (ORDER BY rev DESC, pk
                                   ROWS UNBOUNDED PRECEDING)) // tot.t
           AS share_ppm
  FROM pp, tot),
cls AS (
  SELECT *,
    CASE WHEN share_ppm <= 800000 THEN 'A'
         WHEN share_ppm <= 950000 THEN 'B' ELSE 'C' END ||
    CASE WHEN 4 * ((n_m * sqq - sq * sq) * n_m) <= sq * sq THEN 'X'
         WHEN (n_m * sqq - sq * sq) * n_m <= sq * sq THEN 'Y'
         ELSE 'Z' END AS cell
  FROM ranked)
SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST((1000000 * SUM(rev)) // MAX(t) AS BIGINT) AS rev_share_ppm
FROM cls GROUP BY 1 ORDER BY 1
"""


def q_value_tier_migration(sf_dir: str) -> pd.DataFrame:
    """3×3 spend-tier transition matrix 1996→1997 over customers active in
    both years (NTILE tie rule by (spend DESC, custkey))."""
    from ...functions.rank import ntile_of

    expr = ((pads.field("o_orderdate") >= pa.scalar(datetime(1996, 1, 1), pa.timestamp("us")))
            & (pads.field("o_orderdate") < pa.scalar(datetime(1998, 1, 1), pa.timestamp("us"))))

    def part(t: pa.Table) -> pd.DataFrame:
        year = pd.to_datetime(
            pc.cast(t["o_orderdate"], pa.int64()).to_numpy(zero_copy_only=False),
            unit="us").year.to_numpy()
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"ck": t["o_custkey"].to_numpy(zero_copy_only=False),
                           "year": year, "cents": cents})
        return df.groupby(["ck", "year"], as_index=False).sum()

    spend = grouped_sums(
        _t(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"],
           filter=expr).map_batches(part, batch_format="pyarrow",
                                    zero_copy_batch=True),
        ["ck", "year"], {"cents": "cents"}, reduce="driver").to_pandas()
    piv = spend.pivot_table(index="ck", columns="year", values="cents",
                            aggfunc="sum").dropna()
    if piv.empty:
        return pd.DataFrame({c: pd.Series([], dtype="int64" if c != "cell"
                                          else "object")
                             for c in ["cell", "n_customers"]})
    n = len(piv)

    def tiers(v: np.ndarray, keys: np.ndarray) -> np.ndarray:
        order = np.lexsort((keys, -v))
        rn = np.empty(n, np.int64)
        rn[order] = np.arange(1, n + 1)
        return ntile_of(rn, n, 3)

    keys = piv.index.to_numpy(np.int64)
    t0 = tiers(piv[1996].to_numpy(np.int64), keys)
    t1 = tiers(piv[1997].to_numpy(np.int64), keys)
    cell = np.char.add(np.char.add(t0.astype("U1"), ">"), t1.astype("U1"))
    uniq, cnt = np.unique(cell, return_counts=True)
    out = pd.DataFrame({"cell": uniq, "n_customers": cnt.astype(np.int64)})
    out = out.sort_values("cell", ignore_index=True)
    return _i64(out, ["n_customers"])


SQL_VALUE_TIER_MIGRATION = """
WITH s AS (
  SELECT o_custkey AS ck, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders
  WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
  GROUP BY 1, 2),
yy AS (
  SELECT a.ck, a.cents AS c0, b.cents AS c1
  FROM s a JOIN s b ON b.ck = a.ck AND a.y = 1996 AND b.y = 1997),
t AS (
  SELECT ck, NTILE(3) OVER (ORDER BY c0 DESC, ck) AS t0,
         NTILE(3) OVER (ORDER BY c1 DESC, ck) AS t1
  FROM yy)
SELECT CAST(t0 AS VARCHAR) || '>' || CAST(t1 AS VARCHAR) AS cell,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM t GROUP BY 1 ORDER BY 1
"""
