"""Wave 38: TPC-H final trio — the last three classic shapes missing from
the registry, adapted to this star schema (no partsupp, no commit/receipt
dates; analog conventions follow waves 36/37).

* top_revenue_supplier — Q15: the revenue view over a fixed 3-month ship
  window, returning EVERY supplier tied at the maximum (the spec's
  correlated max, not a LIMIT 1).
* dominant_part_suppliers — Q20 shape: partsupp availability is replaced by
  shipped quantity share — suppliers who shipped a strict majority of a
  qualifying part's total 1996 volume (p_size ≤ 25 stands in for the
  name-prefix part subset).
* waiting_suppliers — Q21 shape: lateness = shipped > 90 days after the
  order date (the wave-37 convention); suppliers who were the ONLY late
  supplier on a finished ('F') multi-supplier order, top-25 by count.

Money/quantity convention follows wave 36: integer 10⁻⁴-dollar revenue
units and integer centi-quantity units, so every SUM is integer-exact on
both engines (reference parity: the three queries mirror TPC-H Q15/Q20/Q21
semantics the reference's analytics consumers run downstream of extraction).
"""
from __future__ import annotations

from ._base import _i64, _rd, _t, datetime, np, pa, pads, pc, pd, pq, rd  # noqa: F401
from ._base import grouped_sums  # noqa: F401

_Q15_LO = datetime(1996, 1, 1)
_Q15_HI = datetime(1996, 4, 1)


def _rev_u(t: pa.Table) -> np.ndarray:
    ep = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
    dc = np.rint((1.0 - t["l_discount"].to_numpy(zero_copy_only=False)) * 100.0).astype(np.int64)
    return ep * dc


def q_top_revenue_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q15: supplier(s) with the maximum revenue over one ship
    quarter — ALL ties kept (correlated max, not LIMIT 1).  One pushed-down
    lineitem scan emits per-batch (suppkey, u) combiners; the per-supplier
    reduce is output-bounded (|suppliers| rows); the max + tie filter runs
    on that reduced table; names attach from the broadcast-sized dimension."""
    expr = ((pads.field("l_shipdate") >= pa.scalar(_Q15_LO, pa.timestamp("us")))
            & (pads.field("l_shipdate") < pa.scalar(_Q15_HI, pa.timestamp("us"))))
    li = _t(sf_dir, "lineitem",
            ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
            filter=expr)

    def part(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"l_suppkey": t["l_suppkey"].to_numpy(zero_copy_only=False),
                           "r_u": _rev_u(t)})
        return df.groupby("l_suppkey", as_index=False).sum()

    rev = grouped_sums(
        li.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["l_suppkey"], {"r_u": "r_u"}, reduce="driver").to_pandas()
    cols = ["s_suppkey", "s_name", "total_revenue"]
    if rev.empty:
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype="int64"),
                             "s_name": pd.Series([], dtype="object"),
                             "total_revenue": pd.Series([], dtype="float64")})
    best = rev[rev["r_u"] == rev["r_u"].max()]
    s = pq.read_table(f"{sf_dir}/supplier.parquet",
                      columns=["s_suppkey", "s_name"]).to_pandas()
    out = best.merge(s, left_on="l_suppkey", right_on="s_suppkey")
    out["total_revenue"] = (out["r_u"] / 10000.0).pipe(_rd, 2)
    out = out[cols].sort_values("s_suppkey", ignore_index=True)
    return _i64(out, ["s_suppkey"])


SQL_TOP_REVENUE_SUPPLIER = """
WITH rev AS (
  SELECT l_suppkey, CAST(SUM(
    CAST(ROUND(l_extendedprice * 100) AS BIGINT)
      * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS r_u
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY 1)
SELECT s_suppkey, s_name, ROUND(r_u / 10000.0, 2) AS total_revenue
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE r_u = (SELECT MAX(r_u) FROM rev)
ORDER BY s_suppkey
"""

_Q20_MAX_SIZE = 25
_Q20_LO = datetime(1996, 1, 1)
_Q20_HI = datetime(1997, 1, 1)


def q_dominant_part_suppliers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q20 shape: suppliers who shipped a strict majority of a
    qualifying part's (p_size ≤ 25) total 1996 centi-quantity.  The
    qualifying-part set broadcasts once; (part, supplier) combiners reduce
    distributed; the per-part majority test runs inside a part-keyed bucket
    exchange (2·pair > total by integer comparison), so no per-pair table
    reaches the driver — only the distinct winning suppliers."""
    import ray as _ray

    from ...functions.relational import bucketed_group_reduce

    p = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size"])
    okp = np.sort(p["p_partkey"].to_numpy(zero_copy_only=False)[
        p["p_size"].to_numpy(zero_copy_only=False) <= _Q20_MAX_SIZE].astype(np.int64))
    okp_ref = _ray.put(okp)

    expr = ((pads.field("l_shipdate") >= pa.scalar(_Q20_LO, pa.timestamp("us")))
            & (pads.field("l_shipdate") < pa.scalar(_Q20_HI, pa.timestamp("us"))))
    li = _t(sf_dir, "lineitem",
            ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"], filter=expr)

    def part(t: pa.Table) -> pd.DataFrame:
        ok = _ray.get(okp_ref)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        if len(ok):
            i = np.searchsorted(ok, pk)
            i[i == len(ok)] = 0
            m = ok[i] == pk
        else:
            m = np.zeros(len(pk), bool)
        q100 = np.rint(t["l_quantity"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        df = pd.DataFrame({"l_partkey": pk[m],
                           "l_suppkey": t["l_suppkey"].to_numpy(zero_copy_only=False)[m],
                           "q100": q100[m]})
        return df.groupby(["l_partkey", "l_suppkey"], as_index=False).sum()

    pairs = grouped_sums(
        li.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["l_partkey", "l_suppkey"], {"q100": "q100"})

    def majority(df: pd.DataFrame) -> pd.DataFrame:
        tot = df.groupby("l_partkey")["q100"].transform("sum")
        win = df[2 * df["q100"] > tot]
        return win[["l_suppkey"]].drop_duplicates()

    win = bucketed_group_reduce(pairs, ["l_partkey"], majority).to_pandas()
    s = pq.read_table(f"{sf_dir}/supplier.parquet",
                      columns=["s_suppkey", "s_name"]).to_pandas()
    if win.empty:
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype="int64"),
                             "s_name": pd.Series([], dtype="object")})
    out = (win.drop_duplicates()
              .merge(s, left_on="l_suppkey", right_on="s_suppkey")
              [["s_suppkey", "s_name"]]
              .sort_values("s_suppkey", ignore_index=True))
    return _i64(out, ["s_suppkey"])


SQL_DOMINANT_PART_SUPPLIERS = f"""
WITH q AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS q100
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_size <= {_Q20_MAX_SIZE}
    AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  GROUP BY 1, 2),
tot AS (SELECT l_partkey, CAST(SUM(q100) AS BIGINT) AS t100 FROM q GROUP BY 1)
SELECT DISTINCT s_suppkey, s_name
FROM q JOIN tot USING (l_partkey) JOIN supplier ON s_suppkey = l_suppkey
WHERE 2 * q100 > t100
ORDER BY s_suppkey
"""

_Q21_LATE_DAYS = 90
_Q21_TOPK = 25


def q_waiting_suppliers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late supplier
    (ship > order date + 90 days) on a finished ('F') multi-supplier order,
    counted per supplier, top-25 by (count DESC, name ASC).  The size-aware
    planner joins lineitem→orders; per-(order, supplier) late flags reduce
    as distributed combiners; the only-late/multi-supplier test runs inside
    an order-keyed bucket exchange; per-supplier counts are output-bounded."""
    from ...functions.relational import auto_join, bucketed_group_reduce

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"])
    expr = pads.field("o_orderstatus") == "F"
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderstatus"],
                filter=expr)
    joined = auto_join(li, orders, on="l_orderkey", right_on="o_orderkey")
    late_us = _Q21_LATE_DAYS * 86_400_000_000

    def part(t: pa.Table) -> pd.DataFrame:
        ship = pc.cast(t["l_shipdate"], pa.int64()).to_numpy(zero_copy_only=False)
        od = pc.cast(t["o_orderdate"], pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"l_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False),
                           "l_suppkey": t["l_suppkey"].to_numpy(zero_copy_only=False),
                           "n_late": ((ship - od) > late_us).astype(np.int64)})
        return df.groupby(["l_orderkey", "l_suppkey"], as_index=False).sum()

    pairs = grouped_sums(
        joined.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["l_orderkey", "l_suppkey"], {"n_late": "n_late"})

    def only_late(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_orderkey")
        n_supp = g["l_suppkey"].transform("size")
        n_late_supp = g["n_late"].transform(lambda s: (s > 0).sum())
        keep = (df["n_late"] > 0) & (n_late_supp == 1) & (n_supp > 1)
        out = df.loc[keep, ["l_suppkey"]].copy()
        out["numwait"] = 1
        return out.groupby("l_suppkey", as_index=False).sum()

    waits = bucketed_group_reduce(pairs, ["l_orderkey"], only_late)
    agg = grouped_sums(waits, ["l_suppkey"], {"numwait": "numwait"},
                       reduce="driver").to_pandas()
    s = pq.read_table(f"{sf_dir}/supplier.parquet",
                      columns=["s_suppkey", "s_name"]).to_pandas()
    if agg.empty:
        return pd.DataFrame({"s_name": pd.Series([], dtype="object"),
                             "numwait": pd.Series([], dtype="int64")})
    out = (agg.merge(s, left_on="l_suppkey", right_on="s_suppkey")
              [["s_name", "numwait"]]
              .sort_values(["numwait", "s_name"], ascending=[False, True],
                           ignore_index=True)
              .head(_Q21_TOPK))
    return _i64(out, ["numwait"])


SQL_WAITING_SUPPLIERS = f"""
WITH pairs AS (
  SELECT l_orderkey AS ok, l_suppkey AS sk,
         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL {_Q21_LATE_DAYS} DAY
             THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2),
ord AS (
  SELECT ok, COUNT(*) AS n_supp, SUM(late) AS n_late FROM pairs GROUP BY 1)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM pairs JOIN ord USING (ok) JOIN supplier ON s_suppkey = sk
WHERE late = 1 AND n_late = 1 AND n_supp > 1
GROUP BY 1
ORDER BY numwait DESC, s_name
LIMIT {_Q21_TOPK}
"""
