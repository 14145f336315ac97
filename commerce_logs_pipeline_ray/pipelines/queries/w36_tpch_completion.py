"""Wave 36: TPC-H completion — the classic relational shapes not yet in the
registry, adapted to this star schema (no partsupp table, no commit/receipt
dates; cost analogs noted per query).  Q7 volume shipping, Q8 market share,
Q9 product profit, Q11 important parts, Q14 promotion effect, Q16 supplier
variety, Q18 large-volume customers, Q19 bracketed revenue, Q22 global sales
opportunity.

Money convention: revenue is computed in exact 10⁻⁴-dollar integer units —
u = ROUND(ep·100)·ROUND((1−disc)·100) — so every SUM is integer-exact on
both engines and the single float division/round at the end is bit-identical
(prices and discounts are cents-quantized in this corpus; sums stay far
inside int64 at test scale and inside HUGEINT in the oracle).
"""
from __future__ import annotations

from ._base import _i64, _rd, _t, broadcast_join, datetime, np, pa, pads, pc, pd, pq, rd  # noqa: F401
from ._base import grouped_sums, topk  # noqa: F401


def _rev_u(t: pa.Table) -> np.ndarray:
    """Exact integer revenue units: ROUND(ep·100)·ROUND((1−d)·100)."""
    ep = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
    dc = np.rint((1.0 - t["l_discount"].to_numpy(zero_copy_only=False)) * 100.0).astype(np.int64)
    return ep * dc


def _supp_nation_map(sf_dir: str):
    """suppkey → nation-name lookup (supplier is a dimension: 10k rows/SF —
    broadcast once via ray.put, binary-searched inside each batch)."""
    s = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]).to_pandas()
    n = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]).to_pandas()
    names = n.sort_values("n_nationkey")["n_name"].to_numpy()
    s = s.sort_values("s_suppkey")
    return s["s_suppkey"].to_numpy(np.int64), s["s_nationkey"].to_numpy(np.int64), names


def _cust_nation_map(sf_dir: str):
    c = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]).to_pandas()
    n = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]).to_pandas()
    names = n.sort_values("n_nationkey")["n_name"].to_numpy()
    c = c.sort_values("c_custkey")
    return c["c_custkey"].to_numpy(np.int64), c["c_nationkey"].to_numpy(np.int64), names


def q_volume_shipping(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q7 shape: revenue flow between supplier nation and customer
    nation per ship year, all cross-nation pairs.  Distributed shape: one
    lineitem scan with the broadcast supplier→nation map attached emits
    (orderkey, supp_nation, year, u) combiner partials; a hash join to
    orders attaches o_custkey; the broadcast customer→nation map resolves
    the other side; one output-bounded grouped reduce (≤ |nations|²·years
    rows)."""
    import ray as _ray

    from ...functions.relational import auto_join

    sk, snk, names = _supp_nation_map(sf_dir)
    smap_ref = _ray.put((sk, snk))

    li = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def part(t: pa.Table) -> pd.DataFrame:
        keys, nk = _ray.get(smap_ref)
        sup = t["l_suppkey"].to_numpy(zero_copy_only=False)
        snat = nk[np.searchsorted(keys, sup)]
        yr = pc.year(t["l_shipdate"]).to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"l_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False),
                           "sn": snat, "l_year": yr, "u": _rev_u(t), "n": 1})
        return df.groupby(["l_orderkey", "sn", "l_year"], as_index=False).sum()

    partials = li.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    joined = auto_join(partials, orders, on="l_orderkey", right_on="o_orderkey")

    ck, cnk, _ = _cust_nation_map(sf_dir)
    cmap_ref = _ray.put((ck, cnk))

    def attach_cust(t: pa.Table) -> pd.DataFrame:
        keys, nk = _ray.get(cmap_ref)
        cn = nk[np.searchsorted(keys, t["o_custkey"].to_numpy(zero_copy_only=False))]
        df = pd.DataFrame({"sn": t["sn"].to_numpy(zero_copy_only=False), "cn": cn,
                           "l_year": t["l_year"].to_numpy(zero_copy_only=False),
                           "u": t["u"].to_numpy(zero_copy_only=False),
                           "n": t["n"].to_numpy(zero_copy_only=False)})
        df = df[df["sn"] != df["cn"]]
        return df.groupby(["sn", "cn", "l_year"], as_index=False).sum()

    agg = grouped_sums(
        joined.map_batches(attach_cust, batch_format="pyarrow", zero_copy_batch=True),
        ["sn", "cn", "l_year"], {"u": "u", "n": "n"}, reduce="driver").to_pandas()
    agg["supp_nation"] = names[agg["sn"].to_numpy(np.int64)]
    agg["cust_nation"] = names[agg["cn"].to_numpy(np.int64)]
    agg["revenue"] = (agg["u"] / 10000.0).pipe(_rd, 2)
    out = agg[["supp_nation", "cust_nation", "l_year", "revenue", "n"]]
    out = out.sort_values(["supp_nation", "cust_nation", "l_year"], ignore_index=True)
    return _i64(out, ["l_year", "n"])


SQL_VOLUME_SHIPPING = """
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * CAST(ROUND((1 - l_discount) * 100) AS BIGINT) AS u,
         EXTRACT(year FROM l_shipdate) AS l_year
  FROM lineitem)
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(l_year AS BIGINT) AS l_year,
       ROUND(SUM(u) / 10000.0, 2) AS revenue, COUNT(*) AS n
FROM li
JOIN supplier s ON s.s_suppkey = li.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = li.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
WHERE sn.n_name <> cn.n_name
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


_Q8_REGION = "ASIA"
_Q8_NATION = "NATION_7"


def q_market_share(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q8 shape: the target nation's share of supplier revenue among
    the target region's customers per ORDER year.  Same join plan as Q7;
    numerator and denominator are exact integer sums, the share is the
    single float division (bit-identical both engines)."""
    import ray as _ray

    from ...functions.relational import auto_join

    sk, snk, names = _supp_nation_map(sf_dir)
    target_nk = int(np.where(names == _Q8_NATION)[0][0])
    smap_ref = _ray.put((sk, snk))

    li = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def part(t: pa.Table) -> pd.DataFrame:
        keys, nk = _ray.get(smap_ref)
        snat = nk[np.searchsorted(keys, t["l_suppkey"].to_numpy(zero_copy_only=False))]
        u = _rev_u(t)
        df = pd.DataFrame({"l_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False),
                           "u": u, "nu": np.where(snat == target_nk, u, 0)})
        return df.groupby("l_orderkey", as_index=False).sum()

    partials = li.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    joined = auto_join(partials, orders, on="l_orderkey", right_on="o_orderkey")

    # customers restricted to the region
    n = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    r = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    region_nk = set(n.merge(r, left_on="n_regionkey", right_on="r_regionkey")
                    .query("r_name == @_Q8_REGION")["n_nationkey"])
    ck, cnk, _ = _cust_nation_map(sf_dir)
    in_region = np.isin(cnk, list(region_nk))
    cmap_ref = _ray.put((ck, in_region))

    def reduce_year(t: pa.Table) -> pd.DataFrame:
        keys, keep = _ray.get(cmap_ref)
        m = keep[np.searchsorted(keys, t["o_custkey"].to_numpy(zero_copy_only=False))]
        yr = pc.year(t["o_orderdate"]).to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"o_year": yr[m],
                           "u": t["u"].to_numpy(zero_copy_only=False)[m],
                           "nu": t["nu"].to_numpy(zero_copy_only=False)[m]})
        return df.groupby("o_year", as_index=False).sum()

    agg = grouped_sums(
        joined.map_batches(reduce_year, batch_format="pyarrow", zero_copy_batch=True),
        ["o_year"], {"u": "u", "nu": "nu"}, reduce="driver").to_pandas()
    agg["mkt_share"] = pd.Series(
        [_rd(nu / u, 6) for nu, u in zip(agg["nu"], agg["u"])], index=agg.index)
    out = agg[["o_year", "mkt_share"]].sort_values("o_year", ignore_index=True)
    return _i64(out, ["o_year"])


SQL_MARKET_SHARE = f"""
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * CAST(ROUND((1 - l_discount) * 100) AS BIGINT) AS u
  FROM lineitem),
j AS (
  SELECT EXTRACT(year FROM o.o_orderdate) AS o_year, li.u,
         CASE WHEN sn.n_name = '{_Q8_NATION}' THEN li.u ELSE 0 END AS nu
  FROM li
  JOIN supplier s ON s.s_suppkey = li.l_suppkey
  JOIN nation sn ON sn.n_nationkey = s.s_nationkey
  JOIN orders o ON o.o_orderkey = li.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = cn.n_regionkey
  WHERE r.r_name = '{_Q8_REGION}')
SELECT CAST(o_year AS BIGINT) AS o_year,
       ROUND(SUM(nu) / (1.0 * SUM(u)), 6) AS mkt_share
FROM j GROUP BY 1 ORDER BY 1
"""


_Q9_TYPE = "ECONOMY"


def q_product_profit(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q9 shape: profit per supplier nation per ship year over parts
    of one type.  No partsupp table in this schema, so cost is adapted to
    quantity · p_retailprice (stated identically in the oracle): profit_u =
    rev_u − qty·retail_cents·100, all integer.  One lineitem scan with two
    broadcast dimension maps (part type/retail, supplier nation); the only
    exchange is the (nation, year) partial reduce."""
    import ray as _ray

    sk, snk, names = _supp_nation_map(sf_dir)
    p = pq.read_table(f"{sf_dir}/part.parquet",
                      columns=["p_partkey", "p_type", "p_retailprice"]).to_pandas()
    p = p.sort_values("p_partkey")
    pk = p["p_partkey"].to_numpy(np.int64)
    is_type = (p["p_type"] == _Q9_TYPE).to_numpy()
    retail_c = np.rint(p["p_retailprice"].to_numpy() * 100.0).astype(np.int64)
    maps_ref = _ray.put((sk, snk, pk, is_type, retail_c))

    li = _t(sf_dir, "lineitem",
            ["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
             "l_discount", "l_shipdate"])

    def part(t: pa.Table) -> pd.DataFrame:
        skk, nk, pkk, istype, rc = _ray.get(maps_ref)
        pidx = np.searchsorted(pkk, t["l_partkey"].to_numpy(zero_copy_only=False))
        m = istype[pidx]
        if not m.any():
            return pd.DataFrame({"nation_k": pd.Series([], dtype="int64"),
                                 "o_year": pd.Series([], dtype="int64"),
                                 "profit_u": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        qty = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)[m]
        cost_u = qty * rc[pidx[m]] * 100
        u = _rev_u(t)[m]
        snat = nk[np.searchsorted(skk, t["l_suppkey"].to_numpy(zero_copy_only=False)[m])]
        yr = pc.year(t["l_shipdate"]).to_numpy(zero_copy_only=False).astype(np.int64)[m]
        df = pd.DataFrame({"nation_k": snat, "o_year": yr,
                           "profit_u": u - cost_u, "n": 1})
        return df.groupby(["nation_k", "o_year"], as_index=False).sum()

    agg = grouped_sums(
        li.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["nation_k", "o_year"], {"profit_u": "profit_u", "n": "n"},
        reduce="driver").to_pandas()
    agg["nation"] = names[agg["nation_k"].to_numpy(np.int64)]
    agg["profit"] = (agg["profit_u"] / 10000.0).pipe(_rd, 2)
    out = agg[["nation", "o_year", "profit", "n"]]
    out = out.sort_values(["nation", "o_year"], ignore_index=True)
    return _i64(out, ["o_year", "n"])


SQL_PRODUCT_PROFIT = f"""
WITH li AS (
  SELECT l_partkey, l_suppkey,
         EXTRACT(year FROM l_shipdate) AS o_year,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)
           - CAST(l_quantity AS BIGINT)
             * CAST(ROUND(p_retailprice * 100) AS BIGINT) * 100 AS profit_u
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_type = '{_Q9_TYPE}')
SELECT n.n_name AS nation, CAST(o_year AS BIGINT) AS o_year,
       ROUND(SUM(profit_u) / 10000.0, 2) AS profit, COUNT(*) AS n
FROM li
JOIN supplier s ON s.s_suppkey = li.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
GROUP BY 1, 2 ORDER BY 1, 2
"""


_Q11_NATION = "NATION_7"


def q_important_parts(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q11 shape: parts representing a significant value share among
    one nation's suppliers — value_u per part over lineitem of the target
    nation's suppliers, kept when value_u > total_u // 1000 (integer
    floor-division threshold, overflow-free and identical in SQL).  The
    per-part reduce is output-bounded; the scalar total folds from the same
    partials."""
    import ray as _ray

    sk, snk, names = _supp_nation_map(sf_dir)
    target_nk = int(np.where(names == _Q11_NATION)[0][0])
    keep_sup = np.sort(sk[snk == target_nk])
    sup_ref = _ray.put(keep_sup)

    li = _t(sf_dir, "lineitem",
            ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def part(t: pa.Table) -> pd.DataFrame:
        keep = _ray.get(sup_ref)
        sup = t["l_suppkey"].to_numpy(zero_copy_only=False)
        if len(keep):
            idx = np.searchsorted(keep, sup)
            idx[idx == len(keep)] = 0
            m = keep[idx] == sup
        else:
            m = np.zeros(len(sup), bool)
        df = pd.DataFrame({"l_partkey": t["l_partkey"].to_numpy(zero_copy_only=False)[m],
                           "value_u": _rev_u(t)[m]})
        return df.groupby("l_partkey", as_index=False).sum()

    per_part = li.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    if per_part.empty:
        # the nation has no suppliers at this SF — degrade like the oracle
        return pd.DataFrame({"l_partkey": pd.Series([], dtype="int64"),
                             "value": pd.Series([], dtype="float64")})
    per_part = per_part.groupby("l_partkey", as_index=False)["value_u"].sum()
    total = int(per_part["value_u"].sum())
    out = per_part[per_part["value_u"] > total // 1000].copy()
    out["value"] = (out["value_u"] / 10000.0).pipe(_rd, 2)
    out = out[["l_partkey", "value"]].sort_values(
        ["value", "l_partkey"], ascending=[False, True], ignore_index=True)
    return _i64(out, ["l_partkey"])


SQL_IMPORTANT_PARTS = f"""
WITH li AS (
  SELECT l_partkey,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * CAST(ROUND((1 - l_discount) * 100) AS BIGINT) AS u
  FROM lineitem
  JOIN supplier s ON s.s_suppkey = lineitem.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = '{_Q11_NATION}'),
pv AS (SELECT l_partkey, CAST(SUM(u) AS BIGINT) AS value_u FROM li GROUP BY 1),
tot AS (SELECT CAST(SUM(u) AS BIGINT) AS total_u FROM li)
SELECT l_partkey, ROUND(value_u / 10000.0, 2) AS value
FROM pv, tot WHERE value_u > total_u // 1000
ORDER BY value DESC, l_partkey
"""


def q_promo_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q14 shape: PROMO-type revenue share per ship month.  The part
    type map broadcasts once; numerator/denominator are integer sums per
    month, the percentage is the single float expression (written
    identically in SQL)."""
    import ray as _ray

    p = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]).to_pandas()
    p = p.sort_values("p_partkey")
    pmap_ref = _ray.put((p["p_partkey"].to_numpy(np.int64),
                         (p["p_type"] == "PROMO").to_numpy()))

    li = _t(sf_dir, "lineitem",
            ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def part(t: pa.Table) -> pd.DataFrame:
        keys, promo = _ray.get(pmap_ref)
        isp = promo[np.searchsorted(keys, t["l_partkey"].to_numpy(zero_copy_only=False))]
        u = _rev_u(t)
        ym = (pc.year(t["l_shipdate"]).to_numpy(zero_copy_only=False).astype(np.int64) * 100
              + pc.month(t["l_shipdate"]).to_numpy(zero_copy_only=False).astype(np.int64))
        df = pd.DataFrame({"ship_month": ym, "u": u, "pu": np.where(isp, u, 0)})
        return df.groupby("ship_month", as_index=False).sum()

    agg = grouped_sums(
        li.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["ship_month"], {"u": "u", "pu": "pu"}, reduce="driver").to_pandas()
    agg["promo_pct"] = pd.Series(
        [_rd(100.0 * pu / u, 6) for pu, u in zip(agg["pu"], agg["u"])], index=agg.index)
    out = agg[["ship_month", "promo_pct"]].sort_values("ship_month", ignore_index=True)
    return _i64(out, ["ship_month"])


SQL_PROMO_REVENUE = """
WITH li AS (
  SELECT EXTRACT(year FROM l_shipdate) * 100 + EXTRACT(month FROM l_shipdate)
           AS ship_month,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * CAST(ROUND((1 - l_discount) * 100) AS BIGINT) AS u,
         p_type
  FROM lineitem JOIN part ON p_partkey = l_partkey)
SELECT CAST(ship_month AS BIGINT) AS ship_month,
       ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO' THEN u ELSE 0 END)
             / SUM(u), 6) AS promo_pct
FROM li GROUP BY 1 ORDER BY 1
"""


_Q16_EXCLUDED_BRAND = "Brand#9"


def q_supplier_variety(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q16 shape (no partsupp: supplier↔part links come from shipped
    lineitem): distinct supplier count per (brand, type, size), excluding
    one brand, top-20.  Distinct (part, supplier) pairs reduce first (the
    only fact-sized exchange), dimensions broadcast on, then a second
    distinct collapses same-dimension parts before the count."""
    pairs = grouped_sums(
        _t(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]),
        ["l_partkey", "l_suppkey"], {})
    dims = pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_type", "p_size"]).rename_columns(
        ["l_partkey", "p_brand", "p_type", "p_size"])
    joined = broadcast_join(pairs, dims, "l_partkey")
    joined = joined.filter(expr=f"p_brand != '{_Q16_EXCLUDED_BRAND}'")
    dsupp = grouped_sums(joined, ["p_brand", "p_type", "p_size", "l_suppkey"], {})
    cnt = grouped_sums(dsupp.select_columns(["p_brand", "p_type", "p_size"]),
                       ["p_brand", "p_type", "p_size"], {}, "supplier_cnt")
    out = topk(cnt, ["supplier_cnt", "p_brand", "p_type", "p_size"],
               [True, False, False, False], 20).to_pandas()
    return _i64(out, ["p_size", "supplier_cnt"])


SQL_SUPPLIER_VARIETY = f"""
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
d AS (
  SELECT DISTINCT p_brand, p_type, p_size, l_suppkey
  FROM pairs JOIN part ON p_partkey = l_partkey
  WHERE p_brand <> '{_Q16_EXCLUDED_BRAND}')
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       COUNT(*) AS supplier_cnt
FROM d GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 20
"""


_Q18_QTY = 200


def q_large_volume_customers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity exceeds the
    threshold, top-20 by total price with the customer attached.  Per-order
    quantity pre-aggregates (integer), the filter prunes before the orders
    join, and the customer name map broadcasts."""
    import ray as _ray

    from ...functions.relational import auto_join

    qty = grouped_sums(
        _t(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]),
        ["l_orderkey"], {"total_qty": "l_quantity"})

    def to_int(t: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "total_qty": pc.cast(t["total_qty"], pa.int64())})

    big = qty.map_batches(to_int, batch_format="pyarrow",
                          zero_copy_batch=True).filter(expr=f"total_qty > {_Q18_QTY}")
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    joined = auto_join(big, orders, on="l_orderkey", right_on="o_orderkey")

    c = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]).to_pandas()
    c = c.sort_values("c_custkey")
    cmap_ref = _ray.put((c["c_custkey"].to_numpy(np.int64), c["c_name"].to_numpy()))

    def attach_name(t: pa.Table) -> pd.DataFrame:
        keys, nm = _ray.get(cmap_ref)
        cidx = np.searchsorted(keys, t["o_custkey"].to_numpy(zero_copy_only=False))
        return pd.DataFrame({"c_name": nm[cidx],
                             "c_custkey": t["o_custkey"].to_numpy(zero_copy_only=False),
                             "o_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False),
                             "o_totalprice": t["o_totalprice"].to_numpy(zero_copy_only=False),
                             "total_qty": t["total_qty"].to_numpy(zero_copy_only=False)})

    named = joined.map_batches(attach_name, batch_format="pyarrow", zero_copy_batch=True)
    out = topk(named, ["o_totalprice", "o_orderkey"], [True, False], 20).to_pandas()
    out = out[["c_name", "c_custkey", "o_orderkey", "o_totalprice", "total_qty"]]
    return _i64(out, ["c_custkey", "o_orderkey", "total_qty"])


SQL_LARGE_VOLUME_CUSTOMERS = f"""
WITH q AS (
  SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > {_Q18_QTY})
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_totalprice, q.total_qty
FROM q JOIN orders o ON o.o_orderkey = q.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 20
"""


def q_bracketed_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q19 shape: revenue from three OR'd (brand, size-range,
    quantity-range) brackets — the classic multi-predicate join filter.
    Part dimensions broadcast; the bracket masks are pure vectorized
    integer/equality kernels; a single scalar partial per batch."""
    import ray as _ray

    p = pq.read_table(f"{sf_dir}/part.parquet",
                      columns=["p_partkey", "p_brand", "p_size"]).to_pandas()
    p = p.sort_values("p_partkey")
    pmap_ref = _ray.put((p["p_partkey"].to_numpy(np.int64),
                         p["p_brand"].to_numpy(), p["p_size"].to_numpy(np.int64)))

    li = _t(sf_dir, "lineitem",
            ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])

    def part(t: pa.Table) -> pd.DataFrame:
        keys, brand, size = _ray.get(pmap_ref)
        idx = np.searchsorted(keys, t["l_partkey"].to_numpy(zero_copy_only=False))
        b, s = brand[idx], size[idx]
        q = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = (((b == "Brand#1") & (s >= 1) & (s <= 5) & (q >= 1) & (q <= 11))
             | ((b == "Brand#2") & (s >= 1) & (s <= 10) & (q >= 10) & (q <= 20))
             | ((b == "Brand#3") & (s >= 1) & (s <= 15) & (q >= 20) & (q <= 30)))
        return pd.DataFrame({"g": [0], "u": [int(_rev_u(t)[m].sum())],
                             "n": [int(m.sum())]})

    agg = grouped_sums(
        li.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["g"], {"u": "u", "n": "n"}, reduce="driver").to_pandas()
    out = pd.DataFrame({"revenue": (agg["u"] / 10000.0).pipe(_rd, 2), "n": agg["n"]})
    return _i64(out, ["n"])


SQL_BRACKETED_REVENUE = """
SELECT ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                 * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)) / 10000.0, 2)
         AS revenue,
       COUNT(*) AS n
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


_Q22_CUTOFF = datetime(2001, 1, 1)


def q_global_sales_opportunity(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance and
    no RECENT orders (none on/after the cutoff — this corpus leaves almost
    no customer with zero orders ever, so the anti-join is on recency, same
    churn semantics), counted per nation.  The average threshold is an
    integer-exact cross-multiplication (bal_c·n_pos > total_pos_c); the
    recent-buyer set reduces distinct on the date-pruned fact side and
    broadcasts (the output-bounded anti-join shape shared with
    customers_without_orders); the customer table itself is scanned
    DISTRIBUTED — two passes, scalar partials then per-nation partials."""
    import ray as _ray

    expr = pads.field("o_orderdate") >= pa.scalar(_Q22_CUTOFF, pa.timestamp("us"))
    has = grouped_sums(
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"],
                        filter=expr),
        ["o_custkey"], {}, reduce="driver").to_pandas()
    has_keys = np.sort(has["o_custkey"].to_numpy(np.int64))
    has_ref = _ray.put(has_keys)

    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])

    def pos_part(t: pa.Table) -> pd.DataFrame:
        bal_c = np.rint(t["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        pos = bal_c > 0
        return pd.DataFrame({"g": [0], "n_pos": [int(pos.sum())],
                             "total_pos": [int(bal_c[pos].sum())]})

    tot = grouped_sums(
        cust.map_batches(pos_part, batch_format="pyarrow", zero_copy_batch=True),
        ["g"], {"n_pos": "n_pos", "total_pos": "total_pos"}, reduce="driver").to_pandas()
    n_pos, total_pos = int(tot["n_pos"][0]), int(tot["total_pos"][0])

    def keep_part(t: pa.Table) -> pd.DataFrame:
        keys = _ray.get(has_ref)
        ck = t["c_custkey"].to_numpy(zero_copy_only=False)
        bal_c = np.rint(t["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        idx = np.searchsorted(keys, ck)
        idx[idx == len(keys)] = 0
        no_orders = keys[idx] != ck if len(keys) else np.ones(len(ck), bool)
        keep = no_orders & (bal_c * n_pos > total_pos)
        df = pd.DataFrame({"nk": t["c_nationkey"].to_numpy(zero_copy_only=False)[keep],
                           "n_custs": 1, "total_c": bal_c[keep]})
        return df.groupby("nk", as_index=False).sum()

    kept = cust.map_batches(keep_part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    if kept.empty:
        # all-filtered corpora (tiny SFs) — degrade like the oracle's 0 rows
        return pd.DataFrame({"nation": pd.Series([], dtype=object),
                             "n_custs": pd.Series([], dtype="int64"),
                             "total_acctbal": pd.Series([], dtype="float64")})
    g = kept.groupby("nk", as_index=False)[["n_custs", "total_c"]].sum()
    n = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    names = n.sort_values("n_nationkey")["n_name"].to_numpy()
    g["nation"] = names[g["nk"].to_numpy(np.int64)]
    g["total_acctbal"] = (g["total_c"] / 100.0).pipe(_rd, 2)
    out = g[["nation", "n_custs", "total_acctbal"]].sort_values("nation", ignore_index=True)
    return _i64(out, ["n_custs"])


SQL_GLOBAL_SALES_OPPORTUNITY = """
WITH b AS (
  SELECT c_custkey, c_nationkey,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_c
  FROM customer),
avgpos AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pos, CAST(SUM(bal_c) AS BIGINT) AS total_pos
  FROM b WHERE bal_c > 0),
k AS (
  SELECT b.* FROM b, avgpos
  WHERE b.bal_c * avgpos.n_pos > avgpos.total_pos
    AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = b.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2001-01-01'))
SELECT n.n_name AS nation, COUNT(*) AS n_custs,
       ROUND(SUM(bal_c) / 100.0, 2) AS total_acctbal
FROM k JOIN nation n ON n.n_nationkey = k.c_nationkey
GROUP BY 1 ORDER BY 1
"""
