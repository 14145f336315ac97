"""Wave 54: graph-level mixing statistics and economic price indices.

* degree_assortativity — Newman's (2002) degree-assortativity coefficient
  of the co-purchase graph as an EXACT rational: with M edges, T = Σ(j+k),
  U = Σ(j²+k²), V = Σjk over edge-endpoint degrees, r = (4MV − T²) /
  (2MU − T²), reported as a truncating ppm quantization — no floats
  anywhere.  Degrees and the three moments fold from the SHARED edge
  artifact; the final algebra is Python-int (HUGEINT parity, T² exceeds
  int64 at scale).
* price_index_laspeyres — the Laspeyres fixed-basket price index per brand
  between two ship years: per-item yearly unit prices quantized by
  truncating division (rev·100 // qty100, DuckDB `//` parity), index =
  10⁶·Σp₁q₀ // Σp₀q₀ over items traded in BOTH years.
"""
from __future__ import annotations

from ._base import _i64, _t, datetime, np, pa, pads, pc, pd, pq, rd  # noqa: F401
from ._base import ORACLE_ARTIFACT_DIR, grouped_sums  # noqa: F401


def _tdiv(a: int, d: int) -> int:
    q = abs(a) // abs(d)
    return q if (a >= 0) == (d > 0) else -q


def q_degree_assortativity(sf_dir: str) -> pd.DataFrame:
    """Degree assortativity of the co-purchase graph, exact ppm: degrees
    from one incident-edge reduce over the shared artifact; the edge-moment
    sums are one more combiner pass; r's cross-multiplication runs in
    Python ints."""
    from .graph_edges import ensure_copurchase_edges_parquet

    e = pq.read_table(ensure_copurchase_edges_parquet(sf_dir),
                      columns=["part_a", "part_b"]).to_pandas()
    a = e["part_a"].to_numpy(np.int64)
    b = e["part_b"].to_numpy(np.int64)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    deg = np.bincount(inv, minlength=len(nodes)).astype(np.int64)
    j = deg[inv[: len(a)]]
    k = deg[inv[len(a):]]
    M = len(a)
    if M == 0:
        return pd.DataFrame({"m_edges": pd.Series([0], dtype="int64"),
                             "r_ppm": pd.Series([0], dtype="int64")})
    T = int((j + k).sum())
    U = int((j * j + k * k).sum())
    V = int((j * k).sum())
    num = 4 * M * V - T * T
    den = 2 * M * U - T * T
    r_ppm = _tdiv(1_000_000 * num, den) if den else 0
    out = pd.DataFrame([{"m_edges": M, "r_ppm": r_ppm}])
    return _i64(out, ["m_edges", "r_ppm"])


SQL_DEGREE_ASSORTATIVITY = f"""
WITH e AS (
  SELECT part_a, part_b
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/copurchase_edges.parquet/*.parquet')),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT part_a AS node FROM e UNION ALL SELECT part_b FROM e)
  GROUP BY 1),
m AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS M,
         CAST(SUM(x.d + y.d) AS HUGEINT) AS T,
         CAST(SUM(x.d * x.d + y.d * y.d) AS HUGEINT) AS U,
         CAST(SUM(x.d * y.d) AS HUGEINT) AS V
  FROM e JOIN deg x ON x.node = e.part_a JOIN deg y ON y.node = e.part_b)
SELECT CAST(M AS BIGINT) AS m_edges,
       CAST(CASE WHEN 2 * M * U - T * T <> 0
                 THEN (1000000 * (4 * M * V - T * T)) // (2 * M * U - T * T)
                 ELSE 0 END AS BIGINT) AS r_ppm
FROM m WHERE M > 0
"""

_PI_Y0 = 1996
_PI_Y1 = 1997


def q_price_index_laspeyres(sf_dir: str) -> pd.DataFrame:
    """Laspeyres price index per brand, 1996 basket at 1997 prices: one
    pushed-down lineitem scan emits (brand, part, year) revenue/quantity
    combiners; per-item quantized unit prices and the basket fold run on
    the output-bounded item table."""
    import ray as _ray

    p = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    pk = p["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(pk)
    bmap_ref = _ray.put((pk[order],
                         p["p_brand"].to_numpy(zero_copy_only=False)[order]))

    expr = ((pads.field("l_shipdate") >= pa.scalar(datetime(_PI_Y0, 1, 1), pa.timestamp("us")))
            & (pads.field("l_shipdate") < pa.scalar(datetime(_PI_Y1 + 1, 1, 1), pa.timestamp("us"))))
    li = _t(sf_dir, "lineitem",
            ["l_partkey", "l_quantity", "l_extendedprice", "l_shipdate"],
            filter=expr)

    def part(t: pa.Table) -> pd.DataFrame:
        keys, brands = _ray.get(bmap_ref)
        lp = t["l_partkey"].to_numpy(zero_copy_only=False)
        i = np.searchsorted(keys, lp)
        i[i == len(keys)] = 0
        year = pd.to_datetime(
            pc.cast(t["l_shipdate"], pa.int64()).to_numpy(zero_copy_only=False),
            unit="us").year.to_numpy()
        df = pd.DataFrame({
            "p_brand": brands[i], "l_partkey": lp, "year": year,
            "rev": np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False)
                           * 100.0).astype(np.int64),
            "q100": np.rint(t["l_quantity"].to_numpy(zero_copy_only=False)
                            * 100.0).astype(np.int64)})
        return df.groupby(["p_brand", "l_partkey", "year"], as_index=False).sum()

    items = grouped_sums(
        li.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["p_brand", "l_partkey", "year"], {"rev": "rev", "q100": "q100"},
        reduce="driver").to_pandas()
    piv = items.pivot_table(index=["p_brand", "l_partkey"], columns="year",
                            values=["rev", "q100"], fill_value=0, aggfunc="sum")
    rows = []
    for brand, g in piv.groupby(level=0):
        r0 = g.get(("rev", _PI_Y0), pd.Series(0, index=g.index)).to_numpy(np.int64)
        r1 = g.get(("rev", _PI_Y1), pd.Series(0, index=g.index)).to_numpy(np.int64)
        q0 = g.get(("q100", _PI_Y0), pd.Series(0, index=g.index)).to_numpy(np.int64)
        q1 = g.get(("q100", _PI_Y1), pd.Series(0, index=g.index)).to_numpy(np.int64)
        both = (q0 > 0) & (q1 > 0)
        if not both.any():
            continue
        p0 = (r0[both] * 100) // q0[both]
        p1 = (r1[both] * 100) // q1[both]
        num = int((p1 * q0[both]).sum())
        den = int((p0 * q0[both]).sum())
        if den == 0:
            continue
        rows.append({"p_brand": brand, "n_items": int(both.sum()),
                     "laspeyres_ppm": (1_000_000 * num) // den})
    out = pd.DataFrame(rows).sort_values("p_brand", ignore_index=True)
    return _i64(out, ["n_items", "laspeyres_ppm"])


SQL_PRICE_INDEX_LASPEYRES = f"""
WITH li AS (
  SELECT p_brand, l_partkey, EXTRACT(year FROM l_shipdate) AS y,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev,
         CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS q100
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE l_shipdate >= DATE '{_PI_Y0}-01-01' AND l_shipdate < DATE '{_PI_Y1 + 1}-01-01'
  GROUP BY 1, 2, 3),
w AS (
  SELECT p_brand, l_partkey,
         MAX(CASE WHEN y = {_PI_Y0} THEN rev ELSE 0 END) AS r0,
         MAX(CASE WHEN y = {_PI_Y1} THEN rev ELSE 0 END) AS r1,
         MAX(CASE WHEN y = {_PI_Y0} THEN q100 ELSE 0 END) AS q0,
         MAX(CASE WHEN y = {_PI_Y1} THEN q100 ELSE 0 END) AS q1
  FROM li GROUP BY 1, 2),
px AS (
  SELECT p_brand, (r0 * 100) // q0 AS p0, (r1 * 100) // q1 AS p1, q0
  FROM w WHERE q0 > 0 AND q1 > 0),
agg AS (
  SELECT p_brand, COUNT(*) AS n_items,
         CAST(SUM(CAST(p1 AS HUGEINT) * q0) AS HUGEINT) AS num,
         CAST(SUM(CAST(p0 AS HUGEINT) * q0) AS HUGEINT) AS den
  FROM px GROUP BY 1)
SELECT p_brand, CAST(n_items AS BIGINT) AS n_items,
       CAST((1000000 * num) // den AS BIGINT) AS laspeyres_ppm
FROM agg WHERE den <> 0 ORDER BY p_brand
"""
