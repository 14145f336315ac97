"""Wave 64: financial-planning and forensic-accounting operators.

* revenue_bridge_decomposition — the FP&A price/volume bridge per brand
  between two ship years: ΔR = volume effect (p₀·Δq) + price effect
  (Δp·q₁) + a reported integer remainder (the quantization residue of the
  truncated unit prices — shown, not hidden, so the bridge reconciles to
  the cent).  Reuses the Laspeyres item machinery: one pushed-down scan,
  item-level combiners, brand fold.
* benford_mad_grade — Nigrini's MAD conformity grade on first digits of
  order totals: per-digit observed ppm vs round(10⁶·log10(1+1/d)),
  MAD_ppm = Σ|obs−exp| // 9 and the close/acceptable/marginal/nonconform
  verdict thresholds (6000/12000/15000 ppm).
"""
from __future__ import annotations

from ._base import _i64, _rd, _t, datetime, np, pa, pads, pc, pd, pq, rd  # noqa: F401
from ._base import grouped_sums  # noqa: F401

_BR_Y0, _BR_Y1 = 1996, 1997


def q_revenue_bridge_decomposition(sf_dir: str) -> pd.DataFrame:
    """Per-brand revenue bridge 1996→1997 over items traded both years:
    delta_rev = vol_effect + price_effect + quant_residual, all in cents —
    the residual is the truncated-unit-price quantization remainder and
    must reconcile the bridge exactly (asserted by the oracle's identical
    algebra)."""
    import ray as _ray

    p = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    pk = p["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(pk)
    bmap_ref = _ray.put((pk[order],
                         p["p_brand"].to_numpy(zero_copy_only=False)[order]))

    expr = ((pads.field("l_shipdate") >= pa.scalar(datetime(_BR_Y0, 1, 1), pa.timestamp("us")))
            & (pads.field("l_shipdate") < pa.scalar(datetime(_BR_Y1 + 1, 1, 1), pa.timestamp("us"))))
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
        r0 = g.get(("rev", _BR_Y0), pd.Series(0, index=g.index)).to_numpy(np.int64)
        r1 = g.get(("rev", _BR_Y1), pd.Series(0, index=g.index)).to_numpy(np.int64)
        q0 = g.get(("q100", _BR_Y0), pd.Series(0, index=g.index)).to_numpy(np.int64)
        q1 = g.get(("q100", _BR_Y1), pd.Series(0, index=g.index)).to_numpy(np.int64)
        both = (q0 > 0) & (q1 > 0)
        if not both.any():
            continue
        p0 = (r0[both] * 100) // q0[both]   # cents per whole unit (q100 = qty·100)
        p1 = (r1[both] * 100) // q1[both]
        def tdiv(a: int, dd: int) -> int:
            q = abs(a) // dd
            return q if a >= 0 else -q

        delta = int((r1[both] - r0[both]).sum())
        vol = tdiv(int((p0 * (q1[both] - q0[both])).sum()), 100)
        price = tdiv(int(((p1 - p0) * q1[both]).sum()), 100)
        rows.append({"p_brand": brand, "n_items": int(both.sum()),
                     "delta_rev_cents": delta, "vol_effect_cents": vol,
                     "price_effect_cents": price,
                     "quant_residual_cents": delta - vol - price})
    out = pd.DataFrame(rows).sort_values("p_brand", ignore_index=True)
    return _i64(out, ["n_items", "delta_rev_cents", "vol_effect_cents",
                      "price_effect_cents", "quant_residual_cents"])


SQL_REVENUE_BRIDGE_DECOMPOSITION = f"""
WITH li AS (
  SELECT p_brand, l_partkey, EXTRACT(year FROM l_shipdate) AS y,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev,
         CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS q100
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE l_shipdate >= DATE '{_BR_Y0}-01-01' AND l_shipdate < DATE '{_BR_Y1 + 1}-01-01'
  GROUP BY 1, 2, 3),
w AS (
  SELECT p_brand, l_partkey,
         MAX(CASE WHEN y = {_BR_Y0} THEN rev ELSE 0 END) AS r0,
         MAX(CASE WHEN y = {_BR_Y1} THEN rev ELSE 0 END) AS r1,
         MAX(CASE WHEN y = {_BR_Y0} THEN q100 ELSE 0 END) AS q0,
         MAX(CASE WHEN y = {_BR_Y1} THEN q100 ELSE 0 END) AS q1
  FROM li GROUP BY 1, 2),
px AS (
  SELECT p_brand, r0, r1, q0, q1,
         (r0 * 100) // q0 AS p0, (r1 * 100) // q1 AS p1
  FROM w WHERE q0 > 0 AND q1 > 0),
agg AS (
  SELECT p_brand, COUNT(*) AS n_items,
         CAST(SUM(r1 - r0) AS HUGEINT) AS delta,
         CAST(SUM(CAST(p0 AS HUGEINT) * (q1 - q0)) AS HUGEINT) AS volsum,
         CAST(SUM(CAST(p1 - p0 AS HUGEINT) * q1) AS HUGEINT) AS pricesum
  FROM px GROUP BY 1)
SELECT p_brand, CAST(n_items AS BIGINT) AS n_items,
       CAST(delta AS BIGINT) AS delta_rev_cents,
       CAST(volsum // 100 AS BIGINT) AS vol_effect_cents,
       CAST(pricesum // 100 AS BIGINT) AS price_effect_cents,
       CAST(delta - volsum // 100 - pricesum // 100 AS BIGINT)
         AS quant_residual_cents
FROM agg ORDER BY p_brand
"""


def q_benford_mad_grade(sf_dir: str) -> pd.DataFrame:
    """Nigrini MAD conformity of first digits of order-total cents: per
    digit observed ppm (trunc) vs round(10⁶·log10(1+1/d)); MAD_ppm and the
    standard verdict thresholds (≤6000 close, ≤12000 acceptable, ≤15000
    marginal, else nonconforming)."""
    orders = _t(sf_dir, "orders", ["o_totalprice"])

    def digits(t: pa.Table) -> pd.DataFrame:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64()).to_numpy(zero_copy_only=False)
        cents = cents[cents > 0]
        s = np.char.mod("%d", cents)
        first = s.astype("U1").astype(np.int64)
        counts = np.bincount(first, minlength=10)[1:10]
        return pd.DataFrame({"digit": np.arange(1, 10, dtype=np.int64),
                             "n": counts})

    agg = grouped_sums(
        orders.map_batches(digits, batch_format="pyarrow", zero_copy_batch=True),
        ["digit"], {"n": "n"}, reduce="driver").to_pandas()
    agg = agg.sort_values("digit", ignore_index=True)
    total = int(agg["n"].sum())
    obs = (1_000_000 * agg["n"].to_numpy(np.int64)) // total
    exp = _rd(np.log10(1.0 + 1.0 / np.arange(1, 10)) * 1e6, 0).astype(np.int64)
    mad = int(np.abs(obs - exp).sum()) // 9
    verdict = ("close" if mad <= 6000 else
               "acceptable" if mad <= 12000 else
               "marginal" if mad <= 15000 else "nonconforming")
    out = pd.DataFrame([{"n_orders": total, "mad_ppm": mad,
                         "verdict": verdict}])
    return _i64(out, ["n_orders", "mad_ppm"])


SQL_BENFORD_MAD_GRADE = """
WITH c AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders
  WHERE ROUND(o_totalprice * 100) > 0),
f AS (
  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM c),
d AS (SELECT digit, COUNT(*) AS n FROM f GROUP BY 1),
grid AS (SELECT UNNEST(generate_series(1, 9)) AS digit),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM d),
ppm AS (
  SELECT grid.digit,
         (1000000 * COALESCE(d.n, 0)) // tot.t AS obs,
         CAST(ROUND(LOG10(1.0 + 1.0 / grid.digit) * 1000000) AS BIGINT) AS exp
  FROM grid LEFT JOIN d USING (digit), tot),
m AS (SELECT CAST(SUM(ABS(obs - exp)) // 9 AS BIGINT) AS mad FROM ppm)
SELECT tot.t AS n_orders, m.mad AS mad_ppm,
       CASE WHEN m.mad <= 6000 THEN 'close'
            WHEN m.mad <= 12000 THEN 'acceptable'
            WHEN m.mad <= 15000 THEN 'marginal'
            ELSE 'nonconforming' END AS verdict
FROM m, tot
"""
