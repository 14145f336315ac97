"""Wave 42: regression, concentration and rank statistics in exact integer
arithmetic.

* ols_price_trend — per-brand ordinary-least-squares fit of line price
  (cents) on ship day: the distributed part is a pure combiner (n, Σx, Σy,
  Σxy, Σx² per brand, int64-safe because x is days since 1995-01-01); the
  driver's closed-form slope/intercept cross-multiplications run in Python
  ints (the oracle's HUGEINT headroom — n·Σxy overflows int64 at sf1) with
  truncating µ-quantization matching DuckDB `//`.
* herfindahl_by_nation — supplier-revenue concentration (Herfindahl-
  Hirschman index) per supplier nation in exact ppm: per-supplier revenue
  units reduce distributed; HHI_ppm = 10⁶·Σrᵢ² // (Σrᵢ)² folds per nation
  over the output-bounded supplier table in Python ints (squares of
  per-supplier revenue exceed int64).
* percent_rank_prices — integer percent-rank (10⁶·(rank−1) // (n−1), RANK
  ties) of each Brand#1 part's retail price within the brand — the window
  formula made explicit so both engines stay in integers.
"""
from __future__ import annotations

from ._base import _i64, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from ._base import grouped_sums  # noqa: F401

_OLS_EPOCH_DAY = 9131  # 1995-01-01 in days since 1970-01-01


def _tdiv_int(a: int, d: int) -> int:
    """Truncating integer division on Python ints (DuckDB ``//``)."""
    q = abs(a) // abs(d)
    return q if (a >= 0) == (d > 0) else -q


def q_ols_price_trend(sf_dir: str) -> pd.DataFrame:
    """Per-brand OLS of extended-price cents on ship day (x = days since
    1995-01-01): slope_ppm and intercept_cents via the closed form, exact.
    The exchange carries five int64 sums per brand; the ≤|brands| final
    cross-multiplications use Python ints (HUGEINT parity)."""
    import ray as _ray

    p = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    pk = p["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(pk)
    brand_ref = _ray.put((pk[order], p["p_brand"].to_numpy(zero_copy_only=False)[order]))

    li = _t(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_shipdate"])

    def part(t: pa.Table) -> pd.DataFrame:
        keys, brands = _ray.get(brand_ref)
        lp = t["l_partkey"].to_numpy(zero_copy_only=False)
        i = np.searchsorted(keys, lp)
        i[i == len(keys)] = 0
        x = (pc.cast(t["l_shipdate"], pa.int64()).to_numpy(zero_copy_only=False)
             // 86_400_000_000) - _OLS_EPOCH_DAY
        y = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        df = pd.DataFrame({"p_brand": brands[i], "n": 1, "sx": x, "sy": y,
                           "sxy": x * y, "sxx": x * x})
        return df.groupby("p_brand", as_index=False).sum()

    agg = grouped_sums(
        li.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["p_brand"], {c: c for c in ["n", "sx", "sy", "sxy", "sxx"]},
        reduce="driver").to_pandas()

    rows = []
    for _, r in agg.iterrows():
        n, sx, sy, sxy, sxx = (int(r["n"]), int(r["sx"]), int(r["sy"]),
                               int(r["sxy"]), int(r["sxx"]))
        den = n * sxx - sx * sx
        if n < 2 or den == 0:
            continue
        slope_ppm = _tdiv_int(1_000_000 * (n * sxy - sx * sy), den)
        intercept_cents = _tdiv_int(sy * sxx - sx * sxy, den)
        rows.append({"p_brand": r["p_brand"], "n": n, "slope_ppm": slope_ppm,
                     "intercept_cents": intercept_cents})
    out = pd.DataFrame(rows).sort_values("p_brand", ignore_index=True)
    return _i64(out, ["n", "slope_ppm", "intercept_cents"])


SQL_OLS_PRICE_TREND = f"""
WITH pts AS (
  SELECT p_brand,
         CAST(floor(epoch(l_shipdate) / 86400) AS BIGINT) - {_OLS_EPOCH_DAY} AS x,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem JOIN part ON p_partkey = l_partkey),
s AS (
  SELECT p_brand, COUNT(*) AS n,
         CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
         CAST(SUM(x * y) AS HUGEINT) AS sxy, CAST(SUM(x * x) AS HUGEINT) AS sxx
  FROM pts GROUP BY 1)
SELECT p_brand, CAST(n AS BIGINT) AS n,
       CAST(1000000 * (n * sxy - sx * sy) // (n * sxx - sx * sx) AS BIGINT)
         AS slope_ppm,
       CAST((sy * sxx - sx * sxy) // (n * sxx - sx * sx) AS BIGINT)
         AS intercept_cents
FROM s WHERE n >= 2 AND n * sxx - sx * sx <> 0
ORDER BY p_brand
"""


def q_herfindahl_by_nation(sf_dir: str) -> pd.DataFrame:
    """Supplier-revenue HHI per supplier nation, exact ppm: per-supplier
    revenue units reduce distributed (output-bounded at |suppliers|); the
    per-nation Σr² / (Σr)² cross-multiplication folds in Python ints."""
    import ray as _ray

    s = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]).to_pandas()
    n = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]).to_pandas()
    names = n.sort_values("n_nationkey")["n_name"].to_numpy()
    s = s.sort_values("s_suppkey")
    smap_ref = _ray.put((s["s_suppkey"].to_numpy(np.int64),
                         s["s_nationkey"].to_numpy(np.int64)))

    li = _t(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount"])

    def part(t: pa.Table) -> pd.DataFrame:
        keys, nk = _ray.get(smap_ref)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        i = np.searchsorted(keys, sk)
        i[i == len(keys)] = 0
        ep = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        dc = np.rint((1.0 - t["l_discount"].to_numpy(zero_copy_only=False)) * 100.0).astype(np.int64)
        df = pd.DataFrame({"nk": nk[i], "sk": sk, "r_u": ep * dc})
        return df.groupby(["nk", "sk"], as_index=False).sum()

    per_supp = grouped_sums(
        li.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["nk", "sk"], {"r_u": "r_u"}, reduce="driver").to_pandas()

    rows = []
    for nk, g in per_supp.groupby("nk"):
        rs = [int(v) for v in g["r_u"]]
        tot = sum(rs)
        if tot == 0:
            continue
        hhi = (1_000_000 * sum(r * r for r in rs)) // (tot * tot)
        rows.append({"n_name": names[int(nk)], "n_suppliers": len(rs),
                     "hhi_ppm": hhi})
    out = pd.DataFrame(rows).sort_values("n_name", ignore_index=True)
    return _i64(out, ["n_suppliers", "hhi_ppm"])


SQL_HERFINDAHL_BY_NATION = """
WITH rev AS (
  SELECT n_name, l_suppkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)) AS HUGEINT) AS r
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  GROUP BY 1, 2),
agg AS (
  SELECT n_name, COUNT(*) AS n_suppliers,
         SUM(r * r) AS ssq, SUM(r) AS tot
  FROM rev GROUP BY 1)
SELECT n_name, CAST(n_suppliers AS BIGINT) AS n_suppliers,
       CAST((1000000 * ssq) // (tot * tot) AS BIGINT) AS hhi_ppm
FROM agg WHERE tot <> 0 ORDER BY n_name
"""

_PR_BRAND = "Brand#1"


def q_percent_rank_prices(sf_dir: str) -> pd.DataFrame:
    """Integer percent-rank (RANK ties, 10⁶·(rank−1) // (n−1)) of each
    Brand#1 part's retail price within the brand.  The brand's parts are a
    pruned dimension scan; rank resolves with one vectorized searchsorted
    over the sorted price vector."""
    p = _t(sf_dir, "part", ["p_partkey", "p_brand", "p_retailprice"])

    def part(t: pa.Table) -> pd.DataFrame:
        m = pc.equal(t["p_brand"], _PR_BRAND)
        tt = t.filter(m)
        return pd.DataFrame({
            "p_partkey": tt["p_partkey"].to_numpy(zero_copy_only=False),
            "cents": np.rint(tt["p_retailprice"].to_numpy(zero_copy_only=False)
                             * 100.0).astype(np.int64)})

    rows = p.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    n = len(rows)
    if n < 2:
        return pd.DataFrame({"p_partkey": pd.Series([], dtype="int64"),
                             "pr_ppm": pd.Series([], dtype="int64")})
    cents = rows["cents"].to_numpy(np.int64)
    srt = np.sort(cents)
    rank = np.searchsorted(srt, cents, side="left") + 1  # RANK (min of ties)
    pr = (1_000_000 * (rank - 1)) // (n - 1)
    out = pd.DataFrame({"p_partkey": rows["p_partkey"].to_numpy(np.int64),
                        "pr_ppm": pr}).sort_values("p_partkey", ignore_index=True)
    return _i64(out, ["p_partkey", "pr_ppm"])


SQL_PERCENT_RANK_PRICES = f"""
WITH b AS (
  SELECT p_partkey, CAST(ROUND(p_retailprice * 100) AS BIGINT) AS cents
  FROM part WHERE p_brand = '{_PR_BRAND}'),
r AS (
  SELECT p_partkey, RANK() OVER (ORDER BY cents) AS rk, COUNT(*) OVER () AS n
  FROM b)
SELECT p_partkey, CAST((1000000 * (rk - 1)) // (n - 1) AS BIGINT) AS pr_ppm
FROM r WHERE n >= 2 ORDER BY p_partkey
"""
