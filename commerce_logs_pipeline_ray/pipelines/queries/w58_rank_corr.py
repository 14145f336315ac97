"""Wave 58: rank-correlation statistics between part size and retail price,
integer-exact with full tie handling.

* kendall_tau_price_size — Kendall's τ (1938): C − D computed WITHOUT the
  O(n²) pair loop by exploiting p_size's bounded cardinality: per size a
  sorted cents vector, then for every size pair (s < s') one searchsorted
  pass counts strictly-smaller / strictly-larger crossings (price ties
  contribute 0 by construction).  τ_a = (C − D) / (n(n−1)/2) quantized to
  ppm with truncating sign semantics.  The oracle is the literal O(n²)
  SIGN-product join — two shapes of the same statistic must agree.
* spearman_rho_price_size — Spearman's ρ with average ranks: ranks carried
  as 2× integers (midranks are half-integers), ρ = Pearson on ranks via
  the cross-multiplied closed form; the denominator mirrors the oracle's
  FLOOR(SQRT(double·double)) bit-for-bit, everything else stays integer.
"""
from __future__ import annotations

from ._base import _i64, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from ._base import grouped_sums  # noqa: F401


def _tdiv(a: int, d: int) -> int:
    q = abs(a) // abs(d)
    return q if (a >= 0) == (d > 0) else -q


def _size_cents(sf_dir: str) -> pd.DataFrame:
    p = _t(sf_dir, "part", ["p_size", "p_retailprice"])

    def conv(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({
            "size": t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64),
            "cents": np.rint(t["p_retailprice"].to_numpy(zero_copy_only=False)
                             * 100.0).astype(np.int64)})

    return p.map_batches(conv, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()


def q_kendall_tau_price_size(sf_dir: str) -> pd.DataFrame:
    """τ_a between p_size and price cents: C/D via per-size sorted vectors
    + one searchsorted per size pair (≤ |sizes|²/2 passes), exact ppm."""
    df = _size_cents(sf_dir)
    n = len(df)
    groups = {int(s): np.sort(g["cents"].to_numpy(np.int64))
              for s, g in df.groupby("size")}
    sizes = sorted(groups)
    C = D = 0
    for i, s in enumerate(sizes):
        a = groups[s]
        for sp in sizes[i + 1:]:
            b = groups[sp]
            # pairs (x_a < x_b): concordant when cents_a < cents_b
            lt = np.searchsorted(a, b, side="left")    # per b: #a strictly below
            le = np.searchsorted(a, b, side="right")   # per b: #a ≤ b
            C += int(lt.sum())
            D += int((len(a) - le).sum())
    denom = n * (n - 1) // 2
    tau_ppm = _tdiv(1_000_000 * (C - D), denom) if denom else 0
    out = pd.DataFrame([{"n": n, "concordant": C, "discordant": D,
                         "tau_a_ppm": tau_ppm}])
    return _i64(out, ["n", "concordant", "discordant", "tau_a_ppm"])


SQL_KENDALL_TAU_PRICE_SIZE = """
WITH p AS (
  SELECT p_partkey, CAST(p_size AS BIGINT) AS s,
         CAST(ROUND(p_retailprice * 100) AS BIGINT) AS c
  FROM part),
pairs AS (
  SELECT SIGN(a.s - b.s) * SIGN(a.c - b.c) AS sg
  FROM p a JOIN p b ON a.p_partkey < b.p_partkey),
agg AS (
  SELECT COUNT(*) AS denom,
         CAST(SUM(CASE WHEN sg > 0 THEN 1 ELSE 0 END) AS BIGINT) AS C,
         CAST(SUM(CASE WHEN sg < 0 THEN 1 ELSE 0 END) AS BIGINT) AS D
  FROM pairs),
n AS (SELECT COUNT(*) AS n FROM p)
SELECT CAST(n.n AS BIGINT) AS n, C AS concordant, D AS discordant,
       CAST((1000000 * (C - D)) // denom AS BIGINT) AS tau_a_ppm
FROM agg, n WHERE denom > 0
"""


def q_spearman_rho_price_size(sf_dir: str) -> pd.DataFrame:
    """ρ with average ranks as exact integers: 2×midranks r, ρ_ppm =
    10⁶·(n·Σrxry − ΣrxΣry) // isqrt((nΣrx²−(Σrx)²)·(nΣry²−(Σry)²)) — all
    Python-int (the product under the root exceeds int64)."""
    import math

    df = _size_cents(sf_dir)
    n = len(df)

    def ranks2(v: np.ndarray) -> np.ndarray:
        # 2× average ranks: for a tie run occupying ranks lo..hi the
        # midrank is (lo+hi)/2 → 2*mid = lo+hi, integers always
        order = np.argsort(v, kind="stable")
        sv = v[order]
        uniq, start = np.unique(sv, return_index=True)
        end = np.append(start[1:], n)  # exclusive
        two_mid = (start + 1) + end  # (lo + hi) with lo=start+1, hi=end
        out = np.empty(n, np.int64)
        out[order] = np.repeat(two_mid, end - start)
        return out

    rx = ranks2(df["size"].to_numpy(np.int64))
    ry = ranks2(df["cents"].to_numpy(np.int64))
    sx, sy = int(rx.sum()), int(ry.sum())
    sxx = int((rx * rx).sum())
    syy = int((ry * ry).sum())
    sxy = int((rx.astype(object) * ry).sum())
    num = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    # mirror the oracle's FLOOR(SQRT(double·double)) bit-for-bit: each
    # HUGEINT casts to double first, then one double multiply and sqrt
    den = int(math.floor(math.sqrt(float(vx) * float(vy)))) if vx > 0 and vy > 0 else 0
    if n < 2 or den == 0:  # constant column → the oracle emits no row
        return pd.DataFrame({"n": pd.Series([], dtype="int64"),
                             "rho_ppm": pd.Series([], dtype="int64")})
    out = pd.DataFrame([{"n": n, "rho_ppm": _tdiv(1_000_000 * num, den)}])
    return _i64(out, ["n", "rho_ppm"])


SQL_SPEARMAN_RHO_PRICE_SIZE = """
WITH p AS (
  SELECT CAST(p_size AS BIGINT) AS s,
         CAST(ROUND(p_retailprice * 100) AS BIGINT) AS c
  FROM part),
r AS (
  SELECT CAST(2 * RANK() OVER (ORDER BY s)
              + COUNT(*) OVER (PARTITION BY s) - 1 AS BIGINT) AS rx,
         CAST(2 * RANK() OVER (ORDER BY c)
              + COUNT(*) OVER (PARTITION BY c) - 1 AS BIGINT) AS ry
  FROM p),
m AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(rx) AS HUGEINT) AS sx, CAST(SUM(ry) AS HUGEINT) AS sy,
         CAST(SUM(rx * rx) AS HUGEINT) AS sxx,
         CAST(SUM(ry * ry) AS HUGEINT) AS syy,
         CAST(SUM(rx * ry) AS HUGEINT) AS sxy
  FROM r)
SELECT CAST(n AS BIGINT) AS n,
       CAST((1000000 * (n * sxy - sx * sy))
            // CAST(FLOOR(SQRT(CAST((n * sxx - sx * sx) AS DOUBLE)
                               * CAST((n * syy - sy * sy) AS DOUBLE))) AS HUGEINT)
         AS BIGINT) AS rho_ppm
FROM m WHERE n >= 2 AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
"""
