"""Wave 61: experimentation-platform statistics, integer-exact.

* eb_shrunk_rates — empirical-Bayes rate shrinkage per customer nation:
  purchase share per nation shrunk toward the global rate with a fixed
  pseudo-count prior m=100, as the exact rational
  (k·Σn + m·Σk) / (Σn·(n + m)) in ppm — small nations move toward the
  pooled mean, large ones barely move (the classic shrinkage ordering,
  asserted in tests).  One (nation, is-purchase) count exchange.
* cuped_adjustment — CUPED (Deng et al. 2013) pre-period covariate
  adjustment over per-user (pre, post) value sums: θ = cov/var and the
  variance-reduction ρ² both as truncating integer quantizations with the
  product order fixed on both engines (θ_q·num // vy — num² would
  overflow HUGEINT, the factored form stays inside it).
"""
from __future__ import annotations

from ._base import _i64, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from ._base import grouped_sums  # noqa: F401

_EB_PRIOR_M = 100


def _tdiv(a: int, d: int) -> int:
    q = abs(a) // abs(d)
    return q if (a >= 0) == (d > 0) else -q


def q_eb_shrunk_rates(sf_dir: str) -> pd.DataFrame:
    """Raw vs shrunk purchase-rate ppm per customer nation (prior m=100
    pseudo-events at the global rate): shrunk = (k·Σn + m·Σk) //
    (Σn·(n+m)).  Events map to nations through the broadcast customer
    dimension; unknown users are dropped on both engines via the join."""
    import ray as _ray

    c = pq.read_table(f"{sf_dir}/customer.parquet",
                      columns=["c_custkey", "c_nationkey"]).to_pandas()
    n = pq.read_table(f"{sf_dir}/nation.parquet",
                      columns=["n_nationkey", "n_name"]).to_pandas()
    names = n.sort_values("n_nationkey")["n_name"].to_numpy()
    c = c.sort_values("c_custkey")
    cmap_ref = _ray.put((c["c_custkey"].to_numpy(np.int64),
                         c["c_nationkey"].to_numpy(np.int64)))

    ev = _t(sf_dir, "events", ["user_id", "event_type"])

    def part(t: pa.Table) -> pd.DataFrame:
        keys, nk = _ray.get(cmap_ref)
        u = t["user_id"].to_numpy(zero_copy_only=False)
        i = np.searchsorted(keys, u)
        i[i == len(keys)] = 0
        m = keys[i] == u
        pur = np.asarray(pc.equal(t["event_type"], "purchase")).astype(np.int64)
        df = pd.DataFrame({"nk": nk[i][m], "n": 1, "k": pur[m]})
        return df.groupby("nk", as_index=False).sum()

    agg = grouped_sums(
        ev.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["nk"], {"n": "n", "k": "k"}, reduce="driver").to_pandas()
    SN = int(agg["n"].sum())
    SK = int(agg["k"].sum())
    rows = []
    for _, r in agg.iterrows():
        ni, ki = int(r["n"]), int(r["k"])
        rows.append({
            "n_name": names[int(r["nk"])], "n_events": ni, "k_purchases": ki,
            "raw_ppm": (1_000_000 * ki) // ni if ni else 0,
            "shrunk_ppm": (1_000_000 * (ki * SN + _EB_PRIOR_M * SK))
                          // (SN * (ni + _EB_PRIOR_M)) if SN else 0})
    out = pd.DataFrame(rows).sort_values("n_name", ignore_index=True)
    return _i64(out, ["n_events", "k_purchases", "raw_ppm", "shrunk_ppm"])


SQL_EB_SHRUNK_RATES = f"""
WITH e AS (
  SELECT n_name, COUNT(*) AS n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS k
  FROM events
  JOIN customer ON c_custkey = user_id
  JOIN nation ON n_nationkey = c_nationkey
  GROUP BY 1),
tot AS (SELECT CAST(SUM(n) AS HUGEINT) AS SN, CAST(SUM(k) AS HUGEINT) AS SK FROM e)
SELECT n_name, CAST(n AS BIGINT) AS n_events, k AS k_purchases,
       CAST((1000000 * k) // n AS BIGINT) AS raw_ppm,
       CAST((1000000 * (k * SN + {_EB_PRIOR_M} * SK))
            // (SN * (n + {_EB_PRIOR_M})) AS BIGINT) AS shrunk_ppm
FROM e, tot ORDER BY n_name
"""

_CUPED_SPLIT_DAYS = 15


def q_cuped_adjustment(sf_dir: str) -> pd.DataFrame:
    """CUPED θ and ρ² over per-user (pre, post) cents: the split is the
    corpus min day + 15; five integer moment sums reduce distributed; the
    factored quantization (θ_q first, then θ_q·num // vy) keeps every
    intermediate inside HUGEINT on the oracle side."""
    from ...functions.relational import bucketed_group_reduce

    def to_user(t: pa.Table) -> pd.DataFrame:
        day = (pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
               // 86_400_000_000)
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                        pa.int64()).to_numpy(zero_copy_only=False)
        return pd.DataFrame({"user_id": t["user_id"].to_numpy(zero_copy_only=False),
                             "day": day, "cents": cents})

    ev = _t(sf_dir, "events", ["user_id", "ts", "value"]).map_batches(
        to_user, batch_format="pyarrow", zero_copy_batch=True)

    day0 = int(ev.min("day"))
    split = day0 + _CUPED_SPLIT_DAYS

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        pre = df["day"] < split
        out = pd.DataFrame({"user_id": df["user_id"],
                            "x": df["cents"].where(pre, 0),
                            "y": df["cents"].where(~pre, 0)})
        return out.groupby("user_id", as_index=False).sum()

    users = bucketed_group_reduce(ev, ["user_id"], per_user)

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        x = df["x"].to_numpy(np.int64).astype(object)
        y = df["y"].to_numpy(np.int64).astype(object)
        return pd.DataFrame([{"n": len(x), "sx": int(x.sum()), "sy": int(y.sum()),
                              "sxx": int((x * x).sum()), "syy": int((y * y).sum()),
                              "sxy": int((x * y).sum())}])

    agg = users.map_batches(moments, batch_format="pandas").to_pandas().sum()
    n = int(agg["n"])
    sx, sy = int(agg["sx"]), int(agg["sy"])
    sxx, syy, sxy = int(agg["sxx"]), int(agg["syy"]), int(agg["sxy"])
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    vy = n * syy - sy * sy
    if n < 2 or den <= 0 or vy <= 0:
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ["n_users", "theta_ppm", "rho2_ppm"]})
    theta_q = _tdiv(1_000_000 * num, den)
    rho2 = (theta_q * num) // vy
    out = pd.DataFrame([{"n_users": n, "theta_ppm": theta_q, "rho2_ppm": rho2}])
    return _i64(out, ["n_users", "theta_ppm", "rho2_ppm"])


SQL_CUPED_ADJUSTMENT = f"""
WITH d0 AS (
  SELECT MIN(CAST(floor(epoch(ts) / 86400) AS BIGINT)) AS day0 FROM events),
u AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN CAST(floor(epoch(ts) / 86400) AS BIGINT)
                            < d0.day0 + {_CUPED_SPLIT_DAYS}
                       THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS x,
         CAST(SUM(CASE WHEN CAST(floor(epoch(ts) / 86400) AS BIGINT)
                            >= d0.day0 + {_CUPED_SPLIT_DAYS}
                       THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS y
  FROM events, d0 GROUP BY user_id, d0.day0),
m AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
         CAST(SUM(x * x) AS HUGEINT) AS sxx,
         CAST(SUM(y * y) AS HUGEINT) AS syy,
         CAST(SUM(x * y) AS HUGEINT) AS sxy
  FROM u),
f AS (
  SELECT n, n * sxy - sx * sy AS num, n * sxx - sx * sx AS den,
         n * syy - sy * sy AS vy
  FROM m)
SELECT CAST(n AS BIGINT) AS n_users,
       CAST((1000000 * num) // den AS BIGINT) AS theta_ppm,
       CAST((((1000000 * num) // den) * num) // vy AS BIGINT) AS rho2_ppm
FROM f WHERE n >= 2 AND den > 0 AND vy > 0
"""
