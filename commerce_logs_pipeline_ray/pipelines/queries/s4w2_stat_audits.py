"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import _i64, _rd, _t, md5_hex, np, pa, pc, pd  # noqa: F401

# ---------------------------------------------------------------------------
# Session-4 wave 2: statistical audits — Mann-Whitney U, Theil-Sen trend,
# KS + Benjamini-Hochberg FDR, split-conformal intervals, IPS policy eval
# ---------------------------------------------------------------------------


def q_mannwhitney_u(sf_dir: str) -> pd.DataFrame:
    """Mann-Whitney U (one-vs-rest per event type over ``value``), exact
    tie-corrected, computed rank-free from a grouped cent histogram: one
    (vc, type) count exchange; average ranks come from the cumulative
    histogram, so doubled rank-sums stay INTEGER (2·avg_rank = 2·cum_before
    + t + 1) and the only float ops are the final closed-form z — written
    with the same expression tree as the SQL so the doubles agree bitwise."""
    ds = _t(sf_dir, "events", ["event_type", "value"])

    def part(t: pa.Table) -> pa.Table:
        vc = pc.cast(pc.round(pc.multiply(t["value"], 100.0), ndigits=0,
                              round_mode="half_towards_infinity"), pa.int64())
        g = (
            pa.table({"vc": vc, "event_type": t["event_type"]})
            .group_by(["vc", "event_type"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {"vc": g["vc"], "event_type": g["event_type"],
             "n": pc.cast(g["count_all"], pa.int64())}
        )

    p = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    g = p.groupby(["vc", "event_type"], as_index=False)["n"].sum()
    # bounded support (cents of a bounded metric) → driver-side grid math
    tie = g.groupby("vc", as_index=False)["n"].sum().sort_values("vc")
    tn = tie["n"].to_numpy(np.int64)
    cum_before = np.cumsum(tn) - tn
    two_avg_rank = 2 * cum_before + tn + 1  # integer 2·avg_rank per value
    rank2 = dict(zip(tie["vc"].to_numpy(), two_avg_rank))
    N = int(tn.sum())
    T = int((tn.astype(object) ** 3 - tn).sum())  # tie correction, exact
    rows = []
    for et, sub in g.groupby("event_type"):
        n1 = int(sub["n"].sum())
        n2 = N - n1
        r2 = int((sub["n"].to_numpy(np.int64) * np.array(
            [rank2[v] for v in sub["vc"]], dtype=np.int64)).sum())
        u2 = r2 - n1 * (n1 + 1)  # 2·U as exact int
        u = u2 / 2.0
        sigma = np.sqrt((n1 * n2) / 12.0 * ((N + 1) - T / (N * (N - 1.0))))
        z = ((u2 - n1 * n2) / 2.0) / sigma
        rows.append({"event_type": et, "n1": n1, "u": _rd(u, 1), "z": _rd(float(z), 6)})
    out = pd.DataFrame(rows).sort_values("event_type", ignore_index=True)
    return _i64(out, ["n1"])


SQL_MANNWHITNEY_U = """
WITH e AS (SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS vc FROM events),
g AS (SELECT vc, event_type, COUNT(*) AS n FROM e GROUP BY 1, 2),
t AS (SELECT vc, CAST(SUM(n) AS BIGINT) AS tn FROM g GROUP BY 1),
r AS (SELECT vc, tn,
             CAST(SUM(tn) OVER (ORDER BY vc ROWS UNBOUNDED PRECEDING) - tn AS BIGINT)
               AS cum_before
      FROM t),
tot AS (SELECT CAST(SUM(tn) AS BIGINT) AS N,
               CAST(SUM(tn * tn * tn - tn) AS BIGINT) AS T FROM t),
byt AS (
  SELECT g.event_type, CAST(SUM(g.n) AS BIGINT) AS n1,
         CAST(SUM(g.n * (2 * r.cum_before + r.tn + 1)) AS BIGINT) AS r2
  FROM g JOIN r USING (vc) GROUP BY 1)
SELECT event_type, n1,
       ROUND((r2 - n1 * (n1 + 1)) / 2.0, 1) AS u,
       ROUND(((r2 - n1 * (n1 + 1) - n1 * (N - n1)) / 2.0)
             / sqrt((n1 * (N - n1)) / 12.0 * ((N + 1) - T / (N * (N - 1.0)))), 6) AS z
FROM byt, tot ORDER BY event_type
"""


def q_theilsen_trend(sf_dir: str) -> pd.DataFrame:
    """Theil-Sen robust trend per event type over daily counts: the median
    of all pairwise slopes — outlier-immune where OLS is not.  Distributed
    part is the (type, day) count exchange; the O(days²) pair median is
    per-group vectorized over a bounded grid (days ≪ rows)."""
    ds = _t(sf_dir, "events", ["event_type", "ts"])
    DAY_US = 86_400_000_000

    def part(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t["ts"], pa.int64()), DAY_US)
        g = (
            pa.table({"day": day, "event_type": t["event_type"]})
            .group_by(["day", "event_type"])
            .aggregate([([], "count_all")])
        )
        return pa.table({"day": g["day"], "event_type": g["event_type"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    p = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    g = p.groupby(["event_type", "day"], as_index=False)["n"].sum()
    rows = []
    for et, sub in g.groupby("event_type"):
        sub = sub.sort_values("day")
        d = sub["day"].to_numpy(np.int64)
        n = sub["n"].to_numpy(np.int64)
        i, j = np.triu_indices(len(d), k=1)
        slopes = (n[j] - n[i]) / (d[j] - d[i]).astype(np.float64)
        rows.append(
            {"event_type": et, "n_pairs": np.int64(len(slopes)),
             "slope": _rd(float(np.median(slopes)), 6)}
        )
    out = pd.DataFrame(rows).sort_values("event_type", ignore_index=True)
    return _i64(out, ["n_pairs"])


SQL_THEILSEN_TREND = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2),
p AS (
  SELECT a.event_type, (b.n - a.n) / CAST(b.day - a.day AS DOUBLE) AS s
  FROM d a JOIN d b ON a.event_type = b.event_type AND a.day < b.day)
SELECT event_type, COUNT(*) AS n_pairs, ROUND(MEDIAN(s), 6) AS slope
FROM p GROUP BY event_type ORDER BY event_type
"""

_KS_TERMS = 10
_BH_ALPHA = 0.05


def _ks_p_terms(m: float, d: float) -> float:
    """Asymptotic two-sample KS p ≈ 2·Σ_{k=1..10} (-1)^{k-1} exp(-2k²·m·D²),
    summed in FIXED k order (the SQL unrolls the same 10 terms in the same
    order so the float result matches bitwise)."""
    md2 = m * (d * d)
    acc = 0.0
    for k in range(1, _KS_TERMS + 1):
        term = float(np.exp(-2.0 * (k * k) * md2))
        acc = acc + term if k % 2 == 1 else acc - term
    p = 2.0 * acc
    return min(max(p, 0.0), 1.0)


def _ks_p_sql(m: str, d: str) -> str:
    terms = " + ".join(
        f"{'-' if k % 2 == 0 else ''}exp(-2.0 * {k * k} * (({m}) * (({d}) * ({d}))))".replace(
            "+ -", "- "
        )
        for k in range(1, _KS_TERMS + 1)
    ).replace("+ -exp", "- exp")
    return f"LEAST(GREATEST(2.0 * ({terms}), 0.0), 1.0)"


def q_ks_fdr_audit(sf_dir: str) -> pd.DataFrame:
    """Per-source distribution-drift screen with multiplicity control:
    two-sample KS of n_chars (source vs rest-of-corpus) from ONE grouped
    histogram exchange, asymptotic p-values (fixed-order 10-term series),
    then Benjamini-Hochberg adjustment across the sources (suffix-min of
    p·M/rank) and a discovery flag at α=0.05."""
    ds = _t(sf_dir, "documents", ["source", "n_chars"])

    def part(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"v": t["n_chars"], "source": t["source"]})
            .group_by(["v", "source"])
            .aggregate([([], "count_all")])
        )
        return pa.table({"v": g["v"], "source": g["source"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    p = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    g = p.groupby(["v", "source"], as_index=False)["n"].sum()
    grid = np.sort(g["v"].unique())
    tot = g.groupby("v")["n"].sum().reindex(grid, fill_value=0).to_numpy(np.int64)
    N = int(tot.sum())
    rows = []
    for src, sub in g.groupby("source"):
        cs = sub.set_index("v")["n"].reindex(grid, fill_value=0).to_numpy(np.int64)
        n1 = int(cs.sum())
        n2 = N - n1
        dmax = float(
            np.abs(np.cumsum(cs) / n1 - np.cumsum(tot - cs) / n2).max()
        )
        m = (n1 * n2) / (n1 + n2 + 0.0)
        rows.append({"source": src, "n_docs": n1, "ks_d": dmax,
                     "p_raw": _ks_p_terms(m, dmax)})
    out = pd.DataFrame(rows).sort_values("source", ignore_index=True)
    M = len(out)
    order = np.argsort(out["p_raw"].to_numpy(), kind="stable")
    ranked = out["p_raw"].to_numpy()[order] * M / np.arange(1, M + 1)
    adj = np.minimum.accumulate(ranked[::-1])[::-1]
    adj = np.minimum(adj, 1.0)
    out["p_adj"] = 0.0
    out.loc[out.index[order], "p_adj"] = adj
    out["discovery"] = out["p_adj"] < _BH_ALPHA
    out["ks_d"] = [_rd(v, 6) for v in out["ks_d"]]
    out["p_raw"] = [_rd(v, 6) for v in out["p_raw"]]
    out["p_adj"] = [_rd(v, 6) for v in out["p_adj"]]
    return _i64(out, ["n_docs"])


def _ks_fdr_sql() -> str:
    p_expr = _ks_p_sql("m", "d")
    return f"""
WITH g AS (SELECT n_chars AS v, source, COUNT(*) AS n FROM documents GROUP BY 1, 2),
grid AS (SELECT DISTINCT v FROM g),
srcs AS (SELECT DISTINCT source FROM g),
cells AS (
  SELECT s.source, gr.v, COALESCE(g.n, 0) AS n
  FROM srcs s CROSS JOIN grid gr
  LEFT JOIN g ON g.source = s.source AND g.v = gr.v),
tot AS (SELECT v, CAST(SUM(n) AS BIGINT) AS tn FROM g GROUP BY 1),
cum AS (
  SELECT c.source, c.v,
         CAST(SUM(c.n) OVER (PARTITION BY c.source ORDER BY c.v
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cs,
         CAST(SUM(t.tn) OVER (PARTITION BY c.source ORDER BY c.v
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ct
  FROM cells c JOIN tot t ON t.v = c.v),
sizes AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n1 FROM g GROUP BY 1),
bign AS (SELECT CAST(SUM(tn) AS BIGINT) AS N FROM tot),
ks AS (
  SELECT c.source, s.n1,
         MAX(ABS(c.cs / CAST(s.n1 AS DOUBLE)
               - (c.ct - c.cs) / CAST(b.N - s.n1 AS DOUBLE))) AS d
  FROM cum c JOIN sizes s ON s.source = c.source, bign b
  GROUP BY c.source, s.n1),
praw AS (
  SELECT source, n1 AS n_docs, d AS ks_d,
         {{P}} AS p_raw
  FROM (SELECT source, n1, d,
               (n1 * CAST(b.N - n1 AS DOUBLE)) / (n1 + (b.N - n1) + 0.0) AS m
        FROM ks, bign b)),
ranked AS (
  SELECT source, n_docs, ks_d, p_raw,
         p_raw * (SELECT COUNT(*) FROM praw)
           / (ROW_NUMBER() OVER (ORDER BY p_raw, source)) AS bh_term
  FROM praw),
bh AS (
  SELECT source, n_docs, ks_d, p_raw,
         LEAST(MIN(bh_term)
               OVER (ORDER BY p_raw, source
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 1.0)
           AS p_adj
  FROM ranked)
SELECT source, n_docs, ROUND(ks_d, 6) AS ks_d, ROUND(p_raw, 6) AS p_raw,
       ROUND(p_adj, 6) AS p_adj, p_adj < {_BH_ALPHA} AS discovery
FROM bh ORDER BY source
""".replace("{P}", p_expr)


SQL_KS_FDR_AUDIT = _ks_fdr_sql()

_CONF_ALPHA = 0.1


def q_conformal_interval(sf_dir: str) -> pd.DataFrame:
    """Split-conformal prediction audit: OLS (price ~ items-per-order) fit
    on an md5-hash calibration split with EXACT integer sufficient
    statistics (Python bigint, HUGEINT in SQL), the (1-α) residual quantile
    taken as an exact order statistic (no interpolation), and finite-sample
    coverage measured on the held-out split.  Both sides ride ONE
    key-bucketed co-group exchange (lineitem rows as count partials, order
    rows as price carriers, tagged union) — per-order features, the md5
    split draw included, finalize inside the bucket, so there is no
    separate hash-join stage; the fit/quantile run over per-batch
    partials."""
    from ...functions.relational import bucketed_group_reduce

    li = _t(sf_dir, "lineitem", ["l_orderkey"]).map_batches(
        lambda t: (lambda g: pa.table({
            "k": g["l_orderkey"],
            "n_items": pc.cast(g["count_all"], pa.int64()),
            "price_c": pa.nulls(g.num_rows, pa.int64()),
        }))(t.group_by(["l_orderkey"]).aggregate([([], "count_all")])),
        batch_format="pyarrow", zero_copy_batch=True)
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
        lambda t: pa.table({
            "k": t["o_orderkey"],
            "n_items": pa.nulls(t.num_rows, pa.int64()),
            "price_c": pc.cast(pc.round(pc.multiply(
                t["o_totalprice"], pa.scalar(100.0))), pa.int64()),
        }), batch_format="pyarrow", zero_copy_batch=True)

    def cogroup_featurize(df: pd.DataFrame) -> pd.DataFrame:
        x = df.groupby("k")["n_items"].sum(min_count=1)
        price = df.loc[df["price_c"].notna()].set_index("k")["price_c"]
        both = x.index.intersection(price.index)  # inner-join semantics
        both = both[x.loc[both].notna()]
        keys = both.to_numpy(np.int64)
        hexes = md5_hex([f"{k}:conf" for k in keys]).to_pylist()
        cal = np.fromiter((h[0] in "01234567" for h in hexes), bool, len(hexes))
        return pd.DataFrame({"x": x.loc[both].to_numpy(np.int64),
                             "yc": price.loc[both].to_numpy(np.int64),
                             "cal": cal})

    # two consumers (fit stats, residual pass) — materialize once so the
    # co-group doesn't recompute
    f = bucketed_group_reduce(li.union(orders), ["k"], cogroup_featurize,
                              num_buckets=32).materialize()

    def partial_stats(df: pd.DataFrame) -> pd.DataFrame:
        c = df[df["cal"]]
        return pd.DataFrame(
            {"n": [np.int64(len(c))], "sx": [c["x"].sum()], "sy": [c["yc"].sum()],
             "sxy": [(c["x"] * c["yc"]).sum()], "sxx": [(c["x"] ** 2).sum()]}
        )

    st = f.map_batches(partial_stats, batch_format="pandas").to_pandas()
    n_cal = int(st["n"].sum())
    sx, sy = int(st["sx"].sum()), int(st["sy"].sum())
    sxy, sxx = int(st["sxy"].sum()), int(st["sxx"].sum())
    slope = float(n_cal * sxy - sx * sy) / float(n_cal * sxx - sx * sx)
    intercept = (sy - slope * sx) / n_cal
    k = int(np.ceil((1.0 - _CONF_ALPHA) * (n_cal + 1)))

    def resid(df: pd.DataFrame) -> pd.DataFrame:
        r = np.abs(df["yc"].to_numpy(np.float64)
                   - (slope * df["x"].to_numpy(np.float64) + intercept))
        return pd.DataFrame({"r": r, "cal": df["cal"]})

    res = f.map_batches(resid, batch_format="pandas").to_pandas()
    cal_r = np.sort(res.loc[res["cal"], "r"].to_numpy())
    q = float(cal_r[k - 1])
    ev = res.loc[~res["cal"], "r"].to_numpy()
    coverage = float((ev <= q).sum()) / len(ev)
    return pd.DataFrame(
        {"n_cal": pd.Series([n_cal], dtype="int64"),
         "n_eval": pd.Series([len(ev)], dtype="int64"),
         "slope": [_rd(slope, 6)], "intercept": [_rd(intercept, 6)],
         "q_hat": [_rd(q, 6)], "coverage": [_rd(coverage, 6)]}
    )


SQL_CONFORMAL_INTERVAL = f"""
WITH it AS (SELECT l_orderkey, COUNT(*) AS x FROM lineitem GROUP BY 1),
f AS (
  SELECT it.x, CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS yc,
         substr(md5(CAST(o.o_orderkey AS VARCHAR) || ':conf'), 1, 1) IN
           ('0','1','2','3','4','5','6','7') AS cal
  FROM orders o JOIN it ON it.l_orderkey = o.o_orderkey),
s AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n, CAST(SUM(x) AS HUGEINT) AS sx,
         CAST(SUM(yc) AS HUGEINT) AS sy, CAST(SUM(x * yc) AS HUGEINT) AS sxy,
         CAST(SUM(x * x) AS HUGEINT) AS sxx
  FROM f WHERE cal),
fit AS (
  SELECT CAST(n AS BIGINT) AS n_cal,
         CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
           AS slope, sx, sy, n
  FROM s),
fit2 AS (SELECT n_cal, slope,
                (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / n_cal
                  AS intercept FROM fit),
r AS (
  SELECT ABS(CAST(yc AS DOUBLE) - (f2.slope * CAST(x AS DOUBLE) + f2.intercept))
           AS r, cal
  FROM f, fit2 f2),
qh AS (
  SELECT r AS q FROM r WHERE cal ORDER BY r
  LIMIT 1 OFFSET (SELECT CAST(CEIL((1.0 - {_CONF_ALPHA}) * (n_cal + 1)) AS BIGINT) - 1
                  FROM fit2)),
cov AS (
  SELECT COUNT(*) AS n_eval,
         CAST(SUM(CASE WHEN r <= (SELECT q FROM qh) THEN 1 ELSE 0 END) AS BIGINT)
           AS hits
  FROM r WHERE NOT cal)
SELECT f2.n_cal, cov.n_eval, ROUND(f2.slope, 6) AS slope,
       ROUND(f2.intercept, 6) AS intercept, ROUND((SELECT q FROM qh), 6) AS q_hat,
       ROUND(hits / CAST(cov.n_eval AS DOUBLE), 6) AS coverage
FROM fit2 f2, cov
"""


def q_ips_policy_value(sf_dir: str) -> pd.DataFrame:
    """Off-policy evaluation (IPS) of a deterministic target policy
    (recommend 'purchase' to users whose md5(user ‖ ':policy') starts
    0-7, else 'view') against the logged event stream, with the logging
    propensity estimated as the global action frequency.  Per-action
    output rows keep every accumulator integer (cents / counts) so no
    cross-action float summation exists to diverge; the IPS term is one
    float division per row, identical on both sides."""
    ds = _t(sf_dir, "events", ["user_id", "event_type", "value"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        hexes = md5_hex((df["user_id"].astype(str) + ":policy").tolist()).to_pylist()
        pol = np.where(
            np.fromiter((h[0] in "01234567" for h in hexes), bool, len(hexes)),
            "purchase", "view")
        match = pol == df["event_type"].to_numpy()
        rc = (df["value"] * 100).round().astype("int64")
        return (
            pd.DataFrame({"event_type": df["event_type"], "m": match,
                          "rc": np.where(match, rc, 0), "one": np.int64(1)})
            .groupby("event_type", as_index=False)
            .agg(n_a=("one", "sum"), n_match=("m", "sum"), sum_rc=("rc", "sum"))
        )

    p = ds.map_batches(part, batch_format="pandas").to_pandas()
    g = p.groupby("event_type", as_index=False).agg(
        n_a=("n_a", "sum"), n_match=("n_match", "sum"), sum_rc=("sum_rc", "sum"))
    g["ips_term"] = [
        _rd((rc / 100.0) / na, 6) for rc, na in zip(g["sum_rc"], g["n_a"])]
    g["w_mass"] = [_rd(nm / float(na), 6) for nm, na in zip(g["n_match"], g["n_a"])]
    out = g.drop(columns=["sum_rc"]).sort_values("event_type", ignore_index=True)
    return _i64(out, ["n_a", "n_match"])


SQL_IPS_POLICY_VALUE = """
WITH e AS (
  SELECT event_type,
         CASE WHEN substr(md5(CAST(user_id AS VARCHAR) || ':policy'), 1, 1) IN
                ('0','1','2','3','4','5','6','7')
              THEN 'purchase' ELSE 'view' END = event_type AS m,
         CAST(ROUND(value * 100) AS BIGINT) AS rc
  FROM events)
SELECT event_type, COUNT(*) AS n_a,
       CAST(SUM(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
       ROUND((CAST(SUM(CASE WHEN m THEN rc ELSE 0 END) AS BIGINT) / 100.0)
             / COUNT(*), 6) AS ips_term,
       ROUND(CAST(SUM(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT)
             / CAST(COUNT(*) AS DOUBLE), 6) AS w_mass
FROM e GROUP BY event_type ORDER BY event_type
"""


