"""Wave 56: statistical-pitfall detectors.

* simpsons_paradox_check — Simpson's (1951) aggregation-reversal detector:
  return-rate lift of PROMO-type parts vs the rest, per ship-year stratum
  AND pooled, with every sign decided by integer cross-multiplication
  (ret_p·n_o − ret_o·n_p).  One combiner pass builds the 2×2 per stratum;
  the pooled row and the reversal flag fold from the same table.
* inspection_paradox_audit — the waiting-time/inspection paradox: per
  event_type, the length-biased mean gap E[X²]/E[X] vs the plain mean
  E[X], as ratio_ppm = 10⁶·n·Σx² // (Σx)² over integer second gaps — > 10⁶
  exactly when gaps vary (the factor a random arrival over-samples long
  gaps by).  Per-user consecutive gaps reduce inside a user-keyed bucket
  exchange; the moment fold is Python-int (HUGEINT parity).
"""
from __future__ import annotations

from ._base import _i64, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from ._base import grouped_sums  # noqa: F401


def q_simpsons_paradox_check(sf_dir: str) -> pd.DataFrame:
    """Per-year and pooled PROMO-vs-rest return-rate lift signs: sign =
    sgn(ret_promo·n_other − ret_other·n_promo); the reversed flag marks
    strata whose sign contradicts the pooled sign."""
    import ray as _ray

    p = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
    pk = p["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    promo = np.asarray(pc.equal(p["p_type"], "PROMO"))
    order = np.argsort(pk)
    pmap_ref = _ray.put((pk[order], promo[order]))

    li = _t(sf_dir, "lineitem", ["l_partkey", "l_returnflag", "l_shipdate"])

    def part(t: pa.Table) -> pd.DataFrame:
        keys, is_promo = _ray.get(pmap_ref)
        lp = t["l_partkey"].to_numpy(zero_copy_only=False)
        i = np.searchsorted(keys, lp)
        i[i == len(keys)] = 0
        pr = is_promo[i].astype(np.int64)
        ret = np.asarray(pc.equal(t["l_returnflag"], "R")).astype(np.int64)
        year = pd.to_datetime(
            pc.cast(t["l_shipdate"], pa.int64()).to_numpy(zero_copy_only=False),
            unit="us").year.to_numpy()
        df = pd.DataFrame({"year": year, "promo": pr, "n": 1, "ret": ret})
        return df.groupby(["year", "promo"], as_index=False).sum()

    agg = grouped_sums(
        li.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["year", "promo"], {"n": "n", "ret": "ret"}, reduce="driver").to_pandas()
    piv = agg.pivot_table(index="year", columns="promo", values=["n", "ret"],
                          fill_value=0, aggfunc="sum")

    def row(year, n_p, r_p, n_o, r_o):
        lift = r_p * n_o - r_o * n_p
        sign = 1 if lift > 0 else (-1 if lift < 0 else 0)
        return {"stratum": str(year), "n_promo": n_p, "ret_promo": r_p,
                "n_other": n_o, "ret_other": r_o, "lift_sign": sign}

    rows = []
    for year in piv.index:
        rows.append(row(int(year),
                        int(piv.loc[year].get(("n", 1), 0)),
                        int(piv.loc[year].get(("ret", 1), 0)),
                        int(piv.loc[year].get(("n", 0), 0)),
                        int(piv.loc[year].get(("ret", 0), 0))))
    pooled = row("ALL", sum(r["n_promo"] for r in rows),
                 sum(r["ret_promo"] for r in rows),
                 sum(r["n_other"] for r in rows),
                 sum(r["ret_other"] for r in rows))
    for r in rows:
        r["reversed"] = int(r["lift_sign"] != 0 and pooled["lift_sign"] != 0
                            and r["lift_sign"] != pooled["lift_sign"])
    pooled["reversed"] = 0
    out = pd.DataFrame(rows + [pooled]).sort_values("stratum", ignore_index=True)
    return _i64(out[["stratum", "n_promo", "ret_promo", "n_other", "ret_other",
                     "lift_sign", "reversed"]],
                ["n_promo", "ret_promo", "n_other", "ret_other", "lift_sign",
                 "reversed"])


SQL_SIMPSONS_PARADOX_CHECK = """
WITH li AS (
  SELECT CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS year,
         CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END AS promo,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
  FROM lineitem JOIN part ON p_partkey = l_partkey),
s AS (
  SELECT CAST(year AS VARCHAR) AS stratum,
         CAST(SUM(promo) AS BIGINT) AS n_promo,
         CAST(SUM(promo * ret) AS BIGINT) AS ret_promo,
         CAST(SUM(1 - promo) AS BIGINT) AS n_other,
         CAST(SUM((1 - promo) * ret) AS BIGINT) AS ret_other
  FROM li GROUP BY year
  UNION ALL
  SELECT 'ALL', CAST(SUM(promo) AS BIGINT),
         CAST(SUM(promo * ret) AS BIGINT),
         CAST(SUM(1 - promo) AS BIGINT),
         CAST(SUM((1 - promo) * ret) AS BIGINT)
  FROM li),
sg AS (
  SELECT *, CAST(SIGN(CAST(ret_promo AS HUGEINT) * n_other
                      - CAST(ret_other AS HUGEINT) * n_promo) AS BIGINT)
            AS lift_sign
  FROM s),
pooled AS (SELECT lift_sign AS ps FROM sg WHERE stratum = 'ALL')
SELECT stratum, n_promo, ret_promo, n_other, ret_other, lift_sign,
       CAST(CASE WHEN stratum <> 'ALL' AND lift_sign <> 0 AND ps <> 0
                 AND lift_sign <> ps THEN 1 ELSE 0 END AS BIGINT) AS reversed
FROM sg, pooled ORDER BY stratum
"""


def q_inspection_paradox_audit(sf_dir: str) -> pd.DataFrame:
    """Length-biased vs plain mean gap per event_type:
    ratio_ppm = 10⁶·n·Σx² // (Σx)² over integer-second same-user gaps."""
    from ...functions.relational import bucketed_group_reduce

    def to_seq(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t["event_type"],
                         "user_id": t["user_id"],
                         "ts_us": pc.cast(t["ts"], pa.int64()),
                         "event_id": t["event_id"]})

    ev = _t(sf_dir, "events",
            ["event_type", "user_id", "ts", "event_id"]).map_batches(
        to_seq, batch_format="pyarrow", zero_copy_batch=True)

    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["event_type", "user_id", "ts_us", "event_id"])
        et = df["event_type"].to_numpy()
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts_us"].to_numpy(np.int64)
        same = (u[1:] == u[:-1]) & (et[1:] == et[:-1])
        x = (ts[1:] - ts[:-1])[same] // 1_000_000
        out = pd.DataFrame({"event_type": et[1:][same], "n": 1, "sx": x,
                            "sxx": x * x})
        return out.groupby("event_type", as_index=False).sum()

    agg = grouped_sums(
        bucketed_group_reduce(ev, ["event_type", "user_id"], gaps),
        ["event_type"], {"n": "n", "sx": "sx", "sxx": "sxx"},
        reduce="driver").to_pandas()
    rows = []
    for _, r in agg.iterrows():
        n, sx, sxx = int(r["n"]), int(r["sx"]), int(r["sxx"])
        if sx == 0:
            continue
        rows.append({"event_type": r["event_type"], "n_gaps": n,
                     "ratio_ppm": (1_000_000 * n * sxx) // (sx * sx)})
    out = pd.DataFrame(rows).sort_values("event_type", ignore_index=True)
    return _i64(out, ["n_gaps", "ratio_ppm"])


SQL_INSPECTION_PARADOX_AUDIT = """
WITH e AS (
  SELECT event_type, user_id, epoch_us(ts) AS t,
         LAG(epoch_us(ts)) OVER (PARTITION BY event_type, user_id
                                 ORDER BY ts, event_id) AS prev
  FROM events),
g AS (
  SELECT event_type, (t - prev) // 1000000 AS x FROM e WHERE prev IS NOT NULL),
m AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(x * x) AS HUGEINT) AS sxx
  FROM g GROUP BY 1)
SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
       CAST((1000000 * n * sxx) // (sx * sx) AS BIGINT) AS ratio_ppm
FROM m WHERE sx <> 0 ORDER BY event_type
"""
