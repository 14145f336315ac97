"""Wave 50: survival analysis and schema profiling.

* kaplan_meier_survival — the Kaplan-Meier product-limit estimator (Kaplan
  & Meier 1958) over customer lifetimes (first→last order day; customers
  still ordering within 90 days of the corpus horizon are right-censored):
  the survival product is carried in LOG domain under the repo's µnat
  convention (per-step term = round(10⁶·ln((n−d)/n)), cumulative sum), so
  two engines agree integer-exactly.  Per-(lifetime, event) counts reduce
  distributed; the risk-set fold runs on the ≤|distinct lifetimes| table.
* candidate_key_audit — data profiling: for a fixed candidate column list,
  row count vs distinct count and the is-key verdict.  Distinct counts are
  key-combiner exchanges (never a driver set), one row per candidate.
"""
from __future__ import annotations

from ._base import _i64, _rd, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from ._base import grouped_sums  # noqa: F401

_KM_CENSOR_DAYS = 90


def q_kaplan_meier_survival(sf_dir: str) -> pd.DataFrame:
    """KM survival over customer order-span lifetimes: rows are event times
    with d > 0 deaths and d < n_risk (the curve stops before hitting 0 to
    keep the log finite), columns (t_days, n_risk, d, s_munat) where
    s_munat is the cumulative µnat log-survival."""
    def to_day(t: pa.Table) -> pd.DataFrame:
        day = (pc.cast(t["o_orderdate"], pa.int64()).to_numpy(zero_copy_only=False)
               // 86_400_000_000)
        df = pd.DataFrame({"o_custkey": t["o_custkey"].to_numpy(zero_copy_only=False),
                           "fd": day, "ld": day})
        return df.groupby("o_custkey", as_index=False).agg(
            fd=("fd", "min"), ld=("ld", "max"))

    from ...functions.relational import bucketed_group_reduce

    spans = bucketed_group_reduce(
        _t(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
            to_day, batch_format="pyarrow", zero_copy_batch=True),
        ["o_custkey"],
        lambda df: df.groupby("o_custkey", as_index=False).agg(
            fd=("fd", "min"), ld=("ld", "max")))

    def lifetime_counts(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"t_days": df["ld"] - df["fd"], "ld": df["ld"],
                            "c": 1})
        return out.groupby(["t_days", "ld"], as_index=False).sum()

    # distributed reduce to (lifetime, last-day) counts — bounded by the
    # day-grid size, not |customers|; the horizon/censor fold runs on that
    lt = grouped_sums(
        spans.map_batches(lifetime_counts, batch_format="pandas"),
        ["t_days", "ld"], {"c": "c"}, reduce="driver").to_pandas()
    horizon = int(lt["ld"].max())
    ev = (lt["ld"] < horizon - _KM_CENSOR_DAYS).astype(np.int64)
    lt["d_part"] = lt["c"] * ev
    tab = (lt.groupby("t_days", as_index=False)
             .agg(d=("d_part", "sum"), c=("c", "sum"))
             .rename(columns={"t_days": "t"})
             .sort_values("t", ignore_index=True))
    N = int(tab["c"].sum())
    cum_prev = tab["c"].cumsum().to_numpy(np.int64) - tab["c"].to_numpy(np.int64)
    n_risk = N - cum_prev
    d = tab["d"].to_numpy(np.int64)
    keep = (d > 0) & (d < n_risk)
    term = _rd(np.log((n_risk[keep] - d[keep]) / n_risk[keep].astype(np.float64))
               * 1e6, 0).astype(np.int64)
    out = pd.DataFrame({"t_days": tab["t"].to_numpy(np.int64)[keep],
                        "n_risk": n_risk[keep], "d": d[keep],
                        "s_munat": np.cumsum(term)})
    return _i64(out, ["t_days", "n_risk", "d", "s_munat"])


SQL_KAPLAN_MEIER_SURVIVAL = f"""
WITH o AS (
  SELECT o_custkey,
         MIN(CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT)) AS fd,
         MAX(CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT)) AS ld
  FROM orders GROUP BY 1),
mx AS (SELECT MAX(ld) AS m FROM o),
l AS (
  SELECT ld - fd AS t,
         CASE WHEN ld < m - {_KM_CENSOR_DAYS} THEN 1 ELSE 0 END AS ev
  FROM o, mx),
tab AS (
  SELECT t, CAST(SUM(ev) AS BIGINT) AS d, COUNT(*) AS c FROM l GROUP BY 1),
r AS (
  SELECT t, d, c,
         (SELECT COUNT(*) FROM l)
           - (SUM(c) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) - c) AS n_risk
  FROM tab),
km AS (
  SELECT t, n_risk, d,
         CAST(ROUND(LN(CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE))
                    * 1000000) AS BIGINT) AS term
  FROM r WHERE d > 0 AND d < n_risk)
SELECT t AS t_days, CAST(n_risk AS BIGINT) AS n_risk, d,
       CAST(SUM(term) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS s_munat
FROM km ORDER BY t
"""

_KEY_CANDIDATES = [
    ("orders", "o_orderkey"),
    ("orders", "o_custkey"),
    ("customer", "c_custkey"),
    ("part", "p_partkey"),
    ("events", "event_id"),
    ("events", "user_id"),
    ("lineitem", "l_orderkey"),
]


def q_candidate_key_audit(sf_dir: str) -> pd.DataFrame:
    """Candidate-key profiling: n_rows vs n_distinct per candidate column,
    is_key verdict.  Each distinct count is a key-combiner exchange — the
    distinct set itself never lands on the driver."""
    rows = []
    for tbl, col in _KEY_CANDIDATES:
        ds = _t(sf_dir, tbl, [col])
        n_rows = ds.count()
        n_distinct = grouped_sums(ds, [col], {}).count()
        rows.append({"candidate": f"{tbl}.{col}", "n_rows": int(n_rows),
                     "n_distinct": int(n_distinct),
                     "is_key": int(n_rows == n_distinct)})
    out = pd.DataFrame(rows).sort_values("candidate", ignore_index=True)
    return _i64(out, ["n_rows", "n_distinct", "is_key"])


SQL_CANDIDATE_KEY_AUDIT = (
    "\nUNION ALL\n".join(
        f"""SELECT '{tbl}.{col}' AS candidate,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
       CAST(CASE WHEN COUNT(*) = COUNT(DISTINCT {col}) THEN 1 ELSE 0 END
            AS BIGINT) AS is_key
FROM {tbl}"""
        for tbl, col in _KEY_CANDIDATES)
    + "\nORDER BY candidate"
)
