"""Wave 45: pipeline-evaluation operators — linkage quality against planted
truth, and sessionization parameter tuning.

* linkage_quality_eval — precision/recall of the blocked-Levenshtein entity
  resolver against the dirty-name corpus's PLANTED ground truth (variants
  share rec_id // 10): the distributed linkage runs unchanged; truth
  membership is pure key arithmetic (no set join), counts and ppm ratios
  are exact integers.  This is the eval loop a dedup pipeline ships with —
  measure the matcher, not just run it.
* session_gap_curve — sessionization sensitivity: number of sessions as a
  function of the inactivity-gap threshold (5 values in one pass).  The
  per-user sorted diffs fold once inside a user-keyed bucket exchange; each
  threshold is one vectorized comparison over the same diffs — 5 parameter
  points for the price of one LAG scan.
"""
from __future__ import annotations

from ._base import _i64, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from ._base import ORACLE_ARTIFACT_DIR, grouped_sums  # noqa: F401
from .neardup_b import ensure_dirty_names_parquet


def q_linkage_quality_eval(sf_dir: str) -> pd.DataFrame:
    """Precision/recall (exact ppm) of blocked-Levenshtein linkage vs the
    planted variant clusters: predicted pairs from the distributed matcher;
    tp = pairs whose endpoints share rec_id // 10; n_truth from per-base
    variant counts (C(n,2) per base) — one scalar row out."""
    from ...functions.linkage import link_records

    path = ensure_dirty_names_parquet(sf_dir)
    ds = rd.read_parquet(path, override_num_blocks=4)
    pred = link_records(ds, max_dist=2).to_pandas()

    base_counts = grouped_sums(
        rd.read_parquet(path, override_num_blocks=2).map_batches(
            lambda t: pa.table({"base": pc.divide(t["rec_id"], pa.scalar(10, pa.int64()))}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["base"], {}, count_name="n", reduce="driver").to_pandas()
    nb = base_counts["n"].to_numpy(np.int64)
    n_truth = int((nb * (nb - 1) // 2).sum())

    n_pred = len(pred)
    tp = int((pred["id_a"].to_numpy(np.int64) // 10
              == pred["id_b"].to_numpy(np.int64) // 10).sum()) if n_pred else 0
    out = pd.DataFrame([{
        "n_pred": n_pred, "tp": tp, "n_truth": n_truth,
        "precision_ppm": (1_000_000 * tp) // n_pred if n_pred else 0,
        "recall_ppm": (1_000_000 * tp) // n_truth if n_truth else 0}])
    return _i64(out, ["n_pred", "tp", "n_truth", "precision_ppm", "recall_ppm"])


SQL_LINKAGE_QUALITY_EVAL = f"""
WITH r AS (SELECT rec_id, name FROM read_parquet('{ORACLE_ARTIFACT_DIR}/dirty_names_v2.parquet')),
k AS (
  SELECT rec_id, name, 'p' || substr(name, 1, 3) AS bk, name AS skey FROM r
  UNION ALL
  SELECT rec_id, name, 's' || substr(reverse(name), 1, 3), reverse(name) FROM r),
o AS (
  SELECT rec_id, name, bk,
         ROW_NUMBER() OVER (PARTITION BY bk ORDER BY skey, rec_id) AS rn
  FROM k),
pred AS (
  SELECT DISTINCT LEAST(a.rec_id, b.rec_id) AS id_a,
                  GREATEST(a.rec_id, b.rec_id) AS id_b
  FROM o a JOIN o b
    ON a.bk = b.bk AND b.rn - a.rn BETWEEN 1 AND 8
  WHERE abs(length(a.name) - length(b.name)) <= 2
    AND levenshtein(a.name, b.name) <= 2),
tstat AS (
  SELECT CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS n_truth
  FROM (SELECT rec_id // 10 AS base, COUNT(*) AS n FROM r GROUP BY 1)),
pstat AS (
  SELECT COUNT(*) AS n_pred,
         COALESCE(SUM(CASE WHEN id_a // 10 = id_b // 10 THEN 1 ELSE 0 END), 0) AS tp
  FROM pred)
SELECT CAST(n_pred AS BIGINT) AS n_pred, CAST(tp AS BIGINT) AS tp, n_truth,
       CAST(CASE WHEN n_pred > 0 THEN (1000000 * tp) // n_pred ELSE 0 END AS BIGINT)
         AS precision_ppm,
       CAST(CASE WHEN n_truth > 0 THEN (1000000 * tp) // n_truth ELSE 0 END AS BIGINT)
         AS recall_ppm
FROM pstat, tstat
"""

_GAPS_S = [300, 900, 1800, 3600, 7200]


def q_session_gap_curve(sf_dir: str) -> pd.DataFrame:
    """Sessions vs inactivity-gap threshold: for each of 5 thresholds,
    n_sessions = n_users + #(consecutive same-user gaps > g).  One
    user-keyed bucket exchange computes the sorted diffs; all thresholds
    evaluate on the same diff vector."""
    from ...functions.relational import bucketed_group_reduce

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"],
                         "ts_us": pc.cast(t["ts"], pa.int64()),
                         "event_id": t["event_id"]})

    ev = _t(sf_dir, "events", ["user_id", "ts", "event_id"]).map_batches(
        to_us, batch_format="pyarrow", zero_copy_batch=True)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts_us", "event_id"])
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts_us"].to_numpy(np.int64)
        same = u[1:] == u[:-1]
        gaps = (ts[1:] - ts[:-1])[same]
        n_users = len(np.unique(u))
        return pd.DataFrame({
            "gap_s": _GAPS_S,
            "n_sessions": [n_users + int((gaps > g * 1_000_000).sum())
                           for g in _GAPS_S]})

    parts = bucketed_group_reduce(ev, ["user_id"], fold)
    out = grouped_sums(parts, ["gap_s"], {"n_sessions": "n_sessions"},
                       reduce="driver").to_pandas()
    out = out.sort_values("gap_s", ignore_index=True)
    return _i64(out[["gap_s", "n_sessions"]], ["gap_s", "n_sessions"])


SQL_SESSION_GAP_CURVE = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev
  FROM events),
g AS (SELECT UNNEST([{", ".join(str(g) for g in _GAPS_S)}]) AS gap_s)
SELECT g.gap_s AS gap_s,
       CAST(SUM(CASE WHEN e.prev IS NULL
                     OR e.t - e.prev > CAST(g.gap_s AS BIGINT) * 1000000
                     THEN 1 ELSE 0 END)
            AS BIGINT) AS n_sessions
FROM e, g GROUP BY 1 ORDER BY 1
"""
