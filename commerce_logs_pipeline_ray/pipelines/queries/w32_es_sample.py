"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import _i64, _rd, _t, md5_hex, np, pa, pc, pd, topk  # noqa: F401

# ---------------------------------------------------------------------------
# Wave 32: weighted sampling without replacement, selectivity independence
# audit
# ---------------------------------------------------------------------------

_ES_K = 20


def q_weighted_sample_es(sf_dir: str) -> pd.DataFrame:
    """Weighted sampling WITHOUT replacement by the Efraimidis-Spirakis
    one-pass scheme (2006): each doc draws a deterministic md5-seeded
    uniform u and keeps priority ln(u)/w (equivalent to u^(1/w)); the
    top-k priorities ARE a weight-proportional sample — mergeable, so it
    runs as a plain distributed top-k with no coordination.  The log is
    µ-quantized to an integer before the division (LN-parity convention);
    both engines order by the identical double ratio with doc tie-break.
    Completes the sampling family (hash-order, stratified, Neyman,
    token-budget, temperature) with the weighted-without-replacement
    member."""
    ds = _t(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def pri(t: pa.Table) -> pd.DataFrame:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        hx = md5_hex(
            pc.binary_join_element_wise(
                pc.cast(t["doc_id"], pa.string()), ":es", ""
            )
        ).to_pylist()
        u = (np.array([int(x[:12], 16) for x in hx], dtype=np.int64) + 1) / float(1 << 48)
        q = _rd(np.log(u) * 1e6, 0).astype(np.int64)
        return pd.DataFrame(
            {"doc_id": ids, "source": t["source"].to_pylist(), "w": w,
             "q_unats": q,
             "priority": q.astype(np.float64) / w.astype(np.float64)}
        )

    scored = ds.map_batches(pri, batch_format="pyarrow", zero_copy_batch=True)
    out = topk(scored, ["priority", "doc_id"], [True, False], _ES_K).to_pandas()
    out["priority"] = _rd(out["priority"].to_numpy(np.float64), 6)
    return _i64(out, ["doc_id", "w", "q_unats"]).reset_index(drop=True)


SQL_WEIGHTED_SAMPLE_ES = """
WITH d AS (
  SELECT doc_id, source, n_chars AS w,
         (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':es'), 1, 12)
               AS BIGINT) + 1) / 281474976710656.0 AS u
  FROM documents),
p AS (SELECT doc_id, source, w,
             CAST(ROUND(LN(u) * 1000000, 0) AS BIGINT) AS q_unats
      FROM d)
SELECT doc_id, source, w, q_unats,
       ROUND(CAST(q_unats AS DOUBLE) / w, 6) AS priority
FROM p
ORDER BY CAST(q_unats AS DOUBLE) / w DESC, doc_id LIMIT 20
"""


def q_selectivity_independence_audit(sf_dir: str) -> pd.DataFrame:
    """Cost-based-optimizer selectivity audit: the independence assumption
    (sel(A∧B) = sel(A)·sel(B)) that every CBO makes, checked against the
    actual conjunction count for A: value > 30 and B: type = 'purchase'.
    Exact integer counters from one combiner pass; the correlation verdict
    is INTEGER cross-multiplied (lift > 6/5 → positive, < 4/5 → negative),
    so no float gates the flag — the statistic a query planner would log to
    decide it needs a multi-column histogram."""
    ds = _t(sf_dir, "events", ["event_type", "value"])

    def part(t: pa.Table) -> pd.DataFrame:
        v = t["value"].to_numpy(zero_copy_only=False)
        a = v > 30.0
        b = pc.equal(t["event_type"], "purchase").to_numpy(zero_copy_only=False)
        return pd.DataFrame(
            {"n": [len(v)], "n_a": [int(a.sum())], "n_b": [int(b.sum())],
             "n_ab": [int((a & b).sum())]}
        )

    p = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    n = int(p["n"].sum())
    na, nb, nab = int(p["n_a"].sum()), int(p["n_b"].sum()), int(p["n_ab"].sum())
    est = float(na) * float(nb) / float(n)
    lift = float("nan") if na == 0 or nb == 0 else float(nab) * float(n) / (float(na) * float(nb))
    if na == 0 or nb == 0:
        flag = "undefined"
    elif 5 * nab * n > 6 * na * nb:
        flag = "positive"
    elif 5 * nab * n < 4 * na * nb:
        flag = "negative"
    else:
        flag = "independent"
    out = pd.DataFrame(
        [{"n": n, "n_a": na, "n_b": nb, "n_ab": nab,
          "est_ab": _rd(est, 6), "lift": _rd(lift, 6), "flag": flag}]
    )
    return _i64(out, ["n", "n_a", "n_b", "n_ab"])


SQL_SELECTIVITY_INDEPENDENCE_AUDIT = """
WITH c AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CASE WHEN value > 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN value > 30 AND event_type = 'purchase'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_ab
  FROM events)
SELECT n, n_a, n_b, n_ab,
       ROUND(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / CAST(n AS DOUBLE), 6) AS est_ab,
       CASE WHEN n_a = 0 OR n_b = 0 THEN CAST('nan' AS DOUBLE)
            ELSE ROUND(CAST(n_ab AS DOUBLE) * CAST(n AS DOUBLE)
                       / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6) END AS lift,
       CASE WHEN n_a = 0 OR n_b = 0 THEN 'undefined'
            WHEN 5 * n_ab * n > 6 * n_a * n_b THEN 'positive'
            WHEN 5 * n_ab * n < 4 * n_a * n_b THEN 'negative'
            ELSE 'independent' END AS flag
FROM c
"""


