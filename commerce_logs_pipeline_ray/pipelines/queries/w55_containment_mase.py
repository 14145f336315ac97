"""Wave 55: asymmetric set containment and forecast-baseline evaluation.

* shingle_containment_topk — Broder's (1997) CONTAINMENT (|A∩B| / |A|, the
  asymmetric companion of resemblance/Jaccard): directed top-10 doc pairs
  by integer-quantized containment over word-3-gram shingle sets, c ≥ 3.
  The same inverted-index shingle exchange as the Jaccard join emits
  (pair, c, n_a, n_b); each unordered pair contributes BOTH directions —
  the containment-subsumption signal Jaccard hides when |A| ≪ |B|.
* forecast_baseline_compare — forecast-skill baseline test per event_type
  over daily cents: Σ|seasonal-7-naive error| vs Σ|1-step-naive error| as
  an exact ppm ratio (the MASE shape with the naive walk as denominator) —
  < 10⁶ means weekly seasonality carries real signal.
"""
from __future__ import annotations

from ._base import _i64, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from ._base import grouped_sums  # noqa: F401

_CONT_TOPK = 10
_CONT_MIN_SHARED = 3
_CONT_DF_CUTOFF = 100


def q_shingle_containment_topk(sf_dir: str) -> pd.DataFrame:
    """Directed containment top-10: one shingle inverted-index exchange
    (threshold 0 keeps every co-occurring pair), both directions per pair,
    containment_ppm = 10⁶·c // n_src, c ≥ 3, ties by (src, dst)."""
    from ...functions.dedup import ngram_jaccard_pairs

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    pairs = ngram_jaccard_pairs(docs, threshold=0.0, shingle_k=3,
                                df_cutoff=_CONT_DF_CUTOFF, return_counts=True)
    pairs = pairs[pairs["c"] >= _CONT_MIN_SHARED]
    if pairs.empty:
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ["src", "dst", "n_shared", "containment_ppm"]})
    a = pairs["doc_a"].to_numpy(np.int64)
    b = pairs["doc_b"].to_numpy(np.int64)
    c = pairs["c"].to_numpy(np.int64)
    na = pairs["na"].to_numpy(np.int64)
    nb = pairs["nb"].to_numpy(np.int64)
    out = pd.DataFrame({
        "src": np.concatenate([a, b]), "dst": np.concatenate([b, a]),
        "n_shared": np.concatenate([c, c]),
        "containment_ppm": np.concatenate([(1_000_000 * c) // na,
                                           (1_000_000 * c) // nb])})
    out = out.sort_values(["containment_ppm", "src", "dst"],
                          ascending=[False, True, True],
                          ignore_index=True).head(_CONT_TOPK)
    return _i64(out, ["src", "dst", "n_shared", "containment_ppm"])


SQL_SHINGLE_CONTAINMENT_TOPK = f"""
WITH w AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents),
g AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
  FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(i)),
keep AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) <= {_CONT_DF_CUTOFF}),
gf AS (SELECT g.* FROM g JOIN keep USING (gram)),
sz AS (SELECT doc_id, COUNT(*) AS n FROM gf GROUP BY doc_id),
pr AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM gf a JOIN gf b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_CONT_MIN_SHARED}),
dir AS (
  SELECT pr.doc_a AS src, pr.doc_b AS dst, pr.c,
         (1000000 * pr.c) // sa.n AS containment_ppm
  FROM pr JOIN sz sa ON sa.doc_id = pr.doc_a
  UNION ALL
  SELECT pr.doc_b, pr.doc_a, pr.c, (1000000 * pr.c) // sb.n
  FROM pr JOIN sz sb ON sb.doc_id = pr.doc_b)
SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst,
       CAST(c AS BIGINT) AS n_shared,
       CAST(containment_ppm AS BIGINT) AS containment_ppm
FROM dir ORDER BY containment_ppm DESC, src, dst LIMIT {_CONT_TOPK}
"""


def q_forecast_baseline_compare(sf_dir: str) -> pd.DataFrame:
    """Σ|x_t − x_{t−7 rows}| vs Σ|x_t − x_{t−1 row}| per event_type over
    the present-day cents series (rows where both lags exist), mase7_ppm =
    10⁶·Σ|e7| // Σ|e1| — exact integers end to end."""
    from ...functions.relational import bucketed_group_reduce

    def to_day(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "day_id": pc.divide(pc.cast(t["ts"], pa.int64()),
                                pa.scalar(86_400_000_000, pa.int64())),
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())})

    daily = grouped_sums(
        _t(sf_dir, "events", ["event_type", "ts", "value"]).map_batches(
            to_day, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "day_id"], {"cents": "cents"})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type"):
            x = g.sort_values("day_id")["cents"].to_numpy(np.int64)
            if len(x) < 8:
                continue
            e1 = np.abs(x[7:] - x[6:-1])
            e7 = np.abs(x[7:] - x[:-7])
            s1, s7 = int(e1.sum()), int(e7.sum())
            if s1 == 0:
                continue
            rows.append({"event_type": et, "n_points": len(x) - 7,
                         "sum_e1": s1, "sum_e7": s7,
                         "mase7_ppm": (1_000_000 * s7) // s1})
        return pd.DataFrame(rows)

    out = bucketed_group_reduce(daily, ["event_type"], fold).to_pandas()
    out = out.sort_values("event_type", ignore_index=True)
    return _i64(out, ["n_points", "sum_e1", "sum_e7", "mase7_ppm"])


SQL_FORECAST_BASELINE_COMPARE = """
WITH d AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_id,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2),
l AS (
  SELECT event_type, cents,
         LAG(cents, 1) OVER w AS c1, LAG(cents, 7) OVER w AS c7
  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day_id)),
e AS (
  SELECT event_type, abs(cents - c1) AS e1, abs(cents - c7) AS e7
  FROM l WHERE c7 IS NOT NULL),
agg AS (
  SELECT event_type, COUNT(*) AS n_points,
         CAST(SUM(e1) AS BIGINT) AS sum_e1, CAST(SUM(e7) AS BIGINT) AS sum_e7
  FROM e GROUP BY 1)
SELECT event_type, CAST(n_points AS BIGINT) AS n_points, sum_e1, sum_e7,
       CAST((1000000 * sum_e7) // sum_e1 AS BIGINT) AS mase7_ppm
FROM agg WHERE n_points >= 1 AND sum_e1 <> 0
ORDER BY event_type
"""
