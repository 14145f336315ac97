"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import ORACLE_ARTIFACT_DIR, _corpus_dir, _i64, _t, pa, pc, pd, pq  # noqa: F401
from .neardup_a import _ensure_artifact  # noqa: F401

# ---------------------------------------------------------------------------
# DSIR importance resampling (hashed-ngram log-likelihood-ratio selection)
# ---------------------------------------------------------------------------

def ensure_dsir_buckets_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``dsir_importance``: (gram → bucket) mapping over
    every observed word bigram, computed with the INDEPENDENT scalar FNV
    loop (``fnv1a64_single``) — cross-checks the vectorized gram-hash path."""
    import os as _os

    def build() -> pa.Table:
        from ...functions.dsir import N_BUCKETS
        from ...functions.hashing import fnv1a64_single

        t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
        grams = set()
        for s in t["text"].to_pylist():
            ws = (s or "").split(" ")
            grams.update(f"{a} {b}" for a, b in zip(ws, ws[1:]))
        ordered = sorted(grams)
        return pa.table(
            {
                "gram": pa.array(ordered, pa.string()),
                "bucket": pa.array(
                    [fnv1a64_single(g) % N_BUCKETS for g in ordered], pa.int64()
                ),
            }
        )

    return _ensure_artifact(_os.path.join(_corpus_dir(sf_dir), "dsir_buckets.parquet"), build)


def q_dsir_importance(sf_dir: str) -> pd.DataFrame:
    """DSIR (Xie et al. 2023): per-doc mean hashed-bigram log-likelihood
    ratio of the English subset (target) vs the rest (raw), add-1 smoothed,
    128 buckets — two streaming passes, KB-sized partials, no shuffle
    (functions/dsir.py)."""
    from ...functions.dsir import dsir_weights

    ds = _t(sf_dir, "documents", ["doc_id", "source", "lang", "text"])

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("is_target", pc.equal(t["lang"], "en"))

    ds = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    ensure_dsir_buckets_parquet(sf_dir)
    out = dsir_weights(ds).to_pandas().sort_values("doc_id", ignore_index=True)
    return _i64(out, ["doc_id", "n_grams", "selected"])


SQL_DSIR_IMPORTANCE = """
WITH w AS (
  SELECT doc_id, lang, source, unnest(ws) AS word, generate_subscripts(ws, 1) AS pos
  FROM (SELECT doc_id, lang, source, string_split(text, ' ') AS ws FROM documents)
),
g AS (
  SELECT a.doc_id, a.lang, a.source, a.word || ' ' || b.word AS gram
  FROM w a JOIN w b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
),
gb AS (
  SELECT g.doc_id, g.lang, g.source, m.bucket
  FROM g JOIN read_parquet('{AD}/dsir_buckets.parquet') m ON m.gram = g.gram
),
tot AS (
  SELECT SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS t_total,
         SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS r_total
  FROM gb
),
bc AS (
  SELECT bucket,
         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct,
         SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS cr
  FROM gb GROUP BY 1
),
lam AS (
  SELECT bucket,
         ln((ct + 1) / CAST(t_total + 128 AS DOUBLE))
           - ln((cr + 1) / CAST(r_total + 128 AS DOUBLE)) AS lam
  FROM bc CROSS JOIN tot
),
per AS (
  SELECT gb.doc_id, gb.source, COUNT(*) AS n_grams, SUM(lam.lam) AS s
  FROM gb JOIN lam USING (bucket) GROUP BY 1, 2
)
SELECT doc_id, source, CAST(n_grams AS BIGINT) AS n_grams,
       ROUND(s / n_grams, 6) AS weight,
       CAST(CASE WHEN ROUND(s / n_grams, 6) > 0 THEN 1 ELSE 0 END AS BIGINT) AS selected
FROM per ORDER BY doc_id
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


