"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import ORACLE_ARTIFACT_DIR, _i64, _rd, _t, pd, rd  # noqa: F401
from .webclean import ensure_web_docs_parquet  # noqa: F401

# ---------------------------------------------------------------------------
# BM25 ranked retrieval (two-pass, zero-shuffle variant)
# ---------------------------------------------------------------------------

def q_bm25_two_pass(sf_dir: str) -> pd.DataFrame:
    """BM25 top-10 for the query {table, scan, merge} over documents —
    zero-shuffle two-pass ranker (functions/search.py::bm25_topk): scalar
    corpus stats partials, then vectorized per-doc scoring + distributed
    top-k."""
    from ...functions.search import bm25_topk

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    out = bm25_topk(ds, ["table", "scan", "merge"], k=10)
    out["score"] = out["score"].pipe(_rd)
    return _i64(out, ["doc_id"])


SQL_BM25_TWO_PASS = """
WITH per AS (
  SELECT doc_id, len(ws) AS dl,
         len(list_filter(ws, x -> x = 'table')) AS tf1,
         len(list_filter(ws, x -> x = 'scan'))  AS tf2,
         len(list_filter(ws, x -> x = 'merge')) AS tf3
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
),
g AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n, CAST(SUM(dl) AS DOUBLE) AS total_dl,
         SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
         SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2,
         SUM(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) AS df3
  FROM per
),
s AS (
  SELECT doc_id,
    (CASE WHEN tf1 > 0 THEN ln((n - df1 + 0.5) / (df1 + 0.5) + 1)
         * (tf1 * (1.2 + 1.0)) / (tf1 + 1.2 * ((1.0 - 0.75) + 0.75 * dl * n / total_dl))
         ELSE 0 END)
    + (CASE WHEN tf2 > 0 THEN ln((n - df2 + 0.5) / (df2 + 0.5) + 1)
         * (tf2 * (1.2 + 1.0)) / (tf2 + 1.2 * ((1.0 - 0.75) + 0.75 * dl * n / total_dl))
         ELSE 0 END)
    + (CASE WHEN tf3 > 0 THEN ln((n - df3 + 0.5) / (df3 + 0.5) + 1)
         * (tf3 * (1.2 + 1.0)) / (tf3 + 1.2 * ((1.0 - 0.75) + 0.75 * dl * n / total_dl))
         ELSE 0 END) AS score
  FROM per CROSS JOIN g
)
SELECT doc_id, ROUND(score, 6) AS score
FROM s ORDER BY score DESC, doc_id LIMIT 10
"""


def q_line_dedup_rewrite(sf_dir: str) -> pd.DataFrame:
    """RefinedWeb-style cross-document line dedup: one (line → distinct-doc
    count) exchange finds lines recurring in >= 3 docs corpus-wide, a second
    pass rewrites docs with them removed — per-source removal stats
    (functions/webclean.py::line_dedup_rewrite_stats)."""
    from ...functions.webclean import line_dedup_rewrite_stats

    src = ensure_web_docs_parquet(sf_dir)
    ds = rd.read_parquet(src, columns=["doc_id", "source", "text"], override_num_blocks=8)
    out = line_dedup_rewrite_stats(ds, threshold=3)
    return _i64(out, ["n_docs", "lines_removed", "chars_removed", "docs_emptied"])


SQL_LINE_DEDUP_REWRITE = """
WITH d AS (
  SELECT doc_id, source, string_split(text, chr(10)) AS ls
  FROM read_parquet('{AD}/web_docs.parquet')
),
l AS (SELECT doc_id, source, unnest(ls) AS line FROM d),
dup AS (
  SELECT line FROM (SELECT line, COUNT(DISTINCT doc_id) AS docs FROM l GROUP BY 1)
  WHERE docs >= 3
),
per AS (
  SELECT doc_id, source, COUNT(*) AS n_lines,
         SUM(CASE WHEN line IN (SELECT line FROM dup) THEN 1 ELSE 0 END) AS removed,
         SUM(CASE WHEN line IN (SELECT line FROM dup) THEN length(line) ELSE 0 END) AS chars_rm
  FROM l GROUP BY 1, 2
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(removed) AS BIGINT) AS lines_removed,
       CAST(SUM(chars_rm) AS BIGINT) AS chars_removed,
       CAST(SUM(CASE WHEN removed = n_lines THEN 1 ELSE 0 END) AS BIGINT) AS docs_emptied
FROM per GROUP BY 1 ORDER BY 1
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


