"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import ORACLE_ARTIFACT_DIR, _i64, _t, pd, rd  # noqa: F401
from .neardup_a import ensure_derived_parquet  # noqa: F401

# ---------------------------------------------------------------------------
# Training-layout and corpus-audit operators (session-3 batch 2)
# ---------------------------------------------------------------------------

def q_stride_chunks(sf_dir: str) -> pd.DataFrame:
    """Sliding-window (32-token window, 24 stride) retrieval-chunking stats
    per source — offsets-only per-batch math, integer partials
    (functions/tokens.py::stride_window_stats)."""
    from ...functions.tokens import stride_window_stats

    ds = rd.read_parquet(
        ensure_derived_parquet(sf_dir), columns=["tokens", "n_tok", "source"],
        override_num_blocks=8,
    )
    out = stride_window_stats(ds, window=32, stride=24)
    return _i64(out, ["n_chunks", "chunk_tokens", "full_chunks", "edge_checksum"])


SQL_STRIDE_CHUNKS = """
WITH d AS (
  SELECT source, tokens, n_tok
  FROM read_parquet('{AD}/derived.parquet') WHERE n_tok > 0
),
c AS (
  SELECT source, n_tok, tokens,
         UNNEST(generate_series(0, CAST((n_tok - 1) // 24 AS BIGINT))) AS k
  FROM d
),
x AS (
  SELECT source, least(32, n_tok - k * 24) AS clen,
         tokens[CAST(k * 24 + 1 AS BIGINT)] AS first_tok,
         tokens[CAST(k * 24 + least(32, n_tok - k * 24) AS BIGINT)] AS last_tok
  FROM c
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(clen) AS BIGINT) AS chunk_tokens,
       CAST(SUM(CASE WHEN clen = 32 THEN 1 ELSE 0 END) AS BIGINT) AS full_chunks,
       CAST(SUM(CAST(first_tok AS BIGINT) + CAST(last_tok AS BIGINT)) AS BIGINT)
         AS edge_checksum
FROM x GROUP BY 1 ORDER BY 1
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


def q_fim_layout(sf_dir: str) -> pd.DataFrame:
    """Fill-in-the-middle PSM reorder stats (prefix/suffix/middle token sums
    + position-weighted checksum over the reordered stream) with
    integer-deterministic cut points (functions/tokens.py::fim_layout_stats)."""
    from ...functions.tokens import fim_layout_stats

    ds = rd.read_parquet(
        ensure_derived_parquet(sf_dir), columns=["tokens", "n_tok", "source"],
        override_num_blocks=8,
    )
    out = fim_layout_stats(ds, min_len=12)
    return _i64(
        out,
        ["n_docs_fim", "prefix_tokens", "middle_tokens", "suffix_tokens", "fim_checksum"],
    )


SQL_FIM_LAYOUT = """
WITH d AS (
  SELECT source, tokens, n_tok,
         (n_tok // 4 + tokens[1] % 5) AS c1,
         least(n_tok // 4 + tokens[1] % 5 + n_tok // 2 - tokens[2] % 3, n_tok - 1) AS c2
  FROM read_parquet('{AD}/derived.parquet') WHERE n_tok >= 12
),
u AS (
  SELECT source, c1, c2, n_tok, UNNEST(tokens) AS tok,
         generate_subscripts(tokens, 1) AS j
  FROM d
),
chk AS (
  SELECT source,
         SUM(CAST(tok AS BIGINT)
             * CAST(CASE WHEN j <= c1 THEN j
                         WHEN j > c2 THEN c1 + j - c2
                         ELSE c1 + (n_tok - c2) + (j - c1) END AS BIGINT)) AS fim_checksum
  FROM u GROUP BY 1
),
seg AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs_fim,
         CAST(SUM(c1) AS BIGINT) AS prefix_tokens,
         CAST(SUM(c2 - c1) AS BIGINT) AS middle_tokens,
         CAST(SUM(n_tok - c2) AS BIGINT) AS suffix_tokens
  FROM d GROUP BY 1
)
SELECT seg.source, n_docs_fim, prefix_tokens, middle_tokens, suffix_tokens,
       CAST(fim_checksum AS BIGINT) AS fim_checksum
FROM seg JOIN chk USING (source) ORDER BY 1
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


def q_ngram_diversity(sf_dir: str) -> pd.DataFrame:
    """Type/token n-gram diversity per source for n = 1,2,3 — one tagged
    (source, n, gram) combiner exchange (functions/text.py::ngram_diversity)."""
    from ...functions.text import ngram_diversity

    ds = _t(sf_dir, "documents", ["source", "text"])
    out = ngram_diversity(ds, ns=(1, 2, 3))
    return _i64(
        out,
        ["total_1", "distinct_1", "total_2", "distinct_2", "total_3", "distinct_3"],
    )


SQL_NGRAM_DIVERSITY = """
WITH w AS (
  SELECT source, doc_id, unnest(ws) AS word, generate_subscripts(ws, 1) AS pos
  FROM (SELECT source, doc_id, string_split(text, ' ') AS ws FROM documents)
),
g1 AS (SELECT source, COUNT(*) AS total_1, COUNT(DISTINCT word) AS distinct_1
       FROM w GROUP BY 1),
p2 AS (SELECT a.source, a.word || ' ' || b.word AS gram
       FROM w a JOIN w b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
g2 AS (SELECT source, COUNT(*) AS total_2, COUNT(DISTINCT gram) AS distinct_2
       FROM p2 GROUP BY 1),
p3 AS (SELECT a.source, a.word || ' ' || b.word || ' ' || c.word AS gram
       FROM w a
       JOIN w b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
       JOIN w c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2),
g3 AS (SELECT source, COUNT(*) AS total_3, COUNT(DISTINCT gram) AS distinct_3
       FROM p3 GROUP BY 1)
SELECT g1.source,
       CAST(total_1 AS BIGINT) AS total_1, CAST(distinct_1 AS BIGINT) AS distinct_1,
       ROUND(distinct_1 / CAST(total_1 AS DOUBLE), 6) AS div_1,
       CAST(total_2 AS BIGINT) AS total_2, CAST(distinct_2 AS BIGINT) AS distinct_2,
       ROUND(distinct_2 / CAST(total_2 AS DOUBLE), 6) AS div_2,
       CAST(total_3 AS BIGINT) AS total_3, CAST(distinct_3 AS BIGINT) AS distinct_3,
       ROUND(distinct_3 / CAST(total_3 AS DOUBLE), 6) AS div_3
FROM g1 JOIN g2 USING (source) JOIN g3 USING (source) ORDER BY 1
"""


def q_knn_label_consistency(sf_dir: str) -> pd.DataFrame:
    """Leave-one-out exact 1-NN label-consistency audit over the embeddings
    (squared L2 rounded to 9, ties → smallest id) — per-label accuracy
    (functions/sim.py::knn_label_consistency)."""
    from ...functions.sim import knn_label_consistency

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    return _i64(knn_label_consistency(ds), ["label", "n", "nn_same"])


SQL_KNN_LABEL_CONSISTENCY = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings
),
p AS (
  SELECT a.vec_id, a.label, b.vec_id AS nid, b.label AS nlabel,
         ROUND(list_dot_product(a.v, a.v) + list_dot_product(b.v, b.v)
               - 2 * list_dot_product(a.v, b.v), 9) AS d2
  FROM e a JOIN e b ON b.vec_id <> a.vec_id
),
nn AS (
  SELECT vec_id, label, nlabel,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, nid) AS rn
  FROM p
)
SELECT CAST(label AS BIGINT) AS label, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN nlabel = label THEN 1 ELSE 0 END) AS BIGINT) AS nn_same,
       ROUND(SUM(CASE WHEN nlabel = label THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 6)
         AS acc
FROM nn WHERE rn = 1 GROUP BY 1 ORDER BY 1
"""


