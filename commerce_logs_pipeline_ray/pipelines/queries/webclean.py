"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import ORACLE_ARTIFACT_DIR, _corpus_dir, _i64, _rd, pa, pd, pq, rd  # noqa: F401
from .neardup_a import _ensure_artifact  # noqa: F401

# ---------------------------------------------------------------------------
# Web-curation filters (Gopher repetition/quality, C4 line cleaning) over the
# deterministic line-structured web corpus (sources/webdocs.py)
# ---------------------------------------------------------------------------

def ensure_web_docs_parquet(sf_dir: str) -> str:
    """Materialize the deterministic multi-line web corpus (doc_id, source,
    text-with-newlines) both sides read — planted rule violations per
    sources/webdocs.py's schedule."""
    import os as _os

    def build() -> pa.Table:
        from ...sources.webdocs import build_web_docs

        docs = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
        )
        return build_web_docs(docs)

    return _ensure_artifact(_os.path.join(_corpus_dir(sf_dir), "web_docs.parquet"), build)


def _webclean_reduce(sf_dir: str, partial_fn) -> pd.DataFrame:
    """Shared shape: distributed integer partials over the web corpus →
    per-source driver reduce (partials are one row per source per batch)."""
    src = ensure_web_docs_parquet(sf_dir)
    ds = rd.read_parquet(src, columns=["doc_id", "source", "text"], override_num_blocks=8)
    agg = ds.map_batches(partial_fn, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    return agg.groupby("source", as_index=False).sum().sort_values("source", ignore_index=True)


def q_gopher_repetition(sf_dir: str) -> pd.DataFrame:
    """Gopher repetition signals (Rae et al. 2021 A1.1) per source:
    duplicate-line / duplicate-line-char / top-2-gram-char / dup-5-gram-char
    fractions, corpus-level from integer partials, plus per-doc flag counts.
    Vectorized: arrow split kernels + factorize + ``np.unique(axis=0)``
    exact gram identity (functions/webclean.py)."""
    from ...functions.webclean import gopher_repetition_partial

    out = _webclean_reduce(sf_dir, gopher_repetition_partial)
    out["frac_dup_lines"] = ((out["n_lines"] - out["n_distinct_lines"]) / out["n_lines"]).pipe(_rd)
    out["frac_dup_line_chars"] = (out["dup_line_chars"] / out["line_chars"]).pipe(_rd)
    out["frac_top2_chars"] = (out["top2_chars"] / out["word_chars"]).pipe(_rd)
    out["frac_dup5_chars"] = (out["dup5_chars"] / out["word_chars"]).pipe(_rd)
    out = out[
        ["source", "n_docs", "frac_dup_lines", "frac_dup_line_chars",
         "frac_top2_chars", "frac_dup5_chars", "flagged"]
    ]
    return _i64(out, ["n_docs", "flagged"])


SQL_GOPHER_REPETITION = """
WITH d AS (
  SELECT doc_id, source,
         string_split(text, chr(10)) AS ls,
         string_split(replace(text, chr(10), ' '), ' ') AS ws
  FROM read_parquet('{AD}/web_docs.parquet')
),
l AS (SELECT doc_id, source, unnest(ls) AS line FROM d),
lstat AS (
  SELECT doc_id, source, COUNT(*) AS n_lines,
         COUNT(DISTINCT line) AS n_distinct_lines,
         SUM(length(line)) AS line_chars
  FROM l GROUP BY 1, 2
),
ldup AS (
  SELECT doc_id, SUM((c - 1) * len_l) AS dup_line_chars
  FROM (SELECT doc_id, line, COUNT(*) AS c, length(line) AS len_l
        FROM l GROUP BY doc_id, line)
  GROUP BY doc_id
),
w AS (SELECT doc_id, unnest(ws) AS word, generate_subscripts(ws, 1) AS pos FROM d),
wstat AS (SELECT doc_id, SUM(length(word)) AS word_chars FROM w GROUP BY doc_id),
g2 AS (
  SELECT a.doc_id, a.word AS w1, b.word AS w2, COUNT(*) AS c
  FROM w a JOIN w b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  GROUP BY 1, 2, 3
),
top2 AS (
  SELECT doc_id, c * (length(w1) + length(w2)) AS top2_chars
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY c DESC, w1 ASC, w2 ASC) AS rn
        FROM g2)
  WHERE rn = 1
),
g5 AS (
  SELECT a.doc_id, a.pos, a.word AS v1, b.word AS v2, c3.word AS v3,
         d4.word AS v4, e5.word AS v5
  FROM w a
  JOIN w b  ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN w c3 ON c3.doc_id = a.doc_id AND c3.pos = a.pos + 2
  JOIN w d4 ON d4.doc_id = a.doc_id AND d4.pos = a.pos + 3
  JOIN w e5 ON e5.doc_id = a.doc_id AND e5.pos = a.pos + 4
),
gdup AS (
  SELECT doc_id, v1, v2, v3, v4, v5
  FROM g5 GROUP BY 1, 2, 3, 4, 5, 6 HAVING COUNT(*) > 1
),
cov AS (
  SELECT DISTINCT g.doc_id, g.pos + k.k AS p
  FROM g5 g JOIN gdup USING (doc_id, v1, v2, v3, v4, v5)
  CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4]) AS k) k
),
dup5 AS (
  SELECT w.doc_id, SUM(length(w.word)) AS dup5_chars
  FROM w JOIN cov ON cov.doc_id = w.doc_id AND cov.p = w.pos
  GROUP BY 1
),
per AS (
  SELECT s.doc_id, s.source, s.n_lines, s.n_distinct_lines, s.line_chars,
         COALESCE(ld.dup_line_chars, 0) AS dup_line_chars,
         ws2.word_chars,
         COALESCE(t2.top2_chars, 0) AS top2_chars,
         COALESCE(d5.dup5_chars, 0) AS dup5_chars
  FROM lstat s
  LEFT JOIN ldup ld USING (doc_id)
  JOIN wstat ws2 USING (doc_id)
  LEFT JOIN top2 t2 USING (doc_id)
  LEFT JOIN dup5 d5 USING (doc_id)
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND((SUM(n_lines) - SUM(n_distinct_lines)) / CAST(SUM(n_lines) AS DOUBLE), 6)
         AS frac_dup_lines,
       ROUND(SUM(dup_line_chars) / CAST(SUM(line_chars) AS DOUBLE), 6)
         AS frac_dup_line_chars,
       ROUND(SUM(top2_chars) / CAST(SUM(word_chars) AS DOUBLE), 6) AS frac_top2_chars,
       ROUND(SUM(dup5_chars) / CAST(SUM(word_chars) AS DOUBLE), 6) AS frac_dup5_chars,
       CAST(SUM(CASE WHEN 10 * (n_lines - n_distinct_lines) > 3 * n_lines
                       OR 5 * top2_chars > word_chars
                       OR 20 * dup5_chars > 3 * word_chars
                     THEN 1 ELSE 0 END) AS BIGINT) AS flagged
FROM per GROUP BY 1 ORDER BY 1
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


def q_gopher_quality_rules(sf_dir: str) -> pd.DataFrame:
    """Gopher-style quality rule suite per source (word count, mean word
    length, symbol ratio, bullet/ellipsis line fractions, alpha-word
    fraction, stopword hits) — integer-exact gates, per-rule fail counts."""
    from ...functions.webclean import gopher_quality_partial

    out = _webclean_reduce(sf_dir, gopher_quality_partial)
    return _i64(
        out,
        ["n_docs", "fail_words", "fail_wordlen", "fail_symbol", "fail_bullet",
         "fail_ellipsis", "fail_alpha", "fail_stop", "n_pass"],
    )


SQL_GOPHER_QUALITY_RULES = r"""
WITH d AS (
  SELECT doc_id, source, text,
         string_split(text, chr(10)) AS ls,
         string_split(replace(text, chr(10), ' '), ' ') AS ws
  FROM read_parquet('{AD}/web_docs.parquet')
),
l AS (SELECT doc_id, unnest(ls) AS line FROM d),
lagg AS (
  SELECT doc_id, COUNT(*) AS n_lines,
         SUM(CASE WHEN line LIKE '- %' THEN 1 ELSE 0 END) AS n_bullet,
         SUM(CASE WHEN line LIKE '%...' THEN 1 ELSE 0 END) AS n_ellip
  FROM l GROUP BY 1
),
w AS (SELECT doc_id, unnest(ws) AS word FROM d),
wagg AS (
  SELECT doc_id, COUNT(*) AS n_words, SUM(length(word)) AS sum_len,
         SUM(CASE WHEN contains(word, '#') OR contains(word, '...')
                  THEN 1 ELSE 0 END) AS n_sym,
         SUM(CASE WHEN regexp_matches(word, '[a-zA-Z]') THEN 1 ELSE 0 END) AS n_alpha
  FROM w GROUP BY 1
),
per AS (
  SELECT d.doc_id, d.source,
         CASE WHEN n_words < 20 OR n_words > 100000 THEN 1 ELSE 0 END AS f_words,
         CASE WHEN sum_len < 3 * n_words OR sum_len > 10 * n_words THEN 1 ELSE 0 END AS f_wordlen,
         CASE WHEN 10 * n_sym > n_words THEN 1 ELSE 0 END AS f_symbol,
         CASE WHEN 10 * n_bullet > 9 * n_lines THEN 1 ELSE 0 END AS f_bullet,
         CASE WHEN 10 * n_ellip > 3 * n_lines THEN 1 ELSE 0 END AS f_ellipsis,
         CASE WHEN 5 * n_alpha < 4 * n_words THEN 1 ELSE 0 END AS f_alpha,
         CASE WHEN len(regexp_extract_all(text, '\b(?:the|a|of|and|to)\b')) < 2
              THEN 1 ELSE 0 END AS f_stop
  FROM d JOIN lagg USING (doc_id) JOIN wagg USING (doc_id)
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(f_words) AS BIGINT) AS fail_words,
       CAST(SUM(f_wordlen) AS BIGINT) AS fail_wordlen,
       CAST(SUM(f_symbol) AS BIGINT) AS fail_symbol,
       CAST(SUM(f_bullet) AS BIGINT) AS fail_bullet,
       CAST(SUM(f_ellipsis) AS BIGINT) AS fail_ellipsis,
       CAST(SUM(f_alpha) AS BIGINT) AS fail_alpha,
       CAST(SUM(f_stop) AS BIGINT) AS fail_stop,
       CAST(SUM(CASE WHEN f_words + f_wordlen + f_symbol + f_bullet + f_ellipsis
                          + f_alpha + f_stop = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
FROM per GROUP BY 1 ORDER BY 1
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


def q_c4_line_filter(sf_dir: str) -> pd.DataFrame:
    """C4 cleaning (Raffel et al. 2020 §2.2) per source: docs dropped
    (lorem-ipsum / curly-brace), line keep rule (terminal punctuation AND
    >= 5 words AND no 'javascript'), chars kept, docs retaining >= 3 lines."""
    from ...functions.webclean import c4_line_filter_partial

    out = _webclean_reduce(sf_dir, c4_line_filter_partial)
    return _i64(
        out,
        ["docs_in", "docs_dropped", "lines_total", "lines_kept", "chars_kept", "docs_kept3"],
    )


SQL_C4_LINE_FILTER = """
WITH d AS (
  SELECT doc_id, source, string_split(text, chr(10)) AS ls,
         (contains(lower(text), 'lorem ipsum') OR contains(text, '{')) AS dropped
  FROM read_parquet('{AD}/web_docs.parquet')
),
l AS (
  SELECT doc_id, unnest(ls) AS line FROM d WHERE NOT dropped
),
lk AS (
  SELECT doc_id, COUNT(*) AS lines_total,
         SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS lines_kept,
         SUM(CASE WHEN kept THEN length(line) ELSE 0 END) AS chars_kept
  FROM (SELECT doc_id, line,
               ((line LIKE '%.' OR line LIKE '%!' OR line LIKE '%?' OR line LIKE '%"')
                AND len(string_split(line, ' ')) >= 5
                AND NOT contains(lower(line), 'javascript')) AS kept
        FROM l)
  GROUP BY 1
)
SELECT d.source, CAST(COUNT(*) AS BIGINT) AS docs_in,
       CAST(SUM(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT) AS docs_dropped,
       CAST(COALESCE(SUM(lines_total), 0) AS BIGINT) AS lines_total,
       CAST(COALESCE(SUM(lines_kept), 0) AS BIGINT) AS lines_kept,
       CAST(COALESCE(SUM(chars_kept), 0) AS BIGINT) AS chars_kept,
       CAST(SUM(CASE WHEN COALESCE(lines_kept, 0) >= 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_kept3
FROM d LEFT JOIN lk USING (doc_id) GROUP BY 1 ORDER BY 1
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


