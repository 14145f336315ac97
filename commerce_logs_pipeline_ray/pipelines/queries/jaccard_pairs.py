"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import ORACLE_ARTIFACT_DIR, _corpus_dir, _t, np, pa, pd, pq  # noqa: F401
from .neardup_a import _ensure_artifact  # noqa: F401

# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

def q_ngram_jaccard_pairs(sf_dir: str) -> pd.DataFrame:
    """Exact n-gram-set Jaccard near-dup pairs (df-capped, Bayardo-style):
    one gram exchange emits intersection + filtered-size partials, pair and
    size reduces are output-bounded.  Oracle: DuckDB computes the identical
    df-capped Jaccard from string 3-grams directly."""
    from ...functions.grams import ngram_jaccard_pairs

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    return ngram_jaccard_pairs(docs, k=3, threshold=0.5, max_df=100)


SQL_NGRAM_JACCARD_PAIRS = """
WITH w AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents),
g AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
  FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(i)
),
keep AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) <= 100),
gf AS (SELECT g.* FROM g JOIN keep USING (gram)),
sz AS (SELECT doc_id, COUNT(*) AS n FROM gf GROUP BY doc_id),
pr AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM gf a JOIN gf b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT CAST(pr.doc_a AS BIGINT) AS doc_a, CAST(pr.doc_b AS BIGINT) AS doc_b,
       CAST(pr.inter AS BIGINT) AS n_shared,
       ROUND(pr.inter * 1.0 / (sa.n + sb.n - pr.inter), 6) AS jaccard
FROM pr JOIN sz sa ON sa.doc_id = pr.doc_a JOIN sz sb ON sb.doc_id = pr.doc_b
WHERE pr.inter * 1.0 / (sa.n + sb.n - pr.inter) >= 0.5
ORDER BY doc_a, doc_b
"""


def ensure_gram_hashes_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``winnowing_fingerprints``: per-position word
    3-gram rolling hashes ``(doc_id, pos, h)`` computed SCALAR-side
    (``fnv1a64_single`` + python-int mix arithmetic) — independent of the
    vectorized Arrow-buffer gram kernel; the SQL oracle then performs the
    whole winnowing window-min selection itself with window functions."""
    import os as _os

    def build() -> pa.Table:
        from ...functions.grams import _gram_mix
        from ...functions.hashing import fnv1a64_single

        k, seed = 3, 42
        mix = [int(x) for x in _gram_mix(k, seed)]
        MASK = (1 << 64) - 1
        t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        ids, poss, hs = [], [], []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            wh = [fnv1a64_single(wd) for wd in (s or "").split(" ")]
            for i in range(len(wh) - k + 1):
                h = 0
                for j in range(k):
                    h = (h + mix[j] * wh[i + j]) & MASK
                ids.append(int(did))
                poss.append(i + 1)  # 1-based
                hs.append(h)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "pos": pa.array(poss, pa.int64()),
                         "h": pa.array(hs, pa.uint64())})

    return _ensure_artifact(_os.path.join(_corpus_dir(sf_dir), "gram_hashes.parquet"), build)


def q_winnowing_fingerprints(sf_dir: str) -> pd.DataFrame:
    """Winnowing (MOSS) document fingerprinting per source — rolling-hash
    window minima with rightmost tie-break, fully streaming (fingerprints
    are doc-local; the only exchange is the per-source stat fold).
    Oracle: scalar gram hashes ride an artifact; DuckDB re-derives the
    window-min/rightmost selection with window functions."""
    from ...functions.grams import winnowing_stats

    ensure_gram_hashes_parquet(sf_dir)
    docs = _t(sf_dir, "documents", ["doc_id", "text", "source"])
    return winnowing_stats(docs, k=3, w=4)


SQL_WINNOWING_FINGERPRINTS = f"""
WITH g AS (SELECT doc_id, pos, h
           FROM read_parquet('{ORACLE_ARTIFACT_DIR}/gram_hashes.parquet')),
m AS (
  SELECT doc_id, pos AS ws,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mn,
         COUNT(*) OVER (PARTITION BY doc_id) AS ng
  FROM g
),
wins AS (SELECT doc_id, ws, mn FROM m WHERE ws <= ng - 3),
sel AS (
  SELECT w.doc_id, w.ws, MAX(g2.pos) AS selpos
  FROM wins w JOIN g g2
    ON g2.doc_id = w.doc_id AND g2.pos BETWEEN w.ws AND w.ws + 3 AND g2.h = w.mn
  GROUP BY 1, 2
),
selpos AS (SELECT DISTINCT doc_id, selpos FROM sel),
selh AS (SELECT s.doc_id, g.h FROM selpos s
         JOIN g ON g.doc_id = s.doc_id AND g.pos = s.selpos),
per_doc AS (SELECT doc_id, COUNT(*) AS n_selected, COUNT(DISTINCT h) AS n_distinct
            FROM selh GROUP BY doc_id)
SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(p.n_selected) AS BIGINT) AS n_selected,
       CAST(SUM(p.n_distinct) AS BIGINT) AS n_distinct
FROM per_doc p JOIN documents d USING (doc_id)
GROUP BY d.source ORDER BY d.source
"""


def ensure_kcenter_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``kcenter_coreset``: the greedy farthest-point
    selection re-derived by a LOCAL whole-matrix reference (one numpy array,
    plain sequential loop — no streaming, no per-block top-1).  The greedy
    k-center order is deterministic (seed = smallest id, ties → smallest
    id), so both compositions must agree row-for-row, dist bitwise."""
    import os as _os

    def build() -> pa.Table:
        t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        ids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        X = np.asarray(t["embedding"].combine_chunks().flatten(), dtype=np.float64
                       ).reshape(len(t), -1)
        order = np.argsort(ids, kind="stable")
        ids, X = ids[order], X[order]
        dmin = np.full(len(ids), np.inf)
        sel_i = 0  # smallest id
        rows = [(0, int(ids[sel_i]), 0.0)]
        for r in range(1, 16):
            d = ((X - X[sel_i]) ** 2).sum(axis=1)
            dmin = np.minimum(dmin, d)
            best = np.lexsort((ids, -dmin))[0]  # max dist, tie → smallest id
            rows.append((r, int(ids[best]), float(dmin[best])))
            sel_i = int(best)
        df = pd.DataFrame(rows, columns=["sel_order", "vec_id", "dist"])
        df["sel_order"] = df["sel_order"].astype("int64")
        df["vec_id"] = df["vec_id"].astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    return _ensure_artifact(_os.path.join(_corpus_dir(sf_dir), "kcenter_ref.parquet"), build)


def q_kcenter_coreset(sf_dir: str) -> pd.DataFrame:
    """Greedy k-center (farthest-point) coreset over the embeddings table —
    diversity-aware training-subset selection; per round one broadcast
    center, one streaming dmin update, one per-block top-1.  Oracle: the
    local whole-matrix reference derivation as a Parquet artifact."""
    from ...functions.sim import kcenter_coreset

    ensure_kcenter_parquet(sf_dir)
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    return kcenter_coreset(ds, k=16)


SQL_KCENTER_CORESET = f"""
SELECT CAST(sel_order AS BIGINT) AS sel_order, CAST(vec_id AS BIGINT) AS vec_id, dist
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/kcenter_ref.parquet') ORDER BY sel_order
"""


