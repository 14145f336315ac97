"""Wave 53: log-likelihood keyness and true Damerau-Levenshtein linkage.

* dunning_llr_keywords — Dunning's (1993) log-likelihood-ratio keyword
  statistic for source src0 vs the rest: per word the 2×2 G² in the shared
  µnat convention (each observed cell contributes O·round(10⁶·ln(O/E)),
  zero cells contribute 0), top-10 by (llr DESC, word).  Same one-pass
  word×source count exchange as the odds-ratio variant — the two
  statistics share an exchange but rank differently on rare words.
* damerau_linkage — fuzzy linkage under TRUE Damerau-Levenshtein distance
  (unrestricted transpositions, Damerau 1964) ≤ 2 over the dirty-name
  corpus: the pair-vectorized full-matrix DP kernel
  (functions/linkage.py::damerau_levenshtein_batch) is pinned BITWISE
  against DuckDB's ``damerau_levenshtein`` by fuzz tests; candidates come
  from the same sorted-neighborhood passes as ``record_linkage``, so the
  two queries differ exactly where a transposition rescues a pair.
"""
from __future__ import annotations

from ._base import _i64, _rd, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from ._base import ORACLE_ARTIFACT_DIR, grouped_sums  # noqa: F401
from .neardup_b import ensure_dirty_names_parquet

_LLR_TOPK = 10
_LLR_SRC = "src0"


def q_dunning_llr_keywords(sf_dir: str) -> pd.DataFrame:
    """Top-10 src0 keywords by Dunning G², µnat-exact: one (word, in_src)
    count exchange; the 2×2 algebra folds on the reduced vocabulary with
    every log term quantized identically on both engines."""
    docs = _t(sf_dir, "documents", ["source", "text"])

    def words(t: pa.Table) -> pd.DataFrame:
        lst = pc.split_pattern(t["text"], " ")
        flat = lst.combine_chunks() if isinstance(lst, pa.ChunkedArray) else lst
        offs = flat.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n_words = offs[1:] - offs[:-1]
        idx = np.repeat(np.arange(len(t), dtype=np.int64), n_words)
        in_src = np.asarray(pc.equal(t["source"], _LLR_SRC))[idx]
        df = pd.DataFrame({"word": flat.values.to_numpy(zero_copy_only=False),
                           "in_src": in_src.astype(np.int64), "n": 1})
        return df.groupby(["word", "in_src"], as_index=False).sum()

    counts = grouped_sums(
        docs.map_batches(words, batch_format="pyarrow", zero_copy_batch=True),
        ["word", "in_src"], {"n": "n"}, reduce="driver").to_pandas()
    piv = counts.pivot_table(index="word", columns="in_src", values="n",
                             fill_value=0, aggfunc="sum")
    a = piv[1].to_numpy(np.int64) if 1 in piv.columns else np.zeros(len(piv), np.int64)
    b = piv[0].to_numpy(np.int64) if 0 in piv.columns else np.zeros(len(piv), np.int64)
    ta, tb = int(a.sum()), int(b.sum())
    N = ta + tb
    c, d = ta - a, tb - b

    def term(o: np.ndarray, row: np.ndarray, col: int) -> np.ndarray:
        e = row.astype(np.float64) * col / N
        with np.errstate(divide="ignore", invalid="ignore"):
            t = _rd(np.log(o / e) * 1e6, 0)
        t = np.where(o > 0, t, 0.0).astype(np.int64)
        return o * t

    rowm = a + b
    llr = 2 * (term(a, rowm, ta) + term(b, rowm, tb)
               + term(c, N - rowm, ta) + term(d, N - rowm, tb))
    out = pd.DataFrame({"word": piv.index.to_numpy(), "n_in": a, "n_out": b,
                        "llr_munat": llr})
    out = out.sort_values(["llr_munat", "word"], ascending=[False, True],
                          ignore_index=True).head(_LLR_TOPK)
    return _i64(out[["word", "n_in", "n_out", "llr_munat"]],
                ["n_in", "n_out", "llr_munat"])


SQL_DUNNING_LLR_KEYWORDS = f"""
WITH w AS (
  SELECT CASE WHEN source = '{_LLR_SRC}' THEN 1 ELSE 0 END AS in_src,
         unnest(string_split(text, ' ')) AS word
  FROM documents),
c AS (
  SELECT word,
         CAST(SUM(in_src) AS BIGINT) AS a,
         CAST(SUM(1 - in_src) AS BIGINT) AS b
  FROM w GROUP BY 1),
tot AS (SELECT CAST(SUM(a) AS BIGINT) AS ta, CAST(SUM(b) AS BIGINT) AS tb FROM c),
t AS (
  SELECT word, a, b, ta, tb, ta + tb AS N, a + b AS rowm
  FROM c, tot),
llr AS (
  SELECT word, a AS n_in, b AS n_out,
    2 * (
      CASE WHEN a > 0 THEN a * CAST(ROUND(LN(CAST(a AS DOUBLE)
           / (CAST(rowm AS DOUBLE) * ta / N)) * 1000000) AS BIGINT) ELSE 0 END
    + CASE WHEN b > 0 THEN b * CAST(ROUND(LN(CAST(b AS DOUBLE)
           / (CAST(rowm AS DOUBLE) * tb / N)) * 1000000) AS BIGINT) ELSE 0 END
    + CASE WHEN ta - a > 0 THEN (ta - a) * CAST(ROUND(LN(CAST(ta - a AS DOUBLE)
           / (CAST(N - rowm AS DOUBLE) * ta / N)) * 1000000) AS BIGINT) ELSE 0 END
    + CASE WHEN tb - b > 0 THEN (tb - b) * CAST(ROUND(LN(CAST(tb - b AS DOUBLE)
           / (CAST(N - rowm AS DOUBLE) * tb / N)) * 1000000) AS BIGINT) ELSE 0 END
    ) AS llr_munat
  FROM t)
SELECT word, n_in, n_out, CAST(llr_munat AS BIGINT) AS llr_munat
FROM llr ORDER BY llr_munat DESC, word LIMIT {_LLR_TOPK}
"""

_DAM_MAX_DIST = 2


def q_damerau_linkage(sf_dir: str) -> pd.DataFrame:
    """Sorted-neighborhood linkage scored with TRUE Damerau-Levenshtein
    (≤ 2): same candidate passes as record_linkage, the verify kernel is
    the pair-vectorized full-matrix DL DP."""
    from ...functions.linkage import link_records

    ds = rd.read_parquet(ensure_dirty_names_parquet(sf_dir), override_num_blocks=4)
    out = link_records(ds, max_dist=_DAM_MAX_DIST, metric="damerau").to_pandas()
    out = out.sort_values(["id_a", "id_b"], ignore_index=True)
    return _i64(out, ["id_a", "id_b", "dist"])


SQL_DAMERAU_LINKAGE = f"""
WITH r AS (SELECT rec_id, name FROM read_parquet('{ORACLE_ARTIFACT_DIR}/dirty_names_v2.parquet')),
k AS (
  SELECT rec_id, name, 'p' || substr(name, 1, 3) AS bk, name AS skey FROM r
  UNION ALL
  SELECT rec_id, name, 's' || substr(reverse(name), 1, 3), reverse(name) FROM r
),
o AS (
  SELECT rec_id, name, bk,
         ROW_NUMBER() OVER (PARTITION BY bk ORDER BY skey, rec_id) AS rn
  FROM k
),
c AS (
  SELECT DISTINCT LEAST(a.rec_id, b.rec_id) AS id_a,
                  GREATEST(a.rec_id, b.rec_id) AS id_b,
                  damerau_levenshtein(a.name, b.name) AS dist
  FROM o a JOIN o b
    ON a.bk = b.bk AND b.rn - a.rn BETWEEN 1 AND 8
  WHERE abs(length(a.name) - length(b.name)) <= {_DAM_MAX_DIST}
)
SELECT id_a, id_b, CAST(dist AS BIGINT) AS dist
FROM c WHERE dist <= {_DAM_MAX_DIST}
ORDER BY 1, 2
"""
