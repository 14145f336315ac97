"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import _i64, _rd, _t, grouped_sums, np, pa, pc, pd, topk  # noqa: F401
from .w20_gorilla_ql import _QL_MU  # noqa: F401

# ---------------------------------------------------------------------------
# Wave 28: Rocchio pseudo-relevance feedback
# ---------------------------------------------------------------------------

_PRF_Q = 3       # seed query terms
_PRF_FB = 5      # feedback docs
_PRF_EXP = 2     # expansion terms


def q_rocchio_expansion(sf_dir: str) -> pd.DataFrame:
    """Rocchio pseudo-relevance feedback (Manning et al. IR ch.9), the
    query-expansion loop a retrieval pipeline runs without relevance labels:
    (1) seed query = 3 most frequent words; (2) Dirichlet-µnat scoring picks
    5 feedback docs; (3) expansion = the 2 best tf·idf terms inside the
    feedback set (idf in ROUND(10⁶·ln(N/df)) integer µnats); (4) the 5-term
    query rescoreS the corpus.  One (word,doc,tf) projection pass feeds
    cf/df; scoring passes broadcast the tiny term stats; every weight is an
    integer so both engines agree term-for-term."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def wd_rows(t: pa.Table) -> pd.DataFrame:
        lst = pc.split_pattern(t["text"], " ").combine_chunks()
        off = np.asarray(lst.offsets, dtype=np.int64)
        lens = np.diff(off)
        ids = np.repeat(
            t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64), lens
        )
        w = lst.values.to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"w": w, "doc_id": ids, "tf": 1})
        return df.groupby(["w", "doc_id"], as_index=False).sum()

    wd = ds.map_batches(wd_rows, batch_format="pyarrow", zero_copy_batch=True)
    stats = grouped_sums(wd, ["w"], {"cf": "tf"}, "df").to_pandas()
    ctot = int(stats["cf"].sum())
    n_docs = int(ds.count())
    top = stats.sort_values(["cf", "w"], ascending=[False, True],
                            ignore_index=True).head(_PRF_Q)
    q0 = [str(x) for x in top["w"]]
    cf_map = dict(zip(stats["w"].astype(str), stats["cf"].astype(int)))
    df_map = dict(zip(stats["w"].astype(str), stats["df"].astype(int)))

    def scorer(terms: list[str]):
        def score(t: pa.Table, *, _terms=tuple(terms)) -> pd.DataFrame:
            lst = pc.split_pattern(t["text"], " ").combine_chunks()
            off = np.asarray(lst.offsets, dtype=np.int64)
            lens = np.diff(off)
            w = lst.values.to_numpy(zero_copy_only=False)
            n = len(lens)
            row = np.repeat(np.arange(n, dtype=np.int64), lens)
            total = np.zeros(n, dtype=np.int64)
            for q in _terms:
                tf = np.bincount(row[w == q], minlength=n).astype(np.int64)
                num = (tf * ctot + _QL_MU * cf_map[q]).astype(np.float64)
                den = ((lens + _QL_MU) * ctot).astype(np.float64)
                total += _rd(np.log(num / den) * 1e6, 0).astype(np.int64)
            return pd.DataFrame(
                {"doc_id": t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                 "score_unats": total}
            )
        return score

    s0 = ds.map_batches(scorer(q0), batch_format="pyarrow", zero_copy_batch=True)
    fb = topk(s0, ["score_unats", "doc_id"], [True, False], _PRF_FB).to_pandas()
    fb_ids = set(int(x) for x in fb["doc_id"])

    def fb_tf(t: pa.Table, *, _ids=tuple(sorted(fb_ids))) -> pd.DataFrame:
        ids_arr = np.asarray(_ids, dtype=np.int64)
        vid = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(vid, ids_arr)
        if not keep.any():
            return pd.DataFrame({"w": pd.Series([], dtype=object),
                                 "tf": pd.Series([], dtype="int64")})
        sub = t.filter(pa.array(keep))
        lst = pc.split_pattern(sub["text"], " ").combine_chunks()
        w = lst.values.to_numpy(zero_copy_only=False)
        ww, cc = np.unique(w, return_counts=True)
        return pd.DataFrame({"w": ww, "tf": cc.astype(np.int64)})

    cand = grouped_sums(
        ds.map_batches(fb_tf, batch_format="pyarrow", zero_copy_batch=True),
        ["w"], {"tf": "tf"},
    ).to_pandas()
    cand = cand[~cand["w"].astype(str).isin(q0)]
    dfv = cand["w"].astype(str).map(df_map).to_numpy(np.float64)
    idf = _rd(np.log(float(n_docs) / dfv) * 1e6, 0).astype(np.int64)
    cand = cand.assign(weight=cand["tf"].to_numpy(np.int64) * idf).sort_values(
        ["weight", "w"], ascending=[False, True], ignore_index=True
    ).head(_PRF_EXP)
    exp = [str(x) for x in cand["w"]]

    s1 = ds.map_batches(scorer(q0 + exp), batch_format="pyarrow", zero_copy_batch=True)
    out = topk(s1, ["score_unats", "doc_id"], [True, False], 10).to_pandas()
    out["e1"], out["e2"] = exp[0], exp[1]
    return _i64(out, ["doc_id", "score_unats"]).reset_index(drop=True)


SQL_ROCCHIO_EXPANSION = f"""
WITH w AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS wd FROM documents),
tfd AS (SELECT wd, doc_id, COUNT(*) AS tf FROM w GROUP BY 1, 2),
stats AS (SELECT wd, CAST(SUM(tf) AS BIGINT) AS cf, COUNT(*) AS df
          FROM tfd GROUP BY 1),
ctot AS (SELECT CAST(SUM(cf) AS BIGINT) AS s FROM stats),
nd AS (SELECT COUNT(*) AS n FROM documents),
q0 AS (SELECT wd, cf FROM stats ORDER BY cf DESC, wd LIMIT {_PRF_Q}),
dl AS (SELECT doc_id, LEN(string_split(text, ' ')) AS l FROM documents),
s0 AS (
  SELECT dl.doc_id,
         CAST(SUM(CAST(ROUND(LN(CAST(COALESCE(tfd.tf, 0) * (SELECT s FROM ctot)
                                     + {_QL_MU} * q0.cf AS DOUBLE)
                                / CAST((dl.l + {_QL_MU}) * (SELECT s FROM ctot)
                                       AS DOUBLE)) * 1000000, 0) AS BIGINT))
              AS BIGINT) AS score_unats
  FROM dl CROSS JOIN q0
  LEFT JOIN tfd ON tfd.doc_id = dl.doc_id AND tfd.wd = q0.wd
  GROUP BY 1),
fb AS (SELECT doc_id FROM s0 ORDER BY score_unats DESC, doc_id LIMIT {_PRF_FB}),
cand AS (
  SELECT t.wd, CAST(SUM(t.tf) AS BIGINT) AS tff
  FROM tfd t JOIN fb ON fb.doc_id = t.doc_id
  WHERE t.wd NOT IN (SELECT wd FROM q0)
  GROUP BY 1),
wts AS (
  SELECT c.wd,
         c.tff * CAST(ROUND(LN(CAST((SELECT n FROM nd) AS DOUBLE)
                               / CAST(s.df AS DOUBLE)) * 1000000, 0) AS BIGINT)
           AS weight
  FROM cand c JOIN stats s ON s.wd = c.wd),
exp AS (SELECT wd, ROW_NUMBER() OVER (ORDER BY weight DESC, wd) AS r
        FROM wts ORDER BY weight DESC, wd LIMIT {_PRF_EXP}),
q5 AS (SELECT wd, cf FROM q0
       UNION ALL
       SELECT e.wd, s.cf FROM exp e JOIN stats s ON s.wd = e.wd),
s1 AS (
  SELECT dl.doc_id,
         CAST(SUM(CAST(ROUND(LN(CAST(COALESCE(tfd.tf, 0) * (SELECT s FROM ctot)
                                     + {_QL_MU} * q5.cf AS DOUBLE)
                                / CAST((dl.l + {_QL_MU}) * (SELECT s FROM ctot)
                                       AS DOUBLE)) * 1000000, 0) AS BIGINT))
              AS BIGINT) AS score_unats
  FROM dl CROSS JOIN q5
  LEFT JOIN tfd ON tfd.doc_id = dl.doc_id AND tfd.wd = q5.wd
  GROUP BY 1),
ee AS (SELECT MAX(CASE WHEN r = 1 THEN wd END) AS e1,
              MAX(CASE WHEN r = 2 THEN wd END) AS e2
       FROM exp)
SELECT s1.doc_id, s1.score_unats, ee.e1, ee.e2
FROM s1 CROSS JOIN ee
ORDER BY s1.score_unats DESC, s1.doc_id LIMIT 10
"""


