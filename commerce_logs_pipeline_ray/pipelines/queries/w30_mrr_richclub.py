"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import _i64, _rd, _t, grouped_sums, np, pa, pc, pd, topk  # noqa: F401
from .cusum_twap import _copurchase_weighted_edges  # noqa: F401
from .w20_gorilla_ql import _QL_MU  # noqa: F401

# ---------------------------------------------------------------------------
# Wave 30: MRR retrieval eval, rich-club coefficient
# ---------------------------------------------------------------------------

_MRR_TERMS = 5


def q_mrr_eval(sf_dir: str) -> pd.DataFrame:
    """Mean-reciprocal-rank retrieval eval (completes the eval family next
    to nDCG and RBO): for each of the 5 most frequent terms, rank EVERY doc
    by its single-term Dirichlet µnat score and report the rank of the
    first doc actually containing the term — non-trivial because smoothing
    can rank a short non-containing doc above a long containing one.  One
    scoring scan emits (term, score, rel) per doc; the best-relevant per
    term is a grouped top-1 prune; a second counting pass closes the exact
    rank without any global sort.  rr_ppm = 10⁶ // rank keeps the
    reciprocal integer."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def wc_partial(t: pa.Table) -> pd.DataFrame:
        lst = pc.split_pattern(t["text"], " ").combine_chunks()
        w = lst.values.to_numpy(zero_copy_only=False)
        ww, cc = np.unique(w, return_counts=True)
        return pd.DataFrame({"w": ww, "c": cc.astype(np.int64)})

    wc = grouped_sums(
        ds.map_batches(wc_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["w"], {"c": "c"},
    )
    top = topk(wc, ["c", "w"], [True, False], _MRR_TERMS).to_pandas()
    terms = [str(x) for x in top["w"]]
    cfs = {str(w): int(c) for w, c in zip(top["w"], top["c"])}
    ctot = int(wc.map_batches(
        lambda t: pa.table({"s": pa.array([pc.sum(t["c"]).as_py() or 0], pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True,
    ).to_pandas()["s"].sum())

    def score_rows(t: pa.Table) -> pd.DataFrame:
        lst = pc.split_pattern(t["text"], " ").combine_chunks()
        off = np.asarray(lst.offsets, dtype=np.int64)
        lens = np.diff(off)
        w = lst.values.to_numpy(zero_copy_only=False)
        n = len(lens)
        row = np.repeat(np.arange(n, dtype=np.int64), lens)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        frames = []
        for q in terms:
            tf = np.bincount(row[w == q], minlength=n).astype(np.int64)
            num = (tf * ctot + _QL_MU * cfs[q]).astype(np.float64)
            den = ((lens + _QL_MU) * ctot).astype(np.float64)
            s = _rd(np.log(num / den) * 1e6, 0).astype(np.int64)
            frames.append(pd.DataFrame(
                {"term": q, "doc_id": ids, "score": s, "rel": (tf > 0).astype(np.int64)}
            ))
        return pd.concat(frames, ignore_index=True)

    scored = ds.map_batches(score_rows, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()

    from ...functions.relational import grouped_topk

    rel = scored.map_batches(
        lambda t: t.filter(pc.equal(t["rel"], 1)),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    best = grouped_topk(rel, ["term"], ["score", "doc_id"], [True, False], 1).to_pandas()
    star = {str(r["term"]): (int(r["score"]), int(r["doc_id"]))
            for _, r in best.iterrows()}

    def rank_partial(t: pa.Table, *, _star=star) -> pd.DataFrame:
        df = t.to_pandas()
        rows = []
        for q, (s, d) in _star.items():
            sub = df[df["term"] == q]
            ahead = int(((sub["score"] > s)
                         | ((sub["score"] == s) & (sub["doc_id"] < d))).sum())
            rows.append((q, ahead))
        return pd.DataFrame(rows, columns=["term", "ahead"])

    ranks = grouped_sums(
        scored.map_batches(rank_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["term"], {"ahead": "ahead"},
    ).to_pandas()
    ranks["rank"] = ranks["ahead"].astype(np.int64) + 1
    ranks["first_rel_doc"] = ranks["term"].map({q: d for q, (_, d) in star.items()})
    ranks["rr_ppm"] = 1_000_000 // ranks["rank"]
    out = ranks[["term", "first_rel_doc", "rank", "rr_ppm"]].sort_values(
        "term", ignore_index=True
    )
    return _i64(out, ["first_rel_doc", "rank", "rr_ppm"])


SQL_MRR_EVAL = f"""
WITH w AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS wd FROM documents),
cnt AS (SELECT wd, COUNT(*) AS c FROM w GROUP BY 1),
ctot AS (SELECT CAST(SUM(c) AS BIGINT) AS s FROM cnt),
q AS (SELECT wd, c FROM cnt ORDER BY c DESC, wd LIMIT {_MRR_TERMS}),
dl AS (SELECT doc_id, LEN(string_split(text, ' ')) AS l FROM documents),
tf AS (SELECT w.doc_id, q.wd, COUNT(*) AS f
       FROM w JOIN q ON q.wd = w.wd GROUP BY 1, 2),
sc AS (
  SELECT q.wd AS term, dl.doc_id,
         CAST(ROUND(LN(CAST(COALESCE(tf.f, 0) * (SELECT s FROM ctot)
                            + {_QL_MU} * q.c AS DOUBLE)
                       / CAST((dl.l + {_QL_MU}) * (SELECT s FROM ctot) AS DOUBLE))
                    * 1000000, 0) AS BIGINT) AS score,
         CASE WHEN COALESCE(tf.f, 0) > 0 THEN 1 ELSE 0 END AS rel
  FROM dl CROSS JOIN q
  LEFT JOIN tf ON tf.doc_id = dl.doc_id AND tf.wd = q.wd),
rk AS (SELECT term, doc_id, rel,
              ROW_NUMBER() OVER (PARTITION BY term
                                 ORDER BY score DESC, doc_id) AS rn
       FROM sc),
fr AS (SELECT term, MIN(rn) AS rank FROM rk WHERE rel = 1 GROUP BY 1),
fd AS (SELECT rk.term, rk.doc_id AS first_rel_doc
       FROM rk JOIN fr ON fr.term = rk.term AND fr.rank = rk.rn)
SELECT fr.term, fd.first_rel_doc, CAST(fr.rank AS BIGINT) AS rank,
       1000000 // fr.rank AS rr_ppm
FROM fr JOIN fd ON fd.term = fr.term
ORDER BY fr.term
"""


_RICH_KS = [2, 4, 8, 16]


def q_rich_club_coefficient(sf_dir: str) -> pd.DataFrame:
    """Rich-club coefficient of the co-purchase graph (Colizza et al. 2006):
    for degree thresholds k, the density φ(k) = 2·E_k / (N_k·(N_k−1)) among
    nodes with degree > k — do the hubs trade with each other?  Degrees come
    from one bounded grouped count; ONE broadcast edge scan evaluates all
    four thresholds with vectorized masks; the division is the only float.
    N_k < 2 releases NULL/NaN on both engines."""
    import ray as _ray

    edges = _copurchase_weighted_edges(sf_dir).materialize()
    deg = grouped_sums(edges, ["src"], {}, "deg").to_pandas()
    nodes = deg["src"].to_numpy(np.int64)
    order = np.argsort(nodes)
    ref = _ray.put((nodes[order], deg["deg"].to_numpy(np.int64)[order]))

    def part(t: pa.Table, *, _ref=ref) -> pd.DataFrame:
        keys, dv = _ray.get(_ref)
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        e = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s < e  # undirected edges once
        ds_ = dv[np.searchsorted(keys, s[keep])]
        de = dv[np.searchsorted(keys, e[keep])]
        rows = [(k, int(((ds_ > k) & (de > k)).sum())) for k in _RICH_KS]
        return pd.DataFrame(rows, columns=["k", "e_k"])

    ek = grouped_sums(
        edges.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["k"], {"e_k": "e_k"},
    ).to_pandas().set_index("k")["e_k"].to_dict()
    dv = deg["deg"].to_numpy(np.int64)
    rows = []
    for k in _RICH_KS:
        nk = int((dv > k).sum())
        e_k = int(ek.get(k, 0))
        phi = (float("nan") if nk < 2
               else _rd(2.0 * float(e_k) / (float(nk) * float(nk - 1)), 6))
        rows.append((k, nk, e_k, phi))
    out = pd.DataFrame(rows, columns=["k", "n_nodes", "n_edges", "phi"])
    return _i64(out, ["k", "n_nodes", "n_edges"])


SQL_RICH_CLUB_COEFFICIENT = """
WITH pairs AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON b.l_orderkey = a.l_orderkey AND a.l_partkey <> b.l_partkey),
deg AS (SELECT src AS node, COUNT(*) AS deg FROM pairs GROUP BY 1),
ks AS (SELECT UNNEST([2, 4, 8, 16]) AS k),
nk AS (SELECT ks.k, COUNT(deg.node) AS n_nodes
       FROM ks LEFT JOIN deg ON deg.deg > ks.k GROUP BY 1),
ek AS (SELECT ks.k,
              CAST(SUM(CASE WHEN ds.deg > ks.k AND de.deg > ks.k
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_edges
       FROM ks, pairs e
       JOIN deg ds ON ds.node = e.src JOIN deg de ON de.node = e.dst
       WHERE e.src < e.dst
       GROUP BY 1)
SELECT nk.k, nk.n_nodes, COALESCE(ek.n_edges, 0) AS n_edges,
       CASE WHEN nk.n_nodes < 2 THEN NULL
            ELSE ROUND(2.0 * COALESCE(ek.n_edges, 0)
                       / (CAST(nk.n_nodes AS DOUBLE) * (nk.n_nodes - 1)), 6)
       END AS phi
FROM nk LEFT JOIN ek ON ek.k = nk.k
ORDER BY nk.k
"""


