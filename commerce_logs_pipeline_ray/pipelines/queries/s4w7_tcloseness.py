"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import _i64, _rd, _t, grouped_sums, np, pa, pc, pd  # noqa: F401

# ---------------------------------------------------------------------------
# Session-4 wave 7: t-closeness, feature hashing, logreg step, per-node
# clustering coefficient, gram containment
# ---------------------------------------------------------------------------


def q_t_closeness_audit(sf_dir: str) -> pd.DataFrame:
    """t-closeness privacy audit (Li, Li, Venkatasubramanian ICDE'07): per
    customer nation (the quasi-identifier group), the ordered-EMD distance
    between the group's order-priority distribution and the global one.
    All EMD mass is INTEGER (|cum_g·N − cum·N_g| summed over the 4 interior
    prefixes); the only float is the final normalization, written in the
    same order on both sides, and the flag compare is pure integer
    (emd_u·20 > N_g·N·4 ⇔ t > 0.05).  Distributed shape: broadcast
    customer→nation map into the batch scan, (nation, priority) count
    partials are the only exchange (≤ |nations|×5 rows)."""
    import ray as _ray

    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nat = _t(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    cmap_ref = _ray.put((
        cust["c_custkey"].to_numpy(np.int64),
        cust["c_nationkey"].to_numpy(np.int64)))
    orders = _t(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def part(t: pa.Table) -> pd.DataFrame:
        keys, nks = _ray.get(cmap_ref)
        order = np.argsort(keys)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        nk = nks[order][np.searchsorted(keys[order], ck)]
        p = pc.utf8_slice_codeunits(t["o_orderpriority"], 0, 1)
        pr = pc.cast(p, pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"nk": nk, "p": pr})
        return df.groupby(["nk", "p"], as_index=False).size().rename(
            columns={"size": "n"})

    cnt = (
        orders.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas().groupby(["nk", "p"], as_index=False)["n"].sum()
    )
    grid = cnt.pivot_table(index="nk", columns="p", values="n",
                           aggfunc="sum", fill_value=0)
    for p in range(1, 6):
        if p not in grid.columns:
            grid[p] = 0
    grid = grid[[1, 2, 3, 4, 5]]
    mat = grid.to_numpy(np.int64)
    cum = np.cumsum(mat, axis=1)
    ng = mat.sum(axis=1)
    gcum = cum.sum(axis=0)
    nn = int(ng.sum())
    emd_u = np.abs(cum[:, :4] * nn - gcum[None, :4] * ng[:, None]).sum(axis=1)
    name = nat.set_index("n_nationkey")["n_name"]
    out = pd.DataFrame({
        "nation": name.reindex(grid.index.to_numpy()).to_numpy(),
        "n_orders": ng,
        "emd_u": emd_u,
        "t_closeness": [_rd(e / (g * 1.0 * nn * 4), 6)
                        for e, g in zip(emd_u, ng)],
        "flagged": emd_u * 20 > ng * np.int64(nn) * 4,
    }).sort_values("nation", ignore_index=True)
    return _i64(out, ["n_orders", "emd_u"])


SQL_T_CLOSENESS_AUDIT = """
WITH o AS (
  SELECT c.c_nationkey AS nk, CAST(substr(o_orderpriority, 1, 1) AS INT) AS p
  FROM orders JOIN customer c ON c.c_custkey = o_custkey),
cnt AS (SELECT nk, p, COUNT(*) AS n FROM o GROUP BY 1, 2),
grid AS (
  SELECT d.nk, g.i AS p FROM (SELECT DISTINCT nk FROM o) d,
       generate_series(1, 5) g(i)),
cf AS (
  SELECT grid.nk, grid.p, COALESCE(cnt.n, 0) AS n
  FROM grid LEFT JOIN cnt ON cnt.nk = grid.nk AND cnt.p = grid.p),
cum AS (
  SELECT nk, p,
         CAST(SUM(n) OVER (PARTITION BY nk ORDER BY p) AS BIGINT) AS c,
         CAST(SUM(n) OVER (PARTITION BY nk) AS BIGINT) AS ng
  FROM cf),
g2 AS (
  SELECT p, CAST(SUM(cn) OVER (ORDER BY p) AS BIGINT) AS call
  FROM (SELECT p, SUM(n) AS cn FROM cf GROUP BY p)),
tot AS (SELECT COUNT(*) AS nn FROM o),
emd AS (
  SELECT cum.nk, CAST(SUM(ABS(cum.c * tot.nn - g2.call * cum.ng)) AS BIGINT)
           AS emd_u,
         CAST(MAX(cum.ng) AS BIGINT) AS ng
  FROM cum JOIN g2 USING (p) CROSS JOIN tot
  WHERE cum.p <= 4 GROUP BY cum.nk)
SELECT n.n_name AS nation, emd.ng AS n_orders, emd.emd_u,
       ROUND(emd.emd_u / (emd.ng * 1.0 * tot.nn * 4), 6) AS t_closeness,
       emd.emd_u * 20 > emd.ng * tot.nn * 4 AS flagged
FROM emd JOIN nation n ON n.n_nationkey = emd.nk CROSS JOIN tot
ORDER BY nation
"""


_FH_BUCKETS = 16


def q_feature_hash_collisions(sf_dir: str) -> pd.DataFrame:
    """Hashing-trick collision audit: every DISTINCT corpus token is hashed
    into a fixed bucket space (md5 first-8-hex mod {buckets} — the repo's
    oracle hash convention) and the audit reports the bucket-size histogram
    (size → n_buckets), the quantity that decides whether a hashed feature
    space is too small.  Distributed shape: per-batch distinct-token
    partials, the |vocab|-bounded driver fold runs the md5 (same contract
    as the tokenizer queries — vocab is catalog-sized, not corpus-sized)."""
    import hashlib as _hashlib

    from ...functions.search import TOKEN_SPLIT

    docs = _t(sf_dir, "documents", ["text"])

    def toks(t: pa.Table) -> pa.Table:
        words = pc.split_pattern_regex(pc.utf8_lower(t["text"]), TOKEN_SPLIT)
        flat = words.combine_chunks().flatten() if isinstance(
            words, pa.ChunkedArray) else words.flatten()
        u = pc.unique(flat)
        u = u.filter(pc.not_equal(u, ""))
        return pa.table({"tok": u})

    vocab = sorted(set(
        docs.map_batches(toks, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()["tok"]
    ))
    b = np.array(
        [int(_hashlib.md5(w.encode()).hexdigest()[:8], 16) % _FH_BUCKETS
         for w in vocab], np.int64)
    _, sizes = np.unique(b, return_counts=True)
    s, nb = np.unique(sizes, return_counts=True)
    out = pd.DataFrame({"bucket_size": s.astype(np.int64),
                        "n_buckets": nb.astype(np.int64)})
    return _i64(out.sort_values("bucket_size", ignore_index=True),
                ["bucket_size", "n_buckets"])


SQL_FEATURE_HASH_COLLISIONS = """
WITH toks AS (
  SELECT DISTINCT UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS tok
  FROM documents),
t2 AS (SELECT tok FROM toks WHERE tok <> ''),
b AS (
  SELECT CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % {B} AS bucket
  FROM t2),
sz AS (SELECT bucket, COUNT(*) AS s FROM b GROUP BY 1)
SELECT CAST(s AS BIGINT) AS bucket_size, COUNT(*) AS n_buckets
FROM sz GROUP BY 1 ORDER BY 1
""".replace("{B}", str(_FH_BUCKETS))


def q_logreg_quality_step(sf_dir: str) -> pd.DataFrame:
    """One full-batch logistic-regression gradient step for an is-English
    document classifier from zero weights: at w = 0, σ(w·x) = 0.5 exactly,
    so the gradient is g_j = 0.5·Σx_j − Σ_{y=1}x_j — two INTEGER sums per
    feature (intercept, n_chars, n_words, n_digits) and one exactly-
    representable halving.  The step w_j = −lr·g_j/N is the only float
    expression, written identically in SQL.  Distributed shape: one
    combiner map over documents, 8 scalar partials per batch."""
    docs = _t(sf_dir, "documents", ["text", "lang", "n_chars"])

    def part(t: pa.Table) -> pd.DataFrame:
        y = pc.equal(t["lang"], "en").to_numpy(zero_copy_only=False)
        ones = np.ones(len(t), np.int64)
        chars = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        words = pc.list_value_length(
            pc.split_pattern(t["text"], " ")).to_numpy(zero_copy_only=False
                                                       ).astype(np.int64)
        digits = pc.count_substring_regex(t["text"], "[0-9]").to_numpy(
            zero_copy_only=False).astype(np.int64)
        rows = []
        for name, x in (("x0_intercept", ones), ("x1_n_chars", chars),
                        ("x2_n_words", words), ("x3_n_digits", digits)):
            rows.append((name, int(x.sum()), int(x[y].sum()), int(len(t))))
        return pd.DataFrame(rows, columns=["feature", "sum_all", "sum_pos", "n"])

    p = (
        docs.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas().groupby("feature", as_index=False).sum()
    )
    n = int(p["n"].max())
    grad = 0.5 * p["sum_all"].to_numpy(np.float64) - p["sum_pos"].to_numpy(np.float64)
    out = pd.DataFrame({
        "feature": p["feature"],
        "sum_all": p["sum_all"].astype("int64"),
        "sum_pos": p["sum_pos"].astype("int64"),
        "new_w": [_rd(-0.1 * g / n, 9) + 0.0 for g in grad],
    }).sort_values("feature", ignore_index=True)
    return _i64(out, ["sum_all", "sum_pos"])


SQL_LOGREG_QUALITY_STEP = """
WITH f AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         1 AS x0, n_chars AS x1,
         len(string_split(text, ' ')) AS x2,
         length(regexp_replace(text, '[^0-9]', '', 'g')) AS x3
  FROM documents),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x0) AS BIGINT) AS a0, CAST(SUM(x0 * y) AS BIGINT) AS p0,
         CAST(SUM(x1) AS BIGINT) AS a1, CAST(SUM(x1 * y) AS BIGINT) AS p1,
         CAST(SUM(x2) AS BIGINT) AS a2, CAST(SUM(x2 * y) AS BIGINT) AS p2,
         CAST(SUM(x3) AS BIGINT) AS a3, CAST(SUM(x3 * y) AS BIGINT) AS p3
  FROM f)
SELECT 'x0_intercept' AS feature, a0 AS sum_all, p0 AS sum_pos,
       ROUND(-0.1 * (0.5 * a0 - p0) / n, 9) AS new_w FROM s
UNION ALL
SELECT 'x1_n_chars', a1, p1, ROUND(-0.1 * (0.5 * a1 - p1) / n, 9) FROM s
UNION ALL
SELECT 'x2_n_words', a2, p2, ROUND(-0.1 * (0.5 * a2 - p2) / n, 9) FROM s
UNION ALL
SELECT 'x3_n_digits', a3, p3, ROUND(-0.1 * (0.5 * a3 - p3) / n, 9) FROM s
ORDER BY feature
"""


def q_clustering_coefficient(sf_dir: str) -> pd.DataFrame:
    """Per-node local clustering coefficient of the co-purchase item graph:
    cc(v) = 2·T(v) / (deg(v)·(deg(v)−1)) — ``graph.py::per_node_triangles``
    (degree-oriented wedges, broadcast packed-edge membership, every
    triangle credits its three corners in-bucket).  Only the n_tri and deg
    integers cross the wire; the division is the single float, mirrored in
    SQL.  Nodes of degree < 2 are excluded (coefficient undefined).
    Distinct edges come from the shared once-per-sf-dir artifact
    (graph_edges.py)."""
    from ...functions.graph import per_node_triangles
    from .graph_edges import copurchase_edges_ds

    edges = copurchase_edges_ds(sf_dir, with_count=False).rename_columns(
        {"part_a": "u", "part_b": "v"})
    t = per_node_triangles(edges)
    t = t[t["deg"] >= 2].reset_index(drop=True)
    t["local_cc"] = [
        _rd(2.0 * tri / (d * (d - 1)), 6)
        for tri, d in zip(t["n_tri"], t["deg"])]
    return _i64(t, ["node", "deg", "n_tri"])


SQL_CLUSTERING_COEFFICIENT = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2),
sym AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
deg AS (SELECT u AS node, COUNT(*) AS dg FROM sym GROUP BY 1),
tri AS (
  SELECT s1.u AS node, COUNT(*) AS t
  FROM sym s1 JOIN sym s2 ON s2.u = s1.u AND s1.v < s2.v
  JOIN e ON e.u = s1.v AND e.v = s2.v
  GROUP BY 1)
SELECT CAST(deg.node AS BIGINT) AS node, CAST(deg.dg AS BIGINT) AS deg,
       CAST(COALESCE(tri.t, 0) AS BIGINT) AS n_tri,
       ROUND(2.0 * COALESCE(tri.t, 0) / (deg.dg * (deg.dg - 1)), 6)
         AS local_cc
FROM deg LEFT JOIN tri ON tri.node = deg.node
WHERE deg.dg >= 2 ORDER BY node
"""


def q_containment_pairs(sf_dir: str) -> pd.DataFrame:
    """Near-containment pairs (Broder's containment |A∩B|/|A| ≥ 0.6 over
    distinct word-3-gram sets, df-capped): the 'is this doc subsumed by
    that one' dedup signal that Jaccard misses when sizes differ.  Same
    one-gram-exchange machinery as ``ngram_jaccard_pairs`` with ordered
    scoring; oracle computes identical df-capped containment from string
    3-grams."""
    from ...functions.grams import ngram_jaccard_pairs

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    return ngram_jaccard_pairs(docs, k=3, threshold=0.6, max_df=100,
                               metric="containment")


SQL_CONTAINMENT_PAIRS = """
WITH w AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents),
g AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
  FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(i)),
keep AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) <= 100),
gf AS (SELECT g.* FROM g JOIN keep USING (gram)),
sz AS (SELECT doc_id, COUNT(*) AS n FROM gf GROUP BY doc_id),
pr AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM gf a JOIN gf b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
bidir AS (
  SELECT pr.doc_a, pr.doc_b, pr.inter, sa.n AS na
  FROM pr JOIN sz sa ON sa.doc_id = pr.doc_a
  UNION ALL
  SELECT pr.doc_b, pr.doc_a, pr.inter, sb.n
  FROM pr JOIN sz sb ON sb.doc_id = pr.doc_b)
SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
       CAST(inter AS BIGINT) AS n_shared,
       ROUND(inter * 1.0 / na, 6) AS containment
FROM bidir WHERE inter * 1.0 / na >= 0.6
ORDER BY doc_a, doc_b
"""


