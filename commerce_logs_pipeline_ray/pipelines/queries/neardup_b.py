"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import (
    ORACLE_ARTIFACT_DIR,
    _corpus_dir,
    _i64,
    _rd,
    _t,
    grouped_sums,
    md5_hex,
    np,
    pa,
    pc,
    pd,
    pq,
    rd,
    topk,
)  # noqa: F401
from .neardup_a import BFS_MAX_HOPS, _ensure_artifact, ensure_derived_parquet  # noqa: F401

SQL_TOKEN_BFS = f"""
WITH RECURSIVE e AS (
  SELECT src, dst FROM read_parquet('{{AD}}/token_edges.parquet')
),
b(token, hops) AS (
  SELECT (SELECT MIN(src) FROM e), 0
  UNION
  SELECT e.dst, b.hops + 1 FROM b JOIN e ON e.src = b.token
  WHERE b.hops < {BFS_MAX_HOPS}
)
SELECT token, MIN(hops) AS hops FROM b GROUP BY 1 ORDER BY 1
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


KMEANS_K = 8
KMEANS_ITERS = 5


def q_embedding_kmeans(sf_dir: str) -> pd.DataFrame:
    """Deterministic Lloyd k-means over the embedding corpus —
    ``sim.py::lloyd_kmeans``: centroids broadcast per iteration, per-batch
    (n, Σx) partials, only k·d floats reduce.  Oracle = the SAME fixed
    iteration unrolled as a MATERIALIZED CTE chain using ``list_distance``
    argmin with identical tie-break (lowest cluster)."""
    from ...functions.sim import lloyd_kmeans

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    C, counts = lloyd_kmeans(ds, k=KMEANS_K, iters=KMEANS_ITERS)
    norms = np.sqrt((C * C).sum(axis=1))
    out = pd.DataFrame({"cluster": np.arange(KMEANS_K, dtype="int64")})
    out = out.merge(counts, on="cluster", how="left").fillna({"n": 0})
    out["cent_norm"] = _rd(norms, 5)
    return _i64(out, ["cluster", "n"])


def _kmeans_cte_parts(k: int, iters: int) -> list:
    """The shared deterministic Lloyd chain (x, c0, a_i, c_{i+1} CTEs) —
    reused by the k-means and semantic-dedup oracles."""
    parts = [
        "WITH x AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)",
        f"""c0 AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster, emb AS cent
  FROM (SELECT vec_id, emb FROM x ORDER BY vec_id LIMIT {k}))""",
    ]
    for i in range(iters):
        parts.append(
            f"""a{i} AS MATERIALIZED (
  SELECT vec_id, emb, cluster FROM (
    SELECT x.vec_id, x.emb, c.cluster,
           ROW_NUMBER() OVER (
             PARTITION BY x.vec_id ORDER BY list_distance(x.emb, c.cent), c.cluster
           ) AS rn
    FROM x CROSS JOIN c{i} c
  ) WHERE rn = 1)"""
        )
        parts.append(
            f"""c{i + 1} AS MATERIALIZED (
  SELECT c.cluster, COALESCE(n.cent, c.cent) AS cent
  FROM c{i} c LEFT JOIN (
    SELECT cluster, list(m ORDER BY i) AS cent FROM (
      SELECT cluster, i, AVG(v) AS m FROM (
        SELECT cluster, UNNEST(emb) AS v, generate_subscripts(emb, 1) AS i FROM a{i}
      ) GROUP BY 1, 2
    ) GROUP BY 1
  ) n ON n.cluster = c.cluster)"""
        )
    return parts


def _kmeans_sql(k: int, iters: int) -> str:
    parts = _kmeans_cte_parts(k, iters)
    parts.append(
        f"""fin AS (
  SELECT cluster, COUNT(*) AS n FROM (
    SELECT vec_id, cluster FROM (
      SELECT x.vec_id, c.cluster,
             ROW_NUMBER() OVER (
               PARTITION BY x.vec_id ORDER BY list_distance(x.emb, c.cent), c.cluster
             ) AS rn
      FROM x CROSS JOIN c{iters} c
    ) WHERE rn = 1
  ) GROUP BY 1)"""
    )
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT c.cluster, COALESCE(f.n, 0) AS n,\n"
        f"       ROUND(sqrt(list_inner_product(c.cent, c.cent)), 5) AS cent_norm\n"
        f"FROM c{iters} c LEFT JOIN fin f ON f.cluster = c.cluster ORDER BY 1"
    )


SQL_EMBEDDING_KMEANS = _kmeans_sql(KMEANS_K, KMEANS_ITERS)


SEMDEDUP_TAU = 0.5


def q_semantic_dedup(sf_dir: str) -> pd.DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    k-means-cluster the embeddings, then within each cluster drop any
    vector having a LOWER-id neighbor at cosine ≥ τ (keep-min-id — the
    same survivor convention as exact dedup).  Clustering makes the
    near-dup scan local: candidate pairs never cross clusters, so the
    only exchange is the cluster-keyed co-group.

    Scale shape: centroids broadcast (k·d floats); assignment is one
    vectorized pass; the per-cluster all-pairs is O((N/k)²·d) per group —
    at 100 TB raise k so clusters fit a worker and tile the in-cluster
    scan with the block-pair tasks from ``embedding_neardup_pairs``.
    Oracle: the SAME unrolled Lloyd chain as ``embedding_kmeans`` plus a
    correlated EXISTS over in-cluster lower-id cosine neighbors."""
    import ray

    from ...functions.sim import _to_matrix, lloyd_kmeans

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    C, _counts = lloyd_kmeans(ds, k=KMEANS_K, iters=KMEANS_ITERS)
    cref = ray.put(C)

    def assign(t: pa.Table) -> pa.Table:
        cents = ray.get(cref) if not isinstance(cref, np.ndarray) else cref
        mat = _to_matrix(t, "embedding")
        d2 = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        cl = d2.argmin(axis=1)  # ties → lowest cluster, like the SQL rn=1
        return pa.table(
            {"vec_id": t["vec_id"], "cluster": pa.array(cl.astype(np.int64)),
             "embedding": t["embedding"]}
        )

    asg = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)

    def in_cluster_dedup(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("vec_id", ignore_index=True)
        M = np.stack(df["embedding"].to_numpy())
        norms = np.sqrt((M * M).sum(axis=1))
        cos = (M @ M.T) / np.outer(norms, norms)
        dropped = np.tril(cos >= SEMDEDUP_TAU, k=-1).any(axis=1)
        return pd.DataFrame(
            {"cluster": [int(df["cluster"].iloc[0])], "n": [len(df)],
             "n_dropped": [int(dropped.sum())]}
        )

    out = asg.groupby("cluster").map_groups(in_cluster_dedup, batch_format="pandas").to_pandas()
    out = out.sort_values("cluster", ignore_index=True)
    return _i64(out, ["cluster", "n", "n_dropped"])


def _semantic_dedup_sql(k: int, iters: int, tau: float) -> str:
    parts = _kmeans_cte_parts(k, iters)
    parts.append(
        f"""asg AS MATERIALIZED (
  SELECT vec_id, emb, cluster FROM (
    SELECT x.vec_id, x.emb, c.cluster,
           ROW_NUMBER() OVER (
             PARTITION BY x.vec_id ORDER BY list_distance(x.emb, c.cent), c.cluster
           ) AS rn
    FROM x CROSS JOIN c{iters} c
  ) WHERE rn = 1)"""
    )
    parts.append(
        f"""drops AS (
  SELECT a.cluster, a.vec_id,
         CASE WHEN EXISTS (
           SELECT 1 FROM asg b
           WHERE b.cluster = a.cluster AND b.vec_id < a.vec_id
             AND list_inner_product(a.emb, b.emb)
                 / (sqrt(list_inner_product(a.emb, a.emb))
                    * sqrt(list_inner_product(b.emb, b.emb))) >= {tau}
         ) THEN 1 ELSE 0 END AS dropped
  FROM asg a)"""
    )
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT cluster, COUNT(*) AS n, CAST(SUM(dropped) AS BIGINT) AS n_dropped\n"
        f"FROM drops GROUP BY 1 ORDER BY 1"
    )


SQL_SEMANTIC_DEDUP = _semantic_dedup_sql(KMEANS_K, KMEANS_ITERS, SEMDEDUP_TAU)


def q_pmi_topk(sf_dir: str) -> pd.DataFrame:
    """Top-20 token collocations by PMI (support ≥ 5) —
    ``tokens.py::pmi_topk``: the support filter runs INSIDE the bigram
    reduce (all partials of a key share a bucket), so only survivors and
    per-bucket mass sentinels reach the driver."""
    from ...functions.tokens import pmi_topk

    ds = rd.read_parquet(ensure_derived_parquet(sf_dir), columns=["tokens"], override_num_blocks=8)
    return pmi_topk(ds, k=20, min_count=5)


SQL_PMI_TOPK = f"""
WITH seq AS (SELECT tokens FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')),
z AS (
  SELECT UNNEST(list_zip(tokens[1:len(tokens) - 1], tokens[2:len(tokens)])) AS p
  FROM seq WHERE len(tokens) >= 2
),
bi AS (SELECT CAST(p[1] AS BIGINT) AS a, CAST(p[2] AS BIGINT) AS b, COUNT(*) AS c
       FROM z GROUP BY 1, 2),
uni AS (SELECT CAST(token AS BIGINT) AS tok, COUNT(*) AS c
        FROM (SELECT UNNEST(tokens) AS token FROM seq) GROUP BY 1),
tb AS (SELECT CAST(SUM(c) AS DOUBLE) AS t FROM bi),
tu AS (SELECT CAST(SUM(c) AS DOUBLE) AS t FROM uni)
SELECT bi.a AS token_a, bi.b AS token_b, bi.c AS "count",
       ROUND(ln((bi.c / tb.t) / ((ua.c / tu.t) * (ub.c / tu.t))), 6) AS pmi
FROM bi CROSS JOIN tb CROSS JOIN tu
JOIN uni ua ON ua.tok = bi.a
JOIN uni ub ON ub.tok = bi.b
WHERE bi.c >= 5
ORDER BY ln((bi.c / tb.t) / ((ua.c / tu.t) * (ub.c / tu.t))) DESC, token_a, token_b
LIMIT 20
"""


SEARCH_TERMS = ["join", "hash", "batch"]


def q_index_term_stats(sf_dir: str) -> pd.DataFrame:
    """Inverted-index build observed as per-term stats (document frequency +
    total tf, top-20 by df) — ``functions/search.py``: vectorized RE2
    tokenize per batch, one grouped exchange on the term."""
    from ...functions.search import index_term_stats, postings

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return index_term_stats(postings(ds), k=20)


SQL_INDEX_TERM_STATS = """
WITH toks AS (
  SELECT doc_id, UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks WHERE term <> '' GROUP BY 1, 2)
SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf
FROM tf GROUP BY term ORDER BY df DESC, term LIMIT 20
"""


def q_keyword_search(sf_dir: str) -> pd.DataFrame:
    """Conjunctive keyword search (docs containing ALL of join/hash/batch,
    scored by summed tf): broadcast term filter at the scan, per-doc
    grouped reduce with a HAVING-count conjunctive gate, deterministic
    top-20."""
    from ...functions.search import conjunctive_search, postings

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return conjunctive_search(postings(ds), SEARCH_TERMS, k=20)


SQL_KEYWORD_SEARCH = """
WITH toks AS (
  SELECT doc_id, UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
       WHERE term IN ('join', 'hash', 'batch') GROUP BY 1, 2)
SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS score
FROM tf GROUP BY doc_id HAVING COUNT(*) = 3
ORDER BY score DESC, doc_id LIMIT 20
"""


def q_value_trend_per_type(sf_dir: str) -> pd.DataFrame:
    """Per-group OLS slope + Pearson correlation of value vs time (drift
    detector) from MERGEABLE sufficient statistics, two streaming passes:
    (1) per-type means; (2) broadcast means → centered product partials per
    batch (numerically stable — no Σxy−ΣxΣy/n cancellation) → tiny reduce.
    The oracle mirrors the same centered formula in SQL (not DuckDB's
    ``regr_slope``) so both sides round identically."""
    ds = _t(sf_dir, "events", ["event_type", "ts", "value"])
    day_us = 86_400_000_000.0

    def base(t: pa.Table) -> pa.Table:
        micros = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        x = pc.divide(pc.cast(micros, pa.float64()), day_us)
        return pa.table({"event_type": t["event_type"], "x": x, "y": t["value"]})

    xy = ds.map_batches(base, batch_format="pyarrow", zero_copy_batch=True)

    def mean_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type"]).aggregate([("x", "sum"), ("y", "sum"), ("x", "count")])
        return g.rename_columns(["event_type", "sx", "sy", "n"])

    means = grouped_sums(
        xy.map_batches(mean_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type"], {"sx": "sx", "sy": "sy", "n": "n"}, reduce="driver",
    ).to_pandas()
    means["ax"] = means["sx"] / means["n"]
    means["ay"] = means["sy"] / means["n"]
    ax = dict(zip(means["event_type"], means["ax"]))
    ay = dict(zip(means["event_type"], means["ay"]))

    def centered_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"event_type": t["event_type"].to_pandas(), "x": t["x"].to_pandas(), "y": t["y"].to_pandas()}
        )
        dx = df["x"] - df["event_type"].map(ax)
        dy = df["y"] - df["event_type"].map(ay)
        part = pd.DataFrame(
            {"event_type": df["event_type"], "sxy": dx * dy, "sxx": dx * dx, "syy": dy * dy}
        )
        return pa.Table.from_pandas(
            part.groupby("event_type", as_index=False).sum(), preserve_index=False
        )

    mom = grouped_sums(
        xy.map_batches(centered_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type"], {"sxy": "sxy", "sxx": "sxx", "syy": "syy"}, reduce="driver",
    ).to_pandas()
    out = mom.merge(means[["event_type", "n"]], on="event_type")
    out["slope"] = (out["sxy"] / out["sxx"]).pipe(_rd)
    out["corr_xy"] = (out["sxy"] / np.sqrt(out["sxx"] * out["syy"])).pipe(_rd)
    out = out[["event_type", "n", "slope", "corr_xy"]]
    return _i64(out, ["n"])


SQL_VALUE_TREND_PER_TYPE = """
WITH b AS (
  SELECT event_type, epoch(ts) / 86400.0 AS x, value AS y FROM events
), m AS (
  SELECT event_type, AVG(x) AS ax, AVG(y) AS ay, COUNT(*) AS n FROM b GROUP BY 1
)
SELECT b.event_type AS event_type, MAX(m.n) AS n,
       ROUND(SUM((x - ax) * (y - ay)) / SUM((x - ax) * (x - ax)), 6) AS slope,
       ROUND(SUM((x - ax) * (y - ay))
             / sqrt(SUM((x - ax) * (x - ax)) * SUM((y - ay) * (y - ay))), 6) AS corr_xy
FROM b JOIN m ON b.event_type = m.event_type
GROUP BY 1
"""


def q_copurchase_pairs(sf_dir: str) -> pd.DataFrame:
    """Item co-occurrence mining (parts bought together in one order):
    hash exchange on l_orderkey, vectorized within-bucket self-merge (group
    sizes are bounded — ≤ order width — so the pair blow-up is ≤ w² per
    order, never corpus-quadratic), per-bucket pair counts as combiner
    partials, distributed pair reduce, top-50 with full deterministic
    tie-break.  The pair exchange itself now runs once per sf-dir via the
    shared artifact (graph_edges.py)."""
    from .graph_edges import copurchase_edges_ds

    agg = copurchase_edges_ds(sf_dir).rename_columns({"c": "n"})
    out = topk(agg, ["n", "part_a", "part_b"], [True, False, False], 50).to_pandas()
    return _i64(out, ["part_a", "part_b", "n"])


SQL_COPURCHASE_PAIRS = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n
FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n DESC, part_a, part_b
LIMIT 50
"""


def ensure_dirty_names_parquet(sf_dir: str) -> str:
    """Deterministic dirty-record corpus for entity resolution: every part
    name SUFFIXED with its zero-padded key (part names repeat heavily —
    64 distinct strings for 20k parts at sf0.1 — so bare names would make
    every fuzzy self-join's OUTPUT quadratic in the cluster size; the key
    suffix keeps true-match clusters per-part and the result linear, which
    is the shape this operator must have at 100 TB), plus hash-chosen typo
    variants (substitution for every part, an extra deletion for every
    third part) — rec_id = p_partkey·10 + variant.  ASCII-only by
    construction (DuckDB ``levenshtein`` counts bytes; the Ray kernel
    counts codepoints — identical on ASCII)."""
    import hashlib as _hashlib
    import os as _os

    def build() -> pa.Table:
        t = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"])
        ids, names = [], []
        for k, base in zip(t["p_partkey"].to_pylist(), t["p_name"].to_pylist()):
            nm = f"{base} {k % 1_000_000:06d}"
            ids.append(k * 10)
            names.append(nm)
            h = _hashlib.md5(str(k).encode()).digest()
            pos = h[0] % len(nm)
            repl = chr(ord("a") + h[1] % 26)
            if repl == nm[pos]:
                repl = chr(ord("a") + (h[1] + 1) % 26)
            ids.append(k * 10 + 1)
            names.append(nm[:pos] + repl + nm[pos + 1 :])
            if k % 3 == 0:
                pos2 = h[2] % (len(nm) - 1) + 1  # keep char 0: prefix block survives
                ids.append(k * 10 + 2)
                names.append(nm[:pos2] + nm[pos2 + 1 :])
        return pa.table({"rec_id": pa.array(ids, pa.int64()), "name": pa.array(names)})

    return _ensure_artifact(_os.path.join(_corpus_dir(sf_dir), "dirty_names_v2.parquet"), build)


def q_record_linkage(sf_dir: str) -> pd.DataFrame:
    """Blocked entity resolution over the dirty-name corpus —
    ``functions/linkage.py::link_records``: prefix/suffix multi-pass
    SORTED-NEIGHBORHOOD blocking (each record vs its 8 successors in the
    block's sort order — O(n·w) candidates even on shared-prefix blocks),
    one block-key exchange, vectorized batch-Levenshtein verify (numpy DP
    swept across all pairs at once), distributed pair dedup."""
    from ...functions.linkage import link_records

    ds = rd.read_parquet(ensure_dirty_names_parquet(sf_dir), override_num_blocks=4)
    out = link_records(ds, max_dist=2).to_pandas()
    out = out.sort_values(["id_a", "id_b"], ignore_index=True)
    return _i64(out, ["id_a", "id_b", "dist"])


SQL_RECORD_LINKAGE = """
WITH r AS (SELECT rec_id, name FROM read_parquet('{AD}/dirty_names_v2.parquet')),
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
                  levenshtein(a.name, b.name) AS dist
  FROM o a JOIN o b
    ON a.bk = b.bk AND b.rn - a.rn BETWEEN 1 AND 8
  WHERE abs(length(a.name) - length(b.name)) <= 2
)
SELECT id_a, id_b, CAST(dist AS BIGINT) AS dist
FROM c WHERE dist <= 2
ORDER BY 1, 2
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


def q_skew_join_nation_value(sf_dir: str) -> pd.DataFrame:
    """Events × customer inner join via ``relational.py::skew_join``: hot
    user_ids (detected from a deterministic hash sample, no full groupby)
    take a broadcast m:n merge of their matching dim rows; the cold
    remainder takes the exchange join with hot keys removed from BOTH
    sides — no partition ever receives a hot key's row flood.  The split is
    correctness-neutral (row multiset == plain join for ANY split), which
    is exactly what the plain-SQL-join oracle checks."""
    from ...functions.relational import skew_join

    ev = _t(sf_dir, "events", ["user_id", "value"])
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    # threshold sized so the synthetic stream's heaviest users DO take the
    # hot path at every sf (events-per-user ~ uniform); detection stays on
    # hot keys cover ~the whole stream here, so the residual cold exchange
    # needs few aggregators (spin-up is per-partition, ~100ms each)
    joined = skew_join(
        ev, cust, on="user_id", right_on="c_custkey", hot_threshold=100, num_partitions=2
    )
    agg = grouped_sums(joined, ["c_nationkey"], {"total_value": "value"}, "n").to_pandas()
    agg["total_value"] = agg["total_value"].pipe(_rd, 2)
    out = agg.sort_values("c_nationkey", ignore_index=True)
    return _i64(out, ["c_nationkey", "n"])


SQL_SKEW_JOIN_NATION_VALUE = """
SELECT c_nationkey, ROUND(SUM(value), 2) AS total_value, COUNT(*) AS n
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1 ORDER BY 1
"""


def q_peak_rolling_value(sf_dir: str) -> pd.DataFrame:
    """Frame-window aggregate (ROWS BETWEEN 4 PRECEDING AND CURRENT ROW):
    each user's PEAK 5-event trailing mean of ``value`` — the moving-average
    window shape, distributed like every window here (one user_id exchange,
    vectorized pandas rolling per bucket; a user never spans buckets so the
    per-bucket row is final).  Bit-exact float parity with the SQL oracle:
    the mean runs over int64 CENTS (exact in float64 add/remove), and both
    sides do the identical sum/count then /100 divisions."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        df["__c"] = np.rint(df["value"].to_numpy() * 100.0)
        g = df.groupby("user_id", sort=False)["__c"]
        ma = g.rolling(5, min_periods=1).sum().to_numpy() / g.rolling(5, min_periods=1).count().to_numpy()
        peak = pd.DataFrame({"user_id": df["user_id"].to_numpy(), "__ma": ma}).groupby(
            "user_id", as_index=False
        )["__ma"].max()
        peak["peak_ma5_value"] = (peak["__ma"] / 100.0).pipe(_rd)
        return peak[["user_id", "peak_ma5_value"]]

    out = bucketed_group_reduce(ds, ["user_id"], per_bucket).to_pandas()
    return _i64(out.sort_values("user_id", ignore_index=True), ["user_id"])


SQL_PEAK_ROLLING_VALUE = """
WITH c AS (
  SELECT user_id, ts, event_id, CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events
), w AS (
  SELECT user_id,
         AVG(cents) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
         ) AS ma
  FROM c
)
SELECT user_id, ROUND(MAX(ma) / 100.0, 6) AS peak_ma5_value
FROM w GROUP BY 1 ORDER BY 1
"""


def q_burst_detection(sf_dir: str) -> pd.DataFrame:
    """Peak 1-hour event burst per user (time-RANGE frame window) —
    ``windows.py::range_window_peak``: per-key disjoint-band remap turns
    the whole bucket's sliding-window counts into two global searchsorted
    calls; SQL RANGE peer-row semantics matched exactly."""
    from ...functions.windows import range_window_peak

    ds = _t(sf_dir, "events", ["user_id", "ts"])
    out = range_window_peak(ds, window_seconds=3600, out_name="max_burst_1h")
    return _i64(out, ["user_id", "max_burst_1h"])


SQL_BURST_DETECTION = """
WITH w AS (
  SELECT user_id,
         COUNT(*) OVER (
           PARTITION BY user_id ORDER BY ts
           RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
         ) AS c
  FROM events
)
SELECT user_id, MAX(c) AS max_burst_1h FROM w GROUP BY 1 ORDER BY 1
"""


def q_copurchase_triangles(sf_dir: str) -> pd.DataFrame:
    """Exact triangle count + global clustering coefficient of the
    co-purchase item graph — ``graph.py::triangle_stats``: degree-oriented
    wedge generation (max out-degree O(√m) even on hub items) + pair-keyed
    membership co-group; no edge-set broadcast anywhere.  Distinct canonical
    edges come from the shared once-per-sf-dir artifact (graph_edges.py)."""
    from ...functions.graph import triangle_stats
    from .graph_edges import copurchase_edges_ds

    edges = copurchase_edges_ds(sf_dir, with_count=False).rename_columns(
        {"part_a": "u", "part_b": "v"})
    return triangle_stats(edges)


SQL_COPURCHASE_TRIANGLES = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
deg AS (
  SELECT node, COUNT(*) AS dg
  FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e) GROUP BY 1
),
w AS (SELECT CAST(SUM(dg * (dg - 1) // 2) AS BIGINT) AS n_wedges FROM deg),
t AS (
  SELECT COUNT(*) AS n_triangles
  FROM e e1 JOIN e e2 ON e2.u = e1.v JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT (SELECT COUNT(*) FROM e) AS n_edges,
       (SELECT n_wedges FROM w) AS n_wedges,
       (SELECT n_triangles FROM t) AS n_triangles,
       ROUND(3.0 * (SELECT n_triangles FROM t) / (SELECT n_wedges FROM w), 9) AS global_cc
"""


FUNNEL_STAGES = ["view", "click", "purchase"]


def q_funnel_stages(sf_dir: str) -> pd.DataFrame:
    """Ordered conversion funnel view→click→purchase (min-ts semantics,
    strict ordering) — ``functions/windows.py::funnel_counts``: one hash
    exchange on user_id over the 3 pre-filtered event types, vectorized
    per-bucket stage walk."""
    from ...functions.windows import funnel_counts

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_type"])
    wanted = pa.array(FUNNEL_STAGES)
    ds = ds.map_batches(
        lambda t: t.filter(pc.is_in(t["event_type"], value_set=wanted)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return funnel_counts(ds, FUNNEL_STAGES)


SQL_FUNNEL_STAGES = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1
)
SELECT 1 AS stage, 'view' AS event_type, (SELECT COUNT(*) FROM v) AS users
UNION ALL
SELECT 2, 'click', (SELECT COUNT(*) FROM c)
UNION ALL
SELECT 3, 'purchase', (SELECT COUNT(*) FROM p)
"""


def q_cohort_retention(sf_dir: str) -> pd.DataFrame:
    """Weekly cohort retention matrix —
    ``functions/windows.py::cohort_retention``: per-batch DISTINCT
    (user, week) combiner so the exchange moves unique pairs, not events."""
    from ...functions.windows import cohort_retention

    ds = _t(sf_dir, "events", ["user_id", "ts"])
    return cohort_retention(ds)


SQL_COHORT_RETENTION = """
WITH uw AS (
  SELECT DISTINCT user_id, CAST(floor(epoch(ts) / 604800) AS BIGINT) AS w
  FROM events
), f AS (
  SELECT user_id, MIN(w) AS cw FROM uw GROUP BY 1
)
SELECT f.cw AS cohort_week, uw.w - f.cw AS week_offset, COUNT(*) AS users
FROM uw JOIN f ON uw.user_id = f.user_id
GROUP BY 1, 2
"""


def q_event_gap_stats(sf_dir: str) -> pd.DataFrame:
    """Per-type inter-event gap stats (LAG over each user's ts-ordered
    stream) — ``windows.py::lag_gap_stats``: one hash exchange on user_id,
    per-bucket sorted diff, exact int64-µs partials."""
    from ...functions.windows import lag_gap_stats

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    return lag_gap_stats(ds)


SQL_EVENT_GAP_STATS = """
WITH g AS (
  SELECT event_type,
         date_diff('microsecond',
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) AS gap_us
  FROM events
)
SELECT event_type,
       COUNT(*) AS n_gaps,
       ROUND(SUM(gap_us) / 1000000.0 / COUNT(*), 6) AS avg_gap_s,
       ROUND(MAX(gap_us) / 1000000.0, 6) AS max_gap_s
FROM g WHERE gap_us IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


def q_event_transitions(sf_dir: str) -> pd.DataFrame:
    """Markov event-type transition matrix (consecutive pairs per user) —
    ``windows.py::transition_matrix``: bucketed LAG pairs, ≤|types|²
    partials per bucket, driver-normalized probabilities."""
    from ...functions.windows import transition_matrix

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    return transition_matrix(ds)


SQL_EVENT_TRANSITIONS = """
WITH p AS (
  SELECT event_type AS next_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, next_type, COUNT(*) AS n,
       ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY prev_type), 9) AS p
FROM p WHERE prev_type IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""


def _loglines_corpus_n(sf_dir: str) -> int:
    return max(2000, int(_sf_of(sf_dir) * 100_000))


def ensure_loglines_corpus(sf_dir: str) -> str:
    """Materialize the deterministic gz-JSONL corpus (+ parquet mirror for
    the DuckDB oracle) for this sf; idempotent.  Returns the corpus dir."""
    from ...sources.loglines_file import write_logline_corpus

    d = _corpus_dir(sf_dir)
    write_logline_corpus(d, _loglines_corpus_n(sf_dir), seed=42)
    return d


def q_loglines_extract(sf_dir: str) -> pd.DataFrame:
    """Raw gzipped JSON-line files → typed records → per-type/level counts:
    the reference's extraction service end-to-end over its ACTUAL input
    shape (gz line blobs, ``processor.go:106-177``), read via
    ``ray.data.read_text`` with streaming per-shard decompression.  The
    DuckDB oracle reimplements the classifier in SQL over a parquet mirror
    of the same lines."""
    from ...sources.loglines_file import read_logline_corpus
    from ...stages.loglines import extract_batch

    d = ensure_loglines_corpus(sf_dir)
    ds = read_logline_corpus(d)
    out = ds.map_batches(extract_batch, batch_format="pyarrow", zero_copy_batch=True)
    agg = grouped_sums(
        out.map_batches(
            lambda t: pa.table(
                {
                    "record_type": t["record_type"],
                    "level": t["level"],
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        ["record_type", "level"],
        {},
        "n",
        reduce="driver",
    ).to_pandas()
    return _i64(agg, ["n"])


# Full SQL reimplementation of the reference classifier (extractor.go
# semantics: Apache fields → HTTP; timeMillis+contextMap gate; requestLine
# sentinels; protocol/method skips; level regex with INFO default) over the
# parquet mirror of the gz line corpus — an independent computation path
# checking the Ray extraction end-to-end.

SQL_LOGLINES_EXTRACT = rf"""
WITH raw AS (SELECT line FROM read_parquet('{ORACLE_ARTIFACT_DIR}/lines.parquet')),
j AS (
  SELECT line, CASE WHEN json_valid(line) THEN line::JSON END AS js FROM raw
),
base AS (
  SELECT line, js,
         COALESCE(CASE WHEN json_type(js, '$.Logs') = 'OBJECT' THEN json_extract(js, '$.Logs') END,
                  CASE WHEN json_type(js, '$.logs') = 'OBJECT' THEN json_extract(js, '$.logs') END) AS logs,
         json_extract_string(js, '$.log') AS clog
  FROM j
),
feat AS (
  SELECT *,
    COALESCE(NULLIF(json_extract_string(logs, '$.requestFirstLine'), ''),
             json_extract_string(logs, '$.contextMap.requestLine')) AS rl,
    -- presence = json_type(...) IS NOT NULL (a JSON null value IS present,
    -- mirroring Python's `key in dict`); Apache-field evidence = non-empty
    -- STRING FORM (mirroring _field_evidence)
    (COALESCE(json_extract_string(logs, '$.requestFirstLine'), '') <> ''
     OR COALESCE(json_extract_string(logs, '$.status'), '') <> ''
     OR (json_extract(logs, '$.timeMillis') IS NOT NULL
         AND json_type(logs, '$.contextMap') = 'OBJECT'
         AND (json_type(logs, '$.contextMap.requestLine') IS NOT NULL
              OR ((json_type(logs, '$.contextMap.statusCode') IS NOT NULL
                   OR json_type(logs, '$.contextMap.bytesSent') IS NOT NULL
                   OR json_type(logs, '$.contextMap.processMillis') IS NOT NULL
                   OR json_type(logs, '$.contextMap.remoteHost') IS NOT NULL)
                  AND json_type(logs, '$.contextMap.sourceClassName') IS NULL
                  AND json_type(logs, '$.contextMap.sourceMethodName') IS NULL)))) AS is_http,
    (json_type(logs, '$.localServerName') IS NOT NULL
     OR json_type(logs, '$.cacheStatus') IS NOT NULL) AS is_proxy
  FROM base
),
typed AS (
  SELECT *,
    CASE
      WHEN trim(COALESCE(line, '')) = '' THEN 'skip'
      WHEN js IS NULL OR json_type(js) <> 'OBJECT' THEN 'error'
      WHEN logs IS NOT NULL THEN
        CASE WHEN is_http THEN
          CASE
            WHEN rl IS NULL OR rl = '-' THEN 'skip'
            WHEN NOT regexp_matches(rl, '^[A-Z_]+\s+[^\s]+\s+[A-Z]+/[\d.]+$') THEN 'skip'
            WHEN regexp_extract(rl, '^([A-Z_]+)\s+([^\s]+)\s+([A-Z]+)/[\d.]+$', 3) <> 'HTTP' THEN 'skip'
            WHEN regexp_extract(rl, '^([A-Z_]+)\s+([^\s]+)\s+([A-Z]+)/[\d.]+$', 1) NOT IN
                 ('GET','POST','PUT','DELETE','PATCH','HEAD','OPTIONS','TRACE','CONNECT') THEN 'skip'
            WHEN is_proxy THEN 'proxy'
            ELSE 'http'
          END
        ELSE 'application' END
      WHEN json_type(js, '$.log') IS NOT NULL THEN
        CASE WHEN trim(COALESCE(clog, '')) = '' THEN 'skip' ELSE 'container' END
      ELSE 'error'
    END AS record_type
  FROM feat
),
lv AS (
  SELECT record_type,
    CASE WHEN record_type IN ('http', 'proxy', 'application') THEN
           COALESCE(NULLIF(upper(regexp_extract(COALESCE(json_extract_string(logs, '$.level'), ''),
                    '(?i)\b(TRACE|DEBUG|INFO|WARN|WARNING|ERROR|FATAL)\b', 1)), ''), 'INFO')
         WHEN record_type = 'container' THEN
           COALESCE(NULLIF(upper(regexp_extract(clog,
                    '(?i)\b(TRACE|DEBUG|INFO|WARN|WARNING|ERROR|FATAL)\b', 1)), ''), 'INFO')
    END AS level
  FROM typed
)
SELECT record_type, level, COUNT(*) AS n FROM lv GROUP BY 1, 2
"""


def _sf_of(sf_dir: str) -> float:
    import os as _os

    base = _os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.01


def _media_n(sf_dir: str) -> int:
    return max(300, int(_sf_of(sf_dir) * 30_000))


def ensure_media_features_parquet(sf_dir: str) -> str:
    """Independent scalar-reference features for the media corpus (same
    two-implementations pattern as ``simhash.parquet``): per-payload feature
    sums computed by a SCALAR re-derivation of the documented stub-decode
    rule (per-stripe ``fnv1a64_single``), never by :class:`ImageDecoder`.
    The SQL oracle aggregates this file; the Ray query must match it through
    the actor-pool path — batch slicing / actor state / ordering bugs show
    up as hash mismatches."""
    import os as _os

    from ...functions.hashing import fnv1a64_single
    from ...stages.multimodal import ImageDecoder, synth_media_table

    def build() -> pa.Table:
        media = synth_media_table(_media_n(sf_dir), seed=42)
        dim = ImageDecoder.FEATURE_DIM
        fsums = []
        for p in media["payload"].to_pylist():
            vals = np.array(
                [fnv1a64_single(p[j::dim][:32].hex()) % (1 << 24) for j in range(dim)],
                dtype=np.float32,
            ) / float(1 << 24)
            fsums.append(vals.astype(np.float64).sum())
        return pa.table(
            {
                "media_id": media["media_id"],
                "media_type": media["media_type"],
                "fsum": pa.array(fsums, type=pa.float64()),
            }
        )

    return _ensure_artifact(_os.path.join(_corpus_dir(sf_dir), "media_features.parquet"), build)


def q_media_decode_stats(sf_dir: str) -> pd.DataFrame:
    """Multimodal decode end-to-end (the decode is the documented
    deterministic stub — no codecs in this container): synthetic binary
    payloads → actor-pool decode (state in __init__, once per actor) →
    per-type feature aggregates.  Exercises the real Ray side: binary
    columns, small batch sizing, actor concurrency, list<float> output.
    Oracle: SQL aggregate over the independent scalar-reference features
    (``ensure_media_features_parquet``)."""
    from ...stages.multimodal import ImageDecoder, synth_media_table

    ensure_media_features_parquet(sf_dir)
    n = _media_n(sf_dir)
    ds = rd.from_arrow(synth_media_table(n, seed=42)).repartition(8)
    feats = ds.map_batches(
        ImageDecoder,
        batch_format="pyarrow",
        batch_size=64,            # binary payloads: keep batch_bytes bounded
        concurrency=(1, 4),
        zero_copy_batch=True,
    )

    def agg(t: pa.Table) -> pa.Table:
        arr = t["feature"].combine_chunks() if isinstance(t["feature"], pa.ChunkedArray) else t["feature"]
        mat = np.asarray(arr.flatten(), dtype=np.float64).reshape(len(t), -1)
        flat = pa.table(
            {"media_type": t["media_type"], "fsum": pa.array(mat.sum(axis=1))}
        )
        g = flat.group_by(["media_type"]).aggregate([("fsum", "sum"), ([], "count_all")])
        return pa.table(
            {"media_type": g["media_type"], "fsum": g["fsum_sum"],
             "n": pc.cast(g["count_all"], pa.int64())}
        )

    partials = feats.map_batches(agg, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = partials.groupby("media_type", as_index=False).agg(
        n=("n", "sum"), mean_feature_sum=("fsum", "sum")
    )
    out["mean_feature_sum"] = (out["mean_feature_sum"] / out["n"]).pipe(_rd)
    return _i64(out, ["n"])


SQL_MEDIA_DECODE_STATS = f"""
SELECT media_type, COUNT(*) AS n, ROUND(SUM(fsum) / COUNT(*), 6) AS mean_feature_sum
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/media_features.parquet')
GROUP BY media_type
"""


def ensure_simhash_ref_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``simhash_fingerprints``: per-doc fingerprints
    re-derived by an INDEPENDENT reference path — scalar FNV word hashes
    (not the Arrow-buffer vectorized pass) and per-doc bit-count scoring
    (not the flat ±1-contribution matrix + ``np.add.reduceat``).  SimHash
    is fully deterministic, so both compositions must agree bit-for-bit."""
    import os as _os

    def build() -> pa.Table:
        from ...functions.hashing import fnv1a64_single

        t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        bits = np.arange(64, dtype=np.uint64)
        out_id: list[int] = []
        out_fp: list[str] = []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            words = (s or "").split(" ")
            hs = np.array([fnv1a64_single(w) for w in words], dtype=np.uint64)
            ones = ((hs[:, None] >> bits) & np.uint64(1)).sum(axis=0, dtype=np.int64)
            # score_b = (+1 per set bit, -1 per clear bit) = 2*ones - n
            score = 2 * ones - len(words)
            fp = 0
            for b in np.flatnonzero(score > 0):
                fp |= 1 << int(b)
            out_id.append(int(did))
            out_fp.append(f"{fp:016x}")
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "simhash": pa.array(out_fp, pa.string())})

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "simhash_ref.parquet"), build
    )


SQL_SIMHASH_FINGERPRINTS = f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id, simhash
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/simhash_ref.parquet')
ORDER BY doc_id
"""


def q_simhash_fingerprints(sf_dir: str) -> pd.DataFrame:
    """Per-doc 64-bit SimHash.  Oracle: the independent scalar-FNV /
    per-doc-scoring reference artifact (``ensure_simhash_ref_parquet``) —
    the distributed Arrow-FNV + reduceat kernel must reproduce every
    fingerprint bit-for-bit regardless of block slicing."""
    from ...functions.dedup import SimHasher

    ensure_simhash_ref_parquet(sf_dir)
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(SimHasher(), batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out["simhash"] = out["simhash"].map(lambda v: f"{int(v):016x}")
    return _i64(out, ["doc_id"]).sort_values("doc_id", ignore_index=True)


def ensure_simhash_parquet(sf_dir: str) -> str:
    """Driver-side reference SimHash fingerprints (doc_id, simhash:int64) —
    the distributed pass must reproduce them bit-exactly regardless of
    block slicing (this is the regression surface for sliced-batch bugs)."""
    import os as _os

    from ...functions.dedup import SimHasher

    def build() -> pa.Table:
        docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        fps = SimHasher().simhash_batch(docs["text"].to_pylist())
        return pa.table({"doc_id": docs["doc_id"], "simhash": pa.array(fps.view(np.int64))})

    return _ensure_artifact(_os.path.join(_corpus_dir(sf_dir), "simhash.parquet"), build)


def q_simhash_hamming_buckets(sf_dir: str) -> pd.DataFrame:
    """Hamming-WEIGHT histogram of the distributed SimHash fingerprints:
    (popcount(simhash), n) — SQL-checkable via ``bit_count`` over the
    driver-side reference fingerprints, so the whole distributed hashing +
    aggregation path gets a hash-green gate."""
    from ...functions.dedup import SimHasher

    ensure_simhash_parquet(sf_dir)
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def weights(t: pa.Table) -> pa.Table:
        fps = SimHasher().simhash_batch(t["text"].to_pylist())
        bits = np.unpackbits(fps.view(np.uint8)).reshape(len(fps), 64).sum(axis=1)
        return pa.table({"weight": pa.array(bits.astype(np.int64))})

    w = ds.map_batches(weights, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_sums(w, ["weight"], {}, "n", reduce="driver").to_pandas()
    return _i64(out, ["weight", "n"])


SQL_SIMHASH_HAMMING = f"""
SELECT CAST(bit_count(simhash) AS BIGINT) AS weight, COUNT(*) AS n
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/simhash.parquet')
GROUP BY 1
"""


def _span_updates(sf_dir: str) -> rd.Dataset:
    """Events as partial span updates keyed (trace_id, span_id) — shared by
    the span-assembly and trace-summary queries."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"])

    def to_updates(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t["ts"], pa.int64())
        span_id = pc.cast(
            pc.subtract(t["event_id"], pc.multiply(pc.divide(t["event_id"], 50), 50)), pa.int64()
        )
        status = pc.if_else(pc.greater(t["value"], 100.0), t["event_type"], pa.nulls(len(t), pa.string()))
        val = pc.if_else(pc.equal(t["event_type"], "purchase"), t["value"], pa.nulls(len(t), pa.float64()))
        return pa.table(
            {
                "trace_id": t["user_id"],
                "span_id": span_id,
                "ts_us": ts_us,
                "event_id": t["event_id"],
                "status": status,
                "val": val,
            }
        )

    return ds.map_batches(to_updates, batch_format="pyarrow", zero_copy_batch=True)


def q_span_assembly(sf_dir: str) -> pd.DataFrame:
    """Trace/span assembly (reference J4 design, traces/model.go:30-49 +
    pipeline_design.md:103-116): events become partial span updates keyed
    (trace_id, span_id); fields are merged last-writer-wins PER FIELD —
    a later update that did not carry a field must not null it out."""
    from ...functions.spans import merge_spans

    out = merge_spans(
        _span_updates(sf_dir),
        key_cols=["trace_id", "span_id"],
        order_cols=["ts_us", "event_id"],
        field_cols=["status", "val"],
        count_name="n_updates",
    ).to_pandas()
    out = out.drop(columns=["event_id"])
    out["val"] = out["val"].astype("float64").pipe(_rd, 2)
    return _i64(out, ["trace_id", "span_id", "n_updates", "ts_us"])


def q_trace_summary(sf_dir: str) -> pd.DataFrame:
    """Trace rollup over assembled spans (reference Trace = spans grouped by
    trace_id, traces/model.go:46-49): per trace, span count, merged-update
    count and latest activity — a second grouped reduce over the span merge,
    all distributed (the span table never lands on the driver whole)."""
    from ...functions.relational import bucketed_group_reduce
    from ...functions.spans import merge_spans

    merged = merge_spans(
        _span_updates(sf_dir),
        key_cols=["trace_id", "span_id"],
        order_cols=["ts_us", "event_id"],
        field_cols=["status", "val"],
        count_name="n_updates",
    )

    def roll(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("trace_id", dropna=False)
        return pd.DataFrame(
            {
                "n_spans": g.size(),
                "n_updates": g["n_updates"].sum(),
                "last_ts_us": g["ts_us"].max(),
            }
        ).reset_index()

    out = bucketed_group_reduce(merged, ["trace_id"], roll).to_pandas()
    return _i64(out, ["trace_id", "n_spans", "n_updates", "last_ts_us"])


SQL_TRACE_SUMMARY = """
WITH u AS (
  SELECT user_id AS trace_id, event_id % 50 AS span_id,
         epoch_us(ts) AS ts_us, event_id
  FROM events
), s AS (
  SELECT trace_id, span_id, COUNT(*) AS n_updates, MAX(ts_us) AS ts_us
  FROM u GROUP BY 1, 2
)
SELECT trace_id, COUNT(*) AS n_spans, CAST(SUM(n_updates) AS BIGINT) AS n_updates,
       MAX(ts_us) AS last_ts_us
FROM s GROUP BY trace_id
"""


SQL_SPAN_ASSEMBLY = """
WITH u AS (
  SELECT user_id AS trace_id, event_id % 50 AS span_id,
         epoch_us(ts) AS ts_us, event_id,
         CASE WHEN value > 100.0 THEN event_type END AS status,
         CASE WHEN event_type = 'purchase' THEN value END AS val
  FROM events
)
SELECT trace_id, span_id,
       last(status ORDER BY ts_us, event_id) FILTER (WHERE status IS NOT NULL) AS status,
       ROUND(last(val ORDER BY ts_us, event_id) FILTER (WHERE val IS NOT NULL), 2) AS val,
       COUNT(*) AS n_updates,
       MAX(ts_us) AS ts_us
FROM u GROUP BY 1, 2
"""


def q_top_events_per_type(sf_dir: str) -> pd.DataFrame:
    """Per-GROUP top-k: the 3 highest-value events of each type (window-rank
    semantics, distributed as combiner-pruned candidates + bucketed head)."""
    from ...functions.relational import grouped_topk

    ds = _t(sf_dir, "events", ["event_type", "event_id", "value"])
    out = grouped_topk(
        ds, ["event_type"], ["value", "event_id"], [True, False], 3
    ).to_pandas()
    out["value"] = out["value"].pipe(_rd, 2)
    return _i64(out, ["event_id"])


SQL_TOP_EVENTS_PER_TYPE = """
SELECT event_type, event_id, ROUND(value, 2) AS value
FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY value DESC, event_id) AS rn
      FROM events)
WHERE rn <= 3
"""


def q_sample_docs_md5(sf_dir: str) -> pd.DataFrame:
    """Deterministic content-hash sampling (the reference's MD5 shard filter
    F5, filters.go:160-189, as a SQL-checkable 1/16 sample): keep docs whose
    md5(doc_id) hex digest starts with '0'.  Hash-based sampling is the
    100-TB-safe way to subset reproducibly — no RNG state, stable across
    partitionings and reruns."""
    ds = _t(sf_dir, "documents", ["doc_id", "source"])

    def filt(t: pa.Table) -> pa.Table:
        fp = md5_hex(pc.cast(t["doc_id"], pa.string()))
        mask = pc.equal(pc.utf8_slice_codeunits(fp, 0, 1), "0")
        return t.filter(mask)

    out = ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    return _i64(out, ["doc_id"])


SQL_SAMPLE_DOCS_MD5 = """
SELECT doc_id, source FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
"""


def q_weighted_sample(sf_dir: str) -> pd.DataFrame:
    """Weighted sample WITHOUT replacement, k=100, P(doc) ∝ n_tok —
    Efraimidis-Spirakis exponential keys made deterministic: the uniform is
    an md5-derived fraction of doc_id (no RNG state — reproducible across
    reruns and partitionings, like every sampler here), key = ln(u)/w, take
    the k largest.  Fully distributed: the key is computed per batch and the
    selection is the per-block-prune ``topk`` — no shuffle of non-candidates.
    Token-weighted subset selection is the standard way to cut a corpus to a
    token budget while keeping long-doc representation proportional."""
    from ...functions.relational import topk

    ds = rd.read_parquet(
        ensure_derived_parquet(sf_dir), columns=["doc_id", "n_tok", "source"]
    )

    def add_key(t: pa.Table) -> pa.Table:
        h = md5_hex(pc.binary_join_element_wise(pc.cast(t["doc_id"], pa.string()), ":wsample", ""))
        frac = np.array(
            [(int(s[:8], 16) + 1) / 4294967296.0 for s in h.to_pylist()], dtype=np.float64
        )
        w = np.asarray(pc.cast(t["n_tok"], pa.float64()))
        key = np.log(frac) / w
        return t.append_column("es_key", pa.array(key))

    keyed = ds.map_batches(add_key, batch_format="pyarrow", zero_copy_batch=True)
    out = topk(keyed, ["es_key", "doc_id"], [True, False], 100).to_pandas()
    out["es_key"] = out["es_key"].pipe(_rd, 9)
    return _i64(out, ["n_tok"])[["doc_id", "n_tok", "source", "es_key"]]


SQL_WEIGHTED_SAMPLE = f"""
SELECT doc_id, n_tok, source,
       ROUND(ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':wsample'), 1, 8) AS BIGINT) + 1)
                / 4294967296.0) / n_tok, 9) AS es_key
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')
ORDER BY ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':wsample'), 1, 8) AS BIGINT) + 1)
            / 4294967296.0) / n_tok DESC, doc_id
LIMIT 100
"""


def q_value_p95_per_type(sf_dir: str) -> pd.DataFrame:
    """p95 per group via the same mergeable histogram sketch as the median —
    any quantile from one partial-pass."""
    from ...functions.sketch import grouped_quantile_fixedpoint

    ds = _t(sf_dir, "events", ["event_type", "value"])
    out = grouped_quantile_fixedpoint(
        ds, "event_type", "value", q=0.95, scale=100, out_name="p95_value"
    )
    out["p95_value"] = out["p95_value"].pipe(_rd)
    return out


SQL_VALUE_P95 = """
SELECT event_type, ROUND(quantile_cont(value, 0.95), 6) AS p95_value
FROM events GROUP BY event_type
"""


