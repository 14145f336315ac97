"""Wave 37: k-truss edge support histogram, TPC-H Q2/Q12 analogs, and a
JSONL source format.

* edge_support_hist — per-edge triangle support (|N(u)∩N(v)|) histogram
  over the shared co-purchase graph: the k-truss building block, computed
  with the broadcast adjacency-bitset plan (per-edge rows never leave the
  workers, only chunk-local histograms).
* min_cost_supplier — TPC-H Q2 shape (no partsupp: supplier↔part links
  come from shipped lineitem): best supplier per qualifying part within a
  region, window-free grouped argmax with integer-cents tie-breaks.
* late_shipments — TPC-H Q12 shape (no commit/receipt dates: lateness is
  ship > order date + 90 days): per order priority, late line share with
  integer date arithmetic.
* jsonl_ingest_stats — JSONL as a source format: the documents table is
  materialized once as line-delimited JSON, read back DISTRIBUTED with
  ray.data.read_json, and aggregated; the oracle reads the same file with
  DuckDB's read_json_auto.
"""
from __future__ import annotations

from ._base import ORACLE_ARTIFACT_DIR, _corpus_dir, _i64, _rd, _t, datetime, np, pa, pads, pc, pd, pq, rd  # noqa: F401
from ._base import grouped_sums, topk  # noqa: F401


def q_edge_support_hist(sf_dir: str) -> pd.DataFrame:
    """k-truss support histogram of the co-purchase item graph: for every
    distinct canonical edge, support = number of triangles through it
    (|N(u)∩N(v)|), reported as (support, n_edges) including support-0
    edges.  Edges come from the shared once-per-sf-dir artifact
    (graph_edges.py); the V×V adjacency bitset broadcasts once and edge
    chunks AND+popcount in parallel (functions/graph.py::
    per_edge_support_packed)."""
    from ...functions.graph import per_edge_support_packed
    from .graph_edges import ensure_copurchase_edges_parquet

    e = pq.read_table(ensure_copurchase_edges_parquet(sf_dir),
                      columns=["part_a", "part_b"])
    a = e["part_a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = e["part_b"].to_numpy(zero_copy_only=False).astype(np.int64)
    packed = (a << 32) | b
    out = per_edge_support_packed(packed)
    return _i64(out, ["support", "n_edges"])


SQL_EDGE_SUPPORT_HIST = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
t AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1 JOIN e e2 ON e2.u = e1.v JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
),
cr AS (
  SELECT a AS u, b AS v FROM t
  UNION ALL SELECT b, c FROM t
  UNION ALL SELECT a, c FROM t
),
sup AS (
  SELECT e.u, e.v, COUNT(cr.u) AS support
  FROM e LEFT JOIN cr ON cr.u = e.u AND cr.v = e.v
  GROUP BY 1, 2
)
SELECT CAST(support AS BIGINT) AS support, COUNT(*) AS n_edges
FROM sup GROUP BY 1 ORDER BY 1
"""


_Q2_REGION = "EUROPE"
_Q2_TYPE = "SMALL"
_Q2_MAX_SIZE = 10


def q_min_cost_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q2 shape: for every qualifying part (type SMALL, size ≤ 10),
    the best supplier among the region's suppliers that actually shipped it
    — argmax by account balance with supplier-key tie-break, top-100 by
    (balance DESC, part).  Distinct (part, supplier) pairs reduce once on
    the fact side; both dimension maps broadcast; the per-part argmax runs
    as per-batch combiners then an output-bounded driver fold (the oracle's
    ROW_NUMBER window, window-free)."""
    import ray as _ray

    s = pq.read_table(f"{sf_dir}/supplier.parquet").to_pandas()
    n = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    r = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    sn = s.merge(n, left_on="s_nationkey", right_on="n_nationkey").merge(
        r, left_on="n_regionkey", right_on="r_regionkey")
    sn = sn[sn["r_name"] == _Q2_REGION].sort_values("s_suppkey")
    p = pq.read_table(f"{sf_dir}/part.parquet",
                      columns=["p_partkey", "p_type", "p_size"]).to_pandas()
    okp = np.sort(p.query("p_type == @_Q2_TYPE and p_size <= @_Q2_MAX_SIZE")
                  ["p_partkey"].to_numpy(np.int64))
    maps_ref = _ray.put((
        sn["s_suppkey"].to_numpy(np.int64),
        np.rint(sn["s_acctbal"].to_numpy() * 100.0).astype(np.int64),
        okp))

    pairs = grouped_sums(
        _t(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]),
        ["l_partkey", "l_suppkey"], {})

    def argmax_part(t: pa.Table) -> pd.DataFrame:
        keys, bal, okparts = _ray.get(maps_ref)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        m = np.zeros(len(pk), bool)
        if len(okparts):
            i = np.searchsorted(okparts, pk)
            i[i == len(okparts)] = 0
            m = okparts[i] == pk
        if len(keys):
            j = np.searchsorted(keys, sk)
            j[j == len(keys)] = 0
            m &= keys[j] == sk
        if not m.any():
            return pd.DataFrame({"l_partkey": pd.Series([], dtype="int64"),
                                 "s_suppkey": pd.Series([], dtype="int64"),
                                 "bal_c": pd.Series([], dtype="int64")})
        pk, sk = pk[m], sk[m]
        bc = bal[np.searchsorted(keys, sk)]
        df = pd.DataFrame({"l_partkey": pk, "s_suppkey": sk, "bal_c": bc})
        # combiner argmax: max balance, tie to smaller suppkey
        df = df.sort_values(["bal_c", "s_suppkey"], ascending=[False, True])
        return df.drop_duplicates("l_partkey", keep="first")

    cand = pairs.map_batches(argmax_part, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
    if cand.empty:
        return pd.DataFrame({"p_partkey": pd.Series([], dtype="int64"),
                             "s_name": pd.Series([], dtype=object),
                             "s_acctbal": pd.Series([], dtype="float64")})
    cand = cand.sort_values(["bal_c", "s_suppkey"], ascending=[False, True])
    best = cand.drop_duplicates("l_partkey", keep="first")
    names = sn.set_index("s_suppkey")["s_name"]
    out = pd.DataFrame({"p_partkey": best["l_partkey"].to_numpy(np.int64),
                        "s_name": names.reindex(best["s_suppkey"]).to_numpy(),
                        "s_acctbal": best["bal_c"].to_numpy() / 100.0})
    out = out.sort_values(["s_acctbal", "p_partkey"],
                          ascending=[False, True], ignore_index=True).head(100)
    return _i64(out, ["p_partkey"])


SQL_MIN_COST_SUPPLIER = f"""
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
sup AS (
  SELECT s_suppkey, s_name, ROUND(CAST(ROUND(s_acctbal * 100) AS BIGINT) / 100.0, 2)
           AS s_acctbal
  FROM supplier
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = '{_Q2_REGION}'),
okp AS (SELECT p_partkey FROM part
        WHERE p_type = '{_Q2_TYPE}' AND p_size <= {_Q2_MAX_SIZE}),
j AS (
  SELECT pairs.l_partkey AS p_partkey, sup.*
  FROM pairs JOIN sup ON sup.s_suppkey = pairs.l_suppkey
  JOIN okp ON okp.p_partkey = pairs.l_partkey),
best AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY p_partkey
             ORDER BY s_acctbal DESC, s_suppkey) AS rn
  FROM j)
SELECT p_partkey, s_name, s_acctbal
FROM best WHERE rn = 1
ORDER BY s_acctbal DESC, p_partkey
LIMIT 100
"""


_Q12_LATE_DAYS = 90


def q_late_shipments(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q12 shape (lateness = shipped more than 90 days after the
    order date, this schema's analog of commit/receipt): per order
    priority, total lines, late lines and the late share.  The size-aware
    planner joins lineitem to orders on the order key; lateness is integer
    microsecond arithmetic; the share is the single float division."""
    from ...functions.relational import auto_join

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
    joined = auto_join(li, orders, on="l_orderkey", right_on="o_orderkey")
    late_us = _Q12_LATE_DAYS * 86_400_000_000

    def part(t: pa.Table) -> pd.DataFrame:
        ship = pc.cast(t["l_shipdate"], pa.int64()).to_numpy(zero_copy_only=False)
        od = pc.cast(t["o_orderdate"], pa.int64()).to_numpy(zero_copy_only=False)
        late = (ship - od) > late_us
        df = pd.DataFrame({"o_orderpriority": t["o_orderpriority"].to_numpy(zero_copy_only=False),
                           "n_lines": 1, "n_late": late.astype(np.int64)})
        return df.groupby("o_orderpriority", as_index=False).sum()

    agg = grouped_sums(
        joined.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["o_orderpriority"], {"n_lines": "n_lines", "n_late": "n_late"},
        reduce="driver").to_pandas()
    agg["late_share"] = pd.Series(
        [_rd(nl / n, 6) for nl, n in zip(agg["n_late"], agg["n_lines"])],
        index=agg.index)
    out = agg[["o_orderpriority", "n_lines", "n_late", "late_share"]]
    out = out.sort_values("o_orderpriority", ignore_index=True)
    return _i64(out, ["n_lines", "n_late"])


SQL_LATE_SHIPMENTS = f"""
SELECT o_orderpriority, COUNT(*) AS n_lines,
       CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL {_Q12_LATE_DAYS} DAY
                THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       ROUND(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL {_Q12_LATE_DAYS} DAY
                 THEN 1 ELSE 0 END) / (1.0 * COUNT(*)), 6) AS late_share
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
GROUP BY 1 ORDER BY 1
"""


def ensure_documents_jsonl(sf_dir: str) -> str:
    """Materialize the documents table as line-delimited JSON once per
    sf-dir — the JSONL source-format fixture both engines read."""
    import json as _json
    import os as _os
    import uuid as _uuid

    out = _os.path.join(_corpus_dir(sf_dir), "documents.jsonl")
    if _os.path.exists(out):
        return out
    _os.makedirs(_os.path.dirname(out), exist_ok=True)
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "lang", "source", "n_chars"])
    tmp = out + f".tmp-{_uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        for rec in t.to_pylist():
            f.write(_json.dumps(rec, sort_keys=True) + "\n")
    _os.replace(tmp, out)
    return out


def q_jsonl_ingest_stats(sf_dir: str) -> pd.DataFrame:
    """JSONL source format: read the line-delimited JSON fixture
    DISTRIBUTED with ray.data.read_json (Arrow JSON reader per block),
    one combiner pass emitting (lang, source) partials (docs, total chars,
    max doc id), output-bounded driver fold.  Oracle: DuckDB
    read_json_auto over the same file."""
    path = ensure_documents_jsonl(sf_dir)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "source"], as_index=False).agg(
            n_docs=("doc_id", "size"), total_chars=("n_chars", "sum"),
            max_doc=("doc_id", "max"))
        return g

    parts = rd.read_json(path).map_batches(part, batch_format="pandas").to_pandas()
    out = parts.groupby(["lang", "source"], as_index=False).agg(
        n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum"),
        max_doc=("max_doc", "max"))
    out = out.sort_values(["lang", "source"], ignore_index=True)
    return _i64(out, ["n_docs", "total_chars", "max_doc"])


SQL_JSONL_INGEST_STATS = """
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc
FROM read_json_auto('{D}/documents.jsonl')
GROUP BY 1, 2 ORDER BY 1, 2
""".replace("{D}", ORACLE_ARTIFACT_DIR)
