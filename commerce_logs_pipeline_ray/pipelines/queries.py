"""Query registry: every implemented operator/pipeline exposed as a
``(sf_dir) -> result`` callable plus (where expressible) an equivalent
DuckDB oracle SQL string.

This is the correctness surface the driver checks at sf=0.01
(row-count + schema + order-insensitive value-hash), covering SURVEY.md §2:
aggregations (A1/A2/A5), filters (F1-F4), regex parse (M4/M11), broadcast
enrichment joins (J1/ST2), routing fan-out (R1/R2/F6), last-state-per-key
compaction (A6/S5), top-k (§2.8), plus the training-data operators (dedup,
text analysis, similarity search).

Conventions for oracle parity:
* aggregate / computed columns carry the SAME name in Ray and SQL;
* double aggregates are rounded identically on both sides (ROUND(x, 2|6));
* int results normalized to int64;
* deterministic tie-breaks on every top-k (secondary unique keys).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass
from datetime import datetime
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray.data as rd

from ..functions.relational import broadcast_join, grouped_sums, last_by_key, topk
from ..functions.text import STOPWORD_PATTERN, md5_hex, n_words, quality_batch
from ..sources.sequences import MALFORM_MOD, MALFORM_REM, docs_tenant, sid_column
from ..sources.loglines_file import corpus_dir as _corpus_dir

# versioned /tmp dir whose artifacts the static oracle SQL reads (the
# driver's correctness checks run at sf0.01)
ORACLE_ARTIFACT_DIR = _corpus_dir("/root/testdata/sf0.01")
from ..stages.aggregate import final_agg, partial_agg
from ..stages.parse import parse_batch
from ..stages.route import route_batch


@dataclass
class QuerySpec:
    fn: Callable[[str], Any]
    sql: str | None
    description: str = ""


def _t(sf_dir: str, name: str, columns: list[str] | None = None, **kw) -> rd.Dataset:
    """Column-pruned read with block count sized to the file, not Ray's
    default fan-out: ~32 MB/block for byte-heavy tables, but with a floor of
    ~8 blocks when there are enough rows — CPU-heavy per-row stages (minhash,
    extraction) serialize badly on a single block, while Ray's default
    64-way split of tiny files drowns cheap aggregates in task overhead."""
    import os as _os

    import pyarrow.parquet as _pq
    import ray as _ray

    path = f"{sf_dir}/{name}.parquet"
    if "override_num_blocks" not in kw:
        cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
        rows = _pq.ParquetFile(path).metadata.num_rows
        by_bytes = _os.path.getsize(path) // (32 << 20) + 1
        floor = min(8, max(1, rows // 500))
        blocks = max(1, min(max(by_bytes, floor), 4 * cpus))
        kw["override_num_blocks"] = int(blocks)
    return rd.read_parquet(path, columns=columns, **kw)


def _i64(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    for c in cols:
        df[c] = df[c].astype("int64")
    return df


from ..functions.rounding import round_like_duckdb as _rd


# ---------------------------------------------------------------------------
# Aggregations over the events stream (A1/A2/A5)
# ---------------------------------------------------------------------------

def q_events_by_type(sf_dir: str) -> pd.DataFrame:
    ds = _t(sf_dir, "events", ["event_type", "value"])
    out = grouped_sums(ds, ["event_type"], {"total_value": "value"}, "n", reduce="driver").to_pandas()
    out["total_value"] = out["total_value"].pipe(_rd, 2)
    return _i64(out, ["n"])


SQL_EVENTS_BY_TYPE = """
SELECT event_type, ROUND(SUM(value), 2) AS total_value, COUNT(*) AS n
FROM events GROUP BY event_type
"""


def q_events_per_hour(sf_dir: str) -> pd.DataFrame:
    ds = _t(sf_dir, "events", ["ts", "event_type"])

    def add_hour(t: pa.Table) -> pa.Table:
        micros = pc.cast(t["ts"], pa.int64())
        hour_id = pc.divide(micros, pa.scalar(3_600_000_000, pa.int64()))
        return pa.table({"hour_id": hour_id, "event_type": t["event_type"]})

    ds = ds.map_batches(add_hour, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_sums(ds, ["hour_id", "event_type"], {}, "n").to_pandas()
    return _i64(out, ["hour_id", "n"])


SQL_EVENTS_PER_HOUR = """
SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_id, event_type, COUNT(*) AS n
FROM events GROUP BY 1, 2
"""


def q_top_users_by_value(sf_dir: str) -> pd.DataFrame:
    ds = _t(sf_dir, "events", ["user_id", "value"])
    totals = grouped_sums(ds, ["user_id"], {"total_value": "value"}, "n")
    out = topk(totals, ["total_value", "user_id"], [True, False], 10).to_pandas()
    out["total_value"] = out["total_value"].pipe(_rd, 2)
    return _i64(out, ["user_id", "n"])


SQL_TOP_USERS = """
SELECT user_id, ROUND(SUM(value), 2) AS total_value, COUNT(*) AS n
FROM events GROUP BY user_id
ORDER BY SUM(value) DESC, user_id LIMIT 10
"""

# ---------------------------------------------------------------------------
# Filters (F1-F3) — predicate pushdown at the read
# ---------------------------------------------------------------------------

def q_error_events_window(sf_dir: str) -> pd.DataFrame:
    lo, hi = datetime(2024, 1, 3), datetime(2024, 1, 6)
    expr = (
        (pads.field("event_type") == "error")
        & (pads.field("ts") >= pa.scalar(lo, pa.timestamp("us")))
        & (pads.field("ts") < pa.scalar(hi, pa.timestamp("us")))
    )
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", filter=expr)
    out = ds.select_columns(["event_id", "user_id", "value"]).to_pandas()
    return _i64(out, ["event_id", "user_id"])


SQL_ERROR_EVENTS_WINDOW = """
SELECT event_id, user_id, value FROM events
WHERE event_type = 'error'
  AND ts >= TIMESTAMP '2024-01-03 00:00:00' AND ts < TIMESTAMP '2024-01-06 00:00:00'
"""

# ---------------------------------------------------------------------------
# Regex parse of a free-form payload column (M4 analog)
# ---------------------------------------------------------------------------

def q_parse_props(sf_dir: str) -> pd.DataFrame:
    ds = _t(sf_dir, "events", ["props", "value"])

    def extract(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t["props"], r'"k": (?P<k>\d+)')
        k = pc.cast(pc.struct_field(ex, "k"), pa.int64())
        return pa.table({"k_mod": pc.cast(pc.subtract(k, pc.multiply(pc.divide(k, 10), 10)), pa.int64()), "value": t["value"]})

    ds = ds.map_batches(extract, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_sums(ds, ["k_mod"], {"total_value": "value"}, "n", reduce="driver").to_pandas()
    out["total_value"] = out["total_value"].pipe(_rd, 2)
    return _i64(out, ["k_mod", "n"])


SQL_PARSE_PROPS = """
SELECT CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) % 10 AS k_mod,
       ROUND(SUM(value), 2) AS total_value, COUNT(*) AS n
FROM events GROUP BY 1
"""

# ---------------------------------------------------------------------------
# Broadcast enrichment join chain (J1/ST2): orders ⋈ customer ⋈ nation ⋈ region
# ---------------------------------------------------------------------------

def q_orders_by_region(sf_dir: str) -> pd.DataFrame:
    from ..functions.relational import auto_join

    # nation/region are O(25) rows — fold on the driver and broadcast; the
    # customer table is O(rows) and scales with the data, so it is read and
    # enriched DISTRIBUTED, then joined via the size-aware planner (broadcast
    # while it fits, hash-exchange beyond the threshold) — never built as a
    # driver-side pandas frame.
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    nr = nat.to_pandas().merge(reg.to_pandas(), left_on="n_regionkey", right_on="r_regionkey")
    nr_dim = pa.Table.from_pandas(
        nr[["n_nationkey", "r_name"]].rename(columns={"n_nationkey": "c_nationkey"}),
        preserve_index=False,
    )
    cust = broadcast_join(
        _t(sf_dir, "customer", ["c_custkey", "c_nationkey"]), nr_dim, "c_nationkey"
    ).select_columns(["c_custkey", "r_name"])

    ds = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    joined = auto_join(ds, cust, on="o_custkey", right_on="c_custkey")
    out = grouped_sums(joined, ["r_name"], {"total_price": "o_totalprice"}, "n_orders", reduce="driver").to_pandas()
    out["total_price"] = out["total_price"].pipe(_rd, 2)
    return _i64(out, ["n_orders"])


SQL_ORDERS_BY_REGION = """
SELECT r_name, ROUND(SUM(o_totalprice), 2) AS total_price, COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""

# ---------------------------------------------------------------------------
# TPC-H Q1-style pricing summary (wide aggregate with computed columns)
# ---------------------------------------------------------------------------

def q_pricing_summary(sf_dir: str) -> pd.DataFrame:
    ds = _t(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )

    def derive(t: pa.Table) -> pa.Table:
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        charge = pc.multiply(disc, pc.add(1.0, t["l_tax"]))
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "l_quantity": t["l_quantity"],
                "l_extendedprice": t["l_extendedprice"],
                "disc_price": disc,
                "charge": charge,
            }
        )

    ds = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_sums(
        ds,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": "l_quantity",
            "sum_base_price": "l_extendedprice",
            "sum_disc_price": "disc_price",
            "sum_charge": "charge",
        },
        "count_order",
        reduce="driver",
    ).to_pandas()
    for c in ["sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"]:
        out[c] = out[c].pipe(_rd, 2)
    return _i64(out, ["count_order"])


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       COUNT(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""

# ---------------------------------------------------------------------------
# Last-state-per-key compaction (A6/S5)
# ---------------------------------------------------------------------------

def q_last_event_per_user(sf_dir: str) -> pd.DataFrame:
    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    last = last_by_key(ds, "user_id", ["ts", "event_id"], ["event_type"])
    out = last.to_pandas()[["user_id", "event_id", "event_type"]]
    out = out.rename(columns={"event_id": "last_event_id", "event_type": "last_event_type"})
    return _i64(out, ["user_id", "last_event_id"])


SQL_LAST_EVENT = """
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
"""

# ---------------------------------------------------------------------------
# Set ops / sort / limit (§2.8)
# ---------------------------------------------------------------------------

def q_distinct_sources(sf_dir: str) -> pd.DataFrame:
    vals = sorted(_t(sf_dir, "documents", ["source"]).unique("source"))
    return pd.DataFrame({"source": vals})


SQL_DISTINCT_SOURCES = "SELECT DISTINCT source FROM documents"


def q_lineitem_topk(sf_dir: str) -> pd.DataFrame:
    ds = _t(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_extendedprice"])
    out = topk(
        ds, ["l_extendedprice", "l_orderkey", "l_linenumber"], [True, False, False], 10
    ).to_pandas()
    out["price"] = out.pop("l_extendedprice").pipe(_rd, 2)
    return _i64(out, ["l_orderkey", "l_linenumber"])


SQL_LINEITEM_TOPK = """
SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 2) AS price
FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10
"""

# ---------------------------------------------------------------------------
# Text analysis (training-data ops)
# ---------------------------------------------------------------------------

def q_doc_token_stats(sf_dir: str) -> pd.DataFrame:
    ds = _t(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def stats(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_words": pc.cast(n_words(t["text"]), pa.int64()),
                "n_chars": t["n_chars"],
            }
        )

    out = ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    return _i64(out, ["doc_id", "n_words", "n_chars"])


SQL_DOC_TOKEN_STATS = """
SELECT doc_id, len(string_split(text, ' ')) AS n_words, n_chars FROM documents
"""


def q_doc_quality(sf_dir: str) -> pd.DataFrame:
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(quality_batch, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    return _i64(out, ["doc_id", "n_words", "stop_hits"])


SQL_DOC_QUALITY = f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_words,
       len(regexp_extract_all(text, '{STOPWORD_PATTERN}')) AS stop_hits,
       ROUND(CAST(len(regexp_extract_all(text, '{STOPWORD_PATTERN}')) AS DOUBLE)
             / len(string_split(text, ' ')), 6) AS stop_ratio
FROM documents
"""


def q_doc_fingerprint(sf_dir: str) -> pd.DataFrame:
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "fp": md5_hex(t["text"])})

    out = ds.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    return _i64(out, ["doc_id"])


SQL_DOC_FINGERPRINT = "SELECT doc_id, md5(text) AS fp FROM documents"

# ---------------------------------------------------------------------------
# Exact deduplication: hash-partition by content hash, keep first (SURVEY §2.6 J4)
# ---------------------------------------------------------------------------

def q_dedup_exact(sf_dir: str) -> pd.DataFrame:
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        fp = md5_hex(t["text"])
        flat = pa.table({"fp": fp, "doc_id": t["doc_id"]})
        g = flat.group_by(["fp"]).aggregate([("doc_id", "min"), ([], "count_all")])
        return pa.table(
            {
                "fp": g["fp"],
                "keeper": g["doc_id_min"],
                "n_copies": pc.cast(g["count_all"], pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("fp", as_index=False, dropna=False).agg(
            keeper=("keeper", "min"), n_copies=("n_copies", "sum")
        )

    from ..functions.relational import bucketed_group_reduce

    out = bucketed_group_reduce(partials, ["fp"], combine).to_pandas()
    return _i64(out, ["keeper", "n_copies"])


SQL_DEDUP_EXACT = """
SELECT md5(text) AS fp, MIN(doc_id) AS keeper, COUNT(*) AS n_copies
FROM documents GROUP BY 1
"""

# ---------------------------------------------------------------------------
# Similarity search: brute-force cosine top-k against a broadcast query vector
# ---------------------------------------------------------------------------

def q_cosine_topk(sf_dir: str) -> pd.DataFrame:
    # row-group-predicate read: only the query row reaches the driver
    emb0 = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=pads.field("vec_id") == 0,
    )
    assert emb0.num_rows == 1
    qvec = np.asarray(emb0["embedding"].to_pylist()[0], dtype=np.float64)
    qnorm = np.sqrt((qvec * qvec).sum())

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])

    def cos(t: pa.Table) -> pa.Table:
        arr = t["embedding"].combine_chunks() if isinstance(t["embedding"], pa.ChunkedArray) else t["embedding"]
        flat = np.asarray(arr.flatten(), dtype=np.float64)
        mat = flat.reshape(len(t), -1)
        dots = mat @ qvec
        norms = np.sqrt((mat * mat).sum(axis=1))
        c = dots / (norms * qnorm)
        return pa.table({"vec_id": t["vec_id"], "cos": pa.array(c)})

    scored = ds.map_batches(cos, batch_format="pyarrow", zero_copy_batch=True)
    out = topk(scored, ["cos", "vec_id"], [True, False], 10).to_pandas()
    out["cos"] = out["cos"].pipe(_rd)
    return _i64(out, ["vec_id"])


def q_ann_ivf_topk(sf_dir: str) -> pd.DataFrame:
    """Top-10 by cosine THROUGH the IVF index machinery: train the spherical
    k-means coarse quantizer, build the list-partitioned on-disk index
    (idempotent versioned /tmp artifact), query it.  Registered with
    ``nprobe == nlist`` so every list is scanned — exact by construction,
    sharing `cosine_topk`'s SQL oracle while exercising centroid training,
    the partitioned build, and the dir-pruned read path end-to-end.  The
    approximate scale path (``nprobe < nlist``) is recall-measured in
    tests/test_sim.py."""
    import os as _os
    import shutil as _shutil
    import uuid as _uuid

    from ..functions.sim import build_ivf_index_partitioned, ivf_topk, train_ivf_centroids

    emb0 = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=pads.field("vec_id") == 0,
    )
    qvec = np.asarray(emb0["embedding"].to_pylist()[0], dtype=np.float64)

    nlist = 16
    index_dir = _os.path.join(_corpus_dir(sf_dir), "ivf_index_v1")
    cent_path = _os.path.join(index_dir, "centroids.npy")
    if not _os.path.exists(cent_path):
        ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
        cent = train_ivf_centroids(ds, nlist=nlist, dim=len(qvec), seed=42)
        tmp = index_dir + f".tmp-{_uuid.uuid4().hex}"
        build_ivf_index_partitioned(ds, tmp, cent)
        np.save(_os.path.join(tmp, "centroids.npy"), cent)
        try:
            _os.rename(tmp, index_dir)  # atomic publish; loser cleans up
        except OSError:
            _shutil.rmtree(tmp, ignore_errors=True)
    cent = np.load(cent_path)
    out = ivf_topk(index_dir, cent, qvec, k=10, nprobe=nlist)
    return _i64(out, ["vec_id"])


# CAST to DOUBLE[]: DuckDB computes list_cosine_similarity on FLOAT[] in
# float32; the Ray side (numpy) computes in float64 — force float64 on both.
SQL_COSINE_TOPK = """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT qe FROM q)), 6) AS cos
FROM embeddings
ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT qe FROM q)) DESC, vec_id
LIMIT 10
"""

# ---------------------------------------------------------------------------
# Flagship analog over documents — full parse → enrich → route → aggregate
# with a complete SQL oracle (sid construction mirrored in SQL).
# ---------------------------------------------------------------------------

_PIPE_KEYS = ["sink", "source", "tenant"]
_PIPE_BUCKET = 64


def _docs_route_registry():
    def p_errors(t):
        return pc.invert(t["parse_ok"])

    def p_proxy(t):
        return pc.equal(t["container"], "proxy")

    def p_infra(t):
        return pc.equal(t["namespace"], "system")

    def p_priority(t):
        return pc.equal(t["tenant"], "cp1")

    def p_default(t):
        return pa.array([True] * len(t))

    return [
        ("errors", p_errors),
        ("proxy", p_proxy),
        ("infra", p_infra),
        ("priority", p_priority),
        ("application", p_default),
    ]


def q_pipeline_docs(sf_dir: str) -> pd.DataFrame:
    ds = _t(sf_dir, "documents", ["doc_id", "text", "lang", "source"])

    def to_sequences(t: pa.Table) -> pa.Table:
        sid = sid_column(t)
        nw = pc.cast(n_words(t["text"]), pa.int32())
        return pa.table({"doc_id": sid, "n_tok": nw, "source": t["source"]})

    def enrich_docs(t: pa.Table) -> pa.Table:
        srcs = t["source"]
        uniq = pc.unique(srcs.combine_chunks() if isinstance(srcs, pa.ChunkedArray) else srcs)
        keys = uniq.to_pylist()
        tenants = pa.array([docs_tenant(s) for s in keys], type=pa.string())
        idx = pc.index_in(srcs, value_set=uniq)
        return t.append_column("tenant", pc.take(tenants, idx))

    registry = _docs_route_registry()
    ds = ds.map_batches(to_sequences, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(parse_batch, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(enrich_docs, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(
        route_batch, fn_kwargs={"registry": registry}, batch_format="pyarrow", zero_copy_batch=True
    )
    partials = ds.map_batches(
        partial_agg,
        fn_kwargs={"keys": [*_PIPE_KEYS, "n_tok_bucket"], "bucket_width": _PIPE_BUCKET, "salt_mod": 0},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = final_agg(partials, keys=[*_PIPE_KEYS, "n_tok_bucket"], salted=False)
    return _i64(out, ["n_tok_bucket", "row_count", "token_count"])


SQL_PIPELINE_DOCS = f"""
WITH base AS (
  SELECT doc_id, text, lang, source,
         printf('2024%02d%02d', CAST(1 + doc_id % 12 AS INT), CAST(1 + doc_id % 28 AS INT)) AS d8,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
), sid0 AS (
  SELECT *,
         d8 || '.svc-' || source || '-' || substr(h, 1, 8) || '-' || substr(h, 9, 5)
            || '_' || (CASE doc_id % 3 WHEN 0 THEN 'default' WHEN 1 THEN 'apps' ELSE 'system' END)
            || '_' || (CASE WHEN lang = 'en' THEN 'proxy' ELSE 'app' END)
            || '-' || substr(h, 14, 8) AS sid_ok
  FROM base
), sid1 AS (
  SELECT *, CASE WHEN doc_id % {MALFORM_MOD} = {MALFORM_REM} THEN replace(sid_ok, '_', '') ELSE sid_ok END AS sid
  FROM sid0
), parsed AS (
  SELECT *,
         regexp_extract(sid, '^(\\d{{8}})\\.([a-z0-9-]+)_([a-z0-9]+)_([a-z0-9-]+)-([a-f0-9]{{8}})$', 2) AS pod,
         regexp_extract(sid, '^(\\d{{8}})\\.([a-z0-9-]+)_([a-z0-9]+)_([a-z0-9-]+)-([a-f0-9]{{8}})$', 3) AS ns,
         regexp_extract(sid, '^(\\d{{8}})\\.([a-z0-9-]+)_([a-z0-9]+)_([a-z0-9-]+)-([a-f0-9]{{8}})$', 4) AS container
  FROM sid1
), flagged AS (
  SELECT *,
         (pod <> '' AND regexp_extract(pod, '^([a-z][a-z0-9-]*?)-[a-f0-9]{{8}}-[a-z0-9]{{5}}$', 1) <> '') AS parse_ok,
         'cp' || CAST(CAST(substr(source, 4) AS BIGINT) % 3 + 1 AS VARCHAR) AS tenant,
         len(string_split(text, ' ')) AS nw
  FROM parsed
), routed AS (
  SELECT *,
         CASE WHEN NOT parse_ok THEN 'errors'
              WHEN container = 'proxy' THEN 'proxy'
              WHEN ns = 'system' THEN 'infra'
              WHEN tenant = 'cp1' THEN 'priority'
              ELSE 'application' END AS sink
  FROM flagged
)
SELECT sink, source, tenant, nw // {_PIPE_BUCKET} AS n_tok_bucket,
       COUNT(*) AS row_count, CAST(SUM(nw) AS BIGINT) AS token_count
FROM routed GROUP BY 1, 2, 3, 4
"""

# ---------------------------------------------------------------------------
# Route-only fan-out counts over raw document columns (R1/F6 without parse)
# ---------------------------------------------------------------------------

def q_route_documents(sf_dir: str) -> pd.DataFrame:
    ds = _t(sf_dir, "documents", ["lang", "source", "n_chars"])

    def assign(t: pa.Table) -> pa.Table:
        is_en = pc.equal(t["lang"], "en")
        long_en = pc.and_(is_en, pc.greater_equal(t["n_chars"], 400))
        prio = pc.is_in(t["source"], value_set=pa.array(["src0", "src1", "src2", "src3"]))
        sink = pc.if_else(
            long_en,
            "long_en",
            pc.if_else(is_en, "short_en", pc.if_else(prio, "priority", "other")),
        )
        bucket = pc.divide(t["n_chars"], pa.scalar(128, pa.int64()))
        return pa.table({"sink": sink, "source": t["source"], "bucket": bucket, "n_chars": t["n_chars"]})

    ds = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_sums(ds, ["sink", "source", "bucket"], {"total_chars": "n_chars"}, "n", reduce="driver").to_pandas()
    return _i64(out, ["bucket", "total_chars", "n"])


SQL_ROUTE_DOCUMENTS = """
SELECT CASE WHEN lang = 'en' AND n_chars >= 400 THEN 'long_en'
            WHEN lang = 'en' THEN 'short_en'
            WHEN source IN ('src0','src1','src2','src3') THEN 'priority'
            ELSE 'other' END AS sink,
       source, n_chars // 128 AS bucket,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars, COUNT(*) AS n
FROM documents GROUP BY 1, 2, 3
"""

# ---------------------------------------------------------------------------
# Large×large hash join (J3): lineitem revenue per order joined to orders
# ---------------------------------------------------------------------------

def q_order_revenue_topk(sf_dir: str) -> pd.DataFrame:
    from ..functions.relational import hash_join

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"], "rev": r})

    li = li.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True)
    # pre-aggregate the fact side per key BEFORE the join (shuffle moves one
    # row per order, not one per lineitem)
    per_order = grouped_sums(li, ["l_orderkey"], {"revenue": "rev"}, None, reduce="distributed")
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    joined = hash_join(per_order, orders, on="l_orderkey", right_on="o_orderkey", num_partitions=8)
    out = topk(joined, ["revenue", "l_orderkey"], [True, False], 10).to_pandas()
    out = out.rename(columns={"l_orderkey": "o_orderkey"})[["o_orderkey", "o_custkey", "revenue"]]
    out["revenue"] = out["revenue"].pipe(_rd, 2)
    return _i64(out, ["o_orderkey", "o_custkey"])


def q_bloom_semi_join(sf_dir: str) -> pd.DataFrame:
    """Bloom semi join (large×large membership filter): lineitems belonging
    to high-value orders.  The qualifying-order key set is built into a
    mergeable Bloom filter (per-batch blobs, OR-merge), broadcast once, and
    prefilters the fact side vectorized; the ~1% false-positive survivors
    are scrubbed by a hash semi join that only ever shuffles survivors.
    Exact result (bloom has no false negatives) — plain IN-subquery SQL."""
    from ..functions.relational import bloom_semi_join

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).filter(
        expr="o_totalprice > 200000.0"
    )
    hits = bloom_semi_join(li, orders.select_columns(["o_orderkey"]), on="l_orderkey", right_on="o_orderkey")

    def agg(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_items": pa.array([t.num_rows], pa.int64()),
                "total_qty": pa.array([pc.sum(t["l_quantity"]).as_py() or 0], pa.int64()),
            }
        )

    parts = hits.map_batches(agg, batch_format="pyarrow").to_pandas()
    out = pd.DataFrame(
        {"n_items": [int(parts["n_items"].sum())], "total_qty": [int(parts["total_qty"].sum())]}
    )
    return _i64(out, ["n_items", "total_qty"])


SQL_BLOOM_SEMI_JOIN = """
SELECT COUNT(*) AS n_items, CAST(SUM(l_quantity) AS BIGINT) AS total_qty
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 200000.0)
"""


SQL_ORDER_REVENUE_TOPK = """
SELECT o_orderkey, o_custkey,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderkey, o_custkey
ORDER BY SUM(l_extendedprice * (1 - l_discount)) DESC, o_orderkey LIMIT 10
"""


def q_customers_without_orders(sf_dir: str) -> pd.DataFrame:
    """Anti join: customers with no big order (broadcast key-set filter)."""
    import pyarrow.dataset as _pads

    from ..functions.relational import semi_join_broadcast

    cust = _t(sf_dir, "customer", ["c_custkey", "c_name"])
    order_keys = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey"],
        filters=_pads.field("o_totalprice") > 400000.0,
    )
    out = semi_join_broadcast(
        cust, order_keys.rename_columns(["c_custkey"]), "c_custkey", anti=True
    ).to_pandas()
    if out.empty:
        out = pd.DataFrame({"c_custkey": pd.Series(dtype="int64"), "c_name": pd.Series(dtype="object")})
    return _i64(out, ["c_custkey"])


SQL_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
"""

def q_nation_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q5-style: filtered orders → broadcast-enrich nation → hash join
    with per-order lineitem revenue → grouped revenue per nation.
    Composes filter pushdown + broadcast join + pre-agg + hash join +
    grouped reduce in one streaming plan."""
    from ..functions.relational import hash_join

    lo, hi = datetime(1996, 1, 1), datetime(1999, 1, 1)
    expr = (pads.field("o_orderdate") >= pa.scalar(lo, pa.timestamp("us"))) & (
        pads.field("o_orderdate") < pa.scalar(hi, pa.timestamp("us"))
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"], filter=expr
    )
    from ..functions.relational import auto_join

    # nation is tiny (broadcast); customer scales with the data → read it
    # distributed and attach it through the size-aware planner, not as a
    # driver-built pandas dim
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    cust = broadcast_join(
        _t(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        nat.rename_columns(["c_nationkey", "n_name"]),
        "c_nationkey",
    ).select_columns(["c_custkey", "n_name"])
    orders = auto_join(orders, cust, on="o_custkey", right_on="c_custkey")

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"], "rev": r})

    per_order = grouped_sums(
        li.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True),
        ["l_orderkey"], {"revenue": "rev"}, "n_items", reduce="distributed",
    )
    joined = auto_join(per_order, orders, on="l_orderkey", right_on="o_orderkey")
    out = grouped_sums(joined, ["n_name"], {"revenue": "revenue"}, "n_orders", reduce="driver").to_pandas()
    out["revenue"] = out["revenue"].pipe(_rd, 2)
    return _i64(out, ["n_orders"])


SQL_NATION_REVENUE = """
SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(DISTINCT o_orderkey) AS n_orders
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
GROUP BY n_name
"""

def q_error_prior_purchase(sf_dir: str) -> pd.DataFrame:
    """As-of correlation join (J2/J3 designed semantics): each error event
    linked to the user's latest preceding purchase."""
    from ..functions.asof import asof_join

    def filt(kind):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["event_type"], kind)).drop_columns(["event_type"])

        return fn

    errors = _t(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"]).map_batches(
        filt("error"), batch_format="pyarrow", zero_copy_batch=True
    )
    purchases = _t(
        sf_dir, "events", ["event_id", "user_id", "ts", "value", "event_type"]
    ).map_batches(filt("purchase"), batch_format="pyarrow", zero_copy_batch=True)

    joined = asof_join(
        errors, purchases, by="user_id", on="ts",
        right_payload=["event_id", "value"], direction="backward", inner=True,
    ).to_pandas()
    out = pd.DataFrame(
        {
            "event_id": joined["event_id"].astype("int64"),
            "user_id": joined["user_id"].astype("int64"),
            "prior_purchase_id": joined["event_id_right"].astype("int64"),
            "prior_value": joined["value_right"].astype("float64").pipe(_rd, 2),
        }
    )
    return out


SQL_ERROR_PRIOR_PURCHASE = """
SELECT a.event_id, a.user_id, b.event_id AS prior_purchase_id,
       ROUND(b.value, 2) AS prior_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') a
ASOF JOIN (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase') b
ON a.user_id = b.user_id AND a.ts >= b.ts
"""

def q_views_before_purchase(sf_dir: str) -> pd.DataFrame:
    """Range join: per purchase, views by the same user in the prior 30 min
    (interval predicate join without pair materialization)."""
    from ..functions.asof import range_join_count

    def filt(kind):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["event_type"], kind)).drop_columns(["event_type"])

        return fn

    purchases = _t(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"]).map_batches(
        filt("purchase"), batch_format="pyarrow", zero_copy_batch=True
    )
    views = _t(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"]).map_batches(
        filt("view"), batch_format="pyarrow", zero_copy_batch=True
    )
    out = range_join_count(
        purchases, views, by="user_id", on="ts", window=1800.0, count_name="n_views_30m"
    ).to_pandas()[["event_id", "user_id", "n_views_30m"]]
    return _i64(out, ["event_id", "user_id", "n_views_30m"])


SQL_VIEWS_BEFORE_PURCHASE = """
SELECT a.event_id, a.user_id, COUNT(b.event_id) AS n_views_30m
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') a
LEFT JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view') b
  ON a.user_id = b.user_id
 AND epoch(a.ts) - epoch(b.ts) < 1800.0 AND epoch(a.ts) - epoch(b.ts) >= 0.0
GROUP BY a.event_id, a.user_id
"""

def q_global_error_context(sf_dir: str) -> pd.DataFrame:
    """KEYLESS interval join: per purchase, platform-wide error events in
    the prior 30 min (no equality key exists — the exchange key is the
    derived time bucket; right rows replicate to 2 buckets, see
    ``global_range_join_count``)."""
    from ..functions.asof import global_range_join_count

    def filt(kind, cols):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["event_type"], kind)).select(cols)

        return fn

    purchases = _t(sf_dir, "events", ["event_id", "ts", "event_type"]).map_batches(
        filt("purchase", ["event_id", "ts"]), batch_format="pyarrow", zero_copy_batch=True
    )
    errors = _t(sf_dir, "events", ["ts", "event_type"]).map_batches(
        filt("error", ["ts"]), batch_format="pyarrow", zero_copy_batch=True
    )
    out = global_range_join_count(
        purchases, errors, on="ts", window=1800.0, count_name="n_errors_30m"
    ).to_pandas()[["event_id", "n_errors_30m"]]
    out = out.sort_values("event_id", ignore_index=True)
    return _i64(out, ["event_id", "n_errors_30m"])


SQL_GLOBAL_ERROR_CONTEXT = """
SELECT a.event_id, COUNT(b.ts) AS n_errors_30m
FROM (SELECT event_id, ts FROM events WHERE event_type = 'purchase') a
LEFT JOIN (SELECT ts FROM events WHERE event_type = 'error') b
  ON epoch(a.ts) - epoch(b.ts) < 1800.0 AND epoch(a.ts) - epoch(b.ts) >= 0.0
GROUP BY a.event_id
ORDER BY a.event_id
"""

# ---------------------------------------------------------------------------
# Session windows (gap rule ≡ reference blob-closing inactivity timeout,
# blob_closing_processor.go:68-92)
# ---------------------------------------------------------------------------

def q_hopping_window_counts(sf_dir: str) -> pd.DataFrame:
    """HOPPING (overlapping) event-time windows: 30-min windows sliding
    every 10 min — each event replicates to the 3 windows containing it
    (bounded flat-map, the streaming-window analogue of the band-join
    replication), then one grouped count over (window, type).  Differs from
    tumbling (events_per_hour) and from sliding-over-aggregate
    (hourly_moving_avg): the overlap happens at the RAW event level."""
    ds = _t(sf_dir, "events", ["ts", "event_type"])

    def explode(t: pa.Table) -> pa.Table:
        # int64 µs → 600 s buckets in one floor division (a safe Arrow cast
        # to timestamp[s] would raise on sub-second precision loss)
        base = (
            pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
            // 600_000_000
        )
        et = t["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        n = len(t)
        flat = pa.table(
            {"window_start": pa.array(
                np.concatenate([(base - j) * 600 for j in range(3)]), pa.int64()),
             "event_type": pa.concat_arrays([et] * 3),
             "n": pa.array(np.ones(3 * n, dtype=np.int64))}
        )
        g = flat.group_by(["window_start", "event_type"]).aggregate([("n", "sum")])
        return pa.table(
            {"window_start": g["window_start"], "event_type": g["event_type"],
             "n": g["n_sum"]}
        )

    parts = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = parts.groupby(["window_start", "event_type"], as_index=False)["n"].sum()
    out = out.sort_values(["window_start", "event_type"], ignore_index=True)
    return _i64(out, ["window_start", "n"])


SQL_HOPPING_WINDOW_COUNTS = """
SELECT (CAST(FLOOR(epoch(ts) / 600) AS BIGINT) - j) * 600 AS window_start,
       event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM events, unnest([0, 1, 2]) AS t(j)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_hourly_moving_avg(sf_dir: str) -> pd.DataFrame:
    """Sliding window over the tumbling hourly aggregate: 3-row moving
    average per event_type.  The distributed part is the hourly reduce; the
    window pass runs on the (tiny) aggregate — windows over aggregates never
    need a second shuffle."""
    base = q_events_per_hour(sf_dir).sort_values(["event_type", "hour_id"], kind="stable")
    base["ma3"] = (
        base.groupby("event_type")["n"]
        .rolling(3, min_periods=1)
        .mean()
        .pipe(_rd)
        .reset_index(level=0, drop=True)
    )
    return base.reset_index(drop=True)


SQL_HOURLY_MOVING_AVG = """
WITH h AS (
  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_id, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT hour_id, event_type, n,
       ROUND(AVG(n) OVER (PARTITION BY event_type ORDER BY hour_id
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS ma3
FROM h
"""


def q_user_sessions(sf_dir: str) -> pd.DataFrame:
    from ..functions.windows import sessionize

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id"])
    out = sessionize(ds, gap_seconds=1800.0).to_pandas()
    return _i64(out, ["user_id", "session_id", "n_events", "first_event_id", "last_event_id"])


SQL_USER_SESSIONS = """
WITH ordered AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800.0
              THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM ordered
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(event_id) AS first_event_id, MAX(event_id) AS last_event_id
FROM sess GROUP BY 1, 2
"""

# ---------------------------------------------------------------------------
# Near-duplicate detection (training-data ops; SURVEY §2.6 J4 generalized)
# ---------------------------------------------------------------------------

def q_embedding_neardup(sf_dir: str) -> pd.DataFrame:
    from ..functions.dedup import embedding_neardup_pairs

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = embedding_neardup_pairs(ds, threshold=0.4)
    return _i64(out, ["vec_a", "vec_b"])


SQL_EMBEDDING_NEARDUP = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(list_cosine_similarity(a.emb, b.emb), 6) AS cos
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.emb, b.emb) >= 0.4
"""


def q_embedding_neardup_lsh(sf_dir: str) -> pd.DataFrame:
    """Hyperplane-LSH-bucketed near-dup pairs (approximate, deterministic
    seed; rows-only — recall vs the exact tiling is measured in
    tests/test_dedup.py).  The scale path for high-threshold near-dup."""
    from ..functions.dedup import embedding_neardup_lsh

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = embedding_neardup_lsh(ds, threshold=0.4, bits_per_band=4, n_bands=16, dim=64)
    return _i64(out, ["vec_a", "vec_b"])


def q_jaccard_neardup(sf_dir: str) -> pd.DataFrame:
    """EXACT word-3-gram-shingle Jaccard pairs ≥ 0.5 via the distributed
    shingle inverted-index self-join — the ground-truth counterpart of
    `minhash_neardup`'s LSH estimates, and the one dedup family checkable
    against a full SQL reimplementation (DuckDB gram explode + self-join)."""
    from ..functions.dedup import ngram_jaccard_pairs

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    out = ngram_jaccard_pairs(ds, threshold=0.5, shingle_k=3)
    return _i64(out, ["doc_a", "doc_b"])


# Gram semantics mirror functions/dedup.py::gram_hash_stream for docs with
# >= k words (every sf's documents table: min 10 words): gram i = words
# [i, i+k).  DuckDB list slicing is 1-based inclusive, so w[i:i+2] is the
# 3-gram starting at i, for i in 1 .. len(w)-2.
SQL_JACCARD_NEARDUP = """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), grams AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS g
  FROM words, unnest(generate_series(1, len(w) - 2)) AS t(i)
), sizes AS (
  SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5
"""


# Shared gram/pair CTE prefix (identical to SQL_JACCARD_NEARDUP's pair
# derivation) + transitive closure: near-dup PAIRS contracted into CLUSTERS
# labeled by their min doc_id — the SQL mirror of star-contraction CC.
_SQL_CLUSTER_CTE = """
WITH RECURSIVE words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), grams AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS g
  FROM words, unnest(generate_series(1, len(w) - 2)) AS t(i)
), gsizes AS (
  SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT doc_a, doc_b FROM inter
  JOIN gsizes sa ON sa.doc_id = doc_a
  JOIN gsizes sb ON sb.doc_id = doc_b
  WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5
), sym AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
), reach(u, v) AS (
  SELECT u, v FROM sym
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
), comp AS (
  SELECT u AS node, LEAST(u, MIN(v)) AS cluster_id FROM reach GROUP BY u
)
"""


def _neardup_components(sf_dir: str, threshold: float = 0.5) -> pd.DataFrame:
    """(node, component) over the exact-Jaccard near-dup pair graph."""
    from ..functions.dedup import ngram_jaccard_pairs
    from ..functions.graph import connected_components

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    pairs = ngram_jaccard_pairs(docs, threshold=threshold, shingle_k=3)
    edges = rd.from_pandas(
        pairs.rename(columns={"doc_a": "u", "doc_b": "v"})[["u", "v"]].astype("int64")
    )
    return connected_components(edges)


def q_dedup_clusters(sf_dir: str) -> pd.DataFrame:
    """Near-dup pairs → connected components (distributed star contraction,
    `functions/graph.py`) → per-cluster sizes.  a~b and b~c must land in ONE
    cluster even when (a,c) is itself below threshold — the property pair
    queries can't express."""
    comp = _neardup_components(sf_dir)
    out = (
        comp.groupby("component", as_index=False)
        .agg(size=("node", "count"))
        .rename(columns={"component": "cluster_id"})
    )
    return _i64(out, ["cluster_id", "size"])


SQL_DEDUP_CLUSTERS = (
    _SQL_CLUSTER_CTE
    + "SELECT cluster_id, COUNT(*) AS size FROM comp GROUP BY cluster_id"
)


def q_dedup_survivors(sf_dir: str) -> pd.DataFrame:
    """Keep-one-per-cluster over the FULL corpus: broadcast the (output-sized)
    drop set into a map_batches filter, count kept docs per source — the
    materialized endgame of the dedup family (no corpus shuffle; the corpus
    streams once)."""
    import ray as _ray

    comp = _neardup_components(sf_dir)
    drops = pa.array(
        comp.loc[comp["node"] != comp["component"], "node"].to_numpy(), type=pa.int64()
    )
    drop_ref = _ray.put(drops)

    ds = _t(sf_dir, "documents", ["doc_id", "source"])

    def partial(t: pa.Table) -> pa.Table:
        dset = _ray.get(drop_ref)
        dropped = pc.fill_null(pc.is_in(t["doc_id"], value_set=dset), False)
        flat = pa.table(
            {"source": t["source"],
             "kept": pc.cast(pc.invert(dropped), pa.int64())}
        )
        g = flat.group_by(["source"]).aggregate([("kept", "sum"), ([], "count_all")])
        return pa.table(
            {"source": g["source"], "n_kept": g["kept_sum"],
             "n_docs": pc.cast(g["count_all"], pa.int64())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = partials.groupby("source", as_index=False).agg(
        n_docs=("n_docs", "sum"), n_kept=("n_kept", "sum")
    )
    return _i64(out, ["n_docs", "n_kept"])


SQL_DEDUP_SURVIVORS = (
    _SQL_CLUSTER_CTE
    + """
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN doc_id IN (SELECT node FROM comp WHERE node <> cluster_id)
                THEN 0 ELSE 1 END) AS BIGINT) AS n_kept
FROM documents GROUP BY source
"""
)


def q_minhash_neardup(sf_dir: str) -> pd.DataFrame:
    """MinHash+LSH near-dup pairs.  Oracle: the independent per-doc
    reference derivation (``ensure_neardup_pairs_parquet``) — MinHash is
    seed-deterministic, so the distributed flat-stream/co-group pipeline
    and the scalar dict-bucketed reference must emit identical pair sets
    with bitwise-equal est/exact Jaccard (also planted-truth-tested in
    tests/test_dedup.py)."""
    from ..functions.dedup import minhash_lsh_pairs

    ensure_neardup_pairs_parquet(sf_dir)
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    out = minhash_lsh_pairs(ds, threshold=0.5)
    return _i64(out, ["doc_a", "doc_b"])


_DERIVED_CACHE: dict[str, pa.Table] = {}


def _derived_sequences(sf_dir: str) -> pa.Table:
    from ..sources.sequences import derive_sequences

    if sf_dir not in _DERIVED_CACHE:
        docs = pq.read_table(f"{sf_dir}/documents.parquet")
        _DERIVED_CACHE[sf_dir] = derive_sequences(docs)
    return _DERIVED_CACHE[sf_dir]


def _ensure_artifact(path: str, build) -> str:
    """Idempotent atomic Parquet artifact: build() is called only when the
    (version-keyed) path is missing; written tmp+rename."""
    import os as _os
    import uuid as _uuid

    if not _os.path.exists(path):
        _os.makedirs(_os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp-{_uuid.uuid4().hex}"
        pq.write_table(build(), tmp)
        _os.replace(tmp, path)
    return path


def ensure_derived_parquet(sf_dir: str) -> str:
    """Materialize the derived sequences table (sid, tokens, n_tok, source)
    as Parquet in the shared oracle-artifact dir — the Ray queries read it
    DISTRIBUTED and the DuckDB oracles ``read_parquet``+``UNNEST`` the same
    file."""
    import os as _os

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "derived.parquet"),
        lambda: _derived_sequences(sf_dir),
    )


def q_token_frequency_topk(sf_dir: str) -> pd.DataFrame:
    """Vocab histogram over the derived tokens payload: per-batch
    value_counts partials → bucketed reduce → top-50.  Oracle:
    ``UNNEST(tokens)`` + GROUP BY over the same materialized Parquet."""
    from ..functions.tokens import token_frequency

    ds = rd.read_parquet(ensure_derived_parquet(sf_dir), columns=["tokens"], override_num_blocks=8)
    return token_frequency(ds, topk=50)


SQL_TOKEN_FREQUENCY = f"""
SELECT CAST(token AS BIGINT) AS token, COUNT(*) AS "count"
FROM (SELECT UNNEST(tokens) AS token
      FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet'))
GROUP BY 1 ORDER BY "count" DESC, token LIMIT 50
"""


def q_bigram_topk(sf_dir: str) -> pd.DataFrame:
    """Top-20 adjacent token pairs (within sequences) — packed-int64 bigram
    keys, value_counts partials, bucketed reduce.  Oracle: lateral
    generate_series over the token lists."""
    from ..functions.tokens import bigram_topk

    ds = rd.read_parquet(ensure_derived_parquet(sf_dir), columns=["tokens"], override_num_blocks=8)
    return bigram_topk(ds, k=20)


SQL_BIGRAM_TOPK = f"""
WITH seq AS (SELECT tokens FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')),
z AS (
  SELECT UNNEST(list_zip(tokens[1:len(tokens) - 1], tokens[2:len(tokens)])) AS p
  FROM seq WHERE len(tokens) >= 2
)
SELECT CAST(p[1] AS BIGINT) AS token_a, CAST(p[2] AS BIGINT) AS token_b, COUNT(*) AS "count"
FROM z GROUP BY 1, 2 ORDER BY "count" DESC, token_a, token_b LIMIT 20
"""


def q_training_chunks(sf_dir: str) -> pd.DataFrame:
    """GPT-style concat-and-chunk training layout: docs ordered by doc_id
    concatenate into one token stream (EOS after each doc) cut into exact
    1024-token blocks spanning doc boundaries.  Per-chunk stats gate the
    whole distributed composition — offset prefix-sum exchange, local piece
    slicing, chunk assembly — against a window-function SQL mirror."""
    from ..functions.tokens import concat_chunk_tokens

    ds = rd.read_parquet(
        ensure_derived_parquet(sf_dir), columns=["doc_id", "tokens", "n_tok"],
        override_num_blocks=8,
    )
    out = concat_chunk_tokens(ds, seq_len=1024).to_pandas()
    out = out.sort_values("chunk_id", ignore_index=True)
    return _i64(out, ["chunk_id", "n_tokens", "n_doc_starts", "token_sum"])


SQL_TRAINING_CHUNKS = f"""
WITH seq AS (
  SELECT doc_id, tokens, n_tok,
         COALESCE(SUM(CAST(n_tok AS BIGINT) + 1) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS base
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')
),
flat AS (
  SELECT base + gs.i - 1 AS pos,
         CASE WHEN gs.i <= n_tok THEN tokens[gs.i] ELSE 2147483647 END AS tok,
         CASE WHEN gs.i = 1 THEN 1 ELSE 0 END AS is_start
  FROM seq, unnest(generate_series(1, CAST(n_tok AS BIGINT) + 1)) AS gs(i)
)
SELECT CAST(pos // 1024 AS BIGINT) AS chunk_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(is_start) AS BIGINT) AS n_doc_starts,
       CAST(SUM(CAST(tok AS HUGEINT)) AS BIGINT) AS token_sum
FROM flat GROUP BY 1 ORDER BY 1
"""


def q_length_histogram(sf_dir: str) -> pd.DataFrame:
    """Sequence-length buckets (width 16) over the derived corpus."""
    from ..functions.tokens import length_histogram

    ds = rd.read_parquet(ensure_derived_parquet(sf_dir), columns=["n_tok"], override_num_blocks=8)
    return length_histogram(ds, bucket_width=16)


SQL_LENGTH_HISTOGRAM = f"""
SELECT CAST(n_tok // 16 AS BIGINT) AS bucket,
       COUNT(*) AS n_sequences,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')
GROUP BY 1 ORDER BY 1
"""


def _pack_source_stats(sub: pa.Table, max_len: int = 512) -> tuple[int, int, int]:
    """Deterministic FFD packing of ONE source's rows: sort by doc_id first
    so first-fit-decreasing tie-breaks are partition-independent.  Returns
    (n_packs, total_tokens, total_docs)."""
    from ..functions.tokens import pack_batch

    sub = sub.sort_by("doc_id")
    p = pack_batch(sub, max_len=max_len)
    return (
        p.num_rows,
        int(pc.sum(p["n_tok"]).as_py() or 0),
        int(pc.sum(p["n_docs"]).as_py() or 0),
    )


def _pack_stats_table(t: pa.Table, max_len: int = 512) -> pa.Table:
    """(source, n_packs, total_tokens, total_docs) for every source present
    in ``t`` — the one per-source packing loop shared by the distributed
    query and the driver-side reference artifact."""
    col = t["source"].combine_chunks() if isinstance(t["source"], pa.ChunkedArray) else t["source"]
    rows = []
    for src in sorted(pc.unique(col).to_pylist()):
        n_packs, tt, td = _pack_source_stats(t.filter(pc.equal(t["source"], src)), max_len)
        rows.append({"source": src, "n_packs": n_packs, "total_tokens": tt, "total_docs": td})
    return pa.Table.from_pylist(rows)


def ensure_packing_artifact(sf_dir: str, max_len: int = 512) -> str:
    """Driver-side REFERENCE packing (per-source, deterministic) written as
    (source, n_packs, total_tokens, total_docs) Parquet — the oracle's
    n_packs source.  The distributed query must reproduce it exactly."""
    import os as _os

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "packed_stats.parquet"),
        lambda: _pack_stats_table(_derived_sequences(sf_dir), max_len),
    )


def q_packing_stats(sf_dir: str) -> pd.DataFrame:
    """Greedy FFD sequence packing into 512-token rows, co-grouped by source
    (deterministic: packing order is doc_id within source, independent of
    block layout).  Oracle cross-checks total_tokens/total_docs straight
    from the derived table (conservation) and n_packs against the
    driver-side reference packing.  ``pack_sequences`` (block-local, no
    shuffle) remains the max-throughput API for when bit-stable layout
    across reruns is not required."""
    ensure_packing_artifact(sf_dir)

    ds = rd.read_parquet(
        ensure_derived_parquet(sf_dir), columns=["doc_id", "tokens", "n_tok", "source"]
    )

    # one group per source (bounded key space — the co-group ships each
    # source's rows to one worker; length-bucket pre-split for skewed
    # sources is the documented escape hatch)
    per_source = ds.groupby("source").map_groups(_pack_stats_table, batch_format="pyarrow").to_pandas()
    n_packs = int(per_source["n_packs"].sum())
    tt = int(per_source["total_tokens"].sum())
    td = int(per_source["total_docs"].sum())
    out = pd.DataFrame(
        {
            "n_packs": [n_packs],
            "total_tokens": [tt],
            "total_docs": [td],
            "mean_fill": [_rd(tt / n_packs / 512, 6)],
        }
    )
    return _i64(out, ["n_packs", "total_tokens", "total_docs"])


SQL_PACKING_STATS = f"""
WITH ref AS (SELECT CAST(SUM(n_packs) AS BIGINT) AS n_packs
             FROM read_parquet('{ORACLE_ARTIFACT_DIR}/packed_stats.parquet')),
tot AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS total_tokens, COUNT(*) AS total_docs
        FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet'))
SELECT n_packs, total_tokens, total_docs,
       ROUND(CAST(total_tokens AS DOUBLE) / n_packs / 512, 6) AS mean_fill
FROM ref, tot
"""


def q_dedup_sequences(sf_dir: str) -> pd.DataFrame:
    """Sequence-level EXACT dedup on the tokens payload: per-source counts of
    distinct token arrays (bit-exact list equality) via vectorized dual-64-bit
    fingerprints + bucketed distinct reduce — the corpus never ships whole
    token arrays, only 24-byte fingerprint rows."""
    from ..functions.tokens import sequence_dedup_stats

    ds = rd.read_parquet(
        ensure_derived_parquet(sf_dir), columns=["tokens", "source"], override_num_blocks=8
    )
    return sequence_dedup_stats(ds, group_col="source")


SQL_DEDUP_SEQUENCES = f"""
SELECT source, COUNT(*) AS n_seqs, COUNT(DISTINCT tokens) AS n_unique
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')
GROUP BY source ORDER BY source
"""


def q_epoch_shuffle(sf_dir: str) -> pd.DataFrame:
    """Deterministic seeded global shuffle for training epochs: order by
    md5(doc_id ‖ epoch-seed), take the first 100.  Hash-ordering IS the
    shuffle — reproducible across reruns/partitionings, no RNG state, and it
    runs as a distributed top-k (per-block prune to k, tiny final sort), not
    a full all-to-all sort."""
    ds = _t(sf_dir, "documents", ["doc_id"])

    def add_key(t: pa.Table) -> pa.Table:
        key = md5_hex(
            pc.binary_join_element_wise(pc.cast(t["doc_id"], pa.string()), ":epoch1", "")
        )
        return t.append_column("shuffle_key", key)

    keyed = ds.map_batches(add_key, batch_format="pyarrow", zero_copy_batch=True)
    out = topk(keyed, ["shuffle_key"], [False], 100).to_pandas()
    return _i64(out, ["doc_id"])


SQL_EPOCH_SHUFFLE = """
SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':epoch1') AS shuffle_key
FROM documents ORDER BY shuffle_key LIMIT 100
"""


def q_split_counts(sf_dir: str) -> pd.DataFrame:
    """Deterministic train/val split: a doc is 'val' iff md5(doc_id ‖ salt)
    sorts below the hex prefix '1a' (0x1a/0x100 ≈ 10.2% — hash-fraction
    splitting, the leakage-safe way to split at 100 TB: membership is a pure
    function of the id, never of partitioning or sampling state)."""
    ds = _t(sf_dir, "documents", ["doc_id", "source"])

    def tag(t: pa.Table) -> pa.Table:
        fp = md5_hex(
            pc.binary_join_element_wise(pc.cast(t["doc_id"], pa.string()), ":split", "")
        )
        split = pc.if_else(pc.less(fp, "1a"), "val", "train")
        return pa.table({"source": t["source"], "split": split})

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_sums(tagged, ["source", "split"], {}, "n", reduce="driver").to_pandas()
    return _i64(out, ["n"])


SQL_SPLIT_COUNTS = """
SELECT source,
       CASE WHEN md5(CAST(doc_id AS VARCHAR) || ':split') < '1a'
            THEN 'val' ELSE 'train' END AS split,
       COUNT(*) AS n
FROM documents GROUP BY 1, 2
"""


def q_oov_rate(sf_dir: str) -> pd.DataFrame:
    """Vocabulary coverage: build the top-100 vocab from the corpus itself
    (distributed histogram, deterministic count-desc/token-asc ties),
    broadcast it, then one streaming pass counts in/out-of-vocab tokens per
    source.  The classic two-phase aggregate→broadcast→scan pipeline."""
    from ..functions.tokens import _flat_tokens, token_frequency

    ds = rd.read_parquet(ensure_derived_parquet(sf_dir), columns=["tokens", "source"])
    vocab = np.sort(token_frequency(ds, topk=100)["token"].to_numpy().astype(np.int32))
    import ray as _ray

    vocab_ref = _ray.put(vocab)

    def partial(t: pa.Table) -> pa.Table:
        v = _ray.get(vocab_ref)
        values, offsets = _flat_tokens(t)
        lens = np.diff(offsets - offsets[0])
        window = values[offsets[0] : offsets[-1]]
        oov = np.ones(len(window), dtype=np.int64)
        idx = np.searchsorted(v, window)
        idx[idx == len(v)] = 0
        oov[v[idx] == window] = 0
        csum = np.concatenate([[0], np.cumsum(oov)])
        starts = (offsets - offsets[0]).astype(np.int64)
        per_row_oov = csum[starts[1:]] - csum[starts[:-1]]
        flat = pa.table(
            {"source": t["source"],
             "n_tokens": pa.array(lens, type=pa.int64()),
             "n_oov": pa.array(per_row_oov, type=pa.int64())}
        )
        g = flat.group_by(["source"]).aggregate([("n_tokens", "sum"), ("n_oov", "sum")])
        return pa.table(
            {"source": g["source"], "n_tokens": g["n_tokens_sum"], "n_oov": g["n_oov_sum"]}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = parts.groupby("source", as_index=False).agg(
        n_tokens=("n_tokens", "sum"), n_oov=("n_oov", "sum")
    )
    out["oov_rate"] = (out["n_oov"] / out["n_tokens"]).pipe(_rd)
    return _i64(out, ["n_tokens", "n_oov"])


SQL_OOV_RATE = f"""
WITH tok AS (
  SELECT source, UNNEST(tokens) AS token
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')
), vocab AS (
  SELECT token FROM tok GROUP BY token ORDER BY COUNT(*) DESC, token LIMIT 100
)
SELECT source, COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN token IN (SELECT token FROM vocab) THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
       ROUND(CAST(SUM(CASE WHEN token IN (SELECT token FROM vocab) THEN 0 ELSE 1 END) AS DOUBLE)
             / COUNT(*), 6) AS oov_rate
FROM tok GROUP BY source
"""


def q_unigram_surprisal(sf_dir: str) -> pd.DataFrame:
    """Perplexity-style quality signal: corpus unigram LM (distributed
    histogram) → broadcast dense −ln p table → one scan scores every
    sequence; per-source mean surprisal.  Two-phase aggregate → broadcast →
    scan, like ``oov_rate`` but with a real LM score."""
    from ..functions.tokens import surprisal_stats
    from ..schema import VOCAB_SIZE

    ds = rd.read_parquet(
        ensure_derived_parquet(sf_dir), columns=["tokens", "source"], override_num_blocks=8
    )
    return surprisal_stats(ds, VOCAB_SIZE, group_col="source")


SQL_UNIGRAM_SURPRISAL = f"""
WITH tok AS (
  SELECT doc_id, source, UNNEST(tokens) AS token
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')
), cnt AS (
  SELECT token, COUNT(*) AS c FROM tok GROUP BY token
), tot AS (
  SELECT CAST(SUM(c) AS DOUBLE) AS s FROM cnt
), seq AS (
  SELECT doc_id, source, AVG(-LN(c / (SELECT s FROM tot))) AS surp
  FROM tok JOIN cnt USING (token) GROUP BY doc_id, source
)
SELECT source, COUNT(*) AS n_seqs, ROUND(AVG(surp), 6) AS avg_surprisal
FROM seq GROUP BY source
"""


def q_chunk_stats(sf_dir: str) -> pd.DataFrame:
    """Context-window chunking: split every sequence into ≤128-token chunks
    (offsets-only rewrite, token buffer shared) and aggregate per-source
    chunk counts FROM THE CHUNK OUTPUT — the oracle recomputes the expected
    counts arithmetically from n_tok, so any kernel slip (lost/duplicated
    token, off-by-one boundary) breaks equality."""
    from ..functions.tokens import chunk_sequences

    ds = rd.read_parquet(
        ensure_derived_parquet(sf_dir), columns=["doc_id", "tokens", "source"],
        override_num_blocks=8,
    )
    chunks = chunk_sequences(ds, max_len=128, id_col="doc_id")

    def partial(t: pa.Table) -> pa.Table:
        full = pc.cast(pc.equal(t["n_tok"], 128), pa.int64())
        first = pc.cast(pc.equal(t["chunk_id"], 0), pa.int64())
        flat = pa.table(
            {"source": t["source"], "n_seqs": first, "n_chunks": pa.array([1] * len(t), pa.int64()),
             "n_full": full, "tokens_out": pc.cast(t["n_tok"], pa.int64())}
        )
        g = flat.group_by(["source"]).aggregate(
            [("n_seqs", "sum"), ("n_chunks", "sum"), ("n_full", "sum"), ("tokens_out", "sum")]
        )
        return pa.table(
            {"source": g["source"], "n_seqs": g["n_seqs_sum"], "n_chunks": g["n_chunks_sum"],
             "n_full": g["n_full_sum"], "tokens_out": g["tokens_out_sum"]}
        )

    parts = chunks.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = parts.groupby("source", as_index=False).sum().sort_values("source", ignore_index=True)
    return _i64(out, ["n_seqs", "n_chunks", "n_full", "tokens_out"])


SQL_CHUNK_STATS = f"""
SELECT source, COUNT(*) AS n_seqs,
       CAST(SUM(GREATEST((n_tok + 127) // 128, 1)) AS BIGINT) AS n_chunks,
       CAST(SUM(n_tok // 128) AS BIGINT) AS n_full,
       CAST(SUM(n_tok) AS BIGINT) AS tokens_out
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')
GROUP BY source
"""


def q_contamination_check(sf_dir: str) -> pd.DataFrame:
    """Benchmark-contamination scan: distinct word-3-grams of the held-out
    subset (doc_id % 29 == 0) are built distributed, unioned on the driver
    (benchmark-sized), broadcast once, then one streaming pass counts each
    remaining doc's overlapping gram occurrences."""
    from ..functions.grams import contamination_counts

    ds = _t(sf_dir, "documents", ["doc_id", "text", "source"])
    return contamination_counts(ds, bench_mod=29, k=3)


SQL_CONTAMINATION = """
WITH words AS (
  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
), grams AS (
  SELECT doc_id, source, array_to_string(w[i:i+2], ' ') AS g
  FROM words, unnest(generate_series(1, len(w) - 2)) AS t(i)
), bench AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % 29 = 0
), hits AS (
  SELECT doc_id, source, SUM(CASE WHEN g IN (SELECT g FROM bench) THEN 1 ELSE 0 END) AS n_hit
  FROM grams WHERE doc_id % 29 <> 0 GROUP BY doc_id, source
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN n_hit > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
       CAST(SUM(n_hit) AS BIGINT) AS total_hits
FROM hits GROUP BY source
"""


def q_cross_doc_dup_windows(sf_dir: str) -> pd.DataFrame:
    """Cross-document exact substring duplication at word-5-gram window
    granularity (Lee et al. ACL 2022 span dedup): per doc, windows whose
    gram occurs in >=2 distinct docs.  One bucketed gram-hash exchange of
    (gram, doc, multiplicity) combiner rows."""
    from ..functions.grams import cross_doc_dup_windows

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return cross_doc_dup_windows(ds, k=5)


SQL_CROSS_DOC_DUP_WINDOWS = """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), grams AS (
  SELECT doc_id, array_to_string(w[i:i+4], ' ') AS g
  FROM words, unnest(generate_series(1, len(w) - 4)) AS t(i)
), dup AS (
  SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) > 1
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_windows
FROM grams JOIN dup USING (g)
GROUP BY doc_id ORDER BY doc_id
"""


def q_substring_dedup_stats(sf_dir: str) -> pd.DataFrame:
    """Lee et al. span dedup DECISION: cut every occurrence of a >=2x gram
    except the globally first (min doc,pos); per-doc words removed =
    interval-union of cut windows.  Two-pass: collapsed gram counts →
    broadcast dup set → position rows for dup grams only."""
    from ..functions.grams import substring_dedup_cuts

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return substring_dedup_cuts(ds, k=5)


SQL_SUBSTRING_DEDUP_STATS = """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), grams AS (
  SELECT doc_id, i AS pos, array_to_string(w[i:i+4], ' ') AS g
  FROM words, unnest(generate_series(1, len(w) - 4)) AS t(i)
), ranked AS (
  SELECT doc_id, pos,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn,
         COUNT(*) OVER (PARTITION BY g) AS cnt
  FROM grams
), cut AS (
  SELECT doc_id, pos FROM ranked WHERE cnt >= 2 AND rn > 1
)
SELECT doc_id, CAST(COUNT(DISTINCT idx) AS BIGINT) AS n_removed_words
FROM cut, unnest(generate_series(pos, pos + 4)) AS t(idx)
GROUP BY doc_id ORDER BY doc_id
"""


def q_substring_dedup_rewrite(sf_dir: str) -> pd.DataFrame:
    """Span dedup REWRITE: every doc with its cut-window words removed —
    the actual deduplicated corpus, text-level oracle-checked (the SQL
    mirror reassembles each doc from its surviving word positions)."""
    from ..functions.grams import substring_dedup_rewrite

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    out = substring_dedup_rewrite(ds, k=5).to_pandas()
    out = out[["doc_id", "text_dedup"]].sort_values("doc_id", ignore_index=True)
    return _i64(out, ["doc_id"])


SQL_SUBSTRING_DEDUP_REWRITE = """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), grams AS (
  SELECT doc_id, i AS pos, array_to_string(w[i:i+4], ' ') AS g
  FROM words, unnest(generate_series(1, len(w) - 4)) AS t(i)
), ranked AS (
  SELECT doc_id, pos,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn,
         COUNT(*) OVER (PARTITION BY g) AS cnt
  FROM grams
), cov AS (
  SELECT DISTINCT doc_id, idx
  FROM ranked, unnest(generate_series(pos, pos + 4)) AS t(idx)
  WHERE cnt >= 2 AND rn > 1
), toks AS (
  SELECT doc_id, i, w[i] AS word FROM words, unnest(generate_series(1, len(w))) AS t(i)
), kept AS (
  SELECT k.doc_id, string_agg(k.word, ' ' ORDER BY k.i) AS text_dedup
  FROM toks k LEFT JOIN cov c ON c.doc_id = k.doc_id AND c.idx = k.i
  WHERE c.idx IS NULL
  GROUP BY k.doc_id
)
SELECT d.doc_id, COALESCE(kept.text_dedup, '') AS text_dedup
FROM documents d LEFT JOIN kept ON kept.doc_id = d.doc_id
ORDER BY d.doc_id
"""


def q_repetition_stats(sf_dir: str) -> pd.DataFrame:
    """Intra-document repetition detector: per-source total vs DISTINCT
    3-gram counts (zero-shuffle — per-doc stats are block-local, only
    per-source partials reduce)."""
    from ..functions.grams import repetition_stats

    ds = _t(sf_dir, "documents", ["doc_id", "text", "source"])
    return repetition_stats(ds, k=3)


SQL_REPETITION = """
WITH words AS (
  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
), grams AS (
  SELECT doc_id, source, array_to_string(w[i:i+2], ' ') AS g
  FROM words, unnest(generate_series(1, len(w) - 2)) AS t(i)
), per_doc AS (
  SELECT doc_id, source, COUNT(*) AS tot, COUNT(DISTINCT g) AS dst
  FROM grams GROUP BY doc_id, source
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN tot > dst THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive,
       CAST(SUM(tot) AS BIGINT) AS total_grams, CAST(SUM(dst) AS BIGINT) AS distinct_grams
FROM per_doc GROUP BY source
"""


def q_domain_mix_sample(sf_dir: str) -> pd.DataFrame:
    """Mixture resampling: each source carries a target keep-rate
    (deterministic {.25,.5,.75,1.0} from the source id); membership is a
    pure hash function of doc_id (md5-fraction, like ``split_counts``) so
    the sample is reproducible across runs/partitionings and never requires
    a shuffle — one streaming tag+count pass."""
    ds = _t(sf_dir, "documents", ["doc_id", "source"])
    thresholds = pa.array(["40000000", "80000000", "c0000000", None], type=pa.string())

    def tag(t: pa.Table) -> pa.Table:
        # % 4 as bit_wise_and(x, 3): pyarrow.compute has no mod kernel
        m = pc.cast(
            pc.bit_wise_and(pc.cast(pc.utf8_slice_codeunits(t["source"], 3, 10), pa.int64()), 3),
            pa.int32(),
        )
        thr = pc.take(thresholds, m)
        h8 = pc.utf8_slice_codeunits(
            md5_hex(pc.binary_join_element_wise(pc.cast(t["doc_id"], pa.string()), ":mix", "")),
            0, 8,
        )
        keep = pc.fill_null(pc.less(h8, thr), True)  # rate 1.0 → keep all
        flat = pa.table(
            {"source": t["source"],
             "n_docs": pa.array(np.ones(len(t), dtype=np.int64)),
             "n_kept": pc.cast(keep, pa.int64())}
        )
        g = flat.group_by(["source"]).aggregate([("n_docs", "sum"), ("n_kept", "sum")])
        return pa.table(
            {"source": g["source"], "n_docs": g["n_docs_sum"], "n_kept": g["n_kept_sum"]}
        )

    parts = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = parts.groupby("source", as_index=False).sum().sort_values("source", ignore_index=True)
    return _i64(out, ["n_docs", "n_kept"])


SQL_DOMAIN_MIX = """
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN CAST(substr(source, 4) AS INT) % 4 = 3 THEN 1
                WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 8) <
                     CASE CAST(substr(source, 4) AS INT) % 4
                          WHEN 0 THEN '40000000' WHEN 1 THEN '80000000'
                          ELSE 'c0000000' END
                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM documents GROUP BY source
"""


def q_temperature_resample(sf_dir: str) -> pd.DataFrame:
    """Temperature-based mixture rebalancing (the multilingual-LLM recipe:
    sample source s with probability ∝ share^(1/T); T=0.5 → weight =
    count², integer-exact): per-source keep-rates derived from OBSERVED
    counts (one tiny grouped count), then one streaming md5-fraction tag
    pass — membership compares 8 hex digits against a per-source integer
    threshold, so the sample is reproducible and float-boundary-free.
    Down-weights oversampled sources toward the tempered share; rate ≥ 1
    keeps all (no repetition here)."""
    docs = _t(sf_dir, "documents", ["doc_id", "source"])
    sizes = grouped_sums(docs.select_columns(["source"]), ["source"], {}, "n").to_pandas()
    sizes = sizes.sort_values("source", ignore_index=True)
    n = sizes["n"].to_numpy().astype(np.float64)
    N, W = n.sum(), (n * n).sum()
    rate = n * n / W * N / n  # left-assoc, mirrored verbatim in SQL
    thr = np.floor(np.minimum(1.0, rate) * 4294967296.0)
    src_list = pa.array(sizes["source"].tolist(), pa.string())
    thr_list = pa.array(
        [format(int(x), "08x") if x < 4294967296.0 else None for x in thr], pa.string()
    )

    def tag(t: pa.Table) -> pa.Table:
        m = pc.index_in(t["source"], src_list)
        th = pc.take(thr_list, m)
        h8 = pc.utf8_slice_codeunits(
            md5_hex(pc.binary_join_element_wise(pc.cast(t["doc_id"], pa.string()), ":temp", "")),
            0, 8,
        )
        keep = pc.fill_null(pc.less(h8, th), True)  # rate >= 1 → keep all
        flat = pa.table(
            {"source": t["source"],
             "n_docs": pa.array(np.ones(len(t), dtype=np.int64)),
             "n_kept": pc.cast(keep, pa.int64())}
        )
        g = flat.group_by(["source"]).aggregate([("n_docs", "sum"), ("n_kept", "sum")])
        return pa.table(
            {"source": g["source"], "n_docs": g["n_docs_sum"], "n_kept": g["n_kept_sum"]}
        )

    parts = docs.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = parts.groupby("source", as_index=False).sum().sort_values("source", ignore_index=True)
    return _i64(out, ["n_docs", "n_kept"])


SQL_TEMPERATURE_RESAMPLE = """
WITH c AS (
  SELECT source, CAST(COUNT(*) AS DOUBLE) AS n FROM documents GROUP BY source
), tot AS (
  SELECT SUM(n) AS nt, SUM(n * n) AS wt FROM c
), th AS (
  SELECT source,
         CAST(FLOOR(LEAST(1.0, n * n / wt * nt / n) * 4294967296) AS BIGINT) AS thr
  FROM c, tot
)
SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN t.thr >= 4294967296 THEN 1
                     WHEN substr(md5(CAST(d.doc_id AS VARCHAR) || ':temp'), 1, 8)
                          < printf('%08x', t.thr) THEN 1
                     ELSE 0 END) AS BIGINT) AS n_kept
FROM documents d JOIN th t USING (source)
GROUP BY d.source ORDER BY d.source
"""


def q_embedding_centroids(sf_dir: str) -> pd.DataFrame:
    """Vector AGGREGATE over the embedding column: per-label centroid
    (dimension-wise mean).  Per-batch partials are (label, sum-vector, n)
    — one ``np.add.at`` scatter per batch over the zero-copy matrix view —
    and only |labels|·d floats ever reduce; rows never shuffle."""
    ds = _t(sf_dir, "embeddings", ["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "sums": pa.array([], pa.list_(pa.float64()))})
        arr = t["embedding"].combine_chunks() if isinstance(t["embedding"], pa.ChunkedArray) else t["embedding"]
        mat = np.asarray(arr.flatten(), dtype=np.float64).reshape(len(t), -1)
        labels = np.asarray(t["label"].to_numpy(zero_copy_only=False), dtype=np.int64)
        uniq, codes = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), mat.shape[1]))
        np.add.at(sums, codes, mat)
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {"label": pa.array(uniq), "n": pa.array(n),
             "sums": pa.array(list(sums), type=pa.list_(pa.float64()))}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    rows = []
    for label, g in parts.groupby("label"):
        n = int(g["n"].sum())
        s = np.sum(np.stack([np.asarray(x) for x in g["sums"]]), axis=0)
        cent = _rd(s / n, 6)
        rows.extend(
            {"label": int(label), "dim": d, "n": n, "centroid": float(v)}
            for d, v in enumerate(cent)
        )
    return pd.DataFrame(rows).sort_values(["label", "dim"], ignore_index=True)


SQL_EMBEDDING_CENTROIDS = """
WITH e AS (
  SELECT label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), ex AS (
  SELECT label, i - 1 AS dim, emb[i] AS v
  FROM e, unnest(generate_series(1, len(emb))) AS t(i)
)
SELECT CAST(label AS BIGINT) AS label, dim, COUNT(*) AS n, ROUND(AVG(v), 6) AS centroid
FROM ex GROUP BY label, dim
"""


def q_embedding_covariance(sf_dir: str) -> pd.DataFrame:
    """SECOND-order vector aggregate: the d×d sample covariance of the
    embedding column from mergeable moment partials — each batch emits one
    (n, Σx, ΣxxT) row (one BLAS gemm per batch, d² floats, rows never
    shuffle); the driver folds the handful of partials and closes the form
    ``(G − s·sT/n)/(n−1)``, the same algebra as SQL ``covar_samp``.  This is
    the PCA/whitening front half at corpus scale — only O(d²) state moves."""
    ds = _t(sf_dir, "embeddings", ["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.list_(pa.float64())),
                             "g": pa.array([], pa.list_(pa.float64()))})
        arr = t["embedding"].combine_chunks() if isinstance(t["embedding"], pa.ChunkedArray) else t["embedding"]
        mat = np.asarray(arr.flatten(), dtype=np.float64).reshape(len(t), -1)
        return pa.table(
            {"n": pa.array([len(t)]),
             "s": pa.array([mat.sum(axis=0)], type=pa.list_(pa.float64())),
             "g": pa.array([(mat.T @ mat).ravel()], type=pa.list_(pa.float64()))}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    n = int(parts["n"].sum())
    s = np.sum(np.stack([np.asarray(x) for x in parts["s"]]), axis=0)
    g = np.sum(np.stack([np.asarray(x) for x in parts["g"]]), axis=0)
    d = len(s)
    cov = (g.reshape(d, d) - np.outer(s, s) / n) / (n - 1)
    ii, jj = np.meshgrid(np.arange(1, d + 1), np.arange(1, d + 1), indexing="ij")
    out = pd.DataFrame(
        {"i": ii.ravel(), "j": jj.ravel(), "cov": _rd(cov.ravel(), 8)}
    )
    return _i64(out, ["i", "j"])


SQL_EMBEDDING_COVARIANCE = """
WITH x AS (
  SELECT vec_id, UNNEST(CAST(embedding AS DOUBLE[])) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
)
SELECT a.i AS i, b.i AS j, ROUND(covar_samp(a.v, b.v), 8) AS cov
FROM x a JOIN x b ON a.vec_id = b.vec_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_customer_order_counts(sf_dir: str) -> pd.DataFrame:
    """LEFT OUTER join through Ray's native hash-partitioned ``Dataset.join``
    (``relational.py::hash_join`` how=left_outer): every customer row
    survives, unmatched order side is NULL → 0. The fact side is
    pre-aggregated to per-custkey counts BEFORE the join (house rule:
    combiner before shuffle), so the join's right input is |custkeys|
    rows, not |orders| — ``COUNT(o_orderkey)`` over a left join equals
    ``COALESCE(pre_count, 0)`` because o_orderkey is never null."""
    from ..functions.relational import hash_join

    cust = _t(sf_dir, "customer", ["c_custkey"])
    orders = _t(sf_dir, "orders", ["o_custkey"])
    per_cust = grouped_sums(orders, ["o_custkey"], {}, "__n")
    j = hash_join(cust, per_cust, on="c_custkey", right_on="o_custkey", how="left_outer")
    out = j.map_batches(
        lambda t: pa.table(
            {"c_custkey": t["c_custkey"],
             "n_orders": pc.fill_null(pc.cast(t["__n"], pa.int64()), 0)}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()
    return _i64(out.sort_values("c_custkey", ignore_index=True), ["c_custkey", "n_orders"])


SQL_CUSTOMER_ORDER_COUNTS = """
SELECT c_custkey, COUNT(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY 1 ORDER BY 1
"""


def q_dominant_user_per_type(sf_dir: str) -> pd.DataFrame:
    """Grouped MODE (argmax-count row per group, deterministic tie-break):
    distributed pair counts → ``grouped_topk`` k=1 — the candidate prune
    means only per-batch leaders ever reach the exchange."""
    from ..functions.relational import grouped_topk

    ds = _t(sf_dir, "events", ["event_type", "user_id"])
    pairs = grouped_sums(ds, ["event_type", "user_id"], {}, "n")
    top = grouped_topk(pairs, ["event_type"], ["n", "user_id"], [True, False], 1).to_pandas()
    out = top.sort_values("event_type", ignore_index=True)[["event_type", "user_id", "n"]]
    return _i64(out, ["user_id", "n"])


SQL_DOMINANT_USER_PER_TYPE = """
WITH c AS (
  SELECT event_type, user_id, COUNT(*) AS n FROM events GROUP BY 1, 2
), r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n DESC, user_id) AS rn FROM c
)
SELECT event_type, user_id, n FROM r WHERE rn = 1 ORDER BY 1
"""


def q_nation_hhi(sf_dir: str) -> pd.DataFrame:
    """Revenue concentration per nation (Herfindahl-Hirschman index over
    customer shares): broadcast dim hop → distributed (nation, customer)
    revenue reduce → tiny per-nation moment fold (Σr², Σr) — shares are
    never materialized row-wise."""
    from ..functions.relational import auto_join

    orders = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j = auto_join(orders, cust, on="o_custkey", right_on="c_custkey")
    cr = grouped_sums(j, ["c_nationkey", "o_custkey"], {"r": "o_totalprice"})

    def moments(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"k": t["c_nationkey"].to_pandas(), "r": t["r"].to_pandas()})
        g = df.groupby("k")["r"]
        return pa.Table.from_pandas(
            pd.DataFrame(
                {"k": g.sum().index, "sr": g.sum().to_numpy(),
                 "sr2": g.apply(lambda x: float((x.to_numpy() ** 2).sum())).to_numpy(),
                 "nc": g.size().to_numpy()}
            ),
            preserve_index=False,
        )

    m = grouped_sums(
        cr.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True),
        ["k"], {"sr": "sr", "sr2": "sr2", "nc": "nc"}, reduce="driver"
    ).to_pandas()
    m["hhi"] = (m["sr2"] / (m["sr"] * m["sr"])).pipe(_rd, 9)
    out = m.rename(columns={"k": "c_nationkey", "nc": "n_customers"})
    out = out[["c_nationkey", "hhi", "n_customers"]].sort_values("c_nationkey", ignore_index=True)
    return _i64(out, ["c_nationkey", "n_customers"])


SQL_NATION_HHI = """
WITH cr AS (
  SELECT c_nationkey, o_custkey, SUM(o_totalprice) AS r
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
)
SELECT c_nationkey, ROUND(SUM(r * r) / (SUM(r) * SUM(r)), 9) AS hhi,
       COUNT(*) AS n_customers
FROM cr GROUP BY 1 ORDER BY 1
"""


def q_user_paths(sf_dir: str) -> pd.DataFrame:
    """Ordered LISTAGG: each user's first-8 event-type path joined with
    '>' — the collect-ordered-per-group shape.  One hash exchange on
    user_id; within the bucket a single sort + per-user head(8) bounds
    every group before strings are assembled, so no unbounded row
    gathering."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        head = df.groupby("user_id", sort=False).head(8)
        out = head.groupby("user_id", sort=False)["event_type"].agg(">".join)
        return out.reset_index().rename(columns={"event_type": "path"})

    out = bucketed_group_reduce(ds, ["user_id"], per_bucket).to_pandas()
    return _i64(out.sort_values("user_id", ignore_index=True), ["user_id"])


SQL_USER_PATHS = """
WITH r AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
FROM r WHERE rn <= 8 GROUP BY 1 ORDER BY 1
"""


def q_type_hour_chi2(sf_dir: str) -> pd.DataFrame:
    """χ² independence test of event_type × hour-of-day: distributed
    contingency counts (the only corpus-sized pass), then the full-grid
    statistic — INCLUDING zero-observed cells — folds on the driver from
    the |types|×24 matrix."""
    ds = _t(sf_dir, "events", ["event_type", "ts"])

    def bucketize(t: pa.Table) -> pa.Table:
        hr = pc.cast(
            pc.divide(pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()), 3_600_000_000),
            pa.int64(),
        )
        return pa.table({"event_type": t["event_type"], "hr": pc.subtract(hr, pc.multiply(pc.divide(hr, 24), 24))})

    counts = grouped_sums(
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "hr"], {}, "o",
    ).to_pandas()
    # grid spans observed rows × observed columns (empty rows/cols carry no
    # χ² mass and would 0/0 the expected counts — both sides drop them)
    grid = counts.pivot_table(index="event_type", columns="hr", values="o", fill_value=0)
    o = grid.to_numpy(dtype="float64")
    n = o.sum()
    e = np.outer(o.sum(axis=1), o.sum(axis=0)) / n
    chi2 = float(((o - e) ** 2 / e).sum())
    return pd.DataFrame(
        {"chi2": [_rd(chi2, 6)],
         "n_cells": np.array([o.size], dtype="int64"),
         "dof": np.array([(o.shape[0] - 1) * (o.shape[1] - 1)], dtype="int64")}
    )


SQL_TYPE_HOUR_CHI2 = """
WITH o AS (
  SELECT event_type, hour(ts) AS hr, COUNT(*) AS o
  FROM events GROUP BY 1, 2
),
rt AS (SELECT event_type, SUM(o) AS r FROM o GROUP BY 1),
ct AS (SELECT hr, SUM(o) AS c FROM o GROUP BY 1),
tot AS (SELECT SUM(o) AS n FROM o),
cells AS (
  SELECT rt.r * ct.c / (SELECT n FROM tot) AS e, COALESCE(o.o, 0) AS obs
  FROM rt CROSS JOIN ct
  LEFT JOIN o ON o.event_type = rt.event_type AND o.hr = ct.hr
)
SELECT ROUND(SUM((obs - e) * (obs - e) / e), 6) AS chi2,
       COUNT(*) AS n_cells,
       ((SELECT COUNT(*) FROM rt) - 1) * ((SELECT COUNT(*) FROM ct) - 1) AS dof
FROM cells
"""


ANALYZE_COLS = ["event_id", "user_id", "value"]


def q_analyze_events(sf_dir: str) -> pd.DataFrame:
    """Catalog statistics (ANALYZE) over the events table —
    ``explore.py::analyze_columns``: one streaming pass for
    n/nulls/min/max of all columns, exact NDV per column via unique
    partials + bucketed distinct reduce."""
    from ..functions.explore import analyze_columns

    ds = _t(sf_dir, "events", ANALYZE_COLS)
    return analyze_columns(ds, ANALYZE_COLS)


SQL_ANALYZE_EVENTS = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_nulls, COUNT(DISTINCT {c}) AS n_distinct,
       ROUND(CAST(MIN({c}) AS DOUBLE), 6) AS min_v,
       ROUND(CAST(MAX({c}) AS DOUBLE), 6) AS max_v
FROM events"""
    for c in ["event_id", "user_id", "value"]
)


def q_source_kl(sf_dir: str) -> pd.DataFrame:
    """Domain-drift detector: KL(P(token|source) ‖ P(token)) per source over
    the tokens payload.  Per-batch (source, token) count partials →
    distributed bucketed reduce → the ≤|sources|·|vocab| count rows (vocab
    is bounded, not corpus-sized) finish on the driver."""
    st = _source_token_counts(sf_dir)
    ns = st.groupby("source")["c"].transform("sum")
    ct = st.groupby("token")["c"].transform("sum")
    n = float(st["c"].sum())
    p_ts = st["c"] / ns
    term = p_ts * np.log(p_ts / (ct / n))
    out = (
        pd.DataFrame({"source": st["source"], "term": term})
        .groupby("source", as_index=False)["term"].sum()
        .rename(columns={"term": "kl"})
    )
    out["kl"] = out["kl"].pipe(_rd)
    return out.sort_values("source", ignore_index=True)


SQL_SOURCE_KL = f"""
WITH tok AS (
  SELECT source, UNNEST(tokens) AS token
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')
), st AS (
  SELECT source, token, CAST(COUNT(*) AS DOUBLE) AS c FROM tok GROUP BY source, token
), s AS (
  SELECT source, SUM(c) AS ns FROM st GROUP BY source
), t AS (
  SELECT token, SUM(c) AS ct FROM st GROUP BY token
), tot AS (
  SELECT SUM(c) AS n FROM st
)
SELECT st.source, ROUND(SUM((c / ns) * LN((c / ns) / (ct / (SELECT n FROM tot)))), 6) AS kl
FROM st JOIN s USING (source) JOIN t USING (token)
GROUP BY st.source
"""


def _source_token_counts(sf_dir: str) -> pd.DataFrame:
    """Distributed (source, token, c) reduce shared by source_kl/tfidf —
    bounded by |sources|·|vocab| rows, never corpus-sized."""
    from ..functions.relational import bucketed_group_reduce
    from ..functions.tokens import _flat_tokens

    ds = rd.read_parquet(
        ensure_derived_parquet(sf_dir), columns=["tokens", "source"], override_num_blocks=8
    )

    def partial(t: pa.Table) -> pa.Table:
        values, offsets = _flat_tokens(t)
        window = values[offsets[0] : offsets[-1]].astype(np.int64)
        lens = np.diff(offsets - offsets[0])
        src = pc.take(
            t["source"].combine_chunks() if isinstance(t["source"], pa.ChunkedArray) else t["source"],
            pa.array(np.repeat(np.arange(len(t)), lens), type=pa.int64()),
        )
        flat = pa.table(
            {"source": src, "token": pa.array(window),
             "c": pa.array(np.ones(len(window), np.int64))}
        )
        g = flat.group_by(["source", "token"]).aggregate([("c", "sum")])
        return pa.table({"source": g["source"], "token": g["token"], "c": g["c_sum"]})

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_group_reduce(
        partials, ["source", "token"],
        lambda df: df.groupby(["source", "token"], as_index=False)["c"].sum(),
    ).to_pandas()


def q_tfidf_topk(sf_dir: str) -> pd.DataFrame:
    """Distinctive tokens per source: tf-idf = (c/ns)·ln(S/df) with df =
    #sources containing the token; top-3 per source, ties broken by token id.
    Same distributed (source, token) reduce as ``source_kl``; the ranking
    runs on the bounded |sources|·|vocab| stats table."""
    st = _source_token_counts(sf_dir)
    ns = st.groupby("source")["c"].transform("sum")
    df_t = st.groupby("token")["source"].transform("size")
    S = st["source"].nunique()
    st = st.assign(tfidf=_rd((st["c"] / ns) * np.log(S / df_t), 6))
    out = (
        st.sort_values(["source", "tfidf", "token"], ascending=[True, False, True])
        .groupby("source", sort=False)
        .head(3)
        .loc[:, ["source", "token", "tfidf"]]
        .reset_index(drop=True)
    )
    return _i64(out, ["token"])


SQL_TFIDF_TOPK = f"""
WITH tok AS (
  SELECT source, UNNEST(tokens) AS token
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')
), st AS (
  SELECT source, token, CAST(COUNT(*) AS DOUBLE) AS c FROM tok GROUP BY source, token
), s AS (
  SELECT source, SUM(c) AS ns FROM st GROUP BY source
), d AS (
  SELECT token, CAST(COUNT(*) AS DOUBLE) AS df FROM st GROUP BY token
), n AS (
  SELECT CAST(COUNT(DISTINCT source) AS DOUBLE) AS S FROM st
), scored AS (
  SELECT st.source, st.token,
         ROUND((c / ns) * LN((SELECT S FROM n) / df), 6) AS tfidf
  FROM st JOIN s USING (source) JOIN d USING (token)
)
SELECT source, token, tfidf FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY tfidf DESC, token) AS rn
  FROM scored
) WHERE rn <= 3
"""


def q_heavy_hitters(sf_dir: str) -> pd.DataFrame:
    """EXACT top-20 tokens via the two-pass heavy-hitter pattern (pigeonhole
    candidate pass → broadcast exact-count verify) — zero shuffles, vs
    ``token_frequency_topk``'s grouped exchange.  Same oracle shape."""
    from ..functions.tokens import heavy_hitters_topk

    ds = rd.read_parquet(
        ensure_derived_parquet(sf_dir), columns=["tokens"], override_num_blocks=8
    )
    return heavy_hitters_topk(ds, k=20, capacity=256)


SQL_HEAVY_HITTERS = f"""
WITH tok AS (
  SELECT UNNEST(tokens) AS token
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')
)
SELECT CAST(token AS BIGINT) AS token, COUNT(*) AS count
FROM tok GROUP BY token ORDER BY count DESC, token LIMIT 20
"""


def q_cms_heavy_hitters(sf_dir: str) -> pd.DataFrame:
    """EXACT top-25 tokens via Count-Min-sketch candidate pruning: pigeonhole
    candidate pass + mergeable 256 KB CMS partials in ONE scan → tree merge
    → ε-margin prune over candidate ids (survivor set is O(k), independent
    of block count — the 10^12-row-safe variant of ``heavy_hitters``) →
    broadcast exact recount.  Exact result, same oracle shape."""
    from ..functions.tokens import cms_heavy_hitters

    ds = rd.read_parquet(
        ensure_derived_parquet(sf_dir), columns=["tokens"], override_num_blocks=8
    )
    return cms_heavy_hitters(ds, k=25, capacity=256)


SQL_CMS_HEAVY_HITTERS = f"""
WITH tok AS (
  SELECT UNNEST(tokens) AS token
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')
)
SELECT CAST(token AS BIGINT) AS token, COUNT(*) AS count
FROM tok GROUP BY token ORDER BY count DESC, token LIMIT 25
"""


def q_curriculum_order(sf_dir: str) -> pd.DataFrame:
    """Curriculum ordering: GLOBAL distributed sort (``Dataset.sort`` — the
    real range-partitioned exchange, not the top-k prune) of the corpus by
    difficulty proxy (n_tok asc, doc_id tiebreak); first 50 rows of the
    sorted stream.  At scale the sorted dataset would stream straight into
    a partitioned writer; the limit keeps the oracle comparable."""
    ds = rd.read_parquet(
        ensure_derived_parquet(sf_dir), columns=["doc_id", "n_tok", "source"],
        override_num_blocks=8,
    )
    out = ds.sort(["n_tok", "doc_id"]).limit(50).to_pandas()
    return _i64(out, ["n_tok"])


SQL_CURRICULUM_ORDER = f"""
SELECT doc_id, n_tok, source
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')
ORDER BY n_tok, doc_id LIMIT 50
"""


def q_order_price_deciles(sf_dir: str) -> pd.DataFrame:
    """SQL ``NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey)`` — exact
    distributed global row-number (``functions/rank.py``: sampled range
    buckets + prefix-offset broadcast, the MPP window construction Ray Data
    lacks natively), then the NTILE formula per batch and a tiny grouped
    reduce.  The only all-to-all moves the two projected columns once."""
    from ..functions.rank import global_row_number, ntile_of

    ds = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    ranked, total = global_row_number(ds, "o_totalprice", ["o_orderkey"])

    def add_decile(t: pa.Table) -> pa.Table:
        dec = ntile_of(t["rn"].to_numpy(zero_copy_only=False), total, 10)
        return pa.table({"decile": pa.array(dec), "o_totalprice": t["o_totalprice"]})

    dec = ranked.map_batches(add_decile, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_sums(dec, ["decile"], {"sum_price": "o_totalprice"}, "n", reduce="driver").to_pandas()
    out["avg_price"] = (out["sum_price"] / out["n"]).pipe(_rd, 2)
    out = out.drop(columns=["sum_price"])
    return _i64(out, ["decile", "n"])


SQL_ORDER_PRICE_DECILES = """
WITH r AS (
  SELECT o_totalprice,
         NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders
)
SELECT decile, COUNT(*) AS n, ROUND(AVG(o_totalprice), 2) AS avg_price
FROM r GROUP BY decile
"""


def q_revenue_rollup(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP(r_name, n_name): ONE distributed groupby at the
    finest level (region, nation) — the coarser levels are derived by
    re-summing that already-tiny aggregate on the driver (the partials are
    reused upward, never a second scan).  NULL rollup slots materialized as
    'ALL' for oracle parity."""
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    nr = nat.to_pandas().merge(reg.to_pandas(), left_on="n_regionkey", right_on="r_regionkey")
    dim = pa.Table.from_pandas(
        nr[["n_nationkey", "n_name", "r_name"]].rename(columns={"n_nationkey": "c_nationkey"}),
        preserve_index=False,
    )
    cust = broadcast_join(
        _t(sf_dir, "customer", ["c_custkey", "c_nationkey"]), dim, "c_nationkey"
    ).select_columns(["c_custkey", "n_name", "r_name"])
    orders = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    from ..functions.relational import auto_join

    joined = auto_join(orders, cust, on="o_custkey", right_on="c_custkey")
    finest = grouped_sums(
        joined, ["r_name", "n_name"], {"revenue": "o_totalprice"}, "n_orders", reduce="driver"
    ).to_pandas()
    lvl1 = finest.groupby("r_name", as_index=False)[["revenue", "n_orders"]].sum()
    lvl1["n_name"] = "ALL"
    lvl0 = pd.DataFrame(
        {"r_name": ["ALL"], "n_name": ["ALL"],
         "revenue": [finest["revenue"].sum()], "n_orders": [finest["n_orders"].sum()]}
    )
    out = pd.concat([finest, lvl1, lvl0], ignore_index=True)[
        ["r_name", "n_name", "revenue", "n_orders"]
    ]
    out["revenue"] = out["revenue"].pipe(_rd, 2)
    return _i64(out, ["n_orders"])


SQL_REVENUE_ROLLUP = """
SELECT COALESCE(r_name, 'ALL') AS r_name, COALESCE(n_name, 'ALL') AS n_name,
       ROUND(SUM(o_totalprice), 2) AS revenue, COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
"""


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_events_pivot_hourly(sf_dir: str) -> pd.DataFrame:
    """Pivot/crosstab: hour-of-day × event_type count matrix, wide format.
    The distributed part is the (hod, type) grouped count with per-batch
    combiner; the wide reshape runs on the ≤ 24×|types| aggregate."""
    ds = _t(sf_dir, "events", ["ts", "event_type"])

    def add_hod(t: pa.Table) -> pa.Table:
        return pa.table(
            {"hod": pc.cast(pc.hour(t["ts"]), pa.int64()), "event_type": t["event_type"]}
        )

    ds = ds.map_batches(add_hod, batch_format="pyarrow", zero_copy_batch=True)
    long = grouped_sums(ds, ["hod", "event_type"], {}, "n", reduce="driver").to_pandas()
    wide = long.pivot_table(index="hod", columns="event_type", values="n", fill_value=0)
    wide = wide.reindex(columns=EVENT_TYPES, fill_value=0).reset_index()
    wide.columns = ["hod"] + [f"n_{t}" for t in EVENT_TYPES]
    return _i64(wide, list(wide.columns))


SQL_EVENTS_PIVOT_HOURLY = """
SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events GROUP BY 1
"""


def q_lang_entropy_per_source(sf_dir: str) -> pd.DataFrame:
    """Shannon entropy of the language mix per source (corpus-diversity
    signal): distributed (source, lang) count with combiner, entropy folded
    on the ≤ |sources|×|langs| aggregate."""
    ds = _t(sf_dir, "documents", ["source", "lang"])
    counts = grouped_sums(ds, ["source", "lang"], {}, "n", reduce="driver").to_pandas()
    tot = counts.groupby("source")["n"].transform("sum")
    p = counts["n"] / tot
    counts["h"] = -p * np.log(p)
    out = counts.groupby("source", as_index=False).agg(n_docs=("n", "sum"), entropy=("h", "sum"))
    out["entropy"] = out["entropy"].pipe(_rd)
    return _i64(out, ["n_docs"])


SQL_LANG_ENTROPY_PER_SOURCE = """
WITH c AS (SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY 1, 2),
     t AS (SELECT source, SUM(n) AS tot FROM c GROUP BY 1)
SELECT c.source AS source, CAST(MAX(t.tot) AS BIGINT) AS n_docs,
       ROUND(-SUM((c.n * 1.0 / t.tot) * ln(c.n * 1.0 / t.tot)), 6) AS entropy
FROM c JOIN t ON c.source = t.source GROUP BY 1
"""


def ensure_token_edges_parquet(sf_dir: str) -> str:
    """Materialize the token-transition graph (bigram counts as weighted
    edges src→dst) once per sf — Ray reads it distributed, the DuckDB
    PageRank oracle reads the same file."""
    import os as _os

    def build() -> pa.Table:
        from ..functions.tokens import _bigram_partial

        part = _bigram_partial(_derived_sequences(sf_dir)).to_pandas()
        agg = part.groupby("bigram", as_index=False)["count"].sum()
        key = agg["bigram"].to_numpy()
        return pa.table(
            {
                "src": pa.array((key >> 32).astype("int64")),
                "dst": pa.array((key & 0xFFFFFFFF).astype("int64")),
                "w": pa.array(agg["count"].to_numpy().astype("float64")),
            }
        )

    return _ensure_artifact(_os.path.join(_corpus_dir(sf_dir), "token_edges.parquet"), build)


PAGERANK_ITERS = 10
PAGERANK_DAMPING = 0.85


def q_token_pagerank(sf_dir: str) -> pd.DataFrame:
    """PageRank over the token-transition graph (10 fixed power iterations,
    d=0.85, uniform dangling redistribution) — ``graph.py::pagerank``: the
    edge Dataset stays distributed and is re-scanned per iteration; only the
    |V|-bounded rank vector crosses the driver.  The oracle is the SAME
    iteration unrolled as a generated 10-step SQL CTE chain."""
    from ..functions.graph import pagerank

    ds = rd.read_parquet(ensure_token_edges_parquet(sf_dir), override_num_blocks=4)
    pr = pagerank(ds, iters=PAGERANK_ITERS, damping=PAGERANK_DAMPING)
    pr["rank"] = pr["rank"].pipe(_rd, 9)
    out = pr.sort_values(["rank", "node"], ascending=[False, True]).head(20)
    out = out.rename(columns={"node": "token"}).reset_index(drop=True)
    return _i64(out, ["token"])


def _pagerank_sql(path: str, iters: int, d: float, k: int) -> str:
    """Unroll the power iteration as a CTE chain mirroring pagerank()'s
    float expression term for term (same literal, same op order).

    Every r{{i}} is referenced twice by iteration i+1 (dangling mass + the
    contrib join), so each CTE MUST be ``AS MATERIALIZED`` — inlined CTEs
    make the plan double per iteration (2^iters blowup)."""
    parts = [
        f"WITH e AS MATERIALIZED (SELECT src, dst, CAST(w AS DOUBLE) AS w FROM read_parquet('{path}'))",
        "ow AS MATERIALIZED (SELECT src, SUM(w) AS ow FROM e GROUP BY 1)",
        "nodes AS MATERIALIZED (SELECT node FROM (SELECT src AS node FROM e UNION SELECT dst AS node FROM e) GROUP BY 1)",
        "nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS cnt FROM nodes)",
        "r0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT cnt FROM nn) AS rank FROM nodes)",
    ]
    for i in range(iters):
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT COALESCE(SUM(r{i}.rank), 0.0) AS m FROM r{i} "
            f"LEFT JOIN ow ON r{i}.node = ow.src WHERE ow.src IS NULL)"
        )
        parts.append(
            f"""r{i + 1} AS MATERIALIZED (
  SELECT nodes.node,
         (1.0 - {d}) / (SELECT cnt FROM nn)
         + {d} * (COALESCE(c.contrib, 0.0) + (SELECT m FROM d{i}) / (SELECT cnt FROM nn)) AS rank
  FROM nodes LEFT JOIN (
    SELECT e.dst AS node, SUM(e.w * (r{i}.rank / ow.ow)) AS contrib
    FROM e JOIN ow ON e.src = ow.src JOIN r{i} ON r{i}.node = e.src GROUP BY 1
  ) c ON nodes.node = c.node)"""
        )
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT node AS token, ROUND(rank, 9) AS rank FROM r{iters} "
        f"ORDER BY ROUND(rank, 9) DESC, token LIMIT {k}"
    )


SQL_TOKEN_PAGERANK = _pagerank_sql(
    f"{ORACLE_ARTIFACT_DIR}/token_edges.parquet", PAGERANK_ITERS, PAGERANK_DAMPING, 20
)


BFS_MAX_HOPS = 6


def q_token_bfs(sf_dir: str) -> pd.DataFrame:
    """Directed BFS hop levels over the token-transition graph from its
    minimum token id — ``graph.py::bfs_levels``: one filtered scan of the
    distributed edge set per hop, |V|-bounded frontier broadcast.  Oracle:
    recursive CTE with UNION dedup (path-free state, Σ work = |E|·hops)."""
    from ..functions.graph import bfs_levels

    path = ensure_token_edges_parquet(sf_dir)
    src_min = int(pq.read_table(path, columns=["src"])["src"].to_pandas().min())
    ds = rd.read_parquet(path, override_num_blocks=4)
    out = bfs_levels(ds, src_min, max_hops=BFS_MAX_HOPS)
    return out.rename(columns={"node": "token"})


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
    from ..functions.sim import lloyd_kmeans

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

    from ..functions.sim import _to_matrix, lloyd_kmeans

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
    from ..functions.tokens import pmi_topk

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
    from ..functions.search import index_term_stats, postings

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
    from ..functions.search import conjunctive_search, postings

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
    tie-break."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        m = df.merge(df, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        out = m.groupby(["l_partkey_x", "l_partkey_y"], as_index=False).size()
        return out.rename(columns={"l_partkey_x": "part_a", "l_partkey_y": "part_b", "size": "n"})

    pairs = bucketed_group_reduce(ds, ["l_orderkey"], per_bucket)
    agg = grouped_sums(pairs, ["part_a", "part_b"], {"n": "n"})
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
    name plus hash-chosen typo variants (substitution for every part, an
    extra deletion for every third part) — rec_id = p_partkey·10 + variant.
    ASCII-only by construction (DuckDB ``levenshtein`` counts bytes; the
    Ray kernel counts codepoints — identical on ASCII)."""
    import hashlib as _hashlib
    import os as _os

    def build() -> pa.Table:
        t = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"])
        ids, names = [], []
        for k, nm in zip(t["p_partkey"].to_pylist(), t["p_name"].to_pylist()):
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

    return _ensure_artifact(_os.path.join(_corpus_dir(sf_dir), "dirty_names.parquet"), build)


def q_record_linkage(sf_dir: str) -> pd.DataFrame:
    """Blocked entity resolution over the dirty-name corpus —
    ``functions/linkage.py::link_records``: prefix/suffix multi-pass
    blocking, one block-key exchange, vectorized batch-Levenshtein verify
    (numpy DP swept across all pairs at once), distributed pair dedup."""
    from ..functions.linkage import link_records

    ds = rd.read_parquet(ensure_dirty_names_parquet(sf_dir), override_num_blocks=4)
    out = link_records(ds, max_dist=2).to_pandas()
    out = out.sort_values(["id_a", "id_b"], ignore_index=True)
    return _i64(out, ["id_a", "id_b", "dist"])


SQL_RECORD_LINKAGE = """
WITH r AS (SELECT rec_id, name FROM read_parquet('{AD}/dirty_names.parquet')),
k AS (
  SELECT rec_id, name, 'p' || substr(name, 1, 3) AS bk FROM r
  UNION ALL
  SELECT rec_id, name, 's' || substr(reverse(name), 1, 3) AS bk FROM r
),
c AS (
  SELECT DISTINCT a.rec_id AS id_a, b.rec_id AS id_b, a.name AS na, b.name AS nb
  FROM k a JOIN k b ON a.bk = b.bk AND a.rec_id < b.rec_id
)
SELECT id_a, id_b, levenshtein(na, nb) AS dist
FROM c WHERE levenshtein(na, nb) <= 2
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
    from ..functions.relational import skew_join

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
    from ..functions.relational import bucketed_group_reduce

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
    from ..functions.windows import range_window_peak

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
    membership co-group; no edge-set broadcast anywhere."""
    from ..functions.graph import triangle_stats
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        m = df.merge(df, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return m[["l_partkey_x", "l_partkey_y"]].drop_duplicates().rename(
            columns={"l_partkey_x": "u", "l_partkey_y": "v"}
        )

    pairs = bucketed_group_reduce(ds, ["l_orderkey"], per_bucket)
    edges = grouped_sums(pairs, ["u", "v"], {})  # global DISTINCT canonical edges
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
    from ..functions.windows import funnel_counts

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
    from ..functions.windows import cohort_retention

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
    from ..functions.windows import lag_gap_stats

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
    from ..functions.windows import transition_matrix

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
    from ..sources.loglines_file import write_logline_corpus

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
    from ..sources.loglines_file import read_logline_corpus
    from ..stages.loglines import extract_batch

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

    from ..functions.hashing import fnv1a64_single
    from ..stages.multimodal import ImageDecoder, synth_media_table

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
    from ..stages.multimodal import ImageDecoder, synth_media_table

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
        from ..functions.hashing import fnv1a64_single

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
    from ..functions.dedup import SimHasher

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

    from ..functions.dedup import SimHasher

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
    from ..functions.dedup import SimHasher

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
    from ..functions.spans import merge_spans

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
    from ..functions.relational import bucketed_group_reduce
    from ..functions.spans import merge_spans

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
    from ..functions.relational import grouped_topk

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
    from ..functions.relational import topk

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
    from ..functions.sketch import grouped_quantile_fixedpoint

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


# ---------------------------------------------------------------------------
# Exploration stats (A5) and set ops (§2.8)
# ---------------------------------------------------------------------------

def q_lang_counts(sf_dir: str) -> pd.DataFrame:
    from ..functions.explore import group_counts

    return _i64(group_counts(_t(sf_dir, "documents", ["lang"]), "lang", k=10), ["n"])


SQL_LANG_COUNTS = """
SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang ORDER BY n DESC, lang LIMIT 10
"""


def q_distinct_users_per_type(sf_dir: str) -> pd.DataFrame:
    """COUNT(DISTINCT key) done scale-correctly: per-batch dedup of
    (type, user) pairs → distributed groupby dedup → per-type count.  The
    shuffle moves distinct pairs, never raw events."""
    ds = _t(sf_dir, "events", ["event_type", "user_id"])

    def batch_distinct(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t["event_type"], "user_id": t["user_id"]}).group_by(
            ["event_type", "user_id"]
        ).aggregate([])

    pairs = ds.map_batches(batch_distinct, batch_format="pyarrow", zero_copy_batch=True)

    # global pair dedup DISTRIBUTED (pair cardinality is |users|×|types| —
    # can be huge): bucket-exchange on the pair key, per-bucket dedup +
    # partial per-type count; only the tiny (type, n) partials reach the
    # driver for the final sum.
    def bucket_count(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["event_type", "user_id"])
        return d.groupby("event_type", as_index=False, dropna=False).size().rename(
            columns={"size": "n_users"}
        )

    from ..functions.relational import bucketed_group_reduce

    part = bucketed_group_reduce(pairs, ["event_type", "user_id"], bucket_count).to_pandas()
    out = part.groupby("event_type", as_index=False, dropna=False)["n_users"].sum()
    return _i64(out, ["n_users"])


SQL_DISTINCT_USERS = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users FROM events GROUP BY event_type
"""


def q_value_median_per_type(sf_dir: str) -> pd.DataFrame:
    """Per-group median via the mergeable fixed-bin histogram sketch
    (``functions/sketch.py``): per-batch sparse histogram partials → bucketed
    merge → quantile from counts.  EXACT here because ``value`` is 2-decimal
    fixed-point, and — unlike ``groupby.map_groups(median)`` — no group's raw
    rows ever co-locate on one worker."""
    from ..functions.sketch import grouped_quantile_fixedpoint

    ds = _t(sf_dir, "events", ["event_type", "value"])
    out = grouped_quantile_fixedpoint(
        ds, "event_type", "value", q=0.5, scale=100, out_name="median_value"
    )
    out["median_value"] = out["median_value"].pipe(_rd)
    return out


SQL_VALUE_MEDIAN = """
SELECT event_type, ROUND(median(value), 6) AS median_value FROM events GROUP BY event_type
"""


def q_kll_price_quantiles(sf_dir: str) -> pd.DataFrame:
    """KLL streaming quantile sketch over l_extendedprice (rows-only: the
    estimate depends on block partitioning; the <1% normalized-rank-error
    contract vs exact quantiles is pytest-gated on this same table).  The
    scale path for quantiles over unbounded value domains: one ~2 KB blob
    per batch moves, never the values."""
    from ..functions.sketch import approx_quantiles

    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    ds = _t(sf_dir, "lineitem", ["l_extendedprice"])
    est = approx_quantiles(ds, "l_extendedprice", qs, k=200)
    return pd.DataFrame({"q": qs, "estimate": [est[q] for q in qs]})


def q_kll_value_by_type(sf_dir: str) -> pd.DataFrame:
    """Grouped KLL: per event_type approximate value quantiles (rows-only;
    per-group <2% rank error pytest-gated).  One blob per (key, batch)
    moves — per-group quantiles without shuffling values."""
    from ..functions.sketch import grouped_approx_quantiles

    ds = _t(sf_dir, "events", ["event_type", "value"])
    return grouped_approx_quantiles(ds, ["event_type"], "value", [0.5, 0.9, 0.99], k=160)


def q_type_overlap_matrix(sf_dir: str) -> pd.DataFrame:
    """EXACT audience-overlap matrix: for every pair of event types, how
    many distinct users did both.  Per-batch combiner collapses to distinct
    (user, type) rows; one bucketed exchange on user co-locates each user's
    type set, pairs explode bucket-locally (bounded: |types|² per user),
    and only (type_a, type_b, count) partials leave.  The exact counterpart
    of kmv_user_overlap's sketch estimates."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "event_type"])

    def distinct_pairs(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "event_type"]).aggregate([])
        return g

    parts = ds.map_batches(distinct_pairs, batch_format="pyarrow", zero_copy_batch=True)

    def pair_counts(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["user_id", "event_type"])
        m = df.merge(df, on="user_id")
        m = m[m["event_type_x"] < m["event_type_y"]]
        return m.groupby(["event_type_x", "event_type_y"], as_index=False).agg(
            n_users=("user_id", "nunique"))

    per_bucket = bucketed_group_reduce(parts, ["user_id"], pair_counts).to_pandas()
    out = per_bucket.groupby(["event_type_x", "event_type_y"], as_index=False)[
        "n_users"].sum()
    out = out.rename(columns={"event_type_x": "type_a", "event_type_y": "type_b"})
    out = out.sort_values(["type_a", "type_b"], ignore_index=True)
    return _i64(out, ["n_users"])


SQL_TYPE_OVERLAP_MATRIX = """
WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM d a JOIN d b ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2 ORDER BY 1, 2
"""


def ensure_kmv_overlap_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``kmv_user_overlap``: the four estimates
    re-derived by an INDEPENDENT reference — pure-Python scalar FNV +
    fmix64 per distinct user (not the Arrow-buffer vectorized pass),
    Python ``sorted`` bottom-k over set algebra (not the per-batch
    ``np.unique`` blob merge).  A KMV sketch is a pure function of the
    distinct-value set, so both compositions must agree exactly
    (same IEEE estimator divisions on the same k-th minima)."""
    import os as _os

    def build() -> pa.Table:
        from ..functions.hashing import fnv1a64_single

        def fmix64(x: int) -> int:
            m = (1 << 64) - 1
            x ^= x >> 33
            x = (x * 0xFF51AFD7ED558CCD) & m
            x ^= x >> 33
            x = (x * 0xC4CEB9FE1A85EC53) & m
            x ^= x >> 33
            return x

        k = 2048
        ev = pq.read_table(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
        users = {"purchase": set(), "error": set()}
        for uid, et in zip(ev["user_id"].to_pylist(), ev["event_type"].to_pylist()):
            if et in users and uid is not None:
                users[et].add(str(uid))
        bottoms = {
            side: sorted(fmix64(int(fnv1a64_single(u))) for u in vals)[:k]
            for side, vals in users.items()
        }

        def est(vals: list[int]) -> float:
            if len(vals) < k:
                return float(len(vals))
            return (k - 1) / ((float(vals[k - 1]) + 1.0) / 2.0**64)

        sa, sb = bottoms["purchase"], bottoms["error"]
        union_bottom = sorted(set(sa) | set(sb))[:k]
        union_e = est(union_bottom)
        both = set(sa) & set(sb)
        jac = (sum(1 for v in union_bottom if v in both) / len(union_bottom)
               if union_bottom else 0.0)
        return pa.table({
            "purchasers_est": pa.array([int(round(est(sa)))], pa.int64()),
            "error_users_est": pa.array([int(round(est(sb)))], pa.int64()),
            "union_est": pa.array([int(round(union_e))], pa.int64()),
            "both_est": pa.array([int(round(jac * union_e))], pa.int64()),
        })

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "kmv_overlap_ref.parquet"), build
    )


SQL_KMV_USER_OVERLAP = f"""
SELECT CAST(purchasers_est AS BIGINT) AS purchasers_est,
       CAST(error_users_est AS BIGINT) AS error_users_est,
       CAST(union_est AS BIGINT) AS union_est,
       CAST(both_est AS BIGINT) AS both_est
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/kmv_overlap_ref.parquet')
"""


def q_kmv_user_overlap(sf_dir: str) -> pd.DataFrame:
    """KMV (bottom-k) sketch set algebra: distinct purchasers, distinct
    error-users, their union and INTERSECTION — the set operation HLL
    cannot do — from two mergeable per-batch sketch streams.  Oracle: the
    independent pure-Python reference (``ensure_kmv_overlap_parquet``) —
    bottom-k state is order-independent, so the distributed blob merge
    must land on the identical four estimates (error bounds additionally
    pytest-gated)."""
    from ..functions.sketch import kmv_column_sketch

    ensure_kmv_overlap_parquet(sf_dir)

    def side(kind: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["event_type"], kind)).select(["user_id"])

        return fn

    base = _t(sf_dir, "events", ["user_id", "event_type"])
    sa = kmv_column_sketch(
        base.map_batches(side("purchase"), batch_format="pyarrow", zero_copy_batch=True),
        "user_id", k=2048)
    sb = kmv_column_sketch(
        base.map_batches(side("error"), batch_format="pyarrow", zero_copy_batch=True),
        "user_id", k=2048)
    return pd.DataFrame(
        {
            "purchasers_est": [int(round(sa.estimate()))],
            "error_users_est": [int(round(sb.estimate()))],
            "union_est": [int(round(sa.merge(sb).estimate()))],
            "both_est": [int(round(sa.intersection_estimate(sb)))],
        }
    )


def q_mg_heavy_users(sf_dir: str) -> pd.DataFrame:
    """One-pass Misra-Gries heavy users by event count (rows-only: kept
    counts are deterministic LOWER bounds, not SQL-equal; the n/(k+1)
    guarantee is pytest-checked on planted zipf data)."""
    from ..functions.sketch import mg_heavy_hitters

    ds = _t(sf_dir, "events", ["user_id"])
    out = mg_heavy_hitters(ds, "user_id", k=64)
    return _i64(out, ["user_id", "count_lb", "err_ub"])


def q_approx_distinct_users(sf_dir: str) -> pd.DataFrame:
    """HyperLogLog approximate COUNT(DISTINCT user_id) (rows-only: the
    estimate is deterministic — register merge is partition-independent —
    but not SQL-reproducible; accuracy vs exact is pytest-checked)."""
    from ..functions.sketch import approx_distinct

    ds = _t(sf_dir, "events", ["user_id"])
    est = approx_distinct(ds, "user_id", p=12)
    return pd.DataFrame({"n_users_approx": [int(round(est))]})


def q_approx_users_per_type(sf_dir: str) -> pd.DataFrame:
    """Grouped HLL: approximate distinct users PER event type (rows-only:
    deterministic partition-independent register merge, accuracy
    pytest-checked) — ``sketch.py::grouped_approx_distinct``, the
    matrix-register ``np.maximum.at`` path, blobs-only exchange."""
    from ..functions.sketch import grouped_approx_distinct

    ds = _t(sf_dir, "events", ["event_type", "user_id"])
    out = grouped_approx_distinct(ds, ["event_type"], "user_id", p=12)
    out["approx_distinct"] = out["approx_distinct"].pipe(_rd, 0).astype("int64")
    return out


def q_docs_matching_regex(sf_dir: str) -> pd.DataFrame:
    """F4 selector-regex filter: any-of regex match over a string column."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def filt(t: pa.Table) -> pa.Table:
        mask = pc.match_substring_regex(t["text"], r"vector (join|merge) (stream|batch)")
        return t.filter(pc.fill_null(mask, False)).select(["doc_id"])

    out = ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    if out.empty:
        out = pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
    return _i64(out, ["doc_id"])


SQL_DOCS_MATCHING_REGEX = """
SELECT doc_id FROM documents WHERE regexp_matches(text, 'vector (join|merge) (stream|batch)')
"""


def q_union_counts(sf_dir: str) -> pd.DataFrame:
    """UNION ALL of two filtered streams → per-type counts (ds.union)."""
    purchases = _t(sf_dir, "events", ["event_type", "value"]).map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "purchase")),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    big = _t(sf_dir, "events", ["event_type", "value"]).map_batches(
        lambda t: t.filter(pc.greater(t["value"], 150.0)),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    both = purchases.union(big)
    out = grouped_sums(both, ["event_type"], {}, "n", reduce="driver").to_pandas()
    return _i64(out, ["n"])


SQL_UNION_COUNTS = """
SELECT event_type, COUNT(*) AS n FROM (
  SELECT event_type, value FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT event_type, value FROM events WHERE value > 150.0
) GROUP BY event_type
"""

# ---------------------------------------------------------------------------
# Scrub / normalize / sampling curation operators
# ---------------------------------------------------------------------------

def ensure_messy_parquet(sf_dir: str) -> str:
    """Materialize the planted-PII messy corpus (sources/messy.py) in the
    shared oracle-artifact dir; both oracle sides read the same file."""
    import os as _os

    from ..sources.messy import build_messy_table

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "messy.parquet"),
        lambda: build_messy_table(
            pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"])
        ),
    )


def q_pii_scrub(sf_dir: str) -> pd.DataFrame:
    """PII redaction scan over the messy corpus: one vectorized RE2 pass per
    PII class + the rewrite chain inside ``map_batches``; only per-source
    counter partials (≤ |sources| rows per block) reach the reduce.  At
    scale the scrubbed text column streams straight into a partitioned
    writer — it never leaves the map stage here either."""
    from ..functions.scrub import pii_partials

    ds = rd.read_parquet(ensure_messy_parquet(sf_dir), columns=["source", "text"],
                         override_num_blocks=8)
    partials = ds.map_batches(pii_partials, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_sums(
        partials,
        ["source"],
        {c: c for c in ("n_email", "n_ip", "n_phone", "docs_with_pii", "scrubbed_chars", "n_docs")},
        reduce="driver",
    ).to_pandas()
    return _i64(out, ["n_email", "n_ip", "n_phone", "docs_with_pii", "scrubbed_chars", "n_docs"])


SQL_PII_SCRUB = f"""
WITH scanned AS (
  SELECT source,
         len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{{2,}}')) AS e,
         len(regexp_extract_all(text, '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b')) AS i,
         len(regexp_extract_all(text, '\\b555-\\d{{4}}\\b')) AS p,
         length(regexp_replace(regexp_replace(regexp_replace(text,
             '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{{2,}}', '<EMAIL>', 'g'),
             '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '<IP>', 'g'),
             '\\b555-\\d{{4}}\\b', '<PHONE>', 'g')) AS sc
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/messy.parquet'))
SELECT source, CAST(SUM(e) AS BIGINT) AS n_email, CAST(SUM(i) AS BIGINT) AS n_ip,
       CAST(SUM(p) AS BIGINT) AS n_phone,
       CAST(SUM(CASE WHEN e + i + p > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
       CAST(SUM(sc) AS BIGINT) AS scrubbed_chars, COUNT(*) AS n_docs
FROM scanned GROUP BY source
"""


def q_text_normalize(sf_dir: str) -> pd.DataFrame:
    """Text canonicalization effect summary (lowercase + whitespace collapse
    + trim) — same single-pass partials shape as the scrub."""
    from ..functions.scrub import normalize_partials

    ds = rd.read_parquet(ensure_messy_parquet(sf_dir), columns=["source", "text"],
                         override_num_blocks=8)
    partials = ds.map_batches(normalize_partials, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_sums(
        partials,
        ["source"],
        {c: c for c in ("n_changed", "raw_chars", "norm_chars", "n_docs")},
        reduce="driver",
    ).to_pandas()
    return _i64(out, ["n_changed", "raw_chars", "norm_chars", "n_docs"])


SQL_TEXT_NORMALIZE = f"""
WITH n AS (
  SELECT source, text,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/messy.parquet'))
SELECT source,
       CAST(SUM(CASE WHEN norm <> text THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
       CAST(SUM(length(text)) AS BIGINT) AS raw_chars,
       CAST(SUM(length(norm)) AS BIGINT) AS norm_chars,
       COUNT(*) AS n_docs
FROM n GROUP BY source
"""


def q_zscore_outliers(sf_dir: str) -> pd.DataFrame:
    """Per-type z-score outlier counts, two streaming passes: (1) moment
    partials (n, Σv, Σv²) per batch → tiny bounded-key reduce → mean/std on
    the driver; (2) broadcast the |types|-row stats and count |z| > 2.5 per
    batch.  No raw-row shuffle in either pass.  The oracle mirrors the SAME
    naive-moment formula (not Welford ``stddev_pop``) so both sides make
    identical float rounding."""
    ds = _t(sf_dir, "events", ["event_type", "value"])

    def moments(t: pa.Table) -> pa.Table:
        flat = pa.table(
            {
                "event_type": t["event_type"],
                "v": t["value"],
                "v2": pc.multiply(t["value"], t["value"]),
            }
        )
        return flat.group_by(["event_type"]).aggregate(
            [("v", "sum"), ("v2", "sum"), ("event_type", "count")]
        ).rename_columns(["event_type", "s", "ss", "n"])

    stats = (
        grouped_sums(
            ds.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True),
            ["event_type"], {"s": "s", "ss": "ss", "n": "n"}, reduce="driver",
        ).to_pandas()
    )
    stats["mean"] = stats["s"] / stats["n"]
    stats["std"] = np.sqrt(stats["ss"] / stats["n"] - stats["mean"] ** 2)
    lookup = {r.event_type: (r.mean, r.std) for r in stats.itertuples()}

    def count_outliers(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"event_type": t["event_type"].to_pandas(), "v": t["value"].to_pandas()})
        m = df["event_type"].map({k: v[0] for k, v in lookup.items()})
        s = df["event_type"].map({k: v[1] for k, v in lookup.items()})
        df["out"] = (np.abs(df["v"] - m) > 2.5 * s).astype("int64")
        return pa.Table.from_pandas(
            df.groupby("event_type", as_index=False)["out"].sum().rename(
                columns={"out": "n_outliers"}
            ),
            preserve_index=False,
        )

    out = grouped_sums(
        ds.map_batches(count_outliers, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type"], {"n_outliers": "n_outliers"}, reduce="driver",
    ).to_pandas()
    out = out.merge(stats[["event_type", "mean", "std"]], on="event_type")
    out["mean"] = out["mean"].pipe(_rd)
    out["std"] = out["std"].pipe(_rd)
    return _i64(out, ["n_outliers"])


SQL_ZSCORE_OUTLIERS = """
WITH st AS (
  SELECT event_type, COUNT(*) AS n, SUM(value) AS s, SUM(value * value) AS ss
  FROM events GROUP BY event_type),
m AS (SELECT event_type, s / n AS mean, sqrt(ss / n - (s / n) * (s / n)) AS std FROM st)
SELECT e.event_type,
       CAST(SUM(CASE WHEN ABS(e.value - m.mean) > 2.5 * m.std THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       ROUND(ANY_VALUE(m.mean), 6) AS mean, ROUND(ANY_VALUE(m.std), 6) AS std
FROM events e JOIN m USING (event_type)
GROUP BY e.event_type
"""


def q_stratified_sample_k(sf_dir: str) -> pd.DataFrame:
    """Exact-k-per-group reservoir-equivalent sample: 10 docs per source in
    md5(doc_id) hash order — deterministic across reruns and partitionings,
    and distributed as a per-group top-k (per-block prune to k, candidates
    ≤ k·|groups|·blocks — never the corpus)."""
    from ..functions.relational import grouped_topk

    ds = _t(sf_dir, "documents", ["doc_id", "source"])

    def add_h(t: pa.Table) -> pa.Table:
        return t.append_column("h", md5_hex(pc.cast(t["doc_id"], pa.string())))

    keyed = ds.map_batches(add_h, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_topk(keyed, ["source"], ["h", "doc_id"], [False, False], 10).to_pandas()
    return _i64(out, ["doc_id"]).sort_values(["source", "h"]).reset_index(drop=True)


SQL_STRATIFIED_SAMPLE_K = """
SELECT doc_id, source, h FROM (
  SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h,
         row_number() OVER (PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rn
  FROM documents)
WHERE rn <= 10
"""


TOKEN_BUDGET = 20_000


def q_token_budget_sample(sf_dir: str) -> pd.DataFrame:
    """Token-budget sampling: per source, take sequences in md5(sid) hash
    order until the cumulative token count reaches the budget — the standard
    way to cut a fixed-token-mixture from an oversized corpus.  Runs as a
    bucketed exchange on ``source`` moving only (sid, n_tok, hash) triples
    (never text/tokens), with the per-group sort+cumsum vectorized inside
    ``map_groups``."""
    from ..functions.relational import bucketed_group_reduce

    ds = rd.read_parquet(
        ensure_derived_parquet(sf_dir), columns=["doc_id", "n_tok", "source"],
        override_num_blocks=8,
    )

    def add_h(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": t["source"],
                "doc_id": t["doc_id"],
                "n_tok": pc.cast(t["n_tok"], pa.int64()),
                "h": md5_hex(t["doc_id"]),
            }
        )

    keyed = ds.map_batches(add_h, batch_format="pyarrow", zero_copy_batch=True)

    def budget_cut(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["source", "h", "doc_id"], kind="stable")
        cum = df.groupby("source", sort=False)["n_tok"].cumsum()
        kept = df[cum <= TOKEN_BUDGET]
        return kept.groupby("source", as_index=False).agg(
            n_docs=("doc_id", "count"), tokens=("n_tok", "sum")
        )

    out = bucketed_group_reduce(keyed, ["source"], budget_cut, num_buckets=16).to_pandas()
    return _i64(out, ["n_docs", "tokens"]).sort_values("source").reset_index(drop=True)


SQL_TOKEN_BUDGET_SAMPLE = f"""
WITH ranked AS (
  SELECT source, doc_id, n_tok, md5(doc_id) AS h
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')),
c AS (
  SELECT source, n_tok,
         SUM(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM ranked)
SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS tokens
FROM c WHERE cum <= {TOKEN_BUDGET} GROUP BY source ORDER BY source
"""


def q_bm25_search(sf_dir: str) -> pd.DataFrame:
    """Disjunctive BM25 ranked retrieval (k1=1.2, b=0.75, Lucene idf) over
    the corpus for the standing query terms: candidate postings + corpus
    N/avgdl stats from ONE tokenize scan, tiny driver idf fold, vectorized
    score pass → distributed per-doc sum → deterministic top-20
    (``functions/search.py::bm25_search``)."""
    from ..functions.search import bm25_search

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return bm25_search(ds, SEARCH_TERMS, k=20)


SQL_BM25_SEARCH = """
WITH toks AS (
  SELECT doc_id, UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS term FROM documents
), toks2 AS (SELECT * FROM toks WHERE term <> ''),
dl AS (SELECT doc_id, COUNT(*) AS len FROM toks2 GROUP BY 1),
stats AS (SELECT COUNT(*) AS n, SUM(len) AS sumlen FROM dl),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks2
       WHERE term IN ('join', 'hash', 'batch') GROUP BY 1, 2),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1)
SELECT tf.doc_id,
  ROUND(SUM(ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
      * (tf.tf / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 *
          (dl.len / (CAST(stats.sumlen AS DOUBLE) / stats.n)))))), 6) AS score
FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
GROUP BY 1 ORDER BY score DESC, doc_id LIMIT 20
"""


def q_mad_outliers(sf_dir: str) -> pd.DataFrame:
    """Robust per-group outlier counts via MEDIAN + MAD (median absolute
    deviation) — the heavy-tail-safe cousin of ``zscore_outliers`` — from a
    SINGLE streaming pass: the mergeable fixed-bin histogram per event_type
    (``sketch.py::grouped_histogram_fixedpoint``) yields the median; the
    deviation histogram is DERIVED from the value histogram by folding bins
    around it (|bin - med| re-bin, no second scan); MAD is its median; the
    tail count sums folded bins beyond 3·MAD.  All threshold compares happen
    in integer half/quarter-cent units — no float-boundary flakes."""
    from ..functions.sketch import grouped_histogram_fixedpoint, quantile_from_counts

    ds = _t(sf_dir, "events", ["event_type", "value"])
    hist = grouped_histogram_fixedpoint(ds, "event_type", "value", scale=100)
    rows = []
    for et, g in hist.groupby("event_type", sort=True):
        bins = g["bin"].to_numpy(dtype=np.int64)
        ns = g["n"].to_numpy(dtype=np.int64)
        med_c = quantile_from_counts(bins, ns, 0.5)  # cents, may be x.5
        med_hc = int(round(med_c * 2))  # half-cents, exact
        dev_hc = np.abs(2 * bins - med_hc)  # half-cents, exact ints
        fold = pd.DataFrame({"d": dev_hc, "n": ns}).groupby("d", as_index=False)["n"].sum()
        mad_hc = quantile_from_counts(fold["d"].to_numpy(), fold["n"].to_numpy(), 0.5)
        mad_qc = int(round(mad_hc * 2))  # quarter-cents, exact
        n_out = int(fold["n"][2 * fold["d"] > 3 * mad_qc].sum())
        rows.append((et, _rd(med_hc / 200.0, 6), _rd(mad_qc / 400.0, 6), n_out))
    return pd.DataFrame(rows, columns=["event_type", "median_value", "mad", "n_outliers"])


SQL_MAD_OUTLIERS = """
WITH m AS (SELECT event_type, median(value) AS med FROM events GROUP BY 1),
d AS (SELECT e.event_type, m.med,
             CAST(ROUND(ABS(e.value - m.med) * 200, 0) AS BIGINT) AS dev_hc
      FROM events e JOIN m USING (event_type)),
s AS (SELECT event_type,
             CAST(ROUND(median(dev_hc) * 2, 0) AS BIGINT) AS mad_qc
      FROM d GROUP BY 1)
SELECT d.event_type,
       ROUND(ANY_VALUE(d.med), 6) AS median_value,
       ROUND(ANY_VALUE(s.mad_qc) / 400.0, 6) AS mad,
       CAST(SUM(CASE WHEN 2 * d.dev_hc > 3 * s.mad_qc THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM d JOIN s USING (event_type) GROUP BY 1 ORDER BY 1
"""


def q_cube_counts(sf_dir: str) -> pd.DataFrame:
    """GROUP BY CUBE(source, lang): all four grouping sets re-summed from
    ONE finest-level distributed aggregate (|sources|×|langs| partial rows
    reach the driver; coarser levels are driver arithmetic, the same shape
    as ``revenue_rollup`` but the full lattice).  NULL grouping keys are
    materialized as 'ALL' on both sides for hash-stable compare."""
    ds = _t(sf_dir, "documents", ["source", "lang", "n_chars"])
    fine = grouped_sums(ds, ["source", "lang"], {"chars": "n_chars"}, "n").to_pandas()
    frames = []
    for keys in ([], ["source"], ["lang"], ["source", "lang"]):
        if keys:
            g = fine.groupby(keys, as_index=False)[["n", "chars"]].sum()
        else:
            g = pd.DataFrame({"n": [fine["n"].sum()], "chars": [fine["chars"].sum()]})
        for c in ("source", "lang"):
            if c not in g.columns:
                g[c] = "ALL"
        frames.append(g[["source", "lang", "n", "chars"]])
    out = pd.concat(frames, ignore_index=True).sort_values(
        ["source", "lang"], ignore_index=True
    )
    return _i64(out, ["n", "chars"])


SQL_CUBE_COUNTS = """
SELECT COALESCE(source, 'ALL') AS source, COALESCE(lang, 'ALL') AS lang,
       COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
FROM documents GROUP BY CUBE (source, lang) ORDER BY 1, 2
"""


def q_purchase_view_sets(sf_dir: str) -> pd.DataFrame:
    """INTERSECT / EXCEPT over user sets (frequent purchasers ≥8 vs
    frequent viewers ≥12 — thresholds chosen so all set classes materialize
    at test scale) computed as ONE membership aggregation instead of two
    set-op shuffles: per-user indicator sums in a single bucketed exchange
    → classify → tiny label count.  The classic rewrite that turns N set
    operations over the same keyspace into one pass."""
    ds = _t(sf_dir, "events", ["user_id", "event_type"])

    def flags(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "is_p": pc.cast(pc.equal(t["event_type"], "purchase"), pa.int64()),
                "is_v": pc.cast(pc.equal(t["event_type"], "view"), pa.int64()),
            }
        )

    per_user = grouped_sums(
        ds.map_batches(flags, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"],
        {"sp": "is_p", "sv": "is_v"},
    )

    def classify(t: pa.Table) -> pa.Table:
        sp = pc.greater_equal(t["sp"], 8)
        sv = pc.greater_equal(t["sv"], 12)
        label = pc.if_else(
            pc.and_(sp, sv),
            "both",
            pc.if_else(sp, "purchase_only", pc.if_else(sv, "view_only", "neither")),
        )
        return pa.table({"set_op": label})

    labeled = per_user.map_batches(classify, batch_format="pyarrow", zero_copy_batch=True)
    out = (
        grouped_sums(labeled, ["set_op"], {}, "n", reduce="driver")
        .to_pandas()
        .query("set_op != 'neither'")
        .sort_values("set_op", ignore_index=True)
    )
    return _i64(out, ["n"])


SQL_PURCHASE_VIEW_SETS = """
WITH u AS (
  SELECT user_id,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS sp,
         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS sv
  FROM events GROUP BY 1)
SELECT CASE WHEN sp >= 8 AND sv >= 12 THEN 'both'
            WHEN sp >= 8 THEN 'purchase_only'
            ELSE 'view_only' END AS set_op,
       COUNT(*) AS n
FROM u WHERE sp >= 8 OR sv >= 12 GROUP BY 1 ORDER BY 1
"""


def q_ewma_user_value(sf_dir: str) -> pd.DataFrame:
    """Per-user exponentially TIME-decayed value (τ = 1 day) evaluated at
    the user's last event — the streaming-state aggregate (EWMA register)
    done batch: the decayed sum is ASSOCIATIVE once each partial carries its
    own anchor ``(max_ts, Σ v·e^{(ts-max_ts)/τ})``, so per-batch combiners
    merge in any tree order by re-anchoring the smaller side.  The exchange
    moves only (user, anchor, sum) partials; top-25 by decayed value."""
    ds = _t(sf_dir, "events", ["user_id", "ts", "value"])
    tau_us = 86_400_000_000.0

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        val = t["value"].to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        dfm = pd.DataFrame({"u": uid, "ts": us, "v": val})
        mx = dfm.groupby("u")["ts"].transform("max")
        dfm["w"] = dfm["v"] * np.exp((dfm["ts"] - mx) / tau_us)
        g = dfm.groupby("u", as_index=False).agg(anchor=("ts", "max"), s=("w", "sum"))
        return pa.Table.from_pandas(
            g.rename(columns={"u": "user_id"}), preserve_index=False
        )

    from ..functions.relational import bucketed_group_reduce

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        mx = df.groupby("user_id")["anchor"].transform("max")
        w = df["s"] * np.exp((df["anchor"] - mx) / tau_us)
        g = (
            pd.DataFrame({"user_id": df["user_id"], "w": w})
            .groupby("user_id", as_index=False)["w"]
            .sum()
        )
        return g.rename(columns={"w": "decayed_value"})

    merged = bucketed_group_reduce(partials, ["user_id"], merge)
    out = merged.to_pandas()[["user_id", "decayed_value"]]
    out = out.sort_values(
        ["decayed_value", "user_id"], ascending=[False, True], ignore_index=True
    ).head(25)
    out["decayed_value"] = out["decayed_value"].pipe(_rd)
    return _i64(out, ["user_id"])


SQL_EWMA_USER_VALUE = """
WITH m AS (SELECT user_id, MAX(ts) AS mts FROM events GROUP BY 1)
SELECT e.user_id,
       ROUND(SUM(e.value * EXP((EPOCH_US(e.ts) - EPOCH_US(m.mts)) / 86400000000.0)), 6)
         AS decayed_value
FROM events e JOIN m USING (user_id)
GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 25
"""


def q_bpe_merges(sf_dir: str) -> pd.DataFrame:
    """Distributed BPE merge training (6 rounds) over the derived tokens
    payload — the canonical iterative token-pipeline job: per-round pair
    counts via packed-int64 bigram combiners → distributed top-1 → vectorized
    merge rewrite → per-round materialize (the checkpoint you want at scale).
    Oracle: the INDEPENDENT driver-side incremental linked-list trainer
    (``bpe_train_flat``) materialized as a Parquet artifact — two different
    algorithms (per-round global recount vs lazy-heap incremental counts)
    must emit the bit-identical merge table."""
    from ..functions.bpe import bpe_train
    from ..schema import VOCAB_SIZE

    ensure_bpe_merges_parquet(sf_dir)
    ds = rd.read_parquet(
        ensure_derived_parquet(sf_dir), columns=["tokens"], override_num_blocks=8
    )
    return bpe_train(ds, num_merges=6, vocab_base=VOCAB_SIZE)


def ensure_bpe_merges_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``bpe_merges``: the merge table computed by the
    driver-side incremental trainer (`functions/bpe.py::bpe_train_flat`) on
    the full derived corpus — an independent implementation of the same
    public algorithm (Sennrich et al. 2016) the distributed trainer runs."""
    import os as _os

    src = ensure_derived_parquet(sf_dir)

    def build() -> pa.Table:
        from ..functions.bpe import bpe_train_flat
        from ..functions.tokens import _flat_tokens
        from ..schema import VOCAB_SIZE

        t = pq.read_table(src, columns=["tokens"])
        v, o = _flat_tokens(t)
        b = o[0]
        m = bpe_train_flat(v[b : o[-1]], o - b, 6, VOCAB_SIZE)
        return pa.Table.from_pandas(m, preserve_index=False)

    return _ensure_artifact(_os.path.join(_corpus_dir(sf_dir), "bpe_merges.parquet"), build)


SQL_BPE_MERGES = f"""
SELECT CAST(merge_idx AS BIGINT) AS merge_idx, CAST("left" AS BIGINT) AS "left",
       CAST("right" AS BIGINT) AS "right", CAST("count" AS BIGINT) AS "count",
       CAST(new_id AS BIGINT) AS new_id
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/bpe_merges.parquet') ORDER BY merge_idx
"""


def ensure_minhash_incremental_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``minhash_incremental``: the full expected match
    set re-derived by an INDEPENDENT per-doc reference implementation —
    scalar FNV word hashes, per-doc gram/signature construction (not the
    flat-stream ``np.minimum.reduceat`` kernel), dict-bucketed greedy band
    matching (not the distributed side-tagged co-group).  MinHash is
    seed-deterministic, so the two compositions must agree row-for-row."""
    import os as _os

    def build() -> pa.Table:
        from collections import defaultdict

        from ..functions.dedup import _PAD_WORD_HASH, MERSENNE_61, _hash_params
        from ..functions.hashing import fnv1a64_single
        from ..functions.rounding import round_like_duckdb

        H, bands, k, seed, thr = 64, 16, 3, 42, 0.6
        rpb = H // bands
        a, b = _hash_params(H, seed)
        mix = np.random.default_rng(seed + 1).integers(1, 1 << 62, size=k, dtype=np.uint64)
        M = np.uint64(MERSENNE_61)
        t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        ids = [int(x) for x in t["doc_id"].to_pylist()]
        sigs: dict[int, np.ndarray] = {}
        bkeys: dict[int, list[int]] = {}
        for did, s in zip(ids, t["text"].to_pylist()):
            wh = np.array([fnv1a64_single(w) for w in (s or "").split(" ")], dtype=np.uint64)
            n = len(wh)
            with np.errstate(over="ignore"):
                if n >= k:
                    grams = np.zeros(n - k + 1, dtype=np.uint64)
                    for j in range(k):
                        grams += mix[j] * wh[j : j + len(grams)]
                else:
                    padded = np.concatenate([wh, np.full(k - n, _PAD_WORD_HASH, np.uint64)])
                    grams = np.array([np.sum(mix * padded, dtype=np.uint64)])
                sig = ((grams[:, None] * a + b) % M).min(axis=0)  # 2^64-wrap then mod, as spec'd
            sigs[did] = sig
            keys = []
            for band in range(bands):
                h = 0xCBF29CE484222325
                for j in range(rpb):
                    h = ((h ^ int(sig[band * rpb + j])) * 0x9E3779B97F4A7C15) & ((1 << 64) - 1)
                keys.append(h)
            bkeys[did] = keys
        buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
        for d in ids:
            if d % 2 == 0:
                for band, h in enumerate(bkeys[d]):
                    buckets[(band, h)].append(d)
        rows = []
        for d in ids:
            if d % 2 == 0:
                continue
            cands: set[int] = set()
            for band, h in enumerate(bkeys[d]):
                cands.update(buckets.get((band, h), ()))
            best = None
            for c in sorted(cands):
                est = float(np.count_nonzero(sigs[d] == sigs[c])) / H
                if est >= thr and (best is None or est > best[1]):
                    best = (c, est)
            if best is not None:
                rows.append((d, best[0], best[1]))
        rows.sort()
        df = pd.DataFrame(rows, columns=["doc_id", "matched_prior", "est_jaccard"])
        df["doc_id"] = df["doc_id"].astype("int64")
        df["matched_prior"] = df["matched_prior"].astype("int64")
        df["est_jaccard"] = round_like_duckdb(
            df["est_jaccard"].to_numpy(dtype=np.float64), 6)
        return pa.Table.from_pandas(df, preserve_index=False)

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "minhash_incremental_ref.parquet"), build
    )


SQL_MINHASH_INCREMENTAL = f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(matched_prior AS BIGINT) AS matched_prior, est_jaccard
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/minhash_incremental_ref.parquet')
ORDER BY doc_id
"""


def q_minhash_incremental(sf_dir: str) -> pd.DataFrame:
    """Incremental near-dup: even-id docs build the LSH band state, odd-id
    docs arrive as the 'new crawl' and match against it without re-reading
    prior text.  Oracle: the independent per-doc reference derivation
    (``ensure_minhash_incremental_parquet``) — MinHash is seed-deterministic,
    so the distributed co-group and the scalar greedy reference must emit
    identical match sets."""
    from ..functions.dedup import minhash_dedup_against_state

    ensure_minhash_incremental_parquet(sf_dir)
    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def half(par: int):
        def fn(t: pa.Table) -> pa.Table:
            ids = pc.cast(t["doc_id"], pa.int64())
            return t.filter(pc.equal(pc.bit_wise_and(ids, pa.scalar(1, pa.int64())),
                                     pa.scalar(par, pa.int64())))

        return fn

    prior = docs.map_batches(half(0), batch_format="pyarrow", zero_copy_batch=True)
    new = docs.map_batches(half(1), batch_format="pyarrow", zero_copy_batch=True)
    _, state = minhash_dedup_against_state(prior, None)
    matches, _ = minhash_dedup_against_state(new, state, threshold=0.6)
    if len(matches) == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "matched_prior": pd.Series(dtype="int64"),
                             "est_jaccard": pd.Series(dtype="float64")})
    out = matches.sort_values("doc_id", ignore_index=True)
    return _i64(out, ["doc_id", "matched_prior"])


def ensure_neardup_pairs_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``minhash_neardup`` / ``neardup_cluster_dedup``:
    the full expected near-dup pair set re-derived by an INDEPENDENT per-doc
    reference implementation — scalar FNV word hashes, per-doc gram and
    signature construction, dict-bucketed candidate enumeration, Python-set
    exact Jaccard — not the flat-stream ``np.minimum.reduceat`` kernel and
    bucketed co-group the distributed path uses.  MinHash is
    seed-deterministic, so both compositions must agree row-for-row, with
    est/jaccard bitwise equal (same IEEE divisions, same round_like_duckdb)."""
    import os as _os
    from itertools import combinations

    def build() -> pa.Table:
        from collections import defaultdict

        from ..functions.dedup import _PAD_WORD_HASH, MERSENNE_61, _hash_params
        from ..functions.hashing import fnv1a64_single
        from ..functions.rounding import round_like_duckdb

        H, bands, k, seed, thr = 64, 16, 3, 42, 0.5
        rpb = H // bands
        a, b = _hash_params(H, seed)
        mix = np.random.default_rng(seed + 1).integers(1, 1 << 62, size=k, dtype=np.uint64)
        M = np.uint64(MERSENNE_61)
        t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        ids = [int(x) for x in t["doc_id"].to_pylist()]
        sigs: dict[int, np.ndarray] = {}
        shingle_sets: dict[int, set[int]] = {}
        buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
        for did, s in zip(ids, t["text"].to_pylist()):
            words = (s or "").split(" ")
            wh = np.array([fnv1a64_single(w) for w in words], dtype=np.uint64)
            n = len(wh)
            with np.errstate(over="ignore"):
                if n >= k:
                    grams = np.zeros(n - k + 1, dtype=np.uint64)
                    for j in range(k):
                        grams += mix[j] * wh[j : j + len(grams)]
                else:
                    padded = np.concatenate([wh, np.full(k - n, _PAD_WORD_HASH, np.uint64)])
                    grams = np.array([np.sum(mix * padded, dtype=np.uint64)])
                sig = ((grams[:, None] * a + b) % M).min(axis=0)
            sigs[did] = sig
            if n < k:
                sgrams = [" ".join(words)]
            else:
                sgrams = [" ".join(words[i : i + k]) for i in range(n - k + 1)]
            shingle_sets[did] = {int(fnv1a64_single(g)) for g in sgrams}
            for band in range(bands):
                h = 0xCBF29CE484222325
                for j in range(rpb):
                    h = ((h ^ int(sig[band * rpb + j])) * 0x9E3779B97F4A7C15) & ((1 << 64) - 1)
                buckets[(band, h)].append(did)
        cand: set[tuple[int, int]] = set()
        for members in buckets.values():
            if len(members) > 1:
                cand.update(combinations(sorted(set(members)), 2))
        rows = []
        for da, db in sorted(cand):
            est = float(np.count_nonzero(sigs[da] == sigs[db])) / H
            if est < thr:
                continue
            sa, sb = shingle_sets[da], shingle_sets[db]
            union = len(sa | sb)
            j = len(sa & sb) / union if union else 1.0
            rows.append((da, db, est, j))
        df = pd.DataFrame(rows, columns=["doc_a", "doc_b", "est_jaccard", "jaccard"])
        for c in ("doc_a", "doc_b"):
            df[c] = df[c].astype("int64")
        for c in ("est_jaccard", "jaccard"):
            df[c] = round_like_duckdb(df[c].to_numpy(dtype=np.float64), 6)
        return pa.Table.from_pandas(df, preserve_index=False)

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "neardup_pairs_ref.parquet"), build
    )


SQL_MINHASH_NEARDUP = f"""
SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
       est_jaccard, jaccard
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/neardup_pairs_ref.parquet')
ORDER BY doc_a, doc_b
"""


SQL_NEARDUP_CLUSTER_DEDUP = f"""
WITH RECURSIVE pairs AS (
  SELECT CAST(doc_a AS BIGINT) AS a, CAST(doc_b AS BIGINT) AS b
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/neardup_pairs_ref.parquet')
), sym AS (
  SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
), reach AS (
  SELECT a AS n, b AS r FROM sym
  UNION
  SELECT reach.n, sym.b AS r FROM reach JOIN sym ON reach.r = sym.a
)
SELECT n AS doc_id, LEAST(n, MIN(r)) AS cluster,
       CAST(n = LEAST(n, MIN(r)) AS BIGINT) AS kept
FROM reach GROUP BY n ORDER BY doc_id
"""


def q_neardup_cluster_dedup(sf_dir: str) -> pd.DataFrame:
    """End-to-end near-dup cluster dedup: MinHash LSH pairs → distributed
    connected components (large-star/small-star rounds, graph.py) →
    canonical keep = min doc_id per cluster.  The oracle's recursive-CTE
    min-label transitive closure over the independent reference pair
    artifact verifies BOTH stages: the distributed pair emission and the
    distributed CC must together reproduce a from-scratch closure."""
    from ..functions.dedup import minhash_lsh_pairs
    from ..functions.graph import connected_components

    ensure_neardup_pairs_parquet(sf_dir)
    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    pairs = minhash_lsh_pairs(docs, threshold=0.5, verify=False)
    if pairs.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "cluster": pd.Series(dtype="int64"),
                             "kept": pd.Series(dtype="int64")})
    edges = rd.from_pandas(pd.DataFrame({
        "u": pairs["doc_a"].astype("int64"),
        "v": pairs["doc_b"].astype("int64"),
    }))
    cc = connected_components(edges)
    out = cc.rename(columns={"node": "doc_id", "component": "cluster"})
    out["kept"] = (out["doc_id"] == out["cluster"]).astype("int64")
    return out.sort_values("doc_id", ignore_index=True)


def q_corpus_diff(sf_dir: str) -> pd.DataFrame:
    """Snapshot diff (data versioning): classify every doc across two
    corpus versions as unchanged / modified / removed / added.  v2 derives
    deterministically from v1 (drop id%13, edit id%7, re-add id%11 under
    new ids) so both sides construct it identically.  Distributed shape:
    each side collapses to (doc_id, content-fp) combiner rows — text never
    shuffles — then ONE bucketed exchange on doc_id classifies (the
    full-outer-join pattern without materializing the join)."""
    from ..functions.hashing import fnv1a64
    from ..functions.relational import bucketed_group_reduce

    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def v1_rows(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"],
                         "fp": pa.array(fnv1a64(t["text"]), pa.uint64()),
                         "side": pa.nulls(len(t), pa.int8()).fill_null(0)})

    def v2_rows(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64())
        kept = t.filter(pc.not_equal(_mod(ids, 13), 0))
        kid = pc.cast(kept["doc_id"], pa.int64())
        edited = pc.if_else(
            pc.equal(_mod(kid, 7), 0),
            pc.binary_join_element_wise(kept["text"], " edited", ""),
            kept["text"],
        )
        part1 = pa.table({"doc_id": kid,
                          "fp": pa.array(fnv1a64(edited), pa.uint64()),
                          "side": pa.nulls(len(kept), pa.int8()).fill_null(1)})
        add = t.filter(pc.equal(_mod(ids, 11), 0))
        part2 = pa.table({"doc_id": pc.add(pc.cast(add["doc_id"], pa.int64()),
                                           pa.scalar(1_000_000, pa.int64())),
                          "fp": pa.array(fnv1a64(add["text"]), pa.uint64()),
                          "side": pa.nulls(len(add), pa.int8()).fill_null(1)})
        return pa.concat_tables([part1, part2])

    a = docs.map_batches(v1_rows, batch_format="pyarrow", zero_copy_batch=True)
    b = docs.map_batches(v2_rows, batch_format="pyarrow", zero_copy_batch=True)

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id")
        sides = g["side"].agg(["min", "max"])
        nfp = g["fp"].nunique()
        status = pd.Series("unchanged", index=sides.index)
        status[(sides["min"] == 0) & (sides["max"] == 0)] = "removed"
        status[(sides["min"] == 1) & (sides["max"] == 1)] = "added"
        status[(sides["min"] == 0) & (sides["max"] == 1) & (nfp > 1)] = "modified"
        return status.value_counts().rename_axis("status").reset_index(name="n")

    per_bucket = bucketed_group_reduce(a.union(b), ["doc_id"], classify).to_pandas()
    out = per_bucket.groupby("status", as_index=False)["n"].sum().sort_values(
        "status", ignore_index=True)
    return _i64(out, ["n"])


def _mod(arr: pa.Array, m: int) -> pa.Array:
    """Integer modulo via subtract(x, multiply(floor_div(x, m), m)) —
    pyarrow.compute has no mod kernel."""
    import pyarrow.compute as _pc

    q = _pc.divide(arr, pa.scalar(m, pa.int64()))  # integer division floors for positives
    return _pc.subtract(arr, _pc.multiply(q, pa.scalar(m, pa.int64())))


SQL_CORPUS_DIFF = """
WITH v2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' edited' ELSE text END AS text
  FROM documents WHERE doc_id % 13 <> 0
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 11 = 0
), j AS (
  SELECT CASE WHEN a.doc_id IS NULL THEN 'added'
              WHEN b.doc_id IS NULL THEN 'removed'
              WHEN a.text = b.text THEN 'unchanged' ELSE 'modified' END AS status
  FROM documents a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id
)
SELECT status, CAST(COUNT(*) AS BIGINT) AS n FROM j GROUP BY status ORDER BY status
"""


def ensure_zlib_sizes_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``compression_quality``: per-doc zlib sizes from
    a straight driver-side loop.  SQL cannot deflate, but deflate is
    deterministic stdlib — what the oracle then CHECKS end-to-end is the
    distributed routing, per-source aggregation and the integer
    cross-multiply flag logic against DuckDB's GROUP BY."""
    import os as _os
    import zlib as _zlib

    def build() -> pa.Table:
        t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        raw, comp = [], []
        for s in t["text"].to_pylist():
            b = (s or "").encode("utf-8")
            raw.append(len(b))
            comp.append(len(_zlib.compress(b, 6)))
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "raw_bytes": pa.array(raw, pa.int64()),
            "compressed_bytes": pa.array(comp, pa.int64()),
        })

    return _ensure_artifact(_os.path.join(_corpus_dir(sf_dir), "zlib_sizes.parquet"), build)


SQL_COMPRESSION_QUALITY = f"""
WITH z AS (SELECT * FROM read_parquet('{ORACLE_ARTIFACT_DIR}/zlib_sizes.parquet'))
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(z.raw_bytes) AS BIGINT) AS raw_bytes,
       CAST(SUM(z.compressed_bytes) AS BIGINT) AS compressed_bytes,
       CAST(SUM(CASE WHEN z.compressed_bytes * 100 < z.raw_bytes * 45
                THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
FROM documents d JOIN z USING (doc_id)
GROUP BY d.source ORDER BY d.source
"""


def q_compression_quality(sf_dir: str) -> pd.DataFrame:
    """Entropy quality proxy (Gopher/C4-family cleaning stack): per-source
    zlib compression totals and docs flagged as boilerplate-repetitive
    (compressed*100 < raw*45 — integer cross-multiply, no float boundary).
    Oracle: per-doc zlib sizes ride a Parquet artifact (deflate is
    deterministic stdlib); DuckDB replays the per-source aggregation and
    flag logic."""
    from ..functions.text import compression_ratio_batch

    ensure_zlib_sizes_parquet(sf_dir)
    ds = _t(sf_dir, "documents", ["doc_id", "text", "source"])

    def partial(t: pa.Table) -> pa.Table:
        r = compression_ratio_batch(t)
        flagged = pc.cast(
            pc.less(pc.multiply(r["compressed_bytes"], 100),
                    pc.multiply(r["raw_bytes"], 45)), pa.int64())
        g = pa.table(
            {"source": t["source"], "n_docs": pa.nulls(len(t), pa.int64()).fill_null(1),
             "raw_bytes": r["raw_bytes"], "compressed_bytes": r["compressed_bytes"],
             "n_flagged": flagged}
        ).group_by(["source"]).aggregate(
            [("n_docs", "sum"), ("raw_bytes", "sum"),
             ("compressed_bytes", "sum"), ("n_flagged", "sum")])
        return g.rename_columns(["source", "n_docs", "raw_bytes",
                                 "compressed_bytes", "n_flagged"])

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = parts.groupby("source", as_index=False).sum().sort_values("source", ignore_index=True)
    return _i64(out, ["n_docs", "raw_bytes", "compressed_bytes", "n_flagged"])


def q_padding_waste(sf_dir: str) -> pd.DataFrame:
    """Length-bucketed batching: padding tokens wasted per strategy when
    sequences batch 64 at a time padded to the batch max — arrival(id)
    order vs length-sorted order (the standard bucketing trick).

    BOTH strategies share one machinery pass each: ONE boundary sample
    (both sort keys from the same sampled rows), ONE counting pass (each
    row histogrammed under both strategies' range buckets), and ONE grouped
    exchange on (strategy, range_bucket) — each group sorts locally, assigns
    exact global ranks from the broadcast prefix offsets, folds its
    COMPLETE 64-row batches to a single collapsed row and emits raw
    partials only for the ≤2 batches straddling its edges, so the driver
    combine sees O(strategies × buckets) rows at any corpus size."""
    from ..functions.relational import bucketed_group_reduce

    B = 64
    src = ensure_derived_parquet(sf_dir)
    ds = rd.read_parquet(src, columns=["doc_id", "n_tok"], override_num_blocks=8)

    # 1. ONE deterministic sample pass → range boundaries for both keys
    def pick(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t
        idx = np.unique(np.linspace(0, n - 1, min(24, n)).astype(np.int64))
        return t.take(pa.array(idx))

    sample = ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True).to_pandas()

    def cuts(vals: np.ndarray, nb: int) -> np.ndarray:
        vals = np.sort(vals)
        if len(vals) == 0 or nb <= 1:
            return vals[:0]
        return np.unique(vals[(np.arange(1, nb) * len(vals)) // nb])

    nb = 32
    bounds = {0: cuts(sample["doc_id"].to_numpy(), nb),
              1: cuts(sample["n_tok"].to_numpy().astype(np.int64), nb)}

    # 2. tag every row under BOTH strategies (strat 0 = by_id, 1 = by_length)
    def tag(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        toks = pc.cast(t["n_tok"], pa.int64()).to_numpy(zero_copy_only=False)
        b0 = np.searchsorted(bounds[0], ids, side="right").astype(np.int64)
        b1 = np.searchsorted(bounds[1], toks, side="right").astype(np.int64)
        n = len(ids)
        return pa.table({
            "strat": pa.array(np.repeat(np.array([0, 1], np.int64), n)),
            "bucket": pa.array(np.concatenate([b0, b1])),
            "doc_id": pa.array(np.concatenate([ids, ids])),
            "n_tok": pa.array(np.concatenate([toks, toks]), pa.int64()),
        })

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)

    # 3. ONE counting pass → exact per-(strategy, bucket) prefix offsets
    def count_partial(t: pa.Table) -> pa.Table:
        key = t["strat"].to_numpy(zero_copy_only=False) * (nb + 1) + \
            t["bucket"].to_numpy(zero_copy_only=False)
        ids, cnts = np.unique(key, return_counts=True)
        return pa.table({"k": pa.array(ids, pa.int64()), "n": pa.array(cnts, pa.int64())})

    counts = (
        tagged.select_columns(["strat", "bucket"])
        .map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas().groupby("k")["n"].sum().sort_index()
    )
    offsets: dict[int, int] = {}
    for strat in (0, 1):
        sel = counts[(counts.index >= strat * (nb + 1)) & (counts.index < (strat + 1) * (nb + 1))]
        for k, o in zip(sel.index, sel.cumsum() - sel):
            offsets[int(k)] = int(o)

    # 4. ONE grouped exchange; per (strat, bucket): local sort → exact global
    # ranks → fold complete batches, emit straddling partials raw
    def fold(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for (strat, bucket), g in df.groupby(["strat", "bucket"], sort=False):
            off = offsets[int(strat) * (nb + 1) + int(bucket)]
            g = g.sort_values(
                "doc_id" if strat == 0 else ["n_tok", "doc_id"], kind="stable")
            toks = g["n_tok"].to_numpy()
            b = (off + np.arange(len(g), dtype=np.int64)) // B
            agg = pd.DataFrame({"b": b, "n_tok": toks}).groupby("b", as_index=False).agg(
                c=("n_tok", "size"), m=("n_tok", "max"), t=("n_tok", "sum"))
            complete = (agg["b"] * B >= off) & ((agg["b"] + 1) * B <= off + len(g))
            comp, inc = agg[complete], agg[~complete]
            rows = pd.DataFrame({
                "strat": int(strat), "b": inc["b"], "c": inc["c"], "m": inc["m"],
                "t": inc["t"], "nb": 0, "pad": 0})
            collapsed = pd.DataFrame({
                "strat": [int(strat)], "b": [-1], "c": [int(comp["c"].sum())],
                "m": [0], "t": [0], "nb": [len(comp)],
                "pad": [int((comp["c"] * comp["m"] - comp["t"]).sum())]})
            outs.append(pd.concat([rows, collapsed], ignore_index=True))
        return pd.concat(outs, ignore_index=True)

    per = bucketed_group_reduce(tagged, ["strat", "bucket"], fold).to_pandas()

    rows = []
    for strat, name in ((0, "by_id"), (1, "by_length")):
        d = per[per["strat"] == strat]
        comp, inc = d[d["b"] < 0], d[d["b"] >= 0]
        n_batches, n_seqs = int(comp["nb"].sum()), int(comp["c"].sum())
        pad = int(comp["pad"].sum())
        if len(inc):
            g = inc.groupby("b").agg(c=("c", "sum"), m=("m", "max"), t=("t", "sum"))
            n_batches += len(g)
            n_seqs += int(g["c"].sum())
            pad += int((g["c"] * g["m"] - g["t"]).sum())
        rows.append((name, n_batches, n_seqs, pad))
    out = pd.DataFrame(rows, columns=["strategy", "n_batches", "n_seqs", "pad_tokens"])
    return _i64(out, ["n_batches", "n_seqs", "pad_tokens"])


SQL_PADDING_WASTE = f"""
WITH s AS (SELECT doc_id, n_tok FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')),
i AS (SELECT n_tok, (ROW_NUMBER() OVER (ORDER BY doc_id) - 1) // 64 AS b FROM s),
l AS (SELECT n_tok, (ROW_NUMBER() OVER (ORDER BY n_tok, doc_id) - 1) // 64 AS b FROM s),
ia AS (SELECT b, COUNT(*) c, MAX(n_tok) m, SUM(n_tok) t FROM i GROUP BY b),
la AS (SELECT b, COUNT(*) c, MAX(n_tok) m, SUM(n_tok) t FROM l GROUP BY b)
SELECT 'by_id' AS strategy, CAST(COUNT(*) AS BIGINT) AS n_batches,
       CAST(SUM(c) AS BIGINT) AS n_seqs, CAST(SUM(c * m - t) AS BIGINT) AS pad_tokens
FROM ia
UNION ALL
SELECT 'by_length', CAST(COUNT(*) AS BIGINT), CAST(SUM(c) AS BIGINT),
       CAST(SUM(c * m - t) AS BIGINT)
FROM la
ORDER BY strategy
"""


def ensure_bpe_encoded_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``bpe_encode_stats``: per-sequence encoded lengths
    ``(source, n_after)`` computed by the reference one-pass-per-rule kernel
    (`merge_pair_np` in `merge_idx` order) — an independent implementation
    the distributed linked-list priority encoder must match exactly."""
    import os as _os

    src = ensure_derived_parquet(sf_dir)

    def build() -> pa.Table:
        from ..functions.bpe import bpe_train_sampled, merge_pair_np
        from ..functions.tokens import _flat_tokens
        from ..schema import VOCAB_SIZE

        merges = bpe_train_sampled(src, num_merges=512, vocab_base=VOCAB_SIZE)
        t = pq.read_table(src, columns=["tokens", "source"])
        v, o = _flat_tokens(t)
        b = o[0]
        v, o = v[b : o[-1]].copy(), (o - b).copy()
        for r in merges.itertuples():
            v, o = merge_pair_np(v, o, int(r.left), int(r.right), int(r.new_id))
        return pa.table(
            {"source": t["source"], "n_after": pa.array(np.diff(o), pa.int64())}
        )

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "bpe_encoded.parquet"), build
    )


def q_bpe_encode_stats(sf_dir: str) -> pd.DataFrame:
    """Tokenizer INFERENCE at scale: train a REALISTIC 512-merge vocab on a
    deterministic bounded sample (driver-side incremental trainer — vocab is
    a statistic, it never needs the full corpus), broadcast it, and apply it
    to the whole corpus with the linked-list priority encoder (O(tokens) per
    batch regardless of vocab size); report per-source token totals
    before/after — the compression the learned vocab buys.  Oracle: the
    reference pass-per-rule kernel's encoded lengths as a Parquet artifact
    (independent algorithm, identical semantics)."""
    from ..functions.bpe import bpe_encode, bpe_train_sampled
    from ..schema import VOCAB_SIZE

    src = ensure_derived_parquet(sf_dir)
    ensure_bpe_encoded_parquet(sf_dir)
    merges = bpe_train_sampled(src, num_merges=512, vocab_base=VOCAB_SIZE)
    full = rd.read_parquet(src, columns=["tokens", "source"], override_num_blocks=8)
    encoded = bpe_encode(full, merges)

    def counts(t: pa.Table) -> pa.Table:
        n = pc.list_value_length(t["tokens"])
        g = pa.table({"source": t["source"], "n_after": pc.cast(n, pa.int64())}).group_by(
            ["source"]).aggregate([("n_after", "sum")])
        return pa.table({"source": g["source"], "n_after": g["n_after_sum"]})

    after = encoded.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True
                                ).to_pandas().groupby("source", as_index=False).sum()
    before = (
        rd.read_parquet(src, columns=["n_tok", "source"], override_num_blocks=8)
        .map_batches(
            lambda t: pa.table({"source": t["source"],
                                "n_before": pc.cast(t["n_tok"], pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas().groupby("source", as_index=False).sum()
    )
    out = before.merge(after, on="source").sort_values("source", ignore_index=True)
    return _i64(out, ["n_before", "n_after"])


SQL_BPE_ENCODE_STATS = f"""
WITH b AS (SELECT source, SUM(n_tok) AS nb
           FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet') GROUP BY source),
     a AS (SELECT source, SUM(n_after) AS na
           FROM read_parquet('{ORACLE_ARTIFACT_DIR}/bpe_encoded.parquet') GROUP BY source)
SELECT b.source, CAST(b.nb AS BIGINT) AS n_before, CAST(a.na AS BIGINT) AS n_after
FROM b JOIN a USING (source) ORDER BY b.source
"""


def q_naive_bayes_langid(sf_dir: str) -> pd.DataFrame:
    """Multinomial Naive Bayes language classifier — train on the hash-split
    train fold (leakage-safe pure-id membership, same split as
    ``split_counts``), score the val fold, emit the confusion matrix.

    Scale shape: (lang, term) counts are a vocab-bounded distributed reduce;
    the model (per-term per-lang ln(c+1) weights + per-lang constants) is a
    driver fold broadcast into the score stage; scoring is one streaming
    pass using the factored form  score = prior_l + Σ_t tf·ln(c_{t,l}+1)
    − mtf·ln(tot_l + V)  so unseen-in-lang vocab terms cost nothing (their
    ln(0+1)=0 term vanishes) and no lang×vocab dense matrix is ever built.
    Val docs with zero in-vocab tokens are excluded (both sides)."""
    from ..functions.search import tokenize_terms

    docs = _t(sf_dir, "documents", ["doc_id", "text", "lang"])

    def tag_split(t: pa.Table) -> pa.Table:
        fp = md5_hex(
            pc.binary_join_element_wise(pc.cast(t["doc_id"], pa.string()), ":split", "")
        )
        return t.append_column("split", pc.if_else(pc.less(fp, "1a"), "val", "train"))

    tagged = docs.map_batches(tag_split, batch_format="pyarrow", zero_copy_batch=True)

    # --- train fold: (lang, term) counts + per-lang doc counts, one pass ---
    def train_partial(t: pa.Table) -> pa.Table:
        tr = t.filter(pc.equal(t["split"], "train"))
        toks = tokenize_terms(tr, "text", "doc_id")
        lang_of = dict(zip(tr["doc_id"].to_pylist(), tr["lang"].to_pylist()))
        df = toks.to_pandas()
        df["lang"] = df["doc_id"].map(lang_of)
        g = df.groupby(["lang", "term"], as_index=False)["tf"].sum()
        g["nd"] = 0
        nd = tr.group_by("lang").aggregate([([], "count_all")]).to_pandas()
        nd = pd.DataFrame(
            {"lang": nd["lang"], "term": "", "tf": 0, "nd": nd["count_all"]}
        )
        return pa.Table.from_pandas(pd.concat([g, nd], ignore_index=True), preserve_index=False)

    from ..functions.relational import bucketed_group_reduce

    parts = tagged.map_batches(train_partial, batch_format="pyarrow", zero_copy_batch=True)
    model_df = bucketed_group_reduce(
        parts,
        ["lang", "term"],
        lambda df: df.groupby(["lang", "term"], as_index=False)[["tf", "nd"]].sum(),
    ).to_pandas()

    doc_counts = model_df[model_df["term"] == ""].set_index("lang")["nd"]
    counts = model_df[model_df["term"] != ""]
    langs = sorted(doc_counts.index)
    lx = {l: i for i, l in enumerate(langs)}
    n_train = int(doc_counts.sum())
    tot = counts.groupby("lang")["tf"].sum().reindex(langs).fillna(0).to_numpy()
    vocab_terms = counts["term"].unique()
    v_size = len(vocab_terms)
    # per-term weight rows: ln(c+1) per lang (sparse → dense per term)
    w = {}
    for term, g in counts.groupby("term"):
        row = np.zeros(len(langs))
        row[[lx[l] for l in g["lang"]]] = np.log(g["tf"].to_numpy() + 1.0)
        w[term] = row
    priors = np.log(doc_counts.reindex(langs).to_numpy() / float(n_train))
    penalty = np.log(tot + float(v_size))  # per-lang ln(tot_l + V)

    # --- val fold: factored-form scoring, confusion pairs pre-counted ---
    def score_partial(t: pa.Table) -> pa.Table:
        va = t.filter(pc.equal(t["split"], "val"))
        if va.num_rows == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "predicted": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        toks = tokenize_terms(va, "text", "doc_id").to_pandas()
        toks = toks[toks["term"].isin(w)]
        ids = va["doc_id"].to_pylist()
        di = {d: i for i, d in enumerate(ids)}
        scores = np.tile(priors, (len(ids), 1))
        rows = toks["doc_id"].map(di).to_numpy()
        tfv = toks["tf"].to_numpy(dtype=np.float64)
        wmat = np.vstack([w[x] for x in toks["term"]]) if len(toks) else np.zeros((0, len(langs)))
        np.add.at(scores, rows, tfv[:, None] * wmat)
        mtf = np.zeros(len(ids))
        np.add.at(mtf, rows, tfv)
        scores -= mtf[:, None] * penalty[None, :]
        keep = mtf > 0  # zero-in-vocab docs excluded (matches the oracle)
        pred = np.asarray(langs)[scores.argmax(axis=1)]  # argmax → first (lang asc)
        truth = np.asarray(va["lang"].to_pylist())
        df = (
            pd.DataFrame({"lang": truth[keep], "predicted": pred[keep]})
            .groupby(["lang", "predicted"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = tagged.map_batches(score_partial, batch_format="pyarrow", zero_copy_batch=True)
    out = (
        grouped_sums(pairs, ["lang", "predicted"], {"n2": "n"}, reduce="driver")
        .to_pandas()
        .rename(columns={"n2": "n"})
        .sort_values(["lang", "predicted"], ignore_index=True)
    )
    return _i64(out, ["n"])


SQL_NAIVE_BAYES_LANGID = """
WITH split AS (
  SELECT doc_id, lang,
         CASE WHEN md5(CAST(doc_id AS VARCHAR) || ':split') < '1a'
              THEN 'val' ELSE 'train' END AS sp
  FROM documents),
toks AS (
  SELECT doc_id, UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents),
toks2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
tr  AS (SELECT t.doc_id, s.lang, t.term FROM toks2 t JOIN split s USING (doc_id)
        WHERE s.sp = 'train'),
c   AS (SELECT lang, term, COUNT(*) AS c FROM tr GROUP BY 1, 2),
tot AS (SELECT lang, COUNT(*) AS tot FROM tr GROUP BY 1),
pri AS (SELECT lang, COUNT(*) AS nd FROM split WHERE sp = 'train' GROUP BY 1),
nt  AS (SELECT COUNT(*) AS n FROM split WHERE sp = 'train'),
voc AS (SELECT COUNT(DISTINCT term) AS v FROM tr),
tf  AS (SELECT t.doc_id, t.term, COUNT(*) AS tf FROM toks2 t
        JOIN split s USING (doc_id) WHERE s.sp = 'val' GROUP BY 1, 2),
tfv AS (SELECT tf.* FROM tf JOIN (SELECT DISTINCT term FROM tr) vt USING (term)),
mtf AS (SELECT doc_id, SUM(tf) AS mtf FROM tfv GROUP BY 1),
sc AS (
  SELECT m.doc_id, p.lang,
         LN(p.nd / CAST(nt.n AS DOUBLE))
           + COALESCE(x.sumln, 0)
           - m.mtf * LN(t.tot + voc.v) AS score
  FROM mtf m CROSS JOIN pri p CROSS JOIN nt CROSS JOIN voc
  JOIN tot t ON t.lang = p.lang
  LEFT JOIN (SELECT tfv.doc_id, c.lang, SUM(tfv.tf * LN(c.c + 1)) AS sumln
             FROM tfv JOIN c USING (term) GROUP BY 1, 2) x
    ON x.doc_id = m.doc_id AND x.lang = p.lang),
pred AS (
  SELECT doc_id, lang AS predicted,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
  FROM sc)
SELECT s.lang, p.predicted, COUNT(*) AS n
FROM pred p JOIN split s USING (doc_id)
WHERE p.rn = 1 GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_rrf_fusion(sf_dir: str) -> pd.DataFrame:
    """Reciprocal-Rank Fusion (Cormack et al. 2009) of two retrieval systems
    over the same query — BM25 and raw disjunctive term-frequency — the
    standard hybrid-search combiner: each system produces its DISTRIBUTED
    top-100 ranking (per-block prune top-k, driver sees ≤100 rows per
    system), then the fuse Σ 1/(60+rank) is driver arithmetic over ≤200
    rows.  Ranks are assigned on scores re-quantized to 6 decimals (both
    engines) so cross-engine 1-ulp sum-order noise cannot flip a rank
    boundary; quantization ties break by doc_id identically."""
    from ..functions.relational import grouped_sums as _gs, topk as _topk
    from ..functions.search import bm25_postings, bm25_search

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    post = bm25_postings(ds, SEARCH_TERMS).materialize()  # ONE corpus scan
    bm = bm25_search(ds, SEARCH_TERMS, k=100, post=post)  # scores 6-dec rounded
    bm = bm.sort_values(["score", "doc_id"], ascending=[False, True], ignore_index=True)
    bm["r"] = np.arange(1, len(bm) + 1)

    cands = post.filter(expr="doc_id >= 0")
    kw = _topk(
        _gs(cands, ["doc_id"], {"s": "tf"}), ["s", "doc_id"], [True, False], 100
    ).to_pandas()
    kw = kw.sort_values(["s", "doc_id"], ascending=[False, True], ignore_index=True)
    kw["r"] = np.arange(1, len(kw) + 1)

    both = pd.concat([bm[["doc_id", "r"]], kw[["doc_id", "r"]]], ignore_index=True)
    both["w"] = 1.0 / (60.0 + both["r"])
    out = both.groupby("doc_id", as_index=False)["w"].sum().rename(columns={"w": "rrf"})
    out = out.sort_values(["rrf", "doc_id"], ascending=[False, True], ignore_index=True).head(20)
    out["rrf"] = out["rrf"].pipe(_rd)
    return _i64(out, ["doc_id"])


SQL_RRF_FUSION = """
WITH toks AS (
  SELECT doc_id, UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS term FROM documents
), toks2 AS (SELECT * FROM toks WHERE term <> ''),
dl AS (SELECT doc_id, COUNT(*) AS len FROM toks2 GROUP BY 1),
stats AS (SELECT COUNT(*) AS n, SUM(len) AS sumlen FROM dl),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks2
       WHERE term IN ('join', 'hash', 'batch') GROUP BY 1, 2),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
bm AS (SELECT tf.doc_id,
         ROUND(SUM(ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * (tf.tf / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 *
                 (dl.len / (CAST(stats.sumlen AS DOUBLE) / stats.n)))))), 6) AS s
       FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
       GROUP BY 1),
bmr AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS r FROM bm
        QUALIFY r <= 100),
kw AS (SELECT doc_id, SUM(tf) AS s FROM tf GROUP BY 1),
kwr AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS r FROM kw
        QUALIFY r <= 100)
SELECT doc_id, ROUND(SUM(1.0 / (60.0 + r)), 6) AS rrf
FROM (SELECT * FROM bmr UNION ALL SELECT * FROM kwr)
GROUP BY 1 ORDER BY rrf DESC, doc_id LIMIT 20
"""


def q_type_hour_grid(sf_dir: str) -> pd.DataFrame:
    """Dense dimension-grid fill (event_type × all 24 hours, zeros kept) —
    the CROSS JOIN + LEFT JOIN COALESCE pattern: the fact side is ONE
    distributed (type, hour) aggregate; the grid completion is a reindex
    over the schema-bounded dimension product on the driver."""
    ds = _t(sf_dir, "events", ["event_type", "ts"])

    def add_h(t: pa.Table) -> pa.Table:
        micros = pc.cast(t["ts"], pa.int64())
        hour_id = pc.divide(micros, pa.scalar(3_600_000_000, pa.int64()))
        hour = pc.subtract(hour_id, pc.multiply(pc.divide(hour_id, 24), 24))
        return pa.table({"event_type": t["event_type"], "hour": hour})

    agg = grouped_sums(
        ds.map_batches(add_h, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "hour"],
        {},
        "n",
        reduce="driver",
    ).to_pandas()
    types = sorted(agg["event_type"].unique())
    grid = pd.MultiIndex.from_product([types, range(24)], names=["event_type", "hour"])
    out = (
        agg.set_index(["event_type", "hour"])
        .reindex(grid, fill_value=0)
        .reset_index()
        .sort_values(["event_type", "hour"], ignore_index=True)
    )
    return _i64(out, ["hour", "n"])


SQL_TYPE_HOUR_GRID = """
WITH dims AS (
  SELECT t.event_type, h.range AS hour
  FROM (SELECT DISTINCT event_type FROM events) t CROSS JOIN range(24) h),
c AS (
  SELECT event_type, (EPOCH_US(ts) // 3600000000) % 24 AS hour, COUNT(*) AS n
  FROM events GROUP BY 1, 2)
SELECT dims.event_type, dims.hour, COALESCE(c.n, 0) AS n
FROM dims LEFT JOIN c USING (event_type, hour)
ORDER BY 1, 2
"""


def q_fk_integrity_audit(sf_dir: str) -> pd.DataFrame:
    """Referential-integrity / coverage audit across table relationships —
    the data-quality gate every multi-table ingest runs before training:
    for each (child.key → parent.key) relation, count child rows and keys
    with no parent.  Distributed shape per relation: BOTH sides collapse to
    key-level partials first (per-batch distinct+count combiner →
    ``grouped_sums``), so only (key, rows) rows — never raw child rows —
    reach the anti exchange; the anti itself is one ``bucketed_group_reduce``
    over the tagged union of the two key tables.  Includes a coverage
    relation (customer → events.user_id) that is genuinely non-empty, so a
    bug that yields constant zeros cannot pass the oracle."""
    from ..functions.relational import bucketed_group_reduce

    rels = [
        ("orders.o_custkey->customer", ("orders", "o_custkey"), ("customer", "c_custkey")),
        ("lineitem.l_orderkey->orders", ("lineitem", "l_orderkey"), ("orders", "o_orderkey")),
        ("events.user_id->customer", ("events", "user_id"), ("customer", "c_custkey")),
        ("customer->events.user_id", ("customer", "c_custkey"), ("events", "user_id")),
    ]

    def tagged(table: str, key: str, rid: int, par: int) -> rd.Dataset:
        # per-BATCH key partials tagged with (relation id, side): child keys
        # carry their row counts, parent keys carry 0 — the tagged union then
        # needs exactly ONE (rel, k) exchange for all relations together,
        # which yields orphans AND child totals in the same reduce
        def part(t: pa.Table, *, k=key, r=rid, p=par) -> pa.Table:
            g = pa.table({"k": pc.cast(t[k], pa.int64())}).group_by(["k"]).aggregate(
                [([], "count_all")])
            n = g.num_rows
            rows = (pc.cast(g["count_all"], pa.int64()) if p == 0
                    else pa.nulls(n, pa.int64()).fill_null(0))
            return pa.table(
                {"rel": pa.nulls(n, pa.int64()).fill_null(r), "k": g["k"],
                 "rows": rows, "par": pa.nulls(n, pa.int64()).fill_null(p)})

        return _t(sf_dir, table, [key]).map_batches(
            part, batch_format="pyarrow", zero_copy_batch=True)

    parts = [
        tagged(tbl, key, rid, side)
        for rid, (_, child, parent) in enumerate(rels)
        for side, (tbl, key) in enumerate((child, parent))
    ]

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["rel", "k"], as_index=False).agg(rows=("rows", "sum"), par=("par", "sum"))
        g["orph"] = g["par"] == 0
        g["orows"] = g["rows"] * g["orph"]
        return g.groupby("rel", as_index=False).agg(
            child_rows=("rows", "sum"), orphan_keys=("orph", "sum"), orphan_rows=("orows", "sum"))

    per_bucket = bucketed_group_reduce(parts[0].union(*parts[1:]), ["rel", "k"], fold).to_pandas()
    agg = per_bucket.groupby("rel", as_index=False).sum()
    agg["relation"] = agg["rel"].map({i: name for i, (name, _, _) in enumerate(rels)})
    out = agg[["relation", "child_rows", "orphan_keys", "orphan_rows"]].sort_values(
        "relation", ignore_index=True)
    return _i64(out, ["child_rows", "orphan_keys", "orphan_rows"])


SQL_FK_INTEGRITY_AUDIT = """
SELECT 'orders.o_custkey->customer' AS relation,
       (SELECT COUNT(*) FROM orders) AS child_rows,
       COUNT(DISTINCT o.o_custkey) AS orphan_keys, COUNT(*) AS orphan_rows
FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'lineitem.l_orderkey->orders',
       (SELECT COUNT(*) FROM lineitem),
       COUNT(DISTINCT l.l_orderkey), COUNT(*)
FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'events.user_id->customer',
       (SELECT COUNT(*) FROM events),
       COUNT(DISTINCT e.user_id), COUNT(*)
FROM events e WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)
UNION ALL
SELECT 'customer->events.user_id',
       (SELECT COUNT(*) FROM customer),
       COUNT(DISTINCT c.c_custkey), COUNT(*)
FROM customer c WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
"""


def q_hourly_autocorr(sf_dir: str) -> pd.DataFrame:
    """Lag-1 autocorrelation of the hourly event-count series per type —
    the burstiness/seasonality drift signal.  The heavy half is ONE
    distributed (type, hour) count; the series itself is schema-bounded
    (|types| × |hours|), so the lag-pair Pearson corr is driver numpy over
    the tiny aggregate, matching SQL ``corr(n, LAG(n))`` exactly (pairs are
    consecutive PRESENT rows in hour order, as in the window oracle)."""
    ds = _t(sf_dir, "events", ["ts", "event_type"])

    def add_hour(t: pa.Table) -> pa.Table:
        micros = pc.cast(t["ts"], pa.int64())
        return pa.table(
            {"hour_id": pc.divide(micros, pa.scalar(3_600_000_000, pa.int64())),
             "event_type": t["event_type"]}
        )

    agg = grouped_sums(
        ds.map_batches(add_hour, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "hour_id"],
        {},
        "n",
    ).to_pandas()
    rows = []
    for etype, g in agg.sort_values(["event_type", "hour_id"]).groupby("event_type"):
        x = g["n"].to_numpy(dtype=np.float64)
        cur, prev = x[1:], x[:-1]
        if len(cur) >= 2 and cur.std() > 0 and prev.std() > 0:
            r = float(np.corrcoef(cur, prev)[0, 1])
        else:
            r = np.nan
        rows.append((etype, _rd(r, 6), len(cur)))
    out = pd.DataFrame(rows, columns=["event_type", "autocorr", "n_pairs"])
    return _i64(out, ["n_pairs"])


SQL_HOURLY_AUTOCORR = """
WITH h AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_id, COUNT(*) AS n
  FROM events GROUP BY 1, 2),
l AS (
  SELECT event_type, n,
         LAG(n) OVER (PARTITION BY event_type ORDER BY hour_id) AS pn
  FROM h)
SELECT event_type, ROUND(corr(n, pn), 6) AS autocorr, COUNT(pn) AS n_pairs
FROM l GROUP BY event_type ORDER BY event_type
"""


def q_source_vocab_jaccard(sf_dir: str) -> pd.DataFrame:
    """Pairwise vocabulary Jaccard similarity between document sources —
    the corpus-mixture redundancy check.  Never materializes a vocabulary:
    (source, term) distinct via one grouped exchange, each term's source
    SET packed into an int bitmask by summing per-source bit values (each
    (source, term) appears exactly once post-distinct, so SUM ≡ OR), then a
    histogram over realized masks — the driver sees only (mask, count)
    rows (≤ distinct masks, ≤ |terms|), from which every pairwise
    intersection and union is popcount arithmetic."""
    from ..functions.search import tokenize_terms

    docs = _t(sf_dir, "documents", ["source", "text"])
    srcs = sorted(grouped_sums(_t(sf_dir, "documents", ["source"]), ["source"], {}, "n")
                  .to_pandas()["source"])
    bit_of = {s: 1 << i for i, s in enumerate(srcs)}

    pairs = docs.map_batches(
        lambda t: tokenize_terms(t, "text", "source"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    distinct = grouped_sums(pairs, ["source", "term"], {}, "c")

    def to_bits(t: pa.Table, *, bits=bit_of) -> pa.Table:
        src = t["source"].to_pandas().map(bits).to_numpy(dtype=np.int64)
        return pa.table({"term": t["term"], "bit": pa.array(src, pa.int64())})

    masks = grouped_sums(
        distinct.map_batches(to_bits, batch_format="pyarrow"), ["term"], {"mask": "bit"}, "c"
    )
    hist = grouped_sums(
        masks.select_columns(["mask"]), ["mask"], {}, "cnt"
    ).to_pandas()
    mask_vals = hist["mask"].to_numpy(dtype=np.int64)
    cnts = hist["cnt"].to_numpy(dtype=np.int64)
    size = {s: int(cnts[(mask_vals & b) != 0].sum()) for s, b in bit_of.items()}
    rows = []
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            inter = int(cnts[((mask_vals & bit_of[a]) != 0) & ((mask_vals & bit_of[b]) != 0)].sum())
            uni = size[a] + size[b] - inter
            rows.append((a, b, inter, _rd(inter / uni, 6) if uni else np.nan))
    out = pd.DataFrame(rows, columns=["source_a", "source_b", "inter", "jaccard"])
    return _i64(out, ["inter"])


SQL_SOURCE_VOCAB_JACCARD = """
WITH toks AS (
  SELECT DISTINCT source, UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents),
t AS (SELECT * FROM toks WHERE term <> ''),
sizes AS (SELECT source, COUNT(*) AS n FROM t GROUP BY 1),
grid AS (
  SELECT a.source AS source_a, a.n AS na, b.source AS source_b, b.n AS nb
  FROM sizes a JOIN sizes b ON a.source < b.source),
i AS (
  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS inter
  FROM t a JOIN t b ON a.term = b.term AND a.source < b.source
  GROUP BY 1, 2)
SELECT g.source_a, g.source_b, COALESCE(i.inter, 0) AS inter,
       ROUND(COALESCE(i.inter, 0) / (g.na + g.nb - COALESCE(i.inter, 0)), 6) AS jaccard
FROM grid g LEFT JOIN i ON g.source_a = i.source_a AND g.source_b = i.source_b
ORDER BY 1, 2
"""


def q_orders_vs_ships_daily(sf_dir: str) -> pd.DataFrame:
    """Daily order volume vs daily shipment volume via a native FULL OUTER
    hash join — the reconciliation-report shape where either side may have
    days the other lacks (ship dates extend past the last order date).
    Both sides are pre-aggregated to (day, n) BEFORE the join, so the
    exchange moves day-level partials, not raw rows; Ray's full-outer
    ``Dataset.join`` coalesces the key across sides."""
    from ..functions.relational import hash_join

    def to_day(col: str, out: str):
        def f(t: pa.Table) -> pa.Table:
            micros = pc.cast(t[col], pa.int64())
            return pa.table({"day_id": pc.divide(micros, pa.scalar(86_400_000_000, pa.int64()))})
        return f

    o = grouped_sums(
        _t(sf_dir, "orders", ["o_orderdate"]).map_batches(
            to_day("o_orderdate", "day_id"), batch_format="pyarrow", zero_copy_batch=True),
        ["day_id"], {}, "o_n",
    )
    l = grouped_sums(
        _t(sf_dir, "lineitem", ["l_shipdate"]).map_batches(
            to_day("l_shipdate", "day_id"), batch_format="pyarrow", zero_copy_batch=True),
        ["day_id"], {}, "l_n",
    )
    j = hash_join(o, l, on="day_id", how="full_outer").to_pandas()
    j["o_n"] = j["o_n"].fillna(0)
    j["l_n"] = j["l_n"].fillna(0)
    return _i64(j, ["day_id", "o_n", "l_n"])


SQL_ORDERS_VS_SHIPS_DAILY = """
WITH o AS (
  SELECT CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day_id, COUNT(*) AS o_n
  FROM orders GROUP BY 1),
l AS (
  SELECT CAST(floor(epoch(l_shipdate) / 86400) AS BIGINT) AS day_id, COUNT(*) AS l_n
  FROM lineitem GROUP BY 1)
SELECT COALESCE(o.day_id, l.day_id) AS day_id,
       COALESCE(o.o_n, 0) AS o_n, COALESCE(l.l_n, 0) AS l_n
FROM o FULL OUTER JOIN l ON o.day_id = l.day_id
ORDER BY 1
"""


def q_copurchase_degree_hist(sf_dir: str) -> pd.DataFrame:
    """Degree distribution of the co-purchase graph — the skew probe run
    before any graph algorithm (hub degree decides triangle/PageRank
    partitioning).  Distinct edges via grouped reduce over per-order pair
    combiners (pair blow-up bounded by order width²), symmetrize, then two
    tiny grouped exchanges: neighbors-per-node, nodes-per-degree."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        m = df.merge(df, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return m[["l_partkey_x", "l_partkey_y"]].drop_duplicates().rename(
            columns={"l_partkey_x": "part_a", "l_partkey_y": "part_b"})

    edges = grouped_sums(
        bucketed_group_reduce(ds, ["l_orderkey"], per_bucket), ["part_a", "part_b"], {}, "c"
    )

    def sym(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": pa.concat_arrays(
                [t["part_a"].combine_chunks().cast(pa.int64()),
                 t["part_b"].combine_chunks().cast(pa.int64())])}
        )

    deg = grouped_sums(
        edges.map_batches(sym, batch_format="pyarrow"), ["node"], {}, "deg"
    )
    out = grouped_sums(deg.select_columns(["deg"]), ["deg"], {}, "n_nodes").to_pandas()
    return _i64(out, ["deg", "n_nodes"])


SQL_COPURCHASE_DEGREE_HIST = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
  FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
s AS (SELECT pa AS node FROM e UNION ALL SELECT pb FROM e),
deg AS (SELECT node, COUNT(*) AS deg FROM s GROUP BY 1)
SELECT deg, COUNT(*) AS n_nodes FROM deg GROUP BY 1 ORDER BY 1
"""


def q_bigram_lm_nll(sf_dir: str) -> pd.DataFrame:
    """Add-one-smoothed bigram language model trained on the whole corpus,
    scored per source (average negative log-likelihood per bigram) — the
    LM-based quality/drift signal one step up from unigram surprisal.

    Distributed shape: bigram and unigram streams collapse to per-batch
    TYPE-level partials (combiner before any exchange), then ONE co-group
    exchange on w1 — where all of a word's bigram partials and its unigram
    partials co-locate — computes c12, c1 and the smoothed score in place,
    replacing the two model joins a naive plan would run; only per-source
    scalar partials reach the driver."""
    from ..functions.relational import bucketed_group_reduce
    from ..functions.search import TOKEN_SPLIT, word_bigrams

    docs = _t(sf_dir, "documents", ["source", "text"])

    def bigram_partial(t: pa.Table) -> pa.Table:
        bg = word_bigrams(t, "text", "source")
        df = bg.to_pandas().groupby(["source", "w1", "w2"], as_index=False).size()
        df["c1"] = 0
        return pa.Table.from_pandas(
            df.rename(columns={"size": "n"})[["source", "w1", "w2", "n", "c1"]],
            preserve_index=False)

    def unigram_partial(t: pa.Table) -> pa.Table:
        words = pc.split_pattern_regex(pc.utf8_lower(t["text"]), TOKEN_SPLIT)
        words = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        flat = words.flatten()
        flat = flat.filter(pc.not_equal(flat, ""))
        g = pa.table({"w1": flat}).group_by(["w1"]).aggregate([([], "count_all")])
        n = g.num_rows
        return pa.table({"source": pa.nulls(n, pa.string()).fill_null(""),
                         "w1": g["w1"],
                         "w2": pa.nulls(n, pa.string()).fill_null(""),
                         "n": pa.nulls(n, pa.int64()).fill_null(0),
                         "c1": pc.cast(g["count_all"], pa.int64())})

    bg = docs.map_batches(bigram_partial, batch_format="pyarrow", zero_copy_batch=True)
    # materialized: the vocab count below and the co-group union both
    # consume these partials — without it the corpus tokenizes twice
    un = docs.map_batches(
        unigram_partial, batch_format="pyarrow", zero_copy_batch=True).materialize()

    # V = |vocabulary| — one w1-level reduce of the unigram partials
    vocab = grouped_sums(un.select_columns(["w1"]), ["w1"], {}, "c").count()

    # ONE co-group exchange on w1 replaces both model joins: every row of a
    # given w1 (all its bigram partials from every source + its unigram
    # partials) lands in one bucket, so c12 and c1 are in-bucket sums and
    # the smoothed score is computed where the data already sits.  Bucket
    # mass is bounded by bigram TYPES per w1 (partials, not tokens).
    def fold(df: pd.DataFrame, *, v=vocab) -> pd.DataFrame:
        c1 = df.groupby("w1")["c1"].sum()
        b = df[df["n"] > 0].groupby(["source", "w1", "w2"], as_index=False)["n"].sum()
        if not len(b):
            return pd.DataFrame({"source": [], "nll": [], "n": []})
        c12 = b.groupby(["w1", "w2"])["n"].transform("sum")
        nll = b["n"] * -(np.log(c12.to_numpy() + 1.0)
                         - np.log(c1.loc[b["w1"]].to_numpy() + v))
        out = pd.DataFrame({"source": b["source"], "nll": nll, "n": b["n"]})
        return out.groupby("source", as_index=False).agg(nll=("nll", "sum"), n=("n", "sum"))

    parts = bucketed_group_reduce(bg.union(un), ["w1"], fold).to_pandas()
    out = parts.groupby("source", as_index=False).agg(
        nll=("nll", "sum"), n_bigrams=("n", "sum"))
    out["avg_nll"] = (out["nll"] / out["n_bigrams"]).pipe(_rd)
    out = out.drop(columns=["nll"]).sort_values("source", ignore_index=True)
    return _i64(out, ["n_bigrams"])


SQL_BIGRAM_LM_NLL = """
WITH d AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws
  FROM documents),
uni AS (SELECT UNNEST(ws) AS w FROM d),
uc AS (SELECT w, COUNT(*) AS c1 FROM uni GROUP BY 1),
v AS (SELECT COUNT(*) AS v FROM uc),
bg AS (
  SELECT source, ws[i] AS w1, ws[i + 1] AS w2
  FROM d, UNNEST(range(1, greatest(len(ws), 1))) AS t(i)),
bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
sb AS (SELECT source, w1, w2, COUNT(*) AS n FROM bg GROUP BY 1, 2, 3)
SELECT source, CAST(SUM(n) AS BIGINT) AS n_bigrams,
       ROUND(SUM(n * -ln((c12 + 1.0) / (c1 + v.v))) / SUM(n), 6) AS avg_nll
FROM sb JOIN bc USING (w1, w2) JOIN uc ON sb.w1 = uc.w CROSS JOIN v
GROUP BY source ORDER BY source
"""


def q_value_boxplot(sf_dir: str) -> pd.DataFrame:
    """Per-group boxplot profile — discrete quartiles plus Tukey-fence
    (1.5·IQR) outlier counts — from ONE histogram pass: the mergeable
    fixed-bin sketch (``sketch.py::grouped_histogram_fixedpoint``) already
    carries everything, so unlike the SQL oracle (which scans twice: once
    for quantiles, once to count outliers) no second scan happens.  All
    fence comparisons are exact integer arithmetic in half-cent units —
    quartiles are cent-grid data values (quantile_disc), so 1.5·IQR lives
    on the half-cent grid and no float boundary can flip a count."""
    from ..functions.sketch import grouped_histogram_fixedpoint, quantile_disc_from_counts

    hist = grouped_histogram_fixedpoint(
        _t(sf_dir, "events", ["event_type", "value"]), "event_type", "value", scale=100
    )
    rows = []
    for etype, g in hist.groupby("event_type", sort=True):
        bins = g["bin"].to_numpy()
        counts = g["n"].to_numpy()
        mask = pd.notna(bins)
        b = bins[mask].astype(np.int64)
        c = counts[mask].astype(np.int64)
        n = int(c.sum())
        q25 = quantile_disc_from_counts(b, c, 0.25)
        q50 = quantile_disc_from_counts(b, c, 0.50)
        q75 = quantile_disc_from_counts(b, c, 0.75)
        iqr = q75 - q25
        lo2, hi2 = 2 * q25 - 3 * iqr, 2 * q75 + 3 * iqr  # half-cent units
        n_out = int(c[(2 * b < lo2) | (2 * b > hi2)].sum())
        rows.append((etype, _rd(q25 / 100.0, 2), _rd(q50 / 100.0, 2),
                     _rd(q75 / 100.0, 2), n, n_out))
    out = pd.DataFrame(rows, columns=["event_type", "p25", "p50", "p75", "n", "n_outliers"])
    return _i64(out, ["n", "n_outliers"])


SQL_VALUE_BOXPLOT = """
WITH q AS (
  SELECT event_type,
         CAST(ROUND(quantile_disc(value, 0.25) * 100) AS BIGINT) AS q25c,
         CAST(ROUND(quantile_disc(value, 0.50) * 100) AS BIGINT) AS q50c,
         CAST(ROUND(quantile_disc(value, 0.75) * 100) AS BIGINT) AS q75c
  FROM events GROUP BY 1)
SELECT e.event_type,
       ROUND(q25c / 100.0, 2) AS p25, ROUND(q50c / 100.0, 2) AS p50,
       ROUND(q75c / 100.0, 2) AS p75,
       COUNT(value) AS n,
       COUNT(*) FILTER (CAST(ROUND(value * 200) AS BIGINT) < 2 * q25c - 3 * (q75c - q25c)
                     OR CAST(ROUND(value * 200) AS BIGINT) > 2 * q75c + 3 * (q75c - q25c))
         AS n_outliers
FROM events e JOIN q USING (event_type)
GROUP BY e.event_type, q25c, q50c, q75c ORDER BY 1
"""


def q_nation_revenue_share(sf_dir: str) -> pd.DataFrame:
    """Percent-of-total window (``ratio_to_report``): each nation's share
    of its region's order revenue.  The fact side pre-aggregates per
    custkey BEFORE touching any dimension, the customer dimension attaches
    via the size-aware join planner, and the final share window runs on
    the |nations|-bounded aggregate on the driver."""
    from ..functions.relational import auto_join

    o = grouped_sums(_t(sf_dir, "orders", ["o_custkey", "o_totalprice"]),
                     ["o_custkey"], {"rev": "o_totalprice"})
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lambda t: pa.table({"o_custkey": t["c_custkey"], "nationkey": t["c_nationkey"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    per_nation = grouped_sums(
        auto_join(o, cust, on="o_custkey"), ["nationkey"], {"revenue": "rev"}
    ).to_pandas()
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    out = per_nation.merge(dim, left_on="nationkey", right_on="n_nationkey")
    out["share"] = (out["revenue"] / out.groupby("r_regionkey")["revenue"].transform("sum")).pipe(_rd)
    out["revenue"] = out["revenue"].pipe(_rd, 2)
    out = out.rename(columns={"r_name": "region", "n_name": "nation"})
    return out[["region", "nation", "revenue", "share"]].sort_values(
        ["region", "nation"], ignore_index=True)


SQL_NATION_REVENUE_SHARE = """
WITH rev AS (
  SELECT c.c_nationkey AS nationkey, SUM(o.o_totalprice) AS revenue
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1)
SELECT r.r_name AS region, n.n_name AS nation, ROUND(revenue, 2) AS revenue,
       ROUND(revenue / SUM(revenue) OVER (PARTITION BY r.r_regionkey), 6) AS share
FROM rev JOIN nation n ON rev.nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
ORDER BY 1, 2
"""


def q_shipping_priority(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q3 shape (shipping-priority): segment-filtered customers →
    date-filtered orders → post-cutoff lineitems, top-10 orders by revenue.
    Plan: every filter is pushed into the scan; lineitem pre-aggregates
    revenue PER ORDER before any join (the classic combiner-before-join
    rule — the join then moves order-level rows, not lineitems); customer
    participates only as a key set through the size-aware planner."""
    from ..functions.relational import auto_join

    cutoff = pa.scalar(datetime(1998, 1, 1), pa.timestamp("us"))
    cust = _t(
        sf_dir, "customer", ["c_custkey"],
        filter=pads.field("c_mktsegment") == "BUILDING",
    ).map_batches(
        lambda t: pa.table({"o_custkey": t["c_custkey"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    orders = _t(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=pads.field("o_orderdate") < cutoff,
    )
    o_seg = auto_join(orders, cust, on="o_custkey").map_batches(
        lambda t: t.select(["o_orderkey", "o_orderdate", "o_orderpriority"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    li = _t(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pads.field("l_shipdate") > cutoff,
    )

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"o_orderkey": t["l_orderkey"], "r": r})

    li_rev = grouped_sums(
        li.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True),
        ["o_orderkey"], {"revenue": "r"},
    )
    j = auto_join(li_rev, o_seg, on="o_orderkey")
    out = topk(j, ["revenue", "o_orderkey"], [True, False], 10).to_pandas()
    out["revenue"] = out["revenue"].pipe(_rd, 2)
    out = out.rename(columns={"o_orderkey": "l_orderkey"})
    return _i64(out[["l_orderkey", "revenue", "o_orderdate", "o_orderpriority"]], ["l_orderkey"])


SQL_SHIPPING_PRIORITY = """
SELECT l.l_orderkey,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
"""


def q_new_users_daily(sf_dir: str) -> pd.DataFrame:
    """First-seen cohort counts (new users per day): per-batch min-day
    partials per user → bucketed min reduce (only (user, day) pairs cross
    the exchange) → day-level count.  The first-touch-attribution shape."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        micros = pc.cast(t["ts"], pa.int64())
        day = pc.divide(micros, pa.scalar(86_400_000_000, pa.int64()))
        g = pa.table({"user_id": t["user_id"], "day_id": day}).group_by(["user_id"]).aggregate(
            [("day_id", "min")])
        return pa.table({"user_id": g["user_id"], "day_id": g["day_id_min"]})

    per_user = bucketed_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"],
        lambda df: df.groupby("user_id", as_index=False)["day_id"].min(),
    )
    out = grouped_sums(per_user.select_columns(["day_id"]), ["day_id"], {}, "new_users").to_pandas()
    return _i64(out, ["day_id", "new_users"])


SQL_NEW_USERS_DAILY = """
WITH f AS (
  SELECT user_id, MIN(CAST(floor(epoch(ts) / 86400) AS BIGINT)) AS day_id
  FROM events GROUP BY 1)
SELECT day_id, COUNT(*) AS new_users FROM f GROUP BY 1 ORDER BY 1
"""


def q_event_trigrams(sf_dir: str) -> pd.DataFrame:
    """Per-user ordered event-type trigram mining (the behavioral-pattern
    sequence op one step past the Markov transition matrix): hash exchange
    on the user, per-group chronological sort + vectorized shift-compare
    trigram partials, global trigram reduce, deterministic top-20."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        u, e = df["user_id"].to_numpy(), df["event_type"].to_numpy()
        same = (u[:-2] == u[1:-1]) & (u[1:-1] == u[2:]) if len(u) >= 3 else np.empty(0, bool)
        t = pd.DataFrame({"t1": e[:-2][same], "t2": e[1:-1][same], "t3": e[2:][same]})
        return t.groupby(["t1", "t2", "t3"], as_index=False).size().rename(columns={"size": "n"})

    tri = bucketed_group_reduce(ds, ["user_id"], per_user)
    agg = grouped_sums(tri, ["t1", "t2", "t3"], {"n": "n"})
    out = topk(agg, ["n", "t1", "t2", "t3"], [True, False, False, False], 20).to_pandas()
    return _i64(out, ["n"])


SQL_EVENT_TRIGRAMS = """
WITH s AS (
  SELECT event_type AS t3,
         LAG(event_type, 1) OVER w AS t2,
         LAG(event_type, 2) OVER w AS t1
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT t1, t2, t3, COUNT(*) AS n
FROM s WHERE t1 IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY n DESC, t1, t2, t3
LIMIT 20
"""


def q_conversion_latency(sf_dir: str) -> pd.DataFrame:
    """First-view → first-purchase latency (funnel timing): conditional
    per-user MIN partials for both stages in one scan, bucketed min
    reduce, then scalar moments folded distributedly — the driver sees
    four numbers, never per-user rows."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        micros = pc.cast(t["ts"], pa.int64())
        df = pa.table({"user_id": t["user_id"], "us": micros, "et": t["event_type"]}).to_pandas()
        v = df[df["et"] == "view"].groupby("user_id")["us"].min()
        p = df[df["et"] == "purchase"].groupby("user_id")["us"].min()
        m = pd.concat([v.rename("v_us"), p.rename("p_us")], axis=1).reset_index()
        return pa.Table.from_pandas(m, preserve_index=False)

    def merge_mins(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("user_id", as_index=False).agg(
            v_us=("v_us", "min"), p_us=("p_us", "min"))

    per_user = bucketed_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"], merge_mins,
    )

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=["v_us", "p_us"])
        d = d[d["p_us"] >= d["v_us"]]
        lat = (d["p_us"] - d["v_us"]).to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "n": [len(lat)], "s": [int(lat.sum())],
            "mn": [int(lat.min()) if len(lat) else np.iinfo(np.int64).max],
            "mx": [int(lat.max()) if len(lat) else np.iinfo(np.int64).min],
        })

    parts = per_user.map_batches(moments, batch_format="pandas").to_pandas()
    n = int(parts["n"].sum())
    out = pd.DataFrame({
        "n_users": [n],
        "avg_latency_s": [_rd(float(parts["s"].sum()) / n / 1e6, 3) if n else np.nan],
        "min_latency_s": [int(parts["mn"].min() // 1_000_000)],
        "max_latency_s": [int(parts["mx"].max() // 1_000_000)],
    })
    return _i64(out, ["n_users", "min_latency_s", "max_latency_s"])


SQL_CONVERSION_LATENCY = """
WITH u AS (
  SELECT user_id,
         MIN(EPOCH_US(ts)) FILTER (event_type = 'view') AS v_us,
         MIN(EPOCH_US(ts)) FILTER (event_type = 'purchase') AS p_us
  FROM events GROUP BY 1)
SELECT COUNT(*) AS n_users,
       ROUND(SUM(p_us - v_us) / COUNT(*) / 1000000.0, 3) AS avg_latency_s,
       CAST(MIN(p_us - v_us) // 1000000 AS BIGINT) AS min_latency_s,
       CAST(MAX(p_us - v_us) // 1000000 AS BIGINT) AS max_latency_s
FROM u WHERE v_us IS NOT NULL AND p_us IS NOT NULL AND p_us >= v_us
"""


def q_value_gini(sf_dir: str) -> pd.DataFrame:
    """Per-group Gini coefficient of the value distribution (inequality /
    concentration signal) computed EXACTLY from the same one-pass mergeable
    cent histogram as the median/boxplot — rank sums per bin are closed-form
    (run of c equal values starting at rank r contributes
    ``x·(c·r + c·(c-1)/2)``), so no sort and no raw-value shuffle, while the
    SQL oracle needs a full ROW_NUMBER window sort."""
    from ..functions.sketch import grouped_histogram_fixedpoint

    hist = grouped_histogram_fixedpoint(
        _t(sf_dir, "events", ["event_type", "value"]), "event_type", "value", scale=100
    )
    rows = []
    for etype, g in hist.groupby("event_type", sort=True):
        mask = pd.notna(g["bin"])
        b = g["bin"].to_numpy()[mask].astype(np.int64)
        c = g["n"].to_numpy()[mask].astype(np.int64)
        order = np.argsort(b)
        b, c = b[order], c[order]
        n = int(c.sum())
        start = np.concatenate(([0], np.cumsum(c)[:-1])) + 1  # 1-based first rank per run
        s = int((b * c).sum())
        si = int((b * (c * start + c * (c - 1) // 2)).sum())
        gini = 2.0 * si / (n * s) - (n + 1.0) / n if n and s else np.nan
        rows.append((etype, _rd(gini, 6), n))
    out = pd.DataFrame(rows, columns=["event_type", "gini", "n"])
    return _i64(out, ["n"])


SQL_VALUE_GINI = """
WITH r AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS i
  FROM events WHERE value IS NOT NULL),
g AS (SELECT event_type, COUNT(*) AS n, SUM(value) AS s, SUM(i * value) AS si
      FROM r GROUP BY 1)
SELECT event_type, ROUND(2.0 * si / (n * s) - (n + 1.0) / n, 6) AS gini, n
FROM g ORDER BY 1
"""


def q_order_priority_check(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q4 shape (EXISTS semi-join): orders with at least one lineitem
    shipped >30 days after the order date, counted per priority.  The
    correlated EXISTS collapses to a per-order MAX pre-aggregate (the
    predicate is monotone in shipdate), so the exchange moves order-level
    partials; the orders side then attaches via one hash join and the
    comparison is a vectorized timestamp subtract."""
    from ..functions.relational import bucketed_group_reduce, hash_join

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def part(t: pa.Table) -> pa.Table:
        g = pa.table(
            {"o_orderkey": t["l_orderkey"], "ship_us": pc.cast(t["l_shipdate"], pa.int64())}
        ).group_by(["o_orderkey"]).aggregate([("ship_us", "max")])
        return pa.table({"o_orderkey": g["o_orderkey"], "ship_us": g["ship_us_max"]})

    li_max = bucketed_group_reduce(
        li.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["o_orderkey"],
        lambda df: df.groupby("o_orderkey", as_index=False)["ship_us"].max(),
    )
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
    j = hash_join(orders, li_max, on="o_orderkey")

    def late_flag(t: pa.Table) -> pa.Table:
        cut = pc.add(pc.cast(t["o_orderdate"], pa.int64()),
                     pa.scalar(30 * 86_400_000_000, pa.int64()))
        keep = pc.fill_null(pc.greater(t["ship_us"], cut), False)
        return pa.table({"o_orderpriority": t["o_orderpriority"].filter(keep)})

    flagged = j.map_batches(late_flag, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_sums(flagged, ["o_orderpriority"], {}, "n", reduce="driver").to_pandas()
    return _i64(out.sort_values("o_orderpriority", ignore_index=True), ["n"])


SQL_ORDER_PRIORITY_CHECK = """
SELECT o_orderpriority, COUNT(*) AS n
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY 1 ORDER BY 1
"""


def q_small_quantity_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q17 shape (join back to a correlated aggregate): revenue from
    lineitems whose quantity is below 20% of their part's average quantity.
    Per-part (count, Σqty) pre-aggregates once, the fact joins BACK to its
    own aggregate (big-big hash join — parts scale with the catalog), and
    the threshold test is the integer cross-multiplied form
    ``5·qty·cnt < Σqty`` so no float-boundary tie can flip a row."""
    from ..functions.relational import hash_join

    li = _t(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])
    s = grouped_sums(
        li.map_batches(
            lambda t: pa.table({"l_partkey": t["l_partkey"], "q": t["l_quantity"]}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["l_partkey"], {"sq": "q"}, "cnt",
    )
    j = hash_join(li, s, on="l_partkey")

    def keep(t: pa.Table) -> pa.Table:
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        cnt = t["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
        sq = t["sq"].to_numpy(zero_copy_only=False)
        m = 5.0 * qty * cnt < sq
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
        return pa.table({"revenue": [float(price.sum())], "n_rows": [int(m.sum())]})

    parts = j.map_batches(keep, batch_format="pyarrow").to_pandas()
    out = pd.DataFrame({
        "revenue": [_rd(float(parts["revenue"].sum()), 2)],
        "n_rows": [int(parts["n_rows"].sum())],
    })
    return _i64(out, ["n_rows"])


SQL_SMALL_QUANTITY_REVENUE = """
WITH s AS (
  SELECT l_partkey, COUNT(*) AS cnt, SUM(l_quantity) AS sq
  FROM lineitem GROUP BY 1)
SELECT ROUND(SUM(l.l_extendedprice), 2) AS revenue, COUNT(*) AS n_rows
FROM lineitem l JOIN s ON l.l_partkey = s.l_partkey
WHERE 5 * l.l_quantity * s.cnt < s.sq
"""


def q_rfm_segments(sf_dir: str) -> pd.DataFrame:
    """RFM customer segmentation (recency / frequency / monetary quintiles)
    — the classic marketing cube, built distributed: ONE bucketed reduce
    collapses purchases to per-user (last_us, freq, monetary-cents) rows;
    each metric then gets an EXACT global NTILE(5) via the distributed
    row-number construction (``functions/rank.py``), and the three ranked
    user tables re-join on the user key.  Monetary is summed in integer
    cents so rank order is bit-stable; all tile orders carry the user id as
    tie-break (SQL mirrors the same ORDER BY)."""
    from ..functions.rank import global_row_number, ntile_of
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts", "value"],
            filter=pads.field("event_type") == "purchase")

    def part(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0), ndigits=0, round_mode="half_towards_infinity"), pa.int64())
        g = pa.table({"user_id": t["user_id"], "us": us, "c": cents}).group_by(
            ["user_id"]).aggregate([("us", "max"), ("c", "sum"), ([], "count_all")])
        return pa.table({"user_id": g["user_id"], "last_us": g["us_max"],
                         "mon_c": g["c_sum"], "freq": pc.cast(g["count_all"], pa.int64())})

    users = bucketed_group_reduce(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"],
        lambda df: df.groupby("user_id", as_index=False).agg(
            last_us=("last_us", "max"), mon_c=("mon_c", "sum"), freq=("freq", "sum")),
    ).materialize()

    n_users = users.count()

    # ALL THREE metrics rank in ONE global_row_number pass: melt to
    # (user, metric, value) and rank on the packed key metric·2⁵⁵ + value —
    # 2⁵⁵ exceeds any metric's value range, so rows order by (metric, value)
    # and each metric occupies one contiguous rn span of exactly n_users,
    # making the per-metric rank rn − metric·n_users.  One sort exchange
    # instead of three (each with its own sampling + counting pre-pass).
    C = 1 << 55

    def melt(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks()
        n = t.num_rows
        out_uid, out_metric, out_packed = [], [], []
        for mid, key in enumerate(["last_us", "freq", "mon_c"]):
            v = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
            out_uid.append(uid)
            out_metric.append(pa.nulls(n, pa.int64()).fill_null(mid))
            out_packed.append(pa.array(mid * C + v))
        return pa.table({"user_id": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_uid]),
                         "metric": pa.concat_arrays(out_metric),
                         "packed": pa.concat_arrays(out_packed)})

    melted = users.map_batches(melt, batch_format="pyarrow", zero_copy_batch=True)
    ranked, _total = global_row_number(melted, "packed", ["user_id"])

    def to_tile(t: pa.Table) -> pa.Table:
        rn = t["rn"].to_numpy(zero_copy_only=False)
        mid = t["metric"].to_numpy(zero_copy_only=False)
        local = rn - mid * n_users
        return pa.table({"user_id": t["user_id"], "metric": t["metric"],
                         "tile": pa.array(ntile_of(local, n_users, 5))})

    tagged = ranked.map_batches(to_tile, batch_format="pyarrow", zero_copy_batch=True)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        w = df.pivot_table(index="user_id", columns="metric", values="tile",
                           aggfunc="first").reset_index()
        g = w.groupby([0, 1, 2], as_index=False).size()
        return g.rename(columns={0: "r_tile", 1: "f_tile", 2: "m_tile", "size": "n"})

    cells = bucketed_group_reduce(tagged, ["user_id"], fold)
    out = grouped_sums(cells, ["r_tile", "f_tile", "m_tile"], {"n": "n"},
                       reduce="driver").to_pandas()
    return _i64(out, ["r_tile", "f_tile", "m_tile", "n"])


SQL_RFM_SEGMENTS = """
WITH p AS (
  SELECT user_id, MAX(EPOCH_US(ts)) AS last_us, COUNT(*) AS freq,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS mon_c
  FROM events WHERE event_type = 'purchase' GROUP BY 1),
r AS (
  SELECT user_id,
         NTILE(5) OVER (ORDER BY last_us, user_id) AS r_tile,
         NTILE(5) OVER (ORDER BY freq, user_id) AS f_tile,
         NTILE(5) OVER (ORDER BY mon_c, user_id) AS m_tile
  FROM p)
SELECT r_tile, f_tile, m_tile, COUNT(*) AS n
FROM r GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def q_frequent_triples(sf_dir: str) -> pd.DataFrame:
    """A-priori frequent-itemset mining, 3-itemsets with support ≥ 2:
    frequent pairs first (grouped reduce over per-order pair combiners),
    then the downward-closure prune — the packed frequent-pair key set
    broadcasts once and per-order triple generation keeps a candidate only
    if ALL THREE sub-pairs are frequent — so the triple blow-up is bounded
    by the (tiny) frequent-pair structure, not order-width³.  The SQL
    oracle runs the unpruned 3-way self-join; results must agree exactly."""
    import itertools

    import ray

    from ..functions.relational import bucketed_group_reduce

    SUPPORT = 2
    ds = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        m = df.merge(df, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        out = m.groupby(["l_partkey_x", "l_partkey_y"], as_index=False).size()
        return out.rename(columns={"l_partkey_x": "a", "l_partkey_y": "b", "size": "n"})

    pairs = grouped_sums(
        bucketed_group_reduce(ds, ["l_orderkey"], pair_partial), ["a", "b"], {"n": "n"}
    )
    freq = pairs.filter(expr=f"n >= {SUPPORT}").to_pandas()
    M = 1 << 32  # part keys < 2³², so a·M + b is collision-free
    fp = np.sort((freq["a"].to_numpy(dtype=np.int64) * M + freq["b"].to_numpy(dtype=np.int64)))
    fp_ref = ray.put(fp)

    def triple_partial(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        keys = _ray.get(fp_ref) if not isinstance(fp_ref, np.ndarray) else fp_ref
        df = df.drop_duplicates().sort_values(["l_orderkey", "l_partkey"])
        out = []
        for _, g in df.groupby("l_orderkey"):
            p = g["l_partkey"].to_numpy(dtype=np.int64)
            if len(p) < 3:
                continue
            # prune items not in any frequent pair within this order first
            ii, jj = np.triu_indices(len(p), k=1)
            pk = p[ii] * M + p[jj]
            ok = np.isin(pk, keys, assume_unique=False)
            if ok.sum() < 3:
                continue
            okset = set(pk[ok].tolist())
            for x, y, z in itertools.combinations(np.unique(p).tolist(), 3):
                if x * M + y in okset and x * M + z in okset and y * M + z in okset:
                    out.append((x, y, z))
        if not out:
            return pd.DataFrame({"p_a": pd.Series([], dtype="int64"),
                                 "p_b": pd.Series([], dtype="int64"),
                                 "p_c": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        t = pd.DataFrame(out, columns=["p_a", "p_b", "p_c"])
        return t.groupby(["p_a", "p_b", "p_c"], as_index=False).size().rename(columns={"size": "n"})

    tri = grouped_sums(
        bucketed_group_reduce(ds, ["l_orderkey"], triple_partial),
        ["p_a", "p_b", "p_c"], {"n": "n"},
    )
    out = tri.filter(expr=f"n >= {SUPPORT}").to_pandas()
    if out.empty:  # sparse catalogs can have no support-2 triple at all
        out = pd.DataFrame({c: pd.Series([], dtype="int64")
                            for c in ["p_a", "p_b", "p_c", "n"]})
    out = out.sort_values(["p_a", "p_b", "p_c"], ignore_index=True)
    return _i64(out, ["p_a", "p_b", "p_c", "n"])


SQL_FREQUENT_TRIPLES = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
t AS (
  SELECT a.l_partkey AS p_a, b.l_partkey AS p_b, c.l_partkey AS p_c, COUNT(*) AS n
  FROM d a
  JOIN d b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  JOIN d c ON b.l_orderkey = c.l_orderkey AND b.l_partkey < c.l_partkey
  GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2)
SELECT p_a, p_b, p_c, n FROM t ORDER BY 1, 2, 3
"""


def q_bounce_rate(sf_dir: str) -> pd.DataFrame:
    """Session-quality rollup over the gap-sessionizer (ST6 watermark
    analogue): bounce = single-event session.  Sessions stream out of
    ``windows.sessionize`` and collapse to scalar partials per batch — the
    driver sees four numbers."""
    from ..functions.windows import sessionize

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id"])
    sess = sessionize(ds, gap_seconds=1800.0)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "sessions": [len(df)],
            "bounces": [int((df["n_events"] == 1).sum())],
            "events": [int(df["n_events"].sum())],
        })

    p = sess.map_batches(part, batch_format="pandas").to_pandas()
    sessions, bounces, events = int(p["sessions"].sum()), int(p["bounces"].sum()), int(p["events"].sum())
    out = pd.DataFrame({
        "n_sessions": [sessions], "n_bounces": [bounces],
        "bounce_rate": [_rd(bounces / sessions, 6)],
        "avg_events": [_rd(events / sessions, 6)],
    })
    return _i64(out, ["n_sessions", "n_bounces"])


SQL_BOUNCE_RATE = """
WITH ordered AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800.0
              THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM ordered
), agg AS (SELECT user_id, session_id, COUNT(*) AS n_events FROM sess GROUP BY 1, 2)
SELECT COUNT(*) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
       ROUND(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 6) AS bounce_rate,
       ROUND(SUM(n_events) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_events
FROM agg
"""


def q_centroid_separation(sf_dir: str) -> pd.DataFrame:
    """Cluster-separation diagnostic (silhouette-lite): per label, the
    average euclidean distance to the OWN centroid vs the NEAREST other
    centroid.  Two streaming passes: (1) per-batch (label, Σx, n) scatter
    partials → k·d-float centroid matrix on the driver; (2) centroids
    broadcast, one gemm per batch gives every point's distance to all k
    centroids, per-label scalar partials reduce.  Points never shuffle."""
    ds = _t(sf_dir, "embeddings", ["vec_id", "label", "embedding"])

    def cent_partial(t: pa.Table) -> pa.Table:
        arr = t["embedding"].combine_chunks() if isinstance(t["embedding"], pa.ChunkedArray) else t["embedding"]
        mat = np.asarray(arr.flatten(), dtype=np.float64).reshape(len(t), -1)
        labels = np.asarray(t["label"].to_numpy(zero_copy_only=False), dtype=np.int64)
        uniq, codes = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), mat.shape[1]))
        np.add.at(sums, codes, mat)
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table({"label": pa.array(uniq), "n": pa.array(n),
                         "sums": pa.array(list(sums), type=pa.list_(pa.float64()))})

    parts = ds.map_batches(cent_partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    labels = sorted(parts["label"].unique())
    lab_idx = {l: i for i, l in enumerate(labels)}
    d = len(parts["sums"].iloc[0])
    sums = np.zeros((len(labels), d))
    cnt = np.zeros(len(labels), dtype=np.int64)
    for _, r in parts.iterrows():
        sums[lab_idx[r["label"]]] += np.asarray(r["sums"])
        cnt[lab_idx[r["label"]]] += r["n"]
    cent = sums / cnt[:, None]
    import ray

    cent_ref = ray.put((np.asarray(labels, dtype=np.int64), cent))

    def dist_partial(t: pa.Table, *, ref=cent_ref) -> pa.Table:
        labs, C = ray.get(ref) if not isinstance(ref, tuple) else ref
        arr = t["embedding"].combine_chunks() if isinstance(t["embedding"], pa.ChunkedArray) else t["embedding"]
        X = np.asarray(arr.flatten(), dtype=np.float64).reshape(len(t), -1)
        y = np.asarray(t["label"].to_numpy(zero_copy_only=False), dtype=np.int64)
        d2 = np.maximum(
            (X * X).sum(1)[:, None] + (C * C).sum(1)[None, :] - 2.0 * (X @ C.T), 0.0)
        dist = np.sqrt(d2)
        own_col = np.searchsorted(labs, y)
        d_own = dist[np.arange(len(X)), own_col]
        masked = dist.copy()
        masked[np.arange(len(X)), own_col] = np.inf
        d_other = masked.min(axis=1)
        g = pd.DataFrame({"label": y, "d_own": d_own, "d_other": d_other}).groupby(
            "label", as_index=False).agg(n=("d_own", "size"), so=("d_own", "sum"),
                                         sn=("d_other", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = ds.map_batches(dist_partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = agg.groupby("label", as_index=False).agg(
        n=("n", "sum"), so=("so", "sum"), sn=("sn", "sum"))
    out["avg_own"] = (out["so"] / out["n"]).pipe(_rd)
    out["avg_other"] = (out["sn"] / out["n"]).pipe(_rd)
    out = out.drop(columns=["so", "sn"]).sort_values("label", ignore_index=True)
    return _i64(out, ["label", "n"])


SQL_CENTROID_SEPARATION = """
WITH e AS (
  SELECT vec_id, CAST(label AS BIGINT) AS lab, CAST(embedding AS DOUBLE[]) AS emb
  FROM embeddings),
ex AS (SELECT lab, i AS dim, emb[i] AS v
       FROM e, unnest(generate_series(1, len(emb))) AS t(i)),
cd AS (SELECT lab, dim, AVG(v) AS c FROM ex GROUP BY 1, 2),
cent AS (SELECT lab, list(c ORDER BY dim) AS cvec FROM cd GROUP BY 1),
dists AS (
  SELECT p.vec_id, p.lab, c.lab AS clab, list_distance(p.emb, c.cvec) AS dd
  FROM e p CROSS JOIN cent c),
per AS (
  SELECT vec_id, lab,
         MIN(dd) FILTER (clab = lab) AS d_own,
         MIN(dd) FILTER (clab <> lab) AS d_other
  FROM dists GROUP BY 1, 2)
SELECT lab AS label, COUNT(*) AS n,
       ROUND(AVG(d_own), 6) AS avg_own, ROUND(AVG(d_other), 6) AS avg_other
FROM per GROUP BY 1 ORDER BY 1
"""


def ensure_curation_parquet(sf_dir: str) -> str:
    """Materialize the planted-redundancy curation corpus
    (sources/curation.py) in the shared oracle-artifact dir."""
    import os as _os

    from ..sources.curation import build_curation_table

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "curation.parquet"),
        lambda: build_curation_table(
            pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"])
        ),
    )


def q_curation_pipeline(sf_dir: str) -> pd.DataFrame:
    """END-TO-END curation pipeline (pipelines/curate.py): normalize →
    quality gate → content dedup → langid → Hive-partitioned sink, run for
    real (files written, then summarized from the run result) against the
    planted-redundancy corpus; the oracle replays every stage in SQL over
    the same parquet.  This checks the COMPOSITION — stage order, gate
    arithmetic, keep-min dedup semantics — not just each operator alone."""
    import os as _os
    import shutil as _shutil

    from .curate import CurateConfig, run_curate

    src = ensure_curation_parquet(sf_dir)
    out_dir = _os.path.join(_corpus_dir(sf_dir), "curate_out")
    _shutil.rmtree(out_dir, ignore_errors=True)  # fresh deterministic run
    res = run_curate(CurateConfig(input_path=src, output_dir=out_dir))
    out = pd.DataFrame(
        [(lang, n, w) for lang, (n, w) in sorted(res.per_lang.items())],
        columns=["lang_guess", "n_docs", "total_words"],
    )
    return _i64(out, ["n_docs", "total_words"])


SQL_CURATION_PIPELINE = f"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS ntext
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/curation.parquet')),
q AS (
  SELECT doc_id, ntext,
         len(string_split(ntext, ' ')) AS n_words,
         len(regexp_extract_all(ntext, '{STOPWORD_PATTERN}')) AS hits
  FROM norm),
f AS (SELECT * FROM q WHERE n_words >= 5 AND hits * 2 <= n_words * 1),
k AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(ntext) ORDER BY doc_id) AS rn FROM f)
  WHERE rn = 1),
l AS (
  SELECT CASE WHEN len(regexp_extract_all(ntext, '\\b(?:spark|query|vector)\\b'))
                   >= len(regexp_extract_all(ntext, '\\b(?:the|a|of)\\b'))
              THEN 'code' ELSE 'en' END AS lang_guess,
         n_words
  FROM k)
SELECT lang_guess, COUNT(*) AS n_docs, CAST(SUM(n_words) AS BIGINT) AS total_words
FROM l GROUP BY 1 ORDER BY 1
"""


def q_orders_growth_wow(sf_dir: str) -> pd.DataFrame:
    """Week-over-week growth report: one distributed weekly count, then the
    LAG/pct-change window on the |weeks|-bounded series (driver arithmetic,
    mirroring SQL ``LAG`` over present weeks)."""
    ds = _t(sf_dir, "orders", ["o_orderdate"])

    def wk(t: pa.Table) -> pa.Table:
        micros = pc.cast(t["o_orderdate"], pa.int64())
        return pa.table({"week_id": pc.divide(micros, pa.scalar(604_800_000_000, pa.int64()))})

    agg = grouped_sums(
        ds.map_batches(wk, batch_format="pyarrow", zero_copy_batch=True),
        ["week_id"], {}, "n",
    ).to_pandas().sort_values("week_id", ignore_index=True)
    prev = agg["n"].shift(1)
    agg["growth"] = ((agg["n"] - prev) / prev).pipe(_rd)
    return _i64(agg, ["week_id", "n"])


SQL_ORDERS_GROWTH_WOW = """
WITH w AS (
  SELECT EPOCH_US(o_orderdate) // 604800000000 AS week_id, COUNT(*) AS n
  FROM orders GROUP BY 1)
SELECT week_id, n,
       ROUND((n - LAG(n) OVER (ORDER BY week_id)) /
             CAST(LAG(n) OVER (ORDER BY week_id) AS DOUBLE), 6) AS growth
FROM w ORDER BY week_id
"""


def q_session_depth_histogram(sf_dir: str) -> pd.DataFrame:
    """Distribution of session depths (events per gap-session): sessions
    stream out of the sessionizer and collapse through one tiny grouped
    count on the depth."""
    from ..functions.windows import sessionize

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id"])
    sess = sessionize(ds, gap_seconds=1800.0)
    out = grouped_sums(
        sess.select_columns(["n_events"]), ["n_events"], {}, "n_sessions", reduce="driver"
    ).to_pandas()
    return _i64(out.sort_values("n_events", ignore_index=True), ["n_events", "n_sessions"])


SQL_SESSION_DEPTH_HISTOGRAM = """
WITH ordered AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800.0
              THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM ordered
), agg AS (SELECT user_id, session_id, COUNT(*) AS n_events FROM sess GROUP BY 1, 2)
SELECT n_events, COUNT(*) AS n_sessions FROM agg GROUP BY 1 ORDER BY 1
"""


def q_zipf_slope(sf_dir: str) -> pd.DataFrame:
    """Zipf exponent of the corpus token distribution: distributed term
    frequencies (per-batch postings combiner → one grouped exchange),
    deterministic top-500 by (freq desc, term), then the log-log OLS slope
    over the 500-point series on the driver — the standard corpus-health
    statistic (natural text ≈ −1)."""
    from ..functions.search import tokenize_terms

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    flat = docs.map_batches(
        lambda t: tokenize_terms(t, "text", "doc_id").select(["term", "tf"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    tc = grouped_sums(flat, ["term"], {"f": "tf"})
    top = topk(tc, ["f", "term"], [True, False], 500).to_pandas()
    top = top.sort_values(["f", "term"], ascending=[False, True], ignore_index=True)
    x = np.log(np.arange(1, len(top) + 1, dtype=np.float64))
    y = np.log(top["f"].to_numpy(dtype=np.float64))
    xc, yc = x - x.mean(), y - y.mean()
    slope = float((xc * yc).sum() / (xc * xc).sum())
    return pd.DataFrame({"n_ranks": pd.Series([len(top)], dtype="int64"),
                         "zipf_slope": [_rd(slope, 6)]})


SQL_ZIPF_SLOPE = """
WITH toks AS (
  SELECT UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS term FROM documents),
tc AS (SELECT term, COUNT(*) AS f FROM toks WHERE term <> '' GROUP BY 1),
top AS (
  SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, term) AS r FROM tc
  QUALIFY r <= 500)
SELECT COUNT(*) AS n_ranks, ROUND(regr_slope(ln(f), ln(r)), 6) AS zipf_slope FROM top
"""


def q_revenue_pareto(sf_dir: str) -> pd.DataFrame:
    """Pareto 80/20 check: the share of total order revenue held by the
    top-20% customers.  Fully distributed and exact: per-customer revenue
    in integer cents (one exchange), revenue-descending global rank via the
    MPP row-number construction (``functions/rank.py`` — negate the cents
    key), then scalar partials for the top-k sum; the driver folds four
    numbers.  Tie-break by custkey matches the SQL window exactly."""
    from ..functions.rank import global_row_number

    o = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0), ndigits=0, round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"o_custkey": t["o_custkey"], "rev_c": c})

    per_cust = grouped_sums(
        o.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        ["o_custkey"], {"rev_c": "rev_c"},
    ).map_batches(
        lambda t: t.append_column("neg_rev", pc.negate(t["rev_c"])),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()

    ranked, total = global_row_number(per_cust, "neg_rev", ["o_custkey"])
    k = int(np.ceil(0.2 * total))

    def part(t: pa.Table, *, k=k) -> pa.Table:
        rn = t["rn"].to_numpy(zero_copy_only=False)
        rev = t["rev_c"].to_numpy(zero_copy_only=False)
        return pa.table({"top_c": [int(rev[rn <= k].sum())], "all_c": [int(rev.sum())]})

    p = ranked.map_batches(part, batch_format="pyarrow").to_pandas()
    top_c, all_c = int(p["top_c"].sum()), int(p["all_c"].sum())
    return pd.DataFrame({
        "n_customers": pd.Series([total], dtype="int64"),
        "top_n": pd.Series([k], dtype="int64"),
        "top_share": [_rd(top_c / all_c, 6)],
    })


SQL_REVENUE_PARETO = """
WITH rc AS (
  SELECT o_custkey, SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_c
  FROM orders GROUP BY 1),
r AS (
  SELECT rev_c, ROW_NUMBER() OVER (ORDER BY rev_c DESC, o_custkey) AS rn,
         COUNT(*) OVER () AS total
  FROM rc)
SELECT MAX(total) AS n_customers,
       CAST(CEIL(0.2 * MAX(total)) AS BIGINT) AS top_n,
       ROUND(SUM(CASE WHEN rn <= CEIL(0.2 * total) THEN rev_c ELSE 0 END)
             / CAST(SUM(rev_c) AS DOUBLE), 6) AS top_share
FROM r
"""


def q_rolling_active_users(sf_dir: str) -> pd.DataFrame:
    """EXACT rolling 7-day distinct active users per day — the sliding
    DISTINCT no window function computes cheaply.  Trick: a user active on
    day d is "active" for every window ending in [d, d+6], so each user's
    merged activity intervals become ±1 diff events; the pipeline is
    (user, day) distinct partials → per-user interval merge (bucketed
    reduce; each user's days sort locally) → day-keyed diff-sum exchange →
    one cumulative sum over the |days|-bounded series on the driver.
    DISTINCT rows never cross a window boundary and no per-window set is
    ever materialized."""
    from ..functions.relational import bucketed_group_reduce

    W = 7
    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def part(t: pa.Table) -> pa.Table:
        micros = pc.cast(t["ts"], pa.int64())
        day = pc.divide(micros, pa.scalar(86_400_000_000, pa.int64()))
        g = pa.table({"user_id": t["user_id"], "d": day}).group_by(["user_id", "d"]).aggregate([])
        return g

    pairs = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)

    def to_diffs(df: pd.DataFrame) -> pd.DataFrame:
        # per user: merge [d, d+W-1] cover intervals, emit ±1 at the edges
        out_d, out_v = [], []
        for _, g in df.groupby("user_id"):
            days = np.unique(g["d"].to_numpy(dtype=np.int64))
            start = days[0]
            prev = days[0]
            for d in days[1:]:
                if d > prev + W - 1:  # gap: window runs [start, prev+W-1]
                    out_d += [start, prev + W]
                    out_v += [1, -1]
                    start = d
                prev = d
            out_d += [start, prev + W]
            out_v += [1, -1]
        return pd.DataFrame({"day_id": out_d, "v": out_v})

    diffs = bucketed_group_reduce(pairs, ["user_id"], to_diffs)
    agg = grouped_sums(diffs, ["day_id"], {"v": "v"}).to_pandas().sort_values(
        "day_id", ignore_index=True)
    days = np.arange(agg["day_id"].min(), agg["day_id"].max() + 1, dtype=np.int64)
    v = np.zeros(len(days), dtype=np.int64)
    v[agg["day_id"].to_numpy(dtype=np.int64) - days[0]] = agg["v"].to_numpy(dtype=np.int64)
    run = np.cumsum(v)
    keep = run > 0  # SQL GROUP BY only yields days with ≥1 active user
    out = pd.DataFrame({"day_id": days[keep], "active_users": run[keep]})
    return _i64(out.reset_index(drop=True), ["day_id", "active_users"])


SQL_ROLLING_ACTIVE_USERS = """
WITH days AS (
  SELECT DISTINCT user_id, EPOCH_US(ts) // 86400000000 AS d FROM events),
w AS (
  SELECT DISTINCT user_id, d + i AS day_id
  FROM days, UNNEST(range(0, 7)) AS t(i))
SELECT day_id, COUNT(DISTINCT user_id) AS active_users
FROM w GROUP BY 1 ORDER BY 1
"""


def q_churn_counts(sf_dir: str) -> pd.DataFrame:
    """Churn report: users whose LAST event is >30 days before the corpus
    high-watermark, per event source cohort (their FIRST event's type).
    One scan produces both per-user extremes (min/max + arg-min type via
    packed (ts, type-code) minimization); the watermark is a scalar fold."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_type"])
    types = sorted(grouped_sums(
        _t(sf_dir, "events", ["event_type"]), ["event_type"], {}, "c").to_pandas()["event_type"])
    code_of = {t: i for i, t in enumerate(types)}

    def part(t: pa.Table, *, codes=code_of) -> pa.Table:
        micros = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        code = t["event_type"].to_pandas().map(codes).to_numpy(dtype=np.int64)
        # pack (ts, tie-break code) so min() is the SQL arg-min with
        # deterministic type tie-break on equal timestamps
        packed = micros * 8 + code  # |types| ≤ 8
        df = pd.DataFrame({"user_id": t["user_id"].to_numpy(zero_copy_only=False),
                           "first_p": packed, "last_us": micros})
        g = df.groupby("user_id", as_index=False).agg(
            first_p=("first_p", "min"), last_us=("last_us", "max"))
        return pa.Table.from_pandas(g, preserve_index=False)

    per_user = bucketed_group_reduce(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"],
        lambda df: df.groupby("user_id", as_index=False).agg(
            first_p=("first_p", "min"), last_us=("last_us", "max")),
    ).materialize()
    watermark = int(per_user.max("last_us"))
    cutoff = watermark - 30 * 86_400_000_000

    def fold(df: pd.DataFrame, *, types=types) -> pd.DataFrame:
        first_type = pd.Series([types[c] for c in (df["first_p"] % 8)], index=df.index)
        churned = df["last_us"] < cutoff
        out = pd.DataFrame({"first_type": first_type, "churned": churned.astype(np.int64)})
        return out.groupby("first_type", as_index=False).agg(
            n_users=("churned", "size"), n_churned=("churned", "sum"))

    agg = per_user.map_batches(fold, batch_format="pandas").to_pandas()
    out = agg.groupby("first_type", as_index=False).agg(
        n_users=("n_users", "sum"), n_churned=("n_churned", "sum"))
    out["churn_rate"] = (out["n_churned"] / out["n_users"]).pipe(_rd)
    return _i64(out.sort_values("first_type", ignore_index=True), ["n_users", "n_churned"])


SQL_CHURN_COUNTS = """
WITH u AS (
  SELECT user_id,
         MIN(EPOCH_US(ts) * 8 + tc) AS first_p,
         MAX(EPOCH_US(ts)) AS last_us
  FROM (SELECT *, CAST(dense_rank() OVER (ORDER BY event_type) - 1 AS BIGINT) AS tc
        FROM events)
  GROUP BY 1),
wm AS (SELECT MAX(last_us) AS watermark FROM u),
t AS (SELECT DISTINCT event_type,
             CAST(dense_rank() OVER (ORDER BY event_type) - 1 AS BIGINT) AS tc
      FROM events)
SELECT t.event_type AS first_type,
       COUNT(*) AS n_users,
       CAST(SUM(CASE WHEN u.last_us < wm.watermark - 30 * 86400000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
       ROUND(SUM(CASE WHEN u.last_us < wm.watermark - 30 * 86400000000 THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS churn_rate
FROM u CROSS JOIN wm JOIN t ON u.first_p % 8 = t.tc
GROUP BY 1 ORDER BY 1
"""


def q_skyline_orders(sf_dir: str) -> pd.DataFrame:
    """2-D skyline (Pareto frontier): orders not dominated on
    (totalprice MAX, orderdate MIN) — dominance = other order has ≥ price
    AND ≤ date with at least one strict.  Distributed shape: each block
    computes its LOCAL skyline (sort by price desc, keep rows that strictly
    improve the running min date — vectorized cummin), so only per-block
    frontier rows reach the driver; the frontier-of-frontiers is computed
    the same way over that small union (skyline(A∪B) ⊆ skyline(A)∪skyline(B),
    the classic divide-and-conquer prune)."""
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderdate"])

    def skyline_core(c: pd.DataFrame) -> pd.DataFrame:
        # group equal prices: a row survives iff its date is strictly below
        # the min date over all STRICTLY higher prices, and is the min date
        # within its own price class (ties on both dims are all kept only if
        # identical rows — dominance requires one strict inequality)
        c = c.sort_values(["price_c", "date_us"], ascending=[False, True], kind="stable")
        price = c["price_c"].to_numpy()
        date = c["date_us"].to_numpy()
        if not len(c):
            return c
        run_min = np.minimum.accumulate(date)
        # min date among strictly-higher-price rows: shift run_min across
        # price-class boundaries
        new_class = np.r_[True, price[1:] != price[:-1]]
        class_id = np.cumsum(new_class) - 1
        # run_min at the END of each class, then per-row min over previous classes
        last_idx_of_class = np.r_[np.nonzero(new_class)[0][1:] - 1, len(price) - 1]
        class_min = run_min[last_idx_of_class]
        prev_class_min = np.r_[np.int64(np.iinfo(np.int64).max), class_min[:-1]]
        prior_min = prev_class_min[class_id]  # min date over strictly higher prices
        # within the class, min date wins; equal (price, date) duplicates all survive
        class_date_min = c.groupby(class_id)["date_us"].transform("min").to_numpy()
        keep = (date < prior_min) & (date == class_date_min)
        return c[keep]

    def local_skyline(df: pd.DataFrame) -> pd.DataFrame:
        return skyline_core(pd.DataFrame({
            "o_orderkey": df["o_orderkey"],
            "price_c": (df["o_totalprice"] * 100).round().astype(np.int64),
            "date_us": df["o_orderdate"].astype("int64"),
        }))

    parts = ds.map_batches(local_skyline, batch_format="pandas").to_pandas()
    sky = skyline_core(parts)
    out = pd.DataFrame({
        "o_orderkey": sky["o_orderkey"].to_numpy(),
        "o_totalprice": (sky["price_c"] / 100.0).pipe(_rd, 2),
        "o_orderdate": pd.to_datetime(sky["date_us"], unit="us"),
    }).sort_values("o_orderkey", ignore_index=True)
    return _i64(out, ["o_orderkey"])


SQL_SKYLINE_ORDERS = """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice, o_orderdate
FROM orders o
WHERE NOT EXISTS (
  SELECT 1 FROM orders x
  WHERE x.o_totalprice >= o.o_totalprice AND x.o_orderdate <= o.o_orderdate
    AND (x.o_totalprice > o.o_totalprice OR x.o_orderdate < o.o_orderdate))
ORDER BY o_orderkey
"""


def q_longest_streaks(sf_dir: str) -> pd.DataFrame:
    """Gaps-and-islands: each user's longest run of CONSECUTIVE active
    days, global top-10 (streak desc, user asc).  Hash exchange on the
    user; inside a bucket the island lengths fall out of one vectorized
    diff over the sorted distinct days (no d − ROW_NUMBER() trick needed
    off-SQL); only (user, best_streak) partials leave the bucket."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def part(t: pa.Table) -> pa.Table:
        micros = pc.cast(t["ts"], pa.int64())
        day = pc.divide(micros, pa.scalar(86_400_000_000, pa.int64()))
        return pa.table({"user_id": t["user_id"], "d": day}).group_by(
            ["user_id", "d"]).aggregate([])

    def best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates().sort_values(["user_id", "d"])
        u = df["user_id"].to_numpy()
        d = df["d"].to_numpy(dtype=np.int64)
        brk = np.r_[True, (u[1:] != u[:-1]) | (d[1:] != d[:-1] + 1)]
        isl = np.cumsum(brk) - 1
        g = pd.DataFrame({"user_id": u, "isl": isl}).groupby(
            ["user_id", "isl"], as_index=False).size()
        return g.groupby("user_id", as_index=False)["size"].max().rename(
            columns={"size": "streak"})

    per_user = bucketed_group_reduce(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"], best,
    )

    def neg(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"],
                         "streak": pc.cast(t["streak"], pa.int64())})

    out = topk(per_user.map_batches(neg, batch_format="pyarrow"),
               ["streak", "user_id"], [True, False], 10).to_pandas()
    return _i64(out, ["user_id", "streak"])


SQL_LONGEST_STREAKS = """
WITH days AS (
  SELECT DISTINCT user_id, EPOCH_US(ts) // 86400000000 AS d FROM events),
isl AS (
  SELECT user_id, d,
         d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS grp
  FROM days),
runs AS (SELECT user_id, COUNT(*) AS len FROM isl GROUP BY user_id, grp),
best AS (SELECT user_id, MAX(len) AS streak FROM runs GROUP BY 1)
SELECT user_id, streak FROM best
ORDER BY streak DESC, user_id LIMIT 10
"""


def q_custdist(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q13 shape (customer distribution): histogram of per-customer
    order counts INCLUDING zero-order customers — per-custkey pre-agg, LEFT
    OUTER hash join against the full customer list, then a tiny grouped
    count on the count."""
    from ..functions.relational import hash_join

    cust = _t(sf_dir, "customer", ["c_custkey"])
    per_cust = grouped_sums(_t(sf_dir, "orders", ["o_custkey"]), ["o_custkey"], {}, "__n")
    j = hash_join(cust, per_cust, on="c_custkey", right_on="o_custkey", how="left_outer")
    counts = j.map_batches(
        lambda t: pa.table({"c_count": pc.fill_null(pc.cast(t["__n"], pa.int64()), 0)}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    out = grouped_sums(counts, ["c_count"], {}, "custdist", reduce="driver").to_pandas()
    out = out.sort_values(["custdist", "c_count"], ascending=[False, False], ignore_index=True)
    return _i64(out, ["c_count", "custdist"])


SQL_CUSTDIST = """
WITH c AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY 1)
SELECT c_count, COUNT(*) AS custdist
FROM c GROUP BY 1
ORDER BY custdist DESC, c_count DESC
"""


def q_total_active_time(sf_dir: str) -> pd.DataFrame:
    """Total in-session active time per user (Σ session span over
    30-min-gap sessions), global top-10 — one user-keyed exchange; the
    session segmentation and span sums are one vectorized diff inside the
    bucket; only (user, active_s) partials leave it."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def spans(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"])
        u = df["user_id"].to_numpy()
        us = df["ts"].astype("int64").to_numpy()
        new = np.r_[True, (u[1:] != u[:-1]) | (us[1:] - us[:-1] > 1_800_000_000)]
        sess = np.cumsum(new) - 1
        g = pd.DataFrame({"user_id": u, "sess": sess, "us": us}).groupby(
            ["user_id", "sess"], as_index=False).agg(lo=("us", "min"), hi=("us", "max"))
        g["span"] = g["hi"] - g["lo"]
        return g.groupby("user_id", as_index=False)["span"].sum()

    per_user = bucketed_group_reduce(ds, ["user_id"], spans)

    def to_secs(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"],
                         "active_s": pc.divide(pc.cast(t["span"], pa.int64()),
                                               pa.scalar(1_000_000, pa.int64()))})

    out = topk(per_user.map_batches(to_secs, batch_format="pyarrow"),
               ["active_s", "user_id"], [True, False], 10).to_pandas()
    return _i64(out, ["user_id", "active_s"])


SQL_TOTAL_ACTIVE_TIME = """
WITH ordered AS (
  SELECT user_id, ts, EPOCH_US(ts) AS us,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR EPOCH_US(ts) - EPOCH_US(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, us,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
), spans AS (
  SELECT user_id, session_id, MAX(us) - MIN(us) AS span
  FROM sess GROUP BY 1, 2)
SELECT user_id, CAST(SUM(span) // 1000000 AS BIGINT) AS active_s
FROM spans GROUP BY 1
ORDER BY active_s DESC, user_id LIMIT 10
"""


def q_winsorized_mean_per_type(sf_dir: str) -> pd.DataFrame:
    """Robust winsorized mean per group (values clipped to [p5, p95] before
    averaging — the outlier-resistant feature-scaling statistic): derived
    ENTIRELY from the one-pass mergeable cent histogram — quantiles, clip,
    and mean are integer arithmetic over (bin, count), no second scan (the
    SQL oracle scans twice)."""
    from ..functions.sketch import grouped_histogram_fixedpoint, quantile_disc_from_counts

    hist = grouped_histogram_fixedpoint(
        _t(sf_dir, "events", ["event_type", "value"]), "event_type", "value", scale=100
    )
    rows = []
    for etype, g in hist.groupby("event_type", sort=True):
        mask = pd.notna(g["bin"])
        b = g["bin"].to_numpy()[mask].astype(np.int64)
        c = g["n"].to_numpy()[mask].astype(np.int64)
        order = np.argsort(b)
        b, c = b[order], c[order]
        n = int(c.sum())
        lo = quantile_disc_from_counts(b, c, 0.05)
        hi = quantile_disc_from_counts(b, c, 0.95)
        clipped = np.clip(b, lo, hi)
        wmean = _rd(float((clipped * c).sum()) / n / 100.0, 6)
        rows.append((etype, wmean, n))
    out = pd.DataFrame(rows, columns=["event_type", "wmean", "n"])
    return _i64(out, ["n"])


SQL_WINSORIZED_MEAN_PER_TYPE = """
WITH q AS (
  SELECT event_type,
         CAST(ROUND(quantile_disc(value, 0.05) * 100) AS BIGINT) AS lo,
         CAST(ROUND(quantile_disc(value, 0.95) * 100) AS BIGINT) AS hi
  FROM events GROUP BY 1)
SELECT e.event_type,
       ROUND(SUM(LEAST(GREATEST(CAST(ROUND(value * 100) AS BIGINT), lo), hi))
             / CAST(COUNT(*) AS DOUBLE) / 100.0, 6) AS wmean,
       COUNT(*) AS n
FROM events e JOIN q USING (event_type)
GROUP BY 1 ORDER BY 1
"""


def q_filter_attribution(sf_dir: str) -> pd.DataFrame:
    """Filter-funnel attribution over the curation corpus: which GATE (or
    combination) would drop each document — too-short (bit 1), stopword-
    heavy (bit 2), duplicate-content (bit 4) — as a count per failure
    bitmask.  The dup bit needs global state: the keep-min fingerprint
    reduce runs once, its (output-sized) keeper id set broadcasts back, and
    the mask histogram is then per-batch counters; each gate is attributed
    INDEPENDENTLY (unlike the curate pipeline, which gates sequentially)."""
    import ray

    from ..functions.relational import bucketed_group_reduce
    from ..functions.scrub import normalize_text
    from ..functions.text import md5_hex, n_words, stopword_hits

    src = ensure_curation_parquet(sf_dir)
    ds = rd.read_parquet(src, columns=["doc_id", "text"])

    def fp_partial(t: pa.Table) -> pa.Table:
        norm = normalize_text(t["text"])
        g = pa.table({"fp": md5_hex(norm), "doc_id": t["doc_id"]}).group_by(["fp"]).aggregate(
            [("doc_id", "min")])
        return pa.table({"fp": g["fp"], "keeper": g["doc_id_min"]})

    keepers = bucketed_group_reduce(
        ds.map_batches(fp_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["fp"],
        lambda df: df.groupby("fp", as_index=False)["keeper"].min(),
    ).to_pandas()
    keep_ref = ray.put(np.sort(keepers["keeper"].to_numpy(dtype=np.int64)))

    def masks(t: pa.Table, *, ref=keep_ref) -> pa.Table:
        keep = ray.get(ref) if not isinstance(ref, np.ndarray) else ref
        norm = normalize_text(t["text"])
        nw = pc.cast(n_words(norm), pa.int64()).to_numpy(zero_copy_only=False)
        hits = stopword_hits(norm).to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        m = (nw < 5).astype(np.int64)
        m += 2 * (2 * hits > nw).astype(np.int64)
        m += 4 * (~np.isin(ids, keep)).astype(np.int64)
        u, c = np.unique(m, return_counts=True)
        return pa.table({"fail_mask": pa.array(u), "n": pa.array(c.astype(np.int64))})

    agg = grouped_sums(
        ds.map_batches(masks, batch_format="pyarrow", zero_copy_batch=True),
        ["fail_mask"], {"n": "n"}, reduce="driver",
    ).to_pandas()
    return _i64(agg.sort_values("fail_mask", ignore_index=True), ["fail_mask", "n"])


SQL_FILTER_ATTRIBUTION = f"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/curation.parquet')),
q AS (
  SELECT doc_id, nt, len(string_split(nt, ' ')) AS nw,
         len(regexp_extract_all(nt, '{STOPWORD_PATTERN}')) AS h
  FROM norm),
d AS (
  SELECT *, CASE WHEN ROW_NUMBER() OVER (PARTITION BY md5(nt) ORDER BY doc_id) > 1
                 THEN 1 ELSE 0 END AS dup
  FROM q)
SELECT (CASE WHEN nw < 5 THEN 1 ELSE 0 END)
       + 2 * (CASE WHEN 2 * h > nw THEN 1 ELSE 0 END)
       + 4 * dup AS fail_mask,
       COUNT(*) AS n
FROM d GROUP BY 1 ORDER BY 1
"""


def q_embedding_quantization_error(sf_dir: str) -> pd.DataFrame:
    """Int8 symmetric quantization error audit (the compression every
    large-scale vector store applies): per vector, scale = max|x|, q =
    round(x·127/scale), reconstruction = q·scale/127; report per-label mean
    squared error and mean scale.  Pure per-batch gemm-free numpy over the
    zero-copy matrix view + scalar label partials — nothing shuffles."""
    ds = _t(sf_dir, "embeddings", ["label", "embedding"])

    def part(t: pa.Table) -> pa.Table:
        arr = t["embedding"].combine_chunks() if isinstance(t["embedding"], pa.ChunkedArray) else t["embedding"]
        X = np.asarray(arr.flatten(), dtype=np.float64).reshape(len(t), -1)
        y = np.asarray(t["label"].to_numpy(zero_copy_only=False), dtype=np.int64)
        scale = np.abs(X).max(axis=1)
        safe = np.where(scale == 0, 1.0, scale)
        q = _rd(X * (127.0 / safe[:, None]), 0)
        recon = q * (safe[:, None] / 127.0)
        mse = ((X - recon) ** 2).mean(axis=1)
        df = pd.DataFrame({"label": y, "mse": mse, "scale": scale}).groupby(
            "label", as_index=False).agg(n=("mse", "size"), sm=("mse", "sum"),
                                         ss=("scale", "sum"))
        return pa.Table.from_pandas(df, preserve_index=False)

    agg = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = agg.groupby("label", as_index=False).agg(
        n=("n", "sum"), sm=("sm", "sum"), ss=("ss", "sum"))
    out["mean_mse"] = (out["sm"] / out["n"]).pipe(_rd, 9)
    out["mean_scale"] = (out["ss"] / out["n"]).pipe(_rd)
    out = out.drop(columns=["sm", "ss"]).sort_values("label", ignore_index=True)
    return _i64(out, ["label", "n"])


SQL_EMBEDDING_QUANTIZATION_ERROR = """
WITH e AS (
  SELECT CAST(label AS BIGINT) AS label, CAST(embedding AS DOUBLE[]) AS emb
  FROM embeddings),
s AS (
  SELECT label, emb,
         GREATEST(list_max(list_transform(emb, x -> abs(x))), 0) AS scale
  FROM e),
m AS (
  SELECT label, scale,
         list_sum(list_transform(emb,
             x -> pow(x - ROUND(x * 127.0 / (CASE WHEN scale = 0 THEN 1 ELSE scale END))
                          * (CASE WHEN scale = 0 THEN 1 ELSE scale END) / 127.0, 2)))
           / len(emb) AS mse
  FROM s)
SELECT label, COUNT(*) AS n, ROUND(AVG(mse), 9) AS mean_mse,
       ROUND(AVG(scale), 6) AS mean_scale
FROM m GROUP BY 1 ORDER BY 1
"""


def q_weighted_median_price(sf_dir: str) -> pd.DataFrame:
    """WEIGHTED median (by quantity) of the extended price per return flag —
    the weighted-quantile operator plain SQL lacks, via TWO-PHASE
    refinement (the iterative distributed-quantile construction): a coarse
    $100-bucket weight histogram locates each key's half-weight bucket,
    then a second filtered pass builds the exact cent histogram of ONLY
    that bucket.  Prices are near-unique, so a single-pass cent histogram
    would be ~|rows| on the driver; this keeps driver state at
    keys × coarse-buckets + keys × one-bucket-of-cents.  EXACT — the
    oracle mirrors it with a cumulative-weight window."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice", "l_quantity"]).materialize()
    COARSE = 10_000  # $100 buckets — prices are near-unique, so a raw cent
    # histogram is ~|rows| and must never reach the driver; this two-phase
    # refinement keeps driver state at (keys × coarse buckets), then
    # (keys × cents within ONE bucket)

    def coarse_part(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0), ndigits=0, round_mode="half_towards_infinity"), pa.int64())
        cb = pc.divide(cents, pa.scalar(COARSE, pa.int64()))
        g = pa.table({"k": t["l_returnflag"], "cb": cb,
                      "w": pc.cast(t["l_quantity"], pa.int64())}).group_by(
            ["k", "cb"]).aggregate([("w", "sum")])
        return pa.table({"k": g["k"], "cb": g["cb"], "w": g["w_sum"]})

    coarse = bucketed_group_reduce(
        ds.map_batches(coarse_part, batch_format="pyarrow", zero_copy_batch=True),
        ["k", "cb"],
        lambda df: df.groupby(["k", "cb"], as_index=False)["w"].sum(),
    ).to_pandas()

    # phase-1 walk: locate each key's half-weight coarse bucket + the
    # cumulative weight strictly before it
    target: dict[str, tuple[int, int, int]] = {}
    for k, g in coarse.groupby("k", sort=True):
        g = g.sort_values("cb")
        cum = g["w"].cumsum().to_numpy()
        total = int(cum[-1])
        half = (total + 1) // 2
        i = int(np.searchsorted(cum, half))
        before = int(cum[i - 1]) if i else 0
        target[k] = (int(g["cb"].iloc[i]), before, total)

    # phase 2: exact cent histogram of ONLY each key's target bucket
    def fine_part(t: pa.Table, *, tgt=target) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0), ndigits=0, round_mode="half_towards_infinity"), pa.int64())
        df = pd.DataFrame({"k": t["l_returnflag"].to_numpy(zero_copy_only=False),
                           "bin": cents.to_numpy(zero_copy_only=False),
                           "w": t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)})
        df["cb"] = df["bin"] // COARSE
        want = df["k"].map({k: v[0] for k, v in tgt.items()}).to_numpy()
        df = df[df["cb"].to_numpy() == want]
        g = df.groupby(["k", "bin"], as_index=False)["w"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    fine = ds.map_batches(fine_part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    fine = fine.groupby(["k", "bin"], as_index=False)["w"].sum()
    rows = []
    for k, g in fine.groupby("k", sort=True):
        cb, before, total = target[k]
        g = g.sort_values("bin")
        cum = before + g["w"].cumsum().to_numpy()
        half = (total + 1) // 2
        med = int(g["bin"].to_numpy()[np.searchsorted(cum, half)])
        rows.append((k, _rd(med / 100.0, 2), total))
    out = pd.DataFrame(rows, columns=["l_returnflag", "wmedian_price", "total_qty"])
    return _i64(out, ["total_qty"])


SQL_WEIGHTED_MEDIAN_PRICE = """
WITH c AS (
  SELECT l_returnflag AS k, CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS bin,
         SUM(CAST(l_quantity AS BIGINT)) AS w
  FROM lineitem GROUP BY 1, 2),
cw AS (
  SELECT k, bin, w,
         SUM(w) OVER (PARTITION BY k ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(w) OVER (PARTITION BY k) AS total
  FROM c)
SELECT k AS l_returnflag,
       ROUND(MIN(bin) FILTER (cum >= (total + 1) // 2) / 100.0, 2) AS wmedian_price,
       CAST(MAX(total) AS BIGINT) AS total_qty
FROM cw GROUP BY k ORDER BY k
"""


def q_ttr_per_source(sf_dir: str) -> pd.DataFrame:
    """Type-token ratio (lexical diversity) per source: per-doc
    distinct-words / words, averaged per source.  A document is whole
    within its batch, so both counts come out of the ONE per-batch
    tokenize (distinct via the same grouped postings kernel); only
    (source, Σttr, n_docs) scalar partials reduce."""
    from ..functions.search import TOKEN_SPLIT

    docs = _t(sf_dir, "documents", ["source", "text"])

    def part(t: pa.Table) -> pa.Table:
        words = pc.split_pattern_regex(pc.utf8_lower(t["text"]), TOKEN_SPLIT)
        words = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        parents = pc.list_parent_indices(words)
        flat = pa.table({"i": parents, "term": words.flatten()})
        flat = flat.filter(pc.not_equal(flat["term"], ""))
        df = flat.to_pandas()
        tok = df.groupby("i").size()
        typ = df.drop_duplicates().groupby("i").size()
        src = t["source"].to_pandas()
        ttr = (typ / tok).reindex(tok.index)
        g = pd.DataFrame({"source": src.iloc[tok.index].to_numpy(), "ttr": ttr.to_numpy()})
        out = g.groupby("source", as_index=False).agg(s=("ttr", "sum"), n_docs=("ttr", "size"))
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = docs.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = agg.groupby("source", as_index=False).agg(s=("s", "sum"), n_docs=("n_docs", "sum"))
    out["avg_ttr"] = (out["s"] / out["n_docs"]).pipe(_rd)
    out = out.drop(columns=["s"]).sort_values("source", ignore_index=True)
    return _i64(out, ["n_docs"])


SQL_TTR_PER_SOURCE = """
WITH d AS (
  SELECT source,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws
  FROM documents),
t AS (SELECT source,
             len(list_distinct(ws)) / CAST(len(ws) AS DOUBLE) AS ttr
      FROM d WHERE len(ws) > 0)
SELECT source, COUNT(*) AS n_docs, ROUND(AVG(ttr), 6) AS avg_ttr
FROM t GROUP BY 1 ORDER BY 1
"""


def q_session_conversion_rate(sf_dir: str) -> pd.DataFrame:
    """Within-session conversion: of sessions containing a view, how many
    also contain a purchase.  Per-user bucket does the gap segmentation and
    per-session flag ORs in one vectorized pass; only scalar partials leave
    the bucket."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_type"])

    def flags(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"])
        u = df["user_id"].to_numpy()
        us = df["ts"].astype("int64").to_numpy()
        new = np.r_[True, (u[1:] != u[:-1]) | (us[1:] - us[:-1] > 1_800_000_000)]
        sess = np.cumsum(new) - 1
        et = df["event_type"].to_numpy()
        g = pd.DataFrame({"sess": sess,
                          "v": (et == "view").astype(np.int64),
                          "p": (et == "purchase").astype(np.int64)}).groupby(
            "sess", as_index=False).agg(v=("v", "max"), p=("p", "max"))
        return pd.DataFrame({
            "n_sessions": [len(g)],
            "with_view": [int(g["v"].sum())],
            "converted": [int((g["v"] & g["p"]).sum())],
        })

    p = bucketed_group_reduce(ds, ["user_id"], flags).to_pandas()
    n, wv, cv = int(p["n_sessions"].sum()), int(p["with_view"].sum()), int(p["converted"].sum())
    out = pd.DataFrame({
        "n_sessions": [n], "with_view": [wv], "converted": [cv],
        "conversion_rate": [_rd(cv / wv, 6) if wv else np.nan],
    })
    return _i64(out, ["n_sessions", "with_view", "converted"])


SQL_SESSION_CONVERSION_RATE = """
WITH ordered AS (
  SELECT user_id, ts, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR EPOCH_US(ts) - EPOCH_US(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, event_type,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
), f AS (
  SELECT user_id, session_id,
         MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
  FROM sess GROUP BY 1, 2)
SELECT COUNT(*) AS n_sessions,
       CAST(SUM(v) AS BIGINT) AS with_view,
       CAST(SUM(v * p) AS BIGINT) AS converted,
       ROUND(SUM(v * p) / CAST(SUM(v) AS DOUBLE), 6) AS conversion_rate
FROM f
"""


def q_forecast_revenue_change(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q6 shape (forecast revenue change): one filtered scan —
    year + discount band + quantity cap — with every predicate pushed to
    the parquet read, then a scalar sum.  The simplest possible pipeline,
    kept as the pushdown-efficiency baseline."""
    lo = pa.scalar(datetime(1997, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(datetime(1998, 1, 1), pa.timestamp("us"))
    f = (
        (pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi)
        & (pads.field("l_discount") >= 0.05) & (pads.field("l_discount") <= 0.07)
        & (pads.field("l_quantity") < 24)
    )
    ds = _t(sf_dir, "lineitem", ["l_extendedprice", "l_discount"], filter=f)

    def part(t: pa.Table) -> pa.Table:
        rev = pc.sum(pc.multiply(t["l_extendedprice"], t["l_discount"])).as_py() or 0.0
        return pa.table({"r": [float(rev)], "n": [t.num_rows]})

    p = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    return _i64(pd.DataFrame({"revenue": [_rd(float(p["r"].sum()), 2)],
                              "n_rows": [int(p["n"].sum())]}), ["n_rows"])


SQL_FORECAST_REVENUE_CHANGE = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue, COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def q_scd2_history(sf_dir: str) -> pd.DataFrame:
    """CDC → SCD2 transform: the event stream becomes a slowly-changing-
    dimension-2 validity history — one row per (user, state) run with
    [valid_from, valid_to) bounds, valid_to = next change's timestamp
    (NULL-sentineled max for the open row).  Per-user ordered segmentation
    is one vectorized shift inside the user-keyed bucket — the standard
    LEAD() construction without a window engine."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def runs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        u = df["user_id"].to_numpy()
        us = df["ts"].astype("int64").to_numpy()
        et = df["event_type"].to_numpy()
        new = np.r_[True, (u[1:] != u[:-1]) | (et[1:] != et[:-1])]
        starts = np.nonzero(new)[0]
        ends = np.r_[starts[1:], len(u)]
        valid_from = us[starts]
        # valid_to: next run's start ts within the same user, else open (-1)
        nxt = np.full(len(starts), -1, dtype=np.int64)
        same_user = u[starts[1:]] == u[starts[:-1]]
        nxt[:-1][same_user] = valid_from[1:][same_user]
        return pd.DataFrame({
            "user_id": u[starts], "state": et[starts],
            "valid_from_us": valid_from, "valid_to_us": nxt,
            "n_events": ends - starts,
        })

    out = bucketed_group_reduce(ds, ["user_id"], runs).to_pandas()
    return _i64(out.sort_values(["user_id", "valid_from_us"], ignore_index=True),
                ["user_id", "valid_from_us", "valid_to_us", "n_events"])


SQL_SCD2_HISTORY = """
WITH o AS (
  SELECT user_id, event_type, EPOCH_US(ts) AS us,
         CASE WHEN lag(event_type) OVER w IS NULL
                   OR lag(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS chg
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), r AS (
  SELECT user_id, event_type, us,
         SUM(chg) OVER (PARTITION BY user_id ORDER BY us
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM o
), runs AS (
  SELECT user_id, MIN(event_type) AS state, MIN(us) AS valid_from_us,
         COUNT(*) AS n_events
  FROM r GROUP BY user_id, run_id)
SELECT user_id, state, valid_from_us,
       COALESCE(LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY valid_from_us),
                -1) AS valid_to_us,
       n_events
FROM runs ORDER BY user_id, valid_from_us
"""


def q_tail_expected_shortfall(sf_dir: str) -> pd.DataFrame:
    """Tail risk per group: p99 (discrete) plus expected shortfall — the
    mean of all values AT OR ABOVE p99 — both read off the same one-pass
    cent histogram with integer arithmetic (the SQL oracle needs a second
    scan for the conditional mean)."""
    from ..functions.sketch import grouped_histogram_fixedpoint, quantile_disc_from_counts

    hist = grouped_histogram_fixedpoint(
        _t(sf_dir, "events", ["event_type", "value"]), "event_type", "value", scale=100
    )
    rows = []
    for etype, g in hist.groupby("event_type", sort=True):
        mask = pd.notna(g["bin"])
        b = g["bin"].to_numpy()[mask].astype(np.int64)
        c = g["n"].to_numpy()[mask].astype(np.int64)
        order = np.argsort(b)
        b, c = b[order], c[order]
        p99 = quantile_disc_from_counts(b, c, 0.99)
        tail = b >= p99
        es = float((b[tail] * c[tail]).sum()) / int(c[tail].sum())
        rows.append((etype, _rd(p99 / 100.0, 2), _rd(es / 100.0, 6), int(c[tail].sum())))
    out = pd.DataFrame(rows, columns=["event_type", "p99", "expected_shortfall", "n_tail"])
    return _i64(out, ["n_tail"])


SQL_TAIL_EXPECTED_SHORTFALL = """
WITH q AS (
  SELECT event_type,
         CAST(ROUND(quantile_disc(value, 0.99) * 100) AS BIGINT) AS p99c
  FROM events GROUP BY 1)
SELECT e.event_type,
       ROUND(p99c / 100.0, 2) AS p99,
       ROUND(SUM(CAST(ROUND(value * 100) AS BIGINT))
             FILTER (CAST(ROUND(value * 100) AS BIGINT) >= p99c)
             / CAST(COUNT(*) FILTER (CAST(ROUND(value * 100) AS BIGINT) >= p99c) AS DOUBLE)
             / 100.0, 6) AS expected_shortfall,
       COUNT(*) FILTER (CAST(ROUND(value * 100) AS BIGINT) >= p99c) AS n_tail
FROM events e JOIN q USING (event_type)
GROUP BY e.event_type, p99c ORDER BY 1
"""


def q_returned_item_customers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q10 shape (returned-item reporting): revenue lost to returns
    per customer over one year, top-20 with nation names.  Returned
    lineitems pre-aggregate per order BEFORE the join chain; orders carry
    the date filter at the read; the customer→nation dimension attaches by
    broadcast."""
    from ..functions.relational import auto_join

    lo = pa.scalar(datetime(1997, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(datetime(1998, 1, 1), pa.timestamp("us"))
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"],
            filter=pads.field("l_returnflag") == "R")

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"o_orderkey": t["l_orderkey"], "r": r})

    per_order = grouped_sums(
        li.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True),
        ["o_orderkey"], {"rev": "r"},
    )
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"],
                filter=(pads.field("o_orderdate") >= lo) & (pads.field("o_orderdate") < hi))
    j = auto_join(per_order, orders, on="o_orderkey")
    per_cust = grouped_sums(j, ["o_custkey"], {"revenue": "rev"})
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    cust = broadcast_join(
        _t(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"]),
        nat.rename_columns(["c_nationkey", "n_name"]),
        "c_nationkey",
    ).select_columns(["c_custkey", "c_name", "n_name"])
    out = topk(auto_join(per_cust, cust, on="o_custkey", right_on="c_custkey"),
               ["revenue", "o_custkey"], [True, False], 20).to_pandas()
    out = out.rename(columns={"o_custkey": "c_custkey", "n_name": "nation"})
    out["revenue"] = out["revenue"].pipe(_rd, 2)
    return _i64(out[["c_custkey", "c_name", "nation", "revenue"]], ["c_custkey"])


SQL_RETURNED_ITEM_CUSTOMERS = """
SELECT c.c_custkey, c.c_name, n.n_name AS nation,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01' AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
ORDER BY SUM(l.l_extendedprice * (1 - l.l_discount)) DESC, c_custkey
LIMIT 20
"""


def q_new_vs_returning_revenue(sf_dir: str) -> pd.DataFrame:
    """Monthly revenue split into NEW customers (ordering in their
    first-ever month) vs RETURNING — the standard growth-accounting report.
    Two-level dependency done with one custkey co-group: per-batch
    (custkey, month, rev) partials union with nothing — the same exchange
    that computes each customer's first month also splits that customer's
    month rows, so no join and no broadcast of a customer-sized table."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])

    def part(t: pa.Table) -> pa.Table:
        micros = pc.cast(t["o_orderdate"], pa.int64()).to_numpy(zero_copy_only=False)
        # calendar month id: days→approximate months need real calendars —
        # use year*12+month from the timestamp instead
        dt = pd.to_datetime(micros, unit="us")
        month = (dt.year.to_numpy() * 12 + (dt.month.to_numpy() - 1)).astype(np.int64)
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0), ndigits=0, round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"o_custkey": t["o_custkey"].to_numpy(zero_copy_only=False),
                           "month_id": month, "rev_c": cents})
        g = df.groupby(["o_custkey", "month_id"], as_index=False)["rev_c"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def split(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["o_custkey", "month_id"], as_index=False)["rev_c"].sum()
        first = g.groupby("o_custkey")["month_id"].transform("min")
        g["is_new"] = g["month_id"] == first
        out = g.groupby(["month_id", "is_new"], as_index=False)["rev_c"].sum()
        return out

    parts = bucketed_group_reduce(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["o_custkey"], split,
    ).to_pandas()
    agg = parts.groupby(["month_id", "is_new"], as_index=False)["rev_c"].sum()
    wide = agg.pivot_table(index="month_id", columns="is_new", values="rev_c",
                           fill_value=0, aggfunc="sum").reset_index()
    wide = wide.rename(columns={True: "new_c", False: "returning_c"})
    for c in ("new_c", "returning_c"):
        if c not in wide:
            wide[c] = 0
    out = pd.DataFrame({
        "month_id": wide["month_id"],
        "revenue_new": (wide["new_c"] / 100.0).pipe(_rd, 2),
        "revenue_returning": (wide["returning_c"] / 100.0).pipe(_rd, 2),
    }).sort_values("month_id", ignore_index=True)
    return _i64(out, ["month_id"])


SQL_NEW_VS_RETURNING_REVENUE = """
WITH o AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS month_id,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS rev_c
  FROM orders),
f AS (SELECT *, MIN(month_id) OVER (PARTITION BY o_custkey) AS first_month FROM o)
SELECT month_id,
       ROUND(SUM(CASE WHEN month_id = first_month THEN rev_c ELSE 0 END) / 100.0, 2)
         AS revenue_new,
       ROUND(SUM(CASE WHEN month_id > first_month THEN rev_c ELSE 0 END) / 100.0, 2)
         AS revenue_returning
FROM f GROUP BY 1 ORDER BY 1
"""


def q_fulfillment_latency_hist(sf_dir: str) -> pd.DataFrame:
    """Order→first-shipment latency distribution in whole days: per-order
    MIN shipdate partials co-grouped with the order header on the orderkey
    (one exchange), vectorized day diff, tiny day-level count."""
    from ..functions.relational import bucketed_group_reduce

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def li_part(t: pa.Table) -> pa.Table:
        g = pa.table({"o_orderkey": t["l_orderkey"],
                      "ship_us": pc.cast(t["l_shipdate"], pa.int64())}).group_by(
            ["o_orderkey"]).aggregate([("ship_us", "min")])
        return pa.table({"o_orderkey": g["o_orderkey"], "ship_us": g["ship_us_min"],
                         "order_us": pa.nulls(g.num_rows, pa.int64())})

    def o_part(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "ship_us": pa.nulls(t.num_rows, pa.int64()),
                         "order_us": pc.cast(t["o_orderdate"], pa.int64())})

    u = li.map_batches(li_part, batch_format="pyarrow", zero_copy_batch=True).union(
        orders.map_batches(o_part, batch_format="pyarrow", zero_copy_batch=True))

    def diff(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_orderkey", as_index=False).agg(
            ship_us=("ship_us", "min"), order_us=("order_us", "min"))
        g = g.dropna(subset=["ship_us", "order_us"])
        days = ((g["ship_us"] - g["order_us"]) // 86_400_000_000).astype(np.int64)
        return pd.DataFrame({"latency_days": days}).groupby(
            "latency_days", as_index=False).size().rename(columns={"size": "n"})

    parts = bucketed_group_reduce(u, ["o_orderkey"], diff).to_pandas()
    out = parts.groupby("latency_days", as_index=False)["n"].sum().sort_values(
        "latency_days", ignore_index=True)
    return _i64(out, ["latency_days", "n"])


SQL_FULFILLMENT_LATENCY_HIST = """
WITH s AS (
  SELECT l_orderkey, MIN(EPOCH_US(l_shipdate)) AS ship_us
  FROM lineitem GROUP BY 1)
SELECT (s.ship_us - EPOCH_US(o.o_orderdate)) // 86400000000 AS latency_days,
       COUNT(*) AS n
FROM orders o JOIN s ON o.o_orderkey = s.l_orderkey
GROUP BY 1 ORDER BY 1
"""


def q_basket_lift(sf_dir: str) -> pd.DataFrame:
    """Association rules over the co-purchase pairs: support, confidence
    and lift for the top-20 pairs by joint support.  Joint counts come from
    the per-order pair combiner reduce; single-item order-frequencies from
    a distinct (order, part) reduce; only the 20 winning pairs' item
    counts are looked up driver-side (40 keys)."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        m = df.merge(df, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        out = m.groupby(["l_partkey_x", "l_partkey_y"], as_index=False).size()
        return out.rename(columns={"l_partkey_x": "part_a", "l_partkey_y": "part_b", "size": "n"})

    pairs = grouped_sums(
        bucketed_group_reduce(ds, ["l_orderkey"], per_bucket), ["part_a", "part_b"], {"n": "n"}
    )
    top = topk(pairs, ["n", "part_a", "part_b"], [True, False, False], 20).to_pandas()

    def item_part(t: pa.Table) -> pa.Table:
        g = pa.table({"part": t["l_partkey"], "o": t["l_orderkey"]}).group_by(
            ["part", "o"]).aggregate([])
        return g

    # two-level distinct: the per-batch (part, order) dedup is only a
    # combiner — an order's lines span batches, so a GLOBAL (part, order)
    # reduce must run before counting orders per part
    po = grouped_sums(
        ds.map_batches(item_part, batch_format="pyarrow", zero_copy_batch=True),
        ["part", "o"], {}, "c",
    )
    item = grouped_sums(po.select_columns(["part"]), ["part"], {}, "cnt")
    want = set(top["part_a"]) | set(top["part_b"])
    from ..functions.relational import semi_join_broadcast

    counts = semi_join_broadcast(item, sorted(want), "part").to_pandas()
    cnt = dict(zip(counts["part"], counts["cnt"]))
    n_orders = int(grouped_sums(
        ds.select_columns(["l_orderkey"]), ["l_orderkey"], {}, "c").count())
    top["confidence"] = (top["n"] / top["part_a"].map(cnt)).pipe(_rd)
    top["lift"] = (top["n"] * n_orders /
                   (top["part_a"].map(cnt) * top["part_b"].map(cnt))).pipe(_rd)
    return _i64(top[["part_a", "part_b", "n", "confidence", "lift"]],
                ["part_a", "part_b", "n"])


SQL_BASKET_LIFT = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
no AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM lineitem),
ic AS (SELECT l_partkey, COUNT(*) AS cnt FROM d GROUP BY 1),
p AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n
  FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  ORDER BY n DESC, part_a, part_b LIMIT 20)
SELECT p.part_a, p.part_b, p.n,
       ROUND(p.n / CAST(ia.cnt AS DOUBLE), 6) AS confidence,
       ROUND(p.n * no.n_orders / (CAST(ia.cnt AS DOUBLE) * ib.cnt), 6) AS lift
FROM p JOIN ic ia ON p.part_a = ia.l_partkey
       JOIN ic ib ON p.part_b = ib.l_partkey
       CROSS JOIN no
ORDER BY n DESC, part_a, part_b
"""


def q_user_survival_curve(sf_dir: str) -> pd.DataFrame:
    """Retention/survival curve: fraction of users whose activity span
    (last − first event, whole days) reaches at least k days, for
    k = 0..30.  One per-user extremes reduce → a |days|-bounded span
    histogram → reverse cumulative sum on the driver."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def part(t: pa.Table) -> pa.Table:
        g = pa.table({"user_id": t["user_id"],
                      "us": pc.cast(t["ts"], pa.int64())}).group_by(["user_id"]).aggregate(
            [("us", "min"), ("us", "max")])
        return pa.table({"user_id": g["user_id"], "lo": g["us_min"], "hi": g["us_max"]})

    spans = bucketed_group_reduce(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"],
        lambda df: df.groupby("user_id", as_index=False).agg(lo=("lo", "min"), hi=("hi", "max")),
    )

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        days = ((df["hi"] - df["lo"]) // 86_400_000_000).astype(np.int64)
        return pd.DataFrame({"span_days": days}).groupby(
            "span_days", as_index=False).size().rename(columns={"size": "n"})

    h = spans.map_batches(hist, batch_format="pandas").to_pandas()
    h = h.groupby("span_days", as_index=False)["n"].sum()
    total = int(h["n"].sum())
    ks = np.arange(0, 31, dtype=np.int64)
    alive = np.array([int(h.loc[h["span_days"] >= k, "n"].sum()) for k in ks])
    out = pd.DataFrame({"k_days": ks, "n_surviving": alive,
                        "survival": _rd(alive / total)})
    return _i64(out, ["k_days", "n_surviving"])


SQL_USER_SURVIVAL_CURVE = """
WITH u AS (
  SELECT user_id,
         (MAX(EPOCH_US(ts)) - MIN(EPOCH_US(ts))) // 86400000000 AS span_days
  FROM events GROUP BY 1),
tot AS (SELECT COUNT(*) AS n FROM u),
k AS (SELECT UNNEST(range(0, 31)) AS k_days)
SELECT k.k_days,
       COUNT(u.user_id) AS n_surviving,
       ROUND(COUNT(u.user_id) / CAST(MAX(tot.n) AS DOUBLE), 6) AS survival
FROM k CROSS JOIN tot LEFT JOIN u ON u.span_days >= k.k_days
GROUP BY 1 ORDER BY 1
"""


def q_lineitem_corr_matrix(sf_dir: str) -> pd.DataFrame:
    """Numeric-profile correlation matrix over (quantity, extendedprice,
    discount, tax): every pairwise Pearson r from ONE streaming moments
    pass — each batch emits (n, Σx per col, ΣxᵀX cross-products), a handful
    of doubles; the driver closes the covariance form.  The SQL oracle
    calls corr() once per pair (six scans' worth of aggregates)."""
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ds = _t(sf_dir, "lineitem", cols)

    def part(t: pa.Table) -> pa.Table:
        X = np.column_stack([t[c].to_numpy(zero_copy_only=False) for c in cols])
        g = X.T @ X
        return pa.table({
            "n": pa.array([len(X)], pa.int64()),
            "s": pa.array([X.sum(axis=0).tolist()], pa.list_(pa.float64())),
            "g": pa.array([g.ravel().tolist()], pa.list_(pa.float64())),
        })

    p = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    n = int(p["n"].sum())
    s = np.sum([np.asarray(x) for x in p["s"]], axis=0)
    G = np.sum([np.asarray(x) for x in p["g"]], axis=0).reshape(len(cols), len(cols))
    cov = (G - np.outer(s, s) / n) / (n - 1)
    sd = np.sqrt(np.diag(cov))
    corr = cov / np.outer(sd, sd)
    rows = []
    for i, a in enumerate(cols):
        for j, b in enumerate(cols):
            if i < j:
                rows.append((a, b, _rd(float(corr[i, j]), 6)))
    return pd.DataFrame(rows, columns=["col_a", "col_b", "corr"])


SQL_LINEITEM_CORR_MATRIX = """
SELECT * FROM (
  SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
         ROUND(corr(l_quantity, l_extendedprice), 6) AS corr FROM lineitem
  UNION ALL SELECT 'l_quantity', 'l_discount', ROUND(corr(l_quantity, l_discount), 6) FROM lineitem
  UNION ALL SELECT 'l_quantity', 'l_tax', ROUND(corr(l_quantity, l_tax), 6) FROM lineitem
  UNION ALL SELECT 'l_extendedprice', 'l_discount', ROUND(corr(l_extendedprice, l_discount), 6) FROM lineitem
  UNION ALL SELECT 'l_extendedprice', 'l_tax', ROUND(corr(l_extendedprice, l_tax), 6) FROM lineitem
  UNION ALL SELECT 'l_discount', 'l_tax', ROUND(corr(l_discount, l_tax), 6) FROM lineitem
) ORDER BY col_a, col_b
"""


def q_journey_patterns(sf_dir: str) -> pd.DataFrame:
    """Top user-journey prefixes: each user's first five event types joined
    into a path string, counted across users, top-10.  The path assembly is
    one vectorized take inside the user bucket; the pattern count is a
    grouped reduce over short strings."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def paths(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        g = df.groupby("user_id", sort=False)["event_type"]
        p = g.apply(lambda s: ">".join(s.iloc[:5]))
        out = pd.DataFrame({"path": p.to_numpy()})
        return out.groupby("path", as_index=False).size().rename(columns={"size": "n"})

    counts = grouped_sums(
        bucketed_group_reduce(ds, ["user_id"], paths), ["path"], {"n": "n"}
    )
    out = topk(counts, ["n", "path"], [True, False], 10).to_pandas()
    return _i64(out, ["n"])


SQL_JOURNEY_PATTERNS = """
WITH r AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events),
p AS (
  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
  FROM r WHERE rn <= 5 GROUP BY 1)
SELECT path, COUNT(*) AS n FROM p GROUP BY 1
ORDER BY n DESC, path LIMIT 10
"""


def q_k_anonymity_audit(sf_dir: str) -> pd.DataFrame:
    """k-anonymity audit over quasi-identifiers (market segment × nation):
    how many equivalence classes fall below k=5 members and how many
    customers sit in them — the privacy pre-release gate.  One bounded
    grouped count; only class-level rows reduce."""
    K = 5
    counts = grouped_sums(
        _t(sf_dir, "customer", ["c_mktsegment", "c_nationkey"]),
        ["c_mktsegment", "c_nationkey"], {}, "n",
    ).to_pandas()
    risky = counts[counts["n"] < K]
    out = pd.DataFrame({
        "n_classes": pd.Series([len(counts)], dtype="int64"),
        "n_risky_classes": pd.Series([len(risky)], dtype="int64"),
        "n_risky_customers": pd.Series([int(risky["n"].sum())], dtype="int64"),
        "min_class_size": pd.Series([int(counts["n"].min())], dtype="int64"),
    })
    return out


SQL_K_ANONYMITY_AUDIT = """
WITH c AS (
  SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
  FROM customer GROUP BY 1, 2)
SELECT COUNT(*) AS n_classes,
       COUNT(*) FILTER (n < 5) AS n_risky_classes,
       CAST(COALESCE(SUM(n) FILTER (n < 5), 0) AS BIGINT) AS n_risky_customers,
       MIN(n) AS min_class_size
FROM c
"""


def q_boilerplate_sentences(sf_dir: str) -> pd.DataFrame:
    """Boilerplate detection: sentences (period-split, trimmed, non-empty)
    repeated across the corpus, top-10 by occurrence count — the curation
    step that strips licence headers / navigation chrome.  One vectorized
    split+flatten per batch, one grouped count over sentence strings."""
    docs = _t(sf_dir, "documents", ["text"])

    def sents(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["text"], ".")
        parts = parts.combine_chunks() if isinstance(parts, pa.ChunkedArray) else parts
        flat = pc.utf8_trim_whitespace(parts.flatten())
        return pa.table({"sentence": flat.filter(pc.not_equal(flat, ""))})

    counts = grouped_sums(
        docs.map_batches(sents, batch_format="pyarrow", zero_copy_batch=True),
        ["sentence"], {}, "n",
    )
    out = topk(counts, ["n", "sentence"], [True, False], 10).to_pandas()
    return _i64(out, ["n"])


SQL_BOILERPLATE_SENTENCES = """
WITH s AS (
  SELECT trim(UNNEST(string_split(text, '.'))) AS sentence FROM documents)
SELECT sentence, COUNT(*) AS n
FROM s WHERE sentence <> ''
GROUP BY 1 ORDER BY n DESC, sentence LIMIT 10
"""


def q_hapax_docs_per_source(sf_dir: str) -> pd.DataFrame:
    """Rarity flagging: documents containing at least one HAPAX trigram
    shingle (corpus frequency 1), counted per source — the memorization-
    risk probe (word-level hapaxes don't exist in this closed-vocabulary
    corpus; trigram shingles do).  The hapax set is shingle-space-sized —
    far too big to broadcast — so the shingle stream co-groups with its own
    frequency reduce on the shingle key (join-back-to-aggregate over
    text); the source rides inside the packed doc id so the final distinct
    + per-source count stays distributed end to end."""
    from ..functions.relational import bucketed_group_reduce
    from ..functions.search import TOKEN_SPLIT

    docs = _t(sf_dir, "documents", ["doc_id", "source", "text"])

    def shingles(t: pa.Table) -> pa.Table:
        pid_col = pc.binary_join_element_wise(
            pc.cast(t["doc_id"], pa.string()), t["source"], "|")
        words = pc.split_pattern_regex(pc.utf8_lower(t["text"]), TOKEN_SPLIT)
        words = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        parents = pc.list_parent_indices(words)
        flat = words.flatten()
        mask = pc.not_equal(flat, "")
        w = flat.filter(mask)
        p = parents.filter(mask).to_numpy(zero_copy_only=False)
        idx = (np.nonzero((p[:-2] == p[1:-1]) & (p[1:-1] == p[2:]))[0]
               if len(p) >= 3 else np.empty(0, np.int64))
        g = pc.binary_join_element_wise(
            w.take(pa.array(idx)), w.take(pa.array(idx + 1)), w.take(pa.array(idx + 2)), " ")
        flatt = pa.table({"pid": pc.take(pid_col, pa.array(p[idx] if len(idx) else idx)),
                          "term": g})
        agg = flatt.group_by(["pid", "term"]).aggregate([([], "count_all")])
        return pa.table({"pid": agg["pid"], "term": agg["term"],
                         "tf": pc.cast(agg["count_all"], pa.int64())})

    post = docs.map_batches(shingles, batch_format="pyarrow", zero_copy_batch=True)

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        tf = df.groupby("term")["tf"].transform("sum")
        return df[tf == 1][["pid"]].drop_duplicates()

    flagged = bucketed_group_reduce(post, ["term"], flag)
    # distinct flagged docs (a doc can hold hapaxes under many terms), then
    # one tiny grouped count on the unpacked source
    distinct = grouped_sums(flagged, ["pid"], {}, "c")

    def unpack(t: pa.Table) -> pa.Table:
        src = pc.list_element(pc.split_pattern(t["pid"], "|"), 1)
        return pa.table({"source": src})

    out = grouped_sums(
        distinct.map_batches(unpack, batch_format="pyarrow", zero_copy_batch=True),
        ["source"], {}, "n_hapax_docs", reduce="driver",
    ).to_pandas()
    return _i64(out.sort_values("source", ignore_index=True), ["n_hapax_docs"])


SQL_HAPAX_DOCS_PER_SOURCE = """
WITH d AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws
  FROM documents),
tg AS (
  SELECT doc_id, source, ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS term
  FROM d, UNNEST(range(1, greatest(len(ws) - 1, 1))) AS t(i)
  WHERE i + 2 <= len(ws)),
tf AS (SELECT term, COUNT(*) AS f FROM tg GROUP BY 1),
flagged AS (
  SELECT DISTINCT tg.doc_id, tg.source
  FROM tg JOIN tf USING (term) WHERE tf.f = 1)
SELECT source, COUNT(*) AS n_hapax_docs
FROM flagged GROUP BY 1 ORDER BY 1
"""


def q_anomaly_audit(sf_dir: str) -> pd.DataFrame:
    """Cross-table data-validation sweep: per table, scalar anomaly
    counters (negative amounts, nulls, timestamps beyond the corpus
    horizon) folded from per-batch partials — the pre-ingest contract
    check.  Every counter is a one-pass column scan."""
    horizon = pa.scalar(datetime(2002, 1, 1), pa.timestamp("us"))

    def audit(table: str, checks) -> tuple[str, int, int, int]:
        ds = _t(sf_dir, table, list({c for c, _ in checks}))

        def part(t: pa.Table) -> pa.Table:
            neg = nul = fut = 0
            for col, kind in checks:
                if kind == "neg":
                    neg += int(pc.sum(pc.cast(pc.less(t[col], 0.0), pa.int64())).as_py() or 0)
                    nul += t[col].null_count
                elif kind == "future":
                    fut += int(pc.sum(pc.cast(pc.greater(t[col], horizon), pa.int64())).as_py() or 0)
                    nul += t[col].null_count
            return pa.table({"neg": [neg], "nul": [nul], "fut": [fut]})

        p = ds.map_batches(part, batch_format="pyarrow").to_pandas()
        return table, int(p["neg"].sum()), int(p["nul"].sum()), int(p["fut"].sum())

    rows = [
        audit("events", [("value", "neg"), ("ts", "future")]),
        audit("orders", [("o_totalprice", "neg"), ("o_orderdate", "future")]),
        audit("lineitem", [("l_extendedprice", "neg"), ("l_shipdate", "future")]),
    ]
    out = pd.DataFrame(rows, columns=["tbl", "n_negative", "n_null", "n_future"])
    return _i64(out, ["n_negative", "n_null", "n_future"])


SQL_ANOMALY_AUDIT = """
SELECT 'events' AS tbl,
       COUNT(*) FILTER (value < 0) AS n_negative,
       (SELECT COUNT(*) FROM events WHERE value IS NULL)
         + (SELECT COUNT(*) FROM events WHERE ts IS NULL) AS n_null,
       COUNT(*) FILTER (ts > TIMESTAMP '2002-01-01') AS n_future
FROM events
UNION ALL
SELECT 'orders',
       COUNT(*) FILTER (o_totalprice < 0),
       (SELECT COUNT(*) FROM orders WHERE o_totalprice IS NULL)
         + (SELECT COUNT(*) FROM orders WHERE o_orderdate IS NULL),
       COUNT(*) FILTER (o_orderdate > TIMESTAMP '2002-01-01')
FROM orders
UNION ALL
SELECT 'lineitem',
       COUNT(*) FILTER (l_extendedprice < 0),
       (SELECT COUNT(*) FROM lineitem WHERE l_extendedprice IS NULL)
         + (SELECT COUNT(*) FROM lineitem WHERE l_shipdate IS NULL),
       COUNT(*) FILTER (l_shipdate > TIMESTAMP '2002-01-01')
FROM lineitem
"""


def q_quality_gate_sweep(sf_dir: str) -> pd.DataFrame:
    """Threshold-sensitivity sweep for the min-words quality gate: drop
    counts at five candidate thresholds from ONE streaming pass (vectorized
    multi-threshold counters per batch) — the tuning loop that would
    otherwise rescan the corpus per candidate."""
    from ..functions.scrub import normalize_text
    from ..functions.text import n_words

    THRESHOLDS = [3, 5, 8, 13, 21]
    src = ensure_curation_parquet(sf_dir)
    ds = rd.read_parquet(src, columns=["text"])

    def part(t: pa.Table) -> pa.Table:
        nw = pc.cast(n_words(normalize_text(t["text"])), pa.int64()).to_numpy(
            zero_copy_only=False)
        drops = [int((nw < k).sum()) for k in THRESHOLDS]
        return pa.table({"min_words": pa.array(THRESHOLDS, pa.int64()),
                         "n_dropped": pa.array(drops, pa.int64()),
                         "n_total": pa.array([len(nw)] * len(THRESHOLDS), pa.int64())})

    p = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = p.groupby("min_words", as_index=False).sum()
    out["drop_rate"] = (out["n_dropped"] / out["n_total"]).pipe(_rd)
    return _i64(out, ["min_words", "n_dropped", "n_total"])


SQL_QUALITY_GATE_SWEEP = f"""
WITH q AS (
  SELECT len(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS nw
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/curation.parquet')),
k AS (SELECT UNNEST([3, 5, 8, 13, 21]) AS min_words)
SELECT k.min_words,
       COUNT(*) FILTER (q.nw < k.min_words) AS n_dropped,
       COUNT(*) AS n_total,
       ROUND(COUNT(*) FILTER (q.nw < k.min_words) / CAST(COUNT(*) AS DOUBLE), 6) AS drop_rate
FROM k CROSS JOIN q
GROUP BY 1 ORDER BY 1
"""


def q_wau_retention(sf_dir: str) -> pd.DataFrame:
    """Week-over-week retention: of users active in week w, how many are
    also active in w+1.  Distinct (user, week) pairs reduce once; a
    per-user co-group turns each user's sorted week set into
    (week, retained-next-week) flags with one vectorized diff; the final
    week-level aggregate is tiny."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def part(t: pa.Table) -> pa.Table:
        w = pc.divide(pc.cast(t["ts"], pa.int64()),
                      pa.scalar(604_800_000_000, pa.int64()))
        return pa.table({"user_id": t["user_id"], "week_id": w}).group_by(
            ["user_id", "week_id"]).aggregate([])

    pairs = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)

    def flags(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates().sort_values(["user_id", "week_id"])
        u = df["user_id"].to_numpy()
        w = df["week_id"].to_numpy(dtype=np.int64)
        nxt = np.r_[(u[1:] == u[:-1]) & (w[1:] == w[:-1] + 1), False]
        g = pd.DataFrame({"week_id": w, "retained": nxt.astype(np.int64)})
        return g.groupby("week_id", as_index=False).agg(
            active=("retained", "size"), retained=("retained", "sum"))

    parts = bucketed_group_reduce(pairs, ["user_id"], flags).to_pandas()
    out = parts.groupby("week_id", as_index=False).agg(
        active=("active", "sum"), retained=("retained", "sum"))
    out["retention"] = (out["retained"] / out["active"]).pipe(_rd)
    return _i64(out.sort_values("week_id", ignore_index=True),
                ["week_id", "active", "retained"])


SQL_WAU_RETENTION = """
WITH p AS (
  SELECT DISTINCT user_id, EPOCH_US(ts) // 604800000000 AS week_id FROM events)
SELECT a.week_id,
       COUNT(*) AS active,
       COUNT(b.user_id) AS retained,
       ROUND(COUNT(b.user_id) / CAST(COUNT(*) AS DOUBLE), 6) AS retention
FROM p a LEFT JOIN p b ON a.user_id = b.user_id AND b.week_id = a.week_id + 1
GROUP BY 1 ORDER BY 1
"""


def q_heaps_law_fit(sf_dir: str) -> pd.DataFrame:
    """Heaps'-law fit across sources (V ≈ K·Nᵝ): per source, total tokens
    N from one scan-side count and vocabulary size V from a distinct
    (source, term) reduce; β is the log-log OLS slope over the 20 source
    points — the vocabulary-growth health check that complements the Zipf
    exponent."""
    from ..functions.search import tokenize_terms

    docs = _t(sf_dir, "documents", ["source", "text"])
    pairs = docs.map_batches(
        lambda t: tokenize_terms(t, "text", "source"),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    # N per source: sum of tf over the (source, term) partials; V per
    # source: distinct terms — both from the same materialized postings
    n_tok = grouped_sums(pairs, ["source"], {"n": "tf"}).to_pandas()
    vocab = grouped_sums(
        grouped_sums(pairs, ["source", "term"], {}, "c").select_columns(["source"]),
        ["source"], {}, "v",
    ).to_pandas()
    m = n_tok.merge(vocab, on="source").sort_values("source", ignore_index=True)
    x = np.log(m["n"].to_numpy(dtype=np.float64))
    y = np.log(m["v"].to_numpy(dtype=np.float64))
    xc, yc = x - x.mean(), y - y.mean()
    beta = float((xc * yc).sum() / (xc * xc).sum())
    return pd.DataFrame({"n_sources": pd.Series([len(m)], dtype="int64"),
                         "heaps_beta": [_rd(beta, 6)]})


SQL_HEAPS_LAW_FIT = """
WITH toks AS (
  SELECT source, UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents),
t AS (SELECT * FROM toks WHERE term <> ''),
s AS (SELECT source, COUNT(*) AS n, COUNT(DISTINCT term) AS v FROM t GROUP BY 1)
SELECT COUNT(*) AS n_sources, ROUND(regr_slope(ln(v), ln(n)), 6) AS heaps_beta FROM s
"""


def q_top_parts_per_segment(sf_dir: str) -> pd.DataFrame:
    """Popularity baseline per market segment: top-3 parts by distinct
    order count within each segment — grouped top-k AFTER a join chain.
    The fact collapses to (custkey→segment via broadcast dim, partkey)
    distinct-order partials before any ranking; the per-segment prune is
    the grouped-top-k operator (per-block prune, exact)."""
    from ..functions.relational import auto_join, grouped_topk

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    # (order, part) distinct → attach custkey → attach segment
    op = grouped_sums(
        li.map_batches(
            lambda t: pa.table({"o_orderkey": t["l_orderkey"], "part": t["l_partkey"]}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["o_orderkey", "part"], {}, "c",
    )
    j = auto_join(op, orders, on="o_orderkey")
    j = auto_join(j, cust.map_batches(
        lambda t: pa.table({"o_custkey": t["c_custkey"], "segment": t["c_mktsegment"]}),
        batch_format="pyarrow", zero_copy_batch=True), on="o_custkey")
    per_seg_part = grouped_sums(j, ["segment", "part"], {}, "n_orders")
    out = grouped_topk(
        per_seg_part, ["segment"], ["n_orders", "part"], [True, False], 3
    ).to_pandas().sort_values(["segment", "n_orders", "part"],
                              ascending=[True, False, True], ignore_index=True)
    return _i64(out, ["part", "n_orders"])


SQL_TOP_PARTS_PER_SEGMENT = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
j AS (
  SELECT c.c_mktsegment AS segment, op.l_partkey AS part, COUNT(*) AS n_orders
  FROM op JOIN orders o ON op.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY segment ORDER BY n_orders DESC, part) AS rn
  FROM j)
SELECT segment, part, n_orders FROM r WHERE rn <= 3
ORDER BY segment, n_orders DESC, part
"""


def q_cohort_ltv(sf_dir: str) -> pd.DataFrame:
    """Cohort lifetime value: average cumulative revenue per customer by
    months-since-first-order, per acquisition-month cohort (first four
    cohorts × ages 0-3).  One custkey co-group assigns each order its
    cohort and age; cents-integer revenue keeps the cumulative sums
    bit-stable; the cumulative step runs on the (cohorts × ages)-bounded
    grid on the driver."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])

    def part(t: pa.Table) -> pa.Table:
        micros = pc.cast(t["o_orderdate"], pa.int64()).to_numpy(zero_copy_only=False)
        dt = pd.to_datetime(micros, unit="us")
        month = (dt.year.to_numpy() * 12 + (dt.month.to_numpy() - 1)).astype(np.int64)
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0), ndigits=0, round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"o_custkey": t["o_custkey"].to_numpy(zero_copy_only=False),
                           "month_id": month, "rev_c": cents})
        return pa.Table.from_pandas(
            df.groupby(["o_custkey", "month_id"], as_index=False)["rev_c"].sum(),
            preserve_index=False)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["o_custkey", "month_id"], as_index=False)["rev_c"].sum()
        first = g.groupby("o_custkey")["month_id"].transform("min")
        g["cohort"] = first
        g["age"] = g["month_id"] - first
        out = g.groupby(["cohort", "age"], as_index=False).agg(rev_c=("rev_c", "sum"))
        sizes = g[g["age"] == 0].groupby("cohort", as_index=False).agg(
            n_cust=("o_custkey", "nunique"))
        return out.merge(sizes, on="cohort")

    parts = bucketed_group_reduce(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["o_custkey"], assign,
    ).to_pandas()
    agg = parts.groupby(["cohort", "age"], as_index=False).agg(
        rev_c=("rev_c", "sum"), n_cust=("n_cust", "sum"))
    cohorts = sorted(agg["cohort"].unique())[:4]
    rows = []
    for c in cohorts:
        g = agg[agg["cohort"] == c].sort_values("age")
        n = int(g.loc[g["age"] == 0, "n_cust"].iloc[0])
        cum = 0
        by_age = dict(zip(g["age"], g["rev_c"]))
        for a in range(4):
            cum += int(by_age.get(a, 0))
            rows.append((int(c), a, _rd(cum / n / 100.0, 6)))
    out = pd.DataFrame(rows, columns=["cohort", "age", "avg_cum_revenue"])
    return _i64(out, ["cohort", "age"])


SQL_COHORT_LTV = """
WITH o AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS month_id,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS rev_c
  FROM orders),
f AS (SELECT *, MIN(month_id) OVER (PARTITION BY o_custkey) AS cohort FROM o),
cs AS (SELECT cohort, COUNT(DISTINCT o_custkey) AS n_cust FROM f GROUP BY 1),
co AS (SELECT cohort FROM cs ORDER BY cohort LIMIT 4),
ages AS (SELECT UNNEST(range(0, 4)) AS age),
rev AS (
  SELECT cohort, month_id - cohort AS age, SUM(rev_c) AS rev_c
  FROM f GROUP BY 1, 2)
SELECT co.cohort, ages.age,
       ROUND(COALESCE(SUM(r.rev_c), 0) / CAST(MAX(cs.n_cust) AS DOUBLE) / 100.0, 6)
         AS avg_cum_revenue
FROM co CROSS JOIN ages
JOIN cs ON cs.cohort = co.cohort
LEFT JOIN rev r ON r.cohort = co.cohort AND r.age <= ages.age
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_mixture_schedule(sf_dir: str) -> pd.DataFrame:
    """Deterministic weighted-interleave mixture schedule — the order a
    training run would draw documents so each source appears proportionally
    to its weight (weighted round-robin: doc k of source s is scheduled at
    key k/wₛ).  Within-source ranks come from ONE global_row_number pass on
    the packed key source·2⁴⁸ + doc_id (contiguous spans per source, rank −
    span offset = within-source rank, same construction as RFM); the first
    50 schedule slots come back through a distributed top-k."""
    from ..functions.rank import global_row_number

    docs = _t(sf_dir, "documents", ["doc_id", "source"])
    # deterministic per-source weights (1, 2 or 3), mirrored in SQL
    sizes = grouped_sums(docs.select_columns(["source"]), ["source"], {}, "n").to_pandas()
    sizes = sizes.sort_values("source", ignore_index=True)
    srcs = list(sizes["source"])
    idx_of = {s: i for i, s in enumerate(srcs)}
    weight = {s: 1.0 + (int(s[3:]) % 3) for s in srcs}  # src<N> → 1 + N%3
    offsets = {}
    off = 0
    for s, n in zip(sizes["source"], sizes["n"]):
        offsets[s] = off
        off += int(n)

    C = 1 << 48

    def pack(t: pa.Table, *, idx=idx_of) -> pa.Table:
        si = t["source"].to_pandas().map(idx).to_numpy(dtype=np.int64)
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": t["doc_id"], "source": t["source"],
                         "packed": pa.array(si * C + did)})

    ranked, _ = global_row_number(
        docs.map_batches(pack, batch_format="pyarrow", zero_copy_batch=True),
        "packed", ["doc_id"])

    def key(t: pa.Table, *, offs=offsets, w=weight) -> pa.Table:
        src = t["source"].to_pandas()
        rn = t["rn"].to_numpy(zero_copy_only=False) - src.map(offs).to_numpy(dtype=np.int64)
        k = rn / src.map(w).to_numpy(dtype=np.float64)
        return pa.table({"source": t["source"], "doc_id": t["doc_id"],
                         "k": pa.array(_rd(k, 9))})

    keyed = ranked.map_batches(key, batch_format="pyarrow", zero_copy_batch=True)
    head = topk(keyed, ["k", "source", "doc_id"], [False, False, False], 50).to_pandas()
    head = head.sort_values(["k", "source", "doc_id"], ignore_index=True)
    head["position"] = np.arange(1, len(head) + 1, dtype=np.int64)
    return _i64(head[["position", "source", "doc_id", "k"]], ["position", "doc_id"])


SQL_MIXTURE_SCHEDULE = """
WITH r AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents),
k AS (
  SELECT source, doc_id,
         ROUND(rn / (1.0 + CAST(substr(source, 4) AS BIGINT) % 3), 9) AS k
  FROM r),
top AS (SELECT * FROM k ORDER BY k, source, doc_id LIMIT 50)
SELECT ROW_NUMBER() OVER (ORDER BY k, source, doc_id) AS position,
       source, doc_id, k
FROM top ORDER BY position
"""


def q_order_price_ohlc(sf_dir: str) -> pd.DataFrame:
    """Monthly OHLC of order prices (open = earliest order's price, close =
    latest, high/low = extremes) — the mergeable ARGMIN/ARGMAX-with-payload
    aggregate: each batch emits one candidate row per month (first/last by
    the (date, orderkey) tie-broken order plus min/max price); partials
    merge associatively on the |months|-bounded driver frame."""
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_totalprice"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        dt = pd.to_datetime(df["o_orderdate"])
        df = df.assign(month_id=(dt.dt.year * 12 + dt.dt.month - 1).astype(np.int64),
                       us=df["o_orderdate"].astype("int64"))
        df = df.sort_values(["month_id", "us", "o_orderkey"], kind="stable")
        first = df.groupby("month_id", as_index=False).first()
        last = df.groupby("month_id", as_index=False).last()
        ext = df.groupby("month_id", as_index=False).agg(
            high=("o_totalprice", "max"), low=("o_totalprice", "min"),
            n=("o_totalprice", "size"))
        out = ext.merge(first[["month_id", "us", "o_orderkey", "o_totalprice"]].rename(
            columns={"us": "o_us", "o_orderkey": "o_key", "o_totalprice": "open"}),
            on="month_id").merge(
            last[["month_id", "us", "o_orderkey", "o_totalprice"]].rename(
                columns={"us": "c_us", "o_orderkey": "c_key", "o_totalprice": "close"}),
            on="month_id")
        return out

    p = ds.map_batches(part, batch_format="pandas").to_pandas()
    # associative merge of per-batch candidates
    p = p.sort_values(["month_id", "o_us", "o_key"], kind="stable")
    first = p.groupby("month_id", as_index=False).first()[["month_id", "open"]]
    p2 = p.sort_values(["month_id", "c_us", "c_key"], kind="stable")
    last = p2.groupby("month_id", as_index=False).last()[["month_id", "close"]]
    ext = p.groupby("month_id", as_index=False).agg(
        high=("high", "max"), low=("low", "min"), n=("n", "sum"))
    out = ext.merge(first, on="month_id").merge(last, on="month_id")
    for c in ("open", "high", "low", "close"):
        out[c] = out[c].pipe(_rd, 2)
    out = out[["month_id", "open", "high", "low", "close", "n"]].sort_values(
        "month_id", ignore_index=True)
    return _i64(out, ["month_id", "n"])


SQL_ORDER_PRICE_OHLC = """
WITH o AS (
  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS month_id,
         o_totalprice AS p, o_orderdate, o_orderkey
  FROM orders),
r AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY month_id ORDER BY o_orderdate, o_orderkey) AS a,
         ROW_NUMBER() OVER (PARTITION BY month_id ORDER BY o_orderdate DESC, o_orderkey DESC) AS z
  FROM o)
SELECT month_id,
       ROUND(MAX(CASE WHEN a = 1 THEN p END), 2) AS open,
       ROUND(MAX(p), 2) AS high,
       ROUND(MIN(p), 2) AS low,
       ROUND(MAX(CASE WHEN z = 1 THEN p END), 2) AS close,
       COUNT(*) AS n
FROM r GROUP BY 1 ORDER BY 1
"""


def q_duplicate_invoices(sf_dir: str) -> pd.DataFrame:
    """Duplicate-invoice detection (fraud screen): pairs of orders by the
    SAME customer in the SAME $1000 price band within a year of each
    other.  Hash exchange on (custkey, band) — both equality keys — then a
    within-group windowed pair scan (group sizes are bounded by how often
    one customer repeats one price band, so the self-join cannot go
    corpus-quadratic)."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"])

    def part(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0), ndigits=0, round_mode="half_towards_infinity"), pa.int64())
        band = pc.divide(cents, pa.scalar(100_000, pa.int64()))
        return pa.table({"cust": t["o_custkey"], "band": band,
                         "key": t["o_orderkey"],
                         "us": pc.cast(t["o_orderdate"], pa.int64())})

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        W = 365 * 86_400_000_000
        for (_, _), g in df.groupby(["cust", "band"]):
            if len(g) < 2:
                continue
            g = g.sort_values(["us", "key"])
            us = g["us"].to_numpy()
            key = g["key"].to_numpy()
            # for each row, matching later rows within the window
            j = np.searchsorted(us, us + W, side="right")
            for i in range(len(g)):
                for m in range(i + 1, j[i]):
                    a, b = (key[i], key[m]) if key[i] < key[m] else (key[m], key[i])
                    out.append((a, b))
        if not out:
            return pd.DataFrame({"key_a": pd.Series([], dtype="int64"),
                                 "key_b": pd.Series([], dtype="int64")})
        return pd.DataFrame(out, columns=["key_a", "key_b"]).drop_duplicates()

    p = bucketed_group_reduce(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["cust", "band"], pairs,
    ).to_pandas().drop_duplicates()
    out = p.sort_values(["key_a", "key_b"], ignore_index=True)
    return _i64(out, ["key_a", "key_b"])


SQL_DUPLICATE_INVOICES = """
SELECT a.o_orderkey AS key_a, b.o_orderkey AS key_b
FROM orders a JOIN orders b
  ON a.o_custkey = b.o_custkey
 AND CAST(ROUND(a.o_totalprice * 100) AS BIGINT) // 100000
     = CAST(ROUND(b.o_totalprice * 100) AS BIGINT) // 100000
 AND a.o_orderkey < b.o_orderkey
 AND abs(EPOCH_US(a.o_orderdate) - EPOCH_US(b.o_orderdate)) <= 365 * 86400000000
ORDER BY 1, 2
"""


def q_stale_parts_by_brand(sf_dir: str) -> pd.DataFrame:
    """Stale-catalog audit: parts with NO shipment in the final year,
    counted per brand — the big-big anti-join with a dimension rollup.
    Active part keys come from a date-filtered distinct reduce; the anti is
    the tagged-union co-group (no broadcast of either key set); the brand
    rollup is a tiny grouped count."""
    from ..functions.relational import bucketed_group_reduce

    cutoff = pa.scalar(datetime(2001, 1, 1), pa.timestamp("us"))
    parts = _t(sf_dir, "part", ["p_partkey", "p_brand"])
    active = _t(sf_dir, "lineitem", ["l_partkey"],
                filter=pads.field("l_shipdate") >= cutoff)

    def p_part(t: pa.Table) -> pa.Table:
        return pa.table({"k": pc.cast(t["p_partkey"], pa.int64()),
                         "brand": t["p_brand"],
                         "act": pa.nulls(t.num_rows, pa.int64()).fill_null(0)})

    def a_part(t: pa.Table) -> pa.Table:
        g = pa.table({"k": pc.cast(t["l_partkey"], pa.int64())}).group_by(["k"]).aggregate([])
        return pa.table({"k": g["k"],
                         "brand": pa.nulls(g.num_rows, pa.string()),
                         "act": pa.nulls(g.num_rows, pa.int64()).fill_null(1)})

    u = parts.map_batches(p_part, batch_format="pyarrow", zero_copy_batch=True).union(
        active.map_batches(a_part, batch_format="pyarrow", zero_copy_batch=True))

    def anti(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("k").agg(act=("act", "sum"), brand=("brand", "first"))
        # "first" may pick the NULL side's row — recover the brand from any
        # non-null value in the group instead
        brand = df.dropna(subset=["brand"]).groupby("k")["brand"].first()
        g["brand"] = brand.reindex(g.index)
        stale = g[(g["act"] == 0) & g["brand"].notna()]
        return stale.reset_index()[["brand"]].groupby("brand", as_index=False).size().rename(
            columns={"size": "n_stale"})

    agg = bucketed_group_reduce(u, ["k"], anti).to_pandas()
    out = agg.groupby("brand", as_index=False)["n_stale"].sum().sort_values(
        "brand", ignore_index=True)
    return _i64(out, ["n_stale"])


SQL_STALE_PARTS_BY_BRAND = """
SELECT p.p_brand AS brand, COUNT(*) AS n_stale
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_partkey = p.p_partkey AND l.l_shipdate >= TIMESTAMP '2001-01-01')
GROUP BY 1 ORDER BY 1
"""


def q_charclass_profile(sf_dir: str) -> pd.DataFrame:
    """Character-class profile per source over the messy corpus (alpha /
    digit / whitespace / other shares) — the encoding-health signal scrub
    pipelines gate on.  Four vectorized RE2 count kernels per batch, scalar
    partials reduce; shares are exact integer ratios rounded once."""
    src = ensure_messy_parquet(sf_dir)
    ds = rd.read_parquet(src, columns=["source", "text"])

    def part(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t["text"], "")
        total = pc.cast(pc.utf8_length(text), pa.int64())
        alpha = pc.cast(pc.count_substring_regex(text, "[a-zA-Z]"), pa.int64())
        digit = pc.cast(pc.count_substring_regex(text, "[0-9]"), pa.int64())
        space = pc.cast(pc.count_substring_regex(text, r"\s"), pa.int64())
        g = pa.table({"source": t["source"], "total": total, "alpha": alpha,
                      "digit": digit, "space": space}).group_by(["source"]).aggregate(
            [("total", "sum"), ("alpha", "sum"), ("digit", "sum"), ("space", "sum")])
        return pa.table({"source": g["source"], "total": g["total_sum"],
                         "alpha": g["alpha_sum"], "digit": g["digit_sum"],
                         "space": g["space_sum"]})

    agg = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = agg.groupby("source", as_index=False).sum()
    for c in ("alpha", "digit", "space"):
        out[f"{c}_share"] = (out[c] / out["total"]).pipe(_rd)
    out["other_share"] = (
        (out["total"] - out["alpha"] - out["digit"] - out["space"]) / out["total"]).pipe(_rd)
    out = out[["source", "total", "alpha_share", "digit_share", "space_share", "other_share"]]
    return _i64(out.sort_values("source", ignore_index=True), ["total"])


SQL_CHARCLASS_PROFILE = f"""
WITH c AS (
  SELECT source,
         SUM(length(text)) AS total,
         SUM(len(regexp_extract_all(text, '[a-zA-Z]'))) AS alpha,
         SUM(len(regexp_extract_all(text, '[0-9]'))) AS digit,
         SUM(len(regexp_extract_all(text, '\\s'))) AS space
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/messy.parquet')
  GROUP BY 1)
SELECT source, CAST(total AS BIGINT) AS total,
       ROUND(alpha / CAST(total AS DOUBLE), 6) AS alpha_share,
       ROUND(digit / CAST(total AS DOUBLE), 6) AS digit_share,
       ROUND(space / CAST(total AS DOUBLE), 6) AS space_share,
       ROUND((total - alpha - digit - space) / CAST(total AS DOUBLE), 6) AS other_share
FROM c ORDER BY 1
"""


def q_purchase_value_drift(sf_dir: str) -> pd.DataFrame:
    """Per-user purchase-value drift: value of the LAST purchase minus the
    FIRST (argmin/argmax-with-payload at user cardinality — per-batch
    first/last candidates, bucketed merge), then scalar drift moments; the
    driver sees three numbers."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id", "value"],
            filter=pads.field("event_type") == "purchase")

    def part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(us=df["ts"].astype("int64"))
        df = df.sort_values(["user_id", "us", "event_id"], kind="stable")
        f = df.groupby("user_id", as_index=False).first()[["user_id", "us", "event_id", "value"]]
        l = df.groupby("user_id", as_index=False).last()[["user_id", "us", "event_id", "value"]]
        f.columns = ["user_id", "f_us", "f_id", "f_v"]
        l.columns = ["user_id", "l_us", "l_id", "l_v"]
        return f.merge(l, on="user_id")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        a = df.sort_values(["user_id", "f_us", "f_id"], kind="stable").groupby(
            "user_id", as_index=False).first()[["user_id", "f_v"]]
        b = df.sort_values(["user_id", "l_us", "l_id"], kind="stable").groupby(
            "user_id", as_index=False).last()[["user_id", "l_v"]]
        return a.merge(b, on="user_id")

    per_user = bucketed_group_reduce(
        ds.map_batches(part, batch_format="pandas"), ["user_id"], merge)

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        d = ((df["l_v"] - df["f_v"]) * 100).round().astype(np.int64)
        return pd.DataFrame({"n": [len(d)], "s": [int(d.sum())],
                             "pos": [int((d > 0).sum())]})

    p = per_user.map_batches(moments, batch_format="pandas").to_pandas()
    n = int(p["n"].sum())
    out = pd.DataFrame({
        "n_users": [n],
        "avg_drift": [_rd(float(p["s"].sum()) / n / 100.0, 6)],
        "n_increased": [int(p["pos"].sum())],
    })
    return _i64(out, ["n_users", "n_increased"])


SQL_PURCHASE_VALUE_DRIFT = """
WITH p AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'),
r AS (
  SELECT user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS a,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS z
  FROM p),
u AS (
  SELECT user_id,
         CAST(ROUND((MAX(CASE WHEN z = 1 THEN value END)
                     - MAX(CASE WHEN a = 1 THEN value END)) * 100) AS BIGINT) AS d_c
  FROM r GROUP BY 1)
SELECT COUNT(*) AS n_users,
       ROUND(SUM(d_c) / CAST(COUNT(*) AS DOUBLE) / 100.0, 6) AS avg_drift,
       CAST(SUM(CASE WHEN d_c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_increased
FROM u
"""


def q_peak_concurrent_sessions(sf_dir: str) -> pd.DataFrame:
    """Peak session concurrency (interval stabbing): how many gap-sessions
    were simultaneously active at the busiest minute, and the first minute
    that peak occurs.  Per-user buckets segment sessions and emit ±1 diff
    events at minute granularity; one day-scale grouped sum + a cumulative
    max over the |minutes|-bounded series closes it — no per-minute
    expansion ever materializes on the Ray side (the SQL oracle brute-
    forces the expansion)."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts"])
    MIN_US = 60_000_000

    def diffs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"])
        u = df["user_id"].to_numpy()
        us = df["ts"].astype("int64").to_numpy()
        new = np.r_[True, (u[1:] != u[:-1]) | (us[1:] - us[:-1] > 1_800_000_000)]
        sess = np.cumsum(new) - 1
        g = pd.DataFrame({"sess": sess, "us": us}).groupby("sess", as_index=False).agg(
            lo=("us", "min"), hi=("us", "max"))
        start = (g["lo"] // MIN_US).to_numpy(dtype=np.int64)
        end = (g["hi"] // MIN_US).to_numpy(dtype=np.int64) + 1  # active through end minute
        return pd.DataFrame({"minute_id": np.r_[start, end],
                             "v": np.r_[np.ones(len(start), np.int64),
                                        -np.ones(len(end), np.int64)]})

    d = bucketed_group_reduce(ds, ["user_id"], diffs)
    agg = grouped_sums(d, ["minute_id"], {"v": "v"}).to_pandas().sort_values(
        "minute_id", ignore_index=True)
    run = agg["v"].cumsum().to_numpy()
    peak = int(run.max())
    first = int(agg["minute_id"].to_numpy()[int(np.argmax(run))])
    return pd.DataFrame({"peak": pd.Series([peak], dtype="int64"),
                         "first_minute_id": pd.Series([first], dtype="int64")})


SQL_PEAK_CONCURRENT_SESSIONS = """
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR EPOCH_US(ts) - EPOCH_US(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, EPOCH_US(ts) AS us,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
), spans AS (
  SELECT MIN(us) // 60000000 AS m0, MAX(us) // 60000000 AS m1
  FROM sess GROUP BY user_id, session_id
), minutes AS (
  SELECT UNNEST(range(m0, m1 + 1)) AS minute_id FROM spans
), conc AS (
  SELECT minute_id, COUNT(*) AS c FROM minutes GROUP BY 1)
SELECT MAX(c) AS peak,
       CAST(MIN(minute_id) FILTER (c = (SELECT MAX(c) FROM conc)) AS BIGINT)
         AS first_minute_id
FROM conc
"""


def q_top_supplier_per_nation(sf_dir: str) -> pd.DataFrame:
    """Grouped argmax over the supplier dimension: each nation's
    highest-balance supplier (deterministic suppkey tie-break) via the
    per-block-pruned grouped top-k."""
    from ..functions.relational import grouped_topk

    ds = _t(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"])
    out = grouped_topk(
        ds, ["s_nationkey"], ["s_acctbal", "s_suppkey"], [True, False], 1
    ).to_pandas().sort_values("s_nationkey", ignore_index=True)
    out["s_acctbal"] = out["s_acctbal"].pipe(_rd, 2)
    return _i64(out[["s_nationkey", "s_suppkey", "s_name", "s_acctbal"]],
                ["s_nationkey", "s_suppkey"])


SQL_TOP_SUPPLIER_PER_NATION = """
WITH r AS (
  SELECT s_nationkey, s_suppkey, s_name, s_acctbal,
         ROW_NUMBER() OVER (PARTITION BY s_nationkey
                            ORDER BY s_acctbal DESC, s_suppkey) AS rn
  FROM supplier)
SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey, s_suppkey, s_name,
       ROUND(s_acctbal, 2) AS s_acctbal
FROM r WHERE rn = 1 ORDER BY 1
"""


def q_balance_ks_test(sf_dir: str) -> pd.DataFrame:
    """Two-sample Kolmogorov–Smirnov D between supplier and customer
    account-balance distributions — the distribution-drift test, EXACT
    from two one-pass cent histograms: acctbal has a bounded range, so the
    merged support is ≤ ~1.1M bins regardless of row count, and D is the
    max |ΔCDF| over that bounded grid on the driver."""
    def hist(table: str, col: str) -> pd.DataFrame:
        ds = _t(sf_dir, table, [col])

        def part(t: pa.Table) -> pa.Table:
            cents = pc.cast(pc.round(pc.multiply(t[col], 100.0), ndigits=0, round_mode="half_towards_infinity"), pa.int64())
            g = pa.table({"bin": cents}).group_by(["bin"]).aggregate([([], "count_all")])
            return pa.table({"bin": g["bin"], "n": pc.cast(g["count_all"], pa.int64())})

        p = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
        return p.groupby("bin", as_index=False)["n"].sum()

    a = hist("supplier", "s_acctbal")
    b = hist("customer", "c_acctbal")
    na, nb = int(a["n"].sum()), int(b["n"].sum())
    grid = np.union1d(a["bin"].to_numpy(dtype=np.int64), b["bin"].to_numpy(dtype=np.int64))
    ca = np.zeros(len(grid), dtype=np.int64)
    cb = np.zeros(len(grid), dtype=np.int64)
    ca[np.searchsorted(grid, a["bin"].to_numpy(dtype=np.int64))] = a["n"].to_numpy()
    cb[np.searchsorted(grid, b["bin"].to_numpy(dtype=np.int64))] = b["n"].to_numpy()
    d = np.abs(np.cumsum(ca) / na - np.cumsum(cb) / nb).max()
    return pd.DataFrame({"n_supplier": pd.Series([na], dtype="int64"),
                         "n_customer": pd.Series([nb], dtype="int64"),
                         "ks_d": [_rd(float(d), 6)]})


SQL_BALANCE_KS_TEST = """
WITH sa AS (SELECT CAST(ROUND(s_acctbal * 100) AS BIGINT) AS v FROM supplier),
sb AS (SELECT CAST(ROUND(c_acctbal * 100) AS BIGINT) AS v FROM customer),
u AS (SELECT v, 1 AS a, 0 AS b FROM sa UNION ALL SELECT v, 0, 1 FROM sb),
c AS (
  SELECT v,
         SUM(a) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS ca,
         SUM(b) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cb
  FROM u),
last AS (SELECT v, MAX(ca) AS ca, MAX(cb) AS cb FROM c GROUP BY v)
SELECT (SELECT COUNT(*) FROM sa) AS n_supplier,
       (SELECT COUNT(*) FROM sb) AS n_customer,
       ROUND(MAX(ABS(ca / CAST((SELECT COUNT(*) FROM sa) AS DOUBLE)
                   - cb / CAST((SELECT COUNT(*) FROM sb) AS DOUBLE))), 6) AS ks_d
FROM last
"""


def q_benford_prices(sf_dir: str) -> pd.DataFrame:
    """Benford's-law first-digit audit of order totals (the classic
    books-cooking screen): digit shares vs log₁₀(1+1/d) expectation.
    Leading digit falls out of integer cents (scale shifts don't change
    it); one tiny grouped count, driver closes the expectation columns."""
    ds = _t(sf_dir, "orders", ["o_totalprice"])

    def part(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0), ndigits=0, round_mode="half_towards_infinity"), pa.int64())
        s = pc.cast(cents, pa.string())
        d = pc.cast(pc.utf8_slice_codeunits(s, 0, 1), pa.int64())
        g = pa.table({"digit": d}).group_by(["digit"]).aggregate([([], "count_all")])
        return pa.table({"digit": g["digit"], "n": pc.cast(g["count_all"], pa.int64())})

    agg = grouped_sums(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["digit"], {"n": "n"}, reduce="driver",
    ).to_pandas().sort_values("digit", ignore_index=True)
    total = int(agg["n"].sum())
    agg["share"] = (agg["n"] / total).pipe(_rd)
    agg["benford"] = _rd(np.log10(1.0 + 1.0 / agg["digit"].to_numpy(dtype=np.float64)), 6)
    return _i64(agg, ["digit", "n"])


SQL_BENFORD_PRICES = """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
              AS BIGINT) AS digit
  FROM orders),
c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1),
t AS (SELECT SUM(n) AS total FROM c)
SELECT digit, n,
       ROUND(n / CAST(t.total AS DOUBLE), 6) AS share,
       ROUND(log10(1.0 + 1.0 / digit), 6) AS benford
FROM c CROSS JOIN t ORDER BY digit
"""


def q_acf_multi_lag(sf_dir: str) -> pd.DataFrame:
    """Autocorrelation function at lags 1–5 of the GLOBAL hourly event-count
    series — the periodicity fingerprint.  One distributed hourly count;
    the ACF over the |hours|-bounded series is driver numpy, matching the
    SQL LAG-per-lag construction exactly (pairs are consecutive present
    rows in hour order)."""
    ds = _t(sf_dir, "events", ["ts"])

    def hour(t: pa.Table) -> pa.Table:
        return pa.table({"hour_id": pc.divide(pc.cast(t["ts"], pa.int64()),
                                              pa.scalar(3_600_000_000, pa.int64()))})

    agg = grouped_sums(
        ds.map_batches(hour, batch_format="pyarrow", zero_copy_batch=True),
        ["hour_id"], {}, "n",
    ).to_pandas().sort_values("hour_id", ignore_index=True)
    x = agg["n"].to_numpy(dtype=np.float64)
    rows = []
    for lag in range(1, 6):
        a, b = x[lag:], x[:-lag]
        r = float(np.corrcoef(a, b)[0, 1]) if len(a) >= 2 and a.std() > 0 and b.std() > 0 else np.nan
        rows.append((lag, _rd(r, 6), len(a)))
    return _i64(pd.DataFrame(rows, columns=["lag", "acf", "n_pairs"]), ["lag", "n_pairs"])


SQL_ACF_MULTI_LAG = """
WITH h AS (
  SELECT EPOCH_US(ts) // 3600000000 AS hour_id, COUNT(*) AS n
  FROM events GROUP BY 1),
l AS (
  SELECT n,
         LAG(n, 1) OVER w AS p1, LAG(n, 2) OVER w AS p2, LAG(n, 3) OVER w AS p3,
         LAG(n, 4) OVER w AS p4, LAG(n, 5) OVER w AS p5
  FROM h WINDOW w AS (ORDER BY hour_id))
SELECT * FROM (
  SELECT 1 AS lag, ROUND(corr(n, p1), 6) AS acf, COUNT(p1) AS n_pairs FROM l
  UNION ALL SELECT 2, ROUND(corr(n, p2), 6), COUNT(p2) FROM l
  UNION ALL SELECT 3, ROUND(corr(n, p3), 6), COUNT(p3) FROM l
  UNION ALL SELECT 4, ROUND(corr(n, p4), 6), COUNT(p4) FROM l
  UNION ALL SELECT 5, ROUND(corr(n, p5), 6), COUNT(p5) FROM l
) ORDER BY lag
"""


def q_orders_seasonal_share(sf_dir: str) -> pd.DataFrame:
    """Seasonality index: each calendar month's share of its year's order
    count (percent-of-total window on the time hierarchy).  One distributed
    (year, month) count; the share window runs on the bounded grid."""
    ds = _t(sf_dir, "orders", ["o_orderdate"])

    def ym(df: pd.DataFrame) -> pd.DataFrame:
        dt = pd.to_datetime(df["o_orderdate"])
        return pd.DataFrame({"year": dt.dt.year.astype(np.int64),
                             "month": dt.dt.month.astype(np.int64)})

    agg = grouped_sums(
        ds.map_batches(ym, batch_format="pandas"), ["year", "month"], {}, "n",
    ).to_pandas()
    agg["share"] = (agg["n"] / agg.groupby("year")["n"].transform("sum")).pipe(_rd)
    return _i64(agg.sort_values(["year", "month"], ignore_index=True),
                ["year", "month", "n"])


SQL_ORDERS_SEASONAL_SHARE = """
WITH c AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
         CAST(month(o_orderdate) AS BIGINT) AS month, COUNT(*) AS n
  FROM orders GROUP BY 1, 2)
SELECT year, month, n,
       ROUND(n / CAST(SUM(n) OVER (PARTITION BY year) AS DOUBLE), 6) AS share
FROM c ORDER BY 1, 2
"""


def q_doc_length_quality_corr(sf_dir: str) -> pd.DataFrame:
    """Metric-relationship probe: Pearson correlation between document
    length (words) and stopword rate across the corpus, from one mergeable
    moments pass over per-doc metrics computed in-batch."""
    from ..functions.text import n_words, stopword_hits

    docs = _t(sf_dir, "documents", ["text"])

    def part(t: pa.Table) -> pa.Table:
        nw = pc.cast(n_words(t["text"]), pa.int64()).to_numpy(zero_copy_only=False).astype(np.float64)
        hits = stopword_hits(t["text"]).to_numpy(zero_copy_only=False).astype(np.float64)
        ratio = hits / nw
        return pa.table({
            "n": pa.array([len(nw)], pa.int64()),
            "sx": pa.array([float(nw.sum())]), "sy": pa.array([float(ratio.sum())]),
            "sxx": pa.array([float((nw * nw).sum())]),
            "syy": pa.array([float((ratio * ratio).sum())]),
            "sxy": pa.array([float((nw * ratio).sum())]),
        })

    p = docs.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    n = int(p["n"].sum())
    sx, sy = p["sx"].sum(), p["sy"].sum()
    sxx, syy, sxy = p["sxx"].sum(), p["syy"].sum(), p["sxy"].sum()
    cov = sxy - sx * sy / n
    r = cov / np.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
    return pd.DataFrame({"n_docs": pd.Series([n], dtype="int64"),
                         "corr_len_stopratio": [_rd(float(r), 6)]})


SQL_DOC_LENGTH_QUALITY_CORR = f"""
WITH q AS (
  SELECT len(string_split(text, ' ')) AS nw,
         len(regexp_extract_all(text, '{STOPWORD_PATTERN}'))
           / CAST(len(string_split(text, ' ')) AS DOUBLE) AS ratio
  FROM documents)
SELECT COUNT(*) AS n_docs, ROUND(corr(nw, ratio), 6) AS corr_len_stopratio FROM q
"""


def q_priority_mix_chi2(sf_dir: str) -> pd.DataFrame:
    """Order-priority mix drift: χ² independence statistic of the
    (year × priority) contingency table — has the priority mix changed
    across years?  One bounded grouped count; the statistic (including
    zero cells of the full grid) folds on the driver."""
    ds = _t(sf_dir, "orders", ["o_orderdate", "o_orderpriority"])

    def ym(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"year": pd.to_datetime(df["o_orderdate"]).dt.year.astype(np.int64),
                             "prio": df["o_orderpriority"]})

    agg = grouped_sums(
        ds.map_batches(ym, batch_format="pandas"), ["year", "prio"], {}, "n",
    ).to_pandas()
    tab = agg.pivot_table(index="year", columns="prio", values="n", fill_value=0,
                          aggfunc="sum")
    obs = tab.to_numpy(dtype=np.float64)
    total = obs.sum()
    exp = np.outer(obs.sum(axis=1), obs.sum(axis=0)) / total
    chi2 = float(((obs - exp) ** 2 / exp).sum())
    return pd.DataFrame({
        "n_years": pd.Series([obs.shape[0]], dtype="int64"),
        "n_priorities": pd.Series([obs.shape[1]], dtype="int64"),
        "chi2": [_rd(chi2, 6)],
    })


SQL_PRIORITY_MIX_CHI2 = """
WITH c AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS year, o_orderpriority AS prio,
         COUNT(*) AS n
  FROM orders GROUP BY 1, 2),
grid AS (
  SELECT y.year, p.prio, COALESCE(c.n, 0) AS n
  FROM (SELECT DISTINCT year FROM c) y
  CROSS JOIN (SELECT DISTINCT prio FROM c) p
  LEFT JOIN c USING (year, prio)),
m AS (
  SELECT year, prio, n,
         SUM(n) OVER (PARTITION BY year) AS ry,
         SUM(n) OVER (PARTITION BY prio) AS cp,
         SUM(n) OVER () AS t
  FROM grid)
SELECT (SELECT COUNT(DISTINCT year) FROM c) AS n_years,
       (SELECT COUNT(DISTINCT prio) FROM c) AS n_priorities,
       ROUND(SUM(pow(n - ry * cp / CAST(t AS DOUBLE), 2) / (ry * cp / CAST(t AS DOUBLE))), 6)
         AS chi2
FROM m
"""


def q_balance_anova_f(sf_dir: str) -> pd.DataFrame:
    """One-way ANOVA F statistic: does mean account balance differ across
    market segments?  Per-segment (n, Σx, Σx²) moment partials from one
    pass close both the between- and within-group sums of squares on the
    driver — the textbook decomposition, no raw value ever shuffles."""
    ds = _t(sf_dir, "customer", ["c_mktsegment", "c_acctbal"])

    def part(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"seg": t["c_mktsegment"].to_numpy(zero_copy_only=False),
                           "x": t["c_acctbal"].to_numpy(zero_copy_only=False)})
        g = df.groupby("seg", as_index=False).agg(
            n=("x", "size"), sx=("x", "sum"), sxx=("x", lambda v: float((v * v).sum())))
        return pa.Table.from_pandas(g, preserve_index=False)

    p = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    g = p.groupby("seg", as_index=False).agg(n=("n", "sum"), sx=("sx", "sum"), sxx=("sxx", "sum"))
    n = g["n"].to_numpy(dtype=np.float64)
    sx = g["sx"].to_numpy()
    sxx = g["sxx"].to_numpy()
    N, k = n.sum(), len(g)
    grand = sx.sum() / N
    ssb = float((n * (sx / n - grand) ** 2).sum())
    ssw = float((sxx - sx * sx / n).sum())
    f = (ssb / (k - 1)) / (ssw / (N - k))
    return pd.DataFrame({"n_customers": pd.Series([int(N)], dtype="int64"),
                         "n_segments": pd.Series([int(k)], dtype="int64"),
                         "f_stat": [_rd(float(f), 6)]})


SQL_BALANCE_ANOVA_F = """
WITH s AS (
  SELECT c_mktsegment AS seg, COUNT(*) AS n, SUM(c_acctbal) AS sx,
         SUM(c_acctbal * c_acctbal) AS sxx
  FROM customer GROUP BY 1),
t AS (SELECT SUM(n) AS bign, COUNT(*) AS k, SUM(sx) / SUM(n) AS grand FROM s)
SELECT CAST(t.bign AS BIGINT) AS n_customers, CAST(t.k AS BIGINT) AS n_segments,
       ROUND((SUM(n * pow(sx / n - t.grand, 2)) / (t.k - 1))
             / (SUM(sxx - sx * sx / n) / (t.bign - t.k)), 6) AS f_stat
FROM s CROSS JOIN t GROUP BY t.bign, t.k, t.grand
"""


def q_price_p99_exact(sf_dir: str) -> pd.DataFrame:
    """EXACT p50/p95/p99 (discrete) of the extended price — a NEAR-UNIQUE
    column where a one-pass value histogram would be ~|rows| on the driver
    — via the two-phase refinement: a $100-bucket count histogram locates
    each target quantile's bucket, then one filtered pass builds exact cent
    counts for ONLY those buckets.  Driver state stays at
    coarse-buckets + 3 × one-bucket-of-cents regardless of row count."""
    Q = [0.5, 0.95, 0.99]
    COARSE = 10_000
    ds = _t(sf_dir, "lineitem", ["l_extendedprice"]).materialize()

    def coarse_part(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0), ndigits=0, round_mode="half_towards_infinity"), pa.int64())
        g = pa.table({"cb": pc.divide(cents, pa.scalar(COARSE, pa.int64()))}).group_by(
            ["cb"]).aggregate([([], "count_all")])
        return pa.table({"cb": g["cb"], "n": pc.cast(g["count_all"], pa.int64())})

    coarse = ds.map_batches(coarse_part, batch_format="pyarrow", zero_copy_batch=True
                            ).to_pandas().groupby("cb", as_index=False)["n"].sum().sort_values("cb")
    cum = coarse["n"].cumsum().to_numpy()
    total = int(cum[-1])
    cbs = coarse["cb"].to_numpy(dtype=np.int64)
    targets = {}
    for q in Q:
        rank = max(1, int(np.ceil(q * total)))
        i = int(np.searchsorted(cum, rank))
        targets[q] = (int(cbs[i]), int(cum[i - 1]) if i else 0, rank)
    want = np.array(sorted({cb for cb, _, _ in targets.values()}), dtype=np.int64)

    def fine_part(t: pa.Table, *, w=want) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0), ndigits=0, round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy(zero_copy_only=False)
        m = np.isin(cents // COARSE, w)
        u, c = np.unique(cents[m], return_counts=True)
        return pa.table({"bin": pa.array(u), "n": pa.array(c.astype(np.int64))})

    fine = ds.map_batches(fine_part, batch_format="pyarrow", zero_copy_batch=True
                          ).to_pandas().groupby("bin", as_index=False)["n"].sum().sort_values("bin")
    rows = []
    for q in Q:
        cb, before, rank = targets[q]
        g = fine[fine["bin"] // COARSE == cb]
        c2 = before + g["n"].cumsum().to_numpy()
        v = int(g["bin"].to_numpy()[np.searchsorted(c2, rank)])
        rows.append((q, _rd(v / 100.0, 2)))
    out = pd.DataFrame(rows, columns=["q", "price"])
    out["q"] = out["q"].astype(np.float64)
    return out


SQL_PRICE_P99_EXACT = """
SELECT * FROM (
  SELECT 0.5 AS q, ROUND(quantile_disc(l_extendedprice, 0.5), 2) AS price FROM lineitem
  UNION ALL SELECT 0.95, ROUND(quantile_disc(l_extendedprice, 0.95), 2) FROM lineitem
  UNION ALL SELECT 0.99, ROUND(quantile_disc(l_extendedprice, 0.99), 2) FROM lineitem
) ORDER BY q
"""


def q_return_rate_monthly(sf_dir: str) -> pd.DataFrame:
    """Return-rate trend: share of lineitems flagged 'R' per ship month —
    a conditional-share time series from one bounded grouped count."""
    ds = _t(sf_dir, "lineitem", ["l_shipdate", "l_returnflag"])

    def part(t: pa.Table) -> pa.Table:
        micros = pc.cast(t["l_shipdate"], pa.int64()).to_numpy(zero_copy_only=False)
        dt = pd.to_datetime(micros, unit="us")
        month = (dt.year.to_numpy() * 12 + (dt.month.to_numpy() - 1)).astype(np.int64)
        r = (t["l_returnflag"].to_numpy(zero_copy_only=False) == "R").astype(np.int64)
        g = pd.DataFrame({"month_id": month, "ret": r}).groupby(
            "month_id", as_index=False).agg(n=("ret", "size"), n_returned=("ret", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = agg.groupby("month_id", as_index=False).agg(
        n=("n", "sum"), n_returned=("n_returned", "sum"))
    out["return_rate"] = (out["n_returned"] / out["n"]).pipe(_rd)
    return _i64(out.sort_values("month_id", ignore_index=True),
                ["month_id", "n", "n_returned"])


SQL_RETURN_RATE_MONTHLY = """
SELECT CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS BIGINT) AS month_id,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
       ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS return_rate
FROM lineitem GROUP BY 1 ORDER BY 1
"""


def q_weekend_lift(sf_dir: str) -> pd.DataFrame:
    """Weekend lift per event type: observed weekend share vs the 2/7
    uniform expectation.  Day-of-week from pure epoch-day arithmetic
    ((days + 4) % 7, anchored on 1970-01-01 = Thursday) so both engines
    share one convention; one bounded grouped count."""
    ds = _t(sf_dir, "events", ["ts", "event_type"])

    def part(t: pa.Table) -> pa.Table:
        days = pc.divide(pc.cast(t["ts"], pa.int64()),
                         pa.scalar(86_400_000_000, pa.int64())).to_numpy(zero_copy_only=False)
        dow = (days + 4) % 7  # 0=Sunday … 6=Saturday
        wk = np.isin(dow, (0, 6)).astype(np.int64)
        g = pd.DataFrame({"event_type": t["event_type"].to_numpy(zero_copy_only=False),
                          "wk": wk}).groupby("event_type", as_index=False).agg(
            n=("wk", "size"), n_weekend=("wk", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = agg.groupby("event_type", as_index=False).agg(
        n=("n", "sum"), n_weekend=("n_weekend", "sum"))
    out["weekend_share"] = (out["n_weekend"] / out["n"]).pipe(_rd)
    out["lift"] = (out["n_weekend"] / out["n"] / (2.0 / 7.0)).pipe(_rd)
    return _i64(out.sort_values("event_type", ignore_index=True), ["n", "n_weekend"])


SQL_WEEKEND_LIFT = """
WITH d AS (
  SELECT event_type,
         CASE WHEN ((EPOCH_US(ts) // 86400000000) + 4) % 7 IN (0, 6)
              THEN 1 ELSE 0 END AS wk
  FROM events)
SELECT event_type, COUNT(*) AS n, CAST(SUM(wk) AS BIGINT) AS n_weekend,
       ROUND(SUM(wk) / CAST(COUNT(*) AS DOUBLE), 6) AS weekend_share,
       ROUND(SUM(wk) / CAST(COUNT(*) AS DOUBLE) / (2.0 / 7.0), 6) AS lift
FROM d GROUP BY 1 ORDER BY 1
"""


def ensure_media_parquet(sf_dir: str) -> str:
    """Materialize the real-payload media corpus (sources/media.py: genuine
    PNG/WAV/VID0 bytes + ground-truth stats) in the oracle-artifact dir."""
    import os as _os

    from ..sources.media import build_media_tables

    sf = _sf_of(sf_dir)
    n = max(48, min(4800, int(4800 * sf)))
    _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "media_frames.parquet"),
        lambda: build_media_tables(n)[1],
    )
    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "media.parquet"),
        lambda: build_media_tables(n)[0],
    )


def ensure_image_dups_parquet(sf_dir: str) -> str:
    import os as _os

    from ..sources.media import build_image_dup_table

    sf = _sf_of(sf_dir)
    n = max(30, min(3000, int(3000 * sf)))
    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "media_dups.parquet"),
        lambda: build_image_dup_table(n),
    )


def q_image_content_dedup(sf_dir: str) -> pd.DataFrame:
    """Multimodal content dedup: byte-DIFFERENT PNG encodings of the same
    pixels (Up-filter re-encode, ancillary-chunk copies) collapse to one
    group via decoded-pixel digests (PixelDigest actor pool); a planted
    one-pixel near-miss stays its own group.  Oracle = synthesis-time truth
    — payload-level hashing provably cannot reproduce it."""
    from ..functions.relational import bucketed_group_reduce
    from ..stages.multimodal import PixelDigest

    src = ensure_image_dups_parquet(sf_dir)
    ds = rd.read_parquet(src, columns=["media_id", "payload"])
    digests = ds.map_batches(
        PixelDigest,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
        zero_copy_batch=True,
    )

    def rep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["dup_of"] = df.groupby("digest")["media_id"].transform("min")
        return df[["media_id", "dup_of"]]

    out = bucketed_group_reduce(digests, ["digest"], rep).to_pandas()
    return out.sort_values("media_id", ignore_index=True)


SQL_IMAGE_CONTENT_DEDUP = f"""
SELECT media_id, dup_of
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/media_dups.parquet')
ORDER BY media_id
"""


def ensure_audio_dups_parquet(sf_dir: str) -> str:
    import os as _os

    from ..sources.media import build_audio_dup_table

    sf = _sf_of(sf_dir)
    n = max(40, min(4000, int(4000 * sf)))
    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "audio_dups.parquet"),
        lambda: build_audio_dup_table(n),
    )


def q_audio_fingerprint_dedup(sf_dir: str) -> pd.DataFrame:
    """Acoustic dedup: exact-gain re-masters (byte-different WAVs) collapse
    via the gain-invariant block-energy sign fingerprint (AudioFingerprint
    actor pool); planted same-length different-noise clips stay their own
    groups.  Oracle = synthesis-time truth."""
    from ..functions.relational import bucketed_group_reduce
    from ..stages.multimodal import AudioFingerprint

    src = ensure_audio_dups_parquet(sf_dir)
    ds = rd.read_parquet(src, columns=["media_id", "payload"])
    digests = ds.map_batches(
        AudioFingerprint,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
        zero_copy_batch=True,
    )

    def rep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["dup_of"] = df.groupby("digest")["media_id"].transform("min")
        return df[["media_id", "dup_of"]]

    out = bucketed_group_reduce(digests, ["digest"], rep).to_pandas()
    return out.sort_values("media_id", ignore_index=True)


SQL_AUDIO_FINGERPRINT_DEDUP = f"""
SELECT media_id, dup_of
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/audio_dups.parquet')
ORDER BY media_id
"""


def ensure_video_dups_parquet(sf_dir: str) -> str:
    import os as _os

    from ..sources.media import build_video_dup_table

    sf = _sf_of(sf_dir)
    n = max(24, min(2400, int(2400 * sf)))
    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "video_dups.parquet"),
        lambda: build_video_dup_table(n),
    )


def q_video_content_dedup(sf_dir: str) -> pd.DataFrame:
    """Video content dedup: containers re-encoded with a different frame
    filter (byte-different payloads, pixel-identical frames) collapse via
    decoded-frame digests (VideoDigest actor pool); a one-pixel one-frame
    near-miss stays its own group.  Oracle = synthesis-time truth."""
    from ..functions.relational import bucketed_group_reduce
    from ..stages.multimodal import VideoDigest

    src = ensure_video_dups_parquet(sf_dir)
    ds = rd.read_parquet(src, columns=["media_id", "payload"])
    digests = ds.map_batches(
        VideoDigest,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
        zero_copy_batch=True,
    )

    def rep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["dup_of"] = df.groupby("digest")["media_id"].transform("min")
        return df[["media_id", "dup_of"]]

    out = bucketed_group_reduce(digests, ["digest"], rep).to_pandas()
    return out.sort_values("media_id", ignore_index=True)


SQL_VIDEO_CONTENT_DEDUP = f"""
SELECT media_id, dup_of
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/video_dups.parquet')
ORDER BY media_id
"""


def q_media_decode_real(sf_dir: str) -> pd.DataFrame:
    """REAL multimodal decode through the actor pool: payloads are genuine
    PNG / WAV / VID0 bytes; MediaProbe (stages/multimodal.py) binds the
    stdlib codecs once per actor and re-derives width/height/duration and
    exact integer pixel/sample sums by decoding.  The oracle is the ground
    truth persisted at synthesis time — a decode bug cannot cancel out.
    Reference pattern being matched: ST2 stateful stage (service.go:284-309)."""
    from ..stages.multimodal import MediaProbe

    src = ensure_media_parquet(sf_dir)
    ds = rd.read_parquet(src, columns=["media_id", "payload", "media_type"])
    probed = ds.map_batches(
        MediaProbe,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
        zero_copy_batch=True,
    )
    out = probed.to_pandas().sort_values("media_id", ignore_index=True)
    return _i64(out, ["width", "height", "duration_ms", "px_sum", "sample_sum",
                      "sample_sq_sum", "n_frames"])


SQL_MEDIA_DECODE_REAL = f"""
SELECT media_id, media_type, width, height, duration_ms, px_sum, sample_sum,
       sample_sq_sum, n_frames
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/media.parquet')
ORDER BY media_id
"""


def q_video_frame_decode(sf_dir: str) -> pd.DataFrame:
    """Frame-sample → per-frame decode, the video feature-extraction chain
    run for real: FrameSampler(use_stub=False) parses the VID0 container and
    emits genuine PNG frame payloads; a second actor stage decodes each frame
    and reports its exact integer pixel sum.  Oracle = the per-frame ground
    truth persisted at synthesis time (media_frames.parquet) — k_frames=4 ≥
    every container's frame count, so sampling keeps ALL frames and the two
    sides must agree row-for-row."""
    from ..stages.multimodal import FrameSampler

    src = ensure_media_parquet(sf_dir)
    ds = rd.read_parquet(src, columns=["media_id", "payload", "media_type"])
    frames = ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"k_frames": 4, "use_stub": False},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
        zero_copy_batch=True,
    )

    def decode_frame(t: pa.Table) -> pa.Table:
        from ..functions.media_codecs import decode_png

        sums = [int(decode_png(p).astype(np.int64).sum()) for p in t["frame_payload"].to_pylist()]
        return pa.table(
            {
                "media_id": t["media_id"],
                "frame_index": pc.cast(t["frame_index"], pa.int64()),
                "frame_px_sum": pa.array(sums, pa.int64()),
            }
        )

    out = frames.map_batches(decode_frame, batch_format="pyarrow", zero_copy_batch=True)
    return out.to_pandas().sort_values(["media_id", "frame_index"], ignore_index=True)


SQL_VIDEO_FRAME_DECODE = f"""
SELECT media_id, frame_index, frame_px_sum
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/media_frames.parquet')
ORDER BY media_id, frame_index
"""


def q_media_resize_stats(sf_dir: str) -> pd.DataFrame:
    """Image preprocessing hop run for real: decode PNG → nearest-neighbor
    resize to 8×8 → re-encode; the emitted pixel sum of the RESIZED image is
    checked against the truth computed from the source array at synthesis
    time, and the output payload is itself a decodable PNG (round-trip
    asserted in tests/test_multimodal.py)."""
    from ..stages.multimodal import ImageResizer

    src = ensure_media_parquet(sf_dir)
    ds = rd.read_parquet(src, columns=["media_id", "payload", "media_type"])
    resized = ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"out_h": 8, "out_w": 8},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
        zero_copy_batch=True,
    )
    out = resized.select_columns(["media_id", "width", "height", "resized_px_sum"]) \
        .to_pandas().sort_values("media_id", ignore_index=True)
    return _i64(out, ["width", "height", "resized_px_sum"])


SQL_MEDIA_RESIZE_STATS = f"""
SELECT media_id, CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
       resized_px_sum
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/media.parquet')
WHERE media_type = 'image'
ORDER BY media_id
"""


RANGE_SORT_QS = (0.25, 0.5, 0.75)


def q_range_partitioned_sort(sf_dir: str) -> pd.DataFrame:
    """Range-partitioned global sort — the sorted-storage layout operator:
    exact quantile boundaries (one mergeable cent-histogram pass, the same
    discrete-quantile convention every quantile query shares), every row
    tagged with its range by a vectorized searchsorted, rows sorted within
    each BATCH and written one directory per range (range=NN/part-*.parquet,
    deterministic names).  A key-range reader prunes whole range dirs by
    name, then prunes files inside the chosen dir by parquet footer min/max
    stats (each file is sorted, so stats are tight) — no data page of a
    non-matching range or file is ever read.  A totally-ordered single file
    per range would need a range-keyed exchange + per-range sort; the
    dir+footer layout gives the same pruning without that shuffle.

    Scale shape: the only full pass is the histogram partial reduce
    ((bin, n) rows exchange); tagging/sorting/writing is per-batch and the
    boundaries broadcast.  Output here is the per-range summary
    (count + true min/max cents), cross-checked by the oracle's
    quantile_disc CASE; within-range file order is asserted in
    tests/test_queries_misc.py style read-back (tests/test_range_sort.py).
    """
    from ..functions.sketch import grouped_histogram_fixedpoint, quantile_disc_from_counts

    ds = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    hist = grouped_histogram_fixedpoint(
        ds.map_batches(
            lambda t: t.append_column("g", pa.array(np.zeros(len(t), np.int8))),
            batch_format="pyarrow", zero_copy_batch=True,
        ),
        "g", "o_totalprice", scale=100,
    )
    b = hist["bin"].to_numpy()
    c = hist["n"].to_numpy()
    order = np.argsort(b)
    b, c = b[order], c[order]
    bounds = np.array(
        [quantile_disc_from_counts(b, c, q) for q in RANGE_SORT_QS], dtype=np.int64
    )

    out_dir = _os.path.join(_corpus_dir(sf_dir), "range_sort")
    import shutil as _shutil

    _shutil.rmtree(out_dir, ignore_errors=True)

    def tag_sort_write(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(t["o_totalprice"], 100.0), ndigits=0,
                     round_mode="half_towards_infinity"),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        rid = np.searchsorted(bounds, cents, side="right").astype(np.int64)
        keys = t["o_orderkey"].to_numpy(zero_copy_only=False)
        parts = []
        for r in np.unique(rid):
            m = rid == r
            sub_c, sub_k = cents[m], keys[m]
            o = np.lexsort((sub_k, sub_c))  # range-local sort (key tie-break)
            sub = pa.table({"o_orderkey": sub_k[o], "cents": sub_c[o]})
            d = _os.path.join(out_dir, f"range={int(r):02d}")
            _os.makedirs(d, exist_ok=True)
            from ..functions.hashing import mix64

            digest = int(np.bitwise_xor.reduce(
                mix64(sub_k[o].astype(np.int64).view(np.uint64))) ^ np.uint64(len(sub)))
            import uuid as _uuid

            path = _os.path.join(d, f"part-{digest:016x}.parquet")
            tmp = path + f".tmp-{_uuid.uuid4().hex}"
            pq.write_table(sub, tmp)
            _os.replace(tmp, path)
            parts.append(pa.table({
                "range_id": pa.array([int(r)], pa.int64()),
                "n": pa.array([int(m.sum())], pa.int64()),
                "min_c": pa.array([int(sub_c.min())], pa.int64()),
                "max_c": pa.array([int(sub_c.max())], pa.int64()),
            }))
        return pa.concat_tables(parts) if parts else pa.table(
            {"range_id": pa.array([], pa.int64()), "n": pa.array([], pa.int64()),
             "min_c": pa.array([], pa.int64()), "max_c": pa.array([], pa.int64())})

    parts = ds.map_batches(
        tag_sort_write, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    out = parts.groupby("range_id", as_index=False).agg(
        n=("n", "sum"), min_c=("min_c", "min"), max_c=("max_c", "max"))
    return _i64(out.sort_values("range_id", ignore_index=True),
                ["range_id", "n", "min_c", "max_c"])


import os as _os  # noqa: E402  (used by artifact-writing queries above)


SQL_RANGE_PARTITIONED_SORT = """
WITH c AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
b AS (
  SELECT quantile_disc(cents, 0.25) AS q1,
         quantile_disc(cents, 0.5)  AS q2,
         quantile_disc(cents, 0.75) AS q3
  FROM c)
SELECT CASE WHEN cents < q1 THEN 0 WHEN cents < q2 THEN 1
            WHEN cents < q3 THEN 2 ELSE 3 END AS range_id,
       COUNT(*) AS n, MIN(cents) AS min_c, MAX(cents) AS max_c
FROM c CROSS JOIN b GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

def q_ngram_jaccard_pairs(sf_dir: str) -> pd.DataFrame:
    """Exact n-gram-set Jaccard near-dup pairs (df-capped, Bayardo-style):
    one gram exchange emits intersection + filtered-size partials, pair and
    size reduces are output-bounded.  Oracle: DuckDB computes the identical
    df-capped Jaccard from string 3-grams directly."""
    from ..functions.grams import ngram_jaccard_pairs

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
        from ..functions.grams import _gram_mix
        from ..functions.hashing import fnv1a64_single

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
    from ..functions.grams import winnowing_stats

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
    from ..functions.sim import kcenter_coreset

    ensure_kcenter_parquet(sf_dir)
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    return kcenter_coreset(ds, k=16)


SQL_KCENTER_CORESET = f"""
SELECT CAST(sel_order AS BIGINT) AS sel_order, CAST(vec_id AS BIGINT) AS vec_id, dist
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/kcenter_ref.parquet') ORDER BY sel_order
"""


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
        from ..sources.webdocs import build_web_docs

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
    from ..functions.webclean import gopher_repetition_partial

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
    from ..functions.webclean import gopher_quality_partial

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
    from ..functions.webclean import c4_line_filter_partial

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


# ---------------------------------------------------------------------------
# DSIR importance resampling (hashed-ngram log-likelihood-ratio selection)
# ---------------------------------------------------------------------------

def ensure_dsir_buckets_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``dsir_importance``: (gram → bucket) mapping over
    every observed word bigram, computed with the INDEPENDENT scalar FNV
    loop (``fnv1a64_single``) — cross-checks the vectorized gram-hash path."""
    import os as _os

    def build() -> pa.Table:
        from ..functions.dsir import N_BUCKETS
        from ..functions.hashing import fnv1a64_single

        t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
        grams = set()
        for s in t["text"].to_pylist():
            ws = (s or "").split(" ")
            grams.update(f"{a} {b}" for a, b in zip(ws, ws[1:]))
        ordered = sorted(grams)
        return pa.table(
            {
                "gram": pa.array(ordered, pa.string()),
                "bucket": pa.array(
                    [fnv1a64_single(g) % N_BUCKETS for g in ordered], pa.int64()
                ),
            }
        )

    return _ensure_artifact(_os.path.join(_corpus_dir(sf_dir), "dsir_buckets.parquet"), build)


def q_dsir_importance(sf_dir: str) -> pd.DataFrame:
    """DSIR (Xie et al. 2023): per-doc mean hashed-bigram log-likelihood
    ratio of the English subset (target) vs the rest (raw), add-1 smoothed,
    128 buckets — two streaming passes, KB-sized partials, no shuffle
    (functions/dsir.py)."""
    from ..functions.dsir import dsir_weights

    ds = _t(sf_dir, "documents", ["doc_id", "source", "lang", "text"])

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("is_target", pc.equal(t["lang"], "en"))

    ds = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    ensure_dsir_buckets_parquet(sf_dir)
    out = dsir_weights(ds).to_pandas().sort_values("doc_id", ignore_index=True)
    return _i64(out, ["doc_id", "n_grams", "selected"])


SQL_DSIR_IMPORTANCE = """
WITH w AS (
  SELECT doc_id, lang, source, unnest(ws) AS word, generate_subscripts(ws, 1) AS pos
  FROM (SELECT doc_id, lang, source, string_split(text, ' ') AS ws FROM documents)
),
g AS (
  SELECT a.doc_id, a.lang, a.source, a.word || ' ' || b.word AS gram
  FROM w a JOIN w b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
),
gb AS (
  SELECT g.doc_id, g.lang, g.source, m.bucket
  FROM g JOIN read_parquet('{AD}/dsir_buckets.parquet') m ON m.gram = g.gram
),
tot AS (
  SELECT SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS t_total,
         SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS r_total
  FROM gb
),
bc AS (
  SELECT bucket,
         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct,
         SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS cr
  FROM gb GROUP BY 1
),
lam AS (
  SELECT bucket,
         ln((ct + 1) / CAST(t_total + 128 AS DOUBLE))
           - ln((cr + 1) / CAST(r_total + 128 AS DOUBLE)) AS lam
  FROM bc CROSS JOIN tot
),
per AS (
  SELECT gb.doc_id, gb.source, COUNT(*) AS n_grams, SUM(lam.lam) AS s
  FROM gb JOIN lam USING (bucket) GROUP BY 1, 2
)
SELECT doc_id, source, CAST(n_grams AS BIGINT) AS n_grams,
       ROUND(s / n_grams, 6) AS weight,
       CAST(CASE WHEN ROUND(s / n_grams, 6) > 0 THEN 1 ELSE 0 END AS BIGINT) AS selected
FROM per ORDER BY doc_id
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


# ---------------------------------------------------------------------------
# Product-quantization ANN (ADC scan over per-subspace codebooks)
# ---------------------------------------------------------------------------

def ensure_pq_ref_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``pq_ann_topk``: the expected ADC top-10 derived
    by an INDEPENDENT replay of the PQ determinism contract — per-CENTROID
    column loops (``((X - C[c])**2).sum(1)``) instead of the engine's
    3-tensor broadcast, explicit first-min tie-breaks, plain argsort top-k.
    Bit-equal because both formulations square elementwise and sum the same
    8 contiguous float64 lanes (functions/sim.py)."""
    import os as _os

    def build() -> pa.Table:
        t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        order = np.argsort(np.asarray(t["vec_id"].to_numpy(zero_copy_only=False)), kind="stable")
        ids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False))[order]
        X = np.stack([np.asarray(v, np.float64) for v in t["embedding"].to_pylist()])[order]
        m, kc, iters = 8, 16, 10
        sub = X.shape[1] // m
        books = []
        for j in range(m):
            Xj = X[:, j * sub : (j + 1) * sub]
            C = Xj[:kc].copy()
            for _ in range(iters):
                d2 = np.empty((len(Xj), kc))
                for c in range(kc):
                    d2[:, c] = ((Xj - C[c]) ** 2).sum(axis=1)
                a = d2.argmin(axis=1)  # first min == lowest code on ties
                for c in range(kc):
                    if (a == c).any():
                        C[c] = Xj[a == c].mean(axis=0)
            books.append(C)
        qv = X[int(np.nonzero(ids == 0)[0][0])]
        dists = np.zeros(len(X))
        for j in range(m):
            Xj = X[:, j * sub : (j + 1) * sub]
            d2 = np.empty((len(Xj), kc))
            lut = np.empty(kc)
            for c in range(kc):
                d2[:, c] = ((Xj - books[j][c]) ** 2).sum(axis=1)
                lut[c] = ((qv[j * sub : (j + 1) * sub] - books[j][c]) ** 2).sum()
            dists = dists + lut[d2.argmin(axis=1)]
        top = np.lexsort((ids, dists))[:10]
        return pa.table(
            {
                "vec_id": pa.array(ids[top], pa.int64()),
                "adc": pa.array(_rd(dists[top], 6)),
            }
        )

    return _ensure_artifact(_os.path.join(_corpus_dir(sf_dir), "pq_ref.parquet"), build)


def q_pq_ann_topk(sf_dir: str) -> pd.DataFrame:
    """Top-10 by PQ Asymmetric Distance Computation (Jégou et al. 2011):
    8 subspace codebooks × 16 codes trained deterministically, per-batch
    encode + LUT-gather scan, distributed top-k merge
    (functions/sim.py::train_pq_codebooks / pq_adc_topk)."""
    from ..functions.sim import pq_adc_topk, train_pq_codebooks

    ensure_pq_ref_parquet(sf_dir)
    emb0 = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=pads.field("vec_id") == 0,
    )
    qvec = np.asarray(emb0["embedding"].to_pylist()[0], dtype=np.float64)
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    books = train_pq_codebooks(ds, m=8, kc=16, iters=10)
    out = pq_adc_topk(ds, books, qvec, k=10)
    out["adc"] = out["adc"].pipe(_rd)
    return _i64(out, ["vec_id"])


SQL_PQ_ANN_TOPK = """
SELECT CAST(vec_id AS BIGINT) AS vec_id, adc
FROM read_parquet('{AD}/pq_ref.parquet') ORDER BY adc, vec_id
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


# ---------------------------------------------------------------------------
# BM25 ranked retrieval (two-pass, zero-shuffle variant)
# ---------------------------------------------------------------------------

def q_bm25_two_pass(sf_dir: str) -> pd.DataFrame:
    """BM25 top-10 for the query {table, scan, merge} over documents —
    zero-shuffle two-pass ranker (functions/search.py::bm25_topk): scalar
    corpus stats partials, then vectorized per-doc scoring + distributed
    top-k."""
    from ..functions.search import bm25_topk

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
    from ..functions.webclean import line_dedup_rewrite_stats

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


# ---------------------------------------------------------------------------
# Training-layout and corpus-audit operators (session-3 batch 2)
# ---------------------------------------------------------------------------

def q_stride_chunks(sf_dir: str) -> pd.DataFrame:
    """Sliding-window (32-token window, 24 stride) retrieval-chunking stats
    per source — offsets-only per-batch math, integer partials
    (functions/tokens.py::stride_window_stats)."""
    from ..functions.tokens import stride_window_stats

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
    from ..functions.tokens import fim_layout_stats

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
    from ..functions.text import ngram_diversity

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
    from ..functions.sim import knn_label_consistency

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


# ---------------------------------------------------------------------------
# Blocklist scan, budget apportionment, audio downsample (session-3 batch 3)
# ---------------------------------------------------------------------------

BLOCKLIST_PHRASES = ["slow", "window sort", "stream batch"]


def q_blocklist_scan(sf_dir: str) -> pd.DataFrame:
    """C4-style blocklist scan as an ACTOR-POOL stage: the phrase list is
    bound once per actor (``__init__``), each batch runs one vectorized
    substring-count kernel per phrase — per source: docs flagged by any
    phrase + per-phrase occurrence totals (non-overlapping counts, matching
    DuckDB's replace-length arithmetic)."""

    class Scanner:
        def __init__(self):
            self.phrases = list(BLOCKLIST_PHRASES)

        def __call__(self, t: pa.Table) -> pa.Table:
            text = pc.fill_null(t["text"], "")
            occ = [
                pc.cast(pc.count_substring(text, p), pa.int64()) for p in self.phrases
            ]
            flagged = None
            for o in occ:
                hit = pc.greater(o, 0)
                flagged = hit if flagged is None else pc.or_(flagged, hit)
            cols = {
                "source": t["source"],
                "n_docs": pa.array(np.ones(len(t), dtype=np.int64)),
                "flagged": pc.cast(flagged, pa.int64()),
            }
            for i, o in enumerate(occ):
                cols[f"occ_{i + 1}"] = o
            part = pa.table(cols)
            names = [c for c in part.column_names if c != "source"]
            g = part.group_by(["source"]).aggregate([(c, "sum") for c in names])
            return g.rename_columns(["source"] + names)

    ds = _t(sf_dir, "documents", ["source", "text"])
    agg = ds.map_batches(
        Scanner, batch_format="pyarrow", zero_copy_batch=True, concurrency=2
    ).to_pandas()
    out = agg.groupby("source", as_index=False).sum().sort_values("source", ignore_index=True)
    return _i64(out, ["n_docs", "flagged", "occ_1", "occ_2", "occ_3"])


SQL_BLOCKLIST_SCAN = """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN contains(text, 'slow') OR contains(text, 'window sort')
                       OR contains(text, 'stream batch') THEN 1 ELSE 0 END) AS BIGINT)
         AS flagged,
       CAST(SUM((length(text) - length(replace(text, 'slow', ''))) / 4) AS BIGINT) AS occ_1,
       CAST(SUM((length(text) - length(replace(text, 'window sort', ''))) / 11) AS BIGINT)
         AS occ_2,
       CAST(SUM((length(text) - length(replace(text, 'stream batch', ''))) / 12) AS BIGINT)
         AS occ_3
FROM documents GROUP BY 1 ORDER BY 1
"""


def q_budget_apportionment(sf_dir: str) -> pd.DataFrame:
    """Largest-remainder (Hamilton) apportionment of a 1000-doc training
    budget across sources proportional to character mass — all-integer
    arithmetic (base = B·chars // total, remainder-ranked extras), one
    per-source char-sum exchange then driver math on 20 rows."""
    B = 1000
    docs = _t(sf_dir, "documents", ["source", "n_chars"])
    sums = grouped_sums(docs, ["source"], {"chars": "n_chars"}, "n_docs").to_pandas()
    sums = sums.sort_values("source", ignore_index=True)
    total = int(sums["chars"].sum())
    sums["base"] = (B * sums["chars"]) // total
    sums["rem"] = (B * sums["chars"]) % total
    seats_left = B - int(sums["base"].sum())
    order = sums.sort_values(["rem", "source"], ascending=[False, True]).index
    extra = pd.Series(0, index=sums.index)
    extra.loc[order[:seats_left]] = 1
    sums["extra"] = extra
    sums["alloc"] = sums["base"] + sums["extra"]
    out = sums[["source", "n_docs", "chars", "base", "extra", "alloc"]]
    return _i64(out.copy(), ["n_docs", "chars", "base", "extra", "alloc"])


SQL_BUDGET_APPORTIONMENT = """
WITH s AS (
  SELECT source, COUNT(*) AS n_docs, SUM(n_chars) AS chars
  FROM documents GROUP BY 1
),
q AS (
  SELECT source, n_docs, chars,
         (1000 * chars) // (SELECT SUM(chars) FROM s) AS base,
         (1000 * chars) % (SELECT SUM(chars) FROM s) AS rem
  FROM s
),
r AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC) AS rk,
         (SELECT 1000 - SUM(base) FROM q) AS seats_left
  FROM q
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs, CAST(chars AS BIGINT) AS chars,
       CAST(base AS BIGINT) AS base,
       CAST(CASE WHEN rk <= seats_left THEN 1 ELSE 0 END AS BIGINT) AS extra,
       CAST(base + CASE WHEN rk <= seats_left THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM r ORDER BY source
"""


def ensure_audio_resample_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``audio_downsample``: expected per-clip decimation
    results derived with the INDEPENDENT stdlib ``wave`` decoder and pure
    Python integer loops — cross-validates functions/media_codecs.decode_wav
    and the vectorized decimation against a second decoder implementation."""
    import io as _io
    import os as _os
    import wave as _wave

    def build() -> pa.Table:
        src = ensure_audio_dups_parquet(sf_dir)
        t = pq.read_table(src, columns=["media_id", "payload"])
        ids, in_n, out_n, out_rate, checksum = [], [], [], [], []
        for mid, payload in zip(t["media_id"].to_pylist(), t["payload"].to_pylist()):
            with _wave.open(_io.BytesIO(payload)) as w:
                assert w.getsampwidth() == 2 and w.getnchannels() == 1
                rate = w.getframerate()
                raw = w.readframes(w.getnframes())
            pcm = [
                int.from_bytes(raw[2 * i : 2 * i + 2], "little", signed=True)
                for i in range(len(raw) // 2)
            ]
            m = len(pcm) // 2
            down = [(pcm[2 * i] + pcm[2 * i + 1]) // 2 for i in range(m)]
            ids.append(mid)
            in_n.append(len(pcm))
            out_n.append(m)
            out_rate.append(rate // 2)
            checksum.append(sum(down))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "in_samples": pa.array(in_n, pa.int64()),
                "out_samples": pa.array(out_n, pa.int64()),
                "out_rate": pa.array(out_rate, pa.int64()),
                "checksum": pa.array(checksum, pa.int64()),
            }
        )

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "audio_resample_ref.parquet"), build
    )


def q_audio_downsample(sf_dir: str) -> pd.DataFrame:
    """2:1 audio decimation over the real-WAV corpus via the AudioDownsample
    actor pool — per-clip sample counts, output rate and integer checksum vs
    the stdlib-``wave`` reference artifact."""
    from ..stages.multimodal import AudioDownsample

    ensure_audio_resample_parquet(sf_dir)
    src = ensure_audio_dups_parquet(sf_dir)
    ds = rd.read_parquet(src, columns=["media_id", "payload"])
    out = (
        ds.map_batches(
            AudioDownsample,
            batch_format="pyarrow",
            batch_size=64,
            concurrency=2,
            zero_copy_batch=True,
        )
        .to_pandas()
        .sort_values("media_id", ignore_index=True)
    )
    return _i64(out, ["in_samples", "out_samples", "out_rate", "checksum"])


SQL_AUDIO_DOWNSAMPLE = """
SELECT media_id, in_samples, out_samples, out_rate, checksum
FROM read_parquet('{AD}/audio_resample_ref.parquet') ORDER BY media_id
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


# ---------------------------------------------------------------------------
# Attribution, vocab coverage, partition-skew audit (session-3 batch 4)
# ---------------------------------------------------------------------------

def q_linear_attribution(sf_dir: str) -> pd.DataFrame:
    """Multi-touch linear attribution: each purchase's cents split equally
    across the user's views in the preceding 24 h, remainder to the earliest
    view (integer-exact — no float credit drift); attributed mass by view
    hour-of-day (functions/windows.py::linear_attribution)."""
    from ..functions.windows import linear_attribution

    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])
    return linear_attribution(ds)


SQL_LINEAR_ATTRIBUTION = """
WITH p AS (
  SELECT user_id, ts AS pts, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
v AS (
  SELECT user_id, ts AS vts, event_id AS vid FROM events WHERE event_type = 'view'
),
j AS (
  SELECT p.cents, v.vid,
         CAST(floor(epoch(v.vts) / 3600) AS BIGINT) % 24 AS hr,
         COUNT(*) OVER (PARTITION BY p.user_id, p.pts, p.cents) AS n,
         ROW_NUMBER() OVER (PARTITION BY p.user_id, p.pts, p.cents
                            ORDER BY v.vts, v.vid) AS rn
  FROM p JOIN v ON v.user_id = p.user_id
              AND v.vts < p.pts AND v.vts >= p.pts - INTERVAL 24 HOUR
)
SELECT CAST(hr AS BIGINT) AS hour, CAST(COUNT(*) AS BIGINT) AS n_views,
       CAST(SUM(cents // n + CASE WHEN rn = 1 THEN cents % n ELSE 0 END) AS BIGINT)
         AS attributed_cents
FROM j GROUP BY 1 ORDER BY 1
"""


def q_vocab_coverage(sf_dir: str) -> pd.DataFrame:
    """Vocabulary coverage curve (tokenizer-sizing signal): smallest k such
    that the top-k token types cover ≥50/90/99% of token mass (ties by token
    id; integer cross-multiplied thresholds).  Distributed frequency reduce,
    bounded-vocab driver cumsum."""
    from ..functions.tokens import token_frequency

    ds = rd.read_parquet(ensure_derived_parquet(sf_dir), columns=["tokens"], override_num_blocks=8)
    freq = token_frequency(ds, topk=None)
    freq = freq.sort_values(["count", "token"], ascending=[False, True], ignore_index=True)
    n = freq["count"].to_numpy(np.int64)
    total = int(n.sum())
    cum = np.cumsum(n)
    ks = {}
    for pct in (50, 90, 99):
        ks[pct] = int(np.searchsorted(cum * 100, pct * total, side="left")) + 1
    return pd.DataFrame(
        [
            {
                "total_tokens": total,
                "vocab_size": len(freq),
                "k50": ks[50],
                "k90": ks[90],
                "k99": ks[99],
            }
        ]
    ).astype("int64")


SQL_VOCAB_COVERAGE = """
WITH f AS (
  SELECT tok AS token, COUNT(*) AS n
  FROM (SELECT UNNEST(tokens) AS tok FROM read_parquet('{AD}/derived.parquet'))
  GROUP BY 1
),
c AS (
  SELECT n, SUM(n) OVER (ORDER BY n DESC, token ASC
                         ROWS UNBOUNDED PRECEDING) AS cum,
         ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) AS k,
         SUM(n) OVER () AS total
  FROM f
)
SELECT CAST(MAX(total) AS BIGINT) AS total_tokens,
       CAST(COUNT(*) AS BIGINT) AS vocab_size,
       CAST(MIN(CASE WHEN cum * 100 >= 50 * total THEN k END) AS BIGINT) AS k50,
       CAST(MIN(CASE WHEN cum * 100 >= 90 * total THEN k END) AS BIGINT) AS k90,
       CAST(MIN(CASE WHEN cum * 100 >= 99 * total THEN k END) AS BIGINT) AS k99
FROM c
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


def ensure_user_partition_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``partition_skew_audit``: (user_id → partition)
    computed with the INDEPENDENT scalar FNV-1a-32 loop — cross-checks the
    vectorized partitioner (hashing.fnv1a32, the flagship's lineage hash)."""
    import os as _os

    def build() -> pa.Table:
        from ..functions.hashing import fnv1a32_single

        t = pq.read_table(f"{sf_dir}/events.parquet", columns=["user_id"])
        users = sorted(set(t["user_id"].to_pylist()))
        return pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "partition_id": pa.array(
                    [fnv1a32_single(str(u)) % 64 for u in users], pa.int64()
                ),
            }
        )

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "user_partitions.parquet"), build
    )


def q_partition_skew_audit(sf_dir: str) -> pd.DataFrame:
    """Partition-skew audit of the engine's own FNV-1a-32 keyed partitioner
    (the flagship lineage hash, stages/parse.py): rows and distinct users
    per partition for P=64 over the events stream — the pre-flight a
    100-TB run does before committing to a partitioning key."""
    from ..functions.hashing import fnv1a32

    ensure_user_partition_parquet(sf_dir)
    ds = _t(sf_dir, "events", ["user_id"])

    # rows per partition: cheap per-batch bincount partials
    def rows_part(t: pa.Table) -> pa.Table:
        users = t["user_id"].combine_chunks() if isinstance(t["user_id"], pa.ChunkedArray) else t["user_id"]
        pid = (fnv1a32(pc.cast(users, pa.string())) % np.uint32(64)).astype(np.int64)
        n = np.bincount(pid, minlength=64).astype(np.int64)
        return pa.table(
            {"partition_id": pa.array(np.arange(64, dtype=np.int64)), "n_rows": pa.array(n)}
        )

    rows = (
        ds.map_batches(rows_part, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby("partition_id", as_index=False)
        .sum()
    )

    # distinct users per partition: distinct (pid, user) combiner exchange
    def dpairs(t: pa.Table) -> pa.Table:
        users = t["user_id"].combine_chunks() if isinstance(t["user_id"], pa.ChunkedArray) else t["user_id"]
        pid = (fnv1a32(pc.cast(users, pa.string())) % np.uint32(64)).astype(np.int64)
        uid = users.to_numpy(zero_copy_only=False).astype(np.int64)
        pairs = np.unique(np.stack([pid, uid], axis=1), axis=0)
        return pa.table(
            {"partition_id": pa.array(pairs[:, 0]), "user_id": pa.array(pairs[:, 1])}
        )

    dd = grouped_sums(
        ds.map_batches(dpairs, batch_format="pyarrow", zero_copy_batch=True),
        ["partition_id", "user_id"], {},
        "dups",
    ).to_pandas()
    dusers = dd.groupby("partition_id", as_index=False).size().rename(columns={"size": "n_users"})
    out = rows.merge(dusers, on="partition_id", how="left").fillna({"n_users": 0})
    out = out[out["n_rows"] > 0]  # SQL only emits populated partitions
    out = out.sort_values("partition_id", ignore_index=True)
    return _i64(out, ["partition_id", "n_rows", "n_users"])


SQL_PARTITION_SKEW_AUDIT = """
WITH m AS (SELECT user_id, partition_id FROM read_parquet('{AD}/user_partitions.parquet')),
e AS (SELECT e.user_id, m.partition_id FROM events e JOIN m USING (user_id))
SELECT partition_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM e GROUP BY 1 ORDER BY 1
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


# ---------------------------------------------------------------------------
# Perceptual image dedup + contrastive pair mining (session-3 batch 5)
# ---------------------------------------------------------------------------

def ensure_scale_dups_parquet(sf_dir: str) -> str:
    import os as _os

    from ..sources.media import build_image_scale_dup_table

    sf = _sf_of(sf_dir)
    n = max(30, min(3000, int(3000 * sf)))
    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "scale_dups.parquet"),
        lambda: build_image_scale_dup_table(n),
    )


def q_image_phash_dedup(sf_dir: str) -> pd.DataFrame:
    """Perceptual dedup: 2×-rescaled and +1-brightness re-encodes (different
    bytes AND different pixels — exact content dedup provably cannot group
    them) collapse under the 64-bit dHash (ImagePHash actor pool); oracle =
    scalar-reference-dHash truth persisted at synthesis."""
    from ..functions.relational import bucketed_group_reduce
    from ..stages.multimodal import ImagePHash

    src = ensure_scale_dups_parquet(sf_dir)
    ds = rd.read_parquet(src, columns=["media_id", "payload"])
    hashes = ds.map_batches(
        ImagePHash, batch_format="pyarrow", batch_size=64, concurrency=2,
        zero_copy_batch=True,
    )

    def rep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["dup_of"] = df.groupby("phash")["media_id"].transform("min")
        return df[["media_id", "dup_of"]]

    out = bucketed_group_reduce(hashes, ["phash"], rep).to_pandas()
    return out.sort_values("media_id", ignore_index=True)


SQL_IMAGE_PHASH_DEDUP = """
SELECT media_id, dup_of
FROM read_parquet('{AD}/scale_dups.parquet') ORDER BY media_id
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


def q_contrastive_pairs(sf_dir: str) -> pd.DataFrame:
    """Contrastive pair mining over the embeddings: per anchor the nearest
    same-label positive and nearest different-label hard negative (round-9
    squared L2, ties → min id), margin = neg − pos
    (functions/sim.py::contrastive_pairs)."""
    from ..functions.sim import contrastive_pairs

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    return contrastive_pairs(ds)


SQL_CONTRASTIVE_PAIRS = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings
),
p AS (
  SELECT a.vec_id, a.label, b.vec_id AS nid, b.label AS nlabel,
         ROUND(list_dot_product(a.v, a.v) + list_dot_product(b.v, b.v)
               - 2 * list_dot_product(a.v, b.v), 9) AS d2
  FROM e a JOIN e b ON b.vec_id <> a.vec_id
),
pos AS (
  SELECT vec_id, label, nid, d2,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, nid) AS rn
  FROM p WHERE nlabel = label
),
neg AS (
  SELECT vec_id, nid, d2,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, nid) AS rn
  FROM p WHERE nlabel <> label
)
SELECT pos.vec_id, CAST(pos.label AS BIGINT) AS label,
       CAST(pos.nid AS BIGINT) AS pos_id, CAST(neg.nid AS BIGINT) AS neg_id,
       ROUND(neg.d2 - pos.d2, 6) AS margin
FROM pos JOIN neg ON neg.vec_id = pos.vec_id AND neg.rn = 1
WHERE pos.rn = 1 ORDER BY pos.vec_id
"""


# ---------------------------------------------------------------------------
# CUSUM changepoint scan + time-weighted average (session-3 batch 6)
# ---------------------------------------------------------------------------

def q_cusum_changepoint(sf_dir: str) -> pd.DataFrame:
    """CUSUM changepoint scan per event type over the hourly count series:
    cumulative deviation from the overall hourly mean, kept INTEGER by
    cross-multiplication (cum_k = Σ n_i·H − k·N stays exact — no float
    drift), argmax |cusum| with ties to the earliest hour.  One (type,
    hour) combiner exchange; the per-type series fold is driver-side over
    the tiny hourly grid."""
    ds = _t(sf_dir, "events", ["ts", "event_type"])

    def add_hour(t: pa.Table) -> pa.Table:
        micros = pc.cast(t["ts"], pa.int64())
        hour_id = pc.divide(micros, pa.scalar(3_600_000_000, pa.int64()))
        return pa.table({"hour_id": hour_id, "event_type": t["event_type"]})

    hourly = grouped_sums(
        ds.map_batches(add_hour, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "hour_id"], {}, "n",
    ).to_pandas()
    rows = []
    for et, g in hourly.groupby("event_type", sort=True):
        g = g.sort_values("hour_id", ignore_index=True)
        n = g["n"].to_numpy(np.int64)
        hours = g["hour_id"].to_numpy(np.int64)
        H, N = len(n), int(n.sum())
        # cum_k = Σ_{i<=k} (n_i*H - N)  ==  H*prefix_k - (k+1)*N   (exact ints)
        cum = np.cumsum(n * H) - (np.arange(1, H + 1, dtype=np.int64)) * N
        k = int(np.argmax(np.abs(cum)))  # first max == earliest hour
        rows.append((et, H, N, int(hours[k]), int(cum[k])))
    out = pd.DataFrame(
        rows, columns=["event_type", "n_hours", "n_events", "peak_hour", "peak_cusum"]
    )
    return _i64(out, ["n_hours", "n_events", "peak_hour", "peak_cusum"])


SQL_CUSUM_CHANGEPOINT = """
WITH h AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_id,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type, hour_id, n,
         COUNT(*) OVER (PARTITION BY event_type) AS nh,
         SUM(n) OVER (PARTITION BY event_type) AS tot,
         SUM(n) OVER (PARTITION BY event_type ORDER BY hour_id
                      ROWS UNBOUNDED PRECEDING) AS pre,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hour_id) AS k
  FROM h
),
c AS (
  SELECT event_type, hour_id, nh, tot,
         CAST(nh * pre - k * tot AS BIGINT) AS cusum
  FROM s
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY ABS(cusum) DESC, hour_id ASC) AS rk
  FROM c
)
SELECT event_type, CAST(nh AS BIGINT) AS n_hours, CAST(tot AS BIGINT) AS n_events,
       hour_id AS peak_hour, cusum AS peak_cusum
FROM r WHERE rk = 1 ORDER BY event_type
"""


def q_twap_user_value(sf_dir: str) -> pd.DataFrame:
    """Time-weighted average event value per user (top 20 by TWAP): each
    event's value holds until the user's next event; weights are exact µs
    gaps × exact cents, one integer dot product per user inside the
    bucketed exchange.  Users with < 2 events are excluded (zero span)."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts", "value", "event_id"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_id": t["event_id"],
                "ts_us": pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()),
                "cents": pc.cast(
                    pc.round(pc.multiply(pc.fill_null(t["value"], 0.0), 100.0)), pa.int64()
                ),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for uid, g in df.groupby("user_id", sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values(["ts_us", "event_id"])
            ts = g["ts_us"].to_numpy(np.int64)
            cents = g["cents"].to_numpy(np.int64)
            gaps = np.diff(ts)
            num = int((cents[:-1] * gaps).sum())
            den = int(ts[-1] - ts[0])
            rows.append((uid, len(g), num, den))
        import pandas as _pd

        return _pd.DataFrame(rows, columns=["user_id", "n_events", "num", "den"])

    agg = bucketed_group_reduce(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"], per_bucket,
    ).to_pandas()
    if not len(agg):
        return pd.DataFrame(columns=["user_id", "n_events", "twap"])
    agg = agg[agg["den"] > 0].copy()
    agg["twap"] = _rd(agg["num"].to_numpy(np.float64) / agg["den"].to_numpy(np.float64) / 100.0, 6)
    out = agg.sort_values(["twap", "user_id"], ascending=[False, True], ignore_index=True).head(20)
    return _i64(out[["user_id", "n_events", "twap"]].copy(), ["user_id", "n_events"])


SQL_TWAP_USER_VALUE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents, event_id
  FROM events
),
w AS (
  SELECT user_id, cents, ts_us,
         LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS nxt
  FROM e
),
a AS (
  SELECT user_id, COUNT(*) + 1 AS n_events,
         SUM(cents * (nxt - ts_us)) AS num,
         MAX(nxt) - MIN(ts_us) AS den
  FROM w WHERE nxt IS NOT NULL GROUP BY 1
)
SELECT CAST(user_id AS BIGINT) AS user_id, CAST(n_events AS BIGINT) AS n_events,
       ROUND(num / CAST(den AS DOUBLE) / 100.0, 6) AS twap
FROM a WHERE den > 0
ORDER BY twap DESC, user_id ASC LIMIT 20
"""


def q_webclean_pipeline(sf_dir: str) -> pd.DataFrame:
    """End-to-end web cleaning funnel (C4 doc kill → C4 line filter +
    3-line rule → Gopher gates on the CLEANED text → cross-doc line dedup
    rewrite) — streaming stage composition, one dedup combiner exchange
    (functions/webclean.py::webclean_pipeline)."""
    from ..functions.webclean import webclean_pipeline

    src = ensure_web_docs_parquet(sf_dir)
    ds = rd.read_parquet(src, columns=["doc_id", "source", "text"], override_num_blocks=8)
    stats, _final = webclean_pipeline(ds)
    return stats


SQL_WEBCLEAN_PIPELINE = r"""
WITH d AS (
  SELECT doc_id, source, string_split(text, chr(10)) AS ls,
         (contains(lower(text), 'lorem ipsum') OR contains(text, '{')) AS killed
  FROM read_parquet('{AD}/web_docs.parquet')
),
l0 AS (
  SELECT doc_id, unnest(ls) AS line, generate_subscripts(ls, 1) AS li FROM d
),
lk AS (
  SELECT doc_id, line, li,
         ((line LIKE '%.' OR line LIKE '%!' OR line LIKE '%?' OR line LIKE '%"')
          AND len(string_split(line, ' ')) >= 5
          AND NOT contains(lower(line), 'javascript')) AS kept
  FROM l0
),
ck AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY li) AS ctext, COUNT(*) AS kc
  FROM lk WHERE kept GROUP BY 1
),
a AS (
  SELECT d.doc_id, d.source, d.killed,
         COALESCE(ck.ctext, '') AS ctext, COALESCE(ck.kc, 0) AS kc,
         (NOT d.killed AND COALESCE(ck.kc, 0) >= 3) AS ok0,
         (NOT d.killed AND COALESCE(ck.kc, 0) < 3) AS short
  FROM d LEFT JOIN ck USING (doc_id)
),
gl AS (
  SELECT doc_id, unnest(string_split(ctext, chr(10))) AS line FROM a WHERE ok0
),
glagg AS (
  SELECT doc_id, COUNT(*) AS n_lines,
         SUM(CASE WHEN line LIKE '- %' THEN 1 ELSE 0 END) AS n_bullet,
         SUM(CASE WHEN line LIKE '%...' THEN 1 ELSE 0 END) AS n_ellip
  FROM gl GROUP BY 1
),
gw AS (
  SELECT doc_id, unnest(string_split(replace(ctext, chr(10), ' '), ' ')) AS word
  FROM a WHERE ok0
),
gwagg AS (
  SELECT doc_id, COUNT(*) AS n_words, SUM(length(word)) AS sum_len,
         SUM(CASE WHEN contains(word, '#') OR contains(word, '...')
                  THEN 1 ELSE 0 END) AS n_sym,
         SUM(CASE WHEN regexp_matches(word, '[a-zA-Z]') THEN 1 ELSE 0 END) AS n_alpha
  FROM gw GROUP BY 1
),
gates AS (
  SELECT a.doc_id,
         NOT (n_words < 20 OR n_words > 100000
              OR sum_len < 3 * n_words OR sum_len > 10 * n_words
              OR 10 * n_sym > n_words
              OR 10 * n_bullet > 9 * n_lines
              OR 10 * n_ellip > 3 * n_lines
              OR 5 * n_alpha < 4 * n_words
              OR len(regexp_extract_all(a.ctext, '\b(?:the|a|of|and|to)\b')) < 2) AS gpass
  FROM a JOIN glagg ON glagg.doc_id = a.doc_id JOIN gwagg ON gwagg.doc_id = a.doc_id
  WHERE a.ok0
),
surv AS (
  SELECT a.doc_id, a.source, a.ctext
  FROM a JOIN gates ON gates.doc_id = a.doc_id WHERE gates.gpass
),
sl AS (
  SELECT doc_id, source, unnest(string_split(ctext, chr(10))) AS line,
         generate_subscripts(string_split(ctext, chr(10)), 1) AS li
  FROM surv
),
dup AS (
  SELECT line FROM (SELECT line, COUNT(DISTINCT doc_id) AS c FROM sl GROUP BY 1)
  WHERE c >= 3
),
fin AS (
  SELECT doc_id, source,
         SUM(CASE WHEN line IN (SELECT line FROM dup) THEN 1 ELSE 0 END) AS removed,
         COALESCE(SUM(CASE WHEN line NOT IN (SELECT line FROM dup)
                           THEN length(line) ELSE 0 END)
                  + GREATEST(SUM(CASE WHEN line NOT IN (SELECT line FROM dup)
                                      THEN 1 ELSE 0 END) - 1, 0), 0) AS chars_out
  FROM sl GROUP BY 1, 2
),
fa AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS docs_in,
         CAST(SUM(CASE WHEN killed THEN 1 ELSE 0 END) AS BIGINT) AS docs_killed,
         CAST(SUM(CASE WHEN short THEN 1 ELSE 0 END) AS BIGINT) AS docs_short,
         CAST(SUM(CASE WHEN ok0 AND doc_id IN (SELECT doc_id FROM gates WHERE NOT gpass)
                       THEN 1 ELSE 0 END) AS BIGINT) AS docs_quality_fail
  FROM a GROUP BY 1
),
fd AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS docs_out,
         CAST(SUM(removed) AS BIGINT) AS lines_dedup_removed,
         CAST(SUM(chars_out) AS BIGINT) AS chars_out
  FROM fin GROUP BY 1
)
SELECT fa.source, docs_in, docs_killed, docs_short, docs_quality_fail,
       CAST(COALESCE(docs_out, 0) AS BIGINT) AS docs_out,
       CAST(COALESCE(lines_dedup_removed, 0) AS BIGINT) AS lines_dedup_removed,
       CAST(COALESCE(fd.chars_out, 0) AS BIGINT) AS chars_out
FROM fa LEFT JOIN fd ON fd.source = fa.source ORDER BY 1
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


def q_incremental_agg(sf_dir: str) -> pd.DataFrame:
    """Incremental aggregate maintenance (state/aggstate.py): the events
    stream split into two runs at its median hour, each run folded into a
    persisted per-(event_type) state WITHOUT rescanning history; re-applied
    run ids are no-ops.  Result = state read-back; oracle = one-shot full
    aggregate — equality proves fold ≡ recompute."""
    import os as _os

    from ..state.aggstate import IncrementalAgg, fold_run

    ds = _t(sf_dir, "events", ["ts", "event_type", "value"])
    # deterministic split point: integer midpoint of the µs range
    import pyarrow.parquet as _pq

    meta = _pq.read_table(f"{sf_dir}/events.parquet", columns=["ts"])
    ts_us = pc.cast(pc.cast(meta["ts"], pa.timestamp("us")), pa.int64())
    mid = (int(pc.min(ts_us).as_py()) + int(pc.max(ts_us).as_py())) // 2

    def half(t: pa.Table, first: bool) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        mask = pc.less(us, mid) if first else pc.greater_equal(us, mid)
        return t.filter(mask)

    state_dir = _os.path.join(_corpus_dir(sf_dir), "agg_state_v1")
    state = IncrementalAgg(state_dir, ["event_type"], ["cents"])
    fold_run(
        ds.map_batches(lambda t: half(t, True), batch_format="pyarrow", zero_copy_batch=True),
        state, "run-1",
    )
    fold_run(
        ds.map_batches(lambda t: half(t, False), batch_format="pyarrow", zero_copy_batch=True),
        state, "run-2",
    )
    # idempotence: re-applying run-1 must be a no-op
    fold_run(
        ds.map_batches(lambda t: half(t, True), batch_format="pyarrow", zero_copy_batch=True),
        state, "run-1",
    )
    out = state.read()
    out["total_value"] = _rd(out["cents"].to_numpy(np.float64) / 100.0, 2)
    return _i64(out[["event_type", "n", "total_value"]].copy(), ["n"])


SQL_INCREMENTAL_AGG = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0, 2)
         AS total_value
FROM events GROUP BY 1 ORDER BY 1
"""


def _spread16(x: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of each value to even bit positions (the
    classic Morton magic-number cascade) — mirrored bit-for-bit in SQL."""
    x = x.astype(np.uint64) & np.uint64(0xFFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x33333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x55555555)
    return x


def q_zorder_locality(sf_dir: str) -> pd.DataFrame:
    """Z-order (Morton) clustering audit — the lakehouse layout question
    "does interleaving (user, hour) let BOTH single-column predicates prune
    blocks?".  Blocks are z-key prefixes (z >> 12), the unit a z-range file
    covers; the single-key layout's blocks are hour-key prefixes.  All six
    distinct-counts (2 key cardinalities + 4 (entity, block) layouts) ride
    ONE tagged-packed combiner exchange — tag(3b)·key(16b)·block(20b) fit
    one int64, each batch emits its distinct packed rows per tag, and a
    single grouped distinct + per-tag count replaces the six separate
    read→key→exchange pipelines the first version ran."""
    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def tagged_packed(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        hour = pc.divide(us, pa.scalar(3_600_000_000, pa.int64())).to_numpy(
            zero_copy_only=False
        )
        u16 = (t["user_id"].to_numpy(zero_copy_only=False) % 65536).astype(np.int64)
        h16 = (hour % 65536).astype(np.int64)
        z = (_spread16(u16) | (_spread16(h16) << np.uint64(1))).astype(np.int64)
        zblock = z >> np.int64(12)
        hblock = h16 >> np.int64(4)
        zero = np.zeros(len(u16), np.int64)
        parts = [
            (0, u16, zero), (1, h16, zero),
            (2, u16, zblock), (3, h16, zblock),
            (4, u16, hblock), (5, h16, hblock),
        ]
        packed = np.concatenate([
            (np.int64(tag) << np.int64(36)) | (a << np.int64(20)) | b
            for tag, a, b in parts
        ])
        return pa.table({"p": pa.array(np.unique(packed))})

    dd = grouped_sums(
        ds.map_batches(tagged_packed, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["p"], {}, "dups",
    )
    tag_counts = (
        dd.map_batches(
            lambda t: pa.table({"tag": pa.array(
                t["p"].to_numpy(zero_copy_only=False) >> np.int64(36)),
                "n": pa.array(np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas().groupby("tag")["n"].sum()
    )
    names = ["n_users", "n_hours", "z_blocks_by_user", "z_blocks_by_hour",
             "h_blocks_by_user", "h_blocks_by_hour"]
    out = pd.DataFrame([{nm: int(tag_counts.get(i, 0))
                         for i, nm in enumerate(names)}])
    return out.astype("int64")


SQL_ZORDER_LOCALITY = """
WITH k AS (
  SELECT user_id % 65536 AS u16,
         (CAST(floor(epoch(ts) / 3600) AS BIGINT) % 65536) AS h16
  FROM events
),
-- spread16 Morton cascade, one stage per CTE (mirrors _spread16 exactly)
s1 AS (
  SELECT u16, h16,
         (u16 | (u16 << 8)) & 16711935 AS ua, (h16 | (h16 << 8)) & 16711935 AS ha
  FROM k
),
s2 AS (
  SELECT u16, h16,
         (ua | (ua << 4)) & 252645135 AS ub, (ha | (ha << 4)) & 252645135 AS hb
  FROM s1
),
s3 AS (
  SELECT u16, h16,
         (ub | (ub << 2)) & 858993459 AS uc, (hb | (hb << 2)) & 858993459 AS hc
  FROM s2
),
s AS (
  SELECT u16, h16,
         (uc | (uc << 1)) & 1431655765 AS su, (hc | (hc << 1)) & 1431655765 AS sh
  FROM s3
),
z AS (
  SELECT u16, h16, ((su | (sh << 1)) >> 12) AS zblock, (h16 >> 4) AS hblock FROM s
)
SELECT CAST(COUNT(DISTINCT u16) AS BIGINT) AS n_users,
       CAST(COUNT(DISTINCT h16) AS BIGINT) AS n_hours,
       CAST((SELECT COUNT(*) FROM (SELECT DISTINCT u16, zblock FROM z)) AS BIGINT)
         AS z_blocks_by_user,
       CAST((SELECT COUNT(*) FROM (SELECT DISTINCT h16, zblock FROM z)) AS BIGINT)
         AS z_blocks_by_hour,
       CAST((SELECT COUNT(*) FROM (SELECT DISTINCT u16, hblock FROM z)) AS BIGINT)
         AS h_blocks_by_user,
       CAST((SELECT COUNT(*) FROM (SELECT DISTINCT h16, hblock FROM z)) AS BIGINT)
         AS h_blocks_by_hour
FROM z
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


def q_histogram_split_finder(sf_dir: str) -> pd.DataFrame:
    """GBDT histogram split finding (the LightGBM hot loop) over the event
    stream: per-feature bucket histograms (count + exact cents sum) reduce
    as integer partials in ONE tagged exchange; the variance-reduction gain
    scan (SL²/nL + SR²/nR − S²/n) runs over prefix sums of the ~100-bucket
    histogram driver-side.  Best split per feature, gain from exact ints,
    ties → lowest bucket."""
    ds = _t(sf_dir, "events", ["ts", "user_id", "event_type", "value"])

    def hist(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        hour24 = (
            pc.divide(us, pa.scalar(3_600_000_000, pa.int64())).to_numpy(zero_copy_only=False)
            % 24
        ).astype(np.int64)
        ubkt = (t["user_id"].to_numpy(zero_copy_only=False) % 64).astype(np.int64)
        cents = (
            pc.cast(pc.round(pc.multiply(pc.fill_null(t["value"], 0.0), 100.0)), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        frames = []
        for feat, bkt, nb in (("hour24", hour24, 24), ("user64", ubkt, 64)):
            n = np.bincount(bkt, minlength=nb).astype(np.int64)
            s = np.bincount(bkt, weights=cents, minlength=nb).astype(np.int64)
            frames.append(
                pa.table(
                    {
                        "feature": pa.array([feat] * nb),
                        "bucket": pa.array(np.arange(nb, dtype=np.int64)),
                        "n": pa.array(n),
                        "s": pa.array(s),
                    }
                )
            )
        return pa.concat_tables(frames)

    h = (
        ds.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby(["feature", "bucket"], as_index=False)
        .sum()
    )
    h = h[h["n"] > 0]  # SQL's GROUP BY only yields populated buckets
    rows = []
    for feat, g in h.groupby("feature", sort=True):
        g = g.sort_values("bucket", ignore_index=True)
        n = g["n"].to_numpy(np.int64)
        s = g["s"].to_numpy(np.int64)
        N, S = int(n.sum()), int(s.sum())
        nl = np.cumsum(n)[:-1].astype(np.float64)
        sl = np.cumsum(s)[:-1].astype(np.float64)
        nr, sr = N - nl, S - sl
        valid = (nl > 0) & (nr > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            gain = np.where(
                valid, sl * sl / nl + sr * sr / nr - (S * float(S)) / N, -np.inf
            )
        gain = _rd(gain, 6)
        k = int(np.argmax(gain))  # first max == lowest bucket
        rows.append(
            (feat, int(g["bucket"][k]), int(n[: k + 1].sum()), int(s[: k + 1].sum()), gain[k])
        )
    out = pd.DataFrame(
        rows, columns=["feature", "split_bucket", "n_left", "sum_left_cents", "gain"]
    )
    return _i64(out, ["split_bucket", "n_left", "sum_left_cents"])


SQL_HISTOGRAM_SPLIT_FINDER = """
WITH e AS (
  SELECT (CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24) AS hour24,
         (user_id % 64) AS user64,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events
),
h AS (
  SELECT 'hour24' AS feature, hour24 AS bucket, COUNT(*) AS n, SUM(cents) AS s
  FROM e GROUP BY 2
  UNION ALL
  SELECT 'user64' AS feature, user64 AS bucket, COUNT(*) AS n, SUM(cents) AS s
  FROM e GROUP BY 2
),
p AS (
  SELECT feature, bucket, n, s,
         SUM(n) OVER (PARTITION BY feature ORDER BY bucket
                      ROWS UNBOUNDED PRECEDING) AS nl,
         SUM(s) OVER (PARTITION BY feature ORDER BY bucket
                      ROWS UNBOUNDED PRECEDING) AS sl,
         SUM(n) OVER (PARTITION BY feature) AS nt,
         SUM(s) OVER (PARTITION BY feature) AS st,
         MAX(bucket) OVER (PARTITION BY feature) AS maxb
  FROM h
),
g AS (
  SELECT feature, bucket, nl, sl,
         ROUND(CAST(sl AS DOUBLE) * sl / nl
               + CAST(st - sl AS DOUBLE) * (st - sl) / (nt - nl)
               - CAST(st AS DOUBLE) * st / nt, 6) AS gain
  FROM p WHERE bucket < maxb AND nl > 0 AND (nt - nl) > 0
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY feature
                               ORDER BY gain DESC, bucket ASC) AS rk
  FROM g
)
SELECT feature, bucket AS split_bucket, CAST(nl AS BIGINT) AS n_left,
       CAST(sl AS BIGINT) AS sum_left_cents, gain
FROM r WHERE rk = 1 ORDER BY feature
"""


def q_split_leakage_audit(sf_dir: str) -> pd.DataFrame:
    """Train/val leakage via near-duplicates (the eval-hygiene check every
    benchmark split needs): the distributed MinHash+LSH pair set crossed
    with the hash-fraction split — a near-dup pair straddling train and val
    leaks eval signal.  Per category: pair count and an id checksum pinning
    WHICH pairs (Σ doc_a + doc_b)."""
    from ..functions.dedup import minhash_lsh_pairs

    ensure_neardup_pairs_parquet(sf_dir)
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    pairs = minhash_lsh_pairs(ds, threshold=0.5)

    def split_of(ids: pd.Series) -> np.ndarray:
        import hashlib as _hl

        return np.array(
            [
                "val" if _hl.md5(f"{int(i)}:split".encode()).hexdigest() < "1a" else "train"
                for i in ids
            ]
        )

    sa, sb = split_of(pairs["doc_a"]), split_of(pairs["doc_b"])
    cat = np.where(
        sa == sb, np.where(sa == "train", "train-train", "val-val"), "train-val"
    )
    pairs = pairs.assign(category=cat)
    pairs["idsum"] = pairs["doc_a"].astype("int64") + pairs["doc_b"].astype("int64")
    out = (
        pairs.groupby("category", as_index=False)
        .agg(n_pairs=("idsum", "size"), id_checksum=("idsum", "sum"))
        .sort_values("category", ignore_index=True)
    )
    return _i64(out, ["n_pairs", "id_checksum"])


SQL_SPLIT_LEAKAGE_AUDIT = """
WITH p AS (
  SELECT doc_a, doc_b FROM read_parquet('{AD}/neardup_pairs_ref.parquet')
),
c AS (
  SELECT doc_a, doc_b,
         CASE WHEN md5(CAST(doc_a AS VARCHAR) || ':split') < '1a'
              THEN 'val' ELSE 'train' END AS sa,
         CASE WHEN md5(CAST(doc_b AS VARCHAR) || ':split') < '1a'
              THEN 'val' ELSE 'train' END AS sb
  FROM p
)
SELECT CASE WHEN sa = sb AND sa = 'train' THEN 'train-train'
            WHEN sa = sb THEN 'val-val' ELSE 'train-val' END AS category,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(doc_a + doc_b) AS BIGINT) AS id_checksum
FROM c GROUP BY 1 ORDER BY 1
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


def q_sort_merge_revenue(sf_dir: str) -> pd.DataFrame:
    """Orders × customer THROUGH the sort-merge join (range-bucketed
    co-group, searchsorted run expansion — functions/relational.py::
    sort_merge_join): revenue and order count per market segment.  Same
    result as the hash-join plan; the point is the key-ordered physical
    operator the lakehouse range-clustered path wants."""
    from ..functions.relational import sort_merge_join

    orders = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": t["o_custkey"],
                "cents": pc.cast(
                    pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64()
                ),
            }
        )

    joined = sort_merge_join(
        orders.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True),
        cust,
        on="o_custkey",
        right_on="c_custkey",
    )
    out = grouped_sums(joined, ["c_mktsegment"], {"cents": "cents"}, "n_orders").to_pandas()
    out["revenue"] = _rd(out["cents"].to_numpy(np.float64) / 100.0, 2)
    out = out[["c_mktsegment", "n_orders", "revenue"]].sort_values(
        "c_mktsegment", ignore_index=True
    )
    return _i64(out, ["n_orders"])


SQL_SORT_MERGE_REVENUE = """
SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE)
             / 100.0, 2) AS revenue
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY 1 ORDER BY 1
"""


def _copurchase_weighted_edges(sf_dir: str):
    """Distinct co-purchase edges with integer weights w = max(1, 10 − c)
    (stronger ties are shorter), symmetrized — the SSSP input."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        m = df.merge(df, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        # count ORDERS per pair (a pair recurring across the bucket's orders
        # must keep its multiplicity — the co-purchase strength weight)
        g = m.groupby(["l_partkey_x", "l_partkey_y"], as_index=False).size()
        return g.rename(
            columns={"l_partkey_x": "part_a", "l_partkey_y": "part_b", "size": "c"}
        )

    edges = grouped_sums(
        bucketed_group_reduce(ds, ["l_orderkey"], per_bucket), ["part_a", "part_b"], {"c": "c"}
    )

    def weight_sym(t: pa.Table) -> pa.Table:
        a = t["part_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["part_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = np.maximum(1, 10 - c)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
                "w": pa.array(np.concatenate([w, w])),
            }
        )

    return edges.map_batches(weight_sym, batch_format="pyarrow", zero_copy_batch=True)


def ensure_sssp_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``sssp_copurchase``: expected distances from an
    INDEPENDENT scalar derivation — itertools pair expansion per order and a
    heapq Dijkstra, vs the engine's bucketed pair combiners and synchronous
    Bellman-Ford rounds."""
    import heapq as _heapq
    import os as _os
    from collections import defaultdict
    from itertools import combinations

    def build() -> pa.Table:
        t = pq.read_table(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
        by_order: dict[int, set[int]] = defaultdict(set)
        for o, p in zip(t["l_orderkey"].to_pylist(), t["l_partkey"].to_pylist()):
            by_order[int(o)].add(int(p))
        counts: dict[tuple[int, int], int] = defaultdict(int)
        for parts in by_order.values():
            for a, b in combinations(sorted(parts), 2):
                counts[(a, b)] += 1
        adj: dict[int, list[tuple[int, int]]] = defaultdict(list)
        for (a, b), c in counts.items():
            wt = max(1, 10 - c)
            adj[a].append((b, wt))
            adj[b].append((a, wt))
        source = min(adj)
        dist = {source: 0}
        heap = [(0, source)]
        while heap:
            d, u = _heapq.heappop(heap)
            if d > dist.get(u, 1 << 60):
                continue
            for v, wt in adj[u]:
                nd = d + wt
                if nd < dist.get(v, 1 << 60):
                    dist[v] = nd
                    _heapq.heappush(heap, (nd, v))
        nodes = sorted(dist)
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "dist": pa.array([dist[n] for n in nodes], pa.int64()),
            }
        )

    return _ensure_artifact(_os.path.join(_corpus_dir(sf_dir), "sssp_ref.parquet"), build)


def q_sssp_copurchase(sf_dir: str) -> pd.DataFrame:
    """Weighted single-source shortest paths over the co-purchase graph
    (functions/graph.py::sssp_bellman_ford — synchronous relax rounds,
    integer distances, broadcast dist map) from the smallest part id;
    oracle = independent heapq Dijkstra."""
    from ..functions.graph import sssp_bellman_ford

    ensure_sssp_parquet(sf_dir)
    edges = _copurchase_weighted_edges(sf_dir).materialize()
    source = int(
        edges.map_batches(
            lambda t: pa.table({"m": pa.array([pc.min(t["src"]).as_py()], pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True,
        ).to_pandas()["m"].min()
    )
    return sssp_bellman_ford(edges, source)


SQL_SSSP_COPURCHASE = """
SELECT node, dist FROM read_parquet('{AD}/sssp_ref.parquet') ORDER BY node
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


def ensure_channel_stats_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``image_channel_stats``: per-image channel sums
    recorded at SYNTHESIS time from the source pixel arrays — fully
    independent of the PNG decoder the engine must invert to reproduce
    them."""
    import os as _os

    def build() -> pa.Table:
        from ..functions.media_codecs import encode_png

        rng = np.random.default_rng(7)
        sf = _sf_of(sf_dir)
        n = max(30, min(3000, int(3000 * sf)))
        ids, payloads, rs, gs, bs, px = [], [], [], [], [], []
        for i in range(n):
            w, h = 14 + i % 19, 12 + i % 15
            img = (
                np.add.outer(np.arange(h), np.arange(w))[..., None] * [3, 11, 5]
                + rng.integers(0, 180, size=(h, w, 3))
            ).astype(np.uint8)
            ids.append(f"cimg{i:05d}")
            payloads.append(encode_png(img))
            rs.append(int(img[..., 0].sum()))
            gs.append(int(img[..., 1].sum()))
            bs.append(int(img[..., 2].sum()))
            px.append(h * w)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "n_pixels": pa.array(px, pa.int64()),
                "sum_r": pa.array(rs, pa.int64()),
                "sum_g": pa.array(gs, pa.int64()),
                "sum_b": pa.array(bs, pa.int64()),
            }
        )

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "channel_stats.parquet"), build
    )


def q_image_channel_stats(sf_dir: str) -> pd.DataFrame:
    """Dataset normalization statistics (the mean-pixel preflight every
    vision training run computes): decode each PNG in an actor pool, sum
    pixels per channel as integers, reduce corpus-wide, divide once —
    checked against synthesis-time source-array sums the decoder never saw."""
    from ..functions.media_codecs import decode_png

    src = ensure_channel_stats_parquet(sf_dir)
    ds = rd.read_parquet(src, columns=["media_id", "payload"])

    class ChannelSums:
        def __init__(self):
            self._decode = decode_png

        def __call__(self, t: pa.Table) -> pa.Table:
            n_px = np.zeros(1, np.int64)
            sums = np.zeros(3, np.int64)
            for p in t["payload"].to_pylist():
                img = self._decode(p)
                n_px[0] += img.shape[0] * img.shape[1]
                sums += img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
            return pa.table(
                {
                    "n_pixels": pa.array(n_px),
                    "sum_r": pa.array(sums[:1]),
                    "sum_g": pa.array(sums[1:2]),
                    "sum_b": pa.array(sums[2:3]),
                }
            )

    agg = (
        ds.map_batches(
            ChannelSums, batch_format="pyarrow", batch_size=64, concurrency=2,
            zero_copy_batch=True,
        )
        .to_pandas()
        .sum()
    )
    out = pd.DataFrame(
        [
            {
                "n_pixels": int(agg["n_pixels"]),
                "mean_r": float(_rd(np.array([agg["sum_r"] / agg["n_pixels"]]), 6)[0]),
                "mean_g": float(_rd(np.array([agg["sum_g"] / agg["n_pixels"]]), 6)[0]),
                "mean_b": float(_rd(np.array([agg["sum_b"] / agg["n_pixels"]]), 6)[0]),
            }
        ]
    )
    return _i64(out, ["n_pixels"])


SQL_IMAGE_CHANNEL_STATS = """
SELECT CAST(SUM(n_pixels) AS BIGINT) AS n_pixels,
       ROUND(CAST(SUM(sum_r) AS DOUBLE) / CAST(SUM(n_pixels) AS DOUBLE), 6) AS mean_r,
       ROUND(CAST(SUM(sum_g) AS DOUBLE) / CAST(SUM(n_pixels) AS DOUBLE), 6) AS mean_g,
       ROUND(CAST(SUM(sum_b) AS DOUBLE) / CAST(SUM(n_pixels) AS DOUBLE), 6) AS mean_b
FROM read_parquet('{AD}/channel_stats.parquet')
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


def ensure_als_ref_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``als_user_step``: the expected per-user ridge
    solutions replayed with an independent pandas-merge/loop derivation of
    the (customer, part) interactions — same determinism contract
    (ascending distinct items, identical BLAS kernels on identical
    inputs)."""
    import os as _os

    def build() -> pa.Table:
        li = pq.read_table(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
        ).to_pandas()
        od = pq.read_table(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        ).to_pandas()
        inter = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
        k, lam = 4, 0.1
        primes = np.array([3, 5, 7, 11], dtype=np.int64)
        from ..functions.rounding import round_like_duckdb as _rd6

        rows = []
        for uid, g in inter.groupby("o_custkey", sort=True):
            items = np.unique(g["l_partkey"].to_numpy(np.int64))
            V = ((items[:, None] * primes[None, :]) % 1000) / 1000.0 - 0.5
            A = V.T @ V + lam * np.eye(k)
            b = V.T @ np.ones(len(items))
            x = np.linalg.solve(A, b)
            rows.append((int(uid), len(items), float((x * x).sum())))
        out = pd.DataFrame(rows, columns=["user_id", "n_items", "norm2"])
        out["norm2"] = _rd6(out["norm2"].to_numpy(np.float64), 6)
        return pa.Table.from_pandas(out, preserve_index=False)

    return _ensure_artifact(_os.path.join(_corpus_dir(sf_dir), "als_ref.parquet"), build)


def q_als_user_step(sf_dir: str) -> pd.DataFrame:
    """ALS user half-step over the (customer, part) interaction graph —
    fixed integer-derived item factors, per-user ridge solves inside the
    bucketed exchange (functions/sim.py::als_user_step); interactions via
    the hash-partitioned lineitem ⋈ orders join."""
    from ..functions.relational import hash_join
    from ..functions.sim import als_user_step

    ensure_als_ref_parquet(sf_dir)
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    od = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    inter = hash_join(li, od, on="l_orderkey", right_on="o_orderkey")

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["o_custkey"], "item_id": t["l_partkey"]})

    inter = inter.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)
    out = als_user_step(inter, user_col="user_id", item_col="item_id")
    return _i64(out, ["user_id", "n_items"])


SQL_ALS_USER_STEP = """
SELECT CAST(user_id AS BIGINT) AS user_id, CAST(n_items AS BIGINT) AS n_items, norm2
FROM read_parquet('{AD}/als_ref.parquet') ORDER BY user_id
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


def ensure_mmr_ref_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``mmr_rerank``: the expected diverse top-10
    replayed with a fully scalar BM25 (python word counts, the same
    idf/tf/normalization arithmetic the SQL mirror uses) and the same
    greedy λ·rel − (1−λ)·max-Jaccard selection — independent of the
    distributed two-pass ranker and its arrow kernels."""
    import math as _math
    import os as _os

    def build() -> pa.Table:
        terms = ["table", "scan", "merge"]
        lam, pool, kk = 0.7, 50, 10
        t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        ids = [int(x) for x in t["doc_id"].to_pylist()]
        texts = [s or "" for s in t["text"].to_pylist()]
        words = [s.split(" ") for s in texts]
        n = float(len(ids))
        total_dl = float(sum(len(w) for w in words))
        from ..functions.rounding import round_like_duckdb as _rd6

        dfs = {q: sum(1 for w in words if q in w) for q in terms}
        idf = {q: _math.log((n - dfs[q] + 0.5) / (dfs[q] + 0.5) + 1) for q in terms}
        scores = []
        for i, w in enumerate(words):
            dl = len(w)
            s = 0.0
            for q in terms:
                tf = w.count(q)
                if tf > 0:
                    s = s + idf[q] * (tf * (1.2 + 1.0)) / (
                        tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl * n / total_dl)
                    )
            scores.append(s)
        order = sorted(range(len(ids)), key=lambda i: (-_rd6(np.array([scores[i]]), 6)[0], ids[i]))
        cand = order[:pool]
        rel = {i: float(_rd6(np.array([scores[i]]), 6)[0]) for i in cand}
        sets = {i: set(words[i]) for i in cand}
        selected: list[tuple[int, int, float]] = []
        remaining = list(cand)
        while remaining and len(selected) < kk:
            best_i, best_score = None, None
            for i in remaining:
                if selected:
                    msim = max(
                        float(
                            _rd6(
                                np.array(
                                    [
                                        len(sets[i] & sets[j])
                                        / (len(sets[i]) + len(sets[j]) - len(sets[i] & sets[j]))
                                    ]
                                ),
                                6,
                            )[0]
                        )
                        for _, j, _s in selected
                    )
                else:
                    msim = 0.0
                sc = round(lam * rel[i] - (1.0 - lam) * msim, 6)
                if best_score is None or sc > best_score or (
                    sc == best_score and ids[i] < ids[best_i]
                ):
                    best_i, best_score = i, sc
            selected.append((len(selected) + 1, ids[best_i], float(best_score)))
            remaining.remove(best_i)
        return pa.table(
            {
                "rank": pa.array([s[0] for s in selected], pa.int64()),
                "doc_id": pa.array([s[1] for s in selected], pa.int64()),
                "mmr_score": pa.array([s[2] for s in selected], pa.float64()),
            }
        )

    return _ensure_artifact(_os.path.join(_corpus_dir(sf_dir), "mmr_ref.parquet"), build)


def q_mmr_rerank(sf_dir: str) -> pd.DataFrame:
    """MMR diverse retrieval: distributed BM25 candidate pool (50) →
    greedy λ·relevance − (1−λ)·max-word-Jaccard re-rank to a diverse
    top-10 (functions/search.py::mmr_rerank); oracle = fully scalar
    replay artifact."""
    from ..functions.search import mmr_rerank

    ensure_mmr_ref_parquet(sf_dir)
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return mmr_rerank(ds, ["table", "scan", "merge"], k=10, pool=50)


SQL_MMR_RERANK = """
SELECT rank, doc_id, mmr_score
FROM read_parquet('{AD}/mmr_ref.parquet') ORDER BY rank
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


def q_zonemap_pruned_scan(sf_dir: str) -> pd.DataFrame:
    """Zone-map data skipping (sources/zonemap.py): events range-sorted on
    the µs timestamp into 16 files + a min/max manifest, then a 10%-window
    range count that opens ONLY overlapping files.  The count is the oracled
    surface; pytest asserts the skip receipt (most files untouched)."""
    import os as _os

    from ..sources.zonemap import MANIFEST, pruned_read, write_with_zonemaps

    ds = _t(sf_dir, "events", ["ts", "event_type"])

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ts_us": pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()),
                "event_type": t["event_type"],
            }
        )

    store = _os.path.join(_corpus_dir(sf_dir), "zonemap_events_v1")
    if not _os.path.exists(_os.path.join(store, MANIFEST)):
        write_with_zonemaps(
            ds.map_batches(to_us, batch_format="pyarrow", zero_copy_batch=True),
            store, "ts_us",
        )
    import pyarrow.parquet as _pq

    meta = _pq.read_table(f"{sf_dir}/events.parquet", columns=["ts"])
    us = pc.cast(pc.cast(meta["ts"], pa.timestamp("us")), pa.int64())
    t0, t1 = int(pc.min(us).as_py()), int(pc.max(us).as_py())
    lo = t0 + (t1 - t0) * 45 // 100
    hi = t0 + (t1 - t0) * 55 // 100
    table, _stats = pruned_read(store, lo, hi)
    out = (
        table.select(["event_type"])
        .to_pandas()
        .groupby("event_type", as_index=False)
        .size()
        .rename(columns={"size": "n"})
        .sort_values("event_type", ignore_index=True)
    )
    return _i64(out, ["n"])


SQL_ZONEMAP_PRUNED_SCAN = """
WITH b AS (
  SELECT MIN(epoch_us(ts)) AS t0, MAX(epoch_us(ts)) AS t1 FROM events
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM events CROSS JOIN b
WHERE epoch_us(ts) >= t0 + (t1 - t0) * 45 // 100
  AND epoch_us(ts) <= t0 + (t1 - t0) * 55 // 100
GROUP BY 1 ORDER BY 1
"""


def _pav_blocks(n: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Pool-adjacent-violators with EXACT integer rate compares
    (cross-multiplied — no float boundary ever decides a pool): returns the
    block index per bucket for the isotone (non-decreasing) fit."""
    blocks: list[list[int]] = []  # [n, pos, first_bucket]
    for i in range(len(n)):
        blocks.append([int(n[i]), int(pos[i]), i])
        while len(blocks) > 1 and (
            blocks[-2][1] * blocks[-1][0] > blocks[-1][1] * blocks[-2][0]
        ):
            b = blocks.pop()
            blocks[-1][0] += b[0]
            blocks[-1][1] += b[1]
    out = np.zeros(len(n), dtype=np.int64)
    for bi, blk in enumerate(blocks):
        out[blk[2] :] = bi  # overwritten by later blocks
    return out


def q_isotonic_purchase_rate(sf_dir: str) -> pd.DataFrame:
    """Isotonic (PAV) calibration of the purchase rate over hour-of-day:
    per-hour (events, purchases) integer partials reduce distributed; the
    24-bucket pool-adjacent-violators fit runs driver-side with
    cross-multiplied exact compares.  Output: hour, observed ints, fitted
    monotone rate (block pooled, round 6)."""
    ensure_isotonic_ref_parquet(sf_dir)
    ds = _t(sf_dir, "events", ["ts", "event_type"])

    def part(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        hr = (
            pc.divide(us, pa.scalar(3_600_000_000, pa.int64())).to_numpy(zero_copy_only=False)
            % 24
        ).astype(np.int64)
        is_p = pc.equal(t["event_type"], "purchase").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "hour": pa.array(np.arange(24, dtype=np.int64)),
                "n": pa.array(np.bincount(hr, minlength=24).astype(np.int64)),
                "pos": pa.array(np.bincount(hr, weights=is_p, minlength=24).astype(np.int64)),
            }
        )

    h = (
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby("hour", as_index=False)
        .sum()
        .sort_values("hour", ignore_index=True)
    )
    n = h["n"].to_numpy(np.int64)
    pos = h["pos"].to_numpy(np.int64)
    blk = _pav_blocks(n, pos)
    bn = np.bincount(blk, weights=n).astype(np.int64)
    bp = np.bincount(blk, weights=pos).astype(np.int64)
    fitted = _rd(bp[blk].astype(np.float64) / bn[blk].astype(np.float64), 6)
    out = pd.DataFrame(
        {"hour": h["hour"], "n": n, "purchases": pos, "block": blk, "fitted_rate": fitted}
    )
    return _i64(out, ["hour", "n", "purchases", "block"])


def ensure_isotonic_ref_parquet(sf_dir: str) -> str:
    """Oracle artifact: PAV replayed with an independent recursive-merge
    implementation over SQL-derivable per-hour counts."""
    import os as _os

    def build() -> pa.Table:
        import duckdb as _dd

        con = _dd.connect()
        h = con.execute(
            f"""
            SELECT (CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24) AS hour,
                   COUNT(*) AS n,
                   SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pos
            FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1 ORDER BY 1
            """
        ).df()
        n = [int(x) for x in h["n"]]
        pos = [int(x) for x in h["pos"]]

        # independent PAV: repeated full scans merging the FIRST violator
        groups = [[i, i, n[i], pos[i]] for i in range(len(n))]  # [lo, hi, n, pos]
        changed = True
        while changed:
            changed = False
            for i in range(len(groups) - 1):
                a, b = groups[i], groups[i + 1]
                if a[3] * b[2] > b[3] * a[2]:
                    groups[i] = [a[0], b[1], a[2] + b[2], a[3] + b[3]]
                    del groups[i + 1]
                    changed = True
                    break
        from ..functions.rounding import round_like_duckdb as _rd6

        hour, blkcol, fit = [], [], []
        for bi, g in enumerate(groups):
            for hh in range(g[0], g[1] + 1):
                hour.append(hh)
                blkcol.append(bi)
                fit.append(float(_rd6(np.array([g[3] / g[2]]), 6)[0]))
        return pa.table(
            {
                "hour": pa.array(hour, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "purchases": pa.array(pos, pa.int64()),
                "block": pa.array(blkcol, pa.int64()),
                "fitted_rate": pa.array(fit, pa.float64()),
            }
        )

    return _ensure_artifact(_os.path.join(_corpus_dir(sf_dir), "isotonic_ref.parquet"), build)


SQL_ISOTONIC_PURCHASE_RATE = """
SELECT hour, n, purchases, block, fitted_rate
FROM read_parquet('{AD}/isotonic_ref.parquet') ORDER BY hour
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


def q_woe_binning(sf_dir: str) -> pd.DataFrame:
    """Weight-of-evidence / information-value audit of order value deciles
    vs the return flag (the credit-scoring feature screen): decile bounds
    from the exact distributed NTILE machinery, WOE = ln(bad%/good%) per
    bin from integer counts, IV as the summed contribution."""
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderstatus"])
    from ..functions.rank import global_row_number, ntile_of

    ranked, total = global_row_number(ds, "o_totalprice", ["o_orderkey"])

    def tag(t: pa.Table) -> pa.Table:
        dec = ntile_of(t["rn"].to_numpy(zero_copy_only=False), total, 10)
        bad = pc.equal(t["o_orderstatus"], "F").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "decile": pa.array(dec.astype(np.int64)),
                "n": pa.array(np.ones(len(t), dtype=np.int64)),
                "bad": pa.array(bad.astype(np.int64)),
            }
        )

    h = (
        ranked.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby("decile", as_index=False)
        .sum()
        .sort_values("decile", ignore_index=True)
    )
    B, G = int(h["bad"].sum()), int((h["n"] - h["bad"]).sum())
    good = (h["n"] - h["bad"]).to_numpy(np.float64)
    bad = h["bad"].to_numpy(np.float64)
    woe = _rd(np.log((bad / B) / (good / G)), 6)
    iv_contrib = _rd((bad / B - good / G) * np.log((bad / B) / (good / G)), 6)
    out = pd.DataFrame(
        {"decile": h["decile"], "n": h["n"], "bad": h["bad"], "woe": woe,
         "iv_contrib": iv_contrib}
    )
    return _i64(out, ["decile", "n", "bad"])


SQL_WOE_BINNING = """
WITH r AS (
  SELECT o_orderstatus,
         NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders
),
h AS (
  SELECT decile, COUNT(*) AS n,
         SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS bad
  FROM r GROUP BY 1
),
t AS (SELECT SUM(bad) AS tb, SUM(n - bad) AS tg FROM h)
SELECT decile, CAST(n AS BIGINT) AS n, CAST(bad AS BIGINT) AS bad,
       ROUND(ln((bad / CAST(tb AS DOUBLE)) / ((n - bad) / CAST(tg AS DOUBLE))), 6) AS woe,
       ROUND((bad / CAST(tb AS DOUBLE) - (n - bad) / CAST(tg AS DOUBLE))
             * ln((bad / CAST(tb AS DOUBLE)) / ((n - bad) / CAST(tg AS DOUBLE))), 6)
         AS iv_contrib
FROM h CROSS JOIN t ORDER BY decile
"""


def q_kaplan_meier(sf_dir: str) -> pd.DataFrame:
    """Kaplan-Meier product-limit survival with RIGHT-CENSORING over gap
    sessions (30-min idle split): subjects are sessions, the event is the
    session CLOSING (a gap followed), and sessions still open at the corpus
    end (within 30 min of it) are censored.  Per-user session folds run in
    the bucketed exchange; the product-limit curve folds over the distinct-
    duration grid as exp(Σ ln(1−dᵢ/nᵢ)) — the same formulation the SQL
    window mirror uses, term-for-term."""
    from ..functions.relational import bucketed_group_reduce

    GAP = 1_800_000_000
    ds = _t(sf_dir, "events", ["user_id", "ts"])
    import pyarrow.parquet as _pq

    meta = _pq.read_table(f"{sf_dir}/events.parquet", columns=["ts"])
    us_all = pc.cast(pc.cast(meta["ts"], pa.timestamp("us")), pa.int64())
    t_end = int(pc.max(us_all).as_py())

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "us": pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()),
            }
        )

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, g in df.groupby("user_id", sort=False):
            us = np.sort(g["us"].to_numpy(np.int64))
            new_s = np.ones(len(us), dtype=bool)
            new_s[1:] = np.diff(us) > GAP
            starts = np.nonzero(new_s)[0]
            ends = np.concatenate([starts[1:] - 1, [len(us) - 1]])
            a, b = us[starts], us[ends]
            dur = (b - a) // 60_000_000
            churn = (t_end - b >= GAP).astype(np.int64)
            rows.append(pd.DataFrame({"dur": dur, "churn": churn}))
        import pandas as _pd

        return _pd.concat(rows, ignore_index=True) if rows else _pd.DataFrame(
            {"dur": _pd.Series(dtype="int64"), "churn": _pd.Series(dtype="int64")}
        )

    km = bucketed_group_reduce(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"], per_user,
    ).to_pandas()
    grid = (
        km.groupby("dur", as_index=False)
        .agg(d=("churn", "sum"), m=("churn", "size"))
        .sort_values("dur", ignore_index=True)
    )
    total = int(grid["m"].sum())
    at_risk = total - np.concatenate([[0], np.cumsum(grid["m"].to_numpy())[:-1]])
    # drop the terminal all-close row (1 - d/n = 0 → ln(0); S simply hits 0)
    keep = (grid["d"].to_numpy() > 0) & (grid["d"].to_numpy() < at_risk)
    t_ev = grid["dur"].to_numpy(np.int64)[keep]
    d_ev = grid["d"].to_numpy(np.int64)[keep]
    n_ev = at_risk[keep].astype(np.int64)
    surv = np.exp(np.cumsum(np.log(1.0 - d_ev / n_ev)))
    out = pd.DataFrame(
        {
            "duration_min": t_ev,
            "n_at_risk": n_ev,
            "n_closed": d_ev,
            "survival": _rd(surv, 6),
        }
    )
    return _i64(out, ["duration_min", "n_at_risk", "n_closed"])


SQL_KAPLAN_MEIER = """
WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
m AS (SELECT MAX(us) AS t_end FROM e),
x AS (
  SELECT user_id, us,
         CASE WHEN LAG(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
                OR us - LAG(us) OVER (PARTITION BY user_id ORDER BY us) > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM e
),
s AS (
  SELECT user_id, us,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM x
),
ses AS (SELECT user_id, sid, MIN(us) AS a, MAX(us) AS b FROM s GROUP BY 1, 2),
k AS (
  SELECT (b - a) // 60000000 AS dur,
         CASE WHEN t_end - b >= 1800000000 THEN 1 ELSE 0 END AS churn
  FROM ses CROSS JOIN m
),
g AS (SELECT dur, SUM(churn) AS d, COUNT(*) AS mm FROM k GROUP BY 1),
r AS (
  SELECT dur, d,
         (SELECT COUNT(*) FROM k) - COALESCE(SUM(mm) OVER (ORDER BY dur
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_at_risk
  FROM g
),
sv AS (
  SELECT dur, d, n_at_risk,
         EXP(SUM(LN(1.0 - d / CAST(n_at_risk AS DOUBLE)))
             OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING)) AS surv
  FROM r WHERE d > 0 AND d < n_at_risk
)
SELECT CAST(dur AS BIGINT) AS duration_min, CAST(n_at_risk AS BIGINT) AS n_at_risk,
       CAST(d AS BIGINT) AS n_closed, ROUND(surv, 6) AS survival
FROM sv ORDER BY duration_min
"""


def q_join_size_profile(sf_dir: str) -> pd.DataFrame:
    """Join-cardinality profiling WITHOUT materializing the join (the
    optimizer's question answered combiner-style): |orders ⋈ lineitem| per
    order priority = Σ_key c_left·c_right over shared keys — two per-key
    count reductions and one co-group multiply; only count rows ever move."""
    from ..functions.relational import bucketed_group_reduce

    od = _t(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    li = _t(sf_dir, "lineitem", ["l_orderkey"])

    lc = grouped_sums(li, ["l_orderkey"], {}, "c_l")

    def tag_o(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": t["o_orderkey"],
                "prio": t["o_orderpriority"],
                "c_l": pa.array(np.zeros(len(t), dtype=np.int64)),
                "is_o": pa.array(np.ones(len(t), dtype=np.int64)),
            }
        )

    def tag_l(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": t["l_orderkey"],
                "prio": pa.array([""] * len(t)),
                "c_l": t["c_l"],
                "is_o": pa.array(np.zeros(len(t), dtype=np.int64)),
            }
        )

    both = od.map_batches(tag_o, batch_format="pyarrow", zero_copy_batch=True).union(
        lc.map_batches(tag_l, batch_format="pyarrow", zero_copy_batch=True)
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        o = df[df["is_o"] == 1][["key", "prio"]]
        l = df[df["is_o"] == 0][["key", "c_l"]]
        m = o.merge(l, on="key", how="left").fillna({"c_l": 0})
        g = m.groupby("prio", as_index=False).agg(
            n_orders=("key", "size"), join_rows=("c_l", "sum")
        )
        return g

    out = (
        bucketed_group_reduce(both, ["key"], per_bucket)
        .to_pandas()
        .groupby("prio", as_index=False)
        .sum()
        .sort_values("prio", ignore_index=True)
        .rename(columns={"prio": "o_orderpriority"})
    )
    return _i64(out, ["n_orders", "join_rows"])


SQL_JOIN_SIZE_PROFILE = """
WITH lc AS (SELECT l_orderkey, COUNT(*) AS c_l FROM lineitem GROUP BY 1)
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(COALESCE(lc.c_l, 0)) AS BIGINT) AS join_rows
FROM orders o LEFT JOIN lc ON lc.l_orderkey = o.o_orderkey
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Session-4 wave 1: interval-overlap join, CDC upsert-merge, SymSpell edit-1
# join, Feistel format-preserving shuffle
# ---------------------------------------------------------------------------


def q_interval_overlap_join(sf_dir: str) -> pd.DataFrame:
    """Range/interval self-join — ``functions/intervals.py``: user-day
    activity intervals [first event, last event) paired when they overlap
    (concurrent activity).  Grid-bucketed plan: intervals fan out to hour
    cells, one hash exchange on (day, cell), per-cell vectorized pair scan,
    each pair counted exactly once in the cell holding max(start_a,
    start_b).  Oracle: the naive inequality self-join."""
    from ..functions.intervals import interval_overlap_join

    ds = _t(sf_dir, "events", ["ts", "user_id"])
    DAY_US = 86_400_000_000
    # cell width tuning: user-day activity spans most of the day, so hour
    # cells would fan every interval out ~12× and re-enumerate the same
    # dense pairs in every cell; day-sized cells minimize duplication here
    # (the grid machinery is unchanged — sparse/short intervals pick finer
    # cells)

    def to_partial(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.int64()).to_numpy()  # µs (parquet ts[us])
        user = t["user_id"].to_numpy()
        df = pd.DataFrame({"item": user, "day": ts // DAY_US, "s": ts, "e": ts})
        g = df.groupby(["item", "day"], as_index=False).agg(
            s=("s", "min"), e=("e", "max")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(to_partial, batch_format="pyarrow", zero_copy_batch=True)

    def fold_iv(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["item", "day"], as_index=False).agg(
            s=("s", "min"), e=("e", "max")
        )
        return g[g["s"] < g["e"]]

    from ..functions.relational import bucketed_group_reduce

    intervals = bucketed_group_reduce(partials, ["item", "day"], fold_iv, num_buckets=32)
    out = interval_overlap_join(intervals, "day", cell_us=DAY_US)
    out["day"] = pd.to_datetime(out["day"].astype("int64") * 86400, unit="s").dt.strftime(
        "%Y-%m-%d"
    )
    out = out.sort_values("day", ignore_index=True)
    return _i64(out, ["n_pairs", "total_overlap_us", "max_overlap_us"])


SQL_INTERVAL_OVERLAP_JOIN = """
WITH iv AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         MIN(epoch_us(ts)) AS s, MAX(epoch_us(ts)) AS e
  FROM events GROUP BY 1, 2 HAVING MIN(epoch_us(ts)) < MAX(epoch_us(ts))
),
p AS (
  SELECT a.day, LEAST(a.e, b.e) - GREATEST(a.s, b.s) AS ov
  FROM iv a JOIN iv b
    ON a.day = b.day AND a.user_id < b.user_id AND a.s < b.e AND b.s < a.e
)
SELECT strftime(make_timestamp(day * 86400000000), '%Y-%m-%d') AS day,
       COUNT(*) AS n_pairs,
       CAST(SUM(ov) AS BIGINT) AS total_overlap_us,
       CAST(MAX(ov) AS BIGINT) AS max_overlap_us
FROM p GROUP BY day ORDER BY day
"""

_MERGE_CUTOFF_US = 1_705_363_200_000_000  # 2024-01-16T00:00:00Z


def q_upsert_merge(sf_dir: str) -> pd.DataFrame:
    """CDC MERGE — ``functions/merge_cdc.py``: per-user snapshot state from
    events before the cutoff, then ONE change batch (events ≥ cutoff) is
    merged in: additive accumulators, last-writer-wins (ts, type), and a
    tombstone erasure feed (users whose md5(user ‖ ':erase') hex starts
    '0' AND who appear in the batch) deleting the key outright.  Both
    sides pre-combine per key per block before the single hash exchange.
    Oracle: recompute the post-merge state from scratch in SQL."""
    from ..functions.merge_cdc import combine_events, merge_state

    ds = _t(sf_dir, "events", ["ts", "user_id", "event_type", "value"])

    def both_partials(df: pd.DataFrame) -> pd.DataFrame:
        # ONE scan splits snapshot/batch by the cutoff and emits both
        # sides' combiner partials; the fold is associative, so snapshot
        # partials are valid MERGE inputs and everything rides one hash
        # exchange (the incremental_agg discipline)
        df = df.assign(ts=df["ts"].astype("datetime64[us]"))
        tsu = df["ts"].astype("int64")
        old = df[tsu < _MERGE_CUTOFF_US]
        new = df[tsu >= _MERGE_CUTOFF_US]
        parts = []
        if len(old):
            parts.append(combine_events(old, "user_id", "ts", "event_type", "value"))
        if len(new):
            hexes = md5_hex((new["user_id"].astype(str) + ":erase").tolist()).to_pylist()
            new = new.assign(
                __tomb=np.fromiter((h[0] == "0" for h in hexes), bool, len(hexes))
            )
            parts.append(
                combine_events(new, "user_id", "ts", "event_type", "value", "__tomb")
            )
        from ..functions.merge_cdc import STATE_COLS

        if not parts:
            return pd.DataFrame(columns=STATE_COLS)
        return pd.concat(parts, ignore_index=True)

    merged = merge_state(
        None, ds.map_batches(both_partials, batch_format="pandas")
    ).to_pandas()
    out = pd.DataFrame(
        {
            "user_id": merged["key"].astype("int64"),
            "last_ts_us": merged["last_ts_us"].astype("int64"),
            "last_type": merged["last_type"],
            "total_value": (merged["total_value_c"] / 100.0).round(2),
            "n_events": merged["n_events"].astype("int64"),
        }
    ).sort_values("user_id", ignore_index=True)
    return out


SQL_UPSERT_MERGE = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS tsu, event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS vc
  FROM events
),
tomb AS (
  SELECT DISTINCT user_id FROM ev
  WHERE tsu >= {_MERGE_CUTOFF_US}
    AND substr(md5(CAST(user_id AS VARCHAR) || ':erase'), 1, 1) = '0'
),
live AS (SELECT * FROM ev WHERE user_id NOT IN (SELECT user_id FROM tomb)),
agg AS (
  SELECT user_id, CAST(SUM(vc) AS BIGINT) AS vc, COUNT(*) AS n_events,
         MAX(tsu) AS last_ts_us
  FROM live GROUP BY user_id
),
last AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY tsu DESC) AS rn
  FROM live
)
SELECT a.user_id, a.last_ts_us, l.event_type AS last_type,
       ROUND(a.vc / 100.0, 2) AS total_value, a.n_events
FROM agg a JOIN last l ON l.user_id = a.user_id AND l.rn = 1
ORDER BY a.user_id
"""


def q_symspell_edit1_join(sf_dir: str) -> pd.DataFrame:
    """SymSpell symmetric-delete edit-1 join — ``functions/linkage.py::
    symspell_edit1_join``: EXACT-recall d≤1 blocking via single-deletion
    neighborhoods (vs ``record_linkage``'s partial-recall prefix/suffix
    blocks) over the same dirty-name corpus.  SymSpell's dictionary is the
    DISTINCT term set (canonical id = min rec_id per name): repeated names
    would otherwise blow the pair count up quadratically — identical-string
    duplicates are exact-dedup territory (``dedup_exact``), not fuzzy-join
    output.  Oracle: brute-force length-blocked Levenshtein join over the
    same distinct dictionary (independent of the blocking)."""
    from ..functions.linkage import symspell_edit1_join
    from ..functions.relational import bucketed_group_reduce

    ds = rd.read_parquet(ensure_dirty_names_parquet(sf_dir), override_num_blocks=4)

    def dict_fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("name", as_index=False).agg(rec_id=("rec_id", "min"))

    vocab = bucketed_group_reduce(ds, ["name"], dict_fold, num_buckets=16)
    out = symspell_edit1_join(vocab).to_pandas()
    out = out.sort_values(["id_a", "id_b"], ignore_index=True)
    return _i64(out, ["id_a", "id_b", "dist"])


SQL_SYMSPELL_EDIT1_JOIN = """
WITH r AS (SELECT MIN(rec_id) AS rec_id, name, LENGTH(name) AS ln
           FROM read_parquet('{AD}/dirty_names.parquet') GROUP BY name)
SELECT a.rec_id AS id_a, b.rec_id AS id_b,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
FROM r a JOIN r b
  ON a.rec_id < b.rec_id AND b.ln BETWEEN a.ln - 1 AND a.ln + 1
WHERE levenshtein(a.name, b.name) <= 1
ORDER BY id_a, id_b
""".replace("{AD}", ORACLE_ARTIFACT_DIR)

_FEISTEL_K = 16  # fixed half-width: one closed form at every sf
_FEISTEL_SAMPLE_MOD = 499


def q_feistel_permutation(sf_dir: str) -> pd.DataFrame:
    """Format-preserving epoch shuffle — ``functions/permute.py``: a
    4-round Feistel bijection over a fixed 2^32 domain maps every event id
    to a unique image; one distributed rank over the images collapses the
    padded domain to a dense permutation of [0, N).  Seekable (any worker
    computes its slice statelessly) and resumable (position is a pure
    function of id + seed) — the scale alternative to ``random_shuffle``.
    Oracle: the identical closed form unrolled in SQL + window rank."""
    from ..functions.permute import feistel_permute
    from ..functions.rank import global_row_number

    ds = _t(sf_dir, "events", ["event_id"])

    def image(t: pa.Table) -> pa.Table:
        x = t["event_id"].to_numpy()
        y = feistel_permute(x, 0, seed=7, k=_FEISTEL_K)
        return pa.table({"event_id": x, "y": y})

    imaged = ds.map_batches(image, batch_format="pyarrow", zero_copy_batch=True)
    ranked, total = global_row_number(imaged, "y", [], out_col="pos")

    def sample(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % _FEISTEL_SAMPLE_MOD == 0))

    out = ranked.map_batches(sample, batch_format="pyarrow").to_pandas()
    out["pos"] = out["pos"].astype("int64") - 1  # 0-based
    out = out[["event_id", "pos"]].sort_values("event_id", ignore_index=True)
    return _i64(out, ["event_id", "pos"])


def _feistel_sql() -> str:
    from ..functions.permute import feistel_sql_expr

    expr = feistel_sql_expr("event_id", 0, seed=7, k=_FEISTEL_K)
    return f"""
WITH p AS (SELECT event_id, {expr} AS y FROM events),
r AS (SELECT event_id, ROW_NUMBER() OVER (ORDER BY y) - 1 AS pos FROM p)
SELECT event_id, pos FROM r WHERE event_id % {_FEISTEL_SAMPLE_MOD} = 0
ORDER BY event_id
"""


SQL_FEISTEL_PERMUTATION = _feistel_sql()


# ---------------------------------------------------------------------------
# Session-4 wave 2: statistical audits — Mann-Whitney U, Theil-Sen trend,
# KS + Benjamini-Hochberg FDR, split-conformal intervals, IPS policy eval
# ---------------------------------------------------------------------------


def q_mannwhitney_u(sf_dir: str) -> pd.DataFrame:
    """Mann-Whitney U (one-vs-rest per event type over ``value``), exact
    tie-corrected, computed rank-free from a grouped cent histogram: one
    (vc, type) count exchange; average ranks come from the cumulative
    histogram, so doubled rank-sums stay INTEGER (2·avg_rank = 2·cum_before
    + t + 1) and the only float ops are the final closed-form z — written
    with the same expression tree as the SQL so the doubles agree bitwise."""
    ds = _t(sf_dir, "events", ["event_type", "value"])

    def part(t: pa.Table) -> pa.Table:
        vc = pc.cast(pc.round(pc.multiply(t["value"], 100.0), ndigits=0,
                              round_mode="half_towards_infinity"), pa.int64())
        g = (
            pa.table({"vc": vc, "event_type": t["event_type"]})
            .group_by(["vc", "event_type"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {"vc": g["vc"], "event_type": g["event_type"],
             "n": pc.cast(g["count_all"], pa.int64())}
        )

    p = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    g = p.groupby(["vc", "event_type"], as_index=False)["n"].sum()
    # bounded support (cents of a bounded metric) → driver-side grid math
    tie = g.groupby("vc", as_index=False)["n"].sum().sort_values("vc")
    tn = tie["n"].to_numpy(np.int64)
    cum_before = np.cumsum(tn) - tn
    two_avg_rank = 2 * cum_before + tn + 1  # integer 2·avg_rank per value
    rank2 = dict(zip(tie["vc"].to_numpy(), two_avg_rank))
    N = int(tn.sum())
    T = int((tn.astype(object) ** 3 - tn).sum())  # tie correction, exact
    rows = []
    for et, sub in g.groupby("event_type"):
        n1 = int(sub["n"].sum())
        n2 = N - n1
        r2 = int((sub["n"].to_numpy(np.int64) * np.array(
            [rank2[v] for v in sub["vc"]], dtype=np.int64)).sum())
        u2 = r2 - n1 * (n1 + 1)  # 2·U as exact int
        u = u2 / 2.0
        sigma = np.sqrt((n1 * n2) / 12.0 * ((N + 1) - T / (N * (N - 1.0))))
        z = ((u2 - n1 * n2) / 2.0) / sigma
        rows.append({"event_type": et, "n1": n1, "u": _rd(u, 1), "z": _rd(float(z), 6)})
    out = pd.DataFrame(rows).sort_values("event_type", ignore_index=True)
    return _i64(out, ["n1"])


SQL_MANNWHITNEY_U = """
WITH e AS (SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS vc FROM events),
g AS (SELECT vc, event_type, COUNT(*) AS n FROM e GROUP BY 1, 2),
t AS (SELECT vc, CAST(SUM(n) AS BIGINT) AS tn FROM g GROUP BY 1),
r AS (SELECT vc, tn,
             CAST(SUM(tn) OVER (ORDER BY vc ROWS UNBOUNDED PRECEDING) - tn AS BIGINT)
               AS cum_before
      FROM t),
tot AS (SELECT CAST(SUM(tn) AS BIGINT) AS N,
               CAST(SUM(tn * tn * tn - tn) AS BIGINT) AS T FROM t),
byt AS (
  SELECT g.event_type, CAST(SUM(g.n) AS BIGINT) AS n1,
         CAST(SUM(g.n * (2 * r.cum_before + r.tn + 1)) AS BIGINT) AS r2
  FROM g JOIN r USING (vc) GROUP BY 1)
SELECT event_type, n1,
       ROUND((r2 - n1 * (n1 + 1)) / 2.0, 1) AS u,
       ROUND(((r2 - n1 * (n1 + 1) - n1 * (N - n1)) / 2.0)
             / sqrt((n1 * (N - n1)) / 12.0 * ((N + 1) - T / (N * (N - 1.0)))), 6) AS z
FROM byt, tot ORDER BY event_type
"""


def q_theilsen_trend(sf_dir: str) -> pd.DataFrame:
    """Theil-Sen robust trend per event type over daily counts: the median
    of all pairwise slopes — outlier-immune where OLS is not.  Distributed
    part is the (type, day) count exchange; the O(days²) pair median is
    per-group vectorized over a bounded grid (days ≪ rows)."""
    ds = _t(sf_dir, "events", ["event_type", "ts"])
    DAY_US = 86_400_000_000

    def part(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t["ts"], pa.int64()), DAY_US)
        g = (
            pa.table({"day": day, "event_type": t["event_type"]})
            .group_by(["day", "event_type"])
            .aggregate([([], "count_all")])
        )
        return pa.table({"day": g["day"], "event_type": g["event_type"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    p = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    g = p.groupby(["event_type", "day"], as_index=False)["n"].sum()
    rows = []
    for et, sub in g.groupby("event_type"):
        sub = sub.sort_values("day")
        d = sub["day"].to_numpy(np.int64)
        n = sub["n"].to_numpy(np.int64)
        i, j = np.triu_indices(len(d), k=1)
        slopes = (n[j] - n[i]) / (d[j] - d[i]).astype(np.float64)
        rows.append(
            {"event_type": et, "n_pairs": np.int64(len(slopes)),
             "slope": _rd(float(np.median(slopes)), 6)}
        )
    out = pd.DataFrame(rows).sort_values("event_type", ignore_index=True)
    return _i64(out, ["n_pairs"])


SQL_THEILSEN_TREND = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2),
p AS (
  SELECT a.event_type, (b.n - a.n) / CAST(b.day - a.day AS DOUBLE) AS s
  FROM d a JOIN d b ON a.event_type = b.event_type AND a.day < b.day)
SELECT event_type, COUNT(*) AS n_pairs, ROUND(MEDIAN(s), 6) AS slope
FROM p GROUP BY event_type ORDER BY event_type
"""

_KS_TERMS = 10
_BH_ALPHA = 0.05


def _ks_p_terms(m: float, d: float) -> float:
    """Asymptotic two-sample KS p ≈ 2·Σ_{k=1..10} (-1)^{k-1} exp(-2k²·m·D²),
    summed in FIXED k order (the SQL unrolls the same 10 terms in the same
    order so the float result matches bitwise)."""
    md2 = m * (d * d)
    acc = 0.0
    for k in range(1, _KS_TERMS + 1):
        term = float(np.exp(-2.0 * (k * k) * md2))
        acc = acc + term if k % 2 == 1 else acc - term
    p = 2.0 * acc
    return min(max(p, 0.0), 1.0)


def _ks_p_sql(m: str, d: str) -> str:
    terms = " + ".join(
        f"{'-' if k % 2 == 0 else ''}exp(-2.0 * {k * k} * (({m}) * (({d}) * ({d}))))".replace(
            "+ -", "- "
        )
        for k in range(1, _KS_TERMS + 1)
    ).replace("+ -exp", "- exp")
    return f"LEAST(GREATEST(2.0 * ({terms}), 0.0), 1.0)"


def q_ks_fdr_audit(sf_dir: str) -> pd.DataFrame:
    """Per-source distribution-drift screen with multiplicity control:
    two-sample KS of n_chars (source vs rest-of-corpus) from ONE grouped
    histogram exchange, asymptotic p-values (fixed-order 10-term series),
    then Benjamini-Hochberg adjustment across the sources (suffix-min of
    p·M/rank) and a discovery flag at α=0.05."""
    ds = _t(sf_dir, "documents", ["source", "n_chars"])

    def part(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"v": t["n_chars"], "source": t["source"]})
            .group_by(["v", "source"])
            .aggregate([([], "count_all")])
        )
        return pa.table({"v": g["v"], "source": g["source"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    p = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    g = p.groupby(["v", "source"], as_index=False)["n"].sum()
    grid = np.sort(g["v"].unique())
    tot = g.groupby("v")["n"].sum().reindex(grid, fill_value=0).to_numpy(np.int64)
    N = int(tot.sum())
    rows = []
    for src, sub in g.groupby("source"):
        cs = sub.set_index("v")["n"].reindex(grid, fill_value=0).to_numpy(np.int64)
        n1 = int(cs.sum())
        n2 = N - n1
        dmax = float(
            np.abs(np.cumsum(cs) / n1 - np.cumsum(tot - cs) / n2).max()
        )
        m = (n1 * n2) / (n1 + n2 + 0.0)
        rows.append({"source": src, "n_docs": n1, "ks_d": dmax,
                     "p_raw": _ks_p_terms(m, dmax)})
    out = pd.DataFrame(rows).sort_values("source", ignore_index=True)
    M = len(out)
    order = np.argsort(out["p_raw"].to_numpy(), kind="stable")
    ranked = out["p_raw"].to_numpy()[order] * M / np.arange(1, M + 1)
    adj = np.minimum.accumulate(ranked[::-1])[::-1]
    adj = np.minimum(adj, 1.0)
    out["p_adj"] = 0.0
    out.loc[out.index[order], "p_adj"] = adj
    out["discovery"] = out["p_adj"] < _BH_ALPHA
    out["ks_d"] = [_rd(v, 6) for v in out["ks_d"]]
    out["p_raw"] = [_rd(v, 6) for v in out["p_raw"]]
    out["p_adj"] = [_rd(v, 6) for v in out["p_adj"]]
    return _i64(out, ["n_docs"])


def _ks_fdr_sql() -> str:
    p_expr = _ks_p_sql("m", "d")
    return f"""
WITH g AS (SELECT n_chars AS v, source, COUNT(*) AS n FROM documents GROUP BY 1, 2),
grid AS (SELECT DISTINCT v FROM g),
srcs AS (SELECT DISTINCT source FROM g),
cells AS (
  SELECT s.source, gr.v, COALESCE(g.n, 0) AS n
  FROM srcs s CROSS JOIN grid gr
  LEFT JOIN g ON g.source = s.source AND g.v = gr.v),
tot AS (SELECT v, CAST(SUM(n) AS BIGINT) AS tn FROM g GROUP BY 1),
cum AS (
  SELECT c.source, c.v,
         CAST(SUM(c.n) OVER (PARTITION BY c.source ORDER BY c.v
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cs,
         CAST(SUM(t.tn) OVER (PARTITION BY c.source ORDER BY c.v
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ct
  FROM cells c JOIN tot t ON t.v = c.v),
sizes AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n1 FROM g GROUP BY 1),
bign AS (SELECT CAST(SUM(tn) AS BIGINT) AS N FROM tot),
ks AS (
  SELECT c.source, s.n1,
         MAX(ABS(c.cs / CAST(s.n1 AS DOUBLE)
               - (c.ct - c.cs) / CAST(b.N - s.n1 AS DOUBLE))) AS d
  FROM cum c JOIN sizes s ON s.source = c.source, bign b
  GROUP BY c.source, s.n1),
praw AS (
  SELECT source, n1 AS n_docs, d AS ks_d,
         {{P}} AS p_raw
  FROM (SELECT source, n1, d,
               (n1 * CAST(b.N - n1 AS DOUBLE)) / (n1 + (b.N - n1) + 0.0) AS m
        FROM ks, bign b)),
ranked AS (
  SELECT source, n_docs, ks_d, p_raw,
         p_raw * (SELECT COUNT(*) FROM praw)
           / (ROW_NUMBER() OVER (ORDER BY p_raw, source)) AS bh_term
  FROM praw),
bh AS (
  SELECT source, n_docs, ks_d, p_raw,
         LEAST(MIN(bh_term)
               OVER (ORDER BY p_raw, source
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 1.0)
           AS p_adj
  FROM ranked)
SELECT source, n_docs, ROUND(ks_d, 6) AS ks_d, ROUND(p_raw, 6) AS p_raw,
       ROUND(p_adj, 6) AS p_adj, p_adj < {_BH_ALPHA} AS discovery
FROM bh ORDER BY source
""".replace("{P}", p_expr)


SQL_KS_FDR_AUDIT = _ks_fdr_sql()

_CONF_ALPHA = 0.1


def q_conformal_interval(sf_dir: str) -> pd.DataFrame:
    """Split-conformal prediction audit: OLS (price ~ items-per-order) fit
    on an md5-hash calibration split with EXACT integer sufficient
    statistics (Python bigint, HUGEINT in SQL), the (1-α) residual quantile
    taken as an exact order statistic (no interpolation), and finite-sample
    coverage measured on the held-out split.  Both sides ride ONE
    key-bucketed co-group exchange (lineitem rows as count partials, order
    rows as price carriers, tagged union) — per-order features, the md5
    split draw included, finalize inside the bucket, so there is no
    separate hash-join stage; the fit/quantile run over per-batch
    partials."""
    from ..functions.relational import bucketed_group_reduce

    li = _t(sf_dir, "lineitem", ["l_orderkey"]).map_batches(
        lambda t: (lambda g: pa.table({
            "k": g["l_orderkey"],
            "n_items": pc.cast(g["count_all"], pa.int64()),
            "price_c": pa.nulls(g.num_rows, pa.int64()),
        }))(t.group_by(["l_orderkey"]).aggregate([([], "count_all")])),
        batch_format="pyarrow", zero_copy_batch=True)
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
        lambda t: pa.table({
            "k": t["o_orderkey"],
            "n_items": pa.nulls(t.num_rows, pa.int64()),
            "price_c": pc.cast(pc.round(pc.multiply(
                t["o_totalprice"], pa.scalar(100.0))), pa.int64()),
        }), batch_format="pyarrow", zero_copy_batch=True)

    def cogroup_featurize(df: pd.DataFrame) -> pd.DataFrame:
        x = df.groupby("k")["n_items"].sum(min_count=1)
        price = df.loc[df["price_c"].notna()].set_index("k")["price_c"]
        both = x.index.intersection(price.index)  # inner-join semantics
        both = both[x.loc[both].notna()]
        keys = both.to_numpy(np.int64)
        hexes = md5_hex([f"{k}:conf" for k in keys]).to_pylist()
        cal = np.fromiter((h[0] in "01234567" for h in hexes), bool, len(hexes))
        return pd.DataFrame({"x": x.loc[both].to_numpy(np.int64),
                             "yc": price.loc[both].to_numpy(np.int64),
                             "cal": cal})

    # two consumers (fit stats, residual pass) — materialize once so the
    # co-group doesn't recompute
    f = bucketed_group_reduce(li.union(orders), ["k"], cogroup_featurize,
                              num_buckets=32).materialize()

    def partial_stats(df: pd.DataFrame) -> pd.DataFrame:
        c = df[df["cal"]]
        return pd.DataFrame(
            {"n": [np.int64(len(c))], "sx": [c["x"].sum()], "sy": [c["yc"].sum()],
             "sxy": [(c["x"] * c["yc"]).sum()], "sxx": [(c["x"] ** 2).sum()]}
        )

    st = f.map_batches(partial_stats, batch_format="pandas").to_pandas()
    n_cal = int(st["n"].sum())
    sx, sy = int(st["sx"].sum()), int(st["sy"].sum())
    sxy, sxx = int(st["sxy"].sum()), int(st["sxx"].sum())
    slope = float(n_cal * sxy - sx * sy) / float(n_cal * sxx - sx * sx)
    intercept = (sy - slope * sx) / n_cal
    k = int(np.ceil((1.0 - _CONF_ALPHA) * (n_cal + 1)))

    def resid(df: pd.DataFrame) -> pd.DataFrame:
        r = np.abs(df["yc"].to_numpy(np.float64)
                   - (slope * df["x"].to_numpy(np.float64) + intercept))
        return pd.DataFrame({"r": r, "cal": df["cal"]})

    res = f.map_batches(resid, batch_format="pandas").to_pandas()
    cal_r = np.sort(res.loc[res["cal"], "r"].to_numpy())
    q = float(cal_r[k - 1])
    ev = res.loc[~res["cal"], "r"].to_numpy()
    coverage = float((ev <= q).sum()) / len(ev)
    return pd.DataFrame(
        {"n_cal": pd.Series([n_cal], dtype="int64"),
         "n_eval": pd.Series([len(ev)], dtype="int64"),
         "slope": [_rd(slope, 6)], "intercept": [_rd(intercept, 6)],
         "q_hat": [_rd(q, 6)], "coverage": [_rd(coverage, 6)]}
    )


SQL_CONFORMAL_INTERVAL = f"""
WITH it AS (SELECT l_orderkey, COUNT(*) AS x FROM lineitem GROUP BY 1),
f AS (
  SELECT it.x, CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS yc,
         substr(md5(CAST(o.o_orderkey AS VARCHAR) || ':conf'), 1, 1) IN
           ('0','1','2','3','4','5','6','7') AS cal
  FROM orders o JOIN it ON it.l_orderkey = o.o_orderkey),
s AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n, CAST(SUM(x) AS HUGEINT) AS sx,
         CAST(SUM(yc) AS HUGEINT) AS sy, CAST(SUM(x * yc) AS HUGEINT) AS sxy,
         CAST(SUM(x * x) AS HUGEINT) AS sxx
  FROM f WHERE cal),
fit AS (
  SELECT CAST(n AS BIGINT) AS n_cal,
         CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
           AS slope, sx, sy, n
  FROM s),
fit2 AS (SELECT n_cal, slope,
                (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / n_cal
                  AS intercept FROM fit),
r AS (
  SELECT ABS(CAST(yc AS DOUBLE) - (f2.slope * CAST(x AS DOUBLE) + f2.intercept))
           AS r, cal
  FROM f, fit2 f2),
qh AS (
  SELECT r AS q FROM r WHERE cal ORDER BY r
  LIMIT 1 OFFSET (SELECT CAST(CEIL((1.0 - {_CONF_ALPHA}) * (n_cal + 1)) AS BIGINT) - 1
                  FROM fit2)),
cov AS (
  SELECT COUNT(*) AS n_eval,
         CAST(SUM(CASE WHEN r <= (SELECT q FROM qh) THEN 1 ELSE 0 END) AS BIGINT)
           AS hits
  FROM r WHERE NOT cal)
SELECT f2.n_cal, cov.n_eval, ROUND(f2.slope, 6) AS slope,
       ROUND(f2.intercept, 6) AS intercept, ROUND((SELECT q FROM qh), 6) AS q_hat,
       ROUND(hits / CAST(cov.n_eval AS DOUBLE), 6) AS coverage
FROM fit2 f2, cov
"""


def q_ips_policy_value(sf_dir: str) -> pd.DataFrame:
    """Off-policy evaluation (IPS) of a deterministic target policy
    (recommend 'purchase' to users whose md5(user ‖ ':policy') starts
    0-7, else 'view') against the logged event stream, with the logging
    propensity estimated as the global action frequency.  Per-action
    output rows keep every accumulator integer (cents / counts) so no
    cross-action float summation exists to diverge; the IPS term is one
    float division per row, identical on both sides."""
    ds = _t(sf_dir, "events", ["user_id", "event_type", "value"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        hexes = md5_hex((df["user_id"].astype(str) + ":policy").tolist()).to_pylist()
        pol = np.where(
            np.fromiter((h[0] in "01234567" for h in hexes), bool, len(hexes)),
            "purchase", "view")
        match = pol == df["event_type"].to_numpy()
        rc = (df["value"] * 100).round().astype("int64")
        return (
            pd.DataFrame({"event_type": df["event_type"], "m": match,
                          "rc": np.where(match, rc, 0), "one": np.int64(1)})
            .groupby("event_type", as_index=False)
            .agg(n_a=("one", "sum"), n_match=("m", "sum"), sum_rc=("rc", "sum"))
        )

    p = ds.map_batches(part, batch_format="pandas").to_pandas()
    g = p.groupby("event_type", as_index=False).agg(
        n_a=("n_a", "sum"), n_match=("n_match", "sum"), sum_rc=("sum_rc", "sum"))
    g["ips_term"] = [
        _rd((rc / 100.0) / na, 6) for rc, na in zip(g["sum_rc"], g["n_a"])]
    g["w_mass"] = [_rd(nm / float(na), 6) for nm, na in zip(g["n_match"], g["n_a"])]
    out = g.drop(columns=["sum_rc"]).sort_values("event_type", ignore_index=True)
    return _i64(out, ["n_a", "n_match"])


SQL_IPS_POLICY_VALUE = """
WITH e AS (
  SELECT event_type,
         CASE WHEN substr(md5(CAST(user_id AS VARCHAR) || ':policy'), 1, 1) IN
                ('0','1','2','3','4','5','6','7')
              THEN 'purchase' ELSE 'view' END = event_type AS m,
         CAST(ROUND(value * 100) AS BIGINT) AS rc
  FROM events)
SELECT event_type, COUNT(*) AS n_a,
       CAST(SUM(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
       ROUND((CAST(SUM(CASE WHEN m THEN rc ELSE 0 END) AS BIGINT) / 100.0)
             / COUNT(*), 6) AS ips_term,
       ROUND(CAST(SUM(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT)
             / CAST(COUNT(*) AS DOUBLE), 6) AS w_mass
FROM e GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Session-4 wave 3: k-core decomposition, compaction planner
# ---------------------------------------------------------------------------


def ensure_kcore_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``kcore_decomposition``: core numbers from an
    INDEPENDENT scalar derivation — itertools pair expansion and the exact
    Matula–Beck min-degree peeling (bucket queue), vs the engine's h-index
    fixpoint over distributed histogram partials.  Two different published
    algorithms agreeing on every node is the strongest cross-check."""
    import os as _os
    from collections import defaultdict
    from itertools import combinations

    def build() -> pa.Table:
        t = pq.read_table(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
        by_order: dict[int, set[int]] = defaultdict(set)
        for o, p in zip(t["l_orderkey"].to_pylist(), t["l_partkey"].to_pylist()):
            by_order[int(o)].add(int(p))
        adj: dict[int, set[int]] = defaultdict(set)
        for parts in by_order.values():
            for a, b in combinations(sorted(parts), 2):
                adj[a].add(b)
                adj[b].add(a)
        # Matula–Beck: repeatedly remove a minimum-degree node; its core is
        # the running max of the degree at removal time
        deg = {v: len(ns) for v, ns in adj.items()}
        buckets: dict[int, set[int]] = defaultdict(set)
        for v, d in deg.items():
            buckets[d].add(v)
        core: dict[int, int] = {}
        k = 0
        remaining = set(adj)
        while remaining:
            d = min(b for b in buckets if buckets[b])
            v = min(buckets[d])  # deterministic tie-break (order-free result)
            buckets[d].discard(v)
            remaining.discard(v)
            k = max(k, d)
            core[v] = k
            for u in adj[v]:
                if u in remaining:
                    buckets[deg[u]].discard(u)
                    deg[u] -= 1
                    buckets[deg[u]].add(u)
            deg.pop(v)
        return pa.table(
            {"node": pa.array(sorted(core), pa.int64()),
             "core": pa.array([core[n] for n in sorted(core)], pa.int64())}
        )

    return _ensure_artifact(_os.path.join(_corpus_dir(sf_dir), "kcore_ref.parquet"), build)


def q_kcore_decomposition(sf_dir: str) -> pd.DataFrame:
    """K-core decomposition of the co-purchase graph —
    ``functions/graph.py::kcore_hindex``: h-index fixpoint rounds, edge set
    distributed, per-(node, value) histogram partials; oracle = independent
    scalar Matula–Beck peeling."""
    from ..functions.graph import kcore_hindex

    ensure_kcore_parquet(sf_dir)
    edges = _copurchase_weighted_edges(sf_dir)
    return kcore_hindex(edges)


SQL_KCORE_DECOMPOSITION = """
SELECT node, core FROM read_parquet('{AD}/kcore_ref.parquet') ORDER BY node
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


_COMPACT_CAP_FACTOR = 2  # bin capacity = factor × largest cell


def ffd_pack(sizes: np.ndarray, keys: list[tuple], capacity: int) -> dict[tuple, int]:
    """First-fit-decreasing bin packing (classic 11/9·OPT+1 heuristic):
    items sorted by (size DESC, key ASC) for determinism, each placed in
    the lowest-indexed bin with room.  Runs on the PLAN manifest — grouped
    cell sizes, not rows — which stays small even at 10^12 rows (the same
    driver-side-plan contract as the flagship's shard planner)."""
    order = sorted(range(len(sizes)), key=lambda i: (-int(sizes[i]), keys[i]))
    bins: list[int] = []  # remaining capacity per bin
    assign: dict[tuple, int] = {}
    for i in order:
        s = int(sizes[i])
        for b, room in enumerate(bins):
            if s <= room:
                bins[b] = room - s
                assign[keys[i]] = b
                break
        else:
            bins.append(capacity - s)
            assign[keys[i]] = len(bins) - 1
    return assign


def q_compaction_plan(sf_dir: str) -> pd.DataFrame:
    """Small-file compaction planner: the per-(event_type, day) cell sizes
    (the 'small files' a routed sink would leave) are computed in one
    grouped count exchange; FFD packs the resulting manifest into bins of
    capacity 2× the largest cell.  Output = the full plan (cell → bin),
    ready to drive a per-bin rewrite.  Oracle: an independently-coded
    scalar FFD over the same cells (artifact)."""
    ds = _t(sf_dir, "events", ["event_type", "ts"])
    DAY_US = 86_400_000_000

    def part(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t["ts"], pa.int64()), DAY_US)
        g = (
            pa.table({"event_type": t["event_type"], "day": day})
            .group_by(["event_type", "day"])
            .aggregate([([], "count_all")])
        )
        return pa.table({"event_type": g["event_type"], "day": g["day"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    p = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    cells = p.groupby(["event_type", "day"], as_index=False)["n"].sum()
    sizes = cells["n"].to_numpy(np.int64)
    keys = list(zip(cells["event_type"], cells["day"].astype(int)))
    cap = _COMPACT_CAP_FACTOR * int(sizes.max())
    assign = ffd_pack(sizes, keys, cap)
    out = pd.DataFrame(
        {"event_type": [k[0] for k in keys], "day": [k[1] for k in keys],
         "size": sizes, "bin_id": [assign[k] for k in keys]}
    ).sort_values(["event_type", "day"], ignore_index=True)
    return _i64(out, ["day", "size", "bin_id"])


def ensure_compaction_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``compaction_plan``: the same documented FFD rule
    derived by an independent scalar pass (dict-of-lists grouping, linear
    first-fit scan) straight off the events parquet."""
    import os as _os
    from collections import defaultdict

    def build() -> pa.Table:
        t = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])
        cnt: dict[tuple, int] = defaultdict(int)
        ts_us = t["ts"].cast(pa.int64()).to_pylist()  # µs, tz-free
        for et, ts in zip(t["event_type"].to_pylist(), ts_us):
            cnt[(et, ts // 86_400_000_000)] += 1
        items = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        cap = _COMPACT_CAP_FACTOR * max(v for _, v in cnt.items())
        rooms: list[int] = []
        assign: dict[tuple, int] = {}
        for key, s in items:
            placed = False
            for b in range(len(rooms)):
                if s <= rooms[b]:
                    rooms[b] -= s
                    assign[key] = b
                    placed = True
                    break
            if not placed:
                rooms.append(cap - s)
                assign[key] = len(rooms) - 1
        ordered = sorted(cnt)
        return pa.table(
            {"event_type": pa.array([k[0] for k in ordered]),
             "day": pa.array([k[1] for k in ordered], pa.int64()),
             "size": pa.array([cnt[k] for k in ordered], pa.int64()),
             "bin_id": pa.array([assign[k] for k in ordered], pa.int64())}
        )

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "compaction_ref.parquet"), build
    )


def q_compaction_plan_checked(sf_dir: str) -> pd.DataFrame:
    ensure_compaction_parquet(sf_dir)
    return q_compaction_plan(sf_dir)


SQL_COMPACTION_PLAN = """
SELECT event_type, day, size, bin_id
FROM read_parquet('{AD}/compaction_ref.parquet')
ORDER BY event_type, day
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


# ---------------------------------------------------------------------------
# Session-4 wave 5: DoReMi mixture step, sliding-window p95, seasonal
# decomposition, quantile normalization, Jaccard link prediction
# ---------------------------------------------------------------------------

_DOREMI_ETA = 0.5  # multiplicative-weights learning rate, per nat
_HOUR_US = 3_600_000_000


def q_doremi_mixture_step(sf_dir: str) -> pd.DataFrame:
    """One DoReMi-style mixture-reweighting step (Xie et al. 2023, public
    method) over the pre-tokenized corpus: per-source unigram-LM NLL (the
    excess-loss proxy), then multiplicative weights
    w_i ∝ exp(η·(nll_i − nll_global)).  Every accumulator is integer µnats
    and the tilt is quantized to integer µweights BEFORE normalizing, so
    the weight vector is bitwise deterministic (no float-order sums).
    One token-count exchange + one broadcast-cost scoring pass."""
    import math as _math

    path = ensure_derived_parquet(sf_dir)
    ds = rd.read_parquet(path, columns=["source", "tokens"])

    def count_part(t: pa.Table) -> pa.Table:
        toks = t["tokens"].combine_chunks() if isinstance(
            t["tokens"], pa.ChunkedArray) else t["tokens"]
        flat = toks.flatten()
        g = pa.table({"tok": flat}).group_by(["tok"]).aggregate([([], "count_all")])
        return pa.table({"tok": g["tok"], "n": pc.cast(g["count_all"], pa.int64())})

    cnt = (
        ds.map_batches(count_part, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby("tok")["n"]
        .sum()
    )
    total = int(cnt.sum())
    cost = {
        int(tok): int(round(-_math.log(int(c) / total) * 1_000_000))
        for tok, c in cnt.items()
    }

    import ray as _ray

    cost_ref = _ray.put(cost)

    def score_part(t: pa.Table) -> pa.Table:
        cst = _ray.get(cost_ref)
        toks = t["tokens"].combine_chunks() if isinstance(
            t["tokens"], pa.ChunkedArray) else t["tokens"]
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        offsets = np.asarray(toks.offsets)
        lens = offsets[1:] - offsets[:-1]
        keys = np.fromiter(cst.keys(), np.int64, len(cst))
        vals = np.fromiter(cst.values(), np.int64, len(cst))
        order = np.argsort(keys)
        costs = vals[order][np.searchsorted(keys[order], flat)]
        per_row = np.add.reduceat(costs, np.r_[np.int64(0), np.cumsum(lens)[:-1]])
        per_row = np.where(lens > 0, per_row, 0)
        df = pd.DataFrame({"source": t["source"].to_pylist(),
                           "nll": per_row, "n_tok": lens})
        return pa.Table.from_pandas(
            df.groupby("source", as_index=False).sum(), preserve_index=False)

    p = ds.map_batches(score_part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    g = p.groupby("source", as_index=False).sum()
    ng, sg = int(g["n_tok"].sum()), int(g["nll"].sum())
    global_avg = sg / ng
    rows = []
    for _, r in g.iterrows():
        avg = int(r["nll"]) / int(r["n_tok"])
        excess = avg - global_avg
        tilt_u = int(round(_math.exp(_DOREMI_ETA * excess / 1_000_000.0) * 1_000_000))
        rows.append((r["source"], int(r["n_tok"]), int(r["nll"]), tilt_u))
    tot_tilt = sum(t for *_, t in rows)
    out = pd.DataFrame(
        {"source": [r[0] for r in rows],
         "n_tok": [r[1] for r in rows],
         "nll_unats": [r[2] for r in rows],
         "weight": [_rd(r[3] / float(tot_tilt), 6) for r in rows]}
    ).sort_values("source", ignore_index=True)
    return _i64(out, ["n_tok", "nll_unats"])


SQL_DOREMI_MIXTURE_STEP = f"""
WITH tok AS (
  SELECT source, UNNEST(tokens) AS t
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')),
cnt AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS s FROM cnt),
cost AS (
  SELECT t, CAST(ROUND(-LN(c / CAST((SELECT s FROM tot) AS DOUBLE)) * 1000000)
               AS BIGINT) AS u
  FROM cnt),
src AS (
  SELECT source, COUNT(*) AS n_tok, CAST(SUM(u) AS BIGINT) AS nll_unats
  FROM tok JOIN cost USING (t) GROUP BY source),
gl AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS ng,
              CAST(SUM(nll_unats) AS BIGINT) AS sg FROM src),
tilt AS (
  SELECT source, n_tok, nll_unats,
         CAST(ROUND(exp({_DOREMI_ETA} * ((nll_unats / CAST(n_tok AS DOUBLE))
               - (gl.sg / CAST(gl.ng AS DOUBLE))) / 1000000.0) * 1000000)
              AS BIGINT) AS tu
  FROM src, gl)
SELECT source, n_tok, nll_unats,
       ROUND(tu / CAST((SELECT SUM(tu) FROM tilt) AS DOUBLE), 6) AS weight
FROM tilt ORDER BY source
"""

_P95_WINDOW_H = 24


def q_sliding_p95_value(sf_dir: str) -> pd.DataFrame:
    """Sliding-window EXACT p95: for every event hour, the 95th percentile
    (exact order statistic, no interpolation) of event values over the
    trailing 24 hours.  Distributed shape: raw rows collapse to per-(hour,
    cents) histograms in one combiner pass; each histogram row fans out to
    the ≤24 output hours it serves (histogram rows, not events — the
    duplication is support-bounded); one grouped reduce per output hour
    reads the k-th value off the merged histogram."""
    ds = _t(sf_dir, "events", ["ts", "value"])

    def hist_part(t: pa.Table) -> pa.Table:
        tsu = pc.cast(t["ts"], pa.int64()).to_numpy()
        vc = pc.cast(pc.round(pc.multiply(t["value"], 100.0), ndigits=0,
                              round_mode="half_towards_infinity"), pa.int64()).to_numpy()
        df = pd.DataFrame({"h": tsu // _HOUR_US, "vc": vc})
        g = df.groupby(["h", "vc"], as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "n"}), preserve_index=False)

    hist = (
        ds.map_batches(hist_part, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby(["h", "vc"], as_index=False)["n"]
        .sum()
    )
    hours = np.sort(hist["h"].unique())
    # fan each histogram row to the output hours it serves (bounded ×24),
    # then one lexsort + reduceat pass answers EVERY window's order
    # statistic — no per-hour Python loop
    h0 = hist["h"].to_numpy(np.int64)
    v0 = hist["vc"].to_numpy(np.int64)
    n0 = hist["n"].to_numpy(np.int64)
    oh = np.concatenate([h0 + off for off in range(_P95_WINDOW_H)])
    vc = np.tile(v0, _P95_WINDOW_H)
    nn = np.tile(n0, _P95_WINDOW_H)
    pos = np.searchsorted(hours, oh)
    pos[pos >= len(hours)] = len(hours) - 1
    keep = hours[pos] == oh
    oh, vc, nn = oh[keep], vc[keep], nn[keep]
    order = np.lexsort((vc, oh))
    oh, vc, nn = oh[order], vc[order], nn[order]
    starts = np.concatenate(
        [[0], np.flatnonzero((oh[1:] != oh[:-1]) | (vc[1:] != vc[:-1])) + 1])
    ohu, vcu = oh[starts], vc[starts]
    nu = np.add.reduceat(nn, starts)
    gb = np.concatenate(
        [[0], np.flatnonzero(ohu[1:] != ohu[:-1]) + 1, [len(ohu)]])
    csum = np.cumsum(nu)
    prefix = np.concatenate([[0], csum[gb[1:-1] - 1]]) if len(gb) > 2 else (
        np.zeros(1, np.int64))
    tot = csum[gb[1:] - 1] - prefix
    k = np.ceil(0.95 * tot).astype(np.int64)
    idx = np.searchsorted(csum, prefix + k, side="left")
    out = pd.DataFrame({"hour": ohu[gb[:-1]], "n_window": tot,
                        "p95_c": vcu[idx]}).sort_values("hour",
                                                        ignore_index=True)
    return _i64(out, ["hour", "n_window", "p95_c"])


SQL_SLIDING_P95_VALUE = f"""
WITH e AS (
  SELECT epoch_us(ts) // {_HOUR_US} AS h,
         CAST(ROUND(value * 100) AS BIGINT) AS vc
  FROM events),
hours AS (SELECT DISTINCT h FROM e),
win AS (
  SELECT hh.h AS hour, e.vc
  FROM hours hh JOIN e ON e.h BETWEEN hh.h - {_P95_WINDOW_H - 1} AND hh.h),
r AS (
  SELECT hour, vc,
         ROW_NUMBER() OVER (PARTITION BY hour ORDER BY vc) AS rn,
         COUNT(*) OVER (PARTITION BY hour) AS n
  FROM win)
SELECT hour, n AS n_window, vc AS p95_c
FROM r WHERE rn = CAST(CEIL(0.95 * n) AS BIGINT)
ORDER BY hour
"""


def q_seasonal_dow_decompose(sf_dir: str) -> pd.DataFrame:
    """Additive seasonal decomposition of daily event counts per type:
    day-of-week component = mean daily count per (type, dow); the robust
    residual spread (MAD of count − dow-mean) is reported per type.
    Integer daily counts throughout; the only float ops are the final
    mean/median expressions, written identically in SQL."""
    ds = _t(sf_dir, "events", ["event_type", "ts"])
    DAY_US = 86_400_000_000

    def part(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t["ts"], pa.int64()), DAY_US)
        g = (
            pa.table({"day": day, "event_type": t["event_type"]})
            .group_by(["day", "event_type"])
            .aggregate([([], "count_all")])
        )
        return pa.table({"day": g["day"], "event_type": g["event_type"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    p = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    daily = p.groupby(["event_type", "day"], as_index=False)["n"].sum()
    # epoch day 0 = 1970-01-01 = Thursday = dow 4 under ISO-ish 0=Monday;
    # use DuckDB's dayofweek convention: 0=Sunday ⇒ dow = (day + 4) % 7
    daily["dow"] = (daily["day"] + 4) % 7
    rows = []
    for et, g in daily.groupby("event_type"):
        dow_mean = g.groupby("dow")["n"].mean()
        resid = g["n"].to_numpy(np.float64) - dow_mean[g["dow"]].to_numpy()
        med = float(np.median(resid))
        mad = float(np.median(np.abs(resid - med)))
        for dow, m in dow_mean.items():
            rows.append((et, int(dow), int(g[g["dow"] == dow]["n"].sum()),
                         int((g["dow"] == dow).sum()), _rd(float(m), 6),
                         _rd(mad, 6)))
    out = pd.DataFrame(rows, columns=[
        "event_type", "dow", "n_events", "n_days", "dow_mean", "resid_mad"]
    ).sort_values(["event_type", "dow"], ignore_index=True)
    return _i64(out, ["dow", "n_events", "n_days"])


SQL_SEASONAL_DOW_DECOMPOSE = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2),
dd AS (SELECT event_type, day, (day + 4) % 7 AS dow, n FROM d),
dm AS (
  SELECT event_type, dow, CAST(SUM(n) AS BIGINT) AS n_events,
         COUNT(*) AS n_days, AVG(n) AS dow_mean
  FROM dd GROUP BY 1, 2),
resid AS (
  SELECT dd.event_type, dd.n - dm.dow_mean AS r
  FROM dd JOIN dm ON dm.event_type = dd.event_type AND dm.dow = dd.dow),
medr AS (SELECT event_type, MEDIAN(r) AS med FROM resid GROUP BY 1),
mad AS (
  SELECT r.event_type, MEDIAN(ABS(r.r - m.med)) AS mad
  FROM resid r JOIN medr m ON m.event_type = r.event_type GROUP BY 1)
SELECT dm.event_type, dm.dow, dm.n_events, dm.n_days,
       ROUND(dm.dow_mean, 6) AS dow_mean, ROUND(mad.mad, 6) AS resid_mad
FROM dm JOIN mad ON mad.event_type = dm.event_type
ORDER BY dm.event_type, dm.dow
"""


def q_quantile_normalize(sf_dir: str) -> pd.DataFrame:
    """Quantile normalization of per-source doc-length distributions onto
    the GLOBAL distribution (the cross-source feature-alignment transform):
    a doc at within-source cumulative rank r of n maps to the global
    ⌈N·r/n⌉-th order statistic.  All ranks and order statistics are exact
    integers off one (source, value) histogram exchange; reported per
    source as the mean normalized length."""
    ds = _t(sf_dir, "documents", ["source", "n_chars"])

    def part(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"v": t["n_chars"], "source": t["source"]})
            .group_by(["v", "source"])
            .aggregate([([], "count_all")])
        )
        return pa.table({"v": g["v"], "source": g["source"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    p = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    g = p.groupby(["v", "source"], as_index=False)["n"].sum()
    glob = g.groupby("v")["n"].sum().sort_index()
    gv = glob.index.to_numpy(np.int64)
    gcum = glob.cumsum().to_numpy(np.int64)
    N = int(gcum[-1])
    rows = []
    for src, sub in g.groupby("source"):
        sub = sub.sort_values("v")
        sn = sub["n"].to_numpy(np.int64)
        n_s = int(sn.sum())
        r = np.cumsum(sn)  # within-source rank of each tied value class
        k = np.ceil(N * r / n_s).astype(np.int64)
        qv = gv[np.searchsorted(gcum, k)]
        total_q = int((qv * sn).sum())
        rows.append((src, n_s, _rd(total_q / n_s, 6)))
    out = pd.DataFrame(rows, columns=["source", "n_docs", "mean_qnorm"]).sort_values(
        "source", ignore_index=True)
    return _i64(out, ["n_docs"])


SQL_QUANTILE_NORMALIZE = """
WITH g AS (SELECT source, n_chars AS v, COUNT(*) AS n FROM documents GROUP BY 1, 2),
gdist AS (
  SELECT v, CAST(SUM(n) AS BIGINT) AS n,
         CAST(SUM(SUM(n)) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS gcum
  FROM g GROUP BY v),
bigN AS (SELECT CAST(SUM(g.n) AS BIGINT) AS N FROM g),
s AS (
  SELECT source, v, n,
         CAST(SUM(n) OVER (PARTITION BY source ORDER BY v
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS r,
         CAST(SUM(n) OVER (PARTITION BY source) AS BIGINT) AS ns
  FROM g),
k AS (
  SELECT s.source, s.v, s.n, s.ns,
         CAST(CEIL(b.N * s.r / CAST(s.ns AS DOUBLE)) AS BIGINT) AS kk
  FROM s, bigN b),
q AS (
  SELECT k.source, k.n, k.ns,
         (SELECT MIN(gl.v) FROM gdist gl WHERE gl.gcum >= k.kk) AS qv
  FROM k)
SELECT source, CAST(SUM(n) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(qv * n) AS BIGINT) / CAST(MAX(ns) AS DOUBLE), 6)
         AS mean_qnorm
FROM q GROUP BY source ORDER BY source
"""

_LINKPRED_TOPK = 50


def q_link_prediction_jaccard(sf_dir: str) -> pd.DataFrame:
    """Link prediction on the STRONG-TIE co-purchase graph (pairs co-bought
    in ≥2 orders — the weight-thresholded graph standard in link-prediction
    practice; the ≥1 graph's wedge mass Σ C(deg,2) is hub-dominated and its
    Jaccard scores are noise) by neighbor-Jaccard: score non-adjacent pairs
    sharing ≥1 strong neighbor by |N(a)∩N(b)| / |N(a)∪N(b)|, top-50 (ties →
    pair id).

    Shape: the heavy exchange is the order-bucketed co-purchase pair build
    inside :func:`_copurchase_weighted_edges`; the thresholded strong-tie
    edge list itself is output-bounded and was always collected driver-side
    for the degree/adjacency probe, so the wedge fan-out (Σ C(deg,2), tiny
    on the w≤8 graph by construction) runs as one vectorized repeat/cumsum
    pass over the sorted edge array instead of two more cluster exchanges."""
    # strong ties only: w = max(1, 10 − c) ⇒ (w ≤ 8 ⟺ c ≥ 2)
    edges = _copurchase_weighted_edges(sf_dir).map_batches(
        lambda t: t.filter(pc.less_equal(t["w"], 8)), batch_format="pyarrow",
        zero_copy_batch=True)
    # degrees + adjacency (both |V|/|E|-bounded, same contract as pagerank)
    ed = edges.to_pandas()
    if not len(ed):
        return pd.DataFrame({c: pd.Series(dtype="int64")
                             for c in ["a", "b", "cn", "jaccard_u"]})
    src = ed["src"].to_numpy(np.int64)
    dst = ed["dst"].to_numpy(np.int64)
    order = np.lexsort((dst, src))
    s, d = src[order], dst[order]
    segb = np.concatenate([[0], np.flatnonzero(s[1:] != s[:-1]) + 1, [len(s)]])
    c = np.diff(segb).astype(np.int64)
    local_i = np.arange(len(s)) - np.repeat(segb[:-1], c)
    reps = np.repeat(c, c) - 1 - local_i
    tot = int(reps.sum())
    ia = np.repeat(np.arange(len(s)), reps)
    run_start = np.repeat(np.cumsum(reps) - reps, reps)
    ib = ia + 1 + np.arange(tot) - run_start
    packed_w, cn_all = np.unique((d[ia] << 32) | d[ib], return_counts=True)
    pairs = pd.DataFrame({"a": packed_w >> 32,
                          "b": packed_w & np.int64(0xFFFFFFFF),
                          "cn": cn_all.astype(np.int64)})
    deg = ed.groupby("src")["dst"].size()
    half = ed["src"].to_numpy(np.int64) < ed["dst"].to_numpy(np.int64)
    adj_packed = np.sort((ed["src"].to_numpy(np.int64)[half] << 32)
                         | ed["dst"].to_numpy(np.int64)[half])
    pos = np.searchsorted(adj_packed, packed_w)
    pos[pos >= len(adj_packed)] = max(len(adj_packed) - 1, 0)
    is_edge = len(adj_packed) > 0 and adj_packed[pos] == packed_w
    pairs = pairs[~is_edge] if len(adj_packed) else pairs
    da = deg[pairs["a"]].to_numpy(np.int64)
    db = deg[pairs["b"]].to_numpy(np.int64)
    cn = pairs["cn"].to_numpy(np.int64)
    union = da + db - cn
    pairs = pairs.assign(jaccard_u=(cn * 1_000_000) // union)
    pairs = pairs.sort_values(["jaccard_u", "a", "b"],
                              ascending=[False, True, True], kind="stable")
    out = pairs.head(_LINKPRED_TOPK)[["a", "b", "cn", "jaccard_u"]].reset_index(
        drop=True)
    return _i64(out, ["a", "b", "cn", "jaccard_u"])


SQL_LINK_PREDICTION_JACCARD = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
   AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
deg AS (SELECT u, COUNT(*) AS d FROM e GROUP BY u),
w AS (
  SELECT e1.v AS a, e2.v AS b, COUNT(*) AS cn
  FROM e e1 JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
  GROUP BY 1, 2),
nonadj AS (
  SELECT w.a, w.b, w.cn FROM w
  LEFT JOIN e ON e.u = w.a AND e.v = w.b
  WHERE e.u IS NULL),
sc AS (
  SELECT a, b, cn,
         (cn * 1000000) // (da.d + db.d - cn) AS jaccard_u
  FROM nonadj JOIN deg da ON da.u = nonadj.a JOIN deg db ON db.u = nonadj.b)
SELECT a, b, cn, jaccard_u FROM sc
ORDER BY jaccard_u DESC, a, b LIMIT {_LINKPRED_TOPK}
"""


# ---------------------------------------------------------------------------
# Session-4 wave 6: embedding drift, bounded transitive closure, nDCG eval
# ---------------------------------------------------------------------------


def q_embedding_drift_audit(sf_dir: str) -> pd.DataFrame:
    """Embedding drift audit: per label, the cosine between the centroid of
    the even-id half and the odd-id half (self-consistency check a feature
    store runs after re-embedding).  Embeddings are quantized to integer
    µ-units FIRST, so the per-(label, parity, dim) centroid sums are exact
    int64 and the only floats are the final dot/norm expressions — written
    identically in SQL over UNNEST WITH ORDINALITY."""
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def part(t: pa.Table) -> pd.DataFrame:
        from ..functions.sim import _to_matrix

        mat = _to_matrix(t, "embedding")
        q = _rd(mat * 1e6, 0).astype(np.int64)  # integer µ-units
        vid = t["vec_id"].to_numpy(zero_copy_only=False)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        par = (vid % 2).astype(np.int64)
        n, dim = q.shape
        df = pd.DataFrame({
            "label": np.repeat(lab, dim), "parity": np.repeat(par, dim),
            "dim": np.tile(np.arange(dim, dtype=np.int64), n),
            "s": q.ravel(), "cnt": np.repeat(np.int64(1), n * dim)})
        return df.groupby(["label", "parity", "dim"], as_index=False).agg(
            s=("s", "sum"), cnt=("cnt", "sum"))

    p = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    g = p.groupby(["label", "parity", "dim"], as_index=False).agg(
        s=("s", "sum"), cnt=("cnt", "sum"))
    rows = []
    for lab, sub in g.groupby("label"):
        wide = sub.pivot_table(index="dim", columns="parity", values="s",
                               aggfunc="sum", fill_value=0)
        if 0 not in wide.columns or 1 not in wide.columns:
            continue
        a = wide[0].to_numpy(np.float64)
        b = wide[1].to_numpy(np.float64)
        n0 = int(sub.loc[sub["parity"] == 0, "cnt"].sum()) // len(wide)
        n1 = int(sub.loc[sub["parity"] == 1, "cnt"].sum()) // len(wide)
        cos = float((a * b).sum()) / (
            np.sqrt(float((a * a).sum())) * np.sqrt(float((b * b).sum())))
        rows.append((int(lab), n0, n1, _rd(cos, 6)))
    out = pd.DataFrame(rows, columns=["label", "n_even", "n_odd", "cos_drift"]
                       ).sort_values("label", ignore_index=True)
    return _i64(out, ["label", "n_even", "n_odd"])


SQL_EMBEDDING_DRIFT_AUDIT = """
WITH q AS (
  SELECT label, vec_id % 2 AS parity,
         generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(ROUND(UNNEST(CAST(embedding AS DOUBLE[])) * 1000000) AS BIGINT)
           AS qe
  FROM embeddings),
c AS (
  SELECT label, parity, dim, CAST(SUM(qe) AS BIGINT) AS s
  FROM q GROUP BY 1, 2, 3),
n AS (
  SELECT label, vec_id % 2 AS parity, COUNT(*) AS cnt
  FROM embeddings GROUP BY 1, 2),
w AS (
  SELECT a.label, a.dim, a.s AS sa, b.s AS sb
  FROM (SELECT * FROM c WHERE parity = 0) a
  JOIN (SELECT * FROM c WHERE parity = 1) b
    ON b.label = a.label AND b.dim = a.dim),
dot AS (
  SELECT label,
         CAST(SUM(sa * sb) AS DOUBLE) AS ab,
         CAST(SUM(sa * sa) AS DOUBLE) AS aa,
         CAST(SUM(sb * sb) AS DOUBLE) AS bb
  FROM w GROUP BY label)
SELECT d.label,
       (SELECT cnt FROM n WHERE n.label = d.label AND parity = 0) AS n_even,
       (SELECT cnt FROM n WHERE n.label = d.label AND parity = 1) AS n_odd,
       ROUND(ab / (sqrt(aa) * sqrt(bb)), 6) AS cos_drift
FROM dot d ORDER BY d.label
"""


def q_transitive_reach3(sf_dir: str) -> pd.DataFrame:
    """Bounded transitive closure: for every node of the strong-tie
    co-purchase graph, how many nodes sit at min-distance exactly 1, 2 and
    3 (the recommendation-radius audit).  Distributed shape: (root, node)
    frontier PAIR rows expand one hop per round through the bucketed
    exchange with per-round distinct — the all-pairs state never exceeds
    reach×|V| rows; three unrolled self-joins mirror it in SQL."""
    from ..functions.relational import bucketed_group_reduce

    edges = _copurchase_weighted_edges(sf_dir).map_batches(
        lambda t: t.filter(pc.less_equal(t["w"], 8)), batch_format="pyarrow",
        zero_copy_batch=True).materialize()

    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["root", "node"], ignore_index=True)

    # d1 frontier = the edges themselves
    d1 = edges.map_batches(
        lambda t: pa.table({"root": t["src"], "node": t["dst"]}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    ed = d1.to_pandas()  # |E|-bounded (strong ties): the hop join side
    import ray as _ray

    adj_ref = _ray.put(ed.groupby("root")["node"].apply(list).to_dict())

    def hop(df: pd.DataFrame) -> pd.DataFrame:
        adj = _ray.get(adj_ref)
        roots, nodes = [], []
        for r, nd in zip(df["root"].to_numpy(), df["node"].to_numpy()):
            for nxt in adj.get(int(nd), ()):
                roots.append(r)
                nodes.append(nxt)
        out = pd.DataFrame({"root": roots, "node": nodes})
        return out.drop_duplicates(ignore_index=True)

    seen = {1: bucketed_group_reduce(d1, ["root", "node"], dedup_pairs,
                                     num_buckets=16).to_pandas()}
    for dist in (2, 3):
        prev = rd.from_pandas(seen[dist - 1]).repartition(8)
        nxt = bucketed_group_reduce(
            prev.map_batches(hop, batch_format="pandas"),
            ["root", "node"], dedup_pairs, num_buckets=16).to_pandas()
        seen[dist] = nxt
    # min-dist: subtract closer shells and self
    def key(df):
        return set(zip(df["root"], df["node"]))

    s1, s2, s3 = key(seen[1]), key(seen[2]), key(seen[3])
    roots = sorted({r for r, _ in s1})
    ex2 = {p for p in s2 if p not in s1 and p[0] != p[1]}
    ex3 = {p for p in s3 if p not in s2 and p not in s1 and p[0] != p[1]}
    from collections import Counter

    c1 = Counter(r for r, _ in s1)
    c2 = Counter(r for r, _ in ex2)
    c3 = Counter(r for r, _ in ex3)
    out = pd.DataFrame(
        {"node": roots,
         "n_d1": [c1.get(r, 0) for r in roots],
         "n_d2": [c2.get(r, 0) for r in roots],
         "n_d3": [c3.get(r, 0) for r in roots]})
    return _i64(out.sort_values("node", ignore_index=True),
                ["node", "n_d1", "n_d2", "n_d3"])


SQL_TRANSITIVE_REACH3 = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
   AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
d1 AS (SELECT u AS root, v AS node FROM e),
d2 AS (
  SELECT DISTINCT d1.root, e.v AS node
  FROM d1 JOIN e ON e.u = d1.node),
d3 AS (
  SELECT DISTINCT d2.root, e.v AS node
  FROM d2 JOIN e ON e.u = d2.node),
x2 AS (
  SELECT root, node FROM d2 t
  WHERE NOT EXISTS (SELECT 1 FROM d1 WHERE d1.root = t.root
                      AND d1.node = t.node)
    AND root <> node),
x3 AS (
  SELECT root, node FROM d3 t
  WHERE NOT EXISTS (SELECT 1 FROM d2 WHERE d2.root = t.root
                      AND d2.node = t.node)
    AND NOT EXISTS (SELECT 1 FROM d1 WHERE d1.root = t.root
                      AND d1.node = t.node)
    AND root <> node)
SELECT d1.root AS node,
       COUNT(*) AS n_d1,
       (SELECT COUNT(*) FROM x2 WHERE x2.root = d1.root) AS n_d2,
       (SELECT COUNT(*) FROM x3 WHERE x3.root = d1.root) AS n_d3
FROM d1 GROUP BY d1.root ORDER BY node
"""

_EM_TOP = 30


def q_unigram_em_step(sf_dir: str) -> pd.DataFrame:
    """One EM iteration of unigram-LM vocabulary training (the SentencePiece
    E-step, Kudo 2018): expected piece counts from the forward-backward
    lattice over every word under the current piece costs, then re-estimated
    costs.  Per-word posteriors are exact floats from integer µnat costs
    (identical formula order on both sides); each word's expected counts are
    quantized to µ-counts BEFORE the cross-word sum, so aggregation is an
    order-free int64 fold.  Distributed shape: the word-count exchange
    feeds a driver-side E-step over the BOUNDED unique-word set (the same
    |vocab|-driver contract as the segmentation query); per-word work is
    memoized.  Output: top-30 pieces by expected count."""
    import math as _math

    from ..functions.unigram import select_vocab, substring_counts, word_counts_batch

    ds = _t(sf_dir, "documents", ["text"])

    def wc_part(t: pa.Table) -> pa.Table:
        wc = word_counts_batch(t["text"].to_pylist())
        return pa.Table.from_pandas(wc, preserve_index=False)

    wc = (
        ds.map_batches(wc_part, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby("word", as_index=False)["n"]
        .sum()
    )
    counts = substring_counts(wc)
    costs = select_vocab(counts)
    p = {piece: _math.exp(-u / 1_000_000.0) for piece, u in costs.items()}

    def estep_word(w: str) -> dict[str, int]:
        n = len(w)
        alpha = [0.0] * (n + 1)
        alpha[0] = 1.0
        for i in range(1, n + 1):
            acc = 0.0
            for L in (1, 2, 3):
                j = i - L
                if j < 0:
                    break
                pc_ = p.get(w[j:i])
                if pc_ is not None:
                    acc += alpha[j] * pc_
            alpha[i] = acc
        beta = [0.0] * (n + 1)
        beta[n] = 1.0
        for i in range(n - 1, -1, -1):
            acc = 0.0
            for L in (1, 2, 3):
                j = i + L
                if j > n:
                    break
                pc_ = p.get(w[i:j])
                if pc_ is not None:
                    acc += pc_ * beta[j]
            beta[i] = acc
        z = alpha[n]
        out: dict[str, int] = {}
        if z <= 0.0:
            return out
        for i in range(n):
            for L in (1, 2, 3):
                j = i + L
                if j > n:
                    break
                piece = w[i:j]
                pc_ = p.get(piece)
                if pc_ is None:
                    continue
                e = alpha[i] * pc_ * beta[j] / z
                out[piece] = out.get(piece, 0) + int(round(e * 1_000_000))
        return out

    ecount: dict[str, int] = {}
    for w, mult in zip(wc["word"], wc["n"]):
        for piece, eu in estep_word(w).items():
            ecount[piece] = ecount.get(piece, 0) + eu * int(mult)
    total = sum(ecount.values())
    top = sorted(ecount.items(), key=lambda kv: (-kv[1], kv[0]))[:_EM_TOP]
    rows = [
        (piece, eu, int(round(-_math.log(eu / total) * 1_000_000)))
        for piece, eu in top
    ]
    out = pd.DataFrame(rows, columns=["piece", "ecount_u", "new_cost_u"])
    return _i64(out, ["ecount_u", "new_cost_u"])


def ensure_unigram_em_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``unigram_em_step``: the same documented E-step
    derived by an independent scalar pass — its own counting loops and a
    recursive-free forward-backward written against the formula, reading
    the documents parquet directly."""
    import math as _math
    import os as _os
    from collections import Counter

    from ..functions.unigram import TOP_NGRAMS

    def build() -> pa.Table:
        t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
        wcount: Counter = Counter()
        for txt in t["text"].to_pylist():
            for w in (txt or "").split():
                wcount[w] += 1
        occ: Counter = Counter()
        for w, m in wcount.items():
            for L in (1, 2, 3):
                for i in range(len(w) - L + 1):
                    occ[w[i:i + L]] += m
        vocab = {q: c for q, c in occ.items() if len(q) == 1}
        for L in (2, 3):
            pool = sorted(((q, c) for q, c in occ.items() if len(q) == L),
                          key=lambda x: (-x[1], x[0]))[:TOP_NGRAMS]
            vocab.update(dict(pool))
        total_c = sum(vocab.values())
        prob = {q: _math.exp(-int(round(-_math.log(c / total_c) * 1_000_000))
                             / 1_000_000.0) for q, c in vocab.items()}
        ec: Counter = Counter()
        for w, m in wcount.items():
            n = len(w)
            al = [1.0] + [0.0] * n
            for i in range(1, n + 1):
                s = 0.0
                for L in (1, 2, 3):
                    if i - L >= 0 and w[i - L:i] in prob:
                        s += al[i - L] * prob[w[i - L:i]]
                al[i] = s
            be = [0.0] * n + [1.0]
            for i in range(n - 1, -1, -1):
                s = 0.0
                for L in (1, 2, 3):
                    if i + L <= n and w[i:i + L] in prob:
                        s += prob[w[i:i + L]] * be[i + L]
                be[i] = s
            if al[n] <= 0.0:
                continue
            for i in range(n):
                for L in (1, 2, 3):
                    if i + L <= n and w[i:i + L] in prob:
                        e = al[i] * prob[w[i:i + L]] * be[i + L] / al[n]
                        ec[w[i:i + L]] += int(round(e * 1_000_000)) * m
        total = sum(ec.values())
        top = sorted(ec.items(), key=lambda kv: (-kv[1], kv[0]))[:_EM_TOP]
        return pa.table(
            {"piece": pa.array([q for q, _ in top]),
             "ecount_u": pa.array([int(v) for _, v in top], pa.int64()),
             "new_cost_u": pa.array(
                 [int(round(-_math.log(v / total) * 1_000_000)) for _, v in top],
                 pa.int64())})

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "unigram_em_ref.parquet"), build
    )


def q_unigram_em_step_checked(sf_dir: str) -> pd.DataFrame:
    ensure_unigram_em_parquet(sf_dir)
    return q_unigram_em_step(sf_dir)


SQL_UNIGRAM_EM_STEP = """
SELECT piece, ecount_u, new_cost_u
FROM read_parquet('{AD}/unigram_em_ref.parquet')
ORDER BY ecount_u DESC, piece
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


_UCB_REWARD_C = 500  # reward 1 iff value ≥ $5.00
_UCB_ARMS = ("click", "error", "purchase", "signup", "view")


def _ucb1_episode(types: list[str], rewards: list[int]) -> dict[str, list[int]]:
    """One user's UCB1 replay (Li et al. 2011 offline replay: a logged round
    counts only when the policy's choice matches the logged arm).  Returns
    per-arm [n_matched, sum_reward].  Deterministic: unexplored arms are
    taken in arm-name order; UCB ties break to the lower arm index."""
    import math as _math

    n = {a: 0 for a in _UCB_ARMS}
    s = {a: 0 for a in _UCB_ARMS}
    t = 0
    out = {a: [0, 0] for a in _UCB_ARMS}
    for et, r in zip(types, rewards):
        unexplored = [a for a in _UCB_ARMS if n[a] == 0]
        if unexplored:
            choice = unexplored[0]
        else:
            best, bestv = None, None
            for a in _UCB_ARMS:
                v = s[a] / n[a] + _math.sqrt(2.0 * _math.log(t) / n[a])
                if bestv is None or v > bestv:
                    best, bestv = a, v
            choice = best
        if choice == et:
            t += 1
            n[et] += 1
            s[et] += r
            out[et][0] += 1
            out[et][1] += r
    return out


def q_ucb1_replay(sf_dir: str) -> pd.DataFrame:
    """Offline bandit policy evaluation by UCB1 replay: every USER is an
    independent episode (arms = event types, reward = value ≥ $5), so the
    inherently-sequential decision loop parallelizes across users inside
    the bucketed exchange — per-arm matched-round partials are all that
    leave a bucket.  Oracle = independent scalar replay artifact."""
    from ..functions.relational import bucketed_group_reduce

    ensure_ucb1_parquet(sf_dir)
    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id", "event_type", "value"])

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        agg = {a: [0, 0] for a in _UCB_ARMS}
        df = df.assign(ts=df["ts"].astype("datetime64[us]"))
        for _, g in df.groupby("user_id", sort=False):
            g = g.sort_values(["ts", "event_id"], kind="stable")
            rc = ((g["value"] * 100).round().astype("int64") >= _UCB_REWARD_C)
            ep = _ucb1_episode(g["event_type"].tolist(),
                               rc.astype(int).tolist())
            for a in _UCB_ARMS:
                agg[a][0] += ep[a][0]
                agg[a][1] += ep[a][1]
        return pd.DataFrame(
            {"arm": list(_UCB_ARMS),
             "n_matched": [agg[a][0] for a in _UCB_ARMS],
             "sum_reward": [agg[a][1] for a in _UCB_ARMS]})

    p = bucketed_group_reduce(ds, ["user_id"], per_user, num_buckets=32).to_pandas()
    g = p.groupby("arm", as_index=False).sum()
    g["avg_reward"] = [
        _rd(sr / nm, 6) if nm else 0.0
        for sr, nm in zip(g["sum_reward"], g["n_matched"])]
    out = g.sort_values("arm", ignore_index=True)
    return _i64(out, ["n_matched", "sum_reward"])


def ensure_ucb1_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``ucb1_replay``: the same documented replay rule
    derived by an independent scalar pass (dict-of-lists per user, explicit
    argmax loop) straight off the events parquet."""
    import math as _math
    import os as _os
    from collections import defaultdict

    def build() -> pa.Table:
        t = pq.read_table(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_id", "event_type", "value"])
        ts_us = t["ts"].cast(pa.int64()).to_pylist()
        by_user: dict[int, list] = defaultdict(list)
        for u, tsu, eid, et, v in zip(
                t["user_id"].to_pylist(), ts_us, t["event_id"].to_pylist(),
                t["event_type"].to_pylist(), t["value"].to_pylist()):
            by_user[u].append((tsu, eid, et, 1 if round(v * 100) >= _UCB_REWARD_C else 0))
        total = {a: [0, 0] for a in _UCB_ARMS}
        for u in by_user:
            evs = sorted(by_user[u])
            n = dict.fromkeys(_UCB_ARMS, 0)
            s = dict.fromkeys(_UCB_ARMS, 0)
            t_rounds = 0
            for _, _, et, r in evs:
                choice = None
                for a in _UCB_ARMS:
                    if n[a] == 0:
                        choice = a
                        break
                if choice is None:
                    bestv = None
                    for a in _UCB_ARMS:
                        v = s[a] / n[a] + _math.sqrt(2.0 * _math.log(t_rounds) / n[a])
                        if bestv is None or v > bestv:
                            choice, bestv = a, v
                if choice == et:
                    t_rounds += 1
                    n[et] += 1
                    s[et] += r
                    total[et][0] += 1
                    total[et][1] += r
        arms = sorted(_UCB_ARMS)
        rows = []
        for a in arms:
            nm, sr = total[a]
            rows.append((a, nm, sr, _rd(sr / nm, 6) if nm else 0.0))
        return pa.table(
            {"arm": pa.array([r[0] for r in rows]),
             "n_matched": pa.array([r[1] for r in rows], pa.int64()),
             "sum_reward": pa.array([r[2] for r in rows], pa.int64()),
             "avg_reward": pa.array([r[3] for r in rows], pa.float64())})

    return _ensure_artifact(_os.path.join(_corpus_dir(sf_dir), "ucb1_ref.parquet"), build)


SQL_UCB1_REPLAY = """
SELECT arm, n_matched, sum_reward, avg_reward
FROM read_parquet('{AD}/ucb1_ref.parquet') ORDER BY arm
""".replace("{AD}", ORACLE_ARTIFACT_DIR)

_NDCG_QUERIES = {
    "q_join": ("join", "hash"),
    "q_scan": ("scan", "table"),
    "q_merge": ("merge", "batch"),
}
_NDCG_K = 10


def q_ndcg_bm25_eval(sf_dir: str) -> pd.DataFrame:
    """Retrieval-quality evaluation: nDCG@10 of the BM25 ranking against a
    term-frequency relevance truth (rel(doc) = total occurrences of the
    query terms — the exact quantity BM25 approximates through saturation
    and length normalization).  Rankings order by (rounded score, doc_id);
    DCG/IDCG are float sums over ≤10 items computed in ascending rank order
    on both sides.

    Distributed shape: every doc lives in exactly ONE batch, so per-doc
    length and query-term tfs are final inside the map — only docs that
    contain at least one query term plus a per-batch (n_docs, total_len)
    stats partial leave the workers; the corpus-wide (doc, term, tf)
    exchange the first version shipped is gone.  Per-query scoring is a
    vectorized left-fold over the ≤2 terms in sorted order (absent terms
    add an exact +0.0), bit-equal to the old per-row loop."""
    import math as _math

    from ..functions.search import TOKEN_SPLIT

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    qterms = sorted({t for ts in _NDCG_QUERIES.values() for t in ts})

    def tok_part(t: pa.Table, *, qt=qterms) -> pa.Table:
        words = pc.split_pattern_regex(pc.utf8_lower(t["text"]), TOKEN_SPLIT)
        words = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        n_per = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = words.flatten()
        doc = np.repeat(t["doc_id"].to_numpy(zero_copy_only=False), n_per)
        keep = pc.and_(pc.not_equal(flat, ""),
                       pc.is_in(flat, value_set=pa.array(qt)))
        empty = pc.equal(flat, "").to_numpy(zero_copy_only=False)
        lens = np.bincount(
            np.searchsorted(np.unique(doc), doc), weights=~empty).astype(np.int64)
        # per-doc rows for query terms only (final: a doc is in one batch)
        tb = pa.table({"doc_id": pa.array(doc), "term": flat}).filter(keep)
        g = tb.group_by(["doc_id", "term"]).aggregate([([], "count_all")])
        uniq = np.unique(doc)
        # length rows ONLY for docs that hit a query term; global N and
        # total length ride as one stats partial per batch
        hit = np.isin(uniq, g["doc_id"].to_numpy(zero_copy_only=False))
        out = pa.table({
            "doc_id": pa.concat_arrays([
                g["doc_id"].combine_chunks(),
                pa.array(uniq[hit], pa.int64()),
                pa.array([-1, -1], pa.int64())]),
            "term": pa.concat_arrays([
                g["term"].combine_chunks(),
                pa.array([""] * int(hit.sum()), pa.string()),
                pa.array(["__n__", "__len__"], pa.string())]),
            "tf": pa.concat_arrays([
                pc.cast(g["count_all"], pa.int64()).combine_chunks(),
                pa.array(lens[hit], pa.int64()),
                pa.array([len(uniq), int(lens.sum())], pa.int64())]),
        })
        return out

    raw = (
        docs.map_batches(tok_part, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    N = int(raw.loc[raw["term"] == "__n__", "tf"].sum())
    total_len = int(raw.loc[raw["term"] == "__len__", "tf"].sum())
    dl = raw[raw["term"] == ""].set_index("doc_id")["tf"]
    tf = raw[~raw["term"].isin(["", "__n__", "__len__"])]
    avg_len = float(total_len) / N
    rows = []
    for qname, terms in sorted(_NDCG_QUERIES.items()):
        sub = tf[tf["term"].isin(terms)]
        df_map = sub.groupby("term")["doc_id"].nunique()
        hit_docs = np.unique(sub["doc_id"].to_numpy())
        lens = dl.loc[hit_docs].to_numpy().astype(np.int64)
        denom_len = 1.2 * (1.0 - 0.75 + 0.75 * (lens / avg_len))
        s = np.zeros(len(hit_docs))
        r = np.zeros(len(hit_docs), np.int64)
        for term in sorted(terms):
            dfv = int(df_map.get(term, 0))
            if dfv == 0:
                continue
            idf = _math.log((N - dfv + 0.5) / (dfv + 0.5) + 1.0)
            trows = sub[sub["term"] == term]
            tfv = np.zeros(len(hit_docs), np.int64)
            tfv[np.searchsorted(hit_docs, trows["doc_id"].to_numpy())] = (
                trows["tf"].to_numpy())
            s = s + idf * (tfv / (tfv + denom_len))
            r = r + tfv
        scores = {int(d): _rd(float(sc), 6) for d, sc in zip(hit_docs, s)}
        rel = {int(d): int(rv) for d, rv in zip(hit_docs, r)}
        # integer positional µ-weights kill float-order hazards: DCG_u =
        # Σ rel_i · round(1e6/log2(i+1)) is an exact int on both sides
        wq = [int(round(1e6 / _math.log2(i + 1.0))) for i in range(1, _NDCG_K + 1)]
        ranked = sorted(scores, key=lambda d: (-scores[d], d))[:_NDCG_K]
        dcg_u = sum(rel[doc] * w for doc, w in zip(ranked, wq))
        ideal = sorted(rel.values(), reverse=True)[:_NDCG_K]
        idcg_u = sum(r_ * w for r_, w in zip(ideal, wq))
        rows.append((qname, len(scores), dcg_u, idcg_u,
                     _rd(dcg_u / idcg_u, 6)))
    out = pd.DataFrame(rows, columns=["query", "n_hits", "dcg_u", "idcg_u", "ndcg"])
    return _i64(out, ["n_hits", "dcg_u", "idcg_u"])


def _ndcg_sql() -> str:
    qrows = " UNION ALL ".join(
        f"SELECT '{q}' AS query, '{t}' AS term"
        for q, terms in sorted(_NDCG_QUERIES.items()) for t in terms
    )
    return f"""
WITH toks AS (
  SELECT doc_id, UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents),
toks2 AS (SELECT * FROM toks WHERE term <> ''),
dl AS (SELECT doc_id, COUNT(*) AS len FROM toks2 GROUP BY 1),
stats AS (SELECT COUNT(*) AS n, CAST(SUM(len) AS DOUBLE) / COUNT(*) AS avglen
          FROM dl),
qt AS ({qrows}),
tf AS (
  SELECT t.doc_id, t.term, COUNT(*) AS tf FROM toks2 t
  WHERE t.term IN (SELECT term FROM qt) GROUP BY 1, 2),
dfm AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
sc AS (
  SELECT q.query, tf.doc_id,
         ROUND(SUM(ln((s.n - dfm.df + 0.5) / (dfm.df + 0.5) + 1.0)
             * (tf.tf / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75
                 * (dl.len / s.avglen))))), 6) AS score,
         CAST(SUM(tf.tf) AS BIGINT) AS rel
  FROM qt q JOIN tf ON tf.term = q.term
  JOIN dfm ON dfm.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
  GROUP BY 1, 2),
wq AS (
  SELECT i AS rn, CAST(ROUND(1000000 / log2(i + 1.0)) AS BIGINT) AS w
  FROM generate_series(1, {_NDCG_K}) g(i)),
rk AS (
  SELECT query, doc_id, score, rel,
         ROW_NUMBER() OVER (PARTITION BY query ORDER BY score DESC, doc_id)
           AS rn
  FROM sc),
ik AS (
  SELECT query, rel,
         ROW_NUMBER() OVER (PARTITION BY query ORDER BY rel DESC, doc_id)
           AS rn
  FROM sc),
dcg AS (
  SELECT rk.query, CAST(SUM(rk.rel * wq.w) AS BIGINT) AS dcg_u
  FROM rk JOIN wq ON wq.rn = rk.rn GROUP BY rk.query),
idcg AS (
  SELECT ik.query, CAST(SUM(ik.rel * wq.w) AS BIGINT) AS idcg_u
  FROM ik JOIN wq ON wq.rn = ik.rn GROUP BY ik.query),
hits AS (SELECT query, COUNT(*) AS n_hits FROM sc GROUP BY query)
SELECT h.query, h.n_hits, d.dcg_u, i.idcg_u,
       ROUND(d.dcg_u / CAST(i.idcg_u AS DOUBLE), 6) AS ndcg
FROM hits h JOIN dcg d USING (query) JOIN idcg i USING (query)
ORDER BY h.query
"""


SQL_NDCG_BM25_EVAL = _ndcg_sql()


# ---------------------------------------------------------------------------
# Session-4 wave 4: streaming watermark audit, schema drift, l-diversity,
# bloom false-positive audit, group-sequential A/B boundary
# ---------------------------------------------------------------------------

_WM_LAG_US = 300_000_000  # 5-minute watermark lag


def q_watermark_late_events(sf_dir: str) -> pd.DataFrame:
    """Streaming watermark / late-data audit: events arrive in event_id
    order (the synthetic arrival log); the watermark after arrival i is
    max(event-time ≤ i) − 5 min, and an event is LATE iff its event time is
    below the watermark of the PREVIOUS arrival — the exact rule a
    streaming window operator applies before dropping/redirecting a row.
    Distributed prefix-max: event_id is contiguous, so fixed ranges bucket
    the arrival order; per-bucket maxima fold on the driver into exclusive
    carry-in offsets, then one grouped pass computes in-bucket running
    maxima and per-event-hour late counts — two linear scans, no sort."""
    path = f"{sf_dir}/events.parquet"
    n_rows = pq.ParquetFile(path).metadata.num_rows
    n_buckets = 64
    span = (n_rows + n_buckets - 1) // n_buckets

    ds = _t(sf_dir, "events", ["event_id", "ts"])

    def bucket_max(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        tsu = pc.cast(t["ts"], pa.int64()).to_numpy()
        b = eid // span
        df = pd.DataFrame({"b": b, "m": tsu}).groupby("b", as_index=False)["m"].max()
        return pa.Table.from_pandas(df, preserve_index=False)

    bm = (
        ds.map_batches(bucket_max, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby("b")["m"]
        .max()
        .sort_index()
    )
    # exclusive carry-in: max event-time over all PRIOR buckets (sentinel
    # far below any timestamp but safe against the -LAG subtraction)
    carry_vals = np.r_[np.int64(-(1 << 62)), bm.cummax().to_numpy()[:-1]]
    carry = {int(b): int(v) for b, v in zip(bm.index, carry_vals)}

    import ray as _ray

    carry_ref = _ray.put(carry)

    def add_bucket(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        return t.append_column("b", pa.array((eid // span).astype(np.int64)))

    def late_partial(df: pd.DataFrame) -> pd.DataFrame:
        cr = _ray.get(carry_ref)
        df = df.sort_values("event_id", kind="stable")
        tsu = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        prior = int(cr[int(df["b"].iloc[0])])
        runmax = np.maximum(np.maximum.accumulate(tsu), prior)
        wm_before = np.r_[np.int64(prior), runmax[:-1]]  # watermark basis
        late = tsu < (wm_before - _WM_LAG_US)
        hour = tsu // _HOUR_US
        g = pd.DataFrame({"hour": hour, "late": late.astype(np.int64)})
        out = g.groupby("hour", as_index=False).agg(
            n_events=("late", "size"), n_late=("late", "sum"))
        return out

    from ..functions.relational import bucketed_group_reduce

    partials = bucketed_group_reduce(
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True),
        ["b"], late_partial, num_buckets=n_buckets)
    out = (
        partials.to_pandas()
        .groupby("hour", as_index=False)[["n_events", "n_late"]]
        .sum()
        .sort_values("hour", ignore_index=True)
    )
    return _i64(out, ["hour", "n_events", "n_late"])


SQL_WATERMARK_LATE_EVENTS = f"""
WITH w AS (
  SELECT epoch_us(ts) AS tsu,
         MAX(epoch_us(ts)) OVER (ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM events)
SELECT tsu // {_HOUR_US} AS hour, COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN wm IS NOT NULL AND tsu < wm - {_WM_LAG_US}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late
FROM w GROUP BY 1 ORDER BY 1
"""


def q_schema_drift_audit(sf_dir: str) -> pd.DataFrame:
    """Data-quality profile drift: per-column profiles (rows, nulls, exact
    distinct, mean for numeric) of the two halves of the event stream
    (before/after the cutoff), with an integer cross-multiplied drift flag
    (distinct-count ratio > 1.5).  Distinct counts are exact via one
    (column, value, half) combiner exchange — the expectation-suite gate a
    pipeline runs before promoting new data."""
    ds = _t(sf_dir, "events", ["ts", "event_type", "user_id", "value"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        tsu = df["ts"].astype("datetime64[us]").astype("int64")
        half = (tsu >= _MERGE_CUTOFF_US).map({False: "a", True: "b"})
        frames = []
        for col in ("event_type", "user_id", "value"):
            v = df[col]
            if col == "value":
                cents = (v.fillna(0.0) * 100).round().astype("int64")
                key = cents.astype(str)
            else:
                cents = 0
                key = v.astype(str)
            g = pd.DataFrame({
                "col": col, "half": half, "val": key,
                "isnull": v.isna().astype(np.int64),
                "cents": cents,
            })
            frames.append(
                g.groupby(["col", "half", "val"], as_index=False).agg(
                    n=("isnull", "size"), n_null=("isnull", "sum"),
                    sum_c=("cents", "sum"))
            )
        return pd.concat(frames, ignore_index=True)

    from ..functions.relational import bucketed_group_reduce

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["col", "half", "val"], as_index=False).agg(
            n=("n", "sum"), n_null=("n_null", "sum"), sum_c=("sum_c", "sum"))

    vals = bucketed_group_reduce(
        ds.map_batches(part, batch_format="pandas"), ["col", "half", "val"], fold
    ).to_pandas()
    prof = vals.groupby(["col", "half"], as_index=False).agg(
        n=("n", "sum"), n_null=("n_null", "sum"),
        n_distinct=("val", "size"), sum_c=("sum_c", "sum"))
    rows = []
    for col, g in prof.groupby("col"):
        a = g[g["half"] == "a"].iloc[0]
        b = g[g["half"] == "b"].iloc[0]
        da, db = int(a["n_distinct"]), int(b["n_distinct"])
        drift = 2 * max(da, db) > 3 * min(da, db)
        mean_a = _rd((int(a["sum_c"]) / 100.0) / int(a["n"]), 6) if col == "value" else -1.0
        mean_b = _rd((int(b["sum_c"]) / 100.0) / int(b["n"]), 6) if col == "value" else -1.0
        rows.append((col, int(a["n"]), int(b["n"]), int(a["n_null"]),
                     int(b["n_null"]), da, db, mean_a, mean_b, drift))
    out = pd.DataFrame(rows, columns=[
        "col", "n_a", "n_b", "null_a", "null_b", "distinct_a", "distinct_b",
        "mean_a", "mean_b", "drift"]).sort_values("col", ignore_index=True)
    return _i64(out, ["n_a", "n_b", "null_a", "null_b", "distinct_a", "distinct_b"])


SQL_SCHEMA_DRIFT_AUDIT = f"""
WITH e AS (
  SELECT CASE WHEN epoch_us(ts) >= {_MERGE_CUTOFF_US} THEN 'b' ELSE 'a' END AS half,
         event_type, user_id, CAST(ROUND(value * 100) AS BIGINT) AS vc, value
  FROM events),
p AS (
  SELECT 'event_type' AS col, half, COUNT(*) AS n,
         CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         COUNT(DISTINCT event_type) AS n_distinct, CAST(0 AS BIGINT) AS sum_c
  FROM e GROUP BY half
  UNION ALL
  SELECT 'user_id', half, COUNT(*),
         CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         COUNT(DISTINCT user_id), CAST(0 AS BIGINT)
  FROM e GROUP BY half
  UNION ALL
  SELECT 'value', half, COUNT(*),
         CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         COUNT(DISTINCT vc), CAST(SUM(vc) AS BIGINT)
  FROM e GROUP BY half)
SELECT a.col, a.n AS n_a, b.n AS n_b, a.n_null AS null_a, b.n_null AS null_b,
       a.n_distinct AS distinct_a, b.n_distinct AS distinct_b,
       CASE WHEN a.col = 'value' THEN ROUND((a.sum_c / 100.0) / a.n, 6)
            ELSE -1.0 END AS mean_a,
       CASE WHEN a.col = 'value' THEN ROUND((b.sum_c / 100.0) / b.n, 6)
            ELSE -1.0 END AS mean_b,
       2 * GREATEST(a.n_distinct, b.n_distinct)
         > 3 * LEAST(a.n_distinct, b.n_distinct) AS drift
FROM p a JOIN p b ON a.col = b.col AND a.half = 'a' AND b.half = 'b'
ORDER BY a.col
"""

_LDIV_MIN = 3


def q_l_diversity_audit(sf_dir: str) -> pd.DataFrame:
    """l-diversity privacy audit (complements ``k_anonymity_audit``): per
    quasi-identifier class (mktsegment × nation), the count of DISTINCT
    sensitive values — here each customer's first-order priority — must
    reach l=3 or the class leaks.  One hash join + one grouped distinct;
    customers without orders carry no sensitive value (documented)."""
    from ..functions.relational import bucketed_group_reduce, hash_join

    orders = _t(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_orderkey",
                                   "o_orderpriority"])

    def first_order(df: pd.DataFrame) -> pd.DataFrame:
        # keeps the (date, key) sort columns so the fold can re-reduce
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                            kind="stable")
        return df.groupby("o_custkey", as_index=False).first()

    sens = bucketed_group_reduce(
        orders.map_batches(first_order, batch_format="pandas"),
        ["o_custkey"], first_order, num_buckets=32)
    cust = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment", "c_nationkey"])
    joined = hash_join(cust, sens, "c_custkey", "o_custkey")

    def class_part(df: pd.DataFrame) -> pd.DataFrame:
        # one combiner carries BOTH facts: distinct (class, priority) rows
        # with member multiplicities — l and m fold from the same exchange
        return df.groupby(
            ["c_mktsegment", "c_nationkey", "o_orderpriority"], as_index=False
        ).size().rename(columns={"size": "m"})

    def class_fold(df: pd.DataFrame) -> pd.DataFrame:
        d = df.groupby(
            ["c_mktsegment", "c_nationkey", "o_orderpriority"], as_index=False
        )["m"].sum()
        return d.groupby(["c_mktsegment", "c_nationkey"], as_index=False).agg(
            l=("o_orderpriority", "nunique"), m=("m", "sum"))

    j = bucketed_group_reduce(
        joined.map_batches(class_part, batch_format="pandas"),
        ["c_mktsegment", "c_nationkey"], class_fold, num_buckets=16
    ).to_pandas()
    low = j[j["l"] < _LDIV_MIN]
    return pd.DataFrame({
        "n_classes": pd.Series([len(j)], dtype="int64"),
        "n_low_l_classes": pd.Series([len(low)], dtype="int64"),
        "n_exposed_customers": pd.Series([int(low["m"].sum())], dtype="int64"),
        "min_l": pd.Series([int(j["l"].min())], dtype="int64"),
    })


SQL_L_DIVERSITY_AUDIT = f"""
WITH fo AS (
  SELECT o_custkey, o_orderpriority,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders),
s AS (SELECT o_custkey, o_orderpriority FROM fo WHERE rn = 1),
j AS (
  SELECT c.c_mktsegment, c.c_nationkey, s.o_orderpriority
  FROM customer c JOIN s ON s.o_custkey = c.c_custkey),
cls AS (
  SELECT c_mktsegment, c_nationkey,
         COUNT(DISTINCT o_orderpriority) AS l, COUNT(*) AS m
  FROM j GROUP BY 1, 2)
SELECT COUNT(*) AS n_classes,
       CAST(SUM(CASE WHEN l < {_LDIV_MIN} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_low_l_classes,
       CAST(SUM(CASE WHEN l < {_LDIV_MIN} THEN m ELSE 0 END) AS BIGINT)
         AS n_exposed_customers,
       CAST(MIN(l) AS BIGINT) AS min_l
FROM cls
"""

_BLOOM_M = 16384
_BLOOM_K = 3


def q_bloom_fp_audit(sf_dir: str) -> pd.DataFrame:
    """Bloom-filter false-positive audit: insert the distinct ordering
    customers (k=3 md5-derived bit positions, m=16384), probe EVERY
    customer, and measure the actual FP rate on true negatives against the
    classic (1−e^{−kn/m})^k estimate — the sizing check a bloom-pushdown
    join (``bloom_semi_join``) relies on.  The bit array is a per-batch
    OR-fold (m-bounded partials), the true-negative set comes from one
    broadcast key set (the documented <2M broadcast regime)."""
    orders = _t(sf_dir, "orders", ["o_custkey"])

    def key_part(t: pa.Table) -> pa.Table:
        u = np.unique(t["o_custkey"].to_numpy(zero_copy_only=False))
        return pa.table({"k": pa.array(u.astype(np.int64))})

    keys = np.unique(
        orders.map_batches(key_part, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()["k"].to_numpy()
    )

    def positions(ks: np.ndarray) -> np.ndarray:
        out = np.empty((len(ks), _BLOOM_K), dtype=np.int64)
        for i in range(_BLOOM_K):
            hexes = md5_hex([f"{int(k)}:b{i}" for k in ks]).to_pylist()
            out[:, i] = np.array([int(h[:8], 16) for h in hexes]) % _BLOOM_M
        return out

    bits = np.zeros(_BLOOM_M, dtype=bool)
    bits[positions(keys).ravel()] = True

    import ray as _ray

    bits_ref = _ray.put(bits)
    keyset_ref = _ray.put(set(int(k) for k in keys))

    cust = _t(sf_dir, "customer", ["c_custkey"])

    def probe(t: pa.Table) -> pa.Table:
        bt = _ray.get(bits_ref)
        ks = _ray.get(keyset_ref)
        base = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        # probe every customer PLUS a shifted guaranteed-negative twin
        # (custkeys < 10^7 by corpus contract), so the FP denominator is
        # never empty even when every customer has ordered
        ck = np.concatenate([base, base + 10_000_000])
        pos = positions(ck)
        hit = bt[pos].all(axis=1)
        neg = np.array([int(c) not in ks for c in ck])
        return pa.table({
            "n_neg": pa.array([int(neg.sum())], pa.int64()),
            "n_fp": pa.array([int((hit & neg).sum())], pa.int64()),
        })

    p = cust.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    n_neg, n_fp = int(p["n_neg"].sum()), int(p["n_fp"].sum())
    n_keys = len(keys)
    fp_rate = _rd(n_fp / float(n_neg), 6) if n_neg else 0.0
    fp_theory = _rd(
        (1.0 - np.exp(-(_BLOOM_K * n_keys) / float(_BLOOM_M))) ** _BLOOM_K, 6)
    return pd.DataFrame({
        "n_keys": pd.Series([n_keys], dtype="int64"),
        "n_neg_probes": pd.Series([n_neg], dtype="int64"),
        "n_fp": pd.Series([n_fp], dtype="int64"),
        "fp_rate": [fp_rate], "fp_theory": [float(fp_theory)],
    })


SQL_BLOOM_FP_AUDIT = f"""
WITH ks AS (SELECT DISTINCT o_custkey AS k FROM orders),
ins AS (
  SELECT DISTINCT CAST('0x' || substr(md5(CAST(k AS VARCHAR) || ':b' || i), 1, 8)
                       AS BIGINT) % {_BLOOM_M} AS pos
  FROM ks, generate_series(0, {_BLOOM_K - 1}) g(i)),
pk AS (
  SELECT c_custkey AS ck FROM customer
  UNION ALL
  SELECT c_custkey + 10000000 FROM customer),
probes AS (
  SELECT ck,
         CAST('0x' || substr(md5(CAST(ck AS VARCHAR) || ':b' || i), 1, 8)
              AS BIGINT) % {_BLOOM_M} AS pos
  FROM pk, generate_series(0, {_BLOOM_K - 1}) g(i)),
hits AS (
  SELECT p.ck, CAST(COUNT(*) AS BIGINT) = {_BLOOM_K} AS all_set
  FROM probes p JOIN ins ON ins.pos = p.pos GROUP BY p.ck),
neg AS (
  SELECT pk.ck, COALESCE(h.all_set, FALSE) AS all_set
  FROM pk LEFT JOIN hits h ON h.ck = pk.ck
  WHERE pk.ck NOT IN (SELECT k FROM ks)),
agg AS (
  SELECT (SELECT COUNT(*) FROM ks) AS n_keys, COUNT(*) AS n_neg_probes,
         CAST(SUM(CASE WHEN all_set THEN 1 ELSE 0 END) AS BIGINT) AS n_fp
  FROM neg)
SELECT n_keys, n_neg_probes, n_fp,
       ROUND(n_fp / CAST(n_neg_probes AS DOUBLE), 6) AS fp_rate,
       ROUND(pow(1.0 - exp(-({_BLOOM_K} * n_keys) / CAST({_BLOOM_M} AS DOUBLE)),
                 {_BLOOM_K}), 6) AS fp_theory
FROM agg
"""

_GSQ_C = 2.8


def q_group_sequential_ab(sf_dir: str) -> pd.DataFrame:
    """Group-sequential A/B monitoring (O'Brien-Fleming-style boundary):
    arms = user parity, per-day CUMULATIVE z of the mean-value difference
    (all accumulators integer cents; the pooled variance is one global
    exact pass) against boundary c/√(t/T) — the early-stopping replay a
    metrics pipeline runs nightly.  One (day, arm) combiner exchange; the
    day-level scan is bounded."""
    ds = _t(sf_dir, "events", ["ts", "user_id", "value"])
    DAY_US = 86_400_000_000

    def part(df: pd.DataFrame) -> pd.DataFrame:
        tsu = df["ts"].astype("datetime64[us]").astype("int64")
        vc = (df["value"] * 100).round().astype("int64")
        g = pd.DataFrame({
            "day": tsu // DAY_US,
            "arm": (df["user_id"] % 2).astype(np.int64),
            "vc": vc, "vc2": vc * vc, "one": np.int64(1)})
        return g.groupby(["day", "arm"], as_index=False).agg(
            n=("one", "sum"), s=("vc", "sum"), q=("vc2", "sum"))

    p = ds.map_batches(part, batch_format="pandas").to_pandas()
    g = p.groupby(["day", "arm"], as_index=False).agg(
        n=("n", "sum"), s=("s", "sum"), q=("q", "sum"))
    N = int(g["n"].sum())
    S = int(g["s"].sum())
    Q = int(g["q"].sum())
    mean_all = (S / 100.0) / N
    var = (Q / 10000.0 - N * mean_all * mean_all) / (N - 1)
    days = np.sort(g["day"].unique())
    T = len(days)
    cum = {0: [0, 0], 1: [0, 0]}  # arm -> [n, s]
    rows = []
    for t_idx, d in enumerate(days, 1):
        for arm in (0, 1):
            sub = g[(g["day"] == d) & (g["arm"] == arm)]
            if len(sub):
                cum[arm][0] += int(sub["n"].iloc[0])
                cum[arm][1] += int(sub["s"].iloc[0])
        na, nb = cum[0][0], cum[1][0]
        if na == 0 or nb == 0:
            continue
        ma = (cum[0][1] / 100.0) / na
        mb = (cum[1][1] / 100.0) / nb
        z = (ma - mb) / np.sqrt(var * (1.0 / na + 1.0 / nb))
        boundary = _GSQ_C / np.sqrt(t_idx / (T * 1.0))
        rows.append((int(d), na, nb, _rd(float(z), 6), _rd(float(boundary), 6),
                     bool(abs(z) > boundary)))
    out = pd.DataFrame(rows, columns=["day", "n_a", "n_b", "z", "boundary",
                                      "crossed"])
    return _i64(out, ["day", "n_a", "n_b"])


SQL_GROUP_SEQUENTIAL_AB = f"""
WITH e AS (
  SELECT epoch_us(ts) // 86400000000 AS day, user_id % 2 AS arm,
         CAST(ROUND(value * 100) AS BIGINT) AS vc
  FROM events),
v AS (
  SELECT CAST(SUM(vc) AS BIGINT) AS S, CAST(SUM(vc * vc) AS BIGINT) AS Q,
         COUNT(*) AS N
  FROM e),
d AS (
  SELECT day, arm, COUNT(*) AS n, CAST(SUM(vc) AS BIGINT) AS s
  FROM e GROUP BY 1, 2),
grid AS (
  SELECT dd.day, t.arm
  FROM (SELECT DISTINCT day FROM e) dd, (VALUES (0), (1)) t(arm)),
dg AS (
  SELECT g.day, g.arm, COALESCE(d.n, 0) AS n, COALESCE(d.s, 0) AS s
  FROM grid g LEFT JOIN d ON d.day = g.day AND d.arm = g.arm),
cum AS (
  SELECT day, arm,
         CAST(SUM(n) OVER (PARTITION BY arm ORDER BY day
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cn,
         CAST(SUM(s) OVER (PARTITION BY arm ORDER BY day
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cs
  FROM dg),
wide AS (
  SELECT a.day, a.cn AS na, a.cs AS sa, b.cn AS nb, b.cs AS sb
  FROM (SELECT * FROM cum WHERE arm = 0) a
  JOIN (SELECT * FROM cum WHERE arm = 1) b USING (day)
  WHERE a.cn > 0 AND b.cn > 0),
idx AS (
  SELECT day, na, sa, nb, sb,
         ROW_NUMBER() OVER (ORDER BY day) AS t_idx,
         (SELECT COUNT(DISTINCT day) FROM e) AS T
  FROM wide)
SELECT day, na AS n_a, nb AS n_b,
       ROUND(((sa / 100.0) / na - (sb / 100.0) / nb)
             / sqrt(((v.Q / 10000.0 - v.N * ((v.S / 100.0) / v.N)
                      * ((v.S / 100.0) / v.N)) / (v.N - 1))
                    * (1.0 / na + 1.0 / nb)), 6) AS z,
       ROUND({_GSQ_C} / sqrt(t_idx / (T * 1.0)), 6) AS boundary,
       ABS(((sa / 100.0) / na - (sb / 100.0) / nb)
           / sqrt(((v.Q / 10000.0 - v.N * ((v.S / 100.0) / v.N)
                    * ((v.S / 100.0) / v.N)) / (v.N - 1))
                  * (1.0 / na + 1.0 / nb)))
         > {_GSQ_C} / sqrt(t_idx / (T * 1.0)) AS crossed
FROM idx, v ORDER BY day
"""


def ensure_scene_videos_parquet(sf_dir: str) -> str:
    """Materialize the scene-cut video corpus + synthesis-time truth sidecar
    (sources/media.py::build_scene_video_table)."""
    import os as _os

    from ..sources.media import build_scene_video_table

    n = max(40, min(4000, int(4000 * _sf_of(sf_dir))))
    _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "scene_cuts_truth.parquet"),
        lambda: build_scene_video_table(n)[1],
    )
    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "scene_videos.parquet"),
        lambda: build_scene_video_table(n)[0],
    )


def q_video_scene_cuts(sf_dir: str) -> pd.DataFrame:
    """Scene-cut detection through REAL container decode —
    ``stages/multimodal.py::SceneCutDetector`` actor pool over VID0
    payloads, integer frame-diff threshold rule; oracle = the truth sidecar
    computed at synthesis time from the source pixel arrays (a decode bug
    cannot cancel out)."""
    from ..stages.multimodal import SceneCutDetector

    path = ensure_scene_videos_parquet(sf_dir)
    ds = rd.read_parquet(path, columns=["media_id", "payload"])
    out = (
        ds.map_batches(SceneCutDetector, batch_size=32, concurrency=2,
                       batch_format="pyarrow")
        .to_pandas()
        .sort_values(["media_id", "cut_index"], ignore_index=True)
    )
    return _i64(out, ["cut_index"])


SQL_VIDEO_SCENE_CUTS = """
SELECT media_id, cut_index
FROM read_parquet('{AD}/scene_cuts_truth.parquet')
ORDER BY media_id, cut_index
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


def ensure_unigram_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``unigram_lm_segment``: per-source segmentation
    totals from an INDEPENDENT scalar derivation — its own counting loops
    and a recursive memoized Viterbi with an explicit tie comparison —
    against the engine's iterative DP over broadcast integer costs."""
    import math as _math
    import os as _os
    from collections import Counter, defaultdict
    from functools import lru_cache

    from ..functions.unigram import TOP_NGRAMS

    def build() -> pa.Table:
        t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text", "source"])
        occ: Counter = Counter()
        per_source_words: dict[str, list[str]] = defaultdict(list)
        for txt, src in zip(t["text"].to_pylist(), t["source"].to_pylist()):
            for w in (txt or "").split():
                per_source_words[src].append(w)
                for L in (1, 2, 3):
                    for i in range(len(w) - L + 1):
                        occ[w[i : i + L]] += 1
        vocab = {p: c for p, c in occ.items() if len(p) == 1}
        for L in (2, 3):
            pool = sorted(
                ((p, c) for p, c in occ.items() if len(p) == L),
                key=lambda x: (-x[1], x[0]),
            )[:TOP_NGRAMS]
            vocab.update(dict(pool))
        total = sum(vocab.values())
        cost = {p: int(round(-_math.log(c / total) * 1_000_000))
                for p, c in vocab.items()}

        @lru_cache(maxsize=None)
        def seg(word: str) -> tuple[int, int]:
            # returns (cost, n_pieces); tie prefers the LONGER final piece
            if not word:
                return (0, 0)
            best = None
            for L in (1, 2, 3):  # ascending: later (longer) ties overwrite
                if L > len(word) or word[len(word) - L:] not in cost:
                    continue
                pc_, pn = seg(word[: len(word) - L])
                cand = (pc_ + cost[word[len(word) - L:]], pn + 1)
                if best is None or cand <= best:
                    best = cand
            return best

        rows = []
        for src in sorted(per_source_words):
            nw = np_ = nc = 0
            for w in per_source_words[src]:
                c, p = seg(w)
                nw += 1
                np_ += p
                nc += c
            rows.append((src, nw, np_, nc))
        return pa.table(
            {"source": pa.array([r[0] for r in rows]),
             "n_words": pa.array([r[1] for r in rows], pa.int64()),
             "n_pieces": pa.array([r[2] for r in rows], pa.int64()),
             "nll_unats": pa.array([r[3] for r in rows], pa.int64())}
        )

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "unigram_ref.parquet"), build
    )


def q_unigram_lm_segment(sf_dir: str) -> pd.DataFrame:
    """Unigram-LM (SentencePiece-style) Viterbi subword segmentation —
    ``functions/unigram.py``: vocabulary from one substring-count exchange,
    broadcast integer µnat costs, per-batch memoized DP; per-source totals.
    Oracle = independent recursive scalar implementation (artifact)."""
    from ..functions.unigram import unigram_segment_stats

    ensure_unigram_parquet(sf_dir)
    ds = _t(sf_dir, "documents", ["text", "source"])
    out = unigram_segment_stats(ds)
    return _i64(out, ["n_words", "n_pieces", "nll_unats"])


SQL_UNIGRAM_LM_SEGMENT = """
SELECT source, n_words, n_pieces, nll_unats
FROM read_parquet('{AD}/unigram_ref.parquet') ORDER BY source
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


_MARGIN_K = 4


def q_margin_knn_bitext(sf_dir: str) -> pd.DataFrame:
    """Margin-based cross-set pair mining over embeddings (label 0 vs
    label 1) — ``functions/sim.py::margin_knn_pairs``: ratio-margin
    scoring with integer µcos k-NN sums, mutual-best pairs only."""
    from ..functions.sim import margin_knn_pairs

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    return margin_knn_pairs(ds, 0, 1, k=_MARGIN_K)


SQL_MARGIN_KNN_BITEXT = f"""
WITH A AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE label = 0),
B AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE label = 1),
c AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
         CAST(ROUND(list_cosine_similarity(a.e, b.e) * 1000000) AS BIGINT) AS ci
  FROM A a CROSS JOIN B b),
ka AS (
  SELECT ia, CAST(SUM(ci) AS BIGINT) AS sa
  FROM (SELECT ia, ci, ROW_NUMBER() OVER (PARTITION BY ia ORDER BY ci DESC, ib) AS rn
        FROM c)
  WHERE rn <= {_MARGIN_K} GROUP BY ia),
kb AS (
  SELECT ib, CAST(SUM(ci) AS BIGINT) AS sb
  FROM (SELECT ib, ci, ROW_NUMBER() OVER (PARTITION BY ib ORDER BY ci DESC, ia) AS rn
        FROM c)
  WHERE rn <= {_MARGIN_K} GROUP BY ib),
m AS (
  SELECT c.ia, c.ib, c.ci / ((ka.sa + kb.sb) / (2.0 * {_MARGIN_K})) AS margin
  FROM c JOIN ka USING (ia) JOIN kb USING (ib)),
ba AS (SELECT ia, ib, margin,
              ROW_NUMBER() OVER (PARTITION BY ia ORDER BY margin DESC, ib) AS r
       FROM m),
bb AS (SELECT ia, ib,
              ROW_NUMBER() OVER (PARTITION BY ib ORDER BY margin DESC, ia) AS r
       FROM m)
SELECT ba.ia AS vec_a, ba.ib AS vec_b, ROUND(ba.margin, 6) AS margin
FROM ba JOIN bb ON bb.ia = ba.ia AND bb.ib = ba.ib AND ba.r = 1 AND bb.r = 1
ORDER BY vec_a
"""


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

    from ..functions.search import TOKEN_SPLIT

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
    SQL.  Nodes of degree < 2 are excluded (coefficient undefined)."""
    from ..functions.graph import per_node_triangles
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        m = df.merge(df, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return m[["l_partkey_x", "l_partkey_y"]].drop_duplicates().rename(
            columns={"l_partkey_x": "u", "l_partkey_y": "v"})

    pairs = bucketed_group_reduce(ds, ["l_orderkey"], per_bucket)
    edges = grouped_sums(pairs, ["u", "v"], {})
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
    from ..functions.grams import ngram_jaccard_pairs

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


# ---------------------------------------------------------------------------
# Session-4 wave 8: CDC storage dedup, mixture ESS, PSI drift, ECE
# calibration, CUPED variance reduction
# ---------------------------------------------------------------------------


def ensure_cdc_chunks_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``cdc_chunk_dedup``: every chunk's (source, hash,
    nbytes) from the INDEPENDENT scalar chunker (python-int window sums and
    polynomial hashes, ``cdc.py::chunk_text_scalar``) — the SQL oracle does
    all aggregation itself."""
    import os as _os

    def build() -> pa.Table:
        from ..functions.cdc import chunk_text_scalar

        t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text", "source"])
        srcs, hs, ls = [], [], []
        for s, txt in zip(t["source"].to_pylist(), t["text"].to_pylist()):
            for h, ln in chunk_text_scalar(txt or ""):
                srcs.append(s)
                hs.append(h - (1 << 64) if h >= (1 << 63) else h)  # int64 view
                ls.append(ln)
        return pa.table({
            "source": pa.array(srcs),
            "h": pa.array(hs, pa.int64()),
            "nbytes": pa.array(ls, pa.int64())})

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "cdc_chunks_ref.parquet"), build)


def q_cdc_chunk_dedup(sf_dir: str) -> pd.DataFrame:
    """Content-defined-chunking storage dedup audit per source: chunk every
    document with the Gear-boundary CDC kernel (``functions/cdc.py`` —
    vectorized k-tap rolling hash over the Arrow flat buffer), then count
    total vs distinct chunks and bytes.  Chunk identity is 64-bit hash
    equality (same contract as the gram family).  Distributed shape:
    per-batch (source, h, nbytes) combiner-distinct rows → one hash
    exchange for the distinct count; totals ride scalar partials.  Oracle:
    aggregation in SQL over the independent scalar chunker's artifact."""
    from ..functions.cdc import chunk_column
    from ..functions.relational import bucketed_group_reduce

    ensure_cdc_chunks_parquet(sf_dir)
    docs = _t(sf_dir, "documents", ["text", "source"])

    # one chunking pass emits (source, h, nbytes) rows (~1/64 of corpus
    # bytes); totals are re-derived from them by a cheap combiner
    rows = docs.map_batches(
        lambda t: (lambda d, h, ln: pa.table({
            "source": pa.array(t["source"].to_numpy(zero_copy_only=False)[d]),
            "h": pa.array(h.view(np.int64)),
            "nbytes": pa.array(ln)}))(*chunk_column(t["text"])),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    tot = (
        rows.map_batches(
            lambda t: pa.Table.from_pandas(
                pd.DataFrame({
                    "source": t["source"].to_numpy(zero_copy_only=False),
                    "nbytes": t["nbytes"].to_numpy(zero_copy_only=False)})
                .groupby("source", as_index=False)
                .agg(n_chunks=("nbytes", "size"), bytes_total=("nbytes", "sum")),
                preserve_index=False),
            batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas().groupby("source", as_index=False).sum()
    )

    def distinct_part(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["source", "h"])

    uniq = (
        bucketed_group_reduce(rows, ["h"], distinct_part, num_buckets=16)
        .to_pandas().drop_duplicates(["source", "h"])
        .groupby("source", as_index=False)
        .agg(n_distinct=("h", "size"), bytes_unique=("nbytes", "sum"))
    )
    out = tot.merge(uniq, on="source")
    out["dup_ratio"] = [
        _rd(1 - nd * 1.0 / nc, 6)
        for nd, nc in zip(out["n_distinct"], out["n_chunks"])]
    out = out[["source", "n_chunks", "n_distinct", "bytes_total",
               "bytes_unique", "dup_ratio"]].sort_values("source", ignore_index=True)
    return _i64(out, ["n_chunks", "n_distinct", "bytes_total", "bytes_unique"])


SQL_CDC_CHUNK_DEDUP = """
WITH c AS (SELECT * FROM read_parquet('{AD}/cdc_chunks_ref.parquet')),
d AS (
  SELECT source, COUNT(*) AS n_chunks, CAST(SUM(nbytes) AS BIGINT) AS bytes_total
  FROM c GROUP BY 1),
u AS (
  SELECT source, COUNT(*) AS n_distinct, CAST(SUM(nbytes) AS BIGINT) AS bytes_unique
  FROM (SELECT DISTINCT source, h, nbytes FROM c) GROUP BY 1)
SELECT d.source, d.n_chunks, u.n_distinct, d.bytes_total, u.bytes_unique,
       ROUND(1 - u.n_distinct * 1.0 / d.n_chunks, 6) AS dup_ratio
FROM d JOIN u USING (source) ORDER BY source
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


def q_mixture_ess_audit(sf_dir: str) -> pd.DataFrame:
    """Effective-sample-size audit of a length-weighted mixture: per source,
    ESS = (Σw)²/Σw² with w = n_chars (Kish 1965; the quantity that says how
    much of a weighted corpus actually contributes).  Integer sums only,
    the two float expressions mirrored in SQL.  One combiner map, 3 scalar
    partials per (batch, source)."""
    docs = _t(sf_dir, "documents", ["source", "n_chars"])

    def part(t: pa.Table) -> pd.DataFrame:
        w = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"source": t["source"].to_numpy(zero_copy_only=False),
                           "w": w, "w2": w * w})
        return df.groupby("source", as_index=False).agg(
            n_docs=("w", "size"), sum_w=("w", "sum"), sum_w2=("w2", "sum"))

    p = (
        docs.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas().groupby("source", as_index=False).sum()
    )
    p["ess"] = [_rd(sw * 1.0 * sw / sw2, 6)
                for sw, sw2 in zip(p["sum_w"], p["sum_w2"])]
    p["ess_ratio"] = [_rd(sw * 1.0 * sw / sw2 / n, 6)
                      for sw, sw2, n in zip(p["sum_w"], p["sum_w2"], p["n_docs"])]
    out = p.sort_values("source", ignore_index=True)
    return _i64(out, ["n_docs", "sum_w", "sum_w2"])


SQL_MIXTURE_ESS_AUDIT = """
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_w,
       CAST(SUM(n_chars * n_chars) AS BIGINT) AS sum_w2,
       ROUND(SUM(n_chars) * 1.0 * SUM(n_chars) / SUM(n_chars * n_chars), 6)
         AS ess,
       ROUND(SUM(n_chars) * 1.0 * SUM(n_chars) / SUM(n_chars * n_chars)
             / COUNT(*), 6) AS ess_ratio
FROM documents GROUP BY source ORDER BY source
"""


_PSI_BIN_CENTS = 500  # fixed $5 value bins, capped at bin 9


def q_psi_drift(sf_dir: str) -> pd.DataFrame:
    """Population-stability-index drift audit per event type: the event
    VALUE distribution of the first time-half vs the second (split at the
    integer midpoint of the observed µs range), over 10 fixed $5 bins with
    +1 Laplace smoothing.  PSI = Σ_b (p2−p1)·ln(p2/p1) — all counts are
    integers; the float formula is mirrored term-for-term.  Two cheap
    exchanges: the global (min,max) scalar and the (type, half, bin) count
    partials."""
    import math as _math

    ds = _t(sf_dir, "events", ["ts", "event_type", "value"])

    def minmax(t: pa.Table) -> pd.DataFrame:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pd.DataFrame({"lo": [int(ts.min())], "hi": [int(ts.max())]})

    mm = ds.map_batches(minmax, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    mid = (int(mm["lo"].min()) + int(mm["hi"].max())) // 2

    def part(t: pa.Table, *, mid=mid) -> pd.DataFrame:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = _rd(t["value"].to_numpy(zero_copy_only=False) * 100, 0).astype(np.int64)
        b = np.minimum(cents // _PSI_BIN_CENTS, 9)
        half = np.where(ts < mid, 1, 2)
        df = pd.DataFrame({
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            "half": half, "b": b})
        return df.groupby(["event_type", "half", "b"], as_index=False).size()

    cnt = (
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas().groupby(["event_type", "half", "b"], as_index=False)["size"].sum()
    )
    rows = []
    for et, sub in cnt.groupby("event_type"):
        c1 = np.zeros(10, np.int64)
        c2 = np.zeros(10, np.int64)
        for _, r in sub.iterrows():
            (c1 if r["half"] == 1 else c2)[int(r["b"])] = int(r["size"])
        n1, n2 = int(c1.sum()), int(c2.sum())
        psi = 0.0
        for bb in range(10):
            p1 = (int(c1[bb]) + 1) / (n1 + 10)
            p2 = (int(c2[bb]) + 1) / (n2 + 10)
            psi += (p2 - p1) * _math.log(p2 / p1)
        rows.append((et, n1, n2, _rd(psi, 6)))
    out = pd.DataFrame(rows, columns=["event_type", "n_first", "n_second", "psi"]
                       ).sort_values("event_type", ignore_index=True)
    return _i64(out, ["n_first", "n_second"])


SQL_PSI_DRIFT = """
WITH mm AS (
  SELECT (CAST(epoch_us(MIN(ts)) AS BIGINT)
          + CAST(epoch_us(MAX(ts)) AS BIGINT)) // 2 AS mid
  FROM events),
e AS (
  SELECT event_type,
         CASE WHEN epoch_us(ts) < mm.mid THEN 1 ELSE 2 END AS half,
         LEAST(CAST(ROUND(value * 100) AS BIGINT) // {BIN}, 9) AS b
  FROM events CROSS JOIN mm),
grid AS (
  SELECT t.event_type, h.h AS half, g.i AS b
  FROM (SELECT DISTINCT event_type FROM e) t,
       (SELECT UNNEST([1, 2]) AS h) h, generate_series(0, 9) g(i)),
cnt AS (
  SELECT grid.event_type, grid.half, grid.b,
         COALESCE(c.n, 0) AS n
  FROM grid LEFT JOIN (
    SELECT event_type, half, b, COUNT(*) AS n FROM e GROUP BY 1, 2, 3) c
    ON c.event_type = grid.event_type AND c.half = grid.half AND c.b = grid.b),
tot AS (
  SELECT event_type, half, CAST(SUM(n) AS BIGINT) AS nt
  FROM cnt GROUP BY 1, 2),
j AS (
  SELECT a.event_type, a.b,
         (a.n + 1) * 1.0 / (t1.nt + 10) AS p1,
         (b2.n + 1) * 1.0 / (t2.nt + 10) AS p2,
         t1.nt AS n1, t2.nt AS n2
  FROM cnt a
  JOIN cnt b2 ON b2.event_type = a.event_type AND b2.b = a.b AND b2.half = 2
  JOIN tot t1 ON t1.event_type = a.event_type AND t1.half = 1
  JOIN tot t2 ON t2.event_type = a.event_type AND t2.half = 2
  WHERE a.half = 1)
SELECT event_type, MAX(n1) AS n_first, MAX(n2) AS n_second,
       ROUND(SUM((p2 - p1) * ln(p2 / p1)), 6) AS psi
FROM j GROUP BY event_type ORDER BY event_type
""".replace("{BIN}", str(_PSI_BIN_CENTS))


def q_ece_calibration(sf_dir: str) -> pd.DataFrame:
    """Expected-calibration-error audit with a leakage-free split: each
    user's CONFIDENCE is their purchase rate over even event_ids, the
    OUTCOME their rate over odd event_ids; users are binned by µ-quantized
    confidence (floor((1e6·p_even)//n_even) // 100000, clamped to 9).  Per
    bin: n_users, mean confidence and accuracy in µ-units (integer sums,
    one mirrored division), and the calibration gap.  Distributed shape:
    per-user 4-counter partials inside the bucketed exchange."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "event_id", "event_type"])

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        even = (df["event_id"].to_numpy() % 2) == 0
        pur = (df["event_type"] == "purchase").to_numpy()
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(),
            "ne": even.astype(np.int64),
            "pe": (even & pur).astype(np.int64),
            "no": (~even).astype(np.int64),
            "po": (~even & pur).astype(np.int64),
        }).groupby("user_id", as_index=False).sum()

    u = bucketed_group_reduce(ds, ["user_id"], per_user, num_buckets=16).to_pandas()
    u = u.groupby("user_id", as_index=False).sum()
    u = u[(u["ne"] > 0) & (u["no"] > 0)]
    conf_mu = (1_000_000 * u["pe"].to_numpy(np.int64)) // u["ne"].to_numpy(np.int64)
    acc_mu = (1_000_000 * u["po"].to_numpy(np.int64)) // u["no"].to_numpy(np.int64)
    bins = np.minimum(conf_mu // 100_000, 9)
    df = pd.DataFrame({"bin": bins, "conf_mu": conf_mu, "acc_mu": acc_mu})
    g = df.groupby("bin", as_index=False).agg(
        n_users=("conf_mu", "size"), sum_conf=("conf_mu", "sum"),
        sum_acc=("acc_mu", "sum"))
    g["avg_conf"] = [_rd(sc * 1.0 / n, 6) for sc, n in zip(g["sum_conf"], g["n_users"])]
    g["avg_acc"] = [_rd(sa * 1.0 / n, 6) for sa, n in zip(g["sum_acc"], g["n_users"])]
    g["gap"] = [_rd(abs(sc * 1.0 / n - sa * 1.0 / n), 6)
                for sc, sa, n in zip(g["sum_conf"], g["sum_acc"], g["n_users"])]
    out = g[["bin", "n_users", "avg_conf", "avg_acc", "gap"]].sort_values(
        "bin", ignore_index=True)
    return _i64(out, ["bin", "n_users"])


SQL_ECE_CALIBRATION = """
WITH u AS (
  SELECT user_id,
         SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS ne,
         SUM(CASE WHEN event_id % 2 = 0 AND event_type = 'purchase'
                  THEN 1 ELSE 0 END) AS pe,
         SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS no,
         SUM(CASE WHEN event_id % 2 = 1 AND event_type = 'purchase'
                  THEN 1 ELSE 0 END) AS po
  FROM events GROUP BY user_id),
q AS (
  SELECT (1000000 * pe) // ne AS conf_mu, (1000000 * po) // no AS acc_mu
  FROM u WHERE ne > 0 AND no > 0),
b AS (
  SELECT LEAST(conf_mu // 100000, 9) AS bin, conf_mu, acc_mu FROM q)
SELECT CAST(bin AS BIGINT) AS bin, COUNT(*) AS n_users,
       ROUND(SUM(conf_mu) * 1.0 / COUNT(*), 6) AS avg_conf,
       ROUND(SUM(acc_mu) * 1.0 / COUNT(*), 6) AS avg_acc,
       ROUND(ABS(SUM(conf_mu) * 1.0 / COUNT(*)
                 - SUM(acc_mu) * 1.0 / COUNT(*)), 6) AS gap
FROM b GROUP BY bin ORDER BY bin
"""


def q_cuped_adjustment(sf_dir: str) -> pd.DataFrame:
    """CUPED variance-reduced A/B readout (Deng et al. WSDM'13): users are
    arms by parity, the pre-period metric is each user's value-cents in the
    first time-half, post in the second; θ = cov(pre,post)/var(pre) from
    raw-moment identities (N·Σxy − Σx·Σy over N·Σx² − (Σx)²) so every sum
    is integer; adjusted mean = mean_post − θ·(mean_pre_arm − mean_pre).
    The float expressions are mirrored token-for-token in SQL."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts", "value"])

    def minmax(t: pa.Table) -> pd.DataFrame:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pd.DataFrame({"lo": [int(ts.min())], "hi": [int(ts.max())]})

    mm = ds.map_batches(minmax, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    mid = (int(mm["lo"].min()) + int(mm["hi"].max())) // 2

    def per_user(df: pd.DataFrame, *, mid=mid) -> pd.DataFrame:
        ts = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        cents = _rd(df["value"].to_numpy(np.float64) * 100, 0).astype(np.int64)
        pre = np.where(ts < mid, cents, 0)
        post = np.where(ts >= mid, cents, 0)
        g = pd.DataFrame({"user_id": df["user_id"].to_numpy(),
                          "pre": pre, "post": post}).groupby(
            "user_id", as_index=False).sum()
        return g

    u = (
        bucketed_group_reduce(ds, ["user_id"], per_user, num_buckets=16)
        .to_pandas().groupby("user_id", as_index=False).sum()
    )
    n = len(u)
    x = u["pre"].to_numpy(np.int64)
    y = u["post"].to_numpy(np.int64)
    cov_num = n * int((x * y).sum()) - int(x.sum()) * int(y.sum())
    var_num = n * int((x * x).sum()) - int(x.sum()) ** 2
    theta = cov_num * 1.0 / var_num
    mean_pre_all = int(x.sum()) * 1.0 / n
    arm = (u["user_id"].to_numpy(np.int64) % 2).astype(np.int64)
    rows = []
    for a in (0, 1):
        m = arm == a
        na = int(m.sum())
        mp = int(y[m].sum()) * 1.0 / na
        mpre = int(x[m].sum()) * 1.0 / na
        rows.append((a, na, _rd(mp, 6),
                     _rd(mp - cov_num * 1.0 / var_num * (mpre - mean_pre_all), 6),
                     _rd(theta, 6)))
    out = pd.DataFrame(rows, columns=["arm", "n_users", "mean_post",
                                      "adjusted_mean", "theta"])
    return _i64(out, ["arm", "n_users"])


SQL_CUPED_ADJUSTMENT = """
WITH mm AS (
  SELECT (CAST(epoch_us(MIN(ts)) AS BIGINT)
          + CAST(epoch_us(MAX(ts)) AS BIGINT)) // 2 AS mid
  FROM events),
u AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN epoch_us(ts) < mm.mid
                  THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS pre,
         CAST(SUM(CASE WHEN epoch_us(ts) >= mm.mid
                  THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS post
  FROM events CROSS JOIN mm GROUP BY user_id),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(pre) AS BIGINT) AS sx, CAST(SUM(post) AS BIGINT) AS sy,
         CAST(SUM(pre * post) AS BIGINT) AS sxy,
         CAST(SUM(pre * pre) AS BIGINT) AS sxx
  FROM u),
arm AS (
  SELECT user_id % 2 AS arm, COUNT(*) AS na,
         CAST(SUM(pre) AS BIGINT) AS sxa, CAST(SUM(post) AS BIGINT) AS sya
  FROM u GROUP BY 1)
SELECT CAST(a.arm AS BIGINT) AS arm, CAST(a.na AS BIGINT) AS n_users,
       ROUND(a.sya * 1.0 / a.na, 6) AS mean_post,
       ROUND(a.sya * 1.0 / a.na
             - (s.n * s.sxy - s.sx * s.sy) * 1.0 / (s.n * s.sxx - s.sx * s.sx)
               * (a.sxa * 1.0 / a.na - s.sx * 1.0 / s.n), 6) AS adjusted_mean,
       ROUND((s.n * s.sxy - s.sx * s.sy) * 1.0
             / (s.n * s.sxx - s.sx * s.sx), 6) AS theta
FROM arm a CROSS JOIN s ORDER BY arm
"""


# ---------------------------------------------------------------------------
# Session-5 wave 9: sketch audit, rank statistics, OLAP cube, masking layout,
# decayed counts, HITS, consistent-hash rebalance
# ---------------------------------------------------------------------------

_CMS_W = 256
_CMS_HASHES = [(1103515245, 12345), (214013, 2531011),
               (69069, 362437), (1664525, 1013904223)]
_CMS_P = 2147483647


def q_count_min_audit(sf_dir: str) -> pd.DataFrame:
    """Count-Min sketch overcount audit: a d=4 × w=256 CMS over the event
    user stream (universal hashes ((u·a+b) mod p) mod w, p=2^31−1) vs the
    exact per-user counts for the top-15 users.  The sketch is the textbook
    mergeable partial: every batch emits its own d×w cell counts and the
    exchange moves ≤1024 rows per block regardless of input size — the
    pattern that lets a 100-TB stream keep one KB-sized frequency summary.
    Estimates are deterministic (no randomness at query time), so the audit
    is fully SQL-oracled."""
    ds = _t(sf_dir, "events", ["user_id"])

    def part(t: pa.Table) -> pd.DataFrame:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64) % _CMS_P
        flat = np.concatenate([
            np.int64(j * _CMS_W) + ((u * a + b) % _CMS_P) % _CMS_W
            for j, (a, b) in enumerate(_CMS_HASHES)
        ])
        cnt = np.bincount(flat, minlength=4 * _CMS_W)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"cell": nz.astype(np.int64), "n": cnt[nz].astype(np.int64)})

    parts = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    table = np.zeros(4 * _CMS_W, np.int64)
    agg = parts.groupby("cell")["n"].sum()
    table[agg.index.to_numpy(np.int64)] = agg.to_numpy(np.int64)

    exact = grouped_sums(ds, ["user_id"], {}, "exact_n")
    top = topk(exact, ["exact_n", "user_id"], [True, False], 15).to_pandas()
    u = top["user_id"].to_numpy(np.int64) % _CMS_P
    est = np.min(np.stack([
        table[j * _CMS_W + ((u * a + b) % _CMS_P) % _CMS_W]
        for j, (a, b) in enumerate(_CMS_HASHES)
    ]), axis=0)
    out = pd.DataFrame({
        "user_id": top["user_id"].to_numpy(np.int64),
        "exact_n": top["exact_n"].to_numpy(np.int64),
        "cms_est": est.astype(np.int64),
    })
    out["overcount"] = out["cms_est"] - out["exact_n"]
    return _i64(out, ["user_id", "exact_n", "cms_est", "overcount"])


SQL_COUNT_MIN_AUDIT = """
WITH hp(j, a, b) AS (VALUES (0, 1103515245, 12345), (1, 214013, 2531011),
                            (2, 69069, 362437), (3, 1664525, 1013904223)),
cells AS (
  SELECT hp.j, (((user_id % 2147483647) * hp.a + hp.b) % 2147483647) % 256 AS cell,
         COUNT(*) AS n
  FROM events CROSS JOIN hp GROUP BY 1, 2),
ex AS (
  SELECT user_id, COUNT(*) AS exact_n FROM events GROUP BY 1
  ORDER BY exact_n DESC, user_id LIMIT 15)
SELECT ex.user_id, MAX(ex.exact_n) AS exact_n,
       MIN(c.n) AS cms_est, MIN(c.n) - MAX(ex.exact_n) AS overcount
FROM ex CROSS JOIN hp
JOIN cells c ON c.j = hp.j
  AND c.cell = (((ex.user_id % 2147483647) * hp.a + hp.b) % 2147483647) % 256
GROUP BY ex.user_id ORDER BY exact_n DESC, ex.user_id
"""


def q_spearman_qty_price(sf_dir: str) -> pd.DataFrame:
    """Spearman rank correlation between lineitem quantity and price with
    exact average-rank tie handling: per-column value histograms (one
    combiner exchange each, output bounded by the value grid) build the
    2×avg-rank integer maps, which broadcast into one scan that accumulates
    the five rank sufficient statistics as EXACT big integers (chunked
    int64 partials folded into Python ints so no scale overflows); the
    single float division mirrors the SQL formula term for term."""
    import math as _math

    import ray as _ray

    ds = _t(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])

    def vals(t: pa.Table) -> pa.Table:
        q = pc.cast(t["l_quantity"], pa.int64())
        p = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], pa.scalar(100.0))),
                    pa.int64())
        return pa.table({"q": q, "p": p})

    vd = ds.map_batches(vals, batch_format="pyarrow", zero_copy_batch=True
                        ).materialize()  # 3 consumers, 16-byte rows
    qh = grouped_sums(vd.select_columns(["q"]), ["q"], {}, "n").to_pandas()
    ph = grouped_sums(vd.select_columns(["p"]), ["p"], {}, "n").to_pandas()

    def rank2x(h: pd.DataFrame, col: str) -> tuple[np.ndarray, np.ndarray]:
        h = h.sort_values(col, ignore_index=True)
        cnt = h["n"].to_numpy(np.int64)
        lt = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        return h[col].to_numpy(np.int64), 2 * lt + cnt + 1

    qv, qr = rank2x(qh, "q")
    pv, pr = rank2x(ph, "p")
    maps = _ray.put((qv, qr, pv, pr))

    def stats(t: pa.Table) -> pd.DataFrame:
        qv_, qr_, pv_, pr_ = _ray.get(maps)
        ra = qr_[np.searchsorted(qv_, t["q"].to_numpy(zero_copy_only=False))]
        rb = pr_[np.searchsorted(pv_, t["p"].to_numpy(zero_copy_only=False))]
        sx = sy = sxx = syy = sxy = 0
        for lo in range(0, len(ra), 4096):  # chunked: int64-safe partials
            a, b = ra[lo:lo + 4096], rb[lo:lo + 4096]
            sx += int(a.sum()); sy += int(b.sum())
            sxx += int((a * a).sum()); syy += int((b * b).sum())
            sxy += int((a * b).sum())
        return pd.DataFrame({"n": [len(ra)], "sx": [str(sx)], "sy": [str(sy)],
                             "sxx": [str(sxx)], "syy": [str(syy)], "sxy": [str(sxy)]})

    parts = vd.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    n = int(parts["n"].sum())
    sx = int(sum(int(v) for v in parts["sx"]))
    sy = int(sum(int(v) for v in parts["sy"]))
    sxx = sum(int(v) for v in parts["sxx"])
    syy = sum(int(v) for v in parts["syy"])
    sxy = sum(int(v) for v in parts["sxy"])
    num = float(n * sxy - sx * sy)
    den = _math.sqrt(float(n * sxx - sx * sx)) * _math.sqrt(float(n * syy - sy * sy))
    return pd.DataFrame({"n_rows": pd.array([n], dtype="int64"),
                         "rho": [_rd(num / den, 9)]})


SQL_SPEARMAN_QTY_PRICE = """
WITH r AS (
  SELECT CAST(l_quantity AS BIGINT) AS q,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS p
  FROM lineitem),
rx AS (
  SELECT 2 * RANK() OVER (ORDER BY q) + COUNT(*) OVER (PARTITION BY q) - 1 AS ra,
         2 * RANK() OVER (ORDER BY p) + COUNT(*) OVER (PARTITION BY p) - 1 AS rb
  FROM r),
s AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(CAST(ra AS HUGEINT)) AS sx, SUM(CAST(rb AS HUGEINT)) AS sy,
         SUM(CAST(ra AS HUGEINT) * ra) AS sxx, SUM(CAST(rb AS HUGEINT) * rb) AS syy,
         SUM(CAST(ra AS HUGEINT) * rb) AS sxy
  FROM rx)
SELECT CAST(n AS BIGINT) AS n_rows,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                * SQRT(CAST(n * syy - sy * sy AS DOUBLE))), 9) AS rho
FROM s
"""


def q_kendall_tau_qty_disc(sf_dir: str) -> pd.DataFrame:
    """Kendall tau-b between lineitem quantity (1..50) and discount cents
    (0..10) computed EXACTLY from the bounded 2-D value-cell histogram: one
    combiner exchange moves ≤561 cells, then concordant/discordant pair
    masses come from vectorized prefix-sum grids driver-side (numpy int64 on
    cell counts; pair totals folded as Python ints).  The O(n²) pair space
    never materializes — the 100-TB shape for rank correlation over discrete
    grids."""
    import math as _math

    ds = _t(sf_dir, "lineitem", ["l_quantity", "l_discount"])

    def vals(t: pa.Table) -> pa.Table:
        q = pc.cast(t["l_quantity"], pa.int64())
        d = pc.cast(pc.round(pc.multiply(t["l_discount"], pa.scalar(100.0))),
                    pa.int64())
        return pa.table({"q": q, "d": d})

    cells = grouped_sums(
        ds.map_batches(vals, batch_format="pyarrow", zero_copy_batch=True),
        ["q", "d"], {}, "n", reduce="driver",
    ).to_pandas()
    qi = cells["q"].to_numpy(np.int64)
    di = cells["d"].to_numpy(np.int64)
    nn = cells["n"].to_numpy(np.int64)
    qu = np.unique(qi); du = np.unique(di)
    grid = np.zeros((len(qu), len(du)), np.int64)
    grid[np.searchsorted(qu, qi), np.searchsorted(du, di)] = nn
    # lt_any[i,j] = mass with q'<q_i at exactly d_j; prefix over d gives
    # lt_lt (strictly-less both dims) and lt_gt (q'<q, d'>d)
    rowcum = grid.cumsum(axis=0)
    lt_any = np.zeros_like(grid)
    lt_any[1:, :] = rowcum[:-1, :]
    le_cols = lt_any.cumsum(axis=1)          # mass with q'<q, d'<=d
    lt_lt = np.zeros_like(grid)
    lt_lt[:, 1:] = le_cols[:, :-1]           # mass with q'<q, d'<d
    lt_gt = le_cols[:, -1:] - le_cols        # mass with q'<q, d'>d
    conc = sum(int(v) for v in (grid * lt_lt).ravel())
    disc = sum(int(v) for v in (grid * lt_gt).ravel())
    n = int(nn.sum())
    n0 = n * (n - 1) // 2
    tq = grid.sum(axis=1)
    td = grid.sum(axis=0)
    n1 = sum(int(t) * (int(t) - 1) // 2 for t in tq)
    n2 = sum(int(t) * (int(t) - 1) // 2 for t in td)
    tau = float(conc - disc) / (_math.sqrt(float(n0 - n1)) * _math.sqrt(float(n0 - n2)))
    return pd.DataFrame({
        "n_rows": pd.array([n], "int64"),
        "concordant": pd.array([conc], "int64"),
        "discordant": pd.array([disc], "int64"),
        "tau_b": [_rd(tau, 9)],
    })


SQL_KENDALL_TAU_QTY_DISC = """
WITH c AS (
  SELECT CAST(l_quantity AS BIGINT) AS q,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS d, COUNT(*) AS n
  FROM lineitem GROUP BY 1, 2),
pairs AS (
  SELECT COALESCE(SUM(CAST(a.n AS HUGEINT) * b.n)
                  FILTER (WHERE b.q < a.q AND b.d < a.d), 0) AS conc,
         COALESCE(SUM(CAST(a.n AS HUGEINT) * b.n)
                  FILTER (WHERE b.q < a.q AND b.d > a.d), 0) AS disc
  FROM c a JOIN c b ON b.q < a.q),
tot AS (
  SELECT CAST(SUM(n) AS HUGEINT) AS n,
         SUM(CAST(n AS HUGEINT) * (n - 1) / 2) AS npairs FROM c),
tx AS (SELECT SUM(CAST(s AS HUGEINT) * (s - 1) / 2) AS n1
       FROM (SELECT SUM(n) AS s FROM c GROUP BY q)),
ty AS (SELECT SUM(CAST(s AS HUGEINT) * (s - 1) / 2) AS n2
       FROM (SELECT SUM(n) AS s FROM c GROUP BY d))
SELECT CAST(tot.n AS BIGINT) AS n_rows,
       CAST(pairs.conc AS BIGINT) AS concordant,
       CAST(pairs.disc AS BIGINT) AS discordant,
       ROUND(CAST(pairs.conc - pairs.disc AS DOUBLE)
             / (SQRT(CAST(tot.n * (tot.n - 1) / 2 - tx.n1 AS DOUBLE))
                * SQRT(CAST(tot.n * (tot.n - 1) / 2 - ty.n2 AS DOUBLE))), 9) AS tau_b
FROM pairs, tot, tx, ty
"""


def q_cube_revenue(sf_dir: str) -> pd.DataFrame:
    """OLAP CUBE over (region, order year, priority): the Ray side computes
    ONLY the finest-grain cell aggregate (one combiner exchange over a grid
    bounded by 5 regions × years × 5 priorities — integer cents, never a
    float sum) and expands all 8 cube subsets driver-side from those ≤200
    cells with 'ALL' sentinels.  At 100 TB the cube costs exactly one
    pre-aggregated exchange, not 8 scans — the classic lattice-from-base
    rollup."""
    from ..functions.relational import auto_join

    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    n2r = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_regionkey"].to_pylist()))
    r2n = dict(zip(reg["r_regionkey"].to_pylist(), reg["r_name"].to_pylist()))
    nat_region = pa.table({
        "c_nationkey": pa.array(list(n2r.keys()), pa.int64()),
        "region": pa.array([r2n[v] for v in n2r.values()], pa.string()),
    })
    cust = broadcast_join(
        _t(sf_dir, "customer", ["c_custkey", "c_nationkey"]), nat_region, "c_nationkey"
    ).select_columns(["c_custkey", "region"])
    orders = _t(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_orderpriority",
                                   "o_totalprice"])
    joined = auto_join(orders, cust, on="o_custkey", right_on="c_custkey")

    def keyed(t: pa.Table) -> pa.Table:
        yr = pc.cast(pc.year(t["o_orderdate"]), pa.string())
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], pa.scalar(100.0))),
                        pa.int64())
        return pa.table({"region": t["region"], "o_year": yr,
                         "priority": t["o_orderpriority"], "cents": cents})

    base = grouped_sums(
        joined.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True),
        ["region", "o_year", "priority"], {"cents": "cents"}, "n_orders",
        reduce="driver",
    ).to_pandas()
    dims = ["region", "o_year", "priority"]
    outs = []
    for mask in range(8):
        g = base.copy()
        for i, dcol in enumerate(dims):
            if not (mask >> i) & 1:
                g[dcol] = "ALL"
        outs.append(g.groupby(dims, as_index=False)[["cents", "n_orders"]].sum())
    out = pd.concat(outs, ignore_index=True).drop_duplicates(dims)
    out["revenue"] = [float(int(c)) / 100.0 for c in out["cents"]]
    out = out.drop(columns=["cents"]).sort_values(dims, ignore_index=True)
    return _i64(out, ["n_orders"])


SQL_CUBE_REVENUE = """
WITH base AS (
  SELECT r_name AS region,
         CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year,
         o_orderpriority AS priority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey)
SELECT COALESCE(region, 'ALL') AS region, COALESCE(o_year, 'ALL') AS o_year,
       COALESCE(priority, 'ALL') AS priority, COUNT(*) AS n_orders,
       CAST(SUM(cents) AS DOUBLE) / 100.0 AS revenue
FROM base GROUP BY CUBE (region, o_year, priority)
ORDER BY 1, 2, 3
"""


def q_mlm_mask_stats(sf_dir: str) -> pd.DataFrame:
    """BERT-style MLM masking layout audit over the derived token corpus:
    each (sequence, position) draws a deterministic integer hash; 15% of
    positions mask, and masked positions split 80/10/10 into [MASK] /
    random / keep via the same hash.  Per-source counters plus the masked
    token-id checksum gate the layout bit-exactly.  One vectorized scan
    (offsets-only position math over the shared token buffer; the per-doc
    key is the sid's trailing 8 md5-hex chars decoded with a byte-LUT, no
    per-row Python), combiner partials, no exchange beyond the bounded
    per-source rows."""
    from ..functions.tokens import _flat_tokens

    ds = rd.read_parquet(ensure_derived_parquet(sf_dir),
                         columns=["doc_id", "tokens", "source"], override_num_blocks=8)

    hex_lut = np.zeros(256, np.int64)
    for i, ch in enumerate("0123456789abcdef"):
        hex_lut[ord(ch)] = i

    def part(t: pa.Table) -> pd.DataFrame:
        values, offsets = _flat_tokens(t)
        starts = (offsets - offsets[0]).astype(np.int64)
        lens = np.diff(starts)
        window = values[offsets[0]:offsets[-1]].astype(np.int64)
        # per-doc 32-bit key: trailing 8 hex chars of the sid, decoded
        # vectorized (reverse → fixed-width slice → packed byte matrix)
        rev8 = pc.utf8_slice_codeunits(
            pc.utf8_reverse(t["doc_id"]), 0, 8).combine_chunks()
        n_docs = len(rev8)
        raw = np.frombuffer(rev8.buffers()[2], np.uint8)[:8 * n_docs].reshape(
            n_docs, 8)
        digits = hex_lut[raw]
        sid = (digits << (4 * np.arange(8, dtype=np.int64))).sum(axis=1)
        sid_rep = np.repeat(sid, lens)
        pos = np.arange(len(window), dtype=np.int64) - np.repeat(starts[:-1], lens) + 1
        k = (sid_rep % 1000003) * 131 + pos
        h = (k * 2654435761) % _CMS_P
        mask = (h % 100) < 15
        r = h % 10
        src_rep = np.repeat(
            np.asarray(t["source"].to_pylist(), dtype=object), lens)
        df = pd.DataFrame({
            "source": src_rep,
            "n_tokens": np.ones(len(window), np.int64),
            "n_masked": mask.astype(np.int64),
            "n_mask_sym": (mask & (r < 8)).astype(np.int64),
            "n_rand": (mask & (r == 8)).astype(np.int64),
            "n_keep": (mask & (r == 9)).astype(np.int64),
            "masked_sum": np.where(mask, window, 0),
        })
        return df.groupby("source", as_index=False).sum()

    parts = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = parts.groupby("source", as_index=False).sum().sort_values(
        "source", ignore_index=True)
    return _i64(out, ["n_tokens", "n_masked", "n_mask_sym", "n_rand", "n_keep",
                      "masked_sum"])


SQL_MLM_MASK_STATS = f"""
WITH hexd(ch, v) AS (VALUES ('0',0),('1',1),('2',2),('3',3),('4',4),('5',5),
                            ('6',6),('7',7),('8',8),('9',9),('a',10),('b',11),
                            ('c',12),('d',13),('e',14),('f',15)),
base AS (SELECT doc_id, tokens, source
         FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')),
key AS (
  SELECT doc_id,
         SUM(hexd.v * (CAST(1 AS BIGINT) << (4 * (8 - g.i)))) AS sid32
  FROM base, generate_series(1, 8) g(i)
  JOIN hexd ON hexd.ch = substr(doc_id, length(doc_id) - 8 + g.i, 1)
  GROUP BY doc_id),
tok AS (
  SELECT b.source,
         ((k.sid32 % 1000003) * 131 + g.i) * 2654435761 % 2147483647 AS h,
         b.tokens[g.i] AS token
  FROM base b JOIN key k USING (doc_id),
       unnest(generate_series(1, len(b.tokens))) AS g(i))
SELECT source, COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN h % 100 < 15 THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
       CAST(SUM(CASE WHEN h % 100 < 15 AND h % 10 < 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_mask_sym,
       CAST(SUM(CASE WHEN h % 100 < 15 AND h % 10 = 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_rand,
       CAST(SUM(CASE WHEN h % 100 < 15 AND h % 10 = 9 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       CAST(SUM(CASE WHEN h % 100 < 15 THEN token ELSE 0 END) AS BIGINT) AS masked_sum
FROM tok GROUP BY source ORDER BY source
"""


def q_decayed_topk_users(sf_dir: str) -> pd.DataFrame:
    """Exponentially time-decayed heavy hitters with EXACT integer weights:
    event age is bucketed into weeks behind the corpus max timestamp and
    each event contributes 512 >> min(age_weeks, 9) — a dyadic decay whose
    per-user totals are plain int64 sums, so the freshness-weighted top-20
    is bit-deterministic (no float decay drift).  One scalar max exchange +
    one combiner exchange + distributed top-k."""
    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def mx(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({"m": [int(t["ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False).max())]})

    m = int(ds.map_batches(mx, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()["m"].max())

    def weigh(t: pa.Table, *, m=m) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = np.minimum((m - ts) // (7 * 86_400_000_000), 9).astype(np.int64)
        return pa.table({"user_id": t["user_id"],
                         "weight": pa.array(np.int64(512) >> w)})

    weighted = ds.map_batches(weigh, batch_format="pyarrow", zero_copy_batch=True)
    agg = grouped_sums(weighted, ["user_id"], {"decayed": "weight"}, "n_events")
    out = topk(agg, ["decayed", "user_id"], [True, False], 20).to_pandas()
    return _i64(out[["user_id", "decayed", "n_events"]],
                ["user_id", "decayed", "n_events"])


SQL_DECAYED_TOPK_USERS = """
WITH mx AS (SELECT MAX(epoch_us(ts)) AS m FROM events),
w AS (
  SELECT user_id,
         512 >> CAST(LEAST((mx.m - epoch_us(ts)) // 604800000000, 9) AS INTEGER) AS weight
  FROM events CROSS JOIN mx)
SELECT user_id, CAST(SUM(weight) AS BIGINT) AS decayed, COUNT(*) AS n_events
FROM w GROUP BY user_id ORDER BY decayed DESC, user_id LIMIT 20
"""


def q_hits_scores(sf_dir: str) -> pd.DataFrame:
    """HITS hubs/authorities over the bipartite customer↔part purchase graph
    (distinct edges from orders⋈lineitem), one full mutual-reinforcement
    iteration kept in EXACT integers (a₁ = part degree, h₁ = Σ a₁ over a
    customer's parts, a₂ = Σ h₁ over a part's customers — unnormalized
    scores are scale-free for ranking and dodge float-normalization drift).
    The edge set stays a distributed Dataset re-scanned per step; only the
    |V|-bounded score vectors broadcast (same contract as pagerank)."""
    import ray as _ray

    from ..functions.relational import auto_join

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    pairs = auto_join(li, orders, on="l_orderkey", right_on="o_orderkey")
    edges = grouped_sums(
        pairs.select_columns(["o_custkey", "l_partkey"]),
        ["o_custkey", "l_partkey"], {}, "dups",
    ).select_columns(["o_custkey", "l_partkey"]).materialize()

    a1 = grouped_sums(edges, ["l_partkey"], {}, "s").to_pandas()
    a1v = a1.sort_values("l_partkey")
    pk, ps = a1v["l_partkey"].to_numpy(np.int64), a1v["s"].to_numpy(np.int64)
    a1_ref = _ray.put((pk, ps))

    def h_step(t: pa.Table) -> pd.DataFrame:
        k, s = _ray.get(a1_ref)
        vals = s[np.searchsorted(k, t["l_partkey"].to_numpy(zero_copy_only=False))]
        return pd.DataFrame({"o_custkey": t["o_custkey"].to_numpy(zero_copy_only=False),
                             "s": vals}).groupby("o_custkey", as_index=False).sum()

    h1 = grouped_sums(
        edges.map_batches(h_step, batch_format="pyarrow", zero_copy_batch=True),
        ["o_custkey"], {"s": "s"},
    ).to_pandas().groupby("o_custkey", as_index=False).sum()
    h1v = h1.sort_values("o_custkey")
    ck, cs = h1v["o_custkey"].to_numpy(np.int64), h1v["s"].to_numpy(np.int64)
    h1_ref = _ray.put((ck, cs))

    def a_step(t: pa.Table) -> pd.DataFrame:
        k, s = _ray.get(h1_ref)
        vals = s[np.searchsorted(k, t["o_custkey"].to_numpy(zero_copy_only=False))]
        return pd.DataFrame({"l_partkey": t["l_partkey"].to_numpy(zero_copy_only=False),
                             "s": vals}).groupby("l_partkey", as_index=False).sum()

    a2 = grouped_sums(
        edges.map_batches(a_step, batch_format="pyarrow", zero_copy_batch=True),
        ["l_partkey"], {"s": "s"},
    ).to_pandas().groupby("l_partkey", as_index=False).sum()
    hub = h1.rename(columns={"o_custkey": "node"}).sort_values(
        ["s", "node"], ascending=[False, True]).head(10)
    auth = a2.rename(columns={"l_partkey": "node"}).sort_values(
        ["s", "node"], ascending=[False, True]).head(10)
    out = pd.concat([
        pd.DataFrame({"role": "authority", "node": auth["node"], "score": auth["s"]}),
        pd.DataFrame({"role": "hub", "node": hub["node"], "score": hub["s"]}),
    ], ignore_index=True)
    return _i64(out, ["node", "score"])


SQL_HITS_SCORES = """
WITH e AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS c, l_partkey AS p
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
a1 AS MATERIALIZED (SELECT p, COUNT(*) AS s FROM e GROUP BY 1),
h1 AS MATERIALIZED (
  SELECT c, CAST(SUM(a1.s) AS BIGINT) AS s FROM e JOIN a1 USING (p) GROUP BY 1),
a2 AS (
  SELECT p, CAST(SUM(h1.s) AS BIGINT) AS s FROM e JOIN h1 USING (c) GROUP BY 1),
u AS (
  SELECT 'hub' AS role, c AS node, s FROM h1
  UNION ALL SELECT 'authority' AS role, p AS node, s FROM a2),
rk AS (
  SELECT role, node, s AS score,
         ROW_NUMBER() OVER (PARTITION BY role ORDER BY s DESC, node) AS rn
  FROM u)
SELECT role, node, score FROM rk WHERE rn <= 10
ORDER BY role, score DESC, node
"""


_RING_SHARDS = 8
_RING_VNODES = 16


def q_ring_rebalance(sf_dir: str) -> pd.DataFrame:
    """Consistent-hashing rebalance audit: documents map onto a 128-point
    md5 ring (8 shards × 16 vnodes, doc → first ring point ≥ its hash, wrap
    to the ring minimum); removing shard s0 reassigns ONLY its arc — the
    audit counts per-shard membership before/after plus moved-in docs,
    demonstrating the minimal-movement property that makes ring-sharded
    sinks resumable under membership change.  Ring is driver-built (128
    hashes) and broadcast; docs hash in one vectorized scan."""
    ds = _t(sf_dir, "documents", ["doc_id"])
    ring_labels = [f"s{s}" for s in range(_RING_SHARDS) for _ in range(_RING_VNODES)]
    ring_keys = [f"s{s}:v{v}" for s in range(_RING_SHARDS)
                 for v in range(_RING_VNODES)]
    pts = np.asarray(md5_hex(ring_keys).to_pylist(), dtype=object)
    labels = np.asarray(ring_labels, dtype=object)
    order = np.argsort(pts)
    pts, labels = pts[order], labels[order]
    keep = labels != "s0"
    pts2, labels2 = pts[keep], labels[keep]

    def assign(t: pa.Table) -> pd.DataFrame:
        h = np.asarray(md5_hex(pc.binary_join_element_wise(
            pc.cast(t["doc_id"], pa.string()), ":ring", "")).to_pylist(), dtype=object)
        i1 = np.searchsorted(pts, h, side="left")
        i1[i1 == len(pts)] = 0
        i2 = np.searchsorted(pts2, h, side="left")
        i2[i2 == len(pts2)] = 0
        return pd.DataFrame({"before": labels[i1], "after": labels2[i2],
                             "n": np.ones(len(h), np.int64)}).groupby(
            ["before", "after"], as_index=False).sum()

    parts = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True
                           ).to_pandas().groupby(["before", "after"],
                                                 as_index=False).sum()
    shards = [f"s{s}" for s in range(_RING_SHARDS)]
    nb = parts.groupby("before")["n"].sum()
    na = parts.groupby("after")["n"].sum()
    mv = parts[parts["before"] == "s0"].groupby("after")["n"].sum()
    out = pd.DataFrame({
        "shard": shards,
        "n_before": [int(nb.get(s, 0)) for s in shards],
        "n_after": [int(na.get(s, 0)) for s in shards],
        "n_moved_in": [int(mv.get(s, 0)) for s in shards],
    })
    return _i64(out, ["n_before", "n_after", "n_moved_in"])


SQL_RING_REBALANCE = """
WITH ring AS (
  SELECT 's' || CAST(s AS VARCHAR) AS shard,
         md5('s' || CAST(s AS VARCHAR) || ':v' || CAST(v AS VARCHAR)) AS pt
  FROM generate_series(0, 7) g1(s), generate_series(0, 15) g2(v)),
d AS (SELECT md5(CAST(doc_id AS VARCHAR) || ':ring') AS h FROM documents),
asgn AS (
  SELECT COALESCE((SELECT r.shard FROM ring r WHERE r.pt >= d.h
                   ORDER BY r.pt LIMIT 1),
                  (SELECT r.shard FROM ring r ORDER BY r.pt LIMIT 1)) AS before,
         COALESCE((SELECT r.shard FROM ring r WHERE r.shard <> 's0' AND r.pt >= d.h
                   ORDER BY r.pt LIMIT 1),
                  (SELECT r.shard FROM ring r WHERE r.shard <> 's0'
                   ORDER BY r.pt LIMIT 1)) AS after
  FROM d),
shards AS (SELECT DISTINCT shard FROM ring)
SELECT sh.shard,
       COALESCE(b.n, 0) AS n_before, COALESCE(af.n, 0) AS n_after,
       COALESCE(mv.n, 0) AS n_moved_in
FROM shards sh
LEFT JOIN (SELECT before AS shard, COUNT(*) AS n FROM asgn GROUP BY 1) b USING (shard)
LEFT JOIN (SELECT after AS shard, COUNT(*) AS n FROM asgn GROUP BY 1) af USING (shard)
LEFT JOIN (SELECT after AS shard, COUNT(*) AS n FROM asgn
           WHERE before = 's0' GROUP BY 1) mv USING (shard)
ORDER BY sh.shard
"""


# ---------------------------------------------------------------------------
# Session-5 wave 10: LM smoothing, tokenizer metrics, robust stats, graph
# components, window functions, training-interleave audit
# ---------------------------------------------------------------------------

_KN_D = 0.75


def q_kneser_ney_bigram(sf_dir: str) -> pd.DataFrame:
    """Kneser-Ney smoothed bigram LM probabilities (absolute discount
    D=0.75, continuation-count backoff) for the top-20 corpus bigrams.  The
    heavy exchange is ONE packed-int64 bigram combiner; the KN terms
    (left-context mass c(w1·), follower fan-out N1+(w1·), continuation count
    N1+(·w2), distinct-bigram total) are then derived from the BIGRAM
    HISTOGRAM itself — three cheap aggregates over distinct-bigram rows,
    never a second corpus scan.  All counts exact ints; the one float
    formula mirrors the SQL term for term."""
    from ..functions.tokens import _flat_tokens

    ds = rd.read_parquet(ensure_derived_parquet(sf_dir), columns=["tokens"],
                         override_num_blocks=8)

    def bigrams(t: pa.Table) -> pd.DataFrame:
        values, offsets = _flat_tokens(t)
        starts = (offsets - offsets[0]).astype(np.int64)
        window = values[offsets[0]:offsets[-1]].astype(np.int64)
        a = window[:-1]
        b = window[1:]
        keep = np.ones(len(a), bool)
        keep[starts[1:-1] - 1] = False  # no bigram across sequence boundary
        packed = (a[keep] << np.int64(32)) | b[keep]
        keys, cnt = np.unique(packed, return_counts=True)
        return pd.DataFrame({"bg": keys, "c": cnt.astype(np.int64)})

    hist = grouped_sums(
        ds.map_batches(bigrams, batch_format="pyarrow", zero_copy_batch=True),
        ["bg"], {"c": "c"},
    ).materialize()

    def stats(t: pa.Table) -> pd.DataFrame:
        bg = t["bg"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        w1 = bg >> np.int64(32)
        w2 = bg & np.int64(0xFFFFFFFF)
        left = pd.DataFrame({"w1": w1, "cw1": c, "n1w1": np.ones(len(bg), np.int64)}
                            ).groupby("w1", as_index=False).sum()
        right = pd.DataFrame({"w2": w2, "n2w2": np.ones(len(bg), np.int64)}
                             ).groupby("w2", as_index=False).sum()
        return pd.DataFrame({
            "kind": ["l"] * len(left) + ["r"] * len(right) + ["t"],
            "k": np.concatenate([left["w1"], right["w2"], [0]]),
            "a": np.concatenate([left["cw1"], right["n2w2"], [len(bg)]]),
            "b": np.concatenate([left["n1w1"], np.zeros(len(right), np.int64), [0]]),
        })

    parts = hist.map_batches(stats, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
    agg = parts.groupby(["kind", "k"], as_index=False)[["a", "b"]].sum()
    lmap = agg[agg["kind"] == "l"].set_index("k")
    rmap = agg[agg["kind"] == "r"].set_index("k")["a"]
    dtot = int(agg.loc[agg["kind"] == "t", "a"].sum())
    top = topk(hist, ["c", "bg"], [True, False], 20).to_pandas()
    w1 = (top["bg"].to_numpy(np.int64) >> np.int64(32))
    w2 = (top["bg"].to_numpy(np.int64) & np.int64(0xFFFFFFFF))
    c = top["c"].to_numpy(np.int64)
    rows = []
    for i in range(len(top)):
        cw1 = int(lmap.loc[w1[i], "a"])
        n1w1 = int(lmap.loc[w1[i], "b"])
        n2w2 = int(rmap.loc[w2[i]])
        p = (max(int(c[i]) - _KN_D, 0.0) / cw1
             + (_KN_D * n1w1 / cw1) * (n2w2 / dtot))
        rows.append((int(w1[i]), int(w2[i]), int(c[i]), _rd(p, 9)))
    out = pd.DataFrame(rows, columns=["token_a", "token_b", "c", "p_kn"])
    out = out.sort_values(["c", "token_a", "token_b"],
                          ascending=[False, True, True], ignore_index=True)
    return _i64(out, ["token_a", "token_b", "c"])


SQL_KNESER_NEY_BIGRAM = f"""
WITH seq AS (SELECT tokens FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')),
z AS (
  SELECT UNNEST(list_zip(tokens[1:len(tokens) - 1], tokens[2:len(tokens)])) AS p
  FROM seq WHERE len(tokens) >= 2),
bg AS (
  SELECT CAST(p[1] AS BIGINT) AS w1, CAST(p[2] AS BIGINT) AS w2, COUNT(*) AS c
  FROM z GROUP BY 1, 2),
l AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS cw1, COUNT(*) AS n1w1 FROM bg GROUP BY 1),
r AS (SELECT w2, COUNT(*) AS n2w2 FROM bg GROUP BY 1),
t AS (SELECT COUNT(*) AS dtot FROM bg)
SELECT bg.w1 AS token_a, bg.w2 AS token_b, bg.c AS c,
       ROUND(GREATEST(bg.c - {_KN_D}, 0) / l.cw1
             + ({_KN_D} * l.n1w1 / l.cw1) * (r.n2w2 / (SELECT dtot FROM t)), 9) AS p_kn
FROM bg JOIN l USING (w1) JOIN r USING (w2)
ORDER BY c DESC, token_a, token_b LIMIT 20
"""


def q_chars_per_token(sf_dir: str) -> pd.DataFrame:
    """Tokenizer fertility metric (chars per token, the compression-ratio
    health check every tokenizer swap is judged by) per source: two
    independent bounded combiner aggregates — document chars from the raw
    table, token counts from the derived corpus — joined driver-side on the
    enum-bounded source key.  No corpus-width exchange at any scale."""
    docs = _t(sf_dir, "documents", ["source", "n_chars"])
    dch = grouped_sums(docs, ["source"], {"sum_chars": "n_chars"}, "n_docs",
                       reduce="driver").to_pandas()
    der = rd.read_parquet(ensure_derived_parquet(sf_dir),
                          columns=["source", "n_tok"], override_num_blocks=8)
    dtk = grouped_sums(der, ["source"], {"sum_tokens": "n_tok"}, None,
                       reduce="driver").to_pandas()
    out = dch.merge(dtk, on="source", how="inner")
    out["chars_per_token"] = [
        _rd(int(cc) / int(tt), 6)
        for cc, tt in zip(out["sum_chars"], out["sum_tokens"])
    ]
    out = out[["source", "n_docs", "sum_chars", "sum_tokens", "chars_per_token"]]
    out = out.sort_values("source", ignore_index=True)
    return _i64(out, ["n_docs", "sum_chars", "sum_tokens"])


SQL_CHARS_PER_TOKEN = f"""
WITH dch AS (
  SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
  FROM documents GROUP BY 1),
dtk AS (
  SELECT source, CAST(SUM(n_tok) AS BIGINT) AS sum_tokens
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet') GROUP BY 1)
SELECT source, n_docs, sum_chars, sum_tokens,
       ROUND(CAST(sum_chars AS DOUBLE) / sum_tokens, 6) AS chars_per_token
FROM dch JOIN dtk USING (source) ORDER BY source
"""


def q_train_interleave_audit(sf_dir: str) -> pd.DataFrame:
    """Weighted source-interleaving audit (the Pile/Dolma-style mixing
    schedule check): each source's docs enter the training stream under
    stride scheduling — the r-th doc of source s gets virtual time
    v = r * (LCM / w_s) — and the audit reports each source's share of the
    first half of the stream vs its weight.  Because v depends only on the
    doc's per-source arrival RANK, the window composition is a pure function
    of the bounded per-source count table: ONE enum-bounded combiner
    aggregate, then a driver-side integer binary search over the virtual-time
    threshold.  No global sort, no row_number exchange, at ANY corpus size —
    the oracle's ORDER BY v LIMIT K materializes the same stream explicitly."""
    docs = _t(sf_dir, "documents", ["source"])
    tot = grouped_sums(docs, ["source"], {}, "n_total", reduce="driver").to_pandas()
    tot = tot.sort_values("source", ignore_index=True)
    srcs = tot["source"].tolist()
    n = tot["n_total"].astype(int).tolist()
    wt = [1 + ord(s[-1]) % 3 for s in srcs]
    stride = [6 // w for w in wt]  # LCM(1,2,3)=6 keeps every v integral
    k = sum(n) // 2

    def c_le(t: int) -> int:
        return sum(min(ns, t // st) for ns, st in zip(n, stride))

    lo_t, hi_t = 1, max(ns * st for ns, st in zip(n, stride))
    while lo_t < hi_t:
        mid_t = (lo_t + hi_t) // 2
        if c_le(mid_t) >= k:
            hi_t = mid_t
        else:
            lo_t = mid_t + 1
    thr = lo_t
    c_lt = [min(ns, (thr - 1) // st) for ns, st in zip(n, stride)]
    # v strictly increases within a source (stride >= 2), so at most one
    # item per source sits exactly at the threshold; ties break by source
    eq = [1 if thr % st == 0 and thr // st <= ns else 0
          for ns, st in zip(n, stride)]
    take = k - sum(c_lt)
    n_win = list(c_lt)
    for i in range(len(srcs)):
        if take <= 0:
            break
        if eq[i]:
            n_win[i] += 1
            take -= 1
    out = pd.DataFrame({"source": srcs, "wt": wt, "n_total": n,
                        "n_window": n_win})
    out["window_share"] = [_rd(float(v) / k, 6) for v in n_win]
    return _i64(out, ["wt", "n_total", "n_window"])


SQL_TRAIN_INTERLEAVE_AUDIT = """
WITH k AS (SELECT COUNT(*) // 2 AS k FROM documents),
w AS (SELECT source, 1 + ascii(right(source, 1)) % 3 AS wt, COUNT(*) AS n_total
      FROM documents GROUP BY 1),
ranked AS (SELECT source, ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS r
           FROM documents),
keyed AS (SELECT ranked.source, r, r * (6 // wt) AS v
          FROM ranked JOIN w USING (source)),
sel AS (SELECT source FROM keyed ORDER BY v, source, r LIMIT (SELECT k FROM k)),
cnt AS (SELECT source, COUNT(*) AS n_window FROM sel GROUP BY 1)
SELECT w.source, w.wt, w.n_total, COALESCE(cnt.n_window, 0) AS n_window,
       ROUND(CAST(COALESCE(cnt.n_window, 0) AS DOUBLE) / (SELECT k FROM k), 6)
         AS window_share
FROM w LEFT JOIN cnt USING (source) ORDER BY w.source
"""


def q_good_turing_counts(sf_dir: str) -> pd.DataFrame:
    """Good-Turing frequency-of-frequencies table (the unseen-mass estimator
    behind Katz/SGT smoothing): token-frequency combiner exchange, then a
    count-of-counts histogram over the DISTINCT-token rows (bounded by the
    number of distinct frequencies, so the final reduce is driver-sized).
    Reports N_r for the 10 smallest observed frequencies with the GT
    discounted estimate r* = (r+1) N_{r+1} / N_r."""
    from ..functions.tokens import _flat_tokens

    ds = rd.read_parquet(ensure_derived_parquet(sf_dir), columns=["tokens"],
                         override_num_blocks=8)

    def tf_partial(t: pa.Table) -> pd.DataFrame:
        values, offsets = _flat_tokens(t)
        window = values[offsets[0]:offsets[-1]].astype(np.int64)
        keys, cnt = np.unique(window, return_counts=True)
        return pd.DataFrame({"token": keys, "c": cnt.astype(np.int64)})

    tf = grouped_sums(
        ds.map_batches(tf_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["token"], {"c": "c"},
    )

    def coc(t: pa.Table) -> pd.DataFrame:
        c = t["c"].to_numpy(zero_copy_only=False)
        keys, cnt = np.unique(c, return_counts=True)
        return pd.DataFrame({"r": keys.astype(np.int64),
                             "n_r": cnt.astype(np.int64)})

    hist = grouped_sums(
        tf.map_batches(coc, batch_format="pyarrow", zero_copy_batch=True),
        ["r"], {"n_r": "n_r"}, reduce="driver",
    ).to_pandas().sort_values("r", ignore_index=True)
    nmap = dict(zip(hist["r"].astype(int), hist["n_r"].astype(int)))
    out = hist.head(10).copy().reset_index(drop=True)
    rstar = []
    for r, nr in zip(out["r"].astype(int), out["n_r"].astype(int)):
        nx = nmap.get(r + 1)
        rstar.append(_rd((r + 1) * float(nx) / nr, 9) if nx else np.nan)
    out["r_star"] = rstar
    return _i64(out, ["r", "n_r"])


SQL_GOOD_TURING_COUNTS = f"""
WITH tf AS (
  SELECT CAST(token AS BIGINT) AS token, COUNT(*) AS c
  FROM (SELECT UNNEST(tokens) AS token
        FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet'))
  GROUP BY 1),
cc AS (SELECT c AS r, COUNT(*) AS n_r FROM tf GROUP BY 1)
SELECT a.r, a.n_r,
       ROUND((a.r + 1) * CAST(b.n_r AS DOUBLE) / a.n_r, 9) AS r_star
FROM cc a LEFT JOIN cc b ON b.r = a.r + 1
ORDER BY a.r LIMIT 10
"""


_RBO_P = 0.9
_RBO_DEPTH = 50


def q_rbo_rank_overlap(sf_dir: str) -> pd.DataFrame:
    """Rank-biased overlap (Webber et al. 2010, truncated at depth 50,
    p=0.9) between the top-50 purchase-value user rankings of the first vs
    second half of the event time range — the standard ranking-stability
    metric for search/recsys eval.  Two half-filtered user-total combiner
    aggregates + distributed top-50s; the RBO fold itself runs over 2x50
    driver rows.  Float terms mirror the SQL expression shape exactly."""
    ds = _t(sf_dir, "events", ["ts", "user_id", "event_type", "value"])

    def purchases(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        return pa.table({"us": pc.cast(t["ts"], pa.int64()),
                         "user_id": t["user_id"], "value": t["value"]})

    p = ds.map_batches(purchases, batch_format="pyarrow",
                       zero_copy_batch=True).materialize()
    bounds = p.map_batches(
        lambda t: pa.table({"lo": pa.array([pc.min(t["us"]).as_py()], pa.int64()),
                            "hi": pa.array([pc.max(t["us"]).as_py()], pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True,
    ).to_pandas()
    mid = (int(bounds["lo"].min()) + int(bounds["hi"].max())) // 2

    def half(lt: bool) -> pd.DataFrame:
        op = pc.less if lt else pc.greater_equal
        h = p.map_batches(
            lambda t, _op=op: t.filter(_op(t["us"], pa.scalar(mid, pa.int64()))),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        totals = grouped_sums(h, ["user_id"], {"tv": "value"})
        return topk(totals, ["tv", "user_id"], [True, False], _RBO_DEPTH).to_pandas()

    a, b = half(True), half(False)
    ra = dict(zip(a["user_id"].astype(int), range(1, len(a) + 1)))
    rb = dict(zip(b["user_id"].astype(int), range(1, len(b) + 1)))
    m = sorted(max(ra[u], rb[u]) for u in ra.keys() & rb.keys())
    rbo = 0.0
    for d in range(1, _RBO_DEPTH + 1):
        ov = sum(1 for x in m if x <= d)
        rbo += (1 - _RBO_P) * _RBO_P ** (d - 1) * ov / d
    out = pd.DataFrame([{"depth": _RBO_DEPTH, "n_overlap": len(m),
                         "rbo": _rd(rbo, 6)}])
    return _i64(out, ["depth", "n_overlap"])


SQL_RBO_RANK_OVERLAP = f"""
WITH p AS (SELECT CAST(epoch_us(ts) AS BIGINT) AS us, user_id, value
           FROM events WHERE event_type = 'purchase'),
b AS (SELECT (MIN(us) + MAX(us)) // 2 AS mid FROM p),
a1 AS (SELECT user_id, ROW_NUMBER() OVER (ORDER BY SUM(value) DESC, user_id) AS ra
       FROM p WHERE us < (SELECT mid FROM b) GROUP BY user_id
       QUALIFY ra <= {_RBO_DEPTH}),
a2 AS (SELECT user_id, ROW_NUMBER() OVER (ORDER BY SUM(value) DESC, user_id) AS rb
       FROM p WHERE us >= (SELECT mid FROM b) GROUP BY user_id
       QUALIFY rb <= {_RBO_DEPTH}),
m AS (SELECT GREATEST(ra, rb) AS m FROM a1 JOIN a2 USING (user_id)),
d AS (SELECT CAST(d AS BIGINT) AS d FROM generate_series(1, {_RBO_DEPTH}) AS t(d)),
ov AS (SELECT d.d, COUNT(m.m) AS ov FROM d LEFT JOIN m ON m.m <= d.d GROUP BY d.d)
SELECT {_RBO_DEPTH} AS depth,
       (SELECT COUNT(*) FROM m) AS n_overlap,
       ROUND(SUM(CAST({1 - _RBO_P!r} AS DOUBLE) * POW({_RBO_P}, d - 1) * ov / d), 6) AS rbo
FROM ov
"""


# ---------------------------------------------------------------------------
# Wave 11: CSV source format + parquet storage-footprint audit
# ---------------------------------------------------------------------------


def ensure_orders_csv(sf_dir: str) -> str:
    """Deterministic CSV export artifact (an 'orders feed' a partner drops
    on a bucket): RFC-4180 quoting edge cases — embedded commas, escaped
    double quotes, an embedded newline, empty numeric fields as NULLs —
    derived from the orders table so both engines parse the SAME bytes."""
    import os as _os
    import uuid as _uuid

    path = _os.path.join(_corpus_dir(sf_dir), "orders_feed.csv")
    if _os.path.exists(path):
        return path
    t = pq.read_table(f"{sf_dir}/orders.parquet",
                      columns=["o_orderkey", "o_custkey", "o_totalprice"]
                      ).sort_by("o_orderkey")
    rows = zip(t["o_orderkey"].to_pylist(), t["o_custkey"].to_pylist(),
               t["o_totalprice"].to_pylist())
    cats = ['retail, bulk', 'plain', 'quoted "prime" tier', 'two\nline', 'unit']
    lines = ["order_id,cust_id,amount,qty,category"]
    for i, (ok, ck, tp) in enumerate(rows):
        amount = "" if i % 11 == 3 else f"{tp:.2f}"
        qty = "" if i % 13 == 7 else str(1 + i % 9)
        cat = cats[i % len(cats)].replace('"', '""')
        lines.append(f'{ok},{ck},{amount},{qty},"{cat}"')
    _os.makedirs(_os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp-{_uuid.uuid4().hex}"
    with open(tmp, "w", newline="") as f:
        f.write("\n".join(lines) + "\n")
    _os.replace(tmp, path)
    return path


def q_csv_ingest_stats(sf_dir: str) -> pd.DataFrame:
    """CSV source format end-to-end: ``ray.data.read_csv`` (pyarrow RFC-4180
    parser, empty fields as NULLs) over the partner-feed artifact, then one
    enum-bounded combiner aggregate per category — null accounting included.
    The oracle parses the same bytes with DuckDB's CSV reader, so quoting,
    embedded newlines, and NULL conventions must agree exactly."""
    from pyarrow import csv as pacsv

    path = ensure_orders_csv(sf_dir)
    ds = rd.read_csv(
        path,
        convert_options=pacsv.ConvertOptions(
            column_types={"order_id": pa.int64(), "cust_id": pa.int64(),
                          "amount": pa.float64(), "qty": pa.int64(),
                          "category": pa.string()},
        ),
    )

    def partial(t: pa.Table) -> pa.Table:
        cat = pc.replace_substring(t["category"], "\n", "\\n")
        g = pa.table({
            "category": cat,
            "amount0": pc.coalesce(t["amount"], pa.scalar(0.0)),
            "qty0": pc.coalesce(t["qty"], pa.scalar(0, pa.int64())),
            "null_amount": pc.cast(pc.is_null(t["amount"]), pa.int64()),
            "null_qty": pc.cast(pc.is_null(t["qty"]), pa.int64()),
        })
        return g

    agg = grouped_sums(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["category"],
        {"sum_amount": "amount0", "sum_qty": "qty0",
         "n_null_amount": "null_amount", "n_null_qty": "null_qty"},
        "n", reduce="driver",
    ).to_pandas()
    agg["sum_amount"] = agg["sum_amount"].pipe(_rd, 2)
    agg = agg[["category", "n", "sum_amount", "sum_qty", "n_null_amount",
               "n_null_qty"]].sort_values("category", ignore_index=True)
    return _i64(agg, ["n", "sum_qty", "n_null_amount", "n_null_qty"])


SQL_CSV_INGEST_STATS = f"""
SELECT replace(category, chr(10), '\\n') AS category, COUNT(*) AS n,
       ROUND(SUM(COALESCE(amount, 0)), 2) AS sum_amount,
       CAST(SUM(COALESCE(qty, 0)) AS BIGINT) AS sum_qty,
       COUNT(*) - COUNT(amount) AS n_null_amount,
       COUNT(*) - COUNT(qty) AS n_null_qty
FROM read_csv('{ORACLE_ARTIFACT_DIR}/orders_feed.csv', header=true,
              columns={{'order_id': 'BIGINT', 'cust_id': 'BIGINT',
                       'amount': 'DOUBLE', 'qty': 'BIGINT',
                       'category': 'VARCHAR'}})
GROUP BY 1 ORDER BY 1
"""


def q_parquet_footprint_audit(sf_dir: str) -> pd.DataFrame:
    """Storage-footprint audit (the 'which column is eating the lake'
    report): per-column compressed/uncompressed byte totals and compression
    ratio from parquet FOOTER METADATA only — a fan-out over file paths
    reading KB-sized footers, never data pages, so auditing a 100-TB table
    costs one footer fetch per file.  The audited file is a fixed-row-group
    re-encode artifact so BOTH engines read the same bytes at every scale
    factor.  Oracle: DuckDB ``parquet_metadata()`` over the same file."""
    path = ensure_footprint_parquet(sf_dir)

    def footprint(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for p in batch["path"]:
            md = pq.ParquetFile(p).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    c = g.column(ci)
                    rows.append((c.path_in_schema,
                                 int(c.total_compressed_size),
                                 int(c.total_uncompressed_size)))
        return pd.DataFrame(rows, columns=["column", "comp", "uncomp"])

    ds = rd.from_items([{"path": path}]).map_batches(
        footprint, batch_format="pandas")
    out = grouped_sums(ds, ["column"],
                       {"compressed_bytes": "comp",
                        "uncompressed_bytes": "uncomp"}, reduce="driver",
                       ).to_pandas()
    out["ratio"] = [
        _rd(float(u) / c, 6)
        for u, c in zip(out["uncompressed_bytes"], out["compressed_bytes"])
    ]
    out = out.sort_values("column", ignore_index=True)
    return _i64(out, ["compressed_bytes", "uncompressed_bytes"])


def ensure_footprint_parquet(sf_dir: str) -> str:
    """Fixed-row-group zstd re-encode of four lineitem columns — the file
    whose storage layout the footprint audit inspects."""
    import os as _os

    def build() -> pa.Table:
        return pq.read_table(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_returnflag",
                     "l_shipdate"],
        ).sort_by("l_orderkey")

    path = _os.path.join(_corpus_dir(sf_dir), "footprint.parquet")
    if not _os.path.exists(path):
        import uuid as _uuid

        _os.makedirs(_os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp-{_uuid.uuid4().hex}"
        pq.write_table(build(), tmp, row_group_size=8192, compression="zstd")
        _os.replace(tmp, path)
    return path


SQL_PARQUET_FOOTPRINT_AUDIT = f"""
SELECT path_in_schema AS "column",
       CAST(SUM(total_compressed_size) AS BIGINT) AS compressed_bytes,
       CAST(SUM(total_uncompressed_size) AS BIGINT) AS uncompressed_bytes,
       ROUND(CAST(SUM(total_uncompressed_size) AS DOUBLE)
             / SUM(total_compressed_size), 6) AS ratio
FROM parquet_metadata('{ORACLE_ARTIFACT_DIR}/footprint.parquet')
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Wave 12: Poisson-bootstrap CI + differentially-private count release
# ---------------------------------------------------------------------------

_PB_B = 64          # bootstrap replicates
_PB_A = 2654435761  # Knuth multiplicative constant
_PB_C = 40503
_PB_M = 2_147_483_648
# Poisson(1) CDF thresholds (k = 0..6; u beyond the last bucket -> weight 7)
_PB_CDF = (0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
           0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
           0.999916758850712)


def q_poisson_bootstrap_ci(sf_dir: str) -> pd.DataFrame:
    """Poisson-bootstrap confidence interval for the mean event value — the
    WEB-SCALE bootstrap: instead of gathering n×B resamples, every row
    derives its own deterministic Poisson(1) weight per replicate from a
    hash of (event_id, b), so the corpus is read ONCE and the only exchange
    is B weighted-sum partials per block.  CI = 2nd / 63rd order statistic
    of the 64 replicate means.  The oracle explodes events × replicates and
    must reproduce the weights bit-exactly from the same integer hash."""
    ds = _t(sf_dir, "events", ["event_id", "value"])
    cdf = np.asarray(_PB_CDF)

    def partial(t: pa.Table) -> pd.DataFrame:
        ids = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        val = t["value"].to_numpy(zero_copy_only=False)
        b = np.arange(1, _PB_B + 1, dtype=np.int64)
        h = (ids[:, None] * np.int64(_PB_A) + b[None, :] * np.int64(_PB_C)) \
            % np.int64(_PB_M)
        w = np.searchsorted(cdf, h / float(_PB_M), side="right").astype(np.float64)
        return pd.DataFrame({
            "b": b,
            "sw": w.sum(axis=0),
            "swv": (w * val[:, None]).sum(axis=0),
            "n": np.full(_PB_B, len(ids), np.int64),
            "sv": np.full(_PB_B, float(val.sum()), np.float64),
        })

    parts = grouped_sums(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["b"], {"sw": "sw", "swv": "swv", "n": "n", "sv": "sv"},
        reduce="driver",
    ).to_pandas().sort_values("b", ignore_index=True)
    means = np.sort((parts["swv"] / parts["sw"]).to_numpy())
    n = int(parts["n"].iloc[0])
    point = float(parts["sv"].iloc[0]) / n
    out = pd.DataFrame([{
        "n": n, "b": _PB_B,
        "point_mean": _rd(point, 6),
        "ci_lo": _rd(float(means[1]), 6),
        "ci_hi": _rd(float(means[_PB_B - 2]), 6),
    }])
    return _i64(out, ["n", "b"])


SQL_POISSON_BOOTSTRAP_CI = f"""
WITH r AS (SELECT CAST(b AS BIGINT) AS b FROM generate_series(1, {_PB_B}) t(b)),
w AS (
  SELECT r.b, e.value,
         CASE WHEN u < {_PB_CDF[0]!r} THEN 0 WHEN u < {_PB_CDF[1]!r} THEN 1
              WHEN u < {_PB_CDF[2]!r} THEN 2 WHEN u < {_PB_CDF[3]!r} THEN 3
              WHEN u < {_PB_CDF[4]!r} THEN 4 WHEN u < {_PB_CDF[5]!r} THEN 5
              WHEN u < {_PB_CDF[6]!r} THEN 6 ELSE 7 END AS w
  FROM events e CROSS JOIN r
  CROSS JOIN LATERAL (SELECT ((e.event_id * {_PB_A} + r.b * {_PB_C})
                              % {_PB_M}) / {_PB_M}.0 AS u) uu),
m AS (SELECT b, SUM(w * value) / SUM(w) AS mean_b FROM w GROUP BY b),
o AS (SELECT mean_b, ROW_NUMBER() OVER (ORDER BY mean_b) AS rn FROM m)
SELECT (SELECT COUNT(*) FROM events) AS n, {_PB_B} AS b,
       (SELECT ROUND(SUM(value) / COUNT(*), 6) FROM events) AS point_mean,
       (SELECT ROUND(mean_b, 6) FROM o WHERE rn = 2) AS ci_lo,
       (SELECT ROUND(mean_b, 6) FROM o WHERE rn = {_PB_B - 1}) AS ci_hi
"""


def q_dp_event_counts(sf_dir: str) -> pd.DataFrame:
    """Differentially-private count release (ε=1 Laplace mechanism) for the
    per-type event histogram: exact counts from one bounded combiner
    aggregate; the noise draw is the Laplace inverse-CDF applied to a
    DETERMINISTIC 48-bit uniform seeded from md5(event_type) — auditable,
    reproducible DP release, same convention as the SQL oracle.  Rounds out
    the privacy suite (k-anonymity / l-diversity / t-closeness audits)."""
    import math

    ds = _t(sf_dir, "events", ["event_type"])
    out = grouped_sums(ds, ["event_type"], {}, "n", reduce="driver"
                       ).to_pandas().sort_values("event_type",
                                                 ignore_index=True)
    noisy = []
    for et, n in zip(out["event_type"], out["n"].astype(int)):
        u = int(md5_hex_str(et)[:12], 16) / float(1 << 48)
        noise = math.log(2 * u) if u < 0.5 else -math.log(2 - 2 * u)
        noisy.append(_rd(n + noise, 6))
    out["noisy_n"] = noisy
    return _i64(out, ["n"])


def md5_hex_str(s: str) -> str:
    import hashlib

    return hashlib.md5(s.encode()).hexdigest()


SQL_DP_EVENT_COUNTS = """
WITH c AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1),
u AS (SELECT event_type, n,
             CAST('0x' || substr(md5(event_type), 1, 12) AS BIGINT)
               / 281474976710656.0 AS u
      FROM c)
SELECT event_type, n,
       ROUND(n + CASE WHEN u < 0.5 THEN LN(2 * u) ELSE -LN(2 - 2 * u) END, 6)
         AS noisy_n
FROM u ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Wave 13: CCNet-style perplexity bucketing
# ---------------------------------------------------------------------------


def q_ccnet_perplexity_buckets(sf_dir: str) -> pd.DataFrame:
    """CCNet-style quality bucketing (Wenzek et al. 2020): an add-one
    unigram LM is fit on the REFERENCE half of the corpus (docs with an
    even token count — a deterministic, fully vectorizable split), every
    doc is scored in integer µnats-per-token, and docs split into
    head/middle/tail by exact integer terciles; the report is each source's
    bucket composition.  One token-count exchange (full-vocab keys carry
    reference counts so unseen-token smoothing is a plain lookup), one
    broadcast-cost scoring pass, one bounded (source × bucket) reduce —
    the doc corpus itself is never shuffled."""
    import math as _math

    import ray as _ray

    ds = rd.read_parquet(ensure_derived_parquet(sf_dir),
                         columns=["source", "tokens"],
                         override_num_blocks=8)

    def count_part(t: pa.Table) -> pd.DataFrame:
        from ..functions.tokens import _flat_tokens

        values, offsets = _flat_tokens(t)
        starts = (offsets - offsets[0]).astype(np.int64)
        flat = values[offsets[0]:offsets[-1]].astype(np.int64)
        lens = starts[1:] - starts[:-1]
        is_ref = np.repeat(lens % 2 == 0, lens)
        keys, inv = np.unique(flat, return_inverse=True)
        n_all = np.bincount(inv, minlength=len(keys)).astype(np.int64)
        n_ref = np.bincount(inv, weights=is_ref.astype(np.float64),
                            minlength=len(keys)).astype(np.int64)
        return pd.DataFrame({"tok": keys, "n_all": n_all, "n_ref": n_ref})

    cnt = grouped_sums(
        ds.map_batches(count_part, batch_format="pyarrow", zero_copy_batch=True),
        ["tok"], {"n_all": "n_all", "n_ref": "n_ref"},
    ).to_pandas().sort_values("tok", ignore_index=True)
    vocab = len(cnt)
    t_ref = int(cnt["n_ref"].sum())
    denom = float(t_ref + vocab)
    cost = {
        int(tok): int(round(-_math.log((int(c) + 1) / denom) * 1_000_000))
        for tok, c in zip(cnt["tok"], cnt["n_ref"])
    }
    cost_ref = _ray.put(cost)

    def score_part(t: pa.Table) -> pd.DataFrame:
        from ..functions.tokens import _flat_tokens

        cst = _ray.get(cost_ref)
        values, offsets = _flat_tokens(t)
        starts = (offsets - offsets[0]).astype(np.int64)
        flat = values[offsets[0]:offsets[-1]].astype(np.int64)
        lens = starts[1:] - starts[:-1]
        keys = np.fromiter(cst.keys(), np.int64, len(cst))
        vals = np.fromiter(cst.values(), np.int64, len(cst))
        order = np.argsort(keys)
        costs = vals[order][np.searchsorted(keys[order], flat)]
        nll = np.add.reduceat(costs, np.r_[np.int64(0), np.cumsum(lens)[:-1]]) \
            if len(flat) else np.zeros(len(lens), np.int64)
        keep = lens > 0
        score = (nll[keep] * np.int64(1_000_000)) // lens[keep]
        src = np.asarray(t["source"].to_pylist(), dtype=object)[keep]
        return pd.DataFrame({"source": src, "score": score})

    scored = ds.map_batches(score_part, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    hist = grouped_sums(scored, ["score"], {}, "n", reduce="driver"
                        ).to_pandas().sort_values("score", ignore_index=True)
    n = int(hist["n"].sum())
    cum = hist["n"].cumsum()
    k1, k2 = (n + 2) // 3, (2 * n + 2) // 3
    b1 = int(hist["score"][cum >= k1].iloc[0])
    b2 = int(hist["score"][cum >= k2].iloc[0])

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        s = df["score"].to_numpy(np.int64)
        b = np.where(s <= b1, "head", np.where(s <= b2, "middle", "tail"))
        out = pd.DataFrame({"source": df["source"], "bucket": b})
        return out.groupby(["source", "bucket"], as_index=False).size() \
                  .rename(columns={"size": "n_docs"})

    out = grouped_sums(
        scored.map_batches(bucketize, batch_format="pandas"),
        ["source", "bucket"], {"n_docs": "n_docs"}, reduce="driver",
    ).to_pandas().sort_values(["source", "bucket"], ignore_index=True)
    return _i64(out, ["n_docs"])


SQL_CCNET_PERPLEXITY_BUCKETS = f"""
WITH tok AS (
  SELECT doc_id, source, len(tokens) AS nt, UNNEST(tokens) AS t
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')),
cnt AS (SELECT t, COUNT(*) FILTER (WHERE nt % 2 = 0) AS n_ref FROM tok GROUP BY t),
dims AS (SELECT COUNT(*) AS v, CAST(SUM(n_ref) AS BIGINT) AS tr FROM cnt),
cost AS (
  SELECT t, CAST(ROUND(-LN((n_ref + 1)
             / CAST((SELECT tr + v FROM dims) AS DOUBLE)) * 1000000)
           AS BIGINT) AS u
  FROM cnt),
doc AS (
  SELECT doc_id, source,
         (CAST(SUM(u) AS BIGINT) * 1000000) // COUNT(*) AS score
  FROM tok JOIN cost USING (t) GROUP BY doc_id, source),
dims2 AS (SELECT COUNT(*) AS n FROM doc),
b1 AS (SELECT score AS b FROM doc ORDER BY score
       LIMIT 1 OFFSET (SELECT (n + 2) // 3 - 1 FROM dims2)),
b2 AS (SELECT score AS b FROM doc ORDER BY score
       LIMIT 1 OFFSET (SELECT (2 * n + 2) // 3 - 1 FROM dims2))
SELECT source,
       CASE WHEN score <= (SELECT b FROM b1) THEN 'head'
            WHEN score <= (SELECT b FROM b2) THEN 'middle'
            ELSE 'tail' END AS bucket,
       COUNT(*) AS n_docs
FROM doc GROUP BY 1, 2 ORDER BY source, bucket
"""


# ---------------------------------------------------------------------------
# Wave 14: word2vec negative-sampling table
# ---------------------------------------------------------------------------

_NS_TABLE = 1 << 20
_NS_POW = 0.75


def q_negative_sampling_table(sf_dir: str) -> pd.DataFrame:
    """word2vec/NCE negative-sampling table (Mikolov et al. 2013): token
    frequencies tempered by the classic unigram^0.75, then a table of 2^20
    slots apportioned EXACTLY by Hamilton largest-remainder over integer
    µ-quantized tempered masses — bit-deterministic slot counts (the float
    pow appears only inside a floor-to-integer).  One token-count combiner
    exchange; the apportionment runs over the VOCAB_SIZE-bounded frequency
    table.  Reports the 20 most-sampled tokens."""
    from ..functions.tokens import _flat_tokens

    ds = rd.read_parquet(ensure_derived_parquet(sf_dir), columns=["tokens"],
                         override_num_blocks=8)

    def tf_partial(t: pa.Table) -> pd.DataFrame:
        values, offsets = _flat_tokens(t)
        window = values[offsets[0]:offsets[-1]].astype(np.int64)
        keys, cnt = np.unique(window, return_counts=True)
        return pd.DataFrame({"token": keys, "c": cnt.astype(np.int64)})

    tf = grouped_sums(
        ds.map_batches(tf_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["token"], {"c": "c"},
    ).to_pandas().sort_values("token", ignore_index=True)
    c = tf["c"].to_numpy(np.int64).astype(np.float64)
    x = np.floor(c ** _NS_POW * 1_000_000.0).astype(np.int64)
    xs = int(x.sum())
    base = x * np.int64(_NS_TABLE) // xs
    frac = x * np.int64(_NS_TABLE) % xs
    rem = _NS_TABLE - int(base.sum())
    # largest remainder, ties to the smaller token id
    order = np.lexsort((tf["token"].to_numpy(np.int64), -frac))
    slots = base.copy()
    slots[order[:rem]] += 1
    out = pd.DataFrame({"token": tf["token"].astype("int64"),
                        "c": tf["c"].astype("int64"), "slots": slots})
    out["p_sample"] = [_rd(float(s) / _NS_TABLE, 6) for s in slots]
    out = out.sort_values(["slots", "token"], ascending=[False, True],
                          ignore_index=True).head(20)
    return _i64(out, ["token", "c", "slots"])


SQL_NEGATIVE_SAMPLING_TABLE = f"""
WITH tf AS (
  SELECT CAST(token AS BIGINT) AS token, COUNT(*) AS c
  FROM (SELECT UNNEST(tokens) AS token
        FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet'))
  GROUP BY 1),
m AS (SELECT token, c,
             CAST(FLOOR(POW(c, {_NS_POW}) * 1000000.0) AS BIGINT) AS x
      FROM tf),
tot AS (SELECT CAST(SUM(x) AS BIGINT) AS xs FROM m),
h AS (SELECT token, c, (x * {_NS_TABLE}) // (SELECT xs FROM tot) AS base,
             (x * {_NS_TABLE}) % (SELECT xs FROM tot) AS frac
      FROM m),
r AS (SELECT {_NS_TABLE} - CAST(SUM(base) AS BIGINT) AS rem FROM h),
s AS (SELECT token, c,
             base + CASE WHEN ROW_NUMBER() OVER (ORDER BY frac DESC, token)
                              <= (SELECT rem FROM r) THEN 1 ELSE 0 END AS slots
      FROM h)
SELECT token, c, slots,
       ROUND(CAST(slots AS DOUBLE) / {_NS_TABLE}, 6) AS p_sample
FROM s ORDER BY slots DESC, token LIMIT 20
"""


# ---------------------------------------------------------------------------
# Wave 15: sequential-pattern mining, Neyman stratified allocation,
# positional phrase search, anti-entropy partition digests, label propagation
# ---------------------------------------------------------------------------


def q_sequence_mining_triples(sf_dir: str) -> pd.DataFrame:
    """PrefixSpan-style sequential-pattern support (Pei et al. 2001,
    support counting specialized to length-3 patterns): for each ordered
    event-type triple (t1,t2,t3), how many users' event streams contain the
    subsequence t1..t2..t3 at strictly increasing positions (gaps allowed).
    Users are hash-bucketed ONCE; inside a bucket the exists-check uses the
    min/max-position trick — (t1,t2,t3) occurs iff some position of t2 lies
    strictly between min(pos[t1]) and max(pos[t3]) — so per-user work is two
    small merges over (user,type) extents, never an O(n^3) expansion, and
    only bounded (t1,t2,t3,support) partials leave the bucket exchange."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        df["rn"] = df.groupby("user_id", sort=False).cumcount() + 1
        mm = df.groupby(["user_id", "event_type"], as_index=False).agg(
            mn=("rn", "min"), mx=("rn", "max")
        )
        a = mm.rename(columns={"event_type": "t1"})[["user_id", "t1", "mn"]]
        b = df.rename(columns={"event_type": "t2"})[["user_id", "t2", "rn"]]
        c = mm.rename(columns={"event_type": "t3"})[["user_id", "t3", "mx"]]
        ab = a.merge(b, on="user_id")
        ab = ab[ab["rn"] > ab["mn"]]
        abc = ab.merge(c, on="user_id")
        abc = abc[abc["mx"] > abc["rn"]]
        trip = abc[["user_id", "t1", "t2", "t3"]].drop_duplicates()
        out = trip.groupby(["t1", "t2", "t3"], as_index=False).size()
        return out.rename(columns={"size": "support"})

    counts = grouped_sums(
        bucketed_group_reduce(ds, ["user_id"], per_bucket),
        ["t1", "t2", "t3"],
        {"support": "support"},
    )
    out = topk(
        counts, ["support", "t1", "t2", "t3"], [True, False, False, False], 15
    ).to_pandas()
    return _i64(out, ["support"]).reset_index(drop=True)


SQL_SEQUENCE_MINING_TRIPLES = """
WITH e AS (
  SELECT user_id, event_type AS t,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events),
mm AS (SELECT user_id, t, MIN(rn) AS mn, MAX(rn) AS mx FROM e GROUP BY 1, 2),
trip AS (
  SELECT DISTINCT b.user_id, a.t AS t1, b.t AS t2, c.t AS t3
  FROM mm a
  JOIN e b ON b.user_id = a.user_id AND b.rn > a.mn
  JOIN mm c ON c.user_id = b.user_id AND c.mx > b.rn)
SELECT t1, t2, t3, COUNT(*) AS support FROM trip
GROUP BY 1, 2, 3 ORDER BY support DESC, t1, t2, t3 LIMIT 15
"""


_NEYMAN_TOTAL = 100


def q_neyman_sample(sf_dir: str) -> pd.DataFrame:
    """Neyman-style stratified sampling with EXACT integer allocation: each
    source stratum gets slots proportional to N_h * scale_h where scale_h
    is a robust integer dispersion (P90-P10+1 of n_chars via exact lower
    order statistics), apportioned by Hamilton largest remainder (ties to
    the lexicographically smaller source); the sample itself is the
    per-stratum md5(doc_id) hash-order prefix — reservoir-equivalent and
    rerun/partitioning-stable.  Stage 1 moves only (source, n_chars) count
    partials (bounded domain); stage 2 is a per-group top-k prune whose
    candidate set never exceeds slots x blocks; the apportionment runs
    driver-side over |sources| rows in arbitrary-precision ints."""
    from ..functions.relational import grouped_topk

    hist = (
        grouped_sums(
            _t(sf_dir, "documents", ["source", "n_chars"]),
            ["source", "n_chars"],
            {},
            "c",
        )
        .to_pandas()
        .sort_values(["source", "n_chars"], ignore_index=True)
    )

    strata: list[tuple[str, int, int, int, int]] = []
    for src, g in hist.groupby("source", sort=True):
        cnt = g["c"].to_numpy(np.int64)
        vals = g["n_chars"].to_numpy(np.int64)
        n = int(cnt.sum())
        cum = np.cumsum(cnt)
        q10 = int(vals[np.searchsorted(cum, (n - 1) // 10 + 1)])
        q90 = int(vals[np.searchsorted(cum, 9 * (n - 1) // 10 + 1)])
        strata.append((str(src), n, q10, q90, n * (q90 - q10 + 1)))
    xs = sum(s[4] for s in strata)
    alloc = {s[0]: s[4] * _NEYMAN_TOTAL // xs for s in strata}
    frac = {s[0]: s[4] * _NEYMAN_TOTAL % xs for s in strata}
    rem = _NEYMAN_TOTAL - sum(alloc.values())
    for src, _ in sorted(frac.items(), key=lambda kv: (-kv[1], kv[0]))[:rem]:
        alloc[src] += 1

    ds = _t(sf_dir, "documents", ["doc_id", "source"])

    def add_h(t: pa.Table) -> pa.Table:
        return t.append_column("h", md5_hex(pc.cast(t["doc_id"], pa.string())))

    keyed = ds.map_batches(add_h, batch_format="pyarrow", zero_copy_batch=True)
    kmax = max(1, max(alloc.values()))
    cand = (
        grouped_topk(keyed, ["source"], ["h", "doc_id"], [False, False], kmax)
        .to_pandas()
        .sort_values(["source", "h", "doc_id"], ignore_index=True)
    )
    cand["rk"] = cand.groupby("source", sort=False).cumcount()
    cand["cap"] = cand["source"].map(alloc).astype(np.int64)
    sel = cand[cand["rk"] < cand["cap"]]
    samp = sel.groupby("source", as_index=False).agg(
        sampled=("doc_id", "count"), sample_id_sum=("doc_id", "sum")
    )
    out = pd.DataFrame(
        {
            "source": [s[0] for s in strata],
            "n_docs": [s[1] for s in strata],
            "q10": [s[2] for s in strata],
            "q90": [s[3] for s in strata],
            "alloc": [alloc[s[0]] for s in strata],
        }
    )
    out = out.merge(samp, on="source", how="left")
    out[["sampled", "sample_id_sum"]] = out[["sampled", "sample_id_sum"]].fillna(0)
    return _i64(out, ["n_docs", "q10", "q90", "alloc", "sampled", "sample_id_sum"])


SQL_NEYMAN_SAMPLE = f"""
WITH ranked AS (
  SELECT source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars) - 1 AS r,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents),
qs AS (
  SELECT source, MAX(n) AS n_docs,
         MAX(CASE WHEN r = (n - 1) // 10 THEN n_chars END) AS q10,
         MAX(CASE WHEN r = (9 * (n - 1)) // 10 THEN n_chars END) AS q90
  FROM ranked GROUP BY source),
m AS (SELECT source, n_docs, q10, q90,
             CAST(n_docs AS HUGEINT) * (q90 - q10 + 1) AS mass FROM qs),
tot AS (SELECT SUM(mass) AS xs FROM m),
h AS (SELECT source, n_docs, q10, q90,
             mass * {_NEYMAN_TOTAL} // (SELECT xs FROM tot) AS base,
             mass * {_NEYMAN_TOTAL} % (SELECT xs FROM tot) AS frac
      FROM m),
rr AS (SELECT {_NEYMAN_TOTAL} - SUM(base) AS rem FROM h),
al AS (SELECT source, n_docs, q10, q90,
              base + CASE WHEN ROW_NUMBER() OVER (ORDER BY frac DESC, source)
                               <= (SELECT rem FROM rr) THEN 1 ELSE 0 END AS alloc
       FROM h),
sel AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents),
samp AS (
  SELECT s.source, COUNT(*) AS sampled, SUM(s.doc_id) AS sample_id_sum
  FROM sel s JOIN al ON al.source = s.source AND s.rk <= al.alloc
  GROUP BY 1)
SELECT al.source, al.n_docs, al.q10, al.q90, CAST(al.alloc AS BIGINT) AS alloc,
       COALESCE(samp.sampled, 0) AS sampled,
       CAST(COALESCE(samp.sample_id_sum, 0) AS BIGINT) AS sample_id_sum
FROM al LEFT JOIN samp ON samp.source = al.source
ORDER BY al.source
"""


def _doc_word_pairs(t: pa.Table):
    """Flat word array + per-doc offsets + the internal-pair mask: pair i is
    (words[i], words[i+1]) and is valid iff it does not cross a document
    boundary.  Whitespace-split convention shared with the gram family."""
    lst = pc.split_pattern(t["text"], " ").combine_chunks()
    vals = lst.values
    off = np.asarray(lst.offsets, dtype=np.int64)
    L = len(vals)
    internal = np.ones(max(0, L - 1), dtype=bool)
    if L >= 2 and len(off) > 2:
        internal[off[1:-1] - 1] = False
    return vals, off, internal


def q_phrase_search(sf_dir: str) -> pd.DataFrame:
    """Positional phrase search, two-pass and self-contained: pass 1 finds
    the corpus's most frequent word bigram (combiner partials, one bounded
    exchange, deterministic tie-break); pass 2 broadcasts that phrase and
    counts EXACT-adjacency occurrences per document — overlapping
    occurrences included, which substring counting would miss — via two
    shifted vectorized equality scans over the shared flat word buffer and
    one np.add.reduceat per batch.  Top-10 matching docs."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def bigram_partial(t: pa.Table) -> pd.DataFrame:
        vals, off, internal = _doc_word_pairs(t)
        L = len(vals)
        if L < 2 or not internal.any():
            return pd.DataFrame(
                {"w1": pd.Series([], dtype=object), "w2": pd.Series([], dtype=object),
                 "c": pd.Series([], dtype="int64")}
            )
        w1 = vals.slice(0, L - 1).to_numpy(zero_copy_only=False)
        w2 = vals.slice(1, L - 1).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"w1": w1[internal], "w2": w2[internal]})
        g = df.groupby(["w1", "w2"], as_index=False).size()
        return g.rename(columns={"size": "c"})

    bg = grouped_sums(
        ds.map_batches(bigram_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["w1", "w2"],
        {"c": "c"},
    )
    top = topk(bg, ["c", "w1", "w2"], [True, False, False], 1).to_pandas()
    p1, p2 = str(top["w1"][0]), str(top["w2"][0])

    def occ_per_doc(t: pa.Table, *, _p1=p1, _p2=p2) -> pd.DataFrame:
        vals, off, internal = _doc_word_pairs(t)
        L = len(vals)
        n = len(off) - 1
        hit = np.zeros(L + 1, dtype=np.int64)
        if L >= 2:
            m1 = pc.equal(vals.slice(0, L - 1), _p1).to_numpy(zero_copy_only=False)
            m2 = pc.equal(vals.slice(1, L - 1), _p2).to_numpy(zero_copy_only=False)
            hit[: L - 1] = (m1 & m2 & internal).astype(np.int64)
        cnt = (
            np.add.reduceat(hit, off[:-1])
            if n
            else np.array([], np.int64)
        )
        cnt[off[:-1] == off[1:]] = 0
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out = pd.DataFrame({"doc_id": ids, "n_occ": cnt})
        return out[out["n_occ"] > 0]

    occ = ds.map_batches(occ_per_doc, batch_format="pyarrow", zero_copy_batch=True)
    out = topk(occ, ["n_occ", "doc_id"], [True, False], 10).to_pandas()
    out["w1"] = p1
    out["w2"] = p2
    return _i64(out, ["doc_id", "n_occ"]).reset_index(drop=True)


SQL_PHRASE_SEARCH = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
pairs AS (
  SELECT doc_id, ws[g.i] AS w1, ws[g.i + 1] AS w2
  FROM w, unnest(generate_series(1, len(ws) - 1)) AS g(i)),
bg AS (SELECT w1, w2, COUNT(*) AS c FROM pairs GROUP BY 1, 2),
top AS (SELECT w1, w2 FROM bg ORDER BY c DESC, w1, w2 LIMIT 1),
occ AS (
  SELECT p.doc_id, COUNT(*) AS n_occ
  FROM pairs p JOIN top t ON p.w1 = t.w1 AND p.w2 = t.w2
  GROUP BY 1)
SELECT o.doc_id, o.n_occ, t.w1, t.w2
FROM occ o CROSS JOIN top t
ORDER BY o.n_occ DESC, o.doc_id LIMIT 10
"""


_DIGEST_MOD = 1 << 40  # 10 md5-hex chars; headroom: ~8M partials before int64 overflow


def q_partition_digest(sf_dir: str) -> pd.DataFrame:
    """Anti-entropy partition digests (the Merkle/Cassandra reconciliation
    primitive reduced to its mergeable core): every row canonicalizes to
    user_id|event_id|epoch_us|type|cents, hashes with md5, and each of 16
    user-hash shards keeps (row count, sum of 40-bit md5 prefixes mod 2^40)
    — an order-independent, MERGEABLE digest, so two replicas (or two
    engines) compare tables by exchanging 16 tiny rows instead of data.
    Per-batch combiners fold locally (uint64 wraparound is exact mod 2^40
    because 2^40 | 2^64); only 16-row partials reach the exchange."""
    ds = _t(sf_dir, "events", ["user_id", "event_id", "ts", "event_type", "value"])

    def part(t: pa.Table) -> pd.DataFrame:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        micros = pc.cast(t["ts"], pa.int64())
        cents = _rd(t["value"].to_numpy(zero_copy_only=False) * 100.0, 0).astype(
            np.int64
        )
        strs = pc.binary_join_element_wise(
            pc.cast(t["user_id"], pa.string()),
            pc.cast(t["event_id"], pa.string()),
            pc.cast(micros, pa.string()),
            t["event_type"],
            pc.cast(pa.array(cents), pa.string()),
            "|",
        )
        h = np.array(
            [int(x[:10], 16) for x in md5_hex(strs).to_pylist()], dtype=np.uint64
        )
        shard = (uid % 16).astype(np.int64)
        sums = np.zeros(16, np.uint64)
        np.add.at(sums, shard, h)
        cnts = np.bincount(shard, minlength=16)
        keep = cnts > 0
        return pd.DataFrame(
            {
                "shard": np.arange(16, dtype=np.int64)[keep],
                "n": cnts[keep].astype(np.int64),
                "digest": (sums[keep] % np.uint64(_DIGEST_MOD)).astype(np.int64),
            }
        )

    parts = grouped_sums(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["shard"],
        {"n": "n", "digest": "digest"},
    ).to_pandas()
    parts["digest"] = parts["digest"] % _DIGEST_MOD
    out = parts.sort_values("shard", ignore_index=True)
    return _i64(out, ["shard", "n", "digest"])


SQL_PARTITION_DIGEST = f"""
WITH hexd(ch, v) AS (VALUES ('0',0),('1',1),('2',2),('3',3),('4',4),('5',5),
                            ('6',6),('7',7),('8',8),('9',9),('a',10),('b',11),
                            ('c',12),('d',13),('e',14),('f',15)),
rows AS (
  SELECT CAST(user_id % 16 AS BIGINT) AS shard, event_id,
         md5(CONCAT(CAST(user_id AS VARCHAR), '|', CAST(event_id AS VARCHAR), '|',
                    CAST(epoch_us(ts) AS VARCHAR), '|', event_type, '|',
                    CAST(CAST(ROUND(value * 100, 0) AS BIGINT) AS VARCHAR))) AS hx
  FROM events),
hv AS (
  SELECT shard, event_id,
         SUM(hexd.v * (CAST(1 AS BIGINT) << (4 * (10 - g.i)))) AS h
  FROM rows, generate_series(1, 10) AS g(i)
  JOIN hexd ON hexd.ch = substr(hx, g.i, 1)
  GROUP BY shard, event_id)
SELECT shard, COUNT(*) AS n, CAST(SUM(h) % {_DIGEST_MOD} AS BIGINT) AS digest
FROM hv GROUP BY shard ORDER BY shard
"""


def q_label_propagation(sf_dir: str) -> pd.DataFrame:
    """Community/component seeding by 4 rounds of synchronous min-label
    propagation over the co-purchase graph (functions/graph.py::
    label_propagation_min — broadcast label map, per-batch min combiners);
    after k rounds each part's label is the smallest part id within k hops.
    Reports the 15 largest label groups."""
    from ..functions.graph import label_propagation_min

    edges = _copurchase_weighted_edges(sf_dir).map_batches(
        lambda t: pa.table({"src": t["src"], "dst": t["dst"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    _, per_round = label_propagation_min(edges, rounds=4, trace=True)
    rows = []
    for r, lab in enumerate(per_round, start=1):
        _, csize = np.unique(lab, return_counts=True)
        rows.append(
            (r, len(csize), int(lab.sum()), int(csize.max()))
        )
    out = pd.DataFrame(rows, columns=["round", "n_labels", "lbl_sum", "max_csize"])
    return _i64(out, ["round", "n_labels", "lbl_sum", "max_csize"])


SQL_LABEL_PROPAGATION = """
WITH pairs AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON b.l_orderkey = a.l_orderkey AND a.l_partkey <> b.l_partkey),
n0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lbl FROM pairs),
r1 AS MATERIALIZED (SELECT e.src AS node, LEAST(MIN(n.lbl), MIN(m.lbl)) AS lbl
       FROM pairs e JOIN n0 n ON n.node = e.src JOIN n0 m ON m.node = e.dst
       GROUP BY e.src),
r2 AS MATERIALIZED (SELECT e.src AS node, LEAST(MIN(n.lbl), MIN(m.lbl)) AS lbl
       FROM pairs e JOIN r1 n ON n.node = e.src JOIN r1 m ON m.node = e.dst
       GROUP BY e.src),
r3 AS MATERIALIZED (SELECT e.src AS node, LEAST(MIN(n.lbl), MIN(m.lbl)) AS lbl
       FROM pairs e JOIN r2 n ON n.node = e.src JOIN r2 m ON m.node = e.dst
       GROUP BY e.src),
r4 AS MATERIALIZED (SELECT e.src AS node, LEAST(MIN(n.lbl), MIN(m.lbl)) AS lbl
       FROM pairs e JOIN r3 n ON n.node = e.src JOIN r3 m ON m.node = e.dst
       GROUP BY e.src),
stats AS (
  SELECT 1 AS round, lbl FROM r1 UNION ALL
  SELECT 2, lbl FROM r2 UNION ALL
  SELECT 3, lbl FROM r3 UNION ALL
  SELECT 4, lbl FROM r4),
grp AS (SELECT round, lbl, COUNT(*) AS csize FROM stats GROUP BY 1, 2)
SELECT round, COUNT(*) AS n_labels, CAST(SUM(lbl * csize) AS BIGINT) AS lbl_sum,
       MAX(csize) AS max_csize
FROM grp GROUP BY round ORDER BY round
"""


# ---------------------------------------------------------------------------
# Wave 16: expectation suite, degree assortativity, JL projection audit,
# successive halving
# ---------------------------------------------------------------------------

# Great-Expectations-style declarative rule registry (extension surface:
# rules are DATA, adding one is a tuple, not a code path).
_EXPECTATION_TYPES = ["view", "click", "purchase", "signup", "error"]
_EXPECTATION_STATUSES = ["O", "F", "P"]


def q_expectation_audit(sf_dir: str) -> pd.DataFrame:
    """Declarative data-quality expectation suite (the Great-Expectations
    pattern): 8 rules — range, accepted-values, uniqueness, format and
    referential integrity — over events/orders/lineitem, each reporting its
    violation count and pass flag.  One vectorized pass per table computes
    every same-table rule as combiner partials; uniqueness is an exact
    distinct via one (event_id)-count exchange collapsed to a scalar; the
    FK rule broadcasts the bounded orders keyset (above ~2M keys the
    bloom_anti_join path in functions/relational.py takes over)."""
    import ray as _ray

    ev = _t(sf_dir, "events", ["event_id", "event_type", "value", "props"])

    def ev_part(t: pa.Table) -> pd.DataFrame:
        val = t["value"].to_numpy(zero_copy_only=False)
        typ = t["event_type"]
        props = t["props"]
        bad_range = int(((val < -1000.0) | (val > 100000.0)).sum())
        bad_type = int(
            pc.sum(
                pc.invert(pc.is_in(typ, value_set=pa.array(_EXPECTATION_TYPES)))
            ).as_py()
            or 0
        )
        bad_json = int(
            pc.sum(pc.invert(pc.starts_with(props, "{"))).as_py() or 0
        )
        return pd.DataFrame(
            {"bad_range": [bad_range], "bad_type": [bad_type],
             "bad_json": [bad_json], "n": [len(t)]}
        )

    evp = ev.map_batches(ev_part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    n_events = int(evp["n"].sum())
    distinct_ids = grouped_sums(ev, ["event_id"], {}, "c").count()
    dup_violations = n_events - int(distinct_ids)

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_totalprice"])

    def ord_part(t: pa.Table) -> pd.DataFrame:
        price = t["o_totalprice"].to_numpy(zero_copy_only=False)
        bad_price = int((price <= 0.0).sum())
        bad_status = int(
            pc.sum(
                pc.invert(
                    pc.is_in(t["o_orderstatus"], value_set=pa.array(_EXPECTATION_STATUSES))
                )
            ).as_py()
            or 0
        )
        return pd.DataFrame({"bad_price": [bad_price], "bad_status": [bad_status]})

    orp = orders.map_batches(ord_part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()

    okeys = np.unique(
        orders.map_batches(
            lambda t: pa.table({"k": pc.unique(t["o_orderkey"])}),
            batch_format="pyarrow", zero_copy_batch=True,
        ).to_pandas()["k"].to_numpy(np.int64)
    )
    okeys_ref = _ray.put(okeys)

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def li_part(t: pa.Table, *, _ref=okeys_ref) -> pd.DataFrame:
        keys = _ray.get(_ref)
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.minimum(np.searchsorted(keys, ok), len(keys) - 1)
        bad_fk = int((keys[idx] != ok).sum())
        q = t["l_quantity"].to_numpy(zero_copy_only=False)
        bad_qty = int(((q < 1.0) | (q > 50.0)).sum())
        return pd.DataFrame({"bad_fk": [bad_fk], "bad_qty": [bad_qty]})

    lip = li.map_batches(li_part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()

    rows = [
        ("events_value_range", "events", "range", int(evp["bad_range"].sum())),
        ("events_type_domain", "events", "accepted_values", int(evp["bad_type"].sum())),
        ("events_id_unique", "events", "unique", dup_violations),
        ("events_props_json", "events", "format", int(evp["bad_json"].sum())),
        ("orders_price_positive", "orders", "range", int(orp["bad_price"].sum())),
        ("orders_status_domain", "orders", "accepted_values", int(orp["bad_status"].sum())),
        ("lineitem_fk_orders", "lineitem", "referential", int(lip["bad_fk"].sum())),
        ("lineitem_qty_range", "lineitem", "range", int(lip["bad_qty"].sum())),
    ]
    out = pd.DataFrame(rows, columns=["rule_id", "table_name", "rule_type", "violations"])
    out["passed"] = (out["violations"] == 0).astype("int64")
    return _i64(out, ["violations", "passed"])


SQL_EXPECTATION_AUDIT = """
SELECT 'events_value_range' AS rule_id, 'events' AS table_name, 'range' AS rule_type,
       CAST(SUM(CASE WHEN value < -1000 OR value > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS violations
FROM events
UNION ALL
SELECT 'events_type_domain', 'events', 'accepted_values',
       CAST(SUM(CASE WHEN event_type NOT IN ('view','click','purchase','signup','error')
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM events
UNION ALL
SELECT 'events_id_unique', 'events', 'unique',
       CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT)
FROM events
UNION ALL
SELECT 'events_props_json', 'events', 'format',
       CAST(SUM(CASE WHEN props NOT LIKE '{%' THEN 1 ELSE 0 END) AS BIGINT)
FROM events
UNION ALL
SELECT 'orders_price_positive', 'orders', 'range',
       CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orders_status_domain', 'orders', 'accepted_values',
       CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'lineitem_fk_orders', 'lineitem', 'referential',
       CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem LEFT JOIN orders ON o_orderkey = l_orderkey
UNION ALL
SELECT 'lineitem_qty_range', 'lineitem', 'range',
       CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
"""
SQL_EXPECTATION_AUDIT = f"""
WITH rules AS ({SQL_EXPECTATION_AUDIT})
SELECT rule_id, table_name, rule_type, violations,
       CASE WHEN violations = 0 THEN 1 ELSE 0 END AS passed
FROM rules ORDER BY rule_id
"""


def q_degree_assortativity(sf_dir: str) -> pd.DataFrame:
    """Degree assortativity (Newman 2002) of the co-purchase graph: Pearson
    correlation of endpoint degrees over all directed (symmetrized) edges.
    Degrees come from one bounded grouped count; the |V|-sized degree map
    broadcasts into a single edge scan that emits INTEGER moment partials
    (n, Σx, Σy, Σxy, Σx², Σy²); the driver folds them in arbitrary-precision
    ints and closes the correlation in the same double expression the SQL
    oracle evaluates — no float ever crosses the exchange."""
    import math

    import ray as _ray

    edges = _copurchase_weighted_edges(sf_dir).materialize()
    deg = grouped_sums(edges, ["src"], {}, "deg").to_pandas()
    nodes = deg["src"].to_numpy(np.int64)
    order = np.argsort(nodes)
    ref = _ray.put((nodes[order], deg["deg"].to_numpy(np.int64)[order]))

    def part(t: pa.Table, *, _ref=ref) -> pd.DataFrame:
        keys, dv = _ray.get(_ref)
        x = dv[np.searchsorted(keys, t["src"].to_numpy(zero_copy_only=False))]
        y = dv[np.searchsorted(keys, t["dst"].to_numpy(zero_copy_only=False))]
        return pd.DataFrame(
            {"n": [len(x)], "sx": [int(x.sum())], "sy": [int(y.sum())],
             "sxy": [int((x * y).sum())], "sxx": [int((x * x).sum())],
             "syy": [int((y * y).sum())]}
        )

    p = edges.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    n = int(p["n"].sum())
    sx, sy = int(p["sx"].sum()), int(p["sy"].sum())
    sxy, sxx, syy = int(p["sxy"].sum()), int(p["sxx"].sum()), int(p["syy"].sum())
    num = float(n) * float(sxy) - float(sx) * float(sy)
    den = math.sqrt(float(n) * float(sxx) - float(sx) * float(sx)) * math.sqrt(
        float(n) * float(syy) - float(sy) * float(sy)
    )
    r = 0.0 if den == 0.0 else num / den
    out = pd.DataFrame(
        {"n_edges": [n], "mean_deg": [_rd(float(sx) / float(n), 6)],
         "assortativity": [_rd(r, 6)]}
    )
    return _i64(out, ["n_edges"])


SQL_DEGREE_ASSORTATIVITY = """
WITH pairs AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON b.l_orderkey = a.l_orderkey AND a.l_partkey <> b.l_partkey),
deg AS (SELECT src AS node, CAST(COUNT(*) AS HUGEINT) AS deg FROM pairs GROUP BY 1),
j AS (SELECT ds.deg AS x, dd.deg AS y
      FROM pairs e JOIN deg ds ON ds.node = e.src JOIN deg dd ON dd.node = e.dst),
s AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM j)
SELECT CAST(n AS BIGINT) AS n_edges,
       ROUND(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_deg,
       CASE WHEN (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) = 0
            THEN 0.0
            ELSE ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
       END AS assortativity
FROM s
"""


_JL_K = 16
_JL_BUCKETS = ["zero", "lt_0.5", "0.5-0.8", "0.8-1.25", "1.25-2", "ge_2"]


def _jl_sign_matrix(d: int) -> np.ndarray:
    """Deterministic ±1 sign matrix (d × k) from an integer hash of (i, j)
    — the Achlioptas 2003 database-friendly JL projection, reproducible on
    both engines without shipping a matrix."""
    i = np.arange(1, d + 1, dtype=np.int64)[:, None]
    j = np.arange(1, _JL_K + 1, dtype=np.int64)[None, :]
    h = ((i * 1000003 + j * 8191) * 2654435761) % 2147483647
    return np.where(h % 2 == 0, 1, -1).astype(np.int64)


def q_jl_projection_audit(sf_dir: str) -> pd.DataFrame:
    """Johnson-Lindenstrauss projection distortion audit, integer-exact:
    embeddings quantize to µ-ints (floor(v·1000)), project through the
    deterministic ±1 sign matrix (one int matmul per batch, k=16), and
    consecutive vec-id pairs compare projected vs original squared
    distances — E[‖Sx‖²] = k‖x‖², so the ratio proj/(k·orig) buckets by
    INTEGER cross-multiplication (no float ever computed).  Pairs co-locate
    via one bucketed exchange on pair-id carrying only (q, proj) int rows;
    the distortion histogram is the only thing that reduces."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])

    def per_vec(t: pa.Table) -> pd.DataFrame:
        arr = t["embedding"].combine_chunks()
        mat = np.asarray(arr.flatten(), dtype=np.float64).reshape(len(t), -1)
        q = np.floor(mat * 1000.0).astype(np.int64)
        s = _jl_sign_matrix(q.shape[1])
        proj = q @ s
        vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame(
            {"pair_id": vid // 2, "vec_id": vid,
             "q": list(q), "p": list(proj)}
        )

    rows = ds.map_batches(per_vec, batch_format="pyarrow", zero_copy_batch=True)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["pair_id", "vec_id"], ignore_index=True)
        sizes = df.groupby("pair_id", sort=False)["vec_id"].transform("size")
        df = df[sizes == 2]
        if df.empty:
            return pd.DataFrame(
                {"bucket": pd.Series([], dtype=object),
                 "n_pairs": pd.Series([], dtype="int64"),
                 "sum_proj_d2": pd.Series([], dtype="int64"),
                 "sum_orig_d2": pd.Series([], dtype="int64")}
            )
        qm = np.stack(df["q"].to_numpy())
        pm = np.stack(df["p"].to_numpy())
        qa, qb = qm[0::2], qm[1::2]
        pa_, pb = pm[0::2], pm[1::2]
        orig = ((qa - qb) ** 2).sum(axis=1)
        proj = ((pa_ - pb) ** 2).sum(axis=1)
        k = np.int64(_JL_K)
        bucket = np.select(
            [orig == 0, 2 * proj < k * orig, 5 * proj < 4 * k * orig,
             4 * proj < 5 * k * orig, proj < 2 * k * orig],
            _JL_BUCKETS[:5],
            default=_JL_BUCKETS[5],
        )
        out = pd.DataFrame({"bucket": bucket, "n_pairs": 1,
                            "sum_proj_d2": proj, "sum_orig_d2": orig})
        return out.groupby("bucket", as_index=False).sum()

    hist = grouped_sums(
        bucketed_group_reduce(rows, ["pair_id"], per_bucket, num_buckets=32),
        ["bucket"],
        {"n_pairs": "n_pairs", "sum_proj_d2": "sum_proj_d2", "sum_orig_d2": "sum_orig_d2"},
    ).to_pandas()
    out = hist.sort_values("bucket", ignore_index=True)
    return _i64(out, ["n_pairs", "sum_proj_d2", "sum_orig_d2"])


SQL_JL_PROJECTION_AUDIT = f"""
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(FLOOR(CAST(UNNEST(embedding) AS DOUBLE) * 1000) AS BIGINT) AS qv
  FROM embeddings),
proj AS (
  SELECT vec_id, g.j,
         SUM(qv * (CASE WHEN ((i * 1000003 + g.j * 8191) * 2654435761)
                             % 2147483647 % 2 = 0 THEN 1 ELSE -1 END)) AS p
  FROM q, generate_series(1, {_JL_K}) AS g(j)
  GROUP BY 1, 2),
pd2 AS (
  SELECT a.vec_id AS va, SUM((a.p - b.p) * (a.p - b.p)) AS proj_d2
  FROM proj a JOIN proj b ON b.vec_id = a.vec_id + 1 AND a.vec_id % 2 = 0
                          AND b.j = a.j
  GROUP BY 1),
od2 AS (
  SELECT a.vec_id AS va, SUM((a.qv - b.qv) * (a.qv - b.qv)) AS orig_d2
  FROM q a JOIN q b ON b.vec_id = a.vec_id + 1 AND a.vec_id % 2 = 0
                    AND b.i = a.i
  GROUP BY 1),
pairs AS (
  SELECT p.proj_d2, o.orig_d2 FROM pd2 p JOIN od2 o ON o.va = p.va),
lab AS (
  SELECT CASE WHEN orig_d2 = 0 THEN 'zero'
              WHEN 2 * proj_d2 < {_JL_K} * orig_d2 THEN 'lt_0.5'
              WHEN 5 * proj_d2 < 4 * {_JL_K} * orig_d2 THEN '0.5-0.8'
              WHEN 4 * proj_d2 < 5 * {_JL_K} * orig_d2 THEN '0.8-1.25'
              WHEN proj_d2 < 2 * {_JL_K} * orig_d2 THEN '1.25-2'
              ELSE 'ge_2' END AS bucket,
         proj_d2, orig_d2
  FROM pairs)
SELECT bucket, COUNT(*) AS n_pairs,
       CAST(SUM(proj_d2) AS BIGINT) AS sum_proj_d2,
       CAST(SUM(orig_d2) AS BIGINT) AS sum_orig_d2
FROM lab GROUP BY 1 ORDER BY bucket
"""


_SH_START = 16
_SH_ROUNDS = 4
_SH_WEEK_US = 7 * 86_400_000_000


def q_successive_halving(sf_dir: str) -> pd.DataFrame:
    """Successive-halving replay (Jamieson & Talwalkar 2016, the Hyperband
    inner loop) over the event stream: the 16 most active users are the
    arms; at round r each survivor's metric is its cumulative purchase
    cents over the first r weeks, and the best half survives (ties to the
    smaller user id).  The corpus reduces ONCE to per-(user, week) cent
    partials plus per-user counts — one bounded combiner exchange — and the
    halving replays driver-side over ≤16 rows; integer cents keep every
    comparison exact."""
    ds = _t(sf_dir, "events", ["user_id", "ts", "event_type", "value"])
    t0 = int(
        ds.map_batches(
            lambda t: pa.table({"m": pa.array([pc.min(pc.cast(t["ts"], pa.int64())).as_py()], pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True,
        ).to_pandas()["m"].min()
    )

    def part(t: pa.Table, *, _t0=t0) -> pd.DataFrame:
        micros = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        wk = (micros - _t0) // _SH_WEEK_US
        cents = _rd(t["value"].to_numpy(zero_copy_only=False) * 100.0, 0).astype(np.int64)
        is_p = pc.equal(t["event_type"], "purchase").to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame(
            {"user_id": uid, "wk": wk,
             "cents": np.where(is_p, cents, 0), "n_events": 1}
        )
        return df.groupby(["user_id", "wk"], as_index=False).sum()

    byweek = grouped_sums(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id", "wk"],
        {"cents": "cents", "n_events": "n_events"},
    ).to_pandas()

    totals = byweek.groupby("user_id", as_index=False)["n_events"].sum()
    arms = (
        totals.sort_values(["n_events", "user_id"], ascending=[False, True])
        .head(_SH_START)["user_id"]
        .to_numpy(np.int64)
    )
    survivors = set(arms.tolist())
    rows = []
    for r in range(1, _SH_ROUNDS + 1):
        w = byweek[(byweek["wk"] < r) & byweek["user_id"].isin(survivors)]
        met = w.groupby("user_id")["cents"].sum().to_dict()
        scored = sorted(
            ((int(met.get(u, 0)), u) for u in survivors),
            key=lambda t: (-t[0], t[1]),
        )
        keep = _SH_START >> r
        scored = scored[:keep]
        survivors = {u for _, u in scored}
        rows.append(
            (r, len(scored), sum(u for _, u in scored),
             min(m for m, _ in scored), max(m for m, _ in scored))
        )
    out = pd.DataFrame(
        rows, columns=["round", "n_survivors", "survivor_id_sum", "min_metric", "max_metric"]
    )
    return _i64(out, ["round", "n_survivors", "survivor_id_sum", "min_metric", "max_metric"])


SQL_SUCCESSIVE_HALVING = f"""
WITH mn AS (SELECT MIN(epoch_us(ts)) AS t0 FROM events),
ev AS (
  SELECT user_id,
         (epoch_us(ts) - (SELECT t0 FROM mn)) // {_SH_WEEK_US} AS wk,
         CASE WHEN event_type = 'purchase'
              THEN CAST(ROUND(value * 100, 0) AS BIGINT) ELSE 0 END AS cents
  FROM events),
s0 AS (SELECT user_id FROM ev GROUP BY 1
       ORDER BY COUNT(*) DESC, user_id LIMIT {_SH_START}),
m1 AS (SELECT s.user_id,
              COALESCE(SUM(CASE WHEN e.wk < 1 THEN e.cents END), 0) AS met
       FROM s0 s LEFT JOIN ev e ON e.user_id = s.user_id GROUP BY 1),
s1 AS (SELECT user_id, met FROM m1 ORDER BY met DESC, user_id LIMIT {_SH_START >> 1}),
m2 AS (SELECT s.user_id,
              COALESCE(SUM(CASE WHEN e.wk < 2 THEN e.cents END), 0) AS met
       FROM s1 s LEFT JOIN ev e ON e.user_id = s.user_id GROUP BY 1),
s2 AS (SELECT user_id, met FROM m2 ORDER BY met DESC, user_id LIMIT {_SH_START >> 2}),
m3 AS (SELECT s.user_id,
              COALESCE(SUM(CASE WHEN e.wk < 3 THEN e.cents END), 0) AS met
       FROM s2 s LEFT JOIN ev e ON e.user_id = s.user_id GROUP BY 1),
s3 AS (SELECT user_id, met FROM m3 ORDER BY met DESC, user_id LIMIT {_SH_START >> 3}),
m4 AS (SELECT s.user_id,
              COALESCE(SUM(CASE WHEN e.wk < 4 THEN e.cents END), 0) AS met
       FROM s3 s LEFT JOIN ev e ON e.user_id = s.user_id GROUP BY 1),
s4 AS (SELECT user_id, met FROM m4 ORDER BY met DESC, user_id LIMIT {_SH_START >> 4})
SELECT 1 AS round, COUNT(*) AS n_survivors, CAST(SUM(user_id) AS BIGINT) AS survivor_id_sum,
       CAST(MIN(met) AS BIGINT) AS min_metric, CAST(MAX(met) AS BIGINT) AS max_metric FROM s1
UNION ALL
SELECT 2, COUNT(*), CAST(SUM(user_id) AS BIGINT), CAST(MIN(met) AS BIGINT), CAST(MAX(met) AS BIGINT) FROM s2
UNION ALL
SELECT 3, COUNT(*), CAST(SUM(user_id) AS BIGINT), CAST(MIN(met) AS BIGINT), CAST(MAX(met) AS BIGINT) FROM s3
UNION ALL
SELECT 4, COUNT(*), CAST(SUM(user_id) AS BIGINT), CAST(MIN(met) AS BIGINT), CAST(MAX(met) AS BIGINT) FROM s4
ORDER BY round
"""


# ---------------------------------------------------------------------------
# Wave 17: sorted-adjacent LCP audit (suffix-array-style dedup prefilter),
# Bradley-Terry preference scoring
# ---------------------------------------------------------------------------


def q_adjacent_lcp_audit(sf_dir: str) -> pd.DataFrame:
    """Sorted-adjacent longest-common-prefix audit — the suffix-array-style
    dedup prefilter: sort the corpus by text (exact distributed ROW_NUMBER,
    rank.py's range-bucket construction), pair every document with its
    lexicographic neighbour, and histogram the word-level LCP.  Near-copies
    and shared boilerplate openings surface as long-LCP pairs without any
    all-pairs work — one rank exchange plus one pair-id exchange where each
    row rides in exactly two pairs.  The per-pair scan is expected O(1):
    random neighbours mismatch at the first word, so total compare work is
    O(pairs + Σ true-LCP), the same bound suffix-array dedup relies on."""
    from ..functions.rank import global_row_number
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    ranked, total = global_row_number(ds, "text", ["doc_id"])

    def fanout(df: pd.DataFrame) -> pd.DataFrame:
        rn = df["rn"].to_numpy(np.int64)
        left = df.assign(pair=rn)
        right = df.assign(pair=rn - 1)
        out = pd.concat([left, right], ignore_index=True)
        out = out[(out["pair"] >= 1) & (out["pair"] <= total - 1)]
        return out[["pair", "rn", "doc_id", "text"]]

    pairs = ranked.map_batches(fanout, batch_format="pandas")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["pair", "rn"], ignore_index=True)
        texts = df["text"].to_numpy()
        lcps = np.zeros(len(df) // 2, dtype=np.int64)
        for p in range(0, len(df), 2):
            a = texts[p].split(" ")
            b = texts[p + 1].split(" ")
            m = min(len(a), len(b))
            l = 0
            while l < m and a[l] == b[l]:
                l += 1
            lcps[p // 2] = l
        bucket = np.select(
            [lcps == 0, lcps <= 2, lcps <= 4, lcps <= 8],
            ["0", "1-2", "3-4", "5-8"],
            default="9+",
        )
        out = pd.DataFrame({"bucket": bucket, "n_pairs": 1, "sum_lcp": lcps})
        return out.groupby("bucket", as_index=False).sum()

    hist = grouped_sums(
        bucketed_group_reduce(pairs, ["pair"], per_bucket, num_buckets=32),
        ["bucket"],
        {"n_pairs": "n_pairs", "sum_lcp": "sum_lcp"},
    ).to_pandas()
    out = hist.sort_values("bucket", ignore_index=True)
    return _i64(out, ["n_pairs", "sum_lcp"])


SQL_ADJACENT_LCP_AUDIT = """
WITH s AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         LAG(doc_id) OVER (ORDER BY text, doc_id) AS pid,
         LAG(string_split(text, ' ')) OVER (ORDER BY text, doc_id) AS pws
  FROM documents),
p AS (SELECT pid AS doc_a, doc_id AS doc_b, pws, ws FROM s WHERE pid IS NOT NULL),
l AS (
  SELECT doc_a, doc_b,
         COALESCE(MIN(CASE WHEN ws[g.i] IS DISTINCT FROM pws[g.i] THEN g.i END) - 1,
                  MIN(LEAST(len(ws), len(pws)))) AS lcp
  FROM p, unnest(generate_series(1, GREATEST(len(ws), len(pws)))) AS g(i)
  GROUP BY 1, 2)
SELECT CASE WHEN lcp = 0 THEN '0' WHEN lcp <= 2 THEN '1-2'
            WHEN lcp <= 4 THEN '3-4' WHEN lcp <= 8 THEN '5-8'
            ELSE '9+' END AS bucket,
       COUNT(*) AS n_pairs, CAST(SUM(lcp) AS BIGINT) AS sum_lcp
FROM l GROUP BY 1 ORDER BY bucket
"""


_BT_MU = 10**6
_BT_SCALE = 10**12


def q_bradley_terry_step(sf_dir: str) -> pd.DataFrame:
    """Bradley-Terry preference scoring (the RLHF reward-model data
    primitive) with INTEGER-exact fixed-point iterations: within each order,
    every part pair is a match won by the higher total quantity (ties to the
    smaller part id); two minorize-maximize updates
    ``p_i ← W_i / Σ_j N_ij/(p_i+p_j)`` run in µ-quantized integer arithmetic
    (c_ij = N_ij·10¹²//(u_i+u_j), u'_i = W_i·10¹²//Σc — every division is
    integer, so both engines agree bit-for-bit).  Matches reduce via one
    order-bucketed exchange to (i,j,wins,n) combiners; the ≤|parts|²-bounded
    pair table iterates driver-side.  Top-15 parts by strength."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_quantity"])

    def per_order(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["l_orderkey", "l_partkey"], as_index=False)["l_quantity"].sum()
        g["q"] = g["l_quantity"].astype(np.int64)
        m = g.merge(g, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        if m.empty:
            return pd.DataFrame(
                {"i": pd.Series([], dtype="int64"), "j": pd.Series([], dtype="int64"),
                 "wi": pd.Series([], dtype="int64"), "n": pd.Series([], dtype="int64")}
            )
        out = pd.DataFrame(
            {"i": m["l_partkey_x"].to_numpy(np.int64),
             "j": m["l_partkey_y"].to_numpy(np.int64),
             "wi": (m["q_x"].to_numpy(np.int64) >= m["q_y"].to_numpy(np.int64)).astype(np.int64),
             "n": 1}
        )
        return out.groupby(["i", "j"], as_index=False).sum()

    pr = grouped_sums(
        bucketed_group_reduce(ds, ["l_orderkey"], per_order),
        ["i", "j"],
        {"wi": "wi", "n": "n"},
    ).to_pandas()

    i = pr["i"].to_numpy(np.int64)
    j = pr["j"].to_numpy(np.int64)
    wi = pr["wi"].to_numpy(np.int64)
    n = pr["n"].to_numpy(np.int64)
    parts = np.unique(np.concatenate([i, j]))
    ii = np.searchsorted(parts, i)
    jj = np.searchsorted(parts, j)
    wins = np.zeros(len(parts), np.int64)
    matches = np.zeros(len(parts), np.int64)
    np.add.at(wins, ii, wi)
    np.add.at(wins, jj, n - wi)
    np.add.at(matches, ii, n)
    np.add.at(matches, jj, n)

    # The oracle runs the MM updates in HUGEINT; int64 holds only while
    # max(wins, n)·_BT_SCALE < 2^63 (~9.2M matches per part/pair).  Above that
    # switch to Python-int object arrays — same floor-division semantics,
    # arbitrary precision, bit-equal to the HUGEINT oracle.
    _hi = max(int(wins.max(initial=0)), int(n.max(initial=0)))
    _dt = np.int64 if _hi * _BT_SCALE < 2**63 else object
    wins_w = wins.astype(_dt) if _dt is np.int64 else np.array([int(v) for v in wins], object)
    n_w = n.astype(_dt) if _dt is np.int64 else np.array([int(v) for v in n], object)
    u = np.full(len(parts), _BT_MU, dtype=_dt)
    for _ in range(2):
        c = (n_w * _BT_SCALE) // (u[ii] + u[jj])
        s = np.zeros(len(parts), _dt)
        np.add.at(s, ii, c)
        np.add.at(s, jj, c)
        u = np.maximum((wins_w * _BT_SCALE) // s, 1)
    u = u.astype(np.int64)

    order = np.lexsort((parts, -u))[:15]
    out = pd.DataFrame(
        {"part": parts[order], "wins": wins[order], "matches": matches[order],
         "score": u[order]}
    )
    return _i64(out, ["part", "wins", "matches", "score"])


SQL_BRADLEY_TERRY_STEP = f"""
WITH pq AS (
  SELECT l_orderkey AS ok, l_partkey AS pk, CAST(SUM(l_quantity) AS BIGINT) AS q
  FROM lineitem GROUP BY 1, 2),
pr AS (
  SELECT a.pk AS i, b.pk AS j,
         SUM(CASE WHEN a.q >= b.q THEN 1 ELSE 0 END) AS wi, COUNT(*) AS n
  FROM pq a JOIN pq b ON b.ok = a.ok AND a.pk < b.pk
  GROUP BY 1, 2),
w AS (
  SELECT pk, CAST(SUM(wv) AS HUGEINT) AS wins, CAST(SUM(n) AS HUGEINT) AS matches
  FROM (SELECT i AS pk, wi AS wv, n FROM pr
        UNION ALL SELECT j, n - wi, n FROM pr)
  GROUP BY 1),
u0 AS (SELECT pk, CAST({_BT_MU} AS HUGEINT) AS u FROM w),
c1 AS (SELECT p.i, p.j, (p.n * CAST({_BT_SCALE} AS HUGEINT)) // (ua.u + ub.u) AS c
       FROM pr p JOIN u0 ua ON ua.pk = p.i JOIN u0 ub ON ub.pk = p.j),
s1 AS (SELECT pk, SUM(c) AS s
       FROM (SELECT i AS pk, c FROM c1 UNION ALL SELECT j, c FROM c1) GROUP BY 1),
u1 AS (SELECT w.pk, GREATEST((w.wins * CAST({_BT_SCALE} AS HUGEINT)) // s1.s,
                             CAST(1 AS HUGEINT)) AS u
       FROM w JOIN s1 ON s1.pk = w.pk),
c2 AS (SELECT p.i, p.j, (p.n * CAST({_BT_SCALE} AS HUGEINT)) // (ua.u + ub.u) AS c
       FROM pr p JOIN u1 ua ON ua.pk = p.i JOIN u1 ub ON ub.pk = p.j),
s2 AS (SELECT pk, SUM(c) AS s
       FROM (SELECT i AS pk, c FROM c2 UNION ALL SELECT j, c FROM c2) GROUP BY 1),
u2 AS (SELECT w.pk, GREATEST((w.wins * CAST({_BT_SCALE} AS HUGEINT)) // s2.s,
                             CAST(1 AS HUGEINT)) AS u
       FROM w JOIN s2 ON s2.pk = w.pk)
SELECT w.pk AS part, CAST(w.wins AS BIGINT) AS wins,
       CAST(w.matches AS BIGINT) AS matches, CAST(u2.u AS BIGINT) AS score
FROM w JOIN u2 ON u2.pk = w.pk
ORDER BY u2.u DESC, w.pk LIMIT 15
"""


# ---------------------------------------------------------------------------
# Wave 18: DeepWalk-style walk-corpus generation, Pareto layer peeling
# ---------------------------------------------------------------------------

_WALK_STARTS = 16
_WALK_STEPS = 4
_WALK_P = 2147483647


def _walk_pick(start: int, node: int, t: int, deg: int) -> int:
    """Deterministic neighbor rank for step t of the walk from ``start``
    sitting at ``node`` — the hash chain both engines evaluate identically
    in exact integer arithmetic."""
    h = ((start * 1000003 + node * 8191 + t * 131) % _WALK_P) * 2654435761 % _WALK_P
    return int(h % deg)


def q_random_walk_corpus(sf_dir: str) -> pd.DataFrame:
    """DeepWalk/node2vec walk-corpus generation (Perozzi et al. 2014) made
    deterministic: from the 16 smallest co-purchase nodes, 4-step walks
    where each step picks the H(start,node,t) mod deg-th smallest neighbor
    — the graph-embedding training-corpus primitive, reproducible across
    engines and reruns.  The edge set stays distributed (materialized once,
    one filtered scan per step); only the ≤16-node frontier broadcasts and
    only the frontier's neighbor lists come back, so each round moves
    O(Σ deg(frontier)) rows, never the graph."""
    import ray as _ray

    edges = (
        _copurchase_weighted_edges(sf_dir)
        .map_batches(
            lambda t: pa.table({"src": t["src"], "dst": t["dst"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    nodes = (
        edges.map_batches(
            lambda t: pa.table({"m": pc.unique(t["src"])}),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .to_pandas()["m"]
        .to_numpy(np.int64)
    )
    starts = np.unique(nodes)[:_WALK_STARTS].tolist()

    walks = [(int(s), 0, int(s)) for s in starts]
    cur = {int(s): int(s) for s in starts}
    for t in range(1, _WALK_STEPS + 1):
        frontier = np.unique(np.fromiter(cur.values(), np.int64, len(cur)))
        ref = _ray.put(frontier)

        def nbrs_of(tb: pa.Table, *, _ref=ref) -> pd.DataFrame:
            f = _ray.get(_ref)
            s = tb["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = np.searchsorted(f, s) < len(f)
            keep &= f[np.minimum(np.searchsorted(f, s), len(f) - 1)] == s
            return pd.DataFrame(
                {"src": s[keep],
                 "dst": tb["dst"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]}
            )

        nb = (
            edges.map_batches(nbrs_of, batch_format="pyarrow", zero_copy_batch=True)
            .to_pandas()
            .drop_duplicates()
            .sort_values(["src", "dst"], ignore_index=True)
        )
        adj = {int(v): g["dst"].to_numpy(np.int64) for v, g in nb.groupby("src")}
        for s in list(cur):
            ns = adj[cur[s]]
            nxt = int(ns[_walk_pick(s, cur[s], t, len(ns))])
            cur[s] = nxt
            walks.append((s, t, nxt))

    out = pd.DataFrame(walks, columns=["start", "step", "node"]).sort_values(
        ["start", "step"], ignore_index=True
    )
    return _i64(out, ["start", "step", "node"])


def _walk_sql_step(t: int, prev: str) -> str:
    return f"""
w{t} AS (
  SELECT w.start, {t} AS step, nb.dst AS node
  FROM {prev} w JOIN nb ON nb.src = w.node
   AND nb.rk = ((w.start * 1000003 + w.node * 8191 + {t} * 131) % {_WALK_P})
               * 2654435761 % {_WALK_P} % nb.deg + 1)"""


SQL_RANDOM_WALK_CORPUS = f"""
WITH pairs AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON b.l_orderkey = a.l_orderkey AND a.l_partkey <> b.l_partkey),
nb AS (SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS rk,
              COUNT(*) OVER (PARTITION BY src) AS deg
       FROM pairs),
starts AS (SELECT src AS node FROM pairs GROUP BY 1 ORDER BY 1 LIMIT {_WALK_STARTS}),
w0 AS (SELECT node AS start, 0 AS step, node FROM starts),{_walk_sql_step(1, "w0")},{_walk_sql_step(2, "w1")},{_walk_sql_step(3, "w2")},{_walk_sql_step(4, "w3")}
SELECT start, step, node FROM (
  SELECT * FROM w0 UNION ALL SELECT * FROM w1 UNION ALL SELECT * FROM w2
  UNION ALL SELECT * FROM w3 UNION ALL SELECT * FROM w4)
ORDER BY start, step
"""


_PARETO_LAYERS = 3


def _pareto_peel(c: pd.DataFrame) -> np.ndarray:
    """Boolean keep-mask of the 2-D Pareto frontier (price MAX, date MIN) of
    ``c`` with columns price_c/date_us — the same strict-dominance semantics
    as q_skyline_orders, vectorized as one sort + running min."""
    idx = np.lexsort((c["date_us"].to_numpy(), -c["price_c"].to_numpy()))
    price = c["price_c"].to_numpy()[idx]
    date = c["date_us"].to_numpy()[idx]
    run_min = np.minimum.accumulate(date)
    new_class = np.r_[True, price[1:] != price[:-1]]
    class_id = np.cumsum(new_class) - 1
    last_idx = np.r_[np.nonzero(new_class)[0][1:] - 1, len(price) - 1]
    class_min = run_min[last_idx]
    prev_class_min = np.r_[np.int64(np.iinfo(np.int64).max), class_min[:-1]]
    prior_min = prev_class_min[class_id]
    # within a price class dates sort ascending under the lexsort, so the
    # class's first row carries its min date
    first_of_class = np.nonzero(new_class)[0]
    class_first_date = date[first_of_class][class_id]
    keep_sorted = (date < prior_min) & (date == class_first_date)
    keep = np.zeros(len(c), dtype=bool)
    keep[idx] = keep_sorted
    return keep


def q_pareto_layers(sf_dir: str) -> pd.DataFrame:
    """Onion-peeled Pareto layers (skyline of the remainder, 3 peels) on
    orders over (totalprice MAX, orderdate MIN) — the multi-objective
    shortlisting operator.  Distributed prune: global layer ≤ k points must
    be in a block's LOCAL layer ≤ k (peeling only removes competitors), so
    each block ships just its first 3 local frontiers and the driver peels
    that union — frontier-sized data movement, like the skyline query."""
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderdate"])

    def to_core(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"o_orderkey": df["o_orderkey"].to_numpy(np.int64),
             "price_c": _rd(df["o_totalprice"].to_numpy() * 100.0, 0).astype(np.int64),
             "date_us": df["o_orderdate"].astype("datetime64[us]").astype("int64")}
        )

    def local_layers(df: pd.DataFrame) -> pd.DataFrame:
        c = to_core(df)
        out = []
        for _ in range(_PARETO_LAYERS):
            if c.empty:
                break
            keep = _pareto_peel(c)
            out.append(c[keep])
            c = c[~keep]
        return (
            pd.concat(out, ignore_index=True)
            if out
            else pd.DataFrame({"o_orderkey": pd.Series([], dtype="int64"),
                               "price_c": pd.Series([], dtype="int64"),
                               "date_us": pd.Series([], dtype="int64")})
        )

    cand = ds.map_batches(local_layers, batch_format="pandas").to_pandas()
    rows = []
    c = cand
    for layer in range(1, _PARETO_LAYERS + 1):
        if c.empty:
            break
        keep = _pareto_peel(c)
        sel = c[keep]
        rows.append(
            (layer, len(sel), int(sel["o_orderkey"].sum()),
             int(sel["price_c"].max()), int(sel["date_us"].min()))
        )
        c = c[~keep]
    out = pd.DataFrame(
        rows,
        columns=["layer", "n_orders", "orderkey_sum", "max_price_cents", "min_date_us"],
    )
    return _i64(out, ["layer", "n_orders", "orderkey_sum", "max_price_cents", "min_date_us"])


def _pareto_sql_round(src: str, out: str) -> str:
    return f"""
{out}_m AS (
  SELECT o_orderkey, price_c, date_us,
         MIN(date_us) OVER (ORDER BY price_c DESC
                            RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prior_min,
         MIN(date_us) OVER (PARTITION BY price_c) AS class_min
  FROM {src}),
{out} AS (
  SELECT o_orderkey, price_c, date_us,
         (date_us < COALESCE(prior_min, 9223372036854775807)
          AND date_us = class_min) AS on_front
  FROM {out}_m)"""


SQL_PARETO_LAYERS = f"""
WITH base AS (
  SELECT o_orderkey, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS price_c,
         epoch_us(o_orderdate) AS date_us
  FROM orders),{_pareto_sql_round("base", "f1")},
r1 AS (SELECT o_orderkey, price_c, date_us FROM f1 WHERE NOT on_front),{_pareto_sql_round("r1", "f2")},
r2 AS (SELECT o_orderkey, price_c, date_us FROM f2 WHERE NOT on_front),{_pareto_sql_round("r2", "f3")},
layers AS (
  SELECT 1 AS layer, o_orderkey, price_c, date_us FROM f1 WHERE on_front
  UNION ALL
  SELECT 2, o_orderkey, price_c, date_us FROM f2 WHERE on_front
  UNION ALL
  SELECT 3, o_orderkey, price_c, date_us FROM f3 WHERE on_front)
SELECT layer, COUNT(*) AS n_orders, CAST(SUM(o_orderkey) AS BIGINT) AS orderkey_sum,
       MAX(price_c) AS max_price_cents, MIN(date_us) AS min_date_us
FROM layers GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Wave 19: Elias-Fano posting-size audit, columnar encoding advisor
# ---------------------------------------------------------------------------


def q_elias_fano_audit(sf_dir: str) -> pd.DataFrame:
    """Elias-Fano posting-list compression audit (Vigna 2013's quasi-
    succinct indices): for every vocabulary word with n postings over a
    doc-id universe U, the EF bound is n·l + n + (U >> l) bits with
    l = max(0, ⌊log₂(U/n)⌋) — ALL integer arithmetic (bit lengths, shifts),
    so both engines agree exactly.  Reports EF vs plain-32-bit footprint by
    document-frequency bucket — the index-sizing decision an IR/RAG
    pipeline makes before building postings.  Distinct (word, doc) pairs
    reduce through one word-bucketed exchange; the bit formula runs on the
    vocab-bounded frequency table."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    umax = int(
        ds.map_batches(
            lambda t: pa.table({"m": pa.array([pc.max(t["doc_id"]).as_py()], pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True,
        ).to_pandas()["m"].max()
    ) + 1

    def wd_partial(t: pa.Table) -> pd.DataFrame:
        lst = pc.split_pattern(t["text"], " ").combine_chunks()
        off = np.asarray(lst.offsets, dtype=np.int64)
        lens = np.diff(off)
        ids = np.repeat(
            t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64), lens
        )
        w = lst.values.to_numpy(zero_copy_only=False)
        return pd.DataFrame({"w": w, "doc_id": ids}).drop_duplicates()

    wd = ds.map_batches(wd_partial, batch_format="pyarrow", zero_copy_batch=True)

    def per_bucket(df: pd.DataFrame, *, _u=umax) -> pd.DataFrame:
        pw = df.drop_duplicates().groupby("w", as_index=False).size()
        n = pw["size"].to_numpy(np.int64)
        q = _u // n
        l = np.array([int(x).bit_length() - 1 if x >= 1 else 0 for x in q],
                     dtype=np.int64)
        ef_bits = n * l + n + (_u >> l)
        plain_bits = 32 * n
        bucket = np.select(
            [n == 1, n <= 4, n <= 16, n <= 64],
            ["1", "2-4", "5-16", "17-64"],
            default="65+",
        )
        out = pd.DataFrame({"bucket": bucket, "n_tokens": 1,
                            "ef_bits": ef_bits, "plain_bits": plain_bits})
        return out.groupby("bucket", as_index=False).sum()

    hist = grouped_sums(
        bucketed_group_reduce(wd, ["w"], per_bucket, num_buckets=32),
        ["bucket"],
        {"n_tokens": "n_tokens", "ef_bits": "ef_bits", "plain_bits": "plain_bits"},
    ).to_pandas()
    hist["ratio"] = _rd(
        hist["ef_bits"].to_numpy(np.float64) / hist["plain_bits"].to_numpy(np.float64), 6
    )
    out = hist.sort_values("bucket", ignore_index=True)
    return _i64(out, ["n_tokens", "ef_bits", "plain_bits"])


SQL_ELIAS_FANO_AUDIT = """
WITH wd AS (
  SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents),
u AS (SELECT MAX(doc_id) + 1 AS uu FROM documents),
pw AS (SELECT w, COUNT(*) AS n FROM wd GROUP BY 1),
ef AS (
  SELECT w, n,
         CASE WHEN (SELECT uu FROM u) // n >= 1
              THEN LENGTH(BIN((SELECT uu FROM u) // n)) - 1 ELSE 0 END AS l
  FROM pw),
b AS (SELECT w, n, n * l + n + ((SELECT uu FROM u) >> l) AS ef_bits,
             32 * n AS plain_bits
      FROM ef),
lab AS (
  SELECT CASE WHEN n = 1 THEN '1' WHEN n <= 4 THEN '2-4'
              WHEN n <= 16 THEN '5-16' WHEN n <= 64 THEN '17-64'
              ELSE '65+' END AS bucket, ef_bits, plain_bits
  FROM b)
SELECT bucket, COUNT(*) AS n_tokens, CAST(SUM(ef_bits) AS BIGINT) AS ef_bits,
       CAST(SUM(plain_bits) AS BIGINT) AS plain_bits,
       ROUND(CAST(SUM(ef_bits) AS DOUBLE) / CAST(SUM(plain_bits) AS DOUBLE), 6) AS ratio
FROM lab GROUP BY 1 ORDER BY bucket
"""


_ENC_COLS = ["event_type", "user_id", "value"]


def q_encoding_advisor(sf_dir: str) -> pd.DataFrame:
    """Columnar encoding advisor (the Parquet/ORC writer decision): per
    column — exact distinct count, run count in event-id order, average run
    length — and an integer-rule recommendation (RLE when avg run ≥ 4, DICT
    when ndv ≤ n/20, else PLAIN).  Run counting is ORDER-dependent, so it
    rides the exact distributed ROW_NUMBER: every row joins its positional
    neighbour through one pair-id exchange (works for gapped ids too, same
    semantics as SQL LAG), and boundaries reduce as combiner partials; ndv
    is one fused (column, value) distinct exchange."""
    from ..functions.rank import global_row_number
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["event_id", "event_type", "user_id", "value"])
    ranked, total = global_row_number(ds, "event_id", [])

    def fanout(df: pd.DataFrame) -> pd.DataFrame:
        rn = df["rn"].to_numpy(np.int64)
        left = df.assign(pair=rn)
        right = df.assign(pair=rn - 1)
        out = pd.concat([left, right], ignore_index=True)
        out = out[(out["pair"] >= 1) & (out["pair"] <= total - 1)]
        return out[["pair", "rn", *_ENC_COLS]]

    pairs = ranked.map_batches(fanout, batch_format="pandas")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["pair", "rn"], ignore_index=True)
        a, b = df.iloc[0::2], df.iloc[1::2]
        rows = []
        for col in _ENC_COLS:
            x, y = a[col].to_numpy(), b[col].to_numpy()
            rows.append((col, int((x != y).sum())))
        return pd.DataFrame(rows, columns=["column_name", "boundaries"])

    bounds = (
        grouped_sums(
            bucketed_group_reduce(pairs, ["pair"], per_bucket, num_buckets=32),
            ["column_name"],
            {"boundaries": "boundaries"},
        )
        .to_pandas()
        .set_index("column_name")["boundaries"]
        .to_dict()
    )

    def val_partial(t: pa.Table) -> pd.DataFrame:
        frames = []
        for col in _ENC_COLS:
            v = pc.cast(t[col], pa.string()).to_numpy(zero_copy_only=False)
            frames.append(pd.DataFrame({"column_name": col, "val": np.unique(v)}))
        return pd.concat(frames, ignore_index=True)

    ndv = (
        grouped_sums(
            ds.map_batches(val_partial, batch_format="pyarrow", zero_copy_batch=True),
            ["column_name", "val"],
            {},
            "c",
        )
        .map_batches(
            lambda t: pa.Table.from_pandas(
                pd.DataFrame(t.to_pandas().groupby("column_name").size(),
                             columns=["ndv"]).reset_index(),
                preserve_index=False,
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .groupby("column_name")["ndv"]
        .sum()
        .to_dict()
    )

    rows = []
    for col in _ENC_COLS:
        runs = bounds.get(col, 0) + 1
        nd = int(ndv[col])
        if total >= 4 * runs:
            enc = "RLE"
        elif 20 * nd <= total:
            enc = "DICT"
        else:
            enc = "PLAIN"
        rows.append(
            (col, total, nd, runs, _rd(float(total) / float(runs), 6), enc)
        )
    out = pd.DataFrame(
        rows,
        columns=["column_name", "n", "ndv", "n_runs", "avg_run_len", "encoding"],
    )
    return _i64(out, ["n", "ndv", "n_runs"])


SQL_ENCODING_ADVISOR = """
WITH s AS (
  SELECT event_type, user_id, value,
         LAG(event_type) OVER w AS p_type,
         LAG(user_id) OVER w AS p_user,
         LAG(value) OVER w AS p_value
  FROM events WINDOW w AS (ORDER BY event_id)),
per AS (
  SELECT 'event_type' AS column_name, COUNT(*) AS n,
         COUNT(DISTINCT event_type) AS ndv,
         1 + SUM(CASE WHEN p_type IS NOT NULL AND event_type <> p_type
                      THEN 1 ELSE 0 END) AS n_runs
  FROM s
  UNION ALL
  SELECT 'user_id', COUNT(*), COUNT(DISTINCT user_id),
         1 + SUM(CASE WHEN p_user IS NOT NULL AND user_id <> p_user
                      THEN 1 ELSE 0 END)
  FROM s
  UNION ALL
  SELECT 'value', COUNT(*), COUNT(DISTINCT value),
         1 + SUM(CASE WHEN p_value IS NOT NULL AND value <> p_value
                      THEN 1 ELSE 0 END)
  FROM s)
SELECT column_name, n, ndv, CAST(n_runs AS BIGINT) AS n_runs,
       ROUND(CAST(n AS DOUBLE) / CAST(n_runs AS DOUBLE), 6) AS avg_run_len,
       CASE WHEN n >= 4 * n_runs THEN 'RLE'
            WHEN 20 * ndv <= n THEN 'DICT'
            ELSE 'PLAIN' END AS encoding
FROM per ORDER BY column_name
"""


# ---------------------------------------------------------------------------
# Wave 20: Gorilla timestamp compression audit, Dirichlet query-likelihood
# retrieval, difference-in-differences
# ---------------------------------------------------------------------------

_GOR_HEADER_BITS = 64
_GOR_FIRST_DELTA_BITS = 36


def q_gorilla_timestamp_audit(sf_dir: str) -> pd.DataFrame:
    """Gorilla-style timestamp compression audit (Pelkonen et al. 2015 §4.1
    adapted to µs): per user stream, delta-of-delta of consecutive event
    timestamps classed into integer bit buckets (0→1 bit, ≤2¹²→14,
    ≤2²⁰→24, ≤2³⁰→34, else 68) plus a 64-bit header and 36-bit first delta
    per stream — the time-series storage sizing decision, all integer.
    Users co-locate through one bucketed exchange; only the 5-bucket
    histogram reduces."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
        uid = df["user_id"].to_numpy(np.int64)
        tsu = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        new_u = np.r_[True, uid[1:] != uid[:-1]]
        delta = np.diff(tsu, prepend=np.int64(0))
        dod = np.diff(delta, prepend=np.int64(0))
        # position within user: 0 = header row, 1 = first delta, ≥2 = dod
        seg = np.cumsum(new_u) - 1
        first_idx = np.nonzero(new_u)[0]
        posn = np.arange(len(df), dtype=np.int64) - first_idx[seg]
        dv = np.abs(dod)
        cls = np.select(
            [dv == 0, dv <= 1 << 12, dv <= 1 << 20, dv <= 1 << 30],
            [np.int64(1), np.int64(14), np.int64(24), np.int64(34)],
            default=np.int64(68),
        )
        rows = []
        n_streams = int(new_u.sum())
        rows.append(("header", n_streams, n_streams * _GOR_HEADER_BITS))
        fd = int((posn == 1).sum())
        rows.append(("first_delta", fd, fd * _GOR_FIRST_DELTA_BITS))
        m = posn >= 2
        for bits, name in [(1, "dod_0"), (14, "dod_14"), (24, "dod_24"),
                           (34, "dod_34"), (68, "dod_68")]:
            k = int((m & (cls == bits)).sum())
            if k:
                rows.append((name, k, k * bits))
        return pd.DataFrame(rows, columns=["bucket", "n", "bits"])

    hist = grouped_sums(
        bucketed_group_reduce(ds, ["user_id"], per_bucket, num_buckets=32),
        ["bucket"],
        {"n": "n", "bits": "bits"},
    ).to_pandas()
    out = hist.sort_values("bucket", ignore_index=True)
    return _i64(out, ["n", "bits"])


SQL_GORILLA_TIMESTAMP_AUDIT = f"""
WITH s AS (
  SELECT user_id, epoch_us(ts) AS tsu,
         ROW_NUMBER() OVER w AS posn,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS delta,
         (epoch_us(ts) - LAG(epoch_us(ts)) OVER w)
           - (LAG(epoch_us(ts)) OVER w - LAG(epoch_us(ts), 2) OVER w) AS dod
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
lab AS (
  SELECT CASE WHEN posn = 1 THEN 'header'
              WHEN posn = 2 THEN 'first_delta'
              WHEN ABS(dod) = 0 THEN 'dod_0'
              WHEN ABS(dod) <= 4096 THEN 'dod_14'
              WHEN ABS(dod) <= 1048576 THEN 'dod_24'
              WHEN ABS(dod) <= 1073741824 THEN 'dod_34'
              ELSE 'dod_68' END AS bucket,
         CASE WHEN posn = 1 THEN {_GOR_HEADER_BITS}
              WHEN posn = 2 THEN {_GOR_FIRST_DELTA_BITS}
              WHEN ABS(dod) = 0 THEN 1
              WHEN ABS(dod) <= 4096 THEN 14
              WHEN ABS(dod) <= 1048576 THEN 24
              WHEN ABS(dod) <= 1073741824 THEN 34
              ELSE 68 END AS b
  FROM s)
SELECT bucket, COUNT(*) AS n, CAST(SUM(b) AS BIGINT) AS bits
FROM lab GROUP BY 1 ORDER BY bucket
"""


_QL_MU = 2000
_QL_TERMS = 3


def q_dirichlet_ql_retrieval(sf_dir: str) -> pd.DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai & Lafferty
    2001), self-contained: the query is the corpus's 3 most frequent words;
    each document scores Σ_q round(10⁶·ln((tf·|C| + µ·cf) / ((dl+µ)·|C|)))
    µnats — the log runs over a ratio of EXACT integers on both engines
    (libm/DuckDB LN parity, the dp_event_counts convention), so scores are
    bit-deterministic.  Pass 1 is one word-count combiner exchange; pass 2
    broadcasts the 3-term stats and scores every doc in one vectorized scan.
    Top-10 docs."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def wc_partial(t: pa.Table) -> pd.DataFrame:
        lst = pc.split_pattern(t["text"], " ").combine_chunks()
        w = lst.values.to_numpy(zero_copy_only=False)
        ww, cc = np.unique(w, return_counts=True)
        return pd.DataFrame({"w": ww, "c": cc.astype(np.int64)})

    wc = grouped_sums(
        ds.map_batches(wc_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["w"],
        {"c": "c"},
    )
    top = topk(wc, ["c", "w"], [True, False], _QL_TERMS).to_pandas()
    terms = top["w"].astype(str).tolist()
    cfs = {str(w): int(c) for w, c in zip(top["w"], top["c"])}
    ctot = int(wc.map_batches(
        lambda t: pa.table({"s": pa.array([pc.sum(t["c"]).as_py() or 0], pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True,
    ).to_pandas()["s"].sum())

    def score(t: pa.Table, *, _terms=terms, _cfs=cfs, _ctot=ctot) -> pd.DataFrame:
        lst = pc.split_pattern(t["text"], " ").combine_chunks()
        off = np.asarray(lst.offsets, dtype=np.int64)
        lens = np.diff(off)
        w = lst.values.to_numpy(zero_copy_only=False)
        n = len(lens)
        total = np.zeros(n, dtype=np.int64)
        row = np.repeat(np.arange(n, dtype=np.int64), lens)
        for q in _terms:
            tf = np.bincount(row[w == q], minlength=n).astype(np.int64)
            num = (tf * _ctot + _QL_MU * _cfs[q]).astype(np.float64)
            den = ((lens + _QL_MU) * _ctot).astype(np.float64)
            total += _rd(np.log(num / den) * 1e6, 0).astype(np.int64)
        return pd.DataFrame(
            {"doc_id": t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
             "score_unats": total}
        )

    scored = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    out = topk(scored, ["score_unats", "doc_id"], [True, False], 10).to_pandas()
    out["q1"], out["q2"], out["q3"] = terms[0], terms[1], terms[2]
    return _i64(out, ["doc_id", "score_unats"]).reset_index(drop=True)


SQL_DIRICHLET_QL_RETRIEVAL = f"""
WITH w AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS wd FROM documents),
cnt AS (SELECT wd, COUNT(*) AS c FROM w GROUP BY 1),
ctot AS (SELECT CAST(SUM(c) AS BIGINT) AS s FROM cnt),
q AS (SELECT wd, c, ROW_NUMBER() OVER (ORDER BY c DESC, wd) AS qi
      FROM cnt ORDER BY c DESC, wd LIMIT {_QL_TERMS}),
dl AS (SELECT doc_id, LEN(string_split(text, ' ')) AS l FROM documents),
tf AS (SELECT w.doc_id, q.wd, q.c AS cf, COUNT(*) AS f
       FROM w JOIN q ON q.wd = w.wd GROUP BY 1, 2, 3),
sc AS (
  SELECT dl.doc_id,
         CAST(SUM(CAST(ROUND(LN(CAST(COALESCE(tf.f, 0) * (SELECT s FROM ctot)
                                     + {_QL_MU} * q.c AS DOUBLE)
                                / CAST((dl.l + {_QL_MU}) * (SELECT s FROM ctot)
                                       AS DOUBLE)) * 1000000, 0) AS BIGINT))
              AS BIGINT) AS score_unats
  FROM dl CROSS JOIN q
  LEFT JOIN tf ON tf.doc_id = dl.doc_id AND tf.wd = q.wd
  GROUP BY 1),
qq AS (SELECT MAX(CASE WHEN qi = 1 THEN wd END) AS q1,
              MAX(CASE WHEN qi = 2 THEN wd END) AS q2,
              MAX(CASE WHEN qi = 3 THEN wd END) AS q3
       FROM q)
SELECT sc.doc_id, sc.score_unats, qq.q1, qq.q2, qq.q3
FROM sc CROSS JOIN qq
ORDER BY sc.score_unats DESC, sc.doc_id LIMIT 10
"""


def q_diff_in_diff(sf_dir: str) -> pd.DataFrame:
    """Difference-in-differences over the event stream: treatment = odd
    user ids, periods split at the stream's integer midpoint timestamp;
    outcome = mean purchase cents per (group, period).  One (group, period)
    combiner exchange carries exact integer (sum, n); the four means and the
    DiD estimate close driver-side with the same double expressions the
    oracle evaluates."""
    ds = _t(sf_dir, "events", ["user_id", "ts", "event_type", "value"])

    def minmax(t: pa.Table) -> pa.Table:
        m = pc.cast(t["ts"], pa.int64())
        return pa.table({"lo": pa.array([pc.min(m).as_py()], pa.int64()),
                         "hi": pa.array([pc.max(m).as_py()], pa.int64())})

    mm = ds.map_batches(minmax, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    lo, hi = int(mm["lo"].min()), int(mm["hi"].max())
    cut = lo + (hi - lo) // 2

    def part(t: pa.Table, *, _cut=cut) -> pd.DataFrame:
        is_p = pc.equal(t["event_type"], "purchase").to_numpy(zero_copy_only=False)
        if not is_p.any():
            return pd.DataFrame({"grp": pd.Series([], dtype=object),
                                 "period": pd.Series([], dtype=object),
                                 "cents": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)[is_p]
        tsu = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)[is_p]
        cents = _rd(t["value"].to_numpy(zero_copy_only=False)[is_p] * 100.0, 0).astype(np.int64)
        df = pd.DataFrame(
            {"grp": np.where(uid % 2 == 1, "treat", "control"),
             "period": np.where(tsu >= _cut, "post", "pre"),
             "cents": cents, "n": 1}
        )
        return df.groupby(["grp", "period"], as_index=False).sum()

    g = grouped_sums(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["grp", "period"],
        {"cents": "cents", "n": "n"},
    ).to_pandas().set_index(["grp", "period"])

    def mean(grp: str, period: str) -> float:
        # an empty cell is NULL on the SQL side → NaN here, and NaN
        # propagates through the DiD arithmetic identically
        if (grp, period) not in g.index:
            return float("nan")
        r = g.loc[(grp, period)]
        return float(r["cents"]) / float(r["n"])

    m_tpre, m_tpost = mean("treat", "pre"), mean("treat", "post")
    m_cpre, m_cpost = mean("control", "pre"), mean("control", "post")
    did = (m_tpost - m_tpre) - (m_cpost - m_cpre)
    out = pd.DataFrame(
        {"m_treat_pre": [_rd(m_tpre, 6)], "m_treat_post": [_rd(m_tpost, 6)],
         "m_control_pre": [_rd(m_cpre, 6)], "m_control_post": [_rd(m_cpost, 6)],
         "did_cents": [_rd(did, 6)]}
    )
    return out


SQL_DIFF_IN_DIFF = """
WITH mm AS (SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events),
p AS (
  SELECT CASE WHEN user_id % 2 = 1 THEN 'treat' ELSE 'control' END AS grp,
         CASE WHEN epoch_us(ts) >= (SELECT lo + (hi - lo) // 2 FROM mm)
              THEN 'post' ELSE 'pre' END AS period,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'),
g AS (SELECT grp, period, CAST(SUM(cents) AS BIGINT) AS s, COUNT(*) AS n
      FROM p GROUP BY 1, 2),
m AS (SELECT
    MAX(CASE WHEN grp = 'treat' AND period = 'pre'
             THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS m_tpre,
    MAX(CASE WHEN grp = 'treat' AND period = 'post'
             THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS m_tpost,
    MAX(CASE WHEN grp = 'control' AND period = 'pre'
             THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS m_cpre,
    MAX(CASE WHEN grp = 'control' AND period = 'post'
             THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS m_cpost
  FROM g)
SELECT ROUND(m_tpre, 6) AS m_treat_pre, ROUND(m_tpost, 6) AS m_treat_post,
       ROUND(m_cpre, 6) AS m_control_pre, ROUND(m_cpost, 6) AS m_control_post,
       ROUND((m_tpost - m_tpre) - (m_cpost - m_cpre), 6) AS did_cents
FROM m
"""


# ---------------------------------------------------------------------------
# Wave 21: soft-dedup loss weighting, stratified k-fold assignment
# ---------------------------------------------------------------------------


def q_soft_dedup_weights(sf_dir: str) -> pd.DataFrame:
    """SoftDeDup loss weighting (keep duplicates, downweight them — the
    SlimPajama-style alternative to hard removal): each document's weight is
    1/c where c is its exact content-duplicate count, and a source's
    effective token mass is Σ ⌊10⁶·n_words/c⌋ µtokens — per-document floor
    quantization keeps the sum INTEGER-exact across engines.  Two combiner
    exchanges: content-fp → duplicate counts (md5 oracle convention; the
    curation hot path uses fnv128), then a broadcast-free fp-bucketed join
    of counts back onto docs riding the same exchange."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "documents", ["doc_id", "text", "source"])

    def tag(t: pa.Table) -> pd.DataFrame:
        lst = pc.split_pattern(t["text"], " ").combine_chunks()
        nw = np.diff(np.asarray(lst.offsets, dtype=np.int64))
        return pd.DataFrame(
            {"fp": md5_hex(t["text"]).to_pylist(),
             "source": t["source"].to_pylist(),
             "n_words": nw}
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)

    def per_fp(df: pd.DataFrame) -> pd.DataFrame:
        c = df.groupby("fp")["source"].transform("size").to_numpy(np.int64)
        nw = df["n_words"].to_numpy(np.int64)
        eff = (nw * 1_000_000) // c
        out = pd.DataFrame(
            {"source": df["source"].to_numpy(),
             "n_docs": 1,
             "raw_words": nw,
             "eff_uwords": eff,
             "dup_docs": (c > 1).astype(np.int64)}
        )
        return out.groupby("source", as_index=False).sum()

    agg = grouped_sums(
        bucketed_group_reduce(tagged, ["fp"], per_fp, num_buckets=32),
        ["source"],
        {"n_docs": "n_docs", "raw_words": "raw_words",
         "eff_uwords": "eff_uwords", "dup_docs": "dup_docs"},
    ).to_pandas()
    out = agg.sort_values("source", ignore_index=True)
    return _i64(out, ["n_docs", "raw_words", "eff_uwords", "dup_docs"])


SQL_SOFT_DEDUP_WEIGHTS = """
WITH d AS (
  SELECT doc_id, source, md5(text) AS fp,
         LEN(string_split(text, ' ')) AS n_words
  FROM documents),
c AS (SELECT fp, COUNT(*) AS cnt FROM d GROUP BY 1)
SELECT d.source, COUNT(*) AS n_docs,
       CAST(SUM(d.n_words) AS BIGINT) AS raw_words,
       CAST(SUM((d.n_words * 1000000) // c.cnt) AS BIGINT) AS eff_uwords,
       CAST(SUM(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs
FROM d JOIN c ON c.fp = d.fp
GROUP BY 1 ORDER BY d.source
"""


_KFOLD_K = 5


def q_stratified_kfold(sf_dir: str) -> pd.DataFrame:
    """Stratified k-fold assignment (the sklearn StratifiedKFold contract,
    hash-order deterministic): within each source stratum documents rank by
    md5(doc_id) and take fold = (rank-1) mod k, so folds are balanced to
    ±1 per stratum and stable across reruns/partitionings.  The per-stratum
    rank is a bucketed exchange on source moving only (doc_id, hash)
    projections; output is the (fold × source) composition plus an id
    checksum the oracle reproduces."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "documents", ["doc_id", "source"])

    def add_h(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t["doc_id"], "source": t["source"],
             "h": md5_hex(pc.cast(t["doc_id"], pa.string()))}
        )

    keyed = ds.map_batches(add_h, batch_format="pyarrow", zero_copy_batch=True)

    def per_stratum(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["source", "h", "doc_id"], ignore_index=True)
        rk = df.groupby("source", sort=False).cumcount()
        df["fold"] = (rk % _KFOLD_K).astype(np.int64)
        out = pd.DataFrame(
            {"fold": df["fold"], "source": df["source"],
             "n_docs": 1, "id_sum": df["doc_id"].astype("int64")}
        )
        return out.groupby(["fold", "source"], as_index=False).sum()

    agg = grouped_sums(
        bucketed_group_reduce(keyed, ["source"], per_stratum, num_buckets=16),
        ["fold", "source"],
        {"n_docs": "n_docs", "id_sum": "id_sum"},
    ).to_pandas()
    out = agg.sort_values(["fold", "source"], ignore_index=True)
    return _i64(out, ["fold", "n_docs", "id_sum"])


SQL_STRATIFIED_KFOLD = f"""
WITH r AS (
  SELECT doc_id, source,
         (ROW_NUMBER() OVER (PARTITION BY source
                             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1)
           % {_KFOLD_K} AS fold
  FROM documents)
SELECT fold, source, COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS id_sum
FROM r GROUP BY 1, 2 ORDER BY fold, source
"""


# ---------------------------------------------------------------------------
# Wave 22: image tile-texture audit, energy VAD segmentation, demographic
# parity
# ---------------------------------------------------------------------------

_TILE = 8


def _tile_varq(img: np.ndarray) -> np.ndarray:
    """Integer per-tile texture score: luma y=(299r+587g+114b)//1000 over
    non-overlapping 8×8 tiles (partial edge tiles dropped), score =
    (n·Σy² − (Σy)²) // n² — the population-variance numerator quantized, all
    int64."""
    h, w = img.shape[0] // _TILE * _TILE, img.shape[1] // _TILE * _TILE
    if h == 0 or w == 0:
        return np.zeros(0, np.int64)
    y = (
        299 * img[:h, :w, 0].astype(np.int64)
        + 587 * img[:h, :w, 1].astype(np.int64)
        + 114 * img[:h, :w, 2].astype(np.int64)
    ) // 1000
    t = y.reshape(h // _TILE, _TILE, w // _TILE, _TILE).transpose(0, 2, 1, 3)
    t = t.reshape(-1, _TILE * _TILE)
    n = np.int64(_TILE * _TILE)
    s = t.sum(axis=1)
    ss = (t * t).sum(axis=1)
    return (n * ss - s * s) // (n * n)


def _tile_bucket_counts(img: np.ndarray) -> tuple[int, int, int, int, int]:
    vq = _tile_varq(img)
    flat = int((vq == 0).sum())
    low = int(((vq > 0) & (vq <= 100)).sum())
    mid = int(((vq > 100) & (vq <= 1000)).sum())
    high = int((vq > 1000).sum())
    return flat, low, mid, high, int(vq.sum())


def ensure_tile_entropy_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``image_tile_entropy``: per-image tile-texture
    bucket counts recorded at SYNTHESIS time from the source pixel arrays —
    independent of the PNG decode the engine must invert.  Images mix a
    flat quadrant (zero-variance tiles), smooth gradients and noise."""
    import os as _os

    def build() -> pa.Table:
        from ..functions.media_codecs import encode_png

        rng = np.random.default_rng(23)
        sf = _sf_of(sf_dir)
        n = max(30, min(3000, int(3000 * sf)))
        rows = {"media_id": [], "payload": [], "t_flat": [], "t_low": [],
                "t_mid": [], "t_high": [], "varq_sum": []}
        for i in range(n):
            w, h = 24 + i % 17, 24 + i % 13
            img = (
                np.add.outer(np.arange(h), np.arange(w))[..., None] * [2, 5, 3]
                + rng.integers(0, 60, size=(h, w, 3))
            ).astype(np.uint8)
            img[: h // 2, : w // 2] = [40, 90, 160]  # flat quadrant
            rows["media_id"].append(f"timg{i:05d}")
            rows["payload"].append(encode_png(img))
            f, lo, m, hi, vs = _tile_bucket_counts(img)
            rows["t_flat"].append(f)
            rows["t_low"].append(lo)
            rows["t_mid"].append(m)
            rows["t_high"].append(hi)
            rows["varq_sum"].append(vs)
        return pa.table(
            {"media_id": pa.array(rows["media_id"], pa.string()),
             "payload": pa.array(rows["payload"], pa.binary()),
             "t_flat": pa.array(rows["t_flat"], pa.int64()),
             "t_low": pa.array(rows["t_low"], pa.int64()),
             "t_mid": pa.array(rows["t_mid"], pa.int64()),
             "t_high": pa.array(rows["t_high"], pa.int64()),
             "varq_sum": pa.array(rows["varq_sum"], pa.int64())}
        )

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "tile_entropy.parquet"), build
    )


def q_image_tile_entropy(sf_dir: str) -> pd.DataFrame:
    """Image texture audit for vision-data curation (flat/low-texture frames
    are dropped before pretraining): decode each PNG in an actor pool, score
    8×8 tiles with the INTEGER variance quantizer, histogram the corpus —
    checked against synthesis-time source-array truth the decoder never
    saw.  Decode state loads once per actor; only 5 counters leave each
    batch."""
    from ..functions.media_codecs import decode_png

    src = ensure_tile_entropy_parquet(sf_dir)
    ds = rd.read_parquet(src, columns=["media_id", "payload"])

    class TileStats:
        def __init__(self):
            self._decode = decode_png

        def __call__(self, t: pa.Table) -> pa.Table:
            acc = np.zeros(5, np.int64)
            for p in t["payload"].to_pylist():
                acc += np.array(_tile_bucket_counts(self._decode(p)), np.int64)
            return pa.table(
                {"t_flat": pa.array(acc[:1]), "t_low": pa.array(acc[1:2]),
                 "t_mid": pa.array(acc[2:3]), "t_high": pa.array(acc[3:4]),
                 "varq_sum": pa.array(acc[4:5])}
            )

    agg = (
        ds.map_batches(TileStats, batch_format="pyarrow", batch_size=64,
                       concurrency=2, zero_copy_batch=True)
        .to_pandas()
        .sum()
    )
    out = pd.DataFrame(
        [{"t_flat": int(agg["t_flat"]), "t_low": int(agg["t_low"]),
          "t_mid": int(agg["t_mid"]), "t_high": int(agg["t_high"]),
          "varq_sum": int(agg["varq_sum"])}]
    )
    return _i64(out, ["t_flat", "t_low", "t_mid", "t_high", "varq_sum"])


SQL_IMAGE_TILE_ENTROPY = f"""
SELECT CAST(SUM(t_flat) AS BIGINT) AS t_flat, CAST(SUM(t_low) AS BIGINT) AS t_low,
       CAST(SUM(t_mid) AS BIGINT) AS t_mid, CAST(SUM(t_high) AS BIGINT) AS t_high,
       CAST(SUM(varq_sum) AS BIGINT) AS varq_sum
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/tile_entropy.parquet')
"""


_VAD_FRAME = 400
_VAD_THRESH = 400 * 250_000  # mean-square 500² over a 400-sample frame


def _vad_stats(samples: np.ndarray) -> tuple[int, int, int, int]:
    """(n_frames, n_active, longest_active_run, energy_sum) of int16 mono
    PCM under fixed 400-sample frames (tail dropped), all int64-exact."""
    mono = samples if samples.ndim == 1 else samples[:, 0]
    nf = len(mono) // _VAD_FRAME
    if nf == 0:
        return 0, 0, 0, 0
    x = mono[: nf * _VAD_FRAME].astype(np.int64).reshape(nf, _VAD_FRAME)
    e = (x * x).sum(axis=1)
    act = e > _VAD_THRESH
    # longest run of True, vectorized: cumulative count reset at gaps
    idx = np.arange(nf)
    start = np.where(act & np.r_[True, ~act[:-1]], idx, -1)
    run_start = np.maximum.accumulate(np.where(act, np.where(start >= 0, start, -1), idx + 1))
    runs = np.where(act, idx - run_start + 1, 0)
    return nf, int(act.sum()), int(runs.max()) if nf else 0, int(e.sum())


def ensure_vad_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``audio_vad_energy``: speech-shaped clips
    (alternating silence / loud tone-plus-noise segments) with VAD truth
    recorded at SYNTHESIS time from the source samples."""
    import os as _os

    def build() -> pa.Table:
        from ..functions.media_codecs import encode_wav

        rng = np.random.default_rng(31)
        sf = _sf_of(sf_dir)
        n = max(40, min(4000, int(4000 * sf)))
        rows = {"media_id": [], "payload": [], "n_frames": [],
                "n_active": [], "longest_run": [], "energy_sum": []}
        for i in range(n):
            segs = []
            for k in range(int(rng.integers(3, 7))):
                ln = int(rng.integers(800, 2400))
                if (i + k) % 2 == 0:
                    segs.append(rng.integers(-40, 40, size=ln))
                else:
                    tt = np.arange(ln)
                    segs.append(
                        (6000 * np.sin(tt / (3.0 + k))).astype(np.int64)
                        + rng.integers(-500, 500, size=ln)
                    )
            x = np.clip(np.concatenate(segs), -32768, 32767).astype(np.int16)
            nf, na, lr, es = _vad_stats(x)
            rows["media_id"].append(f"vad{i:05d}")
            rows["payload"].append(encode_wav(x, 16000))
            rows["n_frames"].append(nf)
            rows["n_active"].append(na)
            rows["longest_run"].append(lr)
            rows["energy_sum"].append(es)
        return pa.table(
            {"media_id": pa.array(rows["media_id"], pa.string()),
             "payload": pa.array(rows["payload"], pa.binary()),
             "n_frames": pa.array(rows["n_frames"], pa.int64()),
             "n_active": pa.array(rows["n_active"], pa.int64()),
             "longest_run": pa.array(rows["longest_run"], pa.int64()),
             "energy_sum": pa.array(rows["energy_sum"], pa.int64())}
        )

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "vad_clips.parquet"), build
    )


def q_audio_vad_energy(sf_dir: str) -> pd.DataFrame:
    """Energy-threshold voice-activity detection (the speech-data curation
    front door: silence-heavy clips are dropped or trimmed): decode each WAV
    in an actor pool, frame at 400 samples, integer frame energies against a
    fixed threshold, per-clip longest-active-run — corpus totals checked
    against synthesis-time truth the decoder never saw."""
    from ..functions.media_codecs import decode_wav

    src = ensure_vad_parquet(sf_dir)
    ds = rd.read_parquet(src, columns=["media_id", "payload"])

    class Vad:
        def __init__(self):
            self._decode = decode_wav

        def __call__(self, t: pa.Table) -> pa.Table:
            nf = na = es = 0
            lr = 0
            for p in t["payload"].to_pylist():
                _, x = self._decode(p)
                f, a, r, e = _vad_stats(x)
                nf += f
                na += a
                es += e
                lr = max(lr, r)
            return pa.table(
                {"n_clips": pa.array([len(t)], pa.int64()),
                 "n_frames": pa.array([nf], pa.int64()),
                 "n_active": pa.array([na], pa.int64()),
                 "longest_run": pa.array([lr], pa.int64()),
                 "energy_sum": pa.array([es], pa.int64())}
            )

    parts = ds.map_batches(
        Vad, batch_format="pyarrow", batch_size=64, concurrency=2,
        zero_copy_batch=True,
    ).to_pandas()
    out = pd.DataFrame(
        [{"n_clips": int(parts["n_clips"].sum()),
          "n_frames": int(parts["n_frames"].sum()),
          "n_active": int(parts["n_active"].sum()),
          "longest_run": int(parts["longest_run"].max()),
          "energy_sum": int(parts["energy_sum"].sum())}]
    )
    return _i64(out, ["n_clips", "n_frames", "n_active", "longest_run", "energy_sum"])


SQL_AUDIO_VAD_ENERGY = f"""
SELECT COUNT(*) AS n_clips, CAST(SUM(n_frames) AS BIGINT) AS n_frames,
       CAST(SUM(n_active) AS BIGINT) AS n_active,
       CAST(MAX(longest_run) AS BIGINT) AS longest_run,
       CAST(SUM(energy_sum) AS BIGINT) AS energy_sum
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/vad_clips.parquet')
"""


def q_demographic_parity(sf_dir: str) -> pd.DataFrame:
    """Demographic-parity / disparate-impact audit (the four-fifths rule)
    over user conversion: groups are user_id mod 3, outcome = user ever
    purchased; per-group rates plus a corpus-level 80%-rule flag decided by
    INTEGER cross-multiplication (5·pos_min·n_max < 4·pos_max·n_min), so no
    float comparison gates the verdict.  One user-level combiner exchange;
    group rows are bounded."""
    ds = _t(sf_dir, "events", ["user_id", "event_type"])

    def part(t: pa.Table) -> pd.DataFrame:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_p = pc.equal(t["event_type"], "purchase").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"user_id": uid, "pos": is_p.astype(np.int64)})
        return df.groupby("user_id", as_index=False).max()

    users = grouped_sums(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"],
        {"pos": "pos"},
    ).to_pandas()
    users["pos"] = (users["pos"] > 0).astype(np.int64)
    users["grp"] = users["user_id"] % 3
    g = users.groupby("grp", as_index=False).agg(
        n_users=("user_id", "count"), positives=("pos", "sum")
    )
    rate = g["positives"].to_numpy(np.float64) / g["n_users"].to_numpy(np.float64)
    order_lo = np.lexsort((g["grp"].to_numpy(), rate))
    order_hi = np.lexsort((g["grp"].to_numpy(), -rate))
    lo, hi = order_lo[0], order_hi[0]
    flag = int(
        5 * int(g["positives"][lo]) * int(g["n_users"][hi])
        < 4 * int(g["positives"][hi]) * int(g["n_users"][lo])
    )
    g["rate"] = _rd(rate, 6)
    g["di_flag"] = flag
    out = g.sort_values("grp", ignore_index=True)
    return _i64(out, ["grp", "n_users", "positives", "di_flag"])


SQL_DEMOGRAPHIC_PARITY = """
WITH u AS (
  SELECT user_id, MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pos
  FROM events GROUP BY 1),
g AS (SELECT user_id % 3 AS grp, COUNT(*) AS n_users,
             CAST(SUM(pos) AS BIGINT) AS positives
      FROM u GROUP BY 1),
rk AS (SELECT grp, n_users, positives,
              ROW_NUMBER() OVER (ORDER BY CAST(positives AS DOUBLE) / n_users, grp) AS rnlo,
              ROW_NUMBER() OVER (ORDER BY CAST(positives AS DOUBLE) / n_users DESC, grp) AS rnhi
       FROM g),
lo AS (SELECT positives AS p, n_users AS n FROM rk WHERE rnlo = 1),
hi AS (SELECT positives AS p, n_users AS n FROM rk WHERE rnhi = 1)
SELECT g.grp, g.n_users, g.positives,
       ROUND(CAST(g.positives AS DOUBLE) / g.n_users, 6) AS rate,
       CASE WHEN 5 * lo.p * hi.n < 4 * hi.p * lo.n THEN 1 ELSE 0 END AS di_flag
FROM g CROSS JOIN lo CROSS JOIN hi
ORDER BY g.grp
"""


# ---------------------------------------------------------------------------
# Wave 23: matrix-profile-style motif discovery, binary-segmentation
# changepoint
# ---------------------------------------------------------------------------

_MOTIF_M = 7
_DAY_US = 86_400_000_000


def _daily_cents_series(sf_dir: str) -> tuple[np.ndarray, int]:
    """Dense daily purchase-cents series (missing days = 0) from one
    (day, cents) combiner exchange; returns (series, first_day)."""
    ds = _t(sf_dir, "events", ["ts", "event_type", "value"])

    def part(t: pa.Table) -> pd.DataFrame:
        is_p = pc.equal(t["event_type"], "purchase").to_numpy(zero_copy_only=False)
        if not is_p.any():
            return pd.DataFrame({"day": pd.Series([], dtype="int64"),
                                 "cents": pd.Series([], dtype="int64")})
        tsu = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)[is_p]
        cents = _rd(t["value"].to_numpy(zero_copy_only=False)[is_p] * 100.0, 0).astype(np.int64)
        df = pd.DataFrame({"day": tsu // _DAY_US, "cents": cents})
        return df.groupby("day", as_index=False).sum()

    daily = grouped_sums(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["day"],
        {"cents": "cents"},
    ).to_pandas().sort_values("day", ignore_index=True)
    d0, d1 = int(daily["day"].min()), int(daily["day"].max())
    series = np.zeros(d1 - d0 + 1, dtype=np.int64)
    series[daily["day"].to_numpy(np.int64) - d0] = daily["cents"].to_numpy(np.int64)
    return series, d0


def q_motif_discovery(sf_dir: str) -> pd.DataFrame:
    """Matrix-profile-style motif discovery (Yeh et al. 2016's problem,
    exact integer variant): over the dense daily purchase-cents series, the
    5 closest NON-OVERLAPPING window pairs of length 7 by integer squared
    distance — recurring weekly demand patterns.  The corpus collapses to
    one (day, cents) combiner exchange; the all-pairs SSD over the
    T-bounded series is one int64 gram matmul driver-side (tile the matmul
    through map_batches when T outgrows one node — the series length is
    calendar-bounded, not corpus-bounded)."""
    series, d0 = _daily_cents_series(sf_dir)
    T = len(series)
    nw = T - _MOTIF_M + 1
    if nw < 2:
        return pd.DataFrame(
            {"day_i": pd.Series([], dtype="int64"), "day_j": pd.Series([], dtype="int64"),
             "ssd": pd.Series([], dtype="int64")}
        )
    win = np.lib.stride_tricks.sliding_window_view(series, _MOTIF_M).astype(np.int64)
    norms = (win * win).sum(axis=1)
    gram = win @ win.T
    d = norms[:, None] + norms[None, :] - 2 * gram
    ii, jj = np.meshgrid(np.arange(nw), np.arange(nw), indexing="ij")
    mask = (jj - ii) >= _MOTIF_M  # non-overlapping, i < j
    cand = np.column_stack([d[mask], ii[mask], jj[mask]])
    order = np.lexsort((cand[:, 2], cand[:, 1], cand[:, 0]))[:5]
    sel = cand[order]
    out = pd.DataFrame(
        {"day_i": (sel[:, 1] + d0).astype(np.int64),
         "day_j": (sel[:, 2] + d0).astype(np.int64),
         "ssd": sel[:, 0].astype(np.int64)}
    )
    return _i64(out, ["day_i", "day_j", "ssd"])


SQL_MOTIF_DISCOVERY = f"""
WITH p AS (
  SELECT epoch_us(ts) // {_DAY_US} AS day,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'),
g AS (SELECT day, CAST(SUM(cents) AS BIGINT) AS c FROM p GROUP BY 1),
mm AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM g),
dense AS (
  SELECT gs.day, COALESCE(g.c, 0) AS c
  FROM (SELECT UNNEST(generate_series((SELECT d0 FROM mm), (SELECT d1 FROM mm)))
          AS day) gs
  LEFT JOIN g ON g.day = gs.day),
pairs AS (
  SELECT a.day AS day_i, b.day AS day_j,
         SUM((a2.c - b2.c) * (a2.c - b2.c)) AS ssd
  FROM dense a
  JOIN dense b ON b.day >= a.day + {_MOTIF_M}
  JOIN (SELECT UNNEST(generate_series(0, {_MOTIF_M - 1})) AS k) ks ON TRUE
  JOIN dense a2 ON a2.day = a.day + ks.k
  JOIN dense b2 ON b2.day = b.day + ks.k
  WHERE a.day + {_MOTIF_M - 1} <= (SELECT d1 FROM mm)
    AND b.day + {_MOTIF_M - 1} <= (SELECT d1 FROM mm)
  GROUP BY 1, 2)
SELECT day_i, day_j, CAST(ssd AS BIGINT) AS ssd
FROM pairs ORDER BY ssd, day_i, day_j LIMIT 5
"""


def q_binary_segmentation(sf_dir: str) -> pd.DataFrame:
    """Binary-segmentation changepoint (the CUSUM family's exact argmax
    variant): the split of the daily purchase-cents series minimizing total
    within-segment SSE, found by maximizing (S_l²·n_r + S_r²·n_l)/(n_l·n_r)
    — numerator/denominator are EXACT ints (arbitrary-precision driver-side,
    HUGEINT in the oracle) and both engines order by the identical double
    ratio with the day as tie-break.  One combiner exchange; the argmax
    scans a calendar-bounded prefix-sum array."""
    series, d0 = _daily_cents_series(sf_dir)
    T = len(series)
    pre = np.cumsum(series)
    total = int(pre[-1])
    best = None
    for t in range(1, T):
        n_l, n_r = t, T - t
        s_l = int(pre[t - 1])
        s_r = total - s_l
        num = s_l * s_l * n_r + s_r * s_r * n_l
        val = float(num) / float(n_l * n_r)
        key = (-val, t)
        if best is None or key < best[0]:
            best = (key, t, n_l, n_r, s_l, s_r)
    _, t, n_l, n_r, s_l, s_r = best
    out = pd.DataFrame(
        [{"split_day": int(t + d0), "n_left": n_l, "n_right": n_r,
          "mean_left": _rd(float(s_l) / float(n_l), 6),
          "mean_right": _rd(float(s_r) / float(n_r), 6)}]
    )
    return _i64(out, ["split_day", "n_left", "n_right"])


SQL_BINARY_SEGMENTATION = f"""
WITH p AS (
  SELECT epoch_us(ts) // {_DAY_US} AS day,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'),
g AS (SELECT day, CAST(SUM(cents) AS BIGINT) AS c FROM p GROUP BY 1),
mm AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM g),
dense AS (
  SELECT gs.day, COALESCE(g.c, 0) AS c,
         ROW_NUMBER() OVER (ORDER BY gs.day) AS pos
  FROM (SELECT UNNEST(generate_series((SELECT d0 FROM mm), (SELECT d1 FROM mm)))
          AS day) gs
  LEFT JOIN g ON g.day = gs.day),
tot AS (SELECT CAST(SUM(c) AS HUGEINT) AS s, COUNT(*) AS n FROM dense),
pre AS (SELECT day, pos,
               CAST(SUM(c) OVER (ORDER BY pos) AS HUGEINT) AS sl
        FROM dense),
cand AS (
  SELECT day, pos AS n_l, (SELECT n FROM tot) - pos AS n_r,
         sl AS s_l, (SELECT s FROM tot) - sl AS s_r
  FROM pre WHERE pos < (SELECT n FROM tot)),
scored AS (
  SELECT day, n_l, n_r, s_l, s_r,
         CAST(s_l * s_l * n_r + s_r * s_r * n_l AS DOUBLE)
           / CAST(n_l * n_r AS DOUBLE) AS val
  FROM cand)
SELECT day + 1 AS split_day, CAST(n_l AS BIGINT) AS n_left,
       CAST(n_r AS BIGINT) AS n_right,
       ROUND(CAST(s_l AS DOUBLE) / CAST(n_l AS DOUBLE), 6) AS mean_left,
       ROUND(CAST(s_r AS DOUBLE) / CAST(n_r AS DOUBLE), 6) AS mean_right
FROM scored ORDER BY val DESC, day LIMIT 1
"""


# ---------------------------------------------------------------------------
# Wave 24: quantized Lloyd assignment step, Cohen's kappa annotator agreement
# ---------------------------------------------------------------------------

_LLOYD_K = 8


def q_lloyd_step_quantized(sf_dir: str) -> pd.DataFrame:
    """One exact Lloyd (k-means) assignment step on µ-int-quantized
    embeddings — the PQ/IVF training inner loop made bit-deterministic:
    centers are the 8 smallest vec-ids' quantized vectors, every vector
    assigns to the center minimizing INTEGER squared distance (ties to the
    smaller center), and the step reports per-center counts plus the exact
    integer sums the centroid update would use.  Centers broadcast once;
    each batch is one int64 matmul + argmin; only k-row partials reduce."""
    import ray as _ray

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])

    def quant(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        arr = t["embedding"].combine_chunks()
        mat = np.asarray(arr.flatten(), dtype=np.float64).reshape(len(t), -1)
        q = np.floor(mat * 1000.0).astype(np.int64)
        vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return vid, q

    first = (
        ds.map_batches(
            lambda t: pd.DataFrame({"vec_id": t["vec_id"].to_numpy(zero_copy_only=False)}),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .to_pandas()["vec_id"]
        .to_numpy(np.int64)
    )
    center_ids = np.sort(first)[:_LLOYD_K]

    def pick_centers(t: pa.Table, *, _ids=center_ids) -> pd.DataFrame:
        vid, q = quant(t)
        keep = np.isin(vid, _ids)
        return pd.DataFrame({"vec_id": vid[keep], "q": list(q[keep])})

    cdf = (
        ds.map_batches(pick_centers, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    centers = np.stack(cdf["q"].to_numpy()).astype(np.int64)
    ref = _ray.put((center_ids, centers))

    def assign(t: pa.Table, *, _ref=ref) -> pd.DataFrame:
        ids, cm = _ray.get(_ref)
        vid, q = quant(t)
        # |q - c|² = |q|² - 2 q·c + |c|²; argmin over centers
        d = (
            (q * q).sum(axis=1)[:, None]
            - 2 * (q @ cm.T)
            + (cm * cm).sum(axis=1)[None, :]
        )
        a = np.argmin(d, axis=1)  # np.argmin takes the FIRST min → smaller center
        out = pd.DataFrame(
            {"center_id": ids[a], "n_assigned": 1,
             "sum_dim0": q[:, 0], "mass": q.sum(axis=1)}
        )
        return out.groupby("center_id", as_index=False).sum()

    agg = grouped_sums(
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True),
        ["center_id"],
        {"n_assigned": "n_assigned", "sum_dim0": "sum_dim0", "mass": "mass"},
    ).to_pandas()
    out = agg.sort_values("center_id", ignore_index=True)
    return _i64(out, ["center_id", "n_assigned", "sum_dim0", "mass"])


SQL_LLOYD_STEP_QUANTIZED = f"""
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(FLOOR(CAST(UNNEST(embedding) AS DOUBLE) * 1000) AS BIGINT) AS qv
  FROM embeddings),
cid AS (SELECT vec_id AS center_id,
               ROW_NUMBER() OVER (ORDER BY vec_id) AS c
        FROM (SELECT DISTINCT vec_id FROM embeddings ORDER BY vec_id LIMIT {_LLOYD_K})),
cvec AS (SELECT cid.center_id, q.i, q.qv FROM cid JOIN q ON q.vec_id = cid.center_id),
dist AS (
  SELECT q.vec_id, cv.center_id,
         SUM((q.qv - cv.qv) * (q.qv - cv.qv)) AS d
  FROM q JOIN cvec cv ON cv.i = q.i
  GROUP BY 1, 2),
best AS (
  SELECT vec_id, center_id,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, center_id) AS rk
  FROM dist),
asg AS (SELECT vec_id, center_id FROM best WHERE rk = 1),
feat AS (
  SELECT vec_id, MAX(CASE WHEN i = 1 THEN qv END) AS dim0,
         CAST(SUM(qv) AS BIGINT) AS mass
  FROM q GROUP BY 1)
SELECT a.center_id, COUNT(*) AS n_assigned,
       CAST(SUM(f.dim0) AS BIGINT) AS sum_dim0, CAST(SUM(f.mass) AS BIGINT) AS mass
FROM asg a JOIN feat f ON f.vec_id = a.vec_id
GROUP BY 1 ORDER BY a.center_id
"""


_KAPPA_A_WORDS = 20
_KAPPA_B_CHARS = 120


def q_cohens_kappa(sf_dir: str) -> pd.DataFrame:
    """Cohen's kappa inter-annotator agreement between two deterministic
    labeling rules (A: ≥20 words, B: ≥120 chars) — the annotation-quality
    gate an eval-data pipeline runs before trusting labels.  The confusion
    matrix is four integer counters from one combiner pass; kappa closes
    driver-side in the oracle's exact double expressions, rounded 6."""
    ds = _t(sf_dir, "documents", ["text", "n_chars"])

    def part(t: pa.Table) -> pd.DataFrame:
        lst = pc.split_pattern(t["text"], " ").combine_chunks()
        nw = np.diff(np.asarray(lst.offsets, dtype=np.int64))
        nc = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        a = nw >= _KAPPA_A_WORDS
        b = nc >= _KAPPA_B_CHARS
        return pd.DataFrame(
            {"yy": [int((a & b).sum())], "yn": [int((a & ~b).sum())],
             "ny": [int((~a & b).sum())], "nn": [int((~a & ~b).sum())]}
        )

    p = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    yy, yn = int(p["yy"].sum()), int(p["yn"].sum())
    ny, nn = int(p["ny"].sum()), int(p["nn"].sum())
    n = yy + yn + ny + nn
    po = float(yy + nn) / float(n)
    pe = (
        float(yy + yn) * float(yy + ny) + float(ny + nn) * float(yn + nn)
    ) / (float(n) * float(n))
    kappa = float("nan") if pe == 1.0 else (po - pe) / (1.0 - pe)
    out = pd.DataFrame(
        [{"yy": yy, "yn": yn, "ny": ny, "nn": nn,
          "po": _rd(po, 6), "pe": _rd(pe, 6), "kappa": _rd(kappa, 6)}]
    )
    return _i64(out, ["yy", "yn", "ny", "nn"])


SQL_COHENS_KAPPA = f"""
WITH lab AS (
  SELECT CASE WHEN LEN(string_split(text, ' ')) >= {_KAPPA_A_WORDS} THEN 1 ELSE 0 END AS a,
         CASE WHEN n_chars >= {_KAPPA_B_CHARS} THEN 1 ELSE 0 END AS b
  FROM documents),
c AS (SELECT
        CAST(SUM(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS yy,
        CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS yn,
        CAST(SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ny,
        CAST(SUM(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nn,
        COUNT(*) AS n
      FROM lab),
m AS (SELECT yy, yn, ny, nn,
             CAST(yy + nn AS DOUBLE) / CAST(n AS DOUBLE) AS po,
             (CAST(yy + yn AS DOUBLE) * CAST(yy + ny AS DOUBLE)
              + CAST(ny + nn AS DOUBLE) * CAST(yn + nn AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS pe
      FROM c)
SELECT yy, yn, ny, nn, ROUND(po, 6) AS po, ROUND(pe, 6) AS pe,
       CASE WHEN pe = 1.0 THEN CAST('nan' AS DOUBLE)
            ELSE ROUND((po - pe) / (1.0 - pe), 6) END AS kappa
FROM m
"""


# ---------------------------------------------------------------------------
# Wave 25: champion lists, leave-one-source-out ablation, SLO burn-rate
# alerts
# ---------------------------------------------------------------------------

_CHAMP_TERMS = 20
_CHAMP_K = 5


def q_champion_lists(sf_dir: str) -> pd.DataFrame:
    """Tiered-index champion lists (Manning et al. IR ch.7): for the 20
    highest-frequency terms, the 5 docs with the highest term frequency —
    the static high-score tier a search engine consults before touching full
    postings.  Term counts reduce once; per-doc tf needs no exchange (a doc
    is one row); the champion cut is a per-term distributed top-k prune."""
    from ..functions.relational import grouped_topk

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
    top = topk(wc, ["c", "w"], [True, False], _CHAMP_TERMS).to_pandas()
    terms = set(top["w"].astype(str))

    def tf_rows(t: pa.Table, *, _terms=terms) -> pd.DataFrame:
        lst = pc.split_pattern(t["text"], " ").combine_chunks()
        off = np.asarray(lst.offsets, dtype=np.int64)
        lens = np.diff(off)
        w = lst.values.to_numpy(zero_copy_only=False)
        ids = np.repeat(
            t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64), lens
        )
        keep = np.isin(w, list(_terms))
        df = pd.DataFrame({"term": w[keep], "doc_id": ids[keep], "tf": 1})
        return df.groupby(["term", "doc_id"], as_index=False).sum()

    tf = ds.map_batches(tf_rows, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_topk(tf, ["term"], ["tf", "doc_id"], [True, False], _CHAMP_K).to_pandas()
    out = out.sort_values(["term", "tf", "doc_id"], ascending=[True, False, True],
                          ignore_index=True)
    return _i64(out, ["doc_id", "tf"])


SQL_CHAMPION_LISTS = f"""
WITH w AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS wd FROM documents),
cnt AS (SELECT wd, COUNT(*) AS c FROM w GROUP BY 1),
top AS (SELECT wd FROM cnt ORDER BY c DESC, wd LIMIT {_CHAMP_TERMS}),
tf AS (SELECT w.wd AS term, w.doc_id, COUNT(*) AS tf
       FROM w JOIN top ON top.wd = w.wd GROUP BY 1, 2),
rk AS (SELECT term, doc_id, tf,
              ROW_NUMBER() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS r
       FROM tf)
SELECT term, doc_id, tf FROM rk WHERE r <= {_CHAMP_K}
ORDER BY term, tf DESC, doc_id
"""


def q_loso_quality_delta(sf_dir: str) -> pd.DataFrame:
    """Leave-one-source-out ablation bookkeeping (the source-valuation sweep
    a data-mixing team runs before dropping a crawl): for each source, how
    the corpus mean doc length moves when that source is removed.  One
    (source → sum, n) combiner exchange; every LOSO mean closes from the
    same two exact integers, so the sweep costs one pass regardless of
    source count."""
    ds = _t(sf_dir, "documents", ["source", "n_chars"])

    g = grouped_sums(
        ds, ["source"], {"chars": "n_chars"}, "n_docs"
    ).to_pandas().sort_values("source", ignore_index=True)
    tot_c = int(g["chars"].sum())
    tot_n = int(g["n_docs"].sum())
    mean_all = float(tot_c) / float(tot_n)
    rows = []
    for _, r in g.iterrows():
        rc, rn = tot_c - int(r["chars"]), tot_n - int(r["n_docs"])
        mean_wo = float("nan") if rn == 0 else float(rc) / float(rn)
        rows.append(
            (r["source"], int(r["n_docs"]), _rd(mean_wo, 6), _rd(mean_wo - mean_all, 6))
        )
    out = pd.DataFrame(rows, columns=["source", "n_docs", "mean_without", "delta"])
    return _i64(out, ["n_docs"])


SQL_LOSO_QUALITY_DELTA = """
WITH g AS (SELECT source, COUNT(*) AS n_docs,
                  CAST(SUM(n_chars) AS BIGINT) AS chars
           FROM documents GROUP BY 1),
tot AS (SELECT CAST(SUM(chars) AS BIGINT) AS tc, CAST(SUM(n_docs) AS BIGINT) AS tn
        FROM g)
SELECT g.source, g.n_docs,
       ROUND(CAST(tot.tc - g.chars AS DOUBLE) / CAST(tot.tn - g.n_docs AS DOUBLE), 6)
         AS mean_without,
       ROUND(CAST(tot.tc - g.chars AS DOUBLE) / CAST(tot.tn - g.n_docs AS DOUBLE)
             - CAST(tot.tc AS DOUBLE) / CAST(tot.tn AS DOUBLE), 6) AS delta
FROM g CROSS JOIN tot ORDER BY g.source
"""


_BURN_SHORT = 2   # hours
_BURN_LONG = 12
_BURN_DIV = 10    # alert when error rate > 1/10 in BOTH windows


def q_burn_rate_alerts(sf_dir: str) -> pd.DataFrame:
    """Multi-window SLO burn-rate alerting (the Google SRE workbook rule):
    an hour alerts when the error rate exceeds the budget (10%) over BOTH
    the 2-hour and 12-hour trailing windows — verdicts by INTEGER
    cross-multiplication (10·err > tot), no float rates.  The stream
    collapses to hourly (errors, total) combiners; window sums are two
    prefix-sum scans over the calendar-bounded dense series.  First 20
    alerting hours."""
    ds = _t(sf_dir, "events", ["ts", "event_type"])

    def part(t: pa.Table) -> pd.DataFrame:
        h = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False) // 3_600_000_000
        err = pc.equal(t["event_type"], "error").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"h": h, "err": err.astype(np.int64), "tot": 1})
        return df.groupby("h", as_index=False).sum()

    hourly = grouped_sums(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["h"], {"err": "err", "tot": "tot"},
    ).to_pandas().sort_values("h", ignore_index=True)
    h0, h1 = int(hourly["h"].min()), int(hourly["h"].max())
    T = h1 - h0 + 1
    err = np.zeros(T, np.int64)
    tot = np.zeros(T, np.int64)
    idx = hourly["h"].to_numpy(np.int64) - h0
    err[idx] = hourly["err"].to_numpy(np.int64)
    tot[idx] = hourly["tot"].to_numpy(np.int64)
    ce = np.r_[np.int64(0), np.cumsum(err)]
    ct = np.r_[np.int64(0), np.cumsum(tot)]

    def wsum(c: np.ndarray, w: int) -> np.ndarray:
        lo = np.maximum(np.arange(T) - w + 1, 0)
        return c[np.arange(T) + 1] - c[lo]

    es, ts_ = wsum(ce, _BURN_SHORT), wsum(ct, _BURN_SHORT)
    el, tl = wsum(ce, _BURN_LONG), wsum(ct, _BURN_LONG)
    alert = (_BURN_DIV * es > ts_) & (_BURN_DIV * el > tl) & (ts_ > 0) & (tl > 0)
    hs = np.nonzero(alert)[0][:20]
    out = pd.DataFrame(
        {"hour_id": hs + h0, "err_short": es[hs], "tot_short": ts_[hs],
         "err_long": el[hs], "tot_long": tl[hs]}
    )
    return _i64(out, ["hour_id", "err_short", "tot_short", "err_long", "tot_long"])


SQL_BURN_RATE_ALERTS = f"""
WITH e AS (
  SELECT epoch_us(ts) // 3600000000 AS h,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS err
  FROM events),
g AS (SELECT h, CAST(SUM(err) AS BIGINT) AS err, COUNT(*) AS tot FROM e GROUP BY 1),
mm AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM g),
dense AS (
  SELECT gs.h, COALESCE(g.err, 0) AS err, COALESCE(g.tot, 0) AS tot
  FROM (SELECT UNNEST(generate_series((SELECT h0 FROM mm), (SELECT h1 FROM mm)))
          AS h) gs
  LEFT JOIN g ON g.h = gs.h),
w AS (
  SELECT h,
         SUM(err) OVER (ORDER BY h ROWS BETWEEN {_BURN_SHORT - 1} PRECEDING AND CURRENT ROW) AS es,
         SUM(tot) OVER (ORDER BY h ROWS BETWEEN {_BURN_SHORT - 1} PRECEDING AND CURRENT ROW) AS ts,
         SUM(err) OVER (ORDER BY h ROWS BETWEEN {_BURN_LONG - 1} PRECEDING AND CURRENT ROW) AS el,
         SUM(tot) OVER (ORDER BY h ROWS BETWEEN {_BURN_LONG - 1} PRECEDING AND CURRENT ROW) AS tl
  FROM dense)
SELECT h AS hour_id, CAST(es AS BIGINT) AS err_short, CAST(ts AS BIGINT) AS tot_short,
       CAST(el AS BIGINT) AS err_long, CAST(tl AS BIGINT) AS tot_long
FROM w
WHERE {_BURN_DIV} * es > ts AND {_BURN_DIV} * el > tl AND ts > 0 AND tl > 0
ORDER BY h LIMIT 20
"""


# ---------------------------------------------------------------------------
# Wave 26: 1-D Wasserstein shift, dictionary id assignment, exact streaming
# moments
# ---------------------------------------------------------------------------


def q_wasserstein_1d(sf_dir: str) -> pd.DataFrame:
    """Exact 1-D Wasserstein (earth-mover) distance between the treatment
    and control purchase-cents distributions — the ordered-data drift metric
    PSI can't give you: W₁ = Σ gap·|F_a−F_b| over the union support,
    computed as Σ gap·|ca·n_b − cb·n_a| in arbitrary-precision INTEGERS
    (HUGEINT on the oracle) with one double division at the very end.  The
    stream collapses to a (cents, group) histogram combiner; the support
    scan is value-bounded, not row-bounded."""
    ds = _t(sf_dir, "events", ["user_id", "event_type", "value"])

    def part(t: pa.Table) -> pd.DataFrame:
        is_p = pc.equal(t["event_type"], "purchase").to_numpy(zero_copy_only=False)
        if not is_p.any():
            return pd.DataFrame({"cents": pd.Series([], dtype="int64"),
                                 "grp": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)[is_p]
        cents = _rd(t["value"].to_numpy(zero_copy_only=False)[is_p] * 100.0, 0).astype(np.int64)
        df = pd.DataFrame(
            {"cents": cents, "grp": np.where(uid % 2 == 1, "a", "b"), "n": 1}
        )
        return df.groupby(["cents", "grp"], as_index=False).sum()

    hist = grouped_sums(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["cents", "grp"],
        {"n": "n"},
    ).to_pandas()
    piv = hist.pivot_table(index="cents", columns="grp", values="n",
                           aggfunc="sum", fill_value=0).sort_index()
    ca = piv.get("a", pd.Series(0, index=piv.index)).to_numpy(np.int64).cumsum()
    cb = piv.get("b", pd.Series(0, index=piv.index)).to_numpy(np.int64).cumsum()
    vals = piv.index.to_numpy(np.int64)
    na, nb = int(ca[-1]), int(cb[-1])
    num = 0
    for k in range(len(vals) - 1):
        gap = int(vals[k + 1]) - int(vals[k])
        num += gap * abs(int(ca[k]) * nb - int(cb[k]) * na)
    w1 = float("nan") if na == 0 or nb == 0 else float(num) / float(na * nb)
    out = pd.DataFrame([{"n_a": na, "n_b": nb, "w1_cents": _rd(w1, 6)}])
    return _i64(out, ["n_a", "n_b"])


SQL_WASSERSTEIN_1D = """
WITH p AS (
  SELECT CASE WHEN user_id % 2 = 1 THEN 'a' ELSE 'b' END AS grp,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'),
h AS (SELECT cents,
             CAST(SUM(CASE WHEN grp = 'a' THEN 1 ELSE 0 END) AS HUGEINT) AS da,
             CAST(SUM(CASE WHEN grp = 'b' THEN 1 ELSE 0 END) AS HUGEINT) AS db
      FROM p GROUP BY 1),
tot AS (SELECT SUM(da) AS na, SUM(db) AS nb FROM h),
c AS (SELECT cents,
             SUM(da) OVER (ORDER BY cents) AS ca,
             SUM(db) OVER (ORDER BY cents) AS cb,
             LEAD(cents) OVER (ORDER BY cents) AS nxt
      FROM h),
s AS (SELECT SUM((nxt - cents) * ABS(ca * (SELECT nb FROM tot)
                                     - cb * (SELECT na FROM tot))) AS num
      FROM c WHERE nxt IS NOT NULL)
SELECT CAST((SELECT na FROM tot) AS BIGINT) AS n_a,
       CAST((SELECT nb FROM tot) AS BIGINT) AS n_b,
       ROUND(CAST(num AS DOUBLE)
             / CAST((SELECT na FROM tot) * (SELECT nb FROM tot) AS DOUBLE), 6)
         AS w1_cents
FROM s
"""


def q_vocab_id_assignment(sf_dir: str) -> pd.DataFrame:
    """Dictionary-encoding id assignment (tokenizer vocab building / global
    dictionary for columnar encoding): every distinct word gets a dense id
    ordered by (first containing doc_id, word) — deterministic across
    partitionings because first-appearance is a min-combiner, not an
    arrival-order artifact.  One (word → min doc) exchange; the rank runs
    over the vocab-bounded table.  First 30 ids plus the vocab size."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def part(t: pa.Table) -> pd.DataFrame:
        lst = pc.split_pattern(t["text"], " ").combine_chunks()
        off = np.asarray(lst.offsets, dtype=np.int64)
        lens = np.diff(off)
        ids = np.repeat(
            t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64), lens
        )
        w = lst.values.to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"w": w, "first_doc": ids})
        return df.groupby("w", as_index=False).min()

    firsts = (
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby("w", as_index=False)["first_doc"]
        .min()
    )
    firsts = firsts.sort_values(["first_doc", "w"], ignore_index=True)
    firsts["vocab_id"] = np.arange(1, len(firsts) + 1, dtype=np.int64)
    firsts["vocab_size"] = len(firsts)
    out = firsts.head(30)[["vocab_id", "w", "first_doc", "vocab_size"]]
    return _i64(out.copy(), ["vocab_id", "first_doc", "vocab_size"])


SQL_VOCAB_ID_ASSIGNMENT = """
WITH w AS (
  SELECT UNNEST(string_split(text, ' ')) AS w, doc_id FROM documents),
f AS (SELECT w, MIN(doc_id) AS first_doc FROM w GROUP BY 1),
r AS (SELECT w, first_doc,
             ROW_NUMBER() OVER (ORDER BY first_doc, w) AS vocab_id,
             COUNT(*) OVER () AS vocab_size
      FROM f)
SELECT vocab_id, w, first_doc, CAST(vocab_size AS BIGINT) AS vocab_size
FROM r ORDER BY vocab_id LIMIT 30
"""


def q_streaming_moments(sf_dir: str) -> pd.DataFrame:
    """Exact mergeable moments (mean/variance/skewness/kurtosis) of purchase
    cents from raw power sums S₁..S₄ — S₄ overflows int64 (cents⁴ × rows ≈
    10²⁶), so per-batch partials carry S₃/S₄ as DECIMAL-free STRINGS of
    arbitrary-precision Python ints and the driver folds them exactly; the
    oracle sums the same powers in HUGEINT.  The classic estimator closes
    from the six exact sums in identical double expressions on both
    engines.  One combiner pass, scalar exchange."""
    import math

    ds = _t(sf_dir, "events", ["event_type", "value"])

    def part(t: pa.Table) -> pd.DataFrame:
        is_p = pc.equal(t["event_type"], "purchase").to_numpy(zero_copy_only=False)
        cents = _rd(t["value"].to_numpy(zero_copy_only=False)[is_p] * 100.0, 0).astype(np.int64)
        c = [int(x) for x in cents]
        # s2 rides the same arbitrary-precision string channel as s3/s4:
        # cents² is ~1e14, so a batch of ~9e4 max-value rows would already
        # brush 2^63 in an int64 partial while the oracle sums in HUGEINT.
        return pd.DataFrame(
            {"n": [len(c)], "s1": [str(sum(c))], "s2": [str(sum(x * x for x in c))],
             "s3": [str(sum(x ** 3 for x in c))], "s4": [str(sum(x ** 4 for x in c))]}
        )

    p = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    n = int(p["n"].sum())
    s1 = sum(int(x) for x in p["s1"])
    s2 = sum(int(x) for x in p["s2"])
    s3 = sum(int(x) for x in p["s3"])
    s4 = sum(int(x) for x in p["s4"])
    m = float(s1) / float(n)
    ex2 = float(s2) / float(n)
    ex3 = float(s3) / float(n)
    ex4 = float(s4) / float(n)
    var = ex2 - m * m
    skew = (ex3 - 3.0 * m * ex2 + 2.0 * m * m * m) / math.pow(var, 1.5)
    kurt = (ex4 - 4.0 * m * ex3 + 6.0 * m * m * ex2 - 3.0 * m * m * m * m) / (var * var)
    out = pd.DataFrame(
        [{"n": n, "mean_cents": _rd(m, 6), "var_cents": _rd(var, 6),
          "skewness": _rd(skew, 6), "kurtosis": _rd(kurt, 6)}]
    )
    return _i64(out, ["n"])


SQL_STREAMING_MOMENTS = """
WITH p AS (
  SELECT CAST(ROUND(value * 100, 0) AS HUGEINT) AS c
  FROM events WHERE event_type = 'purchase'),
s AS (SELECT COUNT(*) AS n, SUM(c) AS s1, SUM(c * c) AS s2,
             SUM(c * c * c) AS s3, SUM(c * c * c * c) AS s4
      FROM p),
e AS (SELECT n,
             CAST(s1 AS DOUBLE) / n AS m,
             CAST(s2 AS DOUBLE) / n AS ex2,
             CAST(s3 AS DOUBLE) / n AS ex3,
             CAST(s4 AS DOUBLE) / n AS ex4
      FROM s),
v AS (SELECT n, m, ex2, ex3, ex4, ex2 - m * m AS var FROM e)
SELECT n, ROUND(m, 6) AS mean_cents, ROUND(var, 6) AS var_cents,
       ROUND((ex3 - 3.0 * m * ex2 + 2.0 * m * m * m) / POWER(var, 1.5), 6)
         AS skewness,
       ROUND((ex4 - 4.0 * m * ex3 + 6.0 * m * m * ex2 - 3.0 * m * m * m * m)
             / (var * var), 6) AS kurtosis
FROM v
"""


# ---------------------------------------------------------------------------
# Wave 27: top-p nucleus vocab cut, DP clipped mean
# ---------------------------------------------------------------------------

_NUCLEUS_NUM = 9
_NUCLEUS_DEN = 10


def q_nucleus_vocab_cut(sf_dir: str) -> pd.DataFrame:
    """Top-p (nucleus) vocabulary cut per source — the vocab-truncation
    analysis behind nucleus sampling and frequency-pruned tokenizers: the
    smallest prefix of the frequency-sorted vocabulary covering ≥ 90% of
    token mass, with the threshold ⌈0.9·total⌉ taken in INTEGERS so the cut
    index is exact.  One (source, word) combiner exchange; the cut scan runs
    per source over its vocab-bounded histogram."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "documents", ["source", "text"])

    def wc(t: pa.Table) -> pd.DataFrame:
        lst = pc.split_pattern(t["text"], " ").combine_chunks()
        off = np.asarray(lst.offsets, dtype=np.int64)
        lens = np.diff(off)
        src = np.repeat(np.asarray(t["source"].to_pylist(), dtype=object), lens)
        w = lst.values.to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"source": src, "w": w, "c": 1})
        return df.groupby(["source", "w"], as_index=False).sum()

    counts = grouped_sums(
        ds.map_batches(wc, batch_format="pyarrow", zero_copy_batch=True),
        ["source", "w"],
        {"c": "c"},
    )

    def per_source(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, g in df.groupby("source", sort=True):
            g = g.sort_values(["c", "w"], ascending=[False, True], kind="stable")
            c = g["c"].to_numpy(np.int64)
            tot = int(c.sum())
            thresh = (_NUCLEUS_NUM * tot + _NUCLEUS_DEN - 1) // _NUCLEUS_DEN
            cum = np.cumsum(c)
            k = int(np.searchsorted(cum, thresh))
            rows.append((src, len(c), tot, k + 1, int(cum[k])))
        return pd.DataFrame(
            rows,
            columns=["source", "vocab_size", "total_words", "n_nucleus",
                     "nucleus_mass"],
        )

    out = (
        bucketed_group_reduce(counts, ["source"], per_source, num_buckets=16)
        .to_pandas()
        .sort_values("source", ignore_index=True)
    )
    return _i64(out, ["vocab_size", "total_words", "n_nucleus", "nucleus_mass"])


SQL_NUCLEUS_VOCAB_CUT = f"""
WITH w AS (
  SELECT source, UNNEST(string_split(text, ' ')) AS wd FROM documents),
cnt AS (SELECT source, wd, COUNT(*) AS c FROM w GROUP BY 1, 2),
tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS total_words,
               COUNT(*) AS vocab_size
        FROM cnt GROUP BY 1),
r AS (SELECT source, c,
             SUM(c) OVER (PARTITION BY source ORDER BY c DESC, wd) AS cum,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY c DESC, wd) AS rn
      FROM cnt),
cut AS (
  SELECT r.source, MIN(r.rn) AS n_nucleus
  FROM r JOIN tot ON tot.source = r.source
  WHERE r.cum >= ({_NUCLEUS_NUM} * tot.total_words + {_NUCLEUS_DEN} - 1)
                 // {_NUCLEUS_DEN}
  GROUP BY 1),
mass AS (
  SELECT r.source, CAST(r.cum AS BIGINT) AS nucleus_mass, r.rn
  FROM r JOIN cut ON cut.source = r.source AND cut.n_nucleus = r.rn)
SELECT tot.source, tot.vocab_size, tot.total_words,
       CAST(cut.n_nucleus AS BIGINT) AS n_nucleus, mass.nucleus_mass
FROM tot JOIN cut ON cut.source = tot.source
JOIN mass ON mass.source = tot.source
ORDER BY tot.source
"""


_DP_CLIP = 10_000  # cents


def q_dp_clipped_mean(sf_dir: str) -> pd.DataFrame:
    """Differentially-private mean release (ε=1, clip-and-Laplace — the
    standard bounded-sensitivity recipe): per-type event cents clip to
    [0, 10000], the
    exact clipped sum gets Laplace noise of scale C/ε from the md5-seeded
    deterministic uniform (dp_event_counts convention, LN parity), and the
    released mean divides by the exact count.  One combiner exchange; noise
    applies to bounded per-type rows driver-side."""
    import math

    ds = _t(sf_dir, "events", ["event_type", "value"])

    def part(t: pa.Table) -> pd.DataFrame:
        cents = _rd(t["value"].to_numpy(zero_copy_only=False) * 100.0, 0).astype(np.int64)
        clipped = np.minimum(np.maximum(cents, 0), _DP_CLIP)
        typ = np.asarray(t["event_type"].to_pylist(), dtype=object)
        df = pd.DataFrame({"event_type": typ, "n": 1, "s": clipped})
        return df.groupby("event_type", as_index=False).sum()

    g = grouped_sums(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type"],
        {"n": "n", "s": "s"},
    ).to_pandas().sort_values("event_type", ignore_index=True)
    rel = []
    for et, n, s in zip(g["event_type"], g["n"].astype(int), g["s"].astype(int)):
        u = int(md5_hex_str(str(et) + ":mean")[:12], 16) / float(1 << 48)
        noise = math.log(2 * u) if u < 0.5 else -math.log(2 - 2 * u)
        rel.append(_rd((float(s) + _DP_CLIP * noise) / float(n), 6))
    g["noisy_mean"] = rel
    return _i64(g, ["n", "s"])


SQL_DP_CLIPPED_MEAN = f"""
WITH p AS (
  SELECT event_type,
         LEAST(GREATEST(CAST(ROUND(value * 100, 0) AS BIGINT), 0), {_DP_CLIP}) AS c
  FROM events),
g AS (SELECT event_type, COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS s
      FROM p GROUP BY 1),
u AS (SELECT event_type, n, s,
             CAST('0x' || substr(md5(event_type || ':mean'), 1, 12) AS BIGINT)
               / 281474976710656.0 AS u
      FROM g)
SELECT event_type, n, s,
       ROUND((CAST(s AS DOUBLE)
              + {_DP_CLIP} * CASE WHEN u < 0.5 THEN LN(2 * u)
                                  ELSE -LN(2 - 2 * u) END)
             / CAST(n AS DOUBLE), 6) AS noisy_mean
FROM u ORDER BY event_type
"""


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


# ---------------------------------------------------------------------------
# Wave 29: DP degree histogram, quality-aware canonical selection
# ---------------------------------------------------------------------------

_DPG_CLIP = 20


def q_dp_degree_histogram(sf_dir: str) -> pd.DataFrame:
    """Differentially-private graph-degree release with edge clipping (the
    node-DP recipe: clip each node's degree at D so one node's edges move
    any bucket by ≤ 1 after projection, then Laplace(2D/ε)): co-purchase
    degrees clip at 20, histogram over 4 integer buckets, md5-seeded
    deterministic noise (dp_event_counts convention).  Degrees come from one
    bounded grouped count; the release is 4 rows."""
    import math

    edges = _copurchase_weighted_edges(sf_dir)
    deg = grouped_sums(edges, ["src"], {}, "deg").to_pandas()
    d = np.minimum(deg["deg"].to_numpy(np.int64), _DPG_CLIP)
    bucket = np.select(
        [d <= 5, d <= 10, d <= 15],
        ["1-5", "6-10", "11-15"],
        default="16-20",
    )
    g = pd.DataFrame({"bucket": bucket, "n": 1}).groupby(
        "bucket", as_index=False
    ).sum()
    noisy = []
    for b, n in zip(g["bucket"], g["n"].astype(int)):
        u = int(md5_hex_str("deg:" + str(b))[:12], 16) / float(1 << 48)
        noise = math.log(2 * u) if u < 0.5 else -math.log(2 - 2 * u)
        noisy.append(_rd(n + 2 * _DPG_CLIP * noise, 6))
    g["noisy_n"] = noisy
    out = g.sort_values("bucket", ignore_index=True)
    return _i64(out, ["n"])


SQL_DP_DEGREE_HISTOGRAM = f"""
WITH pairs AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON b.l_orderkey = a.l_orderkey AND a.l_partkey <> b.l_partkey),
deg AS (SELECT src, LEAST(COUNT(*), {_DPG_CLIP}) AS d FROM pairs GROUP BY 1),
h AS (SELECT CASE WHEN d <= 5 THEN '1-5' WHEN d <= 10 THEN '6-10'
                  WHEN d <= 15 THEN '11-15' ELSE '16-20' END AS bucket,
             COUNT(*) AS n
      FROM deg GROUP BY 1),
u AS (SELECT bucket, n,
             CAST('0x' || substr(md5('deg:' || bucket), 1, 12) AS BIGINT)
               / 281474976710656.0 AS u
      FROM h)
SELECT bucket, n,
       ROUND(n + 2 * {_DPG_CLIP} * CASE WHEN u < 0.5 THEN LN(2 * u)
                                        ELSE -LN(2 - 2 * u) END, 6) AS noisy_n
FROM u ORDER BY bucket
"""


def q_canonical_selection(sf_dir: str) -> pd.DataFrame:
    """Quality-aware canonical selection for exact-duplicate clusters: keep
    the LONGEST copy (n_chars desc, doc_id asc) instead of the min-id — the
    survivorship policy real dedup ships, because near-identical crawls
    differ by truncation.  One content-fp bucketed exchange carries
    (fp, doc, chars) rows; argmax folds as a combiner; the 15 biggest
    clusters surface through a distributed top-k prune (singletons rank
    last), so the driver never holds the cluster table."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def tag(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {"fp": md5_hex(t["text"]).to_pylist(),
             "doc_id": t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
             "n_chars": t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)}
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)

    def per_fp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["fp", "n_chars", "doc_id"],
                            ascending=[True, False, True], kind="stable")
        return df.groupby("fp", as_index=False).agg(
            n_copies=("doc_id", "count"),
            keeper=("doc_id", "first"),
            keeper_chars=("n_chars", "first"),
        )

    clusters = bucketed_group_reduce(tagged, ["fp"], per_fp, num_buckets=32)
    out = topk(clusters, ["n_copies", "fp"], [True, False], 15).to_pandas()
    return _i64(out, ["n_copies", "keeper", "keeper_chars"]).reset_index(drop=True)


SQL_CANONICAL_SELECTION = """
WITH d AS (SELECT doc_id, n_chars, md5(text) AS fp FROM documents),
r AS (SELECT fp, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY fp ORDER BY n_chars DESC, doc_id) AS rk,
             COUNT(*) OVER (PARTITION BY fp) AS n_copies
      FROM d)
SELECT fp, n_copies, doc_id AS keeper, n_chars AS keeper_chars
FROM r WHERE rk = 1
ORDER BY n_copies DESC, fp LIMIT 15
"""


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

    from ..functions.relational import grouped_topk

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


# ---------------------------------------------------------------------------
# Wave 31: prefix-filter similarity join, Markov stationary distribution
# ---------------------------------------------------------------------------

_PFJ_T_NUM = 3
_PFJ_T_DEN = 5  # Jaccard threshold 3/5


def q_prefix_filter_join(sf_dir: str) -> pd.DataFrame:
    """Prefix-filtered set-similarity join (PPJoin family, Xiao et al.
    2008): exact Jaccard ≥ 0.6 pairs over 3-word SHINGLE sets, found
    without all pairs — order every set by global df (rarest first), keep
    only the first |d| − ⌈0.6·|d|⌉ + 1 shingles as the PREFIX (any
    qualifying pair must share a prefix shingle), generate candidates via
    one prefix-shingle exchange, verify exactly with integer
    cross-multiplication (5·|A∩B| ≥ 3·|A∪B|).  The oracle is the
    EXHAUSTIVE pairwise join, so a single missed pair breaks the hash —
    the pruning math itself is under test.  Shingles (unlike unigrams on a
    small vocabulary) are globally rare, so prefix groups stay tiny and
    candidates are near-dup-bounded; verification is FULLY DISTRIBUTED:
    candidate pairs pull their two docs' shingle sets through two
    hash-partitioned joins keyed on doc id (duplication bounded by the
    candidate count), and each worker scores its pairs with the integer
    cross-multiplication — no candidate list or shingle set ever
    materializes on the driver."""
    from ..functions.relational import bucketed_group_reduce, hash_join

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def wd_rows(t: pa.Table) -> pd.DataFrame:
        lst = pc.split_pattern(t["text"], " ").combine_chunks()
        off = np.asarray(lst.offsets, dtype=np.int64)
        vals = lst.values
        L = len(vals)
        if L < 3:
            return pd.DataFrame({"w": pd.Series([], dtype=object),
                                 "doc_id": pd.Series([], dtype="int64")})
        # shingle i is internal iff i+2 stays inside the same doc
        internal = np.ones(L - 2, dtype=bool)
        starts = off[1:-1]
        for d in (1, 2):
            hit = starts - d
            internal[hit[(hit >= 0) & (hit < L - 2)]] = False
        lens = np.diff(off)
        ids = np.repeat(
            t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            np.maximum(lens - 2, 0),
        )
        # one Arrow kernel builds all shingle strings (np.char.add chains
        # were ~10× slower on wide batches)
        joined = pc.binary_join_element_wise(
            vals.slice(0, L - 2), vals.slice(1, L - 2), vals.slice(2, L - 2), " "
        )
        sh = joined.filter(pa.array(internal)).to_numpy(zero_copy_only=False)
        return pd.DataFrame({"w": sh, "doc_id": ids}).drop_duplicates()

    # a (shingle, doc) pair originates from exactly one row/batch, so the
    # per-batch dedup in wd_rows is already global-distinct
    wd = ds.map_batches(
        wd_rows, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def attach_df(df: pd.DataFrame) -> pd.DataFrame:
        # all rows of a shingle are co-located: df is complete in-bucket —
        # no driver-side dictionary ever ships to workers
        df = df.copy()
        df["df"] = df.groupby("w")["doc_id"].transform("size").astype(np.int64)
        return df

    wdf = bucketed_group_reduce(wd, ["w"], attach_df, num_buckets=32)

    def prefixes(df: pd.DataFrame) -> pd.DataFrame:
        # per doc: sort shingles by (df asc, shingle asc), keep the prefix;
        # carry the 1-based position in the sorted FULL set plus the set
        # size so pair generation can apply the length + positional filters
        df = df.sort_values(["doc_id", "df", "w"], kind="stable")
        size = df.groupby("doc_id")["w"].transform("size").to_numpy(np.int64)
        rk = df.groupby("doc_id", sort=False).cumcount().to_numpy()
        ceil_t = (_PFJ_T_NUM * size + _PFJ_T_DEN - 1) // _PFJ_T_DEN
        plen = size - ceil_t + 1
        keep = rk < plen
        out = df[keep][["w", "doc_id"]].copy()
        out["pos"] = (rk[keep] + 1).astype(np.int64)
        out["size"] = size[keep]
        return out

    pref = bucketed_group_reduce(wdf, ["doc_id"], prefixes, num_buckets=32)

    def pairs_per_token(df: pd.DataFrame) -> pd.DataFrame:
        # Xiao et al. 2008 pruning at generation time, both sound (zero
        # false negatives — the exhaustive oracle is the proof):
        #   length filter: Jaccard ≥ 3/5 needs 5·min(|A|,|B|) ≥ 3·max;
        #   positional filter: at the pair's FIRST shared prefix token the
        #     overlap is ≤ 1 + min(|A|−pa, |B|−pb), which must reach
        #     α = ⌈3(|A|+|B|)/8⌉ (8·I ≥ 3(|A|+|B|) ⇔ 5I ≥ 3U); a later
        #     shared token only shrinks the bound, so keeping pairs where
        #     ANY occurrence passes is a sound superset.
        out = []
        for _, g in df.groupby("w", sort=False):
            if len(g) < 2:
                continue
            ids = g["doc_id"].to_numpy(np.int64)
            o = np.argsort(ids)
            ids = ids[o]
            ps = g["pos"].to_numpy(np.int64)[o]
            ns = g["size"].to_numpy(np.int64)[o]
            ii, jj = np.triu_indices(len(ids), k=1)
            na, nb = ns[ii], ns[jj]
            pa, pb = ps[ii], ps[jj]
            alpha = (3 * (na + nb) + 7) // 8
            keep = (
                (5 * np.minimum(na, nb) >= 3 * np.maximum(na, nb))
                & (1 + np.minimum(na - pa, nb - pb) >= alpha)
            )
            if keep.any():
                out.append(pd.DataFrame({"a": ids[ii][keep], "b": ids[jj][keep]}))
        if not out:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64")})
        return pd.concat(out, ignore_index=True).drop_duplicates()

    # Distributed verification in two bucketed exchanges, no Dataset.join
    # aggregator spin-up:
    #   exchange A (key = doc id): union the corpus (shingle, doc) rows with
    #     two half-rows per candidate pair; in-bucket, pack each doc's sorted
    #     shingle set ONCE (vectorized agg) and merge it onto its pair-halves.
    #   exchange B (key = pair): the two packed sets of a pair co-locate;
    #     dedup duplicate candidates (a pair can surface from several prefix
    #     shingles) and score with the integer cross-multiplication.
    pairs_ds = bucketed_group_reduce(pref, ["w"], pairs_per_token, num_buckets=32)

    def halves(t: pa.Table) -> pd.DataFrame:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = len(a)
        return pd.DataFrame(
            {"k": np.concatenate([a, b]),
             "a": np.concatenate([a, a]),
             "b": np.concatenate([b, b]),
             "ws": np.full(2 * m, "", dtype=object),
             "n": np.full(2 * m, -1, dtype=np.int64)}
        )

    def pack_local(t: pa.Table) -> pd.DataFrame:
        # all (shingle, doc) rows of one doc originate from one batch of
        # wd_rows, so the per-doc set packs LOCALLY — no exchange needed
        df = t.to_pandas().sort_values(["doc_id", "w"], kind="stable")
        g = df.groupby("doc_id", sort=False)["w"]
        packed = g.agg("\x00".join).reset_index()
        n = g.size().to_numpy(np.int64)
        return pd.DataFrame(
            {"k": packed["doc_id"].to_numpy(np.int64),
             "a": np.full(len(packed), -1, dtype=np.int64),
             "b": np.full(len(packed), -1, dtype=np.int64),
             "ws": packed["w"].to_numpy(object),
             "n": n}
        )

    mixed = wd.map_batches(
        pack_local, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        pairs_ds.map_batches(halves, batch_format="pyarrow", zero_copy_batch=True)
    )

    _EMPTY = {"a": "int64", "b": "int64", "s": "int64", "ws": object, "n": "int64"}

    def attach_sets(df: pd.DataFrame) -> pd.DataFrame:
        hv = df[df["n"] < 0]
        if hv.empty:
            return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in _EMPTY.items()})
        packed = df[df["n"] >= 0][["k", "ws", "n"]]
        m = hv[["k", "a", "b"]].merge(packed, on="k")
        m = m.rename(columns={"k": "s"})
        return m[["a", "b", "s", "ws", "n"]]

    att = bucketed_group_reduce(mixed, ["k"], attach_sets, num_buckets=32)

    def score_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates().sort_values(["a", "b", "s"], kind="stable")
        a2 = df["a"].to_numpy(np.int64)
        b2 = df["b"].to_numpy(np.int64)
        wsv = df["ws"].to_numpy(object)
        nv = df["n"].to_numpy(np.int64)
        da, db, di, du = [], [], [], []
        for i in range(0, len(df), 2):  # exactly two rows (sides) per pair
            inter = len(set(wsv[i].split("\x00")) & set(wsv[i + 1].split("\x00")))
            uni = int(nv[i]) + int(nv[i + 1]) - inter
            if _PFJ_T_DEN * inter >= _PFJ_T_NUM * uni:
                da.append(int(a2[i])); db.append(int(b2[i]))
                di.append(inter); du.append(uni)
        return pd.DataFrame(
            {"doc_a": pd.Series(da, dtype="int64"),
             "doc_b": pd.Series(db, dtype="int64"),
             "inter": pd.Series(di, dtype="int64"),
             "uni": pd.Series(du, dtype="int64")}
        )

    out = bucketed_group_reduce(att, ["a", "b"], score_bucket,
                                num_buckets=32).to_pandas()
    if out.empty:
        out = pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                            "doc_b": pd.Series([], dtype="int64"),
                            "inter": pd.Series([], dtype="int64"),
                            "uni": pd.Series([], dtype="int64")})
    out = out.sort_values(["doc_a", "doc_b"], ignore_index=True)
    return _i64(out, ["doc_a", "doc_b", "inter", "uni"])


SQL_PREFIX_FILTER_JOIN = f"""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
wd AS (
  SELECT DISTINCT doc_id,
         a[g.i] || ' ' || a[g.i + 1] || ' ' || a[g.i + 2] AS w
  FROM ws, unnest(generate_series(1, len(a) - 2)) AS g(i)),
sz AS (SELECT doc_id, COUNT(*) AS n FROM wd GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
  FROM wd a JOIN wd b ON b.w = a.w AND b.doc_id > a.doc_id
  GROUP BY 1, 2)
SELECT i.doc_a, i.doc_b, CAST(i.i AS BIGINT) AS inter,
       CAST(sa.n + sb.n - i.i AS BIGINT) AS uni
FROM inter i JOIN sz sa ON sa.doc_id = i.doc_a JOIN sz sb ON sb.doc_id = i.doc_b
WHERE {_PFJ_T_DEN} * i.i >= {_PFJ_T_NUM} * (sa.n + sb.n - i.i)
ORDER BY i.doc_a, i.doc_b
"""


_MKV_ITERS = 20
_MKV_MU = 1_000_000


def q_markov_stationary(sf_dir: str) -> pd.DataFrame:
    """Stationary distribution of the user-behaviour Markov chain by
    µ-quantized integer power iteration: transition counts from one
    bucketed LAG exchange (windows.py::transition_matrix shape), then 20
    iterations of x'[j] = Σ_s x[s]·C[s,j] // R[s] — every step floors to
    integers, so both engines run the identical deterministic recursion
    (the oracle unrolls it as 20 chained CTEs).  Reports the fixed point in
    µ units plus the normalized probabilities."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        keys_arr = df["user_id"].to_numpy()
        types = df["event_type"].to_numpy()
        same = np.zeros(len(df), dtype=bool)
        if len(df) > 1:
            same[1:] = keys_arr[1:] == keys_arr[:-1]
        pairs = pd.DataFrame(
            {"s": np.roll(types, 1)[same], "t": types[same], "n": 1}
        )
        return pairs.groupby(["s", "t"], as_index=False).sum()

    counts = grouped_sums(
        bucketed_group_reduce(ds, ["user_id"], per_bucket),
        ["s", "t"],
        {"n": "n"},
    ).to_pandas()
    states = sorted(set(counts["s"].astype(str)) | set(counts["t"].astype(str)))
    idx = {s: k for k, s in enumerate(states)}
    k = len(states)
    C = np.zeros((k, k), dtype=np.int64)
    for s, t, n in zip(counts["s"].astype(str), counts["t"].astype(str),
                       counts["n"].astype(int)):
        C[idx[s], idx[t]] = n
    R = C.sum(axis=1)
    x = np.full(k, _MKV_MU, dtype=np.int64)
    for _ in range(_MKV_ITERS):
        x = np.array(
            [int(sum(int(x[s]) * int(C[s, j]) // int(R[s])
                     for s in range(k) if R[s] > 0))
             for j in range(k)],
            dtype=np.int64,
        )
    tot = int(x.sum())
    out = pd.DataFrame(
        {"state": states, "x_mu": x,
         "pi": _rd(x.astype(np.float64) / float(tot), 6)}
    )
    return _i64(out, ["x_mu"])


def _mkv_sql() -> str:
    head = """
WITH r AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events),
c AS MATERIALIZED (SELECT prev AS s, event_type AS t, CAST(COUNT(*) AS BIGINT) AS n
      FROM r WHERE prev IS NOT NULL GROUP BY 1, 2),
rs AS MATERIALIZED (SELECT s, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY 1),
states AS MATERIALIZED (SELECT DISTINCT s AS st FROM c UNION SELECT DISTINCT t FROM c),
x0 AS MATERIALIZED (SELECT st, CAST(1000000 AS BIGINT) AS x FROM states)"""
    steps = []
    for i in range(1, _MKV_ITERS + 1):
        steps.append(f""",
x{i} AS MATERIALIZED (
  SELECT st.st,
         CAST(COALESCE(SUM(p.x * c.n // rs.tot), 0) AS BIGINT) AS x
  FROM states st
  LEFT JOIN c ON c.t = st.st
  LEFT JOIN rs ON rs.s = c.s
  LEFT JOIN x{i - 1} p ON p.st = c.s
  GROUP BY 1)""")
    tail = f"""
SELECT st AS state, x AS x_mu,
       ROUND(CAST(x AS DOUBLE) / (SELECT CAST(SUM(x) AS DOUBLE) FROM x{_MKV_ITERS}), 6)
         AS pi
FROM x{_MKV_ITERS} ORDER BY state"""
    return head + "".join(steps) + tail


SQL_MARKOV_STATIONARY = _mkv_sql()


# ---------------------------------------------------------------------------
# Wave 32: weighted sampling without replacement, selectivity independence
# audit
# ---------------------------------------------------------------------------

_ES_K = 20


def q_weighted_sample_es(sf_dir: str) -> pd.DataFrame:
    """Weighted sampling WITHOUT replacement by the Efraimidis-Spirakis
    one-pass scheme (2006): each doc draws a deterministic md5-seeded
    uniform u and keeps priority ln(u)/w (equivalent to u^(1/w)); the
    top-k priorities ARE a weight-proportional sample — mergeable, so it
    runs as a plain distributed top-k with no coordination.  The log is
    µ-quantized to an integer before the division (LN-parity convention);
    both engines order by the identical double ratio with doc tie-break.
    Completes the sampling family (hash-order, stratified, Neyman,
    token-budget, temperature) with the weighted-without-replacement
    member."""
    ds = _t(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def pri(t: pa.Table) -> pd.DataFrame:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        hx = md5_hex(
            pc.binary_join_element_wise(
                pc.cast(t["doc_id"], pa.string()), ":es", ""
            )
        ).to_pylist()
        u = (np.array([int(x[:12], 16) for x in hx], dtype=np.int64) + 1) / float(1 << 48)
        q = _rd(np.log(u) * 1e6, 0).astype(np.int64)
        return pd.DataFrame(
            {"doc_id": ids, "source": t["source"].to_pylist(), "w": w,
             "q_unats": q,
             "priority": q.astype(np.float64) / w.astype(np.float64)}
        )

    scored = ds.map_batches(pri, batch_format="pyarrow", zero_copy_batch=True)
    out = topk(scored, ["priority", "doc_id"], [True, False], _ES_K).to_pandas()
    out["priority"] = _rd(out["priority"].to_numpy(np.float64), 6)
    return _i64(out, ["doc_id", "w", "q_unats"]).reset_index(drop=True)


SQL_WEIGHTED_SAMPLE_ES = """
WITH d AS (
  SELECT doc_id, source, n_chars AS w,
         (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':es'), 1, 12)
               AS BIGINT) + 1) / 281474976710656.0 AS u
  FROM documents),
p AS (SELECT doc_id, source, w,
             CAST(ROUND(LN(u) * 1000000, 0) AS BIGINT) AS q_unats
      FROM d)
SELECT doc_id, source, w, q_unats,
       ROUND(CAST(q_unats AS DOUBLE) / w, 6) AS priority
FROM p
ORDER BY CAST(q_unats AS DOUBLE) / w DESC, doc_id LIMIT 20
"""


def q_selectivity_independence_audit(sf_dir: str) -> pd.DataFrame:
    """Cost-based-optimizer selectivity audit: the independence assumption
    (sel(A∧B) = sel(A)·sel(B)) that every CBO makes, checked against the
    actual conjunction count for A: value > 30 and B: type = 'purchase'.
    Exact integer counters from one combiner pass; the correlation verdict
    is INTEGER cross-multiplied (lift > 6/5 → positive, < 4/5 → negative),
    so no float gates the flag — the statistic a query planner would log to
    decide it needs a multi-column histogram."""
    ds = _t(sf_dir, "events", ["event_type", "value"])

    def part(t: pa.Table) -> pd.DataFrame:
        v = t["value"].to_numpy(zero_copy_only=False)
        a = v > 30.0
        b = pc.equal(t["event_type"], "purchase").to_numpy(zero_copy_only=False)
        return pd.DataFrame(
            {"n": [len(v)], "n_a": [int(a.sum())], "n_b": [int(b.sum())],
             "n_ab": [int((a & b).sum())]}
        )

    p = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    n = int(p["n"].sum())
    na, nb, nab = int(p["n_a"].sum()), int(p["n_b"].sum()), int(p["n_ab"].sum())
    est = float(na) * float(nb) / float(n)
    lift = float("nan") if na == 0 or nb == 0 else float(nab) * float(n) / (float(na) * float(nb))
    if na == 0 or nb == 0:
        flag = "undefined"
    elif 5 * nab * n > 6 * na * nb:
        flag = "positive"
    elif 5 * nab * n < 4 * na * nb:
        flag = "negative"
    else:
        flag = "independent"
    out = pd.DataFrame(
        [{"n": n, "n_a": na, "n_b": nb, "n_ab": nab,
          "est_ab": _rd(est, 6), "lift": _rd(lift, 6), "flag": flag}]
    )
    return _i64(out, ["n", "n_a", "n_b", "n_ab"])


SQL_SELECTIVITY_INDEPENDENCE_AUDIT = """
WITH c AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CASE WHEN value > 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN value > 30 AND event_type = 'purchase'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_ab
  FROM events)
SELECT n, n_a, n_b, n_ab,
       ROUND(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / CAST(n AS DOUBLE), 6) AS est_ab,
       CASE WHEN n_a = 0 OR n_b = 0 THEN CAST('nan' AS DOUBLE)
            ELSE ROUND(CAST(n_ab AS DOUBLE) * CAST(n AS DOUBLE)
                       / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6) END AS lift,
       CASE WHEN n_a = 0 OR n_b = 0 THEN 'undefined'
            WHEN 5 * n_ab * n > 6 * n_a * n_b THEN 'positive'
            WHEN 5 * n_ab * n < 4 * n_a * n_b THEN 'negative'
            ELSE 'independent' END AS flag
FROM c
"""


# ---------------------------------------------------------------------------
# Wave 33: exact Shapley attribution, token-bucket rate-limit replay
# ---------------------------------------------------------------------------

_SHAP_CHANNELS = ["click", "signup", "view"]


def q_shapley_attribution(sf_dir: str) -> pd.DataFrame:
    """Exact Shapley-value marketing attribution over 3 channels (the
    game-theoretic upgrade of linear attribution): each purchase's
    characteristic function v(S) = its cents when the user's prior-touch
    channel set intersects S (0 otherwise), and the 3-player Shapley value
    enumerates all orderings exactly — every credit is an integer number of
    SIXTH-cents (×6 scale), so the division by 3! never leaves integers.
    One pass classifies each purchase's presence set (8 possibilities);
    the Shapley algebra runs over the 8-row subset table."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id", "event_type", "value"])

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        rows = []
        for _, g in df.groupby("user_id", sort=False):
            seen: set[str] = set()
            for et, val in zip(g["event_type"], g["value"]):
                if et == "purchase":
                    cents = int(_rd(np.array([val * 100.0]), 0)[0])
                    key = "".join(
                        "1" if c in seen else "0" for c in _SHAP_CHANNELS
                    )
                    rows.append((key, cents, 1))
                elif et in _SHAP_CHANNELS:
                    seen.add(et)
        out = pd.DataFrame(rows, columns=["subset", "cents", "n"])
        if out.empty:
            return pd.DataFrame({"subset": pd.Series([], dtype=object),
                                 "cents": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        return out.groupby("subset", as_index=False).sum()

    sub = grouped_sums(
        bucketed_group_reduce(ds, ["user_id"], per_user),
        ["subset"],
        {"cents": "cents", "n": "n"},
    ).to_pandas()
    mass = {r["subset"]: int(r["cents"]) for _, r in sub.iterrows()}

    def v(members: frozenset[int], present_key: str) -> int:
        # v(S) for one presence set: cents if S ∩ present ≠ ∅
        return 1 if any(present_key[i] == "1" for i in members) else 0

    import itertools

    credit = {c: 0 for c in _SHAP_CHANNELS}  # in sixth-cents
    for key, cents in mass.items():
        for order in itertools.permutations(range(3)):
            coalition: set[int] = set()
            for ch in order:
                before = v(frozenset(coalition), key)
                coalition.add(ch)
                after = v(frozenset(coalition), key)
                credit[_SHAP_CHANNELS[ch]] += (after - before) * cents
    total6 = sum(credit.values())
    rows = []
    for c in _SHAP_CHANNELS:
        share = float("nan") if total6 == 0 else float(credit[c]) / float(total6)
        rows.append((c, credit[c], _rd(share, 6)))
    out = pd.DataFrame(rows, columns=["channel", "shapley_sixth_cents", "share"])
    return _i64(out, ["shapley_sixth_cents"])


def _shap_sql() -> str:
    # marginal-contribution weights for 3 players over the 8 presence sets:
    # Shapley in sixth-units, computed per subset key in closed form
    import itertools

    terms = {c: [] for c in _SHAP_CHANNELS}
    for bits in itertools.product("01", repeat=3):
        key = "".join(bits)
        for ci, c in enumerate(_SHAP_CHANNELS):
            w = 0
            for order in itertools.permutations(range(3)):
                pre = set()
                for ch in order:
                    was = any(key[i] == "1" for i in pre)
                    pre.add(ch)
                    now = any(key[i] == "1" for i in pre)
                    if ch == ci:
                        w += int(now) - int(was)
            if w:
                terms[c].append(f"WHEN '{key}' THEN {w}")
    cases = {c: "CASE subset " + " ".join(ts) + " ELSE 0 END"
             for c, ts in terms.items()}
    chans = ", ".join(f"('{c}', {i})" for i, c in enumerate(_SHAP_CHANNELS))
    per_chan = " UNION ALL ".join(
        f"SELECT '{c}' AS channel, CAST(SUM(cents * ({cases[c]})) AS BIGINT)"
        f" AS shapley_sixth_cents FROM m"
        for c in _SHAP_CHANNELS
    )
    return f"""
WITH r AS (
  SELECT user_id, event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
         epoch_us(ts) AS t, event_id
  FROM events),
p AS (
  SELECT a.user_id, a.cents, a.t, a.event_id,
         MAX(CASE WHEN b.event_type = 'click' THEN 1 ELSE 0 END) AS has_click,
         MAX(CASE WHEN b.event_type = 'signup' THEN 1 ELSE 0 END) AS has_signup,
         MAX(CASE WHEN b.event_type = 'view' THEN 1 ELSE 0 END) AS has_view
  FROM r a
  LEFT JOIN r b ON b.user_id = a.user_id
    AND (b.t < a.t OR (b.t = a.t AND b.event_id < a.event_id))
    AND b.event_type IN ('click', 'signup', 'view')
  WHERE a.event_type = 'purchase'
  GROUP BY 1, 2, 3, 4),
m AS MATERIALIZED (
  SELECT CONCAT(CAST(has_click AS VARCHAR), CAST(has_signup AS VARCHAR),
                CAST(has_view AS VARCHAR)) AS subset,
         CAST(SUM(cents) AS BIGINT) AS cents
  FROM p GROUP BY 1),
cr AS ({per_chan}),
tot AS (SELECT CAST(SUM(shapley_sixth_cents) AS BIGINT) AS t6 FROM cr)
SELECT cr.channel, cr.shapley_sixth_cents,
       CASE WHEN (SELECT t6 FROM tot) = 0 THEN CAST('nan' AS DOUBLE)
            ELSE ROUND(CAST(cr.shapley_sixth_cents AS DOUBLE)
                       / CAST((SELECT t6 FROM tot) AS DOUBLE), 6) END AS share
FROM cr ORDER BY cr.channel
"""


SQL_SHAPLEY_ATTRIBUTION = _shap_sql()


_TB_CAP = 5
_TB_REFILL_US = 10_000_000  # one token per 10 s


def q_token_bucket_audit(sf_dir: str) -> pd.DataFrame:
    """Token-bucket rate-limit replay (the API-gateway admission rule): each
    user's stream starts with a full bucket (5 tokens, +1 per 10 s, whole
    tokens per gap); an event consumes a token or drops.  Inherently
    SEQUENTIAL per user — the per-user fold runs inside the user-bucketed
    exchange (streams are short; cross-user parallelism carries the scan),
    and the ORACLE replays the same recursion as a recursive CTE.  Top-10
    throttled users."""
    from ..functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        rows = []
        for uid, g in df.groupby("user_id", sort=False):
            tsu = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
            level = _TB_CAP - 1  # first event always admitted
            dropped = 0
            prev = tsu[0]
            for t in tsu[1:]:
                level = min(_TB_CAP, level + (t - prev) // _TB_REFILL_US)
                if level >= 1:
                    level -= 1
                else:
                    dropped += 1
                prev = t
            rows.append((int(uid), len(tsu), dropped))
        return pd.DataFrame(rows, columns=["user_id", "n_events", "dropped"])

    per_user = grouped_sums(
        bucketed_group_reduce(ds, ["user_id"], per_bucket),
        ["user_id"],
        {"n_events": "n_events", "dropped": "dropped"},
    )
    out = topk(per_user, ["dropped", "user_id"], [True, False], 10).to_pandas()
    return _i64(out, ["user_id", "n_events", "dropped"])


SQL_TOKEN_BUCKET_AUDIT = f"""
WITH RECURSIVE e AS MATERIALIZED (
  SELECT user_id, epoch_us(ts) AS t,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events),
tb AS (
  SELECT user_id, rn, t, CAST({_TB_CAP - 1} AS BIGINT) AS level,
         CAST(0 AS BIGINT) AS dropped
  FROM e WHERE rn = 1
  UNION ALL
  SELECT n.user_id, n.rn, n.t,
         CASE WHEN LEAST({_TB_CAP}, p.level + (n.t - p.t) // {_TB_REFILL_US}) >= 1
              THEN LEAST({_TB_CAP}, p.level + (n.t - p.t) // {_TB_REFILL_US}) - 1
              ELSE LEAST({_TB_CAP}, p.level + (n.t - p.t) // {_TB_REFILL_US}) END,
         p.dropped + CASE WHEN LEAST({_TB_CAP}, p.level + (n.t - p.t)
                                     // {_TB_REFILL_US}) >= 1
                          THEN 0 ELSE 1 END
  FROM tb p JOIN e n ON n.user_id = p.user_id AND n.rn = p.rn + 1),
fin AS (
  SELECT user_id, MAX(rn) AS n_events,
         MAX_BY(dropped, rn) AS dropped
  FROM tb GROUP BY 1)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
       CAST(dropped AS BIGINT) AS dropped
FROM fin ORDER BY dropped DESC, user_id LIMIT 10
"""


# ---------------------------------------------------------------------------
# Wave 34: LRU cache audit via stack-distance equivalence, Hill tail index
# ---------------------------------------------------------------------------

_LRU_CAP = 4


def q_lru_cache_audit(sf_dir: str) -> pd.DataFrame:
    """LRU cache hit-rate replay over per-customer part-access streams (the
    cache-sizing study behind every serving tier): capacity 4, accesses in
    order-date order.  The Ray side runs the ACTUAL LRU automaton — jagged
    lockstep-vectorized across every customer in the bucket (one numpy step
    per stream position over a customers×CAP slot matrix; the matrix is
    |customers|×max-stream-length, so salt pathologically long streams
    upstream if a tenant dominates) inside the customer-bucketed exchange;
    the oracle
    instead uses Mattson's stack-distance equivalence — an access hits LRU(C)
    iff fewer than C distinct items were touched since the previous access of
    the same item — so two INDEPENDENT formulations of cache behaviour must
    agree bit-for-bit."""
    from ..functions.relational import bucketed_group_reduce, hash_join

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_linenumber"])
    acc = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # Jagged lockstep vectorization: all customers advance one access per
        # numpy step over a (customers × _LRU_CAP) slot matrix — slot CAP-1 is
        # most-recent, empties live at the left, so ONE shift-left-and-append
        # implements insert, evict-LRU and move-to-front alike (on a hit the
        # matched slot is deleted first).  Replaces the per-access Python
        # automaton; the loop is over the max stream LENGTH, not accesses.
        df = df.sort_values(
            ["o_custkey", "o_orderdate", "l_orderkey", "l_linenumber", "l_partkey"],
            kind="stable",
        )
        cust = df["o_custkey"].to_numpy(np.int64)
        part = df["l_partkey"].to_numpy(np.int64)
        if len(df) == 0:
            return pd.DataFrame({"n_customers": pd.Series([], dtype="int64"),
                                 "n_accesses": pd.Series([], dtype="int64"),
                                 "hits": pd.Series([], dtype="int64")})
        new = np.empty(len(cust), dtype=bool)
        new[0] = True
        new[1:] = cust[1:] != cust[:-1]
        row = np.cumsum(new) - 1                      # customer index
        starts = np.flatnonzero(new)
        t = np.arange(len(cust)) - starts[row]        # position in stream
        ncust = int(row[-1]) + 1
        max_len = int(t.max()) + 1
        M = np.full((ncust, max_len), -1, dtype=np.int64)
        M[row, t] = part
        S = np.full((ncust, _LRU_CAP), -1, dtype=np.int64)
        hits = 0
        for step in range(max_len):
            x = M[:, step]
            active = x >= 0
            eq = S == x[:, None]                      # at most one slot matches
            hit = eq.any(axis=1) & active
            hits += int(hit.sum())
            # delete the matched slot by shifting everything LEFT of it
            # right by one, so the hole lands at slot 0 where empties live
            # (no match → no-op); then one shift-left-append serves hit,
            # miss-evict and miss-insert alike (slot 0 is hole/empty/LRU)
            left_of_hit = np.cumsum(eq[:, ::-1], axis=1)[:, ::-1].astype(bool)
            shifted_r = np.concatenate(
                [np.full((ncust, 1), -1, dtype=np.int64), S[:, :-1]], axis=1
            )
            S_del = np.where(left_of_hit, shifted_r, S)
            S_new = np.concatenate([S_del[:, 1:], x[:, None]], axis=1)
            S = np.where(active[:, None], S_new, S)
        return pd.DataFrame(
            {"n_customers": [ncust], "n_accesses": [len(cust)], "hits": [hits]}
        )

    agg = (
        bucketed_group_reduce(acc, ["o_custkey"], per_bucket, num_buckets=32)
        .to_pandas()
        .sum()
    )
    n_acc, hits = int(agg["n_accesses"]), int(agg["hits"])
    out = pd.DataFrame(
        [{"n_customers": int(agg["n_customers"]), "n_accesses": n_acc,
          "hits": hits, "misses": n_acc - hits,
          "hit_rate": _rd(float(hits) / float(n_acc), 6)}]
    )
    return _i64(out, ["n_customers", "n_accesses", "hits", "misses"])


SQL_LRU_CACHE_AUDIT = f"""
WITH acc AS MATERIALIZED (
  SELECT o_custkey AS cust, l_partkey AS part,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, l_orderkey, l_linenumber,
                                     l_partkey) AS rn
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
prev AS (
  SELECT cust, part, rn,
         LAG(rn) OVER (PARTITION BY cust, part ORDER BY rn) AS prn
  FROM acc),
hit AS (
  SELECT p.cust, p.rn
  FROM prev p
  WHERE p.prn IS NOT NULL
    AND (SELECT COUNT(DISTINCT a2.part) FROM acc a2
         WHERE a2.cust = p.cust AND a2.rn > p.prn AND a2.rn < p.rn)
        < {_LRU_CAP}),
tot AS (SELECT COUNT(DISTINCT cust) AS n_customers, COUNT(*) AS n_accesses
        FROM acc),
h AS (SELECT COUNT(*) AS hits FROM hit)
SELECT tot.n_customers, tot.n_accesses, CAST(h.hits AS BIGINT) AS hits,
       CAST(tot.n_accesses - h.hits AS BIGINT) AS misses,
       ROUND(CAST(h.hits AS DOUBLE) / CAST(tot.n_accesses AS DOUBLE), 6)
         AS hit_rate
FROM tot CROSS JOIN h
"""


_HILL_K = 100


def q_hill_tail_index(sf_dir: str) -> pd.DataFrame:
    """Hill estimator of the purchase-value tail index (Hill 1975, the
    heavy-tail diagnostic behind capacity planning and loss modelling):
    over the k=100 largest purchase cents, ξ = (1/k)·Σ ln(x_i / x_{k+1}) —
    each log term µnat-quantized to an integer (LN-parity convention)
    before the sum, so both engines agree exactly; α = 1/ξ closes in the
    same double expression.  One distributed top-(k+1) prune; the estimator
    runs over k+1 rows."""
    ds = _t(sf_dir, "events", ["event_id", "event_type", "value"])

    def cents_rows(t: pa.Table) -> pd.DataFrame:
        is_p = pc.equal(t["event_type"], "purchase").to_numpy(zero_copy_only=False)
        c = _rd(t["value"].to_numpy(zero_copy_only=False)[is_p] * 100.0, 0).astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)[is_p]
        keep = c > 0
        return pd.DataFrame({"event_id": eid[keep], "cents": c[keep]})

    rows = ds.map_batches(cents_rows, batch_format="pyarrow", zero_copy_batch=True)
    top = topk(rows, ["cents", "event_id"], [True, False], _HILL_K + 1).to_pandas()
    x = top["cents"].to_numpy(np.int64)
    k = len(x) - 1
    if k < 1:
        # Degenerate corpus (<2 positive purchases): the oracle's aggregate
        # CTE still yields one row with k=0 and NULL sum/xi and NaN alpha —
        # degrade identically instead of dividing by zero.
        out = pd.DataFrame(
            [{"k": 0, "x_threshold": int(x[0]) if len(x) else None,
              "sum_unats": None, "xi_unats": None, "alpha": float("nan")}]
        )
        out["k"] = out["k"].astype("int64")
        out["x_threshold"] = out["x_threshold"].astype("Int64")
        out["sum_unats"] = out["sum_unats"].astype("Int64")
        out["xi_unats"] = out["xi_unats"].astype("Float64")
        return out
    xk1 = int(x[k])
    terms = _rd(np.log(x[:k].astype(np.float64) / float(xk1)) * 1e6, 0).astype(np.int64)
    s = int(terms.sum())
    xi = float(s) / float(k)
    out = pd.DataFrame(
        [{"k": k, "x_threshold": xk1, "sum_unats": s,
          "xi_unats": _rd(xi, 6),
          "alpha": _rd(1e6 / xi, 6) if xi > 0 else float("nan")}]
    )
    return _i64(out, ["k", "x_threshold", "sum_unats"])


SQL_HILL_TAIL_INDEX = f"""
WITH p AS (
  SELECT event_id, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
    AND CAST(ROUND(value * 100, 0) AS BIGINT) > 0),
top AS (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents DESC, event_id) AS rn
        FROM p ORDER BY cents DESC, event_id LIMIT {_HILL_K + 1}),
thr AS (SELECT cents AS xk1 FROM top WHERE rn = (SELECT MAX(rn) FROM top)),
t AS (
  SELECT CAST(ROUND(LN(CAST(cents AS DOUBLE) / CAST((SELECT xk1 FROM thr) AS DOUBLE))
                    * 1000000, 0) AS BIGINT) AS u
  FROM top WHERE rn < (SELECT MAX(rn) FROM top)),
s AS (SELECT CAST(SUM(u) AS BIGINT) AS su, COUNT(*) AS k FROM t)
SELECT k, (SELECT xk1 FROM thr) AS x_threshold, su AS sum_unats,
       ROUND(CAST(su AS DOUBLE) / k, 6) AS xi_unats,
       CASE WHEN su > 0 THEN ROUND(1000000.0 / (CAST(su AS DOUBLE) / k), 6)
            ELSE CAST('nan' AS DOUBLE) END AS alpha
FROM s
"""


# ---------------------------------------------------------------------------
# Wave 35: skip-gram context-pair generation
# ---------------------------------------------------------------------------

_SG_WINDOW = 2


def q_skipgram_pairs(sf_dir: str) -> pd.DataFrame:
    """Skip-gram (center, context) pair generation with window ±2 (Mikolov
    et al. 2013) — the word2vec training-corpus primitive that pairs with
    `vocab_id_assignment` and `negative_sampling_table`: every in-document
    position emits its ≤4 context words, pairs count through one combiner
    exchange, top-20 by frequency.  The pair emission is two shifted
    vectorized views per offset over the shared flat word buffer — no
    per-row Python."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def pairs(t: pa.Table) -> pd.DataFrame:
        lst = pc.split_pattern(t["text"], " ").combine_chunks()
        off = np.asarray(lst.offsets, dtype=np.int64)
        vals = lst.values
        L = len(vals)
        w = vals.to_numpy(zero_copy_only=False)
        frames = []
        for d in range(1, _SG_WINDOW + 1):
            if L <= d:
                continue
            idx = np.arange(L - d, dtype=np.int64)
            doc_of = np.searchsorted(off, idx, side="right") - 1
            valid = idx + d < off[doc_of + 1]
            a = w[:-d][valid]
            b = w[d:][valid]
            frames.append(pd.DataFrame({"center": a, "context": b}))
            frames.append(pd.DataFrame({"center": b, "context": a}))
        if not frames:
            return pd.DataFrame({"center": pd.Series([], dtype=object),
                                 "context": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        df = pd.concat(frames, ignore_index=True)
        df["n"] = 1
        return df.groupby(["center", "context"], as_index=False).sum()

    counts = grouped_sums(
        ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True),
        ["center", "context"],
        {"n": "n"},
    )
    out = topk(counts, ["n", "center", "context"], [True, False, False], 20).to_pandas()
    return _i64(out, ["n"]).reset_index(drop=True)


SQL_SKIPGRAM_PAIRS = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
p AS (
  SELECT ws[g.i] AS center, ws[h.j] AS context
  FROM w,
       unnest(generate_series(1, len(ws))) AS g(i),
       unnest([g.i - {_SG_WINDOW}, g.i - 1, g.i + 1, g.i + {_SG_WINDOW}]) AS h(j)
  WHERE h.j BETWEEN 1 AND len(ws))
SELECT center, context, COUNT(*) AS n
FROM p GROUP BY 1, 2
ORDER BY n DESC, center, context LIMIT 20
"""


REGISTRY: dict[str, QuerySpec] = {
    "doremi_mixture_step": QuerySpec(
        q_doremi_mixture_step,
        SQL_DOREMI_MIXTURE_STEP,
        "DoReMi-style mixture reweighting: integer-unat excess loss, quantized tilt",
    ),
    "sliding_p95_value": QuerySpec(
        q_sliding_p95_value,
        SQL_SLIDING_P95_VALUE,
        "exact sliding-24h p95 per hour via fanned histogram rows",
    ),
    "seasonal_dow_decompose": QuerySpec(
        q_seasonal_dow_decompose,
        SQL_SEASONAL_DOW_DECOMPOSE,
        "additive day-of-week decomposition with robust residual MAD",
    ),
    "quantile_normalize": QuerySpec(
        q_quantile_normalize,
        SQL_QUANTILE_NORMALIZE,
        "quantile normalization onto the global distribution, exact order stats",
    ),
    "link_prediction_jaccard": QuerySpec(
        q_link_prediction_jaccard,
        SQL_LINK_PREDICTION_JACCARD,
        "neighbor-Jaccard link prediction over the co-purchase graph, top-50",
    ),
    "watermark_late_events": QuerySpec(
        q_watermark_late_events,
        SQL_WATERMARK_LATE_EVENTS,
        "streaming watermark late-data audit via distributed prefix-max",
    ),
    "schema_drift_audit": QuerySpec(
        q_schema_drift_audit,
        SQL_SCHEMA_DRIFT_AUDIT,
        "per-column profile drift (rows/nulls/exact-distinct/mean) across halves",
    ),
    "l_diversity_audit": QuerySpec(
        q_l_diversity_audit,
        SQL_L_DIVERSITY_AUDIT,
        "l-diversity privacy audit over QI classes (first-order priority sensitive)",
    ),
    "bloom_fp_audit": QuerySpec(
        q_bloom_fp_audit,
        SQL_BLOOM_FP_AUDIT,
        "bloom-filter false-positive rate vs theoretical estimate (m=16k, k=3)",
    ),
    "group_sequential_ab": QuerySpec(
        q_group_sequential_ab,
        SQL_GROUP_SEQUENTIAL_AB,
        "group-sequential A/B boundary replay (OBF-style, integer accumulators)",
    ),
    "video_scene_cuts": QuerySpec(
        q_video_scene_cuts,
        SQL_VIDEO_SCENE_CUTS,
        "scene-cut detection via real VID0 decode vs synthesis-time truth",
    ),
    "unigram_lm_segment": QuerySpec(
        q_unigram_lm_segment,
        SQL_UNIGRAM_LM_SEGMENT,
        "unigram-LM Viterbi subword segmentation, integer unats, per-source totals",
    ),
    "margin_knn_bitext": QuerySpec(
        q_margin_knn_bitext,
        SQL_MARGIN_KNN_BITEXT,
        "margin-based (ratio) kNN pair mining, mutual-best cross-set pairs",
    ),
    "kcore_decomposition": QuerySpec(
        q_kcore_decomposition,
        SQL_KCORE_DECOMPOSITION,
        "k-core decomposition: distributed h-index fixpoint vs Matula-Beck oracle",
    ),
    "compaction_plan": QuerySpec(
        q_compaction_plan_checked,
        SQL_COMPACTION_PLAN,
        "small-file compaction planner: FFD bin packing over grouped cell manifest",
    ),
    "mannwhitney_u": QuerySpec(
        q_mannwhitney_u,
        SQL_MANNWHITNEY_U,
        "tie-corrected Mann-Whitney U one-vs-rest per event type (rank-free histogram)",
    ),
    "theilsen_trend": QuerySpec(
        q_theilsen_trend,
        SQL_THEILSEN_TREND,
        "Theil-Sen robust slope per event type (median of pairwise daily slopes)",
    ),
    "ks_fdr_audit": QuerySpec(
        q_ks_fdr_audit,
        SQL_KS_FDR_AUDIT,
        "per-source KS drift screen with Benjamini-Hochberg FDR adjustment",
    ),
    "conformal_interval": QuerySpec(
        q_conformal_interval,
        SQL_CONFORMAL_INTERVAL,
        "split-conformal residual quantile + finite-sample coverage audit",
    ),
    "ips_policy_value": QuerySpec(
        q_ips_policy_value,
        SQL_IPS_POLICY_VALUE,
        "IPS off-policy evaluation of a deterministic target policy, per-action terms",
    ),
    "interval_overlap_join": QuerySpec(
        q_interval_overlap_join,
        SQL_INTERVAL_OVERLAP_JOIN,
        "grid-bucketed interval/range overlap self-join (concurrent user activity)",
    ),
    "upsert_merge": QuerySpec(
        q_upsert_merge,
        SQL_UPSERT_MERGE,
        "CDC MERGE: snapshot + change batch, last-writer-wins, tombstone deletes",
    ),
    "symspell_edit1_join": QuerySpec(
        q_symspell_edit1_join,
        SQL_SYMSPELL_EDIT1_JOIN,
        "SymSpell deletion-neighborhood edit-1 join (exact recall) vs brute oracle",
    ),
    "feistel_permutation": QuerySpec(
        q_feistel_permutation,
        SQL_FEISTEL_PERMUTATION,
        "format-preserving Feistel epoch shuffle: seekable bijection + rank collapse",
    ),
    "media_decode_real": QuerySpec(
        q_media_decode_real,
        SQL_MEDIA_DECODE_REAL,
        "real PNG/WAV/VID0 decode via actor pool vs synthesis-time ground truth",
    ),
    "image_content_dedup": QuerySpec(
        q_image_content_dedup,
        SQL_IMAGE_CONTENT_DEDUP,
        "decoded-pixel-digest dedup of byte-different PNG re-encodings",
    ),
    "audio_fingerprint_dedup": QuerySpec(
        q_audio_fingerprint_dedup,
        SQL_AUDIO_FINGERPRINT_DEDUP,
        "gain-invariant acoustic fingerprint dedup of re-mastered WAVs",
    ),
    "video_content_dedup": QuerySpec(
        q_video_content_dedup,
        SQL_VIDEO_CONTENT_DEDUP,
        "decoded-frame-digest dedup of re-encoded video containers",
    ),
    "semantic_dedup": QuerySpec(
        q_semantic_dedup,
        SQL_SEMANTIC_DEDUP,
        "SemDeDup: kmeans clusters, in-cluster cosine near-dup keep-min",
    ),
    "range_partitioned_sort": QuerySpec(
        q_range_partitioned_sort,
        SQL_RANGE_PARTITIONED_SORT,
        "range-partitioned global sort: exact quantile bounds, sorted range files",
    ),
    "media_resize_stats": QuerySpec(
        q_media_resize_stats,
        SQL_MEDIA_RESIZE_STATS,
        "decode → nearest-neighbor resize → re-encode vs synthesis-time truth",
    ),
    "video_frame_decode": QuerySpec(
        q_video_frame_decode,
        SQL_VIDEO_FRAME_DECODE,
        "frame-sample + per-frame PNG decode vs persisted per-frame truth",
    ),
    "return_rate_monthly": QuerySpec(
        q_return_rate_monthly,
        SQL_RETURN_RATE_MONTHLY,
        "return-rate trend per ship month",
    ),
    "weekend_lift": QuerySpec(
        q_weekend_lift,
        SQL_WEEKEND_LIFT,
        "weekend activity lift per event type (epoch-day DOW arithmetic)",
    ),
    "price_p99_exact": QuerySpec(
        q_price_p99_exact,
        SQL_PRICE_P99_EXACT,
        "exact p50/p95/p99 of a near-unique column via two-phase refinement",
    ),
    "balance_anova_f": QuerySpec(
        q_balance_anova_f,
        SQL_BALANCE_ANOVA_F,
        "one-way ANOVA F: balance means across segments from moment partials",
    ),
    "doc_length_quality_corr": QuerySpec(
        q_doc_length_quality_corr,
        SQL_DOC_LENGTH_QUALITY_CORR,
        "Pearson r between doc length and stopword rate (one moments pass)",
    ),
    "priority_mix_chi2": QuerySpec(
        q_priority_mix_chi2,
        SQL_PRIORITY_MIX_CHI2,
        "chi2 drift of the year × priority contingency table",
    ),
    "acf_multi_lag": QuerySpec(
        q_acf_multi_lag,
        SQL_ACF_MULTI_LAG,
        "ACF at lags 1-5 of the global hourly count series",
    ),
    "orders_seasonal_share": QuerySpec(
        q_orders_seasonal_share,
        SQL_ORDERS_SEASONAL_SHARE,
        "seasonality index: month share of year order count",
    ),
    "benford_prices": QuerySpec(
        q_benford_prices,
        SQL_BENFORD_PRICES,
        "Benford first-digit audit of order totals vs log10(1+1/d)",
    ),
    "top_supplier_per_nation": QuerySpec(
        q_top_supplier_per_nation,
        SQL_TOP_SUPPLIER_PER_NATION,
        "grouped argmax: highest-balance supplier per nation",
    ),
    "balance_ks_test": QuerySpec(
        q_balance_ks_test,
        SQL_BALANCE_KS_TEST,
        "two-sample Kolmogorov–Smirnov D between balance distributions (exact, histogram)",
    ),
    "peak_concurrent_sessions": QuerySpec(
        q_peak_concurrent_sessions,
        SQL_PEAK_CONCURRENT_SESSIONS,
        "interval stabbing: peak simultaneous gap-sessions and when",
    ),
    "charclass_profile": QuerySpec(
        q_charclass_profile,
        SQL_CHARCLASS_PROFILE,
        "character-class share profile per source (encoding health)",
    ),
    "purchase_value_drift": QuerySpec(
        q_purchase_value_drift,
        SQL_PURCHASE_VALUE_DRIFT,
        "first→last purchase value drift per user (argmin/argmax payload merge)",
    ),
    "duplicate_invoices": QuerySpec(
        q_duplicate_invoices,
        SQL_DUPLICATE_INVOICES,
        "same-customer same-amount orders within 7 days (fraud screen)",
    ),
    "stale_parts_by_brand": QuerySpec(
        q_stale_parts_by_brand,
        SQL_STALE_PARTS_BY_BRAND,
        "parts with no final-year shipment per brand (big-big anti co-group)",
    ),
    "order_price_ohlc": QuerySpec(
        q_order_price_ohlc,
        SQL_ORDER_PRICE_OHLC,
        "monthly OHLC via mergeable argmin/argmax-with-payload partials",
    ),
    "mixture_schedule": QuerySpec(
        q_mixture_schedule,
        SQL_MIXTURE_SCHEDULE,
        "weighted-interleave training mixture schedule (packed-rank construction)",
    ),
    "top_parts_per_segment": QuerySpec(
        q_top_parts_per_segment,
        SQL_TOP_PARTS_PER_SEGMENT,
        "grouped top-3 parts per market segment after a join chain",
    ),
    "cohort_ltv": QuerySpec(
        q_cohort_ltv,
        SQL_COHORT_LTV,
        "cohort LTV: avg cumulative revenue by months-since-first-order",
    ),
    "heaps_law_fit": QuerySpec(
        q_heaps_law_fit,
        SQL_HEAPS_LAW_FIT,
        "Heaps'-law vocabulary-growth exponent across sources",
    ),
    "quality_gate_sweep": QuerySpec(
        q_quality_gate_sweep,
        SQL_QUALITY_GATE_SWEEP,
        "min-words gate sensitivity sweep: five thresholds in one pass",
    ),
    "wau_retention": QuerySpec(
        q_wau_retention,
        SQL_WAU_RETENTION,
        "week-over-week retention from distinct (user, week) pairs",
    ),
    "boilerplate_sentences": QuerySpec(
        q_boilerplate_sentences,
        SQL_BOILERPLATE_SENTENCES,
        "repeated-sentence boilerplate detection, top-10",
    ),
    "hapax_docs_per_source": QuerySpec(
        q_hapax_docs_per_source,
        SQL_HAPAX_DOCS_PER_SOURCE,
        "docs containing corpus-hapax tokens per source (term co-group join-back)",
    ),
    "anomaly_audit": QuerySpec(
        q_anomaly_audit,
        SQL_ANOMALY_AUDIT,
        "cross-table anomaly sweep: negative / null / future-timestamp counts",
    ),
    "journey_patterns": QuerySpec(
        q_journey_patterns,
        SQL_JOURNEY_PATTERNS,
        "top user-journey prefixes (first 5 event types joined per user)",
    ),
    "k_anonymity_audit": QuerySpec(
        q_k_anonymity_audit,
        SQL_K_ANONYMITY_AUDIT,
        "k-anonymity audit over quasi-identifier classes (k=5)",
    ),
    "lineitem_corr_matrix": QuerySpec(
        q_lineitem_corr_matrix,
        SQL_LINEITEM_CORR_MATRIX,
        "pairwise Pearson matrix from one mergeable-moments pass",
    ),
    "basket_lift": QuerySpec(
        q_basket_lift,
        SQL_BASKET_LIFT,
        "association rules: confidence + lift for top-20 co-purchase pairs",
    ),
    "user_survival_curve": QuerySpec(
        q_user_survival_curve,
        SQL_USER_SURVIVAL_CURVE,
        "activity-span survival curve (fraction of users reaching k days)",
    ),
    "new_vs_returning_revenue": QuerySpec(
        q_new_vs_returning_revenue,
        SQL_NEW_VS_RETURNING_REVENUE,
        "monthly revenue split: new vs returning customers (one custkey co-group)",
    ),
    "fulfillment_latency_hist": QuerySpec(
        q_fulfillment_latency_hist,
        SQL_FULFILLMENT_LATENCY_HIST,
        "order→first-ship latency histogram (orderkey co-group, day diff)",
    ),
    "scd2_history": QuerySpec(
        q_scd2_history,
        SQL_SCD2_HISTORY,
        "CDC → SCD2 validity-range history per user (LEAD construction)",
    ),
    "tail_expected_shortfall": QuerySpec(
        q_tail_expected_shortfall,
        SQL_TAIL_EXPECTED_SHORTFALL,
        "p99 + expected shortfall per group from one histogram pass",
    ),
    "returned_item_customers": QuerySpec(
        q_returned_item_customers,
        SQL_RETURNED_ITEM_CUSTOMERS,
        "TPC-H Q10 shape: returned-revenue per customer, top-20 with nation",
    ),
    "ttr_per_source": QuerySpec(
        q_ttr_per_source,
        SQL_TTR_PER_SOURCE,
        "lexical diversity: avg type-token ratio per source",
    ),
    "session_conversion_rate": QuerySpec(
        q_session_conversion_rate,
        SQL_SESSION_CONVERSION_RATE,
        "within-session view→purchase conversion rate",
    ),
    "forecast_revenue_change": QuerySpec(
        q_forecast_revenue_change,
        SQL_FORECAST_REVENUE_CHANGE,
        "TPC-H Q6 shape: fully-pushed-down filtered scan + scalar sum",
    ),
    "embedding_quantization_error": QuerySpec(
        q_embedding_quantization_error,
        SQL_EMBEDDING_QUANTIZATION_ERROR,
        "int8 symmetric quantization reconstruction-error audit per label",
    ),
    "weighted_median_price": QuerySpec(
        q_weighted_median_price,
        SQL_WEIGHTED_MEDIAN_PRICE,
        "quantity-weighted median price per return flag (weighted-quantile histogram)",
    ),
    "winsorized_mean_per_type": QuerySpec(
        q_winsorized_mean_per_type,
        SQL_WINSORIZED_MEAN_PER_TYPE,
        "winsorized (p5/p95-clipped) mean per group from the one-pass histogram",
    ),
    "filter_attribution": QuerySpec(
        q_filter_attribution,
        SQL_FILTER_ATTRIBUTION,
        "curation filter-funnel attribution: per-gate failure bitmask counts",
    ),
    "custdist": QuerySpec(
        q_custdist,
        SQL_CUSTDIST,
        "TPC-H Q13 shape: per-customer order-count histogram incl. zeros",
    ),
    "total_active_time": QuerySpec(
        q_total_active_time,
        SQL_TOTAL_ACTIVE_TIME,
        "total in-session active seconds per user over 30-min-gap sessions, top-10",
    ),
    "skyline_orders": QuerySpec(
        q_skyline_orders,
        SQL_SKYLINE_ORDERS,
        "2-D Pareto skyline: per-block frontier prune + frontier-of-frontiers",
    ),
    "longest_streaks": QuerySpec(
        q_longest_streaks,
        SQL_LONGEST_STREAKS,
        "gaps-and-islands longest consecutive-day streak per user, top-10",
    ),
    "rolling_active_users": QuerySpec(
        q_rolling_active_users,
        SQL_ROLLING_ACTIVE_USERS,
        "exact rolling 7-day distinct users via per-user interval diff events",
    ),
    "churn_counts": QuerySpec(
        q_churn_counts,
        SQL_CHURN_COUNTS,
        "churn by first-touch cohort: packed arg-min + watermark cutoff",
    ),
    "orders_growth_wow": QuerySpec(
        q_orders_growth_wow,
        SQL_ORDERS_GROWTH_WOW,
        "week-over-week growth: weekly count + LAG pct-change window",
    ),
    "session_depth_histogram": QuerySpec(
        q_session_depth_histogram,
        SQL_SESSION_DEPTH_HISTOGRAM,
        "events-per-session distribution over the gap sessionizer",
    ),
    "zipf_slope": QuerySpec(
        q_zipf_slope,
        SQL_ZIPF_SLOPE,
        "corpus Zipf exponent: top-500 term frequencies, log-log OLS slope",
    ),
    "revenue_pareto": QuerySpec(
        q_revenue_pareto,
        SQL_REVENUE_PARETO,
        "Pareto 80/20: top-20% customers' revenue share via distributed rank",
    ),
    "curation_pipeline": QuerySpec(
        q_curation_pipeline,
        SQL_CURATION_PIPELINE,
        "end-to-end curation: normalize → quality gate → dedup → langid → partitioned sink",
    ),
    "frequent_triples": QuerySpec(
        q_frequent_triples,
        SQL_FREQUENT_TRIPLES,
        "a-priori 3-itemsets: frequent-pair broadcast prunes triple generation",
    ),
    "bounce_rate": QuerySpec(
        q_bounce_rate,
        SQL_BOUNCE_RATE,
        "session-quality rollup over the gap sessionizer (bounce rate, avg events)",
    ),
    "centroid_separation": QuerySpec(
        q_centroid_separation,
        SQL_CENTROID_SEPARATION,
        "silhouette-lite cluster separation: own vs nearest-other centroid distance",
    ),
    "order_priority_check": QuerySpec(
        q_order_priority_check,
        SQL_ORDER_PRIORITY_CHECK,
        "TPC-H Q4 shape: EXISTS semi via per-order max pre-agg + hash join",
    ),
    "small_quantity_revenue": QuerySpec(
        q_small_quantity_revenue,
        SQL_SMALL_QUANTITY_REVENUE,
        "TPC-H Q17 shape: fact joins back to its own per-key aggregate",
    ),
    "rfm_segments": QuerySpec(
        q_rfm_segments,
        SQL_RFM_SEGMENTS,
        "RFM quintile segmentation: per-user reduce + 3× exact distributed NTILE",
    ),
    "shipping_priority": QuerySpec(
        q_shipping_priority,
        SQL_SHIPPING_PRIORITY,
        "TPC-H Q3 shape: segment+date filtered 3-way join, order-level pre-agg, top-10",
    ),
    "new_users_daily": QuerySpec(
        q_new_users_daily,
        SQL_NEW_USERS_DAILY,
        "first-seen cohort counts: per-user min-day reduce, day-level count",
    ),
    "event_trigrams": QuerySpec(
        q_event_trigrams,
        SQL_EVENT_TRIGRAMS,
        "per-user ordered event-type trigram mining, global top-20",
    ),
    "conversion_latency": QuerySpec(
        q_conversion_latency,
        SQL_CONVERSION_LATENCY,
        "first-view→first-purchase latency: conditional min reduce + scalar moments",
    ),
    "value_gini": QuerySpec(
        q_value_gini,
        SQL_VALUE_GINI,
        "exact per-group Gini from the one-pass cent histogram (no sort, no raw shuffle)",
    ),
    "bigram_lm_nll": QuerySpec(
        q_bigram_lm_nll,
        SQL_BIGRAM_LM_NLL,
        "add-one-smoothed bigram LM: per-source avg negative log-likelihood",
    ),
    "value_boxplot": QuerySpec(
        q_value_boxplot,
        SQL_VALUE_BOXPLOT,
        "boxplot profile per group from one histogram pass (disc quartiles + Tukey fences)",
    ),
    "nation_revenue_share": QuerySpec(
        q_nation_revenue_share,
        SQL_NATION_REVENUE_SHARE,
        "percent-of-total window: nation share of region revenue",
    ),
    "fk_integrity_audit": QuerySpec(
        q_fk_integrity_audit,
        SQL_FK_INTEGRITY_AUDIT,
        "referential-integrity / coverage audit: orphan keys+rows per relation",
    ),
    "hourly_autocorr": QuerySpec(
        q_hourly_autocorr,
        SQL_HOURLY_AUTOCORR,
        "lag-1 autocorrelation of hourly event counts per type (corr vs LAG oracle)",
    ),
    "source_vocab_jaccard": QuerySpec(
        q_source_vocab_jaccard,
        SQL_SOURCE_VOCAB_JACCARD,
        "pairwise source-vocabulary Jaccard via term bitmask histogram",
    ),
    "orders_vs_ships_daily": QuerySpec(
        q_orders_vs_ships_daily,
        SQL_ORDERS_VS_SHIPS_DAILY,
        "FULL OUTER join reconciliation: daily orders vs shipments",
    ),
    "copurchase_degree_hist": QuerySpec(
        q_copurchase_degree_hist,
        SQL_COPURCHASE_DEGREE_HIST,
        "co-purchase graph degree distribution (graph skew probe)",
    ),
    "rrf_fusion": QuerySpec(
        q_rrf_fusion,
        SQL_RRF_FUSION,
        "reciprocal-rank fusion of BM25 and raw-tf rankings (hybrid search)",
    ),
    "type_hour_grid": QuerySpec(
        q_type_hour_grid,
        SQL_TYPE_HOUR_GRID,
        "dense dimension-grid fill: cross join + left join coalesce over one fact agg",
    ),
    "minhash_incremental": QuerySpec(
        q_minhash_incremental, SQL_MINHASH_INCREMENTAL,
        "new-batch near-dup vs persisted LSH band state (independent-reference oracle)",
    ),
    "ngram_jaccard_pairs": QuerySpec(
        q_ngram_jaccard_pairs, SQL_NGRAM_JACCARD_PAIRS,
        "exact df-capped n-gram-set Jaccard near-dup pairs (one gram exchange)",
    ),
    "winnowing_fingerprints": QuerySpec(
        q_winnowing_fingerprints, SQL_WINNOWING_FINGERPRINTS,
        "winnowing (MOSS) rolling-hash fingerprints per source, streaming",
    ),
    "kcenter_coreset": QuerySpec(
        q_kcenter_coreset, SQL_KCENTER_CORESET,
        "greedy k-center diversity coreset over embeddings (broadcast center rounds)",
    ),
    "corpus_diff": QuerySpec(
        q_corpus_diff,
        SQL_CORPUS_DIFF,
        "snapshot diff: unchanged/modified/removed/added via fp combiners + one doc_id exchange",
    ),
    "compression_quality": QuerySpec(
        q_compression_quality, SQL_COMPRESSION_QUALITY,
        "zlib entropy quality proxy per source (per-doc sizes artifact, SQL aggregation)",
    ),
    "padding_waste": QuerySpec(
        q_padding_waste,
        SQL_PADDING_WASTE,
        "length-bucketed batching padding waste vs arrival order (exact global rank)",
    ),
    "bpe_encode_stats": QuerySpec(
        q_bpe_encode_stats, SQL_BPE_ENCODE_STATS,
        "512-merge sampled-train BPE vocab applied corpus-wide (linked-list priority encoder)",
    ),
    "bpe_merges": QuerySpec(
        q_bpe_merges,
        SQL_BPE_MERGES,
        "iterative distributed BPE merge training: pair-count → top-1 → rewrite rounds",
    ),
    "naive_bayes_langid": QuerySpec(
        q_naive_bayes_langid,
        SQL_NAIVE_BAYES_LANGID,
        "multinomial Naive Bayes langid: vocab-bounded train reduce, broadcast model score",
    ),
    "bm25_search": QuerySpec(
        q_bm25_search,
        SQL_BM25_SEARCH,
        "BM25 ranked retrieval: one-scan candidate postings + corpus stats, top-20",
    ),
    "mad_outliers": QuerySpec(
        q_mad_outliers,
        SQL_MAD_OUTLIERS,
        "median + MAD robust outlier counts from one histogram-sketch pass",
    ),
    "cube_counts": QuerySpec(
        q_cube_counts,
        SQL_CUBE_COUNTS,
        "GROUP BY CUBE lattice re-summed from one finest distributed aggregate",
    ),
    "purchase_view_sets": QuerySpec(
        q_purchase_view_sets,
        SQL_PURCHASE_VIEW_SETS,
        "INTERSECT/EXCEPT user sets as one membership aggregation pass",
    ),
    "ewma_user_value": QuerySpec(
        q_ewma_user_value,
        SQL_EWMA_USER_VALUE,
        "time-decayed EWMA aggregate via re-anchored associative partials",
    ),
    "events_by_type": QuerySpec(q_events_by_type, SQL_EVENTS_BY_TYPE, "A1 groupby count/sum"),
    "events_per_hour": QuerySpec(q_events_per_hour, SQL_EVENTS_PER_HOUR, "tumbling-window counts"),
    "top_users_by_value": QuerySpec(q_top_users_by_value, SQL_TOP_USERS, "top-k over aggregate"),
    "error_events_window": QuerySpec(
        q_error_events_window, SQL_ERROR_EVENTS_WINDOW, "F1/F2 filter + projection (pushdown)"
    ),
    "parse_props": QuerySpec(q_parse_props, SQL_PARSE_PROPS, "M4 regex field extraction"),
    "orders_by_region": QuerySpec(q_orders_by_region, SQL_ORDERS_BY_REGION, "J1 broadcast join chain"),
    "pricing_summary": QuerySpec(q_pricing_summary, SQL_PRICING_SUMMARY, "TPC-H Q1-style aggregate"),
    "last_event_per_user": QuerySpec(q_last_event_per_user, SQL_LAST_EVENT, "A6 compacted last-state"),
    "distinct_sources": QuerySpec(q_distinct_sources, SQL_DISTINCT_SOURCES, "unique/set op"),
    "lineitem_topk": QuerySpec(q_lineitem_topk, SQL_LINEITEM_TOPK, "sort + limit top-k"),
    "doc_token_stats": QuerySpec(q_doc_token_stats, SQL_DOC_TOKEN_STATS, "token counting"),
    "doc_quality": QuerySpec(q_doc_quality, SQL_DOC_QUALITY, "quality scoring (stopword ratio)"),
    "doc_fingerprint": QuerySpec(q_doc_fingerprint, SQL_DOC_FINGERPRINT, "document fingerprint"),
    "dedup_exact": QuerySpec(q_dedup_exact, SQL_DEDUP_EXACT, "exact dedup via content hash"),
    "cosine_topk": QuerySpec(q_cosine_topk, SQL_COSINE_TOPK, "brute-force ANN baseline"),
    "ann_ivf_topk": QuerySpec(
        q_ann_ivf_topk, SQL_COSINE_TOPK, "IVF index build + query (exact at nprobe=nlist)"
    ),
    "pipeline_docs": QuerySpec(q_pipeline_docs, SQL_PIPELINE_DOCS, "flagship parse→enrich→route→agg"),
    "route_documents": QuerySpec(q_route_documents, SQL_ROUTE_DOCUMENTS, "predicate fan-out counts"),
    "order_revenue_topk": QuerySpec(
        q_order_revenue_topk, SQL_ORDER_REVENUE_TOPK, "large-large hash join + pre-agg"
    ),
    "bloom_semi_join": QuerySpec(
        q_bloom_semi_join,
        SQL_BLOOM_SEMI_JOIN,
        "bloom-join: mergeable filter broadcast + survivor-only exact semi join",
    ),
    "customers_without_orders": QuerySpec(
        q_customers_without_orders, SQL_CUSTOMERS_WITHOUT_ORDERS, "broadcast anti join"
    ),
    "nation_revenue": QuerySpec(
        q_nation_revenue, SQL_NATION_REVENUE, "Q5-style multi-join (filter+broadcast+hash)"
    ),
    "error_prior_purchase": QuerySpec(
        q_error_prior_purchase, SQL_ERROR_PRIOR_PURCHASE, "as-of correlation join"
    ),
    "views_before_purchase": QuerySpec(
        q_views_before_purchase, SQL_VIEWS_BEFORE_PURCHASE, "range (interval) join counts"
    ),
    "global_error_context": QuerySpec(
        q_global_error_context,
        SQL_GLOBAL_ERROR_CONTEXT,
        "keyless interval join via time-bucket partitioning + 2x right replication",
    ),
    "user_sessions": QuerySpec(q_user_sessions, SQL_USER_SESSIONS, "gap-based session windows"),
    "hopping_window_counts": QuerySpec(
        q_hopping_window_counts,
        SQL_HOPPING_WINDOW_COUNTS,
        "overlapping 30-min/10-min hopping windows via bounded event replication",
    ),
    "span_assembly": QuerySpec(
        q_span_assembly, SQL_SPAN_ASSEMBLY, "J4 span merge: field-wise last-writer-wins"
    ),
    "trace_summary": QuerySpec(
        q_trace_summary, SQL_TRACE_SUMMARY, "trace rollup over assembled spans"
    ),
    "media_decode_stats": QuerySpec(
        q_media_decode_stats, SQL_MEDIA_DECODE_STATS,
        "multimodal actor-pool decode vs independent scalar-reference features",
    ),
    "hourly_moving_avg": QuerySpec(
        q_hourly_moving_avg, SQL_HOURLY_MOVING_AVG, "sliding window over tumbling agg"
    ),
    "embedding_neardup": QuerySpec(q_embedding_neardup, SQL_EMBEDDING_NEARDUP, "cosine near-dup pairs"),
    "lang_counts": QuerySpec(q_lang_counts, SQL_LANG_COUNTS, "A5 exploration top-k counts"),
    "union_counts": QuerySpec(q_union_counts, SQL_UNION_COUNTS, "union-all of filtered streams"),
    "docs_matching_regex": QuerySpec(
        q_docs_matching_regex, SQL_DOCS_MATCHING_REGEX, "F4 regex row filter"
    ),
    "distinct_users_per_type": QuerySpec(
        q_distinct_users_per_type, SQL_DISTINCT_USERS, "two-stage count-distinct"
    ),
    "approx_distinct_users": QuerySpec(
        q_approx_distinct_users, None, "HLL sketch distinct-count (rows-only)"
    ),
    "kll_price_quantiles": QuerySpec(
        q_kll_price_quantiles, None, "KLL mergeable quantile sketch (rows-only, self-gated)"
    ),
    "kll_value_by_type": QuerySpec(
        q_kll_value_by_type, None, "grouped KLL quantiles per key (rows-only)"
    ),
    "mg_heavy_users": QuerySpec(
        q_mg_heavy_users, None, "Misra-Gries one-pass heavy hitters (rows-only)"
    ),
    "kmv_user_overlap": QuerySpec(
        q_kmv_user_overlap,
        SQL_KMV_USER_OVERLAP,
        "KMV bottom-k set algebra incl. intersection vs pure-Python reference",
    ),
    "type_overlap_matrix": QuerySpec(
        q_type_overlap_matrix,
        SQL_TYPE_OVERLAP_MATRIX,
        "exact pairwise audience overlap via per-user bucket-local pair explosion",
    ),
    "approx_users_per_type": QuerySpec(
        q_approx_users_per_type, None, "grouped HLL distinct-count per key (rows-only)"
    ),
    "value_median_per_type": QuerySpec(
        q_value_median_per_type, SQL_VALUE_MEDIAN, "per-group exact median"
    ),
    "value_p95_per_type": QuerySpec(
        q_value_p95_per_type, SQL_VALUE_P95, "per-group p95 via histogram sketch"
    ),
    "top_events_per_type": QuerySpec(
        q_top_events_per_type, SQL_TOP_EVENTS_PER_TYPE, "per-group top-k (window rank)"
    ),
    "sample_docs_md5": QuerySpec(
        q_sample_docs_md5, SQL_SAMPLE_DOCS_MD5, "F5 deterministic hash sampling"
    ),
    "weighted_sample": QuerySpec(
        q_weighted_sample,
        SQL_WEIGHTED_SAMPLE,
        "Efraimidis-Spirakis token-weighted sample without replacement (deterministic)",
    ),
    "embedding_neardup_lsh": QuerySpec(
        q_embedding_neardup_lsh, None, "hyperplane-LSH near-dup (approx, rows-only)"
    ),
    "jaccard_neardup": QuerySpec(
        q_jaccard_neardup, SQL_JACCARD_NEARDUP, "exact n-gram Jaccard similarity join"
    ),
    "minhash_neardup": QuerySpec(
        q_minhash_neardup,
        SQL_MINHASH_NEARDUP,
        "MinHash+LSH near-dup pairs vs independent scalar reference artifact",
    ),
    "neardup_cluster_dedup": QuerySpec(
        q_neardup_cluster_dedup,
        SQL_NEARDUP_CLUSTER_DEDUP,
        "LSH pairs → distributed CC → canonical keep, vs recursive-CTE closure",
    ),
    "dedup_clusters": QuerySpec(
        q_dedup_clusters, SQL_DEDUP_CLUSTERS, "near-dup pairs → connected components (star contraction)"
    ),
    "dedup_survivors": QuerySpec(
        q_dedup_survivors, SQL_DEDUP_SURVIVORS, "keep-one-per-cluster over the full corpus"
    ),
    "simhash_fingerprints": QuerySpec(
        q_simhash_fingerprints,
        SQL_SIMHASH_FINGERPRINTS,
        "SimHash fingerprints vs independent scalar-FNV reference artifact",
    ),
    "simhash_hamming_buckets": QuerySpec(
        q_simhash_hamming_buckets, SQL_SIMHASH_HAMMING, "SimHash popcount histogram vs reference"
    ),
    "loglines_extract": QuerySpec(
        q_loglines_extract, SQL_LOGLINES_EXTRACT, "gz line-file extraction e2e vs SQL classifier"
    ),
    "token_frequency_topk": QuerySpec(
        q_token_frequency_topk, SQL_TOKEN_FREQUENCY, "vocab histogram vs UNNEST oracle"
    ),
    "bigram_topk": QuerySpec(q_bigram_topk, SQL_BIGRAM_TOPK, "top-20 token bigrams"),
    "length_histogram": QuerySpec(
        q_length_histogram, SQL_LENGTH_HISTOGRAM, "sequence-length buckets"
    ),
    "packing_stats": QuerySpec(
        q_packing_stats, SQL_PACKING_STATS, "per-source FFD packing vs reference + conservation"
    ),
    "training_chunks": QuerySpec(
        q_training_chunks,
        SQL_TRAINING_CHUNKS,
        "GPT concat-and-chunk layout (prefix-sum offsets, boundary-spanning blocks)",
    ),
    "dedup_sequences": QuerySpec(
        q_dedup_sequences, SQL_DEDUP_SEQUENCES, "bit-exact token-array dedup counts per source"
    ),
    "epoch_shuffle": QuerySpec(
        q_epoch_shuffle, SQL_EPOCH_SHUFFLE, "seeded hash-order epoch shuffle (distributed top-k)"
    ),
    "split_counts": QuerySpec(
        q_split_counts, SQL_SPLIT_COUNTS, "deterministic hash-fraction train/val split"
    ),
    "oov_rate": QuerySpec(
        q_oov_rate, SQL_OOV_RATE, "vocab build → broadcast → OOV-rate scan (two-phase)"
    ),
    "unigram_surprisal": QuerySpec(
        q_unigram_surprisal, SQL_UNIGRAM_SURPRISAL, "unigram-LM perplexity quality signal"
    ),
    "chunk_stats": QuerySpec(
        q_chunk_stats, SQL_CHUNK_STATS, "context-window chunking vs arithmetic oracle"
    ),
    "contamination_check": QuerySpec(
        q_contamination_check, SQL_CONTAMINATION, "benchmark n-gram contamination scan"
    ),
    "repetition_stats": QuerySpec(
        q_repetition_stats, SQL_REPETITION, "intra-doc repeated-gram detector"
    ),
    "cross_doc_dup_windows": QuerySpec(
        q_cross_doc_dup_windows,
        SQL_CROSS_DOC_DUP_WINDOWS,
        "cross-doc exact substring (5-gram window) duplication, Lee et al. span dedup",
    ),
    "substring_dedup_stats": QuerySpec(
        q_substring_dedup_stats,
        SQL_SUBSTRING_DEDUP_STATS,
        "span dedup cut decision: keep global first occurrence, count removed words",
    ),
    "substring_dedup_rewrite": QuerySpec(
        q_substring_dedup_rewrite,
        SQL_SUBSTRING_DEDUP_REWRITE,
        "span dedup rewrite: deduplicated corpus text, text-level oracle",
    ),
    "temperature_resample": QuerySpec(
        q_temperature_resample,
        SQL_TEMPERATURE_RESAMPLE,
        "temperature (T=0.5) mixture rebalancing from observed counts, md5-fraction membership",
    ),
    "domain_mix_sample": QuerySpec(
        q_domain_mix_sample, SQL_DOMAIN_MIX, "hash-deterministic mixture resampling"
    ),
    "embedding_centroids": QuerySpec(
        q_embedding_centroids, SQL_EMBEDDING_CENTROIDS, "per-label embedding centroid (vector agg)"
    ),
    "embedding_covariance": QuerySpec(
        q_embedding_covariance,
        SQL_EMBEDDING_COVARIANCE,
        "d×d covariance from mergeable (n, Σx, ΣxxT) moment partials (PCA front half)",
    ),
    "customer_order_counts": QuerySpec(
        q_customer_order_counts,
        SQL_CUSTOMER_ORDER_COUNTS,
        "native LEFT OUTER hash join + COUNT(non-null) indicator combiner",
    ),
    "dominant_user_per_type": QuerySpec(
        q_dominant_user_per_type,
        SQL_DOMINANT_USER_PER_TYPE,
        "grouped MODE via pair counts + top-1 candidate prune",
    ),
    "nation_hhi": QuerySpec(
        q_nation_hhi,
        SQL_NATION_HHI,
        "revenue concentration (HHI) per nation from per-customer share moments",
    ),
    "analyze_events": QuerySpec(
        q_analyze_events,
        SQL_ANALYZE_EVENTS,
        "ANALYZE catalog stats: n/nulls/exact-NDV/min/max per column, one streaming pass",
    ),
    "user_paths": QuerySpec(
        q_user_paths,
        SQL_USER_PATHS,
        "ordered LISTAGG per group (first-8 event path), head-bounded gather",
    ),
    "type_hour_chi2": QuerySpec(
        q_type_hour_chi2,
        SQL_TYPE_HOUR_CHI2,
        "χ² independence of event_type × hour from distributed contingency counts",
    ),
    "source_kl": QuerySpec(
        q_source_kl, SQL_SOURCE_KL, "KL(P(token|source) || P(token)) domain drift"
    ),
    "tfidf_topk": QuerySpec(
        q_tfidf_topk, SQL_TFIDF_TOPK, "top-3 distinctive tokens per source by tf-idf"
    ),
    "heavy_hitters": QuerySpec(
        q_heavy_hitters, SQL_HEAVY_HITTERS, "two-pass exact heavy hitters (zero-shuffle top-k)"
    ),
    "cms_heavy_hitters": QuerySpec(
        q_cms_heavy_hitters,
        SQL_CMS_HEAVY_HITTERS,
        "Count-Min-sketch-pruned exact heavy hitters (fixed-memory candidates)",
    ),
    "token_pagerank": QuerySpec(
        q_token_pagerank,
        SQL_TOKEN_PAGERANK,
        "iterative PageRank over the token-transition graph vs unrolled CTE oracle",
    ),
    "token_bfs": QuerySpec(
        q_token_bfs,
        SQL_TOKEN_BFS,
        "distributed BFS hop levels (frontier broadcast, one edge scan per hop)",
    ),
    "embedding_kmeans": QuerySpec(
        q_embedding_kmeans,
        SQL_EMBEDDING_KMEANS,
        "iterative Lloyd k-means (broadcast centroids, k·d-float partials) vs unrolled CTE",
    ),
    "pmi_topk": QuerySpec(
        q_pmi_topk,
        SQL_PMI_TOPK,
        "PMI collocations, support-filtered inside the bigram reduce",
    ),
    "index_term_stats": QuerySpec(
        q_index_term_stats,
        SQL_INDEX_TERM_STATS,
        "inverted-index build: per-term df/tf stats",
    ),
    "keyword_search": QuerySpec(
        q_keyword_search,
        SQL_KEYWORD_SEARCH,
        "conjunctive keyword search over posting lists",
    ),
    "value_trend_per_type": QuerySpec(
        q_value_trend_per_type,
        SQL_VALUE_TREND_PER_TYPE,
        "per-group OLS slope + Pearson corr from mergeable centered moments",
    ),
    "copurchase_pairs": QuerySpec(
        q_copurchase_pairs,
        SQL_COPURCHASE_PAIRS,
        "item co-occurrence pairs within orders, bounded within-group self-merge",
    ),
    "revenue_rollup": QuerySpec(
        q_revenue_rollup,
        SQL_REVENUE_ROLLUP,
        "GROUP BY ROLLUP grouping sets from one finest-level distributed aggregate",
    ),
    "events_pivot_hourly": QuerySpec(
        q_events_pivot_hourly,
        SQL_EVENTS_PIVOT_HOURLY,
        "pivot/crosstab hour-of-day × event_type",
    ),
    "lang_entropy_per_source": QuerySpec(
        q_lang_entropy_per_source,
        SQL_LANG_ENTROPY_PER_SOURCE,
        "Shannon entropy of language mix per source",
    ),
    "funnel_stages": QuerySpec(
        q_funnel_stages,
        SQL_FUNNEL_STAGES,
        "ordered conversion funnel (min-ts strict-after semantics), one user_id exchange",
    ),
    "cohort_retention": QuerySpec(
        q_cohort_retention,
        SQL_COHORT_RETENTION,
        "weekly cohort retention matrix via distinct-pair combiner",
    ),
    "event_gap_stats": QuerySpec(
        q_event_gap_stats,
        SQL_EVENT_GAP_STATS,
        "distributed LAG(): per-type inter-event gap stats, exact int64-µs partials",
    ),
    "event_transitions": QuerySpec(
        q_event_transitions,
        SQL_EVENT_TRANSITIONS,
        "Markov event-type transition matrix from per-user consecutive pairs",
    ),
    "copurchase_triangles": QuerySpec(
        q_copurchase_triangles,
        SQL_COPURCHASE_TRIANGLES,
        "degree-oriented exact triangle count + clustering coefficient, no edge broadcast",
    ),
    "record_linkage": QuerySpec(
        q_record_linkage,
        SQL_RECORD_LINKAGE,
        "blocked entity resolution: prefix/suffix blocking + batch-Levenshtein verify",
    ),
    "peak_rolling_value": QuerySpec(
        q_peak_rolling_value,
        SQL_PEAK_ROLLING_VALUE,
        "ROWS-frame moving average per user (peak 5-event trailing mean), cents-exact",
    ),
    "skew_join_nation_value": QuerySpec(
        q_skew_join_nation_value,
        SQL_SKEW_JOIN_NATION_VALUE,
        "skew-aware join: sampled hot-key detection, broadcast hot path + cold exchange",
    ),
    "burst_detection": QuerySpec(
        q_burst_detection,
        SQL_BURST_DETECTION,
        "time-RANGE frame window: peak 1-hour burst per user via banded searchsorted",
    ),
    "order_price_deciles": QuerySpec(
        q_order_price_deciles,
        SQL_ORDER_PRICE_DECILES,
        "NTILE(10) via exact distributed global row-number (range-bucket + offset broadcast)",
    ),
    "curriculum_order": QuerySpec(
        q_curriculum_order, SQL_CURRICULUM_ORDER, "global distributed sort by difficulty proxy"
    ),
    "pii_scrub": QuerySpec(
        q_pii_scrub, SQL_PII_SCRUB, "vectorized PII scan+redact (RE2 chain, per-source partials)"
    ),
    "text_normalize": QuerySpec(
        q_text_normalize, SQL_TEXT_NORMALIZE, "canonicalize text (case/whitespace), effect summary"
    ),
    "zscore_outliers": QuerySpec(
        q_zscore_outliers, SQL_ZSCORE_OUTLIERS, "two-pass moments + broadcast z-score outliers"
    ),
    "stratified_sample_k": QuerySpec(
        q_stratified_sample_k, SQL_STRATIFIED_SAMPLE_K, "exact-k-per-group hash-order sample"
    ),
    "token_budget_sample": QuerySpec(
        q_token_budget_sample, SQL_TOKEN_BUDGET_SAMPLE, "per-source token-budget prefix cut"
    ),
    "gopher_repetition": QuerySpec(
        q_gopher_repetition,
        SQL_GOPHER_REPETITION,
        "Gopher repetition signals: dup-line / top-2-gram / dup-5-gram char fractions",
    ),
    "gopher_quality_rules": QuerySpec(
        q_gopher_quality_rules,
        SQL_GOPHER_QUALITY_RULES,
        "Gopher quality rule suite: per-rule fail counts, integer-exact gates",
    ),
    "c4_line_filter": QuerySpec(
        q_c4_line_filter,
        SQL_C4_LINE_FILTER,
        "C4 line cleaning: doc kills, terminal-punct/5-word/javascript line rule",
    ),
    "dsir_importance": QuerySpec(
        q_dsir_importance,
        SQL_DSIR_IMPORTANCE,
        "DSIR hashed-bigram importance weights (target=en), two streaming passes",
    ),
    "pq_ann_topk": QuerySpec(
        q_pq_ann_topk,
        SQL_PQ_ANN_TOPK,
        "product-quantization ADC top-10 vs independent scalar-loop reference",
    ),
    "bm25_two_pass": QuerySpec(
        q_bm25_two_pass,
        SQL_BM25_TWO_PASS,
        "BM25 ranked retrieval: zero-shuffle two-pass scoring + distributed top-k",
    ),
    "line_dedup_rewrite": QuerySpec(
        q_line_dedup_rewrite,
        SQL_LINE_DEDUP_REWRITE,
        "cross-doc line dedup (>=3 docs) + rewrite, per-source removal stats",
    ),
    "stride_chunks": QuerySpec(
        q_stride_chunks,
        SQL_STRIDE_CHUNKS,
        "sliding-window retrieval chunking (W=32, S=24), edge-checksummed",
    ),
    "fim_layout": QuerySpec(
        q_fim_layout,
        SQL_FIM_LAYOUT,
        "fill-in-the-middle PSM reorder, position-weighted checksum",
    ),
    "ngram_diversity": QuerySpec(
        q_ngram_diversity,
        SQL_NGRAM_DIVERSITY,
        "type/token n-gram diversity per source (n=1,2,3), tagged exchange",
    ),
    "knn_label_consistency": QuerySpec(
        q_knn_label_consistency,
        SQL_KNN_LABEL_CONSISTENCY,
        "leave-one-out exact 1-NN label-noise audit, tiled all-pairs scan",
    ),
    "blocklist_scan": QuerySpec(
        q_blocklist_scan,
        SQL_BLOCKLIST_SCAN,
        "C4-style blocklist scan (actor pool): flags + per-phrase occurrences",
    ),
    "budget_apportionment": QuerySpec(
        q_budget_apportionment,
        SQL_BUDGET_APPORTIONMENT,
        "largest-remainder (Hamilton) training-budget allocation, all-integer",
    ),
    "audio_downsample": QuerySpec(
        q_audio_downsample,
        SQL_AUDIO_DOWNSAMPLE,
        "2:1 WAV decimation (actor pool) vs independent stdlib-wave reference",
    ),
    "linear_attribution": QuerySpec(
        q_linear_attribution,
        SQL_LINEAR_ATTRIBUTION,
        "multi-touch linear attribution, integer-exact credit split by view hour",
    ),
    "vocab_coverage": QuerySpec(
        q_vocab_coverage,
        SQL_VOCAB_COVERAGE,
        "vocabulary coverage curve: smallest k covering 50/90/99% token mass",
    ),
    "partition_skew_audit": QuerySpec(
        q_partition_skew_audit,
        SQL_PARTITION_SKEW_AUDIT,
        "FNV-keyed partition skew preflight (rows + distinct users per partition)",
    ),
    "image_phash_dedup": QuerySpec(
        q_image_phash_dedup,
        SQL_IMAGE_PHASH_DEDUP,
        "perceptual dHash dedup: rescaled/brightness re-encodes collapse",
    ),
    "contrastive_pairs": QuerySpec(
        q_contrastive_pairs,
        SQL_CONTRASTIVE_PAIRS,
        "contrastive pair mining: nearest positive + hard negative per anchor",
    ),
    "cusum_changepoint": QuerySpec(
        q_cusum_changepoint,
        SQL_CUSUM_CHANGEPOINT,
        "CUSUM changepoint per event type, integer cross-multiplied deviations",
    ),
    "twap_user_value": QuerySpec(
        q_twap_user_value,
        SQL_TWAP_USER_VALUE,
        "time-weighted average value per user (exact µs×cents dot product)",
    ),
    "webclean_pipeline": QuerySpec(
        q_webclean_pipeline,
        SQL_WEBCLEAN_PIPELINE,
        "end-to-end web cleaning funnel: C4 kill/line → Gopher gates → line dedup",
    ),
    "incremental_agg": QuerySpec(
        q_incremental_agg,
        SQL_INCREMENTAL_AGG,
        "cross-run incremental aggregate state fold ≡ one-shot recompute",
    ),
    "zorder_locality": QuerySpec(
        q_zorder_locality,
        SQL_ZORDER_LOCALITY,
        "Z-order vs single-key layout: distinct blocks per user/hour predicate",
    ),
    "histogram_split_finder": QuerySpec(
        q_histogram_split_finder,
        SQL_HISTOGRAM_SPLIT_FINDER,
        "GBDT histogram split finding: integer partials + prefix-sum gain scan",
    ),
    "split_leakage_audit": QuerySpec(
        q_split_leakage_audit,
        SQL_SPLIT_LEAKAGE_AUDIT,
        "train/val near-dup leakage: LSH pairs × hash-fraction split categories",
    ),
    "sort_merge_revenue": QuerySpec(
        q_sort_merge_revenue,
        SQL_SORT_MERGE_REVENUE,
        "sort-merge physical join (range co-group + searchsorted runs)",
    ),
    "sssp_copurchase": QuerySpec(
        q_sssp_copurchase,
        SQL_SSSP_COPURCHASE,
        "weighted SSSP (Bellman-Ford rounds) vs independent Dijkstra reference",
    ),
    "image_channel_stats": QuerySpec(
        q_image_channel_stats,
        SQL_IMAGE_CHANNEL_STATS,
        "per-channel pixel means via actor-pool decode vs synthesis-time sums",
    ),
    "als_user_step": QuerySpec(
        q_als_user_step,
        SQL_ALS_USER_STEP,
        "ALS user half-step: per-user ridge solves in the bucketed exchange",
    ),
    "mmr_rerank": QuerySpec(
        q_mmr_rerank,
        SQL_MMR_RERANK,
        "MMR diverse retrieval: BM25 pool + greedy relevance-vs-Jaccard re-rank",
    ),
    "zonemap_pruned_scan": QuerySpec(
        q_zonemap_pruned_scan,
        SQL_ZONEMAP_PRUNED_SCAN,
        "zone-map data skipping: range-sorted files + manifest-pruned range scan",
    ),
    "isotonic_purchase_rate": QuerySpec(
        q_isotonic_purchase_rate,
        SQL_ISOTONIC_PURCHASE_RATE,
        "PAV isotonic calibration, cross-multiplied integer pool decisions",
    ),
    "woe_binning": QuerySpec(
        q_woe_binning,
        SQL_WOE_BINNING,
        "weight-of-evidence / IV decile audit via exact distributed NTILE",
    ),
    "kaplan_meier": QuerySpec(
        q_kaplan_meier,
        SQL_KAPLAN_MEIER,
        "Kaplan-Meier survival with right-censoring, mirrored exp-sum-log fold",
    ),
    "join_size_profile": QuerySpec(
        q_join_size_profile,
        SQL_JOIN_SIZE_PROFILE,
        "join cardinality per priority WITHOUT the join (count-vector co-group)",
    ),
    "embedding_drift_audit": QuerySpec(
        q_embedding_drift_audit,
        SQL_EMBEDDING_DRIFT_AUDIT,
        "per-label even/odd-half centroid cosine over integer µ-unit sums",
    ),
    "transitive_reach3": QuerySpec(
        q_transitive_reach3,
        SQL_TRANSITIVE_REACH3,
        "3-hop bounded transitive closure, per-round distinct frontier exchange",
    ),
    "unigram_em_step": QuerySpec(
        q_unigram_em_step_checked,
        SQL_UNIGRAM_EM_STEP,
        "SentencePiece unigram-LM E/M step vs independent scalar lattice artifact",
    ),
    "ucb1_replay": QuerySpec(
        q_ucb1_replay,
        SQL_UCB1_REPLAY,
        "offline UCB1 bandit replay per user-episode vs scalar replay artifact",
    ),
    "ndcg_bm25_eval": QuerySpec(
        q_ndcg_bm25_eval,
        SQL_NDCG_BM25_EVAL,
        "nDCG@10 of BM25 vs term-frequency relevance, integer positional weights",
    ),
    "t_closeness_audit": QuerySpec(
        q_t_closeness_audit,
        SQL_T_CLOSENESS_AUDIT,
        "t-closeness (ordered EMD vs global) per nation, integer EMD mass",
    ),
    "feature_hash_collisions": QuerySpec(
        q_feature_hash_collisions,
        SQL_FEATURE_HASH_COLLISIONS,
        "hashing-trick bucket-size histogram over the distinct vocab (md5)",
    ),
    "logreg_quality_step": QuerySpec(
        q_logreg_quality_step,
        SQL_LOGREG_QUALITY_STEP,
        "one exact full-batch logreg gradient step from zero weights",
    ),
    "clustering_coefficient": QuerySpec(
        q_clustering_coefficient,
        SQL_CLUSTERING_COEFFICIENT,
        "per-node local clustering coefficient, corner-credited oriented wedges",
    ),
    "containment_pairs": QuerySpec(
        q_containment_pairs,
        SQL_CONTAINMENT_PAIRS,
        "ordered gram-containment near-dup pairs (|A∩B|/|A| ≥ 0.6, df-capped)",
    ),
    "cdc_chunk_dedup": QuerySpec(
        q_cdc_chunk_dedup,
        SQL_CDC_CHUNK_DEDUP,
        "content-defined-chunking storage dedup vs independent scalar chunker",
    ),
    "mixture_ess_audit": QuerySpec(
        q_mixture_ess_audit,
        SQL_MIXTURE_ESS_AUDIT,
        "Kish effective-sample-size of the length-weighted mixture per source",
    ),
    "psi_drift": QuerySpec(
        q_psi_drift,
        SQL_PSI_DRIFT,
        "population-stability-index value drift per event type, Laplace bins",
    ),
    "ece_calibration": QuerySpec(
        q_ece_calibration,
        SQL_ECE_CALIBRATION,
        "expected-calibration-error bins from an even/odd leakage-free split",
    ),
    "cuped_adjustment": QuerySpec(
        q_cuped_adjustment,
        SQL_CUPED_ADJUSTMENT,
        "CUPED variance-reduced A/B readout, integer raw-moment theta",
    ),
    "count_min_audit": QuerySpec(
        q_count_min_audit,
        SQL_COUNT_MIN_AUDIT,
        "Count-Min sketch (4×256, mergeable partials) overcount audit vs exact top-15",
    ),
    "spearman_qty_price": QuerySpec(
        q_spearman_qty_price,
        SQL_SPEARMAN_QTY_PRICE,
        "Spearman rho with average-rank ties, exact bigint sufficient statistics",
    ),
    "kendall_tau_qty_disc": QuerySpec(
        q_kendall_tau_qty_disc,
        SQL_KENDALL_TAU_QTY_DISC,
        "Kendall tau-b from the bounded 2-D cell histogram, exact pair masses",
    ),
    "cube_revenue": QuerySpec(
        q_cube_revenue,
        SQL_CUBE_REVENUE,
        "OLAP CUBE(region, year, priority) expanded from one base-grid exchange",
    ),
    "mlm_mask_stats": QuerySpec(
        q_mlm_mask_stats,
        SQL_MLM_MASK_STATS,
        "deterministic BERT-style 15%/80-10-10 masking layout audit per source",
    ),
    "decayed_topk_users": QuerySpec(
        q_decayed_topk_users,
        SQL_DECAYED_TOPK_USERS,
        "time-decayed heavy hitters via exact dyadic week-bucket weights",
    ),
    "hits_scores": QuerySpec(
        q_hits_scores,
        SQL_HITS_SCORES,
        "HITS hubs/authorities, one integer-exact iteration over bipartite edges",
    ),
    "ring_rebalance": QuerySpec(
        q_ring_rebalance,
        SQL_RING_REBALANCE,
        "consistent-hash ring shard assignment + minimal-movement rebalance audit",
    ),
    "kneser_ney_bigram": QuerySpec(
        q_kneser_ney_bigram,
        SQL_KNESER_NEY_BIGRAM,
        "Kneser-Ney bigram smoothing from one bigram exchange, KN terms from the histogram",
    ),
    "chars_per_token": QuerySpec(
        q_chars_per_token,
        SQL_CHARS_PER_TOKEN,
        "tokenizer fertility (chars/token) per source from two bounded aggregates",
    ),
    "train_interleave_audit": QuerySpec(
        q_train_interleave_audit,
        SQL_TRAIN_INTERLEAVE_AUDIT,
        "stride-scheduled source interleaving audit from one bounded aggregate, no sort",
    ),
    "good_turing_counts": QuerySpec(
        q_good_turing_counts,
        SQL_GOOD_TURING_COUNTS,
        "Good-Turing count-of-counts + discounted r* over the token frequency table",
    ),
    "rbo_rank_overlap": QuerySpec(
        q_rbo_rank_overlap,
        SQL_RBO_RANK_OVERLAP,
        "rank-biased overlap between half-period purchase-value top-50 rankings",
    ),
    "csv_ingest_stats": QuerySpec(
        q_csv_ingest_stats,
        SQL_CSV_INGEST_STATS,
        "CSV source format end-to-end: RFC-4180 edge cases, NULL accounting, bounded aggregate",
    ),
    "parquet_footprint_audit": QuerySpec(
        q_parquet_footprint_audit,
        SQL_PARQUET_FOOTPRINT_AUDIT,
        "per-column parquet storage footprint from footer metadata only",
    ),
    "poisson_bootstrap_ci": QuerySpec(
        q_poisson_bootstrap_ci,
        SQL_POISSON_BOOTSTRAP_CI,
        "web-scale Poisson bootstrap: per-row hash weights, B partial rows exchanged, CI from 64 replicate means",
    ),
    "dp_event_counts": QuerySpec(
        q_dp_event_counts,
        SQL_DP_EVENT_COUNTS,
        "eps=1 Laplace DP count release with deterministic md5-seeded noise",
    ),
    "ccnet_perplexity_buckets": QuerySpec(
        q_ccnet_perplexity_buckets,
        SQL_CCNET_PERPLEXITY_BUCKETS,
        "CCNet head/middle/tail perplexity bucketing: µnat unigram LM, exact integer terciles",
    ),
    "negative_sampling_table": QuerySpec(
        q_negative_sampling_table,
        SQL_NEGATIVE_SAMPLING_TABLE,
        "word2vec unigram^0.75 negative-sampling table, exact Hamilton slot apportionment",
    ),
    "sequence_mining_triples": QuerySpec(
        q_sequence_mining_triples,
        SQL_SEQUENCE_MINING_TRIPLES,
        "PrefixSpan-style length-3 subsequence support over user event streams",
    ),
    "neyman_sample": QuerySpec(
        q_neyman_sample,
        SQL_NEYMAN_SAMPLE,
        "Neyman stratified allocation: integer dispersion mass, Hamilton slots, hash-order sample",
    ),
    "phrase_search": QuerySpec(
        q_phrase_search,
        SQL_PHRASE_SEARCH,
        "positional phrase search: top corpus bigram, exact-adjacency per-doc occurrences",
    ),
    "partition_digest": QuerySpec(
        q_partition_digest,
        SQL_PARTITION_DIGEST,
        "anti-entropy shard digests: mergeable md5-prefix sums for cross-replica reconciliation",
    ),
    "label_propagation": QuerySpec(
        q_label_propagation,
        SQL_LABEL_PROPAGATION,
        "4-round synchronous min-label propagation over the co-purchase graph",
    ),
    "expectation_audit": QuerySpec(
        q_expectation_audit,
        SQL_EXPECTATION_AUDIT,
        "declarative 8-rule expectation suite: range/domain/unique/format/referential",
    ),
    "degree_assortativity": QuerySpec(
        q_degree_assortativity,
        SQL_DEGREE_ASSORTATIVITY,
        "Newman degree assortativity of the co-purchase graph from integer moment partials",
    ),
    "jl_projection_audit": QuerySpec(
        q_jl_projection_audit,
        SQL_JL_PROJECTION_AUDIT,
        "JL sign-projection distortion histogram, integer-exact cross-multiplied buckets",
    ),
    "successive_halving": QuerySpec(
        q_successive_halving,
        SQL_SUCCESSIVE_HALVING,
        "successive-halving replay over user arms with integer cumulative-cents metrics",
    ),
    "adjacent_lcp_audit": QuerySpec(
        q_adjacent_lcp_audit,
        SQL_ADJACENT_LCP_AUDIT,
        "suffix-array-style dedup prefilter: sorted-adjacent word-level LCP histogram",
    ),
    "bradley_terry_step": QuerySpec(
        q_bradley_terry_step,
        SQL_BRADLEY_TERRY_STEP,
        "Bradley-Terry preference strengths, two integer-exact MM iterations",
    ),
    "random_walk_corpus": QuerySpec(
        q_random_walk_corpus,
        SQL_RANDOM_WALK_CORPUS,
        "DeepWalk walk-corpus generation: deterministic hash-picked 4-step walks",
    ),
    "pareto_layers": QuerySpec(
        q_pareto_layers,
        SQL_PARETO_LAYERS,
        "onion-peeled Pareto layers (3 skyline peels) with local-layer prune",
    ),
    "elias_fano_audit": QuerySpec(
        q_elias_fano_audit,
        SQL_ELIAS_FANO_AUDIT,
        "Elias-Fano posting footprint vs plain-32-bit by doc-frequency bucket, integer-exact",
    ),
    "encoding_advisor": QuerySpec(
        q_encoding_advisor,
        SQL_ENCODING_ADVISOR,
        "columnar encoding advisor: exact ndv + positional run counts + integer rules",
    ),
    "gorilla_timestamp_audit": QuerySpec(
        q_gorilla_timestamp_audit,
        SQL_GORILLA_TIMESTAMP_AUDIT,
        "Gorilla delta-of-delta timestamp compression sizing, integer bit buckets",
    ),
    "dirichlet_ql_retrieval": QuerySpec(
        q_dirichlet_ql_retrieval,
        SQL_DIRICHLET_QL_RETRIEVAL,
        "Dirichlet-smoothed query likelihood retrieval, µnat-integer scores",
    ),
    "diff_in_diff": QuerySpec(
        q_diff_in_diff,
        SQL_DIFF_IN_DIFF,
        "difference-in-differences on purchase cents: odd/even users x midpoint periods",
    ),
    "soft_dedup_weights": QuerySpec(
        q_soft_dedup_weights,
        SQL_SOFT_DEDUP_WEIGHTS,
        "SoftDeDup 1/c loss weighting: per-source effective µtoken mass, integer-exact",
    ),
    "stratified_kfold": QuerySpec(
        q_stratified_kfold,
        SQL_STRATIFIED_KFOLD,
        "stratified k-fold assignment in md5 hash order, balanced to ±1 per stratum",
    ),
    "image_tile_entropy": QuerySpec(
        q_image_tile_entropy,
        SQL_IMAGE_TILE_ENTROPY,
        "vision-curation texture audit: integer 8x8 tile variance buckets vs synthesis truth",
    ),
    "audio_vad_energy": QuerySpec(
        q_audio_vad_energy,
        SQL_AUDIO_VAD_ENERGY,
        "energy-threshold VAD over PCM frames: active counts + longest run vs synthesis truth",
    ),
    "demographic_parity": QuerySpec(
        q_demographic_parity,
        SQL_DEMOGRAPHIC_PARITY,
        "four-fifths disparate-impact audit with integer cross-multiplied verdict",
    ),
    "motif_discovery": QuerySpec(
        q_motif_discovery,
        SQL_MOTIF_DISCOVERY,
        "matrix-profile-style weekly motif pairs by exact integer SSD",
    ),
    "binary_segmentation": QuerySpec(
        q_binary_segmentation,
        SQL_BINARY_SEGMENTATION,
        "binary-segmentation changepoint: exact integer SSE argmax split",
    ),
    "lloyd_step_quantized": QuerySpec(
        q_lloyd_step_quantized,
        SQL_LLOYD_STEP_QUANTIZED,
        "exact Lloyd assignment step on µ-int embeddings: integer distances, k-row partials",
    ),
    "cohens_kappa": QuerySpec(
        q_cohens_kappa,
        SQL_COHENS_KAPPA,
        "Cohen's kappa between two deterministic labeling rules, integer confusion matrix",
    ),
    "champion_lists": QuerySpec(
        q_champion_lists,
        SQL_CHAMPION_LISTS,
        "tiered-index champion lists: per-top-term top-5 docs by tf, distributed top-k prune",
    ),
    "loso_quality_delta": QuerySpec(
        q_loso_quality_delta,
        SQL_LOSO_QUALITY_DELTA,
        "leave-one-source-out ablation sweep from one (sum, n) exchange",
    ),
    "burn_rate_alerts": QuerySpec(
        q_burn_rate_alerts,
        SQL_BURN_RATE_ALERTS,
        "multi-window SLO burn-rate alerts with integer cross-multiplied verdicts",
    ),
    "wasserstein_1d": QuerySpec(
        q_wasserstein_1d,
        SQL_WASSERSTEIN_1D,
        "exact 1-D earth-mover distance between group distributions, integer numerator",
    ),
    "vocab_id_assignment": QuerySpec(
        q_vocab_id_assignment,
        SQL_VOCAB_ID_ASSIGNMENT,
        "dictionary-encoding dense ids by first-appearance min-combiner order",
    ),
    "streaming_moments": QuerySpec(
        q_streaming_moments,
        SQL_STREAMING_MOMENTS,
        "exact mergeable moments via >64-bit string-carried power-sum partials",
    ),
    "nucleus_vocab_cut": QuerySpec(
        q_nucleus_vocab_cut,
        SQL_NUCLEUS_VOCAB_CUT,
        "top-p nucleus vocabulary cut per source, integer ceil threshold",
    ),
    "dp_clipped_mean": QuerySpec(
        q_dp_clipped_mean,
        SQL_DP_CLIPPED_MEAN,
        "DP clip-and-Laplace mean release with md5-seeded deterministic noise",
    ),
    "rocchio_expansion": QuerySpec(
        q_rocchio_expansion,
        SQL_ROCCHIO_EXPANSION,
        "Rocchio pseudo-relevance feedback: seed → feedback docs → tf-idf expansion → rescore",
    ),
    "dp_degree_histogram": QuerySpec(
        q_dp_degree_histogram,
        SQL_DP_DEGREE_HISTOGRAM,
        "node-DP degree release: clip-at-20 projection + Laplace(2D/eps) md5 noise",
    ),
    "canonical_selection": QuerySpec(
        q_canonical_selection,
        SQL_CANONICAL_SELECTION,
        "quality-aware dedup survivorship: keep the longest copy per exact cluster",
    ),
    "mrr_eval": QuerySpec(
        q_mrr_eval,
        SQL_MRR_EVAL,
        "mean-reciprocal-rank eval: first-relevant rank without a global sort",
    ),
    "rich_club_coefficient": QuerySpec(
        q_rich_club_coefficient,
        SQL_RICH_CLUB_COEFFICIENT,
        "rich-club density among degree->k hubs, one broadcast edge scan for all thresholds",
    ),
    "prefix_filter_join": QuerySpec(
        q_prefix_filter_join,
        SQL_PREFIX_FILTER_JOIN,
        "PPJoin prefix-filtered exact-Jaccard join vs the exhaustive oracle",
    ),
    "markov_stationary": QuerySpec(
        q_markov_stationary,
        SQL_MARKOV_STATIONARY,
        "stationary distribution by 20 integer-quantized power iterations",
    ),
    "weighted_sample_es": QuerySpec(
        q_weighted_sample_es,
        SQL_WEIGHTED_SAMPLE_ES,
        "Efraimidis-Spirakis weighted sampling w/o replacement as a mergeable top-k",
    ),
    "selectivity_independence_audit": QuerySpec(
        q_selectivity_independence_audit,
        SQL_SELECTIVITY_INDEPENDENCE_AUDIT,
        "CBO independence-assumption audit with integer cross-multiplied lift verdict",
    ),
    "shapley_attribution": QuerySpec(
        q_shapley_attribution,
        SQL_SHAPLEY_ATTRIBUTION,
        "exact 3-channel Shapley attribution in sixth-cents, all orderings enumerated",
    ),
    "token_bucket_audit": QuerySpec(
        q_token_bucket_audit,
        SQL_TOKEN_BUCKET_AUDIT,
        "token-bucket admission replay per user; recursive-CTE oracle mirrors the fold",
    ),
    "lru_cache_audit": QuerySpec(
        q_lru_cache_audit,
        SQL_LRU_CACHE_AUDIT,
        "LRU(4) hit rate: real automaton vs Mattson stack-distance oracle",
    ),
    "hill_tail_index": QuerySpec(
        q_hill_tail_index,
        SQL_HILL_TAIL_INDEX,
        "Hill heavy-tail index over the top-100 purchases, µnat-integer log terms",
    ),
    "skipgram_pairs": QuerySpec(
        q_skipgram_pairs,
        SQL_SKIPGRAM_PAIRS,
        "word2vec skip-gram window-2 context pairs, shifted vectorized views",
    ),
}


def prematerialize_oracle_artifacts(sf_dir: str = "/root/testdata/sf0.01") -> None:
    """Make every /tmp artifact an oracle references exist, independent of
    query-vs-oracle execution order (called from __ray_entry__.oracle_sql)."""
    ensure_loglines_corpus(sf_dir)
    ensure_derived_parquet(sf_dir)
    ensure_packing_artifact(sf_dir)
    ensure_simhash_parquet(sf_dir)
    ensure_media_parquet(sf_dir)
    ensure_curation_parquet(sf_dir)
    ensure_bpe_merges_parquet(sf_dir)
    ensure_bpe_encoded_parquet(sf_dir)
    ensure_zlib_sizes_parquet(sf_dir)
    ensure_minhash_incremental_parquet(sf_dir)
    ensure_gram_hashes_parquet(sf_dir)
    ensure_kcenter_parquet(sf_dir)
    ensure_web_docs_parquet(sf_dir)
    ensure_dsir_buckets_parquet(sf_dir)
    ensure_pq_ref_parquet(sf_dir)
    ensure_audio_resample_parquet(sf_dir)
    ensure_user_partition_parquet(sf_dir)
    ensure_scale_dups_parquet(sf_dir)
    ensure_channel_stats_parquet(sf_dir)
    ensure_sssp_parquet(sf_dir)
    ensure_als_ref_parquet(sf_dir)
    ensure_mmr_ref_parquet(sf_dir)
    ensure_isotonic_ref_parquet(sf_dir)
    ensure_unigram_em_parquet(sf_dir)
    ensure_ucb1_parquet(sf_dir)
    ensure_cdc_chunks_parquet(sf_dir)
