"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import (
    MALFORM_MOD,
    MALFORM_REM,
    _i64,
    _t,
    docs_tenant,
    final_agg,
    n_words,
    pa,
    parse_batch,
    partial_agg,
    pc,
    pd,
    route_batch,
    sid_column,
)  # noqa: F401

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

