"""Wave 70: Arrow IPC (Feather v2) as a source format.

* ipc_ingest_stats — the documents table materialized once as FOUR Arrow
  IPC files by the engine, read back DISTRIBUTED via
  ``ray.data.read_binary_files`` + a per-batch ``pa.ipc.open_file`` decode
  (the actor-side decode pattern every binary source uses), then the same
  (lang, source) combiner fold as the JSONL/CSV source queries.  The
  oracle aggregates the equivalent content from the documents view — the
  IPC encode/decode round-trip must reproduce it exactly.  Completes the
  source-format matrix: parquet, CSV, JSONL, Arrow IPC.
"""
from __future__ import annotations

import os as _os

from ._base import _i64, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from ._base import _corpus_dir, grouped_sums  # noqa: F401

_IPC_SHARDS = 4


def ensure_documents_ipc(sf_dir: str) -> str:
    """Materialize documents as Arrow IPC shard files once per sf-dir."""
    out_dir = _os.path.join(_corpus_dir(sf_dir), "documents_ipc")
    done = _os.path.join(out_dir, "_DONE")
    if _os.path.exists(done):
        return out_dir
    _os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    n = t.num_rows
    per = max(1, (n + _IPC_SHARDS - 1) // _IPC_SHARDS)
    for i in range(_IPC_SHARDS):
        chunk = t.slice(i * per, per)
        if chunk.num_rows == 0:
            continue
        tmp = _os.path.join(out_dir, f".tmp-{i:03d}.arrow")
        with pa.OSFile(tmp, "wb") as f:
            with pa.ipc.new_file(f, chunk.schema) as w:
                w.write_table(chunk)
        _os.replace(tmp, _os.path.join(out_dir, f"part-{i:03d}.arrow"))
    with open(done, "w") as f:
        f.write("ok")
    return out_dir


def q_ipc_ingest_stats(sf_dir: str) -> pd.DataFrame:
    """Distributed Arrow-IPC ingest: binary file blocks decode per batch
    (zero-copy IPC buffers), one (lang, source) combiner pass, bounded
    driver fold — the same stats row the JSONL source query computes."""
    path = ensure_documents_ipc(sf_dir)
    files = rd.read_binary_files(path, file_extensions=["arrow"])

    def decode(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for payload in df["bytes"]:
            t = pa.ipc.open_file(pa.BufferReader(payload)).read_all()
            g = t.select(["doc_id", "lang", "source", "n_chars"]).to_pandas()
            outs.append(g.groupby(["lang", "source"], as_index=False).agg(
                n_docs=("doc_id", "size"), total_chars=("n_chars", "sum"),
                max_doc=("doc_id", "max")))
        return pd.concat(outs, ignore_index=True)

    parts = files.map_batches(decode, batch_format="pandas").to_pandas()
    out = parts.groupby(["lang", "source"], as_index=False).agg(
        n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum"),
        max_doc=("max_doc", "max"))
    out = out.sort_values(["lang", "source"], ignore_index=True)
    return _i64(out, ["n_docs", "total_chars", "max_doc"])


SQL_IPC_INGEST_STATS = """
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc
FROM documents
GROUP BY 1, 2 ORDER BY 1, 2
"""
