"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import ORACLE_ARTIFACT_DIR, _corpus_dir, _i64, _rd, grouped_sums, pa, pc, pd, pq, rd  # noqa: F401

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


