"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import _i64, _t, grouped_sums, pa, pc, pd  # noqa: F401

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

