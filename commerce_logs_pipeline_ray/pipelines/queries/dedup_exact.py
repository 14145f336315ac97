"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import _i64, _t, md5_hex, pa, pc, pd  # noqa: F401

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

    from ...functions.relational import bucketed_group_reduce

    out = bucketed_group_reduce(partials, ["fp"], combine).to_pandas()
    return _i64(out, ["keeper", "n_copies"])


SQL_DEDUP_EXACT = """
SELECT md5(text) AS fp, MIN(doc_id) AS keeper, COUNT(*) AS n_copies
FROM documents GROUP BY 1
"""

