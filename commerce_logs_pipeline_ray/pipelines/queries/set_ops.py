"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import _i64, _rd, _t, pd, topk  # noqa: F401

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

