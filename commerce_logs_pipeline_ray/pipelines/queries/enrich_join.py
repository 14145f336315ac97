"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import _i64, _rd, _t, broadcast_join, grouped_sums, pa, pd, pq  # noqa: F401

# ---------------------------------------------------------------------------
# Broadcast enrichment join chain (J1/ST2): orders ⋈ customer ⋈ nation ⋈ region
# ---------------------------------------------------------------------------

def q_orders_by_region(sf_dir: str) -> pd.DataFrame:
    from ...functions.relational import auto_join

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

