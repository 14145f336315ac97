"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import _i64, _rd, _t, grouped_sums, pa, pc, pd  # noqa: F401

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

