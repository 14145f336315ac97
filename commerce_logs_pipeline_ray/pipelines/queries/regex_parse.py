"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import _i64, _rd, _t, grouped_sums, pa, pc, pd  # noqa: F401

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

