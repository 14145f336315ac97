"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import (
    _i64,
    _rd,
    _t,
    broadcast_join,
    datetime,
    grouped_sums,
    pa,
    pads,
    pc,
    pd,
    pq,
    rd,
    topk,
)  # noqa: F401

# ---------------------------------------------------------------------------
# Large×large hash join (J3): lineitem revenue per order joined to orders
# ---------------------------------------------------------------------------

def q_order_revenue_topk(sf_dir: str) -> pd.DataFrame:
    from ...functions.relational import hash_join

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
    from ...functions.relational import bloom_semi_join

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

    from ...functions.relational import semi_join_broadcast

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
    from ...functions.relational import hash_join

    lo, hi = datetime(1996, 1, 1), datetime(1999, 1, 1)
    expr = (pads.field("o_orderdate") >= pa.scalar(lo, pa.timestamp("us"))) & (
        pads.field("o_orderdate") < pa.scalar(hi, pa.timestamp("us"))
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"], filter=expr
    )
    from ...functions.relational import auto_join

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
    from ...functions.asof import asof_join

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
    from ...functions.asof import range_join_count

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
    from ...functions.asof import global_range_join_count

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

