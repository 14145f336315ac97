"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import _i64, _rd, _t, np, pa, pc, pd, topk  # noqa: F401

# ---------------------------------------------------------------------------
# Wave 34: LRU cache audit via stack-distance equivalence, Hill tail index
# ---------------------------------------------------------------------------

_LRU_CAP = 4


def q_lru_cache_audit(sf_dir: str) -> pd.DataFrame:
    """LRU cache hit-rate replay over per-customer part-access streams (the
    cache-sizing study behind every serving tier): capacity 4, accesses in
    order-date order.  The Ray side runs the ACTUAL LRU automaton — jagged
    lockstep-vectorized across every customer in the bucket (one numpy step
    per stream position over a customers×CAP slot matrix; the matrix is
    |customers|×max-stream-length, so salt pathologically long streams
    upstream if a tenant dominates) inside the customer-bucketed exchange;
    the oracle
    instead uses Mattson's stack-distance equivalence — an access hits LRU(C)
    iff fewer than C distinct items were touched since the previous access of
    the same item — so two INDEPENDENT formulations of cache behaviour must
    agree bit-for-bit."""
    from ...functions.relational import bucketed_group_reduce, hash_join

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_linenumber"])
    acc = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # Jagged lockstep vectorization: all customers advance one access per
        # numpy step over a (customers × _LRU_CAP) slot matrix — slot CAP-1 is
        # most-recent, empties live at the left, so ONE shift-left-and-append
        # implements insert, evict-LRU and move-to-front alike (on a hit the
        # matched slot is deleted first).  Replaces the per-access Python
        # automaton; the loop is over the max stream LENGTH, not accesses.
        df = df.sort_values(
            ["o_custkey", "o_orderdate", "l_orderkey", "l_linenumber", "l_partkey"],
            kind="stable",
        )
        cust = df["o_custkey"].to_numpy(np.int64)
        part = df["l_partkey"].to_numpy(np.int64)
        if len(df) == 0:
            return pd.DataFrame({"n_customers": pd.Series([], dtype="int64"),
                                 "n_accesses": pd.Series([], dtype="int64"),
                                 "hits": pd.Series([], dtype="int64")})
        new = np.empty(len(cust), dtype=bool)
        new[0] = True
        new[1:] = cust[1:] != cust[:-1]
        row = np.cumsum(new) - 1                      # customer index
        starts = np.flatnonzero(new)
        t = np.arange(len(cust)) - starts[row]        # position in stream
        ncust = int(row[-1]) + 1
        max_len = int(t.max()) + 1
        M = np.full((ncust, max_len), -1, dtype=np.int64)
        M[row, t] = part
        S = np.full((ncust, _LRU_CAP), -1, dtype=np.int64)
        hits = 0
        for step in range(max_len):
            x = M[:, step]
            active = x >= 0
            eq = S == x[:, None]                      # at most one slot matches
            hit = eq.any(axis=1) & active
            hits += int(hit.sum())
            # delete the matched slot by shifting everything LEFT of it
            # right by one, so the hole lands at slot 0 where empties live
            # (no match → no-op); then one shift-left-append serves hit,
            # miss-evict and miss-insert alike (slot 0 is hole/empty/LRU)
            left_of_hit = np.cumsum(eq[:, ::-1], axis=1)[:, ::-1].astype(bool)
            shifted_r = np.concatenate(
                [np.full((ncust, 1), -1, dtype=np.int64), S[:, :-1]], axis=1
            )
            S_del = np.where(left_of_hit, shifted_r, S)
            S_new = np.concatenate([S_del[:, 1:], x[:, None]], axis=1)
            S = np.where(active[:, None], S_new, S)
        return pd.DataFrame(
            {"n_customers": [ncust], "n_accesses": [len(cust)], "hits": [hits]}
        )

    agg = (
        bucketed_group_reduce(acc, ["o_custkey"], per_bucket, num_buckets=32)
        .to_pandas()
        .sum()
    )
    n_acc, hits = int(agg["n_accesses"]), int(agg["hits"])
    out = pd.DataFrame(
        [{"n_customers": int(agg["n_customers"]), "n_accesses": n_acc,
          "hits": hits, "misses": n_acc - hits,
          "hit_rate": _rd(float(hits) / float(n_acc), 6)}]
    )
    return _i64(out, ["n_customers", "n_accesses", "hits", "misses"])


SQL_LRU_CACHE_AUDIT = f"""
WITH acc AS MATERIALIZED (
  SELECT o_custkey AS cust, l_partkey AS part,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, l_orderkey, l_linenumber,
                                     l_partkey) AS rn
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
prev AS (
  SELECT cust, part, rn,
         LAG(rn) OVER (PARTITION BY cust, part ORDER BY rn) AS prn
  FROM acc),
hit AS (
  SELECT p.cust, p.rn
  FROM prev p
  WHERE p.prn IS NOT NULL
    AND (SELECT COUNT(DISTINCT a2.part) FROM acc a2
         WHERE a2.cust = p.cust AND a2.rn > p.prn AND a2.rn < p.rn)
        < {_LRU_CAP}),
tot AS (SELECT COUNT(DISTINCT cust) AS n_customers, COUNT(*) AS n_accesses
        FROM acc),
h AS (SELECT COUNT(*) AS hits FROM hit)
SELECT tot.n_customers, tot.n_accesses, CAST(h.hits AS BIGINT) AS hits,
       CAST(tot.n_accesses - h.hits AS BIGINT) AS misses,
       ROUND(CAST(h.hits AS DOUBLE) / CAST(tot.n_accesses AS DOUBLE), 6)
         AS hit_rate
FROM tot CROSS JOIN h
"""


_HILL_K = 100


def q_hill_tail_index(sf_dir: str) -> pd.DataFrame:
    """Hill estimator of the purchase-value tail index (Hill 1975, the
    heavy-tail diagnostic behind capacity planning and loss modelling):
    over the k=100 largest purchase cents, ξ = (1/k)·Σ ln(x_i / x_{k+1}) —
    each log term µnat-quantized to an integer (LN-parity convention)
    before the sum, so both engines agree exactly; α = 1/ξ closes in the
    same double expression.  One distributed top-(k+1) prune; the estimator
    runs over k+1 rows."""
    ds = _t(sf_dir, "events", ["event_id", "event_type", "value"])

    def cents_rows(t: pa.Table) -> pd.DataFrame:
        is_p = pc.equal(t["event_type"], "purchase").to_numpy(zero_copy_only=False)
        c = _rd(t["value"].to_numpy(zero_copy_only=False)[is_p] * 100.0, 0).astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)[is_p]
        keep = c > 0
        return pd.DataFrame({"event_id": eid[keep], "cents": c[keep]})

    rows = ds.map_batches(cents_rows, batch_format="pyarrow", zero_copy_batch=True)
    top = topk(rows, ["cents", "event_id"], [True, False], _HILL_K + 1).to_pandas()
    x = top["cents"].to_numpy(np.int64)
    k = len(x) - 1
    if k < 1:
        # Degenerate corpus (<2 positive purchases): the oracle's aggregate
        # CTE still yields one row with k=0 and NULL sum/xi and NaN alpha —
        # degrade identically instead of dividing by zero.
        out = pd.DataFrame(
            [{"k": 0, "x_threshold": int(x[0]) if len(x) else None,
              "sum_unats": None, "xi_unats": None, "alpha": float("nan")}]
        )
        out["k"] = out["k"].astype("int64")
        out["x_threshold"] = out["x_threshold"].astype("Int64")
        out["sum_unats"] = out["sum_unats"].astype("Int64")
        out["xi_unats"] = out["xi_unats"].astype("Float64")
        return out
    xk1 = int(x[k])
    terms = _rd(np.log(x[:k].astype(np.float64) / float(xk1)) * 1e6, 0).astype(np.int64)
    s = int(terms.sum())
    xi = float(s) / float(k)
    out = pd.DataFrame(
        [{"k": k, "x_threshold": xk1, "sum_unats": s,
          "xi_unats": _rd(xi, 6),
          "alpha": _rd(1e6 / xi, 6) if xi > 0 else float("nan")}]
    )
    return _i64(out, ["k", "x_threshold", "sum_unats"])


SQL_HILL_TAIL_INDEX = f"""
WITH p AS (
  SELECT event_id, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
    AND CAST(ROUND(value * 100, 0) AS BIGINT) > 0),
top AS (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents DESC, event_id) AS rn
        FROM p ORDER BY cents DESC, event_id LIMIT {_HILL_K + 1}),
thr AS (SELECT cents AS xk1 FROM top WHERE rn = (SELECT MAX(rn) FROM top)),
t AS (
  SELECT CAST(ROUND(LN(CAST(cents AS DOUBLE) / CAST((SELECT xk1 FROM thr) AS DOUBLE))
                    * 1000000, 0) AS BIGINT) AS u
  FROM top WHERE rn < (SELECT MAX(rn) FROM top)),
s AS (SELECT CAST(SUM(u) AS BIGINT) AS su, COUNT(*) AS k FROM t)
SELECT k, (SELECT xk1 FROM thr) AS x_threshold, su AS sum_unats,
       ROUND(CAST(su AS DOUBLE) / k, 6) AS xi_unats,
       CASE WHEN su > 0 THEN ROUND(1000000.0 / (CAST(su AS DOUBLE) / k), 6)
            ELSE CAST('nan' AS DOUBLE) END AS alpha
FROM s
"""


