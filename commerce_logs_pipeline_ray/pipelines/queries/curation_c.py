"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import (
    ORACLE_ARTIFACT_DIR,
    _i64,
    _rd,
    _t,
    broadcast_join,
    datetime,
    grouped_sums,
    np,
    pa,
    pads,
    pc,
    pd,
    pq,
    rd,
    topk,
)  # noqa: F401
from .curation_a import ensure_messy_parquet  # noqa: F401
from .curation_b import ensure_curation_parquet  # noqa: F401

SQL_WEIGHTED_MEDIAN_PRICE = """
WITH c AS (
  SELECT l_returnflag AS k, CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS bin,
         SUM(CAST(l_quantity AS BIGINT)) AS w
  FROM lineitem GROUP BY 1, 2),
cw AS (
  SELECT k, bin, w,
         SUM(w) OVER (PARTITION BY k ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(w) OVER (PARTITION BY k) AS total
  FROM c)
SELECT k AS l_returnflag,
       ROUND(MIN(bin) FILTER (cum >= (total + 1) // 2) / 100.0, 2) AS wmedian_price,
       CAST(MAX(total) AS BIGINT) AS total_qty
FROM cw GROUP BY k ORDER BY k
"""


def q_ttr_per_source(sf_dir: str) -> pd.DataFrame:
    """Type-token ratio (lexical diversity) per source: per-doc
    distinct-words / words, averaged per source.  A document is whole
    within its batch, so both counts come out of the ONE per-batch
    tokenize (distinct via the same grouped postings kernel); only
    (source, Σttr, n_docs) scalar partials reduce."""
    from ...functions.search import TOKEN_SPLIT

    docs = _t(sf_dir, "documents", ["source", "text"])

    def part(t: pa.Table) -> pa.Table:
        words = pc.split_pattern_regex(pc.utf8_lower(t["text"]), TOKEN_SPLIT)
        words = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        parents = pc.list_parent_indices(words)
        flat = pa.table({"i": parents, "term": words.flatten()})
        flat = flat.filter(pc.not_equal(flat["term"], ""))
        df = flat.to_pandas()
        tok = df.groupby("i").size()
        typ = df.drop_duplicates().groupby("i").size()
        src = t["source"].to_pandas()
        ttr = (typ / tok).reindex(tok.index)
        g = pd.DataFrame({"source": src.iloc[tok.index].to_numpy(), "ttr": ttr.to_numpy()})
        out = g.groupby("source", as_index=False).agg(s=("ttr", "sum"), n_docs=("ttr", "size"))
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = docs.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = agg.groupby("source", as_index=False).agg(s=("s", "sum"), n_docs=("n_docs", "sum"))
    out["avg_ttr"] = (out["s"] / out["n_docs"]).pipe(_rd)
    out = out.drop(columns=["s"]).sort_values("source", ignore_index=True)
    return _i64(out, ["n_docs"])


SQL_TTR_PER_SOURCE = """
WITH d AS (
  SELECT source,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws
  FROM documents),
t AS (SELECT source,
             len(list_distinct(ws)) / CAST(len(ws) AS DOUBLE) AS ttr
      FROM d WHERE len(ws) > 0)
SELECT source, COUNT(*) AS n_docs, ROUND(AVG(ttr), 6) AS avg_ttr
FROM t GROUP BY 1 ORDER BY 1
"""


def q_session_conversion_rate(sf_dir: str) -> pd.DataFrame:
    """Within-session conversion: of sessions containing a view, how many
    also contain a purchase.  Per-user bucket does the gap segmentation and
    per-session flag ORs in one vectorized pass; only scalar partials leave
    the bucket."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_type"])

    def flags(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"])
        u = df["user_id"].to_numpy()
        us = df["ts"].astype("int64").to_numpy()
        new = np.r_[True, (u[1:] != u[:-1]) | (us[1:] - us[:-1] > 1_800_000_000)]
        sess = np.cumsum(new) - 1
        et = df["event_type"].to_numpy()
        g = pd.DataFrame({"sess": sess,
                          "v": (et == "view").astype(np.int64),
                          "p": (et == "purchase").astype(np.int64)}).groupby(
            "sess", as_index=False).agg(v=("v", "max"), p=("p", "max"))
        return pd.DataFrame({
            "n_sessions": [len(g)],
            "with_view": [int(g["v"].sum())],
            "converted": [int((g["v"] & g["p"]).sum())],
        })

    p = bucketed_group_reduce(ds, ["user_id"], flags).to_pandas()
    n, wv, cv = int(p["n_sessions"].sum()), int(p["with_view"].sum()), int(p["converted"].sum())
    out = pd.DataFrame({
        "n_sessions": [n], "with_view": [wv], "converted": [cv],
        "conversion_rate": [_rd(cv / wv, 6) if wv else np.nan],
    })
    return _i64(out, ["n_sessions", "with_view", "converted"])


SQL_SESSION_CONVERSION_RATE = """
WITH ordered AS (
  SELECT user_id, ts, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR EPOCH_US(ts) - EPOCH_US(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, event_type,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
), f AS (
  SELECT user_id, session_id,
         MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
  FROM sess GROUP BY 1, 2)
SELECT COUNT(*) AS n_sessions,
       CAST(SUM(v) AS BIGINT) AS with_view,
       CAST(SUM(v * p) AS BIGINT) AS converted,
       ROUND(SUM(v * p) / CAST(SUM(v) AS DOUBLE), 6) AS conversion_rate
FROM f
"""


def q_forecast_revenue_change(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q6 shape (forecast revenue change): one filtered scan —
    year + discount band + quantity cap — with every predicate pushed to
    the parquet read, then a scalar sum.  The simplest possible pipeline,
    kept as the pushdown-efficiency baseline."""
    lo = pa.scalar(datetime(1997, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(datetime(1998, 1, 1), pa.timestamp("us"))
    f = (
        (pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi)
        & (pads.field("l_discount") >= 0.05) & (pads.field("l_discount") <= 0.07)
        & (pads.field("l_quantity") < 24)
    )
    ds = _t(sf_dir, "lineitem", ["l_extendedprice", "l_discount"], filter=f)

    def part(t: pa.Table) -> pa.Table:
        rev = pc.sum(pc.multiply(t["l_extendedprice"], t["l_discount"])).as_py() or 0.0
        return pa.table({"r": [float(rev)], "n": [t.num_rows]})

    p = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    return _i64(pd.DataFrame({"revenue": [_rd(float(p["r"].sum()), 2)],
                              "n_rows": [int(p["n"].sum())]}), ["n_rows"])


SQL_FORECAST_REVENUE_CHANGE = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue, COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def q_scd2_history(sf_dir: str) -> pd.DataFrame:
    """CDC → SCD2 transform: the event stream becomes a slowly-changing-
    dimension-2 validity history — one row per (user, state) run with
    [valid_from, valid_to) bounds, valid_to = next change's timestamp
    (NULL-sentineled max for the open row).  Per-user ordered segmentation
    is one vectorized shift inside the user-keyed bucket — the standard
    LEAD() construction without a window engine."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def runs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        u = df["user_id"].to_numpy()
        us = df["ts"].astype("int64").to_numpy()
        et = df["event_type"].to_numpy()
        new = np.r_[True, (u[1:] != u[:-1]) | (et[1:] != et[:-1])]
        starts = np.nonzero(new)[0]
        ends = np.r_[starts[1:], len(u)]
        valid_from = us[starts]
        # valid_to: next run's start ts within the same user, else open (-1)
        nxt = np.full(len(starts), -1, dtype=np.int64)
        same_user = u[starts[1:]] == u[starts[:-1]]
        nxt[:-1][same_user] = valid_from[1:][same_user]
        return pd.DataFrame({
            "user_id": u[starts], "state": et[starts],
            "valid_from_us": valid_from, "valid_to_us": nxt,
            "n_events": ends - starts,
        })

    out = bucketed_group_reduce(ds, ["user_id"], runs).to_pandas()
    return _i64(out.sort_values(["user_id", "valid_from_us"], ignore_index=True),
                ["user_id", "valid_from_us", "valid_to_us", "n_events"])


SQL_SCD2_HISTORY = """
WITH o AS (
  SELECT user_id, event_type, EPOCH_US(ts) AS us,
         CASE WHEN lag(event_type) OVER w IS NULL
                   OR lag(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS chg
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), r AS (
  SELECT user_id, event_type, us,
         SUM(chg) OVER (PARTITION BY user_id ORDER BY us
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM o
), runs AS (
  SELECT user_id, MIN(event_type) AS state, MIN(us) AS valid_from_us,
         COUNT(*) AS n_events
  FROM r GROUP BY user_id, run_id)
SELECT user_id, state, valid_from_us,
       COALESCE(LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY valid_from_us),
                -1) AS valid_to_us,
       n_events
FROM runs ORDER BY user_id, valid_from_us
"""


def q_tail_expected_shortfall(sf_dir: str) -> pd.DataFrame:
    """Tail risk per group: p99 (discrete) plus expected shortfall — the
    mean of all values AT OR ABOVE p99 — both read off the same one-pass
    cent histogram with integer arithmetic (the SQL oracle needs a second
    scan for the conditional mean)."""
    from ...functions.sketch import grouped_histogram_fixedpoint, quantile_disc_from_counts

    hist = grouped_histogram_fixedpoint(
        _t(sf_dir, "events", ["event_type", "value"]), "event_type", "value", scale=100
    )
    rows = []
    for etype, g in hist.groupby("event_type", sort=True):
        mask = pd.notna(g["bin"])
        b = g["bin"].to_numpy()[mask].astype(np.int64)
        c = g["n"].to_numpy()[mask].astype(np.int64)
        order = np.argsort(b)
        b, c = b[order], c[order]
        p99 = quantile_disc_from_counts(b, c, 0.99)
        tail = b >= p99
        es = float((b[tail] * c[tail]).sum()) / int(c[tail].sum())
        rows.append((etype, _rd(p99 / 100.0, 2), _rd(es / 100.0, 6), int(c[tail].sum())))
    out = pd.DataFrame(rows, columns=["event_type", "p99", "expected_shortfall", "n_tail"])
    return _i64(out, ["n_tail"])


SQL_TAIL_EXPECTED_SHORTFALL = """
WITH q AS (
  SELECT event_type,
         CAST(ROUND(quantile_disc(value, 0.99) * 100) AS BIGINT) AS p99c
  FROM events GROUP BY 1)
SELECT e.event_type,
       ROUND(p99c / 100.0, 2) AS p99,
       ROUND(SUM(CAST(ROUND(value * 100) AS BIGINT))
             FILTER (CAST(ROUND(value * 100) AS BIGINT) >= p99c)
             / CAST(COUNT(*) FILTER (CAST(ROUND(value * 100) AS BIGINT) >= p99c) AS DOUBLE)
             / 100.0, 6) AS expected_shortfall,
       COUNT(*) FILTER (CAST(ROUND(value * 100) AS BIGINT) >= p99c) AS n_tail
FROM events e JOIN q USING (event_type)
GROUP BY e.event_type, p99c ORDER BY 1
"""


def q_returned_item_customers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q10 shape (returned-item reporting): revenue lost to returns
    per customer over one year, top-20 with nation names.  Returned
    lineitems pre-aggregate per order BEFORE the join chain; orders carry
    the date filter at the read; the customer→nation dimension attaches by
    broadcast."""
    from ...functions.relational import auto_join

    lo = pa.scalar(datetime(1997, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(datetime(1998, 1, 1), pa.timestamp("us"))
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"],
            filter=pads.field("l_returnflag") == "R")

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"o_orderkey": t["l_orderkey"], "r": r})

    per_order = grouped_sums(
        li.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True),
        ["o_orderkey"], {"rev": "r"},
    )
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"],
                filter=(pads.field("o_orderdate") >= lo) & (pads.field("o_orderdate") < hi))
    j = auto_join(per_order, orders, on="o_orderkey")
    per_cust = grouped_sums(j, ["o_custkey"], {"revenue": "rev"})
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    cust = broadcast_join(
        _t(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"]),
        nat.rename_columns(["c_nationkey", "n_name"]),
        "c_nationkey",
    ).select_columns(["c_custkey", "c_name", "n_name"])
    out = topk(auto_join(per_cust, cust, on="o_custkey", right_on="c_custkey"),
               ["revenue", "o_custkey"], [True, False], 20).to_pandas()
    out = out.rename(columns={"o_custkey": "c_custkey", "n_name": "nation"})
    out["revenue"] = out["revenue"].pipe(_rd, 2)
    return _i64(out[["c_custkey", "c_name", "nation", "revenue"]], ["c_custkey"])


SQL_RETURNED_ITEM_CUSTOMERS = """
SELECT c.c_custkey, c.c_name, n.n_name AS nation,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01' AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
ORDER BY SUM(l.l_extendedprice * (1 - l.l_discount)) DESC, c_custkey
LIMIT 20
"""


def q_new_vs_returning_revenue(sf_dir: str) -> pd.DataFrame:
    """Monthly revenue split into NEW customers (ordering in their
    first-ever month) vs RETURNING — the standard growth-accounting report.
    Two-level dependency done with one custkey co-group: per-batch
    (custkey, month, rev) partials union with nothing — the same exchange
    that computes each customer's first month also splits that customer's
    month rows, so no join and no broadcast of a customer-sized table."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])

    def part(t: pa.Table) -> pa.Table:
        micros = pc.cast(t["o_orderdate"], pa.int64()).to_numpy(zero_copy_only=False)
        # calendar month id: days→approximate months need real calendars —
        # use year*12+month from the timestamp instead
        dt = pd.to_datetime(micros, unit="us")
        month = (dt.year.to_numpy() * 12 + (dt.month.to_numpy() - 1)).astype(np.int64)
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0), ndigits=0, round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"o_custkey": t["o_custkey"].to_numpy(zero_copy_only=False),
                           "month_id": month, "rev_c": cents})
        g = df.groupby(["o_custkey", "month_id"], as_index=False)["rev_c"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def split(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["o_custkey", "month_id"], as_index=False)["rev_c"].sum()
        first = g.groupby("o_custkey")["month_id"].transform("min")
        g["is_new"] = g["month_id"] == first
        out = g.groupby(["month_id", "is_new"], as_index=False)["rev_c"].sum()
        return out

    parts = bucketed_group_reduce(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["o_custkey"], split,
    ).to_pandas()
    agg = parts.groupby(["month_id", "is_new"], as_index=False)["rev_c"].sum()
    wide = agg.pivot_table(index="month_id", columns="is_new", values="rev_c",
                           fill_value=0, aggfunc="sum").reset_index()
    wide = wide.rename(columns={True: "new_c", False: "returning_c"})
    for c in ("new_c", "returning_c"):
        if c not in wide:
            wide[c] = 0
    out = pd.DataFrame({
        "month_id": wide["month_id"],
        "revenue_new": (wide["new_c"] / 100.0).pipe(_rd, 2),
        "revenue_returning": (wide["returning_c"] / 100.0).pipe(_rd, 2),
    }).sort_values("month_id", ignore_index=True)
    return _i64(out, ["month_id"])


SQL_NEW_VS_RETURNING_REVENUE = """
WITH o AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS month_id,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS rev_c
  FROM orders),
f AS (SELECT *, MIN(month_id) OVER (PARTITION BY o_custkey) AS first_month FROM o)
SELECT month_id,
       ROUND(SUM(CASE WHEN month_id = first_month THEN rev_c ELSE 0 END) / 100.0, 2)
         AS revenue_new,
       ROUND(SUM(CASE WHEN month_id > first_month THEN rev_c ELSE 0 END) / 100.0, 2)
         AS revenue_returning
FROM f GROUP BY 1 ORDER BY 1
"""


def q_fulfillment_latency_hist(sf_dir: str) -> pd.DataFrame:
    """Order→first-shipment latency distribution in whole days: per-order
    MIN shipdate partials co-grouped with the order header on the orderkey
    (one exchange), vectorized day diff, tiny day-level count."""
    from ...functions.relational import bucketed_group_reduce

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def li_part(t: pa.Table) -> pa.Table:
        g = pa.table({"o_orderkey": t["l_orderkey"],
                      "ship_us": pc.cast(t["l_shipdate"], pa.int64())}).group_by(
            ["o_orderkey"]).aggregate([("ship_us", "min")])
        return pa.table({"o_orderkey": g["o_orderkey"], "ship_us": g["ship_us_min"],
                         "order_us": pa.nulls(g.num_rows, pa.int64())})

    def o_part(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "ship_us": pa.nulls(t.num_rows, pa.int64()),
                         "order_us": pc.cast(t["o_orderdate"], pa.int64())})

    u = li.map_batches(li_part, batch_format="pyarrow", zero_copy_batch=True).union(
        orders.map_batches(o_part, batch_format="pyarrow", zero_copy_batch=True))

    def diff(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_orderkey", as_index=False).agg(
            ship_us=("ship_us", "min"), order_us=("order_us", "min"))
        g = g.dropna(subset=["ship_us", "order_us"])
        days = ((g["ship_us"] - g["order_us"]) // 86_400_000_000).astype(np.int64)
        return pd.DataFrame({"latency_days": days}).groupby(
            "latency_days", as_index=False).size().rename(columns={"size": "n"})

    parts = bucketed_group_reduce(u, ["o_orderkey"], diff).to_pandas()
    out = parts.groupby("latency_days", as_index=False)["n"].sum().sort_values(
        "latency_days", ignore_index=True)
    return _i64(out, ["latency_days", "n"])


SQL_FULFILLMENT_LATENCY_HIST = """
WITH s AS (
  SELECT l_orderkey, MIN(EPOCH_US(l_shipdate)) AS ship_us
  FROM lineitem GROUP BY 1)
SELECT (s.ship_us - EPOCH_US(o.o_orderdate)) // 86400000000 AS latency_days,
       COUNT(*) AS n
FROM orders o JOIN s ON o.o_orderkey = s.l_orderkey
GROUP BY 1 ORDER BY 1
"""


def q_basket_lift(sf_dir: str) -> pd.DataFrame:
    """Association rules over the co-purchase pairs: support, confidence
    and lift for the top-20 pairs by joint support.  Joint counts come from
    the per-order pair combiner reduce; single-item order-frequencies from
    a distinct (order, part) reduce; only the 20 winning pairs' item
    counts are looked up driver-side (40 keys).  Joint pair counts come
    from the shared once-per-sf-dir edge artifact (graph_edges.py)."""
    from .graph_edges import copurchase_edges_ds

    ds = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    pairs = copurchase_edges_ds(sf_dir).rename_columns({"c": "n"})
    top = topk(pairs, ["n", "part_a", "part_b"], [True, False, False], 20).to_pandas()

    def item_part(t: pa.Table) -> pa.Table:
        g = pa.table({"part": t["l_partkey"], "o": t["l_orderkey"]}).group_by(
            ["part", "o"]).aggregate([])
        return g

    # two-level distinct: the per-batch (part, order) dedup is only a
    # combiner — an order's lines span batches, so a GLOBAL (part, order)
    # reduce must run before counting orders per part
    po = grouped_sums(
        ds.map_batches(item_part, batch_format="pyarrow", zero_copy_batch=True),
        ["part", "o"], {}, "c",
    )
    item = grouped_sums(po.select_columns(["part"]), ["part"], {}, "cnt")
    want = set(top["part_a"]) | set(top["part_b"])
    from ...functions.relational import semi_join_broadcast

    counts = semi_join_broadcast(item, sorted(want), "part").to_pandas()
    cnt = dict(zip(counts["part"], counts["cnt"]))
    n_orders = int(grouped_sums(
        ds.select_columns(["l_orderkey"]), ["l_orderkey"], {}, "c").count())
    top["confidence"] = (top["n"] / top["part_a"].map(cnt)).pipe(_rd)
    top["lift"] = (top["n"] * n_orders /
                   (top["part_a"].map(cnt) * top["part_b"].map(cnt))).pipe(_rd)
    return _i64(top[["part_a", "part_b", "n", "confidence", "lift"]],
                ["part_a", "part_b", "n"])


SQL_BASKET_LIFT = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
no AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM lineitem),
ic AS (SELECT l_partkey, COUNT(*) AS cnt FROM d GROUP BY 1),
p AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n
  FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  ORDER BY n DESC, part_a, part_b LIMIT 20)
SELECT p.part_a, p.part_b, p.n,
       ROUND(p.n / CAST(ia.cnt AS DOUBLE), 6) AS confidence,
       ROUND(p.n * no.n_orders / (CAST(ia.cnt AS DOUBLE) * ib.cnt), 6) AS lift
FROM p JOIN ic ia ON p.part_a = ia.l_partkey
       JOIN ic ib ON p.part_b = ib.l_partkey
       CROSS JOIN no
ORDER BY n DESC, part_a, part_b
"""


def q_user_survival_curve(sf_dir: str) -> pd.DataFrame:
    """Retention/survival curve: fraction of users whose activity span
    (last − first event, whole days) reaches at least k days, for
    k = 0..30.  One per-user extremes reduce → a |days|-bounded span
    histogram → reverse cumulative sum on the driver."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def part(t: pa.Table) -> pa.Table:
        g = pa.table({"user_id": t["user_id"],
                      "us": pc.cast(t["ts"], pa.int64())}).group_by(["user_id"]).aggregate(
            [("us", "min"), ("us", "max")])
        return pa.table({"user_id": g["user_id"], "lo": g["us_min"], "hi": g["us_max"]})

    spans = bucketed_group_reduce(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"],
        lambda df: df.groupby("user_id", as_index=False).agg(lo=("lo", "min"), hi=("hi", "max")),
    )

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        days = ((df["hi"] - df["lo"]) // 86_400_000_000).astype(np.int64)
        return pd.DataFrame({"span_days": days}).groupby(
            "span_days", as_index=False).size().rename(columns={"size": "n"})

    h = spans.map_batches(hist, batch_format="pandas").to_pandas()
    h = h.groupby("span_days", as_index=False)["n"].sum()
    total = int(h["n"].sum())
    ks = np.arange(0, 31, dtype=np.int64)
    alive = np.array([int(h.loc[h["span_days"] >= k, "n"].sum()) for k in ks])
    out = pd.DataFrame({"k_days": ks, "n_surviving": alive,
                        "survival": _rd(alive / total)})
    return _i64(out, ["k_days", "n_surviving"])


SQL_USER_SURVIVAL_CURVE = """
WITH u AS (
  SELECT user_id,
         (MAX(EPOCH_US(ts)) - MIN(EPOCH_US(ts))) // 86400000000 AS span_days
  FROM events GROUP BY 1),
tot AS (SELECT COUNT(*) AS n FROM u),
k AS (SELECT UNNEST(range(0, 31)) AS k_days)
SELECT k.k_days,
       COUNT(u.user_id) AS n_surviving,
       ROUND(COUNT(u.user_id) / CAST(MAX(tot.n) AS DOUBLE), 6) AS survival
FROM k CROSS JOIN tot LEFT JOIN u ON u.span_days >= k.k_days
GROUP BY 1 ORDER BY 1
"""


def q_lineitem_corr_matrix(sf_dir: str) -> pd.DataFrame:
    """Numeric-profile correlation matrix over (quantity, extendedprice,
    discount, tax): every pairwise Pearson r from ONE streaming moments
    pass — each batch emits (n, Σx per col, ΣxᵀX cross-products), a handful
    of doubles; the driver closes the covariance form.  The SQL oracle
    calls corr() once per pair (six scans' worth of aggregates)."""
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ds = _t(sf_dir, "lineitem", cols)

    def part(t: pa.Table) -> pa.Table:
        X = np.column_stack([t[c].to_numpy(zero_copy_only=False) for c in cols])
        g = X.T @ X
        return pa.table({
            "n": pa.array([len(X)], pa.int64()),
            "s": pa.array([X.sum(axis=0).tolist()], pa.list_(pa.float64())),
            "g": pa.array([g.ravel().tolist()], pa.list_(pa.float64())),
        })

    p = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    n = int(p["n"].sum())
    s = np.sum([np.asarray(x) for x in p["s"]], axis=0)
    G = np.sum([np.asarray(x) for x in p["g"]], axis=0).reshape(len(cols), len(cols))
    cov = (G - np.outer(s, s) / n) / (n - 1)
    sd = np.sqrt(np.diag(cov))
    corr = cov / np.outer(sd, sd)
    rows = []
    for i, a in enumerate(cols):
        for j, b in enumerate(cols):
            if i < j:
                rows.append((a, b, _rd(float(corr[i, j]), 6)))
    return pd.DataFrame(rows, columns=["col_a", "col_b", "corr"])


SQL_LINEITEM_CORR_MATRIX = """
SELECT * FROM (
  SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
         ROUND(corr(l_quantity, l_extendedprice), 6) AS corr FROM lineitem
  UNION ALL SELECT 'l_quantity', 'l_discount', ROUND(corr(l_quantity, l_discount), 6) FROM lineitem
  UNION ALL SELECT 'l_quantity', 'l_tax', ROUND(corr(l_quantity, l_tax), 6) FROM lineitem
  UNION ALL SELECT 'l_extendedprice', 'l_discount', ROUND(corr(l_extendedprice, l_discount), 6) FROM lineitem
  UNION ALL SELECT 'l_extendedprice', 'l_tax', ROUND(corr(l_extendedprice, l_tax), 6) FROM lineitem
  UNION ALL SELECT 'l_discount', 'l_tax', ROUND(corr(l_discount, l_tax), 6) FROM lineitem
) ORDER BY col_a, col_b
"""


def q_journey_patterns(sf_dir: str) -> pd.DataFrame:
    """Top user-journey prefixes: each user's first five event types joined
    into a path string, counted across users, top-10.  The path assembly is
    one vectorized take inside the user bucket; the pattern count is a
    grouped reduce over short strings."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def paths(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        g = df.groupby("user_id", sort=False)["event_type"]
        p = g.apply(lambda s: ">".join(s.iloc[:5]))
        out = pd.DataFrame({"path": p.to_numpy()})
        return out.groupby("path", as_index=False).size().rename(columns={"size": "n"})

    counts = grouped_sums(
        bucketed_group_reduce(ds, ["user_id"], paths), ["path"], {"n": "n"}
    )
    out = topk(counts, ["n", "path"], [True, False], 10).to_pandas()
    return _i64(out, ["n"])


SQL_JOURNEY_PATTERNS = """
WITH r AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events),
p AS (
  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
  FROM r WHERE rn <= 5 GROUP BY 1)
SELECT path, COUNT(*) AS n FROM p GROUP BY 1
ORDER BY n DESC, path LIMIT 10
"""


def q_k_anonymity_audit(sf_dir: str) -> pd.DataFrame:
    """k-anonymity audit over quasi-identifiers (market segment × nation):
    how many equivalence classes fall below k=5 members and how many
    customers sit in them — the privacy pre-release gate.  One bounded
    grouped count; only class-level rows reduce."""
    K = 5
    counts = grouped_sums(
        _t(sf_dir, "customer", ["c_mktsegment", "c_nationkey"]),
        ["c_mktsegment", "c_nationkey"], {}, "n",
    ).to_pandas()
    risky = counts[counts["n"] < K]
    out = pd.DataFrame({
        "n_classes": pd.Series([len(counts)], dtype="int64"),
        "n_risky_classes": pd.Series([len(risky)], dtype="int64"),
        "n_risky_customers": pd.Series([int(risky["n"].sum())], dtype="int64"),
        "min_class_size": pd.Series([int(counts["n"].min())], dtype="int64"),
    })
    return out


SQL_K_ANONYMITY_AUDIT = """
WITH c AS (
  SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
  FROM customer GROUP BY 1, 2)
SELECT COUNT(*) AS n_classes,
       COUNT(*) FILTER (n < 5) AS n_risky_classes,
       CAST(COALESCE(SUM(n) FILTER (n < 5), 0) AS BIGINT) AS n_risky_customers,
       MIN(n) AS min_class_size
FROM c
"""


def q_boilerplate_sentences(sf_dir: str) -> pd.DataFrame:
    """Boilerplate detection: sentences (period-split, trimmed, non-empty)
    repeated across the corpus, top-10 by occurrence count — the curation
    step that strips licence headers / navigation chrome.  One vectorized
    split+flatten per batch, one grouped count over sentence strings."""
    docs = _t(sf_dir, "documents", ["text"])

    def sents(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["text"], ".")
        parts = parts.combine_chunks() if isinstance(parts, pa.ChunkedArray) else parts
        flat = pc.utf8_trim_whitespace(parts.flatten())
        return pa.table({"sentence": flat.filter(pc.not_equal(flat, ""))})

    counts = grouped_sums(
        docs.map_batches(sents, batch_format="pyarrow", zero_copy_batch=True),
        ["sentence"], {}, "n",
    )
    out = topk(counts, ["n", "sentence"], [True, False], 10).to_pandas()
    return _i64(out, ["n"])


SQL_BOILERPLATE_SENTENCES = """
WITH s AS (
  SELECT trim(UNNEST(string_split(text, '.'))) AS sentence FROM documents)
SELECT sentence, COUNT(*) AS n
FROM s WHERE sentence <> ''
GROUP BY 1 ORDER BY n DESC, sentence LIMIT 10
"""


def q_hapax_docs_per_source(sf_dir: str) -> pd.DataFrame:
    """Rarity flagging: documents containing at least one HAPAX trigram
    shingle (corpus frequency 1), counted per source — the memorization-
    risk probe (word-level hapaxes don't exist in this closed-vocabulary
    corpus; trigram shingles do).  The hapax set is shingle-space-sized —
    far too big to broadcast — so the shingle stream co-groups with its own
    frequency reduce on the shingle key (join-back-to-aggregate over
    text); the source rides inside the packed doc id so the final distinct
    + per-source count stays distributed end to end."""
    from ...functions.relational import bucketed_group_reduce
    from ...functions.search import TOKEN_SPLIT

    docs = _t(sf_dir, "documents", ["doc_id", "source", "text"])

    def shingles(t: pa.Table) -> pa.Table:
        pid_col = pc.binary_join_element_wise(
            pc.cast(t["doc_id"], pa.string()), t["source"], "|")
        words = pc.split_pattern_regex(pc.utf8_lower(t["text"]), TOKEN_SPLIT)
        words = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        parents = pc.list_parent_indices(words)
        flat = words.flatten()
        mask = pc.not_equal(flat, "")
        w = flat.filter(mask)
        p = parents.filter(mask).to_numpy(zero_copy_only=False)
        idx = (np.nonzero((p[:-2] == p[1:-1]) & (p[1:-1] == p[2:]))[0]
               if len(p) >= 3 else np.empty(0, np.int64))
        g = pc.binary_join_element_wise(
            w.take(pa.array(idx)), w.take(pa.array(idx + 1)), w.take(pa.array(idx + 2)), " ")
        flatt = pa.table({"pid": pc.take(pid_col, pa.array(p[idx] if len(idx) else idx)),
                          "term": g})
        agg = flatt.group_by(["pid", "term"]).aggregate([([], "count_all")])
        return pa.table({"pid": agg["pid"], "term": agg["term"],
                         "tf": pc.cast(agg["count_all"], pa.int64())})

    post = docs.map_batches(shingles, batch_format="pyarrow", zero_copy_batch=True)

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        tf = df.groupby("term")["tf"].transform("sum")
        return df[tf == 1][["pid"]].drop_duplicates()

    flagged = bucketed_group_reduce(post, ["term"], flag)
    # distinct flagged docs (a doc can hold hapaxes under many terms), then
    # one tiny grouped count on the unpacked source
    distinct = grouped_sums(flagged, ["pid"], {}, "c")

    def unpack(t: pa.Table) -> pa.Table:
        src = pc.list_element(pc.split_pattern(t["pid"], "|"), 1)
        return pa.table({"source": src})

    out = grouped_sums(
        distinct.map_batches(unpack, batch_format="pyarrow", zero_copy_batch=True),
        ["source"], {}, "n_hapax_docs", reduce="driver",
    ).to_pandas()
    return _i64(out.sort_values("source", ignore_index=True), ["n_hapax_docs"])


SQL_HAPAX_DOCS_PER_SOURCE = """
WITH d AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws
  FROM documents),
tg AS (
  SELECT doc_id, source, ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS term
  FROM d, UNNEST(range(1, greatest(len(ws) - 1, 1))) AS t(i)
  WHERE i + 2 <= len(ws)),
tf AS (SELECT term, COUNT(*) AS f FROM tg GROUP BY 1),
flagged AS (
  SELECT DISTINCT tg.doc_id, tg.source
  FROM tg JOIN tf USING (term) WHERE tf.f = 1)
SELECT source, COUNT(*) AS n_hapax_docs
FROM flagged GROUP BY 1 ORDER BY 1
"""


def q_anomaly_audit(sf_dir: str) -> pd.DataFrame:
    """Cross-table data-validation sweep: per table, scalar anomaly
    counters (negative amounts, nulls, timestamps beyond the corpus
    horizon) folded from per-batch partials — the pre-ingest contract
    check.  Every counter is a one-pass column scan."""
    horizon = pa.scalar(datetime(2002, 1, 1), pa.timestamp("us"))

    def audit(table: str, checks) -> tuple[str, int, int, int]:
        ds = _t(sf_dir, table, list({c for c, _ in checks}))

        def part(t: pa.Table) -> pa.Table:
            neg = nul = fut = 0
            for col, kind in checks:
                if kind == "neg":
                    neg += int(pc.sum(pc.cast(pc.less(t[col], 0.0), pa.int64())).as_py() or 0)
                    nul += t[col].null_count
                elif kind == "future":
                    fut += int(pc.sum(pc.cast(pc.greater(t[col], horizon), pa.int64())).as_py() or 0)
                    nul += t[col].null_count
            return pa.table({"neg": [neg], "nul": [nul], "fut": [fut]})

        p = ds.map_batches(part, batch_format="pyarrow").to_pandas()
        return table, int(p["neg"].sum()), int(p["nul"].sum()), int(p["fut"].sum())

    rows = [
        audit("events", [("value", "neg"), ("ts", "future")]),
        audit("orders", [("o_totalprice", "neg"), ("o_orderdate", "future")]),
        audit("lineitem", [("l_extendedprice", "neg"), ("l_shipdate", "future")]),
    ]
    out = pd.DataFrame(rows, columns=["tbl", "n_negative", "n_null", "n_future"])
    return _i64(out, ["n_negative", "n_null", "n_future"])


SQL_ANOMALY_AUDIT = """
SELECT 'events' AS tbl,
       COUNT(*) FILTER (value < 0) AS n_negative,
       (SELECT COUNT(*) FROM events WHERE value IS NULL)
         + (SELECT COUNT(*) FROM events WHERE ts IS NULL) AS n_null,
       COUNT(*) FILTER (ts > TIMESTAMP '2002-01-01') AS n_future
FROM events
UNION ALL
SELECT 'orders',
       COUNT(*) FILTER (o_totalprice < 0),
       (SELECT COUNT(*) FROM orders WHERE o_totalprice IS NULL)
         + (SELECT COUNT(*) FROM orders WHERE o_orderdate IS NULL),
       COUNT(*) FILTER (o_orderdate > TIMESTAMP '2002-01-01')
FROM orders
UNION ALL
SELECT 'lineitem',
       COUNT(*) FILTER (l_extendedprice < 0),
       (SELECT COUNT(*) FROM lineitem WHERE l_extendedprice IS NULL)
         + (SELECT COUNT(*) FROM lineitem WHERE l_shipdate IS NULL),
       COUNT(*) FILTER (l_shipdate > TIMESTAMP '2002-01-01')
FROM lineitem
"""


def q_quality_gate_sweep(sf_dir: str) -> pd.DataFrame:
    """Threshold-sensitivity sweep for the min-words quality gate: drop
    counts at five candidate thresholds from ONE streaming pass (vectorized
    multi-threshold counters per batch) — the tuning loop that would
    otherwise rescan the corpus per candidate."""
    from ...functions.scrub import normalize_text
    from ...functions.text import n_words

    THRESHOLDS = [3, 5, 8, 13, 21]
    src = ensure_curation_parquet(sf_dir)
    ds = rd.read_parquet(src, columns=["text"])

    def part(t: pa.Table) -> pa.Table:
        nw = pc.cast(n_words(normalize_text(t["text"])), pa.int64()).to_numpy(
            zero_copy_only=False)
        drops = [int((nw < k).sum()) for k in THRESHOLDS]
        return pa.table({"min_words": pa.array(THRESHOLDS, pa.int64()),
                         "n_dropped": pa.array(drops, pa.int64()),
                         "n_total": pa.array([len(nw)] * len(THRESHOLDS), pa.int64())})

    p = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = p.groupby("min_words", as_index=False).sum()
    out["drop_rate"] = (out["n_dropped"] / out["n_total"]).pipe(_rd)
    return _i64(out, ["min_words", "n_dropped", "n_total"])


SQL_QUALITY_GATE_SWEEP = f"""
WITH q AS (
  SELECT len(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS nw
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/curation.parquet')),
k AS (SELECT UNNEST([3, 5, 8, 13, 21]) AS min_words)
SELECT k.min_words,
       COUNT(*) FILTER (q.nw < k.min_words) AS n_dropped,
       COUNT(*) AS n_total,
       ROUND(COUNT(*) FILTER (q.nw < k.min_words) / CAST(COUNT(*) AS DOUBLE), 6) AS drop_rate
FROM k CROSS JOIN q
GROUP BY 1 ORDER BY 1
"""


def q_wau_retention(sf_dir: str) -> pd.DataFrame:
    """Week-over-week retention: of users active in week w, how many are
    also active in w+1.  Distinct (user, week) pairs reduce once; a
    per-user co-group turns each user's sorted week set into
    (week, retained-next-week) flags with one vectorized diff; the final
    week-level aggregate is tiny."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def part(t: pa.Table) -> pa.Table:
        w = pc.divide(pc.cast(t["ts"], pa.int64()),
                      pa.scalar(604_800_000_000, pa.int64()))
        return pa.table({"user_id": t["user_id"], "week_id": w}).group_by(
            ["user_id", "week_id"]).aggregate([])

    pairs = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)

    def flags(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates().sort_values(["user_id", "week_id"])
        u = df["user_id"].to_numpy()
        w = df["week_id"].to_numpy(dtype=np.int64)
        nxt = np.r_[(u[1:] == u[:-1]) & (w[1:] == w[:-1] + 1), False]
        g = pd.DataFrame({"week_id": w, "retained": nxt.astype(np.int64)})
        return g.groupby("week_id", as_index=False).agg(
            active=("retained", "size"), retained=("retained", "sum"))

    parts = bucketed_group_reduce(pairs, ["user_id"], flags).to_pandas()
    out = parts.groupby("week_id", as_index=False).agg(
        active=("active", "sum"), retained=("retained", "sum"))
    out["retention"] = (out["retained"] / out["active"]).pipe(_rd)
    return _i64(out.sort_values("week_id", ignore_index=True),
                ["week_id", "active", "retained"])


SQL_WAU_RETENTION = """
WITH p AS (
  SELECT DISTINCT user_id, EPOCH_US(ts) // 604800000000 AS week_id FROM events)
SELECT a.week_id,
       COUNT(*) AS active,
       COUNT(b.user_id) AS retained,
       ROUND(COUNT(b.user_id) / CAST(COUNT(*) AS DOUBLE), 6) AS retention
FROM p a LEFT JOIN p b ON a.user_id = b.user_id AND b.week_id = a.week_id + 1
GROUP BY 1 ORDER BY 1
"""


def q_heaps_law_fit(sf_dir: str) -> pd.DataFrame:
    """Heaps'-law fit across sources (V ≈ K·Nᵝ): per source, total tokens
    N from one scan-side count and vocabulary size V from a distinct
    (source, term) reduce; β is the log-log OLS slope over the 20 source
    points — the vocabulary-growth health check that complements the Zipf
    exponent."""
    from ...functions.search import tokenize_terms

    docs = _t(sf_dir, "documents", ["source", "text"])
    pairs = docs.map_batches(
        lambda t: tokenize_terms(t, "text", "source"),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    # N per source: sum of tf over the (source, term) partials; V per
    # source: distinct terms — both from the same materialized postings
    n_tok = grouped_sums(pairs, ["source"], {"n": "tf"}).to_pandas()
    vocab = grouped_sums(
        grouped_sums(pairs, ["source", "term"], {}, "c").select_columns(["source"]),
        ["source"], {}, "v",
    ).to_pandas()
    m = n_tok.merge(vocab, on="source").sort_values("source", ignore_index=True)
    x = np.log(m["n"].to_numpy(dtype=np.float64))
    y = np.log(m["v"].to_numpy(dtype=np.float64))
    xc, yc = x - x.mean(), y - y.mean()
    beta = float((xc * yc).sum() / (xc * xc).sum())
    return pd.DataFrame({"n_sources": pd.Series([len(m)], dtype="int64"),
                         "heaps_beta": [_rd(beta, 6)]})


SQL_HEAPS_LAW_FIT = """
WITH toks AS (
  SELECT source, UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents),
t AS (SELECT * FROM toks WHERE term <> ''),
s AS (SELECT source, COUNT(*) AS n, COUNT(DISTINCT term) AS v FROM t GROUP BY 1)
SELECT COUNT(*) AS n_sources, ROUND(regr_slope(ln(v), ln(n)), 6) AS heaps_beta FROM s
"""


def q_top_parts_per_segment(sf_dir: str) -> pd.DataFrame:
    """Popularity baseline per market segment: top-3 parts by distinct
    order count within each segment — grouped top-k AFTER a join chain.
    The fact collapses to (custkey→segment via broadcast dim, partkey)
    distinct-order partials before any ranking; the per-segment prune is
    the grouped-top-k operator (per-block prune, exact)."""
    from ...functions.relational import auto_join, grouped_topk

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    # (order, part) distinct → attach custkey → attach segment
    op = grouped_sums(
        li.map_batches(
            lambda t: pa.table({"o_orderkey": t["l_orderkey"], "part": t["l_partkey"]}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["o_orderkey", "part"], {}, "c",
    )
    j = auto_join(op, orders, on="o_orderkey")
    j = auto_join(j, cust.map_batches(
        lambda t: pa.table({"o_custkey": t["c_custkey"], "segment": t["c_mktsegment"]}),
        batch_format="pyarrow", zero_copy_batch=True), on="o_custkey")
    per_seg_part = grouped_sums(j, ["segment", "part"], {}, "n_orders")
    out = grouped_topk(
        per_seg_part, ["segment"], ["n_orders", "part"], [True, False], 3
    ).to_pandas().sort_values(["segment", "n_orders", "part"],
                              ascending=[True, False, True], ignore_index=True)
    return _i64(out, ["part", "n_orders"])


SQL_TOP_PARTS_PER_SEGMENT = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
j AS (
  SELECT c.c_mktsegment AS segment, op.l_partkey AS part, COUNT(*) AS n_orders
  FROM op JOIN orders o ON op.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY segment ORDER BY n_orders DESC, part) AS rn
  FROM j)
SELECT segment, part, n_orders FROM r WHERE rn <= 3
ORDER BY segment, n_orders DESC, part
"""


def q_cohort_ltv(sf_dir: str) -> pd.DataFrame:
    """Cohort lifetime value: average cumulative revenue per customer by
    months-since-first-order, per acquisition-month cohort (first four
    cohorts × ages 0-3).  One custkey co-group assigns each order its
    cohort and age; cents-integer revenue keeps the cumulative sums
    bit-stable; the cumulative step runs on the (cohorts × ages)-bounded
    grid on the driver."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])

    def part(t: pa.Table) -> pa.Table:
        micros = pc.cast(t["o_orderdate"], pa.int64()).to_numpy(zero_copy_only=False)
        dt = pd.to_datetime(micros, unit="us")
        month = (dt.year.to_numpy() * 12 + (dt.month.to_numpy() - 1)).astype(np.int64)
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0), ndigits=0, round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"o_custkey": t["o_custkey"].to_numpy(zero_copy_only=False),
                           "month_id": month, "rev_c": cents})
        return pa.Table.from_pandas(
            df.groupby(["o_custkey", "month_id"], as_index=False)["rev_c"].sum(),
            preserve_index=False)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["o_custkey", "month_id"], as_index=False)["rev_c"].sum()
        first = g.groupby("o_custkey")["month_id"].transform("min")
        g["cohort"] = first
        g["age"] = g["month_id"] - first
        out = g.groupby(["cohort", "age"], as_index=False).agg(rev_c=("rev_c", "sum"))
        sizes = g[g["age"] == 0].groupby("cohort", as_index=False).agg(
            n_cust=("o_custkey", "nunique"))
        return out.merge(sizes, on="cohort")

    parts = bucketed_group_reduce(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["o_custkey"], assign,
    ).to_pandas()
    agg = parts.groupby(["cohort", "age"], as_index=False).agg(
        rev_c=("rev_c", "sum"), n_cust=("n_cust", "sum"))
    cohorts = sorted(agg["cohort"].unique())[:4]
    rows = []
    for c in cohorts:
        g = agg[agg["cohort"] == c].sort_values("age")
        n = int(g.loc[g["age"] == 0, "n_cust"].iloc[0])
        cum = 0
        by_age = dict(zip(g["age"], g["rev_c"]))
        for a in range(4):
            cum += int(by_age.get(a, 0))
            rows.append((int(c), a, _rd(cum / n / 100.0, 6)))
    out = pd.DataFrame(rows, columns=["cohort", "age", "avg_cum_revenue"])
    return _i64(out, ["cohort", "age"])


SQL_COHORT_LTV = """
WITH o AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS month_id,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS rev_c
  FROM orders),
f AS (SELECT *, MIN(month_id) OVER (PARTITION BY o_custkey) AS cohort FROM o),
cs AS (SELECT cohort, COUNT(DISTINCT o_custkey) AS n_cust FROM f GROUP BY 1),
co AS (SELECT cohort FROM cs ORDER BY cohort LIMIT 4),
ages AS (SELECT UNNEST(range(0, 4)) AS age),
rev AS (
  SELECT cohort, month_id - cohort AS age, SUM(rev_c) AS rev_c
  FROM f GROUP BY 1, 2)
SELECT co.cohort, ages.age,
       ROUND(COALESCE(SUM(r.rev_c), 0) / CAST(MAX(cs.n_cust) AS DOUBLE) / 100.0, 6)
         AS avg_cum_revenue
FROM co CROSS JOIN ages
JOIN cs ON cs.cohort = co.cohort
LEFT JOIN rev r ON r.cohort = co.cohort AND r.age <= ages.age
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_mixture_schedule(sf_dir: str) -> pd.DataFrame:
    """Deterministic weighted-interleave mixture schedule — the order a
    training run would draw documents so each source appears proportionally
    to its weight (weighted round-robin: doc k of source s is scheduled at
    key k/wₛ).  Within-source ranks come from ONE global_row_number pass on
    the packed key source·2⁴⁸ + doc_id (contiguous spans per source, rank −
    span offset = within-source rank, same construction as RFM); the first
    50 schedule slots come back through a distributed top-k."""
    from ...functions.rank import global_row_number

    docs = _t(sf_dir, "documents", ["doc_id", "source"])
    # deterministic per-source weights (1, 2 or 3), mirrored in SQL
    sizes = grouped_sums(docs.select_columns(["source"]), ["source"], {}, "n").to_pandas()
    sizes = sizes.sort_values("source", ignore_index=True)
    srcs = list(sizes["source"])
    idx_of = {s: i for i, s in enumerate(srcs)}
    weight = {s: 1.0 + (int(s[3:]) % 3) for s in srcs}  # src<N> → 1 + N%3
    offsets = {}
    off = 0
    for s, n in zip(sizes["source"], sizes["n"]):
        offsets[s] = off
        off += int(n)

    C = 1 << 48

    def pack(t: pa.Table, *, idx=idx_of) -> pa.Table:
        si = t["source"].to_pandas().map(idx).to_numpy(dtype=np.int64)
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": t["doc_id"], "source": t["source"],
                         "packed": pa.array(si * C + did)})

    ranked, _ = global_row_number(
        docs.map_batches(pack, batch_format="pyarrow", zero_copy_batch=True),
        "packed", ["doc_id"])

    def key(t: pa.Table, *, offs=offsets, w=weight) -> pa.Table:
        src = t["source"].to_pandas()
        rn = t["rn"].to_numpy(zero_copy_only=False) - src.map(offs).to_numpy(dtype=np.int64)
        k = rn / src.map(w).to_numpy(dtype=np.float64)
        return pa.table({"source": t["source"], "doc_id": t["doc_id"],
                         "k": pa.array(_rd(k, 9))})

    keyed = ranked.map_batches(key, batch_format="pyarrow", zero_copy_batch=True)
    head = topk(keyed, ["k", "source", "doc_id"], [False, False, False], 50).to_pandas()
    head = head.sort_values(["k", "source", "doc_id"], ignore_index=True)
    head["position"] = np.arange(1, len(head) + 1, dtype=np.int64)
    return _i64(head[["position", "source", "doc_id", "k"]], ["position", "doc_id"])


SQL_MIXTURE_SCHEDULE = """
WITH r AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents),
k AS (
  SELECT source, doc_id,
         ROUND(rn / (1.0 + CAST(substr(source, 4) AS BIGINT) % 3), 9) AS k
  FROM r),
top AS (SELECT * FROM k ORDER BY k, source, doc_id LIMIT 50)
SELECT ROW_NUMBER() OVER (ORDER BY k, source, doc_id) AS position,
       source, doc_id, k
FROM top ORDER BY position
"""


def q_order_price_ohlc(sf_dir: str) -> pd.DataFrame:
    """Monthly OHLC of order prices (open = earliest order's price, close =
    latest, high/low = extremes) — the mergeable ARGMIN/ARGMAX-with-payload
    aggregate: each batch emits one candidate row per month (first/last by
    the (date, orderkey) tie-broken order plus min/max price); partials
    merge associatively on the |months|-bounded driver frame."""
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_totalprice"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        dt = pd.to_datetime(df["o_orderdate"])
        df = df.assign(month_id=(dt.dt.year * 12 + dt.dt.month - 1).astype(np.int64),
                       us=df["o_orderdate"].astype("int64"))
        df = df.sort_values(["month_id", "us", "o_orderkey"], kind="stable")
        first = df.groupby("month_id", as_index=False).first()
        last = df.groupby("month_id", as_index=False).last()
        ext = df.groupby("month_id", as_index=False).agg(
            high=("o_totalprice", "max"), low=("o_totalprice", "min"),
            n=("o_totalprice", "size"))
        out = ext.merge(first[["month_id", "us", "o_orderkey", "o_totalprice"]].rename(
            columns={"us": "o_us", "o_orderkey": "o_key", "o_totalprice": "open"}),
            on="month_id").merge(
            last[["month_id", "us", "o_orderkey", "o_totalprice"]].rename(
                columns={"us": "c_us", "o_orderkey": "c_key", "o_totalprice": "close"}),
            on="month_id")
        return out

    p = ds.map_batches(part, batch_format="pandas").to_pandas()
    # associative merge of per-batch candidates
    p = p.sort_values(["month_id", "o_us", "o_key"], kind="stable")
    first = p.groupby("month_id", as_index=False).first()[["month_id", "open"]]
    p2 = p.sort_values(["month_id", "c_us", "c_key"], kind="stable")
    last = p2.groupby("month_id", as_index=False).last()[["month_id", "close"]]
    ext = p.groupby("month_id", as_index=False).agg(
        high=("high", "max"), low=("low", "min"), n=("n", "sum"))
    out = ext.merge(first, on="month_id").merge(last, on="month_id")
    for c in ("open", "high", "low", "close"):
        out[c] = out[c].pipe(_rd, 2)
    out = out[["month_id", "open", "high", "low", "close", "n"]].sort_values(
        "month_id", ignore_index=True)
    return _i64(out, ["month_id", "n"])


SQL_ORDER_PRICE_OHLC = """
WITH o AS (
  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS month_id,
         o_totalprice AS p, o_orderdate, o_orderkey
  FROM orders),
r AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY month_id ORDER BY o_orderdate, o_orderkey) AS a,
         ROW_NUMBER() OVER (PARTITION BY month_id ORDER BY o_orderdate DESC, o_orderkey DESC) AS z
  FROM o)
SELECT month_id,
       ROUND(MAX(CASE WHEN a = 1 THEN p END), 2) AS open,
       ROUND(MAX(p), 2) AS high,
       ROUND(MIN(p), 2) AS low,
       ROUND(MAX(CASE WHEN z = 1 THEN p END), 2) AS close,
       COUNT(*) AS n
FROM r GROUP BY 1 ORDER BY 1
"""


def q_duplicate_invoices(sf_dir: str) -> pd.DataFrame:
    """Duplicate-invoice detection (fraud screen): pairs of orders by the
    SAME customer in the SAME $1000 price band within a year of each
    other.  Hash exchange on (custkey, band) — both equality keys — then a
    within-group windowed pair scan (group sizes are bounded by how often
    one customer repeats one price band, so the self-join cannot go
    corpus-quadratic)."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"])

    def part(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0), ndigits=0, round_mode="half_towards_infinity"), pa.int64())
        band = pc.divide(cents, pa.scalar(100_000, pa.int64()))
        return pa.table({"cust": t["o_custkey"], "band": band,
                         "key": t["o_orderkey"],
                         "us": pc.cast(t["o_orderdate"], pa.int64())})

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        W = 365 * 86_400_000_000
        for (_, _), g in df.groupby(["cust", "band"]):
            if len(g) < 2:
                continue
            g = g.sort_values(["us", "key"])
            us = g["us"].to_numpy()
            key = g["key"].to_numpy()
            # for each row, matching later rows within the window
            j = np.searchsorted(us, us + W, side="right")
            for i in range(len(g)):
                for m in range(i + 1, j[i]):
                    a, b = (key[i], key[m]) if key[i] < key[m] else (key[m], key[i])
                    out.append((a, b))
        if not out:
            return pd.DataFrame({"key_a": pd.Series([], dtype="int64"),
                                 "key_b": pd.Series([], dtype="int64")})
        return pd.DataFrame(out, columns=["key_a", "key_b"]).drop_duplicates()

    p = bucketed_group_reduce(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["cust", "band"], pairs,
    ).to_pandas().drop_duplicates()
    out = p.sort_values(["key_a", "key_b"], ignore_index=True)
    return _i64(out, ["key_a", "key_b"])


SQL_DUPLICATE_INVOICES = """
SELECT a.o_orderkey AS key_a, b.o_orderkey AS key_b
FROM orders a JOIN orders b
  ON a.o_custkey = b.o_custkey
 AND CAST(ROUND(a.o_totalprice * 100) AS BIGINT) // 100000
     = CAST(ROUND(b.o_totalprice * 100) AS BIGINT) // 100000
 AND a.o_orderkey < b.o_orderkey
 AND abs(EPOCH_US(a.o_orderdate) - EPOCH_US(b.o_orderdate)) <= 365 * 86400000000
ORDER BY 1, 2
"""


def q_stale_parts_by_brand(sf_dir: str) -> pd.DataFrame:
    """Stale-catalog audit: parts with NO shipment in the final year,
    counted per brand — the big-big anti-join with a dimension rollup.
    Active part keys come from a date-filtered distinct reduce; the anti is
    the tagged-union co-group (no broadcast of either key set); the brand
    rollup is a tiny grouped count."""
    from ...functions.relational import bucketed_group_reduce

    cutoff = pa.scalar(datetime(2001, 1, 1), pa.timestamp("us"))
    parts = _t(sf_dir, "part", ["p_partkey", "p_brand"])
    active = _t(sf_dir, "lineitem", ["l_partkey"],
                filter=pads.field("l_shipdate") >= cutoff)

    def p_part(t: pa.Table) -> pa.Table:
        return pa.table({"k": pc.cast(t["p_partkey"], pa.int64()),
                         "brand": t["p_brand"],
                         "act": pa.nulls(t.num_rows, pa.int64()).fill_null(0)})

    def a_part(t: pa.Table) -> pa.Table:
        g = pa.table({"k": pc.cast(t["l_partkey"], pa.int64())}).group_by(["k"]).aggregate([])
        return pa.table({"k": g["k"],
                         "brand": pa.nulls(g.num_rows, pa.string()),
                         "act": pa.nulls(g.num_rows, pa.int64()).fill_null(1)})

    u = parts.map_batches(p_part, batch_format="pyarrow", zero_copy_batch=True).union(
        active.map_batches(a_part, batch_format="pyarrow", zero_copy_batch=True))

    def anti(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("k").agg(act=("act", "sum"), brand=("brand", "first"))
        # "first" may pick the NULL side's row — recover the brand from any
        # non-null value in the group instead
        brand = df.dropna(subset=["brand"]).groupby("k")["brand"].first()
        g["brand"] = brand.reindex(g.index)
        stale = g[(g["act"] == 0) & g["brand"].notna()]
        return stale.reset_index()[["brand"]].groupby("brand", as_index=False).size().rename(
            columns={"size": "n_stale"})

    agg = bucketed_group_reduce(u, ["k"], anti).to_pandas()
    out = agg.groupby("brand", as_index=False)["n_stale"].sum().sort_values(
        "brand", ignore_index=True)
    return _i64(out, ["n_stale"])


SQL_STALE_PARTS_BY_BRAND = """
SELECT p.p_brand AS brand, COUNT(*) AS n_stale
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_partkey = p.p_partkey AND l.l_shipdate >= TIMESTAMP '2001-01-01')
GROUP BY 1 ORDER BY 1
"""


def q_charclass_profile(sf_dir: str) -> pd.DataFrame:
    """Character-class profile per source over the messy corpus (alpha /
    digit / whitespace / other shares) — the encoding-health signal scrub
    pipelines gate on.  Four vectorized RE2 count kernels per batch, scalar
    partials reduce; shares are exact integer ratios rounded once."""
    src = ensure_messy_parquet(sf_dir)
    ds = rd.read_parquet(src, columns=["source", "text"])

    def part(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t["text"], "")
        total = pc.cast(pc.utf8_length(text), pa.int64())
        alpha = pc.cast(pc.count_substring_regex(text, "[a-zA-Z]"), pa.int64())
        digit = pc.cast(pc.count_substring_regex(text, "[0-9]"), pa.int64())
        space = pc.cast(pc.count_substring_regex(text, r"\s"), pa.int64())
        g = pa.table({"source": t["source"], "total": total, "alpha": alpha,
                      "digit": digit, "space": space}).group_by(["source"]).aggregate(
            [("total", "sum"), ("alpha", "sum"), ("digit", "sum"), ("space", "sum")])
        return pa.table({"source": g["source"], "total": g["total_sum"],
                         "alpha": g["alpha_sum"], "digit": g["digit_sum"],
                         "space": g["space_sum"]})

    agg = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = agg.groupby("source", as_index=False).sum()
    for c in ("alpha", "digit", "space"):
        out[f"{c}_share"] = (out[c] / out["total"]).pipe(_rd)
    out["other_share"] = (
        (out["total"] - out["alpha"] - out["digit"] - out["space"]) / out["total"]).pipe(_rd)
    out = out[["source", "total", "alpha_share", "digit_share", "space_share", "other_share"]]
    return _i64(out.sort_values("source", ignore_index=True), ["total"])


SQL_CHARCLASS_PROFILE = f"""
WITH c AS (
  SELECT source,
         SUM(length(text)) AS total,
         SUM(len(regexp_extract_all(text, '[a-zA-Z]'))) AS alpha,
         SUM(len(regexp_extract_all(text, '[0-9]'))) AS digit,
         SUM(len(regexp_extract_all(text, '\\s'))) AS space
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/messy.parquet')
  GROUP BY 1)
SELECT source, CAST(total AS BIGINT) AS total,
       ROUND(alpha / CAST(total AS DOUBLE), 6) AS alpha_share,
       ROUND(digit / CAST(total AS DOUBLE), 6) AS digit_share,
       ROUND(space / CAST(total AS DOUBLE), 6) AS space_share,
       ROUND((total - alpha - digit - space) / CAST(total AS DOUBLE), 6) AS other_share
FROM c ORDER BY 1
"""


def q_purchase_value_drift(sf_dir: str) -> pd.DataFrame:
    """Per-user purchase-value drift: value of the LAST purchase minus the
    FIRST (argmin/argmax-with-payload at user cardinality — per-batch
    first/last candidates, bucketed merge), then scalar drift moments; the
    driver sees three numbers."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id", "value"],
            filter=pads.field("event_type") == "purchase")

    def part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(us=df["ts"].astype("int64"))
        df = df.sort_values(["user_id", "us", "event_id"], kind="stable")
        f = df.groupby("user_id", as_index=False).first()[["user_id", "us", "event_id", "value"]]
        l = df.groupby("user_id", as_index=False).last()[["user_id", "us", "event_id", "value"]]
        f.columns = ["user_id", "f_us", "f_id", "f_v"]
        l.columns = ["user_id", "l_us", "l_id", "l_v"]
        return f.merge(l, on="user_id")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        a = df.sort_values(["user_id", "f_us", "f_id"], kind="stable").groupby(
            "user_id", as_index=False).first()[["user_id", "f_v"]]
        b = df.sort_values(["user_id", "l_us", "l_id"], kind="stable").groupby(
            "user_id", as_index=False).last()[["user_id", "l_v"]]
        return a.merge(b, on="user_id")

    per_user = bucketed_group_reduce(
        ds.map_batches(part, batch_format="pandas"), ["user_id"], merge)

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        d = ((df["l_v"] - df["f_v"]) * 100).round().astype(np.int64)
        return pd.DataFrame({"n": [len(d)], "s": [int(d.sum())],
                             "pos": [int((d > 0).sum())]})

    p = per_user.map_batches(moments, batch_format="pandas").to_pandas()
    n = int(p["n"].sum())
    out = pd.DataFrame({
        "n_users": [n],
        "avg_drift": [_rd(float(p["s"].sum()) / n / 100.0, 6)],
        "n_increased": [int(p["pos"].sum())],
    })
    return _i64(out, ["n_users", "n_increased"])


SQL_PURCHASE_VALUE_DRIFT = """
WITH p AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'),
r AS (
  SELECT user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS a,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS z
  FROM p),
u AS (
  SELECT user_id,
         CAST(ROUND((MAX(CASE WHEN z = 1 THEN value END)
                     - MAX(CASE WHEN a = 1 THEN value END)) * 100) AS BIGINT) AS d_c
  FROM r GROUP BY 1)
SELECT COUNT(*) AS n_users,
       ROUND(SUM(d_c) / CAST(COUNT(*) AS DOUBLE) / 100.0, 6) AS avg_drift,
       CAST(SUM(CASE WHEN d_c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_increased
FROM u
"""


def q_peak_concurrent_sessions(sf_dir: str) -> pd.DataFrame:
    """Peak session concurrency (interval stabbing): how many gap-sessions
    were simultaneously active at the busiest minute, and the first minute
    that peak occurs.  Per-user buckets segment sessions and emit ±1 diff
    events at minute granularity; one day-scale grouped sum + a cumulative
    max over the |minutes|-bounded series closes it — no per-minute
    expansion ever materializes on the Ray side (the SQL oracle brute-
    forces the expansion)."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts"])
    MIN_US = 60_000_000

    def diffs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"])
        u = df["user_id"].to_numpy()
        us = df["ts"].astype("int64").to_numpy()
        new = np.r_[True, (u[1:] != u[:-1]) | (us[1:] - us[:-1] > 1_800_000_000)]
        sess = np.cumsum(new) - 1
        g = pd.DataFrame({"sess": sess, "us": us}).groupby("sess", as_index=False).agg(
            lo=("us", "min"), hi=("us", "max"))
        start = (g["lo"] // MIN_US).to_numpy(dtype=np.int64)
        end = (g["hi"] // MIN_US).to_numpy(dtype=np.int64) + 1  # active through end minute
        return pd.DataFrame({"minute_id": np.r_[start, end],
                             "v": np.r_[np.ones(len(start), np.int64),
                                        -np.ones(len(end), np.int64)]})

    d = bucketed_group_reduce(ds, ["user_id"], diffs)
    agg = grouped_sums(d, ["minute_id"], {"v": "v"}).to_pandas().sort_values(
        "minute_id", ignore_index=True)
    run = agg["v"].cumsum().to_numpy()
    peak = int(run.max())
    first = int(agg["minute_id"].to_numpy()[int(np.argmax(run))])
    return pd.DataFrame({"peak": pd.Series([peak], dtype="int64"),
                         "first_minute_id": pd.Series([first], dtype="int64")})


SQL_PEAK_CONCURRENT_SESSIONS = """
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR EPOCH_US(ts) - EPOCH_US(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, EPOCH_US(ts) AS us,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
), spans AS (
  SELECT MIN(us) // 60000000 AS m0, MAX(us) // 60000000 AS m1
  FROM sess GROUP BY user_id, session_id
), minutes AS (
  SELECT UNNEST(range(m0, m1 + 1)) AS minute_id FROM spans
), conc AS (
  SELECT minute_id, COUNT(*) AS c FROM minutes GROUP BY 1)
SELECT MAX(c) AS peak,
       CAST(MIN(minute_id) FILTER (c = (SELECT MAX(c) FROM conc)) AS BIGINT)
         AS first_minute_id
FROM conc
"""


def q_top_supplier_per_nation(sf_dir: str) -> pd.DataFrame:
    """Grouped argmax over the supplier dimension: each nation's
    highest-balance supplier (deterministic suppkey tie-break) via the
    per-block-pruned grouped top-k."""
    from ...functions.relational import grouped_topk

    ds = _t(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"])
    out = grouped_topk(
        ds, ["s_nationkey"], ["s_acctbal", "s_suppkey"], [True, False], 1
    ).to_pandas().sort_values("s_nationkey", ignore_index=True)
    out["s_acctbal"] = out["s_acctbal"].pipe(_rd, 2)
    return _i64(out[["s_nationkey", "s_suppkey", "s_name", "s_acctbal"]],
                ["s_nationkey", "s_suppkey"])


SQL_TOP_SUPPLIER_PER_NATION = """
WITH r AS (
  SELECT s_nationkey, s_suppkey, s_name, s_acctbal,
         ROW_NUMBER() OVER (PARTITION BY s_nationkey
                            ORDER BY s_acctbal DESC, s_suppkey) AS rn
  FROM supplier)
SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey, s_suppkey, s_name,
       ROUND(s_acctbal, 2) AS s_acctbal
FROM r WHERE rn = 1 ORDER BY 1
"""


def q_balance_ks_test(sf_dir: str) -> pd.DataFrame:
    """Two-sample Kolmogorov–Smirnov D between supplier and customer
    account-balance distributions — the distribution-drift test, EXACT
    from two one-pass cent histograms: acctbal has a bounded range, so the
    merged support is ≤ ~1.1M bins regardless of row count, and D is the
    max |ΔCDF| over that bounded grid on the driver."""
    def hist(table: str, col: str) -> pd.DataFrame:
        ds = _t(sf_dir, table, [col])

        def part(t: pa.Table) -> pa.Table:
            cents = pc.cast(pc.round(pc.multiply(t[col], 100.0), ndigits=0, round_mode="half_towards_infinity"), pa.int64())
            g = pa.table({"bin": cents}).group_by(["bin"]).aggregate([([], "count_all")])
            return pa.table({"bin": g["bin"], "n": pc.cast(g["count_all"], pa.int64())})

        p = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
        return p.groupby("bin", as_index=False)["n"].sum()

    a = hist("supplier", "s_acctbal")
    b = hist("customer", "c_acctbal")
    na, nb = int(a["n"].sum()), int(b["n"].sum())
    grid = np.union1d(a["bin"].to_numpy(dtype=np.int64), b["bin"].to_numpy(dtype=np.int64))
    ca = np.zeros(len(grid), dtype=np.int64)
    cb = np.zeros(len(grid), dtype=np.int64)
    ca[np.searchsorted(grid, a["bin"].to_numpy(dtype=np.int64))] = a["n"].to_numpy()
    cb[np.searchsorted(grid, b["bin"].to_numpy(dtype=np.int64))] = b["n"].to_numpy()
    d = np.abs(np.cumsum(ca) / na - np.cumsum(cb) / nb).max()
    return pd.DataFrame({"n_supplier": pd.Series([na], dtype="int64"),
                         "n_customer": pd.Series([nb], dtype="int64"),
                         "ks_d": [_rd(float(d), 6)]})


SQL_BALANCE_KS_TEST = """
WITH sa AS (SELECT CAST(ROUND(s_acctbal * 100) AS BIGINT) AS v FROM supplier),
sb AS (SELECT CAST(ROUND(c_acctbal * 100) AS BIGINT) AS v FROM customer),
u AS (SELECT v, 1 AS a, 0 AS b FROM sa UNION ALL SELECT v, 0, 1 FROM sb),
c AS (
  SELECT v,
         SUM(a) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS ca,
         SUM(b) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cb
  FROM u),
last AS (SELECT v, MAX(ca) AS ca, MAX(cb) AS cb FROM c GROUP BY v)
SELECT (SELECT COUNT(*) FROM sa) AS n_supplier,
       (SELECT COUNT(*) FROM sb) AS n_customer,
       ROUND(MAX(ABS(ca / CAST((SELECT COUNT(*) FROM sa) AS DOUBLE)
                   - cb / CAST((SELECT COUNT(*) FROM sb) AS DOUBLE))), 6) AS ks_d
FROM last
"""


def q_benford_prices(sf_dir: str) -> pd.DataFrame:
    """Benford's-law first-digit audit of order totals (the classic
    books-cooking screen): digit shares vs log₁₀(1+1/d) expectation.
    Leading digit falls out of integer cents (scale shifts don't change
    it); one tiny grouped count, driver closes the expectation columns."""
    ds = _t(sf_dir, "orders", ["o_totalprice"])

    def part(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0), ndigits=0, round_mode="half_towards_infinity"), pa.int64())
        s = pc.cast(cents, pa.string())
        d = pc.cast(pc.utf8_slice_codeunits(s, 0, 1), pa.int64())
        g = pa.table({"digit": d}).group_by(["digit"]).aggregate([([], "count_all")])
        return pa.table({"digit": g["digit"], "n": pc.cast(g["count_all"], pa.int64())})

    agg = grouped_sums(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["digit"], {"n": "n"}, reduce="driver",
    ).to_pandas().sort_values("digit", ignore_index=True)
    total = int(agg["n"].sum())
    agg["share"] = (agg["n"] / total).pipe(_rd)
    agg["benford"] = _rd(np.log10(1.0 + 1.0 / agg["digit"].to_numpy(dtype=np.float64)), 6)
    return _i64(agg, ["digit", "n"])


SQL_BENFORD_PRICES = """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
              AS BIGINT) AS digit
  FROM orders),
c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1),
t AS (SELECT SUM(n) AS total FROM c)
SELECT digit, n,
       ROUND(n / CAST(t.total AS DOUBLE), 6) AS share,
       ROUND(log10(1.0 + 1.0 / digit), 6) AS benford
FROM c CROSS JOIN t ORDER BY digit
"""


def q_acf_multi_lag(sf_dir: str) -> pd.DataFrame:
    """Autocorrelation function at lags 1–5 of the GLOBAL hourly event-count
    series — the periodicity fingerprint.  One distributed hourly count;
    the ACF over the |hours|-bounded series is driver numpy, matching the
    SQL LAG-per-lag construction exactly (pairs are consecutive present
    rows in hour order)."""
    ds = _t(sf_dir, "events", ["ts"])

    def hour(t: pa.Table) -> pa.Table:
        return pa.table({"hour_id": pc.divide(pc.cast(t["ts"], pa.int64()),
                                              pa.scalar(3_600_000_000, pa.int64()))})

    agg = grouped_sums(
        ds.map_batches(hour, batch_format="pyarrow", zero_copy_batch=True),
        ["hour_id"], {}, "n",
    ).to_pandas().sort_values("hour_id", ignore_index=True)
    x = agg["n"].to_numpy(dtype=np.float64)
    rows = []
    for lag in range(1, 6):
        a, b = x[lag:], x[:-lag]
        r = float(np.corrcoef(a, b)[0, 1]) if len(a) >= 2 and a.std() > 0 and b.std() > 0 else np.nan
        rows.append((lag, _rd(r, 6), len(a)))
    return _i64(pd.DataFrame(rows, columns=["lag", "acf", "n_pairs"]), ["lag", "n_pairs"])


