"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import (
    ORACLE_ARTIFACT_DIR,
    STOPWORD_PATTERN,
    _corpus_dir,
    _i64,
    _rd,
    _t,
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
from .neardup_a import _ensure_artifact  # noqa: F401

def q_copurchase_degree_hist(sf_dir: str) -> pd.DataFrame:
    """Degree distribution of the co-purchase graph — the skew probe run
    before any graph algorithm (hub degree decides triangle/PageRank
    partitioning).  Distinct edges come from the shared once-per-sf-dir
    artifact (graph_edges.py); then symmetrize and two tiny grouped
    exchanges: neighbors-per-node, nodes-per-degree."""
    from .graph_edges import copurchase_edges_ds

    edges = copurchase_edges_ds(sf_dir, with_count=False)

    def sym(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": pa.concat_arrays(
                [t["part_a"].combine_chunks().cast(pa.int64()),
                 t["part_b"].combine_chunks().cast(pa.int64())])}
        )

    deg = grouped_sums(
        edges.map_batches(sym, batch_format="pyarrow"), ["node"], {}, "deg"
    )
    out = grouped_sums(deg.select_columns(["deg"]), ["deg"], {}, "n_nodes").to_pandas()
    return _i64(out, ["deg", "n_nodes"])


SQL_COPURCHASE_DEGREE_HIST = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
  FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
s AS (SELECT pa AS node FROM e UNION ALL SELECT pb FROM e),
deg AS (SELECT node, COUNT(*) AS deg FROM s GROUP BY 1)
SELECT deg, COUNT(*) AS n_nodes FROM deg GROUP BY 1 ORDER BY 1
"""


def q_bigram_lm_nll(sf_dir: str) -> pd.DataFrame:
    """Add-one-smoothed bigram language model trained on the whole corpus,
    scored per source (average negative log-likelihood per bigram) — the
    LM-based quality/drift signal one step up from unigram surprisal.

    Distributed shape: bigram and unigram streams collapse to per-batch
    TYPE-level partials (combiner before any exchange), then ONE co-group
    exchange on w1 — where all of a word's bigram partials and its unigram
    partials co-locate — computes c12, c1 and the smoothed score in place,
    replacing the two model joins a naive plan would run; only per-source
    scalar partials reach the driver."""
    from ...functions.relational import bucketed_group_reduce
    from ...functions.search import TOKEN_SPLIT, word_bigrams

    docs = _t(sf_dir, "documents", ["source", "text"])

    def bigram_partial(t: pa.Table) -> pa.Table:
        bg = word_bigrams(t, "text", "source")
        df = bg.to_pandas().groupby(["source", "w1", "w2"], as_index=False).size()
        df["c1"] = 0
        return pa.Table.from_pandas(
            df.rename(columns={"size": "n"})[["source", "w1", "w2", "n", "c1"]],
            preserve_index=False)

    def unigram_partial(t: pa.Table) -> pa.Table:
        words = pc.split_pattern_regex(pc.utf8_lower(t["text"]), TOKEN_SPLIT)
        words = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        flat = words.flatten()
        flat = flat.filter(pc.not_equal(flat, ""))
        g = pa.table({"w1": flat}).group_by(["w1"]).aggregate([([], "count_all")])
        n = g.num_rows
        return pa.table({"source": pa.nulls(n, pa.string()).fill_null(""),
                         "w1": g["w1"],
                         "w2": pa.nulls(n, pa.string()).fill_null(""),
                         "n": pa.nulls(n, pa.int64()).fill_null(0),
                         "c1": pc.cast(g["count_all"], pa.int64())})

    bg = docs.map_batches(bigram_partial, batch_format="pyarrow", zero_copy_batch=True)
    # materialized: the vocab count below and the co-group union both
    # consume these partials — without it the corpus tokenizes twice
    un = docs.map_batches(
        unigram_partial, batch_format="pyarrow", zero_copy_batch=True).materialize()

    # V = |vocabulary| — one w1-level reduce of the unigram partials
    vocab = grouped_sums(un.select_columns(["w1"]), ["w1"], {}, "c").count()

    # ONE co-group exchange on w1 replaces both model joins: every row of a
    # given w1 (all its bigram partials from every source + its unigram
    # partials) lands in one bucket, so c12 and c1 are in-bucket sums and
    # the smoothed score is computed where the data already sits.  Bucket
    # mass is bounded by bigram TYPES per w1 (partials, not tokens).
    def fold(df: pd.DataFrame, *, v=vocab) -> pd.DataFrame:
        c1 = df.groupby("w1")["c1"].sum()
        b = df[df["n"] > 0].groupby(["source", "w1", "w2"], as_index=False)["n"].sum()
        if not len(b):
            return pd.DataFrame({"source": [], "nll": [], "n": []})
        c12 = b.groupby(["w1", "w2"])["n"].transform("sum")
        nll = b["n"] * -(np.log(c12.to_numpy() + 1.0)
                         - np.log(c1.loc[b["w1"]].to_numpy() + v))
        out = pd.DataFrame({"source": b["source"], "nll": nll, "n": b["n"]})
        return out.groupby("source", as_index=False).agg(nll=("nll", "sum"), n=("n", "sum"))

    parts = bucketed_group_reduce(bg.union(un), ["w1"], fold).to_pandas()
    out = parts.groupby("source", as_index=False).agg(
        nll=("nll", "sum"), n_bigrams=("n", "sum"))
    out["avg_nll"] = (out["nll"] / out["n_bigrams"]).pipe(_rd)
    out = out.drop(columns=["nll"]).sort_values("source", ignore_index=True)
    return _i64(out, ["n_bigrams"])


SQL_BIGRAM_LM_NLL = """
WITH d AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws
  FROM documents),
uni AS (SELECT UNNEST(ws) AS w FROM d),
uc AS (SELECT w, COUNT(*) AS c1 FROM uni GROUP BY 1),
v AS (SELECT COUNT(*) AS v FROM uc),
bg AS (
  SELECT source, ws[i] AS w1, ws[i + 1] AS w2
  FROM d, UNNEST(range(1, greatest(len(ws), 1))) AS t(i)),
bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
sb AS (SELECT source, w1, w2, COUNT(*) AS n FROM bg GROUP BY 1, 2, 3)
SELECT source, CAST(SUM(n) AS BIGINT) AS n_bigrams,
       ROUND(SUM(n * -ln((c12 + 1.0) / (c1 + v.v))) / SUM(n), 6) AS avg_nll
FROM sb JOIN bc USING (w1, w2) JOIN uc ON sb.w1 = uc.w CROSS JOIN v
GROUP BY source ORDER BY source
"""


def q_value_boxplot(sf_dir: str) -> pd.DataFrame:
    """Per-group boxplot profile — discrete quartiles plus Tukey-fence
    (1.5·IQR) outlier counts — from ONE histogram pass: the mergeable
    fixed-bin sketch (``sketch.py::grouped_histogram_fixedpoint``) already
    carries everything, so unlike the SQL oracle (which scans twice: once
    for quantiles, once to count outliers) no second scan happens.  All
    fence comparisons are exact integer arithmetic in half-cent units —
    quartiles are cent-grid data values (quantile_disc), so 1.5·IQR lives
    on the half-cent grid and no float boundary can flip a count."""
    from ...functions.sketch import grouped_histogram_fixedpoint, quantile_disc_from_counts

    hist = grouped_histogram_fixedpoint(
        _t(sf_dir, "events", ["event_type", "value"]), "event_type", "value", scale=100
    )
    rows = []
    for etype, g in hist.groupby("event_type", sort=True):
        bins = g["bin"].to_numpy()
        counts = g["n"].to_numpy()
        mask = pd.notna(bins)
        b = bins[mask].astype(np.int64)
        c = counts[mask].astype(np.int64)
        n = int(c.sum())
        q25 = quantile_disc_from_counts(b, c, 0.25)
        q50 = quantile_disc_from_counts(b, c, 0.50)
        q75 = quantile_disc_from_counts(b, c, 0.75)
        iqr = q75 - q25
        lo2, hi2 = 2 * q25 - 3 * iqr, 2 * q75 + 3 * iqr  # half-cent units
        n_out = int(c[(2 * b < lo2) | (2 * b > hi2)].sum())
        rows.append((etype, _rd(q25 / 100.0, 2), _rd(q50 / 100.0, 2),
                     _rd(q75 / 100.0, 2), n, n_out))
    out = pd.DataFrame(rows, columns=["event_type", "p25", "p50", "p75", "n", "n_outliers"])
    return _i64(out, ["n", "n_outliers"])


SQL_VALUE_BOXPLOT = """
WITH q AS (
  SELECT event_type,
         CAST(ROUND(quantile_disc(value, 0.25) * 100) AS BIGINT) AS q25c,
         CAST(ROUND(quantile_disc(value, 0.50) * 100) AS BIGINT) AS q50c,
         CAST(ROUND(quantile_disc(value, 0.75) * 100) AS BIGINT) AS q75c
  FROM events GROUP BY 1)
SELECT e.event_type,
       ROUND(q25c / 100.0, 2) AS p25, ROUND(q50c / 100.0, 2) AS p50,
       ROUND(q75c / 100.0, 2) AS p75,
       COUNT(value) AS n,
       COUNT(*) FILTER (CAST(ROUND(value * 200) AS BIGINT) < 2 * q25c - 3 * (q75c - q25c)
                     OR CAST(ROUND(value * 200) AS BIGINT) > 2 * q75c + 3 * (q75c - q25c))
         AS n_outliers
FROM events e JOIN q USING (event_type)
GROUP BY e.event_type, q25c, q50c, q75c ORDER BY 1
"""


def q_nation_revenue_share(sf_dir: str) -> pd.DataFrame:
    """Percent-of-total window (``ratio_to_report``): each nation's share
    of its region's order revenue.  The fact side pre-aggregates per
    custkey BEFORE touching any dimension, the customer dimension attaches
    via the size-aware join planner, and the final share window runs on
    the |nations|-bounded aggregate on the driver."""
    from ...functions.relational import auto_join

    o = grouped_sums(_t(sf_dir, "orders", ["o_custkey", "o_totalprice"]),
                     ["o_custkey"], {"rev": "o_totalprice"})
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lambda t: pa.table({"o_custkey": t["c_custkey"], "nationkey": t["c_nationkey"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    per_nation = grouped_sums(
        auto_join(o, cust, on="o_custkey"), ["nationkey"], {"revenue": "rev"}
    ).to_pandas()
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    out = per_nation.merge(dim, left_on="nationkey", right_on="n_nationkey")
    out["share"] = (out["revenue"] / out.groupby("r_regionkey")["revenue"].transform("sum")).pipe(_rd)
    out["revenue"] = out["revenue"].pipe(_rd, 2)
    out = out.rename(columns={"r_name": "region", "n_name": "nation"})
    return out[["region", "nation", "revenue", "share"]].sort_values(
        ["region", "nation"], ignore_index=True)


SQL_NATION_REVENUE_SHARE = """
WITH rev AS (
  SELECT c.c_nationkey AS nationkey, SUM(o.o_totalprice) AS revenue
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1)
SELECT r.r_name AS region, n.n_name AS nation, ROUND(revenue, 2) AS revenue,
       ROUND(revenue / SUM(revenue) OVER (PARTITION BY r.r_regionkey), 6) AS share
FROM rev JOIN nation n ON rev.nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
ORDER BY 1, 2
"""


def q_shipping_priority(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q3 shape (shipping-priority): segment-filtered customers →
    date-filtered orders → post-cutoff lineitems, top-10 orders by revenue.
    Plan: every filter is pushed into the scan; lineitem pre-aggregates
    revenue PER ORDER before any join (the classic combiner-before-join
    rule — the join then moves order-level rows, not lineitems); customer
    participates only as a key set through the size-aware planner."""
    from ...functions.relational import auto_join

    cutoff = pa.scalar(datetime(1998, 1, 1), pa.timestamp("us"))
    cust = _t(
        sf_dir, "customer", ["c_custkey"],
        filter=pads.field("c_mktsegment") == "BUILDING",
    ).map_batches(
        lambda t: pa.table({"o_custkey": t["c_custkey"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    orders = _t(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=pads.field("o_orderdate") < cutoff,
    )
    o_seg = auto_join(orders, cust, on="o_custkey").map_batches(
        lambda t: t.select(["o_orderkey", "o_orderdate", "o_orderpriority"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    li = _t(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pads.field("l_shipdate") > cutoff,
    )

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"o_orderkey": t["l_orderkey"], "r": r})

    li_rev = grouped_sums(
        li.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True),
        ["o_orderkey"], {"revenue": "r"},
    )
    j = auto_join(li_rev, o_seg, on="o_orderkey")
    out = topk(j, ["revenue", "o_orderkey"], [True, False], 10).to_pandas()
    out["revenue"] = out["revenue"].pipe(_rd, 2)
    out = out.rename(columns={"o_orderkey": "l_orderkey"})
    return _i64(out[["l_orderkey", "revenue", "o_orderdate", "o_orderpriority"]], ["l_orderkey"])


SQL_SHIPPING_PRIORITY = """
SELECT l.l_orderkey,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
"""


def q_new_users_daily(sf_dir: str) -> pd.DataFrame:
    """First-seen cohort counts (new users per day): per-batch min-day
    partials per user → bucketed min reduce (only (user, day) pairs cross
    the exchange) → day-level count.  The first-touch-attribution shape."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        micros = pc.cast(t["ts"], pa.int64())
        day = pc.divide(micros, pa.scalar(86_400_000_000, pa.int64()))
        g = pa.table({"user_id": t["user_id"], "day_id": day}).group_by(["user_id"]).aggregate(
            [("day_id", "min")])
        return pa.table({"user_id": g["user_id"], "day_id": g["day_id_min"]})

    per_user = bucketed_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"],
        lambda df: df.groupby("user_id", as_index=False)["day_id"].min(),
    )
    out = grouped_sums(per_user.select_columns(["day_id"]), ["day_id"], {}, "new_users").to_pandas()
    return _i64(out, ["day_id", "new_users"])


SQL_NEW_USERS_DAILY = """
WITH f AS (
  SELECT user_id, MIN(CAST(floor(epoch(ts) / 86400) AS BIGINT)) AS day_id
  FROM events GROUP BY 1)
SELECT day_id, COUNT(*) AS new_users FROM f GROUP BY 1 ORDER BY 1
"""


def q_event_trigrams(sf_dir: str) -> pd.DataFrame:
    """Per-user ordered event-type trigram mining (the behavioral-pattern
    sequence op one step past the Markov transition matrix): hash exchange
    on the user, per-group chronological sort + vectorized shift-compare
    trigram partials, global trigram reduce, deterministic top-20."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        u, e = df["user_id"].to_numpy(), df["event_type"].to_numpy()
        same = (u[:-2] == u[1:-1]) & (u[1:-1] == u[2:]) if len(u) >= 3 else np.empty(0, bool)
        t = pd.DataFrame({"t1": e[:-2][same], "t2": e[1:-1][same], "t3": e[2:][same]})
        return t.groupby(["t1", "t2", "t3"], as_index=False).size().rename(columns={"size": "n"})

    tri = bucketed_group_reduce(ds, ["user_id"], per_user)
    agg = grouped_sums(tri, ["t1", "t2", "t3"], {"n": "n"})
    out = topk(agg, ["n", "t1", "t2", "t3"], [True, False, False, False], 20).to_pandas()
    return _i64(out, ["n"])


SQL_EVENT_TRIGRAMS = """
WITH s AS (
  SELECT event_type AS t3,
         LAG(event_type, 1) OVER w AS t2,
         LAG(event_type, 2) OVER w AS t1
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT t1, t2, t3, COUNT(*) AS n
FROM s WHERE t1 IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY n DESC, t1, t2, t3
LIMIT 20
"""


def q_conversion_latency(sf_dir: str) -> pd.DataFrame:
    """First-view → first-purchase latency (funnel timing): conditional
    per-user MIN partials for both stages in one scan, bucketed min
    reduce, then scalar moments folded distributedly — the driver sees
    four numbers, never per-user rows."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        micros = pc.cast(t["ts"], pa.int64())
        df = pa.table({"user_id": t["user_id"], "us": micros, "et": t["event_type"]}).to_pandas()
        v = df[df["et"] == "view"].groupby("user_id")["us"].min()
        p = df[df["et"] == "purchase"].groupby("user_id")["us"].min()
        m = pd.concat([v.rename("v_us"), p.rename("p_us")], axis=1).reset_index()
        return pa.Table.from_pandas(m, preserve_index=False)

    def merge_mins(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("user_id", as_index=False).agg(
            v_us=("v_us", "min"), p_us=("p_us", "min"))

    per_user = bucketed_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"], merge_mins,
    )

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        d = df.dropna(subset=["v_us", "p_us"])
        d = d[d["p_us"] >= d["v_us"]]
        lat = (d["p_us"] - d["v_us"]).to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "n": [len(lat)], "s": [int(lat.sum())],
            "mn": [int(lat.min()) if len(lat) else np.iinfo(np.int64).max],
            "mx": [int(lat.max()) if len(lat) else np.iinfo(np.int64).min],
        })

    parts = per_user.map_batches(moments, batch_format="pandas").to_pandas()
    n = int(parts["n"].sum())
    out = pd.DataFrame({
        "n_users": [n],
        "avg_latency_s": [_rd(float(parts["s"].sum()) / n / 1e6, 3) if n else np.nan],
        "min_latency_s": [int(parts["mn"].min() // 1_000_000)],
        "max_latency_s": [int(parts["mx"].max() // 1_000_000)],
    })
    return _i64(out, ["n_users", "min_latency_s", "max_latency_s"])


SQL_CONVERSION_LATENCY = """
WITH u AS (
  SELECT user_id,
         MIN(EPOCH_US(ts)) FILTER (event_type = 'view') AS v_us,
         MIN(EPOCH_US(ts)) FILTER (event_type = 'purchase') AS p_us
  FROM events GROUP BY 1)
SELECT COUNT(*) AS n_users,
       ROUND(SUM(p_us - v_us) / COUNT(*) / 1000000.0, 3) AS avg_latency_s,
       CAST(MIN(p_us - v_us) // 1000000 AS BIGINT) AS min_latency_s,
       CAST(MAX(p_us - v_us) // 1000000 AS BIGINT) AS max_latency_s
FROM u WHERE v_us IS NOT NULL AND p_us IS NOT NULL AND p_us >= v_us
"""


def q_value_gini(sf_dir: str) -> pd.DataFrame:
    """Per-group Gini coefficient of the value distribution (inequality /
    concentration signal) computed EXACTLY from the same one-pass mergeable
    cent histogram as the median/boxplot — rank sums per bin are closed-form
    (run of c equal values starting at rank r contributes
    ``x·(c·r + c·(c-1)/2)``), so no sort and no raw-value shuffle, while the
    SQL oracle needs a full ROW_NUMBER window sort."""
    from ...functions.sketch import grouped_histogram_fixedpoint

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
        n = int(c.sum())
        start = np.concatenate(([0], np.cumsum(c)[:-1])) + 1  # 1-based first rank per run
        s = int((b * c).sum())
        si = int((b * (c * start + c * (c - 1) // 2)).sum())
        gini = 2.0 * si / (n * s) - (n + 1.0) / n if n and s else np.nan
        rows.append((etype, _rd(gini, 6), n))
    out = pd.DataFrame(rows, columns=["event_type", "gini", "n"])
    return _i64(out, ["n"])


SQL_VALUE_GINI = """
WITH r AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS i
  FROM events WHERE value IS NOT NULL),
g AS (SELECT event_type, COUNT(*) AS n, SUM(value) AS s, SUM(i * value) AS si
      FROM r GROUP BY 1)
SELECT event_type, ROUND(2.0 * si / (n * s) - (n + 1.0) / n, 6) AS gini, n
FROM g ORDER BY 1
"""


def q_order_priority_check(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q4 shape (EXISTS semi-join): orders with at least one lineitem
    shipped >30 days after the order date, counted per priority.  The
    correlated EXISTS collapses to a per-order MAX pre-aggregate (the
    predicate is monotone in shipdate), so the exchange moves order-level
    partials; the orders side then attaches via one hash join and the
    comparison is a vectorized timestamp subtract."""
    from ...functions.relational import bucketed_group_reduce, hash_join

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def part(t: pa.Table) -> pa.Table:
        g = pa.table(
            {"o_orderkey": t["l_orderkey"], "ship_us": pc.cast(t["l_shipdate"], pa.int64())}
        ).group_by(["o_orderkey"]).aggregate([("ship_us", "max")])
        return pa.table({"o_orderkey": g["o_orderkey"], "ship_us": g["ship_us_max"]})

    li_max = bucketed_group_reduce(
        li.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["o_orderkey"],
        lambda df: df.groupby("o_orderkey", as_index=False)["ship_us"].max(),
    )
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
    j = hash_join(orders, li_max, on="o_orderkey")

    def late_flag(t: pa.Table) -> pa.Table:
        cut = pc.add(pc.cast(t["o_orderdate"], pa.int64()),
                     pa.scalar(30 * 86_400_000_000, pa.int64()))
        keep = pc.fill_null(pc.greater(t["ship_us"], cut), False)
        return pa.table({"o_orderpriority": t["o_orderpriority"].filter(keep)})

    flagged = j.map_batches(late_flag, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_sums(flagged, ["o_orderpriority"], {}, "n", reduce="driver").to_pandas()
    return _i64(out.sort_values("o_orderpriority", ignore_index=True), ["n"])


SQL_ORDER_PRIORITY_CHECK = """
SELECT o_orderpriority, COUNT(*) AS n
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY 1 ORDER BY 1
"""


def q_small_quantity_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q17 shape (join back to a correlated aggregate): revenue from
    lineitems whose quantity is below 20% of their part's average quantity.
    Per-part (count, Σqty) pre-aggregates once, the fact joins BACK to its
    own aggregate (big-big hash join — parts scale with the catalog), and
    the threshold test is the integer cross-multiplied form
    ``5·qty·cnt < Σqty`` so no float-boundary tie can flip a row."""
    from ...functions.relational import hash_join

    li = _t(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])
    s = grouped_sums(
        li.map_batches(
            lambda t: pa.table({"l_partkey": t["l_partkey"], "q": t["l_quantity"]}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["l_partkey"], {"sq": "q"}, "cnt",
    )
    j = hash_join(li, s, on="l_partkey")

    def keep(t: pa.Table) -> pa.Table:
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        cnt = t["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
        sq = t["sq"].to_numpy(zero_copy_only=False)
        m = 5.0 * qty * cnt < sq
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
        return pa.table({"revenue": [float(price.sum())], "n_rows": [int(m.sum())]})

    parts = j.map_batches(keep, batch_format="pyarrow").to_pandas()
    out = pd.DataFrame({
        "revenue": [_rd(float(parts["revenue"].sum()), 2)],
        "n_rows": [int(parts["n_rows"].sum())],
    })
    return _i64(out, ["n_rows"])


SQL_SMALL_QUANTITY_REVENUE = """
WITH s AS (
  SELECT l_partkey, COUNT(*) AS cnt, SUM(l_quantity) AS sq
  FROM lineitem GROUP BY 1)
SELECT ROUND(SUM(l.l_extendedprice), 2) AS revenue, COUNT(*) AS n_rows
FROM lineitem l JOIN s ON l.l_partkey = s.l_partkey
WHERE 5 * l.l_quantity * s.cnt < s.sq
"""


def q_rfm_segments(sf_dir: str) -> pd.DataFrame:
    """RFM customer segmentation (recency / frequency / monetary quintiles)
    — the classic marketing cube, built distributed: ONE bucketed reduce
    collapses purchases to per-user (last_us, freq, monetary-cents) rows;
    each metric then gets an EXACT global NTILE(5) via the distributed
    row-number construction (``functions/rank.py``), and the three ranked
    user tables re-join on the user key.  Monetary is summed in integer
    cents so rank order is bit-stable; all tile orders carry the user id as
    tie-break (SQL mirrors the same ORDER BY)."""
    from ...functions.rank import global_row_number, ntile_of
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts", "value"],
            filter=pads.field("event_type") == "purchase")

    def part(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0), ndigits=0, round_mode="half_towards_infinity"), pa.int64())
        g = pa.table({"user_id": t["user_id"], "us": us, "c": cents}).group_by(
            ["user_id"]).aggregate([("us", "max"), ("c", "sum"), ([], "count_all")])
        return pa.table({"user_id": g["user_id"], "last_us": g["us_max"],
                         "mon_c": g["c_sum"], "freq": pc.cast(g["count_all"], pa.int64())})

    users = bucketed_group_reduce(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"],
        lambda df: df.groupby("user_id", as_index=False).agg(
            last_us=("last_us", "max"), mon_c=("mon_c", "sum"), freq=("freq", "sum")),
    ).materialize()

    n_users = users.count()

    # ALL THREE metrics rank in ONE global_row_number pass: melt to
    # (user, metric, value) and rank on the packed key metric·2⁵⁵ + value —
    # 2⁵⁵ exceeds any metric's value range, so rows order by (metric, value)
    # and each metric occupies one contiguous rn span of exactly n_users,
    # making the per-metric rank rn − metric·n_users.  One sort exchange
    # instead of three (each with its own sampling + counting pre-pass).
    C = 1 << 55

    def melt(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks()
        n = t.num_rows
        out_uid, out_metric, out_packed = [], [], []
        for mid, key in enumerate(["last_us", "freq", "mon_c"]):
            v = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
            out_uid.append(uid)
            out_metric.append(pa.nulls(n, pa.int64()).fill_null(mid))
            out_packed.append(pa.array(mid * C + v))
        return pa.table({"user_id": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_uid]),
                         "metric": pa.concat_arrays(out_metric),
                         "packed": pa.concat_arrays(out_packed)})

    melted = users.map_batches(melt, batch_format="pyarrow", zero_copy_batch=True)
    ranked, _total = global_row_number(melted, "packed", ["user_id"])

    def to_tile(t: pa.Table) -> pa.Table:
        rn = t["rn"].to_numpy(zero_copy_only=False)
        mid = t["metric"].to_numpy(zero_copy_only=False)
        local = rn - mid * n_users
        return pa.table({"user_id": t["user_id"], "metric": t["metric"],
                         "tile": pa.array(ntile_of(local, n_users, 5))})

    tagged = ranked.map_batches(to_tile, batch_format="pyarrow", zero_copy_batch=True)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        w = df.pivot_table(index="user_id", columns="metric", values="tile",
                           aggfunc="first").reset_index()
        g = w.groupby([0, 1, 2], as_index=False).size()
        return g.rename(columns={0: "r_tile", 1: "f_tile", 2: "m_tile", "size": "n"})

    cells = bucketed_group_reduce(tagged, ["user_id"], fold)
    out = grouped_sums(cells, ["r_tile", "f_tile", "m_tile"], {"n": "n"},
                       reduce="driver").to_pandas()
    return _i64(out, ["r_tile", "f_tile", "m_tile", "n"])


SQL_RFM_SEGMENTS = """
WITH p AS (
  SELECT user_id, MAX(EPOCH_US(ts)) AS last_us, COUNT(*) AS freq,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS mon_c
  FROM events WHERE event_type = 'purchase' GROUP BY 1),
r AS (
  SELECT user_id,
         NTILE(5) OVER (ORDER BY last_us, user_id) AS r_tile,
         NTILE(5) OVER (ORDER BY freq, user_id) AS f_tile,
         NTILE(5) OVER (ORDER BY mon_c, user_id) AS m_tile
  FROM p)
SELECT r_tile, f_tile, m_tile, COUNT(*) AS n
FROM r GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def q_frequent_triples(sf_dir: str) -> pd.DataFrame:
    """A-priori frequent-itemset mining, 3-itemsets with support ≥ 2:
    frequent pairs first (grouped reduce over per-order pair combiners),
    then the downward-closure prune — the packed frequent-pair key set
    broadcasts once and per-order triple generation keeps a candidate only
    if ALL THREE sub-pairs are frequent — so the triple blow-up is bounded
    by the (tiny) frequent-pair structure, not order-width³.  The SQL
    oracle runs the unpruned 3-way self-join; results must agree exactly."""
    import itertools

    import ray

    from ...functions.relational import bucketed_group_reduce

    from .graph_edges import copurchase_edges_ds

    SUPPORT = 2
    ds = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    # pair supports come from the shared once-per-sf-dir edge artifact
    pairs = copurchase_edges_ds(sf_dir).rename_columns(
        {"part_a": "a", "part_b": "b", "c": "n"})
    freq = pairs.filter(expr=f"n >= {SUPPORT}").to_pandas()
    M = 1 << 32  # part keys < 2³², so a·M + b is collision-free
    fp = np.sort((freq["a"].to_numpy(dtype=np.int64) * M + freq["b"].to_numpy(dtype=np.int64)))
    fparts = np.unique(np.concatenate([freq["a"].to_numpy(np.int64),
                                       freq["b"].to_numpy(np.int64)]))
    fp_ref = ray.put((fp, fparts))

    def triple_partial(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        keys, fps = _ray.get(fp_ref) if not isinstance(fp_ref, tuple) else fp_ref
        df = df.drop_duplicates().sort_values(["l_orderkey", "l_partkey"])
        # downward closure, vectorized: a triple's items must each sit in
        # some frequent pair — drop non-member rows and then every order
        # left with < 3 rows BEFORE the per-order loop
        pk_all = df["l_partkey"].to_numpy(np.int64)
        if len(fps):
            ix = np.searchsorted(fps, pk_all)
            ix[ix == len(fps)] = 0
            df = df[fps[ix] == pk_all]
        else:
            df = df.iloc[:0]
        df = df[df.groupby("l_orderkey")["l_partkey"].transform("size") >= 3]
        out = []
        for _, g in df.groupby("l_orderkey"):
            p = g["l_partkey"].to_numpy(dtype=np.int64)
            if len(p) < 3:
                continue
            # prune items not in any frequent pair within this order first
            ii, jj = np.triu_indices(len(p), k=1)
            pk = p[ii] * M + p[jj]
            ok = np.isin(pk, keys, assume_unique=False)
            if ok.sum() < 3:
                continue
            okset = set(pk[ok].tolist())
            for x, y, z in itertools.combinations(np.unique(p).tolist(), 3):
                if x * M + y in okset and x * M + z in okset and y * M + z in okset:
                    out.append((x, y, z))
        if not out:
            return pd.DataFrame({"p_a": pd.Series([], dtype="int64"),
                                 "p_b": pd.Series([], dtype="int64"),
                                 "p_c": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        t = pd.DataFrame(out, columns=["p_a", "p_b", "p_c"])
        return t.groupby(["p_a", "p_b", "p_c"], as_index=False).size().rename(columns={"size": "n"})

    tri = grouped_sums(
        bucketed_group_reduce(ds, ["l_orderkey"], triple_partial),
        ["p_a", "p_b", "p_c"], {"n": "n"},
    )
    out = tri.filter(expr=f"n >= {SUPPORT}").to_pandas()
    if out.empty:  # sparse catalogs can have no support-2 triple at all
        out = pd.DataFrame({c: pd.Series([], dtype="int64")
                            for c in ["p_a", "p_b", "p_c", "n"]})
    out = out.sort_values(["p_a", "p_b", "p_c"], ignore_index=True)
    return _i64(out, ["p_a", "p_b", "p_c", "n"])


SQL_FREQUENT_TRIPLES = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
t AS (
  SELECT a.l_partkey AS p_a, b.l_partkey AS p_b, c.l_partkey AS p_c, COUNT(*) AS n
  FROM d a
  JOIN d b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  JOIN d c ON b.l_orderkey = c.l_orderkey AND b.l_partkey < c.l_partkey
  GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2)
SELECT p_a, p_b, p_c, n FROM t ORDER BY 1, 2, 3
"""


def q_bounce_rate(sf_dir: str) -> pd.DataFrame:
    """Session-quality rollup over the gap-sessionizer (ST6 watermark
    analogue): bounce = single-event session.  Sessions stream out of
    ``windows.sessionize`` and collapse to scalar partials per batch — the
    driver sees four numbers."""
    from ...functions.windows import sessionize

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id"])
    sess = sessionize(ds, gap_seconds=1800.0)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "sessions": [len(df)],
            "bounces": [int((df["n_events"] == 1).sum())],
            "events": [int(df["n_events"].sum())],
        })

    p = sess.map_batches(part, batch_format="pandas").to_pandas()
    sessions, bounces, events = int(p["sessions"].sum()), int(p["bounces"].sum()), int(p["events"].sum())
    out = pd.DataFrame({
        "n_sessions": [sessions], "n_bounces": [bounces],
        "bounce_rate": [_rd(bounces / sessions, 6)],
        "avg_events": [_rd(events / sessions, 6)],
    })
    return _i64(out, ["n_sessions", "n_bounces"])


SQL_BOUNCE_RATE = """
WITH ordered AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800.0
              THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM ordered
), agg AS (SELECT user_id, session_id, COUNT(*) AS n_events FROM sess GROUP BY 1, 2)
SELECT COUNT(*) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
       ROUND(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 6) AS bounce_rate,
       ROUND(SUM(n_events) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_events
FROM agg
"""


def q_centroid_separation(sf_dir: str) -> pd.DataFrame:
    """Cluster-separation diagnostic (silhouette-lite): per label, the
    average euclidean distance to the OWN centroid vs the NEAREST other
    centroid.  Two streaming passes: (1) per-batch (label, Σx, n) scatter
    partials → k·d-float centroid matrix on the driver; (2) centroids
    broadcast, one gemm per batch gives every point's distance to all k
    centroids, per-label scalar partials reduce.  Points never shuffle."""
    ds = _t(sf_dir, "embeddings", ["vec_id", "label", "embedding"])

    def cent_partial(t: pa.Table) -> pa.Table:
        arr = t["embedding"].combine_chunks() if isinstance(t["embedding"], pa.ChunkedArray) else t["embedding"]
        mat = np.asarray(arr.flatten(), dtype=np.float64).reshape(len(t), -1)
        labels = np.asarray(t["label"].to_numpy(zero_copy_only=False), dtype=np.int64)
        uniq, codes = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), mat.shape[1]))
        np.add.at(sums, codes, mat)
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table({"label": pa.array(uniq), "n": pa.array(n),
                         "sums": pa.array(list(sums), type=pa.list_(pa.float64()))})

    parts = ds.map_batches(cent_partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    labels = sorted(parts["label"].unique())
    lab_idx = {l: i for i, l in enumerate(labels)}
    d = len(parts["sums"].iloc[0])
    sums = np.zeros((len(labels), d))
    cnt = np.zeros(len(labels), dtype=np.int64)
    for _, r in parts.iterrows():
        sums[lab_idx[r["label"]]] += np.asarray(r["sums"])
        cnt[lab_idx[r["label"]]] += r["n"]
    cent = sums / cnt[:, None]
    import ray

    cent_ref = ray.put((np.asarray(labels, dtype=np.int64), cent))

    def dist_partial(t: pa.Table, *, ref=cent_ref) -> pa.Table:
        labs, C = ray.get(ref) if not isinstance(ref, tuple) else ref
        arr = t["embedding"].combine_chunks() if isinstance(t["embedding"], pa.ChunkedArray) else t["embedding"]
        X = np.asarray(arr.flatten(), dtype=np.float64).reshape(len(t), -1)
        y = np.asarray(t["label"].to_numpy(zero_copy_only=False), dtype=np.int64)
        d2 = np.maximum(
            (X * X).sum(1)[:, None] + (C * C).sum(1)[None, :] - 2.0 * (X @ C.T), 0.0)
        dist = np.sqrt(d2)
        own_col = np.searchsorted(labs, y)
        d_own = dist[np.arange(len(X)), own_col]
        masked = dist.copy()
        masked[np.arange(len(X)), own_col] = np.inf
        d_other = masked.min(axis=1)
        g = pd.DataFrame({"label": y, "d_own": d_own, "d_other": d_other}).groupby(
            "label", as_index=False).agg(n=("d_own", "size"), so=("d_own", "sum"),
                                         sn=("d_other", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = ds.map_batches(dist_partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = agg.groupby("label", as_index=False).agg(
        n=("n", "sum"), so=("so", "sum"), sn=("sn", "sum"))
    out["avg_own"] = (out["so"] / out["n"]).pipe(_rd)
    out["avg_other"] = (out["sn"] / out["n"]).pipe(_rd)
    out = out.drop(columns=["so", "sn"]).sort_values("label", ignore_index=True)
    return _i64(out, ["label", "n"])


SQL_CENTROID_SEPARATION = """
WITH e AS (
  SELECT vec_id, CAST(label AS BIGINT) AS lab, CAST(embedding AS DOUBLE[]) AS emb
  FROM embeddings),
ex AS (SELECT lab, i AS dim, emb[i] AS v
       FROM e, unnest(generate_series(1, len(emb))) AS t(i)),
cd AS (SELECT lab, dim, AVG(v) AS c FROM ex GROUP BY 1, 2),
cent AS (SELECT lab, list(c ORDER BY dim) AS cvec FROM cd GROUP BY 1),
dists AS (
  SELECT p.vec_id, p.lab, c.lab AS clab, list_distance(p.emb, c.cvec) AS dd
  FROM e p CROSS JOIN cent c),
per AS (
  SELECT vec_id, lab,
         MIN(dd) FILTER (clab = lab) AS d_own,
         MIN(dd) FILTER (clab <> lab) AS d_other
  FROM dists GROUP BY 1, 2)
SELECT lab AS label, COUNT(*) AS n,
       ROUND(AVG(d_own), 6) AS avg_own, ROUND(AVG(d_other), 6) AS avg_other
FROM per GROUP BY 1 ORDER BY 1
"""


def ensure_curation_parquet(sf_dir: str) -> str:
    """Materialize the planted-redundancy curation corpus
    (sources/curation.py) in the shared oracle-artifact dir."""
    import os as _os

    from ...sources.curation import build_curation_table

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "curation.parquet"),
        lambda: build_curation_table(
            pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"])
        ),
    )


def q_curation_pipeline(sf_dir: str) -> pd.DataFrame:
    """END-TO-END curation pipeline (pipelines/curate.py): normalize →
    quality gate → content dedup → langid → Hive-partitioned sink, run for
    real (files written, then summarized from the run result) against the
    planted-redundancy corpus; the oracle replays every stage in SQL over
    the same parquet.  This checks the COMPOSITION — stage order, gate
    arithmetic, keep-min dedup semantics — not just each operator alone."""
    import os as _os
    import shutil as _shutil

    from ..curate import CurateConfig, run_curate

    src = ensure_curation_parquet(sf_dir)
    out_dir = _os.path.join(_corpus_dir(sf_dir), "curate_out")
    _shutil.rmtree(out_dir, ignore_errors=True)  # fresh deterministic run
    res = run_curate(CurateConfig(input_path=src, output_dir=out_dir))
    out = pd.DataFrame(
        [(lang, n, w) for lang, (n, w) in sorted(res.per_lang.items())],
        columns=["lang_guess", "n_docs", "total_words"],
    )
    return _i64(out, ["n_docs", "total_words"])


SQL_CURATION_PIPELINE = f"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS ntext
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/curation.parquet')),
q AS (
  SELECT doc_id, ntext,
         len(string_split(ntext, ' ')) AS n_words,
         len(regexp_extract_all(ntext, '{STOPWORD_PATTERN}')) AS hits
  FROM norm),
f AS (SELECT * FROM q WHERE n_words >= 5 AND hits * 2 <= n_words * 1),
k AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(ntext) ORDER BY doc_id) AS rn FROM f)
  WHERE rn = 1),
l AS (
  SELECT CASE WHEN len(regexp_extract_all(ntext, '\\b(?:spark|query|vector)\\b'))
                   >= len(regexp_extract_all(ntext, '\\b(?:the|a|of)\\b'))
              THEN 'code' ELSE 'en' END AS lang_guess,
         n_words
  FROM k)
SELECT lang_guess, COUNT(*) AS n_docs, CAST(SUM(n_words) AS BIGINT) AS total_words
FROM l GROUP BY 1 ORDER BY 1
"""


def q_orders_growth_wow(sf_dir: str) -> pd.DataFrame:
    """Week-over-week growth report: one distributed weekly count, then the
    LAG/pct-change window on the |weeks|-bounded series (driver arithmetic,
    mirroring SQL ``LAG`` over present weeks)."""
    ds = _t(sf_dir, "orders", ["o_orderdate"])

    def wk(t: pa.Table) -> pa.Table:
        micros = pc.cast(t["o_orderdate"], pa.int64())
        return pa.table({"week_id": pc.divide(micros, pa.scalar(604_800_000_000, pa.int64()))})

    agg = grouped_sums(
        ds.map_batches(wk, batch_format="pyarrow", zero_copy_batch=True),
        ["week_id"], {}, "n",
    ).to_pandas().sort_values("week_id", ignore_index=True)
    prev = agg["n"].shift(1)
    agg["growth"] = ((agg["n"] - prev) / prev).pipe(_rd)
    return _i64(agg, ["week_id", "n"])


SQL_ORDERS_GROWTH_WOW = """
WITH w AS (
  SELECT EPOCH_US(o_orderdate) // 604800000000 AS week_id, COUNT(*) AS n
  FROM orders GROUP BY 1)
SELECT week_id, n,
       ROUND((n - LAG(n) OVER (ORDER BY week_id)) /
             CAST(LAG(n) OVER (ORDER BY week_id) AS DOUBLE), 6) AS growth
FROM w ORDER BY week_id
"""


def q_session_depth_histogram(sf_dir: str) -> pd.DataFrame:
    """Distribution of session depths (events per gap-session): sessions
    stream out of the sessionizer and collapse through one tiny grouped
    count on the depth."""
    from ...functions.windows import sessionize

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id"])
    sess = sessionize(ds, gap_seconds=1800.0)
    out = grouped_sums(
        sess.select_columns(["n_events"]), ["n_events"], {}, "n_sessions", reduce="driver"
    ).to_pandas()
    return _i64(out.sort_values("n_events", ignore_index=True), ["n_events", "n_sessions"])


SQL_SESSION_DEPTH_HISTOGRAM = """
WITH ordered AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800.0
              THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM ordered
), agg AS (SELECT user_id, session_id, COUNT(*) AS n_events FROM sess GROUP BY 1, 2)
SELECT n_events, COUNT(*) AS n_sessions FROM agg GROUP BY 1 ORDER BY 1
"""


def q_zipf_slope(sf_dir: str) -> pd.DataFrame:
    """Zipf exponent of the corpus token distribution: distributed term
    frequencies (per-batch postings combiner → one grouped exchange),
    deterministic top-500 by (freq desc, term), then the log-log OLS slope
    over the 500-point series on the driver — the standard corpus-health
    statistic (natural text ≈ −1)."""
    from ...functions.search import tokenize_terms

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    flat = docs.map_batches(
        lambda t: tokenize_terms(t, "text", "doc_id").select(["term", "tf"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    tc = grouped_sums(flat, ["term"], {"f": "tf"})
    top = topk(tc, ["f", "term"], [True, False], 500).to_pandas()
    top = top.sort_values(["f", "term"], ascending=[False, True], ignore_index=True)
    x = np.log(np.arange(1, len(top) + 1, dtype=np.float64))
    y = np.log(top["f"].to_numpy(dtype=np.float64))
    xc, yc = x - x.mean(), y - y.mean()
    slope = float((xc * yc).sum() / (xc * xc).sum())
    return pd.DataFrame({"n_ranks": pd.Series([len(top)], dtype="int64"),
                         "zipf_slope": [_rd(slope, 6)]})


SQL_ZIPF_SLOPE = """
WITH toks AS (
  SELECT UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS term FROM documents),
tc AS (SELECT term, COUNT(*) AS f FROM toks WHERE term <> '' GROUP BY 1),
top AS (
  SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, term) AS r FROM tc
  QUALIFY r <= 500)
SELECT COUNT(*) AS n_ranks, ROUND(regr_slope(ln(f), ln(r)), 6) AS zipf_slope FROM top
"""


def q_revenue_pareto(sf_dir: str) -> pd.DataFrame:
    """Pareto 80/20 check: the share of total order revenue held by the
    top-20% customers.  Fully distributed and exact: per-customer revenue
    in integer cents (one exchange), revenue-descending global rank via the
    MPP row-number construction (``functions/rank.py`` — negate the cents
    key), then scalar partials for the top-k sum; the driver folds four
    numbers.  Tie-break by custkey matches the SQL window exactly."""
    from ...functions.rank import global_row_number

    o = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0), ndigits=0, round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"o_custkey": t["o_custkey"], "rev_c": c})

    per_cust = grouped_sums(
        o.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        ["o_custkey"], {"rev_c": "rev_c"},
    ).map_batches(
        lambda t: t.append_column("neg_rev", pc.negate(t["rev_c"])),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()

    ranked, total = global_row_number(per_cust, "neg_rev", ["o_custkey"])
    k = int(np.ceil(0.2 * total))

    def part(t: pa.Table, *, k=k) -> pa.Table:
        rn = t["rn"].to_numpy(zero_copy_only=False)
        rev = t["rev_c"].to_numpy(zero_copy_only=False)
        return pa.table({"top_c": [int(rev[rn <= k].sum())], "all_c": [int(rev.sum())]})

    p = ranked.map_batches(part, batch_format="pyarrow").to_pandas()
    top_c, all_c = int(p["top_c"].sum()), int(p["all_c"].sum())
    return pd.DataFrame({
        "n_customers": pd.Series([total], dtype="int64"),
        "top_n": pd.Series([k], dtype="int64"),
        "top_share": [_rd(top_c / all_c, 6)],
    })


SQL_REVENUE_PARETO = """
WITH rc AS (
  SELECT o_custkey, SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_c
  FROM orders GROUP BY 1),
r AS (
  SELECT rev_c, ROW_NUMBER() OVER (ORDER BY rev_c DESC, o_custkey) AS rn,
         COUNT(*) OVER () AS total
  FROM rc)
SELECT MAX(total) AS n_customers,
       CAST(CEIL(0.2 * MAX(total)) AS BIGINT) AS top_n,
       ROUND(SUM(CASE WHEN rn <= CEIL(0.2 * total) THEN rev_c ELSE 0 END)
             / CAST(SUM(rev_c) AS DOUBLE), 6) AS top_share
FROM r
"""


def q_rolling_active_users(sf_dir: str) -> pd.DataFrame:
    """EXACT rolling 7-day distinct active users per day — the sliding
    DISTINCT no window function computes cheaply.  Trick: a user active on
    day d is "active" for every window ending in [d, d+6], so each user's
    merged activity intervals become ±1 diff events; the pipeline is
    (user, day) distinct partials → per-user interval merge (bucketed
    reduce; each user's days sort locally) → day-keyed diff-sum exchange →
    one cumulative sum over the |days|-bounded series on the driver.
    DISTINCT rows never cross a window boundary and no per-window set is
    ever materialized."""
    from ...functions.relational import bucketed_group_reduce

    W = 7
    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def part(t: pa.Table) -> pa.Table:
        micros = pc.cast(t["ts"], pa.int64())
        day = pc.divide(micros, pa.scalar(86_400_000_000, pa.int64()))
        g = pa.table({"user_id": t["user_id"], "d": day}).group_by(["user_id", "d"]).aggregate([])
        return g

    pairs = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)

    def to_diffs(df: pd.DataFrame) -> pd.DataFrame:
        # per user: merge [d, d+W-1] cover intervals, emit ±1 at the edges
        out_d, out_v = [], []
        for _, g in df.groupby("user_id"):
            days = np.unique(g["d"].to_numpy(dtype=np.int64))
            start = days[0]
            prev = days[0]
            for d in days[1:]:
                if d > prev + W - 1:  # gap: window runs [start, prev+W-1]
                    out_d += [start, prev + W]
                    out_v += [1, -1]
                    start = d
                prev = d
            out_d += [start, prev + W]
            out_v += [1, -1]
        return pd.DataFrame({"day_id": out_d, "v": out_v})

    diffs = bucketed_group_reduce(pairs, ["user_id"], to_diffs)
    agg = grouped_sums(diffs, ["day_id"], {"v": "v"}).to_pandas().sort_values(
        "day_id", ignore_index=True)
    days = np.arange(agg["day_id"].min(), agg["day_id"].max() + 1, dtype=np.int64)
    v = np.zeros(len(days), dtype=np.int64)
    v[agg["day_id"].to_numpy(dtype=np.int64) - days[0]] = agg["v"].to_numpy(dtype=np.int64)
    run = np.cumsum(v)
    keep = run > 0  # SQL GROUP BY only yields days with ≥1 active user
    out = pd.DataFrame({"day_id": days[keep], "active_users": run[keep]})
    return _i64(out.reset_index(drop=True), ["day_id", "active_users"])


SQL_ROLLING_ACTIVE_USERS = """
WITH days AS (
  SELECT DISTINCT user_id, EPOCH_US(ts) // 86400000000 AS d FROM events),
w AS (
  SELECT DISTINCT user_id, d + i AS day_id
  FROM days, UNNEST(range(0, 7)) AS t(i))
SELECT day_id, COUNT(DISTINCT user_id) AS active_users
FROM w GROUP BY 1 ORDER BY 1
"""


def q_churn_counts(sf_dir: str) -> pd.DataFrame:
    """Churn report: users whose LAST event is >30 days before the corpus
    high-watermark, per event source cohort (their FIRST event's type).
    One scan produces both per-user extremes (min/max + arg-min type via
    packed (ts, type-code) minimization); the watermark is a scalar fold."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_type"])
    types = sorted(grouped_sums(
        _t(sf_dir, "events", ["event_type"]), ["event_type"], {}, "c").to_pandas()["event_type"])
    code_of = {t: i for i, t in enumerate(types)}

    def part(t: pa.Table, *, codes=code_of) -> pa.Table:
        micros = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        code = t["event_type"].to_pandas().map(codes).to_numpy(dtype=np.int64)
        # pack (ts, tie-break code) so min() is the SQL arg-min with
        # deterministic type tie-break on equal timestamps
        packed = micros * 8 + code  # |types| ≤ 8
        df = pd.DataFrame({"user_id": t["user_id"].to_numpy(zero_copy_only=False),
                           "first_p": packed, "last_us": micros})
        g = df.groupby("user_id", as_index=False).agg(
            first_p=("first_p", "min"), last_us=("last_us", "max"))
        return pa.Table.from_pandas(g, preserve_index=False)

    per_user = bucketed_group_reduce(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"],
        lambda df: df.groupby("user_id", as_index=False).agg(
            first_p=("first_p", "min"), last_us=("last_us", "max")),
    ).materialize()
    watermark = int(per_user.max("last_us"))
    cutoff = watermark - 30 * 86_400_000_000

    def fold(df: pd.DataFrame, *, types=types) -> pd.DataFrame:
        first_type = pd.Series([types[c] for c in (df["first_p"] % 8)], index=df.index)
        churned = df["last_us"] < cutoff
        out = pd.DataFrame({"first_type": first_type, "churned": churned.astype(np.int64)})
        return out.groupby("first_type", as_index=False).agg(
            n_users=("churned", "size"), n_churned=("churned", "sum"))

    agg = per_user.map_batches(fold, batch_format="pandas").to_pandas()
    out = agg.groupby("first_type", as_index=False).agg(
        n_users=("n_users", "sum"), n_churned=("n_churned", "sum"))
    out["churn_rate"] = (out["n_churned"] / out["n_users"]).pipe(_rd)
    return _i64(out.sort_values("first_type", ignore_index=True), ["n_users", "n_churned"])


SQL_CHURN_COUNTS = """
WITH u AS (
  SELECT user_id,
         MIN(EPOCH_US(ts) * 8 + tc) AS first_p,
         MAX(EPOCH_US(ts)) AS last_us
  FROM (SELECT *, CAST(dense_rank() OVER (ORDER BY event_type) - 1 AS BIGINT) AS tc
        FROM events)
  GROUP BY 1),
wm AS (SELECT MAX(last_us) AS watermark FROM u),
t AS (SELECT DISTINCT event_type,
             CAST(dense_rank() OVER (ORDER BY event_type) - 1 AS BIGINT) AS tc
      FROM events)
SELECT t.event_type AS first_type,
       COUNT(*) AS n_users,
       CAST(SUM(CASE WHEN u.last_us < wm.watermark - 30 * 86400000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
       ROUND(SUM(CASE WHEN u.last_us < wm.watermark - 30 * 86400000000 THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS churn_rate
FROM u CROSS JOIN wm JOIN t ON u.first_p % 8 = t.tc
GROUP BY 1 ORDER BY 1
"""


def q_skyline_orders(sf_dir: str) -> pd.DataFrame:
    """2-D skyline (Pareto frontier): orders not dominated on
    (totalprice MAX, orderdate MIN) — dominance = other order has ≥ price
    AND ≤ date with at least one strict.  Distributed shape: each block
    computes its LOCAL skyline (sort by price desc, keep rows that strictly
    improve the running min date — vectorized cummin), so only per-block
    frontier rows reach the driver; the frontier-of-frontiers is computed
    the same way over that small union (skyline(A∪B) ⊆ skyline(A)∪skyline(B),
    the classic divide-and-conquer prune)."""
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderdate"])

    def skyline_core(c: pd.DataFrame) -> pd.DataFrame:
        # group equal prices: a row survives iff its date is strictly below
        # the min date over all STRICTLY higher prices, and is the min date
        # within its own price class (ties on both dims are all kept only if
        # identical rows — dominance requires one strict inequality)
        c = c.sort_values(["price_c", "date_us"], ascending=[False, True], kind="stable")
        price = c["price_c"].to_numpy()
        date = c["date_us"].to_numpy()
        if not len(c):
            return c
        run_min = np.minimum.accumulate(date)
        # min date among strictly-higher-price rows: shift run_min across
        # price-class boundaries
        new_class = np.r_[True, price[1:] != price[:-1]]
        class_id = np.cumsum(new_class) - 1
        # run_min at the END of each class, then per-row min over previous classes
        last_idx_of_class = np.r_[np.nonzero(new_class)[0][1:] - 1, len(price) - 1]
        class_min = run_min[last_idx_of_class]
        prev_class_min = np.r_[np.int64(np.iinfo(np.int64).max), class_min[:-1]]
        prior_min = prev_class_min[class_id]  # min date over strictly higher prices
        # within the class, min date wins; equal (price, date) duplicates all survive
        class_date_min = c.groupby(class_id)["date_us"].transform("min").to_numpy()
        keep = (date < prior_min) & (date == class_date_min)
        return c[keep]

    def local_skyline(df: pd.DataFrame) -> pd.DataFrame:
        return skyline_core(pd.DataFrame({
            "o_orderkey": df["o_orderkey"],
            "price_c": (df["o_totalprice"] * 100).round().astype(np.int64),
            "date_us": df["o_orderdate"].astype("int64"),
        }))

    parts = ds.map_batches(local_skyline, batch_format="pandas").to_pandas()
    sky = skyline_core(parts)
    out = pd.DataFrame({
        "o_orderkey": sky["o_orderkey"].to_numpy(),
        "o_totalprice": (sky["price_c"] / 100.0).pipe(_rd, 2),
        "o_orderdate": pd.to_datetime(sky["date_us"], unit="us"),
    }).sort_values("o_orderkey", ignore_index=True)
    return _i64(out, ["o_orderkey"])


SQL_SKYLINE_ORDERS = """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice, o_orderdate
FROM orders o
WHERE NOT EXISTS (
  SELECT 1 FROM orders x
  WHERE x.o_totalprice >= o.o_totalprice AND x.o_orderdate <= o.o_orderdate
    AND (x.o_totalprice > o.o_totalprice OR x.o_orderdate < o.o_orderdate))
ORDER BY o_orderkey
"""


def q_longest_streaks(sf_dir: str) -> pd.DataFrame:
    """Gaps-and-islands: each user's longest run of CONSECUTIVE active
    days, global top-10 (streak desc, user asc).  Hash exchange on the
    user; inside a bucket the island lengths fall out of one vectorized
    diff over the sorted distinct days (no d − ROW_NUMBER() trick needed
    off-SQL); only (user, best_streak) partials leave the bucket."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def part(t: pa.Table) -> pa.Table:
        micros = pc.cast(t["ts"], pa.int64())
        day = pc.divide(micros, pa.scalar(86_400_000_000, pa.int64()))
        return pa.table({"user_id": t["user_id"], "d": day}).group_by(
            ["user_id", "d"]).aggregate([])

    def best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates().sort_values(["user_id", "d"])
        u = df["user_id"].to_numpy()
        d = df["d"].to_numpy(dtype=np.int64)
        brk = np.r_[True, (u[1:] != u[:-1]) | (d[1:] != d[:-1] + 1)]
        isl = np.cumsum(brk) - 1
        g = pd.DataFrame({"user_id": u, "isl": isl}).groupby(
            ["user_id", "isl"], as_index=False).size()
        return g.groupby("user_id", as_index=False)["size"].max().rename(
            columns={"size": "streak"})

    per_user = bucketed_group_reduce(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"], best,
    )

    def neg(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"],
                         "streak": pc.cast(t["streak"], pa.int64())})

    out = topk(per_user.map_batches(neg, batch_format="pyarrow"),
               ["streak", "user_id"], [True, False], 10).to_pandas()
    return _i64(out, ["user_id", "streak"])


SQL_LONGEST_STREAKS = """
WITH days AS (
  SELECT DISTINCT user_id, EPOCH_US(ts) // 86400000000 AS d FROM events),
isl AS (
  SELECT user_id, d,
         d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS grp
  FROM days),
runs AS (SELECT user_id, COUNT(*) AS len FROM isl GROUP BY user_id, grp),
best AS (SELECT user_id, MAX(len) AS streak FROM runs GROUP BY 1)
SELECT user_id, streak FROM best
ORDER BY streak DESC, user_id LIMIT 10
"""


def q_custdist(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q13 shape (customer distribution): histogram of per-customer
    order counts INCLUDING zero-order customers — per-custkey pre-agg, LEFT
    OUTER hash join against the full customer list, then a tiny grouped
    count on the count."""
    from ...functions.relational import hash_join

    cust = _t(sf_dir, "customer", ["c_custkey"])
    per_cust = grouped_sums(_t(sf_dir, "orders", ["o_custkey"]), ["o_custkey"], {}, "__n")
    j = hash_join(cust, per_cust, on="c_custkey", right_on="o_custkey", how="left_outer")
    counts = j.map_batches(
        lambda t: pa.table({"c_count": pc.fill_null(pc.cast(t["__n"], pa.int64()), 0)}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    out = grouped_sums(counts, ["c_count"], {}, "custdist", reduce="driver").to_pandas()
    out = out.sort_values(["custdist", "c_count"], ascending=[False, False], ignore_index=True)
    return _i64(out, ["c_count", "custdist"])


SQL_CUSTDIST = """
WITH c AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY 1)
SELECT c_count, COUNT(*) AS custdist
FROM c GROUP BY 1
ORDER BY custdist DESC, c_count DESC
"""


def q_total_active_time(sf_dir: str) -> pd.DataFrame:
    """Total in-session active time per user (Σ session span over
    30-min-gap sessions), global top-10 — one user-keyed exchange; the
    session segmentation and span sums are one vectorized diff inside the
    bucket; only (user, active_s) partials leave it."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def spans(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"])
        u = df["user_id"].to_numpy()
        us = df["ts"].astype("int64").to_numpy()
        new = np.r_[True, (u[1:] != u[:-1]) | (us[1:] - us[:-1] > 1_800_000_000)]
        sess = np.cumsum(new) - 1
        g = pd.DataFrame({"user_id": u, "sess": sess, "us": us}).groupby(
            ["user_id", "sess"], as_index=False).agg(lo=("us", "min"), hi=("us", "max"))
        g["span"] = g["hi"] - g["lo"]
        return g.groupby("user_id", as_index=False)["span"].sum()

    per_user = bucketed_group_reduce(ds, ["user_id"], spans)

    def to_secs(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"],
                         "active_s": pc.divide(pc.cast(t["span"], pa.int64()),
                                               pa.scalar(1_000_000, pa.int64()))})

    out = topk(per_user.map_batches(to_secs, batch_format="pyarrow"),
               ["active_s", "user_id"], [True, False], 10).to_pandas()
    return _i64(out, ["user_id", "active_s"])


SQL_TOTAL_ACTIVE_TIME = """
WITH ordered AS (
  SELECT user_id, ts, EPOCH_US(ts) AS us,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR EPOCH_US(ts) - EPOCH_US(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, us,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
), spans AS (
  SELECT user_id, session_id, MAX(us) - MIN(us) AS span
  FROM sess GROUP BY 1, 2)
SELECT user_id, CAST(SUM(span) // 1000000 AS BIGINT) AS active_s
FROM spans GROUP BY 1
ORDER BY active_s DESC, user_id LIMIT 10
"""


def q_winsorized_mean_per_type(sf_dir: str) -> pd.DataFrame:
    """Robust winsorized mean per group (values clipped to [p5, p95] before
    averaging — the outlier-resistant feature-scaling statistic): derived
    ENTIRELY from the one-pass mergeable cent histogram — quantiles, clip,
    and mean are integer arithmetic over (bin, count), no second scan (the
    SQL oracle scans twice)."""
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
        n = int(c.sum())
        lo = quantile_disc_from_counts(b, c, 0.05)
        hi = quantile_disc_from_counts(b, c, 0.95)
        clipped = np.clip(b, lo, hi)
        wmean = _rd(float((clipped * c).sum()) / n / 100.0, 6)
        rows.append((etype, wmean, n))
    out = pd.DataFrame(rows, columns=["event_type", "wmean", "n"])
    return _i64(out, ["n"])


SQL_WINSORIZED_MEAN_PER_TYPE = """
WITH q AS (
  SELECT event_type,
         CAST(ROUND(quantile_disc(value, 0.05) * 100) AS BIGINT) AS lo,
         CAST(ROUND(quantile_disc(value, 0.95) * 100) AS BIGINT) AS hi
  FROM events GROUP BY 1)
SELECT e.event_type,
       ROUND(SUM(LEAST(GREATEST(CAST(ROUND(value * 100) AS BIGINT), lo), hi))
             / CAST(COUNT(*) AS DOUBLE) / 100.0, 6) AS wmean,
       COUNT(*) AS n
FROM events e JOIN q USING (event_type)
GROUP BY 1 ORDER BY 1
"""


def q_filter_attribution(sf_dir: str) -> pd.DataFrame:
    """Filter-funnel attribution over the curation corpus: which GATE (or
    combination) would drop each document — too-short (bit 1), stopword-
    heavy (bit 2), duplicate-content (bit 4) — as a count per failure
    bitmask.  The dup bit needs global state: the keep-min fingerprint
    reduce runs once, its (output-sized) keeper id set broadcasts back, and
    the mask histogram is then per-batch counters; each gate is attributed
    INDEPENDENTLY (unlike the curate pipeline, which gates sequentially)."""
    import ray

    from ...functions.relational import bucketed_group_reduce
    from ...functions.scrub import normalize_text
    from ...functions.text import md5_hex, n_words, stopword_hits

    src = ensure_curation_parquet(sf_dir)
    ds = rd.read_parquet(src, columns=["doc_id", "text"])

    def fp_partial(t: pa.Table) -> pa.Table:
        norm = normalize_text(t["text"])
        g = pa.table({"fp": md5_hex(norm), "doc_id": t["doc_id"]}).group_by(["fp"]).aggregate(
            [("doc_id", "min")])
        return pa.table({"fp": g["fp"], "keeper": g["doc_id_min"]})

    keepers = bucketed_group_reduce(
        ds.map_batches(fp_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["fp"],
        lambda df: df.groupby("fp", as_index=False)["keeper"].min(),
    ).to_pandas()
    keep_ref = ray.put(np.sort(keepers["keeper"].to_numpy(dtype=np.int64)))

    def masks(t: pa.Table, *, ref=keep_ref) -> pa.Table:
        keep = ray.get(ref) if not isinstance(ref, np.ndarray) else ref
        norm = normalize_text(t["text"])
        nw = pc.cast(n_words(norm), pa.int64()).to_numpy(zero_copy_only=False)
        hits = stopword_hits(norm).to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        m = (nw < 5).astype(np.int64)
        m += 2 * (2 * hits > nw).astype(np.int64)
        m += 4 * (~np.isin(ids, keep)).astype(np.int64)
        u, c = np.unique(m, return_counts=True)
        return pa.table({"fail_mask": pa.array(u), "n": pa.array(c.astype(np.int64))})

    agg = grouped_sums(
        ds.map_batches(masks, batch_format="pyarrow", zero_copy_batch=True),
        ["fail_mask"], {"n": "n"}, reduce="driver",
    ).to_pandas()
    return _i64(agg.sort_values("fail_mask", ignore_index=True), ["fail_mask", "n"])


SQL_FILTER_ATTRIBUTION = f"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/curation.parquet')),
q AS (
  SELECT doc_id, nt, len(string_split(nt, ' ')) AS nw,
         len(regexp_extract_all(nt, '{STOPWORD_PATTERN}')) AS h
  FROM norm),
d AS (
  SELECT *, CASE WHEN ROW_NUMBER() OVER (PARTITION BY md5(nt) ORDER BY doc_id) > 1
                 THEN 1 ELSE 0 END AS dup
  FROM q)
SELECT (CASE WHEN nw < 5 THEN 1 ELSE 0 END)
       + 2 * (CASE WHEN 2 * h > nw THEN 1 ELSE 0 END)
       + 4 * dup AS fail_mask,
       COUNT(*) AS n
FROM d GROUP BY 1 ORDER BY 1
"""


def q_embedding_quantization_error(sf_dir: str) -> pd.DataFrame:
    """Int8 symmetric quantization error audit (the compression every
    large-scale vector store applies): per vector, scale = max|x|, q =
    round(x·127/scale), reconstruction = q·scale/127; report per-label mean
    squared error and mean scale.  Pure per-batch gemm-free numpy over the
    zero-copy matrix view + scalar label partials — nothing shuffles."""
    ds = _t(sf_dir, "embeddings", ["label", "embedding"])

    def part(t: pa.Table) -> pa.Table:
        arr = t["embedding"].combine_chunks() if isinstance(t["embedding"], pa.ChunkedArray) else t["embedding"]
        X = np.asarray(arr.flatten(), dtype=np.float64).reshape(len(t), -1)
        y = np.asarray(t["label"].to_numpy(zero_copy_only=False), dtype=np.int64)
        scale = np.abs(X).max(axis=1)
        safe = np.where(scale == 0, 1.0, scale)
        q = _rd(X * (127.0 / safe[:, None]), 0)
        recon = q * (safe[:, None] / 127.0)
        mse = ((X - recon) ** 2).mean(axis=1)
        df = pd.DataFrame({"label": y, "mse": mse, "scale": scale}).groupby(
            "label", as_index=False).agg(n=("mse", "size"), sm=("mse", "sum"),
                                         ss=("scale", "sum"))
        return pa.Table.from_pandas(df, preserve_index=False)

    agg = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = agg.groupby("label", as_index=False).agg(
        n=("n", "sum"), sm=("sm", "sum"), ss=("ss", "sum"))
    out["mean_mse"] = (out["sm"] / out["n"]).pipe(_rd, 9)
    out["mean_scale"] = (out["ss"] / out["n"]).pipe(_rd)
    out = out.drop(columns=["sm", "ss"]).sort_values("label", ignore_index=True)
    return _i64(out, ["label", "n"])


SQL_EMBEDDING_QUANTIZATION_ERROR = """
WITH e AS (
  SELECT CAST(label AS BIGINT) AS label, CAST(embedding AS DOUBLE[]) AS emb
  FROM embeddings),
s AS (
  SELECT label, emb,
         GREATEST(list_max(list_transform(emb, x -> abs(x))), 0) AS scale
  FROM e),
m AS (
  SELECT label, scale,
         list_sum(list_transform(emb,
             x -> pow(x - ROUND(x * 127.0 / (CASE WHEN scale = 0 THEN 1 ELSE scale END))
                          * (CASE WHEN scale = 0 THEN 1 ELSE scale END) / 127.0, 2)))
           / len(emb) AS mse
  FROM s)
SELECT label, COUNT(*) AS n, ROUND(AVG(mse), 9) AS mean_mse,
       ROUND(AVG(scale), 6) AS mean_scale
FROM m GROUP BY 1 ORDER BY 1
"""


def q_weighted_median_price(sf_dir: str) -> pd.DataFrame:
    """WEIGHTED median (by quantity) of the extended price per return flag —
    the weighted-quantile operator plain SQL lacks, via TWO-PHASE
    refinement (the iterative distributed-quantile construction): a coarse
    $100-bucket weight histogram locates each key's half-weight bucket,
    then a second filtered pass builds the exact cent histogram of ONLY
    that bucket.  Prices are near-unique, so a single-pass cent histogram
    would be ~|rows| on the driver; this keeps driver state at
    keys × coarse-buckets + keys × one-bucket-of-cents.  EXACT — the
    oracle mirrors it with a cumulative-weight window."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice", "l_quantity"]).materialize()
    COARSE = 10_000  # $100 buckets — prices are near-unique, so a raw cent
    # histogram is ~|rows| and must never reach the driver; this two-phase
    # refinement keeps driver state at (keys × coarse buckets), then
    # (keys × cents within ONE bucket)

    def coarse_part(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0), ndigits=0, round_mode="half_towards_infinity"), pa.int64())
        cb = pc.divide(cents, pa.scalar(COARSE, pa.int64()))
        g = pa.table({"k": t["l_returnflag"], "cb": cb,
                      "w": pc.cast(t["l_quantity"], pa.int64())}).group_by(
            ["k", "cb"]).aggregate([("w", "sum")])
        return pa.table({"k": g["k"], "cb": g["cb"], "w": g["w_sum"]})

    coarse = bucketed_group_reduce(
        ds.map_batches(coarse_part, batch_format="pyarrow", zero_copy_batch=True),
        ["k", "cb"],
        lambda df: df.groupby(["k", "cb"], as_index=False)["w"].sum(),
    ).to_pandas()

    # phase-1 walk: locate each key's half-weight coarse bucket + the
    # cumulative weight strictly before it
    target: dict[str, tuple[int, int, int]] = {}
    for k, g in coarse.groupby("k", sort=True):
        g = g.sort_values("cb")
        cum = g["w"].cumsum().to_numpy()
        total = int(cum[-1])
        half = (total + 1) // 2
        i = int(np.searchsorted(cum, half))
        before = int(cum[i - 1]) if i else 0
        target[k] = (int(g["cb"].iloc[i]), before, total)

    # phase 2: exact cent histogram of ONLY each key's target bucket
    def fine_part(t: pa.Table, *, tgt=target) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0), ndigits=0, round_mode="half_towards_infinity"), pa.int64())
        df = pd.DataFrame({"k": t["l_returnflag"].to_numpy(zero_copy_only=False),
                           "bin": cents.to_numpy(zero_copy_only=False),
                           "w": t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)})
        df["cb"] = df["bin"] // COARSE
        want = df["k"].map({k: v[0] for k, v in tgt.items()}).to_numpy()
        df = df[df["cb"].to_numpy() == want]
        g = df.groupby(["k", "bin"], as_index=False)["w"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    fine = ds.map_batches(fine_part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    fine = fine.groupby(["k", "bin"], as_index=False)["w"].sum()
    rows = []
    for k, g in fine.groupby("k", sort=True):
        cb, before, total = target[k]
        g = g.sort_values("bin")
        cum = before + g["w"].cumsum().to_numpy()
        half = (total + 1) // 2
        med = int(g["bin"].to_numpy()[np.searchsorted(cum, half)])
        rows.append((k, _rd(med / 100.0, 2), total))
    out = pd.DataFrame(rows, columns=["l_returnflag", "wmedian_price", "total_qty"])
    return _i64(out, ["total_qty"])


