"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import _i64, _rd, _t, grouped_sums, np, pa, pc, pd  # noqa: F401
from .cusum_twap import _copurchase_weighted_edges  # noqa: F401

# ---------------------------------------------------------------------------
# Wave 16: expectation suite, degree assortativity, JL projection audit,
# successive halving
# ---------------------------------------------------------------------------

# Great-Expectations-style declarative rule registry (extension surface:
# rules are DATA, adding one is a tuple, not a code path).
_EXPECTATION_TYPES = ["view", "click", "purchase", "signup", "error"]
_EXPECTATION_STATUSES = ["O", "F", "P"]


def q_expectation_audit(sf_dir: str) -> pd.DataFrame:
    """Declarative data-quality expectation suite (the Great-Expectations
    pattern): 8 rules — range, accepted-values, uniqueness, format and
    referential integrity — over events/orders/lineitem, each reporting its
    violation count and pass flag.  One vectorized pass per table computes
    every same-table rule as combiner partials; uniqueness is an exact
    distinct via one (event_id)-count exchange collapsed to a scalar; the
    FK rule broadcasts the bounded orders keyset (above ~2M keys the
    bloom_anti_join path in functions/relational.py takes over)."""
    import ray as _ray

    ev = _t(sf_dir, "events", ["event_id", "event_type", "value", "props"])

    def ev_part(t: pa.Table) -> pd.DataFrame:
        val = t["value"].to_numpy(zero_copy_only=False)
        typ = t["event_type"]
        props = t["props"]
        bad_range = int(((val < -1000.0) | (val > 100000.0)).sum())
        bad_type = int(
            pc.sum(
                pc.invert(pc.is_in(typ, value_set=pa.array(_EXPECTATION_TYPES)))
            ).as_py()
            or 0
        )
        bad_json = int(
            pc.sum(pc.invert(pc.starts_with(props, "{"))).as_py() or 0
        )
        return pd.DataFrame(
            {"bad_range": [bad_range], "bad_type": [bad_type],
             "bad_json": [bad_json], "n": [len(t)]}
        )

    evp = ev.map_batches(ev_part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    n_events = int(evp["n"].sum())
    distinct_ids = grouped_sums(ev, ["event_id"], {}, "c").count()
    dup_violations = n_events - int(distinct_ids)

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_totalprice"])

    def ord_part(t: pa.Table) -> pd.DataFrame:
        price = t["o_totalprice"].to_numpy(zero_copy_only=False)
        bad_price = int((price <= 0.0).sum())
        bad_status = int(
            pc.sum(
                pc.invert(
                    pc.is_in(t["o_orderstatus"], value_set=pa.array(_EXPECTATION_STATUSES))
                )
            ).as_py()
            or 0
        )
        return pd.DataFrame({"bad_price": [bad_price], "bad_status": [bad_status]})

    orp = orders.map_batches(ord_part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()

    okeys = np.unique(
        orders.map_batches(
            lambda t: pa.table({"k": pc.unique(t["o_orderkey"])}),
            batch_format="pyarrow", zero_copy_batch=True,
        ).to_pandas()["k"].to_numpy(np.int64)
    )
    okeys_ref = _ray.put(okeys)

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def li_part(t: pa.Table, *, _ref=okeys_ref) -> pd.DataFrame:
        keys = _ray.get(_ref)
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.minimum(np.searchsorted(keys, ok), len(keys) - 1)
        bad_fk = int((keys[idx] != ok).sum())
        q = t["l_quantity"].to_numpy(zero_copy_only=False)
        bad_qty = int(((q < 1.0) | (q > 50.0)).sum())
        return pd.DataFrame({"bad_fk": [bad_fk], "bad_qty": [bad_qty]})

    lip = li.map_batches(li_part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()

    rows = [
        ("events_value_range", "events", "range", int(evp["bad_range"].sum())),
        ("events_type_domain", "events", "accepted_values", int(evp["bad_type"].sum())),
        ("events_id_unique", "events", "unique", dup_violations),
        ("events_props_json", "events", "format", int(evp["bad_json"].sum())),
        ("orders_price_positive", "orders", "range", int(orp["bad_price"].sum())),
        ("orders_status_domain", "orders", "accepted_values", int(orp["bad_status"].sum())),
        ("lineitem_fk_orders", "lineitem", "referential", int(lip["bad_fk"].sum())),
        ("lineitem_qty_range", "lineitem", "range", int(lip["bad_qty"].sum())),
    ]
    out = pd.DataFrame(rows, columns=["rule_id", "table_name", "rule_type", "violations"])
    out["passed"] = (out["violations"] == 0).astype("int64")
    return _i64(out, ["violations", "passed"])


SQL_EXPECTATION_AUDIT = """
SELECT 'events_value_range' AS rule_id, 'events' AS table_name, 'range' AS rule_type,
       CAST(SUM(CASE WHEN value < -1000 OR value > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS violations
FROM events
UNION ALL
SELECT 'events_type_domain', 'events', 'accepted_values',
       CAST(SUM(CASE WHEN event_type NOT IN ('view','click','purchase','signup','error')
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM events
UNION ALL
SELECT 'events_id_unique', 'events', 'unique',
       CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT)
FROM events
UNION ALL
SELECT 'events_props_json', 'events', 'format',
       CAST(SUM(CASE WHEN props NOT LIKE '{%' THEN 1 ELSE 0 END) AS BIGINT)
FROM events
UNION ALL
SELECT 'orders_price_positive', 'orders', 'range',
       CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orders_status_domain', 'orders', 'accepted_values',
       CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'lineitem_fk_orders', 'lineitem', 'referential',
       CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem LEFT JOIN orders ON o_orderkey = l_orderkey
UNION ALL
SELECT 'lineitem_qty_range', 'lineitem', 'range',
       CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
"""
SQL_EXPECTATION_AUDIT = f"""
WITH rules AS ({SQL_EXPECTATION_AUDIT})
SELECT rule_id, table_name, rule_type, violations,
       CASE WHEN violations = 0 THEN 1 ELSE 0 END AS passed
FROM rules ORDER BY rule_id
"""


def q_degree_assortativity(sf_dir: str) -> pd.DataFrame:
    """Degree assortativity (Newman 2002) of the co-purchase graph: Pearson
    correlation of endpoint degrees over all directed (symmetrized) edges.
    Degrees come from one bounded grouped count; the |V|-sized degree map
    broadcasts into a single edge scan that emits INTEGER moment partials
    (n, Σx, Σy, Σxy, Σx², Σy²); the driver folds them in arbitrary-precision
    ints and closes the correlation in the same double expression the SQL
    oracle evaluates — no float ever crosses the exchange."""
    import math

    import ray as _ray

    edges = _copurchase_weighted_edges(sf_dir).materialize()
    deg = grouped_sums(edges, ["src"], {}, "deg").to_pandas()
    nodes = deg["src"].to_numpy(np.int64)
    order = np.argsort(nodes)
    ref = _ray.put((nodes[order], deg["deg"].to_numpy(np.int64)[order]))

    def part(t: pa.Table, *, _ref=ref) -> pd.DataFrame:
        keys, dv = _ray.get(_ref)
        x = dv[np.searchsorted(keys, t["src"].to_numpy(zero_copy_only=False))]
        y = dv[np.searchsorted(keys, t["dst"].to_numpy(zero_copy_only=False))]
        return pd.DataFrame(
            {"n": [len(x)], "sx": [int(x.sum())], "sy": [int(y.sum())],
             "sxy": [int((x * y).sum())], "sxx": [int((x * x).sum())],
             "syy": [int((y * y).sum())]}
        )

    p = edges.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    n = int(p["n"].sum())
    sx, sy = int(p["sx"].sum()), int(p["sy"].sum())
    sxy, sxx, syy = int(p["sxy"].sum()), int(p["sxx"].sum()), int(p["syy"].sum())
    num = float(n) * float(sxy) - float(sx) * float(sy)
    den = math.sqrt(float(n) * float(sxx) - float(sx) * float(sx)) * math.sqrt(
        float(n) * float(syy) - float(sy) * float(sy)
    )
    r = 0.0 if den == 0.0 else num / den
    out = pd.DataFrame(
        {"n_edges": [n], "mean_deg": [_rd(float(sx) / float(n), 6)],
         "assortativity": [_rd(r, 6)]}
    )
    return _i64(out, ["n_edges"])


SQL_DEGREE_ASSORTATIVITY = """
WITH pairs AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON b.l_orderkey = a.l_orderkey AND a.l_partkey <> b.l_partkey),
deg AS (SELECT src AS node, CAST(COUNT(*) AS HUGEINT) AS deg FROM pairs GROUP BY 1),
j AS (SELECT ds.deg AS x, dd.deg AS y
      FROM pairs e JOIN deg ds ON ds.node = e.src JOIN deg dd ON dd.node = e.dst),
s AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM j)
SELECT CAST(n AS BIGINT) AS n_edges,
       ROUND(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_deg,
       CASE WHEN (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) = 0
            THEN 0.0
            ELSE ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
       END AS assortativity
FROM s
"""


_JL_K = 16
_JL_BUCKETS = ["zero", "lt_0.5", "0.5-0.8", "0.8-1.25", "1.25-2", "ge_2"]


def _jl_sign_matrix(d: int) -> np.ndarray:
    """Deterministic ±1 sign matrix (d × k) from an integer hash of (i, j)
    — the Achlioptas 2003 database-friendly JL projection, reproducible on
    both engines without shipping a matrix."""
    i = np.arange(1, d + 1, dtype=np.int64)[:, None]
    j = np.arange(1, _JL_K + 1, dtype=np.int64)[None, :]
    h = ((i * 1000003 + j * 8191) * 2654435761) % 2147483647
    return np.where(h % 2 == 0, 1, -1).astype(np.int64)


def q_jl_projection_audit(sf_dir: str) -> pd.DataFrame:
    """Johnson-Lindenstrauss projection distortion audit, integer-exact:
    embeddings quantize to µ-ints (floor(v·1000)), project through the
    deterministic ±1 sign matrix (one int matmul per batch, k=16), and
    consecutive vec-id pairs compare projected vs original squared
    distances — E[‖Sx‖²] = k‖x‖², so the ratio proj/(k·orig) buckets by
    INTEGER cross-multiplication (no float ever computed).  Pairs co-locate
    via one bucketed exchange on pair-id carrying only (q, proj) int rows;
    the distortion histogram is the only thing that reduces."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])

    def per_vec(t: pa.Table) -> pd.DataFrame:
        arr = t["embedding"].combine_chunks()
        mat = np.asarray(arr.flatten(), dtype=np.float64).reshape(len(t), -1)
        q = np.floor(mat * 1000.0).astype(np.int64)
        s = _jl_sign_matrix(q.shape[1])
        proj = q @ s
        vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame(
            {"pair_id": vid // 2, "vec_id": vid,
             "q": list(q), "p": list(proj)}
        )

    rows = ds.map_batches(per_vec, batch_format="pyarrow", zero_copy_batch=True)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["pair_id", "vec_id"], ignore_index=True)
        sizes = df.groupby("pair_id", sort=False)["vec_id"].transform("size")
        df = df[sizes == 2]
        if df.empty:
            return pd.DataFrame(
                {"bucket": pd.Series([], dtype=object),
                 "n_pairs": pd.Series([], dtype="int64"),
                 "sum_proj_d2": pd.Series([], dtype="int64"),
                 "sum_orig_d2": pd.Series([], dtype="int64")}
            )
        qm = np.stack(df["q"].to_numpy())
        pm = np.stack(df["p"].to_numpy())
        qa, qb = qm[0::2], qm[1::2]
        pa_, pb = pm[0::2], pm[1::2]
        orig = ((qa - qb) ** 2).sum(axis=1)
        proj = ((pa_ - pb) ** 2).sum(axis=1)
        k = np.int64(_JL_K)
        bucket = np.select(
            [orig == 0, 2 * proj < k * orig, 5 * proj < 4 * k * orig,
             4 * proj < 5 * k * orig, proj < 2 * k * orig],
            _JL_BUCKETS[:5],
            default=_JL_BUCKETS[5],
        )
        out = pd.DataFrame({"bucket": bucket, "n_pairs": 1,
                            "sum_proj_d2": proj, "sum_orig_d2": orig})
        return out.groupby("bucket", as_index=False).sum()

    hist = grouped_sums(
        bucketed_group_reduce(rows, ["pair_id"], per_bucket, num_buckets=32),
        ["bucket"],
        {"n_pairs": "n_pairs", "sum_proj_d2": "sum_proj_d2", "sum_orig_d2": "sum_orig_d2"},
    ).to_pandas()
    out = hist.sort_values("bucket", ignore_index=True)
    return _i64(out, ["n_pairs", "sum_proj_d2", "sum_orig_d2"])


SQL_JL_PROJECTION_AUDIT = f"""
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(FLOOR(CAST(UNNEST(embedding) AS DOUBLE) * 1000) AS BIGINT) AS qv
  FROM embeddings),
proj AS (
  SELECT vec_id, g.j,
         SUM(qv * (CASE WHEN ((i * 1000003 + g.j * 8191) * 2654435761)
                             % 2147483647 % 2 = 0 THEN 1 ELSE -1 END)) AS p
  FROM q, generate_series(1, {_JL_K}) AS g(j)
  GROUP BY 1, 2),
pd2 AS (
  SELECT a.vec_id AS va, SUM((a.p - b.p) * (a.p - b.p)) AS proj_d2
  FROM proj a JOIN proj b ON b.vec_id = a.vec_id + 1 AND a.vec_id % 2 = 0
                          AND b.j = a.j
  GROUP BY 1),
od2 AS (
  SELECT a.vec_id AS va, SUM((a.qv - b.qv) * (a.qv - b.qv)) AS orig_d2
  FROM q a JOIN q b ON b.vec_id = a.vec_id + 1 AND a.vec_id % 2 = 0
                    AND b.i = a.i
  GROUP BY 1),
pairs AS (
  SELECT p.proj_d2, o.orig_d2 FROM pd2 p JOIN od2 o ON o.va = p.va),
lab AS (
  SELECT CASE WHEN orig_d2 = 0 THEN 'zero'
              WHEN 2 * proj_d2 < {_JL_K} * orig_d2 THEN 'lt_0.5'
              WHEN 5 * proj_d2 < 4 * {_JL_K} * orig_d2 THEN '0.5-0.8'
              WHEN 4 * proj_d2 < 5 * {_JL_K} * orig_d2 THEN '0.8-1.25'
              WHEN proj_d2 < 2 * {_JL_K} * orig_d2 THEN '1.25-2'
              ELSE 'ge_2' END AS bucket,
         proj_d2, orig_d2
  FROM pairs)
SELECT bucket, COUNT(*) AS n_pairs,
       CAST(SUM(proj_d2) AS BIGINT) AS sum_proj_d2,
       CAST(SUM(orig_d2) AS BIGINT) AS sum_orig_d2
FROM lab GROUP BY 1 ORDER BY bucket
"""


_SH_START = 16
_SH_ROUNDS = 4
_SH_WEEK_US = 7 * 86_400_000_000


def q_successive_halving(sf_dir: str) -> pd.DataFrame:
    """Successive-halving replay (Jamieson & Talwalkar 2016, the Hyperband
    inner loop) over the event stream: the 16 most active users are the
    arms; at round r each survivor's metric is its cumulative purchase
    cents over the first r weeks, and the best half survives (ties to the
    smaller user id).  The corpus reduces ONCE to per-(user, week) cent
    partials plus per-user counts — one bounded combiner exchange — and the
    halving replays driver-side over ≤16 rows; integer cents keep every
    comparison exact."""
    ds = _t(sf_dir, "events", ["user_id", "ts", "event_type", "value"])
    t0 = int(
        ds.map_batches(
            lambda t: pa.table({"m": pa.array([pc.min(pc.cast(t["ts"], pa.int64())).as_py()], pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True,
        ).to_pandas()["m"].min()
    )

    def part(t: pa.Table, *, _t0=t0) -> pd.DataFrame:
        micros = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        wk = (micros - _t0) // _SH_WEEK_US
        cents = _rd(t["value"].to_numpy(zero_copy_only=False) * 100.0, 0).astype(np.int64)
        is_p = pc.equal(t["event_type"], "purchase").to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame(
            {"user_id": uid, "wk": wk,
             "cents": np.where(is_p, cents, 0), "n_events": 1}
        )
        return df.groupby(["user_id", "wk"], as_index=False).sum()

    byweek = grouped_sums(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id", "wk"],
        {"cents": "cents", "n_events": "n_events"},
    ).to_pandas()

    totals = byweek.groupby("user_id", as_index=False)["n_events"].sum()
    arms = (
        totals.sort_values(["n_events", "user_id"], ascending=[False, True])
        .head(_SH_START)["user_id"]
        .to_numpy(np.int64)
    )
    survivors = set(arms.tolist())
    rows = []
    for r in range(1, _SH_ROUNDS + 1):
        w = byweek[(byweek["wk"] < r) & byweek["user_id"].isin(survivors)]
        met = w.groupby("user_id")["cents"].sum().to_dict()
        scored = sorted(
            ((int(met.get(u, 0)), u) for u in survivors),
            key=lambda t: (-t[0], t[1]),
        )
        keep = _SH_START >> r
        scored = scored[:keep]
        survivors = {u for _, u in scored}
        rows.append(
            (r, len(scored), sum(u for _, u in scored),
             min(m for m, _ in scored), max(m for m, _ in scored))
        )
    out = pd.DataFrame(
        rows, columns=["round", "n_survivors", "survivor_id_sum", "min_metric", "max_metric"]
    )
    return _i64(out, ["round", "n_survivors", "survivor_id_sum", "min_metric", "max_metric"])


SQL_SUCCESSIVE_HALVING = f"""
WITH mn AS (SELECT MIN(epoch_us(ts)) AS t0 FROM events),
ev AS (
  SELECT user_id,
         (epoch_us(ts) - (SELECT t0 FROM mn)) // {_SH_WEEK_US} AS wk,
         CASE WHEN event_type = 'purchase'
              THEN CAST(ROUND(value * 100, 0) AS BIGINT) ELSE 0 END AS cents
  FROM events),
s0 AS (SELECT user_id FROM ev GROUP BY 1
       ORDER BY COUNT(*) DESC, user_id LIMIT {_SH_START}),
m1 AS (SELECT s.user_id,
              COALESCE(SUM(CASE WHEN e.wk < 1 THEN e.cents END), 0) AS met
       FROM s0 s LEFT JOIN ev e ON e.user_id = s.user_id GROUP BY 1),
s1 AS (SELECT user_id, met FROM m1 ORDER BY met DESC, user_id LIMIT {_SH_START >> 1}),
m2 AS (SELECT s.user_id,
              COALESCE(SUM(CASE WHEN e.wk < 2 THEN e.cents END), 0) AS met
       FROM s1 s LEFT JOIN ev e ON e.user_id = s.user_id GROUP BY 1),
s2 AS (SELECT user_id, met FROM m2 ORDER BY met DESC, user_id LIMIT {_SH_START >> 2}),
m3 AS (SELECT s.user_id,
              COALESCE(SUM(CASE WHEN e.wk < 3 THEN e.cents END), 0) AS met
       FROM s2 s LEFT JOIN ev e ON e.user_id = s.user_id GROUP BY 1),
s3 AS (SELECT user_id, met FROM m3 ORDER BY met DESC, user_id LIMIT {_SH_START >> 3}),
m4 AS (SELECT s.user_id,
              COALESCE(SUM(CASE WHEN e.wk < 4 THEN e.cents END), 0) AS met
       FROM s3 s LEFT JOIN ev e ON e.user_id = s.user_id GROUP BY 1),
s4 AS (SELECT user_id, met FROM m4 ORDER BY met DESC, user_id LIMIT {_SH_START >> 4})
SELECT 1 AS round, COUNT(*) AS n_survivors, CAST(SUM(user_id) AS BIGINT) AS survivor_id_sum,
       CAST(MIN(met) AS BIGINT) AS min_metric, CAST(MAX(met) AS BIGINT) AS max_metric FROM s1
UNION ALL
SELECT 2, COUNT(*), CAST(SUM(user_id) AS BIGINT), CAST(MIN(met) AS BIGINT), CAST(MAX(met) AS BIGINT) FROM s2
UNION ALL
SELECT 3, COUNT(*), CAST(SUM(user_id) AS BIGINT), CAST(MIN(met) AS BIGINT), CAST(MAX(met) AS BIGINT) FROM s3
UNION ALL
SELECT 4, COUNT(*), CAST(SUM(user_id) AS BIGINT), CAST(MIN(met) AS BIGINT), CAST(MAX(met) AS BIGINT) FROM s4
ORDER BY round
"""


