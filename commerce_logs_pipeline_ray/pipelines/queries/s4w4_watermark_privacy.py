"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import (
    ORACLE_ARTIFACT_DIR,
    _corpus_dir,
    _i64,
    _rd,
    _t,
    md5_hex,
    np,
    pa,
    pc,
    pd,
    pq,
    rd,
)  # noqa: F401
from .neardup_a import _ensure_artifact  # noqa: F401
from .neardup_b import _sf_of  # noqa: F401
from .s4w1_interval_cdc import _MERGE_CUTOFF_US  # noqa: F401
from .s4w5_doremi_p95 import _HOUR_US  # noqa: F401

# ---------------------------------------------------------------------------
# Session-4 wave 4: streaming watermark audit, schema drift, l-diversity,
# bloom false-positive audit, group-sequential A/B boundary
# ---------------------------------------------------------------------------

_WM_LAG_US = 300_000_000  # 5-minute watermark lag


def q_watermark_late_events(sf_dir: str) -> pd.DataFrame:
    """Streaming watermark / late-data audit: events arrive in event_id
    order (the synthetic arrival log); the watermark after arrival i is
    max(event-time ≤ i) − 5 min, and an event is LATE iff its event time is
    below the watermark of the PREVIOUS arrival — the exact rule a
    streaming window operator applies before dropping/redirecting a row.
    Distributed prefix-max: event_id is contiguous, so fixed ranges bucket
    the arrival order; per-bucket maxima fold on the driver into exclusive
    carry-in offsets, then one grouped pass computes in-bucket running
    maxima and per-event-hour late counts — two linear scans, no sort."""
    path = f"{sf_dir}/events.parquet"
    n_rows = pq.ParquetFile(path).metadata.num_rows
    n_buckets = 64
    span = (n_rows + n_buckets - 1) // n_buckets

    ds = _t(sf_dir, "events", ["event_id", "ts"])

    def bucket_max(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        tsu = pc.cast(t["ts"], pa.int64()).to_numpy()
        b = eid // span
        df = pd.DataFrame({"b": b, "m": tsu}).groupby("b", as_index=False)["m"].max()
        return pa.Table.from_pandas(df, preserve_index=False)

    bm = (
        ds.map_batches(bucket_max, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby("b")["m"]
        .max()
        .sort_index()
    )
    # exclusive carry-in: max event-time over all PRIOR buckets (sentinel
    # far below any timestamp but safe against the -LAG subtraction)
    carry_vals = np.r_[np.int64(-(1 << 62)), bm.cummax().to_numpy()[:-1]]
    carry = {int(b): int(v) for b, v in zip(bm.index, carry_vals)}

    import ray as _ray

    carry_ref = _ray.put(carry)

    def add_bucket(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        return t.append_column("b", pa.array((eid // span).astype(np.int64)))

    def late_partial(df: pd.DataFrame) -> pd.DataFrame:
        cr = _ray.get(carry_ref)
        df = df.sort_values("event_id", kind="stable")
        tsu = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        prior = int(cr[int(df["b"].iloc[0])])
        runmax = np.maximum(np.maximum.accumulate(tsu), prior)
        wm_before = np.r_[np.int64(prior), runmax[:-1]]  # watermark basis
        late = tsu < (wm_before - _WM_LAG_US)
        hour = tsu // _HOUR_US
        g = pd.DataFrame({"hour": hour, "late": late.astype(np.int64)})
        out = g.groupby("hour", as_index=False).agg(
            n_events=("late", "size"), n_late=("late", "sum"))
        return out

    from ...functions.relational import bucketed_group_reduce

    partials = bucketed_group_reduce(
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True),
        ["b"], late_partial, num_buckets=n_buckets)
    out = (
        partials.to_pandas()
        .groupby("hour", as_index=False)[["n_events", "n_late"]]
        .sum()
        .sort_values("hour", ignore_index=True)
    )
    return _i64(out, ["hour", "n_events", "n_late"])


SQL_WATERMARK_LATE_EVENTS = f"""
WITH w AS (
  SELECT epoch_us(ts) AS tsu,
         MAX(epoch_us(ts)) OVER (ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM events)
SELECT tsu // {_HOUR_US} AS hour, COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN wm IS NOT NULL AND tsu < wm - {_WM_LAG_US}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late
FROM w GROUP BY 1 ORDER BY 1
"""


def q_schema_drift_audit(sf_dir: str) -> pd.DataFrame:
    """Data-quality profile drift: per-column profiles (rows, nulls, exact
    distinct, mean for numeric) of the two halves of the event stream
    (before/after the cutoff), with an integer cross-multiplied drift flag
    (distinct-count ratio > 1.5).  Distinct counts are exact via one
    (column, value, half) combiner exchange — the expectation-suite gate a
    pipeline runs before promoting new data."""
    ds = _t(sf_dir, "events", ["ts", "event_type", "user_id", "value"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        tsu = df["ts"].astype("datetime64[us]").astype("int64")
        half = (tsu >= _MERGE_CUTOFF_US).map({False: "a", True: "b"})
        frames = []
        for col in ("event_type", "user_id", "value"):
            v = df[col]
            if col == "value":
                cents = (v.fillna(0.0) * 100).round().astype("int64")
                key = cents.astype(str)
            else:
                cents = 0
                key = v.astype(str)
            g = pd.DataFrame({
                "col": col, "half": half, "val": key,
                "isnull": v.isna().astype(np.int64),
                "cents": cents,
            })
            frames.append(
                g.groupby(["col", "half", "val"], as_index=False).agg(
                    n=("isnull", "size"), n_null=("isnull", "sum"),
                    sum_c=("cents", "sum"))
            )
        return pd.concat(frames, ignore_index=True)

    from ...functions.relational import bucketed_group_reduce

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["col", "half", "val"], as_index=False).agg(
            n=("n", "sum"), n_null=("n_null", "sum"), sum_c=("sum_c", "sum"))

    vals = bucketed_group_reduce(
        ds.map_batches(part, batch_format="pandas"), ["col", "half", "val"], fold
    ).to_pandas()
    prof = vals.groupby(["col", "half"], as_index=False).agg(
        n=("n", "sum"), n_null=("n_null", "sum"),
        n_distinct=("val", "size"), sum_c=("sum_c", "sum"))
    rows = []
    for col, g in prof.groupby("col"):
        a = g[g["half"] == "a"].iloc[0]
        b = g[g["half"] == "b"].iloc[0]
        da, db = int(a["n_distinct"]), int(b["n_distinct"])
        drift = 2 * max(da, db) > 3 * min(da, db)
        mean_a = _rd((int(a["sum_c"]) / 100.0) / int(a["n"]), 6) if col == "value" else -1.0
        mean_b = _rd((int(b["sum_c"]) / 100.0) / int(b["n"]), 6) if col == "value" else -1.0
        rows.append((col, int(a["n"]), int(b["n"]), int(a["n_null"]),
                     int(b["n_null"]), da, db, mean_a, mean_b, drift))
    out = pd.DataFrame(rows, columns=[
        "col", "n_a", "n_b", "null_a", "null_b", "distinct_a", "distinct_b",
        "mean_a", "mean_b", "drift"]).sort_values("col", ignore_index=True)
    return _i64(out, ["n_a", "n_b", "null_a", "null_b", "distinct_a", "distinct_b"])


SQL_SCHEMA_DRIFT_AUDIT = f"""
WITH e AS (
  SELECT CASE WHEN epoch_us(ts) >= {_MERGE_CUTOFF_US} THEN 'b' ELSE 'a' END AS half,
         event_type, user_id, CAST(ROUND(value * 100) AS BIGINT) AS vc, value
  FROM events),
p AS (
  SELECT 'event_type' AS col, half, COUNT(*) AS n,
         CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         COUNT(DISTINCT event_type) AS n_distinct, CAST(0 AS BIGINT) AS sum_c
  FROM e GROUP BY half
  UNION ALL
  SELECT 'user_id', half, COUNT(*),
         CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         COUNT(DISTINCT user_id), CAST(0 AS BIGINT)
  FROM e GROUP BY half
  UNION ALL
  SELECT 'value', half, COUNT(*),
         CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         COUNT(DISTINCT vc), CAST(SUM(vc) AS BIGINT)
  FROM e GROUP BY half)
SELECT a.col, a.n AS n_a, b.n AS n_b, a.n_null AS null_a, b.n_null AS null_b,
       a.n_distinct AS distinct_a, b.n_distinct AS distinct_b,
       CASE WHEN a.col = 'value' THEN ROUND((a.sum_c / 100.0) / a.n, 6)
            ELSE -1.0 END AS mean_a,
       CASE WHEN a.col = 'value' THEN ROUND((b.sum_c / 100.0) / b.n, 6)
            ELSE -1.0 END AS mean_b,
       2 * GREATEST(a.n_distinct, b.n_distinct)
         > 3 * LEAST(a.n_distinct, b.n_distinct) AS drift
FROM p a JOIN p b ON a.col = b.col AND a.half = 'a' AND b.half = 'b'
ORDER BY a.col
"""

_LDIV_MIN = 3


def q_l_diversity_audit(sf_dir: str) -> pd.DataFrame:
    """l-diversity privacy audit (complements ``k_anonymity_audit``): per
    quasi-identifier class (mktsegment × nation), the count of DISTINCT
    sensitive values — here each customer's first-order priority — must
    reach l=3 or the class leaks.  One hash join + one grouped distinct;
    customers without orders carry no sensitive value (documented)."""
    from ...functions.relational import bucketed_group_reduce, hash_join

    orders = _t(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_orderkey",
                                   "o_orderpriority"])

    def first_order(df: pd.DataFrame) -> pd.DataFrame:
        # keeps the (date, key) sort columns so the fold can re-reduce
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                            kind="stable")
        return df.groupby("o_custkey", as_index=False).first()

    sens = bucketed_group_reduce(
        orders.map_batches(first_order, batch_format="pandas"),
        ["o_custkey"], first_order, num_buckets=32)
    cust = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment", "c_nationkey"])
    joined = hash_join(cust, sens, "c_custkey", "o_custkey")

    def class_part(df: pd.DataFrame) -> pd.DataFrame:
        # one combiner carries BOTH facts: distinct (class, priority) rows
        # with member multiplicities — l and m fold from the same exchange
        return df.groupby(
            ["c_mktsegment", "c_nationkey", "o_orderpriority"], as_index=False
        ).size().rename(columns={"size": "m"})

    def class_fold(df: pd.DataFrame) -> pd.DataFrame:
        d = df.groupby(
            ["c_mktsegment", "c_nationkey", "o_orderpriority"], as_index=False
        )["m"].sum()
        return d.groupby(["c_mktsegment", "c_nationkey"], as_index=False).agg(
            l=("o_orderpriority", "nunique"), m=("m", "sum"))

    j = bucketed_group_reduce(
        joined.map_batches(class_part, batch_format="pandas"),
        ["c_mktsegment", "c_nationkey"], class_fold, num_buckets=16
    ).to_pandas()
    low = j[j["l"] < _LDIV_MIN]
    return pd.DataFrame({
        "n_classes": pd.Series([len(j)], dtype="int64"),
        "n_low_l_classes": pd.Series([len(low)], dtype="int64"),
        "n_exposed_customers": pd.Series([int(low["m"].sum())], dtype="int64"),
        "min_l": pd.Series([int(j["l"].min())], dtype="int64"),
    })


SQL_L_DIVERSITY_AUDIT = f"""
WITH fo AS (
  SELECT o_custkey, o_orderpriority,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders),
s AS (SELECT o_custkey, o_orderpriority FROM fo WHERE rn = 1),
j AS (
  SELECT c.c_mktsegment, c.c_nationkey, s.o_orderpriority
  FROM customer c JOIN s ON s.o_custkey = c.c_custkey),
cls AS (
  SELECT c_mktsegment, c_nationkey,
         COUNT(DISTINCT o_orderpriority) AS l, COUNT(*) AS m
  FROM j GROUP BY 1, 2)
SELECT COUNT(*) AS n_classes,
       CAST(SUM(CASE WHEN l < {_LDIV_MIN} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_low_l_classes,
       CAST(SUM(CASE WHEN l < {_LDIV_MIN} THEN m ELSE 0 END) AS BIGINT)
         AS n_exposed_customers,
       CAST(MIN(l) AS BIGINT) AS min_l
FROM cls
"""

_BLOOM_M = 16384
_BLOOM_K = 3


def q_bloom_fp_audit(sf_dir: str) -> pd.DataFrame:
    """Bloom-filter false-positive audit: insert the distinct ordering
    customers (k=3 md5-derived bit positions, m=16384), probe EVERY
    customer, and measure the actual FP rate on true negatives against the
    classic (1−e^{−kn/m})^k estimate — the sizing check a bloom-pushdown
    join (``bloom_semi_join``) relies on.  The bit array is a per-batch
    OR-fold (m-bounded partials), the true-negative set comes from one
    broadcast key set (the documented <2M broadcast regime)."""
    orders = _t(sf_dir, "orders", ["o_custkey"])

    def key_part(t: pa.Table) -> pa.Table:
        u = np.unique(t["o_custkey"].to_numpy(zero_copy_only=False))
        return pa.table({"k": pa.array(u.astype(np.int64))})

    keys = np.unique(
        orders.map_batches(key_part, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()["k"].to_numpy()
    )

    def positions(ks: np.ndarray) -> np.ndarray:
        out = np.empty((len(ks), _BLOOM_K), dtype=np.int64)
        for i in range(_BLOOM_K):
            hexes = md5_hex([f"{int(k)}:b{i}" for k in ks]).to_pylist()
            out[:, i] = np.array([int(h[:8], 16) for h in hexes]) % _BLOOM_M
        return out

    bits = np.zeros(_BLOOM_M, dtype=bool)
    bits[positions(keys).ravel()] = True

    import ray as _ray

    bits_ref = _ray.put(bits)
    keyset_ref = _ray.put(set(int(k) for k in keys))

    cust = _t(sf_dir, "customer", ["c_custkey"])

    def probe(t: pa.Table) -> pa.Table:
        bt = _ray.get(bits_ref)
        ks = _ray.get(keyset_ref)
        base = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        # probe every customer PLUS a shifted guaranteed-negative twin
        # (custkeys < 10^7 by corpus contract), so the FP denominator is
        # never empty even when every customer has ordered
        ck = np.concatenate([base, base + 10_000_000])
        pos = positions(ck)
        hit = bt[pos].all(axis=1)
        neg = np.array([int(c) not in ks for c in ck])
        return pa.table({
            "n_neg": pa.array([int(neg.sum())], pa.int64()),
            "n_fp": pa.array([int((hit & neg).sum())], pa.int64()),
        })

    p = cust.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    n_neg, n_fp = int(p["n_neg"].sum()), int(p["n_fp"].sum())
    n_keys = len(keys)
    fp_rate = _rd(n_fp / float(n_neg), 6) if n_neg else 0.0
    fp_theory = _rd(
        (1.0 - np.exp(-(_BLOOM_K * n_keys) / float(_BLOOM_M))) ** _BLOOM_K, 6)
    return pd.DataFrame({
        "n_keys": pd.Series([n_keys], dtype="int64"),
        "n_neg_probes": pd.Series([n_neg], dtype="int64"),
        "n_fp": pd.Series([n_fp], dtype="int64"),
        "fp_rate": [fp_rate], "fp_theory": [float(fp_theory)],
    })


SQL_BLOOM_FP_AUDIT = f"""
WITH ks AS (SELECT DISTINCT o_custkey AS k FROM orders),
ins AS (
  SELECT DISTINCT CAST('0x' || substr(md5(CAST(k AS VARCHAR) || ':b' || i), 1, 8)
                       AS BIGINT) % {_BLOOM_M} AS pos
  FROM ks, generate_series(0, {_BLOOM_K - 1}) g(i)),
pk AS (
  SELECT c_custkey AS ck FROM customer
  UNION ALL
  SELECT c_custkey + 10000000 FROM customer),
probes AS (
  SELECT ck,
         CAST('0x' || substr(md5(CAST(ck AS VARCHAR) || ':b' || i), 1, 8)
              AS BIGINT) % {_BLOOM_M} AS pos
  FROM pk, generate_series(0, {_BLOOM_K - 1}) g(i)),
hits AS (
  SELECT p.ck, CAST(COUNT(*) AS BIGINT) = {_BLOOM_K} AS all_set
  FROM probes p JOIN ins ON ins.pos = p.pos GROUP BY p.ck),
neg AS (
  SELECT pk.ck, COALESCE(h.all_set, FALSE) AS all_set
  FROM pk LEFT JOIN hits h ON h.ck = pk.ck
  WHERE pk.ck NOT IN (SELECT k FROM ks)),
agg AS (
  SELECT (SELECT COUNT(*) FROM ks) AS n_keys, COUNT(*) AS n_neg_probes,
         CAST(SUM(CASE WHEN all_set THEN 1 ELSE 0 END) AS BIGINT) AS n_fp
  FROM neg)
SELECT n_keys, n_neg_probes, n_fp,
       ROUND(n_fp / CAST(n_neg_probes AS DOUBLE), 6) AS fp_rate,
       ROUND(pow(1.0 - exp(-({_BLOOM_K} * n_keys) / CAST({_BLOOM_M} AS DOUBLE)),
                 {_BLOOM_K}), 6) AS fp_theory
FROM agg
"""

_GSQ_C = 2.8


def q_group_sequential_ab(sf_dir: str) -> pd.DataFrame:
    """Group-sequential A/B monitoring (O'Brien-Fleming-style boundary):
    arms = user parity, per-day CUMULATIVE z of the mean-value difference
    (all accumulators integer cents; the pooled variance is one global
    exact pass) against boundary c/√(t/T) — the early-stopping replay a
    metrics pipeline runs nightly.  One (day, arm) combiner exchange; the
    day-level scan is bounded."""
    ds = _t(sf_dir, "events", ["ts", "user_id", "value"])
    DAY_US = 86_400_000_000

    def part(df: pd.DataFrame) -> pd.DataFrame:
        tsu = df["ts"].astype("datetime64[us]").astype("int64")
        vc = (df["value"] * 100).round().astype("int64")
        g = pd.DataFrame({
            "day": tsu // DAY_US,
            "arm": (df["user_id"] % 2).astype(np.int64),
            "vc": vc, "vc2": vc * vc, "one": np.int64(1)})
        return g.groupby(["day", "arm"], as_index=False).agg(
            n=("one", "sum"), s=("vc", "sum"), q=("vc2", "sum"))

    p = ds.map_batches(part, batch_format="pandas").to_pandas()
    g = p.groupby(["day", "arm"], as_index=False).agg(
        n=("n", "sum"), s=("s", "sum"), q=("q", "sum"))
    N = int(g["n"].sum())
    S = int(g["s"].sum())
    Q = int(g["q"].sum())
    mean_all = (S / 100.0) / N
    var = (Q / 10000.0 - N * mean_all * mean_all) / (N - 1)
    days = np.sort(g["day"].unique())
    T = len(days)
    cum = {0: [0, 0], 1: [0, 0]}  # arm -> [n, s]
    rows = []
    for t_idx, d in enumerate(days, 1):
        for arm in (0, 1):
            sub = g[(g["day"] == d) & (g["arm"] == arm)]
            if len(sub):
                cum[arm][0] += int(sub["n"].iloc[0])
                cum[arm][1] += int(sub["s"].iloc[0])
        na, nb = cum[0][0], cum[1][0]
        if na == 0 or nb == 0:
            continue
        ma = (cum[0][1] / 100.0) / na
        mb = (cum[1][1] / 100.0) / nb
        z = (ma - mb) / np.sqrt(var * (1.0 / na + 1.0 / nb))
        boundary = _GSQ_C / np.sqrt(t_idx / (T * 1.0))
        rows.append((int(d), na, nb, _rd(float(z), 6), _rd(float(boundary), 6),
                     bool(abs(z) > boundary)))
    out = pd.DataFrame(rows, columns=["day", "n_a", "n_b", "z", "boundary",
                                      "crossed"])
    return _i64(out, ["day", "n_a", "n_b"])


SQL_GROUP_SEQUENTIAL_AB = f"""
WITH e AS (
  SELECT epoch_us(ts) // 86400000000 AS day, user_id % 2 AS arm,
         CAST(ROUND(value * 100) AS BIGINT) AS vc
  FROM events),
v AS (
  SELECT CAST(SUM(vc) AS BIGINT) AS S, CAST(SUM(vc * vc) AS BIGINT) AS Q,
         COUNT(*) AS N
  FROM e),
d AS (
  SELECT day, arm, COUNT(*) AS n, CAST(SUM(vc) AS BIGINT) AS s
  FROM e GROUP BY 1, 2),
grid AS (
  SELECT dd.day, t.arm
  FROM (SELECT DISTINCT day FROM e) dd, (VALUES (0), (1)) t(arm)),
dg AS (
  SELECT g.day, g.arm, COALESCE(d.n, 0) AS n, COALESCE(d.s, 0) AS s
  FROM grid g LEFT JOIN d ON d.day = g.day AND d.arm = g.arm),
cum AS (
  SELECT day, arm,
         CAST(SUM(n) OVER (PARTITION BY arm ORDER BY day
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cn,
         CAST(SUM(s) OVER (PARTITION BY arm ORDER BY day
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cs
  FROM dg),
wide AS (
  SELECT a.day, a.cn AS na, a.cs AS sa, b.cn AS nb, b.cs AS sb
  FROM (SELECT * FROM cum WHERE arm = 0) a
  JOIN (SELECT * FROM cum WHERE arm = 1) b USING (day)
  WHERE a.cn > 0 AND b.cn > 0),
idx AS (
  SELECT day, na, sa, nb, sb,
         ROW_NUMBER() OVER (ORDER BY day) AS t_idx,
         (SELECT COUNT(DISTINCT day) FROM e) AS T
  FROM wide)
SELECT day, na AS n_a, nb AS n_b,
       ROUND(((sa / 100.0) / na - (sb / 100.0) / nb)
             / sqrt(((v.Q / 10000.0 - v.N * ((v.S / 100.0) / v.N)
                      * ((v.S / 100.0) / v.N)) / (v.N - 1))
                    * (1.0 / na + 1.0 / nb)), 6) AS z,
       ROUND({_GSQ_C} / sqrt(t_idx / (T * 1.0)), 6) AS boundary,
       ABS(((sa / 100.0) / na - (sb / 100.0) / nb)
           / sqrt(((v.Q / 10000.0 - v.N * ((v.S / 100.0) / v.N)
                    * ((v.S / 100.0) / v.N)) / (v.N - 1))
                  * (1.0 / na + 1.0 / nb)))
         > {_GSQ_C} / sqrt(t_idx / (T * 1.0)) AS crossed
FROM idx, v ORDER BY day
"""


def ensure_scene_videos_parquet(sf_dir: str) -> str:
    """Materialize the scene-cut video corpus + synthesis-time truth sidecar
    (sources/media.py::build_scene_video_table)."""
    import os as _os

    from ...sources.media import build_scene_video_table

    n = max(40, min(4000, int(4000 * _sf_of(sf_dir))))
    _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "scene_cuts_truth.parquet"),
        lambda: build_scene_video_table(n)[1],
    )
    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "scene_videos.parquet"),
        lambda: build_scene_video_table(n)[0],
    )


def q_video_scene_cuts(sf_dir: str) -> pd.DataFrame:
    """Scene-cut detection through REAL container decode —
    ``stages/multimodal.py::SceneCutDetector`` actor pool over VID0
    payloads, integer frame-diff threshold rule; oracle = the truth sidecar
    computed at synthesis time from the source pixel arrays (a decode bug
    cannot cancel out)."""
    from ...stages.multimodal import SceneCutDetector

    path = ensure_scene_videos_parquet(sf_dir)
    ds = rd.read_parquet(path, columns=["media_id", "payload"])
    out = (
        ds.map_batches(SceneCutDetector, batch_size=32, concurrency=2,
                       batch_format="pyarrow")
        .to_pandas()
        .sort_values(["media_id", "cut_index"], ignore_index=True)
    )
    return _i64(out, ["cut_index"])


SQL_VIDEO_SCENE_CUTS = """
SELECT media_id, cut_index
FROM read_parquet('{AD}/scene_cuts_truth.parquet')
ORDER BY media_id, cut_index
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


def ensure_unigram_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``unigram_lm_segment``: per-source segmentation
    totals from an INDEPENDENT scalar derivation — its own counting loops
    and a recursive memoized Viterbi with an explicit tie comparison —
    against the engine's iterative DP over broadcast integer costs."""
    import math as _math
    import os as _os
    from collections import Counter, defaultdict
    from functools import lru_cache

    from ...functions.unigram import TOP_NGRAMS

    def build() -> pa.Table:
        t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text", "source"])
        occ: Counter = Counter()
        per_source_words: dict[str, list[str]] = defaultdict(list)
        for txt, src in zip(t["text"].to_pylist(), t["source"].to_pylist()):
            for w in (txt or "").split():
                per_source_words[src].append(w)
                for L in (1, 2, 3):
                    for i in range(len(w) - L + 1):
                        occ[w[i : i + L]] += 1
        vocab = {p: c for p, c in occ.items() if len(p) == 1}
        for L in (2, 3):
            pool = sorted(
                ((p, c) for p, c in occ.items() if len(p) == L),
                key=lambda x: (-x[1], x[0]),
            )[:TOP_NGRAMS]
            vocab.update(dict(pool))
        total = sum(vocab.values())
        cost = {p: int(round(-_math.log(c / total) * 1_000_000))
                for p, c in vocab.items()}

        @lru_cache(maxsize=None)
        def seg(word: str) -> tuple[int, int]:
            # returns (cost, n_pieces); tie prefers the LONGER final piece
            if not word:
                return (0, 0)
            best = None
            for L in (1, 2, 3):  # ascending: later (longer) ties overwrite
                if L > len(word) or word[len(word) - L:] not in cost:
                    continue
                pc_, pn = seg(word[: len(word) - L])
                cand = (pc_ + cost[word[len(word) - L:]], pn + 1)
                if best is None or cand <= best:
                    best = cand
            return best

        rows = []
        for src in sorted(per_source_words):
            nw = np_ = nc = 0
            for w in per_source_words[src]:
                c, p = seg(w)
                nw += 1
                np_ += p
                nc += c
            rows.append((src, nw, np_, nc))
        return pa.table(
            {"source": pa.array([r[0] for r in rows]),
             "n_words": pa.array([r[1] for r in rows], pa.int64()),
             "n_pieces": pa.array([r[2] for r in rows], pa.int64()),
             "nll_unats": pa.array([r[3] for r in rows], pa.int64())}
        )

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "unigram_ref.parquet"), build
    )


def q_unigram_lm_segment(sf_dir: str) -> pd.DataFrame:
    """Unigram-LM (SentencePiece-style) Viterbi subword segmentation —
    ``functions/unigram.py``: vocabulary from one substring-count exchange,
    broadcast integer µnat costs, per-batch memoized DP; per-source totals.
    Oracle = independent recursive scalar implementation (artifact)."""
    from ...functions.unigram import unigram_segment_stats

    ensure_unigram_parquet(sf_dir)
    ds = _t(sf_dir, "documents", ["text", "source"])
    out = unigram_segment_stats(ds)
    return _i64(out, ["n_words", "n_pieces", "nll_unats"])


SQL_UNIGRAM_LM_SEGMENT = """
SELECT source, n_words, n_pieces, nll_unats
FROM read_parquet('{AD}/unigram_ref.parquet') ORDER BY source
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


_MARGIN_K = 4


def q_margin_knn_bitext(sf_dir: str) -> pd.DataFrame:
    """Margin-based cross-set pair mining over embeddings (label 0 vs
    label 1) — ``functions/sim.py::margin_knn_pairs``: ratio-margin
    scoring with integer µcos k-NN sums, mutual-best pairs only."""
    from ...functions.sim import margin_knn_pairs

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    return margin_knn_pairs(ds, 0, 1, k=_MARGIN_K)


SQL_MARGIN_KNN_BITEXT = f"""
WITH A AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE label = 0),
B AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE label = 1),
c AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
         CAST(ROUND(list_cosine_similarity(a.e, b.e) * 1000000) AS BIGINT) AS ci
  FROM A a CROSS JOIN B b),
ka AS (
  SELECT ia, CAST(SUM(ci) AS BIGINT) AS sa
  FROM (SELECT ia, ci, ROW_NUMBER() OVER (PARTITION BY ia ORDER BY ci DESC, ib) AS rn
        FROM c)
  WHERE rn <= {_MARGIN_K} GROUP BY ia),
kb AS (
  SELECT ib, CAST(SUM(ci) AS BIGINT) AS sb
  FROM (SELECT ib, ci, ROW_NUMBER() OVER (PARTITION BY ib ORDER BY ci DESC, ia) AS rn
        FROM c)
  WHERE rn <= {_MARGIN_K} GROUP BY ib),
m AS (
  SELECT c.ia, c.ib, c.ci / ((ka.sa + kb.sb) / (2.0 * {_MARGIN_K})) AS margin
  FROM c JOIN ka USING (ia) JOIN kb USING (ib)),
ba AS (SELECT ia, ib, margin,
              ROW_NUMBER() OVER (PARTITION BY ia ORDER BY margin DESC, ib) AS r
       FROM m),
bb AS (SELECT ia, ib,
              ROW_NUMBER() OVER (PARTITION BY ib ORDER BY margin DESC, ia) AS r
       FROM m)
SELECT ba.ia AS vec_a, ba.ib AS vec_b, ROUND(ba.margin, 6) AS margin
FROM ba JOIN bb ON bb.ia = ba.ia AND bb.ib = ba.ib AND ba.r = 1 AND bb.r = 1
ORDER BY vec_a
"""


