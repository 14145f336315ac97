"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import ORACLE_ARTIFACT_DIR, _corpus_dir, _i64, _rd, _t, np, pa, pd, pq  # noqa: F401
from .neardup_a import _ensure_artifact  # noqa: F401

# ---------------------------------------------------------------------------
# Session-4 wave 8: CDC storage dedup, mixture ESS, PSI drift, ECE
# calibration, CUPED variance reduction
# ---------------------------------------------------------------------------


def ensure_cdc_chunks_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``cdc_chunk_dedup``: every chunk's (source, hash,
    nbytes) from the INDEPENDENT scalar chunker (python-int window sums and
    polynomial hashes, ``cdc.py::chunk_text_scalar``) — the SQL oracle does
    all aggregation itself."""
    import os as _os

    def build() -> pa.Table:
        from ...functions.cdc import chunk_text_scalar

        t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text", "source"])
        srcs, hs, ls = [], [], []
        for s, txt in zip(t["source"].to_pylist(), t["text"].to_pylist()):
            for h, ln in chunk_text_scalar(txt or ""):
                srcs.append(s)
                hs.append(h - (1 << 64) if h >= (1 << 63) else h)  # int64 view
                ls.append(ln)
        return pa.table({
            "source": pa.array(srcs),
            "h": pa.array(hs, pa.int64()),
            "nbytes": pa.array(ls, pa.int64())})

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "cdc_chunks_ref.parquet"), build)


def q_cdc_chunk_dedup(sf_dir: str) -> pd.DataFrame:
    """Content-defined-chunking storage dedup audit per source: chunk every
    document with the Gear-boundary CDC kernel (``functions/cdc.py`` —
    vectorized k-tap rolling hash over the Arrow flat buffer), then count
    total vs distinct chunks and bytes.  Chunk identity is 64-bit hash
    equality (same contract as the gram family).  Distributed shape:
    per-batch (source, h, nbytes) combiner-distinct rows → one hash
    exchange for the distinct count; totals ride scalar partials.  Oracle:
    aggregation in SQL over the independent scalar chunker's artifact."""
    from ...functions.cdc import chunk_column
    from ...functions.relational import bucketed_group_reduce

    ensure_cdc_chunks_parquet(sf_dir)
    docs = _t(sf_dir, "documents", ["text", "source"])

    # one chunking pass emits (source, h, nbytes) rows (~1/64 of corpus
    # bytes); totals are re-derived from them by a cheap combiner
    rows = docs.map_batches(
        lambda t: (lambda d, h, ln: pa.table({
            "source": pa.array(t["source"].to_numpy(zero_copy_only=False)[d]),
            "h": pa.array(h.view(np.int64)),
            "nbytes": pa.array(ln)}))(*chunk_column(t["text"])),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    tot = (
        rows.map_batches(
            lambda t: pa.Table.from_pandas(
                pd.DataFrame({
                    "source": t["source"].to_numpy(zero_copy_only=False),
                    "nbytes": t["nbytes"].to_numpy(zero_copy_only=False)})
                .groupby("source", as_index=False)
                .agg(n_chunks=("nbytes", "size"), bytes_total=("nbytes", "sum")),
                preserve_index=False),
            batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas().groupby("source", as_index=False).sum()
    )

    def distinct_part(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["source", "h"])

    uniq = (
        bucketed_group_reduce(rows, ["h"], distinct_part, num_buckets=16)
        .to_pandas().drop_duplicates(["source", "h"])
        .groupby("source", as_index=False)
        .agg(n_distinct=("h", "size"), bytes_unique=("nbytes", "sum"))
    )
    out = tot.merge(uniq, on="source")
    out["dup_ratio"] = [
        _rd(1 - nd * 1.0 / nc, 6)
        for nd, nc in zip(out["n_distinct"], out["n_chunks"])]
    out = out[["source", "n_chunks", "n_distinct", "bytes_total",
               "bytes_unique", "dup_ratio"]].sort_values("source", ignore_index=True)
    return _i64(out, ["n_chunks", "n_distinct", "bytes_total", "bytes_unique"])


SQL_CDC_CHUNK_DEDUP = """
WITH c AS (SELECT * FROM read_parquet('{AD}/cdc_chunks_ref.parquet')),
d AS (
  SELECT source, COUNT(*) AS n_chunks, CAST(SUM(nbytes) AS BIGINT) AS bytes_total
  FROM c GROUP BY 1),
u AS (
  SELECT source, COUNT(*) AS n_distinct, CAST(SUM(nbytes) AS BIGINT) AS bytes_unique
  FROM (SELECT DISTINCT source, h, nbytes FROM c) GROUP BY 1)
SELECT d.source, d.n_chunks, u.n_distinct, d.bytes_total, u.bytes_unique,
       ROUND(1 - u.n_distinct * 1.0 / d.n_chunks, 6) AS dup_ratio
FROM d JOIN u USING (source) ORDER BY source
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


def q_mixture_ess_audit(sf_dir: str) -> pd.DataFrame:
    """Effective-sample-size audit of a length-weighted mixture: per source,
    ESS = (Σw)²/Σw² with w = n_chars (Kish 1965; the quantity that says how
    much of a weighted corpus actually contributes).  Integer sums only,
    the two float expressions mirrored in SQL.  One combiner map, 3 scalar
    partials per (batch, source)."""
    docs = _t(sf_dir, "documents", ["source", "n_chars"])

    def part(t: pa.Table) -> pd.DataFrame:
        w = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"source": t["source"].to_numpy(zero_copy_only=False),
                           "w": w, "w2": w * w})
        return df.groupby("source", as_index=False).agg(
            n_docs=("w", "size"), sum_w=("w", "sum"), sum_w2=("w2", "sum"))

    p = (
        docs.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas().groupby("source", as_index=False).sum()
    )
    p["ess"] = [_rd(sw * 1.0 * sw / sw2, 6)
                for sw, sw2 in zip(p["sum_w"], p["sum_w2"])]
    p["ess_ratio"] = [_rd(sw * 1.0 * sw / sw2 / n, 6)
                      for sw, sw2, n in zip(p["sum_w"], p["sum_w2"], p["n_docs"])]
    out = p.sort_values("source", ignore_index=True)
    return _i64(out, ["n_docs", "sum_w", "sum_w2"])


SQL_MIXTURE_ESS_AUDIT = """
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_w,
       CAST(SUM(n_chars * n_chars) AS BIGINT) AS sum_w2,
       ROUND(SUM(n_chars) * 1.0 * SUM(n_chars) / SUM(n_chars * n_chars), 6)
         AS ess,
       ROUND(SUM(n_chars) * 1.0 * SUM(n_chars) / SUM(n_chars * n_chars)
             / COUNT(*), 6) AS ess_ratio
FROM documents GROUP BY source ORDER BY source
"""


_PSI_BIN_CENTS = 500  # fixed $5 value bins, capped at bin 9


def q_psi_drift(sf_dir: str) -> pd.DataFrame:
    """Population-stability-index drift audit per event type: the event
    VALUE distribution of the first time-half vs the second (split at the
    integer midpoint of the observed µs range), over 10 fixed $5 bins with
    +1 Laplace smoothing.  PSI = Σ_b (p2−p1)·ln(p2/p1) — all counts are
    integers; the float formula is mirrored term-for-term.  Two cheap
    exchanges: the global (min,max) scalar and the (type, half, bin) count
    partials."""
    import math as _math

    ds = _t(sf_dir, "events", ["ts", "event_type", "value"])

    def minmax(t: pa.Table) -> pd.DataFrame:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pd.DataFrame({"lo": [int(ts.min())], "hi": [int(ts.max())]})

    mm = ds.map_batches(minmax, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    mid = (int(mm["lo"].min()) + int(mm["hi"].max())) // 2

    def part(t: pa.Table, *, mid=mid) -> pd.DataFrame:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = _rd(t["value"].to_numpy(zero_copy_only=False) * 100, 0).astype(np.int64)
        b = np.minimum(cents // _PSI_BIN_CENTS, 9)
        half = np.where(ts < mid, 1, 2)
        df = pd.DataFrame({
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            "half": half, "b": b})
        return df.groupby(["event_type", "half", "b"], as_index=False).size()

    cnt = (
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas().groupby(["event_type", "half", "b"], as_index=False)["size"].sum()
    )
    rows = []
    for et, sub in cnt.groupby("event_type"):
        c1 = np.zeros(10, np.int64)
        c2 = np.zeros(10, np.int64)
        for _, r in sub.iterrows():
            (c1 if r["half"] == 1 else c2)[int(r["b"])] = int(r["size"])
        n1, n2 = int(c1.sum()), int(c2.sum())
        psi = 0.0
        for bb in range(10):
            p1 = (int(c1[bb]) + 1) / (n1 + 10)
            p2 = (int(c2[bb]) + 1) / (n2 + 10)
            psi += (p2 - p1) * _math.log(p2 / p1)
        rows.append((et, n1, n2, _rd(psi, 6)))
    out = pd.DataFrame(rows, columns=["event_type", "n_first", "n_second", "psi"]
                       ).sort_values("event_type", ignore_index=True)
    return _i64(out, ["n_first", "n_second"])


SQL_PSI_DRIFT = """
WITH mm AS (
  SELECT (CAST(epoch_us(MIN(ts)) AS BIGINT)
          + CAST(epoch_us(MAX(ts)) AS BIGINT)) // 2 AS mid
  FROM events),
e AS (
  SELECT event_type,
         CASE WHEN epoch_us(ts) < mm.mid THEN 1 ELSE 2 END AS half,
         LEAST(CAST(ROUND(value * 100) AS BIGINT) // {BIN}, 9) AS b
  FROM events CROSS JOIN mm),
grid AS (
  SELECT t.event_type, h.h AS half, g.i AS b
  FROM (SELECT DISTINCT event_type FROM e) t,
       (SELECT UNNEST([1, 2]) AS h) h, generate_series(0, 9) g(i)),
cnt AS (
  SELECT grid.event_type, grid.half, grid.b,
         COALESCE(c.n, 0) AS n
  FROM grid LEFT JOIN (
    SELECT event_type, half, b, COUNT(*) AS n FROM e GROUP BY 1, 2, 3) c
    ON c.event_type = grid.event_type AND c.half = grid.half AND c.b = grid.b),
tot AS (
  SELECT event_type, half, CAST(SUM(n) AS BIGINT) AS nt
  FROM cnt GROUP BY 1, 2),
j AS (
  SELECT a.event_type, a.b,
         (a.n + 1) * 1.0 / (t1.nt + 10) AS p1,
         (b2.n + 1) * 1.0 / (t2.nt + 10) AS p2,
         t1.nt AS n1, t2.nt AS n2
  FROM cnt a
  JOIN cnt b2 ON b2.event_type = a.event_type AND b2.b = a.b AND b2.half = 2
  JOIN tot t1 ON t1.event_type = a.event_type AND t1.half = 1
  JOIN tot t2 ON t2.event_type = a.event_type AND t2.half = 2
  WHERE a.half = 1)
SELECT event_type, MAX(n1) AS n_first, MAX(n2) AS n_second,
       ROUND(SUM((p2 - p1) * ln(p2 / p1)), 6) AS psi
FROM j GROUP BY event_type ORDER BY event_type
""".replace("{BIN}", str(_PSI_BIN_CENTS))


def q_ece_calibration(sf_dir: str) -> pd.DataFrame:
    """Expected-calibration-error audit with a leakage-free split: each
    user's CONFIDENCE is their purchase rate over even event_ids, the
    OUTCOME their rate over odd event_ids; users are binned by µ-quantized
    confidence (floor((1e6·p_even)//n_even) // 100000, clamped to 9).  Per
    bin: n_users, mean confidence and accuracy in µ-units (integer sums,
    one mirrored division), and the calibration gap.  Distributed shape:
    per-user 4-counter partials inside the bucketed exchange."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "event_id", "event_type"])

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        even = (df["event_id"].to_numpy() % 2) == 0
        pur = (df["event_type"] == "purchase").to_numpy()
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(),
            "ne": even.astype(np.int64),
            "pe": (even & pur).astype(np.int64),
            "no": (~even).astype(np.int64),
            "po": (~even & pur).astype(np.int64),
        }).groupby("user_id", as_index=False).sum()

    u = bucketed_group_reduce(ds, ["user_id"], per_user, num_buckets=16).to_pandas()
    u = u.groupby("user_id", as_index=False).sum()
    u = u[(u["ne"] > 0) & (u["no"] > 0)]
    conf_mu = (1_000_000 * u["pe"].to_numpy(np.int64)) // u["ne"].to_numpy(np.int64)
    acc_mu = (1_000_000 * u["po"].to_numpy(np.int64)) // u["no"].to_numpy(np.int64)
    bins = np.minimum(conf_mu // 100_000, 9)
    df = pd.DataFrame({"bin": bins, "conf_mu": conf_mu, "acc_mu": acc_mu})
    g = df.groupby("bin", as_index=False).agg(
        n_users=("conf_mu", "size"), sum_conf=("conf_mu", "sum"),
        sum_acc=("acc_mu", "sum"))
    g["avg_conf"] = [_rd(sc * 1.0 / n, 6) for sc, n in zip(g["sum_conf"], g["n_users"])]
    g["avg_acc"] = [_rd(sa * 1.0 / n, 6) for sa, n in zip(g["sum_acc"], g["n_users"])]
    g["gap"] = [_rd(abs(sc * 1.0 / n - sa * 1.0 / n), 6)
                for sc, sa, n in zip(g["sum_conf"], g["sum_acc"], g["n_users"])]
    out = g[["bin", "n_users", "avg_conf", "avg_acc", "gap"]].sort_values(
        "bin", ignore_index=True)
    return _i64(out, ["bin", "n_users"])


SQL_ECE_CALIBRATION = """
WITH u AS (
  SELECT user_id,
         SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS ne,
         SUM(CASE WHEN event_id % 2 = 0 AND event_type = 'purchase'
                  THEN 1 ELSE 0 END) AS pe,
         SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS no,
         SUM(CASE WHEN event_id % 2 = 1 AND event_type = 'purchase'
                  THEN 1 ELSE 0 END) AS po
  FROM events GROUP BY user_id),
q AS (
  SELECT (1000000 * pe) // ne AS conf_mu, (1000000 * po) // no AS acc_mu
  FROM u WHERE ne > 0 AND no > 0),
b AS (
  SELECT LEAST(conf_mu // 100000, 9) AS bin, conf_mu, acc_mu FROM q)
SELECT CAST(bin AS BIGINT) AS bin, COUNT(*) AS n_users,
       ROUND(SUM(conf_mu) * 1.0 / COUNT(*), 6) AS avg_conf,
       ROUND(SUM(acc_mu) * 1.0 / COUNT(*), 6) AS avg_acc,
       ROUND(ABS(SUM(conf_mu) * 1.0 / COUNT(*)
                 - SUM(acc_mu) * 1.0 / COUNT(*)), 6) AS gap
FROM b GROUP BY bin ORDER BY bin
"""


def q_cuped_adjustment(sf_dir: str) -> pd.DataFrame:
    """CUPED variance-reduced A/B readout (Deng et al. WSDM'13): users are
    arms by parity, the pre-period metric is each user's value-cents in the
    first time-half, post in the second; θ = cov(pre,post)/var(pre) from
    raw-moment identities (N·Σxy − Σx·Σy over N·Σx² − (Σx)²) so every sum
    is integer; adjusted mean = mean_post − θ·(mean_pre_arm − mean_pre).
    The float expressions are mirrored token-for-token in SQL."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts", "value"])

    def minmax(t: pa.Table) -> pd.DataFrame:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pd.DataFrame({"lo": [int(ts.min())], "hi": [int(ts.max())]})

    mm = ds.map_batches(minmax, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    mid = (int(mm["lo"].min()) + int(mm["hi"].max())) // 2

    def per_user(df: pd.DataFrame, *, mid=mid) -> pd.DataFrame:
        ts = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        cents = _rd(df["value"].to_numpy(np.float64) * 100, 0).astype(np.int64)
        pre = np.where(ts < mid, cents, 0)
        post = np.where(ts >= mid, cents, 0)
        g = pd.DataFrame({"user_id": df["user_id"].to_numpy(),
                          "pre": pre, "post": post}).groupby(
            "user_id", as_index=False).sum()
        return g

    u = (
        bucketed_group_reduce(ds, ["user_id"], per_user, num_buckets=16)
        .to_pandas().groupby("user_id", as_index=False).sum()
    )
    n = len(u)
    x = u["pre"].to_numpy(np.int64)
    y = u["post"].to_numpy(np.int64)
    cov_num = n * int((x * y).sum()) - int(x.sum()) * int(y.sum())
    var_num = n * int((x * x).sum()) - int(x.sum()) ** 2
    theta = cov_num * 1.0 / var_num
    mean_pre_all = int(x.sum()) * 1.0 / n
    arm = (u["user_id"].to_numpy(np.int64) % 2).astype(np.int64)
    rows = []
    for a in (0, 1):
        m = arm == a
        na = int(m.sum())
        mp = int(y[m].sum()) * 1.0 / na
        mpre = int(x[m].sum()) * 1.0 / na
        rows.append((a, na, _rd(mp, 6),
                     _rd(mp - cov_num * 1.0 / var_num * (mpre - mean_pre_all), 6),
                     _rd(theta, 6)))
    out = pd.DataFrame(rows, columns=["arm", "n_users", "mean_post",
                                      "adjusted_mean", "theta"])
    return _i64(out, ["arm", "n_users"])


SQL_CUPED_ADJUSTMENT = """
WITH mm AS (
  SELECT (CAST(epoch_us(MIN(ts)) AS BIGINT)
          + CAST(epoch_us(MAX(ts)) AS BIGINT)) // 2 AS mid
  FROM events),
u AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN epoch_us(ts) < mm.mid
                  THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS pre,
         CAST(SUM(CASE WHEN epoch_us(ts) >= mm.mid
                  THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS post
  FROM events CROSS JOIN mm GROUP BY user_id),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(pre) AS BIGINT) AS sx, CAST(SUM(post) AS BIGINT) AS sy,
         CAST(SUM(pre * post) AS BIGINT) AS sxy,
         CAST(SUM(pre * pre) AS BIGINT) AS sxx
  FROM u),
arm AS (
  SELECT user_id % 2 AS arm, COUNT(*) AS na,
         CAST(SUM(pre) AS BIGINT) AS sxa, CAST(SUM(post) AS BIGINT) AS sya
  FROM u GROUP BY 1)
SELECT CAST(a.arm AS BIGINT) AS arm, CAST(a.na AS BIGINT) AS n_users,
       ROUND(a.sya * 1.0 / a.na, 6) AS mean_post,
       ROUND(a.sya * 1.0 / a.na
             - (s.n * s.sxy - s.sx * s.sy) * 1.0 / (s.n * s.sxx - s.sx * s.sx)
               * (a.sxa * 1.0 / a.na - s.sx * 1.0 / s.n), 6) AS adjusted_mean,
       ROUND((s.n * s.sxy - s.sx * s.sy) * 1.0
             / (s.n * s.sxx - s.sx * s.sx), 6) AS theta
FROM arm a CROSS JOIN s ORDER BY arm
"""


