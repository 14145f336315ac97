"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import _i64, _rd, _t, grouped_sums, np, pa, pc, pd, topk  # noqa: F401

# ---------------------------------------------------------------------------
# Wave 20: Gorilla timestamp compression audit, Dirichlet query-likelihood
# retrieval, difference-in-differences
# ---------------------------------------------------------------------------

_GOR_HEADER_BITS = 64
_GOR_FIRST_DELTA_BITS = 36


def q_gorilla_timestamp_audit(sf_dir: str) -> pd.DataFrame:
    """Gorilla-style timestamp compression audit (Pelkonen et al. 2015 §4.1
    adapted to µs): per user stream, delta-of-delta of consecutive event
    timestamps classed into integer bit buckets (0→1 bit, ≤2¹²→14,
    ≤2²⁰→24, ≤2³⁰→34, else 68) plus a 64-bit header and 36-bit first delta
    per stream — the time-series storage sizing decision, all integer.
    Users co-locate through one bucketed exchange; only the 5-bucket
    histogram reduces."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
        uid = df["user_id"].to_numpy(np.int64)
        tsu = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        new_u = np.r_[True, uid[1:] != uid[:-1]]
        delta = np.diff(tsu, prepend=np.int64(0))
        dod = np.diff(delta, prepend=np.int64(0))
        # position within user: 0 = header row, 1 = first delta, ≥2 = dod
        seg = np.cumsum(new_u) - 1
        first_idx = np.nonzero(new_u)[0]
        posn = np.arange(len(df), dtype=np.int64) - first_idx[seg]
        dv = np.abs(dod)
        cls = np.select(
            [dv == 0, dv <= 1 << 12, dv <= 1 << 20, dv <= 1 << 30],
            [np.int64(1), np.int64(14), np.int64(24), np.int64(34)],
            default=np.int64(68),
        )
        rows = []
        n_streams = int(new_u.sum())
        rows.append(("header", n_streams, n_streams * _GOR_HEADER_BITS))
        fd = int((posn == 1).sum())
        rows.append(("first_delta", fd, fd * _GOR_FIRST_DELTA_BITS))
        m = posn >= 2
        for bits, name in [(1, "dod_0"), (14, "dod_14"), (24, "dod_24"),
                           (34, "dod_34"), (68, "dod_68")]:
            k = int((m & (cls == bits)).sum())
            if k:
                rows.append((name, k, k * bits))
        return pd.DataFrame(rows, columns=["bucket", "n", "bits"])

    hist = grouped_sums(
        bucketed_group_reduce(ds, ["user_id"], per_bucket, num_buckets=32),
        ["bucket"],
        {"n": "n", "bits": "bits"},
    ).to_pandas()
    out = hist.sort_values("bucket", ignore_index=True)
    return _i64(out, ["n", "bits"])


SQL_GORILLA_TIMESTAMP_AUDIT = f"""
WITH s AS (
  SELECT user_id, epoch_us(ts) AS tsu,
         ROW_NUMBER() OVER w AS posn,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS delta,
         (epoch_us(ts) - LAG(epoch_us(ts)) OVER w)
           - (LAG(epoch_us(ts)) OVER w - LAG(epoch_us(ts), 2) OVER w) AS dod
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
lab AS (
  SELECT CASE WHEN posn = 1 THEN 'header'
              WHEN posn = 2 THEN 'first_delta'
              WHEN ABS(dod) = 0 THEN 'dod_0'
              WHEN ABS(dod) <= 4096 THEN 'dod_14'
              WHEN ABS(dod) <= 1048576 THEN 'dod_24'
              WHEN ABS(dod) <= 1073741824 THEN 'dod_34'
              ELSE 'dod_68' END AS bucket,
         CASE WHEN posn = 1 THEN {_GOR_HEADER_BITS}
              WHEN posn = 2 THEN {_GOR_FIRST_DELTA_BITS}
              WHEN ABS(dod) = 0 THEN 1
              WHEN ABS(dod) <= 4096 THEN 14
              WHEN ABS(dod) <= 1048576 THEN 24
              WHEN ABS(dod) <= 1073741824 THEN 34
              ELSE 68 END AS b
  FROM s)
SELECT bucket, COUNT(*) AS n, CAST(SUM(b) AS BIGINT) AS bits
FROM lab GROUP BY 1 ORDER BY bucket
"""


_QL_MU = 2000
_QL_TERMS = 3


def q_dirichlet_ql_retrieval(sf_dir: str) -> pd.DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai & Lafferty
    2001), self-contained: the query is the corpus's 3 most frequent words;
    each document scores Σ_q round(10⁶·ln((tf·|C| + µ·cf) / ((dl+µ)·|C|)))
    µnats — the log runs over a ratio of EXACT integers on both engines
    (libm/DuckDB LN parity, the dp_event_counts convention), so scores are
    bit-deterministic.  Pass 1 is one word-count combiner exchange; pass 2
    broadcasts the 3-term stats and scores every doc in one vectorized scan.
    Top-10 docs."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def wc_partial(t: pa.Table) -> pd.DataFrame:
        lst = pc.split_pattern(t["text"], " ").combine_chunks()
        w = lst.values.to_numpy(zero_copy_only=False)
        ww, cc = np.unique(w, return_counts=True)
        return pd.DataFrame({"w": ww, "c": cc.astype(np.int64)})

    wc = grouped_sums(
        ds.map_batches(wc_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["w"],
        {"c": "c"},
    )
    top = topk(wc, ["c", "w"], [True, False], _QL_TERMS).to_pandas()
    terms = top["w"].astype(str).tolist()
    cfs = {str(w): int(c) for w, c in zip(top["w"], top["c"])}
    ctot = int(wc.map_batches(
        lambda t: pa.table({"s": pa.array([pc.sum(t["c"]).as_py() or 0], pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True,
    ).to_pandas()["s"].sum())

    def score(t: pa.Table, *, _terms=terms, _cfs=cfs, _ctot=ctot) -> pd.DataFrame:
        lst = pc.split_pattern(t["text"], " ").combine_chunks()
        off = np.asarray(lst.offsets, dtype=np.int64)
        lens = np.diff(off)
        w = lst.values.to_numpy(zero_copy_only=False)
        n = len(lens)
        total = np.zeros(n, dtype=np.int64)
        row = np.repeat(np.arange(n, dtype=np.int64), lens)
        for q in _terms:
            tf = np.bincount(row[w == q], minlength=n).astype(np.int64)
            num = (tf * _ctot + _QL_MU * _cfs[q]).astype(np.float64)
            den = ((lens + _QL_MU) * _ctot).astype(np.float64)
            total += _rd(np.log(num / den) * 1e6, 0).astype(np.int64)
        return pd.DataFrame(
            {"doc_id": t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
             "score_unats": total}
        )

    scored = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    out = topk(scored, ["score_unats", "doc_id"], [True, False], 10).to_pandas()
    out["q1"], out["q2"], out["q3"] = terms[0], terms[1], terms[2]
    return _i64(out, ["doc_id", "score_unats"]).reset_index(drop=True)


SQL_DIRICHLET_QL_RETRIEVAL = f"""
WITH w AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS wd FROM documents),
cnt AS (SELECT wd, COUNT(*) AS c FROM w GROUP BY 1),
ctot AS (SELECT CAST(SUM(c) AS BIGINT) AS s FROM cnt),
q AS (SELECT wd, c, ROW_NUMBER() OVER (ORDER BY c DESC, wd) AS qi
      FROM cnt ORDER BY c DESC, wd LIMIT {_QL_TERMS}),
dl AS (SELECT doc_id, LEN(string_split(text, ' ')) AS l FROM documents),
tf AS (SELECT w.doc_id, q.wd, q.c AS cf, COUNT(*) AS f
       FROM w JOIN q ON q.wd = w.wd GROUP BY 1, 2, 3),
sc AS (
  SELECT dl.doc_id,
         CAST(SUM(CAST(ROUND(LN(CAST(COALESCE(tf.f, 0) * (SELECT s FROM ctot)
                                     + {_QL_MU} * q.c AS DOUBLE)
                                / CAST((dl.l + {_QL_MU}) * (SELECT s FROM ctot)
                                       AS DOUBLE)) * 1000000, 0) AS BIGINT))
              AS BIGINT) AS score_unats
  FROM dl CROSS JOIN q
  LEFT JOIN tf ON tf.doc_id = dl.doc_id AND tf.wd = q.wd
  GROUP BY 1),
qq AS (SELECT MAX(CASE WHEN qi = 1 THEN wd END) AS q1,
              MAX(CASE WHEN qi = 2 THEN wd END) AS q2,
              MAX(CASE WHEN qi = 3 THEN wd END) AS q3
       FROM q)
SELECT sc.doc_id, sc.score_unats, qq.q1, qq.q2, qq.q3
FROM sc CROSS JOIN qq
ORDER BY sc.score_unats DESC, sc.doc_id LIMIT 10
"""


def q_diff_in_diff(sf_dir: str) -> pd.DataFrame:
    """Difference-in-differences over the event stream: treatment = odd
    user ids, periods split at the stream's integer midpoint timestamp;
    outcome = mean purchase cents per (group, period).  One (group, period)
    combiner exchange carries exact integer (sum, n); the four means and the
    DiD estimate close driver-side with the same double expressions the
    oracle evaluates."""
    ds = _t(sf_dir, "events", ["user_id", "ts", "event_type", "value"])

    def minmax(t: pa.Table) -> pa.Table:
        m = pc.cast(t["ts"], pa.int64())
        return pa.table({"lo": pa.array([pc.min(m).as_py()], pa.int64()),
                         "hi": pa.array([pc.max(m).as_py()], pa.int64())})

    mm = ds.map_batches(minmax, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    lo, hi = int(mm["lo"].min()), int(mm["hi"].max())
    cut = lo + (hi - lo) // 2

    def part(t: pa.Table, *, _cut=cut) -> pd.DataFrame:
        is_p = pc.equal(t["event_type"], "purchase").to_numpy(zero_copy_only=False)
        if not is_p.any():
            return pd.DataFrame({"grp": pd.Series([], dtype=object),
                                 "period": pd.Series([], dtype=object),
                                 "cents": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)[is_p]
        tsu = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)[is_p]
        cents = _rd(t["value"].to_numpy(zero_copy_only=False)[is_p] * 100.0, 0).astype(np.int64)
        df = pd.DataFrame(
            {"grp": np.where(uid % 2 == 1, "treat", "control"),
             "period": np.where(tsu >= _cut, "post", "pre"),
             "cents": cents, "n": 1}
        )
        return df.groupby(["grp", "period"], as_index=False).sum()

    g = grouped_sums(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["grp", "period"],
        {"cents": "cents", "n": "n"},
    ).to_pandas().set_index(["grp", "period"])

    def mean(grp: str, period: str) -> float:
        # an empty cell is NULL on the SQL side → NaN here, and NaN
        # propagates through the DiD arithmetic identically
        if (grp, period) not in g.index:
            return float("nan")
        r = g.loc[(grp, period)]
        return float(r["cents"]) / float(r["n"])

    m_tpre, m_tpost = mean("treat", "pre"), mean("treat", "post")
    m_cpre, m_cpost = mean("control", "pre"), mean("control", "post")
    did = (m_tpost - m_tpre) - (m_cpost - m_cpre)
    out = pd.DataFrame(
        {"m_treat_pre": [_rd(m_tpre, 6)], "m_treat_post": [_rd(m_tpost, 6)],
         "m_control_pre": [_rd(m_cpre, 6)], "m_control_post": [_rd(m_cpost, 6)],
         "did_cents": [_rd(did, 6)]}
    )
    return out


SQL_DIFF_IN_DIFF = """
WITH mm AS (SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events),
p AS (
  SELECT CASE WHEN user_id % 2 = 1 THEN 'treat' ELSE 'control' END AS grp,
         CASE WHEN epoch_us(ts) >= (SELECT lo + (hi - lo) // 2 FROM mm)
              THEN 'post' ELSE 'pre' END AS period,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'),
g AS (SELECT grp, period, CAST(SUM(cents) AS BIGINT) AS s, COUNT(*) AS n
      FROM p GROUP BY 1, 2),
m AS (SELECT
    MAX(CASE WHEN grp = 'treat' AND period = 'pre'
             THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS m_tpre,
    MAX(CASE WHEN grp = 'treat' AND period = 'post'
             THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS m_tpost,
    MAX(CASE WHEN grp = 'control' AND period = 'pre'
             THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS m_cpre,
    MAX(CASE WHEN grp = 'control' AND period = 'post'
             THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS m_cpost
  FROM g)
SELECT ROUND(m_tpre, 6) AS m_treat_pre, ROUND(m_tpost, 6) AS m_treat_post,
       ROUND(m_cpre, 6) AS m_control_pre, ROUND(m_cpost, 6) AS m_control_post,
       ROUND((m_tpost - m_tpre) - (m_cpost - m_cpre), 6) AS did_cents
FROM m
"""


