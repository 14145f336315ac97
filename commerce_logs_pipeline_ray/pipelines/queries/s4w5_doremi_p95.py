"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import ORACLE_ARTIFACT_DIR, _i64, _rd, _t, np, pa, pc, pd, rd  # noqa: F401
from .cusum_twap import _copurchase_weighted_edges  # noqa: F401
from .neardup_a import ensure_derived_parquet  # noqa: F401

# ---------------------------------------------------------------------------
# Session-4 wave 5: DoReMi mixture step, sliding-window p95, seasonal
# decomposition, quantile normalization, Jaccard link prediction
# ---------------------------------------------------------------------------

_DOREMI_ETA = 0.5  # multiplicative-weights learning rate, per nat
_HOUR_US = 3_600_000_000


def q_doremi_mixture_step(sf_dir: str) -> pd.DataFrame:
    """One DoReMi-style mixture-reweighting step (Xie et al. 2023, public
    method) over the pre-tokenized corpus: per-source unigram-LM NLL (the
    excess-loss proxy), then multiplicative weights
    w_i ∝ exp(η·(nll_i − nll_global)).  Every accumulator is integer µnats
    and the tilt is quantized to integer µweights BEFORE normalizing, so
    the weight vector is bitwise deterministic (no float-order sums).
    One token-count exchange + one broadcast-cost scoring pass."""
    import math as _math

    path = ensure_derived_parquet(sf_dir)
    ds = rd.read_parquet(path, columns=["source", "tokens"])

    def count_part(t: pa.Table) -> pa.Table:
        toks = t["tokens"].combine_chunks() if isinstance(
            t["tokens"], pa.ChunkedArray) else t["tokens"]
        flat = toks.flatten()
        g = pa.table({"tok": flat}).group_by(["tok"]).aggregate([([], "count_all")])
        return pa.table({"tok": g["tok"], "n": pc.cast(g["count_all"], pa.int64())})

    cnt = (
        ds.map_batches(count_part, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby("tok")["n"]
        .sum()
    )
    total = int(cnt.sum())
    cost = {
        int(tok): int(round(-_math.log(int(c) / total) * 1_000_000))
        for tok, c in cnt.items()
    }

    import ray as _ray

    cost_ref = _ray.put(cost)

    def score_part(t: pa.Table) -> pa.Table:
        cst = _ray.get(cost_ref)
        toks = t["tokens"].combine_chunks() if isinstance(
            t["tokens"], pa.ChunkedArray) else t["tokens"]
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        offsets = np.asarray(toks.offsets)
        lens = offsets[1:] - offsets[:-1]
        keys = np.fromiter(cst.keys(), np.int64, len(cst))
        vals = np.fromiter(cst.values(), np.int64, len(cst))
        order = np.argsort(keys)
        costs = vals[order][np.searchsorted(keys[order], flat)]
        per_row = np.add.reduceat(costs, np.r_[np.int64(0), np.cumsum(lens)[:-1]])
        per_row = np.where(lens > 0, per_row, 0)
        df = pd.DataFrame({"source": t["source"].to_pylist(),
                           "nll": per_row, "n_tok": lens})
        return pa.Table.from_pandas(
            df.groupby("source", as_index=False).sum(), preserve_index=False)

    p = ds.map_batches(score_part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    g = p.groupby("source", as_index=False).sum()
    ng, sg = int(g["n_tok"].sum()), int(g["nll"].sum())
    global_avg = sg / ng
    rows = []
    for _, r in g.iterrows():
        avg = int(r["nll"]) / int(r["n_tok"])
        excess = avg - global_avg
        tilt_u = int(round(_math.exp(_DOREMI_ETA * excess / 1_000_000.0) * 1_000_000))
        rows.append((r["source"], int(r["n_tok"]), int(r["nll"]), tilt_u))
    tot_tilt = sum(t for *_, t in rows)
    out = pd.DataFrame(
        {"source": [r[0] for r in rows],
         "n_tok": [r[1] for r in rows],
         "nll_unats": [r[2] for r in rows],
         "weight": [_rd(r[3] / float(tot_tilt), 6) for r in rows]}
    ).sort_values("source", ignore_index=True)
    return _i64(out, ["n_tok", "nll_unats"])


SQL_DOREMI_MIXTURE_STEP = f"""
WITH tok AS (
  SELECT source, UNNEST(tokens) AS t
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')),
cnt AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS s FROM cnt),
cost AS (
  SELECT t, CAST(ROUND(-LN(c / CAST((SELECT s FROM tot) AS DOUBLE)) * 1000000)
               AS BIGINT) AS u
  FROM cnt),
src AS (
  SELECT source, COUNT(*) AS n_tok, CAST(SUM(u) AS BIGINT) AS nll_unats
  FROM tok JOIN cost USING (t) GROUP BY source),
gl AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS ng,
              CAST(SUM(nll_unats) AS BIGINT) AS sg FROM src),
tilt AS (
  SELECT source, n_tok, nll_unats,
         CAST(ROUND(exp({_DOREMI_ETA} * ((nll_unats / CAST(n_tok AS DOUBLE))
               - (gl.sg / CAST(gl.ng AS DOUBLE))) / 1000000.0) * 1000000)
              AS BIGINT) AS tu
  FROM src, gl)
SELECT source, n_tok, nll_unats,
       ROUND(tu / CAST((SELECT SUM(tu) FROM tilt) AS DOUBLE), 6) AS weight
FROM tilt ORDER BY source
"""

_P95_WINDOW_H = 24


def q_sliding_p95_value(sf_dir: str) -> pd.DataFrame:
    """Sliding-window EXACT p95: for every event hour, the 95th percentile
    (exact order statistic, no interpolation) of event values over the
    trailing 24 hours.  Distributed shape: raw rows collapse to per-(hour,
    cents) histograms in one combiner pass; each histogram row fans out to
    the ≤24 output hours it serves (histogram rows, not events — the
    duplication is support-bounded); one grouped reduce per output hour
    reads the k-th value off the merged histogram."""
    ds = _t(sf_dir, "events", ["ts", "value"])

    def hist_part(t: pa.Table) -> pa.Table:
        tsu = pc.cast(t["ts"], pa.int64()).to_numpy()
        vc = pc.cast(pc.round(pc.multiply(t["value"], 100.0), ndigits=0,
                              round_mode="half_towards_infinity"), pa.int64()).to_numpy()
        df = pd.DataFrame({"h": tsu // _HOUR_US, "vc": vc})
        g = df.groupby(["h", "vc"], as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "n"}), preserve_index=False)

    hist = (
        ds.map_batches(hist_part, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby(["h", "vc"], as_index=False)["n"]
        .sum()
    )
    hours = np.sort(hist["h"].unique())
    # fan each histogram row to the output hours it serves (bounded ×24),
    # then one lexsort + reduceat pass answers EVERY window's order
    # statistic — no per-hour Python loop
    h0 = hist["h"].to_numpy(np.int64)
    v0 = hist["vc"].to_numpy(np.int64)
    n0 = hist["n"].to_numpy(np.int64)
    oh = np.concatenate([h0 + off for off in range(_P95_WINDOW_H)])
    vc = np.tile(v0, _P95_WINDOW_H)
    nn = np.tile(n0, _P95_WINDOW_H)
    pos = np.searchsorted(hours, oh)
    pos[pos >= len(hours)] = len(hours) - 1
    keep = hours[pos] == oh
    oh, vc, nn = oh[keep], vc[keep], nn[keep]
    order = np.lexsort((vc, oh))
    oh, vc, nn = oh[order], vc[order], nn[order]
    starts = np.concatenate(
        [[0], np.flatnonzero((oh[1:] != oh[:-1]) | (vc[1:] != vc[:-1])) + 1])
    ohu, vcu = oh[starts], vc[starts]
    nu = np.add.reduceat(nn, starts)
    gb = np.concatenate(
        [[0], np.flatnonzero(ohu[1:] != ohu[:-1]) + 1, [len(ohu)]])
    csum = np.cumsum(nu)
    prefix = np.concatenate([[0], csum[gb[1:-1] - 1]]) if len(gb) > 2 else (
        np.zeros(1, np.int64))
    tot = csum[gb[1:] - 1] - prefix
    k = np.ceil(0.95 * tot).astype(np.int64)
    idx = np.searchsorted(csum, prefix + k, side="left")
    out = pd.DataFrame({"hour": ohu[gb[:-1]], "n_window": tot,
                        "p95_c": vcu[idx]}).sort_values("hour",
                                                        ignore_index=True)
    return _i64(out, ["hour", "n_window", "p95_c"])


SQL_SLIDING_P95_VALUE = f"""
WITH e AS (
  SELECT epoch_us(ts) // {_HOUR_US} AS h,
         CAST(ROUND(value * 100) AS BIGINT) AS vc
  FROM events),
hours AS (SELECT DISTINCT h FROM e),
win AS (
  SELECT hh.h AS hour, e.vc
  FROM hours hh JOIN e ON e.h BETWEEN hh.h - {_P95_WINDOW_H - 1} AND hh.h),
r AS (
  SELECT hour, vc,
         ROW_NUMBER() OVER (PARTITION BY hour ORDER BY vc) AS rn,
         COUNT(*) OVER (PARTITION BY hour) AS n
  FROM win)
SELECT hour, n AS n_window, vc AS p95_c
FROM r WHERE rn = CAST(CEIL(0.95 * n) AS BIGINT)
ORDER BY hour
"""


def q_seasonal_dow_decompose(sf_dir: str) -> pd.DataFrame:
    """Additive seasonal decomposition of daily event counts per type:
    day-of-week component = mean daily count per (type, dow); the robust
    residual spread (MAD of count − dow-mean) is reported per type.
    Integer daily counts throughout; the only float ops are the final
    mean/median expressions, written identically in SQL."""
    ds = _t(sf_dir, "events", ["event_type", "ts"])
    DAY_US = 86_400_000_000

    def part(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t["ts"], pa.int64()), DAY_US)
        g = (
            pa.table({"day": day, "event_type": t["event_type"]})
            .group_by(["day", "event_type"])
            .aggregate([([], "count_all")])
        )
        return pa.table({"day": g["day"], "event_type": g["event_type"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    p = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    daily = p.groupby(["event_type", "day"], as_index=False)["n"].sum()
    # epoch day 0 = 1970-01-01 = Thursday = dow 4 under ISO-ish 0=Monday;
    # use DuckDB's dayofweek convention: 0=Sunday ⇒ dow = (day + 4) % 7
    daily["dow"] = (daily["day"] + 4) % 7
    rows = []
    for et, g in daily.groupby("event_type"):
        dow_mean = g.groupby("dow")["n"].mean()
        resid = g["n"].to_numpy(np.float64) - dow_mean[g["dow"]].to_numpy()
        med = float(np.median(resid))
        mad = float(np.median(np.abs(resid - med)))
        for dow, m in dow_mean.items():
            rows.append((et, int(dow), int(g[g["dow"] == dow]["n"].sum()),
                         int((g["dow"] == dow).sum()), _rd(float(m), 6),
                         _rd(mad, 6)))
    out = pd.DataFrame(rows, columns=[
        "event_type", "dow", "n_events", "n_days", "dow_mean", "resid_mad"]
    ).sort_values(["event_type", "dow"], ignore_index=True)
    return _i64(out, ["dow", "n_events", "n_days"])


SQL_SEASONAL_DOW_DECOMPOSE = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2),
dd AS (SELECT event_type, day, (day + 4) % 7 AS dow, n FROM d),
dm AS (
  SELECT event_type, dow, CAST(SUM(n) AS BIGINT) AS n_events,
         COUNT(*) AS n_days, AVG(n) AS dow_mean
  FROM dd GROUP BY 1, 2),
resid AS (
  SELECT dd.event_type, dd.n - dm.dow_mean AS r
  FROM dd JOIN dm ON dm.event_type = dd.event_type AND dm.dow = dd.dow),
medr AS (SELECT event_type, MEDIAN(r) AS med FROM resid GROUP BY 1),
mad AS (
  SELECT r.event_type, MEDIAN(ABS(r.r - m.med)) AS mad
  FROM resid r JOIN medr m ON m.event_type = r.event_type GROUP BY 1)
SELECT dm.event_type, dm.dow, dm.n_events, dm.n_days,
       ROUND(dm.dow_mean, 6) AS dow_mean, ROUND(mad.mad, 6) AS resid_mad
FROM dm JOIN mad ON mad.event_type = dm.event_type
ORDER BY dm.event_type, dm.dow
"""


def q_quantile_normalize(sf_dir: str) -> pd.DataFrame:
    """Quantile normalization of per-source doc-length distributions onto
    the GLOBAL distribution (the cross-source feature-alignment transform):
    a doc at within-source cumulative rank r of n maps to the global
    ⌈N·r/n⌉-th order statistic.  All ranks and order statistics are exact
    integers off one (source, value) histogram exchange; reported per
    source as the mean normalized length."""
    ds = _t(sf_dir, "documents", ["source", "n_chars"])

    def part(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"v": t["n_chars"], "source": t["source"]})
            .group_by(["v", "source"])
            .aggregate([([], "count_all")])
        )
        return pa.table({"v": g["v"], "source": g["source"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    p = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    g = p.groupby(["v", "source"], as_index=False)["n"].sum()
    glob = g.groupby("v")["n"].sum().sort_index()
    gv = glob.index.to_numpy(np.int64)
    gcum = glob.cumsum().to_numpy(np.int64)
    N = int(gcum[-1])
    rows = []
    for src, sub in g.groupby("source"):
        sub = sub.sort_values("v")
        sn = sub["n"].to_numpy(np.int64)
        n_s = int(sn.sum())
        r = np.cumsum(sn)  # within-source rank of each tied value class
        k = np.ceil(N * r / n_s).astype(np.int64)
        qv = gv[np.searchsorted(gcum, k)]
        total_q = int((qv * sn).sum())
        rows.append((src, n_s, _rd(total_q / n_s, 6)))
    out = pd.DataFrame(rows, columns=["source", "n_docs", "mean_qnorm"]).sort_values(
        "source", ignore_index=True)
    return _i64(out, ["n_docs"])


SQL_QUANTILE_NORMALIZE = """
WITH g AS (SELECT source, n_chars AS v, COUNT(*) AS n FROM documents GROUP BY 1, 2),
gdist AS (
  SELECT v, CAST(SUM(n) AS BIGINT) AS n,
         CAST(SUM(SUM(n)) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS gcum
  FROM g GROUP BY v),
bigN AS (SELECT CAST(SUM(g.n) AS BIGINT) AS N FROM g),
s AS (
  SELECT source, v, n,
         CAST(SUM(n) OVER (PARTITION BY source ORDER BY v
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS r,
         CAST(SUM(n) OVER (PARTITION BY source) AS BIGINT) AS ns
  FROM g),
k AS (
  SELECT s.source, s.v, s.n, s.ns,
         CAST(CEIL(b.N * s.r / CAST(s.ns AS DOUBLE)) AS BIGINT) AS kk
  FROM s, bigN b),
q AS (
  SELECT k.source, k.n, k.ns,
         (SELECT MIN(gl.v) FROM gdist gl WHERE gl.gcum >= k.kk) AS qv
  FROM k)
SELECT source, CAST(SUM(n) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(qv * n) AS BIGINT) / CAST(MAX(ns) AS DOUBLE), 6)
         AS mean_qnorm
FROM q GROUP BY source ORDER BY source
"""

_LINKPRED_TOPK = 50


def q_link_prediction_jaccard(sf_dir: str) -> pd.DataFrame:
    """Link prediction on the STRONG-TIE co-purchase graph (pairs co-bought
    in ≥2 orders — the weight-thresholded graph standard in link-prediction
    practice; the ≥1 graph's wedge mass Σ C(deg,2) is hub-dominated and its
    Jaccard scores are noise) by neighbor-Jaccard: score non-adjacent pairs
    sharing ≥1 strong neighbor by |N(a)∩N(b)| / |N(a)∪N(b)|, top-50 (ties →
    pair id).

    Shape: the heavy exchange is the order-bucketed co-purchase pair build
    inside :func:`_copurchase_weighted_edges`; the thresholded strong-tie
    edge list itself is output-bounded and was always collected driver-side
    for the degree/adjacency probe, so the wedge fan-out (Σ C(deg,2), tiny
    on the w≤8 graph by construction) runs as one vectorized repeat/cumsum
    pass over the sorted edge array instead of two more cluster exchanges."""
    # strong ties only: w = max(1, 10 − c) ⇒ (w ≤ 8 ⟺ c ≥ 2)
    edges = _copurchase_weighted_edges(sf_dir).map_batches(
        lambda t: t.filter(pc.less_equal(t["w"], 8)), batch_format="pyarrow",
        zero_copy_batch=True)
    # degrees + adjacency (both |V|/|E|-bounded, same contract as pagerank)
    ed = edges.to_pandas()
    if not len(ed):
        return pd.DataFrame({c: pd.Series(dtype="int64")
                             for c in ["a", "b", "cn", "jaccard_u"]})
    src = ed["src"].to_numpy(np.int64)
    dst = ed["dst"].to_numpy(np.int64)
    order = np.lexsort((dst, src))
    s, d = src[order], dst[order]
    segb = np.concatenate([[0], np.flatnonzero(s[1:] != s[:-1]) + 1, [len(s)]])
    c = np.diff(segb).astype(np.int64)
    local_i = np.arange(len(s)) - np.repeat(segb[:-1], c)
    reps = np.repeat(c, c) - 1 - local_i
    tot = int(reps.sum())
    ia = np.repeat(np.arange(len(s)), reps)
    run_start = np.repeat(np.cumsum(reps) - reps, reps)
    ib = ia + 1 + np.arange(tot) - run_start
    packed_w, cn_all = np.unique((d[ia] << 32) | d[ib], return_counts=True)
    pairs = pd.DataFrame({"a": packed_w >> 32,
                          "b": packed_w & np.int64(0xFFFFFFFF),
                          "cn": cn_all.astype(np.int64)})
    deg = ed.groupby("src")["dst"].size()
    half = ed["src"].to_numpy(np.int64) < ed["dst"].to_numpy(np.int64)
    adj_packed = np.sort((ed["src"].to_numpy(np.int64)[half] << 32)
                         | ed["dst"].to_numpy(np.int64)[half])
    pos = np.searchsorted(adj_packed, packed_w)
    pos[pos >= len(adj_packed)] = max(len(adj_packed) - 1, 0)
    is_edge = len(adj_packed) > 0 and adj_packed[pos] == packed_w
    pairs = pairs[~is_edge] if len(adj_packed) else pairs
    da = deg[pairs["a"]].to_numpy(np.int64)
    db = deg[pairs["b"]].to_numpy(np.int64)
    cn = pairs["cn"].to_numpy(np.int64)
    union = da + db - cn
    pairs = pairs.assign(jaccard_u=(cn * 1_000_000) // union)
    pairs = pairs.sort_values(["jaccard_u", "a", "b"],
                              ascending=[False, True, True], kind="stable")
    out = pairs.head(_LINKPRED_TOPK)[["a", "b", "cn", "jaccard_u"]].reset_index(
        drop=True)
    return _i64(out, ["a", "b", "cn", "jaccard_u"])


SQL_LINK_PREDICTION_JACCARD = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
   AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
deg AS (SELECT u, COUNT(*) AS d FROM e GROUP BY u),
w AS (
  SELECT e1.v AS a, e2.v AS b, COUNT(*) AS cn
  FROM e e1 JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
  GROUP BY 1, 2),
nonadj AS (
  SELECT w.a, w.b, w.cn FROM w
  LEFT JOIN e ON e.u = w.a AND e.v = w.b
  WHERE e.u IS NULL),
sc AS (
  SELECT a, b, cn,
         (cn * 1000000) // (da.d + db.d - cn) AS jaccard_u
  FROM nonadj JOIN deg da ON da.u = nonadj.a JOIN deg db ON db.u = nonadj.b)
SELECT a, b, cn, jaccard_u FROM sc
ORDER BY jaccard_u DESC, a, b LIMIT {_LINKPRED_TOPK}
"""


