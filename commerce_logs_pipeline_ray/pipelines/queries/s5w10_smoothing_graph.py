"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import ORACLE_ARTIFACT_DIR, _i64, _rd, _t, grouped_sums, np, pa, pc, pd, rd, topk  # noqa: F401
from .neardup_a import ensure_derived_parquet  # noqa: F401

# ---------------------------------------------------------------------------
# Session-5 wave 10: LM smoothing, tokenizer metrics, robust stats, graph
# components, window functions, training-interleave audit
# ---------------------------------------------------------------------------

_KN_D = 0.75


def q_kneser_ney_bigram(sf_dir: str) -> pd.DataFrame:
    """Kneser-Ney smoothed bigram LM probabilities (absolute discount
    D=0.75, continuation-count backoff) for the top-20 corpus bigrams.  The
    heavy exchange is ONE packed-int64 bigram combiner; the KN terms
    (left-context mass c(w1·), follower fan-out N1+(w1·), continuation count
    N1+(·w2), distinct-bigram total) are then derived from the BIGRAM
    HISTOGRAM itself — three cheap aggregates over distinct-bigram rows,
    never a second corpus scan.  All counts exact ints; the one float
    formula mirrors the SQL term for term."""
    from ...functions.tokens import _flat_tokens

    ds = rd.read_parquet(ensure_derived_parquet(sf_dir), columns=["tokens"],
                         override_num_blocks=8)

    def bigrams(t: pa.Table) -> pd.DataFrame:
        values, offsets = _flat_tokens(t)
        starts = (offsets - offsets[0]).astype(np.int64)
        window = values[offsets[0]:offsets[-1]].astype(np.int64)
        a = window[:-1]
        b = window[1:]
        keep = np.ones(len(a), bool)
        keep[starts[1:-1] - 1] = False  # no bigram across sequence boundary
        packed = (a[keep] << np.int64(32)) | b[keep]
        keys, cnt = np.unique(packed, return_counts=True)
        return pd.DataFrame({"bg": keys, "c": cnt.astype(np.int64)})

    hist = grouped_sums(
        ds.map_batches(bigrams, batch_format="pyarrow", zero_copy_batch=True),
        ["bg"], {"c": "c"},
    ).materialize()

    def stats(t: pa.Table) -> pd.DataFrame:
        bg = t["bg"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        w1 = bg >> np.int64(32)
        w2 = bg & np.int64(0xFFFFFFFF)
        left = pd.DataFrame({"w1": w1, "cw1": c, "n1w1": np.ones(len(bg), np.int64)}
                            ).groupby("w1", as_index=False).sum()
        right = pd.DataFrame({"w2": w2, "n2w2": np.ones(len(bg), np.int64)}
                             ).groupby("w2", as_index=False).sum()
        return pd.DataFrame({
            "kind": ["l"] * len(left) + ["r"] * len(right) + ["t"],
            "k": np.concatenate([left["w1"], right["w2"], [0]]),
            "a": np.concatenate([left["cw1"], right["n2w2"], [len(bg)]]),
            "b": np.concatenate([left["n1w1"], np.zeros(len(right), np.int64), [0]]),
        })

    parts = hist.map_batches(stats, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
    agg = parts.groupby(["kind", "k"], as_index=False)[["a", "b"]].sum()
    lmap = agg[agg["kind"] == "l"].set_index("k")
    rmap = agg[agg["kind"] == "r"].set_index("k")["a"]
    dtot = int(agg.loc[agg["kind"] == "t", "a"].sum())
    top = topk(hist, ["c", "bg"], [True, False], 20).to_pandas()
    w1 = (top["bg"].to_numpy(np.int64) >> np.int64(32))
    w2 = (top["bg"].to_numpy(np.int64) & np.int64(0xFFFFFFFF))
    c = top["c"].to_numpy(np.int64)
    rows = []
    for i in range(len(top)):
        cw1 = int(lmap.loc[w1[i], "a"])
        n1w1 = int(lmap.loc[w1[i], "b"])
        n2w2 = int(rmap.loc[w2[i]])
        p = (max(int(c[i]) - _KN_D, 0.0) / cw1
             + (_KN_D * n1w1 / cw1) * (n2w2 / dtot))
        rows.append((int(w1[i]), int(w2[i]), int(c[i]), _rd(p, 9)))
    out = pd.DataFrame(rows, columns=["token_a", "token_b", "c", "p_kn"])
    out = out.sort_values(["c", "token_a", "token_b"],
                          ascending=[False, True, True], ignore_index=True)
    return _i64(out, ["token_a", "token_b", "c"])


SQL_KNESER_NEY_BIGRAM = f"""
WITH seq AS (SELECT tokens FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')),
z AS (
  SELECT UNNEST(list_zip(tokens[1:len(tokens) - 1], tokens[2:len(tokens)])) AS p
  FROM seq WHERE len(tokens) >= 2),
bg AS (
  SELECT CAST(p[1] AS BIGINT) AS w1, CAST(p[2] AS BIGINT) AS w2, COUNT(*) AS c
  FROM z GROUP BY 1, 2),
l AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS cw1, COUNT(*) AS n1w1 FROM bg GROUP BY 1),
r AS (SELECT w2, COUNT(*) AS n2w2 FROM bg GROUP BY 1),
t AS (SELECT COUNT(*) AS dtot FROM bg)
SELECT bg.w1 AS token_a, bg.w2 AS token_b, bg.c AS c,
       ROUND(GREATEST(bg.c - {_KN_D}, 0) / l.cw1
             + ({_KN_D} * l.n1w1 / l.cw1) * (r.n2w2 / (SELECT dtot FROM t)), 9) AS p_kn
FROM bg JOIN l USING (w1) JOIN r USING (w2)
ORDER BY c DESC, token_a, token_b LIMIT 20
"""


def q_chars_per_token(sf_dir: str) -> pd.DataFrame:
    """Tokenizer fertility metric (chars per token, the compression-ratio
    health check every tokenizer swap is judged by) per source: two
    independent bounded combiner aggregates — document chars from the raw
    table, token counts from the derived corpus — joined driver-side on the
    enum-bounded source key.  No corpus-width exchange at any scale."""
    docs = _t(sf_dir, "documents", ["source", "n_chars"])
    dch = grouped_sums(docs, ["source"], {"sum_chars": "n_chars"}, "n_docs",
                       reduce="driver").to_pandas()
    der = rd.read_parquet(ensure_derived_parquet(sf_dir),
                          columns=["source", "n_tok"], override_num_blocks=8)
    dtk = grouped_sums(der, ["source"], {"sum_tokens": "n_tok"}, None,
                       reduce="driver").to_pandas()
    out = dch.merge(dtk, on="source", how="inner")
    out["chars_per_token"] = [
        _rd(int(cc) / int(tt), 6)
        for cc, tt in zip(out["sum_chars"], out["sum_tokens"])
    ]
    out = out[["source", "n_docs", "sum_chars", "sum_tokens", "chars_per_token"]]
    out = out.sort_values("source", ignore_index=True)
    return _i64(out, ["n_docs", "sum_chars", "sum_tokens"])


SQL_CHARS_PER_TOKEN = f"""
WITH dch AS (
  SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
  FROM documents GROUP BY 1),
dtk AS (
  SELECT source, CAST(SUM(n_tok) AS BIGINT) AS sum_tokens
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet') GROUP BY 1)
SELECT source, n_docs, sum_chars, sum_tokens,
       ROUND(CAST(sum_chars AS DOUBLE) / sum_tokens, 6) AS chars_per_token
FROM dch JOIN dtk USING (source) ORDER BY source
"""


def q_train_interleave_audit(sf_dir: str) -> pd.DataFrame:
    """Weighted source-interleaving audit (the Pile/Dolma-style mixing
    schedule check): each source's docs enter the training stream under
    stride scheduling — the r-th doc of source s gets virtual time
    v = r * (LCM / w_s) — and the audit reports each source's share of the
    first half of the stream vs its weight.  Because v depends only on the
    doc's per-source arrival RANK, the window composition is a pure function
    of the bounded per-source count table: ONE enum-bounded combiner
    aggregate, then a driver-side integer binary search over the virtual-time
    threshold.  No global sort, no row_number exchange, at ANY corpus size —
    the oracle's ORDER BY v LIMIT K materializes the same stream explicitly."""
    docs = _t(sf_dir, "documents", ["source"])
    tot = grouped_sums(docs, ["source"], {}, "n_total", reduce="driver").to_pandas()
    tot = tot.sort_values("source", ignore_index=True)
    srcs = tot["source"].tolist()
    n = tot["n_total"].astype(int).tolist()
    wt = [1 + ord(s[-1]) % 3 for s in srcs]
    stride = [6 // w for w in wt]  # LCM(1,2,3)=6 keeps every v integral
    k = sum(n) // 2

    def c_le(t: int) -> int:
        return sum(min(ns, t // st) for ns, st in zip(n, stride))

    lo_t, hi_t = 1, max(ns * st for ns, st in zip(n, stride))
    while lo_t < hi_t:
        mid_t = (lo_t + hi_t) // 2
        if c_le(mid_t) >= k:
            hi_t = mid_t
        else:
            lo_t = mid_t + 1
    thr = lo_t
    c_lt = [min(ns, (thr - 1) // st) for ns, st in zip(n, stride)]
    # v strictly increases within a source (stride >= 2), so at most one
    # item per source sits exactly at the threshold; ties break by source
    eq = [1 if thr % st == 0 and thr // st <= ns else 0
          for ns, st in zip(n, stride)]
    take = k - sum(c_lt)
    n_win = list(c_lt)
    for i in range(len(srcs)):
        if take <= 0:
            break
        if eq[i]:
            n_win[i] += 1
            take -= 1
    out = pd.DataFrame({"source": srcs, "wt": wt, "n_total": n,
                        "n_window": n_win})
    out["window_share"] = [_rd(float(v) / k, 6) for v in n_win]
    return _i64(out, ["wt", "n_total", "n_window"])


SQL_TRAIN_INTERLEAVE_AUDIT = """
WITH k AS (SELECT COUNT(*) // 2 AS k FROM documents),
w AS (SELECT source, 1 + ascii(right(source, 1)) % 3 AS wt, COUNT(*) AS n_total
      FROM documents GROUP BY 1),
ranked AS (SELECT source, ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS r
           FROM documents),
keyed AS (SELECT ranked.source, r, r * (6 // wt) AS v
          FROM ranked JOIN w USING (source)),
sel AS (SELECT source FROM keyed ORDER BY v, source, r LIMIT (SELECT k FROM k)),
cnt AS (SELECT source, COUNT(*) AS n_window FROM sel GROUP BY 1)
SELECT w.source, w.wt, w.n_total, COALESCE(cnt.n_window, 0) AS n_window,
       ROUND(CAST(COALESCE(cnt.n_window, 0) AS DOUBLE) / (SELECT k FROM k), 6)
         AS window_share
FROM w LEFT JOIN cnt USING (source) ORDER BY w.source
"""


def q_good_turing_counts(sf_dir: str) -> pd.DataFrame:
    """Good-Turing frequency-of-frequencies table (the unseen-mass estimator
    behind Katz/SGT smoothing): token-frequency combiner exchange, then a
    count-of-counts histogram over the DISTINCT-token rows (bounded by the
    number of distinct frequencies, so the final reduce is driver-sized).
    Reports N_r for the 10 smallest observed frequencies with the GT
    discounted estimate r* = (r+1) N_{r+1} / N_r."""
    from ...functions.tokens import _flat_tokens

    ds = rd.read_parquet(ensure_derived_parquet(sf_dir), columns=["tokens"],
                         override_num_blocks=8)

    def tf_partial(t: pa.Table) -> pd.DataFrame:
        values, offsets = _flat_tokens(t)
        window = values[offsets[0]:offsets[-1]].astype(np.int64)
        keys, cnt = np.unique(window, return_counts=True)
        return pd.DataFrame({"token": keys, "c": cnt.astype(np.int64)})

    tf = grouped_sums(
        ds.map_batches(tf_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["token"], {"c": "c"},
    )

    def coc(t: pa.Table) -> pd.DataFrame:
        c = t["c"].to_numpy(zero_copy_only=False)
        keys, cnt = np.unique(c, return_counts=True)
        return pd.DataFrame({"r": keys.astype(np.int64),
                             "n_r": cnt.astype(np.int64)})

    hist = grouped_sums(
        tf.map_batches(coc, batch_format="pyarrow", zero_copy_batch=True),
        ["r"], {"n_r": "n_r"}, reduce="driver",
    ).to_pandas().sort_values("r", ignore_index=True)
    nmap = dict(zip(hist["r"].astype(int), hist["n_r"].astype(int)))
    out = hist.head(10).copy().reset_index(drop=True)
    rstar = []
    for r, nr in zip(out["r"].astype(int), out["n_r"].astype(int)):
        nx = nmap.get(r + 1)
        rstar.append(_rd((r + 1) * float(nx) / nr, 9) if nx else np.nan)
    out["r_star"] = rstar
    return _i64(out, ["r", "n_r"])


SQL_GOOD_TURING_COUNTS = f"""
WITH tf AS (
  SELECT CAST(token AS BIGINT) AS token, COUNT(*) AS c
  FROM (SELECT UNNEST(tokens) AS token
        FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet'))
  GROUP BY 1),
cc AS (SELECT c AS r, COUNT(*) AS n_r FROM tf GROUP BY 1)
SELECT a.r, a.n_r,
       ROUND((a.r + 1) * CAST(b.n_r AS DOUBLE) / a.n_r, 9) AS r_star
FROM cc a LEFT JOIN cc b ON b.r = a.r + 1
ORDER BY a.r LIMIT 10
"""


_RBO_P = 0.9
_RBO_DEPTH = 50


def q_rbo_rank_overlap(sf_dir: str) -> pd.DataFrame:
    """Rank-biased overlap (Webber et al. 2010, truncated at depth 50,
    p=0.9) between the top-50 purchase-value user rankings of the first vs
    second half of the event time range — the standard ranking-stability
    metric for search/recsys eval.  Two half-filtered user-total combiner
    aggregates + distributed top-50s; the RBO fold itself runs over 2x50
    driver rows.  Float terms mirror the SQL expression shape exactly."""
    ds = _t(sf_dir, "events", ["ts", "user_id", "event_type", "value"])

    def purchases(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        return pa.table({"us": pc.cast(t["ts"], pa.int64()),
                         "user_id": t["user_id"], "value": t["value"]})

    p = ds.map_batches(purchases, batch_format="pyarrow",
                       zero_copy_batch=True).materialize()
    bounds = p.map_batches(
        lambda t: pa.table({"lo": pa.array([pc.min(t["us"]).as_py()], pa.int64()),
                            "hi": pa.array([pc.max(t["us"]).as_py()], pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True,
    ).to_pandas()
    mid = (int(bounds["lo"].min()) + int(bounds["hi"].max())) // 2

    def half(lt: bool) -> pd.DataFrame:
        op = pc.less if lt else pc.greater_equal
        h = p.map_batches(
            lambda t, _op=op: t.filter(_op(t["us"], pa.scalar(mid, pa.int64()))),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        totals = grouped_sums(h, ["user_id"], {"tv": "value"})
        return topk(totals, ["tv", "user_id"], [True, False], _RBO_DEPTH).to_pandas()

    a, b = half(True), half(False)
    ra = dict(zip(a["user_id"].astype(int), range(1, len(a) + 1)))
    rb = dict(zip(b["user_id"].astype(int), range(1, len(b) + 1)))
    m = sorted(max(ra[u], rb[u]) for u in ra.keys() & rb.keys())
    rbo = 0.0
    for d in range(1, _RBO_DEPTH + 1):
        ov = sum(1 for x in m if x <= d)
        rbo += (1 - _RBO_P) * _RBO_P ** (d - 1) * ov / d
    out = pd.DataFrame([{"depth": _RBO_DEPTH, "n_overlap": len(m),
                         "rbo": _rd(rbo, 6)}])
    return _i64(out, ["depth", "n_overlap"])


SQL_RBO_RANK_OVERLAP = f"""
WITH p AS (SELECT CAST(epoch_us(ts) AS BIGINT) AS us, user_id, value
           FROM events WHERE event_type = 'purchase'),
b AS (SELECT (MIN(us) + MAX(us)) // 2 AS mid FROM p),
a1 AS (SELECT user_id, ROW_NUMBER() OVER (ORDER BY SUM(value) DESC, user_id) AS ra
       FROM p WHERE us < (SELECT mid FROM b) GROUP BY user_id
       QUALIFY ra <= {_RBO_DEPTH}),
a2 AS (SELECT user_id, ROW_NUMBER() OVER (ORDER BY SUM(value) DESC, user_id) AS rb
       FROM p WHERE us >= (SELECT mid FROM b) GROUP BY user_id
       QUALIFY rb <= {_RBO_DEPTH}),
m AS (SELECT GREATEST(ra, rb) AS m FROM a1 JOIN a2 USING (user_id)),
d AS (SELECT CAST(d AS BIGINT) AS d FROM generate_series(1, {_RBO_DEPTH}) AS t(d)),
ov AS (SELECT d.d, COUNT(m.m) AS ov FROM d LEFT JOIN m ON m.m <= d.d GROUP BY d.d)
SELECT {_RBO_DEPTH} AS depth,
       (SELECT COUNT(*) FROM m) AS n_overlap,
       ROUND(SUM(CAST({1 - _RBO_P!r} AS DOUBLE) * POW({_RBO_P}, d - 1) * ov / d), 6) AS rbo
FROM ov
"""


