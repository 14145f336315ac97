"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import _i64, _rd, _t, grouped_sums, np, pa, pc, pd, topk  # noqa: F401

# ---------------------------------------------------------------------------
# Wave 25: champion lists, leave-one-source-out ablation, SLO burn-rate
# alerts
# ---------------------------------------------------------------------------

_CHAMP_TERMS = 20
_CHAMP_K = 5


def q_champion_lists(sf_dir: str) -> pd.DataFrame:
    """Tiered-index champion lists (Manning et al. IR ch.7): for the 20
    highest-frequency terms, the 5 docs with the highest term frequency —
    the static high-score tier a search engine consults before touching full
    postings.  Term counts reduce once; per-doc tf needs no exchange (a doc
    is one row); the champion cut is a per-term distributed top-k prune."""
    from ...functions.relational import grouped_topk

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def wc_partial(t: pa.Table) -> pd.DataFrame:
        lst = pc.split_pattern(t["text"], " ").combine_chunks()
        w = lst.values.to_numpy(zero_copy_only=False)
        ww, cc = np.unique(w, return_counts=True)
        return pd.DataFrame({"w": ww, "c": cc.astype(np.int64)})

    wc = grouped_sums(
        ds.map_batches(wc_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["w"], {"c": "c"},
    )
    top = topk(wc, ["c", "w"], [True, False], _CHAMP_TERMS).to_pandas()
    terms = set(top["w"].astype(str))

    def tf_rows(t: pa.Table, *, _terms=terms) -> pd.DataFrame:
        lst = pc.split_pattern(t["text"], " ").combine_chunks()
        off = np.asarray(lst.offsets, dtype=np.int64)
        lens = np.diff(off)
        w = lst.values.to_numpy(zero_copy_only=False)
        ids = np.repeat(
            t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64), lens
        )
        keep = np.isin(w, list(_terms))
        df = pd.DataFrame({"term": w[keep], "doc_id": ids[keep], "tf": 1})
        return df.groupby(["term", "doc_id"], as_index=False).sum()

    tf = ds.map_batches(tf_rows, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_topk(tf, ["term"], ["tf", "doc_id"], [True, False], _CHAMP_K).to_pandas()
    out = out.sort_values(["term", "tf", "doc_id"], ascending=[True, False, True],
                          ignore_index=True)
    return _i64(out, ["doc_id", "tf"])


SQL_CHAMPION_LISTS = f"""
WITH w AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS wd FROM documents),
cnt AS (SELECT wd, COUNT(*) AS c FROM w GROUP BY 1),
top AS (SELECT wd FROM cnt ORDER BY c DESC, wd LIMIT {_CHAMP_TERMS}),
tf AS (SELECT w.wd AS term, w.doc_id, COUNT(*) AS tf
       FROM w JOIN top ON top.wd = w.wd GROUP BY 1, 2),
rk AS (SELECT term, doc_id, tf,
              ROW_NUMBER() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS r
       FROM tf)
SELECT term, doc_id, tf FROM rk WHERE r <= {_CHAMP_K}
ORDER BY term, tf DESC, doc_id
"""


def q_loso_quality_delta(sf_dir: str) -> pd.DataFrame:
    """Leave-one-source-out ablation bookkeeping (the source-valuation sweep
    a data-mixing team runs before dropping a crawl): for each source, how
    the corpus mean doc length moves when that source is removed.  One
    (source → sum, n) combiner exchange; every LOSO mean closes from the
    same two exact integers, so the sweep costs one pass regardless of
    source count."""
    ds = _t(sf_dir, "documents", ["source", "n_chars"])

    g = grouped_sums(
        ds, ["source"], {"chars": "n_chars"}, "n_docs"
    ).to_pandas().sort_values("source", ignore_index=True)
    tot_c = int(g["chars"].sum())
    tot_n = int(g["n_docs"].sum())
    mean_all = float(tot_c) / float(tot_n)
    rows = []
    for _, r in g.iterrows():
        rc, rn = tot_c - int(r["chars"]), tot_n - int(r["n_docs"])
        mean_wo = float("nan") if rn == 0 else float(rc) / float(rn)
        rows.append(
            (r["source"], int(r["n_docs"]), _rd(mean_wo, 6), _rd(mean_wo - mean_all, 6))
        )
    out = pd.DataFrame(rows, columns=["source", "n_docs", "mean_without", "delta"])
    return _i64(out, ["n_docs"])


SQL_LOSO_QUALITY_DELTA = """
WITH g AS (SELECT source, COUNT(*) AS n_docs,
                  CAST(SUM(n_chars) AS BIGINT) AS chars
           FROM documents GROUP BY 1),
tot AS (SELECT CAST(SUM(chars) AS BIGINT) AS tc, CAST(SUM(n_docs) AS BIGINT) AS tn
        FROM g)
SELECT g.source, g.n_docs,
       ROUND(CAST(tot.tc - g.chars AS DOUBLE) / CAST(tot.tn - g.n_docs AS DOUBLE), 6)
         AS mean_without,
       ROUND(CAST(tot.tc - g.chars AS DOUBLE) / CAST(tot.tn - g.n_docs AS DOUBLE)
             - CAST(tot.tc AS DOUBLE) / CAST(tot.tn AS DOUBLE), 6) AS delta
FROM g CROSS JOIN tot ORDER BY g.source
"""


_BURN_SHORT = 2   # hours
_BURN_LONG = 12
_BURN_DIV = 10    # alert when error rate > 1/10 in BOTH windows


def q_burn_rate_alerts(sf_dir: str) -> pd.DataFrame:
    """Multi-window SLO burn-rate alerting (the Google SRE workbook rule):
    an hour alerts when the error rate exceeds the budget (10%) over BOTH
    the 2-hour and 12-hour trailing windows — verdicts by INTEGER
    cross-multiplication (10·err > tot), no float rates.  The stream
    collapses to hourly (errors, total) combiners; window sums are two
    prefix-sum scans over the calendar-bounded dense series.  First 20
    alerting hours."""
    ds = _t(sf_dir, "events", ["ts", "event_type"])

    def part(t: pa.Table) -> pd.DataFrame:
        h = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False) // 3_600_000_000
        err = pc.equal(t["event_type"], "error").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"h": h, "err": err.astype(np.int64), "tot": 1})
        return df.groupby("h", as_index=False).sum()

    hourly = grouped_sums(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["h"], {"err": "err", "tot": "tot"},
    ).to_pandas().sort_values("h", ignore_index=True)
    h0, h1 = int(hourly["h"].min()), int(hourly["h"].max())
    T = h1 - h0 + 1
    err = np.zeros(T, np.int64)
    tot = np.zeros(T, np.int64)
    idx = hourly["h"].to_numpy(np.int64) - h0
    err[idx] = hourly["err"].to_numpy(np.int64)
    tot[idx] = hourly["tot"].to_numpy(np.int64)
    ce = np.r_[np.int64(0), np.cumsum(err)]
    ct = np.r_[np.int64(0), np.cumsum(tot)]

    def wsum(c: np.ndarray, w: int) -> np.ndarray:
        lo = np.maximum(np.arange(T) - w + 1, 0)
        return c[np.arange(T) + 1] - c[lo]

    es, ts_ = wsum(ce, _BURN_SHORT), wsum(ct, _BURN_SHORT)
    el, tl = wsum(ce, _BURN_LONG), wsum(ct, _BURN_LONG)
    alert = (_BURN_DIV * es > ts_) & (_BURN_DIV * el > tl) & (ts_ > 0) & (tl > 0)
    hs = np.nonzero(alert)[0][:20]
    out = pd.DataFrame(
        {"hour_id": hs + h0, "err_short": es[hs], "tot_short": ts_[hs],
         "err_long": el[hs], "tot_long": tl[hs]}
    )
    return _i64(out, ["hour_id", "err_short", "tot_short", "err_long", "tot_long"])


SQL_BURN_RATE_ALERTS = f"""
WITH e AS (
  SELECT epoch_us(ts) // 3600000000 AS h,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS err
  FROM events),
g AS (SELECT h, CAST(SUM(err) AS BIGINT) AS err, COUNT(*) AS tot FROM e GROUP BY 1),
mm AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM g),
dense AS (
  SELECT gs.h, COALESCE(g.err, 0) AS err, COALESCE(g.tot, 0) AS tot
  FROM (SELECT UNNEST(generate_series((SELECT h0 FROM mm), (SELECT h1 FROM mm)))
          AS h) gs
  LEFT JOIN g ON g.h = gs.h),
w AS (
  SELECT h,
         SUM(err) OVER (ORDER BY h ROWS BETWEEN {_BURN_SHORT - 1} PRECEDING AND CURRENT ROW) AS es,
         SUM(tot) OVER (ORDER BY h ROWS BETWEEN {_BURN_SHORT - 1} PRECEDING AND CURRENT ROW) AS ts,
         SUM(err) OVER (ORDER BY h ROWS BETWEEN {_BURN_LONG - 1} PRECEDING AND CURRENT ROW) AS el,
         SUM(tot) OVER (ORDER BY h ROWS BETWEEN {_BURN_LONG - 1} PRECEDING AND CURRENT ROW) AS tl
  FROM dense)
SELECT h AS hour_id, CAST(es AS BIGINT) AS err_short, CAST(ts AS BIGINT) AS tot_short,
       CAST(el AS BIGINT) AS err_long, CAST(tl AS BIGINT) AS tot_long
FROM w
WHERE {_BURN_DIV} * es > ts AND {_BURN_DIV} * el > tl AND ts > 0 AND tl > 0
ORDER BY h LIMIT 20
"""


