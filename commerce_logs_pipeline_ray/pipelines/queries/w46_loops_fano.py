"""Wave 46: degenerate-repetition detection, burstiness, and exact
equi-depth histograms.

* ngram_loop_detect — the LLM-curation "loop" filter: per document, the
  longest consecutive run of positions whose word equals the word three
  back (a repeating 3-gram cycle, the classic degenerate-generation
  signature).  One lag-3 equality over the flat word buffer + a vectorized
  run-length scan; top-10 docs by (max_run DESC, doc_id).
* fano_burstiness — Fano factor (variance-to-mean, the burstiness index)
  of daily event counts per event_type, exact ppm via the integer
  cross-multiplication (n·Σx² − (Σx)²) // ((n−1)·Σx).
* equidepth_price_histogram — exact 10-bucket equi-depth histogram of
  order total-price cents using the engine's global ROW_NUMBER machinery
  (rank.py::global_row_number — counting pre-pass, no full sort) with SQL
  NTILE tile-size semantics; per bucket count/min/max.
"""
from __future__ import annotations

from ._base import _i64, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from ._base import grouped_sums  # noqa: F401

_LOOP_TOPK = 10


def q_ngram_loop_detect(sf_dir: str) -> pd.DataFrame:
    """Longest lag-3 repetition run per document, top-10 by (run DESC,
    doc_id).  Per batch: one split → flat word buffer, one shifted equality
    at lag 3 masked to within-doc windows, one run-length scan — no per-doc
    loop."""
    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def scan(t: pa.Table) -> pd.DataFrame:
        lst = pc.split_pattern(t["text"], " ")
        flat = lst.combine_chunks() if isinstance(lst, pa.ChunkedArray) else lst
        offs = flat.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = flat.values
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
        n_words = offs[1:] - offs[:-1]
        doc_of = np.repeat(np.arange(len(doc_ids), dtype=np.int64), n_words)
        n = len(vals)
        if n <= 3:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "max_run": pd.Series([], dtype="int64")})
        hit = np.asarray(pc.equal(vals.slice(3), vals.slice(0, n - 3)))
        hit &= doc_of[3:] == doc_of[:-3]
        # run-length per doc: run ids restart at every miss or doc change
        grp = np.cumsum(~hit)
        df = pd.DataFrame({"d": doc_of[3:][hit], "g": grp[hit]})
        if df.empty:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "max_run": pd.Series([], dtype="int64")})
        runs = df.groupby(["d", "g"], as_index=False).size()
        per_doc = runs.groupby("d", as_index=False)["size"].max()
        return pd.DataFrame({"doc_id": doc_ids[per_doc["d"].to_numpy()],
                             "max_run": per_doc["size"].to_numpy(np.int64)})

    per_doc = docs.map_batches(scan, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
    out = per_doc.sort_values(["max_run", "doc_id"], ascending=[False, True],
                              ignore_index=True).head(_LOOP_TOPK)
    return _i64(out[["doc_id", "max_run"]], ["doc_id", "max_run"])


SQL_NGRAM_LOOP_DETECT = f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS rn
  FROM documents),
f AS (
  SELECT doc_id, rn,
         CASE WHEN word = LAG(word, 3) OVER (PARTITION BY doc_id ORDER BY rn)
              THEN 1 ELSE 0 END AS hit
  FROM w),
r AS (
  SELECT doc_id, rn, hit,
         SUM(CASE WHEN hit = 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY rn) AS grp
  FROM f),
runs AS (
  SELECT doc_id, grp, COUNT(*) AS len FROM r WHERE hit = 1 GROUP BY 1, 2),
per_doc AS (SELECT doc_id, MAX(len) AS max_run FROM runs GROUP BY 1)
SELECT doc_id, CAST(max_run AS BIGINT) AS max_run
FROM per_doc ORDER BY max_run DESC, doc_id LIMIT {_LOOP_TOPK}
"""


def q_fano_burstiness(sf_dir: str) -> pd.DataFrame:
    """Fano factor of daily event counts per event_type, exact ppm:
    fano_ppm = 10⁶·(n·Σx² − (Σx)²) // ((n−1)·Σx) over the days each type
    appears.  Daily counts reduce distributed; the moment fold is one more
    combiner pass."""
    def to_day(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "day_id": pc.divide(pc.cast(t["ts"], pa.int64()),
                                pa.scalar(86_400_000_000, pa.int64()))})

    daily = grouped_sums(
        _t(sf_dir, "events", ["event_type", "ts"]).map_batches(
            to_day, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "day_id"], {}, count_name="x")

    def moments(t: pa.Table) -> pd.DataFrame:
        x = t["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"event_type": t["event_type"].to_numpy(zero_copy_only=False),
                           "n": 1, "sx": x, "sxx": x * x})
        return df.groupby("event_type", as_index=False).sum()

    agg = grouped_sums(
        daily.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type"], {"n": "n", "sx": "sx", "sxx": "sxx"},
        reduce="driver").to_pandas()
    rows = []
    for _, r in agg.iterrows():
        n, sx, sxx = int(r["n"]), int(r["sx"]), int(r["sxx"])
        if n < 2 or sx == 0:
            continue
        rows.append({"event_type": r["event_type"], "n_days": n,
                     "fano_ppm": (1_000_000 * (n * sxx - sx * sx))
                                 // ((n - 1) * sx)})
    out = pd.DataFrame(rows).sort_values("event_type", ignore_index=True)
    return _i64(out, ["n_days", "fano_ppm"])


SQL_FANO_BURSTINESS = """
WITH d AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_id,
         COUNT(*) AS x
  FROM events GROUP BY 1, 2),
m AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(x * x) AS HUGEINT) AS sxx
  FROM d GROUP BY 1)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       CAST((1000000 * (n * sxx - sx * sx)) // ((n - 1) * sx) AS BIGINT)
         AS fano_ppm
FROM m WHERE n >= 2 AND sx <> 0 ORDER BY event_type
"""

_ED_BUCKETS = 10


def q_equidepth_price_histogram(sf_dir: str) -> pd.DataFrame:
    """Exact NTILE(10) equi-depth histogram of order total-price cents:
    global row numbers via the counting pre-pass (no full-data sort on the
    driver), SQL tile sizing (first total%k tiles get the extra row), per
    bucket count/min/max cents."""
    from ...functions.rank import global_row_number, ntile_of

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table({
            "cents": pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                             pa.int64()),
            "o_orderkey": t["o_orderkey"]})

    orders = _t(sf_dir, "orders", ["o_totalprice", "o_orderkey"]).map_batches(
        to_cents, batch_format="pyarrow", zero_copy_batch=True)
    ranked, total = global_row_number(orders, "cents", ["o_orderkey"])

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df["bucket"] = ntile_of(df["rn"].to_numpy(np.int64), total, _ED_BUCKETS)
        g = df.groupby("bucket")
        return g.agg(n_rows=("cents", "size"), min_cents=("cents", "min"),
                     max_cents=("cents", "max")).reset_index()

    parts = ranked.map_batches(bucketize, batch_format="pandas").to_pandas()
    out = (parts.groupby("bucket")
                .agg(n_rows=("n_rows", "sum"), min_cents=("min_cents", "min"),
                     max_cents=("max_cents", "max"))
                .reset_index()
                .sort_values("bucket", ignore_index=True))
    return _i64(out[["bucket", "n_rows", "min_cents", "max_cents"]],
                ["bucket", "n_rows", "min_cents", "max_cents"])


SQL_EQUIDEPTH_PRICE_HISTOGRAM = f"""
WITH c AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey
  FROM orders),
t AS (
  SELECT cents, NTILE({_ED_BUCKETS}) OVER (ORDER BY cents, o_orderkey) AS bucket
  FROM c)
SELECT CAST(bucket AS BIGINT) AS bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(cents) AS BIGINT) AS min_cents,
       CAST(MAX(cents) AS BIGINT) AS max_cents
FROM t GROUP BY 1 ORDER BY 1
"""
