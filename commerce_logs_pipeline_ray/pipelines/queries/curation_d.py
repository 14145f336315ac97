"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import (
    ORACLE_ARTIFACT_DIR,
    STOPWORD_PATTERN,
    _corpus_dir,
    _i64,
    _rd,
    _t,
    grouped_sums,
    np,
    pa,
    pc,
    pd,
    pq,
    rd,
)  # noqa: F401
from .neardup_a import _ensure_artifact  # noqa: F401
from .neardup_b import _sf_of  # noqa: F401

SQL_ACF_MULTI_LAG = """
WITH h AS (
  SELECT EPOCH_US(ts) // 3600000000 AS hour_id, COUNT(*) AS n
  FROM events GROUP BY 1),
l AS (
  SELECT n,
         LAG(n, 1) OVER w AS p1, LAG(n, 2) OVER w AS p2, LAG(n, 3) OVER w AS p3,
         LAG(n, 4) OVER w AS p4, LAG(n, 5) OVER w AS p5
  FROM h WINDOW w AS (ORDER BY hour_id))
SELECT * FROM (
  SELECT 1 AS lag, ROUND(corr(n, p1), 6) AS acf, COUNT(p1) AS n_pairs FROM l
  UNION ALL SELECT 2, ROUND(corr(n, p2), 6), COUNT(p2) FROM l
  UNION ALL SELECT 3, ROUND(corr(n, p3), 6), COUNT(p3) FROM l
  UNION ALL SELECT 4, ROUND(corr(n, p4), 6), COUNT(p4) FROM l
  UNION ALL SELECT 5, ROUND(corr(n, p5), 6), COUNT(p5) FROM l
) ORDER BY lag
"""


def q_orders_seasonal_share(sf_dir: str) -> pd.DataFrame:
    """Seasonality index: each calendar month's share of its year's order
    count (percent-of-total window on the time hierarchy).  One distributed
    (year, month) count; the share window runs on the bounded grid."""
    ds = _t(sf_dir, "orders", ["o_orderdate"])

    def ym(df: pd.DataFrame) -> pd.DataFrame:
        dt = pd.to_datetime(df["o_orderdate"])
        return pd.DataFrame({"year": dt.dt.year.astype(np.int64),
                             "month": dt.dt.month.astype(np.int64)})

    agg = grouped_sums(
        ds.map_batches(ym, batch_format="pandas"), ["year", "month"], {}, "n",
    ).to_pandas()
    agg["share"] = (agg["n"] / agg.groupby("year")["n"].transform("sum")).pipe(_rd)
    return _i64(agg.sort_values(["year", "month"], ignore_index=True),
                ["year", "month", "n"])


SQL_ORDERS_SEASONAL_SHARE = """
WITH c AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
         CAST(month(o_orderdate) AS BIGINT) AS month, COUNT(*) AS n
  FROM orders GROUP BY 1, 2)
SELECT year, month, n,
       ROUND(n / CAST(SUM(n) OVER (PARTITION BY year) AS DOUBLE), 6) AS share
FROM c ORDER BY 1, 2
"""


def q_doc_length_quality_corr(sf_dir: str) -> pd.DataFrame:
    """Metric-relationship probe: Pearson correlation between document
    length (words) and stopword rate across the corpus, from one mergeable
    moments pass over per-doc metrics computed in-batch."""
    from ...functions.text import n_words, stopword_hits

    docs = _t(sf_dir, "documents", ["text"])

    def part(t: pa.Table) -> pa.Table:
        nw = pc.cast(n_words(t["text"]), pa.int64()).to_numpy(zero_copy_only=False).astype(np.float64)
        hits = stopword_hits(t["text"]).to_numpy(zero_copy_only=False).astype(np.float64)
        ratio = hits / nw
        return pa.table({
            "n": pa.array([len(nw)], pa.int64()),
            "sx": pa.array([float(nw.sum())]), "sy": pa.array([float(ratio.sum())]),
            "sxx": pa.array([float((nw * nw).sum())]),
            "syy": pa.array([float((ratio * ratio).sum())]),
            "sxy": pa.array([float((nw * ratio).sum())]),
        })

    p = docs.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    n = int(p["n"].sum())
    sx, sy = p["sx"].sum(), p["sy"].sum()
    sxx, syy, sxy = p["sxx"].sum(), p["syy"].sum(), p["sxy"].sum()
    cov = sxy - sx * sy / n
    r = cov / np.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
    return pd.DataFrame({"n_docs": pd.Series([n], dtype="int64"),
                         "corr_len_stopratio": [_rd(float(r), 6)]})


SQL_DOC_LENGTH_QUALITY_CORR = f"""
WITH q AS (
  SELECT len(string_split(text, ' ')) AS nw,
         len(regexp_extract_all(text, '{STOPWORD_PATTERN}'))
           / CAST(len(string_split(text, ' ')) AS DOUBLE) AS ratio
  FROM documents)
SELECT COUNT(*) AS n_docs, ROUND(corr(nw, ratio), 6) AS corr_len_stopratio FROM q
"""


def q_priority_mix_chi2(sf_dir: str) -> pd.DataFrame:
    """Order-priority mix drift: χ² independence statistic of the
    (year × priority) contingency table — has the priority mix changed
    across years?  One bounded grouped count; the statistic (including
    zero cells of the full grid) folds on the driver."""
    ds = _t(sf_dir, "orders", ["o_orderdate", "o_orderpriority"])

    def ym(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"year": pd.to_datetime(df["o_orderdate"]).dt.year.astype(np.int64),
                             "prio": df["o_orderpriority"]})

    agg = grouped_sums(
        ds.map_batches(ym, batch_format="pandas"), ["year", "prio"], {}, "n",
    ).to_pandas()
    tab = agg.pivot_table(index="year", columns="prio", values="n", fill_value=0,
                          aggfunc="sum")
    obs = tab.to_numpy(dtype=np.float64)
    total = obs.sum()
    exp = np.outer(obs.sum(axis=1), obs.sum(axis=0)) / total
    chi2 = float(((obs - exp) ** 2 / exp).sum())
    return pd.DataFrame({
        "n_years": pd.Series([obs.shape[0]], dtype="int64"),
        "n_priorities": pd.Series([obs.shape[1]], dtype="int64"),
        "chi2": [_rd(chi2, 6)],
    })


SQL_PRIORITY_MIX_CHI2 = """
WITH c AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS year, o_orderpriority AS prio,
         COUNT(*) AS n
  FROM orders GROUP BY 1, 2),
grid AS (
  SELECT y.year, p.prio, COALESCE(c.n, 0) AS n
  FROM (SELECT DISTINCT year FROM c) y
  CROSS JOIN (SELECT DISTINCT prio FROM c) p
  LEFT JOIN c USING (year, prio)),
m AS (
  SELECT year, prio, n,
         SUM(n) OVER (PARTITION BY year) AS ry,
         SUM(n) OVER (PARTITION BY prio) AS cp,
         SUM(n) OVER () AS t
  FROM grid)
SELECT (SELECT COUNT(DISTINCT year) FROM c) AS n_years,
       (SELECT COUNT(DISTINCT prio) FROM c) AS n_priorities,
       ROUND(SUM(pow(n - ry * cp / CAST(t AS DOUBLE), 2) / (ry * cp / CAST(t AS DOUBLE))), 6)
         AS chi2
FROM m
"""


def q_balance_anova_f(sf_dir: str) -> pd.DataFrame:
    """One-way ANOVA F statistic: does mean account balance differ across
    market segments?  Per-segment (n, Σx, Σx²) moment partials from one
    pass close both the between- and within-group sums of squares on the
    driver — the textbook decomposition, no raw value ever shuffles."""
    ds = _t(sf_dir, "customer", ["c_mktsegment", "c_acctbal"])

    def part(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"seg": t["c_mktsegment"].to_numpy(zero_copy_only=False),
                           "x": t["c_acctbal"].to_numpy(zero_copy_only=False)})
        g = df.groupby("seg", as_index=False).agg(
            n=("x", "size"), sx=("x", "sum"), sxx=("x", lambda v: float((v * v).sum())))
        return pa.Table.from_pandas(g, preserve_index=False)

    p = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    g = p.groupby("seg", as_index=False).agg(n=("n", "sum"), sx=("sx", "sum"), sxx=("sxx", "sum"))
    n = g["n"].to_numpy(dtype=np.float64)
    sx = g["sx"].to_numpy()
    sxx = g["sxx"].to_numpy()
    N, k = n.sum(), len(g)
    grand = sx.sum() / N
    ssb = float((n * (sx / n - grand) ** 2).sum())
    ssw = float((sxx - sx * sx / n).sum())
    f = (ssb / (k - 1)) / (ssw / (N - k))
    return pd.DataFrame({"n_customers": pd.Series([int(N)], dtype="int64"),
                         "n_segments": pd.Series([int(k)], dtype="int64"),
                         "f_stat": [_rd(float(f), 6)]})


SQL_BALANCE_ANOVA_F = """
WITH s AS (
  SELECT c_mktsegment AS seg, COUNT(*) AS n, SUM(c_acctbal) AS sx,
         SUM(c_acctbal * c_acctbal) AS sxx
  FROM customer GROUP BY 1),
t AS (SELECT SUM(n) AS bign, COUNT(*) AS k, SUM(sx) / SUM(n) AS grand FROM s)
SELECT CAST(t.bign AS BIGINT) AS n_customers, CAST(t.k AS BIGINT) AS n_segments,
       ROUND((SUM(n * pow(sx / n - t.grand, 2)) / (t.k - 1))
             / (SUM(sxx - sx * sx / n) / (t.bign - t.k)), 6) AS f_stat
FROM s CROSS JOIN t GROUP BY t.bign, t.k, t.grand
"""


def q_price_p99_exact(sf_dir: str) -> pd.DataFrame:
    """EXACT p50/p95/p99 (discrete) of the extended price — a NEAR-UNIQUE
    column where a one-pass value histogram would be ~|rows| on the driver
    — via the two-phase refinement: a $100-bucket count histogram locates
    each target quantile's bucket, then one filtered pass builds exact cent
    counts for ONLY those buckets.  Driver state stays at
    coarse-buckets + 3 × one-bucket-of-cents regardless of row count."""
    Q = [0.5, 0.95, 0.99]
    COARSE = 10_000
    ds = _t(sf_dir, "lineitem", ["l_extendedprice"]).materialize()

    def coarse_part(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0), ndigits=0, round_mode="half_towards_infinity"), pa.int64())
        g = pa.table({"cb": pc.divide(cents, pa.scalar(COARSE, pa.int64()))}).group_by(
            ["cb"]).aggregate([([], "count_all")])
        return pa.table({"cb": g["cb"], "n": pc.cast(g["count_all"], pa.int64())})

    coarse = ds.map_batches(coarse_part, batch_format="pyarrow", zero_copy_batch=True
                            ).to_pandas().groupby("cb", as_index=False)["n"].sum().sort_values("cb")
    cum = coarse["n"].cumsum().to_numpy()
    total = int(cum[-1])
    cbs = coarse["cb"].to_numpy(dtype=np.int64)
    targets = {}
    for q in Q:
        rank = max(1, int(np.ceil(q * total)))
        i = int(np.searchsorted(cum, rank))
        targets[q] = (int(cbs[i]), int(cum[i - 1]) if i else 0, rank)
    want = np.array(sorted({cb for cb, _, _ in targets.values()}), dtype=np.int64)

    def fine_part(t: pa.Table, *, w=want) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0), ndigits=0, round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy(zero_copy_only=False)
        m = np.isin(cents // COARSE, w)
        u, c = np.unique(cents[m], return_counts=True)
        return pa.table({"bin": pa.array(u), "n": pa.array(c.astype(np.int64))})

    fine = ds.map_batches(fine_part, batch_format="pyarrow", zero_copy_batch=True
                          ).to_pandas().groupby("bin", as_index=False)["n"].sum().sort_values("bin")
    rows = []
    for q in Q:
        cb, before, rank = targets[q]
        g = fine[fine["bin"] // COARSE == cb]
        c2 = before + g["n"].cumsum().to_numpy()
        v = int(g["bin"].to_numpy()[np.searchsorted(c2, rank)])
        rows.append((q, _rd(v / 100.0, 2)))
    out = pd.DataFrame(rows, columns=["q", "price"])
    out["q"] = out["q"].astype(np.float64)
    return out


SQL_PRICE_P99_EXACT = """
SELECT * FROM (
  SELECT 0.5 AS q, ROUND(quantile_disc(l_extendedprice, 0.5), 2) AS price FROM lineitem
  UNION ALL SELECT 0.95, ROUND(quantile_disc(l_extendedprice, 0.95), 2) FROM lineitem
  UNION ALL SELECT 0.99, ROUND(quantile_disc(l_extendedprice, 0.99), 2) FROM lineitem
) ORDER BY q
"""


def q_return_rate_monthly(sf_dir: str) -> pd.DataFrame:
    """Return-rate trend: share of lineitems flagged 'R' per ship month —
    a conditional-share time series from one bounded grouped count."""
    ds = _t(sf_dir, "lineitem", ["l_shipdate", "l_returnflag"])

    def part(t: pa.Table) -> pa.Table:
        micros = pc.cast(t["l_shipdate"], pa.int64()).to_numpy(zero_copy_only=False)
        dt = pd.to_datetime(micros, unit="us")
        month = (dt.year.to_numpy() * 12 + (dt.month.to_numpy() - 1)).astype(np.int64)
        r = (t["l_returnflag"].to_numpy(zero_copy_only=False) == "R").astype(np.int64)
        g = pd.DataFrame({"month_id": month, "ret": r}).groupby(
            "month_id", as_index=False).agg(n=("ret", "size"), n_returned=("ret", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = agg.groupby("month_id", as_index=False).agg(
        n=("n", "sum"), n_returned=("n_returned", "sum"))
    out["return_rate"] = (out["n_returned"] / out["n"]).pipe(_rd)
    return _i64(out.sort_values("month_id", ignore_index=True),
                ["month_id", "n", "n_returned"])


SQL_RETURN_RATE_MONTHLY = """
SELECT CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS BIGINT) AS month_id,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
       ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS return_rate
FROM lineitem GROUP BY 1 ORDER BY 1
"""


def q_weekend_lift(sf_dir: str) -> pd.DataFrame:
    """Weekend lift per event type: observed weekend share vs the 2/7
    uniform expectation.  Day-of-week from pure epoch-day arithmetic
    ((days + 4) % 7, anchored on 1970-01-01 = Thursday) so both engines
    share one convention; one bounded grouped count."""
    ds = _t(sf_dir, "events", ["ts", "event_type"])

    def part(t: pa.Table) -> pa.Table:
        days = pc.divide(pc.cast(t["ts"], pa.int64()),
                         pa.scalar(86_400_000_000, pa.int64())).to_numpy(zero_copy_only=False)
        dow = (days + 4) % 7  # 0=Sunday … 6=Saturday
        wk = np.isin(dow, (0, 6)).astype(np.int64)
        g = pd.DataFrame({"event_type": t["event_type"].to_numpy(zero_copy_only=False),
                          "wk": wk}).groupby("event_type", as_index=False).agg(
            n=("wk", "size"), n_weekend=("wk", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = agg.groupby("event_type", as_index=False).agg(
        n=("n", "sum"), n_weekend=("n_weekend", "sum"))
    out["weekend_share"] = (out["n_weekend"] / out["n"]).pipe(_rd)
    out["lift"] = (out["n_weekend"] / out["n"] / (2.0 / 7.0)).pipe(_rd)
    return _i64(out.sort_values("event_type", ignore_index=True), ["n", "n_weekend"])


SQL_WEEKEND_LIFT = """
WITH d AS (
  SELECT event_type,
         CASE WHEN ((EPOCH_US(ts) // 86400000000) + 4) % 7 IN (0, 6)
              THEN 1 ELSE 0 END AS wk
  FROM events)
SELECT event_type, COUNT(*) AS n, CAST(SUM(wk) AS BIGINT) AS n_weekend,
       ROUND(SUM(wk) / CAST(COUNT(*) AS DOUBLE), 6) AS weekend_share,
       ROUND(SUM(wk) / CAST(COUNT(*) AS DOUBLE) / (2.0 / 7.0), 6) AS lift
FROM d GROUP BY 1 ORDER BY 1
"""


def ensure_media_parquet(sf_dir: str) -> str:
    """Materialize the real-payload media corpus (sources/media.py: genuine
    PNG/WAV/VID0 bytes + ground-truth stats) in the oracle-artifact dir."""
    import os as _os

    from ...sources.media import build_media_tables

    sf = _sf_of(sf_dir)
    n = max(48, min(4800, int(4800 * sf)))
    _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "media_frames.parquet"),
        lambda: build_media_tables(n)[1],
    )
    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "media.parquet"),
        lambda: build_media_tables(n)[0],
    )


def ensure_image_dups_parquet(sf_dir: str) -> str:
    import os as _os

    from ...sources.media import build_image_dup_table

    sf = _sf_of(sf_dir)
    n = max(30, min(3000, int(3000 * sf)))
    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "media_dups.parquet"),
        lambda: build_image_dup_table(n),
    )


def q_image_content_dedup(sf_dir: str) -> pd.DataFrame:
    """Multimodal content dedup: byte-DIFFERENT PNG encodings of the same
    pixels (Up-filter re-encode, ancillary-chunk copies) collapse to one
    group via decoded-pixel digests (PixelDigest actor pool); a planted
    one-pixel near-miss stays its own group.  Oracle = synthesis-time truth
    — payload-level hashing provably cannot reproduce it."""
    from ...functions.relational import bucketed_group_reduce
    from ...stages.multimodal import PixelDigest

    src = ensure_image_dups_parquet(sf_dir)
    ds = rd.read_parquet(src, columns=["media_id", "payload"])
    digests = ds.map_batches(
        PixelDigest,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
        zero_copy_batch=True,
    )

    def rep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["dup_of"] = df.groupby("digest")["media_id"].transform("min")
        return df[["media_id", "dup_of"]]

    out = bucketed_group_reduce(digests, ["digest"], rep).to_pandas()
    return out.sort_values("media_id", ignore_index=True)


SQL_IMAGE_CONTENT_DEDUP = f"""
SELECT media_id, dup_of
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/media_dups.parquet')
ORDER BY media_id
"""


def ensure_audio_dups_parquet(sf_dir: str) -> str:
    import os as _os

    from ...sources.media import build_audio_dup_table

    sf = _sf_of(sf_dir)
    n = max(40, min(4000, int(4000 * sf)))
    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "audio_dups.parquet"),
        lambda: build_audio_dup_table(n),
    )


def q_audio_fingerprint_dedup(sf_dir: str) -> pd.DataFrame:
    """Acoustic dedup: exact-gain re-masters (byte-different WAVs) collapse
    via the gain-invariant block-energy sign fingerprint (AudioFingerprint
    actor pool); planted same-length different-noise clips stay their own
    groups.  Oracle = synthesis-time truth."""
    from ...functions.relational import bucketed_group_reduce
    from ...stages.multimodal import AudioFingerprint

    src = ensure_audio_dups_parquet(sf_dir)
    ds = rd.read_parquet(src, columns=["media_id", "payload"])
    digests = ds.map_batches(
        AudioFingerprint,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
        zero_copy_batch=True,
    )

    def rep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["dup_of"] = df.groupby("digest")["media_id"].transform("min")
        return df[["media_id", "dup_of"]]

    out = bucketed_group_reduce(digests, ["digest"], rep).to_pandas()
    return out.sort_values("media_id", ignore_index=True)


SQL_AUDIO_FINGERPRINT_DEDUP = f"""
SELECT media_id, dup_of
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/audio_dups.parquet')
ORDER BY media_id
"""


def ensure_video_dups_parquet(sf_dir: str) -> str:
    import os as _os

    from ...sources.media import build_video_dup_table

    sf = _sf_of(sf_dir)
    n = max(24, min(2400, int(2400 * sf)))
    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "video_dups.parquet"),
        lambda: build_video_dup_table(n),
    )


def q_video_content_dedup(sf_dir: str) -> pd.DataFrame:
    """Video content dedup: containers re-encoded with a different frame
    filter (byte-different payloads, pixel-identical frames) collapse via
    decoded-frame digests (VideoDigest actor pool); a one-pixel one-frame
    near-miss stays its own group.  Oracle = synthesis-time truth."""
    from ...functions.relational import bucketed_group_reduce
    from ...stages.multimodal import VideoDigest

    src = ensure_video_dups_parquet(sf_dir)
    ds = rd.read_parquet(src, columns=["media_id", "payload"])
    digests = ds.map_batches(
        VideoDigest,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
        zero_copy_batch=True,
    )

    def rep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["dup_of"] = df.groupby("digest")["media_id"].transform("min")
        return df[["media_id", "dup_of"]]

    out = bucketed_group_reduce(digests, ["digest"], rep).to_pandas()
    return out.sort_values("media_id", ignore_index=True)


SQL_VIDEO_CONTENT_DEDUP = f"""
SELECT media_id, dup_of
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/video_dups.parquet')
ORDER BY media_id
"""


def q_media_decode_real(sf_dir: str) -> pd.DataFrame:
    """REAL multimodal decode through the actor pool: payloads are genuine
    PNG / WAV / VID0 bytes; MediaProbe (stages/multimodal.py) binds the
    stdlib codecs once per actor and re-derives width/height/duration and
    exact integer pixel/sample sums by decoding.  The oracle is the ground
    truth persisted at synthesis time — a decode bug cannot cancel out.
    Reference pattern being matched: ST2 stateful stage (service.go:284-309)."""
    from ...stages.multimodal import MediaProbe

    src = ensure_media_parquet(sf_dir)
    ds = rd.read_parquet(src, columns=["media_id", "payload", "media_type"])
    probed = ds.map_batches(
        MediaProbe,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
        zero_copy_batch=True,
    )
    out = probed.to_pandas().sort_values("media_id", ignore_index=True)
    return _i64(out, ["width", "height", "duration_ms", "px_sum", "sample_sum",
                      "sample_sq_sum", "n_frames"])


SQL_MEDIA_DECODE_REAL = f"""
SELECT media_id, media_type, width, height, duration_ms, px_sum, sample_sum,
       sample_sq_sum, n_frames
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/media.parquet')
ORDER BY media_id
"""


def q_video_frame_decode(sf_dir: str) -> pd.DataFrame:
    """Frame-sample → per-frame decode, the video feature-extraction chain
    run for real: FrameSampler(use_stub=False) parses the VID0 container and
    emits genuine PNG frame payloads; a second actor stage decodes each frame
    and reports its exact integer pixel sum.  Oracle = the per-frame ground
    truth persisted at synthesis time (media_frames.parquet) — k_frames=4 ≥
    every container's frame count, so sampling keeps ALL frames and the two
    sides must agree row-for-row."""
    from ...stages.multimodal import FrameSampler

    src = ensure_media_parquet(sf_dir)
    ds = rd.read_parquet(src, columns=["media_id", "payload", "media_type"])
    frames = ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"k_frames": 4, "use_stub": False},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
        zero_copy_batch=True,
    )

    def decode_frame(t: pa.Table) -> pa.Table:
        from ...functions.media_codecs import decode_png

        sums = [int(decode_png(p).astype(np.int64).sum()) for p in t["frame_payload"].to_pylist()]
        return pa.table(
            {
                "media_id": t["media_id"],
                "frame_index": pc.cast(t["frame_index"], pa.int64()),
                "frame_px_sum": pa.array(sums, pa.int64()),
            }
        )

    out = frames.map_batches(decode_frame, batch_format="pyarrow", zero_copy_batch=True)
    return out.to_pandas().sort_values(["media_id", "frame_index"], ignore_index=True)


SQL_VIDEO_FRAME_DECODE = f"""
SELECT media_id, frame_index, frame_px_sum
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/media_frames.parquet')
ORDER BY media_id, frame_index
"""


def q_media_resize_stats(sf_dir: str) -> pd.DataFrame:
    """Image preprocessing hop run for real: decode PNG → nearest-neighbor
    resize to 8×8 → re-encode; the emitted pixel sum of the RESIZED image is
    checked against the truth computed from the source array at synthesis
    time, and the output payload is itself a decodable PNG (round-trip
    asserted in tests/test_multimodal.py)."""
    from ...stages.multimodal import ImageResizer

    src = ensure_media_parquet(sf_dir)
    ds = rd.read_parquet(src, columns=["media_id", "payload", "media_type"])
    resized = ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"out_h": 8, "out_w": 8},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
        zero_copy_batch=True,
    )
    out = resized.select_columns(["media_id", "width", "height", "resized_px_sum"]) \
        .to_pandas().sort_values("media_id", ignore_index=True)
    return _i64(out, ["width", "height", "resized_px_sum"])


SQL_MEDIA_RESIZE_STATS = f"""
SELECT media_id, CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
       resized_px_sum
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/media.parquet')
WHERE media_type = 'image'
ORDER BY media_id
"""


RANGE_SORT_QS = (0.25, 0.5, 0.75)


def q_range_partitioned_sort(sf_dir: str) -> pd.DataFrame:
    """Range-partitioned global sort — the sorted-storage layout operator:
    exact quantile boundaries (one mergeable cent-histogram pass, the same
    discrete-quantile convention every quantile query shares), every row
    tagged with its range by a vectorized searchsorted, rows sorted within
    each BATCH and written one directory per range (range=NN/part-*.parquet,
    deterministic names).  A key-range reader prunes whole range dirs by
    name, then prunes files inside the chosen dir by parquet footer min/max
    stats (each file is sorted, so stats are tight) — no data page of a
    non-matching range or file is ever read.  A totally-ordered single file
    per range would need a range-keyed exchange + per-range sort; the
    dir+footer layout gives the same pruning without that shuffle.

    Scale shape: the only full pass is the histogram partial reduce
    ((bin, n) rows exchange); tagging/sorting/writing is per-batch and the
    boundaries broadcast.  Output here is the per-range summary
    (count + true min/max cents), cross-checked by the oracle's
    quantile_disc CASE; within-range file order is asserted in
    tests/test_queries_misc.py style read-back (tests/test_range_sort.py).
    """
    from ...functions.sketch import grouped_histogram_fixedpoint, quantile_disc_from_counts

    ds = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    hist = grouped_histogram_fixedpoint(
        ds.map_batches(
            lambda t: t.append_column("g", pa.array(np.zeros(len(t), np.int8))),
            batch_format="pyarrow", zero_copy_batch=True,
        ),
        "g", "o_totalprice", scale=100,
    )
    b = hist["bin"].to_numpy()
    c = hist["n"].to_numpy()
    order = np.argsort(b)
    b, c = b[order], c[order]
    bounds = np.array(
        [quantile_disc_from_counts(b, c, q) for q in RANGE_SORT_QS], dtype=np.int64
    )

    out_dir = _os.path.join(_corpus_dir(sf_dir), "range_sort")
    import shutil as _shutil

    _shutil.rmtree(out_dir, ignore_errors=True)

    def tag_sort_write(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(t["o_totalprice"], 100.0), ndigits=0,
                     round_mode="half_towards_infinity"),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        rid = np.searchsorted(bounds, cents, side="right").astype(np.int64)
        keys = t["o_orderkey"].to_numpy(zero_copy_only=False)
        parts = []
        for r in np.unique(rid):
            m = rid == r
            sub_c, sub_k = cents[m], keys[m]
            o = np.lexsort((sub_k, sub_c))  # range-local sort (key tie-break)
            sub = pa.table({"o_orderkey": sub_k[o], "cents": sub_c[o]})
            d = _os.path.join(out_dir, f"range={int(r):02d}")
            _os.makedirs(d, exist_ok=True)
            from ...functions.hashing import mix64

            digest = int(np.bitwise_xor.reduce(
                mix64(sub_k[o].astype(np.int64).view(np.uint64))) ^ np.uint64(len(sub)))
            import uuid as _uuid

            path = _os.path.join(d, f"part-{digest:016x}.parquet")
            tmp = path + f".tmp-{_uuid.uuid4().hex}"
            pq.write_table(sub, tmp)
            _os.replace(tmp, path)
            parts.append(pa.table({
                "range_id": pa.array([int(r)], pa.int64()),
                "n": pa.array([int(m.sum())], pa.int64()),
                "min_c": pa.array([int(sub_c.min())], pa.int64()),
                "max_c": pa.array([int(sub_c.max())], pa.int64()),
            }))
        return pa.concat_tables(parts) if parts else pa.table(
            {"range_id": pa.array([], pa.int64()), "n": pa.array([], pa.int64()),
             "min_c": pa.array([], pa.int64()), "max_c": pa.array([], pa.int64())})

    parts = ds.map_batches(
        tag_sort_write, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    out = parts.groupby("range_id", as_index=False).agg(
        n=("n", "sum"), min_c=("min_c", "min"), max_c=("max_c", "max"))
    return _i64(out.sort_values("range_id", ignore_index=True),
                ["range_id", "n", "min_c", "max_c"])


import os as _os  # noqa: E402  (used by artifact-writing queries above)


SQL_RANGE_PARTITIONED_SORT = """
WITH c AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
b AS (
  SELECT quantile_disc(cents, 0.25) AS q1,
         quantile_disc(cents, 0.5)  AS q2,
         quantile_disc(cents, 0.75) AS q3
  FROM c)
SELECT CASE WHEN cents < q1 THEN 0 WHEN cents < q2 THEN 1
            WHEN cents < q3 THEN 2 ELSE 3 END AS range_id,
       COUNT(*) AS n, MIN(cents) AS min_c, MAX(cents) AS max_c
FROM c CROSS JOIN b GROUP BY 1 ORDER BY 1
"""


