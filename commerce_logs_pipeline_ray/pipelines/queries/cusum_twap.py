"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import (
    ORACLE_ARTIFACT_DIR,
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
from .curation_a import ensure_neardup_pairs_parquet  # noqa: F401
from .neardup_a import _ensure_artifact  # noqa: F401
from .neardup_b import _sf_of  # noqa: F401
from .webclean import ensure_web_docs_parquet  # noqa: F401

# ---------------------------------------------------------------------------
# CUSUM changepoint scan + time-weighted average (session-3 batch 6)
# ---------------------------------------------------------------------------

def q_cusum_changepoint(sf_dir: str) -> pd.DataFrame:
    """CUSUM changepoint scan per event type over the hourly count series:
    cumulative deviation from the overall hourly mean, kept INTEGER by
    cross-multiplication (cum_k = Σ n_i·H − k·N stays exact — no float
    drift), argmax |cusum| with ties to the earliest hour.  One (type,
    hour) combiner exchange; the per-type series fold is driver-side over
    the tiny hourly grid."""
    ds = _t(sf_dir, "events", ["ts", "event_type"])

    def add_hour(t: pa.Table) -> pa.Table:
        micros = pc.cast(t["ts"], pa.int64())
        hour_id = pc.divide(micros, pa.scalar(3_600_000_000, pa.int64()))
        return pa.table({"hour_id": hour_id, "event_type": t["event_type"]})

    hourly = grouped_sums(
        ds.map_batches(add_hour, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "hour_id"], {}, "n",
    ).to_pandas()
    rows = []
    for et, g in hourly.groupby("event_type", sort=True):
        g = g.sort_values("hour_id", ignore_index=True)
        n = g["n"].to_numpy(np.int64)
        hours = g["hour_id"].to_numpy(np.int64)
        H, N = len(n), int(n.sum())
        # cum_k = Σ_{i<=k} (n_i*H - N)  ==  H*prefix_k - (k+1)*N   (exact ints)
        cum = np.cumsum(n * H) - (np.arange(1, H + 1, dtype=np.int64)) * N
        k = int(np.argmax(np.abs(cum)))  # first max == earliest hour
        rows.append((et, H, N, int(hours[k]), int(cum[k])))
    out = pd.DataFrame(
        rows, columns=["event_type", "n_hours", "n_events", "peak_hour", "peak_cusum"]
    )
    return _i64(out, ["n_hours", "n_events", "peak_hour", "peak_cusum"])


SQL_CUSUM_CHANGEPOINT = """
WITH h AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_id,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type, hour_id, n,
         COUNT(*) OVER (PARTITION BY event_type) AS nh,
         SUM(n) OVER (PARTITION BY event_type) AS tot,
         SUM(n) OVER (PARTITION BY event_type ORDER BY hour_id
                      ROWS UNBOUNDED PRECEDING) AS pre,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hour_id) AS k
  FROM h
),
c AS (
  SELECT event_type, hour_id, nh, tot,
         CAST(nh * pre - k * tot AS BIGINT) AS cusum
  FROM s
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY ABS(cusum) DESC, hour_id ASC) AS rk
  FROM c
)
SELECT event_type, CAST(nh AS BIGINT) AS n_hours, CAST(tot AS BIGINT) AS n_events,
       hour_id AS peak_hour, cusum AS peak_cusum
FROM r WHERE rk = 1 ORDER BY event_type
"""


def q_twap_user_value(sf_dir: str) -> pd.DataFrame:
    """Time-weighted average event value per user (top 20 by TWAP): each
    event's value holds until the user's next event; weights are exact µs
    gaps × exact cents, one integer dot product per user inside the
    bucketed exchange.  Users with < 2 events are excluded (zero span)."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts", "value", "event_id"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_id": t["event_id"],
                "ts_us": pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()),
                "cents": pc.cast(
                    pc.round(pc.multiply(pc.fill_null(t["value"], 0.0), 100.0)), pa.int64()
                ),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for uid, g in df.groupby("user_id", sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values(["ts_us", "event_id"])
            ts = g["ts_us"].to_numpy(np.int64)
            cents = g["cents"].to_numpy(np.int64)
            gaps = np.diff(ts)
            num = int((cents[:-1] * gaps).sum())
            den = int(ts[-1] - ts[0])
            rows.append((uid, len(g), num, den))
        import pandas as _pd

        return _pd.DataFrame(rows, columns=["user_id", "n_events", "num", "den"])

    agg = bucketed_group_reduce(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"], per_bucket,
    ).to_pandas()
    if not len(agg):
        return pd.DataFrame(columns=["user_id", "n_events", "twap"])
    agg = agg[agg["den"] > 0].copy()
    agg["twap"] = _rd(agg["num"].to_numpy(np.float64) / agg["den"].to_numpy(np.float64) / 100.0, 6)
    out = agg.sort_values(["twap", "user_id"], ascending=[False, True], ignore_index=True).head(20)
    return _i64(out[["user_id", "n_events", "twap"]].copy(), ["user_id", "n_events"])


SQL_TWAP_USER_VALUE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents, event_id
  FROM events
),
w AS (
  SELECT user_id, cents, ts_us,
         LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS nxt
  FROM e
),
a AS (
  SELECT user_id, COUNT(*) + 1 AS n_events,
         SUM(cents * (nxt - ts_us)) AS num,
         MAX(nxt) - MIN(ts_us) AS den
  FROM w WHERE nxt IS NOT NULL GROUP BY 1
)
SELECT CAST(user_id AS BIGINT) AS user_id, CAST(n_events AS BIGINT) AS n_events,
       ROUND(num / CAST(den AS DOUBLE) / 100.0, 6) AS twap
FROM a WHERE den > 0
ORDER BY twap DESC, user_id ASC LIMIT 20
"""


def q_webclean_pipeline(sf_dir: str) -> pd.DataFrame:
    """End-to-end web cleaning funnel (C4 doc kill → C4 line filter +
    3-line rule → Gopher gates on the CLEANED text → cross-doc line dedup
    rewrite) — streaming stage composition, one dedup combiner exchange
    (functions/webclean.py::webclean_pipeline)."""
    from ...functions.webclean import webclean_pipeline

    src = ensure_web_docs_parquet(sf_dir)
    ds = rd.read_parquet(src, columns=["doc_id", "source", "text"], override_num_blocks=8)
    stats, _final = webclean_pipeline(ds)
    return stats


SQL_WEBCLEAN_PIPELINE = r"""
WITH d AS (
  SELECT doc_id, source, string_split(text, chr(10)) AS ls,
         (contains(lower(text), 'lorem ipsum') OR contains(text, '{')) AS killed
  FROM read_parquet('{AD}/web_docs.parquet')
),
l0 AS (
  SELECT doc_id, unnest(ls) AS line, generate_subscripts(ls, 1) AS li FROM d
),
lk AS (
  SELECT doc_id, line, li,
         ((line LIKE '%.' OR line LIKE '%!' OR line LIKE '%?' OR line LIKE '%"')
          AND len(string_split(line, ' ')) >= 5
          AND NOT contains(lower(line), 'javascript')) AS kept
  FROM l0
),
ck AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY li) AS ctext, COUNT(*) AS kc
  FROM lk WHERE kept GROUP BY 1
),
a AS (
  SELECT d.doc_id, d.source, d.killed,
         COALESCE(ck.ctext, '') AS ctext, COALESCE(ck.kc, 0) AS kc,
         (NOT d.killed AND COALESCE(ck.kc, 0) >= 3) AS ok0,
         (NOT d.killed AND COALESCE(ck.kc, 0) < 3) AS short
  FROM d LEFT JOIN ck USING (doc_id)
),
gl AS (
  SELECT doc_id, unnest(string_split(ctext, chr(10))) AS line FROM a WHERE ok0
),
glagg AS (
  SELECT doc_id, COUNT(*) AS n_lines,
         SUM(CASE WHEN line LIKE '- %' THEN 1 ELSE 0 END) AS n_bullet,
         SUM(CASE WHEN line LIKE '%...' THEN 1 ELSE 0 END) AS n_ellip
  FROM gl GROUP BY 1
),
gw AS (
  SELECT doc_id, unnest(string_split(replace(ctext, chr(10), ' '), ' ')) AS word
  FROM a WHERE ok0
),
gwagg AS (
  SELECT doc_id, COUNT(*) AS n_words, SUM(length(word)) AS sum_len,
         SUM(CASE WHEN contains(word, '#') OR contains(word, '...')
                  THEN 1 ELSE 0 END) AS n_sym,
         SUM(CASE WHEN regexp_matches(word, '[a-zA-Z]') THEN 1 ELSE 0 END) AS n_alpha
  FROM gw GROUP BY 1
),
gates AS (
  SELECT a.doc_id,
         NOT (n_words < 20 OR n_words > 100000
              OR sum_len < 3 * n_words OR sum_len > 10 * n_words
              OR 10 * n_sym > n_words
              OR 10 * n_bullet > 9 * n_lines
              OR 10 * n_ellip > 3 * n_lines
              OR 5 * n_alpha < 4 * n_words
              OR len(regexp_extract_all(a.ctext, '\b(?:the|a|of|and|to)\b')) < 2) AS gpass
  FROM a JOIN glagg ON glagg.doc_id = a.doc_id JOIN gwagg ON gwagg.doc_id = a.doc_id
  WHERE a.ok0
),
surv AS (
  SELECT a.doc_id, a.source, a.ctext
  FROM a JOIN gates ON gates.doc_id = a.doc_id WHERE gates.gpass
),
sl AS (
  SELECT doc_id, source, unnest(string_split(ctext, chr(10))) AS line,
         generate_subscripts(string_split(ctext, chr(10)), 1) AS li
  FROM surv
),
dup AS (
  SELECT line FROM (SELECT line, COUNT(DISTINCT doc_id) AS c FROM sl GROUP BY 1)
  WHERE c >= 3
),
fin AS (
  SELECT doc_id, source,
         SUM(CASE WHEN line IN (SELECT line FROM dup) THEN 1 ELSE 0 END) AS removed,
         COALESCE(SUM(CASE WHEN line NOT IN (SELECT line FROM dup)
                           THEN length(line) ELSE 0 END)
                  + GREATEST(SUM(CASE WHEN line NOT IN (SELECT line FROM dup)
                                      THEN 1 ELSE 0 END) - 1, 0), 0) AS chars_out
  FROM sl GROUP BY 1, 2
),
fa AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS docs_in,
         CAST(SUM(CASE WHEN killed THEN 1 ELSE 0 END) AS BIGINT) AS docs_killed,
         CAST(SUM(CASE WHEN short THEN 1 ELSE 0 END) AS BIGINT) AS docs_short,
         CAST(SUM(CASE WHEN ok0 AND doc_id IN (SELECT doc_id FROM gates WHERE NOT gpass)
                       THEN 1 ELSE 0 END) AS BIGINT) AS docs_quality_fail
  FROM a GROUP BY 1
),
fd AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS docs_out,
         CAST(SUM(removed) AS BIGINT) AS lines_dedup_removed,
         CAST(SUM(chars_out) AS BIGINT) AS chars_out
  FROM fin GROUP BY 1
)
SELECT fa.source, docs_in, docs_killed, docs_short, docs_quality_fail,
       CAST(COALESCE(docs_out, 0) AS BIGINT) AS docs_out,
       CAST(COALESCE(lines_dedup_removed, 0) AS BIGINT) AS lines_dedup_removed,
       CAST(COALESCE(fd.chars_out, 0) AS BIGINT) AS chars_out
FROM fa LEFT JOIN fd ON fd.source = fa.source ORDER BY 1
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


def q_incremental_agg(sf_dir: str) -> pd.DataFrame:
    """Incremental aggregate maintenance (state/aggstate.py): the events
    stream split into two runs at its median hour, each run folded into a
    persisted per-(event_type) state WITHOUT rescanning history; re-applied
    run ids are no-ops.  Result = state read-back; oracle = one-shot full
    aggregate — equality proves fold ≡ recompute."""
    import os as _os

    from ...state.aggstate import IncrementalAgg, fold_run

    ds = _t(sf_dir, "events", ["ts", "event_type", "value"])
    # deterministic split point: integer midpoint of the µs range
    import pyarrow.parquet as _pq

    meta = _pq.read_table(f"{sf_dir}/events.parquet", columns=["ts"])
    ts_us = pc.cast(pc.cast(meta["ts"], pa.timestamp("us")), pa.int64())
    mid = (int(pc.min(ts_us).as_py()) + int(pc.max(ts_us).as_py())) // 2

    def half(t: pa.Table, first: bool) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        mask = pc.less(us, mid) if first else pc.greater_equal(us, mid)
        return t.filter(mask)

    state_dir = _os.path.join(_corpus_dir(sf_dir), "agg_state_v1")
    state = IncrementalAgg(state_dir, ["event_type"], ["cents"])
    fold_run(
        ds.map_batches(lambda t: half(t, True), batch_format="pyarrow", zero_copy_batch=True),
        state, "run-1",
    )
    fold_run(
        ds.map_batches(lambda t: half(t, False), batch_format="pyarrow", zero_copy_batch=True),
        state, "run-2",
    )
    # idempotence: re-applying run-1 must be a no-op
    fold_run(
        ds.map_batches(lambda t: half(t, True), batch_format="pyarrow", zero_copy_batch=True),
        state, "run-1",
    )
    out = state.read()
    out["total_value"] = _rd(out["cents"].to_numpy(np.float64) / 100.0, 2)
    return _i64(out[["event_type", "n", "total_value"]].copy(), ["n"])


SQL_INCREMENTAL_AGG = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0, 2)
         AS total_value
FROM events GROUP BY 1 ORDER BY 1
"""


def _spread16(x: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of each value to even bit positions (the
    classic Morton magic-number cascade) — mirrored bit-for-bit in SQL."""
    x = x.astype(np.uint64) & np.uint64(0xFFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x33333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x55555555)
    return x


def q_zorder_locality(sf_dir: str) -> pd.DataFrame:
    """Z-order (Morton) clustering audit — the lakehouse layout question
    "does interleaving (user, hour) let BOTH single-column predicates prune
    blocks?".  Blocks are z-key prefixes (z >> 12), the unit a z-range file
    covers; the single-key layout's blocks are hour-key prefixes.  All six
    distinct-counts (2 key cardinalities + 4 (entity, block) layouts) ride
    ONE tagged-packed combiner exchange — tag(3b)·key(16b)·block(20b) fit
    one int64, each batch emits its distinct packed rows per tag, and a
    single grouped distinct + per-tag count replaces the six separate
    read→key→exchange pipelines the first version ran."""
    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def tagged_packed(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        hour = pc.divide(us, pa.scalar(3_600_000_000, pa.int64())).to_numpy(
            zero_copy_only=False
        )
        u16 = (t["user_id"].to_numpy(zero_copy_only=False) % 65536).astype(np.int64)
        h16 = (hour % 65536).astype(np.int64)
        z = (_spread16(u16) | (_spread16(h16) << np.uint64(1))).astype(np.int64)
        zblock = z >> np.int64(12)
        hblock = h16 >> np.int64(4)
        zero = np.zeros(len(u16), np.int64)
        parts = [
            (0, u16, zero), (1, h16, zero),
            (2, u16, zblock), (3, h16, zblock),
            (4, u16, hblock), (5, h16, hblock),
        ]
        packed = np.concatenate([
            (np.int64(tag) << np.int64(36)) | (a << np.int64(20)) | b
            for tag, a, b in parts
        ])
        return pa.table({"p": pa.array(np.unique(packed))})

    dd = grouped_sums(
        ds.map_batches(tagged_packed, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["p"], {}, "dups",
    )
    tag_counts = (
        dd.map_batches(
            lambda t: pa.table({"tag": pa.array(
                t["p"].to_numpy(zero_copy_only=False) >> np.int64(36)),
                "n": pa.array(np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas().groupby("tag")["n"].sum()
    )
    names = ["n_users", "n_hours", "z_blocks_by_user", "z_blocks_by_hour",
             "h_blocks_by_user", "h_blocks_by_hour"]
    out = pd.DataFrame([{nm: int(tag_counts.get(i, 0))
                         for i, nm in enumerate(names)}])
    return out.astype("int64")


SQL_ZORDER_LOCALITY = """
WITH k AS (
  SELECT user_id % 65536 AS u16,
         (CAST(floor(epoch(ts) / 3600) AS BIGINT) % 65536) AS h16
  FROM events
),
-- spread16 Morton cascade, one stage per CTE (mirrors _spread16 exactly)
s1 AS (
  SELECT u16, h16,
         (u16 | (u16 << 8)) & 16711935 AS ua, (h16 | (h16 << 8)) & 16711935 AS ha
  FROM k
),
s2 AS (
  SELECT u16, h16,
         (ua | (ua << 4)) & 252645135 AS ub, (ha | (ha << 4)) & 252645135 AS hb
  FROM s1
),
s3 AS (
  SELECT u16, h16,
         (ub | (ub << 2)) & 858993459 AS uc, (hb | (hb << 2)) & 858993459 AS hc
  FROM s2
),
s AS (
  SELECT u16, h16,
         (uc | (uc << 1)) & 1431655765 AS su, (hc | (hc << 1)) & 1431655765 AS sh
  FROM s3
),
z AS (
  SELECT u16, h16, ((su | (sh << 1)) >> 12) AS zblock, (h16 >> 4) AS hblock FROM s
)
SELECT CAST(COUNT(DISTINCT u16) AS BIGINT) AS n_users,
       CAST(COUNT(DISTINCT h16) AS BIGINT) AS n_hours,
       CAST((SELECT COUNT(*) FROM (SELECT DISTINCT u16, zblock FROM z)) AS BIGINT)
         AS z_blocks_by_user,
       CAST((SELECT COUNT(*) FROM (SELECT DISTINCT h16, zblock FROM z)) AS BIGINT)
         AS z_blocks_by_hour,
       CAST((SELECT COUNT(*) FROM (SELECT DISTINCT u16, hblock FROM z)) AS BIGINT)
         AS h_blocks_by_user,
       CAST((SELECT COUNT(*) FROM (SELECT DISTINCT h16, hblock FROM z)) AS BIGINT)
         AS h_blocks_by_hour
FROM z
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


def q_histogram_split_finder(sf_dir: str) -> pd.DataFrame:
    """GBDT histogram split finding (the LightGBM hot loop) over the event
    stream: per-feature bucket histograms (count + exact cents sum) reduce
    as integer partials in ONE tagged exchange; the variance-reduction gain
    scan (SL²/nL + SR²/nR − S²/n) runs over prefix sums of the ~100-bucket
    histogram driver-side.  Best split per feature, gain from exact ints,
    ties → lowest bucket."""
    ds = _t(sf_dir, "events", ["ts", "user_id", "event_type", "value"])

    def hist(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        hour24 = (
            pc.divide(us, pa.scalar(3_600_000_000, pa.int64())).to_numpy(zero_copy_only=False)
            % 24
        ).astype(np.int64)
        ubkt = (t["user_id"].to_numpy(zero_copy_only=False) % 64).astype(np.int64)
        cents = (
            pc.cast(pc.round(pc.multiply(pc.fill_null(t["value"], 0.0), 100.0)), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        frames = []
        for feat, bkt, nb in (("hour24", hour24, 24), ("user64", ubkt, 64)):
            n = np.bincount(bkt, minlength=nb).astype(np.int64)
            s = np.bincount(bkt, weights=cents, minlength=nb).astype(np.int64)
            frames.append(
                pa.table(
                    {
                        "feature": pa.array([feat] * nb),
                        "bucket": pa.array(np.arange(nb, dtype=np.int64)),
                        "n": pa.array(n),
                        "s": pa.array(s),
                    }
                )
            )
        return pa.concat_tables(frames)

    h = (
        ds.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby(["feature", "bucket"], as_index=False)
        .sum()
    )
    h = h[h["n"] > 0]  # SQL's GROUP BY only yields populated buckets
    rows = []
    for feat, g in h.groupby("feature", sort=True):
        g = g.sort_values("bucket", ignore_index=True)
        n = g["n"].to_numpy(np.int64)
        s = g["s"].to_numpy(np.int64)
        N, S = int(n.sum()), int(s.sum())
        nl = np.cumsum(n)[:-1].astype(np.float64)
        sl = np.cumsum(s)[:-1].astype(np.float64)
        nr, sr = N - nl, S - sl
        valid = (nl > 0) & (nr > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            gain = np.where(
                valid, sl * sl / nl + sr * sr / nr - (S * float(S)) / N, -np.inf
            )
        gain = _rd(gain, 6)
        k = int(np.argmax(gain))  # first max == lowest bucket
        rows.append(
            (feat, int(g["bucket"][k]), int(n[: k + 1].sum()), int(s[: k + 1].sum()), gain[k])
        )
    out = pd.DataFrame(
        rows, columns=["feature", "split_bucket", "n_left", "sum_left_cents", "gain"]
    )
    return _i64(out, ["split_bucket", "n_left", "sum_left_cents"])


SQL_HISTOGRAM_SPLIT_FINDER = """
WITH e AS (
  SELECT (CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24) AS hour24,
         (user_id % 64) AS user64,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events
),
h AS (
  SELECT 'hour24' AS feature, hour24 AS bucket, COUNT(*) AS n, SUM(cents) AS s
  FROM e GROUP BY 2
  UNION ALL
  SELECT 'user64' AS feature, user64 AS bucket, COUNT(*) AS n, SUM(cents) AS s
  FROM e GROUP BY 2
),
p AS (
  SELECT feature, bucket, n, s,
         SUM(n) OVER (PARTITION BY feature ORDER BY bucket
                      ROWS UNBOUNDED PRECEDING) AS nl,
         SUM(s) OVER (PARTITION BY feature ORDER BY bucket
                      ROWS UNBOUNDED PRECEDING) AS sl,
         SUM(n) OVER (PARTITION BY feature) AS nt,
         SUM(s) OVER (PARTITION BY feature) AS st,
         MAX(bucket) OVER (PARTITION BY feature) AS maxb
  FROM h
),
g AS (
  SELECT feature, bucket, nl, sl,
         ROUND(CAST(sl AS DOUBLE) * sl / nl
               + CAST(st - sl AS DOUBLE) * (st - sl) / (nt - nl)
               - CAST(st AS DOUBLE) * st / nt, 6) AS gain
  FROM p WHERE bucket < maxb AND nl > 0 AND (nt - nl) > 0
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY feature
                               ORDER BY gain DESC, bucket ASC) AS rk
  FROM g
)
SELECT feature, bucket AS split_bucket, CAST(nl AS BIGINT) AS n_left,
       CAST(sl AS BIGINT) AS sum_left_cents, gain
FROM r WHERE rk = 1 ORDER BY feature
"""


def q_split_leakage_audit(sf_dir: str) -> pd.DataFrame:
    """Train/val leakage via near-duplicates (the eval-hygiene check every
    benchmark split needs): the distributed MinHash+LSH pair set crossed
    with the hash-fraction split — a near-dup pair straddling train and val
    leaks eval signal.  Per category: pair count and an id checksum pinning
    WHICH pairs (Σ doc_a + doc_b)."""
    from ...functions.dedup import minhash_lsh_pairs

    ensure_neardup_pairs_parquet(sf_dir)
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    pairs = minhash_lsh_pairs(ds, threshold=0.5)

    def split_of(ids: pd.Series) -> np.ndarray:
        import hashlib as _hl

        return np.array(
            [
                "val" if _hl.md5(f"{int(i)}:split".encode()).hexdigest() < "1a" else "train"
                for i in ids
            ]
        )

    sa, sb = split_of(pairs["doc_a"]), split_of(pairs["doc_b"])
    cat = np.where(
        sa == sb, np.where(sa == "train", "train-train", "val-val"), "train-val"
    )
    pairs = pairs.assign(category=cat)
    pairs["idsum"] = pairs["doc_a"].astype("int64") + pairs["doc_b"].astype("int64")
    out = (
        pairs.groupby("category", as_index=False)
        .agg(n_pairs=("idsum", "size"), id_checksum=("idsum", "sum"))
        .sort_values("category", ignore_index=True)
    )
    return _i64(out, ["n_pairs", "id_checksum"])


SQL_SPLIT_LEAKAGE_AUDIT = """
WITH p AS (
  SELECT doc_a, doc_b FROM read_parquet('{AD}/neardup_pairs_ref.parquet')
),
c AS (
  SELECT doc_a, doc_b,
         CASE WHEN md5(CAST(doc_a AS VARCHAR) || ':split') < '1a'
              THEN 'val' ELSE 'train' END AS sa,
         CASE WHEN md5(CAST(doc_b AS VARCHAR) || ':split') < '1a'
              THEN 'val' ELSE 'train' END AS sb
  FROM p
)
SELECT CASE WHEN sa = sb AND sa = 'train' THEN 'train-train'
            WHEN sa = sb THEN 'val-val' ELSE 'train-val' END AS category,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(doc_a + doc_b) AS BIGINT) AS id_checksum
FROM c GROUP BY 1 ORDER BY 1
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


def q_sort_merge_revenue(sf_dir: str) -> pd.DataFrame:
    """Orders × customer THROUGH the sort-merge join (range-bucketed
    co-group, searchsorted run expansion — functions/relational.py::
    sort_merge_join): revenue and order count per market segment.  Same
    result as the hash-join plan; the point is the key-ordered physical
    operator the lakehouse range-clustered path wants."""
    from ...functions.relational import sort_merge_join

    orders = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": t["o_custkey"],
                "cents": pc.cast(
                    pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64()
                ),
            }
        )

    joined = sort_merge_join(
        orders.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True),
        cust,
        on="o_custkey",
        right_on="c_custkey",
    )
    out = grouped_sums(joined, ["c_mktsegment"], {"cents": "cents"}, "n_orders").to_pandas()
    out["revenue"] = _rd(out["cents"].to_numpy(np.float64) / 100.0, 2)
    out = out[["c_mktsegment", "n_orders", "revenue"]].sort_values(
        "c_mktsegment", ignore_index=True
    )
    return _i64(out, ["n_orders"])


SQL_SORT_MERGE_REVENUE = """
SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE)
             / 100.0, 2) AS revenue
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY 1 ORDER BY 1
"""


def _copurchase_weighted_edges(sf_dir: str):
    """Distinct co-purchase edges with integer weights w = max(1, 10 − c)
    (stronger ties are shorter), symmetrized — the SSSP input.  Reads the
    shared once-per-sf-dir edge artifact (graph_edges.py) instead of
    re-running the pair exchange."""
    from .graph_edges import copurchase_edges_ds

    edges = copurchase_edges_ds(sf_dir)

    def weight_sym(t: pa.Table) -> pa.Table:
        a = t["part_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["part_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = np.maximum(1, 10 - c)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
                "w": pa.array(np.concatenate([w, w])),
            }
        )

    return edges.map_batches(weight_sym, batch_format="pyarrow", zero_copy_batch=True)


def ensure_sssp_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``sssp_copurchase``: expected distances from an
    INDEPENDENT scalar derivation — itertools pair expansion per order and a
    heapq Dijkstra, vs the engine's bucketed pair combiners and synchronous
    Bellman-Ford rounds."""
    import heapq as _heapq
    import os as _os
    from collections import defaultdict
    from itertools import combinations

    def build() -> pa.Table:
        t = pq.read_table(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
        by_order: dict[int, set[int]] = defaultdict(set)
        for o, p in zip(t["l_orderkey"].to_pylist(), t["l_partkey"].to_pylist()):
            by_order[int(o)].add(int(p))
        counts: dict[tuple[int, int], int] = defaultdict(int)
        for parts in by_order.values():
            for a, b in combinations(sorted(parts), 2):
                counts[(a, b)] += 1
        adj: dict[int, list[tuple[int, int]]] = defaultdict(list)
        for (a, b), c in counts.items():
            wt = max(1, 10 - c)
            adj[a].append((b, wt))
            adj[b].append((a, wt))
        source = min(adj)
        dist = {source: 0}
        heap = [(0, source)]
        while heap:
            d, u = _heapq.heappop(heap)
            if d > dist.get(u, 1 << 60):
                continue
            for v, wt in adj[u]:
                nd = d + wt
                if nd < dist.get(v, 1 << 60):
                    dist[v] = nd
                    _heapq.heappush(heap, (nd, v))
        nodes = sorted(dist)
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "dist": pa.array([dist[n] for n in nodes], pa.int64()),
            }
        )

    return _ensure_artifact(_os.path.join(_corpus_dir(sf_dir), "sssp_ref.parquet"), build)


def q_sssp_copurchase(sf_dir: str) -> pd.DataFrame:
    """Weighted single-source shortest paths over the co-purchase graph
    (functions/graph.py::sssp_bellman_ford — synchronous relax rounds,
    integer distances, broadcast dist map) from the smallest part id;
    oracle = independent heapq Dijkstra."""
    from ...functions.graph import sssp_bellman_ford

    ensure_sssp_parquet(sf_dir)
    edges = _copurchase_weighted_edges(sf_dir).materialize()
    source = int(
        edges.map_batches(
            lambda t: pa.table({"m": pa.array([pc.min(t["src"]).as_py()], pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True,
        ).to_pandas()["m"].min()
    )
    return sssp_bellman_ford(edges, source)


SQL_SSSP_COPURCHASE = """
SELECT node, dist FROM read_parquet('{AD}/sssp_ref.parquet') ORDER BY node
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


def ensure_channel_stats_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``image_channel_stats``: per-image channel sums
    recorded at SYNTHESIS time from the source pixel arrays — fully
    independent of the PNG decoder the engine must invert to reproduce
    them."""
    import os as _os

    def build() -> pa.Table:
        from ...functions.media_codecs import encode_png

        rng = np.random.default_rng(7)
        sf = _sf_of(sf_dir)
        n = max(30, min(3000, int(3000 * sf)))
        ids, payloads, rs, gs, bs, px = [], [], [], [], [], []
        for i in range(n):
            w, h = 14 + i % 19, 12 + i % 15
            img = (
                np.add.outer(np.arange(h), np.arange(w))[..., None] * [3, 11, 5]
                + rng.integers(0, 180, size=(h, w, 3))
            ).astype(np.uint8)
            ids.append(f"cimg{i:05d}")
            payloads.append(encode_png(img))
            rs.append(int(img[..., 0].sum()))
            gs.append(int(img[..., 1].sum()))
            bs.append(int(img[..., 2].sum()))
            px.append(h * w)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "n_pixels": pa.array(px, pa.int64()),
                "sum_r": pa.array(rs, pa.int64()),
                "sum_g": pa.array(gs, pa.int64()),
                "sum_b": pa.array(bs, pa.int64()),
            }
        )

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "channel_stats.parquet"), build
    )


def q_image_channel_stats(sf_dir: str) -> pd.DataFrame:
    """Dataset normalization statistics (the mean-pixel preflight every
    vision training run computes): decode each PNG in an actor pool, sum
    pixels per channel as integers, reduce corpus-wide, divide once —
    checked against synthesis-time source-array sums the decoder never saw."""
    from ...functions.media_codecs import decode_png

    src = ensure_channel_stats_parquet(sf_dir)
    ds = rd.read_parquet(src, columns=["media_id", "payload"])

    class ChannelSums:
        def __init__(self):
            self._decode = decode_png

        def __call__(self, t: pa.Table) -> pa.Table:
            n_px = np.zeros(1, np.int64)
            sums = np.zeros(3, np.int64)
            for p in t["payload"].to_pylist():
                img = self._decode(p)
                n_px[0] += img.shape[0] * img.shape[1]
                sums += img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
            return pa.table(
                {
                    "n_pixels": pa.array(n_px),
                    "sum_r": pa.array(sums[:1]),
                    "sum_g": pa.array(sums[1:2]),
                    "sum_b": pa.array(sums[2:3]),
                }
            )

    agg = (
        ds.map_batches(
            ChannelSums, batch_format="pyarrow", batch_size=64, concurrency=2,
            zero_copy_batch=True,
        )
        .to_pandas()
        .sum()
    )
    out = pd.DataFrame(
        [
            {
                "n_pixels": int(agg["n_pixels"]),
                "mean_r": float(_rd(np.array([agg["sum_r"] / agg["n_pixels"]]), 6)[0]),
                "mean_g": float(_rd(np.array([agg["sum_g"] / agg["n_pixels"]]), 6)[0]),
                "mean_b": float(_rd(np.array([agg["sum_b"] / agg["n_pixels"]]), 6)[0]),
            }
        ]
    )
    return _i64(out, ["n_pixels"])


SQL_IMAGE_CHANNEL_STATS = """
SELECT CAST(SUM(n_pixels) AS BIGINT) AS n_pixels,
       ROUND(CAST(SUM(sum_r) AS DOUBLE) / CAST(SUM(n_pixels) AS DOUBLE), 6) AS mean_r,
       ROUND(CAST(SUM(sum_g) AS DOUBLE) / CAST(SUM(n_pixels) AS DOUBLE), 6) AS mean_g,
       ROUND(CAST(SUM(sum_b) AS DOUBLE) / CAST(SUM(n_pixels) AS DOUBLE), 6) AS mean_b
FROM read_parquet('{AD}/channel_stats.parquet')
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


def ensure_als_ref_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``als_user_step``: the expected per-user ridge
    solutions replayed with an independent pandas-merge/loop derivation of
    the (customer, part) interactions — same determinism contract
    (ascending distinct items, identical BLAS kernels on identical
    inputs)."""
    import os as _os

    def build() -> pa.Table:
        li = pq.read_table(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
        ).to_pandas()
        od = pq.read_table(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        ).to_pandas()
        inter = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
        k, lam = 4, 0.1
        primes = np.array([3, 5, 7, 11], dtype=np.int64)
        from ...functions.rounding import round_like_duckdb as _rd6

        rows = []
        for uid, g in inter.groupby("o_custkey", sort=True):
            items = np.unique(g["l_partkey"].to_numpy(np.int64))
            V = ((items[:, None] * primes[None, :]) % 1000) / 1000.0 - 0.5
            A = V.T @ V + lam * np.eye(k)
            b = V.T @ np.ones(len(items))
            x = np.linalg.solve(A, b)
            rows.append((int(uid), len(items), float((x * x).sum())))
        out = pd.DataFrame(rows, columns=["user_id", "n_items", "norm2"])
        out["norm2"] = _rd6(out["norm2"].to_numpy(np.float64), 6)
        return pa.Table.from_pandas(out, preserve_index=False)

    return _ensure_artifact(_os.path.join(_corpus_dir(sf_dir), "als_ref.parquet"), build)


def q_als_user_step(sf_dir: str) -> pd.DataFrame:
    """ALS user half-step over the (customer, part) interaction graph —
    fixed integer-derived item factors, per-user ridge solves inside the
    bucketed exchange (functions/sim.py::als_user_step); interactions via
    the hash-partitioned lineitem ⋈ orders join."""
    from ...functions.relational import hash_join
    from ...functions.sim import als_user_step

    ensure_als_ref_parquet(sf_dir)
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    od = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    inter = hash_join(li, od, on="l_orderkey", right_on="o_orderkey")

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["o_custkey"], "item_id": t["l_partkey"]})

    inter = inter.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)
    out = als_user_step(inter, user_col="user_id", item_col="item_id")
    return _i64(out, ["user_id", "n_items"])


SQL_ALS_USER_STEP = """
SELECT CAST(user_id AS BIGINT) AS user_id, CAST(n_items AS BIGINT) AS n_items, norm2
FROM read_parquet('{AD}/als_ref.parquet') ORDER BY user_id
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


def ensure_mmr_ref_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``mmr_rerank``: the expected diverse top-10
    replayed with a fully scalar BM25 (python word counts, the same
    idf/tf/normalization arithmetic the SQL mirror uses) and the same
    greedy λ·rel − (1−λ)·max-Jaccard selection — independent of the
    distributed two-pass ranker and its arrow kernels."""
    import math as _math
    import os as _os

    def build() -> pa.Table:
        terms = ["table", "scan", "merge"]
        lam, pool, kk = 0.7, 50, 10
        t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        ids = [int(x) for x in t["doc_id"].to_pylist()]
        texts = [s or "" for s in t["text"].to_pylist()]
        words = [s.split(" ") for s in texts]
        n = float(len(ids))
        total_dl = float(sum(len(w) for w in words))
        from ...functions.rounding import round_like_duckdb as _rd6

        dfs = {q: sum(1 for w in words if q in w) for q in terms}
        idf = {q: _math.log((n - dfs[q] + 0.5) / (dfs[q] + 0.5) + 1) for q in terms}
        scores = []
        for i, w in enumerate(words):
            dl = len(w)
            s = 0.0
            for q in terms:
                tf = w.count(q)
                if tf > 0:
                    s = s + idf[q] * (tf * (1.2 + 1.0)) / (
                        tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl * n / total_dl)
                    )
            scores.append(s)
        order = sorted(range(len(ids)), key=lambda i: (-_rd6(np.array([scores[i]]), 6)[0], ids[i]))
        cand = order[:pool]
        rel = {i: float(_rd6(np.array([scores[i]]), 6)[0]) for i in cand}
        sets = {i: set(words[i]) for i in cand}
        selected: list[tuple[int, int, float]] = []
        remaining = list(cand)
        while remaining and len(selected) < kk:
            best_i, best_score = None, None
            for i in remaining:
                if selected:
                    msim = max(
                        float(
                            _rd6(
                                np.array(
                                    [
                                        len(sets[i] & sets[j])
                                        / (len(sets[i]) + len(sets[j]) - len(sets[i] & sets[j]))
                                    ]
                                ),
                                6,
                            )[0]
                        )
                        for _, j, _s in selected
                    )
                else:
                    msim = 0.0
                sc = round(lam * rel[i] - (1.0 - lam) * msim, 6)
                if best_score is None or sc > best_score or (
                    sc == best_score and ids[i] < ids[best_i]
                ):
                    best_i, best_score = i, sc
            selected.append((len(selected) + 1, ids[best_i], float(best_score)))
            remaining.remove(best_i)
        return pa.table(
            {
                "rank": pa.array([s[0] for s in selected], pa.int64()),
                "doc_id": pa.array([s[1] for s in selected], pa.int64()),
                "mmr_score": pa.array([s[2] for s in selected], pa.float64()),
            }
        )

    return _ensure_artifact(_os.path.join(_corpus_dir(sf_dir), "mmr_ref.parquet"), build)


def q_mmr_rerank(sf_dir: str) -> pd.DataFrame:
    """MMR diverse retrieval: distributed BM25 candidate pool (50) →
    greedy λ·relevance − (1−λ)·max-word-Jaccard re-rank to a diverse
    top-10 (functions/search.py::mmr_rerank); oracle = fully scalar
    replay artifact."""
    from ...functions.search import mmr_rerank

    ensure_mmr_ref_parquet(sf_dir)
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return mmr_rerank(ds, ["table", "scan", "merge"], k=10, pool=50)


SQL_MMR_RERANK = """
SELECT rank, doc_id, mmr_score
FROM read_parquet('{AD}/mmr_ref.parquet') ORDER BY rank
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


def q_zonemap_pruned_scan(sf_dir: str) -> pd.DataFrame:
    """Zone-map data skipping (sources/zonemap.py): events range-sorted on
    the µs timestamp into 16 files + a min/max manifest, then a 10%-window
    range count that opens ONLY overlapping files.  The count is the oracled
    surface; pytest asserts the skip receipt (most files untouched)."""
    import os as _os

    from ...sources.zonemap import MANIFEST, pruned_read, write_with_zonemaps

    ds = _t(sf_dir, "events", ["ts", "event_type"])

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ts_us": pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()),
                "event_type": t["event_type"],
            }
        )

    store = _os.path.join(_corpus_dir(sf_dir), "zonemap_events_v1")
    if not _os.path.exists(_os.path.join(store, MANIFEST)):
        write_with_zonemaps(
            ds.map_batches(to_us, batch_format="pyarrow", zero_copy_batch=True),
            store, "ts_us",
        )
    import pyarrow.parquet as _pq

    meta = _pq.read_table(f"{sf_dir}/events.parquet", columns=["ts"])
    us = pc.cast(pc.cast(meta["ts"], pa.timestamp("us")), pa.int64())
    t0, t1 = int(pc.min(us).as_py()), int(pc.max(us).as_py())
    lo = t0 + (t1 - t0) * 45 // 100
    hi = t0 + (t1 - t0) * 55 // 100
    table, _stats = pruned_read(store, lo, hi)
    out = (
        table.select(["event_type"])
        .to_pandas()
        .groupby("event_type", as_index=False)
        .size()
        .rename(columns={"size": "n"})
        .sort_values("event_type", ignore_index=True)
    )
    return _i64(out, ["n"])


SQL_ZONEMAP_PRUNED_SCAN = """
WITH b AS (
  SELECT MIN(epoch_us(ts)) AS t0, MAX(epoch_us(ts)) AS t1 FROM events
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM events CROSS JOIN b
WHERE epoch_us(ts) >= t0 + (t1 - t0) * 45 // 100
  AND epoch_us(ts) <= t0 + (t1 - t0) * 55 // 100
GROUP BY 1 ORDER BY 1
"""


def _pav_blocks(n: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Pool-adjacent-violators with EXACT integer rate compares
    (cross-multiplied — no float boundary ever decides a pool): returns the
    block index per bucket for the isotone (non-decreasing) fit."""
    blocks: list[list[int]] = []  # [n, pos, first_bucket]
    for i in range(len(n)):
        blocks.append([int(n[i]), int(pos[i]), i])
        while len(blocks) > 1 and (
            blocks[-2][1] * blocks[-1][0] > blocks[-1][1] * blocks[-2][0]
        ):
            b = blocks.pop()
            blocks[-1][0] += b[0]
            blocks[-1][1] += b[1]
    out = np.zeros(len(n), dtype=np.int64)
    for bi, blk in enumerate(blocks):
        out[blk[2] :] = bi  # overwritten by later blocks
    return out


def q_isotonic_purchase_rate(sf_dir: str) -> pd.DataFrame:
    """Isotonic (PAV) calibration of the purchase rate over hour-of-day:
    per-hour (events, purchases) integer partials reduce distributed; the
    24-bucket pool-adjacent-violators fit runs driver-side with
    cross-multiplied exact compares.  Output: hour, observed ints, fitted
    monotone rate (block pooled, round 6)."""
    ensure_isotonic_ref_parquet(sf_dir)
    ds = _t(sf_dir, "events", ["ts", "event_type"])

    def part(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        hr = (
            pc.divide(us, pa.scalar(3_600_000_000, pa.int64())).to_numpy(zero_copy_only=False)
            % 24
        ).astype(np.int64)
        is_p = pc.equal(t["event_type"], "purchase").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "hour": pa.array(np.arange(24, dtype=np.int64)),
                "n": pa.array(np.bincount(hr, minlength=24).astype(np.int64)),
                "pos": pa.array(np.bincount(hr, weights=is_p, minlength=24).astype(np.int64)),
            }
        )

    h = (
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby("hour", as_index=False)
        .sum()
        .sort_values("hour", ignore_index=True)
    )
    n = h["n"].to_numpy(np.int64)
    pos = h["pos"].to_numpy(np.int64)
    blk = _pav_blocks(n, pos)
    bn = np.bincount(blk, weights=n).astype(np.int64)
    bp = np.bincount(blk, weights=pos).astype(np.int64)
    fitted = _rd(bp[blk].astype(np.float64) / bn[blk].astype(np.float64), 6)
    out = pd.DataFrame(
        {"hour": h["hour"], "n": n, "purchases": pos, "block": blk, "fitted_rate": fitted}
    )
    return _i64(out, ["hour", "n", "purchases", "block"])


def ensure_isotonic_ref_parquet(sf_dir: str) -> str:
    """Oracle artifact: PAV replayed with an independent recursive-merge
    implementation over SQL-derivable per-hour counts."""
    import os as _os

    def build() -> pa.Table:
        import duckdb as _dd

        con = _dd.connect()
        h = con.execute(
            f"""
            SELECT (CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24) AS hour,
                   COUNT(*) AS n,
                   SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pos
            FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1 ORDER BY 1
            """
        ).df()
        n = [int(x) for x in h["n"]]
        pos = [int(x) for x in h["pos"]]

        # independent PAV: repeated full scans merging the FIRST violator
        groups = [[i, i, n[i], pos[i]] for i in range(len(n))]  # [lo, hi, n, pos]
        changed = True
        while changed:
            changed = False
            for i in range(len(groups) - 1):
                a, b = groups[i], groups[i + 1]
                if a[3] * b[2] > b[3] * a[2]:
                    groups[i] = [a[0], b[1], a[2] + b[2], a[3] + b[3]]
                    del groups[i + 1]
                    changed = True
                    break
        from ...functions.rounding import round_like_duckdb as _rd6

        hour, blkcol, fit = [], [], []
        for bi, g in enumerate(groups):
            for hh in range(g[0], g[1] + 1):
                hour.append(hh)
                blkcol.append(bi)
                fit.append(float(_rd6(np.array([g[3] / g[2]]), 6)[0]))
        return pa.table(
            {
                "hour": pa.array(hour, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "purchases": pa.array(pos, pa.int64()),
                "block": pa.array(blkcol, pa.int64()),
                "fitted_rate": pa.array(fit, pa.float64()),
            }
        )

    return _ensure_artifact(_os.path.join(_corpus_dir(sf_dir), "isotonic_ref.parquet"), build)


SQL_ISOTONIC_PURCHASE_RATE = """
SELECT hour, n, purchases, block, fitted_rate
FROM read_parquet('{AD}/isotonic_ref.parquet') ORDER BY hour
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


def q_woe_binning(sf_dir: str) -> pd.DataFrame:
    """Weight-of-evidence / information-value audit of order value deciles
    vs the return flag (the credit-scoring feature screen): decile bounds
    from the exact distributed NTILE machinery, WOE = ln(bad%/good%) per
    bin from integer counts, IV as the summed contribution."""
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderstatus"])
    from ...functions.rank import global_row_number, ntile_of

    ranked, total = global_row_number(ds, "o_totalprice", ["o_orderkey"])

    def tag(t: pa.Table) -> pa.Table:
        dec = ntile_of(t["rn"].to_numpy(zero_copy_only=False), total, 10)
        bad = pc.equal(t["o_orderstatus"], "F").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "decile": pa.array(dec.astype(np.int64)),
                "n": pa.array(np.ones(len(t), dtype=np.int64)),
                "bad": pa.array(bad.astype(np.int64)),
            }
        )

    h = (
        ranked.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby("decile", as_index=False)
        .sum()
        .sort_values("decile", ignore_index=True)
    )
    B, G = int(h["bad"].sum()), int((h["n"] - h["bad"]).sum())
    good = (h["n"] - h["bad"]).to_numpy(np.float64)
    bad = h["bad"].to_numpy(np.float64)
    woe = _rd(np.log((bad / B) / (good / G)), 6)
    iv_contrib = _rd((bad / B - good / G) * np.log((bad / B) / (good / G)), 6)
    out = pd.DataFrame(
        {"decile": h["decile"], "n": h["n"], "bad": h["bad"], "woe": woe,
         "iv_contrib": iv_contrib}
    )
    return _i64(out, ["decile", "n", "bad"])


SQL_WOE_BINNING = """
WITH r AS (
  SELECT o_orderstatus,
         NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders
),
h AS (
  SELECT decile, COUNT(*) AS n,
         SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS bad
  FROM r GROUP BY 1
),
t AS (SELECT SUM(bad) AS tb, SUM(n - bad) AS tg FROM h)
SELECT decile, CAST(n AS BIGINT) AS n, CAST(bad AS BIGINT) AS bad,
       ROUND(ln((bad / CAST(tb AS DOUBLE)) / ((n - bad) / CAST(tg AS DOUBLE))), 6) AS woe,
       ROUND((bad / CAST(tb AS DOUBLE) - (n - bad) / CAST(tg AS DOUBLE))
             * ln((bad / CAST(tb AS DOUBLE)) / ((n - bad) / CAST(tg AS DOUBLE))), 6)
         AS iv_contrib
FROM h CROSS JOIN t ORDER BY decile
"""


def q_kaplan_meier(sf_dir: str) -> pd.DataFrame:
    """Kaplan-Meier product-limit survival with RIGHT-CENSORING over gap
    sessions (30-min idle split): subjects are sessions, the event is the
    session CLOSING (a gap followed), and sessions still open at the corpus
    end (within 30 min of it) are censored.  Per-user session folds run in
    the bucketed exchange; the product-limit curve folds over the distinct-
    duration grid as exp(Σ ln(1−dᵢ/nᵢ)) — the same formulation the SQL
    window mirror uses, term-for-term."""
    from ...functions.relational import bucketed_group_reduce

    GAP = 1_800_000_000
    ds = _t(sf_dir, "events", ["user_id", "ts"])
    import pyarrow.parquet as _pq

    meta = _pq.read_table(f"{sf_dir}/events.parquet", columns=["ts"])
    us_all = pc.cast(pc.cast(meta["ts"], pa.timestamp("us")), pa.int64())
    t_end = int(pc.max(us_all).as_py())

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "us": pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()),
            }
        )

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, g in df.groupby("user_id", sort=False):
            us = np.sort(g["us"].to_numpy(np.int64))
            new_s = np.ones(len(us), dtype=bool)
            new_s[1:] = np.diff(us) > GAP
            starts = np.nonzero(new_s)[0]
            ends = np.concatenate([starts[1:] - 1, [len(us) - 1]])
            a, b = us[starts], us[ends]
            dur = (b - a) // 60_000_000
            churn = (t_end - b >= GAP).astype(np.int64)
            rows.append(pd.DataFrame({"dur": dur, "churn": churn}))
        import pandas as _pd

        return _pd.concat(rows, ignore_index=True) if rows else _pd.DataFrame(
            {"dur": _pd.Series(dtype="int64"), "churn": _pd.Series(dtype="int64")}
        )

    km = bucketed_group_reduce(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"], per_user,
    ).to_pandas()
    grid = (
        km.groupby("dur", as_index=False)
        .agg(d=("churn", "sum"), m=("churn", "size"))
        .sort_values("dur", ignore_index=True)
    )
    total = int(grid["m"].sum())
    at_risk = total - np.concatenate([[0], np.cumsum(grid["m"].to_numpy())[:-1]])
    # drop the terminal all-close row (1 - d/n = 0 → ln(0); S simply hits 0)
    keep = (grid["d"].to_numpy() > 0) & (grid["d"].to_numpy() < at_risk)
    t_ev = grid["dur"].to_numpy(np.int64)[keep]
    d_ev = grid["d"].to_numpy(np.int64)[keep]
    n_ev = at_risk[keep].astype(np.int64)
    surv = np.exp(np.cumsum(np.log(1.0 - d_ev / n_ev)))
    out = pd.DataFrame(
        {
            "duration_min": t_ev,
            "n_at_risk": n_ev,
            "n_closed": d_ev,
            "survival": _rd(surv, 6),
        }
    )
    return _i64(out, ["duration_min", "n_at_risk", "n_closed"])


SQL_KAPLAN_MEIER = """
WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
m AS (SELECT MAX(us) AS t_end FROM e),
x AS (
  SELECT user_id, us,
         CASE WHEN LAG(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
                OR us - LAG(us) OVER (PARTITION BY user_id ORDER BY us) > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM e
),
s AS (
  SELECT user_id, us,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM x
),
ses AS (SELECT user_id, sid, MIN(us) AS a, MAX(us) AS b FROM s GROUP BY 1, 2),
k AS (
  SELECT (b - a) // 60000000 AS dur,
         CASE WHEN t_end - b >= 1800000000 THEN 1 ELSE 0 END AS churn
  FROM ses CROSS JOIN m
),
g AS (SELECT dur, SUM(churn) AS d, COUNT(*) AS mm FROM k GROUP BY 1),
r AS (
  SELECT dur, d,
         (SELECT COUNT(*) FROM k) - COALESCE(SUM(mm) OVER (ORDER BY dur
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_at_risk
  FROM g
),
sv AS (
  SELECT dur, d, n_at_risk,
         EXP(SUM(LN(1.0 - d / CAST(n_at_risk AS DOUBLE)))
             OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING)) AS surv
  FROM r WHERE d > 0 AND d < n_at_risk
)
SELECT CAST(dur AS BIGINT) AS duration_min, CAST(n_at_risk AS BIGINT) AS n_at_risk,
       CAST(d AS BIGINT) AS n_closed, ROUND(surv, 6) AS survival
FROM sv ORDER BY duration_min
"""


def q_join_size_profile(sf_dir: str) -> pd.DataFrame:
    """Join-cardinality profiling WITHOUT materializing the join (the
    optimizer's question answered combiner-style): |orders ⋈ lineitem| per
    order priority = Σ_key c_left·c_right over shared keys — two per-key
    count reductions and one co-group multiply; only count rows ever move."""
    from ...functions.relational import bucketed_group_reduce

    od = _t(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    li = _t(sf_dir, "lineitem", ["l_orderkey"])

    lc = grouped_sums(li, ["l_orderkey"], {}, "c_l")

    def tag_o(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": t["o_orderkey"],
                "prio": t["o_orderpriority"],
                "c_l": pa.array(np.zeros(len(t), dtype=np.int64)),
                "is_o": pa.array(np.ones(len(t), dtype=np.int64)),
            }
        )

    def tag_l(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": t["l_orderkey"],
                "prio": pa.array([""] * len(t)),
                "c_l": t["c_l"],
                "is_o": pa.array(np.zeros(len(t), dtype=np.int64)),
            }
        )

    both = od.map_batches(tag_o, batch_format="pyarrow", zero_copy_batch=True).union(
        lc.map_batches(tag_l, batch_format="pyarrow", zero_copy_batch=True)
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        o = df[df["is_o"] == 1][["key", "prio"]]
        l = df[df["is_o"] == 0][["key", "c_l"]]
        m = o.merge(l, on="key", how="left").fillna({"c_l": 0})
        g = m.groupby("prio", as_index=False).agg(
            n_orders=("key", "size"), join_rows=("c_l", "sum")
        )
        return g

    out = (
        bucketed_group_reduce(both, ["key"], per_bucket)
        .to_pandas()
        .groupby("prio", as_index=False)
        .sum()
        .sort_values("prio", ignore_index=True)
        .rename(columns={"prio": "o_orderpriority"})
    )
    return _i64(out, ["n_orders", "join_rows"])


SQL_JOIN_SIZE_PROFILE = """
WITH lc AS (SELECT l_orderkey, COUNT(*) AS c_l FROM lineitem GROUP BY 1)
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(COALESCE(lc.c_l, 0)) AS BIGINT) AS join_rows
FROM orders o LEFT JOIN lc ON lc.l_orderkey = o.o_orderkey
GROUP BY 1 ORDER BY 1
"""


