"""Wave 39: streaming-sketch and drift-detection operators over the events
stream.

* count_min_heavy_hitters — Count-Min sketch (Cormode & Muthukrishnan 2005,
  d=4 × w=512) of per-user event counts with EXACT oracle parity: bucket
  assignments are deterministic FNV-1a-64 hashes, so the oracle can rebuild
  every row's bucket sums from a scalar-hash artifact and take the same
  min-over-rows estimate.  The sketch matrix is the only thing the exchange
  moves (4×512 int64 partials per batch); CMS ≥ truth by construction and
  both engines report the top-20 truth rows with their estimates.
* page_hinkley_alarms — Page-Hinkley mean-shift detector (Page 1954; the
  streaming-drift formulation of Gama et al. 2014) per event_type over the
  daily cents series, in EXACT integer arithmetic: the running mean is a
  truncating integer division of the running sum (matching DuckDB's `//`
  sign semantics), PH_t = C_t − min(0, min_{s≤t} C_s) is a
  vectorized cumulative-minimum scan on the Ray side and a window MIN OVER
  on the oracle side.
* cumulative_distinct_users — per-day new-user and cumulative distinct-user
  counts: first-occurrence day per user reduces inside a user-keyed bucket
  exchange (never a global distinct), the per-day fold is output-bounded.
"""
from __future__ import annotations

from ._base import _i64, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from ._base import ORACLE_ARTIFACT_DIR, _corpus_dir, grouped_sums  # noqa: F401
from .neardup_a import _ensure_artifact

_CMS_D = 4
_CMS_W = 512
_CMS_TOPK = 20


def _cms_buckets_vec(uids: np.ndarray, j: int) -> np.ndarray:
    """Vectorized bucket row j for int64 user ids: FNV-1a-64 of 'j:uid'."""
    from ...functions.hashing import fnv1a64

    s = pa.array(np.char.add(f"{j}:", uids.astype("U20")))
    return (fnv1a64(s) % _CMS_W).astype(np.int64)


def ensure_cms_buckets_parquet(sf_dir: str) -> str:
    """Oracle artifact: (user_id, j, bucket) long table built with the
    INDEPENDENT scalar FNV-1a-64 loop — cross-checks the vectorized
    hashing the distributed sketch uses."""
    import os as _os

    def build() -> pa.Table:
        from ...functions.hashing import fnv1a64_single

        t = pq.read_table(f"{sf_dir}/events.parquet", columns=["user_id"])
        users = sorted(set(t["user_id"].to_pylist()))
        uid, jj, bb = [], [], []
        for u in users:
            for j in range(_CMS_D):
                uid.append(u)
                jj.append(j)
                bb.append(fnv1a64_single(f"{j}:{u}") % _CMS_W)
        return pa.table({"user_id": pa.array(uid, pa.int64()),
                         "j": pa.array(jj, pa.int64()),
                         "bucket": pa.array(bb, pa.int64())})

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "cms_buckets.parquet"), build)


def q_count_min_heavy_hitters(sf_dir: str) -> pd.DataFrame:
    """Count-Min heavy hitters: top-20 users by true event count with their
    CMS(4×512) estimates.  Per-batch combiners emit (j, bucket, cnt)
    partials — 2048 int64 cells per batch regardless of batch size — so the
    exchange never carries per-user rows; true counts reduce distributed;
    only the 20 winners are hashed again for the point estimates."""
    ensure_cms_buckets_parquet(sf_dir)
    ev = _t(sf_dir, "events", ["user_id"])

    def sketch(t: pa.Table) -> pd.DataFrame:
        uids = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        js, bs, cs = [], [], []
        for j in range(_CMS_D):
            counts = np.bincount(_cms_buckets_vec(uids, j), minlength=_CMS_W)
            nz = np.nonzero(counts)[0]
            js.append(np.full(len(nz), j, np.int64))
            bs.append(nz.astype(np.int64))
            cs.append(counts[nz].astype(np.int64))
        return pd.DataFrame({"j": np.concatenate(js), "bucket": np.concatenate(bs),
                             "cnt": np.concatenate(cs)})

    cells = grouped_sums(
        ev.map_batches(sketch, batch_format="pyarrow", zero_copy_batch=True),
        ["j", "bucket"], {"cnt": "cnt"}, reduce="driver").to_pandas()
    M = np.zeros((_CMS_D, _CMS_W), np.int64)
    M[cells["j"].to_numpy(), cells["bucket"].to_numpy()] = cells["cnt"].to_numpy()

    truth = grouped_sums(_t(sf_dir, "events", ["user_id"]), ["user_id"], {},
                         count_name="true_cnt", reduce="driver").to_pandas()
    truth = truth.sort_values(["true_cnt", "user_id"], ascending=[False, True],
                              ignore_index=True).head(_CMS_TOPK)
    top = truth["user_id"].to_numpy(np.int64)
    est = np.min(
        np.stack([M[j, _cms_buckets_vec(top, j)] for j in range(_CMS_D)]), axis=0)
    out = pd.DataFrame({"user_id": top, "true_cnt": truth["true_cnt"].to_numpy(),
                        "est_cnt": est})
    return _i64(out, ["user_id", "true_cnt", "est_cnt"])


SQL_COUNT_MIN_HEAVY_HITTERS = f"""
WITH b AS (SELECT * FROM read_parquet('{ORACLE_ARTIFACT_DIR}/cms_buckets.parquet')),
cnt AS (SELECT user_id, COUNT(*) AS true_cnt FROM events GROUP BY 1),
cell AS (
  SELECT b.j, b.bucket, CAST(SUM(cnt.true_cnt) AS BIGINT) AS bsum
  FROM cnt JOIN b USING (user_id) GROUP BY 1, 2),
est AS (
  SELECT cnt.user_id, cnt.true_cnt, MIN(cell.bsum) AS est_cnt
  FROM cnt JOIN b USING (user_id)
  JOIN cell ON cell.j = b.j AND cell.bucket = b.bucket
  GROUP BY 1, 2)
SELECT user_id, CAST(true_cnt AS BIGINT) AS true_cnt,
       CAST(est_cnt AS BIGINT) AS est_cnt
FROM est ORDER BY true_cnt DESC, user_id LIMIT {_CMS_TOPK}
"""

_PH_DELTA = 500  # cents of tolerated per-day deviation
_PH_LAMBDA = 100_000  # cents alarm threshold


def q_page_hinkley_alarms(sf_dir: str) -> pd.DataFrame:
    """Page-Hinkley drift detector per event_type over the daily value-cents
    series: dev_t = cents_t − (cum_t // t) − δ, PH_t = C_t − min(0, min C_s).
    Daily partials reduce distributed first; the sequential-looking scan is
    a vectorized cumsum/cummin inside a type-keyed bucket exchange."""
    from ...functions.relational import bucketed_group_reduce

    def to_day(t: pa.Table) -> pa.Table:
        micros = pc.cast(t["ts"], pa.int64())
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        return pa.table({"event_type": t["event_type"],
                         "day_id": pc.divide(micros, pa.scalar(86_400_000_000, pa.int64())),
                         "cents": cents})

    daily = grouped_sums(
        _t(sf_dir, "events", ["event_type", "ts", "value"]).map_batches(
            to_day, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "day_id"], {"cents": "cents"})

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type"):
            g = g.sort_values("day_id")
            x = g["cents"].to_numpy(np.int64)
            t = np.arange(1, len(x) + 1, dtype=np.int64)
            cum = np.cumsum(x)
            # DuckDB's integer `//` truncates toward zero; numpy floors —
            # match trunc exactly for negative running sums
            mean_q = np.where(cum >= 0, cum // t, -((-cum) // t))
            dev = x - mean_q - _PH_DELTA
            cd = np.cumsum(dev)
            ph = cd - np.minimum(0, np.minimum.accumulate(cd))
            alarms = np.nonzero(ph > _PH_LAMBDA)[0]
            rows.append({"event_type": et, "n_days": len(x),
                         "max_ph": int(ph.max()) if len(x) else 0,
                         "n_alarms": int(len(alarms)),
                         "first_alarm_t": int(t[alarms[0]]) if len(alarms) else -1})
        return pd.DataFrame(rows)

    out = bucketed_group_reduce(daily, ["event_type"], scan).to_pandas()
    out = out.sort_values("event_type", ignore_index=True)
    return _i64(out, ["n_days", "max_ph", "n_alarms", "first_alarm_t"])


SQL_PAGE_HINKLEY_ALARMS = f"""
WITH d AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_id,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2),
s AS (
  SELECT event_type, day_id, cents,
         ROW_NUMBER() OVER w AS t, CAST(SUM(cents) OVER w AS BIGINT) AS cum
  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day_id)),
dev AS (
  SELECT event_type, day_id, t, cents - (cum // t) - {_PH_DELTA} AS dev FROM s),
c AS (
  SELECT event_type, day_id, t, CAST(SUM(dev) OVER w AS BIGINT) AS cd
  FROM dev WINDOW w AS (PARTITION BY event_type ORDER BY t)),
ph AS (
  SELECT event_type, t, cd - LEAST(0, MIN(cd) OVER w) AS ph
  FROM c WINDOW w AS (PARTITION BY event_type ORDER BY t))
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(MAX(ph) AS BIGINT) AS max_ph,
       CAST(COUNT(CASE WHEN ph > {_PH_LAMBDA} THEN 1 END) AS BIGINT) AS n_alarms,
       CAST(COALESCE(MIN(CASE WHEN ph > {_PH_LAMBDA} THEN t END), -1) AS BIGINT)
         AS first_alarm_t
FROM ph GROUP BY 1 ORDER BY 1
"""


def q_cumulative_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Per-day new-user count and running distinct-user total: per-user
    first-occurrence day reduces inside a user-keyed bucket exchange (no
    global distinct), the day-level cumulative fold is output-bounded."""
    from ...functions.relational import bucketed_group_reduce

    def to_pairs(t: pa.Table) -> pd.DataFrame:
        micros = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"user_id": t["user_id"].to_numpy(zero_copy_only=False),
                           "day_id": micros // 86_400_000_000})
        return df.groupby("user_id", as_index=False).min()

    pairs = _t(sf_dir, "events", ["user_id", "ts"]).map_batches(
        to_pairs, batch_format="pyarrow", zero_copy_batch=True)

    def first_day(df: pd.DataFrame) -> pd.DataFrame:
        f = df.groupby("user_id", as_index=False)["day_id"].min()
        out = f.groupby("day_id", as_index=False).size()
        return out.rename(columns={"size": "n_new"})

    new_per_day = grouped_sums(
        bucketed_group_reduce(pairs, ["user_id"], first_day),
        ["day_id"], {"n_new": "n_new"}, reduce="driver").to_pandas()

    days = grouped_sums(
        _t(sf_dir, "events", ["ts"]).map_batches(
            lambda t: pa.table({"day_id": pc.divide(pc.cast(t["ts"], pa.int64()),
                                                    pa.scalar(86_400_000_000, pa.int64()))}),
            batch_format="pyarrow", zero_copy_batch=True),
        ["day_id"], {}, reduce="driver").to_pandas()

    out = days.merge(new_per_day, on="day_id", how="left").fillna({"n_new": 0})
    out = out.sort_values("day_id", ignore_index=True)
    out["cum_users"] = out["n_new"].cumsum()
    return _i64(out[["day_id", "n_new", "cum_users"]],
                ["day_id", "n_new", "cum_users"])


SQL_CUMULATIVE_DISTINCT_USERS = """
WITH f AS (
  SELECT user_id, MIN(CAST(floor(epoch(ts) / 86400) AS BIGINT)) AS day_id
  FROM events GROUP BY 1),
nd AS (SELECT day_id, COUNT(*) AS n_new FROM f GROUP BY 1),
days AS (SELECT DISTINCT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_id FROM events)
SELECT days.day_id, CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new,
       CAST(SUM(COALESCE(n_new, 0)) OVER (ORDER BY days.day_id) AS BIGINT) AS cum_users
FROM days LEFT JOIN nd USING (day_id) ORDER BY 1
"""
