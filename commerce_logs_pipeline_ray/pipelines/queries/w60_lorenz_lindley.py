"""Wave 60: inequality curves and queueing-delay replay.

* lorenz_curve_suppliers — the Lorenz curve at decile resolution over
  supplier revenue: NTILE(10) by (revenue, suppkey) and the cumulative
  revenue share in exact ppm — the graphical companion of the Gini/Theil
  rows.  Per-supplier revenue reduces distributed (output-bounded); the
  decile fold uses the engine's SQL-NTILE tile sizing.
* lindley_queue_audit — single-server FIFO waiting times per event_type
  via Lindley's (1952) recursion W_{i} = max(0, W_{i-1} + s_{i-1} − a_i):
  the same cumsum-minus-running-min identity that vectorizes Page-Hinkley
  turns the "sequential" queue replay into two numpy scans inside a
  type-keyed bucket exchange; service = value cents (as ms), interarrival
  from consecutive timestamps.  The oracle replays the identical integer
  recursion with window functions.
"""
from __future__ import annotations

from ._base import _i64, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from ._base import grouped_sums  # noqa: F401


def q_lorenz_curve_suppliers(sf_dir: str) -> pd.DataFrame:
    """Cumulative revenue share per supplier decile, ppm-exact: revenue
    units reduce distributed; deciles assigned by SQL NTILE sizing over
    (revenue, suppkey) ascending."""
    from ...functions.rank import ntile_of

    li = _t(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount"])

    def part(t: pa.Table) -> pd.DataFrame:
        ep = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        dc = np.rint((1.0 - t["l_discount"].to_numpy(zero_copy_only=False)) * 100.0).astype(np.int64)
        df = pd.DataFrame({"l_suppkey": t["l_suppkey"].to_numpy(zero_copy_only=False),
                           "r": ep * dc})
        return df.groupby("l_suppkey", as_index=False).sum()

    rev = grouped_sums(
        li.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["l_suppkey"], {"r": "r"}, reduce="driver").to_pandas()
    rev = rev.sort_values(["r", "l_suppkey"], ignore_index=True)
    n = len(rev)
    if n == 0:
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ["decile", "n_suppliers", "cum_share_ppm"]})
    rn = np.arange(1, n + 1, dtype=np.int64)
    dec = ntile_of(rn, n, 10)
    r = rev["r"].to_numpy(np.int64)
    tot = int(r.sum())
    df = pd.DataFrame({"decile": dec, "r": r})
    g = df.groupby("decile", as_index=False).agg(n_suppliers=("r", "size"),
                                                 rsum=("r", "sum"))
    g["cum_share_ppm"] = (1_000_000 * g["rsum"].cumsum().astype(object)) // tot
    out = g[["decile", "n_suppliers", "cum_share_ppm"]]
    return _i64(out, ["decile", "n_suppliers", "cum_share_ppm"])


SQL_LORENZ_CURVE_SUPPLIERS = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS r
  FROM lineitem GROUP BY 1),
d AS (
  SELECT r, NTILE(10) OVER (ORDER BY r, l_suppkey) AS decile FROM rev),
g AS (
  SELECT decile, COUNT(*) AS n_suppliers, CAST(SUM(r) AS HUGEINT) AS rsum
  FROM d GROUP BY 1),
tot AS (SELECT CAST(SUM(r) AS HUGEINT) AS t FROM rev)
SELECT CAST(decile AS BIGINT) AS decile, CAST(n_suppliers AS BIGINT) AS n_suppliers,
       CAST((1000000 * SUM(rsum) OVER (ORDER BY decile
                                       ROWS UNBOUNDED PRECEDING)) // tot.t
            AS BIGINT) AS cum_share_ppm
FROM g, tot ORDER BY decile
"""


def q_lindley_queue_audit(sf_dir: str) -> pd.DataFrame:
    """FIFO waiting-time replay per event_type: service s = value cents
    (ms), interarrival a from consecutive (ts, event_id)-ordered events;
    W_i = C_i − min(0, min_{k≤i} C_k) with C = cumsum(s_{i-1} − a_i) —
    vectorized, no per-event loop.  Output per type: events, max and total
    wait (ms)."""
    from ...functions.relational import bucketed_group_reduce

    def to_seq(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t["event_type"],
                         "ts_us": pc.cast(t["ts"], pa.int64()),
                         "event_id": t["event_id"],
                         "s_ms": pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                                         pa.int64())})

    ev = _t(sf_dir, "events", ["event_type", "ts", "event_id", "value"]).map_batches(
        to_seq, batch_format="pyarrow", zero_copy_batch=True)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type"):
            g = g.sort_values(["ts_us", "event_id"])
            ts = g["ts_us"].to_numpy(np.int64)
            s = g["s_ms"].to_numpy(np.int64)
            if len(ts) < 2:
                continue
            a = (ts[1:] - ts[:-1]) // 1000  # interarrival ms
            x = s[:-1] - a
            c = np.cumsum(x)
            w = c - np.minimum(0, np.minimum.accumulate(c))
            rows.append({"event_type": et, "n_events": len(ts),
                         "max_wait_ms": int(w.max()),
                         "sum_wait_ms": int(w.sum())})
        return pd.DataFrame(rows)

    out = bucketed_group_reduce(ev, ["event_type"], fold).to_pandas()
    out = out.sort_values("event_type", ignore_index=True)
    return _i64(out, ["n_events", "max_wait_ms", "sum_wait_ms"])


SQL_LINDLEY_QUEUE_AUDIT = """
WITH e AS (
  SELECT event_type, epoch_us(ts) AS t,
         CAST(ROUND(value * 100) AS BIGINT) AS s,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS rn
  FROM events),
x AS (
  SELECT event_type, rn,
         LAG(s) OVER w - (t - LAG(t) OVER w) // 1000 AS xi
  FROM e WINDOW w AS (PARTITION BY event_type ORDER BY rn)),
c AS (
  SELECT event_type, rn, CAST(SUM(xi) OVER (PARTITION BY event_type
                                            ORDER BY rn) AS BIGINT) AS cd
  FROM x WHERE xi IS NOT NULL),
w AS (
  SELECT event_type, cd - LEAST(0, MIN(cd) OVER (PARTITION BY event_type
                                                 ORDER BY rn)) AS wait
  FROM c)
SELECT event_type,
       CAST(COUNT(*) + 1 AS BIGINT) AS n_events,
       CAST(MAX(wait) AS BIGINT) AS max_wait_ms,
       CAST(SUM(wait) AS BIGINT) AS sum_wait_ms
FROM w GROUP BY 1 ORDER BY 1
"""
