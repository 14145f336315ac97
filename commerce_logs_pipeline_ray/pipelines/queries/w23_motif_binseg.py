"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import _i64, _rd, _t, grouped_sums, np, pa, pc, pd  # noqa: F401

# ---------------------------------------------------------------------------
# Wave 23: matrix-profile-style motif discovery, binary-segmentation
# changepoint
# ---------------------------------------------------------------------------

_MOTIF_M = 7
_DAY_US = 86_400_000_000


def _daily_cents_series(sf_dir: str) -> tuple[np.ndarray, int]:
    """Dense daily purchase-cents series (missing days = 0) from one
    (day, cents) combiner exchange; returns (series, first_day)."""
    ds = _t(sf_dir, "events", ["ts", "event_type", "value"])

    def part(t: pa.Table) -> pd.DataFrame:
        is_p = pc.equal(t["event_type"], "purchase").to_numpy(zero_copy_only=False)
        if not is_p.any():
            return pd.DataFrame({"day": pd.Series([], dtype="int64"),
                                 "cents": pd.Series([], dtype="int64")})
        tsu = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)[is_p]
        cents = _rd(t["value"].to_numpy(zero_copy_only=False)[is_p] * 100.0, 0).astype(np.int64)
        df = pd.DataFrame({"day": tsu // _DAY_US, "cents": cents})
        return df.groupby("day", as_index=False).sum()

    daily = grouped_sums(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["day"],
        {"cents": "cents"},
    ).to_pandas().sort_values("day", ignore_index=True)
    d0, d1 = int(daily["day"].min()), int(daily["day"].max())
    series = np.zeros(d1 - d0 + 1, dtype=np.int64)
    series[daily["day"].to_numpy(np.int64) - d0] = daily["cents"].to_numpy(np.int64)
    return series, d0


def q_motif_discovery(sf_dir: str) -> pd.DataFrame:
    """Matrix-profile-style motif discovery (Yeh et al. 2016's problem,
    exact integer variant): over the dense daily purchase-cents series, the
    5 closest NON-OVERLAPPING window pairs of length 7 by integer squared
    distance — recurring weekly demand patterns.  The corpus collapses to
    one (day, cents) combiner exchange; the all-pairs SSD over the
    T-bounded series is one int64 gram matmul driver-side (tile the matmul
    through map_batches when T outgrows one node — the series length is
    calendar-bounded, not corpus-bounded)."""
    series, d0 = _daily_cents_series(sf_dir)
    T = len(series)
    nw = T - _MOTIF_M + 1
    if nw < 2:
        return pd.DataFrame(
            {"day_i": pd.Series([], dtype="int64"), "day_j": pd.Series([], dtype="int64"),
             "ssd": pd.Series([], dtype="int64")}
        )
    win = np.lib.stride_tricks.sliding_window_view(series, _MOTIF_M).astype(np.int64)
    norms = (win * win).sum(axis=1)
    gram = win @ win.T
    d = norms[:, None] + norms[None, :] - 2 * gram
    ii, jj = np.meshgrid(np.arange(nw), np.arange(nw), indexing="ij")
    mask = (jj - ii) >= _MOTIF_M  # non-overlapping, i < j
    cand = np.column_stack([d[mask], ii[mask], jj[mask]])
    order = np.lexsort((cand[:, 2], cand[:, 1], cand[:, 0]))[:5]
    sel = cand[order]
    out = pd.DataFrame(
        {"day_i": (sel[:, 1] + d0).astype(np.int64),
         "day_j": (sel[:, 2] + d0).astype(np.int64),
         "ssd": sel[:, 0].astype(np.int64)}
    )
    return _i64(out, ["day_i", "day_j", "ssd"])


SQL_MOTIF_DISCOVERY = f"""
WITH p AS (
  SELECT epoch_us(ts) // {_DAY_US} AS day,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'),
g AS (SELECT day, CAST(SUM(cents) AS BIGINT) AS c FROM p GROUP BY 1),
mm AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM g),
dense AS (
  SELECT gs.day, COALESCE(g.c, 0) AS c
  FROM (SELECT UNNEST(generate_series((SELECT d0 FROM mm), (SELECT d1 FROM mm)))
          AS day) gs
  LEFT JOIN g ON g.day = gs.day),
pairs AS (
  SELECT a.day AS day_i, b.day AS day_j,
         SUM((a2.c - b2.c) * (a2.c - b2.c)) AS ssd
  FROM dense a
  JOIN dense b ON b.day >= a.day + {_MOTIF_M}
  JOIN (SELECT UNNEST(generate_series(0, {_MOTIF_M - 1})) AS k) ks ON TRUE
  JOIN dense a2 ON a2.day = a.day + ks.k
  JOIN dense b2 ON b2.day = b.day + ks.k
  WHERE a.day + {_MOTIF_M - 1} <= (SELECT d1 FROM mm)
    AND b.day + {_MOTIF_M - 1} <= (SELECT d1 FROM mm)
  GROUP BY 1, 2)
SELECT day_i, day_j, CAST(ssd AS BIGINT) AS ssd
FROM pairs ORDER BY ssd, day_i, day_j LIMIT 5
"""


def q_binary_segmentation(sf_dir: str) -> pd.DataFrame:
    """Binary-segmentation changepoint (the CUSUM family's exact argmax
    variant): the split of the daily purchase-cents series minimizing total
    within-segment SSE, found by maximizing (S_l²·n_r + S_r²·n_l)/(n_l·n_r)
    — numerator/denominator are EXACT ints (arbitrary-precision driver-side,
    HUGEINT in the oracle) and both engines order by the identical double
    ratio with the day as tie-break.  One combiner exchange; the argmax
    scans a calendar-bounded prefix-sum array."""
    series, d0 = _daily_cents_series(sf_dir)
    T = len(series)
    pre = np.cumsum(series)
    total = int(pre[-1])
    best = None
    for t in range(1, T):
        n_l, n_r = t, T - t
        s_l = int(pre[t - 1])
        s_r = total - s_l
        num = s_l * s_l * n_r + s_r * s_r * n_l
        val = float(num) / float(n_l * n_r)
        key = (-val, t)
        if best is None or key < best[0]:
            best = (key, t, n_l, n_r, s_l, s_r)
    _, t, n_l, n_r, s_l, s_r = best
    out = pd.DataFrame(
        [{"split_day": int(t + d0), "n_left": n_l, "n_right": n_r,
          "mean_left": _rd(float(s_l) / float(n_l), 6),
          "mean_right": _rd(float(s_r) / float(n_r), 6)}]
    )
    return _i64(out, ["split_day", "n_left", "n_right"])


SQL_BINARY_SEGMENTATION = f"""
WITH p AS (
  SELECT epoch_us(ts) // {_DAY_US} AS day,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'),
g AS (SELECT day, CAST(SUM(cents) AS BIGINT) AS c FROM p GROUP BY 1),
mm AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM g),
dense AS (
  SELECT gs.day, COALESCE(g.c, 0) AS c,
         ROW_NUMBER() OVER (ORDER BY gs.day) AS pos
  FROM (SELECT UNNEST(generate_series((SELECT d0 FROM mm), (SELECT d1 FROM mm)))
          AS day) gs
  LEFT JOIN g ON g.day = gs.day),
tot AS (SELECT CAST(SUM(c) AS HUGEINT) AS s, COUNT(*) AS n FROM dense),
pre AS (SELECT day, pos,
               CAST(SUM(c) OVER (ORDER BY pos) AS HUGEINT) AS sl
        FROM dense),
cand AS (
  SELECT day, pos AS n_l, (SELECT n FROM tot) - pos AS n_r,
         sl AS s_l, (SELECT s FROM tot) - sl AS s_r
  FROM pre WHERE pos < (SELECT n FROM tot)),
scored AS (
  SELECT day, n_l, n_r, s_l, s_r,
         CAST(s_l * s_l * n_r + s_r * s_r * n_l AS DOUBLE)
           / CAST(n_l * n_r AS DOUBLE) AS val
  FROM cand)
SELECT day + 1 AS split_day, CAST(n_l AS BIGINT) AS n_left,
       CAST(n_r AS BIGINT) AS n_right,
       ROUND(CAST(s_l AS DOUBLE) / CAST(n_l AS DOUBLE), 6) AS mean_left,
       ROUND(CAST(s_r AS DOUBLE) / CAST(n_r AS DOUBLE), 6) AS mean_right
FROM scored ORDER BY val DESC, day LIMIT 1
"""


