"""Wave 74: video analytics depth and second-order digit forensics.

* video_motion_energy — per-video motion proxy over the decoded
  frame-luminance artifact: Σ|Δ frame_px_sum| across consecutive frames
  (the scene-cut detector's integral), top-10 by (energy DESC, media_id) —
  LAG-shape per video, one frame-table pass.
* newcomb_second_digit — the second-digit Benford/Newcomb test on order
  totals: observed second-digit ppm vs round(10⁶·Σ_k log10(1+1/(10k+d)))
  and the MAD, the standard companion the first-digit query can't catch
  (fabricators get digit 1 right and digit 2 wrong).
"""
from __future__ import annotations

from ._base import _i64, _rd, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from ._base import ORACLE_ARTIFACT_DIR, grouped_sums  # noqa: F401

_VME_TOPK = 10


def q_video_motion_energy(sf_dir: str) -> pd.DataFrame:
    """Σ|Δ luminance| per video from the frames artifact, top-10."""
    import os as _os

    from ...functions.relational import bucketed_group_reduce
    from ._base import _corpus_dir
    from .curation_d import ensure_media_parquet

    ensure_media_parquet(sf_dir)  # also writes media_frames.parquet
    ds = rd.read_parquet(_os.path.join(_corpus_dir(sf_dir), "media_frames.parquet"),
                         override_num_blocks=2)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for mid, g in df.groupby("media_id"):
            g = g.sort_values("frame_index")
            s = g["frame_px_sum"].to_numpy(np.int64)
            if len(s) < 2:
                continue
            rows.append({"media_id": mid, "n_frames": len(s),
                         "motion_energy": int(np.abs(np.diff(s)).sum())})
        return pd.DataFrame(rows)

    out = bucketed_group_reduce(ds, ["media_id"], fold).to_pandas()
    out = out.sort_values(["motion_energy", "media_id"],
                          ascending=[False, True],
                          ignore_index=True).head(_VME_TOPK)
    return _i64(out, ["n_frames", "motion_energy"])


SQL_VIDEO_MOTION_ENERGY = f"""
WITH f AS (
  SELECT media_id, frame_index, frame_px_sum,
         LAG(frame_px_sum) OVER (PARTITION BY media_id
                                 ORDER BY frame_index) AS prev
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/media_frames.parquet')),
e AS (
  SELECT media_id, COUNT(*) + 1 AS n_frames,
         CAST(SUM(ABS(frame_px_sum - prev)) AS BIGINT) AS motion_energy
  FROM f WHERE prev IS NOT NULL GROUP BY 1)
SELECT media_id, CAST(n_frames AS BIGINT) AS n_frames, motion_energy
FROM e ORDER BY motion_energy DESC, media_id LIMIT {_VME_TOPK}
"""


def q_newcomb_second_digit(sf_dir: str) -> pd.DataFrame:
    """Second-digit distribution of order-total cents vs the Newcomb
    expectation, per digit 0-9 with obs/exp ppm and |diff|."""
    orders = _t(sf_dir, "orders", ["o_totalprice"])

    def digits(t: pa.Table) -> pd.DataFrame:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64()).to_numpy(zero_copy_only=False)
        cents = cents[cents >= 10]  # need at least two digits
        nd = np.floor(np.log10(cents.astype(np.float64))).astype(np.int64) + 1
        # guard the float-log edge at exact powers of 10
        pow_lo = 10 ** np.maximum(nd - 1, 1)
        nd = np.where(cents < pow_lo, nd - 1, nd)
        nd = np.where(cents >= pow_lo * 10, nd + 1, nd)
        second = (cents // (10 ** (nd - 2))) % 10
        counts = np.bincount(second, minlength=10)
        return pd.DataFrame({"digit": np.arange(10, dtype=np.int64),
                             "n": counts})

    agg = grouped_sums(
        orders.map_batches(digits, batch_format="pyarrow", zero_copy_batch=True),
        ["digit"], {"n": "n"}, reduce="driver").to_pandas()
    agg = agg.sort_values("digit", ignore_index=True)
    total = int(agg["n"].sum())
    obs = (1_000_000 * agg["n"].to_numpy(np.int64)) // total
    d = np.arange(10)
    exp_p = np.array([np.log10(1.0 + 1.0 / (10 * k + dd)) for dd in d
                      for k in range(1, 10)]).reshape(10, 9).sum(1)
    exp = _rd(exp_p * 1e6, 0).astype(np.int64)
    out = pd.DataFrame({"digit": d.astype(np.int64),
                        "n": agg["n"].to_numpy(np.int64),
                        "obs_ppm": obs, "exp_ppm": exp,
                        "abs_diff_ppm": np.abs(obs - exp)})
    return _i64(out, ["digit", "n", "obs_ppm", "exp_ppm", "abs_diff_ppm"])


SQL_NEWCOMB_SECOND_DIGIT = """
WITH c AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders
  WHERE ROUND(o_totalprice * 100) >= 10),
f AS (
  SELECT CAST(substr(CAST(cents AS VARCHAR), 2, 1) AS BIGINT) AS digit
  FROM c),
grid AS (SELECT UNNEST(generate_series(0, 9)) AS digit),
dcnt AS (SELECT digit, COUNT(*) AS n FROM f GROUP BY 1),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM dcnt),
exp AS (
  SELECT grid.digit,
         CAST(ROUND(SUM(LOG10(1.0 + 1.0 / (10 * k.k + grid.digit))) * 1000000)
              AS BIGINT) AS exp_ppm
  FROM grid, (SELECT UNNEST(generate_series(1, 9)) AS k) k
  GROUP BY 1)
SELECT grid.digit, CAST(COALESCE(dcnt.n, 0) AS BIGINT) AS n,
       CAST((1000000 * COALESCE(dcnt.n, 0)) // tot.t AS BIGINT) AS obs_ppm,
       exp.exp_ppm,
       CAST(ABS((1000000 * COALESCE(dcnt.n, 0)) // tot.t - exp.exp_ppm)
            AS BIGINT) AS abs_diff_ppm
FROM grid LEFT JOIN dcnt USING (digit) JOIN exp USING (digit), tot
ORDER BY grid.digit
"""
