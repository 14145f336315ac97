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
    rd,
)  # noqa: F401
from .neardup_a import _ensure_artifact  # noqa: F401
from .neardup_b import _sf_of  # noqa: F401

# ---------------------------------------------------------------------------
# Wave 22: image tile-texture audit, energy VAD segmentation, demographic
# parity
# ---------------------------------------------------------------------------

_TILE = 8


def _tile_varq(img: np.ndarray) -> np.ndarray:
    """Integer per-tile texture score: luma y=(299r+587g+114b)//1000 over
    non-overlapping 8×8 tiles (partial edge tiles dropped), score =
    (n·Σy² − (Σy)²) // n² — the population-variance numerator quantized, all
    int64."""
    h, w = img.shape[0] // _TILE * _TILE, img.shape[1] // _TILE * _TILE
    if h == 0 or w == 0:
        return np.zeros(0, np.int64)
    y = (
        299 * img[:h, :w, 0].astype(np.int64)
        + 587 * img[:h, :w, 1].astype(np.int64)
        + 114 * img[:h, :w, 2].astype(np.int64)
    ) // 1000
    t = y.reshape(h // _TILE, _TILE, w // _TILE, _TILE).transpose(0, 2, 1, 3)
    t = t.reshape(-1, _TILE * _TILE)
    n = np.int64(_TILE * _TILE)
    s = t.sum(axis=1)
    ss = (t * t).sum(axis=1)
    return (n * ss - s * s) // (n * n)


def _tile_bucket_counts(img: np.ndarray) -> tuple[int, int, int, int, int]:
    vq = _tile_varq(img)
    flat = int((vq == 0).sum())
    low = int(((vq > 0) & (vq <= 100)).sum())
    mid = int(((vq > 100) & (vq <= 1000)).sum())
    high = int((vq > 1000).sum())
    return flat, low, mid, high, int(vq.sum())


def ensure_tile_entropy_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``image_tile_entropy``: per-image tile-texture
    bucket counts recorded at SYNTHESIS time from the source pixel arrays —
    independent of the PNG decode the engine must invert.  Images mix a
    flat quadrant (zero-variance tiles), smooth gradients and noise."""
    import os as _os

    def build() -> pa.Table:
        from ...functions.media_codecs import encode_png

        rng = np.random.default_rng(23)
        sf = _sf_of(sf_dir)
        n = max(30, min(3000, int(3000 * sf)))
        rows = {"media_id": [], "payload": [], "t_flat": [], "t_low": [],
                "t_mid": [], "t_high": [], "varq_sum": []}
        for i in range(n):
            w, h = 24 + i % 17, 24 + i % 13
            img = (
                np.add.outer(np.arange(h), np.arange(w))[..., None] * [2, 5, 3]
                + rng.integers(0, 60, size=(h, w, 3))
            ).astype(np.uint8)
            img[: h // 2, : w // 2] = [40, 90, 160]  # flat quadrant
            rows["media_id"].append(f"timg{i:05d}")
            rows["payload"].append(encode_png(img))
            f, lo, m, hi, vs = _tile_bucket_counts(img)
            rows["t_flat"].append(f)
            rows["t_low"].append(lo)
            rows["t_mid"].append(m)
            rows["t_high"].append(hi)
            rows["varq_sum"].append(vs)
        return pa.table(
            {"media_id": pa.array(rows["media_id"], pa.string()),
             "payload": pa.array(rows["payload"], pa.binary()),
             "t_flat": pa.array(rows["t_flat"], pa.int64()),
             "t_low": pa.array(rows["t_low"], pa.int64()),
             "t_mid": pa.array(rows["t_mid"], pa.int64()),
             "t_high": pa.array(rows["t_high"], pa.int64()),
             "varq_sum": pa.array(rows["varq_sum"], pa.int64())}
        )

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "tile_entropy.parquet"), build
    )


def q_image_tile_entropy(sf_dir: str) -> pd.DataFrame:
    """Image texture audit for vision-data curation (flat/low-texture frames
    are dropped before pretraining): decode each PNG in an actor pool, score
    8×8 tiles with the INTEGER variance quantizer, histogram the corpus —
    checked against synthesis-time source-array truth the decoder never
    saw.  Decode state loads once per actor; only 5 counters leave each
    batch."""
    from ...functions.media_codecs import decode_png

    src = ensure_tile_entropy_parquet(sf_dir)
    ds = rd.read_parquet(src, columns=["media_id", "payload"])

    class TileStats:
        def __init__(self):
            self._decode = decode_png

        def __call__(self, t: pa.Table) -> pa.Table:
            acc = np.zeros(5, np.int64)
            for p in t["payload"].to_pylist():
                acc += np.array(_tile_bucket_counts(self._decode(p)), np.int64)
            return pa.table(
                {"t_flat": pa.array(acc[:1]), "t_low": pa.array(acc[1:2]),
                 "t_mid": pa.array(acc[2:3]), "t_high": pa.array(acc[3:4]),
                 "varq_sum": pa.array(acc[4:5])}
            )

    agg = (
        ds.map_batches(TileStats, batch_format="pyarrow", batch_size=64,
                       concurrency=2, zero_copy_batch=True)
        .to_pandas()
        .sum()
    )
    out = pd.DataFrame(
        [{"t_flat": int(agg["t_flat"]), "t_low": int(agg["t_low"]),
          "t_mid": int(agg["t_mid"]), "t_high": int(agg["t_high"]),
          "varq_sum": int(agg["varq_sum"])}]
    )
    return _i64(out, ["t_flat", "t_low", "t_mid", "t_high", "varq_sum"])


SQL_IMAGE_TILE_ENTROPY = f"""
SELECT CAST(SUM(t_flat) AS BIGINT) AS t_flat, CAST(SUM(t_low) AS BIGINT) AS t_low,
       CAST(SUM(t_mid) AS BIGINT) AS t_mid, CAST(SUM(t_high) AS BIGINT) AS t_high,
       CAST(SUM(varq_sum) AS BIGINT) AS varq_sum
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/tile_entropy.parquet')
"""


_VAD_FRAME = 400
_VAD_THRESH = 400 * 250_000  # mean-square 500² over a 400-sample frame


def _vad_stats(samples: np.ndarray) -> tuple[int, int, int, int]:
    """(n_frames, n_active, longest_active_run, energy_sum) of int16 mono
    PCM under fixed 400-sample frames (tail dropped), all int64-exact."""
    mono = samples if samples.ndim == 1 else samples[:, 0]
    nf = len(mono) // _VAD_FRAME
    if nf == 0:
        return 0, 0, 0, 0
    x = mono[: nf * _VAD_FRAME].astype(np.int64).reshape(nf, _VAD_FRAME)
    e = (x * x).sum(axis=1)
    act = e > _VAD_THRESH
    # longest run of True, vectorized: cumulative count reset at gaps
    idx = np.arange(nf)
    start = np.where(act & np.r_[True, ~act[:-1]], idx, -1)
    run_start = np.maximum.accumulate(np.where(act, np.where(start >= 0, start, -1), idx + 1))
    runs = np.where(act, idx - run_start + 1, 0)
    return nf, int(act.sum()), int(runs.max()) if nf else 0, int(e.sum())


def ensure_vad_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``audio_vad_energy``: speech-shaped clips
    (alternating silence / loud tone-plus-noise segments) with VAD truth
    recorded at SYNTHESIS time from the source samples."""
    import os as _os

    def build() -> pa.Table:
        from ...functions.media_codecs import encode_wav

        rng = np.random.default_rng(31)
        sf = _sf_of(sf_dir)
        n = max(40, min(4000, int(4000 * sf)))
        rows = {"media_id": [], "payload": [], "n_frames": [],
                "n_active": [], "longest_run": [], "energy_sum": []}
        for i in range(n):
            segs = []
            for k in range(int(rng.integers(3, 7))):
                ln = int(rng.integers(800, 2400))
                if (i + k) % 2 == 0:
                    segs.append(rng.integers(-40, 40, size=ln))
                else:
                    tt = np.arange(ln)
                    segs.append(
                        (6000 * np.sin(tt / (3.0 + k))).astype(np.int64)
                        + rng.integers(-500, 500, size=ln)
                    )
            x = np.clip(np.concatenate(segs), -32768, 32767).astype(np.int16)
            nf, na, lr, es = _vad_stats(x)
            rows["media_id"].append(f"vad{i:05d}")
            rows["payload"].append(encode_wav(x, 16000))
            rows["n_frames"].append(nf)
            rows["n_active"].append(na)
            rows["longest_run"].append(lr)
            rows["energy_sum"].append(es)
        return pa.table(
            {"media_id": pa.array(rows["media_id"], pa.string()),
             "payload": pa.array(rows["payload"], pa.binary()),
             "n_frames": pa.array(rows["n_frames"], pa.int64()),
             "n_active": pa.array(rows["n_active"], pa.int64()),
             "longest_run": pa.array(rows["longest_run"], pa.int64()),
             "energy_sum": pa.array(rows["energy_sum"], pa.int64())}
        )

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "vad_clips.parquet"), build
    )


def q_audio_vad_energy(sf_dir: str) -> pd.DataFrame:
    """Energy-threshold voice-activity detection (the speech-data curation
    front door: silence-heavy clips are dropped or trimmed): decode each WAV
    in an actor pool, frame at 400 samples, integer frame energies against a
    fixed threshold, per-clip longest-active-run — corpus totals checked
    against synthesis-time truth the decoder never saw."""
    from ...functions.media_codecs import decode_wav

    src = ensure_vad_parquet(sf_dir)
    ds = rd.read_parquet(src, columns=["media_id", "payload"])

    class Vad:
        def __init__(self):
            self._decode = decode_wav

        def __call__(self, t: pa.Table) -> pa.Table:
            nf = na = es = 0
            lr = 0
            for p in t["payload"].to_pylist():
                _, x = self._decode(p)
                f, a, r, e = _vad_stats(x)
                nf += f
                na += a
                es += e
                lr = max(lr, r)
            return pa.table(
                {"n_clips": pa.array([len(t)], pa.int64()),
                 "n_frames": pa.array([nf], pa.int64()),
                 "n_active": pa.array([na], pa.int64()),
                 "longest_run": pa.array([lr], pa.int64()),
                 "energy_sum": pa.array([es], pa.int64())}
            )

    parts = ds.map_batches(
        Vad, batch_format="pyarrow", batch_size=64, concurrency=2,
        zero_copy_batch=True,
    ).to_pandas()
    out = pd.DataFrame(
        [{"n_clips": int(parts["n_clips"].sum()),
          "n_frames": int(parts["n_frames"].sum()),
          "n_active": int(parts["n_active"].sum()),
          "longest_run": int(parts["longest_run"].max()),
          "energy_sum": int(parts["energy_sum"].sum())}]
    )
    return _i64(out, ["n_clips", "n_frames", "n_active", "longest_run", "energy_sum"])


SQL_AUDIO_VAD_ENERGY = f"""
SELECT COUNT(*) AS n_clips, CAST(SUM(n_frames) AS BIGINT) AS n_frames,
       CAST(SUM(n_active) AS BIGINT) AS n_active,
       CAST(MAX(longest_run) AS BIGINT) AS longest_run,
       CAST(SUM(energy_sum) AS BIGINT) AS energy_sum
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/vad_clips.parquet')
"""


def q_demographic_parity(sf_dir: str) -> pd.DataFrame:
    """Demographic-parity / disparate-impact audit (the four-fifths rule)
    over user conversion: groups are user_id mod 3, outcome = user ever
    purchased; per-group rates plus a corpus-level 80%-rule flag decided by
    INTEGER cross-multiplication (5·pos_min·n_max < 4·pos_max·n_min), so no
    float comparison gates the verdict.  One user-level combiner exchange;
    group rows are bounded."""
    ds = _t(sf_dir, "events", ["user_id", "event_type"])

    def part(t: pa.Table) -> pd.DataFrame:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_p = pc.equal(t["event_type"], "purchase").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"user_id": uid, "pos": is_p.astype(np.int64)})
        return df.groupby("user_id", as_index=False).max()

    users = grouped_sums(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"],
        {"pos": "pos"},
    ).to_pandas()
    users["pos"] = (users["pos"] > 0).astype(np.int64)
    users["grp"] = users["user_id"] % 3
    g = users.groupby("grp", as_index=False).agg(
        n_users=("user_id", "count"), positives=("pos", "sum")
    )
    rate = g["positives"].to_numpy(np.float64) / g["n_users"].to_numpy(np.float64)
    order_lo = np.lexsort((g["grp"].to_numpy(), rate))
    order_hi = np.lexsort((g["grp"].to_numpy(), -rate))
    lo, hi = order_lo[0], order_hi[0]
    flag = int(
        5 * int(g["positives"][lo]) * int(g["n_users"][hi])
        < 4 * int(g["positives"][hi]) * int(g["n_users"][lo])
    )
    g["rate"] = _rd(rate, 6)
    g["di_flag"] = flag
    out = g.sort_values("grp", ignore_index=True)
    return _i64(out, ["grp", "n_users", "positives", "di_flag"])


SQL_DEMOGRAPHIC_PARITY = """
WITH u AS (
  SELECT user_id, MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pos
  FROM events GROUP BY 1),
g AS (SELECT user_id % 3 AS grp, COUNT(*) AS n_users,
             CAST(SUM(pos) AS BIGINT) AS positives
      FROM u GROUP BY 1),
rk AS (SELECT grp, n_users, positives,
              ROW_NUMBER() OVER (ORDER BY CAST(positives AS DOUBLE) / n_users, grp) AS rnlo,
              ROW_NUMBER() OVER (ORDER BY CAST(positives AS DOUBLE) / n_users DESC, grp) AS rnhi
       FROM g),
lo AS (SELECT positives AS p, n_users AS n FROM rk WHERE rnlo = 1),
hi AS (SELECT positives AS p, n_users AS n FROM rk WHERE rnhi = 1)
SELECT g.grp, g.n_users, g.positives,
       ROUND(CAST(g.positives AS DOUBLE) / g.n_users, 6) AS rate,
       CASE WHEN 5 * lo.p * hi.n < 4 * hi.p * lo.n THEN 1 ELSE 0 END AS di_flag
FROM g CROSS JOIN lo CROSS JOIN hi
ORDER BY g.grp
"""


