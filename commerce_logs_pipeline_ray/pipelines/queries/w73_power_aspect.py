"""Wave 73: experiment power planning and media geometry auditing.

* abtest_power_mde — the classic two-proportion minimum-detectable-effect
  at α=0.05 / power=0.8: MDE = (z_{α/2}+z_β)·√(2p(1−p)/n) with the z-sum
  fixed at its conventional 2.8; per customer nation, p = observed
  purchase share of that nation's events and n its event count — the
  sample-size row an experimentation platform shows before a launch.  The
  √ mirrors FLOOR-free ROUND(…·10⁶) on the same double expression both
  engines evaluate.
* media_aspect_ratio_audit — geometry QA over the media artifact: aspect
  buckets by integer cross-multiplication (16:9 / 4:3 / square / portrait
  / other, no float ratios), counts and the widest item per bucket.
"""
from __future__ import annotations

from ._base import _i64, _rd, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from ._base import ORACLE_ARTIFACT_DIR, grouped_sums  # noqa: F401


def q_abtest_power_mde(sf_dir: str) -> pd.DataFrame:
    """Per-nation MDE_ppm = round(10⁶·2.8·sqrt(2·p·(1−p)/n)) with p the
    purchase share — one count exchange, the double math identical on both
    engines."""
    import ray as _ray

    c = pq.read_table(f"{sf_dir}/customer.parquet",
                      columns=["c_custkey", "c_nationkey"]).to_pandas()
    n = pq.read_table(f"{sf_dir}/nation.parquet",
                      columns=["n_nationkey", "n_name"]).to_pandas()
    names = n.sort_values("n_nationkey")["n_name"].to_numpy()
    c = c.sort_values("c_custkey")
    cmap_ref = _ray.put((c["c_custkey"].to_numpy(np.int64),
                         c["c_nationkey"].to_numpy(np.int64)))

    ev = _t(sf_dir, "events", ["user_id", "event_type"])

    def part(t: pa.Table) -> pd.DataFrame:
        keys, nk = _ray.get(cmap_ref)
        u = t["user_id"].to_numpy(zero_copy_only=False)
        i = np.searchsorted(keys, u)
        i[i == len(keys)] = 0
        m = keys[i] == u
        pur = np.asarray(pc.equal(t["event_type"], "purchase")).astype(np.int64)
        df = pd.DataFrame({"nk": nk[i][m], "n": 1, "k": pur[m]})
        return df.groupby("nk", as_index=False).sum()

    agg = grouped_sums(
        ev.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["nk"], {"n": "n", "k": "k"}, reduce="driver").to_pandas()
    rows = []
    for _, r in agg.iterrows():
        ni, ki = int(r["n"]), int(r["k"])
        if ni == 0 or ki == 0 or ki == ni:
            continue
        p = ki / ni
        mde = float(_rd(2.8 * np.sqrt(2.0 * p * (1.0 - p) / ni) * 1e6, 0))
        rows.append({"n_name": names[int(r["nk"])], "n_events": ni,
                     "p_ppm": (1_000_000 * ki) // ni, "mde_ppm": int(mde)})
    out = pd.DataFrame(rows).sort_values("n_name", ignore_index=True)
    return _i64(out, ["n_events", "p_ppm", "mde_ppm"])


SQL_ABTEST_POWER_MDE = """
WITH e AS (
  SELECT n_name, COUNT(*) AS n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS k
  FROM events
  JOIN customer ON c_custkey = user_id
  JOIN nation ON n_nationkey = c_nationkey
  GROUP BY 1)
SELECT n_name, CAST(n AS BIGINT) AS n_events,
       CAST((1000000 * k) // n AS BIGINT) AS p_ppm,
       CAST(ROUND(2.8 * SQRT(2.0 * (k / (1.0 * n)) * (1.0 - k / (1.0 * n)) / n)
                  * 1000000) AS BIGINT) AS mde_ppm
FROM e WHERE n > 0 AND k > 0 AND k < n
ORDER BY n_name
"""


def q_media_aspect_ratio_audit(sf_dir: str) -> pd.DataFrame:
    """Aspect-ratio buckets over visual media (width > 0), classified by
    integer cross-multiplication: 16:9 (9w = 16h), 4:3 (3w = 4h), square,
    portrait (w < h), other — counts + max width per bucket."""
    from .curation_d import ensure_media_parquet

    ds = rd.read_parquet(ensure_media_parquet(sf_dir),
                         columns=["media_id", "width", "height"],
                         override_num_blocks=2)

    def bucketize(t: pa.Table) -> pd.DataFrame:
        w = t["width"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = t["height"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (w > 0) & (h > 0)
        w, h = w[keep], h[keep]
        bucket = np.where(9 * w == 16 * h, "16:9",
                 np.where(3 * w == 4 * h, "4:3",
                 np.where(w == h, "square",
                 np.where(w < h, "portrait", "other"))))
        df = pd.DataFrame({"bucket": bucket, "n": 1, "max_w": w})
        return df.groupby("bucket", as_index=False).agg(
            n=("n", "sum"), max_w=("max_w", "max"))

    parts = ds.map_batches(bucketize, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    out = (parts.groupby("bucket", as_index=False)
                .agg(n=("n", "sum"), max_w=("max_w", "max"))
                .sort_values("bucket", ignore_index=True))
    return _i64(out, ["n", "max_w"])


SQL_MEDIA_ASPECT_RATIO_AUDIT = f"""
WITH m AS (
  SELECT width AS w, height AS h
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/media.parquet')
  WHERE width > 0 AND height > 0),
b AS (
  SELECT CASE WHEN 9 * w = 16 * h THEN '16:9'
              WHEN 3 * w = 4 * h THEN '4:3'
              WHEN w = h THEN 'square'
              WHEN w < h THEN 'portrait'
              ELSE 'other' END AS bucket, w
  FROM m)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n, CAST(MAX(w) AS BIGINT) AS max_w
FROM b GROUP BY 1 ORDER BY 1
"""
