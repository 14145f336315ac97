"""Wave 69: hierarchical rollup analytics.

* hierarchy_rollup_shares — the region → nation → top-supplier revenue
  tree with exact share-of-parent ppm at every level: supplier revenue
  units reduce distributed once; nation and region totals fold from the
  same partials (one scan, three levels); rows are the top-3 suppliers per
  nation plus every nation and region line, each carrying level,
  share_of_parent_ppm and share_of_total_ppm — the drill-down table a BI
  layer renders directly.
"""
from __future__ import annotations

from ._base import _i64, _rd, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from ._base import grouped_sums  # noqa: F401

_TOP_SUPP = 3


def q_hierarchy_rollup_shares(sf_dir: str) -> pd.DataFrame:
    """Three-level rollup (region / nation / top-3 suppliers) with
    share-of-parent and share-of-total ppm, all from ONE revenue-unit
    exchange."""
    import ray as _ray

    s = pq.read_table(f"{sf_dir}/supplier.parquet",
                      columns=["s_suppkey", "s_nationkey"]).to_pandas()
    n = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    r = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    nmap = n.sort_values("n_nationkey")
    names = nmap["n_name"].to_numpy()
    regkey = nmap["n_regionkey"].to_numpy(np.int64)
    rnames = r.sort_values("r_regionkey")["r_name"].to_numpy()
    s = s.sort_values("s_suppkey")
    smap_ref = _ray.put((s["s_suppkey"].to_numpy(np.int64),
                         s["s_nationkey"].to_numpy(np.int64)))

    li = _t(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount"])

    def part(t: pa.Table) -> pd.DataFrame:
        keys, nk = _ray.get(smap_ref)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        i = np.searchsorted(keys, sk)
        i[i == len(keys)] = 0
        ep = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        dc = np.rint((1.0 - t["l_discount"].to_numpy(zero_copy_only=False)) * 100.0).astype(np.int64)
        df = pd.DataFrame({"nk": nk[i], "sk": sk, "u": ep * dc})
        return df.groupby(["nk", "sk"], as_index=False).sum()

    supp = grouped_sums(
        li.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["nk", "sk"], {"u": "u"}, reduce="driver").to_pandas()
    supp["u"] = supp["u"].astype(object)
    total = int(supp["u"].sum())
    nat = supp.groupby("nk", as_index=False)["u"].sum()
    nat["rk"] = regkey[nat["nk"].to_numpy(np.int64)]
    reg = nat.groupby("rk", as_index=False)["u"].sum()
    reg_u = dict(zip(reg["rk"].astype(int), reg["u"].astype(object)))
    nat_u = dict(zip(nat["nk"].astype(int), nat["u"].astype(object)))

    rows = []
    for rk in sorted(reg_u):
        rows.append({"level": 0, "path": rnames[rk],
                     "revenue": float(_rd(int(reg_u[rk]) / 10000.0, 2)),
                     "share_parent_ppm": (1_000_000 * int(reg_u[rk])) // total,
                     "share_total_ppm": (1_000_000 * int(reg_u[rk])) // total})
    for nk in sorted(nat_u):
        rk = int(regkey[nk])
        rows.append({"level": 1, "path": f"{rnames[rk]}/{names[nk]}",
                     "revenue": float(_rd(int(nat_u[nk]) / 10000.0, 2)),
                     "share_parent_ppm": (1_000_000 * int(nat_u[nk])) // int(reg_u[rk]),
                     "share_total_ppm": (1_000_000 * int(nat_u[nk])) // total})
    for nk, g in supp.groupby("nk"):
        g = g.copy()
        g["ui"] = g["u"].astype(object)
        g = g.sort_values(["ui", "sk"], ascending=[False, True]).head(_TOP_SUPP)
        rk = int(regkey[int(nk)])
        for _, row in g.iterrows():
            rows.append({
                "level": 2,
                "path": f"{rnames[rk]}/{names[int(nk)]}/{int(row['sk'])}",
                "revenue": float(_rd(int(row["ui"]) / 10000.0, 2)),
                "share_parent_ppm": (1_000_000 * int(row["ui"])) // int(nat_u[int(nk)]),
                "share_total_ppm": (1_000_000 * int(row["ui"])) // total})
    out = pd.DataFrame(rows).sort_values(["level", "path"], ignore_index=True)
    return _i64(out, ["level", "share_parent_ppm", "share_total_ppm"])


SQL_HIERARCHY_ROLLUP_SHARES = f"""
WITH su AS (
  SELECT n_regionkey, n_name, r_name, s_suppkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)) AS HUGEINT) AS u
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  GROUP BY 1, 2, 3, 4),
tot AS (SELECT CAST(SUM(u) AS HUGEINT) AS t FROM su),
nat AS (SELECT r_name, n_name, CAST(SUM(u) AS HUGEINT) AS u FROM su GROUP BY 1, 2),
reg AS (SELECT r_name, CAST(SUM(u) AS HUGEINT) AS u FROM nat GROUP BY 1),
topsup AS (
  SELECT * FROM (
    SELECT r_name, n_name, s_suppkey, u,
           ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY u DESC, s_suppkey)
             AS rk
    FROM su) WHERE rk <= {_TOP_SUPP}),
lines AS (
  SELECT 0 AS level, r_name AS path, ROUND(u / 10000.0, 2) AS revenue,
         (1000000 * u) // tot.t AS share_parent_ppm,
         (1000000 * u) // tot.t AS share_total_ppm
  FROM reg, tot
  UNION ALL
  SELECT 1, nat.r_name || '/' || nat.n_name, ROUND(nat.u / 10000.0, 2),
         (1000000 * nat.u) // reg.u, (1000000 * nat.u) // tot.t
  FROM nat JOIN reg ON reg.r_name = nat.r_name, tot
  UNION ALL
  SELECT 2, ts.r_name || '/' || ts.n_name || '/' || CAST(ts.s_suppkey AS VARCHAR),
         ROUND(ts.u / 10000.0, 2),
         (1000000 * ts.u) // nat.u, (1000000 * ts.u) // tot.t
  FROM topsup ts JOIN nat ON nat.n_name = ts.n_name, tot)
SELECT CAST(level AS BIGINT) AS level, path, revenue,
       CAST(share_parent_ppm AS BIGINT) AS share_parent_ppm,
       CAST(share_total_ppm AS BIGINT) AS share_total_ppm
FROM lines ORDER BY level, path
"""
