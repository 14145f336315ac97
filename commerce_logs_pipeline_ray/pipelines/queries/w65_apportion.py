"""Wave 65: divisor-method apportionment, the companion of the existing
Hamilton largest-remainder query.

* seat_apportionment_compare — D'Hondt (divisors 1,2,3,…) and Sainte-Laguë
  (1,3,5,…) 100-seat allocations over per-nation order counts: both
  methods materialize the (nation, divisor) quotient table with the
  SHARED quantization q = 10⁹·votes // divisor and take the top-100 by
  (q DESC, nation, divisor) — the tie rule both engines apply verbatim.
  One combiner pass for the votes; the quotient grid is |nations|·100
  rows.
"""
from __future__ import annotations

from ._base import _i64, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from ._base import grouped_sums  # noqa: F401

_SEATS = 100
_QSCALE = 1_000_000_000


def q_seat_apportionment_compare(sf_dir: str) -> pd.DataFrame:
    """Per-nation D'Hondt vs Sainte-Laguë seats (100 total) over order
    counts via the broadcast customer dimension; quotients quantized
    identically on both engines, ties by (nation, divisor)."""
    import ray as _ray

    c = pq.read_table(f"{sf_dir}/customer.parquet",
                      columns=["c_custkey", "c_nationkey"]).to_pandas()
    n = pq.read_table(f"{sf_dir}/nation.parquet",
                      columns=["n_nationkey", "n_name"]).to_pandas()
    names = n.sort_values("n_nationkey")["n_name"].to_numpy()
    c = c.sort_values("c_custkey")
    cmap_ref = _ray.put((c["c_custkey"].to_numpy(np.int64),
                         c["c_nationkey"].to_numpy(np.int64)))

    orders = _t(sf_dir, "orders", ["o_custkey"])

    def part(t: pa.Table) -> pd.DataFrame:
        keys, nk = _ray.get(cmap_ref)
        u = t["o_custkey"].to_numpy(zero_copy_only=False)
        i = np.searchsorted(keys, u)
        i[i == len(keys)] = 0
        m = keys[i] == u
        df = pd.DataFrame({"nk": nk[i][m], "v": 1})
        return df.groupby("nk", as_index=False).sum()

    votes = grouped_sums(
        orders.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["nk"], {"v": "v"}, reduce="driver").to_pandas()
    nks = votes["nk"].to_numpy(np.int64)
    v = votes["v"].to_numpy(np.int64)

    grid_names = names[nks]  # tie-break on the NAME string, like the SQL

    def allocate(divisors: np.ndarray) -> dict[int, int]:
        grid_nk = np.repeat(nks, len(divisors))
        grid_nm = np.repeat(grid_names, len(divisors))
        grid_d = np.tile(divisors, len(nks))
        grid_v = np.repeat(v, len(divisors))
        q = (_QSCALE * grid_v) // grid_d
        order = np.lexsort((grid_d, grid_nm, -q))[:_SEATS]
        seats: dict[int, int] = {}
        for nkv in grid_nk[order]:
            seats[int(nkv)] = seats.get(int(nkv), 0) + 1
        return seats

    dh = allocate(np.arange(1, _SEATS + 1, dtype=np.int64))
    sl = allocate(np.arange(1, 2 * _SEATS + 1, 2, dtype=np.int64))
    out = pd.DataFrame({
        "n_name": [names[int(k)] for k in nks], "votes": v,
        "dhondt_seats": [dh.get(int(k), 0) for k in nks],
        "slague_seats": [sl.get(int(k), 0) for k in nks]})
    out = out.sort_values("n_name", ignore_index=True)
    return _i64(out, ["votes", "dhondt_seats", "slague_seats"])


SQL_SEAT_APPORTIONMENT_COMPARE = f"""
WITH votes AS (
  SELECT n_name, COUNT(*) AS v
  FROM orders JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  GROUP BY 1),
dgrid AS (SELECT UNNEST(generate_series(1, {_SEATS})) AS d),
dh AS (
  SELECT n_name FROM (
    SELECT n_name, ({_QSCALE} * v) // d AS q,
           ROW_NUMBER() OVER (ORDER BY ({_QSCALE} * v) // d DESC, n_name, d)
             AS rk
    FROM votes, dgrid) WHERE rk <= {_SEATS}),
sl AS (
  SELECT n_name FROM (
    SELECT n_name, ({_QSCALE} * v) // (2 * d - 1) AS q,
           ROW_NUMBER() OVER (ORDER BY ({_QSCALE} * v) // (2 * d - 1) DESC,
                              n_name, 2 * d - 1) AS rk
    FROM votes, dgrid) WHERE rk <= {_SEATS})
SELECT votes.n_name, CAST(v AS BIGINT) AS votes,
       CAST(COALESCE(dhc.s, 0) AS BIGINT) AS dhondt_seats,
       CAST(COALESCE(slc.s, 0) AS BIGINT) AS slague_seats
FROM votes
LEFT JOIN (SELECT n_name, COUNT(*) AS s FROM dh GROUP BY 1) dhc USING (n_name)
LEFT JOIN (SELECT n_name, COUNT(*) AS s FROM sl GROUP BY 1) slc USING (n_name)
ORDER BY votes.n_name
"""
