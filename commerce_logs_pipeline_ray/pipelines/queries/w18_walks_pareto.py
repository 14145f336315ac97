"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import _i64, _rd, _t, np, pa, pc, pd  # noqa: F401
from .cusum_twap import _copurchase_weighted_edges  # noqa: F401

# ---------------------------------------------------------------------------
# Wave 18: DeepWalk-style walk-corpus generation, Pareto layer peeling
# ---------------------------------------------------------------------------

_WALK_STARTS = 16
_WALK_STEPS = 4
_WALK_P = 2147483647


def _walk_pick(start: int, node: int, t: int, deg: int) -> int:
    """Deterministic neighbor rank for step t of the walk from ``start``
    sitting at ``node`` — the hash chain both engines evaluate identically
    in exact integer arithmetic."""
    h = ((start * 1000003 + node * 8191 + t * 131) % _WALK_P) * 2654435761 % _WALK_P
    return int(h % deg)


def q_random_walk_corpus(sf_dir: str) -> pd.DataFrame:
    """DeepWalk/node2vec walk-corpus generation (Perozzi et al. 2014) made
    deterministic: from the 16 smallest co-purchase nodes, 4-step walks
    where each step picks the H(start,node,t) mod deg-th smallest neighbor
    — the graph-embedding training-corpus primitive, reproducible across
    engines and reruns.  The edge set stays distributed (materialized once,
    one filtered scan per step); only the ≤16-node frontier broadcasts and
    only the frontier's neighbor lists come back, so each round moves
    O(Σ deg(frontier)) rows, never the graph."""
    import ray as _ray

    edges = (
        _copurchase_weighted_edges(sf_dir)
        .map_batches(
            lambda t: pa.table({"src": t["src"], "dst": t["dst"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    nodes = (
        edges.map_batches(
            lambda t: pa.table({"m": pc.unique(t["src"])}),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .to_pandas()["m"]
        .to_numpy(np.int64)
    )
    starts = np.unique(nodes)[:_WALK_STARTS].tolist()

    walks = [(int(s), 0, int(s)) for s in starts]
    cur = {int(s): int(s) for s in starts}
    for t in range(1, _WALK_STEPS + 1):
        frontier = np.unique(np.fromiter(cur.values(), np.int64, len(cur)))
        ref = _ray.put(frontier)

        def nbrs_of(tb: pa.Table, *, _ref=ref) -> pd.DataFrame:
            f = _ray.get(_ref)
            s = tb["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = np.searchsorted(f, s) < len(f)
            keep &= f[np.minimum(np.searchsorted(f, s), len(f) - 1)] == s
            return pd.DataFrame(
                {"src": s[keep],
                 "dst": tb["dst"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]}
            )

        nb = (
            edges.map_batches(nbrs_of, batch_format="pyarrow", zero_copy_batch=True)
            .to_pandas()
            .drop_duplicates()
            .sort_values(["src", "dst"], ignore_index=True)
        )
        adj = {int(v): g["dst"].to_numpy(np.int64) for v, g in nb.groupby("src")}
        for s in list(cur):
            ns = adj[cur[s]]
            nxt = int(ns[_walk_pick(s, cur[s], t, len(ns))])
            cur[s] = nxt
            walks.append((s, t, nxt))

    out = pd.DataFrame(walks, columns=["start", "step", "node"]).sort_values(
        ["start", "step"], ignore_index=True
    )
    return _i64(out, ["start", "step", "node"])


def _walk_sql_step(t: int, prev: str) -> str:
    return f"""
w{t} AS (
  SELECT w.start, {t} AS step, nb.dst AS node
  FROM {prev} w JOIN nb ON nb.src = w.node
   AND nb.rk = ((w.start * 1000003 + w.node * 8191 + {t} * 131) % {_WALK_P})
               * 2654435761 % {_WALK_P} % nb.deg + 1)"""


SQL_RANDOM_WALK_CORPUS = f"""
WITH pairs AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON b.l_orderkey = a.l_orderkey AND a.l_partkey <> b.l_partkey),
nb AS (SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS rk,
              COUNT(*) OVER (PARTITION BY src) AS deg
       FROM pairs),
starts AS (SELECT src AS node FROM pairs GROUP BY 1 ORDER BY 1 LIMIT {_WALK_STARTS}),
w0 AS (SELECT node AS start, 0 AS step, node FROM starts),{_walk_sql_step(1, "w0")},{_walk_sql_step(2, "w1")},{_walk_sql_step(3, "w2")},{_walk_sql_step(4, "w3")}
SELECT start, step, node FROM (
  SELECT * FROM w0 UNION ALL SELECT * FROM w1 UNION ALL SELECT * FROM w2
  UNION ALL SELECT * FROM w3 UNION ALL SELECT * FROM w4)
ORDER BY start, step
"""


_PARETO_LAYERS = 3


def _pareto_peel(c: pd.DataFrame) -> np.ndarray:
    """Boolean keep-mask of the 2-D Pareto frontier (price MAX, date MIN) of
    ``c`` with columns price_c/date_us — the same strict-dominance semantics
    as q_skyline_orders, vectorized as one sort + running min."""
    idx = np.lexsort((c["date_us"].to_numpy(), -c["price_c"].to_numpy()))
    price = c["price_c"].to_numpy()[idx]
    date = c["date_us"].to_numpy()[idx]
    run_min = np.minimum.accumulate(date)
    new_class = np.r_[True, price[1:] != price[:-1]]
    class_id = np.cumsum(new_class) - 1
    last_idx = np.r_[np.nonzero(new_class)[0][1:] - 1, len(price) - 1]
    class_min = run_min[last_idx]
    prev_class_min = np.r_[np.int64(np.iinfo(np.int64).max), class_min[:-1]]
    prior_min = prev_class_min[class_id]
    # within a price class dates sort ascending under the lexsort, so the
    # class's first row carries its min date
    first_of_class = np.nonzero(new_class)[0]
    class_first_date = date[first_of_class][class_id]
    keep_sorted = (date < prior_min) & (date == class_first_date)
    keep = np.zeros(len(c), dtype=bool)
    keep[idx] = keep_sorted
    return keep


def q_pareto_layers(sf_dir: str) -> pd.DataFrame:
    """Onion-peeled Pareto layers (skyline of the remainder, 3 peels) on
    orders over (totalprice MAX, orderdate MIN) — the multi-objective
    shortlisting operator.  Distributed prune: global layer ≤ k points must
    be in a block's LOCAL layer ≤ k (peeling only removes competitors), so
    each block ships just its first 3 local frontiers and the driver peels
    that union — frontier-sized data movement, like the skyline query."""
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderdate"])

    def to_core(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"o_orderkey": df["o_orderkey"].to_numpy(np.int64),
             "price_c": _rd(df["o_totalprice"].to_numpy() * 100.0, 0).astype(np.int64),
             "date_us": df["o_orderdate"].astype("datetime64[us]").astype("int64")}
        )

    def local_layers(df: pd.DataFrame) -> pd.DataFrame:
        c = to_core(df)
        out = []
        for _ in range(_PARETO_LAYERS):
            if c.empty:
                break
            keep = _pareto_peel(c)
            out.append(c[keep])
            c = c[~keep]
        return (
            pd.concat(out, ignore_index=True)
            if out
            else pd.DataFrame({"o_orderkey": pd.Series([], dtype="int64"),
                               "price_c": pd.Series([], dtype="int64"),
                               "date_us": pd.Series([], dtype="int64")})
        )

    cand = ds.map_batches(local_layers, batch_format="pandas").to_pandas()
    rows = []
    c = cand
    for layer in range(1, _PARETO_LAYERS + 1):
        if c.empty:
            break
        keep = _pareto_peel(c)
        sel = c[keep]
        rows.append(
            (layer, len(sel), int(sel["o_orderkey"].sum()),
             int(sel["price_c"].max()), int(sel["date_us"].min()))
        )
        c = c[~keep]
    out = pd.DataFrame(
        rows,
        columns=["layer", "n_orders", "orderkey_sum", "max_price_cents", "min_date_us"],
    )
    return _i64(out, ["layer", "n_orders", "orderkey_sum", "max_price_cents", "min_date_us"])


def _pareto_sql_round(src: str, out: str) -> str:
    return f"""
{out}_m AS (
  SELECT o_orderkey, price_c, date_us,
         MIN(date_us) OVER (ORDER BY price_c DESC
                            RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prior_min,
         MIN(date_us) OVER (PARTITION BY price_c) AS class_min
  FROM {src}),
{out} AS (
  SELECT o_orderkey, price_c, date_us,
         (date_us < COALESCE(prior_min, 9223372036854775807)
          AND date_us = class_min) AS on_front
  FROM {out}_m)"""


SQL_PARETO_LAYERS = f"""
WITH base AS (
  SELECT o_orderkey, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS price_c,
         epoch_us(o_orderdate) AS date_us
  FROM orders),{_pareto_sql_round("base", "f1")},
r1 AS (SELECT o_orderkey, price_c, date_us FROM f1 WHERE NOT on_front),{_pareto_sql_round("r1", "f2")},
r2 AS (SELECT o_orderkey, price_c, date_us FROM f2 WHERE NOT on_front),{_pareto_sql_round("r2", "f3")},
layers AS (
  SELECT 1 AS layer, o_orderkey, price_c, date_us FROM f1 WHERE on_front
  UNION ALL
  SELECT 2, o_orderkey, price_c, date_us FROM f2 WHERE on_front
  UNION ALL
  SELECT 3, o_orderkey, price_c, date_us FROM f3 WHERE on_front)
SELECT layer, COUNT(*) AS n_orders, CAST(SUM(o_orderkey) AS BIGINT) AS orderkey_sum,
       MAX(price_c) AS max_price_cents, MIN(date_us) AS min_date_us
FROM layers GROUP BY 1 ORDER BY 1
"""


