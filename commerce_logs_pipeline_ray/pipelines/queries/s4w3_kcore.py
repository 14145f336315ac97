"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import ORACLE_ARTIFACT_DIR, _corpus_dir, _i64, _t, np, pa, pc, pd, pq  # noqa: F401
from .cusum_twap import _copurchase_weighted_edges  # noqa: F401
from .neardup_a import _ensure_artifact  # noqa: F401

# ---------------------------------------------------------------------------
# Session-4 wave 3: k-core decomposition, compaction planner
# ---------------------------------------------------------------------------


def ensure_kcore_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``kcore_decomposition``: core numbers from an
    INDEPENDENT scalar derivation — itertools pair expansion and the exact
    Matula–Beck min-degree peeling (bucket queue), vs the engine's h-index
    fixpoint over distributed histogram partials.  Two different published
    algorithms agreeing on every node is the strongest cross-check."""
    import os as _os
    from collections import defaultdict
    from itertools import combinations

    def build() -> pa.Table:
        t = pq.read_table(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
        by_order: dict[int, set[int]] = defaultdict(set)
        for o, p in zip(t["l_orderkey"].to_pylist(), t["l_partkey"].to_pylist()):
            by_order[int(o)].add(int(p))
        adj: dict[int, set[int]] = defaultdict(set)
        for parts in by_order.values():
            for a, b in combinations(sorted(parts), 2):
                adj[a].add(b)
                adj[b].add(a)
        # Matula–Beck: repeatedly remove a minimum-degree node; its core is
        # the running max of the degree at removal time
        deg = {v: len(ns) for v, ns in adj.items()}
        buckets: dict[int, set[int]] = defaultdict(set)
        for v, d in deg.items():
            buckets[d].add(v)
        core: dict[int, int] = {}
        k = 0
        remaining = set(adj)
        while remaining:
            d = min(b for b in buckets if buckets[b])
            v = min(buckets[d])  # deterministic tie-break (order-free result)
            buckets[d].discard(v)
            remaining.discard(v)
            k = max(k, d)
            core[v] = k
            for u in adj[v]:
                if u in remaining:
                    buckets[deg[u]].discard(u)
                    deg[u] -= 1
                    buckets[deg[u]].add(u)
            deg.pop(v)
        return pa.table(
            {"node": pa.array(sorted(core), pa.int64()),
             "core": pa.array([core[n] for n in sorted(core)], pa.int64())}
        )

    return _ensure_artifact(_os.path.join(_corpus_dir(sf_dir), "kcore_ref.parquet"), build)


def q_kcore_decomposition(sf_dir: str) -> pd.DataFrame:
    """K-core decomposition of the co-purchase graph —
    ``functions/graph.py::kcore_hindex``: h-index fixpoint rounds, edge set
    distributed, per-(node, value) histogram partials; oracle = independent
    scalar Matula–Beck peeling."""
    from ...functions.graph import kcore_hindex

    ensure_kcore_parquet(sf_dir)
    edges = _copurchase_weighted_edges(sf_dir)
    return kcore_hindex(edges)


SQL_KCORE_DECOMPOSITION = """
SELECT node, core FROM read_parquet('{AD}/kcore_ref.parquet') ORDER BY node
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


_COMPACT_CAP_FACTOR = 2  # bin capacity = factor × largest cell


def ffd_pack(sizes: np.ndarray, keys: list[tuple], capacity: int) -> dict[tuple, int]:
    """First-fit-decreasing bin packing (classic 11/9·OPT+1 heuristic):
    items sorted by (size DESC, key ASC) for determinism, each placed in
    the lowest-indexed bin with room.  Runs on the PLAN manifest — grouped
    cell sizes, not rows — which stays small even at 10^12 rows (the same
    driver-side-plan contract as the flagship's shard planner)."""
    order = sorted(range(len(sizes)), key=lambda i: (-int(sizes[i]), keys[i]))
    bins: list[int] = []  # remaining capacity per bin
    assign: dict[tuple, int] = {}
    for i in order:
        s = int(sizes[i])
        for b, room in enumerate(bins):
            if s <= room:
                bins[b] = room - s
                assign[keys[i]] = b
                break
        else:
            bins.append(capacity - s)
            assign[keys[i]] = len(bins) - 1
    return assign


def q_compaction_plan(sf_dir: str) -> pd.DataFrame:
    """Small-file compaction planner: the per-(event_type, day) cell sizes
    (the 'small files' a routed sink would leave) are computed in one
    grouped count exchange; FFD packs the resulting manifest into bins of
    capacity 2× the largest cell.  Output = the full plan (cell → bin),
    ready to drive a per-bin rewrite.  Oracle: an independently-coded
    scalar FFD over the same cells (artifact)."""
    ds = _t(sf_dir, "events", ["event_type", "ts"])
    DAY_US = 86_400_000_000

    def part(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t["ts"], pa.int64()), DAY_US)
        g = (
            pa.table({"event_type": t["event_type"], "day": day})
            .group_by(["event_type", "day"])
            .aggregate([([], "count_all")])
        )
        return pa.table({"event_type": g["event_type"], "day": g["day"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    p = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    cells = p.groupby(["event_type", "day"], as_index=False)["n"].sum()
    sizes = cells["n"].to_numpy(np.int64)
    keys = list(zip(cells["event_type"], cells["day"].astype(int)))
    cap = _COMPACT_CAP_FACTOR * int(sizes.max())
    assign = ffd_pack(sizes, keys, cap)
    out = pd.DataFrame(
        {"event_type": [k[0] for k in keys], "day": [k[1] for k in keys],
         "size": sizes, "bin_id": [assign[k] for k in keys]}
    ).sort_values(["event_type", "day"], ignore_index=True)
    return _i64(out, ["day", "size", "bin_id"])


def ensure_compaction_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``compaction_plan``: the same documented FFD rule
    derived by an independent scalar pass (dict-of-lists grouping, linear
    first-fit scan) straight off the events parquet."""
    import os as _os
    from collections import defaultdict

    def build() -> pa.Table:
        t = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])
        cnt: dict[tuple, int] = defaultdict(int)
        ts_us = t["ts"].cast(pa.int64()).to_pylist()  # µs, tz-free
        for et, ts in zip(t["event_type"].to_pylist(), ts_us):
            cnt[(et, ts // 86_400_000_000)] += 1
        items = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        cap = _COMPACT_CAP_FACTOR * max(v for _, v in cnt.items())
        rooms: list[int] = []
        assign: dict[tuple, int] = {}
        for key, s in items:
            placed = False
            for b in range(len(rooms)):
                if s <= rooms[b]:
                    rooms[b] -= s
                    assign[key] = b
                    placed = True
                    break
            if not placed:
                rooms.append(cap - s)
                assign[key] = len(rooms) - 1
        ordered = sorted(cnt)
        return pa.table(
            {"event_type": pa.array([k[0] for k in ordered]),
             "day": pa.array([k[1] for k in ordered], pa.int64()),
             "size": pa.array([cnt[k] for k in ordered], pa.int64()),
             "bin_id": pa.array([assign[k] for k in ordered], pa.int64())}
        )

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "compaction_ref.parquet"), build
    )


def q_compaction_plan_checked(sf_dir: str) -> pd.DataFrame:
    ensure_compaction_parquet(sf_dir)
    return q_compaction_plan(sf_dir)


SQL_COMPACTION_PLAN = """
SELECT event_type, day, size, bin_id
FROM read_parquet('{AD}/compaction_ref.parquet')
ORDER BY event_type, day
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


