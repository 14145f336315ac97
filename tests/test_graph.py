"""Connected components (star contraction): exact component labeling for any
edge-list shape — chains, triangles, dup/reversed edges, self-loops — and
cluster semantics (a~b, b~c ⇒ one cluster without an (a,c) edge)."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from commerce_logs_pipeline_ray.functions.graph import connected_components


def _cc(ray_session, df, **kw):
    import ray.data as rd

    return connected_components(rd.from_pandas(df), **kw)


def _reference_components(edges: pd.DataFrame) -> dict[int, int]:
    """Scalar union-find ground truth."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in zip(edges["u"], edges["v"]):
        if u == v:
            parent.setdefault(u, u)
            continue
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent}


def test_chain_triangle_and_pair(ray_session):
    edges = pd.DataFrame({"u": [1, 2, 10, 20, 21, 20], "v": [2, 3, 11, 21, 22, 22]})
    out = _cc(ray_session, edges)
    got = dict(zip(out["node"], out["component"]))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_long_path_contracts_in_logarithmic_rounds(ray_session):
    n = 200
    path = pd.DataFrame({"u": np.arange(n - 1), "v": np.arange(1, n)})
    out = _cc(ray_session, path, max_rounds=12)  # star contraction, not O(n) propagation
    assert len(out) == n
    assert (out["component"] == 0).all()


def test_self_loops_and_duplicate_edges_ignored(ray_session):
    edges = pd.DataFrame({"u": [5, 6, 6, 7], "v": [5, 7, 7, 6]})
    out = _cc(ray_session, edges)
    got = dict(zip(out["node"], out["component"]))
    # node 5 has only a self-loop → not in the edge graph at all
    assert got == {6: 6, 7: 6}


def test_empty_edge_list(ray_session):
    out = _cc(ray_session, pd.DataFrame({"u": pd.Series(dtype="int64"), "v": pd.Series(dtype="int64")}))
    assert out.empty and list(out.columns) == ["node", "component"]


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)), min_size=1, max_size=80
    )
)
def test_components_match_union_find_for_any_graph(ray_session, pairs):
    import ray.data as rd

    edges = pd.DataFrame(pairs, columns=["u", "v"])
    out = connected_components(rd.from_pandas(edges), num_buckets=8)
    want = _reference_components(edges[edges["u"] != edges["v"]])
    got = dict(zip(out["node"], out["component"]))
    assert got == want


# ---------------------------------------------------------------- pagerank

def _reference_pagerank(edges: pd.DataFrame, iters=10, d=0.85) -> pd.DataFrame:
    """Dense-matrix power iteration ground truth (same dangling convention)."""
    nodes = np.union1d(edges["src"].unique(), edges["dst"].unique())
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    w = np.zeros((n, n))
    for s, t, wt in zip(edges["src"], edges["dst"], edges["w"]):
        w[idx[s], idx[t]] += wt
    outw = w.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        nz = outw > 0
        contrib = (w[nz] * (r[nz] / outw[nz])[:, None]).sum(axis=0)
        dangling = r[~nz].sum()
        r = (1 - d) / n + d * (contrib + dangling / n)
    return pd.DataFrame({"node": nodes, "rank": r})


def test_pagerank_matches_dense_reference(ray_session):
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.graph import pagerank

    rng = np.random.default_rng(7)
    m = 300
    edges = pd.DataFrame(
        {
            "src": rng.integers(0, 40, m),
            "dst": rng.integers(0, 50, m),  # nodes 40-49 are dangling (no out-edges)
            "w": rng.integers(1, 5, m).astype("float64"),
        }
    )
    got = pagerank(rd.from_pandas(edges), iters=8).set_index("node")["rank"]
    want = _reference_pagerank(edges, iters=8).set_index("node")["rank"]
    assert np.allclose(got.sort_index(), want.sort_index(), atol=1e-12)
    assert abs(got.sum() - 1.0) < 1e-9  # rank mass conserved


def test_pagerank_empty(ray_session):
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.graph import pagerank

    out = pagerank(rd.from_pandas(pd.DataFrame({"src": pd.Series(dtype="int64"), "dst": pd.Series(dtype="int64"), "w": pd.Series(dtype="float64")})))
    assert out.empty and list(out.columns) == ["node", "rank"]


# ---------------------------------------------------------------- triangles

def _brute_triangles(edges: pd.DataFrame) -> int:
    es = set(map(tuple, edges[["u", "v"]].to_numpy()))
    nodes = sorted({n for e in es for n in e})
    cnt = 0
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if (a, b) not in es:
                continue
            for c in nodes:
                if c > b and (a, c) in es and (b, c) in es:
                    cnt += 1
    return cnt


def test_triangle_k4(ray_session):
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.graph import triangle_stats

    k4 = pd.DataFrame({"u": [1, 1, 1, 2, 2, 3], "v": [2, 3, 4, 3, 4, 4]})
    out = triangle_stats(rd.from_pandas(k4))
    assert out["n_triangles"].iloc[0] == 4
    assert out["n_edges"].iloc[0] == 6
    assert out["n_wedges"].iloc[0] == 12  # 4 nodes × C(3,2)
    assert out["global_cc"].iloc[0] == 1.0


def test_triangle_path_has_none(ray_session):
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.graph import triangle_stats

    path = pd.DataFrame({"u": [1, 2, 3], "v": [2, 3, 4]})
    out = triangle_stats(rd.from_pandas(path))
    assert out["n_triangles"].iloc[0] == 0


def test_triangle_matches_bruteforce_random(ray_session):
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.graph import triangle_stats

    rng = np.random.default_rng(11)
    pairs = {(int(min(a, b)), int(max(a, b))) for a, b in rng.integers(0, 25, (150, 2)) if a != b}
    edges = pd.DataFrame(sorted(pairs), columns=["u", "v"])
    out = triangle_stats(rd.from_pandas(edges), num_buckets=8)
    assert out["n_triangles"].iloc[0] == _brute_triangles(edges)
    assert out["n_edges"].iloc[0] == len(edges)


# ---------------------------------------------------------------- BFS

def test_bfs_levels_planted_graph(ray_session):
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.graph import bfs_levels

    # 0→1→2→3 chain, 0→4, 3→0 back-edge (cycle), 9 unreachable island
    edges = pd.DataFrame({"src": [0, 1, 2, 0, 3, 9], "dst": [1, 2, 3, 4, 0, 9]})
    out = bfs_levels(rd.from_pandas(edges), source=0, max_hops=6)
    got = dict(zip(out["node"], out["hops"]))
    assert got == {0: 0, 1: 1, 4: 1, 2: 2, 3: 3}


def test_bfs_respects_max_hops(ray_session):
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.graph import bfs_levels

    chain = pd.DataFrame({"src": range(10), "dst": range(1, 11)})
    out = bfs_levels(rd.from_pandas(chain), source=0, max_hops=3)
    assert out["hops"].max() == 3 and len(out) == 4


def test_triangle_membership_paths_agree(ray_session):
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.graph import triangle_stats

    rng = np.random.default_rng(17)
    pairs = {(int(min(a, b)), int(max(a, b))) for a, b in rng.integers(0, 60, (400, 2)) if a != b}
    edges = pd.DataFrame(sorted(pairs), columns=["u", "v"])
    b = triangle_stats(rd.from_pandas(edges), num_buckets=8, membership="broadcast")
    s = triangle_stats(rd.from_pandas(edges), num_buckets=8, membership="shuffle")
    pd.testing.assert_frame_equal(b, s)


def test_sssp_bellman_ford_planted(ray_session):
    """Planted weighted graph: the short multi-hop route must beat the
    heavy direct edge."""
    import pandas as pd
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.graph import sssp_bellman_ford

    edges = pd.DataFrame(
        [
            (0, 1, 10),  # heavy direct
            (0, 2, 1), (2, 3, 1), (3, 1, 1),  # light detour: dist(1) == 3
            (1, 4, 2),
            (5, 6, 1),  # disconnected from 0
        ],
        columns=["src", "dst", "w"],
    )
    sym = pd.concat(
        [edges, edges.rename(columns={"src": "dst", "dst": "src"})], ignore_index=True
    )
    out = sssp_bellman_ford(
        rd.from_pandas(sym).repartition(3), source=0
    ).set_index("node")["dist"]
    assert out.to_dict() == {0: 0, 1: 3, 2: 1, 3: 2, 4: 5}
    assert 5 not in out.index and 6 not in out.index


def test_peel_local_equals_hindex_fixpoint():
    """The BZ peel (fast path) must equal the h-index fixpoint (reference)
    node-for-node on random symmetric graphs — coreness is unique, so any
    divergence is an implementation bug."""
    import numpy as np

    from commerce_logs_pipeline_ray.functions.graph import _hindex_local, _peel_local

    for seed in range(8):
        rng = np.random.default_rng(seed)
        m = int(rng.integers(40, 3000))
        hi = int(rng.integers(8, 90))
        a = rng.integers(0, hi, size=m)
        b = rng.integers(0, hi, size=m)
        keep = a != b
        pr = np.unique(
            np.stack([np.minimum(a[keep], b[keep]),
                      np.maximum(a[keep], b[keep])], axis=1), axis=0)
        s = np.concatenate([pr[:, 0], pr[:, 1]])
        d = np.concatenate([pr[:, 1], pr[:, 0]])
        got = _peel_local(s, d)
        want = _hindex_local(s, d, 256).sort_values("node", ignore_index=True)
        assert got.equals(want), f"seed={seed}"


def test_label_propagation_min_dst_only_node(ray_session):
    """On a NON-symmetrized edge set a dst-only node must still own a label
    slot (node universe = union of endpoints): previously dst=99 either
    indexed out of range or corrupted a neighbour's slot."""
    import pandas as pd

    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.graph import label_propagation_min

    edges = rd.from_pandas(pd.DataFrame({"src": [1, 2, 3], "dst": [2, 3, 99]}))
    out = label_propagation_min(edges, rounds=4)
    assert sorted(out["node"]) == [1, 2, 3, 99]
    assert (out["lbl"] == 1).all()
