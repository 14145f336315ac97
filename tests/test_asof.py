"""asof_join unit semantics (backward/forward, inner/left)."""

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def sides(ray_session):
    import ray.data as rd

    left = pd.DataFrame(
        {"id": [1, 2, 3, 4], "k": ["a", "a", "b", "b"], "t": [10, 25, 5, 40]}
    )
    right = pd.DataFrame(
        {"rid": [100, 101, 102, 103], "k": ["a", "a", "b", "c"], "t": [8, 20, 30, 1],
         "v": [1.0, 2.0, 3.0, 4.0]}
    )
    return rd.from_pandas(left), rd.from_pandas(right)


def test_backward_inner(sides):
    from commerce_logs_pipeline_ray.functions.asof import asof_join

    l, r = sides
    out = asof_join(l, r, by="k", on="t", right_payload=["rid", "v"]).to_pandas()
    got = {int(row["id"]): (row["rid_right"], row["v_right"]) for _, row in out.iterrows()}
    # id1 (a,t10) → rid100 (t8); id2 (a,t25) → rid101 (t20);
    # id3 (b,t5) → no prior right → dropped (inner); id4 (b,t40) → rid102 (t30)
    assert got == {1: (100, 1.0), 2: (101, 2.0), 4: (102, 3.0)}


def test_backward_left_keeps_unmatched(sides):
    from commerce_logs_pipeline_ray.functions.asof import asof_join

    l, r = sides
    out = asof_join(l, r, by="k", on="t", right_payload=["rid", "v"], inner=False).to_pandas()
    assert len(out) == 4
    row3 = out[out["id"] == 3].iloc[0]
    assert pd.isna(row3["rid_right"])


def test_forward(sides):
    from commerce_logs_pipeline_ray.functions.asof import asof_join

    l, r = sides
    out = asof_join(
        l, r, by="k", on="t", right_payload=["rid", "v"], direction="forward"
    ).to_pandas()
    got = {int(row["id"]): row["rid_right"] for _, row in out.iterrows()}
    # id1 (a,t10) → next right at t20 = 101; id2 (a,t25) → none; id3 (b,t5) → t30=102
    assert got == {1: 101, 3: 102}


def test_range_join_count(ray_session):
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.asof import range_join_count

    left = pd.DataFrame({"id": [1, 2, 3], "k": ["a", "a", "b"], "t": [100.0, 200.0, 50.0]})
    right = pd.DataFrame(
        {"rid": [10, 11, 12, 13, 14], "k": ["a", "a", "a", "b", "b"],
         "t": [95.0, 100.0, 150.0, 10.0, 49.0]}
    )
    out = range_join_count(
        rd.from_pandas(left), rd.from_pandas(right), by="k", on="t", window=10.0
    ).to_pandas()
    got = {int(r["id"]): int(r["n_in_window"]) for _, r in out.iterrows()}
    # id1 (a,100): right a-ts in (90,100] → 95,100 → 2
    # id2 (a,200): (190,200] → 0
    # id3 (b,50):  (40,50] → 49 → 1
    assert got == {1: 2, 2: 0, 3: 1}


def test_global_range_join_count_random_vs_bruteforce(ray_session):
    """Keyless band join vs O(n^2) truth — timestamps planted ON exact
    bucket boundaries (multiples of the window) so an off-by-one in the
    floor-bucket/replication math cannot pass."""
    import numpy as np
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.asof import global_range_join_count

    rng = np.random.default_rng(7)
    w = 60  # seconds
    n_l, n_r = 300, 500
    base = np.int64(1_700_000_000)
    lt = base + rng.integers(0, 86_400, n_l)
    rt = base + rng.integers(0, 86_400, n_r)
    # plant exact boundary values: left on a bucket edge, rights at edge,
    # edge-1, edge-w (just outside), edge-w+1 (just inside)
    edge = (base // w + 10) * w
    lt[:4] = [edge, edge, edge + w, edge - 1]
    rt[:5] = [edge, edge - 1, edge - w, edge - w + 1, edge + 1]

    left = pd.DataFrame({"id": np.arange(n_l, dtype=np.int64), "t": lt})
    right = pd.DataFrame({"t": rt})
    left["t"] = pd.to_datetime(left["t"], unit="s")
    right["t"] = pd.to_datetime(right["t"], unit="s")

    out = global_range_join_count(
        rd.from_pandas(left), rd.from_pandas(right), on="t", window=float(w)
    ).to_pandas()
    got = dict(zip(out["id"].astype(int), out["n_in_window"].astype(int)))

    # brute force over raw seconds: count rt in (lt - w, lt]
    diffs = lt[:, None] - rt[None, :]
    truth = ((diffs >= 0) & (diffs < w)).sum(axis=1)
    assert len(got) == n_l
    assert got == {int(i): int(c) for i, c in zip(left["id"], truth)}


def test_global_range_join_count_integer_on(ray_session):
    """Numeric (non-timestamp) `on`: window in raw units, count form."""
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.asof import global_range_join_count

    left = pd.DataFrame({"id": [1, 2, 3], "t": [100, 200, 205]})
    right = pd.DataFrame({"t": [95, 100, 150, 196, 200]})
    out = global_range_join_count(
        rd.from_pandas(left), rd.from_pandas(right), on="t", window=10
    ).to_pandas()
    got = {int(r["id"]): int(r["n_in_window"]) for _, r in out.iterrows()}
    # id1 (100): (90,100] → 95,100 → 2; id2 (200): (190,200] → 196,200 → 2
    # id3 (205): (195,205] → 196,200 → 2
    assert got == {1: 2, 2: 2, 3: 2}


def test_inner_keeps_matches_with_null_payload(ray_session):
    """Regression: a matched right row whose payload value is null must
    survive inner=True (match is tracked by a sentinel, not payload)."""
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.asof import asof_join

    left = pd.DataFrame({"id": [1], "k": ["a"], "t": [10]})
    right = pd.DataFrame({"rid": [100], "k": ["a"], "t": [5], "v": [None]})
    out = asof_join(rd.from_pandas(left), rd.from_pandas(right), by="k", on="t",
                    right_payload=["rid", "v"]).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["rid_right"] == 100
    assert pd.isna(out.iloc[0]["v_right"])


def test_null_on_rows_excluded_not_crash(ray_session):
    import numpy as np
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.asof import asof_join

    left = pd.DataFrame({"id": [1, 2], "k": ["a", "a"], "t": [10.0, np.nan]})
    right = pd.DataFrame({"rid": [100], "k": ["a"], "t": [5.0], "v": [1.0]})
    out = asof_join(rd.from_pandas(left), rd.from_pandas(right), by="k", on="t",
                    right_payload=["rid", "v"]).to_pandas()
    assert out["id"].tolist() == [1]  # null-ts left row silently non-matching
