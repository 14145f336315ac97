"""Relational operator tests."""

import numpy as np
import pandas as pd

def test_grouped_topk_matches_window_rank(ray_session):
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.relational import grouped_topk

    rng = np.random.default_rng(11)
    n = 5000
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 40, n),
            "id": np.arange(n),
            "v": np.round(rng.uniform(0, 100, n), 2),
        }
    )
    ref = (
        df.sort_values(["v", "id"], ascending=[False, True], kind="stable")
        .groupby("g", sort=False)
        .head(3)
        .sort_values(["g", "v", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    for blocks in (3, 13):
        ds = rd.from_pandas(df.sample(frac=1.0, random_state=blocks)).repartition(blocks)
        got = (
            grouped_topk(ds, ["g"], ["v", "id"], [True, False], 3)
            .to_pandas()
            .sort_values(["g", "v", "id"], ascending=[True, False, True])
            .reset_index(drop=True)[ref.columns]
        )
        pd.testing.assert_frame_equal(got, ref)


# ------------------------------------------------------------- skew join

def test_skew_join_equals_plain_join_on_planted_skew(ray_session):
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.relational import skew_join

    rng = np.random.default_rng(9)
    n = 20_000
    # ~half the fact rows hit key 7 (the hot key), rest uniform
    keys = np.where(rng.random(n) < 0.5, 7, rng.integers(0, 200, n))
    left = pd.DataFrame({"k": keys, "x": rng.integers(0, 100, n)})
    right = pd.DataFrame({"rk": np.arange(0, 150), "payload": np.arange(0, 150) * 10})

    got = (
        skew_join(rd.from_pandas(left), rd.from_pandas(right), on="k", right_on="rk",
                  hot_threshold=1000, sample_mod=8)
        .to_pandas()
        .sort_values(["k", "x", "payload"], ignore_index=True)
    )
    want = (
        left.merge(right, left_on="k", right_on="rk")[["k", "x", "payload"]]
        .sort_values(["k", "x", "payload"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_skew_join_duplicate_right_keys_mn_semantics(ray_session):
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.relational import skew_join

    left = pd.DataFrame({"k": [1, 1, 2, 3], "x": [10, 11, 20, 30]})
    right = pd.DataFrame({"k": [1, 1, 2, 4], "payload": [100, 101, 200, 400]})
    # force key 1 down the broadcast hot path: duplicates on BOTH sides
    got = (
        skew_join(rd.from_pandas(left), rd.from_pandas(right), on="k", hot_keys=[1])
        .to_pandas()
        .sort_values(["k", "x", "payload"], ignore_index=True)
    )
    want = (
        left.merge(right, on="k")
        .sort_values(["k", "x", "payload"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_skew_join_both_sides_hot_takes_tile_path(ray_session):
    """A key heavy on BOTH sides must not broadcast Σ(right hot rows):
    skew_join routes it through the block-pair tile path (bounded per-task
    memory) and the row multiset still equals the plain merge."""
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.relational import skew_join

    rng = np.random.default_rng(11)
    # key 7: 3000 left rows AND 400 right rows → 1.2M pairs if mishandled;
    # here scaled so the expected output is checkable (3000×400 = 1.2M rows
    # is fine at test scale with small tiles forcing multiple tasks)
    lk = np.concatenate([np.full(3000, 7), rng.integers(100, 150, 2000)])
    rk = np.concatenate([np.full(400, 7), np.arange(100, 150)])
    left = pd.DataFrame({"k": lk, "x": np.arange(len(lk))})
    right = pd.DataFrame({"rk": rk, "payload": np.arange(len(rk)) * 10})

    got = (
        skew_join(
            rd.from_pandas(left), rd.from_pandas(right), on="k", right_on="rk",
            hot_threshold=500, sample_mod=1,       # exact detection
            right_hot_threshold=100, tile_rows=800,  # force ≥2×1 tiles
        )
        .to_pandas()
        .sort_values(["k", "x", "payload"], ignore_index=True)
    )
    want = (
        left.merge(right, left_on="k", right_on="rk")[["k", "x", "payload"]]
        .sort_values(["k", "x", "payload"], ignore_index=True)
    )
    assert len(want) > 1_000_000  # the pair explosion is real
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_skew_join_mixed_hot_classes(ray_session):
    """bcast-hot, both-hot and cold keys in ONE join — all three paths
    active at once, union equals the plain merge."""
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.relational import skew_join

    left = pd.DataFrame({
        "k": [1] * 500 + [2] * 500 + [3, 4, 5] * 10,
        "x": np.arange(1030),
    })
    right = pd.DataFrame({
        "rk": [1] * 2 + [2] * 300 + [3, 4, 5, 6],   # 1: bcast-hot, 2: both-hot
        "payload": np.arange(306) * 7,
    })
    got = (
        skew_join(
            rd.from_pandas(left), rd.from_pandas(right), on="k", right_on="rk",
            hot_threshold=100, sample_mod=1, right_hot_threshold=100, tile_rows=200,
        )
        .to_pandas()
        .sort_values(["k", "x", "payload"], ignore_index=True)
    )
    want = (
        left.merge(right, left_on="k", right_on="rk")[["k", "x", "payload"]]
        .sort_values(["k", "x", "payload"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_detect_hot_keys_finds_planted_hot_key(ray_session):
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.relational import detect_hot_keys

    rng = np.random.default_rng(4)
    keys = np.concatenate([np.full(50_000, 42), rng.integers(1000, 9000, 20_000)])
    ds = rd.from_pandas(pd.DataFrame({"k": keys}))
    hot = detect_hot_keys(ds, "k", hot_threshold=10_000, sample_mod=16)
    assert 42 in set(hot["k"])
    # uniform tail keys (~3 rows each) must not be flagged
    assert (hot["est_count"] > 10_000).all() and len(hot) <= 3


def test_bloom_anti_join_exact(ray_session):
    """bloom_anti_join = exact NOT-IN semantics: no false negatives pass the
    filter stage and the left-outer verify scrubs every false positive."""
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.relational import bloom_anti_join

    rng = np.random.default_rng(3)
    big = pd.DataFrame({"k": rng.integers(0, 5000, 20_000), "v": np.arange(20_000)})
    small = pd.DataFrame({"rk": rng.choice(5000, 1500, replace=False)})
    got = bloom_anti_join(
        rd.from_pandas(big), rd.from_pandas(small), on="k", right_on="rk"
    ).to_pandas().sort_values("v", ignore_index=True)
    want = big[~big["k"].isin(set(small["rk"]))].sort_values("v", ignore_index=True)
    assert list(got.columns) == ["k", "v"]
    pd.testing.assert_frame_equal(got.astype("int64"), want.reset_index(drop=True).astype("int64"))


def test_skew_join_right_hot_only_key_tiles(ray_session):
    """A key hot ONLY on the right (heavy right rows, cold left) must not
    ride the hash-partitioned cold path — one partition would take the full
    right-side row flood.  It tiles (a 1×B strip), and the row multiset
    still equals the plain merge."""
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.relational import skew_join

    rng = np.random.default_rng(17)
    # key 9: only 5 left rows but 3000 right rows; other keys cold both sides
    lk = np.concatenate([np.full(5, 9), rng.integers(100, 150, 2000)])
    rk = np.concatenate([np.full(3000, 9), np.arange(100, 150)])
    left = pd.DataFrame({"k": lk, "x": np.arange(len(lk))})
    right = pd.DataFrame({"rk": rk, "payload": np.arange(len(rk)) * 10})

    got = (
        skew_join(
            rd.from_pandas(left), rd.from_pandas(right), on="k", right_on="rk",
            hot_threshold=500, sample_mod=1,        # exact detection: left has NO hot key
            right_hot_threshold=1000, tile_rows=800,  # right key 9 → ≥4 tiles
        )
        .to_pandas()
        .sort_values(["k", "x", "payload"], ignore_index=True)
    )
    want = (
        left.merge(right, left_on="k", right_on="rk")[["k", "x", "payload"]]
        .sort_values(["k", "x", "payload"], ignore_index=True)
    )
    assert len(want) == 5 * 3000 + 2000 * 1
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_sort_merge_join_matches_hash_join(ray_session):
    """Sort-merge and hash join produce identical row multisets, including
    duplicate-key cross products and dropped non-matches."""
    import pandas as pd
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.relational import hash_join, sort_merge_join

    left = pd.DataFrame({"lk": [1, 2, 2, 3, 5, 5, 5], "lv": list("abcdefg")})
    right = pd.DataFrame({"rk": [2, 2, 3, 4, 5], "rv": list("vwxyz")})
    sm = sort_merge_join(
        rd.from_pandas(left).repartition(3),
        rd.from_pandas(right).repartition(2),
        on="lk", right_on="rk", num_ranges=3,
    ).to_pandas()
    hj = hash_join(
        rd.from_pandas(left), rd.from_pandas(right), on="lk", right_on="rk"
    ).to_pandas()
    key = ["lk", "lv", "rv"]
    a = sm[key].sort_values(key, ignore_index=True)
    b = hj.rename(columns={"rk": "lk"})[key] if "rk" in hj.columns else hj[key]
    b = b.sort_values(key, ignore_index=True)
    assert a.equals(b)
    # 2x2 cross product for key 2, 3x1 for key 5, key 1/4 dropped
    assert len(a) == 2 * 2 + 1 + 3
