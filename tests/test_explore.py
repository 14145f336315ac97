import pytest

from commerce_logs_pipeline_ray.functions.explore import (
    compile_safe_filter,
    group_counts,
    human_bytes,
    safe_filter,
    shard_files,
    shard_of,
    tail,
)


def test_safe_filter_basic(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"a": i, "s": f"x{i}"} for i in range(20)])
    out = safe_filter(ds, "a % 2 == 0 and len(s) >= 2").take_all()
    # row order is not guaranteed (preserve_order=False) — compare as a set
    assert sorted(r["a"] for r in out) == list(range(0, 20, 2))


def test_safe_filter_rejects_dunder():
    with pytest.raises(ValueError):
        compile_safe_filter("__import__('os').system('x')")
    with pytest.raises(ValueError):
        compile_safe_filter("a.__class__")


def test_safe_filter_bad_rows_dropped():
    p = compile_safe_filter("missing_col > 1")
    assert p({"a": 1}) is False  # evaluation error → row dropped, not crash


def test_shard_filter_deterministic_partition():
    files = [f"part-{i:04d}.parquet" for i in range(100)]
    shards = [shard_files(files, 4, s) for s in range(4)]
    # disjoint and complete
    assert sorted(f for s in shards for f in s) == sorted(files)
    assert all(len(s) > 10 for s in shards)
    assert shard_of("abc", 4) == shard_of("abc", 4)


def test_group_counts_and_tail(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"k": "a" if i % 3 else "b", "v": i} for i in range(30)])
    out = group_counts(ds, "k", k=2)
    assert out.iloc[0]["k"] == "a" and out.iloc[0]["n"] == 20
    rows = tail(ds, predicate=lambda r: r["v"] > 25, n=3)
    assert [r["v"] for r in rows] == [26, 27, 28]


def test_human_bytes():
    assert human_bytes(512) == "512 B"
    assert human_bytes(2048) == "2.0 KB"
    assert human_bytes(40_000_000) == "38.1 MB"
