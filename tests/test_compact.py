"""Small-file compaction: row-multiset preservation, deterministic
planning, crash atomicity (original dir intact on failure), idempotence."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.sources.compact import compact_dir, plan_groups


def _write_small_files(d, n_files=12, rows_each=500):
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(2)
    all_rows = []
    for i in range(n_files):
        df = pd.DataFrame(
            {"k": rng.integers(0, 100, rows_each), "s": [f"r{i}-{j}" for j in range(rows_each)]}
        )
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), f"{d}/part-{i:04d}.parquet")
        all_rows.append(df)
    return pd.concat(all_rows, ignore_index=True)


def test_compact_preserves_row_multiset(ray_session, tmp_path):
    d = str(tmp_path / "sink")
    want = _write_small_files(d)
    res = compact_dir(d, target_mb=1)
    assert res["files_before"] == 12 and res["rows"] == len(want)
    assert res["files_after"] < res["files_before"]
    got = pq.read_table(d).to_pandas()
    a = got.sort_values(["k", "s"], ignore_index=True)
    b = want.sort_values(["k", "s"], ignore_index=True)
    pd.testing.assert_frame_equal(a, b)


def test_compact_idempotent_and_keeps_sidecars(ray_session, tmp_path):
    d = str(tmp_path / "sink")
    want = _write_small_files(d, n_files=6)
    with open(f"{d}/manifest.json", "w") as f:
        f.write("{}")
    compact_dir(d, target_mb=1)
    res2 = compact_dir(d, target_mb=1)
    assert res2["rows"] == len(want)
    assert os.path.exists(f"{d}/manifest.json")


def test_plan_groups_deterministic_and_bounded(tmp_path):
    d = str(tmp_path / "p")
    _write_small_files(d, n_files=9)
    files = [f"{d}/{f}" for f in os.listdir(d)]
    g1 = plan_groups(files, 40_000)
    g2 = plan_groups(list(reversed(files)), 40_000)
    assert g1 == g2  # name-sorted ⇒ input order irrelevant
    assert sum(len(g) for g in g1) == 9


def test_compact_failure_leaves_original(ray_session, tmp_path, monkeypatch):
    d = str(tmp_path / "sink")
    want = _write_small_files(d, n_files=4)
    import commerce_logs_pipeline_ray.sources.compact as C

    def boom(*a, **k):
        raise RuntimeError("planned failure")

    monkeypatch.setattr(C, "plan_groups", boom)
    with pytest.raises(RuntimeError):
        C.compact_dir(d, target_mb=1)
    got = pq.read_table(d).to_pandas()
    assert len(got) == len(want)
    assert len([f for f in os.listdir(d) if f.endswith(".parquet")]) == 4
