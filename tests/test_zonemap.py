"""Zone-map writer/pruned-reader tests: skipping receipt, correctness,
crash-safety (manifest last)."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

from commerce_logs_pipeline_ray.sources.zonemap import (
    MANIFEST,
    pruned_read,
    write_with_zonemaps,
)


def _ds(n=10_000):
    return rd.from_pandas(
        pd.DataFrame({"k": np.random.default_rng(1).permutation(n), "v": np.arange(n)})
    ).repartition(8)


def test_pruned_read_is_exact_and_skips(tmp_path, ray_session):
    out = str(tmp_path / "zm")
    man = write_with_zonemaps(_ds(), out, "k", num_files=16)
    assert sum(z["rows"] for z in man["zones"]) == 10_000
    # zones are disjoint ranges after the sort
    zs = sorted(man["zones"], key=lambda z: z["min"])
    for a, b in zip(zs, zs[1:]):
        assert a["max"] <= b["min"]
    t, stats = pruned_read(out, 2_000, 2_999)
    ks = t["k"].to_numpy(zero_copy_only=False)
    assert len(ks) == 1000 and ks.min() >= 2000 and ks.max() <= 2999
    # a 10% window must not open most files
    assert stats["files_scanned"] <= 4
    assert stats["files_skipped"] >= stats["files_total"] - 4
    assert stats["bytes_skipped"] > 0


def test_empty_window(tmp_path, ray_session):
    out = str(tmp_path / "zm")
    write_with_zonemaps(_ds(1000), out, "k", num_files=4)
    t, stats = pruned_read(out, 10_000, 20_000)
    assert t.num_rows == 0
    assert stats["files_scanned"] == 0


def test_manifest_written_last(tmp_path, ray_session):
    """A directory with files but no manifest reads as absent (crash
    mid-write leaves no half-manifest)."""
    out = str(tmp_path / "zm")
    write_with_zonemaps(_ds(500), out, "k", num_files=2)
    os.remove(os.path.join(out, MANIFEST))
    import pytest

    with pytest.raises(FileNotFoundError):
        pruned_read(out, 0, 10)
