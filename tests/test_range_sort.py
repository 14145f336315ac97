"""Range-partitioned global sort writer (queries.py::q_range_partitioned_sort):
layout invariants a binary-searching reader depends on."""

import glob
import os

import numpy as np
import pyarrow.parquet as pq

from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY, _corpus_dir

SF_DIR = "/root/testdata/sf0.001"


def test_range_sort_layout_invariants(ray_session):
    out = REGISTRY["range_partitioned_sort"].fn(SF_DIR)
    base = os.path.join(_corpus_dir(SF_DIR), "range_sort")
    dirs = sorted(glob.glob(os.path.join(base, "range=*")))
    assert [int(os.path.basename(d).split("=")[1]) for d in dirs] == list(out["range_id"])

    total = 0
    prev_max = None
    all_keys = []
    for d, (_, row) in zip(dirs, out.iterrows()):
        cents = []
        for f in sorted(glob.glob(os.path.join(d, "*.parquet"))):
            t = pq.read_table(f)
            c = t["cents"].to_numpy()
            # within-file sortedness
            assert (np.diff(c) >= 0).all(), f
            cents.append(c)
            all_keys += t["o_orderkey"].to_pylist()
        cents = np.concatenate(cents)
        total += len(cents)
        # range bounds match the summary and never overlap the previous range
        assert int(cents.min()) == row["min_c"] and int(cents.max()) == row["max_c"]
        if prev_max is not None:
            assert int(cents.min()) >= prev_max  # boundary rows may tie, never invert
        prev_max = int(cents.max())
    # complete + exactly-once: every order written exactly once
    src = pq.read_table(f"{SF_DIR}/orders.parquet", columns=["o_orderkey"])
    assert total == src.num_rows == int(out["n"].sum())
    assert sorted(all_keys) == sorted(src["o_orderkey"].to_pylist())
