"""Span-assembly merge semantics (reference traces/model.go:30-49,
pipeline_design.md:103-116): field-wise last-writer-wins)."""

import numpy as np
import pandas as pd

from commerce_logs_pipeline_ray.functions.spans import merge_spans


def test_field_wise_lww(ray_session):
    import ray.data as rd

    df = pd.DataFrame(
        {
            "trace_id": [1, 1, 1, 2, 2],
            "span_id": [7, 7, 7, 7, 9],
            "ord": [1, 2, 3, 5, 1],
            # a LATER update without `status` must not null out the earlier one
            "status": ["open", None, None, "err", None],
            "val": [None, 2.5, None, None, 9.0],
        }
    )
    ds = rd.from_pandas(df).repartition(3)
    out = (
        merge_spans(ds, ["trace_id", "span_id"], ["ord"], ["status", "val"])
        .to_pandas()
        .set_index(["trace_id", "span_id"])
        .sort_index()
    )
    assert out.loc[(1, 7), "status"] == "open"     # survives later null updates
    assert out.loc[(1, 7), "val"] == 2.5
    assert out.loc[(1, 7), "n_updates"] == 3
    assert out.loc[(1, 7), "ord"] == 3
    assert out.loc[(2, 7), "status"] == "err"
    assert np.isnan(out.loc[(2, 9), "val"]) or out.loc[(2, 9), "val"] == 9.0


def test_lww_order_across_partitions(ray_session):
    """Value chosen is the latest non-null by ORDER, not by arrival."""
    import ray.data as rd

    rng = np.random.default_rng(3)
    n = 2000
    df = pd.DataFrame(
        {
            "trace_id": rng.integers(0, 20, n),
            "span_id": rng.integers(0, 5, n),
            "ord": rng.permutation(n),
            "status": np.where(rng.random(n) < 0.5, "s", None),
        }
    )
    ds = rd.from_pandas(df.sample(frac=1.0, random_state=1)).repartition(8)
    out = merge_spans(ds, ["trace_id", "span_id"], ["ord"], ["status"]).to_pandas()
    ref = (
        df.sort_values(["trace_id", "span_id", "ord"])
        .groupby(["trace_id", "span_id"])
        .agg(status=("status", "last"), n_updates=("ord", "size"), ord=("ord", "max"))
        .reset_index()
    )
    got = out.sort_values(["trace_id", "span_id"]).reset_index(drop=True)[ref.columns]
    ref = ref.sort_values(["trace_id", "span_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"n_updates": "int64", "ord": "int64"}),
        ref.astype({"n_updates": "int64", "ord": "int64"}),
    )
