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
