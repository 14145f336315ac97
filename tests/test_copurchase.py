"""Co-purchase pair mining: partitioning invariance vs a pandas reference."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from commerce_logs_pipeline_ray.functions.relational import (
    bucketed_group_reduce,
    grouped_sums,
    topk,
)


def _pairs_ref(df: pd.DataFrame, k: int) -> pd.DataFrame:
    d = df.drop_duplicates()
    m = d.merge(d, on="l_orderkey")
    m = m[m["l_partkey_x"] < m["l_partkey_y"]]
    out = (
        m.groupby(["l_partkey_x", "l_partkey_y"], as_index=False)
        .size()
        .rename(columns={"l_partkey_x": "part_a", "l_partkey_y": "part_b", "size": "n"})
    )
    return (
        out.sort_values(["n", "part_a", "part_b"], ascending=[False, True, True])
        .head(k)
        .reset_index(drop=True)
    )


def test_copurchase_pairs_match_reference_any_partitioning(ray_session):
    rng = np.random.default_rng(5)
    orders = np.repeat(np.arange(400), rng.integers(1, 6, size=400))
    parts = rng.integers(0, 30, size=len(orders))  # small domain → repeated pairs
    df = pd.DataFrame({"l_orderkey": orders.astype(np.int64), "l_partkey": parts.astype(np.int64)})
    ref = _pairs_ref(df, 20)

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.drop_duplicates()
        m = b.merge(b, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        out = m.groupby(["l_partkey_x", "l_partkey_y"], as_index=False).size()
        return out.rename(columns={"l_partkey_x": "part_a", "l_partkey_y": "part_b", "size": "n"})

    for blocks in (1, 7):
        ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(blocks)
        pairs = bucketed_group_reduce(ds, ["l_orderkey"], per_bucket)
        agg = grouped_sums(pairs, ["part_a", "part_b"], {"n": "n"})
        got = (
            topk(agg, ["n", "part_a", "part_b"], [True, False, False], 20)
            .to_pandas()
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got.astype("int64"), ref.astype("int64"))
