"""Distributed global ROW_NUMBER / NTILE (functions/rank.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from commerce_logs_pipeline_ray.functions.rank import global_row_number, ntile_of


def _ref_rn(df: pd.DataFrame, key: str, tiebreak: list[str]) -> pd.DataFrame:
    out = df.sort_values([key, *tiebreak], kind="stable").reset_index(drop=True)
    out["rn"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out


@pytest.mark.parametrize("blocks", [1, 3, 8])
def test_row_number_matches_pandas_any_partitioning(ray_session, blocks):
    rng = np.random.default_rng(7)
    n = 4000
    df = pd.DataFrame(
        {
            "k": rng.normal(size=n).round(2),  # rounding forces ties in the key
            "id": np.arange(n, dtype=np.int64),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(blocks)
    ranked, total = global_row_number(ds, "k", ["id"], num_buckets=16)
    assert total == n
    got = ranked.to_pandas().sort_values("id").reset_index(drop=True)
    ref = _ref_rn(df, "k", ["id"]).sort_values("id").reset_index(drop=True)
    pd.testing.assert_series_equal(got["rn"], ref["rn"])


def test_row_number_heavy_tie_skew(ray_session):
    """A key value covering 60% of rows: ties may not straddle buckets, so
    the result stays exact (one fat bucket, documented contract)."""
    n = 2000
    k = np.where(np.arange(n) % 5 < 3, 42.0, np.arange(n, dtype=np.float64))
    df = pd.DataFrame({"k": k, "id": np.arange(n, dtype=np.int64)})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)
    ranked, total = global_row_number(ds, "k", ["id"], num_buckets=8)
    got = ranked.to_pandas().sort_values("id")["rn"].to_numpy()
    ref = _ref_rn(df, "k", ["id"]).sort_values("id")["rn"].to_numpy()
    assert total == n and (got == ref).all()


def test_ntile_matches_sql_semantics():
    import duckdb

    rng = np.random.default_rng(3)
    for n, k in [(100, 10), (103, 10), (7, 10), (1, 3), (57, 4)]:
        rn = np.arange(1, n + 1, dtype=np.int64)
        got = ntile_of(rn, n, k)
        ref = (
            duckdb.sql(
                f"SELECT NTILE({k}) OVER (ORDER BY i) t FROM range({n}) r(i) ORDER BY i"
            )
            .df()["t"]
            .to_numpy()
        )
        assert (got == ref).all(), (n, k)
