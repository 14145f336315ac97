"""Randomized oracle tests, part 15: the wave-23 family (motif discovery,
binary-segmentation changepoint) on random inputs with planted edge cases —
an exact repeated weekly pattern (SSD-0 motif), purchase-free days (zero
fill), a hard level shift whose split day is known, and tie runs — Ray vs
DuckDB on the same corpus."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import ORACLE_ARTIFACT_DIR, REGISTRY
from commerce_logs_pipeline_ray.sources.loglines_file import corpus_dir
from tools.check_queries import compare

_DAY_US = 86_400_000_000


def _run(name: str, d: str, con) -> None:
    spec = REGISTRY[name]
    got = spec.fn(d)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    sql = spec.sql.replace(ORACLE_ARTIFACT_DIR, corpus_dir(d))
    want = con.execute(sql).df()
    problems = compare(name, got, want)
    assert not problems, problems


def _con_for(d, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    return con


def _events_from_daily(cents_by_day: np.ndarray, seed: int, extra_noise: bool = True) -> pa.Table:
    """One purchase event per day carrying that day's cents total, plus
    non-purchase noise rows (ignored by both engines)."""
    rng = np.random.default_rng(seed)
    t0_day = 1_700_000_000_000_000 // _DAY_US + 1
    rows_ts, rows_type, rows_val = [], [], []
    for k, c in enumerate(cents_by_day):
        if c > 0:
            rows_ts.append((t0_day + k) * _DAY_US + 3600_000_000)
            rows_type.append("purchase")
            rows_val.append(c / 100.0)
    if extra_noise:
        for _ in range(200):
            k = int(rng.integers(0, len(cents_by_day)))
            rows_ts.append((t0_day + k) * _DAY_US + int(rng.integers(0, _DAY_US // 2)))
            rows_type.append("view")
            rows_val.append(float(np.round(rng.uniform(0, 50), 2)))
    n = len(rows_ts)
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.array(rows_ts, np.int64)).cast(pa.timestamp("us")),
        "user_id": pa.array(rng.integers(1, 50, size=n).astype(np.int64)),
        "event_type": pa.array(rows_type),
        "value": pa.array(np.array(rows_val, np.float64)),
        "props": pa.array(["{}"] * n),
    })


@pytest.mark.parametrize("seed", [67, 109])
@pytest.mark.parametrize("name", ["motif_discovery", "binary_segmentation"])
def test_random_daily_wave23(name, seed, ray_session, tmp_path_factory):
    rng = np.random.default_rng(seed)
    daily = rng.integers(0, 50000, size=75).astype(np.int64)
    daily[5:12] = daily[40:47]  # exact repeated weekly pattern → SSD 0
    daily[20] = 0
    daily[21] = 0  # purchase-free days: dense zero fill
    d = tmp_path_factory.mktemp(f"w23{seed}{name[:3]}")
    pq.write_table(_events_from_daily(daily, seed), str(d / "events.parquet"))
    _run(name, str(d), _con_for(d, ["events"]))


def test_motif_planted_zero_pair(ray_session, tmp_path_factory):
    rng = np.random.default_rng(4)
    daily = rng.integers(1000, 50000, size=60).astype(np.int64)
    daily[3:10] = daily[30:37]
    d = tmp_path_factory.mktemp("w23mz")
    pq.write_table(_events_from_daily(daily, 4, extra_noise=False),
                   str(d / "events.parquet"))
    out = REGISTRY["motif_discovery"].fn(str(d))
    assert int(out["ssd"].iloc[0]) == 0
    assert int(out["day_j"].iloc[0]) - int(out["day_i"].iloc[0]) == 27


def test_binary_segmentation_level_shift(ray_session, tmp_path_factory):
    """Hard level shift at day 30 of 60 (1000 → 90000 cents) must split
    exactly there."""
    daily = np.r_[np.full(30, 1000, np.int64), np.full(30, 90000, np.int64)]
    d = tmp_path_factory.mktemp("w23bs")
    pq.write_table(_events_from_daily(daily, 9, extra_noise=False),
                   str(d / "events.parquet"))
    out = REGISTRY["binary_segmentation"].fn(str(d))
    assert int(out["n_left"].iloc[0]) == 30
    assert int(out["n_right"].iloc[0]) == 30
    assert float(out["mean_left"].iloc[0]) == 1000.0
    assert float(out["mean_right"].iloc[0]) == 90000.0
