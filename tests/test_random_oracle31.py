"""Randomized oracle tests, part 31: wave-39 queries — Count-Min heavy
hitters (scalar-FNV artifact vs vectorized sketch), Page-Hinkley alarms
(planted negative running sums exercise the trunc-vs-floor division
distinction), and cumulative distinct users (planted multi-day repeat
visitors)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import ORACLE_ARTIFACT_DIR, REGISTRY
from commerce_logs_pipeline_ray.sources.loglines_file import corpus_dir
from tools.check_queries import compare

W39 = ["count_min_heavy_hitters", "page_hinkley_alarms",
       "cumulative_distinct_users"]


def _events(seed: int, d: str, n: int = 4000) -> None:
    rng = np.random.default_rng(seed)
    vals = np.round(rng.uniform(-40, 60, size=n), 2)
    types = np.asarray(["view", "purchase", "error", "signup", "click"],
                       dtype=object)[rng.integers(0, 5, size=n)]
    uid = rng.integers(1, 120, size=n).astype(np.int64)
    uid[:300] = 7  # heavy hitter for the sketch's top slot
    ts = 1_700_000_000_000_000 + rng.integers(0, 45 * 86_400_000_000, size=n)
    # one event type's early days go deeply negative: the PH running sum
    # crosses zero, so trunc-vs-floor integer division must agree
    neg = types == "error"
    vals[neg & (ts < 1_700_000_000_000_000 + 10 * 86_400_000_000)] = -55.5
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "user_id": pa.array(uid),
        "event_type": pa.array(types),
        "value": pa.array(vals),
        "props": pa.array(["{}"] * n),
    }), f"{d}/events.parquet")


@pytest.mark.parametrize("seed", [67, 149])
def test_random_cms_ph(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w39s{seed}"))
    _events(seed, d)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    for name in W39:
        spec = REGISTRY[name]
        got = spec.fn(d)
        if not isinstance(got, pd.DataFrame):
            got = got.to_pandas()
        sql = spec.sql.replace(ORACLE_ARTIFACT_DIR, corpus_dir(d))
        want = con.execute(sql).df()
        assert not compare(name, got, want), name
