"""Randomized oracle tests, part 47: wave-55 queries — shingle containment
(a planted sub-document must score 10⁶ toward its superset) and the
seasonal-baseline comparison (a planted perfectly weekly series must make
the seasonal error ~0)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY
from tests.test_random_oracle33 import VOCAB
from tools.check_queries import compare


def _run(name, d, con):
    spec = REGISTRY[name]
    got = spec.fn(d)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = con.execute(spec.sql).df()
    assert not compare(name, got, want), name
    return got


@pytest.mark.parametrize("seed", [317, 331])
def test_random_containment(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w55c{seed}"))
    rng = np.random.default_rng(seed)
    n = 150
    texts = [" ".join(rng.choice(VOCAB, rng.integers(5, 50))) for _ in range(n)]
    # planted subset: doc n is an exact 10-word slice of doc 0
    base = " ".join(rng.choice(VOCAB, 60))
    texts[0] = base
    texts[1] = " ".join(base.split()[20:30])
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["s0"] * n),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), f"{d}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
    got = _run("shingle_containment_topk", d, con)
    top = got.iloc[0]
    assert (top["src"], top["dst"]) == (1, 0) and top["containment_ppm"] == 1_000_000


def test_weekly_series_mase(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("w55m"))
    # value repeats with period 7 exactly → seasonal-7 error is 0
    days = np.arange(60)
    vals = (10.0 + (days % 7)).repeat(3)
    ts = (np.datetime64("2024-01-01", "us")
          + (np.repeat(days, 3) * 86_400_000_000
             + np.tile(np.array([0, 3_600_000_000, 7_200_000_000]), 60))
          .astype("timedelta64[us]"))
    n = len(vals)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts),
        "user_id": pa.array(np.ones(n, np.int64)),
        "event_type": pa.array(["view"] * n),
        "value": pa.array(vals),
        "props": pa.array(["{}"] * n),
    }), f"{d}/events.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    got = _run("forecast_baseline_compare", d, con)
    assert got.iloc[0]["sum_e7"] == 0 and got.iloc[0]["mase7_ppm"] == 0
