"""Randomized oracle tests, part 36: wave-44 queries — WordPiece merge
scoring (random word-salad texts), FK containment inference (planted
orphan keys), and the Roaring container plan (planted dense runs that flip
chunks between run and bitmap encodings, plus multi-chunk key ranges)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY
from tests.test_random_oracle28 import _con_for, _star
from tests.test_random_oracle33 import VOCAB
from tools.check_queries import compare


def _run(name, d, con):
    spec = REGISTRY[name]
    got = spec.fn(d)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = con.execute(spec.sql).df()
    assert not compare(name, got, want), name


@pytest.mark.parametrize("seed", [127, 197])
def test_random_wordpiece(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w44w{seed}"))
    rng = np.random.default_rng(seed)
    n = 150
    texts = [" ".join(rng.choice(VOCAB, rng.integers(2, 40))) for _ in range(n)]
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
    _run("wordpiece_top_merges", d, con)


@pytest.mark.parametrize("seed", [131, 199])
def test_random_fk_bitmap(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w44f{seed}"))
    _star(seed, d)
    rng = np.random.default_rng(seed + 5)
    # events with some user ids outside the customer range (orphans)
    n = 1500
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array((1_700_000_000_000_000
                        + rng.integers(0, 30 * 86_400_000_000, n))
                       .astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(1, 240, n), pa.int64()),
        "event_type": pa.array(rng.choice(["view", "click"], n)),
        "value": pa.array(np.round(rng.uniform(0, 10, n), 2)),
        "props": pa.array(["{}"] * n),
    }), f"{d}/events.parquet")
    # overwrite orders with keys spanning several 2^16 chunks, including a
    # dense contiguous run (run container) and a sparse tail (array)
    dense = np.arange(65536, 65536 + 9000, dtype=np.int64)
    sparse = np.sort(rng.choice(np.arange(131072, 131072 + 60000), 5000,
                                replace=False)).astype(np.int64)
    keys = np.concatenate([dense, sparse])
    m = len(keys)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(keys),
        "o_custkey": pa.array(rng.integers(1, 121, m), pa.int64()),
        "o_orderstatus": pa.array(rng.choice(["F", "O"], m)),
        "o_totalprice": pa.array(np.round(rng.uniform(1, 1000, m), 2)),
        "o_orderdate": pa.array((np.datetime64("1995-01-01")
                                 + rng.integers(0, 1000, m)
                                 .astype("timedelta64[D]")).astype("datetime64[us]")),
        "o_orderpriority": pa.array(rng.choice(["1-URGENT", "3-MEDIUM"], m)),
    }), f"{d}/orders.parquet")
    con = _con_for(d)
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    _run("fk_inference_audit", d, con)
    _run("bitmap_container_plan", d, con)
