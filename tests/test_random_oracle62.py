"""Randomized oracle tests, part 62: wave-70 Arrow-IPC source on a random
documents corpus — the encode/decode round-trip must reproduce the parquet
aggregates exactly."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY
from tests.test_random_oracle33 import VOCAB
from tools.check_queries import compare


@pytest.mark.parametrize("seed", [487, 491])
def test_random_ipc_ingest(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w70s{seed}"))
    rng = np.random.default_rng(seed)
    n = 230
    texts = [" ".join(rng.choice(VOCAB, rng.integers(1, 30))) for _ in range(n)]
    pq.write_table(pa.table({
        "doc_id": pa.array(rng.permutation(np.arange(n)).astype(np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(rng.choice(["en", "de", "fr"], n)),
        "source": pa.array(rng.choice(["s0", "s1"], n)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), f"{d}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
    spec = REGISTRY["ipc_ingest_stats"]
    got = spec.fn(d)
    want = con.execute(spec.sql).df()
    assert not compare("ipc_ingest_stats", got, want)
