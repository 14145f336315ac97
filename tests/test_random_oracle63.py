"""Randomized oracle tests, part 63: wave-71 greedy set cover with planted
partially-overlapping source vocabularies — multiple picks, monotone
cum_covered, and the known-optimal first pick."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY
from tools.check_queries import compare


@pytest.mark.parametrize("seed", [499, 503])
def test_random_set_cover(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w71s{seed}"))
    rng = np.random.default_rng(seed)
    # sources with tiered vocabularies: s_big covers 40 words, others
    # cover partially-overlapping slices of a 100-word universe
    universe = [f"w{i:03d}" for i in range(100)]
    vocabs = {"s_big": universe[:40]}
    for j in range(6):
        lo = int(rng.integers(0, 60))
        vocabs[f"s{j}"] = universe[lo: lo + int(rng.integers(10, 35))]
    texts, sources = [], []
    for s, words in vocabs.items():
        for _ in range(12):
            texts.append(" ".join(rng.choice(words, rng.integers(3, 15))))
            sources.append(s)
    n = len(texts)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array(sources),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), f"{d}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
    spec = REGISTRY["greedy_set_cover_sources"]
    got = spec.fn(d)
    want = con.execute(spec.sql).df()
    assert not compare("greedy_set_cover_sources", got, want)
    assert len(got) >= 2
    assert got["cum_covered"].is_monotonic_increasing
    assert (got["gain"] > 0).all()
