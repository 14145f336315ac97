"""Randomized oracle tests, part 64: wave-72 LM order comparison — a
deterministic repeating-bigram corpus must show a LARGE positive order
gain (bigrams nearly deterministic), a unigram-iid corpus a small one."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY
from tests.test_random_oracle33 import VOCAB
from tools.check_queries import compare


def _docs(texts, d):
    n = len(texts)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["s0"] * n),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), f"{d}/documents.parquet")


def _run(d):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
    spec = REGISTRY["ngram_order_compare"]
    got = spec.fn(d)
    want = con.execute(spec.sql).df()
    assert not compare("ngram_order_compare", got, want)
    return got


def test_deterministic_chain_gain(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("w72det"))
    # 'a b c d a b c d …' — next word fully determined by the previous
    _docs([" ".join(["a", "b", "c", "d"] * 30) for _ in range(40)], d)
    got = _run(d)
    assert got.iloc[0]["gain_munat"] > 800_000  # ≫ 0: order-2 wins big


def test_iid_small_gain(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("w72iid"))
    rng = np.random.default_rng(509)
    _docs([" ".join(rng.choice(VOCAB, 60)) for _ in range(60)], d)
    got = _run(d)
    det = got.iloc[0]["gain_munat"]
    assert det < 600_000  # iid corpus: bigram buys much less
