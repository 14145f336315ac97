"""Randomized oracle tests, part 33: wave-41 queries — positional phrase
search (planted overlapping 'batch batch batch' runs exercise the sliding
vs non-overlapping distinction) and the Z-order layout audit on random
key distributions including >16-bit keys (the %65536 wrap)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY
from tools.check_queries import compare

VOCAB = ["batch", "merge", "data", "sort", "table", "scan", "the", "fast",
         "key", "join", "row", "spark"]


def _run(name, d, con):
    spec = REGISTRY[name]
    got = spec.fn(d)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = con.execute(spec.sql).df()
    assert not compare(name, got, want), name


@pytest.mark.parametrize("seed", [89, 167])
def test_random_phrase_search(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w41p{seed}"))
    rng = np.random.default_rng(seed)
    n = 250
    texts = []
    for i in range(n):
        words = list(rng.choice(VOCAB, rng.integers(3, 60)))
        if i % 7 == 0:  # overlapping-run edge case: 'batch batch batch batch'
            words[:0] = ["batch"] * int(rng.integers(2, 6))
        texts.append(" ".join(words))
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
    _run("phrase_search", d, con)


@pytest.mark.parametrize("seed", [97, 173])
def test_random_zorder_audit(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w41z{seed}"))
    rng = np.random.default_rng(seed)
    n = 5000
    pq.write_table(pa.table({
        "l_orderkey": pa.array(np.arange(n, dtype=np.int64)),
        "l_partkey": pa.array(rng.integers(1, 200_000, n), pa.int64()),
        "l_suppkey": pa.array(rng.integers(1, 80_000, n), pa.int64()),
        "l_linenumber": pa.array(np.ones(n, np.int32)),
        "l_quantity": pa.array(np.ones(n)),
        "l_extendedprice": pa.array(np.ones(n)),
        "l_discount": pa.array(np.zeros(n)),
        "l_tax": pa.array(np.zeros(n)),
        "l_returnflag": pa.array(["N"] * n),
        "l_linestatus": pa.array(["O"] * n),
        "l_shipdate": pa.array(
            np.full(n, 820454400000000, np.int64).astype("datetime64[us]")),
    }), f"{d}/lineitem.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{d}/lineitem.parquet')")
    _run("zorder_layout_audit", d, con)
