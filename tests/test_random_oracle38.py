"""Randomized oracle tests, part 38: wave-46 queries — lag-3 loop detection
(planted degenerate 'a b c a b c …' cycles of known run length), Fano
burstiness, and the exact equi-depth histogram (duplicate prices exercise
the NTILE tie ordering through the unique orderkey tiebreak)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY
from tests.test_random_oracle31 import _events
from tests.test_random_oracle33 import VOCAB
from tools.check_queries import compare


def _run(name, d, con):
    spec = REGISTRY[name]
    got = spec.fn(d)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = con.execute(spec.sql).df()
    assert not compare(name, got, want), name


@pytest.mark.parametrize("seed", [151, 227])
def test_random_loops_fano(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w46s{seed}"))
    rng = np.random.default_rng(seed)
    n = 200
    texts = []
    for i in range(n):
        words = list(rng.choice(VOCAB, rng.integers(4, 50)))
        if i % 9 == 0:  # planted 3-gram cycle of known length
            cyc = ["a", "b", "c"] * int(rng.integers(2, 8))
            pos = int(rng.integers(0, len(words)))
            words[pos:pos] = cyc
        texts.append(" ".join(words))
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["s0"] * n),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), f"{d}/documents.parquet")
    _events(seed + 3, d)
    # duplicate-heavy order prices for the NTILE tie path
    m = 800
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(1, m + 1, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(1, 50, m), pa.int64()),
        "o_orderstatus": pa.array(["F"] * m),
        "o_totalprice": pa.array(np.round(rng.integers(1, 40, m) / 2.0, 2)),
        "o_orderdate": pa.array((np.datetime64("1995-06-01")
                                 + rng.integers(0, 200, m)
                                 .astype("timedelta64[D]")).astype("datetime64[us]")),
        "o_orderpriority": pa.array(["3-MEDIUM"] * m),
    }), f"{d}/orders.parquet")
    con = duckdb.connect()
    for t in ["documents", "events", "orders"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
    _run("ngram_loop_detect", d, con)
    _run("fano_burstiness", d, con)
    _run("equidepth_price_histogram", d, con)
