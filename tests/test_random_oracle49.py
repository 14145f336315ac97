"""Randomized oracle tests, part 49: wave-57 queries — Chao1 richness (an
all-singletons corpus drives the bias-corrected branch), inverse Simpson
(a one-word corpus reads exactly 1.0), and the Theil index (equal supplier
revenues read ~0) on the random star schema."""

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
    return got


@pytest.mark.parametrize("mode", ["random", "singletons", "oneword"])
def test_random_diversity(mode, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w57{mode}"))
    rng = np.random.default_rng(337)
    n = 120
    if mode == "singletons":  # every word unique → f1 = all, f2 = 0
        texts = [f"u{i}a u{i}b u{i}c" for i in range(n)]
    elif mode == "oneword":
        texts = ["same same same"] * n
    else:
        texts = [" ".join(rng.choice(VOCAB, rng.integers(2, 40)))
                 for _ in range(n)]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array(rng.choice(["s0", "s1"], n)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), f"{d}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
    _run("vocab_richness_chao1", d, con)
    got = _run("inverse_simpson_diversity", d, con)
    if mode == "oneword":
        assert (got["inv_simpson_milli"] == 1000).all()


@pytest.mark.parametrize("seed", [347, 349])
def test_random_theil(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w57t{seed}"))
    _star(seed, d)
    con = _con_for(d)
    _run("theil_index_supplier_revenue", d, con)
