"""Randomized oracle tests, part 41: wave-49 queries — conditional entropy
rate (a deterministic planted chain drives H→0; random chains stay high)
and MI(lang; source) (a perfectly confounded corpus vs an independent
one)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY
from tests.test_random_oracle31 import _events
from tools.check_queries import compare


def _run(name, d, con):
    spec = REGISTRY[name]
    got = spec.fn(d)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = con.execute(spec.sql).df()
    assert not compare(name, got, want), name
    return got


@pytest.mark.parametrize("seed", [257, 263])
def test_random_entropy_rate(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w49e{seed}"))
    _events(seed, d)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    _run("conditional_entropy_rate", d, con)


@pytest.mark.parametrize("confounded", [True, False])
def test_random_mi_lang_source(confounded, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w49m{int(confounded)}"))
    rng = np.random.default_rng(269 + int(confounded))
    n = 400
    langs = rng.choice(["en", "de", "fr", "zh"], n)
    if confounded:  # source fully determined by lang → MI = H(lang)
        sources = np.char.add("src_", langs)
    else:
        sources = rng.choice(["s0", "s1", "s2"], n)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(["t"] * n),
        "lang": pa.array(langs),
        "source": pa.array(sources.astype(object)),
        "n_chars": pa.array(np.ones(n, np.int64)),
    }), f"{d}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
    got = _run("mutual_information_lang_source", d, con)
    if confounded:
        assert got.iloc[0]["mi_munat"] > 1_000_000  # > 1 nat of dependence
    else:
        assert abs(got.iloc[0]["mi_munat"]) < 100_000
