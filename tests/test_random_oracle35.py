"""Randomized oracle tests, part 35: wave-43 queries — ordered STRING_AGG
top terms (count ties exercise the (cnt DESC, word) tie-break), LAG-shape
order gaps (same-day orders → zero gaps), butterfly counts on a random
bipartite graph, and the UNPIVOT round-trip on random events."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import ORACLE_ARTIFACT_DIR, REGISTRY
from commerce_logs_pipeline_ray.sources.loglines_file import corpus_dir
from tests.test_random_oracle28 import _star
from tests.test_random_oracle31 import _events
from tests.test_random_oracle33 import VOCAB
from tools.check_queries import compare


def _run(name, d, con):
    spec = REGISTRY[name]
    got = spec.fn(d)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    sql = spec.sql.replace(ORACLE_ARTIFACT_DIR, corpus_dir(d))
    want = con.execute(sql).df()
    assert not compare(name, got, want), name


@pytest.mark.parametrize("seed", [107, 181])
def test_random_agg_shapes_star(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w43s{seed}"))
    _star(seed, d)
    con = duckdb.connect()
    for t in ["orders", "lineitem"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
    _run("order_gap_extremes", d, con)
    _run("butterfly_counts", d, con)


@pytest.mark.parametrize("seed", [109, 191])
def test_random_agg_shapes_docs_events(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w43d{seed}"))
    rng = np.random.default_rng(seed)
    n = 200
    texts = [" ".join(rng.choice(VOCAB, rng.integers(3, 50))) for _ in range(n)]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(rng.choice(["en", "de"], n)),
        "source": pa.array(rng.choice(["s0", "s1", "s2"], n)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), f"{d}/documents.parquet")
    _events(seed + 1, d)
    con = duckdb.connect()
    for t in ["documents", "events"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
    _run("string_agg_top_terms", d, con)
    _run("events_unpivot_check", d, con)
