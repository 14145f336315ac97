"""Randomized oracle tests, part 29: wave-37 queries — k-truss edge support
(vs DuckDB's 3-way triangle join, including support-0 edges), the Q2/Q12
analogs on the random star schema (shared generator from part 28), and the
JSONL source format on a random documents corpus."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import ORACLE_ARTIFACT_DIR, REGISTRY
from commerce_logs_pipeline_ray.sources.loglines_file import corpus_dir
from tests.test_random_oracle28 import _con_for, _star
from tools.check_queries import compare

W37_STAR = ["edge_support_hist", "min_cost_supplier", "late_shipments"]


@pytest.mark.parametrize("seed", [47, 113])
def test_random_truss_q2_q12(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w37s{seed}"))
    _star(seed, d)
    con = _con_for(d)
    for name in W37_STAR:
        spec = REGISTRY[name]
        got = spec.fn(d)
        want = con.execute(spec.sql).df()
        assert not compare(name, got, want), name


def test_random_jsonl_ingest(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("w37jsonl"))
    rng = np.random.default_rng(71)
    n = 300
    pq.write_table(pa.table({
        "doc_id": pa.array(rng.permutation(np.arange(n)).astype(np.int64)),
        "text": pa.array(["t"] * n),
        "lang": pa.array(rng.choice(["en", "de", "fr"], n)),
        "source": pa.array(rng.choice(["s0", "s1"], n)),
        "n_chars": pa.array(rng.integers(1, 5000, n), pa.int64()),
    }), f"{d}/documents.parquet")
    spec = REGISTRY["jsonl_ingest_stats"]
    got = spec.fn(d)
    sql = spec.sql.replace(ORACLE_ARTIFACT_DIR, corpus_dir(d))
    want = duckdb.connect().execute(sql).df()
    assert not compare("jsonl_ingest_stats", got, want)
