"""Query layer vs DuckDB oracle on sf0.001 (a fast subset; the full
registry is exercised by tools/check_queries.py and the driver at sf0.01)."""

import duckdb
import pandas as pd
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY
from tools.check_queries import compare

SF_DIR = "/root/testdata/sf0.001"

SUBSET = [
    "events_by_type",
    "top_users_by_value",
    "parse_props",
    "orders_by_region",
    "last_event_per_user",
    "dedup_exact",
    "cosine_topk",
    "pipeline_docs",
    "user_sessions",
    "order_revenue_topk",
    "union_counts",
    "embedding_neardup",
    "dedup_clusters",
    "dedup_survivors",
    "chunk_stats",
    "contamination_check",
    "repetition_stats",
    "domain_mix_sample",
    "unigram_surprisal",
    "source_kl",
    "tfidf_topk",
    "embedding_centroids",
    "pii_scrub",
    "text_normalize",
    "zscore_outliers",
    "stratified_sample_k",
    "token_budget_sample",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(name, con, ray_session):
    spec = REGISTRY[name]
    ray_df = spec.fn(SF_DIR)
    if not isinstance(ray_df, pd.DataFrame):
        ray_df = ray_df.to_pandas()
    # artifact-backed oracle SQL hardcodes the driver's sf0.01 dir — retarget
    # to this sf's artifacts (same rewrite as tools/check_queries.py)
    from commerce_logs_pipeline_ray.pipelines.queries import ORACLE_ARTIFACT_DIR
    from commerce_logs_pipeline_ray.sources.loglines_file import corpus_dir

    sql_df = con.execute(spec.sql.replace(ORACLE_ARTIFACT_DIR, corpus_dir(SF_DIR))).df()
    problems = compare(name, ray_df, sql_df)
    assert not problems, problems


def test_registry_entries_have_descriptions():
    for name, spec in REGISTRY.items():
        assert callable(spec.fn), name


def test_derive_sequences_deterministic_and_typed():
    import pyarrow as pa
    import pyarrow.parquet as pq

    from commerce_logs_pipeline_ray.schema import SEQUENCES_SCHEMA
    from commerce_logs_pipeline_ray.sources.sequences import derive_sequences

    docs = pq.read_table(f"{SF_DIR}/documents.parquet")
    a = derive_sequences(docs)
    b = derive_sequences(docs)
    assert a.equals(b)
    assert a.schema.equals(SEQUENCES_SCHEMA)
    assert a.num_rows == docs.num_rows
