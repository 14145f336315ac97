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
    "bm25_search",
    "mad_outliers",
    "cube_counts",
    "purchase_view_sets",
    "ewma_user_value",
    "customer_order_counts",
    "rrf_fusion",
    "type_hour_grid",
    "naive_bayes_langid",
    "fk_integrity_audit",
    "hourly_autocorr",
    "source_vocab_jaccard",
    "orders_vs_ships_daily",
    "copurchase_degree_hist",
    "bigram_lm_nll",
    "value_boxplot",
    "nation_revenue_share",
    "shipping_priority",
    "new_users_daily",
    "event_trigrams",
    "conversion_latency",
    "value_gini",
    "order_priority_check",
    "small_quantity_revenue",
    "rfm_segments",
    "frequent_triples",
    "bounce_rate",
    "centroid_separation",
    "curation_pipeline",
    "orders_growth_wow",
    "session_depth_histogram",
    "zipf_slope",
    "revenue_pareto",
    "rolling_active_users",
    "churn_counts",
    "skyline_orders",
    "longest_streaks",
    "custdist",
    "total_active_time",
    "winsorized_mean_per_type",
    "filter_attribution",
    "embedding_quantization_error",
    "weighted_median_price",
    "ttr_per_source",
    "session_conversion_rate",
    "forecast_revenue_change",
    "scd2_history",
    "tail_expected_shortfall",
    "returned_item_customers",
    "new_vs_returning_revenue",
    "fulfillment_latency_hist",
    "basket_lift",
    "user_survival_curve",
    "lineitem_corr_matrix",
    "journey_patterns",
    "k_anonymity_audit",
    "boilerplate_sentences",
    "hapax_docs_per_source",
    "anomaly_audit",
    "quality_gate_sweep",
    "wau_retention",
    "heaps_law_fit",
    "top_parts_per_segment",
    "cohort_ltv",
    "mixture_schedule",
    "order_price_ohlc",
    "duplicate_invoices",
    "stale_parts_by_brand",
    "charclass_profile",
    "purchase_value_drift",
    "peak_concurrent_sessions",
    "top_supplier_per_nation",
    "balance_ks_test",
    "benford_prices",
    "acf_multi_lag",
    "orders_seasonal_share",
    "doc_length_quality_corr",
    "priority_mix_chi2",
    "balance_anova_f",
    "price_p99_exact",
    "return_rate_monthly",
    "weekend_lift",
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


def test_weighted_sample_matches_reference_and_partitioning(ray_session, tmp_path):
    """E-S weighted sample: equals the driver-side numpy computation of the
    same deterministic formula, at any partitioning."""
    import hashlib

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.relational import topk
    from commerce_logs_pipeline_ray.functions.text import md5_hex
    import pyarrow.compute as pc

    rng = np.random.default_rng(11)
    n = 5000
    doc_ids = [f"d{i:05d}" for i in range(n)]
    n_tok = rng.integers(1, 400, size=n).astype(np.int32)
    t = pa.table({"doc_id": doc_ids, "n_tok": n_tok, "source": ["s"] * n})

    # driver-side reference
    frac = np.array(
        [(int(hashlib.md5(f"{d}:wsample".encode()).hexdigest()[:8], 16) + 1) / 2**32 for d in doc_ids]
    )
    key = np.log(frac) / n_tok.astype(np.float64)
    ref = (
        pd.DataFrame({"doc_id": doc_ids, "key": key})
        .sort_values(["key", "doc_id"], ascending=[False, True])
        .head(100)["doc_id"]
        .tolist()
    )

    def add_key(tb: pa.Table) -> pa.Table:
        h = md5_hex(pc.binary_join_element_wise(pc.cast(tb["doc_id"], pa.string()), ":wsample", ""))
        fr = np.array([(int(s[:8], 16) + 1) / 2**32 for s in h.to_pylist()])
        w = np.asarray(pc.cast(tb["n_tok"], pa.float64()))
        return tb.append_column("es_key", pa.array(np.log(fr) / w))

    for blocks in (2, 9):
        keyed = rd.from_arrow(t).repartition(blocks).map_batches(
            add_key, batch_format="pyarrow", zero_copy_batch=True
        )
        got = topk(keyed, ["es_key", "doc_id"], [True, False], 100).to_pandas()["doc_id"].tolist()
        assert got == ref, blocks


def test_hopping_window_counts_invariants(ray_session):
    """Every event lands in exactly 3 windows; a boundary-timestamp event
    hits windows starting at ts, ts-600, ts-1200."""
    from commerce_logs_pipeline_ray.pipelines.queries import q_hopping_window_counts

    out = q_hopping_window_counts("/root/testdata/sf0.001")
    assert out["n"].sum() == 3 * 1000  # 1000 events at sf0.001
    assert ((out["window_start"] % 600) == 0).all()
    # windows never hold more events than exist, and counts are positive
    assert (out["n"] > 0).all()


def test_compression_ratio_flags_planted_boilerplate(ray_session):
    """Repetitive text compresses below the 0.45 gate; high-entropy text
    does not; empty text never divides by zero."""
    import numpy as np
    import pyarrow as pa

    from commerce_logs_pipeline_ray.functions.text import compression_ratio_batch

    rng = np.random.default_rng(5)
    noisy = " ".join("".join(chr(int(c)) for c in rng.integers(33, 127, 8))
                     for _ in range(60))
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["spam ham " * 200, noisy, ""]),
    })
    out = compression_ratio_batch(t).to_pandas().set_index("doc_id")
    assert out.loc[1, "compression_ratio"] < 0.45
    assert out.loc[2, "compression_ratio"] > 0.45
    assert out.loc[3, "raw_bytes"] == 0  # and no crash


def test_compression_quality_partition_invariant(ray_session):
    from commerce_logs_pipeline_ray.pipelines.queries import q_compression_quality

    a = q_compression_quality("/root/testdata/sf0.001")
    b = q_compression_quality("/root/testdata/sf0.001")
    assert a.equals(b)
    assert (a["n_docs"] > 0).all() and (a["compressed_bytes"] > 0).all()
