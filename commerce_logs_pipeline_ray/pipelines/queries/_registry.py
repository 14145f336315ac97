"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import QuerySpec  # noqa: F401
from .attribution import (
    SQL_LINEAR_ATTRIBUTION,
    SQL_PARTITION_SKEW_AUDIT,
    SQL_VOCAB_COVERAGE,
    ensure_user_partition_parquet,
    q_linear_attribution,
    q_partition_skew_audit,
    q_vocab_coverage,
)  # noqa: F401
from .blocklist_audio import (
    SQL_AUDIO_DOWNSAMPLE,
    SQL_BLOCKLIST_SCAN,
    SQL_BUDGET_APPORTIONMENT,
    ensure_audio_resample_parquet,
    q_audio_downsample,
    q_blocklist_scan,
    q_budget_apportionment,
)  # noqa: F401
from .bm25 import (
    SQL_BM25_TWO_PASS,
    SQL_LINE_DEDUP_REWRITE,
    q_bm25_two_pass,
    q_line_dedup_rewrite,
)  # noqa: F401
from .curation_a import (
    SQL_BM25_SEARCH,
    SQL_BPE_ENCODE_STATS,
    SQL_BPE_MERGES,
    SQL_COMPRESSION_QUALITY,
    SQL_CORPUS_DIFF,
    SQL_CUBE_COUNTS,
    SQL_EWMA_USER_VALUE,
    SQL_FK_INTEGRITY_AUDIT,
    SQL_HOURLY_AUTOCORR,
    SQL_MAD_OUTLIERS,
    SQL_MINHASH_INCREMENTAL,
    SQL_MINHASH_NEARDUP,
    SQL_NAIVE_BAYES_LANGID,
    SQL_NEARDUP_CLUSTER_DEDUP,
    SQL_ORDERS_VS_SHIPS_DAILY,
    SQL_PADDING_WASTE,
    SQL_PII_SCRUB,
    SQL_PURCHASE_VIEW_SETS,
    SQL_RRF_FUSION,
    SQL_SOURCE_VOCAB_JACCARD,
    SQL_STRATIFIED_SAMPLE_K,
    SQL_TEXT_NORMALIZE,
    SQL_TOKEN_BUDGET_SAMPLE,
    SQL_TYPE_HOUR_GRID,
    SQL_ZSCORE_OUTLIERS,
    ensure_bpe_encoded_parquet,
    ensure_bpe_merges_parquet,
    ensure_minhash_incremental_parquet,
    ensure_zlib_sizes_parquet,
    q_bm25_search,
    q_bpe_encode_stats,
    q_bpe_merges,
    q_compression_quality,
    q_corpus_diff,
    q_cube_counts,
    q_ewma_user_value,
    q_fk_integrity_audit,
    q_hourly_autocorr,
    q_mad_outliers,
    q_minhash_incremental,
    q_naive_bayes_langid,
    q_neardup_cluster_dedup,
    q_orders_vs_ships_daily,
    q_padding_waste,
    q_pii_scrub,
    q_purchase_view_sets,
    q_rrf_fusion,
    q_source_vocab_jaccard,
    q_stratified_sample_k,
    q_text_normalize,
    q_token_budget_sample,
    q_type_hour_grid,
    q_zscore_outliers,
)  # noqa: F401
from .curation_b import (
    SQL_BIGRAM_LM_NLL,
    SQL_BOUNCE_RATE,
    SQL_CENTROID_SEPARATION,
    SQL_CHURN_COUNTS,
    SQL_CONVERSION_LATENCY,
    SQL_COPURCHASE_DEGREE_HIST,
    SQL_CURATION_PIPELINE,
    SQL_CUSTDIST,
    SQL_EMBEDDING_QUANTIZATION_ERROR,
    SQL_EVENT_TRIGRAMS,
    SQL_FILTER_ATTRIBUTION,
    SQL_FREQUENT_TRIPLES,
    SQL_LONGEST_STREAKS,
    SQL_NATION_REVENUE_SHARE,
    SQL_NEW_USERS_DAILY,
    SQL_ORDERS_GROWTH_WOW,
    SQL_ORDER_PRIORITY_CHECK,
    SQL_REVENUE_PARETO,
    SQL_RFM_SEGMENTS,
    SQL_ROLLING_ACTIVE_USERS,
    SQL_SESSION_DEPTH_HISTOGRAM,
    SQL_SHIPPING_PRIORITY,
    SQL_SKYLINE_ORDERS,
    SQL_SMALL_QUANTITY_REVENUE,
    SQL_TOTAL_ACTIVE_TIME,
    SQL_VALUE_BOXPLOT,
    SQL_VALUE_GINI,
    SQL_WINSORIZED_MEAN_PER_TYPE,
    SQL_ZIPF_SLOPE,
    ensure_curation_parquet,
    q_bigram_lm_nll,
    q_bounce_rate,
    q_centroid_separation,
    q_churn_counts,
    q_conversion_latency,
    q_copurchase_degree_hist,
    q_curation_pipeline,
    q_custdist,
    q_embedding_quantization_error,
    q_event_trigrams,
    q_filter_attribution,
    q_frequent_triples,
    q_longest_streaks,
    q_nation_revenue_share,
    q_new_users_daily,
    q_order_priority_check,
    q_orders_growth_wow,
    q_revenue_pareto,
    q_rfm_segments,
    q_rolling_active_users,
    q_session_depth_histogram,
    q_shipping_priority,
    q_skyline_orders,
    q_small_quantity_revenue,
    q_total_active_time,
    q_value_boxplot,
    q_value_gini,
    q_weighted_median_price,
    q_winsorized_mean_per_type,
    q_zipf_slope,
)  # noqa: F401
from .curation_c import (
    SQL_ANOMALY_AUDIT,
    SQL_BALANCE_KS_TEST,
    SQL_BASKET_LIFT,
    SQL_BENFORD_PRICES,
    SQL_BOILERPLATE_SENTENCES,
    SQL_CHARCLASS_PROFILE,
    SQL_COHORT_LTV,
    SQL_DUPLICATE_INVOICES,
    SQL_FORECAST_REVENUE_CHANGE,
    SQL_FULFILLMENT_LATENCY_HIST,
    SQL_HAPAX_DOCS_PER_SOURCE,
    SQL_HEAPS_LAW_FIT,
    SQL_JOURNEY_PATTERNS,
    SQL_K_ANONYMITY_AUDIT,
    SQL_LINEITEM_CORR_MATRIX,
    SQL_MIXTURE_SCHEDULE,
    SQL_NEW_VS_RETURNING_REVENUE,
    SQL_ORDER_PRICE_OHLC,
    SQL_PEAK_CONCURRENT_SESSIONS,
    SQL_PURCHASE_VALUE_DRIFT,
    SQL_QUALITY_GATE_SWEEP,
    SQL_RETURNED_ITEM_CUSTOMERS,
    SQL_SCD2_HISTORY,
    SQL_SESSION_CONVERSION_RATE,
    SQL_STALE_PARTS_BY_BRAND,
    SQL_TAIL_EXPECTED_SHORTFALL,
    SQL_TOP_PARTS_PER_SEGMENT,
    SQL_TOP_SUPPLIER_PER_NATION,
    SQL_TTR_PER_SOURCE,
    SQL_USER_SURVIVAL_CURVE,
    SQL_WAU_RETENTION,
    SQL_WEIGHTED_MEDIAN_PRICE,
    q_acf_multi_lag,
    q_anomaly_audit,
    q_balance_ks_test,
    q_basket_lift,
    q_benford_prices,
    q_boilerplate_sentences,
    q_charclass_profile,
    q_cohort_ltv,
    q_duplicate_invoices,
    q_forecast_revenue_change,
    q_fulfillment_latency_hist,
    q_hapax_docs_per_source,
    q_heaps_law_fit,
    q_journey_patterns,
    q_k_anonymity_audit,
    q_lineitem_corr_matrix,
    q_mixture_schedule,
    q_new_vs_returning_revenue,
    q_order_price_ohlc,
    q_peak_concurrent_sessions,
    q_purchase_value_drift,
    q_quality_gate_sweep,
    q_returned_item_customers,
    q_scd2_history,
    q_session_conversion_rate,
    q_stale_parts_by_brand,
    q_tail_expected_shortfall,
    q_top_parts_per_segment,
    q_top_supplier_per_nation,
    q_ttr_per_source,
    q_user_survival_curve,
    q_wau_retention,
)  # noqa: F401
from .curation_d import (
    SQL_ACF_MULTI_LAG,
    SQL_AUDIO_FINGERPRINT_DEDUP,
    SQL_BALANCE_ANOVA_F,
    SQL_DOC_LENGTH_QUALITY_CORR,
    SQL_IMAGE_CONTENT_DEDUP,
    SQL_MEDIA_DECODE_REAL,
    SQL_MEDIA_RESIZE_STATS,
    SQL_ORDERS_SEASONAL_SHARE,
    SQL_PRICE_P99_EXACT,
    SQL_PRIORITY_MIX_CHI2,
    SQL_RANGE_PARTITIONED_SORT,
    SQL_RETURN_RATE_MONTHLY,
    SQL_VIDEO_CONTENT_DEDUP,
    SQL_VIDEO_FRAME_DECODE,
    SQL_WEEKEND_LIFT,
    ensure_media_parquet,
    q_audio_fingerprint_dedup,
    q_balance_anova_f,
    q_doc_length_quality_corr,
    q_image_content_dedup,
    q_media_decode_real,
    q_media_resize_stats,
    q_orders_seasonal_share,
    q_price_p99_exact,
    q_priority_mix_chi2,
    q_range_partitioned_sort,
    q_return_rate_monthly,
    q_video_content_dedup,
    q_video_frame_decode,
    q_weekend_lift,
)  # noqa: F401
from .cusum_twap import (
    SQL_ALS_USER_STEP,
    SQL_CUSUM_CHANGEPOINT,
    SQL_HISTOGRAM_SPLIT_FINDER,
    SQL_IMAGE_CHANNEL_STATS,
    SQL_INCREMENTAL_AGG,
    SQL_ISOTONIC_PURCHASE_RATE,
    SQL_JOIN_SIZE_PROFILE,
    SQL_KAPLAN_MEIER,
    SQL_MMR_RERANK,
    SQL_SORT_MERGE_REVENUE,
    SQL_SPLIT_LEAKAGE_AUDIT,
    SQL_SSSP_COPURCHASE,
    SQL_TWAP_USER_VALUE,
    SQL_WEBCLEAN_PIPELINE,
    SQL_WOE_BINNING,
    SQL_ZONEMAP_PRUNED_SCAN,
    SQL_ZORDER_LOCALITY,
    ensure_als_ref_parquet,
    ensure_channel_stats_parquet,
    ensure_isotonic_ref_parquet,
    ensure_mmr_ref_parquet,
    ensure_sssp_parquet,
    q_als_user_step,
    q_cusum_changepoint,
    q_histogram_split_finder,
    q_image_channel_stats,
    q_incremental_agg,
    q_isotonic_purchase_rate,
    q_join_size_profile,
    q_kaplan_meier,
    q_mmr_rerank,
    q_sort_merge_revenue,
    q_split_leakage_audit,
    q_sssp_copurchase,
    q_twap_user_value,
    q_webclean_pipeline,
    q_woe_binning,
    q_zonemap_pruned_scan,
    q_zorder_locality,
)  # noqa: F401
from .dedup_exact import SQL_DEDUP_EXACT, q_dedup_exact  # noqa: F401
from .dsir import SQL_DSIR_IMPORTANCE, ensure_dsir_buckets_parquet, q_dsir_importance  # noqa: F401
from .enrich_join import SQL_ORDERS_BY_REGION, q_orders_by_region  # noqa: F401
from .events_agg import (
    SQL_EVENTS_BY_TYPE,
    SQL_EVENTS_PER_HOUR,
    SQL_TOP_USERS,
    q_events_by_type,
    q_events_per_hour,
    q_top_users_by_value,
)  # noqa: F401
from .explore_stats import (
    SQL_DISTINCT_USERS,
    SQL_DOCS_MATCHING_REGEX,
    SQL_KMV_USER_OVERLAP,
    SQL_LANG_COUNTS,
    SQL_TYPE_OVERLAP_MATRIX,
    SQL_UNION_COUNTS,
    SQL_VALUE_MEDIAN,
    q_approx_distinct_users,
    q_approx_users_per_type,
    q_distinct_users_per_type,
    q_docs_matching_regex,
    q_kll_price_quantiles,
    q_kll_value_by_type,
    q_kmv_user_overlap,
    q_lang_counts,
    q_mg_heavy_users,
    q_type_overlap_matrix,
    q_union_counts,
    q_value_median_per_type,
)  # noqa: F401
from .filters import SQL_ERROR_EVENTS_WINDOW, q_error_events_window  # noqa: F401
from .flagship_docs import SQL_PIPELINE_DOCS, q_pipeline_docs  # noqa: F401
from .jaccard_pairs import (
    SQL_KCENTER_CORESET,
    SQL_NGRAM_JACCARD_PAIRS,
    SQL_WINNOWING_FINGERPRINTS,
    ensure_gram_hashes_parquet,
    ensure_kcenter_parquet,
    q_kcenter_coreset,
    q_ngram_jaccard_pairs,
    q_winnowing_fingerprints,
)  # noqa: F401
from .joins import (
    SQL_BLOOM_SEMI_JOIN,
    SQL_CUSTOMERS_WITHOUT_ORDERS,
    SQL_ERROR_PRIOR_PURCHASE,
    SQL_GLOBAL_ERROR_CONTEXT,
    SQL_NATION_REVENUE,
    SQL_ORDER_REVENUE_TOPK,
    SQL_VIEWS_BEFORE_PURCHASE,
    q_bloom_semi_join,
    q_customers_without_orders,
    q_error_prior_purchase,
    q_global_error_context,
    q_nation_revenue,
    q_order_revenue_topk,
    q_views_before_purchase,
)  # noqa: F401
from .last_state import SQL_LAST_EVENT, q_last_event_per_user  # noqa: F401
from .layout_audit import (
    SQL_FIM_LAYOUT,
    SQL_KNN_LABEL_CONSISTENCY,
    SQL_NGRAM_DIVERSITY,
    SQL_STRIDE_CHUNKS,
    q_fim_layout,
    q_knn_label_consistency,
    q_ngram_diversity,
    q_stride_chunks,
)  # noqa: F401
from .neardup_a import (
    SQL_ANALYZE_EVENTS,
    SQL_BIGRAM_TOPK,
    SQL_CHUNK_STATS,
    SQL_CMS_HEAVY_HITTERS,
    SQL_CONTAMINATION,
    SQL_CROSS_DOC_DUP_WINDOWS,
    SQL_CURRICULUM_ORDER,
    SQL_CUSTOMER_ORDER_COUNTS,
    SQL_DEDUP_CLUSTERS,
    SQL_DEDUP_SEQUENCES,
    SQL_DEDUP_SURVIVORS,
    SQL_DOMAIN_MIX,
    SQL_DOMINANT_USER_PER_TYPE,
    SQL_EMBEDDING_CENTROIDS,
    SQL_EMBEDDING_COVARIANCE,
    SQL_EMBEDDING_NEARDUP,
    SQL_EPOCH_SHUFFLE,
    SQL_EVENTS_PIVOT_HOURLY,
    SQL_HEAVY_HITTERS,
    SQL_JACCARD_NEARDUP,
    SQL_LANG_ENTROPY_PER_SOURCE,
    SQL_LENGTH_HISTOGRAM,
    SQL_NATION_HHI,
    SQL_OOV_RATE,
    SQL_ORDER_PRICE_DECILES,
    SQL_PACKING_STATS,
    SQL_REPETITION,
    SQL_REVENUE_ROLLUP,
    SQL_SOURCE_KL,
    SQL_SPLIT_COUNTS,
    SQL_SUBSTRING_DEDUP_REWRITE,
    SQL_SUBSTRING_DEDUP_STATS,
    SQL_TEMPERATURE_RESAMPLE,
    SQL_TFIDF_TOPK,
    SQL_TOKEN_FREQUENCY,
    SQL_TOKEN_PAGERANK,
    SQL_TRAINING_CHUNKS,
    SQL_TYPE_HOUR_CHI2,
    SQL_UNIGRAM_SURPRISAL,
    SQL_USER_PATHS,
    ensure_derived_parquet,
    ensure_packing_artifact,
    q_analyze_events,
    q_bigram_topk,
    q_chunk_stats,
    q_cms_heavy_hitters,
    q_contamination_check,
    q_cross_doc_dup_windows,
    q_curriculum_order,
    q_customer_order_counts,
    q_dedup_clusters,
    q_dedup_sequences,
    q_dedup_survivors,
    q_domain_mix_sample,
    q_dominant_user_per_type,
    q_embedding_centroids,
    q_embedding_covariance,
    q_embedding_neardup,
    q_embedding_neardup_lsh,
    q_epoch_shuffle,
    q_events_pivot_hourly,
    q_heavy_hitters,
    q_jaccard_neardup,
    q_lang_entropy_per_source,
    q_length_histogram,
    q_minhash_neardup,
    q_nation_hhi,
    q_oov_rate,
    q_order_price_deciles,
    q_packing_stats,
    q_repetition_stats,
    q_revenue_rollup,
    q_source_kl,
    q_split_counts,
    q_substring_dedup_rewrite,
    q_substring_dedup_stats,
    q_temperature_resample,
    q_tfidf_topk,
    q_token_bfs,
    q_token_frequency_topk,
    q_token_pagerank,
    q_training_chunks,
    q_type_hour_chi2,
    q_unigram_surprisal,
    q_user_paths,
)  # noqa: F401
from .neardup_b import ensure_dirty_names_parquet  # noqa: F401
from .w53_llr_damerau import (
    SQL_DAMERAU_LINKAGE,
    SQL_DUNNING_LLR_KEYWORDS,
    q_damerau_linkage,
    q_dunning_llr_keywords,
)  # noqa: F401
from .neardup_b import (
    SQL_BURST_DETECTION,
    SQL_COHORT_RETENTION,
    SQL_COPURCHASE_PAIRS,
    SQL_COPURCHASE_TRIANGLES,
    SQL_EMBEDDING_KMEANS,
    SQL_EVENT_GAP_STATS,
    SQL_EVENT_TRANSITIONS,
    SQL_FUNNEL_STAGES,
    SQL_INDEX_TERM_STATS,
    SQL_KEYWORD_SEARCH,
    SQL_LOGLINES_EXTRACT,
    SQL_MEDIA_DECODE_STATS,
    SQL_PEAK_ROLLING_VALUE,
    SQL_PMI_TOPK,
    SQL_RECORD_LINKAGE,
    SQL_SAMPLE_DOCS_MD5,
    SQL_SEMANTIC_DEDUP,
    SQL_SIMHASH_FINGERPRINTS,
    SQL_SIMHASH_HAMMING,
    SQL_SKEW_JOIN_NATION_VALUE,
    SQL_SPAN_ASSEMBLY,
    SQL_TOKEN_BFS,
    SQL_TOP_EVENTS_PER_TYPE,
    SQL_TRACE_SUMMARY,
    SQL_VALUE_P95,
    SQL_VALUE_TREND_PER_TYPE,
    SQL_WEIGHTED_SAMPLE,
    ensure_loglines_corpus,
    ensure_simhash_parquet,
    q_burst_detection,
    q_cohort_retention,
    q_copurchase_pairs,
    q_copurchase_triangles,
    q_embedding_kmeans,
    q_event_gap_stats,
    q_event_transitions,
    q_funnel_stages,
    q_index_term_stats,
    q_keyword_search,
    q_loglines_extract,
    q_media_decode_stats,
    q_peak_rolling_value,
    q_pmi_topk,
    q_record_linkage,
    q_sample_docs_md5,
    q_semantic_dedup,
    q_simhash_fingerprints,
    q_simhash_hamming_buckets,
    q_skew_join_nation_value,
    q_span_assembly,
    q_top_events_per_type,
    q_trace_summary,
    q_value_p95_per_type,
    q_value_trend_per_type,
    q_weighted_sample,
)  # noqa: F401
from .phash_pairs import (
    SQL_CONTRASTIVE_PAIRS,
    SQL_IMAGE_PHASH_DEDUP,
    ensure_scale_dups_parquet,
    q_contrastive_pairs,
    q_image_phash_dedup,
)  # noqa: F401
from .pq_ann import SQL_PQ_ANN_TOPK, ensure_pq_ref_parquet, q_pq_ann_topk  # noqa: F401
from .pricing_summary import SQL_PRICING_SUMMARY, q_pricing_summary  # noqa: F401
from .regex_parse import SQL_PARSE_PROPS, q_parse_props  # noqa: F401
from .route_counts import SQL_ROUTE_DOCUMENTS, q_route_documents  # noqa: F401
from .s4w1_interval_cdc import (
    SQL_FEISTEL_PERMUTATION,
    SQL_INTERVAL_OVERLAP_JOIN,
    SQL_SYMSPELL_EDIT1_JOIN,
    SQL_UPSERT_MERGE,
    q_feistel_permutation,
    q_interval_overlap_join,
    q_symspell_edit1_join,
    q_upsert_merge,
)  # noqa: F401
from .s4w2_stat_audits import (
    SQL_CONFORMAL_INTERVAL,
    SQL_IPS_POLICY_VALUE,
    SQL_KS_FDR_AUDIT,
    SQL_MANNWHITNEY_U,
    SQL_THEILSEN_TREND,
    q_conformal_interval,
    q_ips_policy_value,
    q_ks_fdr_audit,
    q_mannwhitney_u,
    q_theilsen_trend,
)  # noqa: F401
from .s4w3_kcore import (
    SQL_COMPACTION_PLAN,
    SQL_KCORE_DECOMPOSITION,
    q_compaction_plan_checked,
    q_kcore_decomposition,
)  # noqa: F401
from .s4w4_watermark_privacy import (
    SQL_BLOOM_FP_AUDIT,
    SQL_GROUP_SEQUENTIAL_AB,
    SQL_L_DIVERSITY_AUDIT,
    SQL_MARGIN_KNN_BITEXT,
    SQL_SCHEMA_DRIFT_AUDIT,
    SQL_UNIGRAM_LM_SEGMENT,
    SQL_VIDEO_SCENE_CUTS,
    SQL_WATERMARK_LATE_EVENTS,
    q_bloom_fp_audit,
    q_group_sequential_ab,
    q_l_diversity_audit,
    q_margin_knn_bitext,
    q_schema_drift_audit,
    q_unigram_lm_segment,
    q_video_scene_cuts,
    q_watermark_late_events,
)  # noqa: F401
from .s4w5_doremi_p95 import (
    SQL_DOREMI_MIXTURE_STEP,
    SQL_LINK_PREDICTION_JACCARD,
    SQL_QUANTILE_NORMALIZE,
    SQL_SEASONAL_DOW_DECOMPOSE,
    SQL_SLIDING_P95_VALUE,
    q_doremi_mixture_step,
    q_link_prediction_jaccard,
    q_quantile_normalize,
    q_seasonal_dow_decompose,
    q_sliding_p95_value,
)  # noqa: F401
from .s4w6_drift_ndcg import (
    SQL_EMBEDDING_DRIFT_AUDIT,
    SQL_NDCG_BM25_EVAL,
    SQL_TRANSITIVE_REACH3,
    SQL_UCB1_REPLAY,
    SQL_UNIGRAM_EM_STEP,
    ensure_ucb1_parquet,
    ensure_unigram_em_parquet,
    q_embedding_drift_audit,
    q_ndcg_bm25_eval,
    q_transitive_reach3,
    q_ucb1_replay,
    q_unigram_em_step_checked,
)  # noqa: F401
from .s4w7_tcloseness import (
    SQL_CLUSTERING_COEFFICIENT,
    SQL_CONTAINMENT_PAIRS,
    SQL_FEATURE_HASH_COLLISIONS,
    SQL_LOGREG_QUALITY_STEP,
    SQL_T_CLOSENESS_AUDIT,
    q_clustering_coefficient,
    q_containment_pairs,
    q_feature_hash_collisions,
    q_logreg_quality_step,
    q_t_closeness_audit,
)  # noqa: F401
from .s4w8_cdc_psi import (
    SQL_CDC_CHUNK_DEDUP,
    SQL_CUPED_ADJUSTMENT,
    SQL_ECE_CALIBRATION,
    SQL_MIXTURE_ESS_AUDIT,
    SQL_PSI_DRIFT,
    ensure_cdc_chunks_parquet,
    q_cdc_chunk_dedup,
    q_cuped_adjustment,
    q_ece_calibration,
    q_mixture_ess_audit,
    q_psi_drift,
)  # noqa: F401
from .s5w09_sketch_cube import (
    SQL_COUNT_MIN_AUDIT,
    SQL_CUBE_REVENUE,
    SQL_DECAYED_TOPK_USERS,
    SQL_HITS_SCORES,
    SQL_KENDALL_TAU_QTY_DISC,
    SQL_MLM_MASK_STATS,
    SQL_RING_REBALANCE,
    SQL_SPEARMAN_QTY_PRICE,
    q_count_min_audit,
    q_cube_revenue,
    q_decayed_topk_users,
    q_hits_scores,
    q_kendall_tau_qty_disc,
    q_mlm_mask_stats,
    q_ring_rebalance,
    q_spearman_qty_price,
)  # noqa: F401
from .s5w10_smoothing_graph import (
    SQL_CHARS_PER_TOKEN,
    SQL_GOOD_TURING_COUNTS,
    SQL_KNESER_NEY_BIGRAM,
    SQL_RBO_RANK_OVERLAP,
    SQL_TRAIN_INTERLEAVE_AUDIT,
    q_chars_per_token,
    q_good_turing_counts,
    q_kneser_ney_bigram,
    q_rbo_rank_overlap,
    q_train_interleave_audit,
)  # noqa: F401
from .sessions import (
    SQL_HOPPING_WINDOW_COUNTS,
    SQL_HOURLY_MOVING_AVG,
    SQL_USER_SESSIONS,
    q_hopping_window_counts,
    q_hourly_moving_avg,
    q_user_sessions,
)  # noqa: F401
from .set_ops import (
    SQL_DISTINCT_SOURCES,
    SQL_LINEITEM_TOPK,
    q_distinct_sources,
    q_lineitem_topk,
)  # noqa: F401
from .similarity import SQL_COSINE_TOPK, q_ann_ivf_topk, q_cosine_topk  # noqa: F401
from .text_analysis import (
    SQL_DOC_FINGERPRINT,
    SQL_DOC_QUALITY,
    SQL_DOC_TOKEN_STATS,
    q_doc_fingerprint,
    q_doc_quality,
    q_doc_token_stats,
)  # noqa: F401
from .w11_csv_footprint import (
    SQL_CSV_INGEST_STATS,
    SQL_PARQUET_FOOTPRINT_AUDIT,
    q_csv_ingest_stats,
    q_parquet_footprint_audit,
)  # noqa: F401
from .w12_bootstrap_dp import (
    SQL_DP_EVENT_COUNTS,
    SQL_POISSON_BOOTSTRAP_CI,
    q_dp_event_counts,
    q_poisson_bootstrap_ci,
)  # noqa: F401
from .w13_ccnet import SQL_CCNET_PERPLEXITY_BUCKETS, q_ccnet_perplexity_buckets  # noqa: F401
from .w14_negsample import SQL_NEGATIVE_SAMPLING_TABLE, q_negative_sampling_table  # noqa: F401
from .w15_seqmine_neyman import (
    SQL_LABEL_PROPAGATION,
    SQL_NEYMAN_SAMPLE,
    SQL_PARTITION_DIGEST,
    SQL_PHRASE_SEARCH,
    SQL_SEQUENCE_MINING_TRIPLES,
    q_label_propagation,
    q_neyman_sample,
    q_partition_digest,
    q_phrase_search,
    q_sequence_mining_triples,
)  # noqa: F401
from .w16_expectation_jl import (
    SQL_DEGREE_ASSORTATIVITY,
    SQL_EXPECTATION_AUDIT,
    SQL_JL_PROJECTION_AUDIT,
    SQL_SUCCESSIVE_HALVING,
    q_degree_assortativity,
    q_expectation_audit,
    q_jl_projection_audit,
    q_successive_halving,
)  # noqa: F401
from .w17_lcp_audit import (
    SQL_ADJACENT_LCP_AUDIT,
    SQL_BRADLEY_TERRY_STEP,
    q_adjacent_lcp_audit,
    q_bradley_terry_step,
)  # noqa: F401
from .w18_walks_pareto import (
    SQL_PARETO_LAYERS,
    SQL_RANDOM_WALK_CORPUS,
    q_pareto_layers,
    q_random_walk_corpus,
)  # noqa: F401
from .w19_eliasfano import (
    SQL_ELIAS_FANO_AUDIT,
    SQL_ENCODING_ADVISOR,
    q_elias_fano_audit,
    q_encoding_advisor,
)  # noqa: F401
from .w20_gorilla_ql import (
    SQL_DIFF_IN_DIFF,
    SQL_DIRICHLET_QL_RETRIEVAL,
    SQL_GORILLA_TIMESTAMP_AUDIT,
    q_diff_in_diff,
    q_dirichlet_ql_retrieval,
    q_gorilla_timestamp_audit,
)  # noqa: F401
from .w21_softdedup_kfold import (
    SQL_SOFT_DEDUP_WEIGHTS,
    SQL_STRATIFIED_KFOLD,
    q_soft_dedup_weights,
    q_stratified_kfold,
)  # noqa: F401
from .w22_tiles_vad import (
    SQL_AUDIO_VAD_ENERGY,
    SQL_DEMOGRAPHIC_PARITY,
    SQL_IMAGE_TILE_ENTROPY,
    q_audio_vad_energy,
    q_demographic_parity,
    q_image_tile_entropy,
)  # noqa: F401
from .w23_motif_binseg import (
    SQL_BINARY_SEGMENTATION,
    SQL_MOTIF_DISCOVERY,
    q_binary_segmentation,
    q_motif_discovery,
)  # noqa: F401
from .w24_lloyd_kappa import (
    SQL_COHENS_KAPPA,
    SQL_LLOYD_STEP_QUANTIZED,
    q_cohens_kappa,
    q_lloyd_step_quantized,
)  # noqa: F401
from .w25_champion_slo import (
    SQL_BURN_RATE_ALERTS,
    SQL_CHAMPION_LISTS,
    SQL_LOSO_QUALITY_DELTA,
    q_burn_rate_alerts,
    q_champion_lists,
    q_loso_quality_delta,
)  # noqa: F401
from .w26_wasserstein import (
    SQL_STREAMING_MOMENTS,
    SQL_VOCAB_ID_ASSIGNMENT,
    SQL_WASSERSTEIN_1D,
    q_streaming_moments,
    q_vocab_id_assignment,
    q_wasserstein_1d,
)  # noqa: F401
from .w27_nucleus_dp import (
    SQL_DP_CLIPPED_MEAN,
    SQL_NUCLEUS_VOCAB_CUT,
    q_dp_clipped_mean,
    q_nucleus_vocab_cut,
)  # noqa: F401
from .w28_rocchio import SQL_ROCCHIO_EXPANSION, q_rocchio_expansion  # noqa: F401
from .w29_dpdegree_canonical import (
    SQL_CANONICAL_SELECTION,
    SQL_DP_DEGREE_HISTOGRAM,
    q_canonical_selection,
    q_dp_degree_histogram,
)  # noqa: F401
from .w30_mrr_richclub import (
    SQL_MRR_EVAL,
    SQL_RICH_CLUB_COEFFICIENT,
    q_mrr_eval,
    q_rich_club_coefficient,
)  # noqa: F401
from .w31_ppjoin_markov import (
    SQL_MARKOV_STATIONARY,
    SQL_PREFIX_FILTER_JOIN,
    q_markov_stationary,
    q_prefix_filter_join,
)  # noqa: F401
from .w32_es_sample import (
    SQL_SELECTIVITY_INDEPENDENCE_AUDIT,
    SQL_WEIGHTED_SAMPLE_ES,
    q_selectivity_independence_audit,
    q_weighted_sample_es,
)  # noqa: F401
from .w33_shapley_tokenbucket import (
    SQL_SHAPLEY_ATTRIBUTION,
    SQL_TOKEN_BUCKET_AUDIT,
    q_shapley_attribution,
    q_token_bucket_audit,
)  # noqa: F401
from .w34_lru_hill import (
    SQL_HILL_TAIL_INDEX,
    SQL_LRU_CACHE_AUDIT,
    q_hill_tail_index,
    q_lru_cache_audit,
)  # noqa: F401
from .w35_skipgram import SQL_SKIPGRAM_PAIRS, q_skipgram_pairs  # noqa: F401
from .w37_truss_q2_q12 import (
    SQL_EDGE_SUPPORT_HIST,
    SQL_JSONL_INGEST_STATS,
    SQL_LATE_SHIPMENTS,
    SQL_MIN_COST_SUPPLIER,
    ensure_documents_jsonl,
    q_edge_support_hist,
    q_jsonl_ingest_stats,
    q_late_shipments,
    q_min_cost_supplier,
)  # noqa: F401
from .w38_tpch_final import (
    SQL_DOMINANT_PART_SUPPLIERS,
    SQL_TOP_REVENUE_SUPPLIER,
    SQL_WAITING_SUPPLIERS,
    q_dominant_part_suppliers,
    q_top_revenue_supplier,
    q_waiting_suppliers,
)  # noqa: F401
from .w39_cms_ph import (
    SQL_COUNT_MIN_HEAVY_HITTERS,
    SQL_CUMULATIVE_DISTINCT_USERS,
    SQL_PAGE_HINKLEY_ALARMS,
    ensure_cms_buckets_parquet,
    q_count_min_heavy_hitters,
    q_cumulative_distinct_users,
    q_page_hinkley_alarms,
)  # noqa: F401
from .w40_jaro_holt import (
    SQL_HOLT_LINEAR_FORECAST,
    SQL_JARO_WINKLER_LINKAGE,
    ensure_jw_names_parquet,
    q_holt_linear_forecast,
    q_jaro_winkler_linkage,
)  # noqa: F401
from .w41_phrase_zorder import (
    SQL_PHRASE_SEARCH,
    SQL_ZORDER_LAYOUT_AUDIT,
    q_phrase_search,
    q_zorder_layout_audit,
)  # noqa: F401
from .w42_ols_hhi import (
    SQL_HERFINDAHL_BY_NATION,
    SQL_OLS_PRICE_TREND,
    SQL_PERCENT_RANK_PRICES,
    q_herfindahl_by_nation,
    q_ols_price_trend,
    q_percent_rank_prices,
)  # noqa: F401
from .w43_agg_shapes import (
    SQL_BUTTERFLY_COUNTS,
    SQL_EVENTS_UNPIVOT_CHECK,
    SQL_ORDER_GAP_EXTREMES,
    SQL_STRING_AGG_TOP_TERMS,
    ensure_events_wide_parquet,
    q_butterfly_counts,
    q_events_unpivot_check,
    q_order_gap_extremes,
    q_string_agg_top_terms,
)  # noqa: F401
from .w44_wordpiece_fk import (
    SQL_BITMAP_CONTAINER_PLAN,
    SQL_FK_INFERENCE_AUDIT,
    SQL_WORDPIECE_TOP_MERGES,
    q_bitmap_container_plan,
    q_fk_inference_audit,
    q_wordpiece_top_merges,
)  # noqa: F401
from .w45_eval_sessions import (
    SQL_LINKAGE_QUALITY_EVAL,
    SQL_SESSION_GAP_CURVE,
    q_linkage_quality_eval,
    q_session_gap_curve,
)  # noqa: F401
from .w46_loops_fano import (
    SQL_EQUIDEPTH_PRICE_HISTOGRAM,
    SQL_FANO_BURSTINESS,
    SQL_NGRAM_LOOP_DETECT,
    q_equidepth_price_histogram,
    q_fano_burstiness,
    q_ngram_loop_detect,
)  # noqa: F401
from .w47_stump_vocab import (
    SQL_DECISION_STUMP_SPLIT,
    SQL_VOCAB_PRUNING_CURVE,
    q_decision_stump_split,
    q_vocab_pruning_curve,
)  # noqa: F401
from .w48_keyness_lcs import (
    SQL_KEYNESS_ODDS_RATIO,
    SQL_LCS_EVENT_SEQUENCES,
    ensure_lcs_ref_parquet,
    q_keyness_odds_ratio,
    q_lcs_event_sequences,
)  # noqa: F401
from .w49_infotheory import (
    SQL_CONDITIONAL_ENTROPY_RATE,
    SQL_MUTUAL_INFORMATION_LANG_SOURCE,
    q_conditional_entropy_rate,
    q_mutual_information_lang_source,
)  # noqa: F401
from .w50_survival_keys import (
    SQL_CANDIDATE_KEY_AUDIT,
    SQL_KAPLAN_MEIER_SURVIVAL,
    q_candidate_key_audit,
    q_kaplan_meier_survival,
)  # noqa: F401
from .w51_huffman_audio import (
    SQL_AUDIO_CLIPPING_AUDIT,
    SQL_HUFFMAN_CODE_LENGTHS,
    ensure_audio_clip_ref_parquet,
    ensure_huffman_ref_parquet,
    q_audio_clipping_audit,
    q_huffman_code_lengths,
)  # noqa: F401
from .w52_itemsim_fresh import (
    SQL_FRESHNESS_AUDIT,
    SQL_ITEM_SIMILARITY_TOPK,
    q_freshness_audit,
    q_item_similarity_topk,
)  # noqa: F401
from .w54_assort_index import (
    SQL_DEGREE_ASSORTATIVITY,
    SQL_PRICE_INDEX_LASPEYRES,
    q_degree_assortativity,
    q_price_index_laspeyres,
)  # noqa: F401
from .w55_containment_mase import (
    SQL_FORECAST_BASELINE_COMPARE,
    SQL_SHINGLE_CONTAINMENT_TOPK,
    q_forecast_baseline_compare,
    q_shingle_containment_topk,
)  # noqa: F401
from .w56_simpson_inspect import (
    SQL_INSPECTION_PARADOX_AUDIT,
    SQL_SIMPSONS_PARADOX_CHECK,
    q_inspection_paradox_audit,
    q_simpsons_paradox_check,
)  # noqa: F401
from .w57_diversity import (
    SQL_INVERSE_SIMPSON_DIVERSITY,
    SQL_THEIL_INDEX_SUPPLIER_REVENUE,
    SQL_VOCAB_RICHNESS_CHAO1,
    q_inverse_simpson_diversity,
    q_theil_index_supplier_revenue,
    q_vocab_richness_chao1,
)  # noqa: F401
from .w58_rank_corr import (
    SQL_KENDALL_TAU_PRICE_SIZE,
    SQL_SPEARMAN_RHO_PRICE_SIZE,
    q_kendall_tau_price_size,
    q_spearman_rho_price_size,
)  # noqa: F401
from .w59_logrank_activity import (
    SQL_ACTIVITY_TRANSITION_MATRIX,
    SQL_LOGRANK_GROUPS,
    q_activity_transition_matrix,
    q_logrank_groups,
)  # noqa: F401
from .w60_lorenz_lindley import (
    SQL_LINDLEY_QUEUE_AUDIT,
    SQL_LORENZ_CURVE_SUPPLIERS,
    q_lindley_queue_audit,
    q_lorenz_curve_suppliers,
)  # noqa: F401
from .w61_eb_cuped import (
    SQL_CUPED_ADJUSTMENT,
    SQL_EB_SHRUNK_RATES,
    q_cuped_adjustment,
    q_eb_shrunk_rates,
)  # noqa: F401
from .w62_trend_runs import (
    SQL_MANN_KENDALL_TREND,
    SQL_RUNS_TEST_AUDIT,
    q_mann_kendall_trend,
    q_runs_test_audit,
)  # noqa: F401
from .w63_robust_stats import (
    SQL_HODGES_LEHMANN_LOCATION,
    SQL_SIEGEL_REPEATED_MEDIANS,
    q_hodges_lehmann_location,
    q_siegel_repeated_medians,
)  # noqa: F401
from .w64_bridge_benford import (
    SQL_BENFORD_MAD_GRADE,
    SQL_REVENUE_BRIDGE_DECOMPOSITION,
    q_benford_mad_grade,
    q_revenue_bridge_decomposition,
)  # noqa: F401
from .w65_apportion import (
    SQL_SEAT_APPORTIONMENT_COMPARE,
    q_seat_apportionment_compare,
)  # noqa: F401
from .w66_portfolio_ccf import (
    SQL_CROSS_CORRELATION_SEGMENTS,
    SQL_MIN_VARIANCE_WEIGHTS,
    q_cross_correlation_segments,
    q_min_variance_weights,
)  # noqa: F401
from .w67_knapsack_gaps import (
    SQL_COVERAGE_GAP_AUDIT,
    SQL_GREEDY_KNAPSACK_PLAN,
    q_coverage_gap_audit,
    q_greedy_knapsack_plan,
)  # noqa: F401
from .w68_control_pot import (
    SQL_CONTROL_CHART_VIOLATIONS,
    SQL_POT_EXCEEDANCE_CLUSTERS,
    q_control_chart_violations,
    q_pot_exceedance_clusters,
)  # noqa: F401
from .w69_hierarchy import (
    SQL_HIERARCHY_ROLLUP_SHARES,
    q_hierarchy_rollup_shares,
)  # noqa: F401
from .w70_ipc_source import (
    SQL_IPC_INGEST_STATS,
    ensure_documents_ipc,
    q_ipc_ingest_stats,
)  # noqa: F401
from .w71_setcover import (
    SQL_GREEDY_SET_COVER_SOURCES,
    q_greedy_set_cover_sources,
)  # noqa: F401
from .w72_lm_orders import (
    SQL_NGRAM_ORDER_COMPARE,
    q_ngram_order_compare,
)  # noqa: F401
from .w73_power_aspect import (
    SQL_ABTEST_POWER_MDE,
    SQL_MEDIA_ASPECT_RATIO_AUDIT,
    q_abtest_power_mde,
    q_media_aspect_ratio_audit,
)  # noqa: F401
from .w74_motion_digits import (
    SQL_NEWCOMB_SECOND_DIGIT,
    SQL_VIDEO_MOTION_ENERGY,
    q_newcomb_second_digit,
    q_video_motion_energy,
)  # noqa: F401
from .w75_fd_fanout import (
    SQL_FK_FANOUT_PROFILE,
    SQL_FREEDMAN_DIACONIS_HISTOGRAM,
    q_fk_fanout_profile,
    q_freedman_diaconis_histogram,
)  # noqa: F401
from .w76_abc_tiers import (
    SQL_ABC_XYZ_MATRIX,
    SQL_VALUE_TIER_MIGRATION,
    q_abc_xyz_matrix,
    q_value_tier_migration,
)  # noqa: F401
from .w36_tpch_completion import (
    SQL_BRACKETED_REVENUE,
    SQL_GLOBAL_SALES_OPPORTUNITY,
    SQL_IMPORTANT_PARTS,
    SQL_LARGE_VOLUME_CUSTOMERS,
    SQL_MARKET_SHARE,
    SQL_PRODUCT_PROFIT,
    SQL_PROMO_REVENUE,
    SQL_SUPPLIER_VARIETY,
    SQL_VOLUME_SHIPPING,
    q_bracketed_revenue,
    q_global_sales_opportunity,
    q_important_parts,
    q_large_volume_customers,
    q_market_share,
    q_product_profit,
    q_promo_revenue,
    q_supplier_variety,
    q_volume_shipping,
)  # noqa: F401
from .webclean import (
    SQL_C4_LINE_FILTER,
    SQL_GOPHER_QUALITY_RULES,
    SQL_GOPHER_REPETITION,
    ensure_web_docs_parquet,
    q_c4_line_filter,
    q_gopher_quality_rules,
    q_gopher_repetition,
)  # noqa: F401

REGISTRY: dict[str, QuerySpec] = {
    "doremi_mixture_step": QuerySpec(
        q_doremi_mixture_step,
        SQL_DOREMI_MIXTURE_STEP,
        "DoReMi-style mixture reweighting: integer-unat excess loss, quantized tilt",
    ),
    "sliding_p95_value": QuerySpec(
        q_sliding_p95_value,
        SQL_SLIDING_P95_VALUE,
        "exact sliding-24h p95 per hour via fanned histogram rows",
    ),
    "seasonal_dow_decompose": QuerySpec(
        q_seasonal_dow_decompose,
        SQL_SEASONAL_DOW_DECOMPOSE,
        "additive day-of-week decomposition with robust residual MAD",
    ),
    "quantile_normalize": QuerySpec(
        q_quantile_normalize,
        SQL_QUANTILE_NORMALIZE,
        "quantile normalization onto the global distribution, exact order stats",
    ),
    "link_prediction_jaccard": QuerySpec(
        q_link_prediction_jaccard,
        SQL_LINK_PREDICTION_JACCARD,
        "neighbor-Jaccard link prediction over the co-purchase graph, top-50",
    ),
    "watermark_late_events": QuerySpec(
        q_watermark_late_events,
        SQL_WATERMARK_LATE_EVENTS,
        "streaming watermark late-data audit via distributed prefix-max",
    ),
    "schema_drift_audit": QuerySpec(
        q_schema_drift_audit,
        SQL_SCHEMA_DRIFT_AUDIT,
        "per-column profile drift (rows/nulls/exact-distinct/mean) across halves",
    ),
    "l_diversity_audit": QuerySpec(
        q_l_diversity_audit,
        SQL_L_DIVERSITY_AUDIT,
        "l-diversity privacy audit over QI classes (first-order priority sensitive)",
    ),
    "bloom_fp_audit": QuerySpec(
        q_bloom_fp_audit,
        SQL_BLOOM_FP_AUDIT,
        "bloom-filter false-positive rate vs theoretical estimate (m=16k, k=3)",
    ),
    "group_sequential_ab": QuerySpec(
        q_group_sequential_ab,
        SQL_GROUP_SEQUENTIAL_AB,
        "group-sequential A/B boundary replay (OBF-style, integer accumulators)",
    ),
    "video_scene_cuts": QuerySpec(
        q_video_scene_cuts,
        SQL_VIDEO_SCENE_CUTS,
        "scene-cut detection via real VID0 decode vs synthesis-time truth",
    ),
    "unigram_lm_segment": QuerySpec(
        q_unigram_lm_segment,
        SQL_UNIGRAM_LM_SEGMENT,
        "unigram-LM Viterbi subword segmentation, integer unats, per-source totals",
    ),
    "margin_knn_bitext": QuerySpec(
        q_margin_knn_bitext,
        SQL_MARGIN_KNN_BITEXT,
        "margin-based (ratio) kNN pair mining, mutual-best cross-set pairs",
    ),
    "kcore_decomposition": QuerySpec(
        q_kcore_decomposition,
        SQL_KCORE_DECOMPOSITION,
        "k-core decomposition: distributed h-index fixpoint vs Matula-Beck oracle",
    ),
    "compaction_plan": QuerySpec(
        q_compaction_plan_checked,
        SQL_COMPACTION_PLAN,
        "small-file compaction planner: FFD bin packing over grouped cell manifest",
    ),
    "mannwhitney_u": QuerySpec(
        q_mannwhitney_u,
        SQL_MANNWHITNEY_U,
        "tie-corrected Mann-Whitney U one-vs-rest per event type (rank-free histogram)",
    ),
    "theilsen_trend": QuerySpec(
        q_theilsen_trend,
        SQL_THEILSEN_TREND,
        "Theil-Sen robust slope per event type (median of pairwise daily slopes)",
    ),
    "ks_fdr_audit": QuerySpec(
        q_ks_fdr_audit,
        SQL_KS_FDR_AUDIT,
        "per-source KS drift screen with Benjamini-Hochberg FDR adjustment",
    ),
    "conformal_interval": QuerySpec(
        q_conformal_interval,
        SQL_CONFORMAL_INTERVAL,
        "split-conformal residual quantile + finite-sample coverage audit",
    ),
    "ips_policy_value": QuerySpec(
        q_ips_policy_value,
        SQL_IPS_POLICY_VALUE,
        "IPS off-policy evaluation of a deterministic target policy, per-action terms",
    ),
    "interval_overlap_join": QuerySpec(
        q_interval_overlap_join,
        SQL_INTERVAL_OVERLAP_JOIN,
        "grid-bucketed interval/range overlap self-join (concurrent user activity)",
    ),
    "upsert_merge": QuerySpec(
        q_upsert_merge,
        SQL_UPSERT_MERGE,
        "CDC MERGE: snapshot + change batch, last-writer-wins, tombstone deletes",
    ),
    "symspell_edit1_join": QuerySpec(
        q_symspell_edit1_join,
        SQL_SYMSPELL_EDIT1_JOIN,
        "SymSpell deletion-neighborhood edit-1 join (exact recall) vs brute oracle",
    ),
    "feistel_permutation": QuerySpec(
        q_feistel_permutation,
        SQL_FEISTEL_PERMUTATION,
        "format-preserving Feistel epoch shuffle: seekable bijection + rank collapse",
    ),
    "media_decode_real": QuerySpec(
        q_media_decode_real,
        SQL_MEDIA_DECODE_REAL,
        "real PNG/WAV/VID0 decode via actor pool vs synthesis-time ground truth",
    ),
    "image_content_dedup": QuerySpec(
        q_image_content_dedup,
        SQL_IMAGE_CONTENT_DEDUP,
        "decoded-pixel-digest dedup of byte-different PNG re-encodings",
    ),
    "audio_fingerprint_dedup": QuerySpec(
        q_audio_fingerprint_dedup,
        SQL_AUDIO_FINGERPRINT_DEDUP,
        "gain-invariant acoustic fingerprint dedup of re-mastered WAVs",
    ),
    "video_content_dedup": QuerySpec(
        q_video_content_dedup,
        SQL_VIDEO_CONTENT_DEDUP,
        "decoded-frame-digest dedup of re-encoded video containers",
    ),
    "semantic_dedup": QuerySpec(
        q_semantic_dedup,
        SQL_SEMANTIC_DEDUP,
        "SemDeDup: kmeans clusters, in-cluster cosine near-dup keep-min",
    ),
    "range_partitioned_sort": QuerySpec(
        q_range_partitioned_sort,
        SQL_RANGE_PARTITIONED_SORT,
        "range-partitioned global sort: exact quantile bounds, sorted range files",
    ),
    "media_resize_stats": QuerySpec(
        q_media_resize_stats,
        SQL_MEDIA_RESIZE_STATS,
        "decode → nearest-neighbor resize → re-encode vs synthesis-time truth",
    ),
    "video_frame_decode": QuerySpec(
        q_video_frame_decode,
        SQL_VIDEO_FRAME_DECODE,
        "frame-sample + per-frame PNG decode vs persisted per-frame truth",
    ),
    "return_rate_monthly": QuerySpec(
        q_return_rate_monthly,
        SQL_RETURN_RATE_MONTHLY,
        "return-rate trend per ship month",
    ),
    "weekend_lift": QuerySpec(
        q_weekend_lift,
        SQL_WEEKEND_LIFT,
        "weekend activity lift per event type (epoch-day DOW arithmetic)",
    ),
    "price_p99_exact": QuerySpec(
        q_price_p99_exact,
        SQL_PRICE_P99_EXACT,
        "exact p50/p95/p99 of a near-unique column via two-phase refinement",
    ),
    "balance_anova_f": QuerySpec(
        q_balance_anova_f,
        SQL_BALANCE_ANOVA_F,
        "one-way ANOVA F: balance means across segments from moment partials",
    ),
    "doc_length_quality_corr": QuerySpec(
        q_doc_length_quality_corr,
        SQL_DOC_LENGTH_QUALITY_CORR,
        "Pearson r between doc length and stopword rate (one moments pass)",
    ),
    "priority_mix_chi2": QuerySpec(
        q_priority_mix_chi2,
        SQL_PRIORITY_MIX_CHI2,
        "chi2 drift of the year × priority contingency table",
    ),
    "acf_multi_lag": QuerySpec(
        q_acf_multi_lag,
        SQL_ACF_MULTI_LAG,
        "ACF at lags 1-5 of the global hourly count series",
    ),
    "orders_seasonal_share": QuerySpec(
        q_orders_seasonal_share,
        SQL_ORDERS_SEASONAL_SHARE,
        "seasonality index: month share of year order count",
    ),
    "benford_prices": QuerySpec(
        q_benford_prices,
        SQL_BENFORD_PRICES,
        "Benford first-digit audit of order totals vs log10(1+1/d)",
    ),
    "top_supplier_per_nation": QuerySpec(
        q_top_supplier_per_nation,
        SQL_TOP_SUPPLIER_PER_NATION,
        "grouped argmax: highest-balance supplier per nation",
    ),
    "balance_ks_test": QuerySpec(
        q_balance_ks_test,
        SQL_BALANCE_KS_TEST,
        "two-sample Kolmogorov–Smirnov D between balance distributions (exact, histogram)",
    ),
    "peak_concurrent_sessions": QuerySpec(
        q_peak_concurrent_sessions,
        SQL_PEAK_CONCURRENT_SESSIONS,
        "interval stabbing: peak simultaneous gap-sessions and when",
    ),
    "charclass_profile": QuerySpec(
        q_charclass_profile,
        SQL_CHARCLASS_PROFILE,
        "character-class share profile per source (encoding health)",
    ),
    "purchase_value_drift": QuerySpec(
        q_purchase_value_drift,
        SQL_PURCHASE_VALUE_DRIFT,
        "first→last purchase value drift per user (argmin/argmax payload merge)",
    ),
    "duplicate_invoices": QuerySpec(
        q_duplicate_invoices,
        SQL_DUPLICATE_INVOICES,
        "same-customer same-amount orders within 7 days (fraud screen)",
    ),
    "stale_parts_by_brand": QuerySpec(
        q_stale_parts_by_brand,
        SQL_STALE_PARTS_BY_BRAND,
        "parts with no final-year shipment per brand (big-big anti co-group)",
    ),
    "order_price_ohlc": QuerySpec(
        q_order_price_ohlc,
        SQL_ORDER_PRICE_OHLC,
        "monthly OHLC via mergeable argmin/argmax-with-payload partials",
    ),
    "mixture_schedule": QuerySpec(
        q_mixture_schedule,
        SQL_MIXTURE_SCHEDULE,
        "weighted-interleave training mixture schedule (packed-rank construction)",
    ),
    "top_parts_per_segment": QuerySpec(
        q_top_parts_per_segment,
        SQL_TOP_PARTS_PER_SEGMENT,
        "grouped top-3 parts per market segment after a join chain",
    ),
    "cohort_ltv": QuerySpec(
        q_cohort_ltv,
        SQL_COHORT_LTV,
        "cohort LTV: avg cumulative revenue by months-since-first-order",
    ),
    "heaps_law_fit": QuerySpec(
        q_heaps_law_fit,
        SQL_HEAPS_LAW_FIT,
        "Heaps'-law vocabulary-growth exponent across sources",
    ),
    "quality_gate_sweep": QuerySpec(
        q_quality_gate_sweep,
        SQL_QUALITY_GATE_SWEEP,
        "min-words gate sensitivity sweep: five thresholds in one pass",
    ),
    "wau_retention": QuerySpec(
        q_wau_retention,
        SQL_WAU_RETENTION,
        "week-over-week retention from distinct (user, week) pairs",
    ),
    "boilerplate_sentences": QuerySpec(
        q_boilerplate_sentences,
        SQL_BOILERPLATE_SENTENCES,
        "repeated-sentence boilerplate detection, top-10",
    ),
    "hapax_docs_per_source": QuerySpec(
        q_hapax_docs_per_source,
        SQL_HAPAX_DOCS_PER_SOURCE,
        "docs containing corpus-hapax tokens per source (term co-group join-back)",
    ),
    "anomaly_audit": QuerySpec(
        q_anomaly_audit,
        SQL_ANOMALY_AUDIT,
        "cross-table anomaly sweep: negative / null / future-timestamp counts",
    ),
    "journey_patterns": QuerySpec(
        q_journey_patterns,
        SQL_JOURNEY_PATTERNS,
        "top user-journey prefixes (first 5 event types joined per user)",
    ),
    "k_anonymity_audit": QuerySpec(
        q_k_anonymity_audit,
        SQL_K_ANONYMITY_AUDIT,
        "k-anonymity audit over quasi-identifier classes (k=5)",
    ),
    "lineitem_corr_matrix": QuerySpec(
        q_lineitem_corr_matrix,
        SQL_LINEITEM_CORR_MATRIX,
        "pairwise Pearson matrix from one mergeable-moments pass",
    ),
    "basket_lift": QuerySpec(
        q_basket_lift,
        SQL_BASKET_LIFT,
        "association rules: confidence + lift for top-20 co-purchase pairs",
    ),
    "user_survival_curve": QuerySpec(
        q_user_survival_curve,
        SQL_USER_SURVIVAL_CURVE,
        "activity-span survival curve (fraction of users reaching k days)",
    ),
    "new_vs_returning_revenue": QuerySpec(
        q_new_vs_returning_revenue,
        SQL_NEW_VS_RETURNING_REVENUE,
        "monthly revenue split: new vs returning customers (one custkey co-group)",
    ),
    "fulfillment_latency_hist": QuerySpec(
        q_fulfillment_latency_hist,
        SQL_FULFILLMENT_LATENCY_HIST,
        "order→first-ship latency histogram (orderkey co-group, day diff)",
    ),
    "scd2_history": QuerySpec(
        q_scd2_history,
        SQL_SCD2_HISTORY,
        "CDC → SCD2 validity-range history per user (LEAD construction)",
    ),
    "tail_expected_shortfall": QuerySpec(
        q_tail_expected_shortfall,
        SQL_TAIL_EXPECTED_SHORTFALL,
        "p99 + expected shortfall per group from one histogram pass",
    ),
    "returned_item_customers": QuerySpec(
        q_returned_item_customers,
        SQL_RETURNED_ITEM_CUSTOMERS,
        "TPC-H Q10 shape: returned-revenue per customer, top-20 with nation",
    ),
    "ttr_per_source": QuerySpec(
        q_ttr_per_source,
        SQL_TTR_PER_SOURCE,
        "lexical diversity: avg type-token ratio per source",
    ),
    "session_conversion_rate": QuerySpec(
        q_session_conversion_rate,
        SQL_SESSION_CONVERSION_RATE,
        "within-session view→purchase conversion rate",
    ),
    "forecast_revenue_change": QuerySpec(
        q_forecast_revenue_change,
        SQL_FORECAST_REVENUE_CHANGE,
        "TPC-H Q6 shape: fully-pushed-down filtered scan + scalar sum",
    ),
    "embedding_quantization_error": QuerySpec(
        q_embedding_quantization_error,
        SQL_EMBEDDING_QUANTIZATION_ERROR,
        "int8 symmetric quantization reconstruction-error audit per label",
    ),
    "weighted_median_price": QuerySpec(
        q_weighted_median_price,
        SQL_WEIGHTED_MEDIAN_PRICE,
        "quantity-weighted median price per return flag (weighted-quantile histogram)",
    ),
    "winsorized_mean_per_type": QuerySpec(
        q_winsorized_mean_per_type,
        SQL_WINSORIZED_MEAN_PER_TYPE,
        "winsorized (p5/p95-clipped) mean per group from the one-pass histogram",
    ),
    "filter_attribution": QuerySpec(
        q_filter_attribution,
        SQL_FILTER_ATTRIBUTION,
        "curation filter-funnel attribution: per-gate failure bitmask counts",
    ),
    "custdist": QuerySpec(
        q_custdist,
        SQL_CUSTDIST,
        "TPC-H Q13 shape: per-customer order-count histogram incl. zeros",
    ),
    "total_active_time": QuerySpec(
        q_total_active_time,
        SQL_TOTAL_ACTIVE_TIME,
        "total in-session active seconds per user over 30-min-gap sessions, top-10",
    ),
    "skyline_orders": QuerySpec(
        q_skyline_orders,
        SQL_SKYLINE_ORDERS,
        "2-D Pareto skyline: per-block frontier prune + frontier-of-frontiers",
    ),
    "longest_streaks": QuerySpec(
        q_longest_streaks,
        SQL_LONGEST_STREAKS,
        "gaps-and-islands longest consecutive-day streak per user, top-10",
    ),
    "rolling_active_users": QuerySpec(
        q_rolling_active_users,
        SQL_ROLLING_ACTIVE_USERS,
        "exact rolling 7-day distinct users via per-user interval diff events",
    ),
    "churn_counts": QuerySpec(
        q_churn_counts,
        SQL_CHURN_COUNTS,
        "churn by first-touch cohort: packed arg-min + watermark cutoff",
    ),
    "orders_growth_wow": QuerySpec(
        q_orders_growth_wow,
        SQL_ORDERS_GROWTH_WOW,
        "week-over-week growth: weekly count + LAG pct-change window",
    ),
    "session_depth_histogram": QuerySpec(
        q_session_depth_histogram,
        SQL_SESSION_DEPTH_HISTOGRAM,
        "events-per-session distribution over the gap sessionizer",
    ),
    "zipf_slope": QuerySpec(
        q_zipf_slope,
        SQL_ZIPF_SLOPE,
        "corpus Zipf exponent: top-500 term frequencies, log-log OLS slope",
    ),
    "revenue_pareto": QuerySpec(
        q_revenue_pareto,
        SQL_REVENUE_PARETO,
        "Pareto 80/20: top-20% customers' revenue share via distributed rank",
    ),
    "curation_pipeline": QuerySpec(
        q_curation_pipeline,
        SQL_CURATION_PIPELINE,
        "end-to-end curation: normalize → quality gate → dedup → langid → partitioned sink",
    ),
    "frequent_triples": QuerySpec(
        q_frequent_triples,
        SQL_FREQUENT_TRIPLES,
        "a-priori 3-itemsets: frequent-pair broadcast prunes triple generation",
    ),
    "bounce_rate": QuerySpec(
        q_bounce_rate,
        SQL_BOUNCE_RATE,
        "session-quality rollup over the gap sessionizer (bounce rate, avg events)",
    ),
    "centroid_separation": QuerySpec(
        q_centroid_separation,
        SQL_CENTROID_SEPARATION,
        "silhouette-lite cluster separation: own vs nearest-other centroid distance",
    ),
    "order_priority_check": QuerySpec(
        q_order_priority_check,
        SQL_ORDER_PRIORITY_CHECK,
        "TPC-H Q4 shape: EXISTS semi via per-order max pre-agg + hash join",
    ),
    "small_quantity_revenue": QuerySpec(
        q_small_quantity_revenue,
        SQL_SMALL_QUANTITY_REVENUE,
        "TPC-H Q17 shape: fact joins back to its own per-key aggregate",
    ),
    "rfm_segments": QuerySpec(
        q_rfm_segments,
        SQL_RFM_SEGMENTS,
        "RFM quintile segmentation: per-user reduce + 3× exact distributed NTILE",
    ),
    "shipping_priority": QuerySpec(
        q_shipping_priority,
        SQL_SHIPPING_PRIORITY,
        "TPC-H Q3 shape: segment+date filtered 3-way join, order-level pre-agg, top-10",
    ),
    "new_users_daily": QuerySpec(
        q_new_users_daily,
        SQL_NEW_USERS_DAILY,
        "first-seen cohort counts: per-user min-day reduce, day-level count",
    ),
    "event_trigrams": QuerySpec(
        q_event_trigrams,
        SQL_EVENT_TRIGRAMS,
        "per-user ordered event-type trigram mining, global top-20",
    ),
    "conversion_latency": QuerySpec(
        q_conversion_latency,
        SQL_CONVERSION_LATENCY,
        "first-view→first-purchase latency: conditional min reduce + scalar moments",
    ),
    "value_gini": QuerySpec(
        q_value_gini,
        SQL_VALUE_GINI,
        "exact per-group Gini from the one-pass cent histogram (no sort, no raw shuffle)",
    ),
    "bigram_lm_nll": QuerySpec(
        q_bigram_lm_nll,
        SQL_BIGRAM_LM_NLL,
        "add-one-smoothed bigram LM: per-source avg negative log-likelihood",
    ),
    "value_boxplot": QuerySpec(
        q_value_boxplot,
        SQL_VALUE_BOXPLOT,
        "boxplot profile per group from one histogram pass (disc quartiles + Tukey fences)",
    ),
    "nation_revenue_share": QuerySpec(
        q_nation_revenue_share,
        SQL_NATION_REVENUE_SHARE,
        "percent-of-total window: nation share of region revenue",
    ),
    "fk_integrity_audit": QuerySpec(
        q_fk_integrity_audit,
        SQL_FK_INTEGRITY_AUDIT,
        "referential-integrity / coverage audit: orphan keys+rows per relation",
    ),
    "hourly_autocorr": QuerySpec(
        q_hourly_autocorr,
        SQL_HOURLY_AUTOCORR,
        "lag-1 autocorrelation of hourly event counts per type (corr vs LAG oracle)",
    ),
    "source_vocab_jaccard": QuerySpec(
        q_source_vocab_jaccard,
        SQL_SOURCE_VOCAB_JACCARD,
        "pairwise source-vocabulary Jaccard via term bitmask histogram",
    ),
    "orders_vs_ships_daily": QuerySpec(
        q_orders_vs_ships_daily,
        SQL_ORDERS_VS_SHIPS_DAILY,
        "FULL OUTER join reconciliation: daily orders vs shipments",
    ),
    "copurchase_degree_hist": QuerySpec(
        q_copurchase_degree_hist,
        SQL_COPURCHASE_DEGREE_HIST,
        "co-purchase graph degree distribution (graph skew probe)",
    ),
    "rrf_fusion": QuerySpec(
        q_rrf_fusion,
        SQL_RRF_FUSION,
        "reciprocal-rank fusion of BM25 and raw-tf rankings (hybrid search)",
    ),
    "type_hour_grid": QuerySpec(
        q_type_hour_grid,
        SQL_TYPE_HOUR_GRID,
        "dense dimension-grid fill: cross join + left join coalesce over one fact agg",
    ),
    "minhash_incremental": QuerySpec(
        q_minhash_incremental, SQL_MINHASH_INCREMENTAL,
        "new-batch near-dup vs persisted LSH band state (independent-reference oracle)",
    ),
    "ngram_jaccard_pairs": QuerySpec(
        q_ngram_jaccard_pairs, SQL_NGRAM_JACCARD_PAIRS,
        "exact df-capped n-gram-set Jaccard near-dup pairs (one gram exchange)",
    ),
    "winnowing_fingerprints": QuerySpec(
        q_winnowing_fingerprints, SQL_WINNOWING_FINGERPRINTS,
        "winnowing (MOSS) rolling-hash fingerprints per source, streaming",
    ),
    "kcenter_coreset": QuerySpec(
        q_kcenter_coreset, SQL_KCENTER_CORESET,
        "greedy k-center diversity coreset over embeddings (broadcast center rounds)",
    ),
    "corpus_diff": QuerySpec(
        q_corpus_diff,
        SQL_CORPUS_DIFF,
        "snapshot diff: unchanged/modified/removed/added via fp combiners + one doc_id exchange",
    ),
    "compression_quality": QuerySpec(
        q_compression_quality, SQL_COMPRESSION_QUALITY,
        "zlib entropy quality proxy per source (per-doc sizes artifact, SQL aggregation)",
    ),
    "padding_waste": QuerySpec(
        q_padding_waste,
        SQL_PADDING_WASTE,
        "length-bucketed batching padding waste vs arrival order (exact global rank)",
    ),
    "bpe_encode_stats": QuerySpec(
        q_bpe_encode_stats, SQL_BPE_ENCODE_STATS,
        "512-merge sampled-train BPE vocab applied corpus-wide (linked-list priority encoder)",
    ),
    "bpe_merges": QuerySpec(
        q_bpe_merges,
        SQL_BPE_MERGES,
        "iterative distributed BPE merge training: pair-count → top-1 → rewrite rounds",
    ),
    "naive_bayes_langid": QuerySpec(
        q_naive_bayes_langid,
        SQL_NAIVE_BAYES_LANGID,
        "multinomial Naive Bayes langid: vocab-bounded train reduce, broadcast model score",
    ),
    "bm25_search": QuerySpec(
        q_bm25_search,
        SQL_BM25_SEARCH,
        "BM25 ranked retrieval: one-scan candidate postings + corpus stats, top-20",
    ),
    "mad_outliers": QuerySpec(
        q_mad_outliers,
        SQL_MAD_OUTLIERS,
        "median + MAD robust outlier counts from one histogram-sketch pass",
    ),
    "cube_counts": QuerySpec(
        q_cube_counts,
        SQL_CUBE_COUNTS,
        "GROUP BY CUBE lattice re-summed from one finest distributed aggregate",
    ),
    "purchase_view_sets": QuerySpec(
        q_purchase_view_sets,
        SQL_PURCHASE_VIEW_SETS,
        "INTERSECT/EXCEPT user sets as one membership aggregation pass",
    ),
    "ewma_user_value": QuerySpec(
        q_ewma_user_value,
        SQL_EWMA_USER_VALUE,
        "time-decayed EWMA aggregate via re-anchored associative partials",
    ),
    "events_by_type": QuerySpec(q_events_by_type, SQL_EVENTS_BY_TYPE, "A1 groupby count/sum"),
    "events_per_hour": QuerySpec(q_events_per_hour, SQL_EVENTS_PER_HOUR, "tumbling-window counts"),
    "top_users_by_value": QuerySpec(q_top_users_by_value, SQL_TOP_USERS, "top-k over aggregate"),
    "error_events_window": QuerySpec(
        q_error_events_window, SQL_ERROR_EVENTS_WINDOW, "F1/F2 filter + projection (pushdown)"
    ),
    "parse_props": QuerySpec(q_parse_props, SQL_PARSE_PROPS, "M4 regex field extraction"),
    "orders_by_region": QuerySpec(q_orders_by_region, SQL_ORDERS_BY_REGION, "J1 broadcast join chain"),
    "pricing_summary": QuerySpec(q_pricing_summary, SQL_PRICING_SUMMARY, "TPC-H Q1-style aggregate"),
    "last_event_per_user": QuerySpec(q_last_event_per_user, SQL_LAST_EVENT, "A6 compacted last-state"),
    "distinct_sources": QuerySpec(q_distinct_sources, SQL_DISTINCT_SOURCES, "unique/set op"),
    "lineitem_topk": QuerySpec(q_lineitem_topk, SQL_LINEITEM_TOPK, "sort + limit top-k"),
    "doc_token_stats": QuerySpec(q_doc_token_stats, SQL_DOC_TOKEN_STATS, "token counting"),
    "doc_quality": QuerySpec(q_doc_quality, SQL_DOC_QUALITY, "quality scoring (stopword ratio)"),
    "doc_fingerprint": QuerySpec(q_doc_fingerprint, SQL_DOC_FINGERPRINT, "document fingerprint"),
    "dedup_exact": QuerySpec(q_dedup_exact, SQL_DEDUP_EXACT, "exact dedup via content hash"),
    "cosine_topk": QuerySpec(q_cosine_topk, SQL_COSINE_TOPK, "brute-force ANN baseline"),
    "ann_ivf_topk": QuerySpec(
        q_ann_ivf_topk, SQL_COSINE_TOPK, "IVF index build + query (exact at nprobe=nlist)"
    ),
    "pipeline_docs": QuerySpec(q_pipeline_docs, SQL_PIPELINE_DOCS, "flagship parse→enrich→route→agg"),
    "route_documents": QuerySpec(q_route_documents, SQL_ROUTE_DOCUMENTS, "predicate fan-out counts"),
    "order_revenue_topk": QuerySpec(
        q_order_revenue_topk, SQL_ORDER_REVENUE_TOPK, "large-large hash join + pre-agg"
    ),
    "bloom_semi_join": QuerySpec(
        q_bloom_semi_join,
        SQL_BLOOM_SEMI_JOIN,
        "bloom-join: mergeable filter broadcast + survivor-only exact semi join",
    ),
    "customers_without_orders": QuerySpec(
        q_customers_without_orders, SQL_CUSTOMERS_WITHOUT_ORDERS, "broadcast anti join"
    ),
    "nation_revenue": QuerySpec(
        q_nation_revenue, SQL_NATION_REVENUE, "Q5-style multi-join (filter+broadcast+hash)"
    ),
    "error_prior_purchase": QuerySpec(
        q_error_prior_purchase, SQL_ERROR_PRIOR_PURCHASE, "as-of correlation join"
    ),
    "views_before_purchase": QuerySpec(
        q_views_before_purchase, SQL_VIEWS_BEFORE_PURCHASE, "range (interval) join counts"
    ),
    "global_error_context": QuerySpec(
        q_global_error_context,
        SQL_GLOBAL_ERROR_CONTEXT,
        "keyless interval join via time-bucket partitioning + 2x right replication",
    ),
    "user_sessions": QuerySpec(q_user_sessions, SQL_USER_SESSIONS, "gap-based session windows"),
    "hopping_window_counts": QuerySpec(
        q_hopping_window_counts,
        SQL_HOPPING_WINDOW_COUNTS,
        "overlapping 30-min/10-min hopping windows via bounded event replication",
    ),
    "span_assembly": QuerySpec(
        q_span_assembly, SQL_SPAN_ASSEMBLY, "J4 span merge: field-wise last-writer-wins"
    ),
    "trace_summary": QuerySpec(
        q_trace_summary, SQL_TRACE_SUMMARY, "trace rollup over assembled spans"
    ),
    "media_decode_stats": QuerySpec(
        q_media_decode_stats, SQL_MEDIA_DECODE_STATS,
        "multimodal actor-pool decode vs independent scalar-reference features",
    ),
    "hourly_moving_avg": QuerySpec(
        q_hourly_moving_avg, SQL_HOURLY_MOVING_AVG, "sliding window over tumbling agg"
    ),
    "embedding_neardup": QuerySpec(q_embedding_neardup, SQL_EMBEDDING_NEARDUP, "cosine near-dup pairs"),
    "lang_counts": QuerySpec(q_lang_counts, SQL_LANG_COUNTS, "A5 exploration top-k counts"),
    "union_counts": QuerySpec(q_union_counts, SQL_UNION_COUNTS, "union-all of filtered streams"),
    "docs_matching_regex": QuerySpec(
        q_docs_matching_regex, SQL_DOCS_MATCHING_REGEX, "F4 regex row filter"
    ),
    "distinct_users_per_type": QuerySpec(
        q_distinct_users_per_type, SQL_DISTINCT_USERS, "two-stage count-distinct"
    ),
    "approx_distinct_users": QuerySpec(
        q_approx_distinct_users, None, "HLL sketch distinct-count (rows-only)"
    ),
    "kll_price_quantiles": QuerySpec(
        q_kll_price_quantiles, None, "KLL mergeable quantile sketch (rows-only, self-gated)"
    ),
    "kll_value_by_type": QuerySpec(
        q_kll_value_by_type, None, "grouped KLL quantiles per key (rows-only)"
    ),
    "mg_heavy_users": QuerySpec(
        q_mg_heavy_users, None, "Misra-Gries one-pass heavy hitters (rows-only)"
    ),
    "kmv_user_overlap": QuerySpec(
        q_kmv_user_overlap,
        SQL_KMV_USER_OVERLAP,
        "KMV bottom-k set algebra incl. intersection vs pure-Python reference",
    ),
    "type_overlap_matrix": QuerySpec(
        q_type_overlap_matrix,
        SQL_TYPE_OVERLAP_MATRIX,
        "exact pairwise audience overlap via per-user bucket-local pair explosion",
    ),
    "approx_users_per_type": QuerySpec(
        q_approx_users_per_type, None, "grouped HLL distinct-count per key (rows-only)"
    ),
    "value_median_per_type": QuerySpec(
        q_value_median_per_type, SQL_VALUE_MEDIAN, "per-group exact median"
    ),
    "value_p95_per_type": QuerySpec(
        q_value_p95_per_type, SQL_VALUE_P95, "per-group p95 via histogram sketch"
    ),
    "top_events_per_type": QuerySpec(
        q_top_events_per_type, SQL_TOP_EVENTS_PER_TYPE, "per-group top-k (window rank)"
    ),
    "sample_docs_md5": QuerySpec(
        q_sample_docs_md5, SQL_SAMPLE_DOCS_MD5, "F5 deterministic hash sampling"
    ),
    "weighted_sample": QuerySpec(
        q_weighted_sample,
        SQL_WEIGHTED_SAMPLE,
        "Efraimidis-Spirakis token-weighted sample without replacement (deterministic)",
    ),
    "embedding_neardup_lsh": QuerySpec(
        q_embedding_neardup_lsh, None, "hyperplane-LSH near-dup (approx, rows-only)"
    ),
    "jaccard_neardup": QuerySpec(
        q_jaccard_neardup, SQL_JACCARD_NEARDUP, "exact n-gram Jaccard similarity join"
    ),
    "minhash_neardup": QuerySpec(
        q_minhash_neardup,
        SQL_MINHASH_NEARDUP,
        "MinHash+LSH near-dup pairs vs independent scalar reference artifact",
    ),
    "neardup_cluster_dedup": QuerySpec(
        q_neardup_cluster_dedup,
        SQL_NEARDUP_CLUSTER_DEDUP,
        "LSH pairs → distributed CC → canonical keep, vs recursive-CTE closure",
    ),
    "dedup_clusters": QuerySpec(
        q_dedup_clusters, SQL_DEDUP_CLUSTERS, "near-dup pairs → connected components (star contraction)"
    ),
    "dedup_survivors": QuerySpec(
        q_dedup_survivors, SQL_DEDUP_SURVIVORS, "keep-one-per-cluster over the full corpus"
    ),
    "simhash_fingerprints": QuerySpec(
        q_simhash_fingerprints,
        SQL_SIMHASH_FINGERPRINTS,
        "SimHash fingerprints vs independent scalar-FNV reference artifact",
    ),
    "simhash_hamming_buckets": QuerySpec(
        q_simhash_hamming_buckets, SQL_SIMHASH_HAMMING, "SimHash popcount histogram vs reference"
    ),
    "loglines_extract": QuerySpec(
        q_loglines_extract, SQL_LOGLINES_EXTRACT, "gz line-file extraction e2e vs SQL classifier"
    ),
    "token_frequency_topk": QuerySpec(
        q_token_frequency_topk, SQL_TOKEN_FREQUENCY, "vocab histogram vs UNNEST oracle"
    ),
    "bigram_topk": QuerySpec(q_bigram_topk, SQL_BIGRAM_TOPK, "top-20 token bigrams"),
    "length_histogram": QuerySpec(
        q_length_histogram, SQL_LENGTH_HISTOGRAM, "sequence-length buckets"
    ),
    "packing_stats": QuerySpec(
        q_packing_stats, SQL_PACKING_STATS, "per-source FFD packing vs reference + conservation"
    ),
    "training_chunks": QuerySpec(
        q_training_chunks,
        SQL_TRAINING_CHUNKS,
        "GPT concat-and-chunk layout (prefix-sum offsets, boundary-spanning blocks)",
    ),
    "dedup_sequences": QuerySpec(
        q_dedup_sequences, SQL_DEDUP_SEQUENCES, "bit-exact token-array dedup counts per source"
    ),
    "epoch_shuffle": QuerySpec(
        q_epoch_shuffle, SQL_EPOCH_SHUFFLE, "seeded hash-order epoch shuffle (distributed top-k)"
    ),
    "split_counts": QuerySpec(
        q_split_counts, SQL_SPLIT_COUNTS, "deterministic hash-fraction train/val split"
    ),
    "oov_rate": QuerySpec(
        q_oov_rate, SQL_OOV_RATE, "vocab build → broadcast → OOV-rate scan (two-phase)"
    ),
    "unigram_surprisal": QuerySpec(
        q_unigram_surprisal, SQL_UNIGRAM_SURPRISAL, "unigram-LM perplexity quality signal"
    ),
    "chunk_stats": QuerySpec(
        q_chunk_stats, SQL_CHUNK_STATS, "context-window chunking vs arithmetic oracle"
    ),
    "contamination_check": QuerySpec(
        q_contamination_check, SQL_CONTAMINATION, "benchmark n-gram contamination scan"
    ),
    "repetition_stats": QuerySpec(
        q_repetition_stats, SQL_REPETITION, "intra-doc repeated-gram detector"
    ),
    "cross_doc_dup_windows": QuerySpec(
        q_cross_doc_dup_windows,
        SQL_CROSS_DOC_DUP_WINDOWS,
        "cross-doc exact substring (5-gram window) duplication, Lee et al. span dedup",
    ),
    "substring_dedup_stats": QuerySpec(
        q_substring_dedup_stats,
        SQL_SUBSTRING_DEDUP_STATS,
        "span dedup cut decision: keep global first occurrence, count removed words",
    ),
    "substring_dedup_rewrite": QuerySpec(
        q_substring_dedup_rewrite,
        SQL_SUBSTRING_DEDUP_REWRITE,
        "span dedup rewrite: deduplicated corpus text, text-level oracle",
    ),
    "temperature_resample": QuerySpec(
        q_temperature_resample,
        SQL_TEMPERATURE_RESAMPLE,
        "temperature (T=0.5) mixture rebalancing from observed counts, md5-fraction membership",
    ),
    "domain_mix_sample": QuerySpec(
        q_domain_mix_sample, SQL_DOMAIN_MIX, "hash-deterministic mixture resampling"
    ),
    "embedding_centroids": QuerySpec(
        q_embedding_centroids, SQL_EMBEDDING_CENTROIDS, "per-label embedding centroid (vector agg)"
    ),
    "embedding_covariance": QuerySpec(
        q_embedding_covariance,
        SQL_EMBEDDING_COVARIANCE,
        "d×d covariance from mergeable (n, Σx, ΣxxT) moment partials (PCA front half)",
    ),
    "customer_order_counts": QuerySpec(
        q_customer_order_counts,
        SQL_CUSTOMER_ORDER_COUNTS,
        "native LEFT OUTER hash join + COUNT(non-null) indicator combiner",
    ),
    "dominant_user_per_type": QuerySpec(
        q_dominant_user_per_type,
        SQL_DOMINANT_USER_PER_TYPE,
        "grouped MODE via pair counts + top-1 candidate prune",
    ),
    "nation_hhi": QuerySpec(
        q_nation_hhi,
        SQL_NATION_HHI,
        "revenue concentration (HHI) per nation from per-customer share moments",
    ),
    "analyze_events": QuerySpec(
        q_analyze_events,
        SQL_ANALYZE_EVENTS,
        "ANALYZE catalog stats: n/nulls/exact-NDV/min/max per column, one streaming pass",
    ),
    "user_paths": QuerySpec(
        q_user_paths,
        SQL_USER_PATHS,
        "ordered LISTAGG per group (first-8 event path), head-bounded gather",
    ),
    "type_hour_chi2": QuerySpec(
        q_type_hour_chi2,
        SQL_TYPE_HOUR_CHI2,
        "χ² independence of event_type × hour from distributed contingency counts",
    ),
    "source_kl": QuerySpec(
        q_source_kl, SQL_SOURCE_KL, "KL(P(token|source) || P(token)) domain drift"
    ),
    "tfidf_topk": QuerySpec(
        q_tfidf_topk, SQL_TFIDF_TOPK, "top-3 distinctive tokens per source by tf-idf"
    ),
    "heavy_hitters": QuerySpec(
        q_heavy_hitters, SQL_HEAVY_HITTERS, "two-pass exact heavy hitters (zero-shuffle top-k)"
    ),
    "cms_heavy_hitters": QuerySpec(
        q_cms_heavy_hitters,
        SQL_CMS_HEAVY_HITTERS,
        "Count-Min-sketch-pruned exact heavy hitters (fixed-memory candidates)",
    ),
    "token_pagerank": QuerySpec(
        q_token_pagerank,
        SQL_TOKEN_PAGERANK,
        "iterative PageRank over the token-transition graph vs unrolled CTE oracle",
    ),
    "token_bfs": QuerySpec(
        q_token_bfs,
        SQL_TOKEN_BFS,
        "distributed BFS hop levels (frontier broadcast, one edge scan per hop)",
    ),
    "embedding_kmeans": QuerySpec(
        q_embedding_kmeans,
        SQL_EMBEDDING_KMEANS,
        "iterative Lloyd k-means (broadcast centroids, k·d-float partials) vs unrolled CTE",
    ),
    "pmi_topk": QuerySpec(
        q_pmi_topk,
        SQL_PMI_TOPK,
        "PMI collocations, support-filtered inside the bigram reduce",
    ),
    "index_term_stats": QuerySpec(
        q_index_term_stats,
        SQL_INDEX_TERM_STATS,
        "inverted-index build: per-term df/tf stats",
    ),
    "keyword_search": QuerySpec(
        q_keyword_search,
        SQL_KEYWORD_SEARCH,
        "conjunctive keyword search over posting lists",
    ),
    "value_trend_per_type": QuerySpec(
        q_value_trend_per_type,
        SQL_VALUE_TREND_PER_TYPE,
        "per-group OLS slope + Pearson corr from mergeable centered moments",
    ),
    "copurchase_pairs": QuerySpec(
        q_copurchase_pairs,
        SQL_COPURCHASE_PAIRS,
        "item co-occurrence pairs within orders, bounded within-group self-merge",
    ),
    "revenue_rollup": QuerySpec(
        q_revenue_rollup,
        SQL_REVENUE_ROLLUP,
        "GROUP BY ROLLUP grouping sets from one finest-level distributed aggregate",
    ),
    "events_pivot_hourly": QuerySpec(
        q_events_pivot_hourly,
        SQL_EVENTS_PIVOT_HOURLY,
        "pivot/crosstab hour-of-day × event_type",
    ),
    "lang_entropy_per_source": QuerySpec(
        q_lang_entropy_per_source,
        SQL_LANG_ENTROPY_PER_SOURCE,
        "Shannon entropy of language mix per source",
    ),
    "funnel_stages": QuerySpec(
        q_funnel_stages,
        SQL_FUNNEL_STAGES,
        "ordered conversion funnel (min-ts strict-after semantics), one user_id exchange",
    ),
    "cohort_retention": QuerySpec(
        q_cohort_retention,
        SQL_COHORT_RETENTION,
        "weekly cohort retention matrix via distinct-pair combiner",
    ),
    "event_gap_stats": QuerySpec(
        q_event_gap_stats,
        SQL_EVENT_GAP_STATS,
        "distributed LAG(): per-type inter-event gap stats, exact int64-µs partials",
    ),
    "event_transitions": QuerySpec(
        q_event_transitions,
        SQL_EVENT_TRANSITIONS,
        "Markov event-type transition matrix from per-user consecutive pairs",
    ),
    "copurchase_triangles": QuerySpec(
        q_copurchase_triangles,
        SQL_COPURCHASE_TRIANGLES,
        "degree-oriented exact triangle count + clustering coefficient, no edge broadcast",
    ),
    "record_linkage": QuerySpec(
        q_record_linkage,
        SQL_RECORD_LINKAGE,
        "blocked entity resolution: prefix/suffix blocking + batch-Levenshtein verify",
    ),
    "peak_rolling_value": QuerySpec(
        q_peak_rolling_value,
        SQL_PEAK_ROLLING_VALUE,
        "ROWS-frame moving average per user (peak 5-event trailing mean), cents-exact",
    ),
    "skew_join_nation_value": QuerySpec(
        q_skew_join_nation_value,
        SQL_SKEW_JOIN_NATION_VALUE,
        "skew-aware join: sampled hot-key detection, broadcast hot path + cold exchange",
    ),
    "burst_detection": QuerySpec(
        q_burst_detection,
        SQL_BURST_DETECTION,
        "time-RANGE frame window: peak 1-hour burst per user via banded searchsorted",
    ),
    "order_price_deciles": QuerySpec(
        q_order_price_deciles,
        SQL_ORDER_PRICE_DECILES,
        "NTILE(10) via exact distributed global row-number (range-bucket + offset broadcast)",
    ),
    "curriculum_order": QuerySpec(
        q_curriculum_order, SQL_CURRICULUM_ORDER, "global distributed sort by difficulty proxy"
    ),
    "pii_scrub": QuerySpec(
        q_pii_scrub, SQL_PII_SCRUB, "vectorized PII scan+redact (RE2 chain, per-source partials)"
    ),
    "text_normalize": QuerySpec(
        q_text_normalize, SQL_TEXT_NORMALIZE, "canonicalize text (case/whitespace), effect summary"
    ),
    "zscore_outliers": QuerySpec(
        q_zscore_outliers, SQL_ZSCORE_OUTLIERS, "two-pass moments + broadcast z-score outliers"
    ),
    "stratified_sample_k": QuerySpec(
        q_stratified_sample_k, SQL_STRATIFIED_SAMPLE_K, "exact-k-per-group hash-order sample"
    ),
    "token_budget_sample": QuerySpec(
        q_token_budget_sample, SQL_TOKEN_BUDGET_SAMPLE, "per-source token-budget prefix cut"
    ),
    "gopher_repetition": QuerySpec(
        q_gopher_repetition,
        SQL_GOPHER_REPETITION,
        "Gopher repetition signals: dup-line / top-2-gram / dup-5-gram char fractions",
    ),
    "gopher_quality_rules": QuerySpec(
        q_gopher_quality_rules,
        SQL_GOPHER_QUALITY_RULES,
        "Gopher quality rule suite: per-rule fail counts, integer-exact gates",
    ),
    "c4_line_filter": QuerySpec(
        q_c4_line_filter,
        SQL_C4_LINE_FILTER,
        "C4 line cleaning: doc kills, terminal-punct/5-word/javascript line rule",
    ),
    "dsir_importance": QuerySpec(
        q_dsir_importance,
        SQL_DSIR_IMPORTANCE,
        "DSIR hashed-bigram importance weights (target=en), two streaming passes",
    ),
    "pq_ann_topk": QuerySpec(
        q_pq_ann_topk,
        SQL_PQ_ANN_TOPK,
        "product-quantization ADC top-10 vs independent scalar-loop reference",
    ),
    "bm25_two_pass": QuerySpec(
        q_bm25_two_pass,
        SQL_BM25_TWO_PASS,
        "BM25 ranked retrieval: zero-shuffle two-pass scoring + distributed top-k",
    ),
    "line_dedup_rewrite": QuerySpec(
        q_line_dedup_rewrite,
        SQL_LINE_DEDUP_REWRITE,
        "cross-doc line dedup (>=3 docs) + rewrite, per-source removal stats",
    ),
    "stride_chunks": QuerySpec(
        q_stride_chunks,
        SQL_STRIDE_CHUNKS,
        "sliding-window retrieval chunking (W=32, S=24), edge-checksummed",
    ),
    "fim_layout": QuerySpec(
        q_fim_layout,
        SQL_FIM_LAYOUT,
        "fill-in-the-middle PSM reorder, position-weighted checksum",
    ),
    "ngram_diversity": QuerySpec(
        q_ngram_diversity,
        SQL_NGRAM_DIVERSITY,
        "type/token n-gram diversity per source (n=1,2,3), tagged exchange",
    ),
    "knn_label_consistency": QuerySpec(
        q_knn_label_consistency,
        SQL_KNN_LABEL_CONSISTENCY,
        "leave-one-out exact 1-NN label-noise audit, tiled all-pairs scan",
    ),
    "blocklist_scan": QuerySpec(
        q_blocklist_scan,
        SQL_BLOCKLIST_SCAN,
        "C4-style blocklist scan (actor pool): flags + per-phrase occurrences",
    ),
    "budget_apportionment": QuerySpec(
        q_budget_apportionment,
        SQL_BUDGET_APPORTIONMENT,
        "largest-remainder (Hamilton) training-budget allocation, all-integer",
    ),
    "audio_downsample": QuerySpec(
        q_audio_downsample,
        SQL_AUDIO_DOWNSAMPLE,
        "2:1 WAV decimation (actor pool) vs independent stdlib-wave reference",
    ),
    "linear_attribution": QuerySpec(
        q_linear_attribution,
        SQL_LINEAR_ATTRIBUTION,
        "multi-touch linear attribution, integer-exact credit split by view hour",
    ),
    "vocab_coverage": QuerySpec(
        q_vocab_coverage,
        SQL_VOCAB_COVERAGE,
        "vocabulary coverage curve: smallest k covering 50/90/99% token mass",
    ),
    "partition_skew_audit": QuerySpec(
        q_partition_skew_audit,
        SQL_PARTITION_SKEW_AUDIT,
        "FNV-keyed partition skew preflight (rows + distinct users per partition)",
    ),
    "image_phash_dedup": QuerySpec(
        q_image_phash_dedup,
        SQL_IMAGE_PHASH_DEDUP,
        "perceptual dHash dedup: rescaled/brightness re-encodes collapse",
    ),
    "contrastive_pairs": QuerySpec(
        q_contrastive_pairs,
        SQL_CONTRASTIVE_PAIRS,
        "contrastive pair mining: nearest positive + hard negative per anchor",
    ),
    "cusum_changepoint": QuerySpec(
        q_cusum_changepoint,
        SQL_CUSUM_CHANGEPOINT,
        "CUSUM changepoint per event type, integer cross-multiplied deviations",
    ),
    "twap_user_value": QuerySpec(
        q_twap_user_value,
        SQL_TWAP_USER_VALUE,
        "time-weighted average value per user (exact µs×cents dot product)",
    ),
    "webclean_pipeline": QuerySpec(
        q_webclean_pipeline,
        SQL_WEBCLEAN_PIPELINE,
        "end-to-end web cleaning funnel: C4 kill/line → Gopher gates → line dedup",
    ),
    "incremental_agg": QuerySpec(
        q_incremental_agg,
        SQL_INCREMENTAL_AGG,
        "cross-run incremental aggregate state fold ≡ one-shot recompute",
    ),
    "zorder_locality": QuerySpec(
        q_zorder_locality,
        SQL_ZORDER_LOCALITY,
        "Z-order vs single-key layout: distinct blocks per user/hour predicate",
    ),
    "histogram_split_finder": QuerySpec(
        q_histogram_split_finder,
        SQL_HISTOGRAM_SPLIT_FINDER,
        "GBDT histogram split finding: integer partials + prefix-sum gain scan",
    ),
    "split_leakage_audit": QuerySpec(
        q_split_leakage_audit,
        SQL_SPLIT_LEAKAGE_AUDIT,
        "train/val near-dup leakage: LSH pairs × hash-fraction split categories",
    ),
    "sort_merge_revenue": QuerySpec(
        q_sort_merge_revenue,
        SQL_SORT_MERGE_REVENUE,
        "sort-merge physical join (range co-group + searchsorted runs)",
    ),
    "sssp_copurchase": QuerySpec(
        q_sssp_copurchase,
        SQL_SSSP_COPURCHASE,
        "weighted SSSP (Bellman-Ford rounds) vs independent Dijkstra reference",
    ),
    "image_channel_stats": QuerySpec(
        q_image_channel_stats,
        SQL_IMAGE_CHANNEL_STATS,
        "per-channel pixel means via actor-pool decode vs synthesis-time sums",
    ),
    "als_user_step": QuerySpec(
        q_als_user_step,
        SQL_ALS_USER_STEP,
        "ALS user half-step: per-user ridge solves in the bucketed exchange",
    ),
    "mmr_rerank": QuerySpec(
        q_mmr_rerank,
        SQL_MMR_RERANK,
        "MMR diverse retrieval: BM25 pool + greedy relevance-vs-Jaccard re-rank",
    ),
    "zonemap_pruned_scan": QuerySpec(
        q_zonemap_pruned_scan,
        SQL_ZONEMAP_PRUNED_SCAN,
        "zone-map data skipping: range-sorted files + manifest-pruned range scan",
    ),
    "isotonic_purchase_rate": QuerySpec(
        q_isotonic_purchase_rate,
        SQL_ISOTONIC_PURCHASE_RATE,
        "PAV isotonic calibration, cross-multiplied integer pool decisions",
    ),
    "woe_binning": QuerySpec(
        q_woe_binning,
        SQL_WOE_BINNING,
        "weight-of-evidence / IV decile audit via exact distributed NTILE",
    ),
    "kaplan_meier": QuerySpec(
        q_kaplan_meier,
        SQL_KAPLAN_MEIER,
        "Kaplan-Meier survival with right-censoring, mirrored exp-sum-log fold",
    ),
    "join_size_profile": QuerySpec(
        q_join_size_profile,
        SQL_JOIN_SIZE_PROFILE,
        "join cardinality per priority WITHOUT the join (count-vector co-group)",
    ),
    "embedding_drift_audit": QuerySpec(
        q_embedding_drift_audit,
        SQL_EMBEDDING_DRIFT_AUDIT,
        "per-label even/odd-half centroid cosine over integer µ-unit sums",
    ),
    "transitive_reach3": QuerySpec(
        q_transitive_reach3,
        SQL_TRANSITIVE_REACH3,
        "3-hop bounded transitive closure, per-round distinct frontier exchange",
    ),
    "unigram_em_step": QuerySpec(
        q_unigram_em_step_checked,
        SQL_UNIGRAM_EM_STEP,
        "SentencePiece unigram-LM E/M step vs independent scalar lattice artifact",
    ),
    "ucb1_replay": QuerySpec(
        q_ucb1_replay,
        SQL_UCB1_REPLAY,
        "offline UCB1 bandit replay per user-episode vs scalar replay artifact",
    ),
    "ndcg_bm25_eval": QuerySpec(
        q_ndcg_bm25_eval,
        SQL_NDCG_BM25_EVAL,
        "nDCG@10 of BM25 vs term-frequency relevance, integer positional weights",
    ),
    "t_closeness_audit": QuerySpec(
        q_t_closeness_audit,
        SQL_T_CLOSENESS_AUDIT,
        "t-closeness (ordered EMD vs global) per nation, integer EMD mass",
    ),
    "feature_hash_collisions": QuerySpec(
        q_feature_hash_collisions,
        SQL_FEATURE_HASH_COLLISIONS,
        "hashing-trick bucket-size histogram over the distinct vocab (md5)",
    ),
    "logreg_quality_step": QuerySpec(
        q_logreg_quality_step,
        SQL_LOGREG_QUALITY_STEP,
        "one exact full-batch logreg gradient step from zero weights",
    ),
    "clustering_coefficient": QuerySpec(
        q_clustering_coefficient,
        SQL_CLUSTERING_COEFFICIENT,
        "per-node local clustering coefficient, corner-credited oriented wedges",
    ),
    "containment_pairs": QuerySpec(
        q_containment_pairs,
        SQL_CONTAINMENT_PAIRS,
        "ordered gram-containment near-dup pairs (|A∩B|/|A| ≥ 0.6, df-capped)",
    ),
    "cdc_chunk_dedup": QuerySpec(
        q_cdc_chunk_dedup,
        SQL_CDC_CHUNK_DEDUP,
        "content-defined-chunking storage dedup vs independent scalar chunker",
    ),
    "mixture_ess_audit": QuerySpec(
        q_mixture_ess_audit,
        SQL_MIXTURE_ESS_AUDIT,
        "Kish effective-sample-size of the length-weighted mixture per source",
    ),
    "psi_drift": QuerySpec(
        q_psi_drift,
        SQL_PSI_DRIFT,
        "population-stability-index value drift per event type, Laplace bins",
    ),
    "ece_calibration": QuerySpec(
        q_ece_calibration,
        SQL_ECE_CALIBRATION,
        "expected-calibration-error bins from an even/odd leakage-free split",
    ),
    "cuped_adjustment": QuerySpec(
        q_cuped_adjustment,
        SQL_CUPED_ADJUSTMENT,
        "CUPED variance-reduced A/B readout, integer raw-moment theta",
    ),
    "count_min_audit": QuerySpec(
        q_count_min_audit,
        SQL_COUNT_MIN_AUDIT,
        "Count-Min sketch (4×256, mergeable partials) overcount audit vs exact top-15",
    ),
    "spearman_qty_price": QuerySpec(
        q_spearman_qty_price,
        SQL_SPEARMAN_QTY_PRICE,
        "Spearman rho with average-rank ties, exact bigint sufficient statistics",
    ),
    "kendall_tau_qty_disc": QuerySpec(
        q_kendall_tau_qty_disc,
        SQL_KENDALL_TAU_QTY_DISC,
        "Kendall tau-b from the bounded 2-D cell histogram, exact pair masses",
    ),
    "cube_revenue": QuerySpec(
        q_cube_revenue,
        SQL_CUBE_REVENUE,
        "OLAP CUBE(region, year, priority) expanded from one base-grid exchange",
    ),
    "mlm_mask_stats": QuerySpec(
        q_mlm_mask_stats,
        SQL_MLM_MASK_STATS,
        "deterministic BERT-style 15%/80-10-10 masking layout audit per source",
    ),
    "decayed_topk_users": QuerySpec(
        q_decayed_topk_users,
        SQL_DECAYED_TOPK_USERS,
        "time-decayed heavy hitters via exact dyadic week-bucket weights",
    ),
    "hits_scores": QuerySpec(
        q_hits_scores,
        SQL_HITS_SCORES,
        "HITS hubs/authorities, one integer-exact iteration over bipartite edges",
    ),
    "ring_rebalance": QuerySpec(
        q_ring_rebalance,
        SQL_RING_REBALANCE,
        "consistent-hash ring shard assignment + minimal-movement rebalance audit",
    ),
    "kneser_ney_bigram": QuerySpec(
        q_kneser_ney_bigram,
        SQL_KNESER_NEY_BIGRAM,
        "Kneser-Ney bigram smoothing from one bigram exchange, KN terms from the histogram",
    ),
    "chars_per_token": QuerySpec(
        q_chars_per_token,
        SQL_CHARS_PER_TOKEN,
        "tokenizer fertility (chars/token) per source from two bounded aggregates",
    ),
    "train_interleave_audit": QuerySpec(
        q_train_interleave_audit,
        SQL_TRAIN_INTERLEAVE_AUDIT,
        "stride-scheduled source interleaving audit from one bounded aggregate, no sort",
    ),
    "good_turing_counts": QuerySpec(
        q_good_turing_counts,
        SQL_GOOD_TURING_COUNTS,
        "Good-Turing count-of-counts + discounted r* over the token frequency table",
    ),
    "rbo_rank_overlap": QuerySpec(
        q_rbo_rank_overlap,
        SQL_RBO_RANK_OVERLAP,
        "rank-biased overlap between half-period purchase-value top-50 rankings",
    ),
    "csv_ingest_stats": QuerySpec(
        q_csv_ingest_stats,
        SQL_CSV_INGEST_STATS,
        "CSV source format end-to-end: RFC-4180 edge cases, NULL accounting, bounded aggregate",
    ),
    "parquet_footprint_audit": QuerySpec(
        q_parquet_footprint_audit,
        SQL_PARQUET_FOOTPRINT_AUDIT,
        "per-column parquet storage footprint from footer metadata only",
    ),
    "poisson_bootstrap_ci": QuerySpec(
        q_poisson_bootstrap_ci,
        SQL_POISSON_BOOTSTRAP_CI,
        "web-scale Poisson bootstrap: per-row hash weights, B partial rows exchanged, CI from 64 replicate means",
    ),
    "dp_event_counts": QuerySpec(
        q_dp_event_counts,
        SQL_DP_EVENT_COUNTS,
        "eps=1 Laplace DP count release with deterministic md5-seeded noise",
    ),
    "ccnet_perplexity_buckets": QuerySpec(
        q_ccnet_perplexity_buckets,
        SQL_CCNET_PERPLEXITY_BUCKETS,
        "CCNet head/middle/tail perplexity bucketing: µnat unigram LM, exact integer terciles",
    ),
    "negative_sampling_table": QuerySpec(
        q_negative_sampling_table,
        SQL_NEGATIVE_SAMPLING_TABLE,
        "word2vec unigram^0.75 negative-sampling table, exact Hamilton slot apportionment",
    ),
    "sequence_mining_triples": QuerySpec(
        q_sequence_mining_triples,
        SQL_SEQUENCE_MINING_TRIPLES,
        "PrefixSpan-style length-3 subsequence support over user event streams",
    ),
    "neyman_sample": QuerySpec(
        q_neyman_sample,
        SQL_NEYMAN_SAMPLE,
        "Neyman stratified allocation: integer dispersion mass, Hamilton slots, hash-order sample",
    ),
    "phrase_search": QuerySpec(
        q_phrase_search,
        SQL_PHRASE_SEARCH,
        "positional phrase search: top corpus bigram, exact-adjacency per-doc occurrences",
    ),
    "partition_digest": QuerySpec(
        q_partition_digest,
        SQL_PARTITION_DIGEST,
        "anti-entropy shard digests: mergeable md5-prefix sums for cross-replica reconciliation",
    ),
    "label_propagation": QuerySpec(
        q_label_propagation,
        SQL_LABEL_PROPAGATION,
        "4-round synchronous min-label propagation over the co-purchase graph",
    ),
    "expectation_audit": QuerySpec(
        q_expectation_audit,
        SQL_EXPECTATION_AUDIT,
        "declarative 8-rule expectation suite: range/domain/unique/format/referential",
    ),
    "degree_assortativity": QuerySpec(
        q_degree_assortativity,
        SQL_DEGREE_ASSORTATIVITY,
        "Newman degree assortativity of the co-purchase graph from integer moment partials",
    ),
    "jl_projection_audit": QuerySpec(
        q_jl_projection_audit,
        SQL_JL_PROJECTION_AUDIT,
        "JL sign-projection distortion histogram, integer-exact cross-multiplied buckets",
    ),
    "successive_halving": QuerySpec(
        q_successive_halving,
        SQL_SUCCESSIVE_HALVING,
        "successive-halving replay over user arms with integer cumulative-cents metrics",
    ),
    "adjacent_lcp_audit": QuerySpec(
        q_adjacent_lcp_audit,
        SQL_ADJACENT_LCP_AUDIT,
        "suffix-array-style dedup prefilter: sorted-adjacent word-level LCP histogram",
    ),
    "bradley_terry_step": QuerySpec(
        q_bradley_terry_step,
        SQL_BRADLEY_TERRY_STEP,
        "Bradley-Terry preference strengths, two integer-exact MM iterations",
    ),
    "random_walk_corpus": QuerySpec(
        q_random_walk_corpus,
        SQL_RANDOM_WALK_CORPUS,
        "DeepWalk walk-corpus generation: deterministic hash-picked 4-step walks",
    ),
    "pareto_layers": QuerySpec(
        q_pareto_layers,
        SQL_PARETO_LAYERS,
        "onion-peeled Pareto layers (3 skyline peels) with local-layer prune",
    ),
    "elias_fano_audit": QuerySpec(
        q_elias_fano_audit,
        SQL_ELIAS_FANO_AUDIT,
        "Elias-Fano posting footprint vs plain-32-bit by doc-frequency bucket, integer-exact",
    ),
    "encoding_advisor": QuerySpec(
        q_encoding_advisor,
        SQL_ENCODING_ADVISOR,
        "columnar encoding advisor: exact ndv + positional run counts + integer rules",
    ),
    "gorilla_timestamp_audit": QuerySpec(
        q_gorilla_timestamp_audit,
        SQL_GORILLA_TIMESTAMP_AUDIT,
        "Gorilla delta-of-delta timestamp compression sizing, integer bit buckets",
    ),
    "dirichlet_ql_retrieval": QuerySpec(
        q_dirichlet_ql_retrieval,
        SQL_DIRICHLET_QL_RETRIEVAL,
        "Dirichlet-smoothed query likelihood retrieval, µnat-integer scores",
    ),
    "diff_in_diff": QuerySpec(
        q_diff_in_diff,
        SQL_DIFF_IN_DIFF,
        "difference-in-differences on purchase cents: odd/even users x midpoint periods",
    ),
    "soft_dedup_weights": QuerySpec(
        q_soft_dedup_weights,
        SQL_SOFT_DEDUP_WEIGHTS,
        "SoftDeDup 1/c loss weighting: per-source effective µtoken mass, integer-exact",
    ),
    "stratified_kfold": QuerySpec(
        q_stratified_kfold,
        SQL_STRATIFIED_KFOLD,
        "stratified k-fold assignment in md5 hash order, balanced to ±1 per stratum",
    ),
    "image_tile_entropy": QuerySpec(
        q_image_tile_entropy,
        SQL_IMAGE_TILE_ENTROPY,
        "vision-curation texture audit: integer 8x8 tile variance buckets vs synthesis truth",
    ),
    "audio_vad_energy": QuerySpec(
        q_audio_vad_energy,
        SQL_AUDIO_VAD_ENERGY,
        "energy-threshold VAD over PCM frames: active counts + longest run vs synthesis truth",
    ),
    "demographic_parity": QuerySpec(
        q_demographic_parity,
        SQL_DEMOGRAPHIC_PARITY,
        "four-fifths disparate-impact audit with integer cross-multiplied verdict",
    ),
    "motif_discovery": QuerySpec(
        q_motif_discovery,
        SQL_MOTIF_DISCOVERY,
        "matrix-profile-style weekly motif pairs by exact integer SSD",
    ),
    "binary_segmentation": QuerySpec(
        q_binary_segmentation,
        SQL_BINARY_SEGMENTATION,
        "binary-segmentation changepoint: exact integer SSE argmax split",
    ),
    "lloyd_step_quantized": QuerySpec(
        q_lloyd_step_quantized,
        SQL_LLOYD_STEP_QUANTIZED,
        "exact Lloyd assignment step on µ-int embeddings: integer distances, k-row partials",
    ),
    "cohens_kappa": QuerySpec(
        q_cohens_kappa,
        SQL_COHENS_KAPPA,
        "Cohen's kappa between two deterministic labeling rules, integer confusion matrix",
    ),
    "champion_lists": QuerySpec(
        q_champion_lists,
        SQL_CHAMPION_LISTS,
        "tiered-index champion lists: per-top-term top-5 docs by tf, distributed top-k prune",
    ),
    "loso_quality_delta": QuerySpec(
        q_loso_quality_delta,
        SQL_LOSO_QUALITY_DELTA,
        "leave-one-source-out ablation sweep from one (sum, n) exchange",
    ),
    "burn_rate_alerts": QuerySpec(
        q_burn_rate_alerts,
        SQL_BURN_RATE_ALERTS,
        "multi-window SLO burn-rate alerts with integer cross-multiplied verdicts",
    ),
    "wasserstein_1d": QuerySpec(
        q_wasserstein_1d,
        SQL_WASSERSTEIN_1D,
        "exact 1-D earth-mover distance between group distributions, integer numerator",
    ),
    "vocab_id_assignment": QuerySpec(
        q_vocab_id_assignment,
        SQL_VOCAB_ID_ASSIGNMENT,
        "dictionary-encoding dense ids by first-appearance min-combiner order",
    ),
    "streaming_moments": QuerySpec(
        q_streaming_moments,
        SQL_STREAMING_MOMENTS,
        "exact mergeable moments via >64-bit string-carried power-sum partials",
    ),
    "nucleus_vocab_cut": QuerySpec(
        q_nucleus_vocab_cut,
        SQL_NUCLEUS_VOCAB_CUT,
        "top-p nucleus vocabulary cut per source, integer ceil threshold",
    ),
    "dp_clipped_mean": QuerySpec(
        q_dp_clipped_mean,
        SQL_DP_CLIPPED_MEAN,
        "DP clip-and-Laplace mean release with md5-seeded deterministic noise",
    ),
    "rocchio_expansion": QuerySpec(
        q_rocchio_expansion,
        SQL_ROCCHIO_EXPANSION,
        "Rocchio pseudo-relevance feedback: seed → feedback docs → tf-idf expansion → rescore",
    ),
    "dp_degree_histogram": QuerySpec(
        q_dp_degree_histogram,
        SQL_DP_DEGREE_HISTOGRAM,
        "node-DP degree release: clip-at-20 projection + Laplace(2D/eps) md5 noise",
    ),
    "canonical_selection": QuerySpec(
        q_canonical_selection,
        SQL_CANONICAL_SELECTION,
        "quality-aware dedup survivorship: keep the longest copy per exact cluster",
    ),
    "mrr_eval": QuerySpec(
        q_mrr_eval,
        SQL_MRR_EVAL,
        "mean-reciprocal-rank eval: first-relevant rank without a global sort",
    ),
    "rich_club_coefficient": QuerySpec(
        q_rich_club_coefficient,
        SQL_RICH_CLUB_COEFFICIENT,
        "rich-club density among degree->k hubs, one broadcast edge scan for all thresholds",
    ),
    "prefix_filter_join": QuerySpec(
        q_prefix_filter_join,
        SQL_PREFIX_FILTER_JOIN,
        "PPJoin prefix-filtered exact-Jaccard join vs the exhaustive oracle",
    ),
    "markov_stationary": QuerySpec(
        q_markov_stationary,
        SQL_MARKOV_STATIONARY,
        "stationary distribution by 20 integer-quantized power iterations",
    ),
    "weighted_sample_es": QuerySpec(
        q_weighted_sample_es,
        SQL_WEIGHTED_SAMPLE_ES,
        "Efraimidis-Spirakis weighted sampling w/o replacement as a mergeable top-k",
    ),
    "selectivity_independence_audit": QuerySpec(
        q_selectivity_independence_audit,
        SQL_SELECTIVITY_INDEPENDENCE_AUDIT,
        "CBO independence-assumption audit with integer cross-multiplied lift verdict",
    ),
    "shapley_attribution": QuerySpec(
        q_shapley_attribution,
        SQL_SHAPLEY_ATTRIBUTION,
        "exact 3-channel Shapley attribution in sixth-cents, all orderings enumerated",
    ),
    "token_bucket_audit": QuerySpec(
        q_token_bucket_audit,
        SQL_TOKEN_BUCKET_AUDIT,
        "token-bucket admission replay per user; recursive-CTE oracle mirrors the fold",
    ),
    "lru_cache_audit": QuerySpec(
        q_lru_cache_audit,
        SQL_LRU_CACHE_AUDIT,
        "LRU(4) hit rate: real automaton vs Mattson stack-distance oracle",
    ),
    "hill_tail_index": QuerySpec(
        q_hill_tail_index,
        SQL_HILL_TAIL_INDEX,
        "Hill heavy-tail index over the top-100 purchases, µnat-integer log terms",
    ),
    "skipgram_pairs": QuerySpec(
        q_skipgram_pairs,
        SQL_SKIPGRAM_PAIRS,
        "word2vec skip-gram window-2 context pairs, shifted vectorized views",
    ),
    "volume_shipping": QuerySpec(
        q_volume_shipping,
        SQL_VOLUME_SHIPPING,
        "TPC-H Q7 shape: cross-nation revenue flow per ship year, integer-exact money",
    ),
    "market_share": QuerySpec(
        q_market_share,
        SQL_MARKET_SHARE,
        "TPC-H Q8 shape: national supplier revenue share in a region per order year",
    ),
    "product_profit": QuerySpec(
        q_product_profit,
        SQL_PRODUCT_PROFIT,
        "TPC-H Q9 shape: per-nation per-year profit over one part type (retail-cost analog)",
    ),
    "important_parts": QuerySpec(
        q_important_parts,
        SQL_IMPORTANT_PARTS,
        "TPC-H Q11 shape: parts above a value-share threshold among one nation's suppliers",
    ),
    "promo_revenue": QuerySpec(
        q_promo_revenue,
        SQL_PROMO_REVENUE,
        "TPC-H Q14 shape: PROMO revenue percentage per ship month",
    ),
    "supplier_variety": QuerySpec(
        q_supplier_variety,
        SQL_SUPPLIER_VARIETY,
        "TPC-H Q16 shape: distinct supplier count per (brand,type,size), top-20",
    ),
    "large_volume_customers": QuerySpec(
        q_large_volume_customers,
        SQL_LARGE_VOLUME_CUSTOMERS,
        "TPC-H Q18 shape: orders above a total-quantity threshold, top-20 by price",
    ),
    "bracketed_revenue": QuerySpec(
        q_bracketed_revenue,
        SQL_BRACKETED_REVENUE,
        "TPC-H Q19 shape: OR'd brand/size/quantity bracket revenue, single scalar",
    ),
    "global_sales_opportunity": QuerySpec(
        q_global_sales_opportunity,
        SQL_GLOBAL_SALES_OPPORTUNITY,
        "TPC-H Q22 shape: above-average-balance customers with no orders, per nation",
    ),
    "edge_support_hist": QuerySpec(
        q_edge_support_hist,
        SQL_EDGE_SUPPORT_HIST,
        "k-truss edge support histogram via broadcast adjacency bitset",
    ),
    "min_cost_supplier": QuerySpec(
        q_min_cost_supplier,
        SQL_MIN_COST_SUPPLIER,
        "TPC-H Q2 shape: best regional supplier per qualifying part, grouped argmax",
    ),
    "late_shipments": QuerySpec(
        q_late_shipments,
        SQL_LATE_SHIPMENTS,
        "TPC-H Q12 shape: late line share per order priority, integer date math",
    ),
    "jsonl_ingest_stats": QuerySpec(
        q_jsonl_ingest_stats,
        SQL_JSONL_INGEST_STATS,
        "JSONL source format: distributed read_json + per-(lang,source) combiners",
    ),
    "top_revenue_supplier": QuerySpec(
        q_top_revenue_supplier,
        SQL_TOP_REVENUE_SUPPLIER,
        "TPC-H Q15: max-revenue supplier(s) over one ship quarter, ties kept",
    ),
    "dominant_part_suppliers": QuerySpec(
        q_dominant_part_suppliers,
        SQL_DOMINANT_PART_SUPPLIERS,
        "TPC-H Q20 shape: majority-volume suppliers per qualifying part",
    ),
    "waiting_suppliers": QuerySpec(
        q_waiting_suppliers,
        SQL_WAITING_SUPPLIERS,
        "TPC-H Q21 shape: only-late supplier on finished multi-supplier orders",
    ),
    "count_min_heavy_hitters": QuerySpec(
        q_count_min_heavy_hitters,
        SQL_COUNT_MIN_HEAVY_HITTERS,
        "Count-Min sketch (4x512) heavy hitters with exact oracle parity",
    ),
    "page_hinkley_alarms": QuerySpec(
        q_page_hinkley_alarms,
        SQL_PAGE_HINKLEY_ALARMS,
        "Page-Hinkley mean-shift alarms per event type, integer-exact scan",
    ),
    "cumulative_distinct_users": QuerySpec(
        q_cumulative_distinct_users,
        SQL_CUMULATIVE_DISTINCT_USERS,
        "Per-day new and cumulative distinct users, bucketed first-occurrence",
    ),
    "jaro_winkler_linkage": QuerySpec(
        q_jaro_winkler_linkage,
        SQL_JARO_WINKLER_LINKAGE,
        "Blocked Jaro-Winkler linkage, pair-vectorized kernel bitwise vs DuckDB",
    ),
    "holt_linear_forecast": QuerySpec(
        q_holt_linear_forecast,
        SQL_HOLT_LINEAR_FORECAST,
        "Holt double exponential smoothing, integer-exact recursive replay",
    ),
    "phrase_search": QuerySpec(
        q_phrase_search,
        SQL_PHRASE_SEARCH,
        "Positional phrase retrieval: shifted-equality postings, top-5 per phrase",
    ),
    "zorder_layout_audit": QuerySpec(
        q_zorder_layout_audit,
        SQL_ZORDER_LAYOUT_AUDIT,
        "Morton/Z-order clustering audit: per-Z-block zonemap spans",
    ),
    "ols_price_trend": QuerySpec(
        q_ols_price_trend,
        SQL_OLS_PRICE_TREND,
        "Per-brand OLS price-on-day fit, integer closed form w/ HUGEINT parity",
    ),
    "herfindahl_by_nation": QuerySpec(
        q_herfindahl_by_nation,
        SQL_HERFINDAHL_BY_NATION,
        "Supplier-revenue HHI concentration per nation, exact ppm",
    ),
    "percent_rank_prices": QuerySpec(
        q_percent_rank_prices,
        SQL_PERCENT_RANK_PRICES,
        "Integer percent-rank of Brand#1 retail prices (RANK ties)",
    ),
    "string_agg_top_terms": QuerySpec(
        q_string_agg_top_terms,
        SQL_STRING_AGG_TOP_TERMS,
        "Ordered STRING_AGG: top-3 words per (lang, source), comma-joined",
    ),
    "order_gap_extremes": QuerySpec(
        q_order_gap_extremes,
        SQL_ORDER_GAP_EXTREMES,
        "LAG-shape per-customer order-date gaps, top-20 by max gap",
    ),
    "butterfly_counts": QuerySpec(
        q_butterfly_counts,
        SQL_BUTTERFLY_COUNTS,
        "Bipartite butterfly (2x2 biclique) participation per part",
    ),
    "events_unpivot_check": QuerySpec(
        q_events_unpivot_check,
        SQL_EVENTS_UNPIVOT_CHECK,
        "UNPIVOT parity: engine-pivoted wide grid melted back to long",
    ),
    "wordpiece_top_merges": QuerySpec(
        q_wordpiece_top_merges,
        SQL_WORDPIECE_TOP_MERGES,
        "WordPiece merge selection: integer-quantized likelihood ranking",
    ),
    "fk_inference_audit": QuerySpec(
        q_fk_inference_audit,
        SQL_FK_INFERENCE_AUDIT,
        "FK inference: distinct containment ppm per candidate column pair",
    ),
    "bitmap_container_plan": QuerySpec(
        q_bitmap_container_plan,
        SQL_BITMAP_CONTAINER_PLAN,
        "Roaring container planning per key chunk: array/run/bitmap rule",
    ),
    "linkage_quality_eval": QuerySpec(
        q_linkage_quality_eval,
        SQL_LINKAGE_QUALITY_EVAL,
        "Linkage precision/recall vs planted variant clusters, exact ppm",
    ),
    "session_gap_curve": QuerySpec(
        q_session_gap_curve,
        SQL_SESSION_GAP_CURVE,
        "Sessions vs inactivity-gap threshold: 5 parameter points, one scan",
    ),
    "ngram_loop_detect": QuerySpec(
        q_ngram_loop_detect,
        SQL_NGRAM_LOOP_DETECT,
        "Degenerate-repetition filter: longest lag-3 word run per doc",
    ),
    "fano_burstiness": QuerySpec(
        q_fano_burstiness,
        SQL_FANO_BURSTINESS,
        "Fano factor of daily event counts per type, exact ppm",
    ),
    "equidepth_price_histogram": QuerySpec(
        q_equidepth_price_histogram,
        SQL_EQUIDEPTH_PRICE_HISTOGRAM,
        "Exact NTILE(10) equi-depth histogram via global row numbers",
    ),
    "decision_stump_split": QuerySpec(
        q_decision_stump_split,
        SQL_DECISION_STUMP_SPLIT,
        "CART stump: quantized weighted-Gini scores per cents threshold",
    ),
    "vocab_pruning_curve": QuerySpec(
        q_vocab_pruning_curve,
        SQL_VOCAB_PRUNING_CURVE,
        "OOV ppm vs vocab size: 5 cutoffs from one word-count exchange",
    ),
    "keyness_odds_ratio": QuerySpec(
        q_keyness_odds_ratio,
        SQL_KEYNESS_ODDS_RATIO,
        "Haldane odds-ratio keywords of src0 vs rest, integer-quantized",
    ),
    "lcs_event_sequences": QuerySpec(
        q_lcs_event_sequences,
        SQL_LCS_EVENT_SEQUENCES,
        "LCS of top-2 users' event sequences: prefix-max sweep vs scalar DP",
    ),
    "conditional_entropy_rate": QuerySpec(
        q_conditional_entropy_rate,
        SQL_CONDITIONAL_ENTROPY_RATE,
        "Bigram entropy rate of event-type chains, µnat integer convention",
    ),
    "mutual_information_lang_source": QuerySpec(
        q_mutual_information_lang_source,
        SQL_MUTUAL_INFORMATION_LANG_SOURCE,
        "MI(lang; source) over documents, µnat contingency fold",
    ),
    "kaplan_meier_survival": QuerySpec(
        q_kaplan_meier_survival,
        SQL_KAPLAN_MEIER_SURVIVAL,
        "Kaplan-Meier over customer lifetimes, µnat log-domain product",
    ),
    "candidate_key_audit": QuerySpec(
        q_candidate_key_audit,
        SQL_CANDIDATE_KEY_AUDIT,
        "Candidate-key profiling: rows vs distinct per column, is-key verdict",
    ),
    "huffman_code_lengths": QuerySpec(
        q_huffman_code_lengths,
        SQL_HUFFMAN_CODE_LENGTHS,
        "Canonical Huffman lengths over char frequencies, deterministic merges",
    ),
    "audio_clipping_audit": QuerySpec(
        q_audio_clipping_audit,
        SQL_AUDIO_CLIPPING_AUDIT,
        "Per-clip WAV clipping ratio ppm, stdlib decoder vs scalar walk",
    ),
    "item_similarity_topk": QuerySpec(
        q_item_similarity_topk,
        SQL_ITEM_SIMILARITY_TOPK,
        "Item-item cosine top-10 from the shared edge artifact, quantized",
    ),
    "freshness_audit": QuerySpec(
        q_freshness_audit,
        SQL_FRESHNESS_AUDIT,
        "Per-type data vintage: last day, staleness, last-day volume",
    ),
    "dunning_llr_keywords": QuerySpec(
        q_dunning_llr_keywords,
        SQL_DUNNING_LLR_KEYWORDS,
        "Dunning G2 keywords of src0 vs rest, munat-exact 2x2 fold",
    ),
    "damerau_linkage": QuerySpec(
        q_damerau_linkage,
        SQL_DAMERAU_LINKAGE,
        "True Damerau-Levenshtein linkage, DL kernel bitwise vs DuckDB",
    ),
    "degree_assortativity": QuerySpec(
        q_degree_assortativity,
        SQL_DEGREE_ASSORTATIVITY,
        "Newman degree assortativity of the co-purchase graph, exact ppm",
    ),
    "price_index_laspeyres": QuerySpec(
        q_price_index_laspeyres,
        SQL_PRICE_INDEX_LASPEYRES,
        "Laspeyres price index per brand, quantized unit prices",
    ),
    "shingle_containment_topk": QuerySpec(
        q_shingle_containment_topk,
        SQL_SHINGLE_CONTAINMENT_TOPK,
        "Broder containment top-10 (directed), shingle inverted-index join",
    ),
    "forecast_baseline_compare": QuerySpec(
        q_forecast_baseline_compare,
        SQL_FORECAST_BASELINE_COMPARE,
        "Seasonal-7 vs 1-step naive error ratio per type, exact ppm",
    ),
    "simpsons_paradox_check": QuerySpec(
        q_simpsons_paradox_check,
        SQL_SIMPSONS_PARADOX_CHECK,
        "Simpson reversal detector: per-year vs pooled lift signs, exact",
    ),
    "inspection_paradox_audit": QuerySpec(
        q_inspection_paradox_audit,
        SQL_INSPECTION_PARADOX_AUDIT,
        "Waiting-time paradox: length-biased vs plain mean gap, exact ppm",
    ),
    "vocab_richness_chao1": QuerySpec(
        q_vocab_richness_chao1,
        SQL_VOCAB_RICHNESS_CHAO1,
        "Chao1 vocabulary-richness lower bound per source, integer-exact",
    ),
    "inverse_simpson_diversity": QuerySpec(
        q_inverse_simpson_diversity,
        SQL_INVERSE_SIMPSON_DIVERSITY,
        "Hill 2-order diversity (effective vocab size) per source",
    ),
    "theil_index_supplier_revenue": QuerySpec(
        q_theil_index_supplier_revenue,
        SQL_THEIL_INDEX_SUPPLIER_REVENUE,
        "Theil inequality of supplier revenue per nation, munat fold",
    ),
    "kendall_tau_price_size": QuerySpec(
        q_kendall_tau_price_size,
        SQL_KENDALL_TAU_PRICE_SIZE,
        "Kendall tau via bounded-cardinality group crossings vs O(n^2) oracle",
    ),
    "spearman_rho_price_size": QuerySpec(
        q_spearman_rho_price_size,
        SQL_SPEARMAN_RHO_PRICE_SIZE,
        "Spearman rho with 2x-integer midranks, cross-multiplied",
    ),
    "logrank_groups": QuerySpec(
        q_logrank_groups,
        SQL_LOGRANK_GROUPS,
        "Log-rank O-E stream between even/odd customer cohorts, exact",
    ),
    "activity_transition_matrix": QuerySpec(
        q_activity_transition_matrix,
        SQL_ACTIVITY_TRANSITION_MATRIX,
        "Month-over-month activity 2x2: stay/churn/reactivate counts",
    ),
    "lorenz_curve_suppliers": QuerySpec(
        q_lorenz_curve_suppliers,
        SQL_LORENZ_CURVE_SUPPLIERS,
        "Lorenz curve deciles of supplier revenue, cumulative share ppm",
    ),
    "lindley_queue_audit": QuerySpec(
        q_lindley_queue_audit,
        SQL_LINDLEY_QUEUE_AUDIT,
        "Lindley FIFO waiting-time replay per type, cumsum-minus-min scan",
    ),
    "eb_shrunk_rates": QuerySpec(
        q_eb_shrunk_rates,
        SQL_EB_SHRUNK_RATES,
        "Empirical-Bayes purchase-rate shrinkage per nation, exact rational",
    ),
    "cuped_adjustment": QuerySpec(
        q_cuped_adjustment,
        SQL_CUPED_ADJUSTMENT,
        "CUPED theta and rho^2 over per-user pre/post sums, factored quantization",
    ),
    "mann_kendall_trend": QuerySpec(
        q_mann_kendall_trend,
        SQL_MANN_KENDALL_TREND,
        "Mann-Kendall S over daily revenue, vectorized sign-pair fold",
    ),
    "runs_test_audit": QuerySpec(
        q_runs_test_audit,
        SQL_RUNS_TEST_AUDIT,
        "Wald-Wolfowitz above/below-median runs over daily revenue",
    ),
    "hodges_lehmann_location": QuerySpec(
        q_hodges_lehmann_location,
        SQL_HODGES_LEHMANN_LOCATION,
        "Hodges-Lehmann pseudomedian of daily revenue (2x-integer Walsh sums)",
    ),
    "siegel_repeated_medians": QuerySpec(
        q_siegel_repeated_medians,
        SQL_SIEGEL_REPEATED_MEDIANS,
        "Siegel repeated-median slope, ppm-quantized pairwise slopes",
    ),
    "revenue_bridge_decomposition": QuerySpec(
        q_revenue_bridge_decomposition,
        SQL_REVENUE_BRIDGE_DECOMPOSITION,
        "Price/volume/residual revenue bridge per brand, cent-exact",
    ),
    "benford_mad_grade": QuerySpec(
        q_benford_mad_grade,
        SQL_BENFORD_MAD_GRADE,
        "Nigrini MAD conformity grade on first digits of order totals",
    ),
    "seat_apportionment_compare": QuerySpec(
        q_seat_apportionment_compare,
        SQL_SEAT_APPORTIONMENT_COMPARE,
        "D'Hondt vs Sainte-Lague 100-seat allocation over nation order counts",
    ),
    "min_variance_weights": QuerySpec(
        q_min_variance_weights,
        SQL_MIN_VARIANCE_WEIGHTS,
        "Two-asset minimum-variance weight over segment revenue, exact ppm",
    ),
    "cross_correlation_segments": QuerySpec(
        q_cross_correlation_segments,
        SQL_CROSS_CORRELATION_SEGMENTS,
        "Lead/lag Pearson rho between segment series at lags -1/0/1",
    ),
    "greedy_knapsack_plan": QuerySpec(
        q_greedy_knapsack_plan,
        SQL_GREEDY_KNAPSACK_PLAN,
        "Density-greedy knapsack over parts, ordered-cumsum admission",
    ),
    "coverage_gap_audit": QuerySpec(
        q_coverage_gap_audit,
        SQL_COVERAGE_GAP_AUDIT,
        "Largest internal silent window per event type",
    ),
    "control_chart_violations": QuerySpec(
        q_control_chart_violations,
        SQL_CONTROL_CHART_VIOLATIONS,
        "Shewhart 3-sigma violations + longest one-side run, no sqrt",
    ),
    "pot_exceedance_clusters": QuerySpec(
        q_pot_exceedance_clusters,
        SQL_POT_EXCEEDANCE_CLUSTERS,
        "Peaks-over-threshold day clusters above rank-p90, theta ppm",
    ),
    "hierarchy_rollup_shares": QuerySpec(
        q_hierarchy_rollup_shares,
        SQL_HIERARCHY_ROLLUP_SHARES,
        "Region/nation/top-supplier rollup with share-of-parent ppm",
    ),
    "ipc_ingest_stats": QuerySpec(
        q_ipc_ingest_stats,
        SQL_IPC_INGEST_STATS,
        "Arrow IPC source format: distributed binary-file decode + combiners",
    ),
    "greedy_set_cover_sources": QuerySpec(
        q_greedy_set_cover_sources,
        SQL_GREEDY_SET_COVER_SOURCES,
        "Greedy set cover of the vocabulary by sources, 5 unrolled picks",
    ),
    "ngram_order_compare": QuerySpec(
        q_ngram_order_compare,
        SQL_NGRAM_ORDER_COMPARE,
        "Unigram vs bigram cross-entropy (add-one, munat) and the order gain",
    ),
    "abtest_power_mde": QuerySpec(
        q_abtest_power_mde,
        SQL_ABTEST_POWER_MDE,
        "Two-proportion MDE per nation at alpha=.05/power=.8",
    ),
    "media_aspect_ratio_audit": QuerySpec(
        q_media_aspect_ratio_audit,
        SQL_MEDIA_ASPECT_RATIO_AUDIT,
        "Aspect-ratio buckets over media by integer cross-multiplication",
    ),
    "video_motion_energy": QuerySpec(
        q_video_motion_energy,
        SQL_VIDEO_MOTION_ENERGY,
        "Per-video sum |delta luminance| over decoded frames, top-10",
    ),
    "newcomb_second_digit": QuerySpec(
        q_newcomb_second_digit,
        SQL_NEWCOMB_SECOND_DIGIT,
        "Second-digit Newcomb-Benford test on order totals",
    ),
    "freedman_diaconis_histogram": QuerySpec(
        q_freedman_diaconis_histogram,
        SQL_FREEDMAN_DIACONIS_HISTOGRAM,
        "FD-rule histogram: exact rank quartiles, mirrored POWER width",
    ),
    "fk_fanout_profile": QuerySpec(
        q_fk_fanout_profile,
        SQL_FK_FANOUT_PROFILE,
        "Children-per-parent fanout stats for three relationships",
    ),
    "abc_xyz_matrix": QuerySpec(
        q_abc_xyz_matrix,
        SQL_ABC_XYZ_MATRIX,
        "ABC x XYZ inventory grid: cum-revenue bands x demand dispersion",
    ),
    "value_tier_migration": QuerySpec(
        q_value_tier_migration,
        SQL_VALUE_TIER_MIGRATION,
        "Year-over-year spend-tier 3x3 transition matrix",
    ),
}


def prematerialize_oracle_artifacts(sf_dir: str = "/root/testdata/sf0.01") -> None:
    """Make every /tmp artifact an oracle references exist, independent of
    query-vs-oracle execution order (called from __ray_entry__.oracle_sql)."""
    ensure_loglines_corpus(sf_dir)
    ensure_derived_parquet(sf_dir)
    ensure_packing_artifact(sf_dir)
    ensure_simhash_parquet(sf_dir)
    ensure_media_parquet(sf_dir)
    ensure_curation_parquet(sf_dir)
    ensure_bpe_merges_parquet(sf_dir)
    ensure_bpe_encoded_parquet(sf_dir)
    ensure_zlib_sizes_parquet(sf_dir)
    ensure_minhash_incremental_parquet(sf_dir)
    ensure_gram_hashes_parquet(sf_dir)
    ensure_kcenter_parquet(sf_dir)
    ensure_web_docs_parquet(sf_dir)
    ensure_dsir_buckets_parquet(sf_dir)
    ensure_pq_ref_parquet(sf_dir)
    ensure_audio_resample_parquet(sf_dir)
    ensure_user_partition_parquet(sf_dir)
    ensure_scale_dups_parquet(sf_dir)
    ensure_channel_stats_parquet(sf_dir)
    ensure_sssp_parquet(sf_dir)
    ensure_als_ref_parquet(sf_dir)
    ensure_mmr_ref_parquet(sf_dir)
    ensure_isotonic_ref_parquet(sf_dir)
    ensure_unigram_em_parquet(sf_dir)
    ensure_ucb1_parquet(sf_dir)
    ensure_cdc_chunks_parquet(sf_dir)
    ensure_documents_jsonl(sf_dir)
    ensure_cms_buckets_parquet(sf_dir)
    ensure_jw_names_parquet(sf_dir)
    ensure_events_wide_parquet(sf_dir)
    ensure_lcs_ref_parquet(sf_dir)
    ensure_huffman_ref_parquet(sf_dir)
    ensure_audio_clip_ref_parquet(sf_dir)
    ensure_dirty_names_parquet(sf_dir)

