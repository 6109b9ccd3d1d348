"""Central registry mapping SURVEY §2 operator inventory to (PySpark query,
DuckDB oracle SQL) pairs — the driver contract (__spark_entry__.py).

Each domain module registers its queries at import time.  Every callable takes
(spark, sf_dir) and returns a DataFrame; every oracle is ANSI SQL DuckDB runs
on the same parquet tables.  Column names/aliases MUST match pairwise — the
driver sorts columns by name and value-hashes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, fn: Callable[[SparkSession, str], DataFrame],
             oracle: str | None = None) -> None:
    assert name not in QUERIES, f"duplicate query {name}"
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


# populate — modules register at import time; final registry order is fixed
# below by _PRIORITY (the driver evaluates queries in dict order with a
# bounded budget, so the flagship cascade/ANN families must come first).
from binaryvectordb_spark.queries import (  # noqa: E402,F401
    analytics2,
    analytics3,
    dedup,
    hybrid,
    lateinteraction,
    lateral,
    layout,
    mllib_ops,
    multimodal,
    mutation,
    recursion,
    relational,
    scalar_funcs,
    scalar_funcs2,
    similarity,
    streaming_batch,
    textops,
    textops2,
    tpch_more,
    udf_surface,
    vector,
)

# Evaluation priority — GENERATED, do not hand-edit the order or carry
# age arithmetic in comments (that drifted twice, VERDICT r11/r12): the
# canonical rotation comes from `python examples/rotation_audit.py
# --emit`, which derives it from the CORRECTNESS_r*.json files directly
# (never-hashed entries first, then ascending last-hashed round, ties by
# prior position).  The close gate runs the audit and FAILS if this list
# diverges from canonical.  Rotated for round 17
# (post-CORRECTNESS_r16) with VERDICT r16 item 3's changed-surface
# PROMOTION: the 21 queries rewritten in r16/r17 lead the window (the
# window exists to re-hash changed surfaces; the two MLlib contrast rows
# whose exact verify sides were vectorized in the second r17 session are
# promoted too), then the r12 cohort and the stalest r13 entries fill
# the remaining 29 slots.
_PRIORITY = [
    "dedup_embedding_cosine",
    "dedup_levenshtein_pairs",
    "dedup_lsh_jaccard",
    "agg_cube_flag_status",
    "agg_grouping_sets",
    "tpch_q2_min_cost_supplier",
    "text_repetition_ratios",
    "agg_approx_count_distinct",
    "dedup_incremental_batch",
    "embed_documents_distributed",
    "search_bm25_topk",
    "search_hybrid_rrf",
    "search_bm25_topk_batch",
    "search_hybrid_rrf_batch",
    "search_rerank_overlap",
    "dedup_jaccard_pairs",
    "recursive_cte_subtree_rollup",
    "recursive_bom_extended_quantity",
    "recursive_reachability_semi_naive",
    "similarity_join_brp_lsh",
    "dedup_minhash_mllib",
    "text_fingerprint",
    "text_chunk_documents",
    "text_gopher_filter",
    "text_contamination_overlap",
    "text_normalize",
    "text_redact_terms",
    "text_source_profile",
    "text_pack_sequences",
    "text_train_val_test_split",
    "udf_scalar_pandas",
    "udf_arrow_scalar",
    "udf_grouped_map",
    "udf_grouped_agg",
    "events_cohort_retention_open_window",
    "search_bm25_indexed_blockmax",
    "tpch_q11_important_stock",
    "tpch_q16_supplier_part_counts",
    "tpch_q20_hot_part_suppliers",
    "search_bm25_local",
    "search_bm25_indexed_batch",
    "events_funnel_conversion",
    "events_cohort_retention",
    "events_streaks_gaps_islands",
    "scd2_event_state_history",
    "events_error_then_purchase",
    "agg_salted_skew_twostage",
    "join_bloom_semi_reduction",
    "graph_pagerank_bipartite",
    "sketch_cms_heavy_hitters",
    "udtf_chunk_lateral",
    "join_point_in_time_scd2",
    "events_transition_matrix",
    "tpch_q5_local_supplier_volume",
    "tpch_q8_market_share",
    "tpch_q13_customer_order_distribution",
    "events_multitouch_attribution",
    "quality_referential_integrity",
    "cdc_snapshot_diff",
    "quality_orders_expectations",
    "agg_weighted_median",
    "agg_mode_per_group",
    "agg_equidepth_histogram",
    "events_funnel_latency",
    "events_path_trigrams",
    "string_funcs",
    "string_funcs2",
    "date_funcs",
    "date_funcs2",
    "math_funcs",
    "orderby_limit_offset",
    "agg_approx_percentile",
    "text_stratified_sample",
    "knn_filtered_adaptive_rare",
    "knn_filtered_adaptive_broad",
    "multimodal_png_decode",
    "multimodal_resize",
    "ann_ivf_kmeans_search",
    "search_bm25_maxscore_split",
    "search_bm25_local_sharded",
    "search_bm25_indexed_mutated",
    "agg_equidepth_histogram_scalable",
    "agg_weighted_median_scalable",
    "sketch_hll_mergeable",
    "events_value_outliers",
    "events_funnel_latency_scalable",
    "quant_int8_score_error",
    "gate_log_admit_stats",
    "dedup_clusters",
    "multimodal_metadata",
    "multimodal_decode_features",
    "multimodal_frame_sample",
    "events_multigrain_rollup",
    "events_gap_fill_daily",
    "window_range_frame_30d",
    "agg_min_by_max_by",
    "agg_filter_clause",
    "agg_equiwidth_histogram",
    "agg_count_distinct",
    "agg_having",
    "set_ops_bag_semantics",
    "filter_range_pushdown",
    "filter_in_like_null",
    "filter_empty_result",
    "join_null_safe_eq",
    "join_multiway_revenue",
    "join_semi_customers_with_errors",
    "join_anti_customers_no_orders",
    "join_outer_order_counts",
    "distinct_pairs",
    "case_when_buckets",
    "explode_token_topk",
    "posexplode_embedding_head",
    "explode_outer_null_preserving",
    "text_tf_rarity_topk",
    "profile_orders",
    "dedup_corpus_kept",
    "agg_rollup_region_nation",
    "agg_pricing_summary",
    "search_bm25_indexed_batch_blockmax",
    "search_bm25_maxscore_split_mutated",
    "multimodal_jpeg_decode",
    "search_maxsim_topk",
    "search_maxsim_topk_batch",
    "dedup_span_keep_first",
    "ann_pq_adc_search",
    "layout_zorder_clustering",
    "ann_ivfpq_search",
    "dedup_semantic_clusters",
    "textindex_prune_stats",
    "dedup_incremental_persisted",
    "sketch_kmv_mergeable",
    "quant_trunc_dim_error",
    "sketch_bottomk_quantiles",
    "join_salted_skew",
    "multimodal_bmp_decode",
    "curation_funnel",
    "agg_pivot_status",
    "scalar_subquery_above_avg",
    "window_topk_per_customer",
    "window_rank_variants",
    "window_lag_lead",
    "join_full_outer_nation_profile",
    "window_distribution_funcs",
    "join_right_outer_orders",
    "tpch_q3_shipping_priority",
    "tpch_q10_returned_items",
    "agg_stats_moments",
    "ann_ivf_search",
    "ann_lsh_bucket_search",
    "ann_lsh_multitable_search",
    "ann_lsh_multitable_batch",
    "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q7_nation_volume",
    "tpch_q12_priority_by_status",
    "tpch_q14_promo_revenue",
    "tpch_q18_large_orders",
    "tpch_q19_discounted_revenue",
    "tpch_q22_idle_customers",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity_revenue",
    "knn_cascade",
    "knn_cascade_ivf",
    "knn_phase1_hamming",
    "knn_bruteforce_cosine",
    "knn_dot_topk",
    "index_popcount_stats",
    "db_len",
    "point_lookup",
    "knn_cascade_batch",
    "knn_cascade_filtered",
    "knn_radius_search",
    "knn_label_vote",
    "search_maxsim_rerank",
    "search_bm25_indexed",
    "search_phrase_indexed",
    "window_moving_sum",
    "sketch_bkq_mergeable",
    "join_salted_full_outer",
    "tpch_q9_product_profit",
    "tpch_q21_waiting_supplier",
    "window_running_total",
    "set_ops_segments",
    "union_by_name_parties",
    "unpivot_acctbal",
    "agg_collect_set",
    "window_first_last",
    "agg_percentiles",
    "dedup_exact_stats",
    "dedup_minhash_signature",
    "dedup_minhash_pairs",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_fingerprint_groups",
    "events_tumbling_window",
    "events_sliding_window",
    "events_session_window",
    "events_dedup_first",
    "events_click_purchase_attribution",
    "join_asof_purchase_click",
    "join_range_value_bands",
    "mutation_upsert_documents",
    "mutation_upsert_index",
    "mutation_delete_documents",
    "multimodal_ppm_decode",
    "date_arithmetic",
    "array_funcs",
    "array_higher_order",
    "map_funcs",
    "json_funcs",
    "text_token_stats",
    "text_lang_id",
    "text_quality_score",
]


def _apply_priority() -> None:
    global QUERIES, ORACLES
    ordered = [n for n in _PRIORITY if n in QUERIES]
    ordered += [n for n in QUERIES
                if n not in set(ordered) and n in ORACLES]
    # any rows-only queries last (none since round 6 — every registered
    # query now has an oracle; kept as a guard for future additions)
    ordered += [n for n in QUERIES if n not in set(ordered)]
    QUERIES = {n: QUERIES[n] for n in ordered}
    ORACLES = {n: ORACLES[n] for n in ordered if n in ORACLES}


_apply_priority()
