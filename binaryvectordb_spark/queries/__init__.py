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
    dedup,
    hybrid,
    lateinteraction,
    lateral,
    layout,
    mllib_ops,
    multimodal,
    mutation,
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

# Evaluation priority (rotated round 7): the driver value-hashes the first
# ~50 registry entries per round.  Order: (a) queries that are brand-new or
# output-changed this round (never hashed / need a fresh hash), then (b) the
# 46 queries last driver-checked in round 4 (the stalest green rows), then
# (c) the round-5 cohort.  Round-6-green queries fall to the back —
# unchanged code, freshest hashes, least new signal.
#
# ROUND-8 ROTATION NOTE: section (a) holds 12 queries that are new or
# output-rewritten in round 7, so (a)+(b) = 58 > the 50-query driver
# window — the TAIL of (b) (eight untouched-since-r4, pure-SQL queries:
# window_moving_sum, window_running_total, set_ops_segments,
# union_by_name_parties, unpivot_acctbal, agg_collect_set,
# window_first_last, agg_percentiles) slips past this round's window by
# design: they are the lowest-risk slips (static SQL over static
# fixtures, no round-7 code touched them, and test_oracle_parity hashes
# them locally every run).
# For round 8: front any round-8 additions, then that slipped (b) tail,
# then section (c)'s round-5 cohort (45 queries), then the round-6 cohort.
_PRIORITY = [
    # (a) brand-new in round 7 (never hashed) — plus agg_pricing_summary,
    # whose round-7 decimal precision-tier rewrite (exact two-stage
    # factoring) needs a fresh driver hash even though the output is
    # pinned bit-identical by test_oracle_parity.
    "agg_pricing_summary",
    "search_bm25_topk_batch",
    "search_hybrid_rrf_batch",
    "multimodal_jpeg_decode",
    "search_maxsim_topk",
    "search_maxsim_topk_batch",
    "dedup_span_keep_first",
    "ann_pq_adc_search",
    "layout_zorder_clustering",
    "ann_ivfpq_search",
    "dedup_semantic_clusters",
    "curation_funnel",
    # (b) last driver-checked in round 4 — stalest hashes first.  Queries
    # whose code paths were ALSO touched in round 7 (the knn cascade
    # family: Arrow batch-size change + adaptive-filter rework in
    # operators/cascade.py; tpch_q6's decimal-tier cast) are ordered ahead
    # of untouched static SQL so a window cut can only drop no-risk rows.
    "agg_pivot_status",
    "scalar_subquery_above_avg",
    "window_topk_per_customer",
    "window_rank_variants",
    "window_lag_lead",
    "join_full_outer_nation_profile",
    "agg_grouping_sets",
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
    # (b) tail — the designed slip set (see ROUND-8 ROTATION NOTE): static
    # SQL, untouched by any round-7 commit, locally hashed every pytest run.
    "window_moving_sum",
    "window_running_total",
    "set_ops_segments",
    "union_by_name_parties",
    "unpivot_acctbal",
    "agg_collect_set",
    "window_first_last",
    "agg_percentiles",
    # (c) last driver-checked in round 5 — next-stalest; the first few fit
    # in this round's ~50-query window after (a)+(b)
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
    "orderby_limit_offset",
    "string_funcs",
    "string_funcs2",
    "date_funcs",
    "date_funcs2",
    "date_arithmetic",
    "math_funcs",
    "array_funcs",
    "array_higher_order",
    "map_funcs",
    "json_funcs",
    "text_token_stats",
    "text_lang_id",
    "text_quality_score",
    "text_fingerprint",
    "text_chunk_documents",
    "text_gopher_filter",
    "text_contamination_overlap",
    "text_normalize",
    "text_redact_terms",
    "text_repetition_ratios",
    "text_source_profile",
    "text_pack_sequences",
    "text_train_val_test_split",
    "udf_scalar_pandas",
    "udf_arrow_scalar",
    "udf_grouped_map",
    "udf_grouped_agg",
    # (d) round-6-green — freshest hashes, least new signal; explicit so the
    # fallback append can't interleave them ahead of (c)
    "search_bm25_topk",
    "search_hybrid_rrf",
    "search_rerank_overlap",
    "agg_approx_percentile",
    "text_stratified_sample",
    "knn_filtered_adaptive_rare",
    "knn_filtered_adaptive_broad",
    "multimodal_png_decode",
    "multimodal_resize",
    "agg_approx_count_distinct",
    "ann_ivf_kmeans_search",
    "similarity_join_brp_lsh",
    "dedup_minhash_mllib",
    "embed_documents_distributed",
    "dedup_jaccard_pairs",
    "dedup_embedding_cosine",
    "dedup_lsh_jaccard",
    "dedup_clusters",
    "dedup_levenshtein_pairs",
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
    "agg_cube_flag_status",
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
