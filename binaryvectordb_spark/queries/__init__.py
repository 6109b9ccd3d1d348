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
    lateral,
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

# Evaluation priority (rotated round 6): the driver value-hashes the first
# ~50 registry entries per round.  Order: (a) queries whose OUTPUT changed
# this round (the 5 former rows-only entries, now returning oracle-checkable
# invariants — they need a fresh driver hash) plus any brand-new queries,
# then (b) the 32 queries last driver-checked in round 1 (the stalest green
# rows), then (c) the round-4 cohort.  Round-5-green queries fall to the
# back — unchanged code, freshest hashes, least new signal.
#
# ROUND-7 ROTATION NOTE: after this round's driver run, the stalest hashes
# will be section (c)'s round-4 cohort (positions ~51+, last hashed r4) —
# move them to the front of the r7 window, then the round-5 cohort.
_PRIORITY = [
    # (a) new or output-changed this round
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
    # (b) last driver-checked in round 1 — stalest hashes first
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
    "agg_pricing_summary",
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
    # (c) last driver-checked in round 4
    "profile_orders",
    "dedup_corpus_kept",
    "agg_rollup_region_nation",
    "agg_cube_flag_status",
    "agg_pivot_status",
    "scalar_subquery_above_avg",
    "window_topk_per_customer",
    "window_rank_variants",
    "window_lag_lead",
    "window_moving_sum",
    "window_running_total",
    "set_ops_segments",
    "union_by_name_parties",
    "join_full_outer_nation_profile",
    "agg_grouping_sets",
    "window_distribution_funcs",
    "unpivot_acctbal",
    "join_right_outer_orders",
    "agg_percentiles",
    "tpch_q3_shipping_priority",
    "tpch_q10_returned_items",
    "agg_collect_set",
    "window_first_last",
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
