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
    tpch_more,
    udf_surface,
    vector,
)

# Evaluation priority: the three-phase cascade (the engine's reason to exist,
# reference BinaryVectorDB/BinaryVectorDB.py:200-252) and its ANN siblings
# first, then families without a prior driver-correctness row, then queries
# already driver-green in round 1.  Names not listed keep registration order
# after the listed ones.
_PRIORITY = [
    # §2.5 cascade family — flagship
    "knn_cascade",
    "knn_cascade_ivf",
    "knn_phase1_hamming",
    "knn_cascade_batch",
    "knn_cascade_filtered",
    "knn_radius_search",
    "knn_label_vote",
    "knn_bruteforce_cosine",
    "knn_dot_topk",
    "index_popcount_stats",
    "db_len",
    "point_lookup",
    # ANN scale path
    "ann_ivf_search",
    "ann_lsh_bucket_search",
    "ann_lsh_multitable_search",
    "ann_lsh_multitable_batch",
    # round-1 hash-fails, re-check the cast fix
    "profile_orders",
    "dedup_corpus_kept",
    # TPC-H-shaped joins/aggs (no round-1 driver row)
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q7_nation_volume",
    "tpch_q10_returned_items",
    "tpch_q12_priority_by_status",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_orders",
    "tpch_q19_discounted_revenue",
    "tpch_q22_idle_customers",
    # window pack (no round-1 driver row)
    "window_topk_per_customer",
    "window_rank_variants",
    "window_lag_lead",
    "window_moving_sum",
    "window_running_total",
    "window_distribution_funcs",
    "window_first_last",
    # grouping/rollup/pivot pack
    "agg_rollup_region_nation",
    "agg_cube_flag_status",
    "agg_grouping_sets",
    "agg_pivot_status",
    "unpivot_acctbal",
    "agg_percentiles",
    "agg_stats_moments",
    "agg_collect_set",
    # remaining untested relational
    "scalar_subquery_above_avg",
    "set_ops_segments",
    "union_by_name_parties",
    "join_full_outer_nation_profile",
    "join_right_outer_orders",
    "orderby_limit_offset",
    # scalar fn packs
    "string_funcs",
    "date_funcs",
    "math_funcs",
    "array_funcs",
    "json_funcs",
    "map_funcs",
    "array_higher_order",
    "date_arithmetic",
    "string_funcs2",
    "date_funcs2",
    # events batch twins + text + udf surface (no round-1 driver row)
    "events_tumbling_window",
    "events_sliding_window",
    "events_session_window",
    "events_dedup_first",
    "events_click_purchase_attribution",
    "text_token_stats",
    "text_quality_score",
    "text_lang_id",
    "text_fingerprint",
    "text_source_profile",
    "text_chunk_documents",
    "text_normalize",
    "udf_scalar_pandas",
    "udf_arrow_scalar",
    "udf_grouped_map",
    "udf_grouped_agg",
]


def _apply_priority() -> None:
    global QUERIES, ORACLES
    ordered = [n for n in _PRIORITY if n in QUERIES]
    ordered += [n for n in QUERIES
                if n not in set(ordered) and n in ORACLES]
    # rows-only queries last: they are the most expensive (MLlib fits,
    # distributed embedding) AND carry the weakest driver signal — they
    # must not eat evaluation budget before value-hashed queries run
    ordered += [n for n in QUERIES if n not in set(ordered)]
    QUERIES = {n: QUERIES[n] for n in ordered}
    ORACLES = {n: ORACLES[n] for n in ordered if n in ORACLES}


_apply_priority()
