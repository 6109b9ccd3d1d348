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
    textops2,
    tpch_more,
    udf_surface,
    vector,
)

# Evaluation priority (rotated round 5): the driver value-hashes the first
# ~50 registry entries per round, so hard-signal coverage is maximized by
# putting (a) the 30 queries that have NEVER had a driver row, then (b) the
# 5 rows-only queries that errored in round 1 and were never re-checked,
# then (c) the queries last driver-checked in rounds 1-2 (mutation family
# first).  Queries green in rounds 3-4 fall to the back — their code is
# unchanged and locally parity-green, so they carry the least new signal.
_PRIORITY = [
    # (a0) new this round — curation ops + real PPM decode
    "text_repetition_ratios",
    "text_contamination_overlap",
    "text_gopher_filter",
    "multimodal_ppm_decode",
    # (a) never driver-checked — scalar fn packs
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
    # (a) events batch twins (streaming §2.9 batch-equivalents)
    "events_tumbling_window",
    "events_sliding_window",
    "events_session_window",
    "events_dedup_first",
    "events_click_purchase_attribution",
    # (a) text-analysis pack
    "text_token_stats",
    "text_quality_score",
    "text_lang_id",
    "text_fingerprint",
    "text_source_profile",
    "text_chunk_documents",
    "text_normalize",
    "text_train_val_test_split",
    "text_pack_sequences",
    "text_redact_terms",
    # (a) UDF/UDAF/UDTF surface + remaining relational
    "udf_scalar_pandas",
    "udf_arrow_scalar",
    "udf_grouped_map",
    "udf_grouped_agg",
    "orderby_limit_offset",
    # (b) round-1 errors, fixed + pytest-pinned since, never re-shown to the
    # driver — the only driver-red history in the repo
    "ann_ivf_kmeans_search",
    "similarity_join_brp_lsh",
    "dedup_minhash_mllib",
    "embed_documents_distributed",
    "agg_approx_count_distinct",
    # (c) last driver-checked in r01/r02 — mutation family first
    "mutation_upsert_documents",
    "mutation_delete_documents",
    "mutation_upsert_index",
    "join_asof_purchase_click",
    "join_range_value_bands",
    "dedup_exact_stats",
    "dedup_fingerprint_groups",
    "dedup_minhash_signature",
    "dedup_minhash_pairs",
    "dedup_simhash",
    "dedup_simhash_pairs",
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
