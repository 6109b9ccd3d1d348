"""r16: re-time the top of the r16 sweep on the CURRENT tree (the original
sweep predates the round's changes and was partly contended — e.g.
search_hybrid_rrf swept 3.35 s but re-measures 0.81 s).  Same protocol as
sweep_registry_r16.py (warm-up + median of 3 fresh plans, collect-timed).

Usage: python examples/resweep_top_r16.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOP = [
    # every sweep entry >= ~1.2 s, minus the documented deliberate
    # contrasts (similarity_join_brp_lsh, dedup_minhash_mllib,
    # dedup_jaccard_pairs) whose cost is their semantics
    "embed_documents_distributed", "dedup_embedding_cosine",
    "dedup_incremental_batch", "multimodal_jpeg_decode",
    "dedup_simhash_pairs", "agg_approx_count_distinct",
    "recursive_cte_subtree_rollup", "recursive_bom_extended_quantity",
    "recursive_reachability_semi_naive",
    "search_hybrid_rrf", "text_repetition_ratios", "agg_cube_flag_status",
    "dedup_semantic_clusters", "agg_weighted_median_scalable",
    "dedup_levenshtein_pairs", "join_multiway_revenue",
    "gate_log_admit_stats", "sketch_hll_mergeable", "date_funcs",
    "search_rerank_overlap", "tpch_q18_large_orders",
    "multimodal_png_decode", "events_session_window",
    "knn_filtered_adaptive_rare", "agg_weighted_median",
    "agg_pricing_summary", "tpch_q21_waiting_supplier",
    "agg_approx_percentile", "profile_orders", "window_range_frame_30d",
    "knn_label_vote", "scd2_event_state_history", "window_running_total",
    "window_rank_variants", "date_funcs2", "curation_funnel",
    "ann_ivfpq_search", "window_distribution_funcs",
    "dedup_minhash_pairs", "dedup_lsh_jaccard",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = (sys.argv[2] if len(sys.argv) > 2
                else "/tmp/resweep_top_r16.json")

    from binaryvectordb_spark.queries import QUERIES
    from binaryvectordb_spark.session import get_spark
    from binaryvectordb_spark.sources.tables import TABLE_NAMES, load_table

    spark = get_spark("bvdb-resweep-r16")
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()

    results: dict[str, dict] = {}
    for name in TOP:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"resweep:{name}")
        try:
            rows = len(fn(spark, sf_dir).collect())
            runs = []
            for _ in range(3):
                plan = fn(spark, sf_dir)
                t0 = time.perf_counter()
                plan.collect()
                runs.append(time.perf_counter() - t0)
            med = statistics.median(runs)
            results[name] = {"sec": round(med, 4),
                             "spread": round((max(runs) - min(runs)) / med, 2)
                             if med > 0 else 0.0,
                             "rows": rows}
        except Exception as e:  # noqa: BLE001
            results[name] = {"err": f"{type(e).__name__}: {e}"[:300]}
        finally:
            spark.sparkContext.setJobDescription(None)

    ordered = dict(sorted(results.items(),
                          key=lambda kv: -kv[1].get("sec", 0.0)))
    with open(out_path, "w") as f:
        json.dump(ordered, f, indent=1)
    for name, v in ordered.items():
        print(f"  {v.get('sec', 'ERR'):>8} {name}")


if __name__ == "__main__":
    main()
