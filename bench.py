"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing protocol: one untimed warm-up of the flagship query absorbs JVM/
codegen/file-listing cold costs (the reference's numbers are steady-state
in-memory scans, README.md:14-15); each query is then timed end-to-end
(plan + execute + collect).
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "knn_cascade",            # the reference's flagship operation
    "knn_phase1_hamming",     # binary-only search (README.md:14)
    "knn_bruteforce_cosine",  # float32 exact baseline (README.md:13)
    "ann_ivf_search",
    "agg_pricing_summary",
    "join_multiway_revenue",
    "window_topk_per_customer",
    "dedup_minhash_pairs",
    "dedup_lsh_jaccard",      # LSH-pruned exact Jaccard (the scale path)
    "knn_cascade_batch",      # multi-query serving throughput
    "events_session_window",
    "text_token_stats",
    "multimodal_decode_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from binaryvectordb_spark.queries import QUERIES
    from binaryvectordb_spark.session import get_spark

    spark = get_spark("bvdb-bench")
    spark.sparkContext.setLogLevel("ERROR")

    QUERIES["knn_cascade"](spark, sf_dir).collect()  # warm-up (untimed)

    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).collect()
        times[name] = round(time.perf_counter() - t0, 4)

    out = {
        "metric": "headline query wall-clock at sf" + sf,
        "value": round(sum(times.values()), 4),
        "unit": "sec",
        "queries": times,
        "sf": float(sf),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
    sys.exit(0)
