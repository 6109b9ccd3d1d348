"""r16: A/B the agg_approx_count_distinct restructure (split the mixed
distinct/non-distinct aggregate so the Expand-based distinct rewrite no
longer carries a 16 KB HLL++ buffer per (gid, l_partkey) group).

A = registry form: one agg(approx_count_distinct, count_distinct) ->
    Expand(2x rows) + per-(gid, partkey) partial aggregation where every
    group materializes an HLL++ buffer (rsd=0.01 -> 2^14 registers).
B = two single-purpose aggregates (each a plain one-pass shape) joined
    as 1x1-row frames; identical values by construction: the exact count
    is exact, and the HLL++ estimate is a deterministic function of the
    inserted value set (register max-merge is insertion-order
    independent), so computing it alone equals computing it in the
    mixed agg.

Interleaved timing (both arms see the same host drift), identity
asserted first.  Usage: python examples/exp_aggacd_r16.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from binaryvectordb_spark.session import get_spark
    from binaryvectordb_spark.sources.tables import load_table

    spark = get_spark("bvdb-exp-aggacd-r16")
    spark.sparkContext.setLogLevel("ERROR")

    def variant_a(sf: str):
        li = load_table(spark, sf, "lineitem")
        agg = li.agg(
            F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx"),
            F.count_distinct("l_partkey").alias("exact_parts"))
        return agg.select(
            "exact_parts",
            (F.abs(F.col("approx") - F.col("exact_parts"))
             / F.col("exact_parts") < 0.05).alias("approx_within_5pct"))

    def variant_b(sf: str):
        li = load_table(spark, sf, "lineitem")
        approx = li.agg(
            F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx"))
        exact = li.agg(F.count_distinct("l_partkey").alias("exact_parts"))
        agg = exact.crossJoin(approx)   # 1x1-row frames
        return agg.select(
            "exact_parts",
            (F.abs(F.col("approx") - F.col("exact_parts"))
             / F.col("exact_parts") < 0.05).alias("approx_within_5pct"))

    # identity first, on every SF the driver checks
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", sf_dir):
        ra = [tuple(r) for r in variant_a(sf).collect()]
        rb = [tuple(r) for r in variant_b(sf).collect()]
        assert ra == rb, f"identity FAILED at {sf}: {ra} vs {rb}"
        print(f"identity ok at {sf}: {ra}")

    # warm both arms once
    variant_a(sf_dir).collect()
    variant_b(sf_dir).collect()

    runs_a, runs_b = [], []
    for i in range(5):
        for name, fn, runs in (("A", variant_a, runs_a),
                               ("B", variant_b, runs_b)):
            spark.sparkContext.setJobDescription(f"exp-aggacd:{name}:{i}")
            plan = fn(sf_dir)
            t0 = time.perf_counter()
            plan.collect()
            runs.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    ma, mb = statistics.median(runs_a), statistics.median(runs_b)
    print(f"A (mixed agg)  median {ma:.3f}s  runs {[round(r,3) for r in runs_a]}")
    print(f"B (split aggs) median {mb:.3f}s  runs {[round(r,3) for r in runs_b]}")
    print(f"B/A = {mb/ma:.3f}")


if __name__ == "__main__":
    main()
