"""r16: decompose search_hybrid_rrf's 3.35 s sweep cost (sweep ranks it
the most expensive non-contrast query left).  Times each side alone and
the fused whole, all on fresh plans, collect-timed like the sweep.

Usage: python examples/exp_hybrid_r16.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t3(label, build):
    build().collect()  # warm-up
    runs = []
    for _ in range(3):
        p = build()
        t0 = time.perf_counter()
        p.collect()
        runs.append(time.perf_counter() - t0)
    med = statistics.median(runs)
    print(f"  {label:40s} {med:7.3f}s  (spread {(max(runs)-min(runs)):.2f})")
    return med


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from binaryvectordb_spark.queries.hybrid import (
        TOPN, _bm25_scored, search_hybrid_rrf)
    from binaryvectordb_spark.session import get_spark
    from binaryvectordb_spark.sources.tables import TABLE_NAMES, load_table

    spark = get_spark("bvdb-exp-hybrid-r16")
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()

    def kw_side():
        return (_bm25_scored(spark, sf_dir)
                .withColumn("kw_rank", F.row_number().over(
                    Window.orderBy(F.desc("bm25_e10"), F.asc("doc_id"))))
                .where(F.col("kw_rank") <= TOPN)
                .select("doc_id", "kw_rank"))

    def vec_side():
        from binaryvectordb_spark.functions.vector import cosine
        emb = load_table(spark, sf_dir, "embeddings")
        q = emb.where(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qv"))
        return (emb.select(F.col("vec_id").alias("doc_id"),
                           F.col("embedding").alias("dv"))
                .crossJoin(F.broadcast(q))
                .withColumn("cos", cosine("qv", "dv"))
                .withColumn("vec_rank", F.row_number().over(
                    Window.orderBy(F.desc("cos"), F.asc("doc_id"))))
                .where(F.col("vec_rank") <= TOPN)
                .select("doc_id", "vec_rank"))

    t3("kw side alone", kw_side)
    t3("vec side alone", vec_side)
    t3("full search_hybrid_rrf", lambda: search_hybrid_rrf(spark, sf_dir))

    print("\njob count for one full run:")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    sc.setJobGroup("rrf-count", "count jobs")
    search_hybrid_rrf(spark, sf_dir).collect()
    jobs = tracker.getJobIdsForGroup("rrf-count")
    print(f"  jobs in one collect: {len(jobs or [])} (before marker {before})")
    sc.setJobGroup(None, None)

    spark.stop()


if __name__ == "__main__":
    main()
