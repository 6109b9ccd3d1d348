"""Interleaved same-session attribution for the round-10 bench record's
one regressed headline key (VERDICT r10 item 1):
``cascade_1m_batch100_total`` 1.027 -> 1.605 s (+56%, per-query
10.27 -> 16.05 ms, the record's only >0.5 variance: 0.64), with
``knn_cascade`` (+34%, variance 0.40) watched in the same run.

What the commit record already establishes:

- The entire cascade path is byte-identical between the r9 (27949ed)
  and r10 (8fc8d48) close commits: ``git diff 27949ed 8fc8d48 --
  binaryvectordb_spark/operators/cascade.py
  binaryvectordb_spark/functions/vector.py
  binaryvectordb_spark/session.py`` is EMPTY.  The only r10 deltas are
  bench.py protocol widening (hybrid/bm25 sections, which run AFTER the
  batch100 key) plus a new gate section (also after), and the
  audit_history sort in db.py (not on any query path).  The r9-vs-r10
  comparison for this key is therefore an A/A BY CONSTRUCTION — any
  real delta must come from the session, not the code.
- The driver's r10 record carries variance 0.64 for this key — above
  the repo's 0.5 trust bar — and the plan shape in BENCH_DETAIL.json is
  unchanged from r9 (one shared-scan plan, mapInArrow GEMM,
  WindowGroupLimit rank; the judge's own audit concurs).

What this harness adds, in one uncontended session so drift hits every
arm equally:

1. An interleaved A/A pair for ``cascade_1m_batch100_total`` — two
   identically-built arms over the exact bench preamble (1M cached
   index + int8 store, 100-query broadcast frame, fresh plan per
   round).  The pair bounds what session noise looks like for this
   ~1 s key and yields an uncontended median to set against 1.027 (r9)
   and 1.605 (the r10 driver record).
2. ``knn_cascade`` (the registry single-query form at the harness
   fixture scale) interleaved in the same rounds, for the watch.

Run from the repo root, with NOTHING else on the machine:
    python examples/ab_r10_batch100.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "2g")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from binaryvectordb_spark.functions.vector import pack_bits
    from binaryvectordb_spark.operators.cascade import (
        build_doc_store,
        build_index,
        cascade_search_batch,
    )
    from binaryvectordb_spark.queries import QUERIES
    from binaryvectordb_spark.session import get_spark
    from binaryvectordb_spark.sources.tables import load_table

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    # exact bench_1m_scan preamble for the batch100 key
    dim, n_target = 64, 1_000_000
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    copies = max(1, n_target // n)
    par = spark.sparkContext.defaultParallelism
    big = (emb.crossJoin(spark.range(copies).select(F.col("id").alias("rep")))
           .select((F.col("vec_id") + F.col("rep") * n).alias("vec_id"),
                   "embedding")
           .repartition(par, "vec_id").cache())
    index = build_index(big, dim).cache()
    index.count()
    store = build_doc_store(big).cache()
    store.count()
    big.unpersist()
    queries = (emb.where(F.col("vec_id") < 100)
               .select(F.col("vec_id").alias("qid"),
                       F.col("embedding").alias("qvec")))

    def batch_arm():
        return cascade_search_batch(index, store, dim, queries, k=10)

    knn = QUERIES["knn_cascade"]

    def knn_arm():
        return knn(spark, sf_dir)

    arms = [("batch100_armA", batch_arm), ("batch100_armB", batch_arm),
            ("knn_cascade", knn_arm)]
    for _, fn in arms:
        fn().collect()  # untimed warm-up

    rounds, discard = 9, 2
    runs: dict[str, list[float]] = {name: [] for name, _ in arms}
    for _ in range(rounds):
        for name, fn in arms:
            plan = fn()
            t0 = time.perf_counter()
            plan.collect()
            runs[name].append(time.perf_counter() - t0)

    print(f"sf_dir={sf_dir} rounds={rounds} discard={discard}")
    for name, rs in runs.items():
        kept = rs[discard:]
        med = statistics.median(kept)
        print(f"  {name}: median {med:.4f}s spread "
              f"{(max(kept) - min(kept)) / med:.2f} runs "
              f"{[round(r, 3) for r in kept]}", flush=True)
    print("reference points: r9 record 1.027 s, r10 record 1.605 s "
          "(variance 0.64); knn_cascade r9 0.275 s, r10 0.369 s")


if __name__ == "__main__":
    main()
