"""Interleaved same-session attribution for the round-8 1M-family drift
(VERDICT r8 item 1): cascade_1m +39%, hamming_scan_1m +27%,
index_build_1m -17%, pq_adc_scan_1m +28% vs the round-7 bench record.

What the commit record already establishes (BENCH_DETAIL.json per commit,
all on this machine):

- hamming_scan_1m / pq_adc_scan_1m / index_build_1m are computed on code
  byte-identical between the r7 and r8 commits, and they run BEFORE any
  r8-touched path executes inside bench.py (the db ingest with the
  doc_id-sorted bucket write happens after them; HEADLINE and the
  section order did not change).  An "A/B across the commits" for those
  keys is therefore an A/A by construction.
- Two round-8 sessions on IDENTICAL final code recorded cascade_1m
  0.2173 (commit 0e90200's session) vs 0.3098 (the driver's session) —
  a +43% same-code swing, larger than the +39% r7->r8 delta being
  investigated.  index_build_1m swung 0.6554 -> 0.4879 (-26%) between
  two r8 sessions whose code differed only in docs.

What this harness adds, in one session so drift hits every arm equally:

1. A/A pairs of the three untouched keys (fresh 1M setup, bench.py's
   exact plan shapes, 7 interleaved rounds, first 2 discarded): the
   within-session spread PLUS the across-session scatter above bounds
   what pure noise looks like for each key.
2. The one nameable r8 ingest-path change — the within-bucket doc_id
   sort at write (commit a9d3985) — A/B'd directly via the
   db._SORT_BUCKETS_AT_WRITE knob: ingest wall-clock (3 interleaved
   timed `add_batch_df` per arm over a 250k corpus, fresh DB dir each)
   and the point-read benefit side (get_docs latency on the two
   layouts, interleaved), since the sorted layout's effect on the warm
   serving trio is nil by construction (the trio reads memoized cached
   tiers, not the bucket files).

Run from the repo root:  python examples/ab_r8_1m_family.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "2g")


def _interleave(pairs, rounds=7, discard=2):
    """pairs: list of (name, thunk). Runs every thunk once per round,
    interleaved; reports per-name median + spread over kept rounds."""
    for _, fn in pairs:  # untimed: absorb codegen cold cost
        fn()
    runs = {name: [] for name, _ in pairs}
    for _ in range(rounds):
        for name, fn in pairs:
            t0 = time.perf_counter()
            fn()
            runs[name].append(time.perf_counter() - t0)
    out = {}
    for name, rs in runs.items():
        kept = rs[discard:]
        med = statistics.median(kept)
        out[name] = (med, (max(kept) - min(kept)) / med)
        print(f"  {name}: median {med:.4f}s spread "
              f"{(max(kept) - min(kept)) / med:.2f} runs "
              f"{[round(r, 3) for r in kept]}", flush=True)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from binaryvectordb_spark.db import BinaryVectorDB
    from binaryvectordb_spark.functions.vector import (
        NUM_LANES,
        hamming,
        pack_bits,
    )
    from binaryvectordb_spark.operators.cascade import (
        build_doc_store,
        build_index,
        cascade_search,
    )
    from binaryvectordb_spark.operators.pq import (
        adc_score_expr,
        pq_encode,
        train_pq,
    )
    from binaryvectordb_spark.session import get_spark
    from binaryvectordb_spark.sources.tables import load_table

    spark = get_spark("ab-r8-1m")
    spark.sparkContext.setLogLevel("ERROR")

    dim, n_target = 64, 1_000_000
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    copies = max(1, n_target // n)
    par = spark.sparkContext.defaultParallelism
    big = (emb.crossJoin(spark.range(copies).select(F.col("id").alias("rep")))
           .select((F.col("vec_id") + F.col("rep") * n).alias("vec_id"),
                   "embedding")
           .repartition(par, "vec_id")
           .cache())
    index = build_index(big, dim).cache()
    index.count()
    store = build_doc_store(big).cache()
    store.count()

    q = (emb.where(F.col("vec_id") == 0)
         .select(F.col("embedding").alias("qvec"),
                 pack_bits("embedding", dim).alias("qbits")))

    # bench.py's exact plan shapes
    fresh = big.select((F.col("vec_id") + 0).alias("vec_id"), "embedding")
    build = build_index(fresh, dim).select(
        F.expr("aggregate(vec, 0, (a, x) -> a + bit_count(x))").alias("s"))

    def index_build():
        build.agg(F.sum("s")).collect()

    def scan():
        (index.join(F.broadcast(q))
         .select("doc_id", hamming("qbits", "vec", NUM_LANES(dim)).alias("d"))
         .orderBy(F.asc("d"), F.asc("doc_id")).limit(100).collect())

    def cascade():
        cascade_search(index, store, dim,
                       query_df=q.select("qvec", "qbits")).collect()

    books = train_pq(big, dim, id_col="vec_id", emb_col="embedding")
    codes = pq_encode(big, books, id_col="vec_id", emb_col="embedding").cache()
    codes.count()
    qvec0 = [float(v) for v in
             emb.where(F.col("vec_id") == 0).first()["embedding"]]

    def adc():
        (codes.select("pq_id",
                      adc_score_expr(np.asarray(qvec0), books).alias("s"))
         .orderBy(F.desc("s"), F.asc("pq_id")).limit(100).collect())

    print("== Part 1: A/A pairs on the r7<->r8 UNTOUCHED 1M keys "
          "(noise bound) ==", flush=True)
    _interleave([("index_build_A", index_build), ("index_build_B", index_build),
                 ("hamming_scan_A", scan), ("hamming_scan_B", scan),
                 ("pq_adc_A", adc), ("pq_adc_B", adc),
                 ("cascade_A", cascade), ("cascade_B", cascade)])
    codes.unpersist()

    print("== Part 2: A/B of the r8 doc_id-sorted bucket write "
          "(commit a9d3985) ==", flush=True)
    small = (big.where(F.col("vec_id") % 4 == 0)
             .select(F.col("vec_id").alias("doc_id"),
                     F.concat(F.lit("doc "), F.col("vec_id")).alias("doc"),
                     "embedding")
             .cache())
    n_small = small.count()
    print(f"  ingest corpus: {n_small} rows", flush=True)

    def ingest(sorted_write: bool) -> BinaryVectorDB:
        d = tempfile.mkdtemp(prefix=f"ab_ingest_{int(sorted_write)}_")
        BinaryVectorDB._SORT_BUCKETS_AT_WRITE = sorted_write
        try:
            db = BinaryVectorDB(spark, d, dim=dim)
            db.add_batch_df(small)
            return db
        finally:
            BinaryVectorDB._SORT_BUCKETS_AT_WRITE = True

    # ingest cost, 3 interleaved timed runs per arm (fresh dir each)
    sorted_runs, unsorted_runs = [], []
    keep = {}
    for i in range(3):
        for arm, runs in (("sorted", sorted_runs), ("unsorted", unsorted_runs)):
            t0 = time.perf_counter()
            db = ingest(arm == "sorted")
            runs.append(time.perf_counter() - t0)
            if i == 2:
                keep[arm] = db  # last pair kept for the read-side A/B
            else:
                shutil.rmtree(db.folder, ignore_errors=True)
    for arm, runs in (("sorted", sorted_runs), ("unsorted", unsorted_runs)):
        med = statistics.median(runs)
        print(f"  ingest_{arm}: median {med:.3f}s runs "
              f"{[round(r, 2) for r in runs]}", flush=True)

    # benefit side: point reads on the two layouts (disk path, pushdown)
    ids = [4, 40004, 123456, 500000, 777776, 999996]
    _interleave(
        [("get_docs_sorted", lambda: keep["sorted"].get_docs(ids)),
         ("get_docs_unsorted", lambda: keep["unsorted"].get_docs(ids))])
    for db in keep.values():
        shutil.rmtree(db.folder, ignore_errors=True)


if __name__ == "__main__":
    main()
