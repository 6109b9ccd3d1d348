"""Hybrid text serving walkthrough: the persisted inverted index
(build / incremental upsert / phrase query / compact), the DB-surface
lexical + hybrid search with MaxSim rerank, RAM-tier + batch + cross-
process hybrid serving (round 9), and OPTIMIZE ZORDER on the doc store.

Run: python examples/hybrid_text_serving.py  (uses the sf0.001 fixtures)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from binaryvectordb_spark.session import get_spark
from binaryvectordb_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("example-hybrid-text")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. A standalone inverted index over the documents fixture
    from binaryvectordb_spark.operators.textindex import TextIndex

    tdir = tempfile.mkdtemp(prefix="ti_example_")
    ti = TextIndex(spark, tdir).build(load_table(spark, SF, "documents"))
    print("BM25 top-5:", [(r["doc_id"], r["bm25_e10"])
                          for r in ti.search(("vector", "merge"), k=5)
                          .collect()])
    print("phrase 'order fast' top-5:",
          [(r["doc_id"], r["n_occurrences"])
           for r in ti.search_phrase(("order", "fast"), k=5).collect()])

    # 2. Incremental maintenance: one new segment per batch, tombstones
    #    kill the replaced postings; compact() folds back to one segment
    upd = spark.createDataFrame([(0, "order fast order fast")],
                                "doc_id: long, text: string")
    ti.add_documents(upd)
    print("after upsert:", [(r["doc_id"], r["n_occurrences"])
                            for r in ti.search_phrase(("order", "fast"),
                                                      k=3).collect()])
    ti.compact()
    print("segments after compact:", ti.meta["segments"])

    # 2b. The early-termination tier (rounds 13-15): fmt-3 impact-
    #     ordered postings prove exact top-k from a high-impact prefix;
    #     N-query batches ride one thresholded read at the union of the
    #     members' proven frontiers (selective+dense members route
    #     through the batched MaxScore split), and mutated (dirty)
    #     states re-derive scores with live stats — every mode is
    #     bit-identical to the classic plan by proof or by descent
    print("block-max single:",
          [(r["doc_id"], r["bm25_e10"])
           for r in ti.search(("vector", "merge"), k=5,
                              block_max=True).collect()])
    batch = {0: ("vector",), 1: ("merge", "scan"), 2: ("order", "fast")}
    rows = ti.search_batch(batch, k=3, block_max=True).collect()
    print("block-max batch:",
          sorted((r["qid"], r["kw_rank"], r["doc_id"]) for r in rows))
    info = ti.last_blockmax_batch
    print("  batch engagement:", info["split_served"], "split-served,",
          info["rounds"], "descent rounds")
    ti.remove([1, 2, 3])  # dirty state: the tier keeps serving, exact
    print("dirty block-max:",
          [(r["doc_id"], r["bm25_e10"])
           for r in ti.search(("vector", "merge"), k=5,
                              block_max=True).collect()])

    # 3. The DB surface: lexical index as derived state + hybrid serving
    from binaryvectordb_spark.db import BinaryVectorDB

    dbdir = tempfile.mkdtemp(prefix="db_example_")
    db = BinaryVectorDB(spark, dbdir, dim=16, buckets=4)
    rng = np.random.default_rng(5)
    texts = [f"doc {i} " + ("order fast " if i % 7 == 0 else "merge scan ")
             * 3 for i in range(200)]
    db.add_batch(list(range(200)), texts,
                 rng.standard_normal((200, 16)).astype(np.float32))
    db.build_text_index()
    qvec = rng.standard_normal(16).astype(np.float32)
    hits = db.search_hybrid(("order", "fast"), qvec, k=5,
                            maxsim_rerank=True)
    print("hybrid+maxsim:", [(h["doc_id"], h["kw_rank"], h["vec_rank"],
                              h["maxsim"]) for h in hits])

    # 3b. RAM-tier hybrid serving (round 9): attach once, then every
    #     search_text/search_hybrid call runs ZERO Spark jobs — identical
    #     answers, ~ms latency instead of the multi-job floor
    import time
    db.attach_local_serving()
    t0 = time.perf_counter()
    local_hits = db.search_hybrid(("order", "fast"), qvec, k=5)
    ms = (time.perf_counter() - t0) * 1000
    print(f"RAM-tier hybrid: {ms:.1f} ms,",
          [(h["doc_id"], h["rrf"]) for h in local_hits[:3]])

    # 3c. batch serving: the job floor amortizes across N queries
    batch = db.search_hybrid_batch(
        [("order", "fast"), ("merge", "scan")],
        [qvec, rng.standard_normal(16).astype(np.float32)], k=3)
    print("hybrid batch:", [[h["doc_id"] for h in hits] for hits in batch])

    # 3d. cross-process export: vector shards + bm25 tier in one atomic
    #     dir; any Spark-free process loads it (LocalHybridServer.load)
    out = db.export_serving_shards(n_shards=2)
    srv = db.load_hybrid_server()
    assert srv.search_hybrid(("order", "fast"), qvec, k=5) == \
        db.search_hybrid(("order", "fast"), qvec, k=5)
    print("hybrid export at", out, "serves bit-identically")

    # 4. OPTIMIZE ZORDER: filtered serving reads fewer row-group bytes
    db2dir = tempfile.mkdtemp(prefix="db_layout_example_")
    db2 = BinaryVectorDB(spark, db2dir, dim=16, buckets=4)
    from pyspark.sql import functions as F
    src = (spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("d"), F.col("id")).alias("doc"),
        F.expr("transform(sequence(1, 16), i -> "
               "CAST((id * i % 97) / 97.0 AS DOUBLE))").alias("embedding"),
        (F.col("id") * 37 % 100).alias("x"),
        (F.col("id") * 91 % 100).alias("y")))
    db2.add_batch_df(src, meta_cols=["x", "y"])
    from binaryvectordb_spark.operators.zorder import rowgroup_scan_fraction
    docs_path = os.path.join(db2dir, "documents")
    before = rowgroup_scan_fraction(docs_path, {"x": (10, 19), "y": (30, 39)})
    db2.optimize_layout(["x", "y"], row_group_bytes=8192)
    after = rowgroup_scan_fraction(docs_path, {"x": (10, 19), "y": (30, 39)})
    print(f"2-D filter row-group bytes: {before:.2f} -> {after:.2f}")


if __name__ == "__main__":
    main()
