"""Batch-serving walkthrough — the extensions beyond the reference's API:
search_batch (N queries, one index scan), filtered search (metadata
predicate pre-applied to the index), and compact (small-file maintenance
after many micro-upserts)."""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryvectordb_spark import BinaryVectorDB
from binaryvectordb_spark.session import get_spark


def main() -> None:
    spark = get_spark("example-batch-serving")
    spark.sparkContext.setLogLevel("ERROR")
    db = BinaryVectorDB(spark, tempfile.mkdtemp(prefix="bvdb_batch_"), dim=32)

    # several small upsert batches (the streaming-sink pattern)
    for lo in range(0, 40, 10):
        ids = list(range(lo, lo + 10))
        db.add_documents(ids, [f"document {i} about topic {i % 4}" for i in ids])
    print(f"corpus: {len(db)} docs")

    # N queries against ONE index scan — per-query cost amortizes
    results = db.search_batch(
        ["document 3 topic", "topic 2 document", "document 25"], k=3)
    for q, hits in enumerate(results):
        print(f"query {q}:")
        for h in hits:
            print(f"  {h['doc_id']}  cossim={h['score_cossim']:.4f}  {h['doc']}")

    # metadata-filtered serving: extra ingest columns become filterable
    # metadata, commit-time stats make dict filters zero-extra-job
    import numpy as np
    rng = np.random.RandomState(0)
    rows = [(100 + i, f"tagged doc {i}", [float(x) for x in
             rng.uniform(-1, 1, 32)], ["en", "de"][i % 2]) for i in range(10)]
    meta_db = BinaryVectorDB(spark, tempfile.mkdtemp(prefix="bvdb_meta_"),
                             dim=32)
    meta_db.add_batch_df(
        spark.createDataFrame(
            rows,
            "doc_id: long, doc: string, embedding: array<float>, lang: string"),
        meta_cols=["lang"])
    print("table stats:", meta_db.table_stats()["columns"]["lang"])
    hits = meta_db.search(rows[0][2], k=3, filter={"lang": "en"})
    print("filtered search (lang=en):",
          [(h["doc_id"], h["strategy"]) for h in hits])

    # maintenance: fold the micro-batch files back into few partitions
    db.compact(target_partitions=2)
    print(f"after compact: {len(db)} docs (content unchanged)")


if __name__ == "__main__":
    main()
