"""Round-6 serving walkthrough — the extensions beyond the reference's
single-process serving: exporting versioned RAM-tier shards for a
cross-process serving fleet, loading them back without staleness
surprises, and the selectivity-adaptive filtered search."""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryvectordb_spark import BinaryVectorDB
from binaryvectordb_spark.session import get_spark


def main() -> None:
    spark = get_spark("example-serving-shards")
    spark.sparkContext.setLogLevel("ERROR")
    folder = tempfile.mkdtemp(prefix="bvdb_shards_")
    db = BinaryVectorDB(spark, folder, dim=32)

    ids = list(range(60))
    db.add_documents(ids, [f"document {i} about topic {i % 5}" for i in ids])

    # export the RAM tier as 4 disjoint shards (doc_id % 4), stamped with
    # the DB's committed manifest version; the export directory appears
    # atomically (staged in a tmp dir, renamed into place)
    path = db.export_serving_shards(n_shards=4)
    print(f"exported 4 shards to {path}")

    # a serving node loads the router back — numpy + json only on the
    # shard level, no Spark needed on the serving host
    router = db.load_serving_router()
    hits = router.search(db.embed_fn(["document 7 topic"])[0], k=3)
    print("router hits:", [(h["doc_id"], round(h["score_cossim"], 4))
                           for h in hits])

    # mutate the DB: the old export is now STALE, and the default-path
    # load refuses it with a re-export message instead of serving old data
    db.add_documents([100], ["a brand new document"])
    try:
        db.load_serving_router()
    except ValueError as e:
        print(f"stale export rejected: {str(e)[:80]}...")
    db.export_serving_shards(n_shards=4)
    print("re-exported at new version; load_serving_router() works again:",
          len(db.load_serving_router().search(
              db.embed_fn(["new document"])[0], k=2)), "hits")

    # adaptive filtered search: a selective predicate pre-filters the
    # index; a broad one over-fetches Phase I and post-filters candidates
    from pyspark.sql import functions as F

    from binaryvectordb_spark.operators.cascade import (
        cascade_search_filtered_adaptive,
    )
    idx, docs = db.index_df(), db.docs_df()
    qv = db.embed_fn(["document 12 topic"])[0]
    rare = docs.where(F.col("doc_id") % 5 == 2).select("doc_id")     # 20%
    broad = docs.where(F.col("doc_id") % 5 != 2).select("doc_id")    # 80%
    for name, elig in (("rare", rare), ("broad", broad)):
        hits = cascade_search_filtered_adaptive(
            idx, docs, db.dim, elig, query_vec=list(qv), k=3).collect()
        print(f"{name} predicate -> strategy={hits[0]['strategy']}, "
              f"ids={[h['doc_id'] for h in hits]}")


if __name__ == "__main__":
    main()
