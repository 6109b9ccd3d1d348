"""Gated ingest + event analytics — the round-9 curation/analytics surface:

  streaming doc batches
    -> MinHash/LSH near-dup GATE vs the live corpus (batch side broadcasts)
    -> admitted docs upsert into the DB (text index maintained)
    -> parquet gate-log audit trail
  then, over the event fixtures:
    -> funnel conversion, cohort retention, SCD2 state history,
       point-in-time join, transition matrix

Every stage is a DataFrame transform; the gate record is the only thing
driver-side, and only because this demo prints it."""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryvectordb_spark import BinaryVectorDB
from binaryvectordb_spark.operators.ingest_gate import gated_add_documents_df
from binaryvectordb_spark.queries.analytics3 import (
    events_funnel_conversion,
    events_transition_matrix,
    join_point_in_time_scd2,
)
from binaryvectordb_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("example-gated-ingest")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="bvdb_gate_")

    db = BinaryVectorDB(spark, os.path.join(work, "db"), dim=32)
    db.add_documents(
        [1, 2, 3],
        ["parquet footers carry row group statistics for pruning",
         "watermarks bound state in streaming aggregations cleanly",
         "binary embeddings rank candidates by hamming distance"])

    batch = spark.createDataFrame(
        [(11, "parquet footers carry row group statistics for skipping"),
         (12, "broadcast joins keep the fact table un-shuffled"),
         (13, "watermarks bound state in streaming aggregations cleanly")],
        "doc_id long, text string")
    rec = gated_add_documents_df(db, batch)
    print("gate decisions:")
    for r in rec.orderBy("doc_id").collect():
        print(f"  doc {r['doc_id']}: admit={r['admit']} "
              f"candidates={r['n_candidates']} best_j={r['best_jaccard']}")
    print(f"corpus size after gated ingest: {len(db)} (started at 3)")

    rep = db.verify_integrity()
    print(f"structural integrity audit: {len(rep)} checks, "
          f"{sum(v for v in rep.values())} violations")

    print("\nfunnel conversion:")
    for r in events_funnel_conversion(spark, SF_DIR).orderBy("stage").collect():
        print(f"  {r['stage']}: {r['n_users']} users")

    print("\ntransition matrix (top 5 by count):")
    tm = events_transition_matrix(spark, SF_DIR)
    for r in tm.orderBy(tm.n.desc(), "from_type", "to_type").limit(5).collect():
        print(f"  {r['from_type']} -> {r['to_type']}: n={r['n']} p={r['p']:.3f}")

    print("\npoint-in-time SCD2 join (3 sample rows):")
    for r in join_point_in_time_scd2(spark, SF_DIR).orderBy("event_id") \
            .limit(3).collect():
        print(f"  purchase event {r['event_id']} (user {r['user_id']}) "
              f"hit state '{r['state']}' v{r['version']}")


if __name__ == "__main__":
    main()
