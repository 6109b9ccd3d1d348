"""Per-event gated ingest — the serving-tier admission loop.

The micro-batch path (foreach_batch_gated_upsert) amortizes one corpus
scan per batch; a per-EVENT pipeline cannot pay that per doc.  This
example builds the RAM-tier gate once from the DB's corpus, then admits
a stream of single docs in-process (zero Spark jobs per decision,
bit-identical to the distributed gate), batching the ADMITTED docs into
one distributed upsert at the end — gate at event granularity, write at
batch granularity.

Run from the repo root:  python examples/realtime_admission.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "2g")


def main() -> None:
    from binaryvectordb_spark.db import BinaryVectorDB
    from binaryvectordb_spark.operators.ingest_gate import LocalNearDupGate
    from binaryvectordb_spark.session import get_spark

    spark = get_spark("realtime-admission")
    spark.sparkContext.setLogLevel("ERROR")

    d = tempfile.mkdtemp(prefix="bvdb_rt_admission_")
    db = BinaryVectorDB(spark, d, dim=32)
    db.add_documents(
        [1, 2, 3],
        ["the quick brown fox jumps over the lazy dog today",
         "spark shuffles hash partitions across executor memory pools",
         "vector search ranks binary embeddings by hamming distance"])
    print(f"seed corpus: {len(db)} docs")

    # one distributed build, then every decision is in-process
    gate = LocalNearDupGate.from_db(db)

    events = [
        (10, "the quick brown fox jumps over the lazy dog tonight"),  # near-dup
        (11, "completely fresh document about parquet footer statistics"),
        (12, "completely fresh document about parquet footer statistics"),  # dup of 11
        (13, "another novel sentence mentioning bloom filters and z order"),
        (1,  "the quick brown fox leaps over the lazy dog today"),  # update of 1
    ]
    admitted = []
    t0 = time.perf_counter()
    for doc_id, text in events:
        rec = gate.admit(doc_id, text)
        print(f"  doc {doc_id}: admit={rec['admit']} "
              f"(candidates={rec['n_candidates']}, dups={rec['n_dups']})")
        if rec["admit"]:
            admitted.append((doc_id, text))
    dt = (time.perf_counter() - t0) * 1000
    print(f"gated {len(events)} events in {dt:.1f} ms "
          f"({dt / len(events):.2f} ms/event, zero Spark jobs)")

    # one distributed upsert for the admitted slice
    db.add_documents_df(spark.createDataFrame(
        admitted, "doc_id long, text string"))
    print(f"corpus after upsert: {len(db)} docs "
          f"(admitted {len(admitted)}/{len(events)})")
    assert db.get_docs([10]) == {} and db.get_docs([12]) == {}
    assert db.get_docs([1])[1].startswith("the quick brown fox leaps")


if __name__ == "__main__":
    main()
