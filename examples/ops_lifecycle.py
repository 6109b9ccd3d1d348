"""Operational lifecycle of a BinaryVectorDB — the round-9 ops surface:

  mutate  -> verify_integrity()   (structural audit, both tiers)
          -> expect(checks)       (user data rules, version-keyed audit)
          -> diff_versions()      (CDC between committed snapshots)
          -> export_snapshot()    (standalone clone for promotion/backup)

Everything here is what a pipeline runs between "the job finished" and
"the snapshot is published"."""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from binaryvectordb_spark import BinaryVectorDB
from binaryvectordb_spark.operators.expectations import (
    accepted_values,
    expr_check,
    not_null,
)
from binaryvectordb_spark.session import get_spark


def main() -> None:
    spark = get_spark("example-ops-lifecycle")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="bvdb_ops_")

    db = BinaryVectorDB(spark, os.path.join(work, "db"), dim=32,
                        retain_versions=4)
    db.add_documents([1, 2, 3], ["binary embeddings rank by hamming",
                                 "parquet footers prune row groups",
                                 "ok"])                       # v1
    db.add_documents([2, 4], ["parquet footers prune row groups fast",
                              "watermarks bound streaming state"])  # v2

    rep = db.verify_integrity()
    print(f"structural audit: {len(rep)} checks, "
          f"{sum(rep.values())} violations")

    checks = [not_null("doc"), accepted_values("doc_kind", ["str", "json"]),
              expr_check("min_len(5)", F.length("doc") < 5)]
    audit = db.expect(checks)
    print("data-rule audit:", audit)
    print("audit history versions:",
          [h["version"] for h in db.audit_history()])

    print("\nCDC v1 -> head:")
    for r in db.diff_versions(1).orderBy("doc_id").collect():
        print(f"  doc {r['doc_id']}: {r['change_type']}")

    clone_path = os.path.join(work, "clone")
    db.export_snapshot(clone_path)
    clone = BinaryVectorDB(spark, clone_path, dim=32)
    print(f"\nclone opened: {len(clone)} docs, audit clean ="
          f" {all(v == 0 for v in clone.verify_integrity().values())}")
    clone.remove_docs([4])
    print(f"mutation isolation: clone={len(clone)} docs, source={len(db)}")


if __name__ == "__main__":
    main()
