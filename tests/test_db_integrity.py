"""db.verify_integrity(): the pre-publish structural audit — zero
violations on a healthy DB through upserts/deletes/typed payloads, and a
real detection when a bucket file is physically misplaced."""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np

from binaryvectordb_spark.db import BinaryVectorDB


def test_integrity_clean_through_mutations(spark, tmp_path):
    db = BinaryVectorDB(spark, str(tmp_path / "db"), dim=16, buckets=4)
    db.add_documents([1, 2, 3], ["a b c", "d e f", "g h i"])
    db.add_documents([2, 40], ["d e f updated", {"k": 1}])  # upsert + json
    db.remove_doc(3)
    rep = db.verify_integrity()
    assert rep and all(v == 0 for v in rep.values()), rep
    # both tiers audited, incl. placement + parity
    assert "index.unique(doc_id)" in rep
    assert "docs.docs_bucket_placement" in rep
    assert "index.foreign_key(doc_id->doc_id)" in rep


def test_integrity_empty_db(spark, tmp_path):
    db = BinaryVectorDB(spark, str(tmp_path / "db"), dim=16)
    assert db.verify_integrity() == {}


def test_integrity_detects_misplaced_bucket_file(spark, tmp_path):
    """Reads are manifest-pinned, so a stray file on disk is invisible (a
    good property on its own).  The corruption that CAN happen is a buggy
    writer REGISTERING a file under the wrong bucket key — simulate by
    committing a manifest version that lists a copy of bucket 1's docs
    file under bucket 2.  Point reads pruned to bucket 2 would now serve
    bucket-1 rows; the placement, unique, and tier-parity checks must all
    surface it."""
    import json

    db = BinaryVectorDB(spark, str(tmp_path / "db"), dim=16, buckets=4)
    db.add_documents(list(range(8)), [f"doc {i} text" for i in range(8)])
    assert all(v == 0 for v in db.verify_integrity().values())

    root = str(tmp_path / "db")
    src = sorted(glob.glob(os.path.join(root, "documents", "bucket=1",
                                        "*.parquet")))[0]
    dst = os.path.join(root, "documents", "bucket=2", "smuggled.parquet")
    shutil.copy(src, dst)
    log_dir = db._log_dir()
    latest = sorted(glob.glob(os.path.join(log_dir, "v*.json")))[-1]
    with open(latest) as f:
        m = json.load(f)
    m["tables"]["documents"]["2"].append("smuggled.parquet")
    v = int(os.path.basename(latest)[1:-5]) + 1
    with open(os.path.join(log_dir, f"v{v:010d}.json"), "w") as f:
        json.dump(m, f)

    db2 = BinaryVectorDB(spark, root, dim=16, buckets=4)
    rep = db2.verify_integrity()
    assert rep["docs.docs_bucket_placement"] > 0, rep
    assert rep["docs.unique(doc_id)"] > 0, rep    # duplicated keys
    assert rep["index.foreign_key(doc_id->doc_id)"] == 0, rep
