"""Source/sink coverage (SURVEY §2.1): JSONL(.gz) ingest (the reference's
example pipeline, examples/create_new_db.py:31-34), partitioned parquet
write + partition-pruned read-back."""

from __future__ import annotations

import gzip
import json

from pyspark.sql import functions as F

from binaryvectordb_spark.plans import formatted_plan
from binaryvectordb_spark.sources.tables import load_table, read_jsonl
from tests.conftest import SF_SMOKE


def test_jsonl_gz_ingest(spark, tmp_path):
    path = tmp_path / "docs.jsonl.gz"
    with gzip.open(path, "wt") as f:
        for i in range(25):
            f.write(json.dumps({"_id": i, "title": f"t{i}",
                                "text": f"body {i}"}) + "\n")
    df = read_jsonl(spark, str(path))
    assert df.count() == 25
    assert {"_id", "title", "text"} <= set(df.columns)
    assert df.where(F.col("_id") == 7).first().title == "t7"


def test_partitioned_write_and_pruned_read(spark, tmp_path):
    """Partition-by-column write; a filtered read must prune partitions
    (the physical layout strategy for the 100 TB documents table)."""
    out = str(tmp_path / "docs_by_lang")
    docs = load_table(spark, SF_SMOKE, "documents")
    docs.write.partitionBy("lang").mode("overwrite").parquet(out)

    back = spark.read.parquet(out)
    assert back.count() == docs.count()

    filtered = back.where(F.col("lang") == "de")
    plan = formatted_plan(filtered)
    # partition pruning shows up as a PartitionFilters entry on the scan
    assert "PartitionFilters: [isnotnull(lang" in plan
    want = docs.where(F.col("lang") == "de").count()
    assert filtered.count() == want
