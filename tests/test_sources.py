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


def test_orc_and_csv_roundtrip(spark, tmp_path):
    """Format width: the same table written/read as ORC and CSV (with
    explicit schema — CSV carries no types) must round-trip exactly."""
    src = load_table(spark, SF_SMOKE, "nation")
    want = sorted((r.n_nationkey, r.n_name, r.n_regionkey)
                  for r in src.collect())

    orc_path = str(tmp_path / "nation_orc")
    src.write.mode("overwrite").orc(orc_path)
    got_orc = sorted((r.n_nationkey, r.n_name, r.n_regionkey)
                     for r in spark.read.orc(orc_path).collect())
    assert got_orc == want

    csv_path = str(tmp_path / "nation_csv")
    src.write.mode("overwrite").option("header", True).csv(csv_path)
    got_csv = sorted(
        (r.n_nationkey, r.n_name, r.n_regionkey)
        for r in spark.read.options(header=True)
        .schema("n_nationkey int, n_name string, n_regionkey int")
        .csv(csv_path).collect())
    assert got_csv == want
