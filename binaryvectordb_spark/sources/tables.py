"""Fixture-table sources (Parquet scans).

The reference's storage layer is a faiss index file + a RocksDB KV dir opened
at init (BinaryVectorDB/BinaryVectorDB.py:58-64).  Here every table is a
columnar Parquet scan: Catalyst pushes filters and prunes columns down to the
scan, which is what replaces the KV store's read-only-what-you-need property
(SURVEY §1.3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts has shipped as either parquet TIMESTAMP(NANOS) (which
        # Spark's vectorized reader surfaces only as int64 via the legacy
        # conf) or TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ).  Normalize both
        # to a plain TIMESTAMP so downstream windows/aggregates see one type:
        #   int64 nanos  -> truncate to micros (same truncation DuckDB applies
        #                   casting TIMESTAMP_NS -> TIMESTAMP)
        #   ntz micros   -> cast; wall-clock is preserved (cast interprets and
        #                   collect renders in the same session zone), so the
        #                   values DuckDB reads from the file match exactly.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts", "")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type != "timestamp":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all fixture tables as temp views for spark.sql queries."""
    for n in TABLE_NAMES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL / JSONL.GZ ingest (gzip transparent) — mirrors the reference's
    example pipeline (examples/create_new_db.py:31-34) as a distributed scan."""
    return spark.read.json(path)
