"""Central registry mapping SURVEY §2 operator inventory to (PySpark query,
DuckDB oracle SQL) pairs — the driver contract (__spark_entry__.py).

Each domain module registers its queries at import time.  Every callable takes
(spark, sf_dir) and returns a DataFrame; every oracle is ANSI SQL DuckDB runs
on the same parquet tables.  Column names/aliases MUST match pairwise — the
driver sorts columns by name and value-hashes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, fn: Callable[[SparkSession, str], DataFrame],
             oracle: str | None = None) -> None:
    assert name not in QUERIES, f"duplicate query {name}"
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


# populate — order matters only for readability of the registry
from binaryvectordb_spark.queries import (  # noqa: E402,F401
    analytics2,
    dedup,
    lateral,
    mllib_ops,
    multimodal,
    mutation,
    relational,
    scalar_funcs,
    scalar_funcs2,
    similarity,
    streaming_batch,
    textops,
    tpch_more,
    udf_surface,
    vector,
)
