"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship three-phase k-NN cascade on sf0.001 (SURVEY §3.1).
queries()     -> every implemented operator from SURVEY §2, keyed by name.
oracle_sql()  -> matching DuckDB ANSI SQL for the value-hash correctness gate.

All real logic lives in binaryvectordb_spark/; this module is a thin shim.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: 3-phase quantized k-NN cascade (hamming top-100 ->
    <float,binary> top-30 -> <float,int8> cosine top-10) on sf0.001."""
    from binaryvectordb_spark.queries.vector import knn_cascade
    return knn_cascade(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from binaryvectordb_spark.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from binaryvectordb_spark.queries import ORACLES
    return dict(ORACLES)
