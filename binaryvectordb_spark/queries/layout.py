"""Layout optimization as oracle-checkable queries: the z-order (Morton)
math and its clustering quality, value-hashed cross-engine.

The physical effect — row-group skipping measured from real parquet
footers after a range-partitioned z-ordered write — is pinned by
tests/test_zorder.py and tracked by the bench zorder_* keys; this module
pins the MATH: rank scaling, bit interleave, and the per-z-run column
bounds that make the skipping work, all exact integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binaryvectordb_spark.operators.zorder import interleave_expr, scale_expr
from binaryvectordb_spark.queries import register
from binaryvectordb_spark.sources.tables import load_table

N_BUCKETS = 32
# bucket divisor: z < 2^32 (16 bits per dim), so 32 contiguous z-runs of
# width 2^27 model 32 output files of a range-partitioned write
_ZDIV = 1 << 27


def layout_zorder_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order events on (user_id, floor(value*100)) and profile the 32
    prospective files (contiguous z-runs): row count and per-column
    min/max.  TIGHT per-run bounds on BOTH columns are exactly what a
    stats-aware reader prunes with — this output IS the skipping quality,
    engine-checked.  All arithmetic is integer (scale DIV, shift/mask
    interleave) so the hash is exact."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("vb"))
    stats = e.agg(F.min("user_id").alias("ux"), F.max("user_id").alias("uy"),
                  F.min("vb").alias("vx"), F.max("vb").alias("vy"))
    xn = scale_expr("user_id", "ux", "uy")
    yn = scale_expr("vb", "vx", "vy")
    z = e.crossJoin(F.broadcast(stats)).select(
        "user_id", "vb",
        F.expr(interleave_expr(xn, yn, dialect="spark")).alias("zval"))
    return (z.groupBy(F.expr(f"zval DIV {_ZDIV}").alias("zrun"))
            .agg(F.count("*").alias("n"),
                 F.min("user_id").alias("min_user"),
                 F.max("user_id").alias("max_user"),
                 F.min("vb").alias("min_vb"),
                 F.max("vb").alias("max_vb"))
            .orderBy("zrun"))


_DUCK_XN = scale_expr("user_id", "ux", "uy").replace(" DIV ", " // ")
_DUCK_YN = scale_expr("vb", "vx", "vy").replace(" DIV ", " // ")

register("layout_zorder_clustering", layout_zorder_clustering, oracle=f"""
WITH e AS (
  SELECT event_id, user_id, CAST(floor(value * 100) AS BIGINT) AS vb
  FROM events
), stats AS (
  SELECT min(user_id) AS ux, max(user_id) AS uy,
         min(vb) AS vx, max(vb) AS vy FROM e
), z AS (
  SELECT user_id, vb,
         {interleave_expr(_DUCK_XN, _DUCK_YN, dialect="duck")} AS zval
  FROM e CROSS JOIN stats
)
SELECT zval // {_ZDIV} AS zrun, count(*) AS n,
       min(user_id) AS min_user, max(user_id) AS max_user,
       min(vb) AS min_vb, max(vb) AS max_vb
FROM z GROUP BY 1 ORDER BY zrun
""")
