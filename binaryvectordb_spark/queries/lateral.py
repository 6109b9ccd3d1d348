"""Lateral / generator surface (SURVEY §2.7-2.8 EXT): explode/posexplode
(Spark's UDTF-shaped built-ins), sequence-driven gap filling for time series,
and ordered-argument aggregates (min_by/max_by).

Scale notes (100 TB): explode is a narrow (no-shuffle) row generator, so
token counting is scan -> generate -> partial hash agg; the gap-fill grid is
(n_types x n_days) — tiny — and broadcast-joined against the aggregated
counts, never against raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binaryvectordb_spark.queries import register
from binaryvectordb_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def explode_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus tokens: split each document on single spaces, explode,
    count.  Tie order pinned by (count desc, token asc) so the LIMIT is
    deterministic across engines."""
    d = _t(spark, sf_dir, "documents")
    return (d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
            .groupBy("token").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), F.asc("token")).limit(20))


register("explode_token_topk", explode_token_topk, oracle="""
SELECT token, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token ORDER BY n DESC, token LIMIT 20
""")


def posexplode_embedding_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (position + value) of the first 4 dimensions of the first
    20 vectors — the ordinality-preserving lateral unnest."""
    e = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 20)
    return (e.select("vec_id",
                     F.posexplode(F.slice(F.col("embedding"), 1, 4))
                     .alias("pos", "val")))


register("posexplode_embedding_head", posexplode_embedding_head, oracle="""
SELECT vec_id, i - 1 AS pos, embedding[i] AS val
FROM embeddings, generate_series(1, 4) AS t(i)
WHERE vec_id < 20
""")


def events_gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event counts per type over the fixed fixture month, with missing
    (type, day) cells filled as zero: a dense calendar grid built with
    sequence()+explode, LEFT-joined against the aggregated counts.  The grid
    (5 types x 30 days) is broadcast; raw events are touched once."""
    ev = _t(spark, sf_dir, "events")
    counts = (ev.groupBy("event_type",
                         F.date_trunc("day", F.col("ts")).alias("day"))
              .agg(F.count("*").alias("cnt")))
    days = spark.range(1).select(
        F.explode(F.sequence(
            F.lit("2024-01-01").cast("timestamp"),
            F.lit("2024-01-30").cast("timestamp"),
            F.expr("INTERVAL 1 DAY"))).alias("day"))
    types = ev.select("event_type").distinct()
    grid = F.broadcast(types.crossJoin(days))
    return (grid.join(counts, ["event_type", "day"], "left")
            .select("event_type", "day",
                    F.coalesce(F.col("cnt"), F.lit(0)).alias("n")))


register("events_gap_fill_daily", events_gap_fill_daily, oracle="""
WITH grid AS (
  SELECT event_type, day
  FROM (SELECT DISTINCT event_type FROM events),
       (SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
                                      TIMESTAMP '2024-01-30',
                                      INTERVAL 1 DAY)) AS day)
), counts AS (
  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS cnt
  FROM events GROUP BY 1, 2
)
SELECT grid.event_type, grid.day, coalesce(cnt, 0) AS n
FROM grid LEFT JOIN counts USING (event_type, day)
""")


def agg_min_by_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by / max_by per nation, ordered by the UNIQUE c_custkey so the
    picked row is deterministic in both engines (ordering by a non-unique
    column would make the argmin/argmax tie-dependent)."""
    c = _t(spark, sf_dir, "customer")
    return (c.groupBy("c_nationkey")
            .agg(F.min_by("c_name", "c_custkey").alias("first_cust"),
                 F.max_by("c_name", "c_custkey").alias("last_cust"),
                 F.count("*").alias("n")))


register("agg_min_by_max_by", agg_min_by_max_by, oracle="""
SELECT c_nationkey, min_by(c_name, c_custkey) AS first_cust,
       max_by(c_name, c_custkey) AS last_cust, count(*) AS n
FROM customer GROUP BY c_nationkey
""")


def window_range_frame_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, not row-based): per customer, the sum of
    order totals in the trailing 30 days of each order — ordered by epoch
    seconds so both engines use identical numeric range arithmetic."""
    from pyspark.sql import Window
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate",
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.col("o_totalprice").cast("decimal(15,2)").alias("price"))
    w = (Window.partitionBy("o_custkey").orderBy("epoch_s")
         .rangeBetween(-30 * 86400, 0))
    return (o.select("o_orderkey", "o_custkey",
                     F.sum("price").over(w).cast("double")
                     .alias("trailing_30d_total"),
                     F.count("*").over(w).alias("trailing_30d_orders")))


register("window_range_frame_30d", window_range_frame_30d, oracle="""
SELECT o_orderkey, o_custkey,
       CAST(sum(CAST(o_totalprice AS DECIMAL(15,2))) OVER w AS DOUBLE)
         AS trailing_30d_total,
       count(*) OVER w AS trailing_30d_orders
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
""")


def explode_outer_null_preserving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: rows whose generator input is empty survive with NULL
    (plain explode drops them).  Tokens from names filtered to a rare
    pattern make most arrays empty."""
    c = _t(spark, sf_dir, "customer")
    toks = F.filter(F.split(F.col("c_name"), ""),
                    lambda x: x == F.lit("7"))
    return (c.select("c_custkey", F.explode_outer(toks).alias("seven"))
            .groupBy("seven").agg(F.count("*").alias("n")))


register("explode_outer_null_preserving", explode_outer_null_preserving, oracle="""
WITH t AS (
  SELECT c_custkey,
         list_filter(string_split(c_name, ''), x -> x = '7') AS sevens
  FROM customer
)
SELECT seven, count(*) AS n FROM (
  SELECT unnest(sevens) AS seven FROM t WHERE len(sevens) > 0
  UNION ALL
  SELECT NULL AS seven FROM t WHERE len(sevens) = 0
) GROUP BY seven
""")
