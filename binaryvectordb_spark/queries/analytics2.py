"""Third analytics pack: TF-rarity term scoring (log-free TF-IDF shape),
multi-grain time rollup over events (the hypertable-continuous-aggregate
shape), and INTERSECT ALL / EXCEPT ALL (bag semantics).

Determinism: rarity uses N/df (plain IEEE division of exact integers —
correctly rounded, engine-identical) instead of log(N/df) (libm ln is NOT
correctly rounded and drifts between engines).  Ranking by tf * N/df is
order-equivalent to tf * log-idf for any fixed df ordering, so the operator
shape is faithful.

Scale notes (100 TB): term scoring is explode -> two hash aggs (df is a tiny
per-token table broadcast back); the rollup is ONE scan with grouping sets
(Spark expands grains map-side, no re-scan per grain); bag set-ops hash on
the full row like any aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binaryvectordb_spark.queries import register
from binaryvectordb_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def text_tf_rarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most characteristic tokens per document (first 50 docs) by
    tf * (N/df): term frequency weighted by inverse document frequency,
    log-free so both engines compute bit-identical doubles."""
    d = _t(spark, sf_dir, "documents")
    n_docs = d.select(F.count("*").alias("n_docs"))
    tokens = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
    tf = tokens.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_ = (tokens.groupBy("token")
           .agg(F.count_distinct("doc_id").alias("df")))
    scored = (tf.join(F.broadcast(df_), "token")
              .crossJoin(F.broadcast(n_docs))
              .select("doc_id", "token",
                      (F.col("tf").cast("double")
                       * (F.col("n_docs").cast("double")
                          / F.col("df").cast("double"))).alias("rarity")))
    from pyspark.sql import Window
    w = Window.partitionBy("doc_id").orderBy(F.desc("rarity"), F.asc("token"))
    return (scored.where(F.col("doc_id") < 50)
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
            .select("doc_id", "token", "rarity", "rn"))


register("text_tf_rarity_topk", text_tf_rarity_topk, oracle="""
WITH tokens AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), tf AS (
  SELECT doc_id, token, count(*) AS tf FROM tokens GROUP BY 1, 2
), df AS (
  SELECT token, count(DISTINCT doc_id) AS df FROM tokens GROUP BY 1
), n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, tf.token,
         CAST(tf AS DOUBLE) * (CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))
           AS rarity
  FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
)
SELECT doc_id, token, rarity, rn
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY rarity DESC, token) AS rn
      FROM scored WHERE doc_id < 50)
WHERE rn <= 3
""")


def events_multigrain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: event counts and value sums at
    hour AND day grain in ONE scan via GROUPING SETS — the grain column
    disambiguates rows (the Spark/SQL re-expression of a timeseries rollup
    cascade)."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.col("value").cast("decimal(15,2)").alias("v"))
    base.createOrReplaceTempView("ev_rollup_base")
    # grain from GROUPING(), not from hour IS NULL — a NULL ts would
    # otherwise mislabel the (event_type, hour=NULL) row as 'day'
    return spark.sql("""
        SELECT event_type, hour, day,
               CASE WHEN GROUPING(hour) = 0 THEN 'hour' ELSE 'day' END AS grain,
               count(*) AS n,
               CAST(sum(v) AS DOUBLE) AS total_value
        FROM ev_rollup_base
        GROUP BY GROUPING SETS ((event_type, hour), (event_type, day))
    """)


register("events_multigrain_rollup", events_multigrain_rollup, oracle="""
WITH base AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         date_trunc('day', ts) AS day, CAST(value AS DECIMAL(15,2)) AS v
  FROM events
)
SELECT event_type, hour, day,
       CASE WHEN GROUPING(hour) = 0 THEN 'hour' ELSE 'day' END AS grain,
       count(*) AS n, CAST(sum(v) AS DOUBLE) AS total_value
FROM base
GROUP BY GROUPING SETS ((event_type, hour), (event_type, day))
""")


def set_ops_bag_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL over order-status multisets: bag semantics
    keep duplicate multiplicity (min / difference of per-row counts), unlike
    the distinct set ops."""
    o = _t(spark, sf_dir, "orders")
    a = o.where(F.col("o_totalprice") > 100000).select("o_orderstatus")
    b = o.where(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select("o_orderstatus")
    both = (a.intersectAll(b).withColumn("op", F.lit("intersect_all"))
            .unionByName(a.exceptAll(b).withColumn("op", F.lit("except_all"))))
    return both.groupBy("op", "o_orderstatus").agg(F.count("*").alias("n"))


register("set_ops_bag_semantics", set_ops_bag_semantics, oracle="""
WITH a AS (SELECT o_orderstatus FROM orders WHERE o_totalprice > 100000),
     b AS (SELECT o_orderstatus FROM orders
           WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
SELECT op, o_orderstatus, count(*) AS n FROM (
  SELECT o_orderstatus, 'intersect_all' AS op
  FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
  UNION ALL
  SELECT o_orderstatus, 'except_all' AS op
  FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
) GROUP BY op, o_orderstatus
""")


def filter_empty_result(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Legit predicate that matches nothing — exercises empty-frame hashing
    through the whole compare pipeline (schema must still align)."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.where(F.col("l_quantity") < 0)
            .select("l_orderkey", "l_quantity"))


register("filter_empty_result", filter_empty_result, oracle="""
SELECT l_orderkey, l_quantity FROM lineitem WHERE l_quantity < 0
""")


def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (<=> / IS NOT DISTINCT FROM): NULLIF-induced nulls
    on both sides must match each other, unlike plain '=' which drops them."""
    c = _t(spark, sf_dir, "customer")
    a = c.select(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_a"))
    b = (c.select(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_b"))
         .distinct())
    return (a.join(b, F.col("seg_a").eqNullSafe(F.col("seg_b")))
            .groupBy("seg_b").agg(F.count("*").alias("n")))


register("join_null_safe_eq", join_null_safe_eq, oracle="""
WITH a AS (SELECT nullif(c_mktsegment, 'BUILDING') AS seg_a FROM customer),
     b AS (SELECT DISTINCT nullif(c_mktsegment, 'BUILDING') AS seg_b FROM customer)
SELECT seg_b, count(*) AS n
FROM a JOIN b ON seg_a IS NOT DISTINCT FROM seg_b
GROUP BY seg_b
""")


def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI FILTER-clause aggregation + boolean aggregates (bool_and /
    bool_or) — conditional aggregation without CASE scaffolding."""
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("li_filter_base")
    return spark.sql("""
        SELECT l_returnflag,
               count(*) AS n,
               count(*) FILTER (WHERE l_quantity > 25) AS n_big,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2)))
                    FILTER (WHERE l_discount > 0.05) AS DOUBLE)
                 AS discounted_revenue,
               bool_and(l_quantity > 0) AS all_positive_qty,
               bool_or(l_quantity > 49) AS any_max_qty
        FROM li_filter_base GROUP BY l_returnflag
    """)


register("agg_filter_clause", agg_filter_clause, oracle="""
SELECT l_returnflag,
       count(*) AS n,
       count(*) FILTER (WHERE l_quantity > 25) AS n_big,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2)))
            FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS discounted_revenue,
       bool_and(l_quantity > 0) AS all_positive_qty,
       bool_or(l_quantity > 49) AS any_max_qty
FROM lineitem GROUP BY l_returnflag
""")


def agg_equiwidth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-bucket equi-width histogram of order totals: bounds from a first
    aggregate (broadcast 1-row), bucket = floor((x-min)/width) clamped.
    floor() on identically-computed doubles is deterministic cross-engine."""
    o = _t(spark, sf_dir, "orders")
    bounds = o.agg(F.min("o_totalprice").alias("lo"),
                   F.max("o_totalprice").alias("hi"))
    # degenerate lo == hi guard: both engines must land in bucket 0 (Spark's
    # non-ANSI 0/0 -> NULL vs DuckDB's NaN would otherwise diverge)
    bucket = (F.when(F.col("hi") == F.col("lo"), F.lit(0))
              .otherwise(F.least(
                  F.floor((F.col("o_totalprice") - F.col("lo"))
                          / ((F.col("hi") - F.col("lo")) / 10)).cast("int"),
                  F.lit(9))))
    return (o.crossJoin(F.broadcast(bounds))
            .select(bucket.alias("bucket"))
            .groupBy("bucket").agg(F.count("*").alias("n")))


register("agg_equiwidth_histogram", agg_equiwidth_histogram, oracle="""
WITH bounds AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
                FROM orders)
SELECT CASE WHEN hi = lo THEN 0
            ELSE least(CAST(floor((o_totalprice - lo) / ((hi - lo) / 10))
                            AS INTEGER), 9) END AS bucket,
       count(*) AS n
FROM orders, bounds GROUP BY 1
""")


def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile (the pipeline pre-flight op): per-column null
    count, distinct count, and min/max for the orders table, one row per
    column, all computed in ONE scan."""
    o = _t(spark, sf_dir, "orders")
    prof = o.agg(
        F.count("*").alias("n_rows"),
        *[x for c in ("o_orderkey", "o_custkey", "o_totalprice")
          for x in (F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                    .alias(f"{c}_nulls"),
                    F.count_distinct(F.col(c)).alias(f"{c}_distinct"),
                    F.min(c).cast("double").alias(f"{c}_min"),
                    F.max(c).cast("double").alias(f"{c}_max"))])
    cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    stack = ", ".join(
        f"'{c}', {c}_nulls, {c}_distinct, {c}_min, {c}_max" for c in cols)
    return prof.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {stack}) AS "
        "(col_name, n_nulls, n_distinct, min_val, max_val)")


register("profile_orders", profile_orders, oracle="""
WITH p AS (SELECT count(*) AS n_rows,
  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS k_nulls,
  count(DISTINCT o_orderkey) AS k_distinct,
  CAST(min(o_orderkey) AS DOUBLE) AS k_min, CAST(max(o_orderkey) AS DOUBLE) AS k_max,
  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_nulls,
  count(DISTINCT o_custkey) AS c_distinct,
  CAST(min(o_custkey) AS DOUBLE) AS c_min, CAST(max(o_custkey) AS DOUBLE) AS c_max,
  CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS t_nulls,
  count(DISTINCT o_totalprice) AS t_distinct,
  CAST(min(o_totalprice) AS DOUBLE) AS t_min, CAST(max(o_totalprice) AS DOUBLE) AS t_max
  FROM orders)
SELECT n_rows, col_name, n_nulls, n_distinct, min_val, max_val FROM (
  SELECT n_rows, 'o_orderkey' AS col_name, k_nulls AS n_nulls,
         k_distinct AS n_distinct, k_min AS min_val, k_max AS max_val FROM p
  UNION ALL
  SELECT n_rows, 'o_custkey', c_nulls, c_distinct, c_min, c_max FROM p
  UNION ALL
  SELECT n_rows, 'o_totalprice', t_nulls, t_distinct, t_min, t_max FROM p)
""")
