"""Scalar-function pack 2 (SURVEY §2.7 EXT) + moment-based statistics.

Native ``corr``/``stddev`` use single-pass co-moment updates whose fold
order differs between engines (nondeterministic ULPs) — so the statistics
here are built from EXACT decimal power sums, with the final arithmetic
written as the identical double expression in both engines: every +,-,*,/ and
sqrt is IEEE-correctly-rounded, so identical operand order => identical bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binaryvectordb_spark.queries import register
from binaryvectordb_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.translate("c_name", "0123456789", "##########").alias("masked"),
        F.lpad("c_mktsegment", 12, ".").alias("seg_lpad"),
        F.rpad("c_mktsegment", 12, ".").alias("seg_rpad"),
        F.reverse(F.col("c_name")).alias("name_rev"),
        F.repeat(F.lit("ab"), 3).alias("rep"),
        F.expr("left(c_name, 4)").alias("name_left"),
        F.expr("right(c_name, 4)").alias("name_right"),
        F.instr(F.col("c_name"), "1").alias("pos_one"),
        F.ascii(F.col("c_mktsegment")).alias("seg_ascii"),
        F.col("c_name").startswith("Customer").alias("is_cust"),
        F.col("c_mktsegment").endswith("ING").alias("seg_ing"),
        F.regexp_replace("c_name", "[0-9]+", "N").alias("name_norm"))


register("string_funcs2", string_funcs2, oracle="""
SELECT c_custkey,
       translate(c_name, '0123456789', '##########') AS masked,
       lpad(c_mktsegment, 12, '.') AS seg_lpad,
       rpad(c_mktsegment, 12, '.') AS seg_rpad,
       reverse(c_name) AS name_rev,
       repeat('ab', 3) AS rep,
       left(c_name, 4) AS name_left,
       right(c_name, 4) AS name_right,
       CAST(strpos(c_name, '1') AS INTEGER) AS pos_one,
       CAST(ascii(c_mktsegment) AS INTEGER) AS seg_ascii,
       starts_with(c_name, 'Customer') AS is_cust,
       ends_with(c_mktsegment, 'ING') AS seg_ing,
       regexp_replace(c_name, '[0-9]+', 'N', 'g') AS name_norm
FROM customer
""")


def date_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.dayofyear("o_orderdate").alias("doy"),
        (F.dayofweek("o_orderdate") - 1).alias("dow_sun0"),
        F.add_months(F.col("o_orderdate").cast("date"), 2).alias("plus2mo"),
        F.make_date(F.year("o_orderdate"), F.month("o_orderdate"), F.lit(1))
        .alias("month_first"),
        F.unix_timestamp(F.col("o_orderdate")).alias("epoch_s"))


register("date_funcs2", date_funcs2, oracle="""
SELECT o_orderkey,
       CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
       CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
       CAST(dayofweek(o_orderdate) AS INTEGER) AS dow_sun0,
       CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS plus2mo,
       make_date(CAST(year(o_orderdate) AS INTEGER),
                 CAST(month(o_orderdate) AS INTEGER), 1) AS month_first,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
FROM orders
""")


# x = l_quantity (<= 50, 2dp), y = l_discount (<= 0.1, 2dp): every power
# sum stays far below 2^53 in scaled-integer form, so BOTH engines convert
# decimal -> double EXACTLY.  (With l_extendedprice, sum(y^2) ~ 6e17 at
# sf0.001 already exceeds 2^53: DuckDB's int128/10^scale conversion then
# double-rounds and drifts 1 ULP from Spark's correctly-rounded BigDecimal
# conversion — measured.)
_MOM = """
  count(*) AS n,
  CAST(sum(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS sx,
  CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sy,
  CAST(sum(CAST(l_quantity AS DECIMAL(15,2)) * CAST(l_quantity AS DECIMAL(15,2)))
       AS DOUBLE) AS sxx,
  CAST(sum(CAST(l_discount AS DECIMAL(4,2)) * CAST(l_discount AS DECIMAL(4,2)))
       AS DOUBLE) AS syy,
  CAST(sum(CAST(l_quantity AS DECIMAL(15,2)) * CAST(l_discount AS DECIMAL(4,2)))
       AS DOUBLE) AS sxy
"""

_STATS = """
  CAST(n AS BIGINT) AS n,
  sx / n AS mean_qty,
  sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_qty,
  (sxy - sx * sy / n) / (n - 1) AS covar_qty_disc,
  (sxy - sx * sy / n)
    / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)) AS corr_qty_disc
"""


def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev / covariance / correlation (qty vs discount) per returnflag from exact decimal
    power sums — order-independent where native corr/stddev are not."""
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("li_stats_base")
    return spark.sql(f"""
        WITH m AS (SELECT l_returnflag, {_MOM}
                   FROM li_stats_base GROUP BY l_returnflag)
        SELECT l_returnflag, {_STATS} FROM m
    """)


register("agg_stats_moments", agg_stats_moments, oracle=f"""
WITH m AS (SELECT l_returnflag, {_MOM} FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, {_STATS} FROM m
""")
