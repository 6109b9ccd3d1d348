"""Scalar function surface (SURVEY §2.7): string / date / math / array / json
functions over the fixtures, each oracled in DuckDB.

The reference's only scalar hook is the docs2text concat callback
(BinaryVectorDB/BinaryVectorDB.py:67,86-90; README.md:109 title+" "+text) —
mirrored here by ``string_funcs``'s concat_ws.  Everything else is EXT.

Dialect notes: only regex constructs identical in Java regex and RE2 are used
([0-9]+ etc.); no libm-divergent math (ln/exp/pow) — sqrt/abs/ceil/floor/
round are exact or identically-rounded in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binaryvectordb_spark.queries import register
from binaryvectordb_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_brand", "[0-9]+", 0).alias("brand_num"),
        F.substring("p_name", 1, 3).alias("name_prefix"),
        F.lower(F.trim(F.col("p_type"))).alias("type_lower"),
        F.col("p_name").contains("red").alias("has_red"))


register("string_funcs", string_funcs, oracle="""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       length(p_name) AS name_len,
       split_part(p_name, ' ', 1) AS first_word,
       concat_ws('-', p_brand, p_type) AS brand_type,
       regexp_extract(p_brand, '[0-9]+', 0) AS brand_num,
       substring(p_name, 1, 3) AS name_prefix,
       lower(trim(p_type)) AS type_lower,
       contains(p_name, 'red') AS has_red
FROM part
""")


def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .alias("days_since_epoch"),
        F.last_day(F.col("o_orderdate")).cast("timestamp_ntz").alias("month_end"))


register("date_funcs", date_funcs, oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(month(o_orderdate) AS INTEGER) AS mo,
       CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
       CAST(day(o_orderdate) AS INTEGER) AS dom,
       date_trunc('month', o_orderdate) AS month_start,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
            AS INTEGER) AS days_since_epoch,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end
FROM orders
""")


def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 10 == 0)
    return li.select(
        "l_orderkey", "l_linenumber",
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.ceil(F.col("l_extendedprice") / 100).cast("long").alias("price_ceil"),
        F.floor(F.col("l_extendedprice") / 100).cast("long").alias("price_floor"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        # exact decimal product then decimal HALF_UP round — double round()
        # diverges across engines on the exact .xx5 products this data hits
        F.expr("CAST(ROUND(CAST(l_extendedprice AS DECIMAL(15,2)) * "
               "CAST(l_discount AS DECIMAL(4,2)), 2) AS DOUBLE)")
        .alias("disc_amount"),
        (F.col("l_partkey") % 7).alias("part_mod"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"))


register("math_funcs", math_funcs, oracle="""
SELECT l_orderkey, l_linenumber,
       abs(l_quantity - 25) AS qty_dev,
       CAST(ceil(l_extendedprice / 100) AS BIGINT) AS price_ceil,
       CAST(floor(l_extendedprice / 100) AS BIGINT) AS price_floor,
       sqrt(l_quantity) AS qty_sqrt,
       CAST(ROUND(CAST(l_extendedprice AS DECIMAL(15,2)) *
                  CAST(l_discount AS DECIMAL(4,2)), 2) AS DOUBLE) AS disc_amount,
       l_partkey % 7 AS part_mod,
       CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
FROM lineitem WHERE l_orderkey % 10 = 0
""")


def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops over the embedding column — size / element access / filtered
    aggregate (F.aggregate left-to-right fold = list_sum order)."""
    e = _t(spark, sf_dir, "embeddings")
    return e.select(
        F.col("vec_id").alias("doc_id"),
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.expr("aggregate(embedding, CAST(0 AS DOUBLE), "
               "(a, x) -> a + CAST(x AS DOUBLE))").alias("vec_sum"),
        F.expr("size(filter(embedding, x -> x >= CAST(0 AS FLOAT)))")
        .alias("n_positive"),
        F.expr("CAST(array_max(embedding) AS DOUBLE)").alias("max_val"))


register("array_funcs", array_funcs, oracle="""
SELECT vec_id AS doc_id,
       CAST(length(embedding) AS INTEGER) AS dim,
       CAST(embedding[1] AS DOUBLE) AS first_val,
       list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS vec_sum,
       CAST(length(list_filter(embedding, x -> x >= 0)) AS INTEGER) AS n_positive,
       CAST(list_max(embedding) AS DOUBLE) AS max_val
FROM embeddings
""")


def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json / get_json_object over events.props (SURVEY §1.2: the JSON
    column in the driver fixtures)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (ev.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.count("k").alias("n"),
                 F.sum("k").alias("sum_k"),
                 F.min("k").alias("min_k"),
                 F.max("k").alias("max_k")))


register("json_funcs", json_funcs, oracle="""
WITH x AS (SELECT event_type,
                  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
           FROM events)
SELECT event_type, count(k) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k, max(k) AS max_k
FROM x GROUP BY event_type
""")


def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: parse events.props into map<string,int>,
    then key/value extraction (SURVEY §2.7 map fns).  Map columns themselves
    don't hash portably, so the outputs are scalars."""
    ev = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.map_keys(m).getItem(0).alias("first_key"),
        F.size(m).alias("n_keys"),
        F.element_at(m, "k").alias("k_value"))


register("map_funcs", map_funcs, oracle="""
SELECT event_id,
       json_keys(props)[1] AS first_key,
       CAST(length(json_keys(props)) AS INTEGER) AS n_keys,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value
FROM events
""")


def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: transform / filter / exists / slice /
    sort over the embedding column, reduced to portable scalars."""
    e = _t(spark, sf_dir, "embeddings")
    return e.select(
        F.col("vec_id").alias("doc_id"),
        F.expr("size(filter(embedding, x -> x > CAST(0.1 AS FLOAT)))")
        .alias("n_above"),
        F.expr("exists(embedding, x -> x < CAST(-0.3 AS FLOAT))")
        .alias("has_low"),
        F.expr("CAST(element_at(slice(embedding, 1, 4), 2) AS DOUBLE)")
        .alias("second_of_head"),
        F.expr("CAST(element_at(array_sort(embedding), 1) AS DOUBLE)")
        .alias("min_via_sort"),
        F.expr("aggregate(transform(embedding, x -> CAST(abs(x) AS DOUBLE)), "
               "CAST(0 AS DOUBLE), (a, x) -> a + x)").alias("l1_norm"))


register("array_higher_order", array_higher_order, oracle="""
SELECT vec_id AS doc_id,
       CAST(length(list_filter(embedding, x -> x > CAST(0.1 AS FLOAT)))
            AS INTEGER) AS n_above,
       length(list_filter(embedding, x -> x < CAST(-0.3 AS FLOAT))) > 0
         AS has_low,
       CAST(embedding[1:4][2] AS DOUBLE) AS second_of_head,
       CAST(list_sort(embedding)[1] AS DOUBLE) AS min_via_sort,
       list_sum(list_transform(embedding, x -> CAST(abs(CAST(x AS DOUBLE))
                AS DOUBLE))) AS l1_norm
FROM embeddings
""")


def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic: add_months / date_add / months_between (integral
    part only — the fractional month definitions differ across engines)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.add_months(F.col("o_orderdate"), 3).alias("plus_3m"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("plus_30d"),
        F.floor(F.months_between(F.lit("2002-01-01").cast("date"),
                                 F.col("o_orderdate"))).cast("int")
        .alias("whole_months_to_2002"))


register("date_arithmetic", date_arithmetic, oracle="""
SELECT o_orderkey,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3m,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS plus_30d,
       -- Spark months_between floors to whole months only when the target
       -- day-of-month (the 1st) has been reached; DuckDB date_diff('month')
       -- counts boundary crossings instead, so state Spark's rule directly
       CAST((2002 - year(o_orderdate)) * 12 + (1 - month(o_orderdate))
            - CASE WHEN day(o_orderdate) > 1 THEN 1 ELSE 0 END
            AS INTEGER) AS whole_months_to_2002
FROM orders
""")


def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_replace normalization chain (collapse whitespace, strip
    digits) — the cleanup step ahead of fingerprint/dedup."""
    d = _t(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(F.col("text")), "[0-9]+", ""),
        "  +", " "))
    return d.select("doc_id", F.md5(norm).alias("norm_hash"),
                    F.length(norm).alias("norm_len"))


register("text_normalize", text_normalize, oracle="""
SELECT doc_id,
       md5(trim(regexp_replace(regexp_replace(lower(text), '[0-9]+', '', 'g'),
                               '  +', ' ', 'g'))) AS norm_hash,
       CAST(length(trim(regexp_replace(regexp_replace(lower(text), '[0-9]+', '', 'g'),
                                       '  +', ' ', 'g'))) AS INTEGER) AS norm_len
FROM documents
""")
