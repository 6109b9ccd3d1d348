"""Batch-mode equivalents of the streaming operators (SURVEY §2.9) — Spark's
windowing functions have identical semantics in batch and streaming, so the
driver can value-hash these against ANSI-SQL oracles; tests/test_streaming.py
separately proves the real readStream pipelines produce the same results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from binaryvectordb_spark.queries import register
from binaryvectordb_spark.sources.tables import load_table


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(F.col("value").cast("decimal(15,2)"))
                 .cast("double").alias("sum_value"))
            .select(F.col("win.start").alias("win_start"), "event_type",
                    "n", "sum_value"))


register("events_tumbling_window", events_tumbling_window, oracle="""
SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, event_type,
       count(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(15,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
""")


def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1h windows sliding every 30min — every event lands in exactly 2
    windows (the streaming F.window(width, slide) operator in batch mode)."""
    ev = _events(spark, sf_dir)
    return (ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("win"))
            .agg(F.count("*").alias("n"),
                 F.countDistinct("user_id").alias("n_users"))
            .select(F.col("win.start").alias("win_start"), "n", "n_users"))


register("events_sliding_window", events_sliding_window, oracle="""
WITH assigned AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS win_start, user_id FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'
         AS win_start, user_id FROM events)
SELECT win_start, count(*) AS n, count(DISTINCT user_id) AS n_users
FROM assigned GROUP BY win_start
""")


def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (5 min) per user — Spark's native
    session_window; the oracle derives identical sessions with the classic
    lag + cumulative-sum construction."""
    ev = _events(spark, sf_dir)
    return (ev.groupBy(F.session_window("ts", "5 minutes").alias("win"),
                       "user_id")
            .agg(F.count("*").alias("n_events"),
                 F.sum(F.col("value").cast("decimal(15,2)"))
                 .cast("double").alias("sum_value"))
            .select("user_id", F.col("win.start").alias("session_start"),
                    F.col("win.end").alias("session_end"), "n_events",
                    "sum_value"))


register("events_session_window", events_session_window, oracle="""
WITH o AS (SELECT user_id, ts, value, event_id,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    AS prev_ts
           FROM events),
marked AS (SELECT *, CASE WHEN prev_ts IS NULL
                          OR ts - prev_ts >= INTERVAL '5 minutes'
                          THEN 1 ELSE 0 END AS new_session
           FROM o),
sessions AS (SELECT *, SUM(new_session) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             FROM marked)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL '5 minutes' AS session_end,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(15,2))) AS DOUBLE) AS sum_value
FROM sessions GROUP BY user_id, sid
""")


def events_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch shape of streaming dropDuplicates-within-watermark: first event
    per (user_id, event_type) in event-time order."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (ev.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("user_id", "event_type", "event_id",
                    F.col("ts").alias("first_ts")))


register("events_dedup_first", events_dedup_first, oracle="""
SELECT user_id, event_type, event_id, ts AS first_ts FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts, event_id) AS rn
  FROM events) WHERE rn = 1
""")


def events_click_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming/events.py stream_stream_click_purchase_join:
    every purchase joined to the same user's clicks in the preceding 30
    minutes (interval join), rolled up per purchase.  The streaming test
    proves the watermarked stream-stream join matches this; the oracle
    value-hashes the semantics."""
    ev = _events(spark, sf_dir)
    clicks = (ev.where(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("ts").alias("click_ts")))
    purchases = (ev.where(F.col("event_type") == "purchase")
                 .select("user_id", F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("purchase_ts")))
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")),
        "left")
    return (joined.groupBy("purchase_id", "user_id", "purchase_ts")
            .agg(F.count("click_ts").alias("n_clicks_before"),
                 F.max("click_ts").alias("last_click_ts")))


register("events_click_purchase_attribution", events_click_purchase_attribution,
         oracle="""
WITH clicks AS (SELECT user_id AS c_user, ts AS click_ts FROM events
                WHERE event_type = 'click'),
purchases AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
              FROM events WHERE event_type = 'purchase')
SELECT purchase_id, user_id, purchase_ts,
       count(click_ts) AS n_clicks_before,
       max(click_ts) AS last_click_ts
FROM purchases LEFT JOIN clicks
  ON user_id = c_user AND click_ts <= purchase_ts
 AND click_ts >= purchase_ts - INTERVAL 30 MINUTE
GROUP BY purchase_id, user_id, purchase_ts
""")
