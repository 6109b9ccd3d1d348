"""Distributed EXACT global ranks — the scale-safe replacement for an
un-partitioned ``row_number()`` window.

An un-partitioned window funnels every row through ONE task (Exchange
SinglePartition + global Sort): correct, oracle-exact, and a guaranteed
bottleneck at 100 TB.  The classic distributed algorithm computes the
same total order without the funnel:

1. range-partition the frame on the order key (``repartitionByRange`` —
   Spark samples split points; every partition holds a contiguous key
   range),
2. one tiny pass collects per-partition row counts (P rows to the
   driver, P = shuffle parallelism — bytes, not data),
3. prefix-sum those counts into per-partition rank offsets, and
4. a PARTITIONED window (partitionBy spark_partition_id) assigns
   within-partition row numbers; global rank = offset + local row
   number.

Every stage is fully parallel; the only global object is the P-entry
offset map, folded into the plan as a literal CASE.  The frame is
localCheckpoint-materialized between steps 1 and 4 so both passes see
the SAME partition assignment (range split points are sampled per
action otherwise).

The caller MUST pass a TOTAL order (include a unique tie-break column):
rows equal on every order column may straddle a range boundary, and
their relative ranks would then be partition-assignment-dependent.
With a total order the result is deterministic and identical to
``row_number() OVER (ORDER BY cols)`` — pinned against the global-window
form by tests/test_analytics3_random.py and by the scale-safe registry
companions (agg_equidepth_histogram_scalable, events_funnel_latency_
scalable) hashing against the same DuckDB oracles as their exact-window
twins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_global_rank(df: DataFrame, order_cols: list[str],
                     rank_col: str = "grank",
                     num_partitions: int | None = None
                     ) -> tuple[DataFrame, int]:
    """Returns (df + ``rank_col``, total row count).  ``rank_col`` is the
    1-based global rank under ORDER BY ``order_cols`` (which must be a
    total order — include a unique key).  No un-partitioned window
    anywhere in the returned plan; the count is free (sum of the offsets
    pass)."""
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    ranged = (df.repartitionByRange(num_partitions, *cols)
              .withColumn("__pid", F.spark_partition_id())
              .localCheckpoint(eager=True))
    counts = sorted((r["__pid"], r["n"]) for r in
                    ranged.groupBy("__pid").agg(F.count("*").alias("n"))
                    .collect())
    offsets, acc = {}, 0
    for pid, n in counts:
        offsets[pid] = acc
        acc += n
    total = acc
    off: Column = F.lit(0)
    if offsets:
        off = F.coalesce(
            F.create_map(*[x for pid, o in offsets.items()
                           for x in (F.lit(pid), F.lit(o))])[F.col("__pid")],
            F.lit(0))
    w = Window.partitionBy("__pid").orderBy(*cols)
    out = (ranged
           .withColumn(rank_col, (F.row_number().over(w) + off).cast("long"))
           .drop("__pid"))
    return out, total


def ntile_from_rank(rank: Column, n: int, tiles: int) -> Column:
    """SQL ``ntile(tiles)`` bucket from a 1-based global rank over n rows
    — the exact remainder rule (first n % tiles buckets get one extra
    row), as a pure expression so the scale-safe rank path reproduces the
    global-window ntile bit-for-bit."""
    q, rem = divmod(n, tiles)
    if q == 0:  # fewer rows than tiles: bucket == rank (SQL semantics)
        return rank.cast("int")
    cut = rem * (q + 1)
    return (F.when(rank <= F.lit(cut),
                   _int_floordiv(rank - 1, q + 1).cast("int") + 1)
            .otherwise(F.lit(rem)
                       + _int_floordiv(rank - F.lit(cut) - 1,
                                       q).cast("int")
                       + 1))


def _int_floordiv(x: Column, d: int) -> Column:
    """Exact ``x // d`` for non-negative bigint ``x`` — no DOUBLE hop.

    ``(x / d).cast("int")`` rounds through DOUBLE and loses exactness
    once x exceeds 2^53 (ADVICE r10); instead strip the remainder (bigint
    ``%`` is exact) and divide the exact multiple in DECIMAL(38,0), where
    the quotient is an integer and Spark's decimal division is exact."""
    xm = x - (x % F.lit(d))
    return (xm.cast("decimal(38,0)")
            / F.lit(d).cast("decimal(38,0)")).cast("long")


def with_group_prefix_sum(df: DataFrame, group_cols: list[str],
                          order_cols: list[str], weight_col: str,
                          cum_col: str = "cum",
                          num_partitions: int | None = None
                          ) -> tuple[DataFrame, dict]:
    """Distributed EXACT per-group running sums — the scale-safe
    replacement for ``sum(w) OVER (PARTITION BY g ORDER BY ...)`` when
    groups are FEW and HUGE (the few-hot-groups funnel: a partitioned
    window still pushes each whole group through one task).

    Same machinery as with_global_rank, generalized: range-partition on
    (group, order) — each partition holds a contiguous slice of one or a
    few groups — collect per-(partition, group) weight sums (O(P + G)
    driver rows), prefix-sum them into per-(partition, group) offsets,
    then a (partition, group)-keyed window computes local running sums;
    global running sum = offset + local.  The weight must be integral
    (bigint/decimal) for the re-associated partial sums to be exact.

    Returns (df + ``cum_col``, {group tuple: total}) — the totals fall
    out of the offsets pass for free.  Order must be total per group."""
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    gcols = [F.col(c) for c in group_cols]
    ocols = [F.col(c) for c in order_cols]
    ranged = (df.repartitionByRange(num_partitions, *gcols, *ocols)
              .withColumn("__pid", F.spark_partition_id())
              .localCheckpoint(eager=True))
    part_sums = (ranged.groupBy("__pid", *group_cols)
                 .agg(F.sum(weight_col).alias("w"))
                 .collect())
    per_group: dict = {}
    for r in sorted(part_sums, key=lambda r: r["__pid"]):
        key = tuple(r[c] for c in group_cols)
        per_group.setdefault(key, []).append((r["__pid"], r["w"]))
    offset_rows, totals = [], {}
    for key, parts in per_group.items():
        acc = 0
        for pid, w in parts:
            offset_rows.append((pid, *key, acc))
            acc += w
        totals[key] = acc
    spark = df.sparkSession
    off_schema = (["__pid int"]
                  + [f"{c} {t}" for c, t in
                     zip(group_cols,
                         [dict(df.dtypes)[c] for c in group_cols])]
                  + ["__off long"])
    off_df = spark.createDataFrame(offset_rows, ", ".join(off_schema))
    w = (Window.partitionBy("__pid", *group_cols).orderBy(*ocols)
         .rowsBetween(Window.unboundedPreceding, 0))
    out = (ranged.withColumn("__local", F.sum(weight_col).over(w))
           .join(F.broadcast(off_df), ["__pid", *group_cols], "left")
           .withColumn(cum_col,
                       (F.col("__local")
                        + F.coalesce("__off", F.lit(0))).cast("long"))
           .drop("__pid", "__local", "__off"))
    return out, totals
