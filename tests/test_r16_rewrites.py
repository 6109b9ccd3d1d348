"""Equivalence pins for the r16 optimization rewrites.

Each rewrite below restructured an operator's internals for performance
while keeping the declared result set identical; the oracle parity tests
already hash the new forms against DuckDB, and these tests additionally
pin them against the ORIGINAL Spark constructions so a future edit that
drifts the rewrite (not the oracle) is caught at the operator level.
"""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_simhash_earliest_block_equals_distinct_form(spark):
    """dedup_simhash_pairs keeps each pair only at its smallest matching
    block and drops the DISTINCT; the original blocked-join + distinct
    construction must produce the identical pair set."""
    from binaryvectordb_spark.queries.dedup import (
        dedup_simhash,
        dedup_simhash_pairs,
    )

    s = dedup_simhash(spark, SF_SMOKE)
    blocks = s.select("doc_id", "simhash", F.array(*[
        F.expr(f"shiftright(simhash, {8 * b}) & 255").alias(f"b{b}")
        for b in range(4)]).alias("blks"))
    ex = blocks.select("doc_id", "simhash",
                       F.posexplode("blks").alias("blk_idx", "blk"))
    a, b = ex.alias("a"), ex.alias("b")
    original = (a.join(b, (F.col("a.blk_idx") == F.col("b.blk_idx"))
                       & (F.col("a.blk") == F.col("b.blk"))
                       & (F.col("a.doc_id") < F.col("b.doc_id")))
                .select(F.col("a.doc_id").alias("id_a"),
                        F.col("b.doc_id").alias("id_b"),
                        F.expr("bit_count(a.simhash ^ b.simhash)")
                        .alias("hamming"))
                .distinct()
                .where(F.col("hamming") <= 6))
    assert (_sorted_rows(dedup_simhash_pairs(spark, SF_SMOKE))
            == _sorted_rows(original))


def test_simhash_earliest_block_emits_each_pair_once(spark):
    """The earliest-block predicate must make the join output already
    distinct — the property that justified dropping the DISTINCT."""
    from binaryvectordb_spark.queries.dedup import dedup_simhash_pairs

    df = dedup_simhash_pairs(spark, SF_SMOKE)
    assert df.count() == df.distinct().count()


def test_top_bigram_run_length_equals_frequency_scan(spark):
    """text_repetition_ratios counts the max bigram frequency as the max
    run length of the sorted array; pin it against the O(distinct x n)
    frequency scan on randomized token arrays, including the repetitive
    and empty shapes the fixture may never cover."""
    rng = random.Random(16)
    vocab = ["a", "b", "c", "aa", "b c"]
    arrays = [[]]
    arrays += [[rng.choice(vocab) for _ in range(rng.randint(1, 30))]
               for _ in range(60)]
    arrays.append(["x"] * 17)            # single dominant run
    arrays.append(["x", "y"] * 9)        # alternating: run length 1
    df = spark.createDataFrame([(i, a) for i, a in enumerate(arrays)],
                               "i long, bi array<string>")
    old = ("CASE WHEN size(bi) > 0 THEN array_max(transform("
           "array_distinct(bi), b -> size(filter(bi, x -> x = b)))) "
           "ELSE 0 END")
    new = ("CASE WHEN size(bi) > 0 THEN (aggregate(array_sort(bi), "
           "struct(CAST(NULL AS STRING) AS prev, 0 AS run, 0 AS best), "
           "(s, x) -> struct(x AS prev, "
           "IF(s.prev IS NOT NULL AND x = s.prev, s.run + 1, 1) AS run, "
           "greatest(s.best, IF(s.prev IS NOT NULL AND x = s.prev, "
           "s.run + 1, 1)) AS best))).best ELSE 0 END")
    rows = df.select("i", F.expr(old).alias("o"),
                     F.expr(new).alias("n")).collect()
    for r in rows:
        assert r["o"] == r["n"], f"array {r['i']}: {r['o']} != {r['n']}"


def test_q2_window_decorrelation_equals_agg_join_form(spark):
    """tpch_q2_min_cost_supplier computes the per-part minimum with a
    window; the original decorrelated aggregate-join form must return
    the identical rows."""
    from binaryvectordb_spark.queries.tpch_more import (
        _t,
        tpch_q2_min_cost_supplier,
    )

    li = _t(spark, SF_SMOKE, "lineitem")
    eligible = (_t(spark, SF_SMOKE, "supplier")
                .join(F.broadcast(_t(spark, SF_SMOKE, "nation")),
                      F.col("s_nationkey") == F.col("n_nationkey"))
                .join(F.broadcast(_t(spark, SF_SMOKE, "region")
                                  .where(F.col("r_name") == "EUROPE")),
                      F.col("n_regionkey") == F.col("r_regionkey"))
                .select("s_suppkey", "s_acctbal", "s_name", "n_name"))
    offers = (li.groupBy(F.col("l_partkey").alias("partkey"),
                         F.col("l_suppkey").alias("suppkey"))
              .agg(F.min("l_extendedprice").alias("cost")))
    ro = offers.join(F.broadcast(eligible),
                     offers.suppkey == F.col("s_suppkey"))
    mn = (ro.groupBy(F.col("partkey").alias("mk"))
          .agg(F.min("cost").alias("min_cost")))
    p = (_t(spark, SF_SMOKE, "part")
         .where((F.col("p_size") == 15) & (F.col("p_type") == "PROMO")))
    original = (ro.join(mn, (F.col("partkey") == F.col("mk"))
                        & (F.col("cost") == F.col("min_cost")))
                .join(F.broadcast(p), F.col("partkey") == F.col("p_partkey"))
                .select("s_acctbal", "s_name", "n_name", "p_partkey",
                        "p_name", F.col("cost").alias("supplycost")))
    assert (_sorted_rows(tpch_q2_min_cost_supplier(spark, SF_SMOKE))
            == _sorted_rows(original))


def test_cube_preaggregate_equals_direct_cube(spark):
    """agg_cube_flag_status / agg_grouping_sets pre-aggregate before the
    Expand; the direct cube/grouping-sets over the raw table must agree."""
    from binaryvectordb_spark.queries.relational import (
        _t,
        agg_cube_flag_status,
        agg_grouping_sets,
    )

    li = _t(spark, SF_SMOKE, "lineitem")
    direct_cube = (li.cube("l_returnflag", "l_linestatus")
                   .agg(F.count("*").alias("n"),
                        F.sum(F.col("l_quantity").cast("decimal(15,2)"))
                        .cast("double").alias("sum_qty"))
                   .select(F.coalesce("l_returnflag", F.lit("ALL"))
                           .alias("returnflag"),
                           F.coalesce("l_linestatus", F.lit("ALL"))
                           .alias("linestatus"), "n", "sum_qty"))
    assert (_sorted_rows(agg_cube_flag_status(spark, SF_SMOKE))
            == _sorted_rows(direct_cube))

    direct_gs = (li.groupingSets([["l_returnflag"], ["l_linestatus"]],
                                 "l_returnflag", "l_linestatus")
                 .agg(F.count("*").alias("n"),
                      F.sum(F.col("l_extendedprice").cast("decimal(15,2)"))
                      .cast("double").alias("sum_price"))
                 .select(F.coalesce("l_returnflag", F.lit("ALL"))
                         .alias("returnflag"),
                         F.coalesce("l_linestatus", F.lit("ALL"))
                         .alias("linestatus"), "n", "sum_price"))
    assert (_sorted_rows(agg_grouping_sets(spark, SF_SMOKE))
            == _sorted_rows(direct_gs))


def test_spread_preserves_pair_results(spark):
    """dedup._spread is a pure repartition — toggling it must not change
    the cosine/levenshtein pair sets."""
    import binaryvectordb_spark.queries.dedup as dd

    ref_cos = _sorted_rows(dd.dedup_embedding_cosine(spark, SF_SMOKE))
    ref_lev = _sorted_rows(dd.dedup_levenshtein_pairs(spark, SF_SMOKE))
    orig = dd._spread
    try:
        dd._spread = lambda df: df
        assert _sorted_rows(
            dd.dedup_embedding_cosine(spark, SF_SMOKE)) == ref_cos
        assert _sorted_rows(
            dd.dedup_levenshtein_pairs(spark, SF_SMOKE)) == ref_lev
    finally:
        dd._spread = orig
