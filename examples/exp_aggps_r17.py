"""VERDICT r16 item 7: does the `_spread` treatment pay for
`agg_pricing_summary` (scaling ratio ~1 at sf0.1 — the lineitem parquet
is one row-group, so the stage-1 partial agg runs on one core)?

Interleaved A/B in ONE session: the committed form vs the same
construction with a round-robin repartition of the filtered scan ahead
of the first groupBy (parallel partial agg at the cost of an O(corpus)
exchange).  Identity asserted first (decimal +/* are exact, so the
result cannot depend on partitioning — still checked).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build(spark, sf_dir: str, spread: bool):
    from binaryvectordb_spark.queries.relational import _t

    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate")
                                             <= "2001-09-01")
    if spread:
        li = li.repartition(spark.sparkContext.defaultParallelism)
    d = F.col("l_discount").cast("decimal(4,2)")
    t = F.col("l_tax").cast("decimal(4,2)")
    inner = (li.groupBy("l_returnflag", "l_linestatus",
                        d.alias("d"), t.alias("t"))
             .agg(F.sum(F.col("l_quantity").cast("decimal(8,2)")).alias("s_qty"),
                  F.sum(F.col("l_extendedprice").cast("decimal(8,2)")).alias("s_price"),
                  F.sum(d).alias("s_disc"),
                  F.count("*").alias("n")))
    one = F.lit(1).cast("decimal(3,2)")
    rev_c = one - F.col("d")
    chg_c = rev_c * (one + F.col("t"))
    return (inner.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("s_qty").cast("double").alias("sum_qty"),
        F.sum("s_price").cast("double").alias("sum_base_price"),
        F.sum(F.col("s_price") * rev_c).cast("double").alias("sum_disc_price"),
        F.sum(F.col("s_price") * chg_c).cast("double").alias("sum_charge"),
        (F.sum("s_qty").cast("double") / F.sum("n")).alias("avg_qty"),
        (F.sum("s_disc").cast("double") / F.sum("n")).alias("avg_disc"),
        F.sum("n").alias("count_order")))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from binaryvectordb_spark.session import get_spark

    spark = get_spark("exp-aggps-r17")
    spark.sparkContext.setLogLevel("ERROR")

    base = {tuple(sorted(r.asDict().items()))
            for r in build(spark, sf_dir, False).collect()}
    spreaded = {tuple(sorted(r.asDict().items()))
                for r in build(spark, sf_dir, True).collect()}
    assert base == spreaded, "identity violated"
    print("identity OK")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    acc = {False: [], True: []}
    for rnd in range(5):
        for spread in (False, True):
            df = build(spark, sf_dir, spread)
            t0 = time.perf_counter()
            noop(df)
            acc[spread].append(time.perf_counter() - t0)
    off = statistics.median(acc[False])
    on = statistics.median(acc[True])
    print(f"off {off:.3f}s  on(spread) {on:.3f}s  "
          f"runs off={[round(x, 3) for x in acc[False]]} "
          f"on={[round(x, 3) for x in acc[True]]}")


if __name__ == "__main__":
    main()
