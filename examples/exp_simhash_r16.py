"""r16: decompose dedup_simhash_pairs (resweep ranks it #1 at ~10 s
sf0.1 contended) and A/B the _PIN_SHARED toggle at sf0.1 — the §3 pin
A/B ran at sf0.001 only, and the resweep suggests sf0.1 behaves
differently.  Interleaved arms, fresh plans, collect-timed.

Usage: python examples/exp_simhash_r16.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(build, n=3):
    build().collect()
    runs = []
    for _ in range(n):
        p = build()
        t0 = time.perf_counter()
        p.collect()
        runs.append(time.perf_counter() - t0)
    return statistics.median(runs), runs


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    import binaryvectordb_spark.queries.dedup as dd
    from binaryvectordb_spark.session import get_spark
    from binaryvectordb_spark.sources.tables import TABLE_NAMES, load_table

    spark = get_spark("bvdb-exp-simhash-r16")
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()

    # stage decomposition (pin ON, the committed state)
    med, _ = timed(lambda: dd.dedup_simhash(spark, sf_dir))
    print(f"  simhash agg alone                 {med:7.3f}s")

    def pairs_pre_distinct():
        s = dd.dedup_simhash(spark, sf_dir)
        blocks = s.select("doc_id", "simhash", F.array(*[
            F.expr(f"shiftright(simhash, {8 * b}) & 255").alias(f"b{b}")
            for b in range(4)]).alias("blks"))
        ex = blocks.select("doc_id", "simhash",
                           F.posexplode("blks").alias("blk_idx", "blk"))
        ex = ex.localCheckpoint(eager=False)
        a, b = ex.alias("a"), ex.alias("b")
        return (a.join(b, (F.col("a.blk_idx") == F.col("b.blk_idx"))
                       & (F.col("a.blk") == F.col("b.blk"))
                       & (F.col("a.doc_id") < F.col("b.doc_id")))
                .select(F.col("a.doc_id").alias("id_a"),
                        F.col("b.doc_id").alias("id_b"),
                        F.expr("bit_count(a.simhash ^ b.simhash)")
                        .alias("hamming")))

    n_pairs = pairs_pre_distinct().count()
    print(f"  candidate pairs before distinct:  {n_pairs}")
    med, _ = timed(lambda: pairs_pre_distinct().groupBy().count())
    print(f"  join side only (count, no distinct) {med:7.3f}s")

    # interleaved pin A/B on the full query
    res_on = dd.dedup_simhash_pairs(spark, sf_dir).collect()
    arms = {"pin_on": [], "pin_off": []}
    for _ in range(4):
        for name, flag in (("pin_on", True), ("pin_off", False)):
            dd._PIN_SHARED = flag
            p = dd.dedup_simhash_pairs(spark, sf_dir)
            t0 = time.perf_counter()
            rows = p.collect()
            arms[name].append(time.perf_counter() - t0)
            assert sorted(map(tuple, rows)) == sorted(map(tuple, res_on)), \
                f"IDENTITY VIOLATION arm={name}"
    dd._PIN_SHARED = True
    for name, runs in arms.items():
        print(f"  full query {name:8s} median {statistics.median(runs):7.3f}s"
              f"  runs {[round(r, 2) for r in runs]}")

    spark.stop()


if __name__ == "__main__":
    main()
