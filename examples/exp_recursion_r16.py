"""r16 optimization A/B: the recursion family's per-level redundant work.

Two hypotheses, both measured interleaved in ONE session so drift hits
all arms equally (the bench protocol):

A. `recursive_reachability_semi_naive`: every level's job re-derives the
   edge frame (2 customer scans + max() agg + union).  Arm B pins the
   projected (src, dst) frame with a lazy localCheckpoint
   (`materialize_edges=True`) so the derivation runs once per call.

B. `recursive_cte_subtree_rollup` / `recursive_bom_extended_quantity`
   (native UnionLoop): Spark converts the previous level to a driver
   LocalRelation only below
   spark.sql.cteRecursionAnchorRowsLimitToConvertToLocalRelation
   (default printed below); frontiers here reach ~1k rows at sf0.1.
   Arm B raises the limit to 100000 so every level plans as a
   LocalRelation instead of a cached-RDD scan.

Identity is asserted between arms before timing.

Run:  python examples/exp_recursion_r16.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _med_spread(runs):
    med = statistics.median(runs)
    return round(med, 4), round((max(runs) - min(runs)) / med, 2)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from binaryvectordb_spark.queries import QUERIES, recursion
    from binaryvectordb_spark.session import get_spark

    spark = get_spark("bvdb-exp-recursion-r16")
    spark.sparkContext.setLogLevel("ERROR")
    conf_key = ("spark.sql.cteRecursionAnchorRowsLimit"
                "ToConvertToLocalRelation")
    print("anchor-rows-limit default:", spark.conf.get(conf_key))

    reach = QUERIES["recursive_reachability_semi_naive"]
    cte = QUERIES["recursive_cte_subtree_rollup"]
    bom = QUERIES["recursive_bom_extended_quantity"]

    # --- identity across arms, once ---------------------------------
    recursion._REACH_MATERIALIZE_EDGES = False
    base_reach = _rows(reach(spark, sf_dir))
    recursion._REACH_MATERIALIZE_EDGES = True
    assert _rows(reach(spark, sf_dir)) == base_reach, "reach diverged"
    base_cte = _rows(cte(spark, sf_dir))
    base_bom = _rows(bom(spark, sf_dir))
    spark.conf.set(conf_key, "100000")
    assert _rows(cte(spark, sf_dir)) == base_cte, "cte diverged"
    assert _rows(bom(spark, sf_dir)) == base_bom, "bom diverged"
    spark.conf.unset(conf_key)

    # --- interleaved timing: 7 rounds, first 2 discarded ------------
    arms: dict[str, list[float]] = {k: [] for k in (
        "reach_lazy", "reach_mat", "cte_def", "cte_local",
        "bom_def", "bom_local")}

    def t(fn) -> float:
        t0 = time.perf_counter()
        fn().collect()
        return time.perf_counter() - t0

    for _ in range(7):
        recursion._REACH_MATERIALIZE_EDGES = False
        arms["reach_lazy"].append(t(lambda: reach(spark, sf_dir)))
        recursion._REACH_MATERIALIZE_EDGES = True
        arms["reach_mat"].append(t(lambda: reach(spark, sf_dir)))
        arms["cte_def"].append(t(lambda: cte(spark, sf_dir)))
        arms["bom_def"].append(t(lambda: bom(spark, sf_dir)))
        spark.conf.set(conf_key, "100000")
        arms["cte_local"].append(t(lambda: cte(spark, sf_dir)))
        arms["bom_local"].append(t(lambda: bom(spark, sf_dir)))
        spark.conf.unset(conf_key)

    for k, runs in arms.items():
        med, sp = _med_spread(sorted(runs[2:])[:-1])
        print(f"{k:>12}: {med} s (spread {sp}, "
              f"runs {[round(r, 3) for r in runs]})")


if __name__ == "__main__":
    main()
