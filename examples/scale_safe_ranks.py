"""Measured A/B of the exact-rank analytics: global/hot-group WINDOW
forms vs the distributed-rank/prefix-sum SCALE-SAFE twins
(operators/ranks.py), interleaved in one session at sf0.1.

The twins exist for the 100 TB shape (an un-partitioned window funnels
every row through one task; a 3-hot-group window funnels each group
through one task) — but they must also not LOSE at the fixture scale,
where the funnel fits in one task comfortably and the twins pay a
localCheckpoint + a tiny driver offsets round trip.  This harness prints
both sides so NOTES can record the measured local-scale overhead next to
the plan-shape argument.

Run from the repo root, uncontended:
    python examples/scale_safe_ranks.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "2g")


def _interleave(pairs, rounds=7, discard=2):
    for _, fn in pairs:
        fn().collect()
    runs = {name: [] for name, _ in pairs}
    for _ in range(rounds):
        for name, fn in pairs:
            plan = fn()
            t0 = time.perf_counter()
            plan.collect()
            runs[name].append(time.perf_counter() - t0)
    for name, rs in runs.items():
        kept = rs[discard:]
        med = statistics.median(kept)
        print(f"  {name}: median {med:.4f}s spread "
              f"{(max(kept) - min(kept)) / med:.2f} runs "
              f"{[round(r, 3) for r in kept]}", flush=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from binaryvectordb_spark.queries.analytics3 import (
        agg_equidepth_histogram,
        agg_equidepth_histogram_scalable,
        agg_weighted_median,
        agg_weighted_median_scalable,
        events_funnel_latency,
        events_funnel_latency_scalable,
    )
    from binaryvectordb_spark.session import get_spark
    from binaryvectordb_spark.sources.tables import TABLE_NAMES, load_table

    spark = get_spark("scale-safe-ranks-ab")
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()

    # NOTE: the scale-safe thunks re-run their offsets pass every call
    # (with_global_rank collects fresh per-call) — the timed number is the
    # FULL per-call cost including that pass, the honest comparison.
    print("== equi-depth histogram (orders): window vs distributed-rank ==",
          flush=True)
    _interleave([
        ("equidepth_window", lambda: agg_equidepth_histogram(spark, sf_dir)),
        ("equidepth_ranks",
         lambda: agg_equidepth_histogram_scalable(spark, sf_dir)),
    ])
    print("== weighted median (lineitem): hot-group window vs prefix-sum ==",
          flush=True)
    _interleave([
        ("wmedian_window", lambda: agg_weighted_median(spark, sf_dir)),
        ("wmedian_prefix",
         lambda: agg_weighted_median_scalable(spark, sf_dir)),
    ])
    print("== funnel latency median (events): window vs distributed-rank ==",
          flush=True)
    _interleave([
        ("funnel_window", lambda: events_funnel_latency(spark, sf_dir)),
        ("funnel_ranks",
         lambda: events_funnel_latency_scalable(spark, sf_dir)),
    ])


if __name__ == "__main__":
    main()
