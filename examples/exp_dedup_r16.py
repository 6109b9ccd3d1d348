"""r16 optimization A/B: duplicate self-join subtree derivation in the
LSH/simhash dedup family.

A self-join's two sides are identical subplans but Spark executes the
derivation once per side (no exchange reuse across a BroadcastExchange).
`dedup._PIN_SHARED` pins the small derived frames (band rows, shingle
sets, simhash blocks) with a lazy localCheckpoint so the heavy
aggregation runs once per invocation.  This script times both arms
interleaved in ONE session and asserts identity first.

Run:  python examples/exp_dedup_r16.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from binaryvectordb_spark.queries import QUERIES, dedup
    from binaryvectordb_spark.session import get_spark

    spark = get_spark("bvdb-exp-dedup-r16")
    spark.sparkContext.setLogLevel("ERROR")

    names = ("dedup_minhash_pairs", "dedup_lsh_jaccard",
             "dedup_simhash_pairs")

    # identity across arms
    for n in names:
        dedup._PIN_SHARED = False
        base = _rows(QUERIES[n](spark, sf_dir))
        dedup._PIN_SHARED = True
        assert _rows(QUERIES[n](spark, sf_dir)) == base, f"{n} diverged"
        print(f"{n}: identity ok ({len(base)} rows)")

    arms: dict[str, list[float]] = {}
    for _ in range(7):
        for n in names:
            for pin in (False, True):
                dedup._PIN_SHARED = pin
                df = QUERIES[n](spark, sf_dir)
                t0 = time.perf_counter()
                df.collect()
                arms.setdefault(f"{n}:{'pin' if pin else 'base'}", []) \
                    .append(time.perf_counter() - t0)
    for k, runs in arms.items():
        kept = sorted(runs[2:])[:-1]
        med = statistics.median(kept)
        print(f"{k:>32}: {med:.4f} s "
              f"(spread {(max(kept) - min(kept)) / med:.2f}, "
              f"runs {[round(r, 3) for r in runs]})")
    dedup._PIN_SHARED = True


if __name__ == "__main__":
    main()
