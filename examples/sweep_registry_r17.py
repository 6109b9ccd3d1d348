"""r17 optimization round: time EVERY registry query at a given SF.

Usage: python examples/sweep_registry_r17.py [sf_dir] [out_json]

Protocol (matches bench.py's lazy protocol): per query one untimed
warm-up run, then the median of 3 freshly-built plans timed on
``.collect()``; queries whose work happens eagerly inside the builder
(none in the registry — registry queries are plain DataFrame builders)
would need ``eager``, which this sweep does not use.  Output: one JSON
file {name: {"sec": median, "spread": (max-min)/median, "rows": n}}
sorted by descending median — the worklist for the optimization pass.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = (sys.argv[2] if len(sys.argv) > 2
                else "/tmp/sweep_registry_r17.json")

    from binaryvectordb_spark.queries import QUERIES
    from binaryvectordb_spark.session import get_spark

    spark = get_spark("bvdb-sweep-r17")
    spark.sparkContext.setLogLevel("ERROR")

    # absorb file-listing/footer cold cost once, like bench.py
    from binaryvectordb_spark.sources.tables import TABLE_NAMES, load_table
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()

    # queries whose sf0.1 cost is understood and deliberate — timing
    # them 4x would add ~40 min for no information (the sweep hunts for
    # UNKNOWN outliers).  Each carries its diagnosis.
    skip = {
        "dedup_minhash_mllib": "MLlib approxSimilarityJoin side is "
        "inherently ~quadratic HERE: the corpus is near-dup dense (8.9M "
        "of 12.5M sf0.1 pairs are >= 0.5 similar — measured by the r17 "
        "bitmask kernel), so LSH banding prunes almost nothing and the "
        "join emits ~9M candidates x sparse keyDistance (>10 min).  The "
        "exact verify side was vectorized in r17 (202.9 s -> 16.2 s "
        "measured); the driver hashes this row at sf <= 0.01 where both "
        "sides are small.",
    }
    results: dict[str, dict] = {}
    for i, (name, fn) in enumerate(QUERIES.items()):
        if name in skip:
            results[name] = {"skipped": skip[name]}
            continue
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        try:
            t0 = time.perf_counter()
            rows = len(fn(spark, sf_dir).collect())  # warm-up (untimed)
            warm = time.perf_counter() - t0
            if warm > 60.0:
                # pathological at this SF: one number is enough to rank
                # it at the top of the worklist; don't pay 3 more runs
                results[name] = {"sec": round(warm, 4), "rows": rows,
                                 "single_run": True}
                continue
            runs = []
            for _ in range(3):
                plan = fn(spark, sf_dir)
                t0 = time.perf_counter()
                plan.collect()
                runs.append(time.perf_counter() - t0)
            med = statistics.median(runs)
            results[name] = {
                "sec": round(med, 4),
                "spread": round((max(runs) - min(runs)) / med, 2)
                if med > 0 else 0.0,
                "rows": rows,
            }
        except Exception as e:  # noqa: BLE001 — record and continue
            results[name] = {"err": f"{type(e).__name__}: {e}"[:300]}
        finally:
            spark.sparkContext.setJobDescription(None)
        if (i + 1) % 20 == 0:
            print(f"  {i + 1}/{len(QUERIES)} done", file=sys.stderr)
            with open(out_path + ".partial", "w") as f:
                json.dump(results, f)

    ordered = dict(sorted(results.items(),
                          key=lambda kv: -kv[1].get("sec", 0.0)))
    with open(out_path, "w") as f:
        json.dump(ordered, f, indent=1)
    total = sum(v.get("sec", 0.0) for v in results.values())
    n_err = sum(1 for v in results.values() if "err" in v)
    print(f"swept {len(results)} queries, total {total:.1f}s median-sum, "
          f"{n_err} errors -> {out_path}")
    for name, v in list(ordered.items())[:25]:
        print(f"  {v.get('sec', 'ERR'):>8} {name}")


if __name__ == "__main__":
    main()
