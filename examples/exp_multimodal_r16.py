"""r16: interleaved A/B for the multimodal codec repartition (_spread).

A = inherited shape (1-partition plan: _spread patched to identity)
B = _spread(defaultParallelism) before the codec mapInPandas

Both arms run in ONE session, alternating, so host drift hits both.
Identity asserted per query (same rows either way — repartition touches
placement only).  Usage: python examples/exp_multimodal_r16.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from binaryvectordb_spark.operators import multimodal as mm
    from binaryvectordb_spark.queries import QUERIES
    from binaryvectordb_spark.session import get_spark

    spark = get_spark("bvdb-exp-multimodal-r16")
    spark.sparkContext.setLogLevel("ERROR")

    real_spread = mm._spread
    names = ["multimodal_jpeg_decode", "multimodal_png_decode",
             "multimodal_ppm_decode", "multimodal_bmp_decode",
             "multimodal_resize"]

    for name in names:
        fn = QUERIES[name]
        mm._spread = lambda df: df
        ra = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
        mm._spread = real_spread
        rb = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
        assert ra == rb, f"identity FAILED for {name}"
        runs_a, runs_b = [], []
        for i in range(3):
            for arm, patch, runs in (("A", (lambda df: df), runs_a),
                                     ("B", real_spread, runs_b)):
                mm._spread = patch
                spark.sparkContext.setJobDescription(f"exp-mm:{name}:{arm}:{i}")
                plan = fn(spark, sf_dir)
                t0 = time.perf_counter()
                plan.collect()
                runs.append(time.perf_counter() - t0)
                spark.sparkContext.setJobDescription(None)
        mm._spread = real_spread
        ma, mb = statistics.median(runs_a), statistics.median(runs_b)
        print(f"{name}: A(1-part) {ma:.3f}s  B(spread) {mb:.3f}s  "
              f"B/A={mb/ma:.3f}")


if __name__ == "__main__":
    main()
