"""Interleaved same-session attribution for the round-11 DRIVER bench
record's two flagged keys (VERDICT r11 item 2 / "What's wrong" 4):

- ``gate_distributed_ms`` 11,847 ms — ABOVE its own NOTES band
  (7,000–10,500; builder's same-code r11 session: 7,810, in band).
- ``knn_cascade`` 0.568 s — +51% vs r10's 0.375 at variance 0.34
  (builder's same-code r11 session: 0.375, mid-band).

What the commit record already establishes:

- Both key paths are byte-identical from the r11 close (ffd90ff)
  through this round's HEAD: ``git diff ffd90ff HEAD --
  binaryvectordb_spark/operators/cascade.py
  binaryvectordb_spark/functions/vector.py
  binaryvectordb_spark/queries/vector.py
  binaryvectordb_spark/session.py`` is EMPTY, and the r12 GateIndex
  tiered-merge delta does not touch ``near_dup_gate`` (the recompute
  path this bench key times).  Any r11-driver-vs-builder delta is
  therefore an A/A BY CONSTRUCTION — session, not code.
- The r11 driver session ran hot on INDEPENDENT Spark-free keys too
  (``gate_local_checks_per_s`` 6,244→5,411, ``cascade_1m_local_ms``
  6.64→9.82, ``index_build_mvecs_per_s`` 2.0→1.58) — the machine
  itself, not any plan.

What this harness adds: one uncontended session interleaving two
identically-built arms per key (drift hits every arm equally), yielding
(a) an A/A noise bound for each key and (b) this machine's uncontended
median to set against the r10/r11 records when revising the NOTES
bands.

Run from the repo root, with NOTHING else on the machine:
    python examples/ab_r11_hotkeys.py [sf_dir]

Recorded outcome (r12 session, NOTES "Round-12 bench attribution"): the
FIRST round of every arm matched the committed records (gate 8.29/8.55 s,
knn 0.376/0.416) and later rounds degraded 2-3x IN LOCKSTEP across all
four identically-coded arms (gate up to 25.3/33.8 s, knn up to 1.7 s) —
time-correlated interference external to the measured plans, within one
session where nothing else was launched.  Minutes after the run, a
Spark-free fixed numpy matmul still read 249-1124 ms against a quiet
floor of ~15-35 ms, with load avg 2.6 and no visible process.  That is
the attribution: the r11 driver record's band breaches are session
contention, not code.  bench.py now stamps every record with the matmul
probe (_host_probe) so future records carry their own session-quality
evidence.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "2g")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from binaryvectordb_spark.operators.ingest_gate import near_dup_gate
    from binaryvectordb_spark.queries import QUERIES
    from binaryvectordb_spark.session import get_spark
    from binaryvectordb_spark.sources.tables import load_table

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    # exact bench_gate_serving distributed-arm preamble: corpus = the sf
    # documents table, probe = one near-dup perturbation of a corpus doc
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    row = docs.orderBy("doc_id").limit(40).collect()[37]
    one = spark.createDataFrame(
        [(10_000_001, row["text"] + " perturbed")],
        "doc_id long, text string")

    knn = QUERIES["knn_cascade"]

    def gate_arm():
        return near_dup_gate(one, docs)

    def knn_arm():
        return knn(spark, sf_dir)

    arms = [("gate_distributed_armA", gate_arm),
            ("gate_distributed_armB", gate_arm),
            ("knn_cascade_armA", knn_arm),
            ("knn_cascade_armB", knn_arm)]
    for _, fn in arms:
        fn().collect()  # untimed warm-up

    rounds, discard = 7, 2
    runs: dict[str, list[float]] = {name: [] for name, _ in arms}
    for _ in range(rounds):
        for name, fn in arms:
            plan = fn()  # fresh plan per round — never the warm object
            t0 = time.perf_counter()
            plan.collect()
            runs[name].append(time.perf_counter() - t0)

    print(f"sf_dir={sf_dir} rounds={rounds} discard={discard}")
    for name, rs in runs.items():
        kept = rs[discard:]
        med = statistics.median(kept)
        print(f"  {name}: median {med:.4f}s spread "
              f"{(max(kept) - min(kept)) / med:.2f} runs "
              f"{[round(r, 3) for r in kept]}", flush=True)
    print("reference points: gate_distributed r10 record 8.12 s / r11 "
          "builder 7.81 s / r11 driver 11.85 s (band 7.0-10.5); "
          "knn_cascade r10 record 0.369 / r11 builder 0.375 / r11 driver "
          "0.568 (band 0.27-0.40)")


if __name__ == "__main__":
    main()
