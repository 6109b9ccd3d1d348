"""Interleaved same-session A/B for the two out-of-band r7 bench moves
(VERDICT r7 item 6): search_hybrid_rrf (+32%) and events_session_window
(+27%).

- search_hybrid_rrf: the ONLY r6->r7 code change on its path is the
  candidates-only dl semi-join (hybrid.py:84).  A = r7 shape (pruned dl),
  B = r6 shape (full dl join), rebuilt fresh per run, interleaved so
  session drift hits both equally.
- events_session_window: NO code changed r6->r7, so this is an A/A run —
  two identical fresh plans interleaved — whose spread bounds what pure
  session noise looks like for this query.

Protocol: 7 interleaved rounds, first 2 discarded, median + (max-min)/median
of the kept 5 — the bench.py trust protocol.  Run from the repo root:
    python examples/ab_r7_regressions.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "2g")


def _ab(name_a, make_a, name_b, make_b, rounds=7, discard=2):
    for make in (make_a, make_b):  # untimed: absorb codegen cold cost
        make().collect()
    ra, rb = [], []
    for _ in range(rounds):
        t0 = time.perf_counter()
        make_a().collect()
        ra.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        make_b().collect()
        rb.append(time.perf_counter() - t0)
    out = {}
    for name, runs in ((name_a, ra[discard:]), (name_b, rb[discard:])):
        med = statistics.median(runs)
        out[name] = (round(med, 4), round((max(runs) - min(runs)) / med, 2))
        print(f"{name}: median {med:.4f}s spread "
              f"{(max(runs) - min(runs)) / med:.2f} runs "
              f"{[round(r, 3) for r in runs]}")
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from binaryvectordb_spark.queries import QUERIES
    from binaryvectordb_spark.session import get_spark
    import binaryvectordb_spark.queries.hybrid as H

    spark = get_spark("ab-r7")
    spark.sparkContext.setLogLevel("ERROR")

    def bm25_r6_shape(spark_, sf_dir_):
        """r6 _bm25_scored: identical except dl joins WITHOUT the
        candidates-only semi-join prune."""
        tokens = H._doc_tokens(spark_, sf_dir_)
        dl = tokens.groupBy("doc_id").agg(
            F.count("*").cast("double").alias("dl"))
        stats = dl.agg(
            F.count("*").cast("double").alias("n_docs"),
            (F.sum("dl") / F.count("*").cast("double")).alias("avgdl"))
        tf = (tokens.where(F.col("token").isin(*H.TERMS))
              .groupBy("doc_id", "token")
              .agg(F.count("*").cast("double").alias("tf")))
        df_ = tf.groupBy("token").agg(
            F.count("*").cast("double").alias("df"))
        term_score = (
            "CAST(floor(((n_docs - df) + 0.5D) / (df + 0.5D) * ((tf * 2.2D)"
            " / (tf + (1.2D * (0.25D + (0.75D * (dl / avgdl)))))) "
            "* 1e10) AS BIGINT)")
        return (tf.join(F.broadcast(df_), "token")
                .join(dl, "doc_id")
                .crossJoin(F.broadcast(stats))
                .withColumn("term_score_e10", F.expr(term_score))
                .groupBy("doc_id")
                .agg(F.sum("term_score_e10").alias("bm25_e10")))

    def hybrid_r6():
        orig = H._bm25_scored
        H._bm25_scored = bm25_r6_shape
        try:
            return QUERIES["search_hybrid_rrf"](spark, sf_dir)
        finally:
            H._bm25_scored = orig

    print("== search_hybrid_rrf: r7 (pruned dl) vs r6 (full dl) ==")
    _ab("r7_pruned_dl", lambda: QUERIES["search_hybrid_rrf"](spark, sf_dir),
        "r6_full_dl", hybrid_r6)

    print("== events_session_window: A/A (code unchanged r6->r7) ==")
    _ab("session_window_A",
        lambda: QUERIES["events_session_window"](spark, sf_dir),
        "session_window_B",
        lambda: QUERIES["events_session_window"](spark, sf_dir))


if __name__ == "__main__":
    main()
