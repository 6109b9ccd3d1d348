"""r16 experiment (VERDICT r15 item 5): measure the batch descent's
multi-round tail on a COLD memo for inflation-prone (multi-dense-term)
members, then quantify what a batch-side winners-impact refinement
would buy by comparing warm batch walls under

  (a) the batch's own memo (thr_eff frontiers written at proof), vs
  (b) the single-query path's REFINED memo (winners-impact frontiers,
      the tightest the engine knows how to prove)

The (b)-minus-(a) gap IS the ceiling of the proposed batch refinement:
if it is small, the refinement isn't worth its extra per-proof job.

Run:  SPARK_GRAFT_DRIVER_MEM=4g python examples/exp_batch_tail_r16.py
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from binaryvectordb_spark.operators.textindex import TextIndex
    from binaryvectordb_spark.queries.hybrid import TERMS
    from binaryvectordb_spark.session import get_spark
    from binaryvectordb_spark.sources.tables import replicated_text_corpus

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("exp-batch-tail")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {}
    d = tempfile.mkdtemp(prefix="bvdb_exp_tail_")
    try:
        # the bench's own 1M corpus builder — shared so the decline
        # decision this script evidences holds for the measured keys
        big = replicated_text_corpus(spark, sf_dir,
                                     os.path.join(d, "corpus"))
        idx = TextIndex(spark, os.path.join(d, "ti")).build(big)

        # inflation-prone batch: multi-dense-term members (the dense3
        # proof fails round 1 cold — read fraction 0.9769 at proof) +
        # dense1 members as the serving mix
        T = TERMS
        b8 = {0: (T[0],), 1: (T[1],), 2: (T[2],),
              3: (T[0], T[1]), 4: (T[0], T[2]), 5: (T[1], T[2]),
              6: (T[0], T[1], T[2]), 7: (T[1],)}

        def cold() -> None:
            for attr in ("_thr_cache", "_thr_refined", "_ts_cache"):
                c = getattr(idx, attr, None)
                if c is not None:
                    c.clear()

        def run_batch() -> float:
            t0 = time.perf_counter()
            idx.search_batch(b8, k=10, block_max=True).collect()
            return time.perf_counter() - t0

        # one untimed pass to absorb page-cache cold cost (the dense
        # postings fault ~2 GB in — we're measuring descent arithmetic
        # and read fractions, not the page cache)
        cold()
        run_batch()

        # ---- cold-memo tail -------------------------------------------
        walls, rounds, proved = [], [], []
        for _ in range(3):
            cold()
            walls.append(run_batch())
            info = idx.last_blockmax_batch
            rounds.append(info["rounds"])
            proved.append(dict(info["proved_round"]))
        out["cold_walls"] = [round(w, 3) for w in walls]
        out["cold_rounds"] = rounds
        out["cold_proved_round"] = proved[-1]
        out["cold_full_read"] = idx.last_blockmax_batch["full_read"]

        # ---- warm repeat under the batch's own memo -------------------
        walls_a = [run_batch() for _ in range(5)]
        info = idx.last_blockmax_batch
        out["warm_batchmemo_walls"] = [round(w, 3) for w in walls_a]
        out["warm_batchmemo_rounds"] = info["rounds"]

        # read volume under the batch memo: postings rows the round-1
        # frontier admits (sum over union thresholds)
        thr = {q: info["thr"][q] for q in info["thr"]}
        base = idx.spark.read.schema(
            "token string, doc_id long, imp double").parquet(
            os.path.join(idx.folder, idx.meta["segments"][0], "postings"))
        union_t: dict = {}
        for q, tmap in thr.items():
            for t, v in tmap.items():
                union_t[t] = min(union_t.get(t, float("inf")), v)
        pred = None
        for t, v in union_t.items():
            c = (F.col("token") == t) & (F.col("imp") >= v)
            pred = c if pred is None else (pred | c)
        out["warm_batchmemo_rows"] = base.where(pred).count()

        # ---- warm repeat under the single-query REFINED memo ----------
        cold()
        for q in sorted(b8):
            idx.search(b8[q], k=10, block_max=True).collect()
            idx.search(b8[q], k=10, block_max=True).collect()  # re-prove
        walls_b = [run_batch() for _ in range(5)]
        info_b = idx.last_blockmax_batch
        out["warm_refinedmemo_walls"] = [round(w, 3) for w in walls_b]
        out["warm_refinedmemo_rounds"] = info_b["rounds"]
        thr_b = {q: info_b["thr"][q] for q in info_b["thr"]}
        union_b: dict = {}
        for q, tmap in thr_b.items():
            for t, v in tmap.items():
                union_b[t] = min(union_b.get(t, float("inf")), v)
        pred_b = None
        for t, v in union_b.items():
            c = (F.col("token") == t) & (F.col("imp") >= v)
            pred_b = c if pred_b is None else (pred_b | c)
        out["warm_refinedmemo_rows"] = base.where(pred_b).count()
        out["n_postings_total"] = base.count()

        print(json.dumps(out))
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
