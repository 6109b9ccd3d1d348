"""r17b exploration: similarity_join_brp_lsh cost split + vectorized exact side.

Phase 1 (split): time (a) the MLlib LSH join alone, (b) the exact quadratic
pair count alone, (c) the full query — all with the noop sink, fresh plans.

Phase 2 (candidate): the exact side re-expressed as a blocked numpy kernel
over Arrow batches (guide §4): pack the corpus into P row-chunks, attach the
full vector list via a broadcast of a single executor-side collect_list row
(no driver collect), and count pairs per chunk with a dim-sequential float64
accumulation that replays the HOF fold's exact IEEE op order:

    acc_d+1 = acc_d + (float64(x_d) - float64(y_d))^2   (d ascending)
    pair counted iff sqrt(acc) <= t and id_a < id_b

Each step (cast exact, one rounding per subtract/multiply/add, correctly
rounded sqrt) is the same double op Spark's codegen and DuckDB execute, so
the count is bit-identical by construction; phase 2 asserts equality against
the committed implementation on every SF before timing.

Usage: python examples/exp_brplsh_r17.py [split|vec|all]
"""

from __future__ import annotations

import statistics
import sys
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from binaryvectordb_spark.operators.mllib_ann import brp_lsh_similarity_join
from binaryvectordb_spark.queries import QUERIES
from binaryvectordb_spark.session import get_spark
from binaryvectordb_spark.sources.tables import load_table

THRESHOLD = 1.2


def noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(label, make, n=3):
    noop(make())  # warm plan/codegen
    runs = []
    for _ in range(n):
        df = make()
        t0 = time.perf_counter()
        noop(df)
        runs.append(time.perf_counter() - t0)
    med = statistics.median(runs)
    print(f"  {label:34s} {med:8.3f} s  (runs {['%.2f' % r for r in runs]})")
    return med


def lsh_side(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    pairs = brp_lsh_similarity_join(e, threshold=THRESHOLD)
    return pairs.agg(F.count("*").alias("n_lsh"),
                     F.max("dist").alias("max_dist"))


def exact_side_current(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    sq = F.expr(
        "aggregate(zip_with(va, vb, (x, y) -> "
        "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * "
        "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
    return (a.join(b, F.col("id_a") < F.col("id_b"))
            .where(F.sqrt(sq) <= THRESHOLD)
            .agg(F.count("*").alias("n_exact_pairs")))


def exact_side_numpy(spark, sf_dir):
    import pandas as pd  # noqa: F401

    e = load_table(spark, sf_dir, "embeddings")
    p = spark.sparkContext.defaultParallelism
    row = F.struct(F.col("vec_id").alias("i"), F.col("embedding").alias("v"))
    chunks = (e.groupBy((F.col("vec_id") % F.lit(p)).alias("blk"))
              .agg(F.collect_list(row).alias("part")))
    full = e.agg(F.collect_list(row).alias("full"))
    joined = chunks.join(F.broadcast(full)).repartition(p)

    def count_pairs(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            total = 0
            for part, fl in zip(pdf["part"], pdf["full"]):
                ia = np.asarray([r["i"] for r in part], dtype=np.int64)
                A = np.asarray([r["v"] for r in part], dtype=np.float64)
                ib = np.asarray([r["i"] for r in fl], dtype=np.int64)
                B = np.asarray([r["v"] for r in fl], dtype=np.float64)
                acc = np.zeros((A.shape[0], B.shape[0]), dtype=np.float64)
                for d in range(A.shape[1]):
                    diff = A[:, d, None] - B[None, :, d]
                    acc += diff * diff
                ok = (np.sqrt(acc) <= THRESHOLD) & (ia[:, None] < ib[None, :])
                total += int(ok.sum())
            yield pd.DataFrame({"n": [total]})

    counts = joined.mapInPandas(count_pairs, "n long")
    return counts.agg(F.sum("n").cast("long").alias("n_exact_pairs"))


def exact_jaccard_current(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.array_distinct(F.split("text", " ")).alias("toks"))
    ta = t.select(F.col("doc_id").alias("id_a"), F.col("toks").alias("tka"))
    tb = t.select(F.col("doc_id").alias("id_b"), F.col("toks").alias("tkb"))
    jac = (F.size(F.array_intersect("tka", "tkb")).cast("double")
           / F.size(F.array_union("tka", "tkb")))
    return (ta.join(tb, F.col("id_a") < F.col("id_b"))
            .where(jac >= 0.5)
            .agg(F.count("*").alias("n_exact_near_pairs")))


def exact_jaccard_numpy(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.array_distinct(F.split("text", " ")).alias("toks"))
    p = spark.sparkContext.defaultParallelism
    row = F.struct(F.col("doc_id").alias("i"), F.col("toks").alias("t"))
    chunks = (t.groupBy((F.col("doc_id") % F.lit(p)).alias("blk"))
              .agg(F.collect_list(row).alias("part")))
    full = t.agg(F.collect_list(row).alias("full"))
    joined = chunks.join(F.broadcast(full)).repartition(p)

    def count_near(batches):
        import numpy as np
        import pandas as pd

        def popcount(x):  # SWAR over uint64
            x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
            x = ((x & np.uint64(0x3333333333333333))
                 + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333)))
            x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
            return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)

        def masks(rows, vocab):
            w = max(1, (len(vocab) + 63) // 64)
            out = np.zeros((len(rows), w), dtype=np.uint64)
            ids = np.empty(len(rows), dtype=np.int64)
            for k, r in enumerate(rows):
                ids[k] = r["i"]
                for tok in r["t"]:
                    bit = vocab[tok]
                    out[k, bit >> 6] |= np.uint64(1) << np.uint64(bit & 63)
            return ids, out

        for pdf in batches:
            total = 0
            for part, fl in zip(pdf["part"], pdf["full"]):
                vocab = {}
                for r in fl:
                    for tok in r["t"]:
                        if tok not in vocab:
                            vocab[tok] = len(vocab)
                ia, ma = masks(part, vocab)
                ib, mb = masks(fl, vocab)
                w = ma.shape[1]
                inter = np.zeros((len(ia), len(ib)), dtype=np.int64)
                union = np.zeros_like(inter)
                for j in range(w):
                    aw = ma[:, j, None]
                    bw = mb[None, :, j]
                    inter += popcount(aw & bw).astype(np.int64)
                    union += popcount(aw | bw).astype(np.int64)
                # double(inter)/double(union) >= 0.5  <=>  2*inter >= union
                # (exact: |q-0.5| >= 1/(2*union) >> ulp); union==0 -> NULL
                ok = ((2 * inter >= union) & (union > 0)
                      & (ia[:, None] < ib[None, :]))
                total += int(ok.sum())
            yield pd.DataFrame({"n": [total]})

    counts = joined.mapInPandas(count_near, "n long")
    return counts.agg(F.coalesce(F.sum("n"), F.lit(0)).cast("long")
                      .alias("n_exact_near_pairs"))


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("exp-brplsh-r17")
    spark.sparkContext.setLogLevel("ERROR")

    if mode in ("vec", "all"):
        print("== identity: numpy exact count vs committed HOF count ==")
        for sf in ("0.001", "0.01", "0.1"):
            d = f"/root/testdata/sf{sf}"
            cur = exact_side_current(spark, d).first()["n_exact_pairs"]
            new = exact_side_numpy(spark, d).first()["n_exact_pairs"]
            print(f"  sf{sf}: current={cur} numpy={new} "
                  f"{'OK' if cur == new else 'MISMATCH'}")
            assert cur == new, f"sf{sf}: {cur} != {new}"

    if mode in ("jac", "jacfull"):
        print("== identity: bitmask jaccard near-count vs committed ==")
        sfs = ("0.001", "0.01") if mode == "jac" else ("0.001", "0.01", "0.1")
        for sf in sfs:
            d = f"/root/testdata/sf{sf}"
            import time as _t
            t0 = _t.perf_counter()
            cur = exact_jaccard_current(spark, d).first()["n_exact_near_pairs"]
            t1 = _t.perf_counter()
            new = exact_jaccard_numpy(spark, d).first()["n_exact_near_pairs"]
            t2 = _t.perf_counter()
            print(f"  sf{sf}: current={cur} ({t1-t0:.1f}s) "
                  f"numpy={new} ({t2-t1:.1f}s) "
                  f"{'OK' if cur == new else 'MISMATCH'}")
            assert cur == new, f"sf{sf}: {cur} != {new}"
        return

    sf_dir = "/root/testdata/sf0.1"
    print("== sf0.1 timings (noop sink, fresh plans, median of 3) ==")
    if mode in ("split", "all"):
        timed("full query (committed)",
              lambda: QUERIES["similarity_join_brp_lsh"](spark, sf_dir))
        timed("lsh side only", lambda: lsh_side(spark, sf_dir))
        timed("exact side (committed HOF BNLJ)",
              lambda: exact_side_current(spark, sf_dir))
    if mode in ("vec", "all"):
        timed("exact side (numpy blocked)",
              lambda: exact_side_numpy(spark, sf_dir))


if __name__ == "__main__":
    main()
