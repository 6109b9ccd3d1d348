"""Round-7 retrieval + layout walkthrough: late-interaction (MaxSim)
search, product-quantization ANN with exact rerank, C4-style span dedup,
and z-order layout with measured row-group skipping.

Run: python examples/retrieval_and_layout.py  (uses the sf0.001 fixtures)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from binaryvectordb_spark.session import get_spark
from binaryvectordb_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("example-retrieval-layout")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. Late-interaction (MaxSim) retrieval: every token scored, one
    #    pivoted aggregation pass for the whole query batch
    from binaryvectordb_spark.queries.lateinteraction import (
        search_maxsim_topk_batch,
    )
    print("== MaxSim batch top-3 per query ==")
    search_maxsim_topk_batch(spark, SF).where(F.col("rnk") <= 3).show()

    # 2. Product quantization: 32x smaller codes, ADC shortlist, exact
    #    rerank
    from binaryvectordb_spark.operators.pq import (
        pq_encode,
        pq_search,
        train_pq,
    )
    e = load_table(spark, SF, "embeddings")
    qvec = e.where(F.col("vec_id") == 0).first()["embedding"]
    books = train_pq(e, 64)
    codes = pq_encode(e, books)
    print("== PQ top-5 (ADC shortlist -> exact cosine) ==")
    pq_search(codes, e, qvec, books, k=5).show()

    # 3. Span-level dedup: which docs lose the most 8-token spans to the
    #    keep-first policy
    from binaryvectordb_spark.queries.dedup import dedup_span_keep_first
    print("== Docs with duplicated spans (top 5 by loss) ==")
    (dedup_span_keep_first(spark, SF)
     .withColumn("lost", F.col("n_spans") - F.col("n_kept"))
     .orderBy(F.desc("lost"), "doc_id").limit(5).show())

    # 4. Z-order layout: write events z-ordered and show the 2-D skipping
    from binaryvectordb_spark.operators.zorder import (
        equidepth_scale,
        interleave_expr,
        rowgroup_scan_fraction,
        write_zordered,
    )
    ev = load_table(spark, SF, "events").select(
        "event_id", "user_id", "value",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("vb"))
    ex = (ev.withColumn("_xr", equidepth_scale(ev, "user_id", bits=8))
          .withColumn("_yr", equidepth_scale(ev, "vb", bits=8)))
    zdf = (ex.withColumn("_z", F.expr(interleave_expr("_xr", "_yr", bits=8)))
           .drop("_xr", "_yr"))
    out = tempfile.mkdtemp(prefix="bvdb_z_")
    write_zordered(zdf, out, F.col("_z"), 8)
    ux, uy = ev.agg(F.min("user_id"), F.max("user_id")).first()
    vlo, vhi = ev.approxQuantile("vb", [0.75, 0.875], 0.001)
    frac = rowgroup_scan_fraction(
        out, {"user_id": (ux, ux + (uy - ux) // 8),
              "vb": (int(vlo), int(vhi))})
    print(f"z-ordered 2-D predicate touches {frac:.0%} of row-group bytes")


if __name__ == "__main__":
    main()
