"""The sketch family end-to-end — the O(small) summaries a 1000-executor
job ships to the driver instead of raw data, every one of them exact
oracle data in the registry:

  CMS          -> heavy hitters        (cell-wise-add mergeable)
  HLL          -> distinct counts      (register-max mergeable, engine-opaque)
  KMV bottom-k -> distinct counts      (set-union mergeable, VALUE-exact)
  bottom-k sample -> quantiles         (same set-union rule)
  + the KMV STREAMING twin: per-group sketches maintained exactly-once
    across micro-batches (set-union CRDT state: order-free AND
    replay-idempotent by algebra, constant |groups|*k rows).

Run: python examples/sketches_and_sampling.py  [SPARK_GRAFT_SF_DIR=...]"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from binaryvectordb_spark.queries.analytics3 import (  # noqa: E402
    sketch_bottomk_quantiles,
    sketch_cms_heavy_hitters,
    sketch_hll_mergeable,
    sketch_kmv_mergeable,
)
from binaryvectordb_spark.session import get_spark  # noqa: E402
from binaryvectordb_spark.sources.tables import load_table  # noqa: E402
from binaryvectordb_spark.streaming.events import (  # noqa: E402
    foreach_batch_kmv_sketch,
    kmv_direct,
    read_events_stream,
    read_kmv_ndv,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("example-sketches")
    spark.sparkContext.setLogLevel("ERROR")

    print("== KMV bottom-k NDV (value-exact mergeable) ==")
    for r in sketch_kmv_mergeable(spark, SF_DIR).orderBy("grp").collect():
        print(f"  {r['grp']:<16} exact={r['n_exact']:<6} "
              f"est={r['est_ndv']:<6} err={r['err_permille']}‰")

    print("\n== bottom-k hash-sample quantiles (vs scale-safe true rank) ==")
    for r in sketch_bottomk_quantiles(spark, SF_DIR).orderBy("q").collect():
        print(f"  p{r['q']:<3} est={r['est_cents']/100:>12.2f} "
              f"true={r['true_cents']/100:>12.2f} err={r['err_permille']}‰")

    print("\n== HLL NDV (accuracy-pinned) ==")
    for r in (sketch_hll_mergeable(spark, SF_DIR)
              .orderBy("o_orderpriority").collect()):
        print(f"  {r['o_orderpriority']:<16} exact={r['n_exact']:<6} "
              f"direct_ok={r['est_ok']} merged_ok={r['merge_est_ok']}")

    print("\n== CMS heavy hitters (est >= true, soundness as data) ==")
    cms = sketch_cms_heavy_hitters(spark, SF_DIR)
    for r in cms.limit(5).collect():
        print(f"  {r.asDict()}")

    print("\n== KMV streaming twin (set-union CRDT state) ==")
    work = tempfile.mkdtemp(prefix="bvdb_kmv_")
    try:
        ev = load_table(spark, SF_DIR, "events").select(
            "event_id", "ts", "user_id", "event_type", "value", "props")
        in_dir = os.path.join(work, "in")
        os.makedirs(in_dir)
        prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
        spark.conf.set("spark.sql.parquet.outputTimestampType",
                       "TIMESTAMP_MICROS")
        try:
            for i in range(3):  # event_id split — NOT time: order-free fold
                part = os.path.join(work, f"p{i}")
                (ev.where(F.col("event_id") % 3 == i).coalesce(1)
                 .write.mode("overwrite").parquet(part))
                src = next(p for p in os.listdir(part)
                           if p.endswith(".parquet"))
                shutil.copy(os.path.join(part, src),
                            os.path.join(in_dir, f"b{i}.parquet"))
        finally:
            spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
        out_dir = os.path.join(work, "state")
        q = foreach_batch_kmv_sketch(
            read_events_stream(spark, in_dir, max_files_per_trigger=1),
            out_dir, os.path.join(work, "ck"))
        q.awaitTermination()
        got = {r["grp"]: r["est_ndv"]
               for r in read_kmv_ndv(spark, out_dir).collect()}
        want = {r["grp"]: r["est_ndv"] for r in kmv_direct(ev).collect()}
        print(f"  3-batch stream == single-pass batch: {got == want}")
        for grp in sorted(got):
            print(f"  {grp:<16} est_ndv={got[grp]}")
    finally:
        shutil.rmtree(work, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
