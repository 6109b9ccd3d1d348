"""SparkSession factory tuned for the test/bench environment.

Local mode uses ``local[$SPARK_GRAFT_CPUS]`` (default 32).  On a real cluster
callers pass their own session; every operator in this package only requires a
plain ``SparkSession`` and never assumes local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "binaryvectordb_spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # driver heap: default 1g unless overridden.  Measured on the 1M
        # cascade bench: 1-2g is FASTER than 8-48g (large G1 heaps degrade
        # the Arrow-kernel path 1.5-2x, likely humongous-region churn);
        # only multi-GB cached stores (e.g. 1024-dim corpora) need more —
        # export SPARK_GRAFT_DRIVER_MEM for those.
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "1g"))
        # AQE: runtime coalescing + skew-join splitting — free insurance at scale
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # the fixtures are single ~10-60MB parquet files; the 128MB default
        # would make every scan ONE partition (single-core).  8MB splits a
        # single file across cores without any shuffle — at production scale
        # (many files >= 128MB) this knob is irrelevant, it only de-skews
        # small-file inputs
        .config("spark.sql.files.maxPartitionBytes", "8m")
        # Arrow for any pandas_udf / toPandas path
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # fewer, larger Arrow batches through mapInArrow/mapInPandas: the
        # per-batch conversion round trip dominates slim-row transfers
        # (measured ~10-15% on the 1M batched cascade vs the 10k default);
        # kernel memory stays bounded — rows are slim and the Phase-I
        # kernel's working set is O(n_queries x batch_rows) float32
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "262144")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()
