"""Shared existence-filtered tombstone writer for the segment/tombstone
indexes (TextIndex, GateIndex).

Both derived indexes claim ONE policy (scoped tombstones whose row mass
equals TRUE dead rows, bounded per-batch probe cost, bulk removes fully
distributed); r13's review found the implementation was unified by
convention only — two hand-synced copies.  This module is the single
implementation, parameterized by the per-index physical details (probe
table schema + subdirectory, tombstone naming), so a threshold or bug
fix lands on both indexes at once.

Three tiers by batch-id cardinality (the collect is limit()-capped,
never unbounded):

- <= LITERAL_CAP ids: In(doc_id)-pruned probe reads of each earlier
  segment (the probe tables are doc_id-sorted, so footer stats prune
  row groups — O(batch row groups), not O(index));
- <= BULK_CAP: broadcast LeftSemi probe — one doc_id-column scan of the
  probe tables against a broadcast hash of the batch ids (O(1) plan
  size vs a 10k+-literal In list); the probe side is rebuilt from the
  COLLECTED ids, never by re-executing the caller's dead lineage (a
  nondeterministic upstream could desync the probe from the id set
  actually being tombstoned);
- >  BULK_CAP (bulk load/remove): the probe is skipped and the dead set
  is written fully DISTRIBUTED (observe ABOVE the range exchange for
  the exact count) — a bulk remove never round-trips its id set
  through the driver.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

LITERAL_CAP = 10_000
BULK_CAP = 100_000


def _probe_union(spark: SparkSession, folder: str, segments: list[str],
                 upto: int, schema: str, sub: str) -> DataFrame:
    parts = []
    for j, sname in enumerate(segments):
        if j > upto:
            break
        parts.append(spark.read.schema(schema)
                     .parquet(os.path.join(folder, sname, sub)))
    un = parts[0]
    for p in parts[1:]:
        un = un.unionByName(p)
    return un


def probe_exists_literal(spark: SparkSession, folder: str,
                         segments: list[str], upto: int, schema: str,
                         sub: str, ids: list) -> set:
    """Which of ``ids`` exist in segments[:upto+1] — In(doc_id)-pruned
    reads (doc_id-sorted probe tables → footer row-group pruning)."""
    un = (_probe_union(spark, folder, segments, upto, schema, sub)
          .where(F.col("doc_id").isin(ids)).select("doc_id"))
    return {int(r[0]) for r in un.distinct().collect()}


def probe_exists_semijoin(spark: SparkSession, folder: str,
                          segments: list[str], upto: int, schema: str,
                          sub: str, ids_df: DataFrame) -> set:
    """Mid-size tier: scan the probe tables' doc_id column once against
    a BROADCAST hash of the batch ids (BroadcastHashJoin LeftSemi — no
    index-side shuffle).  The collect is bounded by the batch-id count
    (<= BULK_CAP)."""
    un = (_probe_union(spark, folder, segments, upto, schema, sub)
          .select("doc_id")
          .join(F.broadcast(ids_df.select("doc_id")),
                "doc_id", "left_semi").distinct())
    return {int(r[0]) for r in un.collect()}


def write_existence_filtered_tombstone(
        spark: SparkSession, folder: str, segments: list[str], upto: int,
        probe_schema: str, probe_sub: str, dead: DataFrame,
        tomb_name: str, literal_cap: int = LITERAL_CAP,
        bulk_cap: int = BULK_CAP) -> int:
    """Write ``folder/tomb_name`` holding the subset of ``dead``'s ids
    that actually exist in segments[:upto+1] (or, past BULK_CAP, the
    full distributed set), scoped ``upto_seg = upto``.  Returns the
    tombstone row count; 0 means nothing was written (the caller must
    not register the name)."""
    dead = dead.dropDuplicates(["doc_id"])
    head = dead.limit(bulk_cap + 1).collect()
    if len(head) > bulk_cap:
        obs = Observation()
        (dead.withColumn("upto_seg", F.lit(upto).cast("int"))
         .repartitionByRange("doc_id")
         .observe(obs, F.count(F.lit(1)).alias("n"))
         .sortWithinPartitions("doc_id")
         .write.mode("overwrite")
         .parquet(os.path.join(folder, tomb_name)))
        n_tomb = int(obs.get["n"])
        if not n_tomb:
            shutil.rmtree(os.path.join(folder, tomb_name),
                          ignore_errors=True)
        return n_tomb
    ids = sorted({int(r[0]) for r in head})
    if not ids:
        return 0
    if len(ids) <= literal_cap:
        exist = probe_exists_literal(spark, folder, segments, upto,
                                     probe_schema, probe_sub, ids)
    else:
        ids_df = spark.createDataFrame([(i,) for i in ids],
                                       "doc_id long")
        exist = probe_exists_semijoin(spark, folder, segments, upto,
                                      probe_schema, probe_sub, ids_df)
    dead_ids = [i for i in ids if i in exist]
    if not dead_ids:
        return 0
    (spark.createDataFrame([(i,) for i in dead_ids], "doc_id long")
     .withColumn("upto_seg", F.lit(upto))
     .coalesce(1).sortWithinPartitions("doc_id")
     .write.mode("overwrite")
     .parquet(os.path.join(folder, tomb_name)))
    return len(dead_ids)
