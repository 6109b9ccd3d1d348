"""Mutation semantics as pure (side-effect-free) queries so the driver can
value-hash them (SURVEY §2.10): the delete-then-insert upsert of
``add_documents`` (BinaryVectorDB/BinaryVectorDB.py:93-101) and the anti-join
delete of ``remove_doc`` (:155-166), expressed over the read-only fixtures.

The stateful API (BinaryVectorDB.add_documents / remove_docs) uses exactly
these plans against its own Parquet tables; tests/test_db_crud.py covers the
stateful path end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binaryvectordb_spark.queries import register
from binaryvectordb_spark.sources.tables import load_table


def mutation_upsert_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert a derived batch (ids 0..49, text rewritten) into documents:
    existing rows for those ids are DELETED then the new rows INSERTED
    (reference :93-101).  Plan: broadcast anti-join + unionByName."""
    d = load_table(spark, sf_dir, "documents")
    batch = (d.where(F.col("doc_id") < 50)
             .select("doc_id",
                     F.concat(F.lit("updated:"), F.col("doc_id")).alias("text"),
                     "lang", "source",
                     F.length(F.concat(F.lit("updated:"), F.col("doc_id")))
                     .cast("long").alias("n_chars")))
    keys = batch.select("doc_id")
    return (d.join(F.broadcast(keys), "doc_id", "left_anti")
            .unionByName(batch)
            .select("doc_id", "text", "lang", "source", "n_chars"))


register("mutation_upsert_documents", mutation_upsert_documents, oracle="""
WITH batch AS (
  SELECT doc_id, 'updated:' || doc_id AS text, lang, source,
         CAST(length('updated:' || doc_id) AS BIGINT) AS n_chars
  FROM documents WHERE doc_id < 50)
SELECT doc_id, text, lang, source, n_chars FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM batch)
UNION ALL
SELECT * FROM batch
""")


def mutation_delete_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched delete of ids 0..99 (reference deletes per-id with a full
    rewrite each, :165-166 — the batch anti-join amortizes that)."""
    d = load_table(spark, sf_dir, "documents")
    keys = spark.range(0, 100).select(F.col("id").alias("doc_id"))
    return (d.join(F.broadcast(keys), "doc_id", "left_anti")
            .select("doc_id", "lang", "source"))


register("mutation_delete_documents", mutation_delete_documents, oracle="""
SELECT doc_id, lang, source FROM documents
WHERE doc_id NOT IN (SELECT * FROM range(0, 100))
""")


def mutation_upsert_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The index-side of the upsert: per-label row counts after re-inserting
    ids 0..49 with label flipped to 9 (verifies delete-before-insert — a
    plain append would double-count)."""
    e = load_table(spark, sf_dir, "embeddings")
    batch = (e.where(F.col("vec_id") < 50)
             .select("vec_id", "embedding", F.lit(9).cast("int").alias("label")))
    merged = (e.join(F.broadcast(batch.select("vec_id")), "vec_id", "left_anti")
              .unionByName(batch))
    return merged.groupBy("label").agg(F.count("*").alias("n"))


register("mutation_upsert_index", mutation_upsert_index, oracle="""
WITH batch AS (SELECT vec_id, embedding, CAST(9 AS INTEGER) AS label
               FROM embeddings WHERE vec_id < 50),
merged AS (
  SELECT vec_id, embedding, label FROM embeddings
  WHERE vec_id NOT IN (SELECT vec_id FROM batch)
  UNION ALL SELECT * FROM batch)
SELECT label, count(*) AS n FROM merged GROUP BY label
""")
