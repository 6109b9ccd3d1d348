"""Bucketed tables co-locate join keys so doc_id joins need NO shuffle —
the physical layout for the 100 TB index/documents tables (SURVEY §1.3,
§4 'partition index/documents by doc_id bucket or hash')."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from binaryvectordb_spark.operators.cascade import build_doc_store, build_index
from binaryvectordb_spark.plans import formatted_plan
from binaryvectordb_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    # warehouse.dir is a static conf — uses the session default
    # (./spark-warehouse, gitignored); tables are dropped on teardown
    emb = load_table(spark, SF_SMOKE, "embeddings")
    docs = load_table(spark, SF_SMOKE, "documents")
    (build_index(emb, 64).write.mode("overwrite")
     .bucketBy(8, "doc_id").sortBy("doc_id")
     .saveAsTable("bv_index_bucketed"))
    (build_doc_store(emb, docs).write.mode("overwrite")
     .bucketBy(8, "doc_id").sortBy("doc_id")
     .saveAsTable("bv_docs_bucketed"))
    yield "bv_index_bucketed", "bv_docs_bucketed"
    spark.sql("DROP TABLE IF EXISTS bv_index_bucketed")
    spark.sql("DROP TABLE IF EXISTS bv_docs_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    idx_t, docs_t = bucketed_tables
    idx = spark.table(idx_t)
    docs = spark.table(docs_t)
    joined = idx.join(docs, "doc_id").where(F.col("doc") .isNotNull())
    plan = formatted_plan(joined)
    # co-located bucketed join: SortMergeJoin without any hash-partitioning
    # exchange on either side
    assert "Exchange hashpartitioning" not in plan
    assert joined.count() > 0


def test_bucketed_matches_unbucketed(spark, bucketed_tables):
    idx_t, docs_t = bucketed_tables
    emb = load_table(spark, SF_SMOKE, "embeddings")
    docs = load_table(spark, SF_SMOKE, "documents")
    want = build_index(emb, 64).join(build_doc_store(emb, docs), "doc_id").count()
    got = spark.table(idx_t).join(spark.table(docs_t), "doc_id").count()
    assert got == want
