"""Vectorized UDF surface (SURVEY §2.11): scalar pandas_udf, grouped-map
applyInPandas, and grouped-agg pandas_udf — the three Arrow-batched extension
points (the engine's generalization of the reference's single ``docs2text``
Python hook, BinaryVectorDB/BinaryVectorDB.py:67).

Oracle strategy: the UDF bodies compute order-independent quantities
(counts, min/max, exact integer sums) so DuckDB can replicate them exactly —
the check proves the Arrow plumbing delivers the same rows/batches, not just
that numpy works.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from binaryvectordb_spark.queries import register
from binaryvectordb_spark.sources.tables import load_table


def udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf over an Arrow batch: vectorized token count."""
    @pandas_udf("int")
    def tok_count(s: pd.Series) -> pd.Series:
        return s.str.split(" ").str.len().astype("int32")

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", tok_count("text").alias("n_tokens"))


register("udf_scalar_pandas", udf_scalar_pandas, oracle="""
SELECT doc_id, CAST(length(string_split(text, ' ')) AS INTEGER) AS n_tokens
FROM documents
""")


def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: per-label embedding panel stats.  Each
    group arrives as one pandas frame (the custom-stateful-operator shape)."""
    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        first = pdf["embedding"].str[0]
        return pd.DataFrame({
            "label": [int(pdf["label"].iloc[0])],
            "n": [len(pdf)],
            "min_id": [int(pdf["vec_id"].min())],
            "max_id": [int(pdf["vec_id"].max())],
            "min_first_dim": [float(first.min())],
            "max_first_dim": [float(first.max())],
        })

    e = load_table(spark, sf_dir, "embeddings")
    return e.groupBy("label").applyInPandas(
        stats, schema=("label int, n long, min_id long, max_id long, "
                       "min_first_dim double, max_first_dim double"))


register("udf_grouped_map", udf_grouped_map, oracle="""
SELECT label, count(*) AS n, min(vec_id) AS min_id, max(vec_id) AS max_id,
       CAST(min(embedding[1]) AS DOUBLE) AS min_first_dim,
       CAST(max(embedding[1]) AS DOUBLE) AS max_first_dim
FROM embeddings GROUP BY label
""")


def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas_udf (a vectorized UDAF): exact integer sum of
    n_chars per lang — order-independent, so oracle-exact."""
    @pandas_udf("long")
    def sum_chars(s: pd.Series) -> int:
        return int(s.sum())

    @pandas_udf("long")
    def n_rows(s: pd.Series) -> int:
        # Spark rejects mixing pandas grouped-agg UDFs with built-in
        # aggregates in one agg() — so the count is a pandas UDF too
        return int(len(s))

    d = load_table(spark, sf_dir, "documents")
    return (d.groupBy("lang")
            .agg(sum_chars("n_chars").alias("total_chars"),
                 n_rows("doc_id").alias("n_docs")))


register("udf_grouped_agg", udf_grouped_agg, oracle="""
SELECT lang, CAST(sum(n_chars) AS BIGINT) AS total_chars, count(*) AS n_docs
FROM documents GROUP BY lang
""")


def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (Spark 4 useArrow=True): per-row Python
    logic with Arrow batch transfer instead of pickled rows.  Integer
    arithmetic only, so the SQL oracle matches exactly — the point here is
    checking the execution path, not the math."""
    from pyspark.sql.functions import udf

    @udf("bigint", useArrow=True)
    def order_bucket(key: int, price: float) -> int:
        return key % 7 + (1 if price > 100000 else 0) * 100

    o = load_table(spark, sf_dir, "orders")
    return (o.select("o_orderkey",
                     order_bucket("o_orderkey", "o_totalprice").alias("bucket"))
            .groupBy("bucket").agg(F.count("*").alias("n")))


register("udf_arrow_scalar", udf_arrow_scalar, oracle="""
SELECT bucket, count(*) AS n FROM (
  SELECT o_orderkey % 7 + CASE WHEN o_totalprice > 100000 THEN 100 ELSE 0 END
    AS bucket
  FROM orders
) GROUP BY bucket
""")


def udtf_chunk_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python user-defined TABLE function (Spark 4 @udtf) applied per-row
    via LATERAL — the row-generator extension point (§2.11's third leg
    beside scalar UDFs and grouped map/agg).  The UDTF splits each doc
    into non-overlapping 16-token chunks; token slicing is pure integer
    arithmetic so the DuckDB oracle replicates it exactly.  Scale: a UDTF
    runs inside the scan stage (no shuffle) and streams its yielded rows —
    output is linear in corpus tokens, same as the explode-based
    text_chunk_documents, but with arbitrary Python row logic."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk_text string, n_chunk_tokens int")
    class ChunkSplit:
        def eval(self, text: str):
            toks = text.split(" ")
            for i in range(0, len(toks), 16):
                part = toks[i:i + 16]
                yield i // 16, " ".join(part), len(part)

    spark.udtf.register("chunk_split_udtf", ChunkSplit)
    load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200) \
        .createOrReplaceTempView("udtf_docs_v")
    return spark.sql("""
        SELECT d.doc_id, t.chunk_idx, t.chunk_text, t.n_chunk_tokens
        FROM udtf_docs_v d, LATERAL chunk_split_udtf(d.text) t
    """)


register("udtf_chunk_lateral", udtf_chunk_lateral, oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS tokens,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents WHERE doc_id < 200
), ex AS (
  SELECT doc_id, tokens, n_tokens,
         unnest(range(0, CAST(ceil(n_tokens / 16.0) AS INTEGER))) AS chunk_idx
  FROM t
)
SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
       array_to_string(list_slice(tokens, chunk_idx * 16 + 1,
                                  chunk_idx * 16 + 16), ' ') AS chunk_text,
       CAST(len(list_slice(tokens, chunk_idx * 16 + 1, chunk_idx * 16 + 16))
            AS INTEGER) AS n_chunk_tokens
FROM ex
""")
