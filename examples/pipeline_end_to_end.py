"""End-to-end training-data pipeline — the north-star use of this engine:

  raw JSONL corpus
    -> exact dedup (hash keep-first)
    -> chunk into overlapping token windows
    -> embed executor-side (mapInPandas)
    -> build the two-tier vector index (packed binary + int8 store)
    -> batched similarity serving

Every stage is a DataFrame transform; nothing but the final top-k ever
reaches the driver."""

import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from binaryvectordb_spark import BinaryVectorDB
from binaryvectordb_spark.session import get_spark
from binaryvectordb_spark.sources.tables import read_jsonl

DIM = 32


def main() -> None:
    spark = get_spark("example-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="bvdb_pipeline_")

    # -- raw corpus (gzipped JSONL, the reference's ingest format) ----------
    raw_path = os.path.join(work, "corpus.jsonl.gz")
    topics = ["spark sql engines", "vector similarity search",
              "streaming watermarks", "parquet column pruning"]
    with gzip.open(raw_path, "wt") as f:
        for i in range(60):
            text = f"{topics[i % 4]} " * 12 + f"document {i}"
            f.write(json.dumps({"id": i, "text": text}) + "\n")
            if i % 3 == 0:  # plant exact duplicates
                f.write(json.dumps({"id": 1000 + i, "text": text}) + "\n")
    docs = read_jsonl(spark, raw_path)
    print(f"raw: {docs.count()} rows")

    # -- exact dedup: hash text, keep first id per hash ---------------------
    w = Window.partitionBy("h").orderBy("id")
    deduped = (docs.withColumn("h", F.sha2("text", 256))
               .withColumn("rn", F.row_number().over(w))
               .where(F.col("rn") == 1).drop("h", "rn"))
    print(f"after exact dedup: {deduped.count()} rows")

    # -- chunk into overlapping windows (size 8 tokens, stride 4) -----------
    toks = deduped.select("id", F.split("text", " ").alias("t"))
    n = F.size("t")
    chunks = (toks.select(
        "id", F.explode(F.sequence(F.lit(0), F.ceil(n / 4.0).cast("int") - 1))
        .alias("ci"), "t")
        .where(F.col("ci") * 4 < F.size("t"))
        .select((F.col("id") * 1000 + F.col("ci")).alias("doc_id"),
                F.array_join(F.slice("t", F.col("ci") * 4 + 1, 8), " ")
                .alias("text")))
    print(f"chunks: {chunks.count()} rows")

    # -- embed executor-side + build the two-tier index ---------------------
    db = BinaryVectorDB(spark, os.path.join(work, "db"), dim=DIM)
    db.add_documents_df(chunks)          # mapInPandas embedding, merge, swap
    print(f"indexed: {len(db)} chunks")

    # -- batched serving ----------------------------------------------------
    for query, hits in zip(
            ["vector similarity", "column pruning"],
            db.search_batch(["vector similarity", "column pruning"], k=3)):
        print(f"query {query!r}:")
        for h in hits:
            print(f"  {h['doc_id']}  cossim={h['score_cossim']:.4f}  {h['doc'][:60]}")


if __name__ == "__main__":
    main()
