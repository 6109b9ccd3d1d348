"""Search walkthrough over the driver fixtures — counterpart of the
reference's examples/search_in_db.py REPL, non-interactive: runs the full
three-phase cascade for a few fixture queries and prints the hits."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from binaryvectordb_spark.operators.cascade import (
    build_doc_store,
    build_index,
    cascade_search,
)
from binaryvectordb_spark.session import get_spark
from binaryvectordb_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
DIM = 64


def main() -> None:
    spark = get_spark("example-search")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, SF_DIR, "embeddings")
    docs = load_table(spark, SF_DIR, "documents")
    index = build_index(emb, DIM).cache()   # RAM tier (README.md:68)
    store = build_doc_store(emb, docs)

    for qid in (0, 7, 42):
        qdf = (emb.where(F.col("vec_id") == qid)
               .select(F.col("embedding").alias("qvec")))
        print(f"query vec_id={qid}:")
        for h in cascade_search(index, store, DIM, query_df=qdf, k=3).collect():
            print(f"  {h.doc_id}  hamming={h.score_hamming}"
                  f"  cossim={h.score_cossim:.4f}  {h.doc[:50]}")


if __name__ == "__main__":
    sys.exit(main())
