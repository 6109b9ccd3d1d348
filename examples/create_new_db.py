"""Bulk-build walkthrough — the Spark-native counterpart of the reference's
examples/create_new_db.py: ingest a JSONL corpus, embed, build the two-tier
store, smoke-search.  Runs hermetically (deterministic local embedder, no
network — the reference requires a Cohere API key, :37-38; we must not)."""

import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryvectordb_spark import BinaryVectorDB
from binaryvectordb_spark.session import get_spark


def main() -> None:
    spark = get_spark("example-create")
    spark.sparkContext.setLogLevel("ERROR")

    # stand-in corpus (the reference streams wikipedia jsonl.gz, :31-34)
    corpus = tempfile.mkdtemp()
    path = f"{corpus}/docs.jsonl.gz"
    docs = [
        {"_id": 0, "title": "Spark", "text": "distributed dataframe engine"},
        {"_id": 1, "title": "Parquet", "text": "columnar storage format"},
        {"_id": 2, "title": "Hamming", "text": "bit distance between codes"},
        {"_id": 3, "title": "Cosine", "text": "angle based vector similarity"},
    ]
    with gzip.open(path, "wt") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")

    db_folder = tempfile.mkdtemp()
    db = BinaryVectorDB(spark, db_folder, dim=64)

    from binaryvectordb_spark.sources.tables import read_jsonl
    rows = read_jsonl(spark, path).collect()
    db.add_documents(
        [int(r._id) for r in rows],
        [{"title": r.title, "text": r.text} for r in rows],
        docs2text=lambda d: d["title"] + " " + d["text"],  # README.md:109 shape
    )
    print(f"built db at {db_folder}: {len(db)} docs")

    for hit in db.search("vector similarity search", k=2):
        # dict payloads round-trip as dicts (typed payloads)
        print(f"  {hit['doc_id']}  cossim={hit['score_cossim']:.4f}  "
              f"{str(hit['doc'])[:60]}")


if __name__ == "__main__":
    sys.exit(main())
