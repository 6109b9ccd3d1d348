"""binaryvectordb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of cohere-ai/BinaryVectorDB.

The reference (at /root/reference, BinaryVectorDB/BinaryVectorDB.py) is a
single-node 3-phase quantized k-NN cascade over a faiss binary index + RocksDB
doc store.  This package re-expresses the same semantics Spark-first:

- the faiss binary index  -> a slim cached DataFrame ``index(doc_id, vec ARRAY<BIGINT>)``
- the RocksDB doc store   -> a Parquet ``documents`` table, joined post-truncation
- the search cascade      -> one declarative DataFrame plan (Catalyst fuses the
  scoring projections into the scan; top-k plans as TakeOrderedAndProject)
- mutation (upsert/delete)-> anti-join + union overwrite (Delta MERGE when available)

plus the north-star extensions: a full relational operator surface, LLM-data-
pipeline operators (dedup, similarity search, text analysis, multimodal), and
Structured Streaming over event streams.  Everything is built for horizontal
scale: declarative plans, broadcast joins for small sides, partial aggregation,
no driver-side loops in the hot path.
"""

__version__ = "0.1.0"

from binaryvectordb_spark.db import (  # noqa: F401
    BinaryVectorDB,
    ConcurrentWriteError,
)
