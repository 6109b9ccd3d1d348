"""Round-2 API walkthrough: pluggable IVF index (index_type/index_args —
the reference's constructor knobs, BinaryVectorDB/BinaryVectorDB.py:17,:60),
deferred persistence (save=False / save(), reference :67,:114,:155), typed
payloads, and bucket-pruned point reads."""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryvectordb_spark import BinaryVectorDB
from binaryvectordb_spark.session import get_spark


def main() -> None:
    spark = get_spark("example-ivf")
    spark.sparkContext.setLogLevel("ERROR")

    # IVF-partitioned DB: KMeans trains on first ingest; search probes the
    # nprobe nearest partitions instead of brute-forcing the whole index
    db = BinaryVectorDB(spark, tempfile.mkdtemp(), dim=64,
                        index_type="ivf",
                        index_args={"n_clusters": 8, "nprobe": 2})

    # deferred saves: three add calls, ONE storage merge at save()
    db.add_documents([1, 2], [{"title": "Paris", "pop": 2.1},
                              {"title": "Berlin", "pop": 3.6}],
                     docs2text=lambda d: d["title"], save=False)
    db.add_documents([3], [{"title": "Rome", "pop": 2.8}],
                     docs2text=lambda d: d["title"], save=False)
    db.add_documents([4], ["plain string doc about Madrid"], save=False)
    db.save()
    print(f"{len(db)} docs in {db.index_df().select('cluster').distinct().count()} "
          f"IVF partitions")

    # typed payloads round-trip: dicts come back as dicts
    hits = db.search("Paris", k=2)                 # nprobe=2 pruned cascade
    print("ivf search:", [(h["doc_id"], h["doc"]) for h in hits])
    exact = db.search("Paris", k=2, nprobe=8)      # probe all == flat-exact
    print("full-probe:", [(h["doc_id"], h["doc"]) for h in exact])

    # bucket-pruned point read (RocksDB-get shape): only the bucket dirs
    # owning ids 2 and 4 are opened
    print("get_docs:", db.get_docs([2, 4, 999]))


if __name__ == "__main__":
    main()
