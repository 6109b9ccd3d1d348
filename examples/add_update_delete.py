"""CRUD walkthrough — mirrors the reference's examples/add_update_delete.py
(the de-facto behavioral spec, SURVEY §5): add 2 docs, search, add another,
UPSERT one, search reflects the update, delete it, search no longer
returns it."""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryvectordb_spark import BinaryVectorDB
from binaryvectordb_spark.session import get_spark

D2T = lambda d: d["title"] + " " + d["text"]  # noqa: E731


def show(hits):
    for h in hits:
        # typed payloads: dict payloads come back as dicts, not JSON strings
        print(f"  {h['doc_id']}  cossim={h['score_cossim']:.4f}  {str(h['doc'])[:50]}")


def main() -> None:
    spark = get_spark("example-crud")
    spark.sparkContext.setLogLevel("ERROR")
    db = BinaryVectorDB(spark, tempfile.mkdtemp(), dim=64)

    db.add_documents(
        [1, 2],
        [{"title": "Paris", "text": "capital of France"},
         {"title": "Berlin", "text": "capital of Germany"}],
        docs2text=D2T)
    print(f"after add: {len(db)} docs");  show(db.search("Paris France", k=2))

    db.add_documents([3], [{"title": "Rome", "text": "capital of Italy"}],
                     docs2text=D2T)
    print(f"after add one more: {len(db)} docs")

    # upsert doc 2 — delete-then-insert, not append (:68-76 in the example)
    db.add_documents([2], [{"title": "Madrid", "text": "capital of Spain"}],
                     docs2text=D2T)
    print(f"after upsert (still): {len(db)} docs")
    show(db.search("Madrid Spain", k=2))

    db.remove_doc(2)
    print(f"after delete: {len(db)} docs")
    show(db.search("Madrid Spain", k=3))


if __name__ == "__main__":
    sys.exit(main())
