from binaryvectordb_spark.operators.cascade import (  # noqa: F401
    build_doc_store,
    build_index,
    cascade_search,
    cascade_search_batch,
)
