from binaryvectordb_spark.sources.tables import (  # noqa: F401
    TABLE_NAMES,
    load_table,
    load_tables,
    register_views,
)
