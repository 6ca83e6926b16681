from pdftableextractor_spark.sources.tables import (  # noqa: F401
    load_table,
    read_documents,
    register_views,
)
