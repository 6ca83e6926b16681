from pdftableextractor_spark.operators.extract import extract_spans  # noqa: F401
