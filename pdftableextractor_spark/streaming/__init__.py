from pdftableextractor_spark.streaming.stream import stream_extract  # noqa: F401
