"""Watermarked event-time windowed aggregation over an unbounded stream.

The missing third leg of the streaming surface (stream.py = stateless
per-batch extraction, stateful.py = custom keyed state): late-data-tolerant
windowed counts with Spark's native watermark mechanics.

Semantics (pinned by tests/test_stateful_streaming.py):
- events land in tumbling event-time windows of ``window_duration``;
- a late event still counts if it arrives while its window is open —
  i.e. before the watermark (max event time seen − ``watermark_delay``)
  passes the window end;
- an event later than the watermark is DROPPED (bounded state: the store
  holds only windows newer than the watermark);
- append mode emits each window EXACTLY ONCE, when the watermark passes
  its end — the downstream-safe contract for an unbounded pipeline.

At cluster scale the shuffle key is (window, event_type) and state shards
by it in RocksDB; the watermark bounds state size regardless of stream
length.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def stream_windowed_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: str = "event_id bigint, event_type string, ts timestamp",
    window_duration: str = "10 minutes",
    watermark_delay: str = "30 minutes",
    available_now: bool = True,
):
    """Run (with available_now, to completion) the watermarked windowed
    count: parquet file stream → tumbling windows per event_type → parquet
    append of closed windows. Returns the StreamingQuery."""
    src = spark.readStream.schema(schema).parquet(input_dir)
    agg = (
        src.withWatermark("ts", watermark_delay)
        .groupBy(
            F.window("ts", window_duration).alias("w"),
            "event_type",
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q
