"""Structured Streaming wrapper of the extraction pipeline.

The reference's "streaming" is an SSE row feed over a completed batch
(app.py:240-400, SURVEY.md §2.10): rows stream out progressively as
documents finish. The Spark-native equivalent is a file/Iceberg streaming
source over the documents table with ``foreachBatch``: each micro-batch of
newly-arrived documents runs the SAME batch extraction operator and appends
its span sequences — per-document output is identical to the batch path
(the ordering window is per-doc, and a document arrives whole in one batch).

``Trigger.AvailableNow`` gives catch-up/backfill semantics; checkpointing
gives exactly-once appends across restarts (the streaming analog of
plans/resume.py's bucket lineage).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from pdftableextractor_spark.types import DOCUMENTS_SCHEMA


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start (and with available_now=True, run to completion) the streaming
    extraction: parquet file source → extract_spans per micro-batch →
    parquet append. Returns the StreamingQuery."""
    from pdftableextractor_spark.operators.extract import extract_spans

    src = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", "8")
        .parquet(input_dir)
    )

    def process_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        extract_spans(batch_df).write.mode("append").parquet(output_dir)

    writer = (
        src.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q
