"""Resumable runs: per-partition lineage/metrics + rerun skip (SURVEY.md §4.3,
FIXTURES.md §5).

Documents hash into ``n_buckets`` deterministic buckets (pmod(xxhash64(doc_id))).
A run writes extraction output partitioned by bucket (dynamic partition
overwrite → re-processing a bucket replaces it exactly, never duplicates),
then appends one lineage row per completed bucket to the metrics table.
A rerun anti-joins the pending set against the 'done' lineage rows and only
processes what's missing — kill the job anywhere and rerun; completed buckets
are skipped, interrupted buckets are rewritten atomically.

Storage here is plain parquet; on a production cluster both tables are
Iceberg (`format("iceberg")``) and the bucket column becomes a hidden
``bucket(doc_id, N)`` partition transform — the logic is unchanged.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdftableextractor_spark.types import METRICS_SCHEMA

N_BUCKETS_DEFAULT = 64


def with_bucket(df: DataFrame, n_buckets: int = N_BUCKETS_DEFAULT) -> DataFrame:
    return df.withColumn(
        "bucket_id", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")
    )


def done_buckets(spark: SparkSession, metrics_path: str, run_id: str) -> set[int]:
    try:
        m = spark.read.parquet(metrics_path)
    except Exception:
        return set()
    rows = (
        m.filter((F.col("run_id") == run_id) & (F.col("status") == "done"))
        .select("partition_id")
        .distinct()
        .collect()
    )
    return {r["partition_id"] for r in rows}


def run_extract_resumable(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    metrics_path: str,
    run_id: str,
    n_buckets: int = N_BUCKETS_DEFAULT,
    fail_after_buckets: int | None = None,
) -> dict:
    """Extract with per-bucket lineage; rerun with the same run_id resumes.

    ``fail_after_buckets`` injects a crash after N buckets complete — used by
    the resumability test to simulate a mid-run kill.
    """
    from pdftableextractor_spark.operators.extract import extract_spans

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    docs = with_bucket(spark.read.parquet(input_path), n_buckets)
    done = done_buckets(spark, metrics_path, run_id)
    pending = sorted(
        r["bucket_id"]
        for r in docs.select("bucket_id").distinct().collect()
        if r["bucket_id"] not in done
    )

    processed = 0
    for bucket in pending:
        t0 = time.time()
        part = docs.filter(F.col("bucket_id") == bucket)
        out = extract_spans(part.select("doc_id", "spans")).withColumn(
            "bucket_id", F.lit(bucket).cast("int")
        )
        # dynamic overwrite: exactly this bucket's directory is replaced
        out.write.mode("overwrite").partitionBy("bucket_id").parquet(
            output_path
        )
        stats = part.agg(
            F.count("*").alias("docs"),
            F.sum(F.size("spans")).alias("spans_in"),
            F.min("doc_id").alias("dmin"),
            F.max("doc_id").alias("dmax"),
        ).collect()[0]
        spans_out = (
            spark.read.parquet(output_path)
            .filter(F.col("bucket_id") == bucket)
            .count()
        )
        row = [
            (
                run_id,
                int(bucket),
                stats["dmin"],
                stats["dmax"],
                int(stats["docs"]),
                int(stats["spans_in"] or 0),
                int(spans_out),
                "done",
                int((time.time() - t0) * 1000),
            )
        ]
        spark.createDataFrame(row, METRICS_SCHEMA).write.mode("append").parquet(
            metrics_path
        )
        processed += 1
        if fail_after_buckets is not None and processed >= fail_after_buckets:
            raise RuntimeError(
                f"injected failure after {processed} buckets (test hook)"
            )
    return {
        "run_id": run_id,
        "buckets_total": len(pending) + len(done),
        "buckets_skipped": len(done),
        "buckets_processed": processed,
    }
