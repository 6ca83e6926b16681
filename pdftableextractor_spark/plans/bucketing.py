"""Bucketed tables: co-located doc-level joins with zero shuffle.

At 100 TB every downstream stage joins on doc_id (spans ⋈ points,
spans ⋈ quality, dedup verdict ⋈ corpus). Writing both sides bucketed by
doc_id with the same bucket count lets Spark plan a SortMergeJoin with NO
Exchange on either side — the single biggest shuffle saving available to a
pipeline whose join key never changes. On Iceberg this is the
``bucket(N, doc_id)`` partition transform; in the sandbox it is the Hive
bucketed-table format under spark-warehouse/ (semantics identical).

``assert_no_exchange_join`` is used by tests to prove the property from the
physical plan rather than trusting it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "doc_id",
    n_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str = "doc_id"
) -> DataFrame:
    """Join two same-bucketed tables on the bucket key; with matching bucket
    counts Catalyst plans SortMergeJoin with no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on)


def count_exchanges(df: DataFrame) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count(
        "Exchange hashpartitioning"
    )
