"""Table readers (SURVEY.md §2.1).

Parquet in the sandbox; the same entry points take ``format='iceberg'`` on a
cluster with the Iceberg runtime — the engine never assumes anything beyond
``spark.read.format(...).load(...)``. Binary ingestion of raw PDFs maps to
``spark.read.format('binaryFile')`` (S1/S2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load_table(
    spark: SparkSession, sf_dir: str, name: str, fmt: str = "parquet"
) -> DataFrame:
    if fmt == "parquet":
        return spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return spark.read.format(fmt).load(f"{sf_dir}/{name}")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (SQL entry point)."""
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def read_documents(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """The interleaved documents corpus (doc_id, spans)."""
    if fmt == "parquet":
        return spark.read.parquet(path)
    return spark.read.format(fmt).load(path)


def read_pdf_binaries(spark: SparkSession, path: str) -> DataFrame:
    """Raw PDF ingestion (S1/S2 analog): binaryFile source → (path, content).
    Downstream, a parser kernel turns content bytes into word-box pages; in
    this sandbox the corpus generator plays that role."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .load(path)
        .select("path", "length", "content")
    )
