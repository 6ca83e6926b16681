"""pdftableextractor_spark — a PySpark-native main-content extraction engine.

A from-scratch, Spark-first rebuild of the *capabilities* of
``ArjunTewari/PDFTableExtractor`` (reference read-only at /root/reference):
per-document text/table/key-value extraction over Iceberg/parquet tables of
interleaved text+media documents, replacing the reference's
Flask + Amazon Textract + OpenAI call chain with pure deterministic batch
transforms (built-in Spark SQL expressions on the hot path, batched
Arrow/pandas kernels where layout math genuinely needs numpy).

Top-level layout:

- ``types``      — frozen StructType schemas (input documents, output spans,
                   metrics/lineage table).
- ``session``    — tuned SparkSession builder (Arrow on, AQE on).
- ``corpus``     — deterministic synthetic interleaved-document generator +
                   an adapter that derives an interleaved corpus from the
                   driver's flat ``documents`` testdata table.
- ``functions``  — scalar Column-expression library (normalize, footnote,
                   boilerplate predicates) shared by every operator; the
                   canonical regex spec lives here once.
- ``kernels``    — Arrow-batched pandas kernels (PDF word-box layout parse,
                   table-region detection, grid reconstruction).
- ``operators``  — the dataflow operators: extraction pipeline, structuring
                   (chunker / lexical commentary / sessionization / dedup),
                   dedup suite (exact, MinHash-LSH, SimHash, n-gram Jaccard,
                   embedding near-dup), similarity search, text analysis,
                   multimodal plumbing.
- ``plans``      — scale machinery: salted repartitioning, resumable
                   per-partition lineage/metrics.
- ``sources``    — readers for the parquet/Iceberg tables.
- ``streaming``  — Structured Streaming wrapper of the extraction pipeline.
- ``oracle``     — an independently-written pure-Python/pandas reference
                   implementation used only by tests to freeze golden
                   fixtures (never imported by the engine).
"""

__version__ = "0.1.0"
