"""Lexical relevance ranking over a documents corpus: BM25.

Query-time path for a handful of query terms — the common "find the docs
about X in the corpus" analytics ask — NOT a full inverted-index build:

- One explode of the token stream, with the ``w.isin(query_terms)``
  predicate applied scan-side (Catalyst pushes it below the exchange), so
  only query-term occurrences ever shuffle.
- Per-document tf for each term via conditional aggregation in ONE
  groupBy(doc) pass — no per-term joins; document length comes from the
  same pass.
- Corpus statistics (N, avgdl, per-term document frequency) are one
  single-row aggregate, attached with a broadcast cross-join — fully lazy,
  nothing is collected to the driver.

At 100 TB the shuffled volume is O(matching term occurrences), the per-doc
state is q+1 numbers (q = #query terms), and the stats row is q+2 numbers:
scan-bound by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdftableextractor_spark.operators.dedup import tokenize_col

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(doc_id, score) for every document matching >= 1 query term, scored
    with Lucene-style BM25:

        idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
        s(d, t) = idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))

    N counts ALL docs (dl > 0), avgdl averages ALL doc lengths — the corpus
    statistics are unconditional; only the tf rows are term-filtered.
    Term order in the score sum is the sorted term list (float addition is
    order-sensitive; the DuckDB oracle mirrors the same order).
    """
    terms = sorted(set(query_terms))
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize_col(F.col(text_col))).alias("w"),
    ).filter(F.col("w") != "")
    per_doc = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum(F.when(F.col("w") == t, 1).otherwise(0)).alias(f"tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("bigint")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats))
    norm = F.lit(float(k1)) * (
        F.lit(1.0)
        - F.lit(float(b))
        + F.lit(float(b)) * F.col("dl") / F.col("avgdl")
    )
    score = None
    for i in range(len(terms)):
        tf = F.col(f"tf{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df{i}") + F.lit(0.5))
            / (F.col(f"df{i}") + F.lit(0.5))
        )
        part = idf * tf * F.lit(float(k1) + 1.0) / (tf + norm)
        score = part if score is None else score + part
    return (
        scored.select("doc_id", score.alias("score"))
        .filter(F.col("score") > 0)
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    **kwargs,
) -> DataFrame:
    """Top-k BM25 matches — orderBy+limit compiles to TakeOrderedAndProject
    (per-partition heaps, no global sort)."""
    return (
        bm25_scores(docs, query_terms, **kwargs)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(k)
    )
