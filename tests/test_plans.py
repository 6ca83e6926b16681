"""Physical-plan assertions: the optimizer properties the engine's scale
story depends on must not silently regress.

These parse `.explain` output — brittle by nature, so each assertion targets
a stable, load-bearing property: column pruning, filter pushdown, broadcast
of small dims, and the extraction pipeline's scan/shuffle budget."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as em
from pdftableextractor_spark.operators.extract import extract_spans

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().toString()


def test_pricing_summary_prunes_and_pushes(spark):
    plan = _plan(em.queries()["q13_pricing_summary"](spark, SF))
    scan = [l for l in plan.split("\n") if "FileScan parquet" in l][-1]
    # column pruning: o_orderkey etc. absent; only the 7 needed columns
    assert "l_shipdate" in scan and "l_orderkey" not in scan
    # the shipdate filter reaches the scan
    assert "l_shipdate" in plan.split("DataFilters")[1].split("]")[0]


def test_star_join_broadcasts_dims(spark):
    plan = _plan(em.queries()["q32_star_join_agg"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2  # nation and region


def test_stratified_sample_is_shuffle_free(spark):
    """Hash sampling must stay a pure scan-side filter — zero Exchanges."""
    from pdftableextractor_spark.operators.sampling import stratified_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet").withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )
    plan = _plan(stratified_sample(docs, {"src0": 0.5}))
    assert "Exchange" not in plan.split("== Physical Plan ==")[1]


def test_decontaminate_broadcasts_benchmark(spark):
    """The benchmark gram set must broadcast — the corpus side is probed
    with a BroadcastHashJoin, never shuffled against the benchmark."""
    from pdftableextractor_spark.operators.dedup import ngram_decontaminate

    docs = spark.read.parquet(f"{SF}/documents.parquet").withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )
    bench = docs.limit(5)
    plan = _plan(ngram_decontaminate(docs, bench, n=3))
    phys = plan.split("== Physical Plan ==")[1]
    assert "BroadcastHashJoin" in phys


def test_pack_shards_single_group_exchange(spark):
    """Shard packing is a two-level prefix sum (round 4): an
    order-preserving range exchange feeding a (group, __bkt) local-cumsum
    window — never a global single-partition sort, and never a window
    partitioned on the group column alone (one task per group)."""
    from pdftableextractor_spark.operators.sampling import pack_shards

    docs = spark.createDataFrame(
        [(f"{i:03d}", f"g{i % 4}", 100) for i in range(100)],
        ["doc_id", "source", "n_tokens"],
    )
    phys = _plan(pack_shards(docs, 1000)).split("== Physical Plan ==")[1]
    assert "Exchange rangepartitioning" in phys
    assert "__bkt" in phys
    assert "SinglePartition" not in phys
    # the big-side cumsum window partitions by (group, bucket) — the only
    # group-only exchange left is the tiny per-bucket totals frame, which
    # must come back as a broadcast, never a shuffle join of the corpus
    assert any(
        seg[:80].startswith("source") and "__bkt" in seg[:80]
        for seg in phys.split("Exchange hashpartitioning(")[1:]
    ), "no (group, __bkt) window exchange found"
    assert "BroadcastHashJoin" in phys


def test_extract_reads_two_scans_one_shuffle(spark):
    docs = spark.createDataFrame(
        [("d1", [("text", "Hello world.", "", 0)])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    plan = _plan(extract_spans(docs))
    # budget: ONE shuffle (the per-doc ordering window); the pdf branch and
    # the relational branch each contribute one source scan
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"extraction shuffle budget exceeded: {n_exchanges}"


def test_extract_scan_budget_on_parquet(spark, tmp_path):
    from pdftableextractor_spark import corpus

    p = str(tmp_path / "c.parquet")
    corpus.write_corpus_parquet(p, 5, seed=3)
    plan = _plan(extract_spans(spark.read.parquet(p)))
    assert plan.count("FileScan parquet") == 2  # relational pass + pdf pass


def test_documents_filter_pushdown(spark):
    plan = _plan(em.queries()["q02_substantial_filter"](spark, SF))
    scan = [l for l in plan.split("\n") if "FileScan parquet" in l][-1]
    assert "n_chars" in scan  # filter travelled into the scan's DataFilters
    assert "lang" not in scan  # unused columns pruned


def test_bucketed_join_eliminates_exchanges(spark, tmp_path):
    from pdftableextractor_spark.plans.bucketing import (
        bucketed_join,
        count_exchanges,
        write_bucketed,
    )

    # force a shuffle-shaped join so the bucket co-location (not broadcast)
    # is what eliminates the exchanges
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        spark.sql("DROP TABLE IF EXISTS t_docs_bkt")
        spark.sql("DROP TABLE IF EXISTS t_stats_bkt")
        docs = spark.range(0, 500).select(
            F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
            (F.col("id") % 97).alias("x"),
        )
        stats = docs.select("doc_id", (F.col("x") * 2).alias("y"))
        write_bucketed(docs, "t_docs_bkt", n_buckets=8)
        write_bucketed(stats, "t_stats_bkt", n_buckets=8)
        joined = bucketed_join(spark, "t_docs_bkt", "t_stats_bkt")
        assert joined.count() == 500
        # co-located SortMergeJoin: no shuffle on either side
        assert count_exchanges(joined) == 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan and "Bucketed: true" in plan
        # control: the same join on plain (non-bucketed) frames shuffles
        plain = docs.join(stats.withColumnRenamed("y", "y2"), "doc_id")
        plain.count()
        assert count_exchanges(plain) >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_docs_bkt")
        spark.sql("DROP TABLE IF EXISTS t_stats_bkt")


def test_table_points_single_scan_no_joins(spark, tmp_path):
    """Header/label pairing must be window-based: ONE scan of the cells
    frame, no self-joins (the join formulation scanned it three times)."""
    from pdftableextractor_spark.operators.structure import table_points

    p = str(tmp_path / "cells.parquet")
    spark.createDataFrame(
        [("d1", 0, 0, 0, "Metric"), ("d1", 0, 0, 1, "Q1"),
         ("d1", 0, 1, 0, "alpha"), ("d1", 0, 1, 1, "$5")],
        ["doc_id", "offset", "row_idx", "col_idx", "text"],
    ).write.parquet(p)
    plan = _plan(table_points(spark.read.parquet(p)))
    assert plan.count("FileScan parquet") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_build_session_honors_master_and_sizes_shuffle(spark):
    """The session fixture was built with an explicit master; shuffle
    partitions must be 4x its core count (the submit-clobbering regression
    pinned: an explicit master must never be silently replaced)."""
    assert spark.sparkContext.master == "local[4]"
    assert spark.conf.get("spark.sql.shuffle.partitions") == "16"


def test_bm25_no_explode_two_exchanges(spark):
    """BM25 must stay shuffle-free for tf: no Generate anywhere; the only
    Exchanges are the one-row stats reduce and its broadcast."""
    from pdftableextractor_spark.operators.ranking import bm25_scores

    docs = spark.read.parquet(f"{SF}/documents.parquet").withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )
    phys = _plan(bm25_scores(docs, ["scan", "table"])).split(
        "== Physical Plan =="
    )[1]
    assert "Generate" not in phys
    assert phys.count("Exchange") <= 2


def test_temperature_mix_broadcasts_fractions(spark):
    """Per-stratum fractions (one row per stratum) must broadcast back to
    the corpus — never a shuffle join on the stratum key."""
    from pdftableextractor_spark.operators.sampling import temperature_mix

    docs = spark.read.parquet(f"{SF}/documents.parquet").withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )
    phys = _plan(temperature_mix(docs)).split("== Physical Plan ==")[1]
    assert "BroadcastHashJoin" in phys
    assert "SortMergeJoin" not in phys


def test_round4_operators_plan_shapes(spark):
    """Pin the round-4 operators' physical shapes: scan-side gram
    construction means NO Window anywhere in q62/q63/q65; nothing plans a
    cartesian/broadcast-nested-loop; containment's shingle frame is served
    from cache (the persist is load-bearing — 5 branches read it); fuzzy
    decontamination broadcasts the benchmark side."""
    from pyspark.sql import functions as F

    from pdftableextractor_spark.operators.dedup import (
        containment_pairs,
        duplicate_ngram_spans,
        fuzzy_decontaminate,
        mask_duplicate_spans,
    )
    from pdftableextractor_spark.operators.textstats import (
        bigram_transition_score,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).withColumn("doc_id", F.col("doc_id").cast("string"))

    def phys(df):
        return df._jdf.queryExecution().executedPlan().toString()

    for df in (
        duplicate_ngram_spans(docs, n=4),
        bigram_transition_score(docs),
        mask_duplicate_spans(docs, n=4),
    ):
        p = phys(df)
        assert "Window" not in p, "gram construction regressed to a window"
        assert "CartesianProduct" not in p

    spark.catalog.clearCache()  # known-clean baseline for the leak assert
    p = phys(containment_pairs(docs, n=3, threshold=0.5))
    assert "ExistingRDD" in p, "shingle localCheckpoint not in effect"
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # the materialization must NOT pin a CacheManager entry (the round-4
    # persist leaked one per call for the session lifetime)
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.isEmpty(), "containment_pairs left a pinned cache entry"

    bench = docs.filter(F.col("doc_id").cast("bigint") % 20 == 0)
    corp = docs.filter(F.col("doc_id").cast("bigint") % 20 != 0)
    p = phys(fuzzy_decontaminate(corp, bench, n=3, threshold=0.5))
    assert p.count("BroadcastHashJoin") >= 2, "bench side must broadcast"
    assert "Window" not in p and "CartesianProduct" not in p
