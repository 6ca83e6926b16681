"""Resumability (FIXTURES.md §5) and streaming-parity tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdftableextractor_spark import corpus, oracle
from pdftableextractor_spark.plans.resume import (
    done_buckets,
    run_extract_resumable,
)
from pdftableextractor_spark.streaming.stream import stream_extract

N_DOCS = 40


@pytest.fixture(scope="module")
def corpus_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("rcorpus") / "documents.parquet")
    corpus.write_corpus_parquet(p, N_DOCS, seed=11)
    return p


def _expected(seed=11, n=N_DOCS):
    rows = oracle.extract_corpus(corpus.gen_documents(n, seed=seed))
    return sorted(
        (r["doc_id"], r["order"], r["kind"], r["text"], r["media_ref"])
        for r in rows
    )


def test_jobs_leave_session_conf_unchanged(spark, corpus_path, tmp_path):
    """Round-2 advice: partitionOverwriteMode used to be set session-wide by
    the resume runner and the streaming sink. It is now a per-WRITE option —
    the session conf must be byte-identical after both job functions
    return."""
    key = "spark.sql.sources.partitionOverwriteMode"
    before = spark.conf.get(key)
    run_extract_resumable(
        spark, corpus_path, str(tmp_path / "co"), str(tmp_path / "cm"),
        run_id="conf1", n_buckets=4,
    )
    assert spark.conf.get(key) == before
    stream_extract(
        spark, corpus_path.rsplit("/", 1)[0],
        str(tmp_path / "so"), str(tmp_path / "sck"),
    )
    assert spark.conf.get(key) == before


def test_resume_after_injected_failure(spark, corpus_path, tmp_path):
    out = str(tmp_path / "out")
    metrics = str(tmp_path / "metrics")
    # first run dies after 3 buckets
    with pytest.raises(RuntimeError, match="injected failure"):
        run_extract_resumable(
            spark, corpus_path, out, metrics, run_id="r1",
            n_buckets=8, fail_after_buckets=3,
        )
    assert len(done_buckets(spark, metrics, "r1")) == 3

    # rerun resumes: skips the 3 done buckets, completes the rest
    res = run_extract_resumable(
        spark, corpus_path, out, metrics, run_id="r1", n_buckets=8
    )
    assert res["buckets_skipped"] == 3
    assert res["buckets_processed"] > 0

    got = sorted(
        (r["doc_id"], r["order"], r["kind"], r["text"], r["media_ref"])
        for r in spark.read.parquet(out)
        .select("doc_id", "order", "kind", "text", "media_ref")
        .collect()
    )
    assert got == _expected()
    # no duplicate (doc_id, order) rows survived the partial run
    dup = (
        spark.read.parquet(out)
        .groupBy("doc_id", "order")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0


def test_resume_is_idempotent_when_complete(spark, corpus_path, tmp_path):
    out = str(tmp_path / "out")
    metrics = str(tmp_path / "metrics")
    run_extract_resumable(
        spark, corpus_path, out, metrics, run_id="r2", n_buckets=4
    )
    res = run_extract_resumable(
        spark, corpus_path, out, metrics, run_id="r2", n_buckets=4
    )
    assert res["buckets_processed"] == 0
    assert res["buckets_skipped"] == 4


def test_streaming_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    import os

    os.makedirs(in_dir)
    corpus.write_corpus_parquet(f"{in_dir}/batch1.parquet", 20, seed=11)
    stream_extract(spark, in_dir, out_dir, ckpt)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 > 0

    # new files arrive; restart with the same checkpoint → only new docs
    # are processed, nothing is duplicated
    corpus.write_corpus_parquet(f"{in_dir}/batch2.parquet", N_DOCS, seed=11)
    stream_extract(spark, in_dir, out_dir, ckpt)
    got = sorted(
        (r["doc_id"], r["order"], r["kind"], r["text"], r["media_ref"])
        for r in spark.read.parquet(out_dir).collect()
    )
    # batch2 (docs 0..39, seed 11) ∪ batch1 (docs 0..19, seed 11 — the same
    # first 20 docs, emitted once by each batch file)
    exp = _expected() + _expected(n=20)
    assert got == sorted(exp)


def test_stream_dedup_ingest_two_batches(spark, tmp_path):
    """Dedup-on-ingest: in-batch dups collapse keep-min, cross-batch dups
    lose to the standing corpus (via the signature store — batch 2 never
    re-signatures batch 1), and a drain with no new input changes nothing."""
    from pdftableextractor_spark.streaming.ingest import stream_dedup_ingest

    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    import os

    os.makedirs(in_dir)

    def drain():
        stream_dedup_ingest(spark, in_dir, out, store, ckpt)

    b1 = [
        ("o1", "alpha beta gamma delta epsilon zeta"),
        ("o2", "one two three four five six"),
        ("o3", "alpha beta gamma delta epsilon zeta"),  # in-batch dup of o1
    ]
    import pandas as pd

    pd.DataFrame(b1, columns=["doc_id", "text"]).to_parquet(f"{in_dir}/b1.parquet")
    drain()
    assert {
        r["doc_id"] for r in spark.read.parquet(out).collect()
    } == {"o1", "o2"}

    b2 = [
        ("p1", "alpha beta gamma delta epsilon zeta"),  # dup of standing o1
        ("p2", "completely fresh content nothing alike"),
        ("p3", "completely fresh content nothing alike"),  # in-batch dup
    ]
    pd.DataFrame(b2, columns=["doc_id", "text"]).to_parquet(f"{in_dir}/b2.parquet")
    drain()
    survivors = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert survivors == {"o1", "o2", "p2"}
    # the store carries exactly the survivors' signatures
    assert {
        r["doc_id"] for r in spark.read.parquet(store).collect()
    } == survivors

    # no new input: a further drain is a no-op
    drain()
    assert {
        r["doc_id"] for r in spark.read.parquet(out).collect()
    } == {"o1", "o2", "p2"}


def test_stream_semantic_ingest_two_batches(spark, tmp_path):
    """Semantic dedup-on-ingest: in-batch near-identical vectors collapse
    keep-min, cross-batch near-dups lose to the standing corpus, fresh
    vectors land, and a drain with no new input is a no-op."""
    import os

    import numpy as np

    from pdftableextractor_spark.streaming.ingest import (
        stream_semantic_ingest,
    )

    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    rng = np.random.RandomState(23)
    a, b, c = (rng.standard_normal(16) * 10 for _ in range(3))

    def vec(base, noise=0.01):
        return [float(x) for x in base + rng.standard_normal(16) * noise]

    def drain():
        stream_semantic_ingest(
            spark, in_dir, out, ckpt, threshold=0.9, k=2, n_cells=3,
            n_probe=None, iters=2,
        )

    import pyarrow as pa
    import pyarrow.parquet as pq

    def write_batch(rows, path):
        # the stream schema declares array<float>; pandas would write
        # list<double> and the scan would fail on the type mismatch
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                    "embedding": pa.array(
                        [r[1] for r in rows], pa.list_(pa.float32())
                    ),
                }
            ),
            path,
        )

    b1 = [(1, vec(a)), (2, vec(a)), (3, vec(b))]  # 1~2 in-batch dup
    write_batch(b1, f"{in_dir}/b1.parquet")
    drain()
    assert {
        r["vec_id"] for r in spark.read.parquet(out).collect()
    } == {1, 3}

    b2 = [
        (10, vec(a)),   # near standing 1 -> drops
        (11, vec(c)),   # fresh -> lands
        (12, vec(c)),   # in-batch dup of 11 -> drops
    ]
    write_batch(b2, f"{in_dir}/b2.parquet")
    drain()
    assert {
        r["vec_id"] for r in spark.read.parquet(out).collect()
    } == {1, 3, 11}

    drain()  # no new input: no-op
    assert {
        r["vec_id"] for r in spark.read.parquet(out).collect()
    } == {1, 3, 11}
