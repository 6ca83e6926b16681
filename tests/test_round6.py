"""Round-6 additions: IVF refit trigger (cell-balance drift check +
in-place rebuild), per VERDICT.md round-5 'Next round' #8."""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clustered_embeddings(spark, n_per_cluster=60, centers=((10.0, 0.0, 0.0), (0.0, 10.0, 0.0), (0.0, 0.0, 10.0), (0.0, 0.0, -10.0))):
    """Deterministic well-separated clusters (seeded offsets via md5-free
    arithmetic — no RNG)."""
    rows = []
    vid = 0
    for ci, c in enumerate(centers):
        for j in range(n_per_cluster):
            # small deterministic jitter, different per row
            d = [
                c[a] + 0.01 * ((vid * 7 + a * 3) % 11 - 5)
                for a in range(3)
            ]
            rows.append((vid, d))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id int, embedding array<double>"
    )


def test_ivf_drift_check_flags_and_rebuild_restores(spark, tmp_path):
    """The append-only cadence's refit trigger: build a balanced index,
    append drifted batches that pile into one cell until the check
    flags, rebuild over the current corpus, balance restored and the
    stamps stay torn-rebuild-safe (queries keep working)."""
    from pdftableextractor_spark.operators.similarity import (
        append_to_ivf_index,
        build_ivf_index,
        ivf_cell_stats,
        ivf_drift_report,
        ivf_topk_indexed_batch,
    )

    base = _clustered_embeddings(spark)
    idx = str(tmp_path / "ivf")
    build_ivf_index(base, idx, k=4, iters=3)

    r0 = ivf_drift_report(spark, idx, max_over_median=4.0)
    assert r0["k"] == 4
    assert r0["total_vectors"] == 240
    assert not r0["needs_rebuild"], r0
    assert r0["max_over_median"] < 4.0

    # drift: a new mass near ONE existing center — every appended vector
    # lands in that center's cell, cell balance degrades monotonically
    drift_rows = [
        (1000 + i, [10.0 + 0.001 * i, 0.05, -0.05]) for i in range(900)
    ]
    drifted = spark.createDataFrame(
        drift_rows, "vec_id int, embedding array<double>"
    )
    n = append_to_ivf_index(spark, drifted, idx)
    assert n == 900

    r1 = ivf_drift_report(spark, idx, max_over_median=4.0)
    assert r1["needs_rebuild"], r1
    assert r1["max_cell"] >= 900
    assert r1["build_id"] == r0["build_id"]  # append keeps the stamp

    # rebuild over the CURRENT corpus (base + drifted) restores balance.
    # k grows with the corpus (the realistic refit: the old k=4 fit
    # cannot balance a 900-vs-60 mass no matter where centroids land —
    # rebalancing drift means re-PICKING k, not just re-fitting it)
    current = base.unionByName(drifted)
    build_ivf_index(current, idx, k=8, iters=3)
    r2 = ivf_drift_report(spark, idx, max_over_median=4.0)
    assert r2["max_over_median"] < r1["max_over_median"], (r1, r2)
    assert not r2["needs_rebuild"], r2
    assert r2["total_vectors"] == 240 + 900
    assert r2["build_id"] != r1["build_id"]  # refit = new content stamp

    # stamps stay sound across the refit: the consistency-checked query
    # path works and finds an appended-then-refit vector exactly
    out = ivf_topk_indexed_batch(
        spark,
        drifted.filter(F.col("vec_id") == 1000).select(
            F.col("vec_id").alias("qid"), "embedding"
        ),
        idx,
        k=1,
        nprobe=4,
    ).collect()
    assert out and out[0]["vec_id"] == 1000 and out[0]["cos"] == 1.0

    # cell stats contract: one row per centroid, zero-count cells kept
    stats = ivf_cell_stats(spark, idx).collect()
    assert len(stats) == 8
    assert sum(r["n_vectors"] for r in stats) == 240 + 900


def test_ivf_drift_report_degenerate_median(spark, tmp_path):
    """All mass in a minority of cells → median 0 while vectors exist:
    the ratio degrades to inf and the check flags, rather than dividing
    by zero or silently passing."""
    from pdftableextractor_spark.operators.similarity import (
        build_ivf_index,
        ivf_drift_report,
    )

    # one tight blob, k=4: k-means over near-identical points leaves
    # most cells empty
    rows = [(i, [5.0 + 1e-9 * i, 5.0, 5.0]) for i in range(100)]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    idx = str(tmp_path / "ivf_degen")
    build_ivf_index(emb, idx, k=4, iters=2)
    r = ivf_drift_report(spark, idx, max_over_median=4.0)
    if r["median_cell"] == 0:
        assert math.isinf(r["max_over_median"])
        assert r["needs_rebuild"]
    else:
        # fit managed to split the blob — still a valid report
        assert r["total_vectors"] == 100


def test_ann_job_check_mode_end_to_end(spark, tmp_path):
    """jobs/ann.py check: flags drift, and with --rebuild refits in
    place from --input; prints one valid JSON line with pre/post
    reports."""
    from pdftableextractor_spark.operators.similarity import (
        append_to_ivf_index,
        build_ivf_index,
    )
    from pdftableextractor_spark.sources.tables import write_table

    base = _clustered_embeddings(spark)
    idx = str(tmp_path / "ivf_job")
    build_ivf_index(base, idx, k=4, iters=3)
    drifted = spark.createDataFrame(
        [(2000 + i, [10.0, 0.001 * i, 0.0]) for i in range(700)],
        "vec_id int, embedding array<double>",
    )
    append_to_ivf_index(spark, drifted, idx)

    # the rebuild corpus, in the layout the job expects
    corpus_dir = str(tmp_path / "corpus")
    write_table(
        base.unionByName(drifted), f"{corpus_dir}/embeddings.parquet"
    )

    env = {**os.environ, "PYTHONPATH": REPO}
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "ann.py"),
            "check",
            "--index", idx,
            "--max-over-median", "4",
            "--rebuild",
            "--input", corpus_dir,
            "--k", "8",
            "--iters", "3",
            "--master", "local[4]",
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [
        ln for ln in out.stdout.splitlines() if ln.startswith("{")
    ][-1]
    rep = json.loads(line)
    assert rep["cmd"] == "check"
    assert rep["rebuilt"] is True
    assert rep["pre_rebuild"]["needs_rebuild"] is True
    assert rep["needs_rebuild"] is False
    assert rep["total_vectors"] == 240 + 700
