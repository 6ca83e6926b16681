"""Benchmark harness — prints ONE JSON line.

    python bench.py                 # sf dir from $SPARK_GRAFT_SF_DIR
                                    # (default /root/testdata/sf0.1),
                                    # cores from $SPARK_GRAFT_CPUS (default 32)
    python bench.py --scaling       # run the extraction job at local[8] AND
                                    # local[32] on the same input and report
                                    # throughput + scaling efficiency
                                    # (BASELINE.json north-rule evidence)

Headline queries:
  extract_synth     flagship: synthetic interleaved corpus (text/boiler/
                    table/kv/media/pdf spans, heavy-tailed) → extract_spans
  extract_testdata  interleaved driver documents table → extract_spans
  structure_points  extraction frames → data points → dedup → commentary
  unified_points    the full 5-source row contract incl. footnotes +
                    unmatched-text General Commentary
  pricing_summary   TPC-H-Q1-style aggregate over lineitem
  minhash_pairs     MinHash-LSH near-dup pairs over documents
  simhash           SimHash signatures over documents
  ann_topk          brute-force cosine top-k over embeddings
  token_stats       token counts + quality + lang-id over documents

Each query is materialized with a noop-format write (full execution, no
driver collect cost). The synthetic corpus is cached as parquet under
_artifacts/ keyed by (n_docs, seed) so generation cost is excluded.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def _synth_corpus_path(n_docs: int, seed: int) -> str:
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_artifacts")
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, f"bench_corpus_n{n_docs}_s{seed}.parquet")
    if not os.path.exists(path):
        from pdftableextractor_spark.corpus import write_corpus_parquet

        write_corpus_parquet(path, n_docs, seed=seed)
    return path


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(fn, runs: int = 1, spread: float = 1.5, max_extra: int = 2) -> float:
    """min over ``runs`` timed executions, plus up to ``max_extra``
    retries while the observed runs disagree by more than ``spread``x.
    This host's co-tenant bursts are bimodal on ~10 s timescales (the
    same stateless query measured 10.6 / 51.1 / 10.9 s back-to-back);
    a fixed min-of-2 loses whenever a burst covers both runs, and the
    retry triggers exactly on the disagreement a burst leaves behind."""
    times: list[float] = []
    for _ in range(runs):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    extra = 0
    while (
        extra < max_extra
        and len(times) >= 2
        and max(times) > spread * min(times)
    ):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
        extra += 1
    return round(min(times), 3)


def build_queries(spark, sf_dir: str, synth_path: str):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from pdftableextractor_spark.corpus import interleave_flat_documents
    from pdftableextractor_spark.operators.dedup import (
        minhash_near_dups,
        semantic_dedup,
        simhash_signatures,
    )
    from pdftableextractor_spark.operators.extract import (
        extract_frames,
        extract_spans,
    )
    from pdftableextractor_spark.operators.similarity import (
        cosine_topk,
        knn_join,
    )
    from pdftableextractor_spark.operators.structure import (
        all_data_points,
        dedup_first_wins,
        footnote_points,
        general_commentary_points,
        kv_points,
        lexical_commentary,
        table_points,
        text_fact_points,
        unmatched_paragraphs,
    )
    from pdftableextractor_spark.operators.textstats import (
        lang_id,
        quality_score,
        token_count,
    )

    from pdftableextractor_spark.operators.tokenize import (
        bpe_encode,
        train_bpe,
    )

    docs_flat = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs_str = docs_flat.withColumn("doc_id", F.col("doc_id").cast("string"))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    synth = spark.read.parquet(synth_path)
    bpe_merges = train_bpe(docs_str, n_merges=500)

    def structure_points():
        frames = extract_frames(interleave_flat_documents(docs_flat))
        pts = dedup_first_wins(
            all_data_points(
                table_points(frames["cells"]),
                kv_points(frames["kvs"]),
                text_fact_points(
                    frames["lines"].select(
                        "doc_id", F.col("line_no").alias("offset"), "text"
                    )
                ),
            )
        )
        w = Window.partitionBy("doc_id").orderBy("src_rank", "offset", "seq")
        pts = pts.withColumn("point_id", (F.row_number().over(w) - 1).cast("int"))
        com = lexical_commentary(
            pts.select("doc_id", "point_id", "field", "value"), frames["lines"]
        )
        _materialize(pts.join(com, ["doc_id", "point_id"], "left"))

    def unified_points():
        # the full 5-source row contract (jobs/structure.py): 4-source union
        # + dedup + commentary enrichment + unmatched-text General
        # Commentary rows, one final ordering window
        frames = extract_frames(interleave_flat_documents(docs_flat))
        pts = dedup_first_wins(
            all_data_points(
                table_points(frames["cells"]),
                kv_points(frames["kvs"]),
                text_fact_points(
                    frames["lines"].select(
                        "doc_id", F.col("line_no").alias("offset"), "text"
                    )
                ),
                footnote_points(frames["footnotes"]),
            )
        )
        w = Window.partitionBy("doc_id").orderBy(
            "src_rank", "offset", "seq", "field", "value"
        )
        pts = pts.withColumn("point_id", (F.row_number().over(w) - 1).cast("int"))
        com = lexical_commentary(
            pts.select("doc_id", "point_id", "field", "value"), frames["lines"]
        )
        enriched = pts.join(
            com.withColumnRenamed("line_no", "matched_line"),
            ["doc_id", "point_id"],
            "left",
        )
        general = general_commentary_points(
            unmatched_paragraphs(frames["lines"], com.select("doc_id", "line_no"))
        )
        _materialize(
            enriched.select("doc_id", "source", "type", "field", "value", "page")
            .unionByName(
                general.select(
                    "doc_id", "source", "type", "field", "value", "page"
                )
            )
        )

    qvec = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]

    # skew demonstration: the same corpus as ONE fat file (a single input
    # split) is unusable without salting — extract_skew_salted shows the
    # salted repartition recovering full parallelism (plans/skew.py)
    skew_path = synth_path + ".onefile"
    if not os.path.exists(skew_path):
        import pyarrow.parquet as pq

        tabs = pq.read_table(synth_path)
        pq.write_table(tabs, skew_path)  # default fat row groups, one file

    return {
        "extract_synth": lambda: _materialize(extract_spans(synth)),
        "extract_skew_salted": lambda: _materialize(
            extract_spans(spark.read.parquet(skew_path), salt=True)
        ),
        "extract_testdata": lambda: _materialize(
            extract_spans(interleave_flat_documents(docs_flat))
        ),
        "structure_points": structure_points,
        "unified_points": unified_points,
        "pricing_summary": lambda: _materialize(
            entry.queries()["q13_pricing_summary"](spark, sf_dir)
        ),
        # trigram shingles: the realistic near-dup config (unigram shingles on
        # a shared-vocabulary corpus collide in every band → quadratic
        # candidates, which is a corpus artifact, not an engine property)
        "minhash_pairs": lambda: _materialize(
            minhash_near_dups(docs_str, n=3, threshold=0.5)
        ),
        "simhash": lambda: _materialize(simhash_signatures(docs_str)),
        "ann_topk": lambda: _materialize(cosine_topk(emb, qvec, k=10)),
        "token_stats": lambda: _materialize(
            token_count(docs_str)
            .join(quality_score(docs_str), "doc_id")
            .join(lang_id(docs_str), "doc_id")
        ),
        # round-3 operators, benched via their oracled queries() shapes so
        # round-over-round regressions stay visible (VERDICT r3 task #6)
        "dup_clusters": lambda: _materialize(
            entry.queries()["q52_dup_clusters"](spark, sf_dir)
        ),
        "bm25": lambda: _materialize(
            entry.queries()["q53_bm25"](spark, sf_dir)
        ),
        "asof_join": lambda: _materialize(
            entry.queries()["q58_asof_join"](spark, sf_dir)
        ),
        "range_join": lambda: _materialize(
            entry.queries()["q59_range_join"](spark, sf_dir)
        ),
        "incremental_dups": lambda: _materialize(
            entry.queries()["q55_incremental_dups"](spark, sf_dir)
        ),
        # round-4 operators (same visibility rationale)
        "quality_gate": lambda: _materialize(
            entry.queries()["q61_quality_gate"](spark, sf_dir)
        ),
        "dup_spans": lambda: _materialize(
            entry.queries()["q62_dup_spans"](spark, sf_dir)
        ),
        "lm_score": lambda: _materialize(
            entry.queries()["q63_lm_score"](spark, sf_dir)
        ),
        "containment": lambda: _materialize(
            entry.queries()["q64_containment"](spark, sf_dir)
        ),
        "mask_spans": lambda: _materialize(
            entry.queries()["q65_mask_spans"](spark, sf_dir)
        ),
        # round-5: distributed k-NN join, benched on its APPROXIMATE
        # (n_probe=2) scale path — the q67 driver entry runs exact mode
        "knn_join": lambda: _materialize(
            knn_join(
                emb.select("vec_id", "embedding"),
                k=5, n_cells=16, n_probe=2, iters=3,
            )
        ),
        # round-6: SemDeDup on ITS scale path too (the q69 driver entry
        # runs exact mode for oracle parity; defaults are now n_probe=2)
        "semantic_dedup": lambda: _materialize(
            semantic_dedup(
                emb.select("vec_id", "embedding"),
                threshold=0.35, k=3, n_cells=16, iters=3,
            )
        ),
        # round-6: CDC binary containment over the documents corpus + its
        # truncated-transfer variants (the q71 driver shape)
        "cdc_dedup": lambda: _materialize(
            entry.queries()["q71_cdc_dedup"](spark, sf_dir)
        ),
        # round-6: BPE encode with a frozen vocabulary — the recurring
        # production cost (training is one-off and runs untimed above)
        "bpe_encode": lambda: _materialize(
            bpe_encode(docs_str, bpe_merges)
        ),
        # round-6: HTML main-content extraction (Kohlschütter rules,
        # JVM-only) — the q72 driver shape
        "html_extract": lambda: _materialize(
            entry.queries()["q72_html_extract"](spark, sf_dir)
        ),
        # round-6: DSIR importance weights (hashed-gram LLR model) — the
        # q73 driver shape (one model agg + broadcast score join)
        "dsir_weights": lambda: _materialize(
            entry.queries()["q73_dsir_weights"](spark, sf_dir)
        ),
        # round-6: SQ8 quantized ANN (stats pass + fused int-dot scan +
        # exact rerank) — the q75 driver shape
        "sq8_topk": lambda: _materialize(
            entry.queries()["q75_sq8_topk"](spark, sf_dir)
        ),
    }


def host_calibration(threads: int = 16, seconds: float = 0.4) -> dict:
    """Host-speed fingerprint embedded in the bench JSON so rounds can be
    compared across host drift (this sandbox is a shared VM — measured 1.8x
    same-code slowdown between rounds, BENCH/BASELINE.md round-3 A/B).
    md5 over 1 MiB buffers releases the GIL, so the threaded number is a
    genuine memory-bandwidth/SMT-contention probe, and calib_eff_16t is the
    host's parallel efficiency at bench time."""
    import hashlib
    import threading

    buf = b"x" * (1 << 20)

    def mb_per_s(n_threads: int) -> float:
        counts = [0] * n_threads
        stop = time.time() + seconds

        def work(i: int) -> None:
            while time.time() < stop:
                hashlib.md5(buf).digest()
                counts[i] += 1

        ts = [threading.Thread(target=work, args=(i,)) for i in range(n_threads)]
        t0 = time.time()
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        return sum(counts) / (time.time() - t0)

    one = mb_per_s(1)
    many = mb_per_s(threads)
    return {
        "calib_md5_mb_s_1t": round(one, 1),
        f"calib_md5_mb_s_{threads}t": round(many, 1),
        f"calib_eff_{threads}t": round(many / (one * threads), 3),
    }


def run_bench(sf_dir: str, cpus: str, n_synth: int) -> dict:
    from pdftableextractor_spark.session import build_session

    synth_path = _synth_corpus_path(n_synth, seed=42)
    spark = build_session(
        app_name="bench", master=f"local[{cpus}]"
    )
    cal_pre = host_calibration()
    queries = build_queries(spark, sf_dir, synth_path)
    # warm-up: JVM/codegen/python-worker spin-up so the timed numbers
    # measure the engine, not JIT. One tiny slice, then ONE full-size
    # extract pass: a 50-doc slice spins up only a handful of the 32
    # python workers and leaves the C2 compiler cold on the hot loops —
    # measured on this host, the first full-size run after a tiny
    # warm-up reads 8.9 s where steady state is 3.7 s, and min-of-2
    # still reports the half-warm 5.2 s
    from pdftableextractor_spark.operators.extract import extract_spans

    _materialize(extract_spans(spark.read.parquet(synth_path).limit(50)))
    _materialize(extract_spans(spark.read.parquet(synth_path)))
    # min of 2 runs per query: measures the engine, not first-run codegen;
    # run-to-run noise on a shared host is ±15%
    timings: dict[str, float] = {}
    for name, fn in queries.items():
        timings[name] = _timed(fn, runs=2)
    total = round(sum(timings.values()), 3)
    n_docs = spark.read.parquet(synth_path).count()
    result = {
        "metric": "headline query wall time (extraction + structuring + curation)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir.rstrip("/").split("/")[-1],
        "synth_docs": n_docs,
        "extract_docs_per_sec": round(n_docs / timings["extract_synth"], 2),
        "cpus": cpus,
        # probe at BOTH ends: co-tenant bursts move on ~minute timescales,
        # so a single end-point sample can miss a burst that ate the run
        **{f"pre_{k}": v for k, v in cal_pre.items()},
        **host_calibration(),
    }
    spark.stop()
    return result


def run_scaling(sf_dir: str, n_synth: int, n_lo: int = 4, n_hi: int = 16) -> dict:
    """North-rule evidence: same extraction job, same input, local[N] vs
    local[4N]; efficiency = (t_N / t_4N) / (4N/N). Default pair 4-vs-16:
    this host's memory bandwidth saturates beyond ~16 threads (a pure
    codegen md5 scan scales only 2.4x from 8 to 32 cores), so 4/16 measures
    the ENGINE's scaling rather than the DRAM controller's. Best-of-3 per
    level to suppress single-machine noise."""
    from pdftableextractor_spark.operators.extract import extract_spans
    from pdftableextractor_spark.session import build_session

    synth_path = _synth_corpus_path(n_synth, seed=42)
    out = {}
    for cores in (n_lo, n_hi):
        spark = build_session(
            app_name=f"scaling-{cores}", master=f"local[{cores}]"
        )
        n_docs = spark.read.parquet(synth_path).count()
        # warm-up pass (JIT/codegen/python workers), then best-of-3
        _materialize(extract_spans(spark.read.parquet(synth_path)))
        t = min(
            _timed(
                lambda: _materialize(
                    extract_spans(spark.read.parquet(synth_path))
                )
            )
            for _ in range(3)
        )
        out[f"local[{cores}]"] = {
            "sec": t,
            "docs_per_sec": round(n_docs / t, 2),
        }
        spark.stop()
    t_lo = out[f"local[{n_lo}]"]["sec"]
    t_hi = out[f"local[{n_hi}]"]["sec"]
    out["scaling_efficiency"] = round((t_lo / t_hi) / (n_hi / n_lo), 3)
    return {
        "metric": f"extraction scaling efficiency local[{n_lo}] vs local[{n_hi}]",
        "value": out["scaling_efficiency"],
        "unit": "efficiency",
        "queries": {k: v["sec"] for k, v in out.items() if isinstance(v, dict)},
        "detail": out,
        "synth_docs": n_synth,
    }


def run_structure_scaling(
    n_synth: int = 10_000, n_lo: int = 4, n_hi: int = 16
) -> dict:
    """Structure-job scaling evidence (the round-2 verdict's open item):
    the FULL unified pipeline (extraction frames → 4-source union → dedup →
    lexical commentary → General Commentary rows) at local[N] vs local[4N],
    warm (one warm-up pass per level), noop sink so disk contention never
    pollutes the ratio. Also reports a constant-bytes-per-core run (n/4 docs
    at local[4] vs n docs at local[16]) — if wall time is ~equal there, the
    sub-linear strong scaling is the host's DRAM ceiling, not a serial
    section in the job (weak-scaling efficiency ≈ 1 means no such section).
    """
    from pdftableextractor_spark.operators.extract import extract_frames
    from pdftableextractor_spark.operators.structure import (
        unified_data_points,
    )
    from pdftableextractor_spark.session import build_session

    def _run(spark, path):
        docs = spark.read.parquet(path)
        (
            unified_data_points(extract_frames(docs))
            .write.mode("overwrite")
            .format("noop")
            .save()
        )

    paths = {
        n_synth: _synth_corpus_path(n_synth, seed=42),
        n_synth // 4: _synth_corpus_path(n_synth // 4, seed=42),
    }
    out: dict = {}
    for cores, n in ((n_lo, n_synth), (n_hi, n_synth), (n_lo, n_synth // 4)):
        spark = build_session(
            app_name=f"struct-scaling-{cores}-{n}",
            master=f"local[{cores}]",
        )
        _run(spark, paths[n])  # warm-up: JIT/codegen/python workers
        t = min(_timed(lambda: _run(spark, paths[n])) for _ in range(2))
        out[f"local[{cores}]_docs{n}"] = {"sec": t}
        spark.stop()
    t_lo = out[f"local[{n_lo}]_docs{n_synth}"]["sec"]
    t_hi = out[f"local[{n_hi}]_docs{n_synth}"]["sec"]
    t_weak = out[f"local[{n_lo}]_docs{n_synth // 4}"]["sec"]
    strong = round((t_lo / t_hi) / (n_hi / n_lo), 3)
    # weak scaling: n/4 docs on N cores vs n docs on 4N cores — equal
    # bytes/core; 1.0 = the job itself has no serial section
    weak = round(t_weak / t_hi, 3)
    return {
        "metric": (
            f"structure-job scaling efficiency local[{n_lo}] vs"
            f" local[{n_hi}]"
        ),
        "value": strong,
        "unit": "efficiency",
        "queries": {
            "strong_scaling_efficiency": strong,
            "weak_scaling_efficiency": weak,
            **{k: v["sec"] for k, v in out.items()},
        },
        "synth_docs": n_synth,
        "detail": out,
    }


def run_knn_scaling(
    n: int = 200_000, dim: int = 64, n_lo: int = 4, n_hi: int = 16
) -> dict:
    """N-vs-4N scaling for the round-5 flagship: the distributed k-NN
    join (approximate path, n_probe=2) over a 100k x 64-d synthetic
    corpus — the workload is dominated by the cogrouped Arrow matmul
    kernel + two cell-keyed shuffles, i.e. the shape the 100 TB
    semantic-dedup pass runs. Same input both levels, best-of-3,
    efficiency = (t_N / t_4N) / (4N/N).

    Measurement notes (see BENCH/BASELINE.md round 5): run with
    OPENBLAS_NUM_THREADS=1 — numpy's OpenBLAS here allows 2 threads per
    python worker, which hands the low-core leg 2x its fair CPU and
    deflates the ratio. The k-means fit is a size-independent serial
    term (~3.5 s of driver-synchronized collect barriers at any core
    count); at this benchmark's 200k-vector scale it plus scheduling is
    ~9 s of the wall, so the measured efficiency UNDERSTATES the
    asymptotic one — the parallel (matmul/shuffle) term is what grows
    with corpus size."""
    from pdftableextractor_spark.operators.similarity import knn_join
    from pdftableextractor_spark.session import build_session

    path = _synth_embeddings_path(n, dim, n_blocks=64)
    out = {}
    for cores in (n_lo, n_hi):
        spark = build_session(
            app_name=f"knn-scaling-{cores}", master=f"local[{cores}]"
        )
        emb = spark.read.parquet(path).select("vec_id", "embedding")

        def job():
            _materialize(
                knn_join(emb, k=5, n_cells=64, n_probe=2, iters=2)
            )

        job()  # warm-up (JIT/codegen/python workers + parquet cache)
        t = min(_timed(job) for _ in range(3))
        out[f"local[{cores}]"] = {
            "sec": t,
            "vecs_per_sec": round(n / t, 1),
        }
        spark.stop()
    t_lo = out[f"local[{n_lo}]"]["sec"]
    t_hi = out[f"local[{n_hi}]"]["sec"]
    out["scaling_efficiency"] = round((t_lo / t_hi) / (n_hi / n_lo), 3)
    return {
        "metric": f"knn_join scaling efficiency local[{n_lo}] vs local[{n_hi}]",
        "value": out["scaling_efficiency"],
        "unit": "efficiency",
        "queries": {
            f"local[{n_lo}]": t_lo,
            f"local[{n_hi}]": t_hi,
        },
        "n_vectors": n,
        "dim": dim,
        "detail": out,
    }


def _synth_embeddings_path(n: int, dim: int, n_blocks: int, seed: int = 11) -> str:
    """Deterministic unit-norm embedding table (vec_id, label, embedding)."""
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_artifacts")
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, f"bench_emb_n{n}_d{dim}_b{n_blocks}_s{seed}.parquet")
    if not os.path.exists(path):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        rng = np.random.RandomState(seed)
        m = rng.standard_normal((n, dim)).astype(np.float32)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(range(n), pa.int64()),
                    "label": pa.array(
                        [f"c{i % n_blocks}" for i in range(n)], pa.string()
                    ),
                    "embedding": pa.array(
                        list(m), pa.list_(pa.float32(), dim)
                    ),
                }
            ),
            path,
        )
    return path


def run_centroids(n: int = 100_000, dim_lo: int = 64, dim_hi: int = 1024) -> dict:
    """Dimension-scaling evidence for the Arrow partial-sum centroid kernel
    (round-2 verdict fix #1): one Lloyd update (centroid_mean) at 64-d and
    1024-d, kernel path vs the old per-dim posexplode path. The explode path
    generates rows×dim rows per pass — its cost grows ~linearly in dim even
    though the shuffle stays tiny; the kernel's per-vector cost should stay
    near-flat (the ×16 dim growth costs only BLAS time)."""
    from pdftableextractor_spark.operators.similarity import (
        _centroid_mean_explode,
        centroid_mean,
    )
    from pdftableextractor_spark.session import build_session

    spark = build_session(app_name="bench-centroids", master="local[32]")
    out: dict = {}
    for tag, dim in (("lo", dim_lo), ("hi", dim_hi)):
        path = _synth_embeddings_path(n, dim, n_blocks=64)
        emb = spark.read.parquet(path)
        _materialize(centroid_mean(emb, cell_col="label"))  # warm-up
        t_kernel = _timed(
            lambda: _materialize(centroid_mean(emb, cell_col="label")), runs=2
        )
        t_explode = _timed(
            lambda: _materialize(_centroid_mean_explode(emb, cell_col="label")),
            runs=2,
        )
        out[tag] = {
            "dim": dim,
            "kernel_sec": t_kernel,
            "explode_sec": t_explode,
            "kernel_us_per_vec": round(t_kernel / n * 1e6, 3),
            "explode_us_per_vec": round(t_explode / n * 1e6, 3),
        }
    spark.stop()
    # cost growth when dim grows 16x (1.0 = perfectly flat per-vector cost)
    kernel_growth = round(out["hi"]["kernel_sec"] / out["lo"]["kernel_sec"], 3)
    explode_growth = round(
        out["hi"]["explode_sec"] / out["lo"]["explode_sec"], 3
    )
    return {
        "metric": "Lloyd-update cost growth at 16x dim (1.0 = flat)",
        "value": kernel_growth,
        "unit": "ratio",
        "queries": {
            "kernel_growth_16x_dim": kernel_growth,
            "explode_growth_16x_dim": explode_growth,
            "kernel_sec_d1024": out["hi"]["kernel_sec"],
            "explode_sec_d1024": out["hi"]["explode_sec"],
        },
        "n_vectors": n,
        "detail": out,
    }


def run_vectors(dim: int = 256, n_lo: int = 20_000, n_hi: int = 200_000) -> dict:
    """Kernel-scaling evidence for the Arrow-batched cosine kernels
    (round-1 verdict fix): ann_topk and embedding_near_dups at 1x and 10x
    the vector count must show ~flat per-vector cost (block size is held at
    ~200 vectors so near-dup candidate pairs scale linearly with n)."""
    from pyspark.sql import functions as F

    from pdftableextractor_spark.operators.dedup import embedding_near_dups
    from pdftableextractor_spark.operators.similarity import cosine_topk
    from pdftableextractor_spark.session import build_session

    spark = build_session(app_name="bench-vectors", master="local[32]")
    out: dict = {}
    for tag, n in (("lo", n_lo), ("hi", n_hi)):
        path = _synth_embeddings_path(n, dim, n_blocks=max(1, n // 200))
        emb = spark.read.parquet(path)
        qvec = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
        # warm-up (python workers + codegen), then best-of-2
        _materialize(cosine_topk(emb, qvec, k=10))
        t_ann = _timed(lambda: _materialize(cosine_topk(emb, qvec, k=10)), runs=2)
        t_dup = _timed(
            lambda: _materialize(
                embedding_near_dups(emb, block_col="label", threshold=0.9)
            ),
            runs=2,
        )
        out[tag] = {
            "n_vectors": n,
            "ann_topk_sec": t_ann,
            "near_dups_sec": t_dup,
            "ann_us_per_vec": round(t_ann / n * 1e6, 3),
            "dup_us_per_vec": round(t_dup / n * 1e6, 3),
        }
    flat_ann = round(out["hi"]["ann_us_per_vec"] / out["lo"]["ann_us_per_vec"], 3)
    flat_dup = round(out["hi"]["dup_us_per_vec"] / out["lo"]["dup_us_per_vec"], 3)
    spark.stop()
    return {
        "metric": "per-vector cost ratio at 10x vectors (1.0 = perfectly flat)",
        "value": flat_ann,
        "unit": "ratio",
        "queries": {
            "ann_flatness": flat_ann,
            "near_dup_flatness": flat_dup,
            **{f"{k}_{m}": v[m] for k, v in out.items() if isinstance(v, dict)
               for m in ("ann_topk_sec", "near_dups_sec")},
        },
        "dim": dim,
        "detail": out,
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--scaling", action="store_true")
    p.add_argument("--vectors", action="store_true")
    p.add_argument("--centroids", action="store_true")
    p.add_argument("--structure-scaling", action="store_true")
    p.add_argument("--knn-scaling", action="store_true")
    p.add_argument("--synth-docs", type=int, default=None)
    args = p.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf_name = sf_dir.rstrip("/").split("/")[-1]
    default_synth = {"sf0.001": 100, "sf0.01": 400, "sf0.1": 5000}.get(
        sf_name, 5000
    )
    n_synth = args.synth_docs or default_synth

    if args.scaling:
        # scaling needs enough work per stage that fixed costs (JVM stage
        # startup, scheduling) don't dominate the high-core run: at 25k docs
        # the local[16] wall is ~13 s of which ~3 s is fixed → efficiency
        # reads 0.64-0.67 on a noisy host; at 50k docs it reads 0.82 (the
        # representative regime for long-running 100 TB partitions)
        print(json.dumps(run_scaling(sf_dir, max(n_synth, 50_000))))
    elif args.vectors:
        print(json.dumps(run_vectors()))
    elif args.centroids:
        print(json.dumps(run_centroids()))
    elif args.structure_scaling:
        print(json.dumps(run_structure_scaling()))
    elif args.knn_scaling:
        print(json.dumps(run_knn_scaling()))
    else:
        print(json.dumps(run_bench(sf_dir, cpus, n_synth)))


if __name__ == "__main__":
    main()
