"""Round-7 experiment 3: landed state (sig-spread for n>=2) vs additionally
spreading the verify corpus scan in verify_jaccard_pairs."""

from __future__ import annotations

import argparse
import json
import os
import time

from bench import _materialize, host_calibration


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--runs", type=int, default=4)
    args = p.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F

    from pdftableextractor_spark.operators.dedup import (
        band_rows_from_sigs,
        minhash_near_dups,
        minhash_signatures,
        verify_jaccard_pairs,
    )
    from pdftableextractor_spark.plans.skew import spread_underparallel_scan
    from pdftableextractor_spark.session import build_session

    spark = build_session(app_name="exp-spread3", master=f"local[{cpus}]")
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn("doc_id", F.col("doc_id").cast("string"))
    )

    def minhash_verifyspread():
        sigs = minhash_signatures(docs, "text", 3, 64).localCheckpoint(
            eager=True
        )
        bands = band_rows_from_sigs(sigs, 64, 8)
        a = bands.select(F.col("doc_id").alias("doc_a"), "band_idx", "band_hash")
        b = bands.select(F.col("doc_id").alias("doc_b"), "band_idx", "band_hash")
        cand = (
            a.join(b, ["band_idx", "band_hash"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )
        return verify_jaccard_pairs(
            cand, spread_underparallel_scan(docs, "doc_id"), "text", 3, 0.5
        )

    variants = {
        "landed": lambda: minhash_near_dups(docs, n=3, threshold=0.5),
        "verifyspread": minhash_verifyspread,
    }

    print(json.dumps({"pre": host_calibration()}), flush=True)
    res: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(args.runs):
        for key, fn in variants.items():
            spark.sparkContext.setJobDescription(f"exp3:{key}")
            t0 = time.time()
            _materialize(fn())
            res[key].append(round(time.time() - t0, 3))
    print(json.dumps({
        "timings": res,
        "min": {k: min(v) for k, v in res.items()},
        "post": host_calibration(),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
