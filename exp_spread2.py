"""Round-7 experiment 2: spread ONLY the signature aggregation's input
(inside-minhash_signatures placement), leaving the verify corpus scan and
the band/union lineages unspread.  Interleaved A/B, min-of-N.
"""

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
        minhash_near_dups,
        minhash_near_dups_incremental,
        minhash_signatures,
        verify_jaccard_pairs,
        band_rows_from_sigs,
    )
    from pdftableextractor_spark.plans.skew import spread_underparallel_scan
    from pdftableextractor_spark.session import build_session

    spark = build_session(app_name="exp-spread2", master=f"local[{cpus}]")
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn("doc_id", F.col("doc_id").cast("string"))
    )
    is_new = F.col("doc_id").cast("bigint") % 5 == 0
    new_f, old_f = docs.filter(is_new), docs.filter(~is_new)

    def incr_sigspread():
        # emulates spread placed INSIDE minhash_signatures: both sig scans
        # spread, everything else (anti-joins, bands, verify) unchanged
        old_sigs = minhash_signatures(
            spread_underparallel_scan(old_f, "doc_id"), "text", 1, 16
        )
        new_sigs = minhash_signatures(
            spread_underparallel_scan(new_f, "doc_id"), "text", 1, 16
        ).localCheckpoint(eager=True)
        return minhash_near_dups_incremental(
            new_f, old_f, old_sigs=old_sigs, new_sigs=new_sigs,
            n=1, threshold=0.5, num_hashes=16,
        )

    def minhash_sigspread():
        sigs = minhash_signatures(
            spread_underparallel_scan(docs, "doc_id"), "text", 3, 64
        ).localCheckpoint(eager=True)
        bands = band_rows_from_sigs(sigs, 64, 8)
        a = bands.select(F.col("doc_id").alias("doc_a"), "band_idx", "band_hash")
        b = bands.select(F.col("doc_id").alias("doc_b"), "band_idx", "band_hash")
        cand = (
            a.join(b, ["band_idx", "band_hash"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )
        return verify_jaccard_pairs(cand, docs, "text", 3, 0.5)

    variants = {
        "incremental": {
            "base": lambda: minhash_near_dups_incremental(
                new_f, old_f, n=1, threshold=0.5, num_hashes=16,
            ),
            "sigspread": incr_sigspread,
        },
        "minhash": {
            "base": lambda: minhash_near_dups(docs, n=3, threshold=0.5),
            "sigspread": minhash_sigspread,
        },
    }

    print(json.dumps({"pre": host_calibration()}), flush=True)
    out: dict[str, dict[str, list[float]]] = {}
    for name, pair in variants.items():
        res: dict[str, list[float]] = {k: [] for k in pair}
        for _ in range(args.runs):
            for key, fn in pair.items():
                spark.sparkContext.setJobDescription(f"exp2:{name}:{key}")
                t0 = time.time()
                _materialize(fn())
                res[key].append(round(time.time() - t0, 3))
        out[name] = res
        print(name, json.dumps(res), flush=True)
    print(json.dumps({
        "min": {n: {k: min(v) for k, v in r.items()} for n, r in out.items()},
        "post": host_calibration(),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
