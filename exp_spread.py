"""Round-7 experiment (NOT part of any contract): does spreading the
single-row-group docs scan (finding 3) pay for the signature-heavy dedup
entry points?  Interleaved A/B, min-of-N, one session.

Usage: python exp_spread.py --runs 3 [--which minhash incremental simhash]
"""

from __future__ import annotations

import argparse
import json
import os
import time

from bench import _materialize, host_calibration


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--which", nargs="*", default=None)
    args = p.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F

    from pdftableextractor_spark.operators.dedup import (
        minhash_near_dups,
        minhash_near_dups_incremental,
        simhash_signatures,
    )
    from pdftableextractor_spark.plans.skew import spread_underparallel_scan
    from pdftableextractor_spark.session import build_session

    spark = build_session(app_name="exp-spread", master=f"local[{cpus}]")
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn("doc_id", F.col("doc_id").cast("string"))
    )
    docs_spread = spread_underparallel_scan(docs, "doc_id")
    is_new = F.col("doc_id").cast("bigint") % 5 == 0

    variants = {
        "minhash": {
            "base": lambda: minhash_near_dups(docs, n=3, threshold=0.5),
            "spread": lambda: minhash_near_dups(docs_spread, n=3, threshold=0.5),
        },
        "incremental": {
            "base": lambda: minhash_near_dups_incremental(
                docs.filter(is_new), docs.filter(~is_new),
                n=1, threshold=0.5, num_hashes=16,
            ),
            "spread": lambda: minhash_near_dups_incremental(
                docs_spread.filter(is_new), docs_spread.filter(~is_new),
                n=1, threshold=0.5, num_hashes=16,
            ),
        },
        "simhash": {
            "base": lambda: simhash_signatures(docs),
            "spread": lambda: simhash_signatures(docs_spread),
        },
    }
    which = args.which or list(variants)

    print(json.dumps({"pre": host_calibration()}))
    out: dict[str, dict[str, list[float]]] = {}
    for name in which:
        pair = variants[name]
        res: dict[str, list[float]] = {"base": [], "spread": []}
        for _ in range(args.runs):
            for key in ("base", "spread"):
                spark.sparkContext.setJobDescription(f"exp:{name}:{key}")
                t0 = time.time()
                _materialize(pair[key]())
                res[key].append(round(time.time() - t0, 3))
        out[name] = res
        print(name, json.dumps(res), flush=True)
    print(json.dumps({
        "min": {
            n: {k: min(v) for k, v in r.items()} for n, r in out.items()
        },
        "post": host_calibration(),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
