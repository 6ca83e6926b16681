"""Round-7 experiment 4: did the exploded_shingles n=1 rewrite
(array_remove+explode vs posexplode+filter) change q55? Interleaved A/B by
swapping the module attribute between runs."""

from __future__ import annotations

import json
import os
import sys
import time

from bench import _materialize, host_calibration


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    import pdftableextractor_spark.operators.dedup as dd
    from pdftableextractor_spark.session import build_session

    new_impl = dd.exploded_shingles

    def old_impl(docs, text_col, n):
        toks = docs.select(
            "doc_id",
            F.posexplode(dd.tokenize_col(F.col(text_col))).alias("pos", "w"),
        ).filter(F.col("w") != "")
        if n == 1:
            return toks.select("doc_id", F.col("w").alias("s"))
        w = Window.partitionBy("doc_id").orderBy("pos")
        leads = toks.select(
            "doc_id",
            F.concat_ws(
                " ", F.col("w"), *[F.lead("w", j).over(w) for j in range(1, n)]
            ).alias("s"),
            F.lead("w", n - 1).over(w).alias("last_tok"),
        )
        return leads.filter(F.col("last_tok").isNotNull()).select("doc_id", "s")

    spark = build_session(app_name="exp-spread4", master=f"local[{cpus}]")
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn("doc_id", F.col("doc_id").cast("string"))
    )
    is_new = F.col("doc_id").cast("bigint") % 5 == 0
    new_f, old_f = docs.filter(is_new), docs.filter(~is_new)

    def q55():
        return dd.minhash_near_dups_incremental(
            new_f, old_f, n=1, threshold=0.5, num_hashes=16
        )

    print(json.dumps({"pre": host_calibration()}), flush=True)
    res = {"old": [], "new": []}
    for _ in range(runs):
        for key, impl in (("old", old_impl), ("new", new_impl)):
            dd.exploded_shingles = impl
            spark.sparkContext.setJobDescription(f"exp4:{key}")
            t0 = time.time()
            _materialize(q55())
            res[key].append(round(time.time() - t0, 3))
    dd.exploded_shingles = new_impl
    print(json.dumps({
        "timings": res,
        "min": {k: min(v) for k, v in res.items()},
        "post": host_calibration(),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
