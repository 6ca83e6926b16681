"""spark-submit entrypoint: BPE tokenizer training + corpus encoding.

    spark-submit --py-files engine.zip jobs/bpe.py \
        --input /root/testdata/sf0.01 --output /tmp/tok --n-merges 2000

Two stages over documents(doc_id, text):
  1. train    one distributed word-frequency aggregation, bounded driver
              collect of the top word types, driver-side merge loop ->
              <output>/merges.json (rank-ordered merge table — the
              persisted vocabulary a production pipeline ships to every
              downstream consumer)
  2. encode   Arrow-batched kernel with the merge table in the closure
              and a per-batch word cache -> <output>/tokens parquet
              (doc_id, tokens, n_tokens)

`--merges` skips training and encodes with an existing merges.json —
the production cadence: train once on a sample window, encode every
incoming shard with the frozen vocabulary. Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True,
                   help="dir with documents.parquet")
    p.add_argument("--output", required=True)
    p.add_argument("--n-merges", type=int, default=1000)
    p.add_argument("--max-word-types", type=int, default=50_000)
    p.add_argument(
        "--merges", default=None,
        help="existing merges.json (skip training; frozen-vocab cadence)",
    )
    p.add_argument("--master", default=None)
    args = p.parse_args()
    if args.n_merges < 1:
        p.error("--n-merges must be >= 1")
    if args.max_word_types < 1:
        p.error("--max-word-types must be >= 1")

    from pyspark.sql import functions as F

    from pdftableextractor_spark.operators.tokenize import (
        bpe_encode,
        train_bpe,
    )
    from pdftableextractor_spark.session import build_session

    spark = build_session(app_name="tokenize-job", master=args.master)
    t0 = time.time()
    docs = spark.read.parquet(
        os.path.join(args.input, "documents.parquet")
    ).select(F.col("doc_id").cast("string").alias("doc_id"), "text")

    if args.merges:
        with open(args.merges) as fh:
            merges = [tuple(m) for m in json.load(fh)]
        trained = False
    else:
        merges = train_bpe(
            docs, n_merges=args.n_merges,
            max_word_types=args.max_word_types,
        )
        trained = True

    os.makedirs(args.output, exist_ok=True)
    merges_path = os.path.join(args.output, "merges.json")
    with open(merges_path, "w") as fh:
        json.dump([list(m) for m in merges], fh)

    enc = bpe_encode(docs, merges)
    enc.write.mode("overwrite").parquet(os.path.join(args.output, "tokens"))

    out = spark.read.parquet(os.path.join(args.output, "tokens"))
    stats = out.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens").alias("total_tokens"),
    ).collect()[0]
    sec = round(time.time() - t0, 3)
    print(
        json.dumps(
            {
                "trained": trained,
                "n_merges": len(merges),
                "merges_path": merges_path,
                "docs": int(stats["docs"]),
                "total_tokens": int(stats["total_tokens"] or 0),
                "sec": sec,
                "docs_per_sec": round(int(stats["docs"]) / max(sec, 1e-9), 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
