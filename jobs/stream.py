"""spark-submit entrypoint: streaming extraction over an arriving corpus.

    spark-submit --py-files engine.zip jobs/stream.py \
        --input /data/incoming_docs --output /data/spans \
        --checkpoint /data/ckpt [--dedup-output /data/uniq]

Runs the extraction stream with AvailableNow (catch-up) semantics: process
everything that has arrived, then exit — rerun on a schedule or keep a
continuous trigger on a cluster. Optionally chains the stateful cross-batch
exact dedup stream over the flat text table.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--dedup-output", default=None)
    p.add_argument("--dedup-checkpoint", default=None)
    p.add_argument("--master", default=None)
    args = p.parse_args()

    from pdftableextractor_spark.session import build_session
    from pdftableextractor_spark.sources.tables import read_path
    from pdftableextractor_spark.streaming.stream import stream_extract

    spark = build_session(app_name="stream-job", master=args.master)
    stream_extract(spark, args.input, args.output, args.checkpoint)
    n = read_path(spark, args.output).count()
    summary = {"spans_total": n}

    if args.dedup_output:
        from pdftableextractor_spark.streaming.stateful import (
            stream_exact_dedup,
        )

        # the input is documents(doc_id, spans) — hash the serialized spans
        # (a flat 'text' schema would read all-NULL and collapse every doc
        # into one hash group)
        stream_exact_dedup(
            spark,
            args.input,
            args.dedup_output,
            args.dedup_checkpoint or args.checkpoint + "_dedup",
            schema=(
                "doc_id string, spans array<struct<kind:string,text:string,"
                "media_ref:string,offset:int>>"
            ),
            content_col="spans",
        )
        summary["unique_docs"] = read_path(spark, args.dedup_output).count()

    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
