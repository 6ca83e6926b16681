"""spark-submit entrypoint for the structuring stage: documents → data-point
rows with lexical commentary + leftover paragraphs.

    spark-submit --py-files engine.zip jobs/structure.py \
        --gen-docs 300 --output /tmp/structured
        [--input documents.parquet] [--master local[8]]

Mirrors the reference's /process + /process_stream dataflow (app.py:402,
app.py:240) with every LLM call replaced by its deterministic analog
(SURVEY.md §2.9): extraction frames → table/kv/text-fact data points →
first-wins dedup → lexical commentary join → unmatched-paragraph rows.
Writes two parquet outputs: <output>/points and <output>/paragraphs.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", default=None)
    p.add_argument("--output", required=True)
    p.add_argument("--gen-docs", type=int, default=None)
    p.add_argument("--master", default=None)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pdftableextractor_spark.corpus import write_corpus_parquet
    from pdftableextractor_spark.operators.extract import extract_frames
    from pdftableextractor_spark.operators.structure import (
        all_data_points,
        dedup_first_wins,
        kv_points,
        lexical_commentary,
        table_points,
        text_fact_points,
        unmatched_paragraphs,
    )
    from pdftableextractor_spark.session import build_session

    spark = build_session(app_name="structure-job", master=args.master)
    inp = args.input
    if args.gen_docs:
        inp = args.output.rstrip("/") + ".__input__.parquet"
        write_corpus_parquet(inp, args.gen_docs, seed=args.seed)

    t0 = time.time()
    frames = extract_frames(spark.read.parquet(inp))
    points = dedup_first_wins(
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
    points = points.withColumn(
        "point_id", (F.row_number().over(w) - 1).cast("int")
    )
    commentary = lexical_commentary(
        points.select("doc_id", "point_id", "field", "value"), frames["lines"]
    )
    enriched = points.join(
        commentary.withColumnRenamed("line_no", "matched_line"),
        ["doc_id", "point_id"],
        "left",
    )
    paras = unmatched_paragraphs(
        frames["lines"], commentary.select("doc_id", "line_no")
    )
    enriched.write.mode("overwrite").parquet(args.output + "/points")
    paras.write.mode("overwrite").parquet(args.output + "/paragraphs")
    wall = time.time() - t0

    pts = spark.read.parquet(args.output + "/points")
    print(
        json.dumps(
            {
                "points": pts.count(),
                "with_commentary": pts.filter(F.col("score").isNotNull()).count(),
                "paragraphs": spark.read.parquet(
                    args.output + "/paragraphs"
                ).count(),
                "sec": round(wall, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
