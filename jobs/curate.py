"""spark-submit entrypoint: training-data curation over a documents corpus.

    spark-submit --py-files engine.zip jobs/curate.py \
        --input /root/testdata/sf0.1 --output /tmp/curated

One pass over documents(doc_id, text, ...):
  1. exact dedup          keep the lowest doc_id per md5(text)
  2. near-dup removal     MinHash-LSH (trigram) pairs; drop the higher
                          doc_id of every confirmed pair
  3. quality gate         composite quality score >= --min-quality
  4. repetition gate      Gopher-style: dup-sentence fraction and
                          top-bigram fraction below --max-rep
  5. language gate        marker-based lang-id in --langs (best-effort;
                          'und' passes — absence of evidence isn't exclusion)
  6. PII scrub            emails/URLs/phones replaced with typed tags
  7. annotate             token counts + fingerprint on survivors

Writes <output>/clean (curated corpus with stats columns) and prints a
one-line JSON funnel summary. The funnel is the canonical shape of an LLM
training-data pipeline; every stage is a JVM-side operator from
operators/dedup.py / textstats.py.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="dir with documents.parquet")
    p.add_argument("--output", required=True)
    p.add_argument("--min-quality", type=float, default=0.3)
    p.add_argument("--near-dup-threshold", type=float, default=0.5)
    p.add_argument("--langs", default="en,und")
    p.add_argument("--max-rep", type=float, default=0.5)
    p.add_argument("--master", default=None)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from pdftableextractor_spark.operators.dedup import (
        exact_dedup,
        minhash_near_dups,
    )
    from pdftableextractor_spark.operators.textstats import (
        fingerprint,
        lang_id,
        quality_score,
        redact_pii,
        repetition_stats,
        token_count,
    )
    from pdftableextractor_spark.session import build_session
    from pdftableextractor_spark.sources.tables import read_path, write_table

    spark = build_session(app_name="curate-job", master=args.master)
    t0 = time.time()
    docs = read_path(spark, f"{args.input}/documents.parquet").withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )
    n0 = docs.count()

    reps = exact_dedup(docs).select("doc_id")
    # persist each funnel stage: the stage counts below would otherwise
    # recompute the full upstream lineage (minhash included) per count
    docs1 = docs.join(reps, "doc_id", "left_semi").persist()
    n1 = docs1.count()

    pairs = minhash_near_dups(
        docs1, n=3, threshold=args.near_dup_threshold
    )
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    docs2 = docs1.join(losers, "doc_id", "left_anti").persist()
    n2 = docs2.count()

    q = quality_score(docs2).select("doc_id", "quality")
    docs3 = docs2.join(q, "doc_id").filter(
        F.col("quality") >= args.min_quality
    ).persist()
    n3 = docs3.count()

    rep = repetition_stats(docs3.select("doc_id", "text")).select(
        "doc_id", "dup_sent_frac", "top_bigram_frac"
    )
    docs3r = docs3.join(rep, "doc_id").filter(
        (F.col("dup_sent_frac") <= args.max_rep)
        & (F.col("top_bigram_frac") <= args.max_rep)
    ).persist()
    n3r = docs3r.count()

    langs = [x.strip() for x in args.langs.split(",") if x.strip()]
    lid = lang_id(docs3r.select("doc_id", "text")).select("doc_id", "lang_pred")
    docs4 = docs3r.join(lid, "doc_id").filter(
        F.col("lang_pred").isin(langs)
    ).persist()
    n4 = docs4.count()

    scrubbed = docs4.join(
        redact_pii(docs4.select("doc_id", "text")), "doc_id"
    ).drop("text").withColumnRenamed("clean_text", "text")

    annotated = (
        scrubbed.join(token_count(scrubbed.select("doc_id", "text")), "doc_id")
        .join(
            fingerprint(scrubbed.select("doc_id", "text")).select(
                "doc_id", "content_md5", "fingerprint"
            ),
            "doc_id",
        )
    )
    write_table(annotated, args.output + "/clean", mode="overwrite")
    print(
        json.dumps(
            {
                "input_docs": n0,
                "after_exact_dedup": n1,
                "after_near_dup": n2,
                "after_quality": n3,
                "after_repetition": n3r,
                "after_lang": n4,
                "sec": round(time.time() - t0, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
