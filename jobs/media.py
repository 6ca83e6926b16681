"""spark-submit entrypoint: multimodal asset processing over a binary
assets table — the media-side analog of jobs/curate.py.

    spark-submit --py-files engine.zip jobs/media.py \
        --input /root/testdata/sf0.01 --output /tmp/media

One pass over assets(asset_id, kind, payload, meta):
  1. featurize      Arrow-batched decode-or-degrade features for every
                    payload (real PNG/WAV/AVI decodes, deterministic stub
                    for everything else) -> <output>/features
  2. image dedup    perceptual dhash pairs -> connected components ->
                    keep the min-id representative per visual cluster
  3. audio dedup    energy-profile fingerprint pairs, same clustering
  3b. video dedup   frame-hash containment pairs (re-encodes AND clips
                    cut from longer videos); containment is asymmetric
                    and non-transitive, so NO clustering — each pair
                    drops only its contained side
  4. frame sample   REAL frames for decodable videos (sha fallback rows
                    for the rest) -> <output>/frames
  5. keep list      assets minus non-representative image/audio/video
                    dups -> <output>/kept

`--assets` points at a real assets parquet; without it, a deterministic
assets table is synthesized from the input documents (synth_assets — the
same corpus the driver queries use). Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument(
        "--input",
        default=None,
        help="dir with documents.parquet (used to synthesize assets when "
        "no --assets table is given)",
    )
    p.add_argument(
        "--assets",
        default=None,
        help="real assets parquet (asset_id, kind, payload, meta); "
        "default: synthesize deterministically from the input documents",
    )
    p.add_argument("--output", required=True)
    p.add_argument("--max-hamming", type=int, default=4)
    p.add_argument(
        "--n-bands",
        type=int,
        default=None,
        help="multiband blocking bands (must divide 60); default: the "
        "smallest divisor of 60 above --max-hamming, so the pigeonhole "
        "recall guarantee (exact <= n_bands-1) always covers the "
        "requested threshold",
    )
    p.add_argument(
        "--video-containment",
        type=float,
        default=0.8,
        help="frame-hash containment threshold for video near-dup pairs",
    )
    p.add_argument("--frame-every-ms", type=int, default=5000)
    p.add_argument(
        "--video-hash-every-ms",
        type=int,
        default=None,
        help="hash one frame per this many ms for video dedup signatures "
        "(default: every frame; see video_near_dups for the clip-recall "
        "trade)",
    )
    p.add_argument(
        "--video-max-frames",
        type=int,
        default=None,
        help="cap on hashed frames per video (evenly spaced)",
    )
    p.add_argument("--master", default=None)
    args = p.parse_args()
    if not args.input and not args.assets:
        p.error("one of --input (synthesize assets) or --assets is required")
    if args.frame_every_ms < 1:
        p.error("--frame-every-ms must be >= 1")
    if args.video_hash_every_ms is not None and args.video_hash_every_ms < 1:
        p.error("--video-hash-every-ms must be >= 1")
    if args.video_max_frames is not None and args.video_max_frames < 1:
        p.error("--video-max-frames must be >= 1")
    if not (0.0 < args.video_containment <= 1.0):
        p.error(
            f"--video-containment must be in (0, 1], got "
            f"{args.video_containment} (it is a containment FRACTION, "
            "not a percentage)"
        )
    if args.n_bands is None:
        # keep the exact-recall guarantee at the requested threshold
        args.n_bands = next(
            (b for b in (5, 6, 10, 12, 15, 20, 30, 60)
             if b > args.max_hamming),
            None,
        )
        if args.n_bands is None:
            p.error("--max-hamming must be < 60")
    if 60 % args.n_bands:
        p.error(f"--n-bands {args.n_bands} must divide 60")
    if args.max_hamming > args.n_bands - 1:
        p.error(
            f"--max-hamming {args.max_hamming} exceeds the exact-recall "
            f"bound of {args.n_bands} bands (n_bands-1); raise --n-bands"
        )

    from pyspark.sql import functions as F

    from pdftableextractor_spark.operators.dedup import connected_components
    from pdftableextractor_spark.operators.multimodal import (
        audio_near_dups,
        extract_features,
        image_near_dups,
        sample_frames_decoded,
        synth_assets,
        video_near_dups,
    )
    from pdftableextractor_spark.session import build_session
    from pdftableextractor_spark.sources.tables import read_path, write_table

    spark = build_session(app_name="media-job", master=args.master)
    t0 = time.time()
    if args.assets:
        assets = read_path(spark, args.assets)
    else:
        docs = read_path(spark, f"{args.input}/documents.parquet").withColumn(
            "doc_id", F.col("doc_id").cast("string")
        )
        assets = synth_assets(docs)
    # the asset frame feeds five branches (features, three dedup paths,
    # frame sampling) — materialize once (the curate-funnel lineage rule)
    assets = assets.localCheckpoint()
    by_kind = {
        r["kind"]: r["n"]
        for r in assets.groupBy("kind").agg(F.count("*").alias("n")).collect()
    }

    feats = extract_features(assets)
    write_table(feats, f"{args.output}/features")
    n_feats = read_path(spark, f"{args.output}/features").count()

    losers = None
    pair_counts = {}
    # image/audio pairs are SYMMETRIC (mutually near-identical), so
    # connected components + min-id representative is sound. Video
    # containment pairs are ASYMMETRIC and NOT transitive: a clip C
    # contained in two UNRELATED full videos A and D would chain
    # {A, C, D} into one component, and keeping a single representative
    # would discard D's unique content. So video never clusters: each
    # pair drops ONLY its contained (smaller frame-hash set) side; on
    # equal sizes (mutual re-encodes, containment 1.0 both ways) the
    # lexicographically larger id is dropped, mirroring the min-id rule.
    # A video is removed iff it is the duplicate side of at least one
    # pair — a strict superset is never dropped on a clip's account.
    # (Equal-size chains A~B, B~C without an A~C pair drop B and C and
    # keep A — same single-representative outcome CC would pick.)
    vp = video_near_dups(
        assets,
        threshold=args.video_containment,
        hash_every_ms=args.video_hash_every_ms,
        max_frames=args.video_max_frames,
    ).localCheckpoint()
    video_drop = vp.select(
        F.when(F.col("size_a") < F.col("size_b"), F.col("asset_a"))
        .when(F.col("size_b") < F.col("size_a"), F.col("asset_b"))
        .otherwise(F.greatest("asset_a", "asset_b"))
        .alias("asset_id")
    ).distinct()
    for name, pairs, drop in (
        ("image", image_near_dups(
            assets, max_hamming=args.max_hamming, n_bands=args.n_bands
        ), None),
        ("audio", audio_near_dups(
            assets, max_hamming=args.max_hamming, n_bands=args.n_bands
        ), None),
        ("video", vp.select("asset_a", "asset_b"), video_drop),
    ):
        pairs = pairs.localCheckpoint()
        pair_counts[name] = pairs.count()
        if drop is None:
            cc = connected_components(
                pairs, a_col="asset_a", b_col="asset_b"
            )
            drop = cc.filter(F.col("node") != F.col("component")).select(
                F.col("node").alias("asset_id")
            )
        losers = drop if losers is None else losers.unionByName(drop)

    kept = assets.join(losers, "asset_id", "left_anti")
    write_table(
        kept.select("asset_id", "kind", "meta"), f"{args.output}/kept"
    )
    n_kept = read_path(spark, f"{args.output}/kept").count()

    frames = sample_frames_decoded(assets, every_ms=args.frame_every_ms)
    write_table(frames, f"{args.output}/frames")
    fstats = read_path(spark, f"{args.output}/frames").agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.col("decoded").cast("int")), F.lit(0)
        ).alias("real"),
    ).collect()[0]
    n_frames, n_real_frames = int(fstats["n"]), int(fstats["real"])

    print(
        json.dumps(
            {
                "assets": sum(by_kind.values()),
                "by_kind": by_kind,
                "features": n_feats,
                "image_pairs": pair_counts.get("image", 0),
                "audio_pairs": pair_counts.get("audio", 0),
                "video_pairs": pair_counts.get("video", 0),
                "kept": n_kept,
                "frames_sampled": n_frames,
                "frames_decoded": n_real_frames,
                "sec": round(time.time() - t0, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
