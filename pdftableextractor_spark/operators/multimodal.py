"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The container has no image/audio codecs, so the actual decode is STUBBED
(deterministic fake features behind ``decode_stub``; a real deployment swaps
``NotImplementedError``-guarded ``real_decode`` for PIL/ffmpeg). What IS real
and tested here is everything Spark-side: the binary schema, Arrow batch
shape through ``mapInPandas``, partition-size control for fat binary rows,
and the metadata join-back.

Contract:
  assets(asset_id string, kind string, payload binary,
         meta struct<mime string, width int, height int, duration_ms int>)
  extract_features(assets) → (asset_id, kind, n_bytes, sha, feat array<float>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEAT_DIM = 8
FEATURES_SCHEMA = (
    "asset_id string, kind string, n_bytes long, sha string, feat array<float>"
)


def synth_assets(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive a deterministic binary assets table from a text corpus (no
    external data): payload = utf-8 bytes, kind round-robins image/audio/video,
    metadata derived from doc_id."""
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (h % 3 + 1).cast("int"),
    )
    return docs.select(
        F.concat(F.lit("asset-"), F.col("doc_id").cast("string")).alias(
            "asset_id"
        ),
        kind.alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            (h % 1024).cast("int").alias("width"),
            (
                F.conv(F.substring(F.md5(F.col(text_col)), 1, 8), 16, 10)
                .cast("bigint")
                % 768
            ).cast("int").alias("height"),
            # video assets get a 1-60 s duration so frame sampling has
            # something to walk; image/audio stay 0
            F.when(kind == "video", (h % 59000 + 1000))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("duration_ms"),
        ).alias("meta"),
    )


def resize_assets(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing (codec stubbed): the REAL parts are the asset schema,
    the metadata update, and that the whole op is a narrow JVM projection —
    no shuffle, no Python. The re-encoded payload is a deterministic fake
    (unhex(sha2(payload || 'WxH')) — 32 bytes standing in for the codec
    output); a real deployment swaps the payload expression for a Pandas-UDF
    PIL resize with the SAME schema."""
    tag = F.encode(F.lit(f"{width}x{height}"), "utf-8")
    return assets.select(
        "asset_id",
        "kind",
        F.unhex(F.sha2(F.concat(F.col("payload"), tag), 256)).alias("payload"),
        F.struct(
            F.col("meta.mime").alias("mime"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
        ).alias("meta"),
    )


def sample_frames(assets: DataFrame, every_ms: int = 5000) -> DataFrame:
    """Frame sampling for video assets: one row per sampled timestamp
    (0, every_ms, 2·every_ms, … ≤ duration_ms). Pure JVM: sequence+explode
    fan-out, deterministic fake frame bytes (unhex(sha2(payload || ts))).
    The fan-out happens BEFORE any shuffle, so a 2-hour video is
    duration/every_ms parallel rows, not one task — the same skew posture
    as the pdf layout kernel."""
    v = assets.filter(F.col("kind") == "video")
    expanded = v.select(
        "asset_id",
        "payload",
        F.explode(
            F.sequence(
                F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms)
            )
        ).alias("ts_ms"),
    )
    return expanded.select(
        "asset_id",
        (F.col("ts_ms") / every_ms).cast("int").alias("frame_idx"),
        F.col("ts_ms").cast("int").alias("ts_ms"),
        F.unhex(
            F.sha2(
                F.concat(
                    F.col("payload"),
                    F.encode(F.col("ts_ms").cast("string"), "utf-8"),
                ),
                256,
            )
        ).alias("frame"),
    )


def real_decode(payload: bytes, kind: str):
    """Swap-in point for PIL / soundfile / ffmpeg decoding."""
    raise NotImplementedError(
        "media codecs unavailable in this environment; use decode_stub"
    )


def decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic fake 'decode': FEAT_DIM floats from the sha256 of the
    payload — stable across runs/partitions, exercises the full Arrow path."""
    d = hashlib.sha256(payload).digest()
    return np.frombuffer(d[: FEAT_DIM * 4], dtype=">u4").astype(np.float32) / (
        2.0**32
    )


def _features_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        feats = [
            decode_stub(p, k)
            for p, k in zip(pdf["payload"].values, pdf["kind"].values)
        ]
        yield pd.DataFrame(
            {
                "asset_id": pdf["asset_id"].astype("string"),
                "kind": pdf["kind"].astype("string"),
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "sha": [hashlib.sha256(p).hexdigest() for p in pdf["payload"]],
                "feat": [f.tolist() for f in feats],
            }
        )


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads. Repartitioning
    by asset_id upstream keeps batches balanced when payload sizes are
    heavy-tailed (same skew story as the pdf layout kernel)."""
    return assets.select("asset_id", "kind", "payload").mapInPandas(
        _features_kernel, schema=FEATURES_SCHEMA
    )
