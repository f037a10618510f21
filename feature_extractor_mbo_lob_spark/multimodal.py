"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual media decode is STUBBED behind
``NotImplementedError`` or a deterministic fake because the image/audio
libraries are not in this container. Swapping in PIL/torchaudio is a local
change inside the mapInPandas function — the distributed plan is unchanged.

Scale notes: binary payloads ride in their own column so Parquet column
pruning skips them unless a stage needs bytes; mapInPandas streams Arrow
batches (bounded memory via spark.sql.execution.arrow.maxRecordsPerBatch);
decode stages should repartition by size-balanced buckets, not row counts.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image | audio | video
    T.StructField("mime", T.StringType(), True),
    T.StructField("payload", T.BinaryType(), True),      # opaque bytes
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
])

FEATURE_DIM = 8  # deterministic fake embedding width


def synth_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = repeating hash bytes."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(F.repeat(F.md5(F.concat(F.lit(seed), F.col("id"))), 4), "utf-8").alias("payload"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(1920)) + 1).cast("int").alias("width"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 2)), F.lit(1080)) + 1).cast("int").alias("height"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 3)), F.lit(60000)) + 1).cast("int").alias("duration_ms"),
    )
    return df


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: bytes -> FEATURE_DIM floats.
    REPLACE with PIL/torchaudio decode when the libs exist."""
    if payload is None:
        return np.zeros(FEATURE_DIM)
    a = np.frombuffer(payload[: FEATURE_DIM * 4], dtype=np.uint8).astype(np.float64)
    a = np.resize(a, FEATURE_DIM)
    return a / 255.0


def extract_media_features(df: DataFrame, batch_col: str = "payload") -> DataFrame:
    """mapInPandas feature extraction: (media_id, kind, features array<double>).
    Arrow-batched; the per-batch loop is numpy over the binary column."""
    out_schema = "media_id long, kind string, features array<double>"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(p).tolist() for p in pdf[batch_col]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "features": feats,
            })

    return df.mapInPandas(fn, schema=out_schema)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stage — STUB: the plan (filter to images, Arrow batches,
    binary out) is real; the pixel work requires an image library."""
    out_schema = "media_id long, payload binary, width int, height int"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image decode requires PIL/opencv — not available in this "
            "container; plug the real resize into this mapInPandas body"
        )

    return df.filter(F.col("kind") == "image").mapInPandas(fn, schema=out_schema)


def sample_video_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling stage — deterministic fake: emits one row per sampled
    timestamp with a fake frame fingerprint (plan + explode shape real;
    decode stubbed)."""
    frames = df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest((F.col("duration_ms") / every_ms).cast("int") - 1, F.lit(0)))
        ).alias("frame_no"),
    )
    return frames.withColumn(
        "frame_fingerprint", F.md5(F.concat_ws(":", "media_id", "frame_no"))
    )
