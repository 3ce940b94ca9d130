"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode kernels themselves are STUBBED — the image/audio libraries
are not in this container — but everything Spark-side is real and
tested: the schema convention, the Arrow batch shape through
mapInPandas, partition-size control for large blobs, and the
deterministic fake feature extractor used by tests.

Convention: a multimodal table is
    (asset_id: long, modality: string, media: binary, meta: struct<
        mime: string, width: int, height: int, duration_ms: int>)
Large blobs mean few rows per Arrow batch — callers should set
spark.sql.execution.arrow.maxRecordsPerBatch and partition by
asset_id so one hot asset cannot overload a task.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), True),
        T.StructField("media", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16


def _decode_image(_data: bytes) -> "object":
    """Real decoder slot (PIL/libvips on a production cluster)."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "container; use fake_features for plumbing tests"
    )


def _fake_features(data: bytes | None, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in feature extractor: content-addressed
    pseudo-features from a rolling byte hash. Stable across batch
    boundaries and partitionings (pure function of bytes)."""
    if not data:
        return [0.0] * dim
    acc = [0] * dim
    h = 2166136261
    for i, byte in enumerate(data):
        h = ((h ^ byte) * 16777619) & 0xFFFFFFFF
        acc[i % dim] = (acc[i % dim] + h) & 0xFFFFFFFF
    return [round((a / 0xFFFFFFFF) * 2 - 1, 6) for a in acc]


def extract_features(media_df: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """media table -> (asset_id, modality, features: array<double>).

    Arrow-batched mapInPandas: the binary column rides the Arrow
    transfer; per-row Python touches only the blob bytes (unavoidable
    for decode) and nothing relational."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for data in pdf["media"]:
                if use_real_decoder:
                    _decode_image(data)  # raises NotImplementedError by design
                feats.append(_fake_features(bytes(data) if data is not None else None))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "features": feats,
                }
            )

    return media_df.mapInPandas(
        run, schema="asset_id long, modality string, features array<double>"
    )


def frame_sample_plan(media_df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: which (asset, timestamp) pairs to
    decode — pure relational expansion from metadata, no decode. The
    expensive part stays declarative and prunable."""
    return (
        media_df.where(F.col("modality") == "video")
        .select(
            "asset_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def resize_stub(media_df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize slot: passes metadata through with the new target size;
    the pixel kernel is NotImplemented in this container. Keeps the
    schema contract testable."""
    return media_df.select(
        "asset_id",
        "modality",
        "media",
        F.struct(
            F.col("meta.mime").alias("mime"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
        ).alias("meta"),
    )
