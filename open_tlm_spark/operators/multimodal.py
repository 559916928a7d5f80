"""Multimodal columns: images/audio/video as opaque binary + typed
metadata, processed with Arrow-batched pandas transforms.

Driver north-star component. Design (the part that matters at 100 TB):
  * the column layout — content as BinaryType next to a metadata
    struct — keeps Parquet scans prunable: metadata-only queries never
    read the (huge) binary column thanks to Parquet column pruning;
  * decode / feature-extract runs via mapInPandas — Arrow batches in,
    Arrow batches out, one Python worker per partition, so the hot
    path is batch-columnar, never row-at-a-time;
  * partitioning: binary payloads make rows heavy — size partitions
    by bytes (maxPartitionBytes), never by row count.

The actual codec step is STUBBED (no image/audio libs in this
container): decode_images() runs a deterministic fake decoder that
parses our synthetic header; a real deployment swaps `_decode_batch`
for PIL/libvips/ffmpeg calls — the Spark-side plumbing (schema,
batching, partitioning) is identical and is what's tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Content row: opaque payload + typed metadata (media_type/codec kept
# as top-level columns so scans prune the binary column away).
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("codec", StringType(), False),
        StructField("content", BinaryType(), False),
        StructField("n_bytes", LongType(), False),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("feature_norm", LongType(), True),
    ]
)


def synth_media(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Build a deterministic synthetic media table from any string
    column: payload = utf-8 bytes behind a fake 'IMG1' header. Stands
    in for real image bytes so the pipeline is testable offline."""
    content = F.concat(
        F.lit(b"IMG1"), F.encode(F.col(payload_col), "UTF-8")
    ).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.lit("fake/v1").alias("codec"),
        content.alias("content"),
        F.length(content).cast("long").alias("n_bytes"),
    )


def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """STUB decoder: real deployments replace this body with
    PIL.Image.open / soundfile / av. Deterministic fake: dimensions
    derive from payload length, 'feature' is a byte checksum."""
    out = pd.DataFrame()
    out["media_id"] = pdf["media_id"]
    out["media_type"] = pdf["media_type"]
    n = pdf["content"].apply(len)
    out["width"] = (n % 640 + 1).astype("int32")
    out["height"] = (n % 480 + 1).astype("int32")
    out["n_frames"] = pd.Series([1] * len(pdf), dtype="int32")
    out["feature_norm"] = pdf["content"].apply(lambda b: sum(b[:64])).astype("int64")
    return out


def decode_media(media: DataFrame) -> DataFrame:
    """Decode/feature-extract over Arrow batches (mapInPandas).

    The plan: a narrow mapInPandas stage — no shuffle; upstream
    column pruning still applies to any metadata-only branch."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _decode_batch(pdf)

    return media.mapInPandas(gen, DECODED_SCHEMA)


def media_metadata_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — MUST NOT read the binary column
    (verify with .explain: ReadSchema excludes `content`)."""
    return media.groupBy("media_type", "codec").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max("n_bytes").alias("max_bytes"),
    )
