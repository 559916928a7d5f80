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


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("out_w", IntegerType(), True),
        StructField("out_h", IntegerType(), True),
    ]
)


def resize_media(media: DataFrame, max_w: int, max_h: int) -> DataFrame:
    """Fit-resize planning over Arrow batches (mapInPandas): compute
    source dims (stub decode) and the bounding-box target size.

    The scale factor is RATIONAL integer math — out = dim * num //
    den with (num, den) the tighter of max_w/w, max_h/h — so the
    result is bit-reproducible in any engine (float scale factors
    round differently). A real deployment resizes the pixels in the
    same batch loop (PIL.thumbnail); the plumbing — batch shapes,
    schema, no shuffle — is identical and is what's tested."""

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            n = pdf["content"].apply(len)
            w = (n % 640 + 1).astype("int64")
            h = (n % 480 + 1).astype("int64")
            fits = (w <= max_w) & (h <= max_h)
            # tighter bound: max_w/w vs max_h/h compared cross-wise
            use_w = (w * max_h) >= (h * max_w)
            num = use_w * max_w + (~use_w) * max_h
            den = use_w * w + (~use_w) * h
            out_w = (w * num // den).clip(lower=1)
            out_h = (h * num // den).clip(lower=1)
            out = pd.DataFrame()
            out["media_id"] = pdf["media_id"]
            out["width"] = w.astype("int32")
            out["height"] = h.astype("int32")
            out["out_w"] = out_w.where(~fits, w).astype("int32")
            out["out_h"] = out_h.where(~fits, h).astype("int32")
            yield out

    return media.mapInPandas(gen, RESIZED_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_no", IntegerType(), False),
        StructField("frame_feature", LongType(), False),
    ]
)

FRAME_BYTES = 16


def sample_frames(media: DataFrame, every_k: int = 4) -> DataFrame:
    """Frame sampling over Arrow batches: treat the payload past the
    4-byte header as fixed-size frames (FRAME_BYTES each, stub for a
    real demuxer), emit every k-th frame with a per-frame feature
    (byte sum). Row-expanding mapInPandas — output rows ~n_frames/k
    per input row, still a narrow stage (no shuffle); downstream
    aggregation sees ordinary (media_id, frame_no) rows."""

    def gen(batches):
        rows_id, rows_no, rows_feat = [], [], []
        for pdf in batches:
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                body = bytes(content)[4:]
                n_frames = (len(body) + FRAME_BYTES - 1) // FRAME_BYTES
                for f in range(0, n_frames, every_k):
                    chunk = body[f * FRAME_BYTES:(f + 1) * FRAME_BYTES]
                    rows_id.append(mid)
                    rows_no.append(f)
                    rows_feat.append(sum(chunk))
            if rows_id:
                yield pd.DataFrame(
                    {
                        "media_id": pd.Series(rows_id, dtype="int64"),
                        "frame_no": pd.Series(rows_no, dtype="int32"),
                        "frame_feature": pd.Series(rows_feat, dtype="int64"),
                    }
                )
                rows_id, rows_no, rows_feat = [], [], []

    return media.mapInPandas(gen, FRAMES_SCHEMA)
