"""Multimodal column plumbing: image/audio/video as opaque binary columns.

Pattern (per the BASELINE brief): media travels as ``binary`` + a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions over ``mapInPandas`` — the only place Python
touches data, and it does so a batch at a time.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so the
decode kernels are stubbed two ways:
- ``decode=\"fake\"`` (default in tests): a deterministic pure-numpy decoder
  that derives features from the bytes' sha256 — exercises the full Spark
  plumbing (schema, batching, partitioning) with stable assertions;
- ``decode=\"real\"``: raises NotImplementedError at the kernel boundary,
  marking exactly where a real codec plugs in.

Scale notes: media rows are wide — ``spark.sql.files.maxPartitionBytes``
and ``maxRecordsPerBatch`` keep Arrow batches bounded; feature extraction
is embarrassingly parallel (no shuffle); downstream joins use only the
narrow metadata/feature columns (never shuffle raw bytes — project them
away before any wide operation).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Literal

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("format", T.StringType()),      # png | wav | mp4 | ...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_sha256", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode_features(blob: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a codec+encoder: expand sha256(blob) into
    ``dim`` floats in [-1, 1]. Vectorized per batch by the caller."""
    h = hashlib.sha256(blob or b"").digest()
    reps = (dim * 4 // len(h)) + 1
    buf = (h * reps)[: dim * 4]
    arr = np.frombuffer(buf, dtype=np.uint32).astype(np.float64)
    return (arr / np.float64(2**31) - 1.0).astype(np.float32)


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    bytes_col: str = "media",
    dim: int = 16,
    decode: Literal["fake", "real"] = "fake",
) -> DataFrame:
    """Binary column → (id, sha256, size, feature vector) via mapInPandas.

    The iterator-of-batches form keeps memory at one Arrow batch; at
    cluster scale this is the standard shape for codec work.
    """
    if decode == "real":
        def kernel(_: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            raise NotImplementedError(
                "real media decode requires PIL/librosa/ffmpeg — not present "
                "in this environment; plug the codec in here"
            )
            yield  # pragma: no cover
    else:
        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                blobs = pdf[bytes_col]
                yield pd.DataFrame(
                    {
                        "doc_id": pdf[id_col].astype("int64"),
                        "media_sha256": [hashlib.sha256(b or b"").hexdigest() for b in blobs],
                        "n_bytes": [len(b or b"") for b in blobs],
                        "feature": [_fake_decode_features(b, dim) for b in blobs],
                    }
                )

    return df.select(id_col, bytes_col).mapInPandas(kernel, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("resized", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    bytes_col: str = "media",
    decode: Literal["fake", "real"] = "fake",
) -> DataFrame:
    """Image resize as an Arrow-batched ``mapInPandas`` stage — the same
    plumbing shape as :func:`extract_features` (schema, batching,
    partition-local, no shuffle).

    ``decode="fake"`` (default): a deterministic stand-in — output bytes
    are sha256(input ‖ 'wxh') repeated to width×height (3 bytes/px), so
    tests can assert size/determinism without PIL; ``decode="real"`` raises
    at the kernel boundary where PIL's ``Image.resize`` plugs in."""
    if decode == "real":
        def kernel(_: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            raise NotImplementedError(
                "real image resize requires PIL — not present in this "
                "environment; plug Image.open(...).resize((w, h)) in here"
            )
            yield  # pragma: no cover
    else:
        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            n = width * height * 3
            for pdf in batches:
                outs = []
                for b in pdf[bytes_col]:
                    h = hashlib.sha256((b or b"") + f"{width}x{height}".encode()).digest()
                    outs.append((h * (n // len(h) + 1))[:n])
                yield pd.DataFrame(
                    {
                        "doc_id": pdf[id_col].astype("int64"),
                        "resized": outs,
                        "width": width,
                        "height": height,
                    }
                )

    return df.select(id_col, bytes_col).mapInPandas(kernel, RESIZED_SCHEMA)


def attach_media_metadata(df: DataFrame, bytes_col: str = "media") -> DataFrame:
    """Typed metadata struct inferred from magic bytes (pure expressions —
    the cheap, JVM-side part of decode)."""
    b = F.col(bytes_col)
    head = F.hex(F.substring(b, 1, 4))
    media_format = (
        F.when(head.startswith("89504E47"), F.lit("png"))
        .when(head.startswith("FFD8"), F.lit("jpeg"))
        .when(head.startswith("52494646"), F.lit("wav"))
        .when(head.startswith("00000018") | head.startswith("00000020"), F.lit("mp4"))
        .otherwise(F.lit("unknown"))
    )
    media_type = (
        F.when(media_format.isin("png", "jpeg"), F.lit("image"))
        .when(media_format == "wav", F.lit("audio"))
        .when(media_format == "mp4", F.lit("video"))
        .otherwise(F.lit("unknown"))
    )
    meta = F.struct(
        media_type.alias("media_type"),
        media_format.alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    return df.withColumn("media_meta", meta)


def frame_sample_plan(
    df: DataFrame,
    id_col: str = "doc_id",
    every_ms: int = 1000,
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Video frame-sampling *plan*: one row per (video, frame_ts) — the
    distributed fan-out that a real frame extractor consumes. Pure
    sequence/explode, no Python."""
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.coalesce(F.col(duration_col), F.lit(0)) - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
