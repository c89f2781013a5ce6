"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a
metadata struct; decode / feature-extract run as Arrow-batched
``mapInPandas`` so each executor processes whole record batches. The
decode step itself is STUBBED (no image/audio libs in this container):
``decode_features`` tries to import PIL and otherwise computes a
deterministic fake feature vector from the bytes, so the Spark-side
plumbing — schema, batch shape, partitioning — is real and tested
while the codec is swappable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

N_FEATURES = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("payload_md5", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary payload (documents.text
    bytes stand in for image bytes): declarative, oracle-checkable."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.octet_length("text").cast("long").alias("n_bytes"),
        F.md5(F.col("text").cast("binary")).alias("payload_md5"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for an image decoder: pseudo dimensions
    from the digest, features from byte histogram moments."""
    digest = hashlib.md5(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        feats = [0.0] * N_FEATURES
    else:
        hist, _ = np.histogram(arr, bins=N_FEATURES, range=(0, 256))
        feats = (hist / arr.size).astype(np.float32).tolist()
    return width, height, feats


def decode_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Input requires columns (doc_id long, payload binary). Real decode
    would use PIL/libvips here; absent those libs, the deterministic
    fake keeps schema/batching real (clearly marked stub).
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                # the deterministic fake codec is used unconditionally
                # until a real decoder is wired in (a merely-importable
                # imaging lib must not change behavior or crash batches)
                w, h, feats = _fake_decode(data)
                rows.append(
                    (
                        int(doc_id),
                        len(data),
                        hashlib.md5(data).hexdigest(),
                        w,
                        h,
                        feats,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_bytes",
                    "payload_md5",
                    "width",
                    "height",
                    "features",
                ],
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end: binary column -> mapInPandas decode -> features.

    The checked output is flattened (posexplode of the feature vector,
    rounded to 6dp) so the result is a sortable/hashable relation; the
    raw ``array<float>`` shape stays internal to ``decode_features``.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    return decode_features(docs).select(
        "doc_id",
        "n_bytes",
        "payload_md5",
        "width",
        "height",
        F.posexplode("features").alias("pos", "f"),
    ).select(
        "doc_id",
        "n_bytes",
        "payload_md5",
        "width",
        "height",
        "pos",
        F.round(F.col("f").cast("double"), 6).alias("feature"),
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_md5", StringType()),
        StructField("n_bytes", LongType()),
    ]
)


def frame_sample(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """1->N frame sampling over opaque video-like payloads via
    mapInPandas (UDTF-style expansion). The decode is the deterministic
    stub: frame i is the md5 of the i-th stride slice of the bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                stride = max(1, len(data) // n_frames)
                for i in range(n_frames):
                    chunk = data[i * stride : (i + 1) * stride]
                    rows.append(
                        (
                            int(doc_id),
                            i,
                            hashlib.md5(chunk).hexdigest(),
                            len(chunk),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_md5", "n_bytes"]
            )

    return df.mapInPandas(run, FRAME_SCHEMA)


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    return frame_sample(docs)
