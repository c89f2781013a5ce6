"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a
metadata struct; decode / feature-extract run as Arrow-batched
``mapInPandas`` so each executor processes whole record batches.

One format per modality decodes for REAL with no media library:
PNG images (:mod:`..kernels.png`: IHDR/IDAT + row defilter), WAV/PCM
audio (:mod:`..kernels.wav`: RIFF fmt/data chunks), and Y4M video
(:mod:`..kernels.y4m`: YUV4MPEG2 frame stream) — dimensions, samples,
and frames come from actual payload contents. Every other format is
STUBBED (no codec libs in this container): a deterministic fake
computes pseudo-dimensions from the digest and features from
byte-histogram moments, so the Spark-side plumbing — schema, batch
shape, partitioning — is real and tested while those codecs stay
swappable.
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

from ..kernels import png, wav, y4m

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



def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .spread import spread_input

    return spread_input(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), key="doc_id"
    )

def binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary payload (documents.text
    bytes stand in for image bytes): declarative, oracle-checkable."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.octet_length("text").cast("long").alias("n_bytes"),
        F.md5(F.col("text").cast("binary")).alias("payload_md5"),
    )


def _histogram_features(arr: np.ndarray) -> list[float]:
    if arr.size == 0:
        return [0.0] * N_FEATURES
    hist, _ = np.histogram(arr, bins=N_FEATURES, range=(0, 256))
    return (hist / arr.size).astype(np.float32).tolist()


def _fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for an image decoder: pseudo dimensions
    from the digest, features from byte histogram moments."""
    digest = hashlib.md5(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    return width, height, _histogram_features(
        np.frombuffer(payload, dtype=np.uint8)
    )


def _decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Real PNG decode when the payload is one; deterministic fake
    otherwise (including malformed/unsupported PNGs)."""
    if png.is_png(payload):
        try:
            w, h, pixels = png.decode_png(payload)
            return w, h, _histogram_features(
                np.frombuffer(pixels, dtype=np.uint8)
            )
        except png.PngError:
            pass
    return _fake_decode(payload)


def decode_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Input requires columns (doc_id long, payload binary). PNG payloads
    decode through the real pure-Python codec (dimensions + pixel
    histogram); other formats take the deterministic fake, which keeps
    schema/batching real while those codecs stay stubs.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                # PNG decodes for real; anything else takes the
                # declared deterministic fake
                w, h, feats = _decode(data)
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
    docs = _docs(spark, sf_dir).select(
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


def frame_sample(
    df: DataFrame, n_frames: int = 4, sniff_real: bool = True
) -> DataFrame:
    """1->N frame sampling over video-like payloads via mapInPandas
    (UDTF-style expansion). Y4M (YUV4MPEG2) payloads sample REAL
    frames — evenly spaced source indices over the actual frame list;
    other formats take the deterministic stub (frame i = md5 of the
    i-th stride slice of the bytes).

    ``sniff_real=False`` disables the Y4M content sniff and forces the
    stub for every row: the Y4M magic is plain ASCII ("YUV4MPEG2"), so
    a *text* corpus document that happens to contain a well-formed Y4M
    stream (e.g. format documentation) would otherwise silently switch
    paths. Callers feeding text-derived payloads with a stub-shaped
    oracle (multimodal_frames) must pass False; callers feeding actual
    video bytes keep the default."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                if sniff_real and y4m.is_y4m(data):
                    try:
                        _, _, _, frames = y4m.decode_y4m(data)
                        # short clips emit each frame once; longer
                        # clips sample evenly spaced DISTINCT source
                        # indices ((i*total)//k is strictly increasing
                        # when total >= k) — (doc_id, frame_idx) stays
                        # unique either way
                        k = min(n_frames, len(frames))
                        for i in range(k):
                            idx = (i * len(frames)) // k
                            fr = frames[idx]
                            rows.append(
                                (
                                    int(doc_id),
                                    idx,
                                    hashlib.md5(fr).hexdigest(),
                                    len(fr),
                                )
                            )
                        continue
                    except y4m.Y4mError:
                        pass  # malformed video: stub path below
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
    # payloads here are cast *text* — the stub-shaped DuckDB oracle is
    # the contract, so the ASCII Y4M sniff must never fire (sniff_real
    # stays on only for true-video callers like y4m_frames' input).
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    return frame_sample(docs, sniff_real=False)


def _synth_png(d: int) -> tuple[int, int, int, bytes]:
    """Deterministic per-doc constant-gray PNG: (w, h, v, payload).
    The SAME derivation backs png_decode and multimodal_resize AND
    their DuckDB oracles (__spark_entry__) — change all four together.
    v stays in 1..127 so DuckDB's UTF-8 md5(string) equals the byte
    md5 of the pixel buffer."""
    w, h, v = 16 + d % 48, 8 + d % 24, 1 + d % 127
    return w, h, v, png.encode_png(w, h, bytes([v]) * (w * h))


PNG_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("pixel_md5", StringType()),
        StructField("n_pixels", LongType()),
    ]
)


def png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable proof the PNG codec is real: per doc_id,
    synthesize a constant-gray PNG (width/height/value derived from
    doc_id), run it through encode -> REAL decode, and emit decoded
    geometry + the md5 of the decoded pixel bytes. The oracle predicts
    every column analytically (the constant image's pixel buffer is
    ``repeat(chr(v), w*h)``), so a hash match certifies the decoder
    recovered the actual pixels — not metadata arithmetic. Gray values
    stay in 1..127 so DuckDB's UTF-8 md5(string) equals the byte md5."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                _, _, _, payload = _synth_png(d)
                dw, dh, pixels = png.decode_png(payload)
                rows.append(
                    (
                        d,
                        dw,
                        dh,
                        hashlib.md5(pixels).hexdigest(),
                        len(pixels),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "pixel_md5", "n_pixels"],
            )

    docs = _docs(spark, sf_dir).select("doc_id")
    return docs.mapInPandas(run, PNG_SCHEMA)


def resize_nearest(
    pixels: bytes, w: int, h: int, out_w: int, out_h: int
) -> bytes:
    """Nearest-neighbor resample of an 8-bit single-channel pixel
    buffer (numpy fancy-index; no per-pixel Python)."""
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w)
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return arr[rows][:, cols].tobytes()


RESIZE_W = RESIZE_H = 8

RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("src_w", IntegerType()),
        StructField("src_h", IntegerType()),
        StructField("out_w", IntegerType()),
        StructField("out_h", IntegerType()),
        StructField("resized_md5", StringType()),
    ]
)


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize as a pipeline op: synthesize a constant-gray PNG
    per doc_id, REALLY decode it, nearest-neighbor-resample the pixels
    to 8x8, and emit the resized buffer's md5. The oracle predicts the
    result analytically (a constant image resamples to a constant:
    ``repeat(chr(v), 64)``), so a hash match certifies decode + resize
    ran over real pixels. The gradient-correctness of the resampler is
    pinned by the pytest golden (tests/test_png.py)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            rows = []
            for doc_id in pdf_b["doc_id"]:
                d = int(doc_id)
                _, _, _, payload = _synth_png(d)
                dw, dh, pixels = png.decode_png(payload)
                small = resize_nearest(pixels, dw, dh, RESIZE_W, RESIZE_H)
                rows.append(
                    (
                        d,
                        dw,
                        dh,
                        RESIZE_W,
                        RESIZE_H,
                        hashlib.md5(small).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "src_w", "src_h", "out_w", "out_h",
                    "resized_md5",
                ],
            )

    docs = _docs(spark, sf_dir).select("doc_id")
    return docs.mapInPandas(run, RESIZE_SCHEMA)



WAV_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("pcm_md5", StringType()),
    ]
)


def _synth_wav(d: int) -> tuple[int, int, bytes]:
    """Deterministic per-doc 8-bit mono WAV with a NON-constant ramp
    (pcm[i] = 1 + (d + i) % 127): harder to fake than a constant —
    the oracle reconstructs the exact buffer sample by sample. The
    SAME derivation backs wav_decode's DuckDB oracle
    (__spark_entry__) — change both together. Values stay in 1..127
    so DuckDB's UTF-8 md5(string) equals the byte md5."""
    rate = 8000 + (d % 8) * 1000
    n = 64 + d % 192
    pcm = bytes(1 + (d + i) % 127 for i in range(n))
    return rate, n, wav.encode_wav(rate, 1, 8, pcm)


def wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable proof the WAV codec is real: per doc_id,
    synthesize a ramp-PCM WAV, run it through encode -> REAL decode,
    and emit the decoded metadata + the md5 of the decoded PCM bytes;
    the oracle rebuilds the identical buffer with string_agg(chr(..))
    over a generated series, so a hash match certifies the decoder
    recovered the actual samples."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            rows = []
            for doc_id in pdf_b["doc_id"]:
                d = int(doc_id)
                _, _, payload = _synth_wav(d)
                rate, ch, bits, pcm = wav.decode_wav(payload)
                rows.append(
                    (
                        d,
                        rate,
                        ch,
                        len(pcm) // (ch * bits // 8),
                        hashlib.md5(pcm).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_channels", "n_samples",
                    "pcm_md5",
                ],
            )

    docs = _docs(spark, sf_dir).select("doc_id")
    return docs.mapInPandas(run, WAV_SCHEMA)


def _synth_y4m(d: int) -> tuple[int, int, int, bytes]:
    """Deterministic per-doc C420 Y4M clip: (w, h, n_frames, payload)
    with frame i filled with the constant 1 + (d + i) % 127. The SAME
    derivation backs y4m_frames' DuckDB oracle (__spark_entry__) —
    change both together."""
    w, h = 8 + 2 * (d % 4), 6 + 2 * (d % 3)
    n = 3 + d % 5
    fsize = w * h * 3 // 2
    frames = [bytes([1 + (d + i) % 127]) * fsize for i in range(n)]
    return w, h, n, y4m.encode_y4m(w, h, frames)


def y4m_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable proof frame extraction is real: per doc_id,
    synthesize a constant-frame Y4M clip, run it through encode ->
    REAL decode, and emit every frame's md5 — the oracle predicts each
    frame buffer analytically (repeat(chr(v_i), w*h*3/2))."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            rows = []
            for doc_id in pdf_b["doc_id"]:
                d = int(doc_id)
                _, _, _, payload = _synth_y4m(d)
                _, _, _, frames = y4m.decode_y4m(payload)
                for i, fr in enumerate(frames):
                    rows.append(
                        (d, i, hashlib.md5(fr).hexdigest(), len(fr))
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "frame_md5", "n_bytes"],
            )

    docs = _docs(spark, sf_dir).select("doc_id")
    return docs.mapInPandas(run, FRAME_SCHEMA)
