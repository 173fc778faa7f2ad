"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

The Spark-side plumbing (schema, partition sizing, Arrow-batched UDF
signatures) is real and tested; the actual media decode is stubbed behind
``NotImplementedError`` / a deterministic fake because the image/audio
libraries are not in this container. Swapping the stub for PIL/ffmpeg is a
one-function change — the distributed shape does not move.

Scale notes: media payloads dominate row size, so operations keep the binary
column OUT of shuffles (stats/decodes are map-side ``mapInPandas``; joins
carry only ids + metadata). ``spark.sql.files.maxPartitionBytes`` should be
tuned down (e.g. 64 MB) when payload rows are MBs each.
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

#: Canonical media column pair: payload + typed metadata struct.
MEDIA_SCHEMA = StructType(
    [
        StructField("content", BinaryType()),
        StructField(
            "media_meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("n_bytes", LongType()),
                ]
            ),
        ),
    ]
)


def attach_media(df: DataFrame, text_col: str = "text", mime: str = "application/octet-stream") -> DataFrame:
    """Test/demo helper: wrap a text column as an opaque binary payload with
    metadata — exercises the exact schema a real image/audio column uses."""
    content = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("content", content).withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(content).cast("long").alias("n_bytes"),
        ),
    )


def media_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Byte length + sha256 digest per payload — pure column expressions."""
    return df.select(
        F.col(id_col),
        F.length(F.col("content")).cast("long").alias("n_bytes"),
        F.sha2(F.col("content"), 256).alias("sha256"),
    )


_DECODE_SCHEMA = "doc_id long, width int, height int, n_pixels long"


def decode_image_batches(df: DataFrame, id_col: str = "doc_id", fake: bool = True) -> DataFrame:
    """Decode image payloads → (id, width, height, n_pixels) via mapInPandas.

    ``fake=True`` derives deterministic dimensions from the byte length so
    the distributed path is testable without codecs; ``fake=False`` raises
    until a real decoder (PIL) is wired in.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image decode requires PIL; wire it here"
                )
            n = pdf["content"].map(len)
            width = (n % 640 + 1).astype("int32")
            height = (n % 480 + 1).astype("int32")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": width,
                    "height": height,
                    "n_pixels": (width * height).astype("int64"),
                }
            )

    return df.select(id_col, "content").mapInPandas(run, _DECODE_SCHEMA)


_RESIZE_SCHEMA = "doc_id long, width int, height int, content binary"


def resize_images(
    df: DataFrame, width: int, height: int, id_col: str = "doc_id", fake: bool = True
) -> DataFrame:
    """Resize payloads to (width, height) via mapInPandas.

    Deterministic fake: truncate/pad the byte stream to width·height bytes
    (stands in for a real resampler; the distributed shape — binary in,
    binary out, no shuffle — is the real contract). ``fake=False`` raises
    until PIL is wired in.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real resize requires PIL; wire it here")
            out = [
                (bytes(payload) + b"\x00" * n)[:n] for payload in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": width,
                    "height": height,
                    "content": out,
                }
            )

    return df.select(id_col, "content").mapInPandas(run, _RESIZE_SCHEMA)


_FRAME_SCHEMA = "doc_id long, frame_idx int, frame binary"


def sample_frames(
    df: DataFrame, n_frames: int = 4, id_col: str = "doc_id", fake: bool = True
) -> DataFrame:
    """Sample ``n_frames`` evenly spaced frames per video payload.

    One input row fans out to ``n_frames`` rows (id, frame_idx, frame) —
    the shape a frame-level feature extractor consumes. Deterministic fake:
    equal byte slices stand in for decoded frames; ``fake=False`` raises
    until ffmpeg/av is wired in.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real frame sampling requires av/ffmpeg")
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["content"]):
                data = bytes(payload)
                step = max(1, len(data) // n_frames)
                for i in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(data[i * step : (i + 1) * step] or b"\x00")
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, "content").mapInPandas(run, _FRAME_SCHEMA)


_FEATURE_SCHEMA = "doc_id long, feature array<float>"


def extract_features(df: DataFrame, id_col: str = "doc_id", dim: int = 8, fake: bool = True) -> DataFrame:
    """Feature-extract payloads → fixed-dim float vector via mapInPandas.

    Deterministic fake: first ``dim`` byte histogram buckets, normalized.
    Real extractor (a vision model) would slot into the same signature.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not fake:
                raise NotImplementedError("real feature extraction not wired in")
            feats = []
            for payload in pdf["content"]:
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype("float32")
                total = hist.sum() or 1.0
                feats.append((hist / total).tolist())
            yield pd.DataFrame({"doc_id": pdf[id_col], "feature": feats})

    return df.select(id_col, "content").mapInPandas(run, _FEATURE_SCHEMA)
