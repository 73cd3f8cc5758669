"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns plus typed metadata structs;
all heavy per-item work (decode, resize, frame-sample, feature
extraction) runs in Arrow-batched ``mapInPandas`` so executors stream
record batches without per-row Python overhead.  The actual codec calls
are STUBBED (the container ships no PIL/ffmpeg): ``decode_stub``
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake "decode" (md5-derived dimensions/features) keeps the
Spark-side plumbing — schema, batch iteration, partitioning — fully
real and testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = md5-chained bytes."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        payload = hashlib.md5(f"media{seed}_{i}".encode()).digest() * (1 + i % 7)
        kind = kinds[i % 3]
        rows.append((i, kind, bytearray(payload), f"application/x-fake-{kind}", len(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_stub(payload: bytes, kind: str, fake: bool = False) -> dict:
    """Codec boundary. Real decoders (PIL/soundfile/av) are not available
    in this container — plug them in here."""
    if not fake:
        raise NotImplementedError(
            "media decoding requires PIL/ffmpeg, not shipped in this environment; "
            "pass fake=True for the deterministic test double"
        )
    h = hashlib.md5(payload).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    feature = [((b / 255.0) * 2.0 - 1.0) for b in h]  # 16-dim deterministic
    return {"width": width, "height": height, "feature": feature}


def extract_features(media: DataFrame, fake: bool = True, batch_size_hint: int | None = None) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_stub(bytes(p), k, fake=fake) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "feature": [d["feature"] for d in decoded],
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Deterministic "frame sampling" over video payload chunks: splits
    the payload into 16-byte frames JVM-side and keeps every n-th —
    demonstrates binary slicing without Python."""
    n_frames = (F.length("payload") / 16).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
    frames = F.transform(
        F.filter(idx, lambda i: i % every_n == 0),
        lambda i: F.substring(F.col("payload"), (i * 16 + 1).cast("int"), 16),
    )
    return media.filter(F.col("kind") == "video").select(
        "media_id", frames.alias("frames"), F.size(frames).alias("n_sampled")
    )
