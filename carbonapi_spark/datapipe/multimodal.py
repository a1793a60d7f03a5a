"""Multimodal columns for training-data pipelines.

Images/audio/video ride as opaque ``BINARY`` columns with a typed metadata
struct; decode/feature-extraction runs in Arrow-batched ``mapInPandas``
(one Python crossing per batch, not per row). The actual codecs are NOT in
this container, so the decode kernels are deterministic STUBS behind
``decode_stub=True`` (and raise ``NotImplementedError`` otherwise) — the
Spark-side plumbing (schema, batch shape, partitioning) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),  # image | audio | video
    StructField("mime", StringType()),
    StructField("payload", BinaryType()),
    StructField("meta", StructType([
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("sample_rate", IntegerType()),
    ])),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("feature", ArrayType(DoubleType())),
])


def _stub_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake 'embedding': byte histogram folded to `dim`.
    Stands in for a real decoder+encoder; same payload -> same vector."""
    if payload is None:
        return np.zeros(dim)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(float)
    norm = np.linalg.norm(hist)
    return hist / norm if norm > 0 else hist


def extract_features(media: DataFrame, dim: int = 16,
                     decode_stub: bool = True,
                     decode=None) -> DataFrame:
    """Decode + feature-extract each media row via mapInPandas.

    ``decode`` is the pluggable codec boundary: a picklable callable
    ``(payload: bytes | None, kind: str) -> sequence[float]`` shipped to the
    executors inside the mapInPandas closure — this is where a user wires
    PIL / torchaudio / ffmpeg outside this container. Without one, the
    deterministic byte-histogram stub runs (``decode_stub=True``), and
    ``decode_stub=False`` raises to make the missing-codec boundary
    explicit rather than silently fake.
    """
    if decode is None:
        if not decode_stub:
            raise NotImplementedError(
                "real image/audio decoding requires codec libraries not "
                "present in this container; pass decode= or decode_stub=True")
        decode = lambda payload, kind: _stub_feature(payload, dim).tolist()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [list(map(float, decode(p, k)))
                     for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [0 if p is None else len(p) for p in pdf["payload"]],
                "feature": feats,
            })

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame to decode.
    The explode happens JVM-side; the (stubbed) decode would consume it."""
    n_frames = (F.coalesce(F.col("meta.duration_ms"), F.lit(0)) / every_ms) \
        .cast("int")
    return (media.where(F.col("kind") == "video")
            .withColumn("frame_idx",
                        F.explode(F.sequence(F.lit(0),
                                             F.greatest(n_frames - 1, F.lit(0)))))
            .select("media_id", "frame_idx",
                    (F.col("frame_idx") * every_ms).alias("frame_ms"),
                    "payload"))


def synth_media(spark, n: int = 32) -> DataFrame:
    """Deterministic synthetic media table for tests (no real codecs)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = bytes((i * 7 + j) % 251 for j in range(64 + i))
        rows.append((i, kind, f"application/x-{kind}", payload,
                     (64, 48, 4000, 16000)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
