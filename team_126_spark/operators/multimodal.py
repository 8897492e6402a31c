"""Multimodal columns: image/audio/video as opaque `binary` + typed metadata.

The reference has no media processing; this is north-star surface for a
100 TB training-data pipeline. Design:

  - media rows: (media_id, kind, content binary, meta struct) — content is
    opaque; Spark shuffles/stores it without interpretation, so partition
    sizing is governed by `spark.sql.files.maxPartitionBytes` exactly as for
    any other column.
  - every transform is `mapInPandas`: executors stream Arrow record batches
    through Python, so peak memory is one batch of blobs, not a partition.
  - the actual codec step is isolated in `_decode_*` hooks: the container
    ships no PIL/librosa/ffmpeg, so the default implementation is a
    clearly-marked deterministic fake (feature = scattered byte histogram),
    and `decode_backend="real"` raises NotImplementedError until a codec
    library is wired in. The Spark-side plumbing — schemas, batch iteration,
    partitioning, output shapes — is real and tested either way.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
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

MEDIA_META = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("mime", StringType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("meta", MEDIA_META),
    ]
)

FEATURE_DIM = 32


def _fake_features(blob: bytes | None) -> list[float] | None:
    """Deterministic stand-in for a real decode+featurize: md5-scattered
    byte histogram, L2-normalized. STUB — replace via decode_backend."""
    if blob is None:
        return None
    v = np.zeros(FEATURE_DIM, dtype=np.float64)
    digest = hashlib.md5(blob).digest()
    for i, byte in enumerate(digest):
        v[byte % FEATURE_DIM] += 1.0 + (i % 3)
    n = float(np.linalg.norm(v))
    return [float(x) for x in (v / n if n else v)]


def extract_features(df: DataFrame, decode_backend: str = "fake") -> DataFrame:
    """media rows → (media_id, kind, n_bytes, feature array<float>[32]).

    mapInPandas: one Arrow batch of blobs in memory per task at a time.
    """
    if decode_backend == "real":
        raise NotImplementedError(
            "real image/audio decode needs PIL/librosa — not in this container"
        )

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("kind", StringType()),
            StructField("n_bytes", LongType()),
            StructField("feature", ArrayType(FloatType())),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
                    "feature": pdf["content"].map(_fake_features),
                }
            )

    return df.mapInPandas(gen, out_schema)


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video → one row per sampled frame index (frame_idx = 0, n, 2n, ...).

    Pure generator expression: explode(sequence()) over meta.n_frames — no
    Python in the hot path; frame decode itself belongs to extract_features
    on the per-frame rows.
    """
    n = F.coalesce(F.col("meta.n_frames"), F.lit(0))
    # CASE guards the sequence: ANSI mode rejects 0→-1 by +10 bounds
    idx = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(every_n))).otherwise(
        F.array().cast("array<int>")
    )
    return (
        df.filter(F.col("kind") == "video")
        .withColumn("frame_idx", F.explode(idx))
        .select("media_id", "frame_idx", "content", "meta")
    )


def resize_meta(df: DataFrame, max_side: int) -> DataFrame:
    """Compute the post-resize geometry (aspect-preserving, cap the longer
    side at `max_side`) as pure column arithmetic; the pixel op itself is a
    decode-backend concern. Null/zero dims pass through unchanged."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.when(
        (w.isNull()) | (h.isNull()) | (F.greatest(w, h) <= max_side), F.lit(1.0)
    ).otherwise(F.lit(float(max_side)) / F.greatest(w, h).cast("double"))
    return df.withColumn("resize_scale", F.round(scale, 6)).withColumn(
        "resized",
        F.struct(
            F.floor(w * scale).cast("int").alias("width"),
            F.floor(h * scale).cast("int").alias("height"),
        ),
    )
