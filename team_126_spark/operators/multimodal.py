"""Multimodal columns: image/audio/video as opaque `binary` + typed metadata.

The reference has no media processing; this is north-star surface for a
100 TB training-data pipeline. Design:

  - media rows: (media_id, kind, content binary, meta struct) — content is
    opaque; Spark shuffles/stores it without interpretation, so partition
    sizing is governed by `spark.sql.files.maxPartitionBytes` exactly as for
    any other column.
  - every transform is `mapInPandas`: executors stream Arrow record batches
    through Python, so peak memory is one batch of blobs, not a partition.
  - the actual codec step is isolated in featurizer hooks: the default
    implementation is a clearly-marked deterministic fake (feature =
    scattered byte histogram) so every declared query stays
    oracle-checkable; `decode_backend="real"` decodes image blobs with
    Pillow WHEN IT IS IMPORTABLE (grayscale → 16×16 → 32-bin mean-pool,
    L2-normalized) and raises ModuleNotFoundError up front on the driver
    when it is not (this container ships no PIL/librosa/ffmpeg — the gated
    test is pytest.importorskip'd). Non-image kinds keep the fake
    featurizer under either backend: Pillow is an image codec. The
    Spark-side plumbing — schemas, batch iteration, partitioning, output
    shapes — is identical and tested either way.
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


def _real_image_features(blob: bytes | None) -> list[float] | None:
    """Pillow decode → grayscale 16×16 → 32-bin mean-pool, L2-normalized.

    Deterministic (fixed resample filter, no RNG); raises on undecodable
    bytes rather than guessing — a corrupt image in a curated corpus is a
    data bug, not a value."""
    if blob is None:
        return None
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(blob)).convert("L").resize((16, 16), Image.BILINEAR)
    px = np.asarray(img, dtype=np.float64).reshape(FEATURE_DIM, -1).mean(axis=1)
    n = float(np.linalg.norm(px))
    return [float(x) for x in (px / n if n else px)]


def extract_features(df: DataFrame, decode_backend: str = "fake") -> DataFrame:
    """media rows → (media_id, kind, n_bytes, feature array<float>[32]).

    mapInPandas: one Arrow batch of blobs in memory per task at a time.
    decode_backend="real" routes IMAGE rows through the Pillow featurizer
    (driver-side import check fails fast when Pillow is absent — better
    than one ImportError per executor task); audio/video blobs keep the
    fake featurizer under either backend until an audio/video codec is
    wired in.
    """
    if decode_backend == "real":
        import importlib.util

        if importlib.util.find_spec("PIL") is None:
            raise ModuleNotFoundError(
                "decode_backend='real' needs Pillow (pip install Pillow); "
                "this environment does not ship it — use the default "
                "decode_backend='fake' deterministic featurizer"
            )
    elif decode_backend != "fake":
        raise ValueError(f"unknown decode_backend {decode_backend!r}")

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("kind", StringType()),
            StructField("n_bytes", LongType()),
            StructField("feature", ArrayType(FloatType())),
        ]
    )
    real = decode_backend == "real"

    def featurize(kind: str, blob: bytes | None) -> list[float] | None:
        if real and kind == "image":
            return _real_image_features(blob)
        return _fake_features(blob)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
                    "feature": [
                        featurize(k, b) for k, b in zip(pdf["kind"], pdf["content"])
                    ],
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
