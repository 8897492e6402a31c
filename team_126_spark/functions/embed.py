"""Pluggable text embedder (V1) — the reference's Vertex AI
`text-embedding-004` call (reference: backend/embeddings.py:47-109) behind a
batched Arrow boundary.

The reference embeds row-at-a-time over HTTP with batch<=5 inside
`df.iterrows()` (the §4.2 anti-pattern). Here the embedder is a pandas UDF:
executors pull Arrow batches (thousands of rows), call the provider once per
batch, and stay out of the driver entirely — the design that survives 100 TB.

Providers are pluggable; the default is `HashEmbedder`, a deterministic
pure-Python stand-in (the real HTTP client is environment-specific and
non-deterministic, quarantined per SURVEY.md §7.4). Determinism lets both
pytest and the streaming pipeline assert exact values.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Protocol

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType


class Embedder(Protocol):
    dim: int

    def embed_batch(self, texts: pd.Series) -> pd.Series:  # pragma: no cover
        """texts -> Series of list[float] (len == dim); None for null text."""
        ...


class HashEmbedder:
    """Deterministic embedding: md5 of each whitespace token scattered into
    `dim` buckets with ±1 contributions, L2-normalized. Similar token
    multisets → similar vectors, so cosine-based operators behave sensibly
    in tests while staying 100% reproducible across machines."""

    def __init__(self, dim: int = 64):
        self.dim = dim

    def _one(self, text: str | None) -> list[float] | None:
        if text is None:
            return None
        v = np.zeros(self.dim, dtype=np.float64)
        for tok in text.lower().split():
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            v[h % self.dim] += 1.0 if (h >> 63) & 1 == 0 else -1.0
        n = float(np.linalg.norm(v))
        if n > 0:
            v /= n
        return [float(x) for x in v]

    def embed_batch(self, texts: pd.Series) -> pd.Series:
        return texts.map(self._one)


def embed_udf(embedder: Embedder | None = None):
    """Arrow-batched scalar pandas UDF: string column -> array<float>.

    Iterator form so a provider client (HTTP session, model handle) is
    constructed ONCE per executor python worker, not per batch.
    """
    emb = embedder or HashEmbedder()

    @F.pandas_udf(ArrayType(FloatType()))
    def _embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in batches:
            yield emb.embed_batch(texts)

    return _embed


def embed(col: Column, embedder: Embedder | None = None) -> Column:
    return embed_udf(embedder)(col)
