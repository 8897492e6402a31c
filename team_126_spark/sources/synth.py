"""Synthetic corpus generator as a Spark 4 Python DataSource (S9).

`spark.read.format("synthdocs").option("rows", N).option("partitions", P)`
yields a deterministic documents-shaped table (doc_id, text, lang, source,
n_chars) with NO input files: every partition generates its own doc_id
range independently on its executor from md5(seed, doc_id) alone, so the
source scales to any row count with zero driver state, zero I/O, and
perfect reproducibility — the scale-testing companion to the fixed
sf* fixtures (drive a 10^9-row dedup/curation run without writing 100 TB
of parquet first).

This is also the repo's demonstration of engine EXTENSIBILITY: the
reference hard-codes its ingest paths (backend/import_datasets.py); the
Spark-native answer is the pluggable DataSource API — partitions() defines
the parallelism contract, read(partition) streams rows executor-side.
The row recipe is an md5 word-chain over a fixed vocabulary with planted
exact duplicates (every `dup_every`-th doc repeats the text of the doc
`dup_every` before it), so dedup operators have guaranteed positives at
any scale.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"

_VOCAB = (
    "spark query table row column scan filter join agg window hash merge "
    "batch stream part value data small fast slow order key line customer "
    "the a index sort"
).split()
_LANGS = ("en", "es", "fr")


def _doc(seed: int, doc_id: int, min_tokens: int, max_tokens: int) -> tuple:
    h = hashlib.md5(f"{seed}:{doc_id}".encode()).digest()
    n = min_tokens + int.from_bytes(h[:4], "big") % (max_tokens - min_tokens + 1)
    words = []
    state = h
    for i in range(n):
        if i % 16 == 0 and i:
            state = hashlib.md5(state).digest()
        words.append(_VOCAB[(state[i % 16] + i) % len(_VOCAB)])
    text = " ".join(words)
    return (
        doc_id,
        text,
        _LANGS[h[4] % len(_LANGS)],
        f"src{h[5] % 5}",
        len(text),
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SynthDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", "1000"))
        self.parts = max(1, int(options.get("partitions", "8")))
        self.seed = int(options.get("seed", "0"))
        self.min_tokens = int(options.get("min_tokens", "40"))
        self.max_tokens = int(options.get("max_tokens", "120"))
        self.dup_every = int(options.get("dup_every", "10"))
        if self.rows < 0:
            raise ValueError(f"rows must be >= 0, got {self.rows}")
        if not 0 < self.min_tokens <= self.max_tokens:
            raise ValueError(
                f"need 0 < min_tokens <= max_tokens, got {self.min_tokens}, {self.max_tokens}"
            )

    def partitions(self):
        per = -(-self.rows // self.parts)  # ceil; last partition may be short
        return [
            _RangePartition(i * per, min((i + 1) * per, self.rows))
            for i in range(self.parts)
            if i * per < self.rows
        ] or [_RangePartition(0, 0)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            # planted exact duplicate: every doc_id ≡ dup_every-1 (mod
            # dup_every) repeats the text of its block's FIRST doc (a
            # non-copy, so copies never chain) with its own metadata —
            # guaranteed dedup positives at any scale
            base = doc_id
            if self.dup_every > 1 and doc_id % self.dup_every == self.dup_every - 1:
                base = doc_id - (doc_id % self.dup_every)
            row = _doc(self.seed, base, self.min_tokens, self.max_tokens)
            if base != doc_id:
                h = hashlib.md5(f"{self.seed}:{doc_id}".encode()).digest()
                row = (doc_id, row[1], _LANGS[h[4] % len(_LANGS)], f"src{h[5] % 5}", row[4])
            else:
                row = (doc_id, *row[1:])
            yield row


class SynthDocsDataSource(DataSource):
    """format("synthdocs") — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SynthDocsReader:
        return SynthDocsReader(self.options)


def register(spark) -> None:
    """Idempotent format registration: spark.read.format('synthdocs')."""
    spark.dataSource.register(SynthDocsDataSource)


class SynthVecsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", "1000"))
        self.parts = max(1, int(options.get("partitions", "8")))
        self.seed = int(options.get("seed", "0"))
        self.dim = int(options.get("dim", "64"))
        self.labels = int(options.get("labels", "10"))
        if self.rows < 0 or self.dim <= 0 or self.labels <= 0:
            raise ValueError("rows must be >= 0 and dim/labels positive")

    def partitions(self):
        per = -(-self.rows // self.parts)
        return [
            _RangePartition(i * per, min((i + 1) * per, self.rows))
            for i in range(self.parts)
            if i * per < self.rows
        ] or [_RangePartition(0, 0)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        import numpy as np

        for vec_id in range(partition.start, partition.end):
            h = hashlib.md5(f"v{self.seed}:{vec_id}".encode()).digest()
            label = h[0] % self.labels
            # cluster structure: a label-anchored direction + per-vector
            # noise, so ANN/k-means actually have geometry to find
            rng = np.random.default_rng(int.from_bytes(h[4:12], "big"))
            anchor_rng = np.random.default_rng(self.seed * 1_000_003 + label)
            v = anchor_rng.standard_normal(self.dim) + 0.35 * rng.standard_normal(self.dim)
            v = (v / np.linalg.norm(v)).astype("float32")
            yield (vec_id, [float(x) for x in v], int(label))


class SynthVecsDataSource(DataSource):
    """format("synthvecs") — embeddings-shaped (vec_id, embedding, label)
    table generated executor-side: unit-norm float32 vectors with planted
    label-cluster geometry (anchor + noise), matching the fixtures'
    embeddings schema. Same zero-I/O scale story as synthdocs."""

    @classmethod
    def name(cls) -> str:
        return "synthvecs"

    def schema(self) -> str:
        return "vec_id bigint, embedding array<float>, label int"

    def reader(self, schema) -> SynthVecsReader:
        return SynthVecsReader(self.options)


def register_vecs(spark) -> None:
    """Idempotent format registration: spark.read.format('synthvecs')."""
    spark.dataSource.register(SynthVecsDataSource)
