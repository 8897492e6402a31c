"""Sources & sinks (SURVEY.md §2.1, S1–S5).

Reference parity:
  - S1 CSV with utf-8-sig BOM + header  (backend/import_datasets.py:24-27)
  - S2 header cleanup (strip ws + BOM)  (backend/import_datasets.py:32)
  - S3 whole-file JSON: list-of-records (backend/tools/dataset_search.py:76-77)
       and metadata/summary/data envelope (backend/convert_housing_to_json.py:72-81)
  - S4 batched DB sink                  (backend/import_datasets.py:65-76)
  - S5 denormalized JSON sink           (backend/datasets/convert_csv_to_json.py:62-63)

Design stance: schemas are always EXPLICIT (`inferSchema` never used) —
the reference's fixed-schema discipline (§1.4), and at 100 TB an inference
pass over the input is an extra full scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

BOM = "﻿"


def clean_headers(df: DataFrame) -> DataFrame:
    """S2: strip whitespace and BOM from every column name."""
    return df.toDF(*[c.replace(BOM, "").strip() for c in df.columns])


def read_csv_bom(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """S1: header CSV; utf-8-sig BOM survives as a prefix on the first
    header, removed by clean_headers. With an explicit schema the header
    row is still consumed but names come from the schema."""
    reader = spark.read.option("header", "true").option("encoding", "UTF-8")
    df = reader.schema(schema).csv(path) if schema is not None else reader.csv(path)
    return clean_headers(df)


def read_json_records(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """S3a: whole-file JSON array of records (multiLine)."""
    reader = spark.read.option("multiLine", "true")
    return reader.schema(schema).json(path) if schema is not None else reader.json(path)


def read_json_envelope(
    spark: SparkSession, path: str, data_field: str = "data"
) -> DataFrame:
    """S3b: {metadata, summary, data: [...]} envelope → one row per record
    (the housing JSON shape, HOUSING_JSON_README.md:14-60)."""
    env = spark.read.option("multiLine", "true").json(path)
    return env.select(F.explode(F.col(data_field)).alias("_r")).select("_r.*")


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S5: JSON lines sink. The reference writes one pretty-printed file;
    distributed output is line-delimited per partition — same records,
    scale-safe format."""
    df.write.mode(mode).json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
) -> None:
    """Primary sink. `partition_by` gives partition pruning on the listed
    columns (the engine's substitute for the reference's B-tree indexes,
    §2.1 S7); `sort_by` sorts within partitions so parquet min/max row-group
    stats prune point lookups (Z-order analog for one key)."""
    out = df.sortWithinPartitions(*sort_by) if sort_by else df
    w = out.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_jdbc(
    df: DataFrame, url: str, table: str, mode: str = "append", batchsize: int = 10_000, **options
) -> None:
    """S4: JDBC sink. Spark batches inserts natively (`batchsize` per round
    trip) — replaces the reference's commit-every-100 loop. Untestable in
    this environment (no DB); thin passthrough by design."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .options(**options)
        .mode(mode)
        .save()
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (S7 index substitute, scale path): two tables
    bucketed by the same key into the same bucket count join WITHOUT a
    shuffle — the planner aligns bucket files instead of exchanging rows.
    This is the co-located-join layout for repeated FK joins at 100 TB
    (pre-pay one shuffle at write time, reuse it on every read)."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
