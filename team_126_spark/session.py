"""SparkSession builder with scale-aware defaults.

Local mode is a correctness substrate only; every conf here is chosen to
also make sense on a 1000-executor cluster:
  - AQE on (runtime partition coalescing + skew-join splitting),
  - Arrow on (vectorized pandas-UDF boundary),
  - UTC session timezone (oracle comparability; DuckDB timestamps are
    UTC-naive),
  - shuffle partitions sized to cores locally; on a real cluster AQE
    re-coalesces from an intentionally high initial number.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession


def cpu_count() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "") or os.cpu_count() or 8)
    except ValueError:
        return 8


def configure(builder: SparkSession.Builder, shuffle_partitions: int | None = None) -> SparkSession.Builder:
    """Apply engine defaults to any builder (also used on driver-provided sessions' conf)."""
    n = shuffle_partitions or cpu_count()
    return (
        builder.config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # managed tables (bucketed layouts) land in /tmp, never the repo
        .config(
            "spark.sql.warehouse.dir",
            os.path.join(tempfile.gettempdir(), "team_126_spark_warehouse"),
        )
    )


def get_spark(app_name: str = "team_126_spark") -> SparkSession:
    """Build (or reuse) the engine session on local[N]."""
    builder = SparkSession.builder.master(f"local[{cpu_count()}]").appName(app_name)
    spark = configure(builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_session(spark: SparkSession) -> SparkSession:
    """Best-effort runtime tuning for an externally created session (e.g. the
    driver's). Only sets confs that are mutable at runtime."""
    for key, value in [
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.shuffle.partitions", str(cpu_count())),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
    ]:
        try:
            spark.conf.set(key, value)
        except Exception:
            pass  # immutable conf on this session — keep going
    return spark
