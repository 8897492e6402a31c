"""Health-analytics operator family (SURVEY.md §2.4/2.5/2.9), expressed
generically so the declared-query corpus can replay each on the driver's
synthetic tables.

Reference parity:
  - symptom trends groupBy            (backend/health_api.py:216-236)  → trends
  - adherence join + breakdown        (backend/health_api.py:517-555)  → adherence
  - latest vital per type (N queries) (backend/health_api.py:285-304)  → latest_per_group (relational.py)
  - reminder double-explode expansion (backend/health_api.py:478-497)  → expand_schedule
  - abnormal-vitals threshold rules   (backend/health_api.py:500-514)  → abnormal_flags

Every function takes an explicit `now` timestamp string — the reference
hardcodes utcnow(), which is quarantined per SURVEY.md §7.4.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .relational import conditional_count


def trends(
    df: DataFrame, group_col: str, value_col: str, ts_col: str, now: str, days: int
) -> DataFrame:
    """GROUP BY key → count / round(avg,1) / max over a trailing window (A1)."""
    start = F.to_timestamp(F.lit(now)) - F.expr(f"INTERVAL {days} DAYS")
    return (
        df.filter(F.col(ts_col) >= start)
        .groupBy(group_col)
        .agg(
            F.count("*").cast("bigint").alias("occurrences"),
            F.round(F.avg(value_col), 1).alias("avg_value"),
            F.max(value_col).alias("max_value"),
        )
    )


def adherence(
    fact: DataFrame,
    dim: DataFrame,
    join_key: str,
    status_col: str,
    ts_col: str,
    now: str,
    days: int,
    taken: str,
    missed: str,
) -> DataFrame:
    """30-day-window fact⋈dim status breakdown with percentage (J1+A7).

    dim is dimension-sized → broadcast join, no shuffle on the fact side.
    """
    start = F.to_timestamp(F.lit(now)) - F.expr(f"INTERVAL {days} DAYS")
    joined = fact.join(F.broadcast(dim), join_key, "inner").filter(
        (F.col(ts_col) >= start) & (F.col(ts_col) <= F.to_timestamp(F.lit(now)))
    )
    return joined.agg(
        F.count("*").cast("bigint").alias("total"),
        conditional_count(F.col(status_col) == taken).alias("n_taken"),
        conditional_count(F.col(status_col) == missed).alias("n_missed"),
        F.round(
            conditional_count(F.col(status_col) == taken) * 100.0
            / F.greatest(F.count("*"), F.lit(1)),
            1,
        ).alias("pct_taken"),
    )


def expand_schedule(df: DataFrame, key_col: str, start_date: str, n_days: int, times_col: str) -> DataFrame:
    """Double explode: key × next-n-days × reminder time → one row per slot
    (X1). Built-in generators only (explode(sequence()) — UDTF analog)."""
    days = F.explode(
        F.sequence(
            F.to_date(F.lit(start_date)),
            F.date_add(F.to_date(F.lit(start_date)), n_days - 1),
        )
    ).alias("day")
    out = df.select(F.col(key_col), F.col(times_col)).select(F.col(key_col), days, F.col(times_col))
    out = out.select(F.col(key_col), F.col("day"), F.explode(F.col(times_col)).alias("reminder_time"))
    return out.withColumn(
        "scheduled_at",
        F.to_timestamp(F.concat_ws(" ", F.col("day").cast("string"), F.col("reminder_time"))),
    )


def abnormal_flags(df: DataFrame, type_col: str, value_col: str, rules: dict[str, tuple[float, float]]) -> DataFrame:
    """Per-type threshold rules → is_abnormal flag (P18): chained F.when."""
    flag: Column = F.lit(False)
    for mtype, (lo, hi) in rules.items():
        flag = F.when(
            (F.col(type_col) == mtype) & (~F.col(value_col).between(lo, hi)), F.lit(True)
        ).otherwise(flag)
    return df.withColumn("is_abnormal", flag)


def dashboard_counts(dfs: dict[str, tuple[DataFrame, Column]]) -> DataFrame:
    """Multi-source scalar counts in ONE job (A5): each (df, predicate) is
    aggregated independently then cross-joined into a single 1-row frame —
    replaces the reference's sequential count queries."""
    outs = [
        df.agg(conditional_count(pred).alias(name)) for name, (df, pred) in dfs.items()
    ]
    result = outs[0]
    for other in outs[1:]:
        result = result.crossJoin(other)
    return result
