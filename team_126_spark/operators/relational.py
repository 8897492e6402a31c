"""Relational operator compositions (SURVEY.md §2.2-2.6).

These are thin, deterministic wrappers over the DataFrame API — the point
is declared semantics (stable names, explicit tiebreaks) so every use is
oracle-checkable. Catalyst does the physical planning; nothing here forces
a shuffle beyond what the semantics require.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_group(df: DataFrame, keys: Sequence[str], ts: str, tiebreak: str) -> DataFrame:
    """One row per group: max ts, ties broken by max `tiebreak` (W5).

    Replaces the reference's N-queries-per-type loop
    (backend/health_api.py:285-304) with a single window — one shuffle on
    the group keys, no driver round trips.
    """
    w = Window.partitionBy(*keys).orderBy(F.desc(ts), F.desc(tiebreak))
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def topk_per_group(df: DataFrame, keys: Sequence[str], order: Sequence[Column], k: int) -> DataFrame:
    """Top-k rows per group under a deterministic order (W6/J2 pattern).

    `order` must end with a unique column so the selected set is stable.
    """
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k).drop("_rn")


def ordered_limit(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """ORDER BY ... LIMIT k with a required unique tiebreak (W1/W4/W7).

    The reference's insertion-order early exit (search_housing.py:67-68) is
    not a relational semantic; declared queries always order deterministically
    so limit() is comparable against the oracle. Catalyst turns this into
    TakeOrderedAndProject — no global sort materialization.
    """
    return df.orderBy(*order).limit(k)


def dedup_by_key(df: DataFrame, keys: Sequence[str], order: Sequence[Column]) -> DataFrame:
    """Deterministic dropDuplicates (A8): keep the first row per key under
    `order` (must be total within a key-group). dropDuplicates() itself is
    arrival-order dependent — never oracle-safe."""
    return topk_per_group(df, keys, order, 1)


def union_datasets(dfs: Sequence[DataFrame]) -> DataFrame:
    """Union heterogeneous sources by column name, null-filling gaps (U1)."""
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)


def conditional_count(cond: Column) -> Column:
    """COUNT(*) FILTER (WHERE cond) as a composable aggregate (A4/A7)."""
    return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")
