"""Structured search pipelines (reference entry points re-expressed as one
Catalyst plan each).

  - housing_search: multi-filter parcel search (backend/search_housing.py:12-70)
  - dataset_search: keyword-routed multi-source geo search
    (backend/tools/dataset_search.py:32-101): source pruning (P14) →
    union (U1) → haversine miles (F2) → nulls-last sort (W3) → limit
  - hybrid search lives in operators/vector.hybrid_search
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.geo import haversine_miles
from .relational import ordered_limit, union_datasets


def housing_search(
    df: DataFrame,
    *,
    query: str | None = None,
    jurisdiction: str | None = None,
    vacancy_status: str | None = None,
    zoning_type: str | None = None,
    min_units: int | None = None,
    max_units: int | None = None,
    limit: int = 20,
    order_key: str = "objectid",
    text_col: str = "searchable_text",
) -> DataFrame:
    """Conjunctive multi-filter search with deterministic ordered limit.

    Filters compose as P7 (case-insensitive eq), P8 (exact eq), P9 (range),
    P10 (substring). Catalyst reorders the conjunction and pushes it to the
    scan; the ordered limit becomes TakeOrderedAndProject.
    """
    cond: Column = F.lit(True)
    if query:
        cond &= F.col(text_col).contains(query.lower())
    if jurisdiction:
        cond &= F.lower(F.col("jurisdiction")) == jurisdiction.lower()
    if vacancy_status:
        cond &= F.col("vacancy") == vacancy_status
    if zoning_type:
        cond &= F.lower(F.col("zoning_simplified")) == zoning_type.lower()
    if min_units is not None:
        cond &= F.col("units") >= min_units
    if max_units is not None:
        cond &= F.col("units") <= max_units
    return ordered_limit(df.filter(cond), [F.col(order_key).asc()], limit)


KEYWORD_ROUTES = {
    # query keyword → source name (P14; dataset_search.py:48-62)
    "health": "healthcare",
    "clinic": "healthcare",
    "doctor": "healthcare",
    "shelter": "shelters",
    "housing": "shelters",
    "sleep": "shelters",
    "food": "food_banks",
    "meal": "food_banks",
    "hungry": "food_banks",
}


def route_sources(query: str, sources: dict[str, DataFrame]) -> list[DataFrame]:
    """Driver-side source pruning: scan only datasets whose keywords match —
    the partition-pruning analog of the reference's keyword routing."""
    q = query.lower()
    picked = {name for kw, name in KEYWORD_ROUTES.items() if kw in q}
    chosen = [df for name, df in sources.items() if name in picked] or list(sources.values())
    return chosen


def dataset_search(
    sources: dict[str, DataFrame],
    query: str,
    user_lat: float | None,
    user_lon: float | None,
    limit: int = 10,
    id_col: str = "id",
) -> DataFrame:
    """Keyword-route → unionByName → haversine miles → nulls-last sort → limit."""
    chosen = route_sources(query, sources)
    unioned = union_datasets(chosen)
    if user_lat is not None and user_lon is not None:
        dist = F.round(
            haversine_miles(F.lit(user_lat), F.lit(user_lon), F.col("lat"), F.col("lon")), 2
        )
        unioned = unioned.withColumn(
            "distance_miles",
            F.when(F.col("lat").isNotNull() & F.col("lon").isNotNull(), dist),
        )
        return ordered_limit(
            unioned, [F.asc_nulls_last("distance_miles"), F.col(id_col).asc()], limit
        )
    return ordered_limit(unioned, [F.col(id_col).asc()], limit)
