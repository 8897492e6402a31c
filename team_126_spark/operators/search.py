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

from ..functions.geo import KM_TO_MILES, haversine_miles
from .relational import ordered_limit, union_datasets
from .vector import hybrid_search


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


def hybrid_search_response(
    services: DataFrame,
    stops: DataFrame,
    query_vec: list[float],
    latitude: float,
    longitude: float,
    *,
    query: str = "",
    max_distance_km: float = 10.0,
    limit: int = 5,
    semantic_weight: float = 0.7,
    candidate_factor: int | None = 3,
    transit_k: int = 3,
    transit_max_km: float = 1.0,
    id_col: str = "id",
    vec_col: str = "embedding",
    lat_col: str = "latitude",
    lon_col: str = "longitude",
    detail_cols: tuple[str, ...] = ("program", "address", "phone"),
) -> dict:
    """The full /search/health-services response (HYBRID_SEARCH_SETUP.md:
    311-348; endpoint backend/main.py:428-480): hybrid geo+semantic top-k
    over services, each result carrying its nearby_transit list, distances
    in km AND miles, all assembled into the golden JSON shape.

    One Catalyst plan end-to-end — hybrid_search (radius → over-fetch
    limit*candidate_factor → rescore → fused top-k) feeds knn_join_nested
    (grid equi-join, per-service top-transit_k) — then ONE bounded driver
    collect of `limit` rows to build the response document, exactly the
    role of the reference's HTTP serializer.
    """
    from .geo import knn_join_nested

    top = hybrid_search(
        services,
        vec_col,
        query_vec,
        latitude,
        longitude,
        max_distance_km,
        limit,
        id_col,
        lat=lat_col,
        lon=lon_col,
        weight=semantic_weight,
        candidate_factor=candidate_factor,
    )
    # Keep stop lat/lon in the output payload (knn_join consumes the join
    # coords): expose them as plain columns under their golden names.
    stops_payload = stops.select(
        F.col("stop_uid"),
        F.col("stop_name").alias("name"),
        F.col("stop_lat"),
        F.col("stop_lon"),
        F.col("stop_lat").alias("s_latitude"),
        F.col("stop_lon").alias("s_longitude"),
        F.col("stop_agency").alias("agency"),
        (F.col("wheelchair_boarding") == "1").alias("wheelchair_accessible"),
    )
    nested = knn_join_nested(
        top.select(id_col, lat_col, lon_col),
        stops_payload,
        id_col,
        "stop_uid",
        transit_max_km,
        transit_k,
        left_lat=lat_col,
        left_lon=lon_col,
        right_lat="stop_lat",
        right_lon="stop_lon",
    ).select(id_col, "nearby")
    enriched = top.join(nested, id_col, "left")

    rows = enriched.orderBy(F.desc("combined_score"), F.col(id_col).asc()).collect()
    results = []
    for r in rows:
        results.append(
            {
                "id": r[id_col],
                "latitude": r[lat_col],
                "longitude": r[lon_col],
                **{c: r[c] for c in detail_cols},
                "distance_km": round(r["distance_km"], 2),
                "distance_miles": round(r["distance_km"] * KM_TO_MILES, 2),
                "similarity_score": round(r["similarity"], 4),
                "combined_score": round(r["combined_score"], 4),
                "nearby_transit": [
                    {
                        "name": t["nn_name"],
                        "latitude": t["nn_s_latitude"],
                        "longitude": t["nn_s_longitude"],
                        "agency": t["nn_agency"],
                        "wheelchair_accessible": t["nn_wheelchair_accessible"],
                        "distance_km": round(t["distance_km"], 2),
                        "distance_miles": round(t["distance_km"] * KM_TO_MILES, 2),
                    }
                    for t in (r["nearby"] or [])
                ],
            }
        )
    return {
        "user_location": {"latitude": latitude, "longitude": longitude},
        "query": query,
        "search_radius_km": max_distance_km,
        "search_radius_miles": round(km_to_miles_f(max_distance_km), 2),
        "results": results,
        "count": len(results),
    }


def km_to_miles_f(km: float) -> float:
    """Scalar km→miles (F3) for driver-side response fields."""
    return km * KM_TO_MILES


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


# Safe-sleep option routing (tools/safe_places_to_sleep.py:104-145): which
# source categories each include_type fans out to, with the reference's
# per-category descriptions.
SAFE_SLEEP_CATEGORIES = {
    "safe_parking": "Safe parking lot for overnight vehicle sleeping",
    "facilities_24h": "24-hour facility offering safe indoor space",
    "parks": "Well-lit public parks with good visibility",
    "transit_hubs": "Transit hub with 24-hour access and seating",
}

# Weather-conditional advisories (tools/safe_places_to_sleep.py:180-197).
WEATHER_RECOMMENDATIONS = {
    "rain": "Rain Advisory: prioritize covered areas - stations, overpasses, indoor 24-hour facilities.",
    "heat": "Heat Advisory: seek shade and air-conditioned facilities; stay hydrated.",
    "cold": "Cold Advisory: prioritize heated indoor facilities or warming centers; call 211.",
    "clear": "Clear Night: multiple options available; focus on well-lit, populated areas.",
}
WEATHER_FALLBACK = "Stay safe and seek well-lit, populated areas."


def safe_sleep_search(
    sources: dict[str, DataFrame],
    user_lat: float,
    user_lon: float,
    include_type: str = "all",
    weather: str = "clear",
    max_distance_miles: float = 3.0,
    limit: int = 10,
    id_col: str = "id",
) -> DataFrame:
    """Safe-sleep option search (tools/safe_places_to_sleep.py:199-236),
    engine-side: instead of N external web searches per category, the typed
    source tables are category-pruned (include_type routing table), union-
    tagged, radius-filtered on haversine miles (F2), and distance-ordered —
    with the weather advisory attached as a constant column. The external
    geocode/web lookups stay quarantined behind sources/external.py (§7.4).

    Source pruning happens before the scan (driver-side routing like
    route_sources) — at scale each category is a partition of the layout,
    so include_type becomes partition pruning."""
    if include_type != "all" and include_type not in SAFE_SLEEP_CATEGORIES:
        raise ValueError(f"include_type must be 'all' or one of {sorted(SAFE_SLEEP_CATEGORIES)}")
    picked = [
        (name, desc)
        for name, desc in SAFE_SLEEP_CATEGORIES.items()
        if include_type in ("all", name) and name in sources
    ]
    tagged = [
        sources[name]
        .withColumn("option_type", F.lit(name))
        .withColumn("category", F.lit(desc))
        for name, desc in picked
    ]
    if not tagged:
        raise ValueError("no sources match include_type")
    unioned = union_datasets(tagged)
    dist = F.round(
        haversine_miles(F.lit(user_lat), F.lit(user_lon), F.col("lat"), F.col("lon")), 2
    )
    rec = WEATHER_RECOMMENDATIONS.get(weather, WEATHER_FALLBACK)
    return ordered_limit(
        unioned.withColumn("distance_miles", dist)
        .filter(F.col("distance_miles") <= max_distance_miles)
        .withColumn("weather_recommendation", F.lit(rec)),
        [F.asc("distance_miles"), F.col(id_col).asc()],
        limit,
    )
