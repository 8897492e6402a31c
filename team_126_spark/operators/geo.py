"""Geo operators: radius filter, radius top-k, per-group k-NN enrichment.

Reference parity:
  - radius candidate query (backend/hybrid_search.py:62-102)
  - nearest-transit-per-service N+1 loop (backend/main.py:467-475 +
    hybrid_search.py:200-268) → ONE per-group-top-k join here.

Scale design: the naive radius join is a cross product. `knn_join`
prefilters with a deterministic grid-cell equi-join (cell + 8 neighbors)
before the exact haversine refine, so the shuffle key is the cell id and
the cross product is bounded by cell occupancy. At 100 TB both sides
hash-partition by cell — no broadcast required; for small right sides
(dimension-sized, like 6k transit stops) we broadcast instead and skip the
shuffle entirely.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.geo import geohash_cell, haversine_km
from ..tables import spread
from .relational import topk_per_group


def radius_filter(
    df: DataFrame, lat: str, lon: str, probe_lat: float, probe_lon: float, max_km: float
) -> DataFrame:
    """Rows within `max_km` of a probe point, with a `distance_km` column.

    Adds a bounding-box prefilter (sargable: plain comparisons on the lat/lon
    columns, pushed to the parquet scan as min/max pruning) before the exact
    haversine — the rewrite SURVEY.md §4.3 calls out. 1 deg lat = ~111.045 km
    at the reference's R=6371. The longitude half-width is deg/cos(lat) taken
    at the poleward edge of the latitude band (driver-side scalar, still
    sargable), so the box stays a true cover at any latitude; within ~0.6° of
    a pole cos → 0 and we skip the longitude cut entirely.
    """
    deg = max_km / 111.045
    lat_edge = min(abs(probe_lat) + deg, 90.0)
    cos_edge = math.cos(math.radians(lat_edge))
    boxed = df.filter(F.col(lat).between(probe_lat - deg, probe_lat + deg))
    if cos_edge > 0.01:  # near a pole every longitude is in range — lat cut suffices
        lon_deg = min(deg / cos_edge, 360.0)
        boxed = boxed.filter(F.col(lon).between(probe_lon - lon_deg, probe_lon + lon_deg))
    dist = haversine_km(F.lit(probe_lat), F.lit(probe_lon), F.col(lat), F.col(lon))
    return boxed.withColumn("distance_km", dist).filter(F.col("distance_km") <= max_km)


def radius_topk(
    df: DataFrame,
    lat: str,
    lon: str,
    probe_lat: float,
    probe_lon: float,
    max_km: float,
    k: int,
    tiebreak: str,
) -> DataFrame:
    """Nearest-k within radius, ordered by distance with unique tiebreak (J3/W1)."""
    return (
        radius_filter(df, lat, lon, probe_lat, probe_lon, max_km)
        .orderBy(F.col("distance_km").asc(), F.col(tiebreak).asc())
        .limit(k)
    )


def knn_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    max_km: float,
    k: int,
    left_lat: str = "lat",
    left_lon: str = "lon",
    right_lat: str = "lat",
    right_lon: str = "lon",
    broadcast_right: bool = True,
    min_cos_lat: float = 0.7,
) -> DataFrame:
    """For each left row: the k nearest right rows within max_km (J2/W6).

    Output: all left columns + right columns prefixed `nn_` + distance_km.
    Grid-cell equi-join prefilter → exact haversine refine → per-left-key
    top-k window. Cell size is chosen so a radius-r disk intersects at most
    the 3×3 neighborhood of the probe's cell — including the longitude
    dimension, where a degree spans only 111.045*cos(lat) km. The default
    min_cos_lat=0.7 keeps the cover exact up to ~45° latitude; lower it for
    higher-latitude data.
    """
    cell_deg = max(max_km / (111.045 * min_cos_lat), 1e-6)

    lcell = geohash_cell(F.col(left_lat), F.col(left_lon), cell_deg)
    rcell = geohash_cell(F.col(right_lat), F.col(right_lon), cell_deg)

    # Left side explodes to its 3x3 cell neighborhood; right side keeps its
    # own cell → equi-join on cell covers every pair within max_km.
    neighbors = F.array(
        *[lcell + F.lit(dy * 1_000_000 + dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    )
    l = spread(left, left_key).withColumn("_cell", F.explode(neighbors))
    r = right.select(
        rcell.alias("_cell"),
        F.col(right_key).alias("nn_" + right_key),
        F.col(right_lat).alias("_nn_lat"),
        F.col(right_lon).alias("_nn_lon"),
        *[
            F.col(c).alias("nn_" + c)
            for c in right.columns
            if c not in (right_key, right_lat, right_lon)
        ],
    )
    if broadcast_right:
        r = F.broadcast(r)

    dist = haversine_km(F.col(left_lat), F.col(left_lon), F.col("_nn_lat"), F.col("_nn_lon"))
    paired = (
        l.join(r, "_cell")
        .withColumn("distance_km", dist)
        .filter(F.col("distance_km") <= max_km)
        .drop("_cell", "_nn_lat", "_nn_lon")
    )
    # The neighborhood explode can produce the same (left, right) pair at most
    # once per cell because the right row lives in exactly one cell — no dedup
    # needed before ranking.
    return topk_per_group(
        paired, [left_key], [F.col("distance_km").asc(), F.col("nn_" + right_key).asc()], k
    )


def knn_join_nested(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    max_km: float,
    k: int,
    out_col: str = "nearby",
    **kw,
) -> DataFrame:
    """Per-left-row k-NN with the neighbors NESTED as an array of structs
    ordered by distance — the shape the reference actually serves: each
    service row carries its `nearby_transit` list
    (backend/main.py:475; consumed by frontend ServiceMap.tsx:19-48;
    committed in SURVEY §7.4).

    Output: all left columns + `out_col` = array<struct<distance_km,
    nn_*>> sorted (distance asc, right key asc — struct field order makes
    array_sort's lexicographic comparison implement exactly that). Left
    rows with zero in-radius neighbors are absent, matching `knn_join`.

    Scale: one groupBy(left_key) after the k-NN window. Both stages hash
    by left_key, so AQE/exchange-reuse coalesces them into one shuffle;
    the array is bounded by k — no skew risk from hot groups.
    """
    flat = knn_join(left, right, left_key, right_key, max_km, k, **kw)
    nn_cols = [c for c in flat.columns if c.startswith("nn_")]
    keep = [c for c in flat.columns if c not in nn_cols and c != "distance_km"]
    item = F.struct(F.col("distance_km"), *[F.col(c) for c in nn_cols])
    return flat.groupBy(*[F.col(c) for c in keep]).agg(
        F.array_sort(F.collect_list(item)).alias(out_col)
    )


def knn_join_adaptive(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    max_km: float,
    k: int,
    phase1_fraction: float = 0.25,
    **kw,
) -> DataFrame:
    """Density-adaptive EXACT k-NN join: same output as `knn_join`, but the
    grid ring is sized to the k-neighbor distance, not the worst case.

    `knn_join`'s candidate count per left row is density × max_km², even
    when the k nearest all sit a fraction of max_km away — so its cost grows
    with the square of data density (at 10× density: 100× pairs). Phase 1
    runs the grid join at `phase1_fraction` × max_km; a left row that got
    all k results back is provably exact (the small ring's cover is exact,
    so any point it missed is farther than everything it found). Only rows
    with < k hits — the ones in genuinely sparse neighborhoods — re-run at
    the full radius via an anti-join. In dense regions phase 1 resolves
    nearly every row with 1/phase1_fraction² of the pair work; in sparse
    regions phase 2 degrades gracefully to plain `knn_join` over few rows.

    Pick phase1_fraction ≈ (expected k-NN distance / max_km); too small
    sends everything to phase 2 (wasted pass), too large forfeits the
    pruning.
    """
    p1 = knn_join(left, right, left_key, right_key, max_km * phase1_fraction, k, **kw)
    w = Window.partitionBy(left_key)
    p1c = p1.withColumn("_cnt", F.count(F.lit(1)).over(w))
    resolved = p1c.filter(F.col("_cnt") >= k).drop("_cnt")
    unresolved = left.join(
        p1c.filter(F.col("_cnt") >= k).select(left_key).distinct(), left_key, "left_anti"
    )
    p2 = knn_join(unresolved, right, left_key, right_key, max_km, k, **kw)
    return resolved.unionByName(p2)


def knn_join_exact(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    max_km: float,
    k: int,
    **kw,
) -> DataFrame:
    """Oracle-comparable exact variant: plain cross join + haversine + top-k.

    Same semantics as `knn_join` (which is also exact thanks to the 3×3
    cover, but exercises the grid path); this one is the simplest possible
    plan for small dimensions and the form the DuckDB oracle mirrors.
    """
    left_lat, left_lon = kw.get("left_lat", "lat"), kw.get("left_lon", "lon")
    right_lat, right_lon = kw.get("right_lat", "lat"), kw.get("right_lon", "lon")
    r = right.select(
        F.col(right_key).alias("nn_" + right_key),
        F.col(right_lat).alias("_nn_lat"),
        F.col(right_lon).alias("_nn_lon"),
    )
    dist = haversine_km(F.col(left_lat), F.col(left_lon), F.col("_nn_lat"), F.col("_nn_lon"))
    paired = (
        spread(left, left_key).crossJoin(F.broadcast(r))
        .withColumn("distance_km", dist)
        .filter(F.col("distance_km") <= max_km)
        .drop("_nn_lat", "_nn_lon")
    )
    return topk_per_group(
        paired, [left_key], [F.col("distance_km").asc(), F.col("nn_" + right_key).asc()], k
    )
