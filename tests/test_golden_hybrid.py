"""Golden end-to-end hybrid-search test (SURVEY §5d): the expected
/search/health-services response from the reference's setup guide
(HYBRID_SEARCH_SETUP.md:311-348) rebuilt over FIXTURES-shaped services +
transit stops, exercising candidate_factor=3 over-fetch, V6 null-embedding
fallback, and the task-3 nested transit join."""

from __future__ import annotations

import pytest

from team_126_spark.operators.search import hybrid_search_response

USER_LAT, USER_LON = 32.7157, -117.1611
DLAT = 0.009  # ~1 km of latitude at R=6371


DLON = 0.0107  # ~1 km of longitude at this latitude


@pytest.fixture(scope="module")
def services(spark):
    # id, (lat km north, lon km east), embedding (4-dim; probe is [1,0,0,0]).
    # Service 2 sits EAST of the user so the stops (placed north, around
    # service 1) stay outside its 1 km transit radius.
    spec = [
        (1, 0.5, 0.0, [1.0, 0.0, 0.0, 0.0]),   # near + perfect sim -> rank 1
        (2, 0.0, 2.0, [0.9, 0.1, 0.0, 0.0]),   # near + strong sim  -> rank 2
        (3, 2.5, 0.0, [0.0, 1.0, 0.0, 0.0]),   # orthogonal
        (4, 3.0, 0.0, None),                    # V6: null embedding -> sim 0.0
        (5, 4.0, 0.0, [0.5, 0.5, 0.0, 0.0]),
        (6, 5.0, 0.0, [0.0, 0.0, 1.0, 0.0]),
        (7, 7.0, 0.0, [1.0, 0.0, 0.0, 0.0]),   # perfect sim but 7th by distance:
                                                # outside the k*factor=6 over-fetch
        (9, 15.0, 0.0, [1.0, 0.0, 0.0, 0.0]),  # outside the 10 km radius
    ]
    rows = [
        (
            i,
            USER_LAT + km_n * DLAT,
            USER_LON + km_e * DLON,
            f"Program-{i}",
            f"{i} Main St",
            f"619555{i:04d}",
            emb,
        )
        for i, km_n, km_e, emb in spec
    ]
    return spark.createDataFrame(
        rows,
        "id int, latitude double, longitude double, program string, "
        "address string, phone string, embedding array<double>",
    )


@pytest.fixture(scope="module")
def stops(spark):
    # service 1 sits at USER_LAT + 0.5*DLAT; stops placed relative to it
    s1_lat = USER_LAT + 0.5 * DLAT
    rows = [
        # ~0.15 km from service 1, wheelchair accessible
        ("MTS_10001", "10001", "Stop A", s1_lat + 0.15 * DLAT, USER_LON, "MTS", "1"),
        # ~0.5 km from service 1, not accessible
        ("NCTD_10002", "10002", "Stop B", s1_lat + 0.5 * DLAT, USER_LON, "NCTD", "0"),
        # ~5 km away: outside transit_max_km=1 for every top service
        ("MTS_10003", "10003", "Stop C", s1_lat + 5.0 * DLAT, USER_LON, "MTS", "1"),
    ]
    return spark.createDataFrame(
        rows,
        "stop_uid string, stop_id string, stop_name string, stop_lat double, "
        "stop_lon double, stop_agency string, wheelchair_boarding string",
    )


def test_golden_hybrid_search_response(services, stops):
    resp = hybrid_search_response(
        services,
        stops,
        [1.0, 0.0, 0.0, 0.0],
        USER_LAT,
        USER_LON,
        query="mental health services in Spanish",
        max_distance_km=10.0,
        limit=2,
        semantic_weight=0.7,
        candidate_factor=3,
        transit_k=3,
        transit_max_km=1.0,
    )
    # ---- envelope: exactly the golden top-level shape
    assert set(resp) == {
        "user_location", "query", "search_radius_km", "search_radius_miles",
        "results", "count",
    }
    assert resp["user_location"] == {"latitude": USER_LAT, "longitude": USER_LON}
    assert resp["query"] == "mental health services in Spanish"
    assert resp["search_radius_km"] == 10.0
    assert resp["search_radius_miles"] == 6.21  # the guide's exact figure
    assert resp["count"] == 2 and len(resp["results"]) == 2

    # ---- ranking: near+aligned wins; the 7th-by-distance perfect-sim row
    # is excluded by the 3x over-fetch, and the out-of-radius row never enters
    ids = [r["id"] for r in resp["results"]]
    assert ids == [1, 2]

    r1 = resp["results"][0]
    assert set(r1) == {
        "id", "latitude", "longitude", "program", "address", "phone",
        "distance_km", "distance_miles", "similarity_score", "combined_score",
        "nearby_transit",
    }
    assert r1["program"] == "Program-1"
    assert r1["similarity_score"] == 1.0
    assert 0.4 <= r1["distance_km"] <= 0.6
    assert 1.5 <= resp["results"][1]["distance_km"] <= 2.5
    assert r1["distance_miles"] == round(r1["distance_km"] * 0.621371, 2)
    assert 0.9 <= r1["combined_score"] <= 1.0

    # ---- nested transit: ordered by distance, accessibility flag derived,
    # far stop pruned by the 1 km cap
    t = r1["nearby_transit"]
    assert [x["name"] for x in t] == ["Stop A", "Stop B"]
    assert t[0]["agency"] == "MTS" and t[0]["wheelchair_accessible"] is True
    assert t[1]["agency"] == "NCTD" and t[1]["wheelchair_accessible"] is False
    assert 0.1 <= t[0]["distance_km"] <= 0.2 < t[1]["distance_km"] <= 0.6
    assert all(
        set(x) == {
            "name", "latitude", "longitude", "agency", "wheelchair_accessible",
            "distance_km", "distance_miles",
        }
        for x in t
    )
    assert t[0]["latitude"] == pytest.approx(USER_LAT + 0.65 * DLAT)

    # service 2 has no stop within 1 km -> empty list, not a dropped row
    assert resp["results"][1]["nearby_transit"] == []


def test_golden_null_embedding_service_still_scores(services, stops):
    """V6: with geo weight dominant, the null-embedding service (id 4) must
    surface with similarity 0.0 rather than being dropped."""
    resp = hybrid_search_response(
        services,
        stops,
        [1.0, 0.0, 0.0, 0.0],
        USER_LAT,
        USER_LON,
        max_distance_km=10.0,
        limit=6,
        semantic_weight=0.0,
        candidate_factor=None,
    )
    by_id = {r["id"]: r for r in resp["results"]}
    assert 4 in by_id and by_id[4]["similarity_score"] == 0.0


def test_hybrid_ndcg_eval_bounds_and_density_sensitivity(spark):
    """The ranking audit's invariants: DCG <= IDCG (gold is the ideal
    order), NDCG in (0, 1], overlap in [0, 10]. The VALUE is the point:
    at sf0.001 the candidate_factor=3 over-fetch is near-ideal (NDCG
    ~0.97), while at 50x the density (sf0.1) the same factor misses the
    entire exact top-10 (overlap 0, NDCG ~0.90) — the audit turns the
    over-fetch dial into an observed per-corpus number."""
    from team_126_spark.queries import REGISTRY

    r = REGISTRY["hybrid_ndcg_eval"].fn(spark, "/root/testdata/sf0.001").collect()[0]
    assert 0.0 < r["ndcg_r"] <= 1.0
    assert r["dcg_r"] <= r["idcg_r"]
    assert 0 <= r["overlap_10"] <= 10
    # near-ideal at reference-class density
    assert r["ndcg_r"] > 0.9 and r["overlap_10"] >= 8
