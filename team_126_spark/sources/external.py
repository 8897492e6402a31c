"""Pluggable external HTTP lookup source (S8) — the reference's
DuckDuckGo / Nominatim calls (backend/tools/search_tool.py:80-193,
backend/tools/check_hours_availability.py:101-125) behind a batched Arrow
boundary, mirroring functions/embed.py's provider pattern.

The reference calls HTTP per row from the driver process; here the client
is constructed once per executor worker and receives whole Arrow batches —
the shape that survives a 1000-executor fan-out with provider-side rate
limits (batch size, not row count, is the unit of admission).

The default client is `StubGeocoder`, a deterministic md5-based stand-in
(SURVEY.md §7.4 non-determinism quarantine): real HTTP is environment-
specific and non-reproducible, so tests and oracle runs wire the stub while
production wires a real client with the same Protocol.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Protocol

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

LOOKUP_RESULT = StructType(
    [
        StructField("lat", DoubleType()),
        StructField("lon", DoubleType()),
        StructField("display_name", StringType()),
    ]
)


class ExternalLookup(Protocol):
    def lookup_batch(self, queries: pd.Series) -> pd.DataFrame:  # pragma: no cover
        """queries -> DataFrame with columns (lat, lon, display_name);
        all-null row for null/unresolvable queries."""
        ...


class StubGeocoder:
    """Deterministic geocoder: md5 of the normalized query scattered into
    the San-Diego box used by the geo fixtures (tables.py constants)."""

    def lookup_batch(self, queries: pd.Series) -> pd.DataFrame:
        def one(q):
            if q is None:
                return (None, None, None)
            h = int.from_bytes(hashlib.md5(q.strip().lower().encode()).digest()[:8], "big")
            lat = 32.5 + (h % 10000) / 10000.0 * 0.8
            lon = -117.6 + ((h >> 16) % 10000) / 10000.0 * 0.9
            return (lat, lon, f"stub:{q.strip().lower()}")

        rows = [one(q) for q in queries]
        return pd.DataFrame(rows, columns=["lat", "lon", "display_name"])


def lookup_udf(client: ExternalLookup | None = None):
    """Arrow-batched scalar pandas UDF: query string -> struct(lat, lon,
    display_name). Iterator form: the client (HTTP session in production)
    is built once per worker, not per batch."""
    c = client or StubGeocoder()

    @F.pandas_udf(LOOKUP_RESULT)
    def _lookup(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for queries in batches:
            yield c.lookup_batch(queries)

    return _lookup


def lookup(col: Column, client: ExternalLookup | None = None) -> Column:
    return lookup_udf(client)(col)
