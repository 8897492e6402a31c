"""Reference housing-dataset derivation, shared by the parity tests
(tests/test_reference_ingest.py) and the runnable demo
(tools/reference_demo.py) so the two can never drift.

Mirrors backend/convert_housing_to_json.py:28-51: units null→0, and
searchable_text = the lowercased f-string concat (pandas renders missing
fields as the string 'nan' — mirrored with coalesce so substring-search
parity holds on rows with missing fields).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io import read_csv_bom

HOUSING_CSV = (
    "/root/reference/backend/datasets/"
    "HousingElements_SDCounty_2021_2029_3908156892941684000.csv"
)


def load_housing(spark: SparkSession, path: str = HOUSING_CSV) -> DataFrame:
    df = read_csv_bom(spark, path)
    units = F.coalesce(F.col("Units").try_cast("long"), F.lit(0))
    st = F.lower(
        F.concat_ws(
            " ",
            F.coalesce(F.col("Jurisdiction"), F.lit("nan")),
            F.coalesce(F.col("ZoningSimplified"), F.lit("nan")),
            F.coalesce(F.col("Vacancy"), F.lit("nan")),
            F.coalesce(F.col("Zoning"), F.lit("nan")),
        )
    )
    return df.withColumn("units", units).withColumn("searchable_text", st)


# The five demo searches (backend/search_housing.py:96-140):
# (name, Spark predicate, equivalent DuckDB WHERE clause for parity checks).
_DD_SEARCHABLE = (
    "lower(concat_ws(' ', COALESCE(Jurisdiction,'nan'), "
    "COALESCE(ZoningSimplified,'nan'), COALESCE(Vacancy,'nan'), "
    "COALESCE(Zoning,'nan')))"
)


def searches() -> list:
    """Built lazily — classic-API Column construction needs an active
    SparkContext, so this cannot run at import time."""
    return [
        (
            "vacant_high_density",
            (F.col("Vacancy") == "Vacant")
            & (F.lower("ZoningSimplified") == "high density residential"),
            "Vacancy='Vacant' AND lower(ZoningSimplified)='high density residential'",
        ),
        (
            "san_diego_50plus",
            (F.lower("Jurisdiction") == "city of san diego") & (F.col("units") >= 50),
            "lower(Jurisdiction)='city of san diego' AND COALESCE(TRY_CAST(Units AS BIGINT),0)>=50",
        ),
        (
            "commercial",
            F.lower("ZoningSimplified") == "commercial",
            "lower(ZoningSimplified)='commercial'",
        ),
        (
            "mixed_use",
            F.lower("ZoningSimplified") == "mixed use",
            "lower(ZoningSimplified)='mixed use'",
        ),
        (
            "text_transit",
            F.col("searchable_text").contains("transit"),
            f"{_DD_SEARCHABLE} LIKE '%transit%'",
        ),
    ]
