"""team_126_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of BigDataForSanDiego/Team-126, re-expressed
Spark-first and extended with large-scale training-data pipeline operators.

Layout (SURVEY.md §7.1):
    session.py    SparkSession builder (AQE, Arrow, UTC, sane shuffle defaults)
    tables.py     loaders for the driver's synthetic parquet tables
    schemas.py    explicit StructTypes mirroring the reference data model
    io.py         CSV-with-BOM / JSON-envelope readers and writers
    functions/    pure column-expression kernels (geo, vector, text)
    operators/    composed DataFrame operators (relational, geo, vector,
                  dedup, text analysis, health analytics, search pipelines)
    streaming/    Structured Streaming message pipeline
    queries.py    the declared-query corpus (Spark fn + DuckDB oracle SQL)
"""

__version__ = "0.1.0"
