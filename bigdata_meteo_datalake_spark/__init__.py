"""PySpark-native analytics engine with the capabilities of
``abdillahiomardjamaainan/bigdata-meteo-datalake`` (see SURVEY.md).

Layout:
    session     - SparkSession factory (ANSI off, AQE on, dynamic partition overwrite)
    schemas     - explicit StructTypes for every source contract
    sources/    - bronze JSON ingest, lake parquet zones, REST, search-index sink
    functions/  - scalar-expression layer (JSON, cleaning, numeric parity, ids)
    operators/  - upsert, quality checks, dedup, similarity, text, multimodal
    models/     - the five reference dbt models as DataFrame->DataFrame functions
    plans/      - pipeline orchestrator + plan-inspection helpers
    streaming/  - structured-streaming windows over event tables
    queries     - named query registry + DuckDB oracle SQL (driver contract)
"""

__version__ = "0.1.0"
