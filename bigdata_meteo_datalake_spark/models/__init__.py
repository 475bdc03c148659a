"""The five reference dbt models as composable DataFrame->DataFrame
functions (SURVEY.md section 3.2): raw -> {stg_tmdb_popular,
stg_tmdb_details, stg_omdb_ratings} -> movies_enriched_daily ->
kpi_daily_summary. `ref()` edges are function composition; each model also
registers a temp view so the same chain can run through spark.sql.
"""

from .marts import kpi_daily_summary, movies_enriched_daily
from .staging import stg_omdb_ratings, stg_tmdb_details, stg_tmdb_popular

__all__ = [
    "stg_tmdb_popular",
    "stg_tmdb_details",
    "stg_omdb_ratings",
    "movies_enriched_daily",
    "kpi_daily_summary",
]
