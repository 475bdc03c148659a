"""SQL-string twins of the five models (SURVEY.md section 3.2: dbt's
declarative-SQL entry point). Each model is also expressible as plain Spark
SQL over temp views — Catalyst produces the same plan either way; the twin
is checked for frame-equality against the DataFrame form in
tests/test_movies_pipeline.py.

`ref()` edges become view references; `run_models_sql` executes the chain
in dependency order (O5) and registers each result as a view.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

STG_TMDB_POPULAR = """
SELECT snapshot_date,
       tmdb_id,
       title,
       cast(nullif(payload.release_date, '') AS date) AS release_date,
       cast(payload.popularity AS double)             AS popularity,
       cast(payload.vote_average AS double)           AS tmdb_rating,
       cast(payload.vote_count AS int)                AS tmdb_vote_count,
       payload.original_language                      AS original_language,
       to_json(payload.genre_ids)                     AS genre_ids_json
FROM raw_tmdb_popular
"""

STG_TMDB_DETAILS = """
SELECT snapshot_date,
       tmdb_id,
       nullif(imdb_id, '')                            AS imdb_id,
       title,
       cast(nullif(payload.release_date, '') AS date) AS release_date,
       cast(nullif(payload.runtime, '') AS int)       AS runtime_minutes,
       payload.status                                 AS status,
       payload.original_language                      AS original_language,
       to_json(payload.genres)                        AS genres_json,
       to_json(payload.production_countries)          AS production_countries_json
FROM raw_tmdb_details
"""

STG_OMDB_RATINGS = """
SELECT snapshot_date,
       imdb_id,
       payload.Title AS title_omdb,
       cast(CASE WHEN payload.imdbRating = 'N/A' THEN NULL
                 ELSE payload.imdbRating END AS double) AS imdb_rating,
       cast(regexp_replace(CASE WHEN payload.imdbVotes = 'N/A' THEN NULL
                                ELSE payload.imdbVotes END, ',', '') AS bigint)
                                                        AS imdb_votes,
       cast(CASE WHEN payload.Metascore = 'N/A' THEN NULL
                 ELSE payload.Metascore END AS int)      AS metascore,
       CASE WHEN payload.Rated = 'N/A' THEN NULL ELSE payload.Rated END AS rated,
       payload.Type AS type,
       CASE WHEN payload.Year = 'N/A' THEN NULL ELSE payload.Year END AS year_text,
       CASE WHEN payload.Country = 'N/A' THEN NULL ELSE payload.Country END AS country,
       CASE WHEN payload.Genre = 'N/A' THEN NULL ELSE payload.Genre END AS genre,
       CASE WHEN payload.Director = 'N/A' THEN NULL ELSE payload.Director END AS director,
       CASE WHEN payload.Actors = 'N/A' THEN NULL ELSE payload.Actors END AS actors,
       to_json(payload.Ratings) AS ratings_json
FROM raw_omdb_ratings
"""

MOVIES_ENRICHED_DAILY = """
SELECT p.snapshot_date,
       p.tmdb_id,
       p.title,
       p.release_date,
       year(p.release_date)                          AS release_year,
       p.popularity,
       p.tmdb_rating,
       p.tmdb_vote_count,
       p.original_language,
       p.genre_ids_json,
       d.imdb_id,
       d.runtime_minutes,
       d.status,
       o.imdb_rating,
       o.imdb_votes,
       o.metascore,
       o.rated,
       o.type,
       o.country                                     AS omdb_country,
       o.genre                                       AS omdb_genre,
       o.director,
       o.actors,
       o.ratings_json                                AS omdb_ratings_json,
       (o.imdb_id IS NULL)                           AS missing_omdb_data,
       CASE WHEN o.imdb_rating IS NOT NULL AND o.metascore IS NOT NULL
              THEN floor((o.imdb_rating * 0.6 + (o.metascore / 10.0) * 0.4) * 100 + 0.5) / 100
            WHEN o.imdb_rating IS NOT NULL
              THEN floor(o.imdb_rating * 100 + 0.5) / 100
            ELSE floor(p.tmdb_rating * 100 + 0.5) / 100
       END                                           AS composite_score,
       (p.popularity >= 50 AND coalesce(o.imdb_rating, p.tmdb_rating) < 6.0)
                                                     AS is_overhyped,
       (p.popularity < 30 AND coalesce(o.imdb_rating, p.tmdb_rating) >= 7.5)
                                                     AS is_hidden_gem
FROM stg_tmdb_popular p
LEFT JOIN stg_tmdb_details d
  ON p.snapshot_date = d.snapshot_date AND p.tmdb_id = d.tmdb_id
LEFT JOIN stg_omdb_ratings o
  ON p.snapshot_date = o.snapshot_date AND d.imdb_id = o.imdb_id
"""

KPI_DAILY_SUMMARY = """
SELECT snapshot_date,
       count(*)                                                   AS nb_movies,
       cast(sum(CASE WHEN NOT missing_omdb_data THEN 1 ELSE 0 END) AS bigint)
                                                                  AS nb_movies_with_omdb,
       floor(cast(sum(CASE WHEN NOT missing_omdb_data THEN 1 ELSE 0 END) AS double)
             / cast(count(*) AS double) * 100 + 0.5) / 100        AS omdb_coverage_ratio,
       floor(cast(sum(cast(tmdb_rating AS decimal(28,6))) AS double)
             / count(tmdb_rating) * 100 + 0.5) / 100              AS avg_tmdb_rating,
       floor(cast(sum(cast(imdb_rating AS decimal(28,6))) AS double)
             / count(imdb_rating) * 100 + 0.5) / 100              AS avg_imdb_rating,
       floor(cast(sum(cast(popularity AS decimal(28,6))) AS double)
             / count(popularity) * 100 + 0.5) / 100               AS avg_popularity,
       cast(sum(CASE WHEN coalesce(is_overhyped, false) THEN 1 ELSE 0 END) AS bigint)
                                                                  AS nb_overhyped,
       cast(sum(CASE WHEN coalesce(is_hidden_gem, false) THEN 1 ELSE 0 END) AS bigint)
                                                                  AS nb_hidden_gems
FROM movies_enriched_daily
GROUP BY snapshot_date
"""

#: dependency order (O5): staging models, then marts
MODEL_SQL: dict[str, str] = {
    "stg_tmdb_popular": STG_TMDB_POPULAR,
    "stg_tmdb_details": STG_TMDB_DETAILS,
    "stg_omdb_ratings": STG_OMDB_RATINGS,
    "movies_enriched_daily": MOVIES_ENRICHED_DAILY,
    "kpi_daily_summary": KPI_DAILY_SUMMARY,
}


def run_models_sql(
    spark: SparkSession, raw_tables: dict[str, DataFrame]
) -> dict[str, DataFrame]:
    """Execute the model DAG through the SQL path: register raw views, run
    each model in dependency order, register its output as the next view."""
    for name, df in raw_tables.items():
        df.createOrReplaceTempView(name)
    out: dict[str, DataFrame] = {}
    for name, sql in MODEL_SQL.items():
        out[name] = spark.sql(sql)
        out[name].createOrReplaceTempView(name)
    return out
