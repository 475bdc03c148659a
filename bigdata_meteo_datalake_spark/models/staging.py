"""Staging models: typed columns out of raw payload structs.

Each function mirrors one reference dbt model line-for-line in semantics
(not in execution): JSON field extraction, sentinel cleaning BEFORE casts
(SURVEY section 4 gotcha 5), array subtrees kept as JSON strings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _empty_to_null(col: Column) -> Column:
    """P5: nullif(x, '') (stg_tmdb_popular.sql:22)."""
    return F.nullif(col, F.lit(""))


def _na_to_null(col: Column) -> Column:
    """P6: 'N/A' sentinel -> NULL (stg_omdb_ratings.sql:24-40)."""
    return F.when(col == "N/A", F.lit(None)).otherwise(col)


def stg_tmdb_popular(raw_tmdb_popular: DataFrame) -> DataFrame:
    """stg_tmdb_popular.sql:8-29: payload -> typed columns; genre_ids kept
    as a JSON array string (P4)."""
    p = F.col("payload")
    return raw_tmdb_popular.select(
        "snapshot_date",
        "tmdb_id",
        F.col("title"),
        _empty_to_null(p["release_date"]).cast("date").alias("release_date"),
        p["popularity"].cast("double").alias("popularity"),
        p["vote_average"].cast("double").alias("tmdb_rating"),
        p["vote_count"].cast("int").alias("tmdb_vote_count"),
        p["original_language"].alias("original_language"),
        F.to_json(p["genre_ids"]).alias("genre_ids_json"),
    )


def stg_tmdb_details(raw_tmdb_details: DataFrame) -> DataFrame:
    """stg_tmdb_details.sql:18-39: runtime arrives as '' / null / number-ish
    string -> clean then cast (P5+P8)."""
    p = F.col("payload")
    return raw_tmdb_details.select(
        "snapshot_date",
        "tmdb_id",
        _empty_to_null(F.col("imdb_id")).alias("imdb_id"),
        F.col("title"),
        _empty_to_null(p["release_date"]).cast("date").alias("release_date"),
        _empty_to_null(p["runtime"]).cast("int").alias("runtime_minutes"),
        p["status"].alias("status"),
        p["original_language"].alias("original_language"),
        F.to_json(p["genres"]).alias("genres_json"),
        F.to_json(p["production_countries"]).alias("production_countries_json"),
    )


def stg_omdb_ratings(raw_omdb_ratings: DataFrame) -> DataFrame:
    """stg_omdb_ratings.sql:17-52: 'N/A' cleaning before every cast (P6),
    thousands-separator strip on imdbVotes (P7)."""
    p = F.col("payload")
    return raw_omdb_ratings.select(
        "snapshot_date",
        "imdb_id",
        p["Title"].alias("title_omdb"),
        _na_to_null(p["imdbRating"]).cast("double").alias("imdb_rating"),
        F.regexp_replace(_na_to_null(p["imdbVotes"]), ",", "")
        .cast("long")
        .alias("imdb_votes"),
        _na_to_null(p["Metascore"]).cast("int").alias("metascore"),
        _na_to_null(p["Rated"]).alias("rated"),
        p["Type"].alias("type"),
        _na_to_null(p["Year"]).alias("year_text"),
        _na_to_null(p["Country"]).alias("country"),
        _na_to_null(p["Genre"]).alias("genre"),
        _na_to_null(p["Director"]).alias("director"),
        _na_to_null(p["Actors"]).alias("actors"),
        F.to_json(p["Ratings"]).alias("ratings_json"),
    )
