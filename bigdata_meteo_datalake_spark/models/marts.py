"""Mart models: the enriched wide table and the daily KPI rollup.

movies_enriched_daily (movies_enriched_daily.sql:8-120): popular LEFT JOIN
details on (snapshot_date, tmdb_id) [J1], then LEFT JOIN omdb on
(snapshot_date, imdb_id) [J2 — NULL imdb_id never matches, driving
missing_omdb_data], plus the derived score cascade and boundary flags.

kpi_daily_summary (kpi_daily_summary.sql:19-54): one hash aggregate by
snapshot_date [A1-A5].

Scale notes: at the reference's shape both right sides are bounded by the
popular list (dimension-sized) -> broadcast; the KPI aggregate's group key
is the partition column, so partial aggregation makes the shuffle a few
rows per day per executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import count_if, round_half_up, rounded_avg, rounded_ratio


def movies_enriched_daily(
    stg_tmdb_popular: DataFrame,
    stg_tmdb_details: DataFrame,
    stg_omdb_ratings: DataFrame,
) -> DataFrame:
    pop = stg_tmdb_popular.alias("p")
    det = stg_tmdb_details.select(
        "snapshot_date",
        "tmdb_id",
        "imdb_id",
        F.col("release_date").alias("release_date_det"),
        "runtime_minutes",
        "status",
    ).alias("d")
    omdb = stg_omdb_ratings.select(
        "snapshot_date",
        "imdb_id",
        "imdb_rating",
        "imdb_votes",
        "metascore",
        "rated",
        "type",
        F.col("country").alias("omdb_country"),
        F.col("genre").alias("omdb_genre"),
        "director",
        "actors",
        F.col("ratings_json").alias("omdb_ratings_json"),
        F.col("imdb_id").alias("omdb_imdb_id"),
    ).alias("o")

    joined = pop.join(
        F.broadcast(det), ["snapshot_date", "tmdb_id"], "left"
    ).join(F.broadcast(omdb), ["snapshot_date", "imdb_id"], "left")

    imdb_r, tmdb_r, meta = F.col("imdb_rating"), F.col("tmdb_rating"), F.col("metascore")
    best_rating = F.coalesce(imdb_r, tmdb_r)  # P15 (movies_enriched_daily.sql:107,112)
    composite = (
        # P12 priority cascade (movies_enriched_daily.sql:97-103)
        F.when(
            imdb_r.isNotNull() & meta.isNotNull(),
            round_half_up(imdb_r * 0.6 + (meta / 10.0) * 0.4, 2),
        )
        .when(imdb_r.isNotNull(), round_half_up(imdb_r, 2))
        .otherwise(round_half_up(tmdb_r, 2))
    )
    return joined.select(
        "snapshot_date",
        "tmdb_id",
        F.col("p.title").alias("title"),
        F.col("p.release_date").alias("release_date"),
        F.year(F.col("p.release_date")).alias("release_year"),  # P9
        "popularity",
        "tmdb_rating",
        "tmdb_vote_count",
        F.col("p.original_language").alias("original_language"),
        "genre_ids_json",
        "imdb_id",
        "runtime_minutes",
        "status",
        "imdb_rating",
        "imdb_votes",
        "metascore",
        "rated",
        "type",
        "omdb_country",
        "omdb_genre",
        "director",
        "actors",
        "omdb_ratings_json",
        # P13 (movies_enriched_daily.sql:91-94)
        F.col("omdb_imdb_id").isNull().alias("missing_omdb_data"),
        composite.alias("composite_score"),
        # P14 boundary flags (movies_enriched_daily.sql:106-114)
        ((F.col("popularity") >= 50.0) & (best_rating < 6.0)).alias("is_overhyped"),
        ((F.col("popularity") < 30.0) & (best_rating >= 7.5)).alias("is_hidden_gem"),
    )


def kpi_daily_summary(movies_enriched_daily: DataFrame) -> DataFrame:
    nb_movies = F.count(F.lit(1))
    nb_with_omdb = count_if(~F.col("missing_omdb_data"))
    return movies_enriched_daily.groupBy("snapshot_date").agg(
        nb_movies.alias("nb_movies"),
        nb_with_omdb.alias("nb_movies_with_omdb"),
        rounded_ratio(nb_with_omdb, nb_movies).alias("omdb_coverage_ratio"),
        rounded_avg("tmdb_rating").alias("avg_tmdb_rating"),
        rounded_avg("imdb_rating").alias("avg_imdb_rating"),
        rounded_avg("popularity").alias("avg_popularity"),
        count_if(F.coalesce(F.col("is_overhyped"), F.lit(False))).alias("nb_overhyped"),
        count_if(F.coalesce(F.col("is_hidden_gem"), F.lit(False))).alias(
            "nb_hidden_gems"
        ),
    )
