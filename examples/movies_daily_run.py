#!/usr/bin/env python
"""Worked example: the reference's full daily pipeline, end to end, on a
throwaway lake — what a user of abdillahiomardjamaainan/bigdata-meteo-datalake
runs instead of Airflow+Postgres+dbt+Elasticsearch.

    python examples/movies_daily_run.py [lake_root]

Fetches (here: canned fixtures standing in for TMDB/OMDb HTTP), lands the
envelope JSON raw lake, runs bronze -> staging -> marts with quality gates,
writes the partitioned zones, and serves a search query from the gold
search projection.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_meteo_datalake_spark.plans.pipeline import run
from bigdata_meteo_datalake_spark.session import get_spark
from bigdata_meteo_datalake_spark.sources.rest import ingest_omdb, ingest_tmdb
from bigdata_meteo_datalake_spark.sources.search import full_text_match

SNAPSHOT = "2026-08-13"

POPULAR = [
    {"id": 1, "title": "The Lake House", "release_date": "2026-01-01",
     "popularity": 61.0, "vote_average": 7.1, "vote_count": 321,
     "original_language": "en", "genre_ids": [18]},
    {"id": 2, "title": "Shuffle of Fate", "release_date": "", "popularity": 25.0,
     "vote_average": 7.9, "vote_count": 99, "original_language": "fr",
     "genre_ids": [35, 10749]},
]
DETAILS = {
    1: {"id": 1, "imdb_id": "tt0000001", "title": "The Lake House",
        "release_date": "2026-01-01", "runtime": "104", "status": "Released",
        "original_language": "en", "genres": [{"id": 18, "name": "Drama"}],
        "production_countries": []},
    2: {"id": 2, "imdb_id": None, "title": "Shuffle of Fate",
        "release_date": "", "runtime": "", "status": "Released",
        "original_language": "fr", "genres": [], "production_countries": []},
}
OMDB = {
    "tt0000001": {"Title": "The Lake House", "Year": "2026", "Rated": "PG",
                  "Type": "movie", "Country": "United States", "Genre": "Drama",
                  "Director": "A Director", "Actors": "Lead One, Lead Two",
                  "imdbRating": "7.4", "imdbVotes": "12,345", "Metascore": "70",
                  "Ratings": [], "Response": "True"},
}


def main() -> None:
    lake = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="movies_lake_")
    spark = get_spark("movies-daily-example", cpus=4, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    # 1. ingest (S1-S3) — fetcher injected; production swaps in HTTP
    ingest_tmdb(
        lambda ep, params: {"page": 1, "results": POPULAR}
        if ep == "movie/popular"
        else DETAILS[int(ep.split("/")[1])],
        lake, snapshot_date=SNAPSHOT, run_id="example",
        extracted_at_utc="2026-08-13T19:07:00+00:00",
    )
    ingest_omdb(
        lambda ep, params: OMDB[params["i"]], lake, ["tt0000001"],
        snapshot_date=SNAPSHOT, run_id="example",
        extracted_at_utc="2026-08-13T19:07:01+00:00",
    )

    # 2. the whole former Airflow DAG: bronze -> staging -> marts -> zones
    result = run(spark, lake, SNAPSHOT, run_id="example")

    print("\n== quality report")
    result.quality_report.show(truncate=False)
    print("== movies_enriched_daily")
    result.tables["movies_enriched_daily"].show(truncate=False)
    print("== kpi_daily_summary")
    result.tables["kpi_daily_summary"].show(truncate=False)

    # 3. ad-hoc consumption (the Kibana surface) straight from the lake
    proj = spark.read.parquet(f"{lake}/usage/search_movies_enriched_daily")
    print("== full-text match: title contains 'lake'")
    full_text_match(proj, "title_tokens", "lake").select(
        "doc_id", "title", "composite_score"
    ).show(truncate=False)
    print(f"lake written under: {lake}")
    spark.stop()


if __name__ == "__main__":
    main()
