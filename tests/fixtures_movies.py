"""Movie-pipeline fixture lake builder (FIXTURES.md A, incl. the edge-row
checklist at the end of section A6). Uses the engine's own ingest writers
(sources/rest.py) with fake fetchers — no network."""

from __future__ import annotations

import json
import os

from bigdata_meteo_datalake_spark.sources.rest import (
    ingest_omdb,
    ingest_tmdb,
    make_envelope,
    write_envelope_file,
)

DAY1 = "2026-02-18"
DAY2 = "2026-02-19"

POPULAR_DAY1 = [
    # m1: fully enriched; gets superseded by a rerun file (last-write-wins)
    {"id": 101, "title": "Film A", "release_date": "2025-03-31", "popularity": 45.0,
     "vote_average": 7.0, "vote_count": 100, "original_language": "en",
     "genre_ids": [12, 14]},
    # m2: popular only, empty release_date -> NULL (J1 left-preserve, P5)
    {"id": 102, "title": "Film B", "release_date": "", "popularity": 10.0,
     "vote_average": 6.5, "vote_count": 50, "original_language": "fr",
     "genre_ids": []},
    # m3: details row carries NULL imdb_id (J2 NULL-key no-match)
    {"id": 103, "title": "Film C", "release_date": "2024-01-01", "popularity": 20.0,
     "vote_average": 5.0, "vote_count": 10, "original_language": "en",
     "genre_ids": [16]},
    # m4: omdb has imdbRating=N/A but Metascore present (P6/P12 cascade)
    {"id": 104, "title": "Film D", "release_date": "2023-06-15", "popularity": 60.0,
     "vote_average": 5.5, "vote_count": 500, "original_language": "en",
     "genre_ids": [28]},
    # m5: popularity exactly 50, imdb 5.9 (P14 boundary >=50, <6.0)
    {"id": 105, "title": "Film E", "release_date": "2022-12-01", "popularity": 50.0,
     "vote_average": 6.0, "vote_count": 200, "original_language": "de",
     "genre_ids": [18]},
    # m6: popularity exactly 30 (P14 boundary: NOT <30 -> no hidden gem)
    {"id": 106, "title": "Film F", "release_date": "2021-05-20", "popularity": 30.0,
     "vote_average": 8.0, "vote_count": 300, "original_language": "en",
     "genre_ids": [35]},
    # m7: popularity 29.9, rating exactly 7.5 (P14 boundary <30, >=7.5)
    {"id": 107, "title": "Film G", "release_date": "2020-02-02", "popularity": 29.9,
     "vote_average": 7.5, "vote_count": 400, "original_language": "en",
     "genre_ids": [99]},
    # missing id -> skipped at load (P16)
    {"title": "Ghost Film", "release_date": "2020-01-01", "popularity": 1.0,
     "vote_average": 1.0, "vote_count": 1, "original_language": "en",
     "genre_ids": []},
]

DETAILS_DAY1 = {
    101: {"id": 101, "imdb_id": "tt101", "title": "Film A", "release_date": "2025-03-31",
          "runtime": "101", "status": "Released", "original_language": "en",
          "genres": [{"id": 12, "name": "Aventure"}],
          "production_countries": [{"iso_3166_1": "US", "name": "United States of America"}]},
    103: {"id": 103, "imdb_id": None, "title": "Film C", "release_date": "2024-01-01",
          "runtime": "95", "status": "Released", "original_language": "en",
          "genres": [], "production_countries": []},
    104: {"id": 104, "imdb_id": "tt104", "title": "Film D", "release_date": "2023-06-15",
          "runtime": "", "status": "Released", "original_language": "en",
          "genres": [{"id": 28, "name": "Action"}], "production_countries": []},
    105: {"id": 105, "imdb_id": "tt105", "title": "Film E", "release_date": "2022-12-01",
          "runtime": "120", "status": "Released", "original_language": "de",
          "genres": [], "production_countries": []},
    106: {"id": 106, "imdb_id": "tt106", "title": "Film F", "release_date": "2021-05-20",
          "runtime": "88", "status": "Released", "original_language": "en",
          "genres": [], "production_countries": []},
    # m7 arrives as a BARE payload (legacy, no envelope) - S5
}

DETAIL_107_BARE = {
    "id": 107, "imdb_id": None, "title": "Film G", "release_date": "2020-02-02",
    "runtime": "75", "status": "Released", "original_language": "en",
    "genres": [], "production_countries": [],
}

OMDB_DAY1 = {
    "tt101": {"Title": "Film A", "Year": "2025", "Rated": "PG-13", "Type": "movie",
              "Country": "United States", "Genre": "Adventure, Fantasy",
              "Director": "Some Director", "Actors": "Actor One, Actor Two",
              "imdbRating": "7.7", "imdbVotes": "1,234,567", "Metascore": "68",
              "Ratings": [{"Source": "Internet Movie Database", "Value": "7.7/10"}],
              "Response": "True"},
    "tt104": {"Title": "Film D", "Year": "2023", "Rated": "R", "Type": "movie",
              "Country": "N/A", "Genre": "Action", "Director": "N/A", "Actors": "N/A",
              "imdbRating": "N/A", "imdbVotes": "N/A", "Metascore": "55",
              "Ratings": [], "Response": "True"},
    "tt105": {"Title": "Film E", "Year": "2022", "Rated": "PG", "Type": "movie",
              "Country": "Germany", "Genre": "Drama", "Director": "Dir E",
              "Actors": "Actor E", "imdbRating": "5.9", "imdbVotes": "9,876",
              "Metascore": "N/A", "Ratings": [], "Response": "True"},
    # dropped at load: Response=False
    "tt999": {"Title": "Missing", "Response": "False"},
}

POPULAR_DAY2 = [
    {"id": 201, "title": "Film H", "release_date": "2026-01-01", "popularity": 15.0,
     "vote_average": 6.1, "vote_count": 40, "original_language": "en",
     "genre_ids": [53]},
    {"id": 202, "title": "Film I", "release_date": "2026-01-15", "popularity": 55.0,
     "vote_average": 5.2, "vote_count": 60, "original_language": "es",
     "genre_ids": []},
]

DETAILS_DAY2 = {
    201: {"id": 201, "imdb_id": "tt201", "title": "Film H", "release_date": "2026-01-01",
          "runtime": "100", "status": "Released", "original_language": "en",
          "genres": [], "production_countries": []},
}


def _fake_tmdb(day: str, popular, details):
    def fetcher(endpoint: str, params: dict) -> dict:
        if endpoint == "movie/popular":
            return {"page": 1, "results": popular}
        movie_id = int(endpoint.split("/")[1])
        # ids without a fixture detail get a TMDB-style error doc (no `id`
        # field) — dropped at load by the missing-key filter (P16)
        return details.get(movie_id, {"status_code": 34, "status_message": "not found"})

    return fetcher


def build_lake(lake_root: str) -> str:
    """Write the full two-day fixture lake; returns lake_root."""
    # --- day 1 via the engine's own ingest writers (S1-S3) ---
    ingest_tmdb(
        _fake_tmdb(DAY1, POPULAR_DAY1, DETAILS_DAY1),
        lake_root,
        snapshot_date=DAY1,
        run_id="run1",
        extracted_at_utc="2026-02-18T19:07:02+00:00",
    )
    # (102 and 107 got TMDB-error detail files with no id -> no raw row;
    # 107's real detail arrives below as a bare legacy payload)
    ingest_omdb(
        lambda endpoint, params: OMDB_DAY1[params["i"]],
        lake_root,
        ["tt101", "tt104", "tt105", "tt999"],
        snapshot_date=DAY1,
        run_id="run1",
        extracted_at_utc="2026-02-18T19:07:03+00:00",
    )

    # rerun file supersedes m1's popular row (S8 last-write-wins): same page,
    # new title for 101, later extracted_at + run_id
    rerun = [dict(POPULAR_DAY1[0], title="Film A v2")] + POPULAR_DAY1[1:]
    write_envelope_file(
        make_envelope(
            {"page": 1, "results": rerun}, snapshot_date=DAY1, run_id="run2",
            source="tmdb", endpoint="popular",
            extracted_at_utc="2026-02-18T21:00:00+00:00",
        ),
        f"{lake_root}/raw/tmdb/popular/date={DAY1}", "popular_movies_rerun",
    )
    # duplicate detail for 101 with different payload, later run -> wins
    write_envelope_file(
        make_envelope(
            dict(DETAILS_DAY1[101], runtime="102"), snapshot_date=DAY1,
            run_id="run2", source="tmdb", endpoint="details",
            extracted_at_utc="2026-02-18T21:00:01+00:00",
        ),
        f"{lake_root}/raw/tmdb/details/date={DAY1}", "101_rerun",
    )
    # bare (envelope-less) legacy payload for 107 (S5)
    det_dir = f"{lake_root}/raw/tmdb/details/date={DAY1}"
    with open(os.path.join(det_dir, "107.json"), "w", encoding="utf-8") as f:
        json.dump(DETAIL_107_BARE, f)
    # malformed JSON file: must be skipped, not fatal (S6)
    with open(os.path.join(det_dir, "corrupt.json"), "w", encoding="utf-8") as f:
        f.write('{"id": 999, "imdb_id": ')

    # --- day 2 (all-NULL imdb_rating day: no omdb files at all) ---
    ingest_tmdb(
        _fake_tmdb(DAY2, POPULAR_DAY2, DETAILS_DAY2),
        lake_root,
        snapshot_date=DAY2,
        run_id="run3",
        extracted_at_utc="2026-02-19T19:07:02+00:00",
    )
    return lake_root
