"""Explicit StructTypes for every source contract (SURVEY.md section 1.3;
FIXTURES.md A). Bronze never relies on schema inference: the reference's
loader extracts fields by name and silently NULLs absences
(load_raw_to_postgres.py:97-110), which is exactly PERMISSIVE-mode behavior
with a declared schema.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: The ingest envelope written around every raw payload
#: (fetch_tmdb.py:30-43); the loader also accepts bare payloads
#: (load_raw_to_postgres.py:35-39).
META = T.StructType(
    [
        T.StructField("snapshot_date", T.StringType()),
        T.StructField("run_id", T.StringType()),
        T.StructField("extracted_at_utc", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("endpoint", T.StringType()),
    ]
)

#: TMDB popular page entry (FIXTURES.md A2; consumed at
#: stg_tmdb_popular.sql:22-27, load_raw_to_postgres.py:97-110).
TMDB_POPULAR_RESULT = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("release_date", T.StringType()),
        T.StructField("popularity", T.DoubleType()),
        T.StructField("vote_average", T.DoubleType()),
        T.StructField("vote_count", T.IntegerType()),
        T.StructField("original_language", T.StringType()),
        T.StructField("genre_ids", T.ArrayType(T.IntegerType())),
    ]
)

TMDB_POPULAR_PAGE = T.StructType(
    [
        T.StructField("page", T.IntegerType()),
        T.StructField("results", T.ArrayType(TMDB_POPULAR_RESULT)),
    ]
)

#: TMDB movie details (FIXTURES.md A3; stg_tmdb_details.sql:26-37).
#: runtime may arrive as "" or null -> StringType here, cleaned+cast in
#: staging (sentinel-before-cast, SURVEY section 4 gotcha 5).
TMDB_DETAILS = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("imdb_id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("release_date", T.StringType()),
        T.StructField("runtime", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("original_language", T.StringType()),
        T.StructField(
            "genres",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.IntegerType()),
                        T.StructField("name", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "production_countries",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("iso_3166_1", T.StringType()),
                        T.StructField("name", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

#: OMDb ratings payload (FIXTURES.md A4 — contract reconstructed from
#: load_raw_to_postgres.py:160-199 + stg_omdb_ratings.sql:24-52; the
#: reference's fetch_omdb.py is missing from its repo). All scalars are
#: strings with 'N/A' sentinels; imdbVotes carries thousands separators.
OMDB_RATINGS = T.StructType(
    [
        T.StructField("Title", T.StringType()),
        T.StructField("Year", T.StringType()),
        T.StructField("Rated", T.StringType()),
        T.StructField("Type", T.StringType()),
        T.StructField("Country", T.StringType()),
        T.StructField("Genre", T.StringType()),
        T.StructField("Director", T.StringType()),
        T.StructField("Actors", T.StringType()),
        T.StructField("imdbRating", T.StringType()),
        T.StructField("imdbVotes", T.StringType()),
        T.StructField("Metascore", T.StringType()),
        T.StructField(
            "Ratings",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("Source", T.StringType()),
                        T.StructField("Value", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("Response", T.StringType()),
    ]
)


def envelope_schema(payload: T.StructType) -> T.StructType:
    """`{_meta, data}` wrapper + `_corrupt_record` for PERMISSIVE parsing
    (S6) + the bare-payload fields at top level (S5: the loader accepts both
    shapes — load_raw_to_postgres.py:35-39)."""
    fields = [
        T.StructField("_meta", META),
        T.StructField("data", payload),
        *[T.StructField(f.name, f.dataType) for f in payload.fields],
        T.StructField("_corrupt_record", T.StringType()),
    ]
    return T.StructType(fields)
