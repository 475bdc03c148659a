"""End-to-end movies-pipeline parity: fixture raw JSON lake -> bronze ->
staging -> marts, checked (a) against hand-derived edge expectations
(FIXTURES.md A6 edge rows) and (b) full-frame against DuckDB running the
translated reference SQL over the same bronze parquet."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from bigdata_meteo_datalake_spark.functions.numeric import oracle_avg, oracle_ratio
from bigdata_meteo_datalake_spark.plans.pipeline import run

from .fixtures_movies import DAY1, DAY2, build_lake
from .oracle_utils import compare_frames


@pytest.fixture(scope="module")
def lake(tmp_path_factory):
    return build_lake(str(tmp_path_factory.mktemp("movies_lake")))


@pytest.fixture(scope="module")
def results(spark, lake):
    r1 = run(spark, lake, DAY1, run_id="test1")
    r2 = run(spark, lake, DAY2, run_id="test2")
    return {"lake": lake, DAY1: r1, DAY2: r2}


def _enriched_rows(results, day):
    df = results[day].tables["movies_enriched_daily"]
    return {r["tmdb_id"]: r.asDict() for r in df.collect()}


def test_enriched_edge_rows_day1(results):
    rows = _enriched_rows(results, DAY1)
    assert sorted(rows) == [101, 102, 103, 104, 105, 106, 107]

    m1 = rows[101]
    # S8 last-write-wins: rerun file's title + rerun detail's runtime win
    assert m1["title"] == "Film A v2"
    assert m1["runtime_minutes"] == 102
    assert m1["imdb_votes"] == 1234567  # P7 thousands-separator strip
    assert m1["composite_score"] == pytest.approx(7.7 * 0.6 + 6.8 * 0.4)  # 7.34
    assert m1["missing_omdb_data"] is False
    assert m1["release_year"] == 2025

    m2 = rows[102]  # popular-only: J1 left-preserve, P5 ''->NULL
    assert m2["release_date"] is None and m2["imdb_id"] is None
    assert m2["missing_omdb_data"] is True
    assert m2["composite_score"] == pytest.approx(6.5)  # tmdb branch

    m3 = rows[103]  # J2: NULL imdb_id never matches
    assert m3["imdb_id"] is None and m3["missing_omdb_data"] is True

    m4 = rows[104]  # P6: imdbRating N/A -> NULL, metascore kept
    assert m4["imdb_rating"] is None and m4["metascore"] == 55
    assert m4["runtime_minutes"] is None  # P5: '' runtime
    assert m4["composite_score"] == pytest.approx(5.5)  # cascade -> tmdb
    assert m4["is_overhyped"] is True  # 60 >= 50, coalesce -> 5.5 < 6.0

    m5 = rows[105]  # boundary popularity == 50, imdb 5.9
    assert m5["composite_score"] == pytest.approx(5.9)  # imdb-only branch
    assert m5["is_overhyped"] is True

    m6 = rows[106]  # boundary popularity == 30: NOT < 30
    assert m6["is_hidden_gem"] is False

    m7 = rows[107]  # 29.9 < 30, rating exactly 7.5 >= 7.5; bare-payload detail
    assert m7["is_hidden_gem"] is True
    assert m7["runtime_minutes"] == 75  # S5: envelope-less file was read


def test_kpi_day2_all_null_imdb(results):
    kpi = results[DAY2].tables["kpi_daily_summary"].collect()
    assert len(kpi) == 1
    row = kpi[0].asDict()
    assert row["nb_movies"] == 2
    assert row["nb_movies_with_omdb"] == 0
    assert row["avg_imdb_rating"] is None  # A5: all-NULL group -> NULL, not 0


def test_quality_report_clean(results):
    for day in (DAY1, DAY2):
        report = results[day].quality_report
        assert report.where(F.col("n_violations") > 0).count() == 0


_DUCKDB_ENRICHED = """
WITH pop AS (
  SELECT snapshot_date::date AS snapshot_date, tmdb_id, title,
         nullif(payload.release_date, '')::date AS release_date,
         payload.popularity::double AS popularity,
         payload.vote_average::double AS tmdb_rating,
         payload.vote_count::int AS tmdb_vote_count,
         payload.original_language AS original_language,
         to_json(payload.genre_ids) AS genre_ids_json
  FROM read_parquet('{lake}/bronze/raw_tmdb_popular/*/*.parquet', hive_partitioning=true)
),
det AS (
  SELECT snapshot_date::date AS snapshot_date, tmdb_id,
         nullif(imdb_id, '') AS imdb_id,
         nullif(payload.release_date, '')::date AS release_date_det,
         nullif(payload.runtime, '')::int AS runtime_minutes,
         payload.status AS status
  FROM read_parquet('{lake}/bronze/raw_tmdb_details/*/*.parquet', hive_partitioning=true)
),
omdb AS (
  SELECT snapshot_date::date AS snapshot_date, imdb_id,
         (CASE WHEN payload.imdbRating = 'N/A' THEN NULL ELSE payload.imdbRating END)::double AS imdb_rating,
         replace(CASE WHEN payload.imdbVotes = 'N/A' THEN NULL ELSE payload.imdbVotes END, ',', '')::bigint AS imdb_votes,
         (CASE WHEN payload.Metascore = 'N/A' THEN NULL ELSE payload.Metascore END)::int AS metascore,
         CASE WHEN payload.Rated = 'N/A' THEN NULL ELSE payload.Rated END AS rated,
         payload.Type AS type,
         CASE WHEN payload.Country = 'N/A' THEN NULL ELSE payload.Country END AS omdb_country,
         CASE WHEN payload.Genre = 'N/A' THEN NULL ELSE payload.Genre END AS omdb_genre,
         CASE WHEN payload.Director = 'N/A' THEN NULL ELSE payload.Director END AS director,
         CASE WHEN payload.Actors = 'N/A' THEN NULL ELSE payload.Actors END AS actors,
         to_json(payload.Ratings) AS omdb_ratings_json,
         imdb_id AS omdb_imdb_id
  FROM read_parquet('{lake}/bronze/raw_omdb_ratings/*/*.parquet', hive_partitioning=true)
)
SELECT p.snapshot_date, p.tmdb_id, p.title, p.release_date,
       year(p.release_date)::int AS release_year,
       p.popularity, p.tmdb_rating, p.tmdb_vote_count, p.original_language,
       p.genre_ids_json,
       d.imdb_id, d.runtime_minutes, d.status,
       o.imdb_rating, o.imdb_votes, o.metascore, o.rated, o.type,
       o.omdb_country, o.omdb_genre, o.director, o.actors, o.omdb_ratings_json,
       (o.omdb_imdb_id IS NULL) AS missing_omdb_data,
       CASE WHEN o.imdb_rating IS NOT NULL AND o.metascore IS NOT NULL
              THEN floor((o.imdb_rating * 0.6 + (o.metascore / 10.0) * 0.4) * 100 + 0.5) / 100
            WHEN o.imdb_rating IS NOT NULL
              THEN floor(o.imdb_rating * 100 + 0.5) / 100
            ELSE floor(p.tmdb_rating * 100 + 0.5) / 100
       END AS composite_score,
       (p.popularity >= 50 AND coalesce(o.imdb_rating, p.tmdb_rating) < 6.0) AS is_overhyped,
       (p.popularity < 30 AND coalesce(o.imdb_rating, p.tmdb_rating) >= 7.5) AS is_hidden_gem
FROM pop p
LEFT JOIN det d ON p.snapshot_date = d.snapshot_date AND p.tmdb_id = d.tmdb_id
LEFT JOIN omdb o ON p.snapshot_date = o.snapshot_date AND d.imdb_id = o.imdb_id
WHERE p.snapshot_date = '{day}'
"""


def _kpi_sql(lake: str, day: str) -> str:
    enriched = _DUCKDB_ENRICHED.format(lake=lake, day=day)
    return f"""
WITH enriched AS ({enriched})
SELECT snapshot_date,
       count(*) AS nb_movies,
       cast(sum(CASE WHEN NOT missing_omdb_data THEN 1 ELSE 0 END) AS bigint)
         AS nb_movies_with_omdb,
       {oracle_ratio("sum(CASE WHEN NOT missing_omdb_data THEN 1 ELSE 0 END)", "count(*)")}
         AS omdb_coverage_ratio,
       {oracle_avg("tmdb_rating")} AS avg_tmdb_rating,
       {oracle_avg("imdb_rating")} AS avg_imdb_rating,
       {oracle_avg("popularity")} AS avg_popularity,
       cast(sum(CASE WHEN coalesce(is_overhyped, false) THEN 1 ELSE 0 END) AS bigint)
         AS nb_overhyped,
       cast(sum(CASE WHEN coalesce(is_hidden_gem, false) THEN 1 ELSE 0 END) AS bigint)
         AS nb_hidden_gems
FROM enriched GROUP BY snapshot_date
"""


@pytest.mark.parametrize("day", [DAY1, DAY2])
def test_enriched_full_frame_vs_duckdb(results, day):
    lake = results["lake"]
    actual = results[day].tables["movies_enriched_daily"].toPandas()
    expected = duckdb.sql(_DUCKDB_ENRICHED.format(lake=lake, day=day)).df()
    compare_frames(actual, expected)


@pytest.mark.parametrize("day", [DAY1, DAY2])
def test_kpi_full_frame_vs_duckdb(results, day):
    lake = results["lake"]
    actual = results[day].tables["kpi_daily_summary"].toPandas()
    expected = duckdb.sql(_kpi_sql(lake, day)).df()
    compare_frames(actual, expected)


def test_rerun_idempotent_and_partition_scoped(spark, lake):
    """O6: re-running day1 must not duplicate day1 nor clobber day2
    (dynamic partition overwrite + last-write-wins upsert)."""
    run(spark, lake, DAY1, run_id="test1")
    before = spark.read.parquet(f"{lake}/usage/movies_enriched_daily").toPandas()
    run(spark, lake, DAY1, run_id="test1-rerun")
    after = spark.read.parquet(f"{lake}/usage/movies_enriched_daily").toPandas()
    compare_frames(after, before)
    days = sorted(str(d) for d in after["snapshot_date"].unique())
    assert days == [DAY1, DAY2]
    # the search gold table must also keep both days (regression: an
    # unpartitioned overwrite used to clobber prior days)
    search = spark.read.parquet(f"{lake}/usage/search_movies_enriched_daily")
    search_days = sorted(
        str(r[0]) for r in search.select("snapshot_date").distinct().collect()
    )
    assert search_days == [DAY1, DAY2]


def test_sql_twins_match_dataframe_models(spark, results):
    """SURVEY section 3.2: the SQL-string path must produce the same frames
    as the DataFrame-API path (same Catalyst semantics, two front-ends).
    Reads bronze fresh — earlier tests may have rewritten the zone files,
    and a cached plan's file listing would dangle."""
    from bigdata_meteo_datalake_spark import models
    from bigdata_meteo_datalake_spark.models.sql import run_models_sql

    lake = results["lake"]
    for day in (DAY1, DAY2):
        raw = {
            name: spark.read.parquet(f"{lake}/bronze/{name}").where(
                F.col("snapshot_date") == day
            )
            for name in ("raw_tmdb_popular", "raw_tmdb_details", "raw_omdb_ratings")
        }
        sql_out = run_models_sql(spark, raw)
        stg_pop = models.stg_tmdb_popular(raw["raw_tmdb_popular"])
        stg_det = models.stg_tmdb_details(raw["raw_tmdb_details"])
        stg_omdb = models.stg_omdb_ratings(raw["raw_omdb_ratings"])
        enriched = models.movies_enriched_daily(stg_pop, stg_det, stg_omdb)
        df_out = {
            "stg_tmdb_popular": stg_pop,
            "stg_tmdb_details": stg_det,
            "stg_omdb_ratings": stg_omdb,
            "movies_enriched_daily": enriched,
            "kpi_daily_summary": models.kpi_daily_summary(enriched),
        }
        for model, df in df_out.items():
            compare_frames(sql_out[model].toPandas(), df.toPandas())


def test_index_mapping_matches_reference(results):
    """The generated ES index DDL must carry the reference's exact field
    types for both indices (index_elasticsearch.py:179-225)."""
    from bigdata_meteo_datalake_spark.sources.search import (
        kpi_index_mapping,
        movies_enriched_index_mapping,
    )

    enriched = results[DAY1].tables["movies_enriched_daily"]
    kpi = results[DAY1].tables["kpi_daily_summary"]

    movies = movies_enriched_index_mapping(enriched)
    assert movies["settings"] == {"number_of_shards": 1, "number_of_replicas": 0}
    assert movies["mappings"]["properties"] == {
        "snapshot_date": {"type": "date"},
        "tmdb_id": {"type": "long"},
        "imdb_id": {"type": "keyword"},
        "title": {"type": "text", "fields": {"keyword": {"type": "keyword"}}},
        "original_language": {"type": "keyword"},
        "release_date": {"type": "date"},
        "release_year": {"type": "integer"},
        "popularity": {"type": "double"},
        "tmdb_rating": {"type": "double"},
        "tmdb_vote_count": {"type": "integer"},
        "imdb_rating": {"type": "double"},
        "imdb_votes": {"type": "integer"},
        "metascore": {"type": "double"},
        "composite_score": {"type": "double"},
        "runtime_minutes": {"type": "integer"},
        "status": {"type": "keyword"},
        "rated": {"type": "keyword"},
        "director": {"type": "text", "fields": {"keyword": {"type": "keyword"}}},
        "actors": {"type": "text"},
        "missing_omdb_data": {"type": "boolean"},
        "is_overhyped": {"type": "boolean"},
        "is_hidden_gem": {"type": "boolean"},
    }

    kpis = kpi_index_mapping(kpi)
    assert kpis["mappings"]["properties"] == {
        "snapshot_date": {"type": "date"},
        "nb_movies": {"type": "integer"},
        "nb_movies_with_omdb": {"type": "integer"},
        "omdb_coverage_ratio": {"type": "double"},
        "avg_tmdb_rating": {"type": "double"},
        "avg_imdb_rating": {"type": "double"},
        "avg_popularity": {"type": "double"},
        "nb_overhyped": {"type": "integer"},
        "nb_hidden_gems": {"type": "integer"},
    }


def test_create_index_if_missing(results):
    """DDL is create-iff-missing: PUT only after a 404 GET, skip on 200."""
    from bigdata_meteo_datalake_spark.sources.search import (
        create_index_if_missing,
        movies_enriched_index_mapping,
    )

    mapping = movies_enriched_index_mapping(
        results[DAY1].tables["movies_enriched_daily"]
    )
    calls = []
    existing: set[str] = set()

    def http(method, path, body):
        calls.append((method, path))
        if method == "GET":
            return (200, "{}") if path.lstrip("/") in existing else (404, "")
        existing.add(path.lstrip("/"))
        import json as _json

        assert _json.loads(body) == mapping  # the typed DDL is what's PUT
        return 200, "{}"

    assert create_index_if_missing("movies_enriched_daily", mapping, http=http)
    assert calls == [
        ("GET", "/movies_enriched_daily"),
        ("PUT", "/movies_enriched_daily"),
    ]
    assert not create_index_if_missing("movies_enriched_daily", mapping, http=http)
    assert calls[-1] == ("GET", "/movies_enriched_daily")


def test_mart_contract_violation_fails_gate(spark, results):
    """A contract break (wrong type, dropped column, undeclared extra) must
    fail assert_checks with the named contract row."""
    from bigdata_meteo_datalake_spark.operators.quality import (
        assert_checks,
        contract_violations,
        run_checks,
    )
    from bigdata_meteo_datalake_spark.plans.pipeline import MART_CONTRACTS

    enriched = results[DAY1].tables["movies_enriched_daily"]
    con = next(c for c in MART_CONTRACTS if c.table == "movies_enriched_daily")
    assert contract_violations(enriched, con) == []

    broken = (
        enriched.drop("title")  # missing declared column
        .withColumn("tmdb_rating", F.col("tmdb_rating").cast("string"))  # wrong type
        .withColumn("debug_col", F.lit(1))  # undeclared extra
    )
    viols = contract_violations(broken, con)
    assert len(viols) == 3
    assert any("missing column 'title'" in v for v in viols)
    assert any("'tmdb_rating' is string" in v for v in viols)
    assert any("undeclared column 'debug_col'" in v for v in viols)

    report = run_checks(
        {"movies_enriched_daily": broken}, [], spark, contracts=[con]
    )
    with pytest.raises(AssertionError, match="contract__movies_enriched_daily"):
        assert_checks(report)
