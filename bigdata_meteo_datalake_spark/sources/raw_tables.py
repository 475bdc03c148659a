"""Raw (bronze) table builders: envelope JSON lake -> keyed upsert tables.

The three reference raw tables (DDL at load_raw_to_postgres.py:42-79):
  raw_tmdb_popular  key (snapshot_date, tmdb_id)  - page file exploded
  raw_tmdb_details  key (snapshot_date, tmdb_id)  - one file per movie
  raw_omdb_ratings  key (snapshot_date, imdb_id)  - one file per imdb_id,
                                                    KEY COMES FROM FILENAME
Payloads stay as typed structs (parsed once at bronze with explicit schemas
— the Spark-first replacement for lazy JSONB field access; Catalyst prunes
unused struct fields).

`created_at` (reference: TIMESTAMP DEFAULT NOW(), the upsert's implicit
last-write-wins order) maps to the envelope's extracted_at_utc with run_id
as the deterministic tie-breaker (SURVEY section 4 gotcha 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.upsert import latest_by_key
from ..schemas import OMDB_RATINGS, TMDB_DETAILS, TMDB_POPULAR_PAGE
from .bronze import drop_corrupt, read_envelope_json


def _meta_cols(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "created_at", F.to_timestamp(F.col("_meta.extracted_at_utc"))
    ).withColumn("run_id", F.col("_meta.run_id"))


def load_raw_tmdb_popular(
    spark: SparkSession, lake_root: str, snapshot_date: str
) -> DataFrame:
    """Popular page file(s) -> one row per result, skipping rows with no id
    (load_raw_to_postgres.py:97-110)."""
    path = f"{lake_root}/raw/tmdb/popular/date={snapshot_date}/*.json"
    env = _meta_cols(drop_corrupt(read_envelope_json(spark, path, TMDB_POPULAR_PAGE)))
    rows = env.select(
        F.explode("payload.results").alias("r"), "created_at", "run_id"
    ).where(F.col("r.id").isNotNull())
    out = rows.select(
        F.lit(snapshot_date).cast("date").alias("snapshot_date"),
        F.col("r.id").alias("tmdb_id"),
        F.col("r.title").alias("title"),
        F.col("r").alias("payload"),
        "created_at",
        "run_id",
    )
    return latest_by_key(
        out, ["snapshot_date", "tmdb_id"], "created_at", tie_breakers=["run_id"]
    )


def load_raw_tmdb_details(
    spark: SparkSession, lake_root: str, snapshot_date: str
) -> DataFrame:
    """One file per movie id; key from payload.id
    (load_raw_to_postgres.py:117-155)."""
    path = f"{lake_root}/raw/tmdb/details/date={snapshot_date}/*.json"
    env = _meta_cols(drop_corrupt(read_envelope_json(spark, path, TMDB_DETAILS)))
    out = env.where(F.col("payload.id").isNotNull()).select(
        F.lit(snapshot_date).cast("date").alias("snapshot_date"),
        F.col("payload.id").alias("tmdb_id"),
        F.col("payload.imdb_id").alias("imdb_id"),
        F.col("payload.title").alias("title"),
        F.col("payload").alias("payload"),
        "created_at",
        "run_id",
    )
    return latest_by_key(
        out, ["snapshot_date", "tmdb_id"], "created_at", tie_breakers=["run_id"]
    )


def load_raw_omdb_ratings(
    spark: SparkSession, lake_root: str, snapshot_date: str
) -> DataFrame:
    """One file per imdb_id; the KEY IS THE FILENAME STEM (S7,
    load_raw_to_postgres.py:179) and `Response != 'True'` rows are dropped
    (load_raw_to_postgres.py:182-183)."""
    path = f"{lake_root}/raw/omdb/ratings/date={snapshot_date}/*.json"
    env = _meta_cols(drop_corrupt(read_envelope_json(spark, path, OMDB_RATINGS)))
    out = (
        env.withColumn("imdb_id", F.col("src_file"))
        .where(F.col("payload.Response") == "True")
        .where(F.col("imdb_id") != "")
        .select(
            F.lit(snapshot_date).cast("date").alias("snapshot_date"),
            "imdb_id",
            F.col("payload.Title").alias("title"),
            F.col("payload").alias("payload"),
            "created_at",
            "run_id",
        )
    )
    return latest_by_key(
        out, ["snapshot_date", "imdb_id"], "created_at", tie_breakers=["run_id"]
    )
