"""Bronze ingest: envelope JSON lake -> typed raw tables (SURVEY.md S3-S9).

Reference behavior being re-expressed Spark-first:
- S3 envelope writer: `{_meta:{snapshot_date,run_id,...}, data}` one file per
  response under `raw/<source>/<endpoint>/date=<d>/` (fetch_tmdb.py:30-43).
- S4 directory-glob scan of one day's files (load_raw_to_postgres.py:83,117,161)
  -> here a partition-pruned `spark.read.json` over the `date=` directory.
- S5 envelope unwrap, accepting enveloped OR bare payloads
  (load_raw_to_postgres.py:35-39).
- S6 corrupt-record tolerance: per-file try/except skip
  (load_raw_to_postgres.py:153-155) -> PERMISSIVE mode + _corrupt_record.
- S7 filename-derived key: `imdb_id = json_file.stem`
  (load_raw_to_postgres.py:179) -> regexp over input_file_name().
- S8/S9 upsert + DDL -> last-write-wins window dedup (operators/upsert.py)
  over a partitioned lake table; schema declared, never inferred.

Scale notes: the JSON scan is embarrassingly parallel (one task per file
split); the only shuffle on the load path is the upsert dedup's hash
partition by key. `date=` directories give partition pruning so a daily run
reads exactly one day regardless of lake size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import envelope_schema


def filename_stem() -> Column:
    """S7: key from the file path, not the payload."""
    return F.regexp_extract(F.input_file_name(), r"([^/]+)\.json$", 1)


def read_envelope_json(
    spark: SparkSession,
    path: str,
    payload_schema: T.StructType,
    *,
    multiline: bool = True,
) -> DataFrame:
    """Read raw lake JSON with the `{_meta, data}` envelope, tolerating bare
    payloads (S5) and malformed files (S6). Returns columns:
    `payload` (typed struct), `_meta` (struct or NULL), `src_file` (stem),
    `is_corrupt` (bool).
    """
    from pyspark.errors import AnalysisException

    from ..schemas import META

    schema = envelope_schema(payload_schema)
    out_schema = T.StructType(
        [
            T.StructField("payload", payload_schema),
            T.StructField("_meta", META),
            T.StructField("src_file", T.StringType()),
            T.StructField("is_corrupt", T.BooleanType()),
        ]
    )
    try:
        raw = spark.read.schema(schema).json(path, multiLine=multiline, mode="PERMISSIVE")
        raw.schema  # force analysis so PATH_NOT_FOUND surfaces here
    except AnalysisException:
        # an endpoint with no files for this date is an empty input, not an
        # error — mirrors the reference's no-op glob loop
        return spark.createDataFrame([], out_schema)
    bare = F.struct(*[F.col(f.name) for f in payload_schema.fields])
    return raw.select(
        F.when(F.col("data").isNotNull(), F.col("data")).otherwise(bare).alias("payload"),
        F.col("_meta"),
        filename_stem().alias("src_file"),
        F.col("_corrupt_record").isNotNull().alias("is_corrupt"),
    )


def drop_corrupt(df: DataFrame) -> DataFrame:
    """S6: skip unparseable files, never fail the run
    (load_raw_to_postgres.py:153-155)."""
    return df.where(~F.col("is_corrupt")).drop("is_corrupt")


def write_envelope_json(
    df: DataFrame,
    path: str,
    *,
    date_col: str = "date",
) -> None:
    """S3: write an envelope-shaped DataFrame to the raw lake, Hive-partitioned
    by date (fetch_tmdb.py:54,70). The df must carry `_meta` and `data`."""
    df.write.mode("overwrite").partitionBy(date_col).json(path)
