"""SparkSession factory.

Policy decisions (SURVEY.md section 4 "semantics gotchas"):

- ``spark.sql.ansi.enabled=false``: the reference cleans sentinel values
  ('N/A', '') *before* casting (stg_omdb_ratings.sql:24-40); with ANSI off a
  residual bad cast yields NULL exactly like Postgres' permissive staging
  behaviour instead of throwing.
- ``partitionOverwriteMode=dynamic``: re-running one snapshot_date replaces
  only that partition — the idempotent-rerun semantics of the reference's
  upsert + per-day export (load_raw_to_postgres.py:106-109,
  export_to_parquet.py:100).
- AQE on: runtime coalescing/skew handling for the 100 TB design point;
  ``spark.sql.shuffle.partitions`` sized to the local core count here, and
  meant to be raised to ~2-3x total cores on a real cluster.
- UTC session timezone so date/timestamp semantics are stable against the
  DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "bigdata-meteo-datalake-spark",
    *,
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or default_parallelism()
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def apply_session_policy(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime-settable policies to an externally created
    session (the driver hands us one in ``__spark_entry__.entry``)."""
    for k, v in {
        "spark.sql.ansi.enabled": "false",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.sources.partitionOverwriteMode": "dynamic",
        "spark.sql.adaptive.enabled": "true",
        # events.parquet stores INT64 TIMESTAMP(NANOS) which Spark has no
        # native type for; read as long and convert (sources/lake.py).
        "spark.sql.legacy.parquet.nanosAsLong": "true",
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - immutable conf on some builds
            pass
    return spark
