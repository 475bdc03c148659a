"""Salting changes physical distribution only — results must be identical
to the unsalted plan, including on a synthetically skewed key."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_meteo_datalake_spark.operators.skew import (
    salted_broadcast_left_join,
    salted_count_sum,
)
from bigdata_meteo_datalake_spark.sources.lake import read_table

from .conftest import SF0001
from .oracle_utils import compare_frames


def _skewed(spark):
    """90% of rows on one hot key."""
    ev = read_table(spark, SF0001, "events")
    return ev.withColumn(
        "skew_key", F.when(F.col("event_id") % 10 < 9, F.lit(0)).otherwise(F.col("user_id"))
    )


def test_salted_aggregate_equals_plain(spark):
    df = _skewed(spark)
    salted = salted_count_sum(df, ["skew_key"], ["value"], n_salts=8).withColumn(
        "sum_value", F.col("sum_value").cast("double")
    )
    plain = df.groupBy("skew_key").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("sum_value"),
    )
    compare_frames(salted.toPandas(), plain.toPandas())


def test_salted_join_equals_plain(spark):
    df = _skewed(spark).select("event_id", "skew_key")
    dim = (
        _skewed(spark)
        .groupBy("skew_key")
        .agg(F.count(F.lit(1)).alias("key_freq"))
    )
    salted = salted_broadcast_left_join(df, dim, "skew_key", n_salts=8)
    plain = df.join(dim, "skew_key", "left")
    compare_frames(
        salted.select("event_id", "skew_key", "key_freq").toPandas(),
        plain.select("event_id", "skew_key", "key_freq").toPandas(),
    )
