"""Incremental rollup maintenance: N increments must equal one full
recompute, and an increment must only rewrite the day partitions it touches."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bigdata_meteo_datalake_spark.operators.rollup import (
    maintain_rollup,
    rollup_increment,
)
from bigdata_meteo_datalake_spark.sources.lake import read_table

from .conftest import SF0001
from .oracle_utils import compare_frames


def test_incremental_equals_full(spark, tmp_path):
    events = read_table(spark, SF0001, "events")
    path = str(tmp_path / "rollup")
    # three disjoint increments by event_id ranges (arbitrary arrival order)
    parts = [
        events.where(F.col("event_id") % 3 == i) for i in (2, 0, 1)
    ]
    for p in parts:
        result = maintain_rollup(spark, p, path)
    full = rollup_increment(events)
    compare_frames(
        result.withColumn("sum_value", F.col("sum_value").cast("double")).toPandas(),
        full.withColumn("sum_value", F.col("sum_value").cast("double")).toPandas(),
    )


def test_increment_touches_only_affected_days(spark, tmp_path):
    events = read_table(spark, SF0001, "events")
    path = str(tmp_path / "rollup2")
    maintain_rollup(spark, events, path)
    mtimes = {
        d: os.path.getmtime(os.path.join(path, d))
        for d in os.listdir(path)
        if d.startswith("day=")
    }
    # an increment touching one day only rewrites that day's partition
    one_day = events.where(F.col("ts").cast("date") == "2024-01-05")
    assert one_day.count() > 0
    maintain_rollup(spark, one_day, path)
    mtimes_after = {
        d: os.path.getmtime(os.path.join(path, d))
        for d in os.listdir(path)
        if d.startswith("day=")
    }
    changed = {d for d in mtimes if mtimes_after[d] != mtimes[d]}
    assert changed == {"day=2024-01-05"}


def test_backfill_sized_increment_fails_loudly(spark, tmp_path):
    # >10000 distinct day partitions in one "increment" is a backfill, not
    # an increment — the day-list pruning collect must raise, never
    # silently truncate the partition set (round-8 verdict item 7)
    import pytest

    huge = spark.range(10_001).select(
        (F.to_timestamp(F.lit("2000-01-01")) + F.make_interval(days=F.col("id")))
        .alias("ts"),
        F.lit("click").alias("event_type"),
        F.col("id").cast("double").alias("value"),
    )
    with pytest.raises(ValueError, match="backfill"):
        maintain_rollup(spark, huge, str(tmp_path / "rollup3"))
