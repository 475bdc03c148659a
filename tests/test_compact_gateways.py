"""Compaction rewrites partitions to a byte-sized file count; connector
gateways probe availability honestly and name their lake-native fallback."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_meteo_datalake_spark.operators.compact import compact_partition
from bigdata_meteo_datalake_spark.sources.gateways import (
    ConnectorUnavailable,
    delta_available,
    jdbc_read,
    merge_upsert,
)
from bigdata_meteo_datalake_spark.sources.lake import read_table

from .conftest import SF0001


def test_compact_partition(spark, tmp_path):
    path = str(tmp_path / "frag")
    ev = read_table(spark, SF0001, "events").withColumn(
        "day", F.col("ts").cast("date").cast("string")
    )
    # fragment: many tiny files per partition
    ev.repartition(16).write.partitionBy("day").parquet(path)
    day = ev.select("day").first()["day"]
    before = spark.read.parquet(path).where(F.col("day") == day)
    n_before = len([f for f in before.inputFiles() if f"day={day}" in f])
    rows_before = before.count()
    assert n_before > 1

    n_after = compact_partition(
        spark, path, partition_col="day", partition_value=day,
        target_file_bytes=10 * 1024 * 1024,
    )
    after = spark.read.parquet(path).where(F.col("day") == day)
    assert n_after == 1  # tiny partition -> single file
    assert after.count() == rows_before
    # other partitions untouched
    assert spark.read.parquet(path).count() == ev.count()


def test_gateways_unavailable_name_fallback(spark):
    assert delta_available() is False  # not in this container
    src = read_table(spark, SF0001, "orders").limit(1)
    with pytest.raises(ConnectorUnavailable, match="upsert_partition"):
        merge_upsert(spark, "/tmp/nowhere", src, ["o_orderkey"])
    with pytest.raises(ConnectorUnavailable, match="read_table"):
        jdbc_read(spark, "jdbc:postgresql://localhost:1/none", "t")
