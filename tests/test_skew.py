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


def test_lsh_hot_band_guard_skips_degenerate_bucket(spark):
    """A degenerate LSH bucket (70 identical boilerplate docs -> one band
    key) is dropped by max_bucket_size, while an honest small bucket's pair
    survives — the skew guard wired into dedup_minhash_lsh."""
    from bigdata_meteo_datalake_spark.operators.dedup import (
        doc_shingle_hash_sets,
        lsh_candidate_pairs,
        minhash_signature,
    )

    boiler = [(i, "lorem ipsum dolor sit amet consectetur adipiscing elit") for i in range(70)]
    near = [
        (100, "spark shuffles partition data across the cluster nodes tonight"),
        (101, "spark shuffles partition data across the cluster nodes today"),
    ]
    docs = spark.createDataFrame(boiler + near, ["doc_id", "text"])
    sig = minhash_signature(doc_shingle_hash_sets(docs))

    unguarded = lsh_candidate_pairs(sig)
    # identical docs collide in every band: 70*69/2 boilerplate pairs
    assert unguarded.where(F.col("doc_a") < 100).count() == 70 * 69 // 2

    guarded = lsh_candidate_pairs(sig, max_bucket_size=64)
    got = {(r.doc_a, r.doc_b) for r in guarded.collect()}
    assert all(a >= 100 for a, _ in got), "hot bucket must be skipped"
    assert (100, 101) in got, "honest small bucket must survive the guard"


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
