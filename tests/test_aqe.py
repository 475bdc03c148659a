"""Adaptive Query Execution evidence: several operator docstrings defer
hot-key handling to 'AQE skew join' and partition sizing to runtime
coalescing — these tests prove both mechanisms actually engage on this
build, so the deferral is real, not aspirational."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F


@contextmanager
def _confs(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        try:
            old[key] = spark.conf.get(key)
        except Exception:
            old[key] = None
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_aqe_coalesces_tiny_shuffle_partitions(spark):
    """A 10-group aggregate under shuffle.partitions=32 must not run 32
    reduce tasks: AQE folds the near-empty post-shuffle partitions."""
    with _confs(
        spark,
        **{
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.coalescePartitions.enabled": "true",
            "spark.sql.shuffle.partitions": "32",
        },
    ):
        df = (
            spark.range(10_000)
            .select((F.col("id") % 10).alias("k"))
            .groupBy("k")
            .count()
        )
        assert len(df.collect()) == 10  # executing THIS df finalizes its plan
        plan = _executed_plan(df)
        assert "AQEShuffleRead" in plan and "coalesced" in plan, plan


def test_aqe_splits_skewed_join_partition(spark):
    """A sort-merge join with one mega-key must show skew=true in the
    executed plan once the skew thresholds are in reach — the runtime
    remedy the salting operator is the declarative alternative to."""
    with _confs(
        spark,
        **{
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.shuffle.partitions": "8",
        },
    ):
        # 95% of the fact rows share key 0; the dim is uniform
        fact = spark.range(200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.col("id").alias("payload"),
        )
        dim = spark.range(1000).select(F.col("id").alias("k"))
        joined = fact.join(dim, "k")
        assert len(joined.collect()) > 0  # executing THIS df finalizes its plan
        plan = _executed_plan(joined)
        assert "skew=true" in plan, plan
