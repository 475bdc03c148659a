"""Incremental rollup maintenance (continuous-aggregate / hypertable-rollup
pattern): keep a time-bucketed aggregate table up to date by merging only
new increments, never rescanning history.

All maintained aggregates are decomposable (count, decimal sum, min, max),
so merging partials is itself one aggregation. The rollup table is
partitioned by day, and an increment only rewrites the day partitions it
touches (dynamic partition overwrite) — at 100 TB the nightly maintenance
cost is proportional to the increment, not the table.

The streaming analogue is the same `rollup_increment` expression inside
`foreachBatch` — batch twins keep the two paths semantically identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def rollup_increment(events: DataFrame, bucket: str = "1 hour") -> DataFrame:
    """Partial aggregate of one increment: (day, window_start, event_type)
    -> decomposable partials."""
    return (
        events.groupBy(
            F.window("ts", bucket).alias("win"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)")).alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("win.start").cast("date").alias("day"),
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "min_value",
            "max_value",
        )
    )


def merge_rollup(existing: DataFrame | None, increment: DataFrame) -> DataFrame:
    """Merge partials: union + re-aggregate on the bucket key. Counts/sums
    add; min/max combine; exact decimal sums keep the merge order-free."""
    merged = increment if existing is None else existing.unionByName(increment)
    return (
        merged.groupBy("day", "window_start", "event_type")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )


def maintain_rollup(
    spark: SparkSession,
    increment: DataFrame,
    rollup_path: str,
    *,
    bucket: str = "1 hour",
) -> DataFrame:
    """Apply one increment to the persisted rollup table: aggregate the
    increment, read back ONLY the affected day partitions, merge, and
    rewrite just those partitions.

    Increments are APPEND-ONLY deltas: applying the same rows twice
    double-counts (merge adds partials). To idempotently re-run a day,
    recompute it from source and overwrite that partition instead
    (`rollup_increment(day_events).write...` with dynamic overwrite) —
    the reference's O6 rerun semantics, not this function's."""
    from pyspark.errors import AnalysisException

    inc = rollup_increment(increment, bucket)
    # The day-list collect is DRIVER-SIDE BY DESIGN and bounded by the
    # increment's calendar span (a nightly delta touches a handful of
    # days, late arrivals a few more) — it exists to push partition
    # pruning into the read-back below, which is what keeps maintenance
    # cost proportional to the increment at 100 TB. The cap turns a
    # mis-use (feeding years of history as one "increment", where the
    # pruning list itself would bloat the plan) into a loud error
    # instead of a silent slow job.
    days = [r["day"] for r in inc.select("day").distinct().limit(10001).collect()]
    if len(days) > 10000:
        raise ValueError(
            "increment touches >10000 day partitions — that is a backfill, "
            "not an increment; recompute those days from source with "
            "rollup_increment(day_events) + dynamic partition overwrite "
            "instead of merging one giant delta"
        )
    try:
        existing = spark.read.parquet(rollup_path).where(F.col("day").isin(days))
        existing.schema  # force analysis so a missing table surfaces here
    except AnalysisException as exc:
        # only "table does not exist yet" may be treated as empty history —
        # any other failure must abort, or the overwrite would silently
        # replace real partials with increment-only ones
        if "PATH_NOT_FOUND" not in str(exc) and "Path does not exist" not in str(exc):
            raise
        existing = None
    merged = merge_rollup(existing, inc)
    merged.write.mode("overwrite").partitionBy("day").parquet(rollup_path)
    return spark.read.parquet(rollup_path)
