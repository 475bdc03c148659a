"""As-of and range joins — operators Spark lacks natively, composed from
built-ins (guide: "bucketize the range key + equi-join on bucket + filter,
or union + window for as-of").

As-of join (union + ordered window): for each left row, the latest right
row with the same key and right_time <= left_time. One shuffle on the key
— same cost as a regular sort-merge join, no per-group pandas. The right
side must be unique per (key, time); pre-aggregate it if not (max_by).

Range join (bucketize): interval-containment joins would be O(n*m) nested
loops; decomposing each interval into fixed-width buckets turns it into an
equi-join on the bucket plus a residual filter — the standard rewrite when
the interval table is too big to broadcast.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    *,
    left_time: str,
    right_time: str,
    right_values: Sequence[str],
) -> DataFrame:
    """Left as-of join: every left row, plus the `right_values` of the
    latest right row at-or-before `left_time` for the same `keys` (NULLs if
    none). Implemented as tagged union + last_value(ignoreNulls) over an
    ordered window — right rows sort before left rows at equal timestamps,
    so <= semantics hold."""
    lcols = left.columns
    l2 = left.withColumn("__t", F.col(left_time)).withColumn("__side", F.lit(1))
    # pack the right row's values into ONE struct so the window fill picks
    # the latest right ROW atomically — per-column last(ignorenulls) would
    # skip NULL values and stitch together a row that never existed
    r2 = (
        right.select(*keys, right_time, *right_values)
        .withColumn("__t", F.col(right_time))
        .withColumn("__side", F.lit(0))
        .withColumn("__rv", F.struct(*[F.col(v) for v in right_values]))
        .drop(right_time, *right_values)
    )
    merged = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = merged.withColumn(
        "__asof_rv", F.last(F.col("__rv"), ignorenulls=True).over(w)
    )
    out = filled.where(F.col("__side") == 1).select(
        *lcols, *[F.col(f"__asof_rv.{v}").alias(v) for v in right_values]
    )
    return out


def range_join_buckets(
    fact: DataFrame,
    ranges: DataFrame,
    *,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join fact rows to [lo, hi) intervals: explode each interval into the
    fixed-width buckets it overlaps, equi-join on the fact value's bucket,
    then apply the residual containment filter."""
    w = float(bucket_width)
    ranges_b = ranges.withColumn(
        "__rbucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor((F.col(hi_col) - 1e-9) / w).cast("long"),
            )
        ),
    )
    fact_b = fact.withColumn("__bucket", F.floor(F.col(value_col) / w).cast("long"))
    # containment belongs in the JOIN condition, not a post-filter — a
    # post-filter would drop the null-extended rows an outer join preserves
    cond = (
        (F.col("__bucket") == F.col("__rbucket"))
        & (F.col(value_col) >= F.col(lo_col))
        & (F.col(value_col) < F.col(hi_col))
    )
    joined = fact_b.join(ranges_b, cond, how)
    return joined.drop("__bucket", "__rbucket")
