"""Snapshot diff / change-data-capture over the lake
(the reference's world is daily snapshot partitions — SURVEY.md section 1.2;
the natural derived operator is "what changed between two snapshots", the
lake-side substitute for a database change feed).

One full-outer equi-join on the key, change classification from null-ness
and column comparison. At 100 TB both sides are day partitions of the same
table — partition pruning makes the diff proportional to two days, and the
join key is the table's primary key (uniform, no skew).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Classify every key as insert / delete / update / unchanged between
    two snapshots. Output: keys..., change_type, plus old_<c>/new_<c> for
    each compared column. NULL-safe comparison (`<=>`) so NULL->value and
    value->NULL count as updates."""
    o = old.select(*keys, *compare_cols)
    n = new.select(*keys, *compare_cols)
    for c in compare_cols:
        o = o.withColumnRenamed(c, f"old_{c}")
        n = n.withColumnRenamed(c, f"new_{c}")
    o = o.withColumn("__in_old", F.lit(True))
    n = n.withColumn("__in_new", F.lit(True))
    joined = o.join(n, list(keys), "full_outer")
    same = None
    for c in compare_cols:
        eq = F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        same = eq if same is None else (same & eq)
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("update"))
    )
    return joined.select(
        *keys,
        change.alias("change_type"),
        *[F.col(f"old_{c}") for c in compare_cols],
        *[F.col(f"new_{c}") for c in compare_cols],
    )


def scd2_from_snapshots(
    snaps: DataFrame,
    keys: Sequence[str],
    attr_cols: Sequence[str],
    *,
    date_col: str = "snap_date",
) -> DataFrame:
    """Collapse per-date snapshots into SCD2 validity intervals: one row
    per (key, attribute-run) with valid_from / valid_to / is_current —
    the slowly-changing-dimension builder a daily-snapshot lake feeds.

    Change detection is a null-safe lag comparison per key; versions are a
    running count of changes; valid_to is the next version's valid_from
    (NULL = current). Every window partitions by the key — per-key state
    only, no global ordering, so the operator scales with the dimension's
    key cardinality."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(date_col)
    changed = None
    for c in attr_cols:
        neq = ~F.col(c).eqNullSafe(F.lag(c).over(w))
        changed = neq if changed is None else (changed | neq)
    versioned = snaps.withColumn(
        "version",
        F.sum(changed.cast("int")).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    runs = versioned.groupBy(*keys, "version", *attr_cols).agg(
        F.min(date_col).alias("valid_from")
    )
    w2 = Window.partitionBy(*keys).orderBy("version")
    return runs.select(
        *keys,
        "version",
        *attr_cols,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
    )


def apply_changes(
    diff: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
    *,
    side: str = "new",
) -> DataFrame:
    """Reconstruct a snapshot from a :func:`snapshot_diff` change feed —
    the inverse operator, and the consumer side of a CDC pipeline (apply
    the feed to a replica). ``side="new"`` rebuilds the newer snapshot
    (drop deletes, take new_*); ``side="old"`` rebuilds the older one
    (drop inserts, take old_*). snapshot_diff ∘ apply_changes is the
    identity on snapshots — asserted in tests."""
    if side not in ("new", "old"):
        raise ValueError(f"side must be 'new' or 'old', got {side!r}")
    drop = "delete" if side == "new" else "insert"
    prefix = f"{side}_"
    return diff.where(F.col("change_type") != drop).select(
        *keys, *[F.col(f"{prefix}{c}").alias(c) for c in compare_cols]
    )
