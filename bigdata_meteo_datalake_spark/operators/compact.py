"""Small-file compaction (OPTIMIZE-style) for partitioned lake tables.

Daily micro-batch writes accumulate small files per partition (the
reference sidesteps this by writing exactly one file per day —
export_to_parquet.py:55-60; at scale that serializes the write). This
operator rewrites chosen partitions into a target file count sized by
bytes, preserving dynamic-partition-overwrite semantics so a compaction
is itself an idempotent, partition-scoped rewrite.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def compact_partition(
    spark: SparkSession,
    path: str,
    *,
    partition_col: str,
    partition_value,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite one partition of a partitioned parquet table into
    ceil(bytes / target_file_bytes) files. Returns the new file count.

    Reads only the target partition (pruned), sizes the rewrite from the
    partition's current on-disk bytes, and overwrites just that partition
    (dynamic overwrite). Safe to re-run."""
    def partition_files(df):
        # inputFiles() lists the whole table (it pre-dates partition
        # pruning) — restrict to this partition's directory
        return [
            f for f in df.inputFiles() if f"{partition_col}={partition_value}" in f
        ]

    df = spark.read.parquet(path).where(F.col(partition_col) == partition_value)
    # size through the Hadoop FileSystem API so any scheme (file/s3a/hdfs)
    # is measured — a local-only stat would see 0 bytes remotely and
    # collapse a huge partition into one serialized write
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    total = 0
    for f in partition_files(df):
        p = jvm.org.apache.hadoop.fs.Path(f)
        total += p.getFileSystem(hconf).getFileStatus(p).getLen()
    n_files = max(1, math.ceil(total / target_file_bytes))
    (
        df.repartition(n_files)
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(path)
    )
    out = spark.read.parquet(path).where(F.col(partition_col) == partition_value)
    return len(partition_files(out))


def zorder_key(x, y, *, bits: int = 16):
    """Morton / Z-order interleave of two non-negative integer columns:
    bit i of x lands at position 2i, bit i of y at 2i+1. Sorting (or
    range-partitioning) by this key gives file-level min/max locality on
    BOTH source columns at once — the mechanism behind OPTIMIZE ZORDER /
    liquid clustering: a parquet reader can then skip files on either
    predicate column, where a single-column sort only skips on one.

    Pure integer bit arithmetic (32 shiftleft/shiftright terms for 16
    bits) — identical in any engine; ``zorder_key_sql`` emits the DuckDB
    twin for oracle checks."""
    import functools
    import operator as op

    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)).cast("long"), 2 * i)
        )
        terms.append(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)).cast("long"), 2 * i + 1)
        )
    return functools.reduce(op.add, terms)


def zorder_key_sql(x: str, y: str, *, bits: int = 16) -> str:
    """DuckDB twin of :func:`zorder_key`."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_layout(df, x_col: str, y_col: str, *, n_files: int, bits: int = 16):
    """Cluster a DataFrame for a z-ordered write: range-partition on the
    interleaved key so each output file covers one contiguous z-range —
    i.e. a bounded rectangle in (x, y) space, giving min/max skipping on
    both columns. ``repartitionByRange`` samples partition bounds
    distributedly (no global sort, no driver collect); within-file order
    doesn't matter for footer stats, so no sortWithinPartitions is
    needed."""
    keyed = df.withColumn("__z", zorder_key(F.col(x_col), F.col(y_col), bits=bits))
    return keyed.repartitionByRange(n_files, "__z").drop("__z")
