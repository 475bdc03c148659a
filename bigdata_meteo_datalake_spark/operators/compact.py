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
