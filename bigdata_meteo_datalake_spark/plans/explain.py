"""Plan-inspection helpers: make the 100 TB properties assertable.

"Would this plan survive a 100x scale-up?" is a property of the physical
plan, not of a timing at sf0.1 — so the engine asserts plan shape in tests:
filters pushed to the parquet scan, projections pruned, dimension joins
broadcast, no shuffle where co-location should hold.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    return jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def n_nodes(df: DataFrame, node: str) -> int:
    """Count physical nodes by their numbered detail entries — the formatted
    plan prints each node twice (tree + `(n) Node` detail), so plain
    substring counts double-count."""
    return len(re.findall(rf"^\(\d+\) {node}\b", plan_string(df), re.MULTILINE))


def n_shuffle_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges only (broadcast exchanges excluded)."""
    return n_nodes(df, "Exchange")


def n_broadcast_joins(df: DataFrame) -> int:
    return n_nodes(df, "BroadcastHashJoin")


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if some scan's PushedFilters mentions `fragment`."""
    plan = plan_string(df)
    return any(
        fragment in line for line in plan.splitlines() if "PushedFilters" in line
    )


def scan_read_columns(df: DataFrame, table_fragment: str) -> list[str]:
    """Columns actually read by the scan whose location matches
    `table_fragment` (column-pruning check)."""
    plan = plan_string(df)
    blocks = plan.split("\n\n")
    for block in blocks:
        if "Scan parquet" in block and table_fragment in block:
            for line in block.splitlines():
                if line.startswith("ReadSchema"):
                    schema = line.split("struct<", 1)[-1].rstrip(">")
                    return [f.split(":")[0] for f in schema.split(",") if f]
    return []
