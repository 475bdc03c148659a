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


def unpartitioned_windows(df: DataFrame) -> list[str]:
    """Window nodes whose partition spec is empty — at scale these move the
    ENTIRE input onto one task (the `WindowExec: No Partition Defined`
    warning), so the engine bans them outright: global top-k must be
    orderBy().limit() (TakeOrderedAndProject) and global running totals
    must shard. Returns the offending optimized-plan lines.

    Plan grammar: `Window [exprs], [partitionSpec], [orderSpec]`; with no
    partition the middle group is absent, leaving the order spec (its
    entries carry ASC/DESC) — or a single group when there is neither."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    bad: list[str] = []
    for raw in plan.splitlines():
        line = raw.lstrip(" :+-")
        if not line.startswith("Window "):
            continue
        groups: list[str] = []
        depth = 0
        buf: list[str] = []
        for ch in line:
            if ch == "[":
                depth += 1
                if depth == 1:
                    buf = []
                    continue
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append("".join(buf))
                    continue
            if depth >= 1:
                buf.append(ch)
        if len(groups) >= 3:
            continue  # partitioned
        if len(groups) == 2 and not re.search(r"\b(ASC|DESC)\b", groups[1]):
            continue  # partitionSpec present, no order spec
        bad.append(line)
    return bad


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
