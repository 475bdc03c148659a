"""Last-write-wins upsert over immutable lake files (SURVEY.md S8).

The reference upserts row-at-a-time into Postgres with
``INSERT ... ON CONFLICT (snapshot_date, key) DO UPDATE SET ...``
(load_raw_to_postgres.py:103-110,142-150,185-192). On a lake there is no
in-place update; the Spark-first equivalent is *dedup on read/compact*:
keep, per key, the row with the greatest ingest ordering.

This is the engine's only window function on the parity surface (SURVEY
section 2.3 note). Ties are broken deterministically with a total order
(``tie_breakers``) — SURVEY section 4 gotcha 6.

Scale notes: ``row_number`` over ``partitionBy(keys)`` is one hash shuffle
on the key — the same shuffle a MERGE would need. For 100 TB, the write
path partitions by ``snapshot_date`` so compaction is per-partition and
re-runs only touch the affected day (dynamic partition overwrite).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_by_key(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str | Column,
    *,
    tie_breakers: Sequence[str | Column] = (),
) -> DataFrame:
    """Keep one row per ``keys``: the greatest ``order_col`` (last write wins),
    ties broken by ``tie_breakers`` descending."""
    order = [F.desc(order_col), *[F.desc(t) for t in tie_breakers]]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert_partition(
    existing: DataFrame | None,
    incoming: DataFrame,
    keys: Sequence[str],
    order_col: str,
    *,
    tie_breakers: Sequence[str] = (),
) -> DataFrame:
    """MERGE-equivalent for one snapshot partition: union existing rows with
    incoming rows, then last-write-wins dedup. Caller writes the result back
    with dynamic partition overwrite (idempotent re-runs, O6)."""
    merged = incoming if existing is None else existing.unionByName(incoming)
    return latest_by_key(merged, keys, order_col, tie_breakers=tie_breakers)
