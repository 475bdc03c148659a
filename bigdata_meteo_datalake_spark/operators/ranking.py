"""Window-free ranking for small materialized relations.

Partition-less windows are banned repo-wide (the single-task shape that
dies at 100x), so the tails of TakeOrdered cuts — the <= few-thousand-row
relations that genuinely need a total rank — use a broadcast count-join
instead: rank(r) = 1 + count of rows strictly ahead of r in the
(value desc, id asc) total order. O(n^2) comparisons on a tiny broadcast
side beats shipping the whole relation to one task at scale, and the
result is deterministic because the order is total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rank_by_count_join(
    df: DataFrame, *, value_col: str, id_col: str, rank_col: str = "rn"
) -> DataFrame:
    """All of ``df``'s columns plus ``rank_col``: the 1-based position of
    each row under (value desc, id asc). ``df`` should already be small
    and materialized (a TakeOrdered/limit tail, localCheckpointed) — both
    join sides re-read it."""
    a, b = df.alias("a"), df.alias("b")
    ahead = (F.col(f"b.{value_col}") > F.col(f"a.{value_col}")) | (
        (F.col(f"b.{value_col}") == F.col(f"a.{value_col}"))
        & (F.col(f"b.{id_col}") < F.col(f"a.{id_col}"))
    )
    return (
        a.join(F.broadcast(b), ahead, "left")
        .groupBy(*[F.col(f"a.{c}").alias(c) for c in df.columns])
        .agg((F.count(F.col(f"b.{id_col}")) + 1).alias(rank_col))
    )
