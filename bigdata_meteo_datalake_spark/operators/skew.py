"""Skew mitigation: salting for hot keys (SURVEY.md section 4 — the 100 TB
design point; AQE's skew-join handles sort-merge spills at runtime, salting
is the declarative-plan counterpart that also covers aggregations).

Correctness contract: salted results are IDENTICAL to unsalted ones — the
salt only changes physical distribution — so every salted operator here is
checked for equality against its plain form (tests/test_skew.py) and
`salted_user_event_stats` against a plain-SQL oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int) -> DataFrame:
    """Deterministic row-spread salt (any spread works; hash of the row id
    keeps runs reproducible, unlike rand())."""
    return df.withColumn(
        "__salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))
    )


def salted_count_sum(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    *,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregate for skewed group keys: phase 1 aggregates on
    (keys, salt) — the hot key fans out over `n_salts` reducers — phase 2
    merges the partials on the true keys. Sums use the engine's decimal
    convention so the salted result is bit-identical to the plain one.
    Output: keys..., n_rows, sum_<col>..."""
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "__salt").agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(F.col(c).cast("decimal(28,6)")).alias(f"__s_{c}") for c in sum_cols],
    )
    return partial.groupBy(*keys).agg(
        F.sum("__n").cast("long").alias("n_rows"),
        *[F.sum(f"__s_{c}").alias(f"sum_{c}") for c in sum_cols],
    )


def salted_broadcast_left_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    *,
    n_salts: int = 16,
) -> DataFrame:
    """Skewed-key equi-join: replicate the small side across `n_salts`
    salt values and spread the big side, so one hot key no longer lands on
    a single reducer. (With a broadcastable small side Spark never shuffles
    anyway — this is the pattern for when it grows past the broadcast
    threshold; the salt columns are dropped from the output.)"""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    small_rep = small.select("*", salts)
    big_salted = with_salt(big, n_salts)
    out = big_salted.join(small_rep, [key, "__salt"], "left")
    return out.drop("__salt")
