"""Numeric-parity helpers.

The reference computes ratios/averages in Postgres ``numeric`` (exact,
arbitrary precision) and rounds to 2 decimals (kpi_daily_summary.sql:26-37,
movies_enriched_daily.sql:99-102). Spark doubles accumulate in partition
order, so a plain ``sum(double)`` is not bit-stable against an oracle engine.

Convention used by every oracle-checked aggregate in this repo:

1. cast the input to ``decimal(28,6)`` (exact, order-insensitive sum),
2. aggregate in decimal,
3. round, then cast the result back to ``double``.

Division (ratios, averages) casts the exact decimal numerator to double
*before* dividing by the exact integer count — one double division is
deterministic across engines, unlike a folded sum of doubles. The matching
DuckDB oracle SQL spells the same casts (see queries.py) so both engines
produce bit-identical doubles and the driver's value hash matches.

Rounding a *double* is done floor-style — ``floor(x * 10^s + 0.5) / 10^s``
— in both engines, because engine-native ``round(double, s)`` disagrees at
representation boundaries (Spark routes through Java BigDecimal of the
exact binary value, DuckDB through scaled-double nearbyint; e.g. an average
landing near x.xx5 rounds differently). The floor form is the same sequence
of IEEE ops in both engines, hence bit-identical. Engine-native ``round``
stays fine for exact DECIMAL values (both are HALF_UP there).

At 100 TB this is also the *fast* path: decimal sums stay inside Tungsten
whole-stage codegen with map-side partial aggregation; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(28,6)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def exact_sum(col: Column | str) -> Column:
    """Order-insensitive exact sum (decimal accumulator)."""
    return F.sum(_c(col).cast(DEC))


def rounded_sum(col: Column | str, scale: int = 2) -> Column:
    return F.round(exact_sum(col), scale).cast("double")


def dec_round(col: Column, scale: int = 2) -> Column:
    """Exact-decimal rounding of a scalar expression -> double (engine-
    native round is safe here because the value is decimal, not double)."""
    return F.round(col.cast(DEC), scale).cast("double")


def round_half_up(col: Column, scale: int = 2) -> Column:
    """Cross-engine-stable double rounding: floor(x * 10^s + 0.5) / 10^s."""
    p = 10**scale
    return F.floor(col * p + 0.5) / p


def rounded_avg(col: Column | str, scale: int = 2) -> Column:
    """Null-skipping average, rounded: exact decimal sum -> double / count.

    ``count(col)`` counts non-NULL only, mirroring SQL AVG semantics (SURVEY
    section 4 gotcha 4: an all-NULL group yields NULL, not 0).
    """
    return round_half_up(exact_sum(col).cast("double") / F.count(_c(col)), scale)


def rounded_ratio(num: Column, den: Column, scale: int = 2) -> Column:
    """Ratio of two aggregate expressions, computed as one double division."""
    return round_half_up(num.cast("double") / den.cast("double"), scale)


def count_if(cond: Column) -> Column:
    """A3 conditional count: ``sum(CASE WHEN cond THEN 1 ELSE 0 END)``
    (kpi_daily_summary.sql:25,40-51)."""
    return F.sum(F.when(cond, 1).otherwise(0))


def oracle_sum(expr: str, scale: int = 2) -> str:
    """DuckDB SQL twin of :func:`rounded_sum`."""
    return f"cast(round(sum(cast(({expr}) as decimal(28,6))), {scale}) as double)"


def oracle_round_half_up(expr: str, scale: int = 2) -> str:
    """DuckDB SQL twin of :func:`round_half_up`."""
    p = 10**scale
    return f"floor(({expr}) * {p} + 0.5) / {p}"


def oracle_avg(expr: str, scale: int = 2) -> str:
    """DuckDB SQL twin of :func:`rounded_avg`."""
    return oracle_round_half_up(
        f"cast(sum(cast(({expr}) as decimal(28,6))) as double) / count({expr})", scale
    )


def oracle_ratio(num: str, den: str, scale: int = 2) -> str:
    return oracle_round_half_up(
        f"cast(({num}) as double) / cast(({den}) as double)", scale
    )


def project_fence(df):
    """Optimizer fence between chained projections of expensive
    higher-order-function columns.

    ``CollapseProject`` merges adjacent projections by inlining an
    aliased expression into every reference site — and a reference
    INSIDE a later lambda multiplies the inlined tree by the array
    length. Three chained array stages (each a ``transform``/``filter``
    over the previous stage's column) therefore collapse into an
    O(n^3)-per-row expression (measured 25x slower on
    span_corruption_build at sf0.1). A one-element ``explode`` inserts a
    Generate node projections cannot merge across, so each stage's
    arrays materialize exactly once per row; the plan stays a pure map
    (no shuffle, no memory barrier) and column pruning still works.
    """
    from pyspark.sql import functions as F

    return df.withColumn("_fence", F.explode(F.array(F.lit(1)))).drop("_fence")
