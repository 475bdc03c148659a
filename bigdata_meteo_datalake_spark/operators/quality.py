"""Data-quality check runner (SURVEY.md section 2.6, Q1-Q3).

The reference declares dbt ``not_null`` / ``unique`` tests
(models/staging/schema.yml:15-40, models/marts/schema.yml:11-29,106-115).
Here each check is a tiny aggregate returning a violation count; the runner
unions them into one report DataFrame so a pipeline can assert on it.

Scale notes: a not_null check is a scan with a pushed-down IS NULL filter +
count; a unique check is one hash aggregate on the key. Both are partial-
aggregated map-side; no data leaves the executors except one long per check.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    table: str
    kind: str  # "not_null" | "unique"
    columns: tuple[str, ...]

    @property
    def name(self) -> str:
        return f"{self.kind}__{self.table}__{'_'.join(self.columns)}"


def not_null_violations(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Total NULLs across every listed column (dbt runs one test per
    column; a multi-column Check aggregates them — no column is ignored)."""
    total = None
    for column in columns:
        term = F.sum(F.when(F.col(column).isNull(), 1).otherwise(0))
        total = term if total is None else total + term
    return df.select(total.cast("long").alias("n_violations"))


def unique_violations(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Rows belonging to a key that occurs more than once (dbt `unique`
    counts duplicated *values*; we count keys with count>1)."""
    return (
        df.groupBy(*columns)
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > 1)
        .select(F.count(F.lit(1)).cast("long").alias("n_violations"))
    )


@dataclass
class Contract:
    """dbt-style model contract: every declared column must exist with the
    declared Spark type, and no undeclared column may appear
    (models/marts/schema.yml:3-135 documents the two mart surfaces).
    A tuple of types allows the partitioned-readback form (e.g. the
    snapshot_date partition column re-infers as `date`)."""

    table: str
    columns: dict[str, str | tuple[str, ...]]


def contract_violations(df: DataFrame, contract: Contract) -> list[str]:
    """Named violations: missing / type-mismatched / undeclared columns.
    Pure schema comparison — no data is scanned."""
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out: list[str] = []
    for name, want in contract.columns.items():
        allowed = (want,) if isinstance(want, str) else tuple(want)
        if name not in actual:
            out.append(f"missing column {name!r}")
        elif actual[name] not in allowed:
            out.append(f"column {name!r} is {actual[name]}, expected {'/'.join(allowed)}")
    out.extend(f"undeclared column {name!r}" for name in actual if name not in contract.columns)
    return out


def run_checks(
    tables: dict[str, DataFrame],
    checks: Sequence[Check],
    spark: SparkSession,
    *,
    contracts: Sequence[Contract] = (),
) -> DataFrame:
    """Run every check; returns (check_name, table_name, kind, n_violations)."""
    parts: list[DataFrame] = []
    for chk in checks:
        df = tables[chk.table]
        viol = (
            not_null_violations(df, chk.columns)
            if chk.kind == "not_null"
            else unique_violations(df, chk.columns)
        )
        parts.append(
            viol.select(
                F.lit(chk.name).alias("check_name"),
                F.lit(chk.table).alias("table_name"),
                F.lit(chk.kind).alias("kind"),
                F.col("n_violations"),
            )
        )
    for con in contracts:
        n = len(contract_violations(tables[con.table], con))
        parts.append(
            spark.range(1).select(
                F.lit(f"contract__{con.table}").alias("check_name"),
                F.lit(con.table).alias("table_name"),
                F.lit("contract").alias("kind"),
                F.lit(n).cast("long").alias("n_violations"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def assert_checks(report: DataFrame) -> None:
    bad = [r.check_name for r in report.where(F.col("n_violations") > 0).collect()]
    if bad:
        raise AssertionError(f"quality checks failed: {bad}")
