"""DuckDB-oracle comparison mirroring the driver's correctness gate:
row count + schema (sorted column names) + order-insensitive values.

Lives in the package (not just the test tree) so the CLI ``verify``
subcommand gives users the same gate the driver and pytest apply.
"""

from __future__ import annotations

import datetime as _dt
from decimal import Decimal

import duckdb
import pandas as pd

from .sources.lake import TESTDATA_TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            s = s.map(
                lambda v: float(v)
                if isinstance(v, Decimal)
                else (_dt.datetime(v.year, v.month, v.day) if type(v) is _dt.date else v)
            )
            if s.map(lambda v: v is None or isinstance(v, _dt.datetime)).all() and not s.isna().all():
                s = pd.to_datetime(s).astype("datetime64[us]")
            df[c] = s
        elif str(s.dtype).startswith("datetime64"):
            df[c] = s.astype("datetime64[us]")
        elif str(s.dtype) in ("float32",):
            df[c] = s.astype("float64")
        elif str(s.dtype).startswith(("int", "uint", "Int")):
            df[c] = s.astype("int64")
        elif str(s.dtype) == "bool":
            df[c] = s.astype("bool")
    # order-insensitive: sort rows by the string form of every column
    if len(df):
        key = df.astype(str).agg("|".join, axis=1)
        df = df.loc[key.sort_values(kind="mergesort").index]
    return df.reset_index(drop=True)


def _dtype_kind(s: pd.Series) -> str:
    """Coarse dtype kind: the driver's value hash distinguishes 3 from 3.0,
    so int-vs-float (and bool/datetime/object) must match even after
    ``_normalize`` widened widths."""
    k = s.dtype.kind  # 'i','u','f','b','M','O',...
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    return "object"


def compare_frames(actual: pd.DataFrame, expected: pd.DataFrame) -> None:
    """Driver-style compare: sorted-column schema, row count, dtype *kind*
    per column (int/float/bool/datetime/object — the driver's value hash
    distinguishes 3 from 3.0, so ``check_dtype=False`` alone is weaker than
    the driver's gate), then exact values order-insensitively."""
    assert sorted(actual.columns) == sorted(expected.columns), (
        f"columns differ: actual={sorted(actual.columns)} expected={sorted(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"row counts differ: actual={len(actual)} expected={len(expected)}"
    )
    a, e = _normalize(actual), _normalize(expected)
    kind_diffs = {
        c: (_dtype_kind(a[c]), _dtype_kind(e[c]))
        for c in a.columns
        if _dtype_kind(a[c]) != _dtype_kind(e[c])
    }
    assert not kind_diffs, (
        "dtype kinds differ (spark, oracle) — the driver's value hash would "
        f"mismatch even on equal values: {kind_diffs}"
    )
    pd.testing.assert_frame_equal(a, e, check_dtype=False, check_exact=True)


def compare_to_oracle(spark_df, oracle_sql: str, sf_dir: str) -> None:
    con = duckdb_connect(sf_dir)
    try:
        expected = con.execute(oracle_sql).df()
    finally:
        con.close()
    compare_frames(spark_df.toPandas(), expected)
