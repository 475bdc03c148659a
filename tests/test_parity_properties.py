"""Property-based checks (hypothesis) of the cross-engine parity
primitives every oracle match rests on: the floor-form rounding, the
md5-derived token hash, and the exact-decimal sum convention must agree
between Spark and DuckDB on ARBITRARY inputs, not just the testdata.

Money-like inputs (two decimal places) mirror the convention's actual
domain: the decimal(28,6) accumulator is exact there, which is what makes
the sums partition-order-free and engine-identical."""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bigdata_meteo_datalake_spark.functions.numeric import round_half_up
from bigdata_meteo_datalake_spark.operators.dedup import token_hash, token_hash_sql

_SETTINGS = dict(
    max_examples=12,  # each example runs a Spark job — keep the loop tight
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

#: money-like doubles: exact hundredths, the shape every rounded aggregate
#: in the repo consumes
_MONEY = st.integers(min_value=-10**11, max_value=10**11).map(lambda c: c / 100.0)


@settings(**_SETTINGS)
@given(st.lists(_MONEY, min_size=1, max_size=8), st.integers(0, 6))
def test_round_half_up_matches_duckdb(spark, xs, scale):
    got = (
        spark.createDataFrame([(x,) for x in xs], "x double")
        .select(round_half_up(F.col("x"), scale).alias("r"))
        .toPandas()["r"]
        .tolist()
    )
    con = duckdb.connect()
    want = [
        con.execute(
            f"SELECT floor(CAST(? AS double) * {10**scale} + 0.5) / {10**scale}",
            [x],
        ).fetchone()[0]
        for x in xs
    ]
    con.close()
    assert got == want  # bit-identical, not approx


@settings(**_SETTINGS)
@given(
    st.lists(
        st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40),
        min_size=1,
        max_size=8,
    )
)
def test_token_hash_matches_duckdb(spark, texts):
    got = (
        spark.createDataFrame([(t,) for t in texts], "t string")
        .select(token_hash(F.col("t")).alias("h"))
        .toPandas()["h"]
        .tolist()
    )
    con = duckdb.connect()
    want = [
        con.execute(f"SELECT {token_hash_sql('?')}", [t]).fetchone()[0]
        for t in texts
    ]
    con.close()
    assert got == want


@settings(**_SETTINGS)
@given(st.lists(_MONEY, min_size=1, max_size=12))
def test_exact_decimal_sum_is_partition_order_insensitive(spark, xs):
    """The decimal(28,6) accumulator yields the SAME double no matter how
    rows are partitioned or ordered — the property plain double sums lack —
    and matches DuckDB's decimal sum exactly."""
    df1 = spark.createDataFrame([(x,) for x in xs], "x double").coalesce(1)
    df8 = spark.createDataFrame([(x,) for x in reversed(xs)], "x double").repartition(8)
    expr = F.round(F.sum(F.col("x").cast("decimal(28,6)")), 2).cast("double")
    a = df1.agg(expr.alias("s")).first()["s"]
    b = df8.agg(expr.alias("s")).first()["s"]
    assert a == b
    con = duckdb.connect()
    want = con.execute(
        "SELECT cast(round(sum(cast(x AS decimal(28,6))), 2) AS double) "
        "FROM (SELECT unnest(CAST(? AS double[])) AS x)",
        [list(xs)],
    ).fetchone()[0]
    con.close()
    assert a == want
