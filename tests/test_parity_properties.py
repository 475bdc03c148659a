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


def test_asof_join_matches_pandas_merge_asof(spark):
    """Property: the union+window as-of join equals pandas.merge_asof
    (an entirely independent implementation) on random keyed event/quote
    frames — backward direction, <= semantics, ties to the latest right
    row."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from bigdata_meteo_datalake_spark.operators.asof import as_of_join

    ts = st.integers(min_value=0, max_value=50)
    key = st.integers(min_value=0, max_value=3)

    @given(
        left=st.lists(st.tuples(key, ts), min_size=1, max_size=25),
        right=st.lists(st.tuples(key, ts, st.integers(0, 1000)), min_size=1, max_size=25),
    )
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
    )
    def check(left, right):
        import pandas as pd

        # as_of_join requires the right side unique per (key, time):
        # keep the max value per (k, t), exactly what the docstring asks
        rdedup = {}
        for k, t, v in right:
            rdedup[(k, t)] = max(v, rdedup.get((k, t), v))
        rrows = [(k, t, v) for (k, t), v in sorted(rdedup.items())]
        lid = [(i, k, t) for i, (k, t) in enumerate(left)]

        ldf = spark.createDataFrame(lid, "row_id long, k long, lt long")
        rdf = spark.createDataFrame(rrows, "k long, rt long, quote long")
        got = {
            r["row_id"]: r["quote"]
            for r in as_of_join(
                ldf, rdf, ["k"], left_time="lt", right_time="rt",
                right_values=["quote"],
            ).collect()
        }

        lpd = pd.DataFrame(lid, columns=["row_id", "k", "lt"]).sort_values("lt")
        rpd = pd.DataFrame(rrows, columns=["k", "rt", "quote"]).sort_values("rt")
        want_df = pd.merge_asof(
            lpd, rpd, left_on="lt", right_on="rt", by="k", direction="backward"
        )
        want = {
            int(r.row_id): (None if pd.isna(r.quote) else int(r.quote))
            for r in want_df.itertuples()
        }
        assert got == want

    check()


def test_sessionize_matches_pure_python(spark):
    """Property: the lag+running-sum sessionization equals a pure-Python
    single-pass reference on random per-user event streams (30-unit gap,
    ties broken by event_id)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    GAP = 30

    @given(
        events=st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 200)),
            min_size=1,
            max_size=40,
            unique=True,
        )
    )
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
    )
    def check(events):
        rows = [(i, u, t) for i, (u, t) in enumerate(events)]
        df = spark.createDataFrame(rows, "event_id long, user_id long, t long")
        w = Window.partitionBy("user_id").orderBy("t", "event_id")
        gap = F.col("t") - F.lag("t").over(w)
        is_new = F.when(gap > GAP, 1).otherwise(0)
        running = w.rowsBetween(Window.unboundedPreceding, 0)
        got = {
            r["event_id"]: r["session_no"]
            for r in df.select(
                "event_id", F.sum(is_new).over(running).alias("session_no")
            ).collect()
        }

        want = {}
        by_user: dict = {}
        for i, u, t in rows:
            by_user.setdefault(u, []).append((t, i))
        for u, evs in by_user.items():
            evs.sort()
            sess, last_t = 0, None
            for t, i in evs:
                if last_t is not None and t - last_t > GAP:
                    sess += 1
                want[i] = sess
                last_t = t
        assert got == want

    check()
