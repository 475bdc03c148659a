"""Regression tests for as-of join row-atomicity and outer range joins
(bugs found in review: per-column ignorenulls fill stitched together rows
that never existed; post-join containment filters dropped null-extended
outer rows)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bigdata_meteo_datalake_spark.operators.asof import as_of_join, range_join_buckets


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_takes_latest_row_atomically(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 12:00:00"))], "k long, t timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 5.0, 50.0),
            (1, _ts("2024-01-01 11:00:00"), None, 70.0),  # latest: v1 is NULL
        ],
        "k long, rt timestamp, v1 double, v2 double",
    )
    out = as_of_join(
        left, right, ["k"], left_time="t", right_time="rt", right_values=["v1", "v2"]
    ).collect()[0]
    # the latest right ROW wins wholesale: v1 must be NULL (not 5.0 from
    # the older row) and v2 must be 70.0
    assert out["v1"] is None
    assert out["v2"] == 70.0


def test_asof_no_match_yields_nulls(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"))], "k long, t timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 5.0)], "k long, rt timestamp, v double"
    )
    out = as_of_join(
        left, right, ["k"], left_time="t", right_time="rt", right_values=["v"]
    ).collect()[0]
    assert out["v"] is None  # right row is later than the left row


def test_range_join_left_preserves_unmatched(spark):
    fact = spark.createDataFrame([(1, 50.0), (2, 999.0)], "id long, x double")
    ranges = spark.createDataFrame([("band", 0.0, 100.0)], "name string, lo double, hi double")
    out = range_join_buckets(
        fact, ranges, value_col="x", lo_col="lo", hi_col="hi",
        bucket_width=10.0, how="left",
    )
    rows = {r["id"]: r["name"] for r in out.collect()}
    assert rows == {1: "band", 2: None}  # unmatched fact row survives

    inner = range_join_buckets(
        fact, ranges, value_col="x", lo_col="lo", hi_col="hi",
        bucket_width=10.0,
    )
    assert {r["id"] for r in inner.collect()} == {1}


def test_cdc_diff_apply_round_trip(spark):
    """snapshot_diff ∘ apply_changes is the identity: both snapshots are
    exactly reconstructable from the change feed."""
    from bigdata_meteo_datalake_spark.operators.cdc import apply_changes, snapshot_diff
    from bigdata_meteo_datalake_spark.sources.lake import read_table

    from .conftest import SF0001
    from .oracle_utils import compare_frames

    ev = read_table(spark, SF0001, "events")

    def day(d):
        return (
            ev.where(F.col("ts").cast("date") == d)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
        )

    old, new = day("2024-01-01"), day("2024-01-02")
    diff = snapshot_diff(old, new, ["user_id"], ["n_events"])
    compare_frames(
        apply_changes(diff, ["user_id"], ["n_events"], side="new").toPandas(),
        new.toPandas(),
    )
    compare_frames(
        apply_changes(diff, ["user_id"], ["n_events"], side="old").toPandas(),
        old.toPandas(),
    )


def test_asof_tolerance_boundary(spark, tmp_path):
    """Exactly-at-tolerance matches stay fresh; one day past goes stale
    (values NULL, age still reported); no-match rows are NULL throughout."""
    from bigdata_meteo_datalake_spark.queries import queries

    d = str(tmp_path / "asoftol")
    spark.createDataFrame(
        [
            (0, _ts("2024-01-08 00:00:00"), 1, "a", 0.0, "{}"),  # age 7 -> fresh
            (1, _ts("2024-01-09 00:00:00"), 1, "a", 0.0, "{}"),  # age 8 -> stale
            (2, _ts("2024-01-01 00:00:00"), 2, "a", 0.0, "{}"),  # no match
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    spark.createDataFrame(
        [(10, 1, "O", 99.0, _ts("2024-01-01 00:00:00"), "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    out = {r.event_id: r for r in queries()["asof_join_tolerance"](spark, d).collect()}
    assert out[0].age_days == 7 and out[0].is_fresh is True
    assert out[0].last_orderkey_fresh == 10
    assert out[1].age_days == 8 and out[1].is_fresh is False
    assert out[1].last_orderkey_fresh is None and out[1].last_order_total_fresh is None
    assert out[2].age_days is None and out[2].is_fresh is None
    assert out[2].last_orderkey_fresh is None
