"""As-of / range-join / profiling queries (operators Spark lacks natively,
composed from built-ins — checked against DuckDB's native forms)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.numeric import rounded_sum
from ..operators.asof import as_of_join, range_join_buckets
from ..sources.lake import read_table
from . import register

# --- as-of join: latest order at-or-before each event ------------------------------

_ASOF_ORACLE = """
WITH r AS (
  SELECT o_custkey AS user_id,
         o_orderdate,
         arg_max(o_orderkey, o_orderkey)   AS last_orderkey,
         arg_max(o_totalprice, o_orderkey) AS last_order_total
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id,
       e.user_id,
       cast(e.ts AS timestamp) AS ts,
       r.last_orderkey,
       r.last_order_total
FROM events e
ASOF LEFT JOIN r ON e.user_id = r.user_id AND e.ts >= r.o_orderdate
"""


@register("asof_latest_order_per_event", oracle=_ASOF_ORACLE, tags=("extension", "asof"))
def asof_latest_order_per_event(spark, sf_dir):
    """As-of join: for each event, the latest order of the same user at or
    before the event time. Spark side = union + ordered window (one
    shuffle); oracle = DuckDB's native ASOF JOIN. The right side is
    pre-deduped to one row per (user, time) with max_by so both engines
    break ties identically."""
    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        read_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("order_ts"),
        )
        .agg(
            F.max("o_orderkey").alias("last_orderkey"),
            F.max_by("o_totalprice", "o_orderkey").alias("last_order_total"),
        )
    )
    return as_of_join(
        ev,
        orders,
        ["user_id"],
        left_time="ts",
        right_time="order_ts",
        right_values=["last_orderkey", "last_order_total"],
    )


# --- range join via bucket decomposition --------------------------------------------

_RANGE_ORACLE = """
WITH bands(band_name, lo, hi) AS (
  VALUES ('low', 0.0, 100000.0),
         ('mid', 100000.0, 300000.0),
         ('high', 300000.0, 600000.0)
)
SELECT b.band_name, count(*) AS n_orders,
       cast(round(sum(cast(o.o_totalprice AS decimal(28,6))), 2) AS double) AS band_total
FROM orders o
JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
GROUP BY b.band_name
"""


@register("range_join_price_bands", oracle=_RANGE_ORACLE, tags=("extension", "rangejoin"))
def range_join_price_bands(spark, sf_dir):
    """Interval-containment join decomposed into fixed-width buckets +
    equi-join + residual filter (the non-broadcast scale path; the oracle
    uses the naive theta join)."""
    o = read_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("low", 0.0, 100000.0), ("mid", 100000.0, 300000.0),
         ("high", 300000.0, 600000.0)],
        "band_name string, lo double, hi double",
    )
    joined = range_join_buckets(
        o, bands, value_col="o_totalprice", lo_col="lo", hi_col="hi",
        bucket_width=50000.0,
    )
    return joined.groupBy("band_name").agg(
        F.count(F.lit(1)).alias("n_orders"),
        rounded_sum("o_totalprice").alias("band_total"),
    )


# --- table profiling (ANALYZE-style column stats) -----------------------------------

_PROFILE_ORACLE = """
SELECT 'o_orderkey' AS column_name,
       cast(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS bigint) AS n_nulls,
       count(DISTINCT o_orderkey) AS n_distinct,
       cast(min(o_orderkey) AS varchar) AS min_value,
       cast(max(o_orderkey) AS varchar) AS max_value
FROM orders
UNION ALL
SELECT 'o_orderstatus',
       cast(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS bigint),
       count(DISTINCT o_orderstatus),
       cast(min(o_orderstatus) AS varchar),
       cast(max(o_orderstatus) AS varchar)
FROM orders
UNION ALL
SELECT 'o_totalprice',
       cast(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS bigint),
       count(DISTINCT o_totalprice),
       cast(min(o_totalprice) AS varchar),
       cast(max(o_totalprice) AS varchar)
FROM orders
"""


@register("profile_orders_columns", oracle=_PROFILE_ORACLE, tags=("extension", "profiling"))
def profile_orders_columns(spark, sf_dir):
    """ANALYZE-style column profile (null count, distinct count, min/max) —
    the stats a lakehouse maintains for pruning and CBO, computed in one
    pass per column set."""
    o = read_table(spark, sf_dir, "orders")

    def profile(col: str):
        return o.agg(
            F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_nulls"),
            F.countDistinct(col).alias("n_distinct"),
            F.min(col).cast("string").alias("min_value"),
            F.max(col).cast("string").alias("max_value"),
        ).select(F.lit(col).alias("column_name"), "*")

    out = profile("o_orderkey")
    for c in ("o_orderstatus", "o_totalprice"):
        out = out.unionByName(profile(c))
    return out


# --- snapshot diff (CDC over day partitions) ----------------------------------------

_CDC_ORACLE = """
WITH d1 AS (
  SELECT user_id, count(*) AS n_events,
         cast(round(sum(cast(value AS decimal(28,6))), 2) AS double) AS day_value
  FROM events WHERE cast(ts AS date) = DATE '2024-01-01' GROUP BY user_id
),
d2 AS (
  SELECT user_id, count(*) AS n_events,
         cast(round(sum(cast(value AS decimal(28,6))), 2) AS double) AS day_value
  FROM events WHERE cast(ts AS date) = DATE '2024-01-02' GROUP BY user_id
)
SELECT coalesce(d1.user_id, d2.user_id) AS user_id,
       CASE WHEN d1.user_id IS NULL THEN 'insert'
            WHEN d2.user_id IS NULL THEN 'delete'
            WHEN d1.n_events IS NOT DISTINCT FROM d2.n_events
                 AND d1.day_value IS NOT DISTINCT FROM d2.day_value THEN 'unchanged'
            ELSE 'update' END AS change_type,
       d1.n_events AS old_n_events,
       d1.day_value AS old_day_value,
       d2.n_events AS new_n_events,
       d2.day_value AS new_day_value
FROM d1 FULL OUTER JOIN d2 ON d1.user_id = d2.user_id
"""


@register("snapshot_diff_daily_users", oracle=_CDC_ORACLE, tags=("extension", "cdc"))
def snapshot_diff_daily_users(spark, sf_dir):
    """CDC over snapshot partitions: classify per-user daily aggregates
    between two days as insert/delete/update/unchanged — one full-outer
    join on the key with null-safe column comparison (operators/cdc.py)."""
    from ..operators.cdc import snapshot_diff

    ev = read_table(spark, sf_dir, "events")

    def day(d):
        return (
            ev.where(F.col("ts").cast("date") == d)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                rounded_sum("value").alias("day_value"),
            )
        )

    return snapshot_diff(
        day("2024-01-01"), day("2024-01-02"), ["user_id"], ["n_events", "day_value"]
    )


# --- SCD2: validity intervals from daily snapshots -----------------------------------

_SCD2_ORACLE = """
WITH snaps AS (
  SELECT user_id, cast(ts AS date) AS snap_date,
         CASE WHEN count(*) >= 3 THEN 'high'
              WHEN count(*) = 2 THEN 'mid'
              ELSE 'low' END AS activity_level
  FROM events GROUP BY user_id, cast(ts AS date)
),
flagged AS (
  SELECT user_id, snap_date, activity_level,
         CASE WHEN activity_level IS DISTINCT FROM
                   lag(activity_level) OVER (PARTITION BY user_id ORDER BY snap_date)
              THEN 1 ELSE 0 END AS chg
  FROM snaps
),
runs AS (
  SELECT user_id, snap_date, activity_level,
         sum(chg) OVER (PARTITION BY user_id ORDER BY snap_date
                        ROWS UNBOUNDED PRECEDING) AS version
  FROM flagged
),
grp AS (
  SELECT user_id, cast(version AS bigint) AS version, activity_level,
         min(snap_date) AS valid_from
  FROM runs GROUP BY user_id, version, activity_level
)
SELECT user_id, version, activity_level, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to,
       (lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) IS NULL)
         AS is_current
FROM grp
"""


@register("scd2_user_activity", oracle=_SCD2_ORACLE, tags=("extension", "cdc", "scd2"))
def scd2_user_activity(spark, sf_dir):
    """SCD2 dimension build from daily snapshots: per-user daily activity
    level collapsed into validity intervals (valid_from / valid_to /
    is_current) via operators/cdc.scd2_from_snapshots — the slowly-
    changing-dimension history a snapshot-partitioned lake feeds. Every
    window partitions by user_id; per-key state only."""
    from ..operators.cdc import scd2_from_snapshots

    ev = read_table(spark, sf_dir, "events")
    n = F.count(F.lit(1))
    snaps = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("snap_date")
    ).agg(
        F.when(n >= 3, "high").when(n == 2, "mid").otherwise("low").alias(
            "activity_level"
        )
    )
    out = scd2_from_snapshots(snaps, ["user_id"], ["activity_level"])
    return out.select(
        "user_id",
        F.col("version").cast("long").alias("version"),
        "activity_level",
        "valid_from",
        "valid_to",
        "is_current",
    )


# --- as-of join with staleness tolerance --------------------------------------------

_ASOF_TOL_DAYS = 7

_ASOF_TOL_ORACLE = f"""
WITH r AS (
  SELECT o_custkey AS user_id,
         o_orderdate,
         arg_max(o_orderkey, o_orderkey)   AS last_orderkey,
         arg_max(o_totalprice, o_orderkey) AS last_order_total
  FROM orders GROUP BY o_custkey, o_orderdate
),
j AS (
  SELECT e.event_id, e.user_id, cast(e.ts AS timestamp) AS ts,
         r.last_orderkey, r.last_order_total, r.o_orderdate
  FROM events e
  ASOF LEFT JOIN r ON e.user_id = r.user_id AND e.ts >= r.o_orderdate
)
SELECT event_id, user_id, ts,
       cast(date_diff('day', cast(o_orderdate AS date), cast(ts AS date))
            AS integer) AS age_days,
       CASE WHEN date_diff('day', cast(o_orderdate AS date), cast(ts AS date))
                 <= {_ASOF_TOL_DAYS}
            THEN last_orderkey END AS last_orderkey_fresh,
       CASE WHEN date_diff('day', cast(o_orderdate AS date), cast(ts AS date))
                 <= {_ASOF_TOL_DAYS}
            THEN last_order_total END AS last_order_total_fresh,
       date_diff('day', cast(o_orderdate AS date), cast(ts AS date))
         <= {_ASOF_TOL_DAYS} AS is_fresh
FROM j
"""


@register(
    "asof_join_tolerance",
    oracle=_ASOF_TOL_ORACLE,
    tags=("extension", "asof"),
)
def asof_join_tolerance(spark, sf_dir):
    """As-of join with a max-staleness tolerance (the kdb/QuestDB
    ``ASOF ... TOLERANCE`` form): each event still finds the latest order
    at-or-before its time, but matches older than {d} days are reported
    stale — their value columns NULL out while the match age stays
    visible. The standard guard against joining against arbitrarily old
    state in feature pipelines.

    Same union + ordered-window plan as asof_latest_order_per_event (one
    shuffle on the key, no per-group pandas); the tolerance is a pure
    post-join in-row predicate, so it adds zero shuffles. Age is computed
    in calendar days (date arithmetic — identical in both engines,
    no timezone dependence). Oracle = DuckDB's native ASOF JOIN plus the
    same staleness CASE.
    """.format(d=_ASOF_TOL_DAYS)
    from ..operators.asof import as_of_join

    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        read_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("order_ts"),
        )
        .agg(
            F.max("o_orderkey").alias("last_orderkey"),
            F.max_by("o_totalprice", "o_orderkey").alias("last_order_total"),
        )
        .withColumn("last_order_d", F.col("order_ts"))
    )
    j = as_of_join(
        ev,
        orders,
        ["user_id"],
        left_time="ts",
        right_time="order_ts",
        right_values=["last_orderkey", "last_order_total", "last_order_d"],
    )
    age = F.datediff(F.to_date("ts"), F.col("last_order_d"))
    fresh = age <= _ASOF_TOL_DAYS
    return j.select(
        "event_id",
        "user_id",
        "ts",
        age.cast("int").alias("age_days"),
        F.when(fresh, F.col("last_orderkey")).alias("last_orderkey_fresh"),
        F.when(fresh, F.col("last_order_total")).alias("last_order_total_fresh"),
        fresh.alias("is_fresh"),
    )
