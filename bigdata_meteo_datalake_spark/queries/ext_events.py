"""Event-analytics extension queries: funnel conversion and cohort
retention — the behavioral-analytics shapes a lakehouse serves from the
same event table the streaming operators consume."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.numeric import oracle_ratio, rounded_ratio
from ..sources.lake import read_table
from . import register

# --- funnel: signup -> purchase within 7 days ---------------------------------------

_FUNNEL_ORACLE = f"""
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase_any
  FROM events GROUP BY user_id
),
conv AS (
  SELECT u.user_id,
         u.first_signup,
         min(e.ts) AS first_purchase_after
  FROM per_user u
  LEFT JOIN events e
    ON e.user_id = u.user_id AND e.event_type = 'purchase'
   AND e.ts >= u.first_signup
   AND e.ts < u.first_signup + INTERVAL '7 days'
  WHERE u.first_signup IS NOT NULL
  GROUP BY u.user_id, u.first_signup
)
SELECT cast(count(*) AS bigint) AS n_signup_users,
       cast(sum(CASE WHEN first_purchase_after IS NOT NULL THEN 1 ELSE 0 END) AS bigint)
         AS n_converted_7d,
       {oracle_ratio("sum(CASE WHEN first_purchase_after IS NOT NULL THEN 1 ELSE 0 END)", "count(*)", 4)}
         AS conversion_ratio
FROM conv
"""


@register("funnel_signup_purchase_7d", oracle=_FUNNEL_ORACLE, tags=("extension", "events", "funnel"))
def funnel_signup_purchase_7d(spark, sf_dir):
    """Funnel conversion: of users whose first signup exists, how many
    purchase within 7 days after it. Two aggregations + one conditional
    self-join on the event table."""
    ev = read_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "first_signup"
        )
    ).where(F.col("first_signup").isNotNull())
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    conv = (
        per_user.join(
            purchases,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("p_ts") >= F.col("first_signup"))
            & (F.col("p_ts") < F.col("first_signup") + F.expr("INTERVAL 7 DAYS")),
            "left",
        )
        .groupBy("user_id", "first_signup")
        .agg(F.min("p_ts").alias("first_purchase_after"))
    )
    converted = F.sum(
        F.when(F.col("first_purchase_after").isNotNull(), 1).otherwise(0)
    )
    total = F.count(F.lit(1))
    return conv.agg(
        total.alias("n_signup_users"),
        converted.alias("n_converted_7d"),
        rounded_ratio(converted, total, 4).alias("conversion_ratio"),
    )


# --- cohort retention ---------------------------------------------------------------

_COHORT_ORACLE = """
WITH firsts AS (
  SELECT user_id, min(cast(ts AS date)) AS cohort_day FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_day,
         datediff('day', f.cohort_day, cast(e.ts AS date)) AS days_since
  FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT cohort_day,
       cast(days_since AS integer) AS days_since,
       cast(count(*) AS bigint) AS n_active_users
FROM activity GROUP BY cohort_day, days_since
"""


@register("cohort_retention", oracle=_COHORT_ORACLE, tags=("extension", "events", "cohort"))
def cohort_retention(spark, sf_dir):
    """Cohort retention triangle: users grouped by first-activity day,
    counted on each subsequent active day."""
    ev = read_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_day")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day")).alias(
                "days_since"
            ),
        )
        .distinct()
    )
    return activity.groupBy("cohort_day", "days_since").agg(
        F.count(F.lit(1)).alias("n_active_users")
    )
