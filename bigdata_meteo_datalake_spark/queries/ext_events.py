"""Event-analytics extension queries: funnel conversion and cohort
retention — the behavioral-analytics shapes a lakehouse serves from the
same event table the streaming operators consume."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.numeric import count_if, oracle_ratio, round_half_up, rounded_ratio, rounded_sum
from ..sources.lake import read_table
from . import register
from ..operators.checkpointing import cut_eager, cut_lazy

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


# --- time-series: trailing moving average over a date range --------------------------


@register(
    "orders_7d_moving_avg",
    oracle="""
WITH daily AS (
  SELECT o_orderpriority AS priority,
         cast(o_orderdate AS date) AS order_day,
         cast(round(sum(cast(o_totalprice AS decimal(28,6))), 2) AS double)
           AS day_revenue
  FROM orders GROUP BY 1, 2
)
SELECT priority, order_day, day_revenue,
       floor(avg(day_revenue) OVER (
               PARTITION BY priority ORDER BY order_day
               RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
             * 10000 + 0.5) / 10000 AS avg_7d
FROM daily
""",
    tags=("extension", "timeseries"),
)
def orders_7d_moving_avg(spark, sf_dir):
    """Time-series trailing window: per-priority daily revenue with a
    7-day moving average via a RANGE frame over the date axis (an
    interval frame, not a row frame — days can be missing). Partitioned
    by priority: per-key window state only, never a global sort. The
    daily rollup is exact-decimal; the moving average runs over the
    already-rounded per-day doubles, so frame membership and the mean are
    engine-identical (frame size <= 7 keeps the double sum order-stable:
    both engines accumulate in ascending date order)."""
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").cast("date").alias("order_day"),
    ).agg(rounded_sum("o_totalprice").alias("day_revenue"))
    w = (
        Window.partitionBy("priority")
        .orderBy(F.col("order_day").cast("timestamp").cast("long"))
        .rangeBetween(-6 * 86400, 0)
    )
    return daily.select(
        "priority",
        "order_day",
        "day_revenue",
        round_half_up(F.avg("day_revenue").over(w), 4).alias("avg_7d"),
    )


# --- salted two-phase aggregation (skew mitigation, same answer) ------------------


@register(
    "salted_user_event_stats",
    oracle="""
SELECT event_type,
       cast(count(*) AS bigint) AS n_rows,
       cast(round(sum(cast(value AS decimal(28,6))), 2) AS double) AS sum_value
FROM events
GROUP BY event_type
""",
    tags=("extension", "events", "skew"),
)
def salted_user_event_stats(spark, sf_dir):
    """Two-phase salted aggregation over the (low-cardinality, skewed)
    event_type key: phase 1 fans each hot key over 16 salt buckets, phase 2
    merges partials on the true key — the declarative skew remedy for the
    one-reducer-per-hot-key collapse a plain groupBy suffers at 100 TB.
    The salt must not change the answer: sums accumulate in exact decimal
    through BOTH phases, and this query is hash-checked against the plain
    single-phase GROUP BY oracle."""
    from ..operators.skew import salted_count_sum

    ev = read_table(spark, sf_dir, "events")
    out = salted_count_sum(ev, ["event_type"], ["value"], n_salts=16)
    return out.select(
        "event_type",
        "n_rows",
        F.round(F.col("sum_value"), 2).cast("double").alias("sum_value"),
    )


# --- gaps-and-islands: consecutive-day activity streaks ---------------------------


@register(
    "user_activity_streaks",
    oracle="""
WITH days AS (SELECT DISTINCT user_id, cast(ts AS date) AS day FROM events),
g AS (
  SELECT user_id, day,
         day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                    AS integer) AS grp
  FROM days
)
SELECT user_id, min(day) AS streak_start, cast(count(*) AS bigint) AS streak_days
FROM g GROUP BY user_id, grp
""",
    tags=("extension", "events", "gaps-islands"),
)
def user_activity_streaks(spark, sf_dir):
    """Gaps-and-islands: consecutive-day activity streaks per user via the
    classic date-minus-row_number trick — consecutive days share a
    constant (day - rank), so one partitioned window plus one groupBy
    finds every island with no self-join and no iteration. Window state
    is one user's distinct days; never a global sort."""
    ev = read_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    g = days.withColumn("rn", F.row_number().over(w)).withColumn(
        "grp", F.expr("date_sub(day, rn)")
    )
    return g.groupBy("user_id", "grp").agg(
        F.min("day").alias("streak_start"),
        F.count(F.lit(1)).alias("streak_days"),
    ).drop("grp")


# --- rolling 7-day active users (sliding distinct) --------------------------------


@register(
    "rolling_7d_active_users",
    oracle="""
WITH a AS (SELECT DISTINCT user_id, cast(ts AS date) AS day FROM events),
c AS (
  SELECT user_id, cast(unnest(generate_series(day, day + 6, INTERVAL 1 DAY)) AS date)
           AS result_day
  FROM a
)
SELECT result_day, cast(count(DISTINCT user_id) AS bigint) AS active_users_7d
FROM c GROUP BY result_day
""",
    tags=("extension", "events", "rolling-distinct"),
)
def rolling_7d_active_users(spark, sf_dir):
    """Trailing 7-day active users (WAU) for every day: COUNT(DISTINCT)
    over a sliding interval can't ride an ordinary window frame (distinct
    isn't frame-decomposable), so each (user, active-day) fact is fanned
    out to the 7 result days it supports and the distinct count groups on
    result day. The fan-out factor is the window length — 7x on the
    (already deduplicated) daily activity relation, which is |users x
    days| at most, far below the raw event table it summarizes; the same
    shape computes any trailing-distinct metric at 100 TB without a
    per-day self-join of the full history."""
    ev = read_table(spark, sf_dir, "events")
    activity = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    contrib = activity.select(
        "user_id",
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias(
            "result_day"
        ),
    )
    return contrib.groupBy("result_day").agg(
        F.countDistinct("user_id").alias("active_users_7d")
    )


# --- daily new vs returning users -------------------------------------------------


@register(
    "daily_new_vs_returning",
    oracle="""
WITH firsts AS (
  SELECT user_id, min(cast(ts AS date)) AS first_day FROM events GROUP BY user_id
),
daily AS (
  SELECT DISTINCT e.user_id, cast(e.ts AS date) AS day FROM events e
)
SELECT d.day,
       cast(sum(CASE WHEN f.first_day = d.day THEN 1 ELSE 0 END) AS bigint)
         AS new_users,
       cast(sum(CASE WHEN f.first_day < d.day THEN 1 ELSE 0 END) AS bigint)
         AS returning_users
FROM daily d JOIN firsts f ON f.user_id = d.user_id
GROUP BY d.day
""",
    tags=("extension", "events", "growth"),
)
def daily_new_vs_returning(spark, sf_dir):
    """Daily active users split into new (first-ever activity today) vs
    returning — the growth-accounting companion to cohort_retention,
    computed from the same first-activity relation. The firsts aggregate
    is |users| rows; joined back to daily activity it classifies without
    rescanning history per day."""
    ev = read_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day")
    )
    daily = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    joined = daily.join(firsts, "user_id")
    return joined.groupBy("day").agg(
        count_if(F.col("first_day") == F.col("day")).alias("new_users"),
        count_if(F.col("first_day") < F.col("day")).alias("returning_users"),
    )


# --- distribution drift between two periods (exact integer L1) --------------------


@register(
    "value_drift_report",
    oracle="""
WITH b AS (
  SELECT event_type,
         CASE WHEN cast(ts AS date) < DATE '2024-01-16' THEN 0 ELSE 1 END AS period,
         greatest(0, least(9, cast(trunc(value / 100.0) AS integer))) AS bucket
  FROM events WHERE value IS NOT NULL
),
counts AS (
  SELECT event_type, bucket,
         cast(sum(CASE WHEN period = 0 THEN 1 ELSE 0 END) AS bigint) AS c1,
         cast(sum(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS bigint) AS c2
  FROM b GROUP BY event_type, bucket
),
totals AS (
  SELECT event_type, cast(sum(c1) AS bigint) AS n1, cast(sum(c2) AS bigint) AS n2
  FROM counts GROUP BY event_type
)
SELECT c.event_type, t.n1, t.n2,
       cast(sum(abs(c.c1 * t.n2 - c.c2 * t.n1)) AS bigint) AS l1_cross
FROM counts c JOIN totals t ON t.event_type = c.event_type
GROUP BY c.event_type, t.n1, t.n2
""",
    tags=("extension", "events", "drift"),
)
def value_drift_report(spark, sf_dir):
    """Input-distribution drift between the first and second half of the
    month, per event_type — the monitoring primitive that catches a
    feature pipeline silently changing under a model. The L1 distance
    between the two histograms is kept EXACT by cross-multiplying instead
    of dividing: sum |c1*n2 - c2*n1| over buckets (the true L1 times
    n1*n2) — pure int64, no float anywhere, so the oracle hash matches by
    construction. Consumers divide by n1*n2 at display time."""
    ev = read_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    b = ev.select(
        "event_type",
        F.when(F.col("ts").cast("date") < F.lit("2024-01-16").cast("date"), 0)
        .otherwise(1)
        .alias("period"),
        F.greatest(
            F.lit(0), F.least(F.lit(9), (F.col("value") / 100.0).cast("int"))
        ).alias("bucket"),
    )
    counts = b.groupBy("event_type", "bucket").agg(
        count_if(F.col("period") == 0).alias("c1"),
        count_if(F.col("period") == 1).alias("c2"),
    )
    totals = counts.groupBy("event_type").agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    return (
        counts.join(totals, "event_type")
        .groupBy("event_type", "n1", "n2")
        .agg(
            F.sum(F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))).alias(
                "l1_cross"
            )
        )
    )


# --- within-session funnel conversion ---------------------------------------------


@register(
    "session_funnel_conversion",
    oracle=f"""
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
),
flagged AS (
  SELECT user_id, event_id, event_type, us,
         CASE WHEN us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_new
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
sess AS (
  SELECT user_id, event_type, us,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_no
  FROM flagged
),
per_session AS (
  SELECT user_id, session_no,
         min(CASE WHEN event_type = 'view' THEN us END) AS first_view_us
  FROM sess GROUP BY user_id, session_no
),
converted AS (
  SELECT p.user_id, p.session_no, p.first_view_us,
         max(CASE WHEN s.event_type = 'purchase' AND s.us >= p.first_view_us
                  THEN 1 ELSE 0 END) AS did_convert
  FROM per_session p
  JOIN sess s ON s.user_id = p.user_id AND s.session_no = p.session_no
  GROUP BY p.user_id, p.session_no, p.first_view_us
)
SELECT cast(count(*) AS bigint) AS n_sessions,
       cast(sum(CASE WHEN first_view_us IS NOT NULL THEN 1 ELSE 0 END) AS bigint)
         AS n_sessions_with_view,
       cast(sum(CASE WHEN first_view_us IS NOT NULL THEN did_convert ELSE 0 END)
            AS bigint) AS n_converted_sessions,
       {{ratio}} AS conversion_ratio
FROM converted
""".replace(
        "{ratio}",
        "floor(cast(sum(CASE WHEN first_view_us IS NOT NULL THEN did_convert ELSE 0 END) AS double)"
        " / sum(CASE WHEN first_view_us IS NOT NULL THEN 1 ELSE 0 END)"
        " * 10000 + 0.5) / 10000",
    ),
    tags=("extension", "events", "funnel", "session"),
)
def session_funnel_conversion(spark, sf_dir):
    """Funnel scoped to the session, not the user lifetime: of all
    sessions, how many contain a view, and how many of those convert to a
    purchase AT OR AFTER the session's first view. Composes the
    sessionization window (lag + running sum, microsecond-exact gap) with
    a per-session two-phase aggregate: first-view timestamp per session,
    then a conditional max over the session's events — the
    order-sensitive step no single groupBy can express. All windows
    partition by user; the session relation joined back is keyed on
    (user, session_no), so co-partitioning holds through both phases."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gap = F.col("us") - F.lag("us").over(w)
    running = w.rowsBetween(Window.unboundedPreceding, 0)
    sess = ev.select(
        "user_id",
        "event_type",
        "us",
        F.sum(F.when(gap > 30 * 60 * 1_000_000, 1).otherwise(0))
        .over(running)
        .alias("session_no"),
    )
    per_session = sess.groupBy("user_id", "session_no").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("us"))).alias(
            "first_view_us"
        )
    )
    converted = (
        per_session.join(sess, ["user_id", "session_no"])
        .groupBy("user_id", "session_no", "first_view_us")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("us") >= F.col("first_view_us")),
                    1,
                ).otherwise(0)
            ).alias("did_convert")
        )
    )
    with_view = count_if(F.col("first_view_us").isNotNull())
    conv = F.sum(
        F.when(F.col("first_view_us").isNotNull(), F.col("did_convert")).otherwise(0)
    )
    return converted.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        with_view.alias("n_sessions_with_view"),
        conv.alias("n_converted_sessions"),
        round_half_up(conv.cast("double") / with_view, 4).alias("conversion_ratio"),
    )


# --- first-order Markov transition matrix over event types ------------------------


_MARKOV_ORACLE = """
WITH steps AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events
),
c AS (
  SELECT src, dst, cast(count(*) AS bigint) AS n_transitions
  FROM steps WHERE dst IS NOT NULL GROUP BY src, dst
)
SELECT src, dst, n_transitions,
       floor(cast(n_transitions AS double)
             / cast(sum(n_transitions) OVER (PARTITION BY src) AS double)
             * 1000000 + 0.5) / 1000000 AS p
FROM c
"""


@register(
    "markov_event_transitions",
    oracle=_MARKOV_ORACLE,
    tags=("extension", "events", "sequence"),
)
def markov_event_transitions(spark, sf_dir):
    """First-order Markov transition matrix over the per-user event stream:
    for every (src, dst) event-type pair, how often dst immediately follows
    src, and the row-normalized transition probability. The successor is a
    ``lead`` over the (ts, event_id)-ordered user partition — a total order,
    so the matrix is deterministic on any cluster. The probability is ONE
    double division of two exact int64 counts, floor-rounded, so it hashes
    identically cross-engine.

    Scale: the only large shuffle is the per-user window (user_id
    partitions); everything after is a #types^2-sized aggregate, and the
    normalizing window runs over that tiny relation."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    )
    c = (
        steps.where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )
    row_total = F.sum("n_transitions").over(Window.partitionBy("src"))
    return c.select(
        "src",
        "dst",
        "n_transitions",
        round_half_up(
            F.col("n_transitions").cast("double") / row_total.cast("double"), 6
        ).alias("p"),
    )


# --- robust outliers: per-type exact median + MAD ----------------------------------


_MAD_ORACLE = """
WITH c AS (
  SELECT event_type AS etype, event_id,
         cast(floor(value * 100 + 0.5) AS bigint) AS v
  FROM events
),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY etype ORDER BY v, event_id) AS rn,
         cast(count(*) OVER (PARTITION BY etype) AS bigint) AS n
  FROM c
),
m AS (
  SELECT etype, cast(min(n) AS bigint) AS n_events,
         cast(sum(CASE WHEN rn = (n + 1) // 2 THEN v END)
              + sum(CASE WHEN rn = (n + 2) // 2 THEN v END) AS bigint) AS med2
  FROM r GROUP BY etype
),
d AS (
  SELECT r.etype, r.event_id, abs(2 * r.v - m.med2) AS d2, m.med2, m.n_events
  FROM r JOIN m ON m.etype = r.etype
),
r2 AS (
  SELECT *, row_number() OVER (PARTITION BY etype ORDER BY d2, event_id) AS rn2
  FROM d
),
m2 AS (
  SELECT etype, cast(min(n_events) AS bigint) AS n_events,
         cast(min(med2) AS bigint) AS med2,
         cast(sum(CASE WHEN rn2 = (n_events + 1) // 2 THEN d2 END)
              + sum(CASE WHEN rn2 = (n_events + 2) // 2 THEN d2 END) AS bigint)
           AS mad4
  FROM r2 GROUP BY etype
)
SELECT m2.etype AS event_type, m2.n_events,
       cast(m2.med2 AS double) / 200.0 AS median_value,
       cast(m2.mad4 AS double) / 400.0 AS mad_value,
       cast(sum(CASE WHEN 2 * r2.d2 > 3 * m2.mad4 THEN 1 ELSE 0 END) AS bigint)
         AS n_outliers
FROM r2 JOIN m2 ON m2.etype = r2.etype
GROUP BY m2.etype, m2.n_events, m2.med2, m2.mad4
"""


@register(
    "event_value_mad_outliers",
    oracle=_MAD_ORACLE,
    tags=("extension", "events", "quality", "robust"),
)
def event_value_mad_outliers(spark, sf_dir):
    """Robust per-type outlier report: exact median of ``value``, exact
    median absolute deviation (MAD), and the count of events farther than
    3 MAD from the median — the standard robust alternative to mean/stddev
    z-scores, immune to the very outliers it hunts.

    Exactness machinery: values quantize to cents; the median of n rows is
    the SUM of the elements at sorted positions (n+1) div 2 and (n+2) div 2
    (added as two separate conditional sums so an odd n, where the two
    positions coincide, still counts the middle element twice) — kept as
    the integer ``med2`` so no division happens until the final select.
    Deviations ``d2 = |2*v - med2|`` and the MAD quadruple ``mad4`` stay
    integers the same way; the 3-MAD cut is the INTEGER comparison
    ``2*d2 > 3*mad4`` and the two output divisions are by literal
    constants — every engine rounds those identically.

    Scale: an exact grouped median inherently sorts each group, expressed
    here as two row_number windows partitioned by event_type. The type
    vocabulary is small and value-uniform (no single hot type at 100x in
    this domain); when groups do grow past a partition, swap in the
    sketch path (order_price_quantiles' dyadic weights or t-digest) — this
    operator is the exact twin the sketches are judged against."""
    ev = read_table(spark, sf_dir, "events")
    c = ev.select(
        F.col("event_type").alias("etype"),
        "event_id",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("v"),
    )
    wtype = Window.partitionBy("etype")
    worder = wtype.orderBy("v", "event_id")
    r = c.select(
        "etype",
        "event_id",
        "v",
        F.row_number().over(worder).alias("rn"),
        F.count(F.lit(1)).over(wtype).cast("long").alias("n"),
    )
    k1 = F.expr("(n + 1) div 2")
    k2 = F.expr("(n + 2) div 2")
    m = r.groupBy("etype").agg(
        F.min("n").cast("long").alias("n_events"),
        (
            F.sum(F.when(F.col("rn") == k1, F.col("v")))
            + F.sum(F.when(F.col("rn") == k2, F.col("v")))
        )
        .cast("long")
        .alias("med2"),
    )
    d = r.join(F.broadcast(m), "etype").select(
        "etype",
        "event_id",
        F.abs(2 * F.col("v") - F.col("med2")).alias("d2"),
        "med2",
        "n_events",
    )
    worder2 = Window.partitionBy("etype").orderBy("d2", "event_id")
    r2 = d.withColumn("rn2", F.row_number().over(worder2))
    j1 = F.expr("(n_events + 1) div 2")
    j2 = F.expr("(n_events + 2) div 2")
    m2 = r2.groupBy("etype").agg(
        F.min("n_events").cast("long").alias("n_events"),
        F.min("med2").cast("long").alias("med2"),
        (
            F.sum(F.when(F.col("rn2") == j1, F.col("d2")))
            + F.sum(F.when(F.col("rn2") == j2, F.col("d2")))
        )
        .cast("long")
        .alias("mad4"),
    )
    return (
        r2.select("etype", "event_id", "d2")
        .join(F.broadcast(m2), "etype")
        .groupBy("etype", "n_events", "med2", "mad4")
        .agg(
            count_if(2 * F.col("d2") > 3 * F.col("mad4")).alias("n_outliers")
        )
        .select(
            F.col("etype").alias("event_type"),
            "n_events",
            (F.col("med2").cast("double") / 200.0).alias("median_value"),
            (F.col("mad4").cast("double") / 400.0).alias("mad_value"),
            "n_outliers",
        )
    )


# --- bucketed interval join: event bursts -------------------------------------------

#: interval width (seconds): each event counts the OTHER events in the
#: preceding 5 minutes, across all users
_BURST_WINDOW_S = 300

_BURST_ORACLE = f"""
SELECT e.event_id,
       cast(count(s.event_id) AS bigint) AS n_prior_5m
FROM events e
LEFT JOIN events s
  ON s.ts >= e.ts - INTERVAL {_BURST_WINDOW_S} SECOND
 AND s.ts <= e.ts
 AND s.event_id <> e.event_id
GROUP BY e.event_id
"""


@register(
    "interval_join_event_bursts",
    oracle=_BURST_ORACLE,
    tags=("extension", "events", "interval-join"),
)
def interval_join_event_bursts(spark, sf_dir):
    """Time-interval join with NO equi key — the Flink interval-join
    shape: for every event, how many other events (any user) fall in the
    preceding 5 minutes. Naively this is a range-predicate self-join,
    which Spark plans as a nested-loop product; instead the interval is
    bucketized: the build side lands in one 5-minute bucket
    (``floor(epoch_us / window_us)``), the probe side explodes into the
    <=2 buckets its lookback interval can touch, and the join becomes a
    plain bucket equi-join followed by the exact range filter. Each
    matching pair is produced exactly once (the build event lives in
    exactly one bucket), so no dedup step is needed.

    Scale: the only corpus-sized exchange is the bucket hash shuffle;
    probe amplification is a constant 2x. A hot bucket (burst skew) is
    AQE skew-join territory, not a plan defect. At 100 TB this is the
    shape stream-stream interval joins compile to under the hood —
    expressed here as a batch query with an exact oracle."""
    us = _BURST_WINDOW_S * 1_000_000
    e = read_table(spark, sf_dir, "events").select("event_id", "ts")
    build = e.select(
        F.col("event_id").alias("s_id"),
        F.col("ts").alias("s_ts"),
        F.expr(f"unix_micros(ts) div {us}").alias("bucket"),
    )
    probe = e.select(
        "event_id",
        "ts",
        F.explode(
            F.array_distinct(
                F.array(
                    F.expr(f"(unix_micros(ts) - {us}) div {us}"),
                    F.expr(f"unix_micros(ts) div {us}"),
                )
            )
        ).alias("bucket"),
    )
    matched = probe.join(build, "bucket", "left").select(
        "event_id",
        F.when(
            (F.col("s_ts") >= F.col("ts") - F.expr(f"INTERVAL {_BURST_WINDOW_S} SECOND"))
            & (F.col("s_ts") <= F.col("ts"))
            & (F.col("s_id") != F.col("event_id")),
            1,
        ).alias("hit"),
    )
    return matched.groupBy("event_id").agg(
        F.count("hit").cast("long").alias("n_prior_5m")
    )


# --- late-arrival audit via blocked running max -------------------------------------

_LATE_BLOCK = 1000
_LATE_WM_US = 1_800_000_000  # 30-minute watermark

_LATE_ORACLE = f"""
WITH e AS (
  SELECT event_id, ts, epoch_us(ts) AS us FROM events
),
r AS (
  SELECT ts, us,
         max(us) OVER (ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS run_max
  FROM e
)
SELECT date_trunc('hour', ts) AS hour,
       cast(count(*) AS bigint) AS n_events,
       cast(sum(CASE WHEN run_max - us > {_LATE_WM_US} THEN 1 ELSE 0 END)
            AS bigint) AS n_late,
       cast(floor(max(run_max - us) / 1000000) AS bigint) AS max_lateness_s
FROM r GROUP BY 1
"""


@register(
    "late_arrival_report",
    oracle=_LATE_ORACLE,
    tags=("extension", "events", "watermark"),
)
def late_arrival_report(spark, sf_dir):
    """Watermark planning audit: treating event_id as arrival order, an
    event is LATE when some already-arrived event carries a timestamp
    more than 30 minutes ahead of it — exactly the rows a streaming
    watermark of 30 minutes would drop. Per event-time hour: event
    count, late count, and the maximum observed lateness; the report a
    team reads to size the watermark before turning on the stream.

    The global running maximum is the interesting part at scale: the
    naive plan is a partition-less window (banned repo-wide — single
    task at 100 TB). This plan uses the two-phase BLOCK DECOMPOSITION
    instead: a per-block running max (window PARTITIONED by the
    event_id div {b} block — parallel), block maxima (tiny aggregate),
    a prefix max over prior blocks (non-equi self-join of the tiny
    block relation), and greatest() of the two — the same scan-style
    rewrite that turns any running aggregate distributed.
    """.format(b=_LATE_BLOCK)
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "ts", F.unix_micros("ts").alias("us")
    )
    block = (F.col("event_id") / _LATE_BLOCK).cast("long")
    e = ev.withColumn("block", block)
    w = (
        Window.partitionBy("block")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = e.withColumn("in_max", F.max("us").over(w))
    bm = e.groupBy("block").agg(F.max("us").alias("b_max"))
    a, b = bm.alias("a"), bm.alias("b")
    prev = (
        a.join(F.broadcast(b), F.col("b.block") < F.col("a.block"), "left")
        .groupBy(F.col("a.block").alias("pblock"))
        .agg(F.max(F.col("b.b_max")).alias("prev_max"))
    )
    r = within.join(F.broadcast(prev), within["block"] == prev["pblock"]).select(
        "ts",
        "us",
        F.greatest(F.col("in_max"), F.coalesce(F.col("prev_max"), F.lit(0))).alias(
            "run_max"
        ),
    )
    late = F.col("run_max") - F.col("us") > _LATE_WM_US
    return r.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count(F.lit(1)).alias("n_events"),
        count_if(late).cast("long").alias("n_late"),
        F.floor(F.max(F.col("run_max") - F.col("us")) / 1000000)
        .cast("long")
        .alias("max_lateness_s"),
    )


# --- Kaplan-Meier survival of user lifetimes ----------------------------------------

_KM_CENSOR_DAYS = 90

_KM_ORACLE = f"""
WITH life AS (
  SELECT o_custkey,
         date_diff('day', cast(min(o_orderdate) AS date),
                   cast(max(o_orderdate) AS date)) AS dur,
         cast(max(o_orderdate) AS date)
           >= (SELECT cast(max(o_orderdate) AS date) FROM orders)
              - INTERVAL {_KM_CENSOR_DAYS} DAY AS censored
  FROM orders GROUP BY o_custkey
),
dt AS (
  SELECT dur AS t, cast(count(*) AS bigint) AS n_deaths
  FROM life WHERE NOT censored GROUP BY dur
),
risk AS (
  SELECT dt.t, dt.n_deaths,
         (SELECT cast(count(*) AS bigint) FROM life WHERE life.dur >= dt.t)
           AS n_risk
  FROM dt
),
f AS (
  SELECT t, n_deaths, n_risk,
         cast(floor(ln(1.0 - cast(n_deaths AS double) / n_risk) * 1000000
                    - 0.5) AS bigint) AS lf_micro
  FROM risk WHERE n_deaths < n_risk
),
s AS (
  SELECT a.t, a.n_deaths, a.n_risk,
         cast(sum(b.lf_micro) AS bigint) AS log_s_micro
  FROM f a JOIN f b ON b.t <= a.t
  GROUP BY a.t, a.n_deaths, a.n_risk
)
SELECT t AS t_days, n_risk, n_deaths, log_s_micro,
       floor(exp(cast(log_s_micro AS double) / 1000000) * 1000000 + 0.5)
         / 1000000 AS survival
FROM s
"""


@register(
    "kaplan_meier_lifetimes",
    oracle=_KM_ORACLE,
    tags=("extension", "events", "survival"),
)
def kaplan_meier_lifetimes(spark, sf_dir):
    """Kaplan-Meier survival estimator over customer order lifetimes
    (first to last order, in days), right-censoring customers still
    ordering within {c} days of the corpus end — the churn-analysis primitive that a
    naive "mean lifetime" silently biases by counting censored users as
    dead. Per death time: the at-risk count, deaths, the EXACT integer
    log-survival (sum of micro-quantized ln(1 - d/n) factors — the
    cumulative product kept order-free in log domain), and the survival
    probability.

    Scale: lifetimes are one user-keyed aggregate; everything after
    operates on the tiny distinct-death-time relation (at-risk counts
    and the cumulative log-sum are non-equi joins over it — the no-
    window prefix pattern). Death times where the whole risk set dies
    (survival hits exact 0) are excluded from the log-domain factors,
    standard KM practice.""".format(c=_KM_CENSOR_DAYS)
    ev = read_table(spark, sf_dir, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("d")
    )
    end = ev.agg(F.max("d").alias("dmax"))
    life = (
        ev.groupBy("o_custkey")
        .agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .crossJoin(F.broadcast(end))
        .select(
            F.datediff("d1", "d0").cast("long").alias("dur"),
            (F.col("d1") >= F.date_sub(F.col("dmax"), _KM_CENSOR_DAYS)).alias(
                "censored"
            ),
        )
        .transform(cut_lazy)
    )
    dt = (
        life.where(~F.col("censored"))
        .groupBy(F.col("dur").alias("t"))
        .agg(F.count(F.lit(1)).alias("n_deaths"))
    )
    durs = life.groupBy("dur").agg(F.count(F.lit(1)).alias("n_at"))
    risk = (
        dt.join(F.broadcast(durs), F.col("dur") >= F.col("t"))
        .groupBy("t", "n_deaths")
        .agg(F.sum("n_at").alias("n_risk"))
    )
    f = risk.where(F.col("n_deaths") < F.col("n_risk")).select(
        "t",
        "n_deaths",
        "n_risk",
        F.floor(
            F.log(1.0 - F.col("n_deaths").cast("double") / F.col("n_risk")) * 1000000
            - 0.5
        )
        .cast("long")
        .alias("lf_micro"),
    ).transform(cut_eager)
    a, b = f.alias("a"), f.alias("b")
    s = (
        a.join(F.broadcast(b), F.col("b.t") <= F.col("a.t"))
        .groupBy(
            F.col("a.t").alias("t_days"),
            F.col("a.n_deaths").alias("n_deaths"),
            F.col("a.n_risk").alias("n_risk"),
        )
        .agg(F.sum(F.col("b.lf_micro")).alias("log_s_micro"))
    )
    return s.select(
        "t_days",
        "n_risk",
        "n_deaths",
        "log_s_micro",
        (
            F.floor(
                F.exp(F.col("log_s_micro").cast("double") / 1000000) * 1000000 + 0.5
            )
            / 1000000
        ).alias("survival"),
    )


# --- log-rank test between segment survival curves ----------------------------------

_LR_SEGMENT = "BUILDING"

_LR_ORACLE = f"""
WITH life AS (
  SELECT o.o_custkey,
         c.c_mktsegment = '{_LR_SEGMENT}' AS g1,
         date_diff('day', cast(min(o.o_orderdate) AS date),
                   cast(max(o.o_orderdate) AS date)) AS dur,
         cast(max(o.o_orderdate) AS date)
           >= (SELECT cast(max(o_orderdate) AS date) FROM orders)
              - INTERVAL {_KM_CENSOR_DAYS} DAY AS censored
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY o.o_custkey, c.c_mktsegment
),
dt AS (
  SELECT dur AS t,
         cast(count(*) AS bigint) AS d_t,
         cast(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS bigint) AS d1_t
  FROM life WHERE NOT censored GROUP BY dur
),
risk AS (
  SELECT dt.t, dt.d_t, dt.d1_t,
         (SELECT cast(count(*) AS bigint) FROM life WHERE dur >= dt.t) AS n_t,
         (SELECT cast(count(*) AS bigint) FROM life
           WHERE dur >= dt.t AND g1) AS n1_t
  FROM dt
),
terms AS (
  SELECT d1_t,
         cast(floor(cast(d_t AS double) * n1_t / n_t * 1000000 + 0.5)
              AS bigint) AS e1_micro,
         CASE WHEN n_t > 1 THEN
           cast(floor(cast(d_t AS double) * n1_t / n_t
                      * (1.0 - cast(n1_t AS double) / n_t)
                      * (n_t - d_t) / (n_t - 1) * 1000000 + 0.5) AS bigint)
         ELSE 0 END AS v_micro
  FROM risk
),
agg AS (
  SELECT cast(sum(d1_t) AS bigint) AS o1,
         cast(sum(e1_micro) AS bigint) AS e1m,
         cast(sum(v_micro) AS bigint) AS vm
  FROM terms
),
grp AS (
  SELECT cast(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS bigint) AS n_g1,
         cast(sum(CASE WHEN g1 THEN 0 ELSE 1 END) AS bigint) AS n_g0
  FROM life
)
SELECT grp.n_g1, grp.n_g0, agg.o1,
       floor(cast(agg.e1m AS double) / 1000000 * 10000 + 0.5) / 10000 AS e1,
       floor(cast(agg.vm AS double) / 1000000 * 10000 + 0.5) / 10000 AS var_lr,
       floor((agg.o1 - cast(agg.e1m AS double) / 1000000)
             / sqrt(cast(agg.vm AS double) / 1000000) * 1000000 + 0.5)
         / 1000000 AS z,
       abs((agg.o1 - cast(agg.e1m AS double) / 1000000)
           / sqrt(cast(agg.vm AS double) / 1000000)) > 1.96 AS curves_differ
FROM agg, grp
"""


@register(
    "logrank_segment_survival",
    oracle=_LR_ORACLE,
    tags=("extension", "events", "survival", "logrank"),
)
def logrank_segment_survival(spark, sf_dir):
    """Log-rank test (Mantel-Cox) comparing the {s} segment's customer
    survival curve against everyone else — the hypothesis-test companion
    to kaplan_meier_lifetimes: at every pooled death time, the observed
    group-1 deaths vs the hypergeometric expectation d*n1/n, summed into
    the z statistic (O - E)/sqrt(V). Same censoring rule as the KM
    query.

    Determinism: every expectation/variance term derives from exact
    integer counts and quantizes to micro units before the order-free
    sums; O is pure int64; z is one final fixed IEEE expression.

    Scale: lifetimes are one join + aggregate; everything else lives on
    the tiny death-time relation (group at-risk counts via the same
    non-equi prefix pattern as KM).""".format(s=_LR_SEGMENT)
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer").select(
        "c_custkey", (F.col("c_mktsegment") == _LR_SEGMENT).alias("g1")
    )
    ev = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).select(
        "o_custkey", "g1", F.to_date("o_orderdate").alias("d")
    )
    end = ev.agg(F.max("d").alias("dmax"))
    life = (
        ev.groupBy("o_custkey", "g1")
        .agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .crossJoin(F.broadcast(end))
        .select(
            "g1",
            F.datediff("d1", "d0").cast("long").alias("dur"),
            (F.col("d1") >= F.date_sub(F.col("dmax"), _KM_CENSOR_DAYS)).alias(
                "censored"
            ),
        )
        .transform(cut_lazy)
    )
    dt = (
        life.where(~F.col("censored"))
        .groupBy(F.col("dur").alias("t"))
        .agg(
            F.count(F.lit(1)).alias("d_t"),
            F.sum(F.when(F.col("g1"), 1).otherwise(0)).alias("d1_t"),
        )
    )
    durs = life.groupBy("dur").agg(
        F.count(F.lit(1)).alias("n_at"),
        F.sum(F.when(F.col("g1"), 1).otherwise(0)).alias("n1_at"),
    )
    risk = (
        dt.join(F.broadcast(durs), F.col("dur") >= F.col("t"))
        .groupBy("t", "d_t", "d1_t")
        .agg(F.sum("n_at").alias("n_t"), F.sum("n1_at").alias("n1_t"))
    )
    frac1 = F.col("n1_t").cast("double") / F.col("n_t")
    e1_micro = F.floor(F.col("d_t").cast("double") * frac1 * 1000000 + 0.5).cast(
        "long"
    )
    v_micro = F.when(
        F.col("n_t") > 1,
        F.floor(
            F.col("d_t").cast("double")
            * frac1
            * (1.0 - frac1)
            * (F.col("n_t") - F.col("d_t"))
            / (F.col("n_t") - 1)
            * 1000000
            + 0.5
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    agg = risk.agg(
        F.sum("d1_t").alias("o1"),
        F.sum(e1_micro).alias("e1m"),
        F.sum(v_micro).alias("vm"),
    )
    grp = life.agg(
        F.sum(F.when(F.col("g1"), 1).otherwise(0)).alias("n_g1"),
        F.sum(F.when(F.col("g1"), 0).otherwise(1)).alias("n_g0"),
    )
    e1 = F.col("e1m").cast("double") / 1000000
    v = F.col("vm").cast("double") / 1000000
    z = (F.col("o1") - e1) / F.sqrt(v)
    return agg.crossJoin(F.broadcast(grp)).select(
        "n_g1",
        "n_g0",
        "o1",
        (F.floor(e1 * 10000 + 0.5) / 10000).alias("e1"),
        (F.floor(v * 10000 + 0.5) / 10000).alias("var_lr"),
        (F.floor(z * 1000000 + 0.5) / 1000000).alias("z"),
        (F.abs(z) > 1.96).alias("curves_differ"),
    )


# --- windowFunnel: ordered multi-step funnel within an anchored window ---------------

_WF_STEPS = ("signup", "view", "click", "purchase")
_WF_WINDOW_DAYS = 7


def _wf_oracle() -> str:
    """Chained-CTE funnel: step k's per-user timestamp is the min event
    time of its type strictly after step k-1 and inside the window
    anchored at step 1."""
    ctes = ["""
u1 AS (
  SELECT user_id, min(ts) AS s1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
)"""]
    for k in range(2, len(_WF_STEPS) + 1):
        ctes.append(f"""
u{k} AS (
  SELECT e.user_id, min(e.ts) AS s{k}
  FROM events e JOIN u{k - 1} p ON p.user_id = e.user_id
  JOIN u1 ON u1.user_id = e.user_id
  WHERE e.event_type = '{_WF_STEPS[k - 1]}'
    AND e.ts > p.s{k - 1}
    AND e.ts <= u1.s1 + INTERVAL {_WF_WINDOW_DAYS} DAY
  GROUP BY e.user_id
)""")
    counts = ", ".join(
        f"(SELECT cast(count(*) AS bigint) FROM u{k}) AS n{k}"
        for k in range(1, len(_WF_STEPS) + 1)
    )
    selects = []
    for k, name in enumerate(_WF_STEPS, start=1):
        prev = "n1" if k == 1 else f"n{k - 1}"
        conv = (
            "1.0"
            if k == 1
            else f"floor(cast(n{k} AS double) / {prev} * 10000 + 0.5) / 10000"
        )
        selects.append(
            f"SELECT {k} AS step, '{name}' AS step_name, n{k} AS n_users,"
            f" {conv} AS conv_from_prev FROM c"
        )
    return (
        "WITH " + ",".join(ctes) + f", c AS (SELECT {counts})\n"
        + "\nUNION ALL\n".join(selects)
    )


@register(
    "window_funnel_steps",
    oracle=_wf_oracle(),
    tags=("extension", "events", "funnel"),
)
def window_funnel_steps(spark, sf_dir):
    """ClickHouse-style windowFunnel: how many users complete
    signup -> view -> click -> purchase IN ORDER within 7 days of their
    first signup (each step strictly after the previous one, window
    anchored at step 1), with per-step conversion from the previous
    step. The strict-order semantics is what separates a funnel from
    four independent existence checks.

    Plan: ONE per-user frame carries every step timestamp — step k is a
    LEFT join of the (type-filtered, pushed-down) event slice onto the
    frame plus a conditional min, all K-1 joins co-partitioned on the
    user key, and users who stall simply carry NULLs forward. All four
    step counts then come from a SINGLE count aggregate over that one
    frame, and the 4-row funnel readout explodes from the 1-row count
    frame — the whole funnel evaluates each event slice exactly once
    (the earlier per-step-count formulation re-evaluated the chain per
    step and planned 64 shuffles; this one plans ~10). No window
    functions, no per-user event arrays.

    Exactness: counts are exact; conversion ratios are single double
    divisions of exact counts, floor-rounded to 4 decimals."""
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    frame = (
        ev.where(F.col("event_type") == _WF_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("s1"))
    )
    deadline = F.col("s1") + F.expr(f"INTERVAL {_WF_WINDOW_DAYS} DAY")
    for k in range(2, len(_WF_STEPS) + 1):
        step_ev = ev.where(F.col("event_type") == _WF_STEPS[k - 1]).select(
            "user_id", F.col("ts").alias("ev_ts")
        )
        carried = [f"s{i}" for i in range(1, k)]
        frame = (
            frame.join(step_ev, "user_id", "left")
            .groupBy("user_id", *carried)
            .agg(
                F.min(
                    F.when(
                        (F.col("ev_ts") > F.col(f"s{k - 1}"))
                        & (F.col("ev_ts") <= deadline),
                        F.col("ev_ts"),
                    )
                ).alias(f"s{k}")
            )
        )
    counts = frame.agg(
        *[
            F.count(F.col(f"s{k}")).alias(f"n{k}")
            for k in range(1, len(_WF_STEPS) + 1)
        ]
    )
    rows = []
    for k, name in enumerate(_WF_STEPS, start=1):
        conv = (
            F.lit(1.0)
            if k == 1
            else F.floor(
                F.col(f"n{k}").cast("double") / F.col(f"n{k - 1}") * 10000 + 0.5
            )
            / 10000
        )
        rows.append(
            F.struct(
                F.lit(k).alias("step"),
                F.lit(name).alias("step_name"),
                F.col(f"n{k}").alias("n_users"),
                conv.alias("conv_from_prev"),
            )
        )
    return counts.select(F.explode(F.array(*rows)).alias("s")).select(
        "s.step", "s.step_name", "s.n_users", "s.conv_from_prev"
    )


# --- burstiness (Fano factor) of hourly event arrivals --------------------------------

_FANO_THRESHOLD = 1.5

_FANO_ORACLE = f"""
WITH hours AS (
  SELECT event_type, date_trunc('hour', ts) AS h, cast(count(*) AS bigint) AS c
  FROM events GROUP BY 1, 2
),
span AS (
  -- the shared observation window: every type is judged over the same spine
  SELECT cast(datediff('hour', min(h), max(h)) AS bigint) + 1 AS n_hours
  FROM hours
),
mom AS (
  SELECT event_type,
         cast(sum(c) AS bigint) AS s1,
         cast(sum(c * c) AS bigint) AS s2
  FROM hours GROUP BY event_type
)
SELECT m.event_type, m.s1 AS n_events, sp.n_hours,
       floor(((cast(m.s2 AS double) / sp.n_hours
               - (cast(m.s1 AS double) / sp.n_hours)
                 * (cast(m.s1 AS double) / sp.n_hours))
              / (cast(m.s1 AS double) / sp.n_hours)) * 10000 + 0.5) / 10000
         AS fano,
       ((cast(m.s2 AS double) / sp.n_hours
         - (cast(m.s1 AS double) / sp.n_hours)
           * (cast(m.s1 AS double) / sp.n_hours))
        / (cast(m.s1 AS double) / sp.n_hours)) > {_FANO_THRESHOLD!r} AS is_bursty
FROM mom m, span sp
"""


@register(
    "fano_burstiness_report",
    oracle=_FANO_ORACLE,
    tags=("extension", "events", "burstiness"),
)
def fano_burstiness_report(spark, sf_dir):
    """Burstiness of hourly event arrivals per type: the Fano factor
    (index of dispersion, var/mean of hourly counts over the shared
    observation window) — ~1 for Poisson-like arrivals, >> 1 for bursty
    traffic; the dispersion diagnostic behind rate-limit and capacity
    sizing. Empty hours count as zero WITHOUT materializing a spine:
    population moments over the full n_hours window follow from the
    observed-hour sums alone (missing hours add nothing to s1/s2).

    Exactness: hour counts and both moment sums are exact int64; the
    Fano ratio is a fixed IEEE expression over them, floor-rounded.

    Scale: one hour-keyed aggregate over the fact (map-side combined),
    a per-type moment rollup, a 1-row span broadcast."""
    ev = read_table(spark, sf_dir, "events")
    hours = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    span = hours.agg(
        (
            (F.unix_timestamp(F.max("h")) - F.unix_timestamp(F.min("h"))) / 3600
        ).cast("long").alias("dh")
    ).select((F.col("dh") + 1).alias("n_hours"))
    mom = hours.groupBy("event_type").agg(
        F.sum("c").alias("s1"), F.sum(F.col("c") * F.col("c")).alias("s2")
    )
    mean = F.col("s1").cast("double") / F.col("n_hours")
    fano = (F.col("s2").cast("double") / F.col("n_hours") - mean * mean) / mean
    return mom.crossJoin(F.broadcast(span)).select(
        "event_type",
        F.col("s1").alias("n_events"),
        "n_hours",
        (F.floor(fano * 10000 + 0.5) / 10000).alias("fano"),
        (fano > _FANO_THRESHOLD).alias("is_bursty"),
    )


# --- cohort LTV curve -----------------------------------------------------------------

_LTV_ORACLE = """
WITH firsts AS (
  SELECT user_id, date_trunc('month', min(ts)) AS cohort_m FROM events GROUP BY user_id
),
sizes AS (
  SELECT cohort_m, cast(count(*) AS bigint) AS cohort_users FROM firsts GROUP BY cohort_m
),
rev AS (
  SELECT f.cohort_m,
         cast(datediff('month', f.cohort_m, date_trunc('month', e.ts)) AS integer)
           AS age_months,
         cast(sum(cast(floor(e.value * 100 + 0.5) AS bigint)) AS bigint) AS cents
  FROM events e JOIN firsts f ON f.user_id = e.user_id
  WHERE e.event_type = 'purchase'
  GROUP BY 1, 2
),
cum AS (
  SELECT cohort_m, age_months, cents,
         cast(sum(cents) OVER (PARTITION BY cohort_m ORDER BY age_months
                               ROWS UNBOUNDED PRECEDING) AS bigint) AS cum_cents
  FROM rev
)
SELECT c.cohort_m, c.age_months, s.cohort_users,
       floor(cast(c.cents AS double) + 0.5) / 100 AS month_revenue,
       floor(cast(c.cum_cents AS double) / s.cohort_users + 0.5) / 100
         AS cum_ltv_per_user
FROM cum c JOIN sizes s ON s.cohort_m = c.cohort_m
"""


@register(
    "cohort_ltv_curve",
    oracle=_LTV_ORACLE,
    tags=("extension", "events", "cohort", "ltv"),
)
def cohort_ltv_curve(spark, sf_dir):
    """Cohort lifetime-value curves: users grouped by first-activity
    month, purchase revenue accumulated by cohort age, divided by cohort
    size — the cumulative-LTV-per-user readout that payback-period and
    acquisition-spend decisions read off (the money companion to
    cohort_retention's activity triangle).

    Exactness: revenue accumulates as exact int64 cents; the per-user
    division is one double expression, floor-rounded to cents.

    Scale: one user-keyed first-touch aggregate, one (cohort, age)
    aggregate over the purchase slice (filter pushed to the scan), and
    a COHORT-partitioned running sum — per-cohort window state only,
    never a global sort."""
    ev = read_table(spark, sf_dir, "events")
    # user-keyed first-touch frame, lineage-cut: consumed by both the
    # cohort-size rollup and the revenue join
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("month", F.min("ts")).alias("cohort_m")
    ).transform(cut_lazy)
    sizes = firsts.groupBy("cohort_m").agg(F.count(F.lit(1)).alias("cohort_users"))
    rev = (
        ev.where(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .groupBy(
            "cohort_m",
            F.months_between(
                F.date_trunc("month", F.col("ts")), F.col("cohort_m")
            )
            .cast("int")
            .alias("age_months"),
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("cents")
        )
    )
    w = (
        Window.partitionBy("cohort_m")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = rev.withColumn("cum_cents", F.sum("cents").over(w))
    return cum.join(F.broadcast(sizes), "cohort_m").select(
        "cohort_m",
        "age_months",
        "cohort_users",
        (F.floor(F.col("cents").cast("double") + 0.5) / 100).alias("month_revenue"),
        (
            F.floor(F.col("cum_cents").cast("double") / F.col("cohort_users") + 0.5)
            / 100
        ).alias("cum_ltv_per_user"),
    )
