"""Batch twins of the streaming window operators, oracle-checked
(the streaming execution itself is covered by tests/test_streaming.py —
same expressions, file source, availableNow trigger)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..sources.lake import read_table
from ..streaming.windows import session_counts, sliding_counts, tumbling_counts
from . import register

# --- tumbling window -----------------------------------------------------------


@register(
    "window_tumbling_hourly",
    oracle="""
SELECT cast(time_bucket(INTERVAL '1 hour', ts) AS timestamp) AS window_start,
       event_type,
       count(*) AS n_events,
       cast(round(sum(cast(value AS decimal(28,6))), 2) AS double) AS sum_value
FROM events
GROUP BY 1, 2
""",
    tags=("extension", "streaming"),
)
def window_tumbling_hourly(spark, sf_dir):
    """Tumbling 1h windows x event_type — the streaming twin runs with a
    watermark over a file source; semantics identical in batch."""
    ev = read_table(spark, sf_dir, "events")
    out = tumbling_counts(ev, "1 hour")
    return out.select(
        "window_start",
        "event_type",
        "n_events",
        F.round(F.col("sum_value"), 2).cast("double").alias("sum_value"),
    )


# --- sliding window -------------------------------------------------------------


@register(
    "window_sliding_2h_1h",
    oracle="""
WITH w AS (
  SELECT unnest([
           cast(time_bucket(INTERVAL '1 hour', ts) AS timestamp),
           cast(time_bucket(INTERVAL '1 hour', ts) AS timestamp) - INTERVAL '1 hour'
         ]) AS window_start
  FROM events
)
SELECT window_start, count(*) AS n_events
FROM w GROUP BY window_start
""",
    tags=("extension", "streaming"),
)
def window_sliding_2h_1h(spark, sf_dir):
    """Sliding windows (2h wide, 1h slide): every event lands in exactly two
    windows; the oracle unrolls the window assignment explicitly."""
    ev = read_table(spark, sf_dir, "events")
    return sliding_counts(ev, "2 hours", "1 hour")


# --- session window --------------------------------------------------------------


@register(
    "window_session_30m",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
sess AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_no
  FROM ordered
)
SELECT cast(min(ts) AS timestamp) AS session_start,
       cast(max(ts) AS timestamp) + INTERVAL '30 minutes' AS session_end,
       user_id,
       count(*) AS n_events
FROM sess GROUP BY user_id, session_no
""",
    tags=("extension", "streaming"),
)
def window_session_30m(spark, sf_dir):
    """Per-user session windows, 30min gap. Spark's session_window end =
    last event + gap; the oracle reproduces that with lag + running sum
    (the classic sessionization rewrite)."""
    ev = read_table(spark, sf_dir, "events")
    return session_counts(ev, "30 minutes")


# --- explicit sessionization (lag + cumulative sum as window functions) -----------


@register(
    "sessionize_events",
    oracle="""
WITH ordered AS (
  SELECT event_id, user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS is_new
  FROM events
)
SELECT event_id, user_id,
       cast(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS bigint) AS session_no
FROM ordered
""",
    tags=("extension", "streaming", "window-fn"),
)
def sessionize_events(spark, sf_dir):
    """Row-level sessionization via lag + running sum — the window-function
    building block behind session analytics (and the engine's demo of
    ordered analytic windows beyond row_number)."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap: a seconds-truncating cast would disagree with
    # the oracle's interval comparison on sub-second boundaries
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    is_new = F.when(gap > 30 * 60 * 1_000_000, 1).otherwise(0)
    running = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(is_new).over(running).cast("long").alias("session_no"),
    )
