"""Time-series repair and anomaly operators over the events stream.

The reference is a meteorological data lake: real sensor feeds have holes
(station offline, QC-rejected readings) and the standard repairs are
gap-fill against a regular time spine, last-observation-carried-forward,
and linear interpolation between the neighboring observations — plus
z-score anomaly flagging against the series' own climatology. None of
these exist as single Spark operators; each is composed here from a
generated spine (``sequence`` + ``explode``), a left join, and
per-series windows.

Scale design: every window is ``partitionBy(series)`` — state is one
series' spine, never the whole table (the repo-wide plan test bans
partition-less windows). The spine is |series| x |buckets| rows built
from a broadcast single-row bounds aggregate, so no shuffle larger than
the hourly aggregate itself. At 100 TB the series key would be a station
id with millions of partitions — the same plan, wider.

Numeric parity: observed averages use the exact-decimal convention
(functions/numeric.py); interpolation applies the identical IEEE op
sequence in both engines (one double division, then multiply-add);
variance quantizes squares with the floor-form round to 6 decimals so the
sums are order-free integers in both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.numeric import (
    exact_sum,
    oracle_avg,
    oracle_round_half_up,
    round_half_up,
    rounded_avg,
)
from ..sources.lake import read_table
from . import register
from ..operators.checkpointing import cut_lazy

#: High-value readings only (~12% of hours have one) so the hourly series
#: has real gaps for LOCF/interpolation to repair.
_SPARSE_VALUE_MIN = 150.0

_SPARSE_CTE = f"""
WITH ev AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket, value
  FROM events WHERE value > {_SPARSE_VALUE_MIN}
),
hourly AS (
  SELECT event_type, bucket, {oracle_avg("value")} AS obs_avg
  FROM ev GROUP BY event_type, bucket
),
bounds AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM ev),
spine AS (
  SELECT t.event_type, s.bucket
  FROM (SELECT DISTINCT event_type FROM ev) t, bounds b,
       unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS s(bucket)
),
filled AS (
  SELECT sp.event_type, sp.bucket, h.obs_avg
  FROM spine sp
  LEFT JOIN hourly h ON h.event_type = sp.event_type AND h.bucket = sp.bucket
)
"""


def _sparse_hourly_filled(spark, sf_dir):
    """Spine-joined sparse hourly series: (event_type, bucket, obs_avg) for
    EVERY hour between the first and last observation, obs_avg NULL on gap
    hours. Spark twin of the ``filled`` CTE above."""
    ev = (
        read_table(spark, sf_dir, "events")
        .where(F.col("value") > _SPARSE_VALUE_MIN)
        .select("event_type", F.date_trunc("hour", "ts").alias("bucket"), "value")
    )
    hourly = ev.groupBy("event_type", "bucket").agg(
        rounded_avg("value").alias("obs_avg")
    )
    bounds = ev.agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("bucket"),
        )
    )
    return spine.join(hourly, ["event_type", "bucket"], "left")


_GAPFILL_ORACLE = (
    _SPARSE_CTE
    + """
SELECT event_type, bucket, obs_avg,
       last_value(obs_avg IGNORE NULLS)
         OVER (PARTITION BY event_type ORDER BY bucket) AS filled_avg,
       obs_avg IS NULL AS is_gap
FROM filled
"""
)


@register("ts_gapfill_locf", oracle=_GAPFILL_ORACLE, tags=("timeseries", "window"))
def ts_gapfill_locf(spark, sf_dir):
    """Gap-fill + last-observation-carried-forward: left-join the sparse
    hourly averages onto a dense generated spine, then carry the last
    non-NULL observation forward per series (``last(..., ignorenulls)``
    over a partitioned running frame). Hours before a series' first
    observation stay NULL — LOCF has nothing to carry."""
    filled = _sparse_hourly_filled(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        "event_type",
        "bucket",
        "obs_avg",
        F.last("obs_avg", ignorenulls=True).over(w).alias("filled_avg"),
        F.col("obs_avg").isNull().alias("is_gap"),
    )


_INTERP_ORACLE = (
    _SPARSE_CTE
    + f"""
, indexed AS (
  SELECT event_type, bucket, obs_avg,
         row_number() OVER (PARTITION BY event_type ORDER BY bucket) AS idx
  FROM filled
),
neighbors AS (
  SELECT event_type, bucket, obs_avg, idx,
         last_value(obs_avg IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY bucket) AS pv,
         last_value(CASE WHEN obs_avg IS NOT NULL THEN idx END IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY bucket) AS pt,
         first_value(obs_avg IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY bucket
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN obs_avg IS NOT NULL THEN idx END IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY bucket
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
  FROM indexed
)
SELECT event_type, bucket, obs_avg,
       CASE WHEN obs_avg IS NOT NULL THEN obs_avg
            ELSE {oracle_round_half_up(
                "pv + (nv - pv) * (cast(idx - pt AS double) / cast(nt - pt AS double))",
                4,
            )}
       END AS interp_avg
FROM neighbors
"""
)


@register(
    "ts_interpolate_linear", oracle=_INTERP_ORACLE, tags=("timeseries", "window")
)
def ts_interpolate_linear(spark, sf_dir):
    """Linear interpolation across gaps: for each gap hour, the previous
    and next observations (value AND spine position, via ignore-nulls
    last/first over mirrored frames) define the line; the gap's value is
    ``pv + (nv - pv) * frac``. Leading/trailing gaps have no neighbor on
    one side and stay NULL — the whole expression nulls out. Both engines
    run the identical IEEE sequence (one double division, multiply, add),
    so the 4-decimal floor-form round matches bit-for-bit."""
    filled = _sparse_hourly_filled(spark, sf_dir)
    w_ord = Window.partitionBy("event_type").orderBy("bucket")
    w_past = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_future = w_ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    obs_idx = F.when(F.col("obs_avg").isNotNull(), F.col("idx"))
    indexed = filled.withColumn("idx", F.row_number().over(w_ord))
    neighbors = indexed.select(
        "event_type",
        "bucket",
        "obs_avg",
        "idx",
        F.last("obs_avg", ignorenulls=True).over(w_past).alias("pv"),
        F.last(obs_idx, ignorenulls=True).over(w_past).alias("pt"),
        F.first("obs_avg", ignorenulls=True).over(w_future).alias("nv"),
        F.first(obs_idx, ignorenulls=True).over(w_future).alias("nt"),
    )
    frac = (F.col("idx") - F.col("pt")).cast("double") / (
        F.col("nt") - F.col("pt")
    ).cast("double")
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * frac
    return neighbors.select(
        "event_type",
        "bucket",
        "obs_avg",
        F.when(F.col("obs_avg").isNotNull(), F.col("obs_avg"))
        .otherwise(round_half_up(interp, 4))
        .alias("interp_avg"),
    )


_ZSCORE_ORACLE = f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         {oracle_avg("value")} AS day_avg
  FROM events GROUP BY event_type, date_trunc('day', ts)
),
stats AS (
  SELECT event_type,
         cast(count(*) AS bigint) AS n,
         cast(sum(cast(day_avg AS decimal(28,6))) AS double) AS s1,
         cast(sum(cast(floor(day_avg * day_avg * 1000000 + 0.5) AS bigint))
              AS double) AS s2q
  FROM daily GROUP BY event_type
),
scored AS (
  SELECT d.event_type, d.day, d.day_avg,
         s1 / n AS mean_avg,
         sqrt((s2q / 1000000 - cast(n AS double) * (s1 / n) * (s1 / n))
              / cast(n - 1 AS double)) AS sd
  FROM daily d JOIN stats s ON s.event_type = d.event_type
  WHERE s.n > 1
)
SELECT event_type, day, day_avg,
       {oracle_round_half_up("(day_avg - mean_avg) / sd", 4)} AS z_score,
       abs((day_avg - mean_avg) / sd) > 2 AS is_anomaly
FROM scored
"""


@register("ts_zscore_anomaly", oracle=_ZSCORE_ORACLE, tags=("timeseries", "A1"))
def ts_zscore_anomaly(spark, sf_dir):
    """Series-relative anomaly flags: each day's average scored against its
    own series' mean/stddev. The variance comes from order-free sums — the
    exact decimal sum for s1, and squares quantized to 6 decimals with the
    floor-form round so s2 is an integer sum — then one identical double
    expression in both engines (never ``stddev_samp`` over doubles, whose
    fold order is nondeterministic). Two tiny aggregates, one broadcast
    join back; nothing shuffles twice."""
    daily = (
        read_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(rounded_avg("value").alias("day_avg"))
    )
    sq = F.floor(F.col("day_avg") * F.col("day_avg") * 1000000 + 0.5).cast("bigint")
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        exact_sum("day_avg").cast("double").alias("s1"),
        F.sum(sq).cast("double").alias("s2q"),
    )
    mean = F.col("s1") / F.col("n")
    var = (
        F.col("s2q") / 1000000 - F.col("n").cast("double") * mean * mean
    ) / (F.col("n") - 1).cast("double")
    scored = (
        daily.join(F.broadcast(stats), "event_type")
        .where(F.col("n") > 1)
        .select(
            "event_type",
            "day",
            "day_avg",
            mean.alias("mean_avg"),
            F.sqrt(var).alias("sd"),
        )
    )
    z = (F.col("day_avg") - F.col("mean_avg")) / F.col("sd")
    return scored.select(
        "event_type",
        "day",
        "day_avg",
        round_half_up(z, 4).alias("z_score"),
        (F.abs(z) > 2).alias("is_anomaly"),
    )


_CUSUM_THRESHOLD = 10.0

_CUSUM_ORACLE = f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         {oracle_avg("value")} AS day_avg
  FROM events GROUP BY event_type, date_trunc('day', ts)
),
stats AS (
  SELECT event_type,
         cast(sum(cast(day_avg AS decimal(28,6))) AS double) / count(*) AS mean_avg
  FROM daily GROUP BY event_type
),
devs AS (
  SELECT d.event_type, d.day, d.day_avg,
         cast(floor((d.day_avg - s.mean_avg) * 1000000 + 0.5) AS bigint) AS dev_q
  FROM daily d JOIN stats s ON s.event_type = d.event_type
)
SELECT event_type, day, day_avg,
       floor((cast(sum(dev_q) OVER (
                PARTITION BY event_type ORDER BY day
                ROWS UNBOUNDED PRECEDING) AS double) / 1000000) * 10000 + 0.5)
         / 10000 AS cusum,
       abs(cast(sum(dev_q) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS UNBOUNDED PRECEDING) AS double) / 1000000)
         > {_CUSUM_THRESHOLD} AS is_shifted
FROM devs
"""


@register("ts_cusum_shift", oracle=_CUSUM_ORACLE, tags=("timeseries", "window"))
def ts_cusum_shift(spark, sf_dir):
    """CUSUM level-shift detection: the running sum of each day's deviation
    from the series mean. A sustained drift accumulates where single-day
    z-scores stay small — the change-point complement to
    ``ts_zscore_anomaly``. Deviations are quantized to 1e-6 ints before the
    running window sum, so the cumulative values are exact in both engines
    regardless of fold order; the window partitions by series."""
    daily = (
        read_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(rounded_avg("value").alias("day_avg"))
    )
    stats = daily.groupBy("event_type").agg(
        (exact_sum("day_avg").cast("double") / F.count(F.lit(1))).alias("mean_avg")
    )
    devs = daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "day",
        "day_avg",
        F.floor((F.col("day_avg") - F.col("mean_avg")) * 1000000 + 0.5)
        .cast("bigint")
        .alias("dev_q"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cusum = F.sum("dev_q").over(w).cast("double") / 1000000
    return devs.select(
        "event_type",
        "day",
        "day_avg",
        round_half_up(cusum, 4).alias("cusum"),
        (F.abs(cusum) > _CUSUM_THRESHOLD).alias("is_shifted"),
    )


# --- time-weighted average (TWAP) ---------------------------------------------------

_TWAP_ORACLE = """
WITH seg AS (
  SELECT event_type,
         cast(floor(value * 1000000 + 0.5) AS bigint) AS value_q,
         lead(epoch_us(ts)) OVER (PARTITION BY event_type
                                  ORDER BY ts, event_id)
           - epoch_us(ts) AS dt_us
  FROM events
),
agg AS (
  SELECT event_type,
         sum(cast(value_q AS decimal(38,0)) * cast(dt_us AS decimal(38,0)))
           AS sp,
         cast(sum(dt_us) AS bigint) AS sd,
         cast(count(*) AS bigint) AS n_segments
  FROM seg WHERE dt_us IS NOT NULL
  GROUP BY event_type
)
SELECT event_type, n_segments,
       floor(cast(sp AS double) / cast(sd AS double) / 1000000 * 10000 + 0.5)
         / 10000 AS twap
FROM agg
"""


@register(
    "twap_event_values",
    oracle=_TWAP_ORACLE,
    tags=("extension", "timeseries", "twap"),
)
def twap_event_values(spark, sf_dir):
    """Time-weighted average value per event_type: each observation is
    weighted by how long it remained the latest one (microseconds until
    the next event of the same type; the final observation carries no
    weight). The honest mean for irregularly-sampled series — an
    arithmetic mean over-counts bursts.

    Determinism: weights are integer microsecond spans from a keyed lead
    window; values quantize to 1e-6 integers; the weighted sum runs in
    decimal(38,0) so the cross-row accumulation is exact and order-free;
    ONE double division at the end. Scale: one shuffle on the series key
    shared by the window and the aggregate."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seg = ev.select(
        "event_type",
        F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long").alias("value_q"),
        (
            F.lead(F.unix_micros(F.col("ts"))).over(w) - F.unix_micros(F.col("ts"))
        ).alias("dt_us"),
    ).where(F.col("dt_us").isNotNull())
    agg = seg.groupBy("event_type").agg(
        F.sum(
            F.col("value_q").cast("decimal(38,0)") * F.col("dt_us").cast("decimal(38,0)")
        ).alias("sp"),
        F.sum("dt_us").alias("sd"),
        F.count(F.lit(1)).alias("n_segments"),
    )
    return agg.select(
        "event_type",
        "n_segments",
        round_half_up(
            F.col("sp").cast("double") / F.col("sd").cast("double") / 1000000, 4
        ).alias("twap"),
    )


# --- grouped exact percentiles ------------------------------------------------------

_PCT_PS = (0.5, 0.9, 0.99)

_PCT_ORACLE = f"""
SELECT event_type,
       {", ".join(
           f"floor(quantile_cont(value, {p!r}) * 10000 + 0.5) / 10000 AS p{int(p*100)}"
           for p in _PCT_PS
       )}
FROM events GROUP BY event_type
"""


@register(
    "event_value_percentiles",
    oracle=_PCT_ORACLE,
    tags=("extension", "timeseries", "percentiles"),
)
def event_value_percentiles(spark, sf_dir):
    """Per-series latency-band style percentiles (p50/p90/p99) of the
    event value, exact interpolated — the SLO readout. Parity: Spark
    percentile() and DuckDB quantile_cont both linearly interpolate on
    the sorted doubles (the primitive feature_quantile_binning proved);
    floor-form round to 4.

    Scale: grouped exact percentiles sort within each series partition —
    fine while one series fits an executor (true for telemetry keyed by
    type/station). Beyond that, the histogram sketch
    (quantile_histogram_sketch) is the mergeable path."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        *[
            round_half_up(F.expr(f"percentile(value, {p!r})"), 4).alias(
                f"p{int(p * 100)}"
            )
            for p in _PCT_PS
        ]
    )


# --- STL-lite additive decomposition of monthly revenue -----------------------------

_STL_ORACLE = """
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         cast(sum(cast(floor(o_totalprice * 100 + 0.5) AS bigint)) AS bigint)
           AS cents
  FROM orders GROUP BY 1
),
idx AS (
  SELECT m, cents,
         (year(m) * 12 + month(m)) AS mi
  FROM monthly
),
tr AS (
  SELECT a.m, a.mi, a.cents,
         cast(sum(CASE WHEN abs(b.mi - a.mi) = 6 THEN b.cents
                       ELSE 2 * b.cents END) AS bigint) AS num24,
         cast(count(*) AS bigint) AS n_terms
  FROM idx a JOIN idx b ON b.mi BETWEEN a.mi - 6 AND a.mi + 6
  GROUP BY a.m, a.mi, a.cents
),
det AS (
  SELECT m, mi, cents,
         CASE WHEN n_terms = 13 THEN num24 END AS num24
  FROM tr
),
seas AS (
  SELECT month(m) AS moy,
         cast(sum(24 * cents - num24) AS bigint) AS d24_sum,
         cast(count(*) AS bigint) AS d_n
  FROM det WHERE num24 IS NOT NULL GROUP BY 1
)
SELECT det.m AS month,
       floor(cast(det.cents AS double) + 0.5) / 100 AS revenue,
       CASE WHEN det.num24 IS NOT NULL THEN
         floor(cast(det.num24 AS double) / 24 + 0.5) / 100 END AS trend,
       floor(cast(seas.d24_sum AS double) / (24 * seas.d_n) + 0.5) / 100
         AS seasonal,
       CASE WHEN det.num24 IS NOT NULL THEN
         floor(cast(det.cents AS double)
               - cast(det.num24 AS double) / 24
               - cast(seas.d24_sum AS double) / (24 * seas.d_n) + 0.5) / 100
       END AS residual
FROM det JOIN seas ON month(det.m) = seas.moy
"""


@register(
    "stl_decompose_monthly",
    oracle=_STL_ORACLE,
    tags=("extension", "timeseries", "decomposition"),
)
def stl_decompose_monthly(spark, sf_dir):
    """STL-lite additive decomposition of monthly revenue: trend = the
    classic 13-point centered moving average with half weights at the
    ends (x2/24 inner, x1/24 ends — the standard 12-month seasonal MA),
    seasonal = month-of-year mean of the detrended series, residual =
    revenue - trend - seasonal. Months without the full +/-6 window have
    NULL trend/residual (standard edge behavior).

    Exactness: revenue carries as integer cents; the MA numerator and
    the detrended values (24*cents - num24, i.e. 1/24-cent units) are
    exact int64, so the seasonal group sums are order-free; trend/
    seasonal/residual are fixed IEEE divisions of exact integers.

    Scale: one fact aggregate to months, then a month-spine self-join
    (|months|^2 at worst, months are tiny) — the decomposition never
    touches fact rows again, and no partition-less window exists: the
    centered MA is the +/-6 band join."""
    o = read_table(spark, sf_dir, "orders")
    monthly = o.groupBy(F.date_trunc("month", "o_orderdate").alias("m")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")).alias("cents")
    )
    idx = monthly.select(
        "m", "cents", (F.year("m") * 12 + F.month("m")).alias("mi")
    ).transform(cut_lazy)
    b = idx.select(
        F.col("mi").alias("bmi"), F.col("cents").alias("bcents")
    )
    tr = (
        idx.join(
            F.broadcast(b),
            (F.col("bmi") >= F.col("mi") - 6) & (F.col("bmi") <= F.col("mi") + 6),
        )
        .groupBy("m", "mi", "cents")
        .agg(
            F.sum(
                F.when(F.abs(F.col("bmi") - F.col("mi")) == 6, F.col("bcents"))
                .otherwise(2 * F.col("bcents"))
            ).alias("num24"),
            F.count(F.lit(1)).alias("n_terms"),
        )
        .select(
            "m",
            "cents",
            F.when(F.col("n_terms") == 13, F.col("num24")).alias("num24"),
        )
        .transform(cut_lazy)
    )
    seas = (
        tr.where(F.col("num24").isNotNull())
        .groupBy(F.month("m").alias("moy"))
        .agg(
            F.sum(24 * F.col("cents") - F.col("num24")).alias("d24_sum"),
            F.count(F.lit(1)).alias("d_n"),
        )
    )
    t_dbl = F.col("num24").cast("double") / 24
    s_dbl = F.col("d24_sum").cast("double") / (24 * F.col("d_n"))
    return (
        tr.join(F.broadcast(seas), F.month("m") == F.col("moy"))
        .select(
            F.col("m").alias("month"),
            (F.floor(F.col("cents").cast("double") + 0.5) / 100).alias("revenue"),
            F.when(
                F.col("num24").isNotNull(), F.floor(t_dbl + 0.5) / 100
            ).alias("trend"),
            (F.floor(s_dbl + 0.5) / 100).alias("seasonal"),
            F.when(
                F.col("num24").isNotNull(),
                F.floor(F.col("cents").cast("double") - t_dbl - s_dbl + 0.5) / 100,
            ).alias("residual"),
        )
    )


# --- Mann-Kendall trend test --------------------------------------------------------

_MK_ORACLE = """
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         cast(sum(cast(floor(o_totalprice * 100 + 0.5) AS bigint)) AS bigint)
           AS cents
  FROM orders GROUP BY 1
),
pairs AS (
  SELECT CASE WHEN b.cents > a.cents THEN 1
              WHEN b.cents < a.cents THEN -1 ELSE 0 END AS sgn
  FROM monthly a JOIN monthly b ON a.m < b.m
),
s AS (SELECT cast(sum(sgn) AS bigint) AS s_stat FROM pairs),
n AS (SELECT cast(count(*) AS bigint) AS n FROM monthly),
ties AS (
  SELECT cast(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS bigint) AS tie_term
  FROM (SELECT cast(count(*) AS bigint) AS t FROM monthly GROUP BY cents)
  WHERE t > 1
),
v AS (
  SELECT s.s_stat, n.n,
         (n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_term) / 18.0 AS var_s
  FROM s, n, ties
)
SELECT n AS n_months, s_stat,
       floor(var_s * 100 + 0.5) / 100 AS var_s,
       floor(CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
                  WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)
                  ELSE 0.0 END * 1000000 + 0.5) / 1000000 AS z,
       CASE WHEN abs(CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
                          WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)
                          ELSE 0.0 END) > 1.96
            THEN CASE WHEN s_stat > 0 THEN 'increasing' ELSE 'decreasing' END
            ELSE 'no_trend' END AS verdict
FROM v
"""


@register(
    "mann_kendall_trend",
    oracle=_MK_ORACLE,
    tags=("extension", "timeseries", "trend"),
)
def mann_kendall_trend(spark, sf_dir):
    """Mann-Kendall nonparametric trend test on monthly revenue: the
    integer S statistic (sum of pairwise sign comparisons in time
    order), tie-corrected variance, and the continuity-corrected z — no
    distributional assumption, the standard monotone-trend gate before
    anyone fits a line. Verdict at the 5% two-sided level.

    Exactness: S and the tie term are pure int64 over exact cents; the
    variance and z are fixed IEEE expressions over those ints (sqrt is
    correctly rounded).

    Scale: one fact aggregate to months; the pairwise sign sum is a
    self-join of the TINY month spine (n^2 on dozens of rows) — the fact
    is never touched again. For per-key trend screens, the same shape
    runs keyed (group the spine per key)."""
    o = read_table(spark, sf_dir, "orders")
    monthly = o.groupBy(F.date_trunc("month", "o_orderdate").alias("m")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")).alias("cents")
    ).transform(cut_lazy)
    a, b = monthly.alias("a"), monthly.alias("b")
    s = (
        a.join(F.broadcast(b), F.col("a.m") < F.col("b.m"))
        .select(
            F.when(F.col("b.cents") > F.col("a.cents"), 1)
            .when(F.col("b.cents") < F.col("a.cents"), -1)
            .otherwise(0)
            .alias("sgn")
        )
        .agg(F.sum("sgn").alias("s_stat"))
    )
    n = monthly.agg(F.count(F.lit(1)).alias("n"))
    ties = (
        monthly.groupBy("cents")
        .agg(F.count(F.lit(1)).alias("t"))
        .where(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)), F.lit(0)
            ).alias("tie_term")
        )
    )
    v = (
        s.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(ties))
        .select(
            "s_stat",
            "n",
            (
                (
                    F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                    - F.col("tie_term")
                )
                / 18.0
            ).alias("var_s"),
        )
    )
    z = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / F.sqrt(F.col("var_s")))
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / F.sqrt(F.col("var_s")))
        .otherwise(F.lit(0.0))
    )
    return v.select(
        F.col("n").alias("n_months"),
        "s_stat",
        (F.floor(F.col("var_s") * 100 + 0.5) / 100).alias("var_s"),
        (F.floor(z * 1000000 + 0.5) / 1000000).alias("z"),
        F.when(
            F.abs(z) > 1.96,
            F.when(F.col("s_stat") > 0, F.lit("increasing")).otherwise(
                F.lit("decreasing")
            ),
        )
        .otherwise(F.lit("no_trend"))
        .alias("verdict"),
    )


# --- Theil-Sen robust slope ---------------------------------------------------------

_TS_ORACLE = """
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         (year(o_orderdate) * 12 + month(o_orderdate)) AS mi,
         cast(sum(cast(floor(o_totalprice * 100 + 0.5) AS bigint)) AS bigint)
           AS cents
  FROM orders GROUP BY 1, 2
),
slopes AS (
  SELECT cast(b.cents - a.cents AS double) / (b.mi - a.mi) / 100.0 AS slope
  FROM monthly a JOIN monthly b ON a.mi < b.mi
)
SELECT cast(count(*) AS bigint) AS n_pairs,
       floor(quantile_cont(slope, 0.5) * 100 + 0.5) / 100 AS theil_sen_slope,
       floor(quantile_cont(slope, 0.05) * 100 + 0.5) / 100 AS slope_p05,
       floor(quantile_cont(slope, 0.95) * 100 + 0.5) / 100 AS slope_p95
FROM slopes
"""


@register(
    "theil_sen_slope",
    oracle=_TS_ORACLE,
    tags=("extension", "timeseries", "trend"),
)
def theil_sen_slope(spark, sf_dir):
    """Theil-Sen robust slope of monthly revenue: the median of all
    pairwise slopes (dollars per month), with the 5th/95th percentile
    slope band — the outlier-proof companion to mann_kendall_trend's
    verdict (one corrupted month moves OLS arbitrarily, moves the
    median slope almost not at all).

    Exactness: each pairwise slope is one IEEE division of exact
    integer cent/month deltas; the exact interpolated percentile sorts
    identical doubles in both engines (the order_price_quantiles idiom).

    Scale: one fact aggregate to months; the n^2 pairwise slopes live
    on the tiny month spine. At very long horizons the repeated-median
    or sampling variant bounds the pair count — noted, not needed at
    a month spine's size."""
    o = read_table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(
            F.date_trunc("month", "o_orderdate").alias("m"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("mi"),
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")).alias(
                "cents"
            )
        )
        .transform(cut_lazy)
    )
    a, b = monthly.alias("a"), monthly.alias("b")
    slopes = a.join(F.broadcast(b), F.col("a.mi") < F.col("b.mi")).select(
        (
            (F.col("b.cents") - F.col("a.cents")).cast("double")
            / (F.col("b.mi") - F.col("a.mi"))
            / 100.0
        ).alias("slope")
    )
    return slopes.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        (F.floor(F.expr("percentile(slope, 0.5)") * 100 + 0.5) / 100).alias(
            "theil_sen_slope"
        ),
        (F.floor(F.expr("percentile(slope, 0.05)") * 100 + 0.5) / 100).alias(
            "slope_p05"
        ),
        (F.floor(F.expr("percentile(slope, 0.95)") * 100 + 0.5) / 100).alias(
            "slope_p95"
        ),
    )


# --- Gumbel block-maxima return levels ----------------------------------------------

import math as _math

#: Gumbel method-of-moments constants and return-level factors
#: k_T = -ln(-ln(1 - 1/T)), computed ONCE in Python and embedded as
#: literals in both engines (no runtime double-log anywhere)
_GUM_EULER = 0.5772156649015329
_GUM_SQRT6_PI = _math.sqrt(6.0) / _math.pi
_GUM_K12 = round(-_math.log(-_math.log(1.0 - 1.0 / 12.0)), 9)
_GUM_K120 = round(-_math.log(-_math.log(1.0 - 1.0 / 120.0)), 9)

_GUM_ORACLE = f"""
WITH daily AS (
  SELECT cast(o_orderdate AS date) AS d,
         cast(sum(cast(floor(o_totalprice * 100 + 0.5) AS bigint)) AS bigint)
           AS cents
  FROM orders GROUP BY 1
),
blocks AS (
  -- whole dollars: cents^2 sums overflow int64 at large SFs
  SELECT date_trunc('month', d) AS m, cast(max(cents) // 100 AS bigint) AS mx
  FROM daily GROUP BY 1
),
mom AS (
  SELECT cast(count(*) AS bigint) AS n,
         cast(sum(mx) AS bigint) AS s1,
         cast(sum(mx * mx) AS bigint) AS s2
  FROM blocks
),
fit AS (
  SELECT n,
         cast(s1 AS double) / n AS mean_mx,
         sqrt(cast(s2 AS double) / n
              - (cast(s1 AS double) / n) * (cast(s1 AS double) / n))
           AS sd_mx
  FROM mom
)
SELECT n AS n_blocks,
       cast(floor(mean_mx + 0.5) AS bigint) AS mean_block_max,
       cast(floor((mean_mx - {_GUM_EULER!r} * {_GUM_SQRT6_PI!r} * sd_mx) + 0.5)
            AS bigint) AS gumbel_mu,
       cast(floor({_GUM_SQRT6_PI!r} * sd_mx + 0.5) AS bigint) AS gumbel_beta,
       cast(floor((mean_mx - {_GUM_EULER!r} * {_GUM_SQRT6_PI!r} * sd_mx
                   + {_GUM_SQRT6_PI!r} * sd_mx * {_GUM_K12!r}) + 0.5)
            AS bigint) AS return_level_12,
       cast(floor((mean_mx - {_GUM_EULER!r} * {_GUM_SQRT6_PI!r} * sd_mx
                   + {_GUM_SQRT6_PI!r} * sd_mx * {_GUM_K120!r}) + 0.5)
            AS bigint) AS return_level_120
FROM fit
"""


@register(
    "gumbel_return_levels",
    oracle=_GUM_ORACLE,
    tags=("extension", "timeseries", "extremes"),
)
def gumbel_return_levels(spark, sf_dir):
    """Extreme-value capacity planning: monthly block maxima of daily
    revenue, a Gumbel fit by method of moments (beta = s*sqrt(6)/pi,
    mu = mean - gamma*beta), and the 12-block / 120-block return levels
    x_T = mu + beta * k_T — "the daily peak to provision for once a
    year / once a decade", reported in whole dollars (block maxima
    descale from cents so the squared-moment sums stay inside int64 at
    any SF). The k_T = -ln(-ln(1 - 1/T)) factors and the
    Euler-Mascheroni / sqrt(6)/pi constants compute once in Python and
    embed as literals, so both engines run only +-*/ and one sqrt over
    exact integer moments.

    Scale: the fact reduces to daily sums (one aggregate), daily to
    monthly maxima (tiny), and the fit is single-row algebra — the
    classic block-maxima pipeline."""
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")).alias("cents")
    )
    # whole dollars: cents^2 moment sums overflow int64 at large SFs
    blocks = daily.groupBy(F.date_trunc("month", "d").alias("m")).agg(
        F.floor(F.max("cents") / 100).cast("long").alias("mx")
    )
    mom = blocks.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("mx").alias("s1"),
        F.sum(F.col("mx") * F.col("mx")).alias("s2"),
    )
    mean_mx = F.col("s1").cast("double") / F.col("n")
    sd_mx = F.sqrt(F.col("s2").cast("double") / F.col("n") - mean_mx * mean_mx)
    beta = _GUM_SQRT6_PI * sd_mx
    mu = mean_mx - _GUM_EULER * beta
    r2 = lambda c: F.floor(c + 0.5)  # whole dollars  # noqa: E731
    return mom.select(
        F.col("n").alias("n_blocks"),
        r2(mean_mx).alias("mean_block_max"),
        r2(mu).alias("gumbel_mu"),
        r2(beta).alias("gumbel_beta"),
        r2(mu + beta * _GUM_K12).alias("return_level_12"),
        r2(mu + beta * _GUM_K120).alias("return_level_120"),
    )


# --- autocorrelation function of daily revenue ---------------------------------------

_ACF_MAX_LAG = 10

_ACF_ORACLE = f"""
WITH daily AS (
  SELECT cast(o_orderdate AS date) AS d,
         cast(floor(cast(sum(cast(floor(o_totalprice * 100 + 0.5) AS bigint))
                         AS double) / 100000.0) AS bigint) AS x
  FROM orders GROUP BY 1
),
stats AS (
  SELECT cast(count(*) AS bigint) AS n,
         cast(sum(x) AS bigint) AS s1,
         cast(sum(x * x) AS bigint) AS s2
  FROM daily
),
lags AS (SELECT cast(unnest(range(1, {_ACF_MAX_LAG + 1})) AS integer) AS k),
pairs AS (
  SELECT l.k,
         cast(count(*) AS bigint) AS n_pairs,
         cast(sum(a.x * b.x) AS bigint) AS sxy,
         cast(sum(a.x) AS bigint) AS sa,
         cast(sum(b.x) AS bigint) AS sb
  FROM lags l
  JOIN daily a ON true
  JOIN daily b ON b.d = a.d + l.k
  GROUP BY l.k
)
SELECT p.k AS lag, p.n_pairs,
       floor((cast(p.sxy AS double)
              - (cast(s.s1 AS double) / s.n) * cast(p.sa + p.sb AS double)
              + cast(p.n_pairs AS double)
                * (cast(s.s1 AS double) / s.n) * (cast(s.s1 AS double) / s.n))
             / (cast(s.s2 AS double)
                - cast(s.n AS double)
                  * (cast(s.s1 AS double) / s.n) * (cast(s.s1 AS double) / s.n))
             * 10000 + 0.5) / 10000 AS acf
FROM pairs p, stats s
"""


@register(
    "acf_daily_revenue",
    oracle=_ACF_ORACLE,
    tags=("extension", "timeseries", "acf"),
)
def acf_daily_revenue(spark, sf_dir):
    """Autocorrelation function of daily revenue at calendar lags 1..10 —
    the seasonality/persistence diagnostic behind every forecasting model
    choice (a weekly cycle shows as a lag-7 peak). Calendar-lag
    semantics: a pair exists when both day d and day d+k are present;
    mean and variance are over all observed days (the standard ACF
    estimator with the global mean).

    Exactness: daily revenue descales to thousands of dollars (squared
    sums stay inside int64 up to SF ~1e6); all sums are exact integers;
    the ratio is one fixed IEEE expression written identically in both
    engines, floor-rounded to 4 decimals.

    Scale: the fact reduces to one daily aggregate (map-side combined);
    the lag pairing is a self-equi-join on the date key of the tiny
    daily relation with the 10 lags exploded on the probe side — never
    a window over the whole series, no global sort."""
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.floor(
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")).cast(
                "double"
            )
            / 100000.0
        )
        .cast("long")
        .alias("x")
    )
    stats = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
    )
    b = daily.select(
        F.explode(F.array(*[F.lit(k) for k in range(1, _ACF_MAX_LAG + 1)])).alias("k"),
        F.col("d").alias("db"),
        F.col("x").alias("xb"),
    ).select("k", F.date_sub(F.col("db"), F.col("k")).alias("d"), "xb")
    pairs = (
        daily.join(b, "d")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("x") * F.col("xb")).alias("sxy"),
            F.sum("x").alias("sa"),
            F.sum("xb").alias("sb"),
        )
    )
    xbar = F.col("s1").cast("double") / F.col("n")
    num = (
        F.col("sxy").cast("double")
        - xbar * (F.col("sa") + F.col("sb")).cast("double")
        + F.col("n_pairs").cast("double") * xbar * xbar
    )
    den = F.col("s2").cast("double") - F.col("n").cast("double") * xbar * xbar
    return pairs.crossJoin(F.broadcast(stats)).select(
        F.col("k").alias("lag"),
        "n_pairs",
        (F.floor(num / den * 10000 + 0.5) / 10000).alias("acf"),
    )


# --- simple-exponential-smoothing forecast backtest ----------------------------------

_SES_ALPHA = 0.3
_SES_MAXK = 256
# (1-alpha)^k for k = 0..255, computed once in Python and embedded as
# literals in BOTH engines — engine pow() may differ in the last ulp,
# identical literals cannot.
_SES_POW = [(1.0 - _SES_ALPHA) ** k for k in range(_SES_MAXK)]

_SES_ORACLE = f"""
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         cast(floor(cast(sum(cast(floor(o_totalprice * 100 + 0.5) AS bigint))
                         AS double) / 100000.0) AS bigint) AS x
  FROM orders GROUP BY 1
),
lo AS (SELECT min(m) AS m0 FROM monthly),
idxd AS (
  SELECT cast(datediff('month', lo.m0, monthly.m) AS bigint) + 1 AS idx, x
  FROM monthly, lo
),
pw AS (SELECT {list(_SES_POW)} AS p),
-- closed-form SES: s_t = sum_{{j=2..t}} a(1-a)^(t-j) x_j + (1-a)^(t-1) x_1,
-- each term int64-quantized so the sum is order-free
levels AS (
  SELECT b.idx AS t,
         cast(sum(cast(floor(a.x * (CASE WHEN a.idx = 1
                                         THEN pw.p[(b.idx - 1) + 1]
                                         ELSE {_SES_ALPHA!r} * pw.p[(b.idx - a.idx) + 1]
                                    END) * 1000000.0 + 0.5) AS bigint)) AS bigint) AS s_q
  FROM idxd a JOIN idxd b ON a.idx <= b.idx, pw
  GROUP BY b.idx
),
errs AS (
  SELECT x.idx, cast(floor(abs(x.x - cast(l.s_q AS double) / 1000000.0)
                           * 1000000.0 + 0.5) AS bigint) AS ae_q
  FROM idxd x JOIN levels l ON l.t = x.idx - 1
),
agg AS (
  SELECT cast(count(*) AS bigint) AS n_scored, cast(sum(ae_q) AS bigint) AS sae
  FROM errs
),
fin AS (SELECT s_q FROM levels ORDER BY t DESC LIMIT 1),
n AS (SELECT cast(count(*) AS bigint) AS n_months FROM idxd)
SELECT n.n_months,
       floor(cast(f.s_q AS double) / 1000000.0 * 1000 + 0.5) / 1000 AS ses_level,
       floor(cast(f.s_q AS double) / 1000000.0 * 1000 + 0.5) / 1000 AS forecast_next,
       floor(cast(a.sae AS double) / a.n_scored / 1000000.0 * 1000 + 0.5) / 1000
         AS backtest_mae
FROM fin f, agg a, n
"""


@register(
    "ses_backtest_monthly",
    oracle=_SES_ORACLE,
    tags=("extension", "timeseries", "forecast"),
)
def ses_backtest_monthly(spark, sf_dir):
    """Simple-exponential-smoothing forecast of monthly revenue with an
    in-sample one-step-ahead backtest (alpha=0.3, s_1 = x_1 init): the
    level after the last month is the next-month forecast, and the MAE
    of forecasting each month from the previous level says how much to
    trust it — the minimum honest deliverable of any forecast.

    The recursion is unrolled to its closed form, so no iteration and
    no sequential scan: every s_t is a weighted sum over months j <= t
    with weights alpha*(1-alpha)^(t-j) (and the init weight for j=1).
    The (1-alpha)^k table is computed once in Python and embedded as
    literals in BOTH engines — engine pow() could differ in the last
    ulp, identical literals cannot. Each term is int64-quantized so
    sums are order-free.

    Scale: the fact reduces to one monthly aggregate; the T^2 closed
    form runs on the month spine (T months — tiny at any data volume;
    the unroll trades O(T) sequential steps nobody can parallelize for
    O(T^2) trivially-parallel terms). Spine length is capped by the
    256-entry weight table; beyond it the result turns NULL loudly
    rather than silently truncating."""
    o = read_table(spark, sf_dir, "orders")
    monthly = o.groupBy(F.date_trunc("month", "o_orderdate").alias("m")).agg(
        F.floor(
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")).cast(
                "double"
            )
            / 100000.0
        )
        .cast("long")
        .alias("x")
    )
    lo = monthly.agg(F.min("m").alias("m0"))
    idxd = monthly.crossJoin(F.broadcast(lo)).select(
        (F.months_between(F.col("m"), F.col("m0")).cast("long") + 1).alias("idx"),
        "x",
    )
    pw = F.array(*[F.lit(v) for v in _SES_POW])
    a = idxd.select(F.col("idx").alias("j"), F.col("x").alias("xj"))
    b = idxd.select(F.col("idx").alias("t"))
    weight = F.when(
        F.col("j") == 1, F.element_at(pw, (F.col("t") - 1 + 1).cast("int"))
    ).otherwise(
        _SES_ALPHA * F.element_at(pw, (F.col("t") - F.col("j") + 1).cast("int"))
    )
    levels = (
        b.join(F.broadcast(a), F.col("j") <= F.col("t"))
        .select("t", F.floor(F.col("xj") * weight * 1000000.0 + 0.5).cast("long").alias("term_q"))
        .groupBy("t")
        .agg(F.sum("term_q").alias("s_q"))
    )
    prev = levels.select((F.col("t") + 1).alias("idx"), F.col("s_q").alias("prev_q"))
    errs = idxd.join(prev, "idx").select(
        F.floor(
            F.abs(F.col("x") - F.col("prev_q").cast("double") / 1000000.0)
            * 1000000.0
            + 0.5
        )
        .cast("long")
        .alias("ae_q")
    )
    agg = errs.agg(
        F.count(F.lit(1)).alias("n_scored"), F.sum("ae_q").alias("sae")
    )
    fin = levels.orderBy(F.desc("t")).limit(1).select("s_q")
    n = idxd.agg(F.count(F.lit(1)).alias("n_months"))
    lvl = F.col("s_q").cast("double") / 1000000.0
    return (
        fin.crossJoin(F.broadcast(agg))
        .crossJoin(F.broadcast(n))
        .select(
            "n_months",
            (F.floor(lvl * 1000 + 0.5) / 1000).alias("ses_level"),
            (F.floor(lvl * 1000 + 0.5) / 1000).alias("forecast_next"),
            (
                F.floor(
                    F.col("sae").cast("double") / F.col("n_scored") / 1000000.0 * 1000
                    + 0.5
                )
                / 1000
            ).alias("backtest_mae"),
        )
    )
