"""Structured-Streaming execution: the streaming twins must reproduce the
batch operators over a file source (availableNow), drop late rows past the
watermark across micro-batches, and run custom state (applyInPandasWithState)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bigdata_meteo_datalake_spark.sources.lake import read_table
from bigdata_meteo_datalake_spark.streaming.windows import (
    run_available_now,
    running_user_totals,
    stream_events,
    stream_tumbling_counts,
    tumbling_counts,
)

from .conftest import SF0001


@pytest.fixture()
def event_source(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    events = read_table(spark, SF0001, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    events.coalesce(1).write.mode("overwrite").parquet(src)
    return src, events


def test_stream_tumbling_matches_batch(spark, event_source, tmp_path):
    src, events = event_source
    stream = stream_events(spark, src, events.schema)
    agg = stream_tumbling_counts(stream, duration="1 hour", watermark="1 hour")
    run_available_now(agg, "stream_tumbling", str(tmp_path / "ckpt"))
    got = (
        spark.table("stream_tumbling")
        .select("window_start", "event_type", "n_events", F.col("sum_value").cast("double"))
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    want = (
        tumbling_counts(events, "1 hour")
        .select("window_start", "event_type", "n_events", F.col("sum_value").cast("double"))
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_watermark_drops_late_rows(spark, tmp_path):
    src = str(tmp_path / "late_src")
    ckpt = str(tmp_path / "late_ckpt")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"

    def mk(rows):
        import datetime as dt

        rows = [
            (e, dt.datetime.fromisoformat(ts), u, t, v) for (e, ts, u, t, v) in rows
        ]
        return spark.createDataFrame(rows, schema)

    out = str(tmp_path / "late_out")

    def run_once():
        stream = stream_events(spark, src, mk([]).schema)
        agg = stream_tumbling_counts(stream, duration="1 hour", watermark="1 hour")
        q = (
            agg.writeStream.outputMode("update")
            # foreachBatch sink: supports checkpoint recovery (memory sink
            # doesn't), so the watermark survives across the two runs
            .foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: events at 10:10-11:00 -> watermark persisted = 10:00
    mk(
        [
            (1, "2024-03-01 10:10:00", 1, "view", 1.0),
            (2, "2024-03-01 11:00:00", 1, "view", 1.0),
        ]
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()

    # run 2 (same checkpoint): one too-late row and one acceptable row
    mk(
        [
            (3, "2024-03-01 08:30:00", 1, "view", 1.0),  # < 10:00 -> dropped
            (4, "2024-03-01 10:20:00", 1, "view", 1.0),  # counted
        ]
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()

    updates = spark.read.parquet(out).collect()
    by_window = {}
    for r in updates:
        key = str(r["window_start"])
        by_window[key] = max(by_window.get(key, 0), r["n_events"])
    assert by_window.get("2024-03-01 10:00:00") == 2  # event 1 + late-but-ok 4
    assert "2024-03-01 08:00:00" not in by_window  # too-late row dropped


def test_running_user_totals_stateful(spark, event_source, tmp_path):
    src, events = event_source
    stream = stream_events(spark, src, events.schema)
    totals = running_user_totals(stream)
    q = (
        totals.writeStream.outputMode("update")
        .format("memory")
        .queryName("user_totals")
        .option("checkpointLocation", str(tmp_path / "state_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["user_id"]: (r["n_events"], round(r["sum_value"], 4))
        for r in spark.table("user_totals").collect()
    }
    want = {
        r["user_id"]: (r["n"], round(r["s"], 4))
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want


def test_stream_static_enrich(spark, event_source, tmp_path):
    from bigdata_meteo_datalake_spark.streaming.windows import stream_static_enrich

    src, events = event_source
    dim = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("user_total"))
    stream = stream_events(spark, src, events.schema)
    enriched = stream_static_enrich(stream, dim, "user_id")
    q = (
        enriched.writeStream.outputMode("append")
        .format("memory")
        .queryName("enrich_out")
        .option("checkpointLocation", str(tmp_path / "enrich_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("enrich_out")
    assert out.count() == events.count()
    assert out.where(F.col("user_total").isNull()).count() == 0


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Duplicate keys arriving across micro-batches within the watermark
    horizon are dropped; each key survives exactly once."""
    from bigdata_meteo_datalake_spark.streaming.windows import stream_dedup

    src = str(tmp_path / "dedup_src")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"

    def mk(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)

    import datetime as dt

    def t(m):
        return dt.datetime(2026, 3, 1, 10, m)

    mk([(1, t(0), 7, "click", 1.0), (2, t(1), 7, "click", 2.0)])
    mk([(1, t(2), 7, "click", 1.0), (3, t(3), 8, "view", 3.0)])  # id 1 is a dup

    stream = stream_events(spark, src, spark.createDataFrame([], schema).schema)
    dedup = stream_dedup(stream, ["event_id"], watermark="1 hour")
    q = (
        dedup.writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_dedup_t")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r.event_id for r in spark.table("stream_dedup_t").collect())
    assert got == [1, 2, 3]


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """The watermarked stream-stream interval join produces exactly the
    batch join's row set over the same drained source."""
    from bigdata_meteo_datalake_spark.streaming.windows import (
        stream_stream_interval_join,
    )

    events = read_table(spark, SF0001, "events").select("ts", "user_id")
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    events.coalesce(1).write.mode("overwrite").parquet(lsrc)
    events.coalesce(1).write.mode("overwrite").parquet(rsrc)

    ls = stream_events(spark, lsrc, events.schema)
    rs = stream_events(spark, rsrc, events.schema)
    joined = stream_stream_interval_join(
        ls, rs, "user_id", watermark="2 hours", interval="30 minutes"
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join_t")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("ss_join_t").toPandas()

    l, r = events.alias("l"), events.alias("r")
    want = (
        l.join(
            r,
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("r.ts") >= F.col("l.ts"))
            & (F.col("r.ts") <= F.col("l.ts") + F.expr("INTERVAL 30 minutes")),
        )
        .select(F.col("l.user_id").alias("user_id"), F.col("l.ts").alias("l_ts"), F.col("r.ts").alias("r_ts"))
        .toPandas()
    )
    key = ["user_id", "l_ts", "r_ts"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_stream_gapfill_locf_matches_batch(spark, tmp_path):
    """The stateful streaming gap-fill must equal the batch LOCF twin on
    each key's observed range, with gaps spanning micro-batch boundaries
    carried through state."""
    import datetime as dt

    from pyspark.sql import Window
    from bigdata_meteo_datalake_spark.streaming.windows import stream_gapfill_locf

    schema = "event_type string, bucket timestamp, obs_avg double"

    def mk(rows):
        return spark.createDataFrame(
            [(k, dt.datetime.fromisoformat(ts), v) for (k, ts, v) in rows], schema
        )

    src = str(tmp_path / "gap_src")
    # batch 1: click has a 2h hole (10->13), view ends at 11
    mk(
        [
            ("click", "2024-03-01 10:00:00", 1.0),
            ("click", "2024-03-01 13:00:00", 4.0),
            ("view", "2024-03-01 11:00:00", 7.0),
        ]
    ).coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "gap_out")

    def run_once():
        # foreachBatch sink: supports checkpoint recovery (memory doesn't),
        # so the (last_slot, last_value) state survives across the two runs
        stream = spark.readStream.schema(mk([]).schema).parquet(src)
        filled = stream_gapfill_locf(stream, step="1 hour")
        q = (
            filled.writeStream.outputMode("update")
            .foreachBatch(lambda df, _id: df.write.mode("append").parquet(out))
            .option("checkpointLocation", str(tmp_path / "gap_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    # batch 2: the 14h click row and a LATE-ARRIVING view hole 11->15 that
    # must be filled from state carried across the restart
    mk(
        [
            ("click", "2024-03-01 14:00:00", 5.0),
            ("view", "2024-03-01 15:00:00", 9.0),
        ]
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()

    got = (
        spark.read.parquet(out)
        .toPandas()
        .sort_values(["event_type", "bucket"])
        .reset_index(drop=True)
    )

    # batch twin: dense spine per key between its first and last observation
    all_obs = spark.read.parquet(src)
    spine = (
        all_obs.groupBy("event_type")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("bucket"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = (
        spine.join(all_obs, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            "bucket",
            "obs_avg",
            F.last("obs_avg", ignorenulls=True).over(w).alias("filled_avg"),
            F.col("obs_avg").isNull().alias("is_gap"),
        )
        .toPandas()
        .sort_values(["event_type", "bucket"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_session_expiry_timer_closes_idle_sessions(spark, tmp_path):
    """transformWithStateInPandas with event-time timers: a session closes
    (emits exactly one summary) when the watermark passes last_event + gap;
    a key that keeps receiving events stays open across micro-batches.

    Availability-gated: the TWS state protocol speaks protobuf between the
    JVM and the Python runner; this container ships pyspark without
    google.protobuf, so the operator can only execute where protobuf is
    installed (any standard Spark deployment). The operator itself is
    plain public-API code — this test runs it end-to-end when it can.

    Round-8 determination: the gate cannot be lifted in this sandbox —
    package installation is disallowed here, and the protocol consumes
    pyspark's GENERATED pb2 modules, which need the real google.protobuf
    runtime (descriptor pool, message factory); a hand-written shim of
    that runtime is not a faithful test of the operator. The gate stays,
    loudly, until the environment ships protobuf."""
    pytest.importorskip("google.protobuf")
    import datetime as dt

    from bigdata_meteo_datalake_spark.streaming.windows import (
        session_expiry_summaries,
    )

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"

    def mk(rows):
        return spark.createDataFrame(
            [(e, dt.datetime.fromisoformat(ts), u, "view", v) for (e, ts, u, v) in rows],
            schema,
        )

    src = str(tmp_path / "sess_src")
    out = str(tmp_path / "sess_out")

    def run_once():
        stream = spark.readStream.schema(mk([]).schema).parquet(src)
        summaries = session_expiry_summaries(stream, gap="30 minutes")
        q = (
            summaries.writeStream.outputMode("append")
            .foreachBatch(lambda df, _id: df.write.mode("append").parquet(out))
            .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch 1: user 1 (2 events to 10:10), user 2 (1 event at 10:05)
    mk(
        [
            (1, "2024-03-01 10:00:00", 1, 1.0),
            (2, "2024-03-01 10:10:00", 1, 2.0),
            (3, "2024-03-01 10:05:00", 2, 5.0),
        ]
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()

    # batch 2: user 1 keeps going at 12:00 -> watermark jumps to 12:00,
    # expiring BOTH 10:xx timers; user 1's new event re-opens a session
    # (its first session closes too — gap-based sessions, same as
    # session_window semantics), user 2 stays closed
    mk([(4, "2024-03-01 12:00:00", 1, 3.0)]).coalesce(1).write.mode("append").parquet(src)
    run_once()
    got = {
        (r["user_id"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    }
    assert got.get(2) == (1, 5.0)  # idle session closed by the timer
    assert got.get(1) == (2, 3.0)  # first session (1.0+2.0) closed... see below

    # exact per-session check: collect all emitted rows per user
    rows = sorted(
        (r["user_id"], r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    )
    # user 1's FIRST session (events 1+2, sum 3.0) closed when the
    # watermark passed 10:40; its 12:00 session is still open (no later
    # watermark advance), so exactly two summaries exist
    assert rows == [(1, 2, 3.0), (2, 1, 5.0)]


def test_stream_session_window_matches_batch(spark, event_source, tmp_path):
    """Streaming session windows (merging state) reproduce the batch
    operator: the whole fixture arrives as one availableNow micro-batch,
    so every session is final when emitted."""
    from bigdata_meteo_datalake_spark.streaming.windows import (
        session_counts,
        stream_session_counts,
    )

    src, events = event_source
    stream = stream_events(spark, src, events.schema)
    agg = stream_session_counts(stream, gap="30 minutes", watermark="1 hour")
    run_available_now(
        agg, "stream_sessions", str(tmp_path / "ckpt_sess"), output_mode="complete"
    )
    cols = ["session_start", "session_end", "user_id", "n_events"]
    got = (
        spark.table("stream_sessions")
        .select(*cols)
        .toPandas()
        .sort_values(cols)
        .reset_index(drop=True)
    )
    want = (
        session_counts(events, "30 minutes")
        .select(*cols)
        .toPandas()
        .sort_values(cols)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_stream_interpolate_linear_matches_batch(spark, tmp_path):
    """The stateful streaming interpolator must equal the batch
    neighbor-window formula on every slot both can see, including a hole
    spanning the micro-batch/restart boundary (right neighbor arrives one
    run later)."""
    import datetime as dt

    from pyspark.sql import Window
    from bigdata_meteo_datalake_spark.streaming.windows import (
        stream_interpolate_linear,
    )

    schema = "event_type string, bucket timestamp, obs_avg double"

    def mk(rows):
        return spark.createDataFrame(
            [(k, dt.datetime.fromisoformat(ts), v) for (k, ts, v) in rows], schema
        )

    src = str(tmp_path / "interp_src")
    mk(
        [
            ("click", "2024-03-01 10:00:00", 1.0),
            ("click", "2024-03-01 13:00:00", 4.0),  # 2-slot hole 11,12
            ("view", "2024-03-01 11:00:00", 7.0),
        ]
    ).coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "interp_out")

    def run_once():
        stream = spark.readStream.schema(mk([]).schema).parquet(src)
        filled = stream_interpolate_linear(stream, step="1 hour")
        q = (
            filled.writeStream.outputMode("update")
            .foreachBatch(lambda df, _id: df.write.mode("append").parquet(out))
            .option("checkpointLocation", str(tmp_path / "interp_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    # the view hole 11->15 closes only now, from state across the restart
    mk(
        [
            ("click", "2024-03-01 14:00:00", 5.0),
            ("view", "2024-03-01 15:00:00", 9.0),
        ]
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()

    got = (
        spark.read.parquet(out)
        .toPandas()
        .sort_values(["event_type", "bucket"])
        .reset_index(drop=True)
    )

    # batch twin: the ts_interpolate_linear neighbor-window formula over a
    # dense spine per key (every interior slot has both neighbors, so the
    # coverage equals exactly what the stream emitted)
    all_obs = spark.read.parquet(src)
    spine = (
        all_obs.groupBy("event_type")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias(
                "bucket"
            ),
        )
    )
    w_ord = Window.partitionBy("event_type").orderBy("bucket")
    w_past = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_future = w_ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    filled = spine.join(all_obs, ["event_type", "bucket"], "left").withColumn(
        "idx", F.row_number().over(w_ord)
    )
    obs_idx = F.when(F.col("obs_avg").isNotNull(), F.col("idx"))
    nb = filled.select(
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
    want = (
        nb.select(
            "event_type",
            "bucket",
            "obs_avg",
            F.when(F.col("obs_avg").isNotNull(), F.col("obs_avg"))
            .otherwise(F.floor(interp * 10000 + F.lit(0.5)) / 10000)
            .alias("interp_avg"),
            F.col("obs_avg").isNull().alias("is_gap"),
        )
        .toPandas()
        .sort_values(["event_type", "bucket"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_stream_ewma_matches_batch(spark, tmp_path):
    """The stateful streaming EWMA must equal the batch 12-lag operator
    bit-for-bit on every emitted row, with lag history carried across
    micro-batches and a checkpoint restart."""
    from pyspark.sql import functions as F

    from bigdata_meteo_datalake_spark.functions.numeric import rounded_avg
    from bigdata_meteo_datalake_spark.queries import queries
    from bigdata_meteo_datalake_spark.streaming.windows import stream_ewma_truncated

    # the same hourly pre-aggregate the batch query starts from
    hourly = (
        read_table(spark, SF0001, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(rounded_avg("value").alias("obs_avg"))
    )
    split_ts = hourly.agg(
        F.percentile_approx("bucket", 0.5).alias("m")
    ).collect()[0]["m"]

    src = str(tmp_path / "ewma_src")
    out = str(tmp_path / "ewma_out")
    hourly.where(F.col("bucket") <= F.lit(split_ts)).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    def run_once():
        stream = spark.readStream.schema(hourly.schema).parquet(src)
        q = (
            stream_ewma_truncated(stream)
            .writeStream.outputMode("update")
            .foreachBatch(lambda df, _id: df.write.mode("append").parquet(out))
            .option("checkpointLocation", str(tmp_path / "ewma_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    hourly.where(F.col("bucket") > F.lit(split_ts)).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()

    got = (
        spark.read.parquet(out)
        .toPandas()
        .sort_values(["event_type", "bucket"])
        .reset_index(drop=True)
    )
    want = (
        queries()["ts_ewma_12h"](spark, SF0001)
        .toPandas()
        .sort_values(["event_type", "bucket"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got[["event_type", "bucket", "obs_avg", "ewma_12h"]],
        want[["event_type", "bucket", "obs_avg", "ewma_12h"]],
        check_dtype=False,
        check_exact=True,  # IEEE-identical, not approximately equal
    )


def test_stream_ewma_null_obs_matches_batch(spark, tmp_path):
    """A NULL hourly obs_avg (NaN in the pandas kernel) must mirror the
    batch semantics — contribute +0.0 to the weighted sum and drop its
    coefficient from the normalizer — including when the NULL is carried
    in state across a micro-batch boundary (round-3 advice)."""
    import datetime

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bigdata_meteo_datalake_spark.functions.numeric import round_half_up
    from bigdata_meteo_datalake_spark.queries.ext_corpus import _EWMA_COEF
    from bigdata_meteo_datalake_spark.streaming.windows import stream_ewma_truncated

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    series = [1.0, None, 2.0, None, None, 4.0, 0.5, None]
    rows = [
        ("click", t0 + datetime.timedelta(hours=i), v)
        for i, v in enumerate(series)
    ]
    hourly = spark.createDataFrame(
        rows, "event_type string, bucket timestamp, obs_avg double"
    )

    # the batch 12-lag expression from ts_ewma_12h, applied to the same series
    w = Window.partitionBy("event_type").orderBy("bucket")
    numer, denom = F.lit(0.0), F.lit(0.0)
    for j, c in enumerate(_EWMA_COEF):
        lag = F.col("obs_avg") if j == 0 else F.lag("obs_avg", j).over(w)
        numer = numer + F.lit(c) * F.coalesce(lag, F.lit(0.0))
        denom = denom + F.when(lag.isNotNull(), F.lit(c)).otherwise(F.lit(0.0))
    want = (
        hourly.select(
            "event_type", "bucket", "obs_avg",
            round_half_up(numer / denom, 4).alias("ewma_12h"),
        )
        .toPandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )

    # stream the series in two micro-batches split right after a NULL, so
    # the NaN sits in carried state when the second batch arrives
    src = str(tmp_path / "ewma_null_src")
    out = str(tmp_path / "ewma_null_out")
    split = t0 + datetime.timedelta(hours=3)  # rows 0-3 (ends on a NULL)
    hourly.where(F.col("bucket") <= F.lit(split)).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    def run_once():
        stream = spark.readStream.schema(hourly.schema).parquet(src)
        q = (
            stream_ewma_truncated(stream)
            .writeStream.outputMode("update")
            .foreachBatch(lambda df, _id: df.write.mode("append").parquet(out))
            .option("checkpointLocation", str(tmp_path / "ewma_null_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    hourly.where(F.col("bucket") > F.lit(split)).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()

    got = (
        spark.read.parquet(out)
        .toPandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got[["event_type", "bucket", "obs_avg", "ewma_12h"]],
        want[["event_type", "bucket", "obs_avg", "ewma_12h"]],
        check_dtype=False,
        check_exact=True,
    )


def test_stream_cdc_apply_matches_batch(spark, tmp_path):
    """The stateful CDC apply, fed the synthesized I/U/D changelog as
    three separate micro-batches (inserts, then updates, then deletes —
    maxFilesPerTrigger=1), converges to exactly the batch
    cdc_apply_changelog semantics: highest seq wins, delete beats its
    earlier update, lower-seq replays are no-ops."""
    from bigdata_meteo_datalake_spark.sources.lake import read_table
    from bigdata_meteo_datalake_spark.streaming.windows import stream_cdc_apply

    o = read_table(spark, SF0001, "orders").select("o_orderkey", "o_totalprice")
    src = tmp_path / "cdc_src"
    src.mkdir()
    ins = o.select(
        "o_orderkey", F.lit(1).cast("long").alias("seq"),
        F.lit("I").alias("op"), "o_totalprice",
    )
    upd = o.where(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey", F.lit(2).cast("long").alias("seq"),
        F.lit("U").alias("op"),
        (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
    )
    dele = o.where(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey", F.lit(3).cast("long").alias("seq"),
        F.lit("D").alias("op"), "o_totalprice",
    )
    for i, part in enumerate((ins, upd, dele)):
        part.coalesce(1).write.mode("overwrite").parquet(str(src / f"b{i}"))

    schema = ins.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "b*"))
    )
    out = stream_cdc_apply(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("cdc_state")
        .option("checkpointLocation", str(tmp_path / "cdc_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rows = spark.table("cdc_state").collect()
    final = {}
    for r in rows:
        if r.o_orderkey not in final or r.seq > final[r.o_orderkey].seq:
            final[r.o_orderkey] = r
    base = {r.o_orderkey: r.o_totalprice for r in o.collect()}
    assert len(final) == len(base)
    for k, price in base.items():
        f = final[k]
        if k % 100 == 0:
            assert f.is_deleted and f.op == "D"
        elif k % 10 == 0:
            assert not f.is_deleted and f.op == "U"
            assert abs(f.o_totalprice - (price + 1000.0)) < 1e-9
        else:
            assert not f.is_deleted and f.op == "I"
            assert abs(f.o_totalprice - price) < 1e-9


def test_stream_hll_matches_batch_registers(spark, tmp_path):
    """Streaming HLL state must equal the batch query's registers and
    estimate bit-for-bit after draining the source across micro-batches."""
    from bigdata_meteo_datalake_spark.queries import REGISTRY, queries
    from bigdata_meteo_datalake_spark.streaming.windows import stream_hll_registers

    queries()
    src = str(tmp_path / "hll_src")
    events = read_table(spark, SF0001, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    # two files -> two micro-batches, so state must fold across batches
    events.where(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    events.where(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = stream_events(spark, src, events.schema)
    run_available_now(
        stream_hll_registers(stream), "stream_hll", str(tmp_path / "hll_ckpt")
    )
    rows = spark.table("stream_hll").toPandas()
    # update mode emits one row per (key, batch); the final state is the
    # row with the largest n_seen per key
    final = rows.loc[rows.groupby("event_type")["n_seen"].idxmax()]
    got = {
        r.event_type: (r.n_seen, list(r.regs), r.est_distinct_users)
        for r in final.itertuples()
    }
    want_est = {
        r.event_type: r.est_distinct_users
        for r in REGISTRY["hll_distinct_users"].fn(spark, SF0001).collect()
    }
    ev = events.toPandas()
    assert set(got) == set(want_est)
    for et, (n_seen, regs, est) in got.items():
        assert n_seen == int((ev.event_type == et).sum())
        assert est == want_est[et], et
        assert len(regs) == 32 and all(0 <= m <= 56 for m in regs)


def test_stream_priority_sample_order_independent(spark, tmp_path):
    """The streamed priority sample equals a single-pass Python reference
    over the same events, regardless of micro-batch split — top-(k+1) of
    a set is order-independent."""
    import hashlib

    from bigdata_meteo_datalake_spark.streaming.windows import stream_priority_sample

    src = str(tmp_path / "prio_src")
    events = read_table(spark, SF0001, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    events.where(F.col("event_id") % 3 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    events.where(F.col("event_id") % 3 != 0).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = stream_events(spark, src, events.schema)
    run_available_now(
        stream_priority_sample(stream), "stream_prio", str(tmp_path / "prio_ckpt")
    )
    rows = spark.table("stream_prio").toPandas()
    final = rows.loc[rows.groupby("event_type")["n_seen"].idxmax()]

    ev = events.toPandas()
    for r in final.itertuples():
        sub = ev[ev.event_type == r.event_type]
        entries = []
        for eid, val in zip(sub.event_id, sub.value):
            w = int(val * 100 + 0.5) if val == val else 0
            h = int(hashlib.md5(str(int(eid)).encode()).hexdigest()[:15], 16)
            entries.append((float(w) * float(1 << 60) / (h + 1), int(eid), w))
        entries.sort(key=lambda e: (-e[0], e[1]))
        assert r.n_seen == len(sub)
        if len(entries) > 16:
            tau = entries[16][0]
            est = sum(int(max(float(w), tau) + 0.5) for _q, _i, w in entries[:16]) / 100.0
        else:
            tau = 0.0
            est = sum(w for _q, _i, w in entries) / 100.0
        assert r.tau == tau and r.est_total == est


def test_stream_ohlc_matches_batch_query(spark, event_source, tmp_path):
    """The streaming OHLC twin drained with availableNow reproduces the
    registered batch query ohlc_hourly_bars row for row (open/close
    tie-breaks included)."""
    from bigdata_meteo_datalake_spark.queries import queries
    from bigdata_meteo_datalake_spark.streaming.windows import stream_ohlc_bars

    src, events = event_source
    stream = stream_events(spark, src, events.schema)
    agg = stream_ohlc_bars(stream, duration="1 hour", watermark="1 hour")
    run_available_now(agg, "stream_ohlc", str(tmp_path / "ckpt_ohlc"))
    cols = ["hr", "event_type", "open_cents", "high_cents", "low_cents",
            "close_cents", "n_events", "volume_cents"]
    got = (
        spark.table("stream_ohlc")
        .select(*cols)
        .toPandas()
        .sort_values(["hr", "event_type"])
        .reset_index(drop=True)
    )
    want = (
        queries()["ohlc_hourly_bars"](spark, SF0001)
        .select(F.col("hr").alias("hr"), *cols[1:])
        .toPandas()
        .sort_values(["hr", "event_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_streaming_crawl_schedule_counts_across_batches(spark, tmp_path):
    """The politeness scheduler's streaming twin: per-domain sequence
    numbers CONTINUE across micro-batches (the state-continuity
    property the batch window can't show), rounds stay dense under the
    rate, and the assignment matches a hand-replayed arrival order."""
    import pandas as pd

    from bigdata_meteo_datalake_spark.streaming.windows import (
        streaming_crawl_schedule,
    )

    src = tmp_path / "frontier"
    src.mkdir()
    # two arrival waves for two domains; within a wave the kernel
    # orders by url, so the expected replay is deterministic
    wave1 = pd.DataFrame({
        "domain": ["a.example"] * 5 + ["b.example"] * 2,
        "url": [f"https://a.example/p{i}" for i in range(5)]
        + [f"https://b.example/p{i}" for i in range(2)],
    })
    wave2 = pd.DataFrame({
        "domain": ["a.example"] * 3 + ["b.example"] * 1,
        "url": [f"https://a.example/q{i}" for i in range(3)]
        + ["https://b.example/q0"],
    })
    wave1.to_parquet(src / "wave1.parquet")
    wave2.to_parquet(src / "wave2.parquet")
    # FileStreamSource orders by modification time: pin mtimes so the
    # two waves can never tie within the filesystem's resolution
    import os

    os.utime(src / "wave1.parquet", (1_700_000_000, 1_700_000_000))
    os.utime(src / "wave2.parquet", (1_700_000_600, 1_700_000_600))

    stream = (
        spark.readStream.schema("domain string, url string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        streaming_crawl_schedule(stream, rate=4)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("crawl_sched")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("crawl_sched").collect()
    assert len(rows) == 11
    got = {r["url"]: (r["seq"], r["fetch_round"], r["slot_in_round"])
           for r in rows}

    # hand replay: waves arrive in file order, urls sorted within a
    # (wave, domain) group, counters CONTINUE across waves
    seq = {}
    want = {}
    for wave in (wave1, wave2):
        for dom in sorted(set(wave["domain"])):
            for url in sorted(wave[wave["domain"] == dom]["url"]):
                n = seq.get(dom, 0)
                want[url] = (n, n // 4, n % 4)
                seq[dom] = n + 1
    assert got == want
    # the continuity property itself: domain a's second wave starts at
    # seq 5 (round 1), not back at 0
    assert got["https://a.example/q0"] == (5, 1, 1)


def test_streaming_dedup_admission_matches_batch_screen(spark, tmp_path):
    """The incremental-dedup streaming twin (round-11): feeding the
    existing corpus as micro-batch 1 and the daily increment as
    micro-batch 2 through the stateful (kind, h) seen-set must produce
    EXACTLY the admissions of the batch screen dedup_incremental_batch
    on the same fixture — is_exact_dup, n_shared_tiles, and
    is_near_dup per incoming document. Also pins the strictly-earlier-
    micro-batch semantics: fingerprints shared only WITHIN the
    increment do not flag each other (the batch screen never compares
    new-vs-new)."""
    import os

    from pyspark.sql import functions as F

    from bigdata_meteo_datalake_spark.queries import queries
    from bigdata_meteo_datalake_spark.streaming.windows import (
        document_fingerprints,
        streaming_dedup_admission,
    )

    docs = read_table(spark, SF0001, "documents").select("doc_id", "text")
    fps = document_fingerprints(docs)
    src = tmp_path / "fps"
    src.mkdir()
    # wave 1 = the accumulated corpus, wave 2 = today's increment
    fps.where(F.col("doc_id") % 5 != 0).toPandas().to_parquet(
        src / "wave1.parquet")
    fps.where(F.col("doc_id") % 5 == 0).toPandas().to_parquet(
        src / "wave2.parquet")
    os.utime(src / "wave1.parquet", (1_700_000_000, 1_700_000_000))
    os.utime(src / "wave2.parquet", (1_700_000_600, 1_700_000_600))

    stream = (
        spark.readStream.schema("doc_id long, kind string, h string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        streaming_dedup_admission(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_adm")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("dedup_adm")
    got = {
        r["doc_id"]: (bool(r["is_exact_dup"]), int(r["n_shared_tiles"]),
                      bool(r["is_near_dup"]))
        for r in (
            out.where(F.col("doc_id") % 5 == 0)
            .groupBy("doc_id")
            .agg(
                F.max(F.when((F.col("kind") == "md5") & F.col("seen_before"),
                             True).otherwise(False)).alias("is_exact_dup"),
                F.sum(F.when((F.col("kind") == "tile") & F.col("seen_before"),
                             1).otherwise(0)).alias("n_shared_tiles"),
            )
            .withColumn("is_near_dup", F.col("n_shared_tiles") >= 1)
            .collect()
        )
    }
    want = {
        r["doc_id"]: (bool(r["is_exact_dup"]), int(r["n_shared_tiles"]),
                      bool(r["is_near_dup"]))
        for r in queries()["dedup_incremental_batch"](spark, SF0001).collect()
    }
    assert got == want
    assert len(want) > 0
    # the corpus wave itself read an empty state: nothing in wave 1 is
    # flagged (its own internal duplicates arrived in the same batch)
    assert (
        out.where((F.col("doc_id") % 5 != 0) & F.col("seen_before")).count()
        == 0
    )
