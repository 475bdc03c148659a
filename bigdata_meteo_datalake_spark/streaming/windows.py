"""Structured-Streaming windowed aggregation over event tables
(SURVEY.md section 2.5 extension — the reference has no true streaming
engine; its daily partition reprocessing maps to watermark + windows here).

Every streaming aggregation has a batch twin built from the SAME column
expressions, so correctness is checked two ways: the batch twin against a
DuckDB oracle (queries/ext_streaming.py), and the streaming output against
the batch twin (tests/test_streaming.py, file source + availableNow).

Scale notes: windowed streaming aggs keep state per (window, key) in the
state store; the watermark bounds state size by evicting windows older
than max-event-time - delay. `applyInPandasWithState` is the custom-
stateful escape hatch (arbitrary per-key state, Arrow-batched).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WATERMARK = "1 hour"


def tumbling_counts(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Tumbling-window counts+sums per event_type. Works on batch and
    streaming frames alike (same expressions)."""
    return (
        events.groupBy(F.window("ts", duration).alias("win"), "event_type")
        # decimal accumulator: exact, partition-order-insensitive sums
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)")).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame, duration: str = "2 hours", slide: str = "1 hour"
) -> DataFrame:
    """Sliding-window counts: each event lands in duration/slide windows."""
    return (
        events.groupBy(F.window("ts", duration, slide).alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "n_events")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user: a session closes after `gap` of silence.
    Batch-mode session_window matches the streaming operator's semantics."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def stream_events(spark, source_dir: str, schema) -> DataFrame:
    """File-source stream of event rows (one file per micro-batch drop)."""
    return spark.readStream.schema(schema).parquet(source_dir)


def stream_tumbling_counts(
    stream: DataFrame,
    *,
    duration: str = "1 hour",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Watermarked streaming twin of :func:`tumbling_counts`: late rows
    beyond `watermark` are dropped and closed windows' state is evicted."""
    return tumbling_counts(stream.withWatermark("ts", watermark), duration)


def stream_session_counts(
    stream: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Watermarked streaming twin of :func:`session_counts`: session
    windows MERGE as events arrive (unlike fixed windows, a session's
    bounds move), so state per (user, open session) is held until the
    watermark passes the session end + gap and the session can no longer
    grow."""
    return session_counts(stream.withWatermark("ts", watermark), gap)


def run_available_now(
    agg: DataFrame, query_name: str, checkpoint: str, *, output_mode: str = "update"
):
    """Drain everything currently in the source and stop (the reference's
    daily-batch trigger O1, expressed as trigger(availableNow=True))."""
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def running_user_totals(events: DataFrame, timeout: str = "NoTimeout") -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: running
    (n_events, sum_value) per user across micro-batches — the arbitrary-
    state path for operators windows can't express."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    out_schema = "user_id long, n_events long, sum_value double"
    state_schema = "n long, s double"

    def update(key, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", timeout
    )


def stream_static_enrich(stream: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """Stream-static join: each micro-batch joins against the (re-read)
    static dimension — the streaming twin of the marts' enrich joins. The
    dim side broadcasts per micro-batch; no stream state is kept."""
    return stream.join(F.broadcast(dim), key, "left")


def stream_dedup(
    stream: DataFrame,
    keys: list[str],
    *,
    watermark: str = DEFAULT_WATERMARK,
    within_watermark: bool = True,
) -> DataFrame:
    """Streaming exact dedup — the streaming twin of dedup_exact. With
    `within_watermark` (the 100 TB form) the state store only remembers
    keys for the watermark horizon: duplicates arriving within the horizon
    are dropped, state is evicted after it, so state size is bounded by
    arrival rate x horizon instead of growing with total distinct keys
    forever (plain dropDuplicates keeps every key seen, which OOMs an
    unbounded stream)."""
    s = stream.withWatermark("ts", watermark)
    if within_watermark:
        return s.dropDuplicatesWithinWatermark(keys)
    return s.dropDuplicates(keys)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    watermark: str = DEFAULT_WATERMARK,
    interval: str = "1 hour",
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Stream-stream inner join on `key` with a time-range condition:
    right rows match left rows at most `interval` after them. BOTH sides
    are watermarked and the range bound lets the state store evict rows
    once no future match is possible — the unbounded-state guard every
    production stream-stream join needs. Returns the joined frame with the
    two timestamps as l_ts / r_ts."""
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    lts, rts = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rts >= lts)
        & (rts <= lts + F.expr(f"INTERVAL {interval}"))
    )
    return l.join(r, cond, "inner").select(
        F.col(f"l.{key}").alias(key),
        lts.alias("l_ts"),
        rts.alias("r_ts"),
    )


def stream_gapfill_locf(obs: DataFrame, step: str = "1 hour") -> DataFrame:
    """Streaming twin of the batch gap-fill (queries/ext_timeseries.py
    ts_gapfill_locf): consumes PRE-AGGREGATED per-slot observations — at
    most one row per (event_type, bucket), buckets arriving in order per
    key — and emits one row per slot, inserting the missing slots between
    consecutive observations with the last value carried forward.

    Custom state via applyInPandasWithState: per key, (last_slot,
    last_value) — constant-size state regardless of stream length, which
    is the property that lets this run forever at 100 TB (the batch form's
    dense-spine join needs the whole horizon). Hours before a key's first
    observation are not emitted (LOCF has nothing to carry), and slots
    after its last observation wait for the next batch — a streaming
    operator cannot fill toward a future it has not seen.

    Slot arithmetic is pure wall-clock pandas Timedelta on the naive
    timestamps Spark hands the UDF, so session-timezone conversion applies
    identically on input and output.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    step_td = pd.Timedelta(step)
    out_schema = (
        "event_type string, bucket timestamp, obs_avg double, "
        "filled_avg double, is_gap boolean"
    )
    state_schema = "last_slot long, last_value double"
    _EPOCH = pd.Timestamp(0)

    def update(key, pdfs, state: GroupState):
        if state.exists:
            last_slot_ns, last_val = state.get
            last_bucket = _EPOCH + pd.Timedelta(last_slot_ns, unit="ns")
        else:
            last_bucket, last_val = None, None
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("bucket")
        out_bucket, out_obs, out_filled, out_gap = [], [], [], []
        for bucket, val in zip(rows["bucket"], rows["obs_avg"]):
            if last_bucket is not None:
                gap = last_bucket + step_td
                while gap < bucket:
                    out_bucket.append(gap)
                    out_obs.append(None)
                    out_filled.append(last_val)
                    out_gap.append(True)
                    gap += step_td
            out_bucket.append(bucket)
            out_obs.append(val)
            out_filled.append(val)
            out_gap.append(False)
            last_bucket, last_val = bucket, val
        state.update(((last_bucket - _EPOCH).value, last_val))
        yield pd.DataFrame(
            {
                "event_type": key[0],
                "bucket": out_bucket,
                "obs_avg": out_obs,
                "filled_avg": out_filled,
                "is_gap": out_gap,
            }
        )

    return obs.groupBy("event_type").applyInPandasWithState(
        update, out_schema, state_schema, "update", "NoTimeout"
    )


def stream_ewma_truncated(
    obs: DataFrame, *, decay: float = 0.8, lags: int = 12
) -> DataFrame:
    """Streaming twin of the batch truncated EWMA (queries/ext_corpus.py
    ts_ewma_12h): consumes pre-aggregated (event_type, bucket, obs_avg)
    rows — at most one per (key, bucket), buckets arriving in order per
    key — and emits each bucket's 12-lag weighted average as it arrives.

    State per key is the last lags-1 observed values in bucket order: a
    CONSTANT-size list regardless of stream length, which is what lets
    this run forever (the batch form's window needs the whole series
    resident per partition). The weighted sum replays the batch
    expression's exact IEEE order — left-assoc over the same decay**j
    Python-float coefficients, missing lags contributing the same +0.0
    terms — so emitted rows equal the batch operator bit-for-bit,
    including across micro-batch and checkpoint-restart boundaries
    (tests/test_streaming.py)."""
    import math

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    coefs = [decay**j for j in range(lags)]
    out_schema = (
        "event_type string, bucket timestamp, obs_avg double, ewma_12h double"
    )
    state_schema = "vals array<double>"

    def update(key, pdfs, state: GroupState):
        hist = list(state.get[0]) if state.exists else []  # most-recent first
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("bucket")
        out_b, out_v, out_e = [], [], []
        for bucket, val in zip(rows["bucket"], rows["obs_avg"]):
            # a NULL hourly obs_avg arrives as NaN: the batch expression
            # coalesces the term to +0.0 and drops its coefficient from the
            # normalizer, so a NaN lag must behave exactly like a missing
            # one here — it is carried in hist (it occupies a bucket slot)
            # but never enters the weighted sum.
            vals = [float(val)] + hist
            numer = 0.0
            denom = 0.0
            for j, c in enumerate(coefs):
                if j < len(vals) and not math.isnan(vals[j]):
                    numer = numer + c * vals[j]
                    denom = denom + c
                else:
                    numer = numer + c * 0.0
                    denom = denom + 0.0
            out_b.append(bucket)
            out_v.append(None if math.isnan(float(val)) else val)
            ewma = numer / denom  # NaN when every lag in the horizon is NULL,
            out_e.append(         # matching the batch 0.0/0.0 division
                ewma if math.isnan(ewma)
                else math.floor(ewma * 10000 + 0.5) / 10000
            )
            hist = vals[: lags - 1]
        state.update((hist,))
        yield pd.DataFrame(
            {
                "event_type": key[0],
                "bucket": out_b,
                "obs_avg": out_v,
                "ewma_12h": out_e,
            }
        )

    return obs.groupBy("event_type").applyInPandasWithState(
        update, out_schema, state_schema, "update", "NoTimeout"
    )


def stream_interpolate_linear(obs: DataFrame, step: str = "1 hour") -> DataFrame:
    """Streaming twin of the batch linear interpolation (ext_timeseries
    ts_interpolate_linear): unlike LOCF, a gap needs BOTH neighbors, so a
    hole is emitted only when its right neighbor arrives — each new
    observation finalizes every slot since the previous one (value =
    pv + (nv - pv) * i/n, the identical IEEE sequence the batch operator
    runs, floor-rounded to 4). State per key is the same constant-size
    (last_slot, last_value) pair as the gap-fill; slots before a key's
    first observation are never emitted (no left neighbor), and trailing
    slots wait for the observation that closes them.
    """
    import math

    import pandas as pd

    step_td = pd.Timedelta(step)
    out_schema = (
        "event_type string, bucket timestamp, obs_avg double, "
        "interp_avg double, is_gap boolean"
    )
    state_schema = "last_slot long, last_value double"
    _EPOCH = pd.Timestamp(0)

    def update(key, pdfs, state):
        if state.exists:
            last_slot_ns, last_val = state.get
            last_bucket = _EPOCH + pd.Timedelta(last_slot_ns, unit="ns")
        else:
            last_bucket, last_val = None, None
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("bucket")
        out_bucket, out_obs, out_interp, out_gap = [], [], [], []
        for bucket, val in zip(rows["bucket"], rows["obs_avg"]):
            if last_bucket is not None:
                n = int(round((bucket - last_bucket) / step_td))
                for i in range(1, n):
                    frac = float(i) / float(n)
                    v = last_val + (val - last_val) * frac
                    out_bucket.append(last_bucket + i * step_td)
                    out_obs.append(None)
                    out_interp.append(math.floor(v * 10000 + 0.5) / 10000)
                    out_gap.append(True)
            out_bucket.append(bucket)
            out_obs.append(val)
            out_interp.append(val)
            out_gap.append(False)
            last_bucket, last_val = bucket, val
        state.update(((last_bucket - _EPOCH).value, last_val))
        yield pd.DataFrame(
            {
                "event_type": key[0],
                "bucket": out_bucket,
                "obs_avg": out_obs,
                "interp_avg": out_interp,
                "is_gap": out_gap,
            }
        )

    return obs.groupBy("event_type").applyInPandasWithState(
        update, out_schema, state_schema, "update", "NoTimeout"
    )


from pyspark.sql.streaming.stateful_processor import StatefulProcessor


class _SessionExpiryProcessor(StatefulProcessor):
    """StatefulProcessor for :func:`session_expiry_summaries` (defined
    module-level so it pickles to executors)."""

    def __init__(self, gap_ms: int):
        self.gap_ms = gap_ms

    def init(self, handle):
        self.handle = handle
        self.state = handle.getValueState(
            "sess", "n BIGINT, s DOUBLE, last_ms BIGINT"
        )

    def handleInputRows(self, key, rows, timerValues):
        got = self.state.get()
        n, s, last_ms = got if got is not None else (0, 0.0, 0)
        for pdf in rows:
            n += len(pdf)
            s += float(pdf["value"].sum())
            batch_max = int(pdf["ts"].max().value // 1_000_000)
            last_ms = max(last_ms, batch_max)
        self.state.update((n, s, last_ms))
        # one live timer per key: the session closes gap_ms after the
        # latest event unless a newer event pushes it out
        for t in self.handle.listTimers():
            self.handle.deleteTimer(t)
        self.handle.registerTimer(last_ms + self.gap_ms)
        return iter(())

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        import pandas as pd

        got = self.state.get()
        if got is None:
            return iter(())
        n, s, last_ms = got
        self.state.clear()
        return iter(
            (
                pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "n_events": [n],
                        "sum_value": [s],
                        "last_event_ms": [last_ms],
                    }
                ),
            )
        )

    def handleInitialState(self, key, initialState, timerValues):
        return iter(())

    def close(self):
        pass


def session_expiry_summaries(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Timer-based session closure via transformWithStateInPandas (the
    Spark 4 arbitrary-state API): per user, running (count, sum, last event
    time); an EVENT-TIME timer re-registered at last_event + gap fires when
    the watermark passes it, emitting the closed session's summary exactly
    once and clearing state. This is the semantics applyInPandasWithState
    cannot express cleanly — emission driven by event-time progress, not by
    the key's own next arrival. State per key is one 3-field tuple + one
    timer: bounded forever. Output: user_id, n_events, sum_value,
    last_event_ms.

    Deployment note: the transformWithState JVM<->Python state protocol
    requires google.protobuf, which this build container does not ship;
    on any standard Spark deployment (protobuf present) the operator runs
    as-is. tests/test_streaming.py gates its end-to-end test on protobuf
    availability."""
    import pandas as pd

    gap_ms = int(pd.Timedelta(gap).total_seconds() * 1000)
    proc = _SessionExpiryProcessor(gap_ms)
    out_schema = "user_id BIGINT, n_events BIGINT, sum_value DOUBLE, last_event_ms BIGINT"
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=out_schema,
            outputMode="append",
            timeMode="eventTime",
        )
    )


def stream_cdc_apply(log: DataFrame, timeout: str = "NoTimeout") -> DataFrame:
    """Streaming CDC apply — the stateful twin of the batch
    queries/ext_lakehouse.py:cdc_apply_changelog window: a changelog
    stream of (key, seq, op in I/U/D, payload) collapses to current state
    per key. State = (best_seq, op, payload) of the highest seq seen; a
    batch only advances it (late/replayed lower-seq ops are no-ops, which
    is exactly the idempotence CDC replay needs). Each update emits the
    key's current row with is_deleted reflecting whether the latest op is
    a delete — downstream sinks overwrite by key, so emitting tombstones
    (rather than suppressing deleted keys) is what lets the sink delete.

    Scale: per-key state is one (long, string, double) — constant bytes
    per key, no growth with stream length; the state-store shuffle on the
    key is the same exchange the batch window pays."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    out_schema = (
        "o_orderkey long, seq long, op string, o_totalprice double,"
        " is_deleted boolean"
    )
    state_schema = "seq long, op string, price double"

    def update(key, pdfs, state: GroupState):
        best = state.get if state.exists else None
        for pdf in pdfs:
            for seq, op, price in zip(
                pdf["seq"], pdf["op"], pdf["o_totalprice"]
            ):
                if best is None or int(seq) > int(best[0]):
                    best = (int(seq), str(op), float(price))
        state.update(best)
        yield pd.DataFrame(
            {
                "o_orderkey": [key[0]],
                "seq": [best[0]],
                "op": [best[1]],
                "o_totalprice": [best[2]],
                "is_deleted": [best[1] == "D"],
            }
        )

    return log.groupBy("o_orderkey").applyInPandasWithState(
        update, out_schema, state_schema, "update", timeout
    )


def stream_hll_registers(events: DataFrame, timeout: str = "NoTimeout") -> DataFrame:
    """Streaming HLL maintenance via applyInPandasWithState: per
    event_type, the 32-register distinct-user sketch is held as state and
    folded forward every micro-batch (elementwise max — associative +
    idempotent, so replays and out-of-order batches cannot corrupt it).
    Emits (event_type, n_seen, regs, est_distinct_users) per update;
    the registers and estimator are BIT-IDENTICAL to the batch
    ``hll_distinct_users`` query over the same rows (same md5 hash, same
    integer folds — pinned in tests/test_streaming.py).

    This is the streaming half of the sketch story: the batch side
    merges daily registers (hll_rolling_7d_users); this side maintains
    the same registers incrementally, so a landing zone can serve
    "distinct users so far" at O(32 ints) state per key."""
    import hashlib

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    from ..queries.ext_sketch import _HLL_M, _HLL_NUMER, _HLL_P, _HLL_RHO_MAX

    out_schema = (
        "event_type string, n_seen long, regs array<long>, est_distinct_users double"
    )
    state_schema = "n long, regs array<long>"

    def update(key, pdfs, state: GroupState):
        if state.exists:
            n, regs = state.get
            regs = list(regs)
        else:
            n, regs = 0, [0] * _HLL_M
        for pdf in pdfs:
            for uid in pdf["user_id"]:
                hv = int(hashlib.md5(str(int(uid)).encode()).hexdigest()[:15], 16)
                bucket = hv & (_HLL_M - 1)
                w = hv >> _HLL_P
                if w == 0:
                    rho = _HLL_RHO_MAX
                else:
                    rho = (60 - _HLL_P) - w.bit_length() + 1
                if rho > regs[bucket]:
                    regs[bucket] = rho
                n += 1
        state.update((n, regs))
        s = sum(1 << (_HLL_RHO_MAX - m) for m in regs)
        import math

        est = math.floor(_HLL_NUMER / float(s) * 100 + 0.5) / 100
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_seen": [n],
                "regs": [regs],
                "est_distinct_users": [est],
            }
        )

    return events.groupBy("event_type").applyInPandasWithState(
        update, out_schema, state_schema, "update", timeout
    )


def stream_priority_sample(
    events: DataFrame, k: int = 16, timeout: str = "NoTimeout"
) -> DataFrame:
    """Streaming priority sampling via applyInPandasWithState: per
    event_type, the top-(k+1) hash-priorities (q = w/u, Duffield-Lund-
    Thorup) are held as state and folded forward every micro-batch —
    priorities are fixed by the event hash, and top-(k+1) of a set is
    ORDER-INDEPENDENT, so the streamed sample and its subset-sum
    estimate are bit-identical to a batch pass over the same rows
    (pinned in tests/test_streaming.py). Emits (event_type, n_seen,
    est_total, the current tau) per update.

    This is the weighted-sample twin of stream_hll_registers: together
    they maintain the two mergeable summaries (distinct count, weighted
    sample) a landing zone serves without re-scanning history. State is
    O(k) per key."""
    import hashlib

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    out_schema = (
        "event_type string, n_seen long, est_total double, tau double"
    )
    state_schema = (
        "n long, qs array<double>, ks array<long>, ws array<long>"
    )

    def update(key, pdfs, state: GroupState):
        if state.exists:
            n, qs, kids, ws = state.get
            entries = list(zip(qs, kids, ws))
        else:
            n, entries = 0, []
        for pdf in pdfs:
            for eid, val in zip(pdf["event_id"], pdf["value"]):
                w = int(val * 100 + 0.5) if val == val else 0
                h = int(hashlib.md5(str(int(eid)).encode()).hexdigest()[:15], 16)
                q = float(w) * float(1 << 60) / (h + 1)
                entries.append((q, int(eid), w))
                n += 1
        # keep top-(k+1) by (q desc, event_id asc) — a set operation, so
        # arrival order across batches cannot change the result
        entries.sort(key=lambda e: (-e[0], e[1]))
        entries = entries[: k + 1]
        state.update(
            (
                n,
                [e[0] for e in entries],
                [e[1] for e in entries],
                [e[2] for e in entries],
            )
        )
        if len(entries) > k:
            tau = entries[k][0]
            est_cents = sum(
                int(max(float(w), tau) + 0.5) for _q, _i, w in entries[:k]
            )
        else:
            tau = 0.0
            est_cents = sum(w for _q, _i, w in entries)
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_seen": [n],
                "est_total": [est_cents / 100.0],
                "tau": [tau],
            }
        )

    return events.groupBy("event_type").applyInPandasWithState(
        update, out_schema, state_schema, "update", timeout
    )


def ohlc_bars(events: DataFrame, *, duration: str = "1 hour") -> DataFrame:
    """OHLC bar aggregation over a time window — the SHARED transform both
    the batch query (queries/ext_metrics.ohlc_hourly_bars, which groups by
    the equivalent date_trunc) and the streaming twin run: open/close via
    min_by/max_by on the deterministic fixed-width (epoch_us, event_id)
    key, high/low/volume as plain aggregates over int64 cents. min_by/
    max_by are declarative aggregates, so the SAME expression tree is
    legal in a watermarked streaming aggregation — one code path, two
    execution modes. The epoch is biased +1e18 before padding (same
    constant as the batch twin's oracle key) so pre-1970 timestamps,
    whose raw epoch is negative, still sort lexicographically."""
    from ..queries.ext_metrics import _OHLC_EPOCH_BIAS

    k = F.concat(
        F.lpad(
            (F.unix_micros("ts") + F.lit(_OHLC_EPOCH_BIAS)).cast("string"), 20, "0"
        ),
        F.lit("_"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    e = events.where(F.col("value").isNotNull()).select(
        "event_type",
        "ts",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        k.alias("k"),
    )
    return (
        e.groupBy(F.window("ts", duration).alias("w"), "event_type")
        .agg(
            F.min_by("cents", "k").alias("open_cents"),
            F.max("cents").alias("high_cents"),
            F.min("cents").alias("low_cents"),
            F.max_by("cents", "k").alias("close_cents"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("volume_cents"),
        )
        .select(
            F.col("w.start").alias("hr"),
            "event_type",
            "open_cents",
            "high_cents",
            "low_cents",
            "close_cents",
            "n_events",
            "volume_cents",
        )
    )


def stream_ohlc_bars(
    stream: DataFrame,
    *,
    duration: str = "1 hour",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Watermarked streaming twin of :func:`ohlc_bars`: bars finalize when
    the watermark passes the window end (append-mode eviction), late rows
    beyond `watermark` are dropped — live market-data bar building on the
    exact batch semantics."""
    return ohlc_bars(stream.withWatermark("ts", watermark), duration=duration)


def streaming_crawl_schedule(urls: DataFrame, *, rate: int = 4) -> DataFrame:
    """Streaming twin of crawl_schedule_report (the politeness
    scheduler): per-domain RUNNING sequence numbers via
    applyInPandasWithState — each arriving URL takes the next slot in
    its domain's token stream (deterministic within a micro-batch by
    URL sort), fetch_round = seq // rate, slot = seq %% rate. State is
    ONE counter per domain, so the store is bounded by the number of
    registered domains, not by crawl volume — the continuous-frontier
    form of the batch scheduler, where new discoveries keep arriving
    and rounds must keep counting across micro-batches."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    if rate < 1:
        raise ValueError(f"rate must be >= 1, got {rate}")

    out_schema = ("domain string, url string, seq long, "
                  "fetch_round int, slot_in_round int")
    state_schema = "n long"

    def update(key, pdfs, state: GroupState):
        (n,) = state.get if state.exists else (0,)
        # pdfs is an ITERATOR of Arrow-sized chunks for ONE micro-batch
        # of this key — sorting per chunk would let a later chunk's
        # lexically-earlier URL take a later seq, breaking the
        # deterministic-within-micro-batch contract (and checkpoint
        # replay). Materialize the whole group, sort ONCE. State stays
        # one counter; the transient buffer is one micro-batch of one
        # domain's URLs, which the politeness rate itself keeps small.
        urls = sorted(
            str(u) for pdf in pdfs for u in pdf["url"]
        )
        out = {"domain": [], "url": [], "seq": [], "fetch_round": [],
               "slot_in_round": []}
        for url in urls:
            out["domain"].append(key[0])
            out["url"].append(url)
            out["seq"].append(n)
            out["fetch_round"].append(n // rate)
            out["slot_in_round"].append(n % rate)
            n += 1
        state.update((n,))
        yield pd.DataFrame(out)

    return urls.groupBy("domain").applyInPandasWithState(
        update, out_schema, state_schema, "append", "NoTimeout"
    )


def document_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, text) -> the fingerprint relation incremental dedup
    keys on: one kind='md5' row (full-text hash, the exact-dup probe)
    plus one kind='tile' row per DISTINCT 8-token md5 shingle tile (the
    near-dup probe) — the SAME fingerprint rules as the batch screen
    queries/ext_governance.py:dedup_incremental_batch, shared so the
    streaming twin is equivalence-testable against it. Works on batch
    and streaming frames alike (pure per-row expressions)."""
    from ..operators.dedup import tile_fingerprints

    tiles = tile_fingerprints(F.col("text"))
    md5_rows = docs.select(
        "doc_id", F.lit("md5").alias("kind"), F.md5("text").alias("h")
    )
    tile_rows = docs.select(
        "doc_id", F.lit("tile").alias("kind"),
        F.explode(tiles).alias("h"),
    )
    return md5_rows.unionByName(tile_rows)


def streaming_dedup_admission(fps: DataFrame) -> DataFrame:
    """Streaming incremental-dedup screen via applyInPandasWithState —
    the shape a continuous 100 TB ingest actually runs: today's crawl
    is screened against the accumulated corpus WITHOUT recomputing it.
    Input is the fingerprint relation (doc_id, kind, h) from
    :func:`document_fingerprints`; state is keyed by (kind, h) and
    holds one counter, so the store is bounded by the number of
    distinct fingerprints (the tile store a production pipeline keeps
    in RocksDB), never by per-document payload.

    Semantics match the batch screen exactly: ``seen_before`` is true
    iff the fingerprint arrived in a STRICTLY EARLIER micro-batch —
    all rows of one micro-batch read the state as it stood before the
    batch, then the state updates once. Two new documents sharing a
    tile within the same batch therefore do NOT flag each other,
    which is precisely dedup_incremental_batch's new-vs-old contract
    (the corpus is the earlier batch, the daily increment the later
    one). Per-document verdicts (is_exact_dup, n_shared_tiles,
    is_near_dup) are an aggregation over this output — grouped
    downstream or in foreachBatch; equivalence with the batch screen
    is pinned in tests/test_streaming.py."""
    import pandas as pd

    out_schema = "kind string, h string, doc_id long, seen_before boolean"
    state_schema = "n long"

    def update(key, pdfs, state):
        seen = state.exists
        (n,) = state.get if seen else (0,)
        kind, h = key
        rows = {"kind": [], "h": [], "doc_id": [], "seen_before": []}
        for pdf in pdfs:
            for d in pdf["doc_id"]:
                rows["kind"].append(kind)
                rows["h"].append(h)
                rows["doc_id"].append(int(d))
                rows["seen_before"].append(bool(seen))
                n += 1
        state.update((n,))
        yield pd.DataFrame(rows)

    return fps.groupBy("kind", "h").applyInPandasWithState(
        update, out_schema, state_schema, "append", "NoTimeout"
    )
