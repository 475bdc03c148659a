"""Property tests for the round-4 second-wave operators: churn-label
leakage invariance, compaction bin-packing invariants, and the interval
join on adversarial (boundary-heavy) timestamp sets."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bigdata_meteo_datalake_spark.queries import queries

from .conftest import SF0001

QS = queries()

_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double,"
    " props string"
)


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, _EV_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/events.parquet")


def test_churn_features_ignore_holdout_week(spark, tmp_path):
    """Leakage guard: perturbing VALUE and EVENT_TYPE of every holdout-week
    event (timestamps unchanged, so the cutoff is unchanged) must leave
    every feature column bit-identical — features may only read the
    pre-cutoff past. Labels are also unchanged (they only test existence)."""
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(6):
        for d in range(0, 20, u + 1):  # pre-cutoff activity, varying density
            rows.append((eid, t0 + dt.timedelta(days=d, hours=u), u, "view", 10.0 + u, "{}"))
            eid += 1
        if u % 2 == 0:  # holdout-week activity for even users
            rows.append((eid, t0 + dt.timedelta(days=26, hours=u), u, "view", 5.0, "{}"))
            eid += 1
    # one late event pins max(ts) identically in both variants
    rows.append((eid, t0 + dt.timedelta(days=27), 99, "view", 1.0, "{}"))
    rows.append((eid + 1, t0 + dt.timedelta(days=1), 99, "view", 1.0, "{}"))

    base = str(tmp_path / "base")
    pert = str(tmp_path / "pert")
    _write_events(spark, base, rows)

    cutoff = max(r[1] for r in rows) - dt.timedelta(days=7)
    perturbed = [
        (r[0], r[1], r[2], "purchase" if r[1] >= cutoff else r[3],
         r[4] * 100 if r[1] >= cutoff else r[4], r[5])
        for r in rows
    ]
    _write_events(spark, pert, perturbed)

    a = {r.user_id: r.asDict() for r in QS["churn_label_dataset"](spark, base).collect()}
    b = {r.user_id: r.asDict() for r in QS["churn_label_dataset"](spark, pert).collect()}
    assert a == b


def test_compaction_plan_invariants(spark):
    """Greedy packing invariants on real data: per year, bins are
    contiguous month ranges, bytes are conserved, and no bin (except via
    a single oversized file) exceeds target + max file size."""
    plan = QS["compaction_plan"](spark, SF0001).collect()
    from bigdata_meteo_datalake_spark.sources.lake import read_table

    files = (
        read_table(spark, SF0001, "lineitem")
        .groupBy(
            F.year("l_shipdate").alias("yr"),
            F.date_trunc("month", F.col("l_shipdate")).cast("date").alias("m"),
        )
        .agg((F.count(F.lit(1)) * 128).alias("b"))
        .collect()
    )
    per_year: dict[int, list] = {}
    for r in files:
        per_year.setdefault(r.yr, []).append((r.m, r.b))
    for yr, fs in per_year.items():
        total = sum(b for _, b in fs)
        target = (total + 2) // 3
        bins = sorted(
            (r for r in plan if r.yr == yr), key=lambda r: r.bin_id
        )
        assert sum(r.bin_bytes for r in bins) == total
        assert sum(r.n_files for r in bins) == len(fs)
        # contiguity: month ranges must not overlap and must ascend
        for prev, cur in zip(bins, bins[1:]):
            assert prev.month_to < cur.month_from
        big = max(b for _, b in fs)
        for r in bins:
            assert r.bin_bytes <= target + big


def test_interval_join_boundary_cases(spark, tmp_path):
    """Exact-window boundaries: an event exactly 300 s earlier matches;
    300.000001 s earlier does not; identical timestamps match both ways;
    bucket-edge timestamps (multiples of 300 s) are not double-counted."""
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (0, t0, 0, "a", 0.0, "{}"),
        (1, t0 + dt.timedelta(seconds=300), 0, "a", 0.0, "{}"),  # == window edge
        (2, t0 + dt.timedelta(seconds=300, microseconds=1), 0, "a", 0.0, "{}"),
        (3, t0 + dt.timedelta(seconds=600), 0, "a", 0.0, "{}"),  # bucket edge
        (4, t0 + dt.timedelta(seconds=600), 0, "a", 0.0, "{}"),  # duplicate ts
        (5, t0 + dt.timedelta(seconds=1500), 0, "a", 0.0, "{}"),  # isolated
    ]
    d = str(tmp_path / "iv")
    _write_events(spark, d, rows)
    out = {
        r.event_id: r.n_prior_5m
        for r in QS["interval_join_event_bursts"](spark, d).collect()
    }
    w = dt.timedelta(seconds=300)
    expect = {
        e: sum(1 for s, sts in ((r[0], r[1]) for r in rows) if s != e and ts - w <= sts <= ts)
        for e, ts in ((r[0], r[1]) for r in rows)
    }
    assert out == expect
    assert out[5] == 0 and out[1] == 1 and out[2] == 1
