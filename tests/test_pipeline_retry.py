"""Stage retry policy (dags/movies_analytics.py:8-9: retries=1, 3-min
delay): a transient stage failure re-runs and the run still completes
idempotently; deterministic quality failures are never retried."""

from __future__ import annotations

import pytest

from bigdata_meteo_datalake_spark.plans import pipeline
from bigdata_meteo_datalake_spark.plans.pipeline import RetryPolicy, run_stage

from .fixtures_movies import DAY1, build_lake
from .oracle_utils import compare_frames


def test_run_stage_retries_transient_then_succeeds():
    calls, naps = [], []

    def flaky():
        calls.append(1)
        if len(calls) == 1:
            raise OSError("transient I/O")

    run_stage("s", flaky, RetryPolicy(retries=1, delay_s=7.0), sleep=naps.append)
    assert len(calls) == 2 and naps == [7.0]


def test_run_stage_exhausted_raises_with_stage_name():
    with pytest.raises(RuntimeError, match="stage 'doomed' failed after 2"):
        run_stage(
            "doomed",
            lambda: (_ for _ in ()).throw(OSError("down")),
            RetryPolicy(retries=1, delay_s=0.0),
            sleep=lambda _: None,
        )


def test_run_stage_never_retries_assertion():
    calls = []

    def gate():
        calls.append(1)
        raise AssertionError("quality checks failed")

    with pytest.raises(AssertionError):
        run_stage("gate", gate, RetryPolicy(retries=3, delay_s=0.0), sleep=lambda _: None)
    assert len(calls) == 1


def test_pipeline_completes_after_transient_stage_failure(
    spark, tmp_path, monkeypatch
):
    """One usage-zone write fails transiently; the retried run's output is
    identical to an undisturbed run (O6 idempotence makes the re-run safe)."""
    lake = build_lake(str(tmp_path / "lake"))

    clean = pipeline.run(spark, lake, DAY1, run_id="clean", retry=None)
    expected = clean.tables["movies_enriched_daily"].toPandas()

    real_write = pipeline.write_partitioned
    state = {"failed": False}

    def flaky_write(df, path, **kw):
        if "usage/movies_enriched_daily" in path and not state["failed"]:
            state["failed"] = True
            raise OSError("transient object-store 503")
        return real_write(df, path, **kw)

    monkeypatch.setattr(pipeline, "write_partitioned", flaky_write)
    naps = []
    res = pipeline.run(
        spark,
        lake,
        DAY1,
        run_id="retried",
        retry=RetryPolicy(retries=1, delay_s=1.5),
        sleep=naps.append,
    )
    assert state["failed"] and naps == [1.5]
    compare_frames(res.tables["movies_enriched_daily"].toPandas(), expected)
