"""The reliable-checkpoint option for iterative operators: lineage is cut
in BOTH modes, results are identical, and the reliable path actually
writes into (and requires) the registered checkpoint directory."""

from __future__ import annotations

import os

import pytest

from bigdata_meteo_datalake_spark.operators.checkpointing import cut_lineage
from bigdata_meteo_datalake_spark.operators.dedup import (
    connected_components,
    connected_components_two_phase,
)

# a path graph (worst case for label propagation) plus a separate triangle
_EDGES = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12)]
_WANT = {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10}


def _edge_df(spark):
    return spark.createDataFrame(_EDGES, "doc_a long, doc_b long")


def _as_map(df):
    return {r["node"]: r["cluster_rep"] for r in df.collect()}


def _plan_is_rdd_scan(df) -> bool:
    """Lineage is cut when the analyzed plan bottoms out in a LogicalRDD
    (scan of an already-materialized RDD) instead of the original tree."""
    return "LogicalRDD" in df._jdf.queryExecution().analyzed().toString()


# NOTE: defined first because it must observe the session BEFORE any test
# registers a checkpoint dir (the spark fixture is session-scoped).
def test_reliable_requires_checkpoint_dir(spark):
    # a session that never registered a checkpoint dir must fail loudly,
    # not silently fall back to executor-local storage
    if spark.sparkContext.getCheckpointDir() is not None:
        pytest.skip("session already has a checkpoint dir (test-order dependent)")
    with pytest.raises(RuntimeError, match="setCheckpointDir"):
        cut_lineage(spark.range(3).toDF("x"), reliable=True)


def test_cut_lineage_truncates_both_modes(spark, tmp_path):
    df = _edge_df(spark).groupBy("doc_a").count()
    local = cut_lineage(df, reliable=False)
    assert _plan_is_rdd_scan(local) and local.count() == 6

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    rel = cut_lineage(df, reliable=True)
    assert _plan_is_rdd_scan(rel) and rel.count() == 6
    # the reliable path must have written block files under the directory
    files = [
        os.path.join(r, f)
        for r, _d, fs in os.walk(str(tmp_path / "ckpt"))
        for f in fs
    ]
    assert files, "reliable checkpoint wrote nothing into the checkpoint dir"


@pytest.mark.parametrize("algo", [connected_components, connected_components_two_phase])
def test_cc_reliable_matches_local(spark, tmp_path, algo):
    spark.sparkContext.setCheckpointDir(str(tmp_path / "cc_ckpt"))
    edges = _edge_df(spark)
    local = _as_map(algo(edges, reliable=False))
    rel = _as_map(algo(edges, reliable=True))
    assert local == rel == _WANT


def test_env_policy_flips_every_cut_site(spark, tmp_path, monkeypatch):
    """SPARK_GRAFT_RELIABLE_CHECKPOINTS=1 is the cluster escape hatch
    (round-8): every policy-resolved cut (cut_eager/cut_lazy transform
    sites across the registry, and operators defaulting reliable=None)
    switches to reliable checkpoint() without code changes — and fails
    loudly when no checkpoint dir is registered."""
    from bigdata_meteo_datalake_spark.operators.checkpointing import (
        cut_eager,
        cut_lazy,
    )

    monkeypatch.setenv("SPARK_GRAFT_RELIABLE_CHECKPOINTS", "1")
    had_dir = spark.sparkContext.getCheckpointDir()
    if had_dir is None:
        with pytest.raises(RuntimeError, match="setCheckpointDir"):
            spark.range(3).toDF("x").transform(cut_eager)
    spark.sparkContext.setCheckpointDir(str(tmp_path / "policy_ckpt"))
    df = _edge_df(spark).groupBy("doc_a").count()
    out = df.transform(cut_eager)
    assert _plan_is_rdd_scan(out) and out.count() == 6
    lazy = df.transform(cut_lazy)
    assert lazy.count() == 6
    files = [
        os.path.join(r, f)
        for r, _d, fs in os.walk(str(tmp_path / "policy_ckpt"))
        for f in fs
    ]
    assert files, "env policy did not route cuts into the checkpoint dir"

    # an iterative operator with reliable=None (the default) follows the
    # same policy end to end
    assert _as_map(connected_components(_edge_df(spark))) == _WANT

    monkeypatch.setenv("SPARK_GRAFT_RELIABLE_CHECKPOINTS", "0")
    assert spark.range(2).toDF("x").transform(cut_eager).count() == 2
