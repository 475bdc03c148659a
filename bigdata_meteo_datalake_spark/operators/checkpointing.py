"""Lineage-cutting policy for iterative operators and multi-consumer
intermediates.

Every iterative operator in the engine (connected components, label
propagation, the ext_graph Pregel-style loops) must truncate its lineage
each round — otherwise the plan grows linearly with iterations and
analysis/optimization time blows up. Queries also cut lineage on compact
relations that feed BOTH sides of a self-join, so the upstream chain
runs once. Two materialization strategies:

- ``localCheckpoint`` (default): blocks live on executor local storage.
  Fast (no distributed-FS round trip) and self-cleaning (the
  ContextCleaner drops blocks when the frame is garbage-collected), but
  it TRUNCATES LINEAGE WITHOUT DURABILITY: an executor loss mid-job
  loses blocks that can no longer be recomputed, failing the query
  (where a ``persist()`` would have recomputed). Correct for local[n]
  and for clusters where retrying the whole query on executor loss is
  acceptable — the cut relations here are compact (prefix tables,
  per-round frontiers, top-k cuts), so a retry re-pays seconds, not the
  corpus scan.
- ``checkpoint`` (``reliable=True``): blocks are written to the
  directory registered via ``sparkContext.setCheckpointDir`` — on a real
  cluster that should be a fault-tolerant store (HDFS/object storage) so
  the job survives executor loss. The caller must have set the
  directory; auto-picking a driver-local temp dir would silently produce
  a path executors cannot reach on a multi-node cluster, so an unset dir
  is an error, not a fallback.

Cluster escape hatch: setting ``SPARK_GRAFT_RELIABLE_CHECKPOINTS=1`` in
the driver environment flips EVERY policy-resolved cut in the engine
(all ``cut_eager``/``cut_lazy`` sites across the query registry, and
every iterative operator that doesn't pass an explicit ``reliable=``)
to reliable checkpoints in one move — no per-query code changes. Long
jobs on preemptible/spot executors should set it together with
``spark.sparkContext.setCheckpointDir(<fault-tolerant path>)``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def _default_reliable() -> bool:
    """Resolve the engine-wide checkpoint policy from the environment."""
    return os.environ.get("SPARK_GRAFT_RELIABLE_CHECKPOINTS", "").lower() not in (
        "", "0", "false", "no",
    )


def cut_lineage(
    df: DataFrame, *, reliable: bool | None = None, eager: bool = True
) -> DataFrame:
    """Materialize ``df`` and truncate its lineage.

    ``reliable=False`` -> ``localCheckpoint`` (executor-local, fast,
    lost on executor failure — see the module docstring for the
    fault-tolerance tradeoff). ``reliable=True`` -> ``checkpoint`` into
    the registered checkpoint directory (survives executor loss; set it
    to a fault-tolerant store on a real cluster). ``reliable=None``
    (the default) resolves from ``SPARK_GRAFT_RELIABLE_CHECKPOINTS``.
    Raises ``RuntimeError`` when reliable checkpointing is requested and
    no checkpoint directory is registered.
    """
    if reliable is None:
        reliable = _default_reliable()
    if not reliable:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        raise RuntimeError(
            "reliable checkpointing requires a checkpoint directory: call "
            "spark.sparkContext.setCheckpointDir(<fault-tolerant path>) first "
            "(HDFS/object storage on a cluster; any local path on local[n])."
        )
    return df.checkpoint(eager=eager)


def cut_eager(df: DataFrame) -> DataFrame:
    """Policy-resolved eager lineage cut, shaped for ``df.transform``:
    ``frontier.transform(cut_eager)`` inside iterative loops."""
    return cut_lineage(df, reliable=None, eager=True)


def cut_lazy(df: DataFrame) -> DataFrame:
    """Policy-resolved lazy lineage cut, shaped for ``df.transform``:
    ``prefix.transform(cut_lazy)`` on multi-consumer intermediates that
    the downstream plan materializes on first use."""
    return cut_lineage(df, reliable=None, eager=False)
