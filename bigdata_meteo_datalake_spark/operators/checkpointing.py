"""Lineage-cutting policy for iterative operators.

Every iterative operator in the engine (connected components, label
propagation, the ext_graph Pregel-style loops) must truncate its lineage
each round — otherwise the plan grows linearly with iterations and
analysis/optimization time blows up. Two materialization strategies:

- ``localCheckpoint`` (default): blocks live on executor local storage.
  Fast (no distributed-FS round trip) and self-cleaning (the
  ContextCleaner drops blocks when the frame is garbage-collected), but
  an executor loss mid-loop loses blocks and kills the job. Correct for
  local[n] and for clusters where retrying the whole job on executor
  loss is acceptable.
- ``checkpoint`` (``reliable=True``): blocks are written to the
  directory registered via ``sparkContext.setCheckpointDir`` — on a real
  cluster that should be a fault-tolerant store (HDFS/object storage) so
  the loop survives executor loss. The caller must have set the
  directory; auto-picking a driver-local temp dir would silently produce
  a path executors cannot reach on a multi-node cluster, so an unset dir
  is an error, not a fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cut_lineage(df: DataFrame, *, reliable: bool = False, eager: bool = True) -> DataFrame:
    """Materialize ``df`` and truncate its lineage.

    ``reliable=False`` -> ``localCheckpoint`` (executor-local, fast,
    lost on executor failure). ``reliable=True`` -> ``checkpoint`` into
    the registered checkpoint directory (survives executor loss; set it
    to a fault-tolerant store on a real cluster). Raises ``RuntimeError``
    when ``reliable=True`` and no checkpoint directory is registered.
    """
    if not reliable:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        raise RuntimeError(
            "reliable=True requires a checkpoint directory: call "
            "spark.sparkContext.setCheckpointDir(<fault-tolerant path>) first "
            "(HDFS/object storage on a cluster; any local path on local[n])."
        )
    return df.checkpoint(eager=eager)
