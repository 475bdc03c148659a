#!/usr/bin/env python
"""Round-15 verdict item 3: adversarial high-diameter graph evidence
for connected_components_two_phase. The sf10 sweep's 100 disjoint
copies keep component depth constant, so its flat round count was
guaranteed by construction; this harness builds PATH graphs (diameter
= n-1, the worst case for label propagation, which needs n rounds)
at growing sizes and records star-contraction rounds + wall time —
the log-round claim measured against diameter directly.

Two node-labelings per size: sequential (monotone along the path —
structured worst case) and hashed (xxhash-permuted ids — the labeling
a real dedup graph has)."""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from bigdata_meteo_datalake_spark.operators.dedup import (  # noqa: E402
    connected_components_two_phase,
)
from bigdata_meteo_datalake_spark.session import get_spark  # noqa: E402

SIZES = (1_000, 10_000, 100_000, 1_000_000)


def path_edges(spark, n: int, labeling: str):
    """Edges (i, i+1) for i in [0, n-2]; 'hashed' relabels node k as an
    xxhash-derived id. A hash collision would merge path nodes —
    shrinking the effective diameter and deflating the measured round
    count while still leaving one component — so collision-freedom is
    checked by the NODE count assertion downstream (cc.count() == n),
    not the component count."""
    e = spark.range(0, n - 1).select(
        F.col("id").alias("u_raw"), (F.col("id") + 1).alias("v_raw")
    )
    if labeling == "sequential":
        return e.select(F.col("u_raw").alias("doc_a"), F.col("v_raw").alias("doc_b"))
    h = lambda c: F.abs(F.xxhash64(c.cast("string")))  # noqa: E731
    return e.select(h(F.col("u_raw")).alias("doc_a"), h(F.col("v_raw")).alias("doc_b"))


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("cc-diameter15", cpus=cpus, shuffle_partitions=cpus)
    out = []
    for n in SIZES:
        for labeling in ("sequential", "hashed"):
            edges = path_edges(spark, n, labeling)
            stats: dict = {}
            t0 = time.perf_counter()
            cc = connected_components_two_phase(
                edges, max_iter=60, stats=stats
            )
            n_nodes, n_comp = cc.agg(
                F.count(F.lit(1)), F.countDistinct("cluster_rep")
            ).first()
            dt = round(time.perf_counter() - t0, 2)
            row = {
                "n": n,
                "diameter": n - 1,
                "labeling": labeling,
                "rounds": stats.get("rounds"),
                "n_components": n_comp,
                "log2_n": round(math.log2(n), 1),
                "wall_sec": dt,
            }
            assert n_comp == 1, row  # one path -> one component
            # no hash collision shortened the path (a collision would
            # deflate the measured rounds while keeping one component)
            assert n_nodes == n, row
            out.append(row)
            print(json.dumps(row), flush=True)
            spark.catalog.clearCache()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
