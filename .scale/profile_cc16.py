#!/usr/bin/env python
"""Round-16 verdict item 4: per-round cost split for
cc_trade_graph_two_phase — edges shuffled per round x round wall — at
sf0.1 and sf10, to decide whether frontier shrinking (retiring resolved
leaves/stars out of the live edge set) can cut the sf10 93 s wall."""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from bigdata_meteo_datalake_spark.operators.checkpointing import cut_lazy  # noqa: E402
from bigdata_meteo_datalake_spark.operators.dedup import (  # noqa: E402
    connected_components_two_phase,
)
from bigdata_meteo_datalake_spark.session import get_spark  # noqa: E402
from bigdata_meteo_datalake_spark.sources.lake import read_table  # noqa: E402

OFF = 1000000


def seeded_edges(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(F.col("o_custkey").alias("cust"),
                (F.col("l_suppkey") + OFF).alias("supp"))
        .distinct()
        .transform(cut_lazy)
    )
    minc = pairs.groupBy("supp").agg(F.min("cust").alias("m"))
    seeded = (
        pairs.join(minc, "supp")
        .select(F.col("cust").alias("a"), F.col("m").alias("b"))
        .union(minc.select(F.col("supp").alias("a"), F.col("m").alias("b")))
        .where(F.col("a") != F.col("b"))
        .transform(cut_lazy)
    )
    m2 = seeded.groupBy("a").agg(F.min("b").alias("m2"))
    contracted = (
        seeded.join(m2, "a")
        .select(F.col("b").alias("a"), F.col("m2").alias("b"))
        .union(m2.select(F.col("a"), F.col("m2").alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    return contracted


def run(spark, sf_dir, frontier=True):
    spark.catalog.clearCache()
    gc.collect()
    stats = {}
    edges = seeded_edges(spark, sf_dir)
    t0 = time.perf_counter()
    out = connected_components_two_phase(
        edges, src_col="a", dst_col="b",
        distinct_bipartite_input=True, frontier=frontier, stats=stats,
    )
    n = out.count()
    stats["total_secs"] = round(time.perf_counter() - t0, 3)
    stats["n_out"] = n
    return stats


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    res = {}
    for label, sf_dir in (("sf0.1", "/root/testdata/sf0.1"),
                          ("sf10", "/root/repo/.scale/sf10")):
        for fr in (False, True):
            key = f"{label}_frontier{'on' if fr else 'off'}"
            # fresh JVM per configuration: 8 CC invocations in one 16g
            # session OOM on accumulated localCheckpoint blocks, and a
            # shared session lets earlier configs' memory pressure bleed
            # into later ones' walls
            spark = get_spark(f"profile-cc16-{key}", cpus=cpus,
                              shuffle_partitions=cpus)
            run(spark, "/root/testdata/sf0.001", frontier=fr)  # warm-up
            res[key] = min(
                (run(spark, sf_dir, frontier=fr) for _ in range(2)),
                key=lambda s: s["total_secs"],
            ) if label == "sf0.1" else run(spark, sf_dir, frontier=fr)
            print(key, json.dumps(res[key]), flush=True)
            spark.stop()
    print("FINAL " + json.dumps(res))


if __name__ == "__main__":
    main()
