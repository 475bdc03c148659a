"""Verdict item 5: decompose cc_trade_graph_two_phase per-round fixed
cost at sf0.1 — seed stage vs loop rounds vs readout, with the
operator's stats dict (rounds, edges_per_round, round_secs).

Usage: python .round17/probe_cc17.py [sf_dir] [cpus]
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

from bigdata_meteo_datalake_spark.operators.checkpointing import cut_lazy
from bigdata_meteo_datalake_spark.operators.dedup import (
    connected_components_two_phase,
)
from bigdata_meteo_datalake_spark.queries.ext_corpus import _CC2_SUPP_OFFSET
from bigdata_meteo_datalake_spark.session import get_spark
from bigdata_meteo_datalake_spark.sources.lake import read_table

spark = get_spark("probe-cc17", cpus=cpus, shuffle_partitions=cpus)

def build_contracted(sfd):
    o = read_table(spark, sfd, "orders").select("o_orderkey", "o_custkey")
    l = read_table(spark, sfd, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("o_custkey").alias("cust"),
            (F.col("l_suppkey") + _CC2_SUPP_OFFSET).alias("supp"),
        )
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
    return (
        seeded.join(m2, "a")
        .select(F.col("b").alias("a"), F.col("m2").alias("b"))
        .union(m2.select(F.col("a"), F.col("m2").alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )

# warm at sf0.001
warm = build_contracted("/root/testdata/sf0.001")
connected_components_two_phase(
    warm, src_col="a", dst_col="b", distinct_bipartite_input=True
).write.format("noop").mode("overwrite").save()

for rep in range(3):
    load0 = open("/proc/loadavg").read().split()[0]
    t0 = time.perf_counter()
    contracted = build_contracted(sf_dir)
    t_build = time.perf_counter()
    stats = {}
    cc = connected_components_two_phase(
        contracted,
        src_col="a",
        dst_col="b",
        distinct_bipartite_input=True,
        stats=stats,
    )
    t_loop = time.perf_counter()
    cc.select("node", "cluster_rep").write.format("noop").mode(
        "overwrite"
    ).save()
    t_out = time.perf_counter()
    print(
        json.dumps(
            {
                "rep": rep,
                "load_pre": load0,
                "build_plan_s": round(t_build - t0, 3),
                "loop_s": round(t_loop - t_build, 3),
                "readout_s": round(t_out - t_loop, 3),
                "total_s": round(t_out - t0, 3),
                "stats": stats,
            }
        ),
        flush=True,
    )

spark.stop()
