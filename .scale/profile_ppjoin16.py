#!/usr/bin/env python
"""Round-16 verdict item 3: measure the PPJoin+ grouped positional
filter's candidate/wall reduction on dedup_jaccard_prefix_filter at
sf0.1 and sf10, against the r15 baselines (SCALE.md: 68,765 / 6,871,100
distinct candidates; sf10 full-query 147.8 s with ~43 s exact verify).

Same protocol as .scale/profile_dedup15.py: noop-write materialization,
cache-clear + GC between stages, warm-up at sf0.001 before each SF.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from bigdata_meteo_datalake_spark.operators.dedup import (  # noqa: E402
    doc_shingle_hash_sets,
    jaccard_verify_sets,
    prefix_filter_candidates,
)
from bigdata_meteo_datalake_spark.operators.checkpointing import cut_lazy  # noqa: E402
from bigdata_meteo_datalake_spark.session import get_spark  # noqa: E402
from bigdata_meteo_datalake_spark.sources.lake import read_table  # noqa: E402


def hygiene(spark):
    spark.catalog.clearCache()
    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:  # noqa: BLE001 - measurement hygiene only
        pass


def timed(fn):
    t0 = time.perf_counter()
    v = fn()
    return round(time.perf_counter() - t0, 3), v


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def profile(spark, sf_dir: str) -> dict:
    out: dict = {}
    d = read_table(spark, sf_dir, "documents")
    sets = doc_shingle_hash_sets(d).transform(cut_lazy)
    pre = prefix_filter_candidates(sets, t_num=3, t_den=5)
    out["t_candidates"], out["n_candidates"] = timed(pre.count)
    hygiene(spark)
    full = jaccard_verify_sets(pre, sets).where(F.col("jaccard_raw") >= 0.6)
    out["t_full_query"], _ = timed(lambda: noop(full))
    hygiene(spark)
    out["n_survivors"] = full.count()
    hygiene(spark)
    return out


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("profile-ppjoin16", cpus=cpus, shuffle_partitions=cpus)
    res = {}
    for label, sf_dir in (("sf0.1", "/root/testdata/sf0.1"),
                          ("sf10", "/root/repo/.scale/sf10")):
        profile(spark, "/root/testdata/sf0.001")  # warm-up / JIT parity
        res[label] = profile(spark, sf_dir)
        print(label, json.dumps(res[label]), flush=True)
    print("FINAL " + json.dumps(res))


if __name__ == "__main__":
    main()
