#!/usr/bin/env python
"""100x scale spot-check (round-14 verdict item 3): run the 8 heaviest
queries at sf0.1 and at the self-generated similarity-disjoint sf10
(100x documents/orders/lineitem/events/embeddings — make_sf10.py) and
report wall-time ratios. The brief's bar is "survives a 100x
scale-up": a bucketed/near-linear operator should land at <= ~100x;
anything markedly superlinear is flagged for diagnosis, and iterative
ops (connected components) must not grow their round count."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")
os.environ["PYTHONPATH"] = "/root/repo:" + os.environ.get("PYTHONPATH", "")

from bigdata_meteo_datalake_spark.queries import queries  # noqa: E402
from bigdata_meteo_datalake_spark.session import get_spark  # noqa: E402

#: the 8 heaviest queries by the round-13 sf1 recording (SCALE.md)
QUERIES = [
    "span_dedup_report",
    "dedup_jaccard_prefix_filter",
    "semantic_dedup_lsh",
    "cc_trade_graph_two_phase",
    "dedup_minhash_lsh",
    # round-15: the headline spatial artifact is the bounded-output
    # stats twin (the pairs form is output-bound at fixed area and
    # stays as the correctness gate only)
    "spatial_radius_stats",
    "bm25_doc_scores",
    "semantic_dedup_ivf",
]

SF01 = "/root/testdata/sf0.1"
SF10 = "/root/repo/.scale/sf10"
WARM = "/root/testdata/sf0.001"


def run(spark, qs, name, sf_dir):
    t0 = time.perf_counter()
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    import gc

    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:  # noqa: BLE001 - measurement hygiene only
        pass
    return round(dt, 3)


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("scale10", cpus=cpus, shuffle_partitions=cpus)
    qs = queries()
    only = os.environ.get("SPARK_GRAFT_SCALE_ONLY")
    names = only.split(",") if only else QUERIES
    out = {}
    for name in names:
        try:
            run(spark, qs, name, WARM)  # JIT/codegen warm-up
            t01 = min(run(spark, qs, name, SF01) for _ in range(2))
            t10 = run(spark, qs, name, SF10)
        except Exception as e:  # noqa: BLE001 - one query must not kill the sweep
            out[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(name, out[name], flush=True)
            continue
        out[name] = {
            "sf0.1_sec": t01,
            "sf10_sec": t10,
            "ratio": round(t10 / t01, 2),
        }
        print(name, out[name], flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
