#!/usr/bin/env python
"""Scale spot-check: run the slowest headline queries at sf0.1 and at a
self-generated sf1 (10x documents/orders/lineitem; copies are key-shifted
and token-renamed so each copy is similarity-disjoint — see SCALE.md) and
report wall-time ratios. A bucketed/near-linear operator should land near
10x; anything >3x superlinear (ratio >30) is flagged for diagnosis."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
# the codec kernels import the package INSIDE executor python workers,
# which inherit cwd (not the driver's sys.path) — run from the repo root
# and export PYTHONPATH so mapInPandas kernels resolve the package
os.chdir("/root/repo")
os.environ["PYTHONPATH"] = "/root/repo:" + os.environ.get("PYTHONPATH", "")

from bigdata_meteo_datalake_spark.queries import queries  # noqa: E402
from bigdata_meteo_datalake_spark.session import get_spark  # noqa: E402

# the FULL headline set (round-9 verdict item 5): every continuously
# timed query gets sf0.1 -> sf1 wall-ratio evidence, not just the six
# slowest. Kept in lockstep with bench.py's list by importing it.
from bench import BENCH_QUERIES as QUERIES  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = "/root/repo/.scale/sf1"
WARM = "/root/testdata/sf0.001"


def run(spark, qs, name, sf_dir):
    t0 = time.perf_counter()
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    # same GC hygiene as bench.py: localCheckpoint blocks free only on
    # JVM GC, and the r8 sweep showed accumulated blocks inflating LATER
    # readings (one sf1 reading read 3.6x solo until re-measured fresh)
    import gc

    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:  # noqa: BLE001 - measurement hygiene only
        pass
    return round(dt, 3)


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("scale", cpus=cpus, shuffle_partitions=cpus)
    qs = queries()
    only = os.environ.get("SPARK_GRAFT_SCALE_ONLY")
    names = only.split(",") if only else QUERIES
    out = {}
    for name in names:
        try:
            run(spark, qs, name, WARM)  # JIT/codegen warm-up
            t01 = min(run(spark, qs, name, SF01) for _ in range(2))
            t1 = min(run(spark, qs, name, SF1) for _ in range(2))
        except Exception as e:  # noqa: BLE001 - one query must not kill the sweep
            out[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(name, out[name], flush=True)
            continue
        out[name] = {
            "sf0.1_sec": t01,
            "sf1_sec": t1,
            "ratio": round(t1 / t01, 2),
        }
        print(name, out[name], flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
