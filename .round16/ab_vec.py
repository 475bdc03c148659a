"""Alternating A/B of unrolled vs fold kernels in ONE process.

Noise-robust: N alternating runs per variant, report all + min.
"""
import os, sys, time, gc
sys.path.insert(0, "/root/repo")
from bigdata_meteo_datalake_spark.queries import queries
from bigdata_meteo_datalake_spark.session import get_spark

names = sys.argv[1].split(",")
N = int(sys.argv[2]) if len(sys.argv) > 2 else 5
sf = "/root/testdata/sf0.1"
spark = get_spark("ab-vec", cpus=32, shuffle_partitions=32)
qs = queries()

def run_once(name):
    t0 = time.perf_counter()
    df = qs[name](spark, sf)
    df.write.format("noop").mode("overwrite").save()
    dt = round(time.perf_counter() - t0, 3)
    spark.catalog.clearCache()
    del df; gc.collect()
    try: spark.sparkContext._jvm.System.gc()
    except Exception: pass
    return dt

for name in names:
    # warm both variants
    for v in ("1", "0"):
        os.environ["SPARK_GRAFT_VEC_UNROLL"] = v
        qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    res = {"1": [], "0": []}
    for i in range(N):
        for v in ("1", "0") if i % 2 == 0 else ("0", "1"):
            os.environ["SPARK_GRAFT_VEC_UNROLL"] = v
            res[v].append(run_once(name))
    print(name, "unroll:", res["1"], "min", min(res["1"]),
          "| fold:", res["0"], "min", min(res["0"]), flush=True)
spark.stop()
