import json, os, sys, time, gc
sys.path.insert(0, "/root/repo")
from bigdata_meteo_datalake_spark.queries import queries
from bigdata_meteo_datalake_spark.session import get_spark

name = sys.argv[1]
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
n = int(sys.argv[3]) if len(sys.argv) > 3 else 5
spark = get_spark("solo", cpus=32, shuffle_partitions=32)
q = queries()[name]
# warm at sf0.001
warm = sf_dir.replace("sf0.1", "sf0.001").replace("sf10", "sf0.001")
if not os.path.isdir(warm):
    warm = "/root/testdata/sf0.001"
q(spark, warm).write.format("noop").mode("overwrite").save()
runs = []
for i in range(n):
    t0 = time.perf_counter()
    df = q(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    runs.append(round(time.perf_counter() - t0, 3))
    del df; gc.collect()
    try: spark.sparkContext._jvm.System.gc()
    except Exception: pass
print(json.dumps({"query": name, "runs": runs, "min": min(runs)}))
spark.stop()
