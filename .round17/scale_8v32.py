"""Item 7: 8-core vs 32-core at sf10 for the top-5 by cost. Fresh process
per (query, cpus) with warm + min-of-2 timed runs; load receipts inline."""
import json, subprocess, sys

QUERIES = ["pricing_summary", "dedup_minhash_lsh", "dedup_jaccard_prefix_filter",
           "semantic_dedup_lsh", "cc_trade_graph_two_phase"]
SF = "/root/repo/.scale/sf10"

RUNNER = r'''
import json, sys, time, gc
sys.path.insert(0, "/root/repo")
from bigdata_meteo_datalake_spark.queries import queries
from bigdata_meteo_datalake_spark.session import get_spark
name, cpus = sys.argv[1], int(sys.argv[2])
spark = get_spark("scale", cpus=cpus, shuffle_partitions=cpus)
q = queries()[name]
q(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
runs = []
for _ in range(2):
    t0 = time.perf_counter()
    q(spark, "/root/repo/.scale/sf10").write.format("noop").mode("overwrite").save()
    runs.append(round(time.perf_counter() - t0, 3))
    gc.collect()
print("RES " + json.dumps(runs))
spark.stop()
'''

for name in QUERIES:
    for cpus in (32, 8):
        load = open("/proc/loadavg").read().split()[0]
        r = subprocess.run([sys.executable, "-c", RUNNER, name, str(cpus)],
                           capture_output=True, text=True)
        runs = None
        for line in r.stdout.splitlines():
            if line.startswith("RES "):
                runs = json.loads(line[4:])
        print(json.dumps({"query": name, "cpus": cpus, "runs": runs,
                          "load_pre": load}), flush=True)
