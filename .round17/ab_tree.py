"""Interleaved A/B of one query across two checked-out trees.
Usage: python ab_tree.py <query> <treeA> <treeB> <rounds> [sf_dir]
Each round runs the query once per tree in fresh alternating processes
(cold JVM both sides, warm run at sf0.001 inside each process before the
timed loop of 3); statistics use per-process mins.
"""
import json, os, subprocess, sys

query, tree_a, tree_b, rounds = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
sf_dir = sys.argv[5] if len(sys.argv) > 5 else "/root/testdata/sf0.1"

RUNNER = r'''
import json, sys, time, gc
sys.path.insert(0, sys.argv[1])
from bigdata_meteo_datalake_spark.queries import queries
from bigdata_meteo_datalake_spark.session import get_spark
name, sf_dir = sys.argv[2], sys.argv[3]
spark = get_spark("ab", cpus=32, shuffle_partitions=32)
q = queries()[name]
import re
warm = re.sub(r"sf[\d.]+", "sf0.001", sf_dir)
import os
if not os.path.isdir(warm): warm = sf_dir
q(spark, warm).write.format("noop").mode("overwrite").save()
runs = []
for _ in range(3):
    t0 = time.perf_counter()
    df = q(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    runs.append(round(time.perf_counter() - t0, 3))
    del df; gc.collect()
    try: spark.sparkContext._jvm.System.gc()
    except Exception: pass
print("ABRESULT " + json.dumps(runs))
spark.stop()
'''

def one(tree):
    r = subprocess.run([sys.executable, "-c", RUNNER, tree, query, sf_dir],
                       capture_output=True, text=True)
    for line in r.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[9:])
    print(r.stdout[-2000:], r.stderr[-2000:], file=sys.stderr)
    return None

res = {tree_a: [], tree_b: []}
for i in range(rounds):
    for t in (tree_a, tree_b):
        load0 = open("/proc/loadavg").read().split()[0]
        runs = one(t)
        print(json.dumps({"round": i, "tree": t, "runs": runs, "load_pre": load0}), flush=True)
        if runs: res[t].append(min(runs))
for t, mins in res.items():
    print(json.dumps({"tree": t, "mins": mins, "best": min(mins) if mins else None}), flush=True)
