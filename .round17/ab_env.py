"""Same-session interleaved A/B of one query under an env lever.
Usage: python ab_env.py <query> <ENVVAR> <valA> <valB> <rounds> [sf_dir] [cpus]
The lever is read at plan build time, so one session alternates variants:
warm both once, then A B A B ... with per-variant min statistics.
"""
import gc, json, os, re, sys, time

sys.path.insert(0, "/root/repo")
query, env, va, vb, rounds = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4], int(sys.argv[5])
sf_dir = sys.argv[6] if len(sys.argv) > 6 else "/root/testdata/sf0.1"
cpus = int(sys.argv[7]) if len(sys.argv) > 7 else 32

from bigdata_meteo_datalake_spark.queries import queries
from bigdata_meteo_datalake_spark.session import get_spark

spark = get_spark("ab_env", cpus=cpus, shuffle_partitions=cpus)
q = queries()[query]
warm = re.sub(r"sf[\d.]+", "sf0.001", sf_dir)
if not os.path.isdir(warm):
    warm = sf_dir

def run_once(val, data_dir):
    os.environ[env] = val
    t0 = time.perf_counter()
    df = q(spark, data_dir)
    df.write.format("noop").mode("overwrite").save()
    dt = round(time.perf_counter() - t0, 3)
    del df; gc.collect()
    try: spark.sparkContext._jvm.System.gc()
    except Exception: pass
    return dt

for v in (va, vb):
    run_once(v, warm)

res = {va: [], vb: []}
for i in range(rounds):
    for v in (va, vb):
        load0 = open("/proc/loadavg").read().split()[0]
        dt = run_once(v, sf_dir)
        res[v].append(dt)
        print(json.dumps({"round": i, env: v, "sec": dt, "load_pre": load0}), flush=True)
print(json.dumps({"query": query, "env": env,
                  "summary": {v: {"min": min(r), "med": sorted(r)[len(r)//2], "all": r}
                              for v, r in res.items()}}), flush=True)
spark.stop()
