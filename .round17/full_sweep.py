"""Final-tree evidence: EVERY registered query vs its DuckDB oracle at
sf0.01 on a BARE session (the driver's exact gate), full registry."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[32]").getOrCreate()  # bare
import __spark_entry__ as e
qs = e.queries(); oracles = e.oracle_sql()
from bigdata_meteo_datalake_spark.oracle import compare_to_oracle
sf = "/root/testdata/sf0.01"
t0 = time.time(); failed = []
for i, name in enumerate(qs):
    try:
        if name in oracles:
            compare_to_oracle(qs[name](spark, sf), oracles[name], sf)
        else:
            assert qs[name](spark, sf).count() >= 0
    except Exception as exc:
        failed.append(name)
        print(f"FAIL {name}: {str(exc).splitlines()[0][:140]}", flush=True)
    if (i + 1) % 50 == 0:
        print(f"  ...{i+1}/{len(qs)} ({time.time()-t0:.0f}s)", flush=True)
print(f"[{len(qs)-len(failed)}/{len(qs)} green in {time.time()-t0:.0f}s] failed={failed}")
sys.exit(1 if failed else 0)
