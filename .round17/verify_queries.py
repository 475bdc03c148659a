"""Oracle-verify a list of queries at a given SF (default sf0.01)."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[16]").getOrCreate()
import __spark_entry__ as e
qs = e.queries(); oracles = e.oracle_sql()
sf = "/root/testdata/sf0.01"
names = []
for a in sys.argv[1:]:
    if a.startswith("sf="): sf = a[3:]
    else: names.append(a)
from bigdata_meteo_datalake_spark.oracle import compare_to_oracle
failed = []
for name in names:
    t0 = time.time()
    try:
        if name in oracles:
            compare_to_oracle(qs[name](spark, sf), oracles[name], sf)
        else:
            assert qs[name](spark, sf).count() >= 0
        print(f"OK   {name} ({time.time()-t0:.1f}s)", flush=True)
    except Exception as exc:
        failed.append(name)
        print(f"FAIL {name}: {str(exc).splitlines()[0][:200]}", flush=True)
print("ALL GREEN" if not failed else f"FAILED: {failed}")
sys.exit(1 if failed else 0)
