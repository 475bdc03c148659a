"""Driver simulation (verify skill): BARE SparkSession, entry() smoke,
then the first-N sweep queries vs their DuckDB oracles at sf0.01."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50
spark = SparkSession.builder.master("local[32]").getOrCreate()  # NO engine conf
import __spark_entry__ as e
t0 = time.time()
n = e.entry(spark).count()
print(f"entry(): {n} rows in {time.time()-t0:.1f}s", flush=True)
assert n > 0

qs = e.queries(); oracles = e.oracle_sql()
from bigdata_meteo_datalake_spark.oracle import compare_to_oracle
sf = "/root/testdata/sf0.01"
names = list(qs)[:N]
failed = []
for i, name in enumerate(names):
    try:
        if name in oracles:
            compare_to_oracle(qs[name](spark, sf), oracles[name], sf)
            print(f"OK    {i+1:3d}/{len(names)} {name}", flush=True)
        else:
            rows = qs[name](spark, sf).count()
            print(f"ROWS  {i+1:3d}/{len(names)} {name} ({rows} rows)", flush=True)
    except Exception as exc:
        failed.append(name)
        print(f"FAIL  {i+1:3d}/{len(names)} {name}: {str(exc).splitlines()[0][:140]}", flush=True)
print(f"[{len(names)-len(failed)}/{len(names)} green] failed={failed}")
sys.exit(1 if failed else 0)
