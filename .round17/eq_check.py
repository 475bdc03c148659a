"""Result-set equality of one query under an env lever (any SF): count +
sum/xor of row hashes, order-insensitive, computed distributed."""
import os, sys
sys.path.insert(0, "/root/repo")
query, env, va, vb = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
sf_dir = sys.argv[5] if len(sys.argv) > 5 else "/root/testdata/sf0.1"
from pyspark.sql import functions as F
from bigdata_meteo_datalake_spark.queries import queries
from bigdata_meteo_datalake_spark.session import get_spark
spark = get_spark("eq", cpus=32, shuffle_partitions=32)
q = queries()[query]
def digest(val):
    os.environ[env] = val
    df = q(spark, sf_dir)
    cols = [F.col(c).cast("string") for c in sorted(df.columns)]
    h = F.xxhash64(*cols)
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(h).alias("s"),
        F.sum(F.abs(h) % 1000000007).alias("m"),
    ).collect()[0]
    return (row.n, row.s, row.m)
da, db = digest(va), digest(vb)
print({"query": query, va: da, vb: db, "equal": da == db})
sys.exit(0 if da == db else 1)
