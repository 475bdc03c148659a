import gc, json, os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from bigdata_meteo_datalake_spark.session import get_spark
from bigdata_meteo_datalake_spark.operators import dedup as D
from bigdata_meteo_datalake_spark.sources.lake import read_table, widen
from bigdata_meteo_datalake_spark.functions.numeric import project_fence

spark = get_spark("probe", cpus=32, shuffle_partitions=32)
sf = "/root/testdata/sf0.1"
d = read_table(spark, sf, "documents")

def hs_col():
    return F.transform(F.array_distinct(D.word_tokens(F.col("text"))), lambda t: D.token_hash(t))

def base_df():
    return widen(d).select(F.col("doc_id"), hs_col().alias("hs"))

def variant(name):
    base = base_df()
    if name == "hs_only":
        return base
    if name == "legacy":
        return base.select("doc_id", D._simhash_bits_perbit(F.col("hs")).cast("long").alias("simhash"))
    if name == "legacy_fenced":
        return base.transform(project_fence).select("doc_id", D._simhash_bits_perbit(F.col("hs")).cast("long").alias("simhash"))
    if name in ("packed", "packed_nofb", "packed_nofence"):
        b = base if name == "packed_nofence" else base.transform(project_fence)
        accs = D._simhash_packed_accs(F.col("hs"))
        wa = b.select("doc_id", "hs", F.size("hs").alias("_n"), *[a.alias(f"_acc{g}") for g, a in enumerate(accs)])
        n = F.col("_n")
        sh = None
        for bit_i in range(32):
            g, j = divmod(bit_i, 4)
            c = F.shiftright(F.col(f"_acc{g}"), 16 * j).bitwiseAND(F.lit(0xFFFF))
            t = F.when(c * 2 > n, F.lit(1 << bit_i)).otherwise(F.lit(0))
            sh = t if sh is None else sh + t
        out = sh if name == "packed_nofb" else F.when(n <= 32767, sh).otherwise(D._simhash_bits_perbit(F.col("hs")))
        wa2 = wa if name == "packed_nofence" else wa.transform(project_fence)
        return wa2.select("doc_id", out.cast("long").alias("simhash"))
    raise ValueError(name)

names = ["hs_only", "legacy", "packed", "packed_nofb", "packed_nofence", "legacy_fenced"]
# warm all
for nm in names:
    variant(nm).write.format("noop").mode("overwrite").save()
res = {nm: [] for nm in names}
for r in range(4):
    for nm in names:
        t0 = time.perf_counter()
        variant(nm).write.format("noop").mode("overwrite").save()
        res[nm].append(round(time.perf_counter() - t0, 3))
        gc.collect()
print(json.dumps({nm: {"min": min(v), "all": v} for nm, v in res.items()}, indent=1))
spark.stop()
