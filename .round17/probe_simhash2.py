import gc, json, os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from bigdata_meteo_datalake_spark.session import get_spark
from bigdata_meteo_datalake_spark.operators import dedup as D
from bigdata_meteo_datalake_spark.sources.lake import read_table, widen
from bigdata_meteo_datalake_spark.functions.numeric import project_fence

spark = get_spark("probe2", cpus=32, shuffle_partitions=32)
sf = "/root/testdata/sf0.1"
d = read_table(spark, sf, "documents")

def hs_col():
    return F.transform(F.array_distinct(D.word_tokens(F.col("text"))), lambda t: D.token_hash(t))

def base_df():
    return widen(d).select(F.col("doc_id"), hs_col().alias("hs"))

def accs16(hs):
    # 16 folds, 2 bits per fold in 32-bit lanes: unconditionally exact
    # (count <= array max size < 2^31, top lane bits 32..62)
    def lane_sum(g):
        def merge(acc, h):
            lo = F.shiftright(h, 2 * g).bitwiseAND(F.lit(1))
            hi = F.shiftleft(F.shiftright(h, 2 * g + 1).bitwiseAND(F.lit(1)), 32)
            return acc + lo + hi
        return merge
    return [F.aggregate(hs, F.lit(0).cast("long"), lane_sum(g)) for g in range(16)]

def readout16(n):
    sh = None
    for b in range(32):
        g, j = divmod(b, 2)
        c = F.shiftright(F.col(f"_a{g}"), 32 * j).bitwiseAND(F.lit(0xFFFFFFFF))
        t = F.when(c * 2 > n, F.lit(1 << b)).otherwise(F.lit(0))
        sh = t if sh is None else sh + t
    return sh

def variant(name):
    base = base_df()
    if name == "legacy_fenced":
        return base.transform(project_fence).select("doc_id", D._simhash_bits_perbit(F.col("hs")).cast("long").alias("simhash"))
    if name == "packed8_nofb":
        b = base.transform(project_fence)
        accs = D._simhash_packed_accs(F.col("hs"))
        wa = b.select("doc_id", F.size("hs").alias("_n"), *[a.alias(f"_acc{g}") for g, a in enumerate(accs)])
        n = F.col("_n")
        sh = None
        for bit_i in range(32):
            g, j = divmod(bit_i, 4)
            c = F.shiftright(F.col(f"_acc{g}"), 16 * j).bitwiseAND(F.lit(0xFFFF))
            t = F.when(c * 2 > n, F.lit(1 << bit_i)).otherwise(F.lit(0))
            sh = t if sh is None else sh + t
        return wa.transform(project_fence).select("doc_id", sh.cast("long").alias("simhash"))
    if name == "packed16":
        b = base.transform(project_fence)
        wa = b.select("doc_id", F.size("hs").alias("_n"), *[a.alias(f"_a{g}") for g, a in enumerate(accs16(F.col("hs")))])
        return wa.transform(project_fence).select("doc_id", readout16(F.col("_n")).cast("long").alias("simhash"))
    if name == "split_union":
        b = base.transform(project_fence).withColumn("_n", F.size("hs"))
        small = b.where(F.col("_n") <= 32767)
        accs = D._simhash_packed_accs(F.col("hs"))
        wa = small.select("doc_id", "_n", *[a.alias(f"_acc{g}") for g, a in enumerate(accs)])
        n = F.col("_n")
        sh = None
        for bit_i in range(32):
            g, j = divmod(bit_i, 4)
            c = F.shiftright(F.col(f"_acc{g}"), 16 * j).bitwiseAND(F.lit(0xFFFF))
            t = F.when(c * 2 > n, F.lit(1 << bit_i)).otherwise(F.lit(0))
            sh = t if sh is None else sh + t
        out_small = wa.transform(project_fence).select("doc_id", sh.cast("long").alias("simhash"))
        big = b.where(F.col("_n") > 32767).select("doc_id", D._simhash_bits_perbit(F.col("hs")).cast("long").alias("simhash"))
        return out_small.unionByName(big)
    raise ValueError(name)

names = ["legacy_fenced", "packed8_nofb", "packed16", "split_union"]
for nm in names:
    df = variant(nm)
    assert df.count() == 5000 or nm  # sanity
for nm in names:
    variant(nm).write.format("noop").mode("overwrite").save()
res = {nm: [] for nm in names}
for r in range(5):
    for nm in names:
        t0 = time.perf_counter()
        variant(nm).write.format("noop").mode("overwrite").save()
        res[nm].append(round(time.perf_counter() - t0, 3))
        gc.collect()
print(json.dumps({nm: {"min": min(v), "all": v} for nm, v in res.items()}, indent=1))
spark.stop()
