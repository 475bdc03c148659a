"""Pre-checkpoint STAGE plans for the round-17 claims whose full-query
artifacts are readout-only (the pipeline localCheckpoints before the
readout, so `capture_plans.py` shows `Scan ExistingRDD` where the stage
ran): the Arrow shingle kernel (OPTIMIZATION_r17.md par.4, consumed by
dedup_minhash_lsh / dedup_jaccard_prefix_filter) and the IVF
min(struct) nearest-centroid assignment (par.10, semantic_dedup_ivf).

Each stage is built exactly as the query source builds it (same helper
calls; the IVF assignment block is the verbatim construction from
queries/ext_similarity.py:semantic_dedup_ivf) under both lever values,
and the unexecuted .explain('formatted') is dumped.
"""
import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from bigdata_meteo_datalake_spark.session import get_spark  # noqa: E402
from bigdata_meteo_datalake_spark.sources.lake import (  # noqa: E402
    read_table,
    table_row_count,
    widen,
)

sf_dir = "/root/testdata/sf0.1"
out = "/root/repo/plans/r17"
spark = get_spark("capture-stage-plans")
jvm = spark.sparkContext._jvm


def dump(df, name):
    txt = jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(f"{out}/{name}.txt", "w") as f:
        f.write(txt)
    print(name, "ok", flush=True)


# 1. shingle hash-set stage (operators/dedup.py:doc_shingle_hash_sets) —
# the md5 expression tower vs the mapInArrow kernel.
from bigdata_meteo_datalake_spark.operators import dedup as D  # noqa: E402

docs = widen(read_table(spark, sf_dir, "documents"))
for val, tag in (("0", "before"), ("1", "after")):
    os.environ["SPARK_GRAFT_SHINGLE_ARROW"] = val
    dump(D.doc_shingle_hash_sets(docs), f"dedup_shingle_stage_{tag}")

# 2. IVF nearest-centroid assignment + hot-cell guard stage
# (queries/ext_similarity.py:semantic_dedup_ivf, construction copied
# verbatim) — row_number window over the crossJoin product vs the
# map-side-combined min(struct) aggregate.
from bigdata_meteo_datalake_spark.functions import vec  # noqa: E402
from bigdata_meteo_datalake_spark.queries import ext_similarity as S  # noqa: E402

emb = widen(read_table(spark, sf_dir, "embeddings"))
base = emb.select(F.col("vec_id"), S._double_vec().alias("v"))
n = base.select("vec_id", "v", S._norm(F.col("v")).alias("nrm"))
mod = D.ivf_centroid_mod(table_row_count(spark, sf_dir, "embeddings"))
cent = base.where(F.col("vec_id") % mod == 0).select(
    F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
)
l2 = vec.fold_sqdist(F.col("v"), F.col("cv"))
for val, tag in (("0", "before"), ("1", "after")):
    os.environ["SPARK_GRAFT_IVF_ASSIGN_AGG"] = val
    if S._ivf_assign_agg_enabled():
        assign = (
            n.crossJoin(F.broadcast(cent))
            .select("vec_id", "v", "nrm", "cent_id", l2.alias("d2"))
            .groupBy("vec_id")
            .agg(
                F.min(F.struct("d2", "cent_id")).alias("__best"),
                F.any_value("v").alias("v"),
                F.any_value("nrm").alias("nrm"),
            )
            .select(
                "vec_id", "v", "nrm", F.col("__best.cent_id").alias("cent_id")
            )
        )
    else:
        from pyspark.sql import Window

        w = Window.partitionBy("vec_id").orderBy(
            F.asc("d2"), F.asc("cent_id")
        )
        assign = (
            n.crossJoin(F.broadcast(cent))
            .select("vec_id", "v", "nrm", "cent_id", l2.alias("d2"))
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vec_id", "v", "nrm", "cent_id")
        )
    g = S._drop_hot_buckets(assign, "cent_id", D.LSH_MAX_BUCKET)
    dump(g, f"semantic_ivf_assign_stage_{tag}")

spark.stop()
