"""Threshold sensitivity of the grouped positional filter: candidate
counts under the OLD per-first-element filter vs the NEW pair-level
bound, at t=3/5 (the registered query) and t=1/2, sf0.1 documents."""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import Window
from pyspark.sql import functions as F
from bigdata_meteo_datalake_spark.operators.checkpointing import cut_lazy
from bigdata_meteo_datalake_spark.operators.dedup import doc_shingle_hash_sets
from bigdata_meteo_datalake_spark.session import get_spark
from bigdata_meteo_datalake_spark.sources.lake import read_table

spark = get_spark("ppjoin-threshold16", cpus=32, shuffle_partitions=32)
d = read_table(spark, "/root/testdata/sf0.1", "documents")
sets = doc_shingle_hash_sets(d).transform(cut_lazy)

for t_num, t_den in ((3, 5), (1, 2)):
    ex = sets.select("doc_id", F.size("xs").alias("n"), F.explode("xs").alias("x"))
    dfreq = ex.groupBy("x").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "x")
    plen = F.col("n") - F.expr(f"({t_num} * n + {t_den - 1}) div {t_den}") + 1
    prefix = (ex.join(dfreq, "x").withColumn("pos", F.row_number().over(w))
              .where(F.col("pos") <= plen).select("doc_id", "x", "n", "pos")
              .transform(cut_lazy))
    a, b = prefix.alias("a"), prefix.alias("b")
    joined = a.join(
        b,
        (F.col("a.x") == F.col("b.x")) & (F.col("a.doc_id") < F.col("b.doc_id"))
        & (F.col("a.n") * t_num <= F.col("b.n") * t_den)
        & (F.col("b.n") * t_num <= F.col("a.n") * t_den),
    )
    o_min_row = F.expr(f"({t_num} * (a.n + b.n) + {t_num + t_den} - 1) div {t_num + t_den}")
    ub_row = F.lit(1) + F.least(F.col("a.n") - F.col("a.pos"), F.col("b.n") - F.col("b.pos"))
    old = joined.where(ub_row >= o_min_row).select("a.doc_id", "b.doc_id").distinct().count()
    g = joined.groupBy(
        F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"),
        F.col("a.n").alias("na"), F.col("b.n").alias("nb"),
    ).agg(F.count(F.lit(1)).alias("c"),
          F.max("a.pos").alias("pa"), F.max("b.pos").alias("pb"))
    o_min = F.expr(f"({t_num} * (na + nb) + {t_num + t_den} - 1) div {t_num + t_den}")
    new = g.where(F.col("c") + F.least(F.col("na") - F.col("pa"), F.col("nb") - F.col("pb")) >= o_min).count()
    print(f"t={t_num}/{t_den}: old(per-first-element)={old}  new(grouped)={new}  "
          f"reduction={100 * (old - new) / old:.1f}%", flush=True)
