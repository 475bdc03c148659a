#!/usr/bin/env python
"""Round-15 verdict item 2: decompose the two steepest non-output-bound
sf10 ratios — dedup_jaccard_prefix_filter (45x) and dedup_minhash_lsh
(31x) — into per-stage wall times AND per-stage cardinalities at sf0.1
vs sf10, to name the growth driver: candidate-pair inflation (bucket /
prefix load growing with corpus size) vs scan/shuffle volume.

Stages are timed CUMULATIVELY (each materializes its own lineage with a
noop write / count), so marginal stage cost = delta between successive
rows; cardinalities are exact counts of the intermediate relations.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from bigdata_meteo_datalake_spark.operators.dedup import (  # noqa: E402
    LSH_MAX_BUCKET,
    doc_shingle_hash_sets,
    jaccard_verify_sets,
    lsh_banded,
    lsh_candidate_pairs,
    minhash_signature,
    prefix_filter_candidates,
)
from bigdata_meteo_datalake_spark.operators.checkpointing import cut_lazy  # noqa: E402
from bigdata_meteo_datalake_spark.session import get_spark  # noqa: E402
from bigdata_meteo_datalake_spark.sources.lake import read_table  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF10 = "/root/repo/.scale/sf10"


def hygiene(spark):
    spark.catalog.clearCache()
    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:  # noqa: BLE001 - measurement hygiene only
        pass


def timed(fn):
    t0 = time.perf_counter()
    v = fn()
    return round(time.perf_counter() - t0, 3), v


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def profile(spark, sf_dir: str) -> dict:
    out: dict = {}
    d = read_table(spark, sf_dir, "documents")

    # --- shared stage: shingle-hash sets (pure map over the scan)
    sets = doc_shingle_hash_sets(d).transform(cut_lazy)
    out["t_sets_noop"], _ = timed(lambda: noop(sets))
    hygiene(spark)
    row = sets.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.size("xs")).alias("shingles"),
    ).first()
    out["n_docs"], out["n_shingles"] = row["docs"], row["shingles"]

    # --- prefix-filter path -------------------------------------------------
    ex = sets.select("doc_id", F.size("xs").alias("n"), F.explode("xs").alias("x"))
    out["t_explode_count"], out["n_exploded"] = timed(ex.count)
    hygiene(spark)

    pre = prefix_filter_candidates(sets, t_num=3, t_den=5)
    # pre-distinct join volume: rebuild the prefix relation and count the
    # raw join output (candidates with multiplicity) via the same code
    # path but without .distinct() — approximated here by bucket math on
    # the prefix relation: sum over prefix-hash x of na*nb pairs is what
    # the join enumerates before the length/positional filters.
    from pyspark.sql import Window

    dfreq = ex.groupBy("x").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "x")
    prefix_len = F.col("n") - F.expr("(3 * n + 4) div 5") + 1
    prefix = (
        ex.join(dfreq, "x")
        .withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= prefix_len)
        .select("doc_id", "x", "n", "pos")
        .transform(cut_lazy)
    )
    out["t_prefix_noop"], _ = timed(lambda: noop(prefix))
    hygiene(spark)
    out["n_prefix_rows"] = prefix.count()
    # prefix bucket load: rows per prefix hash -> raw self-join volume
    bl = prefix.groupBy("x").agg(F.count(F.lit(1)).alias("m"))
    row = bl.agg(
        F.max("m").alias("max_m"),
        (F.sum(F.col("m") * (F.col("m") - 1)) / 2).alias("raw_pairs"),
        F.count(F.lit(1)).alias("n_buckets"),
    ).first()
    out["prefix_max_bucket"] = row["max_m"]
    out["prefix_raw_join_pairs"] = int(row["raw_pairs"])
    out["prefix_n_buckets"] = row["n_buckets"]
    hygiene(spark)

    out["t_prefix_cand_distinct"], out["n_prefix_candidates"] = timed(pre.count)
    hygiene(spark)
    full_pf = jaccard_verify_sets(pre, sets).where(F.col("jaccard_raw") >= 0.6)
    out["t_prefix_full"], _ = timed(lambda: noop(full_pf))
    hygiene(spark)

    # --- minhash path ---------------------------------------------------------
    sig = minhash_signature(sets)
    out["t_sig_noop"], _ = timed(lambda: noop(sig))
    hygiene(spark)
    banded = lsh_banded(sig)
    bl = banded.groupBy("band_idx", "band_key").agg(F.count(F.lit(1)).alias("m"))
    row = bl.agg(
        F.max("m").alias("max_m"),
        (F.sum(F.col("m") * (F.col("m") - 1)) / 2).alias("raw_pairs"),
        (
            F.sum(
                F.when(F.col("m") <= LSH_MAX_BUCKET, F.col("m") * (F.col("m") - 1))
            ) / 2
        ).alias("kept_pairs"),
        F.count(F.lit(1)).alias("n_buckets"),
    ).first()
    out["lsh_max_bucket"] = row["max_m"]
    out["lsh_raw_join_pairs"] = int(row["raw_pairs"])
    out["lsh_kept_join_pairs"] = int(row["kept_pairs"])
    out["lsh_n_buckets"] = row["n_buckets"]
    hygiene(spark)

    cand = lsh_candidate_pairs(sig, max_bucket_size=LSH_MAX_BUCKET)
    out["t_lsh_cand_distinct"], out["n_lsh_candidates"] = timed(cand.count)
    hygiene(spark)
    full_mh = jaccard_verify_sets(cand, sets).where(F.col("jaccard_raw") >= 0.6)
    out["t_minhash_full"], _ = timed(lambda: noop(full_mh))
    hygiene(spark)
    return out


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("profile-dedup15", cpus=cpus, shuffle_partitions=cpus)
    res = {}
    for label, sf_dir in (("sf0.1", SF01), ("sf10", SF10)):
        # warm-up pass at the smallest SF for JIT parity
        profile(spark, "/root/testdata/sf0.001")
        res[label] = profile(spark, sf_dir)
        print(label, json.dumps(res[label]), flush=True)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
