"""pyspark.ml API surface: the MLlib LSH estimators (the route SURVEY
section 2.7 names — `ml.feature.MinHashLSH`) agree with this repo's exact
operators on the same data. The engine's own dedup/ANN paths stay the
primary implementations (deterministic, oracle-checkable); these tests
prove the standard MLlib surface runs here and is consistent with them —
fixed seeds make every assertion deterministic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_meteo_datalake_spark.queries import queries

from .conftest import SF0001

QS = queries()


def test_mllib_minhash_finds_exact_high_jaccard_pairs(spark):
    """MinHashLSH candidate pairs (seeded, 8 tables) must cover every pair
    the exact prefix-filter join verifies at Jaccard >= 0.6."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    docs = (
        spark.read.parquet(f"{SF0001}/documents.parquet")
        .select(
            "doc_id",
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\r\f]+"),
                    lambda x: F.length(x) > 0,
                )
            ).alias("toks"),
        )
        .where(F.size("toks") > 0)
    )
    cv = CountVectorizer(inputCol="toks", outputCol="features", binary=True)
    model = cv.fit(docs)
    feat = model.transform(docs)
    mh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=8, seed=42
    ).fit(feat)
    cand = (
        mh.approxSimilarityJoin(feat, feat, 0.4, distCol="jd")
        .where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
        )
    )
    got = {(r.doc_a, r.doc_b) for r in cand.collect()}
    want = {
        (r.doc_a, r.doc_b)
        for r in QS["dedup_jaccard_prefix_filter"](spark, SF0001).collect()
    }
    # token-level Jaccard (MLlib) vs shingle-level (exact op) differ as
    # SIMILARITY MEASURES; shingle-similar docs here are near-identical
    # texts, which are token-similar too — the seeded LSH must find them
    assert want, "fixture should contain near-dup pairs"
    assert want <= got, f"MLlib LSH missed exact pairs: {want - got}"


def test_mllib_brp_lsh_top1_matches_exact(spark):
    """BucketedRandomProjectionLSH approxNearestNeighbors (seeded) returns
    the true euclidean top-1 for the first query vector."""
    import numpy as np
    import pandas as pd
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    emb = (
        spark.read.parquet(f"{SF0001}/embeddings.parquet")
        .select("vec_id", array_to_vector(F.col("embedding")).alias("features"))
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=1.0,
        numHashTables=6, seed=7,
    ).fit(emb)
    pdf = pd.read_parquet(f"{SF0001}/embeddings.parquet")
    mat = np.stack(pdf["embedding"].values).astype(np.float64)
    q = mat[0]
    dists = np.linalg.norm(mat - q, axis=1)
    dists[0] = np.inf  # exclude self
    exact_top1 = int(pdf["vec_id"].iloc[int(np.argmin(dists))])
    key = emb.where(F.col("vec_id") == 0).collect()[0].features
    nn = brp.approxNearestNeighbors(emb.where(F.col("vec_id") != 0), key, 1)
    got = nn.collect()[0].vec_id
    assert got == exact_top1


@pytest.mark.parametrize("k", [3])
def test_mllib_kmeans_runs_and_partitions_space(spark, k):
    """pyspark.ml KMeans (seeded) trains on the embeddings and assigns
    every vector to one of k clusters — the MLlib twin of the repo's
    deterministic kmeans_ivf_train operator."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = spark.read.parquet(f"{SF0001}/embeddings.parquet").select(
        "vec_id", array_to_vector(F.col("embedding")).alias("features")
    )
    km = KMeans(k=k, seed=11, maxIter=5).fit(emb)
    pred = km.transform(emb)
    sizes = pred.groupBy("prediction").count().collect()
    assert len(sizes) == k
    assert sum(r["count"] for r in sizes) == emb.count()
