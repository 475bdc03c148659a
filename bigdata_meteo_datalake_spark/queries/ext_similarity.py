"""Similarity-search extension queries over ``embeddings``
(SURVEY.md section 2.7 — ANN over an array<float> column, Spark-first).

Brute-force cosine top-k is the correctness baseline: broadcast the query
set against a full scan of the corpus — at 100 TB the corpus side stays
partitioned and never shuffles; cost is queries x corpus dot products, all
inside codegen'd higher-order functions (zip_with/aggregate), no Python.

The scale path (LSH-bucketed variant) lives in operators/similarity.py:
random-hyperplane signatures computed from deterministic plane constants,
bucket equi-join instead of a cross product.

Float discipline for the oracle: elements cast to double FIRST, then a
sequential left-fold dot product — both engines fold in list order, so the
doubles are bit-identical; scores rounded to 4 decimals for rank stability.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.numeric import round_half_up
from ..sources.lake import read_table
from . import register

_N_QUERIES = 20  # vec_id < 20 form the query set
_TOP_K = 5

_KNN_ORACLE = f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS double)) AS v
  FROM embeddings
),
n AS (
  SELECT vec_id, v,
         sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS nrm
  FROM e
),
scored AS (
  SELECT q.vec_id AS query_id,
         c.vec_id AS neighbor_id,
         floor(list_aggregate(list_transform(list_zip(q.v, c.v),
                                             p -> p[1] * p[2]), 'sum')
               / (q.nrm * c.nrm) * 10000 + 0.5) / 10000 AS cosine
  FROM n q, n c
  WHERE q.vec_id < {_N_QUERIES} AND q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cosine
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
  FROM scored
) WHERE rn <= {_TOP_K}
"""


@register("knn_cosine_bruteforce", oracle=_KNN_ORACLE, tags=("extension", "similarity", "bench"))
def knn_cosine_bruteforce(spark, sf_dir):
    """Brute-force cosine top-k: query set (vec_id < 20) broadcast against
    the corpus; dot product via zip_with + sequential aggregate fold (same
    fold order as the oracle); top-k per query via one window."""
    emb = read_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    base = emb.select(F.col("vec_id"), v.alias("v"), norm.alias("nrm"))
    q = base.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    c = base.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            round_half_up(dot / (F.col("qn") * F.col("cn")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _TOP_K)
        .select("query_id", "neighbor_id", "cosine")
    )
