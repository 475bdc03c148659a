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

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions import vec
from ..functions.numeric import round_half_up
from ..operators.dedup import widen
from ..sources.lake import read_table
from . import register
from ..operators.checkpointing import cut_lazy

_N_QUERIES = 20  # vec_id < 20 form the query set
_TOP_K = 5


def _double_vec():
    """embedding (array<float>) cast element-wise to double."""
    return F.transform(F.col("embedding"), lambda x: x.cast("double"))


def _norm(v):
    return F.sqrt(vec.fold_sum_sq(v))


def _dot(a, b):
    """Sequential left-fold dot product — same fold order as the oracle's
    list_aggregate, hence bit-identical doubles. Stays on the general
    fold at this 64-dim size: the round-16 unrolled-kernel experiment
    (functions/vec.py) measured dim-64 unrolling SLOWER in every real
    query (knn 0.64 -> 1.13 s stable), see OPTIMIZATION_r16.md."""
    return vec.fold_dot(a, b)


def _guard_agg_enabled() -> bool:
    """A/B lever (round-17) for the hot-bucket guard's shape, read at
    plan build time — DEFAULT OFF: the aggregate+broadcast-anti-join
    form (count buckets on a metadata shuffle, drop members of hot
    buckets without moving the payload) MEASURED SLOWER at both scales
    on semantic_dedup_lsh (sf0.1 min 4.80 window vs 4.99 agg; sf10
    12.96 vs 15.61 — .round17/ab_guard_sem_sf{01,10}.out, result sets
    exactly equal). Why: the anti-join duplicates the bucket-signature
    subtree (the n_planes x 64-dim dot per vector) into the count
    branch AND both join sides, while the window form computes the
    signature once and its bucket exchange is reused for the count,
    the probe side and the broadcast build. The window's payload
    shuffle is cheaper than recomputing the signature — kept as the
    recorded negative result (guide §1: a fresh 'ideal' plan is often
    slower because of a gotcha; here the gotcha is subtree reuse)."""
    import os

    return os.environ.get("SPARK_GRAFT_LSH_GUARD_AGG", "0").lower() not in (
        "0", "false", "no",
    )


def _drop_hot_buckets(df, key: str, limit: int):
    """Rows of ``df`` whose ``key`` group has at most ``limit`` members —
    the guard semantics of `QUALIFY count(*) OVER (PARTITION BY key) <=
    limit`, including the null group (eqNullSafe matches the window's
    treatment of a null key as one countable partition)."""
    if _guard_agg_enabled():
        hot = (
            df.groupBy(key)
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > limit)
            .select(F.col(key).alias("__hot_key"))
        )
        return df.join(
            F.broadcast(hot),
            F.col(key).eqNullSafe(F.col("__hot_key")),
            "left_anti",
        )
    w = Window.partitionBy(key)
    return (
        df.withColumn("__n", F.count(F.lit(1)).over(w))
        .where(F.col("__n") <= limit)
        .drop("__n")
    )


def _ivf_assign_agg_enabled() -> bool:
    """A/B lever (round-17): nearest-centroid assignment as a
    map-side-combined min(struct) aggregate instead of a row_number
    window over the broadcast crossJoin product (which shuffles
    n x n_centroids rows carrying the full vector). Read at plan build
    time."""
    import os

    return os.environ.get("SPARK_GRAFT_IVF_ASSIGN_AGG", "1").lower() not in (
        "0", "false", "no",
    )


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
    emb = widen(read_table(spark, sf_dir, "embeddings"))
    v = _double_vec()
    base = emb.select(F.col("vec_id"), v.alias("v"), _norm(v).alias("nrm"))
    q = base.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    c = base.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    dot = _dot(F.col("qv"), F.col("cv"))
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


# --- embedding-cosine near-dup pairs ---------------------------------------------

_NEAR_DUP_THRESHOLD = 0.35
_NEAR_DUP_MAX_ID = 1000  # bound the all-pairs cost at higher scale factors

_NEAR_DUP_ORACLE = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS double)) AS v
  FROM embeddings WHERE vec_id < {_NEAR_DUP_MAX_ID}
),
n AS (
  SELECT vec_id, v,
         sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS nrm
  FROM e
),
p AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         list_aggregate(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]), 'sum')
           / (a.nrm * b.nrm) AS cos_raw
  FROM n a, n b WHERE a.vec_id < b.vec_id
),
cov AS (
  SELECT cast(sum(CASE WHEN vec_id < {_NEAR_DUP_MAX_ID} THEN 1 ELSE 0 END)
              AS bigint) AS n_vecs_covered,
         cast(count(*) AS bigint) AS n_vecs_total
  FROM embeddings
)
SELECT vec_a, vec_b, floor(cos_raw * 10000 + 0.5) / 10000 AS cosine,
       n_vecs_covered, n_vecs_total
FROM p, cov WHERE cos_raw >= {_NEAR_DUP_THRESHOLD}
"""


@register("embedding_near_dup_pairs", oracle=_NEAR_DUP_ORACLE, tags=("extension", "dedup", "similarity"))
def embedding_near_dup_pairs(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (the semantic-dedup operator):
    all-pairs cosine >= threshold over a bounded id range. The quadratic
    form is the correctness baseline; emb_lsh_topk below is the scale path.

    No silent caps: the vec_id < {cap} bound covers a shrinking corpus
    fraction at larger SFs, so every emitted pair carries the coverage as
    (n_vecs_covered, n_vecs_total) columns — a consumer can see exactly how
    much of the corpus the quadratic baseline scanned."""
    emb_all = read_table(spark, sf_dir, "embeddings")
    cover = emb_all.agg(
        F.sum(
            F.when(F.col("vec_id") < _NEAR_DUP_MAX_ID, 1).otherwise(0)
        ).cast("long").alias("n_vecs_covered"),
        F.count(F.lit(1)).alias("n_vecs_total"),
    )
    emb = widen(emb_all.where(F.col("vec_id") < _NEAR_DUP_MAX_ID))
    v = _double_vec()
    base = emb.select(F.col("vec_id"), v.alias("v"), _norm(v).alias("nrm"))
    a = base.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    b = base.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    cos_raw = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.crossJoin(b)
        .where(F.col("vec_a") < F.col("vec_b"))
        .where(cos_raw >= _NEAR_DUP_THRESHOLD)
        .select("vec_a", "vec_b", round_half_up(cos_raw, 4).alias("cosine"))
        .crossJoin(F.broadcast(cover))
    )


# --- LSH-bucketed ANN (the scale path) ---------------------------------------------

_DIM = 64


def _plane(j: int) -> list[float]:
    """Deterministic pseudo-random hyperplane shared with the oracle
    (computed once in python, inlined as LITERALS into both the Spark
    plan and the DuckDB SQL — nothing engine-specific): md5 over
    (j, i) mapped to [-1, 1). md5, not the previous affine-LCG form —
    that one made every plane the same arithmetic progression mod 2001
    at a shifted phase, so the sign bits correlated and bucket loads
    skewed ~3x above fair (hot-bucket-guard coverage 0.63 instead of
    1.0 on a 4096-vector gaussian corpus; see
    tests/test_round12_props.py)."""
    import hashlib

    out = []
    for i in range(_DIM):
        h = int.from_bytes(
            hashlib.md5(f"plane:{j}:{i}".encode()).digest()[:4], "big"
        )
        out.append((h % 2001 - 1000) / 1000.0)
    return out


def _max_planes() -> int:
    from ..operators.dedup import LSH_MAX_PLANES

    return LSH_MAX_PLANES


_PLANES = [_plane(j) for j in range(_max_planes())]

#: the DuckDB expression computing the corpus-derived plane count the
#: Spark side computes via operators.dedup.lsh_n_planes over the parquet
#: footer-stat row count (sources.lake.table_row_count) — both exact
#: integer arithmetic, single-sourced in operators/dedup.py
def _n_planes_cte() -> str:
    from ..operators.dedup import lsh_n_planes_sql

    return (
        "np AS (SELECT "
        + lsh_n_planes_sql("SELECT count(*) FROM embeddings")
        + " AS n_planes)"
    )


def _bucket_sql(n_planes_ref: str = "np.n_planes") -> str:
    """The sign-signature bucket as a DuckDB expression over a column
    named ``v`` (shared by the LSH top-k and semantic-dedup oracles).
    Every one of the LSH_MAX_PLANES plane terms is gated on the
    corpus-derived plane count ``n_planes_ref`` (a column from the
    ``np`` CTE), mirroring the Spark side's plan-time derivation — the
    bucket space GROWS with the corpus instead of saturating at a
    fixed 256 buckets (the round-11 verdict's recall-collapse defect)."""
    bucket_terms = []
    for j, plane in enumerate(_PLANES):
        lit = "[" + ", ".join(repr(x) for x in plane) + "]::DOUBLE[]"
        bucket_terms.append(
            f"(CASE WHEN {j} < {n_planes_ref} AND "
            f"list_aggregate(list_transform(list_zip(v, {lit}),"
            f" p -> p[1] * p[2]), 'sum') > 0 THEN {1 << j} ELSE 0 END)"
        )
    return " + ".join(bucket_terms)


def _bucket_col(n_planes: int):
    """The bucket signature as a Spark Column over a column ``v``,
    built from exactly ``n_planes`` planes (derived from the corpus
    row count at plan time — a bounded control-plane action, the same
    class as the rollup prune planner's partition-key read)."""
    bucket = None
    for plane_idx in range(n_planes):
        plane_lit = F.array(*[F.lit(x) for x in _PLANES[plane_idx]])
        # per-ROW signature over the derived vector expression: general
        # fold, NOT the unrolled kernel (vec.fold_dot's collapse-safety
        # note — unrolling here multiplied the inlined transform by the
        # term count and tripled the query wall)
        term = F.when(vec.fold_dot(F.col("v"), plane_lit) > 0,
                      F.lit(1 << plane_idx)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    return bucket.cast("long")


def _lsh_oracle() -> str:
    bucket = _bucket_sql()
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS double)) AS v
  FROM embeddings
),
{_n_planes_cte()},
n AS (
  SELECT vec_id, v,
         sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS nrm,
         cast({bucket} AS bigint) AS bucket
  FROM e, np
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.bucket AS bucket,
         floor(list_aggregate(list_transform(list_zip(q.v, c.v), p -> p[1] * p[2]), 'sum')
               / (q.nrm * c.nrm) * 10000 + 0.5) / 10000 AS cosine
  FROM n q JOIN n c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
  WHERE q.vec_id < {_N_QUERIES}
)
SELECT query_id, neighbor_id, bucket, cosine
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
  FROM scored
) WHERE rn <= {_TOP_K}
"""


@register("emb_lsh_topk", oracle=_lsh_oracle(), tags=("extension", "similarity", "lsh"))
def emb_lsh_topk(spark, sf_dir):
    """ANN scale path: random-hyperplane LSH — deterministic LCG planes
    give a sign-signature bucket; candidates are an equi-join on the
    bucket instead of a cross product (quadratic -> ~quadratic/2^planes
    at uniform load). The plane count is DERIVED FROM THE CORPUS SIZE
    (operators.dedup.lsh_n_planes, targeting ~16 vectors/bucket, capped
    at 26 planes = 67M buckets) so the bucket space scales with the
    data instead of saturating — the sizing count comes from parquet
    FOOTER stats (sources.lake.table_row_count: the catalog statistic,
    zero Spark jobs — round-12 advice), and the oracle recomputes the
    same plane count from COUNT(*) in exact integer arithmetic."""
    from ..operators.dedup import lsh_n_planes
    from ..sources.lake import table_row_count

    emb = widen(read_table(spark, sf_dir, "embeddings"))
    n_planes = lsh_n_planes(table_row_count(spark, sf_dir, "embeddings"))
    base = emb.select(F.col("vec_id"), _double_vec().alias("v"))
    base = base.select(
        "vec_id", "v", _norm(F.col("v")).alias("nrm"),
        _bucket_col(n_planes).alias("bucket"),
    )
    q = base.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.col("bucket"),
    )
    c = base.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
        F.col("bucket").alias("cbucket"),
    )
    dot = _dot(F.col("qv"), F.col("cv"))
    scored = (
        q.join(c, (F.col("bucket") == F.col("cbucket")) & (F.col("query_id") != F.col("neighbor_id")))
        .select(
            "query_id",
            "neighbor_id",
            "bucket",
            round_half_up(dot / (F.col("qn") * F.col("cn")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _TOP_K)
        .select("query_id", "neighbor_id", "bucket", "cosine")
    )


# --- IVF (inverted-file) ANN: coarse quantizer + probed cells -----------------------

#: the deterministic codebook modulus: sized from the corpus so the
#: CENTROID COUNT stays ~constant (operators.dedup.ivf_centroid_mod,
#: floor 23 == the historical small-corpus rule, unchanged at the
#: driver's test SFs) — a fixed sampling rate made centroid count grow
#: with the corpus and the assignment quadratic (round-13, 26 s sf1)
def _ivf_mod_sql() -> str:
    from ..operators.dedup import ivf_centroid_mod_sql

    return ("(SELECT " + ivf_centroid_mod_sql("count(*)")
            + " FROM embeddings)")
_IVF_NPROBE = 2


def _ivf_oracle() -> str:
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS double)) AS v
  FROM embeddings
),
n AS (
  SELECT vec_id, v,
         sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS nrm
  FROM e
),
cent AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id % {_ivf_mod_sql()} = 0),
-- assign every vector to its nearest centroid (L2; ties -> lower cent_id)
assign AS (
  SELECT vec_id, cent_id FROM (
    SELECT n.vec_id, c.cent_id,
           row_number() OVER (
             PARTITION BY n.vec_id
             ORDER BY list_aggregate(list_transform(list_zip(n.v, c.cv),
                                     p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'),
                      c.cent_id) AS rn
    FROM n, cent c
  ) WHERE rn = 1
),
-- each query probes its {_IVF_NPROBE} nearest cells
probes AS (
  SELECT vec_id AS query_id, cent_id FROM (
    SELECT n.vec_id, c.cent_id,
           row_number() OVER (
             PARTITION BY n.vec_id
             ORDER BY list_aggregate(list_transform(list_zip(n.v, c.cv),
                                     p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'),
                      c.cent_id) AS rn
    FROM n, cent c
  ) WHERE rn <= {_IVF_NPROBE}
),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         floor(list_aggregate(list_transform(list_zip(q.v, t.v), z -> z[1] * z[2]), 'sum')
               / (q.nrm * t.nrm) * 10000 + 0.5) / 10000 AS cosine
  FROM probes p
  JOIN assign a ON a.cent_id = p.cent_id
  JOIN n q ON q.vec_id = p.query_id
  JOIN n t ON t.vec_id = a.vec_id
  WHERE p.query_id < {_N_QUERIES} AND a.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, cosine
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
  FROM scored
) WHERE rn <= {_TOP_K}
"""


@register("emb_ivf_topk", oracle=_ivf_oracle(), tags=("extension", "similarity", "ivf"))
def emb_ivf_topk(spark, sf_dir):
    """IVF ANN: a coarse quantizer (deterministic centroid sample, nearest-
    centroid assignment) partitions the corpus into cells; queries probe
    their nprobe=2 nearest cells only. At scale the assignment is one
    broadcast of the centroid table and the probe is an equi-join on
    cent_id — the classic inverted-file layout on a lake."""
    emb = widen(read_table(spark, sf_dir, "embeddings"))
    base = emb.select(F.col("vec_id"), _double_vec().alias("v"))
    norm = _norm(F.col("v"))
    n = base.select("vec_id", "v", norm.alias("nrm"))
    from ..operators.dedup import ivf_centroid_mod
    from ..sources.lake import table_row_count

    mod = ivf_centroid_mod(table_row_count(spark, sf_dir, "embeddings"))
    cent = base.where(F.col("vec_id") % mod == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )
    # squared-L2 fold (distinct from _dot: different element combiner)
    l2 = vec.fold_sqdist(F.col("v"), F.col("cv"))
    ranked = n.crossJoin(F.broadcast(cent)).select(
        "vec_id", "cent_id", l2.alias("d2")
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("cent_id"))
    ranked = ranked.withColumn("rn", F.row_number().over(w))
    assign = ranked.where(F.col("rn") == 1).select("vec_id", "cent_id")
    probes = ranked.where(
        (F.col("rn") <= _IVF_NPROBE) & (F.col("vec_id") < _N_QUERIES)
    ).select(F.col("vec_id").alias("query_id"), "cent_id")

    q = n.select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    t = n.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("tv"), F.col("nrm").alias("tn")
    )
    cand = (
        probes.join(assign.withColumnRenamed("vec_id", "neighbor_id"), "cent_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    dot = _dot(F.col("qv"), F.col("tv"))
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(t, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            round_half_up(dot / (F.col("qn") * F.col("tn")), 4).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= _TOP_K)
        .select("query_id", "neighbor_id", "cosine")
    )


# --- ANN quality evaluation: recall@k vs brute force --------------------------------


# --- product quantization constants + oracle (operator defined at file end) ---------

_PQ_M = 16  # subspaces; embedding dim 64 -> 4 dims each
_PQ_SUB = 4
_PQ_CMOD = 16  # sub-codebook = subvectors of vec_id % 16 == 0, vec_id < 512
_PQ_NCENT = 32  # ... giving 32 centroids per subspace, fixed across SFs
_PQ_TOPK = 5

_PQ_DIST_SQL = (
    "list_aggregate(list_transform(list_zip({a}, {b}),"
    " p -> (p[1]-p[2])*(p[1]-p[2])), 'sum')"
)

_PQ_ORACLE = f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> cast(floor(cast(x AS double) * 1000 + 0.5) AS bigint))
           AS v
  FROM embeddings
),
ms AS (SELECT unnest([{", ".join(str(i) for i in range(_PQ_M))}]) AS m),
sub AS (
  SELECT vec_id, m,
         array_slice(v, m * {_PQ_SUB} + 1, m * {_PQ_SUB} + {_PQ_SUB}) AS sv
  FROM e CROSS JOIN ms
),
cent AS (
  SELECT vec_id // {_PQ_CMOD} AS crank, m, sv AS cv
  FROM sub WHERE vec_id % {_PQ_CMOD} = 0 AND vec_id < {_PQ_CMOD * _PQ_NCENT}
),
codes AS (
  SELECT s.vec_id, s.m,
         min({_PQ_DIST_SQL.format(a="s.sv", b="c.cv")} * {_PQ_NCENT} + c.crank)
           % {_PQ_NCENT} AS code
  FROM sub s JOIN cent c USING (m)
  GROUP BY s.vec_id, s.m
),
lut AS (
  SELECT q.vec_id AS query_id, c.m, c.crank,
         {_PQ_DIST_SQL.format(a="q.sv", b="c.cv")} AS qd
  FROM sub q JOIN cent c USING (m)
  WHERE q.vec_id < {_N_QUERIES}
),
adc AS (
  SELECT l.query_id, k.vec_id AS neighbor_id,
         cast(sum(l.qd) AS bigint) AS adc_dist
  FROM codes k JOIN lut l ON l.m = k.m AND l.crank = k.code
  WHERE k.vec_id <> l.query_id
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, adc_dist
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rn
  FROM adc
) WHERE rn <= {_PQ_TOPK}
"""


def _recall_oracle() -> str:
    return f"""
WITH bf AS ({_KNN_ORACLE}),
lsh AS ({_lsh_oracle()}),
ivf AS ({_ivf_oracle()}),
pq AS ({_PQ_ORACLE})
SELECT b.query_id,
       cast(count(l.neighbor_id) AS bigint) AS n_lsh_hits,
       cast(count(i.neighbor_id) AS bigint) AS n_ivf_hits,
       cast(count(p.neighbor_id) AS bigint) AS n_pq_hits,
       floor(count(l.neighbor_id) / cast({_TOP_K} AS double) * 10000 + 0.5) / 10000
         AS recall_lsh,
       floor(count(i.neighbor_id) / cast({_TOP_K} AS double) * 10000 + 0.5) / 10000
         AS recall_ivf,
       floor(count(p.neighbor_id) / cast({_TOP_K} AS double) * 10000 + 0.5) / 10000
         AS recall_pq
FROM bf b
LEFT JOIN lsh l ON l.query_id = b.query_id AND l.neighbor_id = b.neighbor_id
LEFT JOIN ivf i ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
LEFT JOIN pq p ON p.query_id = b.query_id AND p.neighbor_id = b.neighbor_id
GROUP BY b.query_id
"""


@register("ann_recall_report", oracle=_recall_oracle(), tags=("extension", "similarity", "eval"))
def ann_recall_report(spark, sf_dir):
    """ANN quality evaluation: per-query recall@k of the LSH, IVF, and PQ
    paths against the brute-force ground truth — the acceptance gate every
    approximate index needs before replacing the exact path in a pipeline.
    (PQ recall is measured against the COSINE ground truth like the other
    two, even though ADC ranks by euclidean distance on the quantized
    grid — the report shows what a consumer of the exact path would lose.)
    Composes the four registered operators; the top-k sets are tiny
    (queries x k rows), so the comparison joins broadcast and the cost is
    the underlying searches themselves."""
    bf = knn_cosine_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    lsh = (
        emb_lsh_topk(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("h_lsh", F.lit(1))
    )
    ivf = (
        emb_ivf_topk(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("h_ivf", F.lit(1))
    )
    pq = (
        pq_ann_topk(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("h_pq", F.lit(1))
    )
    joined = (
        bf.join(F.broadcast(lsh), ["query_id", "neighbor_id"], "left")
        .join(F.broadcast(ivf), ["query_id", "neighbor_id"], "left")
        .join(F.broadcast(pq), ["query_id", "neighbor_id"], "left")
    )
    n_lsh = F.sum(F.coalesce(F.col("h_lsh"), F.lit(0))).cast("long")
    n_ivf = F.sum(F.coalesce(F.col("h_ivf"), F.lit(0))).cast("long")
    n_pq = F.sum(F.coalesce(F.col("h_pq"), F.lit(0))).cast("long")
    return joined.groupBy("query_id").agg(
        n_lsh.alias("n_lsh_hits"),
        n_ivf.alias("n_ivf_hits"),
        n_pq.alias("n_pq_hits"),
        round_half_up(n_lsh.cast("double") / _TOP_K, 4).alias("recall_lsh"),
        round_half_up(n_ivf.cast("double") / _TOP_K, 4).alias("recall_ivf"),
        round_half_up(n_pq.cast("double") / _TOP_K, 4).alias("recall_pq"),
    )


# --- k-means training for the IVF coarse quantizer ----------------------------------

_KM_K_MOD = 64  # vec_id % 64 == 0 -> 8 deterministic seed centroids
_KM_SCALE = 1_000_000_000  # 1e-9 component grid: int64 sums stay exact


def _km_assign_sql(points: str, cents: str) -> str:
    """Nearest-centroid assignment CTE body (L2, ties -> lower cent_id)."""
    return f"""
  SELECT vec_id, cent_id FROM (
    SELECT p.vec_id, c.cent_id,
           row_number() OVER (
             PARTITION BY p.vec_id
             ORDER BY list_aggregate(list_transform(list_zip(p.v, c.cv),
                                     z -> (z[1]-z[2])*(z[1]-z[2])), 'sum'),
                      c.cent_id) AS rn
    FROM {points} p, {cents} c
  ) WHERE rn = 1"""


def _km_update_sql(assign: str) -> str:
    """Centroid-update CTE body: exact int64 component sums -> one double
    division -> re-quantize to the grid -> rebuild the list in dim order."""
    return f"""
  SELECT cent_id, list(comp ORDER BY dim) AS cv FROM (
    SELECT a.cent_id, d.dim,
           cast(floor(cast(cast(sum(cast(floor(e.v[d.dim] * {_KM_SCALE} + 0.5)
                                        AS bigint)) AS bigint) AS double)
                      / count(*) + 0.5) AS bigint) / {_KM_SCALE}.0 AS comp
    FROM {assign} a JOIN e ON e.vec_id = a.vec_id CROSS JOIN dims d
    GROUP BY a.cent_id, d.dim
  ) GROUP BY cent_id"""


_KMEANS_ORACLE = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS double)) AS v
  FROM embeddings
),
dims AS (SELECT unnest(range(1, 65)) AS dim),
c0 AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id % {_KM_K_MOD} = 0),
a1 AS ({_km_assign_sql("e", "c0")}),
c1 AS ({_km_update_sql("a1")}),
a2 AS ({_km_assign_sql("e", "c1")}),
c2 AS ({_km_update_sql("a2")}),
a3 AS ({_km_assign_sql("e", "c2")}),
sizes AS (SELECT cent_id, cast(count(*) AS bigint) AS n_members FROM a3 GROUP BY cent_id)
SELECT c.cent_id, s.n_members, d.dim, c.cv[d.dim] AS comp
FROM c2 c JOIN sizes s ON s.cent_id = c.cent_id CROSS JOIN dims d
"""


@register(
    "kmeans_ivf_train",
    oracle=_KMEANS_ORACLE,
    tags=("extension", "similarity", "iterative"),
)
def kmeans_ivf_train(spark, sf_dir):
    """Lloyd's k-means (2 unrolled iterations, deterministic seeds) — the
    trainer for emb_ivf_topk's coarse quantizer, run as a distributed
    iterative algorithm. Per iteration: assignment is a broadcast of the
    k-row centroid table probed map-side (argmin L2 via an in-row fold,
    ties to the lower cent_id); the update shuffles quantized int64
    components once on (cent_id, dim) — sums are exact and order-free, the
    mean is one double division re-quantized to the 1e-9 grid, and the
    centroid vector is rebuilt with a deterministic struct sort. The same
    quantize-to-integers trick that makes PageRank hash-checkable makes an
    iterative ML trainer exact against the unrolled-CTE oracle. At 100 TB:
    k centroids always broadcast; the only corpus-sized exchange per
    iteration is the (cent_id, dim)-keyed partial-aggregated update."""
    emb = widen(read_table(spark, sf_dir, "embeddings"))
    e = emb.select("vec_id", _double_vec().alias("v"))

    def assign(cents):
        d2 = vec.fold_sqdist(F.col("v"), F.col("cv"))
        ranked = e.crossJoin(F.broadcast(cents)).select(
            "vec_id", "cent_id", d2.alias("d2")
        )
        w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("cent_id"))
        return (
            ranked.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vec_id", "cent_id")
        )

    def update(assigned):
        comps = (
            assigned.join(e, "vec_id")
            .select("cent_id", F.posexplode("v").alias("pos", "val"))
            .select(
                "cent_id",
                (F.col("pos") + 1).alias("dim"),
                F.floor(F.col("val") * _KM_SCALE + 0.5).cast("long").alias("q"),
            )
            .groupBy("cent_id", "dim")
            .agg(
                (
                    F.floor(
                        F.sum("q").cast("double") / F.count(F.lit(1)) + 0.5
                    ).cast("long")
                    / float(_KM_SCALE)
                ).alias("comp")
            )
        )
        return comps.groupBy("cent_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "comp"))),
                lambda s: s.comp,
            ).alias("cv")
        )

    c0 = e.where(F.col("vec_id") % _KM_K_MOD == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )
    c2 = update(assign(update(assign(c0))))
    sizes = assign(c2).groupBy("cent_id").agg(F.count(F.lit(1)).alias("n_members"))
    return (
        c2.join(sizes, "cent_id")
        .select(
            "cent_id",
            "n_members",
            F.posexplode("cv").alias("pos", "comp"),
        )
        .select("cent_id", "n_members", (F.col("pos") + 1).alias("dim"), "comp")
    )


# --- semantic dedup (SemDeDup-style): near-dup pair graph -> clusters -> survivors --

_SEMANTIC_ORACLE = f"""
WITH RECURSIVE e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS double)) AS v
  FROM embeddings WHERE vec_id < {_NEAR_DUP_MAX_ID}
),
n AS (
  SELECT vec_id, v,
         sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS nrm
  FROM e
),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM n a, n b
  WHERE a.vec_id < b.vec_id
    AND list_aggregate(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]),
                       'sum') / (a.nrm * b.nrm) >= {_NEAR_DUP_THRESHOLD}
),
sym AS (
  SELECT vec_a AS s, vec_b AS d FROM pairs
  UNION
  SELECT vec_b, vec_a FROM pairs
),
reach(node, target) AS (
  SELECT s, s FROM sym
  UNION
  SELECT r.node, y.d FROM reach r JOIN sym y ON y.s = r.target
),
cc AS (
  SELECT node, min(target) AS rep FROM reach GROUP BY node
)
SELECT emb.vec_id,
       coalesce(cc.rep, emb.vec_id) AS cluster_rep,
       (coalesce(cc.rep, emb.vec_id) = emb.vec_id) AS is_survivor
FROM (SELECT vec_id FROM embeddings WHERE vec_id < {_NEAR_DUP_MAX_ID}) emb
LEFT JOIN cc ON cc.node = emb.vec_id
"""


@register(
    "semantic_dedup_survivors",
    oracle=_SEMANTIC_ORACLE,
    tags=("extension", "dedup", "similarity", "iterative"),
)
def semantic_dedup_survivors(spark, sf_dir):
    """Semantic dedup, SemDeDup-style end-to-end: embedding-cosine
    near-dup pairs -> connected components over the pair graph (two-phase
    star contraction, the O(log^2 n) operator) -> keep one representative
    (the minimum vec_id) per semantic cluster. Output: every covered
    vector with its cluster rep and survivor flag.

    This composes the correctness-baseline pair generator with the
    scale-path graph operator; at 100 TB the pair stage swaps to the LSH /
    IVF bucketed generators (emb_lsh_topk / ivf_topk below) with the rest
    of the pipeline unchanged — the composition, not the bounded pair
    scan, is what this query locks down. Oracle: recursive-CTE transitive
    closure."""
    from ..operators.dedup import connected_components_two_phase

    emb = widen(
        read_table(spark, sf_dir, "embeddings").where(
            F.col("vec_id") < _NEAR_DUP_MAX_ID
        )
    )
    v = _double_vec()
    base = emb.select(F.col("vec_id"), v.alias("v"), _norm(v).alias("nrm"))
    a = base.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    b = base.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    cos_raw = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    pairs = (
        a.crossJoin(b)
        .where(F.col("vec_a") < F.col("vec_b"))
        .where(cos_raw >= _NEAR_DUP_THRESHOLD)
        .select("vec_a", "vec_b")
    )
    cc = connected_components_two_phase(
        pairs, src_col="vec_a", dst_col="vec_b"
    ).withColumnRenamed("node", "vec_id")
    return (
        emb.select("vec_id")
        .join(cc, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("cluster_rep", F.col("vec_id")).alias("cluster_rep"),
            (F.coalesce("cluster_rep", F.col("vec_id")) == F.col("vec_id")).alias(
                "is_survivor"
            ),
        )
    )


# --- semantic dedup, bucketed pair generator (the 100 TB form) ----------------------


def _semantic_lsh_oracle() -> str:
    from ..operators.dedup import LSH_MAX_BUCKET

    return f"""
WITH RECURSIVE e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS double)) AS v
  FROM embeddings
),
{_n_planes_cte()},
n AS (
  SELECT vec_id, v,
         sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS nrm,
         cast({_bucket_sql()} AS bigint) AS bucket
  FROM e, np
),
g AS (
  SELECT * FROM n
  QUALIFY count(*) OVER (PARTITION BY bucket) <= {LSH_MAX_BUCKET}
),
pairs AS (
  SELECT a.vec_id AS s0, b.vec_id AS d0
  FROM g a JOIN g b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE list_aggregate(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]),
                       'sum') / (a.nrm * b.nrm) >= {_NEAR_DUP_THRESHOLD}
),
sym AS (
  SELECT s0 AS s, d0 AS d FROM pairs
  UNION
  SELECT d0, s0 FROM pairs
),
reach(node, target) AS (
  SELECT s, s FROM sym
  UNION
  SELECT r.node, y.d FROM reach r JOIN sym y ON y.s = r.target
),
cc AS (
  SELECT node, min(target) AS rep FROM reach GROUP BY node
)
SELECT emb.vec_id,
       coalesce(cc.rep, emb.vec_id) AS cluster_rep,
       (coalesce(cc.rep, emb.vec_id) = emb.vec_id) AS is_survivor
FROM (SELECT vec_id FROM embeddings) emb
LEFT JOIN cc ON cc.node = emb.vec_id
"""


@register(
    "semantic_dedup_lsh",
    oracle=_semantic_lsh_oracle(),
    tags=("extension", "dedup", "similarity", "lsh", "iterative"),
)
def semantic_dedup_lsh(spark, sf_dir):
    """Semantic dedup with the BUCKETED pair generator — the form that
    runs at 100 TB, over the FULL embeddings table (no vec_id cap):
    random-hyperplane LSH buckets (the corpus-size-derived sign
    signature shared with emb_lsh_topk — plane count from
    operators.dedup.lsh_n_planes, so the bucket space grows with the
    data and the guard below stays the exception instead of silently
    dropping recall at scale) -> hot-bucket guard (> LSH_MAX_BUCKET
    members dropped, mirrored in the oracle so the guard's SEMANTICS
    are checked) -> same-bucket equi-join candidates -> exact-cosine
    verify >= threshold -> connected components (two-phase star
    contraction) -> min-id survivor per cluster.

    This is semantic_dedup_survivors with the pair stage swapped from
    the bounded brute-force crossJoin to the LSH generator, the rest of
    the pipeline unchanged — the swap the survivors query documents,
    here oracle-locked. The only corpus-sized shuffle the pair stage
    performs is the bucket equi-join (quadratic -> ~quadratic/256 at
    uniform load, hot buckets structurally excluded); there is no
    CartesianProduct anywhere in the plan (plan-fenced with the
    registry-wide ban, tests/test_plans.py)."""
    from ..operators.dedup import (
        LSH_MAX_BUCKET,
        connected_components_two_phase,
        lsh_n_planes,
    )
    from ..sources.lake import table_row_count

    emb = widen(read_table(spark, sf_dir, "embeddings"))
    # Footer-stat sizing (round-12 advice): the plane count needs the
    # corpus size BEFORE the plan exists; parquet num_rows is the
    # catalog statistic, so no per-invocation count() job.
    n_planes = lsh_n_planes(table_row_count(spark, sf_dir, "embeddings"))
    v = _double_vec()
    base = emb.select(
        F.col("vec_id"), v.alias("v")
    ).select(
        "vec_id", "v", _norm(F.col("v")).alias("nrm"),
        _bucket_col(n_planes).alias("bucket"),
    )
    guarded = _drop_hot_buckets(base, "bucket", LSH_MAX_BUCKET)
    a = guarded.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
        F.col("nrm").alias("na"), F.col("bucket"),
    )
    b = guarded.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
        F.col("nrm").alias("nb"), F.col("bucket").alias("cbucket"),
    )
    cos_raw = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    pairs = (
        a.join(
            b,
            (F.col("bucket") == F.col("cbucket"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .where(cos_raw >= _NEAR_DUP_THRESHOLD)
        .select("vec_a", "vec_b")
    )
    cc = connected_components_two_phase(
        pairs, src_col="vec_a", dst_col="vec_b"
    ).withColumnRenamed("node", "vec_id")
    return (
        emb.select("vec_id")
        .join(cc, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("cluster_rep", F.col("vec_id")).alias("cluster_rep"),
            (F.coalesce("cluster_rep", F.col("vec_id")) == F.col("vec_id")).alias(
                "is_survivor"
            ),
        )
    )


def _semantic_ivf_oracle() -> str:
    from ..operators.dedup import LSH_MAX_BUCKET

    return f"""
WITH RECURSIVE e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS double)) AS v
  FROM embeddings
),
n AS (
  SELECT vec_id, v,
         sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS nrm
  FROM e
),
cent AS (
  SELECT vec_id AS cent_id, v AS cv FROM e
  WHERE vec_id % {_ivf_mod_sql()} = 0
),
assign AS (
  SELECT vec_id, cent_id FROM (
    SELECT n.vec_id, c.cent_id,
           row_number() OVER (
             PARTITION BY n.vec_id
             ORDER BY list_aggregate(list_transform(list_zip(n.v, c.cv),
                                     p -> (p[1]-p[2])*(p[1]-p[2])), 'sum'),
                      c.cent_id) AS rn
    FROM n, cent c
  ) WHERE rn = 1
),
g AS (
  SELECT a.vec_id, a.cent_id, n.v, n.nrm
  FROM assign a JOIN n ON n.vec_id = a.vec_id
  QUALIFY count(*) OVER (PARTITION BY a.cent_id) <= {LSH_MAX_BUCKET}
),
pairs AS (
  SELECT a.vec_id AS s0, b.vec_id AS d0
  FROM g a JOIN g b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
  WHERE list_aggregate(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]),
                       'sum') / (a.nrm * b.nrm) >= {_NEAR_DUP_THRESHOLD}
),
sym AS (
  SELECT s0 AS s, d0 AS d FROM pairs
  UNION
  SELECT d0, s0 FROM pairs
),
reach(node, target) AS (
  SELECT s, s FROM sym
  UNION
  SELECT r.node, y.d FROM reach r JOIN sym y ON y.s = r.target
),
cc AS (
  SELECT node, min(target) AS rep FROM reach GROUP BY node
)
SELECT emb.vec_id,
       coalesce(cc.rep, emb.vec_id) AS cluster_rep,
       (coalesce(cc.rep, emb.vec_id) = emb.vec_id) AS is_survivor
FROM (SELECT vec_id FROM embeddings) emb
LEFT JOIN cc ON cc.node = emb.vec_id
"""


@register(
    "semantic_dedup_ivf",
    oracle=_semantic_ivf_oracle(),
    tags=("extension", "dedup", "similarity", "ivf", "iterative"),
)
def semantic_dedup_ivf(spark, sf_dir):
    """Semantic dedup with the CLUSTER-partitioned pair generator —
    SemDeDup's actual published design (k-means cells, dedup WITHIN
    each cell), the second independent bucketed generator proven into
    the unchanged CC pipeline next to semantic_dedup_lsh: the coarse
    quantizer assigns every vector to its nearest centroid (one
    broadcast of the centroid table + an in-row L2 fold, exactly
    emb_ivf_topk's assignment), oversized cells are dropped by the
    same guard the LSH variant mirrors in its oracle, candidate pairs
    are a within-cell equi-join, exact cosine verifies, and two-phase
    star contraction finds the clusters. Full embeddings table, no
    vec_id cap; no CartesianProduct on the corpus side (the only
    crossJoin rides the broadcast centroid table, which the
    registry-wide ban allows)."""
    from ..operators.dedup import (
        LSH_MAX_BUCKET,
        connected_components_two_phase,
    )

    emb = widen(read_table(spark, sf_dir, "embeddings"))
    base = emb.select(F.col("vec_id"), _double_vec().alias("v"))
    n = base.select("vec_id", "v", _norm(F.col("v")).alias("nrm"))
    from ..operators.dedup import ivf_centroid_mod
    from ..sources.lake import table_row_count

    mod = ivf_centroid_mod(table_row_count(spark, sf_dir, "embeddings"))
    cent = base.where(F.col("vec_id") % mod == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )
    l2 = vec.fold_sqdist(F.col("v"), F.col("cv"))
    if _ivf_assign_agg_enabled():
        # nearest-centroid pick as a partial-aggregable min(struct):
        # the broadcast-nested-loop product never crosses an exchange —
        # each map task collapses its vec_ids to one row BEFORE the
        # shuffle, so n rows (not n x n_cent rows of 550 B carrying the
        # vector) move. min(struct(d2, cent_id)) is exactly the
        # row_number pick: same (d2 asc, cent_id asc) total order, and
        # v/nrm are functionally dependent on vec_id so any() is THE
        # value (guide §2.3: aggregate before you shuffle).
        assign = (
            n.crossJoin(F.broadcast(cent))
            .select("vec_id", "v", "nrm", "cent_id", l2.alias("d2"))
            .groupBy("vec_id")
            .agg(
                F.min(F.struct("d2", "cent_id")).alias("__best"),
                F.any_value("v").alias("v"),
                F.any_value("nrm").alias("nrm"),
            )
            .select("vec_id", "v", "nrm", F.col("__best.cent_id").alias("cent_id"))
        )
    else:
        w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("cent_id"))
        assign = (
            n.crossJoin(F.broadcast(cent))
            .select("vec_id", "v", "nrm", "cent_id", l2.alias("d2"))
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vec_id", "v", "nrm", "cent_id")
        )
    g = _drop_hot_buckets(assign, "cent_id", LSH_MAX_BUCKET)
    a = g.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
                 F.col("nrm").alias("na"), F.col("cent_id"))
    b = g.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
                 F.col("nrm").alias("nb"), F.col("cent_id").alias("cent_b"))
    cos_raw = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    pairs = (
        a.join(b, (F.col("cent_id") == F.col("cent_b"))
               & (F.col("vec_a") < F.col("vec_b")))
        .where(cos_raw >= _NEAR_DUP_THRESHOLD)
        .select("vec_a", "vec_b")
    )
    cc = connected_components_two_phase(
        pairs, src_col="vec_a", dst_col="vec_b"
    ).withColumnRenamed("node", "vec_id")
    return (
        emb.select("vec_id")
        .join(cc, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("cluster_rep", F.col("vec_id")).alias("cluster_rep"),
            (F.coalesce("cluster_rep", F.col("vec_id")) == F.col("vec_id")).alias(
                "is_survivor"
            ),
        )
    )


# --- product quantization (PQ) ANN: codes + asymmetric distance ---------------------
# (constants + oracle live earlier in the file so ann_recall_report's oracle
# can embed the PQ CTE; the operator itself is defined here)


@register(
    "pq_ann_topk",
    oracle=_PQ_ORACLE,
    tags=("extension", "similarity", "ann", "pq"),
)
def pq_ann_topk(spark, sf_dir):
    """Product-quantization ANN (the FAISS-PQ shape): embeddings are
    split into 16 subspaces of 4 dims; each subvector is assigned to the
    nearest of 32 per-subspace centroids (a deterministic sample of the
    corpus — vec_id multiples of 16 below 512 — standing in for a trained
    codebook, same plan shape); a vector's PQ code is its 16 centroid ids
    (16 bytes, a 16x compression of the 64-float vector). Queries score
    candidates by asymmetric distance (ADC): per subspace, the exact
    query-subvector-to-centroid distance, summed via the code — never
    touching the original vectors. Top-5 neighbors per query
    (vec_id < 20), ties to the lower neighbor id.

    Float discipline: components are half-up-quantized to a 1e-3 integer
    grid FIRST, so every distance, argmin, and ranking is exact int64
    math — no cross-engine float risk anywhere, including the argmin
    (encoded as min(dist * 32 + rank) so ties break to the lower rank).

    Scale: codes are built with one broadcast of the 512-row codebook and
    one (vec, subspace)-keyed aggregate; the ADC scan joins the tiny
    (queries x 16 x 32) lookup table broadcast against the code table —
    per-candidate work is a hash probe + integer add, the reason PQ is
    THE 100 TB ANN layout. The corpus-sized relations shuffle only on
    their own keys (vec_id, m); nothing all-pairs ever materializes."""
    e = widen(read_table(spark, sf_dir, "embeddings")).select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * 1000 + 0.5).cast("long"),
        ).alias("v"),
    )
    sub = e.select(
        "vec_id",
        "v",
        F.explode(F.array(*[F.lit(i) for i in range(_PQ_M)])).alias("m"),
    ).select(
        "vec_id",
        "m",
        F.slice(
            F.col("v"), F.col("m") * _PQ_SUB + 1, F.lit(_PQ_SUB)
        ).alias("sv"),
    )
    cent = sub.where(
        (F.col("vec_id") % _PQ_CMOD == 0)
        & (F.col("vec_id") < _PQ_CMOD * _PQ_NCENT)
    ).select(
        F.expr(f"vec_id div {_PQ_CMOD}").alias("crank"),
        "m",
        F.col("sv").alias("cv"),
    )

    def sqdist(a, b):
        return vec.fold_sqdist_long(a, b)

    codes = (
        sub.join(F.broadcast(cent), "m")
        .groupBy("vec_id", "m")
        .agg(
            (
                F.min(sqdist(F.col("sv"), F.col("cv")) * _PQ_NCENT + F.col("crank"))
                % _PQ_NCENT
            ).alias("code")
        )
    )
    lut = (
        sub.where(F.col("vec_id") < _N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), "m", "sv")
        .join(F.broadcast(cent), "m")
        .select(
            "query_id",
            F.col("m").alias("l_m"),
            "crank",
            sqdist(F.col("sv"), F.col("cv")).alias("qd"),
        )
    )
    adc = (
        codes.join(
            F.broadcast(lut),
            (F.col("m") == F.col("l_m")) & (F.col("code") == F.col("crank")),
        )
        .where(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("qd").cast("long").alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return (
        adc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _PQ_TOPK)
        .select("query_id", "neighbor_id", "adc_dist")
    )


# --- NDCG@10 ranking evaluation -----------------------------------------------------

_NDCG_K = 10
#: integer micro discounts 1/log2(pos+1) for positions 1..10 — computed ONCE
#: in Python and inlined as literals in both engines (no runtime log).
_NDCG_DISC = [round(1_000_000 / math.log2(p + 1)) for p in range(1, _NDCG_K + 1)]
#: prefix sums: _NDCG_PREF[j] = sum of the first j discounts (j = 0..10)
_NDCG_PREF = [0]
for _d in _NDCG_DISC:
    _NDCG_PREF.append(_NDCG_PREF[-1] + _d)

_NDCG_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS double)) AS v
  FROM embeddings
),
n AS (
  SELECT vec_id, label, v,
         sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS nrm
  FROM e
),
scored AS (
  SELECT q.vec_id AS query_id, q.label AS qlabel,
         c.vec_id AS neighbor_id, c.label AS clabel,
         floor(list_aggregate(list_transform(list_zip(q.v, c.v),
                                             p -> p[1] * p[2]), 'sum')
               / (q.nrm * c.nrm) * 10000 + 0.5) / 10000 AS cosine
  FROM n q, n c
  WHERE q.vec_id < {_N_QUERIES} AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, qlabel, clabel,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rn
  FROM scored
),
dcg AS (
  SELECT query_id,
         cast(sum(CASE WHEN clabel = qlabel
                       THEN {_NDCG_DISC}[rn] ELSE 0 END) AS bigint) AS dcg_micro
  FROM ranked WHERE rn <= {_NDCG_K} GROUP BY query_id
),
rel AS (
  SELECT query_id,
         cast(sum(CASE WHEN clabel = qlabel THEN 1 ELSE 0 END) AS bigint) AS n_rel
  FROM scored GROUP BY query_id
)
SELECT r.query_id, r.n_rel,
       CASE WHEN r.n_rel > 0 THEN
         floor(cast(coalesce(d.dcg_micro, 0) AS double)
               / {_NDCG_PREF}[least(r.n_rel, {_NDCG_K}) + 1]
               * 1000000 + 0.5) / 1000000
       END AS ndcg10
FROM rel r LEFT JOIN dcg d ON r.query_id = d.query_id
"""


@register(
    "ndcg_at10_report",
    oracle=_NDCG_ORACLE,
    tags=("extension", "similarity", "eval"),
)
def ndcg_at10_report(spark, sf_dir):
    """NDCG@10 of the brute-force cosine ranking against label relevance
    (same-label neighbor = relevant) — the ranking-eval primitive beside
    AUC: DCG discounts 1/log2(pos+1) are inlined as integer micro
    literals (positions 1..10, computed once in Python, shared with the
    oracle — no runtime log in either engine), so DCG and the ideal DCG
    (a prefix-sum lookup at min(n_rel, 10)) are exact int64; the final
    normalization is one IEEE division.

    Scale: same shape as knn_cosine_bruteforce (bounded query set
    broadcast against the corpus, per-query window with group-limit
    pushdown) plus two per-query aggregates; the discount/prefix tables
    are constant literals, not data."""
    emb = widen(read_table(spark, sf_dir, "embeddings"))
    v = _double_vec()
    base = emb.select(F.col("vec_id"), F.col("label"), v.alias("v"), _norm(v).alias("nrm"))
    q = base.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    c = base.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("clabel"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    dot = _dot(F.col("qv"), F.col("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "qlabel",
            "neighbor_id",
            "clabel",
            round_half_up(dot / (F.col("qn") * F.col("cn")), 4).alias("cosine"),
        )
        .transform(cut_lazy)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    disc = F.array(*[F.lit(d) for d in _NDCG_DISC])
    pref = F.array(*[F.lit(p) for p in _NDCG_PREF])
    dcg = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _NDCG_K)
        .groupBy("query_id")
        .agg(
            F.sum(
                F.when(
                    F.col("clabel") == F.col("qlabel"),
                    F.element_at(disc, F.col("rn")),
                ).otherwise(0)
            ).alias("dcg_micro")
        )
    )
    rel = scored.groupBy("query_id").agg(
        F.sum(F.when(F.col("clabel") == F.col("qlabel"), 1).otherwise(0)).alias(
            "n_rel"
        )
    )
    idcg = F.element_at(pref, (F.least(F.col("n_rel"), F.lit(_NDCG_K)) + 1).cast("int"))
    return (
        rel.join(dcg, "query_id", "left")
        .select(
            "query_id",
            "n_rel",
            F.when(
                F.col("n_rel") > 0,
                F.floor(
                    F.coalesce(F.col("dcg_micro"), F.lit(0)).cast("double")
                    / idcg
                    * 1000000
                    + 0.5
                )
                / 1000000,
            ).alias("ndcg10"),
        )
    )


# --- MRR@10 ranking eval --------------------------------------------------------------

_MRR_K = 10
# reciprocal ranks 1/r for r = 1..10 as integer micro literals (shared
# with the oracle; no runtime division on the rank in either engine)
_MRR_MICRO = [round(1000000 / r) for r in range(1, _MRR_K + 1)]

_MRR_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS double)) AS v
  FROM embeddings
),
n AS (
  SELECT vec_id, label, v,
         sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS nrm
  FROM e
),
scored AS (
  SELECT q.vec_id AS query_id, q.label AS qlabel,
         c.vec_id AS neighbor_id, c.label AS clabel,
         floor(list_aggregate(list_transform(list_zip(q.v, c.v),
                                             p -> p[1] * p[2]), 'sum')
               / (q.nrm * c.nrm) * 10000 + 0.5) / 10000 AS cosine
  FROM n q, n c
  WHERE q.vec_id < {_N_QUERIES} AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, qlabel, clabel,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rn
  FROM scored
),
firstrel AS (
  SELECT query_id, cast(min(rn) AS bigint) AS first_rel
  FROM ranked WHERE rn <= {_MRR_K} AND clabel = qlabel
  GROUP BY query_id
),
qs AS (SELECT vec_id AS query_id FROM e WHERE vec_id < {_N_QUERIES})
SELECT q.query_id,
       cast(coalesce(f.first_rel, 0) AS bigint) AS first_rel_rank,
       cast(coalesce({_MRR_MICRO}[f.first_rel], 0) AS double) / 1000000
         AS reciprocal_rank
FROM qs q LEFT JOIN firstrel f ON f.query_id = q.query_id
"""


@register(
    "mrr_at10_report",
    oracle=_MRR_ORACLE,
    tags=("extension", "similarity", "eval"),
)
def mrr_at10_report(spark, sf_dir):
    """MRR@10 of the brute-force cosine ranking against label relevance —
    the first-relevant-hit eval beside nDCG (nDCG grades the whole list,
    reciprocal rank grades how fast a user reaches ONE good answer; the
    pair disagreeing flags rankings that pack relevance late). Queries
    with no relevant neighbor in the top 10 contribute 0 with
    first_rel_rank 0 — visible, never dropped.

    Exactness: the 1/r reciprocals for r = 1..10 are integer micro
    literals shared with the oracle; no runtime rank division anywhere.

    Scale: identical shape to ndcg_at10_report — bounded query set
    broadcast against the corpus, one per-query window, one tiny
    aggregate."""
    emb = widen(read_table(spark, sf_dir, "embeddings"))
    v = _double_vec()
    base = emb.select(F.col("vec_id"), F.col("label"), v.alias("v"), _norm(v).alias("nrm"))
    q = base.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    c = base.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("clabel"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    dot = _dot(F.col("qv"), F.col("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "qlabel",
            "neighbor_id",
            "clabel",
            round_half_up(dot / (F.col("qn") * F.col("cn")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    firstrel = (
        scored.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") <= _MRR_K) & (F.col("clabel") == F.col("qlabel")))
        .groupBy("query_id")
        .agg(F.min("rn").cast("long").alias("first_rel"))
    )
    # enumerate query ids from the bounded query-side frame, NOT from
    # `scored` — deriving them from `scored` would re-execute the full
    # corpus-sized cosine scoring pass a second time just to list ids
    qs = q.select("query_id")
    micro = F.array(*[F.lit(m) for m in _MRR_MICRO])
    return qs.join(firstrel, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("first_rel"), F.lit(0)).cast("long").alias("first_rel_rank"),
        (
            F.coalesce(
                F.element_at(micro, F.col("first_rel").cast("int")), F.lit(0)
            ).cast("double")
            / 1000000
        ).alias("reciprocal_rank"),
    )
