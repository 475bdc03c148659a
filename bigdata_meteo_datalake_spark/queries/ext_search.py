"""Search-ranking extension queries: BM25 scoring and reciprocal-rank
hybrid fusion over ``documents`` + ``embeddings``.

The reference ships its documents to Elasticsearch and lets Lucene rank
them (scripts/index/index_elasticsearch.py:100-149 builds the index;
BM25 is Lucene's default similarity). These queries re-express that
ranking *inside* the engine, Spark-first: term frequencies are in-row
higher-order-function folds (no per-token explode, no shuffle), corpus
statistics are one tiny aggregate broadcast back over the scan, and the
global top-k compiles to TakeOrderedAndProject.

``rrf_hybrid_fusion`` is the retrieval shape every RAG pipeline runs
today: fuse a lexical (BM25) ranking with a dense (embedding-cosine)
ranking via Reciprocal Rank Fusion (Cormack, Clarke & Buettcher 2009,
score = sum 1/(60+rank)). Fusion operates on bounded top-N candidate
lists — exactly how production hybrid search works — so the per-list
rank window sees at most N rows per list by construction and the plan
survives any corpus size.

Float discipline (repo convention): every engine-order-sensitive float
is derived from exact integers with an identical expression shape in
Spark and DuckDB, then int64-quantized before ranking, so ranks and the
driver's value hash are exact.
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions import vec
from ..sources.lake import read_table, widen
from . import register
from ..operators.checkpointing import cut_eager

# Lucene-default BM25 parameters; products precomputed in Python so both
# engines see the same float literal (repr round-trips exactly).
_K1 = 1.2
_B = 0.75
_K1P1 = _K1 + 1.0  # 2.2
_K1_1MB = _K1 * (1.0 - _B)  # k1*(1-b)
_K1B = _K1 * _B  # k1*b

_Q_TERMS = ("hash", "merge", "vector")  # the fixed lexical query
_BM25_TOPK = 20
_RRF_K = 60  # the standard RRF damping constant
_RRF_LIST_N = 100  # candidate-list depth per retriever
_RRF_TOPK = 20
_RRF_QVEC_ID = 0  # dense query = the embedding of vec_id 0

_TOKS_SQL = "string_split_regex(lower(trim(text)), '[ \\t\\n\\r\\f]+')"


def _bm25_sql_cte() -> str:
    """CTEs computing the int64-quantized BM25 score for every document —
    shared verbatim by the bm25_doc_scores and rrf_hybrid_fusion oracles."""
    tf_cols = ",\n         ".join(
        f"cast(len(list_filter(t, x -> x = '{term}')) AS bigint) AS tf{i}"
        for i, term in enumerate(_Q_TERMS)
    )
    score_terms = " + ".join(
        f"(ln(1.0 + ((cast(n_docs AS double) - df{i}) + 0.5) / (df{i} + 0.5))"
        f" * (tf{i} * {_K1P1!r})"
        f" / (tf{i} + {_K1_1MB!r} + {_K1B!r} * (dl / avgdl)))"
        for i in range(len(_Q_TERMS))
    )
    df_cols = ",\n         ".join(
        f"cast(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS bigint) AS df{i}"
        for i in range(len(_Q_TERMS))
    )
    return f"""
toks AS (
  SELECT doc_id, t, cast(len(t) AS bigint) AS dl,
         {tf_cols}
  FROM (SELECT doc_id, {_TOKS_SQL} AS t FROM documents)
),
stats AS (
  SELECT cast(count(*) AS bigint) AS n_docs,
         cast(sum(dl) AS double) / count(*) AS avgdl,
         {df_cols}
  FROM toks
),
bm AS (
  SELECT doc_id, dl, {", ".join(f"tf{i}" for i in range(len(_Q_TERMS)))},
         cast(floor(({score_terms}) * 1000000.0 + 0.5) AS bigint) AS s_q
  FROM toks, stats
)"""


_BM25_ORACLE = f"""
WITH {_bm25_sql_cte()}
SELECT doc_id, dl,
       tf0 AS tf_hash, tf1 AS tf_merge, tf2 AS tf_vector,
       cast(s_q AS double) / 1000000.0 AS bm25
FROM (
  SELECT *, row_number() OVER (ORDER BY s_q DESC, doc_id) AS rn FROM bm
) WHERE rn <= {_BM25_TOPK}
"""


def _bm25_arrow_enabled() -> bool:
    """A/B lever for the Arrow per-doc token-stats kernel (read at plan
    build time) — the 3 interpreted HOF term filters over the token
    array are the query's dominant per-row cost at scale (the r16
    verdict's interpreted-HOF residual list); the kernel computes the
    same (dl, tf0..tf2) with C-speed list.count per Arrow batch."""
    import os

    return os.environ.get("SPARK_GRAFT_BM25_ARROW", "1").lower() not in (
        "0", "false", "no",
    )


def _bm25_per_doc_arrow(d):
    """mapInArrow twin of the per-doc BM25 token stats: one row per
    document (null text included — dl/tf null exactly like
    size(split(null))), dl = token count of the UNFILTERED split (empty
    tokens kept, as in the JVM form and the oracle), tf_i = exact count
    of query term i."""
    import pyarrow as pa

    terms = _Q_TERMS
    cols = ["doc_id", "dl"] + [f"tf{i}" for i in range(len(terms))]
    # size(split(NULL)) is session-policy-dependent: -1 under the legacy
    # sizeOfNull behavior (the default when ANSI is off — the engine's
    # session policy), NULL under ANSI. Resolve the session's answer at
    # plan build time and bake it into the kernel so the twin matches
    # the JVM form on ANY session.
    conf = d.sparkSession.conf
    ansi = conf.get("spark.sql.ansi.enabled", "false").lower() == "true"
    legacy = conf.get("spark.sql.legacy.sizeOfNull", "true").lower() == "true"
    null_size = None if ansi or not legacy else -1

    def kernel(batches):
        import re as _re

        split = _re.compile(r"[ \t\n\r\f]+").split
        for batch in batches:
            ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            out = {c: [] for c in cols}
            out["doc_id"] = ids
            for txt in texts:
                if txt is None:
                    out["dl"].append(null_size)
                    for i in range(len(terms)):
                        out[f"tf{i}"].append(null_size)
                    continue
                toks = split(txt.strip(" ").lower())
                out["dl"].append(len(toks))
                for i, term in enumerate(terms):
                    out[f"tf{i}"].append(toks.count(term))
            yield pa.RecordBatch.from_arrays(
                [pa.array(out[c], pa.int64()) for c in cols], cols
            )

    return widen(d.select("doc_id", "text")).mapInArrow(
        kernel, ", ".join(f"{c} long" for c in cols)
    )


def _bm25_scored(spark, sf_dir):
    """(doc_id, dl, tf0.., s_q): int64-quantized BM25 for every document.

    One in-row pass builds per-doc token stats (zero shuffle), one tiny
    aggregate computes (N, avgdl, df_t) and broadcasts back — the whole
    corpus is scanned exactly once and never shuffled."""
    d = read_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\r\f]+")

    def _tf(term):
        # closure helper: a default-arg lambda would change pyspark's
        # higher-order-function arity detection (2 args = value+index)
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    if _bm25_arrow_enabled():
        per_doc = _bm25_per_doc_arrow(d)
    else:
        per_doc = d.select(
            "doc_id",
            F.size(toks).cast("long").alias("dl"),
            *[
                _tf(term).cast("long").alias(f"tf{i}")
                for i, term in enumerate(_Q_TERMS)
            ],
        )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)).alias(f"df{i}")
            for i in range(len(_Q_TERMS))
        ],
    )
    score = None
    for i in range(len(_Q_TERMS)):
        idf = F.log(
            1.0
            + ((F.col("n_docs").cast("double") - F.col(f"df{i}")) + 0.5)
            / (F.col(f"df{i}") + 0.5)
        )
        term_score = (
            idf
            * (F.col(f"tf{i}") * _K1P1)
            / (F.col(f"tf{i}") + _K1_1MB + _K1B * (F.col("dl") / F.col("avgdl")))
        )
        score = term_score if score is None else score + term_score
    return per_doc.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        "dl",
        *[f"tf{i}" for i in range(len(_Q_TERMS))],
        F.floor(score * 1000000.0 + 0.5).cast("long").alias("s_q"),
    )


@register(
    "bm25_doc_scores",
    oracle=_BM25_ORACLE,
    tags=("extension", "search", "bm25"),
)
def bm25_doc_scores(spark, sf_dir):
    """BM25 top-20 documents for a fixed 3-term query (Lucene-default
    k1=1.2, b=0.75 — the exact scoring the reference delegates to
    Elasticsearch; see module docstring). Term frequencies and document
    length are in-row array folds over the tokenizer split (no explode,
    no shuffle); the corpus stats (N, avgdl, per-term df) are ONE tiny
    aggregate broadcast back over the scan; the global top-20 is
    orderBy().limit() — TakeOrderedAndProject, never a global window.

    Exactness: tf/dl/df are exact integers, avgdl is one double division
    of exact integers, the per-term score expression is written with the
    identical operation order in both engines, and the final score is
    int64-quantized before ranking — rank and hash are exact.

    Scale: one corpus scan, one broadcast of a 1-row stats frame, per-doc
    arithmetic inside codegen, top-k tree-reduced. 100 TB shape."""
    bm = _bm25_scored(spark, sf_dir)
    return (
        bm.orderBy(F.desc("s_q"), F.asc("doc_id"))
        .limit(_BM25_TOPK)
        .select(
            "doc_id",
            "dl",
            F.col("tf0").alias("tf_hash"),
            F.col("tf1").alias("tf_merge"),
            F.col("tf2").alias("tf_vector"),
            (F.col("s_q").cast("double") / 1000000.0).alias("bm25"),
        )
    )


def _candidate_ranks(spark, sf_dir, materialize=False):
    """(id, list_id, r): within-list ranks 1..N of the lexical (BM25) and
    dense (cosine-to-query-vector) top-{N} candidate lists — the shared
    retrieval front-end of rrf_hybrid_fusion and rank_biased_overlap.

    Both retrievers end in TakeOrderedAndProject, so the rank window sees
    <= 2N rows by construction (partitioned by list_id).

    ``materialize=True`` localCheckpoints the <=2N-row result for callers
    that consume it more than once (RBO's text and vec branches) — a
    localCheckpoint, NOT ``persist()``: persisted frames live in the
    session cacheManager until an explicit unpersist, so a registry-wide
    sweep in one SparkSession would accumulate a cached copy per call;
    checkpoint blocks are released by the ContextCleaner as soon as the
    frame is garbage-collected. Single-consumer callers (RRF) skip the
    materialization entirely."""
    bm = _bm25_scored(spark, sf_dir)
    text_cand = (
        bm.orderBy(F.desc("s_q"), F.asc("doc_id"))
        .limit(_RRF_LIST_N)
        .select(F.col("doc_id").alias("id"), F.lit("text").alias("list_id"), F.col("s_q").alias("sort_q"))
    )
    emb = widen(read_table(spark, sf_dir, "embeddings"))
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select(
        "vec_id",
        v.alias("v"),
        F.sqrt(vec.fold_sum_sq(v)).alias("nrm"),
    )
    q = base.where(F.col("vec_id") == _RRF_QVEC_ID).select(
        F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    # sequential left-fold dot product: same fold order as the oracle's
    # list_aggregate, hence bit-identical doubles (ext_similarity
    # convention)
    dot = vec.fold_dot(F.col("qv"), F.col("v"))
    vec_cand = (
        base.crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("id"),
            F.floor(dot / (F.col("qn") * F.col("nrm")) * 1000000000.0 + 0.5)
            .cast("long")
            .alias("sort_q"),
        )
        .orderBy(F.desc("sort_q"), F.asc("id"))
        .limit(_RRF_LIST_N)
        .select("id", F.lit("vec").alias("list_id"), "sort_q")
    )
    cand = text_cand.unionByName(vec_cand)
    w = Window.partitionBy("list_id").orderBy(F.desc("sort_q"), F.asc("id"))
    ranked = cand.select(
        "id", "list_id", F.row_number().over(w).cast("long").alias("r")
    )
    return ranked.transform(cut_eager) if materialize else ranked


_RRF_ORACLE = f"""
WITH {_bm25_sql_cte()},
tr AS (
  SELECT doc_id AS id, cast(row_number() OVER (ORDER BY s_q DESC, doc_id) AS bigint) AS r
  FROM bm
),
ev AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS double)) AS v
  FROM embeddings
),
en AS (
  SELECT vec_id, v,
         sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS nrm
  FROM ev
),
cosq AS (
  SELECT c.vec_id AS id,
         cast(floor(list_aggregate(list_transform(list_zip(q.v, c.v),
                                                  p -> p[1] * p[2]), 'sum')
                    / (q.nrm * c.nrm) * 1000000000.0 + 0.5) AS bigint) AS cq
  FROM en c, (SELECT v, nrm FROM en WHERE vec_id = {_RRF_QVEC_ID}) q
),
vr AS (
  SELECT id, cast(row_number() OVER (ORDER BY cq DESC, id) AS bigint) AS r
  FROM cosq
),
cand AS (
  SELECT id, 'text' AS list_id, r FROM tr WHERE r <= {_RRF_LIST_N}
  UNION ALL
  SELECT id, 'vec' AS list_id, r FROM vr WHERE r <= {_RRF_LIST_N}
),
fused AS (
  SELECT id,
         min(CASE WHEN list_id = 'text' THEN r END) AS text_rank,
         min(CASE WHEN list_id = 'vec' THEN r END) AS vec_rank
  FROM cand GROUP BY id
),
scored AS (
  SELECT id, text_rank, vec_rank,
         cast(floor((coalesce(1.0 / ({_RRF_K} + text_rank), 0.0)
                     + coalesce(1.0 / ({_RRF_K} + vec_rank), 0.0))
                    * 1000000000000.0 + 0.5) AS bigint) AS rrf_q
  FROM fused
)
SELECT id AS doc_id,
       cast(text_rank AS integer) AS text_rank,
       cast(vec_rank AS integer) AS vec_rank,
       cast(rrf_q AS double) / 1000000000000.0 AS rrf_score
FROM (
  SELECT *, row_number() OVER (ORDER BY rrf_q DESC, id) AS rn FROM scored
) WHERE rn <= {_RRF_TOPK}
"""


@register(
    "rrf_hybrid_fusion",
    oracle=_RRF_ORACLE,
    tags=("extension", "search", "hybrid", "rrf"),
)
def rrf_hybrid_fusion(spark, sf_dir):
    """Hybrid retrieval via Reciprocal Rank Fusion: the BM25 lexical
    ranking and the embedding-cosine dense ranking (query = vec_id 0)
    each contribute their top-100 candidates; fused score is the RRF
    sum 1/(60+rank) over the lists an item appears in; output is the
    fused top-20 — the standard RAG hybrid-search recipe.

    Plan shape: each retriever ends in TakeOrderedAndProject(top-100),
    so the union the rank window sees is <= 200 rows BY CONSTRUCTION —
    the window partitions by list_id (bounded rows per partition, never
    a corpus-sized single task). The dense side broadcasts the 1-row
    query vector against the partitioned corpus scan (same shape as
    knn_cosine_bruteforce); fusion is a 200-row groupBy; the final
    top-20 is again orderBy().limit().

    Exactness: both rankings order by int64-quantized scores with id
    tie-breaks; the RRF sum is two identically-written double divisions
    of exact integers, quantized again before the final rank."""
    ranked = _candidate_ranks(spark, sf_dir)
    fused = ranked.groupBy("id").agg(
        F.min(F.when(F.col("list_id") == "text", F.col("r"))).alias("text_rank"),
        F.min(F.when(F.col("list_id") == "vec", F.col("r"))).alias("vec_rank"),
    )
    rrf = F.coalesce(1.0 / (_RRF_K + F.col("text_rank")), F.lit(0.0)) + F.coalesce(
        1.0 / (_RRF_K + F.col("vec_rank")), F.lit(0.0)
    )
    scored = fused.select(
        "id",
        "text_rank",
        "vec_rank",
        F.floor(rrf * 1000000000000.0 + 0.5).cast("long").alias("rrf_q"),
    )
    return (
        scored.orderBy(F.desc("rrf_q"), F.asc("id"))
        .limit(_RRF_TOPK)
        .select(
            F.col("id").alias("doc_id"),
            F.col("text_rank").cast("int").alias("text_rank"),
            F.col("vec_rank").cast("int").alias("vec_rank"),
            (F.col("rrf_q").cast("double") / 1000000000000.0).alias("rrf_score"),
        )
    )


# --- rank-biased overlap between the two retrievers -----------------------------------

_RBO_P = 0.9
# per-depth weights (1-p) p^(d-1) / d for d = 1..N, computed once in
# Python and embedded as literals in both engines (engine pow() may
# differ in the last ulp, identical literals cannot)
_RBO_W = [(1.0 - _RBO_P) * _RBO_P ** (d - 1) / d for d in range(1, _RRF_LIST_N + 1)]

_RBO_ORACLE = f"""
WITH {_bm25_sql_cte()},
tr AS (
  SELECT doc_id AS id, cast(row_number() OVER (ORDER BY s_q DESC, doc_id) AS bigint) AS r
  FROM bm
),
ev AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS double)) AS v
  FROM embeddings
),
en AS (
  SELECT vec_id, v,
         sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS nrm
  FROM ev
),
cosq AS (
  SELECT c.vec_id AS id,
         cast(floor(list_aggregate(list_transform(list_zip(q.v, c.v),
                                                  p -> p[1] * p[2]), 'sum')
                    / (q.nrm * c.nrm) * 1000000000.0 + 0.5) AS bigint) AS cq
  FROM en c, (SELECT v, nrm FROM en WHERE vec_id = {_RRF_QVEC_ID}) q
),
vr AS (
  SELECT id, cast(row_number() OVER (ORDER BY cq DESC, id) AS bigint) AS r
  FROM cosq
),
pairs AS (
  SELECT greatest(t.r, v.r) AS m
  FROM (SELECT id, r FROM tr WHERE r <= {_RRF_LIST_N}) t
  JOIN (SELECT id, r FROM vr WHERE r <= {_RRF_LIST_N}) v USING (id)
),
w AS (SELECT {list(_RBO_W)} AS wts),
depths AS (SELECT cast(unnest(range(1, {_RRF_LIST_N + 1})) AS bigint) AS d),
per_depth AS (
  SELECT d.d, cast(count(p.m) AS bigint) AS overlap
  FROM depths d LEFT JOIN pairs p ON p.m <= d.d
  GROUP BY d.d
),
terms AS (
  SELECT cast(sum(cast(floor(overlap * wts[cast(d AS integer)] * 1000000000000.0
                             + 0.5) AS bigint)) AS bigint) AS rbo_q,
         cast(max(CASE WHEN d = {_RRF_LIST_N} THEN overlap END) AS bigint) AS n_both
  FROM per_depth, w
)
SELECT cast({_RRF_LIST_N} AS bigint) AS depth,
       n_both,
       cast(rbo_q AS double) / 1000000000000.0 AS rbo
FROM terms
"""


@register(
    "rank_biased_overlap",
    oracle=_RBO_ORACLE,
    tags=("extension", "search", "eval", "rbo"),
)
def rank_biased_overlap(spark, sf_dir):
    """Rank-biased overlap (Webber, Moffat & Zobel 2010, p=0.9) between
    the lexical and dense top-100 rankings — the top-weighted agreement
    measure for comparing retrievers (Kendall/Spearman treat all ranks
    equally and need conjoint lists; RBO weights early ranks and handles
    non-overlapping lists, which is exactly the hybrid-search situation).
    Truncated at depth 100: the agreement A_d = |intersection at d| / d
    under the (1-p)p^(d-1) weight profile.

    Exactness: intersection sizes come from exact ranks (the same
    quantized-score row_numbers the RRF query uses); the per-depth
    weights are Python-computed literals shared by both engines; each
    depth's term is int64-quantized before the sum.

    Scale: both candidate lists are TakeOrderedAndProject top-100, so
    everything after the retrievers runs on <= 100 pair rows joined to a
    100-row depth spine — constant-sized regardless of corpus."""
    ranked = _candidate_ranks(spark, sf_dir, materialize=True)
    t = ranked.where(F.col("list_id") == "text").select("id", F.col("r").alias("rt"))
    v = ranked.where(F.col("list_id") == "vec").select("id", F.col("r").alias("rv"))
    pairs = t.join(v, "id").select(F.greatest("rt", "rv").alias("m"))
    depths = spark.range(1, _RRF_LIST_N + 1).select(F.col("id").alias("d"))
    per_depth = (
        depths.join(F.broadcast(pairs), F.col("m") <= F.col("d"), "left")
        .groupBy("d")
        .agg(F.count(F.col("m")).alias("overlap"))
    )
    wts = F.array(*[F.lit(w) for w in _RBO_W])
    term_q = F.floor(
        F.col("overlap") * F.element_at(wts, F.col("d").cast("int")) * 1000000000000.0
        + 0.5
    ).cast("long")
    terms = per_depth.agg(
        F.sum(term_q).alias("rbo_q"),
        F.max(
            F.when(F.col("d") == _RRF_LIST_N, F.col("overlap"))
        ).alias("n_both"),
    )
    return terms.select(
        F.lit(_RRF_LIST_N).cast("long").alias("depth"),
        F.col("n_both"),
        (F.col("rbo_q").cast("double") / 1000000000000.0).alias("rbo"),
    )
