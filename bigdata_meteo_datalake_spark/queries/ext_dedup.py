"""Deduplication extension queries over ``documents``
(SURVEY.md section 2.7 — LLM-pipeline operators, Spark-first designs).

Implemented here:
- exact dedup: hash-groupBy on a content fingerprint (one shuffle on the
  hash — at 100 TB this is the canonical "dedup a crawl" shape; the md5
  key is uniform so no skew).
- n-gram Jaccard near-dup: shingle -> explode -> self-equi-join on shingle
  -> per-pair intersection counts -> Jaccard filter. The join key is the
  shingle, so frequent shingles are the skew risk; production guard is
  dropping ultra-frequent shingles (a WHERE on shingle doc-frequency),
  which also bounds the candidate-pair blowup.

MinHash-LSH and SimHash live in operators/dedup.py with rows-only checks
(see ext_dedup_lsh queries) — their banding hashes are deterministic
bigint arithmetic, shared with the oracle where expressible.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.numeric import round_half_up
from ..sources.lake import read_table
from . import register

# --- exact dedup ---------------------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
SELECT doc_id,
       md5(text) AS content_hash,
       (row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1) AS is_kept
FROM documents
""",
    tags=("extension", "dedup"),
)
def dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on md5(text); the lowest doc_id in each
    content group is the canonical survivor."""
    d = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    return d.select(
        "doc_id",
        F.md5(F.col("text")).alias("content_hash"),
        (F.row_number().over(w) == 1).alias("is_kept"),
    )


# --- n-gram Jaccard near-dup pairs ----------------------------------------------

_JACCARD_THRESHOLD = 0.6

_NGRAM_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
  FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_distinct(
           list_transform(range(1, len(t) - 1),
                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS gram
  FROM toks
  WHERE len(t) >= 3
),
sizes AS (
  SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id
),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       floor(cast(n_inter AS double) / (sa.n + sb.n - n_inter) * 1000000 + 0.5)
         / 1000000 AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE cast(n_inter AS double) / (sa.n + sb.n - n_inter) >= {_JACCARD_THRESHOLD}
"""


@register("dedup_ngram_jaccard", oracle=_NGRAM_ORACLE, tags=("extension", "dedup"))
def dedup_ngram_jaccard(spark, sf_dir):
    """Near-duplicate pairs by word-3-gram Jaccard >= 0.6: shingle ->
    explode distinct shingles -> self-join on shingle -> intersection
    counts -> Jaccard. Integer-only arithmetic until one final double
    division, so the oracle matches bit-for-bit."""
    d = read_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    grams_arr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i),
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
            ),
        )
    )
    grams = (
        d.where(F.size(toks) >= 3)
        .select("doc_id", F.explode(grams_arr).alias("gram"))
    )
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = grams.alias("a")
    b = grams.alias("b")
    inter = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_inter").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("n_inter")
    )
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .where(jac >= _JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", round_half_up(jac, 6).alias("jaccard"))
    )
