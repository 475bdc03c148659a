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

- MinHash-LSH and SimHash (operators/dedup.py): banding hashes are
  md5-derived deterministic bigint arithmetic, shared with fully exact SQL
  oracles generated from the same constants.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.numeric import round_half_up
from ..operators.dedup import (
    LSH_BANDS,
    LSH_MAX_BUCKET,
    LSH_ROWS,
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
    SIMHASH_BAND_BITS,
    SIMHASH_BANDS,
    SIMHASH_BITS,
    SIMHASH_MAX_HAMMING,
    doc_shingle_hash_sets,
    doc_shingles,
    jaccard_verify_sets,
    lsh_candidate_pairs,
    minhash_signature,
    prefix_filter_candidates,
    simhash,
    simhash_near_pairs,
    token_hash_sql,
)
from ..sources.lake import read_table
from . import register
from ..operators.checkpointing import cut_lazy

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
  SELECT doc_id, string_split_regex(lower(trim(text)), '[ \\t\\n\\r\\f]+') AS t
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
    # same shingle relation the MinHash path uses — ONE definition of the
    # gram set so the two Jaccard queries can't drift apart
    grams = doc_shingles(d).transform(cut_lazy)  # reused by sizes + both join sides
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


# --- MinHash + LSH near-dup pairs ------------------------------------------------


def minhash_bands_sql_ctes() -> str:
    """The ``toks``/``grams``/``hx``/``sig``/``bands_all`` CTE block shared
    by the minhash-LSH oracle and the band-load diagnostic oracle
    (ext_metrics.lsh_band_load_report) — generated from the same constants
    as the Spark operators so both oracles stay in lockstep with
    operators/dedup.py by construction."""
    sig_cols = ",\n         ".join(
        f"min(({a} * x + {b}) % {MINHASH_P}) AS mh{j}"
        for j, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    )
    band_selects = "\n  UNION ALL ".join(
        "SELECT doc_id, {b} AS band_idx, concat_ws('_', {cols}) AS band_key FROM sig".format(
            b=b,
            cols=", ".join(f"mh{b * LSH_ROWS + r}" for r in range(LSH_ROWS)),
        )
        for b in range(LSH_BANDS)
    )
    return f"""toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '[ \\t\\n\\r\\f]+') AS t FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_distinct(
           list_transform(range(1, len(t) - 1),
                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS gram
  FROM toks WHERE len(t) >= 3
),
hx AS (SELECT DISTINCT doc_id, {token_hash_sql('gram')} % {MINHASH_P} AS x FROM grams),
sig AS (SELECT doc_id, {sig_cols} FROM hx GROUP BY doc_id),
bands_all AS ({band_selects})"""


def _minhash_oracle() -> str:
    return f"""
WITH {minhash_bands_sql_ctes()},
bands AS (
  SELECT * FROM bands_all
  QUALIFY count(*) OVER (PARTITION BY band_idx, band_key) <= {LSH_MAX_BUCKET}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM hx GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, count(*) AS n_inter
  FROM pairs p
  JOIN hx ga ON ga.doc_id = p.doc_a
  JOIN hx gb ON gb.doc_id = p.doc_b AND gb.x = ga.x
  GROUP BY p.doc_a, p.doc_b
)
SELECT i.doc_a, i.doc_b,
       floor(cast(n_inter AS double) / (sa.n + sb.n - n_inter) * 1000000 + 0.5)
         / 1000000 AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE cast(n_inter AS double) / (sa.n + sb.n - n_inter) >= {_JACCARD_THRESHOLD}
"""


@register("dedup_minhash_lsh", oracle=_minhash_oracle(), tags=("extension", "dedup", "minhash"))
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash (16 perms) + LSH banding (r=2, b=8) + Jaccard verify over
    hashed shingle sets, all computed on IN-ROW arrays: shingle-hash set
    (one map) -> signature (16 array folds, NO aggregate shuffle) -> band
    equi-join (hot buckets > LSH_MAX_BUCKET dropped — the guard is
    mirrored in the oracle SQL, so its semantics are checked, not just its
    presence) -> candidate pairs -> array_intersect verify >= 0.6. The
    only corpus-sized shuffle in the whole operator is the band self-join;
    the explode/groupBy formulation this replaces shuffled every
    (doc, shingle) pair twice. Hashes are md5-derived integer arithmetic,
    bit-identical to the oracle (which keeps the equivalent exploded
    GROUP BY form — same values, independent derivation)."""

    d = read_table(spark, sf_dir, "documents")
    # the per-doc shingle-hash set feeds the signature AND both verify
    # sides — one small cached relation (doc_id, array<long>)
    sets = doc_shingle_hash_sets(d).transform(cut_lazy)
    sig = minhash_signature(sets)
    pairs = lsh_candidate_pairs(sig, max_bucket_size=LSH_MAX_BUCKET)
    verified = jaccard_verify_sets(pairs, sets)
    return verified.where(F.col("jaccard_raw") >= _JACCARD_THRESHOLD).select(
        "doc_a", "doc_b", round_half_up(F.col("jaccard_raw"), 6).alias("jaccard")
    )


# --- prefix-filtered exact set-similarity join (PPJoin family) -------------------


def _prefix_filter_oracle() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '[ \\t\\n\\r\\f]+') AS t FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_distinct(
           list_transform(range(1, len(t) - 1),
                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS gram
  FROM toks WHERE len(t) >= 3
),
hx AS (SELECT DISTINCT doc_id, {token_hash_sql('gram')} % {MINHASH_P} AS x FROM grams),
sizes AS (SELECT doc_id, count(*) AS n FROM hx GROUP BY doc_id),
dfreq AS (SELECT x, count(*) AS df FROM hx GROUP BY x),
ranked AS (
  SELECT h.doc_id, h.x, s.n,
         row_number() OVER (PARTITION BY h.doc_id ORDER BY d.df, h.x) AS pos
  FROM hx h JOIN dfreq d ON d.x = h.x JOIN sizes s ON s.doc_id = h.doc_id
),
prefix AS (SELECT doc_id, x FROM ranked WHERE pos <= n - ((3 * n + 4) // 5) + 1),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM prefix a JOIN prefix b ON a.x = b.x AND a.doc_id < b.doc_id
),
inter AS (
  SELECT p.doc_a, p.doc_b, count(*) AS n_inter
  FROM pairs p
  JOIN hx ga ON ga.doc_id = p.doc_a
  JOIN hx gb ON gb.doc_id = p.doc_b AND gb.x = ga.x
  GROUP BY p.doc_a, p.doc_b
)
SELECT i.doc_a, i.doc_b,
       floor(cast(n_inter AS double) / (sa.n + sb.n - n_inter) * 1000000 + 0.5)
         / 1000000 AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE cast(n_inter AS double) / (sa.n + sb.n - n_inter) >= {_JACCARD_THRESHOLD}
"""


@register(
    "dedup_jaccard_prefix_filter",
    oracle=_prefix_filter_oracle(),
    tags=("extension", "dedup", "prefix-filter"),
)
def dedup_jaccard_prefix_filter(spark, sf_dir):
    """Exact near-dup pairs (Jaccard >= 0.6) via PPJoin-style prefix
    filtering — the third scale family next to LSH banding (probabilistic)
    and the full shingle self-join (exact but joins on every shingle):
    sort each hashed shingle set rarest-first, join only on the first
    |s| - ceil(0.6|s|) + 1 elements. Complete by the prefix-filter
    theorem (operators/dedup.py:prefix_filter_candidates), so unlike
    MinHash this loses NOTHING, yet the join keys are the rarest ~40% of
    each set — hot shingles (the skew risk dedup_ngram_jaccard documents)
    are structurally excluded from the join. Verification reuses the
    in-row array_intersect path shared with the MinHash query."""

    d = read_table(spark, sf_dir, "documents")
    sets = doc_shingle_hash_sets(d).transform(cut_lazy)
    pairs = prefix_filter_candidates(sets, t_num=3, t_den=5)
    verified = jaccard_verify_sets(pairs, sets)
    return verified.where(F.col("jaccard_raw") >= _JACCARD_THRESHOLD).select(
        "doc_a", "doc_b", round_half_up(F.col("jaccard_raw"), 6).alias("jaccard")
    )


# --- SimHash near-dup pairs -------------------------------------------------------


def _simhash_oracle() -> str:
    h = token_hash_sql("tok")
    sum_cols = ",\n         ".join(
        f"sum(((h >> {b}) & 1) * 2 - 1) AS s{b}" for b in range(SIMHASH_BITS)
    )
    sh_expr = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(SIMHASH_BITS)
    )
    nib_mask = (1 << SIMHASH_BAND_BITS) - 1
    band_selects = "\n  UNION ALL ".join(
        f"SELECT doc_id, simhash, {k} AS band_idx,"
        f" (simhash >> {k * SIMHASH_BAND_BITS}) & {nib_mask} AS band_key FROM sh"
        for k in range(SIMHASH_BANDS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_distinct(string_split_regex(lower(trim(text)), '[ \\t\\n\\r\\f]+'))) AS tok
  FROM documents
),
h AS (SELECT doc_id, {h} AS h FROM toks),
sums AS (SELECT doc_id, {sum_cols} FROM h GROUP BY doc_id),
sh AS (SELECT doc_id, cast({sh_expr} AS bigint) AS simhash FROM sums),
bands AS ({band_selects}),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         cast(bit_count(xor(a.simhash, b.simhash)) AS integer) AS hamming
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= {SIMHASH_MAX_HAMMING}
"""


@register("dedup_simhash", oracle=_simhash_oracle(), tags=("extension", "dedup", "simhash"))
def dedup_simhash(spark, sf_dir):
    """SimHash (32-bit, word unigrams) near-dup pairs with hamming <= 3 via
    byte banding — pigeonhole over 4 bands guarantees no true pair is
    missed by the band equi-join, so LSH here is exact, not approximate."""
    d = read_table(spark, sf_dir, "documents")
    sh = simhash(d)
    return simhash_near_pairs(sh).select(
        "doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming")
    )


# --- near-dup clusters: connected components over the pair graph ------------------


def _clusters_oracle() -> str:
    return f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({_NGRAM_ORACLE}) t
),
sym AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach(node, target) AS (
  SELECT s, s FROM sym
  UNION
  SELECT r.node, y.d FROM reach r JOIN sym y ON y.s = r.target
)
SELECT node AS doc_id, min(target) AS cluster_rep
FROM reach GROUP BY node
"""


@register("dedup_clusters", oracle=_clusters_oracle(), tags=("extension", "dedup", "iterative"))
def dedup_clusters(spark, sf_dir):
    """Near-duplicate CLUSTERS: connected components over the Jaccard>=0.6
    pair graph via iterative min-label propagation (operators/dedup.py) —
    the engine's iterative-algorithm path, checked against a recursive-CTE
    transitive closure in the oracle. Every clustered doc maps to its
    cluster representative (min doc_id)."""
    from ..operators.dedup import connected_components

    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    return connected_components(pairs).select(
        F.col("node").alias("doc_id"), "cluster_rep"
    )


# --- survivors: the corpus after near-dup removal ----------------------------------


def _survivors_oracle() -> str:
    return f"""
WITH dropped AS (
  SELECT doc_id FROM ({_clusters_oracle()}) c WHERE doc_id != cluster_rep
)
SELECT d.doc_id
FROM documents d LEFT JOIN dropped x ON d.doc_id = x.doc_id
WHERE x.doc_id IS NULL
"""


@register("dedup_survivors", oracle=_survivors_oracle(), tags=("extension", "dedup"))
def dedup_survivors(spark, sf_dir):
    """The deduplicated corpus itself — the artifact a training pipeline
    actually consumes: every unclustered document plus each near-dup
    cluster's canonical representative (min doc_id). Composes pair
    generation -> connected components -> anti-join; the anti-join is on
    doc_id, so it co-partitions with any downstream doc_id-keyed work."""
    from ..operators.dedup import connected_components

    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    dropped = (
        connected_components(pairs)
        .where(F.col("node") != F.col("cluster_rep"))
        .select(F.col("node").alias("doc_id"))
    )
    d = read_table(spark, sf_dir, "documents").select("doc_id")
    return d.join(dropped, "doc_id", "left_anti")


# --- quality-aware survivor selection ---------------------------------------------


def _quality_survivors_oracle() -> str:
    # the quality CTE duplicates text_quality_score's formula verbatim
    # (ext_text.py) — keep the two in sync
    return f"""
WITH quality AS (
  SELECT doc_id,
         floor((0.5 * least(cast(length(text) AS double) / 400.0, 1.0)
              + 0.3 * least(cast(len(string_split_regex(trim(text), '[ \\t\\n\\r\\f]+'))
                                 AS double) / 80.0, 1.0)
              + 0.2 * (1.0 - least(
                    cast(len(regexp_extract_all(text, '[^a-zA-Z0-9 \\t\\n\\r\\f]')) AS double)
                    / cast(len(string_split_regex(trim(text), '[ \\t\\n\\r\\f]+')) AS double),
                    1.0))) * 10000 + 0.5) / 10000 AS quality_score
  FROM documents
),
members AS (
  SELECT c.doc_id, c.cluster_rep, q.quality_score
  FROM ({_clusters_oracle()}) c JOIN quality q ON q.doc_id = c.doc_id
),
best AS (
  SELECT doc_id FROM members
  QUALIFY row_number() OVER (PARTITION BY cluster_rep
                             ORDER BY quality_score DESC, doc_id) = 1
),
dropped AS (
  SELECT m.doc_id FROM members m LEFT JOIN best b ON b.doc_id = m.doc_id
  WHERE b.doc_id IS NULL
)
SELECT d.doc_id, q.quality_score,
       (m.doc_id IS NOT NULL) AS was_clustered
FROM documents d
JOIN quality q ON q.doc_id = d.doc_id
LEFT JOIN members m ON m.doc_id = d.doc_id
LEFT JOIN dropped x ON x.doc_id = d.doc_id
WHERE x.doc_id IS NULL
"""


@register(
    "dedup_survivors_by_quality",
    oracle=_quality_survivors_oracle(),
    tags=("extension", "dedup", "quality"),
)
def dedup_survivors_by_quality(spark, sf_dir):
    """Quality-aware dedup: each near-dup cluster keeps its HIGHEST-quality
    member (tie-break lowest doc_id) instead of the arbitrary min-id rep —
    what a pretraining pipeline actually wants, since boilerplate clusters
    usually contain one clean copy and many mangled ones. Composes the
    cluster assignment with the quality score, picks the winner with a
    cluster-partitioned row_number (clusters are small, the window never
    degenerates), and anti-joins the losers off the corpus. Quality scores
    are convention-rounded doubles, so the DESC ordering agrees with the
    oracle bit-for-bit."""
    from pyspark.sql import Window

    from ..operators.dedup import connected_components
    from .ext_text import text_quality_score

    quality = text_quality_score(spark, sf_dir).select("doc_id", "quality_score")
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    members = (
        connected_components(pairs)
        .select(F.col("node").alias("doc_id"), "cluster_rep")
        .join(quality, "doc_id")
    )
    w = Window.partitionBy("cluster_rep").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    dropped = (
        members.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") > 1)
        .select("doc_id")
    )
    d = read_table(spark, sf_dir, "documents").select("doc_id")
    clustered = members.select("doc_id", F.lit(True).alias("was_clustered"))
    return (
        d.join(dropped, "doc_id", "left_anti")
        .join(quality, "doc_id")
        .join(clustered, "doc_id", "left")
        .select(
            "doc_id",
            "quality_score",
            F.coalesce(F.col("was_clustered"), F.lit(False)).alias("was_clustered"),
        )
    )


# --- triangle counting over the near-dup graph ------------------------------------


@register(
    "dedup_graph_triangles",
    oracle=f"""
WITH pairs AS ({_NGRAM_ORACLE}),
e AS (SELECT doc_a AS s1, doc_b AS s2 FROM pairs)
SELECT cast((SELECT count(*) FROM e) AS bigint) AS n_edges,
       cast((SELECT count(*)
             FROM e e1 JOIN e e2 ON e2.s1 = e1.s2
                       JOIN e e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2) AS bigint)
         AS n_triangles
""",
    tags=("extension", "dedup", "graph"),
)
def dedup_graph_triangles(spark, sf_dir):
    """Triangle count over the near-duplicate graph — the cohesion metric
    for dedup QA: triangle-dense components are true boilerplate families,
    triangle-free chains are transitive-similarity artifacts worth manual
    review. Distributed triangle counting in its standard two-join form:
    edges are canonically ordered (doc_a < doc_b, guaranteed by the pair
    generator), wedges come from joining edge lists on the shared middle
    vertex, and a final join closes each wedge — every join an equi-join
    on vertex keys, so the whole count is hash-partitioned work with no
    vertex ever needing global state. Each triangle is counted exactly
    once thanks to the canonical ordering."""
    e = dedup_ngram_jaccard(spark, sf_dir).select(
        F.col("doc_a").alias("s1"), F.col("doc_b").alias("s2")
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    wedges = e1.join(e2, F.col("e2.s1") == F.col("e1.s2"))
    tri = wedges.join(
        e3,
        (F.col("e3.s1") == F.col("e1.s1")) & (F.col("e3.s2") == F.col("e2.s2")),
    )
    n_tri = tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    n_edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return n_edges.crossJoin(n_tri).select("n_edges", "n_triangles")


# --- FastSS fuzzy match (deletion-neighborhood blocking) ---------------------------

_FASTSS_ORACLE = """
WITH v AS (
  SELECT c_custkey, c_name,
         unnest(list_distinct(
           [c_name] || list_transform(range(1, len(c_name) + 1),
             i -> substr(c_name, 1, i - 1) || substr(c_name, i + 1, len(c_name)))
         )) AS variant
  FROM customer
),
cand AS (
  SELECT DISTINCT a.c_custkey AS cust1, a.c_name AS name1,
                  b.c_custkey AS cust2, b.c_name AS name2
  FROM v a JOIN v b ON a.variant = b.variant AND a.c_custkey < b.c_custkey
)
SELECT cust1, cust2, name1, name2,
       cast(levenshtein(name1, name2) AS bigint) AS dist
FROM cand
WHERE levenshtein(name1, name2) <= 1
"""


@register(
    "fuzzy_match_customer_names",
    oracle=_FASTSS_ORACLE,
    tags=("extension", "dedup", "linkage", "fastss"),
)
def fuzzy_match_customer_names(spark, sf_dir):
    """Record linkage at edit distance <= 1 via FastSS deletion
    neighborhoods — the exact algorithm for small-radius fuzzy joins
    (Bocek et al. 2007): every name emits itself plus each single-character
    deletion; two names within one edit MUST share a variant (substitution
    -> same-position deletions agree; insertion/deletion -> one side's full
    string equals the other's deletion), so the equi-join on the variant
    key yields a complete candidate set and ``levenshtein`` verifies
    exactly.

    This is a third blocking family next to MinHash-LSH (set overlap) and
    SimHash bands (Hamming): edit-distance blocking with zero recall loss.
    Scale: ~(len+1) variants per record, join keys are near-unique (a
    variant groups only records one edit apart — no hot blocks, unlike
    prefix or sorted-neighborhood blocking on skewed name distributions),
    and the verify runs on candidates only, never all pairs."""
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    # join key = 64-bit hash of the variant, not the variant string: the
    # shuffle moves 8-byte keys instead of ~20-char strings, and a hash
    # collision merely adds a candidate the exact levenshtein verify
    # filters — output identical, recall still complete
    v = c.select(
        "c_custkey",
        "c_name",
        F.explode(
            F.expr(
                "array_union(array(c_name),"
                " transform(sequence(1, length(c_name)),"
                "   i -> concat(substr(c_name, 1, i - 1), substr(c_name, i + 1))))"
            )
        ).alias("variant"),
    ).select("c_custkey", "c_name", F.xxhash64("variant").alias("vh"))
    a = v.alias("a")
    b = v.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.vh") == F.col("b.vh"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(
            F.col("a.c_custkey").alias("cust1"),
            F.col("a.c_name").alias("name1"),
            F.col("b.c_custkey").alias("cust2"),
            F.col("b.c_name").alias("name2"),
        )
    )
    dist = F.levenshtein(F.col("name1"), F.col("name2"))
    # verify BEFORE dedup: levenshtein is an in-row codegen'd expression,
    # so filtering the raw candidate stream first shrinks the distinct
    # shuffle from every (pair x shared variant) to the matched pairs only
    # (a wide-row distinct on the full candidate stream was ~70% of the
    # operator's cost at sf0.1)
    return (
        cand.where(dist <= 1)
        .select(
            "cust1", "cust2", "name1", "name2", dist.cast("long").alias("dist")
        )
        .distinct()
    )


# --- asymmetric containment near-dup pairs -------------------------------------------

_CONTAIN_THRESHOLD = 0.8

_CONTAIN_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '[ \\t\\n\\r\\f]+') AS t
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
  SELECT doc_id, cast(count(*) AS bigint) AS n FROM grams GROUP BY doc_id
),
inter AS (
  SELECT a.doc_id AS contained_doc, b.doc_id AS container_doc,
         cast(count(*) AS bigint) AS n_inter
  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id <> b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT contained_doc, container_doc, n_inter, sa.n AS n_contained,
       floor(cast(n_inter AS double) / sa.n * 1000000 + 0.5) / 1000000 AS containment
FROM inter JOIN sizes sa ON contained_doc = sa.doc_id
WHERE cast(n_inter AS double) / sa.n >= {_CONTAIN_THRESHOLD}
"""


@register(
    "dedup_containment_pairs",
    oracle=_CONTAIN_ORACLE,
    tags=("extension", "dedup", "containment"),
)
def dedup_containment_pairs(spark, sf_dir):
    """Asymmetric containment near-dup pairs (Broder 1997's containment
    c(A,B) = |A n B| / |A| over 3-gram shingles): catches a document
    EMBEDDED in a larger one — quote-plus-commentary, boilerplate-wrapped
    copies — which symmetric Jaccard misses entirely (a small doc inside
    a big one has low Jaccard but containment 1.0). Ordered pairs with
    c >= 0.8; the contained side's shingle count rides along.

    Plan: the same inverted-index pair generator as dedup_ngram_jaccard
    (shingle equi-join, pair-keyed count) with the contained side's size
    broadcast back; the scale path is the PPJoin-family prefix filter
    adapted to containment (an L-prefix bound on the CONTAINED side
    only), the same machinery as operators/dedup.py:174 — at bench
    corpus sizes the exact generator is the honest baseline, as with
    the Jaccard twin.

    Exactness: intersection and size counts are exact int64; one double
    division, floor-quantized to 1e-6."""
    d = read_table(spark, sf_dir, "documents")
    grams = doc_shingles(d)
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    b = grams.select(F.col("doc_id").alias("container_doc"), "gram")
    inter = (
        grams.select(F.col("doc_id").alias("contained_doc"), "gram")
        .join(b, "gram")
        .where(F.col("contained_doc") != F.col("container_doc"))
        .groupBy("contained_doc", "container_doc")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("contained_doc"), F.col("n").alias("n_contained"))
    c = F.col("n_inter").cast("double") / F.col("n_contained")
    return (
        inter.join(F.broadcast(sa), "contained_doc")
        .where(c >= _CONTAIN_THRESHOLD)
        .select(
            "contained_doc",
            "container_doc",
            "n_inter",
            "n_contained",
            (F.floor(c * 1000000 + 0.5) / 1000000).alias("containment"),
        )
    )
