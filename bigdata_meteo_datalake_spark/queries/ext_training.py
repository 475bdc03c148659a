"""Training-data pipeline operators (SURVEY.md section 2.7 north star):
deterministic dataset splitting, sequence packing, source mixing, and
benchmark-contamination checks — the operations between "deduped corpus"
and "training batches". All hash-deterministic (md5-derived), so every one
is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.dedup import token_hash, token_hash_sql
from ..sources.lake import read_table
from . import register

# --- deterministic train/val/test split ---------------------------------------------


@register(
    "train_val_test_split",
    oracle=f"""
WITH b AS (
  SELECT doc_id,
         {token_hash_sql("cast(doc_id AS varchar)")} % 100 AS bucket
  FROM documents
)
SELECT doc_id,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split
FROM b
""",
    tags=("extension", "training", "split"),
)
def train_val_test_split(spark, sf_dir):
    """80/10/10 split by a content-stable hash bucket — membership is a
    pure function of the id, so re-runs, backfills, and different cluster
    sizes all agree (never rand()/randomSplit for dataset membership)."""
    d = read_table(spark, sf_dir, "documents")
    bucket = token_hash(F.col("doc_id").cast("string")) % 100
    return d.select(
        "doc_id",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
    )


# --- sequence packing under a token budget ------------------------------------------

_PACK_BUDGET = 512


_PACK_SHARDS = 16


@register(
    "pack_documents_token_budget",
    oracle=f"""
WITH toks AS (
  SELECT doc_id,
         {token_hash_sql("cast(doc_id AS varchar)")} % {_PACK_SHARDS} AS shard,
         cast(len(string_split_regex(trim(text), '[ \\t\\n\\r\\f]+')) AS bigint) AS n_tokens
  FROM documents
),
runs AS (
  SELECT doc_id, shard, n_tokens,
         sum(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
  FROM toks
)
SELECT doc_id, shard, n_tokens,
       cast(shard * 1000000 + floor((cum - 1) / {_PACK_BUDGET}) AS bigint) AS pack_id
FROM runs
""",
    tags=("extension", "training", "packing"),
)
def pack_documents_token_budget(spark, sf_dir):
    """Greedy sequence packing: documents in id order are assigned to packs
    by running token count / budget. The running sum is computed per shard
    (a deterministic hash bucket of doc_id) — packs never need to span
    shards, so the window is ``partitionBy(shard)`` and every shard packs
    in parallel; a partition-less window would serialize the whole corpus
    onto one task. pack_id composes (shard, pack-within-shard) so ids stay
    globally unique and reproducible across runs and cluster sizes."""
    d = read_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"[ \t\n\r\f]+")).cast("long")
    shard = token_hash(F.col("doc_id").cast("string")) % _PACK_SHARDS
    toks = d.select("doc_id", shard.alias("shard"), n_tokens.alias("n_tokens"))
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pack_in_shard = F.floor((F.sum("n_tokens").over(w) - 1) / _PACK_BUDGET)
    return toks.select(
        "doc_id",
        "shard",
        "n_tokens",
        (F.col("shard") * 1000000 + pack_in_shard).cast("long").alias("pack_id"),
    )


# --- deterministic source mixing -----------------------------------------------------


@register(
    "mix_sources_deterministic",
    oracle=f"""
WITH b AS (
  SELECT doc_id, source,
         {token_hash_sql("cast(doc_id AS varchar)")} % 100 AS bucket
  FROM documents
),
kept AS (
  SELECT doc_id, source FROM b
  WHERE (source IN ('src0','src1','src2') AND bucket < 100)
     OR (source NOT IN ('src0','src1','src2') AND bucket < 25)
)
SELECT source, cast(count(*) AS bigint) AS n_docs
FROM kept GROUP BY source
""",
    tags=("extension", "training", "mixing"),
)
def mix_sources_deterministic(spark, sf_dir):
    """Source-weighted corpus mixing: keep 100% of the priority sources and
    a deterministic 25% hash-sample of the rest — the up/down-sampling step
    of corpus recipes, reproducible across runs by construction."""
    d = read_table(spark, sf_dir, "documents")
    bucket = token_hash(F.col("doc_id").cast("string")) % 100
    priority = F.col("source").isin("src0", "src1", "src2")
    kept = d.where((priority & (bucket < 100)) | (~priority & (bucket < 25)))
    return kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))


# --- benchmark-contamination check ---------------------------------------------------

_CONTAM_ORACLE = """
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
bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id < 10),
scored AS (
  SELECT g.doc_id,
         count(*) AS n_grams,
         cast(sum(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS bigint) AS n_hit
  FROM grams g LEFT JOIN bench b ON g.gram = b.gram
  WHERE g.doc_id >= 10
  GROUP BY g.doc_id
)
SELECT doc_id,
       floor(cast(n_hit AS double) / n_grams * 10000 + 0.5) / 10000 AS contamination,
       (cast(n_hit AS double) / n_grams >= 0.8) AS is_contaminated
FROM scored
"""


@register("benchmark_contamination", oracle=_CONTAM_ORACLE, tags=("extension", "training", "contamination"))
def benchmark_contamination(spark, sf_dir):
    """Benchmark-contamination scan: fraction of each corpus document's
    distinct 3-gram shingles that appear anywhere in the benchmark set
    (docs 0-9 stand in). The benchmark gram set broadcasts; the corpus side
    never shuffles — the shape that scales to a 100 TB crawl vs a fixed
    eval suite."""
    from ..operators.dedup import doc_shingles

    d = read_table(spark, sf_dir, "documents")
    grams = doc_shingles(d)
    bench = (
        grams.where(F.col("doc_id") < 10).select("gram").distinct()
        .withColumn("__hit", F.lit(1))
    )
    corpus = grams.where(F.col("doc_id") >= 10)
    scored = (
        corpus.join(F.broadcast(bench), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("long").alias("n_hit"),
        )
    )
    ratio = F.col("n_hit").cast("double") / F.col("n_grams")
    from ..functions.numeric import round_half_up

    return scored.select(
        "doc_id",
        round_half_up(ratio, 4).alias("contamination"),
        (ratio >= 0.8).alias("is_contaminated"),
    )


# --- corpus-calibrated quality filtering ---------------------------------------------


@register(
    "quality_percentile_filter",
    oracle="""
WITH thr AS (SELECT quantile_cont(n_chars, 0.25) AS p25 FROM documents)
SELECT d.doc_id,
       d.n_chars,
       floor(t.p25 * 10000 + 0.5) / 10000 AS p25_threshold
FROM documents d CROSS JOIN thr t
WHERE d.n_chars >= t.p25
""",
    tags=("extension", "training", "quality"),
)
def quality_percentile_filter(spark, sf_dir):
    """Corpus-calibrated quality filter: drop the shortest quartile, where
    the threshold is the corpus's own exact interpolated p25 — the two-pass
    shape (tiny global aggregate, broadcast back over the scan) every
    distribution-relative filter uses at 100 TB. The p25 interpolation
    weights are dyadic (0/.25/.5/.75), so Spark's percentile() and
    DuckDB's quantile_cont() agree bit-for-bit on integer inputs."""
    from ..functions.numeric import round_half_up

    d = read_table(spark, sf_dir, "documents")
    thr = d.agg(F.expr("percentile(n_chars, 0.25)").alias("p25"))
    return (
        d.crossJoin(F.broadcast(thr))
        .where(F.col("n_chars") >= F.col("p25"))
        .select(
            "doc_id",
            "n_chars",
            round_half_up(F.col("p25"), 4).alias("p25_threshold"),
        )
    )


# --- document chunking (fixed window + stride) ---------------------------------------

_CHUNK_SIZE = 64
_CHUNK_STRIDE = 48


@register(
    "chunk_documents_stride",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '[ \\t\\n\\r\\f]+') AS t FROM documents
)
SELECT doc_id,
       cast(s // {_CHUNK_STRIDE} AS bigint) AS chunk_idx,
       cast(len(t[s+1:s+{_CHUNK_SIZE}]) AS integer) AS n_chunk_tokens,
       array_to_string(t[s+1:s+{_CHUNK_SIZE}], ' ') AS chunk_text
FROM toks, unnest(range(0, len(t), {_CHUNK_STRIDE})) AS u(s)
""",
    tags=("extension", "training", "chunking"),
)
def chunk_documents_stride(spark, sf_dir):
    """Document chunking into fixed-size overlapping token windows
    (size 64, stride 48) — the context-window preparation step between
    cleaning and packing. Pure array expressions: windows are slices of
    the in-row token array, so the operator is a flatMap over the corpus
    scan with zero shuffles at any scale; chunk identity
    (doc_id, chunk_idx) is deterministic for resumable backfills."""
    d = read_table(spark, sf_dir, "documents")
    t = F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\r\f]+")
    starts = F.sequence(F.lit(0), F.size(t) - 1, F.lit(_CHUNK_STRIDE))
    chunks = d.select(
        "doc_id", t.alias("t"), F.explode(starts).alias("s")
    )
    piece = F.slice(F.col("t"), F.col("s") + 1, _CHUNK_SIZE)
    return chunks.select(
        "doc_id",
        (F.col("s") / _CHUNK_STRIDE).cast("long").alias("chunk_idx"),
        F.size(piece).cast("int").alias("n_chunk_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


# --- per-domain quota sampling -------------------------------------------------------

_QUOTA_PER_DOMAIN = 10


@register(
    "domain_quota_sample",
    oracle=f"""
SELECT doc_id, source,
       cast(row_number() OVER (
         PARTITION BY source
         ORDER BY {token_hash_sql("cast(doc_id AS varchar)")}, doc_id
       ) AS bigint) AS domain_rank
FROM documents
QUALIFY domain_rank <= {_QUOTA_PER_DOMAIN}
""",
    tags=("extension", "training", "sampling"),
)
def domain_quota_sample(spark, sf_dir):
    """Per-domain quota sampling: cap every source domain at N documents,
    chosen by deterministic hash order (not arrival order, which is
    crawl-dependent; not rand(), which is irreproducible). This is the
    host-level cap crawl pipelines apply so no single domain dominates the
    corpus. The window partitions by domain — per-partition state is one
    domain's docs, and a 100 TB crawl has millions of domains to spread
    across executors."""
    d = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        token_hash(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select(
            "doc_id",
            "source",
            F.row_number().over(w).cast("long").alias("domain_rank"),
        )
        .where(F.col("domain_rank") <= _QUOTA_PER_DOMAIN)
    )


# --- content-defined chunking (rolling-hash boundaries) ------------------------------

_CDC_MASK = 8  # boundary where hash(3-gram) % 8 == 0 -> ~1 boundary per 8 tokens


@register(
    "chunk_documents_content_defined",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '[ \\t\\n\\r\\f]+') AS t FROM documents
),
bounds AS (
  SELECT doc_id, t,
         [cast(0 AS bigint)]
           || list_transform(
                list_filter(range(1, len(t) - 1),
                            i -> {token_hash_sql("t[i] || ' ' || t[i+1] || ' ' || t[i+2]")}
                                 % {_CDC_MASK} = 0),
                i -> cast(i AS bigint))
           || [cast(len(t) AS bigint)] AS b
  FROM toks
)
SELECT doc_id,
       cast(j AS bigint) AS chunk_idx,
       cast(b[j+1] AS bigint) AS chunk_start,
       cast(b[j+2] - b[j+1] AS integer) AS n_chunk_tokens,
       array_to_string(t[b[j+1]+1:b[j+2]], ' ') AS chunk_text
FROM bounds, unnest(range(0, len(b) - 1)) AS u(j)
WHERE b[j+2] > b[j+1]
""",
    tags=("extension", "training", "chunking"),
)
def chunk_documents_content_defined(spark, sf_dir):
    """Content-defined chunking: a chunk boundary falls BEFORE token i
    whenever the rolling 3-gram hash at i lands in a fixed residue class
    (~1/8 of positions). Unlike fixed-stride windows, inserting or deleting
    a sentence only perturbs the neighboring chunks — every other chunk's
    content (and hash) is unchanged, which is what makes chunk-level dedup
    and embedding caches survive document edits (edit-stability is asserted
    by ``tests/test_session2_ops.py``). Entirely in-row array lambdas
    (filter over positions, slices between successive boundaries): a
    zero-shuffle flatMap at any scale. Duplicate-heavy inputs keep
    identical boundaries, so chunk_text is dedupable downstream."""
    return content_defined_chunks(read_table(spark, sf_dir, "documents"))


def content_defined_chunks(d):
    """The operator itself, over any DataFrame with (doc_id, text)."""
    from ..operators.dedup import token_hash as _th

    t = F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\r\f]+")
    toks = d.select("doc_id", t.alias("t"))
    gram = lambda i: F.concat_ws(
        " ",
        F.element_at(F.col("t"), i),
        F.element_at(F.col("t"), i + F.lit(1)),
        F.element_at(F.col("t"), i + F.lit(2)),
    )
    # guard: Spark sequence(1, n) with n < 1 DESCENDS (DuckDB range is empty)
    positions = F.when(
        F.size(F.col("t")) >= 3, F.sequence(F.lit(1), F.size(F.col("t")) - 2)
    ).otherwise(F.array().cast("array<int>"))
    inner = F.filter(positions, lambda i: _th(gram(i)) % _CDC_MASK == 0)
    bounds = toks.select(
        "doc_id",
        "t",
        F.concat(
            F.array(F.lit(0).cast("long")),
            F.transform(inner, lambda i: i.cast("long")),
            F.array(F.size(F.col("t")).cast("long")),
        ).alias("b"),
    )
    exploded = bounds.select(
        "doc_id",
        "t",
        "b",
        F.explode(F.sequence(F.lit(0), F.size(F.col("b")) - 2)).alias("j"),
    )
    start = F.element_at(F.col("b"), F.col("j") + 1)
    end = F.element_at(F.col("b"), F.col("j") + 2)
    piece = F.slice(F.col("t"), (start + 1).cast("int"), (end - start).cast("int"))
    return (
        exploded.where(end > start)
        .select(
            "doc_id",
            F.col("j").cast("long").alias("chunk_idx"),
            start.cast("long").alias("chunk_start"),
            (end - start).cast("int").alias("n_chunk_tokens"),
            F.concat_ws(" ", piece).alias("chunk_text"),
        )
    )


# --- exact stratified sampling ---------------------------------------------------


@register(
    "stratified_sample_exact",
    oracle=f"""
WITH h AS (
  SELECT event_id, event_type,
         {token_hash_sql("cast(event_id AS varchar)")} AS hv
  FROM events
)
SELECT event_id, event_type FROM h
QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY hv, event_id)
        <= (count(*) OVER (PARTITION BY event_type) + 4) // 5
""",
    tags=("extension", "training", "sampling"),
)
def stratified_sample_exact(spark, sf_dir):
    """Exact-rate stratified sample: EXACTLY ceil(n_g / 5) rows from every
    event_type stratum (20%), chosen by ranking each stratum on the md5
    hash of the row id. ``df.sample``/``sampleBy`` only hit the fraction
    in expectation (binomial per row) and depend on partitioning+seed;
    training-data quotas need the deterministic worst-case-exact form —
    same motivation as train_val_test_split's hash buckets, but with a
    per-stratum cardinality GUARANTEE rather than a per-row probability.

    Scale: one partitioned window per stratum (rank by hash) — the same
    shape as any per-key top-k; no global sort, no driver-side counting.
    ceil is integer arithmetic ((n*1 + 4) div 5) so both engines agree on
    the cutoff for every stratum size."""
    ev = read_table(spark, sf_dir, "events").select("event_id", "event_type")
    hv = token_hash(F.col("event_id").cast("string"))
    w_rank = Window.partitionBy("event_type").orderBy("hv", "event_id")
    w_all = Window.partitionBy("event_type")
    return (
        ev.withColumn("hv", hv)
        .withColumn("rn", F.row_number().over(w_rank))
        .withColumn("cnt", F.count(F.lit(1)).over(w_all))
        .where(F.col("rn") <= F.expr("(cnt + 4) div 5"))
        .select("event_id", "event_type")
    )


# --- cross-split contamination (shingle leakage val/test -> train) -----------------


_LEAK_ORACLE = f"""
WITH split AS (
  SELECT doc_id,
         CASE WHEN {token_hash_sql("cast(doc_id AS varchar)")} % 100 < 80
                THEN 'train'
              WHEN {token_hash_sql("cast(doc_id AS varchar)")} % 100 < 90
                THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '[ \\t\\n\\r\\f]+') AS t FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(t) - 1),
                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS gram
  FROM toks WHERE len(t) >= 3
),
hx AS (
  SELECT g.doc_id, s.split, {token_hash_sql("gram")} % 2147483647 AS x
  FROM grams g JOIN split s ON s.doc_id = g.doc_id
),
train_sh AS (SELECT DISTINCT x FROM hx WHERE split = 'train'),
leaked AS (
  SELECT DISTINCT h.split, h.doc_id
  FROM hx h JOIN train_sh t ON t.x = h.x
  WHERE h.split <> 'train'
)
SELECT s.split, cast(count(*) AS bigint) AS n_docs,
       cast(count(l.doc_id) AS bigint) AS n_leaked_docs,
       floor(cast(count(l.doc_id) AS double) / count(*) * 10000 + 0.5) / 10000
         AS leak_ratio
FROM split s
LEFT JOIN leaked l ON l.split = s.split AND l.doc_id = s.doc_id
WHERE s.split <> 'train'
GROUP BY s.split
"""


@register(
    "split_leakage_report",
    oracle=_LEAK_ORACLE,
    tags=("extension", "training", "dedup", "contamination"),
)
def split_leakage_report(spark, sf_dir):
    """Train-to-eval contamination audit: of the val/test documents (same
    hash-bucket split as ``train_val_test_split``), how many share at least
    one word-3-gram shingle with ANY train document. This is the eval-split
    twin of ``benchmark_contamination`` — run it before trusting a held-out
    loss, because hash-split membership is independent of content, and
    near-duplicate documents land in different splits.

    Scale: the train shingle set stays distributed (distinct on the hashed
    shingle key — one uniform-key shuffle), and the probe is a left-semi
    equi-join of the val/test shingles against it; no doc-level all-pairs
    anywhere. The report is a 2-row aggregate."""
    from ..operators.dedup import doc_shingle_hash_sets

    d = read_table(spark, sf_dir, "documents")
    bucket = token_hash(F.col("doc_id").cast("string")) % 100
    split = d.select(
        "doc_id",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
    )
    hx = (
        doc_shingle_hash_sets(d)
        .select("doc_id", F.explode("xs").alias("x"))
        .join(split, "doc_id")
    )
    train_sh = hx.where(F.col("split") == "train").select("x").distinct()
    leaked = (
        hx.where(F.col("split") != "train")
        .join(train_sh, "x", "left_semi")
        .select("split", "doc_id")
        .distinct()
        .groupBy("split")
        .agg(F.count(F.lit(1)).cast("long").alias("n_leaked_docs"))
    )
    totals = (
        split.where(F.col("split") != "train")
        .groupBy("split")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    return totals.join(leaked, "split", "left").select(
        "split",
        "n_docs",
        F.coalesce(F.col("n_leaked_docs"), F.lit(0)).cast("long").alias(
            "n_leaked_docs"
        ),
        (
            F.floor(
                F.coalesce(F.col("n_leaked_docs"), F.lit(0)).cast("double")
                / F.col("n_docs").cast("double")
                * 10000
                + 0.5
            )
            / 10000
        ).alias("leak_ratio"),
    )


# --- deterministic weighted sampling (quality-proportional) ------------------------


_WS_RATE_PPM = 500_000  # base acceptance rate at weight == 1 (max-length doc)


_WS_ORACLE = f"""
WITH mx AS (SELECT cast(max(n_chars) AS bigint) AS maxc FROM documents)
SELECT doc_id, source, cast(n_chars AS bigint) AS n_chars
FROM documents CROSS JOIN mx
WHERE ({token_hash_sql("concat('ws:', cast(doc_id AS varchar))")} % 1000000) * maxc
      < cast(n_chars AS bigint) * {_WS_RATE_PPM}
"""


@register(
    "weighted_sample_by_quality",
    oracle=_WS_ORACLE,
    tags=("extension", "training", "sampling"),
)
def weighted_sample_by_quality(spark, sf_dir):
    """Weight-proportional Bernoulli sample: each document is kept with
    probability ``rate * n_chars / max(n_chars)`` — the standard
    quality-weighted corpus downsampling, done DETERMINISTICALLY: the coin
    is the doc-id hash (never ``rand()``), and the acceptance test is the
    pure-integer comparison ``(h % 1e6) * maxc < n_chars * rate_ppm`` —
    no floating point anywhere, so membership is reproducible across
    re-runs, engines, and cluster sizes.

    Scale: the max is a singleton aggregate broadcast to the scan; the
    filter is a map-side predicate — zero shuffles beyond the 1-row max."""
    d = read_table(spark, sf_dir, "documents")
    mx = d.agg(F.max("n_chars").cast("long").alias("maxc"))
    h = token_hash(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))) % 1000000
    return (
        d.crossJoin(F.broadcast(mx))
        .where(h * F.col("maxc") < F.col("n_chars").cast("long") * _WS_RATE_PPM)
        .select("doc_id", "source", F.col("n_chars").cast("long").alias("n_chars"))
    )


# --- length-bucketed batching (padding-waste accounting) ---------------------------


_LB_BATCH = 16
_LB_CAPS = [16, 32, 64, 128, 256, 512, 1024]


def _lb_cap_sql(expr: str) -> str:
    cases = " ".join(
        f"WHEN {expr} <= {c} THEN {c}" for c in _LB_CAPS
    )
    return f"CASE {cases} ELSE {2 * _LB_CAPS[-1]} END"


_LB_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         cast(len(string_split_regex(trim(text), '[ \\t\\n\\r\\f]+')) AS bigint) AS n_tokens
  FROM documents
),
b AS (
  SELECT n_tokens, cast({_lb_cap_sql("n_tokens")} AS bigint) AS bucket_cap
  FROM toks
)
SELECT bucket_cap,
       cast(count(*) AS bigint) AS n_docs,
       cast((count(*) + {_LB_BATCH - 1}) // {_LB_BATCH} AS bigint) AS n_batches,
       cast(sum(bucket_cap - n_tokens) AS bigint) AS pad_waste_tokens
FROM b GROUP BY bucket_cap
"""


@register(
    "length_bucket_batches",
    oracle=_LB_ORACLE,
    tags=("extension", "training", "batching"),
)
def length_bucket_batches(spark, sf_dir):
    """Length-bucketed batching plan: documents go to power-of-two token
    buckets (the standard trick that keeps padding bounded below 2x), and
    the report prices it — docs, batches of 16, and total padding
    waste per bucket. Everything is integer arithmetic (the bucket ladder
    is a CASE cascade, the batch count a ceil-div), so the plan hashes
    exactly cross-engine. One map-side projection plus one tiny aggregate;
    the whitespace token count matches pack_documents_token_budget's
    formula so the two operators compose."""
    d = read_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"[ \t\n\r\f]+")).cast("long")
    cap = F.lit(2 * _LB_CAPS[-1])
    for c in reversed(_LB_CAPS):
        cap = F.when(n_tokens <= c, c).otherwise(cap)
    b = d.select(n_tokens.alias("n_tokens"), cap.cast("long").alias("bucket_cap"))
    return b.groupBy("bucket_cap").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.expr(f"cast((count(1) + {_LB_BATCH - 1}) div {_LB_BATCH} AS bigint)").alias(
            "n_batches"
        ),
        F.sum(F.col("bucket_cap") - F.col("n_tokens")).cast("long").alias(
            "pad_waste_tokens"
        ),
    )


# --- temporal-cutoff churn labeling -------------------------------------------------

_CHURN_HOLDOUT_DAYS = 7

_CHURN_ORACLE = f"""
WITH cut AS (SELECT max(ts) - INTERVAL {_CHURN_HOLDOUT_DAYS} DAY AS cutoff
             FROM events)
SELECT user_id,
       cast(sum(CASE WHEN ts < cutoff THEN 1 ELSE 0 END) AS bigint)
         AS n_events_pre,
       cast(sum(CASE WHEN ts < cutoff AND event_type = 'purchase'
                     THEN 1 ELSE 0 END) AS bigint) AS n_purchase_pre,
       cast(round(sum(CASE WHEN ts < cutoff
                           THEN cast(value AS decimal(28,6)) END), 2)
            AS double) AS sum_value_pre,
       cast(count(DISTINCT CASE WHEN ts < cutoff THEN cast(ts AS date) END)
            AS bigint) AS days_active_pre,
       cast(datediff('day',
                     max(CASE WHEN ts < cutoff THEN cast(ts AS date) END),
                     cast(cutoff AS date)) AS int) AS recency_days,
       sum(CASE WHEN ts >= cutoff THEN 1 ELSE 0 END) > 0 AS label_active
FROM events, cut
GROUP BY user_id, cutoff
HAVING sum(CASE WHEN ts < cutoff THEN 1 ELSE 0 END) > 0
"""


@register(
    "churn_label_dataset",
    oracle=_CHURN_ORACLE,
    tags=("extension", "training", "labeling"),
)
def churn_label_dataset(spark, sf_dir):
    """Leakage-safe temporal-cutoff label generation — the supervised-
    dataset factory: features come strictly from BEFORE the cutoff
    (last observed timestamp minus 7 days), the label strictly from the
    holdout week after it. Per user: pre-cutoff event/purchase counts,
    exact-decimal spend, distinct active days, recency in days, and
    ``label_active`` = any holdout-week event. Users first seen inside
    the holdout are excluded (no features to learn from).

    One pass, one shuffle: every feature AND the label are conditional
    aggregates in the same user-keyed groupBy — no self-join of the
    event table against its future. The cutoff is a 1-row broadcast
    (data-derived, so the query is stable across testdata regenerations).

    Scale: user-hash aggregate with map-side combine; the only other
    exchange is the singleton cutoff. Spend sums ride decimal(28,6)."""
    e = read_table(spark, sf_dir, "events")
    cut = e.agg(F.max("ts").alias("mx")).select(
        (F.col("mx") - F.expr(f"INTERVAL {_CHURN_HOLDOUT_DAYS} DAYS")).alias(
            "cutoff"
        )
    )
    pre = F.col("ts") < F.col("cutoff")
    return (
        e.crossJoin(F.broadcast(cut))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(pre, 1).otherwise(0)).cast("long").alias("n_events_pre"),
            F.sum(
                F.when(pre & (F.col("event_type") == "purchase"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_purchase_pre"),
            F.round(
                F.sum(F.when(pre, F.col("value").cast("decimal(28,6)"))), 2
            )
            .cast("double")
            .alias("sum_value_pre"),
            F.countDistinct(F.when(pre, F.col("ts").cast("date")))
            .cast("long")
            .alias("days_active_pre"),
            F.datediff(
                F.max(F.col("cutoff")).cast("date"),
                F.max(F.when(pre, F.col("ts").cast("date"))),
            )
            .cast("int")
            .alias("recency_days"),
            (F.sum(F.when(pre, 0).otherwise(1)) > 0).alias("label_active"),
        )
        .where(F.col("n_events_pre") > 0)
    )


# --- smoothed target encoding -------------------------------------------------------

_TE_ALPHA = 10  # additive-smoothing pseudo-count toward the global prior

_TE_ORACLE = f"""
WITH base AS (
  SELECT c.c_mktsegment AS segment,
         CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
g AS (SELECT cast(sum(y) AS bigint) AS pos_all,
             cast(count(*) AS bigint) AS n_all FROM base)
SELECT segment,
       cast(count(*) AS bigint) AS n_orders,
       cast(sum(y) AS bigint) AS n_pos,
       floor(cast(sum(y) AS double) / count(*) * 1000000 + 0.5) / 1000000
         AS raw_rate,
       floor((cast(sum(y) AS double)
              + {_TE_ALPHA} * (cast(pos_all AS double) / n_all))
             / (count(*) + {_TE_ALPHA}) * 1000000 + 0.5) / 1000000
         AS encoded
FROM base, g
GROUP BY segment, pos_all, n_all
"""


@register(
    "target_encoding_smoothed",
    oracle=_TE_ORACLE,
    tags=("extension", "training", "features"),
)
def target_encoding_smoothed(spark, sf_dir):
    """Smoothed target encoding — the standard categorical feature for
    tabular models: per market segment, the rate of finished orders
    shrunk toward the global prior with 10 pseudo-counts
    (``(pos + a*prior) / (n + a)``), so rare categories don't memorize
    their few labels. Output per category: counts, raw rate, encoded
    value. (Per-fold / leave-one-out variants reuse this exact plan with
    the split column from train_val_test_split as an extra grouping key.)

    Determinism: integer counts aggregate exactly; the prior and the
    encoded value are each one double division + half-up rounding,
    identical in both engines.

    Scale: fact-side hash aggregate with a broadcast customer dimension
    join and a 1-row global-prior broadcast — the fact never shuffles
    twice."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), F.col("c_mktsegment").alias("segment")
    )
    base = o.join(F.broadcast(c), "o_custkey").select(
        "segment",
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    g = base.agg(
        F.sum("y").cast("long").alias("pos_all"),
        F.count(F.lit(1)).cast("long").alias("n_all"),
    )
    from ..functions.numeric import round_half_up

    prior = F.col("pos_all").cast("double") / F.col("n_all")
    return (
        base.crossJoin(F.broadcast(g))
        .groupBy("segment", "pos_all", "n_all")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("y").cast("long").alias("n_pos"),
        )
        .select(
            "segment",
            "n_orders",
            "n_pos",
            round_half_up(
                F.col("n_pos").cast("double") / F.col("n_orders"), 6
            ).alias("raw_rate"),
            round_half_up(
                (F.col("n_pos").cast("double") + _TE_ALPHA * prior)
                / (F.col("n_orders") + _TE_ALPHA),
                6,
            ).alias("encoded"),
        )
    )


# --- deterministic A/B assignment + uplift readout ----------------------------------

_AB_ORACLE = f"""
WITH assign AS (
  SELECT user_id,
         cast({token_hash_sql("concat('ab1|', cast(user_id AS varchar))")}
              % 2 AS int) AS arm
  FROM (SELECT DISTINCT user_id FROM events)
),
agg AS (
  SELECT a.arm,
         cast(count(DISTINCT e.user_id) AS bigint) AS n_users,
         cast(sum(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END)
              AS bigint) AS n_purchases,
         cast(count(*) AS bigint) AS n_events
  FROM events e JOIN assign a USING (user_id)
  GROUP BY a.arm
)
SELECT arm, n_users, n_purchases, n_events,
       floor(cast(n_purchases AS double) / n_users * 1000000 + 0.5) / 1000000
         AS purchases_per_user
FROM agg
"""


@register(
    "ab_assignment_report",
    oracle=_AB_ORACLE,
    tags=("extension", "training", "experimentation"),
)
def ab_assignment_report(spark, sf_dir):
    """Deterministic A/B experiment assignment + readout: users hash into
    two arms by md5 of a salted key (rerun-stable, no stored assignment
    table needed — the hash IS the table), then per arm: user count,
    purchase count, events, purchases per user. The uplift between arms
    of an un-treated metric doubles as the experiment's A/A sanity check.

    Scale: the assignment is an in-row hash on the event stream (no join
    against an assignment table at all — the oracle's explicit join is
    the semantic spec, the Spark plan fuses it into the scan); one
    user-keyed aggregate then a 2-group rollup."""
    e = read_table(spark, sf_dir, "events")
    arm = (
        token_hash(F.concat(F.lit("ab1|"), F.col("user_id").cast("string"))) % 2
    ).cast("int")
    per_user = (
        e.select("user_id", "event_type", arm.alias("arm"))
        .groupBy("arm", "user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ev"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("n_pur"),
        )
    )
    from ..functions.numeric import round_half_up

    return per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("n_pur").cast("long").alias("n_purchases"),
        F.sum("n_ev").cast("long").alias("n_events"),
    ).select(
        "arm",
        "n_users",
        "n_purchases",
        "n_events",
        round_half_up(
            F.col("n_purchases").cast("double") / F.col("n_users"), 6
        ).alias("purchases_per_user"),
    )


# --- split-conformal prediction intervals -------------------------------------------

_CONF_ALPHA_PCT = 0.9

_CONF_ORACLE = f"""
WITH s AS (
  SELECT o_orderpriority AS grp,
         cast(floor(o_totalprice * 100 + 0.5) AS bigint) AS cents,
         o_totalprice AS price,
         {token_hash_sql("cast(o_orderkey AS varchar)")} % 10 AS b
  FROM orders
),
tr AS (
  SELECT grp, cast(sum(cents) AS bigint) AS sc, cast(count(*) AS bigint) AS n_train
  FROM s WHERE b < 6 GROUP BY grp
),
mu AS (SELECT grp, n_train, cast(sc AS double) / (100.0 * n_train) AS mean_price FROM tr),
cal AS (
  SELECT s.grp, mu.n_train, mu.mean_price,
         cast(count(*) AS bigint) AS n_cal,
         quantile_cont(abs(s.price - mu.mean_price), {_CONF_ALPHA_PCT}) AS q_res
  FROM s JOIN mu ON s.grp = mu.grp
  WHERE s.b >= 6 AND s.b < 8
  GROUP BY s.grp, mu.n_train, mu.mean_price
),
test AS (
  SELECT s.grp,
         cast(count(*) AS bigint) AS n_test,
         cast(sum(CASE WHEN abs(s.price - cal.mean_price) <= cal.q_res
                       THEN 1 ELSE 0 END) AS bigint) AS n_covered
  FROM s JOIN cal ON s.grp = cal.grp
  WHERE s.b >= 8
  GROUP BY s.grp
)
SELECT cal.grp AS priority, cal.n_train, cal.n_cal, test.n_test,
       floor(cal.mean_price * 100 + 0.5) / 100 AS mean_price,
       floor(cal.q_res * 100 + 0.5) / 100 AS q90_residual,
       floor(cast(test.n_covered AS double) / test.n_test * 10000 + 0.5) / 10000
         AS coverage
FROM cal JOIN test ON cal.grp = test.grp
"""


@register(
    "conformal_interval_report",
    oracle=_CONF_ORACLE,
    tags=("extension", "training", "eval", "conformal"),
)
def conformal_interval_report(spark, sf_dir):
    """Split conformal prediction (Papadopoulos et al. / Vovk): a
    group-conditional interval around the train-split group mean, sized
    by the 90th percentile of calibration-split absolute residuals, with
    the empirical test-split coverage beside it — the
    distribution-free-guarantee eval every deployed regressor report
    needs (coverage should land near 0.9 regardless of the price
    distribution). Splits are deterministic hash buckets (60/20/20, the
    train_val_test_split idiom), so reruns reproduce the report.

    Exactness: group means derive from integer-cent sums; residuals are
    fixed IEEE expressions over identical doubles in both engines, so
    the exact interpolated percentile (Spark percentile ==
    DuckDB quantile_cont, the order_price_quantiles idiom) sorts
    identical inputs; coverage compares identical doubles.

    Scale: three conditional aggregates over one fact scan shape (the
    split predicate is in-row), a broadcast of per-group means, and the
    grouped exact percentile — swap percentile_approx in when groups
    get large enough to spill."""
    o = read_table(spark, sf_dir, "orders")
    s = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
        F.col("o_totalprice").alias("price"),
        (token_hash(F.col("o_orderkey").cast("string")) % 10).alias("b"),
    )
    tr = (
        s.where(F.col("b") < 6)
        .groupBy("grp")
        .agg(F.sum("cents").alias("sc"), F.count(F.lit(1)).alias("n_train"))
        .select(
            "grp",
            "n_train",
            (F.col("sc").cast("double") / (100.0 * F.col("n_train"))).alias(
                "mean_price"
            ),
        )
    )
    cal = (
        s.where((F.col("b") >= 6) & (F.col("b") < 8))
        .join(F.broadcast(tr), "grp")
        .groupBy("grp", "n_train", "mean_price")
        .agg(
            F.count(F.lit(1)).alias("n_cal"),
            F.expr(
                f"percentile(abs(price - mean_price), {_CONF_ALPHA_PCT!r})"
            ).alias("q_res"),
        )
    )
    test = (
        s.where(F.col("b") >= 8)
        .join(F.broadcast(cal.select("grp", "mean_price", "q_res")), "grp")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                F.when(
                    F.abs(F.col("price") - F.col("mean_price")) <= F.col("q_res"), 1
                ).otherwise(0)
            ).alias("n_covered"),
        )
    )
    return cal.join(test, "grp").select(
        F.col("grp").alias("priority"),
        "n_train",
        "n_cal",
        "n_test",
        (F.floor(F.col("mean_price") * 100 + 0.5) / 100).alias("mean_price"),
        (F.floor(F.col("q_res") * 100 + 0.5) / 100).alias("q90_residual"),
        (
            F.floor(F.col("n_covered").cast("double") / F.col("n_test") * 10000 + 0.5)
            / 10000
        ).alias("coverage"),
    )


# --- CUPED variance reduction -------------------------------------------------------

_CUPED_CUTOFF = "2024-01-16 00:00:00"
_CUPED_SALT = "cuped-v1"

_CUPED_ORACLE = f"""
WITH u AS (
  SELECT user_id,
         CASE WHEN {token_hash_sql(f"cast(user_id AS varchar) || '|{_CUPED_SALT}'")}
                   % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
         cast(sum(CASE WHEN ts < timestamp '{_CUPED_CUTOFF}'
                       THEN cast(floor(value * 100 + 0.5) AS bigint)
                       ELSE 0 END) AS bigint) AS x,
         cast(sum(CASE WHEN ts >= timestamp '{_CUPED_CUTOFF}'
                       THEN cast(floor(value * 100 + 0.5) AS bigint)
                       ELSE 0 END) AS bigint) AS y
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT cast(count(*) AS bigint) AS n,
         cast(sum(x) AS bigint) AS sx, cast(sum(y) AS bigint) AS sy,
         cast(sum(x * y) AS bigint) AS sxy, cast(sum(x * x) AS bigint) AS sxx
  FROM u
),
th AS (
  SELECT cast(n * sxy - sx * sy AS double) / (n * sxx - sx * sx) AS theta,
         cast(sx AS double) / n AS x_pool
  FROM m
),
arm AS (
  SELECT u.arm, th.theta, th.x_pool,
         cast(count(*) AS bigint) AS n_users,
         cast(sum(u.x) AS bigint) AS asx, cast(sum(u.y) AS bigint) AS asy,
         cast(sum(u.x * u.y) AS bigint) AS asxy,
         cast(sum(u.x * u.x) AS bigint) AS asxx,
         cast(sum(u.y * u.y) AS bigint) AS asyy
  FROM u, th GROUP BY 1, 2, 3
)
SELECT arm, n_users, theta_r, mean_y, mean_y_cuped, var_y, var_y_cuped,
       floor((1 - var_y_cuped / var_y) * 10000 + 0.5) / 10000 AS var_reduction
FROM (
  SELECT arm, n_users,
         floor(theta * 1000000 + 0.5) / 1000000 AS theta_r,
         floor(cast(asy AS double) / n_users + 0.5) / 100 AS mean_y,
         floor((cast(asy AS double) / n_users
                - theta * (cast(asx AS double) / n_users - x_pool)) + 0.5) / 100
           AS mean_y_cuped,
         cast(floor((cast(asyy AS double) / n_users
                - (cast(asy AS double) / n_users) * (cast(asy AS double) / n_users))
               / 10000 + 0.5) AS bigint) AS var_y,
         cast(floor(((cast(asyy AS double) / n_users
                 - (cast(asy AS double) / n_users) * (cast(asy AS double) / n_users))
                - 2 * theta * (cast(asxy AS double) / n_users
                               - (cast(asx AS double) / n_users)
                                 * (cast(asy AS double) / n_users))
                + theta * theta
                  * (cast(asxx AS double) / n_users
                     - (cast(asx AS double) / n_users)
                       * (cast(asx AS double) / n_users)))
               / 10000 + 0.5) AS bigint) AS var_y_cuped
  FROM arm
)
"""


@register(
    "cuped_variance_reduction",
    oracle=_CUPED_ORACLE,
    tags=("extension", "training", "experiment", "cuped"),
)
def cuped_variance_reduction(spark, sf_dir):
    """CUPED (Deng et al. 2013), the industry-standard experiment
    variance reduction: per user, pre-period value (x, the covariate)
    and post-period value (y, the metric), theta = cov(x,y)/var(x)
    POOLED across arms (assignment-independent, so the adjustment is
    unbiased), adjusted metric y - theta(x - x_pool). Per arm: the raw
    and adjusted means, raw and adjusted variances (in whole dollars^2),
    and the variance reduction fraction — the number that says how much
    smaller an experiment this covariate buys.

    Exactness: all moments are int64 sums of integer cents; theta and
    every variance are fixed IEEE expressions over those exact integers.

    Scale: one user-keyed conditional aggregate over the event stream
    (the split predicate is in-row), a 1-row theta broadcast, and a
    2-group arm rollup — no joins on the fact."""
    ev = read_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    pre = F.col("ts") < F.lit(_CUPED_CUTOFF).cast("timestamp")
    u = ev.groupBy(
        "user_id",
        F.when(
            token_hash(
                F.concat(F.col("user_id").cast("string"), F.lit(f"|{_CUPED_SALT}"))
            )
            % 2
            == 0,
            F.lit("A"),
        )
        .otherwise(F.lit("B"))
        .alias("arm"),
    ).agg(
        F.sum(F.when(pre, cents).otherwise(0)).alias("x"),
        F.sum(F.when(~pre, cents).otherwise(0)).alias("y"),
    )
    m = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    th = m.select(
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        ).alias("theta"),
        (F.col("sx").cast("double") / F.col("n")).alias("x_pool"),
    )
    arm = (
        u.crossJoin(F.broadcast(th))
        .groupBy("arm", "theta", "x_pool")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("x").alias("asx"),
            F.sum("y").alias("asy"),
            F.sum(F.col("x") * F.col("y")).alias("asxy"),
            F.sum(F.col("x") * F.col("x")).alias("asxx"),
            F.sum(F.col("y") * F.col("y")).alias("asyy"),
        )
    )
    mx = F.col("asx").cast("double") / F.col("n_users")
    my = F.col("asy").cast("double") / F.col("n_users")
    var_y = F.col("asyy").cast("double") / F.col("n_users") - my * my
    cov = F.col("asxy").cast("double") / F.col("n_users") - mx * my
    var_x = F.col("asxx").cast("double") / F.col("n_users") - mx * mx
    var_c = var_y - 2 * F.col("theta") * cov + F.col("theta") * F.col("theta") * var_x
    vy_r = F.floor(var_y / 10000 + 0.5)
    vc_r = F.floor(var_c / 10000 + 0.5)
    return arm.select(
        "arm",
        "n_users",
        (F.floor(F.col("theta") * 1000000 + 0.5) / 1000000).alias("theta_r"),
        (F.floor(my + 0.5) / 100).alias("mean_y"),
        (F.floor(my - F.col("theta") * (mx - F.col("x_pool")) + 0.5) / 100).alias(
            "mean_y_cuped"
        ),
        vy_r.alias("var_y"),
        vc_r.alias("var_y_cuped"),
        (F.floor((1 - vc_r / vy_r) * 10000 + 0.5) / 10000).alias("var_reduction"),
    )


# --- A/B two-proportion significance test -------------------------------------------

_AB_Z95 = 1.959964  # two-sided 5% normal quantile, published constant

_ABZ_ORACLE = f"""
WITH per_user AS (
  SELECT user_id,
         {token_hash_sql("'ab1|' || cast(user_id AS varchar)")} % 2 AS arm,
         CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * 5
                   > count(*) THEN 1 ELSE 0 END AS converted
  FROM events GROUP BY user_id
),
a AS (
  SELECT cast(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS bigint) AS n_a,
         cast(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS bigint) AS c_a,
         cast(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS bigint) AS n_b,
         cast(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS bigint) AS c_b
  FROM per_user
),
calc AS (
  SELECT n_a, n_b, c_a, c_b,
         cast(c_a AS double) / n_a AS pa,
         cast(c_b AS double) / n_b AS pb,
         cast(c_a + c_b AS double) / (n_a + n_b) AS pp
  FROM a
)
SELECT n_a, n_b,
       floor(pa * 1000000 + 0.5) / 1000000 AS conv_a,
       floor(pb * 1000000 + 0.5) / 1000000 AS conv_b,
       floor((pb - pa) * 1000000 + 0.5) / 1000000 AS uplift,
       floor((pb - pa - {_AB_Z95!r} * sqrt(pa * (1 - pa) / n_a
                                           + pb * (1 - pb) / n_b))
             * 1000000 + 0.5) / 1000000 AS ci_low,
       floor((pb - pa + {_AB_Z95!r} * sqrt(pa * (1 - pa) / n_a
                                           + pb * (1 - pb) / n_b))
             * 1000000 + 0.5) / 1000000 AS ci_high,
       floor((pb - pa) / sqrt(pp * (1 - pp) * (1.0 / n_a + 1.0 / n_b))
             * 1000000 + 0.5) / 1000000 AS z,
       abs((pb - pa) / sqrt(pp * (1 - pp) * (1.0 / n_a + 1.0 / n_b)))
         > {_AB_Z95!r} AS significant
FROM calc
"""


@register(
    "ab_uplift_ztest",
    oracle=_ABZ_ORACLE,
    tags=("extension", "training", "experimentation"),
)
def ab_uplift_ztest(spark, sf_dir):
    """Two-proportion z-test on the A/B arms' user conversion (purchase
    share above the 1-in-5 base rate — a non-degenerate ~50% metric on
    this data) — the significance readout that closes the experimentation
    trio (deterministic assignment -> CUPED variance reduction -> this):
    pooled-SE z statistic, unpooled-SE 95% CI on the uplift, and the
    5%-level verdict. On the untreated synthetic data this doubles as
    the A/A test: it must NOT reject.

    Determinism: conversions are integer counts; every proportion and
    the z/CI chain are fixed IEEE expressions over exact ints; the
    normal quantile is a published literal in both engines.

    Scale: one user-keyed aggregate (the assignment hash fuses into the
    scan), one 4-counter reduction, single-row algebra."""
    e = read_table(spark, sf_dir, "events")
    arm = (
        token_hash(F.concat(F.lit("ab1|"), F.col("user_id").cast("string"))) % 2
    ).cast("int")
    per_user = (
        e.select("user_id", arm.alias("arm"), F.col("event_type"))
        .groupBy("user_id", "arm")
        .agg(
            F.when(
                F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)) * 5
                > F.count(F.lit(1)),
                1,
            )
            .otherwise(0)
            .alias("converted")
        )
    )
    a = per_user.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0)).alias("c_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0)).alias("c_b"),
    )
    pa = F.col("c_a").cast("double") / F.col("n_a")
    pb = F.col("c_b").cast("double") / F.col("n_b")
    pp = (F.col("c_a") + F.col("c_b")).cast("double") / (F.col("n_a") + F.col("n_b"))
    se_un = F.sqrt(pa * (1 - pa) / F.col("n_a") + pb * (1 - pb) / F.col("n_b"))
    z = (pb - pa) / F.sqrt(pp * (1 - pp) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b")))
    r6 = lambda c: F.floor(c * 1000000 + 0.5) / 1000000  # noqa: E731
    return a.select(
        "n_a",
        "n_b",
        r6(pa).alias("conv_a"),
        r6(pb).alias("conv_b"),
        r6(pb - pa).alias("uplift"),
        r6(pb - pa - _AB_Z95 * se_un).alias("ci_low"),
        r6(pb - pa + _AB_Z95 * se_un).alias("ci_high"),
        r6(z).alias("z"),
        (F.abs(z) > _AB_Z95).alias("significant"),
    )


# --- inverse-propensity-weighted treatment effect ------------------------------------

# activity buckets (fixed edges, in-row): total view+click events
_IPW_EDGES = (10, 20, 30, 40)  # 5 segments


_IPW_SEG_SQL = """
CASE WHEN activity < 10 THEN 0 WHEN activity < 20 THEN 1
     WHEN activity < 30 THEN 2 WHEN activity < 40 THEN 3 ELSE 4 END
"""

_IPW_ORACLE = f"""
WITH u AS (
  SELECT user_id,
         cast(sum(CASE WHEN event_type IN ('view', 'click') THEN 1 ELSE 0 END)
              AS bigint) AS activity,
         cast(max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
              AS bigint) AS t,
         cast(sum(CASE WHEN event_type = 'purchase'
                       THEN cast(floor(value * 100 + 0.5) AS bigint)
                       ELSE 0 END) AS bigint) AS y
  FROM events GROUP BY user_id
),
seg AS (
  SELECT {_IPW_SEG_SQL} AS s, t, y FROM u
),
per_seg AS (
  SELECT s, cast(count(*) AS bigint) AS n_s,
         cast(sum(t) AS bigint) AS t_s,
         cast(sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS bigint) AS y1_s,
         cast(sum(CASE WHEN t = 0 THEN y ELSE 0 END) AS bigint) AS y0_s
  FROM seg GROUP BY s
),
-- per-segment inverse-propensity terms, int64-quantized at cent scale
terms AS (
  SELECT cast(sum(n_s) AS bigint) AS n_all,
         cast(sum(t_s) AS bigint) AS t_all,
         cast(sum(y1_s) AS bigint) AS y1_all,
         cast(sum(y0_s) AS bigint) AS y0_all,
         cast(sum(cast(floor(cast(y1_s AS double) * n_s / nullif(t_s, 0) + 0.5)
                       AS bigint)) AS bigint) AS w1,
         cast(sum(cast(floor(cast(y0_s AS double) * n_s / nullif(n_s - t_s, 0)
                             + 0.5) AS bigint)) AS bigint) AS w0
  FROM per_seg
)
SELECT n_all AS n_users, t_all AS n_treated,
       floor(cast(y1_all AS double) / nullif(t_all, 0)
             - cast(y0_all AS double) / nullif(n_all - t_all, 0) + 0.5) / 100
         AS naive_diff,
       floor(cast(w1 AS double) / n_all + 0.5) / 100 AS mu_treated,
       floor(cast(w0 AS double) / n_all + 0.5) / 100 AS mu_control,
       floor(cast(w1 AS double) / n_all
             - cast(w0 AS double) / n_all + 0.5) / 100 AS ate
FROM terms
"""


@register(
    "ipw_treatment_effect",
    oracle=_IPW_ORACLE,
    tags=("extension", "training", "experiment", "causal"),
)
def ipw_treatment_effect(spark, sf_dir):
    """Inverse-propensity-weighted (stratified Hajek) treatment effect
    from observational data: treatment = user ever signed up, outcome =
    total purchase value, propensity = the exact per-activity-segment
    treatment rate (Horvitz-Thompson 1952 / Rosenbaum-Rubin 1983
    stratification). With exact within-stratum propensities the Hajek
    normalizer telescopes to N (sum over strata of t_s * n_s/t_s), so
    mu_hat = sum_s Y_s * n_s/t_s / N — no per-row weights ever
    materialize. The unadjusted difference rides along to show what the
    adjustment moved.

    Exactness: strata sums are exact int64 cents; each stratum's
    inverse-propensity term is one double expression quantized back to
    int cents before the cross-strata sum.

    Scale: one user-keyed conditional aggregate over the fact (map-side
    combined), a 5-row stratum rollup, single-row algebra. Degenerate
    strata (all-treated / all-control) yield NULL terms via explicit
    nullif guards on every denominator — identical in Spark and the
    oracle, so both engines surface NULL rather than diverging
    (DuckDB's IEEE division would otherwise produce inf where Spark's
    non-ANSI Divide gives NULL); a production gate would trim
    propensities."""
    ev = read_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    u = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type").isin("view", "click"), 1).otherwise(0)
        ).alias("activity"),
        F.max(F.when(F.col("event_type") == "signup", 1).otherwise(0)).alias("t"),
        F.sum(
            F.when(F.col("event_type") == "purchase", cents).otherwise(0)
        ).alias("y"),
    )
    s = (
        F.when(F.col("activity") < _IPW_EDGES[0], 0)
        .when(F.col("activity") < _IPW_EDGES[1], 1)
        .when(F.col("activity") < _IPW_EDGES[2], 2)
        .when(F.col("activity") < _IPW_EDGES[3], 3)
        .otherwise(4)
    )
    per_seg = u.select(s.alias("s"), "t", "y").groupBy("s").agg(
        F.count(F.lit(1)).alias("n_s"),
        F.sum("t").alias("t_s"),
        F.sum(F.when(F.col("t") == 1, F.col("y")).otherwise(0)).alias("y1_s"),
        F.sum(F.when(F.col("t") == 0, F.col("y")).otherwise(0)).alias("y0_s"),
    )
    terms = per_seg.agg(
        F.sum("n_s").alias("n_all"),
        F.sum("t_s").alias("t_all"),
        F.sum("y1_s").alias("y1_all"),
        F.sum("y0_s").alias("y0_all"),
        F.sum(
            F.floor(
                F.col("y1_s").cast("double") * F.col("n_s")
                / F.nullif(F.col("t_s"), F.lit(0))
                + 0.5
            ).cast("long")
        ).alias("w1"),
        F.sum(
            F.floor(
                F.col("y0_s").cast("double") * F.col("n_s")
                / F.nullif(F.col("n_s") - F.col("t_s"), F.lit(0))
                + 0.5
            ).cast("long")
        ).alias("w0"),
    )
    return terms.select(
        F.col("n_all").alias("n_users"),
        F.col("t_all").alias("n_treated"),
        (
            F.floor(
                F.col("y1_all").cast("double") / F.nullif(F.col("t_all"), F.lit(0))
                - F.col("y0_all").cast("double")
                / F.nullif(F.col("n_all") - F.col("t_all"), F.lit(0))
                + 0.5
            )
            / 100
        ).alias("naive_diff"),
        (F.floor(F.col("w1").cast("double") / F.col("n_all") + 0.5) / 100).alias(
            "mu_treated"
        ),
        (F.floor(F.col("w0").cast("double") / F.col("n_all") + 0.5) / 100).alias(
            "mu_control"
        ),
        (
            F.floor(
                F.col("w1").cast("double") / F.col("n_all")
                - F.col("w0").cast("double") / F.col("n_all")
                + 0.5
            )
            / 100
        ).alias("ate"),
    )


# --- Simpson's paradox check ---------------------------------------------------------

_SIMPSON_ORACLE = f"""
WITH u AS (
  SELECT user_id,
         cast(sum(CASE WHEN event_type IN ('view', 'click') THEN 1 ELSE 0 END)
              AS bigint) AS activity,
         cast(max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
              AS bigint) AS t,
         cast(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS bigint) AS conv
  FROM events GROUP BY user_id
),
seg AS (
  SELECT {_IPW_SEG_SQL} AS segment, t, conv FROM u
),
per_seg AS (
  SELECT segment,
         cast(sum(t) AS bigint) AS n_t,
         cast(sum(1 - t) AS bigint) AS n_c,
         cast(sum(CASE WHEN t = 1 THEN conv ELSE 0 END) AS bigint) AS conv_t,
         cast(sum(CASE WHEN t = 0 THEN conv ELSE 0 END) AS bigint) AS conv_c
  FROM seg GROUP BY segment
),
allrows AS (
  SELECT segment, n_t, n_c, conv_t, conv_c FROM per_seg
  UNION ALL
  SELECT -1, cast(sum(n_t) AS bigint), cast(sum(n_c) AS bigint),
         cast(sum(conv_t) AS bigint), cast(sum(conv_c) AS bigint)
  FROM per_seg
),
pooled AS (
  -- exact integer sign of the pooled rate difference: conv_t*n_c - conv_c*n_t
  SELECT cast(sign(conv_t * n_c - conv_c * n_t) AS bigint) AS pooled_sign
  FROM allrows WHERE segment = -1
)
SELECT b.segment, b.n_t, b.n_c,
       floor(cast(b.conv_t AS double) / nullif(b.n_t, 0) * 10000 + 0.5) / 10000
         AS rate_t,
       floor(cast(b.conv_c AS double) / nullif(b.n_c, 0) * 10000 + 0.5) / 10000
         AS rate_c,
       cast(sign(b.conv_t * b.n_c - b.conv_c * b.n_t) AS bigint) AS diff_sign,
       (b.segment >= 0
        AND sign(b.conv_t * b.n_c - b.conv_c * b.n_t) * p.pooled_sign < 0)
         AS is_reversed
FROM allrows b, pooled p
"""


@register(
    "simpsons_paradox_check",
    oracle=_SIMPSON_ORACLE,
    tags=("extension", "training", "experiment", "diagnostics"),
)
def simpsons_paradox_check(spark, sf_dir):
    """Simpson's-paradox screen for the signup->conversion comparison:
    per activity stratum (the same strata the IPW estimator uses) the
    treated and control conversion RATES and the exact integer sign of
    their difference, plus the pooled row (segment -1) — a stratum is
    flagged ``is_reversed`` when its direction contradicts the pooled
    direction, the aggregation reversal that makes pooled comparisons
    lie (Simpson 1951; the diagnostic that should gate any pooled
    metric read).

    Exactness: rate-difference signs compare the exact integer cross
    products conv_t*n_c - conv_c*n_t — never two rounded doubles;
    displayed rates are single quantized divisions.

    Scale: one user-keyed conditional aggregate, a 5-row stratum
    rollup, and a 1-row pooled broadcast. Degenerate all-treated /
    all-control strata show NULL rates via identical nullif guards in
    both engines (never inf-vs-NULL divergence)."""
    ev = read_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type").isin("view", "click"), 1).otherwise(0)
        ).alias("activity"),
        F.max(F.when(F.col("event_type") == "signup", 1).otherwise(0)).alias("t"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("conv"),
    )
    s = (
        F.when(F.col("activity") < _IPW_EDGES[0], 0)
        .when(F.col("activity") < _IPW_EDGES[1], 1)
        .when(F.col("activity") < _IPW_EDGES[2], 2)
        .when(F.col("activity") < _IPW_EDGES[3], 3)
        .otherwise(4)
    )
    per_seg = u.select(s.alias("segment"), "t", "conv").groupBy("segment").agg(
        F.sum("t").alias("n_t"),
        F.sum(1 - F.col("t")).alias("n_c"),
        F.sum(F.when(F.col("t") == 1, F.col("conv")).otherwise(0)).alias("conv_t"),
        F.sum(F.when(F.col("t") == 0, F.col("conv")).otherwise(0)).alias("conv_c"),
    )
    pooled_row = per_seg.agg(
        F.lit(-1).cast("int").alias("segment"),
        F.sum("n_t").alias("n_t"),
        F.sum("n_c").alias("n_c"),
        F.sum("conv_t").alias("conv_t"),
        F.sum("conv_c").alias("conv_c"),
    )
    both = per_seg.select(
        F.col("segment").cast("int").alias("segment"), "n_t", "n_c", "conv_t", "conv_c"
    ).unionByName(pooled_row)
    cross = F.col("conv_t") * F.col("n_c") - F.col("conv_c") * F.col("n_t")
    pooled = pooled_row.select(
        F.signum(
            (F.col("conv_t") * F.col("n_c") - F.col("conv_c") * F.col("n_t")).cast(
                "double"
            )
        )
        .cast("long")
        .alias("pooled_sign")
    )
    return both.crossJoin(F.broadcast(pooled)).select(
        "segment",
        "n_t",
        "n_c",
        (
            F.floor(
                F.col("conv_t").cast("double")
                / F.nullif(F.col("n_t"), F.lit(0))
                * 10000
                + 0.5
            )
            / 10000
        ).alias("rate_t"),
        (
            F.floor(
                F.col("conv_c").cast("double")
                / F.nullif(F.col("n_c"), F.lit(0))
                * 10000
                + 0.5
            )
            / 10000
        ).alias("rate_c"),
        F.signum(cross.cast("double")).cast("long").alias("diff_sign"),
        (
            (F.col("segment") >= 0)
            & (F.signum(cross.cast("double")).cast("long") * F.col("pooled_sign") < 0)
        ).alias("is_reversed"),
    )


# --- SFT conversation shaping (round-12) -----------------------------------------------

_SFT_ORACLE = """
WITH d AS (
  SELECT doc_id,
         doc_id % 3 = 0 AS has_system,
         1 + doc_id % 3 AS np
  FROM documents
),
t AS (
  SELECT doc_id, has_system, np, j.j AS j,
         3 + (doc_id + j.j) % 5 AS u_chars,
         4 + (doc_id + 2 * j.j) % 6 AS a_chars
  FROM d CROSS JOIN (SELECT unnest(range(0, 3)) AS j) j
  WHERE j.j < np
),
agg AS (
  SELECT doc_id, has_system, np,
         sum(u_chars) AS user_chars,
         sum(a_chars) AS assistant_chars,
         max(CASE WHEN j = np - 1 THEN a_chars END) AS completion_chars
  FROM t GROUP BY doc_id, has_system, np
)
SELECT doc_id,
       cast(CASE WHEN has_system THEN 1 ELSE 0 END + 2 * np AS int)
         AS n_messages,
       cast(np AS int) AS n_user,
       cast(np AS int) AS n_assistant,
       has_system,
       true AS valid_alternation,
       cast(user_chars AS bigint) AS user_chars,
       cast(assistant_chars AS bigint) AS assistant_chars,
       cast(completion_chars AS bigint) AS completion_chars,
       cast(CASE WHEN has_system THEN 7 + 5 + doc_id % 4 ELSE 0 END
            + np * 15 + user_chars + assistant_chars
            AS bigint) AS template_chars,
       cast(CASE WHEN has_system THEN 7 + 5 + doc_id % 4 ELSE 0 END
            + np * 15 + user_chars + assistant_chars - completion_chars
            AS bigint) AS completion_start
FROM agg
"""


@register(
    "sft_turns_report",
    oracle=_SFT_ORACLE,
    tags=("extension", "training", "text"),
)
def sft_turns_report(spark, sf_dir):
    """SFT/chat conversation shaping (round-12) — the instruction-
    tuning data-prep step the training pillar lacked: per document a
    chat transcript arrives as a JSON string (optional system turn,
    then strictly alternating user/assistant pairs — the handoff
    format every SFT corpus ships in), and the operator does the
    trainer-facing work ENTIRELY JVM-side, no Python in the hot path:
    ``from_json`` with the messages schema, higher-order functions
    (filter/aggregate/transform) for role accounting and character
    sums, a declarative alternation validator (system only first,
    roles alternate, transcript ends on assistant), and the rendered
    training template with the COMPLETION SPAN offsets — the
    completion-start/length pair a loss-masked SFT trainer needs to
    supervise only the final assistant turn.

    Scale: pure projection over the id spine — zero shuffles, whole-
    stage-codegen friendly; conversations shape independently, and the
    alternation check is a forall over the parsed array, not a join."""
    from pyspark.sql import functions as F

    from ..sources.lake import read_table

    d = read_table(spark, sf_dir, "documents").select("doc_id")
    np_ = F.lit(1) + F.col("doc_id") % 3
    has_sys = F.col("doc_id") % 3 == 0
    pair = F.transform(
        F.sequence(F.lit(0), np_ - 1),
        lambda j: F.array(
            F.struct(
                F.lit("user").alias("role"),
                F.repeat(F.lit("u"),
                         (F.lit(3) + (F.col("doc_id") + j) % 5)
                         .cast("int")).alias("content"),
            ),
            F.struct(
                F.lit("assistant").alias("role"),
                F.repeat(F.lit("a"),
                         (F.lit(4) + (F.col("doc_id") + 2 * j) % 6)
                         .cast("int")).alias("content"),
            ),
        ),
    )
    msgs = F.flatten(pair)
    msgs = F.when(has_sys, F.concat(
        F.array(F.struct(
            F.lit("system").alias("role"),
            F.repeat(F.lit("s"),
                     (F.lit(5) + F.col("doc_id") % 4).cast("int"))
            .alias("content"),
        )), msgs)).otherwise(msgs)
    raw = d.select("doc_id", F.to_json(msgs).alias("conversation_json"))
    return shape_sft_conversations(raw)


def shape_sft_conversations(raw):
    """The operator proper, reusable on any (doc_id, conversation_json)
    frame: parse the JSON handoff and shape it for an SFT trainer —
    declarative throughout (from_json + higher-order functions), so it
    stays inside whole-stage codegen with zero exchanges."""
    from pyspark.sql import functions as F

    schema = "array<struct<role string, content string>>"
    m = F.from_json(F.col("conversation_json"), schema)
    parsed = raw.select("doc_id", m.alias("m"))
    n = F.size("m")
    role = lambda i: F.col("m")[i]["role"]  # noqa: E731
    # alternation: optional leading system, then user/assistant pairs,
    # ending on assistant — checked declaratively over the array
    start = F.when(role(0) == "system", F.lit(1)).otherwise(F.lit(0))
    valid = (
        (n > start)
        & ((n - start) % 2 == 0)
        & F.forall(
            F.sequence(start, n - 1),
            lambda i: F.when(
                (i - start) % 2 == 0, role(i) == "user"
            ).otherwise(role(i) == "assistant"),
        )
    )
    chars_of = lambda r: F.aggregate(  # noqa: E731
        F.filter("m", lambda x: x["role"] == r),
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.length(x["content"]),
    )
    rendered = F.concat(
        F.when(role(0) == "system",
               F.concat(F.lit("<|sys|>"), F.col("m")[0]["content"]))
        .otherwise(F.lit("")),
        F.aggregate(
            F.filter("m", lambda x: x["role"] != "system"),
            F.lit("").cast("string"),
            lambda acc, x: F.concat(
                acc,
                F.when(x["role"] == "user", F.lit("<|usr|>"))
                .otherwise(F.lit("<|asst|>")),
                x["content"],
            ),
        ),
    )
    completion = F.element_at("m", -1)["content"]
    return parsed.select(
        "doc_id",
        n.cast("int").alias("n_messages"),
        F.size(F.filter("m", lambda x: x["role"] == "user"))
        .cast("int").alias("n_user"),
        F.size(F.filter("m", lambda x: x["role"] == "assistant"))
        .cast("int").alias("n_assistant"),
        (role(0) == "system").alias("has_system"),
        valid.alias("valid_alternation"),
        chars_of("user").alias("user_chars"),
        chars_of("assistant").alias("assistant_chars"),
        F.length(completion).cast("long").alias("completion_chars"),
        F.length(rendered).cast("long").alias("template_chars"),
        (F.length(rendered) - F.length(completion)).cast("long")
        .alias("completion_start"),
    )


# --- preference-pair (DPO) dataset construction (round-12) ------------------------------

_DPO_ORACLE = """
WITH c AS (
  SELECT doc_id,
         doc_id // 4 AS prompt_id,
         cast(doc_id * 37 % 101 AS int) AS score
  FROM documents
)
SELECT cast(prompt_id AS bigint) AS prompt_id,
       cast(count(*) AS int) AS n_candidates,
       cast(arg_max(doc_id, score) AS bigint) AS chosen_doc,
       cast(max(score) AS int) AS chosen_score,
       cast(arg_min(doc_id, score) AS bigint) AS rejected_doc,
       cast(min(score) AS int) AS rejected_score,
       cast(max(score) - min(score) AS int) AS margin,
       count(*) >= 2 AND max(score) > min(score) AS valid_pair
FROM c
GROUP BY prompt_id
"""


@register(
    "dpo_pairs_report",
    oracle=_DPO_ORACLE,
    tags=("extension", "training"),
)
def dpo_pairs_report(spark, sf_dir):
    """Preference-pair (DPO/RLHF) dataset construction (round-12) —
    the reward-data step next to sft_turns_report: per prompt group
    (four scored completion candidates), pick the best and worst
    scoring completions as the (chosen, rejected) pair with the score
    margin a DPO trainer weights by, and flag groups that cannot form
    a pair (fewer than two candidates or a zero margin). Selection is
    max_by/min_by — scores are distinct within a group by construction
    here, and at 100 TB the deterministic-tie-break form is the same
    aggregate over a (score, doc_id) struct.

    Scale: ONE map-side-combined hash aggregate on prompt_id — the
    single shuffle a pair builder fundamentally needs; no window, no
    self-join (the classic anti-pattern here is a per-prompt window
    sort followed by a self-join on rank — strictly worse than one
    partial-aggregated groupBy)."""
    from pyspark.sql import functions as F

    from ..sources.lake import read_table

    c = (read_table(spark, sf_dir, "documents")
         .select(
             "doc_id",
             (F.col("doc_id") / 4).cast("long").alias("prompt_id"),
             (F.col("doc_id") * 37 % 101).cast("int").alias("score"),
         ))
    return (c.groupBy("prompt_id").agg(
        F.count("*").cast("int").alias("n_candidates"),
        F.expr("max_by(doc_id, score)").alias("chosen_doc"),
        F.max("score").alias("chosen_score"),
        F.expr("min_by(doc_id, score)").alias("rejected_doc"),
        F.min("score").alias("rejected_score"),
        (F.max("score") - F.min("score")).alias("margin"),
        ((F.count("*") >= 2) & (F.max("score") > F.min("score")))
        .alias("valid_pair"),
    ))


# --- Bradley-Terry preference strengths (round-12) ---------------------------------------

_BT_SCALE = 1_000_000_000_000  # integer quantization per MM stage

_BT_ORACLE = f"""
WITH m AS (
  SELECT doc_id % 8 AS i, (doc_id // 8) % 8 AS j,
         CASE WHEN (doc_id * 13) % 2 = 0 THEN doc_id % 8
              ELSE (doc_id // 8) % 8 END AS w
  FROM documents
  WHERE doc_id % 8 != (doc_id // 8) % 8
),
wins AS (SELECT w AS item, count(*) AS n_wins FROM m GROUP BY w),
pair AS (
  SELECT least(i, j) AS a, greatest(i, j) AS b, count(*) AS n
  FROM m GROUP BY 1, 2
),
edges AS (
  SELECT a AS i, b AS j, n FROM pair
  UNION ALL
  SELECT b AS i, a AS j, n FROM pair
),
matches AS (SELECT i AS item, sum(n) AS n_matches FROM edges GROUP BY i),
p0 AS (SELECT item, cast(1000000 AS bigint) AS p FROM wins),
d1 AS (
  SELECT e.i AS item,
         sum(cast(floor(e.n * {_BT_SCALE}.0 / (pi.p + pj.p)) AS bigint))
           AS denom
  FROM edges e
  JOIN p0 pi ON e.i = pi.item
  JOIN p0 pj ON e.j = pj.item
  GROUP BY e.i
),
p1 AS (
  SELECT w.item,
         cast(floor(w.n_wins * {_BT_SCALE}.0 / d1.denom) AS bigint) AS p
  FROM wins w JOIN d1 ON w.item = d1.item
),
d2 AS (
  SELECT e.i AS item,
         sum(cast(floor(e.n * {_BT_SCALE}.0 / (pi.p + pj.p)) AS bigint))
           AS denom
  FROM edges e
  JOIN p1 pi ON e.i = pi.item
  JOIN p1 pj ON e.j = pj.item
  GROUP BY e.i
),
p2 AS (
  SELECT w.item,
         cast(floor(w.n_wins * {_BT_SCALE}.0 / d2.denom) AS bigint) AS p
  FROM wins w JOIN d2 ON w.item = d2.item
)
SELECT cast(p2.item AS int) AS item,
       cast(w.n_wins AS bigint) AS n_wins,
       cast(mt.n_matches AS bigint) AS n_matches,
       p2.p AS strength_q
FROM p2
JOIN wins w ON p2.item = w.item
JOIN matches mt ON p2.item = mt.item
"""


@register(
    "bt_preference_strengths",
    oracle=_BT_ORACLE,
    tags=("extension", "training", "metrics"),
)
def bt_preference_strengths(spark, sf_dir):
    """Bradley-Terry strength estimation over pairwise preferences
    (round-12) — the judge-panel aggregation step of an RLHF/eval
    pipeline: pairwise outcomes (one comparison per document, eight
    items, closed-form winners) reduce to win counts and pair-match
    counts, then TWO unrolled minorization-maximization iterations
    (Hunter 2004: p_i' = W_i / sum_j n_ij / (p_i + p_j)) produce item
    strengths. Every stage quantizes to INTEGERS (floor of a double
    quotient is identically rounded on any IEEE engine; bigint sums
    are order-free), so the iterative float math is exactly
    reproducible between Spark and the oracle — the same discipline
    the house micro-unit rule applies to one-shot aggregates.

    Scale: comparisons reduce ONCE with a map-side-combined aggregate
    (the only corpus-sized shuffle); the iteration state is one row
    per ITEM — broadcast-sized by construction — so each MM step is a
    broadcast join against the tiny edge list, never a re-shuffle of
    the comparison corpus."""
    from pyspark.sql import functions as F

    from ..sources.lake import read_table

    d = read_table(spark, sf_dir, "documents").select("doc_id")
    i = (F.col("doc_id") % 8).alias("i")
    j = ((F.col("doc_id") / 8).cast("long") % 8).alias("j")
    m = (d.select(i, j,
                  F.when((F.col("doc_id") * 13) % 2 == 0,
                         F.col("doc_id") % 8)
                  .otherwise((F.col("doc_id") / 8).cast("long") % 8)
                  .alias("w"))
         .where(F.col("i") != F.col("j")))
    wins = m.groupBy(F.col("w").alias("item")).agg(
        F.count("*").alias("n_wins"))
    pair = (m.select(F.least("i", "j").alias("a"),
                     F.greatest("i", "j").alias("b"))
            .groupBy("a", "b").agg(F.count("*").alias("n")))
    edges = pair.select(F.col("a").alias("i"), F.col("b").alias("j"), "n") \
        .unionByName(pair.select(F.col("b").alias("i"),
                                 F.col("a").alias("j"), "n"))
    matches = edges.groupBy(F.col("i").alias("item")).agg(
        F.sum("n").alias("n_matches"))

    p = wins.select("item", F.lit(1_000_000).cast("long").alias("p"))
    for _ in range(2):
        pb = F.broadcast(p)
        denom = (edges
                 .join(pb.withColumnRenamed("item", "i")
                       .withColumnRenamed("p", "p_i"), "i")
                 .join(pb.withColumnRenamed("item", "j")
                       .withColumnRenamed("p", "p_j"), "j")
                 .groupBy(F.col("i").alias("item"))
                 .agg(F.sum(F.floor(F.col("n") * float(_BT_SCALE)
                                    / (F.col("p_i") + F.col("p_j"))))
                      .alias("denom")))
        p = (wins.join(F.broadcast(denom), "item")
             .select("item",
                     F.floor(F.col("n_wins") * float(_BT_SCALE)
                             / F.col("denom")).alias("p")))
    return (p.join(F.broadcast(wins), "item")
            .join(F.broadcast(matches), "item")
            .select(F.col("item").cast("int").alias("item"),
                    F.col("n_wins").cast("long").alias("n_wins"),
                    F.col("n_matches").cast("long").alias("n_matches"),
                    F.col("p").alias("strength_q")))
