"""Corpus-governance extension queries (round 4): PII scan/redaction,
C4/Gopher-style filter cascade, incremental batch dedup, and content-stable
shard manifests — the governance layer between "curated corpus" and
"shippable training data". No reference counterpart (north-star
LLM-pipeline surface, SURVEY.md section 2.7); designed Spark-first.

Determinism: every hash is md5-derived (identical in Spark and DuckDB),
regexes use only the cross-engine-identical subset (explicit character
classes — Java regex and RE2 agree; never ``\\s``/``\\w``/``\\b`` shorthand,
whose class membership differs between engines), and ratio thresholds
compare doubles produced by the identical division in both engines.

The test corpus contains no real PII (synthetic word-salad, digit-free),
so the PII queries inject deterministic doc_id-derived PII into a fixed
subset of documents first — mirrored exactly in the oracle — making the
scan/redact logic verifiable with non-zero matches. The injection is the
fixture; the operator under test is the scan/redaction.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.numeric import round_half_up
from ..operators.dedup import (
    TILE_TOKENS as _TILE_TOKENS,  # single-sourced with tile_fingerprints
    token_hash,
    token_hash_sql,
    word_tokens,
)
from ..sources.lake import read_table, widen
from . import register

# --- PII scan + redaction ------------------------------------------------------------

#: cross-engine-identical patterns (explicit classes only; no shorthand)
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"
_IP_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


def _augmented_sql() -> str:
    """Deterministic PII injection, SQL form (the DuckDB twin of
    :func:`_augmented_col`): emails into doc_id % 5 == 0, phones into
    % 7 == 0, IPv4 into % 11 == 0."""
    return """
  concat(text,
    CASE WHEN doc_id % 5 = 0 THEN
      concat(' reach user', cast(doc_id AS varchar), '@mail.example.com soon')
    ELSE '' END,
    CASE WHEN doc_id % 7 = 0 THEN
      concat(' call 555-', lpad(cast((doc_id * 37) % 1000 AS varchar), 3, '0'),
             '-', lpad(cast((doc_id * 91) % 10000 AS varchar), 4, '0'))
    ELSE '' END,
    CASE WHEN doc_id % 11 = 0 THEN
      concat(' host 10.', cast(doc_id % 256 AS varchar),
             '.', cast((doc_id * 3) % 256 AS varchar),
             '.', cast((doc_id * 7) % 256 AS varchar), ' up')
    ELSE '' END)
"""


def _augmented_col() -> F.Column:
    did = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" reach user"),
                did.cast("string"),
                F.lit("@mail.example.com soon"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 7 == 0,
            F.concat(
                F.lit(" call 555-"),
                F.lpad(((did * 37) % 1000).cast("string"), 3, "0"),
                F.lit("-"),
                F.lpad(((did * 91) % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 11 == 0,
            F.concat(
                F.lit(" host 10."),
                (did % 256).cast("string"),
                F.lit("."),
                ((did * 3) % 256).cast("string"),
                F.lit("."),
                ((did * 7) % 256).cast("string"),
                F.lit(" up"),
            ),
        ).otherwise(F.lit("")),
    )


_PII_ORACLE = f"""
WITH aug AS (
  SELECT doc_id, {_augmented_sql()} AS t FROM documents
)
SELECT doc_id,
       cast(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS bigint) AS n_emails,
       cast(len(regexp_extract_all(t, '{_PHONE_RE}')) AS bigint) AS n_phones,
       cast(len(regexp_extract_all(t, '{_IP_RE}')) AS bigint) AS n_ipv4,
       md5(regexp_replace(regexp_replace(regexp_replace(t,
             '{_EMAIL_RE}', '<EMAIL>', 'g'),
             '{_PHONE_RE}', '<PHONE>', 'g'),
             '{_IP_RE}', '<IP>', 'g')) AS redacted_md5
FROM aug
"""


@register(
    "pii_scan_report",
    oracle=_PII_ORACLE,
    tags=("extension", "governance", "pii"),
)
def pii_scan_report(spark, sf_dir):
    """PII scan + redaction over the corpus: per document, counts of
    email / phone / IPv4 matches and the md5 fingerprint of the fully
    redacted text (emails -> <EMAIL>, phones -> <PHONE>, IPs -> <IP>,
    applied in that fixed order). The fingerprint proves the redaction
    byte-for-byte, not just the match counts.

    Scale shape: pure in-row regex work inside whole-stage codegen — zero
    shuffles, embarrassingly parallel over input splits; the exact shape
    a 100 TB PII pass needs. Patterns stick to the cross-engine-safe
    explicit-class subset."""
    d = widen(read_table(spark, sf_dir, "documents"))
    t = _augmented_col()
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ),
        _IP_RE,
        "<IP>",
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(_EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(_PHONE_RE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.size(F.regexp_extract_all(t, F.lit(_IP_RE), F.lit(0)))
        .cast("long")
        .alias("n_ipv4"),
        F.md5(redacted).alias("redacted_md5"),
    )


# --- C4/Gopher-style filter cascade --------------------------------------------------

_MIN_TOKENS = 20
_MAX_UNIGRAM_FRAC = 0.14
_TARGET_LANG = "en"

_CASCADE_CTE = f"""
WITH toks AS (
  SELECT doc_id, lang,
         string_split_regex(lower(trim(text)), '[ \\t\\n\\r\\f]+') AS t
  FROM documents
),
stats AS (
  SELECT doc_id, lang, len(t) AS n_tok,
         list_max(list_transform(list_distinct(t),
                                 x -> len(list_filter(t, y -> y = x)))) AS max_cnt
  FROM toks
),
verdicts AS (
  SELECT doc_id,
         CASE WHEN n_tok < {_MIN_TOKENS} THEN 'too_short'
              WHEN lang <> '{_TARGET_LANG}' THEN 'non_target_lang'
              WHEN cast(max_cnt AS double) / n_tok > {_MAX_UNIGRAM_FRAC!r}
                THEN 'repetitive'
              ELSE 'pass' END AS verdict
  FROM stats
)
"""


def _cascade_verdicts(spark, sf_dir):
    d = widen(read_table(spark, sf_dir, "documents"))
    t = word_tokens(F.col("text"))
    stats = d.select(
        "doc_id",
        "lang",
        F.size(t).alias("n_tok"),
        F.array_max(
            F.transform(
                F.array_distinct(t),
                lambda x: F.size(F.filter(t, lambda y: y == x)),
            )
        ).alias("max_cnt"),
    )
    return stats.select(
        "doc_id",
        F.when(F.col("n_tok") < _MIN_TOKENS, "too_short")
        .when(F.col("lang") != _TARGET_LANG, "non_target_lang")
        .when(
            F.col("max_cnt").cast("double") / F.col("n_tok")
            > F.lit(_MAX_UNIGRAM_FRAC),
            "repetitive",
        )
        .otherwise("pass")
        .alias("verdict"),
    )


@register(
    "filter_cascade_report",
    oracle=_CASCADE_CTE + "SELECT doc_id, verdict FROM verdicts",
    tags=("extension", "governance", "quality", "filter"),
)
def filter_cascade_report(spark, sf_dir):
    """C4/Gopher-style quality filter cascade with first-failing-rule
    attribution: every document gets exactly one verdict — the first rule
    it fails (too_short -> non_target_lang -> repetitive) or 'pass'.
    First-fail attribution is what makes rule-tuning possible: it tells
    you which rule to loosen to recover the most data.

    The repetition signal (max unigram fraction) is computed IN-ROW via a
    transform over the distinct-token array — O(v*n) per row with tiny v,
    zero shuffles; the whole cascade is one codegen stage over the scan."""
    return _cascade_verdicts(spark, sf_dir)


@register(
    "filter_cascade_summary",
    oracle=_CASCADE_CTE
    + """
SELECT verdict, cast(count(*) AS bigint) AS n_docs,
       floor(cast(count(*) AS double)
             / (SELECT count(*) FROM documents) * 1000000 + 0.5) / 1000000
         AS share_frac
FROM verdicts GROUP BY verdict
""",
    tags=("extension", "governance", "quality", "filter"),
)
def filter_cascade_summary(spark, sf_dir):
    """Aggregate view of the filter cascade: documents and corpus share
    per verdict — the rejection-budget dashboard a data curator reads
    before shipping a corpus snapshot (one count aggregate, map-side
    combined, over the in-row cascade)."""
    verdicts = _cascade_verdicts(spark, sf_dir)
    tot = read_table(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).alias("n_total")
    )
    return (
        verdicts.groupBy("verdict")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .crossJoin(F.broadcast(tot))
        .select(
            "verdict",
            "n_docs",
            round_half_up(
                F.col("n_docs").cast("double") / F.col("n_total"), 6
            ).alias("share_frac"),
        )
    )


# --- incremental batch dedup ---------------------------------------------------------

_INC_MOD = 5  # doc_id % 5 == 0 is the incoming batch (~20%), rest is the corpus

_INC_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '[ \\t\\n\\r\\f]+') AS t
  FROM documents
),
tiles AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, len(t) // {_TILE_TOKENS} + 1),
           i -> md5(array_to_string(
                  list_slice(t, (i - 1) * {_TILE_TOKENS} + 1,
                             (i - 1) * {_TILE_TOKENS} + {_TILE_TOKENS}), ' '))
         )) AS hs
  FROM toks
),
new_tiles AS (
  SELECT doc_id, unnest(hs) AS h FROM tiles WHERE doc_id % {_INC_MOD} = 0
),
old_tiles AS (
  SELECT DISTINCT unnest(hs) AS h FROM tiles WHERE doc_id % {_INC_MOD} <> 0
),
shared AS (
  SELECT n.doc_id, cast(count(*) AS bigint) AS n_shared_tiles
  FROM new_tiles n JOIN old_tiles o ON n.h = o.h
  GROUP BY n.doc_id
),
old_md5 AS (
  SELECT DISTINCT md5(text) AS m FROM documents WHERE doc_id % {_INC_MOD} <> 0
)
SELECT d.doc_id,
       (om.m IS NOT NULL) AS is_exact_dup,
       coalesce(s.n_shared_tiles, 0) AS n_shared_tiles,
       (coalesce(s.n_shared_tiles, 0) >= 1) AS is_near_dup
FROM documents d
LEFT JOIN old_md5 om ON md5(d.text) = om.m
LEFT JOIN shared s ON s.doc_id = d.doc_id
WHERE d.doc_id % {_INC_MOD} = 0
"""


@register(
    "dedup_incremental_batch",
    oracle=_INC_ORACLE,
    tags=("extension", "governance", "dedup", "incremental"),
)
def dedup_incremental_batch(spark, sf_dir):
    """Incremental dedup: screen an incoming batch (doc_id % 5 == 0 — a
    scale-invariant stand-in for "today's crawl") against the existing
    corpus WITHOUT re-deduping the corpus against itself. Per new doc:
    exact duplicate (full-text md5 seen before), shared 8-token tile
    count, and the near-dup flag.

    Scale shape: this is THE production dedup loop — the corpus-vs-corpus
    pass runs once, then each daily batch runs this. Both probes are hash
    equi-joins keyed on md5 fingerprints (uniform, no skew); the batch
    side is small, so at cluster scale Spark broadcasts it and the
    existing-corpus tile store is scanned once, map-side."""
    from ..operators.dedup import tile_fingerprints

    d = widen(read_table(spark, sf_dir, "documents"))
    tiles = tile_fingerprints(F.col("text"), tile_tokens=_TILE_TOKENS)
    base = d.select("doc_id", F.md5("text").alias("m"), tiles.alias("hs"))
    is_new = F.col("doc_id") % _INC_MOD == 0
    new_tiles = base.where(is_new).select("doc_id", F.explode("hs").alias("h"))
    old_tiles = base.where(~is_new).select(F.explode("hs").alias("h")).distinct()
    shared = (
        new_tiles.join(old_tiles, "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_tiles"))
    )
    old_md5 = base.where(~is_new).select("m").distinct()
    return (
        base.where(is_new)
        .join(old_md5.withColumn("seen", F.lit(True)), "m", "left")
        .join(shared, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("seen", F.lit(False)).alias("is_exact_dup"),
            F.coalesce("n_shared_tiles", F.lit(0)).alias("n_shared_tiles"),
            (F.coalesce("n_shared_tiles", F.lit(0)) >= 1).alias("is_near_dup"),
        )
    )


# --- content-stable shard manifest ---------------------------------------------------

_N_SHARDS = 8
_CHECKSUM_MOD = 1_000_000_007

_SHARD_ORACLE = f"""
WITH s AS (
  SELECT {token_hash_sql("cast(doc_id AS varchar)")} % {_N_SHARDS} AS shard_id,
         cast(len(string_split_regex(trim(text), '[ \\t\\n\\r\\f]+')) AS bigint)
           AS n_tok,
         n_chars,
         {token_hash_sql("text")} % {_CHECKSUM_MOD} AS h
  FROM documents
)
SELECT shard_id, cast(count(*) AS bigint) AS n_docs,
       cast(sum(n_tok) AS bigint) AS n_tokens,
       cast(sum(n_chars) AS bigint) AS total_chars,
       cast(sum(h) AS bigint) AS checksum
FROM s GROUP BY shard_id
"""


@register(
    "shard_manifest",
    oracle=_SHARD_ORACLE,
    tags=("extension", "governance", "layout", "manifest"),
)
def shard_manifest(spark, sf_dir):
    """Content-stable training-data shard manifest: assign every document
    to one of N shards by a doc_id hash (stable across re-runs, backfills
    and cluster sizes — never round-robin or rand()), and emit per shard
    the doc count, token count, byte volume, and an order-free content
    checksum (sum of bounded per-doc md5 folds). The manifest is what a
    downstream trainer validates before streaming a shard — and two
    manifests diff cheaply to detect silent corpus drift.

    Scale shape: one map-side-combined aggregate keyed on the shard id;
    checksum terms are mod-reduced so a shard of any realistic size stays
    inside int64."""
    d = read_table(spark, sf_dir, "documents")
    return (
        d.select(
            (token_hash(F.col("doc_id").cast("string")) % _N_SHARDS).alias(
                "shard_id"
            ),
            F.size(F.split(F.trim(F.col("text")), r"[ \t\n\r\f]+"))
            .cast("long")
            .alias("n_tok"),
            "n_chars",
            (token_hash(F.col("text")) % _CHECKSUM_MOD).alias("h"),
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("h").alias("checksum"),
        )
    )


# --- corpus mix planning -------------------------------------------------------------

_MIX_ORACLE = """
WITH counts AS (
  SELECT lang, cast(count(*) AS bigint) AS n_docs FROM documents GROUP BY lang
),
tot AS (
  SELECT cast(sum(n_docs) AS bigint) AS n_total,
         cast(count(*) AS bigint) AS n_langs
  FROM counts
),
plan AS (
  SELECT lang, n_docs,
         least(1.0, (cast(n_total AS double) / n_langs) / n_docs)
           AS rate_raw
  FROM counts, tot
),
kept AS (
  SELECT lang, n_docs, rate_raw,
         cast(floor(n_docs * rate_raw) AS bigint) AS docs_kept
  FROM plan
),
tot2 AS (
  SELECT cast(sum(docs_kept) AS bigint) AS n_kept FROM kept
)
SELECT lang, n_docs,
       floor(rate_raw * 1000000 + 0.5) / 1000000 AS sampling_rate,
       docs_kept,
       floor(cast(docs_kept AS double) / n_kept * 1000000 + 0.5) / 1000000
         AS share_after_frac
FROM kept, tot2
"""


@register(
    "mix_plan_report",
    oracle=_MIX_ORACLE,
    tags=("extension", "governance", "sampling", "mix"),
)
def mix_plan_report(spark, sf_dir):
    """Corpus mix planning toward a uniform language target: per language,
    the downsampling rate min(1, target/actual) that moves the mix toward
    equal shares without upsampling, the resulting document count, and the
    post-plan share. The curator's what-if before committing a sampled
    snapshot — run it, eyeball share_after_frac, adjust the target.

    All cross-row math is integer counts; rates are single double
    divisions in a fixed order, so both engines produce bit-identical
    plans. Scale: one count aggregate, then two 1-row broadcasts."""
    counts = (
        read_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    tot = counts.agg(
        F.sum("n_docs").alias("n_total"), F.count(F.lit(1)).alias("n_langs")
    )
    rate_raw = F.least(
        F.lit(1.0),
        (F.col("n_total").cast("double") / F.col("n_langs")) / F.col("n_docs"),
    )
    kept = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            rate_raw.alias("rate_raw"),
        )
        .withColumn(
            "docs_kept", F.floor(F.col("n_docs") * F.col("rate_raw")).cast("long")
        )
    )
    tot2 = kept.agg(F.sum("docs_kept").alias("n_kept"))
    return kept.crossJoin(F.broadcast(tot2)).select(
        "lang",
        "n_docs",
        round_half_up(F.col("rate_raw"), 6).alias("sampling_rate"),
        "docs_kept",
        round_half_up(
            F.col("docs_kept").cast("double") / F.col("n_kept"), 6
        ).alias("share_after_frac"),
    )


# --- differentially-private-style noisy release -------------------------------------

#: noise support: uniform integer in [-3, 3] derived from the group key
_DP_NOISE_MOD = 7
_DP_K_SUPPRESS = 10

_DP_ORACLE = f"""
WITH g AS (
  SELECT event_type, cast(ts AS date) AS day, cast(count(*) AS bigint) AS n_true
  FROM events GROUP BY 1, 2
)
SELECT event_type, day,
       n_true,
       cast({token_hash_sql("concat(event_type, '|', strftime(day, '%Y-%m-%d'))")}
            % {_DP_NOISE_MOD} - {_DP_NOISE_MOD // 2} AS bigint) AS noise,
       greatest(n_true + {token_hash_sql("concat(event_type, '|', strftime(day, '%Y-%m-%d'))")}
            % {_DP_NOISE_MOD} - {_DP_NOISE_MOD // 2}, 0) AS n_released,
       n_true < {_DP_K_SUPPRESS} AS suppressed
FROM g
"""


@register(
    "dp_noisy_counts",
    oracle=_DP_ORACLE,
    tags=("extension", "governance", "privacy"),
)
def dp_noisy_counts(spark, sf_dir):
    """Differential-privacy-style noisy count release over
    (event_type, day): per group, the true count, an additive integer
    noise term, the clamped released count, and a small-count
    suppression flag (n < 10 — groups a release would withhold entirely,
    since noise alone cannot protect them).

    The noise here is a DETERMINISTIC stand-in — a uniform integer in
    [-3, 3] derived by md5 from the group key — so the release logic
    (noise addition, clamping at zero, suppression) is oracle-checkable
    bit-for-bit. A production release swaps the derivation for seeded
    Laplace(1/epsilon) draws keyed the same way; the plan is identical:
    noise is a per-group scalar expression, never a second pass.

    Scale: one map-side-combined aggregate; the noise adds zero
    exchanges. True counts are kept in the output for verification only
    — a real release ships (day, event_type, n_released) alone."""
    e = read_table(spark, sf_dir, "events")
    g = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    keystr = F.concat(
        F.col("event_type"), F.lit("|"), F.date_format("day", "yyyy-MM-dd")
    )
    noise = (token_hash(keystr) % _DP_NOISE_MOD - _DP_NOISE_MOD // 2).cast("long")
    return g.select(
        "event_type",
        "day",
        "n_true",
        noise.alias("noise"),
        F.greatest(F.col("n_true") + noise, F.lit(0).cast("long")).alias(
            "n_released"
        ),
        (F.col("n_true") < _DP_K_SUPPRESS).alias("suppressed"),
    )


# --- GDPR access export (DSAR) ------------------------------------------------------

_DSAR_SUBJECT = 97
#: per-row hashes reduce mod 2^40 before summing so the order-free checksum
#: stays inside int64 for up to ~2^23 rows per subject in BOTH engines
#: (DuckDB sums bigints into INT128; Spark would wrap int64)
_DSAR_MOD = 1 << 40

_DSAR_ORACLE = f"""
WITH eo AS (
  SELECT o_orderkey FROM orders WHERE o_custkey = {_DSAR_SUBJECT}
)
SELECT 'customer' AS tbl,
       cast(count(*) AS bigint) AS n_rows,
       cast(coalesce(sum({token_hash_sql(
           "cast(c_custkey AS varchar) || '|' || c_name || '|' || "
           "cast(c_nationkey AS varchar) || '|' || c_mktsegment")}
           % {_DSAR_MOD}), 0) AS bigint) AS payload_checksum
FROM customer WHERE c_custkey = {_DSAR_SUBJECT}
UNION ALL
SELECT 'orders',
       cast(count(*) AS bigint),
       cast(coalesce(sum({token_hash_sql(
           "cast(o_orderkey AS varchar) || '|' || cast(o_custkey AS varchar)"
           " || '|' || o_orderstatus || '|' || o_orderpriority")}
           % {_DSAR_MOD}), 0) AS bigint)
FROM orders WHERE o_custkey = {_DSAR_SUBJECT}
UNION ALL
SELECT 'lineitem',
       cast(count(*) AS bigint),
       cast(coalesce(sum({token_hash_sql(
           "cast(l_orderkey AS varchar) || '|' || cast(l_linenumber AS varchar)"
           " || '|' || l_returnflag || '|' || l_linestatus")}
           % {_DSAR_MOD}), 0) AS bigint)
FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM eo)
UNION ALL
SELECT 'events',
       cast(count(*) AS bigint),
       cast(coalesce(sum({token_hash_sql(
           "cast(event_id AS varchar) || '|' || cast(user_id AS varchar)"
           " || '|' || event_type")}
           % {_DSAR_MOD}), 0) AS bigint)
FROM events WHERE user_id = {_DSAR_SUBJECT}
"""


@register(
    "user_access_export",
    oracle=_DSAR_ORACLE,
    tags=("extension", "governance", "dsar"),
)
def user_access_export(spark, sf_dir):
    """Right-of-access export audit (the DSAR read twin of
    user_erasure_cascade): for one data subject, the per-table row counts
    and an order-free payload checksum (sum of 60-bit md5 hashes of the
    canonical key fields — integer/string columns only, so the canonical
    string is byte-identical in both engines) across every table holding
    the subject's data. The checksum is what the export job and the
    verification job compare without shipping the payload twice.

    Scale: one subject key (or a broadcast cohort) semi-joins each fact
    exactly once — the facts never shuffle; with key-partitioned or
    bucketed tables the scan prunes to the subject's partitions."""
    from ..operators.dedup import token_hash

    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    ev = read_table(spark, sf_dir, "events")

    eo = orders.where(F.col("o_custkey") == _DSAR_SUBJECT).select("o_orderkey")

    def export(df, tbl, canon):
        return df.agg(
            F.lit(tbl).alias("tbl"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.coalesce(F.sum(token_hash(canon) % _DSAR_MOD), F.lit(0))
            .cast("long")
            .alias("payload_checksum"),
        )

    c = export(
        cust.where(F.col("c_custkey") == _DSAR_SUBJECT),
        "customer",
        F.concat_ws(
            "|", F.col("c_custkey"), F.col("c_name"), F.col("c_nationkey"),
            F.col("c_mktsegment"),
        ),
    )
    o = export(
        orders.where(F.col("o_custkey") == _DSAR_SUBJECT),
        "orders",
        F.concat_ws(
            "|", F.col("o_orderkey"), F.col("o_custkey"), F.col("o_orderstatus"),
            F.col("o_orderpriority"),
        ),
    )
    l = export(
        li.join(F.broadcast(eo), li["l_orderkey"] == eo["o_orderkey"], "left_semi"),
        "lineitem",
        F.concat_ws(
            "|", F.col("l_orderkey"), F.col("l_linenumber"), F.col("l_returnflag"),
            F.col("l_linestatus"),
        ),
    )
    e = export(
        ev.where(F.col("user_id") == _DSAR_SUBJECT),
        "events",
        F.concat_ws("|", F.col("event_id"), F.col("user_id"), F.col("event_type")),
    )
    return c.unionByName(o).unionByName(l).unionByName(e)
