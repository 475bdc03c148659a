"""Text-analysis extension queries over the ``documents`` table
(SURVEY.md section 2.7 — north-star LLM-pipeline operators, no reference
citation; designed Spark-first).

All operators are pure built-in column expressions (split/regexp/aggregate)
— JVM-side, codegen'd, trivially data-parallel: at 100 TB each document row
is independent, so these scale linearly with executors and never shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.numeric import count_if, round_half_up, rounded_sum
from ..sources.lake import read_table, widen
from . import register
from ..operators.checkpointing import cut_lazy

# Polynomial rolling-hash coefficients 31^i — shared constants between the
# Spark expression and the oracle SQL so both engines compute identical
# fingerprints with plain bigint arithmetic.
_POLY_COEF = [31**i for i in range(8)]

_EN_STOPWORDS = ("the", "a", "of", "and", "to", "in")


def _stop_list_sql() -> str:
    return ", ".join(f"'{w}'" for w in _EN_STOPWORDS)


# --- token counting + basic stats --------------------------------------------


@register(
    "text_stats",
    oracle="""
SELECT doc_id,
       lang,
       cast(length(text) AS integer) AS n_chars_calc,
       cast(len(string_split_regex(trim(text), '[ \\t\\n\\r\\f]+')) AS integer) AS n_ws_tokens,
       cast(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS integer) AS n_word_tokens,
       cast(len(regexp_extract_all(text, '[^a-zA-Z0-9 \\t\\n\\r\\f]')) AS integer) AS n_punct
FROM documents
""",
    tags=("extension", "text"),
)
def text_stats(spark, sf_dir):
    """Token counting: whitespace tokens + a BPE-ish word/punct regex
    tokenizer, plus punctuation counts for quality scoring."""
    d = read_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        F.length("text").cast("int").alias("n_chars_calc"),
        F.size(F.split(F.trim(F.col("text")), r"[ \t\n\r\f]+")).cast("int").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), F.lit(0)))
        .cast("int")
        .alias("n_word_tokens"),
        # translate, not a negated-class regex: measured round-14, the
        # negated class is ~70x slower in Spark's regex path and
        # extract_all allocates per match — see text_quality_score
        F.length(F.translate(
            F.col("text"),
            "abcdefghijklmnopqrstuvwxyz"
            "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 \t\n\r\f", ""))
        .cast("int")
        .alias("n_punct"),
    )


# --- language-ID heuristic -----------------------------------------------------


@register(
    "text_language_id",
    oracle=f"""
WITH toks AS (
  SELECT doc_id,
         string_split_regex(lower(trim(text)), '[ \\t\\n\\r\\f]+') AS t
  FROM documents
)
SELECT doc_id,
       floor(cast(len(list_filter(t, x -> x IN ({_stop_list_sql()}))) AS double)
             / len(t) * 10000 + 0.5) / 10000 AS en_stop_ratio,
       CASE WHEN cast(len(list_filter(t, x -> x IN ({_stop_list_sql()}))) AS double)
                 / len(t) >= 0.05
            THEN 'en' ELSE 'unk' END AS lang_pred
FROM toks
""",
    tags=("extension", "text", "langid"),
)
def text_language_id(spark, sf_dir):
    """Language-ID heuristic: stopword-hit ratio over whitespace tokens with
    a threshold classifier (n-gram/stopword heuristic per the extension
    spec). Ratio is int/int -> one double division, bit-stable vs oracle."""
    d = read_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\r\f]+")
    hits = F.size(F.filter(toks, lambda x: x.isin(*_EN_STOPWORDS)))
    ratio = hits.cast("double") / F.size(toks)
    return d.select(
        "doc_id",
        round_half_up(ratio, 4).alias("en_stop_ratio"),
        F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("unk")).alias("lang_pred"),
    )


# --- quality scoring ------------------------------------------------------------


@register(
    "text_quality_score",
    oracle="""
WITH feat AS (
  SELECT doc_id,
         cast(length(text) AS double) AS n_chars,
         cast(len(string_split_regex(trim(text), '[ \\t\\n\\r\\f]+')) AS double) AS n_tokens,
         cast(len(regexp_extract_all(text, '[^a-zA-Z0-9 \\t\\n\\r\\f]')) AS double) AS n_punct
  FROM documents
)
SELECT doc_id,
       floor((0.5 * least(n_chars / 400.0, 1.0)
            + 0.3 * least(n_tokens / 80.0, 1.0)
            + 0.2 * (1.0 - least(n_punct / n_tokens, 1.0))) * 10000 + 0.5) / 10000
         AS quality_score,
       (n_chars >= 200 AND n_punct / n_tokens < 0.5) AS is_high_quality
FROM feat
""",
    tags=("extension", "text", "quality"),
)
def text_quality_score(spark, sf_dir):
    """Quality scoring from length / token-count / punctuation-ratio features
    (the classic pretraining-data heuristic filter), plus a keep/drop flag."""
    d = read_table(spark, sf_dir, "documents")
    n_chars = F.length("text").cast("double")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"[ \t\n\r\f]+")).cast("double")
    # count punctuation by length difference over TRANSLATE — regex-free.
    # Measured round-14 at sf10 (226 MB of text, local[32]): a NEGATED
    # character class is pathological in Spark's regex path (37 s for
    # regexp_replace('[^a-zA-Z0-9 \\t\\n\\r\\f]') vs 0.5 s for a positive
    # class and 0.8 s for translate) — and regexp_extract_all + size
    # additionally allocates a string per match just to count it.
    # translate deletes the listed alnum/ws chars in one linear pass, so
    # the residue length IS the punctuation count, bit-identical to the
    # old regex count.
    _keep = ("abcdefghijklmnopqrstuvwxyz"
             "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 \t\n\r\f")
    n_punct = F.length(F.translate(F.col("text"), _keep, "")).cast("double")
    score = (
        0.5 * F.least(n_chars / 400.0, F.lit(1.0))
        + 0.3 * F.least(n_tokens / 80.0, F.lit(1.0))
        + 0.2 * (1.0 - F.least(n_punct / n_tokens, F.lit(1.0)))
    )
    return d.select(
        "doc_id",
        round_half_up(score, 4).alias("quality_score"),
        ((n_chars >= 200) & (n_punct / n_tokens < 0.5)).alias("is_high_quality"),
    )


# --- document fingerprinting -----------------------------------------------------


def _poly_sql() -> str:
    terms = [
        f"(CASE WHEN length(text) >= {i + 1} "
        f"THEN cast(ascii(substr(text, {i + 1}, 1)) AS bigint) * {c} ELSE 0 END)"
        for i, c in enumerate(_POLY_COEF)
    ]
    return " + ".join(terms)


@register(
    "text_fingerprint",
    oracle=f"""
SELECT doc_id,
       md5(text) AS fp_md5,
       cast({_poly_sql()} AS bigint) AS fp_poly_prefix
FROM documents
""",
    tags=("extension", "text", "fingerprint"),
)
def text_fingerprint(spark, sf_dir):
    """Document fingerprinting: full-content md5 plus a polynomial rolling
    hash (base-31) over the first 8 chars — the rolling-hash building block
    the dedup operators reuse, in plain bigint arithmetic so the oracle
    computes the identical value."""
    d = read_table(spark, sf_dir, "documents")
    text = F.col("text")
    poly = None
    for i, c in enumerate(_POLY_COEF):
        # long arithmetic throughout: with ANSI off an int32 overflow would
        # wrap silently (ascii * 31^5 already exceeds 2^31)
        term = F.when(
            F.length(text) >= i + 1,
            F.ascii(F.substring(text, i + 1, 1)).cast("long") * F.lit(c).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        poly = term if poly is None else poly + term
    return d.select(
        "doc_id",
        F.md5(text).alias("fp_md5"),
        poly.cast("long").alias("fp_poly_prefix"),
    )


# --- PII-style redaction ---------------------------------------------------------


@register(
    "redact_payload_numbers",
    oracle="""
SELECT event_id,
       regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS props_redacted,
       regexp_replace(lower(props), '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}',
                      '<EMAIL>', 'g') AS props_no_email,
       (regexp_matches(props, '[0-9]'))  AS had_number
FROM events
""",
    tags=("extension", "text", "redaction"),
)
def redact_payload_numbers(spark, sf_dir):
    """PII-style scrubbing (the training-data redaction primitive): global
    regexp_replace of numbers and email-shaped spans, plus a had-PII flag.
    Spark's regexp_replace is global by default; DuckDB's needs the 'g'
    option — pinned in the oracle."""
    ev = read_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_replace(F.col("props"), "[0-9]+", "<NUM>").alias("props_redacted"),
        F.regexp_replace(
            F.lower(F.col("props")),
            r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
            "<EMAIL>",
        ).alias("props_no_email"),
        F.col("props").rlike("[0-9]").alias("had_number"),
    )


# --- full-text search consumption (SURVEY section 3.3) ---------------------------


@register(
    "search_documents_match",
    oracle="""
WITH toks AS (
  SELECT doc_id, lang, n_chars,
         string_split_regex(lower(text), '[^a-z0-9]+') AS t
  FROM documents
)
SELECT lang,
       cast(count(*) AS bigint) AS n_matching_docs,
       cast(round(sum(cast(n_chars AS decimal(28,6))), 2) AS double) AS total_chars
FROM toks
WHERE list_contains(t, 'spark') AND list_contains(t, 'join')
GROUP BY lang
""",
    tags=("extension", "search"),
)
def search_documents_match(spark, sf_dir):
    """The ad-hoc consumption surface (SURVEY 3.3): a Kibana-style
    full-text match (both terms present) + keyword filter + aggregation,
    served straight from the lake with tokenized match semantics
    (sources/search.py full_text_match is the reusable operator form)."""
    d = read_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != ""
    )
    matched = d.where(
        F.array_contains(toks, "spark") & F.array_contains(toks, "join")
    )
    return matched.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_matching_docs"),
        rounded_sum("n_chars").alias("total_chars"),
    )


# --- vocabulary statistics ---------------------------------------------------------


@register(
    "token_frequency_topk",
    oracle="""
WITH toks AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '[ \\t\\n\\r\\f]+')) AS tok
  FROM documents
)
SELECT tok, count(*) AS n
FROM toks GROUP BY tok
ORDER BY n DESC, tok
LIMIT 20
""",
    tags=("extension", "text", "vocab"),
)
def token_frequency_topk(spark, sf_dir):
    """Corpus vocabulary statistics: global top-20 tokens by frequency
    (explode -> count -> top-k; the map-side partial aggregate means the
    shuffle carries one row per distinct token per task, not the corpus).
    The top-k itself is ``orderBy(...).limit`` — TakeOrderedAndProject
    (per-partition heaps), never a partition-less window, which would sort
    the whole vocabulary on a single task."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\r\f]+")).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    return counts.orderBy(F.desc("n"), F.asc("tok")).limit(20).select("tok", "n")


# --- bigram language-model scoring ---------------------------------------------------


@register(
    "text_bigram_lm_score",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '[ \\t\\n\\r\\f]+') AS t FROM documents
),
bigrams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bg
  FROM toks WHERE len(t) >= 2
),
model AS (
  SELECT bg, count(*) AS c FROM bigrams GROUP BY bg
),
totals AS (SELECT count(*) AS total FROM bigrams),
scored AS (
  -- each log term is scaled to an int64 BEFORE summing: float sums are
  -- partition-order-dependent, integer sums are exact and order-free
  SELECT b.doc_id,
         count(*) AS n_bigrams,
         sum(cast(floor(ln(cast(m.c AS double) / t.total) * 1000000000 - 0.5) AS bigint))
           AS log_prob_scaled
  FROM bigrams b JOIN model m ON b.bg = m.bg CROSS JOIN totals t
  GROUP BY b.doc_id
)
SELECT doc_id,
       floor((cast(log_prob_scaled AS double) / 1000000000) / n_bigrams * 10000 + 0.5)
         / 10000 AS avg_logprob
FROM scored
""",
    tags=("extension", "text", "lm"),
)
def text_bigram_lm_score(spark, sf_dir):
    """Corpus-trained bigram LM perplexity proxy: per-doc mean log
    probability of its bigrams under the corpus bigram distribution — the
    model-based quality-scoring flavor (fluent/common text scores high,
    anomalous text low). The 'model' is itself a DataFrame aggregate, so
    training and scoring are one plan; at 100 TB the model table is the
    broadcast side of the scoring join."""
    d = read_table(spark, sf_dir, "documents")
    # not doc_shingles: that dedups shingles per doc, the LM needs multiplicity
    toks = F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\r\f]+")
    bg_arr = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )
    from ..sources.lake import widen

    bigrams = (
        widen(d.where(F.size(toks) >= 2))
        .select("doc_id", F.explode(bg_arr).alias("bg"))
    )

    bigrams = bigrams.transform(cut_lazy)
    model = bigrams.groupBy("bg").agg(F.count(F.lit(1)).alias("c"))
    total = bigrams.count()  # scalar: the corpus bigram count
    scored = (
        bigrams.join(F.broadcast(model), "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            # int64-scaled log terms: exact, partition-order-free sum
            F.sum(
                F.floor(
                    F.log(F.col("c").cast("double") / F.lit(float(total)))
                    * 1_000_000_000
                    - 0.5
                ).cast("long")
            ).alias("log_prob_scaled"),
        )
    )
    return scored.select(
        "doc_id",
        round_half_up(
            (F.col("log_prob_scaled").cast("double") / 1_000_000_000)
            / F.col("n_bigrams"),
            4,
        ).alias("avg_logprob"),
    )


# --- repetition metrics (Gopher-style quality rules) ---------------------------------


@register(
    "text_repetition_metrics",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '[ \\t\\n\\r\\f]+') AS t FROM documents
),
grams AS (
  SELECT doc_id, t,
         list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) AS bg
  FROM toks
),
feat AS (
  SELECT doc_id,
         len(t) AS n,
         len(list_distinct(t)) AS nd,
         cast(list_max(list_transform(list_distinct(t),
              x -> len(list_filter(t, y -> y = x)))) AS double) AS topc,
         CASE WHEN len(t) >= 2 THEN
           cast(list_max(list_transform(list_distinct(bg),
                x -> len(list_filter(bg, y -> y = x)))) AS double)
         END AS topbg
  FROM grams
)
SELECT doc_id,
       cast(n AS integer) AS n_tokens,
       floor(cast(nd AS double) / n * 10000 + 0.5) / 10000 AS distinct_ratio,
       floor(topc / n * 10000 + 0.5) / 10000 AS top_token_frac,
       CASE WHEN n >= 2
            THEN floor(topbg / (n - 1) * 10000 + 0.5) / 10000 END AS top_bigram_frac,
       (topc / n > 0.2 OR coalesce(topbg / (n - 1) > 0.18, false)) AS is_repetitive
FROM feat
""",
    tags=("extension", "text", "quality", "repetition"),
)
def text_repetition_metrics(spark, sf_dir):
    """Gopher-style repetition quality rules: per-doc distinct-token ratio,
    most-frequent-token fraction, most-frequent-bigram fraction, and a
    repetitive-document flag. Computed entirely with array expressions
    (nested higher-order lambdas) — zero shuffles, the whole operator is a
    map over the corpus scan; at 100 TB it parallelizes perfectly and never
    moves a byte. (The per-doc count is O(distinct x n) on ~100-token web
    docs; an explode+groupBy twin would trade that for a corpus shuffle.)"""
    d = read_table(spark, sf_dir, "documents")
    t = F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\r\f]+")
    g = d.select(
        "doc_id",
        t.alias("t"),
        F.when(
            F.size(t) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(F.col("t"), i), F.element_at(F.col("t"), i + 1)
                ),
            ),
        ).alias("bg"),
    )
    n = F.size("t")
    topc = F.array_max(
        F.transform(
            F.array_distinct("t"), lambda x: F.size(F.filter(F.col("t"), lambda y: y == x))
        )
    ).cast("double")
    topbg = F.array_max(
        F.transform(
            F.array_distinct("bg"),
            lambda x: F.size(F.filter(F.col("bg"), lambda y: y == x)),
        )
    ).cast("double")
    return g.select(
        "doc_id",
        n.cast("int").alias("n_tokens"),
        round_half_up(F.size(F.array_distinct("t")).cast("double") / n, 4).alias(
            "distinct_ratio"
        ),
        round_half_up(topc / n, 4).alias("top_token_frac"),
        F.when(n >= 2, round_half_up(topbg / (n - 1), 4)).alias("top_bigram_frac"),
        (
            (topc / n > 0.2)
            | F.coalesce(topbg / (n - 1) > 0.18, F.lit(False))
        ).alias("is_repetitive"),
    )


# --- TF-IDF keyword extraction -------------------------------------------------------

_TFIDF_TOPK = 3


@register(
    "tfidf_top_terms",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '[ \\t\\n\\r\\f]+')) AS tok
  FROM documents
),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
n AS (SELECT count(*) AS n_docs FROM documents),
-- idf quantized to int64 BEFORE any arithmetic: float products are
-- engine-order-sensitive, integer products are exact and order-free
scored AS (
  SELECT t.doc_id, t.tok, t.tf,
         t.tf * cast(floor(ln(cast(n.n_docs + 1 AS double) / (d.df + 1))
                           * 1000000000 - 0.5) AS bigint) AS s
  FROM tf t JOIN df d ON t.tok = d.tok CROSS JOIN n
),
ranked AS (
  SELECT doc_id, tok, cast(tf AS bigint) AS tf,
         row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, tok) AS rank,
         floor(cast(s AS double) / 1000000000 * 10000 + 0.5) / 10000 AS tfidf
  FROM scored
)
SELECT doc_id, tok, tf, cast(rank AS integer) AS rank, tfidf
FROM ranked WHERE rank <= {_TFIDF_TOPK}
""",
    tags=("extension", "text", "tfidf"),
)
def tfidf_top_terms(spark, sf_dir):
    """TF-IDF keyword extraction: top-3 terms per document by smoothed
    tf·idf. The document-frequency table is corpus-aggregate-sized and
    broadcasts back over the per-doc term counts; ranking is a window
    PARTITIONED by doc_id (bounded per-doc state). The idf log term is
    int64-quantized before the tf product, so ranking and values are exact
    integer arithmetic — bit-identical to the oracle, no float-order
    sensitivity (same convention as text_bigram_lm_score)."""
    from pyspark.sql import Window

    d = read_table(spark, sf_dir, "documents")
    n_docs = d.count()  # driver-side scalar: one tiny count, reused as a literal
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\r\f]+")).alias("tok"),
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    idf_scaled = F.floor(
        F.log(F.lit(float(n_docs + 1)) / (F.col("df") + 1)) * 1_000_000_000 - 0.5
    ).cast("long")
    scored = tf.join(F.broadcast(df.select("tok", idf_scaled.alias("idf_s"))), "tok")
    s = F.col("tf") * F.col("idf_s")
    w = Window.partitionBy("doc_id").orderBy(F.desc("s"), F.asc("tok"))
    return (
        scored.select("doc_id", "tok", F.col("tf").cast("long").alias("tf"), s.alias("s"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _TFIDF_TOPK)
        .select(
            "doc_id",
            "tok",
            "tf",
            F.col("rank").cast("int").alias("rank"),
            round_half_up(F.col("s").cast("double") / 1_000_000_000, 4).alias("tfidf"),
        )
    )


# --- per-document unigram entropy ----------------------------------------------------


@register(
    "text_unigram_entropy",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '[ \\t\\n\\r\\f]+') AS t FROM documents
),
scored AS (
  SELECT doc_id,
         cast(len(t) AS bigint) AS n_tokens,
         cast(list_sum(list_transform(
           list_distinct(t),
           w -> cast(floor(
                  (len(list_filter(t, x -> x = w)) / cast(len(t) AS double))
                  * ln(len(list_filter(t, x -> x = w)) / cast(len(t) AS double))
                  * 1000000000 - 0.5) AS bigint))) AS double) AS h_scaled
  FROM toks
)
SELECT doc_id, n_tokens,
       floor(-(h_scaled / 1000000000) * 10000 + 0.5) / 10000 AS entropy
FROM scored
""",
    tags=("extension", "text", "quality"),
)
def text_unigram_entropy(spark, sf_dir):
    """Per-document unigram (token) Shannon entropy — low entropy flags
    repetitive/boilerplate text, complementing the Gopher repetition rules
    and the bigram LM. Computed ENTIRELY in-row: distinct tokens, counts,
    and the -sum(p ln p) fold are array lambdas over the doc's own token
    array, so the operator is shuffle-free at any corpus size. Each p*ln(p)
    term is int64-quantized before the fold, making the sum independent of
    the (engine-specific) distinct-token enumeration order. The token
    array materializes as a column behind a project_fence — inlined into
    the per-distinct-token lambda, the split/lower/trim tree would re-run
    once per (distinct token x reference), ~5x the operator."""
    from ..functions.numeric import project_fence

    d = project_fence(
        read_table(spark, sf_dir, "documents").select(
            "doc_id",
            F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\r\f]+").alias("t"),
        )
    )
    t = F.col("t")
    n = F.size(t).cast("double")

    def term(w):
        cnt = F.size(F.filter(t, lambda x: x == w)).cast("double")
        p = cnt / n
        return F.floor(p * F.log(p) * 1_000_000_000 - 0.5).cast("long")

    h_scaled = F.aggregate(
        F.transform(F.array_distinct(t), term),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    ).cast("double")
    return d.select(
        "doc_id",
        F.size(t).cast("long").alias("n_tokens"),
        round_half_up(-(h_scaled / 1_000_000_000), 4).alias("entropy"),
    )


# --- OOV rate against a frequency-ranked vocabulary -------------------------------


@register(
    "oov_rate_top_vocab",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '[ \\t\\n\\r\\f]+')) AS tok
  FROM documents
),
vocab AS (
  SELECT tok FROM toks GROUP BY tok
  ORDER BY count(*) DESC, tok
  LIMIT 100
)
SELECT t.doc_id,
       cast(count(*) AS bigint) AS n_tokens,
       cast(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS bigint) AS n_oov,
       floor((cast(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS double)
              / count(*)) * 10000 + 0.5) / 10000 AS oov_rate
FROM toks t LEFT JOIN vocab v ON v.tok = t.tok
GROUP BY t.doc_id
""",
    tags=("extension", "text", "vocab"),
)
def oov_rate_top_vocab(spark, sf_dir):
    """Out-of-vocabulary rate per document against the corpus' own top-100
    token vocabulary — the tokenizer-coverage diagnostic run before
    committing to a vocab size. Two passes over the token relation: the
    vocabulary is a TakeOrdered top-k (tiny, broadcast back), then the
    per-doc OOV flags aggregate on doc_id. The fact-side token relation
    never shuffles on the token — vocab membership is a broadcast hash
    probe — so at 100 TB the cost is the explode plus one doc_id
    aggregation, both map-heavy."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\r\f]+")).alias("tok"),
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(100)
        .select("tok", F.lit(True).alias("in_vocab"))
    )
    flagged = toks.join(F.broadcast(vocab), "tok", "left")
    n_oov = F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        n_oov.cast("long").alias("n_oov"),
        round_half_up(n_oov.cast("double") / F.count(F.lit(1)), 4).alias("oov_rate"),
    )


# --- edit-distance verification of candidate pairs --------------------------------


@register(
    "edit_distance_pairs",
    oracle="""
WITH d AS (
  SELECT doc_id, substr(text, 1, 120) AS prefix FROM documents WHERE doc_id < 40
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       cast(levenshtein(a.prefix, b.prefix) AS bigint) AS edit_dist,
       floor((1.0 - cast(levenshtein(a.prefix, b.prefix) AS double)
                    / greatest(length(a.prefix), length(b.prefix))) * 10000 + 0.5)
         / 10000 AS edit_sim
FROM d a JOIN d b ON a.doc_id < b.doc_id
""",
    tags=("extension", "text", "dedup"),
)
def edit_distance_pairs(spark, sf_dir):
    """Character-level edit distance over candidate document pairs — the
    expensive exact verifier a near-dup pipeline runs AFTER cheap banding
    (LSH/SimHash) has cut candidates to a tractable set; the doc_id bound
    here is that candidate cap. Prefix-truncated to 120 chars so the DP
    cost per pair is constant; levenshtein is an exact integer in both
    engines, and the normalized similarity is one double division. The
    pair generation is a bounded self-join, never all-pairs over the
    corpus."""
    d = (
        read_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 40)
        .select("doc_id", F.substring("text", 1, 120).alias("prefix"))
    )
    a, b = d.alias("a"), d.alias("b")
    dist = F.levenshtein(F.col("a.prefix"), F.col("b.prefix"))
    longest = F.greatest(F.length("a.prefix"), F.length("b.prefix"))
    return (
        a.join(F.broadcast(b), F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.cast("long").alias("edit_dist"),
            round_half_up(
                1.0 - dist.cast("double") / longest.cast("double"), 4
            ).alias("edit_sim"),
        )
    )


# --- token co-occurrence / PMI lift ------------------------------------------------

_PMI_VOCAB = 40
_PMI_TOPK = 20

_PMI_ORACLE = f"""
WITH tokd AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '[ \\t\\n\\r\\f]+')) AS tok
    FROM documents
  ) WHERE tok <> ''
),
df AS (SELECT tok, cast(count(*) AS bigint) AS df FROM tokd GROUP BY tok),
vocab AS (
  SELECT tok, df FROM df
  QUALIFY row_number() OVER (ORDER BY df DESC, tok) <= {_PMI_VOCAB}
),
tv AS (SELECT t.doc_id, t.tok FROM tokd t JOIN vocab v ON v.tok = t.tok),
pairs AS (
  SELECT a.tok AS tok1, b.tok AS tok2, cast(count(*) AS bigint) AS n_docs_both
  FROM tv a JOIN tv b ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY a.tok, b.tok
),
n AS (SELECT cast(count(*) AS bigint) AS n_docs FROM documents)
SELECT p.tok1, p.tok2, p.n_docs_both, v1.df AS df1, v2.df AS df2,
       floor(cast(p.n_docs_both * n.n_docs AS double)
             / cast(v1.df * v2.df AS double) * 1000000 + 0.5) / 1000000 AS lift
FROM pairs p
JOIN vocab v1 ON v1.tok = p.tok1
JOIN vocab v2 ON v2.tok = p.tok2
CROSS JOIN n
ORDER BY lift DESC, tok1, tok2
LIMIT {_PMI_TOPK}
"""


@register(
    "token_pmi_top_pairs",
    oracle=_PMI_ORACLE,
    tags=("extension", "text", "vocab", "cooccurrence"),
)
def token_pmi_top_pairs(spark, sf_dir):
    """Top token pairs by PMI lift — which words co-occur in the same
    document far more than their individual frequencies predict. Lift
    ``P(x,y)/(P(x)P(y))`` orders identically to PMI (log is monotone), so
    no cross-engine-unsafe ``ln`` ever runs: both products are exact int64
    and the lift is ONE double division, floor-rounded.

    The pair space is bounded by a top-40 document-frequency vocabulary —
    chosen with ``orderBy().limit()`` (TakeOrderedAndProject, deterministic
    via the (df desc, tok) total order), then broadcast. Pair generation is
    IN-ROW: each doc's qualifying tokens become one sorted array and the
    (i<j) pairs come from nested array lambdas — the corpus shuffles once
    (the doc grouping); no token-level self-join ever touches an executor
    boundary. At 100 TB the vocabulary cap is the knob: candidate pairs
    scale with docs x C(vocab_hits, 2), independent of corpus vocabulary
    size."""
    d = read_table(spark, sf_dir, "documents")
    tokd = (
        d.select(
            "doc_id",
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\r\f]+")).alias("tok"),
        )
        .where(F.col("tok") != "")
        .distinct()
    )
    df_counts = tokd.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    vocab = df_counts.orderBy(F.desc("df"), F.asc("tok")).limit(_PMI_VOCAB)
    tv = tokd.join(F.broadcast(vocab.select("tok")), "tok")
    per_doc = tv.groupBy("doc_id").agg(
        F.array_sort(F.collect_set("tok")).alias("t")
    )
    sz = F.size(F.col("t"))
    pair_structs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), sz - 1),
            lambda i: F.transform(
                F.sequence(i + F.lit(1), sz),
                lambda j: F.struct(
                    F.element_at(F.col("t"), i).alias("tok1"),
                    F.element_at(F.col("t"), j).alias("tok2"),
                ),
            ),
        )
    )
    pairs = (
        per_doc.where(sz >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .select("p.tok1", "p.tok2")
        .groupBy("tok1", "tok2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs_both"))
    )
    n_docs = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    v1 = vocab.select(F.col("tok").alias("tok1"), F.col("df").alias("df1"))
    v2 = vocab.select(F.col("tok").alias("tok2"), F.col("df").alias("df2"))
    lift = (F.col("n_docs_both") * F.col("n_docs")).cast("double") / (
        F.col("df1") * F.col("df2")
    ).cast("double")
    return (
        pairs.join(F.broadcast(v1), "tok1")
        .join(F.broadcast(v2), "tok2")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "tok1",
            "tok2",
            "n_docs_both",
            "df1",
            "df2",
            round_half_up(lift, 6).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("tok1"), F.asc("tok2"))
        .limit(_PMI_TOPK)
    )


# --- fasttext-style quality classifier inference ------------------------------------

#: hashed feature space size (unigrams + bigrams share it, fasttext-style)
_QC_DIM = 512
#: Knuth multiplicative constant deriving a pseudo-random weight per feature
_QC_MIX = 2654435761
#: weight grid: w = ((f * MIX) % GRID) - GRID/2, i.e. in [-GRID/2, GRID/2)
_QC_GRID = 1048576


def _qc_wint_sql(expr: str) -> str:
    """Integer weight of one token expression, DuckDB form."""
    return (
        f"((cast(concat('0x', substr(md5({expr}), 1, 15)) AS bigint)"
        f" % {_QC_DIM}) * {_QC_MIX}) % {_QC_GRID} - {_QC_GRID // 2}"
    )


_QC_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '[ \\t\\n\\r\\f]+'),
                     x -> length(x) > 0) AS toks
  FROM documents
),
f AS (
  SELECT doc_id,
         list_transform(toks, x -> {_qc_wint_sql('x')}) AS uw,
         list_transform(generate_series(1, len(toks) - 1),
                        i -> {_qc_wint_sql("toks[i] || ' ' || toks[i+1]")}) AS bw
  FROM t
),
s AS (
  SELECT doc_id,
         cast(len(uw) + len(bw) AS bigint) AS n_features,
         cast(coalesce(list_aggregate(uw, 'sum'), 0)
              + coalesce(list_aggregate(bw, 'sum'), 0) AS bigint) AS sum_w
  FROM f
)
SELECT doc_id, n_features,
       CASE WHEN n_features = 0 THEN NULL
            ELSE floor(cast(sum_w AS double) / (n_features * {_QC_GRID}.0)
                       * 1000000 + 0.5) / 1000000 END AS quality_score,
       CASE WHEN n_features = 0 THEN NULL ELSE sum_w > 0 END AS keep
FROM s
"""


def _qc_wint(col):
    """Integer weight of one token column: hash to a {_QC_DIM}-dim feature
    space, then a multiplicative-mix pseudo-weight on an integer grid —
    exact in both engines (all ops stay far below int64 range)."""
    from ..operators.dedup import token_hash

    return (token_hash(col) % _QC_DIM) * _QC_MIX % _QC_GRID - _QC_GRID // 2


@register(
    "quality_classifier_score",
    oracle=_QC_ORACLE,
    tags=("extension", "text", "classifier"),
)
def quality_classifier_score(spark, sf_dir):
    """Fasttext-shaped linear quality classifier, inference path: hash
    unigrams AND bigrams into a 512-dim feature space, look up an integer
    weight per feature (derived from the feature id by multiplicative
    mixing — standing in for broadcast trained weights, same plan shape),
    average them, and keep documents whose mean weight is positive.
    Output per doc: feature count, mean weight in [-0.5, 0.5) rounded to
    6 decimals, and the keep/drop verdict.

    The verdict is computed on the INTEGER weight sum (exact in both
    engines); only the reported score touches doubles — one division of
    an exact int by an exact int, then half-up rounding, deterministic.

    Scale: entirely in-row (transform/aggregate over the token array —
    no explode, no shuffle, no UDF); this is the map-only plan a quality
    filter must have to run inline with a 100 TB corpus scan. A real
    trained model swaps the weight derivation for a broadcast array
    lookup; nothing else changes."""
    d = widen(read_table(spark, sf_dir, "documents"))
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\r\f]+"),
        lambda x: F.length(x) > 0,
    )
    e = d.select("doc_id", toks.alias("toks"))
    zero = F.lit(0).cast("long")
    uw = F.transform(F.col("toks"), _qc_wint)
    bw = F.when(
        F.size("toks") > 1,
        F.zip_with(
            F.slice(F.col("toks"), 1, F.size("toks") - 1),
            F.slice(F.col("toks"), 2, F.size("toks") - 1),
            lambda a, b: _qc_wint(F.concat(a, F.lit(" "), b)),
        ),
    ).otherwise(F.array().cast("array<long>"))
    s = e.select(
        "doc_id",
        uw.alias("uw"),
        bw.alias("bw"),
    ).select(
        "doc_id",
        (F.size("uw") + F.size("bw")).cast("long").alias("n_features"),
        (
            F.aggregate(F.col("uw"), zero, lambda acc, x: acc + x)
            + F.aggregate(F.col("bw"), zero, lambda acc, x: acc + x)
        ).alias("sum_w"),
    )
    score = F.floor(
        F.col("sum_w").cast("double")
        / (F.col("n_features") * F.lit(float(_QC_GRID)))
        * 1000000
        + 0.5
    ) / 1000000
    return s.select(
        "doc_id",
        "n_features",
        F.when(F.col("n_features") == 0, F.lit(None).cast("double"))
        .otherwise(score)
        .alias("quality_score"),
        F.when(F.col("n_features") == 0, F.lit(None).cast("boolean"))
        .otherwise(F.col("sum_w") > 0)
        .alias("keep"),
    )


# --- classifier calibration bins ----------------------------------------------------

_CAL_ORACLE = f"""
WITH qc AS ({_QC_ORACLE}),
j AS (
  SELECT qc.quality_score, d.lang
  FROM qc JOIN documents d USING (doc_id)
  WHERE qc.n_features > 0
)
SELECT cast(least(greatest(floor((quality_score + 0.5) * 10), 0), 9) AS int)
         AS bin_id,
       cast(count(*) AS bigint) AS n_docs,
       {{mean_score}} AS mean_score,
       {{en_rate}} AS en_rate
FROM j
GROUP BY 1
""".format(
    mean_score="cast(round(sum(cast(quality_score AS decimal(28,6)))"
    " / count(*), 4) AS double)",
    en_rate="floor(cast(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS double)"
    " / cast(count(*) AS double) * 10000 + 0.5) / 10000",
)


@register(
    "calibration_bins",
    oracle=_CAL_ORACLE,
    tags=("extension", "text", "classifier", "evaluation"),
)
def calibration_bins(spark, sf_dir):
    """Reliability table for :func:`quality_classifier_score`: scores
    (range [-0.5, 0.5)) are cut into 10 equal bins; per bin, the doc
    count, the mean score, and the rate of a reference attribute
    (``lang = 'en'``) standing in for a ground-truth label. This is the
    calibration readout every score-based corpus filter ships with — the
    same query shape works for any (score, label) pair.

    Determinism: scores are already on a 1e-6 grid, so the per-bin mean
    is an exact decimal sum over grid points divided once; the label
    rate is one integer/integer division, half-up rounded.

    Scale: the classifier stays map-only; this adds one doc_id-keyed
    equi-join against the label source and a 10-group aggregate."""
    qc = quality_classifier_score(spark, sf_dir).where(F.col("n_features") > 0)
    d = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    j = qc.join(d, "doc_id")
    bin_id = (
        F.least(
            F.greatest(F.floor((F.col("quality_score") + 0.5) * 10), F.lit(0)),
            F.lit(9),
        )
        .cast("int")
        .alias("bin_id")
    )
    return j.groupBy(bin_id).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (
            F.round(
                F.sum(F.col("quality_score").cast("decimal(28,6)"))
                / F.count(F.lit(1)),
                4,
            )
        )
        .cast("double")
        .alias("mean_score"),
        round_half_up(
            count_if(F.col("lang") == "en").cast("double")
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("en_rate"),
    )


# --- inverted-index postings summary ------------------------------------------------

_POSTINGS_ORACLE = """
WITH tf AS (
  SELECT w AS token, doc_id, cast(count(*) AS bigint) AS tf
  FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(trim(text)), '[ \\t\\n\\r\\f]+')) AS w
    FROM documents
  )
  WHERE length(w) > 0
  GROUP BY w, doc_id
)
SELECT token,
       cast(count(*) AS bigint) AS df,
       cast(sum(tf) AS bigint) AS total_tf,
       cast(max(tf) AS bigint) AS max_tf,
       cast(((max(tf * 1099511627776 - doc_id) + 1099511627775)
             // 1099511627776) * 1099511627776
            - max(tf * 1099511627776 - doc_id) AS bigint) AS top_doc_id
FROM tf
GROUP BY token
"""


@register(
    "inverted_index_postings",
    oracle=_POSTINGS_ORACLE,
    tags=("extension", "text", "search-index"),
)
def inverted_index_postings(spark, sf_dir):
    """Inverted-index build, posting-summary form (the distributed core
    of the reference's Elasticsearch hop, `index_elasticsearch.py` —
    what the engine materializes instead of shipping rows to a search
    service): per token, document frequency, total/max term frequency,
    and the top-scoring document (highest tf, ties to the lowest
    doc_id — the argmax encoded as max(tf * 2^40 - doc_id), exact int64).

    Scale: (token, doc) tf aggregate, then a token-keyed aggregate — two
    shuffles on the natural index keys, identical to how a search engine
    shards postings. No collect, no UDF."""
    d = widen(read_table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id",
        F.explode(
            F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\r\f]+")
        ).alias("token"),
    ).where(F.length("token") > 0)
    tf = toks.groupBy("token", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    big = 1 << 40
    key = F.col("tf") * big - F.col("doc_id")
    return tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("total_tf"),
        F.max("tf").cast("long").alias("max_tf"),
        (
            ((F.max(key) + big - 1) - ((F.max(key) + big - 1) % big))
            - F.max(key)
        )
        .cast("long")
        .alias("top_doc_id"),
    )
