"""Data-selection / corpus-curation extension queries (SURVEY.md section 2.7
north-star LLM-pipeline operators; no reference citation — the reference has
no corpus tooling, these are designed Spark-first from the public methods):

- DSIR importance resampling (Xie et al. 2023, "Data Selection for Language
  Models via Importance Resampling"): hashed-n-gram importance weights of
  each raw document against a target domain.
- Boilerplate n-gram coverage (the CCNet/RefinedWeb cleaning signal):
  corpus-frequent 5-gram spans and the fraction of each document they cover.
- Heaps-law vocabulary growth: distinct-vocabulary size as a function of
  corpus prefix, the sub-linearity every tokenizer-budget plan relies on.
- Zipf rank-frequency fit: OLS of log(freq) on log(rank) over the top
  token ranks — the corpus-health diagnostic (natural text: slope near -1).
- Fellegi-Sunter record linkage (Fellegi & Sunter 1969): blocked candidate
  pairs scored by integer-quantized log-likelihood agreement weights.

Cross-engine determinism discipline (same as ext_text's bigram-LM scorer):
every per-feature float (a single ln()) is quantized to an integer
micro/milli unit IMMEDIATELY, so all cross-row sums are order-free integer
arithmetic; the only residual risk is a ~1-ulp libm ln() difference landing
exactly on a 0.5e-6 rounding boundary, which the driver gate would surface.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ..functions.numeric import count_if, round_half_up
from ..operators.dedup import token_hash, token_hash_sql
from ..sources.lake import read_table, widen
from . import register
from ..operators.checkpointing import cut_eager, cut_lazy

#: tokenizer shared by every query here — identical character class in
#: Spark (Java regex) and DuckDB (RE2); empties filtered on both sides.
_TOK_SQL = (
    "list_filter(string_split_regex(lower(trim(text)), '[ \\t\\n\\r\\f]+'),"
    " x -> length(x) > 0)"
)


def _toks():
    return F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\r\f]+"),
        lambda x: F.length(x) > 0,
    )


def _ngram_arrow_enabled() -> bool:
    """A/B lever for the Arrow hashed-n-gram stream kernel below (read
    at plan build time) — the same JVM-md5 -> batch-C-md5 boundary move
    measured ~8x at sf10 on the dedup shingle kernel
    (operators/dedup.py:_shingle_arrow_enabled). Governs the 5-gram
    stream (boilerplate_ngram_coverage: 2.4x at sf10, flat at sf0.1)."""
    import os

    return os.environ.get("SPARK_GRAFT_NGRAM_ARROW", "1").lower() not in (
        "0", "false", "no",
    )


def _dsir_arrow_enabled() -> bool:
    """Separate lever for the DSIR feature stream's Arrow twin, DEFAULT
    OFF: unlike every other md5 stream, the Arrow form measured SLOWER
    at BOTH scales (sf0.1 interleaved min 1.67 JVM vs 2.29 Arrow; sf10
    quiet rounds 13.1/14.1 JVM vs 16.4/15.2 Arrow —
    .round17/ab_dsir_sf01.out, ab_dsir_sf10_quiet.out). The stream's
    features are single tokens and bigrams: per-feature md5 work is
    tiny, so the per-row Python list-building overhead dominates the
    boundary saving, and the un-materialized stream feeds two consumers
    so the kernel runs twice. Kept behind the lever with its row-for-row
    equivalence test as the recorded negative result."""
    import os

    return os.environ.get("SPARK_GRAFT_DSIR_ARROW", "0").lower() not in (
        "0", "false", "no",
    )


def _py_toks(txt: str) -> list[str]:
    """Python twin of :func:`_toks` (module docstring tokenizer): split
    on the same whitespace class after space-only trim + lower, empties
    filtered — so leading/trailing-separator artifacts cannot differ."""
    import re as _re

    return [t for t in _re.split(r"[ \t\n\r\f]+", txt.strip(" ").lower()) if t]


def _dsir_feats_arrow(d):
    """mapInArrow twin of the dsir feature stream: per document, the
    unigram hashes then the bigram hashes (token_hash % _DSIR_DIM), with
    the is_target flag echoed per row — exactly the rows of
    explode(concat(uni, bi)). Zero-token documents emit nothing, like
    exploding an empty array."""
    import pyarrow as pa

    target = _DSIR_TARGET_SOURCE

    def kernel(batches):
        import hashlib

        md5 = hashlib.md5

        def h(s):
            return int(md5(s.encode("utf-8")).hexdigest()[:15], 16) % _DSIR_DIM

        for batch in batches:
            ids = batch.column(0).to_pylist()
            srcs = batch.column(1).to_pylist()
            texts = batch.column(2).to_pylist()
            out_id, out_t, out_fb = [], [], []
            for did, src, txt in zip(ids, srcs, texts):
                if txt is None:
                    continue
                toks = _py_toks(txt)
                if not toks:
                    continue
                is_t = src == target
                for x in toks:
                    out_id.append(did)
                    out_t.append(is_t)
                    out_fb.append(h(x))
                for a, b in zip(toks, toks[1:]):
                    out_id.append(did)
                    out_t.append(is_t)
                    out_fb.append(h(a + " " + b))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_id, pa.int64()),
                    pa.array(out_t, pa.bool_()),
                    pa.array(out_fb, pa.int64()),
                ],
                ["doc_id", "is_target", "fb"],
            )

    return widen(d.select("doc_id", "source", "text")).mapInArrow(
        kernel, "doc_id long, is_target boolean, fb long"
    )


def _gram_hash_stream_arrow(d, n: int):
    """mapInArrow twin of the hashed word-n-gram stream: per document,
    token_hash of each n-token window (space-joined), document order,
    docs with fewer than n tokens absent — exactly the rows of
    explode(transform(sequence(...), token_hash(concat_ws(' ', slice))))
    over the filtered tokenizer."""
    import pyarrow as pa

    def kernel(batches):
        import hashlib

        md5 = hashlib.md5
        join = " ".join
        for batch in batches:
            ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            out_id, out_gh = [], []
            for did, txt in zip(ids, texts):
                if txt is None:
                    continue
                toks = _py_toks(txt)
                m = len(toks) - (n - 1)
                for i in range(max(m, 0)):
                    out_id.append(did)
                    out_gh.append(
                        int(
                            md5(join(toks[i : i + n]).encode("utf-8"))
                            .hexdigest()[:15],
                            16,
                        )
                    )
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_id, pa.int64()), pa.array(out_gh, pa.int64())],
                ["doc_id", "gh"],
            )

    return widen(d.select("doc_id", "text")).mapInArrow(
        kernel, "doc_id long, gh long"
    )


# --- DSIR hashed-n-gram importance weights ------------------------------------------

_DSIR_DIM = 1024
_DSIR_TOPK = 200
_DSIR_TARGET_SOURCE = "src0"

_DSIR_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source, {_TOK_SQL} AS toks FROM documents
),
f AS (
  SELECT doc_id, source = '{_DSIR_TARGET_SOURCE}' AS is_target,
         unnest(list_concat(
           list_transform(toks, x -> {token_hash_sql('x')} % {_DSIR_DIM}),
           list_transform(generate_series(1, len(toks) - 1),
                          i -> {token_hash_sql("toks[i] || ' ' || toks[i+1]")}
                               % {_DSIR_DIM})
         )) AS fb
  FROM t
),
c AS (
  SELECT fb,
         cast(count(*) AS bigint) AS q_f,
         cast(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS bigint) AS t_f
  FROM f GROUP BY fb
),
tot AS (
  SELECT cast(sum(q_f) AS bigint) AS qn, cast(sum(t_f) AS bigint) AS tn FROM c
),
r AS (
  SELECT fb,
         cast(floor((ln((t_f + 1.0) / (tn + {_DSIR_DIM}.0))
                     - ln((q_f + 1.0) / (qn + {_DSIR_DIM}.0))) * 1000000 + 0.5)
              AS bigint) AS wq
  FROM c, tot
),
s AS (
  SELECT doc_id, cast(count(*) AS bigint) AS n_feats,
         cast(sum(wq) AS bigint) AS w_micro
  FROM f JOIN r ON f.fb = r.fb GROUP BY doc_id
)
SELECT doc_id, n_feats, w_micro, cast(w_micro AS double) / 1000000 AS logw
FROM s ORDER BY w_micro DESC, doc_id LIMIT {_DSIR_TOPK}
"""


@register(
    "dsir_importance_weights",
    oracle=_DSIR_ORACLE,
    tags=("extension", "corpus", "selection", "dsir"),
)
def dsir_importance_weights(spark, sf_dir):
    """DSIR (Xie et al. 2023): estimate hashed-bigram feature distributions
    for a target domain (here ``source = 'src0'``, the stand-in for "looks
    like Wikipedia") and for the raw corpus, and score every document by
    its log importance weight sum_f log(p_target(f)/p_raw(f)) with add-1
    smoothing over a {dim}-bucket hashed feature space; emit the top {k}
    documents by weight (the resampling pool), tie-broken by doc_id.

    Determinism: each bucket's log-ratio is quantized to an integer
    micro-unit once (one ln per bucket, from exact integer counts); the
    per-document score is then an order-free integer sum, and the top-k
    cut is total-ordered (w_micro desc, doc_id).

    Scale: feature counting is one map-side-combined aggregate over the
    exploded feature stream; the ratio table is at most {dim} rows and is
    BROADCAST back onto the stream, so the only corpus-sized shuffle is
    the per-document integer sum; the top-k compiles to
    TakeOrderedAndProject (no global sort). Documents with zero tokens
    have no features and are not scored — DSIR resamples from the scored
    pool by construction.
    """.format(dim=_DSIR_DIM, k=_DSIR_TOPK)
    d = widen(read_table(spark, sf_dir, "documents"))
    # the feature stream feeds BOTH the bucket counts and the score join.
    # Deliberately NOT materialized: the exploded (doc, feature) stream is
    # larger than the compressed columnar source it comes from, so two
    # pipelined scans that re-tokenize beat one checkpoint write + two
    # block reads (measured ~2.6 -> 2.2 s at sf0.1, and the gap widens
    # with corpus size).
    if _dsir_arrow_enabled():
        feats = _dsir_feats_arrow(d)
    else:
        toks = _toks()
        uni = F.transform(F.col("toks"), lambda x: token_hash(x) % _DSIR_DIM)
        bi = F.when(
            F.size("toks") > 1,
            F.zip_with(
                F.slice(F.col("toks"), 1, F.size("toks") - 1),
                F.slice(F.col("toks"), 2, F.size("toks") - 1),
                lambda a, b: token_hash(F.concat(a, F.lit(" "), b)) % _DSIR_DIM,
            ),
        ).otherwise(F.array().cast("array<long>"))
        feats = d.select(
            "doc_id",
            (F.col("source") == _DSIR_TARGET_SOURCE).alias("is_target"),
            toks.alias("toks"),
        ).select(
            "doc_id", "is_target", F.explode(F.concat(uni, bi)).alias("fb")
        )
    counts = feats.groupBy("fb").agg(
        F.count(F.lit(1)).alias("q_f"), count_if(F.col("is_target")).alias("t_f")
    )
    tot = counts.agg(F.sum("q_f").alias("qn"), F.sum("t_f").alias("tn"))
    dim = float(_DSIR_DIM)
    ratio = counts.crossJoin(F.broadcast(tot)).select(
        "fb",
        F.floor(
            (
                F.log((F.col("t_f") + 1.0) / (F.col("tn") + dim))
                - F.log((F.col("q_f") + 1.0) / (F.col("qn") + dim))
            )
            * 1000000
            + 0.5
        )
        .cast("long")
        .alias("wq"),
    )
    scored = (
        feats.join(F.broadcast(ratio), "fb")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_feats"), F.sum("wq").alias("w_micro"))
    )
    return (
        scored.orderBy(F.desc("w_micro"), F.asc("doc_id"))
        .limit(_DSIR_TOPK)
        .select(
            "doc_id",
            "n_feats",
            "w_micro",
            (F.col("w_micro").cast("double") / 1000000).alias("logw"),
        )
    )


# --- boilerplate n-gram coverage ----------------------------------------------------

_BP_N = 5
_BP_DF_MIN = 10

_BP_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_TOK_SQL} AS toks FROM documents
),
g AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, len(toks) - {_BP_N - 1}),
           i -> {token_hash_sql(f"array_to_string(list_slice(toks, i, i + {_BP_N - 1}), ' ')")}
         )) AS gh
  FROM t
),
df AS (
  SELECT gh FROM g GROUP BY gh
  HAVING count(DISTINCT doc_id) >= {_BP_DF_MIN}
),
a AS (
  SELECT g.doc_id,
         cast(count(*) AS bigint) AS n_grams,
         cast(sum(CASE WHEN df.gh IS NOT NULL THEN 1 ELSE 0 END) AS bigint)
           AS n_boiler
  FROM g LEFT JOIN df ON g.gh = df.gh
  GROUP BY g.doc_id
)
SELECT d.doc_id,
       coalesce(a.n_grams, 0) AS n_grams,
       coalesce(a.n_boiler, 0) AS n_boiler,
       CASE WHEN a.n_grams > 0 THEN
         floor(cast(a.n_boiler AS double) / a.n_grams * 1000000 + 0.5) / 1000000
       END AS boiler_frac,
       CASE WHEN a.n_grams > 0 THEN
         cast(a.n_boiler AS double) / a.n_grams >= 0.5
       END AS is_boilerplate_doc
FROM documents d LEFT JOIN a ON d.doc_id = a.doc_id
"""


@register(
    "boilerplate_ngram_coverage",
    oracle=_BP_ORACLE,
    tags=("extension", "corpus", "quality", "boilerplate"),
)
def boilerplate_ngram_coverage(spark, sf_dir):
    """Boilerplate detection, the CCNet/RefinedWeb cleaning signal: a
    5-gram that occurs in >= {df} distinct documents is corpus boilerplate
    (navigation chrome, license headers, templated spans); each document
    reports how many of its 5-gram positions are boilerplate and the
    covered fraction, with docs at >= 50% coverage flagged for removal.

    Scale: grams are built in-row (no per-position explode until the
    single hashed-gram stream), document frequency is one
    count-distinct aggregate on the 60-bit gram hash (two-phase, int
    keys), and the surviving boilerplate set — small by construction,
    it's the grams shared by many documents — is BROADCAST back, so the
    only corpus-sized shuffles are the gram-stream aggregates, never a
    gram-string shuffle.
    """.format(df=_BP_DF_MIN)
    d = widen(read_table(spark, sf_dir, "documents"))
    # gram stream feeds both the DF aggregate and the coverage join.
    # Deliberately NOT materialized: the exploded (doc, gram-hash) stream
    # is larger than the compressed source, so two pipelined scans that
    # re-tokenize beat one checkpoint write + two block reads (measured
    # ~2.4 -> 2.0 s at sf0.1; same trade as dsir_importance_weights).
    if _ngram_arrow_enabled():
        g = _gram_hash_stream_arrow(d, _BP_N)
    else:
        toks = _toks()
        grams = F.when(
            F.size("toks") >= _BP_N,
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - (_BP_N - 1)),
                lambda i: token_hash(
                    F.concat_ws(" ", F.slice(F.col("toks"), i, _BP_N))
                ),
            ),
        ).otherwise(F.array().cast("array<long>"))
        g = d.select("doc_id", toks.alias("toks")).select(
            "doc_id", F.explode(grams).alias("gh")
        )
    boiler = (
        g.groupBy("gh")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= _BP_DF_MIN)
        .select("gh", F.lit(1).alias("is_boiler"))
    )
    agg = (
        g.join(F.broadcast(boiler), "gh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            count_if(F.col("is_boiler").isNotNull()).alias("n_boiler"),
        )
    )
    frac = F.col("n_boiler").cast("double") / F.col("n_grams")
    return (
        d.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_boiler", F.lit(0)).alias("n_boiler"),
            F.when(F.col("n_grams") > 0, round_half_up(frac, 6)).alias("boiler_frac"),
            F.when(F.col("n_grams") > 0, frac >= 0.5).alias("is_boilerplate_doc"),
        )
    )


# --- Heaps-law vocabulary growth ----------------------------------------------------

_HEAPS_PCTS = (10, 25, 50, 75, 100)

_HEAPS_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_TOK_SQL} AS toks FROM documents
),
o AS (
  SELECT doc_id, {token_hash_sql('unnest(toks)')} AS th FROM t
),
per_doc_occ AS (
  SELECT doc_id, cast(count(*) AS bigint) AS n_occ FROM o GROUP BY doc_id
),
per_doc_new AS (
  SELECT first_seen AS doc_id, cast(count(*) AS bigint) AS n_new
  FROM (SELECT th, min(doc_id) AS first_seen FROM o GROUP BY th)
  GROUP BY first_seen
),
base AS (
  SELECT d.doc_id, coalesce(po.n_occ, 0) AS n_occ, coalesce(pn.n_new, 0) AS n_new
  FROM documents d
  LEFT JOIN per_doc_occ po ON d.doc_id = po.doc_id
  LEFT JOIN per_doc_new pn ON d.doc_id = pn.doc_id
),
m AS (SELECT cast(max(doc_id) AS bigint) AS max_id FROM documents),
cps AS (
  SELECT pct, cast(floor((max_id + 1) * pct / 100.0) AS bigint) AS cutoff_doc
  FROM (VALUES {", ".join(f"({p})" for p in _HEAPS_PCTS)}) v(pct), m
)
SELECT cps.pct AS pct, cps.cutoff_doc,
       cast(count(*) AS bigint) AS n_docs_covered,
       cast(sum(base.n_occ) AS bigint) AS n_token_occ,
       cast(sum(base.n_new) AS bigint) AS vocab_size
FROM base JOIN cps ON base.doc_id < cps.cutoff_doc
GROUP BY cps.pct, cps.cutoff_doc
"""


@register(
    "heaps_vocab_growth",
    oracle=_HEAPS_ORACLE,
    tags=("extension", "corpus", "vocab"),
)
def heaps_vocab_growth(spark, sf_dir):
    """Heaps-law vocabulary growth: for corpus prefixes at 10/25/50/75/100%
    of the doc_id range, the cumulative token occurrences and distinct
    vocabulary size (tokens whose FIRST occurrence falls inside the
    prefix). The sub-linear vocab curve is what tokenizer-vocabulary and
    corpus-budget planning read off.

    Scale: token occurrences and first-seen reduce the corpus to two
    per-document aggregates (one shuffle each, map-side combined, int
    keys); the 5-row checkpoint frame is then BROADCAST onto the per-doc
    frame (a non-equi prefix join), so checkpoint count multiplies only
    n_docs rows, never token rows. No window, no collect — the cutoffs
    derive from max(doc_id) inside the plan.
    """
    d = widen(read_table(spark, sf_dir, "documents"))
    # the token stream feeds two aggregates (occurrences, first-seen) —
    # localCheckpoint so the corpus is tokenized/hashed once.
    o = (
        d.select("doc_id", F.explode(_toks()).alias("tok"))
        .select("doc_id", token_hash(F.col("tok")).alias("th"))
        .transform(cut_lazy)
    )
    per_doc_occ = o.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_occ"))
    per_doc_new = (
        o.groupBy("th")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    base = (
        d.select("doc_id")
        .join(per_doc_occ, "doc_id", "left")
        .join(per_doc_new, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_occ", F.lit(0)).alias("n_occ"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
    )
    m = d.agg(F.max("doc_id").alias("max_id"))
    pcts = spark.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in _HEAPS_PCTS])).alias("pct")
    )
    cps = pcts.crossJoin(F.broadcast(m)).select(
        F.col("pct").cast("int").alias("pct"),
        F.floor((F.col("max_id") + 1) * F.col("pct") / 100.0)
        .cast("long")
        .alias("cutoff_doc"),
    )
    return (
        base.join(F.broadcast(cps), F.col("doc_id") < F.col("cutoff_doc"))
        .groupBy("pct", "cutoff_doc")
        .agg(
            F.count(F.lit(1)).alias("n_docs_covered"),
            F.sum("n_occ").alias("n_token_occ"),
            F.sum("n_new").alias("vocab_size"),
        )
    )


# --- Zipf rank-frequency fit --------------------------------------------------------

_ZIPF_TOPK = 1000

_ZIPF_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_TOK_SQL} AS toks FROM documents
),
o AS (SELECT {token_hash_sql('unnest(toks)')} AS th FROM t),
freqs AS (
  SELECT th, cast(count(*) AS bigint) AS freq FROM o GROUP BY th
  ORDER BY freq DESC, th LIMIT {_ZIPF_TOPK}
),
ranked AS (
  SELECT freq, row_number() OVER (ORDER BY freq DESC, th) AS rnk FROM freqs
),
q AS (
  SELECT cast(floor(ln(rnk) * 1000 + 0.5) AS bigint) AS x,
         cast(floor(ln(freq) * 1000 + 0.5) AS bigint) AS y
  FROM ranked
),
s AS (
  SELECT cast(count(*) AS bigint) AS n,
         cast(sum(x) AS bigint) AS sx, cast(sum(y) AS bigint) AS sy,
         cast(sum(x * y) AS bigint) AS sxy,
         cast(sum(x * x) AS bigint) AS sxx,
         cast(sum(y * y) AS bigint) AS syy
  FROM q
)
SELECT n AS n_tokens,
       floor(cast(n * sxy - sx * sy AS double)
             / cast(n * sxx - sx * sx AS double) * 1000000 + 0.5) / 1000000
         AS slope,
       floor((cast(sy AS double) / n
              - cast(n * sxy - sx * sy AS double)
                / cast(n * sxx - sx * sx AS double)
                * cast(sx AS double) / n) / 1000.0 * 1000000 + 0.5) / 1000000
         AS intercept,
       floor(cast(n * sxy - sx * sy AS double) * cast(n * sxy - sx * sy AS double)
             / (cast(n * sxx - sx * sx AS double) * cast(n * syy - sy * sy AS double))
             * 1000000 + 0.5) / 1000000
         AS r2
FROM s
"""


@register(
    "zipf_fit_tokens",
    oracle=_ZIPF_ORACLE,
    tags=("extension", "corpus", "vocab", "zipf"),
)
def zipf_fit_tokens(spark, sf_dir):
    """Zipf rank-frequency fit: OLS of log(freq) on log(rank) over the top
    {k} token ranks — slope near -1 with high r2 is the natural-language
    signature; a flat or broken fit flags synthetic or degenerate text.

    Determinism: log(rank) and log(freq) are quantized to integer
    milli-units per row (one ln each, from exact integer rank/freq), so
    every OLS sum is order-free int64 arithmetic; the final slope/
    intercept/r2 are fixed IEEE expressions over those exact integers —
    bit-identical across engines (milli-quantization keeps all products
    below 2^53).

    Scale: one map-side-combined frequency aggregate on the 60-bit token
    hash, a TakeOrderedAndProject top-{k} cut, then rank via a {k}x{k}
    BROADCAST tie-broken count-join (no partition-less window anywhere),
    and a single-row reduction.
    """.format(k=_ZIPF_TOPK)
    d = widen(read_table(spark, sf_dir, "documents"))
    o = d.select(F.explode(_toks()).alias("tok")).select(
        token_hash(F.col("tok")).alias("th")
    )
    # both sides of the rank self-join read the top-k cut; localCheckpoint
    # materializes the corpus aggregate ONCE (<= {k} rows) so the corpus
    # is never scanned twice (same idiom as the iterative CC operators).
    top = (
        o.groupBy("th")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("th"))
        .limit(_ZIPF_TOPK)
        .transform(cut_eager)
    )
    from ..operators.ranking import rank_by_count_join

    ranked = rank_by_count_join(top, value_col="freq", id_col="th", rank_col="rnk")
    q = ranked.select(
        F.floor(F.log(F.col("rnk").cast("double")) * 1000 + 0.5).cast("long").alias("x"),
        F.floor(F.log(F.col("freq").cast("double")) * 1000 + 0.5).cast("long").alias("y"),
    )
    s = q.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    cnum = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    cden = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    cdeny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    slope = cnum / cden
    intercept = (
        F.col("sy").cast("double") / F.col("n")
        - slope * F.col("sx").cast("double") / F.col("n")
    ) / 1000.0
    return s.select(
        F.col("n").alias("n_tokens"),
        round_half_up(slope, 6).alias("slope"),
        round_half_up(intercept, 6).alias("intercept"),
        round_half_up(cnum * cnum / (cden * cdeny), 6).alias("r2"),
    )


# --- Fellegi-Sunter record linkage --------------------------------------------------

#: comparator -> (m, u): P(agree | match), P(agree | non-match). Stand-in
#: priors (a production linker EM-estimates these); quantized ONCE in Python
#: to integer micro log-likelihood weights embedded in BOTH engines, so the
#: score arithmetic is pure int64 — zero cross-engine float risk.
_FS_MU = {
    "seg": (0.90, 0.20),
    "bal": (0.85, 0.05),
    "sign": (0.95, 0.70),
}
_FS_W = {
    k: (
        round(math.log(m / u) * 1_000_000),
        round(math.log((1 - m) / (1 - u)) * 1_000_000),
    )
    for k, (m, u) in _FS_MU.items()
}
_FS_LINK_MIN = 1_500_000


def _fs_score_sql() -> str:
    terms = []
    for key, cond in (
        ("seg", "a.c_mktsegment = b.c_mktsegment"),
        ("bal", "abs(a.c_acctbal - b.c_acctbal) <= 50.0"),
        ("sign", "(a.c_acctbal < 0) = (b.c_acctbal < 0)"),
    ):
        wa, wd = _FS_W[key]
        terms.append(f"(CASE WHEN {cond} THEN {wa} ELSE {wd} END)")
    return " + ".join(terms)


_FS_ORACLE = f"""
WITH pairs AS (
  SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
         a.c_nationkey AS nationkey,
         a.c_mktsegment = b.c_mktsegment AS seg_agree,
         abs(a.c_acctbal - b.c_acctbal) <= 50.0 AS bal_agree,
         (a.c_acctbal < 0) = (b.c_acctbal < 0) AS sign_agree,
         cast({_fs_score_sql()} AS bigint) AS score_micro
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
)
SELECT custkey_a, custkey_b, nationkey, seg_agree, bal_agree, sign_agree,
       score_micro,
       CASE WHEN score_micro >= {_FS_LINK_MIN} THEN 'link'
            ELSE 'possible' END AS match_class
FROM pairs WHERE score_micro >= 0
"""


@register(
    "record_linkage_fs",
    oracle=_FS_ORACLE,
    tags=("extension", "linkage", "dedup"),
)
def record_linkage_fs(spark, sf_dir):
    """Fellegi-Sunter probabilistic record linkage (Fellegi & Sunter 1969),
    the scoring half of entity resolution: candidate pairs blocked on
    nation, three field comparators (market segment equality, account
    balance within 50, balance-sign agreement), each contributing its
    log2-likelihood-ratio weight log(m/u) on agreement or
    log((1-m)/(1-u)) on disagreement; pairs scoring >= 0 survive,
    split into 'link' vs 'possible' at the upper threshold.

    Weights are integer micro-units computed once at import from the
    documented (m, u) priors and embedded identically in both engines —
    the whole score is int64 arithmetic.

    Scale: blocking IS the scale strategy — the join is an equi-join on
    the block key (shuffle-partitioned, never a cartesian product), so
    pair count is sum of per-block n^2, bounded by the blocking choice;
    a skewed block would be re-blocked on a composite key (the same
    salting pattern as salted_user_event_stats). Comparators and scoring
    are in-row codegen'd expressions.
    """
    c = read_table(spark, sf_dir, "customer")
    a, b = c.alias("a"), c.alias("b")
    pairs = a.join(
        b,
        (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
        & (F.col("a.c_custkey") < F.col("b.c_custkey")),
    )
    conds = {
        "seg": F.col("a.c_mktsegment") == F.col("b.c_mktsegment"),
        "bal": F.abs(F.col("a.c_acctbal") - F.col("b.c_acctbal")) <= 50.0,
        "sign": (F.col("a.c_acctbal") < 0) == (F.col("b.c_acctbal") < 0),
    }
    score = None
    for key, cond in conds.items():
        wa, wd = _FS_W[key]
        term = F.when(cond, F.lit(wa)).otherwise(F.lit(wd))
        score = term if score is None else score + term
    return (
        pairs.select(
            F.col("a.c_custkey").alias("custkey_a"),
            F.col("b.c_custkey").alias("custkey_b"),
            F.col("a.c_nationkey").alias("nationkey"),
            conds["seg"].alias("seg_agree"),
            conds["bal"].alias("bal_agree"),
            conds["sign"].alias("sign_agree"),
            score.cast("long").alias("score_micro"),
        )
        .filter(F.col("score_micro") >= 0)
        .withColumn(
            "match_class",
            F.when(F.col("score_micro") >= _FS_LINK_MIN, F.lit("link")).otherwise(
                F.lit("possible")
            ),
        )
    )


# --- mutual information between categorical columns ---------------------------------

#: (pair label, table, x expr spark/sql, y expr) — MI in nats per pair.
_MI_PAIRS = (
    ("orders:priority~status", "orders", "o_orderpriority", "o_orderstatus"),
    ("lineitem:returnflag~linestatus", "lineitem", "l_returnflag", "l_linestatus"),
    ("part:type~brand", "part", "p_type", "p_brand"),
)


def _mi_pair_sql(label: str, table: str, xc: str, yc: str) -> str:
    return f"""
SELECT '{label}' AS pair, n_rows,
       floor(cast(mi_micro_sum AS double) / n_rows + 0.5) / 1000000 AS mi_nats
FROM (
  SELECT cast(sum(n_xy) AS bigint) AS n_rows,
         cast(sum(n_xy * wq) AS bigint) AS mi_micro_sum
  FROM (
    SELECT j.n_xy,
           cast(floor(ln(cast(j.n_xy AS double) * t.n
                         / (mx.n_x * my.n_y)) * 1000000 + 0.5) AS bigint) AS wq
    FROM (SELECT {xc} AS x, {yc} AS y, cast(count(*) AS bigint) AS n_xy
          FROM {table} GROUP BY 1, 2) j
    JOIN (SELECT {xc} AS x, cast(count(*) AS bigint) AS n_x
          FROM {table} GROUP BY 1) mx ON j.x = mx.x
    JOIN (SELECT {yc} AS y, cast(count(*) AS bigint) AS n_y
          FROM {table} GROUP BY 1) my ON j.y = my.y
    CROSS JOIN (SELECT cast(count(*) AS bigint) AS n FROM {table}) t
  )
)"""


_MI_ORACLE = "\nUNION ALL\n".join(_mi_pair_sql(*p) for p in _MI_PAIRS)


@register(
    "mutual_information_report",
    oracle=_MI_ORACLE,
    tags=("extension", "features", "selection"),
)
def mutual_information_report(spark, sf_dir):
    """Mutual information between categorical column pairs — the
    feature-selection / redundancy screen run before training tabular
    models: MI(X;Y) = sum_xy p(xy) ln(p(xy)/(p(x)p(y))) in nats, one row
    per audited pair. Near-zero MI: independent columns; MI near the
    marginal entropy: one column determines the other (drop it).

    Determinism: the per-cell log-ratio is quantized to integer
    micro-nats once (its inputs are exact integer counts), weighted by
    the exact cell count, and summed as int64 — order-free; the final
    division by N is one IEEE op.

    Scale: per pair, one map-side-combined joint-count aggregate over
    the fact; marginals derive from the joint table (already tiny) and
    the scalar total rides a 1-row broadcast, so the corpus is scanned
    once per pair and shuffled only on the (x, y) group key."""
    frames = []
    for label, table, xc, yc in _MI_PAIRS:
        t = read_table(spark, sf_dir, table)
        j = (
            t.groupBy(F.col(xc).alias("x"), F.col(yc).alias("y"))
            .agg(F.count(F.lit(1)).alias("n_xy"))
            .transform(cut_lazy)
        )
        mx = j.groupBy("x").agg(F.sum("n_xy").alias("n_x"))
        my = j.groupBy("y").agg(F.sum("n_xy").alias("n_y"))
        tot = j.agg(F.sum("n_xy").alias("n"))
        cells = (
            j.join(F.broadcast(mx), "x")
            .join(F.broadcast(my), "y")
            .crossJoin(F.broadcast(tot))
            .select(
                "n_xy",
                F.floor(
                    F.log(
                        F.col("n_xy").cast("double")
                        * F.col("n")
                        / (F.col("n_x") * F.col("n_y"))
                    )
                    * 1000000
                    + 0.5
                )
                .cast("long")
                .alias("wq"),
            )
        )
        agg = cells.agg(
            F.sum("n_xy").alias("n_rows"),
            F.sum(F.col("n_xy") * F.col("wq")).alias("mi_micro_sum"),
        )
        frames.append(
            agg.select(
                F.lit(label).alias("pair"),
                F.col("n_rows"),
                (
                    F.floor(
                        F.col("mi_micro_sum").cast("double") / F.col("n_rows") + 0.5
                    )
                    / 1000000
                ).alias("mi_nats"),
            )
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out


# --- purged time-series cross-validation folds --------------------------------------

_CV_K = 5
_CV_EMBARGO_DAYS = 3

_CV_ORACLE = f"""
WITH span AS (
  SELECT cast(min(ts) AS date) AS d0,
         date_diff('day', cast(min(ts) AS date), cast(max(ts) AS date)) + 1
           AS n_days
  FROM events
),
ev AS (
  SELECT date_diff('day', s.d0, cast(e.ts AS date)) AS day_idx, s.n_days
  FROM events e, span s
),
folds AS (
  SELECT f, n_days,
         (n_days * f) // {_CV_K} AS fstart,
         (n_days * (f + 1)) // {_CV_K} AS fend
  FROM (SELECT unnest(generate_series(0, {_CV_K - 1})) AS f), span
)
SELECT cast(folds.f AS integer) AS fold,
       cast(folds.fstart AS bigint) AS fold_start_day,
       cast(folds.fend AS bigint) AS fold_end_day,
       cast(sum(CASE WHEN ev.day_idx >= folds.fstart AND ev.day_idx < folds.fend
                     THEN 1 ELSE 0 END) AS bigint) AS test_n,
       cast(sum(CASE WHEN NOT (ev.day_idx >= folds.fstart AND ev.day_idx < folds.fend)
                      AND ev.day_idx >= folds.fstart - {_CV_EMBARGO_DAYS}
                      AND ev.day_idx <  folds.fend + {_CV_EMBARGO_DAYS}
                     THEN 1 ELSE 0 END) AS bigint) AS embargo_n,
       cast(sum(CASE WHEN ev.day_idx < folds.fstart - {_CV_EMBARGO_DAYS}
                       OR ev.day_idx >= folds.fend + {_CV_EMBARGO_DAYS}
                     THEN 1 ELSE 0 END) AS bigint) AS train_n
FROM ev JOIN folds ON ev.n_days = folds.n_days
GROUP BY 1, 2, 3
"""


@register(
    "purged_timeseries_folds",
    oracle=_CV_ORACLE,
    tags=("extension", "training", "cv"),
)
def purged_timeseries_folds(spark, sf_dir):
    """Purged K-fold time-series cross-validation accounting (the
    Lopez de Prado scheme): the event span splits into {k} contiguous
    day-range folds; per fold, the test count, the embargoed count
    (within {e} days of the fold boundary — excluded from training to
    stop look-ahead leakage through serially-correlated labels), and
    the clean training count. All boundaries are exact integer day
    arithmetic derived from min/max(ts) inside the plan.

    Scale: events reduce to integer day indices in-row; the {k}-row fold
    spine is BROADCAST onto the stream (linear x{k}); one final
    aggregate. No windows, no collect."""
    ev = read_table(spark, sf_dir, "events").select(F.to_date("ts").alias("d"))
    span = ev.agg(
        F.min("d").alias("d0"),
        (F.datediff(F.max("d"), F.min("d")) + 1).cast("long").alias("n_days"),
    )
    e = ev.crossJoin(F.broadcast(span)).select(
        F.datediff(F.col("d"), F.col("d0")).cast("long").alias("day_idx"),
        "n_days",
    )
    folds = (
        spark.range(_CV_K)
        .select(F.col("id").cast("int").alias("f"))
        .crossJoin(F.broadcast(span))
        .select(
            "f",
            "n_days",
            F.floor(F.col("n_days") * F.col("f") / _CV_K).cast("long").alias("fstart"),
            F.floor(F.col("n_days") * (F.col("f") + 1) / _CV_K)
            .cast("long")
            .alias("fend"),
        )
    )
    j = e.join(F.broadcast(folds), "n_days")
    in_fold = (F.col("day_idx") >= F.col("fstart")) & (
        F.col("day_idx") < F.col("fend")
    )
    in_embargo = (
        ~in_fold
        & (F.col("day_idx") >= F.col("fstart") - _CV_EMBARGO_DAYS)
        & (F.col("day_idx") < F.col("fend") + _CV_EMBARGO_DAYS)
    )
    in_train = (F.col("day_idx") < F.col("fstart") - _CV_EMBARGO_DAYS) | (
        F.col("day_idx") >= F.col("fend") + _CV_EMBARGO_DAYS
    )
    return j.groupBy(
        F.col("f").alias("fold"),
        F.col("fstart").alias("fold_start_day"),
        F.col("fend").alias("fold_end_day"),
    ).agg(
        count_if(in_fold).cast("long").alias("test_n"),
        count_if(in_embargo).cast("long").alias("embargo_n"),
        count_if(in_train).cast("long").alias("train_n"),
    )


# --- popularity-based negative sampling ---------------------------------------------

_NEG_TOP_PARTS = 20

_NEG_ORACLE = f"""
WITH pop AS (
  SELECT l_partkey AS partkey, cast(count(*) AS bigint) AS n_lines
  FROM lineitem GROUP BY 1
  ORDER BY n_lines DESC, partkey LIMIT {_NEG_TOP_PARTS}
),
purch AS (
  SELECT DISTINCT o.o_custkey AS custkey, l.l_partkey AS partkey
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE l.l_partkey IN (SELECT partkey FROM pop)
),
buyers AS (SELECT DISTINCT o_custkey AS custkey FROM orders)
SELECT b.custkey, p.partkey, p.n_lines AS part_popularity
FROM buyers b
CROSS JOIN pop p
ANTI JOIN purch ON purch.custkey = b.custkey AND purch.partkey = p.partkey
"""


@register(
    "negative_sampling_popularity",
    oracle=_NEG_ORACLE,
    tags=("extension", "training", "recsys"),
)
def negative_sampling_popularity(spark, sf_dir):
    """Popularity-based negative sampling for recommender training data:
    for every customer who has ordered, the top-{n} most-purchased parts
    they have NEVER bought — the standard hard-ish negatives (popular
    items the user ignored carry more signal than uniform negatives).
    Fully deterministic: the popularity cut is tie-broken by partkey and
    the output is the complete candidate set, not a random draw.

    Scale: the popularity top-{n} localCheckpoints (one lineitem
    aggregate) and BROADCASTS both into the purchase-pair filter and the
    customer cross join (x{n} linear amplification); the anti-join
    shuffles on (custkey, partkey) — the output key. Never an
    item-catalog cross join.""".format(n=_NEG_TOP_PARTS)
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    pop = (
        l.groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.count(F.lit(1)).alias("n_lines"))
        .orderBy(F.desc("n_lines"), F.asc("partkey"))
        .limit(_NEG_TOP_PARTS)
        .transform(cut_eager)
    )
    purch = (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .join(F.broadcast(pop), l["l_partkey"] == pop["partkey"], "left_semi")
        .select(F.col("o_custkey").alias("custkey"), F.col("l_partkey").alias("partkey"))
        .distinct()
    )
    buyers = o.select(F.col("o_custkey").alias("custkey")).distinct()
    cand = buyers.crossJoin(F.broadcast(pop)).select(
        "custkey", "partkey", F.col("n_lines").alias("part_popularity")
    )
    return cand.join(purch, ["custkey", "partkey"], "left_anti")


# --- spatial radius join via grid-cell bucketing ------------------------------------

_GEO_SPAN = 1_000_000  # synthetic planar world, meters
_GEO_RADIUS = 10_000   # pair radius, meters == cell size

_GEO_PT_SQL = f"""
  SELECT c_custkey AS key,
         cast({token_hash_sql("'x|' || cast(c_custkey AS varchar)")}
              % {_GEO_SPAN} AS bigint) AS x,
         cast({token_hash_sql("'y|' || cast(c_custkey AS varchar)")}
              % {_GEO_SPAN} AS bigint) AS y
  FROM customer
"""

_GEO_ORACLE = f"""
WITH pts AS ({_GEO_PT_SQL}),
probe AS (
  SELECT p.key, p.x, p.y,
         p.x // {_GEO_RADIUS} + dx.v AS cx,
         p.y // {_GEO_RADIUS} + dy.v AS cy
  FROM pts p,
       (VALUES (-1), (0), (1)) dx(v),
       (VALUES (-1), (0), (1)) dy(v)
),
home AS (
  SELECT key, x, y, x // {_GEO_RADIUS} AS cx, y // {_GEO_RADIUS} AS cy
  FROM pts
)
SELECT a.key AS custkey_a, b.key AS custkey_b,
       floor(sqrt(cast((a.x - b.x) * (a.x - b.x)
                       + (a.y - b.y) * (a.y - b.y) AS double)) * 1000 + 0.5)
         / 1000 AS dist_m
FROM probe a JOIN home b ON a.cx = b.cx AND a.cy = b.cy
WHERE a.key < b.key
  AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
      <= {_GEO_RADIUS} * {_GEO_RADIUS}
"""


@register(
    "spatial_radius_pairs",
    oracle=_GEO_ORACLE,
    tags=("extension", "spatial", "join"),
)
def spatial_radius_pairs(spark, sf_dir):
    """Spatial radius self-join via grid-cell bucketing — the geohash /
    space-filling-curve pattern that replaces the O(n^2) "all points
    within r of each other" nested loop: bucket the plane into r-sized
    cells, replicate each PROBE point into its 3x3 cell neighborhood,
    equi-join against build points in their home cell (each candidate
    pair meets exactly once: b lives in one home cell, a's replicas hit
    it once), and refilter on the exact squared distance. Coordinates
    are hash-derived planar integers, so the only float op is one
    correctly-rounded sqrt for the reported distance — the filter itself
    is pure int64.

    Scale: replication is a constant 9x of the point set (not data^2);
    the join shuffles on the cell key; skewed cells (urban hot spots)
    would salt the cell key exactly like salted_user_event_stats."""
    pts = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"),
        (token_hash(F.concat_ws("|", F.lit("x"), F.col("c_custkey"))) % _GEO_SPAN)
        .alias("x"),
        (token_hash(F.concat_ws("|", F.lit("y"), F.col("c_custkey"))) % _GEO_SPAN)
        .alias("y"),
    )
    off = spark.range(-1, 2).select(F.col("id").cast("long").alias("v"))
    probe = (
        pts.crossJoin(F.broadcast(off.select(F.col("v").alias("dxv"))))
        .crossJoin(F.broadcast(off.select(F.col("v").alias("dyv"))))
        .select(
            "key",
            "x",
            "y",
            (F.floor(F.col("x") / _GEO_RADIUS) + F.col("dxv")).alias("cx"),
            (F.floor(F.col("y") / _GEO_RADIUS) + F.col("dyv")).alias("cy"),
        )
    )
    home = pts.select(
        F.col("key").alias("bkey"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.floor(F.col("x") / _GEO_RADIUS).alias("cx"),
        F.floor(F.col("y") / _GEO_RADIUS).alias("cy"),
    )
    d2 = (F.col("x") - F.col("bx")) * (F.col("x") - F.col("bx")) + (
        F.col("y") - F.col("by")
    ) * (F.col("y") - F.col("by"))
    return (
        probe.join(home, ["cx", "cy"])
        .where((F.col("key") < F.col("bkey")) & (d2 <= _GEO_RADIUS * _GEO_RADIUS))
        .select(
            F.col("key").alias("custkey_a"),
            F.col("bkey").alias("custkey_b"),
            (F.floor(F.sqrt(d2.cast("double")) * 1000 + 0.5) / 1000).alias("dist_m"),
        )
    )


_GEO_D2 = "(a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)"

_GEO_STATS_ORACLE = f"""
WITH pts AS ({_GEO_PT_SQL}),
probe AS (
  SELECT p.key, p.x, p.y,
         p.x // {_GEO_RADIUS} + dx.v AS cx,
         p.y // {_GEO_RADIUS} + dy.v AS cy
  FROM pts p,
       (VALUES (-1), (0), (1)) dx(v),
       (VALUES (-1), (0), (1)) dy(v)
),
home AS (
  SELECT key, x, y, x // {_GEO_RADIUS} AS cx, y // {_GEO_RADIUS} AS cy
  FROM pts
),
pairs AS (
  SELECT b.cx AS cx, b.cy AS cy, {_GEO_D2} AS d2,
         a.key AS ka, b.key AS kb
  FROM probe a JOIN home b ON a.cx = b.cx AND a.cy = b.cy
  WHERE a.key < b.key
    AND {_GEO_D2} <= {_GEO_RADIUS} * {_GEO_RADIUS}
),
agg AS (
  SELECT cx, cy, cast(count(*) AS bigint) AS n_pairs,
         cast(min(d2) AS bigint) AS min_d2,
         cast(max(d2) AS bigint) AS max_d2
  FROM pairs GROUP BY cx, cy
),
near AS (
  SELECT cx, cy, ka, kb,
         row_number() OVER (PARTITION BY cx, cy
                            ORDER BY d2, ka, kb) AS rn
  FROM pairs
)
SELECT agg.cx AS cell_x, agg.cy AS cell_y, agg.n_pairs,
       floor(sqrt(cast(agg.min_d2 AS double)) * 1000 + 0.5) / 1000
         AS min_dist_m,
       floor(sqrt(cast(agg.max_d2 AS double)) * 1000 + 0.5) / 1000
         AS max_dist_m,
       near.ka AS nearest_a, near.kb AS nearest_b
FROM agg JOIN near ON agg.cx = near.cx AND agg.cy = near.cy
WHERE near.rn = 1
"""


@register(
    "spatial_radius_stats",
    oracle=_GEO_STATS_ORACLE,
    tags=("extension", "spatial", "join", "agg"),
)
def spatial_radius_stats(spark, sf_dir):
    """Bounded-output twin of :func:`spatial_radius_pairs` — the form a
    100 TB user actually runs (round-14 verdict item 1). The
    pair-materializing query's OUTPUT grows quadratically with point
    density at fixed area (sf10 measured 350M pairs, 437x wall for
    100x rows — linear in its own output, but the output itself is the
    product); this twin runs the identical grid-bucketed generator and
    collapses the pair stream per HOME CELL into (pair count, min/max
    distance, deterministic nearest pair), so the result is bounded by
    the number of occupied r-sized cells — a property of the AREA, not
    the density. Each within-radius pair lands in exactly one group:
    the higher-key point's home cell (the key < bkey orientation of
    the one probe/home meeting).

    All aggregation state is exact int64 (squared distances, keys);
    the nearest pair is the lexicographic min of (d2, key_a, key_b) so
    ties break identically in both engines; the only float op is the
    final correctly-rounded sqrt on the already-aggregated bounds.

    Scale: the pairs never materialize — partial (map-side) aggregation
    collapses them into <= occupied-cell-count rows per task before the
    single groupBy shuffle, so the shuffle volume is O(cells), not
    O(pairs). The pair-materializing form stays registered as the
    correctness gate for the generator itself."""
    pts = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"),
        (token_hash(F.concat_ws("|", F.lit("x"), F.col("c_custkey"))) % _GEO_SPAN)
        .alias("x"),
        (token_hash(F.concat_ws("|", F.lit("y"), F.col("c_custkey"))) % _GEO_SPAN)
        .alias("y"),
    )
    off = spark.range(-1, 2).select(F.col("id").cast("long").alias("v"))
    probe = (
        pts.crossJoin(F.broadcast(off.select(F.col("v").alias("dxv"))))
        .crossJoin(F.broadcast(off.select(F.col("v").alias("dyv"))))
        .select(
            "key",
            "x",
            "y",
            (F.floor(F.col("x") / _GEO_RADIUS) + F.col("dxv")).alias("cx"),
            (F.floor(F.col("y") / _GEO_RADIUS) + F.col("dyv")).alias("cy"),
        )
    )
    home = pts.select(
        F.col("key").alias("bkey"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.floor(F.col("x") / _GEO_RADIUS).alias("cx"),
        F.floor(F.col("y") / _GEO_RADIUS).alias("cy"),
    )
    d2 = (F.col("x") - F.col("bx")) * (F.col("x") - F.col("bx")) + (
        F.col("y") - F.col("by")
    ) * (F.col("y") - F.col("by"))
    pairs = (
        probe.join(home, ["cx", "cy"])
        .where((F.col("key") < F.col("bkey")) & (d2 <= _GEO_RADIUS * _GEO_RADIUS))
        .select(
            F.col("cx"),
            F.col("cy"),
            d2.alias("d2"),
            F.col("key").alias("ka"),
            F.col("bkey").alias("kb"),
        )
    )
    dist = lambda c: F.floor(F.sqrt(c.cast("double")) * 1000 + 0.5) / 1000  # noqa: E731
    return (
        pairs.groupBy("cx", "cy")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min("d2").alias("min_d2"),
            F.max("d2").alias("max_d2"),
            F.min(F.struct("d2", "ka", "kb")).alias("nearest"),
        )
        .select(
            F.col("cx").alias("cell_x"),
            F.col("cy").alias("cell_y"),
            "n_pairs",
            dist(F.col("min_d2")).alias("min_dist_m"),
            dist(F.col("max_d2")).alias("max_dist_m"),
            F.col("nearest.ka").alias("nearest_a"),
            F.col("nearest.kb").alias("nearest_b"),
        )
    )


# --- embedding covariance (PCA prep) ------------------------------------------------

_COV_DIM = 64
_COV_SCALE = 10_000  # quantization: q = floor(v * 1e4 + 0.5)

_COV_ORACLE = f"""
WITH q AS (
  SELECT list_transform(embedding,
           v -> cast(floor(cast(v AS double) * {_COV_SCALE} + 0.5) AS bigint))
         AS q
  FROM embeddings
),
idx AS (SELECT unnest(generate_series(0, {_COV_DIM - 1})) AS i),
cells AS (
  SELECT a.i AS i, b.i AS j, q.q[a.i + 1] * q.q[b.i + 1] AS p
  FROM q, idx a, idx b
  WHERE b.i >= a.i
),
m2 AS (SELECT i, j, cast(sum(p) AS bigint) AS s_ij FROM cells GROUP BY i, j),
m1 AS (
  SELECT a.i AS i, cast(sum(q.q[a.i + 1]) AS bigint) AS s_i
  FROM q, idx a GROUP BY 1
),
nn AS (SELECT cast(count(*) AS bigint) AS n FROM q)
SELECT cast(m2.i AS integer) AS i, cast(m2.j AS integer) AS j,
       floor(cast(m2.s_ij * nn.n - a.s_i * b.s_i AS double)
             / (nn.n * nn.n) / {_COV_SCALE * _COV_SCALE}.0
             * 1000000000 + 0.5) / 1000000000 AS cov
FROM m2 JOIN m1 a ON m2.i = a.i JOIN m1 b ON m2.j = b.i CROSS JOIN nn
"""


@register(
    "embedding_covariance",
    oracle=_COV_ORACLE,
    tags=("extension", "embeddings", "ml"),
)
def embedding_covariance(spark, sf_dir):
    """Upper-triangle covariance matrix of the embedding columns — the
    PCA / whitening / Mahalanobis prep primitive: cov_ij =
    E[x_i x_j] - E[x_i] E[x_j], computed from integer-quantized first and
    second moments so every cross-row sum is exact int64 and the final
    covariance is a fixed IEEE expression over exact integers (identical
    in both engines). Quantization 1e-4 per coordinate bounds the sums
    inside int64 up to ~1e11 rows; past that, shard and merge moments.

    Scale: per-partition moment ACCUMULATION, not per-row cell explosion —
    an Arrow-batched kernel computes each batch's exact int64 Gram matrix
    X^T X (numpy integer matmul, no floats), its column sums, and its row
    count, then emits one keyed partial row per cell. The only shuffle is
    the groupBy merging ~(partitions x {t}) partial rows — independent of
    row count — versus the explode formulation's rows x {t} struct
    stream. Integer addition is associative/commutative, so the merged
    moments are bit-identical under any partitioning (partition-count
    invariance is test-pinned). This is the classic distributed
    moment-accumulation plan; at ~1e11+ rows the int64 headroom runs out
    and the partials shard further.""".format(
        t=_COV_DIM * (_COV_DIM + 1) // 2
    )
    from collections.abc import Iterator

    e = read_table(spark, sf_dir, "embeddings")
    q = F.transform(
        F.col("embedding"),
        lambda v: F.floor(v.cast("double") * _COV_SCALE + 0.5).cast("long"),
    )
    rows = e.select(q.alias("q"))

    def moment_kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        iu, ju = np.triu_indices(_COV_DIM)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack([np.asarray(r, dtype=np.int64) for r in pdf["q"]])
            g = x.T @ x  # exact: int64 matmul, no float path
            out = pd.DataFrame(
                {
                    "i": np.concatenate(
                        [iu, np.arange(_COV_DIM), [-1]]
                    ).astype(np.int32),
                    "j": np.concatenate(
                        [ju, np.full(_COV_DIM, -1), [-1]]
                    ).astype(np.int32),
                    "s": np.concatenate(
                        [g[iu, ju], x.sum(axis=0, dtype=np.int64), [len(x)]]
                    ),
                }
            )
            yield out

    partials = (
        rows.mapInPandas(moment_kernel, "i int, j int, s long")
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
        .transform(cut_lazy)
    )
    m2 = partials.where(F.col("j") >= 0).select("i", "j", F.col("s").alias("s_ij"))
    m1 = partials.where((F.col("j") == -1) & (F.col("i") >= 0)).select(
        "i", F.col("s").alias("s_i")
    )
    nn = partials.where(F.col("i") == -1).select(F.col("s").alias("n"))
    a = m1.select(F.col("i").alias("ai"), F.col("s_i").alias("sa"))
    b = m1.select(F.col("i").alias("bi"), F.col("s_i").alias("sb"))
    num = (F.col("s_ij") * F.col("n") - F.col("sa") * F.col("sb")).cast("double")
    return (
        m2.join(F.broadcast(a), m2["i"] == a["ai"])
        .join(F.broadcast(b), m2["j"] == b["bi"])
        .crossJoin(F.broadcast(nn))
        .select(
            "i",
            "j",
            (
                F.floor(
                    num
                    / (F.col("n") * F.col("n"))
                    / float(_COV_SCALE * _COV_SCALE)
                    * 1000000000
                    + 0.5
                )
                / 1000000000
            ).alias("cov"),
        )
    )


# --- AUC via binned rank statistic --------------------------------------------------

_AUC_BINS = 1024

_AUC_ORACLE = f"""
WITH scored AS (
  SELECT n_chars AS s, (lang = 'en') AS pos FROM documents
),
rng AS (
  SELECT cast(min(s) AS bigint) AS lo, cast(max(s) AS bigint) AS hi FROM scored
),
b AS (
  SELECT cast((s - lo) * {_AUC_BINS} / (hi - lo + 1) AS bigint) AS bin, pos
  FROM scored, rng
),
h AS (
  SELECT bin,
         cast(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS bigint) AS n_pos,
         cast(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS bigint) AS n_neg
  FROM b GROUP BY bin
),
pairs AS (
  SELECT cast(sum(CASE WHEN p.bin > n.bin THEN p.n_pos * n.n_neg ELSE 0 END)
              AS bigint) AS gt,
         cast(sum(CASE WHEN p.bin = n.bin THEN p.n_pos * n.n_neg ELSE 0 END)
              AS bigint) AS eq
  FROM h p, h n
),
tot AS (
  SELECT cast(sum(n_pos) AS bigint) AS np, cast(sum(n_neg) AS bigint) AS nn FROM h
)
SELECT np AS n_pos, nn AS n_neg,
       floor(cast(2 * gt + eq AS double) / (2.0 * np * nn) * 1000000 + 0.5)
         / 1000000 AS auc
FROM pairs, tot
"""


@register(
    "auc_binned_report",
    oracle=_AUC_ORACLE,
    tags=("extension", "training", "eval"),
)
def auc_binned_report(spark, sf_dir):
    """ROC AUC of a score against a binary label via the binned
    Mann-Whitney rank statistic — the classifier-eval primitive:
    AUC = P(score_pos > score_neg) + 0.5 P(tie), with ties resolved at
    bin granularity ({b} equi-width bins over the observed range). The
    demo scores n_chars against lang='en'; any (score, label) pair
    plugs into the same plan.

    Exactness: bin ids, histogram counts, and the pair sums
    (2*gt + eq over bin-product terms) are all int64; AUC is one final
    IEEE division, half-up rounded — identical in both engines.

    Scale: ONE corpus aggregate builds the {b}-bin histogram
    (map-side combined); the pairwise term is a {b}x{b} broadcast
    self-join of the histogram — constant work independent of corpus
    size. The exact-rank AUC would need a global sort; binning is the
    standard large-scale substitute, and the bin count bounds the tie
    error.""".format(b=_AUC_BINS)
    d = read_table(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("s"), (F.col("lang") == "en").alias("pos")
    )
    rng = d.agg(F.min("s").alias("lo"), F.max("s").alias("hi"))
    b = d.crossJoin(F.broadcast(rng)).select(
        ((F.col("s") - F.col("lo")) * _AUC_BINS / (F.col("hi") - F.col("lo") + 1))
        .cast("long")
        .alias("bin"),
        "pos",
    )
    h = (
        b.groupBy("bin")
        .agg(
            count_if(F.col("pos")).alias("n_pos"),
            count_if(~F.col("pos")).alias("n_neg"),
        )
        .transform(cut_lazy)
    )
    p = h.select(F.col("bin").alias("pb"), F.col("n_pos").alias("np_b"))
    n = h.select(F.col("bin").alias("nb"), F.col("n_neg").alias("nn_b"))
    pairs = (
        p.crossJoin(F.broadcast(n))
        .agg(
            F.sum(
                F.when(F.col("pb") > F.col("nb"), F.col("np_b") * F.col("nn_b"))
                .otherwise(0)
            ).alias("gt"),
            F.sum(
                F.when(F.col("pb") == F.col("nb"), F.col("np_b") * F.col("nn_b"))
                .otherwise(0)
            ).alias("eq"),
        )
    )
    tot = h.agg(F.sum("n_pos").alias("np"), F.sum("n_neg").alias("nn"))
    return (
        pairs.crossJoin(F.broadcast(tot))
        .select(
            F.col("np").alias("n_pos"),
            F.col("nn").alias("n_neg"),
            (
                F.floor(
                    (2 * F.col("gt") + F.col("eq")).cast("double")
                    / (2.0 * F.col("np") * F.col("nn"))
                    * 1000000
                    + 0.5
                )
                / 1000000
            ).alias("auc"),
        )
    )


# --- deterministic token-dropout augmentation ---------------------------------------

_AUG_DROP_MOD = 10  # drop ~1/10 of token positions
_AUG_CK_MOD = 1 << 40

_AUG_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_TOK_SQL} AS toks FROM documents
),
kept AS (
  SELECT doc_id, len(toks) AS n_tokens,
         list_filter(
           list_transform(generate_series(1, len(toks)),
                          i -> CASE WHEN {token_hash_sql(
                              "toks[i] || '|' || cast(doc_id AS varchar)"
                              " || '|' || cast(i AS varchar)")}
                                    % {_AUG_DROP_MOD} <> 0
                               THEN toks[i] END),
           x -> x IS NOT NULL) AS kt
  FROM t
)
SELECT doc_id,
       cast(n_tokens AS bigint) AS n_tokens,
       cast(len(kt) AS bigint) AS n_kept,
       CASE WHEN n_tokens > 0 THEN
         floor(cast(len(kt) AS double) / n_tokens * 1000000 + 0.5) / 1000000
       END AS kept_frac,
       cast({token_hash_sql("array_to_string(kt, ' ')")} % {_AUG_CK_MOD}
            AS bigint) AS aug_checksum
FROM kept
"""


@register(
    "augment_token_dropout",
    oracle=_AUG_ORACLE,
    tags=("extension", "corpus", "augmentation"),
)
def augment_token_dropout(spark, sf_dir):
    """Deterministic token-dropout augmentation (the reproducible form of
    the random word-dropout regularizer): each token POSITION drops when
    hash(token | doc | position) lands in 1/{m} of the space — position-
    dependent, so repeated tokens drop independently, and re-running the
    pipeline regenerates the identical augmented corpus (the property
    random dropout can't give a resumable 100 TB job). Output: per doc,
    original/kept token counts, kept fraction, and a checksum of the
    augmented text (mod 2^40) so downstream shards can verify the
    augmentation without re-reading it.

    Scale: entirely in-row (transform/filter over the token array — no
    explode, no shuffle beyond the scan) — augmentation runs inline with
    the corpus read, the map-only shape a 100 TB rewrite needs.
    """.format(m=_AUG_DROP_MOD)
    d = widen(read_table(spark, sf_dir, "documents"))
    toks = _toks()
    e = d.select("doc_id", toks.alias("toks"))
    keep = lambda tok, i: (  # noqa: E731
        token_hash(
            F.concat(
                tok, F.lit("|"), F.col("doc_id").cast("string"), F.lit("|"),
                i.cast("string"),
            )
        )
        % _AUG_DROP_MOD
        != 0
    )
    # guard: F.sequence(1, 0) DESCENDS on an empty array and element_at(_, 0)
    # throws -- gate the whole transform on size > 0
    kt = F.when(
        F.size("toks") > 0,
        F.filter(
            F.transform(
                F.sequence(F.lit(1), F.size("toks")),
                lambda i: F.when(keep(F.element_at(F.col("toks"), i), i),
                                 F.element_at(F.col("toks"), i)),
            ),
            lambda x: x.isNotNull(),
        ),
    ).otherwise(F.array().cast("array<string>"))
    out = e.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        kt.alias("kt"),
    )
    return out.select(
        "doc_id",
        "n_tokens",
        F.size("kt").cast("long").alias("n_kept"),
        F.when(
            F.col("n_tokens") > 0,
            round_half_up(F.size("kt").cast("double") / F.col("n_tokens"), 6),
        ).alias("kept_frac"),
        (token_hash(F.concat_ws(" ", F.col("kt"))) % _AUG_CK_MOD).alias(
            "aug_checksum"
        ),
    )


# --- chi-square independence + Cramer's V -------------------------------------------


def _chi2_pair_sql(label: str, table: str, xc: str, yc: str) -> str:
    return f"""
SELECT '{label}' AS pair, n_rows,
       cast(r_cats AS bigint) AS r_cats, cast(c_cats AS bigint) AS c_cats,
       floor(cast(chi2_micro AS double) / 1000000 * 10000 + 0.5) / 10000 AS chi2,
       floor(sqrt(cast(chi2_micro AS double) / 1000000
                  / (n_rows * least(r_cats - 1, c_cats - 1)))
             * 1000000 + 0.5) / 1000000 AS cramers_v
FROM (
  SELECT cast(sum(n_xy) AS bigint) AS n_rows,
         cast(sum(cast(floor(
           cast(d AS double) * d / (t.n * mx.n_x * my.n_y) * 1000000 + 0.5)
           AS bigint))
              + max(t.n) * 1000000
              - sum(cast(floor(cast(mx.n_x AS double) * my.n_y / t.n * 1000000
                               + 0.5) AS bigint))
              AS bigint) AS chi2_micro,
         max(t.r_cats) AS r_cats, max(t.c_cats) AS c_cats
  FROM (
    SELECT j.n_xy, j.n_xy * t0.n - mx0.n_x * my0.n_y AS d,
           mx0.x AS x, my0.y AS y
    FROM (SELECT {xc} AS x, {yc} AS y, cast(count(*) AS bigint) AS n_xy
          FROM {table} GROUP BY 1, 2) j
    JOIN (SELECT {xc} AS x, cast(count(*) AS bigint) AS n_x
          FROM {table} GROUP BY 1) mx0 ON j.x = mx0.x
    JOIN (SELECT {yc} AS y, cast(count(*) AS bigint) AS n_y
          FROM {table} GROUP BY 1) my0 ON j.y = my0.y
    CROSS JOIN (SELECT cast(count(*) AS bigint) AS n FROM {table}) t0
  ) cells
  JOIN (SELECT {xc} AS x, cast(count(*) AS bigint) AS n_x
        FROM {table} GROUP BY 1) mx ON cells.x = mx.x
  JOIN (SELECT {yc} AS y, cast(count(*) AS bigint) AS n_y
        FROM {table} GROUP BY 1) my ON cells.y = my.y
  CROSS JOIN (SELECT cast(count(*) AS bigint) AS n,
                     cast(count(DISTINCT {xc}) AS bigint) AS r_cats,
                     cast(count(DISTINCT {yc}) AS bigint) AS c_cats
              FROM {table}) t
)"""


_CHI2_ORACLE = "\nUNION ALL\n".join(_chi2_pair_sql(*p) for p in _MI_PAIRS)


@register(
    "chi2_independence_report",
    oracle=_CHI2_ORACLE,
    tags=("extension", "features", "selection"),
)
def chi2_independence_report(spark, sf_dir):
    """Pearson chi-square independence statistic + Cramer's V for the same
    categorical pairs the MI screen audits — the frequentist companion:
    chi2 sums (observed - expected)^2 / expected over the contingency
    table (expected = n_x * n_y / n), and V = sqrt(chi2 / (n * min(r-1,
    c-1))) normalizes it to [0, 1] for cross-pair comparison. Zero cells
    are accounted WITHOUT materializing them: an unobserved (x, y)
    contributes exactly its expectation e, and sum_all(e) = n, so their
    total is n - sum_observed(e).

    Determinism: the per-cell deviation d = o*n - n_x*n_y is exact
    int64; each cell's term quantizes to micro units from one fixed
    IEEE expression over exact ints, so the cross-cell sum is
    order-free; V adds one correctly-rounded sqrt.

    Scale: identical shape to mutual_information_report — one
    joint-count aggregate per pair, marginals from the joint table,
    scalar totals broadcast."""
    frames = []
    for label, table, xc, yc in _MI_PAIRS:
        t = read_table(spark, sf_dir, table)
        j = (
            t.groupBy(F.col(xc).alias("x"), F.col(yc).alias("y"))
            .agg(F.count(F.lit(1)).alias("n_xy"))
            .transform(cut_lazy)
        )
        mx = j.groupBy("x").agg(F.sum("n_xy").alias("n_x"))
        my = j.groupBy("y").agg(F.sum("n_xy").alias("n_y"))
        tot = j.agg(
            F.sum("n_xy").alias("n"),
            F.countDistinct("x").alias("r_cats"),
            F.countDistinct("y").alias("c_cats"),
        )
        d = F.col("n_xy") * F.col("n") - F.col("n_x") * F.col("n_y")
        term_micro = F.floor(
            d.cast("double")
            * d
            / (F.col("n") * F.col("n_x") * F.col("n_y"))
            * 1000000
            + 0.5
        ).cast("long")
        e_micro = F.floor(
            F.col("n_x").cast("double") * F.col("n_y") / F.col("n") * 1000000 + 0.5
        ).cast("long")
        agg = (
            j.join(F.broadcast(mx), "x")
            .join(F.broadcast(my), "y")
            .crossJoin(F.broadcast(tot))
            .agg(
                F.sum("n_xy").alias("n_rows"),
                # observed-cell terms + the zero-cell mass: an unobserved
                # (x, y) contributes exactly its expectation e, and
                # sum_all(e) = n, so the zero-cell total is
                # n - sum_observed(e)
                (
                    F.sum(term_micro)
                    + F.max("n") * 1000000
                    - F.sum(e_micro)
                ).alias("chi2_micro"),
                F.max("r_cats").alias("r_cats"),
                F.max("c_cats").alias("c_cats"),
            )
        )
        chi2 = F.col("chi2_micro").cast("double") / 1000000
        frames.append(
            agg.select(
                F.lit(label).alias("pair"),
                F.col("n_rows"),
                F.col("r_cats").cast("long").alias("r_cats"),
                F.col("c_cats").cast("long").alias("c_cats"),
                (F.floor(chi2 * 10000 + 0.5) / 10000).alias("chi2"),
                (
                    F.floor(
                        F.sqrt(
                            chi2
                            / (
                                F.col("n_rows")
                                * F.least(F.col("r_cats") - 1, F.col("c_cats") - 1)
                            )
                        )
                        * 1000000
                        + 0.5
                    )
                    / 1000000
                ).alias("cramers_v"),
            )
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out


# --- Benjamini-Hochberg FDR stability screen ----------------------------------------

_FDR_ALPHA = 0.05
_FDR_M = 5  # event types
_FDR_CUTOFF = "2024-01-16 00:00:00"


def _z_crit(p_two_sided: float) -> float:
    """Inverse normal for a two-sided tail probability, via bisection on
    math.erf — computed ONCE at import; the engines only ever compare
    against these embedded constants (no runtime Phi anywhere)."""
    lo, hi = 0.0, 40.0
    target = 1.0 - p_two_sided / 2.0  # Phi(z) target
    for _ in range(200):
        mid = (lo + hi) / 2.0
        if 0.5 * (1.0 + math.erf(mid / math.sqrt(2.0))) < target:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2.0


#: BH critical |z| per rank i (1-based, most significant first): reject
#: rank i when |z|_(i) >= crit of p = i * alpha / m.
_FDR_CRITS = [round(_z_crit(i * _FDR_ALPHA / _FDR_M), 6) for i in range(1, _FDR_M + 1)]
_BONF_CRIT = round(_z_crit(_FDR_ALPHA / _FDR_M), 6)

_FDR_ORACLE = f"""
WITH s AS (
  SELECT event_type,
         ts < timestamp '{_FDR_CUTOFF}' AS h1,
         cast(floor(value * 100 + 0.5) AS bigint) AS cents
  FROM events
),
m AS (
  SELECT event_type,
         cast(sum(CASE WHEN h1 THEN 1 ELSE 0 END) AS bigint) AS n1,
         cast(sum(CASE WHEN h1 THEN cents ELSE 0 END) AS bigint) AS s1,
         cast(sum(CASE WHEN h1 THEN cents * cents ELSE 0 END) AS bigint) AS q1,
         cast(sum(CASE WHEN h1 THEN 0 ELSE 1 END) AS bigint) AS n2,
         cast(sum(CASE WHEN h1 THEN 0 ELSE cents END) AS bigint) AS s2,
         cast(sum(CASE WHEN h1 THEN 0 ELSE cents * cents END) AS bigint) AS q2
  FROM s GROUP BY event_type
),
z AS (
  SELECT event_type,
         floor((cast(s2 AS double) / n2 - cast(s1 AS double) / n1)
               / sqrt((cast(q1 AS double) / n1
                       - (cast(s1 AS double) / n1) * (cast(s1 AS double) / n1)) / n1
                      + (cast(q2 AS double) / n2
                         - (cast(s2 AS double) / n2) * (cast(s2 AS double) / n2)) / n2)
               * 1000000 + 0.5) / 1000000 AS z
  FROM m
),
ranked AS (
  SELECT event_type, z,
         row_number() OVER (ORDER BY abs(z) DESC, event_type) AS rnk
  FROM z
),
crit AS (
  SELECT rnk, c FROM (VALUES
    {", ".join(f"({i + 1}, {c!r})" for i, c in enumerate(_FDR_CRITS))}) v(rnk, c)
),
flagged AS (
  SELECT r.event_type, r.z, r.rnk, crit.c AS z_crit,
         abs(r.z) >= crit.c AS passes
  FROM ranked r JOIN crit ON r.rnk = crit.rnk
)
SELECT f.event_type, f.z, cast(f.rnk AS integer) AS rnk, f.z_crit,
       EXISTS (SELECT 1 FROM flagged g
               WHERE g.rnk >= f.rnk AND g.passes) AS rejected_bh,
       abs(f.z) >= {_BONF_CRIT!r} AS rejected_bonferroni
FROM flagged f
"""


@register(
    "fdr_stability_screen",
    oracle=_FDR_ORACLE,
    tags=("extension", "quality", "multiple-testing"),
)
def fdr_stability_screen(spark, sf_dir):
    """Multiple-testing-corrected temporal stability screen: per event
    type, a two-sample z of mean value (first half vs second half of the
    window, from integer-cent moments), then Benjamini-Hochberg at
    alpha = {a} across the {m} simultaneous tests — with the Bonferroni
    verdict beside it for comparison. This is the correction every
    many-metrics drift dashboard needs: at {m} tests, one naive 5%
    threshold false-alarms ~{m}x too often.

    The BH step needs inverse-normal critical values; they compute ONCE
    at import by bisection on math.erf and embed as literals in both
    engines, so no runtime Phi exists anywhere. BH rejection uses the
    step-up rule: a test rejects if ANY rank at-or-below it (less
    significant) passes its own threshold — a tiny self-join on the
    {m}-row ranked relation (rank itself via the shared window-free
    count-join).

    Scale: one conditional-moment aggregate over the events, then
    {m}-row algebra.""".format(a=_FDR_ALPHA, m=_FDR_M)
    from ..operators.ranking import rank_by_count_join

    ev = read_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    h1 = F.col("ts") < F.lit(_FDR_CUTOFF).cast("timestamp")
    m = ev.select(F.col("event_type"), h1.alias("h1"), cents.alias("cents")).groupBy(
        "event_type"
    ).agg(
        F.sum(F.when(F.col("h1"), 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("h1"), F.col("cents")).otherwise(0)).alias("s1"),
        F.sum(F.when(F.col("h1"), F.col("cents") * F.col("cents")).otherwise(0)).alias("q1"),
        F.sum(F.when(F.col("h1"), 0).otherwise(1)).alias("n2"),
        F.sum(F.when(F.col("h1"), 0).otherwise(F.col("cents"))).alias("s2"),
        F.sum(F.when(F.col("h1"), 0).otherwise(F.col("cents") * F.col("cents"))).alias("q2"),
    )
    m1 = F.col("s1").cast("double") / F.col("n1")
    m2 = F.col("s2").cast("double") / F.col("n2")
    v1 = (F.col("q1").cast("double") / F.col("n1") - m1 * m1) / F.col("n1")
    v2 = (F.col("q2").cast("double") / F.col("n2") - m2 * m2) / F.col("n2")
    z = m.select(
        "event_type",
        (F.floor((m2 - m1) / F.sqrt(v1 + v2) * 1000000 + 0.5) / 1000000).alias("z"),
    ).withColumn("absz", F.abs(F.col("z"))).transform(cut_eager)
    ranked = rank_by_count_join(z, value_col="absz", id_col="event_type", rank_col="rnk")
    crit = F.element_at(
        F.array(*[F.lit(c) for c in _FDR_CRITS]), F.col("rnk").cast("int")
    )
    flagged = ranked.select(
        "event_type", "z", F.col("rnk").cast("int").alias("rnk"),
        crit.alias("z_crit"),
        (F.abs(F.col("z")) >= crit).alias("passes"),
    ).transform(cut_eager)
    g = flagged.select(F.col("rnk").alias("grnk"), F.col("passes").alias("gp"))
    bh = (
        flagged.join(F.broadcast(g), F.col("grnk") >= F.col("rnk"), "left")
        .groupBy("event_type", "z", "rnk", "z_crit")
        .agg(F.max(F.when(F.col("gp"), 1).otherwise(0)).alias("anypass"))
    )
    return bh.select(
        "event_type",
        "z",
        "rnk",
        "z_crit",
        (F.col("anypass") == 1).alias("rejected_bh"),
        (F.abs(F.col("z")) >= _BONF_CRIT).alias("rejected_bonferroni"),
    )


# --- binned two-sample Kolmogorov-Smirnov -------------------------------------------

_KS_BINS = 1024
_KS_C05 = 1.358  # two-sided alpha=0.05 asymptotic coefficient

_KS_ORACLE = f"""
WITH s AS (
  SELECT ts < timestamp '{_FDR_CUTOFF}' AS h1,
         cast(floor(value * 100 + 0.5) AS bigint) AS cents
  FROM events
),
rng AS (SELECT cast(min(cents) AS bigint) AS lo, cast(max(cents) AS bigint) AS hi FROM s),
b AS (
  SELECT (cents - lo) * {_KS_BINS} // (hi - lo + 1) AS bin, h1 FROM s, rng
),
h AS (
  SELECT bin,
         cast(sum(CASE WHEN h1 THEN 1 ELSE 0 END) AS bigint) AS n1_b,
         cast(sum(CASE WHEN h1 THEN 0 ELSE 1 END) AS bigint) AS n2_b
  FROM b GROUP BY bin
),
tot AS (SELECT cast(sum(n1_b) AS bigint) AS n1, cast(sum(n2_b) AS bigint) AS n2 FROM h),
cum AS (
  SELECT a.bin,
         cast(sum(b.n1_b) AS bigint) AS c1,
         cast(sum(b.n2_b) AS bigint) AS c2
  FROM h a JOIN h b ON b.bin <= a.bin
  GROUP BY a.bin
),
d AS (
  SELECT cast(max(abs(c1 * tot.n2 - c2 * tot.n1)) AS bigint) AS d_num
  FROM cum, tot
)
SELECT tot.n1, tot.n2,
       floor(cast(d.d_num AS double) / (tot.n1 * tot.n2) * 1000000 + 0.5)
         / 1000000 AS ks_d,
       floor({_KS_C05!r} * sqrt(cast(tot.n1 + tot.n2 AS double)
                                / (tot.n1 * tot.n2)) * 1000000 + 0.5)
         / 1000000 AS d_crit,
       cast(d.d_num AS double) / (tot.n1 * tot.n2)
         > {_KS_C05!r} * sqrt(cast(tot.n1 + tot.n2 AS double) / (tot.n1 * tot.n2))
         AS distributions_differ
FROM d, tot
"""


@register(
    "ks_two_sample_drift",
    oracle=_KS_ORACLE,
    tags=("extension", "quality", "drift", "ks"),
)
def ks_two_sample_drift(spark, sf_dir):
    """Binned two-sample Kolmogorov-Smirnov test of the event-value
    distribution, first half vs second half of the window — the
    DISTRIBUTION-level drift gate beside the mean-level FDR screen (a
    variance or shape change with a stable mean passes a z-test and
    fails this one). D = max ECDF gap at {b} bin edges, computed as an
    EXACT integer maximum (|c1*n2 - c2*n1|, all int64) before one final
    division; the 5% asymptotic critical value rides the published
    1.358 coefficient. Bin-edge evaluation lower-bounds the continuous
    D by at most one bin's mass — the standard large-scale tradeoff.

    Scale: one histogram aggregate over the events; the ECDF prefix is
    a non-equi self-join of the {b}-row histogram (the no-window prefix
    pattern); everything after is single-row algebra.""".format(b=_KS_BINS)
    ev = read_table(spark, sf_dir, "events")
    s = ev.select(
        (F.col("ts") < F.lit(_FDR_CUTOFF).cast("timestamp")).alias("h1"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    rng = s.agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
    h = (
        s.crossJoin(F.broadcast(rng))
        .select(
            ((F.col("cents") - F.col("lo")) * _KS_BINS / (F.col("hi") - F.col("lo") + 1))
            .cast("long")
            .alias("bin"),
            "h1",
        )
        .groupBy("bin")
        .agg(
            count_if(F.col("h1")).alias("n1_b"),
            count_if(~F.col("h1")).alias("n2_b"),
        )
        .transform(cut_lazy)
    )
    tot = h.agg(F.sum("n1_b").alias("n1"), F.sum("n2_b").alias("n2"))
    a = h.select(F.col("bin").alias("abin"))
    b = h.select(F.col("bin").alias("bbin"), "n1_b", "n2_b")
    cum = (
        a.join(F.broadcast(b), F.col("bbin") <= F.col("abin"))
        .groupBy("abin")
        .agg(F.sum("n1_b").alias("c1"), F.sum("n2_b").alias("c2"))
    )
    d = cum.crossJoin(F.broadcast(tot)).agg(
        F.max(
            F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
        ).alias("d_num")
    )
    ks = F.col("d_num").cast("double") / (F.col("n1") * F.col("n2"))
    crit = _KS_C05 * F.sqrt(
        (F.col("n1") + F.col("n2")).cast("double") / (F.col("n1") * F.col("n2"))
    )
    return d.crossJoin(F.broadcast(tot)).select(
        "n1",
        "n2",
        (F.floor(ks * 1000000 + 0.5) / 1000000).alias("ks_d"),
        (F.floor(crit * 1000000 + 0.5) / 1000000).alias("d_crit"),
        (ks > crit).alias("distributions_differ"),
    )


# --- binned Spearman rank correlation -----------------------------------------------

_SP_BINS = 256

_SP_ORACLE = f"""
WITH s AS (
  SELECT cast(l_quantity AS bigint) AS qx,
         cast(floor(l_extendedprice * 100 + 0.5) AS bigint) AS pc
  FROM lineitem
),
rng AS (SELECT cast(min(pc) AS bigint) AS lo, cast(max(pc) AS bigint) AS hi FROM s),
b AS (
  SELECT qx, (pc - lo) * {_SP_BINS} // (hi - lo + 1) AS qy FROM s, rng
),
j AS (SELECT qx, qy, cast(count(*) AS bigint) AS w FROM b GROUP BY qx, qy),
hx AS (SELECT qx, cast(sum(w) AS bigint) AS fx FROM j GROUP BY qx),
hy AS (SELECT qy, cast(sum(w) AS bigint) AS fy FROM j GROUP BY qy),
-- doubled midrank: 2*(count of strictly smaller) + freq + 1 (an integer)
rx AS (
  SELECT a.qx,
         2 * cast(coalesce(sum(CASE WHEN b.qx < a.qx THEN b.fx END), 0) AS bigint)
           + a.fx + 1 AS mrx
  FROM hx a LEFT JOIN hx b ON b.qx <= a.qx
  GROUP BY a.qx, a.fx
),
ry AS (
  SELECT a.qy,
         2 * cast(coalesce(sum(CASE WHEN b.qy < a.qy THEN b.fy END), 0) AS bigint)
           + a.fy + 1 AS mry
  FROM hy a LEFT JOIN hy b ON b.qy <= a.qy
  GROUP BY a.qy, a.fy
),
m AS (
  SELECT cast(sum(j.w) AS bigint) AS n,
         cast(sum(j.w * rx.mrx) AS bigint) AS sx,
         cast(sum(j.w * ry.mry) AS bigint) AS sy,
         cast(sum(j.w * rx.mrx * ry.mry) AS bigint) AS sxy,
         cast(sum(j.w * rx.mrx * rx.mrx) AS bigint) AS sxx,
         cast(sum(j.w * ry.mry * ry.mry) AS bigint) AS syy
  FROM j JOIN rx ON j.qx = rx.qx JOIN ry ON j.qy = ry.qy
)
SELECT n AS n_rows,
       floor((cast(sxy AS double) / n
              - (cast(sx AS double) / n) * (cast(sy AS double) / n))
             / sqrt(cast(sxx AS double) / n
                    - (cast(sx AS double) / n) * (cast(sx AS double) / n))
             / sqrt(cast(syy AS double) / n
                    - (cast(sy AS double) / n) * (cast(sy AS double) / n))
             * 1000000 + 0.5) / 1000000 AS spearman_rho
FROM m
"""


@register(
    "spearman_qty_price",
    oracle=_SP_ORACLE,
    tags=("extension", "analytics", "correlation"),
)
def spearman_qty_price(spark, sf_dir):
    """Spearman rank correlation between line quantity and extended
    price — the robust companion to pearson_qty_price (rank correlation
    ignores the price distribution's shape and any monotone transform).
    Quantity's ~50 discrete levels rank exactly; price ranks at {b}-bin
    granularity (binned Spearman, the large-scale form). Tied values
    take midranks, carried as DOUBLED midranks so every rank is an
    integer and all moment SUMS are exact int64; rho then evaluates in
    the centered double-domain form (the raw integer cross-products
    overflow int64 at scale) — int64->double casts and the division
    chain are IEEE-identical in both engines, and rho is invariant to
    the doubling.

    Scale: one joint-histogram aggregate over the fact; midranks and
    moments live on the tiny (levels x bins) cell relation with
    non-equi prefix joins — the same no-window discipline as the rest
    of the stats family.""".format(b=_SP_BINS)
    l = read_table(spark, sf_dir, "lineitem")
    s = l.select(
        F.col("l_quantity").cast("long").alias("qx"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long").alias("pc"),
    )
    rng = s.agg(F.min("pc").alias("lo"), F.max("pc").alias("hi"))
    j = (
        s.crossJoin(F.broadcast(rng))
        .select(
            "qx",
            ((F.col("pc") - F.col("lo")) * _SP_BINS / (F.col("hi") - F.col("lo") + 1))
            .cast("long")
            .alias("qy"),
        )
        .groupBy("qx", "qy")
        .agg(F.count(F.lit(1)).alias("w"))
        .transform(cut_lazy)
    )
    hx = j.groupBy("qx").agg(F.sum("w").alias("fx"))
    hy = j.groupBy("qy").agg(F.sum("w").alias("fy"))

    def midranks(h, key, f):
        a = h.select(F.col(key).alias("ak"), F.col(f).alias("af"))
        b = h.select(F.col(key).alias("bk"), F.col(f).alias("bf"))
        return (
            a.join(F.broadcast(b), F.col("bk") <= F.col("ak"), "left")
            .groupBy("ak", "af")
            .agg(
                (
                    2
                    * F.coalesce(
                        F.sum(F.when(F.col("bk") < F.col("ak"), F.col("bf"))),
                        F.lit(0),
                    )
                    + F.col("af")
                    + 1
                ).alias("mr")
            )
            .select(F.col("ak").alias(key), F.col("mr"))
        )

    rx = midranks(hx, "qx", "fx").select("qx", F.col("mr").alias("mrx"))
    ry = midranks(hy, "qy", "fy").select("qy", F.col("mr").alias("mry"))
    m = (
        j.join(F.broadcast(rx), "qx")
        .join(F.broadcast(ry), "qy")
        .agg(
            F.sum("w").alias("n"),
            F.sum(F.col("w") * F.col("mrx")).alias("sx"),
            F.sum(F.col("w") * F.col("mry")).alias("sy"),
            F.sum(F.col("w") * F.col("mrx") * F.col("mry")).alias("sxy"),
            F.sum(F.col("w") * F.col("mrx") * F.col("mrx")).alias("sxx"),
            F.sum(F.col("w") * F.col("mry") * F.col("mry")).alias("syy"),
        )
    )
    # centered double-domain form: the raw n*Sxy - Sx*Sy integers overflow
    # int64 at sf0.01+ (doubled midranks reach 1.2e6); int64 -> double
    # casts and the arithmetic below are IEEE-identical in both engines
    mx = F.col("sx").cast("double") / F.col("n")
    my = F.col("sy").cast("double") / F.col("n")
    rho = (
        (F.col("sxy").cast("double") / F.col("n") - mx * my)
        / F.sqrt(F.col("sxx").cast("double") / F.col("n") - mx * mx)
        / F.sqrt(F.col("syy").cast("double") / F.col("n") - my * my)
    )
    return m.select(
        F.col("n").alias("n_rows"),
        (F.floor(rho * 1000000 + 0.5) / 1000000).alias("spearman_rho"),
    )


# --- hashed-linear quality classifier (fastText-style model-based filtering) ----------

_QC_DIM = 256
#: public deterministic weight table: Knuth multiplicative scramble of
#: the bucket id into [-998, 998] — a stand-in for trained fastText /
#: CCNet quality-classifier weights, embedded as the SAME literal array
#: in both engines (the broadcast-literal form a real deployment uses:
#: the model rides the closure, never a join).
_QC_WEIGHTS = [((i * 2654435761) % 1997) - 998 for i in range(_QC_DIM)]
_QC_THRESH_MILLI = 25  # admit when 1000 * score >= THRESH * n_features

_QC_W_SQL = "[" + ", ".join(str(w) for w in _QC_WEIGHTS) + "]"

_QC_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_TOK_SQL} AS toks FROM documents
),
s AS (
  SELECT doc_id,
         cast(len(toks) + greatest(len(toks) - 1, 0) AS int) AS n_features,
         cast(
           list_aggregate(list_transform(toks,
             x -> ({_QC_W_SQL})[{token_hash_sql('x')} % {_QC_DIM} + 1]),
             'sum')
           + coalesce(list_aggregate(list_transform(range(1, len(toks)),
               i -> ({_QC_W_SQL})[
                 {token_hash_sql("toks[i] || ' ' || toks[i + 1]")}
                 % {_QC_DIM} + 1]),
               'sum'), 0)
           AS bigint) AS score
  FROM t WHERE len(toks) > 0
)
SELECT doc_id, n_features, score,
       score * 1000 >= {_QC_THRESH_MILLI} * n_features AS admitted
FROM s
"""


@register(
    "quality_classifier_admission",
    oracle=_QC_ORACLE,
    tags=("extension", "selection", "quality", "classifier"),
)
def quality_classifier_admission(spark, sf_dir):
    """Hashed-linear quality-classifier scoring (round-11) — the
    model-based corpus filter next to DSIR: CCNet/RefinedWeb-style
    pipelines admit documents by a fastText-family linear classifier
    over hashed word n-grams. Features are the document's unigrams plus
    adjacent bigrams, each hashed into a {dim}-bucket space
    (token_hash mod {dim}); the score is the integer sum of the
    per-bucket weights (a {dim}-entry literal table standing in for
    trained weights); admission is the per-feature mean threshold
    score/n_features >= {thr}/1000, spelled in cross-multiplied
    integer math so neither engine divides. The oracle recomputes the
    hash, the table lookup, and the fold closed-form — the classifier
    inference path itself is hash-gated.

    Scale: no aggregation, no join — tokenize, hash, and fold are
    in-row expressions inside one projection over the documents scan
    (the only exchange anywhere is the small-input widen, a no-op on a
    pre-split lake), and the model weights ride the plan as a literal
    (at real dims, a broadcast variable): the whole filter is a pure
    scan-map pass at any corpus size, the defining property that lets
    model-based filtering run inline with ingest instead of as a join
    stage. n_features is derived arithmetically from the token count
    (2n-1) so the feature array has exactly ONE consumer — the fold —
    and CollapseProject can't make the hash pipeline materialize
    twice. Zero-token documents have no features and are not scored
    (the CCNet convention: length filters run upstream of the
    classifier).
    """.format(dim=_QC_DIM, thr=_QC_THRESH_MILLI)
    d = widen(read_table(spark, sf_dir, "documents"))
    w = F.array(*[F.lit(int(x)) for x in _QC_WEIGHTS])
    uni = F.transform(F.col("toks"), lambda x: token_hash(x) % _QC_DIM)
    bi = F.when(
        F.size("toks") > 1,
        F.zip_with(
            F.slice(F.col("toks"), 1, F.size("toks") - 1),
            F.slice(F.col("toks"), 2, F.size("toks") - 1),
            lambda a, b: token_hash(F.concat(a, F.lit(" "), b)) % _QC_DIM,
        ),
    ).otherwise(F.array().cast("array<long>"))
    score = F.aggregate(
        F.concat(uni, bi),
        F.lit(0).cast("long"),
        lambda acc, b: acc + F.element_at(w, (b + 1).cast("int")),
    )
    n_features = (
        F.when(F.size("toks") > 1, 2 * F.size("toks") - 1)
        .otherwise(F.size("toks"))
        .cast("int")
    )
    return (
        d.select("doc_id", _toks().alias("toks"))
        .where(F.size("toks") > 0)
        .select(
            "doc_id",
            n_features.alias("n_features"),
            score.alias("score"),
        )
        .select(
            "doc_id", "n_features", "score",
            (F.col("score") * 1000 >= _QC_THRESH_MILLI * F.col("n_features"))
            .alias("admitted"),
        )
    )
