"""Corpus-governance extension queries (round 3): cross-document span
dedup, language-balance sampling weights, truncated EWMA smoothing,
GDPR-style erasure cascade audit, and embedding centroid outlier flags —
the operations between "raw corpus" and "curated training mix" that the
earlier dedup/chunking/sampling modules don't cover. No reference
counterpart (north-star LLM-pipeline surface, SURVEY.md section 2.7);
designed Spark-first.

Float discipline follows functions/numeric.py: integer/decimal
accumulators wherever a sum crosses rows (order-free), single double
divisions, sqrt only (IEEE-exact, unlike pow), fixed left-fold order for
in-row array math, floor-form rounding — so every query hash-matches its
DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions import vec
from ..functions.numeric import oracle_avg, round_half_up, rounded_avg, rounded_sum
from ..sources.lake import read_table, widen
from . import register
from ..operators.checkpointing import cut_lazy

# --- cross-corpus span dedup --------------------------------------------------------

_SPAN_TOKENS = 8


_SPAN_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '[ \\t\\n\\r\\f]+') AS t
  FROM documents
),
spans_list AS (
  SELECT doc_id,
         list_transform(
           range(1, len(t) // {_SPAN_TOKENS} + 1),
           i -> md5(array_to_string(
                  list_slice(t, (i - 1) * {_SPAN_TOKENS} + 1,
                             (i - 1) * {_SPAN_TOKENS} + {_SPAN_TOKENS}), ' '))
         ) AS hs
  FROM toks
),
flat AS (
  SELECT doc_id, generate_subscripts(hs, 1) AS span_idx, unnest(hs) AS h
  FROM spans_list
),
ranked AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, span_idx) AS rn
  FROM flat
),
agg AS (
  SELECT doc_id,
         cast(count(*) AS bigint) AS n_spans,
         cast(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS bigint) AS n_dup_spans
  FROM ranked GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.n_spans, 0) AS n_spans,
       coalesce(a.n_dup_spans, 0) AS n_dup_spans,
       CASE WHEN a.n_spans > 0 THEN
         floor(cast(a.n_dup_spans AS double) / a.n_spans * 10000 + 0.5) / 10000
       END AS dup_frac
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
"""


def _span_arrow_enabled() -> bool:
    """A/B lever for the Arrow span-fingerprint kernel (read at plan
    build time; same decision pattern as operators/dedup.py's shingle
    kernel — the md5-per-tile expression chain is the dominant per-row
    cost at scale, and CPython's C md5 over Arrow batches computes the
    SAME hex digests)."""
    import os

    return os.environ.get("SPARK_GRAFT_SPAN_ARROW", "1").lower() not in (
        "0", "false", "no",
    )


def _doc_span_hashes_arrow(d, span_tokens: int):
    """mapInArrow twin of the JVM tile pipeline in span_dedup_report:
    emits (doc_id, span_idx, h) with span_idx 0-based in document order
    (exactly the posexplode rows) and h = md5 hex of the space-joined
    tile — tokenizer semantics pinned to F.split(lower(trim(text)))
    (trim strips spaces only; empty tokens kept like Java regex split
    with limit -1). Docs with fewer than ``span_tokens`` tokens (or
    null text) emit nothing, exactly like the ``when(nsp >= 1)`` guard."""
    import pyarrow as pa

    def kernel(batches):
        import hashlib
        import re as _re

        split = _re.compile(r"[ \t\n\r\f]+").split
        md5 = hashlib.md5
        join = " ".join
        for batch in batches:
            ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            out_ids: list[int] = []
            out_idx: list[int] = []
            out_h: list[str] = []
            for did, txt in zip(ids, texts):
                if txt is None:
                    continue
                toks = split(txt.strip(" ").lower())
                nsp = len(toks) // span_tokens
                for i in range(nsp):
                    out_ids.append(did)
                    out_idx.append(i)
                    out_h.append(
                        md5(
                            join(
                                toks[i * span_tokens : (i + 1) * span_tokens]
                            ).encode("utf-8")
                        ).hexdigest()
                    )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_ids, pa.int64()),
                    pa.array(out_idx, pa.int32()),
                    pa.array(out_h, pa.string()),
                ],
                ["doc_id", "span_idx", "h"],
            )

    return widen(d.select("doc_id", "text")).mapInArrow(
        kernel, "doc_id long, span_idx int, h string"
    )


@register(
    "span_dedup_report",
    oracle=_SPAN_ORACLE,
    tags=("extension", "corpus", "dedup", "span"),
)
def span_dedup_report(spark, sf_dir):
    """Sub-document exact span dedup (ExactSubstr-lite): tile each document
    into non-overlapping 8-token windows, fingerprint each with md5, and
    count how many of a document's spans already occurred earlier in the
    corpus (first occurrence wins, ordered by doc_id then position) — the
    span-level duplicate-contamination signal whole-doc dedup misses when
    boilerplate is stitched into otherwise-novel pages.

    Scale: the only corpus-sized shuffle is the window over the 128-bit
    span fingerprint (keyed, uniformly distributed — no skew partition:
    short docs produce zero spans and never enter the exchange; they are
    restored by the doc_id-keyed left join). Everything before it is
    in-row array math inside codegen."""
    d = read_table(spark, sf_dir, "documents")
    if _span_arrow_enabled():
        flat = _doc_span_hashes_arrow(d, _SPAN_TOKENS)
    else:
        # materialize the token array as its own projection so the regex
        # split runs ONCE per row (referenced inside the tile lambda, it
        # would otherwise re-split per tile), and widen so the per-row
        # md5/regex work uses every core instead of the scan's single
        # input split
        tokd = widen(d.select("doc_id", "text")).select(
            "doc_id",
            F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\r\f]+").alias("t"),
        )
        toks = F.col("t")
        nsp = F.floor(F.size(toks) / F.lit(_SPAN_TOKENS)).cast("int")
        spans = F.when(
            nsp >= 1,
            F.transform(
                F.sequence(F.lit(1), nsp),
                lambda i: F.md5(
                    F.concat_ws(
                        " ",
                        F.slice(toks, (i - 1) * _SPAN_TOKENS + 1, _SPAN_TOKENS),
                    )
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        flat = tokd.select("doc_id", spans.alias("hs")).select(
            "doc_id", F.posexplode("hs").alias("span_idx", "h")
        )
    w = Window.partitionBy("h").orderBy("doc_id", "span_idx")
    agg = (
        flat.withColumn("rn", F.row_number().over(w))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).alias("n_dup_spans"),
        )
    )
    return (
        d.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
            F.when(
                F.col("n_spans") > 0,
                round_half_up(
                    F.col("n_dup_spans").cast("double") / F.col("n_spans"), 4
                ),
            ).alias("dup_frac"),
        )
    )


# --- language-balance sampling weights ----------------------------------------------

_LANG_BALANCE_ORACLE = """
WITH counts AS (
  SELECT lang, cast(count(*) AS bigint) AS n_docs FROM documents GROUP BY lang
),
tot AS (
  SELECT cast(sum(n_docs) AS bigint) AS n_total,
         cast(max(n_docs) AS bigint) AS n_max
  FROM counts
)
SELECT lang, n_docs,
       floor(cast(n_docs AS double) / n_total * 1000000 + 0.5) / 1000000
         AS share_frac,
       floor(sqrt(cast(n_docs AS double) / n_max) * 1000000 + 0.5) / 1000000
         AS rel_weight,
       floor(sqrt(cast(n_max AS double) / n_docs) * 1000000 + 0.5) / 1000000
         AS upsample_factor
FROM counts, tot
"""


@register(
    "lang_balance_weights",
    oracle=_LANG_BALANCE_ORACLE,
    tags=("extension", "corpus", "sampling", "multilingual"),
)
def lang_balance_weights(spark, sf_dir):
    """Temperature-balanced multilingual sampling weights (the multilingual
    pretraining recipe: raise per-language probabilities to T=0.5 so
    low-resource languages are upsampled without drowning the head): per
    language, corpus share (``share_frac``, a 0-1 fraction), relative
    sampling weight sqrt(n/n_max), and the upsampling factor sqrt(n_max/n)
    vs proportional sampling.

    Naming convention: ratio columns in this repo are 0-1 fractions; new
    columns say ``_frac``. The surviving ``_pct`` names (``mkt_share_pct``,
    ``erased_row_pct``) are also fractions — kept for TPC-H Q8 naming
    parity, documented here once.

    T=0.5 exactly BECAUSE sqrt is IEEE-correctly-rounded in every engine
    while pow(x, 0.3) is libm-dependent — the one temperature with
    bit-reproducible weights. All cross-row math is integer counts; the
    per-row double chain is division -> sqrt -> floor-round, each exact.

    Scale: one count aggregate over the corpus (map-side combined), one
    broadcast of the per-language rows against a 1-row total."""
    d = read_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(
        F.sum("n_docs").alias("n_total"), F.max("n_docs").alias("n_max")
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        round_half_up(F.col("n_docs").cast("double") / F.col("n_total"), 6).alias(
            "share_frac"
        ),
        round_half_up(
            F.sqrt(F.col("n_docs").cast("double") / F.col("n_max")), 6
        ).alias("rel_weight"),
        round_half_up(
            F.sqrt(F.col("n_max").cast("double") / F.col("n_docs")), 6
        ).alias("upsample_factor"),
    )


# --- truncated EWMA smoothing -------------------------------------------------------

_EWMA_DECAY = 0.8
_EWMA_LAGS = 12  # includes the current bucket: j = 0 .. 11
#: decay^j as repr'd Python floats: both engines parse the same decimal
#: literal to the same nearest double, so the weight set is bit-identical.
_EWMA_COEF = [_EWMA_DECAY**j for j in range(_EWMA_LAGS)]


def _ewma_oracle() -> str:
    numer = ["0.0"]
    denom = ["0.0"]
    for j, c in enumerate(_EWMA_COEF):
        lag = "obs_avg" if j == 0 else f"lag(obs_avg, {j}) OVER wdw"
        numer.append(f"{c!r} * coalesce({lag}, 0.0)")
        denom.append(f"CASE WHEN {lag} IS NOT NULL THEN {c!r} ELSE 0.0 END")
    return f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         {oracle_avg("value")} AS obs_avg
  FROM events GROUP BY event_type, date_trunc('hour', ts)
)
SELECT event_type, bucket, obs_avg,
       floor(({' + '.join(numer)}) / ({' + '.join(denom)}) * 10000 + 0.5) / 10000
         AS ewma_12h
FROM hourly
WINDOW wdw AS (PARTITION BY event_type ORDER BY bucket)
"""


@register(
    "ts_ewma_12h",
    oracle=_ewma_oracle(),
    tags=("extension", "timeseries", "smoothing"),
)
def ts_ewma_12h(spark, sf_dir):
    """Truncated exponentially-weighted moving average over hourly buckets
    per event_type: ewma_i = sum_j 0.8^j * x_(i-j) / sum_j 0.8^j over the
    last 12 present buckets. Truncating the horizon is what makes EWMA
    scale-shaped: the recursive form forces a sequential scan per series,
    while the 12-lag form is a bounded window — rows beyond 12 buckets
    never interact, so Spark executes it as one keyed window with finite
    frames, partition-parallel across series.

    Determinism: hourly means use the decimal accumulator; the weighted
    sum is a FIXED left-assoc expression of 12 terms whose coefficients
    are shared repr'd literals, so both engines run the identical IEEE
    sequence (missing leading lags contribute exact +0.0 and drop out of
    the weight normalizer)."""
    hourly = (
        read_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(rounded_avg("value").alias("obs_avg"))
    )
    w = Window.partitionBy("event_type").orderBy("bucket")
    numer = F.lit(0.0)
    denom = F.lit(0.0)
    for j, c in enumerate(_EWMA_COEF):
        lag = F.col("obs_avg") if j == 0 else F.lag("obs_avg", j).over(w)
        numer = numer + F.lit(c) * F.coalesce(lag, F.lit(0.0))
        denom = denom + F.when(lag.isNotNull(), F.lit(c)).otherwise(F.lit(0.0))
    return hourly.select(
        "event_type",
        "bucket",
        "obs_avg",
        round_half_up(numer / denom, 4).alias("ewma_12h"),
    )


# --- GDPR-style erasure cascade audit -----------------------------------------------

_ERASE_MOD = 97

_ERASURE_ORACLE = f"""
WITH erased AS (
  SELECT c_custkey FROM customer WHERE c_custkey % {_ERASE_MOD} = 0
),
eo AS (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM erased)
),
cnt AS (
  SELECT
    (SELECT cast(count(*) AS bigint) FROM erased) AS n_customers_erased,
    (SELECT cast(count(*) AS bigint) FROM eo) AS n_orders_erased,
    (SELECT cast(count(*) AS bigint) FROM lineitem
      WHERE l_orderkey IN (SELECT o_orderkey FROM eo)) AS n_lineitems_erased,
    (SELECT cast(count(*) AS bigint) FROM events
      WHERE user_id IN (SELECT c_custkey FROM erased)) AS n_events_erased,
    (SELECT cast(count(*) AS bigint) FROM customer)
      + (SELECT cast(count(*) AS bigint) FROM orders)
      + (SELECT cast(count(*) AS bigint) FROM lineitem)
      + (SELECT cast(count(*) AS bigint) FROM events) AS n_rows_total
)
SELECT n_customers_erased, n_orders_erased, n_lineitems_erased,
       n_events_erased,
       floor(cast(n_customers_erased + n_orders_erased + n_lineitems_erased
                  + n_events_erased AS double) / n_rows_total * 1000000 + 0.5)
         / 1000000 AS erased_row_pct
FROM cnt
"""


@register(
    "user_erasure_cascade",
    oracle=_ERASURE_ORACLE,
    tags=("extension", "corpus", "governance", "erasure"),
)
def user_erasure_cascade(spark, sf_dir):
    """Right-to-erasure impact audit: given a deletion cohort (here the
    deterministic c_custkey % 97 = 0 stand-in for a consent-revocation
    list), count every row that the cascade must delete — the customer
    rows, their orders, those orders' line items, and the cohort's event
    rows — plus the total fraction of the lake affected. The dry-run every
    compliant deletion pipeline executes before mutating 100 TB.

    Scale shape: the cohort key set broadcasts to semi-join each fact
    exactly once (no fact ever shuffles); the order->lineitem hop reuses
    the erased-orders keys as a second broadcast. Counts are single-row
    aggregates crossed together at the end."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    ev = read_table(spark, sf_dir, "events")

    erased = cust.where(F.col("c_custkey") % _ERASE_MOD == 0).select("c_custkey")
    eo = orders.join(
        F.broadcast(erased), orders["o_custkey"] == erased["c_custkey"], "left_semi"
    ).select("o_orderkey")
    el = li.join(
        F.broadcast(eo), li["l_orderkey"] == eo["o_orderkey"], "left_semi"
    )
    ee = ev.join(
        F.broadcast(erased), ev["user_id"] == erased["c_custkey"], "left_semi"
    )

    def cnt(df, name):
        return df.agg(F.count(F.lit(1)).cast("long").alias(name))

    totals = (
        cnt(cust, "n_cust")
        .crossJoin(cnt(orders, "n_ord"))
        .crossJoin(cnt(li, "n_li"))
        .crossJoin(cnt(ev, "n_ev"))
    )
    out = (
        cnt(erased, "n_customers_erased")
        .crossJoin(cnt(eo, "n_orders_erased"))
        .crossJoin(cnt(el, "n_lineitems_erased"))
        .crossJoin(cnt(ee, "n_events_erased"))
        .crossJoin(F.broadcast(totals))
    )
    n_rows_total = (
        F.col("n_cust") + F.col("n_ord") + F.col("n_li") + F.col("n_ev")
    )
    n_erased = (
        F.col("n_customers_erased")
        + F.col("n_orders_erased")
        + F.col("n_lineitems_erased")
        + F.col("n_events_erased")
    )
    return out.select(
        "n_customers_erased",
        "n_orders_erased",
        "n_lineitems_erased",
        "n_events_erased",
        round_half_up(n_erased.cast("double") / n_rows_total, 6).alias(
            "erased_row_pct"
        ),
    )


# --- embedding centroid outliers ----------------------------------------------------

_CENT_SCALE = 1_000_000  # 1e-6 component grid: int64 sums exact at 100 TB rows
_OUTLIER_FRAC = 0.05

_CENTROID_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> cast(x AS double)) AS v
  FROM embeddings
),
comp AS (
  SELECT label, generate_subscripts(v, 1) AS dim, unnest(v) AS val FROM e
),
cent AS (
  SELECT label, dim,
         cast(floor(cast(sum(cast(floor(val * {_CENT_SCALE} + 0.5) AS bigint))
                          AS double) / count(*) + 0.5) AS bigint)
           / {float(_CENT_SCALE)!r} AS comp
  FROM comp GROUP BY label, dim
),
cv AS (SELECT label, list(comp ORDER BY dim) AS cvec FROM cent GROUP BY label),
dist AS (
  SELECT e.vec_id, e.label,
         sqrt(list_aggregate(list_transform(list_zip(e.v, cv.cvec),
                                            p -> (p[1] - p[2]) * (p[1] - p[2])),
                             'sum')) AS d
  FROM e JOIN cv ON e.label = cv.label
),
n AS (SELECT label, cast(count(*) AS bigint) AS n_label FROM e GROUP BY label),
ranked AS (
  SELECT vec_id, dist.label, d, n_label,
         row_number() OVER (PARTITION BY dist.label ORDER BY d DESC, vec_id)
           AS rk
  FROM dist JOIN n ON dist.label = n.label
)
SELECT vec_id, label,
       floor(d * 10000 + 0.5) / 10000 AS dist_centroid,
       rk <= cast(ceil(n_label * {_OUTLIER_FRAC!r}) AS bigint) AS is_outlier
FROM ranked
"""


@register(
    "emb_centroid_outliers",
    oracle=_CENTROID_ORACLE,
    tags=("extension", "corpus", "similarity", "quality"),
)
def emb_centroid_outliers(spark, sf_dir):
    """Embedding-space quality filter: per label, the exact class centroid
    (components quantized to a 1e-6 integer grid so the cross-row sums are
    order-free, mirroring the k-means trainer); per vector, L2 distance to
    its own centroid (fixed left-fold) and an outlier flag for the top 5%
    most-distant vectors per label — rank-based, so no cross-row float
    statistics enter the decision. The standard mislabeled/off-domain
    screen before embeddings feed curriculum sampling or ANN indexes.

    Scale: centroid update shuffles (label, dim)-keyed quantized partials
    (map-side combined); the k centroids broadcast back; ranking is a
    keyed window per label."""
    e = read_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    comp = e.select("label", F.posexplode("v").alias("pos", "val")).select(
        "label",
        (F.col("pos") + 1).alias("dim"),
        F.floor(F.col("val") * _CENT_SCALE + 0.5).cast("long").alias("q"),
    )
    cent = comp.groupBy("label", "dim").agg(
        (
            F.floor(F.sum("q").cast("double") / F.count(F.lit(1)) + 0.5).cast(
                "long"
            )
            / float(_CENT_SCALE)
        ).alias("comp")
    )
    cv = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "comp"))),
            lambda s: s.comp,
        ).alias("cvec")
    )
    d2 = vec.fold_sqdist(F.col("v"), F.col("cvec"))
    dist = e.join(F.broadcast(cv), "label").select(
        "vec_id", "label", F.sqrt(d2).alias("d")
    )
    n = e.groupBy("label").agg(F.count(F.lit(1)).alias("n_label"))
    w = Window.partitionBy("label").orderBy(F.desc("d"), F.asc("vec_id"))
    return (
        dist.join(F.broadcast(n), "label")
        .withColumn("rk", F.row_number().over(w))
        .select(
            "vec_id",
            "label",
            round_half_up(F.col("d"), 4).alias("dist_centroid"),
            (F.col("rk") <= F.ceil(F.col("n_label") * _OUTLIER_FRAC)).alias(
                "is_outlier"
            ),
        )
    )


# --- BPE merge training (first 3 merges) --------------------------------------------

_BPE_ITERS = 3


def _bpe_iter_sql(i: int) -> str:
    """One unrolled BPE iteration over tok{i-1} -> tok{i} (see the Spark
    twin for the greedy-merge island logic)."""
    p = i - 1
    return f"""
pair{i} AS (
  SELECT word, freq, pos, tok,
         lead(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt
  FROM tok{p}
),
cnt{i} AS (
  SELECT tok AS a, nxt AS b, cast(sum(freq) AS bigint) AS pair_count
  FROM pair{i} WHERE nxt IS NOT NULL GROUP BY tok, nxt
),
top{i} AS (
  SELECT a, b, pair_count FROM cnt{i}
  QUALIFY row_number() OVER (ORDER BY pair_count DESC, a, b) = 1
),
m{i} AS (
  SELECT p.word, p.pos
  FROM pair{i} p, top{i} t
  WHERE p.tok = t.a AND p.nxt = t.b
),
st{i} AS (
  SELECT word, pos FROM (
    SELECT word, pos,
           pos - min(pos) OVER (PARTITION BY word, island) AS off
    FROM (
      SELECT word, pos,
             pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS island
      FROM m{i}
    )
  ) WHERE off % 2 = 0
),
tok{i} AS (
  SELECT p.word, p.freq,
         row_number() OVER (PARTITION BY p.word ORDER BY p.pos) AS pos,
         CASE WHEN s.pos IS NOT NULL THEN t.a || t.b ELSE p.tok END AS tok
  FROM pair{i} p
  CROSS JOIN top{i} t
  LEFT JOIN st{i} s ON p.word = s.word AND p.pos = s.pos
  LEFT JOIN st{i} s2 ON p.word = s2.word AND p.pos = s2.pos + 1
  WHERE s2.pos IS NULL
)"""


#: shared CTE chain (word freqs -> char tokens -> 3 unrolled merge
#: iterations); the trainer and the encoder put different SELECTs on top
_BPE_CTE = (
    """
WITH words AS (
  SELECT w AS word, cast(count(*) AS bigint) AS freq
  FROM (
    SELECT unnest(string_split_regex(lower(trim(text)), '[ \\t\\n\\r\\f]+')) AS w
    FROM documents
  )
  WHERE length(w) > 0 GROUP BY w
),
tok0 AS (
  SELECT word, freq, generate_subscripts(cs, 1) AS pos, unnest(cs) AS tok
  FROM (SELECT word, freq, regexp_extract_all(word, '.') AS cs FROM words)
)"""
    + ","
    + ",".join(_bpe_iter_sql(i) for i in range(1, _BPE_ITERS + 1))
)

_BPE_ORACLE = (
    _BPE_CTE
    + "\n"
    + "\nUNION ALL ".join(
        f"SELECT cast({i} AS integer) AS merge_rank, a AS left_tok,"
        f" b AS right_tok, pair_count FROM top{i}"
        for i in range(1, _BPE_ITERS + 1)
    )
)

_BPE_ENCODE_ORACLE = (
    _BPE_CTE
    + f""",
enc AS (
  SELECT word, cast(count(*) AS bigint) AS n_toks
  FROM tok{_BPE_ITERS} GROUP BY word
),
docw AS (
  SELECT doc_id, w AS word
  FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(trim(text)), '[ \\t\\n\\r\\f]+')) AS w
    FROM documents
  )
  WHERE length(w) > 0
)
SELECT doc_id,
       cast(count(*) AS bigint) AS n_words,
       cast(sum(n_toks) AS bigint) AS n_bpe_tokens
FROM docw JOIN enc USING (word)
GROUP BY doc_id"""
)


@register(
    "bpe_train_merges",
    oracle=_BPE_ORACLE,
    tags=("extension", "corpus", "tokenizer", "bpe"),
)
def bpe_train_merges(spark, sf_dir):
    """Byte-pair-encoding tokenizer training, first 3 merges: count
    adjacent-token pairs weighted by word frequency, pick the most frequent
    pair (ties to lexicographic order), greedily merge it left-to-right
    non-overlapping in every word, repeat. Output: one row per learned
    merge (merge_rank, left_tok, right_tok, pair_count).

    The greedy non-overlap rule (critical when the pair is a repeated
    character, e.g. 'aa' in 'aaaa' merges positions 1-2 and 3-4, never
    2-3) is pure integer window logic — gaps-and-islands: positions are
    dense, so consecutive match positions form a chain; a chain starts
    where the previous position doesn't match (lag), the running max of
    chain-start positions gives each match its chain offset, and a match
    merges iff that offset is even. For distinct-character pairs matches
    are never adjacent, every chain has size 1, and the rule degenerates
    to "merge every match" — one code path, no special case.

    Scale: everything per iteration happens inside ONE word-keyed window
    pipeline over the token table — no join ever touches the corpus-sized
    relation again (the winning pair is a 1-row broadcast), so the only
    per-iteration exchanges are the word-hash shuffle reused across the
    chained windows and the map-side-combined pair count. Unrolled to a
    fixed depth like the k-means trainer, so the whole plan is static and
    oracle-checkable."""
    tops, _toks = _bpe_pipeline(spark, sf_dir)
    out = None
    for rank, top in enumerate(tops, start=1):
        row = top.select(
            F.lit(rank).cast("int").alias("merge_rank"),
            F.col("a").alias("left_tok"),
            F.col("b").alias("right_tok"),
            "pair_count",
        )
        out = row if out is None else out.unionAll(row)
    return out


def _bpe_pipeline(spark, sf_dir):
    """Shared BPE train pipeline (the whole train loop): returns
    ``(tops, toks)`` — the list of 1-row winning-pair DataFrames per
    iteration, and the final (word, freq, pos, tok) relation after all
    merges have been applied. ``bpe_train_merges`` reads the tops;
    ``bpe_encode_token_counts`` reads the final token table."""
    d = read_table(spark, sf_dir, "documents")
    words = (
        d.select(
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\r\f]+")).alias(
                "word"
            )
        )
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    toks = words.select(
        "word",
        "freq",
        F.posexplode(F.expr("regexp_extract_all(word, '.', 0)")).alias(
            "pos0", "tok"
        ),
    ).select("word", "freq", (F.col("pos0") + 1).alias("pos"), "tok")

    tops = []
    for _ in range(_BPE_ITERS):
        wnd = Window.partitionBy("word").orderBy("pos")
        pairs = toks.withColumn("nxt", F.lead("tok").over(wnd))
        counts = (
            pairs.where(F.col("nxt").isNotNull())
            .groupBy(F.col("tok").alias("a"), F.col("nxt").alias("b"))
            .agg(F.sum("freq").alias("pair_count"))
        )
        top = counts.orderBy(
            F.desc("pair_count"), F.asc("a"), F.asc("b")
        ).limit(1)
        tops.append(top)

        # Greedy-merge decisions computed entirely inside the word-keyed
        # window pipeline (no joins back onto the corpus-sized token
        # table): positions are dense, so a match chain is consecutive
        # positions with m=true; a chain starts where the previous
        # position had m=false; the running max of chain-start positions
        # gives each match its chain offset, and even offsets merge.
        running = wnd.rowsBetween(Window.unboundedPreceding, 0)
        tm = pairs.crossJoin(F.broadcast(top.select("a", "b")))
        merged = (
            tm.withColumn(
                "m", (F.col("tok") == F.col("a")) & (F.col("nxt") == F.col("b"))
            )
            .withColumn(
                "island_start",
                F.col("m") & ~F.lag("m", 1, False).over(wnd),
            )
            .withColumn(
                "last_start",
                F.max(F.when(F.col("island_start"), F.col("pos"))).over(running),
            )
            .withColumn(
                "is_start",
                F.col("m") & ((F.col("pos") - F.col("last_start")) % 2 == 0),
            )
            .withColumn("is_second", F.lag("is_start", 1, False).over(wnd))
            .where(~F.col("is_second"))
            .select(
                "word",
                "freq",
                "pos",
                F.when(F.col("is_start"), F.concat(F.col("a"), F.col("b")))
                .otherwise(F.col("tok"))
                .alias("tok"),
            )
        )
        toks = merged.select(
            "word",
            "freq",
            F.row_number().over(wnd).alias("pos"),
            "tok",
        )

    return tops, toks


@register(
    "bpe_encode_token_counts",
    oracle=_BPE_ENCODE_ORACLE,
    tags=("extension", "corpus", "tokenizer", "bpe"),
)
def bpe_encode_token_counts(spark, sf_dir):
    """BPE tokenizer APPLICATION: encode every document with the merges
    learned by :func:`bpe_train_merges` and report, per document, its
    whitespace word count and its post-merge BPE token count — the
    "how many tokens is this corpus" question every training-data budget
    starts with. Train and encode share one pipeline: the final merged
    token table (per distinct word) collapses to word -> n_tokens, and the
    corpus re-tokenized to (doc_id, word) joins against it.

    Scale: encoding adds exactly two exchanges on top of training — the
    word-hash shuffle of the (doc_id, word) relation for the join (the
    dictionary side is per-distinct-word, far smaller than the corpus) and
    the doc_id aggregate. Token counts are integers, so the oracle hash is
    exact."""
    _tops, toks = _bpe_pipeline(spark, sf_dir)
    enc = toks.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("n_toks"))
    d = read_table(spark, sf_dir, "documents")
    docw = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\r\f]+")).alias(
            "word"
        ),
    ).where(F.length("word") > 0)
    return (
        docw.join(enc, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_toks").cast("long").alias("n_bpe_tokens"),
        )
    )


# --- last-touch attribution ---------------------------------------------------------

_ATTR_LOOKBACK_DAYS = 7

_ATTR_ORACLE = f"""
WITH conv AS (
  SELECT event_id AS conv_id, user_id, ts, value
  FROM events WHERE event_type = 'purchase'
),
touch AS (
  SELECT user_id, event_id, event_type, ts
  FROM events WHERE event_type <> 'purchase'
),
cand AS (
  SELECT c.conv_id, c.value, t.event_type, t.ts, t.event_id
  FROM conv c
  JOIN touch t ON t.user_id = c.user_id
   AND t.ts < c.ts
   AND t.ts >= c.ts - INTERVAL {_ATTR_LOOKBACK_DAYS} DAY
),
last AS (
  SELECT conv_id, value, event_type
  FROM cand
  QUALIFY row_number() OVER (PARTITION BY conv_id
                             ORDER BY ts DESC, event_id DESC) = 1
),
att AS (
  SELECT event_type,
         cast(count(*) AS bigint) AS n_conversions,
         cast(round(sum(cast(value AS decimal(28,6))), 2) AS double)
           AS revenue
  FROM last GROUP BY event_type
),
direct AS (
  SELECT 'direct' AS event_type,
         cast(count(*) AS bigint) AS n_conversions,
         cast(round(sum(cast(value AS decimal(28,6))), 2) AS double)
           AS revenue
  FROM conv
  WHERE conv_id NOT IN (SELECT conv_id FROM last)
)
SELECT * FROM att UNION ALL SELECT * FROM direct
"""


@register(
    "attribution_last_touch",
    oracle=_ATTR_ORACLE,
    tags=("extension", "events", "attribution"),
)
def attribution_last_touch(spark, sf_dir):
    """Last-touch conversion attribution: each 'purchase' event (the
    conversion) is credited to the user's LAST non-purchase event in the
    preceding 7 days (ties to the higher event_id); conversions with no
    qualifying touch fall in the 'direct' bucket. Output per channel:
    conversion count and exact-decimal revenue (sum of purchase values).

    Scale shape: the candidate join is an equi-join on the user key with
    a range predicate - never a cross product; the per-conversion pick is
    a keyed window (partition by conversion id); the unattributed
    remainder is a left-anti join on the same key, not a NOT IN scan."""
    ev = read_table(spark, sf_dir, "events")
    conv = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        "value",
    )
    touch = ev.where(F.col("event_type") != "purchase").select(
        "user_id", "event_id", "event_type", "ts"
    )
    cand = conv.join(
        touch,
        (touch["user_id"] == conv["c_user"])
        & (touch["ts"] < conv["c_ts"])
        & (
            touch["ts"]
            >= conv["c_ts"] - F.expr(f"INTERVAL {_ATTR_LOOKBACK_DAYS} DAY")
        ),
    )
    w = Window.partitionBy("conv_id").orderBy(F.desc("ts"), F.desc("event_id"))
    last = (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("conv_id", "value", "event_type")
    )
    att = last.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        rounded_sum("value", 2).alias("revenue"),
    )
    direct = (
        conv.join(last.select("conv_id"), "conv_id", "left_anti")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            rounded_sum("value", 2).alias("revenue"),
        )
        .select(F.lit("direct").alias("event_type"), "n_conversions", "revenue")
    )
    return att.unionAll(direct)


# --- histogram quantile sketch ------------------------------------------------------

_QH_WIDTH = 2500.0
#: bucket-domain clamp: keeps the histogram (and its triangular CDF join)
#: bounded no matter how the value range drifts - the tail collapses into
#: the last bucket, exactly like a sketch's overflow bin. 4096 buckets x
#: 2500 covers >10M, far past any o_totalprice.
_QH_MAX_BUCKET = 4095
_QH_PS = (0.5, 0.9, 0.99)

_QSKETCH_ORACLE = f"""
WITH n AS (SELECT cast(count(*) AS bigint) AS n FROM orders),
hist AS (
  SELECT least(cast(floor(o_totalprice / {_QH_WIDTH!r}) AS bigint),
               {_QH_MAX_BUCKET}) AS bucket,
         cast(count(*) AS bigint) AS n_b
  FROM orders GROUP BY 1
),
cum AS (
  SELECT a.bucket, cast(sum(b.n_b) AS bigint) AS c
  FROM hist a JOIN hist b ON b.bucket <= a.bucket
  GROUP BY a.bucket
),
ps AS (SELECT unnest([{", ".join(repr(p) for p in _QH_PS)}]) AS p),
est AS (
  SELECT p, min(bucket) AS mb
  FROM ps, cum, n
  WHERE cum.c >= ceil(p * n.n)
  GROUP BY p
),
ex AS (
  SELECT
    {", ".join(
        f"floor(quantile_cont(cast(o_totalprice AS double), {p!r}) * 100 + 0.5)"
        f" / 100 AS ex_{int(p * 100)}"
        for p in _QH_PS
    )}
  FROM orders
)
SELECT p,
       (mb + 1) * {_QH_WIDTH!r} AS est_value,
       CASE {" ".join(
           f"WHEN p = {p!r} THEN ex_{int(p * 100)}" for p in _QH_PS
       )} END AS exact_value,
       floor(abs((mb + 1) * {_QH_WIDTH!r}
                 - CASE {" ".join(
                     f"WHEN p = {p!r} THEN ex_{int(p * 100)}" for p in _QH_PS
                 )} END)
             / CASE {" ".join(
                 f"WHEN p = {p!r} THEN ex_{int(p * 100)}" for p in _QH_PS
             )} END * 1000000 + 0.5) / 1000000 AS abs_err_pct
FROM est, ex
"""


@register(
    "quantile_histogram_sketch",
    oracle=_QSKETCH_ORACLE,
    tags=("extension", "sketch", "quantile"),
)
def quantile_histogram_sketch(spark, sf_dir):
    """Fixed-width histogram quantile sketch vs exact quantiles: bucket
    o_totalprice into 2500-wide bins, estimate p50/p90/p99 as the upper
    edge of the first bucket whose cumulative count reaches ceil(p*n), and
    report the error against the exact interpolated quantile. The
    histogram is the mergeable-partials scale path (per-partition maps of
    a few hundred int counters, map-side combined — the same reason
    engines ship percentile_approx); the exact side is the audit.

    The cumulative count is a triangular join over the BUCKET TABLE (a few
    hundred rows, broadcast) — never a partition-less window over the
    data, which is the unscalable way to write a CDF."""
    o = read_table(spark, sf_dir, "orders")
    n = o.agg(F.count(F.lit(1)).cast("long").alias("n"))
    hist = (
        o.select(
            F.least(
                F.floor(F.col("o_totalprice") / _QH_WIDTH).cast("long"),
                F.lit(_QH_MAX_BUCKET),
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    )
    cum = (
        hist.alias("a")
        .join(F.broadcast(hist.alias("b")), F.col("b.bucket") <= F.col("a.bucket"))
        .groupBy(F.col("a.bucket").alias("bucket"))
        .agg(F.sum("b.n_b").cast("long").alias("c"))
    )
    ps = spark.createDataFrame([(p,) for p in _QH_PS], "p double")
    est = (
        ps.crossJoin(F.broadcast(cum))
        .crossJoin(F.broadcast(n))
        .where(F.col("c") >= F.ceil(F.col("p") * F.col("n")))
        .groupBy("p")
        .agg(F.min("bucket").alias("mb"))
    )
    ex = o.agg(
        *[
            round_half_up(
                F.expr(f"percentile(o_totalprice, {p!r})"), 2
            ).alias(f"ex_{int(p * 100)}")
            for p in _QH_PS
        ]
    )
    exact = F.coalesce(
        *[
            F.when(F.col("p") == F.lit(p), F.col(f"ex_{int(p * 100)}"))
            for p in _QH_PS
        ]
    )
    est_value = (F.col("mb") + 1) * _QH_WIDTH
    return est.crossJoin(F.broadcast(ex)).select(
        "p",
        est_value.alias("est_value"),
        exact.alias("exact_value"),
        round_half_up(F.abs(est_value - exact) / exact, 6).alias("abs_err_pct"),
    )


# --- multi-touch (linear) attribution -----------------------------------------------

_MT_ATTR_ORACLE = f"""
WITH conv AS (
  SELECT event_id AS conv_id, user_id, ts, value
  FROM events WHERE event_type = 'purchase'
),
touch AS (
  SELECT user_id, event_type, ts FROM events WHERE event_type <> 'purchase'
),
cand AS (
  SELECT c.conv_id, c.value, t.event_type
  FROM conv c
  JOIN touch t ON t.user_id = c.user_id
   AND t.ts < c.ts
   AND t.ts >= c.ts - INTERVAL {_ATTR_LOOKBACK_DAYS} DAY
),
shares AS (
  SELECT conv_id, event_type,
         cast(count(*) AS bigint) AS n_touches_type,
         sum(cast(count(*) AS bigint))
           OVER (PARTITION BY conv_id) AS n_touches_total,
         any_value(value) AS value
  FROM cand GROUP BY conv_id, event_type
),
credited AS (
  SELECT event_type,
         -- exact decimal: value * touches_type / touches_total per
         -- conversion, quantized to 1e-6 BEFORE the cross-conversion sum
         sum(cast(floor(value * n_touches_type / n_touches_total
                        * 1000000 + 0.5) AS bigint)) AS rev_q,
         cast(count(*) AS bigint) AS n_conversions_touched
  FROM shares GROUP BY event_type
)
SELECT event_type, n_conversions_touched,
       floor(cast(rev_q AS double) / 1000000 * 100 + 0.5) / 100
         AS attributed_revenue
FROM credited
"""


@register(
    "attribution_linear_multi_touch",
    oracle=_MT_ATTR_ORACLE,
    tags=("extension", "events", "attribution"),
)
def attribution_linear_multi_touch(spark, sf_dir):
    """Linear multi-touch attribution - the complement of
    :func:`attribution_last_touch`: every non-purchase event touching a
    conversion inside the 7-day lookback shares the purchase value
    proportionally to its touch count, so channels that assist (rather
    than close) get credit. Per-conversion shares are quantized to 1e-6
    integers BEFORE the cross-conversion sum, keeping the corpus-wide
    aggregation order-free and the oracle comparison exact.

    Scale shape: same user-key equi-join + range predicate as last-touch;
    the share computation is a keyed aggregate + same-key window (one
    shuffle on the conversion id, reused); final channel rollup is
    map-side combined."""
    ev = read_table(spark, sf_dir, "events")
    conv = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        "value",
    )
    touch = ev.where(F.col("event_type") != "purchase").select(
        "user_id", "event_type", "ts"
    )
    cand = conv.join(
        touch,
        (touch["user_id"] == conv["c_user"])
        & (touch["ts"] < conv["c_ts"])
        & (
            touch["ts"]
            >= conv["c_ts"] - F.expr(f"INTERVAL {_ATTR_LOOKBACK_DAYS} DAY")
        ),
    )
    shares = cand.groupBy("conv_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_touches_type"),
        F.any_value("value").alias("value"),
    )
    w = Window.partitionBy("conv_id")
    shares = shares.withColumn(
        "n_touches_total", F.sum("n_touches_type").over(w)
    )
    rev_q = F.floor(
        F.col("value")
        * F.col("n_touches_type")
        / F.col("n_touches_total")
        * 1000000
        + 0.5
    ).cast("long")
    return (
        shares.select("event_type", rev_q.alias("rev_q"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_conversions_touched"),
            F.sum("rev_q").alias("rev_q"),
        )
        .select(
            "event_type",
            "n_conversions_touched",
            round_half_up(F.col("rev_q").cast("double") / 1000000, 2).alias(
                "attributed_revenue"
            ),
        )
    )


# --- quantile feature binning -------------------------------------------------------

_BIN_DECILES = [i / 10.0 for i in range(1, 10)]

_QBIN_ORACLE = f"""
WITH bounds AS (
  SELECT [{", ".join(
      f"quantile_cont(cast(o_totalprice AS double), {p!r})" for p in _BIN_DECILES
  )}] AS bs
  FROM orders
),
binned AS (
  SELECT o.o_totalprice,
         1 + len(list_filter(b.bs, x -> x <= o.o_totalprice)) AS decile
  FROM orders o, bounds b
)
SELECT decile,
       cast(count(*) AS bigint) AS n_orders,
       cast(round(sum(cast(o_totalprice AS decimal(28,6))), 2) AS double)
         AS sum_price
FROM binned GROUP BY decile
"""


@register(
    "feature_quantile_binning",
    oracle=_QBIN_ORACLE,
    tags=("extension", "corpus", "features", "binning"),
)
def feature_quantile_binning(spark, sf_dir):
    """Quantile binning, the ML feature transform: cut o_totalprice into
    deciles using exact interpolated quantile bounds, assign each row its
    bin with an in-row comparison fold against the broadcast 9-value
    bounds array, and report per-bin counts + exact-decimal sums. This is
    the scale-correct global binning shape: ONE tiny aggregate produces
    the bounds, rows never rank against each other (a global ntile needs
    a partition-less window — unusable at 100 TB), and the bin assignment
    is a map over the scan.

    Bound values are exact interpolated quantiles (parity proven by
    order_price_quantiles); boundary ties use <= on identical doubles in
    both engines."""
    o = read_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.array(
            *[
                F.expr(f"percentile(o_totalprice, {p!r})")
                for p in _BIN_DECILES
            ]
        ).alias("bs")
    )
    decile = (
        F.lit(1)
        + F.size(
            F.filter(F.col("bs"), lambda x: x <= F.col("o_totalprice"))
        )
    )
    return (
        o.select("o_totalprice")
        .crossJoin(F.broadcast(bounds))
        .select(decile.alias("decile"), "o_totalprice")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            rounded_sum("o_totalprice", 2).alias("sum_price"),
        )
    )


# --- hard-negative mining -----------------------------------------------------------

_HN_QUERIES = 20
_HN_K = 3

_HARD_NEG_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> cast(x AS double)) AS v
  FROM embeddings
),
n AS (
  SELECT vec_id, label, v,
         sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS nrm
  FROM e
),
scored AS (
  SELECT q.vec_id AS query_id, q.label AS query_label,
         c.vec_id AS negative_id, c.label AS negative_label,
         floor(list_aggregate(list_transform(list_zip(q.v, c.v),
                                             p -> p[1] * p[2]), 'sum')
               / (q.nrm * c.nrm) * 10000 + 0.5) / 10000 AS cosine
  FROM n q, n c
  WHERE q.vec_id < {_HN_QUERIES} AND q.label <> c.label
)
SELECT query_id, query_label, negative_id, negative_label, cosine
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, negative_id) AS rn
  FROM scored
) WHERE rn <= {_HN_K}
"""


@register(
    "hard_negative_mining",
    oracle=_HARD_NEG_ORACLE,
    tags=("extension", "similarity", "training", "contrastive"),
)
def hard_negative_mining(spark, sf_dir):
    """Hard-negative mining for contrastive training: for each query
    vector, the top-3 most-similar vectors with a DIFFERENT label — the
    near-misses that teach an embedding model its decision boundary
    (random negatives are trivially separable and carry no gradient).
    Same broadcast-query/corpus-scan shape as the brute-force kNN
    baseline, plus the label-mismatch predicate; at scale the candidate
    generation swaps to the LSH/IVF path with the same filter.

    Cosines use the fixed left-fold dot product (bit-identical to the
    oracle's list_aggregate) and are rounded before ranking with a
    deterministic id tie-break."""
    from ..operators.dedup import widen

    e = read_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    # per-row norm over the derived vector expression: collapse-safe fold
    nrm = F.sqrt(vec.fold_sum_sq(F.col("v")))
    n = e.select("vec_id", "label", "v", nrm.alias("nrm"))
    q = (
        n.where(F.col("vec_id") < _HN_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("query_label"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qnrm"),
        )
    )
    c = widen(n)
    dot = vec.fold_dot(F.col("qv"), F.col("v"))
    scored = (
        c.join(F.broadcast(q), F.col("query_label") != F.col("label"))
        .select(
            "query_id",
            "query_label",
            F.col("vec_id").alias("negative_id"),
            F.col("label").alias("negative_label"),
            round_half_up(dot / (F.col("qnrm") * F.col("nrm")), 4).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("negative_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _HN_K)
        .drop("rn")
    )


# --- connected components, two-phase (large-star / small-star) ----------------------

_CC2_SUPP_OFFSET = 1000000

_CC2_ORACLE = f"""
WITH RECURSIVE pairs AS (
  SELECT DISTINCT o.o_custkey AS cust,
         l.l_suppkey + {_CC2_SUPP_OFFSET} AS supp
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
sym AS (
  SELECT cust AS s, supp AS d FROM pairs
  UNION
  SELECT supp, cust FROM pairs
),
reach(node, target) AS (
  SELECT s, s FROM sym
  UNION
  SELECT r.node, y.d FROM reach r JOIN sym y ON y.s = r.target
)
SELECT node, min(target) AS cluster_rep
FROM reach GROUP BY node
"""


@register(
    "cc_trade_graph_two_phase",
    oracle=_CC2_ORACLE,
    tags=("extension", "graph", "iterative", "components"),
)
def cc_trade_graph_two_phase(spark, sf_dir):
    """Connected components of the customer-supplier trade graph via
    alternating large-star / small-star contractions
    (operators/dedup.py:connected_components_two_phase) — the O(log^2 n)
    algorithm that replaces O(diameter) min-label propagation at 100 TB
    (a transaction chain thousands of hops long costs label propagation
    thousands of rounds but star contraction ~20). Output: every graph
    node with its component representative (the component's minimum id),
    hash-checked against a recursive-CTE transitive closure.

    Two analytic pre-contractions before the generic loop (measured at
    sf0.1: the loop input shrinks ~403k -> ~26k edges and the query drops
    from ~6.9-7.5 s unseeded to ~3.5-4 s):

    1. Bipartite: supplier ids are offset ABOVE every customer id, so a
       supplier's first large-star neighborhood minimum is just its
       minimum customer minc(supp) — one aggregate; each edge
       (cust, supp) collapses to (cust, minc) plus the supplier pointer
       (supp, minc).
    2. Star-of-stars: each remaining node a keeps only its minimum
       neighbor m2(a) = min(b); every old edge (a, b) is replaced by
       (a, m2(a)) and (b, m2(a)). Both endpoints of every new edge are
       neighbors of a in the old graph (same component), and every old
       edge's endpoints stay connected through m2(a), so components are
       EXACTLY preserved; a still appears (via a -> m2(a), never
       self-looping since m2 < a) and b still appears (as a source or as
       someone's m2), so the node set — and therefore the output rows —
       are unchanged.

    Every edge form points strictly downward (m2 <= minc < cust < supp),
    so the symmetrized union inside the operator cannot produce
    duplicates and the initial dedup exchange stays skipped. The shared
    `pairs` relation is lineage-cut: it feeds minc AND the edge rewrite,
    and recomputing it would re-run the lineitem-orders join twice."""
    from ..operators.dedup import connected_components_two_phase

    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("o_custkey").alias("cust"),
            (F.col("l_suppkey") + _CC2_SUPP_OFFSET).alias("supp"),
        )
        .distinct()
        .transform(cut_lazy)
    )
    minc = pairs.groupBy("supp").agg(F.min("cust").alias("m"))
    seeded = (
        pairs.join(minc, "supp")
        .select(F.col("cust").alias("a"), F.col("m").alias("b"))
        .union(minc.select(F.col("supp").alias("a"), F.col("m").alias("b")))
        .where(F.col("a") != F.col("b"))
        .transform(cut_lazy)
    )
    m2 = seeded.groupBy("a").agg(F.min("b").alias("m2"))
    contracted = (
        seeded.join(m2, "a")
        .select(F.col("b").alias("a"), F.col("m2").alias("b"))
        .union(m2.select(F.col("a"), F.col("m2").alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    return connected_components_two_phase(
        contracted,
        src_col="a",
        dst_col="b",
        # contracted is .distinct() and every edge points strictly
        # downward (b < a), so the symmetrized union cannot contain
        # duplicates — the operator's initial dedup exchange stays skipped
        distinct_bipartite_input=True,
    ).select("node", "cluster_rep")


# --- co-purchase item-item similarity -----------------------------------------------

_COP_TOP_K = 3

_COPURCHASE_ORACLE = f"""
WITH op AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
),
co AS (
  SELECT a.pk AS part_a, b.pk AS part_b, cast(count(*) AS bigint) AS n_ab
  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY a.pk, b.pk
),
freq AS (
  SELECT pk, cast(count(*) AS bigint) AS n FROM op GROUP BY pk
),
scored AS (
  SELECT co.part_a, co.part_b, co.n_ab,
         floor(cast(co.n_ab AS double)
               / sqrt(cast(fa.n * fb.n AS double)) * 1000000 + 0.5) / 1000000
           AS cosine
  FROM co
  JOIN freq fa ON fa.pk = co.part_a
  JOIN freq fb ON fb.pk = co.part_b
)
SELECT part_a, part_b, n_ab, cosine
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY part_a ORDER BY cosine DESC, part_b) AS rn
  FROM scored
) WHERE rn <= {_COP_TOP_K}
"""


@register(
    "copurchase_item_similarity",
    oracle=_COPURCHASE_ORACLE,
    tags=("extension", "similarity", "recsys"),
)
def copurchase_item_similarity(spark, sf_dir):
    """Item-item co-purchase similarity (the classic recommender
    primitive): for every part, the top-3 parts most often bought in the
    same order, scored by cosine over co-occurrence counts
    n_ab / sqrt(n_a * n_b).

    Scale shape: the pair generation is a SELF-JOIN ON THE ORDER KEY,
    whose cost is sum over orders of (parts-per-order choose 2) — linear
    in orders because basket size is bounded (TPC-H: <= 7 lineitems), the
    property that makes co-occurrence mining feasible at 100 TB where an
    item-item cross join never is. Count aggregates are map-side combined;
    the per-item frequency table joins back keyed; top-k is a keyed
    window. All-integer counts until one double division and an
    IEEE-exact sqrt."""
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    a = li.alias("a")
    b = li.alias("b")
    co = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .groupBy(F.col("a.pk").alias("part_a"), F.col("b.pk").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    freq = li.groupBy(F.col("pk")).agg(F.count(F.lit(1)).alias("n"))
    fa = freq.select(F.col("pk").alias("part_a"), F.col("n").alias("n_a"))
    fb = freq.select(F.col("pk").alias("part_b"), F.col("n").alias("n_b"))
    scored = (
        co.join(fa, "part_a")
        .join(fb, "part_b")
        .select(
            "part_a",
            "part_b",
            "n_ab",
            round_half_up(
                F.col("n_ab").cast("double")
                / F.sqrt((F.col("n_a") * F.col("n_b")).cast("double")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("part_a").orderBy(F.desc("cosine"), F.asc("part_b"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _COP_TOP_K)
        .drop("rn")
    )


# --- time-decay attribution ---------------------------------------------------------

_TD_ATTR_ORACLE = f"""
WITH conv AS (
  SELECT event_id AS conv_id, user_id, ts, value
  FROM events WHERE event_type = 'purchase'
),
touch AS (
  SELECT user_id, event_type, ts FROM events WHERE event_type <> 'purchase'
),
cand AS (
  SELECT c.conv_id, c.value, t.event_type,
         (1 << (6 - least(cast((epoch_us(c.ts) - epoch_us(t.ts))
                               // 86400000000 AS bigint), 6))) AS iw
  FROM conv c
  JOIN touch t ON t.user_id = c.user_id
   AND t.ts < c.ts
   AND t.ts >= c.ts - INTERVAL {_ATTR_LOOKBACK_DAYS} DAY
),
shares AS (
  SELECT conv_id, event_type,
         cast(sum(iw) AS bigint) AS iw_type,
         sum(cast(sum(iw) AS bigint)) OVER (PARTITION BY conv_id) AS iw_total,
         any_value(value) AS value
  FROM cand GROUP BY conv_id, event_type
),
credited AS (
  SELECT event_type,
         sum(cast(floor(value * iw_type / iw_total * 1000000 + 0.5)
                  AS bigint)) AS rev_q,
         cast(count(*) AS bigint) AS n_conversions_touched
  FROM shares GROUP BY event_type
)
SELECT event_type, n_conversions_touched,
       floor(cast(rev_q AS double) / 1000000 * 100 + 0.5) / 100
         AS attributed_revenue
FROM credited
"""


@register(
    "attribution_time_decay",
    oracle=_TD_ATTR_ORACLE,
    tags=("extension", "events", "attribution"),
)
def attribution_time_decay(spark, sf_dir):
    """Time-decay attribution — the third classic model next to
    last-touch and linear: each touch's credit halves per day of age
    (weight 2^-age_days), so recent touches dominate without zeroing the
    assist channels. Halving per integer day is chosen deliberately: the
    weights are exact powers of two, so the integer weight 2^(6-age)
    (lookback 7 days -> age 0..6, clamped) makes every per-conversion
    share a ratio of exact integers — no libm pow() anywhere, and the
    1e-6 quantization before the cross-conversion sum keeps the rollup
    order-free, same as the linear model.

    Scale shape: identical to the other attribution queries — user-key
    equi-join with a range predicate, one conversion-id shuffle shared by
    the aggregate and the window, map-side-combined channel rollup."""
    ev = read_table(spark, sf_dir, "events")
    conv = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        "value",
    )
    touch = ev.where(F.col("event_type") != "purchase").select(
        "user_id", "event_type", "ts"
    )
    iw = F.expr(
        "cast(shiftleft(1, cast(6 - least((unix_micros(c_ts) - unix_micros(ts))"
        " div 86400000000, 6) AS int)) AS bigint)"
    )
    cand = conv.join(
        touch,
        (touch["user_id"] == conv["c_user"])
        & (touch["ts"] < conv["c_ts"])
        & (
            touch["ts"]
            >= conv["c_ts"] - F.expr(f"INTERVAL {_ATTR_LOOKBACK_DAYS} DAY")
        ),
    ).select("conv_id", "value", "event_type", iw.alias("iw"))
    shares = cand.groupBy("conv_id", "event_type").agg(
        F.sum("iw").alias("iw_type"),
        F.any_value("value").alias("value"),
    )
    w = Window.partitionBy("conv_id")
    shares = shares.withColumn("iw_total", F.sum("iw_type").over(w))
    rev_q = F.floor(
        F.col("value") * F.col("iw_type") / F.col("iw_total") * 1000000 + 0.5
    ).cast("long")
    return (
        shares.select("event_type", rev_q.alias("rev_q"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_conversions_touched"),
            F.sum("rev_q").alias("rev_q"),
        )
        .select(
            "event_type",
            "n_conversions_touched",
            round_half_up(F.col("rev_q").cast("double") / 1000000, 2).alias(
                "attributed_revenue"
            ),
        )
    )


# --- Shapley-value channel attribution ------------------------------------------------

# n=4 channels: Shapley coalition weights |S|!(n-|S|-1)!/n! in 24ths,
# keyed by |S| (the coalition WITHOUT the channel, so |S| = 0..3).
_SHAP_W24 = {0: 6, 1: 2, 2: 2, 3: 6}
_SHAP_W24_CASE = "CASE pc WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END"

_SHAPLEY_ORACLE = f"""
WITH conv AS (
  SELECT event_id AS conv_id, user_id, ts
  FROM events WHERE event_type = 'purchase'
),
touch AS (
  SELECT user_id, event_type, ts FROM events WHERE event_type <> 'purchase'
),
coal AS (
  SELECT c.conv_id,
         cast(max(CASE WHEN t.event_type = 'click' THEN 1 ELSE 0 END)
              + 2 * max(CASE WHEN t.event_type = 'error' THEN 1 ELSE 0 END)
              + 4 * max(CASE WHEN t.event_type = 'signup' THEN 1 ELSE 0 END)
              + 8 * max(CASE WHEN t.event_type = 'view' THEN 1 ELSE 0 END)
              AS bigint) AS mask
  FROM conv c
  JOIN touch t ON t.user_id = c.user_id
   AND t.ts < c.ts
   AND t.ts >= c.ts - INTERVAL {_ATTR_LOOKBACK_DAYS} DAY
  GROUP BY c.conv_id
),
counts AS (SELECT mask, cast(count(*) AS bigint) AS c FROM coal GROUP BY mask),
masks AS (SELECT cast(unnest(range(0, 16)) AS bigint) AS s),
zeta AS (
  SELECT m.s, cast(sum(coalesce(k.c, 0)) AS bigint) AS v
  FROM masks m LEFT JOIN counts k ON (k.mask & m.s) = k.mask
  GROUP BY m.s
),
ch AS (SELECT * FROM (VALUES (1, 'click'), (2, 'error'), (4, 'signup'), (8, 'view'))
       AS t(bit, channel)),
pairs AS (
  SELECT ch.channel, z.s, z.v AS v_s, z2.v AS v_si,
         ((z.s & 1) + ((z.s >> 1) & 1) + ((z.s >> 2) & 1) + ((z.s >> 3) & 1)) AS pc
  FROM ch
  JOIN zeta z ON (z.s & ch.bit) = 0
  JOIN zeta z2 ON z2.s = z.s + ch.bit
),
tot AS (SELECT v AS v_all FROM zeta WHERE s = 15)
SELECT p.channel,
       cast(sum(({_SHAP_W24_CASE}) * (v_si - v_s)) AS bigint) AS phi24,
       cast(sum(({_SHAP_W24_CASE}) * (v_si - v_s)) AS bigint) / 24.0
         AS shapley_conversions,
       t.v_all AS attributed_conversions
FROM pairs p, tot t
GROUP BY p.channel, t.v_all
"""


@register(
    "attribution_shapley",
    oracle=_SHAPLEY_ORACLE,
    tags=("extension", "events", "attribution", "shapley"),
)
def attribution_shapley(spark, sf_dir):
    """Shapley-value channel attribution (Shapley 1953; data-driven
    marketing form as in Zhao et al. 2018): each conversion's coalition
    is the SET of channels touched in its 7-day lookback (same window
    as the other attribution queries); the coalition worth v(S) is the
    number of conversions reachable with channels in S (the subset-sum
    zeta transform of the exact-coalition counts); each channel gets
    its exact 4-player Shapley value sum_S w(|S|)(v(S+i) - v(S)).
    Unlike last-touch/linear/time-decay, this is the only allocation
    that is symmetric, efficient (the values sum to v(all)) and
    marginal — the game-theoretic gold standard.

    Exactness: v is integer counts; the 24ths Shapley weights are
    integers; phi stays int64 until one final division by 24.0.

    Scale: the fact-sized work is the conversion-touch interval join
    and one conversion-keyed aggregate (both shared with the other
    attribution queries); everything after runs on a 16-row coalition
    lattice (2^n is fine because n = distinct channel TYPES, not
    users)."""
    ev = read_table(spark, sf_dir, "events")
    conv = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"), F.col("user_id"), F.col("ts").alias("c_ts")
    )
    touch = ev.where(F.col("event_type") != "purchase").select(
        "user_id", "event_type", "ts"
    )
    cand = conv.join(touch, "user_id").where(
        (F.col("ts") < F.col("c_ts"))
        & (F.col("ts") >= F.col("c_ts") - F.expr(f"INTERVAL {_ATTR_LOOKBACK_DAYS} DAY"))
    )
    hit = lambda t: F.max(F.when(F.col("event_type") == t, 1).otherwise(0))  # noqa: E731
    coal = cand.groupBy("conv_id").agg(
        (hit("click") + 2 * hit("error") + 4 * hit("signup") + 8 * hit("view"))
        .cast("long")
        .alias("mask")
    )
    counts = coal.groupBy("mask").agg(F.count(F.lit(1)).alias("c"))
    masks = spark.range(16).select(F.col("id").alias("s"))
    zeta = (
        masks.join(
            F.broadcast(counts), counts["mask"].bitwiseAND(masks["s"]) == counts["mask"], "left"
        )
        .groupBy("s")
        .agg(F.sum(F.coalesce(F.col("c"), F.lit(0))).alias("v"))
    )
    ch = spark.createDataFrame(
        [(1, "click"), (2, "error"), (4, "signup"), (8, "view")], "bit long, channel string"
    )
    z2 = zeta.select(F.col("s").alias("s2"), F.col("v").alias("v_si"))
    pairs = (
        ch.join(F.broadcast(zeta), zeta["s"].bitwiseAND(ch["bit"]) == 0)
        .join(F.broadcast(z2), F.col("s2") == F.col("s") + F.col("bit"))
        .select(
            "channel",
            "s",
            F.col("v").alias("v_s"),
            "v_si",
            (
                F.col("s").bitwiseAND(F.lit(1))
                + F.shiftright("s", 1).bitwiseAND(F.lit(1))
                + F.shiftright("s", 2).bitwiseAND(F.lit(1))
                + F.shiftright("s", 3).bitwiseAND(F.lit(1))
            ).alias("pc"),
        )
    )
    w24 = (
        F.when(F.col("pc") == 0, 6)
        .when(F.col("pc") == 1, 2)
        .when(F.col("pc") == 2, 2)
        .otherwise(6)
    )
    tot = zeta.where(F.col("s") == 15).select(F.col("v").alias("v_all"))
    return (
        pairs.crossJoin(F.broadcast(tot))
        .groupBy("channel", "v_all")
        .agg(F.sum(w24 * (F.col("v_si") - F.col("v_s"))).alias("phi24"))
        .select(
            "channel",
            "phi24",
            (F.col("phi24") / 24.0).alias("shapley_conversions"),
            F.col("v_all").alias("attributed_conversions"),
        )
    )


# --- association rules (market-basket) ------------------------------------------------

_AR_MINSUP = 3  # minimum co-occurrence count for a rule
_AR_TOPK = 20

_ASSOC_ORACLE = f"""
WITH op AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
),
n AS (SELECT cast(count(DISTINCT ok) AS bigint) AS n_orders FROM op),
freq AS (SELECT pk, cast(count(*) AS bigint) AS n FROM op GROUP BY pk),
co AS (
  SELECT a.pk AS pa, b.pk AS pb, cast(count(*) AS bigint) AS n_ab
  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY a.pk, b.pk
  HAVING count(*) >= {_AR_MINSUP}
),
rules AS (
  SELECT pa AS antecedent, pb AS consequent, n_ab, fa.n AS n_a, fb.n AS n_b
  FROM co JOIN freq fa ON fa.pk = co.pa JOIN freq fb ON fb.pk = co.pb
  UNION ALL
  SELECT pb, pa, n_ab, fb.n, fa.n
  FROM co JOIN freq fa ON fa.pk = co.pa JOIN freq fb ON fb.pk = co.pb
),
scored AS (
  SELECT antecedent, consequent, n_ab, n_a, n_b,
         cast(floor(cast(n_ab AS double) / n_a * 1000000 + 0.5) AS bigint) AS conf_q,
         cast(floor(cast(n.n_orders AS double) * n_ab / (n_a * n_b) * 1000000 + 0.5)
              AS bigint) AS lift_q
  FROM rules, n
)
SELECT antecedent, consequent, n_ab,
       cast(conf_q AS double) / 1000000 AS confidence,
       cast(lift_q AS double) / 1000000 AS lift
FROM (
  SELECT *, row_number() OVER (
    ORDER BY lift_q DESC, conf_q DESC, antecedent, consequent) AS rn
  FROM scored
) WHERE rn <= {_AR_TOPK}
"""


@register(
    "association_rules_pairs",
    oracle=_ASSOC_ORACLE,
    tags=("extension", "recsys", "association"),
)
def association_rules_pairs(spark, sf_dir):
    """Pairwise association rules (Agrawal & Srikant 1994, the 2-itemset
    core of Apriori): antecedent -> consequent with support count,
    confidence supp(ab)/supp(a) and lift N*supp(ab)/(supp(a)*supp(b));
    both directions of each frequent pair, global top-20 by lift.

    Plan: the pair generator is the per-order self-join — bounded by
    basket size (max ~13 items/order here and in any real register
    data), NOT corpus size, so candidate volume is sum_orders k^2 — the
    classic market-basket plan that scales linearly in orders. The
    minimum-support HAVING prunes before the frequency joins; item
    frequencies are dimension-sized and broadcast; the global top-k is
    orderBy().limit() (TakeOrderedAndProject).

    Exactness: all counts exact int64; confidence and lift quantized to
    1e-6 with identical double expressions before ranking."""
    li = read_table(spark, sf_dir, "lineitem")
    # one distinct-basket shuffle, reused by all four consumers (total
    # count, item frequencies, both sides of the pair join) instead of
    # four recomputations of the same distinct()
    op = (
        li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
        .transform(cut_lazy)
    )
    n = op.agg(F.countDistinct("ok").alias("n_orders"))
    freq = op.groupBy("pk").agg(F.count(F.lit(1)).alias("n"))
    b = op.select(F.col("ok"), F.col("pk").alias("pk2"))
    co = (
        op.join(b, "ok")
        .where(F.col("pk") < F.col("pk2"))
        .groupBy(F.col("pk").alias("pa"), F.col("pk2").alias("pb"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= _AR_MINSUP)
    )
    fa = freq.select(F.col("pk").alias("pa"), F.col("n").alias("n_a"))
    fb = freq.select(F.col("pk").alias("pb"), F.col("n").alias("n_b"))
    joined = co.join(F.broadcast(fa), "pa").join(F.broadcast(fb), "pb")
    fwd = joined.select(
        F.col("pa").alias("antecedent"),
        F.col("pb").alias("consequent"),
        "n_ab",
        "n_a",
        "n_b",
    )
    rev = joined.select(
        F.col("pb").alias("antecedent"),
        F.col("pa").alias("consequent"),
        "n_ab",
        F.col("n_b").alias("n_a"),
        F.col("n_a").alias("n_b"),
    )
    rules = fwd.unionByName(rev).crossJoin(F.broadcast(n))
    conf_q = F.floor(
        F.col("n_ab").cast("double") / F.col("n_a") * 1000000 + 0.5
    ).cast("long")
    lift_q = F.floor(
        F.col("n_orders").cast("double") * F.col("n_ab") / (F.col("n_a") * F.col("n_b"))
        * 1000000
        + 0.5
    ).cast("long")
    scored = rules.select(
        "antecedent",
        "consequent",
        "n_ab",
        conf_q.alias("conf_q"),
        lift_q.alias("lift_q"),
    )
    return (
        scored.orderBy(
            F.desc("lift_q"), F.desc("conf_q"), F.asc("antecedent"), F.asc("consequent")
        )
        .limit(_AR_TOPK)
        .select(
            "antecedent",
            "consequent",
            "n_ab",
            (F.col("conf_q").cast("double") / 1000000).alias("confidence"),
            (F.col("lift_q").cast("double") / 1000000).alias("lift"),
        )
    )
