"""Round-5 second-wave metric operators — cross-domain analytics shapes
the registry didn't cover yet (no reference citation: SURVEY.md section 2
extension surface, designed Spark-first):

- ``ohlc_hourly_bars``: the market-data bar aggregation (open/high/low/
  close) via ``min_by``/``max_by`` on a deterministic composite order key —
  one hash aggregate, no window, no shuffle beyond the groupBy.
- ``degree_assortativity``: Newman (2002) degree assortativity of the
  customer-supplier trade graph from exact integer moment sums.
- ``tokenizer_fertility_by_lang``: bytes-per-token / tokens-per-doc by
  language — the tokenizer-budget diagnostic every multilingual LLM corpus
  is balanced with (fertility in the sense of SentencePiece reports).
- ``forecast_backtest_mase``: naive vs drift one-step backtest with MASE
  (Hyndman & Koehler 2006) on the monthly revenue spine.
- ``bayes_ab_posterior``: Beta-Binomial posterior summary of the A/B arms
  (posterior mean/sd per arm + normal-approximation P(B>A) significance).
- ``lsh_band_load_report``: per-band bucket-load histogram of the MinHash
  LSH banding — the capacity-planning diagnostic that says how many
  candidate pairs the band join will generate and whether the hot-bucket
  guard is binding, BEFORE running the join.
- ``price_elasticity_by_brand``: grouped log-log OLS (quantity on unit
  price) per part brand — grouped regression from quantized-log integer
  moments.
- ``blocking_quality_report``: reduction ratio / block-size audit of three
  candidate blocking keys for record linkage — the planning step before
  ``record_linkage_fs`` commits to a blocking strategy.

Float discipline (repo convention): every engine-order-sensitive float is
derived from exact integer moment sums with an identical expression shape
in Spark and DuckDB, then quantized with the floor-form round; moment
products that pass int64 run in decimal(38,0) (hugeint in the oracle).

Scale notes per operator are in the docstrings; none of these plans has a
cartesian product, a partition-less window, or a driver-side collect.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import vec
from ..functions.numeric import count_if, project_fence, round_half_up
from ..operators.dedup import (
    LSH_MAX_BUCKET,
    doc_shingle_hash_sets,
    doc_shingles,
    lsh_banded,
    minhash_signature,
    token_hash,
    token_hash_sql,
)
from ..sources.lake import read_table
from . import register
from .ext_dedup import _minhash_oracle, dedup_minhash_lsh, minhash_bands_sql_ctes
from .ext_text import _QC_ORACLE, quality_classifier_score
from ..operators.checkpointing import cut_eager, cut_lazy

# --- OHLC hourly bars ---------------------------------------------------------------

# open/close tie-break: the composite (epoch_us, event_id) order key encoded
# as a fixed-width string so DuckDB's arg_min (scalar keys only) and Spark's
# min_by compare identically; event_id is unique so the key is total.
# The epoch is biased by +1e18 before padding so pre-1970 timestamps
# (negative epoch) still zero-pad into a lexicographically ordered field —
# an unbiased negative epoch would put '-' inside the padded digits and
# invert the ordering. The bias guarantees a positive, fixed-width key for
# epochs in (-1e18, +8.2e18) us — roughly years -29700 to 33650, far past
# any realistic event time; outside that window the key would go negative
# (mis-sorting) or overflow int64.
_OHLC_EPOCH_BIAS = 10**18
_OHLC_KEY_SQL = (
    f"lpad(cast(epoch_us(ts) + {_OHLC_EPOCH_BIAS} AS varchar), 20, '0') || '_' || "
    "lpad(cast(event_id AS varchar), 12, '0')"
)


@register(
    "ohlc_hourly_bars",
    oracle=f"""
WITH e AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         cast(floor(value * 100 + 0.5) AS bigint) AS cents,
         {_OHLC_KEY_SQL} AS k
  FROM events WHERE value IS NOT NULL
)
SELECT event_type, hr,
       arg_min(cents, k) AS open_cents,
       cast(max(cents) AS bigint) AS high_cents,
       cast(min(cents) AS bigint) AS low_cents,
       arg_max(cents, k) AS close_cents,
       cast(count(*) AS bigint) AS n_events,
       cast(sum(cents) AS bigint) AS volume_cents
FROM e GROUP BY event_type, hr
""",
    tags=("extension", "events", "timeseries"),
)
def ohlc_hourly_bars(spark, sf_dir):
    """OHLC bar aggregation per (event_type, hour) — the time-series
    downsampling primitive of every market-data / metrics pipeline. Open
    and close are ``min_by``/``max_by`` on a deterministic composite
    (epoch_us, event_id) key (fixed-width string so both engines compare
    lexicographically; never ``first()``, whose result is
    partition-order-dependent). Values quantize to int64 cents before the
    aggregate, so min/max/sum are exact and the quantization is monotone.

    Scale: one hash aggregate keyed on (event_type, hour) — map-side
    combined, time-bucketed keys are unskewed by construction, and the
    plan is a single exchange at any data volume."""
    ev = read_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    k = F.concat(
        F.lpad(
            (F.unix_micros("ts") + F.lit(_OHLC_EPOCH_BIAS)).cast("string"), 20, "0"
        ),
        F.lit("_"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    e = ev.select(
        "event_type",
        F.date_trunc("hour", "ts").alias("hr"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        k.alias("k"),
    )
    return e.groupBy("event_type", "hr").agg(
        F.min_by("cents", "k").alias("open_cents"),
        F.max("cents").alias("high_cents"),
        F.min("cents").alias("low_cents"),
        F.max_by("cents", "k").alias("close_cents"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").alias("volume_cents"),
    )


# --- degree assortativity of the trade graph ----------------------------------------


@register(
    "degree_assortativity",
    oracle="""
WITH pairs AS (
  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
dc AS (SELECT cust, cast(count(*) AS bigint) AS d FROM pairs GROUP BY cust),
ds AS (SELECT supp, cast(count(*) AS bigint) AS d FROM pairs GROUP BY supp),
j AS (
  SELECT dc.d AS x, ds.d AS y FROM pairs p
  JOIN dc ON dc.cust = p.cust
  JOIN ds ON ds.supp = p.supp
),
m AS (
  -- hugeint moments: 4*E*Scs passes int64 well before bench scale
  SELECT cast(count(*) AS hugeint) AS e,
         cast(sum(x) AS hugeint) AS sc1,
         cast(sum(y) AS hugeint) AS ss1,
         cast(sum(x * y) AS hugeint) AS scs,
         cast(sum(x * x) AS hugeint) AS sc2,
         cast(sum(y * y) AS hugeint) AS ss2
  FROM j
),
cnt AS (
  SELECT cast(count(DISTINCT cust) AS bigint) AS n_cust,
         cast(count(DISTINCT supp) AS bigint) AS n_supp
  FROM pairs
)
SELECT cast(m.e AS bigint) AS n_edges, cnt.n_cust, cnt.n_supp,
       floor(cast(4 * m.e * m.scs - (m.sc1 + m.ss1) * (m.sc1 + m.ss1) AS double)
             / cast(2 * m.e * (m.sc2 + m.ss2)
                    - (m.sc1 + m.ss1) * (m.sc1 + m.ss1) AS double)
             * 1000000 + 0.5) / 1000000 AS assortativity
FROM m, cnt
""",
    tags=("extension", "graph", "statistics"),
)
def degree_assortativity(spark, sf_dir):
    """Degree assortativity (Newman 2002) of the undirected bipartite
    customer-supplier trade graph: the Pearson correlation of endpoint
    degrees over the directed edge list. Because every undirected edge
    contributes both orientations, the correlation reduces to closed form
    over single-orientation sums (n = 2E, sx = sy = S1c + S1s,
    sxy = 2*Scs, sxx = syy = S2c + S2s) — so the moments are one aggregate
    over the pair list joined to the two degree tables. Whole-degree
    integers; moment products run in decimal(38,0) (hugeint in the
    oracle); only the final ratio is a double, floor-quantized to 1e-6.

    Scale: the pair distinct and the two degree aggregates hash-partition
    on node keys; the degree joins are standard key equi-joins (AQE
    handles hub skew). No iteration, no window, no cartesian."""

    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem")
    # lineage-cut: the pair list feeds both degree aggregates and the moment
    # join — without it the orders-lineitem join runs three times
    pairs = (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .select(F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp"))
        .distinct()
        .transform(cut_lazy)
    )
    dc = pairs.groupBy("cust").agg(F.count(F.lit(1)).alias("x"))
    ds = pairs.groupBy("supp").agg(F.count(F.lit(1)).alias("y"))
    j = pairs.join(dc, "cust").join(ds, "supp")
    dec = lambda c: F.sum(c.cast("decimal(38,0)"))  # noqa: E731
    m = j.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("e"),
        F.count_distinct(F.col("cust")).alias("n_cust"),
        F.count_distinct(F.col("supp")).alias("n_supp"),
        dec(F.col("x")).alias("sc1"),
        dec(F.col("y")).alias("ss1"),
        dec(F.col("x") * F.col("y")).alias("scs"),
        dec(F.col("x") * F.col("x")).alias("sc2"),
        dec(F.col("y") * F.col("y")).alias("ss2"),
    )
    sx = F.col("sc1") + F.col("ss1")
    num = (4 * F.col("e") * F.col("scs") - sx * sx).cast("double")
    den = (2 * F.col("e") * (F.col("sc2") + F.col("ss2")) - sx * sx).cast("double")
    return m.select(
        F.col("e").cast("long").alias("n_edges"),
        "n_cust",
        "n_supp",
        round_half_up(num / den, 6).alias("assortativity"),
    )


# --- tokenizer fertility by language ------------------------------------------------


@register(
    "tokenizer_fertility_by_lang",
    oracle="""
WITH d AS (
  SELECT lang,
         cast(strlen(text) AS bigint) AS nb,
         cast(len(string_split_regex(trim(text), '[ \\t\\n\\r\\f]+')) AS bigint) AS nws,
         cast(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS bigint) AS nw
  FROM documents
)
SELECT lang,
       cast(count(*) AS bigint) AS n_docs,
       cast(sum(nb) AS bigint) AS n_bytes,
       cast(sum(nws) AS bigint) AS n_ws_tokens,
       cast(sum(nw) AS bigint) AS n_word_tokens,
       floor(cast(sum(nb) AS double) / sum(nw) * 10000 + 0.5) / 10000
         AS bytes_per_token,
       floor(cast(sum(nw) AS double) / count(*) * 10000 + 0.5) / 10000
         AS tokens_per_doc
FROM d GROUP BY lang
""",
    tags=("extension", "text", "llm"),
)
def tokenizer_fertility_by_lang(spark, sf_dir):
    """Tokenizer fertility per language: UTF-8 bytes per word token and
    tokens per document — the corpus-budget diagnostic multilingual LLM
    pipelines balance sampling weights with (a language with high
    bytes-per-token is under-served by the tokenizer and over-billed per
    unit of text). Uses the repo's standard whitespace and ``[a-z0-9]+``
    word tokenizers (identical regex class in both engines) and byte
    lengths (``octet_length`` / ``strlen``), so every sum is an exact
    int64 and only the two final ratios are quantized doubles.

    Scale: in-row token counting (zero shuffle), one tiny per-language
    aggregate — linear in executors at any corpus size."""
    d = read_table(spark, sf_dir, "documents")
    rows = d.select(
        "lang",
        F.octet_length("text").cast("long").alias("nb"),
        F.size(F.split(F.trim(F.col("text")), r"[ \t\n\r\f]+"))
        .cast("long")
        .alias("nws"),
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), F.lit(0))
        )
        .cast("long")
        .alias("nw"),
    )
    return rows.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nb").alias("n_bytes"),
        F.sum("nws").alias("n_ws_tokens"),
        F.sum("nw").alias("n_word_tokens"),
        round_half_up(F.sum("nb").cast("double") / F.sum("nw"), 4).alias(
            "bytes_per_token"
        ),
        round_half_up(F.sum("nw").cast("double") / F.count(F.lit(1)), 4).alias(
            "tokens_per_doc"
        ),
    )


# --- naive vs drift forecast backtest with MASE -------------------------------------


@register(
    "forecast_backtest_mase",
    oracle="""
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         cast(floor(cast(sum(cast(floor(o_totalprice * 100 + 0.5) AS bigint))
                         AS double) / 100000.0) AS bigint) AS x
  FROM orders GROUP BY 1
),
lo AS (SELECT min(m) AS m0 FROM monthly),
idxd AS (
  SELECT cast(datediff('month', lo.m0, monthly.m) AS bigint) + 1 AS idx, x
  FROM monthly, lo
),
x1 AS (SELECT x AS xf FROM idxd WHERE idx = 1),
e AS (
  SELECT c.idx, c.x, p.x AS xp, x1.xf,
         abs(c.x - p.x) AS ae_n,
         CASE WHEN c.idx >= 3 THEN
           cast(floor(abs(c.x - (p.x + cast(p.x - x1.xf AS double) / (c.idx - 2)))
                      * 1000000 + 0.5) AS bigint)
         ELSE 0 END AS ae_d_q
  FROM idxd c JOIN idxd p ON p.idx = c.idx - 1, x1
),
agg AS (
  SELECT cast(count(*) AS bigint) AS cn,
         cast(sum(ae_n) AS bigint) AS san,
         cast(sum(CASE WHEN idx >= 3 THEN 1 ELSE 0 END) AS bigint) AS cd,
         cast(sum(ae_d_q) AS bigint) AS sad
  FROM e
),
n AS (SELECT cast(count(*) AS bigint) AS n_months FROM idxd)
SELECT n.n_months,
       floor(cast(san AS double) / cn * 1000 + 0.5) / 1000 AS mae_naive,
       floor(cast(sad AS double) / cd / 1000000.0 * 1000 + 0.5) / 1000 AS mae_drift,
       floor((cast(sad AS double) / cd / 1000000.0)
             / (cast(san AS double) / cn) * 1000000 + 0.5) / 1000000 AS mase_drift
FROM agg, n
""",
    tags=("extension", "timeseries", "forecast"),
)
def forecast_backtest_mase(spark, sf_dir):
    """One-step in-sample backtest of the two canonical baseline
    forecasters on the monthly revenue spine — naive (x_{t-1}) and drift
    (x_{t-1} + (x_{t-1}-x_1)/(t-2), Hyndman's drift method) — reported as
    MAE each plus MASE (Hyndman & Koehler 2006): drift MAE scaled by the
    in-sample naive MAE. MASE < 1 means the drift line beats persistence;
    it is THE scale-free skill score a forecast (ses_backtest_monthly)
    must clear before anyone trusts it. Naive absolute errors are exact
    int64; drift errors are 1e-6-quantized before summing so the fold is
    order-free.

    Scale: the fact table reduces to one monthly aggregate; everything
    after runs on the T-row month spine (self-join on idx-1 and a
    broadcast of x_1) — negligible at any data volume, no window."""
    o = read_table(spark, sf_dir, "orders")
    # localCheckpoint: the T-row month spine feeds four frames (current,
    # previous, x_1, count) — materialize the fact aggregate ONCE so the
    # orders scan never repeats (same idiom as zipf_fit_tokens).
    monthly = (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("m"))
        .agg(
            F.floor(
                F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")).cast(
                    "double"
                )
                / 100000.0
            )
            .cast("long")
            .alias("x")
        )
        .transform(cut_eager)
    )
    lo = monthly.agg(F.min("m").alias("m0"))
    idxd = monthly.crossJoin(F.broadcast(lo)).select(
        (F.months_between(F.col("m"), F.col("m0")).cast("long") + 1).alias("idx"),
        "x",
    )
    x1 = idxd.where(F.col("idx") == 1).select(F.col("x").alias("xf"))
    c = idxd.alias("c")
    p = idxd.select((F.col("idx") + 1).alias("idx"), F.col("x").alias("xp"))
    e = (
        c.join(F.broadcast(p), "idx")
        .crossJoin(F.broadcast(x1))
        .select(
            "idx",
            F.abs(F.col("x") - F.col("xp")).alias("ae_n"),
            F.when(
                F.col("idx") >= 3,
                F.floor(
                    F.abs(
                        F.col("x")
                        - (
                            F.col("xp")
                            + (F.col("xp") - F.col("xf")).cast("double")
                            / (F.col("idx") - 2)
                        )
                    )
                    * 1000000
                    + 0.5
                ).cast("long"),
            )
            .otherwise(F.lit(0))
            .alias("ae_d_q"),
        )
    )
    agg = e.agg(
        F.count(F.lit(1)).alias("cn"),
        F.sum("ae_n").alias("san"),
        count_if(F.col("idx") >= 3).alias("cd"),
        F.sum("ae_d_q").alias("sad"),
    )
    n = idxd.agg(F.count(F.lit(1)).alias("n_months"))
    mae_n = F.col("san").cast("double") / F.col("cn")
    mae_d = F.col("sad").cast("double") / F.col("cd") / 1000000.0
    return agg.crossJoin(F.broadcast(n)).select(
        "n_months",
        round_half_up(mae_n, 3).alias("mae_naive"),
        round_half_up(mae_d, 3).alias("mae_drift"),
        round_half_up(mae_d / mae_n, 6).alias("mase_drift"),
    )


# --- Bayesian A/B posterior summary -------------------------------------------------

_BAYES_SALT = "bayes1"
_Z95_1S = 1.644854  # one-sided 5% normal quantile, published constant

_BAYES_ORACLE = f"""
WITH per_user AS (
  SELECT user_id,
         {token_hash_sql(f"'{_BAYES_SALT}|' || cast(user_id AS varchar)")} % 2 AS arm,
         CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * 5
                   > count(*) THEN 1 ELSE 0 END AS converted
  FROM events GROUP BY user_id
),
counts AS (
  SELECT cast(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS bigint) AS n_a,
         cast(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS bigint) AS c_a,
         cast(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS bigint) AS n_b,
         cast(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS bigint) AS c_b
  FROM per_user
),
post AS (
  SELECT n_a, c_a, n_b, c_b,
         cast(1 + c_a AS double) / (2 + n_a) AS ma,
         cast(1 + c_b AS double) / (2 + n_b) AS mb,
         cast(1 + c_a AS double) * (1 + n_a - c_a)
           / (cast(2 + n_a AS double) * (2 + n_a) * (3 + n_a)) AS va,
         cast(1 + c_b AS double) * (1 + n_b - c_b)
           / (cast(2 + n_b AS double) * (2 + n_b) * (3 + n_b)) AS vb
  FROM counts
)
SELECT n_a, c_a, n_b, c_b,
       floor(ma * 1000000 + 0.5) / 1000000 AS post_mean_a,
       floor(mb * 1000000 + 0.5) / 1000000 AS post_mean_b,
       floor(sqrt(va) * 100000000 + 0.5) / 100000000 AS post_sd_a,
       floor(sqrt(vb) * 100000000 + 0.5) / 100000000 AS post_sd_b,
       floor((mb - ma) / sqrt(va + vb) * 10000 + 0.5) / 10000 AS z_ab,
       (mb - ma) / sqrt(va + vb) > {_Z95_1S!r} AS b_beats_a_95
FROM post
"""


@register(
    "bayes_ab_posterior",
    oracle=_BAYES_ORACLE,
    tags=("extension", "training", "experimentation", "bayesian"),
)
def bayes_ab_posterior(spark, sf_dir):
    """Beta-Binomial Bayesian read of the A/B arms (uniform Beta(1,1)
    prior): per-arm posterior mean (c+1)/(n+2) and posterior sd from the
    exact Beta variance a*b/((a+b)^2 (a+b+1)), plus the normal-
    approximation z of the posterior difference and the one-sided-95%
    "B beats A" flag — the decision summary a Bayesian experimentation
    stack reports next to the frequentist z-test (ab_uplift_ztest, same
    conversion metric, independent salt). Every input to the float
    expressions is an exact int64 count, and both engines evaluate the
    identical expression tree; posterior moments quantize at 1e-6/1e-8.
    The double-precision bound: the variance denominator reaches 2^53 only
    past n ~ 2e5 users per arm at which point the posterior is a point
    mass and a production report switches to the z-test anyway.

    Scale: one user-keyed conditional aggregate (the same single-shuffle
    shape as ab_uplift_ztest) and a 1-row reduction."""
    ev = read_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        count_if(F.col("event_type") == "purchase").alias("n_purch"),
        F.count(F.lit(1)).alias("n_ev"),
    )
    arm = (
        token_hash(
            F.concat(F.lit(f"{_BAYES_SALT}|"), F.col("user_id").cast("string"))
        )
        % 2
    ).alias("arm")
    conv = (F.col("n_purch") * 5 > F.col("n_ev")).cast("int").alias("converted")
    u = per_user.select(arm, conv)
    counts = u.agg(
        count_if(F.col("arm") == 0).alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0)).alias("c_a"),
        count_if(F.col("arm") == 1).alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0)).alias("c_b"),
    )
    ma = (1 + F.col("c_a")).cast("double") / (2 + F.col("n_a"))
    mb = (1 + F.col("c_b")).cast("double") / (2 + F.col("n_b"))
    va = (
        (1 + F.col("c_a")).cast("double")
        * (1 + F.col("n_a") - F.col("c_a"))
        / ((2 + F.col("n_a")).cast("double") * (2 + F.col("n_a")) * (3 + F.col("n_a")))
    )
    vb = (
        (1 + F.col("c_b")).cast("double")
        * (1 + F.col("n_b") - F.col("c_b"))
        / ((2 + F.col("n_b")).cast("double") * (2 + F.col("n_b")) * (3 + F.col("n_b")))
    )
    z = (mb - ma) / F.sqrt(va + vb)
    return counts.select(
        "n_a",
        "c_a",
        "n_b",
        "c_b",
        round_half_up(ma, 6).alias("post_mean_a"),
        round_half_up(mb, 6).alias("post_mean_b"),
        round_half_up(F.sqrt(va), 8).alias("post_sd_a"),
        round_half_up(F.sqrt(vb), 8).alias("post_sd_b"),
        round_half_up(z, 4).alias("z_ab"),
        (z > _Z95_1S).alias("b_beats_a_95"),
    )


# --- LSH band-load diagnostic -------------------------------------------------------


@register(
    "lsh_band_load_report",
    oracle=f"""
WITH {minhash_bands_sql_ctes()},
sz AS (
  SELECT band_idx, band_key, cast(count(*) AS bigint) AS sz
  FROM bands_all GROUP BY band_idx, band_key
)
SELECT band_idx,
       cast(count(*) AS bigint) AS n_buckets,
       cast(sum(sz) AS bigint) AS n_docs,
       cast(max(sz) AS bigint) AS max_bucket,
       cast(sum(CASE WHEN sz >= 2 THEN 1 ELSE 0 END) AS bigint) AS n_buckets_ge2,
       cast(sum(sz * (sz - 1) // 2) AS bigint) AS candidate_pairs,
       cast(sum(CASE WHEN sz > {LSH_MAX_BUCKET} THEN 1 ELSE 0 END) AS bigint) AS n_hot
FROM sz GROUP BY band_idx
""",
    tags=("extension", "dedup", "diagnostic"),
)
def lsh_band_load_report(spark, sf_dir):
    """Bucket-load audit of the MinHash LSH banding — per band: bucket
    count, max bucket size, buckets with >= 2 docs, the candidate-pair
    budget sum n*(n-1)/2 the band self-join would generate, and how many
    buckets the hot-bucket guard (> LSH_MAX_BUCKET = 64) would drop. This is the
    capacity-planning readout run BEFORE dedup_minhash_lsh commits a
    100 TB candidate join: a skewed band shows up here as one huge
    max_bucket / candidate_pairs row, at the cost of one aggregate instead
    of the join itself. Same signatures and banding constants as the dedup
    operator (operators/dedup.py), so the report describes exactly the
    join that would run; the oracle shares the signature SQL with the
    dedup oracle by construction.

    Scale: signature is an in-row array fold (no shuffle); the only
    exchanges are the (band_idx, band_key) size aggregate and the 8-row
    band rollup — strictly cheaper than the join it plans for."""
    d = read_table(spark, sf_dir, "documents")
    sig = minhash_signature(doc_shingle_hash_sets(d))
    banded = lsh_banded(sig)
    sz = banded.groupBy("band_idx", "band_key").agg(F.count(F.lit(1)).alias("sz"))
    return sz.groupBy("band_idx").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("sz").alias("n_docs"),
        F.max("sz").alias("max_bucket"),
        count_if(F.col("sz") >= 2).alias("n_buckets_ge2"),
        F.sum(F.expr("(sz * (sz - 1)) div 2")).alias("candidate_pairs"),
        count_if(F.col("sz") > LSH_MAX_BUCKET).alias("n_hot"),
    )


# --- price elasticity by brand ------------------------------------------------------


@register(
    "price_elasticity_by_brand",
    oracle="""
WITH q AS (
  SELECT p.p_brand AS brand,
         cast(floor(ln(l.l_quantity) * 10000 + 0.5) AS bigint) AS y,
         cast(floor(ln(l.l_extendedprice / l.l_quantity) * 10000 + 0.5) AS bigint) AS x
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l.l_quantity > 0 AND l.l_extendedprice > 0
),
s AS (
  -- hugeint moments: n*sxx passes int64 beyond bench scale
  SELECT brand,
         cast(count(*) AS hugeint) AS n,
         cast(sum(x) AS hugeint) AS sx,
         cast(sum(y) AS hugeint) AS sy,
         cast(sum(x * y) AS hugeint) AS sxy,
         cast(sum(x * x) AS hugeint) AS sxx,
         cast(sum(y * y) AS hugeint) AS syy
  FROM q GROUP BY brand
)
SELECT brand, cast(n AS bigint) AS n_lines,
       floor(cast(n * sxy - sx * sy AS double)
             / cast(n * sxx - sx * sx AS double) * 1000000 + 0.5) / 1000000
         AS elasticity,
       floor(cast(n * sxy - sx * sy AS double) * cast(n * sxy - sx * sy AS double)
             / (cast(n * sxx - sx * sx AS double)
                * cast(n * syy - sy * sy AS double)) * 1000000 + 0.5) / 1000000
         AS r2
FROM s
""",
    tags=("extension", "relational", "regression"),
)
def price_elasticity_by_brand(spark, sf_dir):
    """Grouped log-log OLS per part brand: regress ln(quantity) on
    ln(unit price) — the slope IS the price elasticity of demand, the
    grouped-regression shape every pricing team runs (one regression per
    segment in a single pass, never a per-group loop). Log values
    quantize to 1e-4 integers BEFORE the moment sums (identical
    ``floor(ln(..)*1e4+0.5)`` in both engines), making every sum an exact
    integer fold; moment products run in decimal(38,0) (hugeint in the
    oracle) since n*sxx passes int64 past bench scale; slope and R^2 are
    single double expressions quantized at 1e-6 (the quantization scale
    cancels in the slope, so elasticity is in natural units).

    Scale: one fact-dim equi-join on partkey (AQE broadcasts the dim
    while it fits, shuffle-joins beyond), then a map-side-combined
    aggregate to one moment row per brand (~25 groups at any SF)."""
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    q = (
        l.where((F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0))
        .join(p, l["l_partkey"] == p["p_partkey"])
        .select(
            F.col("p_brand").alias("brand"),
            F.floor(F.log(F.col("l_quantity")) * 10000 + 0.5).cast("long").alias("y"),
            F.floor(
                F.log(F.col("l_extendedprice") / F.col("l_quantity")) * 10000 + 0.5
            )
            .cast("long")
            .alias("x"),
        )
    )
    dec = lambda c: F.sum(c.cast("decimal(38,0)"))  # noqa: E731
    s = q.groupBy("brand").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        dec(F.col("x")).alias("sx"),
        dec(F.col("y")).alias("sy"),
        dec(F.col("x") * F.col("y")).alias("sxy"),
        dec(F.col("x") * F.col("x")).alias("sxx"),
        dec(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return s.select(
        "brand",
        F.col("n").cast("long").alias("n_lines"),
        round_half_up(num / den, 6).alias("elasticity"),
        round_half_up(num * num / (den * deny), 6).alias("r2"),
    )


# --- blocking-quality audit for record linkage --------------------------------------

#: (strategy label, blocking key columns)
_BLOCK_STRATEGIES = (
    ("nation", ("c_nationkey",)),
    ("segment", ("c_mktsegment",)),
    ("nation_segment", ("c_nationkey", "c_mktsegment")),
)


def _blocking_oracle() -> str:
    parts = []
    for label, keys in _BLOCK_STRATEGIES:
        keycols = ", ".join(keys)
        parts.append(f"""
SELECT '{label}' AS strategy,
       b.n_records,
       b.n_blocks,
       b.max_block,
       b.candidate_pairs,
       floor((1.0 - cast(b.candidate_pairs AS double)
                    / (cast(b.n_records AS double) * (b.n_records - 1) / 2))
             * 1000000 + 0.5) / 1000000 AS reduction_ratio
FROM (
  SELECT cast(sum(n) AS bigint) AS n_records,
         cast(count(*) AS bigint) AS n_blocks,
         cast(max(n) AS bigint) AS max_block,
         cast(sum(n * (n - 1) // 2) AS bigint) AS candidate_pairs
  FROM (SELECT cast(count(*) AS bigint) AS n FROM customer GROUP BY {keycols})
) b""")
    return "\nUNION ALL\n".join(parts)


@register(
    "blocking_quality_report",
    oracle=_blocking_oracle(),
    tags=("extension", "linkage", "diagnostic"),
)
def blocking_quality_report(spark, sf_dir):
    """Blocking-strategy audit for record linkage: for each candidate
    blocking key (nation, market segment, and their composite) the block
    count, the largest block, the candidate-pair budget sum n*(n-1)/2,
    and the reduction ratio vs the full N*(N-1)/2 cross product — the
    planning readout that picks record_linkage_fs's blocking key before
    committing to the pair join (Christen 2012's standard blocking
    metrics). Pure integer aggregates; only the reduction ratio is a
    quantized double.

    Scale: per strategy one map-side-combined groupBy on the block key
    and a single-row rollup — the audit costs three cheap aggregates vs
    the quadratic join it de-risks. The same report at 100 TB drives the
    re-block decision for any block whose max_block makes n^2 infeasible."""
    c = read_table(spark, sf_dir, "customer")
    outs = []
    for label, keys in _BLOCK_STRATEGIES:
        blocks = c.groupBy(*[F.col(k) for k in keys]).agg(
            F.count(F.lit(1)).alias("n")
        )
        # n_records folds into the same rollup (sum of block sizes), so each
        # strategy is exactly two aggregates over one scan — no count join
        b = blocks.agg(
            F.sum("n").alias("n_records"),
            F.count(F.lit(1)).alias("n_blocks"),
            F.max("n").alias("max_block"),
            F.sum(F.expr("(n * (n - 1)) div 2")).alias("candidate_pairs"),
        )
        rr = 1.0 - F.col("candidate_pairs").cast("double") / (
            F.col("n_records").cast("double") * (F.col("n_records") - 1) / 2
        )
        outs.append(
            b.select(
                F.lit(label).alias("strategy"),
                "n_records",
                "n_blocks",
                "max_block",
                "candidate_pairs",
                round_half_up(rr, 6).alias("reduction_ratio"),
            )
        )
    out = outs[0]
    for df in outs[1:]:
        out = out.unionByName(df)
    return out


# --- T5-style span corruption sample builder ----------------------------------------

_SPAN_MOD = 15  # a position starts a span when H(doc,pos) % 15 == 0 (~7%)
_SPAN_LEN = 3  # fixed span length; overlapping spans merge into one run


def _span_corruption_oracle() -> str:
    h = token_hash_sql("cast(doc_id AS varchar) || '|' || cast(p AS varchar)")
    return f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '[ \\t\\n\\r\\f]+') AS t
  FROM documents WHERE text IS NOT NULL
),
arr AS (
  SELECT doc_id, t, len(t) AS n,
         list_transform(range(1, len(t) + 1),
           p -> CASE WHEN {h} % {_SPAN_MOD} = 0 THEN 1 ELSE 0 END) AS st
  FROM toks
),
msk AS (
  SELECT doc_id, t, n, st,
         list_transform(range(1, n + 1),
           p -> CASE WHEN len(list_filter(st[greatest(1, p - {_SPAN_LEN - 1}):p],
                                          x -> x = 1)) > 0
                     THEN 1 ELSE 0 END) AS mk
  FROM arr
),
-- run boundaries as position LISTS (ss = starts, ee = ends): sentinel k is
-- just the index into ss, so the construction is O(n) per doc instead of
-- the O(n^2) per-position prefix count
seg AS (
  SELECT doc_id, t, n, mk,
         list_filter(range(1, n + 1),
           p -> mk[p] = 1 AND (p = 1 OR mk[p - 1] = 0)) AS ss,
         list_filter(range(1, n + 1),
           p -> mk[p] = 1 AND (p = n OR mk[p + 1] = 0)) AS ee
  FROM msk
)
SELECT doc_id,
       cast(n AS bigint) AS n_tokens,
       cast(len(list_filter(mk, x -> x = 1)) AS bigint) AS n_masked,
       cast(len(ss) AS bigint) AS n_spans,
       coalesce(array_to_string(flatten(list_transform(range(1, n + 1),
         p -> CASE WHEN mk[p] = 0 THEN [t[p]]
                   WHEN list_position(ss, p) > 0
                     THEN ['<extra_id_' || cast(list_position(ss, p) AS varchar) || '>']
                   ELSE [] END)), ' '), '') AS corrupted_text,
       coalesce(array_to_string(flatten(list_transform(range(1, len(ss) + 1),
         i -> list_concat(['<extra_id_' || cast(i AS varchar) || '>'],
                          t[ss[i]:ee[i]]))), ' '), '') AS target_text
FROM seg
"""


@register(
    "span_corruption_build",
    oracle=_span_corruption_oracle(),
    tags=("extension", "training", "llm", "augmentation"),
)
def span_corruption_build(spark, sf_dir):
    """T5-style span-corruption sample builder (Raffel et al. 2020): mask
    deterministic token spans with numbered sentinels and emit the
    (corrupted input, target) pair per document — the denoising-objective
    materialization step of an LLM pre-training pipeline, run as a plain
    column transform. Span starts come from the shared 60-bit token hash
    of (doc_id, position) mod 15 with fixed length 3 (overlapping spans
    merge into one sentinel run, as in the reference implementation);
    sentinels are numbered 1..K left to right, and the target is the
    concatenation of sentinel-prefixed masked spans. Everything — the
    mask, the run boundaries, the running sentinel counter, and both
    output strings — is an in-row higher-order-function expression over
    the token array, identical in both engines; no randomness, no UDF,
    no shuffle.

    Scale: pure map over documents (one projection, zero exchanges) —
    linear in executors at any corpus size; run boundaries are position
    LISTS so the whole in-row construction is O(n tokens) per doc (the
    per-position prefix-count form was O(n^2) and 20x slower at sf0.1)."""
    d = read_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    toks = F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\r\f]+")
    base = d.select("doc_id", toks.alias("t"), F.size(toks).alias("n"))
    seq = F.sequence(F.lit(1), F.col("n"))
    st = F.transform(
        seq,
        lambda p: F.when(
            token_hash(
                F.concat(F.col("doc_id").cast("string"), F.lit("|"), p.cast("string"))
            )
            % _SPAN_MOD
            == 0,
            1,
        ).otherwise(0),
    )
    # project_fence between the array stages: without it CollapseProject
    # inlines each stage into the next stage's lambdas (O(n^3) per row)
    w_st = project_fence(base.withColumn("st", st))
    lo = lambda p: F.greatest(F.lit(1), p - (_SPAN_LEN - 1))  # noqa: E731
    mk = F.transform(
        seq,
        lambda p: F.when(
            F.exists(
                F.slice(F.col("st"), lo(p), p - lo(p) + 1), lambda x: x == 1
            ),
            1,
        ).otherwise(0),
    )
    w_mk = project_fence(w_st.withColumn("mk", mk))
    # run boundaries as position LISTS (ss = starts, ee = ends): sentinel k
    # is just the index into ss, so the whole construction is O(n) per doc
    # (the per-position prefix-count form was O(n^2) and 20x slower)
    at_mk = lambda p: F.element_at(F.col("mk"), p.cast("int"))  # noqa: E731
    # The (p == 1) / (p == n) branches are the semantic guard; the probe
    # index is ALSO clamped into [1, n] so correctness never depends on
    # And/Or short-circuit order — element_at(mk, 0) raises even with ANSI
    # off, and a future optimizer change (e.g. CSE across branches) could
    # otherwise evaluate the out-of-range probe.
    ss = F.filter(
        seq,
        lambda p: (at_mk(p) == 1)
        & ((p == 1) | (at_mk(F.greatest(p - 1, F.lit(1))) == 0)),
    )
    ee = F.filter(
        seq,
        lambda p: (at_mk(p) == 1)
        & ((p == F.col("n")) | (at_mk(F.least(p + 1, F.col("n"))) == 0)),
    )
    w_seg = project_fence(w_mk.withColumn("ss", ss).withColumn("ee", ee))
    sent_no = lambda i: F.concat(  # noqa: E731
        F.lit("<extra_id_"), i.cast("string"), F.lit(">")
    )
    tok_at = lambda p: F.element_at(F.col("t"), p.cast("int"))  # noqa: E731
    pos_in_ss = lambda p: F.array_position(F.col("ss"), p)  # noqa: E731
    corrupted = F.array_join(
        F.flatten(
            F.transform(
                seq,
                lambda p: F.when(at_mk(p) == 0, F.array(tok_at(p)))
                .when(pos_in_ss(p) > 0, F.array(sent_no(pos_in_ss(p))))
                .otherwise(F.array().cast("array<string>")),
            )
        ),
        " ",
    )
    target = F.array_join(
        F.flatten(
            F.transform(
                F.col("ss"),
                lambda s, i: F.concat(
                    F.array(sent_no(i + 1)),
                    F.slice(
                        F.col("t"),
                        s.cast("int"),
                        (F.element_at(F.col("ee"), (i + 1).cast("int")) - s + 1).cast(
                            "int"
                        ),
                    ),
                ),
            )
        ),
        " ",
    )
    return w_seg.select(
        "doc_id",
        F.col("n").cast("long").alias("n_tokens"),
        F.size(F.filter(F.col("mk"), lambda x: x == 1)).cast("long").alias("n_masked"),
        F.size(F.col("ss")).cast("long").alias("n_spans"),
        F.coalesce(corrupted, F.lit("")).alias("corrupted_text"),
        F.coalesce(target, F.lit("")).alias("target_text"),
    )


# --- n-gram novelty rate (graded memorization scan) ---------------------------------


@register(
    "ngram_novelty_rate",
    oracle=f"""
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
per_doc AS (
  SELECT h.split, h.doc_id,
         cast(count(*) AS bigint) AS n_grams,
         cast(sum(CASE WHEN t.x IS NOT NULL THEN 1 ELSE 0 END) AS bigint) AS n_seen
  FROM hx h LEFT JOIN train_sh t ON t.x = h.x
  WHERE h.split <> 'train'
  GROUP BY h.split, h.doc_id
)
SELECT split,
       cast(count(*) AS bigint) AS n_docs,
       cast(sum(n_grams) AS bigint) AS n_grams_total,
       cast(sum(n_seen) AS bigint) AS n_grams_seen,
       floor((1.0 - cast(sum(n_seen) AS double) / sum(n_grams)) * 1000000 + 0.5)
         / 1000000 AS micro_novelty,
       floor(cast(sum(floor((1.0 - cast(n_seen AS double) / n_grams)
                            * 1000000 + 0.5)) AS double) / count(*) + 0.5)
         / 1000000 AS macro_novelty
FROM per_doc GROUP BY split
""",
    tags=("extension", "training", "contamination", "llm"),
)
def ngram_novelty_rate(spark, sf_dir):
    """Graded memorization scan: for each held-out document, the fraction
    of its distinct word-3-gram shingles NOT present anywhere in the train
    split, aggregated per split as micro (gram-weighted) and macro
    (doc-averaged) novelty. The graded twin of ``split_leakage_report``
    (which only flags "shares >= 1 shingle"): novelty near 0 means the
    held-out loss measures memorization, not generalization. Same
    hash-bucket split and shingle hash as the leakage scan, so the two
    reports reconcile. Per-doc fractions quantize at 1e-6 before the
    macro average so the fold is order-free.

    Scale: the join is held-out grams against the DISTINCT train shingle
    set, an equi-join on the 60-bit gram hash — hash-partitioned, no
    skew (gram hashes are uniform; the ultra-frequent-shingle guard of
    the dedup family applies if a corpus needs it). The train set never
    materializes per-doc, only as the distinct join side."""
    d = read_table(spark, sf_dir, "documents")
    split = d.select(
        "doc_id",
        F.when(
            token_hash(F.col("doc_id").cast("string")) % 100 < 80, F.lit("train")
        )
        .when(token_hash(F.col("doc_id").cast("string")) % 100 < 90, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )

    grams = doc_shingles(d)
    # lineage-cut: the (doc, split, gram-hash) stream feeds BOTH join sides
    # (train distinct set + held-out probe) — without it the documents
    # scan and shingle explode run twice
    hx = (
        grams.join(split, "doc_id")
        .select(
            "doc_id",
            "split",
            (token_hash(F.col("gram")) % 2147483647).alias("x"),
        )
        .transform(cut_lazy)
    )
    train_sh = hx.where(F.col("split") == "train").select("x").distinct()
    held = hx.where(F.col("split") != "train")
    t = train_sh.withColumn("seen", F.lit(1))
    per_doc = (
        held.join(t, "x", "left")
        .groupBy("split", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            count_if(F.col("seen").isNotNull()).alias("n_seen"),
        )
    )
    doc_novelty_q = F.floor(
        (1.0 - F.col("n_seen").cast("double") / F.col("n_grams")) * 1000000 + 0.5
    )
    return per_doc.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_grams").alias("n_grams_total"),
        F.sum("n_seen").alias("n_grams_seen"),
        round_half_up(
            1.0 - F.sum("n_seen").cast("double") / F.sum("n_grams"), 6
        ).alias("micro_novelty"),
        (
            F.floor(F.sum(doc_novelty_q).cast("double") / F.count(F.lit(1)) + 0.5)
            / 1000000
        ).alias("macro_novelty"),
    )


# --- cross-source near-duplicate matrix ---------------------------------------------


@register(
    "near_dup_source_matrix",
    oracle=f"""
SELECT least(da.source, db.source) AS src_a,
       greatest(da.source, db.source) AS src_b,
       cast(count(*) AS bigint) AS n_pairs
FROM ({_minhash_oracle()}) p
JOIN documents da ON da.doc_id = p.doc_a
JOIN documents db ON db.doc_id = p.doc_b
GROUP BY least(da.source, db.source), greatest(da.source, db.source)
""",
    tags=("extension", "dedup", "governance"),
)
def near_dup_source_matrix(spark, sf_dir):
    """Cross-source near-duplicate matrix: the verified MinHash-LSH pair
    list (same pipeline, constants, and 0.6 Jaccard threshold as
    ``dedup_minhash_lsh`` — called directly, so the two can never drift)
    rolled up to unordered (source, source) cells. This is the corpus-
    governance readout that says WHICH crawls/feeds duplicate each other
    — the input to dedup-aware source mixing weights and to "drop feed B,
    it is 90% feed A" decisions.

    Scale: everything corpus-sized is inherited from the audited dedup
    plan (in-row signatures, guarded band join); this adds two doc-keyed
    dim joins for the source labels and a source^2-bounded aggregate."""
    pairs = dedup_minhash_lsh(spark, sf_dir)
    d = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    da = d.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa"))
    db = d.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb"))
    j = pairs.join(da, "doc_a").join(db, "doc_b")
    return (
        j.select(
            F.least(F.col("sa"), F.col("sb")).alias("src_a"),
            F.greatest(F.col("sa"), F.col("sb")).alias("src_b"),
        )
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# --- time-series motif discovery (matrix-profile-lite) ------------------------------

_MOTIF_W = 7  # window length, days
_MOTIF_MIN_LAG = 7  # exclusion zone: no overlapping windows
_MOTIF_MAX_LAG = 120  # bounded search horizon, days
_MOTIF_TOPK = 3


def _motif_oracle() -> str:
    dot = (
        "list_sum(list_transform(range(1, "
        f"{_MOTIF_W + 1}), i -> a.vec[i] * b.vec[i]))"
    )
    return f"""
WITH daily AS (
  SELECT cast(date_trunc('day', o_orderdate) AS date) AS d,
         cast(floor(cast(sum(cast(floor(o_totalprice * 100 + 0.5) AS bigint))
                         AS double) / 100000.0) AS bigint) AS x
  FROM orders GROUP BY 1
),
memb AS (
  SELECT daily.d - cast(k AS integer) AS s, k, x
  FROM daily, (SELECT unnest(range(0, {_MOTIF_W})) AS k)
),
w AS (
  SELECT s,
         cast(count(*) AS bigint) AS n,
         cast(sum(x) AS bigint) AS sx,
         cast(sum(x * x) AS bigint) AS sxx,
         list(x ORDER BY k) AS vec
  FROM memb GROUP BY s
),
full_w AS (
  SELECT * FROM w
  WHERE n = {_MOTIF_W} AND {_MOTIF_W} * sxx - sx * sx > 0
),
pairs AS (
  SELECT a.s AS start_a, b.s AS start_b,
         floor(cast({_MOTIF_W} * {dot} - a.sx * b.sx AS double)
               / sqrt(cast({_MOTIF_W} * a.sxx - a.sx * a.sx AS double)
                      * cast({_MOTIF_W} * b.sxx - b.sx * b.sx AS double))
               * 1000000 + 0.5) / 1000000 AS corr
  FROM full_w a
  JOIN (SELECT unnest(range({_MOTIF_MIN_LAG}, {_MOTIF_MAX_LAG + 1})) AS g) gaps ON true
  JOIN full_w b ON b.s = a.s + cast(g AS integer)
)
SELECT start_a, start_b, corr FROM pairs
ORDER BY corr DESC, start_a, start_b LIMIT {_MOTIF_TOPK}
"""


@register(
    "ts_motif_top_pairs",
    oracle=_motif_oracle(),
    tags=("extension", "timeseries", "motif"),
)
def ts_motif_top_pairs(spark, sf_dir):
    """Motif discovery on daily revenue (matrix-profile-lite, Yeh et al.
    2016's problem statement): the top-3 most-correlated pairs of
    non-overlapping 7-day windows within a 120-day search horizon —
    "which week does this week repeat?". Pearson correlation of the two
    windows comes from exact integer moments (daily sums descaled to
    thousand-dollar units so all products stay in int64 far past bench
    scale) plus one in-row dot product over the 7-element vectors;
    zero-variance windows are excluded before pairing.

    Scale: motif search is quadratic in the SERIES length, not the data
    volume — the fact collapses to one daily aggregate (D rows for D
    days), windows build from a 7-way in-row explode + one D-key
    aggregate, and pairing is a bounded-fanout (114 gaps) equi-join on
    the window-start date, never a cartesian. The spine is
    localCheckpointed so the orders scan runs once."""
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("d")
    ).agg(
        F.floor(
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")).cast(
                "double"
            )
            / 100000.0
        )
        .cast("long")
        .alias("x")
    )
    memb = daily.select(
        F.explode(F.sequence(F.lit(0), F.lit(_MOTIF_W - 1))).alias("k"), "d", "x"
    ).select(F.date_sub(F.col("d"), F.col("k")).alias("s"), "k", "x")
    w = (
        memb.groupBy("s")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.transform(
                F.sort_array(F.collect_list(F.struct("k", "x"))), lambda t: t["x"]
            ).alias("vec"),
        )
        .where(
            (F.col("n") == _MOTIF_W)
            & (_MOTIF_W * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
        )
        .transform(cut_eager)
    )
    a = w.select(
        F.col("s").alias("start_a"),
        F.col("sx").alias("sxa"),
        F.col("sxx").alias("sxxa"),
        F.col("vec").alias("va"),
        F.explode(
            F.sequence(F.lit(_MOTIF_MIN_LAG), F.lit(_MOTIF_MAX_LAG))
        ).alias("g"),
    )
    b = w.select(
        F.col("s").alias("start_b"),
        F.col("sx").alias("sxb"),
        F.col("sxx").alias("sxxb"),
        F.col("vec").alias("vb"),
    )
    j = a.join(b, F.col("start_b") == F.date_add(F.col("start_a"), F.col("g")))
    # integer dot over the fixed-length motif windows, unrolled
    # (functions.vec): exact, same fold order, codegen instead of HOF
    sxy = vec.dot_long(F.col("va"), F.col("vb"), dim=_MOTIF_W)
    num = (_MOTIF_W * sxy - F.col("sxa") * F.col("sxb")).cast("double")
    dena = (_MOTIF_W * F.col("sxxa") - F.col("sxa") * F.col("sxa")).cast("double")
    denb = (_MOTIF_W * F.col("sxxb") - F.col("sxb") * F.col("sxb")).cast("double")
    return (
        j.select(
            "start_a",
            "start_b",
            round_half_up(num / F.sqrt(dena * denb), 6).alias("corr"),
        )
        .orderBy(F.desc("corr"), F.asc("start_a"), F.asc("start_b"))
        .limit(_MOTIF_TOPK)
    )


# --- off-policy bandit replay evaluation --------------------------------------------

_BANDIT_CUTOFF = "2024-01-16 00:00:00"
_BANDIT_REWARD_MIN = 100.0  # reward = 1 when event value >= this


def _bandit_oracle() -> str:
    h = token_hash_sql(
        "cast(user_id AS varchar) || '|' || cast(cast(ts AS date) AS varchar)"
    )
    return f"""
WITH ev AS (
  SELECT user_id, ts, event_type,
         CASE WHEN value >= {_BANDIT_REWARD_MIN!r} THEN 1 ELSE 0 END AS r
  FROM events WHERE value IS NOT NULL
),
arms AS (SELECT DISTINCT event_type FROM ev),
idx AS (
  SELECT a.event_type, cast(count(b.event_type) AS bigint) AS arm_idx
  FROM arms a LEFT JOIN arms b ON b.event_type < a.event_type
  GROUP BY a.event_type
),
kk AS (SELECT cast(count(*) AS bigint) AS k FROM arms),
fh AS (
  SELECT event_type, cast(count(*) AS bigint) AS n1, cast(sum(r) AS bigint) AS s1
  FROM ev WHERE ts < TIMESTAMP '{_BANDIT_CUTOFF}' GROUP BY event_type
),
best AS (
  SELECT event_type AS best_et FROM fh
  ORDER BY cast(s1 AS double) / n1 DESC, event_type LIMIT 1
),
e2 AS (
  SELECT ev.user_id, ev.ts, ev.event_type, ev.r, i.arm_idx, kk.k, best.best_et,
         {h} % kk.k AS chosen
  FROM ev JOIN idx i ON i.event_type = ev.event_type, kk, best
  WHERE ev.ts >= TIMESTAMP '{_BANDIT_CUTOFF}'
),
agg AS (
  SELECT cast(sum(CASE WHEN chosen = arm_idx THEN 1 ELSE 0 END) AS bigint) AS u_n,
         cast(sum(CASE WHEN chosen = arm_idx THEN r ELSE 0 END) AS bigint) AS u_s,
         cast(sum(CASE WHEN event_type = best_et THEN 1 ELSE 0 END) AS bigint) AS g_n,
         cast(sum(CASE WHEN event_type = best_et THEN r ELSE 0 END) AS bigint) AS g_s,
         cast(count(*) AS bigint) AS l_n,
         cast(sum(r) AS bigint) AS l_s
  FROM e2
)
SELECT 'uniform' AS policy, u_n AS n_matched, u_s AS n_rewarded,
       floor(cast(u_s AS double) / u_n * 1000000 + 0.5) / 1000000 AS reward_rate
FROM agg
UNION ALL
SELECT 'greedy', g_n, g_s,
       floor(cast(g_s AS double) / g_n * 1000000 + 0.5) / 1000000 FROM agg
UNION ALL
SELECT 'logging', l_n, l_s,
       floor(cast(l_s AS double) / l_n * 1000000 + 0.5) / 1000000 FROM agg
"""


@register(
    "bandit_replay_eval",
    oracle=_bandit_oracle(),
    tags=("extension", "training", "bandit", "evaluation"),
)
def bandit_replay_eval(spark, sf_dir):
    """Off-policy bandit evaluation by replay (Li et al. 2011): score
    candidate arm-selection policies on the logged event stream WITHOUT
    deploying them — keep only logged events whose arm matches what the
    policy would have chosen, and average their rewards. Three policies
    over the event-type arms on the second half of the month: 'uniform'
    (deterministic hash of (user, day) picks an arm — the unbiased
    replay estimator, since logging here is arm-independent), 'greedy'
    (the single best arm by first-half reward rate — the train/eval
    temporal split prevents peeking), and 'logging' (the logged stream
    itself, the baseline). Rewards and matches are exact integer
    conditional sums; only the final rates are quantized doubles.

    Scale: one pass — the arm index (|arms| rows) and the 1-row best-arm
    and K broadcast onto the stream, then a single conditional aggregate
    computes all three policies' counters; no per-policy rescan."""
    ev = read_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    ev = ev.select(
        "user_id",
        "ts",
        "event_type",
        (F.col("value") >= _BANDIT_REWARD_MIN).cast("int").alias("r"),
    )
    arms = ev.select("event_type").distinct()
    a1, a2 = arms.alias("a"), arms.alias("b")
    idx = (
        a1.join(F.broadcast(a2), F.col("b.event_type") < F.col("a.event_type"), "left")
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(F.count(F.col("b.event_type")).alias("arm_idx"))
    )
    kk = arms.agg(F.count(F.lit(1)).alias("k"))
    cutoff = F.lit(_BANDIT_CUTOFF).cast("timestamp")
    fh = (
        ev.where(F.col("ts") < cutoff)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n1"), F.sum("r").alias("s1"))
    )
    best = (
        fh.orderBy(
            F.desc(F.col("s1").cast("double") / F.col("n1")), F.asc("event_type")
        )
        .limit(1)
        .select(F.col("event_type").alias("best_et"))
    )
    chosen = (
        token_hash(
            F.concat(
                F.col("user_id").cast("string"),
                F.lit("|"),
                F.col("ts").cast("date").cast("string"),
            )
        )
        % F.col("k")
    )
    e2 = (
        ev.where(F.col("ts") >= cutoff)
        .join(F.broadcast(idx), "event_type")
        .crossJoin(F.broadcast(kk))
        .crossJoin(F.broadcast(best))
        .withColumn("chosen", chosen)
    )
    u_match = F.col("chosen") == F.col("arm_idx")
    g_match = F.col("event_type") == F.col("best_et")
    agg = e2.agg(
        count_if(u_match).alias("u_n"),
        F.sum(F.when(u_match, F.col("r")).otherwise(0)).alias("u_s"),
        count_if(g_match).alias("g_n"),
        F.sum(F.when(g_match, F.col("r")).otherwise(0)).alias("g_s"),
        F.count(F.lit(1)).alias("l_n"),
        F.sum("r").alias("l_s"),
    )
    rate = lambda s, n: round_half_up(  # noqa: E731
        F.col(s).cast("double") / F.col(n), 6
    )
    row = lambda p, n, s: F.struct(  # noqa: E731
        F.lit(p).alias("policy"),
        F.col(n).alias("n_matched"),
        F.col(s).alias("n_rewarded"),
        rate(s, n).alias("reward_rate"),
    )
    return agg.select(
        F.explode(
            F.array(
                row("uniform", "u_n", "u_s"),
                row("greedy", "g_n", "g_s"),
                row("logging", "l_n", "l_s"),
            )
        ).alias("p")
    ).select("p.policy", "p.n_matched", "p.n_rewarded", "p.reward_rate")


# --- Brier score decomposition ------------------------------------------------------


@register(
    "brier_score_decomposition",
    oracle=f"""
WITH qc AS ({_QC_ORACLE}),
j AS (
  SELECT cast(floor((qc.quality_score + 0.5) * 1000000 + 0.5) AS bigint) AS p_q,
         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y,
         cast(least(greatest(floor((qc.quality_score + 0.5) * 10), 0), 9) AS int)
           AS bin_id
  FROM qc JOIN documents d USING (doc_id)
  WHERE qc.n_features > 0
),
g AS (
  SELECT cast(count(*) AS bigint) AS n,
         cast(sum(y) AS bigint) AS sy,
         cast(sum((p_q - y * 1000000) * (p_q - y * 1000000)) AS hugeint) AS ssq
  FROM j
),
bins AS (
  SELECT bin_id, cast(count(*) AS bigint) AS nk,
         cast(sum(p_q) AS bigint) AS spk,
         cast(sum(y) AS bigint) AS syk
  FROM j GROUP BY bin_id
),
terms AS (
  SELECT cast(sum(cast(floor(cast(nk AS double) / g.n
           * (cast(spk AS double) / nk / 1000000.0 - cast(syk AS double) / nk)
           * (cast(spk AS double) / nk / 1000000.0 - cast(syk AS double) / nk)
           * 1000000000000 + 0.5) AS bigint)) AS bigint) AS rel_p,
         cast(sum(cast(floor(cast(nk AS double) / g.n
           * (cast(syk AS double) / nk - cast(g.sy AS double) / g.n)
           * (cast(syk AS double) / nk - cast(g.sy AS double) / g.n)
           * 1000000000000 + 0.5) AS bigint)) AS bigint) AS res_p
  FROM bins, g GROUP BY g.n, g.sy
)
SELECT g.n AS n_docs,
       floor(cast(g.sy AS double) / g.n * 1000000 + 0.5) / 1000000 AS base_rate,
       floor(cast(g.ssq AS double) / g.n / 1000000000000.0 * 1000000 + 0.5)
         / 1000000 AS brier,
       floor(cast(t.rel_p AS double) / 1000000000000.0 * 1000000 + 0.5)
         / 1000000 AS reliability,
       floor(cast(t.res_p AS double) / 1000000000000.0 * 1000000 + 0.5)
         / 1000000 AS resolution,
       floor((cast(g.sy AS double) / g.n) * (1.0 - cast(g.sy AS double) / g.n)
             * 1000000 + 0.5) / 1000000 AS uncertainty,
       floor((cast(t.rel_p - t.res_p AS double) / 1000000000000.0
              + (cast(g.sy AS double) / g.n) * (1.0 - cast(g.sy AS double) / g.n))
             * 1000000 + 0.5) / 1000000 AS brier_binned
FROM g, terms t
""",
    tags=("extension", "text", "classifier", "evaluation"),
)
def brier_score_decomposition(spark, sf_dir):
    """Murphy (1973) decomposition of the Brier score for the corpus
    quality classifier against the ``lang = 'en'`` reference label (the
    same (score, label) pair as ``calibration_bins``): raw Brier, plus
    reliability (calibration error), resolution (how much the bins
    separate the base rate), and uncertainty (base-rate variance), with
    the binned identity brier_binned = REL - RES + UNC reported
    alongside. Scores live on a 1e-6 grid, so p quantizes exactly to
    int64 micro-units; the raw Brier sum of squares is pure integer
    (decimal(38,0) / hugeint past int64); per-bin REL/RES terms quantize
    at 1e-12 before the 10-row fold so every sum is order-free.

    Scale: the classifier stays map-only; this adds one doc-keyed label
    join, a 10-group aggregate, and single-row algebra."""

    qc = quality_classifier_score(spark, sf_dir).where(F.col("n_features") > 0)
    d = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    # lineage-cut: the (p, y, bin) stream feeds the global moments AND the
    # bin rollup — one classifier pass instead of two
    j = (
        qc.join(d, "doc_id")
        .select(
            F.floor((F.col("quality_score") + 0.5) * 1000000 + 0.5)
            .cast("long")
            .alias("p_q"),
            (F.col("lang") == "en").cast("int").alias("y"),
            F.least(
                F.greatest(F.floor((F.col("quality_score") + 0.5) * 10), F.lit(0)),
                F.lit(9),
            )
            .cast("int")
            .alias("bin_id"),
        )
        .transform(cut_lazy)
    )
    err = F.col("p_q") - F.col("y").cast("long") * 1000000
    g = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum((err * err).cast("decimal(38,0)")).alias("ssq"),
    )
    bins = j.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("nk"),
        F.sum("p_q").alias("spk"),
        F.sum("y").alias("syk"),
    )
    pbar = F.col("spk").cast("double") / F.col("nk") / 1000000.0
    ybar_k = F.col("syk").cast("double") / F.col("nk")
    ybar = F.col("sy").cast("double") / F.col("n")
    wfrac = F.col("nk").cast("double") / F.col("n")
    q12 = lambda c: F.floor(c * 1000000000000 + 0.5).cast("long")  # noqa: E731
    # ssq rides the rollup keys so the 1-row global frame is evaluated once
    terms = (
        bins.crossJoin(F.broadcast(g))
        .groupBy("n", "sy", "ssq")
        .agg(
            F.sum(q12(wfrac * (pbar - ybar_k) * (pbar - ybar_k))).alias("rel_p"),
            F.sum(q12(wfrac * (ybar_k - ybar) * (ybar_k - ybar))).alias("res_p"),
        )
    )
    unc = ybar * (1.0 - ybar)
    return terms.select(
        F.col("n").alias("n_docs"),
        round_half_up(ybar, 6).alias("base_rate"),
        round_half_up(
            F.col("ssq").cast("double") / F.col("n") / 1000000000000.0, 6
        ).alias("brier"),
        round_half_up(F.col("rel_p").cast("double") / 1000000000000.0, 6).alias(
            "reliability"
        ),
        round_half_up(F.col("res_p").cast("double") / 1000000000000.0, 6).alias(
            "resolution"
        ),
        round_half_up(unc, 6).alias("uncertainty"),
        round_half_up(
            (F.col("rel_p") - F.col("res_p")).cast("double") / 1000000000000.0 + unc,
            6,
        ).alias("brier_binned"),
    )


# --- decision-stump training (distributed, exact) -----------------------------------

#: candidate (feature, threshold) grid — literal in both engines. Features
#: are per-user integers; thresholds span each feature's realistic range.
_STUMP_GRID = (
    ("n_events", (2, 4, 6, 8, 12, 16, 24)),
    ("total_cents", (50_000, 100_000, 200_000, 400_000, 800_000, 1_600_000)),
    ("active_days", (2, 4, 6, 8, 12, 16)),
)


def _stump_oracle() -> str:
    cand_rows = ",\n         ".join(
        f"('{feat}', {thr})" for feat, thrs in _STUMP_GRID for thr in thrs
    )
    feat_expr = " ".join(
        f"WHEN c.feature = '{feat}' THEN u.{feat}" for feat, _ in _STUMP_GRID
    )
    return f"""
WITH u AS (
  SELECT user_id,
         cast(count(*) AS bigint) AS n_events,
         cast(sum(CASE WHEN value IS NOT NULL
                       THEN cast(floor(value * 100 + 0.5) AS bigint)
                       ELSE 0 END) AS bigint) AS total_cents,
         cast(count(DISTINCT cast(ts AS date)) AS bigint) AS active_days,
         CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * 5
                   > count(*) THEN 1 ELSE 0 END AS y
  FROM events GROUP BY user_id
),
cand AS (SELECT * FROM (VALUES {cand_rows}) c(feature, threshold)),
split AS (
  SELECT c.feature, cast(c.threshold AS bigint) AS threshold,
         cast(sum(CASE WHEN (CASE {feat_expr} END) <= c.threshold
                       THEN 1 ELSE 0 END) AS bigint) AS n_left,
         cast(sum(CASE WHEN (CASE {feat_expr} END) <= c.threshold
                       THEN u.y ELSE 0 END) AS bigint) AS s_left,
         cast(count(*) AS bigint) AS n_all,
         cast(sum(u.y) AS bigint) AS s_all
  FROM u, cand c
  GROUP BY c.feature, c.threshold
),
scored AS (
  SELECT feature, threshold, n_left, s_left,
         n_all - n_left AS n_right, s_all - s_left AS s_right,
         cast(floor((CASE WHEN n_left = 0 THEN 0.0
                 ELSE cast(s_left * (n_left - s_left) AS double) / n_left END
               + CASE WHEN n_all - n_left = 0 THEN 0.0
                 ELSE cast((s_all - s_left) * ((n_all - n_left) - (s_all - s_left))
                           AS double) / (n_all - n_left) END)
               / n_all * 1000000000 + 0.5) AS bigint) AS gini_q
  FROM split
),
best AS (SELECT min(gini_q) AS g FROM scored)
SELECT s.feature, s.threshold, s.n_left, s.s_left, s.n_right, s.s_right,
       s.gini_q, s.gini_q = b.g AS is_best
FROM scored s, best b
"""


@register(
    "decision_stump_train",
    oracle=_stump_oracle(),
    tags=("extension", "training", "ml"),
)
def decision_stump_train(spark, sf_dir):
    """Distributed decision-stump training — the inner loop of every
    tree ensemble (CART split search, Breiman et al. 1984), run as one
    Spark aggregate: per user the integer features (event count, total
    cents, active days) and the conversion label, then every candidate
    (feature, threshold) from a literal grid scored by weighted Gini
    impurity in a single conditional-aggregate pass. The Gini score
    s_l(n_l-s_l)/n_l + s_r(n_r-s_r)/n_r (normalized by N) is a rational
    of exact int64 counts, quantized at 1e-9; the winning split is
    flagged with is_best so the full search surface stays auditable.

    Scale: one user-keyed feature aggregate over the fact, then a
    19-candidate broadcast explode and a map-side-combined aggregate to
    19 rows — the canonical "histogram method" split search (what
    XGBoost/LightGBM do per node), linear in the data, one shuffle."""
    ev = read_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(
                F.col("value").isNotNull(),
                F.floor(F.col("value") * 100 + 0.5).cast("long"),
            ).otherwise(0)
        ).alias("total_cents"),
        F.count_distinct(F.col("ts").cast("date")).alias("active_days"),
        (count_if(F.col("event_type") == "purchase") * 5 > F.count(F.lit(1)))
        .cast("int")
        .alias("y"),
    )
    cand = F.array(
        *[
            F.struct(
                F.lit(feat).alias("feature"), F.lit(thr).cast("long").alias("threshold")
            )
            for feat, thrs in _STUMP_GRID
            for thr in thrs
        ]
    )
    e = u.select(
        "n_events", "total_cents", "active_days", "y", F.explode(cand).alias("c")
    )
    fval = (
        F.when(F.col("c.feature") == "n_events", F.col("n_events"))
        .when(F.col("c.feature") == "total_cents", F.col("total_cents"))
        .otherwise(F.col("active_days"))
    )
    left = fval <= F.col("c.threshold")
    split = e.groupBy(
        F.col("c.feature").alias("feature"), F.col("c.threshold").alias("threshold")
    ).agg(
        count_if(left).alias("n_left"),
        F.sum(F.when(left, F.col("y")).otherwise(0)).alias("s_left"),
        F.count(F.lit(1)).alias("n_all"),
        F.sum("y").alias("s_all"),
    )
    n_r = F.col("n_all") - F.col("n_left")
    s_r = F.col("s_all") - F.col("s_left")
    gl = F.when(F.col("n_left") == 0, F.lit(0.0)).otherwise(
        (F.col("s_left") * (F.col("n_left") - F.col("s_left"))).cast("double")
        / F.col("n_left")
    )
    gr = F.when(n_r == 0, F.lit(0.0)).otherwise(
        (s_r * (n_r - s_r)).cast("double") / n_r
    )
    scored = split.select(
        "feature",
        "threshold",
        "n_left",
        "s_left",
        n_r.alias("n_right"),
        s_r.alias("s_right"),
        F.floor((gl + gr) / F.col("n_all") * 1000000000 + 0.5)
        .cast("long")
        .alias("gini_q"),
    ).transform(cut_eager)  # 19 rows feed both the min and the output
    best = scored.agg(F.min("gini_q").alias("g"))
    return scored.crossJoin(F.broadcast(best)).select(
        "feature",
        "threshold",
        "n_left",
        "s_left",
        "n_right",
        "s_right",
        "gini_q",
        (F.col("gini_q") == F.col("g")).alias("is_best"),
    )


# --- logistic-regression gradient step ----------------------------------------------

#: fixed evaluation point w (literals in both engines): intercept + one
#: weight per feature, on the scaled-feature space below.
_LR_W = (-1.0, 0.25, 0.125, 0.5)  # w0, w_events, w_cents, w_days
_LR_FEATS = ("n_events", "cents_k", "active_days")


def _lr_oracle() -> str:
    z = (
        f"{_LR_W[0]!r} + {_LR_W[1]!r} * u.n_events"
        f" + {_LR_W[2]!r} * u.cents_k + {_LR_W[3]!r} * u.active_days"
    )
    g_rows = "\n  UNION ALL ".join(
        f"SELECT '{f}' AS feature, cast(sum(cast(floor(r * {f} * 1000000000 + 0.5)"
        " AS bigint)) AS bigint) AS g_q,"
        " cast(sum(l_q) AS bigint) AS loss_q,"
        " cast(count(*) AS bigint) AS n_users FROM resid"
        for f in _LR_FEATS
    )
    return f"""
WITH u AS (
  SELECT user_id,
         cast(count(*) AS bigint) AS n_events,
         floor(cast(sum(CASE WHEN value IS NOT NULL
                             THEN cast(floor(value * 100 + 0.5) AS bigint)
                             ELSE 0 END) AS double) / 100000.0) AS cents_k,
         cast(count(DISTINCT cast(ts AS date)) AS bigint) AS active_days,
         CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * 5
                   > count(*) THEN 1 ELSE 0 END AS y
  FROM events GROUP BY user_id
),
resid AS (
  SELECT n_events, cents_k, active_days,
         1.0 / (1.0 + exp(-({z}))) - y AS r,
         cast(floor((CASE WHEN y = 1 THEN ln(1.0 + exp(-({z})))
                          ELSE ln(1.0 + exp({z})) END) * 1000000 + 0.5)
              AS bigint) AS l_q
  FROM u
)
{g_rows}
"""


@register(
    "logreg_gradient_step",
    oracle=_lr_oracle(),
    tags=("extension", "training", "ml"),
)
def logreg_gradient_step(spark, sf_dir):
    """One distributed gradient evaluation of logistic regression at a
    fixed literal weight vector — the inner loop of every full-batch /
    L-BFGS logistic trainer (and of MLlib's LogisticRegression): per user
    the scaled integer features and conversion label, residual
    r = sigmoid(w.x) - y, and the gradient g_j = sum r * x_j per feature,
    with the log-loss sum alongside. Per-row gradient contributions and
    losses quantize (1e-9 / 1e-6) BEFORE the sum so the fold is
    order-free; the weight vector is embedded as identical literals in
    both engines, so both evaluate the same IEEE expression tree.

    Scale: one user-keyed aggregate over the fact, then one map-side-
    combined reduction to |features| rows — gradient evaluation is
    embarrassingly data-parallel, which is exactly why logistic trainers
    scale; a trainer would loop this query, updating the literals."""
    ev = read_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.floor(
            F.sum(
                F.when(
                    F.col("value").isNotNull(),
                    F.floor(F.col("value") * 100 + 0.5).cast("long"),
                ).otherwise(0)
            ).cast("double")
            / 100000.0
        ).alias("cents_k"),
        F.count_distinct(F.col("ts").cast("date")).alias("active_days"),
        (count_if(F.col("event_type") == "purchase") * 5 > F.count(F.lit(1)))
        .cast("int")
        .alias("y"),
    )
    z = (
        F.lit(_LR_W[0])
        + _LR_W[1] * F.col("n_events")
        + _LR_W[2] * F.col("cents_k")
        + _LR_W[3] * F.col("active_days")
    )
    r = 1.0 / (1.0 + F.exp(-z)) - F.col("y")
    l_q = (
        F.floor(
            F.when(F.col("y") == 1, F.log(1.0 + F.exp(-z)))
            .otherwise(F.log(1.0 + F.exp(z)))
            * 1000000
            + 0.5
        )
    ).cast("long")
    resid = u.select(
        "n_events", "cents_k", "active_days", r.alias("r"), l_q.alias("l_q")
    )
    # ONE pass: all three gradient components reduce in the same aggregate,
    # then explode to rows (a union of per-feature aggregates would rescan
    # the user rollup once per feature)
    agg = resid.agg(
        *[
            F.sum(
                F.floor(F.col("r") * F.col(f) * 1000000000 + 0.5).cast("long")
            ).alias(f"g_{f}")
            for f in _LR_FEATS
        ],
        F.sum("l_q").alias("loss_q"),
        F.count(F.lit(1)).alias("n_users"),
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(f).alias("feature"),
                F.col(f"g_{f}").alias("g_q"),
                F.col("loss_q").alias("loss_q"),
                F.col("n_users").alias("n_users"),
            )
            for f in _LR_FEATS
        ]
    )
    return agg.select(F.explode(rows).alias("p")).select(
        "p.feature", "p.g_q", "p.loss_q", "p.n_users"
    )


# --- quantile normalization across series -------------------------------------------

_QN_GRID = [round(k / 100.0, 2) for k in range(101)]


@register(
    "quantile_normalize_report",
    oracle=f"""
WITH v AS (
  SELECT event_type, event_id, value FROM events WHERE value IS NOT NULL
),
g AS (SELECT quantile_cont(value, {_QN_GRID}) AS g FROM v),
r AS (
  SELECT event_type, value,
         cast(floor(percent_rank() OVER (PARTITION BY event_type
                                         ORDER BY value, event_id) * 100 + 0.5)
              AS bigint) AS k
  FROM v
),
nr AS (SELECT event_type, value, g.g[k + 1] AS norm FROM r, g)
SELECT event_type,
       cast(count(*) AS bigint) AS n_events,
       floor(cast(sum(cast(floor(value * 10000 + 0.5) AS bigint)) AS double)
             / count(*) + 0.5) / 10000 AS mean_raw,
       floor(cast(sum(cast(floor(norm * 10000 + 0.5) AS bigint)) AS double)
             / count(*) + 0.5) / 10000 AS mean_norm
FROM nr GROUP BY event_type
""",
    tags=("extension", "events", "harmonization"),
)
def quantile_normalize_report(spark, sf_dir):
    """Quantile normalization across series (the batch-effect correction
    of bioinformatics, Bolstad et al. 2003, applied to telemetry): every
    event value maps to the POOLED distribution's quantile at its
    within-series percent rank, so all series share one marginal
    distribution afterwards — reported as per-series raw vs normalized
    means (which converge when normalization works). The pooled quantile
    function is a 101-point exact interpolated grid (the percentile /
    quantile_cont parity feature_quantile_binning already pinned)
    computed ONCE and broadcast; ranks come from a series-partitioned
    window with a deterministic (value, event_id) tie-break; per-row
    normalized values quantize at 1e-4 before summing so the means are
    order-free.

    Scale: one window shuffle on the series key, a 1-row grid broadcast,
    and a per-series aggregate. The grid aggregate sorts the pooled
    values once — beyond single-executor pooled sorts, swap the grid for
    quantile_histogram_sketch's mergeable histogram."""
    from pyspark.sql import Window

    ev = (
        read_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("event_type", "event_id", "value")
    )
    grid = ev.agg(
        F.expr(
            "percentile(value, array({}))".format(
                ", ".join(repr(p) for p in _QN_GRID)
            )
        ).alias("g")
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    r = ev.select(
        "event_type",
        "value",
        F.floor(F.percent_rank().over(w) * 100 + 0.5).cast("long").alias("k"),
    )
    nr = r.crossJoin(F.broadcast(grid)).select(
        "event_type",
        "value",
        F.element_at(F.col("g"), (F.col("k") + 1).cast("int")).alias("norm"),
    )
    q4 = lambda c: F.floor(c * 10000 + 0.5).cast("long")  # noqa: E731
    return nr.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.floor(F.sum(q4(F.col("value"))).cast("double") / F.count(F.lit(1)) + 0.5) / 10000)
        .alias("mean_raw"),
        (F.floor(F.sum(q4(F.col("norm"))).cast("double") / F.count(F.lit(1)) + 0.5) / 10000)
        .alias("mean_norm"),
    )


# --- seasonal-naive backtest (M-competition baseline) -------------------------------


@register(
    "seasonal_backtest_mase12",
    oracle="""
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         cast(floor(cast(sum(cast(floor(o_totalprice * 100 + 0.5) AS bigint))
                         AS double) / 100000.0) AS bigint) AS x
  FROM orders GROUP BY 1
),
lo AS (SELECT min(m) AS m0 FROM monthly),
idxd AS (
  SELECT cast(datediff('month', lo.m0, monthly.m) AS bigint) + 1 AS idx, x
  FROM monthly, lo
),
nv AS (
  SELECT cast(count(*) AS bigint) AS cn, cast(sum(abs(c.x - p.x)) AS bigint) AS san
  FROM idxd c JOIN idxd p ON p.idx = c.idx - 1
),
sn AS (
  SELECT cast(count(*) AS bigint) AS cs, cast(sum(abs(c.x - s.x)) AS bigint) AS sas
  FROM idxd c JOIN idxd s ON s.idx = c.idx - 12
),
n AS (SELECT cast(count(*) AS bigint) AS n_months FROM idxd)
SELECT n.n_months, sn.cs AS n_scored,
       floor(cast(sas AS double) / cs * 1000 + 0.5) / 1000 AS mae_seasonal,
       floor((cast(sas AS double) / cs) / (cast(san AS double) / cn)
             * 1000000 + 0.5) / 1000000 AS mase12
FROM sn, nv, n
""",
    tags=("extension", "timeseries", "forecast"),
)
def seasonal_backtest_mase12(spark, sf_dir):
    """Seasonal-naive one-step backtest at period 12 — THE M-competition
    baseline a seasonal forecaster must beat: x_hat_t = x_{t-12} on the
    monthly revenue spine, scored as MAE and as MASE (scaled by the
    in-sample naive MAE, Hyndman & Koehler 2006). MASE12 < 1 says last
    year's month predicts better than last month does — i.e. the series
    is genuinely seasonal. Absolute errors are exact int64 on the same
    scaled spine as forecast_backtest_mase, so the two reports reconcile.

    Scale: the fact reduces to one monthly aggregate (localCheckpointed,
    shared spine pattern); both error sets are self-joins on the tiny
    T-row spine."""
    o = read_table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("m"))
        .agg(
            F.floor(
                F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")).cast(
                    "double"
                )
                / 100000.0
            )
            .cast("long")
            .alias("x")
        )
        .transform(cut_eager)
    )
    lo = monthly.agg(F.min("m").alias("m0"))
    idxd = monthly.crossJoin(F.broadcast(lo)).select(
        (F.months_between(F.col("m"), F.col("m0")).cast("long") + 1).alias("idx"),
        "x",
    )
    p1 = idxd.select((F.col("idx") + 1).alias("idx"), F.col("x").alias("xp"))
    s12 = idxd.select((F.col("idx") + 12).alias("idx"), F.col("x").alias("xs"))
    nv = idxd.join(F.broadcast(p1), "idx").agg(
        F.count(F.lit(1)).alias("cn"),
        F.sum(F.abs(F.col("x") - F.col("xp"))).alias("san"),
    )
    sn = idxd.join(F.broadcast(s12), "idx").agg(
        F.count(F.lit(1)).alias("cs"),
        F.sum(F.abs(F.col("x") - F.col("xs"))).alias("sas"),
    )
    n = idxd.agg(F.count(F.lit(1)).alias("n_months"))
    mae_s = F.col("sas").cast("double") / F.col("cs")
    mae_n = F.col("san").cast("double") / F.col("cn")
    return (
        sn.crossJoin(F.broadcast(nv))
        .crossJoin(F.broadcast(n))
        .select(
            "n_months",
            F.col("cs").alias("n_scored"),
            round_half_up(mae_s, 3).alias("mae_seasonal"),
            round_half_up(mae_s / mae_n, 6).alias("mase12"),
        )
    )


# --- Markov chain entropy rate ------------------------------------------------------


@register(
    "markov_entropy_rate",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
),
c AS (
  SELECT event_type AS src, next_type AS dst, cast(count(*) AS bigint) AS n_ij
  FROM ordered WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
),
rowtot AS (
  SELECT src, cast(sum(n_ij) AS bigint) AS n_i FROM c GROUP BY src
),
cells AS (
  SELECT c.n_ij,
         cast(floor(-ln(cast(c.n_ij AS double) / r.n_i) * c.n_ij * 1000000 + 0.5)
              AS bigint) AS h_q
  FROM c JOIN rowtot r ON r.src = c.src
),
tot AS (
  SELECT cast(sum(n_ij) AS bigint) AS n_trans,
         cast(sum(h_q) AS bigint) AS sh_q
  FROM cells
),
k AS (SELECT cast(count(*) AS bigint) AS n_states FROM rowtot)
SELECT tot.n_trans, k.n_states,
       floor(cast(tot.sh_q AS double) / tot.n_trans + 0.5) / 1000000
         AS entropy_rate_nats,
       floor(ln(cast(k.n_states AS double)) * 1000000 + 0.5) / 1000000
         AS max_entropy_nats
FROM tot, k
""",
    tags=("extension", "graph", "information"),
)
def markov_entropy_rate(spark, sf_dir):
    """Entropy rate of the per-user event-type Markov chain: H = -sum_ij
    pi_i P_ij ln P_ij with the empirical source distribution as pi —
    equivalently the transition-count-weighted mean of -ln(n_ij / n_i).
    This is the predictability ceiling of user behavior (how many nats a
    next-event model can hope to save vs the ln(K) uniform bound, printed
    alongside) and the sequence-complexity readout next to
    markov_event_transitions' raw matrix. Per-cell terms quantize at 1e-6
    BEFORE the sum (the fold is order-free); everything upstream is exact
    integer counts from a deterministically tie-broken per-user lead.

    Scale: one user-partitioned window (co-partitioned with every other
    per-user sequence op), a K^2-cell aggregate, and single-row algebra."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
    )
    c = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n_ij"))
    rowtot = c.groupBy("src").agg(F.sum("n_ij").alias("n_i"))
    cells = c.join(rowtot, "src").select(
        "n_ij",
        F.floor(
            -F.log(F.col("n_ij").cast("double") / F.col("n_i"))
            * F.col("n_ij")
            * 1000000
            + 0.5
        )
        .cast("long")
        .alias("h_q"),
    )
    tot = cells.agg(
        F.sum("n_ij").alias("n_trans"), F.sum("h_q").alias("sh_q")
    )
    k = rowtot.agg(F.count(F.lit(1)).alias("n_states"))
    return tot.crossJoin(F.broadcast(k)).select(
        "n_trans",
        "n_states",
        (F.floor(F.col("sh_q").cast("double") / F.col("n_trans") + 0.5) / 1000000)
        .alias("entropy_rate_nats"),
        round_half_up(F.log(F.col("n_states").cast("double")), 6).alias(
            "max_entropy_nats"
        ),
    )
