"""Probabilistic-sketch operators, made deterministic and oracle-checked.

Sketches are the 100 TB workhorses for cardinality, frequency, and
membership questions — a fixed-size summary replaces a corpus-sized
shuffle. Spark's built-ins (``approx_count_distinct``,
``count_min_sketch``, ``bloom_filter_agg``) are real HLL/CMS/Bloom
implementations but their register layouts are engine-private, so they
can never be hash-checked against another engine. These queries instead
build the textbook sketches from the repo's shared md5→bigint hash
(operators/dedup.py:52 ``token_hash``), with every register fold in
exact integer arithmetic — which makes an *approximate* algorithm
*bit-reproducible*, so the DuckDB oracle computes the identical sketch
and the driver's value-hash gate applies. Each query also carries the
exact answer next to the estimate, so the error the sketch trades away
is visible in the result instead of asserted in prose.

Scale shapes (the reason sketches exist):
- HLL / KMV: one groupBy over (group, register) — state per group is m
  integers (HLL) or k hashes (KMV), mergeable across partitions, so the
  map-side partial aggregation does almost all the work.
- Count-Min: the table is depth x width counters (256 rows here) —
  broadcast back for point queries; no corpus-sized join anywhere.
- Bloom pre-filter join: the build side collapses to <= k x |build|
  distinct bit positions, broadcast to the probe scan — the declarative
  form of the runtime bloom-pruned join Spark's planner applies when the
  build side is big enough to matter (probed at sf0.1: planner declines,
  creation side too small — this keeps the pattern testable).

Reference anchor: the reference aggregates distincts/counts exactly at
its ~20 rows/day scale (movies_analytics KPI marts); these are the
operators that answer the same questions when exact is no longer
affordable.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.numeric import count_if, project_fence, round_half_up
from ..operators.dedup import token_hash, token_hash_sql
from ..sources.lake import read_table
from . import register
from ..operators.checkpointing import cut_eager

# --- HyperLogLog ------------------------------------------------------------------

#: 2^5 = 32 registers; alpha_32 = 0.697 (Flajolet et al. 2007, published
#: constant for m = 32). The 60-bit hash splits 5 bucket bits + 55
#: pattern bits, so rho ranges 1..56 (56 = all-zero pattern).
_HLL_P = 5
_HLL_M = 1 << _HLL_P
_HLL_ALPHA = 0.697
_HLL_W_BITS = 60 - _HLL_P
_HLL_RHO_MAX = _HLL_W_BITS + 1
#: alpha * m^2 * 2^(rho_max): the estimator numerator as ONE Python float
#: literal inlined into both engines, so the multiply order can't drift.
_HLL_NUMER = _HLL_ALPHA * _HLL_M * _HLL_M * float(1 << _HLL_RHO_MAX)

_HLL_ORACLE = f"""
WITH h AS (
  SELECT event_type,
         {token_hash_sql("cast(user_id AS varchar)")} AS hv
  FROM events
),
r AS (
  SELECT event_type, (hv & {_HLL_M - 1}) AS bucket,
         CASE WHEN (hv >> {_HLL_P}) = 0 THEN {_HLL_RHO_MAX}
              ELSE strpos(lpad(bin(hv >> {_HLL_P}), {_HLL_W_BITS}, '0'), '1')
         END AS rho
  FROM h
),
reg AS (SELECT event_type, bucket, max(rho) AS m_j FROM r GROUP BY event_type, bucket),
spine AS (
  SELECT t.event_type, b.bucket
  FROM (SELECT DISTINCT event_type FROM events) t,
       (SELECT unnest(range(0, {_HLL_M})) AS bucket) b
),
full_reg AS (
  SELECT s.event_type, coalesce(reg.m_j, 0) AS m_j
  FROM spine s LEFT JOIN reg ON reg.event_type = s.event_type AND reg.bucket = s.bucket
),
acc AS (
  SELECT event_type,
         cast(sum(1::BIGINT << ({_HLL_RHO_MAX} - m_j)) AS bigint) AS s
  FROM full_reg GROUP BY event_type
),
ex AS (
  SELECT event_type, cast(count(DISTINCT user_id) AS bigint) AS exact_distinct_users
  FROM events GROUP BY event_type
),
est AS (
  SELECT acc.event_type,
         floor({_HLL_NUMER!r} / cast(s AS double) * 100 + 0.5) / 100 AS est_distinct_users,
         ex.exact_distinct_users
  FROM acc JOIN ex ON acc.event_type = ex.event_type
)
SELECT event_type, est_distinct_users, exact_distinct_users,
       floor(abs(est_distinct_users - exact_distinct_users) / exact_distinct_users
             * 10000 + 0.5) / 10000 AS rel_err
FROM est
"""


@register("hll_distinct_users", oracle=_HLL_ORACLE, tags=("extension", "sketch", "hll"))
def hll_distinct_users(spark, sf_dir):
    """HyperLogLog distinct-count estimate per event_type, bit-reproducible:
    60-bit md5 hash -> 5 bucket bits + rho = leading-zero rank of the 55
    pattern bits (via bin/lpad/instr — identical string semantics in both
    engines), register max per (group, bucket), and the harmonic fold
    sum(2^-M_j) scaled by 2^56 so it is an EXACT int64 sum (max 32 * 2^56
    = 2^61). One double division at the end. Raw estimator only — the
    small-range linear-counting correction needs ln(), whose libm rounding
    is not guaranteed identical across engines, so it is intentionally
    omitted and the exact count + relative error ship in the result.

    Scale: per-group state is 32 integers, partial-aggregatable — the
    canonical 100 TB distinct-count plan. approx_distinct_counts
    (parity_agg) shows Spark's native HLL; this one is oracle-checkable.
    """
    ev = read_table(spark, sf_dir, "events").select("event_type", "user_id")
    hv = token_hash(F.col("user_id").cast("string"))
    w = F.shiftright(hv, _HLL_P)
    rho = F.when(w == 0, F.lit(_HLL_RHO_MAX)).otherwise(
        F.instr(F.lpad(F.bin(w), _HLL_W_BITS, "0"), "1")
    )
    r = ev.select(
        "event_type", hv.bitwiseAND(F.lit(_HLL_M - 1)).alias("bucket"), rho.alias("rho")
    )
    reg = r.groupBy("event_type", "bucket").agg(F.max("rho").alias("m_j"))
    spine = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(_HLL_M - 1))).alias("b"),
        )
        .select("event_type", F.col("b").cast("long").alias("bucket"))
    )
    full_reg = spine.join(reg, ["event_type", "bucket"], "left").select(
        "event_type", F.coalesce(F.col("m_j"), F.lit(0)).alias("m_j")
    )
    acc = full_reg.groupBy("event_type").agg(
        # F.shiftleft needs a literal shift amount; the SQL form takes an
        # expression for both operands
        F.sum(F.expr(f"shiftleft(cast(1 AS bigint), {_HLL_RHO_MAX} - m_j)")).alias("s")
    )
    ex = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct_users")
    )
    est = round_half_up(F.lit(_HLL_NUMER) / F.col("s").cast("double"), 2)
    out = acc.join(ex, "event_type").select(
        "event_type", est.alias("est_distinct_users"), "exact_distinct_users"
    )
    rel = F.abs(F.col("est_distinct_users") - F.col("exact_distinct_users")) / F.col(
        "exact_distinct_users"
    )
    return out.select("*", round_half_up(rel, 4).alias("rel_err"))


# --- KMV (k minimum values) -------------------------------------------------------

_KMV_K = 32
#: (k-1) * 2^60: hashes are uniform on [0, 2^60), so the k-th smallest
#: distinct hash estimates the quantile k/n — n_hat = (k-1) * 2^60 / h_(k).
_KMV_NUMER = float((_KMV_K - 1) * (1 << 60))

_KMV_ORACLE = f"""
WITH h AS (
  SELECT DISTINCT event_type,
         {token_hash_sql("cast(user_id AS varchar)")} AS hv
  FROM events
),
kth AS (
  SELECT event_type, hv FROM h
  QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY hv) = {_KMV_K}
),
ex AS (
  SELECT event_type, cast(count(DISTINCT user_id) AS bigint) AS exact_distinct_users
  FROM events GROUP BY event_type
),
est AS (
  SELECT kth.event_type,
         floor({_KMV_NUMER!r} / cast(hv AS double) * 100 + 0.5) / 100 AS est_distinct_users,
         ex.exact_distinct_users
  FROM kth JOIN ex ON kth.event_type = ex.event_type
)
SELECT event_type, est_distinct_users, exact_distinct_users,
       floor(abs(est_distinct_users - exact_distinct_users) / exact_distinct_users
             * 10000 + 0.5) / 10000 AS rel_err
FROM est
"""


@register("kmv_distinct_users", oracle=_KMV_ORACLE, tags=("extension", "sketch", "kmv"))
def kmv_distinct_users(spark, sf_dir):
    """K-minimum-values distinct estimate per event_type: keep the k = 32
    smallest distinct 60-bit hashes; the k-th one pins the quantile, so
    n_hat = (k-1) * 2^60 / h_(k). Groups with fewer than k distinct
    values have no k-th hash and are (identically, in both engines)
    absent — KMV is undefined there; use the exact count. All-integer
    until one double division.

    Scale: per-group state is k hashes (a bounded priority queue in a real
    accumulator; here a partitioned row_number over the distinct relation)
    — like HLL, mergeable by unioning and re-truncating to k."""
    ev = read_table(spark, sf_dir, "events").select("event_type", "user_id")
    h = ev.select(
        "event_type", token_hash(F.col("user_id").cast("string")).alias("hv")
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("hv")
    kth = h.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == _KMV_K)
    ex = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct_users")
    )
    est = round_half_up(F.lit(_KMV_NUMER) / F.col("hv").cast("double"), 2)
    out = kth.join(ex, "event_type").select(
        "event_type", est.alias("est_distinct_users"), "exact_distinct_users"
    )
    rel = F.abs(F.col("est_distinct_users") - F.col("exact_distinct_users")) / F.col(
        "exact_distinct_users"
    )
    return out.select("*", round_half_up(rel, 4).alias("rel_err"))


# --- Count-Min frequency sketch ---------------------------------------------------

_CMS_DEPTH = 4
_CMS_WIDTH = 64  # power of two so bucket = hash & (width-1)


def _cms_hash_sql(depth_expr: str, key_expr: str) -> str:
    return (
        f"({token_hash_sql(f'concat(cast({depth_expr} AS varchar), {chr(39)}:{chr(39)}, {key_expr})')} "
        f"& {_CMS_WIDTH - 1})"
    )


_CMS_ORACLE = f"""
WITH ev AS (SELECT user_id, cast(user_id AS varchar) AS u FROM events),
hashed AS (
  SELECT user_id, u, d.d AS depth, {_cms_hash_sql("d.d", "u")} AS bucket
  FROM ev, (SELECT unnest(range(0, {_CMS_DEPTH})) AS d) d
),
tbl AS (
  SELECT depth, bucket, cast(count(*) AS bigint) AS c
  FROM hashed GROUP BY depth, bucket
),
pts AS (SELECT DISTINCT user_id, depth, bucket FROM hashed),
est AS (
  SELECT user_id, cast(min(c) AS bigint) AS est_count
  FROM pts JOIN tbl USING (depth, bucket) GROUP BY user_id
),
ex AS (SELECT user_id, cast(count(*) AS bigint) AS exact_count FROM events GROUP BY user_id)
SELECT est.user_id, est_count, ex.exact_count,
       est_count - exact_count AS overcount
FROM est JOIN ex ON est.user_id = ex.user_id
"""


@register(
    "countmin_user_frequencies",
    oracle=_CMS_ORACLE,
    tags=("extension", "sketch", "countmin"),
)
def countmin_user_frequencies(spark, sf_dir):
    """Count-Min sketch point queries: a depth x width (4 x 64) counter
    table — each event increments one bucket per depth row, an estimate is
    the min over the 4 rows. Pure integer arithmetic end to end, so the
    sketch (and every estimate) is bit-identical to the oracle's. The
    result carries est vs exact per user; ``overcount`` is provably >= 0
    (CMS never underestimates — asserted in tests).

    Scale: the sketch is 256 counters regardless of input size; the point
    query is a broadcast join of the table against the (tiny) distinct key
    relation. At 100 TB the table build is one map-side-combined groupBy."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", F.col("user_id").cast("string").alias("u")
    )
    depths = F.array(*[F.lit(d) for d in range(_CMS_DEPTH)])
    hashed = ev.select(
        "user_id",
        F.explode(depths).alias("depth"),
        "u",
    ).select(
        "user_id",
        "depth",
        token_hash(F.concat(F.col("depth").cast("string"), F.lit(":"), F.col("u")))
        .bitwiseAND(F.lit(_CMS_WIDTH - 1))
        .alias("bucket"),
    )
    tbl = hashed.groupBy("depth", "bucket").agg(F.count(F.lit(1)).alias("c"))
    pts = hashed.distinct()
    est = (
        pts.join(F.broadcast(tbl), ["depth", "bucket"])
        .groupBy("user_id")
        .agg(F.min("c").alias("est_count"))
    )
    ex = (
        read_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    return est.join(ex, "user_id").select(
        "user_id",
        "est_count",
        "exact_count",
        (F.col("est_count") - F.col("exact_count")).alias("overcount"),
    )


# --- Bloom-filter pre-filter join -------------------------------------------------

_BLOOM_BITS = 1024
_BLOOM_K = 3


def _bloom_pos_sql(j_expr: str, key_expr: str) -> str:
    return (
        f"({token_hash_sql(f'concat(cast({j_expr} AS varchar), {chr(39)}:{chr(39)}, cast({key_expr} AS varchar))')} "
        f"& {_BLOOM_BITS - 1})"
    )


_BLOOM_ORACLE = f"""
WITH build AS (SELECT DISTINCT c_custkey FROM customer WHERE c_acctbal < 0),
pos AS (
  SELECT DISTINCT {_bloom_pos_sql("j.j", "c_custkey")} AS pos
  FROM build, (SELECT unnest(range(0, {_BLOOM_K})) AS j) j
),
probe_pos AS (
  SELECT o_orderkey, {_bloom_pos_sql("j.j", "o_custkey")} AS pos
  FROM orders, (SELECT unnest(range(0, {_BLOOM_K})) AS j) j
),
hits AS (
  SELECT o_orderkey, count(*) AS nhit
  FROM probe_pos JOIN pos USING (pos) GROUP BY o_orderkey
),
flags AS (
  SELECT o.o_orderkey,
         coalesce(h.nhit, 0) = {_BLOOM_K} AS bloom_pass,
         b.c_custkey IS NOT NULL AS exact_match
  FROM orders o
  LEFT JOIN hits h ON h.o_orderkey = o.o_orderkey
  LEFT JOIN build b ON b.c_custkey = o.o_custkey
)
SELECT cast(count(*) AS bigint) AS n_probe_orders,
       cast(sum(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS bigint) AS n_bloom_pass,
       cast(sum(CASE WHEN exact_match THEN 1 ELSE 0 END) AS bigint) AS n_exact_match,
       cast(sum(CASE WHEN bloom_pass AND NOT exact_match THEN 1 ELSE 0 END) AS bigint)
         AS n_false_positive
FROM flags
"""


@register(
    "bloom_prefilter_orders",
    oracle=_BLOOM_ORACLE,
    tags=("extension", "sketch", "bloom"),
)
def bloom_prefilter_orders(spark, sf_dir):
    """Bloom-filter pre-filter for a semi join: the build side (customers
    with negative balance) collapses to its set bits — k = 3 md5-derived
    positions in a 1024-bit space, materialized as a distinct-positions
    relation and broadcast. A probe order "bloom-passes" iff all 3 of its
    positions are set. The result quantifies the filter: probe count,
    bloom passes, exact matches, and false positives (passes that the
    exact semi join rejects). No false negatives by construction — every
    exact match bloom-passes, so n_bloom_pass >= n_exact_match always.

    Scale: this is the declarative twin of Spark's runtime bloom-pruned
    join (spark.sql.optimizer.runtime.bloomFilter.enabled) — at 100 TB the
    broadcast bit-set prunes the probe scan before the expensive shuffle
    join; here the same effect is a broadcast equi-join on bit position."""
    cust = (
        read_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") < 0)
        .select("c_custkey")
        .distinct()
    )
    js = F.array(*[F.lit(j) for j in range(_BLOOM_K)])

    def positions(df, key):
        return df.select(
            "*", F.explode(js).alias("j")
        ).select(
            "*",
            token_hash(
                F.concat(
                    F.col("j").cast("string"), F.lit(":"), F.col(key).cast("string")
                )
            )
            .bitwiseAND(F.lit(_BLOOM_BITS - 1))
            .alias("pos"),
        )

    bits = positions(cust, "c_custkey").select("pos").distinct()
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    probe_pos = positions(orders, "o_custkey").select("o_orderkey", "pos")
    hits = (
        probe_pos.join(F.broadcast(bits), "pos")
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("nhit"))
    )
    build_flag = cust.withColumnRenamed("c_custkey", "o_custkey").withColumn(
        "in_set", F.lit(1)
    )
    flags = (
        orders.join(hits, "o_orderkey", "left")
        .join(F.broadcast(build_flag), "o_custkey", "left")
        .select(
            (F.coalesce(F.col("nhit"), F.lit(0)) == _BLOOM_K).alias("bloom_pass"),
            F.col("in_set").isNotNull().alias("exact_match"),
        )
    )
    return flags.agg(
        F.count(F.lit(1)).alias("n_probe_orders"),
        count_if(F.col("bloom_pass")).alias("n_bloom_pass"),
        count_if(F.col("exact_match")).alias("n_exact_match"),
        count_if(F.col("bloom_pass") & ~F.col("exact_match")).alias("n_false_positive"),
    )


# --- KMV set operations (sketch union / intersection) -----------------------------

#: 2^60 as a float literal shared by both engines (the hash domain size).
_KMV_DOMAIN = float(1 << 60)

_KMV_SETOPS_ORACLE = f"""
WITH h AS (
  SELECT DISTINCT event_type,
         {token_hash_sql("cast(user_id AS varchar)")} AS hv
  FROM events WHERE event_type IN ('view', 'purchase')
),
ka AS (
  SELECT hv FROM h WHERE event_type = 'view'
  QUALIFY row_number() OVER (ORDER BY hv) <= {_KMV_K}
),
kb AS (
  SELECT hv FROM h WHERE event_type = 'purchase'
  QUALIFY row_number() OVER (ORDER BY hv) <= {_KMV_K}
),
uk AS (
  SELECT hv FROM (SELECT hv FROM ka UNION SELECT hv FROM kb)
  QUALIFY row_number() OVER (ORDER BY hv) <= {_KMV_K}
),
acc AS (
  SELECT max(hv) AS hk, cast(count(*) AS bigint) AS kcnt,
         cast(sum(CASE WHEN hv IN (SELECT hv FROM ka)
                        AND hv IN (SELECT hv FROM kb) THEN 1 ELSE 0 END) AS bigint)
           AS cnt_both
  FROM uk
),
ex AS (
  SELECT cast(count(DISTINCT user_id) AS bigint) AS exact_union,
         cast(count(DISTINCT CASE WHEN n_types = 2 THEN user_id END) AS bigint)
           AS exact_intersection
  FROM (
    SELECT user_id, count(DISTINCT event_type) AS n_types
    FROM events WHERE event_type IN ('view', 'purchase') GROUP BY user_id
  )
)
SELECT CASE WHEN kcnt < {_KMV_K} THEN cast(kcnt AS double)
            ELSE floor(cast(kcnt - 1 AS double) * {_KMV_DOMAIN!r}
                       / cast(hk AS double) * 100 + 0.5) / 100
       END AS est_union_users,
       ex.exact_union,
       CASE WHEN kcnt < {_KMV_K} THEN cast(cnt_both AS double)
            ELSE floor(cast(kcnt - 1 AS double) * {_KMV_DOMAIN!r}
                       / cast(hk AS double) * cnt_both / kcnt * 100 + 0.5) / 100
       END AS est_intersection_users,
       ex.exact_intersection
FROM acc, ex
"""


@register(
    "kmv_set_operations",
    oracle=_KMV_SETOPS_ORACLE,
    tags=("extension", "sketch", "kmv"),
)
def kmv_set_operations(spark, sf_dir):
    """Set algebra ON the sketches: estimate |view-users UNION
    purchase-users| and their intersection from two KMV sketches alone —
    the reason KMV (and theta sketches generally) beat HLL for audience
    overlap: union = re-truncate the merged minima to k; intersection =
    union_est * (fraction of the union's k minima present in BOTH input
    sketches). The merge touches only 2k hashes (orderBy().limit(k) —
    TakeOrdered, no global window); exact answers ride along for the
    error columns. One double-division chain in a fixed order keeps both
    engines bit-identical."""
    ev = (
        read_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("view", "purchase"))
        .select("event_type", "user_id")
    )
    h = ev.select(
        "event_type", token_hash(F.col("user_id").cast("string")).alias("hv")
    ).distinct()
    ka = h.where(F.col("event_type") == "view").select("hv").orderBy("hv").limit(_KMV_K)
    kb = (
        h.where(F.col("event_type") == "purchase")
        .select("hv")
        .orderBy("hv")
        .limit(_KMV_K)
    )
    uk = ka.union(kb).distinct().orderBy("hv").limit(_KMV_K)
    in_a = ka.withColumnRenamed("hv", "hv_a")
    in_b = kb.withColumnRenamed("hv", "hv_b")
    marked = (
        uk.join(F.broadcast(in_a), uk["hv"] == in_a["hv_a"], "left")
        .join(F.broadcast(in_b), uk["hv"] == in_b["hv_b"], "left")
        .select(
            "hv",
            (F.col("hv_a").isNotNull() & F.col("hv_b").isNotNull()).alias("in_both"),
        )
    )
    acc = marked.agg(
        F.max("hv").alias("hk"),
        F.count(F.lit(1)).alias("kcnt"),
        count_if(F.col("in_both")).alias("cnt_both"),
    )
    per_user = ev.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("n_types")
    )
    ex = per_user.agg(
        F.countDistinct("user_id").alias("exact_union"),
        F.countDistinct(F.when(F.col("n_types") == 2, F.col("user_id"))).alias(
            "exact_intersection"
        ),
    )
    est_union = (
        (F.col("kcnt") - 1).cast("double")
        * F.lit(_KMV_DOMAIN)
        / F.col("hk").cast("double")
    )
    est_inter = est_union * F.col("cnt_both") / F.col("kcnt")
    # under-full sketch (kcnt < k): the merged minima ARE the whole key
    # set — report the exact counts instead of an estimate (KMV's exact
    # small-cardinality regime, mirrored in the oracle)
    small = F.col("kcnt") < _KMV_K
    return acc.crossJoin(ex).select(
        F.when(small, F.col("kcnt").cast("double"))
        .otherwise(round_half_up(est_union, 2))
        .alias("est_union_users"),
        "exact_union",
        F.when(small, F.col("cnt_both").cast("double"))
        .otherwise(round_half_up(est_inter, 2))
        .alias("est_intersection_users"),
        "exact_intersection",
    )


# --- KMV join-cardinality estimation ----------------------------------------------


_JSE_ORACLE = f"""
WITH he AS (
  SELECT DISTINCT {token_hash_sql("cast(user_id AS varchar)")} AS hv FROM events
),
ho AS (
  SELECT DISTINCT {token_hash_sql("cast(o_custkey AS varchar)")} AS hv FROM orders
),
ke AS (
  SELECT max(hv) AS hv, count(*) AS n
  FROM (SELECT hv FROM he ORDER BY hv LIMIT {_KMV_K}) t
),
ko AS (
  SELECT max(hv) AS hv, count(*) AS n
  FROM (SELECT hv FROM ho ORDER BY hv LIMIT {_KMV_K}) t
),
ests AS (
  SELECT CASE WHEN ke.n < {_KMV_K} THEN cast(ke.n AS double)
              ELSE floor({_KMV_NUMER!r} / cast(ke.hv AS double) * 100 + 0.5) / 100
         END AS est_ndv_users,
         CASE WHEN ko.n < {_KMV_K} THEN cast(ko.n AS double)
              ELSE floor({_KMV_NUMER!r} / cast(ko.hv AS double) * 100 + 0.5) / 100
         END AS est_ndv_custs
  FROM ke, ko
),
counts AS (
  SELECT (SELECT cast(count(*) AS bigint) FROM events) AS n_events,
         (SELECT cast(count(*) AS bigint) FROM orders) AS n_orders
),
exact AS (
  SELECT cast(coalesce(sum(ce.n * co.n), 0) AS bigint) AS exact_join_rows
  FROM (SELECT user_id AS k, count(*) AS n FROM events GROUP BY user_id) ce
  JOIN (SELECT o_custkey AS k, count(*) AS n FROM orders GROUP BY o_custkey) co
    ON ce.k = co.k
)
SELECT c.n_events, c.n_orders, e.est_ndv_users, e.est_ndv_custs,
       floor(cast(c.n_events AS double) * cast(c.n_orders AS double)
             / greatest(e.est_ndv_users, e.est_ndv_custs) * 100 + 0.5) / 100
         AS est_join_rows,
       x.exact_join_rows
FROM counts c, ests e, exact x
"""


@register(
    "join_size_estimate_kmv",
    oracle=_JSE_ORACLE,
    tags=("extension", "sketch", "kmv", "optimizer"),
)
def join_size_estimate_kmv(spark, sf_dir):
    """Join-cardinality estimation, the optimizer primitive, as a query:
    estimate |events JOIN orders ON user_id = o_custkey| from two KMV
    sketches using the System-R uniform-frequency model
    ``|L|*|R| / max(ndv_L, ndv_R)`` — then audit it against the exact join
    size. The exact size never materializes the join: it is
    ``sum(cnt_L(k) * cnt_R(k))`` over the two per-key count aggregates —
    an aggregate-sized equi-join, the scalable way to measure a join you
    are deciding whether to run.

    Determinism: both sketch estimates are the KMV single-division form,
    floor-rounded BEFORE entering the estimate formula, so every engine
    sees identical doubles; the final estimate is one more
    multiply-divide-round of those. When a side holds fewer than K
    distinct hashes the sketch contains the WHOLE key set, so the
    estimator returns the exact retained count — the standard KMV
    small-cardinality regime (estimating from the last-seen minimum
    instead would bias high on exactly the inputs a sketch gets right)."""
    ev = read_table(spark, sf_dir, "events").select("user_id")
    od = read_table(spark, sf_dir, "orders").select("o_custkey")

    def kth_min(df, col):
        h = df.select(token_hash(F.col(col).cast("string")).alias("hv")).distinct()
        return (
            h.orderBy("hv")
            .limit(_KMV_K)
            .agg(F.max("hv").alias("hv"), F.count(F.lit(1)).alias("n"))
            .select(
                F.when(F.col("n") < _KMV_K, F.col("n").cast("double")).otherwise(
                    round_half_up(F.lit(_KMV_NUMER) / F.col("hv").cast("double"), 2)
                )
            )
        )

    est_e = kth_min(ev, "user_id").toDF("est_ndv_users")
    est_o = kth_min(od, "o_custkey").toDF("est_ndv_custs")
    counts = ev.agg(F.count(F.lit(1)).cast("long").alias("n_events")).crossJoin(
        od.agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )
    ce = ev.groupBy(F.col("user_id").alias("k")).agg(F.count(F.lit(1)).alias("n"))
    co = od.groupBy(F.col("o_custkey").alias("k")).agg(F.count(F.lit(1)).alias("n"))
    exact = (
        ce.join(co, "k")
        .select((ce["n"] * co["n"]).alias("prod"))
        .agg(F.coalesce(F.sum("prod"), F.lit(0)).cast("long").alias("exact_join_rows"))
    )
    est_join = round_half_up(
        F.col("n_events").cast("double")
        * F.col("n_orders").cast("double")
        / F.greatest(F.col("est_ndv_users"), F.col("est_ndv_custs")),
        2,
    )
    return (
        counts.crossJoin(F.broadcast(est_e))
        .crossJoin(F.broadcast(est_o))
        .crossJoin(F.broadcast(exact))
        .select(
            "n_events",
            "n_orders",
            "est_ndv_users",
            "est_ndv_custs",
            est_join.alias("est_join_rows"),
            "exact_join_rows",
        )
    )


# --- HLL register merge over rolling windows ----------------------------------------

_HLL7_ORACLE = f"""
WITH h AS (
  SELECT cast(ts AS date) AS day,
         {token_hash_sql("cast(user_id AS varchar)")} AS hv,
         user_id
  FROM events
),
r AS (
  SELECT day, (hv & {_HLL_M - 1}) AS bucket,
         CASE WHEN (hv >> {_HLL_P}) = 0 THEN {_HLL_RHO_MAX}
              ELSE strpos(lpad(bin(hv >> {_HLL_P}), {_HLL_W_BITS}, '0'), '1')
         END AS rho
  FROM h
),
daily AS (SELECT day, bucket, max(rho) AS m_j FROM r GROUP BY day, bucket),
spine AS (SELECT DISTINCT day FROM h),
merged AS (
  SELECT s.day, d.bucket, max(d.m_j) AS m_j
  FROM spine s
  JOIN daily d ON d.day BETWEEN s.day - INTERVAL 6 DAY AND s.day
  GROUP BY s.day, d.bucket
),
full_reg AS (
  SELECT s.day, coalesce(m.m_j, 0) AS m_j
  FROM (SELECT spine.day, b.bucket
        FROM spine, (SELECT unnest(range(0, {_HLL_M})) AS bucket) b) s
  LEFT JOIN merged m ON m.day = s.day AND m.bucket = s.bucket
),
acc AS (
  SELECT day, cast(sum(1::BIGINT << ({_HLL_RHO_MAX} - m_j)) AS bigint) AS s
  FROM full_reg GROUP BY day
),
ex AS (
  SELECT s.day, cast(count(DISTINCT h.user_id) AS bigint) AS exact_users_7d
  FROM spine s JOIN h ON h.day BETWEEN s.day - INTERVAL 6 DAY AND s.day
  GROUP BY s.day
)
SELECT acc.day,
       floor({_HLL_NUMER!r} / cast(acc.s AS double) * 100 + 0.5) / 100
         AS est_users_7d,
       ex.exact_users_7d,
       floor(abs(floor({_HLL_NUMER!r} / cast(acc.s AS double) * 100 + 0.5) / 100
                 - ex.exact_users_7d) / ex.exact_users_7d * 10000 + 0.5) / 10000
         AS rel_err
FROM acc JOIN ex ON acc.day = ex.day
"""


@register(
    "hll_rolling_7d_users",
    oracle=_HLL7_ORACLE,
    tags=("extension", "sketch", "hll", "window"),
)
def hll_rolling_7d_users(spark, sf_dir):
    """Rolling 7-day distinct users per day via HLL REGISTER MERGE — the
    operation that makes sketches the 100 TB answer: daily 32-register
    summaries are computed ONCE from the events, and every window query
    after that merges 7 register sets (elementwise max, associative and
    idempotent) instead of re-scanning a week of raw data. Because max
    is associative, the merged estimate is bit-identical to the
    from-scratch estimate over the window (pinned in
    tests/test_sketches.py).

    Scale: the corpus-sized work is the one (day, bucket) aggregate —
    everything downstream joins day-spine-sized relations (days x 32
    registers). The exact rolling count beside it re-scans the week per
    day, which is exactly the cost the sketch removes; it ships in the
    result to keep the traded error visible.
    """
    ev = read_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    hv = token_hash(F.col("user_id").cast("string"))
    w = F.shiftright(hv, _HLL_P)
    rho = F.when(w == 0, F.lit(_HLL_RHO_MAX)).otherwise(
        F.instr(F.lpad(F.bin(w), _HLL_W_BITS, "0"), "1")
    )
    r = ev.select(
        "day", hv.bitwiseAND(F.lit(_HLL_M - 1)).alias("bucket"), rho.alias("rho")
    )
    daily = r.groupBy("day", "bucket").agg(F.max("rho").alias("m_j"))
    spine = ev.select("day").distinct()
    d = daily.select(
        F.col("day").alias("dday"), F.col("bucket"), F.col("m_j")
    )
    merged = (
        spine.join(
            F.broadcast(d),
            (F.col("dday") >= F.date_sub(F.col("day"), 6))
            & (F.col("dday") <= F.col("day")),
        )
        .groupBy("day", "bucket")
        .agg(F.max("m_j").alias("m_j"))
    )
    full_spine = spine.select(
        "day", F.explode(F.sequence(F.lit(0), F.lit(_HLL_M - 1))).alias("b")
    ).select("day", F.col("b").cast("long").alias("bucket"))
    full_reg = full_spine.join(merged, ["day", "bucket"], "left").select(
        "day", F.coalesce(F.col("m_j"), F.lit(0)).alias("m_j")
    )
    acc = full_reg.groupBy("day").agg(
        F.sum(F.expr(f"shiftleft(cast(1 AS bigint), {_HLL_RHO_MAX} - m_j)")).alias("s")
    )
    ex = (
        spine.join(
            ev.select(F.col("day").alias("eday"), "user_id"),
            (F.col("eday") >= F.date_sub(F.col("day"), 6))
            & (F.col("eday") <= F.col("day")),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("exact_users_7d"))
    )
    est = round_half_up(F.lit(_HLL_NUMER) / F.col("s").cast("double"), 2)
    return (
        acc.join(ex, "day")
        .select(
            "day",
            est.alias("est_users_7d"),
            "exact_users_7d",
            round_half_up(
                F.abs(est - F.col("exact_users_7d"))
                / F.col("exact_users_7d"),
                4,
            ).alias("rel_err"),
        )
    )


# --- priority sampling (weighted bottom-k with unbiased estimator) ------------------

_PRIO_K = 64
_PRIO_U_SPAN = float(1 << 60)

_PRIO_ORACLE = f"""
WITH w AS (
  SELECT o_orderkey AS k,
         cast(floor(o_totalprice * 100 + 0.5) AS bigint) AS w_cents,
         {token_hash_sql("cast(o_orderkey AS varchar)")} + 1 AS u_scaled
  FROM orders
),
q AS (
  SELECT k, w_cents,
         cast(w_cents AS double) * {_PRIO_U_SPAN!r} / u_scaled AS q
  FROM w
),
top AS (
  SELECT k, w_cents, q,
         row_number() OVER (ORDER BY q DESC, k) AS rn
  FROM q ORDER BY q DESC, k LIMIT {_PRIO_K + 1}
),
tau AS (SELECT q AS tau FROM top WHERE rn = {_PRIO_K + 1}),
est AS (
  SELECT cast(sum(cast(floor(greatest(cast(w_cents AS double), tau.tau) + 0.5)
                       AS bigint)) AS bigint) AS est_cents
  FROM top, tau WHERE rn <= {_PRIO_K}
),
ex AS (SELECT cast(sum(w_cents) AS bigint) AS exact_cents FROM w)
SELECT {_PRIO_K} AS k_sample,
       floor(cast(est.est_cents AS double) + 0.5) / 100 AS est_total,
       floor(cast(ex.exact_cents AS double) + 0.5) / 100 AS exact_total,
       floor(abs(cast(est.est_cents AS double) - ex.exact_cents)
             / ex.exact_cents * 1000000 + 0.5) / 1000000 AS rel_err
FROM est, ex
"""


@register(
    "priority_sample_total",
    oracle=_PRIO_ORACLE,
    tags=("extension", "sketch", "sampling"),
)
def priority_sample_total(spark, sf_dir, salt: str = ""):
    """Priority sampling (Duffield, Lund & Thorup 2007): a weighted
    bottom-k sample of orders with the UNBIASED subset-sum estimator —
    priority q_i = w_i / u_i (u_i a deterministic hash uniform), keep
    the top {k} priorities, and estimate the total as
    sum(max(w_i, tau)) over the sample, tau = the (k+1)-th priority.
    The exact total and relative error ship beside the estimate, like
    every sketch here. Requires > {k}+1 rows (holds at every SF).

    Determinism: u_i derives from the 60-bit md5 hash; priorities are
    fixed IEEE doubles over exact ints, the top cut is total-ordered
    (q desc, key), and each estimator term quantizes to integer cents
    before the order-free sum.

    Scale: ONE TakeOrdered top-({k}+1) over the fact (no global sort,
    no window — rank within the {k}+1 survivors is a tiny broadcast
    count-join); the estimate then touches {k} rows. This is the
    classic "estimate a 100 TB sum from a fixed-size weighted sample"
    primitive, mergeable by re-ranking unions of samples.
    """.format(k=_PRIO_K)
    o = read_table(spark, sf_dir, "orders")
    w = o.select(
        F.col("o_orderkey").alias("k"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("w_cents"),
        (
            token_hash(F.concat(F.col("o_orderkey").cast("string"), F.lit(salt)))
            + 1
        ).alias("u_scaled"),
    )
    q = w.select(
        "k",
        "w_cents",
        (F.col("w_cents").cast("double") * _PRIO_U_SPAN / F.col("u_scaled")).alias("q"),
    )
    top = (
        q.orderBy(F.desc("q"), F.asc("k")).limit(_PRIO_K + 1).transform(cut_eager)
    )
    from ..operators.ranking import rank_by_count_join

    ranked = rank_by_count_join(top, value_col="q", id_col="k")
    tau = ranked.where(F.col("rn") == _PRIO_K + 1).select(F.col("q").alias("tau"))
    est = (
        ranked.where(F.col("rn") <= _PRIO_K)
        .crossJoin(F.broadcast(tau))
        .agg(
            F.sum(
                F.floor(
                    F.greatest(F.col("w_cents").cast("double"), F.col("tau")) + 0.5
                ).cast("long")
            ).alias("est_cents")
        )
    )
    ex = w.agg(F.sum("w_cents").alias("exact_cents"))
    return (
        est.crossJoin(F.broadcast(ex))
        .select(
            F.lit(_PRIO_K).alias("k_sample"),
            (F.floor(F.col("est_cents").cast("double") + 0.5) / 100).alias(
                "est_total"
            ),
            (F.floor(F.col("exact_cents").cast("double") + 0.5) / 100).alias(
                "exact_total"
            ),
            round_half_up(
                F.abs(F.col("est_cents").cast("double") - F.col("exact_cents"))
                / F.col("exact_cents"),
                6,
            ).alias("rel_err"),
        )
    )


# --- jackknife standard error via hash buckets --------------------------------------

_JK_B = 20

_JK_ORACLE = f"""
WITH s AS (
  SELECT {token_hash_sql("cast(o_orderkey AS varchar)")} % {_JK_B} AS b,
         cast(floor(o_totalprice * 100 + 0.5) AS bigint) AS cents
  FROM orders
),
bk AS (
  SELECT b, cast(sum(cents) AS bigint) AS sc, cast(count(*) AS bigint) AS n
  FROM s GROUP BY b
),
tot AS (
  SELECT cast(sum(sc) AS bigint) AS sc_all, cast(sum(n) AS bigint) AS n_all,
         cast(count(*) AS bigint) AS nb
  FROM bk
),
loo AS (
  SELECT cast(tot.sc_all - bk.sc AS double) / (tot.n_all - bk.n) AS m_i,
         cast(tot.sc_all AS double) / tot.n_all AS m_full, tot.nb
  FROM bk, tot
),
v AS (
  SELECT nb, m_full,
         sum((m_i - avg_m) * (m_i - avg_m)) AS ss
  FROM (SELECT nb, m_full, m_i, avg(m_i) OVER () AS avg_m FROM loo)
  GROUP BY nb, m_full
)
SELECT floor(m_full + 0.5) / 100 AS mean_price,
       floor(sqrt((nb - 1.0) / nb * ss) + 0.5) / 100 AS jackknife_se,
       floor(m_full - 1.96 * sqrt((nb - 1.0) / nb * ss) + 0.5) / 100 AS ci_low,
       floor(m_full + 1.96 * sqrt((nb - 1.0) / nb * ss) + 0.5) / 100 AS ci_high,
       cast(nb AS bigint) AS n_buckets
FROM v
"""


@register(
    "jackknife_mean_se",
    oracle=_JK_ORACLE,
    tags=("extension", "sketch", "uncertainty"),
)
def jackknife_mean_se(spark, sf_dir):
    """Delete-one-bucket jackknife standard error of the mean order price
    (Efron's grouped jackknife): rows hash into {b} buckets, each
    leave-one-bucket-out mean recomputes FROM THE BUCKET SUMS (never a
    second data pass), and the spread of the {b} replicates gives the SE
    and a 1.96-sigma interval — the error bar any reported aggregate
    should carry, with one extra tiny aggregate as its whole cost.

    Exactness: bucket sums are integer cents; the replicate means and
    the variance of {b} replicates are fixed IEEE expressions over those
    exact integers (the {b}-row mean uses a window over the complete
    {b}-row relation in the oracle and a 1-row broadcast here — same
    arithmetic).

    Scale: ONE map-side-combined {b}-group aggregate over the fact; the
    jackknife algebra runs on {b} rows. Mergeable: shard bucket sums
    union and re-aggregate.""".format(b=_JK_B)
    o = read_table(spark, sf_dir, "orders")
    s = o.select(
        (token_hash(F.col("o_orderkey").cast("string")) % _JK_B).alias("b"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    bk = s.groupBy("b").agg(
        F.sum("cents").alias("sc"), F.count(F.lit(1)).alias("n")
    )
    tot = bk.agg(
        F.sum("sc").alias("sc_all"), F.sum("n").alias("n_all"),
        F.count(F.lit(1)).alias("nb"),
    )
    loo = bk.crossJoin(F.broadcast(tot)).select(
        ((F.col("sc_all") - F.col("sc")).cast("double") / (F.col("n_all") - F.col("n")))
        .alias("m_i"),
        (F.col("sc_all").cast("double") / F.col("n_all")).alias("m_full"),
        "nb",
    )
    avg_m = loo.agg(F.avg("m_i").alias("avg_m"))
    v = (
        loo.crossJoin(F.broadcast(avg_m))
        .groupBy("nb", "m_full")
        .agg(F.sum((F.col("m_i") - F.col("avg_m")) * (F.col("m_i") - F.col("avg_m"))).alias("ss"))
    )
    se = F.sqrt((F.col("nb") - 1.0) / F.col("nb") * F.col("ss"))
    return v.select(
        (F.floor(F.col("m_full") + 0.5) / 100).alias("mean_price"),
        (F.floor(se + 0.5) / 100).alias("jackknife_se"),
        (F.floor(F.col("m_full") - 1.96 * se + 0.5) / 100).alias("ci_low"),
        (F.floor(F.col("m_full") + 1.96 * se + 0.5) / 100).alias("ci_high"),
        F.col("nb").cast("long").alias("n_buckets"),
    )


# --- Poisson bootstrap confidence interval -------------------------------------------

# Poisson(1) CDF * 1e6, floored — P(X <= k) for k = 0..9; a uniform draw
# u in [0, 1e6) maps to weight w = #{thresholds <= u}, capping at 10.
_BOOT_CDF = [367879, 735758, 919698, 981011, 996340, 999405, 999916, 999989, 999998, 999999]
_BOOT_B = 200
_BOOT_LO = 5  # ceil(0.025 * B)
_BOOT_HI = 195  # ceil(0.975 * B)

_BOOT_ORACLE = f"""
WITH cust AS (
  SELECT o_custkey,
         cast(sum(cast(floor(o_totalprice * 100 + 0.5) AS bigint)) AS bigint) AS cents
  FROM orders GROUP BY o_custkey
),
tot AS (
  SELECT cast(sum(cents) AS bigint) AS sc, cast(count(*) AS bigint) AS n FROM cust
),
reps AS (SELECT cast(unnest(range(1, {_BOOT_B + 1})) AS integer) AS b),
weighted AS (
  SELECT r.b,
         cast(len(list_filter({list(_BOOT_CDF)},
              t -> ({token_hash_sql("concat(cast(c.o_custkey AS varchar), '|boot|', cast(r.b AS varchar))")}) % 1000000 >= t)) AS bigint) AS w,
         c.cents
  FROM cust c JOIN reps r ON true
),
means AS (
  SELECT b, cast(sum(w * cents) AS double) / sum(w) AS m
  FROM weighted GROUP BY b
),
arr AS (SELECT list_sort(list(m)) AS a, cast(count(*) AS bigint) AS n_reps FROM means)
SELECT n_reps,
       floor(cast(t.sc AS double) / t.n + 0.5) / 100 AS mean_spend,
       floor(a[{_BOOT_LO}] + 0.5) / 100 AS ci_lo,
       floor(a[{_BOOT_HI}] + 0.5) / 100 AS ci_hi
FROM arr, tot t
"""


@register(
    "poisson_bootstrap_ci",
    oracle=_BOOT_ORACLE,
    tags=("extension", "sketch", "uncertainty", "bootstrap"),
)
def poisson_bootstrap_ci(spark, sf_dir):
    """Poisson bootstrap CI for mean customer spend: each (customer,
    replicate) draws a Poisson(1) resampling weight from a deterministic
    hash (the distributed bootstrap — resample by weight, never by copy;
    Chamandy et al. 2012, "Estimating Uncertainty for Massive Data
    Streams"), each of the 200 replicates averages w*x/w, and the 2.5/97.5
    percentile replicate means bound the interval.

    Exactness: weights come from integer thresholds on a shared 60-bit
    hash; replicate sums are exact int64; each replicate mean is one
    double division; percentile selection is by exact sort position
    (never an interpolating percentile function).

    Scale: weights are in-row; the per-replicate aggregate is map-side
    combined, so only B x n_partitions partial rows shuffle; the final
    percentile runs over B=200 rows. The grain deliberately bootstraps
    the per-customer rollup (cluster-bootstrap over customers), so the
    replicate stage is dimension-sized, not fact-sized."""
    o = read_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")).alias("cents")
    )
    tot = cust.agg(
        F.sum("cents").alias("sc"), F.count(F.lit(1)).alias("n")
    )
    reps = F.explode(F.array(*[F.lit(b) for b in range(1, _BOOT_B + 1)])).alias("b")
    u = token_hash(
        F.concat(
            F.col("o_custkey").cast("string"), F.lit("|boot|"), F.col("b").cast("string")
        )
    ) % 1000000
    # the hash computes ONCE per (customer, replicate) row behind a
    # project_fence — inlined into the CDF filter lambda it would run
    # once per CDF element (10x the md5 work)
    w = F.size(
        F.filter(
            F.array(*[F.lit(t) for t in _BOOT_CDF]), lambda t: F.col("u") >= t
        )
    ).cast("long")
    weighted = project_fence(
        cust.select("o_custkey", "cents", reps).select("b", u.alias("u"), "cents")
    ).select("b", w.alias("w"), "cents")
    means = weighted.groupBy("b").agg(
        (F.sum(F.col("w") * F.col("cents")).cast("double") / F.sum("w")).alias("m")
    )
    arr = means.agg(
        F.sort_array(F.collect_list("m")).alias("a"),
        F.count(F.lit(1)).alias("n_reps"),
    )
    return arr.crossJoin(F.broadcast(tot)).select(
        "n_reps",
        (F.floor(F.col("sc").cast("double") / F.col("n") + 0.5) / 100).alias(
            "mean_spend"
        ),
        (F.floor(F.element_at("a", _BOOT_LO) + 0.5) / 100).alias("ci_lo"),
        (F.floor(F.element_at("a", _BOOT_HI) + 0.5) / 100).alias("ci_hi"),
    )
