"""The rest of the TPC-H query surface, adapted to the testdata schema.

``parity_tpch`` covers Q1/Q3/Q5/Q6/Q7/Q9/Q10/Q15/Q17; this module finishes
the suite with the shapes that exercise machinery none of those touch:
non-equi semi-joins (Q4), anti-joins with correlated NOT EXISTS (Q21, Q22),
double aggregation (Q13), disjunctive join predicates (Q19), conditional
market-share ratios (Q8, Q12, Q14) and HAVING over a fact rollup (Q18).

The testdata schema omits ``l_commitdate``/``l_receiptdate``/``l_shipmode``
/``o_comment``/``c_phone`` and the ``partsupp`` table, so those predicates
are re-expressed over existing columns ("late" = shipped >30 days after the
order date; country code = nation key; ship mode = return flag) — the join
topology, decorrelation strategy, and aggregate structure of each original
query are preserved, which is what matters for the engine. Q2/Q11/Q16/Q20
need ``partsupp`` as the driving fact; they run over a deterministic
SYNTHESIZED partsupp (one row per distinct lineitem (part, supp) pair,
hash-derived availqty / integer-cents cost, definition shared verbatim with
the oracles) — see the section comment above ``_PS_SQL``. That completes
the 22-query suite in operator-shape terms; swap ``_partsupp``/``_PS_SQL``
for the real table when the testdata grows one.

Scale notes: every dimension side broadcasts; the only big shuffles are
lineitem⋈orders on orderkey, which semi/anti probes then reuse. Top-k is
always ``orderBy().limit()`` (TakeOrderedAndProject), never a global window.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.numeric import (
    DEC,
    exact_sum,
    oracle_sum,
    round_half_up,
    rounded_sum,
)
from ..sources.lake import read_table
from . import register
from ..operators.checkpointing import cut_lazy

# --- Q4: order priority checking (non-equi EXISTS semi-join) ------------------------

_Q4_ORACLE = """
SELECT o.o_orderpriority AS order_priority,
       cast(count(*) AS bigint) AS order_count
FROM orders o
WHERE o.o_orderdate >= timestamp '1997-01-01 00:00:00'
  AND o.o_orderdate <  timestamp '1997-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o.o_orderpriority
ORDER BY order_priority
"""


@register("q4_priority_check", oracle=_Q4_ORACLE, tags=("tpch", "J1", "A3"))
def q4_priority_check(spark, sf_dir):
    """TPC-H Q4 shape: correlated EXISTS over lineitem, decorrelated as a
    LEFT SEMI join whose condition mixes the equi key with a non-equi
    cross-table predicate ("some line shipped >30 days late" stands in for
    the schema's missing commit/receipt dates). Spark evaluates the equi
    part as the hash-join key and the non-equi part as a residual filter on
    matches — one shuffle on orderkey, and the semi form short-circuits per
    order instead of materializing the multiplicity."""
    o = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    l = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    has_late = o.join(
        l,
        (o["o_orderkey"] == l["l_orderkey"])
        & (l["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 30 DAYS")),
        "leftsemi",
    )
    return (
        has_late.groupBy(F.col("o_orderpriority").alias("order_priority"))
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("order_priority")
    )


# --- Q8: national market share ------------------------------------------------------

_Q8_ORACLE = """
WITH all_nations AS (
  SELECT year(o.o_orderdate) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         ns.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o    ON o.o_orderkey = l.l_orderkey
  JOIN part p      ON p.p_partkey = l.l_partkey
  JOIN customer c  ON c.c_custkey = o.o_custkey
  JOIN nation nc   ON nc.n_nationkey = c.c_nationkey
  JOIN region r    ON r.r_regionkey = nc.n_regionkey
  JOIN supplier s  ON s.s_suppkey = l.l_suppkey
  JOIN nation ns   ON ns.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
)
SELECT o_year,
       floor(((cast(sum(cast(CASE WHEN supp_nation = 'NATION_5' THEN volume
                                  ELSE 0 END AS decimal(28,6))) AS double) * 100.0)
              / cast(sum(cast(volume AS decimal(28,6))) AS double)) * 100 + 0.5)
         / 100 AS mkt_share_pct
FROM all_nations
GROUP BY o_year
ORDER BY o_year
"""


@register("q8_market_share", oracle=_Q8_ORACLE, tags=("tpch", "J1", "A4"))
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one fact pass through five broadcast dimension
    lookups (part filter, customer->nation->region chain restricted to one
    region, supplier->nation for the share nation), then a conditional-sum /
    total-sum ratio per order year. Both sums accumulate in exact decimal so
    the single double division is bit-identical across engines."""
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    p = read_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cust = (
        read_table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp = (
        read_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    joined = (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(supp), l["l_suppkey"] == F.col("s_suppkey"))
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(cust), o["o_custkey"] == F.col("c_custkey"))
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_5", volume).otherwise(F.lit(0)).cast(DEC)
    )
    den = F.sum(volume.cast(DEC))
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            round_half_up(
                (num.cast("double") * F.lit(100.0)) / den.cast("double")
            ).alias("mkt_share_pct")
        )
        .orderBy("o_year")
    )


# --- Q12: line counts by priority class (conditional counts over a join) ------------

_Q12_ORACLE = """
SELECT l.l_returnflag AS return_flag,
       cast(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS bigint) AS high_line_count,
       cast(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS bigint) AS low_line_count
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= timestamp '1997-01-01 00:00:00'
  AND l.l_shipdate <  timestamp '1998-01-01 00:00:00'
GROUP BY l.l_returnflag
ORDER BY return_flag
"""


@register("q12_priority_line_counts", oracle=_Q12_ORACLE, tags=("tpch", "A3", "J1"))
def q12_priority_line_counts(spark, sf_dir):
    """TPC-H Q12 shape: fact-fact join, then paired conditional counts that
    pivot the order-priority attribute into high/low columns per group
    (``l_returnflag`` stands in for the schema's missing ship mode). The
    year filter pushes to the lineitem scan before the orderkey shuffle;
    the conditional sums collapse map-side."""
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.col("l_returnflag").alias("return_flag"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("return_flag")
    )


# --- Q13: customer order-count distribution (double aggregation) --------------------

_Q13_ORACLE = """
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey
   AND o.o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c.c_custkey
)
SELECT c_count, cast(count(*) AS bigint) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("q13_customer_distribution", oracle=_Q13_ORACLE, tags=("tpch", "J2", "A1"))
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: left outer join with the filter INSIDE the join
    condition (customers with zero qualifying orders must survive with
    count 0 — a WHERE would drop them), then a second aggregation over the
    first's output. The priority filter stands in for the schema's missing
    ``o_comment NOT LIKE`` predicate. First groupBy shuffles on custkey;
    the histogram re-aggregates a customer-cardinality relation down to a
    handful of rows."""
    c = read_table(spark, sf_dir, "customer").select("c_custkey")
    o = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy(c["c_custkey"])
        .agg(F.count(o["o_orderkey"]).alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --- Q14: promotion revenue share ---------------------------------------------------

_Q14_ORACLE = """
SELECT floor(((cast(sum(cast(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END AS decimal(28,6))) AS double) * 100.0)
              / cast(sum(cast(l.l_extendedprice * (1 - l.l_discount)
                              AS decimal(28,6))) AS double)) * 100 + 0.5) / 100
  AS promo_revenue_pct
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= timestamp '1997-03-01 00:00:00'
  AND l.l_shipdate <  timestamp '1997-04-01 00:00:00'
"""


@register("q14_promo_revenue", oracle=_Q14_ORACLE, tags=("tpch", "A4", "J1"))
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: month-scoped fact scan probing a broadcast part
    relation, then a single conditional-over-total revenue ratio. No
    shuffle beyond the single-row final aggregate; the month predicate
    reaches the parquet reader."""
    l = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    p = read_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    num = F.sum(
        F.when(F.col("p_type") == "PROMO", volume).otherwise(F.lit(0)).cast(DEC)
    )
    den = F.sum(volume.cast(DEC))
    return l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"]).agg(
        round_half_up((num.cast("double") * F.lit(100.0)) / den.cast("double")).alias(
            "promo_revenue_pct"
        )
    )


# --- Q18: large-volume customers (HAVING over a fact rollup) ------------------------

_Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey
  FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(cast(l_quantity AS decimal(28,6))) > 150
)
SELECT c.c_name AS cust_name,
       c.c_custkey AS cust_key,
       o.o_orderkey AS order_key,
       cast(o.o_orderdate AS date) AS order_date,
       o.o_totalprice AS total_price,
       {sum_qty} AS sum_qty
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN big        ON big.l_orderkey = o.o_orderkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, cast(o.o_orderdate AS date),
         o.o_totalprice
ORDER BY total_price DESC, order_key
LIMIT 100
""".format(sum_qty=oracle_sum("l.l_quantity"))


@register("q18_large_volume_customers", oracle=_Q18_ORACLE, tags=("tpch", "A1", "J1"))
def q18_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape: the IN-subquery over a HAVING rollup, decorrelated
    as a semi-join against the per-order quantity aggregate. The rollup and
    the re-join both hash-partition on orderkey, so the aggregate's
    partitioning is reused by the join; customer broadcasts; top-100 is
    TakeOrderedAndProject. The HAVING threshold compares exact decimals, so
    both engines keep identical orders."""
    l = read_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(exact_sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 150)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    joined = (
        l.join(big, l["l_orderkey"] == F.col("big_orderkey"), "inner")
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
    )
    return (
        joined.groupBy(
            F.col("c_name").alias("cust_name"),
            F.col("c_custkey").alias("cust_key"),
            F.col("o_orderkey").alias("order_key"),
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.col("o_totalprice").alias("total_price"),
        )
        .agg(rounded_sum("l_quantity").alias("sum_qty"))
        .orderBy(F.desc("total_price"), F.asc("order_key"))
        .limit(100)
        .select(
            "cust_name", "cust_key", "order_key", "order_date", "total_price",
            "sum_qty",
        )
    )


# --- Q19: discounted revenue under disjunctive predicates ---------------------------

_Q19_ORACLE = f"""
SELECT {oracle_sum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity >= 1 AND l.l_quantity <= 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 20 AND l.l_quantity <= 30)
"""


@register("q19_disjunctive_revenue", oracle=_Q19_ORACLE, tags=("tpch", "P16", "J1"))
def q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape: an OR of three conjunctive clauses, each mixing
    part-side (brand, size) and lineitem-side (quantity) predicates, so no
    single clause can be pushed below the join whole. Catalyst still pushes
    the derivable disjunction envelopes to each scan (brand IN (...) on the
    broadcast side, quantity range on the fact side) and evaluates the full
    residual on join output — the plan to want: the cross-table OR never
    forces a cartesian or disables the broadcast hash join."""
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    joined = l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
    clause = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & (F.col("l_quantity") >= 1)
            & (F.col("l_quantity") <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & (F.col("l_quantity") >= 20)
            & (F.col("l_quantity") <= 30)
        )
    )
    return joined.where(clause).agg(
        rounded_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        )
    )


# --- Q21: suppliers who kept orders waiting (EXISTS + NOT EXISTS) -------------------

_Q21_ORACLE = """
SELECT s.s_name AS supp_name,
       cast(count(*) AS bigint) AS numwait
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE n.n_name = 'NATION_3'
  AND o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  )
GROUP BY s.s_name
ORDER BY numwait DESC, supp_name
LIMIT 20
"""


@register("q21_waiting_suppliers", oracle=_Q21_ORACLE, tags=("tpch", "J1", "A1"))
def q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape: the hardest decorrelation in the suite — for each
    late line of a failed multi-supplier order, the supplier counts only if
    SOME other supplier participated (EXISTS -> LEFT SEMI) and NO other
    supplier was also late (NOT EXISTS -> LEFT ANTI). "Late" is shipped >30
    days after the order date (the schema has no receipt/commit dates).
    All three probes share the orderkey hash partitioning from the first
    fact-fact join; supplier and nation broadcast; top-20 is TakeOrdered."""
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    sn = s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]).select(
        "s_suppkey", "s_name"
    )
    o = read_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    l = read_table(spark, sf_dir, "lineitem")
    # every late (orderkey, suppkey) pair across ALL suppliers, for NOT EXISTS
    late_all = (
        l.join(o.select("o_orderkey", "o_orderdate"), l["l_orderkey"] == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .select(
            F.col("l_orderkey").alias("late_orderkey"),
            F.col("l_suppkey").alias("late_suppkey"),
        )
    )
    l1 = (
        late_all.join(
            F.broadcast(sn), F.col("late_suppkey") == F.col("s_suppkey")
        ).select(
            F.col("late_orderkey").alias("l1_orderkey"),
            F.col("late_suppkey").alias("l1_suppkey"),
            "s_name",
        )
    )
    others = l.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    l1 = l1.join(
        others,
        (F.col("l1_orderkey") == F.col("o2_orderkey"))
        & (F.col("l1_suppkey") != F.col("o2_suppkey")),
        "leftsemi",
    )
    l1 = l1.join(
        late_all,
        (F.col("l1_orderkey") == F.col("late_orderkey"))
        & (F.col("l1_suppkey") != F.col("late_suppkey")),
        "leftanti",
    )
    return (
        l1.groupBy(F.col("s_name").alias("supp_name"))
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("supp_name"))
        .limit(20)
    )


# --- Q22: global sales opportunity (scalar subquery + anti-join) --------------------

_Q22_ORACLE = """
WITH eligible AS (
  SELECT c_custkey, c_nationkey, c_acctbal
  FROM customer
  WHERE c_nationkey IN (1, 2, 3, 8, 9, 17, 20)
),
thresh AS (
  SELECT cast(sum(cast(c_acctbal AS decimal(28,6))) AS double) / count(c_acctbal)
           AS avg_bal
  FROM eligible WHERE c_acctbal > 0.0
)
SELECT e.c_nationkey AS cntry_code,
       cast(count(*) AS bigint) AS numcust,
       {tot} AS totacctbal
FROM eligible e, thresh t
WHERE e.c_acctbal > t.avg_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = e.c_custkey
      AND o.o_orderdate >= timestamp '2000-01-01 00:00:00'
  )
GROUP BY e.c_nationkey
ORDER BY cntry_code
""".format(tot=oracle_sum("e.c_acctbal"))


@register("q22_sales_opportunity", oracle=_Q22_ORACLE, tags=("tpch", "J1", "A5"))
def q22_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape: scalar-subquery threshold (average positive balance
    over the eligible country set, nation key standing in for the missing
    phone prefix) broadcast as a single-row cross join, then an anti-join
    to keep customers with no orders at all. The threshold stays UNROUNDED
    — exact decimal sum -> one double division, the identical IEEE sequence
    in DuckDB — so the strict > cut agrees bit-for-bit. "No orders" is
    scoped to the recent window (every testdata customer has SOME order);
    the date filter pushes to the orders scan before the anti-join probes
    it, shuffling on custkey once."""
    c = read_table(spark, sf_dir, "customer").where(
        F.col("c_nationkey").isin(1, 2, 3, 8, 9, 17, 20)
    )
    thresh = c.where(F.col("c_acctbal") > 0.0).agg(
        (exact_sum("c_acctbal").cast("double") / F.count("c_acctbal")).alias("avg_bal")
    )
    o = (
        read_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    kept = (
        c.join(F.broadcast(thresh))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "leftanti")
    )
    return (
        kept.groupBy(F.col("c_nationkey").alias("cntry_code"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            rounded_sum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("cntry_code")
    )


# --- synthesized partsupp: Q2 / Q11 / Q16 / Q20 -------------------------------------
#
# The testdata omits the partsupp table, so the four queries that drive off
# it run over a DETERMINISTIC SYNTHESIZED partsupp derived identically in
# both engines: one row per distinct (l_partkey, l_suppkey) pair observed in
# lineitem, with availqty and supply cost drawn from the 60-bit md5 hash of
# the key pair (cost carried as integer CENTS so every aggregate below is
# exact int64 arithmetic). The point is the operator shapes — correlated
# min subquery (Q2), HAVING vs a scalar-subquery threshold (Q11), NOT IN
# anti-join under a distinct count (Q16), EXISTS over a half-sum (Q20) —
# which are preserved exactly; predicates on columns the schema lacks are
# re-expressed like the rest of this module (documented per query).

from ..operators.dedup import token_hash, token_hash_sql  # noqa: E402

_PS_SQL = f"""
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         cast({token_hash_sql("cast(l_partkey AS varchar) || '|' || cast(l_suppkey AS varchar)")}
              % 9999 + 1 AS bigint) AS ps_availqty,
         cast({token_hash_sql("'c|' || cast(l_partkey AS varchar) || '|' || cast(l_suppkey AS varchar)")}
              % 100000 + 100 AS bigint) AS ps_cost_cents
  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
"""


def _partsupp(spark, sf_dir):
    l = (
        read_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
    )
    key = F.concat_ws("|", F.col("ps_partkey"), F.col("ps_suppkey"))
    ckey = F.concat_ws("|", F.lit("c"), F.col("ps_partkey"), F.col("ps_suppkey"))
    return l.select(
        "ps_partkey",
        "ps_suppkey",
        (token_hash(key) % 9999 + 1).alias("ps_availqty"),
        (token_hash(ckey) % 100000 + 100).alias("ps_cost_cents"),
    )


_Q2_ORACLE = f"""
WITH ps AS ({_PS_SQL}),
eps AS (
  SELECT ps.ps_partkey, ps.ps_cost_cents,
         s.s_suppkey, s.s_acctbal, s.s_name, n.n_name
  FROM ps
  JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
),
mn AS (
  SELECT ps_partkey, min(ps_cost_cents) AS min_cost_cents
  FROM eps GROUP BY ps_partkey
)
SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_brand, e.s_suppkey,
       cast(e.ps_cost_cents AS double) / 100.0 AS supply_cost
FROM part p
JOIN eps e ON p.p_partkey = e.ps_partkey
JOIN mn   ON mn.ps_partkey = e.ps_partkey
         AND e.ps_cost_cents = mn.min_cost_cents
WHERE p.p_type = 'LARGE' AND p.p_size <= 25
ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey, e.s_suppkey
LIMIT 100
"""


@register("q2_min_cost_supplier", oracle=_Q2_ORACLE, tags=("tpch", "J1", "A1"))
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: for each qualifying part (type LARGE, size <= 25 —
    stands in for '%BRASS'), the EUROPE supplier(s) offering the minimum
    supply cost; correlated MIN subquery decorrelated as a per-part min
    aggregate joined back on (part, cost). Top 100 by account balance,
    fully tie-broken (acctbal desc, nation, supplier name, part, suppkey)
    so the LIMIT is deterministic.

    Scale: supplier/nation/region chain broadcasts onto the synthesized
    partsupp fact; the min aggregate and the join-back shuffle on
    ps_partkey only; final cut is TakeOrderedAndProject."""
    ps = _partsupp(spark, sf_dir)
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = read_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 25)
    )
    eps = (
        ps.join(F.broadcast(s), ps["ps_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("ps_partkey", "ps_cost_cents", "s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    mn = eps.groupBy("ps_partkey").agg(
        F.min("ps_cost_cents").alias("min_cost_cents")
    )
    out = (
        eps.join(mn, "ps_partkey")
        .where(F.col("ps_cost_cents") == F.col("min_cost_cents"))
        .join(F.broadcast(p), F.col("ps_partkey") == p["p_partkey"])
    )
    return (
        out.select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            "s_suppkey",
            (F.col("ps_cost_cents").cast("double") / 100.0).alias("supply_cost"),
        )
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey", "s_suppkey"
        )
        .limit(100)
    )


_Q11_FRACTION_PERMILLE = 1  # HAVING value > 0.001 * total, in exact integers

_Q11_ORACLE = f"""
WITH ps AS ({_PS_SQL}),
v AS (
  SELECT ps.ps_partkey, ps.ps_cost_cents * ps.ps_availqty AS val_cents
  FROM ps
  JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  WHERE n.n_regionkey = 3
),
g AS (
  SELECT ps_partkey, cast(sum(val_cents) AS bigint) AS value_cents
  FROM v GROUP BY ps_partkey
),
t AS (SELECT cast(sum(val_cents) AS bigint) AS total_cents FROM v)
SELECT g.ps_partkey,
       cast(g.value_cents AS double) / 100.0 AS part_value
FROM g, t
WHERE g.value_cents * 1000 > t.total_cents * {_Q11_FRACTION_PERMILLE}
"""


@register("q11_important_stock", oracle=_Q11_ORACLE, tags=("tpch", "A1", "A4"))
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape: per-part stock value (cost x availqty) for
    suppliers of one region (region 3 stands in for 'GERMANY'), keeping
    parts whose value exceeds 0.001 of the regional total — HAVING
    against a scalar-subquery threshold, decorrelated as a 1-row
    broadcast. Cost rides as integer cents so the sums AND the
    threshold comparison (value*1000 > total) are exact int64 — no
    decimal/float boundary risk in either engine.

    Scale: the fact aggregates on ps_partkey (map-side combined); the
    total is a second 1-row reduction of the SAME persisted value stream
    broadcast back — never a global sort."""

    ps = _partsupp(spark, sf_dir)
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 3)
    v = (
        ps.join(F.broadcast(s), ps["ps_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select(
            "ps_partkey",
            (F.col("ps_cost_cents") * F.col("ps_availqty")).alias("val_cents"),
        )
        .transform(cut_lazy)
    )
    g = v.groupBy("ps_partkey").agg(F.sum("val_cents").alias("value_cents"))
    t = v.agg(F.sum("val_cents").alias("total_cents"))
    return (
        g.crossJoin(F.broadcast(t))
        .where(
            F.col("value_cents") * 1000
            > F.col("total_cents") * _Q11_FRACTION_PERMILLE
        )
        .select(
            "ps_partkey",
            (F.col("value_cents").cast("double") / 100.0).alias("part_value"),
        )
    )


_Q16_ORACLE = f"""
WITH ps AS ({_PS_SQL})
SELECT p.p_brand, p.p_type, p.p_size,
       cast(count(DISTINCT ps.ps_suppkey) AS bigint) AS supplier_cnt
FROM ps
JOIN part p ON p.p_partkey = ps.ps_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type <> 'MEDIUM'
  AND p.p_size IN (1, 5, 9, 15, 23, 31, 40, 49)
  AND ps.ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
"""


@register("q16_parts_supplier_counts", oracle=_Q16_ORACLE, tags=("tpch", "J2", "A2"))
def q16_parts_supplier_counts(spark, sf_dir):
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type, size)
    over negated part predicates, excluding blacklisted suppliers via a
    NOT IN anti-join (negative account balance stands in for the
    'customer complaints' comment scan the schema lacks).

    Scale: the blacklist is a broadcast anti-join (its cardinality is a
    fraction of suppliers); part broadcasts; the distinct count is the
    only fact shuffle (two-phase on the group key + suppkey)."""
    ps = _partsupp(spark, sf_dir)
    bad = read_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    p = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "MEDIUM")
        & (F.col("p_size").isin(1, 5, 9, 15, 23, 31, 40, 49))
    )
    return (
        ps.join(
            F.broadcast(bad),
            ps["ps_suppkey"] == bad["s_suppkey"],
            "left_anti",
        )
        .join(F.broadcast(p), ps["ps_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").cast("long").alias("supplier_cnt"))
    )


_Q20_ORACLE = f"""
WITH ps AS ({_PS_SQL}),
q AS (
  SELECT l_partkey, l_suppkey,
         sum(cast(l_quantity AS decimal(28,6))) AS qty
  FROM lineitem
  WHERE l_shipdate >= timestamp '1997-01-01 00:00:00'
    AND l_shipdate <  timestamp '1998-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey
),
excess AS (
  SELECT DISTINCT ps.ps_suppkey
  FROM ps
  JOIN q ON ps.ps_partkey = q.l_partkey AND ps.ps_suppkey = q.l_suppkey
  JOIN part p ON p.p_partkey = ps.ps_partkey
  WHERE p.p_name LIKE 'large%'
    AND ps.ps_availqty * 2 > q.qty
)
SELECT s.s_suppkey, s.s_name, n.n_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN excess e ON e.ps_suppkey = s.s_suppkey
WHERE n.n_regionkey = 3
"""


@register("q20_excess_stock_suppliers", oracle=_Q20_ORACLE, tags=("tpch", "J1", "A1"))
def q20_excess_stock_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: suppliers (of one region — stands in for the
    single-nation filter) holding more than half a year's shipped
    quantity of some 'large%' part — nested EXISTS over a per-(part,
    supplier) half-sum, decorrelated as aggregate -> join -> DISTINCT
    semi side. The half test is availqty*2 > qty with qty an exact
    decimal sum, so the boundary is engine-stable.

    Scale: the lineitem aggregate shuffles on its own (part, supp) key;
    part broadcasts into the excess probe; the final supplier join is a
    broadcast of the small distinct suppkey set."""
    ps = _partsupp(spark, sf_dir)
    l = read_table(spark, sf_dir, "lineitem")
    q = (
        l.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(exact_sum("l_quantity").alias("qty"))
    )
    p = read_table(spark, sf_dir, "part").filter(F.col("p_name").like("large%"))
    excess = (
        ps.join(
            q,
            (ps["ps_partkey"] == q["l_partkey"])
            & (ps["ps_suppkey"] == q["l_suppkey"]),
        )
        .join(F.broadcast(p), ps["ps_partkey"] == p["p_partkey"])
        .where(F.col("ps_availqty") * 2 > F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 3)
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(excess), s["s_suppkey"] == excess["ps_suppkey"])
        .select("s_suppkey", "s_name", "n_name")
    )
