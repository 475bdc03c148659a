"""TPC-H-shaped multi-join analytics over the testdata star schema.

The reference's join surface stops at two broadcast-sized left joins; these
queries exercise the join/agg machinery at fact-to-fact scale (lineitem x
orders) — the shapes that dominate a 100 TB warehouse and the headline
entries of bench.py.

Scale notes: lineitem⋈orders is the one genuinely large shuffle in the
schema. Catalyst broadcasts every dimension side automatically (and AQE
would convert at runtime if stats mislead); the fact-fact join hash-
partitions both sides on orderkey once, and the subsequent group-by reuses
that partitioning when the keys align.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.numeric import exact_sum, oracle_sum, rounded_sum
from ..sources.lake import read_table
from . import register

# --- Q3-shaped: shipping priority --------------------------------------------------

_Q3_ORACLE = f"""
SELECT l.l_orderkey AS order_key,
       {oracle_sum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
       cast(o.o_orderdate AS date) AS order_date,
       o.o_orderpriority AS order_priority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < timestamp '1998-01-01 00:00:00'
  AND l.l_shipdate > timestamp '1998-01-01 00:00:00'
GROUP BY l.l_orderkey, cast(o.o_orderdate AS date), o.o_orderpriority
ORDER BY revenue DESC, order_key
LIMIT 10
"""


@register("q3_shipping_priority", oracle=_Q3_ORACLE, tags=("bench", "tpch", "J1", "A1"))
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter -> fact-fact equi-join ->
    aggregate -> global top-10. The customer filter broadcasts; the
    lineitem/orders join is the real shuffle; the final ORDER BY+LIMIT is a
    TakeOrdered, never a full sort."""
    c = read_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    l = read_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    joined = l.join(o, l["l_orderkey"] == o["o_orderkey"]).join(
        F.broadcast(c), o["o_custkey"] == c["c_custkey"]
    )
    return (
        joined.groupBy(
            F.col("l_orderkey").alias("order_key"),
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.col("o_orderpriority").alias("order_priority"),
        )
        .agg(
            rounded_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("order_key"))
        .limit(10)
        .select("order_key", "revenue", "order_date", "order_priority")
    )


# --- Q5-shaped: revenue by nation through a 5-way star join -------------------------

_Q5_ORACLE = f"""
SELECT n.n_name AS nation_name,
       {oracle_sum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
FROM region r
JOIN nation n   ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE r.r_name = 'AMERICA'
GROUP BY n.n_name
"""


@register("q5_revenue_by_nation", oracle=_Q5_ORACLE, tags=("bench", "tpch", "J1", "A1"))
def q5_revenue_by_nation(spark, sf_dir):
    """TPC-H Q5 shape: 5-way star join. region/nation/customer broadcast
    down the chain; only lineitem⋈orders shuffles. Grouping key cardinality
    is nations — partial aggregation collapses the output map-side."""
    r = read_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    n = read_table(spark, sf_dir, "nation")
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem")
    dims = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("c_custkey", "n_name")
    )
    joined = l.join(o, l["l_orderkey"] == o["o_orderkey"]).join(
        F.broadcast(dims), o["o_custkey"] == F.col("c_custkey")
    )
    return joined.groupBy(F.col("n_name").alias("nation_name")).agg(
        rounded_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        )
    )


# --- order-lines rollup (fact-fact join + window) -----------------------------------

_LARGEST_ORACLE = """
SELECT o.o_orderkey AS order_key,
       cast(count(*) AS bigint) AS n_lines,
       cast(round(sum(cast(l.l_extendedprice AS decimal(28,6))), 2) AS double)
         AS order_total
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderkey
ORDER BY order_total DESC, order_key
LIMIT 20
"""


@register("largest_orders", oracle=_LARGEST_ORACLE, tags=("bench", "tpch"))
def largest_orders(spark, sf_dir):
    """Fact-fact join -> per-order rollup -> global top-20 by value.

    The top-20 is ``orderBy(...).limit(20)`` — TakeOrderedAndProject, a
    per-partition heap + driver merge — never a partition-less window
    (which would serialize every per-order rollup row onto one task).
    """
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem")
    per_order = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.col("o_orderkey").alias("order_key"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            rounded_sum("l_extendedprice").alias("order_total"),
        )
    )
    return (
        per_order.orderBy(F.desc("order_total"), F.asc("order_key"))
        .limit(20)
        .select("order_key", "n_lines", "order_total")
    )


# --- Q6-shaped: forecast revenue change (pure scan-filter-agg) ----------------------

_Q6_ORACLE = f"""
SELECT {oracle_sum("l_extendedprice * l_discount")} AS revenue
FROM lineitem
WHERE l_shipdate >= timestamp '1997-01-01 00:00:00'
  AND l_shipdate <  timestamp '1998-01-01 00:00:00'
  AND l_discount BETWEEN cast(0.03 AS double) AND cast(0.07 AS double)
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", oracle=_Q6_ORACLE, tags=("tpch", "A4", "P16"))
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: the purest scan -> pushed filter -> global aggregate.
    No joins, no shuffles beyond the single-row partial-agg exchange; every
    predicate reaches the parquet reader (PushedFilters), so at 100 TB the
    cost is I/O on three pruned columns. Global agg (not groupBy) so an
    empty match still yields one NULL row, same as SQL SUM."""
    l = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        rounded_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue")
    )


# --- Q7-shaped: volume shipping between two nations ---------------------------------

_Q7_ORACLE = f"""
SELECT ns.n_name AS supp_nation,
       nc.n_name AS cust_nation,
       year(l.l_shipdate) AS ship_year,
       {oracle_sum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
FROM lineitem l
JOIN orders o    ON o.o_orderkey = l.l_orderkey
JOIN customer c  ON c.c_custkey = o.o_custkey
JOIN nation nc   ON nc.n_nationkey = c.c_nationkey
JOIN supplier s  ON s.s_suppkey = l.l_suppkey
JOIN nation ns   ON ns.n_nationkey = s.s_nationkey
WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
    OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
  AND l.l_shipdate >= timestamp '1996-01-01 00:00:00'
  AND l.l_shipdate <  timestamp '1998-01-01 00:00:00'
GROUP BY ns.n_name, nc.n_name, year(l.l_shipdate)
"""


@register("q7_volume_shipping", oracle=_Q7_ORACLE, tags=("tpch", "J1", "A1"))
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: the fact row needs BOTH ends of the trade lane — the
    supplier's nation (via lineitem.suppkey) and the customer's nation (via
    orders.custkey). Both dim chains broadcast; the only shuffle is
    lineitem x orders on orderkey. The symmetric nation-pair predicate is
    applied after both lookups, exactly as written in the reference query."""
    l = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = read_table(spark, sf_dir, "orders")
    n = read_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    # customer -> nation lookup (broadcast), keeps only the two nations
    cust = (
        read_table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    # supplier -> nation lookup (broadcast)
    supp = (
        read_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    joined = (
        l.join(F.broadcast(supp), l["l_suppkey"] == supp["s_suppkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(cust), o["o_custkey"] == cust["c_custkey"])
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
    ).agg(
        rounded_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        )
    )


# --- Q9-shaped: product-line profit by nation and year ------------------------------

_Q9_ORACLE = f"""
SELECT n.n_name AS nation_name,
       year(l.l_shipdate) AS ship_year,
       {oracle_sum("l.l_extendedprice * (1 - l.l_discount) - p.p_retailprice * l.l_quantity")} AS profit
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%gear%'
GROUP BY n.n_name, year(l.l_shipdate)
"""


@register("q9_product_profit", oracle=_Q9_ORACLE, tags=("tpch", "J1", "A1"))
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape, adapted to the testdata schema: no partsupp table
    exists, so unit cost is proxied by part.p_retailprice (the join/agg
    shape — fact scanned once through a chain of broadcast dim joins, then
    grouped by (nation, year) — is what Q9 exercises). The p_name LIKE
    filter lands on the broadcast side, shrinking the hash relation before
    the fact scan probes it; zero fact-side shuffles until the final
    low-cardinality aggregate."""
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    sn = s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]).select(
        "s_suppkey", "n_name"
    )
    joined = l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"]).join(
        F.broadcast(sn), l["l_suppkey"] == F.col("s_suppkey")
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return joined.groupBy(
        F.col("n_name").alias("nation_name"), F.year("l_shipdate").alias("ship_year")
    ).agg(rounded_sum(profit).alias("profit"))


# --- Q10-shaped: returned-item revenue ranking --------------------------------------

_Q10_ORACLE = f"""
SELECT c.c_custkey AS cust_key,
       c.c_name AS cust_name,
       {oracle_sum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
       c.c_acctbal AS acct_bal,
       n.n_name AS nation_name
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= timestamp '1996-01-01 00:00:00'
  AND o.o_orderdate <  timestamp '1996-04-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, cust_key
LIMIT 20
"""


@register("q10_returned_items", oracle=_Q10_ORACLE, tags=("tpch", "J1", "A1"))
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: quarter-scoped orders x returned lineitems, customer
    and nation broadcast, top-20 by revenue as TakeOrderedAndProject (never
    a global window). The o_orderdate range and l_returnflag predicates both
    push to their scans before the orderkey shuffle."""
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    o = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    l = read_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    cn = c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]).select(
        "c_custkey", "c_name", "c_acctbal", "n_name"
    )
    joined = l.join(o, l["l_orderkey"] == o["o_orderkey"]).join(
        F.broadcast(cn), o["o_custkey"] == F.col("c_custkey")
    )
    return (
        joined.groupBy(
            F.col("c_custkey").alias("cust_key"),
            F.col("c_name").alias("cust_name"),
            F.col("c_acctbal").alias("acct_bal"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(
            rounded_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("cust_key"))
        .limit(20)
        .select("cust_key", "cust_name", "revenue", "acct_bal", "nation_name")
    )


# --- Q15-shaped: top supplier by period revenue -------------------------------------

_Q15_ORACLE = f"""
WITH rev AS (
  SELECT l_suppkey AS supp_key,
         {oracle_sum("l_extendedprice * (1 - l_discount)")} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= timestamp '1996-01-01 00:00:00'
    AND l_shipdate <  timestamp '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey AS supp_key,
       s.s_name AS supp_name,
       r.total_revenue AS total_revenue
FROM supplier s
JOIN rev r ON r.supp_key = s.s_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY supp_key
"""


@register("q15_top_supplier", oracle=_Q15_ORACLE, tags=("tpch", "A1", "J1"))
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: revenue-per-supplier in a quarter, then keep the
    supplier(s) hitting the global max. The per-supplier aggregate is one
    shuffle on suppkey; the global max is a single-row aggregate broadcast
    back as a join filter (no second pass over lineitem, no global sort).
    Revenue equality is on the convention-rounded double, which both
    engines produce bit-identically."""
    l = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supp_key")).agg(
        rounded_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    top = rev.agg(F.max("total_revenue").alias("max_revenue"))
    s = read_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(top), rev["total_revenue"] == top["max_revenue"])
        .join(F.broadcast(s), rev["supp_key"] == s["s_suppkey"])
        .select(
            "supp_key",
            F.col("s_name").alias("supp_name"),
            "total_revenue",
        )
        .orderBy("supp_key")
    )


# --- Q17-shaped: small-quantity-order revenue ---------------------------------------

_Q17_ORACLE = """
WITH brand_lines AS (
  SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand = 'Brand#3'
),
pq AS (
  SELECT l_partkey,
         cast(sum(cast(l_quantity AS decimal(28,6))) AS double) / count(l_quantity)
           AS avg_qty
  FROM brand_lines GROUP BY l_partkey
)
SELECT cast(round(cast(
         cast(sum(cast(b.l_extendedprice AS decimal(28,6))) AS double) / 7.0
       AS decimal(28,6)), 2) AS double) AS avg_weekly_revenue
FROM brand_lines b JOIN pq ON pq.l_partkey = b.l_partkey
WHERE b.l_quantity < 0.2 * pq.avg_qty
"""


@register("q17_small_quantity_revenue", oracle=_Q17_ORACLE, tags=("tpch", "A5", "J1"))
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: the correlated "quantity below 20% of this part's
    average" subquery, decorrelated the Spark-first way — per-part averages
    are a tiny aggregate over the brand-filtered lines, broadcast back onto
    the same relation (scanned once per side, never a window over the fact).
    The threshold average is deliberately UNROUNDED: exact decimal sum ->
    one double division, the same IEEE sequence DuckDB runs, so the strict
    < comparison agrees bit-for-bit across engines."""
    p = read_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    l = read_table(spark, sf_dir, "lineitem")
    brand_lines = l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"]).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pq = brand_lines.groupBy("l_partkey").agg(
        (exact_sum("l_quantity").cast("double") / F.count("l_quantity")).alias(
            "avg_qty"
        )
    )
    small = brand_lines.alias("b").join(
        F.broadcast(pq).alias("pq"), F.col("b.l_partkey") == F.col("pq.l_partkey")
    ).where(F.col("b.l_quantity") < 0.2 * F.col("pq.avg_qty"))
    weekly = exact_sum(F.col("b.l_extendedprice")).cast("double") / F.lit(7.0)
    return small.agg(
        F.round(weekly.cast("decimal(28,6)"), 2).cast("double").alias(
            "avg_weekly_revenue"
        )
    )
