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

from ..functions.numeric import oracle_sum, rounded_sum
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
