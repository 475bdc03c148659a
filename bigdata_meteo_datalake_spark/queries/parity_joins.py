"""Join parity queries (SURVEY.md section 2.3, J1-J3).

The reference's entire join surface is two left-outer equi-joins building
``movies_enriched_daily`` (movies_enriched_daily.sql:50-53,116-119): a
composite-key enrich join and a nullable-key join whose misses drive a
``missing_*`` flag. Mapped onto the testdata star: orders<-customer<-nation
and events<-daily-user-dim.

Scale notes: dimension sides (customer/nation at any realistic cardinality
vs a 100 TB fact) are broadcast — `F.broadcast` pins it; AQE would pick it
anyway below the threshold. The composite-key dim join demonstrates
shuffle-on-the-same-key reuse: the dim is *derived from the fact by the same
key*, so Catalyst/AQE reuses the exchange rather than re-shuffling.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.lake import read_table
from . import register

# --- J1: composite-key left-outer enrich join --------------------------------


@register(
    "join_enrich_composite_key",
    oracle="""
WITH user_day AS (
  SELECT user_id,
         cast(ts AS date) AS event_day,
         count(*)         AS nb_events_day,
         cast(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS bigint)
                          AS nb_purchases_day
  FROM events GROUP BY user_id, cast(ts AS date)
)
SELECT e.event_id,
       e.user_id,
       cast(e.ts AS date) AS event_day,
       e.event_type,
       d.nb_events_day,
       d.nb_purchases_day
FROM events e
LEFT JOIN user_day d
  ON e.user_id = d.user_id AND cast(e.ts AS date) = d.event_day
""",
    tags=("parity", "J1"),
)
def join_enrich_composite_key(spark, sf_dir):
    """J1: left outer equi-join on a composite key (snapshot_date, id) —
    movies_enriched_daily.sql:50-53 `pop LEFT JOIN det` — fact rows enriched
    with a per-(user, day) dimension; all left rows preserved."""
    ev = read_table(spark, sf_dir, "events").withColumn(
        "event_day", F.col("ts").cast("date")
    )
    user_day = ev.groupBy("user_id", "event_day").agg(
        F.count(F.lit(1)).alias("nb_events_day"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "nb_purchases_day"
        ),
    )
    return ev.join(F.broadcast(user_day), ["user_id", "event_day"], "left").select(
        "event_id", "user_id", "event_day", "event_type", "nb_events_day", "nb_purchases_day"
    )


# --- J2: left-outer join on a nullable key (NULL never matches) --------------


@register(
    "join_nullable_key",
    oracle="""
SELECT c_custkey,
       c_name,
       nullif(c_nationkey, 5) AS nation_key_clean,
       n.n_name               AS nation_name,
       (n.n_name IS NULL)     AS missing_nation_data
FROM customer c
LEFT JOIN nation n ON nullif(c.c_nationkey, 5) = n.n_nationkey
""",
    tags=("parity", "J2", "P13"),
)
def join_nullable_key(spark, sf_dir):
    """J2: left join on a nullable key — NULL keys never match, the row
    survives with NULL right-side columns, driving the missing-data flag
    (movies_enriched_daily.sql:91-94,116-119). Plain `=` equality, NOT
    null-safe `<=>` (SURVEY section 4 gotcha 3)."""
    c = read_table(spark, sf_dir, "customer").withColumn(
        "nation_key_clean", F.nullif(F.col("c_nationkey"), F.lit(5))
    )
    n = read_table(spark, sf_dir, "nation")
    return c.join(
        F.broadcast(n), c["nation_key_clean"] == n["n_nationkey"], "left"
    ).select(
        "c_custkey",
        "c_name",
        "nation_key_clean",
        F.col("n_name").alias("nation_name"),
        F.col("n_name").isNull().alias("missing_nation_data"),
    )


# --- J1+J2+P10..P15: the movies_enriched_daily analog (3-way star) -----------

_ENRICHED_ORACLE = """
SELECT o.o_orderkey                         AS order_key,
       cast(o.o_orderdate AS date)          AS order_day,
       cast(year(o.o_orderdate) AS integer) AS order_year,
       o.o_totalprice                       AS total_price,
       o.o_orderstatus                      AS order_status,
       c.c_name                             AS customer_name,
       c.c_mktsegment                       AS mkt_segment,
       c.c_acctbal                          AS acct_balance,
       n.n_name                             AS nation_name,
       (c.c_custkey IS NULL)                AS missing_customer_data,
       CASE WHEN c.c_acctbal IS NOT NULL AND o.o_totalprice IS NOT NULL
              THEN round(cast(o.o_totalprice * 0.6 + c.c_acctbal * 0.4 AS decimal(28,6)), 2)::double
            WHEN c.c_acctbal IS NOT NULL
              THEN round(cast(c.c_acctbal AS decimal(28,6)), 2)::double
            ELSE round(cast(o.o_totalprice AS decimal(28,6)), 2)::double
       END                                  AS composite_score,
       (o.o_totalprice >= 300000.0 AND coalesce(c.c_acctbal, 0.0) < 1000.0)
                                            AS is_overhyped,
       (o.o_totalprice < 100000.0 AND coalesce(c.c_acctbal, 0.0) >= 7500.0)
                                            AS is_hidden_gem
FROM orders o
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
LEFT JOIN nation n   ON c.c_nationkey = n.n_nationkey
"""


@register("enriched_orders_daily", oracle=_ENRICHED_ORACLE, tags=("parity", "J1", "J2", "J3", "P10", "P12", "P13", "P14", "P15", "bench"))
def enriched_orders_daily(spark, sf_dir):
    """The movies_enriched_daily analog (movies_enriched_daily.sql:74-120):
    fact LEFT JOIN dim LEFT JOIN dim with derived score cascade and boundary
    flags. J3's dbt ref() DAG edge is the function composition here. Both
    dims broadcast — zero shuffles on the fact at any scale."""
    from ..functions.numeric import dec_round as r2

    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    joined = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"], "left").join(
        F.broadcast(n), c["c_nationkey"] == n["n_nationkey"], "left"
    )
    price, bal = F.col("o_totalprice"), F.col("c_acctbal")
    return joined.select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_orderdate").cast("date").alias("order_day"),
        F.year("o_orderdate").alias("order_year"),
        price.alias("total_price"),
        F.col("o_orderstatus").alias("order_status"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("mkt_segment"),
        bal.alias("acct_balance"),
        F.col("n_name").alias("nation_name"),
        F.col("c_custkey").isNull().alias("missing_customer_data"),
        F.when(bal.isNotNull() & price.isNotNull(), r2(price * 0.6 + bal * 0.4))
        .when(bal.isNotNull(), r2(bal))
        .otherwise(r2(price))
        .alias("composite_score"),
        ((price >= 300000.0) & (F.coalesce(bal, F.lit(0.0)) < 1000.0)).alias(
            "is_overhyped"
        ),
        ((price < 100000.0) & (F.coalesce(bal, F.lit(0.0)) >= 7500.0)).alias(
            "is_hidden_gem"
        ),
    )
