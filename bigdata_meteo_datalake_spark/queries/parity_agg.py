"""Aggregation parity queries (SURVEY.md section 2.4, A1-A6).

The reference's single aggregate query is ``kpi_daily_summary``
(kpi_daily_summary.sql:19-54): group the enriched mart by snapshot_date and
compute count(*), conditional counts (sum-of-case), a rounded coverage
ratio, and rounded null-skipping averages. Mapped per FIXTURES.md B onto
``orders`` (snapshot_date -> date(o_orderdate), status/priority flags play
the role of the boolean movie flags).

Scale notes: single groupBy on a low-cardinality key = one shuffle with
map-side partial aggregation (HashAggregate partial+final); decimal
accumulators keep it inside whole-stage codegen. At 100 TB the number of
groups (days) is tiny, so the reduce side is trivially small — the scan
dominates, and Parquet predicate pushdown/column pruning handle that.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.numeric import (
    count_if,
    oracle_avg,
    oracle_ratio,
    oracle_sum,
    rounded_avg,
    rounded_ratio,
    rounded_sum,
)
from ..sources.lake import read_table
from . import register

# --- flagship: the kpi_daily_summary analog --------------------------------

_KPI_ORACLE = f"""
SELECT
  cast(o_orderdate AS date)                                   AS order_day,
  count(*)                                                    AS nb_orders,
  cast(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS bigint)
                                                              AS nb_finished,
  {oracle_ratio("sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)", "count(*)")}
                                                              AS finished_ratio,
  {oracle_avg("o_totalprice")}                                AS avg_totalprice,
  {oracle_sum("o_totalprice")}                                AS sum_totalprice,
  cast(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS bigint)
                                                              AS nb_urgent
FROM orders
GROUP BY cast(o_orderdate AS date)
"""


@register("kpi_daily_order_summary", oracle=_KPI_ORACLE, tags=("parity", "A1", "A2", "A3", "A4", "A5", "flagship"))
def kpi_daily_order_summary(spark, sf_dir):
    """A1-A5: hash aggregate by day with count(*), conditional counts,
    ratio-of-aggregates, rounded averages (kpi_daily_summary.sql:19-54)."""
    orders = read_table(spark, sf_dir, "orders")
    finished = count_if(F.col("o_orderstatus") == "F")
    total = F.count(F.lit(1))
    return (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("order_day"))
        .agg(
            total.alias("nb_orders"),
            finished.alias("nb_finished"),
            rounded_ratio(finished, total).alias("finished_ratio"),
            rounded_avg("o_totalprice").alias("avg_totalprice"),
            rounded_sum("o_totalprice").alias("sum_totalprice"),
            count_if(F.col("o_orderpriority") == "1-URGENT").alias("nb_urgent"),
        )
    )


# --- TPC-H Q1-shaped pricing summary (headline bench query) ----------------

_PRICING_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {oracle_sum("l_quantity")}                                   AS sum_qty,
  {oracle_sum("l_extendedprice")}                              AS sum_base_price,
  {oracle_sum("l_extendedprice * (1 - l_discount)")}           AS sum_disc_price,
  {oracle_sum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
  {oracle_avg("l_quantity")}                                   AS avg_qty,
  {oracle_avg("l_extendedprice")}                              AS avg_price,
  {oracle_avg("l_discount", 4)}                                AS avg_disc,
  count(*)                                                     AS count_order
FROM lineitem
WHERE l_shipdate <= timestamp '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("pricing_summary", oracle=_PRICING_ORACLE, tags=("parity", "A1", "A5", "bench"))
def pricing_summary(spark, sf_dir):
    """A1/A5 at width: multi-aggregate hash aggregate over the fact table
    with a pushed-down date filter (the engine's headline scan+agg shape)."""
    li = read_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            rounded_sum("l_quantity").alias("sum_qty"),
            rounded_sum("l_extendedprice").alias("sum_base_price"),
            rounded_sum(disc_price).alias("sum_disc_price"),
            rounded_sum(charge).alias("sum_charge"),
            rounded_avg("l_quantity").alias("avg_qty"),
            rounded_avg("l_extendedprice").alias("avg_price"),
            rounded_avg("l_discount", 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- operational row-count metrics (A6) -------------------------------------


@register(
    "load_row_counts",
    oracle="""
SELECT 'orders' AS table_name, count(*) AS n_rows FROM orders
UNION ALL SELECT 'lineitem', count(*) FROM lineitem
UNION ALL SELECT 'events', count(*) FROM events
""",
    tags=("parity", "A6"),
)
def load_row_counts(spark, sf_dir):
    """A6: per-table loaded-row metrics (load_raw_to_postgres.py:213-220) —
    expressed as distributed counts, not driver-side counters."""
    # global agg + select(lit): an empty table still yields one row with 0,
    # matching the oracle's scalar count(*) (groupBy(lit) would yield none)
    rows = [
        read_table(spark, sf_dir, t)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(F.lit(t).alias("table_name"), "n_rows")
        for t in ("orders", "lineitem", "events")
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
