"""Lake-layout operators: Z-order clustering keys and partial-aggregate
re-aggregation — the physical-design levers that decide whether a 100 TB
table is scanned or skipped.

Z-order: parquet/Delta data skipping works off per-file min/max column
stats; a single-column sort gives tight ranges on one column only. The
Morton interleave (operators/compact.py:zorder_key) makes one sort key
whose contiguous ranges are bounded rectangles in TWO dimensions, so a
z-clustered layout skips on either predicate. The query here measures
exactly that claim: per coarse z-range, the span of both source columns
(the tighter the spans, the better the skipping) — bit-identical integer
arithmetic, so the DuckDB oracle verifies the key itself.

Re-aggregation: at scale you never re-scan raw data for a coarser
rollup — algebraic aggregates (sum, count, and anything derived from
them) merge from partials. The query computes monthly KPIs strictly FROM
daily partials while the oracle aggregates the raw table directly in one
pass: hash-equality proves partial-merge == direct, the property every
incremental rollup pipeline (and operators/rollup.py) rests on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.numeric import round_half_up
from ..operators.compact import zorder_key, zorder_key_sql
from ..sources.lake import read_table
from . import register

# --- z-order clustering stats ----------------------------------------------------

#: events span Jan 2024: hour index = days-since-2024-01-01 * 24 + hour —
#: field extraction only, no epoch arithmetic, so session timezone can't
#: leak in (naive timestamps: Spark unix_* would apply the session tz,
#: DuckDB's epoch() would not).
_HR_SQL = "(cast(ts AS date) - DATE '2024-01-01') * 24 + extract(hour FROM ts)"
#: zkey uses bit positions up to 2*15+1; the top interleaved bits of a
#: small-domain column are zero, so bucket on a mid shift: 2^14 z-cells
#: per bucket = a ~128x128 (x, y) rectangle.
_Z_SHIFT = 14

_ZORDER_ORACLE = f"""
WITH keyed AS (
  SELECT user_id, cast({_HR_SQL} AS bigint) AS hr FROM events
),
z AS (
  SELECT user_id, hr,
         {zorder_key_sql("user_id", "hr")} AS zkey
  FROM keyed
)
SELECT cast(zkey >> {_Z_SHIFT} AS bigint) AS zbucket,
       cast(count(*) AS bigint) AS n_rows,
       cast(count(DISTINCT user_id) AS bigint) AS n_users,
       cast(max(user_id) - min(user_id) AS bigint) AS user_span,
       cast(max(hr) - min(hr) AS bigint) AS hr_span
FROM z GROUP BY zkey >> {_Z_SHIFT}
"""


@register(
    "zorder_cluster_stats", oracle=_ZORDER_ORACLE, tags=("extension", "layout", "zorder")
)
def zorder_cluster_stats(spark, sf_dir):
    """Z-order locality report: interleave (user_id, hour-index) into a
    Morton key, bucket by coarse z-range, and measure the user_id span
    AND hour span inside each bucket. Tight spans on both axes are the
    data-skipping win a z-ordered file layout buys (each bucket ~= one
    file's min/max footprint); a single-column sort would show one tight
    span and one full-range span. ``operators/compact.py:zorder_layout``
    applies the same key to a real write via repartitionByRange."""
    ev = read_table(spark, sf_dir, "events")
    keyed = ev.select(
        "user_id",
        (
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")) * 24
            + F.hour("ts")
        )
        .cast("long")
        .alias("hr"),
    )
    z = keyed.select(
        "user_id", "hr", zorder_key(F.col("user_id"), F.col("hr")).alias("zkey")
    )
    return (
        z.groupBy(F.shiftright(F.col("zkey"), _Z_SHIFT).alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("user_id").alias("n_users"),
            (F.max("user_id") - F.min("user_id")).alias("user_span"),
            (F.max("hr") - F.min("hr")).alias("hr_span"),
        )
    )


# --- partial-aggregate re-aggregation --------------------------------------------

_REAGG_ORACLE = """
SELECT o_orderpriority AS priority,
       cast(date_trunc('month', o_orderdate) AS date) AS order_month,
       cast(count(*) AS bigint) AS n_orders,
       cast(sum(cast(floor(o_totalprice * 100 + 0.5) AS bigint)) AS bigint) AS sum_cents,
       floor(cast(sum(cast(floor(o_totalprice * 100 + 0.5) AS bigint)) AS double)
             / (count(*) * 100) * 100 + 0.5) / 100 AS avg_price
FROM orders GROUP BY o_orderpriority, date_trunc('month', o_orderdate)
"""


@register(
    "reaggregate_daily_to_month",
    oracle=_REAGG_ORACLE,
    tags=("extension", "layout", "rollup"),
)
def reaggregate_daily_to_month(spark, sf_dir):
    """Monthly KPIs computed ONLY from daily partial aggregates (sum of
    cents + count per day), merged upward — never re-touching row-level
    data — while the oracle aggregates the raw table in one pass. The
    hash match proves the algebraic-merge property sum/count/avg rollups
    rely on: partials in exact integer cents make the merge order-free,
    and the average is derived from merged sums, not averaged averages.

    Scale: the daily partial relation is |days x priorities| — the raw
    scan happens once at partial-build time (in a real pipeline,
    incrementally per day); every coarser rollup after that is O(partials).
    """
    o = read_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    daily = (
        o.select(
            F.col("o_orderpriority").alias("priority"),
            F.date_trunc("day", "o_orderdate").alias("order_day"),
            cents.alias("c"),
        )
        .groupBy("priority", "order_day")
        .agg(F.sum("c").alias("sum_cents"), F.count(F.lit(1)).alias("n_orders"))
    )
    monthly = daily.groupBy(
        "priority", F.date_trunc("month", "order_day").cast("date").alias("order_month")
    ).agg(F.sum("sum_cents").alias("sum_cents"), F.sum("n_orders").alias("n_orders"))
    avg = round_half_up(
        F.col("sum_cents").cast("double") / (F.col("n_orders") * 100), 2
    )
    return monthly.select(
        "priority", "order_month", "n_orders", "sum_cents", avg.alias("avg_price")
    )


# --- parquet footer introspection -------------------------------------------------

#: (table, column, kind): every testdata table, fixed-width columns only
#: (byte-array stats may be writer-truncated — excluded by design).
_PQF_COLUMNS = [
    ("customer", "c_custkey", "int"),
    ("customer", "c_nationkey", "int"),
    ("customer", "c_acctbal", "double"),
    ("lineitem", "l_linenumber", "int"),
    ("lineitem", "l_quantity", "double"),
    ("lineitem", "l_extendedprice", "double"),
    ("orders", "o_custkey", "int"),
    ("orders", "o_totalprice", "double"),
    ("events", "user_id", "int"),
    ("events", "value", "double"),
    ("documents", "n_chars", "int"),
    ("embeddings", "label", "int"),
    ("part", "p_size", "int"),
    ("part", "p_retailprice", "double"),
    ("supplier", "s_acctbal", "double"),
    ("nation", "n_regionkey", "int"),
    ("region", "r_regionkey", "int"),
]


def _pqf_arm(tbl: str, col: str, kind: str) -> str:
    if kind == "int":
        mn = f"cast(min({col}) * 1000000 AS bigint)"
        mx = f"cast(max({col}) * 1000000 AS bigint)"
    else:
        mn = f"cast(floor(min({col}) * 1000000 + 0.5) AS bigint)"
        mx = f"cast(floor(max({col}) * 1000000 + 0.5) AS bigint)"
    return (
        f"SELECT '{tbl}' AS tbl, '{col}' AS col, "
        f"cast(count(*) AS bigint) AS num_rows, "
        f"cast(count(*) - count({col}) AS bigint) AS null_count, "
        f"{mn} AS min_micro, {mx} AS max_micro FROM {tbl}"
    )


_PQF_ORACLE = "\nUNION ALL\n".join(_pqf_arm(t, c, k) for t, c, k in _PQF_COLUMNS)


@register(
    "parquet_footer_report",
    oracle=_PQF_ORACLE,
    tags=("extension", "layout", "footer", "metadata"),
)
def parquet_footer_report(spark, sf_dir):
    """Parquet footer introspection (round-11) — the audit a 100 TB
    lake runs continuously against the metadata its scan planner
    consults: per (table, column), the row count, null count, and
    min/max zone-map bounds read straight from the FOOTER THRIFT by a
    bounded compact-protocol reader
    (operators/parquet_footer.py:read_parquet_footer — varint/zigzag
    field walk, size-validated, internal row accounting re-checked),
    never touching a data page. The oracle recomputes every fact from
    the DATA (count/min/max over the same files), so a footer reader
    that misparsed a zigzag width, a field delta, or a stat payload
    hash-mismatches — footer-vs-data equality is exactly the zone-map
    trust property data skipping rests on. Min/max surface in exact
    micro units (ints scaled in integer math, doubles by the house
    floor(x*1e6+0.5) rule); byte-array columns are excluded by design
    (writers may truncate their stats — trusting them is the classic
    zone-map bug).

    Scale: one footer read per file, O(footer bytes) via a tail seek —
    the file list fans out over executors (here one row per testdata
    table; on a real lake, the catalog's manifest), and no data page is
    ever fetched. Cross-checked in tests against pyarrow's metadata API
    on footers from three independent writers (parquet-cpp, parquet-mr,
    DuckDB)."""
    from ..operators.parquet_footer import footer_column_stats

    rows = [
        (t, c, k, f"{sf_dir}/{t}.parquet") for t, c, k in _PQF_COLUMNS
    ]
    df = spark.createDataFrame(
        rows, "tbl string, col string, kind string, path string"
    )
    # fan the footer reads out (one task per row; widen() is for file
    # scans — an in-memory 17-row relation just needs a repartition)
    return footer_column_stats(df.repartition(len(rows)))
