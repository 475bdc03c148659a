"""Lakehouse-maintenance extension queries (round 4): zone-map data
skipping and partition-scoped compaction planning — the table-services
layer every 100 TB lake needs between "data landed" and "queries are
fast". No reference counterpart (the reference's lake is a handful of
~20-row parquet files, `scripts/export/export_to_parquet.py:52-60`);
designed Spark-first as pure aggregation/window plans.

Determinism: all planning math is integer (row counts, byte estimates,
floor divisions), so the oracle hash gate is exact with no float
discipline needed. Zone min/max are the stored doubles themselves —
compared, never recomputed.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..sources.lake import read_table
from . import register

# --- zone maps / data skipping ------------------------------------------------------

#: the sample pruning predicate the report evaluates: `o_totalprice >= HIGH`
_HIGH_VALUE = 400000.0

_ZONE_MAP_ORACLE = f"""
SELECT cast(date_trunc('month', o_orderdate) AS date) AS zone_month,
       cast(count(*) AS bigint) AS n_rows,
       min(o_totalprice) AS min_tp,
       max(o_totalprice) AS max_tp,
       max(o_totalprice) < {_HIGH_VALUE} AS prunable_high_value
FROM orders
GROUP BY 1
"""


@register(
    "zone_map_prune_report",
    oracle=_ZONE_MAP_ORACLE,
    tags=("extension", "lakehouse", "data-skipping"),
)
def zone_map_prune_report(spark, sf_dir):
    """Zone-map (min/max statistics) report over monthly zones of
    ``orders``: per zone, row count, min/max ``o_totalprice``, and whether
    the zone is prunable for the predicate ``o_totalprice >= 400000`` —
    i.e. whether a reader carrying file-level statistics would skip it
    entirely. This is the data-skipping decision parquet row-group stats /
    Delta file stats make; materializing it as a query makes the skipping
    rate measurable per table.

    Scale: one map-side-combined hash aggregate over the fact — the same
    plan shape as pricing_summary; min/max are the stored doubles
    (no arithmetic), so the oracle comparison is exact."""
    o = read_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("zone_month")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("o_totalprice").alias("min_tp"),
        F.max("o_totalprice").alias("max_tp"),
        (F.max("o_totalprice") < F.lit(_HIGH_VALUE)).alias("prunable_high_value"),
    )


# --- compaction planning ------------------------------------------------------------

#: estimated on-disk bytes per lineitem row (planning constant, not measured)
_ROW_BYTES = 128
#: bins per year-partition the greedy packer targets
_BINS_PER_YEAR = 3

_COMPACTION_ORACLE = f"""
WITH files AS (
  SELECT cast(extract(year FROM l_shipdate) AS int) AS yr,
         cast(date_trunc('month', l_shipdate) AS date) AS file_month,
         cast(count(*) * {_ROW_BYTES} AS bigint) AS est_bytes
  FROM lineitem
  GROUP BY 1, 2
),
planned AS (
  SELECT yr, file_month, est_bytes,
         sum(est_bytes) OVER (PARTITION BY yr
                              ORDER BY file_month
                              ROWS UNBOUNDED PRECEDING) AS cum,
         (sum(est_bytes) OVER (PARTITION BY yr) + {_BINS_PER_YEAR - 1})
           // {_BINS_PER_YEAR} AS target
  FROM files
)
SELECT yr,
       cast((cum - est_bytes) // target AS int) AS bin_id,
       cast(count(*) AS bigint) AS n_files,
       cast(sum(est_bytes) AS bigint) AS bin_bytes,
       min(file_month) AS month_from,
       max(file_month) AS month_to
FROM planned
GROUP BY 1, 2
"""


@register(
    "compaction_plan",
    oracle=_COMPACTION_ORACLE,
    tags=("extension", "lakehouse", "compaction"),
)
def compaction_plan(spark, sf_dir):
    """Greedy small-file compaction planner, partition-scoped: treat each
    (ship-year, ship-month) slice of ``lineitem`` as one small file with an
    estimated size (rows x 128 B), then bin-pack the files of each
    year-partition into ~3 equal byte targets by running-sum assignment:
    ``bin = floor(bytes_before_this_file / target)``. Output: one row per
    (year, bin) with file count, packed bytes, and the month span — the
    exact work-list a compaction job would execute.

    The cumulative-sum window is partitioned by year (the table's real
    partition key): compaction never crosses partition boundaries, so the
    plan has no partition-less window — per-partition packing is both the
    correct semantics and the scale-safe shape. All math is integer
    (floor-div via `div`), so the oracle hash is exact."""
    li = read_table(spark, sf_dir, "lineitem")
    files = li.groupBy(
        F.year("l_shipdate").cast("int").alias("yr"),
        F.date_trunc("month", F.col("l_shipdate")).cast("date").alias("file_month"),
    ).agg((F.count(F.lit(1)) * _ROW_BYTES).cast("long").alias("est_bytes"))

    by_yr = Window.partitionBy("yr")
    running = by_yr.orderBy("file_month").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    planned = files.select(
        "yr",
        "file_month",
        "est_bytes",
        F.sum("est_bytes").over(running).alias("cum"),
        F.expr(
            f"(sum(est_bytes) OVER (PARTITION BY yr) + {_BINS_PER_YEAR - 1})"
            f" div {_BINS_PER_YEAR}"
        ).alias("target"),
    )
    return (
        planned.withColumn(
            "bin_id", F.expr("(cum - est_bytes) div target").cast("int")
        )
        .groupBy("yr", "bin_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("est_bytes").cast("long").alias("bin_bytes"),
            F.min("file_month").alias("month_from"),
            F.max("file_month").alias("month_to"),
        )
    )


# --- k-anonymity --------------------------------------------------------------------

_K_ANON = 5
#: account-balance bucket width for the quasi-identifier
_BAL_BUCKET = 500.0

_K_ANON_ORACLE = f"""
SELECT c_nationkey,
       c_mktsegment,
       cast(floor(c_acctbal / {_BAL_BUCKET}) AS int) AS bal_bucket,
       cast(count(*) AS bigint) AS group_n,
       count(*) < {_K_ANON} AS suppressed
FROM customer
GROUP BY 1, 2, 3
"""


@register(
    "k_anonymity_report",
    oracle=_K_ANON_ORACLE,
    tags=("extension", "governance", "privacy"),
)
def k_anonymity_report(spark, sf_dir):
    """k-anonymity audit over the quasi-identifier (nation, market
    segment, account-balance bucket of width 500): per equivalence class,
    its size and whether it falls below k=5 — the classes a release would
    have to suppress or generalize. The standard pre-release privacy gate
    for tabular training data.

    Scale: single map-side-combined hash aggregate; the bucket floor is
    one IEEE division of stored doubles (deterministic in both engines),
    everything else integer."""
    c = read_table(spark, sf_dir, "customer")
    return c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / F.lit(_BAL_BUCKET)).cast("int").alias(
            "bal_bucket"
        ),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("group_n"),
        (F.count(F.lit(1)) < F.lit(_K_ANON)).alias("suppressed"),
    )


# --- CDC changelog application ------------------------------------------------------

_CDC_ORACLE = """
WITH log AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice,
         1 AS seq, 'I' AS op
  FROM orders
  UNION ALL
  SELECT o_orderkey, o_orderstatus, o_totalprice + 1000.0,
         2 AS seq, 'U' AS op
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey, o_orderstatus, o_totalprice,
         3 AS seq, 'D' AS op
  FROM orders WHERE o_orderkey % 100 = 0
),
latest AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, op
  FROM log
  QUALIFY row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) = 1
)
SELECT o_orderstatus,
       cast(count(*) AS bigint) AS n_rows,
       cast(round(sum(cast(o_totalprice AS decimal(28,6))), 2) AS double)
         AS sum_totalprice,
       cast(sum(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS bigint) AS n_updated
FROM latest
WHERE op <> 'D'
GROUP BY o_orderstatus
"""


@register(
    "cdc_apply_changelog",
    oracle=_CDC_ORACLE,
    tags=("extension", "lakehouse", "cdc"),
)
def cdc_apply_changelog(spark, sf_dir):
    """CDC changelog application — the general MERGE the last-write-wins
    upsert (S8, `operators/upsert.py`) is a special case of: a changelog
    of (key, seq, op in I/U/D) rows collapses to current state by taking
    the highest-seq op per key and dropping keys whose last op is a
    delete. The changelog here is synthesized deterministically from
    ``orders`` (every row inserted at seq 1, every 10th key updated with
    +1000 at seq 2, every 100th deleted at seq 3) so the apply semantics
    — update visibility, delete wins over its earlier update, decimal
    sums over the surviving state — are oracle-checked end to end.
    Output: per-status row counts, exact-decimal totals, and how many
    surviving rows carry the update.

    Scale: one key-hash window (identical shape to the S8 upsert dedup)
    + one aggregate; a real CDC feed (Debezium topic, Delta CDF) swaps
    the synthesized unions for its reader and nothing else changes. At
    100 TB the window shuffles the changelog once on the key — the same
    cost MERGE INTO pays."""
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    ins = o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.lit(1).alias("seq"),
        F.lit("I").alias("op"),
    )
    upd = o.where(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
        F.lit(2).alias("seq"),
        F.lit("U").alias("op"),
    )
    dele = o.where(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.lit(3).alias("seq"),
        F.lit("D").alias("op"),
    )
    log = ins.unionAll(upd).unionAll(dele)
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("seq"))
    latest = (
        log.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("op") != "D"))
    )
    return latest.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(28,6)")), 2)
        .cast("double")
        .alias("sum_totalprice"),
        F.sum(F.when(F.col("op") == "U", 1).otherwise(0))
        .cast("long")
        .alias("n_updated"),
    )


# --- l-diversity audit --------------------------------------------------------------

_L_DIV = 2

_LDIV_ORACLE = f"""
SELECT cast(year(o_orderdate) AS integer) AS order_year,
       o_orderpriority,
       cast(count(*) AS bigint) AS group_n,
       cast(count(DISTINCT o_orderstatus) AS bigint) AS n_sensitive,
       count(DISTINCT o_orderstatus) >= {_L_DIV} AS l_diverse
FROM orders GROUP BY 1, 2
"""


@register(
    "l_diversity_report",
    oracle=_LDIV_ORACLE,
    tags=("extension", "governance", "privacy"),
)
def l_diversity_report(spark, sf_dir):
    """l-diversity audit (Machanavajjhala et al. 2007), the follow-on to
    the k-anonymity gate: k-anonymity bounds re-identification but a
    class whose SENSITIVE attribute is constant still leaks it
    (homogeneity attack). Per quasi-identifier class (order year,
    priority): size, count of distinct sensitive values (order status),
    and the l >= {l} verdict a release gate would enforce.

    Scale: one hash aggregate with a distinct-count (two-phase,
    map-side partial) — same shape as k_anonymity_report.
    """.format(l=_L_DIV)
    o = read_table(spark, sf_dir, "orders")
    nd = F.countDistinct("o_orderstatus")
    return o.groupBy(
        F.year("o_orderdate").cast("int").alias("order_year"),
        "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).cast("long").alias("group_n"),
        nd.cast("long").alias("n_sensitive"),
        (nd >= _L_DIV).alias("l_diverse"),
    )


# --- referential-integrity audit ----------------------------------------------------

_RI_EDGES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
)


def _ri_edge_sql(child: str, ckey: str, parent: str, pkey: str) -> str:
    return f"""
SELECT '{child}.{ckey}->{parent}.{pkey}' AS edge,
       cast(count(*) AS bigint) AS n_child_rows,
       cast(sum(CASE WHEN c.{ckey} IS NOT NULL AND p.__pk IS NULL
                     THEN 1 ELSE 0 END) AS bigint) AS n_orphan_rows,
       cast(count(DISTINCT CASE WHEN p.__pk IS NULL THEN c.{ckey} END)
            AS bigint) AS n_orphan_keys
FROM {child} c
LEFT JOIN (SELECT DISTINCT {pkey} AS __pk FROM {parent}) p
  ON c.{ckey} = p.__pk"""


_RI_ORACLE = "\nUNION ALL\n".join(_ri_edge_sql(*e) for e in _RI_EDGES)


@register(
    "ri_audit_counts",
    oracle=_RI_ORACLE,
    tags=("extension", "quality", "contracts"),
)
def ri_audit_counts(spark, sf_dir):
    """Referential-integrity audit across every foreign-key edge of the
    schema: per edge, child row count, rows whose non-NULL key has no
    parent (orphans), and distinct orphan keys — the cross-table data
    contract that the per-table not_null/unique checks (Q1/Q2) cannot
    express. Clean data reports zero orphans; the counts quantify the
    blast radius when ingestion breaks.

    Scale: each edge is one equi-join of the child key stream against
    the DISTINCT parent-key set (Spark broadcasts the small dims,
    shuffles the fact-fact edges on the key), followed by a map-side
    combined count — the union is 6 independent branches the scheduler
    runs concurrently. No edge materializes orphan rows, only counts."""
    frames = []
    for child, ckey, parent, pkey in _RI_EDGES:
        c = read_table(spark, sf_dir, child)
        p = read_table(spark, sf_dir, parent).select(
            F.col(pkey).alias("__pk")
        ).distinct()
        j = c.select(F.col(ckey).alias("__ck")).join(
            p, F.col("__ck") == F.col("__pk"), "left"
        )
        frames.append(
            j.agg(
                F.lit(f"{child}.{ckey}->{parent}.{pkey}").alias("edge"),
                F.count(F.lit(1)).cast("long").alias("n_child_rows"),
                F.sum(
                    F.when(
                        F.col("__ck").isNotNull() & F.col("__pk").isNull(), 1
                    ).otherwise(0)
                )
                .cast("long")
                .alias("n_orphan_rows"),
                F.countDistinct(F.when(F.col("__pk").isNull(), F.col("__ck")))
                .cast("long")
                .alias("n_orphan_keys"),
            )
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out


# --- incremental view maintenance (aggregate merge with retractions) ----------------

_IVM_ORACLE = """
SELECT date_trunc('month', o_orderdate) AS month,
       o_orderstatus,
       cast(count(*) AS bigint) AS n_rows,
       floor(cast(sum(cast(floor(o_totalprice * 100 + 0.5) AS bigint))
                  AS double) + 0.5) / 100 AS total
FROM orders
WHERE (o_orderkey % 10 <> 0 AND o_orderkey % 100 <> 7) OR o_orderkey % 10 = 0
GROUP BY 1, 2
"""


@register(
    "ivm_apply_delta",
    oracle=_IVM_ORACLE,
    tags=("extension", "lakehouse", "ivm"),
)
def ivm_apply_delta(spark, sf_dir):
    """Incremental view maintenance at the AGGREGATE level (the
    Materialize / Delta-Live primitive; cdc_apply_changelog is its
    row-level cousin): a materialized monthly-by-status rollup is
    updated from a delta batch WITHOUT recomputing the base — inserts
    contribute (+1, +cents) partials, deletes contribute (-1, -cents)
    retractions, the merge is one full-outer join of tiny aggregate
    states, and groups whose count reaches zero VANISH from the view.
    Deterministic synthesized delta (orderkey % 10 = 0 inserts,
    orderkey % 100 = 7 deletes from the base) so the oracle can verify
    the MERGE PATH against the direct computation over the post-delta
    row set — merge == recompute is the IVM correctness property.

    Scale: the base is already aggregated (months x statuses); the
    delta aggregates once on its own (map-side combined) and the merge
    joins two aggregate-sized relations — a 100 TB base table is never
    re-read. All counts and cents are exact int64."""
    o = read_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    month = F.date_trunc("month", "o_orderdate").alias("month")

    base_rows = o.where(F.col("o_orderkey") % 10 != 0)
    inserts = o.where(F.col("o_orderkey") % 10 == 0)
    deletes = base_rows.where(F.col("o_orderkey") % 100 == 7)

    base_agg = base_rows.groupBy(month, "o_orderstatus").agg(
        F.count(F.lit(1)).alias("bn"), F.sum(cents).alias("bc")
    )
    delta = inserts.select(
        month, "o_orderstatus", F.lit(1).alias("dn"), cents.alias("dc")
    ).unionByName(
        deletes.select(
            month, "o_orderstatus", F.lit(-1).alias("dn"), (-cents).alias("dc")
        )
    )
    delta_agg = delta.groupBy("month", "o_orderstatus").agg(
        F.sum("dn").alias("dn"), F.sum("dc").alias("dc")
    )
    merged = (
        base_agg.join(delta_agg, ["month", "o_orderstatus"], "full_outer")
        .select(
            "month",
            "o_orderstatus",
            (F.coalesce("bn", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n_rows"),
            (F.coalesce("bc", F.lit(0)) + F.coalesce("dc", F.lit(0))).alias("cents"),
        )
        .where(F.col("n_rows") > 0)
    )
    return merged.select(
        "month",
        "o_orderstatus",
        "n_rows",
        (F.floor(F.col("cents").cast("double") + 0.5) / 100).alias("total"),
    )
