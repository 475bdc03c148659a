"""Scalar-expression parity queries (SURVEY.md section 2.2, P1-P20).

The reference's staging models extract JSON fields, clean sentinel values
('N/A', ''), cast, and derive flags/scores (stg_*.sql, movies_enriched_daily
.sql). Mapped per FIXTURES.md B: ``events.props`` plays the JSONB payload,
order/lineitem string columns play the sentinel-laden OMDb strings.

All expressions are built-in pyspark.sql.functions — JVM-side, inside
whole-stage codegen; no Python UDFs anywhere on these paths.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.lake import read_table
from . import register

# --- P1/P2/P16: projection, rename, row filter ------------------------------


@register(
    "project_filter_rename",
    oracle="""
SELECT event_id,
       user_id,
       event_type AS kind,
       value      AS event_value
FROM events
WHERE event_type IS NOT NULL AND value > 100.0
""",
    tags=("parity", "P1", "P2", "P16"),
)
def project_filter_rename(spark, sf_dir):
    """P1 column pruning + P2 alias + P16 row filter (stg models' CTE shape;
    load_raw_to_postgres.py:100-101 skip-missing-key filter). Both the
    projection and the predicate reach the parquet scan (PushedFilters /
    ReadSchema in `.explain`)."""
    ev = read_table(spark, sf_dir, "events")
    return ev.where(F.col("event_type").isNotNull() & (F.col("value") > 100.0)).select(
        "event_id",
        "user_id",
        F.col("event_type").alias("kind"),
        F.col("value").alias("event_value"),
    )


# --- P3/P4/P8: JSON extraction from the payload column ----------------------


@register(
    "json_payload_extract",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k')                 AS k_text,
       cast(json_extract_string(props, '$.k') AS integer) AS k_int,
       replace(props, ' ', '')                            AS props_json
FROM events
""",
    tags=("parity", "P3", "P4", "P8"),
)
def json_payload_extract(spark, sf_dir):
    """P3 JSON scalar extraction (payload->>'field', stg_tmdb_popular.sql:22-26)
    + P4 subtree kept as JSON (payload->'genre_ids') + P8 cast. The Spark path
    parses once with from_json to a typed struct (Catalyst prunes unreferenced
    fields); the re-serialized subtree round-trips through to_json."""
    ev = read_table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k INT")
    return ev.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").alias("k_text"),
        parsed["k"].alias("k_int"),
        F.to_json(parsed).alias("props_json"),
    )


# --- P5/P6/P7/P18: sentinel cleaning -----------------------------------------


@register(
    "sentinel_cleaning",
    oracle="""
SELECT o_orderkey,
       nullif(o_orderstatus, 'P')   AS status_clean,
       CASE WHEN o_orderpriority IS NULL THEN NULL
            WHEN o_orderpriority = '4-NOT SPECIFIED' THEN NULL
            ELSE cast(substr(o_orderpriority, 1, 1) AS integer)
       END                          AS priority_rank,
       replace(o_orderpriority, '-', ' ') AS priority_label,
       CASE WHEN isnan(o_totalprice) THEN NULL ELSE o_totalprice END
                                    AS totalprice_clean
FROM orders
""",
    tags=("parity", "P5", "P6", "P7", "P8", "P18"),
)
def sentinel_cleaning(spark, sf_dir):
    """P5 empty/sentinel->NULL (nullif, stg_tmdb_popular.sql:22), P6 'N/A'
    CASE-cascade before cast (stg_omdb_ratings.sql:24-40), P7 separator strip
    (replace, stg_omdb_ratings.sql:33), P18 NaN->NULL normalization
    (index_elasticsearch.py:62-97). Cleaning happens BEFORE the cast — with
    ANSI off a residual bad value degrades to NULL, matching the reference."""
    o = read_table(spark, sf_dir, "orders")
    prio = F.col("o_orderpriority")
    return o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_clean"),
        F.when(prio.isNull(), F.lit(None))
        .when(prio == "4-NOT SPECIFIED", F.lit(None))
        .otherwise(F.substring(prio, 1, 1).cast("int"))
        .alias("priority_rank"),
        F.replace(prio, F.lit("-"), F.lit(" ")).alias("priority_label"),
        F.when(F.isnan(F.col("o_totalprice")), F.lit(None))
        .otherwise(F.col("o_totalprice"))
        .alias("totalprice_clean"),
    )


# --- P8/P9/P17: casts, date parts, date formatting ---------------------------


@register(
    "casts_and_dateparts",
    oracle="""
SELECT o_orderkey,
       cast(o_orderdate AS date)          AS order_date,
       cast(year(o_orderdate) AS integer) AS order_year,
       cast(month(o_orderdate) AS integer) AS order_month,
       cast(trunc(o_totalprice) AS bigint) AS totalprice_long,
       strftime(o_orderdate, '%Y-%m-%d')  AS order_day_iso
FROM orders
""",
    tags=("parity", "P8", "P9", "P17"),
)
def casts_and_dateparts(spark, sf_dir):
    """P8 type casts (::date/::int/::bigint), P9 extract(year from ...)
    (movies_enriched_daily.sql:41), P17 timestamp->ISO-date string for the
    search sink (index_elasticsearch.py:80-83). NB: Spark's double->long
    cast truncates toward zero while DuckDB's rounds — the oracle spells
    trunc() explicitly to pin the semantics."""
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.col("o_totalprice").cast("long").alias("totalprice_long"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day_iso"),
    )


# --- P10-P15: arithmetic, rounding, conditional cascade, flags ---------------


@register(
    "derived_scores_and_flags",
    oracle="""
SELECT l_orderkey,
       l_linenumber,
       round(cast(l_extendedprice * 0.6 + (l_quantity / 10.0) * 0.4
             AS decimal(28,6)), 2)::double                      AS weighted_score,
       CASE WHEN l_returnflag = 'A' AND l_linestatus = 'F'
              THEN round(cast(l_extendedprice * (1 - l_discount) AS decimal(28,6)), 2)::double
            WHEN l_returnflag = 'R'
              THEN round(cast(l_extendedprice AS decimal(28,6)), 2)::double
            ELSE round(cast(l_quantity AS decimal(28,6)), 2)::double
       END                                                      AS composite_score,
       (nullif(l_linestatus, 'F') IS NULL)                      AS is_finished,
       (l_quantity >= 30.0 AND coalesce(l_discount, l_tax) < 0.05) AS is_big_cheap,
       (l_quantity < 10.0 AND coalesce(l_discount, l_tax) >= 0.05) AS is_small_discounted
FROM lineitem
""",
    tags=("parity", "P10", "P11", "P12", "P13", "P14", "P15"),
)
def derived_scores_and_flags(spark, sf_dir):
    """P10 arithmetic + P11 round (composite_score, movies_enriched_daily
    .sql:99-102), P12 conditional cascade, P13 NULL-test flag, P14 predicate
    flags with boundary comparisons (>=/<, movies_enriched_daily.sql:106-114),
    P15 coalesce. Weighted-score mirrors `imdb*0.6 + metascore/10*0.4`."""
    from ..functions.numeric import dec_round as r2

    li = read_table(spark, sf_dir, "lineitem")
    qty, disc, tax = F.col("l_quantity"), F.col("l_discount"), F.col("l_tax")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        r2(F.col("l_extendedprice") * 0.6 + (qty / 10.0) * 0.4).alias("weighted_score"),
        F.when(
            (F.col("l_returnflag") == "A") & (F.col("l_linestatus") == "F"),
            r2(F.col("l_extendedprice") * (1 - disc)),
        )
        .when(F.col("l_returnflag") == "R", r2(F.col("l_extendedprice")))
        .otherwise(r2(qty))
        .alias("composite_score"),
        F.nullif(F.col("l_linestatus"), F.lit("F")).isNull().alias("is_finished"),
        ((qty >= 30.0) & (F.coalesce(disc, tax) < 0.05)).alias("is_big_cheap"),
        ((qty < 10.0) & (F.coalesce(disc, tax) >= 0.05)).alias("is_small_discounted"),
    )


# --- P19/P20: surrogate ids, row->JSON document ------------------------------


@register(
    "surrogate_id_json_doc",
    oracle="""
SELECT concat_ws('_', strftime(o_orderdate, '%Y-%m-%d'), cast(o_orderkey AS varchar))
         AS doc_id,
       to_json(struct_pack(
         doc_id := concat_ws('_', strftime(o_orderdate, '%Y-%m-%d'),
                             cast(o_orderkey AS varchar)),
         status := o_orderstatus,
         priority := o_orderpriority
       )) AS doc_json
FROM orders
""",
    tags=("parity", "P19", "P20"),
)
def surrogate_id_json_doc(spark, sf_dir):
    """P19 stable surrogate `_`-joined id (index_elasticsearch.py:123,245-246)
    + P20 row->JSON document for the bulk indexer (index_elasticsearch
    .py:116-126), as to_json(struct(...)) instead of a per-row Python loop."""
    o = read_table(spark, sf_dir, "orders")
    doc_id = F.concat_ws(
        "_", F.date_format("o_orderdate", "yyyy-MM-dd"), F.col("o_orderkey").cast("string")
    )
    return o.select(
        doc_id.alias("doc_id"),
        F.to_json(
            F.struct(
                doc_id.alias("doc_id"),
                F.col("o_orderstatus").alias("status"),
                F.col("o_orderpriority").alias("priority"),
            )
        ).alias("doc_json"),
    )
