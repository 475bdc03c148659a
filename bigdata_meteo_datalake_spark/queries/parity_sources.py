"""Source/sink-semantics parity queries (SURVEY.md section 2.1 + 2.6).

The file-level ingest operators (S3-S7: envelope JSON, corrupt tolerance,
filename keys) run against fixture JSON in the pytest suite
(tests/test_bronze.py) because queries() only sees the driver's parquet
tables. The *semantics* that are expressible over parquet — last-write-wins
upsert (S8), filename-derived keys (S7), and the declarative quality checks
(Q1-Q3) — register here with oracles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.upsert import latest_by_key
from ..sources.lake import read_table
from . import register

# --- S8: last-write-wins upsert as window dedup ------------------------------


@register(
    "upsert_last_write_wins",
    oracle="""
SELECT event_id, user_id, event_type, cast(ts AS timestamp) AS ts, value
FROM (
  SELECT *,
         row_number() OVER (
           PARTITION BY user_id, event_type
           ORDER BY ts DESC, event_id DESC
         ) AS rn
  FROM events
) WHERE rn = 1
""",
    tags=("parity", "S8"),
)
def upsert_last_write_wins(spark, sf_dir):
    """S8: `INSERT ... ON CONFLICT DO UPDATE` last-write-wins semantics
    (load_raw_to_postgres.py:103-110) as one window dedup: per
    (user_id, event_type) keep the latest ts, ties broken by event_id
    descending (deterministic total order, SURVEY section 4 gotcha 6)."""
    ev = read_table(spark, sf_dir, "events")
    return latest_by_key(
        ev, ["user_id", "event_type"], "ts", tie_breakers=["event_id"]
    ).select("event_id", "user_id", "event_type", "ts", "value")


# --- S7: filename-derived key -------------------------------------------------


@register(
    "filename_derived_key",
    oracle="SELECT 'orders' AS source_stem, count(*) AS n_rows FROM orders",
    tags=("parity", "S7"),
)
def filename_derived_key(spark, sf_dir):
    """S7: the record key comes from the file path, not the payload
    (imdb_id = json_file.stem, load_raw_to_postgres.py:179). Spark-side:
    input_file_name() + regexp_extract — fully distributed, no driver
    involvement in key derivation."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.regexp_extract(F.input_file_name(), r"([^/]+)\.parquet", 1).alias(
                "source_stem"
            )
        )
        .groupBy("source_stem")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


# --- Q1-Q3: declarative quality checks ----------------------------------------


@register(
    "quality_check_report",
    oracle="""
SELECT 'not_null__orders__o_orderkey' AS check_name,
       cast(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS bigint) AS n_violations
FROM orders
UNION ALL
SELECT 'not_null__lineitem__l_orderkey',
       cast(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS bigint)
FROM lineitem
UNION ALL
SELECT 'unique__orders__o_orderkey',
       (SELECT cast(count(*) AS bigint) FROM
         (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1))
FROM (SELECT 1)
UNION ALL
SELECT 'unique__events__event_id',
       (SELECT cast(count(*) AS bigint) FROM
         (SELECT event_id FROM events GROUP BY event_id HAVING count(*) > 1))
FROM (SELECT 1)
""",
    tags=("parity", "Q1", "Q2", "Q3"),
)
def quality_check_report(spark, sf_dir):
    """Q1-Q3: dbt not_null/unique tests (models/staging/schema.yml:15-40) as
    a check-runner producing a violation report."""
    from ..operators.quality import Check, run_checks

    tables = {
        "orders": read_table(spark, sf_dir, "orders"),
        "lineitem": read_table(spark, sf_dir, "lineitem"),
        "events": read_table(spark, sf_dir, "events"),
    }
    checks = [
        Check("orders", "not_null", ("o_orderkey",)),
        Check("lineitem", "not_null", ("l_orderkey",)),
        Check("orders", "unique", ("o_orderkey",)),
        Check("events", "unique", ("event_id",)),
    ]
    return run_checks(tables, checks, spark).select(
        "check_name", "n_violations"
    )
