#!/usr/bin/env python
"""Worked example: the lakehouse operations loop — measure, lay out,
verify — over the orders/events tables.

    python examples/lakehouse_ops_run.py [sf_dir]

Stages (each a registered, oracle-checked operator or a tested lake
utility; this script only composes them):

1. skew pre-flight      — skew_report_custkey decides whether the
                          downstream aggregation needs salting
2. aggregate            — plain or salted two-phase groupBy, chosen by
                          the measured max/mean ratio
3. z-order layout       — cluster events on (user_id, hour) and write,
                          then report per-file locality rectangles
4. integrity            — per-month bit_xor checksums of the source vs
                          the rewritten copy (anti-entropy verification)
5. cardinality sketches — HLL + KMV distinct-user estimates next to
                          exact counts (what you'd keep when exact stops
                          being affordable)
6. RI audit             — orphan counts per FK edge (cross-table
                          contracts the per-table checks can't express)
7. l-diversity gate     — sensitive-value diversity per QI class

The decisions a production job would make from thresholds are printed,
not hidden: the point of the ops pillar is that every lever (salt,
cluster, checksum, sketch) is measurable before it is pulled.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigdata_meteo_datalake_spark.operators.compact import zorder_layout
from bigdata_meteo_datalake_spark.operators.skew import salted_count_sum
from bigdata_meteo_datalake_spark.queries.ext_relational import (
    partition_checksums_monthly,
    skew_report_custkey,
)
from bigdata_meteo_datalake_spark.queries.ext_sketch import (
    hll_distinct_users,
    kmv_distinct_users,
)
from bigdata_meteo_datalake_spark.session import get_spark
from bigdata_meteo_datalake_spark.sources.lake import read_table

SALT_THRESHOLD = 4.0  # max_rows_per_key / mean above this → salt


def main(sf_dir: str) -> None:
    spark = get_spark("lakehouse-ops-example")

    # 1. measure skew before choosing the aggregation strategy
    report = skew_report_custkey(spark, sf_dir).collect()[0]
    print(
        f"skew: {report.n_keys} keys, hottest {report.max_rows_per_key} rows "
        f"({report.max_over_mean}x mean), top5 share {report.top5_share}"
    )

    # 2. aggregate accordingly
    orders = read_table(spark, sf_dir, "orders")
    if report.max_over_mean > SALT_THRESHOLD:
        print(f"max/mean > {SALT_THRESHOLD}: using salted two-phase aggregation")
        per_cust = salted_count_sum(
            orders, ["o_custkey"], ["o_totalprice"], n_salts=16
        )
    else:
        print(f"max/mean <= {SALT_THRESHOLD}: plain hash aggregation")
        per_cust = orders.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_totalprice").alias("sum_value"),
        )
    print(f"per-customer rollup: {per_cust.count()} rows")

    with tempfile.TemporaryDirectory() as tmp:
        # 3. z-ordered layout for the event table
        ev = read_table(spark, sf_dir, "events").select(
            "event_id",
            "user_id",
            (
                F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
                * 24
                + F.hour("ts")
            ).cast("long").alias("hr"),
        )
        zpath = os.path.join(tmp, "events_zordered")
        zorder_layout(ev, "user_id", "hr", n_files=8).write.mode(
            "overwrite"
        ).parquet(zpath)
        files = (
            spark.read.parquet(zpath)
            .withColumn("f", F.input_file_name())
            .groupBy("f")
            .agg(
                (F.max("user_id") - F.min("user_id") + 1).alias("u_span"),
                (F.max("hr") - F.min("hr") + 1).alias("h_span"),
            )
            .collect()
        )
        for i, r in enumerate(sorted(files, key=lambda r: r.f)):
            print(f"z-file {i}: user span {r.u_span}, hour span {r.h_span}")

        # 4. anti-entropy: source vs a rewritten replica, month by month
        src = {
            str(r.order_month): (r.n_rows, r.checksum)
            for r in partition_checksums_monthly(spark, sf_dir).collect()
        }
        replica_dir = os.path.join(tmp, "orders_replica")
        orders.write.mode("overwrite").parquet(os.path.join(replica_dir, "orders.parquet"))
        rep = {
            str(r.order_month): (r.n_rows, r.checksum)
            for r in partition_checksums_monthly(spark, replica_dir).collect()
        }
        diverged = [m for m in src if src[m] != rep.get(m)]
        print(f"checksums: {len(src)} months, diverged: {diverged or 'none'}")

    # 5. cardinality sketches next to exact counts
    for row in hll_distinct_users(spark, sf_dir).collect():
        print(
            f"HLL {row.event_type}: est {row.est_distinct_users} "
            f"exact {row.exact_distinct_users} (rel_err {row.rel_err})"
        )
    for row in kmv_distinct_users(spark, sf_dir).collect():
        print(
            f"KMV {row.event_type}: est {row.est_distinct_users} "
            f"exact {row.exact_distinct_users} (rel_err {row.rel_err})"
        )

    # 6. cross-table contracts: orphan counts per FK edge (release gate —
    # a clean lake prints zeros; non-zero quantifies the ingestion break)
    from bigdata_meteo_datalake_spark.queries.ext_lakehouse import (
        l_diversity_report,
        ri_audit_counts,
    )

    for r in ri_audit_counts(spark, sf_dir).collect():
        print(
            f"RI {r.edge}: {r.n_orphan_rows}/{r.n_child_rows} orphan rows "
            f"({r.n_orphan_keys} keys)"
        )

    # 7. privacy gate: l-diversity of the sensitive column per QI class
    ldiv = l_diversity_report(spark, sf_dir)
    n_bad = ldiv.where(~F.col("l_diverse")).count()
    print(f"l-diversity: {ldiv.count()} QI classes, {n_bad} below l=2")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
