"""Z-order layout: the clustered write must actually deliver per-file
locality on BOTH key columns (the data-skipping property), and the
re-aggregation query's partial-merge must equal a direct aggregate."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_meteo_datalake_spark.operators.compact import zorder_layout
from bigdata_meteo_datalake_spark.sources.lake import read_table

from .conftest import TEST_SF_DIR


def _hr(col="ts"):
    return (
        F.datediff(F.col(col).cast("date"), F.lit("2024-01-01").cast("date")) * 24
        + F.hour(col)
    ).cast("long")


def _mean_file_area(spark, path):
    """Mean per-file bounding-rectangle area in (user_id, hour) space —
    the quantity file-skipping effectiveness scales with (a predicate on
    either column prunes a file iff it misses the file's min/max range).
    """
    df = spark.read.parquet(path).withColumn("f", F.input_file_name())
    spans = df.groupBy("f").agg(
        (
            (F.max("user_id") - F.min("user_id") + 1)
            * (F.max("hr") - F.min("hr") + 1)
        ).alias("area")
    )
    rows = spans.collect()
    return sum(r.area for r in rows) / len(rows), len(rows)


def test_zorder_layout_shrinks_file_rectangles(spark, tmp_path):
    ev = read_table(spark, TEST_SF_DIR, "events").select(
        "event_id", "user_id", _hr().alias("hr")
    )
    # baseline: same file count, arrival order (round-robin repartition —
    # what a naive ingest write produces)
    ev.repartition(8).write.mode("overwrite").parquet(str(tmp_path / "plain"))
    zorder_layout(ev, "user_id", "hr", n_files=8).write.mode("overwrite").parquet(
        str(tmp_path / "zorder")
    )
    plain_area, n_plain = _mean_file_area(spark, str(tmp_path / "plain"))
    z_area, n_z = _mean_file_area(spark, str(tmp_path / "zorder"))
    assert n_z >= 4  # range partitioner actually split the keyspace
    # z-ordered files must cover a far smaller rectangle than arrival
    # order (which spans ~the full space in every file)
    assert z_area < plain_area / 2, (z_area, plain_area)


def test_reaggregation_equals_direct(spark):
    from bigdata_meteo_datalake_spark.queries import REGISTRY, queries

    queries()
    merged = REGISTRY["reaggregate_daily_to_month"].fn(spark, TEST_SF_DIR)
    o = read_table(spark, TEST_SF_DIR, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    direct = (
        o.groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum(cents).alias("sum_cents"))
    )
    got = {
        (r.priority, str(r.order_month)): (r.n_orders, r.sum_cents)
        for r in merged.collect()
    }
    want = {
        (r.priority, str(r.order_month)): (r.n_orders, r.sum_cents)
        for r in direct.collect()
    }
    assert got == want
