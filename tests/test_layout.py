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


# --- parquet footer thrift reader (round 11) -------------------------------------------


def test_parquet_footer_reader_vs_pyarrow_three_writers(spark, tmp_path):
    """Foreign-writer interop for the compact-thrift footer reader:
    footers written by THREE independent implementations — parquet-cpp
    (the pyarrow-written testdata lake), parquet-mr (Spark's own
    writer), and DuckDB's COPY TO (multi-row-group, with nulls) — must
    parse field-for-field equal to pyarrow's metadata API."""
    import datetime
    import glob

    import duckdb
    import pyarrow.parquet as pq

    from bigdata_meteo_datalake_spark.operators.parquet_footer import (
        read_footer_from_path,
    )
    from .conftest import SF0001

    def check(f):
        mine = read_footer_from_path(f)
        ref = pq.ParquetFile(f).metadata
        assert mine["num_rows"] == ref.num_rows
        assert mine["n_row_groups"] == ref.num_row_groups
        assert mine["created_by"] == ref.created_by
        byrg = {(c["row_group"], c["path"]): c for c in mine["columns"]}
        for g in range(ref.num_row_groups):
            rg = ref.row_group(g)
            for i in range(rg.num_columns):
                rc = rg.column(i)
                mc = byrg[(g, rc.path_in_schema)]
                assert mc["total_compressed_size"] == rc.total_compressed_size
                assert (mc["total_uncompressed_size"]
                        == rc.total_uncompressed_size)
                assert mc["num_values"] == rc.num_values
                assert mc["codec"] == rc.compression
                st = rc.statistics
                if (st is not None and st.has_min_max
                        and rc.physical_type in ("INT32", "INT64",
                                                 "DOUBLE", "FLOAT")
                        and not isinstance(st.min, (datetime.datetime,
                                                    datetime.date))):
                    # (timestamp stats: pyarrow converts to datetime,
                    # this reader reports the raw int64 — by design)
                    assert mc["min_value"] == st.min, (f, rc.path_in_schema)
                    assert mc["max_value"] == st.max, (f, rc.path_in_schema)
                if st is not None and st.has_null_count:
                    assert mc["null_count"] == st.null_count
        return mine

    # writer 1: parquet-cpp (every testdata table)
    for f in sorted(glob.glob(f"{SF0001}/*.parquet")):
        m = check(f)
        assert "parquet-cpp" in m["created_by"]

    # writer 2: parquet-mr (Spark's own writer)
    sdir = tmp_path / "spark_written"
    spark.range(0, 5000).selectExpr(
        "id AS k", "CASE WHEN id % 9 = 0 THEN NULL ELSE id * 0.25 END AS v",
        "concat('s', id) AS s"
    ).repartition(3).write.parquet(str(sdir))
    spark_files = sorted(glob.glob(f"{sdir}/*.parquet"))
    assert spark_files
    for f in spark_files:
        m = check(f)
        assert "parquet-mr" in m["created_by"]
    nulls = sum(
        c["null_count"]
        for f in spark_files
        for c in read_footer_from_path(f)["columns"]
        if c["path"] == "v"
    )
    assert nulls == len([i for i in range(5000) if i % 9 == 0])

    # writer 3: DuckDB, forced multi-row-group
    dpath = str(tmp_path / "duck.parquet")
    duckdb.sql(
        "COPY (SELECT i AS k, CASE WHEN i % 7 = 0 THEN NULL "
        "ELSE i * 1.5 END AS v FROM range(0, 10000) t(i)) "
        f"TO '{dpath}' (FORMAT PARQUET, ROW_GROUP_SIZE 2048)"
    )
    m = check(dpath)
    assert m["created_by"].startswith("DuckDB")
    assert m["n_row_groups"] >= 3
    # per-row-group accounting survived the internal consistency check
    # (sum of rg rows == num_rows) by construction of read_parquet_footer


def test_parquet_footer_rejections(tmp_path):
    """Framing violations fail loud: bad magic, overrunning footer
    length, truncated thrift, short files."""
    import duckdb
    import pytest
    import struct

    from bigdata_meteo_datalake_spark.operators.parquet_footer import (
        read_footer_from_path,
        read_parquet_footer,
    )

    p = str(tmp_path / "x.parquet")
    duckdb.sql(f"COPY (SELECT 1 AS a) TO '{p}' (FORMAT PARQUET)")
    good = open(p, "rb").read()
    assert read_parquet_footer(good)["num_rows"] == 1

    with pytest.raises(ValueError, match="PAR1"):
        read_parquet_footer(good[:-4] + b"XXXX")
    with pytest.raises(ValueError, match="shorter"):
        read_parquet_footer(b"PAR1PAR1")
    # footer length pointing past the start of the file
    bad = bytearray(good)
    struct.pack_into("<I", bad, len(bad) - 8, len(bad))
    with pytest.raises(ValueError, match="overruns"):
        read_parquet_footer(bytes(bad))
    # truncated thrift: halve the declared footer, keep the framing
    (flen,) = struct.unpack_from("<I", good, len(good) - 8)
    cut = good[: len(good) - 8 - flen] + good[len(good) - 8 - flen :
                                              len(good) - 8 - flen // 2]
    cut += struct.pack("<I", flen - flen // 2) + b"PAR1"
    with pytest.raises(ValueError):
        read_parquet_footer(cut)
    # path variant checks the LEADING magic too
    bad2 = str(tmp_path / "y.parquet")
    with open(bad2, "wb") as f:
        f.write(b"XXXX" + good[4:])
    with pytest.raises(ValueError, match="leading PAR1"):
        read_footer_from_path(bad2)


def test_multifile_table_scan_parallelizes(spark, tmp_path):
    """The round-14 sf10 finding, pinned engine-side (round-15 verdict
    item 5): a table laid out as N files must yield >= min(N, cores)
    scan partitions under the session's file-split conf, so a
    CPU-heavy map parallelizes — a single-file layout serializes the
    scan (ceil(bytes / maxPartitionBytes) = 1 task for anything under
    128 MB) and a future conf/layout change must not silently
    reintroduce that."""
    cores = spark.sparkContext.defaultParallelism
    n_files = 8
    multi = str(tmp_path / "multi")
    spark.range(0, 80_000).repartition(n_files).write.parquet(multi)
    got = spark.read.parquet(multi).rdd.getNumPartitions()
    assert got >= min(n_files, cores), (
        f"{n_files}-file table scanned in {got} partition(s) on "
        f"{cores} cores — multi-file scans must parallelize"
    )
    # the contrast that motivated the rule: one file, one task
    single = str(tmp_path / "single")
    spark.range(0, 80_000).coalesce(1).write.parquet(single)
    assert spark.read.parquet(single).rdd.getNumPartitions() == 1
