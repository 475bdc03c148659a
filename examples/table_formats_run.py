#!/usr/bin/env python
"""Worked example: the multi-format estate audit loop — every table
protocol and data-skipping sidecar a 100 TB lake actually runs on,
verified from first principles in one pass.

    python examples/table_formats_run.py [sf_dir]

Stages (each a registered, oracle-checked operator; this script only
composes them and prints the decisions an estate auditor would make):

1. table protocols   — Delta log replay, Iceberg metadata-chain
                       reconstruction, Hudi timeline MVCC snapshot:
                       live-file sets, bytes, and pending-writer flags
                       per protocol
2. parquet sidecars  — footer zone maps, split-block bloom filters,
                       and page indexes, each held to the data it
                       claims to summarize (the skip-trust loop)
3. arrival formats   — Avro OCF blocks, Arrow IPC files AND streams
                       (pyarrow-written, decoded by our FlatBuffers
                       walk), LZ4/zstd frame probes: per-shard decode
                       accounting at the corpus front door

The point of the audit pillar: data skipping and snapshot isolation
are TRUST DECISIONS — this loop is what earns them, and every number
printed here is also hash-checked against DuckDB in the driver sweep.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigdata_meteo_datalake_spark.queries.ext_formats import (
    arrow_ipc_report,
    arrow_stream_report,
    avro_shard_report,
    compressed_frame_probe_report,
    delta_log_snapshot,
    hudi_timeline_report,
    iceberg_snapshot_report,
    orc_data_decode_report,
    orc_index_report,
    orc_string_decode_report,
    parquet_bloom_probe_report,
    parquet_page_decode_report,
    parquet_pageindex_report,
)
from bigdata_meteo_datalake_spark.queries.ext_layout import (
    parquet_footer_report,
)
from bigdata_meteo_datalake_spark.session import get_spark


def main(sf_dir: str) -> None:
    spark = get_spark("table-formats-example")

    # 1. table protocols: snapshot every synthetic table estate
    for name, fn, live_col in (
        ("delta", delta_log_snapshot, "n_live_files"),
        ("iceberg", iceberg_snapshot_report, "n_live_files"),
        ("hudi", hudi_timeline_report, "n_file_groups"),
    ):
        df = fn(spark, sf_dir)
        agg = df.agg(
            F.count("*").alias("tables"),
            F.sum(live_col).alias("live"),
            F.sum("live_bytes").alias("bytes"),
        ).collect()[0]
        extra = ""
        if name == "hudi":
            pending = df.where(F.col("pending")).count()
            extra = f", {pending} tables with a concurrent writer mid-commit"
        print(f"{name}: {agg.tables} tables, {agg.live} live files, "
              f"{agg.bytes} live bytes{extra}")

    # 2. parquet sidecars: the skip-trust loop (footer vs data, bloom
    #    no-false-negative, page-level bounds honesty)
    footer = parquet_footer_report(spark, sf_dir)
    print(f"footer zone maps: {footer.count()} column audits, all "
          "hash-locked to data recomputation")
    bloom = parquet_bloom_probe_report(spark, sf_dir).collect()
    misses = [r for r in bloom if not r.all_present]
    print(f"bloom filters: {len(bloom)} column audits, "
          f"{sum(r.n_distinct for r in bloom)} distinct values probed, "
          f"{len(misses)} false-negative violations (must be 0)")
    pages = parquet_pageindex_report(spark, sf_dir).agg(
        F.sum("n_pages").alias("p"), F.count("*").alias("c")
    ).collect()[0]
    print(f"page indexes: {pages.c} column audits, {pages.p} pages, "
          "every page's bounds held to its rows")
    strides = orc_index_report(spark, sf_dir).agg(
        F.sum("n_strides").alias("s"), F.count("*").alias("c")
    ).collect()[0]
    print(f"ORC row-group indexes: {strides.c} column audits, "
          f"{strides.s} strides, per-stride stats AND blooms verified")

    # 2b. the capstones: read the VALUES with no format library
    for name, fn in (("parquet decode", parquet_page_decode_report),
                     ("ORC decode", orc_data_decode_report)):
        a = fn(spark, sf_dir).agg(
            F.count("*").alias("c"), F.sum("num_rows").alias("r")
        ).collect()[0]
        print(f"{name}: {a.c} columns / {a.r} rows hand-decoded, "
              "pyarrow-cross-checked, oracle-hash-locked")
    sd = orc_string_decode_report(spark, sf_dir).agg(
        F.count("*").alias("c"), F.sum("total_chars").alias("ch")
    ).collect()[0]
    print(f"ORC string decode: {sd.c} columns / {sd.ch} chars through "
          "both string encodings")

    # 3. arrival formats: front-door decode accounting
    avro = avro_shard_report(spark, sf_dir).agg(
        F.count("*").alias("blocks"), F.sum("n_records").alias("recs")
    ).collect()[0]
    print(f"avro: {avro.blocks} blocks / {avro.recs} records decoded "
          "(null/deflate/snappy)")
    for name, fn in (("arrow file", arrow_ipc_report),
                     ("arrow stream", arrow_stream_report)):
        a = fn(spark, sf_dir).agg(
            F.count("*").alias("batches"), F.sum("n_rows").alias("rows"),
            F.sum(F.col("compressed").cast("int")).alias("lz4"),
        ).collect()[0]
        print(f"{name}: {a.batches} record batches / {a.rows} rows "
              f"({a.lz4} lz4-compressed) via the FlatBuffers walk")
    frames = compressed_frame_probe_report(spark, sf_dir).groupBy(
        "fmt"
    ).agg(F.sum("n_blocks").alias("blocks")).collect()
    print("frames:", ", ".join(f"{r.fmt}={r.blocks} blocks" for r in frames))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
