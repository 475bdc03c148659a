"""Testdata-schema drift guard.

The driver regenerates /root/testdata between rounds and the physical
timestamp encoding of events.ts has already changed shape twice
(INT64 TIMESTAMP(NANOS) in round 1 -> timestamp[us] no-tz / TIMESTAMP_NTZ
in round 2). Round 2's regeneration broke two registered queries at
ANALYSIS and crashed the whole bench harness because the drift was only
discovered at the driver. This suite fails loudly, locally, on the next
drift instead:

1. `read_table` must yield ONE canonical schema per table regardless of the
   physical encoding on disk — in particular events.ts is always
   TimestampType (never LongType, never TimestampNTZType).
2. No query module may call timestamp-epoch functions on a raw column
   outside the normalizing reader (grep-level ban, same pattern as the
   CartesianProduct ban in test_plans.py).
"""

from __future__ import annotations

import os
import re
from pathlib import Path

import pytest
from pyspark.sql import types as T

from bigdata_meteo_datalake_spark.sources.lake import TESTDATA_TABLES, read_table

TESTDATA_ROOT = "/root/testdata"
SF_DIRS = sorted(
    str(p) for p in Path(TESTDATA_ROOT).glob("sf*") if p.is_dir()
) or pytest.skip("no testdata present", allow_module_level=True)

#: canonical reader-output types for the drift-prone columns
_CANONICAL = {
    ("events", "ts"): T.TimestampType,
    ("orders", "o_orderdate"): (T.DateType, T.TimestampType, T.StringType),
    ("lineitem", "l_shipdate"): (T.DateType, T.TimestampType, T.StringType),
}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_reader_yields_canonical_types(spark, sf_dir):
    """Every table read through read_table: no TimestampNTZType anywhere,
    no LongType leaking for events.ts — the normalizations in
    sources/lake.py:read_table absorbed whatever the writer produced."""
    for name in TESTDATA_TABLES:
        if not os.path.exists(f"{sf_dir}/{name}.parquet"):
            continue
        df = read_table(spark, sf_dir, name)
        for f in df.schema.fields:
            assert not isinstance(f.dataType, T.TimestampNTZType), (
                f"{sf_dir}/{name}.{f.name} surfaced as TIMESTAMP_NTZ — "
                "read_table must cast it to TimestampType (UTC session)"
            )
        for (tbl, col), want in _CANONICAL.items():
            if tbl == name and col in df.columns:
                assert isinstance(df.schema[col].dataType, want), (
                    f"{sf_dir}/{tbl}.{col} is {df.schema[col].dataType}, "
                    f"expected {want} — testdata drifted; extend read_table"
                )


def test_events_ts_epoch_roundtrip(spark):
    """The normalized ts must agree with the raw parquet value: pyarrow's
    microsecond reading of the first event equals Spark's unix_micros after
    normalization (catches an accidental double timezone shift)."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    sf_dir = SF_DIRS[0]
    if not os.path.exists(f"{sf_dir}/events.parquet"):
        pytest.skip("no events table")
    tbl = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])
    pdf = tbl.to_pandas().sort_values("event_id").head(1)
    raw_id = int(pdf["event_id"].iloc[0])
    raw_ts = pdf["ts"].iloc[0]
    # pyarrow yields naive (or UTC) pandas Timestamps; epoch micros either way
    raw_us = int(raw_ts.value // 1_000)

    got = (
        read_table(spark, sf_dir, "events")
        .where(F.col("event_id") == raw_id)
        .select(F.unix_micros("ts").alias("us"))
        .collect()[0]["us"]
    )
    assert got == raw_us, (
        f"events.ts epoch drifted through the reader: raw={raw_us} got={got}"
    )


_QUERY_DIR = (
    Path(__file__).resolve().parents[1] / "bigdata_meteo_datalake_spark"
)
#: epoch/timestamp functions that reject TIMESTAMP_NTZ or silently shift
#: under drift; allowed only on columns already normalized by read_table —
#: the risk surface is calling them inside the READER bypassing the
#: normalization, so the reader module itself is the only allowed site
#: for raw-parquet timestamp arithmetic.
_RAW_TS_PATTERN = re.compile(r"spark\.read\.parquet\([^)]*events")


def test_no_raw_events_scan_outside_reader():
    """All events access goes through read_table (the normalizer). A raw
    spark.read.parquet of events anywhere else would re-expose NTZ drift."""
    offenders = []
    for py in _QUERY_DIR.rglob("*.py"):
        if py.name == "lake.py":
            continue
        if _RAW_TS_PATTERN.search(py.read_text()):
            offenders.append(str(py))
    assert not offenders, f"raw events.parquet scan outside read_table: {offenders}"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_documents_text_is_ascii(spark, sf_dir):
    """Data contract behind the byte-level oracles
    (multimodal_audio_features pairs utf-8 BYTES; the oracle addresses
    CHARACTERS via ascii(substr())): documents.text must stay pure ASCII,
    i.e. char length == encoded byte length for every row. If the driver
    regenerates documents with multi-byte text, this fails before the
    correctness sweep does."""
    from pyspark.sql import functions as F

    d = read_table(spark, sf_dir, "documents")
    n_bad = d.where(
        F.length("text") != F.octet_length(F.encode(F.col("text"), "utf-8"))
    ).count()
    assert n_bad == 0, f"non-ASCII documents.text rows in {sf_dir}: {n_bad}"
