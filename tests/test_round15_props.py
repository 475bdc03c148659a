"""Round-15 regression/property tests: the r14-advice parquet bw==0
fixes, the scan-parallelism layout pin (verdict item 5), the
date-derived audit-epoch wiring (verdict item 6), and the bounded
spatial stats twin's consistency with its pair-materializing gate
(verdict item 1)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

SF_SMALL = "/root/testdata/sf0.001"
SF_MID = "/root/testdata/sf0.01"


# --- bw == 0 dictionary pages: payload consumption + guard (r14 advice) -----------------


def _rle_header(run: int) -> bytes:
    """Varint of (run << 1) — an RLE run header with a 0-byte value."""
    h = run << 1
    out = bytearray()
    while True:
        b = h & 0x7F
        h >>= 7
        if h:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def test_hybrid_width0_accepts_wellformed_streams():
    """parquet-mr-shaped 0-bit payloads: RLE runs and bit-packed groups
    (both 0 value bytes) covering n values decode to [0]*n; trailing
    bytes BEYOND the needed count are tolerated (the decoder stops
    once n values are decoded, at any width)."""
    from bigdata_meteo_datalake_spark.operators.parquet_pages import (
        rle_bp_hybrid,
        rle_bp_hybrid_py,
    )

    for fn in (rle_bp_hybrid, rle_bp_hybrid_py):
        assert fn(_rle_header(500), 0, 500) == [0] * 500
        assert fn(_rle_header(200) + _rle_header(300), 0, 500) == [0] * 500
        # bit-packed: header (g << 1) | 1 covers g*8 values, 0 bytes
        assert fn(bytes([(63 << 1) | 1]), 0, 500) == [0] * 500
        assert fn(b"", 0, 0) == []  # all-null page: no present values
        assert fn(_rle_header(500) + b"\xff\xff", 0, 500) == [0] * 500


def test_hybrid_width0_rejects_malformed_streams():
    from bigdata_meteo_datalake_spark.operators.parquet_pages import (
        rle_bp_hybrid,
        rle_bp_hybrid_py,
    )

    for fn in (rle_bp_hybrid, rle_bp_hybrid_py):
        with pytest.raises(ValueError):
            fn(b"", 0, 1)  # no header at all
        with pytest.raises(ValueError):
            fn(_rle_header(100), 0, 500)  # runs under-cover n
        with pytest.raises(ValueError):
            fn(_rle_header(0), 0, 1)  # zero-length RLE run
        with pytest.raises(ValueError):
            fn(b"\x80\x80\x80\x80\x80\x80", 0, 1)  # endless varint


@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=24),
       st.integers(min_value=0, max_value=600))
def test_hybrid_width0_never_crashes_and_twins_agree(buf, n):
    """Garbage 0-bit payloads either decode (to all zeros) or raise
    ValueError — never crash, never loop — and the numpy/pure twins
    agree exactly."""
    from bigdata_meteo_datalake_spark.operators.parquet_pages import (
        rle_bp_hybrid,
        rle_bp_hybrid_py,
    )

    try:
        a = ("ok", rle_bp_hybrid(buf, 0, n))
        assert a[1] == [0] * len(a[1])
    except ValueError:
        a = ("err",)
    try:
        b = ("ok", rle_bp_hybrid_py(buf, 0, n))
    except ValueError:
        b = ("err",)
    assert a == b


def test_bw0_page_with_multi_entry_dictionary_decodes(spark, tmp_path):
    """Regression (round-15 review): parquet-mr sizes the dictionary
    index bit width PER PAGE from the dictionary size at flush time,
    so a chunk whose first 500 rows hold one value gets a bw=0 first
    page while the chunk's final dictionary has 2 entries — a legal
    Spark-written shape (the sampled audits' own page.row.count.limit
    writer option) that a stricter <=1-entry guard falsely rejected."""
    import glob

    from pyspark.sql import functions as F

    from bigdata_meteo_datalake_spark.operators.parquet_pages import (
        decode_parquet_column,
    )

    df = (
        spark.range(0, 1000)
        .select(
            F.when(F.col("id") < 500, F.lit("a")).otherwise(F.lit("b")).alias("x")
        )
        .coalesce(1)
        .sortWithinPartitions("x")
    )
    out = str(tmp_path / "t")
    (df.write.mode("overwrite")
     .option("parquet.page.row.count.limit", "500")
     .option("compression", "uncompressed")
     .parquet(out))
    [f] = glob.glob(out + "/*.parquet")
    r = decode_parquet_column(open(f, "rb").read(), "x")
    assert r["n_pages"] >= 2
    assert r["values"] == [b"a"] * 500 + [b"b"] * 500


def test_bitwidth0_allnull_and_constant_still_decode(tmp_path):
    """The tightened guard (0-bit indices require exactly a 1-entry
    dictionary when values are present) must not reject the two legal
    writer shapes: all-null columns (0 present values) and constant
    columns."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bigdata_meteo_datalake_spark.operators.parquet_pages import (
        decode_parquet_column,
    )

    p = str(tmp_path / "allnull.parquet")
    pq.write_table(
        pa.table({"x": pa.array([None] * 300, type=pa.int64())}), p,
        data_page_size=128,
    )
    assert decode_parquet_column(open(p, "rb").read(), "x")["values"] == [None] * 300

    p2 = str(tmp_path / "const.parquet")
    pq.write_table(pa.table({"x": pa.array([9] * 300)}), p2)
    assert decode_parquet_column(open(p2, "rb").read(), "x")["values"] == [9] * 300


# --- date-derived audit epoch (verdict item 6) --------------------------------------------


def test_audit_epoch_for_date_steps_daily():
    from bigdata_meteo_datalake_spark.operators.estate_sampling import (
        audit_epoch_for_date,
    )

    e0 = audit_epoch_for_date("2026-08-16")
    e1 = audit_epoch_for_date("2026-08-17")
    assert e1 == e0 + 1
    assert e0 > 0  # never aliases the unsalted historical epoch 0
    with pytest.raises(ValueError):
        audit_epoch_for_date("not-a-date")


def test_estate_audit_rotates_by_run_date(spark):
    """run_estate_audit on two CONSECUTIVE dates must verify different
    shard subsets (the continuous-audit rotation, now driven by
    scheduling alone) and each run must match its own epoch-salted
    DuckDB oracle — rotation changes WHICH files are audited, never
    the report's honesty."""
    from bigdata_meteo_datalake_spark.oracle import (
        compare_frames,
        duckdb_connect,
    )
    from bigdata_meteo_datalake_spark.plans.pipeline import run_estate_audit

    picks = {}
    for date in ("2026-08-16", "2026-08-17"):
        res = run_estate_audit(
            spark, SF_MID, date, audits=("parquet_pageindex",)
        )
        assert res.epoch > 1  # beyond the hand-pinned e0/e1 fixtures
        rep = res.reports["parquet_pageindex"].toPandas()
        con = duckdb_connect(SF_MID)
        try:
            expected = con.execute(res.oracles["parquet_pageindex"]).df()
        finally:
            con.close()
        compare_frames(rep, expected)
        picks[date] = set(zip(rep["tbl"], rep["shard"]))
    assert picks["2026-08-16"] != picks["2026-08-17"], (
        "consecutive run dates audited identical shard sets — epoch "
        "rotation is not reaching the sampler"
    )


# --- spatial stats twin vs the pair-materializing gate (verdict item 1) -------------------


def test_spatial_stats_consistent_with_pairs(spark):
    """The bounded-output headline twin must agree with the
    pair-materializing correctness gate it summarizes: per-cell pair
    counts sum to the total pair count, the global min/max distances
    match, and every (nearest_a, nearest_b) is a real within-radius
    pair with that cell's minimum distance."""
    from bigdata_meteo_datalake_spark.queries import REGISTRY, _load_all

    _load_all()
    pairs = REGISTRY["spatial_radius_pairs"].fn(spark, SF_MID).toPandas()
    stats = REGISTRY["spatial_radius_stats"].fn(spark, SF_MID).toPandas()

    assert int(stats["n_pairs"].sum()) == len(pairs)
    assert stats["min_dist_m"].min() == pairs["dist_m"].min()
    assert stats["max_dist_m"].max() == pairs["dist_m"].max()
    pair_set = set(zip(pairs["custkey_a"], pairs["custkey_b"]))
    assert set(zip(stats["nearest_a"], stats["nearest_b"])) <= pair_set
    assert (stats["min_dist_m"] <= stats["max_dist_m"]).all()


# --- rotating-seed re-fuzz of the round-14/15 surface (verdict item 7) --------------------

_H = settings(max_examples=60, deadline=None)


@_H
@given(
    tbl=st.sampled_from(["lineitem", "orders", "events", "documents"]),
    n_shards=st.integers(min_value=1, max_value=40),
    max_files=st.integers(min_value=1, max_value=6),
    epoch=st.one_of(
        st.integers(min_value=0, max_value=60),
        st.integers(min_value=700_000, max_value=800_000),  # date ordinals
    ),
)
def test_choose_shards_duckdb_twin_at_date_scale_epochs(
    tbl, n_shards, max_files, epoch
):
    """The r14 epoch-equality campaign ran epochs 0-50; date-derived
    epochs (round-15) are proleptic-Gregorian ordinals (~739k for
    2026), so the python/DuckDB twin equality must also hold in that
    range — the salt is a string suffix, but the untested range is
    exactly where a formatting or overflow divergence would hide."""
    import duckdb

    from bigdata_meteo_datalake_spark.operators.estate_sampling import (
        choose_shards,
    )
    from bigdata_meteo_datalake_spark.operators.estate_sampling import (
        chosen_shards_sql,
    )

    py = choose_shards(tbl, n_shards, max_files, epoch)
    sql = chosen_shards_sql(tbl, str(n_shards), max_files, epoch)
    got = sorted(r[0] for r in duckdb.execute(sql).fetchall())
    assert got == py


@pytest.fixture(scope="session")
def audit_shaped_parquet_bytes(tmp_path_factory, spark):
    """Session-scoped capture of small parquet files written WITH the
    sampled-audit writer options (page row limit, v1 dictionary / v2
    writer, gzip) — the exact shapes parquet_page_decode_sampled reads.
    A fixture rather than a prerequisite test (r15 advice): under
    pytest-xdist or randomized ordering a module-level side-effect dict
    could be empty and silently skip the mutation campaign."""
    df = spark.range(0, 3000).selectExpr(
        "id AS pk",
        "cast(id % 97 AS double) / 7 AS val",
        "concat('row-', id % 50) AS name",
    )
    shapes = {
        "dict_v1_gzip": {"parquet.enable.dictionary": "true",
                         "compression": "gzip"},
        "plain_v2": {"parquet.enable.dictionary": "false",
                     "parquet.writer.version": "v2",
                     "compression": "uncompressed"},
    }
    tmp = tmp_path_factory.mktemp("audit_shaped_pq")
    captured = {}
    for label, opts in shapes.items():
        out = str(tmp / label)
        w = (df.coalesce(1).write.mode("overwrite")
             .option("parquet.page.row.count.limit", "500"))
        for k, v in opts.items():
            w = w.option(k, v)
        w.parquet(out)
        import glob

        [f] = glob.glob(out + "/*.parquet")
        captured[label] = open(f, "rb").read()
    return captured


def test_capture_audit_shaped_parquet_fixtures(audit_shaped_parquet_bytes):
    """The audit-shaped fixtures decode clean before any mutation."""
    from bigdata_meteo_datalake_spark.operators.parquet_pages import (
        decode_parquet_column,
    )

    assert set(audit_shaped_parquet_bytes) == {"dict_v1_gzip", "plain_v2"}
    for b in audit_shaped_parquet_bytes.values():
        for col in ("pk", "val", "name"):
            r = decode_parquet_column(b, col)
            assert len(r["values"]) == 3000


@settings(max_examples=150, deadline=None)
@given(data=st.data())
def test_audit_shaped_parquet_mutations_never_crash(
        audit_shaped_parquet_bytes, data):
    """Rotating-seed mutation campaign over the audit-shaped files:
    byte flips/deletions/insertions anywhere (headers, dictionary
    pages, page-index region, data pages) must decode or raise
    ValueError/NotImplementedError — never crash or hang."""
    from bigdata_meteo_datalake_spark.operators.parquet_pages import (
        decode_parquet_column,
    )

    label = data.draw(st.sampled_from(sorted(audit_shaped_parquet_bytes)))
    blob = bytearray(audit_shaped_parquet_bytes[label])
    for _ in range(data.draw(st.integers(min_value=1, max_value=4))):
        op = data.draw(st.sampled_from(["flip", "del", "ins"]))
        pos = data.draw(st.integers(min_value=0, max_value=len(blob) - 1))
        if op == "flip":
            blob[pos] ^= data.draw(st.integers(min_value=1, max_value=255))
        elif op == "del":
            del blob[pos]
        else:
            blob.insert(pos, data.draw(st.integers(min_value=0, max_value=255)))
    col = data.draw(st.sampled_from(["pk", "val", "name"]))
    try:
        r = decode_parquet_column(bytes(blob), col)
        assert isinstance(r["values"], list)
    except (ValueError, NotImplementedError):
        pass


# --- star-contraction rounds vs diameter (verdict item 3) ---------------------------------


def test_two_phase_cc_rounds_logarithmic_in_diameter(spark):
    """connected_components_two_phase on PATH graphs (diameter n-1,
    label propagation's worst case — it needs n rounds): the
    large-star/small-star round count must stay logarithmic. Pins the
    measured band (.scale/cc_diameter15.py: 11 rounds at n=1e3 ...
    21 at n=1e6, sequential ids — the adversarial labeling) with
    rounds <= 2*ceil(log2(n)) per size and <= +4 rounds per 16x
    diameter growth."""
    import math

    from pyspark.sql import functions as F

    from bigdata_meteo_datalake_spark.operators.dedup import (
        connected_components_two_phase,
    )

    rounds = {}
    for n in (256, 4096):
        edges = spark.range(0, n - 1).select(
            F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
        )
        stats: dict = {}
        cc = connected_components_two_phase(edges, max_iter=40, stats=stats)
        assert cc.select("cluster_rep").distinct().count() == 1
        rounds[n] = stats["rounds"]
        assert stats["rounds"] <= 2 * math.ceil(math.log2(n)), (
            f"path of {n} nodes took {stats['rounds']} rounds — "
            "star contraction is no longer log-round"
        )
    assert rounds[4096] - rounds[256] <= 4, rounds


def test_rotation_coverage_accumulates_over_consecutive_dates():
    """The continuous-audit promise behind the date-derived epoch: a
    daily loop auditing max_files=3 of lineitem's 15 sf0.01 shards
    must reach FULL estate coverage as the dates roll — pinned at <=
    30 consecutive days from three different start dates (measured:
    15 days from 2026-08-16; coupon-collector expectation ~12-15)."""
    from datetime import date, timedelta

    from bigdata_meteo_datalake_spark.operators.estate_sampling import (
        audit_epoch_for_date,
        choose_shards,
    )

    n_shards, max_files = 15, 3
    for start in ("2026-08-16", "2027-01-01", "2030-06-15"):
        seen: set = set()
        d = date.fromisoformat(start)
        for day in range(1, 31):
            epoch = audit_epoch_for_date(d.isoformat())
            seen |= set(choose_shards("lineitem", n_shards, max_files, epoch))
            if len(seen) == n_shards:
                break
            d += timedelta(days=1)
        assert len(seen) == n_shards, (
            f"rotation from {start} covered only {len(seen)}/{n_shards} "
            "shards in 30 days"
        )


def test_estate_audit_all_four_oracle_green_at_date_epoch(spark):
    """Every audit family the continuous loop runs — pageindex, page
    decode, ORC index, ORC string decode — must be oracle-green at a
    DATE-DERIVED epoch (not just the hand-pinned e0/e1 fixtures): the
    epoch threads through the shard manifest, the kernel's sampler,
    and the DuckDB twin identically for all four."""
    from bigdata_meteo_datalake_spark.oracle import (
        compare_frames,
        duckdb_connect,
    )
    from bigdata_meteo_datalake_spark.plans.pipeline import run_estate_audit

    res = run_estate_audit(spark, SF_MID, "2026-08-18")
    assert set(res.reports) == {
        "parquet_pageindex", "parquet_page_decode",
        "orc_index", "orc_string_decode",
    }
    con = duckdb_connect(SF_MID)
    try:
        for name, rep in res.reports.items():
            expected = con.execute(res.oracles[name]).df()
            compare_frames(rep.toPandas(), expected)
    finally:
        con.close()
