"""Round-14 additions: epoch-rotated estate sampling, sampled decode
audits, all-null guards, and the round-13 advice regressions (cbor
duplicate keys, exact integer-ceil SQL twins, row-count cache
eviction, footer-fallback logging, sweep starvation guard)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from .conftest import TEST_SF_DIR

_H = settings(max_examples=60, deadline=None)


# --- epoch-rotated sampling (operators/estate_sampling.py) -----------------------------


def test_epoch_salt_contract():
    from bigdata_meteo_datalake_spark.operators.estate_sampling import (
        epoch_salt,
        file_sample_key,
    )

    assert epoch_salt(0) == ""  # epoch 0 keeps the historical unsalted key
    assert epoch_salt(3) == "#e3"
    with pytest.raises(ValueError):
        epoch_salt(-1)
    # epoch 0 is bit-identical to the pre-rotation key
    import hashlib

    legacy = int(hashlib.md5(b"orders/shard=7").hexdigest()[:15], 16)
    assert file_sample_key("orders", 7) == legacy
    assert file_sample_key("orders", 7, epoch=0) == legacy


@_H
@given(
    tbl=st.sampled_from(["lineitem", "orders", "events", "documents"]),
    n=st.integers(min_value=1, max_value=200),
    mf=st.integers(min_value=1, max_value=5),
    epoch=st.integers(min_value=0, max_value=50),
)
def test_choose_shards_epoch_deterministic_and_valid(tbl, n, mf, epoch):
    """Every epoch is individually deterministic, sorted, in-range, and
    exactly min(n, mf) distinct shards."""
    from bigdata_meteo_datalake_spark.operators.estate_sampling import (
        choose_shards,
    )

    a = choose_shards(tbl, n, mf, epoch)
    assert a == choose_shards(tbl, n, mf, epoch)
    assert a == sorted(set(a))
    assert all(0 <= s < n for s in a)
    assert len(a) == min(n, mf)


@_H
@given(
    tbl=st.sampled_from(["lineitem", "orders", "documents", "zz"]),
    n=st.integers(min_value=1, max_value=120),
    mf=st.integers(min_value=1, max_value=4),
    epoch=st.integers(min_value=0, max_value=20),
)
def test_chosen_shards_sql_epoch_twin(tbl, n, mf, epoch):
    """The DuckDB chooser twin equals the python chooser at EVERY
    epoch — the property the rotated audits' oracles rest on."""
    import duckdb

    from bigdata_meteo_datalake_spark.operators.estate_sampling import (
        choose_shards,
        chosen_shards_sql,
    )

    sql = chosen_shards_sql(tbl, str(n), mf, epoch)
    got = sorted(r[0] for r in duckdb.sql(sql).fetchall())
    assert got == choose_shards(tbl, n, mf, epoch)


def test_epochs_rotate_coverage():
    """Distinct epochs choose overlapping-but-distinct samples: over a
    50-shard table, stepping the epoch changes the chosen subset (the
    rotation the module docstring promises) and the UNION of a few
    epochs covers more files than any single epoch."""
    from bigdata_meteo_datalake_spark.operators.estate_sampling import (
        AUDIT_MAX_FILES,
        choose_shards,
    )

    per_epoch = [
        tuple(choose_shards("lineitem", 50, AUDIT_MAX_FILES, e))
        for e in range(10)
    ]
    assert len(set(per_epoch)) > 1  # rotation actually happens
    union = {s for ch in per_epoch for s in ch}
    assert len(union) > AUDIT_MAX_FILES  # coverage grows over epochs


def test_sample_audit_manifest_epoch_matches_python(spark):
    """The Spark manifest rank at epoch e keeps exactly the files the
    python chooser picks at epoch e."""
    from bigdata_meteo_datalake_spark.operators.estate_sampling import (
        choose_shards,
        sample_audit_manifest,
    )

    n = 40
    rows = [("orders", f"orders/shard={s}", s) for s in range(n)]
    df = spark.createDataFrame(rows, "tbl string, path string, shard int")
    for epoch in (0, 1, 7):
        kept = sorted(
            r.shard
            for r in sample_audit_manifest(
                df, max_files_per_table=3, epoch=epoch
            ).collect()
        )
        assert kept == choose_shards("orders", n, 3, epoch)


# --- all-null guards (round-13 advice item 3) -------------------------------------------


def _allnull_parquet(tmp_path, n=100):
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "allnull.parquet")
    t = pa.table({"x": pa.array([None] * n, type=pa.int64())})
    pq.write_table(t, p, write_page_index=True, data_page_size=64)
    return p


def test_pageindex_stats_allnull_column(spark, tmp_path):
    """A non-empty file whose audited column is entirely null reports
    NULL min/max instead of crashing (round-13 advice)."""
    from bigdata_meteo_datalake_spark.operators.parquet_pageindex import (
        pageindex_column_stats,
    )

    p = _allnull_parquet(tmp_path)
    df = spark.createDataFrame(
        [("t", "x", "int", p)], "tbl string, col string, kind string, path string"
    )
    [r] = pageindex_column_stats(df, row_limit=100).collect()
    assert r.num_rows == 100 and r.null_count == 100
    assert r.min_micro is None and r.max_micro is None


def test_page_decode_stats_allnull_column(spark, tmp_path):
    """The decode kernel mirrors SQL sum/min/max-over-no-rows (NULL)
    for an all-null column instead of crashing."""
    from bigdata_meteo_datalake_spark.operators.parquet_pages import (
        page_decode_column_stats,
    )

    p = _allnull_parquet(tmp_path)
    df = spark.createDataFrame(
        [("t", "x", "int", p)], "tbl string, col string, kind string, path string"
    )
    [r] = page_decode_column_stats(df, row_limit=100).collect()
    assert r.num_rows == 100 and r.null_count == 100
    assert r.sum_micro is None and r.min_micro is None and r.max_micro is None


# --- cbor canonical duplicate keys (round-13 advice item 4) -----------------------------


def test_cbor_duplicate_key_reported_as_duplicate():
    """Under canonical decoding a repeated map key is reported as a
    DUPLICATE, not an ordering violation (equal encodings fall through
    the strict < order check to the duplicate-key error)."""
    from bigdata_meteo_datalake_spark.operators.cbor import decode_cbor

    # {"a": 1, "a": 2} — two identical keys, canonical order otherwise
    b = bytes([0xA2, 0x61, 0x61, 0x01, 0x61, 0x61, 0x02])
    with pytest.raises(ValueError, match="duplicate map key"):
        decode_cbor(b, canonical=True)
    # a genuinely misordered map still trips the order check
    b2 = bytes([0xA2, 0x61, 0x62, 0x01, 0x61, 0x61, 0x02])  # "b" then "a"
    with pytest.raises(ValueError, match="canonical"):
        decode_cbor(b2, canonical=True)


# --- exact integer-ceil SQL twins (round-13 advice item 2) ------------------------------


@_H
@given(n=st.one_of(
    st.integers(min_value=1, max_value=10**6),
    st.integers(min_value=2**53 - 10**3, max_value=2**53 + 10**3),
    st.integers(min_value=2**60, max_value=2**60 + 10**3),
))
def test_ivf_centroid_mod_sql_exact_twin(n):
    """The SQL sizing twin equals the python closed form EXACTLY, even
    past 2^53 where the old double-division ceil lost exactness."""
    import duckdb

    from bigdata_meteo_datalake_spark.operators.dedup import (
        ivf_centroid_mod,
        ivf_centroid_mod_sql,
    )

    got = duckdb.sql(
        f"SELECT {ivf_centroid_mod_sql(str(n))}"
    ).fetchone()[0]
    assert got == ivf_centroid_mod(n)


@_H
@given(n=st.one_of(
    st.integers(min_value=1, max_value=10**6),
    st.integers(min_value=2**53 - 10**3, max_value=2**53 + 10**3),
))
def test_sampled_ns_sql_exact_twin(n):
    """The sampled audits' shard-count SQL equals -(-n // R) exactly."""
    import duckdb

    from bigdata_meteo_datalake_spark.operators.estate_sampling import (
        AUDIT_SHARD_ROWS,
    )
    from bigdata_meteo_datalake_spark.queries.ext_formats import (
        _sampled_ns_sql,
    )

    sql = _sampled_ns_sql("t").replace("count(*)", str(n)).replace(
        " FROM t", "")
    got = duckdb.sql(f"SELECT {sql}").fetchone()[0]
    assert got == max(1, -(-n // AUDIT_SHARD_ROWS))


# --- row-count cache eviction + fallback logging (advice item 5, verdict item 6) --------


def test_row_count_cache_evicts_superseded_versions(spark, tmp_path):
    """Rewriting a table REPLACES its cache entry instead of
    accumulating dead (path, stamp) keys for the session's life."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from bigdata_meteo_datalake_spark.sources.lake import (
        _ROW_COUNT_CACHE,
        table_row_count,
    )

    p = str(tmp_path / "nation.parquet")
    pq.write_table(pa.table({"a": list(range(10))}), p)
    assert table_row_count(spark, str(tmp_path), "nation") == 10
    n_entries = sum(1 for k in _ROW_COUNT_CACHE if k.startswith(str(tmp_path)))
    # rewrite with a different size/mtime
    time.sleep(0.01)
    pq.write_table(pa.table({"a": list(range(25))}), p)
    os.utime(p)
    assert table_row_count(spark, str(tmp_path), "nation") == 25
    n_after = sum(1 for k in _ROW_COUNT_CACHE if k.startswith(str(tmp_path)))
    assert n_after == n_entries  # replaced, not accumulated


def test_row_count_footer_fallback_logs(spark, tmp_path, caplog, monkeypatch):
    """When footer stats are unreadable the Spark-count fallback still
    answers — and says so out loud (round-13 verdict item 6)."""
    import logging

    import pyarrow as pa
    import pyarrow.parquet as pq

    from bigdata_meteo_datalake_spark.sources import lake

    p = str(tmp_path / "region.parquet")
    pq.write_table(pa.table({"a": list(range(7))}), p)

    def boom(*a, **k):
        raise OSError("footer unreadable")

    monkeypatch.setattr(pq, "read_metadata", boom)
    with caplog.at_level(logging.WARNING, logger="bigdata_meteo_datalake_spark.sources.lake"):
        assert lake.table_row_count(spark, str(tmp_path), "region") == 7
    assert any("falling back to a Spark count" in r.message
               for r in caplog.records)


# --- sweep starvation guard (round-13 advice item 1) ------------------------------------


def test_sweep_window_constant_matches_driver():
    from bigdata_meteo_datalake_spark import queries as Q

    assert Q.SWEEP_WINDOW == 50
    assert Q.PRIORITY_RESWEEP_ROUNDS == 3


# --- vectorized ORC string interiors (verdict item 7) ------------------------------------


@_H
@given(
    strs=st.lists(
        st.text(
            alphabet=st.characters(codec="utf-8"),
            max_size=12,
        ),
        min_size=0,
        max_size=200,
    ),
)
def test_utf8_slices_roundtrip(strs):
    """The length-slicer reconstructs arbitrary unicode exactly,
    including empty strings and multibyte codepoints. (A pyarrow
    from_buffers vectorization of this loop was built and MEASURED 4x
    slower — see the _utf8_slices docstring; the per-string loop is
    the production form.)"""
    from bigdata_meteo_datalake_spark.operators.orc_data import (
        _utf8_slices,
    )

    data = b"".join(s.encode("utf-8") for s in strs)
    lens = [len(s.encode("utf-8")) for s in strs]
    assert _utf8_slices(data, lens) == strs


@_H
@given(blob=st.binary(min_size=1, max_size=64), seed=st.integers(0, 10**6))
def test_utf8_slices_garbage_never_crashes(blob, seed):
    """On arbitrary byte splits the slicer either decodes or raises
    ValueError — never an unhandled UnicodeDecodeError or crash."""
    import random

    from bigdata_meteo_datalake_spark.operators.orc_data import (
        _utf8_slices,
    )

    rng = random.Random(seed)
    data = blob * 70
    lens = []
    remaining = len(data)
    while remaining > 0 and len(lens) < 280:
        ln = rng.randrange(0, min(remaining, len(blob)) + 1)
        lens.append(ln)
        remaining -= ln
    try:
        got = _utf8_slices(data, lens)
        assert len(got) == len(lens)
    except ValueError:
        pass


def test_orc_string_decode_pure_vs_fast_twin(spark, tmp_path):
    """End-to-end: a Spark-written ORC string column with NULLs, both
    a DIRECT_V2 (high-cardinality) and DICTIONARY_V2 (low-cardinality)
    shape — the vectorized decode equals the pure reference equals
    pyarrow, including the null interleave scatter."""
    import glob

    import pyarrow.orc as po

    from bigdata_meteo_datalake_spark.operators.orc_data import (
        decode_orc_column,
    )

    n = 5000
    rows = [
        (
            f"name-{i:05d}-{i * 7919 % 997}" if i % 11 else None,  # direct
            ["alpha", "beta", "gamma", "delta"][i % 4] if i % 7 else None,
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "hi string, lo string")
    out = str(tmp_path / "strs.orc")
    df.coalesce(1).write.mode("overwrite").option(
        "compression", "zlib"
    ).orc(out)
    [path] = glob.glob(out + "/*.orc")
    b = open(path, "rb").read()
    for col in ("hi", "lo"):
        ref = po.ORCFile(path).read(columns=[col])[col].to_pylist()
        fast = decode_orc_column(b, col)["values"]
        pure = decode_orc_column(b, col, pure=True)["values"]
        assert fast == ref
        assert pure == ref


# --- string-decoder mutation agreement gate (verdict item 8 re-fuzz) ---------------------

_ORC_STRING_FILE: dict = {"bytes": b""}


def test_orc_string_capture_for_mutations(spark, tmp_path):
    """Capture a Spark-written ORC file with BOTH string encodings and
    nulls — the corpus for the mutation agreement gate below."""
    import glob

    from bigdata_meteo_datalake_spark.operators.orc_data import (
        decode_orc_column,
    )

    n = 3000
    rows = [
        (
            f"k-{i:04d}-{(i * 37) % 101}" if i % 9 else None,
            ("aa", "bb", "cc")[i % 3] if i % 5 else None,
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "hi string, lo string")
    out = str(tmp_path / "mstrs.orc")
    df.coalesce(1).write.mode("overwrite").option(
        "compression", "snappy"
    ).orc(out)
    [path] = glob.glob(out + "/*.orc")
    _ORC_STRING_FILE["bytes"] = open(path, "rb").read()
    assert len(decode_orc_column(_ORC_STRING_FILE["bytes"],
                                 "hi")["values"]) == n


@settings(max_examples=200, deadline=None)
@given(st.data())
def test_orc_string_pure_fast_agree_on_mutations(data):
    """Bit-flip / delete / insert mutations of the string ORC file:
    the vectorized decode and the pure reference agree on every
    mutant — same values or an error from both, for both encodings.
    (The round-13 protocol: new fast-path surface gets its own
    mutation campaign.)"""
    from bigdata_meteo_datalake_spark.operators.orc_data import (
        decode_orc_column,
    )

    blob = bytearray(_ORC_STRING_FILE["bytes"])
    if not blob:
        pytest.skip("capture test did not run first")
    for _ in range(data.draw(st.integers(min_value=1, max_value=4))):
        op = data.draw(st.sampled_from(["flip", "del", "ins"]))
        pos = data.draw(st.integers(min_value=0, max_value=len(blob) - 1))
        if op == "flip":
            blob[pos] ^= data.draw(st.integers(min_value=1, max_value=255))
        elif op == "del":
            del blob[pos]
        else:
            blob.insert(pos, data.draw(st.integers(min_value=0, max_value=255)))
    b = bytes(blob)
    for col in ("hi", "lo"):
        try:
            fast = ("ok", decode_orc_column(b, col)["values"])
        except (ValueError, NotImplementedError):
            fast = ("err",)
        try:
            pure = ("ok", decode_orc_column(b, col, pure=True)["values"])
        except (ValueError, NotImplementedError):
            pure = ("err",)
        assert fast == pure


# --- bit-width-0 dictionary pages: decode + mutation robustness -------------------------

_ALLNULL_PQ: dict = {"bytes": b""}


def test_bitwidth0_dictionary_pages_decode(tmp_path):
    """pyarrow writes 0-bit dictionary-index pages for all-null
    columns (and the spec allows them for <=1-entry dictionaries);
    they decode instead of raising, and a constant column (1-entry
    dictionary, 1-bit indices) round-trips too."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bigdata_meteo_datalake_spark.operators.parquet_pages import (
        decode_parquet_column,
    )

    p = str(tmp_path / "allnull.parquet")
    pq.write_table(
        pa.table({"x": pa.array([None] * 500, type=pa.int64())}),
        p, data_page_size=128,
    )
    b = open(p, "rb").read()
    r = decode_parquet_column(b, "x")
    assert r["values"] == [None] * 500
    _ALLNULL_PQ["bytes"] = b

    p2 = str(tmp_path / "const.parquet")
    pq.write_table(
        pa.table({"x": pa.array([7] * 500, type=pa.int64())}),
        p2, data_page_size=128,
    )
    r2 = decode_parquet_column(open(p2, "rb").read(), "x")
    assert r2["values"] == [7] * 500


@settings(max_examples=200, deadline=None)
@given(st.data())
def test_bitwidth0_decoder_never_leaks_on_mutations(data):
    """Bit-flip/delete/insert mutations of the all-null (0-bit
    dictionary page) file: the decoder either returns values or raises
    ValueError/NotImplementedError — never crashes, never loops."""
    from bigdata_meteo_datalake_spark.operators.parquet_pages import (
        decode_parquet_column,
    )

    blob = bytearray(_ALLNULL_PQ["bytes"])
    if not blob:
        pytest.skip("capture test did not run first")
    for _ in range(data.draw(st.integers(min_value=1, max_value=4))):
        op = data.draw(st.sampled_from(["flip", "del", "ins"]))
        pos = data.draw(st.integers(min_value=0, max_value=len(blob) - 1))
        if op == "flip":
            blob[pos] ^= data.draw(st.integers(min_value=1, max_value=255))
        elif op == "del":
            del blob[pos]
        else:
            blob.insert(pos, data.draw(st.integers(min_value=0, max_value=255)))
    try:
        r = decode_parquet_column(bytes(blob), "x")
        assert isinstance(r["values"], list)
    except (ValueError, NotImplementedError):
        pass


# --- empty-residue shards write driver-side (no Spark job) -------------------------------


def test_sampled_manifest_empty_residues_driver_side(spark, tmp_path):
    """A pk expression that never hits some residues (pk = 3*key mod 3
    covers only residue 0) forces the empty-shard path: the manifest
    must still cover every CHOSEN shard with a readable empty file —
    written driver-side by pyarrow (a Spark write job for an empty
    DataFrame measured 0.7-6.8 s apiece, round-14) — and the audit
    kernel must report zero rows with NULL bounds for it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bigdata_meteo_datalake_spark.operators.parquet_pageindex import (
        pageindex_column_stats,
    )
    from bigdata_meteo_datalake_spark.queries.ext_formats import (
        _PAGE_ROW_LIMIT,
        _SAMPLED_MANIFEST_SCHEMA,
        _sampled_shard_manifest,
    )

    n_rows = 8192  # -> 3 shards at AUDIT_SHARD_ROWS=4000
    pq.write_table(
        pa.table({"o_orderkey": pa.array(range(n_rows), type=pa.int64()),
                  "o_totalprice": pa.array([float(i) for i in range(n_rows)])}),
        str(tmp_path / "orders.parquet"),
    )
    base = str(tmp_path / "out")

    def write_shards(df, tbl):
        out = f"{base}/{tbl}"
        (df.write.mode("overwrite")
         .option("parquet.page.row.count.limit", str(_PAGE_ROW_LIMIT))
         .partitionBy("__shard").parquet(out))
        return out

    cols = [("orders", "o_totalprice", "double", "o_orderkey * 3")]
    rows = _sampled_shard_manifest(spark, str(tmp_path), write_shards,
                                   columns=cols)
    assert len(rows) == 3  # every chosen shard covered
    by_shard = {r[5]: r for r in rows}
    assert set(by_shard) == {0, 1, 2} and all(r[6] == 3 for r in rows)
    # residues 1 and 2 are structurally empty -> driver-written files
    for s in (1, 2):
        assert by_shard[s][3].endswith("part-empty.parquet")
        assert pq.read_metadata(by_shard[s][3]).num_rows == 0
    df = spark.createDataFrame(rows, _SAMPLED_MANIFEST_SCHEMA)
    got = {r.shard: r for r in pageindex_column_stats(
        df, row_limit=_PAGE_ROW_LIMIT,
        id_cols=("shard int", "n_shards int")).collect()}
    assert got[0].num_rows == n_rows
    for s in (1, 2):
        assert got[s].num_rows == 0 and got[s].n_pages == 0
        assert got[s].min_micro is None and got[s].max_micro is None


# --- translate-based punctuation count == the regex it replaced --------------------------


def test_translate_punct_count_equals_regex(spark):
    """The translate() punctuation count (round-14 perf fix: the
    negated-class regex it replaced measured ~70x slower) is
    bit-identical to the regex count on ADVERSARIAL unicode — the
    driver testdata is ASCII-ish, so divergence on multibyte
    codepoints, emoji, or exotic whitespace would hide from the
    oracle gate."""
    from pyspark.sql import functions as F

    cases = [
        "plain ascii text, with punct!",
        "",
        "    ",
        "tabs\tand\nnewlines\r\fkept",
        "unicode: naïve café — em-dash… ß ☃ 🎉",
        "digits123 MIXED case XYZ",
        "all-punct: !@#$%^&*()_+{}|:\"<>?",
        "nbsp and em-space are punct (not in the class)",
        "combining: é (accent) and ZWJ: a‍b",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "text string")
    keep = ("abcdefghijklmnopqrstuvwxyz"
            "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 \t\n\r\f")
    got = df.select(
        F.length(F.translate(F.col("text"), keep, "")).alias("t"),
        F.size(F.regexp_extract_all(
            F.col("text"), F.lit(r"[^a-zA-Z0-9 \t\n\r\f]"), F.lit(0)
        )).alias("r"),
    ).collect()
    for case, row in zip(cases, got):
        assert row.t == row.r, (case, row.t, row.r)
