"""Round-12 property tests: the corpus-size-derived LSH plane count
(python/SQL twin equality + the recall-non-collapse property the
round-11 verdict asked for), and — added alongside the round-12
parsers — their generated-input roundtrips and fuzz gates."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

_S = settings(deadline=None, max_examples=60)


# --- LSH plane-count derivation: python form == SQL form -----------------------------


@_S
@given(st.integers(min_value=0, max_value=10**13))
def test_lsh_n_planes_sql_twin_matches_python(n):
    from bigdata_meteo_datalake_spark.operators.dedup import (
        lsh_n_planes,
        lsh_n_planes_sql,
    )

    got = duckdb.sql(f"SELECT {lsh_n_planes_sql(str(n))}").fetchone()[0]
    assert got == lsh_n_planes(n)


def test_lsh_n_planes_monotone_and_capped():
    from bigdata_meteo_datalake_spark.operators.dedup import (
        LSH_MAX_BUCKET,
        LSH_MAX_PLANES,
        LSH_MIN_PLANES,
        LSH_TARGET_BUCKET_LOAD,
        lsh_n_planes,
    )

    prev = 0
    for n in [0, 1, 100, 500, 2000, 10**4, 10**6, 10**9, 10**12]:
        p = lsh_n_planes(n)
        assert LSH_MIN_PLANES <= p <= LSH_MAX_PLANES
        assert p >= prev
        prev = p
        # below the cap, the bucket space covers the corpus at the
        # target load: 2^planes * target_load >= n
        if p < LSH_MAX_PLANES:
            assert (1 << p) * LSH_TARGET_BUCKET_LOAD >= n
    # the guard threshold stays above the target load by design
    assert LSH_TARGET_BUCKET_LOAD * 4 == LSH_MAX_BUCKET


# --- recall does not collapse when N >> 64 * 2^min_planes ----------------------------


def test_lsh_bucket_space_scales_with_corpus(spark):
    """The round-11 defect: with a FIXED plane count, a corpus of
    N >> LSH_MAX_BUCKET * 2^planes vectors trips the hot-bucket guard
    on nearly every bucket — the query stays fast but recall silently
    collapses. With the derived plane count the guard must stay the
    exception: >= 80% of a 4096-vector corpus survives, where the
    fixed minimum plane count keeps < 20%."""
    import numpy as np
    from pyspark.sql import functions as F

    from bigdata_meteo_datalake_spark.operators.dedup import (
        LSH_MAX_BUCKET,
        LSH_MIN_PLANES,
        lsh_n_planes,
    )
    from bigdata_meteo_datalake_spark.queries.ext_similarity import _bucket_col

    n = 4096
    assert n > LSH_MAX_BUCKET * (1 << LSH_MIN_PLANES)  # the collapse regime
    rng = np.random.default_rng(12)
    vecs = rng.standard_normal((n, 64))
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, v array<double>",
    )

    def coverage(n_planes: int) -> float:
        loads = (
            df.select(_bucket_col(n_planes).alias("bucket"))
            .groupBy("bucket")
            .count()
            .collect()
        )
        kept = sum(r["count"] for r in loads if r["count"] <= LSH_MAX_BUCKET)
        return kept / n

    derived = coverage(lsh_n_planes(n))
    fixed_min = coverage(LSH_MIN_PLANES)
    assert derived >= 0.8, f"derived-plane coverage collapsed: {derived}"
    assert fixed_min <= 0.2, (
        f"collapse regime not demonstrated: fixed-plane coverage {fixed_min}"
    )


def test_lsh_planes_vary_across_testdata_sfs():
    """The driver's SFs exercise different plane counts, so the
    derivation (not a constant) is what the oracle sweeps lock down."""
    from bigdata_meteo_datalake_spark.operators.dedup import lsh_n_planes

    n_small = duckdb.sql(
        "SELECT count(*) FROM '/root/testdata/sf0.001/embeddings.parquet'"
    ).fetchone()[0]
    n_big = duckdb.sql(
        "SELECT count(*) FROM '/root/testdata/sf0.1/embeddings.parquet'"
    ).fetchone()[0]
    assert lsh_n_planes(n_big) > lsh_n_planes(n_small)


# --- Avro OCF: generated-record roundtrips -------------------------------------------


_CODECS = ["null", "deflate", "snappy"]


@_S
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
            st.floats(allow_nan=False, allow_infinity=False),
            st.text(max_size=20),
            st.lists(st.text(max_size=5), max_size=4),
            st.none() | st.integers(min_value=-(1 << 62), max_value=1 << 62),
            st.dictionaries(st.text(max_size=4),
                            st.integers(min_value=-100, max_value=100),
                            max_size=3),
            st.sampled_from(["alpha", "beta", "gamma"]),
        ),
        min_size=1, max_size=8,
    ),
    st.sampled_from(_CODECS),
    st.integers(min_value=1, max_value=4),
)
def test_avro_ocf_roundtrip_generated(rows, codec, rpb):
    """Any record values (64-bit-extreme longs, arbitrary unicode,
    empty/None branches, any block grouping, any codec) roundtrip
    through build_avro_ocf/read_avro_ocf exactly."""
    from bigdata_meteo_datalake_spark.operators.avro_ocf import (
        AVRO_FIXTURE_SCHEMA,
        build_avro_ocf,
        read_avro_ocf,
    )

    records = [
        {"id": i, "score": s, "name": n, "tags": t, "opt": o,
         "meta": m, "kind": k}
        for (i, s, n, t, o, m, k) in rows
    ]
    blob = build_avro_ocf(AVRO_FIXTURE_SCHEMA, records, codec=codec,
                          records_per_block=rpb)
    r = read_avro_ocf(blob)
    got = [x for blk in r["blocks"] for x in blk["records"]]
    assert got == records
    assert r["n_records"] == len(records)
    assert r["n_blocks"] == (len(records) + rpb - 1) // rpb
    assert r["codec"] == codec


@_S
@given(st.binary(max_size=2000))
def test_snappy_roundtrip_generated(data):
    from bigdata_meteo_datalake_spark.operators.avro_ocf import (
        snappy_compress,
        snappy_uncompress,
    )

    assert snappy_uncompress(snappy_compress(data)) == data


def test_snappy_hand_vectors():
    """Every tag family decoded against hand-computed streams from the
    published format description: short/long literals, 1- and 4-byte
    offset copies, and the forward-overlapping RLE run."""
    from bigdata_meteo_datalake_spark.operators.avro_ocf import (
        snappy_uncompress,
    )

    # literal 'abcd' then copy-1 (off=4, len=8): tag ((8-4)<<2)|1
    assert snappy_uncompress(
        b"\x0c" + b"\x0c" + b"abcd" + bytes([((8 - 4) << 2) | 1, 4])
    ) == b"abcdabcdabcd"
    # same via copy-4: tag ((8-1)<<2)|3, 4-byte LE offset
    assert snappy_uncompress(
        b"\x0c" + b"\x0c" + b"abcd"
        + bytes([((8 - 1) << 2) | 3]) + (4).to_bytes(4, "little")
    ) == b"abcdabcdabcd"
    # overlapping RLE: literal 'a', copy off=1 len=7 (copy-2 form)
    assert snappy_uncompress(
        b"\x08" + b"\x00a"
        + bytes([((7 - 1) << 2) | 2]) + (1).to_bytes(2, "little")
    ) == b"a" * 8
    # 61-byte literal takes the 1-length-byte form: tag 60<<2, len-1=60
    assert snappy_uncompress(
        bytes([61]) + bytes([60 << 2, 60]) + b"x" * 61
    ) == b"x" * 61


def test_snappy_rejections():
    import pytest as _pytest

    from bigdata_meteo_datalake_spark.operators.avro_ocf import (
        snappy_uncompress,
    )

    with _pytest.raises(ValueError, match="offset"):
        snappy_uncompress(b"\x04" + b"\x00a" + bytes([1, 0]))  # off=0
    with _pytest.raises(ValueError, match="offset"):
        snappy_uncompress(b"\x04" + b"\x00a" + bytes([1, 9]))  # off>out
    with _pytest.raises(ValueError, match="preamble"):
        snappy_uncompress(b"\x09" + b"\x00a")  # preamble lies
    with _pytest.raises(ValueError, match="truncated"):
        snappy_uncompress(b"\x10" + b"\x3c")  # literal body missing


def test_avro_ocf_rejections():
    """Every framing violation raises the contracted type."""
    import hashlib

    import pytest as _pytest

    from bigdata_meteo_datalake_spark.operators.avro_ocf import (
        AVRO_FIXTURE_SCHEMA,
        _fixture_records,
        build_avro_ocf,
        read_avro_ocf,
    )

    recs = _fixture_records(5)
    blob = build_avro_ocf(AVRO_FIXTURE_SCHEMA, recs, codec="null",
                          sync=hashlib.md5(b"s").digest())
    read_avro_ocf(blob)  # the fixture is valid

    with _pytest.raises(ValueError, match="magic"):
        read_avro_ocf(b"Obj\x02" + blob[4:])
    # drift the FINAL sync marker
    bad = bytearray(blob)
    bad[-1] ^= 0xFF
    with _pytest.raises(ValueError, match="sync"):
        read_avro_ocf(bytes(bad))
    with _pytest.raises(ValueError):
        read_avro_ocf(blob + b"x")  # trailing garbage
    with _pytest.raises(ValueError, match="avro.schema"):
        read_avro_ocf(build_avro_ocf("long", [1, 2], codec="null")
                      .replace(b"avro.schema", b"avro.sch3ma"))
    # declared-boundary codecs raise NotImplementedError, unknown raise ValueError
    zst = build_avro_ocf("long", [1], codec="null").replace(
        b"\x08null", b"\x12zstandard", 1)
    # (replace targets the codec value: length byte 4 -> 9 + name)
    with _pytest.raises(NotImplementedError):
        read_avro_ocf(zst)
    junk = build_avro_ocf("long", [1], codec="null").replace(
        b"\x08null", b"\x08nulz", 1)
    with _pytest.raises(ValueError, match="unknown avro codec"):
        read_avro_ocf(junk)
    # deep schema stays inside the ValueError contract
    deep = {"type": "array", "items": "long"}
    for _ in range(100):
        deep = {"type": "array", "items": deep}
    with _pytest.raises(ValueError, match="nests deeper"):
        read_avro_ocf(build_avro_ocf(deep, []))


def _avro_fuzz_blobs() -> dict[str, bytes]:
    from bigdata_meteo_datalake_spark.operators.avro_ocf import (
        AVRO_FIXTURE_SCHEMA,
        _fixture_records,
        build_avro_ocf,
    )

    return {
        c: build_avro_ocf(AVRO_FIXTURE_SCHEMA, _fixture_records(7), codec=c)
        for c in _CODECS
    }


@_S
@given(st.binary(min_size=0, max_size=400))
def test_avro_reader_never_leaks_on_garbage(blob):
    from bigdata_meteo_datalake_spark.operators.avro_ocf import (
        read_avro_ocf,
        snappy_uncompress,
    )

    for parse in (read_avro_ocf, snappy_uncompress):
        try:
            parse(blob)
        except (ValueError, NotImplementedError):
            pass


@_S
@given(st.data())
def test_avro_reader_never_leaks_on_mutations(data):
    """Byte-flip/insert/delete mutations of valid OCFs (all three
    codecs) hold the ValueError/NotImplementedError contract — the
    round-11 lesson says stdlib-wrapping surfaces (zlib here) leak
    hardest, so deflate blocks get fuzzed on equal footing."""
    from bigdata_meteo_datalake_spark.operators.avro_ocf import (
        read_avro_ocf,
    )

    blobs = _avro_fuzz_blobs()
    blob = bytearray(blobs[data.draw(st.sampled_from(_CODECS))])
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
        r = read_avro_ocf(bytes(blob))
    except (ValueError, NotImplementedError):
        return
    assert r["n_records"] >= 1


# --- Delta _delta_log snapshot reconstruction ----------------------------------------


def test_delta_snapshot_rejections():
    import json

    import pytest as _pytest

    from bigdata_meteo_datalake_spark.operators.delta_log import (
        build_delta_log,
        parse_delta_snapshot,
    )

    files = build_delta_log(11)  # 4 versions, checkpointed at 1
    parse_delta_snapshot(files)  # the fixture is valid

    # version gap: drop a middle commit
    gap = dict(files)
    del gap[f"{2:020d}.json"]
    with _pytest.raises(ValueError, match="jump"):
        parse_delta_snapshot(gap)

    # _last_checkpoint pointing at a missing checkpoint
    dangling = dict(files)
    del dangling[f"{1:020d}.checkpoint.parquet"]
    with _pytest.raises(ValueError, match="missing version"):
        parse_delta_snapshot(dangling)

    # checkpoint size lie
    lied = dict(files)
    lied["_last_checkpoint"] = json.dumps({"version": 1, "size": 9}).encode()
    with _pytest.raises(ValueError, match="size"):
        parse_delta_snapshot(lied)

    # no-checkpoint log must start at version 0
    tail_only = {k: v for k, v in files.items()
                 if k.endswith(".json")}
    with _pytest.raises(ValueError, match="starts after version 0"):
        parse_delta_snapshot(tail_only)

    # checkpoint parquet present without the pointer
    unpointed = dict(files)
    del unpointed["_last_checkpoint"]
    with _pytest.raises(ValueError, match="without _last_checkpoint"):
        parse_delta_snapshot(unpointed)

    # an action object carrying two action keys
    v0 = build_delta_log(0)
    twin = dict(v0)
    twin[f"{0:020d}.json"] = json.dumps(
        {"add": {"path": "x", "size": 1, "dataChange": True},
         "remove": {"path": "y"}}).encode()
    with _pytest.raises(ValueError, match="exactly one"):
        parse_delta_snapshot(twin)

    # unknown action / unknown member name
    unk = dict(v0)
    unk[f"{0:020d}.json"] = b'{"compactInfo": {}}'
    with _pytest.raises(ValueError, match="exactly one"):
        parse_delta_snapshot(unk)
    stray = dict(v0)
    stray["README.txt"] = b"hi"
    with _pytest.raises(ValueError, match="unrecognized"):
        parse_delta_snapshot(stray)

    # future reader protocol is a declared boundary
    fut = dict(v0)
    lines = v0[f"{0:020d}.json"].decode().split("\n")
    lines[0] = json.dumps({"protocol": {"minReaderVersion": 4,
                                        "minWriterVersion": 7}})
    fut[f"{0:020d}.json"] = "\n".join(lines).encode()
    with _pytest.raises(NotImplementedError, match="protocol version 4"):
        parse_delta_snapshot(fut)

    # a snapshot must end with metaData + protocol seen
    headless = {f"{0:020d}.json": json.dumps(
        {"add": {"path": "x", "size": 1, "dataChange": True,
                 "partitionValues": {}}}).encode()}
    with _pytest.raises(ValueError, match="metaData|protocol"):
        parse_delta_snapshot(headless)


def test_delta_last_writer_wins_and_readd():
    """Per-path replay semantics: a re-added path leaves the tombstone
    set and returns to the live set with its NEW size."""
    import json

    from bigdata_meteo_datalake_spark.operators.delta_log import (
        build_delta_log,
        parse_delta_snapshot,
    )

    files = build_delta_log(0)  # single version, live = {f0}
    files[f"{1:020d}.json"] = json.dumps(
        {"remove": {"path": "f0.parquet", "dataChange": True}}).encode()
    snap = parse_delta_snapshot(files)
    assert snap["n_live_files"] == 0 and snap["n_tombstones"] == 1
    files[f"{2:020d}.json"] = json.dumps(
        {"add": {"path": "f0.parquet", "size": 777, "dataChange": True,
                 "partitionValues": {"ds": "2024-01-09"}}}).encode()
    snap = parse_delta_snapshot(files)
    assert snap["version"] == 2
    assert snap["live_paths"] == ["f0.parquet"]
    assert snap["live_bytes"] == 777
    assert snap["n_tombstones"] == 0


@_S
@given(st.data())
def test_delta_parser_never_leaks_on_mutations(data):
    """Byte mutations of any log member (JSON commits, the checkpoint
    parquet — a pyarrow surface, so its failure zoo must be wrapped —
    and the _last_checkpoint pointer) hold the contract."""
    from bigdata_meteo_datalake_spark.operators.delta_log import (
        build_delta_log,
        parse_delta_snapshot,
    )

    files = dict(build_delta_log(data.draw(st.integers(0, 23))))
    name = data.draw(st.sampled_from(sorted(files)))
    blob = bytearray(files[name])
    for _ in range(data.draw(st.integers(min_value=1, max_value=4))):
        op = data.draw(st.sampled_from(["flip", "del", "ins"]))
        pos = data.draw(st.integers(min_value=0, max_value=max(len(blob) - 1, 0)))
        if op == "flip" and blob:
            blob[pos] ^= data.draw(st.integers(min_value=1, max_value=255))
        elif op == "del" and blob:
            del blob[pos]
        else:
            blob.insert(pos, data.draw(st.integers(min_value=0, max_value=255)))
    files[name] = bytes(blob)
    try:
        snap = parse_delta_snapshot(files)
    except (ValueError, NotImplementedError):
        return
    assert snap["version"] >= 0


# --- ORC postscript/footer reader ------------------------------------------------------


def _pb_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        byte = v & 0x7F
        v >>= 7
        if v:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return bytes(out)


def _pbf(fid: int, v: int) -> bytes:  # varint field
    return _pb_varint((fid << 3) | 0) + _pb_varint(v)


def _pbm(fid: int, payload: bytes) -> bytes:  # length-delimited field
    return _pb_varint((fid << 3) | 2) + _pb_varint(len(payload)) + payload


def _zz(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _hand_orc(*, num_rows=3, stripe_rows=3, root_kind=12, subtype=1,
              n_stats=2, n_values=3, has_null=0) -> bytes:
    """Minimal hand-encoded ORC: one long column 'a', uncompressed."""
    types = (_pbm(4, _pbf(1, root_kind) + _pbm(2, _pb_varint(subtype))
                  + _pbm(3, b"a"))
             + _pbm(4, _pbf(1, 4)))  # long
    stripes = _pbm(3, _pbf(1, 3) + _pbf(5, stripe_rows))
    stats = b""
    if n_stats >= 1:
        stats += _pbm(7, _pbf(1, num_rows) + _pbf(10, 0))
    if n_stats >= 2:
        stats += _pbm(7, _pbf(1, n_values) + _pbf(10, has_null)
                      + _pbm(2, _pbf(1, _zz(-5)) + _pbf(2, _zz(40))))
    footer = stripes + types + _pbf(6, num_rows) + stats
    ps = _pbf(1, len(footer)) + _pbf(2, 0) + _pbm(8000, b"ORC")
    return b"ORC" + footer + ps + bytes([len(ps)])


def test_orc_hand_encoded_roundtrip():
    from bigdata_meteo_datalake_spark.operators.orc_footer import (
        read_orc_footer,
    )

    fo = read_orc_footer(_hand_orc())
    assert fo["num_rows"] == 3 and fo["codec"] == "NONE"
    assert fo["columns"]["a"] == {
        "type": "long", "n_values": 3, "null_count": 0,
        "min": -5, "max": 40, "has_null": False,
    }


def test_orc_footer_rejections():
    import pytest as _pytest

    from bigdata_meteo_datalake_spark.operators.orc_footer import (
        read_orc_footer,
    )

    with _pytest.raises(ValueError, match="stripes sum"):
        read_orc_footer(_hand_orc(num_rows=4, n_values=4))
    with _pytest.raises(ValueError, match="statistics for"):
        read_orc_footer(_hand_orc(n_stats=1))
    with _pytest.raises(ValueError, match="not a struct"):
        read_orc_footer(_hand_orc(root_kind=4))
    with _pytest.raises(ValueError, match="points at type id"):
        read_orc_footer(_hand_orc(subtype=5))
    with _pytest.raises(ValueError, match="claims"):
        read_orc_footer(_hand_orc(n_values=9))
    with _pytest.raises(ValueError, match="non-boolean"):
        read_orc_footer(_hand_orc(has_null=7))
    # postscript magic
    blob = bytearray(_hand_orc())
    blob[-3] ^= 0x01  # inside the trailing "ORC" magic
    with _pytest.raises(ValueError, match="magic"):
        read_orc_footer(bytes(blob))


def test_orc_declared_codecs_raise():
    import pytest as _pytest

    from bigdata_meteo_datalake_spark.operators.orc_footer import (
        read_orc_footer,
    )

    for kind, name in ((3, "LZO"), (4, "LZ4"), (5, "ZSTD")):
        footer = b"\x00"
        ps = _pbf(1, len(footer)) + _pbf(2, kind) + _pbm(8000, b"ORC")
        blob = b"ORC" + footer + ps + bytes([len(ps)])
        with _pytest.raises(NotImplementedError, match=name):
            read_orc_footer(blob)


def _orc_fuzz_blobs() -> dict[str, bytes]:
    import io

    import pyarrow as pa
    from pyarrow import orc as pa_orc

    t = pa.table({
        "a": pa.array([1, -7, 3, None], pa.int64()),
        "b": pa.array([0.5, 2.25, None, -1.0], pa.float64()),
    })
    out = {}
    for comp in ("UNCOMPRESSED", "ZLIB", "SNAPPY"):
        buf = io.BytesIO()
        pa_orc.write_table(t, buf, compression=comp)
        out[comp] = buf.getvalue()
    return out


def test_orc_reader_agrees_with_pyarrow_writer():
    """Cross-writer interop: pyarrow's liborc files (all three codecs)
    parse and their footer facts match the data pyarrow wrote."""
    from bigdata_meteo_datalake_spark.operators.orc_footer import (
        read_orc_footer,
    )

    for comp, blob in _orc_fuzz_blobs().items():
        fo = read_orc_footer(blob)
        assert fo["codec"] == {"UNCOMPRESSED": "NONE"}.get(comp, comp)
        assert fo["num_rows"] == 4
        assert fo["columns"]["a"] == {
            "type": "long", "n_values": 3, "null_count": 1,
            "min": -7, "max": 3, "has_null": True,
        }
        b = fo["columns"]["b"]
        assert (b["min"], b["max"], b["null_count"]) == (-1.0, 2.25, 1)


@_S
@given(st.binary(min_size=0, max_size=400))
def test_orc_reader_never_leaks_on_garbage(blob):
    from bigdata_meteo_datalake_spark.operators.orc_footer import (
        read_orc_footer,
    )

    try:
        read_orc_footer(blob)
    except (ValueError, NotImplementedError):
        pass


@_S
@given(st.data())
def test_orc_reader_never_leaks_on_mutations(data):
    from bigdata_meteo_datalake_spark.operators.orc_footer import (
        read_orc_footer,
    )

    blobs = _orc_fuzz_blobs()
    blobs["hand"] = _hand_orc()
    blob = bytearray(blobs[data.draw(st.sampled_from(sorted(blobs)))])
    for _ in range(data.draw(st.integers(min_value=1, max_value=4))):
        op = data.draw(st.sampled_from(["flip", "del", "ins"]))
        pos = data.draw(st.integers(min_value=0, max_value=max(len(blob) - 1, 0)))
        if op == "flip" and blob:
            blob[pos] ^= data.draw(st.integers(min_value=1, max_value=255))
        elif op == "del" and blob:
            del blob[pos]
        else:
            blob.insert(pos, data.draw(st.integers(min_value=0, max_value=255)))
    try:
        fo = read_orc_footer(bytes(blob))
    except (ValueError, NotImplementedError):
        return
    assert fo["num_rows"] >= 0


# --- LZ4 / Zstandard frames (operators/lz4zstd.py) ------------------------------------


def test_xxhash_spec_vectors():
    """Pinned to the xxHash spec's published check values (empty input
    at seed 0 and at the spec's prime seed) plus the classic doc
    vectors — xxh32 carries every LZ4 checksum and xxh64-low32 every
    zstd content checksum, so a single wrong lane breaks both walkers."""
    from bigdata_meteo_datalake_spark.operators.lz4zstd import xxh32, xxh64

    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"", 0x9E3779B1) == 0x36B78AE7
    assert xxh32(b"a") == 0x550D7456
    assert xxh32(b"abc") == 0x32D153FF
    assert xxh32(b"Nobody inspects the spammish repetition") == 0xE2293B2F
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"", 0x9E3779B1) == 0xAC75FDA2929B17EF
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc") == 0x44BC2CF5AD770999
    assert xxh64(b"Nobody inspects the spammish repetition") == 0xFBCEA83C8A378BF1


def test_xxh64_matches_spark_xxhash64(spark):
    """Cross-verification against an INDEPENDENT implementation this
    container happens to ship: Spark's xxhash64 SQL function (seed 42,
    signed-long result) — the JVM's own XxHash64, not our code. One
    batched DataFrame pass computes the JVM side for 301 seeded-random
    byte strings spanning every length class of the algorithm
    (empty, <8, <32, stripe remainders)."""
    import random

    from pyspark.sql import functions as F

    from bigdata_meteo_datalake_spark.operators.lz4zstd import xxh64

    rng = random.Random(0xC0FFEE)
    samples = [b""] + [
        rng.randbytes(rng.randrange(0, 400)) for _ in range(300)
    ]
    df = spark.createDataFrame(
        [(i, bytearray(s)) for i, s in enumerate(samples)],
        "i int, b binary",
    )
    rows = df.select("i", F.xxhash64("b").alias("h")).collect()
    jvm = {r["i"]: r["h"] for r in rows}
    for i, s in enumerate(samples):
        assert xxh64(s, seed=42) == jvm[i] % (1 << 64), f"sample {i}"


@_S
@given(st.binary(min_size=0, max_size=1000))
def test_lz4_block_roundtrip_random(data):
    from bigdata_meteo_datalake_spark.operators.lz4zstd import (
        lz4_block_compress,
        lz4_block_decompress,
    )

    comp = lz4_block_compress(data)
    assert lz4_block_decompress(comp, max_out=len(data)) == data


@_S
@given(
    st.lists(
        st.tuples(st.binary(min_size=1, max_size=8),
                  st.integers(min_value=1, max_value=60)),
        min_size=0, max_size=12,
    )
)
def test_lz4_block_roundtrip_repetitive(runs):
    """Repetitive payloads exercise the match path (incl. overlapping
    copies, offset < match length) that random bytes rarely reach."""
    from bigdata_meteo_datalake_spark.operators.lz4zstd import (
        lz4_block_compress,
        lz4_block_decompress,
    )

    data = b"".join(tok * rep for tok, rep in runs)
    comp = lz4_block_compress(data)
    assert lz4_block_decompress(comp, max_out=len(data)) == data


@_S
@given(
    st.binary(min_size=0, max_size=600),
    st.sampled_from([16, 32, 64, 100]),
    st.booleans(),
    st.booleans(),
    st.booleans(),
)
def test_lz4_frame_roundtrip(data, bs, csize, bsum, csum):
    from bigdata_meteo_datalake_spark.operators.lz4zstd import (
        lz4_frame_compress,
        lz4_frame_decompress,
    )

    frame = lz4_frame_compress(
        data, block_size=bs, content_size=csize,
        block_checksums=bsum, content_checksum=csum,
    )
    stats: dict = {}
    assert lz4_frame_decompress(frame, stats) == data
    assert stats["n_frames"] == 1
    want_blocks = max(1, -(-len(data) // bs))
    assert stats["n_blocks"] == want_blocks
    assert stats["content_size_declared"] == (len(data) if csize else None)


def test_lz4_frame_concatenated_and_skippable():
    from bigdata_meteo_datalake_spark.operators.lz4zstd import (
        lz4_frame_compress,
        lz4_frame_decompress,
    )

    a = lz4_frame_compress(b"alpha" * 10)
    skip = b"\x5a\x2a\x4d\x18" + (7).to_bytes(4, "little") + b"x" * 7
    b = lz4_frame_compress(b"beta" * 9)
    stats: dict = {}
    assert lz4_frame_decompress(a + skip + b, stats) == \
        b"alpha" * 10 + b"beta" * 9
    assert stats["n_frames"] == 2


def test_lz4_frame_rejections():
    import struct

    from bigdata_meteo_datalake_spark.operators.lz4zstd import (
        lz4_frame_compress,
        lz4_frame_decompress,
        xxh32,
    )

    good = bytearray(lz4_frame_compress(b"payload" * 8))
    with pytest.raises(ValueError, match="legacy"):
        lz4_frame_decompress(b"\x02\x21\x4c\x18" + b"\x00" * 8)
    with pytest.raises(ValueError, match="magic"):
        lz4_frame_decompress(b"\x00\x00\x00\x00")
    bad = bytearray(good)
    bad[4] |= 0x02  # FLG reserved bit
    with pytest.raises(ValueError, match="reserved|checksum"):
        lz4_frame_decompress(bytes(bad))
    bad = bytearray(good)
    bad[6] ^= 0x01  # low byte of the declared content size -> HC mismatch
    with pytest.raises(ValueError, match="header checksum"):
        lz4_frame_decompress(bytes(bad))
    # content checksum mismatch: flip the last byte (trailing XXH32)
    bad = bytearray(good)
    bad[-1] ^= 0x01
    with pytest.raises(ValueError, match="checksum"):
        lz4_frame_decompress(bytes(bad))
    # truncation anywhere near the tail
    with pytest.raises(ValueError):
        lz4_frame_decompress(bytes(good[:-3]))
    # EndMark missing entirely
    frame = lz4_frame_compress(b"q" * 5, content_checksum=False)
    with pytest.raises(ValueError):
        lz4_frame_decompress(frame[:-4])
    # declared content size lies: build with content_size then splice
    # a frame body from different data of the same block count
    f1 = bytearray(lz4_frame_compress(b"x" * 40, block_checksums=False,
                                      content_checksum=False))
    (declared,) = struct.unpack_from("<Q", f1, 6)
    assert declared == 40
    struct.pack_into("<Q", f1, 6, 41)
    f1[14] = (xxh32(bytes(f1[4:14])) >> 8) & 0xFF  # re-seal HC
    with pytest.raises(ValueError, match="declares"):
        lz4_frame_decompress(bytes(f1))


def test_zstd_build_probe_roundtrip():
    from bigdata_meteo_datalake_spark.operators.lz4zstd import (
        build_zstd_frame,
        zstd_decompress,
        zstd_frame_probe,
    )

    data = b"0123456789" * 13
    frame = build_zstd_frame(data, block_size=32, rle_tail=b"qqqq",
                             dict_id=77)
    probe = zstd_frame_probe(frame)
    assert probe["n_frames"] == 1
    f = probe["frames"][0]
    assert f["dict_id"] == 77
    assert f["content_size"] == len(data) + 4
    assert f["n_raw"] == -(-len(data) // 32) and f["n_rle"] == 1
    assert probe["decoded"] == data + b"qqqq"
    assert zstd_decompress(frame) == data + b"qqqq"


def test_zstd_probe_rejections_and_boundary():
    from bigdata_meteo_datalake_spark.operators.lz4zstd import (
        ZSTD_FRAME_MAGIC,
        build_zstd_frame,
        zstd_decompress,
        zstd_frame_probe,
    )

    good = bytearray(build_zstd_frame(b"hello world" * 5))
    with pytest.raises(ValueError, match="magic"):
        zstd_frame_probe(b"\x00\x01\x02\x03\x04\x05\x06\x07")
    with pytest.raises(ValueError, match="no zstd frames"):
        zstd_frame_probe(b"")
    bad = bytearray(good)
    bad[4] |= 0x08  # frame-header reserved bit
    with pytest.raises(ValueError, match="reserved"):
        zstd_frame_probe(bytes(bad))
    bad = bytearray(good)
    bad[-1] ^= 0x01  # content checksum
    with pytest.raises(ValueError, match="checksum"):
        zstd_frame_probe(bytes(bad))
    with pytest.raises(ValueError):
        zstd_frame_probe(bytes(good[:-6]))
    # a compressed (entropy-coded) block probes but cannot decode:
    # magic + FHD(fcs code 0, not single-segment -> no FCS) + window +
    # one btype=2 last block of 4 junk bytes
    frame = (ZSTD_FRAME_MAGIC + bytes([0x00, 0x00])
             + ((4 << 3) | (2 << 1) | 1).to_bytes(3, "little")
             + b"\xde\xad\xbe\xef")
    probe = zstd_frame_probe(frame)
    assert probe["frames"][0]["n_compressed"] == 1
    assert probe["decoded"] is None
    with pytest.raises(NotImplementedError, match="boundary"):
        zstd_decompress(frame)
    # reserved block type raises
    frame = (ZSTD_FRAME_MAGIC + bytes([0x00, 0x00])
             + ((4 << 3) | (3 << 1) | 1).to_bytes(3, "little") + b"xxxx")
    with pytest.raises(ValueError, match="reserved block"):
        zstd_frame_probe(frame)


def _frame_fuzz_blobs() -> dict[str, bytes]:
    from bigdata_meteo_datalake_spark.operators.lz4zstd import (
        build_zstd_frame,
        lz4_frame_compress,
    )

    payload = b"the quick brown fox jumps over the lazy dog " * 4
    return {
        "lz4": lz4_frame_compress(payload, block_size=32),
        "zstd": build_zstd_frame(payload, block_size=32, rle_tail=b"zzz",
                                 dict_id=513),
    }


@_S
@given(st.binary(min_size=0, max_size=300))
def test_frame_walkers_never_leak_on_garbage(blob):
    from bigdata_meteo_datalake_spark.operators.lz4zstd import (
        lz4_frame_decompress,
        zstd_frame_probe,
    )

    for parse in (lz4_frame_decompress, zstd_frame_probe):
        try:
            parse(blob)
        except (ValueError, NotImplementedError):
            pass


@_S
@given(st.data())
def test_frame_walkers_never_leak_on_mutations(data):
    """Byte-flip/insert/delete mutations of valid LZ4 and zstd frames
    hold the ValueError/NotImplementedError contract — same campaign
    the round-11 parsers went through."""
    from bigdata_meteo_datalake_spark.operators.lz4zstd import (
        lz4_frame_decompress,
        zstd_frame_probe,
    )

    blobs = _frame_fuzz_blobs()
    kind = data.draw(st.sampled_from(["lz4", "zstd"]))
    blob = bytearray(blobs[kind])
    for _ in range(data.draw(st.integers(min_value=1, max_value=4))):
        op = data.draw(st.sampled_from(["flip", "del", "ins"]))
        pos = data.draw(st.integers(min_value=0, max_value=len(blob) - 1))
        if op == "flip":
            blob[pos] ^= data.draw(st.integers(min_value=1, max_value=255))
        elif op == "del":
            del blob[pos]
        else:
            blob.insert(pos, data.draw(st.integers(min_value=0, max_value=255)))
    parse = lz4_frame_decompress if kind == "lz4" else zstd_frame_probe
    try:
        parse(bytes(blob))
    except (ValueError, NotImplementedError):
        pass


# --- Iceberg table-metadata snapshots (operators/iceberg_meta.py) ---------------------


def test_iceberg_closed_forms_roundtrip():
    from bigdata_meteo_datalake_spark.operators.iceberg_meta import (
        build_iceberg_table,
        parse_iceberg_snapshot,
    )

    for did in range(0, 40):
        snap = parse_iceberg_snapshot(build_iceberg_table(did))
        nv = 1 + did % 3
        nm = 1 + (did + nv - 1) % 2
        live = [(mi, j) for mi in range(nm)
                for j in range(2 + (did + mi) % 3) if j % 3 != 2]
        assert snap["n_snapshots"] == nv and snap["n_manifests"] == nm
        assert snap["current_snapshot_id"] == 1000 + did * 10 + nv - 1
        assert snap["n_live_files"] == len(live)
        assert snap["live_rows"] == sum(10 + did % 7 + mi + j
                                        for mi, j in live)
        assert snap["live_bytes"] == sum(100 * (mi + 1) + did % 100 + j
                                         for mi, j in live)
        assert snap["n_partitions"] == len({(mi + j) % 3 for mi, j in live})
        assert snap["last_sequence_number"] == nv
        assert (snap["n_schema_fields"], snap["n_spec_fields"]) == (3, 1)


def test_iceberg_rejections():
    """Each spec invariant violated one at a time -> ValueError with a
    pointed message; the untouched fixture parses before and after."""
    import json

    from bigdata_meteo_datalake_spark.operators.avro_ocf import (
        build_avro_ocf,
    )
    from bigdata_meteo_datalake_spark.operators.iceberg_meta import (
        MANIFEST_FILE_SCHEMA,
        build_iceberg_table,
        parse_iceberg_snapshot,
    )

    base = build_iceberg_table(5)  # nv=3, current snap 1052, 2 manifests
    parse_iceberg_snapshot(dict(base))
    meta_name = "v3.metadata.json"
    meta = json.loads(base[meta_name])

    def with_meta(**patch):
        m = {**meta, **patch}
        f = dict(base)
        f[meta_name] = json.dumps(m).encode()
        return f

    f = dict(base)
    del f["version-hint.text"]
    with pytest.raises(ValueError, match="version-hint"):
        parse_iceberg_snapshot(f)
    f = dict(base)
    f["version-hint.text"] = b"9"
    with pytest.raises(ValueError, match="hinted metadata"):
        parse_iceberg_snapshot(f)
    f = dict(base)
    f[meta_name] = b"{not json"
    with pytest.raises(ValueError, match="invalid"):
        parse_iceberg_snapshot(f)
    with pytest.raises(ValueError, match="format-version"):
        parse_iceberg_snapshot(with_meta(**{"format-version": 3}))
    with pytest.raises(ValueError, match="current-snapshot-id"):
        parse_iceberg_snapshot(with_meta(**{"current-snapshot-id": 4}))
    f = dict(base)
    f["version-hint.text"] = b"3 "  # whitespace tolerated
    parse_iceberg_snapshot(f)
    with pytest.raises(ValueError, match="not an integer"):
        parse_iceberg_snapshot(with_meta(**{"current-schema-id": [0],
                                            "schemas": [{"schema-id": [0]}]}))
    with pytest.raises(ValueError, match="last-sequence-number"):
        parse_iceberg_snapshot(with_meta(**{"last-sequence-number": None}))
    # snapshot sequence above last-sequence-number
    snaps = json.loads(json.dumps(meta["snapshots"]))
    snaps[-1]["sequence-number"] = 99
    with pytest.raises(ValueError, match="sequence-number"):
        parse_iceberg_snapshot(with_meta(snapshots=snaps))
    # v2 snapshot without a summary operation
    snaps = json.loads(json.dumps(meta["snapshots"]))
    del snaps[0]["summary"]
    with pytest.raises(ValueError, match="summary"):
        parse_iceberg_snapshot(with_meta(snapshots=snaps))
    # manifest length lie: truncate a manifest the current snapshot uses
    ml = [n for n in base if n.startswith("m-1052-")][0]
    f = dict(base)
    f[ml] = base[ml][:-1]
    with pytest.raises(ValueError, match="declared"):
        parse_iceberg_snapshot(f)
    # manifest-list accounting lie: rewrite the list with a wrong
    # added_files_count (same length achieved by padding another field)
    snap_name = "snap-1052.avro"
    cur_len = len(base[snap_name])
    from bigdata_meteo_datalake_spark.operators.avro_ocf import (
        read_avro_ocf,
    )

    recs = [r for blk in read_avro_ocf(base[snap_name])["blocks"]
            for r in blk["records"]]
    recs[0]["added_files_count"] += 1
    recs[0]["existing_files_count"] -= 1
    f = dict(base)
    f[snap_name] = build_avro_ocf(
        MANIFEST_FILE_SCHEMA, recs, codec="snappy", records_per_block=2,
        meta_extra={"snapshot-id": b"1052", "sequence-number": b"3",
                    "format-version": b"2"},
    )
    assert cur_len  # the list itself is not length-checked, only manifests
    with pytest.raises(ValueError, match="counts .*disagree|disagree"):
        parse_iceberg_snapshot(f)
    # duplicate live path across manifests (doc 7's current snapshot has
    # two manifests): point manifest 1's path at manifest 0's file
    recs = [r for blk in read_avro_ocf(base[snap_name])["blocks"]
            for r in blk["records"]]
    if len(recs) >= 2:
        recs[1]["manifest_path"] = recs[0]["manifest_path"]
        recs[1]["manifest_length"] = recs[0]["manifest_length"]
        f = dict(base)
        f[snap_name] = build_avro_ocf(
            MANIFEST_FILE_SCHEMA, recs, codec="snappy",
            records_per_block=2,
            meta_extra={"snapshot-id": b"1052", "sequence-number": b"3",
                        "format-version": b"2"},
        )
        with pytest.raises(ValueError, match="live twice|disagree"):
            parse_iceberg_snapshot(f)
    # the base fixture still parses (no cross-test mutation)
    parse_iceberg_snapshot(dict(base))


def _iceberg_fuzz_blobs() -> dict[str, bytes]:
    from bigdata_meteo_datalake_spark.operators.delta_log import _pack_dir
    from bigdata_meteo_datalake_spark.operators.iceberg_meta import (
        build_iceberg_table,
    )

    # doc ids covering all three manifest codecs
    return {str(d): _pack_dir(build_iceberg_table(d)) for d in (0, 1, 2, 7)}


@_S
@given(st.binary(min_size=0, max_size=300))
def test_iceberg_parser_never_leaks_on_garbage(blob):
    from bigdata_meteo_datalake_spark.operators.delta_log import _unpack_dir
    from bigdata_meteo_datalake_spark.operators.iceberg_meta import (
        parse_iceberg_snapshot,
    )

    try:
        parse_iceberg_snapshot(_unpack_dir(blob))
    except (ValueError, NotImplementedError):
        pass


@_S
@given(st.data())
def test_iceberg_parser_never_leaks_on_mutations(data):
    """Byte-flip/insert/delete mutations of packed table directories
    (all three manifest codecs) hold the ValueError/NotImplementedError
    contract through the zip envelope, the metadata JSON, and both
    avro layers."""
    from bigdata_meteo_datalake_spark.operators.delta_log import _unpack_dir
    from bigdata_meteo_datalake_spark.operators.iceberg_meta import (
        parse_iceberg_snapshot,
    )

    blobs = _iceberg_fuzz_blobs()
    blob = bytearray(blobs[data.draw(st.sampled_from(sorted(blobs)))])
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
        snap = parse_iceberg_snapshot(_unpack_dir(bytes(blob)))
    except (ValueError, NotImplementedError):
        return
    assert snap["n_live_files"] >= 0


# --- Arrow IPC files (operators/arrow_ipc.py) ------------------------------------------


def _pa_file(table, compression=None, chunk=2) -> bytes:
    import io

    import pyarrow as pa

    sink = io.BytesIO()
    opts = pa.ipc.IpcWriteOptions(compression=compression)
    with pa.ipc.new_file(sink, table.schema, options=opts) as w:
        w.write_table(table, max_chunksize=chunk)
    return sink.getvalue()


@_S
@given(
    st.lists(
        st.tuples(
            st.none() | st.integers(min_value=-(1 << 63),
                                    max_value=(1 << 63) - 1),
            st.none() | st.floats(allow_nan=False, allow_infinity=False),
            st.none() | st.text(max_size=12),
            st.none() | st.booleans(),
        ),
        min_size=1, max_size=9,
    ),
    st.sampled_from([None, "lz4"]),
    st.integers(min_value=1, max_value=4),
)
def test_arrow_ipc_interop_roundtrip(rows, comp, chunk):
    """Files written by PYARROW (the foreign C++ implementation) with
    arbitrary values/nulls/chunkings, decoded exactly by the
    hand-rolled FlatBuffers walk — with LZ4 body compression the
    pyarrow-written frames additionally exercise our LZ4 frame
    decoder against a foreign compressor."""
    import pyarrow as pa

    from bigdata_meteo_datalake_spark.operators.arrow_ipc import (
        read_arrow_file,
    )

    t = pa.table({
        "i": pa.array([r[0] for r in rows], pa.int64()),
        "f": pa.array([r[1] for r in rows], pa.float64()),
        "s": pa.array([r[2] for r in rows], pa.utf8()),
        "b": pa.array([r[3] for r in rows], pa.bool_()),
    })
    r = read_arrow_file(_pa_file(t, comp, chunk))
    assert [k for k, _, _ in r["fields"]] == ["i", "f", "s", "b"]
    assert r["compression"] == ("lz4" if comp else "none")
    got = {k: [] for k in ("i", "f", "s", "b")}
    total = 0
    for bt in r["batches"]:
        total += bt["n_rows"]
        for k in got:
            got[k].extend(bt["columns"][k])
    assert total == len(rows)
    assert got["i"] == [r[0] for r in rows]
    assert got["s"] == [r[2] for r in rows]
    assert got["b"] == [r[3] for r in rows]
    for g, w in zip(got["f"], [r[1] for r in rows]):
        assert (g is None) == (w is None)
        if w is not None:
            assert g == w


def test_arrow_ipc_declared_boundaries():
    """Out-of-scope shapes raise the CONTRACTED NotImplementedError,
    each produced by pyarrow itself: zstd body compression, nested
    lists, non-64-bit ints. (Unsigned dictionary indices cannot be
    produced — pyarrow normalizes them to signed per the IPC spec's
    recommendation, so that branch stays covered by the parse-layer
    mutation gate only.)"""
    import pyarrow as pa

    from bigdata_meteo_datalake_spark.operators.arrow_ipc import (
        read_arrow_file,
    )

    base = pa.table({"i": pa.array([1, 2, 3], pa.int64())})
    with pytest.raises(NotImplementedError, match="zstd"):
        read_arrow_file(_pa_file(base, "zstd"))
    nested = pa.table({"l": pa.array([[1], [2, 3], []],
                                     pa.list_(pa.int64()))})
    with pytest.raises(NotImplementedError, match="boundary"):
        read_arrow_file(_pa_file(nested))
    small = pa.table({"i": pa.array([1, 2], pa.int32())})
    with pytest.raises(NotImplementedError, match="bitWidth=32"):
        read_arrow_file(_pa_file(small))


def test_arrow_ipc_rejections():
    import pyarrow as pa

    from bigdata_meteo_datalake_spark.operators.arrow_ipc import (
        read_arrow_file,
    )

    good = _pa_file(pa.table({"i": pa.array([1, None, 3], pa.int64()),
                              "s": pa.array(["x", "yy", None], pa.utf8())}))
    read_arrow_file(good)
    with pytest.raises(ValueError, match="leading magic"):
        read_arrow_file(b"NOTARROW" + good[8:])
    with pytest.raises(ValueError, match="trailing magic"):
        read_arrow_file(good[:-6] + b"XXXXXX")
    with pytest.raises(ValueError, match="too short|bounds|magic"):
        read_arrow_file(b"ARROW1\x00\x00ARROW1")
    # truncating the body shifts the footer window onto garbage
    with pytest.raises((ValueError, NotImplementedError)):
        read_arrow_file(good[:20] + good[40:])
    # flipped continuation marker ON A RECORD BATCH (byte 8 starts the
    # stream's schema message, which a random-access reader never
    # touches — the footer points straight at batch blocks): the first
    # batch message follows the schema message
    import struct

    schema_msize = struct.unpack_from("<I", good, 12)[0]
    batch_off = 8 + 8 + schema_msize
    assert good[batch_off : batch_off + 4] == b"\xff\xff\xff\xff"
    bad = bytearray(good)
    bad[batch_off] ^= 0xFF
    with pytest.raises(ValueError, match="continuation"):
        read_arrow_file(bytes(bad))


def _arrow_fuzz_blobs() -> dict[str, bytes]:
    from bigdata_meteo_datalake_spark.operators.arrow_ipc import (
        build_arrow_blob,
    )

    return {"plain": build_arrow_blob(2), "lz4": build_arrow_blob(3)}


@_S
@given(st.binary(min_size=0, max_size=300))
def test_arrow_reader_never_leaks_on_garbage(blob):
    from bigdata_meteo_datalake_spark.operators.arrow_ipc import (
        read_arrow_file,
    )

    try:
        read_arrow_file(blob)
    except (ValueError, NotImplementedError):
        pass


@_S
@given(st.data())
def test_arrow_reader_never_leaks_on_mutations(data):
    """Byte-flip/insert/delete mutations of real pyarrow files (both
    compressions) hold the ValueError/NotImplementedError contract
    through the FlatBuffers walk, the bitmap checks, and the LZ4
    frames."""
    from bigdata_meteo_datalake_spark.operators.arrow_ipc import (
        read_arrow_file,
    )

    blobs = _arrow_fuzz_blobs()
    blob = bytearray(blobs[data.draw(st.sampled_from(sorted(blobs)))])
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
        r = read_arrow_file(bytes(blob))
    except (ValueError, NotImplementedError):
        return
    assert r["n_batches"] >= 0


# --- Parquet split-block bloom filters (operators/parquet_bloom.py) --------------------


def _bloom_file(spark, tmpdir: str) -> str:
    import glob

    df = spark.range(0, 500).selectExpr(
        "cast(id % 83 as long) as k", "concat('usr-', id % 47) as s")
    (df.coalesce(1).write.mode("overwrite")
     .option("parquet.enable.dictionary", "false")
     .option("parquet.bloom.filter.enabled#k", "true")
     .option("parquet.bloom.filter.expected.ndv#k", "83")
     .option("parquet.bloom.filter.enabled#s", "true")
     .option("parquet.bloom.filter.expected.ndv#s", "47")
     .parquet(tmpdir + "/t"))
    return glob.glob(tmpdir + "/t/*.parquet")[0]


def test_parquet_bloom_no_false_negatives_and_sane_fp(spark, tmp_path):
    """The format's guarantee, against Spark's own java-written blooms:
    every present value hits (false negatives impossible), and absent
    probes stay mostly negative (the filter is doing real work — a
    parser bug that returned all-true would pass the first check but
    not this one)."""
    from bigdata_meteo_datalake_spark.operators.parquet_bloom import (
        file_bloom_probe,
    )

    path = _bloom_file(spark, str(tmp_path))
    r = file_bloom_probe(path, "k", "long", range(83))
    assert (r["n_distinct"], r["present_hits"]) == (83, 83)
    r = file_bloom_probe(path, "s", "string",
                         [f"usr-{i}" for i in range(47)])
    assert (r["n_distinct"], r["present_hits"]) == (47, 47)
    absent = file_bloom_probe(path, "k", "long", range(10_000, 14_000))
    assert absent["present_hits"] < 0.25 * absent["n_distinct"], (
        "absent probes mostly positive — the membership test is "
        "degenerate"
    )
    absent_s = file_bloom_probe(path, "s", "string",
                                [f"ghost-{i}" for i in range(4000)])
    assert absent_s["present_hits"] < 0.25 * absent_s["n_distinct"]


def test_parquet_bloom_rejections(spark, tmp_path):
    import glob
    import struct

    from bigdata_meteo_datalake_spark.operators.parquet_bloom import (
        file_bloom_probe,
        read_bloom_filter,
        sbbf_contains,
    )

    path = _bloom_file(spark, str(tmp_path))
    # a column written WITHOUT bloom filters must raise, not pass
    df = spark.range(0, 100).selectExpr("id as plain")
    (df.coalesce(1).write.mode("overwrite")
     .parquet(str(tmp_path) + "/nobloom"))
    nb = glob.glob(str(tmp_path) + "/nobloom/*.parquet")[0]
    with pytest.raises(ValueError, match="no bloom filter"):
        file_bloom_probe(nb, "plain", "long", [1])
    with pytest.raises(ValueError, match="not found"):
        file_bloom_probe(path, "ghost_col", "long", [1])
    # header/bitset contract on raw bytes
    b = open(path, "rb").read()
    with pytest.raises(ValueError, match="bounds"):
        read_bloom_filter(b, len(b) - 4, 64)
    with pytest.raises(ValueError):
        read_bloom_filter(b, 0, 32)  # PAR1 magic is not a thrift header
    # bitset must be whole power-of-two blocks
    with pytest.raises(ValueError, match="whole 32-byte blocks"):
        sbbf_contains(b"\x00" * 33, 12345)
    with pytest.raises(ValueError, match="whole 32-byte blocks"):
        sbbf_contains(b"", 12345)
    # truncating the file clips the bloom region
    from bigdata_meteo_datalake_spark.operators.parquet_bloom import (
        _bloom_regions,
    )

    (off, ln) = _bloom_regions(b, "k")[0]
    with pytest.raises(ValueError, match="bounds|length|header"):
        read_bloom_filter(b[: off + 10], off, ln)
    # corrupting the header's numBytes breaks the length reconciliation
    bad = bytearray(b)
    # find the varint after field header at off: flip it wholesale
    bad[off + 1] ^= 0x7F
    with pytest.raises((ValueError, NotImplementedError)):
        read_bloom_filter(bytes(bad), off, ln)


@_S
@given(st.data())
def test_parquet_bloom_reader_never_leaks_on_mutations(data):
    """Mutations of a valid bloom region (header + bitset) hold the
    ValueError/NotImplementedError contract; bitset-only corruption
    can also legally parse (a bloom with flipped bits is still a
    bloom — it may only lose the membership guarantee, which the
    probe test pins separately)."""
    from bigdata_meteo_datalake_spark.operators.parquet_bloom import (
        read_bloom_filter,
    )

    blob = bytearray(_hand_bloom_region())
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
        read_bloom_filter(bytes(blob), 0, len(blob))
    except (ValueError, NotImplementedError):
        pass


def _hand_bloom_region() -> bytes:
    """A spec-shaped BloomFilterHeader in hand-written thrift compact
    (numBytes=64 i32; BLOCK/XXHASH/UNCOMPRESSED unions as single-member
    structs) + a 64-byte bitset — byte-level independent of any
    writer."""
    header = (
        b"\x15\x80\x01"      # field 1, i32, zigzag(64)
        + b"\x1c\x1c\x00\x00"  # field 2: struct{field 1: empty struct}
        + b"\x1c\x1c\x00\x00"  # field 3: same shape
        + b"\x1c\x1c\x00\x00"  # field 4: same shape
        + b"\x00"              # stop
    )
    return header + bytes(range(64))


def test_parquet_bloom_hand_region_parses():
    """The hand-written thrift header (used by the mutation gate) is
    accepted and yields exactly the 64-byte bitset — so the gate
    mutates from a known-valid baseline."""
    from bigdata_meteo_datalake_spark.operators.parquet_bloom import (
        read_bloom_filter,
    )

    region = _hand_bloom_region()
    assert read_bloom_filter(region, 0, len(region)) == bytes(range(64))


# --- Parquet page index (operators/parquet_pageindex.py) -------------------------------


def _pageindex_file(spark, tmpdir: str, expr: str) -> str:
    import glob

    df = spark.range(0, 2750).selectExpr(expr)
    (df.coalesce(1).write.mode("overwrite")
     .option("parquet.page.row.count.limit", "500")
     .option("parquet.page.size", str(1 << 23))
     .option("parquet.block.size", str(1 << 30))
     .parquet(tmpdir + "/t"))
    return glob.glob(tmpdir + "/t/*.parquet")[0]


def test_pageindex_nulls_and_allnull_pages(spark, tmp_path):
    """Null accounting at page granularity against the java writer:
    scattered nulls land in per-page null_counts, and a fully-null
    page must be flagged null_pages=true — both verified against the
    pyarrow-read data."""
    import pyarrow.parquet as pq

    from bigdata_meteo_datalake_spark.operators.parquet_pageindex import (
        verify_page_index,
    )

    # rows 500..999 (page 1) all null; elsewhere every 7th row null
    path = _pageindex_file(
        spark, str(tmp_path),
        "CASE WHEN id BETWEEN 500 AND 999 THEN NULL "
        "WHEN id % 7 = 3 THEN NULL ELSE id + 1000001 END AS v",
    )
    b = open(path, "rb").read()
    values = pq.read_table(path, columns=["v"])["v"].to_pylist()
    r = verify_page_index(b, "v", "int", values)
    assert r["n_pages"] == 6  # ceil(2750/500)
    assert r["num_rows"] == 2750
    want_nulls = sum(1 for i in range(2750)
                     if 500 <= i <= 999 or i % 7 == 3)
    assert r["null_count"] == want_nulls
    assert r["min_val"] == 1000001
    assert r["max_val"] == 1000001 + 2749
    assert r["boundary_order"] == "ASCENDING"


def test_pageindex_rejections(spark, tmp_path):
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    from bigdata_meteo_datalake_spark.operators.parquet_pageindex import (
        read_page_index,
        verify_page_index,
    )

    path = _pageindex_file(spark, str(tmp_path), "id + 1000001 AS v")
    b = open(path, "rb").read()
    idx = read_page_index(b, "v")
    assert len(idx["pages"]) == 6
    with pytest.raises(ValueError, match="not found"):
        read_page_index(b, "ghost")
    with pytest.raises(ValueError, match="not a parquet file"):
        read_page_index(b"XXXX" + b[4:], "v")
    # pyarrow's default writer emits NO page index: the audit must
    # refuse loudly, never pass vacuously
    buf = io.BytesIO()
    pq.write_table(pa.table({"v": list(range(10))}), buf)
    with pytest.raises(ValueError, match="no page index"):
        read_page_index(buf.getvalue(), "v")
    # a LYING page bound: rewrite page 0's declared min inside the
    # ColumnIndex region — parsing still succeeds, verification must not
    import struct

    values = pq.read_table(path, columns=["v"])["v"].to_pylist()
    verify_page_index(b, "v", "int", values)
    region = b.index(struct.pack("<q", 1000001))
    bad = (b[:region] + struct.pack("<q", 1000000) + b[region + 8:])
    with pytest.raises(ValueError, match="declared bounds"):
        verify_page_index(bad, "v", "int", values)
    # truncated data: the index claims pages past the end
    with pytest.raises(ValueError, match="past the end"):
        verify_page_index(b, "v", "int", values[:400])


_PAGEINDEX_FILE: dict = {"bytes": b""}


def test_pageindex_capture_for_mutations(spark, tmp_path):
    """Captures a real page-indexed file for the mutation gate below
    (pytest runs this file in definition order, so the cache is
    populated before the gate; standalone gate runs skip)."""
    from bigdata_meteo_datalake_spark.operators.parquet_pageindex import (
        read_page_index,
    )

    path = _pageindex_file(spark, str(tmp_path), "id + 7 AS v")
    _PAGEINDEX_FILE["bytes"] = open(path, "rb").read()
    assert len(read_page_index(_PAGEINDEX_FILE["bytes"], "v")["pages"]) == 6


@_S
@given(st.data())
def test_pageindex_reader_never_leaks_on_mutations(data):
    """Byte mutations ANYWHERE in a real page-indexed file hold the
    ValueError/NotImplementedError contract through the footer walk,
    the index structs, and the bounds math (data verification is
    separately pinned above; here the parse layer is the target)."""
    from bigdata_meteo_datalake_spark.operators.parquet_pageindex import (
        read_page_index,
    )

    blob = bytearray(_PAGEINDEX_FILE["bytes"])
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
        idx = read_page_index(bytes(blob), "v")
    except (ValueError, NotImplementedError):
        return
    assert len(idx["pages"]) >= 1


# --- Hudi timeline (operators/hudi_timeline.py) -----------------------------------------


def test_hudi_closed_forms_roundtrip():
    from bigdata_meteo_datalake_spark.operators.hudi_timeline import (
        build_hudi_timeline,
        parse_hudi_snapshot,
    )

    for did in range(40):
        s = parse_hudi_snapshot(build_hudi_timeline(did))
        nc = 1 + did % 3
        writes = [(i, m) for i in range(nc)
                  for m in range(1 + (did + i) % 2)]
        latest: dict = {}
        for i, m in writes:
            latest[m] = i
        assert s["n_completed"] == nc
        assert s["latest_instant"] == f"20240101{nc - 1:02d}0000"
        assert s["pending"] == (did % 3 == 0)
        assert s["n_file_groups"] == len(latest)
        assert s["live_bytes"] == sum(100 * (i + 1) + did % 50 + m
                                      for m, i in latest.items())
        assert s["total_writes"] == sum(10 + did % 7 + i + m
                                        for i, m in writes)


def test_hudi_slashed_partition_paths():
    """Real Hudi partition paths contain slashes ('2024/01/01'); the
    snapshot must count partitions by path, not by path segment
    (ADVICE r12: string-key rsplit miscounted these)."""
    import json

    from bigdata_meteo_datalake_spark.operators.hudi_timeline import (
        parse_hudi_snapshot,
    )

    ts = "20240101000000"
    p2w = {
        "2024/01/01": [{
            "fileId": "fg-a",
            "path": "2024/01/01/fg-a_0-0-0_" + ts + ".parquet",
            "numWrites": 5, "totalWriteBytes": 500,
        }],
        "2024/01/02": [{
            "fileId": "fg-b",
            "path": "2024/01/02/fg-b_0-0-0_" + ts + ".parquet",
            "numWrites": 7, "totalWriteBytes": 700,
        }],
        # Same fileId as above but a different partition: distinct group.
        "2025/01/02": [{
            "fileId": "fg-b",
            "path": "2025/01/02/fg-b_0-0-0_" + ts + ".parquet",
            "numWrites": 1, "totalWriteBytes": 100,
        }],
    }
    files = {
        f".hoodie/{ts}.commit.requested": b"",
        f".hoodie/{ts}.commit.inflight": b"{}",
        f".hoodie/{ts}.commit": json.dumps(
            {"partitionToWriteStats": p2w}, sort_keys=True).encode(),
    }
    s = parse_hudi_snapshot(files)
    assert s["n_partitions"] == 3
    assert s["n_file_groups"] == 3
    assert s["live_bytes"] == 1300
    assert s["total_writes"] == 13


def test_hudi_mvcc_visibility():
    """The core property: an inflight tail commit is INVISIBLE — the
    snapshot equals the table without it; completing the commit makes
    it visible."""
    import json

    from bigdata_meteo_datalake_spark.operators.hudi_timeline import (
        build_hudi_timeline,
        parse_hudi_snapshot,
    )

    base = build_hudi_timeline(3)  # doc 3: pending tail (3 % 3 == 0)
    s = parse_hudi_snapshot(base)
    assert s["pending"] and s["n_completed"] == 1
    # completing the tail advances the snapshot
    ts = "20240101010000"
    done = dict(base)
    done[f".hoodie/{ts}.commit"] = json.dumps({
        "partitionToWriteStats": {"p=0": [{
            "fileId": "fg-0", "path": f"p=0/fg-0_0-0-0_{ts}.parquet",
            "numWrites": 5, "totalWriteBytes": 777}]},
        "operation": "upsert",
    }).encode()
    s2 = parse_hudi_snapshot(done)
    assert not s2["pending"]
    assert s2["n_completed"] == 2
    assert s2["latest_instant"] == ts
    # fg-0's base file is replaced (777); fg-1 keeps commit 0's base
    # file (100*1 + 3%50 + 1 = 104) — copy-on-write is per file group
    assert s2["live_bytes"] == 777 + 104
    assert s2["total_writes"] == s["total_writes"] + 5


def test_hudi_rejections():
    import json

    from bigdata_meteo_datalake_spark.operators.hudi_timeline import (
        build_hudi_timeline,
        parse_hudi_snapshot,
    )

    base = build_hudi_timeline(4)  # nc=2, no pending
    parse_hudi_snapshot(dict(base))
    f = dict(base)
    del f[".hoodie/20240101000000.commit.requested"]
    with pytest.raises(ValueError, match="requested"):
        parse_hudi_snapshot(f)
    f = dict(base)
    del f[".hoodie/20240101010000.commit.inflight"]
    with pytest.raises(ValueError, match="inflight"):
        parse_hudi_snapshot(f)
    f = dict(base)
    f[".hoodie/2024.commit"] = b"{}"
    with pytest.raises(ValueError, match="unparseable"):
        parse_hudi_snapshot(f)
    f = dict(base)
    f[".hoodie/20240101990000.clean.requested"] = b""
    with pytest.raises(NotImplementedError, match="declared boundary"):
        parse_hudi_snapshot(f)
    f = dict(base)
    f[".hoodie/20240101010000.commit"] = b"{not json"
    with pytest.raises(ValueError, match="not JSON"):
        parse_hudi_snapshot(f)
    # base-file name not embedding the instant time
    meta = json.loads(base[".hoodie/20240101010000.commit"])
    stat = next(iter(meta["partitionToWriteStats"].values()))[0]
    stat["path"] = "p=0/fg-0_0-0-0_20990101000000.parquet"
    f = dict(base)
    f[".hoodie/20240101010000.commit"] = json.dumps(meta).encode()
    with pytest.raises(ValueError, match="embed"):
        parse_hudi_snapshot(f)
    # duplicate file group within one commit+partition
    meta = json.loads(base[".hoodie/20240101010000.commit"])
    part, stats = next(iter(meta["partitionToWriteStats"].items()))
    stats.append(dict(stats[0]))
    f = dict(base)
    f[".hoodie/20240101010000.commit"] = json.dumps(meta).encode()
    with pytest.raises(ValueError, match="twice"):
        parse_hudi_snapshot(f)
    with pytest.raises(ValueError, match="no timeline instants"):
        parse_hudi_snapshot({"other": b""})


@_S
@given(st.data())
def test_hudi_parser_never_leaks_on_mutations(data):
    from bigdata_meteo_datalake_spark.operators.delta_log import (
        _pack_dir,
        _unpack_dir,
    )
    from bigdata_meteo_datalake_spark.operators.hudi_timeline import (
        build_hudi_timeline,
        parse_hudi_snapshot,
    )

    blob = bytearray(_pack_dir(build_hudi_timeline(
        data.draw(st.sampled_from([0, 1, 2, 5])))))
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
        s = parse_hudi_snapshot(_unpack_dir(bytes(blob)))
    except (ValueError, NotImplementedError):
        return
    assert s["n_file_groups"] >= 1


# --- Arrow IPC stream format -------------------------------------------------------------


def _pa_stream(table, compression=None, chunk=2) -> bytes:
    import io

    import pyarrow as pa

    sink = io.BytesIO()
    opts = pa.ipc.IpcWriteOptions(compression=compression)
    with pa.ipc.new_stream(sink, table.schema, options=opts) as w:
        w.write_table(table, max_chunksize=chunk)
    return sink.getvalue()


@_S
@given(
    st.lists(
        st.tuples(
            st.none() | st.integers(min_value=-(1 << 63),
                                    max_value=(1 << 63) - 1),
            st.none() | st.text(max_size=12),
        ),
        min_size=1, max_size=9,
    ),
    st.sampled_from([None, "lz4"]),
    st.integers(min_value=1, max_value=4),
)
def test_arrow_stream_interop_roundtrip(rows, comp, chunk):
    """Stream-encoded pyarrow output decodes to the same values as the
    file form — both container framings over the foreign writer."""
    import pyarrow as pa

    from bigdata_meteo_datalake_spark.operators.arrow_ipc import (
        read_arrow_stream,
    )

    t = pa.table({
        "i": pa.array([r[0] for r in rows], pa.int64()),
        "s": pa.array([r[1] for r in rows], pa.utf8()),
    })
    r = read_arrow_stream(_pa_stream(t, comp, chunk))
    got_i: list = []
    got_s: list = []
    for bt in r["batches"]:
        got_i.extend(bt["columns"]["i"])
        got_s.extend(bt["columns"]["s"])
    assert got_i == [x[0] for x in rows]
    assert got_s == [x[1] for x in rows]
    assert r["compression"] == ("lz4" if comp else "none")


def test_arrow_stream_rejections():
    import pyarrow as pa

    from bigdata_meteo_datalake_spark.operators.arrow_ipc import (
        read_arrow_stream,
    )

    t = pa.table({"i": pa.array([1, 2, 3], pa.int64())})
    good = _pa_stream(t)
    read_arrow_stream(good)
    with pytest.raises(ValueError, match="empty stream"):
        read_arrow_stream(b"")
    with pytest.raises(ValueError, match="continuation"):
        read_arrow_stream(b"\x00\x00\x00\x00" + good[4:])
    # trailing garbage after the end-of-stream marker
    with pytest.raises(ValueError, match="after the end-of-stream"):
        read_arrow_stream(good + b"junk")
    # a stream that opens with a RecordBatch (no schema message):
    # strip the schema message (first envelope)
    import struct

    msize = struct.unpack_from("<I", good, 4)[0]
    with pytest.raises(ValueError, match="not a Schema"):
        read_arrow_stream(good[8 + msize:])
    # dictionary-encoded columns decode through the dictionary message
    dict_t = pa.table({"d": pa.array(["a", "b", None, "a"],
                                     pa.dictionary(pa.int8(), pa.utf8()))})
    r = read_arrow_stream(_pa_stream(dict_t))
    got = [v for bt in r["batches"] for v in bt["columns"]["d"]]
    assert got == ["a", "b", None, "a"]
    assert r["fields"] == [("d", "dict<utf8>", True)]


@_S
@given(st.data())
def test_arrow_stream_never_leaks_on_mutations(data):
    from bigdata_meteo_datalake_spark.operators.arrow_ipc import (
        build_arrow_blob,
        read_arrow_stream,
    )

    blob = bytearray(build_arrow_blob(
        data.draw(st.sampled_from([2, 3])), stream=True))
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
        r = read_arrow_stream(bytes(blob))
    except (ValueError, NotImplementedError):
        return
    assert r["n_batches"] >= 0


def test_arrow_delta_dictionaries_stream():
    """isDelta dictionary messages APPEND: a stream whose dictionary
    grows across batches (pyarrow's emit_dictionary_deltas) resolves
    later indices through the accumulated value vector."""
    import io

    import pyarrow as pa

    from bigdata_meteo_datalake_spark.operators.arrow_ipc import (
        read_arrow_stream,
    )

    opts = pa.ipc.IpcWriteOptions(emit_dictionary_deltas=True)
    schema = pa.schema([("d", pa.dictionary(pa.int32(), pa.utf8()))])
    buf = io.BytesIO()
    with pa.ipc.new_stream(buf, schema, options=opts) as w:
        w.write_batch(pa.record_batch(
            [pa.array(["a", "b"]).dictionary_encode()], schema=schema))
        w.write_batch(pa.record_batch(
            [pa.array(["a", "b", "c", "c"]).dictionary_encode()],
            schema=schema))
    r = read_arrow_stream(buf.getvalue())
    got = [v for bt in r["batches"] for v in bt["columns"]["d"]]
    assert got == ["a", "b", "a", "b", "c", "c"]


# --- ORC row-group indexes + blooms (operators/orc_index.py) ---------------------------


def test_orc_long_hash_pinned_to_writer_bytecode():
    """Ground-truth values extracted from the shipped orc-core's own
    BloomFilter.getLongHash (via reflection) — the signed-shift Wang
    variant; classic Wang (unsigned shifts) disagrees on 0, negatives,
    and large keys, so these seven pins are load-bearing."""
    from bigdata_meteo_datalake_spark.operators.orc_index import (
        orc_long_hash,
    )

    want = {
        0: 0x0,
        1: 0x5BCA7C69B794F8CE,
        7: 0x828A4CC485149963,
        (1 << 64) - 1: 0x5BCA868437950D03,  # -1 as a java long
        97: 0xCA602E0214C059F5,
        123456789: 0xE61EF031A43FDAF8,
        (1 << 40) + 5: 0x740B35AA27FD76A0,
    }
    for k, v in want.items():
        assert orc_long_hash(k) == v, hex(k)


def test_orc_murmur3_matches_jvm(spark):
    """Cross-verification against the INDEPENDENT implementation this
    container ships: org.apache.orc.util.Murmur3.hash64 (the JVM's own
    bytes, called directly), over seeded-random byte strings spanning
    every length class (empty, sub-block tails, multi-block)."""
    import random

    from bigdata_meteo_datalake_spark.operators.orc_index import (
        murmur3_64,
    )

    jvm = spark.sparkContext._jvm
    rng = random.Random(0x0C0FFEE)
    samples = [b""] + [rng.randbytes(rng.randrange(0, 70))
                       for _ in range(120)]
    for s in samples:
        # py4j converts python bytes/bytearray to byte[] directly
        got = jvm.org.apache.orc.util.Murmur3.hash64(bytearray(s))
        assert murmur3_64(s) == got & ((1 << 64) - 1), s.hex()


def _orc_index_file(spark, tmpdir: str, expr: str, bloom_cols: str,
                    stride: int = 1000) -> str:
    import glob

    df = spark.range(0, 2750).selectExpr(expr)
    w = (df.coalesce(1).write.mode("overwrite")
         .option("compression", "zlib")
         .option("orc.row.index.stride", str(stride))
         .option("orc.stripe.size", str(1 << 30)))
    if bloom_cols:
        w = w.option("orc.bloom.filter.columns", bloom_cols)
    w.orc(tmpdir + "/t")
    return glob.glob(tmpdir + "/t/*.orc")[0]


def test_orc_index_nulls_and_string_blooms(spark, tmp_path):
    """Null accounting at stride granularity (scattered nulls plus an
    entire all-null stride) and the string-bloom no-false-negative
    guarantee — neither is on the oracle's numeric-column path."""
    import pyarrow.orc as po

    from bigdata_meteo_datalake_spark.operators.orc_index import (
        murmur3_64,
        orc_bloom_test,
        read_orc_indexes,
        verify_orc_indexes,
    )

    path = _orc_index_file(
        spark, str(tmp_path),
        "CASE WHEN id BETWEEN 1000 AND 1999 THEN NULL "
        "WHEN id % 7 = 3 THEN NULL ELSE id + 5000 END AS v",
        bloom_cols="v",
    )
    b = open(path, "rb").read()
    values = po.ORCFile(path).read(columns=["v"])["v"].to_pylist()
    r = verify_orc_indexes(b, "v", "int", values)
    assert r["n_strides"] == 3
    assert r["num_rows"] == 2750
    want_nulls = sum(1 for i in range(2750)
                     if 1000 <= i <= 1999 or i % 7 == 3)
    assert r["null_count"] == want_nulls
    assert (r["min_val"], r["max_val"]) == (5000, 5000 + 2749)

    # string blooms: every present value hits, absent probes mostly miss
    spath = _orc_index_file(
        spark, str(tmp_path) + "/s",
        "concat('usr-', id % 47) AS s", bloom_cols="s")
    sb = open(spath, "rb").read()
    idx = read_orc_indexes(sb, "s")
    bl = idx["stripes"][0]["blooms"][0]
    hits = sum(orc_bloom_test(bl["longs"], bl["n_hash"],
                              murmur3_64(f"usr-{i}".encode()))
               for i in range(47))
    assert hits == 47
    fp = sum(orc_bloom_test(bl["longs"], bl["n_hash"],
                            murmur3_64(f"ghost-{i}".encode()))
             for i in range(2000))
    assert fp < 500, "absent probes mostly positive — degenerate test"


def test_orc_index_rejections(spark, tmp_path):
    import pyarrow.orc as po

    from bigdata_meteo_datalake_spark.operators.orc_index import (
        read_orc_indexes,
        verify_orc_indexes,
    )

    path = _orc_index_file(spark, str(tmp_path), "id + 5000 AS v",
                           bloom_cols="v")
    b = open(path, "rb").read()
    values = po.ORCFile(path).read(columns=["v"])["v"].to_pylist()
    verify_orc_indexes(b, "v", "int", values)
    with pytest.raises(ValueError, match="not in the ORC schema"):
        read_orc_indexes(b, "ghost")
    with pytest.raises(ValueError, match="not an ORC file"):
        read_orc_indexes(b"XXX" + b[3:], "v")
    # a file written WITHOUT blooms must refuse, never pass vacuously
    nb = _orc_index_file(spark, str(tmp_path) + "/nb", "id AS v",
                         bloom_cols="")
    with pytest.raises(ValueError, match="BLOOM_FILTER_UTF8"):
        read_orc_indexes(open(nb, "rb").read(), "v")
    # data that contradicts the index: stats verification must fire
    with pytest.raises(ValueError, match="declared bounds|declared"):
        verify_orc_indexes(b, "v", "int", list(reversed(values)))
    with pytest.raises(ValueError, match="cover"):
        verify_orc_indexes(b, "v", "int", values[:100])


_ORC_INDEX_FILE: dict = {"bytes": b""}


def test_orc_index_capture_for_mutations(spark, tmp_path):
    """Captures a real indexed ORC file for the mutation gate below."""
    from bigdata_meteo_datalake_spark.operators.orc_index import (
        read_orc_indexes,
    )

    path = _orc_index_file(spark, str(tmp_path), "id + 11 AS v",
                           bloom_cols="v")
    _ORC_INDEX_FILE["bytes"] = open(path, "rb").read()
    idx = read_orc_indexes(_ORC_INDEX_FILE["bytes"], "v")
    assert len(idx["stripes"][0]["entries"]) == 3


@_S
@given(st.data())
def test_orc_index_reader_never_leaks_on_mutations(data):
    from bigdata_meteo_datalake_spark.operators.orc_index import (
        read_orc_indexes,
    )

    blob = bytearray(_ORC_INDEX_FILE["bytes"])
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
        idx = read_orc_indexes(bytes(blob), "v")
    except (ValueError, NotImplementedError):
        return
    assert idx["row_stride"] >= 1


# --- SFT conversation shaping (queries/ext_training.py) --------------------------------


def test_sft_alternation_validator(spark):
    """The declarative validator against adversarial transcripts: the
    five illegal shapes flag false, the two legal ones true — and the
    completion span always points at the LAST message's content."""
    import json

    from bigdata_meteo_datalake_spark.queries.ext_training import (
        shape_sft_conversations,
    )

    def conv(*turns):
        return json.dumps([{"role": r, "content": c} for r, c in turns])

    cases = [
        (conv(("user", "hi"), ("assistant", "yo")), True),
        (conv(("system", "be kind"), ("user", "hi"),
              ("assistant", "yo"), ("user", "more"),
              ("assistant", "sure")), True),
        (conv(("assistant", "yo")), False),          # starts on assistant
        (conv(("user", "hi")), False),               # ends on user
        (conv(("user", "a"), ("user", "b"),
              ("assistant", "c"), ("assistant", "d")), False),  # doubles
        (conv(("user", "hi"), ("system", "late"),
              ("assistant", "yo")), False),          # system mid-stream
        (conv(("system", "s")), False),              # system only
    ]
    df = spark.createDataFrame(
        [(i, c) for i, (c, _) in enumerate(cases)],
        "doc_id long, conversation_json string",
    )
    rows = {r["doc_id"]: r for r in shape_sft_conversations(df).collect()}
    for i, (_, want) in enumerate(cases):
        assert rows[i]["valid_alternation"] == want, i
    # span math on the legal system case
    r = rows[1]
    assert r["n_messages"] == 5 and r["has_system"]
    assert r["completion_chars"] == len("sure")
    # <|sys|>be kind <|usr|>hi <|asst|>yo <|usr|>more <|asst|>sure
    want_template = len("<|sys|>be kind<|usr|>hi<|asst|>yo<|usr|>more"
                        "<|asst|>sure")
    assert r["template_chars"] == want_template
    assert r["completion_start"] == want_template - len("sure")


def test_sft_report_is_pure_projection(spark):
    """Zero exchanges, zero Python: the shaping must compile to scan +
    project only (the whole point of the declarative form)."""
    from bigdata_meteo_datalake_spark.queries import REGISTRY, queries

    queries()
    df = REGISTRY["sft_turns_report"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_dpo_pairs_single_aggregate_exchange(spark):
    """One map-side-combined hash aggregate on prompt_id — the single
    shuffle a pair builder needs; scan pruned to doc_id alone."""
    from bigdata_meteo_datalake_spark.queries import REGISTRY, queries

    queries()
    df = REGISTRY["dpo_pairs_report"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("hashpartitioning") == 1
    assert "partial_max_by" in plan  # map-side combine of the argmax
    assert "Window" not in plan and "Join" not in plan
    rows = {r["prompt_id"]: r for r in df.collect()}
    # closed-form spot check: prompt 0 = docs 0..3, scores 0,37,74,10
    r = rows[0]
    assert (r["chosen_doc"], r["chosen_score"]) == (2, 74)
    assert (r["rejected_doc"], r["rejected_score"]) == (0, 0)
    assert r["margin"] == 74 and r["valid_pair"]


def test_bt_strengths_plan_and_convergence(spark):
    """Plan: the comparison corpus reduces through map-side-combined
    aggregates, and every MM-iteration join rides a broadcast (the
    per-item state is broadcast-sized by construction — no corpus
    re-shuffle). Semantics: strengths order items by win rate, and a
    third hand-computed iteration agrees with the integer-quantized
    recurrence."""
    from bigdata_meteo_datalake_spark.queries import REGISTRY, queries

    queries()
    df = REGISTRY["bt_preference_strengths"].fn(
        spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    rows = {r["item"]: r for r in df.collect()}
    assert len(rows) == 8
    # win-rate order is preserved by the BT strengths
    by_rate = sorted(rows, key=lambda i: rows[i]["n_wins"] / rows[i]["n_matches"])
    by_strength = sorted(rows, key=lambda i: rows[i]["strength_q"])
    assert by_rate == by_strength
    # recompute the two quantized iterations in plain python
    import collections
    import math

    SCALE = 1_000_000_000_000
    docs = range(500)
    m = [(d % 8, (d // 8) % 8, (d % 8) if (d * 13) % 2 == 0 else (d // 8) % 8)
         for d in docs if d % 8 != (d // 8) % 8]
    wins = collections.Counter(w for _, _, w in m)
    n = collections.Counter()
    for i, j, _ in m:
        n[(min(i, j), max(i, j))] += 1
    edges = collections.defaultdict(list)
    for (a, b), cnt in n.items():
        edges[a].append((b, cnt))
        edges[b].append((a, cnt))
    p = {i: 1_000_000 for i in range(8)}
    for _ in range(2):
        denom = {i: sum(math.floor(cnt * SCALE / (p[i] + p[j]))
                        for j, cnt in edges[i]) for i in p}
        p = {i: math.floor(wins[i] * SCALE / denom[i]) for i in p}
    for i in range(8):
        assert rows[i]["strength_q"] == p[i], i


# --- Parquet data-page decode (operators/parquet_pages.py) ------------------------------


def _page_file(spark, tmpdir: str, expr: str, codec: str = "snappy",
               **opts) -> str:
    import glob

    w = (spark.range(0, 2750).selectExpr(expr)
         .coalesce(1).write.mode("overwrite")
         .option("parquet.enable.dictionary", "false")
         .option("parquet.page.row.count.limit", "500")
         .option("compression", codec))
    for k, v in opts.items():
        w = w.option(k.replace("__", "."), v)
    w.parquet(tmpdir + "/t")
    return glob.glob(tmpdir + "/t/*.parquet")[0]


def test_page_decode_all_types_and_codecs(spark, tmp_path):
    """Hand decode == pyarrow decode, row for row: int64 (REQUIRED and
    OPTIONAL with nulls), double, byte arrays, booleans, across
    uncompressed/gzip/snappy."""
    import pyarrow.parquet as pq

    from bigdata_meteo_datalake_spark.operators.parquet_pages import (
        decode_parquet_column,
    )

    cases = [
        ("id + 9 AS v", "v", "uncompressed"),          # REQUIRED int64
        ("CASE WHEN id % 7 = 3 THEN NULL ELSE id END AS v", "v", "gzip"),
        ("cast(id AS double)/4 AS v", "v", "snappy"),
        ("concat('s', id % 13) AS v", "v", "snappy"),  # byte arrays
        ("id % 3 = 0 AS v", "v", "gzip"),              # booleans
    ]
    for i, (expr, col, codec) in enumerate(cases):
        path = _page_file(spark, str(tmp_path / str(i)), expr, codec)
        b = open(path, "rb").read()
        got = decode_parquet_column(b, col)
        ref = pq.read_table(path, columns=[col])[col].to_pylist()
        vals = got["values"]
        if isinstance(next((v for v in vals if v is not None), None),
                      bytes):
            vals = [v.decode() if v is not None else None for v in vals]
        assert vals == ref, (i, codec)
        assert got["n_pages"] == 6  # ceil(2750/500)


def test_page_decode_bitpacked_deflevels_boundary(spark, tmp_path):
    """A v1 data page whose DataPageHeader.definition_level_encoding
    (field 3) is legacy BIT_PACKED must raise the declared boundary,
    not a confusing level-overrun (ADVICE r12). Built by byte-patching
    a real parquet-mr header: compact-thrift `15 06` (field 3, i32,
    zigzag(RLE=3)) -> `15 08` (BIT_PACKED=4)."""
    import struct

    from bigdata_meteo_datalake_spark.operators.parquet_footer import (
        _read_struct,
    )
    from bigdata_meteo_datalake_spark.operators.parquet_pages import (
        decode_parquet_column,
    )

    path = _page_file(spark, str(tmp_path / "bp"),
                      "CASE WHEN id % 7 = 3 THEN NULL ELSE id END AS v")
    b = open(path, "rb").read()
    (flen,) = struct.unpack_from("<I", b, len(b) - 8)
    fm, _ = _read_struct(b[len(b) - 8 - flen : len(b) - 8], 0)
    off = fm[4][0][1][0][3][9]  # first chunk's data_page_offset
    ph, hend = _read_struct(b, off)
    assert ph[5][3] == 3 and ph[5][4] == 4  # def RLE, rep BIT_PACKED
    head = bytearray(b[off:hend])
    idx = bytes(head).find(b"\x15\x06\x15\x08\x00")
    assert idx != -1, "expected def/rep encoding tail in the header"
    head[idx + 1] = 0x08  # definition_level_encoding -> BIT_PACKED
    patched = b[:off] + bytes(head) + b[hend:]
    with pytest.raises(NotImplementedError, match="definition-level"):
        decode_parquet_column(patched, "v")


def test_page_decode_boundaries_and_rejections(spark, tmp_path):
    import glob

    from bigdata_meteo_datalake_spark.operators.parquet_pages import (
        decode_parquet_column,
        rle_bp_hybrid,
    )

    plain = _page_file(spark, str(tmp_path / "p"), "id + 9 AS v")
    b = open(plain, "rb").read()
    decode_parquet_column(b, "v")
    with pytest.raises(ValueError, match="not in the schema"):
        decode_parquet_column(b, "ghost")
    with pytest.raises(ValueError, match="not a parquet file"):
        decode_parquet_column(b"XXXX" + b[4:], "v")
    # dictionary-encoded chunks (the writer default) now decode
    import pyarrow.parquet as _pq

    (spark.range(0, 100).selectExpr("id % 5 AS v").coalesce(1)
     .write.mode("overwrite").parquet(str(tmp_path / "d")))
    dfp = glob.glob(str(tmp_path / "d") + "/*.parquet")[0]
    db = open(dfp, "rb").read()
    assert decode_parquet_column(db, "v")["values"] == \
        _pq.read_table(dfp, columns=["v"])["v"].to_pylist()
    # v2 data pages (DELTA_BINARY_PACKED) now decode
    v2 = _page_file(spark, str(tmp_path / "v2"),
                    "CASE WHEN id % 7 = 3 THEN NULL "
                    "ELSE id * 37 - 5000 END AS v", "snappy",
                    parquet__enable__dictionary="false",
                    parquet__writer__version="v2")
    got = decode_parquet_column(open(v2, "rb").read(), "v")["values"]
    assert got == _pq.read_table(v2, columns=["v"])["v"].to_pylist()
    # v2 dictionary strings also roundtrip (RLE_DICTIONARY inside v2)
    v2d = _page_file(spark, str(tmp_path / "v2d"),
                     "concat('s', id % 7) AS v", "gzip",
                     parquet__writer__version="v2")
    got = decode_parquet_column(open(v2d, "rb").read(), "v")["values"]
    got = [g.decode() if g is not None else None for g in got]
    assert got == _pq.read_table(v2d, columns=["v"])["v"].to_pylist()
    # zstd pages are the declared boundary
    z = _page_file(spark, str(tmp_path / "z"), "id AS v", "zstd")
    with pytest.raises(NotImplementedError, match="ZSTD"):
        decode_parquet_column(open(z, "rb").read(), "v")
    # a flipped data byte must trip the page CRC
    import struct

    from bigdata_meteo_datalake_spark.operators.parquet_footer import (
        _read_struct,
    )

    (flen,) = struct.unpack_from("<I", b, len(b) - 8)
    fm, _ = _read_struct(b[len(b) - 8 - flen : len(b) - 8], 0)
    off = fm[4][0][1][0][3][9]  # first chunk's data_page_offset
    ph, hend = _read_struct(b, off)
    bad = bytearray(b)
    bad[hend + 10] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        decode_parquet_column(bytes(bad), "v")
    # hybrid decoder contract
    with pytest.raises(ValueError, match="overruns"):
        rle_bp_hybrid(b"\x08", 1, 4)  # RLE run without its value byte
    with pytest.raises(ValueError, match="zero-length"):
        rle_bp_hybrid(b"\x00\x01", 1, 4)
    assert rle_bp_hybrid(b"\x08\x01", 1, 4) == [1, 1, 1, 1]
    assert rle_bp_hybrid(b"\x03\x0b\x00\x00", 3, 8) == [3, 1, 0, 0, 0,
                                                        0, 0, 0]


def _pagefile_fuzz() -> bytes:
    return _PAGE_DECODE_FILE["bytes"]


_PAGE_DECODE_FILE: dict = {"bytes": b""}


def test_page_decode_capture_for_mutations(spark, tmp_path):
    from bigdata_meteo_datalake_spark.operators.parquet_pages import (
        decode_parquet_column,
    )

    path = _page_file(spark, str(tmp_path), "id + 3 AS v", "snappy")
    _PAGE_DECODE_FILE["bytes"] = open(path, "rb").read()
    assert decode_parquet_column(_PAGE_DECODE_FILE["bytes"],
                                 "v")["n_pages"] == 6


@_S
@given(st.data())
def test_page_decoder_never_leaks_on_mutations(data):
    from bigdata_meteo_datalake_spark.operators.parquet_pages import (
        decode_parquet_column,
    )

    blob = bytearray(_pagefile_fuzz())
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
        r = decode_parquet_column(bytes(blob), "v")
    except (ValueError, NotImplementedError):
        return
    assert r["n_pages"] >= 0


# --- ORC data decode (operators/orc_data.py) --------------------------------------------


def _orc_data_file(spark, tmpdir: str, expr: str, codec: str = "zlib") -> str:
    import glob

    (spark.range(0, 3000).selectExpr(expr)
     .coalesce(1).write.mode("overwrite")
     .option("compression", codec).orc(tmpdir + "/t"))
    return glob.glob(tmpdir + "/t/*.orc")[0]


def test_orc_decode_all_rlev2_subencodings(spark, tmp_path):
    """Each RLEv2 sub-encoding exercised against the java writer and
    decoded exactly: delta (monotonic), direct (modular), PATCHED BASE
    (small values with sparse huge outliers), short-repeat-heavy
    (constant runs), descending delta (negative delta base), negative
    zigzags, nulls through the PRESENT stream, raw doubles — across
    none/zlib/snappy."""
    import pyarrow.orc as po

    from bigdata_meteo_datalake_spark.operators.orc_data import (
        decode_orc_column,
    )

    cases = [
        ("id + 9 AS v", "zlib"),
        ("cast(id % 97 AS long) AS v", "snappy"),
        ("cast(id % 50 AS long) + CASE WHEN id % 100 = 7 "
         "THEN 1000000 ELSE 0 END AS v", "none"),
        ("id div 500 AS v", "zlib"),
        ("cast(3000 - id AS long) AS v", "snappy"),
        ("cast(id % 2 * -500 + 250 AS long) AS v", "zlib"),
        ("CASE WHEN id % 7 = 3 THEN NULL ELSE id * 1234567 END AS v",
         "snappy"),
        ("cast(id AS double)/4 AS v", "zlib"),
        ("CASE WHEN id % 11 = 5 THEN NULL "
         "ELSE cast(id AS double)/8 END AS v", "none"),
        # strings: DIRECT_V2 (high cardinality) and DICTIONARY_V2
        ("concat('unique-', id) AS v", "zlib"),
        ("CASE WHEN id % 9 = 4 THEN NULL "
         "ELSE concat('cat', id % 5) END AS v", "snappy"),
    ]
    for i, (expr, codec) in enumerate(cases):
        path = _orc_data_file(spark, str(tmp_path / str(i)), expr, codec)
        got = decode_orc_column(open(path, "rb").read(), "v")["values"]
        ref = po.ORCFile(path).read(columns=["v"])["v"].to_pylist()
        assert got == ref, (i, codec)


def test_orc_patched_base_closest_fixed_bits():
    """RLEv2 PATCHED_BASE packs its patch list at
    getClosestFixedBits(pgw + pw): a 25-bit combined width is stored
    at 26 bits by the Java writer (ADVICE r12 — decoding at the raw
    sum desyncs on legal writer output)."""
    from bigdata_meteo_datalake_spark.operators.orc_data import (
        rlev2_decode,
    )

    def pack_be(values, width):
        nbits = width * len(values)
        nbytes = (nbits + 7) // 8
        big = 0
        for v in values:
            big = (big << width) | v
        big <<= nbytes * 8 - nbits
        return big.to_bytes(nbytes, "big")

    length, w, pw, pgw = 10, 8, 24, 1  # pgw + pw = 25 -> stored at 26
    low = [(i * 37) % 251 for i in range(length)]
    patch_a, patch_b = 0xABCDEF, 0x00F00D
    expected = list(low)
    expected[3] |= patch_a << w
    expected[5] |= patch_b << w
    run = bytes([
        (2 << 6) | (7 << 1) | ((length - 1) >> 8),  # w=8 -> code 7
        (length - 1) & 0xFF,
        (0 << 5) | 23,          # bw=1; pw=24 -> code 23
        (0 << 5) | 2,           # pgw=1; two patch entries
        0x00,                   # base = 0
    ]) + pack_be(low, w) + pack_be(
        [(3 << pw) | patch_a, (2 << pw) | patch_b], 26)
    assert rlev2_decode(run, length, signed=False) == expected


def test_orc_decode_rejections(spark, tmp_path):
    from bigdata_meteo_datalake_spark.operators.orc_data import (
        bool_decode,
        byte_rle_decode,
        decode_orc_column,
        rlev2_decode,
    )

    path = _orc_data_file(spark, str(tmp_path), "id AS v")
    b = open(path, "rb").read()
    decode_orc_column(b, "v")
    with pytest.raises(ValueError, match="not in the ORC schema"):
        decode_orc_column(b, "ghost")
    with pytest.raises(ValueError, match="not an ORC file"):
        decode_orc_column(b"XXX" + b[3:], "v")
    # timestamps remain the declared decode boundary
    import glob as _glob

    (spark.range(0, 50).selectExpr("timestamp'2024-01-01' + make_interval(0,0,0,0,0,0,id) AS v")
     .coalesce(1).write.mode("overwrite")
     .option("compression", "zlib").orc(str(tmp_path) + "/ts"))
    tsf = _glob.glob(str(tmp_path) + "/ts/*.orc")[0]
    with pytest.raises(NotImplementedError, match="boundary"):
        decode_orc_column(open(tsf, "rb").read(), "v")
    # primitive decoders fail loud
    with pytest.raises(ValueError, match="exhausted"):
        rlev2_decode(b"", 5)
    with pytest.raises(ValueError, match="overruns"):
        rlev2_decode(bytes([0x0A]), 3)  # short repeat missing its value
    with pytest.raises(ValueError, match="decodes 5"):
        rlev2_decode(bytes([0x02, 0x00, 0x07]), 3)  # run longer than n
    with pytest.raises(ValueError, match="exhausted"):
        byte_rle_decode(b"", 3)
    assert byte_rle_decode(bytes([0x00, 0xAB]), 3) == b"\xab\xab\xab"
    assert byte_rle_decode(bytes([0xFE, 0x01, 0x02]), 2) == b"\x01\x02"
    assert bool_decode(bytes([0xFF, 0b10100000]), 3) == [True, False, True]


def _orc_decode_fuzz() -> bytes:
    return _ORC_DECODE_FILE["bytes"]


_ORC_DECODE_FILE: dict = {"bytes": b""}


def test_orc_decode_capture_for_mutations(spark, tmp_path):
    from bigdata_meteo_datalake_spark.operators.orc_data import (
        decode_orc_column,
    )

    path = _orc_data_file(spark, str(tmp_path),
                          "CASE WHEN id % 7 = 3 THEN NULL "
                          "ELSE id * 31 END AS v", "snappy")
    _ORC_DECODE_FILE["bytes"] = open(path, "rb").read()
    assert len(decode_orc_column(_ORC_DECODE_FILE["bytes"],
                                 "v")["values"]) == 3000


@_S
@given(st.data())
def test_orc_decoder_never_leaks_on_mutations(data):
    from bigdata_meteo_datalake_spark.operators.orc_data import (
        decode_orc_column,
    )

    blob = bytearray(_orc_decode_fuzz())
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
        r = decode_orc_column(bytes(blob), "v")
    except (ValueError, NotImplementedError):
        return
    # a mutation may legally empty the stripe list (an empty ORC file
    # has zero stripes); anything parsed must still be self-consistent
    assert r["n_stripes"] >= 0
    assert isinstance(r["values"], list)


def test_data_decoders_triangulate_with_spark_reader(spark, tmp_path):
    """Third-reader triangulation: the hand decoders must agree not
    just with pyarrow (the in-kernel cross-check) but with SPARK'S own
    scans of the same files — three independent implementations
    converging on identical values, parquet and ORC alike."""
    import glob

    from bigdata_meteo_datalake_spark.operators.orc_data import (
        decode_orc_column,
    )
    from bigdata_meteo_datalake_spark.operators.parquet_pages import (
        decode_parquet_column,
    )

    df = spark.range(0, 2750).selectExpr(
        "CASE WHEN id % 7 = 3 THEN NULL ELSE id * 37 - 5000 END AS v")
    (df.coalesce(1).write.mode("overwrite")
     .option("compression", "snappy")
     .parquet(str(tmp_path / "pq")))
    pf = glob.glob(str(tmp_path / "pq") + "/*.parquet")[0]
    got = decode_parquet_column(open(pf, "rb").read(), "v")["values"]
    want = [r["v"] for r in spark.read.parquet(str(tmp_path / "pq"))
            .orderBy("v").collect()]
    assert sorted((g for g in got if g is not None)) == \
        [w for w in want if w is not None]
    assert got.count(None) == sum(1 for w in want if w is None)

    (df.coalesce(1).write.mode("overwrite")
     .option("compression", "zlib").orc(str(tmp_path / "orc")))
    of = glob.glob(str(tmp_path / "orc") + "/*.orc")[0]
    got = decode_orc_column(open(of, "rb").read(), "v")["values"]
    want = [r["v"] for r in spark.read.orc(str(tmp_path / "orc"))
            .orderBy("v").collect()]
    assert sorted((g for g in got if g is not None)) == \
        [w for w in want if w is not None]
    assert got.count(None) == sum(1 for w in want if w is None)


# --- CBOR (operators/cbor.py) ------------------------------------------------------------


_CBOR_VALUES = st.recursive(
    st.none() | st.booleans()
    | st.integers(min_value=-(1 << 64), max_value=(1 << 64) - 1)
    | st.floats(allow_nan=False)
    | st.text(max_size=12) | st.binary(max_size=12),
    lambda children: st.lists(children, max_size=4)
    | st.dictionaries(st.text(max_size=6), children, max_size=4),
    max_leaves=20,
)


@_S
@given(_CBOR_VALUES)
def test_cbor_roundtrip_generated(v):
    """Any JSON-shaped value (64-bit-extreme ints, arbitrary unicode,
    bytes, nesting) roundtrips through the deterministic encoder and
    the CANONICAL decoder — so the encoder emits only minimal forms."""
    from bigdata_meteo_datalake_spark.operators.cbor import (
        decode_cbor,
        encode_cbor,
    )

    got = decode_cbor(encode_cbor(v), canonical=True)
    assert got == v or (isinstance(v, float) and got == v)


def test_cbor_rfc_vectors():
    """Pinned to RFC 8949 appendix A examples, including the half-float
    ladder (subnormal minimum, infinity) and the argument widths."""
    from bigdata_meteo_datalake_spark.operators.cbor import (
        decode_cbor,
        encode_cbor,
    )

    vecs = {
        bytes.fromhex("00"): 0,
        bytes.fromhex("17"): 23,
        bytes.fromhex("1818"): 24,
        bytes.fromhex("1903e8"): 1000,
        bytes.fromhex("1a000f4240"): 1000000,
        bytes.fromhex("1b000000e8d4a51000"): 1000000000000,
        bytes.fromhex("20"): -1,
        bytes.fromhex("3863"): -100,
        bytes.fromhex("f90001"): 5.960464477539063e-8,
        bytes.fromhex("f97c00"): float("inf"),
        bytes.fromhex("fa47c35000"): 100000.0,
        bytes.fromhex("fb7e37e43c8800759c"): 1.0e300,
        bytes.fromhex("f4"): False,
        bytes.fromhex("f6"): None,
        bytes.fromhex("6449455446"): "IETF",
        bytes.fromhex("83010203"): [1, 2, 3],
        bytes.fromhex("a26161016162820203"): {"a": 1, "b": [2, 3]},
    }
    for raw, want in vecs.items():
        assert decode_cbor(raw) == want, raw.hex()
    # encoder minimality against the same vectors (where types match)
    assert encode_cbor(1000) == bytes.fromhex("1903e8")
    assert encode_cbor(-100) == bytes.fromhex("3863")
    assert encode_cbor([1, 2, 3]) == bytes.fromhex("83010203")


def test_cbor_rejections():
    from bigdata_meteo_datalake_spark.operators.cbor import decode_cbor

    with pytest.raises(ValueError, match="empty"):
        decode_cbor(b"")
    with pytest.raises(ValueError, match="trailing"):
        decode_cbor(bytes.fromhex("0000"))
    with pytest.raises(ValueError, match="truncated"):
        decode_cbor(bytes.fromhex("19"))
    with pytest.raises(ValueError, match="overruns"):
        decode_cbor(bytes.fromhex("6449455446")[:-1])
    # non-minimal argument under canonical mode (24 encoded in 2 bytes)
    decode_cbor(bytes.fromhex("190018"))
    with pytest.raises(ValueError, match="non-minimal"):
        decode_cbor(bytes.fromhex("190018"), canonical=True)
    with pytest.raises(NotImplementedError, match="indefinite"):
        decode_cbor(bytes.fromhex("9f01ff"))
    with pytest.raises(ValueError, match="duplicate"):
        decode_cbor(bytes.fromhex("a2616101616102"))  # {"a":1,"a":2}
    with pytest.raises(ValueError, match="non-text map key"):
        decode_cbor(bytes.fromhex("a10102"))  # {1: 2}
    with pytest.raises(NotImplementedError, match="tag"):
        decode_cbor(bytes.fromhex("d81e820102"))  # tag 30
    with pytest.raises(ValueError, match="invalid utf-8"):
        decode_cbor(b"\x62\xff\xfe")
    with pytest.raises(ValueError, match="break"):
        decode_cbor(b"\xff")


def test_cbor_canonical_map_key_order():
    """RFC 8949 section 4.2.1: canonical mode enforces bytewise-sorted
    ENCODED map keys (length-first for short text keys) — non-canonical
    decoding stays permissive; the encoder emits sorted keys
    (ADVICE r12)."""
    from bigdata_meteo_datalake_spark.operators.cbor import (
        decode_cbor,
        encode_cbor,
    )

    unsorted_ab = bytes.fromhex("a2616201616102")  # {"b":1,"a":2}
    assert decode_cbor(unsorted_ab) == {"b": 1, "a": 2}
    with pytest.raises(ValueError, match="canonical"):
        decode_cbor(unsorted_ab, canonical=True)
    # length-first: encoded "b" (0x6162) sorts before "aa" (0x626161)
    long_first = bytes.fromhex("a262616101616202")  # {"aa":1,"b":2}
    assert decode_cbor(long_first) == {"aa": 1, "b": 2}
    with pytest.raises(ValueError, match="canonical"):
        decode_cbor(long_first, canonical=True)
    assert decode_cbor(bytes.fromhex("a261620262616101"),
                       canonical=True) == {"b": 2, "aa": 1}
    # the encoder now emits the deterministic order
    assert encode_cbor({"aa": 1, "b": 2}) == \
        bytes.fromhex("a2616202626161" + "01")
    assert decode_cbor(encode_cbor({"zz": 1, "a": 2, "mm": 3}),
                       canonical=True) == {"zz": 1, "a": 2, "mm": 3}


@_S
@given(st.binary(min_size=0, max_size=200))
def test_cbor_never_leaks_on_garbage(blob):
    from bigdata_meteo_datalake_spark.operators.cbor import decode_cbor

    try:
        decode_cbor(blob, canonical=True)
    except (ValueError, NotImplementedError):
        pass


@_S
@given(st.data())
def test_cbor_never_leaks_on_mutations(data):
    from bigdata_meteo_datalake_spark.operators.cbor import (
        decode_cbor,
        encode_cbor,
    )

    base = encode_cbor([{"id": 7, "name": "ev", "tags": ["a", "b"],
                         "blob": b"\x01\x02", "ok": True, "x": -5,
                         "f": 1.5, "n": None}])
    blob = bytearray(base)
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
        decode_cbor(bytes(blob), canonical=True)
    except (ValueError, NotImplementedError):
        pass
