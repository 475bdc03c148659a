"""Hypothesis property tests for the round-11 parsers: the Ogg and
EBML writer/parser pairs must roundtrip on GENERATED inputs (not just
the fixture closed forms), the thrift footer reader must agree with
pyarrow on generated tables, and the quality-classifier fold must
equal a hand-computed reference on arbitrary token lists."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

# deadlines off: first-call JIT (Spark-free here, but duckdb/pyarrow
# imports and table writes inside examples trip the 200ms default)
_S = settings(deadline=None, max_examples=50)


@_S
@given(
    st.lists(st.integers(min_value=0, max_value=1200), min_size=1,
             max_size=8),
    st.integers(min_value=0, max_value=75_000),
    st.sampled_from(["vorbis", "opus"]),
    st.integers(min_value=1, max_value=3),
    st.lists(st.text(min_size=0, max_size=12), min_size=0, max_size=4),
)
def test_ogg_roundtrip_generated(sizes, big, codec, per_page, comments):
    """Any packet-size list (0-byte, sub-255, multi-segment — and,
    when ``big`` exceeds ~65 KB, a packet whose group overflows 255
    lacing values and takes the general multi-page spanning path:
    terminal-255 pages, continued flags, granule -1) and any comment
    list roundtrips: packet payloads, counts, page accounting, and
    duration all reconstruct."""
    from bigdata_meteo_datalake_spark.operators.ogg import (
        build_ogg,
        parse_ogg,
    )

    if big:
        sizes = [big] + sizes
    pkts = [bytes((i + j) % 256 for j in range(n))
            for i, n in enumerate(sizes)]
    blob = build_ogg(
        codec=codec, channels=2,
        sample_rate=16000 if codec == "vorbis" else 48000,
        audio_packets=pkts, samples_per_packet=320,
        comments=comments, packets_per_page=per_page,
    )
    r = parse_ogg(blob)
    n_headers = 3 if codec == "vorbis" else 2
    assert r["n_packets"] == len(pkts) + n_headers
    assert r["payload_bytes"] == sum(sizes)
    assert r["comments"] == comments
    assert r["has_eos"] is True
    if codec == "vorbis":
        assert r["duration_ms"] == 320 * len(pkts) * 1000 // 16000
    else:
        assert r["duration_ms"] == 320 * len(pkts) * 1000 // 48000


@_S
@given(
    st.integers(min_value=0, max_value=10_000_000),
    st.integers(min_value=0, max_value=8000),
    st.integers(min_value=0, max_value=4000),
    st.integers(min_value=0, max_value=8),
    st.booleans(),
    st.booleans(),
    st.text(min_size=0, max_size=20),
)
def test_mkv_roundtrip_generated(dur, w, h, nclus, unk_seg, unk_clus, app):
    """Any (duration, dimensions, cluster count, framing, writing app)
    combination roundtrips through build_mkv/parse_mkv, across all four
    size-layout combinations."""
    from bigdata_meteo_datalake_spark.operators.mkv import (
        build_mkv,
        parse_mkv,
    )

    blob = build_mkv(
        doc_type="webm", duration_ms=dur, video_codec="V_VP9",
        width=w, height=h, audio_codec="A_OPUS", channels=2,
        sampling_hz=48000, writing_app=app,
        cluster_timestamps_ms=[17 * j for j in range(nclus)],
        blocks_per_cluster=1, unknown_size_segment=unk_seg,
        unknown_size_clusters=unk_clus,
    )
    r = parse_mkv(blob)
    assert r["duration_ms"] == dur
    assert (r["width"], r["height"]) == (w, h)
    assert r["n_clusters"] == nclus and r["n_blocks"] == nclus
    assert r["last_cluster_ms"] == (17 * (nclus - 1) if nclus else 0)
    assert r["writing_app"] == app
    assert r["n_tracks"] == 2


@_S
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**31), max_value=2**31 - 1),
            st.one_of(
                st.none(),
                st.floats(allow_nan=False, allow_infinity=False, width=64,
                          min_value=-1e12, max_value=1e12),
            ),
        ),
        min_size=0, max_size=200,
    ),
    st.integers(min_value=64, max_value=4096),
)
def test_parquet_footer_agrees_with_pyarrow(rows, rg_size):
    """The thrift footer reader agrees with pyarrow on GENERATED
    tables (arbitrary int/double data WITH NULLS, arbitrary row-group
    sizes, empty and all-null tables included): row counts, row-group
    counts, per-chunk null counts, and exact fixed-width min/max."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from bigdata_meteo_datalake_spark.operators.parquet_footer import (
        read_footer_from_path,
    )

    tbl = pa.table({
        "k": pa.array([r[0] for r in rows], type=pa.int64()),
        "v": pa.array([r[1] for r in rows], type=pa.float64()),
    })
    with tempfile.TemporaryDirectory() as tmp:
        p = os.path.join(tmp, "t.parquet")
        pq.write_table(tbl, p, row_group_size=rg_size)
        mine = read_footer_from_path(p)
        ref = pq.ParquetFile(p).metadata
    assert mine["num_rows"] == ref.num_rows == len(rows)
    assert mine["n_row_groups"] == ref.num_row_groups
    # null accounting vs pyarrow, chunk for chunk
    byrg = {(c["row_group"], c["path"]): c for c in mine["columns"]}
    for g in range(ref.num_row_groups):
        rg = ref.row_group(g)
        for i in range(rg.num_columns):
            rc = rg.column(i)
            st_ = rc.statistics
            if st_ is not None and st_.has_null_count:
                assert byrg[(g, rc.path_in_schema)]["null_count"] \
                    == st_.null_count
    vals = [r[1] for r in rows if r[1] is not None]
    # (an empty table's single 0-row chunk carries no statistics at
    # all — its None null_count counts as 0 here)
    assert sum(c["null_count"] or 0 for c in mine["columns"]
               if c["path"] == "v") == len(rows) - len(vals)
    if rows:
        ks = [c for c in mine["columns"] if c["path"] == "k"]
        assert min(c["min_value"] for c in ks) == min(r[0] for r in rows)
        assert max(c["max_value"] for c in ks) == max(r[0] for r in rows)
    if vals:
        vs = [c for c in mine["columns"] if c["path"] == "v"
              and c["min_value"] is not None]
        assert min(c["min_value"] for c in vs) == min(vals)
        assert max(c["max_value"] for c in vs) == max(vals)
    if not rows:
        assert "k" in mine["schema_names"] and "v" in mine["schema_names"]


@_S
@given(
    st.lists(st.text(alphabet="abcXYZ", min_size=1, max_size=6),
             min_size=1, max_size=30),
    st.lists(st.sampled_from([" ", "  ", "\t", "\n", " \t "]),
             min_size=0, max_size=30),
)
def test_quality_classifier_fold_matches_reference(tokens, seps):
    """The in-row hashed-linear fold equals a plain-python reference
    (same md5-prefix hash, same weight table, same bigram rule, and
    the SAME lower()/trim()/whitespace-collapse tokenizer) on
    arbitrary mixed-case tokens joined by arbitrary whitespace —
    checked through DuckDB so the ORACLE expression itself is the
    thing property-tested."""
    import hashlib

    import duckdb

    from bigdata_meteo_datalake_spark.queries.ext_selection import (
        _QC_DIM,
        _QC_ORACLE,
        _QC_WEIGHTS,
    )

    def th(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    # the oracle tokenizer lowercases, trims, and splits on whitespace
    # runs — the reference must apply the same normalization
    norm = [t.lower() for t in tokens]
    feats = list(norm) + [f"{a} {b}" for a, b in zip(norm, norm[1:])]
    want_score = sum(_QC_WEIGHTS[th(f) % _QC_DIM] for f in feats)
    seps = (seps + [" "] * len(tokens))[: len(tokens) - 1]
    text = "  " + "".join(
        t + s for t, s in zip(tokens, seps + [""])
    ) + "\t"
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.execute("INSERT INTO documents VALUES (0, ?)", [text])
    got = con.execute(_QC_ORACLE).fetchall()
    con.close()
    assert len(got) == 1
    _, n_features, score, admitted = got[0]
    assert n_features == len(feats)
    assert score == want_score
    assert admitted == (score * 1000 >= 25 * n_features)


@_S
@given(
    st.sampled_from(["vp8", "vp8l", "vp8x"]),
    st.integers(min_value=1, max_value=0x3FFF),
    st.integers(min_value=1, max_value=0x3FFF),
    st.booleans(),
    st.booleans(),
    st.integers(min_value=1, max_value=6),
    st.booleans(),
    st.booleans(),
    st.booleans(),
)
def test_webp_roundtrip_generated(layout, w, h, alpha, animated, nf,
                                  icc, exif, xmp):
    """Any (layout, 14-bit dims, alpha/animation/metadata combination)
    roundtrips through build_webp/parse_webp with flags and chunk
    counts consistent."""
    from bigdata_meteo_datalake_spark.operators.webp import (
        build_webp,
        parse_webp,
    )

    animated = animated and layout == "vp8x"
    r = parse_webp(build_webp(
        layout=layout, width=w, height=h,
        alpha=alpha and not animated, animated=animated, n_frames=nf,
        icc=icc and layout == "vp8x", exif=exif and layout == "vp8x",
        xmp=xmp and layout == "vp8x",
    ))
    assert r["format"] == layout
    assert (r["width"], r["height"]) == (w, h)
    assert r["n_frames"] == (nf if animated else 1)
    if layout == "vp8x":
        assert r["has_icc"] == icc and r["has_exif"] == exif
        assert r["has_xmp"] == xmp
        assert r["is_animated"] == animated
    if layout != "vp8":
        assert r["has_alpha"] == (alpha and not animated)


_FUZZ_BLOBS: dict | None = None


def _fuzz_fixture_blobs():
    """One valid blob per fuzzed parser (round-11 formats plus the
    round-10 document parsers the same campaign was extended to —
    which is how the parse_eml LookupError/AttributeError leaks were
    found). Deterministic, so built ONCE and memoized — the mutation
    property calls this per example, and mutations copy the blob."""
    global _FUZZ_BLOBS
    if _FUZZ_BLOBS is not None:
        return _FUZZ_BLOBS
    from bigdata_meteo_datalake_spark.operators.id3 import build_id3v2
    from bigdata_meteo_datalake_spark.operators.mime import build_eml
    from bigdata_meteo_datalake_spark.operators.mkv import build_mkv
    from bigdata_meteo_datalake_spark.operators.mp3 import (
        build_mp3_frames,
    )
    from bigdata_meteo_datalake_spark.operators.ogg import build_ogg
    from bigdata_meteo_datalake_spark.operators.pdf import build_pdf
    from bigdata_meteo_datalake_spark.operators.safetensors import (
        build_safetensors,
    )
    from bigdata_meteo_datalake_spark.operators.tfrecord import (
        write_tfrecord,
    )
    from bigdata_meteo_datalake_spark.operators.webp import build_webp
    from bigdata_meteo_datalake_spark.operators.zipshard import (
        write_zip_shard,
    )

    return {
        "ogg": build_ogg(codec="opus", channels=1, sample_rate=48000,
                         audio_packets=[bytes(300), bytes(20)],
                         samples_per_packet=960, comments=["k=v"]),
        "mkv": build_mkv(doc_type="webm", duration_ms=1234,
                         cluster_timestamps_ms=[0, 40]),
        "webp": build_webp(layout="vp8x", width=33, height=21,
                           animated=True, n_frames=2, exif=True),
        "pdf": build_pdf([["hello world"]], compress=True),
        "mp3": build_mp3_frames(
            version=1, bitrate_indices=[5, 6], xing_frames=2,
            id3_tag=build_id3v2(version=3, title="T")),
        "tfrecord": write_tfrecord([b"abc", b"defgh"]),
        "eml": build_eml(from_addr="a@b.c", subject="S\u00fc",
                         body="hello", encoding="base64"),
        "zip": write_zip_shard(
            [{"key": "k0", "txt": b"hello", "bin": b"\x00\x01"}]),
        "safetensors": build_safetensors(
            [{"name": "w", "dtype": "F32", "shape": [2, 3]}]),
    }
    _FUZZ_BLOBS = blobs
    return blobs


@_S
@given(st.binary(min_size=0, max_size=400))
def test_round11_parsers_never_leak_on_garbage(blob):
    """Arbitrary bytes through every round-11 parser either parse or
    raise the CONTRACTED exception (ValueError family) — never
    IndexError/struct.error/KeyError/OverflowError. The fail-loud
    contract is only loud if the exception type is the promised one."""
    from bigdata_meteo_datalake_spark.operators.mime import parse_eml
    from bigdata_meteo_datalake_spark.operators.mkv import parse_mkv
    from bigdata_meteo_datalake_spark.operators.mp3 import (
        parse_mp3_frames,
    )
    from bigdata_meteo_datalake_spark.operators.ogg import parse_ogg
    from bigdata_meteo_datalake_spark.operators.parquet_footer import (
        read_parquet_footer,
    )
    from bigdata_meteo_datalake_spark.operators.pdf import extract_pdf_text
    from bigdata_meteo_datalake_spark.operators.tfrecord import (
        read_tfrecord,
    )
    from bigdata_meteo_datalake_spark.operators.webp import parse_webp

    for parse in (parse_ogg, parse_mkv, parse_webp, read_parquet_footer,
                  extract_pdf_text, parse_mp3_frames, read_tfrecord,
                  parse_eml):
        try:
            parse(blob)
        except (ValueError, NotImplementedError):
            pass


@_S
@given(st.data())
def test_round11_parsers_never_leak_on_mutations(data):
    """Byte-flip mutations of VALID files (which reach far deeper
    parser states than random garbage) hold the same exception
    contract, and when a mutation happens to still parse, the result
    is a plain value (no partial/poisoned state escapes)."""
    from bigdata_meteo_datalake_spark.operators.mime import parse_eml
    from bigdata_meteo_datalake_spark.operators.mkv import parse_mkv
    from bigdata_meteo_datalake_spark.operators.mp3 import (
        parse_mp3_frames,
    )
    from bigdata_meteo_datalake_spark.operators.ogg import parse_ogg
    from bigdata_meteo_datalake_spark.operators.pdf import extract_pdf_text
    from bigdata_meteo_datalake_spark.operators.safetensors import (
        parse_safetensors,
    )
    from bigdata_meteo_datalake_spark.operators.tfrecord import (
        read_tfrecord,
    )
    from bigdata_meteo_datalake_spark.operators.webp import parse_webp
    from bigdata_meteo_datalake_spark.operators.zipshard import (
        read_zip_shard,
    )

    blobs = _fuzz_fixture_blobs()
    parsers = {"ogg": parse_ogg, "mkv": parse_mkv, "webp": parse_webp,
               "pdf": extract_pdf_text, "mp3": parse_mp3_frames,
               "tfrecord": read_tfrecord, "eml": parse_eml,
               "zip": read_zip_shard, "safetensors": parse_safetensors}
    kind = data.draw(st.sampled_from(sorted(blobs)))
    blob = bytearray(blobs[kind])
    for _ in range(data.draw(st.integers(min_value=1, max_value=4))):
        pos = data.draw(st.integers(min_value=0, max_value=len(blob) - 1))
        blob[pos] ^= data.draw(st.integers(min_value=1, max_value=255))
    try:
        r = parsers[kind](bytes(blob))
    except (ValueError, NotImplementedError):
        return
    assert r is not None


def test_jsonl_gzip_deflate_corruption_contract():
    """decompress_jsonl's gzip arm: DEFLATE-stream corruption (which
    the stdlib surfaces as raw zlib.error, unlike header corruption's
    BadGzipFile/OSError) raises the contracted ValueError — pinned via
    a saved mutation-fuzz example shape: valid gzip header, mangled
    deflate block type bits."""
    import pytest

    from bigdata_meteo_datalake_spark.operators.web import (
        compress_jsonl,
        decompress_jsonl,
    )

    import gzip as _gzip
    import zlib as _zlib

    blob = bytearray(compress_jsonl([{"a": 1}], codec="gzip"))
    # gzip.compress(mtime=0) emits a 10-byte header, so index 10 is
    # the FIRST deflate byte — flipping it provably raises raw
    # zlib.error (flipping byte 11 instead decompresses fully and
    # fails the CRC as BadGzipFile, the path that was already caught)
    blob[10] ^= 0xFF
    with pytest.raises(_zlib.error):
        _gzip.decompress(bytes(blob))
    with pytest.raises(ValueError, match="corrupt compressed shard"):
        decompress_jsonl(bytes(blob))
