"""Hypothesis property tests for the round-10 parsers: every
writer/parser pair must roundtrip on GENERATED inputs (not just the
fixture closed forms), and the low-level grammars (varints, literal
strings, chunked framing, From-munging) must survive adversarial
content."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

# keep deadlines off: first-call JIT (zlib dictionaries, numpy import)
# inside examples trips the default 200ms budget spuriously
_S = settings(deadline=None, max_examples=60)


@_S
@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                min_size=1, max_size=20))
def test_varint_int64_roundtrip(values):
    """Any int64 list survives the packed-varint path (10-byte
    negatives included)."""
    from bigdata_meteo_datalake_spark.operators.tfrecord import (
        encode_example,
        parse_example,
    )

    ex = encode_example({"v": values})
    assert parse_example(ex)["v"] == ("int64", values)


@_S
@given(st.lists(st.binary(min_size=0, max_size=64), min_size=1,
                max_size=10))
def test_tfrecord_framing_roundtrip(payload_list):
    """Arbitrary byte payloads roundtrip through TFRecord framing with
    both CRCs intact."""
    from bigdata_meteo_datalake_spark.operators.tfrecord import (
        read_tfrecord,
        write_tfrecord,
    )

    assert read_tfrecord(write_tfrecord(payload_list)) == payload_list


@_S
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=255,
                                      exclude_characters="\x7f"),
               min_size=0, max_size=80))
def test_pdf_literal_string_roundtrip(s):
    """Any cp1252-encodable text survives the PDF literal-string
    escape grammar and WinAnsi decoding (parens, backslashes, and
    high bytes included)."""
    try:
        s.encode("cp1252")
    except UnicodeEncodeError:
        return  # cp1252 leaves five holes in 0x80-0x9F; out of scope
    from bigdata_meteo_datalake_spark.operators.pdf import (
        build_pdf,
        extract_pdf_text,
    )

    got = extract_pdf_text(build_pdf([[s]]))["text"]
    assert got == s


@_S
@given(st.lists(st.binary(min_size=0, max_size=200), min_size=1,
                max_size=8))
def test_http_chunked_roundtrip(chunks):
    """Any LEGAL chunking of any body dechunks back to the
    concatenation (a zero-size chunk is the RFC terminator, so empty
    chunks cannot appear mid-stream and are skipped when building the
    wire)."""
    from bigdata_meteo_datalake_spark.operators.web import _dechunk

    legal = [c for c in chunks if c]
    wire = b"".join(
        f"{len(c):x}".encode() + b"\r\n" + c + b"\r\n" for c in legal
    ) + b"0\r\n\r\n"
    assert _dechunk(wire) == b"".join(legal)


@_S
@given(st.lists(
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=0, max_size=40).map(lambda s: s.rstrip()),
    min_size=1, max_size=8))
def test_mbox_from_munging_roundtrip(lines):
    """Message bodies full of 'From '/'>From ' lines roundtrip through
    mboxrd munging."""
    from bigdata_meteo_datalake_spark.operators.mime import (
        build_eml,
        build_mbox,
        parse_eml,
        split_mbox,
    )

    body = "\n".join(lines) or "x"
    # parse_eml strips ONE trailing newline by design; a body whose
    # last line is empty is indistinguishable on the wire, so
    # normalize the expectation the same way
    msg = build_eml(from_addr="a@b.c", subject="s", body=body,
                    encoding="quoted-printable")
    back = split_mbox(build_mbox([msg, msg]))
    assert len(back) == 2
    want = parse_eml(msg)["text"]
    for m in back:
        assert parse_eml(m)["text"] == want


@_S
@given(st.lists(st.tuples(
    st.text(alphabet="abcdefgh", min_size=1, max_size=6),
    st.binary(min_size=0, max_size=120),
    st.sampled_from([0, 8]),
), min_size=1, max_size=6, unique_by=lambda t: t[0]))
def test_zip_shard_roundtrip_property(members):
    """Arbitrary (stem, payload, method) member sets roundtrip through
    ZIP shards byte-exact with methods preserved."""
    from bigdata_meteo_datalake_spark.operators.zipshard import (
        read_zip_shard,
        write_zip_shard,
    )

    samples = [{"key": stem, "bin": payload, "methods": {"bin": m}}
               for stem, payload, m in members]
    back = read_zip_shard(write_zip_shard(samples))
    assert [s["key"] for s in back] == [m[0] for m in members]
    for s, (stem, payload, m) in zip(back, members):
        assert s["bin"] == payload
        # stored-method declared; the library may keep deflate for
        # empty payloads identical either way — method must match what
        # was REQUESTED
        assert s["methods"]["bin"] == m


@_S
@given(st.dictionaries(
    st.text(alphabet="abcdefgh", min_size=1, max_size=5),
    st.one_of(
        st.lists(st.integers(-(2**31), 2**31 - 1), min_size=1, max_size=5),
        st.lists(st.binary(min_size=0, max_size=20), min_size=1,
                 max_size=4),
    ),
    min_size=1, max_size=5))
def test_example_feature_map_roundtrip(features):
    """Arbitrary int64/bytes feature maps roundtrip through the
    Example wire format with names and kinds intact."""
    from bigdata_meteo_datalake_spark.operators.tfrecord import (
        encode_example,
        parse_example,
    )

    parsed = parse_example(encode_example(features))
    assert set(parsed) == set(features)
    for name, values in features.items():
        kind, got = parsed[name]
        assert got == values
        assert kind == ("bytes" if isinstance(values[0], bytes)
                        else "int64")


@_S
@given(st.lists(st.tuples(
    st.sampled_from(["F32", "F16", "I64", "U8"]),
    st.lists(st.integers(0, 5), min_size=0, max_size=3),
), min_size=1, max_size=5))
def test_safetensors_roundtrip_property(specs):
    """Arbitrary dtype/shape inventories roundtrip through the
    safetensors header with exact param/byte accounting."""
    from bigdata_meteo_datalake_spark.operators.safetensors import (
        DTYPE_SIZES,
        build_safetensors,
        parse_safetensors,
    )

    tensors = [{"name": f"t{i}", "dtype": d, "shape": sh}
               for i, (d, sh) in enumerate(specs)]
    r = parse_safetensors(build_safetensors(tensors))
    assert len(r["tensors"]) == len(tensors)
    by_name = {t["name"]: t for t in r["tensors"]}
    for i, (d, sh) in enumerate(specs):
        t = by_name[f"t{i}"]
        n = 1
        for x in sh:
            n *= x
        assert (t["dtype"], t["shape"], t["n_params"]) == (d, sh, n)
        assert t["n_bytes"] == n * DTYPE_SIZES[d]


def test_crc32c_published_vectors():
    """The table-driven CRC matches the PUBLISHED iSCSI/RFC 3720 test
    vectors, not just the single check value — these pin polynomial,
    reflection, init, and final-xor independently."""
    from bigdata_meteo_datalake_spark.operators.tfrecord import crc32c

    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA          # 32 x 0x00
    assert crc32c(b"\xff" * 32) == 0x62A8AB43       # 32 x 0xFF
    assert crc32c(bytes(range(32))) == 0x46DD794E   # 0x00..0x1F
    assert crc32c(b"") == 0


@_S
@given(st.binary(min_size=1, max_size=300),
       st.integers(min_value=0, max_value=299),
       st.integers(min_value=1, max_value=255))
def test_crc32c_flip_sensitivity(data, pos, xor):
    """Flipping any byte anywhere changes the CRC (single-error
    detection, guaranteed for CRCs on messages shorter than the
    polynomial's period)."""
    from bigdata_meteo_datalake_spark.operators.tfrecord import crc32c

    pos %= len(data)
    flipped = data[:pos] + bytes([data[pos] ^ xor]) + data[pos + 1:]
    assert crc32c(flipped) != crc32c(data)
