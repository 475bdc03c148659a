"""Regression tests for the four round-11 ADVICE findings (all in the
container parsers): corrupt negative Ogg granules, bare-name collisions
in the parquet footer's repetition map, a missing mandatory EBML
DocType, and an unpadded odd-sized tail chunk in a RIFF/WebP walk."""

from __future__ import annotations

import struct

import pytest


# --- ogg: granule positions below -1 are corrupt, not data ---------------------------


def _last_page_split(blob: bytes) -> tuple[bytes, bytes]:
    pos = blob.rfind(b"OggS")
    assert pos > 0
    return blob[:pos], blob[pos:]


def test_ogg_negative_granule_raises():
    """RFC 3533 gives -1 one meaning (no packet ends on the page); any
    other negative granule previously flowed into a negative
    duration_ms — it must raise instead."""
    from bigdata_meteo_datalake_spark.operators.ogg import (
        build_ogg,
        ogg_crc,
        parse_ogg,
    )

    blob = build_ogg(
        codec="opus", channels=2, sample_rate=48000,
        audio_packets=[b"\x01" * 40, b"\x02" * 40],
        samples_per_packet=960, comments=["a=b"],
    )
    assert parse_ogg(blob)["duration_ms"] >= 0  # fixture is valid

    prefix, page = _last_page_split(blob)
    patched = bytearray(page)
    struct.pack_into("<q", patched, 6, -5)
    struct.pack_into("<I", patched, 22, 0)
    struct.pack_into("<I", patched, 22, ogg_crc(bytes(patched)))
    with pytest.raises(ValueError, match="granule"):
        parse_ogg(prefix + bytes(patched))


def test_ogg_nopacket_granule_still_legal():
    """-1 itself stays legal (multi-page spanning packets emit it)."""
    from bigdata_meteo_datalake_spark.operators.ogg import build_ogg, parse_ogg

    blob = build_ogg(
        codec="opus", channels=2, sample_rate=48000,
        audio_packets=[b"\x03" * 70_000],  # spans pages -> granule -1 pages
        samples_per_packet=960, comments=[],
    )
    assert parse_ogg(blob)["n_packets"] == 3


# --- parquet footer: repetition map keyed on top-level children only -----------------


def _el(name: str, repetition: int | None, num_children: int = 0) -> dict:
    e: dict = {4: name.encode()}
    if repetition is not None:
        e[3] = repetition
    if num_children:
        e[5] = num_children
    return e


def test_repetition_map_ignores_nested_name_collisions():
    """A nested element named like a top-level leaf must NOT overwrite
    the leaf's repetition_type (the old bare-name map let a REPEATED
    nested 'x' exempt the flat top-level 'x' from the
    num_values == row-group-rows accounting, and vice versa)."""
    from bigdata_meteo_datalake_spark.operators.parquet_footer import (
        _top_level_repetition,
    )

    schema = [
        _el("root", None, 2),
        _el("x", 1),                 # top-level OPTIONAL leaf
        _el("lst", 1, 1),            # top-level group
        _el("x", 2),                 # nested REPEATED leaf, same name
    ]
    rep = _top_level_repetition(schema)
    assert rep == {"x": 1, "lst": 1}


def test_repetition_map_rejects_malformed_trees():
    from bigdata_meteo_datalake_spark.operators.parquet_footer import (
        _top_level_repetition,
    )

    # more elements than the num_children tree accounts for
    with pytest.raises(ValueError, match="num_children"):
        _top_level_repetition([_el("root", None, 1), _el("a", 1), _el("b", 1)])
    # fewer (truncated tree)
    with pytest.raises(ValueError, match="truncated"):
        _top_level_repetition([_el("root", None, 2), _el("a", 1)])


def test_footer_accounting_with_nested_name_collision_file(tmp_path):
    """End-to-end: a real parquet file whose list column's inner field
    shares a top-level column's name still parses, and the flat column
    keeps its accounting check."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bigdata_meteo_datalake_spark.operators.parquet_footer import (
        read_footer_from_path,
    )

    t = pa.table({
        "x": pa.array([1, 2, 3], pa.int64()),
        "lst": pa.array([[1], [2, 3], []],
                        pa.list_(pa.field("x", pa.int64()))),
    })
    p = tmp_path / "collide.parquet"
    pq.write_table(t, p)
    r = read_footer_from_path(str(p))
    assert r["num_rows"] == 3


# --- mkv: DocType is mandatory (RFC 8794) ---------------------------------------------


def test_mkv_missing_doctype_raises():
    from bigdata_meteo_datalake_spark.operators.mkv import parse_mkv

    # EBML header with only a DocTypeVersion child — no DocType
    body = bytes([0x42, 0x87, 0x81, 0x01])
    blob = b"\x1a\x45\xdf\xa3" + bytes([0x80 | len(body)]) + body
    with pytest.raises(ValueError, match="DocType"):
        parse_mkv(blob)


# --- webp: odd-sized chunk must carry its RIFF pad byte -------------------------------


def test_webp_unpadded_odd_tail_raises():
    from bigdata_meteo_datalake_spark.operators.webp import (
        build_webp,
        parse_webp,
    )

    blob = build_webp(layout="vp8x", width=20, height=10, exif=True)
    assert parse_webp(blob)["has_exif"] is True  # padded fixture is valid

    # append an unknown odd-sized chunk WITHOUT its pad byte and fix
    # the RIFF size: the walker must reject the unpadded tail
    extra = b"JUNK" + struct.pack("<I", 3) + b"abc"
    bad = bytearray(blob + extra)
    struct.pack_into("<I", bad, 4, len(bad) - 8)
    with pytest.raises(ValueError, match="pad byte"):
        parse_webp(bytes(bad))

    # the same chunk WITH its pad byte walks clean
    ok = bytearray(blob + extra + b"\x00")
    struct.pack_into("<I", ok, 4, len(ok) - 8)
    parse_webp(bytes(ok))
