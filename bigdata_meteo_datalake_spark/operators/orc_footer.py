"""ORC postscript/footer reader — the protobuf twin of the thrift
reader in operators/parquet_footer.py, for Hive-estate audits, all
stdlib, from the PUBLIC Apache ORC specification (orc_proto.proto):

1. File tail: the LAST byte is the postscript length; the postscript
   (never compressed) is a protobuf message carrying footerLength,
   the compression kind, and the "ORC" magic as field 8000. The
   footer sits immediately before it, compressed as an ORC stream.

2. ORC streams are CHUNKED: each chunk has a 3-byte little-endian
   header ``(length << 1) | isOriginal`` followed by the chunk bytes
   — raw when the original bit is set, codec-compressed otherwise.
   ZLIB is raw RFC 1951; SNAPPY reuses the hand-rolled block decoder
   from operators/avro_ocf.py (no CRC suffix here) — and since
   Spark's ORC writer defaults to snappy, every Spark-written file is
   a FOREIGN interop vector for that decoder. LZO/LZ4/ZSTD raise
   NotImplementedError as declared boundaries (no libraries
   in-container; the zstd/LZ4 FRAME probes live in the sniffer).

3. Protobuf wire walk: varints (64-bit bounded), zigzag sint64s
   (IntegerStatistics min/max), fixed64 doubles (DoubleStatistics),
   length-delimited submessages, BOTH packed and unpacked repeated
   uint32s (Type.subtypes), unknown fields skipped per wire type,
   deprecated group wire types rejected — the same posture as the
   tf.train.Example parser in operators/tfrecord.py.

4. Zone-map trust accounting: stripe row counts must sum to the
   footer's numberOfRows, the statistics list must align with the
   type tree, the root type must be a STRUCT whose fieldNames pair
   with its subtypes, and per-column numberOfValues may not exceed
   the row count — a footer that lies about its own accounting
   raises, exactly like the parquet twin.

Reference parity note: the reference repo has no columnar-footer layer
(SURVEY.md section 4); sources/lake.py already writes ORC, and this
audit closes the read-back loop on its metadata.
"""

from __future__ import annotations

import struct
import zlib

__all__ = ["read_orc_footer", "read_orc_footer_from_path",
           "orc_footer_column_stats"]

_COMPRESSION = {0: "NONE", 1: "ZLIB", 2: "SNAPPY", 3: "LZO", 4: "LZ4",
                5: "ZSTD"}
_DECLARED = {"LZO", "LZ4", "ZSTD"}
_TYPE_KINDS = {
    0: "boolean", 1: "byte", 2: "short", 3: "int", 4: "long", 5: "float",
    6: "double", 7: "string", 8: "binary", 9: "timestamp", 10: "list",
    11: "map", 12: "struct", 13: "union", 14: "decimal", 15: "date",
    16: "varchar", 17: "char", 18: "timestamp_instant",
}
_STRUCT_KIND = 12


# --- protobuf wire walk ----------------------------------------------------------------


def _varint(b: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    v = 0
    while True:
        if pos >= len(b):
            raise ValueError("truncated protobuf varint")
        byte = b[pos]
        pos += 1
        v |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return v, pos
        shift += 7
        if shift > 63:
            raise ValueError("protobuf varint longer than 64 bits")


def _zigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _pb_fields(b: bytes, pos: int = 0, end: int | None = None):
    """Yield (field_id, wire_type, value) over a protobuf message;
    value is an int for wire 0 and raw bytes for wires 1/2/5."""
    if end is None:
        end = len(b)
    while pos < end:
        key, pos = _varint(b, pos)
        fid, wire = key >> 3, key & 7
        if fid == 0:
            raise ValueError("protobuf field id 0")
        if wire == 0:
            v, pos = _varint(b, pos)
        elif wire == 1:
            if pos + 8 > end:
                raise ValueError("truncated fixed64 field")
            v = b[pos : pos + 8]
            pos += 8
        elif wire == 2:
            ln, pos = _varint(b, pos)
            if pos + ln > end:
                raise ValueError(
                    f"length-delimited field {fid} overruns the message"
                )
            v = b[pos : pos + ln]
            pos += ln
        elif wire == 5:
            if pos + 4 > end:
                raise ValueError("truncated fixed32 field")
            v = b[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported protobuf wire type {wire}")
        yield fid, wire, v


def _repeated_u32(wire: int, v, out: list[int]) -> None:
    """Type.subtypes arrives unpacked (wire 0, one per field) from
    older writers and packed (wire 2) from proto3-era ones."""
    if wire == 0:
        out.append(v)
    elif wire == 2:
        pos = 0
        while pos < len(v):
            u, pos = _varint(v, pos)
            out.append(u)
    else:
        raise ValueError(f"repeated uint32 with wire type {wire}")


# --- ORC stream decompression -----------------------------------------------------------


def _decompress_stream(b: bytes, codec: str) -> bytes:
    if codec == "NONE":
        return b
    out = bytearray()
    pos = 0
    n = len(b)
    while pos < n:
        if pos + 3 > n:
            raise ValueError("truncated ORC chunk header")
        h = int.from_bytes(b[pos : pos + 3], "little")
        pos += 3
        is_original = h & 1
        ln = h >> 1
        if ln == 0 or pos + ln > n:
            raise ValueError(f"ORC chunk length {ln} overruns the stream")
        chunk = b[pos : pos + ln]
        pos += ln
        if is_original:
            out += chunk
        elif codec == "ZLIB":
            try:
                out += zlib.decompress(chunk, -15)  # raw deflate
            except zlib.error as exc:
                raise ValueError(f"corrupt ZLIB chunk: {exc}") from exc
        else:  # SNAPPY — raw block, no CRC suffix in ORC
            from .avro_ocf import snappy_uncompress

            out += snappy_uncompress(chunk)
    return bytes(out)


# --- message decoders -------------------------------------------------------------------


def _parse_postscript(b: bytes) -> dict:
    ps = {"footer_length": None, "compression": None, "magic": None,
          "metadata_length": 0}
    for fid, wire, v in _pb_fields(b):
        if fid == 1 and wire == 0:
            ps["footer_length"] = v
        elif fid == 2 and wire == 0:
            ps["compression"] = v
        elif fid == 5 and wire == 0:
            ps["metadata_length"] = v
        elif fid == 8000 and wire == 2:
            ps["magic"] = v
    if ps["magic"] != b"ORC":
        raise ValueError("postscript magic is not 'ORC'")
    if ps["footer_length"] is None:
        raise ValueError("postscript missing footerLength")
    comp = ps["compression"] if ps["compression"] is not None else 0
    if comp not in _COMPRESSION:
        raise ValueError(f"unknown ORC compression kind {comp}")
    codec = _COMPRESSION[comp]
    if codec in _DECLARED:
        raise NotImplementedError(
            f"ORC compression {codec} is a declared boundary (no {codec} "
            "library in-container)"
        )
    ps["codec"] = codec
    return ps


def _parse_stripe(b: bytes) -> dict:
    s = {"offset": 0, "index_length": 0, "data_length": 0,
         "footer_length": 0, "n_rows": 0}
    names = {1: "offset", 2: "index_length", 3: "data_length",
             4: "footer_length", 5: "n_rows"}
    for fid, wire, v in _pb_fields(b):
        if fid in names:
            if wire != 0:
                raise ValueError(f"stripe field {fid} with wire {wire}")
            s[names[fid]] = v
    return s


def _parse_type(b: bytes) -> dict:
    t = {"kind": None, "subtypes": [], "field_names": []}
    for fid, wire, v in _pb_fields(b):
        if fid == 1 and wire == 0:
            if v not in _TYPE_KINDS:
                raise ValueError(f"unknown ORC type kind {v}")
            t["kind"] = v
        elif fid == 2:
            _repeated_u32(wire, v, t["subtypes"])
        elif fid == 3 and wire == 2:
            try:
                t["field_names"].append(v.decode("utf-8"))
            except UnicodeDecodeError as exc:
                raise ValueError(f"invalid UTF-8 field name: {exc}") from exc
    if t["kind"] is None:
        raise ValueError("Type without a kind")
    return t


def _parse_int_stats(b: bytes) -> dict:
    out = {"min": None, "max": None}
    for fid, wire, v in _pb_fields(b):
        if fid == 1 and wire == 0:
            out["min"] = _zigzag(v)
        elif fid == 2 and wire == 0:
            out["max"] = _zigzag(v)
    return out


def _parse_double_stats(b: bytes) -> dict:
    out = {"min": None, "max": None}
    for fid, wire, v in _pb_fields(b):
        if fid in (1, 2) and wire == 1:
            (x,) = struct.unpack("<d", v)
            out["min" if fid == 1 else "max"] = x
    return out


def _parse_col_stats(b: bytes) -> dict:
    cs = {"n_values": None, "int": None, "double": None, "has_null": None}
    for fid, wire, v in _pb_fields(b):
        if fid == 1 and wire == 0:
            cs["n_values"] = v
        elif fid == 2 and wire == 2:
            cs["int"] = _parse_int_stats(v)
        elif fid == 3 and wire == 2:
            cs["double"] = _parse_double_stats(v)
        elif fid == 10 and wire == 0:
            if v > 1:
                raise ValueError(f"hasNull carries non-boolean varint {v}")
            cs["has_null"] = bool(v)
    return cs


def read_orc_footer(b: bytes) -> dict:
    """ORC file bytes (or a sufficient tail INCLUDING the full footer +
    postscript; pass the whole file when unsure) -> footer facts:
    {num_rows, codec, n_stripes, stripe_rows, types, columns:
    {name: {type, n_values, null_count, min, max, has_null}}}."""
    # no magic-at-start check: a tail slice legitimately starts
    # mid-stream — the authoritative magic is the postscript's
    # field 8000, validated in _parse_postscript
    if len(b) < 4:
        raise ValueError("shorter than any ORC tail")
    ps_len = b[-1]
    if ps_len < 1 or 1 + ps_len > len(b):
        raise ValueError(f"postscript length {ps_len} overruns the file")
    ps = _parse_postscript(b[len(b) - 1 - ps_len : len(b) - 1])
    flen = ps["footer_length"]
    if flen < 0 or 1 + ps_len + flen > len(b):
        raise ValueError(f"footer length {flen} overruns the file")
    raw = b[len(b) - 1 - ps_len - flen : len(b) - 1 - ps_len]
    footer = _decompress_stream(raw, ps["codec"])

    num_rows = None
    stripes: list[dict] = []
    types: list[dict] = []
    stats: list[dict] = []
    for fid, wire, v in _pb_fields(footer):
        if fid == 3 and wire == 2:
            stripes.append(_parse_stripe(v))
        elif fid == 4 and wire == 2:
            types.append(_parse_type(v))
        elif fid == 6 and wire == 0:
            num_rows = v
        elif fid == 7 and wire == 2:
            stats.append(_parse_col_stats(v))
    if num_rows is None:
        raise ValueError("footer missing numberOfRows")
    if not types:
        raise ValueError("footer missing the type tree")
    stripe_rows = sum(s["n_rows"] for s in stripes)
    if stripe_rows != num_rows:
        raise ValueError(
            f"stripes sum to {stripe_rows} rows, footer claims {num_rows}"
        )
    root = types[0]
    if root["kind"] != _STRUCT_KIND:
        raise ValueError("root type is not a struct")
    if len(root["field_names"]) != len(root["subtypes"]):
        raise ValueError(
            f"root struct pairs {len(root['field_names'])} names with "
            f"{len(root['subtypes'])} subtypes"
        )
    if stats and len(stats) != len(types):
        raise ValueError(
            f"{len(stats)} statistics for {len(types)} types"
        )
    columns = {}
    for name, tid in zip(root["field_names"], root["subtypes"]):
        if not 0 < tid < len(types):
            raise ValueError(f"column {name!r} points at type id {tid}")
        cs = stats[tid] if stats else None
        nv = cs["n_values"] if cs else None
        if nv is not None and nv > num_rows:
            raise ValueError(
                f"column {name!r} claims {nv} values in {num_rows} rows"
            )
        kind = _TYPE_KINDS[types[tid]["kind"]]
        mn = mx = None
        if cs:
            if cs["int"] is not None:
                mn, mx = cs["int"]["min"], cs["int"]["max"]
            elif cs["double"] is not None:
                mn, mx = cs["double"]["min"], cs["double"]["max"]
        columns[name] = {
            "type": kind,
            "n_values": nv,
            "null_count": (num_rows - nv) if nv is not None else None,
            "min": mn,
            "max": mx,
            "has_null": cs["has_null"] if cs else None,
        }
    return {
        "num_rows": num_rows,
        "codec": ps["codec"],
        "n_stripes": len(stripes),
        "stripe_rows": stripe_rows,
        "types": [_TYPE_KINDS[t["kind"]] for t in types],
        "columns": columns,
    }


def read_orc_footer_from_path(path: str, *, tail_bytes: int = 1 << 20) -> dict:
    """Tail-seek read: fetch the last ``tail_bytes`` (footers are tens
    of KB; 1 MB covers any honest file) and parse — O(footer), never
    the data, the same scale shape as parquet's read_footer_from_path."""
    import os

    size = os.path.getsize(path)
    with open(path, "rb") as f:
        if size > tail_bytes:
            f.seek(size - tail_bytes)
        tail = f.read()
    ps_len = tail[-1] if tail else 0
    if size > tail_bytes and 1 + ps_len + 9 > len(tail):
        raise ValueError("ORC tail window smaller than the postscript")
    return read_orc_footer(tail)


# --- Spark kernel (mapInPandas, the audit plan shape) -----------------------------------


ORC_STATS_SCHEMA = (
    "tbl string, col string, codec string, num_rows long, "
    "null_count long, min_micro long, max_micro long"
)


def orc_footer_column_stats(df, *, micro: int = 1_000_000):
    """(tbl, col, kind, path) -> per-column ORC footer facts,
    Arrow-batched; each distinct file's footer read once per batch.
    Mirrors parquet's footer_column_stats: ints scale by ``micro`` in
    integer math, doubles by the house floor(x * micro + 0.5) rule,
    empty files report 0 rows with NULL bounds, and a misspelled audit
    column stays loud via the footer's own schema."""
    import math

    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            footers: dict = {}
            out = {"tbl": [], "col": [], "codec": [], "num_rows": [],
                   "null_count": [], "min_micro": [], "max_micro": []}
            for tbl, col, kind, path in zip(
                pdf["tbl"], pdf["col"], pdf["kind"], pdf["path"]
            ):
                fo = footers.get(path)
                if fo is None:
                    fo = footers[path] = read_orc_footer_from_path(str(path))
                if str(col) not in fo["columns"]:
                    raise ValueError(f"{tbl}: no column {col!r} in footer")
                c = fo["columns"][col]
                out["tbl"].append(tbl)
                out["col"].append(col)
                out["codec"].append(fo["codec"])
                out["num_rows"].append(fo["num_rows"])
                if fo["num_rows"] == 0:
                    out["null_count"].append(0)
                    out["min_micro"].append(None)
                    out["max_micro"].append(None)
                    continue
                if c["null_count"] is None:
                    raise ValueError(f"{tbl}.{col}: footer lacks statistics")
                out["null_count"].append(c["null_count"])
                if c["min"] is None or c["max"] is None:
                    raise ValueError(f"{tbl}.{col}: footer lacks min/max")
                if kind == "int":
                    out["min_micro"].append(int(c["min"]) * micro)
                    out["max_micro"].append(int(c["max"]) * micro)
                elif kind == "double":
                    out["min_micro"].append(math.floor(c["min"] * micro + 0.5))
                    out["max_micro"].append(math.floor(c["max"] * micro + 0.5))
                else:
                    raise ValueError(f"unsupported stat kind {kind!r}")
            yield pd.DataFrame(out)

    return df.select("tbl", "col", "kind", "path").mapInPandas(
        kernel, ORC_STATS_SCHEMA
    )
