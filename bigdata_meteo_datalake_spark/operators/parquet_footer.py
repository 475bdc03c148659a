"""Parquet footer introspection — the small-file / zone-map audit a
100 TB lake runs continuously (complements queries/ext_lakehouse.py's
compaction_plan and zone_map_prune_report, which work on DATA; this
reads the physical FOOTER the engine's scan planner actually consults).

The footer is Apache Thrift COMPACT protocol (public specs:
parquet-format's parquet.thrift and thrift's compact-protocol spec):
the file ends with [FileMetaData][4-byte LE footer length]['PAR1'].
This module is a bounded, dependency-free compact-protocol reader —
enough of the protocol for Parquet's metadata structs, with every size
validated against the buffer:

- varint: little-endian base-128, continuation bit 0x80.
- zigzag for i16/i32/i64: (n >> 1) ^ -(n & 1).
- struct fields: header byte (field-id delta << 4 | type); delta 0 is
  the long form (type byte, then the absolute field id as a zigzag
  varint); 0x00 is STOP. BOOLEAN_TRUE/FALSE carry the value in the
  type nibble.
- list/set: header (size << 4 | element type), size 15 means a varint
  size follows; binary: varint length + payload.

Structs mapped (field ids straight from parquet.thrift):
  FileMetaData{1 version, 2 schema, 3 num_rows, 4 row_groups,
               6 created_by}
  SchemaElement{1 type, 4 name, 5 num_children, 6 converted_type}
  RowGroup{1 columns, 2 total_byte_size, 3 num_rows}
  ColumnChunk{3 meta_data}
  ColumnMetaData{1 type, 2 encodings, 3 path_in_schema, 4 codec,
                 5 num_values, 6 total_uncompressed_size,
                 7 total_compressed_size, 12 statistics}
  Statistics{1 max(legacy), 2 min(legacy), 3 null_count,
             5 max_value, 6 min_value}

Min/max payloads are plain little-endian primitives per physical type
(INT32 '<i', INT64 '<q', FLOAT '<f', DOUBLE '<d'; BYTE_ARRAY raw —
NOTE writers may truncate byte-array stats, so only fixed-width types
are surfaced as exact).

Foreign-writer interop is the whole point here: the reader is verified
in tests against footers produced by THREE independent writers —
parquet-cpp (the pyarrow-written testdata lake), parquet-mr (Spark's
own writer), and DuckDB's COPY TO — and cross-checked field-by-field
against pyarrow's metadata API.

Reference parity note: the reference repo's lake is raw JSON + Postgres
(SURVEY.md section 4); footer physics belongs to the lakehouse pillar.
"""

from __future__ import annotations

import struct

__all__ = ["read_parquet_footer", "footer_column_stats"]

_STOP = 0x0
_BOOL_TRUE = 0x1
_BOOL_FALSE = 0x2
_BYTE = 0x3
_I16 = 0x4
_I32 = 0x5
_I64 = 0x6
_DOUBLE = 0x7
_BINARY = 0x8
_LIST = 0x9
_SET = 0xA
_MAP = 0xB
_STRUCT = 0xC

_PHYSICAL = {0: "BOOLEAN", 1: "INT32", 2: "INT64", 3: "INT96",
             4: "FLOAT", 5: "DOUBLE", 6: "BYTE_ARRAY",
             7: "FIXED_LEN_BYTE_ARRAY"}
_CODECS = {0: "UNCOMPRESSED", 1: "SNAPPY", 2: "GZIP", 3: "LZO",
           4: "BROTLI", 5: "LZ4", 6: "ZSTD", 7: "LZ4_RAW"}
_ENCODINGS = {0: "PLAIN", 2: "PLAIN_DICTIONARY", 3: "RLE",
              4: "BIT_PACKED", 5: "DELTA_BINARY_PACKED",
              6: "DELTA_LENGTH_BYTE_ARRAY", 7: "DELTA_BYTE_ARRAY",
              8: "RLE_DICTIONARY", 9: "BYTE_STREAM_SPLIT"}


def _varint(b: bytes, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        if pos >= len(b):
            raise ValueError("truncated varint in thrift footer")
        byte = b[pos]
        pos += 1
        out |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return out, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint longer than 10 bytes")


def _zigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _read_value(b: bytes, pos: int, ttype: int):
    """One compact-protocol value of ``ttype`` -> (python value, pos).
    Structs become {field_id: value}; lists become python lists."""
    if ttype in (_BOOL_TRUE, _BOOL_FALSE):
        # only reached as a LIST element, where bools are one byte each
        if pos >= len(b):
            raise ValueError("truncated bool")
        return b[pos] == 1, pos + 1
    if ttype == _BYTE:
        if pos >= len(b):
            raise ValueError("truncated byte")
        return struct.unpack_from("<b", b, pos)[0], pos + 1
    if ttype in (_I16, _I32, _I64):
        n, pos = _varint(b, pos)
        return _zigzag(n), pos
    if ttype == _DOUBLE:
        if pos + 8 > len(b):
            raise ValueError("truncated double")
        return struct.unpack_from("<d", b, pos)[0], pos + 8
    if ttype == _BINARY:
        n, pos = _varint(b, pos)
        if pos + n > len(b):
            raise ValueError("binary field overruns the footer")
        return b[pos : pos + n], pos + n
    if ttype in (_LIST, _SET):
        if pos >= len(b):
            raise ValueError("truncated list header")
        header = b[pos]
        pos += 1
        size = header >> 4
        etype = header & 0x0F
        if size == 15:
            size, pos = _varint(b, pos)
        out = []
        for _ in range(size):
            v, pos = _read_value(b, pos, etype)
            out.append(v)
        return out, pos
    if ttype == _MAP:
        if pos >= len(b):
            raise ValueError("truncated map header")
        if b[pos] == 0:
            return {}, pos + 1
        size, pos = _varint(b, pos)
        if pos >= len(b):
            raise ValueError("truncated map types byte")
        ktype, vtype = b[pos] >> 4, b[pos] & 0x0F
        pos += 1
        if ktype in (_LIST, _SET, _MAP, _STRUCT):
            # a corrupted type nibble can claim container-typed map
            # keys, whose decoded python values are unhashable — the
            # contract demands ValueError, not TypeError at out[k]
            raise ValueError("thrift map with non-scalar keys")
        out = {}
        for _ in range(size):
            k, pos = _read_value(b, pos, ktype)
            v, pos = _read_value(b, pos, vtype)
            out[k] = v
        return out, pos
    if ttype == _STRUCT:
        return _read_struct(b, pos)
    raise ValueError(f"unsupported thrift compact type {ttype}")


def _read_struct(b: bytes, pos: int) -> tuple[dict, int]:
    fields: dict[int, object] = {}
    last_fid = 0
    while True:
        if pos >= len(b):
            raise ValueError("struct without STOP in thrift footer")
        header = b[pos]
        pos += 1
        if header == _STOP:
            return fields, pos
        delta = header >> 4
        ttype = header & 0x0F
        if delta == 0:  # long form: absolute zigzag-varint field id
            n, pos = _varint(b, pos)
            fid = _zigzag(n)
        else:
            fid = last_fid + delta
        last_fid = fid
        if ttype in (_BOOL_TRUE, _BOOL_FALSE):
            fields[fid] = ttype == _BOOL_TRUE
        else:
            fields[fid], pos = _read_value(b, pos, ttype)
    # unreachable


def _decode_stat(raw: bytes | None, physical: str):
    """A Statistics min_value/max_value payload -> exact python value
    (fixed-width types only; byte-array stats may be writer-truncated
    and are returned as None rather than trusted)."""
    if raw is None:
        return None
    want = {"INT32": 4, "INT64": 8, "FLOAT": 4, "DOUBLE": 8,
            "BOOLEAN": 1}.get(physical)
    if want is not None and len(raw) != want:
        raise ValueError(
            f"{physical} statistic payload is {len(raw)} bytes, "
            f"expected {want}"
        )
    if physical == "INT32":
        return struct.unpack("<i", raw)[0]
    if physical == "INT64":
        return struct.unpack("<q", raw)[0]
    if physical == "FLOAT":
        return struct.unpack("<f", raw)[0]
    if physical == "DOUBLE":
        return struct.unpack("<d", raw)[0]
    if physical == "BOOLEAN":
        return raw == b"\x01"
    return None


def _top_level_repetition(schema: list[dict]) -> dict[str, int | None]:
    """Map name -> repetition_type for the ROOT'S DIRECT CHILDREN of a
    flattened pre-order SchemaElement list, walked with a
    remaining-children stack (num_children is field 5, repetition_type
    field 3, name field 4). Nested elements never enter the map, so a
    nested leaf sharing a top-level column's name cannot overwrite its
    repetition; a tree whose num_children accounting does not exactly
    cover the element list raises."""
    repetition: dict[str, int | None] = {}
    pending: list[int] = []  # remaining-children count per open level
    for idx, e in enumerate(schema):
        if not isinstance(e, dict):
            raise ValueError(f"schema element {idx} is not a struct")
        nch = _typed(e, 5, int, "SchemaElement.num_children", 0) or 0
        if nch < 0:
            raise ValueError(f"schema element {idx} has negative num_children")
        if idx == 0:
            if nch:
                pending.append(nch)
            continue
        if not pending:
            raise ValueError(
                "schema carries more elements than its num_children tree"
            )
        if len(pending) == 1:  # a direct child of the root
            name = _typed(e, 4, bytes, "SchemaElement.name", b"")
            repetition[(name or b"").decode("utf-8", "replace")] = _typed(
                e, 3, int, "SchemaElement.repetition_type"
            )
        pending[-1] -= 1
        if nch:
            pending.append(nch)
        else:
            while pending and pending[-1] == 0:
                pending.pop()
    if pending:
        raise ValueError("schema tree truncated: num_children unsatisfied")
    return repetition


def _typed(container: dict, fid: int, types, what: str, default=None):
    """Field ``fid`` from a decoded struct, VALIDATED against the
    python type its thrift schema implies. Compact protocol carries
    the type in each field header, so a corrupt nibble silently
    re-types a field — without this gate the mapping layer leaks
    AttributeError/TypeError instead of the contracted ValueError
    (found by mutation fuzzing, tests/test_round11_props.py)."""
    v = container.get(fid, default)
    bad = v is not None and not isinstance(v, types)
    # bool passes isinstance(..., int), so a BOOL_TRUE/BOOL_FALSE
    # nibble would slip through an int gate as True/False — reject it
    if not bad and isinstance(v, bool) and types is int:
        bad = True
    if bad:
        raise ValueError(
            f"footer field {what} has thrift type "
            f"{type(v).__name__}, expected {types}"
        )
    return v


def read_parquet_footer(b: bytes) -> dict:
    """Raw footer bytes (the tail of a parquet file, or the whole file)
    -> {version, num_rows, created_by, n_row_groups, columns: [{path,
    physical_type, codec, encodings, num_values,
    total_compressed_size, total_uncompressed_size, null_count,
    min_value, max_value, row_group}]}.

    Validates both magics when given a whole file, the footer length,
    and the internal row accounting: per-row-group num_rows must sum to
    FileMetaData.num_rows, and every column chunk's num_values must
    equal its row group's num_rows for flat (non-repeated) schemas —
    a footer that lies about its own row counts raises."""
    if len(b) < 12:
        raise ValueError("file shorter than the parquet footer framing")
    if b[-4:] != b"PAR1":
        raise ValueError("missing trailing PAR1 magic")
    (flen,) = struct.unpack_from("<I", b, len(b) - 8)
    if flen + 12 > len(b):
        raise ValueError(
            f"footer length {flen} overruns the file ({len(b)} bytes)"
        )
    meta = b[len(b) - 8 - flen : len(b) - 8]
    fields, _ = _read_struct(meta, 0)
    version = _typed(fields, 1, int, "version")
    schema = _typed(fields, 2, list, "schema", [])
    num_rows = _typed(fields, 3, int, "num_rows")
    row_groups = _typed(fields, 4, list, "row_groups", [])
    created_by = _typed(fields, 6, bytes, "created_by", b"").decode(
        "utf-8", "replace"
    )
    if num_rows is None or not schema:
        raise ValueError("footer missing num_rows or schema")
    if not all(isinstance(e, dict) for e in schema):
        raise ValueError("schema list carries a non-struct element")
    for e in schema:
        _typed(e, 4, bytes, "SchemaElement.name")
    # repeated fields (lists) make num_values per chunk exceed the row
    # count legitimately; collect repetition_type for the ROOT'S DIRECT
    # CHILDREN only — keying the whole flattened schema by bare name
    # would let a nested element that shares a top-level leaf's name
    # overwrite its repetition_type and corrupt the
    # num_values == row-group-rows accounting check below
    repetition = _top_level_repetition(schema)
    rg_rows_total = 0
    columns = []
    for gi, rg in enumerate(row_groups):
        if not isinstance(rg, dict):
            raise ValueError(f"row group {gi} is not a struct")
        rg_rows = _typed(rg, 3, int, "RowGroup.num_rows")
        if rg_rows is None:
            raise ValueError(f"row group {gi} missing num_rows")
        rg_rows_total += rg_rows
        for chunk in _typed(rg, 1, list, "RowGroup.columns", []):
            if not isinstance(chunk, dict):
                raise ValueError("column chunk is not a struct")
            md = _typed(chunk, 3, dict, "ColumnChunk.meta_data")
            if md is None:
                raise ValueError("column chunk without ColumnMetaData")
            path_parts = _typed(md, 3, list, "path_in_schema", [])
            if not all(isinstance(p, bytes) for p in path_parts):
                raise ValueError("path_in_schema carries a non-binary part")
            path = ".".join(p.decode() for p in path_parts)
            ptype = _typed(md, 1, int, "ColumnMetaData.type")
            physical = _PHYSICAL.get(ptype, f"type{ptype}")
            stats = _typed(md, 12, dict, "statistics", {})
            # prefer the modern min_value/max_value (5/6); fall back to
            # the legacy fields (1/2 — same bytes for signed ints)
            raw_max = _typed(stats, 5, bytes, "max_value",
                             _typed(stats, 1, bytes, "max"))
            raw_min = _typed(stats, 6, bytes, "min_value",
                             _typed(stats, 2, bytes, "min"))
            num_values = _typed(md, 5, int, "num_values")
            leaf = path.split(".", 1)[0]
            # num_values counts leaf values incl. nulls: for flat
            # (non-repeated) top-level fields it must equal the group's
            # row count (REPEATED leaves under a list may exceed it)
            if repetition.get(leaf) != 2 and "." not in path:
                if num_values != rg_rows:
                    raise ValueError(
                        f"column {path!r} num_values {num_values} != row "
                        f"group rows {rg_rows}"
                    )
            codec_id = _typed(md, 4, int, "codec")
            encodings = _typed(md, 2, list, "encodings", [])
            if not all(isinstance(e, int) for e in encodings):
                raise ValueError("encodings list carries a non-int")
            columns.append({
                "path": path,
                "physical_type": physical,
                "codec": _CODECS.get(codec_id, f"codec{codec_id}"),
                "encodings": sorted(
                    _ENCODINGS.get(e, f"enc{e}") for e in encodings
                ),
                "num_values": num_values,
                "total_compressed_size": _typed(
                    md, 7, int, "total_compressed_size"),
                "total_uncompressed_size": _typed(
                    md, 6, int, "total_uncompressed_size"),
                "null_count": _typed(stats, 3, int, "null_count"),
                "min_value": _decode_stat(raw_min, physical),
                "max_value": _decode_stat(raw_max, physical),
                "row_group": gi,
            })
    if rg_rows_total != num_rows:
        raise ValueError(
            f"row groups sum to {rg_rows_total} rows, footer claims "
            f"{num_rows}"
        )
    return {
        "version": version,
        "num_rows": num_rows,
        "created_by": created_by,
        "n_row_groups": len(row_groups),
        # declared field names minus the schema root — lets callers
        # validate a column EXISTS even when the file is empty and
        # carries no row groups (and therefore no column chunks)
        "schema_names": {e.get(4, b"").decode() for e in schema[1:]},
        "columns": columns,
    }


def read_footer_from_path(path: str) -> dict:
    """Footer-only read: seek to the 8-byte trailer, then fetch exactly
    the footer — the access pattern that stays O(footer) per file on a
    100 TB lake (never reads data pages)."""
    with open(path, "rb") as f:
        f.seek(0, 2)
        size = f.tell()
        if size < 12:
            raise ValueError(f"{path}: shorter than the parquet framing")
        f.seek(size - 8)
        tail = f.read(8)
        if tail[4:] != b"PAR1":
            raise ValueError(f"{path}: missing trailing PAR1 magic")
        (flen,) = struct.unpack("<I", tail[:4])
        if flen + 12 > size:
            raise ValueError(f"{path}: footer length {flen} overruns file")
        f.seek(size - 8 - flen)
        meta = f.read(flen + 8)
        # head magic: a parquet file also STARTS with PAR1; checking it
        # costs one extra 4-byte read and catches truncated-head copies
        f.seek(0)
        if f.read(4) != b"PAR1":
            raise ValueError(f"{path}: missing leading PAR1 magic")
    return read_parquet_footer(b"PAR1" + meta)


def footer_column_stats(df, *, micro: int = 1_000_000):
    """(tbl, col, kind, path) -> per-column footer facts via the thrift
    reader, Arrow-batched: num_rows, null_count, and min/max in exact
    micro units (ints scaled by ``micro`` in integer math; doubles by
    the house floor(x * micro + 0.5) rule). Each distinct file's footer
    is read ONCE per batch, O(footer) bytes."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            footers = {}
            out = {"tbl": [], "col": [], "num_rows": [], "null_count": [],
                   "min_micro": [], "max_micro": []}
            for tbl, col, kind, path in zip(
                pdf["tbl"], pdf["col"], pdf["kind"], pdf["path"]
            ):
                fo = footers.get(path)
                if fo is None:
                    fo = footers[path] = read_footer_from_path(str(path))
                if str(col) not in fo["schema_names"]:
                    # the existence check must not depend on chunks: an
                    # empty file has none, and a misspelled audit column
                    # must stay loud there too
                    raise ValueError(f"{tbl}: no column {col!r} in footer")
                if fo["num_rows"] == 0:
                    # an EMPTY file legitimately has no statistics (and
                    # possibly no row groups at all): report it as empty
                    # with NULL bounds — exactly what min()/max() over
                    # the data produce — rather than refusing the audit
                    out["tbl"].append(tbl)
                    out["col"].append(col)
                    out["num_rows"].append(0)
                    out["null_count"].append(0)
                    out["min_micro"].append(None)
                    out["max_micro"].append(None)
                    continue
                chunks = [c for c in fo["columns"] if c["path"] == col]
                if not chunks:
                    raise ValueError(f"{tbl}: no column {col!r} in footer")
                nulls = 0
                mn = mx = None
                for c in chunks:
                    if c["null_count"] is None:
                        raise ValueError(f"{tbl}.{col}: footer lacks null_count")
                    nulls += c["null_count"]
                    if c["min_value"] is None or c["max_value"] is None:
                        raise ValueError(f"{tbl}.{col}: footer lacks min/max")
                    mn = c["min_value"] if mn is None else min(mn, c["min_value"])
                    mx = c["max_value"] if mx is None else max(mx, c["max_value"])
                if kind == "int":
                    mn_u, mx_u = int(mn) * micro, int(mx) * micro
                elif kind == "double":
                    import math

                    mn_u = math.floor(mn * micro + 0.5)
                    mx_u = math.floor(mx * micro + 0.5)
                else:
                    raise ValueError(f"unsupported stat kind {kind!r}")
                out["tbl"].append(tbl)
                out["col"].append(col)
                out["num_rows"].append(fo["num_rows"])
                out["null_count"].append(nulls)
                out["min_micro"].append(mn_u)
                out["max_micro"].append(mx_u)
            yield pd.DataFrame(out)

    return df.mapInPandas(
        kernel,
        "tbl string, col string, num_rows long, null_count long, "
        "min_micro long, max_micro long",
    )
