"""Avro Object Container Files — the row-oriented arrival format next
to TFRecord/WebDataset/ZIP/Parquet in the training-data pillar, all
stdlib, from the PUBLIC Apache Avro 1.11 specification:

1. OCF framing: 4-byte magic ``Obj\\x01``, a file-metadata map
   (avro-encoded map<string, bytes> carrying at least ``avro.schema``,
   optionally ``avro.codec``), a 16-byte sync marker, then data blocks
   — each a long record count, a long byte size, the (possibly
   compressed) serialized records, and the sync marker again. A block
   whose records do not consume its byte span EXACTLY, a sync marker
   that drifts from the header's, or bytes after the last block all
   raise.

2. Avro binary encoding, the full type system: null, boolean,
   int/long (zigzag varints, 64-bit bounded; int additionally
   range-checked to 32 bits), float/double (little-endian IEEE),
   bytes/string (long-prefixed; strings strict UTF-8), records,
   enums (index-bounded), arrays and maps (block runs with the
   spec's negative-count + byte-size form supported), unions
   (index-tagged), fixed, and named-type references. Logical types
   are annotations and pass through.

3. Codecs: ``null``, ``deflate`` (raw RFC 1951, no zlib wrapper —
   zlib.error is wrapped to the contracted ValueError), and
   ``snappy`` — a HAND-ROLLED decoder for the published snappy
   format (varint preamble; literal / 1-2-4-byte-offset copy tags,
   forward-overlapping RLE copies included) plus the avro-side
   4-byte big-endian CRC32 of the uncompressed block. The other
   registered avro codecs (bzip2, xz, zstandard) raise
   NotImplementedError as declared boundaries.

DoS posture (mutation-fuzz gate, tests/test_round12_props.py): every
count decoded from the wire is bounded against the bytes that could
plausibly back it before any loop runs, so a flipped byte can waste at
most O(buffer) work, never hang.

Reference parity note: the reference repo has no container-file layer
(SURVEY.md section 4); this module belongs to the training-data
pillar's arrival formats.
"""

from __future__ import annotations

import json
import struct
import zlib

__all__ = [
    "AVRO_MAGIC",
    "build_avro_ocf",
    "parse_avro_schema",
    "read_avro_ocf",
    "snappy_compress",
    "snappy_uncompress",
]

AVRO_MAGIC = b"Obj\x01"

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double",
               "bytes", "string"}
_KNOWN_CODECS = {"null", "deflate", "snappy"}
_DECLARED_CODECS = {"bzip2", "xz", "zstandard"}  # registered, not shipped


# --- varints / zigzag ----------------------------------------------------------------


def _read_long(b: bytes, pos: int) -> tuple[int, int]:
    """Avro long: zigzag varint, at most 10 bytes / 64 bits."""
    shift = 0
    u = 0
    while True:
        if pos >= len(b):
            raise ValueError("truncated varint")
        byte = b[pos]
        pos += 1
        u |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
        if shift > 63:
            raise ValueError("varint longer than 64 bits")
    v = (u >> 1) ^ -(u & 1)
    if not -(1 << 63) <= v < (1 << 63):
        raise ValueError(f"long {v} outside 64-bit range")
    return v, pos


def _put_long(out: bytearray, v: int) -> None:
    u = (v << 1) ^ (v >> 63)
    while True:
        byte = u & 0x7F
        u >>= 7
        if u:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return


# --- schema parsing ------------------------------------------------------------------


_MAX_SCHEMA_DEPTH = 64


def parse_avro_schema(node, names: dict | None = None, _depth: int = 0):
    """JSON schema -> a normalized decoder structure, validating the
    spec's structural rules (records need named+typed fields, enum
    symbols are unique strings, fixed sizes are non-negative, unions
    never immediately nest unions, named types resolve). Returns a
    dict {kind, ...}; ``names`` accumulates named types so references
    (including recursive records) resolve."""
    if _depth > _MAX_SCHEMA_DEPTH:
        # a crafted deeply-nested schema would otherwise escape as
        # RecursionError, outside the fail-loud contract
        raise ValueError(f"schema nests deeper than {_MAX_SCHEMA_DEPTH}")
    if names is None:
        names = {}
    if isinstance(node, str):
        if node in _PRIMITIVES:
            return {"kind": node}
        if node in names:
            return names[node]
        raise ValueError(f"unknown type name {node!r}")
    if isinstance(node, list):
        branches = []
        for t in node:
            s = parse_avro_schema(t, names, _depth + 1)
            if s["kind"] == "union":
                raise ValueError("unions may not immediately contain unions")
            branches.append(s)
        if not branches:
            raise ValueError("empty union")
        return {"kind": "union", "branches": branches}
    if not isinstance(node, dict):
        raise ValueError(f"schema node must be str/list/dict, got {type(node).__name__}")
    t = node.get("type")
    if t in _PRIMITIVES:
        return {"kind": t}
    if t == "record":
        name = node.get("name")
        if not isinstance(name, str) or not name:
            raise ValueError("record without a name")
        rec = {"kind": "record", "name": name, "fields": []}
        names[name] = rec  # registered before fields: recursion resolves
        raw_fields = node.get("fields")
        if not isinstance(raw_fields, list):
            raise ValueError(f"record {name!r} without a fields list")
        for f in raw_fields:
            if not isinstance(f, dict) or not isinstance(f.get("name"), str):
                raise ValueError(f"record {name!r} field without a name")
            if "type" not in f:
                raise ValueError(
                    f"field {f['name']!r} of record {name!r} without a type"
                )
            rec["fields"].append(
                (f["name"], parse_avro_schema(f["type"], names, _depth + 1))
            )
        return rec
    if t == "enum":
        symbols = node.get("symbols")
        if (not isinstance(symbols, list) or not symbols
                or not all(isinstance(s, str) for s in symbols)
                or len(set(symbols)) != len(symbols)):
            raise ValueError("enum needs a list of unique string symbols")
        e = {"kind": "enum", "symbols": symbols}
        if isinstance(node.get("name"), str):
            names[node["name"]] = e
        return e
    if t == "array":
        if "items" not in node:
            raise ValueError("array without items")
        return {"kind": "array", "items": parse_avro_schema(node["items"], names, _depth + 1)}
    if t == "map":
        if "values" not in node:
            raise ValueError("map without values")
        return {"kind": "map", "values": parse_avro_schema(node["values"], names, _depth + 1)}
    if t == "fixed":
        size = node.get("size")
        if not isinstance(size, int) or isinstance(size, bool) or size < 0:
            raise ValueError("fixed needs a non-negative integer size")
        fx = {"kind": "fixed", "size": size}
        if isinstance(node.get("name"), str):
            names[node["name"]] = fx
        return fx
    if isinstance(t, (str, list, dict)):
        # {"type": "string", "logicalType": "uuid"} and friends — the
        # annotation wrapper form; logical types pass through
        return parse_avro_schema(t, names, _depth + 1)
    raise ValueError(f"unsupported schema node {node!r}")


# --- binary decode -------------------------------------------------------------------


def _decode(b: bytes, pos: int, s: dict):
    kind = s["kind"]
    if kind == "null":
        return None, pos
    if kind == "boolean":
        if pos >= len(b):
            raise ValueError("truncated boolean")
        v = b[pos]
        if v > 1:
            raise ValueError(f"boolean byte 0x{v:02x} is neither 0 nor 1")
        return bool(v), pos + 1
    if kind in ("int", "long"):
        v, pos = _read_long(b, pos)
        if kind == "int" and not -(1 << 31) <= v < (1 << 31):
            raise ValueError(f"int {v} outside 32-bit range")
        return v, pos
    if kind == "float":
        if pos + 4 > len(b):
            raise ValueError("truncated float")
        return struct.unpack_from("<f", b, pos)[0], pos + 4
    if kind == "double":
        if pos + 8 > len(b):
            raise ValueError("truncated double")
        return struct.unpack_from("<d", b, pos)[0], pos + 8
    if kind in ("bytes", "string"):
        ln, pos = _read_long(b, pos)
        if ln < 0 or pos + ln > len(b):
            raise ValueError(f"{kind} length {ln} overruns the buffer")
        raw = b[pos : pos + ln]
        if kind == "string":
            try:
                return raw.decode("utf-8"), pos + ln
            except UnicodeDecodeError as exc:  # contracted exception type
                raise ValueError(f"invalid UTF-8 in string: {exc}") from exc
        return raw, pos + ln
    if kind == "fixed":
        size = s["size"]
        if pos + size > len(b):
            raise ValueError("truncated fixed")
        return b[pos : pos + size], pos + size
    if kind == "enum":
        idx, pos = _read_long(b, pos)
        if not 0 <= idx < len(s["symbols"]):
            raise ValueError(f"enum index {idx} out of range")
        return s["symbols"][idx], pos
    if kind == "union":
        idx, pos = _read_long(b, pos)
        if not 0 <= idx < len(s["branches"]):
            raise ValueError(f"union index {idx} out of range")
        return _decode(b, pos, s["branches"][idx])
    if kind == "record":
        out = {}
        for fname, fs in s["fields"]:
            out[fname], pos = _decode(b, pos, fs)
        return out, pos
    if kind in ("array", "map"):
        items: list = []
        while True:
            count, pos = _read_long(b, pos)
            if count == 0:
                break
            if count < 0:
                # negative-count form: abs(count) items preceded by a
                # long byte size (for skipping); we decode, so only
                # bound-check it
                size, pos = _read_long(b, pos)
                if size < 0 or pos + size > len(b):
                    raise ValueError("array/map block size overruns the buffer")
                count = -count
            if count > len(b) - pos + 1:
                raise ValueError(
                    f"array/map block count {count} cannot fit the buffer"
                )
            for _ in range(count):
                if kind == "map":
                    k, pos = _decode(b, pos, {"kind": "string"})
                    v, pos = _decode(b, pos, s["values"])
                    items.append((k, v))
                else:
                    v, pos = _decode(b, pos, s["items"])
                    items.append(v)
        if kind == "map":
            return dict(items), pos
        return items, pos
    raise ValueError(f"unsupported kind {kind!r}")  # unreachable by construction


# --- binary encode (fixture writer) --------------------------------------------------


def _encode(out: bytearray, v, s: dict) -> None:
    kind = s["kind"]
    if kind == "null":
        return
    if kind == "boolean":
        out.append(1 if v else 0)
    elif kind in ("int", "long"):
        _put_long(out, int(v))
    elif kind == "float":
        out += struct.pack("<f", v)
    elif kind == "double":
        out += struct.pack("<d", v)
    elif kind == "bytes":
        _put_long(out, len(v))
        out += v
    elif kind == "string":
        raw = v.encode("utf-8")
        _put_long(out, len(raw))
        out += raw
    elif kind == "fixed":
        if len(v) != s["size"]:
            raise ValueError(f"fixed value of {len(v)} bytes, size {s['size']}")
        out += v
    elif kind == "enum":
        out += _long_bytes(s["symbols"].index(v))
    elif kind == "union":
        for idx, branch in enumerate(s["branches"]):
            if _union_match(v, branch):
                _put_long(out, idx)
                _encode(out, v, branch)
                return
        raise ValueError(f"no union branch matches {v!r}")
    elif kind == "record":
        for fname, fs in s["fields"]:
            _encode(out, v[fname], fs)
    elif kind == "array":
        if v:
            _put_long(out, len(v))
            for item in v:
                _encode(out, item, s["items"])
        _put_long(out, 0)
    elif kind == "map":
        if v:
            _put_long(out, len(v))
            for k, item in v.items():
                _encode(out, k, {"kind": "string"})
                _encode(out, item, s["values"])
        _put_long(out, 0)
    else:  # pragma: no cover — parse_avro_schema rejects unknown kinds
        raise ValueError(f"unsupported kind {kind!r}")


def _long_bytes(v: int) -> bytes:
    out = bytearray()
    _put_long(out, v)
    return bytes(out)


def _union_match(v, branch: dict) -> bool:
    kind = branch["kind"]
    if kind == "null":
        return v is None
    if kind == "boolean":
        return isinstance(v, bool)
    if kind in ("int", "long"):
        return isinstance(v, int) and not isinstance(v, bool)
    if kind in ("float", "double"):
        return isinstance(v, float)
    if kind in ("bytes", "fixed"):
        return isinstance(v, bytes)
    if kind in ("string", "enum"):
        return isinstance(v, str)
    if kind == "array":
        return isinstance(v, list)
    if kind in ("map", "record"):
        return isinstance(v, dict)
    return False


# --- snappy (format_description.txt, the public spec) ---------------------------------


def _uvarint(b: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    v = 0
    while True:
        if pos >= len(b):
            raise ValueError("truncated snappy preamble")
        byte = b[pos]
        pos += 1
        v |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return v, pos
        shift += 7
        if shift > 31:
            raise ValueError("snappy length varint longer than 32 bits")


def snappy_uncompress(b: bytes) -> bytes:
    """Raw snappy block decompression: the varint uncompressed-length
    preamble, then literal and copy elements (1-, 2- and 4-byte
    offsets; forward-overlapping copies are the RLE case and are
    legal). Truncation, zero/out-of-range offsets, and a length
    mismatch with the preamble all raise ValueError."""
    ulen, pos = _uvarint(b, 0)
    n = len(b)
    out = bytearray()
    while pos < n:
        if len(out) > ulen:
            raise ValueError("snappy stream exceeds its declared length")
        tag = b[pos]
        pos += 1
        ttype = tag & 3
        if ttype == 0:  # literal
            v = tag >> 2
            if v < 60:
                ln = v + 1
            else:
                nb = v - 59  # 60..63 -> 1..4 length bytes, little-endian
                if pos + nb > n:
                    raise ValueError("truncated snappy literal length")
                ln = int.from_bytes(b[pos : pos + nb], "little") + 1
                pos += nb
            if pos + ln > n:
                raise ValueError("truncated snappy literal")
            out += b[pos : pos + ln]
            pos += ln
            continue
        if ttype == 1:
            if pos >= n:
                raise ValueError("truncated snappy copy-1 offset")
            ln = ((tag >> 2) & 7) + 4
            off = ((tag >> 5) << 8) | b[pos]
            pos += 1
        elif ttype == 2:
            if pos + 2 > n:
                raise ValueError("truncated snappy copy-2 offset")
            ln = (tag >> 2) + 1
            off = int.from_bytes(b[pos : pos + 2], "little")
            pos += 2
        else:
            if pos + 4 > n:
                raise ValueError("truncated snappy copy-4 offset")
            ln = (tag >> 2) + 1
            off = int.from_bytes(b[pos : pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError(f"snappy copy offset {off} out of range")
        start = len(out) - off
        if off >= ln:
            out += out[start : start + ln]
        else:  # forward-overlapping: the run-length case, byte by byte
            for i in range(ln):
                out.append(out[start + i])
    if len(out) != ulen:
        raise ValueError(
            f"snappy stream decodes to {len(out)} bytes, preamble says {ulen}"
        )
    return bytes(out)


def snappy_compress(data: bytes) -> bytes:
    """Greedy snappy compressor (fixture writer): emits back-reference
    copies for matches >= 4 bytes within a 64 KB window (capped at 64
    bytes per tag, the 2-byte-offset form), literals otherwise. Real
    enough that the decoder's copy paths — including overlapping RLE
    runs — are exercised by every fixture, not just hand vectors."""
    out = bytearray()
    out += _uvarint_bytes(len(data))
    n = len(data)
    pos = 0
    lit_start = 0

    def flush_literal(end: int) -> None:
        s = lit_start
        while s < end:
            chunk = min(end - s, 60)
            out.append(((chunk - 1) << 2) | 0)
            out.extend(data[s : s + chunk])
            s += chunk

    while pos < n:
        if n - pos >= 4:
            window_start = max(0, pos - 65535)
            cand = data.rfind(data[pos : pos + 4], window_start, pos + 3)
            # rfind end pos+3: a match may start before pos and overlap
            # forward into it (the RLE case), but must start before pos
            if cand != -1 and cand < pos:
                ln = 4
                while (pos + ln < n and ln < 64
                       and data[cand + ln] == data[pos + ln]):
                    ln += 1
                flush_literal(pos)
                off = pos - cand
                out.append(((ln - 1) << 2) | 2)
                out += off.to_bytes(2, "little")
                pos += ln
                lit_start = pos
                continue
        pos += 1
    flush_literal(n)
    return bytes(out)


def _uvarint_bytes(v: int) -> bytes:
    out = bytearray()
    while True:
        byte = v & 0x7F
        v >>= 7
        if v:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return bytes(out)


# --- OCF framing ----------------------------------------------------------------------


def _decode_meta(b: bytes, pos: int) -> tuple[dict[str, bytes], int]:
    meta_schema = {"kind": "map", "values": {"kind": "bytes"}}
    meta, pos = _decode(b, pos, meta_schema)
    return meta, pos


def read_avro_ocf(b: bytes) -> dict:
    """Object Container File -> {schema, schema_json, meta, codec, sync,
    n_blocks, n_records, blocks: [{n_records, byte_size, records}]}
    under the format's full contract: magic, mandatory avro.schema
    metadata, per-block sync-marker equality, records consuming each
    block's bytes exactly, and nothing after the final sync."""
    if b[:4] != AVRO_MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta, pos = _decode_meta(b, 4)
    if "avro.schema" not in meta:
        raise ValueError("OCF metadata missing avro.schema")
    try:
        schema_json = meta["avro.schema"].decode("utf-8")
        schema_node = json.loads(schema_json)
    except (UnicodeDecodeError, json.JSONDecodeError) as exc:
        raise ValueError(f"invalid avro.schema JSON: {exc}") from exc
    schema = parse_avro_schema(schema_node)
    codec = meta.get("avro.codec", b"null").decode("utf-8", "replace")
    if codec in _DECLARED_CODECS:
        raise NotImplementedError(
            f"avro codec {codec!r} is a declared boundary (no {codec} "
            "library in-container)"
        )
    if codec not in _KNOWN_CODECS:
        raise ValueError(f"unknown avro codec {codec!r}")
    if pos + 16 > len(b):
        raise ValueError("truncated header sync marker")
    sync = b[pos : pos + 16]
    pos += 16

    blocks = []
    total = 0
    while pos < len(b):
        count, pos = _read_long(b, pos)
        if count <= 0:
            raise ValueError(f"data block with non-positive record count {count}")
        size, pos = _read_long(b, pos)
        if size < 0 or pos + size > len(b):
            raise ValueError(f"data block size {size} overruns the file")
        data = b[pos : pos + size]
        pos += size
        if pos + 16 > len(b):
            raise ValueError("truncated block sync marker")
        if b[pos : pos + 16] != sync:
            raise ValueError("block sync marker differs from the header's")
        pos += 16
        if codec == "deflate":
            try:
                data = zlib.decompress(data, -15)  # raw RFC 1951, no wrapper
            except zlib.error as exc:
                raise ValueError(f"corrupt deflate block: {exc}") from exc
        elif codec == "snappy":
            if len(data) < 4:
                raise ValueError("snappy block shorter than its CRC32 suffix")
            payload, crc = data[:-4], data[-4:]
            data = snappy_uncompress(payload)
            if zlib.crc32(data).to_bytes(4, "big") != crc:
                raise ValueError("snappy block CRC32 mismatch")
        if count > len(data) + 1:
            raise ValueError(
                f"block claims {count} records in {len(data)} bytes"
            )
        rpos = 0
        records = []
        for _ in range(count):
            rec, rpos = _decode(data, rpos, schema)
            records.append(rec)
        if rpos != len(data):
            raise ValueError(
                f"block records consume {rpos} of {len(data)} bytes"
            )
        blocks.append(
            {"n_records": count, "byte_size": size, "records": records}
        )
        total += count
    return {
        "schema": schema,
        "schema_json": schema_json,
        "meta": meta,
        "codec": codec,
        "sync": sync,
        "n_blocks": len(blocks),
        "n_records": total,
        "blocks": blocks,
    }


def build_avro_ocf(
    schema_node,
    records: list,
    *,
    codec: str = "null",
    sync: bytes = b"\xa5" * 16,
    records_per_block: int = 2,
    meta_extra: dict[str, bytes] | None = None,
) -> bytes:
    """Records -> a spec-shaped OCF (fixture writer)."""
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    if codec not in _KNOWN_CODECS:
        raise ValueError(f"fixture writer supports {sorted(_KNOWN_CODECS)}")
    schema = parse_avro_schema(schema_node)
    out = bytearray(AVRO_MAGIC)
    meta = {"avro.schema": json.dumps(schema_node).encode(),
            "avro.codec": codec.encode()}
    meta.update(meta_extra or {})
    _put_long(out, len(meta))
    for k, v in meta.items():
        _encode(out, k, {"kind": "string"})
        _encode(out, v, {"kind": "bytes"})
    _put_long(out, 0)
    out += sync
    for i in range(0, len(records), records_per_block):
        chunk = records[i : i + records_per_block]
        data = bytearray()
        for rec in chunk:
            _encode(data, rec, schema)
        data = bytes(data)
        if codec == "deflate":
            comp = zlib.compressobj(wbits=-15)
            data = comp.compress(data) + comp.flush()
        elif codec == "snappy":
            data = snappy_compress(data) + zlib.crc32(data).to_bytes(4, "big")
        _put_long(out, len(chunk))
        _put_long(out, len(data))
        out += data
        out += sync
    return bytes(out)


# --- Spark kernels (mapInPandas, the codec plan shape) --------------------------------

#: the fixture schema the report query's closed forms assume
AVRO_FIXTURE_SCHEMA = {
    "type": "record",
    "name": "Doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "score", "type": "double"},
        {"name": "name", "type": "string"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "opt", "type": ["null", "long"]},
        {"name": "meta", "type": {"type": "map", "values": "long"}},
        {"name": "kind", "type": {"type": "enum", "name": "Kind",
                                  "symbols": ["alpha", "beta", "gamma"]}},
    ],
}

_KIND_SYMBOLS = ("alpha", "beta", "gamma")


def _fixture_records(doc_id: int) -> list[dict]:
    recs = []
    for j in range(1 + doc_id % 5):
        recs.append({
            "id": doc_id * 10 + j,
            "score": doc_id * 0.5 + j * 0.25,
            "name": f"n{doc_id}-{j}",
            "tags": [f"t{i}" for i in range(j % 3)],
            "opt": None if j % 2 else doc_id + j,
            "meta": {"a": doc_id + j, "b": 2 * j} if j % 3 == 0 else {},
            "kind": _KIND_SYMBOLS[j % 3],
        })
    return recs


def synthesize_avro_blobs(df):
    """Deterministic OCF source: per ``doc_id`` a shard of
    1 + doc_id % 5 records (schema AVRO_FIXTURE_SCHEMA — every avro
    type family except float/fixed, which the unit tests cover), two
    records per block, codec cycling null/deflate/snappy by
    doc_id % 3, sync marker md5-derived per document — closed forms
    queries/ext_formats.py:avro_shard_report recomputes."""
    import hashlib

    import pandas as pd

    from ..sources.lake import widen

    def kernel(batches):
        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                codec = ("null", "deflate", "snappy")[did % 3]
                out["doc_id"].append(did)
                out["blob"].append(build_avro_ocf(
                    AVRO_FIXTURE_SCHEMA,
                    _fixture_records(did),
                    codec=codec,
                    sync=hashlib.md5(f"sync:{did}".encode()).digest(),
                ))
            yield pd.DataFrame(out)

    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


AVRO_REPORT_SCHEMA = (
    "doc_id long, block_idx int, n_records int, codec string, "
    "n_fields int, id_sum long, score_sum double, name_cat string, "
    "n_tags long, opt_sum long, meta_sum long, kind_cat string"
)


def avro_features(df):
    """OCF demux -> one row PER DATA BLOCK through the full contract
    (magic, metadata map, codec, per-block sync + exact byte
    accounting, typed decode): per block the record count, codec,
    field count from the PARSED schema, and per-column aggregates of
    the decoded values."""
    import pandas as pd

    def kernel(batches):
        cols = ("doc_id", "block_idx", "n_records", "codec", "n_fields",
                "id_sum", "score_sum", "name_cat", "n_tags", "opt_sum",
                "meta_sum", "kind_cat")
        for pdf in batches:
            out = {k: [] for k in cols}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                r = read_avro_ocf(bytes(blob))
                n_fields = len(r["schema"]["fields"])
                for bi, blk in enumerate(r["blocks"]):
                    recs = blk["records"]
                    out["doc_id"].append(doc_id)
                    out["block_idx"].append(bi)
                    out["n_records"].append(blk["n_records"])
                    out["codec"].append(r["codec"])
                    out["n_fields"].append(n_fields)
                    out["id_sum"].append(sum(x["id"] for x in recs))
                    score = 0.0
                    for x in recs:
                        score += x["score"]
                    out["score_sum"].append(score)
                    out["name_cat"].append(",".join(x["name"] for x in recs))
                    out["n_tags"].append(sum(len(x["tags"]) for x in recs))
                    out["opt_sum"].append(
                        sum(x["opt"] for x in recs if x["opt"] is not None)
                    )
                    out["meta_sum"].append(
                        sum(sum(x["meta"].values()) for x in recs)
                    )
                    out["kind_cat"].append(",".join(x["kind"] for x in recs))
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(kernel, AVRO_REPORT_SCHEMA)
