"""TFRecord shards + tf.train.Example parsing — the TensorFlow
training-data container, stdlib-only. Two public layers, both from
published specs:

1. TFRecord framing (TensorFlow's record format): per record a
   little-endian uint64 length, the masked CRC32C of those 8 length
   bytes, the payload, and the masked CRC32C of the payload. CRC32C is
   the Castagnoli CRC (reflected polynomial 0x82F63B78, the iSCSI/
   ext4 checksum; check value crc32c(b'123456789') = 0xE3069283 is
   pinned in tests) and the mask is the published
   ((crc >> 15) | (crc << 17)) + 0xA282EAD8 rotation — so corrupt
   payloads and truncations fail loudly instead of feeding garbage
   protos downstream.

2. The protobuf WIRE FORMAT subset tf.train.Example uses: varints
   (including 10-byte negative int64s), length-delimited fields,
   32-bit fixed floats, packed repeated scalars, and nested messages —
   Example { features: Features { map<string, Feature> } } with
   Feature one of BytesList / FloatList (packed float32) / Int64List
   (packed varints). Unknown fields are SKIPPED per wire type (the
   proto contract); deprecated group wire types raise.

Float note: FloatList carries float32; the kernel widens each value to
double exactly (binary32 -> binary64 is exact), and oracle fixtures use
values exactly representable in float32 so the SQL closed forms are
hash-exact.

Reference parity note: the reference repo has no ML-container layer
(SURVEY.md section 4); this module belongs to the training-data
pillar.
"""

from __future__ import annotations

import struct

__all__ = [
    "crc32c",
    "encode_example",
    "parse_example",
    "read_tfrecord",
    "write_tfrecord",
]

# --- CRC32C (Castagnoli, reflected) --------------------------------------------------

_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | ((crc << 17) & 0xFFFFFFFF))
            + 0xA282EAD8) & 0xFFFFFFFF


# --- TFRecord framing ----------------------------------------------------------------


def write_tfrecord(payloads: list[bytes]) -> bytes:
    """Serialized messages -> a TFRecord shard (length + masked length
    CRC + payload + masked payload CRC per record)."""
    out = bytearray()
    for p in payloads:
        ln = struct.pack("<Q", len(p))
        out += ln + struct.pack("<I", _masked_crc(ln))
        out += p + struct.pack("<I", _masked_crc(p))
    return bytes(out)


def read_tfrecord(b: bytes) -> list[bytes]:
    """TFRecord shard -> payload list with BOTH masked CRCs verified
    per record; truncation, trailing garbage, and checksum mismatches
    raise ValueError."""
    out = []
    pos = 0
    n = len(b)
    while pos < n:
        if pos + 12 > n:
            raise ValueError(f"truncated record header at offset {pos}")
        (ln,) = struct.unpack_from("<Q", b, pos)
        (lcrc,) = struct.unpack_from("<I", b, pos + 8)
        if _masked_crc(b[pos : pos + 8]) != lcrc:
            raise ValueError(f"length CRC mismatch at offset {pos}")
        pos += 12
        if pos + ln + 4 > n:
            raise ValueError(f"truncated record payload at offset {pos}")
        payload = b[pos : pos + ln]
        (pcrc,) = struct.unpack_from("<I", b, pos + ln)
        if _masked_crc(payload) != pcrc:
            raise ValueError(f"payload CRC mismatch at offset {pos}")
        out.append(payload)
        pos += ln + 4
    if not out:
        raise ValueError("empty TFRecord shard")
    return out


# --- protobuf wire format ------------------------------------------------------------


def _put_varint(out: bytearray, v: int) -> None:
    if v < 0:
        v &= (1 << 64) - 1  # two's-complement 64-bit
    while True:
        byte = v & 0x7F
        v >>= 7
        if v:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return


def _get_varint(b: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    v = 0
    while True:
        if pos >= len(b):
            raise ValueError("truncated varint")
        byte = b[pos]
        pos += 1
        v |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
        if shift > 63:
            raise ValueError("varint longer than 64 bits")
    return v, pos


def _ld(field: int, payload: bytes) -> bytes:
    """One length-delimited field (wire type 2)."""
    out = bytearray()
    _put_varint(out, (field << 3) | 2)
    _put_varint(out, len(payload))
    return bytes(out) + payload


def encode_example(features: dict) -> bytes:
    """{name: list[int] | list[float] | list[bytes]} -> a serialized
    tf.train.Example (list element type picks Int64List / FloatList /
    BytesList; empty lists are rejected — a typeless feature is a
    fixture bug)."""
    entries = bytearray()
    for name, values in features.items():
        if not values:
            raise ValueError(f"feature {name!r} has no values")
        v0 = values[0]
        if isinstance(v0, bytes):
            inner = b"".join(_ld(1, v) for v in values)
            feature = _ld(1, inner)  # Feature.bytes_list
        elif isinstance(v0, float):
            packed = struct.pack(f"<{len(values)}f", *values)
            lst = bytearray()
            _put_varint(lst, (1 << 3) | 2)
            _put_varint(lst, len(packed))
            feature = _ld(2, bytes(lst) + packed)  # Feature.float_list
        elif isinstance(v0, int):
            packed = bytearray()
            for v in values:
                _put_varint(packed, v)
            lst = bytearray()
            _put_varint(lst, (1 << 3) | 2)
            _put_varint(lst, len(packed))
            feature = _ld(3, bytes(lst) + bytes(packed))  # .int64_list
        else:
            raise ValueError(f"feature {name!r}: unsupported {type(v0)}")
        entry = _ld(1, name.encode("utf-8")) + _ld(2, feature)
        entries += _ld(1, entry)  # Features.feature map entry
    return _ld(1, bytes(entries))  # Example.features


def _fields(b: bytes):
    """Iterate (field_number, wire_type, value_bytes_or_int) over one
    message's wire bytes. Length-delimited values come back as bytes;
    varints as ints; fixed32/64 as raw bytes."""
    pos = 0
    n = len(b)
    while pos < n:
        tag, pos = _get_varint(b, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            v, pos = _get_varint(b, pos)
            yield field, wire, v
        elif wire == 2:
            ln, pos = _get_varint(b, pos)
            if pos + ln > n:
                raise ValueError("length-delimited field overruns message")
            yield field, wire, b[pos : pos + ln]
            pos += ln
        elif wire in (1, 5):
            size = 8 if wire == 1 else 4
            if pos + size > n:
                raise ValueError("fixed-width field overruns message")
            yield field, wire, b[pos : pos + size]
            pos += size
        else:
            raise NotImplementedError(
                f"deprecated proto group wire type {wire} not supported"
            )


def _to_int64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def parse_example(b: bytes) -> dict:
    """Serialized tf.train.Example -> {name: (kind, values)} with kind
    in {'int64', 'float', 'bytes'}; float32 values widened exactly to
    double. Unknown fields anywhere are skipped; a Feature with no
    recognized list raises."""
    # repeated occurrences of an embedded-message field MERGE
    # (concatenate) per the proto spec — TF itself honors message
    # concatenation, so last-wins would silently drop features
    features_parts = [val for field, wire, val in _fields(b)
                      if field == 1 and wire == 2]
    if not features_parts:
        raise ValueError("Example has no features message")
    out: dict = {}
    for field, wire, entry in _fields(b"".join(features_parts)):
        if field != 1 or wire != 2:
            continue
        name = None
        feature_parts = []
        for f2, w2, v2 in _fields(entry):
            if f2 == 1 and w2 == 2:
                name = v2.decode("utf-8")
            elif f2 == 2 and w2 == 2:
                feature_parts.append(v2)  # embedded messages merge
        if name is None or not feature_parts:
            raise ValueError("map entry missing its key or Feature")
        # oneof merge semantics: a repeated occurrence of the SAME list
        # kind merges (values concatenate); a different kind replaces
        kind = values = None

        def fresh(new_kind):
            nonlocal kind, values
            if kind != new_kind:
                kind, values = new_kind, []
            return values

        for f3, w3, v3 in _fields(b"".join(feature_parts)):
            if f3 == 1 and w3 == 2:  # BytesList
                fresh("bytes").extend(
                    v4 for f4, w4, v4 in _fields(v3)
                    if f4 == 1 and w4 == 2
                )
            elif f3 == 2 and w3 == 2:  # FloatList
                values = fresh("float")
                for f4, w4, v4 in _fields(v3):
                    if f4 == 1 and w4 == 2:  # packed
                        if len(v4) % 4:
                            raise ValueError("packed float32 length % 4")
                        values.extend(
                            float(x) for x in struct.unpack(
                                f"<{len(v4) // 4}f", v4)
                        )
                    elif f4 == 1 and w4 == 5:  # unpacked
                        values.append(float(struct.unpack("<f", v4)[0]))
            elif f3 == 3 and w3 == 2:  # Int64List
                values = fresh("int64")
                for f4, w4, v4 in _fields(v3):
                    if f4 == 1 and w4 == 2:  # packed varints
                        p = 0
                        while p < len(v4):
                            x, p = _get_varint(v4, p)
                            values.append(_to_int64(x))
                    elif f4 == 1 and w4 == 0:  # unpacked
                        values.append(_to_int64(v4))
        if kind is None:
            raise ValueError(f"feature {name!r} has no recognized list")
        out[name] = (kind, values)
    if not out:
        raise ValueError("Example has an empty feature map")
    return out


# --- Spark kernels (mapInPandas, the codec plan shape) --------------------------------


def synthesize_tfrecord_blobs(df):
    """Deterministic TFRecord source: per ``doc_id`` a shard of
    1 + doc_id % 3 tf.train.Example records, example j carrying

      'id':    Int64List [doc_id*100 + j, -(doc_id + j)]   (negative
               pins the 10-byte varint path)
      'score': FloatList [doc_id*0.25, j + 0.5]            (exactly
               float32-representable)
      'tok':   BytesList [b'w{doc_id}-{j}']

    — closed forms queries/ext_multimodal.py:tfrecord_report
    recomputes."""
    import pandas as pd

    from ..sources.lake import widen

    def kernel(batches):
        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                payloads = [
                    encode_example({
                        "id": [did * 100 + j, -(did + j)],
                        "score": [did * 0.25, j + 0.5],
                        "tok": [f"w{did}-{j}".encode()],
                    })
                    for j in range(1 + did % 3)
                ]
                out["doc_id"].append(did)
                out["blob"].append(write_tfrecord(payloads))
            yield pd.DataFrame(out)

    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


TFRECORD_SCHEMA = (
    "doc_id long, ex_idx int, id_sum long, score_sum double, "
    "tok string, n_features int"
)


def tfrecord_features(df):
    """TFRecord demux -> one row PER EXAMPLE through CRC verification
    and the wire-format parser: (doc_id, ex_idx, id_sum, score_sum,
    tok, n_features)."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "ex_idx", "id_sum",
                                   "score_sum", "tok", "n_features")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                for j, payload in enumerate(read_tfrecord(bytes(blob))):
                    ex = parse_example(payload)
                    kind, ids = ex["id"]
                    kindf, scores = ex["score"]
                    kindb, toks = ex["tok"]
                    if (kind, kindf, kindb) != ("int64", "float", "bytes"):
                        raise ValueError(
                            f"example {j}: feature kinds "
                            f"{(kind, kindf, kindb)} != "
                            "('int64', 'float', 'bytes')"
                        )
                    out["doc_id"].append(doc_id)
                    out["ex_idx"].append(j)
                    out["id_sum"].append(sum(ids))
                    out["score_sum"].append(scores[0] + scores[1])
                    out["tok"].append(toks[0].decode("utf-8"))
                    out["n_features"].append(len(ex))
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(kernel, TFRECORD_SCHEMA)
