"""Arrow IPC file reader — a hand-rolled FlatBuffers walk of the
random-access file format from the PUBLIC Arrow spec
(arrow.apache.org/docs/format/Columnar.html; Schema.fbs / Message.fbs /
File.fbs), the columnar arrival format next to the row-oriented Avro
OCF (avro_ocf.py):

- FlatBuffers access layer: root offset, vtable-indirected field
  lookup (soffset -> vtable, per-field uoffsets, absent-field
  defaults), vectors, strings, inline structs — every read
  bounds-checked so crafted offsets raise ValueError, never IndexError
  or struct.error;
- File layout: leading ``ARROW1\\0\\0`` / trailing ``ARROW1`` magic,
  trailing int32 footer length, Footer table (version, Schema,
  dictionary blocks, recordBatch blocks of inline 24-byte Block
  structs);
- Message envelope per batch: 0xFFFFFFFF continuation marker, int32
  metadata size, Message table (header union must be RecordBatch,
  declared bodyLength reconciled against the footer's Block), 8-byte
  aligned body;
- RecordBatch decode: FieldNode/Buffer struct vectors walked in
  schema pre-order; validity bitmaps popcount-checked against each
  node's declared null_count, utf8 offset vectors checked monotone
  from zero, every buffer bounds- and alignment-checked;
- Body compression (BodyCompression): LZ4_FRAME buffers — each an
  int64 uncompressed-length prefix plus a REAL LZ4 frame — are decoded
  by our own lz4zstd.py frame codec, giving the hand-rolled LZ4
  decoder foreign-file interop against pyarrow's C++ writer; ZSTD
  bodies are a declared boundary (NotImplementedError);
- Dictionary encoding: DictionaryBatch messages (footer dictionary
  blocks in the file form; interleaved messages, with delta append
  and stream-only replacement, in the stream form) deliver value
  vectors that index-mapped columns resolve through, with signed
  8/16/32/64-bit index types and out-of-range indices rejected.

Supported logical types are the audit fixture's int64 / float64 /
utf8 / bool (plain or dictionary-encoded); other type ids raise the
declared-boundary error with the id named.

Reference parity note: the reference repo has no columnar-IPC layer
(SURVEY.md section 4); this belongs to the training-data pillar's
arrival formats (TFRecord, WebDataset, ZIP, Avro, Parquet, ORC).
"""

from __future__ import annotations

import struct

__all__ = [
    "ARROW_FILE_MAGIC",
    "read_arrow_file",
    "read_arrow_stream",
]

ARROW_FILE_MAGIC = b"ARROW1"

_TYPE_INT, _TYPE_FP, _TYPE_UTF8, _TYPE_BOOL = 2, 3, 5, 6
_RECORD_BATCH = 3  # MessageHeader union member
_MAX_FIELDS = 10_000
_MAX_BATCHES = 1_000_000


def _need(b: bytes, p: int, n: int, what: str) -> None:
    if p < 0 or n < 0 or p + n > len(b):
        raise ValueError(f"arrow ipc: {what} out of bounds ({p}+{n} of {len(b)})")


def _u8(b, p):
    _need(b, p, 1, "u8")
    return b[p]


def _u16(b, p):
    _need(b, p, 2, "u16")
    return struct.unpack_from("<H", b, p)[0]


def _i16(b, p):
    _need(b, p, 2, "i16")
    return struct.unpack_from("<h", b, p)[0]


def _u32(b, p):
    _need(b, p, 4, "u32")
    return struct.unpack_from("<I", b, p)[0]


def _i32(b, p):
    _need(b, p, 4, "i32")
    return struct.unpack_from("<i", b, p)[0]


def _i64(b, p):
    _need(b, p, 8, "i64")
    return struct.unpack_from("<q", b, p)[0]


def _root(b: bytes, base: int) -> int:
    return base + _u32(b, base)


def _field_pos(b: bytes, tpos: int, idx: int) -> int | None:
    """Absolute position of table field ``idx``'s stored value, or
    None when the vtable marks it absent (FlatBuffers default)."""
    soff = _i32(b, tpos)
    vt = tpos - soff
    if vt < 0:
        raise ValueError("arrow ipc: vtable before buffer start")
    vtsize = _u16(b, vt)
    off = 4 + 2 * idx
    if off + 2 > vtsize:
        return None
    fo = _u16(b, vt + off)
    return tpos + fo if fo else None


def _tbl(b: bytes, tpos: int, idx: int) -> int | None:
    p = _field_pos(b, tpos, idx)
    return None if p is None else p + _u32(b, p)


def _vecf(b: bytes, tpos: int, idx: int) -> tuple[int, int] | None:
    """(element base, length) of a vector-valued field, or None."""
    p = _field_pos(b, tpos, idx)
    if p is None:
        return None
    v = p + _u32(b, p)
    n = _u32(b, v)
    return v + 4, n


def _stringf(b: bytes, tpos: int, idx: int) -> str | None:
    p = _field_pos(b, tpos, idx)
    if p is None:
        return None
    s = p + _u32(b, p)
    n = _u32(b, s)
    _need(b, s + 4, n, "string")
    return b[s + 4 : s + 4 + n].decode("utf-8", "replace")


def _scalarf(b: bytes, tpos: int, idx: int, rd, default):
    p = _field_pos(b, tpos, idx)
    return default if p is None else rd(b, p)


def _parse_schema(
    b: bytes, spos: int
) -> tuple[list[tuple[str, str, bool]], list]:
    """Schema table -> (fields, encodings): fields as (name, kind,
    nullable) with kind ``dict<valuekind>`` for dictionary-encoded
    columns, and a parallel ``encodings`` list of None or
    (dictionary id, index bit width, value kind)."""
    fv = _vecf(b, spos, 1)  # Schema.fields
    if fv is None:
        raise ValueError("arrow ipc: schema without fields")
    base, n = fv
    if n > _MAX_FIELDS:
        raise ValueError(f"arrow ipc: absurd field count {n}")
    fields = []
    encodings: list = []
    for i in range(n):
        fpos = base + 4 * i + _u32(b, base + 4 * i)
        name = _stringf(b, fpos, 0)
        if name is None:
            raise ValueError("arrow ipc: field without a name")
        nullable = bool(_scalarf(b, fpos, 1, _u8, 0))
        tt = _scalarf(b, fpos, 2, _u8, 0)  # Type union tag
        tpos = _tbl(b, fpos, 3)
        ch = _vecf(b, fpos, 5)
        if ch is not None and ch[1] > 0:
            raise NotImplementedError(
                "arrow ipc: nested children are a declared boundary"
            )
        if tt == _TYPE_INT:
            if tpos is None:
                raise ValueError("arrow ipc: Int field without a type table")
            bw = _scalarf(b, tpos, 0, _i32, 0)
            sg = bool(_scalarf(b, tpos, 1, _u8, 0))
            if (bw, sg) != (64, True):
                raise NotImplementedError(
                    f"arrow ipc: int bitWidth={bw} signed={sg} is a "
                    "declared boundary (audit supports int64)"
                )
            kind = "int64"
        elif tt == _TYPE_FP:
            if tpos is None:
                raise ValueError("arrow ipc: fp field without a type table")
            if _scalarf(b, tpos, 0, _i16, 0) != 2:  # precision DOUBLE
                raise NotImplementedError(
                    "arrow ipc: non-double floating point is a declared "
                    "boundary"
                )
            kind = "float64"
        elif tt == _TYPE_UTF8:
            kind = "utf8"
        elif tt == _TYPE_BOOL:
            kind = "bool"
        else:
            raise NotImplementedError(
                f"arrow ipc: type id {tt} is a declared boundary"
            )
        # DictionaryEncoding (Field.dictionary): the field's type above
        # is the dictionary's VALUE type; data batches carry indices of
        # the encoding's Int indexType (int32 signed by default)
        dpos = _tbl(b, fpos, 4)
        if dpos is None:
            fields.append((name, kind, nullable))
            encodings.append(None)
        else:
            did = _scalarf(b, dpos, 0, _i64, 0)
            bits, signed = 32, True
            itpos = _tbl(b, dpos, 1)
            if itpos is not None:
                bits = _scalarf(b, itpos, 0, _i32, 0)
                signed = bool(_scalarf(b, itpos, 1, _u8, 0))
            if bits not in (8, 16, 32, 64) or not signed:
                raise NotImplementedError(
                    f"arrow ipc: dictionary index int{bits} signed="
                    f"{signed} is a declared boundary"
                )
            fields.append((name, f"dict<{kind}>", nullable))
            encodings.append((did, bits, kind))
    return fields, encodings


def _decompressed(body: bytes, off: int, ln: int, codec: str | None,
                  lz4_decompress) -> bytes:
    if off < 0 or off + ln > len(body):
        raise ValueError("arrow ipc: buffer overruns the body")
    if off % 8:
        raise ValueError("arrow ipc: buffer misaligned")
    raw = body[off : off + ln]
    if codec is None or ln == 0:
        return raw
    if ln < 8:
        raise ValueError("arrow ipc: compressed buffer lacks its "
                         "uncompressed-length prefix")
    (ulen,) = struct.unpack_from("<q", raw, 0)
    if ulen == -1:  # spec: -1 marks a buffer stored uncompressed
        return raw[8:]
    if ulen < 0:
        raise ValueError(f"arrow ipc: negative uncompressed length {ulen}")
    out = lz4_decompress(raw[8:])
    if len(out) != ulen:
        raise ValueError(
            f"arrow ipc: buffer decodes to {len(out)} bytes, prefix "
            f"declares {ulen}"
        )
    return out


_IDX_FMT = {8: "<b", 16: "<h", 32: "<i", 64: "<q"}


def _decode_batch(b: bytes, hdr: int, body: bytes, fields: list,
                  encodings: list | None = None,
                  dicts: dict | None = None) -> tuple[dict, str | None]:
    """One RecordBatch header table + its body -> ({n_rows, columns},
    codec) with every node/buffer/bitmap claim checked. Dictionary-
    encoded columns decode their index buffer and map through
    ``dicts`` (id -> value list, accumulated from dictionary
    batches)."""
    from .lz4zstd import lz4_frame_decompress

    if encodings is None:
        encodings = [None] * len(fields)
    dicts = dicts or {}
    nrows = _scalarf(b, hdr, 0, _i64, 0)
    if nrows < 0:
        raise ValueError("arrow ipc: negative batch length")
    nv = _vecf(b, hdr, 1)
    bufv = _vecf(b, hdr, 2)
    if nv is None or bufv is None:
        raise ValueError("arrow ipc: record batch without nodes/buffers")
    if nv[1] != len(fields):
        raise ValueError(
            f"arrow ipc: {nv[1]} field nodes for {len(fields)} fields"
        )
    want_bufs = sum(
        2 if enc is not None else (3 if k == "utf8" else 2)
        for (_, k, _), enc in zip(fields, encodings)
    )
    if bufv[1] != want_bufs:
        raise ValueError(
            f"arrow ipc: {bufv[1]} buffers, schema needs {want_bufs}"
        )
    nodes = [(_i64(b, nv[0] + 16 * i), _i64(b, nv[0] + 16 * i + 8))
             for i in range(nv[1])]
    bufs = [(_i64(b, bufv[0] + 16 * i), _i64(b, bufv[0] + 16 * i + 8))
            for i in range(bufv[1])]

    codec = None
    comp = _tbl(b, hdr, 3)  # BodyCompression
    if comp is not None:
        cid = _scalarf(b, comp, 0, _u8, 0)
        if _scalarf(b, comp, 1, _u8, 0) != 0:  # method: BUFFER
            raise NotImplementedError(
                "arrow ipc: non-buffer compression method is a "
                "declared boundary"
            )
        if cid == 1:
            raise NotImplementedError(
                "arrow ipc: zstd body compression is a declared "
                "boundary (entropy-coded; no zstd library in-container)"
            )
        if cid != 0:
            raise ValueError(f"arrow ipc: unknown codec id {cid}")
        codec = "lz4"

    cols: dict[str, list] = {}
    cur = 0

    def buf(i: int) -> bytes:
        return _decompressed(body, bufs[i][0], bufs[i][1], codec,
                             lz4_frame_decompress)

    for (name, kind, _nullable), enc, (nlen, nnull) in zip(fields,
                                                           encodings, nodes):
        if nlen != nrows:
            raise ValueError(
                "arrow ipc: field node length differs from the batch "
                "length"
            )
        if nnull < 0 or nnull > nlen:
            raise ValueError("arrow ipc: impossible null_count")
        validity = buf(cur)
        cur += 1
        if nnull == 0 and len(validity) == 0:
            valid = [True] * nlen
        else:
            if len(validity) < (nlen + 7) // 8:
                raise ValueError("arrow ipc: validity bitmap too short")
            valid = [bool((validity[i >> 3] >> (i & 7)) & 1)
                     for i in range(nlen)]
            if nlen - sum(valid) != nnull:
                raise ValueError(
                    "arrow ipc: null_count disagrees with the bitmap"
                )
        if enc is not None:
            did, bits, _vkind = enc
            if did not in dicts:
                raise ValueError(
                    f"arrow ipc: column {name!r} references dictionary "
                    f"{did} before any dictionary batch delivered it"
                )
            dvals = dicts[did]
            data = buf(cur)
            cur += 1
            width = bits // 8
            if len(data) < width * nlen:
                raise ValueError("arrow ipc: index buffer too short")
            fmt = _IDX_FMT[bits]
            vals = []
            for i in range(nlen):
                if not valid[i]:
                    vals.append(None)
                    continue
                (idx,) = struct.unpack_from(fmt, data, width * i)
                if not 0 <= idx < len(dvals):
                    raise ValueError(
                        f"arrow ipc: dictionary index {idx} outside the "
                        f"{len(dvals)}-entry dictionary {did}"
                    )
                vals.append(dvals[idx])
        elif kind in ("int64", "float64"):
            data = buf(cur)
            cur += 1
            if len(data) < 8 * nlen:
                raise ValueError("arrow ipc: data buffer too short")
            fmt = "<q" if kind == "int64" else "<d"
            vals = [
                struct.unpack_from(fmt, data, 8 * i)[0]
                if valid[i] else None
                for i in range(nlen)
            ]
        elif kind == "bool":
            data = buf(cur)
            cur += 1
            if len(data) < (nlen + 7) // 8:
                raise ValueError("arrow ipc: bool buffer too short")
            vals = [
                bool((data[i >> 3] >> (i & 7)) & 1) if valid[i] else None
                for i in range(nlen)
            ]
        else:  # utf8
            offs = buf(cur)
            cur += 1
            data = buf(cur)
            cur += 1
            if len(offs) < 4 * (nlen + 1):
                raise ValueError("arrow ipc: offsets buffer too short")
            o = [struct.unpack_from("<i", offs, 4 * i)[0]
                 for i in range(nlen + 1)]
            if o[0] != 0 or any(o[i] > o[i + 1] for i in range(nlen)):
                raise ValueError(
                    "arrow ipc: offsets not monotone from zero"
                )
            if o[-1] > len(data):
                raise ValueError("arrow ipc: string data overrun")
            try:
                vals = [
                    data[o[i]:o[i + 1]].decode("utf-8")
                    if valid[i] else None
                    for i in range(nlen)
                ]
            except UnicodeDecodeError as exc:
                raise ValueError(
                    f"arrow ipc: utf8 column carries invalid utf-8: "
                    f"{exc}"
                ) from exc
        cols[name] = vals
    return {"n_rows": nrows, "columns": cols}, codec


def _apply_dictionary_message(b: bytes, mroot: int, body: bytes,
                              encodings: list, dicts: dict,
                              *, allow_replace: bool) -> None:
    """DictionaryBatch message -> update ``dicts``. The inner
    RecordBatch carries ONE column of the dictionary's value type;
    isDelta appends, otherwise the id is defined (stream format may
    replace; the file format forbids replacement)."""
    hdr = _tbl(b, mroot, 2)
    if hdr is None:
        raise ValueError("arrow ipc: dictionary message without a header")
    did = _scalarf(b, hdr, 0, _i64, 0)
    by_id = {e[0]: e[2] for e in encodings if e is not None}
    if did not in by_id:
        raise ValueError(
            f"arrow ipc: dictionary batch for id {did} that no schema "
            "field references"
        )
    data = _tbl(b, hdr, 1)
    if data is None:
        raise ValueError("arrow ipc: dictionary batch without data")
    batch, _ = _decode_batch(b, data, body, [("v", by_id[did], True)])
    vals = batch["columns"]["v"]
    if any(v is None for v in vals):
        raise ValueError(f"arrow ipc: dictionary {did} contains nulls")
    if bool(_scalarf(b, hdr, 2, _u8, 0)):  # isDelta
        dicts[did] = dicts.get(did, []) + vals
    elif did in dicts and not allow_replace:
        raise ValueError(
            f"arrow ipc: dictionary {did} redefined in the file format "
            "(replacement is stream-only)"
        )
    else:
        dicts[did] = vals


def read_arrow_file(b: bytes) -> dict:
    """Arrow IPC file bytes -> {version, fields, n_batches, batches:
    [{n_rows, columns: {name: [python values]}}], compression} under
    the format's full contract (see the module docstring)."""
    if b[:8] != ARROW_FILE_MAGIC + b"\x00\x00":
        raise ValueError("arrow ipc: bad leading magic")
    if b[-6:] != ARROW_FILE_MAGIC:
        raise ValueError("arrow ipc: bad trailing magic")
    if len(b) < 24:
        raise ValueError("arrow ipc: file too short for a footer")
    flen = _u32(b, len(b) - 10)
    fpos = len(b) - 10 - flen
    if fpos < 8:
        raise ValueError("arrow ipc: footer overruns the file")
    fb = _root(b, fpos)
    version = _scalarf(b, fb, 0, _i16, 0)
    spos = _tbl(b, fb, 1)
    if spos is None:
        raise ValueError("arrow ipc: footer without a schema")
    fields, encodings = _parse_schema(b, spos)
    rv = _vecf(b, fb, 3)
    if rv is None:
        raise ValueError("arrow ipc: footer without recordBatches")
    rbase, rn = rv
    if rn > _MAX_BATCHES:
        raise ValueError(f"arrow ipc: absurd batch count {rn}")

    def envelope(boff: int, blen: int, bi: int, want: int) -> tuple:
        if boff < 8:
            raise ValueError("arrow ipc: block offset inside the magic")
        if _u32(b, boff) != 0xFFFFFFFF:
            raise ValueError("arrow ipc: missing continuation marker")
        msize = _u32(b, boff + 4)
        mroot = _root(b, boff + 8)
        htype = _scalarf(b, mroot, 1, _u8, 0)
        if htype != want:
            raise ValueError(
                f"arrow ipc: block {bi} header type {htype} is not "
                f"{'a RecordBatch' if want == _RECORD_BATCH else 'a DictionaryBatch'}"
            )
        if _scalarf(b, mroot, 3, _i64, 0) != blen:
            raise ValueError(
                "arrow ipc: message bodyLength differs from the footer's "
                "block entry"
            )
        bstart = boff + 8 + msize
        if bstart % 8:
            raise ValueError("arrow ipc: body start misaligned")
        _need(b, bstart, blen, "body")
        return mroot, b[bstart : bstart + blen]

    dicts: dict = {}
    dv = _vecf(b, fb, 2)
    if dv is not None:
        dbase, dn = dv
        if dn > _MAX_BATCHES:
            raise ValueError(f"arrow ipc: absurd dictionary count {dn}")
        for bi in range(dn):
            sp = dbase + 24 * bi  # inline Block struct
            mroot, body = envelope(_i64(b, sp), _i64(b, sp + 16), bi, 2)
            _apply_dictionary_message(b, mroot, body, encodings, dicts,
                                      allow_replace=False)

    batches = []
    compression = "none"
    for bi in range(rn):
        sp = rbase + 24 * bi  # inline Block struct
        mroot, body = envelope(_i64(b, sp), _i64(b, sp + 16), bi,
                               _RECORD_BATCH)
        hdr = _tbl(b, mroot, 2)
        if hdr is None:
            raise ValueError("arrow ipc: message without a header")
        batch, codec = _decode_batch(b, hdr, body, fields, encodings,
                                     dicts)
        if codec:
            compression = codec
        batches.append(batch)

    return {
        "version": version,
        "fields": fields,
        "n_batches": rn,
        "batches": batches,
        "compression": compression,
    }


def read_arrow_stream(b: bytes) -> dict:
    """Arrow IPC STREAM bytes -> the same shape as read_arrow_file —
    the footer-less sequential twin: a Schema message must lead,
    RecordBatch messages follow, and the stream ends at the
    end-of-stream marker (continuation + zero length) or EOF. Without
    a footer there is no random access — exactly why the FILE format
    exists — so this walk is the Flight/socket-arrival shape while
    read_arrow_file is the lake shape."""
    pos = 0
    n = len(b)
    fields = None
    encodings: list = []
    dicts: dict = {}
    batches = []
    compression = "none"
    while True:
        if pos == n:
            break  # EOF without an explicit EOS marker is legal
        if _u32(b, pos) != 0xFFFFFFFF:
            raise ValueError("arrow ipc: missing continuation marker")
        msize = _u32(b, pos + 4)
        if msize == 0:
            pos += 8
            if pos != n:
                raise ValueError(
                    "arrow ipc: bytes after the end-of-stream marker"
                )
            break
        mroot = _root(b, pos + 8)
        htype = _scalarf(b, mroot, 1, _u8, 0)
        blen = _scalarf(b, mroot, 3, _i64, 0)
        if blen < 0:
            raise ValueError("arrow ipc: negative bodyLength")
        bstart = pos + 8 + msize
        if bstart % 8:
            raise ValueError("arrow ipc: body start misaligned")
        _need(b, bstart, blen, "body")
        if fields is None:
            if htype != 1:  # MessageHeader.Schema
                raise ValueError(
                    f"arrow ipc: stream starts with header type {htype}, "
                    "not a Schema message"
                )
            hdr = _tbl(b, mroot, 2)
            if hdr is None:
                raise ValueError("arrow ipc: message without a header")
            fields, encodings = _parse_schema(b, hdr)
            if blen != 0:
                raise ValueError("arrow ipc: schema message with a body")
        elif htype == 2:
            body = b[bstart : bstart + blen]
            _apply_dictionary_message(b, mroot, body, encodings, dicts,
                                      allow_replace=True)
        elif htype == _RECORD_BATCH:
            hdr = _tbl(b, mroot, 2)
            if hdr is None:
                raise ValueError("arrow ipc: message without a header")
            body = b[bstart : bstart + blen]
            batch, codec = _decode_batch(b, hdr, body, fields, encodings,
                                         dicts)
            if codec:
                compression = codec
            batches.append(batch)
            if len(batches) > _MAX_BATCHES:
                raise ValueError("arrow ipc: absurd batch count")
        else:
            raise ValueError(
                f"arrow ipc: unexpected stream header type {htype}"
            )
        pos = bstart + blen
    if fields is None:
        raise ValueError("arrow ipc: empty stream (no schema message)")
    return {
        "version": None,
        "fields": fields,
        "n_batches": len(batches),
        "batches": batches,
        "compression": compression,
    }


# --- deterministic fixture (pyarrow IS the foreign writer) -----------------------------


def build_arrow_blob(doc_id: int, *, stream: bool = False) -> bytes:
    """One Arrow IPC file per document, written by PYARROW (the
    foreign C++ writer, not our code): 3 + doc_id % 5 rows of closed
    forms split into 2-row batches, LZ4-frame body compression on odd
    documents — so the reader (and through it the LZ4 frame codec) is
    held to real cross-implementation interop on every document."""
    import io

    import pyarrow as pa

    nr = 3 + doc_id % 5
    t = pa.table({
        "id": pa.array(
            [None if j % 4 == 3 else doc_id * 10 + j for j in range(nr)],
            pa.int64()),
        "val": pa.array(
            [doc_id * 0.5 + j * 0.25 for j in range(nr)], pa.float64()),
        "name": pa.array(
            [None if j % 5 == 4 else f"n{doc_id}-{j}" for j in range(nr)],
            pa.utf8()),
        "cat": pa.array(
            [None if j % 6 == 5 else f"cat{j % 3}" for j in range(nr)],
            pa.utf8()).dictionary_encode(),
    })
    opts = pa.ipc.IpcWriteOptions(
        compression="lz4" if doc_id % 2 else None)
    sink = io.BytesIO()
    opener = pa.ipc.new_stream if stream else pa.ipc.new_file
    with opener(sink, t.schema, options=opts) as w:
        w.write_table(t, max_chunksize=2)
    return sink.getvalue()


# --- Spark kernels (mapInPandas, the codec plan shape) --------------------------------


def synthesize_arrow_blobs(df, *, stream: bool = False):
    """Deterministic source: per ``doc_id`` one pyarrow-written IPC
    file — or, with ``stream=True``, the footer-less stream encoding
    of the SAME batches (build_arrow_blob)."""
    import pandas as pd

    from ..sources.lake import widen

    def kernel(batches):
        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                out["doc_id"].append(did)
                out["blob"].append(build_arrow_blob(did, stream=stream))
            yield pd.DataFrame(out)

    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


ARROW_REPORT_SCHEMA = (
    "doc_id long, batch_idx int, n_rows int, id_nulls int, id_sum long, "
    "val_sum double, name_chars long, name_cat string, cat_nulls int, "
    "cat_cat string, compressed boolean"
)


def arrow_batch_features(df, *, stream: bool = False):
    """File (or stream) walk -> one fact row per (document, record
    batch): row and null accounting plus per-column aggregates of the
    DECODED values — a wrong vtable lookup, a bad validity popcount,
    or a mis-decoded LZ4 buffer all land on the hash path."""
    import pandas as pd

    reader = read_arrow_stream if stream else read_arrow_file

    def kernel(batches):
        cols = ("doc_id", "batch_idx", "n_rows", "id_nulls", "id_sum",
                "val_sum", "name_chars", "name_cat", "cat_nulls",
                "cat_cat", "compressed")
        for pdf in batches:
            out = {k: [] for k in cols}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                r = reader(bytes(blob))
                want = [("id", "int64", True), ("val", "float64", True),
                        ("name", "utf8", True), ("cat", "dict<utf8>", True)]
                if r["fields"] != want:
                    raise ValueError(
                        f"unexpected audit schema {r['fields']}"
                    )
                for bi, bt in enumerate(r["batches"]):
                    ids = bt["columns"]["id"]
                    vals = bt["columns"]["val"]
                    names = bt["columns"]["name"]
                    cats = bt["columns"]["cat"]
                    kept = [s for s in names if s is not None]
                    ckept = [c for c in cats if c is not None]
                    out["doc_id"].append(doc_id)
                    out["batch_idx"].append(bi)
                    out["n_rows"].append(bt["n_rows"])
                    out["id_nulls"].append(sum(1 for v in ids if v is None))
                    out["id_sum"].append(
                        sum(v for v in ids if v is not None))
                    out["val_sum"].append(sum(vals))
                    out["name_chars"].append(sum(len(s) for s in kept))
                    out["name_cat"].append(
                        ",".join(kept) if kept else None)
                    out["cat_nulls"].append(
                        sum(1 for c in cats if c is None))
                    out["cat_cat"].append(
                        ",".join(ckept) if ckept else None)
                    out["compressed"].append(r["compression"] == "lz4")
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(
        kernel, ARROW_REPORT_SCHEMA
    )
