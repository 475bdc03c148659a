"""CBOR decoder (RFC 8949) — the IETF binary serialization event
streams, COSE/WebAuthn payloads, and IoT telemetry arrive in, next to
the JSON/MessagePack-shaped front door formats. Hand-rolled from the
public RFC, both directions (the encoder exists so fixtures are
genuine deterministic bitstreams, exactly like the codec pillar):

- all eight major types: unsigned/negative integers (full 64-bit
  argument ladder: immediate, 1/2/4/8-byte), byte strings, text
  strings (UTF-8 validated), arrays, maps (string-keyed in this
  profile; non-string keys are rejected — python dicts need hashable,
  JSON-compatible keys), tags (value 0/1 date tags pass through with
  the tag recorded; others rejected loudly), and simple values
  (false/true/null plus half/single/double floats — the HALF decode
  implements RFC 8949 appendix D's ladder including subnormals and
  infinities);
- canonical-form enforcement hooks: indefinite-length items are a
  declared boundary (the streaming profile); when ``canonical=True``
  arguments must use the shortest form and map keys must be
  bytewise-sorted on their encoded form (the section 4.2.1
  deterministic-encoding checks). Shortest-form FLOAT width
  (half < single < double preference) is deliberately NOT enforced —
  a declared non-check: this profile's fixtures encode all floats as
  doubles, and all three widths decode. Depth and size budgets bound
  crafted nesting;
- every byte of the buffer must be consumed (``decode_cbor``) — a
  trailing-garbage tolerance is how smuggled payloads hide.

Reference parity note: the reference repo ingests JSON only
(SURVEY.md section 2.1); this extends the arrival-format pillar.
"""

from __future__ import annotations

import math
import struct

__all__ = ["decode_cbor", "encode_cbor"]

_MAX_DEPTH = 64
_MAX_ITEMS = 1_000_000


def _argument(b: bytes, pos: int, info: int,
              canonical: bool) -> tuple[int, int]:
    if info < 24:
        return info, pos
    if info == 24:
        if pos >= len(b):
            raise ValueError("cbor: truncated 1-byte argument")
        v = b[pos]
        if canonical and v < 24:
            raise ValueError("cbor: non-minimal 1-byte argument")
        return v, pos + 1
    if info == 25:
        if pos + 2 > len(b):
            raise ValueError("cbor: truncated 2-byte argument")
        v = struct.unpack_from(">H", b, pos)[0]
        if canonical and v < 0x100:
            raise ValueError("cbor: non-minimal 2-byte argument")
        return v, pos + 2
    if info == 26:
        if pos + 4 > len(b):
            raise ValueError("cbor: truncated 4-byte argument")
        v = struct.unpack_from(">I", b, pos)[0]
        if canonical and v < 0x10000:
            raise ValueError("cbor: non-minimal 4-byte argument")
        return v, pos + 4
    if info == 27:
        if pos + 8 > len(b):
            raise ValueError("cbor: truncated 8-byte argument")
        v = struct.unpack_from(">Q", b, pos)[0]
        if canonical and v < 0x100000000:
            raise ValueError("cbor: non-minimal 8-byte argument")
        return v, pos + 8
    if info == 31:
        raise NotImplementedError(
            "cbor: indefinite-length items are a declared boundary "
            "(the streaming profile)"
        )
    raise ValueError(f"cbor: reserved additional info {info}")


def _half_to_float(h: int) -> float:
    """RFC 8949 appendix D half-precision decode."""
    exp = (h >> 10) & 0x1F
    mant = h & 0x3FF
    if exp == 0:
        val = mant * 2.0 ** -24
    elif exp != 31:
        val = (mant + 1024) * 2.0 ** (exp - 25)
    else:
        val = math.inf if mant == 0 else math.nan
    return -val if h & 0x8000 else val


def _decode(b: bytes, pos: int, depth: int, canonical: bool):
    if depth > _MAX_DEPTH:
        raise ValueError(f"cbor: nesting deeper than {_MAX_DEPTH}")
    if pos >= len(b):
        raise ValueError("cbor: truncated item head")
    ib = b[pos]
    pos += 1
    major, info = ib >> 5, ib & 0x1F
    if major == 0:  # unsigned
        return _argument(b, pos, info, canonical)
    if major == 1:  # negative: -1 - n
        n, pos = _argument(b, pos, info, canonical)
        return -1 - n, pos
    if major == 2:  # byte string
        n, pos = _argument(b, pos, info, canonical)
        if pos + n > len(b):
            raise ValueError("cbor: byte string overruns the buffer")
        return b[pos : pos + n], pos + n
    if major == 3:  # text string
        n, pos = _argument(b, pos, info, canonical)
        if pos + n > len(b):
            raise ValueError("cbor: text string overruns the buffer")
        try:
            return b[pos : pos + n].decode("utf-8"), pos + n
        except UnicodeDecodeError as exc:
            raise ValueError(f"cbor: invalid utf-8 text: {exc}") from exc
    if major == 4:  # array
        n, pos = _argument(b, pos, info, canonical)
        if n > _MAX_ITEMS:
            raise ValueError(f"cbor: absurd array length {n}")
        out = []
        for _ in range(n):
            v, pos = _decode(b, pos, depth + 1, canonical)
            out.append(v)
        return out, pos
    if major == 5:  # map
        n, pos = _argument(b, pos, info, canonical)
        if n > _MAX_ITEMS:
            raise ValueError(f"cbor: absurd map length {n}")
        out = {}
        prev_enc: bytes | None = None
        for _ in range(n):
            kstart = pos
            k, pos = _decode(b, pos, depth + 1, canonical)
            if not isinstance(k, str):
                raise ValueError(
                    f"cbor: non-text map key of type "
                    f"{type(k).__name__} (this profile is JSON-shaped)"
                )
            if canonical:
                # RFC 8949 section 4.2.1: deterministic encoding sorts
                # map keys bytewise on their ENCODED form (length-first
                # for short text keys, since the initial byte carries
                # the length).
                kenc = b[kstart:pos]
                # strict <: an EQUAL encoding is a duplicate key, not an
                # ordering violation — let it fall through to the
                # dedicated duplicate-key check below (round-13 advice)
                if prev_enc is not None and kenc < prev_enc:
                    raise ValueError(
                        f"cbor: map key {k!r} out of canonical "
                        "(bytewise-encoded) order"
                    )
                prev_enc = kenc
            if k in out:
                raise ValueError(f"cbor: duplicate map key {k!r}")
            v, pos = _decode(b, pos, depth + 1, canonical)
            out[k] = v
        return out, pos
    if major == 6:  # tag
        tag, pos = _argument(b, pos, info, canonical)
        if tag not in (0, 1):  # date/time tags pass through
            raise NotImplementedError(
                f"cbor: tag {tag} is a declared boundary (standard "
                "date/time tags 0 and 1 only)"
            )
        v, pos = _decode(b, pos, depth + 1, canonical)
        return {"__tag__": tag, "value": v}, pos
    # major 7: simple values and floats
    if info == 20:
        return False, pos
    if info == 21:
        return True, pos
    if info == 22:
        return None, pos
    if info == 23:
        raise NotImplementedError("cbor: 'undefined' is a declared boundary")
    if info == 25:
        if pos + 2 > len(b):
            raise ValueError("cbor: truncated half float")
        return _half_to_float(struct.unpack_from(">H", b, pos)[0]), pos + 2
    if info == 26:
        if pos + 4 > len(b):
            raise ValueError("cbor: truncated single float")
        return struct.unpack_from(">f", b, pos)[0], pos + 4
    if info == 27:
        if pos + 8 > len(b):
            raise ValueError("cbor: truncated double float")
        return struct.unpack_from(">d", b, pos)[0], pos + 8
    if info == 31:
        raise ValueError("cbor: unexpected 'break' outside an "
                         "indefinite item")
    raise NotImplementedError(
        f"cbor: simple value {info} is a declared boundary"
    )


def decode_cbor(b: bytes, *, canonical: bool = False):
    """One CBOR data item consuming the WHOLE buffer."""
    if not b:
        raise ValueError("cbor: empty buffer")
    v, pos = _decode(b, 0, 0, canonical)
    if pos != len(b):
        raise ValueError(
            f"cbor: {len(b) - pos} trailing bytes after the item"
        )
    return v


def _encode_arg(major: int, n: int) -> bytes:
    if n < 24:
        return bytes([(major << 5) | n])
    if n < 0x100:
        return bytes([(major << 5) | 24, n])
    if n < 0x10000:
        return bytes([(major << 5) | 25]) + struct.pack(">H", n)
    if n < 0x100000000:
        return bytes([(major << 5) | 26]) + struct.pack(">I", n)
    return bytes([(major << 5) | 27]) + struct.pack(">Q", n)


def encode_cbor(v) -> bytes:
    """Deterministic (shortest-argument) encoder for the decoder's
    profile — the fixture writer."""
    if v is False:
        return b"\xf4"
    if v is True:
        return b"\xf5"
    if v is None:
        return b"\xf6"
    if isinstance(v, int):
        if v >= 0:
            if v >= 1 << 64:
                raise ValueError("cbor: unsigned integer too large")
            return _encode_arg(0, v)
        n = -1 - v
        if n >= 1 << 64:
            raise ValueError("cbor: negative integer too large")
        return _encode_arg(1, n)
    if isinstance(v, float):
        return b"\xfb" + struct.pack(">d", v)
    if isinstance(v, bytes):
        return _encode_arg(2, len(v)) + v
    if isinstance(v, str):
        e = v.encode("utf-8")
        return _encode_arg(3, len(e)) + e
    if isinstance(v, (list, tuple)):
        return _encode_arg(4, len(v)) + b"".join(encode_cbor(x) for x in v)
    if isinstance(v, dict):
        if "__tag__" in v and set(v) == {"__tag__", "value"}:
            return _encode_arg(6, v["__tag__"]) + encode_cbor(v["value"])
        out = _encode_arg(5, len(v))
        for k in v:
            if not isinstance(k, str):
                raise ValueError("cbor: map keys must be text")
        # RFC 8949 section 4.2.1 deterministic order: bytewise on the
        # encoded key, so the fixtures decode under canonical=True.
        for ke, val in sorted(
            ((encode_cbor(k), val) for k, val in v.items())
        ):
            out += ke + encode_cbor(val)
        return out
    raise ValueError(f"cbor: unencodable type {type(v).__name__}")


# --- Spark kernels (mapInPandas, the codec plan shape) --------------------------------


def _fx_record(doc_id: int, j: int) -> dict:
    return {
        "id": doc_id * 10 + j,
        "neg": -1 - (doc_id + j),
        "name": f"ev{doc_id}-{j}",
        "ok": j % 2 == 0,
        "score": doc_id * 0.5 + j * 0.25,
        "tags": [f"t{k}" for k in range(j % 3)],
        "blob": bytes([doc_id % 256]) * (1 + j % 4),
        "ts": {"__tag__": 1, "value": 1700000000 + doc_id + j},
        "missing": None,
    }


def synthesize_cbor_blobs(df):
    """Deterministic source: per ``doc_id`` one CBOR array of
    1 + doc_id % 4 event records through the full type surface."""
    import pandas as pd

    from ..sources.lake import widen

    def kernel(batches):
        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                recs = [_fx_record(did, j) for j in range(1 + did % 4)]
                out["doc_id"].append(did)
                out["blob"].append(encode_cbor(recs))
            yield pd.DataFrame(out)

    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


CBOR_REPORT_SCHEMA = (
    "doc_id long, rec_idx int, id long, neg long, name string, "
    "ok boolean, score double, n_tags int, blob_bytes int, ts long"
)


def cbor_event_features(df):
    """Canonical decode -> one row per event record, every field a
    closed form the oracle recomputes."""
    import pandas as pd

    def kernel(batches):
        cols = ("doc_id", "rec_idx", "id", "neg", "name", "ok", "score",
                "n_tags", "blob_bytes", "ts")
        for pdf in batches:
            out = {k: [] for k in cols}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                recs = decode_cbor(bytes(blob), canonical=True)
                if not isinstance(recs, list):
                    raise ValueError("cbor shard root is not an array")
                for j, r in enumerate(recs):
                    if r.get("missing") is not None:
                        raise ValueError("null field decoded non-null")
                    ts = r["ts"]
                    if ts.get("__tag__") != 1:
                        raise ValueError("ts is not an epoch tag")
                    out["doc_id"].append(doc_id)
                    out["rec_idx"].append(j)
                    out["id"].append(r["id"])
                    out["neg"].append(r["neg"])
                    out["name"].append(r["name"])
                    out["ok"].append(r["ok"])
                    out["score"].append(r["score"])
                    out["n_tags"].append(len(r["tags"]))
                    out["blob_bytes"].append(len(r["blob"]))
                    out["ts"].append(ts["value"])
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(
        kernel, CBOR_REPORT_SCHEMA
    )
