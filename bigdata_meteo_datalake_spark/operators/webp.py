"""WebP container probe (public specs: the WebP Container
Specification, RFC 6386 section 9 for the VP8 frame header, and the
VP8L bitstream spec) — after JPEG/PNG/GIF, WebP is the image format a
web crawl actually contains, and corpus triage needs dimensions,
alpha/animation layout, and metadata presence WITHOUT decoding pixels
(VP8/VP8L entropy decode stays a declared boundary, like H.264 in
operators/mp4.py).

Container layout: 'RIFF' + u32le file size + 'WEBP', then chunks of
fourcc(4) + u32le payload size + payload, each padded to EVEN length
(the RIFF rule). Three top-level layouts:

- simple lossy:    one 'VP8 ' chunk. Keyframe header (RFC 6386 9.1):
                   3-byte LE frame tag (bit 0 = frame type, 0 for
                   key; bits 1-3 version; bit 4 show; bits 5-23 first
                   partition size), start code 9D 01 2A, then u16le
                   width and height (14 value bits + 2 scale bits).
- simple lossless: one 'VP8L' chunk: signature byte 0x2F, then a
                   u32le packing width-1 (bits 0-13), height-1
                   (14-27), alpha-hint (28), version (29-31, must be
                   0).
- extended:        'VP8X' first: flags byte (MSB->LSB: Rsv Rsv ICC
                   Alpha EXIF XMP Anim Rsv), 24 reserved bits, canvas
                   width-1 and height-1 as u24le; then the optional
                   chunks in spec order — ICCP, ANIM + ANMF frames
                   (each: x/y u24, width-1/height-1 u24, duration
                   u24, flags byte, then the frame's image subchunks),
                   or ALPH + still image data, then EXIF, XMP.

Unknown chunks are SKIPPED by size (the RIFF extensibility rule, same
posture as EBML's unknown ids); every declared size is validated
against the buffer, the RIFF size must match the file, and VP8X flags
must be CONSISTENT with the chunks actually present (a flag promising
an absent ANIM/ALPH/ICCP/EXIF/XMP raises — trusting layout flags that
lie is how image parsers get exploited).

The companion writer ``build_webp`` emits spec-shaped files in all
three layouts for oracle fixtures
(queries/ext_multimodal.py:webp_probe_report).

Reference parity note: the reference repo has no image layer
(SURVEY.md section 4); this module belongs to the multimodal pillar.
"""

from __future__ import annotations

import struct

__all__ = ["build_webp", "parse_webp"]

_F_ICC = 0x20
_F_ALPHA = 0x10
_F_EXIF = 0x08
_F_XMP = 0x04
_F_ANIM = 0x02


def _chunks(b: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_end) walking RIFF chunks
    in [pos, end); validates sizes and consumes the even-padding byte.

    Deliberately NOT shared with avi.py:_chunks (LIST-aware, tolerates
    a trailing sub-8-byte tail) or media_codecs.py:_riff_chunks
    (first-occurrence dict): this probe's flag-vs-chunk consistency
    posture needs every byte accounted for, so a trailing fragment
    raises here where the decoders' walkers stop."""
    while pos < end:
        if pos + 8 > end:
            raise ValueError(f"truncated chunk header at offset {pos}")
        fourcc = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        s = pos + 8
        if s + size > end:
            raise ValueError(
                f"chunk {fourcc!r} at offset {pos} overruns its parent"
            )
        yield fourcc, s, s + size
        pos = s + size
        if size & 1:
            # RIFF pads odd payloads to even, and the pad byte is part
            # of the parent's accounted size — an absent pad would step
            # pos past `end`, silently accepting a spec-violating tail
            if pos >= end:
                raise ValueError(
                    f"odd-sized chunk {fourcc!r} missing its RIFF pad byte"
                )
            pos += 1


def _parse_vp8_dims(p: bytes) -> tuple[int, int]:
    """VP8 keyframe header -> (width, height); RFC 6386 section 9.1."""
    if len(p) < 10:
        raise ValueError("truncated VP8 bitstream header")
    tag = p[0] | (p[1] << 8) | (p[2] << 16)
    if tag & 1:
        raise ValueError("VP8 still image must be a keyframe (frame type 0)")
    if p[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 keyframe start code")
    (w,) = struct.unpack_from("<H", p, 6)
    (h,) = struct.unpack_from("<H", p, 8)
    return w & 0x3FFF, h & 0x3FFF


def _parse_vp8l_dims(p: bytes) -> tuple[int, int, bool]:
    """VP8L header -> (width, height, alpha-hint)."""
    if len(p) < 5:
        raise ValueError("truncated VP8L bitstream header")
    if p[0] != 0x2F:
        raise ValueError(f"bad VP8L signature byte 0x{p[0]:02x}")
    (bits,) = struct.unpack_from("<I", p, 1)
    if bits >> 29:
        raise ValueError(f"unsupported VP8L version {bits >> 29}")
    return (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1, bool(bits >> 28 & 1)


def _u24(b: bytes, pos: int) -> int:
    return b[pos] | (b[pos + 1] << 8) | (b[pos + 2] << 16)


def parse_webp(b: bytes) -> dict:
    """Full container walk -> the probe record:

      {format ('vp8'|'vp8l'|'vp8x'), codec ('vp8'|'vp8l'), width,
       height, has_alpha, is_animated, n_frames, total_duration_ms,
       has_icc, has_exif, has_xmp, n_chunks}

    width/height come from the image bitstream header for the simple
    layouts and from the VP8X canvas for the extended one. n_frames is
    the ANMF count for animations, 1 for stills; total_duration_ms
    sums the frames' u24 durations. Every size is validated, unknown
    chunks are skipped, and VP8X flags must match the chunks present."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        raise ValueError("not a WebP payload (RIFF....WEBP)")
    (riff_size,) = struct.unpack_from("<I", b, 4)
    if riff_size + 8 != len(b):
        raise ValueError(
            f"RIFF size {riff_size} inconsistent with file of {len(b)} bytes"
        )
    top = list(_chunks(b, 12, len(b)))
    if not top:
        raise ValueError("no chunks after the WEBP fourcc")
    fourcc, s, e = top[0]
    n_chunks = len(top)

    if fourcc == b"VP8 ":
        w, h = _parse_vp8_dims(b[s:e])
        return {"format": "vp8", "codec": "vp8", "width": w, "height": h,
                "has_alpha": False, "is_animated": False, "n_frames": 1,
                "total_duration_ms": 0, "has_icc": False,
                "has_exif": False, "has_xmp": False, "n_chunks": n_chunks}
    if fourcc == b"VP8L":
        w, h, alpha = _parse_vp8l_dims(b[s:e])
        return {"format": "vp8l", "codec": "vp8l", "width": w, "height": h,
                "has_alpha": alpha, "is_animated": False, "n_frames": 1,
                "total_duration_ms": 0, "has_icc": False,
                "has_exif": False, "has_xmp": False, "n_chunks": n_chunks}
    if fourcc != b"VP8X":
        raise ValueError(
            f"first chunk must be VP8 /VP8L/VP8X, got {fourcc!r}"
        )

    if e - s != 10:
        raise ValueError(f"VP8X payload must be 10 bytes, got {e - s}")
    flags = b[s]
    width = _u24(b, s + 4) + 1
    height = _u24(b, s + 7) + 1
    seen = {c[0] for c in top}
    is_animated = bool(flags & _F_ANIM)
    # layout flags that promise absent chunks are lies, not tolerances
    for flag, cc in ((_F_ANIM, b"ANIM"), (_F_ICC, b"ICCP"),
                     (_F_EXIF, b"EXIF"), (_F_XMP, b"XMP ")):
        if bool(flags & flag) != (cc in seen):
            raise ValueError(
                f"VP8X flag/chunk mismatch for {cc!r} "
                f"(flag={'set' if flags & flag else 'clear'})"
            )
    if bool(flags & _F_ALPHA) and not is_animated and b"ALPH" not in seen:
        raise ValueError("VP8X alpha flag set but no ALPH chunk")
    if b"ALPH" in seen and not flags & _F_ALPHA:
        # the other lying direction: an alpha plane the flags disown
        raise ValueError("ALPH chunk present but VP8X alpha flag clear")

    codec = None
    n_frames = 0
    total_duration = 0
    for cc, cs, ce in top[1:]:
        if cc == b"ANMF":
            if ce - cs < 16:
                raise ValueError("truncated ANMF frame header")
            n_frames += 1
            total_duration += _u24(b, cs + 12)
            for fcc, fs, fe in _chunks(b, cs + 16, ce):
                # EVERY frame's bitstream header must validate, not
                # just the one that sets the codec
                if fcc == b"VP8 ":
                    _parse_vp8_dims(b[fs:fe])
                    codec = codec or "vp8"
                elif fcc == b"VP8L":
                    _parse_vp8l_dims(b[fs:fe])
                    codec = codec or "vp8l"
        elif cc == b"VP8 ":
            _parse_vp8_dims(b[cs:ce])
            codec = codec or "vp8"
        elif cc == b"VP8L":
            _parse_vp8l_dims(b[cs:ce])
            codec = codec or "vp8l"
    if is_animated:
        if n_frames == 0:
            raise ValueError("animated WebP with no ANMF frames")
    else:
        if codec is None:
            raise ValueError("extended still WebP with no image chunk")
        n_frames = 1
    if codec is None:
        raise ValueError("no image bitstream in any frame")
    return {"format": "vp8x", "codec": codec, "width": width,
            "height": height,
            "has_alpha": bool(flags & _F_ALPHA),
            "is_animated": is_animated, "n_frames": n_frames,
            "total_duration_ms": total_duration,
            "has_icc": bool(flags & _F_ICC),
            "has_exif": bool(flags & _F_EXIF),
            "has_xmp": bool(flags & _F_XMP), "n_chunks": n_chunks}


# --- writer ---------------------------------------------------------------------------


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    return (fourcc + struct.pack("<I", len(payload)) + payload
            + (b"\x00" if len(payload) & 1 else b""))


def _vp8_payload(w: int, h: int) -> bytes:
    """A spec-shaped VP8 keyframe HEADER (tag + start code + dims) with
    a few filler partition bytes — enough for every probe field; the
    entropy-coded macroblock data is the declared decode boundary."""
    if not (0 < w <= 0x3FFF and 0 < h <= 0x3FFF):
        raise ValueError(f"VP8 dims out of 14-bit range: {w}x{h}")
    tag = (0 << 0) | (0 << 1) | (1 << 4) | (17 << 5)  # key, v0, shown
    return (bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
            + b"\x9d\x01\x2a" + struct.pack("<HH", w, h) + b"\x42" * 7)


def _vp8l_payload(w: int, h: int, alpha: bool) -> bytes:
    if not (0 < w <= 0x4000 and 0 < h <= 0x4000):
        raise ValueError(f"VP8L dims out of 14-bit range: {w}x{h}")
    bits = (w - 1) | ((h - 1) << 14) | (int(alpha) << 28)
    return b"\x2f" + struct.pack("<I", bits) + b"\x77" * 6


def build_webp(
    *,
    layout: str,
    width: int,
    height: int,
    alpha: bool = False,
    animated: bool = False,
    n_frames: int = 1,
    frame_duration_ms: int = 40,
    icc: bool = False,
    exif: bool = False,
    xmp: bool = False,
    lossless: bool = False,
) -> bytes:
    """Spec-shaped WebP (fixture writer): ``layout`` is 'vp8' (simple
    lossy), 'vp8l' (simple lossless), or 'vp8x' (extended — optional
    ICCP, ANIM/ANMF animation or ALPH+still, EXIF, XMP, in spec
    order, with VP8X flags consistent with the chunks emitted)."""
    if layout == "vp8":
        body = _chunk(b"VP8 ", _vp8_payload(width, height))
    elif layout == "vp8l":
        body = _chunk(b"VP8L", _vp8l_payload(width, height, alpha))
    elif layout == "vp8x":
        flags = ((_F_ICC if icc else 0) | (_F_ALPHA if alpha else 0)
                 | (_F_EXIF if exif else 0) | (_F_XMP if xmp else 0)
                 | (_F_ANIM if animated else 0))
        vp8x = (bytes([flags]) + b"\x00\x00\x00"
                + struct.pack("<I", width - 1)[:3]
                + struct.pack("<I", height - 1)[:3])
        body = _chunk(b"VP8X", vp8x)
        if icc:
            body += _chunk(b"ICCP", b"icc profile!")
        if animated:
            body += _chunk(b"ANIM", struct.pack("<IH", 0xFF000000, 0))
            for i in range(n_frames):
                img = (_chunk(b"VP8L", _vp8l_payload(width, height, False))
                       if lossless
                       else _chunk(b"VP8 ", _vp8_payload(width, height)))
                hdr = (struct.pack("<I", 0)[:3] + struct.pack("<I", 0)[:3]
                       + struct.pack("<I", width - 1)[:3]
                       + struct.pack("<I", height - 1)[:3]
                       + struct.pack("<I", frame_duration_ms)[:3]
                       + bytes([0]))
                body += _chunk(b"ANMF", hdr + img)
        else:
            if alpha:
                body += _chunk(b"ALPH", b"\x00" + b"\xaa" * 5)
            body += (_chunk(b"VP8L", _vp8l_payload(width, height, alpha))
                     if lossless
                     else _chunk(b"VP8 ", _vp8_payload(width, height)))
        if exif:
            body += _chunk(b"EXIF", b"II*\x00exif")  # odd size: pad path
        if xmp:
            body += _chunk(b"XMP ", b"<x:xmpmeta/>")
    else:
        raise ValueError(f"layout must be vp8/vp8l/vp8x, got {layout!r}")
    return b"RIFF" + struct.pack("<I", len(body) + 4) + b"WEBP" + body


# --- Spark kernels (mapInPandas, the codec plan shape) --------------------------------


def synthesize_webp_blobs(df):
    """Deterministic WebP source: per ``doc_id`` a container cycling
    the three layouts by doc_id % 3 — 0: simple lossy VP8, 1: simple
    lossless VP8L (alpha hint when doc_id % 2 == 1), 2: extended VP8X
    where even doc_ids are animations of 1 + doc_id % 4 frames at
    40 ms (lossless frames when doc_id % 4 == 0) and odd doc_ids are
    alpha stills; ICC every 7th, EXIF every 5th, XMP every 11th
    extended file. Dimensions 16 + doc_id % 300 x 16 + doc_id % 200 —
    closed forms queries/ext_multimodal.py:webp_probe_report
    recomputes in SQL."""
    import pandas as pd

    from ..sources.lake import widen

    def kernel(batches):
        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                layout = ["vp8", "vp8l", "vp8x"][did % 3]
                animated = layout == "vp8x" and did % 2 == 0
                out["doc_id"].append(did)
                out["blob"].append(build_webp(
                    layout=layout,
                    width=16 + did % 300,
                    height=16 + did % 200,
                    alpha=(layout == "vp8l" and did % 2 == 1)
                    or (layout == "vp8x" and not animated),
                    animated=animated,
                    n_frames=1 + did % 4,
                    lossless=did % 4 == 0,
                    icc=layout == "vp8x" and did % 7 == 0,
                    exif=layout == "vp8x" and did % 5 == 0,
                    xmp=layout == "vp8x" and did % 11 == 0,
                ))
            yield pd.DataFrame(out)

    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


WEBP_PROBE_SCHEMA = (
    "doc_id long, format string, codec string, width int, height int, "
    "has_alpha boolean, is_animated boolean, n_frames int, "
    "total_duration_ms long, has_icc boolean, has_exif boolean, "
    "has_xmp boolean, n_chunks int"
)


def webp_probe_features(df):
    """Container walk -> one probe row per file."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "format", "codec", "width", "height",
                "has_alpha", "is_animated", "n_frames",
                "total_duration_ms", "has_icc", "has_exif", "has_xmp",
                "n_chunks")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                r = parse_webp(bytes(blob))
                out["doc_id"].append(doc_id)
                for k in out:
                    if k != "doc_id":
                        out[k].append(r[k])
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(kernel, WEBP_PROBE_SCHEMA)
