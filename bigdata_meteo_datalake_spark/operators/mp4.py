"""Minimal stdlib ISO-BMFF (MP4) container parser — closes the MP4
*metadata* insertion point in the multimodal kernels without ffmpeg.

Scope (declared, enforced loudly):
- parse: the box tree per ISO/IEC 14496-12 — 32-bit and 64-bit
  (``size == 1`` largesize) box headers; ``ftyp`` major brand;
  ``moov/mvhd`` movie timescale + duration (versions 0 and 1);
  per-``trak`` ``tkhd`` track id, ``mdia/mdhd`` media timescale +
  duration (versions 0 and 1), and ``mdia/hdlr`` handler type
  (``vide``/``soun``/...). Truncated boxes and a missing ``moov`` raise
  ``ValueError``.
- encode: :func:`encode_mp4_skeleton` builds a structurally valid
  metadata-only file (ftyp + moov with mvhd and per-track
  trak/tkhd/mdia/mdhd/hdlr + an empty mdat) so fixtures are genuine
  ISO-BMFF streams a real demuxer would also accept.
- NOT in scope: sample tables (stbl), fragmented MP4 (moof), and frame
  DECODE — extracting pixels genuinely needs ffmpeg/pyav and stays a
  loud NotImplementedError at the codec insertion point
  (operators/multimodal.py:sample_frames).

All layouts below are from the public ISO/IEC 14496-12 specification
(full-box version/flags, mvhd/tkhd/mdhd/hdlr field orders).
"""

from __future__ import annotations

import struct

__all__ = ["parse_mp4", "encode_mp4_skeleton"]

#: container boxes whose payload is itself a sequence of boxes
_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"udta"}


def _boxes(b: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for each box in [start, end)."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError(f"truncated box header at {pos}")
        (size,) = struct.unpack_from(">I", b, pos)
        btype = b[pos + 4 : pos + 8]
        payload = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError(f"truncated largesize box at {pos}")
            (size,) = struct.unpack_from(">Q", b, pos + 8)
            payload = pos + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < payload - pos or pos + size > end:
            raise ValueError(f"box {btype!r} at {pos} overruns its scope")
        yield btype, payload, pos + size
        pos += size


def _fullbox(b: bytes, start: int) -> tuple[int, int]:
    """(version, payload_offset_after_version_and_flags)."""
    return b[start], start + 4


def _parse_mvhd(b: bytes, start: int) -> tuple[int, int]:
    """mvhd -> (timescale, duration) honoring version 0/1 field widths."""
    version, p = _fullbox(b, start)
    if version == 1:
        timescale, duration = struct.unpack_from(">I", b, p + 16)[0], struct.unpack_from(">Q", b, p + 20)[0]
    elif version == 0:
        timescale, duration = struct.unpack_from(">II", b, p + 8)
    else:
        raise ValueError(f"mvhd version {version}")
    return timescale, duration


def _parse_mdhd(b: bytes, start: int) -> tuple[int, int]:
    """mdhd -> (media timescale, media duration), versions 0/1."""
    version, p = _fullbox(b, start)
    if version == 1:
        timescale, duration = struct.unpack_from(">I", b, p + 16)[0], struct.unpack_from(">Q", b, p + 20)[0]
    elif version == 0:
        timescale, duration = struct.unpack_from(">II", b, p + 8)
    else:
        raise ValueError(f"mdhd version {version}")
    return timescale, duration


def _parse_tkhd(b: bytes, start: int) -> int:
    """tkhd -> track_id, versions 0/1 (track_id sits after the times)."""
    version, p = _fullbox(b, start)
    if version == 1:
        (track_id,) = struct.unpack_from(">I", b, p + 16)
    elif version == 0:
        (track_id,) = struct.unpack_from(">I", b, p + 8)
    else:
        raise ValueError(f"tkhd version {version}")
    return track_id


def parse_mp4(b: bytes) -> dict:
    """ISO-BMFF bytes -> container metadata:

    ``{"brand": str, "timescale": int, "duration": int, "tracks":
    [{"track_id": int, "handler": str, "timescale": int, "duration":
    int}, ...]}``

    ``duration / timescale`` is the presentation duration in seconds
    (the movie-level pair; each track carries its own media-timescale
    pair). Raises ``ValueError`` on truncation, overrun, or a missing
    ``moov``/``mvhd``.
    """
    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload (missing ftyp)")
    try:
        return _parse_mp4(b)
    except (struct.error, IndexError, RecursionError) as e:
        raise ValueError(
            f"corrupt or truncated ISO-BMFF stream ({type(e).__name__}: {e})"
        ) from e


def _parse_mp4(b: bytes) -> dict:
    brand = None
    movie = None
    tracks: list[dict] = []

    def walk(start: int, end: int, path: tuple[bytes, ...]):
        nonlocal brand, movie
        for btype, p, q in _boxes(b, start, end):
            if btype == b"ftyp" and not path:
                brand = b[p : p + 4].decode("ascii", errors="replace")
            elif btype == b"mvhd" and path[-1:] == (b"moov",):
                movie = _parse_mvhd(b, p)
            elif btype == b"trak" and path[-1:] == (b"moov",):
                tracks.append({})
                walk(p, q, path + (btype,))
            elif btype == b"tkhd" and path[-1:] == (b"trak",):
                tracks[-1]["track_id"] = _parse_tkhd(b, p)
            elif btype == b"mdhd" and path[-1:] == (b"mdia",):
                ts, dur = _parse_mdhd(b, p)
                tracks[-1]["timescale"] = ts
                tracks[-1]["duration"] = dur
            elif btype == b"hdlr" and path[-1:] == (b"mdia",):
                _, hp = _fullbox(b, p)
                tracks[-1]["handler"] = b[hp + 4 : hp + 8].decode(
                    "ascii", errors="replace"
                )
            elif btype in _CONTAINERS:
                walk(p, q, path + (btype,))

    walk(0, len(b), ())
    if movie is None:
        raise ValueError("ISO-BMFF stream has no moov/mvhd (not a movie)")
    timescale, duration = movie
    if timescale == 0:
        raise ValueError("ISO-BMFF movie timescale is zero")
    # a trak missing any of its mandatory child boxes (tkhd/mdhd/hdlr) or
    # carrying a zero media timescale is malformed-but-parseable; fail it
    # here with the codec contract's ValueError instead of letting
    # downstream consumers hit raw KeyError / ZeroDivisionError
    for i, t in enumerate(tracks):
        missing = {"track_id", "handler", "timescale", "duration"} - t.keys()
        if missing:
            raise ValueError(
                f"ISO-BMFF trak #{i} missing {sorted(missing)} "
                "(no tkhd/mdhd/hdlr box)"
            )
        if t["timescale"] == 0:
            raise ValueError(f"ISO-BMFF trak #{i} media timescale is zero")
    return {
        "brand": brand,
        "timescale": timescale,
        "duration": duration,
        "tracks": tracks,
    }


# --- skeleton encoder (fixture source) -----------------------------------------


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def _mvhd(timescale: int, duration: int, *, version: int) -> bytes:
    matrix = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    if version == 1:
        body = struct.pack(">QQIQ", 0, 0, timescale, duration)
    else:
        body = struct.pack(">IIII", 0, 0, timescale, duration)
    body += struct.pack(">iHH8x", 0x10000, 0x0100, 0) + matrix
    body += struct.pack(">6I", 0, 0, 0, 0, 0, 0) + struct.pack(">I", 0xFFFFFFFF)
    return _box(b"mvhd", bytes([version, 0, 0, 0]) + body)


def _tkhd(track_id: int, duration: int, *, version: int) -> bytes:
    matrix = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    if version == 1:
        body = struct.pack(">QQI4xQ8x", 0, 0, track_id, duration)
    else:
        body = struct.pack(">III4xI8x", 0, 0, track_id, duration)
    body += struct.pack(">HHH2x", 0, 0, 0) + matrix + struct.pack(">II", 0, 0)
    return _box(b"tkhd", bytes([version, 0, 0, 7]) + body)


def _mdhd(timescale: int, duration: int, *, version: int) -> bytes:
    if version == 1:
        body = struct.pack(">QQIQ", 0, 0, timescale, duration)
    else:
        body = struct.pack(">IIII", 0, 0, timescale, duration)
    body += struct.pack(">HH", 0x55C4, 0)  # language 'und'
    return _box(b"mdhd", bytes([version, 0, 0, 0]) + body)


def _hdlr(handler: str) -> bytes:
    body = struct.pack(">I4s12x", 0, handler.encode("ascii")) + b"\x00"
    return _box(b"hdlr", bytes([0, 0, 0, 0]) + body)


def encode_mp4_skeleton(
    *,
    timescale: int,
    duration: int,
    tracks: list[dict],
    version: int = 0,
    brand: str = "isom",
) -> bytes:
    """Build a structurally valid metadata-only ISO-BMFF file.

    ``tracks`` entries: ``{"track_id", "handler", "timescale",
    "duration"}``. ``version`` selects 32-bit (0) or 64-bit (1) time
    fields in mvhd/mdhd, so a parser is forced through both layouts.
    The result carries no sample data (empty ``mdat``) — it is a
    container-metadata fixture, not a playable movie.
    """
    ftyp = _box(b"ftyp", struct.pack(">4sI4s4s", brand.encode("ascii"), 512,
                                     b"isom", b"mp42"))
    traks = b""
    for t in tracks:
        mdia = _box(
            b"mdia",
            _mdhd(t["timescale"], t["duration"], version=version)
            + _hdlr(t["handler"]),
        )
        traks += _box(
            b"trak", _tkhd(t["track_id"], t["duration"], version=version) + mdia
        )
    moov = _box(b"moov", _mvhd(timescale, duration, version=version) + traks)
    return ftyp + moov + _box(b"mdat", b"")
