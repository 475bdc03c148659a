"""Minimal stdlib+numpy baseline TIFF codec — the scanned-document
corpus staple, closing the TIFF insertion point in the multimodal
kernels without PIL/libtiff.

Scope (declared, enforced loudly):
- decode: classic TIFF (II little-endian AND MM big-endian), first IFD,
  8-bit grayscale (PhotometricInterpretation 1, and 0 = white-is-zero
  with inversion) and 8-bit RGB, chunky planar config, multi-strip
  layouts, Compression 1 (none) and 32773 (PackBits). Tag values both
  inline and offset-addressed.
- encode: single- or multi-strip gray8/RGB8 in either byte order,
  uncompressed or PackBits (a real run-length compressor), so fixtures
  are genuine TIFFs another reader would accept.
- NOT in scope (NotImplementedError): LZW/JPEG/deflate-in-TIFF, bilevel
  and 16-bit samples, tiles, planar configuration 2 — these need codec
  surface area beyond a fixture-grade reader.

All layouts from the public TIFF 6.0 specification.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_tiff", "encode_tiff"]

#: tag ids (TIFF 6.0)
_WIDTH, _HEIGHT, _BITS, _COMPRESSION, _PHOTOMETRIC = 256, 257, 258, 259, 262
_STRIP_OFFSETS, _SAMPLES, _ROWS_PER_STRIP, _STRIP_COUNTS = 273, 277, 278, 279
_PLANAR = 284

#: field type -> (struct code, byte size)
_TYPES = {1: ("B", 1), 3: ("H", 2), 4: ("I", 4)}


def _read_ifd(b: bytes, e: str) -> dict[int, list[int]]:
    """First IFD -> {tag: [values...]} for the integer types we use."""
    (ifd_off,) = struct.unpack_from(e + "I", b, 4)
    if ifd_off + 2 > len(b):
        raise ValueError("truncated TIFF IFD offset")
    (n,) = struct.unpack_from(e + "H", b, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        if off + 12 > len(b):
            raise ValueError("truncated TIFF IFD entry")
        tag, ftype, count = struct.unpack_from(e + "HHI", b, off)
        if ftype not in _TYPES:
            continue  # rational/ascii tags are irrelevant here
        code, size = _TYPES[ftype]
        total = size * count
        if total <= 4:
            vals = struct.unpack_from(e + code * count, b, off + 8)
        else:
            (voff,) = struct.unpack_from(e + "I", b, off + 8)
            if voff + total > len(b):
                raise ValueError(f"TIFF tag {tag} values out of bounds")
            vals = struct.unpack_from(e + code * count, b, voff)
        tags[tag] = list(vals)
    return tags


def _packbits_decode(data: bytes, expected: int) -> np.ndarray:
    """PackBits (TIFF 6.0 section 9): n in 0..127 -> copy n+1 literal
    bytes; n in -127..-1 -> repeat the next byte 1-n times; -128 noop."""
    out = np.empty(expected, dtype=np.uint8)
    n_out = 0
    p = 0
    while n_out < expected:
        if p >= len(data):
            raise ValueError("truncated PackBits stream")
        n = data[p]
        p += 1
        if n < 128:  # literal run of n+1
            cnt = n + 1
            if p + cnt > len(data) or n_out + cnt > expected:
                raise ValueError("PackBits literal run out of bounds")
            out[n_out : n_out + cnt] = np.frombuffer(
                data, dtype=np.uint8, count=cnt, offset=p
            )
            p += cnt
            n_out += cnt
        elif n == 128:  # noop
            continue
        else:  # repeat run of 257-n
            cnt = 257 - n
            if p >= len(data) or n_out + cnt > expected:
                raise ValueError("PackBits repeat run out of bounds")
            out[n_out : n_out + cnt] = data[p]
            p += 1
            n_out += cnt
    return out


def _packbits_encode(row: np.ndarray) -> bytes:
    """Real PackBits compression, row-at-a-time per the spec's advice."""
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        # find run length at i
        run = 1
        while i + run < n and row[i + run] == row[i] and run < 128:
            run += 1
        if run >= 2:
            out += bytes([257 - run, int(row[i])])
            i += run
            continue
        # literal stretch: until a run of >= 3 starts (2-byte runs are
        # cheaper folded into the literal) or 128 bytes
        j = i + 1
        while j < n and (j - i) < 128:
            run = 1
            while j + run < n and row[j + run] == row[j] and run < 3:
                run += 1
            if run >= 3:
                break
            j += 1
        out += bytes([j - i - 1]) + row[i:j].tobytes()
        i = j
    return bytes(out)


def decode_tiff(b: bytes) -> np.ndarray:
    """Baseline TIFF -> uint8 (H, W) grayscale or (H, W, 3) RGB array
    (first IFD; multi-strip; none or PackBits compression; either byte
    order; white-is-zero grayscale inverted to the usual polarity)."""
    if b[:4] == b"II*\x00":
        e = "<"
    elif b[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF payload (bad byte-order magic)")
    try:
        return _decode_tiff(b, e)
    except (IndexError, struct.error) as ex:
        raise ValueError(
            f"corrupt or truncated TIFF ({type(ex).__name__}: {ex})"
        ) from ex


def _decode_tiff(b: bytes, e: str) -> np.ndarray:
    t = _read_ifd(b, e)
    for need in (_WIDTH, _HEIGHT, _STRIP_OFFSETS):
        if need not in t:
            raise ValueError(f"TIFF missing required tag {need}")
    w, h = t[_WIDTH][0], t[_HEIGHT][0]
    if w == 0 or h == 0 or w * h > (1 << 26):
        raise ValueError(f"TIFF dimensions {w}x{h} invalid or over budget")
    spp = t.get(_SAMPLES, [1])[0]
    bits = t.get(_BITS, [8])
    comp = t.get(_COMPRESSION, [1])[0]
    photo = t.get(_PHOTOMETRIC, [1])[0]
    planar = t.get(_PLANAR, [1])[0]
    if spp not in (1, 3) or any(x != 8 for x in bits):
        raise NotImplementedError(
            f"only 8-bit gray/RGB TIFF supported (spp={spp}, bits={bits})"
        )
    if comp not in (1, 32773):
        raise NotImplementedError(
            f"TIFF compression {comp} needs a codec library "
            "(only none/PackBits supported)"
        )
    if planar != 1:
        raise NotImplementedError("planar configuration 2 not supported")
    if photo not in (0, 1, 2):
        raise NotImplementedError(f"photometric interpretation {photo}")
    offsets = t[_STRIP_OFFSETS]
    counts = t.get(_STRIP_COUNTS)
    rps = t.get(_ROWS_PER_STRIP, [h])[0] or h
    row_bytes = w * spp
    strips = []
    for si, off in enumerate(offsets):
        rows = min(rps, h - si * rps)
        if rows <= 0:
            raise ValueError("more strips than rows")
        expected = rows * row_bytes
        if comp == 1:
            if off + expected > len(b):
                raise ValueError("TIFF strip out of bounds")
            strips.append(
                np.frombuffer(b, dtype=np.uint8, count=expected, offset=off)
            )
        else:
            if counts is None or si >= len(counts):
                raise ValueError("PackBits TIFF missing StripByteCounts")
            raw = b[off : off + counts[si]]
            if len(raw) != counts[si]:
                raise ValueError("TIFF strip out of bounds")
            strips.append(_packbits_decode(raw, expected))
    pix = np.concatenate(strips)
    if len(pix) != h * row_bytes:
        raise ValueError("TIFF strip data does not cover the image")
    pix = pix.reshape(h, w, spp)
    if photo == 0:  # white-is-zero: invert to the usual polarity
        pix = (255 - pix.astype(np.int16)).astype(np.uint8)
    return pix[:, :, 0] if spp == 1 else np.ascontiguousarray(pix)


def encode_tiff(
    arr: np.ndarray,
    *,
    byteorder: str = "<",
    packbits: bool = False,
    rows_per_strip: int | None = None,
) -> bytes:
    """uint8 (H, W) gray or (H, W, 3) RGB -> classic TIFF in either byte
    order ('<' II / '>' MM), single- or multi-strip, uncompressed or
    PackBits-compressed."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        spp = 1
        photo = 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        spp = 3
        photo = 2
    else:
        raise ValueError(f"expected (H,W) or (H,W,3) uint8 array, got {arr.shape}")
    if byteorder not in ("<", ">"):
        raise ValueError("byteorder must be '<' or '>'")
    e = byteorder
    h, w = arr.shape[:2]
    rps = rows_per_strip or h
    flat = arr.reshape(h, w * spp)
    strip_rows = [flat[y : y + rps] for y in range(0, h, rps)]
    if packbits:
        strip_data = [
            b"".join(_packbits_encode(r) for r in s) for s in strip_rows
        ]
    else:
        strip_data = [s.tobytes() for s in strip_rows]

    header = struct.pack(e + "2sHI", b"II" if e == "<" else b"MM", 42, 8)
    n_strips = len(strip_data)

    def entry(tag, ftype, count, value_or_offset):
        head = struct.pack(e + "HHI", tag, ftype, count)
        if ftype == 3 and count == 1:
            # inline values are LEFT-justified in the 4-byte field
            # regardless of byte order (TIFF 6.0 section 2)
            return head + struct.pack(e + "H", value_or_offset) + b"\x00\x00"
        return head + struct.pack(e + "I", value_or_offset)

    # layout: header(8) | IFD | [bits values if rgb] | [strip arrays] | data
    tags = []
    n_entries = 9
    ifd_size = 2 + 12 * n_entries + 4
    extra = 8 + ifd_size
    bits_off = extra
    if spp == 3:
        extra += 6  # three SHORT BitsPerSample values
    arrays_off = extra
    if n_strips > 1:
        extra += 8 * n_strips  # offsets + counts arrays (LONG each)
    data_off = extra
    offs = []
    pos = data_off
    for d in strip_data:
        offs.append(pos)
        pos += len(d)

    tags.append(entry(_WIDTH, 4, 1, w))
    tags.append(entry(_HEIGHT, 4, 1, h))
    if spp == 1:
        tags.append(entry(_BITS, 3, 1, 8))
    else:
        tags.append(entry(_BITS, 3, 3, bits_off))
    tags.append(entry(_COMPRESSION, 3, 1, 32773 if packbits else 1))
    tags.append(entry(_PHOTOMETRIC, 3, 1, photo))
    if n_strips == 1:
        tags.append(entry(_STRIP_OFFSETS, 4, 1, offs[0]))
    else:
        tags.append(entry(_STRIP_OFFSETS, 4, n_strips, arrays_off))
    tags.append(entry(_SAMPLES, 3, 1, spp))
    tags.append(entry(_ROWS_PER_STRIP, 4, 1, rps))
    if n_strips == 1:
        tags.append(entry(_STRIP_COUNTS, 4, 1, len(strip_data[0])))
    else:
        tags.append(entry(_STRIP_COUNTS, 4, n_strips, arrays_off + 4 * n_strips))

    out = bytearray(header)
    out += struct.pack(e + "H", n_entries)
    for tg in sorted(tags, key=lambda x: struct.unpack(e + "H", x[:2])[0]):
        out += tg
    out += struct.pack(e + "I", 0)  # no next IFD
    if spp == 3:
        out += struct.pack(e + "HHH", 8, 8, 8)
    if n_strips > 1:
        out += struct.pack(e + "I" * n_strips, *offs)
        out += struct.pack(
            e + "I" * n_strips, *[len(d) for d in strip_data]
        )
    assert len(out) == data_off, (len(out), data_off)
    for d in strip_data:
        out += d
    return bytes(out)
