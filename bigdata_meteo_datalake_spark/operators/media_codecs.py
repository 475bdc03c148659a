"""Stdlib-only media codecs for the multimodal operators (SURVEY.md
section 2.7 follow-up): the container has no PIL/ffmpeg, but two formats
are decodable with nothing beyond the standard library + numpy, which
proves the ``decode="real"`` path end-to-end instead of leaving every
codec stubbed:

- **BMP** (uncompressed 24-bit BI_RGB, 8-bit palette, and
  RLE8-compressed 8-bit palette with encoded/absolute runs and
  end-of-line / end-of-bitmap / delta escapes): header parsed with
  ``struct``, truecolor rows are raw BGR bottom-up with 4-byte row
  padding decoded as a zero-copy reshape, palette indices expand
  through the BGRX color table. Encoders included for all three
  layouts (tests generate real images).
- **WAV** (PCM 16/8-bit via stdlib ``wave``; G.711 mu-law and A-law —
  the telephony encodings — via a manual RIFF chunk walk and the CCITT
  expansion tables, reference-value-pinned in tests; IMA/DVI ADPCM
  (format 0x11) — the classic 4-bit compressed-audio format — with
  per-block headers, multi-channel 4-byte-word interleave, short final
  blocks, and ``fact``-chunk frame trimming; encoder included).
- **FLAC** (``operators/flac.py``): the mainstream LOSSLESS audio
  format — Rice-coded fixed/LPC prediction residuals, all four channel
  assignments, CRC-8/CRC-16/MD5 integrity verified; compliant encoder
  included (fixed-predictor search + Rice).
- **PNG** (every legal IHDR combination: gray at depths 1/2/4/8/16,
  gray+alpha 8/16, RGB 8/16, RGBA 8/16, palette 1/2/4/8; non-interlaced
  AND Adam7 interlaced): chunk parsing with ``struct`` + ``zlib.crc32``,
  inflate with ``zlib``, and a full implementation of all five scanline
  filters (None/Sub/Up/Average/Paeth) per the PNG spec (RFC 2083
  section 6) at the spec's byte-distance max(1, channels*depth/8);
  Adam7's seven passes decode as independent sub-images and scatter to
  their pixel grids; color type 3 unfilters the index plane then
  expands through the PLTE table to RGB; sub-byte gray scales to the
  full 8-bit range, depth 16 returns uint16. Encoder included with a
  selectable per-row filter (``interlace=True``, ``palette=``,
  ``depth=``) so tests exercise every unfilter path.
  tRNS transparency expands to an alpha channel (palette alpha table,
  or raw-sample-value keying for gray/RGB).
- **TIFF** (classic, both byte orders, first IFD): 8-bit gray (both
  photometric polarities) and RGB, multi-strip, Compression 1 (none)
  and 32773 (PackBits) — the scanned-document staple. Encoder writes
  genuine single-/multi-strip files with a real PackBits compressor.
- **JPEG** (baseline SOF0, extended sequential SOF1, progressive SOF2,
  AND arithmetic-coded SOF9/SOF10 via the T.81 Annex D QM-coder in
  ``operators/jpeg_arith.py``; 8-bit and 12-bit precision; grayscale /
  4:4:4 / 4:2:2 / 4:2:0 RGB): full Huffman entropy codec + 8x8 DCT in
  ``operators/jpeg.py`` (spec Annex K tables), interleaved-MCU chroma
  subsampling with box-average downsampling / replication upsampling;
  progressive decodes any scan script (spectral selection AND
  successive approximation with EOB runs), and the encoder writes a
  spectral-selection script for fixtures; lossy in general, bit-exact
  on block-constant fixtures — see that module's docstring.

Anything else (MP4 frame decode; lossless/hierarchical JPEG) still
raises NotImplementedError at the codec insertion point — a declared
boundary, not silent wrong answers.

Scale note: kernels are per-blob numpy; BMP/WAV are zero-copy reshapes,
and PNG rows are vectorized where the spec allows — None/Up/Sub decode
and ALL encode filters are whole-row numpy expressions, while
Average/Paeth DECODE is inherently sequential along x (each pixel needs
the already-unfiltered left neighbor) and loops per pixel with the
channel group vectorized. These stdlib codecs are correctness/fixture-
grade (tens of MB/s); for production-volume media swap PIL/libjpeg-turbo
in at the same sniff_format dispatch points — the Spark plan (mapInPandas
batch iteration in operators/multimodal.py, payload-budget partitioning)
does not change.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

from .gif import decode_gif, encode_gif  # noqa: F401  (re-export)
from .jpeg import decode_jpeg, encode_jpeg  # noqa: F401  (re-export)
from .tiff import decode_tiff, encode_tiff  # noqa: F401  (re-export)

__all__ = [
    "decode_bmp",
    "encode_bmp",
    "encode_bmp_palette",
    "decode_gif",
    "encode_gif",
    "decode_jpeg",
    "encode_jpeg",
    "decode_png",
    "encode_png",
    "decode_tiff",
    "encode_tiff",
    "decode_wav",
    "encode_wav",
    "sniff_format",
]

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def sniff_format(b: bytes) -> str | None:
    """Cheap magic-byte sniff for the formats the real path supports."""
    if b[:2] == b"BM":
        return "bmp"
    if b[:8] == _PNG_MAGIC:
        return "png"
    if b[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if b[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "wav"
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        return "avi"
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        return "webp"
    if b[:4] == b"fLaC":
        return "flac"
    if len(b) >= 12 and b[4:8] == b"ftyp":
        return "mp4"
    return None


# --- BMP ----------------------------------------------------------------------


def decode_bmp(b: bytes) -> np.ndarray:
    """BMP -> (H, W, 3) uint8 RGB array: uncompressed 24-bit BI_RGB,
    uncompressed 8-bit palette, and RLE8-compressed 8-bit palette
    (encoded runs, absolute runs, end-of-line / end-of-bitmap / delta
    escapes) all decode.

    Handles both bottom-up (positive height, the common case) and
    top-down (negative height) row orders and the 4-byte row padding the
    format mandates. Other depths/compressions raise loudly.
    """
    if b[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    try:
        (data_offset,) = struct.unpack_from("<I", b, 10)
        (dib_size,) = struct.unpack_from("<I", b, 14)
        width, height = struct.unpack_from("<ii", b, 18)
        _planes, bpp = struct.unpack_from("<HH", b, 26)
        (compression,) = struct.unpack_from("<I", b, 30)
        (clr_used,) = struct.unpack_from("<I", b, 46)
    except struct.error as e:
        raise ValueError(f"truncated BMP header ({e})") from e
    if (bpp, compression) not in ((24, 0), (8, 0), (8, 1)):
        raise NotImplementedError(
            f"only 24-bit BI_RGB and 8-bit BI_RGB/BI_RLE8 BMP supported "
            f"(bpp={bpp}, compression={compression})"
        )
    bottom_up = height > 0
    h = abs(height)
    if width <= 0 or h == 0:
        raise ValueError("BMP has non-positive dimensions")
    if bpp == 24:
        row_size = (width * 3 + 3) & ~3  # rows pad to 4-byte boundary
        need = data_offset + row_size * h
        if len(b) < need:
            raise ValueError(f"truncated BMP: {len(b)} bytes, need {need}")
        rows = np.frombuffer(
            b, dtype=np.uint8, count=row_size * h, offset=data_offset
        )
        pix = rows.reshape(h, row_size)[:, : width * 3].reshape(h, width, 3)
        if bottom_up:
            pix = pix[::-1]
        return np.ascontiguousarray(pix[..., ::-1])  # BGR -> RGB
    # 8-bit palette: BGRX color table right after the DIB header
    n_colors = clr_used or 256
    pal_off = 14 + dib_size
    pal_raw = np.frombuffer(
        b, dtype=np.uint8, count=n_colors * 4, offset=pal_off
    ) if len(b) >= pal_off + n_colors * 4 else None
    if pal_raw is None:
        raise ValueError("truncated BMP color table")
    palette = pal_raw.reshape(n_colors, 4)[:, 2::-1]  # BGRX -> RGB
    if compression == 0:
        row_size = (width + 3) & ~3
        need = data_offset + row_size * h
        if len(b) < need:
            raise ValueError(f"truncated BMP: {len(b)} bytes, need {need}")
        rows = np.frombuffer(
            b, dtype=np.uint8, count=row_size * h, offset=data_offset
        )
        idx = rows.reshape(h, row_size)[:, :width]
    else:  # BI_RLE8 (always bottom-up per the format)
        idx = np.zeros((h, width), dtype=np.uint8)
        x = y = 0
        p = data_offset
        while True:
            if p + 2 > len(b):
                raise ValueError("truncated BMP RLE8 stream")
            count, val = b[p], b[p + 1]
            p += 2
            if count > 0:  # encoded run
                if y >= h or x + count > width:
                    raise ValueError("BMP RLE8 run outside the bitmap")
                idx[y, x : x + count] = val
                x += count
            elif val == 0:  # end of line
                x, y = 0, y + 1
            elif val == 1:  # end of bitmap
                break
            elif val == 2:  # delta
                if p + 2 > len(b):
                    raise ValueError("truncated BMP RLE8 delta")
                x += b[p]
                y += b[p + 1]
                p += 2
                if x > width or y > h:
                    raise ValueError("BMP RLE8 delta outside the bitmap")
            else:  # absolute run of `val` index bytes, padded to even
                if y >= h or x + val > width or p + val > len(b):
                    raise ValueError("BMP RLE8 absolute run out of bounds")
                idx[y, x : x + val] = np.frombuffer(
                    b, dtype=np.uint8, count=val, offset=p
                )
                x += val
                p += val + (val & 1)
    if int(idx.max(initial=0)) >= n_colors:
        raise ValueError("BMP pixel index outside the color table")
    pix = palette[idx]
    return np.ascontiguousarray(pix[::-1] if bottom_up else pix)


def encode_bmp(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB array -> uncompressed 24-bit bottom-up BMP."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) RGB array, got {arr.shape}")
    h, w, _ = arr.shape
    row_size = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # RGB->BGR, flip
    data = rows.tobytes()
    offset = 14 + 40
    file_header = struct.pack("<2sIHHI", b"BM", offset + len(data), 0, 0, offset)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return file_header + dib + data


def encode_bmp_palette(
    idx: np.ndarray, palette: np.ndarray, *, rle: bool = False
) -> bytes:
    """(H, W) uint8 index plane + (N<=256, 3) RGB palette -> 8-bit
    bottom-up BMP, uncompressed (BI_RGB) or RLE8-compressed — the
    fixture source for the palette/RLE decode paths."""
    idx = np.asarray(idx, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if idx.ndim != 2 or pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= pal.shape[0] <= 256:
        raise ValueError("expected (H, W) indices and (N<=256, 3) palette")
    if int(idx.max(initial=0)) >= pal.shape[0]:
        raise ValueError("index outside the palette")
    h, w = idx.shape
    table = np.zeros((pal.shape[0], 4), dtype=np.uint8)
    table[:, 2::-1] = pal  # RGB -> BGRX
    if not rle:
        row_size = (w + 3) & ~3
        rows = np.zeros((h, row_size), dtype=np.uint8)
        rows[:, :w] = idx[::-1]
        data = rows.tobytes()
        compression = 0
    else:
        out = bytearray()
        for row in idx[::-1]:  # bottom-up
            x = 0
            while x < w:
                run = 1
                while x + run < w and row[x + run] == row[x] and run < 255:
                    run += 1
                out += bytes([run, int(row[x])])
                x += run
            out += bytes([0, 0])  # end of line
        out += bytes([0, 1])  # end of bitmap
        data = bytes(out)
        compression = 1
    offset = 14 + 40 + table.size
    file_header = struct.pack(
        "<2sIHHI", b"BM", offset + len(data), 0, 0, offset
    )
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, compression, len(data), 2835, 2835,
        pal.shape[0], 0,
    )
    return file_header + dib + table.tobytes() + data


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index maps — pure numpy, the
    deterministic choice (no filter-kernel float variance across platforms)."""
    h, w = arr.shape[:2]
    yi = (np.arange(height) * h // height).clip(0, h - 1)
    xi = (np.arange(width) * w // width).clip(0, w - 1)
    return arr[yi][:, xi]


# --- PNG ----------------------------------------------------------------------

#: IHDR color type -> samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
#: legal bit depths per color type (PNG spec 11.2.2)
_PNG_VALID_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}


def _png_stride(width: int, channels: int, depth: int) -> int:
    """Scanline length in bytes (sub-byte pixels pack MSB-first)."""
    return (width * channels * depth + 7) // 8


def _rows_to_pixels(
    rows: np.ndarray, width: int, channels: int, depth: int
) -> np.ndarray:
    """(h, stride) unfiltered scanline bytes -> (h, width, channels)
    samples: uint16 for depth 16 (big-endian pairs), uint8 otherwise
    (sub-byte depths unpack MSB-first, values NOT yet scaled)."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, : width * channels].reshape(h, width, channels)
    if depth == 16:
        s = rows[:, : width * channels * 2]
        hi = s[:, 0::2].astype(np.uint16)
        return ((hi << 8) | s[:, 1::2]).reshape(h, width, channels)
    bits = np.unpackbits(rows, axis=1)[:, : width * depth]
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    vals = (bits.reshape(h, width, depth) * weights).sum(axis=2)
    return vals.astype(np.uint8).reshape(h, width, 1)


def _pixels_to_rows(arr: np.ndarray, depth: int) -> np.ndarray:
    """(h, width*channels) integer samples -> (h, stride) scanline bytes
    (inverse of _rows_to_pixels)."""
    h, n = arr.shape
    if depth == 8:
        return arr.astype(np.uint8)
    if depth == 16:
        out = np.empty((h, n * 2), dtype=np.uint8)
        a = arr.astype(np.uint16)
        out[:, 0::2] = (a >> 8).astype(np.uint8)
        out[:, 1::2] = (a & 0xFF).astype(np.uint8)
        return out
    weights = np.arange(depth - 1, -1, -1)
    bits = ((arr[:, :, None] >> weights[None, None, :]) & 1).astype(np.uint8)
    return np.packbits(bits.reshape(h, n * depth), axis=1)

#: decoded-pixel budget (bytes). A crafted IHDR (e.g. 100k x 100k) or a
#: deflate bomb must fail with the codec contract's ValueError, not a
#: MemoryError after allocating from attacker-controlled dimensions: the
#: cap is checked BEFORE any allocation, and inflation is bounded to the
#: IHDR-derived byte count (zlib.decompressobj max_length) so a bomb can
#: never expand past what the header legitimately implies.
_PNG_MAX_DECODED_BYTES = 1 << 28  # 256 MiB of raw scanlines


def _png_expected_raw(
    width: int, height: int, channels: int, depth: int, interlace: int
) -> int:
    """Exact decompressed scanline-stream length the IHDR implies
    ((stride + 1) bytes per row; Adam7 sums its seven sub-images)."""
    if interlace == 0:
        return (_png_stride(width, channels, depth) + 1) * height
    total = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = max(0, (width - x0 + dx - 1) // dx)
        ph = max(0, (height - y0 + dy - 1) // dy)
        if pw and ph:
            total += (_png_stride(pw, channels, depth) + 1) * ph
    return total


def _paeth(a, b, c):
    """Paeth predictor (PNG spec section 6.6), elementwise over numpy int
    arrays: pick the neighbor (left a, up b, upper-left c) closest to the
    linear prediction a + b - c; ties break left, then up."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def _png_chunks(b: bytes):
    """Yield (type, data) for each chunk, verifying length bounds and CRC."""
    pos = 8
    while pos + 8 <= len(b):
        (length,) = struct.unpack_from(">I", b, pos)
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(b):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", b, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, data
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND chunk")


#: Adam7 interlace pass layout (x0, y0, dx, dy) per the PNG spec
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def _unfilter_rows(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Filtered scanlines ((stride+1) bytes per row) -> (height, stride)
    uint8 pixel-byte rows. ``stride`` is the scanline length in BYTES and
    ``bpp`` the filter delta distance in bytes (max(1, channels*depth/8)
    per the spec — sub-byte depths filter at distance 1).

    Unfiltering works on int32 rows. Vectorization by filter type:
    None is a copy; Up is one whole-row vector add; Sub is a per-lane
    cumulative sum mod 256 (out[p] = sum of raw deltas up to p), so all
    three are O(1) numpy calls per row. Average and Paeth have a true
    data dependency along x (each byte group needs the already-unfiltered
    left neighbor), so they loop over byte groups with the group
    vectorized — the spec makes them inherently sequential; a constant
    factor beyond this needs a native codec (PIL/libpng swap-in)."""
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"PNG pixel data length {len(raw)} != expected {(stride + 1) * height}"
        )
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    ftypes = rows[:, 0]
    if (bad := ftypes[ftypes > 4]).size:
        y = int(np.argmax(ftypes > 4))
        raise ValueError(f"unknown PNG filter type {int(bad[0])} on row {y}")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pad = (-stride) % bpp  # lane-pad so the cumsum reshape is rectangular
    for y in range(height):
        ftype = int(ftypes[y])
        line = rows[y, 1:].astype(np.int32)
        if ftype == 1:  # Sub: prefix sum per byte lane, mod 256
            lanes = np.concatenate([line, np.zeros(pad, dtype=np.int32)]) if pad else line
            line = (
                np.cumsum(lanes.reshape(-1, bpp), axis=0, dtype=np.int64)
                .reshape(-1)[:stride] & 0xFF
            ).astype(np.int32)
        elif ftype == 2:  # Up
            line = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            line[:bpp] = (line[:bpp] + (prev[:bpp] >> 1)) & 0xFF
            for x in range(bpp, stride, bpp):
                e = min(x + bpp, stride)
                line[x:e] = (
                    line[x:e]
                    + ((line[x - bpp : e - bpp] + prev[x:e]) >> 1)
                ) & 0xFF
        elif ftype == 4:  # Paeth (first group: a = c = 0 -> predictor is up)
            line[:bpp] = (line[:bpp] + prev[:bpp]) & 0xFF
            for x in range(bpp, stride, bpp):
                e = min(x + bpp, stride)
                pred = _paeth(
                    line[x - bpp : e - bpp],
                    prev[x:e],
                    prev[x - bpp : e - bpp],
                )
                line[x:e] = (line[x:e] + pred) & 0xFF
        out[y] = line
        prev = line
    return out


def decode_png(b: bytes) -> np.ndarray:
    """PNG -> sample array: (H, W) for grayscale, (H, W, 2) gray+alpha,
    (H, W, 3) for RGB or palette-indexed (color type 3, expanded through
    PLTE), (H, W, 4) for RGBA. Every legal IHDR combination decodes —
    bit depths 1/2/4 (gray and palette; MSB-first packed, gray scaled to
    the full 8-bit range like libpng), 8, and 16 (returned as uint16,
    big-endian samples per spec). Non-interlaced AND Adam7-interlaced
    streams both decode (each interlace pass is unfiltered independently
    per the spec, then scattered to its (x0 + i*dx, y0 + j*dy) grid).

    Full scanline unfiltering per the spec (None/Sub/Up/Average/Paeth,
    filter distance max(1, channels*depth/8) bytes); CRCs are verified
    chunk by chunk. tRNS transparency expands to an alpha channel:
    palette alpha table for color type 3 (-> RGBA), raw-sample-value
    keying for gray/RGB (-> gray+alpha / RGBA, matched pixels fully
    transparent).
    """
    if b[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload (bad signature)")
    width = height = None
    channels = depth = None
    color = None
    is_palette = False
    plte = None
    trns = None
    interlace = 0
    idat = bytearray()
    for ctype, data in _png_chunks(b):
        if ctype == b"IHDR":
            try:
                width, height, depth, color, comp, filt, interlace = struct.unpack(
                    ">IIBBBBB", data
                )
            except struct.error as e:
                raise ValueError(f"malformed PNG IHDR ({e})") from e
            if color not in _PNG_CHANNELS or depth not in _PNG_VALID_DEPTHS[color]:
                raise ValueError(
                    f"illegal PNG depth/color combination "
                    f"(depth={depth}, color_type={color})"
                )
            if comp != 0 or filt != 0:
                raise ValueError("invalid PNG compression/filter method")
            if interlace not in (0, 1):
                raise ValueError(f"invalid PNG interlace method {interlace}")
            # palette images unfilter as an index plane; PLTE expansion
            # to RGB happens after de-interlacing
            is_palette = color == 3
            channels = _PNG_CHANNELS[color]
        elif ctype == b"PLTE":
            if len(data) == 0 or len(data) % 3 != 0 or len(data) > 768:
                raise ValueError(f"invalid PLTE length {len(data)}")
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = data
        elif ctype == b"IDAT":
            idat.extend(data)
    if width is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    if is_palette and plte is None:
        raise ValueError("palette PNG missing its PLTE chunk")
    if width == 0 or height == 0:
        raise ValueError("PNG has zero width or height")
    expected = _png_expected_raw(width, height, channels, depth, interlace)
    if expected > _PNG_MAX_DECODED_BYTES:
        raise ValueError(
            f"PNG dimensions {width}x{height}x{channels} imply {expected} "
            f"decoded bytes, over the {_PNG_MAX_DECODED_BYTES} budget"
        )
    # bounded inflate: a deflate bomb cannot expand past the IHDR-implied
    # byte count (+1 sentinel byte to DETECT an over-long stream)
    d = zlib.decompressobj()
    try:
        raw = d.decompress(bytes(idat), expected + 1)
    except zlib.error as e:
        raise ValueError(f"corrupt PNG deflate stream ({e})") from e
    if len(raw) > expected or d.unconsumed_tail:
        raise ValueError(
            f"PNG pixel data longer than the {expected} bytes IHDR implies"
        )
    bpp = max(1, channels * depth // 8)
    if interlace == 0:
        rows = _unfilter_rows(raw, height, _png_stride(width, channels, depth), bpp)
        pix = _rows_to_pixels(rows, width, channels, depth)
    else:
        # Adam7: seven independent sub-images, each filtered relative to
        # its own previous pass row; zero-dimension passes contribute no
        # bytes
        pix = np.zeros(
            (height, width, channels),
            dtype=np.uint16 if depth == 16 else np.uint8,
        )
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = max(0, (width - x0 + dx - 1) // dx)
            ph = max(0, (height - y0 + dy - 1) // dy)
            if pw == 0 or ph == 0:
                continue
            st = _png_stride(pw, channels, depth)
            need = ph * (st + 1)
            sub = _unfilter_rows(raw[pos : pos + need], ph, st, bpp)
            pix[y0::dy, x0::dx] = _rows_to_pixels(sub, pw, channels, depth)
            pos += need
        if pos != len(raw):
            raise ValueError(
                f"interlaced PNG pixel data length {len(raw)} != expected {pos}"
            )
    if trns is not None and color in (4, 6):
        raise ValueError("tRNS is illegal for color types with alpha")
    if is_palette:
        idx = pix[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError(
                f"palette index {int(idx.max())} out of range for "
                f"{len(plte)}-entry PLTE"
            )
        rgb = plte[idx]  # (H, W) indices -> (H, W, 3) RGB
        if trns is None:
            return rgb
        # tRNS: one alpha byte per leading palette entry, rest opaque
        if len(trns) > len(plte):
            raise ValueError("tRNS longer than the palette")
        alpha = np.full(len(plte), 255, dtype=np.uint8)
        alpha[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
        return np.dstack([rgb, alpha[idx]])
    tkey = None
    if trns is not None:
        # gray: one 16-bit sample; RGB: three — compared against RAW
        # (pre-scaling) sample values per the spec
        if len(trns) != 2 * channels:
            raise ValueError(
                f"tRNS length {len(trns)} != {2 * channels} for color "
                f"type {color}"
            )
        tkey = np.frombuffer(trns, dtype=">u2").astype(
            np.uint16 if depth == 16 else np.uint8
        )
        transparent = (pix == tkey[None, None, :]).all(axis=2)
    if depth < 8:
        # scale d-bit gray to the full 8-bit range (255/(2^d - 1) is an
        # exact integer for d in {1, 2, 4})
        pix = (pix * (255 // ((1 << depth) - 1))).astype(np.uint8)
    if tkey is not None:
        maxv = 65535 if depth == 16 else 255
        alpha = np.where(transparent, 0, maxv).astype(pix.dtype)
        return np.dstack([pix.reshape(height, width, channels), alpha])
    return pix[:, :, 0] if channels == 1 else pix


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(
    arr: np.ndarray,
    *,
    filter_type: int | str = 0,
    interlace: bool = False,
    palette: np.ndarray | None = None,
    depth: int | None = None,
    transparency=None,
) -> bytes:
    """sample array -> PNG, at any legal IHDR combination.

    ``arr``: (H, W) grayscale, (H, W, 2) gray+alpha, (H, W, 3) RGB,
    (H, W, 4) RGBA — uint8 writes depth 8, uint16 writes depth 16
    (big-endian samples). ``depth`` of 1/2/4 packs sub-byte grayscale or
    palette indices (values must fit the depth; note the DECODER scales
    sub-byte gray to the full 8-bit range). ``filter_type`` selects the
    per-row scanline filter: 0..4 fixed, or ``"cycle"`` for filter
    ``y % 5`` on row y — the test/fixture mode that forces a decoder
    through every unfilter path in a single image. ``interlace=True``
    writes Adam7 (seven passes, each filtered as its own sub-image per
    the spec). ``palette`` (an (N<=256, 3) uint8 RGB table) writes color
    type 3: ``arr`` must then be an (H, W) INDEX plane into that table —
    decoding expands back to the (H, W, 3) RGB image ``palette[arr]``.
    ``transparency`` writes a tRNS chunk: a 1-D alpha array for palette
    images (decode then returns RGBA), a single RAW sample value for
    grayscale, or an (r, g, b) triple for RGB (decode returns
    gray+alpha / RGBA with matching pixels fully transparent)."""
    arr = np.asarray(arr)
    if arr.dtype == np.uint16:
        if depth not in (None, 16):
            raise ValueError("uint16 samples write depth 16")
        depth = 16
    elif arr.dtype != np.uint8:
        arr = arr.astype(np.uint8)
    if palette is not None:
        pal = np.asarray(palette, dtype=np.uint8)
        if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= pal.shape[0] <= 256:
            raise ValueError(
                f"palette must be (N<=256, 3) uint8 RGB, got {pal.shape}"
            )
        if arr.ndim != 2:
            raise ValueError(
                f"palette PNG takes an (H, W) index plane, got {arr.shape}"
            )
        depth = 8 if depth is None else depth
        if int(arr.max(initial=0)) >= min(pal.shape[0], 1 << depth):
            raise ValueError(
                f"index {int(arr.max())} out of range for "
                f"{pal.shape[0]}-entry palette at depth {depth}"
            )
        channels, color = 1, 3
        full = arr[:, :, None]
    elif arr.ndim == 2:
        channels, color = 1, 0
        depth = 8 if depth is None else depth
        if depth < 8 and int(arr.max(initial=0)) >= (1 << depth):
            raise ValueError(
                f"gray value {int(arr.max())} does not fit depth {depth}"
            )
        full = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] in (2, 3, 4):
        channels = arr.shape[2]
        color = {2: 4, 3: 2, 4: 6}[channels]
        depth = 8 if depth is None else depth
        full = arr
    else:
        raise ValueError(
            f"expected (H,W), (H,W,2), (H,W,3) or (H,W,4) array, got {arr.shape}"
        )
    if depth not in _PNG_VALID_DEPTHS[color]:
        raise ValueError(
            f"illegal PNG depth/color combination (depth={depth}, "
            f"color_type={color})"
        )
    h, w = arr.shape[:2]
    bpp = max(1, channels * depth // 8)
    if interlace:
        # Adam7: each pass's sub-image is gathered, packed, and filtered
        # as its own scanline stream (filter context resets per pass)
        raw = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = full[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            rows = _pixels_to_rows(
                sub.reshape(sub.shape[0], sub.shape[1] * channels), depth
            )
            raw += _filter_rows(rows, bpp, filter_type)
    else:
        rows = _pixels_to_rows(full.reshape(h, w * channels), depth)
        raw = _filter_rows(rows, bpp, filter_type)
    trns = None
    if transparency is not None:
        if color == 3:
            ta = np.asarray(transparency, dtype=np.uint8)
            if ta.ndim != 1 or len(ta) > pal.shape[0]:
                raise ValueError(
                    "palette transparency must be a 1-D alpha array no "
                    "longer than the palette"
                )
            trns = ta.tobytes()
        elif color == 0:
            trns = struct.pack(">H", int(transparency))
        elif color == 2:
            r_, g_, b_ = (int(x) for x in transparency)
            trns = struct.pack(">HHH", r_, g_, b_)
        else:
            raise ValueError(
                "transparency (tRNS) is illegal for color types with alpha"
            )
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 1 if interlace else 0)
    out = _PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _png_chunk(b"PLTE", pal.tobytes())
    if trns is not None:
        out += _png_chunk(b"tRNS", trns)
    return (
        out
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def _filter_rows(flat: np.ndarray, bpp: int, filter_type) -> bytearray:
    """(h, stride) uint8 scanline BYTES -> filtered scanline byte stream
    (``bpp`` is the spec's filter delta distance in bytes).

    Filtering (unlike UNfiltering) reads only ORIGINAL byte values, so
    every filter type is one vectorized row expression — left/up/upper-
    left neighbors are bpp-shifted views of the raw rows."""
    stride = flat.shape[1]
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(flat.shape[0]):
        line = flat[y].astype(np.int32)
        left = np.zeros(stride, dtype=np.int32)
        left[bpp:] = line[:-bpp]
        ft = (y % 5) if filter_type == "cycle" else int(filter_type)
        raw.append(ft)
        if ft == 0:
            filtered = line
        elif ft == 1:
            filtered = line - left
        elif ft == 2:
            filtered = line - prev
        elif ft == 3:
            filtered = line - ((left + prev) >> 1)
        elif ft == 4:
            ul = np.zeros(stride, dtype=np.int32)
            ul[bpp:] = prev[:-bpp]
            filtered = line - _paeth(left, prev, ul)
        else:
            raise ValueError(f"filter_type must be 0..4 or 'cycle', got {ft}")
        raw.extend((filtered & 0xFF).astype(np.uint8).tobytes())
        prev = line
    return raw


# --- WAV ----------------------------------------------------------------------

#: G.711 expansion tables (CCITT G.711 / the public-domain Sun reference
#: implementation): 8-bit companded code -> linear 16-bit sample.


def mulaw_decode_table() -> np.ndarray:
    """256-entry mu-law -> int16 expansion (G.711; codes are transmitted
    bit-inverted; +/-0 collapse, max magnitude 32124)."""
    u = (~np.arange(256, dtype=np.int64)) & 0xFF
    t = ((u & 0x0F) << 3) + 0x84
    t = t << ((u & 0x70) >> 4)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int64)


def alaw_decode_table() -> np.ndarray:
    """256-entry A-law -> int16 expansion (G.711; even bits inverted by
    0x55 on the wire; max magnitude 32256)."""
    a = np.arange(256, dtype=np.int64) ^ 0x55
    quant = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    t = np.where(
        seg == 0,
        quant + 8,
        (quant + 0x108) << np.maximum(seg - 1, 0),
    )
    return np.where(a & 0x80, t, -t).astype(np.int64)


#: IMA/DVI ADPCM tables (IMA "Recommended Practices for Enhancing Digital
#: Audio Compatibility in Multimedia Systems" rev 3.00, also reproduced in
#: RFC 3551 and the public Intel/DVI reference): 89-entry quantizer step
#: table and 16-entry step-index adjustment table. Pinned against the
#: published values in tests/test_multimodal.py.

_IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
_IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)


def ima_adpcm_advance(pred: int, idx: int, nibble: int) -> tuple[int, int]:
    """One IMA ADPCM state transition: (predictor, step index) + 4-bit
    code -> next state. The exact-integer diff form (step>>3 base plus
    per-bit step fractions) is the one the IMA recommended practice and
    every interoperable decoder use."""
    step = _IMA_STEP_TABLE[idx]
    diff = step >> 3
    if nibble & 4:
        diff += step
    if nibble & 2:
        diff += step >> 1
    if nibble & 1:
        diff += step >> 2
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + _IMA_INDEX_TABLE[nibble]))
    return pred, idx


def adpcm_decode(data: bytes, *, channels: int, block_align: int) -> np.ndarray:
    """IMA ADPCM ``data`` payload -> (n_frames, channels) int16 samples.

    Block layout per the Microsoft WAVE_FORMAT_DVI_ADPCM registration:
    each block starts with a 4-byte header PER CHANNEL (int16 predictor,
    uint8 step index, uint8 reserved) whose predictor is emitted as the
    block's first sample frame; code bytes follow as 4-byte words
    interleaved channel-by-channel, two samples per byte with the LOW
    nibble first. The final block may be short (mono); multi-channel
    data must stay word-aligned."""
    if channels < 1:
        raise ValueError("ADPCM channel count must be >= 1")
    if block_align <= 4 * channels:
        raise ValueError(
            f"ADPCM block_align {block_align} leaves no room for "
            f"{channels}-channel headers"
        )
    per_ch: list[list[int]] = [[] for _ in range(channels)]
    pos = 0
    while pos < len(data):
        block = data[pos : pos + block_align]
        pos += block_align
        if len(block) < 4 * channels:
            raise ValueError("truncated ADPCM block header")
        preds: list[int] = []
        idxs: list[int] = []
        for c in range(channels):
            (p,) = struct.unpack_from("<h", block, 4 * c)
            idx = block[4 * c + 2]
            if idx > 88:
                raise ValueError(f"ADPCM step index {idx} out of range")
            preds.append(p)
            idxs.append(idx)
            per_ch[c].append(p)
        body = block[4 * channels :]
        if channels == 1:
            for byte in body:
                for nibble in (byte & 0x0F, byte >> 4):
                    preds[0], idxs[0] = ima_adpcm_advance(
                        preds[0], idxs[0], nibble
                    )
                    per_ch[0].append(preds[0])
        else:
            if len(body) % (4 * channels):
                raise ValueError(
                    "multi-channel ADPCM block data must be a whole number "
                    "of 4-byte words per channel"
                )
            for w in range(0, len(body), 4 * channels):
                for c in range(channels):
                    for byte in body[w + 4 * c : w + 4 * c + 4]:
                        for nibble in (byte & 0x0F, byte >> 4):
                            preds[c], idxs[c] = ima_adpcm_advance(
                                preds[c], idxs[c], nibble
                            )
                            per_ch[c].append(preds[c])
    return np.stack(
        [np.asarray(ch, dtype=np.int16) for ch in per_ch], axis=1
    )


def encode_wav_adpcm(
    nibbles: np.ndarray,
    sample_rate: int,
    *,
    block_align: int = 68,
    init_pred: int = 0,
    init_index: int = 0,
) -> bytes:
    """4-bit IMA code stream -> a mono WAVE_FORMAT_DVI_ADPCM (0x11) WAV.

    The fixture twin of :func:`encode_wav_g711`: the CODE nibbles are
    supplied directly (no audio quantization round trip), so the decoded
    samples are a pure function of (nibbles, init state) a SQL oracle
    can reproduce. Each block header carries the RUNNING decoder state,
    so the multi-block decode equals one continuous decode with the
    block-leading predictor samples repeated — exactly what a compliant
    decoder emits. A ``fact`` chunk records the true frame count."""
    nibbles = np.asarray(nibbles, dtype=np.uint8)
    if nibbles.size % 2:
        raise ValueError("nibble count must be even (two codes per byte)")
    if nibbles.size and int(nibbles.max()) > 15:
        raise ValueError("ADPCM codes are 4-bit (0..15)")
    if block_align <= 4 or block_align % 4:
        raise ValueError("block_align must be a positive multiple of 4 > 4")
    if not -32768 <= init_pred <= 32767 or not 0 <= init_index <= 88:
        raise ValueError("initial ADPCM state out of range")
    nib_per_block = (block_align - 4) * 2
    pred, idx = int(init_pred), int(init_index)
    data = bytearray()
    n_frames = 0
    for start in range(0, max(len(nibbles), 1), nib_per_block):
        chunk = nibbles[start : start + nib_per_block]
        data += struct.pack("<hBB", pred, idx, 0)
        n_frames += 1 + len(chunk)
        for j in range(0, len(chunk), 2):
            lo = int(chunk[j])
            hi = int(chunk[j + 1])
            data.append(lo | (hi << 4))
            pred, idx = ima_adpcm_advance(pred, idx, lo)
            pred, idx = ima_adpcm_advance(pred, idx, hi)
    samples_per_block = nib_per_block + 1
    byte_rate = (sample_rate * block_align + samples_per_block - 1) // samples_per_block
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sample_rate, byte_rate, block_align, 4,
        2, samples_per_block,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n_frames)
        + b"data" + struct.pack("<I", len(data)) + bytes(data)
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def adpcm_encode_wav(
    samples: np.ndarray, sample_rate: int, *, block_align: int = 1024
) -> bytes:
    """REAL mono IMA ADPCM encoder: int16 samples -> format-0x11 WAV.
    Block-leading samples are stored verbatim in the headers; the rest
    quantize through the standard greedy bit cascade (sign, step,
    step/2, step/4). Lossy by design — the roundtrip test bounds the
    reconstruction error by the local step size."""
    samples = np.asarray(samples)
    if samples.ndim != 1:
        raise ValueError("real ADPCM encoder is mono: expected 1-D int16")
    samples = samples.astype(np.int64)
    if block_align <= 4 or block_align % 4:
        raise ValueError("block_align must be a positive multiple of 4 > 4")
    spb = (block_align - 4) * 2 + 1
    idx = 0
    data = bytearray()
    for start in range(0, max(len(samples), 1), spb):
        chunk = samples[start : start + spb]
        if not len(chunk):
            break
        pred = int(chunk[0])
        data += struct.pack("<hBB", pred, idx, 0)
        codes: list[int] = []
        for s in chunk[1:]:
            step = _IMA_STEP_TABLE[idx]
            delta = int(s) - pred
            n = 0
            if delta < 0:
                n = 8
                delta = -delta
            if delta >= step:
                n |= 4
                delta -= step
            if delta >= step >> 1:
                n |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                n |= 1
            pred, idx = ima_adpcm_advance(pred, idx, n)
            codes.append(n)
        if len(codes) % 2:
            codes.append(0)  # pad nibble; fact chunk trims the extra frame
        for j in range(0, len(codes), 2):
            data.append(codes[j] | (codes[j + 1] << 4))
    byte_rate = (sample_rate * block_align + spb - 1) // spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sample_rate, byte_rate, block_align, 4, 2, spb
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, len(samples))
        + b"data" + struct.pack("<I", len(data)) + bytes(data)
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _riff_chunks(b: bytes) -> dict[bytes, bytes]:
    """RIFF/WAVE chunk walk -> {chunk_id: payload} (first occurrence)."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    out: dict[bytes, bytes] = {}
    pos = 12
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", b, pos + 4)
        payload = b[pos + 8 : pos + 8 + sz]
        if len(payload) != sz:
            raise ValueError(f"truncated WAV chunk {cid!r}")
        out.setdefault(cid, payload)
        pos += 8 + sz + (sz & 1)  # chunks pad to even offsets
    return out


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """WAV -> (samples float64 in [-1, 1] shaped (n_frames, channels),
    sample_rate). 16-bit and 8-bit PCM, plus G.711 mu-law (format 7) and
    A-law (format 6) companded audio — the telephony encodings — which
    expand through the CCITT tables to 16-bit before normalizing."""
    try:
        chunks = _riff_chunks(b)
        fmt = chunks.get(b"fmt ")
        if fmt is not None and len(fmt) >= 16:
            audio_format, ch = struct.unpack_from("<HH", fmt, 0)
            if audio_format in (6, 7):  # G.711 A-law / mu-law
                (sr,) = struct.unpack_from("<I", fmt, 4)
                data = chunks.get(b"data")
                if data is None:
                    raise ValueError("G.711 WAV missing data chunk")
                if ch < 1 or sr == 0:
                    raise ValueError("invalid G.711 WAV fmt fields")
                table = (
                    mulaw_decode_table() if audio_format == 7
                    else alaw_decode_table()
                )
                codes = np.frombuffer(data, dtype=np.uint8)
                codes = codes[: (len(codes) // ch) * ch]
                samples = table[codes].astype(np.float64) / 32768.0
                return samples.reshape(-1, ch), sr
            if audio_format == 0x11:  # IMA/DVI ADPCM
                (sr,) = struct.unpack_from("<I", fmt, 4)
                (block_align,) = struct.unpack_from("<H", fmt, 12)
                data = chunks.get(b"data")
                if data is None:
                    raise ValueError("ADPCM WAV missing data chunk")
                if ch < 1 or sr == 0:
                    raise ValueError("invalid ADPCM WAV fmt fields")
                pcm = adpcm_decode(data, channels=ch, block_align=block_align)
                fact = chunks.get(b"fact")
                if fact is not None and len(fact) >= 4:
                    # the fact chunk records the true frame count; the
                    # final block may carry a padding nibble beyond it
                    (n_frames,) = struct.unpack_from("<I", fact, 0)
                    if n_frames > pcm.shape[0]:
                        raise ValueError(
                            "ADPCM fact chunk claims more frames than decoded"
                        )
                    pcm = pcm[:n_frames]
                return pcm.astype(np.float64) / 32768.0, sr
    except ValueError:
        raise
    try:
        with wave.open(io.BytesIO(b), "rb") as wf:
            sr = wf.getframerate()
            ch = wf.getnchannels()
            sw = wf.getsampwidth()
            raw = wf.readframes(wf.getnframes())
    except (wave.Error, EOFError, struct.error, RuntimeError, OSError) as e:
        # stdlib wave/chunk raise bare RuntimeError/OSError on some
        # corrupt chunk offsets — normalize to the codec contract
        raise ValueError(
            f"corrupt or truncated WAV ({type(e).__name__}: {e})"
        ) from e
    if sw == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:  # 8-bit WAV is unsigned
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"sample width {sw} bytes not supported")
    return samples.reshape(-1, ch), sr


def encode_wav_g711(
    codes: np.ndarray, sample_rate: int, *, law: str = "mulaw"
) -> bytes:
    """8-bit G.711 code bytes -> a mono mu-law (format 7) or A-law
    (format 6) WAV container (fixture source for the companded path)."""
    codes = np.asarray(codes, dtype=np.uint8)
    if law not in ("mulaw", "alaw"):
        raise ValueError(f"law must be 'mulaw' or 'alaw', got {law!r}")
    audio_format = 7 if law == "mulaw" else 6
    data = codes.tobytes()
    fmt = struct.pack(
        "<HHIIHH", audio_format, 1, sample_rate, sample_rate, 1, 8
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n_frames,) or (n_frames, channels) float in [-1, 1] -> 16-bit PCM WAV."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    pcm = np.clip(arr * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(arr.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def _tar_header_checksum_ok(b: bytes) -> bool:
    """Corroborate a positional 'ustar' hit: the POSIX tar header
    checksum (bytes 148..155, octal ASCII) must equal the unsigned sum
    of the 512-byte header block with the checksum field itself read as
    eight spaces. A JSON/text blob that happens to carry 'ustar' at
    offset 257 effectively never satisfies this."""
    if len(b) < 512:
        return False
    stored = b[148:156].replace(b"\x00", b" ").strip()
    if not stored or any(c not in b"01234567" for c in stored):
        return False
    hdr_sum = sum(b[:148]) + 8 * 0x20 + sum(b[156:512])
    return hdr_sum == int(stored, 8)


def sniff_payload(b: bytes) -> str:
    """The corpus front door: magic-byte dispatch across EVERY format
    this engine parses — the media formats (sniff_format) plus the
    document/container formats the round-10 pillar added. Returns
    'unknown' rather than raising: the whole point of a sniffer is to
    route unrecognized payloads to quarantine, not to die on them."""
    media = sniff_format(b)
    if media is not None:
        return media
    if b[:5] == b"%PDF-":
        return "pdf"
    if b[:4] == b"PK\x03\x04":
        return "zip"
    if b[:2] == b"\x1f\x8b":
        return "gzip"
    if b[:3] == b"BZh":
        return "bzip2"
    if b[:6] == b"\xfd7zXZ\x00":
        return "xz"
    if b[:3] == b"ID3":
        return "mp3"
    if b[:5] == b"WARC/":
        return "warc"
    if b[:4] == b"OggS":
        return "ogg"
    if b[:4] == b"\x1a\x45\xdf\xa3":
        return "mkv"
    if b[:4] == b"Obj\x01":
        return "avro"
    if b[:8] == b"ARROW1\x00\x00":
        return "arrow"
    if b[:4] == b"\x28\xb5\x2f\xfd":
        return "zstd"
    if b[:4] == b"\x04\x22\x4d\x18":
        return "lz4"
    if len(b) > 9 and b[8:9] == b"{":
        import struct

        (hlen,) = struct.unpack_from("<Q", b, 0)
        if 0 < hlen <= len(b) - 8:
            return "safetensors"
    # tar's magic is POSITIONAL (offset 257 inside the first header
    # block), so any blob >= 262 bytes can carry 'ustar' there by
    # coincidence — e.g. a large safetensors JSON header or a text
    # blob. Test it AFTER the structured rungs and corroborate with
    # the header checksum (sum of the 512 header bytes with the
    # checksum field read as spaces, stored as octal ASCII) before
    # claiming tar.
    if b[257:262] == b"ustar" and _tar_header_checksum_ok(b):
        return "tar"
    head = b[:256].lstrip().lower()
    if head.startswith((b"<!doctype html", b"<html")):
        return "html"
    if head.startswith(b"<?xml"):
        return "xml"
    if head.startswith((b"from:", b"received:", b"return-path:")):
        return "email"
    # bare MPEG frame sync LAST, and only when a FULL first frame
    # checks out (valid header fields AND the frame length lands on
    # EOF or on another same-version sync) — a 2-byte sync test alone
    # misroutes UTF-16LE BOMs (FF FE parses as a plausible MPEG1
    # Layer-I header) and any blob whose first bytes carry the 11
    # sync bits
    if len(b) >= 4 and b[0] == 0xFF and (b[1] & 0xE0) == 0xE0:
        vbits = (b[1] >> 3) & 3
        lbits = (b[1] >> 1) & 3
        bidx = (b[2] >> 4) & 0xF
        ridx = (b[2] >> 2) & 3
        if vbits != 1 and lbits != 0 and 1 <= bidx <= 14 and ridx != 3:
            from .mp3 import (
                BITRATE_KBPS,
                SAMPLE_RATES,
                _frame_len,
            )

            version_key = {0: 25, 2: 2, 3: 1}[vbits]
            layer = 4 - lbits
            rate = SAMPLE_RATES[version_key][ridx]
            kbps = BITRATE_KBPS[(1 if version_key == 1 else 2,
                                 layer)][bidx - 1]
            flen = _frame_len(version_key, layer, kbps, rate,
                              (b[2] >> 1) & 1)
            if flen <= len(b) and (
                flen == len(b)
                or (flen + 2 <= len(b) and b[flen] == 0xFF
                    and (b[flen + 1] & 0xE0) == 0xE0)
            ):
                return "mp3"
    return "unknown"
