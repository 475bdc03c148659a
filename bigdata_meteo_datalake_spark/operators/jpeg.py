"""Pure stdlib+numpy baseline JPEG codec (ITU-T T.81 sequential DCT,
Huffman entropy coding) — closes the JPEG insertion point in the
multimodal kernels without PIL/libjpeg.

Scope (declared, enforced loudly):
- decode: baseline sequential (SOF0), extended sequential (SOF1), AND
  progressive (SOF2); 8-bit and 12-bit precision (16-bit DQT entries,
  level shift 2^(P-1), 12-bit samples returned as uint16 in 0..4095 —
  see jpeg_precision for range-aware normalization);
  grayscale or 3-component with sampling factors 1..2 per axis — 4:4:4,
  4:2:2 (2x1), 4:4:0 (1x2), and 4:2:0 (2x2, the dominant real-world
  variant) all decode, with the interleaved-MCU block order of T.81
  A.2.3 and nearest (pixel-replication) chroma upsampling; restart
  markers supported in every scan kind. Progressive handles an
  arbitrary scan script per T.81 G: interleaved or single-component DC
  scans, per-component AC spectral-selection bands, successive
  approximation (DC bit refinement, AC +/-2^Al refinement with
  correction bits), and EOB runs. ARITHMETIC coding (SOF9 extended
  sequential / SOF10 progressive, T.81 Annex D QM-coder + Annex F/G
  models, DAC conditioning segments) decodes AND encodes via
  operators/jpeg_arith.py (round 9). LOSSLESS (SOF3, T.81 Annex H:
  predictors 1-7, differences modulo 2^16 with the +32768 category,
  point transform, 2-16 bit precision, components coded directly with
  no color transform) decodes AND encodes (encode_jpeg_lossless) —
  exact on ARBITRARY images, also round 9. Sampling factors > 2,
  arithmetic lossless (SOF11), and hierarchical (SOF5-7/13-15) raise
  NotImplementedError.
- encode: grayscale or RGB with ``subsampling`` in {"444", "422",
  "420"} (box-average chroma downsampling), the spec Annex K example
  Huffman tables and IJG-scaled quantization tables (``quality``
  1..100); ``progressive=True`` writes a spectral-selection scan
  script (one interleaved DC scan + one full AC scan per component);
  ``precision=12`` writes SOF1/SOF2 with flat 12-bit Huffman tables.

JPEG is lossy, so round-trips are approximate in general — EXCEPT for
block-constant images when the DC quantization step divides 8*(v-128):
the DCT of a constant 8x8 block is a lone DC coefficient 8*(v-128), AC
is exactly zero, and with q_DC | 8*(v-128) the pipeline is bit-exact end
to end. At IJG quality 75 the luminance DC step is exactly 8, which
makes block-constant fixtures EXACTLY recoverable — that is what lets a
SQL oracle value-check a lossy codec (see
queries/ext_multimodal.py:multimodal_jpeg_decode).

All constants below are from the public JPEG specification (ITU-T T.81:
Annex K.1 quantization tables, K.3 typical Huffman tables) and the IJG
quality scaling convention.
"""

from __future__ import annotations

import struct
from functools import lru_cache

import numpy as np

__all__ = [
    "decode_jpeg", "encode_jpeg", "encode_jpeg_lossless", "jpeg_precision",
]


def jpeg_precision(b: bytes) -> int:
    """SOF sample precision (8 or 12) from a JPEG header — a cheap
    segment walk, for consumers that must normalize sample values
    (a 12-bit JPEG's uint16 samples top out at 4095, not 65535)."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = b[pos + 1]
        pos += 2
        if marker in (0xD9, 0xDA):
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", b, pos)
        if seglen < 2:
            raise ValueError(f"invalid JPEG segment length {seglen}")
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            return b[pos + 2]
        pos += seglen
    raise ValueError("JPEG missing SOF header")

# --- constants (ITU-T T.81 Annex K) -------------------------------------------

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 "typical" Huffman tables: (bits[1..16], values)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal 8x8 DCT-II basis: forward C = M X M^T, inverse X = M^T C M
_M = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _ijg_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 -> scaled table, clamped to [1, 255]."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


# --- Huffman table construction ------------------------------------------------


def _huff_decode_table(bits, values):
    """Canonical codes (T.81 C.2) -> a flat 16-bit peek LUT: entry i
    (the next 16 bits of the stream) holds (symbol, code_length); a
    length of 0 marks an invalid prefix. One dict/bit-loop-free lookup
    decodes any code — the hot-path trade for 2x64 KiB per table."""
    return _build_huff_lut(tuple(bits), tuple(values))


@lru_cache(maxsize=64)
def _build_huff_lut(bits: tuple, values: tuple):
    """Cached LUT builder — fixture corpora repeat the same DHT segments
    (usually the Annex K tables) across every blob."""
    sym = np.zeros(1 << 16, dtype=np.uint8)
    ln = np.zeros(1 << 16, dtype=np.uint8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if k >= len(values):
                raise ValueError("corrupt DHT: fewer values than BITS claims")
            if code >= (1 << length):
                raise ValueError("corrupt DHT: code overflow at length "
                                 f"{length}")
            base = code << (16 - length)
            span = 1 << (16 - length)
            sym[base : base + span] = values[k]
            ln[base : base + span] = length
            k += 1
            code += 1
        code <<= 1
    return sym, ln


def _huff_encode_table(bits, values):
    """symbol -> (code, length)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return out


# --- bit IO --------------------------------------------------------------------


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 de-stuffing;
    stops at (and reports) marker bytes for restart handling."""

    #: legitimate decodes pad at most a few bits past the final marker
    #: (the tail of the last block); corrupt headers (e.g. a flipped
    #: dimension field) would otherwise decode all-1-bit "data" forever
    _MAX_PAD_FILLS = 8

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.pad_fills = 0

    def _fill(self):
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                # reached a marker: RSTn (end of a restart segment — the
                # 16-bit peek may legitimately prefetch past it) or a
                # real one (EOI/next segment). Pad with 1s per spec; pos
                # stays ON the marker for align_to_marker.
                self.pad_fills += 1
                if self.pad_fills > self._MAX_PAD_FILLS:
                    raise ValueError(
                        "entropy-coded data exhausted before all blocks "
                        "decoded (truncated or corrupt JPEG)"
                    )
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        # trim already-consumed high bits so the int stays word-sized
        self.bitbuf = ((self.bitbuf & ((1 << self.nbits) - 1)) << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        """Bulk n-bit read (MSB first) from the byte-filled buffer."""
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.bitbuf >> self.nbits) & ((1 << n) - 1)

    def peek16(self) -> int:
        """Next 16 bits without consuming (pad-filled past the final
        marker like any other read) — the Huffman LUT index."""
        while self.nbits < 16:
            self._fill()
        return (self.bitbuf >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.nbits -= n

    def align_to_marker(self):
        """Drop buffered bits and skip an expected RSTn marker."""
        self.bitbuf = 0
        self.nbits = 0
        self.pad_fills = 0  # the padding cap is per restart segment
        d = self.data
        # entropy data may end with fill bits already consumed; marker next
        if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
            self.pos += 2
        else:
            raise ValueError("expected restart marker")


def _extend(v: int, t: int) -> int:
    """T.81 F.12 EXTEND: map t-bit magnitude to signed coefficient."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _huff_read(br: _BitReader, table) -> int:
    """One LUT probe decodes any canonical code: peek 16 bits, the entry
    holds (symbol, true code length), consume the length."""
    sym, ln = table
    idx = br.peek16()
    length = ln[idx]
    if length == 0:
        raise ValueError("invalid Huffman code in entropy stream")
    br.skip(int(length))
    return int(sym[idx])


# --- decoder -------------------------------------------------------------------


def _block_full(br: _BitReader, coef: np.ndarray, dtab, atab, pred: int) -> int:
    """Baseline full-band block: DC diff + AC run/size codes (T.81 F.2)."""
    t = _huff_read(br, dtab)
    if t > 15:
        # baseline DC categories stop at 11; a bigger value only arises
        # from a corrupt DHT and would balloon read_bits/pred
        raise ValueError(f"invalid DC category {t} in entropy stream")
    pred += _extend(br.read_bits(t), t)
    coef[0] = pred
    k = 1
    while k < 64:
        rs = _huff_read(br, atab)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        coef[k] = _extend(br.read_bits(s), s)
        k += 1
    return pred


def _ac_first(br, coef, ss, se, al, eobrun, atab):
    """Progressive AC initial scan for one block (T.81 G.1.2.2): run/size
    codes over the band, magnitudes shifted by the approximation low bit,
    EOB runs spanning blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_read(br, atab)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run past end of spectral band")
        coef[k] = _extend(br.read_bits(s), s) * (1 << al)
        k += 1
    return eobrun


def _ac_refine(br, coef, ss, se, al, eobrun, atab):
    """Progressive AC refinement for one block (T.81 G.1.2.3): each
    history-nonzero coefficient passed consumes a correction bit; new
    coefficients arrive as +/-2^Al after a run of history-zero
    positions; EOB runs refine the band remainder."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    in_eob = eobrun > 0
    if in_eob:
        eobrun -= 1
    else:
        while k <= se:
            rs = _huff_read(br, atab)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r < 15:
                    # the CURRENT block enters the EOB run too: its
                    # remaining band is refined below, and eobrun counts
                    # the blocks after it
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += br.read_bits(r)
                    in_eob = True
                    break
                val = 0  # ZRL: sixteen history-zero positions, no new coef
            else:
                if s != 1:
                    raise ValueError(
                        "refinement scan carries magnitudes other than 1"
                    )
                val = p1 if br.read_bit() else m1
            while k <= se:
                c = int(coef[k])
                if c != 0:
                    if br.read_bit() and (c & p1) == 0:
                        coef[k] = c + (p1 if c > 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if k <= se and val:
                coef[k] = val
            k += 1
    if in_eob:
        # refine every remaining history-nonzero coefficient in the band
        while k <= se:
            c = int(coef[k])
            if c != 0 and br.read_bit() and (c & p1) == 0:
                coef[k] = c + (p1 if c > 0 else m1)
            k += 1
    return eobrun


def _lossless_predict(s, y, x, sel, default, restart_at):
    """T.81 H.1.2 prediction. ``restart_at`` is the (y, x) raster index
    where the current restart interval began: that sample predicts from
    the default value, the rest of ITS line uses Ra (the 'first line'
    rule applies per restart interval), and column 0 of later lines
    uses Rb."""
    ry, rx = restart_at
    if y == ry and x == rx:
        return default
    if y == ry:  # first line of the interval: one-dimensional Ra
        return int(s[y, x - 1])
    if x == 0:
        return int(s[y - 1, x])
    ra = int(s[y, x - 1])
    rb = int(s[y - 1, x])
    rc = int(s[y - 1, x - 1])
    if sel == 1:
        return ra
    if sel == 2:
        return rb
    if sel == 3:
        return rc
    if sel == 4:
        return ra + rb - rc
    if sel == 5:
        return ra + ((rb - rc) >> 1)
    if sel == 6:
        return rb + ((ra - rc) >> 1)
    return (ra + rb) >> 1  # sel == 7


def _decode_scan_lossless(
    b: bytes,
    data_pos: int,
    scan_comps: list,
    sel: int,
    pt: int,
    huff_dc: dict,
    samples: list,
    dims: tuple,
    restart_interval: int,
    precision: int,
) -> int:
    """Lossless (SOF3) scan per T.81 Annex H: Huffman-coded prediction
    differences modulo 2^16 (category 16 = +32768 with no extra bits),
    predictors 1-7, point transform, restart intervals re-arming the
    initial prediction. Returns the position of the following marker."""
    height, width = dims
    br = _BitReader(b, data_pos)
    tabs = []
    for c, td, _ta in scan_comps:
        dtab = huff_dc.get(td)
        if dtab is None:
            raise ValueError(f"scan uses undefined DC table {td}")
        tabs.append((c, dtab))
    default = 1 << (precision - pt - 1)
    restart_at = (0, 0)
    mcu = 0
    for y in range(height):
        for x in range(width):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.align_to_marker()
                restart_at = (y, x)
            for c, dtab in tabs:
                t = _huff_read(br, dtab)
                if t > 16:
                    raise ValueError(
                        f"invalid lossless difference category {t}"
                    )
                if t == 16:
                    diff = 32768
                else:
                    diff = _extend(br.read_bits(t), t)
                s = samples[c["idx"]]
                px = _lossless_predict(s, y, x, sel, default, restart_at)
                s[y, x] = (px + diff) & 0xFFFF
            mcu += 1
    p = br.pos
    while p + 1 < len(b):
        if b[p] == 0xFF and b[p + 1] != 0x00:
            if 0xD0 <= b[p + 1] <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    raise ValueError("entropy stream ends without a terminating marker")


def _decode_scan(
    b: bytes,
    data_pos: int,
    scan_comps: list,
    band: tuple,
    huff_dc: dict,
    huff_ac: dict,
    coefs: list,
    mcu_geom: tuple,
    restart_interval: int,
) -> int:
    """Decode one entropy-coded scan (baseline full-band, or any
    progressive DC/AC first/refinement scan) into the frame-level
    raster-order coefficient store; returns the byte position of the
    marker following the scan's entropy data.

    Interleaved (multi-component) scans walk MCUs; single-component
    scans walk the component's own block raster (T.81 A.2.2/A.2.3).
    Restart markers reset DC predictors AND the EOB run."""
    ss, se, ah, al = band
    mcux, mcuy = mcu_geom
    br = _BitReader(b, data_pos)
    eobrun = 0
    preds = [0] * len(scan_comps)
    interleaved = len(scan_comps) > 1
    baseline = (ss, se, ah, al) == (0, 63, 0, 0)
    if interleaved and not baseline and (ss, se) != (0, 0):
        raise ValueError(
            "progressive interleaved scans carry only the DC band"
        )

    tabs = []
    for c, td, ta in scan_comps:
        dtab = huff_dc.get(td) if ss == 0 else None
        atab = huff_ac.get(ta) if se > 0 else None
        if ss == 0 and ah == 0 and dtab is None:
            raise ValueError(f"scan uses undefined DC table {td}")
        if se > 0 and atab is None:
            raise ValueError(f"scan uses undefined AC table {ta}")
        tabs.append((c, dtab, atab))

    if interleaved:
        units_total = mcux * mcuy
    else:
        c0 = scan_comps[0][0]
        units_total = c0["nwb"] * c0["nhb"]

    for unit in range(units_total):
        if restart_interval and unit and unit % restart_interval == 0:
            br.align_to_marker()
            preds = [0] * len(scan_comps)
            eobrun = 0
        if interleaved:
            my, mx = divmod(unit, mcux)
            for ci, (c, dtab, atab) in enumerate(tabs):
                store = coefs[c["idx"]]
                for bv in range(c["v"]):
                    for bh in range(c["h"]):
                        idx = ((my * c["v"] + bv) * c["cols8"]
                               + mx * c["h"] + bh)
                        coef = store[idx]
                        if baseline:
                            preds[ci] = _block_full(
                                br, coef, dtab, atab, preds[ci]
                            )
                        elif ah == 0:  # progressive DC first
                            t = _huff_read(br, dtab)
                            if t > 15:
                                raise ValueError(
                                    f"invalid DC category {t} in entropy stream"
                                )
                            preds[ci] += _extend(br.read_bits(t), t)
                            coef[0] = preds[ci] << al
                        else:  # progressive DC refinement
                            if br.read_bit():
                                coef[0] = int(coef[0]) | (1 << al)
        else:
            c, dtab, atab = tabs[0]
            brow, bcol = divmod(unit, c["nwb"])
            coef = coefs[c["idx"]][brow * c["cols8"] + bcol]
            if baseline:
                preds[0] = _block_full(br, coef, dtab, atab, preds[0])
            elif ss == 0:
                if se != 0:
                    raise ValueError(
                        "progressive scan mixes DC and AC bands"
                    )
                if ah == 0:
                    t = _huff_read(br, dtab)
                    if t > 15:
                        raise ValueError(
                            f"invalid DC category {t} in entropy stream"
                        )
                    preds[0] += _extend(br.read_bits(t), t)
                    coef[0] = preds[0] << al
                else:
                    if br.read_bit():
                        coef[0] = int(coef[0]) | (1 << al)
            elif ah == 0:
                eobrun = _ac_first(br, coef, ss, se, al, eobrun, atab)
            else:
                eobrun = _ac_refine(br, coef, ss, se, al, eobrun, atab)

    # skip any final pad bits / stray restart markers to the next marker
    p = br.pos
    while p + 1 < len(b):
        if b[p] == 0xFF and b[p + 1] != 0x00:
            if 0xD0 <= b[p + 1] <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    raise ValueError("entropy stream ends without a terminating marker")


def decode_jpeg(b: bytes) -> np.ndarray:
    """Baseline JPEG -> uint8 (H, W) grayscale or (H, W, 3) RGB array.

    Malformed input raises ``ValueError`` (or ``NotImplementedError`` for
    declared out-of-scope variants) — never a raw ``IndexError`` /
    ``KeyError`` / ``struct.error``, and never a hang: zero-length
    segments and entropy-stream exhaustion are detected (fuzz-tested on
    truncations and random byte flips)."""
    try:
        return _decode_jpeg(b)
    except (IndexError, KeyError, struct.error, OverflowError) as e:
        raise ValueError(
            f"corrupt or truncated JPEG ({type(e).__name__}: {e})"
        ) from e


def _decode_jpeg(b: bytes) -> np.ndarray:
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps = None
    width = height = None
    restart_interval = 0
    progressive = False
    arithmetic = False
    lossless = False
    pt = 0
    samples = None  # lossless per-component (H, W) sample store
    dac_dc: dict[int, tuple] = {}
    dac_ac: dict[int, int] = {}
    precision = 8
    hmax = vmax = mcux = mcuy = None
    coefs = None  # per SOF component: (rows8*cols8, 64) zigzag, raster order
    any_scan = False
    while pos < len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack_from(">H", b, pos)
        if seglen < 2:  # would stall the segment walk
            raise ValueError(f"invalid JPEG segment length {seglen} at {pos}")
        seg = b[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq not in (0, 1):
                    raise ValueError(f"invalid DQT element precision {pq}")
                tbl = np.zeros(64, dtype=np.int64)
                if pq == 0:
                    tbl[_ZIGZAG] = np.frombuffer(
                        seg[p + 1 : p + 65], dtype=np.uint8
                    )
                    p += 65
                else:  # 16-bit entries (12-bit sample precision)
                    tbl[_ZIGZAG] = np.frombuffer(
                        seg[p + 1 : p + 129], dtype=">u2"
                    ).astype(np.int64)
                    p += 129
                qt[tq] = tbl.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                values = list(seg[p + 17 : p + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _huff_decode_table(
                    bits, values
                )
                p += 17 + n
        elif marker == 0xC3:
            # SOF3 lossless (T.81 Annex H): predictive, no DCT/DQT
            lossless = True
            precision = seg[0]
            if not 2 <= precision <= 16:
                raise ValueError(f"invalid lossless precision {precision}")
            height, width = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component lossless JPEG")
            comps = []
            for i in range(nc):
                cid, hv = seg[6 + 3 * i], seg[7 + 3 * i]
                if hv != 0x11:
                    raise NotImplementedError(
                        "lossless JPEG with subsampling (only 1x1 factors)"
                    )
                comps.append({"id": cid, "idx": i})
            samples = [
                np.zeros((height, width), dtype=np.int64) for _ in comps
            ]
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):
            # SOF0 baseline / SOF1 extended sequential / SOF2 progressive
            # / SOF9 extended sequential arithmetic / SOF10 progressive
            # arithmetic (QM-coder, operators/jpeg_arith.py)
            progressive = marker in (0xC2, 0xCA)
            arithmetic = marker in (0xC9, 0xCA)
            precision = seg[0]
            if precision not in (8, 12):
                raise NotImplementedError(f"{precision}-bit JPEG")
            if precision == 12 and marker == 0xC0:
                raise ValueError(
                    "baseline (SOF0) JPEG is 8-bit only; 12-bit requires "
                    "extended sequential (SOF1) or progressive (SOF2)"
                )
            height, width = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                h_i, v_i = hv >> 4, hv & 0xF
                if not (1 <= h_i <= 4 and 1 <= v_i <= 4):
                    raise ValueError(
                        f"sampling factors {h_i}x{v_i} outside T.81's 1..4"
                    )
                comps.append({"id": cid, "tq": tq, "h": h_i, "v": v_i})
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG")
            if nc == 1:
                # T.81 A.2.2: a single-component (non-interleaved) scan
                # ignores sampling factors — its MCU is one block
                comps[0]["h"] = comps[0]["v"] = 1
            # interleaved MCU geometry (T.81 A.2.3): an MCU spans
            # 8*Hmax x 8*Vmax pixels and carries h_i x v_i blocks of
            # component i, left-to-right then top-to-bottom
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            for c in comps:
                # replication upsampling needs integral ratios (every
                # real-world layout: 4:4:4, 4:2:2, 4:4:0, 4:2:0, 4:1:1)
                if hmax % c["h"] or vmax % c["v"]:
                    raise NotImplementedError(
                        f"non-integral sampling ratio {c['h']}x{c['v']} "
                        f"vs {hmax}x{vmax}"
                    )
            mcux = (width + 8 * hmax - 1) // (8 * hmax)
            mcuy = (height + 8 * vmax - 1) // (8 * vmax)
            # frame-level coefficient store in BLOCK-RASTER order per
            # component — progressive scans accumulate into it across
            # an arbitrary scan script; baseline fills it in one scan
            coefs = [
                np.zeros((mcuy * c["v"] * mcux * c["h"], 64), dtype=np.int64)
                for c in comps
            ]
            for idx, c in enumerate(comps):
                c["idx"] = idx
                c["cols8"] = mcux * c["h"]
                # non-interleaved scans cover only the component's OWN
                # block count, not the MCU-padded grid (T.81 A.2.2)
                cw = (width * c["h"] + hmax - 1) // hmax
                chh = (height * c["v"] + vmax - 1) // vmax
                c["nwb"] = (cw + 7) // 8
                c["nhb"] = (chh + 7) // 8
        elif marker in (0xC5, 0xC6, 0xC7,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG coding process (SOF marker 0x{marker:02X})"
            )
        elif marker == 0xCC:  # DAC: arithmetic conditioning (T.81 B.2.4.3)
            p = 0
            while p + 1 < len(seg):
                tc, tb = seg[p] >> 4, seg[p] & 0xF
                cs = seg[p + 1]
                p += 2
                if tc == 0:
                    low, up = cs & 0xF, cs >> 4
                    if not low <= up <= 15:
                        raise ValueError(
                            f"invalid DC arithmetic conditioning L={low} U={up}"
                        )
                    dac_dc[tb] = (low, up)
                elif tc == 1:
                    if not 1 <= cs <= 63:
                        raise ValueError(
                            f"invalid AC arithmetic conditioning Kx={cs}"
                        )
                    dac_ac[tb] = cs
                else:
                    raise ValueError(f"invalid DAC table class {tc}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if comps is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            by_id = {c["id"]: c for c in comps}
            scan_comps = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                if cs not in by_id:
                    raise ValueError(f"SOS references unknown component {cs}")
                scan_comps.append((by_id[cs], tt >> 4, tt & 0xF))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            if lossless:
                # T.81 H: Ss = predictor selector, Al = point transform
                if not 1 <= ss <= 7:
                    raise ValueError(f"lossless predictor must be 1..7, got {ss}")
                if se != 0 or ah != 0:
                    raise ValueError("lossless scan must have Se=0 and Ah=0")
                if al >= precision:
                    raise ValueError("point transform exceeds sample precision")
                pt = al
                pos = _decode_scan_lossless(
                    b, pos + seglen, scan_comps, ss, al, huff_dc,
                    samples, (height, width), restart_interval, precision,
                )
                any_scan = True
                continue
            if not progressive and (ss, se, ah, al) != (0, 63, 0, 0):
                raise ValueError("baseline scan must cover the full band")
            if progressive and ss == 0 and se != 0:
                raise ValueError(
                    "progressive DC scan must have Se=0 (T.81 G.1)"
                )
            if se > 63 or ss > se:
                raise ValueError(f"invalid spectral band {ss}..{se}")
            if arithmetic:
                from .jpeg_arith import decode_scan_arith

                pos = decode_scan_arith(
                    b, pos + seglen, scan_comps, (ss, se, ah, al),
                    coefs, (mcux, mcuy), restart_interval,
                    dac_dc, dac_ac, progressive,
                )
            else:
                pos = _decode_scan(
                    b, pos + seglen, scan_comps, (ss, se, ah, al),
                    huff_dc, huff_ac, coefs,
                    (mcux, mcuy), restart_interval,
                )
            any_scan = True
            continue
        pos += seglen
    if comps is None or not any_scan:
        raise ValueError("JPEG missing SOF0 or SOS")

    if lossless:
        # predictive mode stores components DIRECTLY (no YCbCr transform,
        # no DCT): undo the point transform and stack. Casting wraps
        # out-of-range values from corrupt streams deterministically.
        dtype = np.uint8 if precision <= 8 else np.uint16
        planes_ll = [(s << pt) & 0xFFFF for s in samples]
        if len(planes_ll) == 1:
            return planes_ll[0].astype(dtype)
        return np.stack(planes_ll, axis=2).astype(dtype)

    # batched per component: zigzag -> raster, dequantize, IDCT over the
    # raster block grid, then crop / replicate-upsample to full resolution
    planes = []
    for c in comps:
        q = qt.get(c["tq"])
        if q is None:
            raise ValueError(f"missing quantization table {c['tq']}")
        h_i, v_i = c["h"], c["v"]
        cols8 = mcux * h_i
        rows8 = mcuy * v_i
        n = coefs[c["idx"]].shape[0]
        raster = np.zeros((n, 64), dtype=np.int64)
        raster[:, _ZIGZAG] = coefs[c["idx"]]
        deq = (raster.reshape(n, 8, 8) * q[None, :, :]).astype(np.float64)
        pix = np.einsum("ij,njk,kl->nil", _M.T, deq, _M, optimize=True)
        p = (
            pix.reshape(rows8, cols8, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(rows8 * 8, cols8 * 8)
        )
        cw = (width * h_i + hmax - 1) // hmax
        chh = (height * v_i + vmax - 1) // vmax
        p = p[:chh, :cw]
        fy, fx = vmax // v_i, hmax // h_i
        if fy > 1 or fx > 1:
            p = p.repeat(fy, axis=0).repeat(fx, axis=1)
        center = float(1 << (precision - 1))
        planes.append(p[:height, :width] + center)
    maxv = (1 << precision) - 1
    dtype = np.uint8 if precision == 8 else np.uint16
    center = float(1 << (precision - 1))
    if len(planes) == 1:
        return np.clip(np.rint(planes[0]), 0, maxv).astype(dtype)
    y, cb, cr = planes
    r = y + 1.402 * (cr - center)
    g = y - 0.344136 * (cb - center) - 0.714136 * (cr - center)
    bch = y + 1.772 * (cb - center)
    rgb = np.stack([r, g, bch], axis=2)
    return np.clip(np.rint(rgb), 0, maxv).astype(dtype)


# --- encoder -------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.bitbuf = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.bitbuf = (self.bitbuf << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.bitbuf >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _mag_bits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def _encode_block(bw: _BitWriter, coef: np.ndarray, pred: int, dtab, atab) -> int:
    dc = int(coef[0])
    diff = dc - pred
    t = _category(diff)
    code, length = dtab[t]
    bw.write(code, length)
    if t:
        bw.write(_mag_bits(diff, t), t)
    # iterate only the nonzero AC positions (typical quantized blocks are
    # sparse); runs of zeros come from position gaps
    nz = np.nonzero(coef[1:])[0]
    prev_k = 0
    for p in nz:
        k = int(p) + 1
        run = k - prev_k - 1
        while run > 15:
            code, length = atab[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        v = int(coef[k])
        s = _category(v)
        code, length = atab[(run << 4) | s]
        bw.write(code, length)
        bw.write(_mag_bits(v, s), s)
        prev_k = k
    if prev_k < 63:
        code, length = atab[0x00]  # EOB
        bw.write(code, length)
    return dc


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


#: 12-bit Huffman tables (flat canonical codes — fixture-grade, valid per
#: T.81 C.2): the Annex K tables stop at DC category 11 / AC size 10, but
#: 12-bit precision needs DC diffs to category 15 and AC sizes to 14.
#: DC: all 16 categories at 5 bits (all-ones 5-bit code unused).
_DC_12 = ([0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0], list(range(16)))
#: AC: EOB + 16 runs x 14 sizes + ZRL = 226 symbols, all at 8 bits.
_AC_12 = (
    [0, 0, 0, 0, 0, 0, 0, 226, 0, 0, 0, 0, 0, 0, 0, 0],
    [0x00] + [(r << 4) | s for r in range(16) for s in range(1, 15)] + [0xF0],
)

#: lossless difference categories reach 16 (the +32768 special case
#: carries no extra bits), so the fixture table is 17 flat 5-bit codes
_DC_LL = (
    [0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
    list(range(17)),
)


def encode_jpeg_lossless(
    arr: np.ndarray,
    *,
    precision: int = 8,
    predictor: int = 4,
    point_transform: int = 0,
    restart_interval: int = 0,
) -> bytes:
    """(H, W) or (H, W, 3) integer samples in 0..2^precision-1 ->
    LOSSLESS JPEG (SOF3, T.81 Annex H): Huffman-coded prediction
    differences modulo 2^16, ``predictor`` 1-7, optional point
    transform (samples are coded as v >> Pt and decode to
    (v >> Pt) << Pt), optional restart intervals. Components are coded
    directly — lossless JPEG applies NO color transform — so the
    roundtrip is bit-exact on arbitrary images, not just block-constant
    fixtures."""
    if not 2 <= precision <= 16:
        raise ValueError(f"precision must be 2..16, got {precision}")
    if not 1 <= predictor <= 7:
        raise ValueError(f"predictor must be 1..7, got {predictor}")
    pt = point_transform
    if not 0 <= pt < precision:
        raise ValueError("point transform must be in [0, precision)")
    arr = np.asarray(arr)
    if arr.ndim == 2:
        planes = [arr.astype(np.int64)]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        planes = [arr[..., i].astype(np.int64) for i in range(3)]
    else:
        raise ValueError(f"expected (H,W) or (H,W,3) array, got {arr.shape}")
    maxv = (1 << precision) - 1
    if any(
        int(p.min(initial=0)) < 0 or int(p.max(initial=0)) > maxv
        for p in planes
    ):
        raise ValueError(f"samples must be in 0..{maxv}")
    h, w = arr.shape[:2]
    nc = len(planes)
    shifted = [p >> pt for p in planes]

    out = bytearray(b"\xff\xd8")
    sof = struct.pack(">BHHB", precision, h, w, nc)
    for i in range(nc):
        sof += bytes([i + 1, 0x11, 0])
    out += _seg(0xC3, sof)
    out += _seg(0xC4, bytes([0x00] + _DC_LL[0] + _DC_LL[1]))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    hdr = bytes([nc])
    for i in range(nc):
        hdr += bytes([i + 1, 0x00])
    hdr += bytes([predictor, 0, pt])
    out += _seg(0xDA, hdr)

    enc = _huff_encode_table(*_DC_LL)
    writer = _BitWriter()
    default = 1 << (precision - pt - 1)
    restart_at = (0, 0)
    mcu = 0
    for y in range(h):
        for x in range(w):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.flush()
                writer.out += bytes(
                    [0xFF, 0xD0 + (mcu // restart_interval - 1) % 8]
                )
                restart_at = (y, x)
            for s in shifted:
                px = _lossless_predict(
                    s, y, x, predictor, default, restart_at
                )
                d = (int(s[y, x]) - px) & 0xFFFF
                if d == 32768:
                    code, length = enc[16]
                    writer.write(code, length)
                    continue
                if d >= 32768:
                    d -= 65536
                t = _category(d)
                code, length = enc[t]
                writer.write(code, length)
                if t:
                    writer.write(_mag_bits(d, t), t)
            mcu += 1
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


#: subsampling name -> per-component (h, v) sampling factors (Y, Cb, Cr)
_SUBSAMPLING = {
    "444": [(1, 1), (1, 1), (1, 1)],
    "422": [(2, 1), (1, 1), (1, 1)],
    "440": [(1, 2), (1, 1), (1, 1)],
    "420": [(2, 2), (1, 1), (1, 1)],
    "411": [(4, 1), (1, 1), (1, 1)],
}


def _encode_ac_band(bw: _BitWriter, zz: np.ndarray, atab) -> None:
    """Progressive spectral-selection AC scan for one block (band
    1..63, Ah=Al=0): identical run/size coding to baseline except the
    block terminator is an EOB run of length 1 (symbol 0x00, no extra
    bits — T.81 G.1.2.2)."""
    nz = np.nonzero(zz[1:])[0]
    prev_k = 0
    for p in nz:
        k = int(p) + 1
        run = k - prev_k - 1
        while run > 15:
            code, length = atab[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        v = int(zz[k])
        s = _category(v)
        code, length = atab[(run << 4) | s]
        bw.write(code, length)
        bw.write(_mag_bits(v, s), s)
        prev_k = k
    if prev_k < 63:
        code, length = atab[0x00]  # EOB (run of 1)
        bw.write(code, length)


def encode_jpeg(
    arr: np.ndarray,
    *,
    quality: int = 75,
    restart_interval: int = 0,
    subsampling: str = "444",
    progressive: bool = False,
    precision: int = 8,
    arithmetic: bool = False,
) -> bytes:
    """uint8 (H, W) grayscale or (H, W, 3) RGB -> baseline or
    progressive JPEG. ``precision=12`` takes uint16 samples in 0..4095
    and writes extended sequential (SOF1; SOF2 when progressive) with
    16-bit quantization-table entries, level shift 2048.

    ``subsampling`` picks the chroma layout: "444" (full-resolution
    chroma), "422" (chroma halved horizontally), or "420" (halved both
    ways — the dominant real-world variant). Chroma is downsampled by a
    box average over each factor cell (edge-replicated at odd edges);
    grayscale input ignores the parameter.

    ``progressive=True`` writes SOF2 with a spectral-selection scan
    script: one interleaved DC scan (Ss=Se=0), then one full AC scan
    (Ss=1, Se=63) per component over its own block raster — the
    coefficients are identical to the baseline encoding, only their
    scan order differs, so block-constant fixtures stay bit-exact.

    ``restart_interval`` > 0 writes a DRI segment and emits an RSTn
    marker (cycling D0..D7) every that-many MCUs (blocks, in
    non-interleaved progressive scans), resetting the DC predictors and
    EOB run — the spec's resync mechanism, here mainly so the decoder's
    restart path is round-trip testable.

    ``arithmetic=True`` entropy-codes with the T.81 Annex D QM-coder
    instead of Huffman: SOF9 (sequential) / SOF10 (progressive), an
    explicit DAC segment carrying the default conditioning (L=0, U=1,
    Kx=5), no DHT segments. Coefficients are identical to the Huffman
    encoding — only the entropy layer differs — so block-constant
    fixtures stay bit-exact. Restart markers flush the coder and reset
    all statistics areas (F.1.3.4)."""
    if precision not in (8, 12):
        raise ValueError(f"precision must be 8 or 12, got {precision}")
    maxv = (1 << precision) - 1
    center = float(1 << (precision - 1))
    arr = np.asarray(arr, dtype=np.uint8 if precision == 8 else np.uint16)
    if precision == 12 and int(arr.max(initial=0)) > maxv:
        raise ValueError(f"12-bit samples must be <= {maxv}")
    if subsampling not in _SUBSAMPLING:
        raise ValueError(
            f"subsampling must be one of {sorted(_SUBSAMPLING)}, "
            f"got {subsampling!r}"
        )
    if arr.ndim == 2:
        planes = [arr.astype(np.float64)]
        factors = [(1, 1)]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        rgb = arr.astype(np.float64)
        r, g, bch = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * bch
        cb = -0.168736 * r - 0.331264 * g + 0.5 * bch + center
        cr = 0.5 * r - 0.418688 * g - 0.081312 * bch + center
        planes = [y, cb, cr]
        factors = _SUBSAMPLING[subsampling]
    else:
        raise ValueError(f"expected (H,W) or (H,W,3) array, got {arr.shape}")
    h, w = arr.shape[:2]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    qluma = _ijg_scale(_QUANT_LUMA, quality).reshape(8, 8)
    qchroma = _ijg_scale(_QUANT_CHROMA, quality).reshape(8, 8)
    tables = [qluma] + [qchroma] * (len(planes) - 1)
    if precision == 8:
        dc_defs = [_DC_LUMA, _DC_CHROMA]
        ac_defs = [_AC_LUMA, _AC_CHROMA]
    else:
        # 12-bit needs DC categories to 15 / AC sizes to 14
        dc_defs = [_DC_12, _DC_12]
        ac_defs = [_AC_12, _AC_12]
    dc_enc = [_huff_encode_table(*dc_defs[0])] + [
        _huff_encode_table(*dc_defs[1])
    ] * (len(planes) - 1)
    ac_enc = [_huff_encode_table(*ac_defs[0])] + [
        _huff_encode_table(*ac_defs[1])
    ] * (len(planes) - 1)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    # zigzag serialization: table entry i holds q[raster position
    # zigzag(i)]; 12-bit precision writes 16-bit (pq=1) entries
    pq = 0 if precision == 8 else 1
    qdtype = np.uint8 if pq == 0 else ">u2"
    zz_luma = np.zeros(64, dtype=qdtype)
    zz_luma[np.arange(64)] = qluma.reshape(64)[_ZIGZAG]
    out += _seg(0xDB, bytes([pq << 4]) + zz_luma.tobytes())
    if len(planes) == 3:
        zz_ch = np.zeros(64, dtype=qdtype)
        zz_ch[np.arange(64)] = qchroma.reshape(64)[_ZIGZAG]
        out += _seg(0xDB, bytes([(pq << 4) | 0x01]) + zz_ch.tobytes())
    nc = len(planes)
    sof = struct.pack(">BHHB", precision, h, w, nc)
    for i in range(nc):
        hv = (factors[i][0] << 4) | factors[i][1]
        sof += bytes([i + 1, hv, 0 if i == 0 else 1])
    if arithmetic:
        sof_marker = 0xCA if progressive else 0xC9
    else:
        sof_marker = 0xC2 if progressive else (0xC0 if precision == 8 else 0xC1)
    out += _seg(sof_marker, sof)
    if arithmetic:
        # explicit DAC with the default conditioning, so decoders
        # exercise the segment parse on every fixture
        dac = b""
        for th in range(1 if nc == 1 else 2):
            dac += bytes([th, 0x10])  # DC: L=0, U=1
            dac += bytes([0x10 | th, 5])  # AC: Kx=5
        out += _seg(0xCC, dac)
    else:
        for i, (bits, values) in enumerate(
            [dc_defs[0], ac_defs[0]]
            + ([dc_defs[1], ac_defs[1]] if nc == 3 else [])
        ):
            tc = i % 2
            th = i // 2
            out += _seg(0xC4, bytes([tc << 4 | th] + bits + values))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))

    def _sos(comp_ids, ss, se_, ah, al):
        hdr = bytes([len(comp_ids)])
        for i in comp_ids:
            t = 0 if i == 0 else 1
            hdr += bytes([i + 1, (t << 4) | t])
        hdr += bytes([ss, se_, (ah << 4) | al])
        return _seg(0xDA, hdr)

    def _pad_edge(p: np.ndarray, th: int, tw: int) -> np.ndarray:
        """Edge-replicate p out to (th, tw)."""
        ph, pw = p.shape
        pp = np.empty((th, tw))
        pp[:ph, :pw] = p
        if th > ph:
            pp[ph:, :pw] = p[ph - 1 : ph, :]
        if tw > pw:
            pp[:, pw:] = pp[:, pw - 1 : pw]
        return pp

    # Batched transform stage: per component, downsample, pad, cut into
    # the block-raster grid, and run DCT + quantize + zigzag as single
    # numpy expressions. The (sequential) entropy writer then walks the
    # precomputed coefficients in T.81 A.2.3 interleaved-MCU order.
    zz_all = []  # per component: (n_blocks, 64) int64, block-raster order
    geo = []  # per component: (fh, fv, cols8, nwb, nhb)
    for (fh, fv), p, q in zip(factors, planes, tables):
        cw = (w * fh + hmax - 1) // hmax
        chh = (h * fv + vmax - 1) // vmax
        fx, fy = hmax // fh, vmax // fv
        if fx > 1 or fy > 1:
            # box-average downsample over each fy x fx cell,
            # edge-replicated so odd edges average real pixels
            src = _pad_edge(p, chh * fy, cw * fx)
            p = src.reshape(chh, fy, cw, fx).mean(axis=(1, 3))
        rows8, cols8 = mcuy * fv, mcux * fh
        pp = _pad_edge(p, rows8 * 8, cols8 * 8) - center
        blocks = (
            pp.reshape(rows8, 8, cols8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(rows8 * cols8, 8, 8)
        )
        coef = np.einsum("ij,njk,kl->nil", _M, blocks, _M.T, optimize=True)
        qc = np.rint(coef / q[None, :, :]).astype(np.int64)
        zz_all.append(qc.reshape(-1, 64)[:, _ZIGZAG])
        geo.append((fh, fv, cols8, (cw + 7) // 8, (chh + 7) // 8))

    def _restart(writer, unit, n_rst):
        writer.flush()  # byte-align before the marker, per spec
        writer.out += bytes([0xFF, 0xD0 + n_rst % 8])

    if arithmetic:
        from .jpeg_arith import ArithScanEncoder

        tids = [0 if i == 0 else 1 for i in range(nc)]
        cond_dc = {t: (0, 1) for t in tids}
        cond_ac = {t: 5 for t in tids}
        if not progressive:
            out += _sos(list(range(nc)), 0, 63, 0, 0)
            se_ = ArithScanEncoder(nc, tids, tids, cond_dc, cond_ac)
            mcu = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and mcu and mcu % restart_interval == 0:
                        se_.restart(mcu // restart_interval - 1)
                    for ci, (fh, fv, cols8, _nwb, _nhb) in enumerate(geo):
                        for bv in range(fv):
                            for bh_ in range(fh):
                                idx = (my * fv + bv) * cols8 + mx * fh + bh_
                                zz = zz_all[ci][idx]
                                se_.dc_first(ci, tids[ci], zz, 0)
                                se_.ac_first(tids[ci], zz, 1, 63, 0)
                    mcu += 1
            out += se_.finish()
        else:
            # scan 1: interleaved DC; then one AC scan per component
            # (the same spectral-selection script as the Huffman path)
            out += _sos(list(range(nc)), 0, 0, 0, 0)
            se_ = ArithScanEncoder(nc, tids, [], cond_dc, cond_ac)
            mcu = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and mcu and mcu % restart_interval == 0:
                        se_.restart(mcu // restart_interval - 1)
                    for ci, (fh, fv, cols8, _nwb, _nhb) in enumerate(geo):
                        for bv in range(fv):
                            for bh_ in range(fh):
                                idx = (my * fv + bv) * cols8 + mx * fh + bh_
                                se_.dc_first(ci, tids[ci], zz_all[ci][idx], 0)
                    mcu += 1
            out += se_.finish()
            for ci, (fh, fv, cols8, nwb, nhb) in enumerate(geo):
                out += _sos([ci], 1, 63, 0, 0)
                se_ = ArithScanEncoder(1, [], [tids[ci]], cond_dc, cond_ac)
                unit = 0
                for brow in range(nhb):
                    for bcol in range(nwb):
                        if (restart_interval and unit
                                and unit % restart_interval == 0):
                            se_.restart(unit // restart_interval - 1)
                        se_.ac_first(
                            tids[ci], zz_all[ci][brow * cols8 + bcol],
                            1, 63, 0,
                        )
                        unit += 1
                out += se_.finish()
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    if not progressive:
        out += _sos(list(range(nc)), 0, 63, 0, 0)
        writer = _BitWriter()
        pred = [0] * nc
        mcu = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    _restart(writer, mcu, mcu // restart_interval - 1)
                    pred = [0] * nc
                for ci, (fh, fv, cols8, _nwb, _nhb) in enumerate(geo):
                    for bv in range(fv):
                        for bh_ in range(fh):
                            idx = (my * fv + bv) * cols8 + mx * fh + bh_
                            pred[ci] = _encode_block(
                                writer, zz_all[ci][idx], pred[ci],
                                dc_enc[ci], ac_enc[ci],
                            )
                mcu += 1
        writer.flush()
        out += writer.out
    else:
        # scan 1: interleaved DC (Ss=Se=0, Ah=Al=0) over MCU order
        out += _sos(list(range(nc)), 0, 0, 0, 0)
        writer = _BitWriter()
        pred = [0] * nc
        mcu = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    _restart(writer, mcu, mcu // restart_interval - 1)
                    pred = [0] * nc
                for ci, (fh, fv, cols8, _nwb, _nhb) in enumerate(geo):
                    for bv in range(fv):
                        for bh_ in range(fh):
                            idx = (my * fv + bv) * cols8 + mx * fh + bh_
                            dc = int(zz_all[ci][idx][0])
                            diff = dc - pred[ci]
                            pred[ci] = dc
                            t = _category(diff)
                            code, length = dc_enc[ci][t]
                            writer.write(code, length)
                            if t:
                                writer.write(_mag_bits(diff, t), t)
                mcu += 1
        writer.flush()
        out += writer.out
        # one spectral-selection AC scan per component (Ss=1, Se=63)
        # over the component's OWN block raster (T.81 A.2.2)
        for ci, (fh, fv, cols8, nwb, nhb) in enumerate(geo):
            out += _sos([ci], 1, 63, 0, 0)
            writer = _BitWriter()
            unit = 0
            for brow in range(nhb):
                for bcol in range(nwb):
                    if restart_interval and unit and unit % restart_interval == 0:
                        _restart(writer, unit, unit // restart_interval - 1)
                    _encode_ac_band(
                        writer, zz_all[ci][brow * cols8 + bcol], ac_enc[ci]
                    )
                    unit += 1
            writer.flush()
            out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
