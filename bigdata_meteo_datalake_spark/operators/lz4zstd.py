"""LZ4 frames (full codec) and Zstandard frame probes — the two
modern shard compressions next to gzip/bz2/xz in the corpus front
door, all stdlib, from the PUBLIC specs (lz4_Frame_format.md /
lz4_Block_format.md, RFC 8878, xxHash spec):

1. xxHash32 and xxHash64 — LZ4 frames checksum headers/blocks/content
   with XXH32 and zstd frames with XXH64's low 32 bits, so both are
   implemented from the published algorithm. Pinned to the spec's
   check values AND cross-verified against the JVM's own xxhash64
   (Spark's ``xxhash64`` SQL function, seed 42) in
   tests/test_round12_props.py — an independent implementation this
   container happens to ship.

2. LZ4 block codec — LZ4 carries NO entropy coding (token-framed
   LZ77: literal run + 2-byte offset + match run, 255-continuation
   length extensions, overlapping matches legal), so unlike zstd the
   FULL decode is implementable and is implemented; the compressor is
   a greedy matcher honoring the spec's end-of-block rules (last 5
   bytes literal, no match starting within the last 12).

3. LZ4 frame walk — magic, FLG/BD descriptor (version 01, reserved
   bits zero, block-max-size table), optional content size and dict
   id, the HEADER CHECKSUM byte ((XXH32(descriptor) >> 8) & 0xFF),
   data blocks (high-bit = uncompressed) with optional per-block
   XXH32, the EndMark, and the optional content XXH32 — every
   checksum verified, every declared size reconciled. Skippable
   frames (magic 0x184D2A5x) are skipped; the legacy frame magic is
   rejected loudly.

4. Zstd frame PROBE — framing only, by design: magic, frame-header
   descriptor (reserved bit, single-segment, dict-id and
   content-size field widths), window descriptor, and the 3-byte
   block headers (raw / RLE / compressed / reserved-rejected) are
   fully walked and accounted; raw and RLE block CONTENT is decoded
   (they carry no entropy coding), and when every block is raw/RLE
   the frame's XXH64-low-32 content checksum is verified and the
   decoded payload returned. FSE/Huffman-compressed block content is
   the declared boundary (no zstd library in-container): the probe
   counts and bounds such blocks but ``zstd_decompress`` raises
   NotImplementedError for them.

Reference parity note: the reference repo ships no compression layer
(SURVEY.md section 4); these extend the corpus-shard front door
(operators/web.py:decompress_jsonl, media_codecs.py:sniff_payload).
"""

from __future__ import annotations

import struct

__all__ = [
    "LZ4_FRAME_MAGIC",
    "ZSTD_FRAME_MAGIC",
    "build_zstd_frame",
    "lz4_block_compress",
    "lz4_block_decompress",
    "lz4_frame_compress",
    "lz4_frame_decompress",
    "xxh32",
    "xxh64",
    "xxh64_u64_np",
    "zstd_frame_probe",
]

LZ4_FRAME_MAGIC = b"\x04\x22\x4d\x18"
ZSTD_FRAME_MAGIC = b"\x28\xb5\x2f\xfd"
_LZ4_LEGACY_MAGIC = b"\x02\x21\x4c\x18"

_M32 = 0xFFFFFFFF
_M64 = 0xFFFFFFFFFFFFFFFF


# --- xxHash32 / xxHash64 (published algorithm) -----------------------------------------

_P32_1, _P32_2, _P32_3, _P32_4, _P32_5 = (
    2654435761, 2246822519, 3266489917, 668265263, 374761393)
_P64_1, _P64_2, _P64_3, _P64_4, _P64_5 = (
    11400714785074694791, 14029467366897019727, 1609587929392839161,
    9650029242287828579, 2870177450012600261)


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh32(data: bytes, seed: int = 0) -> int:
    n = len(data)
    pos = 0
    if n >= 16:
        a1 = (seed + _P32_1 + _P32_2) & _M32
        a2 = (seed + _P32_2) & _M32
        a3 = seed & _M32
        a4 = (seed - _P32_1) & _M32
        while pos + 16 <= n:
            l1, l2, l3, l4 = struct.unpack_from("<IIII", data, pos)
            a1 = (_rotl32((a1 + l1 * _P32_2) & _M32, 13) * _P32_1) & _M32
            a2 = (_rotl32((a2 + l2 * _P32_2) & _M32, 13) * _P32_1) & _M32
            a3 = (_rotl32((a3 + l3 * _P32_2) & _M32, 13) * _P32_1) & _M32
            a4 = (_rotl32((a4 + l4 * _P32_2) & _M32, 13) * _P32_1) & _M32
            pos += 16
        acc = (_rotl32(a1, 1) + _rotl32(a2, 7) + _rotl32(a3, 12)
               + _rotl32(a4, 18)) & _M32
    else:
        acc = (seed + _P32_5) & _M32
    acc = (acc + n) & _M32
    while pos + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, pos)
        acc = (_rotl32((acc + lane * _P32_3) & _M32, 17) * _P32_4) & _M32
        pos += 4
    while pos < n:
        acc = (_rotl32((acc + data[pos] * _P32_5) & _M32, 11) * _P32_1) & _M32
        pos += 1
    acc ^= acc >> 15
    acc = (acc * _P32_2) & _M32
    acc ^= acc >> 13
    acc = (acc * _P32_3) & _M32
    acc ^= acc >> 16
    return acc


def _xxh64_round(acc: int, lane: int) -> int:
    return (_rotl64((acc + lane * _P64_2) & _M64, 31) * _P64_1) & _M64


def _xxh64_merge(acc: int, val: int) -> int:
    acc ^= _xxh64_round(0, val)
    return ((acc * _P64_1) + _P64_4) & _M64


def xxh64_u64_np(lanes, seed: int = 0):
    """Vectorized XXH64 of 8-BYTE little-endian payloads, given as the
    uint64 array those 8 bytes spell (for ``struct.pack('<q'/'<d')``
    inputs that IS the value's integer/bit view — zero packing). numpy
    uint64 arithmetic wraps mod 2^64, so the scalar recipe transcribes
    1:1: acc = seed+P5+8; one tail lane round; the avalanche. Equality
    property-tested against :func:`xxh64` (round-13)."""
    import numpy as np

    def rotl(x, r):
        return (x << np.uint64(r)) | (x >> np.uint64(64 - r))

    p1, p2, p3 = np.uint64(_P64_1), np.uint64(_P64_2), np.uint64(_P64_3)
    with np.errstate(over="ignore"):
        lane = lanes.astype(np.uint64)
        acc = np.uint64((seed + _P64_5 + 8) & _M64)
        rnd = rotl(lane * p2, 31) * p1
        acc = rotl(acc ^ rnd, 27) * p1 + np.uint64(_P64_4)
        acc ^= acc >> np.uint64(33)
        acc *= p2
        acc ^= acc >> np.uint64(29)
        acc *= p3
        acc ^= acc >> np.uint64(32)
    return acc


def xxh64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    pos = 0
    if n >= 32:
        a1 = (seed + _P64_1 + _P64_2) & _M64
        a2 = (seed + _P64_2) & _M64
        a3 = seed & _M64
        a4 = (seed - _P64_1) & _M64
        while pos + 32 <= n:
            l1, l2, l3, l4 = struct.unpack_from("<QQQQ", data, pos)
            a1 = _xxh64_round(a1, l1)
            a2 = _xxh64_round(a2, l2)
            a3 = _xxh64_round(a3, l3)
            a4 = _xxh64_round(a4, l4)
            pos += 32
        acc = (_rotl64(a1, 1) + _rotl64(a2, 7) + _rotl64(a3, 12)
               + _rotl64(a4, 18)) & _M64
        acc = _xxh64_merge(acc, a1)
        acc = _xxh64_merge(acc, a2)
        acc = _xxh64_merge(acc, a3)
        acc = _xxh64_merge(acc, a4)
    else:
        acc = (seed + _P64_5) & _M64
    acc = (acc + n) & _M64
    while pos + 8 <= n:
        (lane,) = struct.unpack_from("<Q", data, pos)
        acc = ((_rotl64(acc ^ _xxh64_round(0, lane), 27) * _P64_1)
               + _P64_4) & _M64
        pos += 8
    if pos + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, pos)
        acc = ((_rotl64(acc ^ ((lane * _P64_1) & _M64), 23) * _P64_2)
               + _P64_3) & _M64
        pos += 4
    while pos < n:
        acc = (_rotl64(acc ^ ((data[pos] * _P64_5) & _M64), 11)
               * _P64_1) & _M64
        pos += 1
    acc ^= acc >> 33
    acc = (acc * _P64_2) & _M64
    acc ^= acc >> 29
    acc = (acc * _P64_3) & _M64
    acc ^= acc >> 32
    return acc


# --- LZ4 block codec --------------------------------------------------------------------


def lz4_block_decompress(b: bytes, max_out: int) -> bytes:
    """One LZ4 block -> raw bytes. ``max_out`` bounds the output (the
    frame layer knows the block-max-size); overruns, zero offsets,
    out-of-window matches, and truncations raise ValueError."""
    out = bytearray()
    pos = 0
    n = len(b)
    if n == 0:
        raise ValueError("empty LZ4 block")
    while True:
        if pos >= n:
            raise ValueError("LZ4 block ends without a final literal run")
        token = b[pos]
        pos += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if pos >= n:
                    raise ValueError("truncated LZ4 literal-length extension")
                x = b[pos]
                pos += 1
                lit += x
                if x != 255:
                    break
        if pos + lit > n:
            raise ValueError("LZ4 literal run overruns the block")
        out += b[pos : pos + lit]
        pos += lit
        if len(out) > max_out:
            raise ValueError("LZ4 block exceeds its declared output bound")
        if pos == n:
            break  # the last sequence carries literals only
        if pos + 2 > n:
            raise ValueError("truncated LZ4 match offset")
        (off,) = struct.unpack_from("<H", b, pos)
        pos += 2
        if off == 0 or off > len(out):
            raise ValueError(f"LZ4 match offset {off} out of window")
        mlen = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                if pos >= n:
                    raise ValueError("truncated LZ4 match-length extension")
                x = b[pos]
                pos += 1
                mlen += x
                if x != 255:
                    break
        if len(out) + mlen > max_out:
            raise ValueError("LZ4 match exceeds the declared output bound")
        start = len(out) - off
        if off >= mlen:
            out += out[start : start + mlen]
        else:  # overlapping: the RLE case
            for i in range(mlen):
                out.append(out[start + i])
    return bytes(out)


def _len_ext(v: int) -> bytes:
    out = bytearray()
    while v >= 255:
        out.append(255)
        v -= 255
    out.append(v)
    return bytes(out)


def lz4_block_compress(data: bytes) -> bytes:
    """Greedy LZ4 block compressor honoring the spec's end rules (the
    last 5 bytes stay literal; no match begins within the final 12
    bytes). All-literal output for incompressible input."""
    n = len(data)
    out = bytearray()
    pos = 0
    lit_start = 0

    def emit(end: int, off: int = 0, mlen: int = 0) -> None:
        lit = end - lit_start
        tok_lit = min(lit, 15)
        tok_m = min(mlen - 4, 15) if mlen else 0
        out.append((tok_lit << 4) | tok_m)
        if tok_lit == 15:
            out.extend(_len_ext(lit - 15))
        out.extend(data[lit_start:end])
        if mlen:
            out.extend(struct.pack("<H", off))
            if tok_m == 15:
                out.extend(_len_ext(mlen - 4 - 15))

    while pos + 12 <= n:
        cand = data.rfind(data[pos : pos + 4], max(0, pos - 65535), pos + 3)
        if cand != -1 and cand < pos:
            mlen = 4
            # the last 5 bytes of the block must remain literals
            limit = n - 5 - pos
            while (mlen < limit and data[cand + mlen] == data[pos + mlen]):
                mlen += 1
            emit(pos, pos - cand, mlen)
            pos += mlen
            lit_start = pos
        else:
            pos += 1
    emit(n)
    return bytes(out)


# --- LZ4 frame --------------------------------------------------------------------------

_LZ4_BD_SIZES = {4: 1 << 16, 5: 1 << 18, 6: 1 << 20, 7: 1 << 22}


def lz4_frame_compress(
    data: bytes,
    *,
    block_size: int = 1 << 16,
    content_size: bool = True,
    block_checksums: bool = True,
    content_checksum: bool = True,
) -> bytes:
    """Raw bytes -> one LZ4 frame (fixture writer exercising every
    optional field: content size, per-block and content XXH32)."""
    flg = (1 << 6) | (1 << 5)  # version 01, blocks independent
    if block_checksums:
        flg |= 1 << 4
    if content_size:
        flg |= 1 << 3
    if content_checksum:
        flg |= 1 << 2
    bd = 4 << 4  # block max size 64 KB
    desc = bytearray([flg, bd])
    if content_size:
        desc += struct.pack("<Q", len(data))
    hc = (xxh32(bytes(desc)) >> 8) & 0xFF
    out = bytearray(LZ4_FRAME_MAGIC) + desc + bytes([hc])
    for i in range(0, len(data), block_size) or [0]:
        chunk = data[i : i + block_size]
        comp = lz4_block_compress(chunk)
        if len(comp) < len(chunk):
            out += struct.pack("<I", len(comp))
            payload = comp
        else:  # incompressible: stored, high bit set
            out += struct.pack("<I", len(chunk) | 0x80000000)
            payload = chunk
        out += payload
        if block_checksums:
            out += struct.pack("<I", xxh32(payload))
    out += struct.pack("<I", 0)  # EndMark
    if content_checksum:
        out += struct.pack("<I", xxh32(data))
    return bytes(out)


def lz4_frame_decompress(b: bytes, stats: dict | None = None) -> bytes:
    """LZ4 frame(s) -> raw bytes, every checksum verified; skippable
    frames skipped; concatenated frames legal; anything else raises.
    When ``stats`` is passed, parse facts accumulate into it
    (n_frames, n_blocks, content_size_declared, dict_id — last frame
    wins for the scalars)."""
    out = bytearray()
    pos = 0
    n = len(b)
    n_frames = 0
    n_blocks = 0
    while pos < n:
        if pos + 4 > n:
            raise ValueError("truncated LZ4 frame magic")
        magic = b[pos : pos + 4]
        pos += 4
        if magic == _LZ4_LEGACY_MAGIC:
            raise ValueError("legacy LZ4 frame format is not supported")
        if magic[0] & 0xF0 == 0x50 and magic[1:4] == b"\x2a\x4d\x18":
            if pos + 4 > n:
                raise ValueError("truncated skippable-frame size")
            (sk,) = struct.unpack_from("<I", b, pos)
            pos += 4
            if pos + sk > n:
                raise ValueError("skippable frame overruns the stream")
            pos += sk
            continue
        if magic != LZ4_FRAME_MAGIC:
            raise ValueError(f"not an LZ4 frame (magic {magic.hex()})")
        if pos + 3 > n:
            raise ValueError("truncated LZ4 frame descriptor")
        flg, bd = b[pos], b[pos + 1]
        if (flg >> 6) != 1:
            raise ValueError(f"unsupported LZ4 frame version {flg >> 6}")
        if flg & 0x02:
            raise ValueError("LZ4 FLG reserved bit set")
        has_bsum = bool(flg & 0x10)
        has_csize = bool(flg & 0x08)
        has_csum = bool(flg & 0x04)
        has_dict = bool(flg & 0x01)
        bmax_code = (bd >> 4) & 0x7
        if bd & 0x8F:
            raise ValueError("LZ4 BD reserved bits set")
        if bmax_code not in _LZ4_BD_SIZES:
            raise ValueError(f"invalid LZ4 block-max-size code {bmax_code}")
        bmax = _LZ4_BD_SIZES[bmax_code]
        desc_end = pos + 2 + (8 if has_csize else 0) + (4 if has_dict else 0)
        if desc_end + 1 > n:
            raise ValueError("truncated LZ4 frame descriptor fields")
        csize = None
        if has_csize:
            (csize,) = struct.unpack_from("<Q", b, pos + 2)
        dict_id = 0
        if has_dict:
            (dict_id,) = struct.unpack_from("<I", b, desc_end - 4)
        want_hc = (xxh32(b[pos:desc_end]) >> 8) & 0xFF
        if b[desc_end] != want_hc:
            raise ValueError(
                f"LZ4 header checksum 0x{b[desc_end]:02x} != 0x{want_hc:02x}"
            )
        pos = desc_end + 1
        frame_out = bytearray()
        while True:
            if pos + 4 > n:
                raise ValueError("truncated LZ4 block header")
            (bsize,) = struct.unpack_from("<I", b, pos)
            pos += 4
            if bsize == 0:
                break  # EndMark
            stored = bool(bsize & 0x80000000)
            bsize &= 0x7FFFFFFF
            if bsize > bmax:
                raise ValueError(
                    f"LZ4 block of {bsize} bytes exceeds the frame's "
                    f"{bmax}-byte maximum"
                )
            if pos + bsize > n:
                raise ValueError("LZ4 block overruns the stream")
            payload = b[pos : pos + bsize]
            pos += bsize
            if has_bsum:
                if pos + 4 > n:
                    raise ValueError("truncated LZ4 block checksum")
                (want,) = struct.unpack_from("<I", b, pos)
                pos += 4
                if xxh32(payload) != want:
                    raise ValueError("LZ4 block checksum mismatch")
            frame_out += payload if stored else lz4_block_decompress(
                payload, bmax)
            n_blocks += 1
        if has_csum:
            if pos + 4 > n:
                raise ValueError("truncated LZ4 content checksum")
            (want,) = struct.unpack_from("<I", b, pos)
            pos += 4
            if xxh32(bytes(frame_out)) != want:
                raise ValueError("LZ4 content checksum mismatch")
        if csize is not None and len(frame_out) != csize:
            raise ValueError(
                f"LZ4 frame decodes to {len(frame_out)} bytes, header "
                f"declares {csize}"
            )
        out += frame_out
        n_frames += 1
        if stats is not None:
            stats.update({"content_size_declared": csize,
                          "dict_id": dict_id})
    if n_frames == 0:
        raise ValueError("no LZ4 frames in the stream")
    if stats is not None:
        stats.update({"n_frames": n_frames, "n_blocks": n_blocks})
    return bytes(out)


# --- Zstandard frame probe ---------------------------------------------------------------

_ZSTD_SKIPPABLE_LOW = 0x184D2A50


def _probe_one_zstd_frame(b: bytes, pos: int) -> tuple[dict, int]:
    n = len(b)
    if pos + 2 > n:
        raise ValueError("truncated zstd frame header descriptor")
    fhd = b[pos]
    pos += 1
    fcs_code = fhd >> 6
    single = bool(fhd & 0x20)
    if fhd & 0x10:
        raise ValueError("zstd frame-header unused bit set")
    if fhd & 0x08:
        raise ValueError("zstd frame-header reserved bit set")
    has_csum = bool(fhd & 0x04)
    did_code = fhd & 0x03
    window = None
    if not single:
        wd = b[pos]
        pos += 1
        window = (1 << (10 + (wd >> 3)))
        window += (window // 8) * (wd & 7)
    did_len = {0: 0, 1: 1, 2: 2, 3: 4}[did_code]
    if pos + did_len > n:
        raise ValueError("truncated zstd dictionary id")
    dict_id = int.from_bytes(b[pos : pos + did_len], "little") if did_len else 0
    pos += did_len
    fcs_len = {0: 1 if single else 0, 1: 2, 2: 4, 3: 8}[fcs_code]
    content_size = None
    if fcs_len:
        if pos + fcs_len > n:
            raise ValueError("truncated zstd frame content size")
        content_size = int.from_bytes(b[pos : pos + fcs_len], "little")
        if fcs_len == 2:
            content_size += 256
        pos += fcs_len

    n_raw = n_rle = n_compressed = 0
    decoded: bytearray | None = bytearray()
    while True:
        if pos + 3 > n:
            raise ValueError("truncated zstd block header")
        h = int.from_bytes(b[pos : pos + 3], "little")
        pos += 3
        last = h & 1
        btype = (h >> 1) & 3
        bsize = h >> 3
        if btype == 3:
            raise ValueError("zstd reserved block type")
        if btype == 0:  # raw
            if pos + bsize > n:
                raise ValueError("zstd raw block overruns the frame")
            if decoded is not None:
                decoded += b[pos : pos + bsize]
            pos += bsize
            n_raw += 1
        elif btype == 1:  # RLE: one byte, repeated bsize times
            if pos + 1 > n:
                raise ValueError("truncated zstd RLE block")
            if decoded is not None:
                decoded += b[pos : pos + 1] * bsize
            pos += 1
            n_rle += 1
        else:  # compressed: entropy-coded content is the declared boundary
            if bsize == 0 or pos + bsize > n:
                raise ValueError("zstd compressed block overruns the frame")
            pos += bsize
            n_compressed += 1
            decoded = None
        if last:
            break
    checksum_ok = None
    if has_csum:
        if pos + 4 > n:
            raise ValueError("truncated zstd content checksum")
        (want,) = struct.unpack_from("<I", b, pos)
        pos += 4
        if decoded is not None:
            checksum_ok = (xxh64(bytes(decoded)) & 0xFFFFFFFF) == want
            if not checksum_ok:
                raise ValueError("zstd content checksum mismatch")
    if decoded is not None and content_size is not None \
            and len(decoded) != content_size:
        raise ValueError(
            f"zstd frame decodes to {len(decoded)} bytes, header "
            f"declares {content_size}"
        )
    return {
        "content_size": content_size,
        "dict_id": dict_id,
        "window_size": window,
        "has_checksum": has_csum,
        "n_raw": n_raw,
        "n_rle": n_rle,
        "n_compressed": n_compressed,
        "decoded": bytes(decoded) if decoded is not None else None,
    }, pos


def zstd_frame_probe(b: bytes) -> dict:
    """Zstd stream -> framing facts without entropy decode: per-frame
    header fields, block-type accounting, skippable frames, and — when
    a frame is raw/RLE-only — the decoded payload with its XXH64-low32
    checksum verified. Trailing garbage, reserved bits/block types,
    and size lies raise ValueError."""
    pos = 0
    n = len(b)
    frames = []
    n_skippable = 0
    while pos < n:
        if pos + 4 > n:
            raise ValueError("truncated zstd magic")
        (magic,) = struct.unpack_from("<I", b, pos)
        pos += 4
        if _ZSTD_SKIPPABLE_LOW <= magic <= _ZSTD_SKIPPABLE_LOW + 0xF:
            if pos + 4 > n:
                raise ValueError("truncated skippable-frame size")
            (sk,) = struct.unpack_from("<I", b, pos)
            pos += 4
            if pos + sk > n:
                raise ValueError("skippable frame overruns the stream")
            pos += sk
            n_skippable += 1
            continue
        if b[pos - 4 : pos] != ZSTD_FRAME_MAGIC:
            raise ValueError(f"not a zstd frame (magic 0x{magic:08x})")
        frame, pos = _probe_one_zstd_frame(b, pos)
        frames.append(frame)
    if not frames:
        raise ValueError("no zstd frames in the stream")
    return {
        "n_frames": len(frames),
        "n_skippable": n_skippable,
        "frames": frames,
        "n_blocks": sum(f["n_raw"] + f["n_rle"] + f["n_compressed"]
                        for f in frames),
        "decoded": (b"".join(f["decoded"] for f in frames)
                    if all(f["decoded"] is not None for f in frames)
                    else None),
    }


def zstd_decompress(b: bytes) -> bytes:
    """Full decompression is available exactly when every block is
    raw/RLE; FSE/Huffman block content raises the declared boundary."""
    probe = zstd_frame_probe(b)
    if probe["decoded"] is None:
        raise NotImplementedError(
            "zstd entropy-coded blocks (FSE/Huffman) are a declared "
            "boundary — no zstd library in-container"
        )
    return probe["decoded"]


def build_zstd_frame(
    data: bytes,
    *,
    block_size: int = 32,
    rle_tail: bytes = b"",
    dict_id: int = 0,
    content_checksum: bool = True,
) -> bytes:
    """Raw bytes -> a spec-shaped zstd frame of RAW blocks (plus one
    RLE block when ``rle_tail`` is a byte run) — legal zstd any
    decoder accepts, and fully verifiable by the probe (fixture
    writer; entropy coding is deliberately absent)."""
    if rle_tail and len(set(rle_tail)) != 1:
        raise ValueError("rle_tail must repeat a single byte")
    content = data + rle_tail
    did_code = 0
    did_bytes = b""
    if dict_id:
        did_code = 3 if dict_id > 0xFFFF else (2 if dict_id > 0xFF else 1)
        did_bytes = dict_id.to_bytes({1: 1, 2: 2, 3: 4}[did_code], "little")
    fhd = (2 << 6) | (0x04 if content_checksum else 0) | did_code
    out = bytearray(ZSTD_FRAME_MAGIC)
    out.append(fhd)
    out.append(0x00)  # window descriptor: 1 MB, no mantissa
    out += did_bytes
    out += struct.pack("<I", len(content))  # FCS code 2: 4 bytes
    chunks = [data[i : i + block_size]
              for i in range(0, len(data), block_size)] or [b""]
    for i, chunk in enumerate(chunks):
        last = (i == len(chunks) - 1) and not rle_tail
        out += ((len(chunk) << 3) | (0 << 1) | (1 if last else 0)
                ).to_bytes(3, "little")
        out += chunk
    if rle_tail:
        out += ((len(rle_tail) << 3) | (1 << 1) | 1).to_bytes(3, "little")
        out.append(rle_tail[0])
    if content_checksum:
        out += struct.pack("<I", xxh64(content) & 0xFFFFFFFF)
    return bytes(out)


# --- Spark kernels (mapInPandas, the codec plan shape) --------------------------------


def _probe_payload(doc_id: int) -> bytes:
    return (f"rec-{doc_id}-" * (1 + doc_id % 7)).encode()


def _probe_rle_tail(doc_id: int) -> bytes:
    return b"z" * (1 + doc_id % 9)


def synthesize_frame_blobs(df):
    """Deterministic source: per ``doc_id`` one LZ4 frame (32-byte
    blocks, content size + block + content XXH32s all present) and one
    zstd frame (32-byte raw blocks + an RLE tail block, XXH64-low32
    checksum, a dictionary id on every fifth document) over the same
    closed-form payload — queries/ext_formats.py:
    compressed_frame_probe_report recomputes the facts."""
    import pandas as pd

    from ..sources.lake import widen

    def kernel(batches):
        for pdf in batches:
            out = {"doc_id": [], "fmt": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                payload = _probe_payload(did)
                out["doc_id"].append(did)
                out["fmt"].append("lz4")
                out["blob"].append(
                    lz4_frame_compress(payload, block_size=32))
                out["doc_id"].append(did)
                out["fmt"].append("zstd")
                out["blob"].append(build_zstd_frame(
                    payload, block_size=32, rle_tail=_probe_rle_tail(did),
                    dict_id=(did + 1) if did % 5 == 0 else 0))
            yield pd.DataFrame(out)

    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, fmt string, blob binary"
    )


FRAME_PROBE_SCHEMA = (
    "doc_id long, fmt string, n_blocks int, content_size long, "
    "dict_id long, payload_md5 string"
)


def frame_probe_features(df):
    """Frame walk -> one fact row per (doc, format): block accounting,
    declared-and-verified content size, dictionary id, and the md5 of
    the DECODED payload (so every checksum and every block decode is
    on the hash path)."""
    import hashlib

    import pandas as pd

    def kernel(batches):
        cols = ("doc_id", "fmt", "n_blocks", "content_size", "dict_id",
                "payload_md5")
        for pdf in batches:
            out = {k: [] for k in cols}
            for doc_id, fmt, blob in zip(pdf["doc_id"], pdf["fmt"],
                                         pdf["blob"]):
                blob = bytes(blob)
                if fmt == "lz4":
                    stats: dict = {}
                    decoded = lz4_frame_decompress(blob, stats)
                    if stats["content_size_declared"] != len(decoded):
                        raise ValueError("lz4 content size drifted")
                    n_blocks = stats["n_blocks"]
                    dict_id = stats["dict_id"]
                elif fmt == "zstd":
                    probe = zstd_frame_probe(blob)
                    decoded = probe["decoded"]
                    if decoded is None:
                        raise ValueError(
                            "probe fixture unexpectedly entropy-coded")
                    n_blocks = probe["n_blocks"]
                    dict_id = probe["frames"][0]["dict_id"]
                else:
                    raise ValueError(f"unknown frame format {fmt!r}")
                out["doc_id"].append(doc_id)
                out["fmt"].append(fmt)
                out["n_blocks"].append(n_blocks)
                out["content_size"].append(len(decoded))
                out["dict_id"].append(dict_id)
                out["payload_md5"].append(hashlib.md5(decoded).hexdigest())
            yield pd.DataFrame(out)

    return df.select("doc_id", "fmt", "blob").mapInPandas(
        kernel, FRAME_PROBE_SCHEMA
    )
