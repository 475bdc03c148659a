"""Pure stdlib+numpy GIF codec (GIF87a/GIF89a) — gives the multimodal
kernels a real ANIMATED format: per-frame decode is the closest
implementable thing to video frame sampling in a container with no
ffmpeg (reference parity point: the reference treats media as opaque
blobs; SURVEY.md section 2.7).

Scope (declared, enforced loudly):
- decode: logical screen descriptor, global and local color tables,
  variable-width LSB-first LZW (clear/end codes, dictionary growth to
  4096), interlaced and non-interlaced frames, frame composition over
  the canvas with disposal methods 0/1 (leave), 2 (restore background)
  and 3 (restore previous), and GIF89a graphic-control transparency
  (transparent pixels leave the prior canvas visible). Returns every
  composed frame as RGB.
- encode: real LZW compression (dictionary rebuild on overflow),
  optional per-frame interlace, transparency index, disposal, multiple
  frames — fixture-grade but spec-conformant.

Malformed input raises ValueError (never IndexError/struct.error, no
hangs: LZW code stream and sub-block walks are bounds-checked).

All layouts from the public GIF89a specification.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_gif", "encode_gif"]

#: interlace pass layout: (first row, row step)
_INTERLACE = [(0, 8), (4, 8), (2, 4), (1, 2)]

_MAX_FRAMES = 4096  # malformed-stream guard
_MAX_PIXELS = 1 << 26  # per-canvas decoded-pixel budget


def _lzw_decode(mcs: int, data: bytes, n_expected: int) -> np.ndarray:
    """Variable-width LSB-first LZW -> index array of n_expected pixels."""
    if not 2 <= mcs <= 11:
        raise ValueError(f"invalid LZW minimum code size {mcs}")
    clear = 1 << mcs
    end = clear + 1
    out = np.empty(n_expected, dtype=np.uint8)
    n_out = 0

    # bit cursor over the byte stream
    bitpos = 0
    total_bits = len(data) * 8

    def read_code(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > total_bits:
            return -1  # ran out: treat as implicit end
        byte0 = bitpos >> 3
        v = int.from_bytes(data[byte0 : byte0 + 3], "little")
        v = (v >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        return v

    # dictionary: store (prefix_code, last_byte); roots are implicit
    prefix = np.zeros(4096, dtype=np.int32)
    suffix = np.zeros(4096, dtype=np.uint8)
    width = mcs + 1
    next_code = end + 1
    prev = -1

    def emit(code: int) -> int:
        """Expand one code onto out; returns its first byte."""
        nonlocal n_out
        stack = []
        c = code
        while c >= clear:
            stack.append(suffix[c])
            c = int(prefix[c])
        first = c
        stack.append(c)
        need = len(stack)
        if n_out + need > n_expected:
            raise ValueError("LZW stream produces more pixels than the frame holds")
        out[n_out : n_out + need] = stack[::-1]
        n_out += need
        return first

    while True:
        code = read_code(width)
        if code < 0 or code == end:
            break
        if code == clear:
            width = mcs + 1
            next_code = end + 1
            prev = -1
            continue
        if prev < 0:
            if code >= clear:
                raise ValueError("LZW stream starts with a non-root code")
            emit(code)
            prev = code
            continue
        if code < next_code and code != end:
            first = emit(code)
        elif code == next_code:
            # KwKwK case: emit prev + first(prev)
            stack = []
            c = prev
            while c >= clear:
                stack.append(suffix[c])
                c = int(prefix[c])
            first = c
            seq = [c] + stack[::-1] + [c]
            if n_out + len(seq) > n_expected:
                raise ValueError(
                    "LZW stream produces more pixels than the frame holds"
                )
            out[n_out : n_out + len(seq)] = seq
            n_out += len(seq)
        else:
            raise ValueError(f"LZW code {code} ahead of dictionary")
        if next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = first
            next_code += 1
            # the decoder adds entries ONE CODE BEHIND the encoder, so
            # it widens at (1<<width)-1 to stay in sync with an encoder
            # that widens at 1<<width
            if width < 12 and next_code == (1 << width) - 1:
                width += 1
        prev = code
        if n_out >= n_expected:
            break
    if n_out != n_expected:
        raise ValueError(
            f"LZW stream ended after {n_out} of {n_expected} pixels"
        )
    return out


def _lzw_encode(mcs: int, indices: np.ndarray) -> bytes:
    """Real LZW compression (dict rebuild via clear code on overflow)."""
    clear = 1 << mcs
    end = clear + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def write_code(code: int, width: int):
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    table: dict = {}
    width = mcs + 1
    next_code = end + 1
    write_code(clear, width)
    prev = -1
    for v in indices.tolist():
        key = (prev, v)
        if prev < 0:
            prev = v
            continue
        cand = table.get(key)
        if cand is not None:
            prev = cand
            continue
        write_code(prev, width)
        if next_code < 4096:
            table[key] = next_code
            next_code += 1
            if next_code <= 4096 and next_code - 1 == (1 << width) - 1 and width < 12:
                width += 1
        else:
            write_code(clear, width)
            table.clear()
            width = mcs + 1
            next_code = end + 1
        prev = v
    if prev >= 0:
        write_code(prev, width)
    write_code(end, width)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def decode_gif(b: bytes) -> tuple[np.ndarray, list[int]]:
    """GIF bytes -> (frames, delays): frames is (n, H, W, 3) uint8 RGB
    (each frame fully composed over the canvas per its predecessor's
    disposal method), delays the per-frame delay in centiseconds (0 for
    still images)."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (bad signature)")
    try:
        return _decode_gif(b)
    except (IndexError, struct.error) as e:
        raise ValueError(f"corrupt or truncated GIF ({type(e).__name__}: {e})") from e


def _decode_gif(b: bytes):
    width, height, flags, bg, _aspect = struct.unpack_from("<HHBBB", b, 6)
    if width == 0 or height == 0:
        raise ValueError("GIF has zero width or height")
    if width * height > _MAX_PIXELS:
        raise ValueError(f"GIF canvas {width}x{height} over the pixel budget")
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(b[pos : pos + 3 * n], dtype=np.uint8)
        if len(gct) != 3 * n:
            raise ValueError("truncated global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((height, width, 3), dtype=np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:, :] = gct[bg]
    frames = []
    delays = []
    # pending graphic-control state for the NEXT image
    transparent = -1
    delay = 0
    disposal = 0

    def read_subblocks(p: int) -> tuple[bytes, int]:
        chunks = []
        while True:
            if p >= len(b):
                raise ValueError("truncated GIF sub-block chain")
            n = b[p]
            p += 1
            if n == 0:
                return b"".join(chunks), p
            chunks.append(b[p : p + n])
            if len(b[p : p + n]) != n:
                raise ValueError("truncated GIF sub-block")
            p += n

    while True:
        if pos >= len(b):
            raise ValueError("GIF missing trailer (0x3B)")
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(b):
                raise ValueError("truncated GIF extension")
            label = b[pos]
            pos += 1
            data, pos = read_subblocks(pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                gflags, delay = struct.unpack_from("<BH", data, 0)
                disposal = (gflags >> 2) & 0x7
                transparent = data[3] if gflags & 0x01 else -1
        elif block == 0x2C:  # image descriptor
            if len(frames) >= _MAX_FRAMES:
                raise ValueError("GIF frame count over budget")
            left, top, fw, fh, iflags = struct.unpack_from("<HHHHB", b, pos)
            pos += 9
            if fw == 0 or fh == 0 or left + fw > width or top + fh > height:
                raise ValueError("GIF frame rectangle outside the canvas")
            table = gct
            if iflags & 0x80:  # local color table
                n = 2 << (iflags & 0x07)
                table = np.frombuffer(b[pos : pos + 3 * n], dtype=np.uint8)
                if len(table) != 3 * n:
                    raise ValueError("truncated local color table")
                table = table.reshape(n, 3)
                pos += 3 * n
            if table is None:
                raise ValueError("GIF frame has no color table")
            mcs = b[pos]
            pos += 1
            data, pos = read_subblocks(pos)
            idx = _lzw_decode(mcs, data, fw * fh)
            if int(idx.max(initial=0)) >= len(table):
                raise ValueError("GIF pixel index outside the color table")
            if iflags & 0x40:  # interlaced: rows arrive in 4 passes
                rows = np.empty(fh, dtype=np.int64)
                r = 0
                for first, step in _INTERLACE:
                    for y in range(first, fh, step):
                        rows[r] = y
                        r += 1
                deinter = np.empty((fh, fw), dtype=np.uint8)
                deinter[rows] = idx.reshape(fh, fw)
                idx = deinter
            else:
                idx = idx.reshape(fh, fw)
            prior = canvas.copy()
            region = canvas[top : top + fh, left : left + fw]
            rgb = table[idx]
            if transparent >= 0:
                mask = (idx != transparent)[:, :, None]
                region[:] = np.where(mask, rgb, region)
            else:
                region[:] = rgb
            frames.append(canvas.copy())
            delays.append(int(delay))
            # disposal applies AFTER the frame is shown
            if disposal == 2:  # restore background
                # the background index addresses the GLOBAL color table
                # (GIF89a 19: "index into the Global Color Table"), never
                # a frame's local table — a local table smaller than bg
                # must not be consulted (out-of-bounds) nor used (wrong
                # palette). No global table -> black, matching common
                # renderers.
                bg_rgb = (
                    gct[bg] if gct is not None and bg < len(gct) else 0
                )
                canvas[top : top + fh, left : left + fw] = bg_rgb
            elif disposal == 3:  # restore previous canvas
                canvas = prior
            transparent = -1
            delay = 0
            disposal = 0
        else:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
    if not frames:
        raise ValueError("GIF contains no image data")
    return np.stack(frames), delays


def encode_gif(
    frames: np.ndarray,
    palette: np.ndarray,
    *,
    delays: list[int] | None = None,
    interlace: bool = False,
    transparent: int | None = None,
    disposal: int = 0,
) -> bytes:
    """(n, H, W) palette-index frames + (N<=256, 3) RGB palette -> GIF89a
    with real LZW compression. ``interlace`` writes every frame
    interlaced; ``transparent`` marks one index transparent via a
    graphic-control extension; ``disposal`` sets the per-frame disposal
    method."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim == 2:
        frames = frames[None]
    if frames.ndim != 3:
        raise ValueError(f"expected (n, H, W) index frames, got {frames.shape}")
    pal = np.asarray(palette, dtype=np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or not 2 <= pal.shape[0] <= 256:
        raise ValueError(f"palette must be (2<=N<=256, 3) uint8, got {pal.shape}")
    if int(frames.max(initial=0)) >= pal.shape[0]:
        raise ValueError("frame index outside the palette")
    n, h, w = frames.shape
    # color-table size field: smallest k with 2 << k >= len(pal)
    k = max(1, (pal.shape[0] - 1).bit_length()) - 1
    tbl_n = 2 << k
    table = np.zeros((tbl_n, 3), dtype=np.uint8)
    table[: pal.shape[0]] = pal
    mcs = max(2, k + 1)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (0x07 & k) | 0x70, 0, 0)
    out += table.tobytes()
    delays = delays or [0] * n
    for f in range(n):
        gflags = (disposal & 0x7) << 2
        tix = 0
        if transparent is not None:
            gflags |= 0x01
            tix = int(transparent)
        out += bytes([0x21, 0xF9, 4])
        out += struct.pack("<BHB", gflags, int(delays[f]), tix)
        out += bytes([0])  # GCE terminator
        iflags = 0x40 if interlace else 0x00
        out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h) + bytes([iflags])
        idx = frames[f]
        if interlace:
            order = []
            for first, step in _INTERLACE:
                order.extend(range(first, h, step))
            idx = idx[np.array(order)]
        out += bytes([mcs])
        data = _lzw_encode(mcs, idx.reshape(-1))
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += bytes([0])  # image data terminator
    out += bytes([0x3B])  # trailer
    return bytes(out)
