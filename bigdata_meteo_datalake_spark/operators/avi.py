"""Stdlib-only AVI / Motion-JPEG video codec — REAL video frame decode
without ffmpeg: AVI is a RIFF container (same chunk grammar as WAV) and
MJPEG frames are complete baseline JPEGs, which operators/jpeg.py
already decodes in full. Together they give the video pillar a genuine
demux + frame-decode path (GIF animation was the previous stand-in;
MP4/H.264 frame decode remains the declared ffmpeg boundary).

Layout handled (the public VFW/OpenDML structure):

    RIFF 'AVI '
      LIST 'hdrl'
        'avih'  main header (usec/frame, total frames, dims, streams)
        LIST 'strl'
          'strh' stream header (fccType 'vids', handler 'MJPG',
                 scale/rate, length)
          'strf' BITMAPINFOHEADER (biCompression 'MJPG')
      LIST 'movi'
        '00dc' <complete JPEG> (even-padded)  x N
      'idx1'  legacy index (written by the encoder, tolerated on read)

The decoder walks nested LISTs generically, decodes every video chunk
through decode_jpeg (so every JPEG coding process this repo supports —
baseline/progressive/arithmetic — works inside a video), validates
frame-count/dimension consistency against the headers, and returns the
frame stack + frame duration. The encoder writes spec-shaped files any
MJPEG-capable player accepts, used to build oracle fixtures
(block-constant JPEG frames are bit-exact at q75, so the per-frame
means are SQL-recomputable: queries/ext_multimodal.py:
multimodal_avi_frames).

Reference parity note: the reference repo has no codec layer (SURVEY.md
section 4); this module belongs to the multimodal training-data pillar.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_avi_mjpeg", "encode_avi_mjpeg"]


def _chunks(b: bytes, start: int, end: int):
    """Iterate (fourcc, payload_start, payload_size) over a RIFF range;
    LIST chunks yield ('LIST:<type>', inner_start, inner_size)."""
    pos = start
    while pos + 8 <= end:
        cid = b[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", b, pos + 4)
        payload = pos + 8
        if payload + sz > end:
            raise ValueError(f"truncated AVI chunk {cid!r}")
        if cid == b"LIST":
            ltype = b[payload : payload + 4]
            yield (b"LIST:" + ltype, payload + 4, sz - 4)
        else:
            yield (cid, payload, sz)
        pos = payload + sz + (sz & 1)  # chunks pad to even offsets


def decode_avi_mjpeg(b: bytes) -> tuple[np.ndarray, int]:
    """AVI/MJPEG -> (frames, usec_per_frame). Frames stack to
    (n, H, W, 3) RGB or (n, H, W) grayscale uint8 (all frames must
    agree). Header/frame inconsistencies and non-MJPEG video raise
    ValueError / NotImplementedError."""
    from .jpeg import decode_jpeg

    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    usec = None
    total = None
    dims = None
    compression = None
    frames: list[np.ndarray] = []
    for cid, p, sz in _chunks(b, 12, len(b)):
        if cid == b"LIST:hdrl":
            for c2, p2, s2 in _chunks(b, p, p + sz):
                if c2 == b"avih":
                    if s2 < 40:
                        raise ValueError("truncated avih header")
                    usec, _mbps, _pad, _flags, total = struct.unpack_from(
                        "<IIIII", b, p2
                    )
                    w, h = struct.unpack_from("<II", b, p2 + 32)
                    dims = (h, w)
                elif c2 == b"LIST:strl":
                    # Track which stream this strl describes (strh fccType
                    # precedes strf) so an audio stream's strf can never be
                    # mistaken for the video BITMAPINFOHEADER.
                    stream_type = None
                    for c3, p3, s3 in _chunks(b, p2, p2 + s2):
                        if c3 == b"strh":
                            stream_type = b[p3 : p3 + 4]
                            if stream_type == b"vids":
                                handler = b[p3 + 4 : p3 + 8]
                                if handler not in (b"MJPG", b"mjpg"):
                                    raise NotImplementedError(
                                        f"AVI video handler {handler!r} needs "
                                        "ffmpeg (only MJPG decodes here)"
                                    )
                        elif (c3 == b"strf" and s3 >= 40
                              and stream_type == b"vids"):
                            compression = b[p3 + 16 : p3 + 20]
        elif cid == b"LIST:movi":
            for c2, p2, s2 in _chunks(b, p, p + sz):
                if c2[2:4] in (b"dc", b"db"):  # compressed/uncompressed video
                    frames.append(decode_jpeg(b[p2 : p2 + s2]))
    if usec is None:
        raise ValueError("AVI missing avih main header")
    if compression is not None and compression not in (b"MJPG", b"mjpg"):
        raise NotImplementedError(
            f"AVI biCompression {compression!r} needs ffmpeg"
        )
    if not frames:
        raise ValueError("AVI contains no video frames")
    if total and total != len(frames):
        raise ValueError(
            f"AVI header declares {total} frames, stream has {len(frames)}"
        )
    shapes = {f.shape for f in frames}
    if len(shapes) != 1:
        raise ValueError(f"AVI frames disagree on shape: {sorted(shapes)}")
    if dims and frames[0].shape[:2] != dims:
        raise ValueError(
            f"AVI header dims {dims} != frame dims {frames[0].shape[:2]}"
        )
    return np.stack(frames), usec


def encode_avi_mjpeg(
    jpeg_frames: list[bytes], width: int, height: int,
    *, usec_per_frame: int = 40_000
) -> bytes:
    """Complete JPEG bitstreams -> an AVI/MJPEG file (hdrl with
    avih/strh/strf, movi with even-padded 00dc chunks, legacy idx1)."""
    if not jpeg_frames:
        raise ValueError("need at least one frame")
    n = len(jpeg_frames)
    maxsz = max(len(f) for f in jpeg_frames)

    def chunk(cid: bytes, payload: bytes) -> bytes:
        return (cid + struct.pack("<I", len(payload)) + payload
                + (b"\x00" if len(payload) & 1 else b""))

    def lst(ltype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", ltype + payload)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        usec_per_frame, maxsz * 1_000_000 // max(usec_per_frame, 1), 0,
        0x10,  # AVIF_HASINDEX
        n, 0, 1, maxsz, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0,
                      usec_per_frame, 1_000_000, 0, n, maxsz, 0, 0)
        + struct.pack("<HHHH", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh)
                                   + chunk(b"strf", strf)),
    )
    movi_payload = b""
    idx = b""
    for f in jpeg_frames:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx += b"00dc" + struct.pack("<III", 0x10, 4 + len(movi_payload),
                                     len(f))
        movi_payload += chunk(b"00dc", f)
    movi = lst(b"movi", movi_payload)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body
