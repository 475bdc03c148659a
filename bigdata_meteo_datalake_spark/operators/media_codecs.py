"""Stdlib-only media codecs for the multimodal operators (SURVEY.md
section 2.7 follow-up): the container has no PIL/ffmpeg, but two formats
are decodable with nothing beyond the standard library + numpy, which
proves the ``decode="real"`` path end-to-end instead of leaving every
codec stubbed:

- **BMP** (uncompressed 24-bit BI_RGB): fixed 54-byte header parsed with
  ``struct``, pixel rows are raw BGR bottom-up with 4-byte row padding —
  decoded straight into a numpy (H, W, 3) RGB array with zero copies
  beyond the reshape. Encoder included (tests generate real images).
- **WAV** (PCM 16-bit): stdlib ``wave`` for the RIFF container, numpy for
  the sample math.

Anything else (PNG/JPEG/MP4/...) still raises NotImplementedError at the
codec insertion point — a declared boundary, not silent wrong answers.

Scale note: kernels are per-blob numpy (vectorized over pixels/samples);
the Arrow batch loop stays in operators/multimodal.py so batch sizing and
payload-budget partitioning are shared with the fake path.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

__all__ = [
    "decode_bmp",
    "encode_bmp",
    "decode_wav",
    "encode_wav",
    "sniff_format",
]


def sniff_format(b: bytes) -> str | None:
    """Cheap magic-byte sniff for the formats the real path supports."""
    if b[:2] == b"BM":
        return "bmp"
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "wav"
    return None


# --- BMP ----------------------------------------------------------------------


def decode_bmp(b: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP -> (H, W, 3) uint8 RGB array.

    Handles both bottom-up (positive height, the common case) and top-down
    (negative height) row orders and the 4-byte row padding the format
    mandates. Rejects anything compressed or non-24-bit loudly.
    """
    if b[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    (data_offset,) = struct.unpack_from("<I", b, 10)
    width, height = struct.unpack_from("<ii", b, 18)
    _planes, bpp = struct.unpack_from("<HH", b, 26)
    (compression,) = struct.unpack_from("<I", b, 30)
    if compression != 0 or bpp != 24:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    bottom_up = height > 0
    h = abs(height)
    row_size = (width * 3 + 3) & ~3  # rows pad to 4-byte boundary
    need = data_offset + row_size * h
    if len(b) < need:
        raise ValueError(f"truncated BMP: {len(b)} bytes, need {need}")
    rows = np.frombuffer(b, dtype=np.uint8, count=row_size * h, offset=data_offset)
    pix = rows.reshape(h, row_size)[:, : width * 3].reshape(h, width, 3)
    if bottom_up:
        pix = pix[::-1]
    return np.ascontiguousarray(pix[..., ::-1])  # BGR -> RGB


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


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index maps — pure numpy, the
    deterministic choice (no filter-kernel float variance across platforms)."""
    h, w = arr.shape[:2]
    yi = (np.arange(height) * h // height).clip(0, h - 1)
    xi = (np.arange(width) * w // width).clip(0, w - 1)
    return arr[yi][:, xi]


# --- WAV ----------------------------------------------------------------------


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV -> (samples float64 in [-1, 1] shaped (n_frames, channels),
    sample_rate). 16-bit and 8-bit PCM supported (stdlib `wave` rejects
    compressed WAV itself)."""
    with wave.open(io.BytesIO(b), "rb") as wf:
        sr = wf.getframerate()
        ch = wf.getnchannels()
        sw = wf.getsampwidth()
        raw = wf.readframes(wf.getnframes())
    if sw == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:  # 8-bit WAV is unsigned
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"sample width {sw} bytes not supported")
    return samples.reshape(-1, ch), sr


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
