"""MP3 frame-header walk — the audio-corpus triage layer on top of the
ID3v2 metadata probe (operators/id3.py): full per-frame header parsing
(MPEG version / layer / bitrate / sample rate / padding / channel
mode), frame-length arithmetic, stream-consistency checks, Xing/Info
VBR-header detection in the first frame's side-info region, and an
exact-integer duration estimate. This is everything an audio-corpus
pipeline needs to triage, bucket, and deduplicate MP3 files WITHOUT
decoding audio — the Layer-III audio decode itself (huffman tables)
remains the repo's declared boundary (operators/id3.py docstring).

Header layout (ISO/IEC 11172-3 / 13818-3, public):

    AAAAAAAA AAABBCCD EEEEFFGH IIJJKLMM
    A sync (11 bits)       B version (00=2.5 01=res 10=MPEG2 11=MPEG1)
    C layer (01=III 10=II 11=I)          D protection (0 = CRC follows)
    E bitrate index        F sample-rate index      G padding
    I channel mode (00 stereo, 11 mono)

Frame sizes: Layer I = (12*bitrate/rate + pad)*4; Layer II and
MPEG1 Layer III = 144*bitrate/rate + pad; MPEG2/2.5 Layer III =
72*bitrate/rate + pad (576-sample granule). The Xing/Info tag sits
after the side info: MPEG1 stereo +36, MPEG1 mono +21, MPEG2 stereo
+21, MPEG2 mono +13 (bytes from the frame start, header included).

The companion writer ``build_mp3_frames`` emits spec-shaped streams
(optionally ID3v2-tagged, optionally Xing-tagged, CBR or per-frame
VBR) used for oracle fixtures
(queries/ext_multimodal.py:mp3_frames_report).

Reference parity note: the reference repo has no audio layer
(SURVEY.md section 4); this module belongs to the multimodal
training-data pillar.
"""

from __future__ import annotations

import struct

__all__ = ["build_mp3_frames", "parse_mp3_frames"]

# bitrate tables in kbps, 1-based index 1..14 (index 0 = free-format,
# rejected; 15 = invalid). Keyed by (version, layer); version 2 covers
# MPEG 2.5 as well (13818-3 uses one low-rate table for both).
BITRATE_KBPS = {
    (1, 1): [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}

SAMPLE_RATES = {  # index 0..2 by version key (25 = MPEG 2.5)
    1: [44100, 48000, 32000],
    2: [22050, 24000, 16000],
    25: [11025, 12000, 8000],
}

SAMPLES_PER_FRAME = {  # by (version-key grouped as 1 vs 2/2.5, layer)
    1: {1: 384, 2: 1152, 3: 1152},
    2: {1: 384, 2: 1152, 3: 576},
    25: {1: 384, 2: 1152, 3: 576},
}


def _frame_len(version_key: int, layer: int, kbps: int, rate: int,
               pad: int) -> int:
    b = kbps * 1000
    if layer == 1:
        return (12 * b // rate + pad) * 4
    if layer == 2 or version_key == 1:
        return 144 * b // rate + pad
    return 72 * b // rate + pad  # MPEG2/2.5 Layer III


def _xing_offset(version_key: int, mono: bool) -> int:
    if version_key == 1:
        return 21 if mono else 36
    return 13 if mono else 21


def parse_mp3_frames(b: bytes) -> dict:
    """MP3 blob (optionally ID3v2-tagged) -> the triage record:

      {version, layer, samplerate, n_frames, bitrates_kbps (in frame
       order), has_xing, declared_frames (None unless the Xing frames
       field is present), duration_ms}

    Every frame header is validated (sync, non-reserved version/layer,
    valid bitrate/sample-rate indices) and the stream must be
    CONSISTENT (one version/layer/samplerate throughout) and end
    exactly at EOF — truncated tails, mid-stream garbage, and
    free-format bitrate all raise ValueError. duration_ms is exact
    integer math: n_frames * samples_per_frame * 1000 // samplerate."""
    pos = 0
    if b[:3] == b"ID3":
        from .id3 import _unsyncsafe

        if len(b) < 10:
            raise ValueError("truncated ID3 header")
        pos = 10 + _unsyncsafe(b[6:10])
        if pos > len(b):
            raise ValueError("ID3 tag larger than file")
    sig = None  # (version_key, layer, samplerate)
    bitrates: list[int] = []
    has_xing = False
    declared = None
    n = len(b)
    while pos < n:
        if pos + 4 > n:
            raise ValueError(f"truncated frame header at offset {pos}")
        h = struct.unpack_from(">I", b, pos)[0]
        if h >> 21 != 0x7FF:
            raise ValueError(f"lost MPEG frame sync at offset {pos}")
        vbits = (h >> 19) & 3
        if vbits == 1:
            raise ValueError("reserved MPEG version id")
        version_key = {0: 25, 2: 2, 3: 1}[vbits]
        lbits = (h >> 17) & 3
        if lbits == 0:
            raise ValueError("reserved layer")
        layer = 4 - lbits  # 01->III(3), 10->II(2), 11->I(1)
        bidx = (h >> 12) & 0xF
        if bidx == 0:
            raise ValueError("free-format bitrate not supported")
        if bidx == 15:
            raise ValueError("invalid bitrate index 15")
        ridx = (h >> 10) & 3
        if ridx == 3:
            raise ValueError("reserved sample-rate index")
        pad = (h >> 9) & 1
        mode = (h >> 6) & 3
        rate = SAMPLE_RATES[version_key][ridx]
        kbps = BITRATE_KBPS[(1 if version_key == 1 else 2, layer)][bidx - 1]
        if sig is None:
            sig = (version_key, layer, rate)
        elif sig != (version_key, layer, rate):
            raise ValueError(
                f"inconsistent stream at offset {pos}: "
                f"{(version_key, layer, rate)} != {sig}"
            )
        flen = _frame_len(version_key, layer, kbps, rate, pad)
        if pos + flen > n:
            raise ValueError(f"frame at offset {pos} overruns the file")
        if not bitrates and layer == 3:  # Xing lives in the first frame
            # _xing_offset is measured from the FRAME START, header
            # included (MPEG1 stereo 36 = 4 header + 32 side info) —
            # adding the header again would look 4 bytes too deep and
            # miss every real-world LAME/Xing tag
            off = pos + _xing_offset(version_key, mono=(mode == 3))
            tag = b[off : off + 4]
            if tag in (b"Xing", b"Info") and off + 8 <= pos + flen:
                has_xing = True
                flags = struct.unpack_from(">I", b, off + 4)[0]
                if flags & 1 and off + 12 <= pos + flen:
                    declared = struct.unpack_from(">I", b, off + 8)[0]
        bitrates.append(kbps)
        pos += flen
    if not bitrates:
        raise ValueError("no MPEG frames in stream")
    version_key, layer, rate = sig
    spf = SAMPLES_PER_FRAME[version_key][layer]
    return {
        "version": version_key,
        "layer": layer,
        "samplerate": rate,
        "n_frames": len(bitrates),
        "bitrates_kbps": bitrates,
        "has_xing": has_xing,
        "declared_frames": declared,
        "duration_ms": len(bitrates) * spf * 1000 // rate,
    }


def build_mp3_frames(
    *,
    version: int = 1,
    layer: int = 3,
    bitrate_indices: list[int],
    samplerate_index: int = 0,
    mono: bool = False,
    xing_frames: int | None = None,
    id3_tag: bytes = b"",
) -> bytes:
    """Spec-shaped MPEG audio stream (fixture writer): one frame per
    bitrate index (1..14), consistent version/layer/samplerate, zero
    audio payload, optional Xing header (with the frames field) in the
    first frame, optional prepended ID3v2 tag."""
    if version not in (1, 2, 25):
        raise ValueError("version must be 1, 2, or 25")
    if layer not in (1, 2, 3):
        raise ValueError("layer must be 1, 2, or 3")
    vbits = {1: 3, 2: 2, 25: 0}[version]
    lbits = 4 - layer
    rate = SAMPLE_RATES[version][samplerate_index]
    out = bytearray(id3_tag)
    for j, bidx in enumerate(bitrate_indices):
        if not 1 <= bidx <= 14:
            raise ValueError(f"bitrate index {bidx} out of range")
        kbps = BITRATE_KBPS[(1 if version == 1 else 2, layer)][bidx - 1]
        flen = _frame_len(version, layer, kbps, rate, 0)
        h = (0x7FF << 21) | (vbits << 19) | (lbits << 17) | (1 << 16)
        h |= (bidx << 12) | (samplerate_index << 10)
        h |= (3 if mono else 0) << 6
        frame = bytearray(struct.pack(">I", h)) + bytes(flen - 4)
        if j == 0 and xing_frames is not None:
            if layer != 3:
                raise ValueError("Xing headers are a Layer III feature")
            off = _xing_offset(version, mono)  # from frame start
            if off + 12 > flen:
                raise ValueError(
                    f"first frame too small ({flen}B) for a Xing header"
                )
            frame[off : off + 12] = (b"Xing"
                                     + struct.pack(">II", 1, xing_frames))
        out += frame
    return bytes(out)


# --- Spark kernels (mapInPandas, the codec plan shape) --------------------------------


def synthesize_mp3_frame_blobs(df):
    """Deterministic full-stream MP3 source: per ``doc_id`` an ID3v2
    tag (title 'Track {doc_id}') followed by 8 + doc_id % 5 genuine
    MPEG frames — MPEG1 Layer III @ 44.1 kHz for even doc_ids, MPEG2
    Layer III @ 22.05 kHz for odd; CBR at bitrate index
    (doc_id % 14) + 1 when doc_id % 3 != 0, otherwise VBR (frame 0 at
    index 14 carrying a Xing header that declares the frame count,
    frames j >= 1 at index ((doc_id + j) % 14) + 1) — closed forms
    queries/ext_multimodal.py:mp3_frames_report recomputes in SQL."""
    import pandas as pd

    from ..sources.lake import widen
    from .id3 import build_id3v2

    def kernel(batches):
        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                nf = 8 + did % 5
                if did % 3 == 0:
                    idxs = [14] + [((did + j) % 14) + 1
                                   for j in range(1, nf)]
                    xing = nf
                else:
                    idxs = [(did % 14) + 1] * nf
                    xing = None
                out["doc_id"].append(did)
                out["blob"].append(build_mp3_frames(
                    version=1 if did % 2 == 0 else 2,
                    bitrate_indices=idxs,
                    xing_frames=xing,
                    id3_tag=build_id3v2(version=3, title=f"Track {did}"),
                ))
            yield pd.DataFrame(out)

    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


MP3_FRAMES_SCHEMA = (
    "doc_id long, version int, samplerate int, n_frames int, "
    "min_kbps int, max_kbps int, n_distinct_kbps int, has_xing boolean, "
    "declared_frames int, duration_ms long"
)


def mp3_frames_features(df):
    """Full frame walk -> one triage row per file: MPEG version, sample
    rate, walked frame count, bitrate histogram summary (min / max /
    distinct), Xing VBR detection with the declared frame count, and
    the exact-integer duration estimate."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "version", "samplerate", "n_frames", "min_kbps",
                "max_kbps", "n_distinct_kbps", "has_xing",
                "declared_frames", "duration_ms")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                r = parse_mp3_frames(bytes(blob))
                out["doc_id"].append(doc_id)
                out["version"].append(r["version"])
                out["samplerate"].append(r["samplerate"])
                out["n_frames"].append(r["n_frames"])
                out["min_kbps"].append(min(r["bitrates_kbps"]))
                out["max_kbps"].append(max(r["bitrates_kbps"]))
                out["n_distinct_kbps"].append(len(set(r["bitrates_kbps"])))
                out["has_xing"].append(r["has_xing"])
                out["declared_frames"].append(
                    -1 if r["declared_frames"] is None
                    else r["declared_frames"]
                )
                out["duration_ms"].append(r["duration_ms"])
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(kernel, MP3_FRAMES_SCHEMA)
