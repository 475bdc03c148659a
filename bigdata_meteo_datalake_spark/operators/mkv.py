"""Matroska/WebM container probe (EBML, RFC 8794 + the public Matroska
element registry) — the web-video container next to ISO-BMFF
(operators/mp4.py) and AVI (operators/avi.py): WebM is what WARC piles
actually contain, and corpus triage needs codec ids, dimensions,
duration, and cluster structure WITHOUT frame decode (H.264/VP9/AV1
decode stays the repo's declared boundary, SURVEY.md section 6).

EBML primitives (RFC 8794):
- Variable-size integers: the number of leading zero bits before the
  first 1 bit in the first byte gives the total width (1..8 bytes).
  Element IDs keep their marker bit (0x1A45DFA3 is a 4-byte ID compared
  as written); element SIZES strip it, and an all-ones size payload
  means "unknown size" (streamed/unfinalized files — RFC 9559 permits
  it on Segment, which then extends to end of file, and on Cluster,
  which is bounded by the first non-Cluster-child id; rejected
  everywhere else).
- Unsigned integers are 0..8 big-endian bytes (0 bytes = 0); floats are
  0, 4, or 8 big-endian bytes; strings are raw UTF-8.
- Unknown element IDs are SKIPPED by size — EBML is explicitly
  extensible, so skipping is spec behavior, not silent failure; a size
  that overruns its parent always raises.

Elements walked (Matroska registry ids):
  EBML 0x1A45DFA3 { DocType 0x4282, DocTypeVersion 0x4287 }
  Segment 0x18538067 {
    Info 0x1549A966 { TimestampScale 0x2AD7B1 (default 1e6 ns),
                      Duration 0x4489 (float, in scale units),
                      WritingApp 0x5741 }
    Tracks 0x1654AE6B { TrackEntry 0xAE {
        TrackNumber 0xD7, TrackType 0x83 (1 video / 2 audio),
        CodecID 0x86,
        Video 0xE0 { PixelWidth 0xB0, PixelHeight 0xBA },
        Audio 0xE1 { SamplingFrequency 0xB5 (float), Channels 0x9F } } }
    Cluster 0x1F43B675 { Timestamp 0xE7, SimpleBlock 0xA3 (opaque) } }

The companion writer ``build_mkv`` emits spec-shaped files (known-size,
unknown-size-Segment, and unknown-size-Cluster layouts) used for
oracle fixtures (queries/ext_multimodal.py:mkv_probe_report).

Reference parity note: the reference repo has no video layer (SURVEY.md
section 4); this module belongs to the multimodal training-data pillar.
"""

from __future__ import annotations

import struct

__all__ = ["build_mkv", "parse_mkv"]

_EBML = 0x1A45DFA3
_DOCTYPE = 0x4282
_DOCTYPE_VERSION = 0x4287
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TS_SCALE = 0x2AD7B1
_DURATION = 0x4489
_WRITING_APP = 0x5741
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_WIDTH = 0xB0
_PIXEL_HEIGHT = 0xBA
_AUDIO = 0xE1
_SAMPLING_FREQ = 0xB5
_CHANNELS = 0x9F
_CLUSTER = 0x1F43B675
_CLUSTER_TS = 0xE7
_SIMPLE_BLOCK = 0xA3

_UNKNOWN = -1  # sentinel for an all-ones (unknown) size


def _read_vint(b: bytes, pos: int, *, keep_marker: bool) -> tuple[int, int]:
    """One EBML variable-size integer at ``pos`` -> (value, new_pos).
    With ``keep_marker`` the marker bit stays in the value (element
    IDs); without it the marker is stripped (sizes), and an all-ones
    payload returns ``_UNKNOWN``."""
    if pos >= len(b):
        raise ValueError(f"truncated EBML varint at offset {pos}")
    first = b[pos]
    if first == 0:
        raise ValueError(f"invalid EBML varint (>8 bytes) at offset {pos}")
    width = 1
    mask = 0x80
    while not first & mask:
        width += 1
        mask >>= 1
    if pos + width > len(b):
        raise ValueError(f"truncated EBML varint at offset {pos}")
    if keep_marker:
        val = int.from_bytes(b[pos : pos + width], "big")
    else:
        val = first & (mask - 1)
        for i in range(1, width):
            val = (val << 8) | b[pos + i]
        if val == (1 << (7 * width)) - 1:
            return _UNKNOWN, pos + width
    return val, pos + width


def _read_uint(payload: bytes) -> int:
    if len(payload) > 8:
        raise ValueError(f"EBML uint wider than 8 bytes ({len(payload)})")
    return int.from_bytes(payload, "big")


def _read_float(payload: bytes) -> float:
    if len(payload) == 0:
        return 0.0
    if len(payload) == 4:
        return struct.unpack(">f", payload)[0]
    if len(payload) == 8:
        return struct.unpack(">d", payload)[0]
    raise ValueError(f"EBML float must be 0/4/8 bytes, got {len(payload)}")


def _walk(b: bytes, pos: int, end: int):
    """Yield (element_id, payload_start, payload_end) for the children
    of [pos, end); validates every child size against the parent
    boundary. Unknown-size children are rejected here — only Segment
    and Cluster may be unknown-size, and both are handled by their
    callers (:func:`parse_mkv` and :func:`_walk_segment`)."""
    while pos < end:
        eid, pos = _read_vint(b, pos, keep_marker=True)
        size, pos = _read_vint(b, pos, keep_marker=False)
        if size == _UNKNOWN:
            raise ValueError(
                f"unknown-size element 0x{eid:x} (only Segment and "
                "Cluster may be unknown-size)"
            )
        if pos + size > end:
            raise ValueError(
                f"element 0x{eid:x} at offset {pos} overruns its parent"
            )
        yield eid, pos, pos + size
        pos = pos + size


#: ids legal INSIDE a Cluster (RFC 9559 section 8.1.4) — the stop set
#: that bounds an unknown-size Cluster: the first id NOT in this set
#: ends it (the RFC's "first non-descendant element" rule). The EBML
#: GLOBAL elements Void and CRC-32 are descendants of every master
#: element (RFC 8794 section 11.3), so they must not end the cluster.
_CLUSTER_CHILDREN = frozenset({
    _CLUSTER_TS, _SIMPLE_BLOCK,
    0x5854,  # SilentTracks
    0xA7,    # Position
    0xAB,    # PrevSize
    0xA0,    # BlockGroup
    0xAF,    # EncryptedBlock
    0xEC,    # Void (EBML global)
    0xBF,    # CRC-32 (EBML global)
})


def _walk_segment(b: bytes, pos: int, end: int):
    """The Segment-level child walk: like :func:`_walk`, but RFC 9559
    also permits UNKNOWN-SIZE on Cluster (streamed/unfinalized WebM —
    MediaRecorder output and live remuxes write exactly this). An
    unknown-size Cluster extends to the first id that is not a legal
    Cluster child (typically the next Cluster, or segment end)."""
    while pos < end:
        eid, pos = _read_vint(b, pos, keep_marker=True)
        size, pos = _read_vint(b, pos, keep_marker=False)
        if size == _UNKNOWN:
            if eid != _CLUSTER:
                raise ValueError(
                    f"unknown-size element 0x{eid:x} (only Segment and "
                    "Cluster may be unknown-size)"
                )
            e = pos
            while e < end:
                nid, q = _read_vint(b, e, keep_marker=True)
                if nid not in _CLUSTER_CHILDREN:
                    break
                nsize, q = _read_vint(b, q, keep_marker=False)
                if nsize == _UNKNOWN:
                    raise ValueError(
                        f"unknown-size element 0x{nid:x} inside a Cluster"
                    )
                if q + nsize > end:
                    raise ValueError(
                        f"element 0x{nid:x} at offset {q} overruns its parent"
                    )
                e = q + nsize
            yield eid, pos, e
            pos = e
            continue
        if pos + size > end:
            raise ValueError(
                f"element 0x{eid:x} at offset {pos} overruns its parent"
            )
        yield eid, pos, pos + size
        pos = pos + size


def parse_mkv(b: bytes) -> dict:
    """EBML element walk -> the container probe record:

      {doc_type, doc_type_version, timestamp_scale, duration_ms,
       writing_app, n_tracks, video_codec, width, height, audio_codec,
       channels, sampling_hz, n_clusters, last_cluster_ms, n_blocks}

    duration_ms is exact integer math when Duration (float, in
    TimestampScale units) is integral — the common muxer output — and
    rounds half-up to whole ms for legal fractional values; negative,
    NaN, or infinite durations raise. Files must lead with a complete
    EBML header declaring a matroska/webm DocType; Segment may be
    unknown-size (extends to EOF), and so may Clusters (bounded by the
    first non-Cluster-child id, RFC 9559). Missing video or audio tracks
    report empty codec / zero dimensions (a real corpus has
    video-only and audio-only files); every structural violation
    raises ValueError."""
    eid, pos = _read_vint(b, 0, keep_marker=True)
    if eid != _EBML:
        raise ValueError("not an EBML file (no 0x1A45DFA3 header)")
    size, pos = _read_vint(b, pos, keep_marker=False)
    if size == _UNKNOWN or pos + size > len(b):
        raise ValueError("truncated or unknown-size EBML header")
    doc_type = None  # RFC 8794 section 11.2.6 makes DocType mandatory
    doc_type_version = 1
    for cid, s, e in _walk(b, pos, pos + size):
        if cid == _DOCTYPE:
            doc_type = b[s:e].decode("utf-8")
        elif cid == _DOCTYPE_VERSION:
            doc_type_version = _read_uint(b[s:e])
    if doc_type is None:
        raise ValueError("EBML header missing the mandatory DocType element")
    if doc_type not in ("matroska", "webm"):
        raise ValueError(f"unsupported DocType {doc_type!r}")
    pos += size

    eid, pos = _read_vint(b, pos, keep_marker=True)
    if eid != _SEGMENT:
        raise ValueError(f"expected Segment after EBML header, got 0x{eid:x}")
    size, pos = _read_vint(b, pos, keep_marker=False)
    seg_end = len(b) if size == _UNKNOWN else pos + size
    if seg_end > len(b):
        raise ValueError("Segment overruns the file")
    if size != _UNKNOWN and seg_end != len(b):
        raise ValueError("data after the Segment")

    scale = 1_000_000  # spec default: 1 ms
    duration_units = None
    writing_app = ""
    tracks: list[dict] = []
    n_clusters = 0
    n_blocks = 0
    last_cluster_ts = None
    for cid, s, e in _walk_segment(b, pos, seg_end):
        if cid == _INFO:
            for iid, is_, ie in _walk(b, s, e):
                if iid == _TS_SCALE:
                    scale = _read_uint(b[is_:ie])
                    if scale == 0:
                        raise ValueError("TimestampScale of 0")
                elif iid == _DURATION:
                    duration_units = _read_float(b[is_:ie])
                elif iid == _WRITING_APP:
                    writing_app = b[is_:ie].decode("utf-8")
        elif cid == _TRACKS:
            for tid, ts, te in _walk(b, s, e):
                if tid != _TRACK_ENTRY:
                    continue
                t = {"type": None, "codec": "", "width": 0, "height": 0,
                     "channels": 0, "sampling": 0.0}
                for fid, fs, fe in _walk(b, ts, te):
                    if fid == _TRACK_TYPE:
                        t["type"] = _read_uint(b[fs:fe])
                    elif fid == _CODEC_ID:
                        t["codec"] = b[fs:fe].decode("utf-8")
                    elif fid == _VIDEO:
                        for vid, vs, ve in _walk(b, fs, fe):
                            if vid == _PIXEL_WIDTH:
                                t["width"] = _read_uint(b[vs:ve])
                            elif vid == _PIXEL_HEIGHT:
                                t["height"] = _read_uint(b[vs:ve])
                    elif fid == _AUDIO:
                        for aid, as_, ae in _walk(b, fs, fe):
                            if aid == _SAMPLING_FREQ:
                                t["sampling"] = _read_float(b[as_:ae])
                            elif aid == _CHANNELS:
                                t["channels"] = _read_uint(b[as_:ae])
                tracks.append(t)
        elif cid == _CLUSTER:
            n_clusters += 1
            for kid, ks, ke in _walk(b, s, e):
                if kid == _CLUSTER_TS:
                    last_cluster_ts = _read_uint(b[ks:ke])
                elif kid == _SIMPLE_BLOCK:
                    n_blocks += 1

    video = next((t for t in tracks if t["type"] == 1), None)
    audio = next((t for t in tracks if t["type"] == 2), None)
    import math

    if duration_units is None:
        duration_ms = 0
    elif not math.isfinite(duration_units) or duration_units < 0:
        raise ValueError(f"invalid Duration {duration_units!r}")
    elif duration_units == int(duration_units):
        # integral scale units (our fixtures, most muxers): exact int math
        duration_ms = int(duration_units) * scale // 1_000_000
    else:
        # fractional scale units are legal (Duration is typed float) —
        # real muxers write them; round-half-up to whole ms
        import math

        duration_ms = int(
            math.floor(duration_units * scale / 1_000_000 + 0.5)
        )
    sampling = audio["sampling"] if audio else 0.0
    if sampling != int(sampling):
        raise ValueError(f"non-integral SamplingFrequency {sampling!r}")
    return {
        "doc_type": doc_type,
        "doc_type_version": doc_type_version,
        "timestamp_scale": scale,
        "duration_ms": duration_ms,
        "writing_app": writing_app,
        "n_tracks": len(tracks),
        "video_codec": video["codec"] if video else "",
        "width": video["width"] if video else 0,
        "height": video["height"] if video else 0,
        "audio_codec": audio["codec"] if audio else "",
        "channels": audio["channels"] if audio else 0,
        "sampling_hz": int(sampling),
        "n_clusters": n_clusters,
        "last_cluster_ms": (0 if last_cluster_ts is None
                            else last_cluster_ts * scale // 1_000_000),
        "n_blocks": n_blocks,
    }


# --- writer ---------------------------------------------------------------------------


def _vint_size(n: int) -> bytes:
    """Encode a known size as the shortest EBML varint that is NOT the
    all-ones (unknown) pattern."""
    for width in range(1, 9):
        if n < (1 << (7 * width)) - 1:
            return ((1 << (7 * width)) | n).to_bytes(width, "big")
    raise ValueError(f"size {n} too large for an EBML varint")


def _uint_bytes(n: int) -> bytes:
    if n == 0:
        return b"\x00"
    return n.to_bytes((n.bit_length() + 7) // 8, "big")


def _el(eid: int, payload: bytes) -> bytes:
    return (
        eid.to_bytes((eid.bit_length() + 7) // 8, "big")
        + _vint_size(len(payload))
        + payload
    )


def build_mkv(
    *,
    doc_type: str = "webm",
    duration_ms: int,
    video_codec: str | None = "V_VP9",
    width: int = 640,
    height: int = 360,
    audio_codec: str | None = "A_OPUS",
    channels: int = 2,
    sampling_hz: int = 48000,
    writing_app: str = "graft-mkv 1.0",
    cluster_timestamps_ms: list[int] = (),
    blocks_per_cluster: int = 2,
    unknown_size_segment: bool = False,
    unknown_size_clusters: bool = False,
) -> bytes:
    """Spec-shaped Matroska/WebM file (fixture writer): EBML header,
    Segment (known-size, or the streamed unknown-size layout) with
    Info (TimestampScale 1e6 = ms units, integral Duration,
    WritingApp), a video and/or audio TrackEntry, and one Cluster per
    timestamp carrying ``blocks_per_cluster`` minimal SimpleBlocks
    (track varint + s16 relative timestamp + keyframe flag + 4 payload
    bytes)."""
    header = _el(_EBML, b"".join([
        _el(0x4286, _uint_bytes(1)),       # EBMLVersion
        _el(0x42F7, _uint_bytes(1)),       # EBMLReadVersion
        _el(0x42F2, _uint_bytes(4)),       # EBMLMaxIDLength
        _el(0x42F3, _uint_bytes(8)),       # EBMLMaxSizeLength
        _el(_DOCTYPE, doc_type.encode()),
        _el(_DOCTYPE_VERSION, _uint_bytes(4)),
        _el(0x4285, _uint_bytes(2)),       # DocTypeReadVersion
    ]))
    info = _el(_INFO, b"".join([
        _el(_TS_SCALE, _uint_bytes(1_000_000)),
        _el(_DURATION, struct.pack(">d", float(duration_ms))),
        _el(_WRITING_APP, writing_app.encode()),
    ]))
    entries = []
    track_no = 1
    if video_codec is not None:
        entries.append(_el(_TRACK_ENTRY, b"".join([
            _el(_TRACK_NUMBER, _uint_bytes(track_no)),
            _el(_TRACK_TYPE, _uint_bytes(1)),
            _el(_CODEC_ID, video_codec.encode()),
            _el(_VIDEO, _el(_PIXEL_WIDTH, _uint_bytes(width))
                + _el(_PIXEL_HEIGHT, _uint_bytes(height))),
        ])))
        track_no += 1
    if audio_codec is not None:
        entries.append(_el(_TRACK_ENTRY, b"".join([
            _el(_TRACK_NUMBER, _uint_bytes(track_no)),
            _el(_TRACK_TYPE, _uint_bytes(2)),
            _el(_CODEC_ID, audio_codec.encode()),
            _el(_AUDIO, _el(_SAMPLING_FREQ,
                            struct.pack(">f", float(sampling_hz)))
                + _el(_CHANNELS, _uint_bytes(channels))),
        ])))
    tracks = _el(_TRACKS, b"".join(entries))
    clusters = b""
    for i, ts in enumerate(cluster_timestamps_ms):
        blocks = b"".join(
            _el(_SIMPLE_BLOCK,
                b"\x81" + struct.pack(">h", j) + b"\x80"
                + bytes([(ts + i + j) % 256] * 4))
            for j in range(blocks_per_cluster)
        )
        payload = _el(_CLUSTER_TS, _uint_bytes(ts)) + blocks
        if unknown_size_clusters:
            # the streamed layout: each Cluster declares no size and is
            # bounded by the next non-child id (RFC 9559)
            clusters += _CLUSTER.to_bytes(4, "big") + b"\xff" + payload
        else:
            clusters += _el(_CLUSTER, payload)
    body = info + tracks + clusters
    sid = _SEGMENT.to_bytes(4, "big")
    if unknown_size_segment:
        return header + sid + b"\xff" + body  # 1-byte all-ones size
    return header + sid + _vint_size(len(body)) + body


# --- Spark kernels (mapInPandas, the codec plan shape) --------------------------------


def synthesize_mkv_blobs(df):
    """Deterministic Matroska/WebM source: per ``doc_id`` a container —
    DocType webm (even) / matroska (odd); duration
    1000 + (doc_id * 37) % 60000 ms; a video track
    (['V_VP8', 'V_VP9', 'V_AV1'][doc_id % 3],
    320 + 16 * (doc_id % 8) x 240 + 16 * (doc_id % 5)) except every
    seventh document which is audio-only; an audio track
    (A_OPUS even / A_VORBIS odd, 1 + doc_id % 2 channels, 48 kHz)
    except every fifth non-audio-only document which is video-only;
    1 + doc_id % 4 clusters at 40 ms spacing with 2 SimpleBlocks each;
    WritingApp 'writer-{doc_id}'; framing cycles by doc_id % 4 — 0:
    unknown-size Segment, 1: unknown-size Clusters (the MediaRecorder
    streamed layout), 2-3: fully sized — all under one oracle hash
    (the report is framing-invariant) — closed forms
    queries/ext_multimodal.py:mkv_probe_report recomputes in SQL."""
    import pandas as pd

    from ..sources.lake import widen

    def kernel(batches):
        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                audio_only = did % 7 == 0
                video_only = (not audio_only) and did % 5 == 0
                nclus = 1 + did % 4
                out["doc_id"].append(did)
                out["blob"].append(build_mkv(
                    doc_type="webm" if did % 2 == 0 else "matroska",
                    duration_ms=1000 + (did * 37) % 60000,
                    video_codec=None if audio_only
                    else ["V_VP8", "V_VP9", "V_AV1"][did % 3],
                    width=320 + 16 * (did % 8),
                    height=240 + 16 * (did % 5),
                    audio_codec=None if video_only
                    else ("A_OPUS" if did % 2 == 0 else "A_VORBIS"),
                    channels=1 + did % 2,
                    sampling_hz=48000,
                    writing_app=f"writer-{did}",
                    cluster_timestamps_ms=[40 * j for j in range(nclus)],
                    unknown_size_segment=(did % 4 == 0),
                    unknown_size_clusters=(did % 4 == 1),
                ))
            yield pd.DataFrame(out)

    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


MKV_PROBE_SCHEMA = (
    "doc_id long, doc_type string, duration_ms long, writing_app string, "
    "n_tracks int, video_codec string, width int, height int, "
    "audio_codec string, channels int, sampling_hz int, n_clusters int, "
    "last_cluster_ms long, n_blocks int"
)


def mkv_probe_features(df):
    """EBML walk -> one probe row per file: DocType, exact-integer
    duration, writing app, track layout (codec ids, dimensions, audio
    shape), and cluster structure."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "doc_type", "duration_ms", "writing_app",
                "n_tracks", "video_codec", "width", "height",
                "audio_codec", "channels", "sampling_hz", "n_clusters",
                "last_cluster_ms", "n_blocks")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                r = parse_mkv(bytes(blob))
                out["doc_id"].append(doc_id)
                for k in out:
                    if k != "doc_id":
                        out[k].append(r[k])
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(kernel, MKV_PROBE_SCHEMA)
