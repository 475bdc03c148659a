"""ID3v2 tag parsing — audio-metadata parity with EXIF and the MP4
probe: MP3 AUDIO decode stays the declared boundary (a perceptual codec
genuinely needs a library), but the METADATA every music corpus keys on
— title/artist/album/track in the ID3v2 tag that prefixes the file —
is a pure byte format (informal standard at id3.org), parsed here for
both v2.3 and v2.4 with all three text encodings. The same
metadata-real/decode-boundary split the ISO-BMFF probe uses
(operators/mp4.py).

Handled: the 10-byte header (syncsafe tag size), v2.3 frames (plain
big-endian sizes) and v2.4 frames (syncsafe sizes), text frames in
ISO-8859-1 / UTF-16-with-BOM / UTF-8, padding, and the MPEG frame sync
following the tag (validated, not decoded). A spec-shaped writer builds
fixtures (queries/ext_multimodal.py:mp3_metadata_report).
"""

from __future__ import annotations

import struct

__all__ = ["build_id3v2", "parse_id3v2"]

#: frame ids used here (public id3.org registry)
FRAME_TITLE = b"TIT2"
FRAME_ARTIST = b"TPE1"
FRAME_ALBUM = b"TALB"
FRAME_TRACK = b"TRCK"


def _syncsafe(n: int) -> bytes:
    if n >= 1 << 28:
        raise ValueError("tag too large for a syncsafe size")
    return bytes(
        [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
    )


def _unsyncsafe(b: bytes) -> int:
    if any(x & 0x80 for x in b):
        raise ValueError("non-syncsafe byte in a syncsafe size field")
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def _decode_text(payload: bytes) -> str:
    if not payload:
        return ""
    enc, body = payload[0], payload[1:]
    if enc == 0:
        s = body.decode("latin-1")
    elif enc == 1:
        s = body.decode("utf-16")  # BOM required by the spec
    elif enc == 2:
        s = body.decode("utf-16-be")
    elif enc == 3:
        s = body.decode("utf-8")
    else:
        raise ValueError(f"unknown ID3 text encoding {enc}")
    return s.split("\x00")[0]


def parse_id3v2(b: bytes) -> dict:
    """MP3-shaped blob -> {version, tag_bytes, title, artist, album,
    track, has_mpeg_sync}. Absent frames come back as ''; a missing tag
    raises (the fixture contract is tagged files; untagged corpora go
    straight to the declared decode boundary)."""
    if b[:3] != b"ID3":
        raise ValueError("no ID3v2 tag (missing ID3 magic)")
    if len(b) < 10:
        raise ValueError("truncated ID3 header")
    major, _rev = b[3], b[4]
    if major not in (3, 4):
        raise ValueError(f"ID3v2.{major} not supported (only 2.3/2.4)")
    flags = b[5]
    if flags & 0x40:
        raise ValueError("ID3 extended headers not supported")
    size = _unsyncsafe(b[6:10])
    if 10 + size > len(b):
        raise ValueError("truncated ID3 tag")
    out = {"version": major, "tag_bytes": 10 + size,
           "title": "", "artist": "", "album": "", "track": ""}
    pos = 10
    end = 10 + size
    keys = {FRAME_TITLE: "title", FRAME_ARTIST: "artist",
            FRAME_ALBUM: "album", FRAME_TRACK: "track"}
    while pos + 10 <= end:
        fid = b[pos : pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break  # padding
        if major == 4:
            fsize = _unsyncsafe(b[pos + 4 : pos + 8])
        else:
            (fsize,) = struct.unpack_from(">I", b, pos + 4)
        # Second flag byte = format flags (v2.3: compression/encryption/
        # grouping; v2.4: grouping/compression/encryption/unsync/DLI).
        # Any of them changes the payload layout — fail loud, don't
        # parse the transformed bytes as raw text.
        fmt_flags = b[pos + 9]
        if fmt_flags:
            raise NotImplementedError(
                f"ID3 frame {fid!r} has format flags 0x{fmt_flags:02x} "
                "(unsync/compression/encryption/grouping/data-length) — "
                "transformed frame payloads are not supported"
            )
        payload = b[pos + 10 : pos + 10 + fsize]
        if len(payload) != fsize:
            raise ValueError(f"truncated ID3 frame {fid!r}")
        if fid in keys:
            out[keys[fid]] = _decode_text(payload)
        pos += 10 + fsize
    # audio data follows the tag; an MPEG frame starts with 11 sync bits
    audio = b[end : end + 2]
    out["has_mpeg_sync"] = (
        len(audio) == 2 and audio[0] == 0xFF and (audio[1] & 0xE0) == 0xE0
    )
    return out


def build_id3v2(
    *,
    version: int = 3,
    title: str = "",
    artist: str = "",
    album: str = "",
    track: str = "",
    encoding: int = 3,
    padding: int = 0,
) -> bytes:
    """Spec-shaped ID3v2.3/2.4 tag (fixture writer). ``encoding``:
    0 latin-1, 1 utf-16 (BOM), 3 utf-8."""
    if version not in (3, 4):
        raise ValueError("version must be 3 or 4")
    if encoding not in (0, 1, 3):
        raise ValueError("encoding must be 0 (latin-1), 1 (utf-16), 3 (utf-8)")
    frames = b""
    for fid, text in ((FRAME_TITLE, title), (FRAME_ARTIST, artist),
                      (FRAME_ALBUM, album), (FRAME_TRACK, track)):
        if not text:
            continue
        if encoding == 0:
            body = text.encode("latin-1")
        elif encoding == 1:
            body = text.encode("utf-16")  # emits the BOM
        else:
            body = text.encode("utf-8")
        payload = bytes([encoding]) + body
        size = (_syncsafe(len(payload)) if version == 4
                else struct.pack(">I", len(payload)))
        frames += fid + size + b"\x00\x00" + payload
    frames += b"\x00" * padding
    return (b"ID3" + bytes([version, 0, 0]) + _syncsafe(len(frames))
            + frames)


# --- Spark kernels --------------------------------------------------------------------


def synthesize_mp3_blobs(df):
    """Deterministic MP3-shaped source: per doc_id an ID3v2 tag
    (v2.3 for even doc_ids, v2.4 for odd; text encoding cycling
    latin-1/utf-16/utf-8 by doc_id % 3; title 'Track {doc_id}', artist
    'Artist {doc_id % 7}', album 'Album {doc_id % 5}', track
    '{1 + doc_id % 12}/12'; doc_id % 32 padding bytes) followed by an
    MPEG frame-sync header and opaque audio bytes — the tagged-file
    shape whose METADATA parses while audio decode stays the declared
    boundary (queries/ext_multimodal.py:mp3_metadata_report)."""
    import pandas as pd

    from ..sources.lake import widen

    def kernel(batches):
        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                tag = build_id3v2(
                    version=3 if did % 2 == 0 else 4,
                    title=f"Track {did}",
                    artist=f"Artist {did % 7}",
                    album=f"Album {did % 5}",
                    track=f"{1 + did % 12}/12",
                    encoding=(0, 1, 3)[did % 3],
                    padding=did % 32,
                )
                out["doc_id"].append(did)
                out["blob"].append(
                    tag + b"\xff\xfb\x90\x00" + bytes(16 + did % 64)
                )
            yield pd.DataFrame(out)

    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


def mp3_metadata_features(df):
    """ID3 metadata probe -> (doc_id, version, title, artist, album,
    track, has_mpeg_sync) via mapInPandas — the metadata-real /
    decode-boundary split the MP4 probe uses."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            out = {"doc_id": [], "version": [], "title": [], "artist": [],
                   "album": [], "track": [], "has_mpeg_sync": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                m = parse_id3v2(bytes(blob))
                out["doc_id"].append(doc_id)
                out["version"].append(m["version"])
                out["title"].append(m["title"])
                out["artist"].append(m["artist"])
                out["album"].append(m["album"])
                out["track"].append(m["track"])
                out["has_mpeg_sync"].append(m["has_mpeg_sync"])
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(
        kernel,
        "doc_id long, version int, title string, artist string, "
        "album string, track string, has_mpeg_sync boolean",
    )
