"""Ogg container page walk (RFC 3533, public) — the audio-corpus
sibling of the ISO-BMFF probe (operators/mp4.py): real podcast/speech
corpora arrive as Ogg/Opus and Ogg/Vorbis, and triaging them needs the
page structure, not the audio decode.

Page layout (RFC 3533 section 6):

    'OggS' (4) | version 0 (1) | header_type (1: 0x01 continued-packet,
    0x02 BOS, 0x04 EOS) | granule_position (8 LE signed) |
    bitstream_serial (4 LE) | page_sequence (4 LE) | crc_checksum (4 LE)
    | n_segments (1) | segment_table (n lacing values) | segment data

Packet reassembly (RFC 3533 section 5): a packet is the concatenation
of consecutive segments; a lacing value of 255 means "continues in the
next segment", any value < 255 terminates the packet (a packet whose
length is a multiple of 255 ends with an explicit 0 lacing value). A
packet crossing a page boundary ends a page with lacing 255 and the
next page sets the continued flag.

CRC (RFC 3533 section 6, and the errata'd reference implementation in
libogg): polynomial 0x04C11DB7, initial value 0, NON-reflected input
and output, NO final XOR, computed over the whole page with the CRC
field zeroed. This is the CRC-32/CKSUM (POSIX ``cksum``) algorithm
minus POSIX's trailing length bytes and final complement — the
published CKSUM check vector crc("123456789") = 0x765E7680 therefore
pins this table as 0x765E7680 ^ 0xFFFFFFFF = 0x89A1897F, and the
published CRC-32/MPEG-2 check 0x0376E6E7 pins the same table under
init 0xFFFFFFFF (tests/test_multimodal.py, same discipline as
tfrecord.py's masked-CRC32C vectors).

Codec identification (public specs):
- Vorbis I spec section 4.2: header packets '\\x01vorbis' (id:
  version u32=0, channels u8, sample rate u32 LE, bitrates 3xu32,
  blocksizes u8, framing u8), '\\x03vorbis' (comment: vendor +
  user-comment list, Vorbis-comment layout), '\\x05vorbis' (setup).
  Granule position = PCM sample count.
- RFC 7845 (Ogg/Opus) sections 5.1-5.2: BOS packet 'OpusHead'
  (version u8, channels u8, pre-skip u16 LE, input sample rate u32 LE,
  gain s16, mapping family u8), then 'OpusTags' (Vorbis-comment
  layout). Granule position counts 48 kHz samples and INCLUDES
  pre-skip, so duration = (granule - preskip) / 48000.

The companion writer ``build_ogg`` emits spec-shaped streams used for
oracle fixtures (queries/ext_multimodal.py:ogg_pages_report); audio
decode (Vorbis MDCT / Opus SILK+CELT) is a declared boundary.

Reference parity note: the reference repo has no audio layer (SURVEY.md
section 4); this module belongs to the multimodal training-data pillar.
"""

from __future__ import annotations

import struct

__all__ = ["build_ogg", "ogg_crc", "parse_ogg"]

_POLY = 0x04C11DB7

_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ _POLY if _r & 0x80000000 else _r << 1) & 0xFFFFFFFF
    _CRC_TABLE.append(_r)


def _crc_update(crc: int, data: bytes) -> int:
    for byte in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) & 0xFF) ^ byte]
    return crc


def ogg_crc(data: bytes) -> int:
    """RFC 3533 page CRC: poly 0x04C11DB7, init 0, non-reflected, no
    final XOR."""
    return _crc_update(0, data)


_MAX_COMMENTS = 4096  # bound comment lists (corrupt counts fail loud, not OOM)


def _parse_vorbis_comment(pkt: bytes, pos: int, what: str) -> tuple[str, list[str]]:
    """Vorbis-comment layout shared by Vorbis '\\x03vorbis' and
    'OpusTags': vendor_len u32 LE + vendor + count u32 LE +
    count x (len u32 LE + utf-8 payload). Returns (vendor, comments)."""
    if pos + 4 > len(pkt):
        raise ValueError(f"truncated {what} header (vendor length)")
    (vlen,) = struct.unpack_from("<I", pkt, pos)
    pos += 4
    if pos + vlen > len(pkt):
        raise ValueError(f"truncated {what} header (vendor string)")
    vendor = pkt[pos : pos + vlen].decode("utf-8")
    pos += vlen
    if pos + 4 > len(pkt):
        raise ValueError(f"truncated {what} header (comment count)")
    (n,) = struct.unpack_from("<I", pkt, pos)
    pos += 4
    if n > _MAX_COMMENTS:
        raise ValueError(f"{what} header declares {n} comments")
    comments = []
    for _ in range(n):
        if pos + 4 > len(pkt):
            raise ValueError(f"truncated {what} header (comment length)")
        (clen,) = struct.unpack_from("<I", pkt, pos)
        pos += 4
        if pos + clen > len(pkt):
            raise ValueError(f"truncated {what} header (comment payload)")
        comments.append(pkt[pos : pos + clen].decode("utf-8"))
        pos += clen
    return vendor, comments


def parse_ogg(b: bytes) -> dict:
    """Full single-stream Ogg page walk -> the triage record:

      {codec ('vorbis'|'opus'), channels, sample_rate, n_pages,
       n_packets, vendor, comments, duration_ms, payload_bytes,
       serial, has_eos, preskip (opus, else 0)}

    Every page is validated: capture pattern, version 0, CRC recomputed
    over the page with the checksum field zeroed, one logical bitstream
    (constant serial), page sequence numbers dense from 0, BOS exactly
    on page 0, continued-packet flags consistent with the lacing state.
    Truncated pages, CRC mismatches, multiplexed streams, and unknown
    codecs all raise ValueError. duration_ms is exact integer math on
    the final granule position (Vorbis: samples at the id-header rate;
    Opus: 48 kHz samples minus pre-skip per RFC 7845 section 4)."""
    packets: list[bytes] = []
    partial: list[bytes] = []  # segments of the open packet (join on close)
    continued_open = False
    n_pages = 0
    serial = None
    last_granule = 0
    has_eos = False
    pos = 0
    n = len(b)
    while pos < n:
        if b[pos : pos + 4] != b"OggS":
            raise ValueError(f"lost Ogg capture pattern at offset {pos}")
        if pos + 27 > n:
            raise ValueError(f"truncated page header at offset {pos}")
        version = b[pos + 4]
        if version != 0:
            raise ValueError(f"unsupported Ogg version {version}")
        flags = b[pos + 5]
        (granule,) = struct.unpack_from("<q", b, pos + 6)
        # RFC 3533 gives -1 one meaning (no packet finishes on this page);
        # any other negative granule is corrupt and would otherwise flow
        # into a negative duration_ms below — fail loud instead
        if granule < -1:
            raise ValueError(
                f"invalid granule position {granule} at offset {pos}"
            )
        (pserial, pseq, crc) = struct.unpack_from("<III", b, pos + 14)
        nseg = b[pos + 26]
        body_start = pos + 27 + nseg
        if body_start > n:
            raise ValueError(f"truncated segment table at offset {pos}")
        lacing = b[pos + 27 : body_start]
        body_len = sum(lacing)
        page_end = body_start + body_len
        if page_end > n:
            raise ValueError(f"page at offset {pos} overruns the file")
        page = bytearray(b[pos:page_end])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc:
            raise ValueError(f"page CRC mismatch at offset {pos}")
        if serial is None:
            serial = pserial
            if not flags & 0x02:
                raise ValueError("first page is not BOS")
            if pseq != 0:
                raise ValueError("first page sequence is not 0")
        else:
            if pserial != serial:
                raise ValueError(
                    "multiplexed Ogg (second serial "
                    f"0x{pserial:08x}) not supported"
                )
            if flags & 0x02:
                raise ValueError(f"BOS flag on non-first page {pseq}")
            if pseq != n_pages:
                raise ValueError(
                    f"page sequence gap: expected {n_pages}, got {pseq}"
                )
        if bool(flags & 0x01) != continued_open:
            raise ValueError(
                f"continued-packet flag inconsistent on page {pseq}"
            )
        seg_pos = body_start
        for lace in lacing:
            # list-accumulate + join on close: O(packet) total, not the
            # O(n^2) of repeated bytes concatenation (real Opus files
            # carry 100 KB-1 MB cover-art comment packets laced into
            # thousands of 255-byte segments)
            partial.append(b[seg_pos : seg_pos + lace])
            seg_pos += lace
            if lace < 255:
                packets.append(b"".join(partial))
                partial = []
        if lacing:
            # a NIL page (zero segments, RFC 3533 allows them) carries
            # no lacing and must NOT clear an open packet's state
            continued_open = lacing[-1] == 255
        if granule != -1:
            last_granule = granule
        if flags & 0x04:
            has_eos = True
            if page_end != n:
                raise ValueError("data after the EOS page")
        n_pages += 1
        pos = page_end
    if continued_open or partial:
        raise ValueError("stream ends mid-packet")
    if not packets:
        raise ValueError("no packets in stream")

    first = packets[0]
    if first.startswith(b"\x01vorbis"):
        if len(first) < 30:
            raise ValueError("truncated Vorbis identification header")
        (vver,) = struct.unpack_from("<I", first, 7)
        if vver != 0:
            raise ValueError(f"unsupported Vorbis version {vver}")
        channels = first[11]
        (rate,) = struct.unpack_from("<I", first, 12)
        if channels == 0 or rate == 0:
            raise ValueError("Vorbis id header with zero channels/rate")
        if len(packets) < 3:
            raise ValueError("Vorbis stream missing header packets")
        if not packets[1].startswith(b"\x03vorbis"):
            raise ValueError("second Vorbis packet is not the comment header")
        if not packets[2].startswith(b"\x05vorbis"):
            raise ValueError("third Vorbis packet is not the setup header")
        vendor, comments = _parse_vorbis_comment(packets[1], 7, "Vorbis comment")
        codec, preskip, n_headers = "vorbis", 0, 3
        duration_ms = last_granule * 1000 // rate
    elif first.startswith(b"OpusHead"):
        if len(first) < 19:
            raise ValueError("truncated OpusHead")
        opver = first[8]
        if opver >> 4 != 0:  # RFC 7845 5.1: major version must be 0
            raise ValueError(f"unsupported Opus version {opver}")
        channels = first[9]
        (preskip,) = struct.unpack_from("<H", first, 10)
        (rate,) = struct.unpack_from("<I", first, 12)
        if channels == 0:
            raise ValueError("OpusHead with zero channels")
        if len(packets) < 2 or not packets[1].startswith(b"OpusTags"):
            raise ValueError("second Opus packet is not OpusTags")
        vendor, comments = _parse_vorbis_comment(packets[1], 8, "OpusTags")
        codec, n_headers = "opus", 2
        # granule counts 48 kHz samples and includes pre-skip (RFC 7845
        # section 4); clamp at 0 for header-only streams
        duration_ms = max(last_granule - preskip, 0) * 1000 // 48000
    else:
        raise ValueError(
            f"unknown codec (first packet starts {bytes(first[:8])!r})"
        )
    audio = packets[n_headers:]
    return {
        "codec": codec,
        "channels": channels,
        "sample_rate": rate,
        "n_pages": n_pages,
        "n_packets": len(packets),
        "vendor": vendor,
        "comments": comments,
        "duration_ms": duration_ms,
        "payload_bytes": sum(len(p) for p in audio),
        "serial": serial,
        "has_eos": has_eos,
        "preskip": preskip,
    }


def _lacing(length: int) -> bytes:
    """Lacing values for a packet that TERMINATES within a page: 255s
    plus the final short value (an explicit 0 when the length is a
    multiple of 255)."""
    return b"\xff" * (length // 255) + bytes([length % 255])


def _page(
    serial: int, seq: int, granule: int, flags: int, lacing: bytes, body: bytes
) -> bytes:
    if len(lacing) > 255:
        raise ValueError(f"page needs {len(lacing)} segments (max 255)")
    head = (
        b"OggS\x00"
        + bytes([flags])
        + struct.pack("<q", granule)
        + struct.pack("<II", serial, seq)
        + b"\x00\x00\x00\x00"
        + bytes([len(lacing)])
        + lacing
    )
    page = bytearray(head + body)
    struct.pack_into("<I", page, 22, ogg_crc(bytes(page)))
    return bytes(page)


def build_ogg(
    *,
    codec: str,
    channels: int,
    sample_rate: int,
    audio_packets: list[bytes],
    samples_per_packet: int,
    comments: list[str],
    vendor: str = "graft-ogg 1.0",
    serial: int = 0x6F676721,
    packets_per_page: int = 3,
    span_first: bool = False,
    preskip: int = 312,
) -> bytes:
    """Spec-shaped single-stream Ogg file (fixture writer): a BOS page
    with the identification header, a header page with the comment
    header (plus, for Vorbis, a minimal setup header), then the audio
    packets at ``packets_per_page`` per page, the last page flagged
    EOS. A packet group whose lacing exceeds 255 values spans onward
    automatically (terminal-255 pages + continued flags — packets of
    any size lay out per RFC 3533). With ``span_first`` the first
    audio packet instead spans TWO pages explicitly (terminal 255
    lacing + continued flag on the next page, one packet per page
    thereafter) — the deterministic cross-page layout the oracle's
    page-count closed form covers.
    Granule positions advance ``samples_per_packet`` per audio packet
    (for Opus this is 48 kHz samples, and ``preskip`` is added per
    RFC 7845 section 4)."""
    if codec == "vorbis":
        ident = (
            b"\x01vorbis"
            + struct.pack("<IB", 0, channels)
            + struct.pack("<IiiiB", sample_rate, 0, 0, 0, 0xB8)
            + b"\x01"
        )
        tags_magic, n_headers = b"\x03vorbis", 3
        base_granule = 0
    elif codec == "opus":
        ident = b"OpusHead" + struct.pack(
            "<BBHIhB", 1, channels, preskip, sample_rate, 0, 0
        )
        tags_magic, n_headers = b"OpusTags", 2
        base_granule = preskip
    else:
        raise ValueError(f"codec must be 'vorbis' or 'opus', got {codec!r}")
    comment_pkt = tags_magic + struct.pack("<I", len(vendor)) + vendor.encode()
    comment_pkt += struct.pack("<I", len(comments))
    for c in comments:
        cb = c.encode()
        comment_pkt += struct.pack("<I", len(cb)) + cb

    out = bytearray()
    out += _page(serial, 0, 0, 0x02, _lacing(len(ident)), ident)
    hdr2 = [comment_pkt]
    if n_headers == 3:
        hdr2.append(b"\x05vorbis" + b"\x00" * 8)  # minimal setup stand-in
    out += _page(
        serial, 1, 0, 0,
        b"".join(_lacing(len(p)) for p in hdr2), b"".join(hdr2),
    )
    seq = 2
    n_audio = len(audio_packets)
    if span_first:
        if not audio_packets:
            raise ValueError("span_first needs at least one audio packet")
        first = audio_packets[0]
        # the spanning page carries ONLY non-terminating segments (every
        # lacing value 255), so the cut must be a positive multiple of
        # 255 strictly inside the packet
        cut = max(255, (len(first) // 2) // 255 * 255)
        if len(first) <= cut:
            raise ValueError("span_first needs a first packet of >= 256 bytes")
        head_part, tail_part = first[:cut], first[cut:]
        out += _page(serial, seq, -1, 0, b"\xff" * (cut // 255), head_part)
        seq += 1
        granule = base_granule + samples_per_packet
        flags = 0x01 | (0x04 if n_audio == 1 else 0)
        out += _page(serial, seq, granule, flags, _lacing(len(tail_part)),
                     tail_part)
        seq += 1
        rest, done = audio_packets[1:], 1
        per_page = 1
    else:
        rest, done = audio_packets, 0
        per_page = packets_per_page
    cont_flag = 0
    for i in range(0, len(rest), per_page):
        group = rest[i : i + per_page]
        # general RFC 3533 pagination: the group's lacing values chunk
        # into pages of <= 255 segments; a group overflowing one page
        # spans onward (terminal-255 pages, continued flags), so
        # packets of ANY size — e.g. a 300 KB cover-art comment — lay
        # out correctly. Each page's granule is the cumulative sample
        # position of the packets COMPLETED by that page, or -1 when
        # none completes on it (the spec's nothing-finishes marker).
        laces: list[int] = []
        for p in group:
            laces.extend([255] * (len(p) // 255))
            laces.append(len(p) % 255)
        body = b"".join(group)
        chunks = [laces[j : j + 255] for j in range(0, len(laces), 255)]
        completed = done
        done += len(group)
        boff = 0
        for ci, ch in enumerate(chunks):
            blen = sum(ch)
            ncomplete = sum(1 for v in ch if v < 255)
            completed += ncomplete
            granule = (
                base_granule + samples_per_packet * completed
                if ncomplete else -1
            )
            flags = cont_flag
            if done == n_audio and ci == len(chunks) - 1:
                flags |= 0x04
            out += _page(serial, seq, granule, flags, bytes(ch),
                         body[boff : boff + blen])
            seq += 1
            boff += blen
            cont_flag = 0x01 if ch[-1] == 255 else 0
    return bytes(out)


# --- Spark kernels (mapInPandas, the codec plan shape) --------------------------------


def synthesize_ogg_blobs(df):
    """Deterministic Ogg source: per ``doc_id`` a single-stream file —
    Vorbis at rate [8000, 16000, 22050, 44100, 48000][doc_id % 5] for
    even doc_ids, Opus (48 kHz granules, pre-skip 312) for odd;
    1 + doc_id % 2 channels; 6 + doc_id % 5 audio packets where packet
    j has 260 + ((doc_id * 13 + j * 37) % 360) bytes (always > 255, so
    multi-segment lacing is always exercised) of bytes
    (doc_id + j + k) % 256, each worth 320 (Vorbis) / 960 (Opus)
    samples; doc_id % 4 user comments 'k{i}=v{doc_id}'; page layout
    cycling by doc_id % 3 — 3 packets/page, 2 packets/page, or one
    packet SPANNING two pages then one per page — closed forms
    queries/ext_multimodal.py:ogg_pages_report recomputes in SQL."""
    import pandas as pd

    from ..sources.lake import widen

    def kernel(batches):
        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                n_pkts = 6 + did % 5
                pkts = [
                    bytes(
                        (did + j + k) % 256
                        for k in range(260 + (did * 13 + j * 37) % 360)
                    )
                    for j in range(n_pkts)
                ]
                layout = did % 3
                out["doc_id"].append(did)
                out["blob"].append(build_ogg(
                    codec="vorbis" if did % 2 == 0 else "opus",
                    channels=1 + did % 2,
                    sample_rate=[8000, 16000, 22050, 44100, 48000][did % 5]
                    if did % 2 == 0 else 48000,
                    audio_packets=pkts,
                    samples_per_packet=320 if did % 2 == 0 else 960,
                    comments=[f"k{i}=v{did}" for i in range(did % 4)],
                    packets_per_page=3 - layout,
                    span_first=(layout == 2),
                ))
            yield pd.DataFrame(out)

    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


OGG_PAGES_SCHEMA = (
    "doc_id long, codec string, channels int, sample_rate int, "
    "n_pages int, n_packets int, n_comments int, vendor_chars int, "
    "payload_bytes long, duration_ms long, has_eos boolean"
)


def ogg_pages_features(df):
    """Full page walk -> one triage row per file: codec, channels,
    id-header sample rate, validated page and reassembled packet
    counts, comment count, vendor length, audio payload bytes, and the
    exact-integer granule-position duration."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "codec", "channels", "sample_rate", "n_pages",
                "n_packets", "n_comments", "vendor_chars",
                "payload_bytes", "duration_ms", "has_eos")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                r = parse_ogg(bytes(blob))
                out["doc_id"].append(doc_id)
                out["codec"].append(r["codec"])
                out["channels"].append(r["channels"])
                out["sample_rate"].append(r["sample_rate"])
                out["n_pages"].append(r["n_pages"])
                out["n_packets"].append(r["n_packets"])
                out["n_comments"].append(len(r["comments"]))
                out["vendor_chars"].append(len(r["vendor"]))
                out["payload_bytes"].append(r["payload_bytes"])
                out["duration_ms"].append(r["duration_ms"])
                out["has_eos"].append(r["has_eos"])
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(kernel, OGG_PAGES_SCHEMA)
