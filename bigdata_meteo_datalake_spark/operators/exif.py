"""EXIF metadata for JPEG blobs — the image-pipeline staple this layer
was missing: camera images carry their true orientation in an APP1
segment (a complete TIFF structure: byte-order header + IFDs), and a
training pipeline must read it and AUTO-ROTATE pixels before any model
sees them, or a quarter of a phone-photo corpus trains sideways.

Pure stdlib: the APP1 payload after ``Exif\\0\\0`` is TIFF, so parsing
is a generic IFD walk (both byte orders, BYTE/ASCII/SHORT/LONG types,
inline vs offset values, the 0x8769 Exif sub-IFD pointer). The writer
builds spec-shaped APP1 segments for fixtures; all eight orientation
transforms are implemented and pinned in tests
(queries/ext_multimodal.py:multimodal_exif_report puts the parse +
orientation math under a DuckDB oracle hash).

Reference parity note: the reference repo has no codec/metadata layer
(SURVEY.md section 4); this belongs to the multimodal pillar.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "apply_exif_orientation",
    "attach_exif",
    "parse_exif",
]

#: IFD tags used here (public EXIF/TIFF 6.0 registry)
TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_EXIF_IFD = 0x8769
TAG_GPS_IFD = 0x8825
TAG_PIXEL_X = 0xA002
TAG_PIXEL_Y = 0xA003

#: GPS IFD tags (EXIF 2.3 Annex, public registry)
GPS_LAT_REF = 0x0001
GPS_LAT = 0x0002
GPS_LON_REF = 0x0003
GPS_LON = 0x0004

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
_TYPE_CODES = {1: "B", 3: "H", 4: "I"}


def _read_ifd_at(b: bytes, e: str, off: int) -> dict[int, object]:
    """IFD at ``off`` -> {tag: value} for BYTE/ASCII/SHORT/LONG entries
    (single integer, tuple of integers, or decoded ASCII string)."""
    if off + 2 > len(b):
        raise ValueError("truncated EXIF IFD")
    (n,) = struct.unpack_from(e + "H", b, off)
    out: dict[int, object] = {}
    for i in range(n):
        p = off + 2 + 12 * i
        if p + 12 > len(b):
            raise ValueError("truncated EXIF IFD entry")
        tag, ftype, count = struct.unpack_from(e + "HHI", b, p)
        if ftype not in _TYPE_SIZES:
            continue  # SRATIONAL/float etc.: not needed here, legal to skip
        size = _TYPE_SIZES[ftype] * count
        if size <= 4:
            vp = p + 8
        else:
            (vp,) = struct.unpack_from(e + "I", b, p + 8)
        if vp + size > len(b):
            raise ValueError("EXIF value outside the APP1 payload")
        if ftype == 2:
            out[tag] = b[vp : vp + count].split(b"\x00")[0].decode(
                "ascii", "replace"
            )
        elif ftype == 5:  # RATIONAL: (numerator, denominator) uint32 pairs
            # zero denominators are NOT rejected here: real camera
            # firmware writes 0/0 for unused rationals (ExposureBias,
            # GPSAltitude, ...) and the generic walk must stay tolerant
            # of tags it never consumes — validation belongs to the
            # consumer (the GPS dms() conversion below)
            flat = struct.unpack_from(e + "II" * count, b, vp)
            pairs = tuple(
                (flat[2 * i], flat[2 * i + 1]) for i in range(count)
            )
            out[tag] = pairs[0] if count == 1 else pairs
        else:
            vals = struct.unpack_from(e + _TYPE_CODES[ftype] * count, b, vp)
            out[tag] = vals[0] if count == 1 else vals
    return out


def parse_exif(jpeg: bytes) -> dict:
    """JPEG -> {orientation, make, model, pixel_x, pixel_y} from the
    APP1 Exif segment (orientation defaults to 1 and the strings to ''
    when absent — cameraless JPEGs are normal, a malformed APP1 is
    not)."""
    out = {"orientation": 1, "make": "", "model": "",
           "pixel_x": None, "pixel_y": None,
           "gps_lat": None, "gps_lon": None}
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = jpeg[pos + 1]
        pos += 2
        if marker in (0xD9, 0xDA):
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", jpeg, pos)
        if seglen < 2:
            raise ValueError("invalid JPEG segment length")
        if marker == 0xE1 and jpeg[pos + 2 : pos + 8] == b"Exif\x00\x00":
            tiff = jpeg[pos + 8 : pos + seglen]
            if len(tiff) < 8:
                # byte order + magic + IFD0 offset need 8 bytes; a
                # truncated segment must not leak struct.error
                raise ValueError("truncated EXIF TIFF header")
            if tiff[:2] == b"II":
                e = "<"
            elif tiff[:2] == b"MM":
                e = ">"
            else:
                raise ValueError("EXIF TIFF header has no byte order")
            (magic,) = struct.unpack_from(e + "H", tiff, 2)
            if magic != 42:
                raise ValueError("EXIF TIFF header magic != 42")
            (ifd0,) = struct.unpack_from(e + "I", tiff, 4)
            tags = _read_ifd_at(tiff, e, ifd0)
            orient = tags.get(TAG_ORIENTATION, 1)
            if not isinstance(orient, int):
                # a corrupt field TYPE re-types the value (e.g. to a
                # rational tuple) — that's a malformed tag, not an
                # internal error (mutation-fuzz finding)
                raise ValueError(
                    f"EXIF orientation has non-integer type "
                    f"{type(orient).__name__}"
                )
            out["orientation"] = orient
            if not 1 <= out["orientation"] <= 8:
                raise ValueError(
                    f"EXIF orientation {out['orientation']} outside 1..8"
                )
            for key, tag in (("make", TAG_MAKE), ("model", TAG_MODEL)):
                v = tags.get(tag, "") or ""
                if not isinstance(v, str):
                    raise ValueError(
                        f"EXIF {key} has non-string type "
                        f"{type(v).__name__}"
                    )
                out[key] = v
            sub = tags.get(TAG_EXIF_IFD)
            if sub is not None and not isinstance(sub, int):
                # a re-typed IFD POINTER is the same corruption class
                # as a re-typed value — dropping the sub-IFD silently
                # would be quiet data loss, not tolerance
                raise ValueError(
                    f"EXIF sub-IFD pointer has non-integer type "
                    f"{type(sub).__name__}"
                )
            if isinstance(sub, int):
                ex = _read_ifd_at(tiff, e, sub)
                for key, tag in (("pixel_x", TAG_PIXEL_X),
                                 ("pixel_y", TAG_PIXEL_Y)):
                    v = ex.get(tag)
                    if v is not None and not isinstance(v, int):
                        raise ValueError(
                            f"EXIF {key} has non-integer type "
                            f"{type(v).__name__}"
                        )
                    out[key] = v
            gps_off = tags.get(TAG_GPS_IFD)
            if gps_off is not None and not isinstance(gps_off, int):
                raise ValueError(
                    f"EXIF GPS-IFD pointer has non-integer type "
                    f"{type(gps_off).__name__}"
                )
            if isinstance(gps_off, int):
                gps = _read_ifd_at(tiff, e, gps_off)
                lat = gps.get(GPS_LAT)
                lon = gps.get(GPS_LON)
                if lat is not None and lon is not None:
                    for trip, name in ((lat, "latitude"),
                                       (lon, "longitude")):
                        # shape-validate before unpacking: a corrupt
                        # field type can deliver an int or a flat tuple
                        # here, and unpacking those leaks TypeError
                        if (not isinstance(trip, tuple)
                                or len(trip) != 3
                                or not all(isinstance(r, tuple)
                                           and len(r) == 2
                                           and all(isinstance(x, int)
                                                   for x in r)
                                           for r in trip)):
                            raise ValueError(
                                f"GPS {name} is not 3 rational pairs"
                            )
                    lat_ref = str(gps.get(GPS_LAT_REF, "N")).upper()
                    lon_ref = str(gps.get(GPS_LON_REF, "E")).upper()
                    if lat_ref not in ("N", "S") or lon_ref not in ("E", "W"):
                        raise ValueError(
                            f"bad GPS refs {lat_ref!r}/{lon_ref!r}"
                        )

                    def dms(trip):
                        (dn, dd), (mn, md), (sn, sd) = trip
                        if 0 in (dd, md, sd):
                            raise ValueError(
                                "GPS coordinate rational has a zero "
                                "denominator"
                            )
                        return dn / dd + (mn / md) / 60.0 + (sn / sd) / 3600.0

                    out["gps_lat"] = dms(lat) * (1.0 if lat_ref == "N"
                                                 else -1.0)
                    out["gps_lon"] = dms(lon) * (1.0 if lon_ref == "E"
                                                 else -1.0)
            return out
        pos += seglen
    return out


def _ifd(e: str, entries: list[tuple], base: int) -> bytes:
    """Serialize one IFD at ``base`` (byte offset of the IFD within the
    TIFF buffer): entries are (tag, ftype, values|bytes); oversize
    values land immediately after the entry table."""
    n = len(entries)
    table = struct.pack(e + "H", n)
    tail = b""
    tail_off = base + 2 + 12 * n + 4
    for tag, ftype, val in sorted(entries):
        if ftype == 2:
            raw = val.encode("ascii") + b"\x00"
            count = len(raw)
        elif ftype == 5:  # RATIONAL pairs
            pairs = val if isinstance(val[0], tuple) else (val,)
            count = len(pairs)
            raw = struct.pack(e + "II" * count,
                              *[x for pr in pairs for x in pr])
        else:
            vals = val if isinstance(val, tuple) else (val,)
            count = len(vals)
            raw = struct.pack(e + _TYPE_CODES[ftype] * count, *vals)
        if len(raw) <= 4:
            field = raw + b"\x00" * (4 - len(raw))
        else:
            field = struct.pack(e + "I", tail_off + len(tail))
            tail += raw
        table += struct.pack(e + "HHI", tag, ftype, count) + field
    return table + struct.pack(e + "I", 0) + tail


def attach_exif(
    jpeg: bytes,
    *,
    orientation: int = 1,
    make: str = "",
    model: str = "",
    pixel_x: int | None = None,
    pixel_y: int | None = None,
    gps: tuple | None = None,
    byte_order: str = "<",
) -> bytes:
    """Insert an APP1 Exif segment (IFD0 + Exif sub-IFD + optional GPS
    IFD) right after SOI — the fixture writer, spec-shaped enough for
    any EXIF reader. ``gps`` = (lat_ref, lat_dms, lon_ref, lon_dms)
    with each dms a triple of (numerator, denominator) rationals."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    if not 1 <= orientation <= 8:
        raise ValueError(f"orientation must be 1..8, got {orientation}")
    e = byte_order
    ifd0_entries = [(TAG_ORIENTATION, 3, orientation)]
    if make:
        ifd0_entries.append((TAG_MAKE, 2, make))
    if model:
        ifd0_entries.append((TAG_MODEL, 2, model))
    sub_entries = []
    if pixel_x is not None:
        sub_entries.append((TAG_PIXEL_X, 4, int(pixel_x)))
    if pixel_y is not None:
        sub_entries.append((TAG_PIXEL_Y, 4, int(pixel_y)))
    gps_entries = []
    if gps is not None:
        lat_ref, lat_dms, lon_ref, lon_dms = gps
        gps_entries = [
            (GPS_LAT_REF, 2, lat_ref),
            (GPS_LAT, 5, tuple(tuple(p) for p in lat_dms)),
            (GPS_LON_REF, 2, lon_ref),
            (GPS_LON, 5, tuple(tuple(p) for p in lon_dms)),
        ]
    # two-pass: IFD0's size depends on which sub-IFD pointers exist
    if sub_entries:
        ifd0_entries.append((TAG_EXIF_IFD, 4, 0))  # patched below
    if gps_entries:
        ifd0_entries.append((TAG_GPS_IFD, 4, 0))  # patched below
    ifd0 = _ifd(e, ifd0_entries, 8)
    tiff = (b"II" if e == "<" else b"MM") + struct.pack(e + "H", 42)
    tiff += struct.pack(e + "I", 8) + ifd0

    def patch_pointer(buf: bytes, tag_wanted: int, off: int) -> bytes:
        (n,) = struct.unpack_from(e + "H", buf, 8)
        for i in range(n):
            p = 10 + 12 * i
            (tag,) = struct.unpack_from(e + "H", buf, p)
            if tag == tag_wanted:
                return (buf[: p + 8] + struct.pack(e + "I", off)
                        + buf[p + 12 :])
        raise AssertionError(f"pointer tag 0x{tag_wanted:04x} not found")

    if sub_entries:
        sub_off = len(tiff)
        tiff = patch_pointer(tiff, TAG_EXIF_IFD, sub_off)
        tiff += _ifd(e, sub_entries, sub_off)
    if gps_entries:
        gps_off = len(tiff)
        tiff = patch_pointer(tiff, TAG_GPS_IFD, gps_off)
        tiff += _ifd(e, gps_entries, gps_off)
    payload = b"Exif\x00\x00" + tiff
    seg = struct.pack(">BBH", 0xFF, 0xE1, len(payload) + 2) + payload
    return jpeg[:2] + seg + jpeg[2:]


def apply_exif_orientation(arr: np.ndarray, orientation: int) -> np.ndarray:
    """The eight EXIF orientation transforms (TIFF 6.0 / EXIF 2.3):
    1 normal, 2 mirror-H, 3 rotate 180, 4 mirror-V, 5 transpose,
    6 rotate 90 CW, 7 transverse, 8 rotate 270 CW."""
    if not 1 <= orientation <= 8:
        raise ValueError(f"orientation must be 1..8, got {orientation}")
    if orientation == 1:
        return arr
    if orientation == 2:
        return arr[:, ::-1]
    if orientation == 3:
        return arr[::-1, ::-1]
    if orientation == 4:
        return arr[::-1, :]
    if orientation == 5:
        return arr.swapaxes(0, 1)
    if orientation == 6:
        return np.rot90(arr, -1)
    if orientation == 7:
        return np.rot90(arr, 2).swapaxes(0, 1)
    return np.rot90(arr, 1)  # 8
