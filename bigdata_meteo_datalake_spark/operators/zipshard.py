"""ZIP-container corpus shards — the other ubiquitous training-data
container next to tar WebDataset shards (operators/webdataset.py) and
compressed JSONL (operators/web.py): a shard is a ZIP archive whose
members pair up by basename stem ({stem}.jpg + {stem}.txt + ...), read
in central-directory order. Stdlib ``zipfile`` reads/writes it, so the
full path — shard demux, stem grouping, per-member inflate + CRC-32
verification, per-sample image decode + caption — runs here with no
external deps and sits under a DuckDB oracle hash
(queries/ext_multimodal.py:zip_shard_report).

Both storage methods the format allows for corpus data are exercised
and surfaced: STORED (method 0, raw bytes — what you use for already-
compressed JPEG members) and DEFLATED (method 8, zlib — what you use
for text). zipfile verifies each member's CRC-32 on read, so a corrupt
member fails loudly instead of yielding garbage pixels.

Scale note: like tar shards, ZIP shards are the unit of parallelism
(one blob = one shard = hundreds of samples); the kernel is a pure
per-shard scan-map, zero exchanges. Unlike tar, ZIP has a central
directory at the END of the file — fine here because a shard is one
in-memory blob, and on a cluster the reader fetches the directory
range first anyway.

Reference parity note: the reference repo has no multimodal layer
(SURVEY.md section 4); this module belongs to the training-data
pillar.
"""

from __future__ import annotations

import io
import zipfile

__all__ = ["read_zip_shard", "write_zip_shard"]

# fixed DOS timestamp (the ZIP epoch) so shard bytes are deterministic
_EPOCH = (1980, 1, 1, 0, 0, 0)


def write_zip_shard(samples: list[dict]) -> bytes:
    """[{key: str, extension: payload-bytes, ..., methods: {ext:
    method}?}] -> a ZIP shard with one member per (key, extension) in
    sample order ({key}.{ext}). Each member's storage method comes from
    the sample's optional ``methods`` dict (zipfile.ZIP_STORED /
    ZIP_DEFLATED; default STORED). Timestamps are pinned to the ZIP
    epoch so identical samples produce identical shard bytes."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, mode="w") as zf:
        for s in samples:
            key = s["key"]
            methods = s.get("methods", {})
            for ext, payload in s.items():
                if ext in ("key", "methods"):
                    continue
                info = zipfile.ZipInfo(f"{key}.{ext}", date_time=_EPOCH)
                info.compress_type = methods.get(ext, zipfile.ZIP_STORED)
                zf.writestr(info, payload)
    return buf.getvalue()


def read_zip_shard(b: bytes) -> list[dict]:
    """ZIP shard -> [{key, <ext>: bytes, ..., methods: {ext: method}}]
    grouped by basename stem in central-directory order. Directory
    entries are skipped; a member without an extension, an empty shard,
    an unsupported compression method, or a CRC-32 mismatch raises
    ValueError (a broken shard must fail loudly, not yield zero or
    garbage samples silently)."""
    import zlib

    # zipfile's failure zoo beyond BadZipFile (mutation-fuzz findings,
    # tests/test_round11_props.py): a flipped GP flag bit makes a member
    # "encrypted" (RuntimeError), truncation inside a member raises
    # EOFError, a corrupt deflate stream leaks raw zlib.error, and a
    # mangled central directory can drive index arithmetic into
    # IndexError — all are corrupt-shard conditions, normalized to the
    # module's contracted ValueError
    _CORRUPT = (zipfile.BadZipFile, RuntimeError, EOFError, IndexError,
                OSError, zlib.error)
    try:
        zf = zipfile.ZipFile(io.BytesIO(b), mode="r")
    except _CORRUPT as e:
        raise ValueError(f"not a ZIP shard ({e})") from e
    samples: dict[str, dict] = {}
    order: list[str] = []
    with zf:
        for info in zf.infolist():
            if not info.filename:
                # stdlib is_dir() IndexErrors on an empty name
                raise ValueError("zip member with empty filename")
            if info.is_dir():
                continue
            name = info.filename.rsplit("/", 1)[-1]
            if "." not in name:
                raise ValueError(
                    f"zip member {info.filename!r} has no extension"
                )
            if info.compress_type not in (
                zipfile.ZIP_STORED, zipfile.ZIP_DEFLATED
            ):
                raise ValueError(
                    f"zip member {info.filename!r} uses unsupported "
                    f"compression method {info.compress_type}"
                )
            stem, ext = name.rsplit(".", 1)
            try:
                payload = zf.read(info)  # verifies CRC-32
            except _CORRUPT as e:
                raise ValueError(
                    f"zip member {info.filename!r} corrupt ({e})"
                ) from e
            if stem not in samples:
                samples[stem] = {"key": stem, "methods": {}}
                order.append(stem)
            samples[stem][ext] = payload
            samples[stem]["methods"][ext] = info.compress_type
    if not order:
        raise ValueError("empty ZIP shard")
    return [samples[k] for k in order]
