"""Parquet split-block bloom filter (SBBF) probe — the data-skipping
sidecar next to the footer zone maps (parquet_footer.py), from the
PUBLIC parquet-format spec (BloomFilter.md):

- ``bloom_filter_offset`` / ``bloom_filter_length`` (ColumnMetaData
  thrift fields 14/15, parsed by the existing compact-protocol walk)
  locate a BloomFilterHeader (numBytes + the BLOCK / XXHASH /
  UNCOMPRESSED union triple) followed by the raw bitset;
- the bitset is an array of 256-bit blocks (eight 32-bit
  little-endian words); a value hashes with XXH64 (seed 0, our own
  lz4zstd.py implementation — a third triangulation of that function
  after the spec vectors and Spark's JVM xxhash64) over its PLAIN
  encoding WITHOUT length prefixes (int64/double -> 8-byte LE,
  BYTE_ARRAY -> raw bytes); the upper 32 hash bits pick the block
  (``((h >> 32) * n_blocks) >> 32``), and the lower 32 bits build the
  8-bit mask through the spec's eight salt constants
  (``bit_i = (x * SALT[i]) >> 27`` per word);
- the audit's trust property is the guarantee the format makes:
  a bloom filter may false-positive but NEVER false-negative — every
  value actually present in the file must test positive, which is
  only true end to end if the thrift walk, the header parse, the
  block math, and the hash all agree with the JAVA writer
  (parquet-mr via Spark) bit for bit.

Writer caveat worth documenting: parquet-mr silently OMITS the bloom
filter for a column chunk whose pages are all dictionary-encoded (the
dictionary already gives exact membership), so the audit writes with
dictionary encoding disabled; a missing bloom on an audited column
raises rather than vacuously passing.

Reference parity note: the reference repo trusts Postgres for all
storage (SURVEY.md section 4); this extends the lakehouse estate
audits (parquet/ORC footers, Delta, Iceberg).
"""

from __future__ import annotations

import struct

from .lz4zstd import xxh64
from .parquet_footer import _read_struct, _typed

__all__ = [
    "SBBF_SALT",
    "read_bloom_filter",
    "sbbf_contains",
    "sbbf_contains_np",
]

SBBF_SALT = (
    0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
    0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31,
)


def _union_tag(hdr: dict, fid: int, what: str) -> int:
    u = _typed(hdr, fid, dict, f"BloomFilterHeader.{what}")
    if u is None:
        raise ValueError(f"bloom filter header missing {what}")
    tags = [k for k, v in u.items() if isinstance(v, dict)]
    if len(tags) != 1:
        raise ValueError(f"bloom filter {what} union carries {len(tags)} "
                         "members, not 1")
    return tags[0]


def read_bloom_filter(b: bytes, offset: int, length: int) -> bytes:
    """File bytes + the column chunk's bloom offset/length -> the raw
    SBBF bitset, with the header's full contract enforced: the
    algorithm/hash/compression unions must be BLOCK/XXHASH/UNCOMPRESSED
    (tag 1 each — anything else is a declared boundary), numBytes must
    be a positive multiple of 32 and a power of two, and the header
    plus bitset must consume the declared length exactly."""
    if offset < 0 or length <= 0 or offset + length > len(b):
        raise ValueError("bloom filter region out of file bounds")
    hdr, end = _read_struct(b, offset)
    nbytes = _typed(hdr, 1, int, "BloomFilterHeader.numBytes")
    if nbytes is None or nbytes <= 0:
        raise ValueError("bloom filter header without a positive numBytes")
    for fid, what, known in ((2, "algorithm", "BLOCK"),
                             (3, "hash", "XXHASH"),
                             (4, "compression", "UNCOMPRESSED")):
        tag = _union_tag(hdr, fid, what)
        if tag != 1:
            raise NotImplementedError(
                f"bloom filter {what} tag {tag} is a declared boundary "
                f"(only {known} is specified)"
            )
    if nbytes % 32 or nbytes & (nbytes - 1):
        raise ValueError(
            f"SBBF bitset of {nbytes} bytes is not a power-of-two "
            "multiple of the 32-byte block"
        )
    if end - offset + nbytes != length:
        raise ValueError(
            f"bloom header ({end - offset}B) + bitset ({nbytes}B) != "
            f"declared length {length}"
        )
    return b[end : end + nbytes]


def sbbf_contains(bitset: bytes, h: int) -> bool:
    """Spec membership test: block from the upper 32 hash bits, an
    8x32 mask from the lower 32 through the salt table."""
    n_blocks = len(bitset) >> 5
    if not n_blocks or len(bitset) & 31:
        raise ValueError("SBBF bitset is not whole 32-byte blocks")
    bi = ((h >> 32) * n_blocks) >> 32
    x = h & 0xFFFFFFFF
    words = struct.unpack_from("<8I", bitset, bi << 5)
    for i in range(8):
        bit = ((x * SBBF_SALT[i]) & 0xFFFFFFFF) >> 27
        if not (words[i] >> bit) & 1:
            return False
    return True


try:  # vectorized probe; the scalar test stays as the reference
    import numpy as _np
except ImportError:  # pragma: no cover - numpy ships in the container
    _np = None


def sbbf_contains_np(bitset: bytes, h):
    """Vectorized :func:`sbbf_contains` over a uint64 hash array ->
    per-value membership bools: block index from the upper 32 bits,
    the 8x32 salt mask from the lower 32 — all in uint32/uint64 numpy
    arithmetic (wrap == the spec's modular math). Equality
    property-tested against the scalar form (round-13)."""
    n_blocks = len(bitset) >> 5
    if not n_blocks or len(bitset) & 31:
        raise ValueError("SBBF bitset is not whole 32-byte blocks")
    words = _np.frombuffer(bitset, "<u4").reshape(n_blocks, 8)
    bi = ((h >> _np.uint64(32)) * _np.uint64(n_blocks)) >> _np.uint64(32)
    x = (h & _np.uint64(0xFFFFFFFF)).astype(_np.uint32)
    blk = words[bi.astype(_np.int64)]
    ok = _np.ones(h.shape, dtype=bool)
    with _np.errstate(over="ignore"):
        for i in range(8):
            bit = (x * _np.uint32(SBBF_SALT[i])) >> _np.uint32(27)
            ok &= ((blk[:, i] >> bit) & _np.uint32(1)).astype(bool)
    return ok


def _plain_bytes(v, kind: str) -> bytes:
    if kind == "long":
        return struct.pack("<q", int(v))
    if kind == "double":
        return struct.pack("<d", float(v))
    if kind == "string":
        return str(v).encode("utf-8")
    raise ValueError(f"unsupported bloom probe kind {kind!r}")


def _bloom_regions(b: bytes, column: str) -> list[tuple[int, int]]:
    """One (offset, length) per row group for the named column; a row
    group whose chunk carries no bloom filter raises (the audit must
    never pass vacuously)."""
    if b[:4] != b"PAR1" or b[-4:] != b"PAR1":
        raise ValueError("not a parquet file")
    (flen,) = struct.unpack_from("<I", b, len(b) - 8)
    if flen <= 0 or flen + 8 > len(b):
        raise ValueError("parquet footer length out of bounds")
    fm, _ = _read_struct(b[len(b) - 8 - flen : len(b) - 8], 0)
    row_groups = _typed(fm, 4, list, "FileMetaData.row_groups")
    if not row_groups:
        raise ValueError("parquet file without row groups")
    out = []
    for rg in row_groups:
        if not isinstance(rg, dict):
            raise ValueError("row group is not a struct")
        cols = _typed(rg, 1, list, "RowGroup.columns")
        hit = None
        for c in cols or []:
            if not isinstance(c, dict):
                raise ValueError("column chunk is not a struct")
            meta = _typed(c, 3, dict, "ColumnChunk.meta_data")
            if meta is None:
                continue
            path = _typed(meta, 3, list, "ColumnMetaData.path_in_schema")
            name = b".".join(
                p for p in (path or []) if isinstance(p, bytes)
            ).decode("utf-8", "replace")
            if name == column:
                hit = meta
                break
        if hit is None:
            raise ValueError(f"column {column!r} not found in a row group")
        off = _typed(hit, 14, int, "bloom_filter_offset")
        ln = _typed(hit, 15, int, "bloom_filter_length")
        if off is None or ln is None:
            raise ValueError(
                f"column {column!r} carries no bloom filter (all-dictionary "
                "chunks are silently skipped by parquet-mr — the audit "
                "writes with dictionary encoding disabled)"
            )
        out.append((off, ln))
    return out


def file_bloom_probe(path: str, column: str, kind: str,
                     values) -> dict:
    """The audit core: every distinct ``value`` actually present in
    the file must hit in at least one row group's bloom filter (the
    format's no-false-negative guarantee, end to end through thrift,
    header, block math, and hash)."""
    with open(path, "rb") as f:
        b = f.read()
    bitsets = [read_bloom_filter(b, off, ln)
               for off, ln in _bloom_regions(b, column)]
    if _np is not None and kind in ("long", "double"):
        # vectorized probe (round-13): 8-byte keys hash through
        # xxh64_u64_np on their uint64 bit view — zero per-value
        # packing — and each row group's SBBF answers the whole batch
        from .lz4zstd import xxh64_u64_np

        vals = list(values)
        if kind == "long":
            lanes = _np.asarray(vals, dtype=_np.int64).view(_np.uint64)
        else:
            lanes = _np.asarray(vals, dtype=_np.float64).view(
                _np.uint64)
        h = xxh64_u64_np(lanes)
        ok = _np.zeros(h.shape, dtype=bool)
        for bs in bitsets:
            ok |= sbbf_contains_np(bs, h)
        return {"n_distinct": int(h.shape[0]),
                "present_hits": int(ok.sum()),
                "n_row_groups": len(bitsets),
                "bitset_bytes": sum(len(bs) for bs in bitsets)}
    n = 0
    hits = 0
    for v in values:
        n += 1
        h = xxh64(_plain_bytes(v, kind))
        if any(sbbf_contains(bs, h) for bs in bitsets):
            hits += 1
    return {"n_distinct": n, "present_hits": hits,
            "n_row_groups": len(bitsets),
            "bitset_bytes": sum(len(bs) for bs in bitsets)}


BLOOM_REPORT_SCHEMA = (
    "tbl string, col string, n_distinct long, present_hits long, "
    "all_present boolean"
)


def bloom_probe_column_stats(df):
    """(tbl, col, kind, path) rows -> one audit row each: the distinct
    values are re-read from the DATA (pyarrow, the independent reader)
    and each is probed against the file's own bloom filters."""
    import pandas as pd

    def kernel(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            out = {k: [] for k in ("tbl", "col", "n_distinct",
                                   "present_hits", "all_present")}
            for tbl, col, kind, path in zip(pdf["tbl"], pdf["col"],
                                            pdf["kind"], pdf["path"]):
                vals = pq.read_table(path, columns=[col])[col]
                distinct = sorted(
                    {v for v in vals.to_pylist() if v is not None}
                )
                if not distinct:
                    # an EMPTY file legitimately has no bloom filter
                    # (parquet-mr writes none without pages) — report it
                    # as vacuously satisfied, exactly what the oracle's
                    # count(DISTINCT) produces; the loud missing-bloom
                    # path stays for files that DO have values
                    out["tbl"].append(tbl)
                    out["col"].append(col)
                    out["n_distinct"].append(0)
                    out["present_hits"].append(0)
                    out["all_present"].append(True)
                    continue
                r = file_bloom_probe(path, col, kind, distinct)
                out["tbl"].append(tbl)
                out["col"].append(col)
                out["n_distinct"].append(r["n_distinct"])
                out["present_hits"].append(r["present_hits"])
                out["all_present"].append(
                    r["present_hits"] == r["n_distinct"])
            yield pd.DataFrame(out)

    return df.select("tbl", "col", "kind", "path").mapInPandas(
        kernel, BLOOM_REPORT_SCHEMA
    )
