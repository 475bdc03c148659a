"""ORC row-group index + bloom filter audit — the ORC twins of the
parquet page-index and SBBF audits (parquet_pageindex.py,
parquet_bloom.py), so both columnar estates' data-skipping sidecars
are held to one standard. All from the PUBLIC ORC spec
(orc.apache.org/specification) plus one implementation fact verified
against the shipped writer's bytecode:

- each stripe's INDEX REGION (the first ``indexLength`` bytes) holds,
  per the stripe footer's stream list, a ROW_INDEX stream (kind 6,
  protobuf RowIndex: one RowIndexEntry per row-group stride with
  stream positions and per-stride ColumnStatistics) and a
  BLOOM_FILTER_UTF8 stream (kind 8, protobuf BloomFilterIndex: one
  BloomFilter per stride — numHashFunctions + a little-endian packed
  long bitset);
- bloom hashing: strings hash with the ORC variant of Murmur3's
  64-bit form (seed 104729) over UTF-8 bytes; longs (and doubles via
  ``doubleToLongBits``) hash with ORC's Thomas-Wang-style mixer —
  which, in the shipped writer, uses SIGNED (arithmetic) right shifts
  where Wang's published function uses unsigned ones (verified against
  ``org.apache.orc.util.BloomFilter.getLongHash``'s bytecode: ``lshr``
  not ``lushr``; the difference is invisible for small positive keys
  and total for 0, negatives, and large keys — 0 hashes to 0);
- bit placement: Java-int double hashing — ``h1 + i*h2`` in 32-bit
  arithmetic, bitwise-NOT when negative, modulo the bit count — over
  a long-array bitset (bit ``p`` lives at ``word[p >> 6]`` bit
  ``p & 63``);
- the audit's trust properties: every stride's declared statistics
  must EQUAL the actual min/max/null-count of its rows, and every
  value actually present in a stride must test positive in that
  stride's bloom (no false negatives) — the guarantees ORC's
  predicate pushdown (SearchArgument row-group skipping) rests on.

Old-style BLOOM_FILTER streams (kind 7, pre-ORC-135 fixed64 bitsets)
are a declared boundary; modern writers emit UTF8 blooms.

Reference parity note: the reference repo trusts Postgres for all
storage (SURVEY.md section 4); this completes the ORC side of the
lakehouse estate audits.
"""

from __future__ import annotations

import math
import struct

from .orc_footer import (
    _decompress_stream,
    _parse_col_stats,
    _parse_postscript,
    _parse_stripe,
    _pb_fields,
    _varint,
)

__all__ = [
    "murmur3_64",
    "orc_bloom_test",
    "orc_bloom_test_np",
    "orc_long_hash",
    "orc_long_hash_np",
    "read_orc_indexes",
    "verify_orc_indexes",
    "verify_orc_indexes_np",
]

_M64 = (1 << 64) - 1
_M32 = (1 << 32) - 1
MURMUR3_ORC_SEED = 104729  # org.apache.orc.util.Murmur3.DEFAULT_SEED

_ROW_INDEX, _BLOOM_OLD, _BLOOM_UTF8 = 6, 7, 8


def _sx64(v: int) -> int:
    v &= _M64
    return v - (1 << 64) if v >= 1 << 63 else v


def _sx32(v: int) -> int:
    v &= _M32
    return v - (1 << 32) if v >= 1 << 31 else v


def orc_long_hash(key: int) -> int:
    """ORC's long/double bloom hash: Thomas Wang's 64-bit mix WITH
    the shipped writer's signed right shifts (see module docstring).
    Notably maps 0 -> 0."""
    key = _sx64(key)
    key = _sx64((~key) + _sx64(key << 21))
    key = _sx64(key ^ (key >> 24))  # python >> on signed ints IS lshr
    key = _sx64(key + _sx64(key << 3) + _sx64(key << 8))
    key = _sx64(key ^ (key >> 14))
    key = _sx64(key + _sx64(key << 2) + _sx64(key << 4))
    key = _sx64(key ^ (key >> 28))
    key = _sx64(key + _sx64(key << 31))
    return key & _M64


def murmur3_64(data: bytes, seed: int = MURMUR3_ORC_SEED) -> int:
    """The 64-bit single-lane Murmur3 variant ORC strings hash with
    (org.apache.orc.util.Murmur3.hash64): x64_128's h1 lane only,
    8-byte little-endian blocks, the standard fmix64 finalizer."""
    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F
    h = seed & _M64
    nblocks = len(data) >> 3
    for i in range(nblocks):
        k = int.from_bytes(data[8 * i : 8 * i + 8], "little")
        k = (k * c1) & _M64
        k = ((k << 31) | (k >> 33)) & _M64
        k = (k * c2) & _M64
        h ^= k
        h = ((h << 27) | (h >> 37)) & _M64
        h = (h * 5 + 0x52DCE729) & _M64
    tail = data[8 * nblocks :]
    if tail:
        k = 0
        for i in range(len(tail) - 1, -1, -1):
            k = (k << 8) | tail[i]
        k = (k * c1) & _M64
        k = ((k << 31) | (k >> 33)) & _M64
        k = (k * c2) & _M64
        h ^= k
    h ^= len(data)
    h ^= h >> 33
    h = (h * 0xFF51AFD7ED558CCD) & _M64
    h ^= h >> 33
    h = (h * 0xC4CEB9FE1A85EC53) & _M64
    h ^= h >> 33
    return h


def orc_bloom_test(bitset_longs: tuple, n_hash: int, h64: int) -> bool:
    """Java-int double-hashing membership test over the packed
    long-array bitset."""
    nbits = 64 * len(bitset_longs)
    if not nbits:
        raise ValueError("empty ORC bloom bitset")
    h1, h2 = _sx32(h64), _sx32(h64 >> 32)
    for i in range(1, n_hash + 1):
        ch = _sx32(h1 + i * h2)
        if ch < 0:
            ch = _sx32(~ch)
        pos = ch % nbits
        if not (bitset_longs[pos >> 6] >> (pos & 63)) & 1:
            return False
    return True


def _hash_value(v, kind: str) -> int:
    if kind == "int":
        return orc_long_hash(int(v))
    if kind == "double":
        return orc_long_hash(
            struct.unpack("<q", struct.pack("<d", float(v)))[0]
        )
    if kind == "string":
        return murmur3_64(str(v).encode("utf-8"))
    raise ValueError(f"unsupported bloom kind {kind!r}")


def _parse_row_index(b: bytes) -> list[dict]:
    entries = []
    for fid, wire, v in _pb_fields(b):
        if fid == 1 and wire == 2:
            ent = {"positions": [], "stats": None}
            for f2, w2, v2 in _pb_fields(v):
                if f2 == 1:
                    if w2 == 2:
                        p = 0
                        while p < len(v2):
                            u, p = _varint(v2, p)
                            ent["positions"].append(u)
                    elif w2 == 0:
                        ent["positions"].append(v2)
                    else:
                        raise ValueError("RowIndexEntry positions wire")
                elif f2 == 2 and w2 == 2:
                    ent["stats"] = _parse_col_stats(v2)
            if ent["stats"] is None:
                raise ValueError("RowIndexEntry without statistics")
            entries.append(ent)
    if not entries:
        raise ValueError("empty RowIndex")
    return entries


def _parse_bloom_index(b: bytes) -> list[dict]:
    blooms = []
    for fid, wire, v in _pb_fields(b):
        if fid == 1 and wire == 2:
            bl = {"n_hash": None, "bits": None}
            for f2, w2, v2 in _pb_fields(v):
                if f2 == 1 and w2 == 0:
                    bl["n_hash"] = v2
                elif f2 == 2:
                    raise NotImplementedError(
                        "pre-UTF8 fixed64 bloom bitsets are a declared "
                        "boundary (modern writers emit BLOOM_FILTER_UTF8)"
                    )
                elif f2 == 3 and w2 == 2:
                    bl["bits"] = v2
            if bl["n_hash"] is None or bl["n_hash"] <= 0:
                raise ValueError("BloomFilter without numHashFunctions")
            if not bl["bits"] or len(bl["bits"]) % 8:
                raise ValueError("BloomFilter utf8bitset not whole longs")
            bl["longs"] = struct.unpack(
                f"<{len(bl['bits']) // 8}q", bl["bits"]
            )
            blooms.append(bl)
    if not blooms:
        raise ValueError("empty BloomFilterIndex")
    return blooms


def read_orc_indexes(b: bytes, column: str) -> dict:
    """ORC file bytes + column name -> per-stripe row indexes and
    blooms: {row_stride, stripes: [{n_rows, entries, blooms}]}.
    Raises when the column carries no row index or no bloom stream
    (the audit must never pass vacuously)."""
    if len(b) < 4 or b[:3] != b"ORC":
        raise ValueError("not an ORC file")
    ps_len = b[-1]
    if ps_len < 1 or 1 + ps_len > len(b):
        raise ValueError("postscript length overruns the file")
    ps = _parse_postscript(b[len(b) - 1 - ps_len : len(b) - 1])
    codec = ps["codec"]
    flen = ps["footer_length"]
    if flen <= 0 or 1 + ps_len + flen > len(b):
        raise ValueError("footer length overruns the file")
    footer = _decompress_stream(
        b[len(b) - 1 - ps_len - flen : len(b) - 1 - ps_len], codec
    )
    stripes = []
    root = None
    stride = None
    for fid, wire, v in _pb_fields(footer):
        if fid == 3 and wire == 2:
            stripes.append(_parse_stripe(v))
        elif fid == 4 and wire == 2 and root is None:
            root = v  # first type = root struct
        elif fid == 8 and wire == 0:
            stride = v
    if root is None:
        raise ValueError("footer missing the type tree")
    if stride is None or stride <= 0:
        raise ValueError("footer missing rowIndexStride (indexes disabled)")
    names = []
    for f2, w2, v2 in _pb_fields(root):
        if f2 == 3 and w2 == 2:
            names.append(v2.decode("utf-8", "replace"))
    if column not in names:
        raise ValueError(f"column {column!r} not in the ORC schema")
    col_id = names.index(column) + 1  # type ids: root=0, children follow

    out = []
    for st in stripes:
        sf_off = st["offset"] + st["index_length"] + st["data_length"]
        if sf_off + st["footer_length"] > len(b):
            raise ValueError("stripe footer overruns the file")
        sf = _decompress_stream(
            b[sf_off : sf_off + st["footer_length"]], codec
        )
        streams = []
        for fid, wire, v in _pb_fields(sf):
            if fid == 1 and wire == 2:
                s = {"kind": 0, "column": 0, "length": 0}
                for f2, w2, v2 in _pb_fields(v):
                    if f2 == 1:
                        s["kind"] = v2
                    elif f2 == 2:
                        s["column"] = v2
                    elif f2 == 3:
                        s["length"] = v2
                streams.append(s)
        pos = st["offset"]
        entries = blooms = None
        index_end = st["offset"] + st["index_length"]
        for s in streams:
            if s["kind"] not in (_ROW_INDEX, _BLOOM_OLD, _BLOOM_UTF8):
                continue  # data-region streams follow the index region
            if pos + s["length"] > index_end:
                raise ValueError("index stream overruns the index region")
            raw = b[pos : pos + s["length"]]
            pos += s["length"]
            if s["column"] != col_id:
                continue
            if s["kind"] == _ROW_INDEX:
                entries = _parse_row_index(_decompress_stream(raw, codec))
            elif s["kind"] == _BLOOM_UTF8:
                blooms = _parse_bloom_index(_decompress_stream(raw, codec))
            else:
                raise NotImplementedError(
                    "pre-UTF8 BLOOM_FILTER streams are a declared boundary"
                )
        if entries is None:
            raise ValueError(f"column {column!r} has no ROW_INDEX stream")
        if blooms is None:
            raise ValueError(
                f"column {column!r} has no BLOOM_FILTER_UTF8 stream (the "
                "audit writes with orc.bloom.filter.columns)"
            )
        if len(blooms) != len(entries):
            raise ValueError(
                f"{len(blooms)} blooms for {len(entries)} row-index "
                "entries"
            )
        want = math.ceil(st["n_rows"] / stride) if st["n_rows"] else 0
        if len(entries) != want:
            raise ValueError(
                f"{len(entries)} row-index entries for {st['n_rows']} "
                f"rows at stride {stride}"
            )
        out.append({"n_rows": st["n_rows"], "entries": entries,
                    "blooms": blooms})
    return {"row_stride": stride, "stripes": out}


def verify_orc_indexes(b: bytes, column: str, kind: str,
                       values: list) -> dict:
    """The audit core: slice the column's actual values (read back by
    pyarrow.orc, in file row order) along stripe/stride boundaries and
    hold every row-index statistic AND every stride bloom to them."""
    idx = read_orc_indexes(b, column)
    stride = idx["row_stride"]
    total = sum(s["n_rows"] for s in idx["stripes"])
    if total != len(values):
        raise ValueError(
            f"indexes cover {total} rows, data has {len(values)}"
        )
    n_strides = 0
    null_total = 0
    mins: list = []
    maxs: list = []
    row = 0
    for st in idx["stripes"]:
        for i, (ent, bl) in enumerate(zip(st["entries"], st["blooms"])):
            lo = row + i * stride
            hi = min(row + (i + 1) * stride, row + st["n_rows"])
            sl = values[lo:hi]
            present = [v for v in sl if v is not None]
            cs = ent["stats"]
            n_strides += 1
            nv = cs["n_values"]
            if nv != len(present):
                raise ValueError(
                    f"stride {n_strides - 1}: declared {nv} values, "
                    f"actual {len(present)}"
                )
            null_total += len(sl) - len(present)
            if cs["has_null"] != (len(present) < len(sl)):
                raise ValueError(
                    f"stride {n_strides - 1}: hasNull flag lies"
                )
            if not present:
                continue
            st_block = cs["int"] if kind == "int" else cs["double"]
            if st_block is None:
                raise ValueError(
                    f"stride {n_strides - 1}: missing {kind} statistics"
                )
            mn, mx = st_block["min"], st_block["max"]
            if mn != min(present) or mx != max(present):
                raise ValueError(
                    f"stride {n_strides - 1}: declared bounds "
                    f"[{mn}, {mx}] != actual "
                    f"[{min(present)}, {max(present)}]"
                )
            mins.append(mn)
            maxs.append(mx)
            for v in set(present):
                if not orc_bloom_test(bl["longs"], bl["n_hash"],
                                      _hash_value(v, kind)):
                    raise ValueError(
                        f"stride {n_strides - 1}: present value {v!r} "
                        "missing from its bloom filter (false negative)"
                    )
        row += st["n_rows"]
    return {
        "n_strides": n_strides,
        "num_rows": total,
        "null_count": null_total,
        "min_val": min(mins) if mins else None,
        "max_val": max(maxs) if maxs else None,
    }


try:  # vectorized verification; the pure loop stays as the reference
    import numpy as _np
except ImportError:  # pragma: no cover - numpy ships in the container
    _np = None


def orc_long_hash_np(keys):
    """Vectorized :func:`orc_long_hash` over an int64 array — numpy
    int64 arithmetic IS java long arithmetic (two's-complement wrap,
    arithmetic right shift), so the mixer transcribes 1:1; returns the
    hash as int64 (the unsigned result's two's-complement view).
    Equality property-tested against the scalar form."""
    with _np.errstate(over="ignore"):
        k = keys.astype(_np.int64)
        k = (~k) + (k << 21)
        k = k ^ (k >> 24)
        k = k + (k << 3) + (k << 8)
        k = k ^ (k >> 14)
        k = k + (k << 2) + (k << 4)
        k = k ^ (k >> 28)
        k = k + (k << 31)
    return k


def orc_bloom_test_np(bitset_longs: tuple, n_hash: int, h64):
    """Vectorized :func:`orc_bloom_test` over an int64 hash array ->
    per-value membership bool array (the audit's no-false-negative
    claim checks ``.all()``; a failure indexes the offending value)."""
    nbits = 64 * len(bitset_longs)
    if not nbits:
        raise ValueError("empty ORC bloom bitset")
    bs = _np.asarray(bitset_longs, dtype=_np.int64)
    h1 = h64.astype(_np.int32)
    h2 = (h64.view(_np.uint64) >> _np.uint64(32)).astype(
        _np.uint32).view(_np.int32)
    ok = _np.ones(h64.shape, dtype=bool)
    with _np.errstate(over="ignore"):
        for i in range(1, n_hash + 1):
            ch = (h1.astype(_np.int64)
                  + i * h2.astype(_np.int64)).astype(_np.int32)
            ch = _np.where(ch < 0, ~ch, ch)
            pos = ch.astype(_np.int64) % nbits
            bit = (bs[pos >> 6] >> (pos & 63)) & 1
            ok &= bit.astype(bool)
    return ok


def verify_orc_indexes_np(b: bytes, column: str, kind: str,
                          vals_np, nulls_np) -> dict:
    """Vectorized twin of :func:`verify_orc_indexes` (round-13): the
    same structural walk (shared ``read_orc_indexes``) and the same
    per-stride claims — stats reduced by numpy slices, bloom membership
    through the vectorized Wang mixer over each stride's distinct
    values. int/double kinds only (the audited set); strings keep the
    pure path. Equality-tested against the pure form."""
    if kind not in ("int", "double"):
        raise ValueError(
            f"vectorized ORC verify supports int/double, got {kind!r}"
        )
    idx = read_orc_indexes(b, column)
    stride = idx["row_stride"]
    total = sum(s["n_rows"] for s in idx["stripes"])
    n_rows = int(vals_np.shape[0])
    if total != n_rows:
        raise ValueError(
            f"indexes cover {total} rows, data has {n_rows}"
        )
    n_strides = 0
    null_total = 0
    mins: list = []
    maxs: list = []
    row = 0
    for st in idx["stripes"]:
        for i, (ent, bl) in enumerate(zip(st["entries"], st["blooms"])):
            lo = row + i * stride
            hi = min(row + (i + 1) * stride, row + st["n_rows"])
            msk = nulls_np[lo:hi]
            n_null = int(msk.sum())
            n_present = (hi - lo) - n_null
            cs = ent["stats"]
            n_strides += 1
            nv = cs["n_values"]
            if nv != n_present:
                raise ValueError(
                    f"stride {n_strides - 1}: declared {nv} values, "
                    f"actual {n_present}"
                )
            null_total += n_null
            if cs["has_null"] != (n_present < hi - lo):
                raise ValueError(
                    f"stride {n_strides - 1}: hasNull flag lies"
                )
            if not n_present:
                continue
            st_block = cs["int"] if kind == "int" else cs["double"]
            if st_block is None:
                raise ValueError(
                    f"stride {n_strides - 1}: missing {kind} statistics"
                )
            sl = vals_np[lo:hi]
            if n_null:
                sl = sl[~msk]
            mn, mx = st_block["min"], st_block["max"]
            mn_act = sl.min().item()
            mx_act = sl.max().item()
            if mn != mn_act or mx != mx_act:
                raise ValueError(
                    f"stride {n_strides - 1}: declared bounds "
                    f"[{mn}, {mx}] != actual [{mn_act}, {mx_act}]"
                )
            mins.append(mn)
            maxs.append(mx)
            uniq = _np.unique(sl)
            keys = (uniq.view(_np.int64) if kind == "double"
                    else uniq.astype(_np.int64))
            ok = orc_bloom_test_np(bl["longs"], bl["n_hash"],
                                   orc_long_hash_np(keys))
            if not ok.all():
                bad = uniq[~ok][0].item()
                raise ValueError(
                    f"stride {n_strides - 1}: present value {bad!r} "
                    "missing from its bloom filter (false negative)"
                )
        row += st["n_rows"]
    return {
        "n_strides": n_strides,
        "num_rows": n_rows,
        "null_count": null_total,
        "min_val": min(mins) if mins else None,
        "max_val": max(maxs) if maxs else None,
    }


ORC_INDEX_REPORT_SCHEMA = (
    "tbl string, col string, n_strides int, num_rows long, "
    "null_count long, min_micro long, max_micro long, "
    "bloom_present boolean"
)


def orc_index_column_stats(df, *, micro: int = 1_000_000,
                           stride: int = 1000,
                           id_cols: tuple = (),
                           max_files_per_table: int | None = None,
                           sample_key_col: str = "path",
                           sample_epoch: int = 0):
    """(tbl, col, kind, path) rows -> one audit row each, every number
    INDEX-derived after verify_orc_indexes held each stride's stats
    and bloom to the pyarrow-read data.

    ``max_files_per_table`` is the SAMPLED-audit knob (round-12
    verdict): keep only the deterministic md5-ranked file subset per
    table (operators/estate_sampling.py) before any file is opened.
    ``id_cols`` passes manifest identity columns (``"name type"`` DDL
    strings) through to the report 1:1."""
    import pandas as pd

    if max_files_per_table is not None:
        from .estate_sampling import sample_audit_manifest

        df = sample_audit_manifest(
            df, max_files_per_table=max_files_per_table,
            key_col=sample_key_col, epoch=sample_epoch,
        )
    id_names = tuple(c.split()[0] for c in id_cols)

    def kernel(batches):
        import pyarrow.orc as po

        for pdf in batches:
            out = {k: [] for k in ("tbl", "col", "n_strides", "num_rows",
                                   "null_count", "min_micro", "max_micro",
                                   "bloom_present")}
            for n_ in id_names:
                out[n_] = []
            for j, (tbl, col, kind, path) in enumerate(
                zip(pdf["tbl"], pdf["col"], pdf["kind"], pdf["path"])
            ):
                for n_ in id_names:
                    out[n_].append(pdf[n_].iloc[j])
                with open(path, "rb") as f:
                    b = f.read()
                col_arr = po.ORCFile(path).read(columns=[col])[col]
                if len(col_arr) == 0:
                    # an EMPTY file has no strides and no index claims
                    out["tbl"].append(tbl)
                    out["col"].append(col)
                    out["n_strides"].append(0)
                    out["num_rows"].append(0)
                    out["null_count"].append(0)
                    out["min_micro"].append(None)
                    out["max_micro"].append(None)
                    out["bloom_present"].append(True)
                    continue
                if _np is not None and kind in ("int", "double"):
                    from .parquet_pageindex import column_as_numpy

                    vals_np, nulls_np = column_as_numpy(col_arr)
                    r = verify_orc_indexes_np(b, col, kind,
                                              vals_np, nulls_np)
                else:  # pragma: no cover - numpy ships here
                    r = verify_orc_indexes(b, col, kind,
                                           col_arr.to_pylist())
                if r["n_strides"] != -(-r["num_rows"] // stride):
                    raise ValueError(
                        f"{tbl}.{col}: {r['n_strides']} strides for "
                        f"{r['num_rows']} rows at stride {stride}"
                    )
                if r["min_val"] is None:
                    # non-empty file, all-null column: strides carry no
                    # bounds — NULL min/max, same as the oracle's
                    # min()/max() over no present values (r13 advice)
                    mn_u = mx_u = None
                elif kind == "int":
                    mn_u = int(r["min_val"]) * micro
                    mx_u = int(r["max_val"]) * micro
                else:
                    mn_u = math.floor(r["min_val"] * micro + 0.5)
                    mx_u = math.floor(r["max_val"] * micro + 0.5)
                out["tbl"].append(tbl)
                out["col"].append(col)
                out["n_strides"].append(r["n_strides"])
                out["num_rows"].append(r["num_rows"])
                out["null_count"].append(r["null_count"])
                out["min_micro"].append(mn_u)
                out["max_micro"].append(mx_u)
                out["bloom_present"].append(True)
            yield pd.DataFrame(out)

    schema = ORC_INDEX_REPORT_SCHEMA
    if id_cols:
        schema += ", " + ", ".join(id_cols)
    return df.select("tbl", "col", "kind", "path", *id_names).mapInPandas(
        kernel, schema
    )
