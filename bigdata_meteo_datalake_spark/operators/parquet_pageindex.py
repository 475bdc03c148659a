"""Parquet page index audit (ColumnIndex / OffsetIndex) — the third
data-skipping sidecar after the footer zone maps (parquet_footer.py)
and the split-block bloom filters (parquet_bloom.py), from the PUBLIC
parquet-format spec (PageIndex.md):

- ``column_index_offset/length`` and ``offset_index_offset/length``
  (ColumnChunk thrift fields 6/7 and 4/5) locate two compact-protocol
  structs per column chunk: a ColumnIndex (per-page null_pages,
  min_values, max_values, boundary_order, null_counts) and an
  OffsetIndex (per-page PageLocation: file offset, compressed size,
  first_row_index);
- the audit's trust property is page-level zone-map honesty: every
  page's declared [min, max] must EQUAL the actual min/max of the rows
  the OffsetIndex assigns to it (plain INT64/DOUBLE stats are exact —
  byte-array columns are excluded by design, writers may truncate
  their string bounds), its null_count must match, first_row_index
  must walk the chunk from zero strictly monotonically, page regions
  must be in-bounds and ascending, and a claimed boundary_order must
  actually hold across the page bounds. Row-level data comes back via
  pyarrow (the independent reader); the indexes come from our own
  thrift walk — disagreement anywhere is a hash mismatch.

The audit writes with ``parquet.page.row.count.limit`` as the binding
page splitter (page.size lifted to 8 MiB, block.size to 1 GiB so row
groups never fork), which makes the page count itself a closed form —
ceil(rows / limit) — the oracle recomputes.

Reference parity note: the reference repo trusts Postgres for all
storage (SURVEY.md section 4); this completes the parquet-sidecar
trio in the lakehouse estate audits.
"""

from __future__ import annotations

import math
import struct

from .parquet_footer import _read_struct, _typed

__all__ = [
    "column_as_numpy",
    "read_page_index",
    "verify_page_index",
    "verify_page_index_np",
]

_BOUNDARY_ORDERS = {0: "UNORDERED", 1: "ASCENDING", 2: "DESCENDING"}


def _decode_plain(raw: bytes, kind: str):
    if not isinstance(raw, bytes):
        raise ValueError("page index stat payload is not bytes")
    if kind == "int":
        if len(raw) != 8:
            raise ValueError(
                f"INT64 page stat payload of {len(raw)} bytes"
            )
        return struct.unpack("<q", raw)[0]
    if kind == "double":
        if len(raw) != 8:
            raise ValueError(
                f"DOUBLE page stat payload of {len(raw)} bytes"
            )
        v = struct.unpack("<d", raw)[0]
        if v != v:
            raise ValueError("NaN is not a legal page bound")
        return v
    raise ValueError(f"unsupported page-stat kind {kind!r}")


def _chunk_for(fm: dict, column: str) -> dict:
    row_groups = _typed(fm, 4, list, "FileMetaData.row_groups")
    if not row_groups:
        raise ValueError("parquet file without row groups")
    if len(row_groups) != 1:
        raise ValueError(
            f"page-index audit expects one row group, found "
            f"{len(row_groups)} (page counts are closed forms only when "
            "the row-count limit is the sole splitter)"
        )
    cols = _typed(row_groups[0], 1, list, "RowGroup.columns")
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
            return c
    raise ValueError(f"column {column!r} not found in the row group")


def read_page_index(b: bytes, column: str) -> dict:
    """File bytes + column name -> the parsed, structurally-validated
    ColumnIndex + OffsetIndex of its (single) chunk."""
    if b[:4] != b"PAR1" or b[-4:] != b"PAR1":
        raise ValueError("not a parquet file")
    (flen,) = struct.unpack_from("<I", b, len(b) - 8)
    if flen <= 0 or flen + 8 > len(b):
        raise ValueError("parquet footer length out of bounds")
    fm, _ = _read_struct(b[len(b) - 8 - flen : len(b) - 8], 0)
    chunk = _chunk_for(fm, column)
    oio = _typed(chunk, 4, int, "offset_index_offset")
    oil = _typed(chunk, 5, int, "offset_index_length")
    cio = _typed(chunk, 6, int, "column_index_offset")
    cil = _typed(chunk, 7, int, "column_index_length")
    if None in (oio, oil, cio, cil):
        raise ValueError(
            f"column {column!r} carries no page index"
        )
    for off, ln, what in ((oio, oil, "offset index"),
                          (cio, cil, "column index")):
        if off < 0 or ln <= 0 or off + ln > len(b):
            raise ValueError(f"{what} region out of file bounds")
    ci, _ = _read_struct(b[cio : cio + cil], 0)
    oi, _ = _read_struct(b[oio : oio + oil], 0)

    null_pages = _typed(ci, 1, list, "ColumnIndex.null_pages")
    mins = _typed(ci, 2, list, "ColumnIndex.min_values")
    maxs = _typed(ci, 3, list, "ColumnIndex.max_values")
    order = _typed(ci, 4, int, "ColumnIndex.boundary_order")
    null_counts = _typed(ci, 5, list, "ColumnIndex.null_counts")
    locs = _typed(oi, 1, list, "OffsetIndex.page_locations")
    if None in (null_pages, mins, maxs, order) or not locs:
        raise ValueError("page index missing required lists")
    if null_counts is None:
        raise ValueError("ColumnIndex lacks null_counts")
    n = len(locs)
    if not (len(null_pages) == len(mins) == len(maxs)
            == len(null_counts) == n):
        raise ValueError(
            f"page index list lengths disagree: {len(null_pages)}/"
            f"{len(mins)}/{len(maxs)}/{len(null_counts)} vs {n} pages"
        )
    if order not in _BOUNDARY_ORDERS:
        raise ValueError(f"unknown boundary_order {order}")

    pages = []
    prev_end = 0
    prev_row = -1
    for i, loc in enumerate(locs):
        if not isinstance(loc, dict):
            raise ValueError("PageLocation is not a struct")
        off = _typed(loc, 1, int, "PageLocation.offset")
        csize = _typed(loc, 2, int, "PageLocation.compressed_page_size")
        frow = _typed(loc, 3, int, "PageLocation.first_row_index")
        if None in (off, csize, frow):
            raise ValueError("PageLocation missing a required field")
        if csize <= 0 or off < 0 or off + csize > len(b):
            raise ValueError("page region out of file bounds")
        if off < prev_end:
            raise ValueError("page regions overlap or go backwards")
        prev_end = off + csize
        if i == 0 and frow != 0:
            raise ValueError("first page does not start at row 0")
        if frow <= prev_row:
            raise ValueError("first_row_index not strictly increasing")
        prev_row = frow
        np_ = null_pages[i]
        if not isinstance(np_, bool):
            raise ValueError("null_pages member is not a bool")
        nc = null_counts[i]
        if not isinstance(nc, int) or isinstance(nc, bool) or nc < 0:
            raise ValueError("null_counts member is not a non-negative int")
        pages.append({"offset": off, "compressed_size": csize,
                      "first_row": frow, "null_page": np_,
                      "null_count": nc, "min_raw": mins[i],
                      "max_raw": maxs[i]})
    return {"pages": pages, "boundary_order": order}


def verify_page_index(b: bytes, column: str, kind: str,
                      values: list) -> dict:
    """The audit core: slice the column's actual values (read back by
    pyarrow, in file row order) along the OffsetIndex's page
    boundaries and hold every ColumnIndex claim to them."""
    idx = read_page_index(b, column)
    pages = idx["pages"]
    n_rows = len(values)
    if pages[-1]["first_row"] >= n_rows:
        raise ValueError("last page starts past the end of the data")
    null_total = 0
    mins: list = []
    maxs: list = []
    for i, pg in enumerate(pages):
        lo = pg["first_row"]
        hi = pages[i + 1]["first_row"] if i + 1 < len(pages) else n_rows
        sl = values[lo:hi]
        present = [v for v in sl if v is not None]
        if len(sl) - len(present) != pg["null_count"]:
            raise ValueError(
                f"page {i}: declared null_count {pg['null_count']} != "
                f"actual {len(sl) - len(present)}"
            )
        null_total += pg["null_count"]
        if pg["null_page"]:
            if present:
                raise ValueError(
                    f"page {i} claims all-null but has values"
                )
            continue
        if not present:
            raise ValueError(
                f"page {i} has no values but is not marked a null page"
            )
        mn = _decode_plain(pg["min_raw"], kind)
        mx = _decode_plain(pg["max_raw"], kind)
        if mn != min(present) or mx != max(present):
            raise ValueError(
                f"page {i}: declared bounds [{mn}, {mx}] != actual "
                f"[{min(present)}, {max(present)}]"
            )
        mins.append(mn)
        maxs.append(mx)
    order = idx["boundary_order"]
    if order == 1 and (mins != sorted(mins) or maxs != sorted(maxs)):
        raise ValueError("ASCENDING boundary_order does not hold")
    if order == 2 and (mins != sorted(mins, reverse=True)
                       or maxs != sorted(maxs, reverse=True)):
        raise ValueError("DESCENDING boundary_order does not hold")
    return {
        "n_pages": len(pages),
        "num_rows": n_rows,
        "null_count": null_total,
        "min_val": min(mins) if mins else None,
        "max_val": max(maxs) if maxs else None,
        "boundary_order": _BOUNDARY_ORDERS[order],
    }


try:  # vectorized verification; the pure loop stays as the reference
    import numpy as _np
except ImportError:  # pragma: no cover - numpy ships in the container
    _np = None


def verify_page_index_np(b: bytes, column: str, kind: str,
                         vals_np, nulls_np) -> dict:
    """Vectorized twin of :func:`verify_page_index` (round-13): the
    same structural walk (shared ``read_page_index``) and the same
    per-page claims, with each page's null-count/min/max reduced by
    numpy over ``vals_np`` (nulls filled with 0) + ``nulls_np`` (bool
    mask) instead of a python loop per value. Equality-tested against
    the pure form over the fixture zoo; at sf1 the pure loop is the
    full audit's dominant cost."""
    idx = read_page_index(b, column)
    pages = idx["pages"]
    n_rows = int(vals_np.shape[0])
    if pages[-1]["first_row"] >= n_rows:
        raise ValueError("last page starts past the end of the data")
    null_total = 0
    mins: list = []
    maxs: list = []
    bounds = [pg["first_row"] for pg in pages] + [n_rows]
    for i, pg in enumerate(pages):
        lo, hi = bounds[i], bounds[i + 1]
        n_null = int(nulls_np[lo:hi].sum())
        n_present = (hi - lo) - n_null
        if n_null != pg["null_count"]:
            raise ValueError(
                f"page {i}: declared null_count {pg['null_count']} != "
                f"actual {n_null}"
            )
        null_total += pg["null_count"]
        if pg["null_page"]:
            if n_present:
                raise ValueError(
                    f"page {i} claims all-null but has values"
                )
            continue
        if not n_present:
            raise ValueError(
                f"page {i} has no values but is not marked a null page"
            )
        mn = _decode_plain(pg["min_raw"], kind)
        mx = _decode_plain(pg["max_raw"], kind)
        sl = vals_np[lo:hi]
        if n_null:
            sl = sl[~nulls_np[lo:hi]]
        mn_act = sl.min().item()
        mx_act = sl.max().item()
        if mn != mn_act or mx != mx_act:
            raise ValueError(
                f"page {i}: declared bounds [{mn}, {mx}] != actual "
                f"[{mn_act}, {mx_act}]"
            )
        mins.append(mn)
        maxs.append(mx)
    order = idx["boundary_order"]
    if order == 1 and (mins != sorted(mins) or maxs != sorted(maxs)):
        raise ValueError("ASCENDING boundary_order does not hold")
    if order == 2 and (mins != sorted(mins, reverse=True)
                       or maxs != sorted(maxs, reverse=True)):
        raise ValueError("DESCENDING boundary_order does not hold")
    return {
        "n_pages": len(pages),
        "num_rows": n_rows,
        "null_count": null_total,
        "min_val": min(mins) if mins else None,
        "max_val": max(maxs) if maxs else None,
        "boundary_order": _BOUNDARY_ORDERS[order],
    }


def column_as_numpy(col):
    """pyarrow column -> (values int64/float64 with nulls filled as 0,
    null bool mask) — exact (no int->float widening on nullable int
    columns, the ``to_numpy`` trap)."""
    arr = col.combine_chunks() if hasattr(col, "combine_chunks") else col
    nulls = _np.asarray(arr.is_null())
    vals = _np.asarray(arr.fill_null(0))
    return vals, nulls


PAGEINDEX_REPORT_SCHEMA = (
    "tbl string, col string, n_pages int, num_rows long, null_count long, "
    "min_micro long, max_micro long"
)


def pageindex_column_stats(df, *, micro: int = 1_000_000,
                           row_limit: int = 500,
                           id_cols: tuple = (),
                           max_files_per_table: int | None = None,
                           sample_key_col: str = "path",
                           sample_epoch: int = 0):
    """(tbl, col, kind, path) rows -> one audit row each, every number
    derived from the INDEX (page count, summed null_counts, aggregated
    page bounds in the house micro units) after verify_page_index has
    held each page's claims to the pyarrow-read data.

    ``max_files_per_table`` is the SAMPLED-audit knob (round-12
    verdict): keep only the deterministic md5-ranked file subset per
    table (operators/estate_sampling.py) before any file is opened —
    the production estate's bounded audit. ``id_cols`` passes manifest
    identity columns (each a ``"name type"`` DDL string, e.g.
    ``"shard int"``) through to the report 1:1."""
    import pandas as pd

    if max_files_per_table is not None:
        from .estate_sampling import sample_audit_manifest

        df = sample_audit_manifest(
            df, max_files_per_table=max_files_per_table,
            key_col=sample_key_col, epoch=sample_epoch,
        )
    id_names = tuple(c.split()[0] for c in id_cols)

    def kernel(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            out = {k: [] for k in ("tbl", "col", "n_pages", "num_rows",
                                   "null_count", "min_micro", "max_micro")}
            for n_ in id_names:
                out[n_] = []
            for j, (tbl, col, kind, path) in enumerate(
                zip(pdf["tbl"], pdf["col"], pdf["kind"], pdf["path"])
            ):
                for n_ in id_names:
                    out[n_].append(pdf[n_].iloc[j])
                with open(path, "rb") as f:
                    b = f.read()
                col_arr = pq.read_table(path, columns=[col])[col]
                if len(col_arr) == 0:
                    # an EMPTY file has no pages and no page index:
                    # report zero pages with NULL bounds — exactly what
                    # ceil(0/limit) and min()/max() over no rows produce
                    out["tbl"].append(tbl)
                    out["col"].append(col)
                    out["n_pages"].append(0)
                    out["num_rows"].append(0)
                    out["null_count"].append(0)
                    out["min_micro"].append(None)
                    out["max_micro"].append(None)
                    continue
                if _np is not None:
                    vals_np, nulls_np = column_as_numpy(col_arr)
                    r = verify_page_index_np(b, col, kind,
                                             vals_np, nulls_np)
                else:  # pragma: no cover - numpy ships here
                    r = verify_page_index(b, col, kind,
                                          col_arr.to_pylist())
                if r["n_pages"] != -(-r["num_rows"] // row_limit):
                    raise ValueError(
                        f"{tbl}.{col}: {r['n_pages']} pages for "
                        f"{r['num_rows']} rows at limit {row_limit}"
                    )
                if r["min_val"] is None:
                    # non-empty file, all-null column: pages carry no
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
                out["n_pages"].append(r["n_pages"])
                out["num_rows"].append(r["num_rows"])
                out["null_count"].append(r["null_count"])
                out["min_micro"].append(mn_u)
                out["max_micro"].append(mx_u)
            yield pd.DataFrame(out)

    schema = PAGEINDEX_REPORT_SCHEMA
    if id_cols:
        schema += ", " + ", ".join(id_cols)
    return df.select("tbl", "col", "kind", "path", *id_names).mapInPandas(
        kernel, schema
    )
