"""Apache Iceberg table-metadata snapshot reconstruction — the third
lakehouse protocol next to the Delta log replay (delta_log.py) and the
parquet/ORC footer audits, from the PUBLIC Iceberg table spec
(iceberg.apache.org/spec, v1/v2):

- ``version-hint.text`` -> ``vN.metadata.json`` (the Hadoop-catalog
  current-version pointer), table metadata JSON with format-version,
  table-uuid, schemas / current-schema-id, partition-specs /
  default-spec-id, last-sequence-number, and the snapshots list;
- the current snapshot's MANIFEST LIST — a real Avro Object Container
  File (read by operators/avro_ocf.py:read_avro_ocf, so the whole
  Avro layer sits on this audit's hash path), one ``manifest_file``
  record per manifest with the spec's field names;
- each MANIFEST — another Avro OCF of ``manifest_entry`` records
  (status existing/added/deleted, nested ``data_file`` struct with the
  spec's record names r2/r102) whose per-manifest counts and row sums
  are RECONCILED against the manifest-list's declared
  added/existing/deleted accounting, the way a trustworthy reader must
  before believing scan-planning stats.

The live-file set is the union of non-deleted entries across the
current snapshot's data manifests; every declared length, sequence
number, and count is verified, and violations raise ValueError.

Reference parity note: the reference repo has no lakehouse layer
(SURVEY.md section 4); this extends the training-data pillar's estate
audits (delta_log_snapshot, parquet/orc footer reports).
"""

from __future__ import annotations

import json

from .avro_ocf import build_avro_ocf, read_avro_ocf
from .delta_log import _pack_dir, _unpack_dir

__all__ = [
    "MANIFEST_ENTRY_SCHEMA",
    "MANIFEST_FILE_SCHEMA",
    "build_iceberg_table",
    "parse_iceberg_snapshot",
]


def _require(cond: bool, msg: str) -> None:
    if not cond:
        raise ValueError(f"iceberg metadata: {msg}")


#: spec field set of a manifest-list record (v2 names)
MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "sequence_number", "type": "long"},
        {"name": "min_sequence_number", "type": "long"},
        {"name": "added_snapshot_id", "type": "long"},
        {"name": "added_files_count", "type": "int"},
        {"name": "existing_files_count", "type": "int"},
        {"name": "deleted_files_count", "type": "int"},
        {"name": "added_rows_count", "type": "long"},
        {"name": "existing_rows_count", "type": "long"},
        {"name": "deleted_rows_count", "type": "long"},
    ],
}

#: spec shape of a manifest entry; the nested record names r2 (data_file)
#: and r102 (partition) are the spec's own
MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {"name": "sequence_number", "type": ["null", "long"]},
        {"name": "file_sequence_number", "type": ["null", "long"]},
        {"name": "data_file", "type": {
            "type": "record", "name": "r2", "fields": [
                {"name": "content", "type": "int"},
                {"name": "file_path", "type": "string"},
                {"name": "file_format", "type": "string"},
                {"name": "partition", "type": {
                    "type": "record", "name": "r102",
                    "fields": [{"name": "p", "type": "int"}],
                }},
                {"name": "record_count", "type": "long"},
                {"name": "file_size_in_bytes", "type": "long"},
            ],
        }},
    ],
}

_LIST_FIELDS = tuple(f["name"] for f in MANIFEST_FILE_SCHEMA["fields"])
_ENTRY_FIELDS = tuple(f["name"] for f in MANIFEST_ENTRY_SCHEMA["fields"])
_FILE_FORMATS = {"PARQUET", "AVRO", "ORC"}


def _read_metadata(files: dict[str, bytes]) -> dict:
    _require("version-hint.text" in files,
             "version-hint.text missing (Hadoop-catalog pointer)")
    hint = files["version-hint.text"].decode("utf-8", "replace").strip()
    _require(hint.isdigit(), f"version hint {hint!r} is not an integer")
    name = f"v{int(hint)}.metadata.json"
    _require(name in files, f"hinted metadata file {name} missing")
    try:
        meta = json.loads(files[name].decode("utf-8"))
    except (UnicodeDecodeError, json.JSONDecodeError) as exc:
        raise ValueError(f"iceberg metadata: invalid {name}: {exc}") from exc
    _require(isinstance(meta, dict), f"{name} is not a JSON object")
    return meta


def _check_record_schema(ocf: dict, want_fields: tuple, where: str) -> None:
    schema = ocf["schema"]
    _require(schema["kind"] == "record",
             f"{where} schema is {schema['kind']}, not a record")
    got = tuple(n for n, _ in schema["fields"])
    _require(got == want_fields,
             f"{where} fields {got} != spec fields {want_fields}")


def parse_iceberg_snapshot(files: dict[str, bytes]) -> dict:
    """Table directory map -> current-snapshot facts, the full
    metadata->manifest-list->manifest chain verified."""
    meta = _read_metadata(files)
    fv = meta.get("format-version")
    _require(fv in (1, 2), f"format-version {fv!r} not in (1, 2)")
    _require(isinstance(meta.get("table-uuid"), str) and meta["table-uuid"],
             "table-uuid missing")

    # JSON gives no type guarantees: every id used as a dict key below
    # must be an int FIRST, or a crafted metadata file (list-valued ids,
    # non-object list members) escapes as TypeError/AttributeError
    # outside the fail-loud contract — the round-11 fuzz lesson.
    def _int_keyed(lst, key, what):
        _require(isinstance(lst, list) and lst, f"{what} list missing")
        out = {}
        for s in lst:
            _require(isinstance(s, dict), f"{what} member is not an object")
            sid = s.get(key)
            _require(isinstance(sid, int) and not isinstance(sid, bool),
                     f"{what} member {key} {sid!r} is not an integer")
            _require(sid not in out, f"duplicate {what} member {key} {sid}")
            out[sid] = s
        return out

    by_sid = _int_keyed(meta.get("schemas"), "schema-id", "schemas")
    cur_sid = meta.get("current-schema-id")
    _require(isinstance(cur_sid, int) and cur_sid in by_sid,
             "current-schema-id does not resolve")
    fields = by_sid[cur_sid].get("fields")
    _require(isinstance(fields, list) and fields,
             "current schema has no fields")

    by_spec = _int_keyed(meta.get("partition-specs"), "spec-id",
                         "partition-specs")
    def_sid = meta.get("default-spec-id")
    _require(isinstance(def_sid, int) and def_sid in by_spec,
             "default-spec-id does not resolve")
    spec_fields = by_spec[def_sid].get("fields")
    _require(isinstance(spec_fields, list), "partition spec has no fields")

    by_snap = _int_keyed(meta.get("snapshots"), "snapshot-id", "snapshots")
    snapshots = list(by_snap.values())
    cur_id = meta.get("current-snapshot-id")
    _require(isinstance(cur_id, int) and cur_id in by_snap,
             "current-snapshot-id does not resolve")
    cur = by_snap[cur_id]

    last_seq = meta.get("last-sequence-number")
    if fv == 2:
        _require(isinstance(last_seq, int),
                 "v2 requires last-sequence-number")
        for s in snapshots:
            sq = s.get("sequence-number")
            _require(isinstance(sq, int) and 0 <= sq <= last_seq,
                     f"snapshot sequence-number {sq!r} outside "
                     f"[0, {last_seq}]")
            summary = s.get("summary")
            _require(isinstance(summary, dict), "v2 snapshot without a "
                     "summary object")
            op = summary.get("operation")
            _require(isinstance(op, str) and op,
                     "v2 snapshot summary missing operation")
        _require(cur.get("sequence-number") == last_seq,
                 "current snapshot is not at last-sequence-number")

    ml_name = cur.get("manifest-list")
    _require(isinstance(ml_name, str) and ml_name in files,
             f"manifest-list {ml_name!r} missing from the table directory")
    mlist = read_avro_ocf(files[ml_name])
    _check_record_schema(mlist, _LIST_FIELDS, "manifest-list")

    n_live = 0
    live_rows = 0
    live_bytes = 0
    live_parts: set = set()
    live_paths: set = set()
    manifests = [r for blk in mlist["blocks"] for r in blk["records"]]
    _require(len(manifests) > 0, "current snapshot lists no manifests")
    for mf in manifests:
        path = mf["manifest_path"]
        _require(path in files, f"manifest {path!r} missing")
        _require(mf["manifest_length"] == len(files[path]),
                 f"manifest {path!r} declared {mf['manifest_length']} "
                 f"bytes, actual {len(files[path])}")
        _require(mf["content"] in (0, 1),
                 f"manifest content {mf['content']} not data(0)/deletes(1)")
        _require(mf["partition_spec_id"] in by_spec,
                 f"manifest partition_spec_id {mf['partition_spec_id']} "
                 "does not resolve")
        if fv == 2:
            _require(mf["min_sequence_number"] <= mf["sequence_number"]
                     <= last_seq,
                     "manifest sequence numbers out of order")
        man = read_avro_ocf(files[path])
        _check_record_schema(man, _ENTRY_FIELDS, f"manifest {path!r}")
        _require(man["meta"].get("content", b"data") == b"data",
                 f"manifest {path!r} OCF metadata content is not 'data'")
        entries = [r for blk in man["blocks"] for r in blk["records"]]
        counts = {0: 0, 1: 0, 2: 0}
        rows = {0: 0, 1: 0, 2: 0}
        for e in entries:
            st = e["status"]
            _require(st in (0, 1, 2),
                     f"entry status {st} not existing/added/deleted")
            df = e["data_file"]
            _require(df["content"] == 0,
                     f"data_file content {df['content']} is not data(0)")
            _require(df["file_format"] in _FILE_FORMATS,
                     f"file_format {df['file_format']!r} unknown")
            _require(df["record_count"] >= 0 and
                     df["file_size_in_bytes"] >= 0,
                     "negative record/byte count")
            if st == 1:
                _require(e["snapshot_id"] == mf["added_snapshot_id"],
                         "added entry's snapshot_id differs from the "
                         "manifest's added_snapshot_id")
            counts[st] += 1
            rows[st] += df["record_count"]
            if st != 2:
                _require(df["file_path"] not in live_paths,
                         f"file {df['file_path']!r} live twice")
                live_paths.add(df["file_path"])
                n_live += 1
                live_rows += df["record_count"]
                live_bytes += df["file_size_in_bytes"]
                live_parts.add(df["partition"]["p"])
        _require(counts == {0: mf["existing_files_count"],
                            1: mf["added_files_count"],
                            2: mf["deleted_files_count"]},
                 f"manifest {path!r} file counts {counts} disagree with "
                 "its manifest-list accounting")
        _require(rows == {0: mf["existing_rows_count"],
                          1: mf["added_rows_count"],
                          2: mf["deleted_rows_count"]},
                 f"manifest {path!r} row counts disagree with its "
                 "manifest-list accounting")

    return {
        "format_version": fv,
        "current_snapshot_id": cur_id,
        "n_snapshots": len(snapshots),
        "last_sequence_number": last_seq,
        "n_manifests": len(manifests),
        "n_live_files": n_live,
        "live_rows": live_rows,
        "live_bytes": live_bytes,
        "n_partitions": len(live_parts),
        "n_schema_fields": len(fields),
        "n_spec_fields": len(spec_fields),
    }


# --- deterministic fixture writer ------------------------------------------------------


def _fx_entry(doc_id: int, mi: int, j: int, snap_id: int, seq: int) -> dict:
    st = j % 3
    return {
        "status": st,
        "snapshot_id": snap_id,
        "sequence_number": None if st == 1 else seq,
        "file_sequence_number": None,
        "data_file": {
            "content": 0,
            "file_path": f"data/m{mi}-f{j}.parquet",
            "file_format": "PARQUET",
            "partition": {"p": (mi + j) % 3},
            "record_count": 10 + doc_id % 7 + mi + j,
            "file_size_in_bytes": 100 * (mi + 1) + doc_id % 100 + j,
        },
    }


def build_iceberg_table(doc_id: int) -> dict[str, bytes]:
    """One deterministic Iceberg v2 table directory per document:
    1 + doc_id % 3 snapshots; the current snapshot carries
    1 + (doc_id + i) % 2 manifests of 2 + (doc_id + mi) % 3 entries
    whose statuses cycle existing/added/deleted — every count a closed
    form queries/ext_formats.py:iceberg_snapshot_report's oracle
    recomputes. Manifest avro codec cycles null/deflate/snappy by
    doc_id % 3, so all three OCF codecs sit on this audit's hash path."""
    nv = 1 + doc_id % 3
    codec = ("null", "deflate", "snappy")[doc_id % 3]
    files: dict[str, bytes] = {}
    snapshots = []
    for i in range(nv):
        snap_id = 1000 + doc_id * 10 + i
        seq = i + 1
        nm = 1 + (doc_id + i) % 2
        mf_records = []
        for mi in range(nm):
            nf = 2 + (doc_id + mi) % 3
            entries = [_fx_entry(doc_id, mi, j, snap_id, seq)
                       for j in range(nf)]
            man_name = f"m-{snap_id}-{mi}.avro"
            man = build_avro_ocf(
                MANIFEST_ENTRY_SCHEMA, entries, codec=codec,
                records_per_block=2,
                meta_extra={"content": b"data",
                            "partition-spec-id": b"0",
                            "format-version": b"2"},
            )
            files[man_name] = man
            mf_records.append({
                "manifest_path": man_name,
                "manifest_length": len(man),
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": seq,
                "min_sequence_number": 1,
                "added_snapshot_id": snap_id,
                "added_files_count": sum(1 for j in range(nf) if j % 3 == 1),
                "existing_files_count": sum(1 for j in range(nf)
                                            if j % 3 == 0),
                "deleted_files_count": sum(1 for j in range(nf)
                                           if j % 3 == 2),
                "added_rows_count": sum(10 + doc_id % 7 + mi + j
                                        for j in range(nf) if j % 3 == 1),
                "existing_rows_count": sum(10 + doc_id % 7 + mi + j
                                           for j in range(nf) if j % 3 == 0),
                "deleted_rows_count": sum(10 + doc_id % 7 + mi + j
                                          for j in range(nf) if j % 3 == 2),
            })
        ml_name = f"snap-{snap_id}.avro"
        files[ml_name] = build_avro_ocf(
            MANIFEST_FILE_SCHEMA, mf_records, codec=codec,
            records_per_block=2,
            meta_extra={"snapshot-id": str(snap_id).encode(),
                        "sequence-number": str(seq).encode(),
                        "format-version": b"2"},
        )
        snapshots.append({
            "snapshot-id": snap_id,
            "sequence-number": seq,
            "timestamp-ms": 1700000000000 + i * 1000,
            "summary": {"operation": "append"},
            "manifest-list": ml_name,
            "schema-id": 0,
        })
    meta = {
        "format-version": 2,
        "table-uuid": f"00000000-0000-0000-0000-{doc_id:012d}",
        "location": f"file:///warehouse/t{doc_id}",
        "last-sequence-number": nv,
        "last-updated-ms": 1700000000000 + (nv - 1) * 1000,
        "last-column-id": 3,
        "schemas": [{
            "schema-id": 0, "type": "struct",
            "fields": [
                {"id": 1, "name": "p", "required": True, "type": "int"},
                {"id": 2, "name": "v", "required": False, "type": "long"},
                {"id": 3, "name": "s", "required": False, "type": "string"},
            ],
        }],
        "current-schema-id": 0,
        "partition-specs": [{
            "spec-id": 0,
            "fields": [{"name": "p", "transform": "identity",
                        "source-id": 1, "field-id": 1000}],
        }],
        "default-spec-id": 0,
        "snapshots": snapshots,
        "current-snapshot-id": snapshots[-1]["snapshot-id"],
        "snapshot-log": [{"snapshot-id": s["snapshot-id"],
                          "timestamp-ms": s["timestamp-ms"]}
                         for s in snapshots],
    }
    files[f"v{nv}.metadata.json"] = json.dumps(
        meta, sort_keys=True).encode()
    files["version-hint.text"] = str(nv).encode()
    return files


# --- Spark kernels (mapInPandas, the codec plan shape) --------------------------------


def synthesize_iceberg_tables(df):
    """Deterministic source: per ``doc_id`` one packed Iceberg table
    directory (build_iceberg_table)."""
    import pandas as pd

    from ..sources.lake import widen

    def kernel(batches):
        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                out["doc_id"].append(did)
                out["blob"].append(_pack_dir(build_iceberg_table(did)))
            yield pd.DataFrame(out)

    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


ICEBERG_REPORT_SCHEMA = (
    "doc_id long, format_version int, current_snapshot_id long, "
    "n_snapshots int, last_sequence_number bigint, n_manifests int, "
    "n_live_files int, live_rows long, live_bytes long, n_partitions int, "
    "n_schema_fields int, n_spec_fields int"
)


def iceberg_snapshot_features(df):
    """Metadata chain replay -> one snapshot-facts row per table."""
    import pandas as pd

    def kernel(batches):
        cols = ("doc_id", "format_version", "current_snapshot_id",
                "n_snapshots", "last_sequence_number", "n_manifests",
                "n_live_files", "live_rows", "live_bytes", "n_partitions",
                "n_schema_fields", "n_spec_fields")
        for pdf in batches:
            out = {k: [] for k in cols}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                snap = parse_iceberg_snapshot(_unpack_dir(bytes(blob)))
                out["doc_id"].append(doc_id)
                for k in cols[1:]:
                    out[k].append(snap[k])
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(
        kernel, ICEBERG_REPORT_SCHEMA
    )
