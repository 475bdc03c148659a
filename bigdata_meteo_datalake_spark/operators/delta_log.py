"""Delta Lake ``_delta_log`` snapshot reconstruction — the lakehouse
table-audit operator next to parquet_footer/compaction_plan, from the
PUBLIC Delta transaction-log protocol (delta.io PROTOCOL.md):

1. Commit files ``<version>.json`` (20-digit zero-padded) hold one
   JSON action per line: ``add`` (path, partitionValues, size,
   dataChange, optional stats), ``remove`` (tombstone), ``metaData``
   (schemaString, partitionColumns), ``protocol`` (minReader/Writer
   versions), ``commitInfo``/``txn`` (provenance, replay-neutral).
   An action object carries exactly ONE action key; unknown actions,
   missing required fields, and mistyped values raise.

2. ``_last_checkpoint`` points at ``<version>.checkpoint.parquet``,
   a parquet file of the same actions as nullable struct columns
   (read via pyarrow — exactly how Spark itself loads checkpoints).
   Replay starts from the checkpoint state and applies only commits
   AFTER it, so a log whose pre-checkpoint JSON was cleaned (the
   normal retention behavior) still reconstructs; the pointer's
   ``size`` must match the checkpoint's action count, and the
   checkpoint must carry metaData+protocol.

3. Snapshot semantics: versions must be CONTIGUOUS from the replay
   start to the table version (a gap means an unreadable table —
   raise); per path the LAST add/remove wins; the live set is
   adds-minus-tombstones; metaData/protocol are the latest seen and
   must exist by replay end. minReaderVersion above 3 raises
   NotImplementedError (deletion vectors / v2 checkpoints are a
   declared boundary).

Reference parity note: the reference repo has no lakehouse layer
(SURVEY.md section 4); this belongs to the table-services pillar
alongside compaction_plan and zone_map_prune_report.
"""

from __future__ import annotations

import json
import re

__all__ = [
    "build_delta_log",
    "parse_delta_snapshot",
]

_COMMIT_RE = re.compile(r"^(\d{20})\.json$")
_CKPT_RE = re.compile(r"^(\d{20})\.checkpoint\.parquet$")
_ACTION_KEYS = ("add", "remove", "metaData", "protocol", "commitInfo", "txn")
_MAX_READER_VERSION = 3


def _require(cond: bool, msg: str) -> None:
    if not cond:
        raise ValueError(msg)


def _norm_partition_values(pv) -> dict:
    """partitionValues arrives as a JSON object (commits), a pyarrow
    struct dict, or a pyarrow map's list of (k, v) pairs (checkpoints
    written with MAP types) — normalize to a plain dict."""
    if pv is None:
        return {}
    if isinstance(pv, dict):
        items = pv.items()
    elif isinstance(pv, list):
        items = pv
    else:
        raise ValueError(f"partitionValues has type {type(pv).__name__}")
    out = {}
    for item in items:
        if not isinstance(item, (list, tuple)) or len(item) != 2:
            raise ValueError("malformed partitionValues entry")
        k, v = item
        _require(isinstance(k, str), "partitionValues key is not a string")
        _require(v is None or isinstance(v, str),
                 "partitionValues value is not a string")
        out[k] = v
    return out


class _State:
    def __init__(self) -> None:
        self.live: dict[str, dict] = {}
        self.tombstones: set[str] = set()
        self.meta: dict | None = None
        self.protocol: dict | None = None
        self.n_commits = 0

    def apply(self, action: dict, where: str) -> None:
        _require(isinstance(action, dict), f"{where}: action is not an object")
        keys = [k for k in action if action.get(k) is not None]
        known = [k for k in keys if k in _ACTION_KEYS]
        _require(len(known) == 1,
                 f"{where}: action must carry exactly one of "
                 f"{_ACTION_KEYS}, got {sorted(keys)}")
        kind = known[0]
        body = action[kind]
        _require(isinstance(body, dict), f"{where}: {kind} is not an object")
        if kind == "add":
            path = body.get("path")
            _require(isinstance(path, str) and path, f"{where}: add without a path")
            size = body.get("size")
            _require(isinstance(size, int) and not isinstance(size, bool)
                     and size >= 0, f"{where}: add {path!r} size {size!r}")
            _require(isinstance(body.get("dataChange"), bool),
                     f"{where}: add {path!r} without a boolean dataChange")
            stats = body.get("stats")
            num_records = None
            if stats is not None:
                _require(isinstance(stats, str), f"{where}: stats must be a JSON string")
                try:
                    parsed = json.loads(stats)
                except json.JSONDecodeError as exc:
                    raise ValueError(f"{where}: invalid stats JSON: {exc}") from exc
                nr = parsed.get("numRecords") if isinstance(parsed, dict) else None
                if nr is not None:
                    _require(isinstance(nr, int) and not isinstance(nr, bool)
                             and nr >= 0, f"{where}: numRecords {nr!r}")
                    num_records = nr
            self.live[path] = {
                "size": size,
                "partition_values": _norm_partition_values(
                    body.get("partitionValues")),
                "num_records": num_records,
            }
            self.tombstones.discard(path)
        elif kind == "remove":
            path = body.get("path")
            _require(isinstance(path, str) and path,
                     f"{where}: remove without a path")
            self.live.pop(path, None)
            self.tombstones.add(path)
        elif kind == "metaData":
            ss = body.get("schemaString")
            _require(isinstance(ss, str), f"{where}: metaData without schemaString")
            try:
                schema = json.loads(ss)
            except json.JSONDecodeError as exc:
                raise ValueError(f"{where}: invalid schemaString: {exc}") from exc
            fields = schema.get("fields") if isinstance(schema, dict) else None
            _require(isinstance(fields, list),
                     f"{where}: schemaString carries no fields list")
            pcols = body.get("partitionColumns", [])
            _require(isinstance(pcols, list)
                     and all(isinstance(c, str) for c in pcols),
                     f"{where}: partitionColumns must be a string list")
            self.meta = {"n_fields": len(fields), "partition_columns": pcols}
        elif kind == "protocol":
            mr = body.get("minReaderVersion")
            _require(isinstance(mr, int) and not isinstance(mr, bool) and mr >= 1,
                     f"{where}: protocol minReaderVersion {mr!r}")
            if mr > _MAX_READER_VERSION:
                raise NotImplementedError(
                    f"reader protocol version {mr} (deletion vectors / v2 "
                    "checkpoint features) is a declared boundary"
                )
            mw = body.get("minWriterVersion", 1)
            _require(isinstance(mw, int) and not isinstance(mw, bool) and mw >= 1,
                     f"{where}: protocol minWriterVersion {mw!r}")
            self.protocol = {"min_reader": mr, "min_writer": mw}
        # commitInfo / txn are provenance: validated as objects, replay-neutral


def _checkpoint_actions(data: bytes, where: str) -> list[dict]:
    import io

    try:
        import pyarrow.parquet as pq
    except ImportError as exc:  # pragma: no cover — pyarrow is baked in
        raise NotImplementedError(
            "checkpoint parquet needs pyarrow in this environment"
        ) from exc
    try:
        table = pq.read_table(io.BytesIO(data))
    except Exception as exc:  # pyarrow's failure zoo -> the contract type
        raise ValueError(f"{where}: unreadable checkpoint parquet: {exc}") from exc
    rows = table.to_pylist()
    actions = []
    for row in rows:
        action = {k: v for k, v in row.items() if k in _ACTION_KEYS
                  and v is not None}
        _require(len(action) == 1,
                 f"{where}: checkpoint row carries {sorted(action)} actions")
        actions.append(action)
    return actions


def parse_delta_snapshot(files: dict[str, bytes]) -> dict:
    """``_delta_log`` directory contents (name -> bytes) -> the table
    snapshot: version, live-file set with byte/row totals, partition
    spread, latest protocol + schema facts, and whether a checkpoint
    seeded the replay."""
    _require(isinstance(files, dict) and files, "empty _delta_log")
    commits: dict[int, bytes] = {}
    checkpoints: dict[int, bytes] = {}
    last_checkpoint = None
    for name, data in files.items():
        _require(isinstance(name, str), "non-string log file name")
        _require(isinstance(data, (bytes, bytearray)),
                 f"{name}: log payload is not bytes")
        m = _COMMIT_RE.match(name)
        if m:
            commits[int(m.group(1))] = bytes(data)
            continue
        m = _CKPT_RE.match(name)
        if m:
            checkpoints[int(m.group(1))] = bytes(data)
            continue
        if name == "_last_checkpoint":
            try:
                last_checkpoint = json.loads(data.decode("utf-8"))
            except (UnicodeDecodeError, json.JSONDecodeError) as exc:
                raise ValueError(f"invalid _last_checkpoint: {exc}") from exc
            _require(isinstance(last_checkpoint, dict),
                     "_last_checkpoint is not an object")
            continue
        if name.endswith(".crc"):  # per-commit checksum sidecars: tolerated
            continue
        raise ValueError(f"unrecognized _delta_log member {name!r}")

    state = _State()
    used_checkpoint = False
    if last_checkpoint is not None:
        v = last_checkpoint.get("version")
        _require(isinstance(v, int) and not isinstance(v, bool) and v >= 0,
                 f"_last_checkpoint version {v!r}")
        _require(v in checkpoints,
                 f"_last_checkpoint points at missing version {v}")
        actions = _checkpoint_actions(checkpoints[v],
                                      f"checkpoint {v}")
        size = last_checkpoint.get("size")
        if size is not None:
            _require(isinstance(size, int) and not isinstance(size, bool)
                     and size == len(actions),
                     f"_last_checkpoint size {size} != {len(actions)} actions")
        for a in actions:
            state.apply(a, f"checkpoint {v}")
        _require(state.meta is not None and state.protocol is not None,
                 f"checkpoint {v} missing metaData/protocol")
        start = v + 1
        used_checkpoint = True
    else:
        _require(not checkpoints,
                 "checkpoint parquet present without _last_checkpoint")
        _require(0 in commits, "log starts after version 0 with no checkpoint")
        start = 0

    tail = sorted(ver for ver in commits if ver >= start)
    if used_checkpoint:
        version = start - 1  # a checkpoint alone is a complete snapshot
    else:
        _require(bool(tail), "no commits to replay")
        version = -1
    expected = start
    for ver in tail:
        _require(ver == expected,
                 f"commit versions jump from {expected - 1} to {ver}")
        expected += 1
        version = ver
        try:
            text = commits[ver].decode("utf-8")
        except UnicodeDecodeError as exc:
            raise ValueError(f"commit {ver} is not UTF-8: {exc}") from exc
        lines = [ln for ln in text.split("\n") if ln.strip()]
        _require(bool(lines), f"commit {ver} carries no actions")
        for i, ln in enumerate(lines):
            try:
                action = json.loads(ln)
            except json.JSONDecodeError as exc:
                raise ValueError(
                    f"commit {ver} line {i + 1}: invalid JSON: {exc}"
                ) from exc
            state.apply(action, f"commit {ver} line {i + 1}")
        state.n_commits += 1

    _require(state.meta is not None, "snapshot has no metaData action")
    _require(state.protocol is not None, "snapshot has no protocol action")
    live = state.live
    nr = [f["num_records"] for f in live.values()]
    return {
        "version": version,
        "n_commits_replayed": state.n_commits,
        "used_checkpoint": used_checkpoint,
        "n_live_files": len(live),
        "live_bytes": sum(f["size"] for f in live.values()),
        "live_rows": sum(x for x in nr if x is not None) if any(
            x is not None for x in nr) else None,
        "n_partitions": len({
            tuple(sorted(f["partition_values"].items()))
            for f in live.values()
        }),
        "live_paths": sorted(live),
        "n_tombstones": len(state.tombstones),
        "min_reader": state.protocol["min_reader"],
        "min_writer": state.protocol["min_writer"],
        "n_schema_fields": state.meta["n_fields"],
        "partition_columns": state.meta["partition_columns"],
    }


# --- fixture writer -------------------------------------------------------------------

_SCHEMA_STRING = json.dumps({
    "type": "struct",
    "fields": [
        {"name": "id", "type": "long", "nullable": False, "metadata": {}},
        {"name": "ds", "type": "string", "nullable": False, "metadata": {}},
        {"name": "v", "type": "double", "nullable": True, "metadata": {}},
    ],
})


def _fx_size(doc_id: int, v: int) -> int:
    return 100 * (v + 1) + doc_id


def _fx_ds(v: int) -> str:
    return f"2024-01-0{1 + v % 3}"


def _fx_rows(doc_id: int, v: int) -> int:
    return 10 + v + doc_id % 7


def _fx_add(doc_id: int, v: int) -> dict:
    return {
        "path": f"f{v}.parquet",
        "partitionValues": {"ds": _fx_ds(v)},
        "size": _fx_size(doc_id, v),
        "modificationTime": 1704067200000 + v,
        "dataChange": True,
        "stats": json.dumps({"numRecords": _fx_rows(doc_id, v)}),
    }


def build_delta_log(doc_id: int) -> dict[str, bytes]:
    """Deterministic ``_delta_log`` history for one synthetic table:
    1 + doc_id % 4 versions; version 0 carries protocol + metaData +
    the first add, each later version v adds ``f{v}.parquet`` (size
    100*(v+1)+doc_id, partition ds cycling 3 days, numRecords stats)
    and from v >= 2 removes ``f{v-2}.parquet`` — so the live set is
    the last two files (one for single-version tables). Tables with
    doc_id % 3 == 2 and >= 3 versions are CHECKPOINTED at version 1
    with the pre-checkpoint JSON cleaned (the retention behavior),
    making the parquet-checkpoint branch load-bearing — closed forms
    queries/ext_formats.py:delta_log_snapshot recomputes."""
    n_versions = 1 + doc_id % 4
    files: dict[str, bytes] = {}
    protocol = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
    meta = {"metaData": {
        "id": f"tbl-{doc_id}",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": _SCHEMA_STRING,
        "partitionColumns": ["ds"],
        "configuration": {},
        "createdTime": 1704067200000,
    }}
    for v in range(n_versions):
        actions = []
        if v == 0:
            actions += [protocol, meta]
        actions.append({"commitInfo": {"operation": "WRITE",
                                       "timestamp": 1704067200000 + v}})
        actions.append({"add": _fx_add(doc_id, v)})
        if v >= 2:
            actions.append({"remove": {
                "path": f"f{v - 2}.parquet",
                "deletionTimestamp": 1704067200000 + v,
                "dataChange": True,
            }})
        files[f"{v:020d}.json"] = "\n".join(
            json.dumps(a) for a in actions).encode()

    if doc_id % 3 == 2 and n_versions >= 3:
        ckpt_v = 1
        rows = []
        # the checkpoint's metaData drops the empty format.options /
        # configuration objects: real checkpoints store them as MAP
        # columns, but pyarrow's pylist inference would type an
        # always-empty dict as a zero-field struct, which parquet
        # cannot write — and the snapshot facts don't consume them
        ckpt_meta = {k: meta["metaData"][k]
                     for k in ("id", "schemaString", "partitionColumns",
                               "createdTime")}
        for kind, body in (
            ("protocol", protocol["protocol"]),
            ("metaData", ckpt_meta),
            ("add", _fx_add(doc_id, 0)),
            ("add", _fx_add(doc_id, 1)),
        ):
            rows.append({k: (body if k == kind else None)
                         for k in ("add", "remove", "metaData", "protocol")})
        files[f"{ckpt_v:020d}.checkpoint.parquet"] = _write_checkpoint(rows)
        files["_last_checkpoint"] = json.dumps(
            {"version": ckpt_v, "size": len(rows)}).encode()
        for v in range(ckpt_v + 1):
            del files[f"{v:020d}.json"]
    return files


def _write_checkpoint(rows: list[dict]) -> bytes:
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    buf = io.BytesIO()
    pq.write_table(pa.Table.from_pylist(rows), buf)
    return buf.getvalue()


# --- Spark kernels (mapInPandas, the codec plan shape) --------------------------------


def _pack_dir(files: dict[str, bytes]) -> bytes:
    """Directory-as-blob transport envelope (deterministic stored zip,
    epoch timestamps) — test plumbing standing in for the object-store
    directory listing a real run would fan out over."""
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, mode="w") as zf:
        for name in sorted(files):
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zf.writestr(info, files[name])
    return buf.getvalue()


def _unpack_dir(b: bytes) -> dict[str, bytes]:
    import io
    import zipfile
    import zlib

    try:
        with zipfile.ZipFile(io.BytesIO(b)) as zf:
            return {i.filename: zf.read(i) for i in zf.infolist()}
    except (zipfile.BadZipFile, RuntimeError, EOFError, IndexError, OSError,
            zlib.error) as exc:
        raise ValueError(f"corrupt _delta_log envelope: {exc}") from exc


def synthesize_delta_logs(df):
    """Deterministic source: per ``doc_id`` one table's packed
    ``_delta_log`` (build_delta_log)."""
    import pandas as pd

    from ..sources.lake import widen

    def kernel(batches):
        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                out["doc_id"].append(did)
                out["blob"].append(_pack_dir(build_delta_log(did)))
            yield pd.DataFrame(out)

    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


DELTA_REPORT_SCHEMA = (
    "doc_id long, table_version int, n_live_files int, live_bytes long, "
    "live_rows long, n_partitions int, min_reader int, n_schema_fields int, "
    "used_checkpoint boolean, live_path_cat string"
)


def delta_snapshot_features(df):
    """Log replay -> one snapshot row per table."""
    import pandas as pd

    def kernel(batches):
        cols = ("doc_id", "table_version", "n_live_files", "live_bytes",
                "live_rows", "n_partitions", "min_reader", "n_schema_fields",
                "used_checkpoint", "live_path_cat")
        for pdf in batches:
            out = {k: [] for k in cols}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                snap = parse_delta_snapshot(_unpack_dir(bytes(blob)))
                out["doc_id"].append(doc_id)
                out["table_version"].append(snap["version"])
                out["n_live_files"].append(snap["n_live_files"])
                out["live_bytes"].append(snap["live_bytes"])
                out["live_rows"].append(snap["live_rows"])
                out["n_partitions"].append(snap["n_partitions"])
                out["min_reader"].append(snap["min_reader"])
                out["n_schema_fields"].append(snap["n_schema_fields"])
                out["used_checkpoint"].append(snap["used_checkpoint"])
                out["live_path_cat"].append(",".join(snap["live_paths"]))
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(kernel, DELTA_REPORT_SCHEMA)
