"""Apache Hudi timeline replay — the third lakehouse table protocol
next to the Delta log (delta_log.py) and Iceberg metadata
(iceberg_meta.py), from the PUBLIC Hudi spec (hudi.apache.org/docs —
timeline & file layout):

- the ``.hoodie/`` timeline holds one file per instant state:
  ``{ts}.commit.requested`` -> ``{ts}.commit.inflight`` ->
  ``{ts}.commit`` (completed), where ``ts`` is a 14-digit
  yyyyMMddHHmmss instant time. Only COMPLETED instants are visible to
  readers — an inflight/requested tail is exactly a concurrent writer
  mid-commit, and the snapshot must ignore it (the core MVCC property
  this audit pins);
- a completed commit's JSON metadata (HoodieCommitMetadata) maps
  partition paths to write-stat lists; each stat names the FILE GROUP
  (``fileId``) and the base file written for it, whose name embeds
  ``{fileId}_{writeToken}_{instantTime}.parquet`` — the reader
  cross-checks that embedding, because file-group resolution by
  filename is how Hudi readers pick base files without a manifest;
- copy-on-write snapshot semantics: per file group, the base file
  from the LATEST completed instant that wrote it; earlier versions
  are invisible (time-travel targets, cleaner candidates).

The reader enforces the full transition contract: a completed instant
must still carry its requested+inflight markers, instant times must
be well-formed and unique per action, write stats must be internally
consistent (a duplicate fileId within one commit+partition is
corruption), and non-commit actions are declared boundaries.

Reference parity note: the reference repo has no lakehouse layer
(SURVEY.md section 4); this completes the table-protocol trio in the
training-data pillar's estate audits.
"""

from __future__ import annotations

import json
import re

from .delta_log import _pack_dir, _unpack_dir

__all__ = [
    "build_hudi_timeline",
    "parse_hudi_snapshot",
]

_INSTANT_RE = re.compile(
    r"^\.hoodie/(\d{14})\.([a-z]+)(\.(requested|inflight))?$"
)
_SUPPORTED_ACTIONS = {"commit"}
_DECLARED_ACTIONS = {"deltacommit", "clean", "compaction", "rollback",
                     "replacecommit", "savepoint", "indexing"}


def _require(cond: bool, msg: str) -> None:
    if not cond:
        raise ValueError(f"hudi timeline: {msg}")


def parse_hudi_snapshot(files: dict[str, bytes]) -> dict:
    """Table directory map -> copy-on-write snapshot facts, the full
    instant-transition contract enforced."""
    instants: dict[tuple[str, str], set] = {}
    for name in files:
        if not name.startswith(".hoodie/"):
            continue
        m = _INSTANT_RE.match(name)
        _require(m is not None, f"unparseable timeline file {name!r}")
        ts, action, _, state = m.groups()
        if action in _DECLARED_ACTIONS:
            raise NotImplementedError(
                f"hudi action {action!r} is a declared boundary "
                "(copy-on-write commit timelines only)"
            )
        _require(action in _SUPPORTED_ACTIONS,
                 f"unknown hudi action {action!r}")
        instants.setdefault((ts, action), set()).add(state or "completed")

    _require(bool(instants), "no timeline instants")
    completed: list[str] = []
    pending = 0
    for (ts, _action), states in sorted(instants.items()):
        _require("requested" in states,
                 f"instant {ts} has no requested marker")
        _require("inflight" in states or "completed" in states,
                 f"instant {ts} never left the requested state")
        if "completed" in states:
            _require("inflight" in states,
                     f"instant {ts} completed without an inflight marker")
            completed.append(ts)
        else:
            pending += 1
    _require(bool(completed), "no completed instants")

    latest_by_group: dict[tuple[str, str], tuple[str, str, dict]] = {}
    total_writes = 0
    for ts in completed:
        raw = files[f".hoodie/{ts}.commit"]
        try:
            meta = json.loads(raw.decode("utf-8"))
        except (UnicodeDecodeError, json.JSONDecodeError) as exc:
            raise ValueError(
                f"hudi timeline: commit {ts} metadata is not JSON: {exc}"
            ) from exc
        _require(isinstance(meta, dict), f"commit {ts} is not an object")
        p2w = meta.get("partitionToWriteStats")
        _require(isinstance(p2w, dict) and p2w,
                 f"commit {ts} lacks partitionToWriteStats")
        seen_groups: set = set()
        for part, stats in p2w.items():
            _require(isinstance(part, str) and part,
                     f"commit {ts} has a non-string partition path")
            _require(isinstance(stats, list) and stats,
                     f"commit {ts} partition {part!r} has no write stats")
            for st in stats:
                _require(isinstance(st, dict),
                         f"commit {ts} write stat is not an object")
                fid = st.get("fileId")
                path = st.get("path")
                nw = st.get("numWrites")
                tb = st.get("totalWriteBytes")
                _require(isinstance(fid, str) and fid,
                         f"commit {ts} write stat without fileId")
                _require(isinstance(path, str) and path,
                         f"commit {ts} write stat without path")
                _require(isinstance(nw, int) and not isinstance(nw, bool)
                         and nw >= 0,
                         f"commit {ts} numWrites is not a count")
                _require(isinstance(tb, int) and not isinstance(tb, bool)
                         and tb >= 0,
                         f"commit {ts} totalWriteBytes is not a size")
                base = path.rsplit("/", 1)[-1]
                parts = base.rsplit(".", 1)[0].split("_")
                _require(len(parts) == 3 and parts[0] == fid
                         and parts[2] == ts,
                         f"base file {base!r} does not embed "
                         f"fileId {fid!r} and instant {ts}")
                key = (part, fid)
                _require(key not in seen_groups,
                         f"commit {ts} writes file group {fid!r} twice "
                         f"in partition {part!r}")
                seen_groups.add(key)
                total_writes += nw
                # Keyed by the (partitionPath, fileId) tuple, never a joined
                # string: real Hudi partition paths contain slashes
                # ('2024/01/01'), so any string split would miscount.
                latest_by_group[(part, fid)] = (ts, path, st)

    live_bytes = sum(st["totalWriteBytes"]
                     for _, _, st in latest_by_group.values())
    parts = {part for (part, _fid) in latest_by_group}
    return {
        "n_completed": len(completed),
        "latest_instant": completed[-1],
        "pending": pending > 0,
        "n_file_groups": len(latest_by_group),
        "live_bytes": live_bytes,
        "total_writes": total_writes,
        "n_partitions": len(parts),
        "live_paths": sorted(p for _, p, _ in latest_by_group.values()),
    }


# --- deterministic fixture writer ------------------------------------------------------


def _fx_ts(i: int) -> str:
    return f"20240101{i:02d}0000"


def build_hudi_timeline(doc_id: int) -> dict[str, bytes]:
    """One deterministic copy-on-write table per document:
    1 + doc_id % 3 completed commits (commit i writes file groups
    fg-0..fg-{(doc_id + i) % 2}), plus — on every third document — an
    INFLIGHT tail commit the snapshot must ignore; every count a
    closed form queries/ext_formats.py:hudi_timeline_report's oracle
    recomputes."""
    nc = 1 + doc_id % 3
    files: dict[str, bytes] = {}
    for i in range(nc):
        ts = _fx_ts(i)
        files[f".hoodie/{ts}.commit.requested"] = b""
        files[f".hoodie/{ts}.commit.inflight"] = b"{}"
        p2w: dict[str, list] = {}
        for m in range(1 + (doc_id + i) % 2):
            part = f"p={m % 2}"
            p2w.setdefault(part, []).append({
                "fileId": f"fg-{m}",
                "path": f"{part}/fg-{m}_0-0-0_{ts}.parquet",
                "numWrites": 10 + doc_id % 7 + i + m,
                "totalWriteBytes": 100 * (i + 1) + doc_id % 50 + m,
            })
        meta = {"partitionToWriteStats": p2w, "operation": "upsert"}
        files[f".hoodie/{ts}.commit"] = json.dumps(
            meta, sort_keys=True).encode()
    if doc_id % 3 == 0:
        ts = _fx_ts(nc)
        files[f".hoodie/{ts}.commit.requested"] = b""
        files[f".hoodie/{ts}.commit.inflight"] = b"{}"
    return files


# --- Spark kernels (mapInPandas, the codec plan shape) --------------------------------


def synthesize_hudi_timelines(df):
    """Deterministic source: per ``doc_id`` one packed Hudi table
    directory (build_hudi_timeline)."""
    import pandas as pd

    from ..sources.lake import widen

    def kernel(batches):
        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                out["doc_id"].append(did)
                out["blob"].append(_pack_dir(build_hudi_timeline(did)))
            yield pd.DataFrame(out)

    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


HUDI_REPORT_SCHEMA = (
    "doc_id long, n_completed int, latest_instant string, "
    "pending boolean, n_file_groups int, live_bytes long, "
    "total_writes long, n_partitions int"
)


def hudi_snapshot_features(df):
    """Timeline replay -> one copy-on-write snapshot row per table."""
    import pandas as pd

    def kernel(batches):
        cols = ("doc_id", "n_completed", "latest_instant", "pending",
                "n_file_groups", "live_bytes", "total_writes",
                "n_partitions")
        for pdf in batches:
            out = {k: [] for k in cols}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                snap = parse_hudi_snapshot(_unpack_dir(bytes(blob)))
                out["doc_id"].append(doc_id)
                for k in cols[1:]:
                    out[k].append(snap[k])
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(
        kernel, HUDI_REPORT_SCHEMA
    )
