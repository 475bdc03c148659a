"""WebDataset-style tar sharding — the de-facto container format for
multimodal training data: a shard is a POSIX tar whose members pair up
by basename stem ({stem}.jpg + {stem}.txt + ...), samples are read in
tar order for sequential I/O, and a corpus is just a directory of
shards. Stdlib ``tarfile`` reads/writes it, so the full path — shard
demux, stem grouping, per-sample image decode + caption — runs here
with no external deps and sits under a DuckDB oracle hash
(queries/ext_multimodal.py:webdataset_samples_report).

Scale note: shards are the unit of parallelism (one blob = one shard =
hundreds of samples read sequentially), exactly how the format is used
on clusters; the kernel is a pure per-shard scan-map.

Reference parity note: the reference repo has no multimodal layer
(SURVEY.md section 4); this belongs to the training-data pillar.
"""

from __future__ import annotations

import io
import tarfile

__all__ = ["read_webdataset_shard", "write_webdataset_shard"]


def write_webdataset_shard(samples: list[dict]) -> bytes:
    """[{key: str, extension: payload-bytes, ...}] -> a tar shard with
    one member per (key, extension), in sample order — the WebDataset
    layout ({key}.{ext})."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for s in samples:
            key = s["key"]
            for ext, payload in s.items():
                if ext == "key":
                    continue
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(payload)
                tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def read_webdataset_shard(b: bytes) -> list[dict]:
    """Tar shard -> [{key, <ext>: bytes, ...}] grouped by basename stem
    in first-appearance order. Non-regular members are skipped; a
    member without an extension or an empty shard raises ValueError
    (a shard of unpaired junk should fail loudly, not yield zero
    samples silently)."""
    try:
        tf = tarfile.open(fileobj=io.BytesIO(b), mode="r")
    except tarfile.TarError as e:
        raise ValueError(f"not a tar shard ({e})") from e
    samples: dict[str, dict] = {}
    order: list[str] = []
    with tf:
        for m in tf:
            if not m.isreg():
                continue
            name = m.name.rsplit("/", 1)[-1]
            if "." not in name:
                raise ValueError(
                    f"webdataset member {m.name!r} has no extension"
                )
            stem, ext = name.rsplit(".", 1)
            payload = tf.extractfile(m).read()
            if stem not in samples:
                samples[stem] = {"key": stem}
                order.append(stem)
            samples[stem][ext] = payload
    if not order:
        raise ValueError("empty webdataset shard")
    return [samples[k] for k in order]
