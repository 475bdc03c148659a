"""safetensors checkpoint inspection — the de-facto LLM weight format:
an 8-byte little-endian header length, a JSON header mapping tensor
names to {dtype, shape, data_offsets}, then the raw tensor bytes. The
format is deliberately parseable without executing anything (its whole
point vs pickle), so a stdlib probe covers the real operations a
weight-management pipeline needs: tensor inventory, parameter counts,
byte accounting, dtype histograms, and integrity validation.

Validation is strict: the declared byte span of every tensor must
equal elements x dtype-size, spans must lie inside the data section,
cover it EXACTLY (no gaps, no overlaps — the format's contract), and
the header must be valid JSON with only known dtypes. Anything else
raises ValueError — a checkpoint whose header lies about its bytes is
corrupt, not "approximately loadable".

The companion writer emits spec-shaped files for oracle fixtures
(queries/ext_multimodal.py:safetensors_report).

Reference parity note: the reference repo has no ML-artifact layer
(SURVEY.md section 4); this module belongs to the training-data
pillar.
"""

from __future__ import annotations

import json
import struct

__all__ = ["build_safetensors", "parse_safetensors"]

DTYPE_SIZES = {
    "F64": 8, "F32": 4, "F16": 2, "BF16": 2,
    "I64": 8, "I32": 4, "I16": 2, "I8": 1, "U8": 1, "BOOL": 1,
}


def build_safetensors(tensors: list[dict],
                      metadata: dict | None = None) -> bytes:
    """[{name, dtype, shape}] -> a safetensors file with zero-filled
    data, offsets packed contiguously in list order."""
    header: dict = {}
    if metadata:
        header["__metadata__"] = metadata
    off = 0
    blobs = []
    for t in tensors:
        n = 1
        for d in t["shape"]:
            n *= d
        size = n * DTYPE_SIZES[t["dtype"]]
        header[t["name"]] = {
            "dtype": t["dtype"],
            "shape": list(t["shape"]),
            "data_offsets": [off, off + size],
        }
        blobs.append(bytes(size))
        off += size
    hj = json.dumps(header, separators=(",", ":")).encode("utf-8")
    return struct.pack("<Q", len(hj)) + hj + b"".join(blobs)


def parse_safetensors(b: bytes) -> dict:
    """safetensors bytes -> {"metadata": dict, "tensors": [{name,
    dtype, shape, n_params, n_bytes}]} (tensors ordered by data
    offset) with the format contract enforced: valid JSON header,
    known dtypes, spans = elements x dtype-size, spans exactly tiling
    the data section."""
    if len(b) < 8:
        raise ValueError("truncated safetensors header length")
    (hlen,) = struct.unpack_from("<Q", b, 0)
    if 8 + hlen > len(b):
        raise ValueError("header length exceeds the file")
    try:
        header = json.loads(b[8 : 8 + hlen].decode("utf-8"))
    except (UnicodeDecodeError, json.JSONDecodeError) as e:
        raise ValueError(f"malformed safetensors header ({e})") from e
    if not isinstance(header, dict):
        raise ValueError("safetensors header is not a JSON object")
    metadata = header.pop("__metadata__", {}) or {}
    data_len = len(b) - 8 - hlen
    tensors = []
    for name, t in header.items():
        if not isinstance(t, dict):
            raise ValueError(f"tensor {name!r} entry is not an object")
        dtype = t.get("dtype")
        if dtype not in DTYPE_SIZES:
            raise ValueError(f"tensor {name!r} has unknown dtype {dtype!r}")
        shape = t.get("shape")
        if (not isinstance(shape, list)
                or any(not isinstance(d, int) or d < 0 for d in shape)):
            raise ValueError(f"tensor {name!r} has a bad shape {shape!r}")
        offs = t.get("data_offsets")
        if (not isinstance(offs, list) or len(offs) != 2
                or not all(isinstance(o, int) for o in offs)):
            raise ValueError(f"tensor {name!r} has bad data_offsets")
        start, end = offs
        n = 1
        for d in shape:
            n *= d
        if end - start != n * DTYPE_SIZES[dtype]:
            raise ValueError(
                f"tensor {name!r}: span {end - start} != "
                f"{n} elements x {DTYPE_SIZES[dtype]} bytes"
            )
        if not 0 <= start <= end <= data_len:
            raise ValueError(f"tensor {name!r} span outside the data section")
        tensors.append({"name": name, "dtype": dtype, "shape": shape,
                        "n_params": n, "n_bytes": end - start,
                        "_start": start, "_end": end})
    tensors.sort(key=lambda t: (t["_start"], t["_end"]))
    pos = 0
    for t in tensors:
        if t["_start"] != pos:
            raise ValueError(
                f"tensor {t['name']!r} starts at {t['_start']}, "
                f"expected {pos} (gap or overlap)"
            )
        pos = t["_end"]
    if pos != data_len:
        raise ValueError(
            f"data section is {data_len} bytes but tensors cover {pos}"
        )
    for t in tensors:
        del t["_start"], t["_end"]
    return {"metadata": metadata, "tensors": tensors}


# --- Spark kernels (mapInPandas, the codec plan shape) --------------------------------


def synthesize_safetensors_blobs(df):
    """Deterministic checkpoint source: per ``doc_id`` a safetensors
    file of 1 + doc_id % 3 tensors, tensor k named 't{k}' with dtype
    cycling F32/F16/I64 by (doc_id + k) % 3 and shape
    [2 + doc_id % 3, 1 + k] — closed forms
    queries/ext_multimodal.py:safetensors_report recomputes."""
    import pandas as pd

    from ..sources.lake import widen

    def kernel(batches):
        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                tensors = [
                    {"name": f"t{k}",
                     "dtype": ("F32", "F16", "I64")[(did + k) % 3],
                     "shape": [2 + did % 3, 1 + k]}
                    for k in range(1 + did % 3)
                ]
                out["doc_id"].append(did)
                out["blob"].append(build_safetensors(
                    tensors, metadata={"format": "pt"}))
            yield pd.DataFrame(out)

    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


SAFETENSORS_SCHEMA = (
    "doc_id long, name string, dtype string, n_params long, "
    "n_bytes long, n_tensors int"
)


def safetensors_features(df):
    """Checkpoint probe -> one row PER TENSOR: (doc_id, name, dtype,
    n_params, n_bytes, n_tensors) through the strict parser."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "name", "dtype", "n_params",
                                   "n_bytes", "n_tensors")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                r = parse_safetensors(bytes(blob))
                for t in r["tensors"]:
                    out["doc_id"].append(doc_id)
                    out["name"].append(t["name"])
                    out["dtype"].append(t["dtype"])
                    out["n_params"].append(t["n_params"])
                    out["n_bytes"].append(t["n_bytes"])
                    out["n_tensors"].append(len(r["tensors"]))
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(
        kernel, SAFETENSORS_SCHEMA
    )
