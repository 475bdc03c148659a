"""Subtitle parsing (SRT + WebVTT) — where video-caption training pairs
come from: a video corpus's aligned text is shipped as .srt/.vtt cue
files, and the pipeline needs (start, end, text) triples per cue to cut
clips and align captions. Both formats are line-based and parse with
pure stdlib string handling; the kernels run as the usual per-blob
scan-map (queries/ext_multimodal.py:subtitle_cues_report).

Handled: SRT (numeric cue index, ``HH:MM:SS,mmm --> HH:MM:SS,mmm``
timing lines, multi-line text, blank-line separators) and WebVTT
(``WEBVTT`` header, '.' millisecond separator, optional cue ids,
optional settings after the arrow, NOTE blocks skipped). Malformed
timing lines, end <= start, and empty files raise ValueError.

Reference parity note: the reference repo has no media layer (SURVEY.md
section 4); this belongs to the multimodal training-data pillar.
"""

from __future__ import annotations

import re

__all__ = ["format_srt", "format_vtt", "parse_subtitles"]

_TS = re.compile(
    r"^(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})\s*-->\s*"
    r"(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})(?:\s+.*)?$"
)


def _ms(h: str, m: str, s: str, ms: str) -> int:
    mi, si = int(m), int(s)
    if mi > 59 or si > 59:
        raise ValueError(f"invalid timestamp field {h}:{m}:{s}.{ms}")
    return ((int(h) * 60 + mi) * 60 + si) * 1000 + int(ms)


def _stamp(ms: int, sep: str) -> str:
    h, rem = divmod(ms, 3_600_000)
    m, rem = divmod(rem, 60_000)
    s, milli = divmod(rem, 1000)
    return f"{h:02d}:{m:02d}:{s:02d}{sep}{milli:03d}"


def parse_subtitles(text: str) -> list[dict]:
    """SRT or WebVTT -> [{start_ms, end_ms, text}] in cue order. The
    format is sniffed from the WEBVTT header; cue indices/ids and VTT
    cue settings are tolerated and dropped; NOTE/STYLE blocks are
    skipped. Raises ValueError on malformed timing lines, end <= start,
    or a file with no cues."""
    lines = text.splitlines()
    pos = 0
    if lines and lines[0].strip().startswith("WEBVTT"):
        pos = 1
    cues: list[dict] = []
    n = len(lines)
    while pos < n:
        line = lines[pos].strip()
        if not line:
            pos += 1
            continue
        if line.startswith(("NOTE", "STYLE", "REGION")):
            pos += 1
            while pos < n and lines[pos].strip():
                pos += 1
            continue
        m = _TS.match(line)
        if m is None:
            # a cue id / SRT index line: the NEXT line must be timing
            pos += 1
            if pos >= n or _TS.match(lines[pos].strip()) is None:
                raise ValueError(
                    f"expected a subtitle timing line near {line[:40]!r}"
                )
            m = _TS.match(lines[pos].strip())
        start = _ms(*m.groups()[:4])
        end = _ms(*m.groups()[4:])
        if end <= start:
            raise ValueError(f"cue ends at or before its start ({line!r})")
        pos += 1
        body: list[str] = []
        while pos < n and lines[pos].strip():
            body.append(lines[pos].strip())
            pos += 1
        cues.append({"start_ms": start, "end_ms": end,
                     "text": " ".join(body)})
    if not cues:
        raise ValueError("subtitle file contains no cues")
    return cues


def format_srt(cues: list[dict]) -> str:
    """[{start_ms, end_ms, text}] -> SRT text."""
    out = []
    for i, c in enumerate(cues):
        out.append(
            f"{i + 1}\n{_stamp(c['start_ms'], ',')} --> "
            f"{_stamp(c['end_ms'], ',')}\n{c['text']}\n"
        )
    return "\n".join(out)


def format_vtt(cues: list[dict]) -> str:
    """[{start_ms, end_ms, text}] -> WebVTT text."""
    out = ["WEBVTT\n"]
    for c in cues:
        out.append(
            f"{_stamp(c['start_ms'], '.')} --> "
            f"{_stamp(c['end_ms'], '.')}\n{c['text']}\n"
        )
    return "\n".join(out)


# --- Spark kernels --------------------------------------------------------------------


def synthesize_subtitle_blobs(df):
    """Deterministic subtitle source: per doc_id a file of
    2 + doc_id % 4 cues — cue i spans [doc_id*100 + i*2000,
    start + 1500 + (doc_id + i) % 500) ms with text 'cue {doc_id} {i}' —
    as SRT for even doc_ids, WebVTT (with a NOTE block and cue ids) for
    odd, so both parse paths sit under one oracle hash."""
    import pandas as pd

    from ..sources.lake import widen

    def kernel(batches):
        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                cues = []
                for i in range(2 + did % 4):
                    start = did * 100 + i * 2000
                    cues.append({
                        "start_ms": start,
                        "end_ms": start + 1500 + (did + i) % 500,
                        "text": f"cue {did} {i}",
                    })
                if did % 2 == 0:
                    text = format_srt(cues)
                else:
                    text = format_vtt(cues).replace(
                        "WEBVTT\n",
                        "WEBVTT\n\nNOTE synthesized fixture\n\n", 1,
                    )
                out["doc_id"].append(did)
                out["blob"].append(text.encode("utf-8"))
            yield pd.DataFrame(out)

    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


def subtitle_cue_features(df):
    """Subtitle demux -> one row per cue: (doc_id, cue_idx, start_ms,
    end_ms, duration_ms, n_chars) via mapInPandas."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            out = {"doc_id": [], "cue_idx": [], "start_ms": [],
                   "end_ms": [], "duration_ms": [], "n_chars": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                for i, c in enumerate(
                    parse_subtitles(bytes(blob).decode("utf-8"))
                ):
                    out["doc_id"].append(doc_id)
                    out["cue_idx"].append(i)
                    out["start_ms"].append(c["start_ms"])
                    out["end_ms"].append(c["end_ms"])
                    out["duration_ms"].append(c["end_ms"] - c["start_ms"])
                    out["n_chars"].append(len(c["text"]))
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(
        kernel,
        "doc_id long, cue_idx int, start_ms long, end_ms long, "
        "duration_ms long, n_chars int",
    )
