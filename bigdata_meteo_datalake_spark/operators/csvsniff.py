"""CSV dialect-sniffing ingestion — tabular dumps arrive with unknown
delimiters (comma, semicolon, tab, pipe) and RFC 4180 quoting, and a
corpus ingest has to DETECT the dialect before it can parse: stdlib
``csv.Sniffer`` restricted to the four real-world delimiters (the
unrestricted sniffer happily picks a space out of prose fields), then
a full ``csv.reader`` parse with quote handling (embedded delimiters,
doubled quotes, embedded newlines) and a consistent-column-count gate.

Spark's built-in CSV reader needs the delimiter UP FRONT (one option
per load); this operator is the per-blob step that discovers it, after
which the parsed record stream is ordinary columnar data. A blob whose
dialect cannot be determined, whose rows disagree on column count, or
that is empty raises ValueError — silently mis-split rows are how
tabular corpora rot.

The companion writer ``build_csv`` emits RFC 4180 output via
``csv.writer`` used for oracle fixtures
(queries/ext_multimodal.py:csv_sniff_report).

Reference parity note: the reference repo ingests fixed-schema CSV via
pandas with a hardcoded dialect (SURVEY.md section 2, S4-adjacent);
dialect DISCOVERY belongs to the training-data pillar.
"""

from __future__ import annotations

import csv
import io

__all__ = ["build_csv", "sniff_parse_csv"]

DELIMITERS = ",;\t|"
DELIMITER_NAMES = {",": "comma", ";": "semicolon",
                   "\t": "tab", "|": "pipe"}


def build_csv(rows: list[list[str]], *, delimiter: str = ",") -> bytes:
    """Rows (header first) -> RFC 4180 bytes via csv.writer with
    minimal quoting."""
    if delimiter not in DELIMITERS:
        raise ValueError(f"unsupported delimiter {delimiter!r}")
    buf = io.StringIO()
    csv.writer(buf, delimiter=delimiter,
               quoting=csv.QUOTE_MINIMAL).writerows(rows)
    return buf.getvalue().encode("utf-8")


def sniff_parse_csv(b: bytes) -> dict:
    """CSV bytes -> {delimiter, delimiter_name, header, rows} with the
    dialect DETECTED (csv.Sniffer over the four corpus delimiters) and
    every row parsed through the real quote grammar. Undetectable
    dialects, inconsistent column counts, non-UTF-8 bytes, and empty
    inputs raise ValueError."""
    try:
        text = b.decode("utf-8")
    except UnicodeDecodeError as e:
        raise ValueError(f"CSV is not UTF-8 ({e})") from e
    if not text.strip():
        raise ValueError("empty CSV input")
    # A VALIDATED sniff ladder: try the full text first (it carries the
    # Sniffer's strongest signal — the quoted-field heuristic — which a
    # short prefix may lack), then shrinking clean-prefix samples whose
    # uniform per-line delimiter counts rescue files where embedded
    # quoted delimiters deeper in the file skew the full-text frequency
    # tables. EVERY rung's guess must pass the full parse +
    # column-consistency gate before it is accepted — a rung that
    # sniffs confidently but mis-splits INCONSISTENTLY falls through to
    # the next rung instead of either hard-failing (the
    # gate-after-one-guess design) or silently winning (the
    # accept-first-success design). Known limit shared by any
    # delimiter-free gate: a wrong delimiter that splits EVERY line
    # into the same column count is indistinguishable from a right one
    # without schema knowledge.
    def parse_with(delimiter: str):
        try:
            parsed = list(csv.reader(io.StringIO(text),
                                     delimiter=delimiter,
                                     quotechar='"', doublequote=True))
        except csv.Error as e:
            raise ValueError(f"CSV parse failed ({e})") from e
        parsed = [r for r in parsed if r]  # csv yields [] for blanks
        if len(parsed) < 2:
            raise ValueError("CSV has a header but no data rows")
        width = len(parsed[0])
        for i, r in enumerate(parsed):
            if len(r) != width:
                raise ValueError(
                    f"row {i} has {len(r)} columns, header has {width} "
                    "(mis-split or corrupt input)"
                )
        return parsed

    lines = text.splitlines(keepends=True)
    failures = []
    # distinct sample sizes only (a 3-line file would otherwise sniff
    # and full-parse the identical text four times), largest first
    rungs = sorted({min(k, len(lines))
                    for k in (len(lines), 10, 5, 3)}, reverse=True)
    for k in rungs:
        # take only the DELIMITER from the sniff; parse with standard
        # RFC 4180 quoting (the sniffer's doublequote guess is
        # unreliable — it returned False on doubled-quote fields)
        try:
            dialect = csv.Sniffer().sniff("".join(lines[:k]),
                                          delimiters=DELIMITERS)
        except csv.Error:
            failures.append(f"{k} lines: no dialect")
            continue
        try:
            parsed = parse_with(dialect.delimiter)
        except ValueError as e:
            failures.append(f"{k} lines -> {dialect.delimiter!r}: {e}")
            continue
        return {
            "delimiter": dialect.delimiter,
            "delimiter_name": DELIMITER_NAMES[dialect.delimiter],
            "header": parsed[0],
            "rows": parsed[1:],
        }
    raise ValueError(
        "cannot determine CSV dialect; every sniff rung failed the "
        f"consistency gate ({'; '.join(failures)})"
    )


# --- Spark kernels (mapInPandas, the codec plan shape) --------------------------------


def synthesize_csv_blobs(df):
    """Deterministic messy-CSV source: per ``doc_id`` a table whose
    delimiter cycles comma/semicolon/tab/pipe by doc_id % 4, with
    3 + doc_id % 4 data rows under an (id, name, note) header —

      row i: id = doc_id*10 + i, name = 'n {doc_id}-{i}' (spaces defeat
             a naive sniffer); note = 'v{i}' for i < 2 (the clean
             sniffable prefix), then 'q"{doc_id}"{i}' on even i
             (doubled-quote escape) or 'v<delim>{i}' on odd i (embedded
             delimiter forcing RFC 4180 quoting)

    — closed forms queries/ext_multimodal.py:csv_sniff_report
    recomputes, so detection AND quote-grammar parsing sit under one
    oracle hash."""
    import pandas as pd

    from ..sources.lake import widen

    def kernel(batches):
        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                delim = DELIMITERS[did % 4]
                n = 3 + did % 4
                rows = [["id", "name", "note"]]
                for i in range(n):
                    if i < 2:  # clean prefix rows the sniffer samples
                        note = f"v{i}"
                    elif i % 2 == 0:  # doubled-quote escape
                        note = f'q"{did}"{i}'
                    else:  # embedded delimiter forcing quoting
                        note = f"v{delim}{i}"
                    rows.append([str(did * 10 + i), f"n {did}-{i}", note])
                out["doc_id"].append(did)
                out["blob"].append(build_csv(rows, delimiter=delim))
            yield pd.DataFrame(out)

    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


CSV_SNIFF_SCHEMA = (
    "doc_id long, delimiter_name string, n_rows int, n_cols int, "
    "sum_id long, last_note string"
)


def csv_sniff_features(df):
    """Dialect-sniffed parse -> (doc_id, delimiter_name, n_rows,
    n_cols, sum_id, last_note) via mapInPandas — the id sum proves
    every row split correctly, the last note proves the quote grammar
    (doubled quotes / embedded delimiters) decoded."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "delimiter_name", "n_rows",
                                   "n_cols", "sum_id", "last_note")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                r = sniff_parse_csv(bytes(blob))
                out["doc_id"].append(doc_id)
                out["delimiter_name"].append(r["delimiter_name"])
                out["n_rows"].append(len(r["rows"]))
                out["n_cols"].append(len(r["header"]))
                out["sum_id"].append(sum(int(row[0]) for row in r["rows"]))
                out["last_note"].append(r["rows"][-1][2])
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(kernel, CSV_SNIFF_SCHEMA)
