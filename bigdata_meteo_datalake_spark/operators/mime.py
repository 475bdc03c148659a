"""MIME / EML email parsing — mailing-list archives, support dumps, and
mbox exports are a classic LLM text-corpus source, and the stdlib
``email`` package parses the format in full. This module covers the
corpus-ingestion slice:

- RFC 5322 headers (From, Subject with RFC 2047 encoded-words, Date);
- multipart/alternative bodies (text/plain + text/html siblings) and
  attachments (multipart/mixed with application/octet-stream);
- all three transfer encodings corpus mail actually uses — 7bit,
  quoted-printable, base64 — with charset decoding (UTF-8);
- deterministic text assembly: the text/plain part's content with CRLF
  normalized to LF and at most one trailing newline stripped (the CRLF
  before a MIME boundary belongs to the delimiter, so writers disagree
  on whether one survives decoding — normalizing makes the extracted
  text independent of the transfer encoding, which the oracle checks
  by cycling all three under one hash).

A message with no text/plain part, nested multipart beyond one level,
or an unknown transfer encoding raises loudly (a corpus ingest must
never silently emit the base64 soup of a part it failed to decode).

The companion writer ``build_eml`` hand-rolls the raw MIME bytes (it
does NOT round-trip through the email library, so the parser is tested
against independently-constructed input) used for oracle fixtures
(queries/ext_multimodal.py:eml_text_report).

Reference parity note: the reference repo has no document-parsing
layer (SURVEY.md section 4); this module belongs to the training-data
pillar.
"""

from __future__ import annotations

import base64
import quopri
import re

__all__ = ["build_eml", "build_mbox", "parse_eml", "split_mbox"]

_FROM_RE = re.compile(rb"^>*From ")

_BOUNDARY = "=-spark-fixture-boundary"


def build_eml(
    *,
    from_addr: str,
    subject: str,
    body: str,
    html: str | None = None,
    encoding: str = "7bit",
    attachment: tuple[str, bytes] | None = None,
) -> bytes:
    """Hand-rolled RFC-shaped EML bytes: multipart/alternative
    (text/plain [+ text/html]) wrapped in multipart/mixed when an
    ``attachment`` (filename, payload) is given. ``encoding`` applies
    to the text parts: '7bit' (body must be ASCII with no bare
    specials), 'quoted-printable', or 'base64'. Non-ASCII subjects are
    emitted as RFC 2047 UTF-8 encoded-words."""
    if encoding not in ("7bit", "quoted-printable", "base64"):
        raise ValueError(f"unsupported transfer encoding {encoding!r}")

    def encode_text(text: str) -> str:
        if encoding == "7bit":
            text.encode("ascii")  # raises if the caller lied
            return text.replace("\n", "\r\n")
        if encoding == "quoted-printable":
            enc = quopri.encodestring(text.encode("utf-8")).decode("ascii")
        else:
            enc = base64.encodebytes(text.encode("utf-8")).decode("ascii")
        return enc.replace("\n", "\r\n")

    def text_part(ctype: str, text: str) -> str:
        return (
            f"--{_BOUNDARY}\r\n"
            f'Content-Type: {ctype}; charset="utf-8"\r\n'
            f"Content-Transfer-Encoding: {encoding}\r\n"
            "\r\n"
            + encode_text(text) + "\r\n"
        )

    try:
        subject.encode("ascii")
        subj = subject
    except UnicodeEncodeError:
        subj = ("=?utf-8?b?"
                + base64.b64encode(subject.encode("utf-8")).decode("ascii")
                + "?=")
    alt = text_part("text/plain", body)
    if html is not None:
        alt += text_part("text/html", html)
    alt += f"--{_BOUNDARY}--\r\n"

    if attachment is None:
        ctype = f'multipart/alternative; boundary="{_BOUNDARY}"'
        payload = alt
    else:
        fname, data = attachment
        outer = _BOUNDARY + "-outer"
        ctype = f'multipart/mixed; boundary="{outer}"'
        payload = (
            f"--{outer}\r\n"
            f'Content-Type: multipart/alternative; boundary="{_BOUNDARY}"\r\n'
            "\r\n" + alt
            + f"--{outer}\r\n"
            "Content-Type: application/octet-stream\r\n"
            "Content-Transfer-Encoding: base64\r\n"
            "Content-Disposition: attachment; "
            f'filename="{fname}"\r\n'
            "\r\n"
            + base64.encodebytes(data).decode("ascii").replace("\n", "\r\n")
            + f"--{outer}--\r\n"
        )
    return (
        f"From: {from_addr}\r\n"
        f"Subject: {subj}\r\n"
        "Date: Thu, 01 Jan 2026 00:00:00 +0000\r\n"
        "MIME-Version: 1.0\r\n"
        f"Content-Type: {ctype}\r\n"
        "\r\n" + payload
    ).encode("utf-8")


def parse_eml(b: bytes) -> dict:
    """EML bytes -> {subject, from_addr, text, n_parts, encoding,
    has_attachment}: stdlib strict-policy parse, RFC 2047 subject
    decoding, text/plain selection from multipart/alternative (one
    multipart/mixed wrapper tolerated for attachments), CRLF
    normalization. Missing text/plain, deeper nesting, unknown
    transfer encodings, and header defects raise ValueError."""
    from email import policy
    from email.parser import BytesParser

    try:
        msg = BytesParser(policy=policy.default).parsebytes(b)
    except Exception as e:  # email raises a zoo of types; unify
        raise ValueError(f"unparseable MIME message ({e})") from e
    if msg.defects:
        raise ValueError(f"MIME structure defects: {msg.defects}")
    import email.errors as _ee

    try:
        # headers parse LAZILY in these accessors, so the stdlib's
        # failure zoo surfaces here, not in parsebytes: unknown RFC 2047
        # charsets raise LookupError from codecs, structured-header
        # grammar errors raise email.errors.MessageError subclasses,
        # and one known CPython defect-accounting bug escapes as a bare
        # AttributeError (found by mutation fuzzing,
        # tests/test_round11_props.py) — normalize all of them to the
        # module's contracted failure type
        subject = str(msg["Subject"] or "")
        from_addr = str(msg["From"] or "")
    except (LookupError, AttributeError, _ee.MessageError) as e:
        raise ValueError(f"malformed message headers ({e})") from e

    try:
        # same lazy-parse surface as the header block above:
        # Content-Type / Content-Disposition parse on first access
        parts = list(msg.iter_parts()) if msg.is_multipart() else [msg]
        has_attachment = False
        flat = []
        for p in parts:
            if p.get_content_type() == "multipart/alternative":
                flat.extend(p.iter_parts())
            elif p.get_content_maintype() == "multipart":
                raise ValueError(
                    f"nested {p.get_content_type()} beyond one mixed level"
                )
            elif p.get_content_disposition() == "attachment":
                has_attachment = True
                flat.append(p)
            else:
                flat.append(p)
        plain = [p for p in flat
                 if p.get_content_type() == "text/plain"
                 and p.get_content_disposition() != "attachment"]
    except (LookupError, AttributeError, _ee.MessageError) as e:
        raise ValueError(f"malformed MIME structure ({e})") from e
    if not plain:
        raise ValueError("message has no text/plain part")
    part = plain[0]
    cte = (part["Content-Transfer-Encoding"] or "7bit").lower()
    if cte not in ("7bit", "8bit", "quoted-printable", "base64"):
        raise ValueError(f"unknown transfer encoding {cte!r}")
    if part.defects:
        raise ValueError(f"text part defects: {part.defects}")
    try:
        content = part.get_content()
    except (LookupError, AttributeError, _ee.MessageError) as e:
        # a Content-Type charset naming no real codec (or a header the
        # stdlib chokes on mid-decode) is a malformed message, not an
        # internal error (mutation-fuzz finding)
        raise ValueError(f"undecodable text part ({e})") from e
    text = content.replace("\r\n", "\n")
    if text.endswith("\n"):
        text = text[:-1]
    return {
        "subject": subject,
        "from_addr": from_addr,
        "text": text,
        "n_parts": len(flat),
        "encoding": cte,
        "has_attachment": has_attachment,
    }


# --- Spark kernels (mapInPandas, the codec plan shape) --------------------------------


def synthesize_eml_blobs(df):
    """Deterministic EML source: per ``doc_id`` a hand-rolled MIME
    message —

      from  = 'user{doc_id % 7}@example.com'
      subject = 'Report {doc_id}' (ASCII) or 'Sale ü {doc_id}'
                (RFC 2047 encoded-word) when doc_id % 4 == 0
      body  = 1 + doc_id % 3 lines 'mail {doc_id} line {i}', each
              suffixed ' = 50% ü' unless the encoding is 7bit
      encoding cycles 7bit / quoted-printable / base64 by doc_id % 3
      an html sibling always present; a base64 attachment
      'a{doc_id}.bin' when doc_id % 5 == 0

    — closed forms queries/ext_multimodal.py:eml_text_report recomputes
    (the SAME extracted text must come back from all three transfer
    encodings, which is exactly what the oracle hash checks)."""
    import pandas as pd

    from ..sources.lake import widen

    def kernel(batches):
        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                enc = ("7bit", "quoted-printable", "base64")[did % 3]
                suffix = "" if enc == "7bit" else " = 50% ü"
                body = "\n".join(
                    f"mail {did} line {i}{suffix}"
                    for i in range(1 + did % 3)
                )
                out["doc_id"].append(did)
                out["blob"].append(build_eml(
                    from_addr=f"user{did % 7}@example.com",
                    subject=(f"Sale ü {did}" if did % 4 == 0
                             else f"Report {did}"),
                    body=body,
                    html=f"<p>mail {did}</p>",
                    encoding=enc,
                    attachment=((f"a{did}.bin", bytes(8 + did % 8))
                                if did % 5 == 0 else None),
                ))
            yield pd.DataFrame(out)

    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


EML_SCHEMA = (
    "doc_id long, subject string, from_addr string, n_parts int, "
    "encoding string, has_attachment boolean, body_chars long, "
    "text string"
)


def eml_text_features(df):
    """EML parse -> (doc_id, subject, from_addr, n_parts, encoding,
    has_attachment, body_chars, text) via mapInPandas — the full
    extracted text surfaced so the transfer-encoding round-trip is
    value-checked character for character."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "subject", "from_addr",
                                   "n_parts", "encoding",
                                   "has_attachment", "body_chars",
                                   "text")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                r = parse_eml(bytes(blob))
                out["doc_id"].append(doc_id)
                out["subject"].append(r["subject"])
                out["from_addr"].append(r["from_addr"])
                out["n_parts"].append(r["n_parts"])
                out["encoding"].append(r["encoding"])
                out["has_attachment"].append(r["has_attachment"])
                out["body_chars"].append(len(r["text"]))
                out["text"].append(r["text"])
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(kernel, EML_SCHEMA)


# --- mbox archives (the mailing-list shipping container) -----------------------------


def build_mbox(messages: list[bytes]) -> bytes:
    """EML messages -> an mboxrd archive: each message introduced by a
    'From ' envelope line, body lines matching ^>*From (space) quoted
    with one more '>' (the mboxrd convention, reversible — plain mboxo
    munging destroys '>From ' lines), a blank separator line after
    each message."""
    out = bytearray()
    for i, msg in enumerate(messages):
        out += f"From fixture@example Thu Jan  1 00:00:0{i % 10} 2026\n".encode()
        lines = msg.replace(b"\r\n", b"\n").split(b"\n")
        if lines and lines[-1] == b"":
            lines.pop()  # the trailing-newline split artifact, not a line
        for line in lines:
            if _FROM_RE.match(line):
                out += b">"
            out += line + b"\n"
        out += b"\n"
    return bytes(out)


def split_mbox(b: bytes) -> list[bytes]:
    """mboxrd archive -> the original EML message bytes (envelope
    lines stripped, '>'-quoting reversed). A non-'From ' first line or
    an empty archive raises ValueError."""
    if not b.strip():
        raise ValueError("empty mbox archive")
    lines = b.split(b"\n")
    if not lines[0].startswith(b"From "):
        raise ValueError("mbox must start with a 'From ' envelope line")
    messages: list[list[bytes]] = []
    cur: list[bytes] | None = None
    for line in lines:
        if line.startswith(b"From "):
            if cur is not None:
                messages.append(cur)
            cur = []
            continue
        if cur is None:
            raise ValueError("content before the first envelope line")
        if _FROM_RE.match(line):
            line = line[1:]  # reverse one level of mboxrd quoting
        cur.append(line)
    if cur is not None:
        messages.append(cur)
    out = []
    for i, msg in enumerate(messages):
        # the archive's final message carries an extra empty element
        # from the file's trailing newline; every message then ends
        # with exactly ONE separator blank line — pop only that, so
        # bodies that legitimately end in blank lines roundtrip
        if i == len(messages) - 1 and msg and msg[-1] == b"":
            msg.pop()
        if msg and msg[-1] == b"":
            msg.pop()  # the blank separator line
        out.append(b"\n".join(msg) + b"\n")
    return out


def synthesize_mbox_blobs(df):
    """Deterministic mbox source: per ``doc_id`` an mboxrd archive of
    1 + doc_id % 3 hand-rolled MIME messages —

      message j: from 'user{(doc_id+j) % 7}@example.com',
                 subject 'Msg {doc_id}-{j}',
                 body = 1 + (doc_id+j) % 2 lines
                        'mb {doc_id}-{j} line {i}{suffix}',
                 transfer encoding cycling by (doc_id+j) % 3 with
                 suffix ' ü 50%' on the non-7bit encodings

    — closed forms queries/ext_multimodal.py:mbox_messages_report
    recomputes."""
    import pandas as pd

    from ..sources.lake import widen

    def kernel(batches):
        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                msgs = []
                for j in range(1 + did % 3):
                    enc = ("7bit", "quoted-printable", "base64")[(did + j) % 3]
                    suffix = "" if enc == "7bit" else " ü 50%"
                    body = "\n".join(
                        f"mb {did}-{j} line {i}{suffix}"
                        for i in range(1 + (did + j) % 2)
                    )
                    msgs.append(build_eml(
                        from_addr=f"user{(did + j) % 7}@example.com",
                        subject=f"Msg {did}-{j}",
                        body=body,
                        encoding=enc,
                    ))
                out["doc_id"].append(did)
                out["blob"].append(build_mbox(msgs))
            yield pd.DataFrame(out)

    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


MBOX_SCHEMA = (
    "doc_id long, msg_idx int, subject string, from_addr string, "
    "encoding string, text string"
)


def mbox_messages_features(df):
    """mbox demux -> one row PER MESSAGE through the full EML parser:
    (doc_id, msg_idx, subject, from_addr, encoding, text)."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "msg_idx", "subject",
                                   "from_addr", "encoding", "text")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                for j, msg in enumerate(split_mbox(bytes(blob))):
                    r = parse_eml(msg)
                    out["doc_id"].append(doc_id)
                    out["msg_idx"].append(j)
                    out["subject"].append(r["subject"])
                    out["from_addr"].append(r["from_addr"])
                    out["encoding"].append(r["encoding"])
                    out["text"].append(r["text"])
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(kernel, MBOX_SCHEMA)
