"""Stdlib-only PDF text extraction — the largest untapped document
source for an LLM corpus. Implements the ISO 32000 / PDF 1.4 subset
that covers the overwhelming majority of born-digital text PDFs:

- classic cross-reference TABLES (``xref`` sections chained by /Prev,
  incremental updates included) located via ``startxref``;
- the full object grammar: dicts, arrays, names (with #xx escapes),
  numbers, booleans, null, literal strings (all \\-escapes + octal +
  line continuations), hex strings, indirect references, streams;
- stream filters: none or /FlateDecode (zlib — wrapped so corrupt
  deflate data raises ValueError, never a bare zlib.error);
- page-tree walk (/Pages nodes with /Kids, /Contents single or array);
- content-stream text operators: BT..ET blocks, Tj, TJ (kerning
  numbers skipped), ' and ", with Td/TD/T*/Tm/'/" starting a new line;
- simple-font encodings: /WinAnsiEncoding (= Windows code page 1252,
  which the stdlib ships; the five permanently-undefined WinAnsi slots
  raise) and /StandardEncoding (ASCII range; Adobe's high-byte layout
  is NOT cp1252 and is not reconstructed from memory — high bytes
  raise loudly instead of guessing).

DECLARED boundaries (loud, specific raises — not silent wrong text):
encrypted documents (/Encrypt), cross-reference STREAMS (PDF 1.5+),
object streams (/ObjStm), composite/CID fonts (/Type0, the
subset-embedded-font case where bytes are glyph ids and text recovery
needs the embedded /ToUnicode CMap), /Differences re-encoded fonts,
non-Flate filters (DCT/LZW/ASCII85/...), and inline images (BI..EI —
raw binary that breaks content tokenization).

Text assembly rule (deterministic, so a SQL oracle can rebuild it):
every show operator appends its decoded string; a line break ("\\n")
is inserted before a show if any text-positioning operator (Td, TD,
T*, Tm) or a new BT block intervened since the previous show; pages
are joined with "\\n" as well. Kerning adjustments inside TJ arrays
never produce spaces (word spacing in this subset is explicit in the
strings).

The companion writer ``build_pdf`` emits spec-shaped single-update
PDFs (header, numbered objects, catalog -> page tree -> pages with
Helvetica /WinAnsiEncoding, optional Flate-compressed content
streams, a correct xref table + trailer) used for oracle fixtures
(queries/ext_multimodal.py:pdf_text_report) — any conformant reader
opens them.

Reference parity note: the reference repo has no document-parsing
layer (SURVEY.md section 4); this module belongs to the training-data
pillar.
"""

from __future__ import annotations

import re
import zlib

__all__ = ["build_pdf", "extract_pdf_text"]

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"

# cp1252 positions that WinAnsiEncoding leaves undefined
_CP1252_UNDEF = {0x81, 0x8D, 0x8F, 0x90, 0x9D}


# --- tokenizer -----------------------------------------------------------------------


class _Lexer:
    """Byte-level PDF tokenizer shared by the object parser and the
    content-stream walker."""

    def __init__(self, b: bytes, pos: int = 0):
        self.b = b
        self.pos = pos

    def _skip_ws(self):
        b, n = self.b, len(self.b)
        while self.pos < n:
            c = b[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # '%' comment to end of line
                while self.pos < n and b[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def peek_token(self):
        save = self.pos
        t = self.next_token()
        self.pos = save
        return t

    def next_token(self):
        """-> (kind, value): kind in {'name','number','string','dict<',
        'dict>','arr[','arr]','kw'} or (None, None) at EOF."""
        self._skip_ws()
        b, n = self.b, len(self.b)
        if self.pos >= n:
            return (None, None)
        c = b[self.pos]
        if c == 0x2F:  # /Name
            self.pos += 1
            start = self.pos
            out = bytearray()
            while self.pos < n and b[self.pos] not in _WS and b[self.pos] not in _DELIM:
                if b[self.pos] == 0x23 and self.pos + 2 < n:  # #xx
                    try:
                        out.append(int(b[self.pos + 1 : self.pos + 3], 16))
                        self.pos += 3
                        continue
                    except ValueError:
                        raise ValueError(
                            f"bad #-escape in name at offset {start}"
                        ) from None
                out.append(b[self.pos])
                self.pos += 1
            return ("name", out.decode("latin-1"))
        if c == 0x28:  # ( literal string
            return ("string", self._lit_string())
        if c == 0x3C:  # << or <hex>
            if self.pos + 1 < n and b[self.pos + 1] == 0x3C:
                self.pos += 2
                return ("dict<", None)
            return ("string", self._hex_string())
        if c == 0x3E:  # >>
            if self.pos + 1 < n and b[self.pos + 1] == 0x3E:
                self.pos += 2
                return ("dict>", None)
            raise ValueError(f"stray '>' at offset {self.pos}")
        if c == 0x5B:
            self.pos += 1
            return ("arr[", None)
        if c == 0x5D:
            self.pos += 1
            return ("arr]", None)
        if c in b"+-.0123456789":
            start = self.pos
            self.pos += 1
            while self.pos < n and b[self.pos] in b"+-.0123456789":
                self.pos += 1
            tok = b[start : self.pos]
            try:
                return ("number", float(tok) if b"." in tok else int(tok))
            except ValueError:
                raise ValueError(f"bad number {tok!r} at offset {start}") from None
        # keyword / operator
        start = self.pos
        while self.pos < n and b[self.pos] not in _WS and b[self.pos] not in _DELIM:
            self.pos += 1
        if self.pos == start:
            raise ValueError(f"unexpected byte 0x{c:02x} at offset {start}")
        return ("kw", b[start : self.pos].decode("latin-1"))

    def _lit_string(self) -> bytes:
        b, n = self.b, len(self.b)
        assert b[self.pos] == 0x28
        self.pos += 1
        depth = 1
        out = bytearray()
        while self.pos < n:
            c = b[self.pos]
            if c == 0x5C:  # backslash
                self.pos += 1
                if self.pos >= n:
                    break
                e = b[self.pos]
                if e in b"nrtbf":
                    out.append({0x6E: 10, 0x72: 13, 0x74: 9,
                                0x62: 8, 0x66: 12}[e])
                    self.pos += 1
                elif e in b"()\\":
                    out.append(e)
                    self.pos += 1
                elif e in b"01234567":  # 1-3 octal digits
                    o = 0
                    k = 0
                    while (k < 3 and self.pos < n
                           and b[self.pos] in b"01234567"):
                        o = o * 8 + (b[self.pos] - 0x30)
                        self.pos += 1
                        k += 1
                    out.append(o & 0xFF)
                elif e in b"\r\n":  # line continuation
                    self.pos += 1
                    if e == 0x0D and self.pos < n and b[self.pos] == 0x0A:
                        self.pos += 1
                else:  # spec: lone backslash is dropped
                    out.append(e)
                    self.pos += 1
                continue
            if c == 0x28:
                depth += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos += 1
                    return bytes(out)
            out.append(c)
            self.pos += 1
        raise ValueError("unterminated literal string")

    def _hex_string(self) -> bytes:
        b, n = self.b, len(self.b)
        assert b[self.pos] == 0x3C
        self.pos += 1
        digits = []
        while self.pos < n:
            c = b[self.pos]
            if c == 0x3E:
                self.pos += 1
                if len(digits) % 2:
                    digits.append("0")  # spec: odd count pads with 0
                return bytes(
                    int("".join(digits[i : i + 2]), 16)
                    for i in range(0, len(digits), 2)
                )
            if c in _WS:
                self.pos += 1
                continue
            if c not in b"0123456789abcdefABCDEF":
                raise ValueError(f"bad hex-string byte 0x{c:02x}")
            digits.append(chr(c))
            self.pos += 1
        raise ValueError("unterminated hex string")


# --- object parser -------------------------------------------------------------------


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num


def _parse_value(lx: _Lexer):
    kind, val = lx.next_token()
    if kind is None:
        raise ValueError("unexpected end of PDF data")
    if kind == "dict<":
        d = {}
        while True:
            k2, v2 = lx.next_token()
            if k2 == "dict>":
                return d
            if k2 != "name":
                raise ValueError(f"dict key must be a name, got {k2}")
            d[v2] = _parse_value(lx)
    if kind == "arr[":
        arr = []
        while True:
            if lx.peek_token()[0] == "arr]":
                lx.next_token()
                return arr
            arr.append(_parse_value(lx))
    if kind == "number":
        # possible indirect reference: <num> <gen> R
        save = lx.pos
        k2, v2 = lx.next_token()
        if k2 == "number" and isinstance(val, int) and isinstance(v2, int):
            k3, v3 = lx.next_token()
            if k3 == "kw" and v3 == "R":
                return _Ref(val)
        lx.pos = save
        return val
    if kind == "kw":
        if val == "true":
            return True
        if val == "false":
            return False
        if val == "null":
            return None
        raise ValueError(f"unexpected keyword {val!r} in object position")
    if kind in ("name", "string"):
        return val
    raise ValueError(f"unexpected token {kind} in object position")


class _Document:
    def __init__(self, b: bytes):
        self.b = b
        self.xref: dict[int, int] = {}
        self.trailer: dict = {}
        self._cache: dict[int, object] = {}
        self._load_xref()

    # -- xref walk --
    def _load_xref(self):
        b = self.b
        if not b.startswith(b"%PDF-"):
            raise ValueError("not a PDF (missing %PDF- header)")
        tail = b[-2048:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if m is None:
            raise ValueError("PDF missing startxref")
        offset = int(m.group(1))
        seen = set()
        while True:
            if offset in seen:
                raise ValueError("circular /Prev chain in xref")
            seen.add(offset)
            lx = _Lexer(b, offset)
            kind, val = lx.next_token()
            if kind == "number":
                raise NotImplementedError(
                    "cross-reference STREAM (PDF 1.5+) — only classic "
                    "xref tables are supported"
                )
            if kind != "kw" or val != "xref":
                raise ValueError(f"no xref table at offset {offset}")
            while True:
                k2, v2 = lx.next_token()
                if k2 == "kw" and v2 == "trailer":
                    break
                if k2 != "number":
                    raise ValueError("malformed xref subsection header")
                k3, count = lx.next_token()
                if k3 != "number":
                    raise ValueError("malformed xref subsection header")
                start = v2
                lx._skip_ws()
                for i in range(count):
                    entry = b[lx.pos : lx.pos + 20]
                    if len(entry) < 18:
                        raise ValueError("truncated xref entry")
                    off, _gen, typ = entry[:10], entry[11:16], entry[17:18]
                    if typ == b"n" and (start + i) not in self.xref:
                        self.xref[start + i] = int(off)
                    elif typ not in (b"n", b"f"):
                        raise ValueError(f"bad xref entry type {typ!r}")
                    # entries are 20 bytes incl. the 2-byte terminator,
                    # but tolerate 19-byte single-char EOL writers
                    step = 20
                    if entry[18:19] not in b"\r\n ":
                        step = 19
                    lx.pos += step
            trailer = _parse_value(lx)
            if not isinstance(trailer, dict):
                raise ValueError("trailer is not a dictionary")
            if "Encrypt" in trailer:
                raise NotImplementedError(
                    "encrypted PDF (/Encrypt) — decryption is out of scope"
                )
            # first (newest) trailer wins for Root
            for k, v in trailer.items():
                self.trailer.setdefault(k, v)
            if "Prev" in trailer:
                offset = int(trailer["Prev"])
                continue
            return

    # -- object access --
    def resolve(self, v):
        while isinstance(v, _Ref):
            v = self.get_object(v.num)
        return v

    def get_object(self, num: int):
        if num in self._cache:
            return self._cache[num]
        if num not in self.xref:
            raise ValueError(f"object {num} not in xref table")
        lx = _Lexer(self.b, self.xref[num])
        k1, n1 = lx.next_token()
        k2, _g = lx.next_token()
        k3, kw = lx.next_token()
        if k1 != "number" or k2 != "number" or (k3, kw) != ("kw", "obj"):
            raise ValueError(f"object {num}: no 'N G obj' at xref offset")
        if n1 != num:
            raise ValueError(f"xref points object {num} at object {n1}")
        val = _parse_value(lx)
        k4, kw4 = lx.next_token()
        if (k4, kw4) == ("kw", "stream"):
            if not isinstance(val, dict):
                raise ValueError(f"object {num}: stream without a dict")
            # spec: 'stream' is followed by CRLF or LF
            p = lx.pos
            if self.b[p : p + 2] == b"\r\n":
                p += 2
            elif self.b[p : p + 1] == b"\n":
                p += 1
            length = self.resolve(val.get("Length"))
            if not isinstance(length, int):
                raise ValueError(f"object {num}: stream /Length missing")
            raw = self.b[p : p + length]
            if len(raw) < length:
                raise ValueError(f"object {num}: stream truncated")
            val = ("stream", val, raw)
        self._cache[num] = val
        return val

    def stream_data(self, obj) -> bytes:
        """Decode a ('stream', dict, raw) object through its filters."""
        if not (isinstance(obj, tuple) and obj[0] == "stream"):
            raise ValueError("expected a stream object")
        d, raw = obj[1], obj[2]
        if d.get("Type") == "ObjStm":
            raise NotImplementedError(
                "object stream (/ObjStm, PDF 1.5+) not supported"
            )
        filt = self.resolve(d.get("Filter"))
        if filt is None:
            return raw
        filters = filt if isinstance(filt, list) else [filt]
        data = raw
        for f in filters:
            f = self.resolve(f)
            if f == "FlateDecode":
                try:
                    data = zlib.decompress(data)
                except zlib.error as e:
                    raise ValueError(f"corrupt FlateDecode stream ({e})") from e
            else:
                raise NotImplementedError(
                    f"stream filter /{f} not supported (only FlateDecode)"
                )
        if "DecodeParms" in d and self.resolve(d["DecodeParms"]) is not None:
            raise NotImplementedError(
                "predictor /DecodeParms not supported"
            )
        return data


# --- fonts ---------------------------------------------------------------------------


def _font_decoder(doc: _Document, font_dict):
    """Font dict -> bytes->str decoder for show-operator strings."""
    fd = doc.resolve(font_dict)
    if not isinstance(fd, dict):
        raise ValueError("font resource is not a dictionary")
    sub = doc.resolve(fd.get("Subtype"))
    if sub == "Type0":
        raise NotImplementedError(
            "composite/CID font (/Type0) — show strings are glyph ids; "
            "text recovery needs the embedded ToUnicode CMap"
        )
    enc = doc.resolve(fd.get("Encoding"))
    if isinstance(enc, dict):
        raise NotImplementedError(
            "font /Encoding with /Differences (subset re-encoding) "
            "not supported"
        )

    if enc == "WinAnsiEncoding":
        def dec(bs: bytes) -> str:
            for c in bs:
                if c in _CP1252_UNDEF:
                    raise ValueError(
                        f"WinAnsi string uses undefined code 0x{c:02x}"
                    )
            return bs.decode("cp1252")
        return dec
    if enc in (None, "StandardEncoding"):
        def dec(bs: bytes) -> str:
            for c in bs:
                if c > 0x7E:
                    raise NotImplementedError(
                        f"StandardEncoding high byte 0x{c:02x} — Adobe's "
                        "high-byte layout is not reconstructed from memory"
                    )
            return bs.decode("ascii")
        return dec
    raise NotImplementedError(f"font encoding /{enc} not supported")


# --- content-stream text walk --------------------------------------------------------

_TEXT_POS_OPS = {"Td", "TD", "T*", "Tm"}
_STATE_OPS = {  # operator -> operand count we silently consume
    "Tc": 1, "Tw": 1, "Tz": 1, "TL": 1, "Ts": 1, "Tr": 1,
    "cm": 6, "w": 1, "J": 1, "j": 1, "M": 1, "d": 2, "ri": 1, "i": 1,
    "gs": 1, "g": 1, "G": 1, "rg": 3, "RG": 3, "k": 4, "K": 4,
    "cs": 1, "CS": 1, "sc": -1, "scn": -1, "SC": -1, "SCN": -1,
    "m": 2, "l": 2, "c": 6, "v": 4, "y": 4, "re": 4, "h": 0,
    "S": 0, "s": 0, "f": 0, "F": 0, "f*": 0, "B": 0, "B*": 0,
    "b": 0, "b*": 0, "n": 0, "W": 0, "W*": 0, "q": 0, "Q": 0,
    "Do": 1, "MP": 1, "DP": 2, "BMC": 1, "BDC": 2, "EMC": 0,
}


def _page_text(doc: _Document, content: bytes, fonts: dict) -> str:
    """One page's content stream -> extracted text (see module
    docstring for the deterministic assembly rule)."""
    lx = _Lexer(content)
    out: list[str] = []
    stack: list = []
    in_text = False
    pending_break = False
    decoder = None

    def show(s: bytes):
        nonlocal pending_break
        if not in_text:
            raise ValueError("show operator outside BT..ET")
        dec = decoder
        if dec is None:
            # no Tf seen: ASCII-only default
            def dec(bs: bytes) -> str:
                if any(c > 0x7E for c in bs):
                    raise ValueError("non-ASCII show string before Tf")
                return bs.decode("ascii")
        if pending_break and out:
            out.append("\n")
        pending_break = False
        out.append(dec(s))

    while True:
        kind, val = lx.next_token()
        if kind is None:
            break
        if kind in ("number", "string", "name"):
            stack.append((kind, val))
            continue
        if kind == "arr[":
            arr = []
            while True:
                k2, v2 = lx.next_token()
                if k2 == "arr]":
                    break
                if k2 is None:
                    raise ValueError("unterminated array in content stream")
                arr.append((k2, v2))
            stack.append(("array", arr))
            continue
        if kind != "kw":
            raise ValueError(f"unexpected {kind} in content stream")
        op = val
        if op == "BT":
            in_text = True
            pending_break = True
            stack.clear()
        elif op == "ET":
            in_text = False
            stack.clear()
        elif op == "Tf":
            if len(stack) < 2 or stack[-2][0] != "name":
                raise ValueError("malformed Tf")
            fname = stack[-2][1]
            if fname not in fonts:
                raise ValueError(f"Tf references unknown font /{fname}")
            decoder = _font_decoder(doc, fonts[fname])
            stack.clear()
        elif op == "Tj":
            if not stack or stack[-1][0] != "string":
                raise ValueError("Tj without a string operand")
            show(stack[-1][1])
            stack.clear()
        elif op == "TJ":
            if not stack or stack[-1][0] != "array":
                raise ValueError("TJ without an array operand")
            for k2, v2 in stack[-1][1]:
                if k2 == "string":
                    show(v2)
                elif k2 != "number":
                    raise ValueError(f"bad TJ element {k2}")
            stack.clear()
        elif op in ("'", '"'):
            if not stack or stack[-1][0] != "string":
                raise ValueError(f"{op} without a string operand")
            pending_break = True
            show(stack[-1][1])
            stack.clear()
        elif op in _TEXT_POS_OPS:
            pending_break = True
            stack.clear()
        elif op == "BI":
            raise NotImplementedError(
                "inline image (BI..EI) — raw binary breaks content "
                "tokenization; not supported"
            )
        elif op in _STATE_OPS:
            stack.clear()
        else:
            raise ValueError(f"unknown content operator {op!r}")
    return "".join(out)


# --- public API: extract -------------------------------------------------------------


def extract_pdf_text(b: bytes) -> dict:
    """PDF blob -> {"n_pages": int, "text": str} with pages joined by
    '\\n'. Raises ValueError for malformed files and
    NotImplementedError at the declared boundaries (encryption, xref/
    object streams, CID fonts, non-Flate filters, inline images)."""
    doc = _Document(b)
    root = doc.resolve(doc.trailer.get("Root"))
    if not isinstance(root, dict) or doc.resolve(root.get("Type")) != "Catalog":
        raise ValueError("trailer /Root is not a /Catalog")
    pages_obj = doc.resolve(root.get("Pages"))
    page_texts: list[str] = []

    def walk(node, depth=0):
        node = doc.resolve(node)
        if depth > 64:
            raise ValueError("page tree too deep (cycle?)")
        if not isinstance(node, dict):
            raise ValueError("page-tree node is not a dictionary")
        t = doc.resolve(node.get("Type"))
        if t == "Pages":
            kids = doc.resolve(node.get("Kids"))
            if not isinstance(kids, list):
                raise ValueError("/Pages node without /Kids array")
            for k in kids:
                walk(k, depth + 1)
        elif t == "Page":
            res = doc.resolve(node.get("Resources")) or {}
            fonts = doc.resolve(res.get("Font")) or {}
            contents = doc.resolve(node.get("Contents"))
            if contents is None:
                page_texts.append("")
                return
            parts = contents if isinstance(contents, list) else [contents]
            data = b"".join(
                doc.stream_data(doc.resolve(p)) for p in parts
            )
            page_texts.append(_page_text(doc, data, fonts))
        else:
            raise ValueError(f"unexpected page-tree node type {t!r}")

    walk(pages_obj)
    if not page_texts:
        raise ValueError("PDF has no pages")
    return {"n_pages": len(page_texts), "text": "\n".join(page_texts)}


# --- public API: build (fixture writer) ----------------------------------------------


def _esc_literal(s: str) -> bytes:
    """str -> a PDF literal string body in WinAnsi bytes with ()\\
    escaped."""
    bs = s.encode("cp1252")
    out = bytearray()
    for c in bs:
        if c in (0x28, 0x29, 0x5C):
            out.append(0x5C)
        out.append(c)
    return bytes(out)


def build_pdf(pages: list[list[str]], *, compress: bool = True,
              use_tj_arrays: bool = False) -> bytes:
    """[[line, ...] per page] -> a complete single-update PDF 1.4 file:
    catalog -> /Pages -> one /Page per entry, Helvetica with
    /WinAnsiEncoding, each line shown at a Td-advanced position (Tj, or
    a split TJ array when ``use_tj_arrays``), content streams
    Flate-compressed when ``compress``. The xref table and trailer are
    spec-exact, so any conformant reader opens the output."""
    if not pages:
        raise ValueError("need at least one page")
    objects: dict[int, bytes] = {}
    font_num = 3
    objects[font_num] = (b"<< /Type /Font /Subtype /Type1 "
                         b"/BaseFont /Helvetica "
                         b"/Encoding /WinAnsiEncoding >>")
    page_nums = []
    next_num = 4
    for lines in pages:
        ops = [b"BT", b"/F1 12 Tf", b"72 720 Td"]
        for i, line in enumerate(lines):
            if i:
                ops.append(b"0 -14 Td")
            body = _esc_literal(line)
            if use_tj_arrays and len(body) > 2:
                mid = len(line) // 2
                a = _esc_literal(line[:mid])
                bpart = _esc_literal(line[mid:])
                ops.append(b"[(" + a + b") -120 (" + bpart + b")] TJ")
            else:
                ops.append(b"(" + body + b") Tj")
        ops.append(b"ET")
        content = b"\n".join(ops)
        if compress:
            data = zlib.compress(content, 6)
            sdict = (b"<< /Length " + str(len(data)).encode()
                     + b" /Filter /FlateDecode >>")
        else:
            data = content
            sdict = b"<< /Length " + str(len(data)).encode() + b" >>"
        cnum = next_num
        next_num += 1
        objects[cnum] = sdict + b"\nstream\n" + data + b"\nendstream"
        pnum = next_num
        next_num += 1
        objects[pnum] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 " + str(font_num).encode()
            + b" 0 R >> >> /Contents " + str(cnum).encode() + b" 0 R >>"
        )
        page_nums.append(pnum)
    kids = b" ".join(str(p).encode() + b" 0 R" for p in page_nums)
    objects[2] = (b"<< /Type /Pages /Kids [" + kids + b"] /Count "
                  + str(len(page_nums)).encode() + b" >>")
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += (str(num).encode() + b" 0 obj\n" + objects[num]
                + b"\nendobj\n")
    xref_pos = len(out)
    n = max(objects) + 1
    out += b"xref\n0 " + str(n).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for num in range(1, n):
        out += ("%010d 00000 n \n" % offsets[num]).encode()
    out += (b"trailer\n<< /Size " + str(n).encode()
            + b" /Root 1 0 R >>\nstartxref\n"
            + str(xref_pos).encode() + b"\n%%EOF\n")
    return bytes(out)


# --- Spark kernels (mapInPandas, the codec plan shape) --------------------------------


def synthesize_pdf_blobs(df):
    """Deterministic real-PDF source: per ``doc_id`` a complete PDF
    with 1 + doc_id % 3 pages, page p carrying two lines —

        'Doc {doc_id} page {p}'
        'pay(load) {doc_id*7 + p} €'

    (escaped parentheses + the WinAnsi 0x80 euro, so the literal-string
    escape path and the cp1252 high-byte path both sit under the oracle
    hash). Content streams are Flate-compressed on even doc_ids and raw
    otherwise; every third document shows its lines through split TJ
    arrays with kerning numbers instead of Tj — a closed form
    queries/ext_multimodal.py:pdf_text_report recomputes in SQL."""
    import pandas as pd

    from ..sources.lake import widen

    def kernel(batches):
        for pdf_batch in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf_batch["doc_id"]:
                did = int(doc_id)
                pages = [
                    [f"Doc {did} page {p}",
                     f"pay(load) {did * 7 + p} €"]
                    for p in range(1 + did % 3)
                ]
                out["doc_id"].append(did)
                out["blob"].append(build_pdf(
                    pages,
                    compress=(did % 2 == 0),
                    use_tj_arrays=(did % 3 == 0),
                ))
            yield pd.DataFrame(out)

    # widen the ID SPINE only (blobs do not exist yet; see
    # synthesize_webdataset_shards for the no-payload-shuffle argument)
    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


def pdf_text_features(df):
    """PDF text extraction -> (doc_id, n_pages, n_chars, text) via
    mapInPandas over (doc_id, blob): the full xref -> page tree ->
    content-stream walk of extract_pdf_text, with the COMPLETE
    extracted text surfaced (the strongest possible oracle gate — every
    byte of the assembly rule is value-checked, not just counts)."""
    import pandas as pd

    def kernel(batches):
        for pdf_batch in batches:
            out = {"doc_id": [], "n_pages": [], "n_chars": [], "text": []}
            for doc_id, blob in zip(pdf_batch["doc_id"], pdf_batch["blob"]):
                r = extract_pdf_text(bytes(blob))
                out["doc_id"].append(doc_id)
                out["n_pages"].append(r["n_pages"])
                out["n_chars"].append(len(r["text"]))
                out["text"].append(r["text"])
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(
        kernel, "doc_id long, n_pages int, n_chars long, text string"
    )
