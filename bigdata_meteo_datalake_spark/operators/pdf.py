"""Stdlib-only PDF text extraction — the largest untapped document
source for an LLM corpus. Implements the ISO 32000 / PDF 1.4 subset
that covers the overwhelming majority of born-digital text PDFs:

- classic cross-reference TABLES (``xref`` sections chained by /Prev,
  incremental updates included) located via ``startxref``, AND PDF 1.5
  cross-reference STREAMS (/Type /XRef with /W field widths, /Index
  subsections, Flate + PNG predictors) with type-2 entries resolving
  through compressed OBJECT STREAMS (/ObjStm header-pair layout) — the
  container layout virtually all modern PDFs use;
- the full object grammar: dicts, arrays, names (with #xx escapes),
  numbers, booleans, null, literal strings (all \\-escapes + octal +
  line continuations), hex strings, indirect references, streams;
- stream filters: none or /FlateDecode (zlib — wrapped so corrupt
  deflate data raises ValueError, never a bare zlib.error), plus
  /DecodeParms PNG predictors (Sub/Up/Average/Paeth row filters);
- page-tree walk (/Pages nodes with /Kids, /Contents single or array);
- content-stream text operators: BT..ET blocks, Tj, TJ (kerning
  numbers skipped), ' and ", with Td/TD/T*/Tm/'/" starting a new line;
- simple-font encodings: /WinAnsiEncoding (= Windows code page 1252,
  which the stdlib ships; the five permanently-undefined WinAnsi slots
  raise) and /StandardEncoding (ASCII range; Adobe's high-byte layout
  is NOT cp1252 and is not reconstructed from memory — high bytes
  raise loudly instead of guessing).

DECLARED boundaries (loud, specific raises — not silent wrong text):
encrypted documents (/Encrypt), composite/CID fonts (/Type0, the
subset-embedded-font case where bytes are glyph ids and text recovery
needs the embedded /ToUnicode CMap), /Differences re-encoded fonts,
non-Flate filters (DCT/LZW/ASCII85/...), TIFF predictor 2, Form
XObjects (Do — text painted through an XObject must surface as a
raise, not vanish), and inline images (BI..EI — raw binary that
breaks content tokenization).

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


def _unpredict(data: bytes, predictor: int, columns: int,
               colors: int, bpc: int) -> bytes:
    """Reverse stream predictors (ISO 32000 7.4.4.4): 1 = none,
    10..15 = PNG per-row filters (each row carries its own tag byte —
    None/Sub/Up/Average/Paeth). TIFF predictor 2 and sub-byte
    components are out of scope and raise."""
    if predictor == 1:
        return data
    if predictor == 2:
        raise NotImplementedError("TIFF predictor 2 not supported")
    if predictor < 10 or predictor > 15:
        raise ValueError(f"unknown predictor {predictor}")
    if bpc != 8:
        raise NotImplementedError(
            f"predictor with BitsPerComponent {bpc} not supported"
        )
    rowlen = columns * colors
    if rowlen <= 0:
        raise ValueError("predictor with non-positive row length")
    if len(data) % (rowlen + 1):
        raise ValueError(
            f"predicted stream length {len(data)} is not a multiple of "
            f"row length {rowlen + 1}"
        )
    out = bytearray()
    prev = bytes(rowlen)
    bpp = colors  # bytes per pixel at 8 bits/component
    for r in range(0, len(data), rowlen + 1):
        tag = data[r]
        row = bytearray(data[r + 1 : r + 1 + rowlen])
        if tag == 0:
            pass
        elif tag == 1:  # Sub
            for i in range(bpp, rowlen):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif tag == 2:  # Up
            for i in range(rowlen):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif tag == 3:  # Average
            for i in range(rowlen):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + (left + prev[i]) // 2) & 0xFF
        elif tag == 4:  # Paeth
            for i in range(rowlen):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter tag {tag}")
        out += row
        prev = bytes(row)
    return bytes(out)


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
        # obj num -> ("off", byte_offset) | ("instream", stm_num, idx)
        self.xref: dict[int, tuple] = {}
        self.trailer: dict = {}
        self._cache: dict[int, object] = {}
        self._objstm_cache: dict[int, dict[int, object]] = {}
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
                trailer = self._load_xref_stream(offset)
                if "Encrypt" in trailer:
                    raise NotImplementedError(
                        "encrypted PDF (/Encrypt) — decryption is out of "
                        "scope"
                    )
                for k, v in trailer.items():
                    self.trailer.setdefault(k, v)
                if "Prev" in trailer:
                    offset = int(self.resolve(trailer["Prev"]))
                    continue
                return
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
                        self.xref[start + i] = ("off", int(off))
                    elif typ == b"f":
                        # record the tombstone: an older /Prev section
                        # must not resurrect a freed object (ISO 32000
                        # 7.5.4 — references to it resolve to null)
                        self.xref.setdefault(start + i, ("free",))
                    elif typ != b"n":
                        raise ValueError(f"bad xref entry type {typ!r}")
                    # entries are 20 bytes incl. the 2-byte terminator,
                    # but tolerate 19-byte single-char-EOL writers:
                    # consume the 18 fixed data bytes, then skip AT MOST
                    # two trailing EOL/space bytes. (Testing entry[18]
                    # alone can't detect the short form — in a 19-byte
                    # entry byte 18 IS the lone EOL, which looks exactly
                    # like the start of a 2-byte terminator.)
                    lx.pos += 18
                    for _ in range(2):
                        if b[lx.pos : lx.pos + 1] in (b"\r", b"\n", b" "):
                            lx.pos += 1
                        else:
                            break
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

    def _load_xref_stream(self, offset: int) -> dict:
        """Cross-reference STREAM (ISO 32000 7.5.8): parse the 'N G
        obj' stream at ``offset`` directly (bootstrap — the xref table
        is not available yet, so /Length must be a direct integer),
        decode it through its filters/predictor, and walk the /W-field
        rows over the /Index subsections. Returns the stream dict,
        which doubles as the trailer."""
        lx = _Lexer(self.b, offset)
        k1, n1 = lx.next_token()
        k2, _g = lx.next_token()
        k3, kw = lx.next_token()
        if k1 != "number" or k2 != "number" or (k3, kw) != ("kw", "obj"):
            raise ValueError(f"no xref stream object at offset {offset}")
        d = _parse_value(lx)
        k4, kw4 = lx.next_token()
        if not isinstance(d, dict) or (k4, kw4) != ("kw", "stream"):
            raise ValueError(f"object at offset {offset} is not a stream")
        if self.resolve(d.get("Type")) != "XRef":
            raise ValueError("xref stream object lacks /Type /XRef")
        length = d.get("Length")
        if not isinstance(length, int):
            raise ValueError(
                "xref stream /Length must be a direct integer "
                "(indirect lengths cannot be resolved during bootstrap)"
            )
        p = lx.pos
        if self.b[p : p + 2] == b"\r\n":
            p += 2
        elif self.b[p : p + 1] == b"\n":
            p += 1
        raw = self.b[p : p + length]
        if len(raw) < length:
            raise ValueError("truncated xref stream")
        data = self.stream_data(("stream", d, raw))
        w = [int(self.resolve(x)) for x in self.resolve(d.get("W", []))]
        if len(w) != 3 or any(x < 0 for x in w) or w[1] == 0:
            raise ValueError(f"bad xref stream /W {w}")
        size = int(self.resolve(d.get("Size", 0)))
        index = [int(self.resolve(x))
                 for x in self.resolve(d.get("Index", [0, size]))]
        if len(index) % 2:
            raise ValueError("odd-length xref stream /Index")
        rowlen = sum(w)
        pos = 0
        for s in range(0, len(index), 2):
            start, count = index[s], index[s + 1]
            for i in range(count):
                if pos + rowlen > len(data):
                    raise ValueError("xref stream data shorter than /Index")
                fields = []
                for width in w:
                    v = int.from_bytes(data[pos : pos + width], "big")
                    pos += width
                    fields.append(v)
                typ = fields[0] if w[0] else 1
                num = start + i
                if num in self.xref:
                    continue  # newest update wins
                if typ == 1:
                    self.xref[num] = ("off", fields[1])
                elif typ == 2:
                    self.xref[num] = ("instream", fields[1], fields[2])
                elif typ == 0:
                    # freed-object tombstone (see the classic-table walk)
                    self.xref[num] = ("free",)
                else:
                    raise ValueError(f"bad xref stream entry type {typ}")
        return d

    def _objstm_objects(self, stm_num: int) -> dict[int, object]:
        """Load and cache an object stream (/ObjStm, ISO 32000 7.5.7):
        N (objnum, offset) integer pairs, then the object bodies
        starting at /First."""
        if stm_num in self._objstm_cache:
            return self._objstm_cache[stm_num]
        obj = self.get_object(stm_num)
        if not (isinstance(obj, tuple) and obj[0] == "stream"
                and self.resolve(obj[1].get("Type")) == "ObjStm"):
            raise ValueError(f"object {stm_num} is not an /ObjStm")
        d = obj[1]
        data = self.stream_data(obj, allow_objstm=True)
        n = int(self.resolve(d.get("N", 0)))
        first = int(self.resolve(d.get("First", 0)))
        hlx = _Lexer(data[:first])
        pairs = []
        for _ in range(n):
            ka, va = hlx.next_token()
            kb, vb = hlx.next_token()
            if ka != "number" or kb != "number":
                raise ValueError("malformed /ObjStm header pairs")
            pairs.append((va, vb))
        out: dict[int, object] = {}
        for num, off in pairs:
            out[num] = _parse_value(_Lexer(data, first + off))
        self._objstm_cache[stm_num] = out
        return out

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
        entry = self.xref[num]
        if entry[0] == "free":
            return None  # ISO 32000 7.5.4: refs to freed objects are null
        if entry[0] == "instream":
            objs = self._objstm_objects(entry[1])
            if num not in objs:
                raise ValueError(
                    f"object {num} not found in /ObjStm {entry[1]}"
                )
            self._cache[num] = objs[num]
            return objs[num]
        lx = _Lexer(self.b, entry[1])
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

    def stream_data(self, obj, *, allow_objstm: bool = False) -> bytes:
        """Decode a ('stream', dict, raw) object through its filters
        and predictor. /ObjStm payloads are only decodable through the
        dedicated loader (``allow_objstm`` guards against a content
        walk treating one as page data)."""
        if not (isinstance(obj, tuple) and obj[0] == "stream"):
            raise ValueError("expected a stream object")
        d, raw = obj[1], obj[2]
        if d.get("Type") == "ObjStm" and not allow_objstm:
            raise ValueError(
                "/ObjStm used where a data stream was expected"
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
        parms = self.resolve(d.get("DecodeParms"))
        if parms is not None:
            if not isinstance(parms, dict):
                raise ValueError("/DecodeParms is not a dictionary")
            data = _unpredict(
                data,
                int(self.resolve(parms.get("Predictor", 1))),
                int(self.resolve(parms.get("Columns", 1))),
                int(self.resolve(parms.get("Colors", 1))),
                int(self.resolve(parms.get("BitsPerComponent", 8))),
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
    "MP": 1, "DP": 2, "BMC": 1, "BDC": 2, "EMC": 0,
}


def _page_text(doc: _Document, content: bytes, fonts: dict,
               xobjects: dict | None = None) -> str:
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
        elif op == "Do":
            # Image XObjects are a paint with NO text — consuming them
            # silently is correct (pages embedding pictures next to
            # text are among the most common real-world shapes). Only
            # FORM XObjects can hide text, and those must fail loud.
            if not stack or stack[-1][0] != "name":
                raise ValueError("Do without a name operand")
            xname = stack[-1][1]
            xo = doc.resolve((xobjects or {}).get(xname))
            if xo is None:
                raise ValueError(f"Do references unknown XObject /{xname}")
            if not (isinstance(xo, tuple) and xo[0] == "stream"):
                raise ValueError(
                    f"XObject /{xname} is not a stream (corrupt input)"
                )
            sub = doc.resolve(xo[1].get("Subtype"))
            if sub != "Image":
                raise NotImplementedError(
                    f"XObject /{xname} has /Subtype /{sub} — text inside "
                    "Form XObjects is not extracted, and dropping it "
                    "silently would violate the no-silent-wrong-text "
                    "policy"
                )
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
    '\\n'. Both container generations parse (classic xref tables AND
    PDF 1.5 xref/object streams). Raises ValueError for malformed
    files and NotImplementedError at the declared boundaries
    (encryption, CID fonts, non-Flate filters, Form XObjects,
    inline images)."""
    doc = _Document(b)
    root = doc.resolve(doc.trailer.get("Root"))
    if not isinstance(root, dict) or doc.resolve(root.get("Type")) != "Catalog":
        raise ValueError("trailer /Root is not a /Catalog")
    pages_obj = doc.resolve(root.get("Pages"))
    page_texts: list[str] = []

    def walk(node, depth=0, inherited_res=None):
        node = doc.resolve(node)
        if depth > 64:
            raise ValueError("page tree too deep (cycle?)")
        if not isinstance(node, dict):
            raise ValueError("page-tree node is not a dictionary")
        t = doc.resolve(node.get("Type"))
        # /Resources is INHERITABLE (ISO 32000 7.7.3.4): a page without
        # its own dict uses the nearest ancestor /Pages node's
        own_res = doc.resolve(node.get("Resources"))
        res = own_res if own_res is not None else inherited_res
        if t == "Pages":
            kids = doc.resolve(node.get("Kids"))
            if not isinstance(kids, list):
                raise ValueError("/Pages node without /Kids array")
            for k in kids:
                walk(k, depth + 1, res)
        elif t == "Page":
            res = res or {}
            fonts = doc.resolve(res.get("Font")) or {}
            contents = doc.resolve(node.get("Contents"))
            if contents is None:
                page_texts.append("")
                return
            parts = contents if isinstance(contents, list) else [contents]
            data = b"".join(
                doc.stream_data(doc.resolve(p)) for p in parts
            )
            xobjects = doc.resolve(res.get("XObject")) or {}
            page_texts.append(_page_text(doc, data, fonts, xobjects))
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
              use_tj_arrays: bool = False, xref_stream: bool = False,
              use_objstm: bool = False) -> bytes:
    """[[line, ...] per page] -> a complete single-update PDF file:
    catalog -> /Pages -> one /Page per entry, Helvetica with
    /WinAnsiEncoding, each line shown at a Td-advanced position (Tj, or
    a split TJ array when ``use_tj_arrays``), content streams
    Flate-compressed when ``compress``. With ``xref_stream`` the
    cross-reference is written as a PDF 1.5 /XRef STREAM (W [1 4 2],
    Flate + PNG Up predictor); with ``use_objstm`` (requires
    ``xref_stream`` — type-2 entries only exist there) every
    non-stream object is packed into a compressed /ObjStm. Classic
    output keeps the spec-exact xref table + trailer; any conformant
    reader opens either form."""
    if not pages:
        raise ValueError("need at least one page")
    if use_objstm and not xref_stream:
        raise ValueError("/ObjStm requires an xref stream (type-2 entries)")
    objects: dict[int, bytes] = {}
    font_num = 3
    objects[font_num] = (b"<< /Type /Font /Subtype /Type1 "
                         b"/BaseFont /Helvetica "
                         b"/Encoding /WinAnsiEncoding >>")
    page_nums = []
    stream_nums: set[int] = set()
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
        stream_nums.add(cnum)
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

    version = b"1.5" if xref_stream else b"1.4"
    out = bytearray(b"%PDF-" + version + b"\n%\xe2\xe3\xcf\xd3\n")
    entries: dict[int, tuple] = {}  # num -> (type, f2, f3)

    if use_objstm:
        packed = sorted(n_ for n_ in objects if n_ not in stream_nums)
        stm_num = max(objects) + 1
        offs, bodies, cur = [], [], 0
        for n_ in packed:
            body = objects[n_] + b"\n"
            offs.append(cur)
            bodies.append(body)
            cur += len(body)
        pairs = (" ".join(f"{n_} {o}" for n_, o in zip(packed, offs))
                 .encode() + b"\n")
        data = zlib.compress(pairs + b"".join(bodies), 6)
        objects = {n_: v for n_, v in objects.items()
                   if n_ in stream_nums}
        objects[stm_num] = (
            b"<< /Type /ObjStm /N " + str(len(packed)).encode()
            + b" /First " + str(len(pairs)).encode()
            + b" /Length " + str(len(data)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + data
            + b"\nendstream"
        )
        for idx, n_ in enumerate(packed):
            entries[n_] = (2, stm_num, idx)

    for num in sorted(objects):
        entries[num] = (1, len(out), 0)
        out += (str(num).encode() + b" 0 obj\n" + objects[num]
                + b"\nendobj\n")

    if xref_stream:
        xnum = max(entries) + 1
        xref_pos = len(out)
        entries[xnum] = (1, xref_pos, 0)
        size = xnum + 1
        rowlen = 1 + 4 + 2
        raw = bytearray()
        prev = bytes(rowlen)
        for num in range(size):
            t, f2, f3 = entries.get(num, (0, 0, 65535))
            row = (bytes([t]) + f2.to_bytes(4, "big")
                   + f3.to_bytes(2, "big"))
            # PNG Up filter (predictor 12): delta against the prior row
            raw.append(2)
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(rowlen))
            prev = row
        data = zlib.compress(bytes(raw), 6)
        out += (
            str(xnum).encode() + b" 0 obj\n<< /Type /XRef /Size "
            + str(size).encode() + b" /W [1 4 2] /Root 1 0 R /Length "
            + str(len(data)).encode()
            + b" /Filter /FlateDecode /DecodeParms << /Predictor 12 "
            b"/Columns " + str(rowlen).encode() + b" >> >>\nstream\n"
            + data + b"\nendstream\nendobj\n"
        )
        out += (b"startxref\n" + str(xref_pos).encode() + b"\n%%EOF\n")
        return bytes(out)

    xref_pos = len(out)
    n = max(objects) + 1
    out += b"xref\n0 " + str(n).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for num in range(1, n):
        out += ("%010d 00000 n \n" % entries[num][1]).encode()
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
                # container style cycles too: two thirds of documents
                # use the modern PDF 1.5 xref-stream layout, a third of
                # those with every non-stream object packed in an
                # /ObjStm — the oracle hash is container-independent,
                # so all three layouts sit under one gate
                out["blob"].append(build_pdf(
                    pages,
                    compress=(did % 2 == 0),
                    use_tj_arrays=(did % 3 == 0),
                    xref_stream=(did % 3 != 2),
                    use_objstm=(did % 3 == 0),
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
