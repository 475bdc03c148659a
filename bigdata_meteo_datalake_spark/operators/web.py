"""Web-ingestion operators — the entry point of a CommonCrawl-scale
pretraining pipeline: WARC record parsing (the crawl container format)
and HTML text extraction (stdlib ``html.parser``), both as Arrow-batched
mapInPandas kernels over (doc_id, blob) with synthesizable fixtures so
the full parse paths sit under DuckDB oracle hashes
(queries/ext_multimodal.py:warc_response_report / html_extract_report).

- WARC (ISO 28500): version line + CRLF headers + Content-Length-framed
  payload + blank-line separators. The parser walks every record,
  validates framing, and surfaces response records with their target
  URI, HTTP status (parsed from the enclosed HTTP response), and body
  size — the fields a crawl-filtering job keys on.
- HTML: a tolerant ``HTMLParser`` subclass that drops <script>/<style>
  content, captures <title>, collects body text nodes (entity-decoded
  by the stdlib), normalizes whitespace, and counts/collects <a href>
  links — the boilerplate-light extraction every web corpus starts
  from. Real-world tag soup parses tolerantly (that is the stdlib
  parser's contract); the oracle fixtures are well-formed by
  construction.

Scale: pure per-blob kernels — zero exchanges, the codec plan shape. A
100 TB crawl arrives as pre-split WARC files; both parsers stream
per-record with no cross-record state.

Reference parity note: the reference repo has no web-ingestion layer
(SURVEY.md section 4); these belong to the training-data pillar.
"""

from __future__ import annotations

from html.parser import HTMLParser

__all__ = [
    "extract_html",
    "encode_warc",
    "parse_warc",
]

_CRLF = b"\r\n"


class _Extractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.title_parts: list[str] = []
        self.chunks: list[str] = []
        self.links: list[str] = []
        self._skip = 0  # inside script/style
        self._in_title = False

    def handle_starttag(self, tag, attrs):
        if tag in ("script", "style"):
            self._skip += 1
        elif tag == "title":
            self._in_title = True
        elif tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.links.append(v)

    def handle_endtag(self, tag):
        if tag in ("script", "style") and self._skip:
            self._skip -= 1
        elif tag == "title":
            self._in_title = False

    def handle_data(self, data):
        if self._skip:
            return
        if self._in_title:
            self.title_parts.append(data)
        else:
            self.chunks.append(data)


def extract_html(html: str) -> dict:
    """HTML -> {title, text, links}: script/style dropped, entities
    decoded, whitespace normalized (any run -> one space, ends
    stripped), links = href values of <a> in document order."""
    p = _Extractor()
    p.feed(html)
    p.close()
    return {
        "title": " ".join("".join(p.title_parts).split()),
        "text": " ".join(" ".join(p.chunks).split()),
        "links": p.links,
    }


def encode_warc(records: list[dict]) -> bytes:
    """Record dicts -> a WARC/1.0 file. Each record:
    {"type": "warcinfo"|"response"|..., "uri": str|None,
    "payload": bytes} — headers are framed per ISO 28500 (Content-Length
    + double-CRLF record separator)."""
    out = bytearray()
    for i, r in enumerate(records):
        payload = r["payload"]
        out += b"WARC/1.0" + _CRLF
        out += b"WARC-Type: " + r["type"].encode() + _CRLF
        out += (b"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-"
                + str(i).zfill(12).encode() + b">" + _CRLF)
        out += b"WARC-Date: 2024-01-01T00:00:00Z" + _CRLF
        if r.get("uri"):
            out += b"WARC-Target-URI: " + r["uri"].encode() + _CRLF
        if r["type"] == "response":
            out += (b"Content-Type: application/http;msgtype=response"
                    + _CRLF)
        out += b"Content-Length: " + str(len(payload)).encode() + _CRLF
        out += _CRLF + payload + _CRLF + _CRLF
    return bytes(out)


def parse_warc(b: bytes) -> list[dict]:
    """WARC file -> [{type, uri, headers, payload}] with framing
    validated (version line, Content-Length, record separators)."""
    records = []
    pos = 0
    n = len(b)
    while pos < n:
        eol = b.find(_CRLF, pos)
        if eol < 0:
            raise ValueError("truncated WARC version line")
        version = b[pos:eol]
        if not version.startswith(b"WARC/"):
            raise ValueError(f"bad WARC version line {version[:20]!r}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = b.find(_CRLF, pos)
            if eol < 0:
                raise ValueError("truncated WARC header block")
            line = b[pos:eol]
            pos = eol + 2
            if not line:
                break
            if b":" not in line:
                raise ValueError(f"malformed WARC header {line[:40]!r}")
            k, v = line.split(b":", 1)
            headers[k.decode().strip().lower()] = v.decode().strip()
        try:
            ln = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("WARC record missing valid Content-Length")
        payload = b[pos : pos + ln]
        if len(payload) != ln:
            raise ValueError("truncated WARC payload")
        pos += ln
        if b[pos : pos + 4] != _CRLF + _CRLF:
            raise ValueError("WARC record missing the blank-line separator")
        pos += 4
        records.append(
            {
                "type": headers.get("warc-type", ""),
                "uri": headers.get("warc-target-uri"),
                "headers": headers,
                "payload": payload,
            }
        )
    if not records:
        raise ValueError("empty WARC file")
    return records


def http_response_status(payload: bytes) -> int:
    """Status code from an HTTP response payload's first line."""
    eol = payload.find(_CRLF)
    line = payload[: eol if eol >= 0 else len(payload)].decode(
        "ascii", "replace"
    )
    parts = line.split(" ")
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        raise ValueError(f"not an HTTP response payload: {line[:40]!r}")
    try:
        return int(parts[1])
    except ValueError:
        raise ValueError(f"bad HTTP status in {line[:40]!r}")


def _dechunk(b: bytes) -> bytes:
    """Reverse HTTP/1.1 Transfer-Encoding: chunked (RFC 9112 7.1):
    hex size lines (chunk extensions ignored), CRLF-terminated chunks,
    a zero-size terminator. Malformed framing raises ValueError."""
    out = bytearray()
    pos = 0
    while True:
        eol = b.find(_CRLF, pos)
        if eol < 0:
            raise ValueError("chunked body missing a size line")
        size_tok = b[pos:eol].split(b";")[0].strip()
        # RFC 9112: 1*HEXDIG only — int(x, 16) would also accept
        # signs, '0x' prefixes, and underscores, and a negative size
        # silently swallows data instead of raising
        if not size_tok or any(c not in b"0123456789abcdefABCDEF"
                               for c in size_tok):
            raise ValueError(f"bad chunk size line {size_tok!r}")
        size = int(size_tok, 16)
        pos = eol + 2
        if size == 0:
            return bytes(out)  # trailers, if any, are ignorable here
        if pos + size + 2 > len(b):
            raise ValueError("truncated chunk")
        out += b[pos : pos + size]
        if b[pos + size : pos + size + 2] != _CRLF:
            raise ValueError("chunk missing its CRLF terminator")
        pos += size + 2


def http_response_body(payload: bytes) -> bytes:
    """DECODED body bytes of an HTTP response payload: header block
    split off, Transfer-Encoding: chunked reversed, Content-Encoding:
    gzip inflated — the two framings CommonCrawl responses actually
    carry. Unknown transfer or content codings raise ValueError
    (reporting a still-encoded body as text is silent corruption)."""
    sep = payload.find(_CRLF + _CRLF)
    if sep < 0:
        raise ValueError("HTTP response payload missing header separator")
    headers: dict[str, str] = {}
    for line in payload[:sep].decode("latin-1").split("\r\n")[1:]:
        if ":" in line:
            k, v = line.split(":", 1)
            headers[k.strip().lower()] = v.strip()
    body = payload[sep + 4 :]
    te = headers.get("transfer-encoding", "").lower()
    if te:
        if te != "chunked":
            raise ValueError(f"unsupported Transfer-Encoding {te!r}")
        body = _dechunk(body)
    ce = headers.get("content-encoding", "").lower()
    if ce and ce != "identity":
        if ce != "gzip":
            raise ValueError(f"unsupported Content-Encoding {ce!r}")
        import gzip as _gzip

        try:
            body = _gzip.decompress(body)
        except OSError as e:
            raise ValueError(f"corrupt gzip body ({e})") from e
    return body


# --- Spark kernels (mapInPandas, the codec plan shape) --------------------------------


def synthesize_html_blobs(df):
    """Deterministic real-HTML source derived from each document's text:

      title = 'Doc {doc_id}',
      body  = the text's words split into 1 + doc_id % 4 contiguous
              paragraphs (<p> inside nested <div>s),
      footer with doc_id % 5 links (<a href="https://example.com/
      {doc_id}/{i}">ref{i}</a>),
      plus a <script> (containing a '<' to exercise CDATA handling),
      a <style> block, and an HTML comment — all of which extraction
      must DROP.

    The extracted text is therefore the original normalized text plus
    the ' ref{i}' anchors — a closed form the SQL oracle recomputes
    (queries/ext_multimodal.py:html_extract_report)."""
    import pandas as pd

    from ..sources.lake import widen

    def kernel(batches):
        import html as _html

        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(doc_id)
                words = str(text).split()
                np_ = 1 + did % 4
                paras = []
                for i in range(np_):
                    lo = len(words) * i // np_
                    hi = len(words) * (i + 1) // np_
                    # escape, so any future testdata content with <&>
                    # survives: the extractor's entity decode inverts it,
                    # keeping the closed form (and exercising that path)
                    paras.append(_html.escape(" ".join(words[lo:hi])))
                links = "".join(
                    f'<a href="https://example.com/{did}/{i}">ref{i}</a> '
                    for i in range(did % 5)
                )
                html = (
                    "<!DOCTYPE html><html><head>"
                    f"<title>Doc {did}</title>"
                    f"<style>p {{color: red}}</style>"
                    f"<script>var x = {did} < 99;</script>"
                    "</head><body><!-- synthesized fixture -->"
                    + "".join(f"<div><p>{p}</p></div>" for p in paras)
                    + f"<div>{links}</div>"
                    "</body></html>"
                )
                out["doc_id"].append(did)
                out["blob"].append(html.encode("utf-8"))
            yield pd.DataFrame(out)

    # the id+text spine is the actual source payload here (no blob
    # exists yet); widen so a single-split table doesn't serialize
    return widen(df.select("doc_id", "text")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


def html_text_features(df):
    """HTML extraction -> (doc_id, title, n_links, n_chars) via
    mapInPandas over (doc_id, blob): stdlib-parser extraction with
    script/style dropped and whitespace normalized."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            out = {"doc_id": [], "title": [], "n_links": [], "n_chars": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                r = extract_html(bytes(blob).decode("utf-8"))
                out["doc_id"].append(doc_id)
                out["title"].append(r["title"])
                out["n_links"].append(len(r["links"]))
                out["n_chars"].append(len(r["text"]))
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(
        kernel, "doc_id long, title string, n_links int, n_chars long"
    )


def synthesize_warc_blobs(df):
    """Deterministic WARC source: per doc_id one WARC file holding a
    warcinfo record plus 1 + doc_id % 3 HTTP response records —

      record i: URI https://ex.com/{doc_id}/{i},
                status (200, 404, 301)[(doc_id + i) % 3],
                body 'body-{doc_id}-{i}-' + 'x' * ((doc_id*7 + i*13) % 50)

    — every field a closed form the SQL oracle recomputes
    (queries/ext_multimodal.py:warc_response_report)."""
    import pandas as pd

    from ..sources.lake import widen

    def kernel(batches):
        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                records = [
                    {"type": "warcinfo", "uri": None,
                     "payload": b"software: fixture\r\n"},
                ]
                for i in range(1 + did % 3):
                    status = (200, 404, 301)[(did + i) % 3]
                    body = (f"body-{did}-{i}-"
                            + "x" * ((did * 7 + i * 13) % 50)).encode()
                    # body framing cycles the three real CommonCrawl
                    # shapes; the DECODED length is the oracle's closed
                    # form, so all three sit under one hash
                    framing = (did + 2 * i) % 3
                    if framing == 0:  # identity + Content-Length
                        wire = body
                        extra = f"Content-Length: {len(body)}\r\n"
                    elif framing == 1:  # Transfer-Encoding: chunked
                        half = len(body) // 2
                        wire = b""
                        for chunk in (body[:half], body[half:]):
                            wire += (f"{len(chunk):x}\r\n".encode()
                                     + chunk + b"\r\n")
                        wire += b"0\r\n\r\n"
                        extra = "Transfer-Encoding: chunked\r\n"
                    else:  # Content-Encoding: gzip
                        import gzip as _gzip

                        wire = _gzip.compress(body, mtime=0)
                        extra = ("Content-Encoding: gzip\r\n"
                                 f"Content-Length: {len(wire)}\r\n")
                    payload = (
                        f"HTTP/1.1 {status} X\r\n"
                        f"Content-Type: text/html\r\n"
                        f"{extra}\r\n"
                    ).encode() + wire
                    records.append({
                        "type": "response",
                        "uri": f"https://ex.com/{did}/{i}",
                        "payload": payload,
                    })
                out["doc_id"].append(did)
                out["blob"].append(encode_warc(records))
            yield pd.DataFrame(out)

    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


def warc_response_features(df):
    """WARC parse -> one row per RESPONSE record: (doc_id, record_idx,
    target_uri, http_status, body_bytes) via mapInPandas — the
    crawl-filtering projection (non-response records are skipped, the
    framing of every record is still validated)."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            out = {"doc_id": [], "record_idx": [], "target_uri": [],
                   "http_status": [], "body_bytes": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                idx = 0
                for rec in parse_warc(bytes(blob)):
                    if rec["type"] != "response":
                        continue
                    out["doc_id"].append(doc_id)
                    out["record_idx"].append(idx)
                    out["target_uri"].append(rec["uri"])
                    out["http_status"].append(
                        http_response_status(rec["payload"])
                    )
                    out["body_bytes"].append(
                        len(http_response_body(rec["payload"]))
                    )
                    idx += 1
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(
        kernel,
        "doc_id long, record_idx int, target_uri string, http_status int, "
        "body_bytes long",
    )


#: query parameters that never affect content (tracking/campaign ids)
TRACKING_PARAMS = ("fbclid", "gclid", "msclkid")


def canonicalize_url(url: str) -> str:
    """Canonical URL form for crawl dedup/grouping: scheme and host
    lowercased, default ports stripped (http:80, https:443), fragment
    dropped, tracking parameters removed (utm_* and the click ids),
    remaining query parameters sorted by (key, value), empty path
    normalized to '/'. Percent-encoding and other octets pass through
    untouched — canonicalization must never CHANGE what a URL
    addresses, only collapse provably-equivalent spellings."""
    from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

    p = urlsplit(url)
    scheme = p.scheme.lower()
    host = (p.hostname or "").lower()
    port = p.port
    if port and not (
        (scheme == "http" and port == 80)
        or (scheme == "https" and port == 443)
    ):
        host = f"{host}:{port}"
    path = p.path or "/"
    pairs = [
        (k, v)
        for k, v in parse_qsl(p.query, keep_blank_values=True)
        if not k.startswith("utm_") and k not in TRACKING_PARAMS
    ]
    query = urlencode(sorted(pairs))
    return urlunsplit((scheme, host, path, query, ""))


def registered_domain(host: str) -> str:
    """Naive registered domain: the last two dot-labels (a real
    deployment swaps in the public-suffix list; the grouping shape is
    identical)."""
    labels = host.split(":")[0].split(".")
    return ".".join(labels[-2:]) if len(labels) >= 2 else host


def synthesize_urls(df):
    """Deterministic messy-URL source cycling six canonicalization
    cases by doc_id % 6: mixed-case scheme/host, explicit default
    ports, utm_*/click-id tracking params, unsorted query params,
    fragments, and missing paths."""
    from pyspark.sql import functions as F

    did = F.col("doc_id")
    v = did % 6
    url = (
        F.when(v == 0, F.concat(F.lit("https://Example.COM/p/"), did))
        .when(v == 1, F.concat(F.lit("HTTP://site"), did % 7,
                               F.lit(".org:80/a/b?z=2&a=1")))
        .when(v == 2, F.concat(F.lit("https://www.Data.NET:443/x?utm_source=t&q="), did))
        .when(v == 3, F.concat(F.lit("https://ex.com/p#frag"), did))
        .when(v == 4, F.concat(F.lit("http://H"), did % 9, F.lit(".io")))
        .otherwise(F.concat(F.lit("https://a.b.c.org/d?b=2&a=1&utm_medium=m&fbclid=x"), did))
    )
    return df.select("doc_id", url.alias("url"))


def canonical_urls(df):
    """(doc_id, url) -> (doc_id, url_canonical, domain) via mapInPandas
    (urllib is Python-side; the per-row work is pure string munging
    with no cross-row state — a zero-shuffle scan-map at any scale)."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            canon = [canonicalize_url(u) for u in pdf["url"]]
            from urllib.parse import urlsplit

            dom = [registered_domain(urlsplit(c).netloc) for c in canon]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "url_canonical": canon,
                "domain": dom,
            })

    return df.select("doc_id", "url").mapInPandas(
        kernel, "doc_id long, url_canonical string, domain string"
    )


# --- compressed JSONL corpus shards (the text-corpus shipping format) -----------------


def compress_jsonl(lines: list[dict], codec: str = "gzip") -> bytes:
    """JSON records -> one compressed JSONL shard (gzip / bz2 / xz via
    stdlib, plus lz4 frames — hand-rolled full codec — and zstd frames
    in the raw-block form, operators/lz4zstd.py: legal zstd any
    decoder accepts, entropy coding deliberately absent)."""
    import bz2
    import gzip
    import json
    import lzma

    raw = ("\n".join(json.dumps(r, sort_keys=True) for r in lines) + "\n"
           ).encode("utf-8")
    if codec == "gzip":
        return gzip.compress(raw, mtime=0)  # mtime=0: deterministic bytes
    if codec == "bz2":
        return bz2.compress(raw)
    if codec == "xz":
        return lzma.compress(raw)
    if codec == "lz4":
        from .lz4zstd import lz4_frame_compress

        return lz4_frame_compress(raw)
    if codec == "zstd":
        from .lz4zstd import build_zstd_frame

        return build_zstd_frame(raw, block_size=256)
    raise ValueError(f"codec must be gzip/bz2/xz/lz4/zstd, got {codec!r}")


def decompress_jsonl(b: bytes) -> list[dict]:
    """Compressed JSONL shard -> records; the codec is sniffed from
    magic bytes (gzip 1f8b, bz2 'BZh', xz fd377a58, lz4 0x184D2204,
    zstd 0xFD2FB528). Corrupt streams and malformed JSON raise
    ValueError; a zstd shard whose blocks are entropy-coded raises
    NotImplementedError (the declared boundary — raw/RLE-block zstd
    decodes fully)."""
    import bz2
    import gzip
    import json
    import lzma
    import zlib

    from .lz4zstd import LZ4_FRAME_MAGIC, ZSTD_FRAME_MAGIC

    try:
        if b[:2] == b"\x1f\x8b":
            raw = gzip.decompress(b)
        elif b[:3] == b"BZh":
            raw = bz2.decompress(b)
        elif b[:6] == b"\xfd7zXZ\x00":
            raw = lzma.decompress(b)
        elif b[:4] == LZ4_FRAME_MAGIC:
            from .lz4zstd import lz4_frame_decompress

            raw = lz4_frame_decompress(b)
        elif b[:4] == ZSTD_FRAME_MAGIC:
            from .lz4zstd import zstd_decompress

            raw = zstd_decompress(b)
        else:
            raise ValueError("unknown compression magic")
    except (OSError, EOFError, lzma.LZMAError, zlib.error) as e:
        # zlib.error: gzip.decompress leaks it raw for DEFLATE-stream
        # corruption (BadGzipFile/OSError covers only the gzip header
        # and trailer) — mutation-fuzz finding
        raise ValueError(f"corrupt compressed shard ({e})") from e
    out = []
    for i, line in enumerate(raw.decode("utf-8").splitlines()):
        if not line.strip():
            continue
        try:
            out.append(json.loads(line))
        except json.JSONDecodeError as e:
            raise ValueError(f"malformed JSONL at line {i}: {e}") from e
    if not out:
        raise ValueError("empty JSONL shard")
    return out


def synthesize_jsonl_shards(df):
    """Deterministic compressed-JSONL source: per doc_id one shard of
    1 + doc_id % 4 records {"id": "{doc_id}-{i}", "n": doc_id*7 + i},
    compression cycling gzip/bz2/xz/lz4/zstd by doc_id % 5 (the report
    oracle is codec-independent by design — the records are what's
    checked, so the cycle can grow with the front door)."""
    import pandas as pd

    from ..sources.lake import widen

    def kernel(batches):
        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                lines = [{"id": f"{did}-{i}", "n": did * 7 + i}
                         for i in range(1 + did % 4)]
                codec = ("gzip", "bz2", "xz", "lz4", "zstd")[did % 5]
                out["doc_id"].append(did)
                out["blob"].append(compress_jsonl(lines, codec))
            yield pd.DataFrame(out)

    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


def jsonl_shard_records(df):
    """Compressed-JSONL demux -> one row per record: (doc_id, line_idx,
    record_id, n) via mapInPandas, codec sniffed per blob."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            out = {"doc_id": [], "line_idx": [], "record_id": [], "n": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                for i, rec in enumerate(decompress_jsonl(bytes(blob))):
                    out["doc_id"].append(doc_id)
                    out["line_idx"].append(i)
                    out["record_id"].append(str(rec.get("id", "")))
                    out["n"].append(int(rec.get("n", 0)))
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(
        kernel, "doc_id long, line_idx int, record_id string, n long"
    )


# --- robots.txt crawl-policy admission (the corpus-admission gate) --------------------


def build_robots_txt(site: int) -> str:
    """Deterministic per-site robots.txt cycling three policy shapes by
    site % 3 — 0: path rules (an Allow override above Disallow
    prefixes), 1: full disallow, 2: empty disallow (allow all) — each
    preceded by a specific-agent entry that blocks everything, so the
    '*'-agent entry selection of urllib.robotparser is what the oracle
    actually checks (a parser that matched the wrong entry would deny
    every URL)."""
    head = "User-agent: special-bot\nDisallow: /\n\n"
    kind = site % 3
    if kind == 0:
        return (head + "User-agent: *\nAllow: /private/open/\n"
                "Disallow: /private/\nDisallow: /tmp/\n")
    if kind == 1:
        return head + "User-agent: *\nDisallow: /\n"
    return head + "User-agent: *\nDisallow:\n"


def synthesize_crawl_urls(df):
    """Deterministic crawl-frontier source (JVM-side concat, no
    kernel): url = 'https://site{doc_id % 10}.example' + a path cycling
    /public/{id}, /private/{id}, /tmp/x{id}, /private/open/{id} by
    doc_id % 4 — one URL per document, hitting every (site policy,
    path class) combination."""
    from pyspark.sql import functions as F

    did = F.col("doc_id")
    path = (
        F.when(did % 4 == 0, F.concat(F.lit("/public/"), did))
        .when(did % 4 == 1, F.concat(F.lit("/private/"), did))
        .when(did % 4 == 2, F.concat(F.lit("/tmp/x"), did))
        .otherwise(F.concat(F.lit("/private/open/"), did))
    )
    domain = F.concat(F.lit("site"), did % 10, F.lit(".example"))
    return df.select(
        "doc_id",
        domain.alias("domain"),
        F.concat(F.lit("https://"), domain, path).alias("url"),
    )


def synthesize_robots_table(spark):
    """The per-domain robots dimension: (domain, robots_txt) for the
    ten fixture sites — the relation a crawler materializes once per
    registered domain and joins against millions of frontier URLs."""
    import pandas as pd

    rows = pd.DataFrame({
        "domain": [f"site{s}.example" for s in range(10)],
        "robots_txt": [build_robots_txt(s) for s in range(10)],
    })
    return spark.createDataFrame(rows)


def robots_admission(urls, robots):
    """Crawl-policy admission — the missing step between WARC parsing
    and corpus admission: broadcast-join the tiny per-domain robots
    dimension onto the URL frontier, then evaluate each URL with
    urllib.robotparser ('*' agent, genuine first-match/entry-selection
    semantics) in an Arrow-batched kernel that parses each domain's
    robots.txt ONCE per batch. -> (doc_id, url, domain, allowed).

    A frontier domain MISSING from the robots dimension is admitted
    (allowed = true): per the web convention (RFC 9309 section 2.3.1.2
    — no robots.txt means unrestricted access), and a LEFT join keeps
    the row so unmatched domains surface in the output instead of
    silently vanishing from the frontier (the repo's fail-loud policy;
    an inner join here would make a fetch-failure look like a
    disallow).

    Scale: the robots side is one row per registered domain (always
    broadcastable); the URL side never shuffles — a scan-map pass with
    a map-side join at any corpus size."""
    import pandas as pd
    from pyspark.sql import functions as F

    joined = urls.join(F.broadcast(robots), "domain", "left")

    def kernel(batches):
        from urllib.robotparser import RobotFileParser

        for pdf in batches:
            parsers: dict[str, RobotFileParser] = {}
            allowed = []
            for dom, txt, url in zip(pdf["domain"], pdf["robots_txt"],
                                     pdf["url"]):
                if txt is None or (isinstance(txt, float) and pd.isna(txt)):
                    # domain absent from the robots dimension: no
                    # robots.txt -> everything is fetchable
                    allowed.append(True)
                    continue
                rp = parsers.get(dom)
                if rp is None:
                    rp = RobotFileParser()
                    rp.parse(str(txt).splitlines())
                    parsers[dom] = rp
                allowed.append(bool(rp.can_fetch("*", str(url))))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "url": pdf["url"],
                "domain": pdf["domain"], "allowed": allowed,
            })

    return joined.select("doc_id", "url", "domain", "robots_txt").mapInPandas(
        kernel, "doc_id long, url string, domain string, allowed boolean"
    )


# --- data-URI image extraction (HTML -> embedded media) -------------------------------


def synthesize_html_with_images(df):
    """Deterministic HTML-with-embedded-media source: per ``doc_id`` a
    page carrying doc_id % 3 <img> tags whose src is a
    data:image/jpeg;base64 URI holding a REAL block-constant JPEG
    (w = 9 + (doc_id+i) % 16, h = 9 + (doc_id+i) % 12, tile
    v = (doc_id*41 + bx*7 + by*13 + i*17) % 256), one external
    <img src="https://..."> reference, and a decoy data:text/plain URI
    — the extractor must decode exactly the embedded images and count
    (not fetch) the external one."""
    import base64

    import pandas as pd

    from ..sources.lake import widen

    def kernel(batches):
        import numpy as np

        from .jpeg import encode_jpeg

        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                imgs = []
                for i in range(did % 3):
                    w, h = 9 + (did + i) % 16, 9 + (did + i) % 12
                    bx = np.arange(w)[None, :] // 8
                    by = np.arange(h)[:, None] // 8
                    arr = ((did * 41 + bx * 7 + by * 13 + i * 17) % 256
                           ).astype(np.uint8)
                    b64 = base64.b64encode(encode_jpeg(arr)).decode()
                    imgs.append(
                        f'<img alt="i{i}" '
                        f'src="data:image/jpeg;base64,{b64}">'
                    )
                html = (
                    "<!DOCTYPE html><html><body>"
                    f"<p>Doc {did}</p>" + "".join(imgs)
                    + f'<img src="https://cdn.example/{did}.jpg">'
                    + '<img src="data:text/plain;base64,aGk=">'
                    "</body></html>"
                )
                out["doc_id"].append(did)
                out["blob"].append(html.encode("utf-8"))
            yield pd.DataFrame(out)

    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


DATA_URI_SCHEMA = (
    "doc_id long, img_idx int, width int, height int, "
    "mean_intensity double, n_external int"
)


def data_uri_image_features(df):
    """HTML -> one row per EMBEDDED image: <img> tags collected with
    the stdlib parser, data:image/*;base64 URIs decoded through the
    sniffing codec dispatch (real JPEG decode), external references
    counted but never fetched, non-image data URIs skipped. A
    malformed data URI (bad base64, undecodable payload) raises —
    silently dropping embedded media skews a multimodal corpus."""
    import pandas as pd

    def kernel(batches):
        import base64
        import binascii
        from html.parser import HTMLParser

        from .media_codecs import decode_jpeg, sniff_format

        class _Imgs(HTMLParser):
            def __init__(self):
                super().__init__(convert_charrefs=True)
                self.srcs = []

            def handle_starttag(self, tag, attrs):
                if tag == "img":
                    for k, v in attrs:
                        if k == "src" and v:
                            self.srcs.append(v)

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "img_idx", "width", "height",
                                   "mean_intensity", "n_external")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                p = _Imgs()
                p.feed(bytes(blob).decode("utf-8"))
                embedded = []
                n_external = 0
                for src in p.srcs:
                    if not src.startswith("data:"):
                        n_external += 1
                        continue
                    head, sep, payload = src.partition(",")
                    if not sep:
                        raise ValueError(f"malformed data URI {head[:40]!r}")
                    if not head.startswith("data:image/"):
                        continue  # non-image data URI (e.g. inline text)
                    if not head.endswith(";base64"):
                        raise ValueError(
                            f"unsupported data URI encoding {head!r}"
                        )
                    try:
                        embedded.append(base64.b64decode(payload,
                                                         validate=True))
                    except binascii.Error as e:
                        raise ValueError(f"bad base64 in data URI ({e})") from e
                for i, img in enumerate(embedded):
                    if sniff_format(img) != "jpeg":
                        raise ValueError(
                            "embedded image is not a JPEG "
                            f"(sniffed {sniff_format(img)!r})"
                        )
                    pix = decode_jpeg(img)
                    out["doc_id"].append(doc_id)
                    out["img_idx"].append(i)
                    out["width"].append(pix.shape[1])
                    out["height"].append(pix.shape[0])
                    out["mean_intensity"].append(float(pix.mean()) / 255.0)
                    out["n_external"].append(n_external)
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(kernel, DATA_URI_SCHEMA)


# --- host-level link graph (HTML -> edges -> degrees) ---------------------------------


def synthesize_linked_pages(df):
    """Deterministic cross-site page source: per ``doc_id`` an HTML
    page on site{doc_id % 10}.example whose body links to sites
    (doc_id + k) % 10 for k = 1 .. 1 + doc_id % 4 (self-loops only
    when the ring wraps) — the link-graph shape a crawler's frontier
    expansion and domain-authority scoring work on."""
    import pandas as pd

    from ..sources.lake import widen

    def kernel(batches):
        for pdf in batches:
            out = {"doc_id": [], "src_domain": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                links = "".join(
                    f'<a href="https://site{(did + k) % 10}.example'
                    f'/p/{did}/{k}">ref{k}</a> '
                    for k in range(1, 2 + did % 4)
                )
                html = ("<!DOCTYPE html><html><body>"
                        f"<p>page {did}</p><div>{links}</div>"
                        "</body></html>")
                out["doc_id"].append(did)
                out["src_domain"].append(f"site{did % 10}.example")
                out["blob"].append(html.encode())
            yield pd.DataFrame(out)

    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, src_domain string, blob binary"
    )


def link_graph_edges(df):
    """(doc_id, src_domain, blob) -> one row per outgoing link:
    (doc_id, src_domain, dst_domain) — REAL HTML parsing
    (extract_html), href hosts lowered through urlsplit."""
    import pandas as pd

    def kernel(batches):
        from urllib.parse import urlsplit

        for pdf in batches:
            out = {"doc_id": [], "src_domain": [], "dst_domain": []}
            for doc_id, src, blob in zip(pdf["doc_id"], pdf["src_domain"],
                                         pdf["blob"]):
                r = extract_html(bytes(blob).decode("utf-8"))
                for href in r["links"]:
                    host = (urlsplit(href).hostname or "").lower()
                    if not host:
                        raise ValueError(
                            f"link without a host: {href[:60]!r}"
                        )
                    out["doc_id"].append(doc_id)
                    out["src_domain"].append(src)
                    out["dst_domain"].append(host)
            yield pd.DataFrame(out)

    return df.select("doc_id", "src_domain", "blob").mapInPandas(
        kernel, "doc_id long, src_domain string, dst_domain string"
    )


# --- charset detection (bytes -> text, the step before any HTML parse) ----------------


def detect_charset(b: bytes) -> tuple[str, str]:
    """HTML bytes -> (charset, how): BOM first (UTF-8, UTF-16 LE/BE —
    authoritative per WHATWG), then an ASCII pre-scan of the first 1024
    bytes for <meta charset=...> / <meta http-equiv=Content-Type>
    declarations, else the UTF-8 default. ``how`` is 'bom' / 'meta' /
    'default' so ingest stats can report declaration coverage.
    Unknown declared charsets raise ValueError (decoding with the
    wrong codec is silent mojibake)."""
    if b[:3] == b"\xef\xbb\xbf":
        return ("utf-8-sig", "bom")
    if b[:2] == b"\xff\xfe":
        return ("utf-16-le", "bom")
    if b[:2] == b"\xfe\xff":
        return ("utf-16-be", "bom")
    head = b[:1024].decode("latin-1").lower()
    import re as _re

    m = _re.search(r'<meta\s+charset\s*=\s*["\']?\s*([a-z0-9_\-]+)', head)
    if not m:
        m = _re.search(
            r'<meta[^>]+http-equiv\s*=\s*["\']?content-type["\']?[^>]*'
            r'charset\s*=\s*([a-z0-9_\-]+)',
            head,
        )
    if m:
        name = m.group(1)
        # WHATWG aliasing: iso-8859-1, latin1, AND us-ascii are all
        # labels for windows-1252 (real pages declaring 8859-1 carry
        # cp1252 smart quotes in 0x80-0x9F — decoding them as true
        # latin-1 yields C1 controls, the exact mojibake the alias
        # exists to prevent; cp1252's five undefined bytes also keep
        # the lying-declaration check enforceable)
        aliases = {"utf-8": "utf-8", "utf8": "utf-8",
                   "windows-1252": "cp1252", "cp1252": "cp1252",
                   "iso-8859-1": "cp1252", "latin-1": "cp1252",
                   "latin1": "cp1252",
                   "us-ascii": "cp1252", "ascii": "cp1252"}
        if name not in aliases:
            raise ValueError(f"unknown declared charset {name!r}")
        return (aliases[name], "meta")
    return ("utf-8", "default")


def decode_html_bytes(b: bytes) -> tuple[str, str, str]:
    """HTML bytes -> (text, charset, how) through detect_charset; a
    payload that fails to decode under its OWN declared charset raises
    (a lying declaration must surface, not mojibake silently)."""
    charset, how = detect_charset(b)
    if how == "bom" and charset in ("utf-16-le", "utf-16-be"):
        b = b[2:]  # the BOM itself is not content
    try:
        return (b.decode(charset), charset, how)
    except (UnicodeDecodeError, LookupError) as e:
        raise ValueError(
            f"payload does not decode as declared {charset} ({e})"
        ) from e


def synthesize_charset_pages(df):
    """Deterministic mixed-charset page source cycling four real
    declaration shapes by doc_id % 4:

      0: UTF-8 BOM, body 'süd {doc_id}'
      1: UTF-16 LE BOM, same body
      2: <meta charset="windows-1252">, body 'café {doc_id}' in cp1252
      3: no declaration (UTF-8 default), ASCII body 'plain {doc_id}'

    — expected decoded TEXT stated per class by the oracle
    (queries/ext_multimodal.py:charset_detect_report)."""
    import pandas as pd

    from ..sources.lake import widen

    def kernel(batches):
        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                k = did % 4
                if k == 0:
                    blob = (b"\xef\xbb\xbf"
                            + f"<html><body>süd {did}</body></html>"
                            .encode("utf-8"))
                elif k == 1:
                    blob = (b"\xff\xfe"
                            + f"<html><body>süd {did}</body></html>"
                            .encode("utf-16-le"))
                elif k == 2:
                    blob = (f'<html><head><meta charset="windows-1252">'
                            f"</head><body>café {did}</body></html>"
                            ).encode("cp1252")
                else:
                    blob = (f"<html><body>plain {did}</body></html>"
                            ).encode("ascii")
                out["doc_id"].append(did)
                out["blob"].append(blob)
            yield pd.DataFrame(out)

    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


def charset_text_features(df):
    """(doc_id, blob) -> (doc_id, charset, how, text) — detect, decode,
    then run the standard HTML text extraction on the decoded page."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            out = {"doc_id": [], "charset": [], "how": [], "text": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                text, charset, how = decode_html_bytes(bytes(blob))
                r = extract_html(text)
                out["doc_id"].append(doc_id)
                out["charset"].append(charset)
                out["how"].append(how)
                out["text"].append(r["text"])
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(
        kernel, "doc_id long, charset string, how string, text string"
    )
