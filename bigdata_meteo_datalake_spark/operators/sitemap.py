"""Sitemap / RSS / Atom discovery parsing — the crawl-frontier SEEDING
step that precedes robots admission (operators/web.py) in a web-corpus
pipeline: sitemaps enumerate a site's URLs with freshness hints, and
feeds surface new documents between crawls. All three formats are
plain XML the stdlib parses:

- sitemap urlsets (<urlset><url><loc>/<lastmod>/<priority>) and
  sitemap INDEX files (<sitemapindex><sitemap><loc>) in the
  sitemaps.org 0.9 namespace (namespace-stripped on read, so
  unprefixed real-world files parse identically);
- RSS 2.0 (<rss><channel><item><title>/<link>/<pubDate> with RFC 822
  dates, parsed via email.utils);
- Atom (<feed><entry><title>/<link href=>/<updated> with ISO 8601
  timestamps).

Published/lastmod values normalize to an ISO 'YYYY-MM-DD' string — the
join key a freshness-aware scheduler buckets on.

Security boundary: any DOCTYPE declaration is rejected up front
(internal-entity expansion is the classic XML bomb; a crawler feeds
this parser UNTRUSTED bytes, so entity definitions fail loudly instead
of expanding). Malformed XML and unknown root elements raise
ValueError.

The companion writers emit spec-shaped documents used for oracle
fixtures (queries/ext_multimodal.py:feed_discovery_report).

Reference parity note: the reference repo has no web-ingestion layer
(SURVEY.md section 4); this module belongs to the training-data
pillar.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

__all__ = [
    "build_atom", "build_rss", "build_sitemap", "parse_discovery_doc",
]

_SM_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"
_ATOM_NS = "http://www.w3.org/2005/Atom"


def build_sitemap(entries: list[dict], *, index: bool = False) -> bytes:
    """[{loc, lastmod?, priority?}] -> a sitemaps.org urlset (or
    sitemapindex when ``index``)."""
    root = "sitemapindex" if index else "urlset"
    child = "sitemap" if index else "url"
    parts = [f'<?xml version="1.0" encoding="UTF-8"?>\n'
             f'<{root} xmlns="{_SM_NS}">']
    for e in entries:
        parts.append(f"<{child}>")
        parts.append(f"<loc>{e['loc']}</loc>")
        if "lastmod" in e:
            parts.append(f"<lastmod>{e['lastmod']}</lastmod>")
        if "priority" in e:
            parts.append(f"<priority>{e['priority']}</priority>")
        parts.append(f"</{child}>")
    parts.append(f"</{root}>")
    return "\n".join(parts).encode("utf-8")


def build_rss(items: list[dict], *, title: str = "feed") -> bytes:
    """[{title, link, pubdate_rfc822}] -> an RSS 2.0 document."""
    parts = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<rss version="2.0"><channel>',
             f"<title>{title}</title><link>https://example.com</link>",
             "<description>fixture</description>"]
    for it in items:
        parts.append("<item>")
        parts.append(f"<title>{it['title']}</title>")
        parts.append(f"<link>{it['link']}</link>")
        parts.append(f"<pubDate>{it['pubdate_rfc822']}</pubDate>")
        parts.append("</item>")
    parts.append("</channel></rss>")
    return "\n".join(parts).encode("utf-8")


def build_atom(entries: list[dict], *, title: str = "feed") -> bytes:
    """[{title, href, updated_iso}] -> an Atom document."""
    parts = ['<?xml version="1.0" encoding="UTF-8"?>',
             f'<feed xmlns="{_ATOM_NS}">',
             f"<title>{title}</title>"]
    for e in entries:
        parts.append("<entry>")
        parts.append(f"<title>{e['title']}</title>")
        parts.append(f'<link href="{e["href"]}"/>')
        parts.append(f"<updated>{e['updated_iso']}</updated>")
        parts.append("</entry>")
    parts.append("</feed>")
    return "\n".join(parts).encode("utf-8")


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _iso_date(s: str, *, rfc822: bool) -> str:
    """Date string -> 'YYYY-MM-DD'. RFC 822 via email.utils; ISO 8601
    by prefix validation."""
    s = s.strip()
    if rfc822:
        from email.utils import parsedate_to_datetime

        try:
            return parsedate_to_datetime(s).date().isoformat()
        except (ValueError, TypeError) as e:
            raise ValueError(f"bad RFC 822 date {s!r} ({e})") from e
    m = re.match(r"^(\d{4})-(\d{2})-(\d{2})", s)
    if not m:
        raise ValueError(f"bad ISO 8601 date {s!r}")
    return m.group(0)


def parse_discovery_doc(b: bytes) -> dict:
    """Sitemap / sitemap-index / RSS / Atom bytes ->
    {"kind": 'sitemap' | 'sitemap_index' | 'rss' | 'atom',
     "entries": [{url, title, published}]} with ``title`` '' where the
    format has none and ``published`` an ISO date or '' when absent.
    DOCTYPE declarations, malformed XML, unknown roots, and entries
    missing their URL raise ValueError."""
    head = b[:4096]
    if b"<!DOCTYPE" in head or b"<!ENTITY" in head:
        raise ValueError(
            "DOCTYPE/ENTITY declaration rejected (XML-bomb guard — "
            "discovery documents are untrusted crawler input)"
        )
    try:
        root = ET.fromstring(b)
    except ET.ParseError as e:
        raise ValueError(f"malformed XML ({e})") from e
    tag = _local(root.tag)
    entries = []
    if tag in ("urlset", "sitemapindex"):
        child = "url" if tag == "urlset" else "sitemap"
        for el in root:
            if _local(el.tag) != child:
                raise ValueError(
                    f"unexpected <{_local(el.tag)}> in <{tag}>"
                )
            loc = lastmod = None
            for f in el:
                if _local(f.tag) == "loc":
                    loc = (f.text or "").strip()
                elif _local(f.tag) == "lastmod":
                    lastmod = (f.text or "").strip()
            if not loc:
                raise ValueError(f"<{child}> without <loc>")
            entries.append({
                "url": loc, "title": "",
                "published": (_iso_date(lastmod, rfc822=False)
                              if lastmod else ""),
            })
        kind = "sitemap" if tag == "urlset" else "sitemap_index"
    elif tag == "rss":
        channel = root.find("channel")
        if channel is None:
            raise ValueError("<rss> without <channel>")
        for item in channel.findall("item"):
            link = (item.findtext("link") or "").strip()
            if not link:
                raise ValueError("<item> without <link>")
            pub = (item.findtext("pubDate") or "").strip()
            entries.append({
                "url": link,
                "title": (item.findtext("title") or "").strip(),
                "published": (_iso_date(pub, rfc822=True) if pub else ""),
            })
        kind = "rss"
    elif tag == "feed":
        for entry in root:
            if _local(entry.tag) != "entry":
                continue  # feed-level title/id/updated metadata
            href = title = updated = None
            for f in entry:
                lf = _local(f.tag)
                if lf == "link":
                    href = f.get("href")
                elif lf == "title":
                    title = (f.text or "").strip()
                elif lf == "updated":
                    updated = (f.text or "").strip()
            if not href:
                raise ValueError("<entry> without <link href=>")
            entries.append({
                "url": href, "title": title or "",
                "published": (_iso_date(updated, rfc822=False)
                              if updated else ""),
            })
        kind = "atom"
    else:
        raise ValueError(f"unknown discovery document root <{tag}>")
    if not entries:
        raise ValueError(f"{kind} document has no entries")
    return {"kind": kind, "entries": entries}


# --- Spark kernels (mapInPandas, the codec plan shape) --------------------------------


def synthesize_discovery_blobs(df):
    """Deterministic discovery-document source cycling all three
    formats by ``doc_id % 3`` — 0: sitemap urlset, 1: RSS 2.0,
    2: Atom — each with 1 + doc_id % 4 entries:

      entry i: url 'https://s{doc_id % 10}.example/p/{doc_id}/{i}',
               title 'Post {doc_id}-{i}' (feeds only),
               date 2026-01-(1 + (doc_id + i) % 28)

    (RSS writes the date in RFC 822 form, Atom and sitemaps in
    ISO 8601 — all three normalize to the same ISO day, which is what
    the oracle hash checks)."""
    import pandas as pd

    from ..sources.lake import widen

    def kernel(batches):
        for pdf in batches:
            out = {"doc_id": [], "blob": []}
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                n = 1 + did % 4
                urls = [f"https://s{did % 10}.example/p/{did}/{i}"
                        for i in range(n)]
                days = [1 + (did + i) % 28 for i in range(n)]
                kind = did % 3
                if kind == 0:
                    blob = build_sitemap([
                        {"loc": u, "lastmod": f"2026-01-{d:02d}",
                         "priority": "0.5"}
                        for u, d in zip(urls, days)
                    ])
                elif kind == 1:
                    blob = build_rss([
                        {"title": f"Post {did}-{i}", "link": u,
                         "pubdate_rfc822":
                             f"Thu, {d:02d} Jan 2026 00:00:00 +0000"}
                        for i, (u, d) in enumerate(zip(urls, days))
                    ])
                else:
                    blob = build_atom([
                        {"title": f"Post {did}-{i}", "href": u,
                         "updated_iso": f"2026-01-{d:02d}T00:00:00Z"}
                        for i, (u, d) in enumerate(zip(urls, days))
                    ])
                out["doc_id"].append(did)
                out["blob"].append(blob)
            yield pd.DataFrame(out)

    return widen(df.select("doc_id")).mapInPandas(
        kernel, "doc_id long, blob binary"
    )


FEED_SCHEMA = (
    "doc_id long, entry_idx int, kind string, url string, "
    "title string, published string"
)


def feed_discovery_features(df):
    """Discovery-document demux -> one row PER ENTRY: (doc_id,
    entry_idx, kind, url, title, published-ISO-date) via mapInPandas."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "entry_idx", "kind", "url",
                                   "title", "published")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                r = parse_discovery_doc(bytes(blob))
                for i, e in enumerate(r["entries"]):
                    out["doc_id"].append(doc_id)
                    out["entry_idx"].append(i)
                    out["kind"].append(r["kind"])
                    out["url"].append(e["url"])
                    out["title"].append(e["title"])
                    out["published"].append(e["published"])
            yield pd.DataFrame(out)

    return df.select("doc_id", "blob").mapInPandas(kernel, FEED_SCHEMA)
