"""First-class paged-REST source via the Python DataSource API (Spark 4).

The reference ingests paged REST lists with a driver-side loop
(scripts/fetch/fetch_tmdb.py:41-74: `for page in range(1, pages+1)` against
api.themoviedb.org, one JSON envelope per page). `sources/rest.py` already
re-expresses that as injectable-fetcher helpers; this module goes one step
further and registers the pattern as a REAL Spark data source —
``spark.read.format("paged_rest")`` — so page fetches are planned as input
partitions and run ON EXECUTORS, one task per page: the distributed form of
S1/S2 that a 1000-executor cluster needs (a driver loop serializes the
whole crawl; a partition-per-page scan parallelizes it and gets task
retries for free).

Transports are resolved from the URL scheme: ``file://`` reads local JSON
(hermetic tests, lake-staged replays), ``http(s)://`` uses stdlib urllib on
the executor. Each page yields one row per record plus lineage columns
(page number, source URL), mirroring ``rest.py``'s envelope contract.
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SCHEMA = "page INT, url STRING, record STRING"


def _fetch_page_text(url: str) -> str:
    """Scheme-dispatched page fetch (runs on the executor)."""
    if url.startswith("file://"):
        with open(url[len("file://"):], encoding="utf-8") as f:
            return f.read()
    if url.startswith(("http://", "https://")):
        from urllib.request import urlopen

        with urlopen(url, timeout=30) as resp:  # noqa: S310 (scheme-checked)
            return resp.read().decode("utf-8")
    raise ValueError(f"unsupported URL scheme: {url}")


def _records(body: str) -> list:
    """Envelope unwrap, same tolerance as bronze.read_envelope_json: a JSON
    object with a 'results' list (the reference's TMDB shape), a bare list,
    or a single bare object."""
    doc = json.loads(body)
    if isinstance(doc, dict) and isinstance(doc.get("results"), list):
        return doc["results"]
    if isinstance(doc, list):
        return doc
    return [doc]


class PagedRestDataSource(DataSource):
    """``spark.read.format("paged_rest")`` — options:

    - ``url``: template with a ``{page}`` placeholder
    - ``pages``: page count (one input partition — one executor task — each)
    """

    @classmethod
    def name(cls) -> str:
        return "paged_rest"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> "PagedRestReader":
        return PagedRestReader(self.options)


class PagedRestReader(DataSourceReader):
    def __init__(self, options):
        self.url_template = options["url"]
        self.pages = int(options.get("pages", "1"))

    def partitions(self):
        # one partition per page: the scan parallelizes across executors
        return [InputPartition(p) for p in range(1, self.pages + 1)]

    def read(self, partition) -> Iterator[tuple]:
        page = partition.value
        url = self.url_template.format(page=page)
        for rec in _records(_fetch_page_text(url)):
            yield (page, url, json.dumps(rec, sort_keys=True))


def register_paged_rest(spark) -> None:
    """Idempotent format registration for the current session."""
    spark.dataSource.register(PagedRestDataSource)
