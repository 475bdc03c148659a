"""REST ingestion -> raw JSON lake (SURVEY.md S1-S3, O2-O3).

The reference fetches TMDB popular (one page), then fans out per-movie
detail calls with a 0.25 s rate limit (fetch_tmdb.py:20,49-74), writing one
envelope JSON file per response into `raw/<source>/<endpoint>/date=<d>/`.
The (missing) fetch_omdb.py is reconstructed from its consumers: one file
per imdb_id, filename = key.

Design: the HTTP call is an injected callable (`fetcher(endpoint, params)
-> dict`) so the engine is testable offline and the transport is swappable;
ingestion is driver-side (this stage is 10s of calls/day in the reference —
parallelism buys nothing). For a *large* keyed fan-out the distributed path
is `fetch_keyed_distributed`, which partitions the key list and runs the
fetcher inside mapInPandas (rate-limited per executor) — that is the 100 TB
shape, included and tested with a fake fetcher.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession

Fetcher = Callable[[str, dict], dict]


def make_envelope(
    payload: dict, *, snapshot_date: str, run_id: str, source: str, endpoint: str,
    extracted_at_utc: str,
) -> dict:
    """S3 envelope (fetch_tmdb.py:30-43)."""
    return {
        "_meta": {
            "snapshot_date": snapshot_date,
            "run_id": run_id,
            "extracted_at_utc": extracted_at_utc,
            "source": source,
            "endpoint": endpoint,
        },
        "data": payload,
    }


def write_envelope_file(envelope: dict, directory: str, name: str) -> str:
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"{name}.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(envelope, f, ensure_ascii=False)
    return path


def ingest_tmdb(
    fetcher: Fetcher,
    lake_root: str,
    *,
    snapshot_date: str,
    run_id: str,
    extracted_at_utc: str,
    rate_limit_s: float = 0.0,
) -> dict[str, int]:
    """S1 popular page + S2 keyed detail fan-out -> raw lake files
    (fetch_tmdb.py:46-76). Returns per-endpoint file counts."""
    page = fetcher("movie/popular", {"page": 1})
    pop_dir = f"{lake_root}/raw/tmdb/popular/date={snapshot_date}"
    write_envelope_file(
        make_envelope(
            page, snapshot_date=snapshot_date, run_id=run_id, source="tmdb",
            endpoint="popular", extracted_at_utc=extracted_at_utc,
        ),
        pop_dir,
        "popular_movies",
    )
    det_dir = f"{lake_root}/raw/tmdb/details/date={snapshot_date}"
    n_details = 0
    for result in page.get("results", []):
        movie_id = result.get("id")
        if movie_id is None:
            continue
        detail = fetcher(f"movie/{movie_id}", {})
        write_envelope_file(
            make_envelope(
                detail, snapshot_date=snapshot_date, run_id=run_id, source="tmdb",
                endpoint="details", extracted_at_utc=extracted_at_utc,
            ),
            det_dir,
            str(movie_id),
        )
        n_details += 1
        if rate_limit_s:
            time.sleep(rate_limit_s)
    return {"popular": 1, "details": n_details}


def ingest_omdb(
    fetcher: Fetcher,
    lake_root: str,
    imdb_ids: Iterable[str],
    *,
    snapshot_date: str,
    run_id: str,
    extracted_at_utc: str,
    rate_limit_s: float = 0.0,
) -> int:
    """The reconstructed fetch_omdb.py contract: one envelope file per
    imdb_id, FILENAME = KEY (consumed at load_raw_to_postgres.py:160-199)."""
    out_dir = f"{lake_root}/raw/omdb/ratings/date={snapshot_date}"
    n = 0
    for imdb_id in imdb_ids:
        if not imdb_id:
            continue
        payload = fetcher("omdb", {"i": imdb_id})
        write_envelope_file(
            make_envelope(
                payload, snapshot_date=snapshot_date, run_id=run_id, source="omdb",
                endpoint="ratings", extracted_at_utc=extracted_at_utc,
            ),
            out_dir,
            imdb_id,
        )
        n += 1
        if rate_limit_s:
            time.sleep(rate_limit_s)
    return n


def fetch_keyed_distributed(
    spark: SparkSession,
    keys: DataFrame,
    fetcher: Fetcher,
    *,
    endpoint_template: str,
    key_col: str,
    rate_limit_s: float = 0.0,
) -> DataFrame:
    """S2 at scale: distributed keyed fan-out. Partitions the key set and
    runs the fetcher per batch inside mapInPandas (Arrow batches, one rate
    limiter per task). Returns (key, payload_json) — the caller parses with
    from_json + an explicit schema. This is the shape that holds when the
    key list is millions of rows; the driver loop above is for page-sized
    ingests."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            payloads = []
            for k in pdf[key_col]:
                payloads.append(
                    json.dumps(fetcher(endpoint_template.format(key=k), {}))
                )
                if rate_limit_s:
                    time.sleep(rate_limit_s)
            yield pd.DataFrame({key_col: pdf[key_col], "payload_json": payloads})

    return keys.select(key_col).mapInPandas(
        run, schema=f"{key_col} string, payload_json string"
    )
