"""Search-index sink (S13-S14), full-text match semantics, and the
distributed keyed REST fan-out (S2 at scale)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from bigdata_meteo_datalake_spark.sources.rest import fetch_keyed_distributed
from bigdata_meteo_datalake_spark.sources.search import (
    bulk_index,
    full_text_match,
    search_projection,
)


def _gold(spark):
    return spark.createDataFrame(
        [
            ("2026-02-18", 101, "Film A v2", "Some Director"),
            ("2026-02-18", 102, "Film B", None),
        ],
        "snapshot_date string, tmdb_id long, title string, director string",
    ).withColumn("snapshot_date", F.col("snapshot_date").cast("date"))


def test_search_projection_and_match(spark):
    proj = search_projection(
        _gold(spark),
        ["snapshot_date", "tmdb_id"],
        text_cols=["title", "director"],
        date_cols=["snapshot_date"],
    )
    rows = {r["tmdb_id"]: r for r in proj.collect()}
    assert rows[101]["doc_id"] == "2026-02-18_101"  # P19
    assert rows[101]["snapshot_date"] == "2026-02-18"  # P17 ISO string
    assert rows[101]["title_tokens"] == ["film", "a", "v2"]  # S14 text field
    doc = json.loads(rows[101]["doc_json"])  # P20
    assert doc["tmdb_id"] == 101 and doc["doc_id"] == "2026-02-18_101"

    hits = full_text_match(proj, "title_tokens", "Film").count()
    assert hits == 2
    assert full_text_match(proj, "director_tokens", "director").count() == 1


def test_bulk_index_ndjson_sink(spark, tmp_path):
    proj = search_projection(_gold(spark), ["snapshot_date", "tmdb_id"])
    out = str(tmp_path / "es")
    bulk_index(proj, "movies_enriched_daily", out_dir=out, batch_size=1)
    lines = []
    for name in sorted(os.listdir(out)):
        with open(os.path.join(out, name), encoding="utf-8") as f:
            lines += [json.loads(line) for line in f if line.strip()]
    actions = [l for l in lines if "index" in l and "_index" in l.get("index", {})]
    assert {a["index"]["_id"] for a in actions} == {"2026-02-18_101", "2026-02-18_102"}
    assert all(a["index"]["_index"] == "movies_enriched_daily" for a in actions)


def test_fetch_keyed_distributed(spark):
    keys = spark.createDataFrame([("tt1",), ("tt2",), ("tt3",)], "imdb_id string")

    def fake_fetcher(endpoint: str, params: dict) -> dict:
        return {"endpoint": endpoint, "ok": True}

    out = fetch_keyed_distributed(
        spark, keys, fake_fetcher, endpoint_template="omdb/{key}", key_col="imdb_id"
    ).collect()
    assert len(out) == 3
    payloads = {r["imdb_id"]: json.loads(r["payload_json"]) for r in out}
    assert payloads["tt2"]["endpoint"] == "omdb/tt2"
