"""Live-connector round-trips, gated on environment endpoints.

The reference bulk-indexes into a running Elasticsearch
(scripts/index/index_elasticsearch.py:100-149) and upserts into a running
Postgres (scripts/load/load_raw_to_postgres.py:103-110). This sandbox has
neither service, so these tests SKIP cleanly here and run only when the
corresponding endpoint env var exists — the declared boundary from the
round-3 verdict, now executable the moment an environment provides it.

Run recipe (from a host with the services up):

    # Elasticsearch round-trip (HTTP bulk API, no es-hadoop jar needed):
    docker run -d -p 9200:9200 -e discovery.type=single-node \
        -e xpack.security.enabled=false elasticsearch:8.12.2
    ES_URL=http://localhost:9200 python -m pytest tests/test_live_connectors.py -q

    # JDBC round-trip (needs the driver jar on the Spark classpath):
    docker run -d -p 5432:5432 -e POSTGRES_PASSWORD=pg postgres:16
    JDBC_URL='jdbc:postgresql://localhost:5432/postgres?user=postgres&password=pg' \
        PYSPARK_SUBMIT_ARGS='--packages org.postgresql:postgresql:42.7.3 pyspark-shell' \
        python -m pytest tests/test_live_connectors.py -q
"""

from __future__ import annotations

import json
import os
import urllib.request

import pytest

from bigdata_meteo_datalake_spark.sources.gateways import (
    ConnectorUnavailable,
    es_bulk_sink,
    jdbc_read,
)

ES_URL = os.environ.get("ES_URL")
JDBC_URL = os.environ.get("JDBC_URL")


@pytest.mark.skipif(not ES_URL, reason="ES_URL not set (no live Elasticsearch)")
def test_es_bulk_roundtrip(spark):
    """Index a small frame via the executor-side NDJSON bulk transport and
    read it back through the search API — the reference's S13 path
    (index_elasticsearch.py:100-149) against a real cluster."""
    from bigdata_meteo_datalake_spark.sources.search import search_projection

    index = "engine_live_smoke"
    df = search_projection(
        spark.createDataFrame(
            [(1, "alpha doc", 0.5), (2, "beta doc", 0.9)],
            "movie_id int, title string, score double",
        ),
        id_cols=["movie_id"],
        text_cols=["title"],
    )
    # clean slate, then index
    try:
        urllib.request.urlopen(
            urllib.request.Request(f"{ES_URL}/{index}", method="DELETE"), timeout=10
        )
    except Exception:
        pass  # index may not exist yet
    es_bulk_sink(df, index, ES_URL)

    urllib.request.urlopen(
        urllib.request.Request(f"{ES_URL}/{index}/_refresh", method="POST"),
        timeout=10,
    )
    with urllib.request.urlopen(f"{ES_URL}/{index}/_count", timeout=10) as r:
        assert json.load(r)["count"] == 2
    with urllib.request.urlopen(
        f"{ES_URL}/{index}/_doc/1", timeout=10
    ) as r:  # stable _id from doc_id
        src = json.load(r)["_source"]
    assert src["title"] == "alpha doc"


@pytest.mark.skipif(not JDBC_URL, reason="JDBC_URL not set (no live database)")
def test_jdbc_scan_roundtrip(spark):
    """S10 against a live database: write a frame through Spark JDBC, scan
    it back with the gateway, compare rows."""
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id int, v string"
    )
    (
        df.write.format("jdbc")
        .option("url", JDBC_URL)
        .option("dbtable", "engine_live_smoke")
        .mode("overwrite")
        .save()
    )
    back = jdbc_read(spark, JDBC_URL, "engine_live_smoke")
    got = sorted((r["id"], r["v"]) for r in back.collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]


def test_gateways_fail_closed_without_services(spark):
    """In an environment with no endpoint, the gateways must raise the
    typed ConnectorUnavailable naming the lake-native fallback — never hang
    or half-write. Always runs (no env gate)."""
    if JDBC_URL:
        pytest.skip("live database present; fail-closed branch not reachable")
    with pytest.raises(ConnectorUnavailable) as err:
        jdbc_read(spark, "jdbc:postgresql://127.0.0.1:1/none", "t")
    assert "read_table" in str(err.value)
