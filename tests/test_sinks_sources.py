"""Search-index sink (S13-S14), full-text match semantics, and the
distributed keyed REST fan-out (S2 at scale)."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bigdata_meteo_datalake_spark.sources.rest import fetch_keyed_distributed
from bigdata_meteo_datalake_spark.sources.search import (
    bulk_index,
    full_text_match,
    search_projection,
)

from .conftest import SF0001


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


def test_single_file_partition_layout(spark, tmp_path):
    """S11 exact layout parity: one parquet file per snapshot partition."""
    import os

    from bigdata_meteo_datalake_spark.sources.lake import write_partitioned

    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("snapshot_date"),
    ).repartition(8)
    out = str(tmp_path / "single")
    write_partitioned(df, out, single_file=True)
    for d in os.listdir(out):
        if d.startswith("snapshot_date="):
            parts = [f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")]
            assert len(parts) == 1, (d, parts)


def test_bulk_index_http_poster(spark):
    """S13 transport path: executors POST NDJSON _bulk bodies over HTTP."""
    import http.server
    import json as _json
    import threading

    received = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            received.append((self.path, body.decode()))
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(b'{"errors": false}')

        def log_message(self, *a):  # quiet
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        from bigdata_meteo_datalake_spark.sources.gateways import es_bulk_sink
        from bigdata_meteo_datalake_spark.sources.search import search_projection

        proj = search_projection(_gold(spark), ["snapshot_date", "tmdb_id"])
        es_bulk_sink(proj, "movies_idx", f"http://127.0.0.1:{port}", batch_size=1)
    finally:
        srv.shutdown()

    assert received, "no bulk requests arrived"
    assert all(path == "/_bulk" for path, _ in received)
    actions = []
    for _, body in received:
        for line in body.strip().splitlines():
            doc = _json.loads(line)
            if "index" in doc and "_id" in doc.get("index", {}):
                actions.append(doc["index"])
    assert {a["_id"] for a in actions} == {"2026-02-18_101", "2026-02-18_102"}
    assert all(a["_index"] == "movies_idx" for a in actions)


def test_multi_format_round_trip(spark, tmp_path):
    """ORC / CSV / JSON / parquet round-trips preserve rows and (with the
    explicit schema contract) types."""
    from bigdata_meteo_datalake_spark.sources.lake import (
        read_format,
        read_table,
        write_format,
    )

    orders = read_table(spark, SF0001, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    want = orders.toPandas().sort_values("o_orderkey").reset_index(drop=True)
    for fmt in ("orc", "parquet", "csv", "json"):
        path = str(tmp_path / f"rt_{fmt}")
        write_format(orders, path, fmt)
        schema = orders.schema if fmt in ("csv", "json") else None
        got = (
            read_format(spark, path, fmt, schema=schema)
            .toPandas()
            .sort_values("o_orderkey")
            .reset_index(drop=True)[want.columns]
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    with pytest.raises(ValueError, match="explicit schema"):
        read_format(spark, str(tmp_path / "rt_csv"), "csv")


def test_paged_rest_datasource(spark, tmp_path):
    """The Python DataSource form of the paged REST list: one input
    partition per page (executor-side fetch), envelope unwrap, lineage
    columns."""
    import json as _json

    from pyspark.sql import functions as F

    from bigdata_meteo_datalake_spark.sources.pyds import register_paged_rest

    for page in (1, 2, 3):
        recs = [{"id": page * 10 + i, "title": f"m{page}-{i}"} for i in range(4)]
        (tmp_path / f"page-{page}.json").write_text(
            _json.dumps({"page": page, "results": recs})
        )
    register_paged_rest(spark)
    df = (
        spark.read.format("paged_rest")
        .option("url", f"file://{tmp_path}/page-{{page}}.json")
        .option("pages", "3")
        .load()
    )
    assert df.rdd.getNumPartitions() == 3  # one executor task per page
    rows = df.collect()
    assert len(rows) == 12
    parsed = df.select(
        "page", F.get_json_object("record", "$.id").cast("int").alias("id")
    )
    ids = sorted(r["id"] for r in parsed.collect())
    assert ids == sorted(p * 10 + i for p in (1, 2, 3) for i in range(4))
    # every record is attributed to the page file it came from
    bad = parsed.where((F.col("id") / 10).cast("int") != F.col("page")).count()
    assert bad == 0


def test_paged_rest_bare_list_and_single_object(spark, tmp_path):
    from bigdata_meteo_datalake_spark.sources.pyds import register_paged_rest

    (tmp_path / "page-1.json").write_text('[{"a": 1}, {"a": 2}]')
    (tmp_path / "page-2.json").write_text('{"a": 3}')
    register_paged_rest(spark)
    df = (
        spark.read.format("paged_rest")
        .option("url", f"file://{tmp_path}/page-{{page}}.json")
        .option("pages", "2")
        .load()
    )
    assert df.count() == 3


def test_paged_rest_stream_ingests_new_pages(spark, tmp_path):
    """Streaming paged-REST: each availableNow run drains exactly the pages
    that appeared since the committed offset — no re-reads, no gaps."""
    import json as _json

    from pyspark.sql import functions as F

    from bigdata_meteo_datalake_spark.sources.pyds import register_paged_rest

    register_paged_rest(spark)
    out = str(tmp_path / "stream_out")

    def write_page(page):
        (tmp_path / f"page-{page}.json").write_text(
            _json.dumps({"results": [{"id": page * 10 + i} for i in range(3)]})
        )

    def run_once():
        df = (
            spark.readStream.format("paged_rest")
            .option("url", f"file://{tmp_path}/page-{{page}}.json")
            .load()
        )
        q = (
            df.writeStream.outputMode("append")
            .foreachBatch(lambda b, _i: b.write.mode("append").parquet(out))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_page(1)
    write_page(2)
    run_once()
    write_page(3)  # appears after the first drain
    run_once()

    got = spark.read.parquet(out)
    assert got.count() == 9
    pages = sorted(
        r["page"] for r in got.select("page").distinct().collect()
    )
    assert pages == [1, 2, 3]
    # exactly-once: no page ingested twice
    assert got.select("page", "record").distinct().count() == 9


def test_write_observed_single_pass_metrics(spark, tmp_path):
    """observe() metrics ride the write pass: counts/sums match a direct
    recount without a second scan of the input."""
    from pyspark.sql import functions as F

    from bigdata_meteo_datalake_spark.sources.lake import read_table, write_observed

    ev = read_table(spark, SF0001, "events").withColumn(
        "snapshot_date", F.col("ts").cast("date")
    )
    got = write_observed(
        ev,
        str(tmp_path / "observed"),
        metrics={
            "n_rows": F.count(F.lit(1)),
            "n_null_props": F.sum(F.when(F.col("props").isNull(), 1).otherwise(0)),
            "sum_value": F.round(F.sum(F.col("value").cast("decimal(28,6)")), 2).cast(
                "double"
            ),
        },
    )
    assert got["n_rows"] == ev.count()
    assert got["n_null_props"] == ev.where(F.col("props").isNull()).count()
    back = spark.read.parquet(str(tmp_path / "observed"))
    assert back.count() == got["n_rows"]


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Lake tables grow columns over time: files written before the column
    existed must read back as NULL under mergeSchema, and the pre-evolution
    reader path (explicit schema) must still work against mixed files."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "evolving")
    v1 = spark.range(3).select(F.col("id").alias("k"), F.lit("a").alias("s"))
    v1.write.mode("append").parquet(path)
    v2 = spark.range(3, 6).select(
        F.col("id").alias("k"), F.lit("b").alias("s"), F.lit(1.5).alias("score")
    )
    v2.write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"k", "s", "score"}
    assert merged.count() == 6
    # pre-evolution rows surface the new column as NULL
    assert merged.where(F.col("score").isNull()).count() == 3
    assert merged.where(F.col("score") == 1.5).count() == 3

    # an explicit-schema reader (the contract form the CSV/JSON sources
    # use) pins the evolved schema regardless of which file is which
    explicit = spark.read.schema("k long, s string, score double").parquet(path)
    assert explicit.count() == 6
    assert explicit.where(F.col("score").isNull()).count() == 3


def test_avro_round_trip_env_gated(spark, tmp_path):
    """Avro is Spark-built-in but ships as an EXTERNAL module
    (spark-avro jar), absent from this container — the same declared-
    boundary pattern as the live ES/Postgres connectors: the round-trip
    runs wherever the jar is deployed and skips (loudly, not silently
    passing) here."""
    from bigdata_meteo_datalake_spark.sources.lake import (
        read_format,
        read_table,
        write_format,
    )

    orders = read_table(spark, SF0001, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    path = str(tmp_path / "rt_avro")
    try:
        write_format(orders, path, "avro")
    except Exception as e:
        if "Failed to find data source: avro" not in str(e):
            raise
        pytest.skip("spark-avro jar not deployed in this environment")
    want = orders.toPandas().sort_values("o_orderkey").reset_index(drop=True)
    got = (
        read_format(spark, path, "avro")
        .toPandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)[want.columns]
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
