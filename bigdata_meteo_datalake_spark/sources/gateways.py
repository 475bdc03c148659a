"""Optional external connectors, gated behind import/classpath probes.

The engine core is pure lake + Spark; these gateways adapt it to the
reference's external endpoints when their drivers are present:
- Delta Lake (upsert backend: MERGE INTO instead of window-dedup S8),
- JDBC (the reference's Postgres hop, S10),
- Elasticsearch (the reference's index sink, S13).

None of the drivers ship in this container, so each gateway raises a
clear ConnectorUnavailable from the exact insertion point, and the pure-
lake fallback it wraps is named in the error. The availability probes are
cheap and honest (no network)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class ConnectorUnavailable(RuntimeError):
    pass


def delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    keys: list[str],
) -> None:
    """S8 via Delta MERGE when delta-spark is on the classpath; otherwise
    raise and point at the pure-parquet recipe."""
    if not delta_available():
        raise ConnectorUnavailable(
            "delta-spark not installed; use operators.upsert.upsert_partition "
            "(window-dedup + dynamic partition overwrite) — same semantics"
        )
    from delta.tables import DeltaTable  # pragma: no cover

    cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    (
        DeltaTable.forPath(spark, target_path)
        .alias("t")
        .merge(source.alias("s"), cond)
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )


def jdbc_read(spark: SparkSession, url: str, table: str, **options) -> DataFrame:
    """S10: JDBC scan. Requires the driver jar on the Spark classpath; the
    engine's native path reads lake tables directly (sources/lake.py)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as exc:  # driver missing / no endpoint
        raise ConnectorUnavailable(
            f"JDBC source unavailable ({exc.__class__.__name__}); the lake-"
            "native path is sources.lake.read_table"
        ) from exc


def es_bulk_sink(df: DataFrame, index_name: str, es_url: str, **kwargs) -> None:
    """S13: Elasticsearch sink. With no es-hadoop jar / cluster, the
    supported transport is sources.search.bulk_index with an HTTP poster
    (executor-side NDJSON batching), or its NDJSON-file fallback."""
    try:
        import urllib.request  # noqa: F401 — transport exists; probe endpoint lazily
    except ImportError as exc:  # pragma: no cover
        raise ConnectorUnavailable("no HTTP transport") from exc
    from .search import bulk_index

    def poster(index: str, ndjson: str) -> None:
        import urllib.request

        req = urllib.request.Request(
            f"{es_url}/_bulk",
            data=ndjson.encode(),
            headers={"Content-Type": "application/x-ndjson"},
            method="POST",
        )
        urllib.request.urlopen(req, timeout=30)

    bulk_index(df, index_name, poster=poster, **kwargs)
