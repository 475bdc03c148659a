"""Search-index sink (SURVEY.md S13-S14).

The reference bulk-indexes the day's mart parquet into Elasticsearch with
typed mappings and stable _ids (index_elasticsearch.py:100-149,179-225).
In-engine, the durable artifact is a *search projection* gold table:
ISO-formatted dates (P17), stable surrogate doc ids (P19), the row as a
JSON document (P20), and lowercase token arrays for the `text` multi-field
semantics (full-text match == array_contains on tokens; SURVEY section 3.3).

The network sink itself is transport-injected `foreachPartition` bulk
batching — executors POST NDJSON chunks directly (never through the
driver); without a poster it falls back to writing NDJSON files, which is
also the offline test path.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def search_projection(
    df: DataFrame,
    id_cols: Sequence[str],
    *,
    text_cols: Sequence[str] = (),
    date_cols: Sequence[str] = (),
) -> DataFrame:
    """Gold search table: doc_id (P19), ISO date strings (P17), doc_json
    (P20), and `<col>_tokens` arrays for full-text match (S14's text
    multi-field)."""
    out = df
    for c in date_cols:
        out = out.withColumn(c, F.date_format(F.col(c), "yyyy-MM-dd"))
    out = out.withColumn(
        "doc_id", F.concat_ws("_", *[F.col(c).cast("string") for c in id_cols])
    )
    for c in text_cols:
        out = out.withColumn(
            f"{c}_tokens",
            F.filter(F.split(F.lower(F.col(c)), r"[^a-z0-9]+"), lambda t: t != ""),
        )
    return out.withColumn("doc_json", F.to_json(F.struct(*df.columns, F.col("doc_id"))))


def full_text_match(df: DataFrame, token_col: str, term: str) -> DataFrame:
    """Kibana-style match query over a tokens column (SURVEY section 3.3)."""
    return df.where(F.array_contains(F.col(token_col), term.lower()))


# --- index DDL: typed mapping document + create-iff-missing (S13 DDL side) ---

ES_INDEX_SETTINGS = {"number_of_shards": 1, "number_of_replicas": 0}

#: Spark simpleString type -> ES field type
_SPARK_TO_ES = {
    "bigint": "long",
    "int": "integer",
    "smallint": "integer",
    "tinyint": "integer",
    "double": "double",
    "float": "double",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "date",
    "string": "keyword",
}


def index_mapping(
    df: DataFrame,
    *,
    fields: Sequence[str] | None = None,
    date_cols: Sequence[str] = (),
    text_cols: Sequence[str] = (),
    text_keyword_cols: Sequence[str] = (),
    overrides: dict[str, str] | None = None,
) -> dict:
    """Typed ES index-creation document derived from the DataFrame schema
    (the DDL the reference hand-writes at index_elasticsearch.py:179-225).

    Field types come from the Spark types; strings default to ``keyword``,
    `text_cols` become full-text ``text``, `text_keyword_cols` the
    ``text`` + ``.keyword`` multi-field, `date_cols` marks ISO-string date
    columns, and `overrides` pins any field to an explicit ES type.
    `fields` restricts the mapping to the named columns (the rest map
    dynamically at index time, as in the reference)."""
    overrides = overrides or {}
    props: dict[str, dict] = {}
    for sf in df.schema.fields:
        if fields is not None and sf.name not in fields:
            continue
        if sf.name in overrides:
            props[sf.name] = {"type": overrides[sf.name]}
        elif sf.name in date_cols:
            props[sf.name] = {"type": "date"}
        elif sf.name in text_keyword_cols:
            props[sf.name] = {
                "type": "text",
                "fields": {"keyword": {"type": "keyword"}},
            }
        elif sf.name in text_cols:
            props[sf.name] = {"type": "text"}
        else:
            spark_t = sf.dataType.simpleString()
            if spark_t.startswith("decimal"):
                spark_t = "double"
            props[sf.name] = {"type": _SPARK_TO_ES.get(spark_t, "keyword")}
    missing = set(fields or ()) - set(props)
    if missing:
        raise ValueError(f"mapping fields absent from schema: {sorted(missing)}")
    return {"settings": dict(ES_INDEX_SETTINGS), "mappings": {"properties": props}}


def create_index_if_missing(
    index_name: str,
    mapping: dict,
    *,
    http: Callable[[str, str, str | None], tuple[int, str]],
) -> bool:
    """Create-iff-missing DDL (index_elasticsearch.py:41-59): GET the
    index; on 404 PUT the mapping document. `http(method, path, body)` is
    the injected transport returning (status_code, body). Returns True if
    the index was created."""
    status, _ = http("GET", f"/{index_name}", None)
    if status == 200:
        return False
    if status != 404:
        raise RuntimeError(f"index lookup failed for {index_name}: HTTP {status}")
    status, body = http("PUT", f"/{index_name}", json.dumps(mapping))
    if status not in (200, 201):
        raise RuntimeError(f"index creation failed for {index_name}: HTTP {status} {body}")
    return True


MOVIES_INDEX = "movies_enriched_daily"
KPIS_INDEX = "movies_kpis_daily"

#: the reference's hand-written mapping deviates from its own warehouse
#: types in two places (stg_omdb_ratings.sql:33,39 makes imdb_votes bigint
#: and metascore int; the mapping says integer and double) and declares the
#: KPI counts integer where any engine's count() is 64-bit — reproduced
#: faithfully as explicit overrides, never by weakening the mart schema.
_MOVIES_MAPPING_OVERRIDES = {"imdb_votes": "integer", "metascore": "double"}
_KPI_MAPPING_OVERRIDES = {
    "nb_movies": "integer",
    "nb_movies_with_omdb": "integer",
    "nb_overhyped": "integer",
    "nb_hidden_gems": "integer",
}


def movies_enriched_index_mapping(enriched: DataFrame) -> dict:
    """Typed mapping for the enriched-movies index, generated from the mart
    schema — the reference hand-writes the same 22 fields at
    index_elasticsearch.py:179-207 (unlisted mart columns map dynamically
    there too)."""
    return index_mapping(
        enriched,
        fields=[
            "snapshot_date", "tmdb_id", "imdb_id", "title",
            "original_language", "release_date", "release_year",
            "popularity", "tmdb_rating", "tmdb_vote_count", "imdb_rating",
            "imdb_votes", "metascore", "composite_score", "runtime_minutes",
            "status", "rated", "director", "actors", "missing_omdb_data",
            "is_overhyped", "is_hidden_gem",
        ],
        date_cols=["snapshot_date", "release_date"],
        text_cols=["actors"],
        text_keyword_cols=["title", "director"],
        overrides=_MOVIES_MAPPING_OVERRIDES,
    )


def kpi_index_mapping(kpi: DataFrame) -> dict:
    """Typed mapping for the daily-KPI index
    (index_elasticsearch.py:210-225)."""
    return index_mapping(
        kpi,
        date_cols=["snapshot_date"],
        overrides=_KPI_MAPPING_OVERRIDES,
    )


def bulk_index(
    df: DataFrame,
    index_name: str,
    *,
    poster: Callable[[str, str], None] | None = None,
    out_dir: str | None = None,
    batch_size: int = 500,
    mapping: dict | None = None,
    http: Callable[[str, str, str | None], tuple[int, str]] | None = None,
) -> None:
    """S13: NDJSON `_bulk` batches built per partition on the executors.

    `poster(index_name, ndjson_chunk)` is the transport (HTTP in prod).
    With no poster, writes `<out_dir>/<index>-part-*.ndjson` — the offline
    sink. Requires `doc_id` and `doc_json` columns (search_projection).
    With `mapping` + `http`, the index is created iff missing (typed DDL)
    before any bulk batch is posted, as the reference does."""
    if poster is None and out_dir is None:
        raise ValueError("bulk_index needs a poster or an out_dir")
    if mapping is not None and http is not None:
        create_index_if_missing(index_name, mapping, http=http)

    rows = df.select("doc_id", "doc_json")

    def send(partition_idx: int, it):
        buf: list[str] = []
        chunk_no = 0

        def flush():
            nonlocal chunk_no
            if not buf:
                return
            ndjson = "\n".join(buf) + "\n"
            if poster is not None:
                poster(index_name, ndjson)
            else:
                os.makedirs(out_dir, exist_ok=True)
                path = os.path.join(
                    out_dir, f"{index_name}-part-{partition_idx:05d}-{chunk_no:04d}.ndjson"
                )
                with open(path, "w", encoding="utf-8") as f:
                    f.write(ndjson)
            chunk_no += 1
            buf.clear()

        for row in it:
            buf.append(json.dumps({"index": {"_index": index_name, "_id": row.doc_id}}))
            buf.append(row.doc_json)
            if len(buf) >= 2 * batch_size:
                flush()
        flush()
        return iter(())

    rows.rdd.mapPartitionsWithIndex(send).count()
