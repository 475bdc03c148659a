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


def bulk_index(
    df: DataFrame,
    index_name: str,
    *,
    poster: Callable[[str, str], None] | None = None,
    out_dir: str | None = None,
    batch_size: int = 500,
) -> None:
    """S13: NDJSON `_bulk` batches built per partition on the executors.

    `poster(index_name, ndjson_chunk)` is the transport (HTTP in prod).
    With no poster, writes `<out_dir>/<index>-part-*.ndjson` — the offline
    sink. Requires `doc_id` and `doc_json` columns (search_projection)."""
    if poster is None and out_dir is None:
        raise ValueError("bulk_index needs a poster or an out_dir")

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
