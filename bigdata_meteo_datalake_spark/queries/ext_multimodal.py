"""Multimodal-column queries: the Arrow/mapInPandas decode kernel is
oracle-checked — the deterministic fake decode is pure arithmetic over the
blob bytes (md5 digest bytes -> dimensions, byte sums -> intensity), which
DuckDB replicates exactly over the same utf-8 text bytes. This gates the
whole Pandas-UDF plumbing (schema, batch iteration, byte handling) behind
the same hash-compare as every built-in operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.multimodal import attach_blob, decode_image_features
from ..sources.lake import read_table
from . import register

_MM_ORACLE = """
WITH b AS (
  SELECT doc_id,
         text,
         length(text) AS n_chars,
         octet_length(encode(text)) AS n_bytes,
         md5(text) AS h
  FROM documents
)
SELECT doc_id,
       cast(64 + (('0x' || substr(h, 1, 2))::int % 64) AS int) AS width,
       cast(64 + (('0x' || substr(h, 3, 2))::int % 64) AS int) AS height,
       cast(n_bytes AS bigint) AS n_bytes,
       (cast(list_aggregate(list_transform(range(1, least(n_chars, 256) + 1),
                                           i -> ascii(substr(text, i, 1))), 'sum')
             AS double)
        / greatest(1, least(n_chars, 256))) / 255.0 AS mean_intensity
FROM b
"""


@register("multimodal_image_features", oracle=_MM_ORACLE, tags=("extension", "multimodal"))
def multimodal_image_features(spark, sf_dir):
    """Binary media column -> feature extraction through the mapInPandas
    kernel (operators/multimodal.py). documents.text stands in for the
    media bytes (attach_blob); the fake decode's arithmetic is replicated
    byte-for-byte by the oracle, so a kernel/batching bug cannot hide."""
    d = read_table(spark, sf_dir, "documents")
    media = attach_blob(d)
    return decode_image_features(media, decode="fake")
