"""Spark API surfaces beyond the DataFrame DSL: Python UDTFs (lateral
table functions) and the SQL entry point — both must reproduce the
DSL-built operators exactly."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from bigdata_meteo_datalake_spark.queries import REGISTRY, queries

from .conftest import TEST_SF_DIR


def test_udtf_chunker_matches_declarative(spark):
    """A Python UDTF (Spark 3.5+/4 table function) implementing the same
    stride chunker as chunk_documents_stride must produce identical rows
    via a LATERAL join — the escape hatch for row-expanding logic that
    can't be an array expression, proven equivalent where it can be."""
    import re

    from pyspark.sql.functions import udtf

    from bigdata_meteo_datalake_spark.queries.ext_training import (
        _CHUNK_SIZE,
        _CHUNK_STRIDE,
    )

    @udtf(returnType="chunk_idx: bigint, n_chunk_tokens: int, chunk_text: string")
    class ChunkTokens:
        def eval(self, text: str):
            toks = re.split(r"\s+", text.strip().lower())
            for s in range(0, len(toks), _CHUNK_STRIDE):
                piece = toks[s : s + _CHUNK_SIZE]
                yield s // _CHUNK_STRIDE, len(piece), " ".join(piece)

    spark.udtf.register("chunk_tokens", ChunkTokens)
    spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet").createOrReplaceTempView(
        "docs_udtf"
    )
    cols = ["doc_id", "chunk_idx", "n_chunk_tokens", "chunk_text"]
    got = (
        spark.sql(
            "SELECT d.doc_id, c.chunk_idx, c.n_chunk_tokens, c.chunk_text "
            "FROM docs_udtf d, LATERAL chunk_tokens(d.text) c"
        )
        .toPandas()
        .sort_values(cols)
        .reset_index(drop=True)
    )
    queries()
    want = (
        REGISTRY["chunk_documents_stride"].fn(spark, TEST_SF_DIR)
        .toPandas()
        .sort_values(cols)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_oracle_sql_runs_on_spark_too(spark):
    """The oracle strings are written against DuckDB, but the portable
    ones are plain ANSI — running them through spark.sql over the same
    parquet views must match the DataFrame implementation. This pins the
    engine's SQL entry point (spark.sql) to the DSL surface for
    representative aggregation / analytic / quality shapes."""
    spark.read.parquet(f"{TEST_SF_DIR}/orders.parquet").createOrReplaceTempView(
        "orders"
    )
    queries()
    for name in (
        "reaggregate_daily_to_month",
        "fd_check_orders",
        "skew_report_custkey",
    ):
        q = REGISTRY[name]
        got = q.fn(spark, TEST_SF_DIR).toPandas()
        want = spark.sql(q.oracle).toPandas()
        cols = sorted(got.columns)
        got = got[cols].sort_values(cols).reset_index(drop=True)
        want = want[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
