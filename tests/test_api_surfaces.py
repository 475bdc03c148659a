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


def test_pandas_udf_matches_builtin(spark):
    """Arrow-vectorized scalar pandas_udf — the sanctioned Python escape
    hatch — must agree with the JVM-side expression it would replace
    (token counting via regex split)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def n_tokens(text: pd.Series) -> pd.Series:
        return text.str.strip().str.lower().str.split(r"\s+", regex=True).str.len()

    docs = spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet")
    both = docs.select(
        "doc_id",
        n_tokens("text").alias("py"),
        F.size(F.split(F.lower(F.trim("text")), r"\s+")).alias("jvm"),
    )
    assert both.where(F.col("py") != F.col("jvm")).count() == 0
    assert both.count() > 0


def test_apply_in_pandas_groupwise_matches_window(spark):
    """Grouped-map applyInPandas (per-group pandas kernel) must agree with
    the declarative per-group normalization to float tolerance."""
    import numpy as np
    import pandas as pd_

    ev = spark.read.parquet(f"{TEST_SF_DIR}/events.parquet").select(
        "event_id", "event_type", "value"
    )

    def normalize(pdf: pd_.DataFrame) -> pd_.DataFrame:
        mu = pdf["value"].mean()
        sd = pdf["value"].std(ddof=1)
        return pd_.DataFrame(
            {"event_id": pdf["event_id"], "z": (pdf["value"] - mu) / sd}
        )

    got = (
        ev.groupBy("event_type")
        .applyInPandas(normalize, schema="event_id long, z double")
        .toPandas()
        .set_index("event_id")["z"]
        .sort_index()
    )
    from pyspark.sql import Window

    w = Window.partitionBy("event_type")
    want = (
        ev.select(
            "event_id",
            (
                (F.col("value") - F.avg("value").over(w))
                / F.stddev_samp("value").over(w)
            ).alias("z"),
        )
        .toPandas()
        .set_index("event_id")["z"]
        .sort_index()
    )
    assert np.allclose(got.values, want.values, atol=1e-9)


def test_map_in_arrow_matches_select(spark):
    """mapInArrow (raw Arrow RecordBatch kernel, no pandas conversion)
    must agree with the select twin."""
    import pyarrow as pa

    docs = spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet").select(
        "doc_id", "source"
    )

    def upper_batches(batches):
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            import pyarrow.compute as pc

            yield pa.RecordBatch.from_arrays(
                [tbl.column("doc_id").combine_chunks(),
                 pc.utf8_upper(tbl.column("source")).combine_chunks()],
                names=["doc_id", "source_upper"],
            )

    got = (
        docs.mapInArrow(upper_batches, schema="doc_id long, source_upper string")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        docs.select("doc_id", F.upper("source").alias("source_upper"))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
