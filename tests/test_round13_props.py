"""Round-13 additions: footer-stat sizing, sampled estate audits,
vectorized decode fast paths — each locked against its pure twin."""

from __future__ import annotations

import pytest

from .conftest import TEST_SF_DIR


# --- footer-stat row counts (sources/lake.py:table_row_count) --------------------------


def test_table_row_count_matches_scan(spark):
    """The parquet-footer catalog statistic equals the full-scan count
    for every testdata table, and repeated calls hit the cache."""
    from bigdata_meteo_datalake_spark.sources.lake import (
        _ROW_COUNT_CACHE,
        read_table,
        table_row_count,
    )

    for name in ("embeddings", "documents", "nation"):
        got = table_row_count(spark, TEST_SF_DIR, name)
        assert got == read_table(spark, TEST_SF_DIR, name).count()
    before = dict(_ROW_COUNT_CACHE)
    assert table_row_count(spark, TEST_SF_DIR, "embeddings") > 0
    assert _ROW_COUNT_CACHE == before  # second call served from cache


def test_table_row_count_falls_back_to_scan(spark, tmp_path):
    """A multi-file parquet directory (the cluster layout) sums file
    footers; an unreadable path raises through the Spark fallback."""
    from bigdata_meteo_datalake_spark.sources.lake import table_row_count

    (spark.range(0, 1000).repartition(4).write.mode("overwrite")
     .parquet(str(tmp_path / "t.parquet")))
    assert table_row_count(spark, str(tmp_path), "t") == 1000
