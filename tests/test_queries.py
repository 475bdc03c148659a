"""Every registered query runs and, when it declares an oracle, matches
DuckDB exactly (row count + schema + order-insensitive values) — the same
gate the driver applies at sf0.01."""

from __future__ import annotations

import pytest

from bigdata_meteo_datalake_spark.queries import REGISTRY, queries

from .conftest import TEST_SF_DIR
from .oracle_utils import compare_to_oracle

QUERY_NAMES = sorted(queries())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, name):
    q = REGISTRY[name]
    try:
        df = q.fn(spark, TEST_SF_DIR)
        if q.oracle is not None:
            compare_to_oracle(df, q.oracle, TEST_SF_DIR)
        else:
            assert df.count() >= 0
    finally:
        # queries now localCheckpoint (not persist) their multi-consumer
        # intermediates, so blocks free on GC — clearCache stays as
        # defense-in-depth against any future cacheManager entry hoarding
        # across a 250+-query sweep in one session
        spark.catalog.clearCache()


def test_entry_smoke(spark):
    import __spark_entry__ as e

    out = e.entry(spark)
    assert out.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
