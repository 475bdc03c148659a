"""Degenerate-input robustness: every registered query must execute
against completely EMPTY tables (schema-exact, including the events
table's INT64-nanos timestamp) without raising. At 100 TB every operator
will eventually see an empty partition, an empty date range, or an empty
join side — an operator that throws on zero rows is a pipeline outage,
not an edge case."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from bigdata_meteo_datalake_spark.queries import REGISTRY, queries

from .conftest import SF0001

_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def empty_sf_dir(tmp_path_factory):
    """Schema-exact empty twins of every table — written with pyarrow so
    physical types survive (Spark would rewrite the events nanos column)."""
    tmp = tmp_path_factory.mktemp("empty_sf")
    for t in _TABLES:
        schema = pq.read_schema(f"{SF0001}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(tmp / f"{t}.parquet"))
    return str(tmp)


def test_every_query_survives_empty_tables(spark, empty_sf_dir):
    failures = []
    for name, q in queries().items():
        try:
            REGISTRY[name].fn(spark, empty_sf_dir).count()
        except Exception as ex:  # noqa: BLE001 — collecting the full report
            failures.append(f"{name}: {type(ex).__name__}: {str(ex)[:120]}")
    assert not failures, "\n".join(failures)
