"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KPI query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full named-query registry from
``bigdata_meteo_datalake_spark.queries`` (one entry per implemented
operator from SURVEY.md section 2 plus the extension operators).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_meteo_datalake_spark import queries as _registry  # noqa: E402
from bigdata_meteo_datalake_spark.session import apply_session_policy  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    apply_session_policy(spark)
    return _registry.queries()["kpi_daily_order_summary"](spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-expressible query."""
    return _registry.oracle_sql()
