from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_meteo_datalake_spark.session import get_spark  # noqa: E402

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"

#: sf dir the oracle-compare tests run at; override to sf0.01 to mirror the
#: driver's correctness gate exactly (slower):
#:   SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 python -m pytest tests/
TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", SF0001)


@pytest.fixture(scope="session")
def spark():
    import tempfile

    s = get_spark(
        "engine-tests",
        cpus=8,
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="wh_")},
    )
    yield s
