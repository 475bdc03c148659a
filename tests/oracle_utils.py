"""Re-export: the oracle gate lives in the package (oracle.py) so the
CLI exposes it too; tests import from here for stability."""

from bigdata_meteo_datalake_spark.oracle import (  # noqa: F401
    compare_frames,
    compare_to_oracle,
    duckdb_connect,
)
