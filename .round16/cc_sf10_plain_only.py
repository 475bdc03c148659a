import sys, os, json
sys.path.insert(0, "/root/repo"); os.chdir("/root/repo")
sys.path.insert(0, "/root/repo/.scale")
import importlib.util
spec = importlib.util.spec_from_file_location("p16", "/root/repo/.scale/profile_cc16.py")
p16 = importlib.util.module_from_spec(spec); spec.loader.exec_module.__self__ if False else spec.loader.exec_module(p16)
from bigdata_meteo_datalake_spark.session import get_spark
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark("cc16-sf10-frontier", cpus=cpus, shuffle_partitions=cpus)
p16.run(spark, "/root/testdata/sf0.001", frontier=False)
r = p16.run(spark, "/root/repo/.scale/sf10", frontier=False)
print("sf10_frontieroff", json.dumps(r), flush=True)
