#!/bin/bash
# alternating A/B: fresh process per run, 2 runs per config
cd /root/repo
for i in 1 2; do
  echo "== pass $i off $(cat /proc/loadavg)"
  SPARK_GRAFT_DRIVER_MEM=24g timeout 1200 python .round16/cc_sf10_plain_only.py 2>/dev/null
  echo "== pass $i on $(cat /proc/loadavg)"
  SPARK_GRAFT_DRIVER_MEM=24g timeout 1200 python .round16/cc_sf10_frontier_only.py 2>/dev/null
done
