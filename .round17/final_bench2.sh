#!/bin/bash
cd /root/repo
R=.round17/bench_final_receipts.txt
for i in 4 5; do
  echo "== final bench r17 pre run$i ==" >> $R
  date >> $R; cat /proc/loadavg >> $R; vmstat 1 2 | tail -2 >> $R
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py > .round17/bench_final_run$i.json 2> .round17/bench_final_run$i.err
  cp BENCH_RUNS.json .round17/bench_final_run${i}_sidecar.json 2>/dev/null
  echo "== post run$i ==" >> $R
  date >> $R; cat /proc/loadavg >> $R; vmstat 1 2 | tail -2 >> $R
done
echo FINAL_BENCH2_DONE > .round17/final_bench2.done
