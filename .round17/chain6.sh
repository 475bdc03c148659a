#!/bin/bash
cd /root/repo
while [ ! -f .round17/chain5.done ]; do sleep 15; done
python .round17/ab_env.py semantic_dedup_ivf SPARK_GRAFT_IVF_ASSIGN_AGG 0 1 5 > .round17/ab_ivfassign_sf01_guardoff.out 2>/dev/null
python .round17/ab_env.py semantic_dedup_ivf SPARK_GRAFT_IVF_ASSIGN_AGG 0 1 2 /root/repo/.scale/sf10 > .round17/ab_ivfassign_sf10.out 2>/dev/null
python .round17/eq_check.py semantic_dedup_ivf SPARK_GRAFT_IVF_ASSIGN_AGG 0 1 > .round17/eq_ivfassign_sf01.out 2>/dev/null
echo CHAIN6_DONE > .round17/chain6.done
