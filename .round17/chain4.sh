#!/bin/bash
cd /root/repo
# decision-critical A/Bs, serial, quiet window
python .round17/ab_env.py dsir_importance_weights SPARK_GRAFT_NGRAM_ARROW 0 1 4 /root/repo/.scale/sf10 > .round17/ab_dsir_sf10_quiet.out 2>/dev/null
python .round17/ab_env.py semantic_dedup_lsh SPARK_GRAFT_LSH_GUARD_AGG 0 1 5 > .round17/ab_guard_sem_sf01.out 2>/dev/null
python .round17/ab_env.py semantic_dedup_lsh SPARK_GRAFT_LSH_GUARD_AGG 0 1 3 /root/repo/.scale/sf10 > .round17/ab_guard_sem_sf10.out 2>/dev/null
python .round17/eq_check.py semantic_dedup_lsh SPARK_GRAFT_LSH_GUARD_AGG 0 1 /root/repo/.scale/sf10 > .round17/eq_guard_sem_sf10.out 2>/dev/null
python .round17/ab_env.py semantic_dedup_ivf SPARK_GRAFT_IVF_ASSIGN_AGG 0 1 4 > .round17/ab_ivfassign_sf01.out 2>/dev/null
echo CHAIN4_DONE > .round17/chain4.done
