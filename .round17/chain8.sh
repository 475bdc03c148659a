#!/bin/bash
cd /root/repo
python .round17/ab_env.py cc_trade_graph_two_phase SPARK_GRAFT_CC_ADAPTIVE_PARTS 0 1 6 > .round17/ab_ccparts_cc_sf01.out 2>/dev/null
python .round17/ab_env.py semantic_dedup_lsh SPARK_GRAFT_CC_ADAPTIVE_PARTS 0 1 5 > .round17/ab_ccparts_sem_sf01.out 2>/dev/null
python .round17/ab_env.py cc_trade_graph_two_phase SPARK_GRAFT_CC_ADAPTIVE_PARTS 0 1 3 /root/repo/.scale/sf10 > .round17/ab_ccparts_cc_sf10.out 2>/dev/null
python .round17/eq_check.py cc_trade_graph_two_phase SPARK_GRAFT_CC_ADAPTIVE_PARTS 0 1 > .round17/eq_ccparts_sf01.out 2>/dev/null
echo CHAIN8_DONE > .round17/chain8.done
