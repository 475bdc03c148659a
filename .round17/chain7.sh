#!/bin/bash
cd /root/repo
while [ ! -f .round17/chain6.done ]; do sleep 15; done
python .round17/ab_env_fresh.py dedup_simhash SPARK_GRAFT_SIMHASH_PACKED 0 1 4 > .round17/ab_simhash_fresh.out 2>/dev/null
python .round17/ab_env.py cc_trade_graph_two_phase SPARK_GRAFT_CC_MIDCUT_LAZY 0 1 6 > .round17/ab_ccmidcut_cc_quiet.out 2>/dev/null
echo CHAIN7_DONE > .round17/chain7.done
