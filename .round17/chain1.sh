#!/bin/bash
cd /root/repo
# wait for the jaccard sf10 A/B to finish
while ps -p $(pgrep -f "ab_env.py dedup_jaccard_prefix_filter" | head -1) >/dev/null 2>&1; do sleep 10; done
SPARK_GRAFT_SHINGLE_ARROW=1 python .round17/verify_queries.py lsh_band_load_report split_leakage_report > .round17/verify_arrow_others.out 2>/dev/null
python .round17/ab_env.py cc_trade_graph_two_phase SPARK_GRAFT_CC_MIDCUT_LAZY 0 1 6 > .round17/ab_ccmidcut_cc.out 2>/dev/null
python .round17/ab_env.py semantic_dedup_lsh SPARK_GRAFT_CC_MIDCUT_LAZY 0 1 6 > .round17/ab_ccmidcut_sem.out 2>/dev/null
python .round17/ab_tree.py dedup_minhash_lsh /root/tree_882eb5d /root/tree_ad5dda2 5 > .round17/ab_tree_minhash.out 2>/dev/null
python .round17/ab_tree.py span_corruption_build /root/tree_882eb5d /root/tree_ad5dda2 5 > .round17/ab_tree_spancorr.out 2>/dev/null
echo CHAIN1_DONE > .round17/chain1.done
