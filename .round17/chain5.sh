#!/bin/bash
cd /root/repo
while [ ! -f .round17/chain4.done ]; do sleep 15; done
python .round17/ab_env.py dedup_minhash_lsh SPARK_GRAFT_SHINGLE_ARROW 0 1 5 > .round17/ab_shingle_minhash_sf01.out 2>/dev/null
python .round17/ab_env.py dedup_jaccard_prefix_filter SPARK_GRAFT_SHINGLE_ARROW 0 1 4 > .round17/ab_shingle_jaccard_sf01.out 2>/dev/null
python .round17/ab_env.py dedup_simhash SPARK_GRAFT_SIMHASH_PACKED 0 1 5 > .round17/ab_simhash_sf01.out 2>/dev/null
python .round17/probe_cc17.py > .round17/probe_cc17_sf01.out 2>/dev/null
echo CHAIN5_DONE > .round17/chain5.done
