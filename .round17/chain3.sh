#!/bin/bash
cd /root/repo
while [ ! -f .round17/chain2.done ]; do sleep 15; done
python .round17/ab_env.py bm25_doc_scores SPARK_GRAFT_BM25_ARROW 0 1 5 > .round17/ab_bm25_sf01.out 2>/dev/null
python .round17/ab_env.py bm25_doc_scores SPARK_GRAFT_BM25_ARROW 0 1 3 /root/repo/.scale/sf10 > .round17/ab_bm25_sf10.out 2>/dev/null
python .round17/ab_env.py rrf_hybrid_fusion SPARK_GRAFT_BM25_ARROW 0 1 4 > .round17/ab_rrf_sf01.out 2>/dev/null
python .round17/eq_check.py bm25_doc_scores SPARK_GRAFT_BM25_ARROW 0 1 /root/repo/.scale/sf10 > .round17/eq_bm25_sf10.out 2>/dev/null
python .round17/ab_env.py cc_trade_graph_two_phase SPARK_GRAFT_CC_MIDCUT_LAZY 0 1 3 /root/repo/.scale/sf10 > .round17/ab_ccmidcut_sf10.out 2>/dev/null
echo CHAIN3_DONE > .round17/chain3.done
