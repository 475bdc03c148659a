#!/bin/bash
cd /root/repo
while [ ! -f .round17/chain1.done ]; do sleep 15; done
python .round17/ab_env.py span_dedup_report SPARK_GRAFT_SPAN_ARROW 0 1 5 > .round17/ab_span_sf01.out 2>/dev/null
python .round17/ab_env.py dsir_importance_weights SPARK_GRAFT_NGRAM_ARROW 0 1 5 > .round17/ab_dsir_sf01.out 2>/dev/null
python .round17/ab_env.py boilerplate_ngram_coverage SPARK_GRAFT_NGRAM_ARROW 0 1 5 > .round17/ab_boiler_sf01.out 2>/dev/null
python .round17/ab_env.py span_dedup_report SPARK_GRAFT_SPAN_ARROW 0 1 3 /root/repo/.scale/sf10 > .round17/ab_span_sf10.out 2>/dev/null
python .round17/ab_env.py dsir_importance_weights SPARK_GRAFT_NGRAM_ARROW 0 1 3 /root/repo/.scale/sf10 > .round17/ab_dsir_sf10.out 2>/dev/null
python .round17/ab_env.py boilerplate_ngram_coverage SPARK_GRAFT_NGRAM_ARROW 0 1 3 /root/repo/.scale/sf10 > .round17/ab_boiler_sf10.out 2>/dev/null
python .round17/eq_check.py span_dedup_report SPARK_GRAFT_SPAN_ARROW 0 1 /root/repo/.scale/sf10 > .round17/eq_span_sf10.out 2>/dev/null
python .round17/eq_check.py dsir_importance_weights SPARK_GRAFT_NGRAM_ARROW 0 1 /root/repo/.scale/sf10 > .round17/eq_dsir_sf10.out 2>/dev/null
python .round17/eq_check.py boilerplate_ngram_coverage SPARK_GRAFT_NGRAM_ARROW 0 1 /root/repo/.scale/sf10 > .round17/eq_boiler_sf10.out 2>/dev/null
python .round17/eq_check.py dedup_jaccard_prefix_filter SPARK_GRAFT_SHINGLE_ARROW 0 1 /root/repo/.scale/sf10 > .round17/eq_jaccard_sf10.out 2>/dev/null
echo CHAIN2_DONE > .round17/chain2.done
