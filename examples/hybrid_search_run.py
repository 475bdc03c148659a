#!/usr/bin/env python
"""Worked example: hybrid search end to end over documents + embeddings —
the retrieval stack the reference delegates to Elasticsearch
(scripts/index/index_elasticsearch.py), re-expressed inside the engine.

    python examples/hybrid_search_run.py [sf_dir]

Stages (each a registered, oracle-checked operator — this script only
composes them):

1. lexical ranking   — BM25 top-20 for the fixed query terms (Lucene's
                       default similarity, the exact scoring an ES index
                       would apply)
2. dense ranking     — brute-force cosine top-k against the embedding
                       corpus (the ANN correctness baseline; IVF/LSH/PQ
                       are the registered scale paths)
3. hybrid fusion     — reciprocal-rank fusion of both top-100 candidate
                       lists (the standard RAG recipe)
4. quality gate      — retrieval-time filtering: fused hits joined to
                       their quality-classifier scores, so low-quality
                       documents never reach the context window
5. eval readout      — nDCG@10 of the dense ranking against the label
                       relevance, the number that says whether the ANN
                       scale path may replace the baseline

Everything is lazy until the final collects; dims broadcast; both
retrievers end in TakeOrderedAndProject, so no global sort ever runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigdata_meteo_datalake_spark.queries.ext_search import (
    bm25_doc_scores,
    rrf_hybrid_fusion,
)
from bigdata_meteo_datalake_spark.queries.ext_similarity import (
    knn_cosine_bruteforce,
    ndcg_at10_report,
)
from bigdata_meteo_datalake_spark.queries.ext_text import quality_classifier_score
from bigdata_meteo_datalake_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("hybrid-search", cpus=8, shuffle_partitions=8)

    print("== lexical: BM25 top-5 ==")
    for r in bm25_doc_scores(spark, sf_dir).orderBy(F.desc("bm25")).limit(5).collect():
        print(f"  doc {r.doc_id:>4}  bm25 {r.bm25:.4f}  dl {r.dl}")

    print("== dense: cosine top-5 for query vec 0 ==")
    knn = knn_cosine_bruteforce(spark, sf_dir).where(F.col("query_id") == 0)
    for r in knn.orderBy(F.desc("cosine")).limit(5).collect():
        print(f"  vec {r.neighbor_id:>4}  cosine {r.cosine:.4f}")

    print("== hybrid: RRF fused top-10, quality-gated ==")
    fused = rrf_hybrid_fusion(spark, sf_dir)
    quality = quality_classifier_score(spark, sf_dir).select(
        "doc_id", "quality_score", "keep"
    )
    gated = fused.join(quality, "doc_id", "left").orderBy(F.desc("rrf_score"))
    rows = gated.limit(10).collect()
    for r in rows:
        tr = "-" if r.text_rank is None else str(r.text_rank)
        vr = "-" if r.vec_rank is None else str(r.vec_rank)
        print(
            f"  doc {r.doc_id:>4}  rrf {r.rrf_score:.6f}  "
            f"text#{tr:>3} vec#{vr:>3}  quality {r.quality_score} keep={r.keep}"
        )

    print("== eval: dense ranking nDCG@10 ==")
    ndcg = ndcg_at10_report(spark, sf_dir).agg(
        F.avg("ndcg10").alias("mean_ndcg")
    ).collect()[0]
    print(f"  mean nDCG@10 = {ndcg.mean_ndcg:.4f}")

    assert rows, "fusion returned no hits"
    spark.stop()


if __name__ == "__main__":
    main()
