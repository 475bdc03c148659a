#!/usr/bin/env python
"""Worked example: the web-ingestion pillar end to end — from crawl
discovery to a cleaned, deduplicated, multimodal-ready corpus, the
round-10 surface composed as one pipeline.

    python examples/web_corpus_run.py [sf_dir]

Stages (each one a registered, oracle-checked operator — this script
only composes them):

1. discovery        — sitemap / RSS / Atom parsing seeds the frontier
                      (feed_discovery_report's operators)
2. robots admission — urllib.robotparser decisions per URL against the
                      broadcast per-domain robots dimension
3. politeness plan  — domain-partitioned fetch rounds under a
                      per-domain rate
4. WARC parsing     — crawl-container records, chunked/gzip HTTP
                      bodies decoded
5. HTML extraction  — title/text/links through the stdlib parser;
                      link graph degrees as a crawl-health readout
6. embedded media   — data:image JPEG URIs decoded through the real
                      codec; pixel-quality triage stats
7. text hygiene     — Unicode NFKC + control stripping, then language
                      quality scoring over the cleaned text
8. dedup            — MinHash-LSH near-dup candidates over the
                      extracted text (the corpus-admission gate)

Every stage is lazy until the final actions; parse kernels are pure
per-blob maps, the only corpus-sized shuffles are the domain aggregate
and the dedup band join.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from bigdata_meteo_datalake_spark.operators.web import (
        data_uri_image_features,
        link_graph_edges,
        robots_admission,
        synthesize_crawl_urls,
        synthesize_html_with_images,
        synthesize_linked_pages,
        synthesize_robots_table,
        synthesize_warc_blobs,
        warc_response_features,
    )
    from bigdata_meteo_datalake_spark.operators.sitemap import (
        feed_discovery_features,
        synthesize_discovery_blobs,
    )
    from bigdata_meteo_datalake_spark.queries import queries
    from bigdata_meteo_datalake_spark.session import get_spark
    from bigdata_meteo_datalake_spark.sources.lake import read_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("web-corpus", cpus=8, shuffle_partitions=8)
    qs = queries()
    docs = read_table(spark, sf_dir, "documents")

    # 1. discovery: the frontier the crawler starts from
    seeds = feed_discovery_features(synthesize_discovery_blobs(docs))
    print("discovered entries:", seeds.count(),
          "| by kind:", dict(seeds.groupBy("kind").count().collect()))

    # 2.-3. robots admission + politeness schedule
    admitted = robots_admission(
        synthesize_crawl_urls(docs), synthesize_robots_table(spark)
    ).where(F.col("allowed"))
    print("admitted URLs:", admitted.count())
    schedule = qs["crawl_schedule_report"](spark, sf_dir)
    print("fetch rounds:",
          schedule.agg(F.max("fetch_round")).first()[0] + 1)

    # 4. WARC parsing (chunked/gzip bodies decoded inside)
    responses = warc_response_features(synthesize_warc_blobs(docs))
    ok = responses.where(F.col("http_status") == 200)
    print("HTTP 200 records:", ok.count(),
          "| bytes:", ok.agg(F.sum("body_bytes")).first()[0])

    # 5. HTML extraction + link-graph health readout
    degrees = qs["link_graph_degree_report"](spark, sf_dir)
    top = degrees.orderBy(F.desc("n_links")).first()
    print("busiest domain:", top["src_domain"], "links:", top["n_links"])
    edges = link_graph_edges(synthesize_linked_pages(docs))
    print("edges:", edges.count())

    # 6. embedded media + pixel triage
    imgs = data_uri_image_features(synthesize_html_with_images(docs))
    print("embedded images:", imgs.count(),
          "| mean intensity:",
          round(imgs.agg(F.avg("mean_intensity")).first()[0], 4))
    quality = qs["image_quality_report"](spark, sf_dir)
    flat = quality.where(F.col("var_px") < 100).count()
    print("low-variance (flat) images:", flat)

    # 7. text hygiene on the extracted corpus
    cleaned = qs["unicode_clean_report"](spark, sf_dir)
    print("texts changed by NFKC/control cleanup:",
          cleaned.where(F.col("changed")).count())

    # 8. near-dup admission gate over document text
    pairs = qs["dedup_minhash_lsh"](spark, sf_dir)
    print("near-dup pairs at the admission gate:", pairs.count())

    spark.stop()


if __name__ == "__main__":
    main()
