#!/usr/bin/env python
"""Worked example: a pretraining-data pipeline end to end over the
documents table — the LLM-scale workflow this engine's extension surface
exists for.

    python examples/pretraining_corpus_run.py [sf_dir]

Stages (each one a registered, oracle-checked operator — this script only
composes them):

1. filter cascade       — C4/Gopher-style rules with first-failing-rule
                          attribution (round-4 governance surface)
2. PII screen           — scan + redaction fingerprint; docs with any
                          match are flagged for the redacted variant
3. quality filtering    — heuristic score AND the fasttext-shaped hashed
                          classifier (both must pass), with the
                          classifier's calibration bins printed so the
                          cut is auditable
4. near-dup dedup       — MinHash-LSH candidates, cluster, keep the
                          best-quality representative per cluster
5. contamination scan   — drop documents overlapping the benchmark gram set
6. span-dup screen      — drop docs whose 8-token spans are mostly
                          already-seen boilerplate (sub-doc contamination
                          whole-doc dedup misses)
6b. boilerplate screen  — drop docs mostly covered by corpus-frequent
                          5-grams; plus a DSIR readout of how much of the
                          importance-resampling pool survives the stack
7. train/val/test split — deterministic hash buckets (rerun-stable)
8. sequence packing     — greedy token-budget packing per shard
9. language balance     — T=0.5 temperature sampling weights for the mix
10. mix plan            — downsampling rates toward a uniform language mix
11. tokenizer seed      — first BPE merges learned from the corpus, then
                          applied back to it for the real token budget
12. shard manifest      — content-stable shard assignment + checksums,
                          plus per-split/source counts, written as the
                          run's parquet artifacts

Every stage is lazy until the final writes; the composed job is one Spark
DAG — filters reach the scans, dims broadcast, and the only corpus-sized
shuffles are the dedup band join and the packing shard window.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigdata_meteo_datalake_spark.queries.ext_corpus import (
    bpe_encode_token_counts,
    bpe_train_merges,
    lang_balance_weights,
    span_dedup_report,
)
from bigdata_meteo_datalake_spark.queries.ext_dedup import dedup_survivors_by_quality
from bigdata_meteo_datalake_spark.queries.ext_governance import (
    filter_cascade_report,
    mix_plan_report,
    pii_scan_report,
    shard_manifest,
)
from bigdata_meteo_datalake_spark.queries.ext_metrics import (
    ngram_novelty_rate,
    span_corruption_build,
)
from bigdata_meteo_datalake_spark.queries.ext_selection import (
    boilerplate_ngram_coverage,
    dsir_importance_weights,
)
from bigdata_meteo_datalake_spark.queries.ext_text import (
    calibration_bins,
    quality_classifier_score,
    text_quality_score,
)
from bigdata_meteo_datalake_spark.queries.ext_training import (
    benchmark_contamination,
    pack_documents_token_budget,
    train_val_test_split,
)
from bigdata_meteo_datalake_spark.session import get_spark
from bigdata_meteo_datalake_spark.sources.lake import read_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_root = tempfile.mkdtemp(prefix="corpus_run_")
    spark = get_spark("pretraining-corpus", cpus=8, shuffle_partitions=8)

    docs = read_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. filter cascade: keep only docs that pass every rule; the verdict
    # histogram tells the curator which rule is eating the corpus
    cascade = filter_cascade_report(spark, sf_dir)
    passed = cascade.where(F.col("verdict") == "pass").select("doc_id")

    # 2. PII screen: count matches per doc; a real pipeline would swap in
    # the redacted text for flagged docs — here we track the flag
    pii = pii_scan_report(spark, sf_dir)
    pii_flagged = pii.where(
        (F.col("n_emails") + F.col("n_phones") + F.col("n_ipv4")) > 0
    ).select("doc_id")
    n_pii = pii_flagged.count()

    # 3. quality: the heuristic gate AND the hashed linear classifier must
    # both pass (the classic two-filter stack: cheap rules, then a model)
    quality = text_quality_score(spark, sf_dir)
    clf = quality_classifier_score(spark, sf_dir)
    kept_q = (
        quality.where(F.col("is_high_quality"))
        .select("doc_id")
        .join(clf.where(F.col("keep")).select("doc_id"), "doc_id")
    )

    # 2. dedup: best-quality survivor per near-dup cluster
    survivors = dedup_survivors_by_quality(spark, sf_dir).select("doc_id")

    # 3. contamination: registered scan flags contaminated docs
    clean = benchmark_contamination(spark, sf_dir).where(
        ~F.col("is_contaminated")
    ).select("doc_id")

    # 4. span-dup screen: drop docs that are >60% already-seen spans
    span_ok = span_dedup_report(spark, sf_dir).where(
        F.coalesce(F.col("dup_frac"), F.lit(0.0)) <= 0.6
    ).select("doc_id")

    # 4b. boilerplate screen: drop docs mostly covered by corpus-frequent
    # 5-grams (chrome, templates) — the CCNet-style cleaning signal
    not_boiler = boilerplate_ngram_coverage(spark, sf_dir).where(
        ~F.coalesce(F.col("is_boilerplate_doc"), F.lit(False))
    ).select("doc_id")

    corpus = (
        docs.join(F.broadcast(passed), "doc_id")
        .join(F.broadcast(kept_q), "doc_id")
        .join(F.broadcast(survivors), "doc_id")
        .join(F.broadcast(clean), "doc_id")
        .join(F.broadcast(span_ok), "doc_id")
        .join(F.broadcast(not_boiler), "doc_id")
    )
    n1 = corpus.count()

    # 4c. DSIR readout: how much of the importance-resampling pool (top
    # docs by target-domain likelihood ratio) survives the filter stack —
    # low overlap means the filters and the target distribution disagree
    dsir_pool = dsir_importance_weights(spark, sf_dir).select("doc_id")
    n_dsir_kept = dsir_pool.join(corpus.select("doc_id"), "doc_id").count()
    n_dsir = dsir_pool.count()

    # 5. deterministic split (hash-bucket, rerun-stable)
    split = train_val_test_split(spark, sf_dir).select("doc_id", "split")
    final = corpus.join(split, "doc_id")

    # 6. packing plan for the training split
    packs = pack_documents_token_budget(spark, sf_dir).join(
        final.where(F.col("split") == "train").select("doc_id"), "doc_id"
    )
    n_packs = packs.select("pack_id").distinct().count()

    # 9. language-balance weights for the training mix
    weights = lang_balance_weights(spark, sf_dir)

    # 10. mix plan: downsampling rates toward a uniform language target
    mix = mix_plan_report(spark, sf_dir)

    # 11. tokenizer seed: first BPE merges over the corpus, then applied
    # back to every document for the real (post-merge) token budget
    merges = bpe_train_merges(spark, sf_dir).collect()
    budget = bpe_encode_token_counts(spark, sf_dir).agg(
        F.sum("n_bpe_tokens").alias("total_bpe_tokens"),
        F.sum("n_words").alias("total_words"),
    ).collect()[0]

    # 12. shard manifest: content-stable shards + checksums
    shards = shard_manifest(spark, sf_dir)
    shards.write.mode("overwrite").parquet(os.path.join(out_root, "shards"))

    manifest = (
        final.groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
        )
        .orderBy("split", "source")
    )
    manifest_path = os.path.join(out_root, "manifest")
    manifest.write.mode("overwrite").parquet(manifest_path)
    final.select("doc_id", "split", "source").write.mode("overwrite").partitionBy(
        "split"
    ).parquet(os.path.join(out_root, "corpus"))

    # 13. denoising objective — materialize T5-style span-corruption pairs
    # for the surviving train docs (join prunes to the corpus cut)
    samples = span_corruption_build(spark, sf_dir).join(
        final.where(F.col("split") == "train").select("doc_id"), "doc_id"
    )
    samples.write.mode("overwrite").parquet(os.path.join(out_root, "denoise_pairs"))
    n_samples = samples.count()

    # 14. memorization readout — graded n-gram novelty of the held-out
    # splits vs train (the honest companion to the binary leakage flag)
    novelty = {r["split"]: r for r in ngram_novelty_rate(spark, sf_dir).collect()}

    rows = manifest.collect()
    print(
        f"corpus: {n0} docs -> {n1} after "
        "cascade+quality+dedup+contamination+span-dup+boilerplate"
    )
    print(f"denoising pairs materialized for train split: {n_samples}")
    for split, r in sorted(novelty.items()):
        print(
            f"  novelty {split}: micro {r['micro_novelty']:.4f} "
            f"macro {r['macro_novelty']:.4f} over {r['n_docs']} docs"
        )
    print(f"dsir pool overlap with final corpus: {n_dsir_kept}/{n_dsir}")
    print(f"pii-flagged docs (redacted variant would ship): {n_pii}")
    for r in cascade.groupBy("verdict").count().orderBy("verdict").collect():
        print(f"  cascade {r['verdict']:>15}: {r['count']:>6}")
    for r in mix.orderBy("lang").collect():
        print(
            f"  mix {r['lang']}: rate {r['sampling_rate']:.4f} "
            f"keep {r['docs_kept']} (after-share {r['share_after_frac']:.4f})"
        )
    print(f"training packs: {n_packs}")
    for r in rows:
        print(f"  {r['split']:>5} / {r['source']:<12} {r['n_docs']:>6} docs")
    for r in weights.orderBy("lang").collect():
        print(
            f"  lang {r['lang']}: share {r['share_frac']:.4f} "
            f"upsample x{r['upsample_factor']:.3f}"
        )
    print(
        "  bpe merges: "
        + ", ".join(f"({m['left_tok']}+{m['right_tok']})x{m['pair_count']}" for m in merges)
    )
    print(
        f"  token budget: {budget['total_bpe_tokens']} bpe tokens over "
        f"{budget['total_words']} words"
    )
    for r in calibration_bins(spark, sf_dir).orderBy("bin_id").collect():
        print(
            f"  clf bin {r['bin_id']}: {r['n_docs']:>6} docs "
            f"mean {r['mean_score']:+.4f} en-rate {r['en_rate']:.4f}"
        )
    print(f"artifacts: {out_root}")
    assert n1 <= n0 and n1 > 0 and n_packs > 0
    assert len(merges) == 3
    spark.stop()


if __name__ == "__main__":
    main()
