#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is forced end-to-end with a noop-format write (full execution,
no driver collect), warmed once at the smallest SF, then timed
$SPARK_GRAFT_BENCH_RUNS times (default 3); per-query medians make the
headline total, with every raw reading recorded under "query_runs".
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_meteo_datalake_spark.queries import REGISTRY, queries  # noqa: E402
from bigdata_meteo_datalake_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "pricing_summary",
    "q3_shipping_priority",
    "q5_revenue_by_nation",
    "largest_orders",
    "kpi_daily_order_summary",
    "enriched_orders_daily",
    "upsert_last_write_wins",
    "json_payload_extract",
    "text_quality_score",
    "dedup_exact",
    "dedup_minhash_lsh",
    "knn_cosine_bruteforce",
    "window_tumbling_hourly",
    "sessionize_events",
    "topk_orders_per_status",
    "asof_latest_order_per_event",
    # round-4 additions: the newer scale-critical paths (round-3 verdict #5)
    "dedup_jaccard_prefix_filter",
    "span_dedup_report",
    "cc_trade_graph_two_phase",
    "hll_distinct_users",
    # round-4 fifth-wave additions: data-selection + ML-primitive paths
    # (baseline restated for the 24-query set in BASELINE.md, same session)
    "dsir_importance_weights",
    "boilerplate_ngram_coverage",
    "embedding_covariance",
    # round-15 swap (round-14 verdict item 1): the benched spatial form
    # is now the bounded-output per-cell stats twin — the
    # pair-materializing form's output grows quadratically with point
    # density at fixed area (sf10: 350M pairs, 437x wall), so it cannot
    # be the headline artifact; it stays registered as the correctness
    # gate for the shared grid-bucketed generator (baseline restated
    # for the revised 35-query set in BASELINE.md, same session as the
    # set change)
    "spatial_radius_stats",
    # round-5 additions: search-ranking paths (baseline restated for the
    # 26-query set in BASELINE.md, same session as the set change)
    "bm25_doc_scores",
    "rrf_hybrid_fusion",
    # round-5 second wave: LLM objective materialization (pure map) and
    # bounded-horizon motif search (baseline restated for the 28-query set
    # in BASELINE.md, same session as the set change)
    "span_corruption_build",
    "ts_motif_top_pairs",
    # round-7 additions: the real-codec pillar's two newest paths — lossy
    # JPEG decode (Huffman/DCT kernels) and the demux-free ISO-BMFF
    # container probe (baseline restated for the 30-query set in
    # BASELINE.md, same session as the set change)
    "multimodal_jpeg_decode",
    "multimodal_mp4_probe",
    # round-8 addition: animated-GIF per-frame decode (real LZW,
    # interlace, canvas composition) — the frame-sampling path (baseline
    # restated for the 31-query set in BASELINE.md, same session)
    "multimodal_gif_frames",
    # round-9 addition: the similarity pillar's cluster-scale ANN path —
    # PQ codebook broadcast + ADC lookup-table top-k — was the only major
    # LLM-pipeline family not continuously timed (baseline restated for
    # the 32-query set in BASELINE.md, same session as the set change)
    "pq_ann_topk",
    # round-10 addition: the document-source pillar's flagship — full PDF
    # parsing (xref tables AND 1.5 xref/object streams, FlateDecode + PNG
    # predictors, content-stream text assembly) — the largest new-format
    # family of the round (baseline restated for the 33-query set in
    # BASELINE.md, same session as the set change)
    "pdf_text_report",
    # round-11 addition: the similarity pillar's flagship 100 TB dedup
    # path — SemDeDup over the full embeddings table via the LSH
    # sign-bucket pair generator into two-phase-star connected
    # components — was the engine's most expensive registered query
    # (4.5 s at sf0.1 in SCALE.md) without continuous per-round timing
    # (baseline restated for the 34-query set in BASELINE.md, same
    # session as the set change)
    "semantic_dedup_lsh",
    # round-12 addition: the arrival-format pillar's flagship — Avro
    # Object Container File decode (every avro type family, three block
    # codecs incl. hand-rolled snappy, per-block aggregate report) — the
    # largest new-format family of the round (baseline restated for the
    # 35-query set in BASELINE.md, same session as the set change)
    "avro_shard_report",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    spark = get_spark("bench", cpus=cpus, shuffle_partitions=cpus)
    all_queries = queries()
    names = [n for n in BENCH_QUERIES if n in REGISTRY]

    # Warm-up: run each query once at the smallest SF IMMEDIATELY before
    # its timed sf run, so the timed pass measures steady-state
    # (JIT-compiled, codegen-cached) throughput — the number that projects
    # to a long-running cluster — instead of first-invocation JVM
    # compilation cost. Interleaved (warm A, time A, warm B, time B, ...)
    # rather than two passes: Spark's generated-class cache is bounded
    # (~100 entries), so a separate warm-everything pass lets LATER
    # queries' compilation evict EARLIER queries' classes and the
    # recompile lands inside the timed run (observed as 2-4x spikes on
    # the heaviest plans once the set grew past ~28 queries). Warm-up
    # wall time is reported alongside for transparency.
    warm_dir = re.sub(r"sf[\d.]+", "sf0.001", sf_dir)
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    # One broken query must never zero out the whole bench (round-2 failure
    # mode: a single analysis error in warm-up crashed the harness before
    # any timing was recorded). Each query is isolated in try/except in
    # BOTH phases; failures are reported per-query and the JSON line still
    # prints with the total over the queries that ran.
    # Repeated-run protocol (round-8): this host shows +/-50% noise on
    # single readings, so every timed query runs $SPARK_GRAFT_BENCH_RUNS
    # times (default 3) immediately after its warm-up and the HEADLINE
    # number is the sum of per-query MEDIANS — robust to a one-off GC or
    # host-contention spike in either direction. All raw readings are
    # recorded in "query_runs" so a reviewer can re-derive any statistic.
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    errors: dict[str, str] = {}
    timings: dict[str, float] = {}
    query_runs: dict[str, list[float]] = {}
    warmup_sec = 0.0
    for name in names:
        t0 = time.perf_counter()
        try:
            all_queries[name](spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # noqa: BLE001 - bench must survive any query
            errors[name] = f"warmup: {type(e).__name__}: {e}"[:500]
            continue
        finally:
            # queries cut lineage with localCheckpoint (not persist), so
            # blocks free when the frame is GC'd; clearCache stays as
            # defense-in-depth so each timed run pays its own
            # materialization cost even if a cacheManager entry ever
            # appears
            spark.catalog.clearCache()
            warmup_sec += time.perf_counter() - t0
        runs: list[float] = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            try:
                df = all_queries[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                runs.append(round(time.perf_counter() - t0, 3))
            except Exception as e:  # noqa: BLE001
                errors[name] = f"timed: {type(e).__name__}: {e}"[:500]
                # discard partial readings: a query that errored mid-runs
                # must not contribute a median to the headline total
                # (it would be double-reported as both timed and errored)
                runs = []
                break
            finally:
                spark.catalog.clearCache()
                # localCheckpoint blocks free only when the JVM GC
                # collects the dropped frames; 30 queries x 3 runs of
                # accumulated blocks otherwise build memory pressure that
                # bleeds into LATER queries' readings (observed: the
                # codec query, last in the set, read 5.3 s in-sweep vs a
                # stable ~1.1 s solo). Explicit GC between queries keeps
                # each reading isolated.
                del df
                gc.collect()
                try:
                    spark.sparkContext._jvm.System.gc()
                except Exception:  # noqa: BLE001 - measurement hygiene only
                    pass
        if runs:
            query_runs[name] = runs
            mid = sorted(runs)[len(runs) // 2] if len(runs) % 2 else round(
                (sorted(runs)[len(runs) // 2 - 1] + sorted(runs)[len(runs) // 2])
                / 2, 3,
            )
            timings[name] = mid
    warmup_sec = round(warmup_sec, 3)

    total = round(sum(timings.values()), 3)
    # The stdout JSON line stays COMPACT (total + per-query medians): the
    # driver tail-captures stdout and r8's line — once 3 raw readings per
    # query rode along under "query_runs" — outgrew the capture and landed
    # as parsed:null. All raw readings, min/max totals, and warm-up detail
    # go to a sidecar file instead.
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "runs_per_query": n_runs,
    }
    if errors:
        out["errors"] = errors
    sidecar = {
        **out,
        "query_runs": query_runs,
        "total_min": round(sum(min(r) for r in query_runs.values()), 3)
        if query_runs
        else 0.0,
        "total_max": round(sum(max(r) for r in query_runs.values()), 3)
        if query_runs
        else 0.0,
        "warmup_sec": warmup_sec,
        "warmup_sf_dir": warm_dir,
    }
    sidecar_path = os.environ.get(
        "SPARK_GRAFT_BENCH_RUNS_FILE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_RUNS.json"),
    )
    try:
        with open(sidecar_path, "w") as f:
            json.dump(sidecar, f, indent=1)
    except OSError as e:
        print(f"bench: could not write sidecar {sidecar_path}: {e}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
