"""Physical-plan shape assertions: the scale properties (pushdown, pruning,
broadcast, bucketed co-location) are checked structurally, not by timing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_meteo_datalake_spark.plans.explain import (
    has_pushed_filter,
    n_broadcast_joins,
    n_shuffle_exchanges,
    scan_read_columns,
)
from bigdata_meteo_datalake_spark.queries import queries
from bigdata_meteo_datalake_spark.sources.lake import read_table, write_bucketed

from .conftest import SF0001

QS = queries()


def test_pricing_summary_pushdown_and_pruning(spark):
    df = QS["pricing_summary"](spark, SF0001)
    # the shipdate predicate reaches the parquet scan
    assert has_pushed_filter(df, "l_shipdate")
    # column pruning: the scan reads only the 7 referenced columns
    cols = scan_read_columns(df, "lineitem")
    assert set(cols) == {
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_shipdate",
    }
    # one aggregation shuffle, nothing else
    assert n_shuffle_exchanges(df) == 1


def test_enriched_orders_broadcasts_dims(spark):
    df = QS["enriched_orders_daily"](spark, SF0001)
    assert n_broadcast_joins(df) == 2  # customer + nation
    assert n_shuffle_exchanges(df) == 0  # fact never shuffles


def test_projection_pushdown_project_filter(spark):
    df = QS["project_filter_rename"](spark, SF0001)
    cols = scan_read_columns(df, "events")
    assert set(cols) <= {"event_id", "user_id", "event_type", "value"}
    assert has_pushed_filter(df, "event_type")


def test_bucketed_join_no_shuffle(spark):
    """Two tables bucketed on the same key join WITHOUT any exchange."""
    orders = read_table(spark, SF0001, "orders")
    li = read_table(spark, SF0001, "lineitem")
    write_bucketed(orders, "b_orders", n_buckets=4, keys=["o_orderkey"],
                   sort_by=["o_orderkey"])
    write_bucketed(li, "b_lineitem", n_buckets=4, keys=["l_orderkey"],
                   sort_by=["l_orderkey"])
    bo = spark.table("b_orders")
    bl = spark.table("b_lineitem")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bl.join(bo, bl["l_orderkey"] == bo["o_orderkey"]).groupBy(
            "o_orderstatus"
        ).agg(F.sum("l_quantity").alias("q"))
        # join itself is exchange-free; only the final agg shuffles
        assert n_shuffle_exchanges(joined) == 1
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_upsert_single_shuffle(spark):
    df = QS["upsert_last_write_wins"](spark, SF0001)
    # window dedup = exactly the one hash shuffle a MERGE would need
    assert n_shuffle_exchanges(df) == 1


def test_no_unpartitioned_window_in_any_registered_query(spark):
    """Scale guard: no registered query may plan a partition-less Window —
    the single-task shape that dies at 100x. Global top-k must compile to
    TakeOrderedAndProject, running totals must shard."""
    from bigdata_meteo_datalake_spark.plans.explain import unpartitioned_windows

    offenders = {}
    for name, fn in QS.items():
        bad = unpartitioned_windows(fn(spark, SF0001))
        if bad:
            offenders[name] = bad
    assert offenders == {}


def test_global_topk_compiles_to_take_ordered(spark):
    from bigdata_meteo_datalake_spark.plans.explain import n_nodes

    for name in ("largest_orders", "token_frequency_topk", "q3_shipping_priority"):
        assert n_nodes(QS[name](spark, SF0001), "TakeOrderedAndProject") == 1, name


def test_no_cartesian_product_in_any_registered_query(spark):
    """Scale guard, join edition: no registered query may plan a
    CartesianProduct — the partitioned NxM join that explodes at scale.
    (BroadcastNestedLoopJoin against singleton-aggregate sides — bounds,
    totals, query sets — is legitimate and remains allowed; this bans the
    shuffle-side cross join specifically.) Every explicit crossJoin in
    the registry must therefore ride a broadcast."""
    from bigdata_meteo_datalake_spark.plans.explain import plan_string

    offenders = [
        name
        for name, fn in QS.items()
        if "CartesianProduct" in plan_string(fn(spark, SF0001))
    ]
    assert offenders == []


def test_governance_scans_are_map_only(spark):
    """The PII scan and the filter cascade must stay map-only: all their
    work is in-row regex/array math, so the plan may contain no hash
    shuffle at all (the widen round-robin repartition is not a
    hashpartitioning exchange). A shuffle appearing here means someone
    turned an in-row computation into an aggregate."""
    from bigdata_meteo_datalake_spark.plans.explain import plan_string

    for name in ("pii_scan_report", "filter_cascade_report"):
        plan = plan_string(QS[name](spark, SF0001))
        assert "hashpartitioning" not in plan, name


def test_twap_single_series_exchange(spark):
    """twap_event_values: ONE hash exchange on the series key, shared by
    the lead window and the aggregate (AQE may add query-stage wrappers
    but not extra hash exchanges)."""
    from bigdata_meteo_datalake_spark.plans.explain import plan_string

    plan = plan_string(QS["twap_event_values"](spark, SF0001))
    assert plan.count("hashpartitioning") == 1


def test_shard_manifest_single_aggregate_exchange(spark):
    from bigdata_meteo_datalake_spark.plans.explain import plan_string

    plan = plan_string(QS["shard_manifest"](spark, SF0001))
    assert plan.count("hashpartitioning") == 1


def test_cdc_apply_two_exchanges(spark):
    """cdc_apply_changelog: the changelog union shuffles ONCE on the key
    for the latest-op window (the MERGE-equivalent exchange), then once
    for the status aggregate — never more."""
    from bigdata_meteo_datalake_spark.plans.explain import plan_string

    plan = plan_string(QS["cdc_apply_changelog"](spark, SF0001))
    assert plan.count("hashpartitioning") == 2


def test_zone_map_single_exchange(spark):
    """zone_map_prune_report is one two-phase hash aggregate: exactly one
    shuffle, partial aggregation before it (the pricing_summary shape)."""
    from bigdata_meteo_datalake_spark.plans.explain import n_shuffle_exchanges

    assert n_shuffle_exchanges(QS["zone_map_prune_report"](spark, SF0001)) == 1


def test_phash_near_dup_no_nested_loop(spark):
    """The pHash band join must be an equi-join (hash/sort-merge), never
    a nested-loop over the corpus: the inequality and hamming predicates
    ride as post-join filters on the (b, bv) key join."""
    from bigdata_meteo_datalake_spark.plans.explain import plan_string

    plan = plan_string(QS["multimodal_phash_near_dup"](spark, SF0001))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_span_corruption_is_pure_map_with_fences(spark):
    """The denoising builder must stay a zero-shuffle map, and the
    project_fence Generate nodes must survive optimization — without them
    CollapseProject inlines each array stage into the next stage's
    lambdas (O(n^3) per row; 15x slower measured at sf0.1)."""
    df = QS["span_corruption_build"](spark, SF0001)
    assert n_shuffle_exchanges(df) == 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate explode") >= 3  # one fence per array stage


def test_fertility_and_ohlc_single_aggregate(spark):
    for name in ("tokenizer_fertility_by_lang", "ohlc_hourly_bars"):
        df = QS[name](spark, SF0001)
        assert n_shuffle_exchanges(df) == 1, name  # one hash aggregate only


def test_bootstrap_hash_behind_fence(spark):
    """The Poisson-weight md5 must materialize once per (customer,
    replicate) row — the fence keeps it out of the CDF filter lambda."""
    df = QS["poisson_bootstrap_ci"](spark, SF0001)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate explode") >= 1


def test_real_codec_queries_are_pure_map(spark):
    """The real-decode pipelines (synthesize -> decode/probe -> project)
    are embarrassingly parallel: two chained mapInPandas stages over
    (doc_id, blob) whose ONLY exchange is the id-spine widen BELOW the
    first kernel — it redistributes bare doc_id longs so a single-split
    local table doesn't serialize the codec work on one core, and NO
    blob payload ever crosses an exchange (at 100 TB the source arrives
    pre-split and the widen is a no-op; the blob path stays a pure
    scan-map pass either way)."""
    for name in ("multimodal_png_decode", "multimodal_png_depths_decode",
                 "multimodal_jpeg_decode", "multimodal_jpeg12_decode",
                 "multimodal_jpeg_arith_decode",
                 "multimodal_jpeg_lossless_decode",
                 "multimodal_wav_g711_decode", "multimodal_wav_adpcm_decode",
                 "multimodal_flac_decode",
                 "multimodal_bmp_decode",
                 "multimodal_tiff_decode",
                 "multimodal_gif_frames", "multimodal_avi_frames",
                 "multimodal_wav_decode", "multimodal_phash_real",
                 "multimodal_mp4_probe", "audio_resample_16k",
                 "multimodal_exif_report", "webdataset_samples_report",
                 "html_extract_report", "warc_response_report",
                 "jsonl_shard_report", "subtitle_cues_report",
                 "mp3_metadata_report", "zip_shard_report",
                 "pdf_text_report", "mp3_frames_report",
                 "eml_text_report", "feed_discovery_report",
                 "csv_sniff_report", "unicode_clean_report",
                 "mbox_messages_report", "data_uri_images_report",
                 "image_quality_report", "exif_geo_report",
                 "charset_detect_report", "tfrecord_report",
                 "safetensors_report", "audio_vad_report",
                 "format_sniff_report", "ogg_pages_report",
                 "mkv_probe_report", "webp_probe_report",
                 "avro_shard_report", "delta_log_snapshot",
                 "compressed_frame_probe_report", "iceberg_snapshot_report",
                 "arrow_ipc_report", "hudi_timeline_report",
                 "arrow_stream_report", "cbor_events_report"):
        df = QS[name](spark, SF0001)
        assert n_shuffle_exchanges(df) <= 1, name
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("MapInPandas") == 2, name
        # the exchange (if present) carries only the id spine: every
        # Exchange node in the tree prints its output attributes, and
        # none may include the binary payload
        for line in plan.splitlines():
            if "Exchange" in line:
                assert "blob" not in line, (name, line)


def test_quality_classifier_is_pure_projection(spark):
    """The hashed-linear classifier must be a pure scan-map pass: no
    hash aggregate, no join — the only exchange allowed is the
    small-input widen (round-robin, a no-op on a pre-split lake)."""
    df = QS["quality_classifier_admission"](spark, SF0001)
    assert n_shuffle_exchanges(df) <= 1
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan
    assert "Join" not in plan and "HashAggregate" not in plan
